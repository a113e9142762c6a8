"""Wave-25 units: attribution reconstruction, forecast composition
law, k-fold partition audit."""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_attribution_matches_python_reconstruction(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES
    from pyspark.sql import functions as F

    r = QUERIES["q_attribution"](spark, SF).first()
    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append((e["us"], e["event_id"], e["event_type"]))
    gaps, unattributed = [], 0
    for rows in by_user.values():
        last_click = None
        for us, _, et in sorted(rows):
            if et == "purchase":
                if last_click is None:
                    unattributed += 1
                else:
                    gaps.append(us - last_click)
            if et == "click":
                last_click = us
    assert r["n_purchases"] == len(gaps) + unattributed
    assert r["n_attributed"] == len(gaps)
    assert r["n_unattributed"] == unattributed
    assert r["max_gap_us"] == (max(gaps) if gaps else None)


def test_seasonal_forecast_composition(spark):
    """Forecast must equal trend(i) + seasonal(dow) recomputed in
    Python from the same daily series."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES
    from pyspark.sql import functions as F

    rows = QUERIES["q_seasonal_forecast"](spark, SF).collect()
    assert [r["h"] for r in rows] == list(range(1, 8))

    daily = sorted(
        (r["d"], float(r["s"]))
        for r in load_table(spark, SF, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.sum("value").alias("s"))
        .collect()
    )
    n = len(daily)
    ys = [y for _, y in daily]
    xs = list(range(1, n + 1))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    intercept = sy / n - slope * sx / n
    resid = defaultdict(list)
    for (d, y), i in zip(daily, xs):
        resid[d.isoweekday()].append(y - (intercept + slope * i))
    for r in rows:
        i = n + r["h"]
        seasonal = (
            sum(resid[r["isodow"]]) / len(resid[r["isodow"]])
            if resid[r["isodow"]]
            else 0.0
        )
        expect = intercept + slope * i + seasonal
        assert abs(r["forecast_r9"] - expect) < 1e-3


def test_kfold_assignment_is_disjoint_and_complete(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_kfold_assign"](spark, SF).collect()
    total = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    folds = {r["fold"] for r in rows}
    assert folds <= set(range(5)) and len(folds) == 5
    assert all(r["n_tokens"] > 0 for r in rows)
