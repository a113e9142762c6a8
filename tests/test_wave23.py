"""Wave-23 units: sweep-line reconstruction, rolling-corr bounds,
weighted-median law, streamed diversity ≡ batch."""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_peak_concurrency_matches_python_sweep(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES
    from pyspark.sql import functions as F

    r = QUERIES["q_peak_concurrency"](spark, SF).first()
    iv = (
        load_table(spark, SF, "events")
        .select(
            F.unix_micros("ts").alias("t0"),
            (F.unix_micros("ts") + (F.col("value") * 1_000_000).cast("long")).alias(
                "t1"
            ),
        )
        .collect()
    )
    deltas = defaultdict(int)
    for row in iv:
        deltas[row["t0"]] += 1
        deltas[row["t1"]] -= 1
    cur = peak = 0
    at = None
    for t in sorted(deltas):
        cur += deltas[t]
        if cur > peak:
            peak, at = cur, t
    assert (r["peak_concurrency"], r["at_us"], r["n_intervals"]) == (
        peak,
        at,
        len(iv),
    )


def test_rolling_corr_in_range(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_rolling_corr"](spark, SF).collect()
    assert rows
    assert len(rows) <= 24  # 30 days, first 6 lack a full window
    for r in rows:
        assert -1.0 - 1e-9 <= r["corr_r9"] <= 1.0 + 1e-9


def test_weighted_median_crossing_law(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_weighted_median"](spark, SF).collect()
    assert rows
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, SF, "customer").collect()
    }
    spend = defaultdict(lambda: defaultdict(lambda: [0.0, 0]))
    for o in load_table(spark, SF, "orders").collect():
        nk = cust[o["o_custkey"]]
        cell = spend[nk][o["o_custkey"]]
        cell[0] += float(o["o_totalprice"])
        cell[1] += 1
    for r in rows:
        entries = sorted(
            (v[0], k, v[1]) for k, v in spend[r["c_nationkey"]].items()
        )
        tw = sum(e[2] for e in entries)
        assert r["total_weight"] == tw
        cw = 0
        for x, _, w in entries:
            cw += w
            if 2 * cw >= tw:
                assert abs(r["weighted_median_spend"] - x) < 1e-6
                break


def test_stream_diversity_equals_batch(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    streamed = [tuple(r) for r in QUERIES["q_stream_diversity"](spark, SF).collect()]
    batch = [tuple(r) for r in QUERIES["q_diversity_index"](spark, SF).collect()]
    assert streamed == batch
