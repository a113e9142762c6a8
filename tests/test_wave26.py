"""Wave-26 units: streamed attribution ≡ batch, 2-pass median ≡
sorted middle, KS reconstruction."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_stream_attribution_equals_batch(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    streamed = tuple(QUERIES["q_stream_attribution"](spark, SF).first())
    batch = tuple(QUERIES["q_attribution"](spark, SF).first())
    assert streamed == batch


def test_exact_median_2pass_equals_sorted_middle(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    r = QUERIES["q_exact_median_2pass"](spark, SF).first()
    vals = sorted(
        row["value"] for row in load_table(spark, SF, "events").select("value").collect()
    )
    k = (len(vals) + 1) // 2
    assert r["n"] == len(vals)
    assert r["k"] == k
    assert r["exact_median"] == vals[k - 1]


def test_ks_statistic_matches_python(spark):
    from collections import Counter

    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    r = QUERIES["q_ks_statistic"](spark, SF).first()
    rows = (
        load_table(spark, SF, "events")
        .select("event_type", "value")
        .where("event_type in ('click', 'purchase')")
        .collect()
    )
    a = Counter(x["value"] for x in rows if x["event_type"] == "click")
    b = Counter(x["value"] for x in rows if x["event_type"] == "purchase")
    na, nb = sum(a.values()), sum(b.values())
    ca = cb = 0
    best = (-1.0, None)
    for v in sorted(set(a) | set(b)):
        ca += a.get(v, 0)
        cb += b.get(v, 0)
        d = abs(ca / na - cb / nb)
        if d > best[0]:
            best = (d, v)
    assert (r["n_click"], r["n_purchase"]) == (na, nb)
    assert abs(r["d_r9"] - best[0]) < 1e-8
    assert abs(r["at_value_r6"] - best[1]) < 1e-6
    assert 0.0 <= r["d_r9"] <= 1.0
