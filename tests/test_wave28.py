"""Wave-28 units: streamed KS ≡ batch, cycle reconstruction, MoM
growth law, stickiness bounds."""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_stream_ks_equals_batch(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    streamed = tuple(QUERIES["q_stream_ks"](spark, SF).first())
    batch = tuple(QUERIES["q_ks_statistic"](spark, SF).first())
    assert streamed == batch


def test_repeat_purchase_cycle_reconstruction(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    r = QUERIES["q_repeat_purchase_cycle"](spark, SF).first()
    orders = defaultdict(list)
    for o in load_table(spark, SF, "orders").collect():
        orders[o["o_custkey"]].append((o["o_orderdate"], o["o_orderkey"]))
    gaps = []
    repeat = 0
    for ds in orders.values():
        ds.sort()
        if len(ds) > 1:
            repeat += 1
            gaps += [(b[0] - a[0]).days for a, b in zip(ds, ds[1:])]
    assert r["n_buyers"] == len(orders)
    assert r["n_repeat_buyers"] == repeat
    assert r["n_gaps"] == len(gaps)
    assert r["p50_cycle_r9"] <= r["p90_cycle_r9"]


def test_mom_growth_law(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_mom_growth"](spark, SF).collect()
    assert rows
    assert rows[0]["mom_growth_r9"] is None  # first month has no prior
    for prev, cur in zip(rows, rows[1:]):
        if prev["revenue_r6"] > 0:
            expect = (cur["revenue_r6"] - prev["revenue_r6"]) / prev["revenue_r6"]
            assert abs(cur["mom_growth_r9"] - expect) < 1e-6


def test_stickiness_bounds(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_dau_mau_stickiness"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["dau"] <= r["mau"]
        assert 0.0 < r["stickiness_r9"] <= 1.0 + 1e-9
    # MAU is monotone over the first 30 days of a 30-day dataset
    maus = [r["mau"] for r in rows]
    assert maus == sorted(maus)
