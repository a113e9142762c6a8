"""Wave-30 units: reach accounting, movers ranking law, cross-sell
reconstruction."""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_cumulative_reach_accounting(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_cumulative_reach"](spark, SF).collect()
    assert rows
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert rows[-1]["cumulative_users"] == n_users
    run = 0
    for r in rows:
        run += r["new_users"]
        assert r["cumulative_users"] == run


def test_top_movers_ranked_by_abs_delta(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_top_movers"](spark, SF).collect()
    assert len(rows) == 10
    deltas = [abs(r["delta_r6"]) for r in rows]
    assert deltas == sorted(deltas, reverse=True)


def test_cross_sell_matrix_reconstruction(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_cross_sell_matrix"](spark, SF).collect()
    assert rows
    part_brand = {
        r["p_partkey"]: r["p_brand"]
        for r in load_table(spark, SF, "part").collect()
    }
    baskets = defaultdict(set)
    for li in load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect():
        baskets[li["l_orderkey"]].add(part_brand[li["l_partkey"]])
    n_orders = len(baskets)
    for r in rows[:5]:
        n_ab = sum(
            1 for b in baskets.values() if {r["brand_a"], r["brand_b"]} <= b
        )
        n_a = sum(1 for b in baskets.values() if r["brand_a"] in b)
        n_b = sum(1 for b in baskets.values() if r["brand_b"] in b)
        assert (r["n_ab"], r["n_a"], r["n_b"]) == (n_ab, n_a, n_b)
        assert abs(r["lift_r9"] - (n_ab * n_orders) / (n_a * n_b)) < 1e-8
        assert r["brand_a"] < r["brand_b"]
