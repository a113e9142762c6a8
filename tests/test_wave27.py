"""Wave-27 units: SLA bounds, heatmap accounting, audience identity."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_ship_lag_sla_shape(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_ship_lag_sla"](spark, SF).collect()
    assert rows
    total = sum(r["n"] for r in rows)
    assert total == load_table(spark, SF, "lineitem").count()
    for r in rows:
        assert r["p50_r9"] <= r["p90_r9"]
        assert 0.0 <= r["fill_30d_r9"] <= 1.0


def test_calendar_heatmap_shares_sum_to_one(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_calendar_heatmap"](spark, SF).collect()
    assert sum(r["n"] for r in rows) == load_table(spark, SF, "events").count()
    assert abs(sum(r["share_r9"] for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert 1 <= r["isodow"] <= 7 and 0 <= r["hour"] <= 23


def test_new_vs_returning_identity(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_new_vs_returning"](spark, SF).collect()
    assert rows
    # day 1: everyone active is new
    assert rows[0]["new_users"] == rows[0]["active_users"]
    total_new = sum(r["new_users"] for r in rows)
    # each user is new exactly once
    from crypto_price_data_pipeline_spark.io.sources import load_table

    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert total_new == n_users
    for r in rows:
        assert r["active_users"] == r["new_users"] + r["returning_users"]
