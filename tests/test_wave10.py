"""Wave-10 units: streamed SCD2 ≡ batch, forget-cascade conservation,
curriculum rank structure, format-federation agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_stream_scd2_equals_batch(spark):
    """The version log + merge-on-read must reproduce the batch SCD2
    history row-for-row — the invariant the oracle also checks, pinned
    here without DuckDB in the loop."""
    from crypto_price_data_pipeline_spark.queries import QUERIES

    streamed = [tuple(r) for r in QUERIES["q_stream_scd2"](spark, SF).collect()]
    batch = [tuple(r) for r in QUERIES["q_scd2"](spark, SF).collect()]
    assert streamed == batch


def test_forget_report_conservation(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES
    from crypto_price_data_pipeline_spark.io.sources import load_table

    rows = {r["table_name"]: r for r in QUERIES["q_forget_users"](spark, SF).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    for r in rows.values():
        assert r["n_after"] == r["n_before"] - r["n_deleted"]
        assert r["n_deleted"] >= 0
    # lineitem's joined count must equal the direct semi-join cascade
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    doomed = orders.where(F.col("o_custkey") % 53 == 0).select("o_orderkey")
    expected = li.join(doomed, li["l_orderkey"] == doomed["o_orderkey"], "left_semi").count()
    assert rows["lineitem"]["n_deleted"] == expected


def test_curriculum_order_structure(spark):
    """Positions are a dense 1..n permutation and qbin is
    non-decreasing along the curriculum — cleanest bin strictly
    first."""
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_curriculum_order"](spark, SF).collect()
    n = len(rows)
    assert sorted(r["pos"] for r in rows) == list(range(1, n + 1))
    by_pos = sorted(rows, key=lambda r: r["pos"])
    bins = [r["qbin"] for r in by_pos]
    assert bins == sorted(bins)


def test_multi_format_rows_agree(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_multi_format_union"](spark, SF).collect()
    assert [r["fmt"] for r in rows] == ["csv", "json", "parquet"]
    assert len({(r["n"], r["sum_value"]) for r in rows}) == 1
