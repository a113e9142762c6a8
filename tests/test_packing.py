"""Sequence packing: the distributed prefix sum must be bit-identical
to the naive single-partition global window, without ever planning a
single-partition exchange for the data path."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crypto_price_data_pipeline_spark.operators.packing import (
    pack_sequences,
    with_global_offsets,
)


def _naive(df, order_col, weight_col):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn("offset", F.coalesce(F.sum(weight_col).over(w), F.lit(0)))


def test_offsets_match_naive_window(spark):
    rows = [(i * 7 % 101, (i * 13) % 9 + (1 if i % 3 else 0)) for i in range(101)]
    df = spark.createDataFrame(rows, "k long, w long")
    got = {
        r["k"]: r["offset"]
        for r in with_global_offsets(df, "k", "w", num_buckets=8).collect()
    }
    want = {r["k"]: r["offset"] for r in _naive(df, "k", "w").collect()}
    assert got == want


def test_offsets_empty_and_single_bucket(spark):
    empty = spark.createDataFrame([], "k long, w long")
    assert with_global_offsets(empty, "k", "w").count() == 0
    one = spark.createDataFrame([(5, 3)], "k long, w long")
    assert one.transform(lambda d: with_global_offsets(d, "k", "w")).first()[
        "offset"
    ] == 0


def test_pack_sequences_layout(spark):
    # weights 60,60,60 at L=64: doc0 [0,59], doc1 [60,119] straddles,
    # doc2 [120,179] straddles; zero-weight doc dropped.
    df = spark.createDataFrame(
        [(0, 60), (1, 60), (2, 60), (3, 0)], "doc long, w long"
    )
    out = {
        r["doc"]: (r["offset"], r["seq_id"], r["end_seq_id"])
        for r in pack_sequences(df, "doc", "w", 64).collect()
    }
    assert out == {0: (0, 0, 0), 1: (60, 0, 1), 2: (120, 1, 2)}


def test_packing_plan_is_distributed(spark):
    df = spark.createDataFrame([(i, i % 5) for i in range(200)], "k long, w long")
    packed = with_global_offsets(df, "k", "w", num_buckets=8)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    # the local cumsum window must be keyed by the bucket column
    assert "_pack_bkt" in plan


def test_offsets_fail_job_on_null_order(spark):
    import pytest

    df = spark.createDataFrame([(1, 5), (None, 5), (3, 5)], "k long, w long")
    with pytest.raises(Exception, match="NULL or duplicate 'k'"):
        with_global_offsets(df, "k", "w").collect()


def test_offsets_fail_job_on_duplicate_order(spark):
    import pytest

    df = spark.createDataFrame([(1, 5), (2, 5), (2, 5)], "k long, w long")
    with pytest.raises(Exception, match="NULL or duplicate 'k'"):
        with_global_offsets(df, "k", "w").collect()


def test_offsets_fail_job_on_all_null_orders(spark):
    """ALL-NULL orders must fail like mixed-NULL (the in-plan guard
    only fires when a non-NULL value exists, so this case is caught
    eagerly at the min/max stage)."""
    import pytest

    df = spark.createDataFrame(
        [(None, 5), (None, 7)], "k long, w long"
    )
    with pytest.raises(ValueError, match="all 2 rows have NULL 'k'"):
        with_global_offsets(df, "k", "w")


def test_offsets_input_is_materialized_once(spark):
    # r15 optimization: the operator necessarily drives three actions
    # over its input (range agg, bucket totals, caller's action); the
    # input must be localCheckpoint-materialized once so an expensive
    # upstream (tokenize / BPE rewrite) is not recomputed per action.
    # Pin it structurally: the result plan must scan the checkpointed
    # RDD, not re-derive the upstream projection.
    df = spark.createDataFrame([(i, i % 5 + 1) for i in range(50)], "k long, w long")
    upstream = df.withColumn("w", F.col("w") * 2)  # stand-in "expensive" projection
    packed = with_global_offsets(upstream, "k", "w", num_buckets=4)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
