"""Wave-9 units: the distributed global rank (epoch shuffle), the
skew-safe per-source cap, the chunk-roundtrip invariant, the funnel
report's arithmetic, and the decontamination stream's planted-donor
guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

SF = "/root/testdata/sf0.001"


def test_global_order_matches_global_window(spark):
    """The two-phase bucketed rank must be bit-identical to the
    single-partition global window it replaces."""
    from crypto_price_data_pipeline_spark.operators.ordering import epoch_shuffle

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: r["pos"]
        for r in epoch_shuffle(df, "doc_id", seed="s1").collect()
    }
    key = F.md5(F.concat(F.lit("s1:"), F.col("doc_id").cast("string")))
    naive = {
        r["doc_id"]: r["pos"]
        for r in df.withColumn("_k", key)
        .withColumn("pos", F.row_number().over(Window.orderBy("_k", "doc_id")))
        .collect()
    }
    assert got == naive


def test_epoch_shuffle_permutation_and_seed_sensitivity(spark):
    from crypto_price_data_pipeline_spark.operators.ordering import epoch_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, "doc_id", seed="e0").collect()}
    assert sorted(a.values()) == list(range(1, 501))  # exact permutation
    b = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, "doc_id", seed="e1").collect()}
    assert sorted(b.values()) == list(range(1, 501))
    assert a != b  # different seed → different permutation


def test_epoch_shuffle_empty_input(spark):
    from crypto_price_data_pipeline_spark.operators.ordering import epoch_shuffle

    df = spark.range(0, 0).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(df, "doc_id")
    assert out.count() == 0
    assert "pos" in out.columns


def test_training_order_no_single_partition_window(spark):
    """The rank must never route through a single-partition exchange —
    that is exactly the 100-TB failure the operator exists to avoid.
    (The only Exchange allowed besides the bucket hash is the final
    presentation orderBy's range partitioning.)"""
    from crypto_price_data_pipeline_spark.queries import QUERIES

    plan = (
        QUERIES["q_training_order"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan


def test_source_cap_two_phase_equals_naive(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES
    from crypto_price_data_pipeline_spark.io.sources import load_table

    got = [(r["source"], r["doc_id"]) for r in QUERIES["q_source_cap"](spark, SF).collect()]
    docs = load_table(spark, SF, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    naive = [
        (r["source"], r["doc_id"])
        for r in docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 15)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
        .collect()
    ]
    assert got == naive


def test_curation_report_arithmetic(spark):
    """Funnel algebra: stage k's n_out is stage k+1's n_in, drops are
    non-negative, and the first n_in is the corpus size."""
    from crypto_price_data_pipeline_spark.queries import QUERIES
    from crypto_price_data_pipeline_spark.io.sources import load_table

    rows = QUERIES["q_curation_report"](spark, SF).collect()
    assert [r["stage"] for r in rows] == ["1_length", "2_lang", "3_repetition"]
    total = load_table(spark, SF, "documents").count()
    assert rows[0]["n_in"] == total
    for r in rows:
        assert r["n_dropped"] >= 0
        assert r["n_in"] - r["n_dropped"] == r["n_out"]
    assert rows[0]["n_out"] == rows[1]["n_in"]
    assert rows[1]["n_out"] == rows[2]["n_in"]


def test_chunk_roundtrip_lossless(spark):
    """Every doc must rebuild exactly from its chunks — the invariant
    the query exists to certify."""
    from crypto_price_data_pipeline_spark.queries import QUERIES

    for r in QUERIES["q_chunk_roundtrip"](spark, SF).collect():
        assert r["n_roundtrip_ok"] == r["n_docs"], r


def test_bucketed_join_has_no_exchange_on_join_keys(spark):
    """The whole point of the bucketed layout: the fact⋈dim join must
    read both sides bucket-aligned (SelectedBucketsCount in the scans)
    and never shuffle on the join keys."""
    from crypto_price_data_pipeline_spark.queries import QUERIES

    plan = (
        QUERIES["q_bucketed_join"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan
    assert "SelectedBucketsCount" in plan
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan


def test_dpp_join_prunes_partitions_dynamically(spark):
    """The fact scan's PartitionFilters must carry a dynamicpruning
    subquery (runtime prune from the broadcast dim), not a static
    literal list."""
    from crypto_price_data_pipeline_spark.queries import QUERIES

    plan = (
        QUERIES["q_dpp_join"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan.lower()


def test_stream_contamination_drops_every_planted_donor(spark):
    """No-false-negative on the plant: each eval doc copies the first
    30 tokens of doc_id+1, so every such donor that is itself a
    training doc MUST appear in the drop list."""
    from crypto_price_data_pipeline_spark.queries import QUERIES
    from crypto_price_data_pipeline_spark.io.sources import load_table

    docs = load_table(spark, SF, "documents")
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    donors = {
        e + 1 for e in ids if e % 97 == 0 and (e + 1) in ids and (e + 1) % 97 != 0
    }
    dropped = {
        r["doc_id"] for r in QUERIES["q_stream_contamination"](spark, SF).collect()
    }
    assert donors <= dropped


def test_ntile_from_rank_matches_spark_ntile(spark):
    """The rank->tile rule must reproduce F.ntile EXACTLY for every
    distribution shape: n < tiles (each row its own tile), n divisible
    by tiles, and the ragged n = q*tiles + rem case — including
    duplicate sort values (the unique tiebreak makes the rank total)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from crypto_price_data_pipeline_spark.operators.ordering import (
        ntile_from_rank,
    )

    for n in (5, 16, 32, 37, 100, 161):
        rows = [(i, (i * 7919) % 13) for i in range(n)]  # dup values
        df = spark.createDataFrame(rows, "id long, v long")
        w = Window.orderBy("v", "id")
        got = df.select(
            "id",
            F.row_number().over(w).alias("pos"),
            F.ntile(16).over(w).alias("want"),
        ).withColumn("tile", ntile_from_rank("pos", n, 16))
        bad = got.where(F.col("tile") != F.col("want")).count()
        assert bad == 0, f"n={n}: {bad} rank->tile mismatches vs F.ntile"


def test_global_order_inplan_matches_global_window(spark):
    """The IN-PLAN two-phase rank (bucket offsets from a window over
    the bucket-count aggregate, zero driver round-trips) must be
    bit-identical to the single-partition global window — including
    skewed, gappy bucket layouts (most buckets empty) and a
    multi-column total order."""
    from crypto_price_data_pipeline_spark.operators.ordering import (
        global_order_index_inplan,
    )

    rows = [(i, (i * 7919) % 13, (i * 31) % 997) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v long, u long")
    # monotone, skewed coarsening of v: collisions merge neighbors
    bucket = F.least(F.floor(F.col("v") / F.lit(3)), F.lit(255)).cast("long")
    got = {
        r["id"]: r["pos"]
        for r in global_order_index_inplan(
            df, ["v", "u", "id"], bucket, pos_col="pos"
        ).collect()
    }
    naive = {
        r["id"]: r["pos"]
        for r in df.withColumn(
            "pos", F.row_number().over(Window.orderBy("v", "u", "id"))
        ).collect()
    }
    assert got == naive


def test_ntile_from_rank_cols_matches_spark_ntile(spark):
    """The column-typed rank->tile rule (n as a broadcast column, the
    long-modulo integer division) must reproduce F.ntile EXACTLY for
    n < tiles, divisible, and ragged shapes."""
    from crypto_price_data_pipeline_spark.operators.ordering import (
        ntile_from_rank_cols,
    )

    for n in (5, 16, 32, 37, 100, 161):
        rows = [(i, (i * 7919) % 13) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v long")
        w = Window.orderBy("v", "id")
        cnt = df.agg(F.count(F.lit(1)).alias("_n"))
        got = (
            df.crossJoin(F.broadcast(cnt))
            .select(
                "id",
                "_n",
                F.row_number().over(w).alias("pos"),
                F.ntile(16).over(w).alias("want"),
            )
            .withColumn(
                "tile", ntile_from_rank_cols(F.col("pos"), F.col("_n"), 16)
            )
        )
        bad = got.where(F.col("tile") != F.col("want")).count()
        assert bad == 0, f"n={n}: {bad} rank->tile mismatches vs F.ntile"


def test_global_order_offsets_inplan_matches_global_window(spark):
    """The combined rank+weighted-prefix pass must be bit-identical to
    the single-partition global windows it replaces (rank AND exclusive
    weighted cumsum), with zero driver round-trips."""
    from crypto_price_data_pipeline_spark.operators.ordering import (
        global_order_offsets_inplan,
        hex_prefix_bucket,
    )

    df = (
        spark.range(0, 500)
        .withColumnRenamed("id", "doc_id")
        .withColumn("w", (F.col("doc_id") % 7 + 1).cast("long"))
        .withColumn(
            "_k", F.md5(F.concat(F.lit("x:"), F.col("doc_id").cast("string")))
        )
    )
    got = {
        r["doc_id"]: (r["pos"], r["offset"])
        for r in global_order_offsets_inplan(
            df, ["_k", "doc_id"], hex_prefix_bucket("_k", 2), weight_col="w"
        ).collect()
    }
    w_rank = Window.orderBy("_k", "doc_id")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r["doc_id"]: (r["pos"], r["offset"])
        for r in df.withColumn("pos", F.row_number().over(w_rank).cast("long"))
        .withColumn(
            "offset", F.coalesce(F.sum("w").over(w_cum), F.lit(0)).cast("long")
        )
        .collect()
    }
    assert got == naive


def test_global_order_offsets_inplan_duplicate_key_fails(spark):
    """A duplicate key tuple makes ranks/offsets nondeterministic — the
    in-plan guard must fail the job, not silently emit them."""
    import pytest

    from crypto_price_data_pipeline_spark.operators.ordering import (
        global_order_offsets_inplan,
        hex_prefix_bucket,
    )

    df = spark.createDataFrame(
        [(1, 5), (1, 3), (2, 4)], "doc_id long, w long"
    ).withColumn("_k", F.md5(F.col("doc_id").cast("string")))
    out = global_order_offsets_inplan(
        df, ["_k", "doc_id"], hex_prefix_bucket("_k", 2), weight_col="w"
    )
    with pytest.raises(Exception, match="duplicate key tuple"):
        out.collect()


def test_global_order_offsets_inplan_fractional_weights_not_truncated(spark):
    """Double weights must keep their fractional running sum — the
    pre-r12 cast("long") silently floored offsets for non-integral
    weight columns (r11 ADVICE). Integral weights still come back as
    longs (the contract q_shard_manifest relies on)."""
    import pytest

    from crypto_price_data_pipeline_spark.operators.ordering import (
        global_order_offsets_inplan,
        hex_prefix_bucket,
    )

    df = (
        spark.range(0, 40)
        .withColumnRenamed("id", "doc_id")
        .withColumn("w", F.col("doc_id").cast("double") / 4 + 0.25)
        .withColumn("_k", F.md5(F.col("doc_id").cast("string")))
    )
    out = global_order_offsets_inplan(
        df, ["_k", "doc_id"], hex_prefix_bucket("_k", 2), weight_col="w"
    )
    assert dict(out.dtypes)["offset"] == "double"
    got = {r["doc_id"]: (r["pos"], r["offset"]) for r in out.collect()}
    w_rank = Window.orderBy("_k", "doc_id")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r["doc_id"]: (r["pos"], r["offset"])
        for r in df.withColumn("pos", F.row_number().over(w_rank).cast("long"))
        .withColumn("offset", F.coalesce(F.sum("w").over(w_cum), F.lit(0.0)))
        .collect()
    }
    assert set(got) == set(naive)
    for k in got:
        assert got[k][0] == naive[k][0]
        assert got[k][1] == pytest.approx(naive[k][1], abs=1e-9)
    # integral weights: offset stays long
    df_int = df.withColumn("w", (F.col("doc_id") % 3 + 1).cast("int"))
    out_int = global_order_offsets_inplan(
        df_int, ["_k", "doc_id"], hex_prefix_bucket("_k", 2), weight_col="w"
    )
    assert dict(out_int.dtypes)["offset"] == "bigint"
