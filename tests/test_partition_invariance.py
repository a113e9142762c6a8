"""Partition-invariance: the deterministic selection/derivation ops
must produce the SAME row set no matter how the input is partitioned.

This is the property that makes them safe at 100 TB — a cluster never
controls physical partitioning (AQE, skew splits, file sizes all move
rows between tasks), so any operator whose output depends on partition
boundaries is silently nondeterministic at scale. The ops covered here
all advertise partition-independence in their docstrings; this pins it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _rowset(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _variants(df):
    return [df, df.repartition(7), df.repartition(3, "doc_id"), df.coalesce(1)]


def test_hash_sample_partition_invariant(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.sampling import (
        stratified_sample_hash,
    )

    docs = load_table(spark, SF_DIR, "documents")
    mix = {"en": 0.5, "de": 0.3, "es": 0.2, "fr": 0.2, "zh": 0.1}
    outs = [
        _rowset(stratified_sample_hash(d, "lang", mix, "doc_id").select("doc_id", "lang"))
        for d in _variants(docs)
    ]
    assert outs[0] and all(o == outs[0] for o in outs[1:])


def test_train_split_partition_invariant(spark):
    """The md5-nibble split rule (q_train_split's assignment) must give
    every doc the same label no matter how the input is partitioned —
    applied per-row over the partition variants, not just re-collected
    from one physical plan."""
    from crypto_price_data_pipeline_spark.io.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib.isin("e", "f"), "test")
        .when(nib.isin("c", "d"), "val")
        .otherwise("train")
    )
    outs = [
        _rowset(d.select("doc_id", split.alias("split"))) for d in _variants(docs)
    ]
    assert outs[0] and all(o == outs[0] for o in outs[1:])
    assert {s for _, s in outs[0]} == {"train", "val", "test"}


def test_exact_stratified_sample_partition_invariant(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.sampling import stratified_sample

    docs = load_table(spark, SF_DIR, "documents")
    mix = {"en": 0.4, "de": 0.4, "es": 0.4, "fr": 0.4, "zh": 0.4}
    outs = [
        _rowset(stratified_sample(d, "lang", mix, "doc_id").select("doc_id", "lang"))
        for d in _variants(docs)
    ]
    assert outs[0] and all(o == outs[0] for o in outs[1:])


def test_feature_hash_embed_partition_invariant(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.text import feature_hash_embed

    docs = load_table(spark, SF_DIR, "documents")
    outs = [
        sorted(
            (r["doc_id"], tuple(r["embedding"]))
            for r in feature_hash_embed(d, dim=32).collect()
        )
        for d in _variants(docs)
    ]
    assert outs[0] and all(o == outs[0] for o in outs[1:])


def test_exact_dedup_partition_invariant(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.dedup import exact_dedup

    docs = load_table(spark, SF_DIR, "documents")
    outs = [
        _rowset(exact_dedup(d, ["text"], "doc_id").select("doc_id"))
        for d in _variants(docs)
    ]
    assert outs[0] and all(o == outs[0] for o in outs[1:])
