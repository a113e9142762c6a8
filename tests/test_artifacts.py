"""Corpus artifact store (artifacts.py): build-once semantics, parquet
round-trip fidelity, degenerate-corpus fallback, forced rebuild."""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_artifacts_match_direct_build(spark):
    """Stored base+minima must be row-identical to a direct in-session
    build (the parquet round-trip changes nothing)."""
    from pyspark.sql import functions as F

    from crypto_price_data_pipeline_spark import artifacts
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.dedup import (
        minhash_min_cols,
        with_shingles,
    )

    docs = load_table(spark, SF, "documents")
    direct_base = with_shingles(
        docs, "doc_id", "text", k=3, keep_cols=["lang"]
    ).withColumn("_n", F.size("_shingles")).persist()
    direct_mins = {
        r["doc_id"]: [r[f"_m{i}"] for i in range(64)]
        for r in minhash_min_cols(
            direct_base, "doc_id", 64, 42, keep_cols=["_n", "lang"]
        ).collect()
    }
    stored_mins = {
        r["doc_id"]: [r[f"_m{i}"] for i in range(64)]
        for r in artifacts.minhash_mins(spark, SF).collect()
    }
    assert stored_mins == direct_mins
    direct_sh = {
        r["doc_id"]: sorted(r["_shingles"]) for r in direct_base.collect()
    }
    stored_sh = {
        r["doc_id"]: sorted(r["_shingles"])
        for r in artifacts.minhash_base(spark, SF).collect()
    }
    direct_base.unpersist()
    assert stored_sh == direct_sh


def test_artifact_builds_once_then_reads_parquet(spark):
    """Second access must serve the same parquet directory (no rebuild);
    rebuild() must produce a fresh directory with identical content."""
    from crypto_price_data_pipeline_spark import artifacts

    key = ("simhash32", os.path.abspath(SF))
    artifacts.simhash32_table(spark, SF).count()
    d1 = artifacts._DIRS[key]
    artifacts.simhash32_table(spark, SF).count()
    assert artifacts._DIRS[key] == d1, "second access rebuilt the artifact"

    before = {r["doc_id"]: r["simhash32"] for r in artifacts.simhash32_table(spark, SF).collect()}
    artifacts.rebuild(spark, SF, "simhash32")
    d2 = artifacts._DIRS[key]
    assert d2 != d1, "rebuild must write a fresh directory"
    after = {r["doc_id"]: r["simhash32"] for r in artifacts.simhash32_table(spark, SF).collect()}
    assert after == before


def test_artifact_empty_corpus_falls_back_lazy(spark, tmp_path):
    """A corpus whose build writes an unreadable (footer-less) parquet
    must fall back to the lazy plan and keep returning correct empty
    results instead of crashing."""
    from crypto_price_data_pipeline_spark import artifacts
    from crypto_price_data_pipeline_spark.io.sources import load_table

    docs = load_table(spark, SF, "documents").limit(0)
    empty_dir = str(tmp_path / "empty_sf")
    os.makedirs(empty_dir)
    docs.write.parquet(os.path.join(empty_dir, "documents.parquet"))

    out = artifacts.winnow_postings(spark, empty_dir)
    assert out.count() == 0
    # and again (whether cached as a dir or as the fallback sentinel)
    assert artifacts.winnow_postings(spark, empty_dir).count() == 0


def test_tfidf_weights_match_inline_definition(spark):
    """The stored weight postings equal the reference tf*N/df definition
    computed inline (modulo the documented injective term recode — the
    comparison keys on (doc_id, w multiset))."""
    from pyspark.sql import functions as F

    from crypto_price_data_pipeline_spark import artifacts
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.text import tokenize

    docs = load_table(spark, SF, "documents")
    n_docs = docs.count()
    toked = docs.select("doc_id", tokenize("text").alias("t")).where(F.size("t") >= 3)
    terms = toked.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t)-3),"
                " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
            )
        ).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") <= 50)
    ref = (
        tf.join(df_, "term")
        .select("doc_id", (F.col("tf") * F.lit(float(n_docs)) / F.col("df")).alias("w"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("w")).alias("ws"))
    )
    got = (
        artifacts.tfidf_weights(spark, SF)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("w")).alias("ws"))
    )
    ref_m = {r["doc_id"]: r["ws"] for r in ref.collect()}
    got_m = {r["doc_id"]: r["ws"] for r in got.collect()}
    assert got_m == ref_m
