"""Incremental LSH dedup: the survivor set must be chunking-invariant
and equal the batch anti-join rule, because the signature store keeps
every seen doc (dropped included)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_price_data_pipeline_spark.io.sources import load_table
from crypto_price_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs
from crypto_price_data_pipeline_spark.streaming.dedup_stream import (
    stream_minhash_dedup,
)

SF = "/root/testdata/sf0.001"


def _batch_rule_survivors(docs):
    pairs = ngram_jaccard_pairs(
        docs, k=3, threshold=0.4, block_cols=None, max_docs=None
    )
    dropped = {r["id_b"] for r in pairs.select("id_b").distinct().collect()}
    return {r["doc_id"] for r in docs.select("doc_id").collect()} - dropped


def test_stream_dedup_chunk_invariant_and_matches_batch(spark):
    docs = load_table(spark, SF, "documents")
    want = _batch_rule_survivors(docs)
    for n_chunks in (1, 3):
        surv = stream_minhash_dedup(
            spark, docs, keep_cols=["lang"], threshold=0.4, n_chunks=n_chunks
        )
        got = {r["doc_id"] for r in surv.collect()}
        assert got == want, f"n_chunks={n_chunks}"
        # survivors keep their payload columns intact
        assert surv.columns == ["doc_id", "text", "lang"]
