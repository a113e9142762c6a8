"""Unit tests for the text→vector bridge (feature_hash_embed) and its
compositions (knn_join, semantic dedup query wiring)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_feature_hash_embed_counts_and_determinism(spark):
    from crypto_price_data_pipeline_spark.operators.text import feature_hash_embed

    df = _docs(
        spark,
        [
            (1, "alpha beta gamma alpha"),
            (2, "Alpha, BETA; gamma ALPHA!"),  # same alnum tokens after lowering
            (3, ""),
        ],
    )
    out = {r["doc_id"]: r["embedding"] for r in feature_hash_embed(df, dim=16).collect()}
    assert len(out[1]) == 16
    # vector sums to token count; identical token multisets → identical vectors
    assert sum(out[1]) == 4.0
    assert out[1] == out[2]
    # empty doc → zero vector, not null/crash
    assert sum(out[3]) == 0.0
    # deterministic across evaluations
    again = {r["doc_id"]: r["embedding"] for r in feature_hash_embed(df, dim=16).collect()}
    assert again == out


def test_feature_hash_embed_bucket_is_md5_mod_dim(spark):
    from crypto_price_data_pipeline_spark.operators.text import feature_hash_embed

    import hashlib

    tok = "alpha"
    dim = 16
    bucket = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim
    vec = feature_hash_embed(_docs(spark, [(1, tok)]), dim=dim).first()["embedding"]
    assert vec[bucket] == 1.0 and sum(vec) == 1.0


def test_knn_join_planted_twin_and_gate(spark):
    from crypto_price_data_pipeline_spark.operators.similarity import knn_join

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),  # exact twin of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.9, 0.1, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_join(emb, k=1)
    top = {r["vec_id"]: (r["nbr_id"], r["cosine_sim_r9"], r["rnk"]) for r in out.collect()}
    assert top[1] == (2, 1.0, 1)
    assert top[2] == (1, 1.0, 1)
    assert top[4][0] in (1, 2)
    # every item gets exactly k neighbors
    assert out.count() == 4
    with pytest.raises(ValueError, match="knn_join"):
        knn_join(emb, k=1, max_rows=2).collect()


def test_knn_join_plan_is_broadcast_and_single_window(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.similarity import knn_join

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = knn_join(emb, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_clusters_transitively(spark):
    """A~B and B~C near-identical docs must land in ONE cluster with
    only the min doc_id kept, even if A~C was weaker."""
    from crypto_price_data_pipeline_spark.queries import QUERIES

    out = QUERIES["q_semantic_dedup"](spark, SF_DIR).collect()
    assert len(out) > 0
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert len(members) >= 2
        kept = [m for m in members if m["kept"]]
        assert len(kept) == 1 and kept[0]["doc_id"] == cid == min(m["doc_id"] for m in members)
