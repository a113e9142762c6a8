"""Wave-11 units: MERGE conservation, fixed-point PageRank
partition-invariance and mass bounds, MMR structure, vocab/OOV bounds,
shard-manifest contiguity, hard-negative label constraint."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_merge_upsert_conservation_and_actions(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_merge_upsert"](spark, SF).collect()
    base = load_table(spark, SF, "customer")
    n_base = base.count()
    keys = {r["c_custkey"] for r in rows}
    assert len(keys) == len(rows), "merge result must be unique per key"
    by_action = {}
    for r in rows:
        by_action.setdefault(r["merge_action"], []).append(r)
    assert set(by_action) <= {"kept", "updated", "inserted"}
    # every inserted key is outside the base key range; every
    # kept/updated key is a base key
    base_keys = {r["c_custkey"] for r in base.select("c_custkey").collect()}
    for r in by_action.get("inserted", []):
        assert r["c_custkey"] not in base_keys
        assert r["c_mktsegment"] == "CDC"
    for a in ("kept", "updated"):
        for r in by_action.get(a, []):
            assert r["c_custkey"] in base_keys
    # conservation: survivors = base - deletes-that-matched
    n_del_matched = n_base - len(by_action.get("kept", [])) - len(
        by_action.get("updated", [])
    )
    assert n_del_matched >= 0
    assert len(rows) == n_base - n_del_matched + len(by_action.get("inserted", []))


def test_pagerank_partition_invariant_and_bounded(spark):
    """Fixed-point integer ranks are bit-identical under any input
    partitioning (the property float PageRank does not have), and the
    total mass stays within (base*n, scale]."""
    from crypto_price_data_pipeline_spark.operators.graph import weighted_pagerank

    edges = spark.createDataFrame(
        [(0, 1, 3), (1, 2, 2), (2, 0, 5), (0, 2, 1), (3, 0, 7)],
        "src int, dst int, w int",
    )
    r1 = {
        (r["node"], r["rank_scaled"])
        for r in weighted_pagerank(edges, n_iter=5).collect()
    }
    r2 = {
        (r["node"], r["rank_scaled"])
        for r in weighted_pagerank(edges.repartition(7, "dst"), n_iter=5).collect()
    }
    assert r1 == r2
    total = sum(v for _, v in r1)
    scale, n = 10**12, 4
    base = (15 * scale) // (100 * n)
    assert base * n <= total <= scale
    # node 3 has no incoming edges: exactly the base term
    assert dict(r1)[3] == base


def test_mmr_is_diverse_subset_of_shortlist(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        mmr_rerank,
    )

    emb = load_table(spark, SF, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    out = mmr_rerank(emb, qv, k=5, shortlist=12, lam=0.7).collect()
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    picked = [r["vec_id"] for r in out]
    assert len(set(picked)) == 5
    short = [r["vec_id"] for r in cosine_topk(emb, qv, k=12).collect()]
    assert set(picked) <= set(short)
    # rank 1 is the pure-relevance argmax
    assert picked[0] == short[0]


def test_vocab_coverage_bounds(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_vocab_coverage"](spark, SF).collect()
    assert rows, "held-out split must be non-empty"
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tok"]
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert abs(r["oov_rate"] - r["n_oov"] / r["n_tok"]) < 1e-15


def test_shard_manifest_contiguous_and_conserving(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.text import tokenize
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = sorted(
        QUERIES["q_shard_manifest"](spark, SF).collect(), key=lambda r: r["shard_id"]
    )
    docs = load_table(spark, SF, "documents")
    n_docs = docs.count()
    n_tok = docs.select(F.sum(F.size(tokenize("text")))).first()[0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["n_tokens"] for r in rows) == n_tok
    # shards partition the position sequence contiguously
    assert rows[0]["first_pos"] == 1
    for prev, cur in zip(rows, rows[1:]):
        assert cur["first_pos"] == prev["last_pos"] + 1
    assert rows[-1]["last_pos"] == n_docs


def test_hard_negatives_have_different_labels(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_hard_negatives"](spark, SF).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, SF, "embeddings").select("vec_id", "label").collect()
    }
    assert len(rows) == 8 * 3
    for r in rows:
        assert labels[r["vec_id"]] != labels[r["q_id"]]
        assert 1 <= r["neg_rank"] <= 3


def test_merge_upsert_rejects_duplicate_change_keys(spark):
    """ADVICE r7: a duplicate-key change batch must fail the job via
    the in-plan guard, not silently fan out base rows; validate=False
    keeps the documented caller-guaranteed fast path."""
    import pytest
    from pyspark.sql import functions as F

    from crypto_price_data_pipeline_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    dup = spark.createDataFrame(
        [(1, "upsert", 11), (1, "upsert", 12)], "id long, op string, v long"
    )
    merged = merge_upsert(
        base, dup, "id", update_set={"v": "v"}, insert_values={"v": F.col("_chg_v")}
    )
    with pytest.raises(Exception, match="duplicate key in changes"):
        merged.collect()
    unique = dup.limit(1)
    ok = merge_upsert(
        base, unique, "id", update_set={"v": "v"}, insert_values={"v": F.col("_chg_v")}
    )
    assert {(r["id"], r["v"]) for r in ok.collect()} == {(1, 11), (2, 20)}
