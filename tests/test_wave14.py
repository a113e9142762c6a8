"""Wave-14 units: retention-triangle structure, A/B conservation,
block-shuffle contiguity, sliding-chunk coverage, streamed moments ≡
batch, co-occurrence invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_cohort_retention_triangle(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_cohort_retention"](spark, SF).collect()
    assert rows and all(r["week_offset"] >= 0 for r in rows)
    # every cohort has its offset-0 cell, and that cell is its largest
    by_cohort: dict[str, dict[int, int]] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], {})[r["week_offset"]] = r["n_users"]
    for cells in by_cohort.values():
        assert 0 in cells
        assert cells[0] == max(cells.values())
    # offset-0 cells together count every user exactly once
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert sum(c[0] for c in by_cohort.values()) == n_users


def test_ab_assign_conserves_users(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_ab_assign"](spark, SF).collect()
    assert [r["arm"] for r in rows] == ["control", "treatment"]
    total = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == total
    for r in rows:
        assert 0.0 <= r["conv_rate"] <= 1.0
        assert r["purchasers"] <= r["n_users"]


def test_block_shuffle_blocks_contiguous_and_permuted(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = sorted(
        QUERIES["q_block_shuffle"](spark, SF).collect(), key=lambda r: r["block"]
    )
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        # docs of one block occupy a contiguous pos range
        assert r["last_pos"] - r["first_pos"] + 1 == r["n_docs"]
    # the block order is a real permutation, not identity
    firsts = [r["first_pos"] for r in rows]
    assert firsts != sorted(firsts)
    covered = sorted((r["first_pos"], r["last_pos"]) for r in rows)
    assert covered[0][0] == 1 and covered[-1][1] == n_docs
    for (a, b), (c, d) in zip(covered, covered[1:]):
        assert c == b + 1


def test_sliding_chunks_cover_all_tokens(spark):
    """Stride-16/len-32 windows cover every token position at least
    once, so chunk tokens must be >= corpus tokens (and <= 2x: each
    position lands in at most two windows)."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.text import tokenize
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_sliding_chunks"](spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    per_lang = {
        r["lang"]: r["total"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(tokenize("text"))).alias("total"))
        .collect()
    }
    for r in rows:
        assert per_lang[r["lang"]] <= r["n_chunk_tokens"] <= 2 * per_lang[r["lang"]]


def test_stream_moments_equals_batch(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    streamed = [tuple(r) for r in QUERIES["q_stream_moments"](spark, SF).collect()]
    batch = [tuple(r) for r in QUERIES["q_stats_moments"](spark, SF).collect()]
    assert streamed == batch


def test_cooccurrence_invariants(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_cooccurrence"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["tok_a"] < r["tok_b"]
        assert r["n_ab"] >= 10
        assert r["lift"] > 0
