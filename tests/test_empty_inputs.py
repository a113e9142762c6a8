"""Empty-corpus robustness: every registry query must return a
well-defined (typically empty) result on empty input tables instead of
crashing.

The round-8 advice flagged one instance (q_equi_depth_histogram's
float(None) on an empty orders table); a round-9 sweep found the same
CLASS in 25 queries — driver-side .first()/.count() arithmetic on
None/zero (probe-vector selection, avgdl, percentile thresholds, CBO
ratios), ANSI divide-by-zero on zero counts, and schema inference over
an empty partitioned write. All are now guarded with empty
short-circuits that preserve the non-empty output schema; this sweep
pins the contract registry-wide so a new query with unguarded driver
arithmetic fails CI, not a production run on a filtered-to-empty
partition."""

from __future__ import annotations

import os

import pytest

# slow tier (see pytest.ini): each sweep here collects EVERY registry
# query (~300) on a degenerate corpus — 200-300 s per test at 32
# cores, the three together ~45% of the whole suite's wall clock.
pytestmark = pytest.mark.slow

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory):
    """Empty twins of every testdata table, real schemas preserved."""
    from crypto_price_data_pipeline_spark.io.sources import load_table

    d = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{t}.parquet"))
    return d


def _sweep(spark, sf_dir):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    fails = {}
    for name, fn in QUERIES.items():
        try:
            fn(spark, sf_dir).collect()
        except Exception as e:  # noqa: BLE001 - collecting a report
            fails[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
    return fails


def test_every_registry_query_survives_empty_input(spark, empty_sf_dir):
    fails = _sweep(spark, empty_sf_dir)
    assert not fails, f"queries crashing on empty input: {fails}"


@pytest.fixture(scope="session")
def tiny_sf_dir(spark, tmp_path_factory):
    """Single-row twins: degenerate domains (span 0, n=1 variance,
    KMeans with fewer samples than clusters, one-day series)."""
    from crypto_price_data_pipeline_spark.io.sources import load_table

    d = str(tmp_path_factory.mktemp("sf_tiny"))
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{t}.parquet"))
    return d


def test_every_registry_query_survives_single_row_input(spark, tiny_sf_dir):
    """The round-9 degenerate sweep: n==1 sample variance, zero spans,
    zero denominators, and sub-k KMeans fits all go NULL/empty/
    direct-centroid instead of raising — pinned registry-wide."""
    fails = _sweep(spark, tiny_sf_dir)
    assert not fails, f"queries crashing on single-row input: {fails}"


@pytest.fixture(scope="session")
def dup_sf_dir(spark, tmp_path_factory):
    """Ten identical copies of one row per table: zero variance with
    n > 1, KMeans over coincident points, tie-heavy ordering."""
    from pyspark.sql import functions as F

    from crypto_price_data_pipeline_spark.io.sources import load_table

    d = str(tmp_path_factory.mktemp("sf_dup"))
    for t in TABLES:
        one = load_table(spark, "/root/testdata/sf0.001", t).limit(1)
        ten = one.crossJoin(spark.range(10).select(F.lit(1).alias("_x"))).drop(
            "_x"
        )
        ten.write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    return d


def test_every_registry_query_survives_duplicate_rows(spark, dup_sf_dir):
    """Third degenerate class: duplicated rows. Zero-variance guards
    and the distinct-clamped KMeans must hold; the intended
    exceptions are the packing/ordering family — q_seq_packing
    (with_global_offsets duplicate-id guard), q_shard_manifest
    (global_order_offsets_inplan's duplicate-key-tuple guard, r11),
    and q_pack_slices (rides with_global_offsets) — all exist
    precisely to FAIL THE JOB on a corrupt (duplicate doc_id) corpus,
    where ranks and offsets would be nondeterministic — asserted as
    the designed diagnostic, not skipped.

    q_bpe_chunks LEFT this list in r16: its per-distinct-word rewrite
    derives per-doc counts through a groupBy(doc_id), which merges a
    duplicated doc's tokens into one row — exactly what its DuckDB
    oracle's ``dcnt`` CTE (``toks JOIN wsym ... GROUP BY doc_id``)
    has always computed, so engine and oracle now AGREE on corrupt
    corpora where they previously diverged (engine raised, oracle
    merged). The duplicate diagnostic for raw packing inputs stays
    pinned by the three names above; doc_ids reaching q_bpe_chunks'
    packing stage are unique by construction post-aggregate."""
    fails = _sweep(spark, dup_sf_dir)
    for name in (
        "q_seq_packing",
        "q_shard_manifest",
        "q_pack_slices",
    ):
        msg = fails.pop(name, None)
        assert msg is not None and "duplicate" in msg, (
            f"{name} must reject duplicate doc_ids loudly; got: {msg}"
        )
    assert not fails, f"queries crashing on duplicated rows: {fails}"
