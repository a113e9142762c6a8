"""Wave-17 units: provenance partition property, funnel monotonicity,
subsample-CI bounds, streamed bigrams ≡ batch, band ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_dedup_provenance_is_consistent_partition(spark):
    """Clusters are disjoint, survivors are their own minimum, the
    checksum matches the member list, and the survivor set agrees with
    dedup_keep_component_min."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.components import (
        dedup_keep_component_min,
    )
    from crypto_price_data_pipeline_spark.operators.dedup import minhash_then_exact
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_dedup_provenance"](spark, SF).collect()

    # absorbed_ids is serialized as a comma-joined string (round 9 —
    # the driver canonicalizer can't sort list cells); parse it back
    def absorbed(r) -> list[int]:
        return [int(x) for x in r["absorbed_ids"].split(",") if x]

    seen: set[int] = set()
    for r in rows:
        members = [r["survivor"], *absorbed(r)]
        assert r["survivor"] == min(members)
        assert len(members) == r["n_members"]
        assert sum(members) == r["member_checksum"]
        assert not (seen & set(members)), "clusters must be disjoint"
        seen |= set(members)
    docs = load_table(spark, SF, "documents")
    pairs = minhash_then_exact(docs, threshold=0.5).select("id_a", "id_b")
    kept = {
        r["doc_id"]
        for r in dedup_keep_component_min(docs, pairs, "doc_id")
        .select("doc_id")
        .collect()
    }
    all_absorbed = {i for r in rows for i in absorbed(r)}
    assert all_absorbed.isdisjoint(kept)
    assert all(r["survivor"] in kept for r in rows)


def test_strict_funnel_monotone(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    r = QUERIES["q_strict_funnel"](spark, SF).first()
    assert r["n_signup"] >= r["n_then_click"] >= r["n_then_purchase"] >= 0
    assert 0.0 <= r["rate_click"] <= 1.0
    assert 0.0 <= r["rate_purchase"] <= 1.0


def test_subsample_ci_brackets_grand_mean(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    r = QUERIES["q_subsample_ci"](spark, SF).first()
    assert r["n_buckets"] == 16
    assert r["min_bucket_mean"] <= r["grand_mean"] <= r["max_bucket_mean"]
    assert abs(r["spread"] - (r["max_bucket_mean"] - r["min_bucket_mean"])) < 1e-12


def test_stream_bigrams_equals_batch(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    streamed = [tuple(r) for r in QUERIES["q_stream_bigrams"](spark, SF).collect()]
    batch = [tuple(r) for r in QUERIES["q_event_bigrams"](spark, SF).collect()]
    assert streamed == batch


def test_daily_bands_ordered(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_daily_bands"](spark, SF).collect()
    assert len(rows) == 30
    for r in rows:
        assert r["p10"] <= r["p50"] <= r["p90"]
        assert r["n"] > 0
