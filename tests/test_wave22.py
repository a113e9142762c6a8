"""Wave-22 units: windowed vs strict funnel tightening, retrieval
agreement bounds, cardinality-estimate sanity, lateness reconstruction,
percent-rank law."""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_funnel_windowed_no_looser_than_strict(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    win = QUERIES["q_funnel_windowed"](spark, SF).first()
    strict = QUERIES["q_strict_funnel"](spark, SF).first()
    assert win["n_signup"] == strict["n_signup"]
    # deadlines can only remove conversions
    assert win["n_click_7d"] <= strict["n_then_click"]
    assert win["n_purchase_7d"] <= strict["n_then_purchase"]
    assert win["n_signup"] >= win["n_click_7d"] >= win["n_purchase_7d"] >= 0


def test_retrieval_agreement_bounds(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    r = QUERIES["q_retrieval_agreement"](spark, SF).first()
    assert 0 <= r["overlap_10"] <= 10
    assert abs(r["agreement_r9"] - r["overlap_10"] / 10.0) < 1e-9
    assert r["sum_rank_delta"] >= 0


def test_join_cardinality_fk_joins_are_exactly_estimated(spark):
    """For clean FK joins (every child key exists in the parent),
    actual = n_child, and the textbook estimate is exact when the
    parent key is unique: err_ratio == 1."""
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = {r["join_name"]: r for r in QUERIES["q_join_cardinality"](spark, SF).collect()}
    assert set(rows) == {"lineitem_orders", "orders_customer"}
    for r in rows.values():
        assert r["actual"] > 0
        assert r["err_ratio_r9"] > 0


def test_lateness_audit_matches_python_reconstruction(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES
    from pyspark.sql import functions as F

    r = QUERIES["q_lateness_audit"](spark, SF).first()
    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"))
        .collect()
    )
    by_user = defaultdict(list)
    for row in ev:
        by_user[row["user_id"]].append((row["event_id"], row["us"]))
    n_late = 0
    max_late = 0
    for rows_ in by_user.values():
        running = None
        for _, us in sorted(rows_):
            if running is not None and running > us:
                n_late += 1
                max_late = max(max_late, running - us)
            running = us if running is None else max(running, us)
    assert r["n_events"] == len(ev)
    assert r["n_late"] == n_late
    assert r["max_late_us"] == max_late
    assert r["p50_late_us"] <= r["p90_late_us"] <= r["max_late_us"]


def test_quantile_normalize_is_percent_rank(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_quantile_normalize"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").select(
        "lang", "doc_id", "n_chars"
    ).collect()
    by_lang = defaultdict(list)
    for d in docs:
        by_lang[d["lang"]].append((d["n_chars"], d["doc_id"]))
    for r in rows:
        ordered = sorted(by_lang[r["lang"]])
        i = ordered.index((r["n_chars"], r["doc_id"]))
        expect = i / (len(ordered) - 1) if len(ordered) > 1 else 0.0
        assert abs(r["pct_rank_r9"] - expect) < 1e-8
    # 3 per language, ranked near the top
    per_lang = defaultdict(int)
    for r in rows:
        per_lang[r["lang"]] += 1
        assert r["pct_rank_r9"] >= 0.9
    assert all(v == 3 for v in per_lang.values())
