"""Wave-15 units: quality-gate rule outcomes, streamed gate ≡ batch
rules, autocomplete structure, normalization idempotence, trend
direction vs brute force, decay weight bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_quality_gate_rules_and_outcomes(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = {r["rule_name"]: r for r in QUERIES["q_data_quality_gate"](spark, SF).collect()}
    assert len(rows) == 7
    for r in rows.values():
        assert 0 <= r["n_violations"] <= r["n_checked"]
        assert r["passed"] == (r["n_violations"] == 0)
    # the synthetic warehouse is referentially intact and key-unique
    for name in ("orders_fk_customer", "lineitem_fk_orders", "customer_key_unique",
                 "docs_nchars_consistent"):
        assert rows[name]["passed"], name
    # the date-range rule is the deliberately failing one (orders run
    # past 2001-01-01), proving the gate actually detects violations
    assert not rows["orders_date_in_range"]["passed"]


def test_stream_quality_gate_matches_direct_rules(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = {r["rule_name"]: r for r in QUERIES["q_stream_quality_gate"](spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    n = ev.count()
    assert all(r["n_checked"] == n for r in rows.values())
    assert rows["events_value_not_null"]["n_violations"] == ev.where(
        F.col("value").isNull()
    ).count()
    assert rows["events_type_known"]["n_violations"] == 0


def test_autocomplete_structure(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_autocomplete"](spark, SF).collect()
    assert rows
    by_prefix: dict[str, list] = {}
    for r in rows:
        assert r["token"].startswith(r["prefix"])
        by_prefix.setdefault(r["prefix"], []).append(r)
    for prefix, rs in by_prefix.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        freqs = [r["freq"] for r in sorted(rs, key=lambda x: x["rank"])]
        assert freqs == sorted(freqs, reverse=True)


def test_text_normalize_idempotent_and_shrinking(spark):
    """Applying the normalization twice must equal applying it once
    (idempotence), and it never grows the text."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_text_normalize"](spark, SF).collect()
    for r in rows:
        assert r["chars_after"] <= r["chars_before"]

    docs = load_table(spark, SF, "documents")

    def norm(c):
        return F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(c), "[^a-z0-9 ]", ""), " +", " "
            )
        )

    twice_differs = docs.select(
        norm(F.col("text")).alias("once")
    ).where(norm(F.col("once")) != F.col("once"))
    assert twice_differs.count() == 0


def test_linear_trend_matches_numpy(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    import numpy as np

    out = {r["event_type"]: r for r in QUERIES["q_linear_trend"](spark, SF).collect()}
    ev = load_table(spark, SF, "events").select("event_type", "ts", "value").collect()
    t0 = min(r["ts"] for r in ev)
    by_type: dict[str, list] = {}
    for r in ev:
        x = (r["ts"] - t0).total_seconds() / 86400.0
        by_type.setdefault(r["event_type"], []).append((x, r["value"]))
    for et, pts in by_type.items():
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(out[et]["slope_per_day"] - slope) < 1e-6
        assert abs(out[et]["intercept"] - intercept) < 1e-4


def test_decayed_score_bounded_by_plain_sum(spark):
    """Every weight is in (0, 1], so the decayed score of non-negative
    contributions is bounded by the undecayed sum; with mixed-sign
    values, |decayed| <= sum of |value|."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = {r["event_type"]: r for r in QUERIES["q_decayed_score"](spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    caps = {
        r["event_type"]: r["cap"]
        for r in ev.groupBy("event_type").agg(F.sum(F.abs("value")).alias("cap")).collect()
    }
    for et, r in rows.items():
        assert abs(r["decayed_score"]) <= caps[et] + 1e-6
