"""Wave-29 units: fairness accounting, yield-curve monotonicity,
tail-contribution bounds."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_fairness_audit_accounts_all_customers(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_fairness_audit"](spark, SF).collect()
    total = load_table(spark, SF, "customer").count()
    assert sum(r["n_customers"] for r in rows) == total
    rates = [r["rate_r9"] for r in rows]
    di = rows[0]["disparate_impact_r9"]
    assert all(r["disparate_impact_r9"] == di for r in rows)
    assert abs(di - min(rates) / max(rates)) < 1e-8
    assert 0.0 < di <= 1.0
    for r in rows:
        assert 0 <= r["n_with_orders"] <= r["n_customers"]


def test_yield_curve_monotone(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_yield_curve"](spark, SF).collect()
    assert [r["thr"] for r in rows] == [0.0, 0.2, 0.4, 0.6, 0.8]
    docs = [r["docs_kept"] for r in rows]
    toks = [r["tokens_kept"] for r in rows]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert docs[0] == load_table(spark, SF, "documents").count()
    assert abs(rows[0]["token_yield_r9"] - 1.0) < 1e-9


def test_percentile_contribution_bounds(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    r = QUERIES["q_percentile_contribution"](spark, SF).first()
    # ~10% of orders sit at or above p90 (interpolation can shift a few)
    frac = r["n_tail_orders"] / r["n_orders"]
    assert 0.05 <= frac <= 0.15
    # the top decile by value must carry MORE than its count share
    assert r["tail_revenue_share_r9"] > frac
    assert r["tail_revenue_share_r9"] < 1.0
