"""Wave-31 units: survival monotonicity + endpoints, LTV triangle
laws, streamed reach ≡ batch."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_survival_curve_monotone_and_anchored(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_survival_curve"](spark, SF).collect()
    assert [r["k"] for r in rows] == list(range(30))
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert rows[0]["n_surviving"] == n_users  # span >= 0 is everyone
    assert abs(rows[0]["survival_r9"] - 1.0) < 1e-9
    surv = [r["n_surviving"] for r in rows]
    assert surv == sorted(surv, reverse=True)


def test_cohort_ltv_triangle_laws(spark):
    from collections import defaultdict

    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_cohort_ltv"](spark, SF).collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_month"]].append((r["age_months"], r["cum_revenue_r6"]))
    for cohort, cells in by_cohort.items():
        cells.sort()
        assert cells[0][0] == 0  # every cohort starts at age 0
        revs = [c[1] for c in cells]
        assert revs == sorted(revs)  # cumulative is nondecreasing
    n_cust = sum(
        {r["cohort_month"]: r["n_customers"] for r in rows}.values()
    )
    assert n_cust == load_table(spark, SF, "orders").select("o_custkey").distinct().count()
    # grand total equals total revenue
    grand = sum(max(c[1] for c in cells) for cells in by_cohort.values())
    total = float(
        load_table(spark, SF, "orders")
        .agg({"o_totalprice": "sum"})
        .first()[0]
    )
    assert abs(grand - total) < 1.0


def test_stream_reach_equals_batch(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    streamed = [tuple(r) for r in QUERIES["q_stream_reach"](spark, SF).collect()]
    batch = [tuple(r) for r in QUERIES["q_cumulative_reach"](spark, SF).collect()]
    assert streamed == batch
