"""Property-based tests (hypothesis): operator semantics hold across
randomized inputs, cross-checked against pandas/python references.

Few examples per property (Spark jobs are ~100ms+ each); deadline off.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ts_strat = st.integers(min_value=0, max_value=10_000)
key_strat = st.integers(min_value=0, max_value=3)


@given(
    left=st.lists(st.tuples(key_strat, ts_strat), min_size=1, max_size=25),
    right=st.lists(st.tuples(key_strat, ts_strat), min_size=1, max_size=25),
)
@settings(**SETTINGS)
def test_asof_join_matches_pandas(spark, left, right):
    from crypto_price_data_pipeline_spark.operators.asof import asof_join
    from pyspark.sql import functions as F

    ldf = spark.createDataFrame(
        [(k, t, float(i)) for i, (k, t) in enumerate(left)], "k int, t long, lv double"
    ).withColumn("t", F.timestamp_micros(F.col("t") * 1_000_000))
    rdf = spark.createDataFrame(
        [(k, t, float(100 + i)) for i, (k, t) in enumerate(right)],
        "k int, t long, rv double",
    ).withColumn("t", F.timestamp_micros(F.col("t") * 1_000_000))
    # de-dup equal (k, t) on the right like merge_asof would keep last sorted
    rdf = rdf.groupBy("k", "t").agg(F.max("rv").alias("rv"))

    got = {
        (r["k"], r["t"], r["lv"]): r["rv"]
        for r in asof_join(ldf, rdf, on="t", by=["k"]).collect()
    }

    lp = ldf.toPandas().sort_values("t")
    rp = rdf.toPandas().sort_values("t")
    expected = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    for _, row in expected.iterrows():
        want = None if pd.isna(row["rv"]) else row["rv"]
        assert got[(row["k"], row["t"], row["lv"])] == want


@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=40
    ),
    ranges=st.lists(
        st.tuples(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            st.floats(min_value=1.0, max_value=1e5, allow_nan=False),
        ),
        min_size=1,
        max_size=5,
    ),
)
@settings(**SETTINGS)
def test_band_join_bucketed_equals_broadcast(spark, values, ranges):
    from crypto_price_data_pipeline_spark.operators.range_join import band_join

    facts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "id int, v double"
    )
    rdf = spark.createDataFrame(
        [(float(lo), float(lo + w), f"r{i}") for i, (lo, w) in enumerate(ranges)],
        "lo double, hi double, tier string",
    )
    a = sorted((r["id"], r["tier"]) for r in band_join(facts, rdf, "v").collect())
    b = sorted(
        (r["id"], r["tier"])
        for r in band_join(facts, rdf, "v", bucket_width=1000.0).collect()
    )
    assert a == b


@given(
    docs=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=12
    )
)
@settings(**SETTINGS)
def test_exact_dedup_keeps_one_per_key(spark, docs):
    from crypto_price_data_pipeline_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "id long, text string"
    )
    out = exact_dedup(df, ["text"], "id").collect()
    texts = [r["text"] for r in out]
    assert sorted(set(texts)) == sorted(texts)  # one row per distinct text
    expected = {}
    for i, d in enumerate(docs):
        expected.setdefault(d, i)
    assert {r["text"]: r["id"] for r in out} == expected  # min id kept
