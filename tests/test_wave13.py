"""Wave-13 units: heavy-hitter partition invariance + completeness,
streamed ≡ batch, temporal-join conservation, weighted-sample rule,
robust-scale sanity, interval-coverage bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _tokens(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.text import tokenize

    return load_table(spark, SF, "documents").select(
        F.explode(tokenize("text")).alias("token")
    )


def test_heavy_hitters_partition_invariant_and_complete(spark):
    """The exact result must not depend on the partitioning that shaped
    the Misra-Gries candidates, and must equal the brute-force
    groupBy + integer-threshold filter."""
    from crypto_price_data_pipeline_spark.operators.frequency import heavy_hitters

    toks = _tokens(spark)
    den = 50
    a = {tuple(r) for r in heavy_hitters(toks, "token", den=den).collect()}
    b = {
        tuple(r)
        for r in heavy_hitters(toks.repartition(13), "token", den=den).collect()
    }
    c = {tuple(r) for r in heavy_hitters(toks.coalesce(1), "token", den=den).collect()}
    assert a == b == c and a
    n = toks.count()
    brute = {
        tuple(r)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") * den > n)
        .collect()
    }
    assert a == brute


def test_heavy_hitters_sketch_bounds_memory(spark):
    """With a tiny den the candidate sketch must still never miss a
    true heavy hitter (MG guarantee), even when compression kicks in."""
    from crypto_price_data_pipeline_spark.operators.frequency import heavy_hitters

    toks = _tokens(spark)
    den = 3  # far fewer counters than distinct tokens -> compression
    n = toks.count()
    got = {r["token"] for r in heavy_hitters(toks, "token", den=den).collect()}
    brute = {
        r["token"]
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") * den > n)
        .collect()
    }
    assert got == brute


def test_stream_heavy_hitters_equals_batch(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    streamed = [tuple(r) for r in QUERIES["q_stream_heavy_hitters"](spark, SF).collect()]
    batch = [tuple(r) for r in QUERIES["q_heavy_hitters"](spark, SF).collect()]
    assert streamed == batch


def test_temporal_join_conserves_clicks(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_temporal_join"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    n_clicks = ev.where(F.col("event_type") == "click").count()
    assert sum(r["n_clicks"] for r in rows) == n_clicks
    assert {r["tier_asof"] for r in rows} <= {"low", "mid", "high", "none"}


def test_weighted_sample_rule_is_exact(spark):
    """Membership must equal the integer rule computed independently,
    and every >=512-token doc is always kept."""
    import hashlib

    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.text import tokenize
    from crypto_price_data_pipeline_spark.queries import QUERIES

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", F.size(tokenize("text")).alias("n_tok")
    ).collect()
    expect: dict[str, list[int]] = {}
    for r in docs:
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        if h * 512 < r["n_tok"] * 2**32:
            expect.setdefault(r["lang"], []).append(r["doc_id"])
    out = {r["lang"]: r for r in QUERIES["q_weighted_sample"](spark, SF).collect()}
    assert set(out) == set(expect)
    for lang, ids in expect.items():
        assert out[lang]["n_kept"] == len(ids)
        assert out[lang]["id_checksum"] == sum(ids)


def test_robust_scale_sanity(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_robust_scale"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n"]
        assert r["iqr_val"] >= 0


def test_interval_coverage_bounds(spark):
    """Covered time is at least the longest single interval and at most
    the sum of all durations (union ≤ sum; union ≥ max element)."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    out = {r["user_id"]: r for r in QUERIES["q_interval_coverage"](spark, SF).collect()}
    ev = load_table(spark, SF, "events").select("user_id", "value").collect()
    durs: dict[int, list[int]] = {}
    for r in ev:
        durs.setdefault(r["user_id"], []).append(max(int(round(r["value"] * 1e6)), 0))
    for uid, r in out.items():
        assert r["n_islands"] >= 1
        assert max(durs[uid]) <= r["covered_micros"] <= sum(durs[uid])


def test_heavy_hitters_numeric_key_schema(spark):
    """ADVICE r7: the candidate schema derives from the input column's
    type — a bigint key round-trips exactly instead of coercing
    through string."""
    from crypto_price_data_pipeline_spark.operators.frequency import heavy_hitters

    df = spark.createDataFrame([(i % 4,) for i in range(100)] + [(99,)], "k long")
    out = heavy_hitters(df, "k", den=5)
    assert out.schema["k"].dataType.typeName() == "long"
    assert {(r["k"], r["freq"]) for r in out.collect()} == {
        (0, 25),
        (1, 25),
        (2, 25),
        (3, 25),
    }
