"""Wave-35 units: minhash band-bucket group stats + the firstband
pair strategy (the near-dup-heavy complement of wave 34's simhash
strategy work): bit-identical pair sets on both corpus regimes, the
artifact stamp / auto decision, stats correctness vs brute force, the
firstband plan's zero-dedup-shuffle shape, and the q_minhash_dupheavy
replica algebra invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _replica_corpus(docs, r):
    """Near-dup replicas: globally-unique text (doc marker + replica
    marker) at within-cluster Jaccard c/(c+2) — exact_dedup collapses
    nothing, the band join re-emits pairs once per agreeing band."""
    return docs.selectExpr(
        f"explode(sequence(0, {r - 1})) as _r", "doc_id", "text"
    ).selectExpr(
        f"doc_id * {r} + _r as doc_id",
        "concat(text, ' x', cast(doc_id as string), 'y z',"
        " cast(_r as string), 'w') as text",
    )


def test_minhash_strategies_bit_identical_and_auto_decision(spark):
    """plain and firstband must emit the IDENTICAL verified pair set on
    both corpus regimes; auto must pick plain on the mostly-distinct
    base corpus (artifact stamp stats) and firstband on the 16×-replica
    near-dup corpus (measured stats)."""
    from crypto_price_data_pipeline_spark import artifacts
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.dedup import (
        minhash_band_stats,
        minhash_lsh_pairs,
        minhash_min_cols,
        pick_minhash_strategy,
        with_shingles,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    dup = _replica_corpus(docs, 16)
    for corpus in (docs, dup):
        sets = {}
        for strat in ("plain", "firstband"):
            sets[strat] = sorted(
                (r.id_a, r.id_b, r.jaccard)
                for r in minhash_lsh_pairs(
                    corpus, threshold=0.5, strategy=strat
                ).collect()
            )
        assert sets["plain"] == sets["firstband"]
        assert len(sets["plain"]) > 0
    # artifact stamp carries the measured band stats; base corpus -> plain
    stamp = (
        artifacts.minhash_mins(spark, SF).schema.fields[0].metadata or {}
    )["artifact_params"]
    assert {"mh_n", "mh_band_pdup", "mh_stats_bands", "mh_stats_num_hashes"} <= set(
        stamp
    )
    assert stamp["mh_stats_bands"] == 16 and stamp["mh_stats_num_hashes"] == 64
    assert pick_minhash_strategy(stamp["mh_n"], stamp["mh_band_pdup"], 16) == "plain"
    # dup-heavy corpus -> firstband, on measured stats
    base = with_shingles(dup, "doc_id", "text", 3).persist()
    mins = minhash_min_cols(base, "doc_id", 64, 42).localCheckpoint(eager=True)
    base.unpersist()
    s = minhash_band_stats(mins, "doc_id", 64, 16)
    assert s["mh_n"] == 16 * docs.count()
    assert pick_minhash_strategy(s["mh_n"], s["mh_band_pdup"], 16) == "firstband"
    # unknown strategy rejected at construction
    with pytest.raises(ValueError, match="strategy"):
        minhash_lsh_pairs(docs, strategy="fastest")


def test_minhash_band_stats_matches_bruteforce(spark):
    """mh_band_pdup must equal the brute-force Σ C(m,2) over the
    (band, bucket) postings groups, and mh_n the document count."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.dedup import (
        band_buckets_from_cols,
        minhash_band_stats,
        minhash_min_cols,
        with_shingles,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(80)
    base = with_shingles(docs, "doc_id", "text", 3).persist()
    mins = minhash_min_cols(base, "doc_id", 64, 42).localCheckpoint(eager=True)
    base.unpersist()
    got = minhash_band_stats(mins, "doc_id", 64, 16)
    from collections import Counter

    groups = Counter(
        (r.band, r.bucket)
        for r in band_buckets_from_cols(mins, "doc_id", 64, 16).collect()
    )
    assert got["mh_n"] == mins.count() == 80
    assert got["mh_band_pdup"] == sum(m * (m - 1) // 2 for m in groups.values())


def test_firstband_plan_has_no_dedup_shuffle(spark):
    """The firstband path must contain NO pair-dedup stage: the plain
    plan deduplicates candidates (an Aggregate keyed on the pair),
    firstband replaces it with the in-join canonical-band filter."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_min_cols,
        with_shingles,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    base = with_shingles(docs, "doc_id", "text", 3).localCheckpoint(eager=True)
    mins = minhash_min_cols(base, "doc_id", 64, 42).localCheckpoint(eager=True)
    plans = {}
    for strat in ("plain", "firstband"):
        out = minhash_lsh_pairs(
            docs,
            threshold=0.5,
            base=base,
            mins=mins,
            strategy=strat,
            materialize=False,
        )
        plans[strat] = out._jdf.queryExecution().optimizedPlan().toString()
    # the optimizer lowers dropDuplicates to an Aggregate keyed on the
    # pair — present in plain, absent in firstband
    import re

    dedup = re.compile(r"Aggregate \[id_a#\d+L, id_b#\d+L\]")
    assert dedup.search(plans["plain"])
    assert not dedup.search(plans["firstband"])
    # the canonical filter keeps the band-vector comparison in-plan
    assert "posexplode" in plans["firstband"].lower()


def test_minhash_dupheavy_replica_algebra(spark):
    """q_minhash_dupheavy output: every within-cluster Jaccard group
    carries a pair count divisible by C(12,2)=66 (each original
    contributes its full replica clique to exactly one group), every
    cross group by 12² = 144, and within-Jaccards all sit at c/(c+2)
    ≥ 0.7 < 1 — near-dups, never exact."""
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_minhash_dupheavy"](spark, SF).collect()
    assert rows
    within = [r for r in rows if r.within]
    assert within, "replica clusters must surface"
    for r in rows:
        assert 0.7 <= r.jaccard < 1.0
        assert r.n_pairs % (66 if r.within else 144) == 0


def test_dsir_sample_selects_target_like_candidates(spark):
    """q_dsir_sample returns exactly the top-50 non-target docs with
    positive importance scores, and the LIMIT genuinely cuts (the
    candidate pool is larger than 50)."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_dsir_sample"](spark, SF).collect()
    assert len(rows) == 50
    assert all(r.lang != "en" for r in rows)
    assert all(r.dsir_score > 0 for r in rows)
    n_cand = (
        load_table(spark, SF, "documents").where(F.col("lang") != "en").count()
    )
    assert n_cand > 50  # the LIMIT actually cuts


def test_kmv_sketch_merge_and_accuracy(spark):
    """KMV contracts: (1) bottom-k selection equals the brute-force k
    smallest distinct hashes; (2) union of two half-corpus sketches ==
    the whole-corpus sketch (mergeability); (3) the k=256 estimator lands
    within 15% of the exact distinct count in the estimation regime
    (expected sigma = 1/sqrt(k-2) ~ 6.3%; the k=64 sketches of the
    structural legs see 2-sigma draws on this corpus)."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.sketch import (
        kmv_build,
        kmv_estimate,
        kmv_hash,
        kmv_union,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    key = (F.col("user_id") * 100 + F.dayofmonth("ts")).cast("long")
    src = ev.select("event_type", key.alias("_k"))
    k = 64
    sk = {
        r.event_type: list(r.kmv)
        for r in kmv_build(src, F.col("_k"), ["event_type"], k=k).collect()
    }
    # (1) brute force one group
    some = sorted(sk)[0]
    brute = sorted(
        {
            r[0]
            for r in src.where(F.col("event_type") == some)
            .select(kmv_hash(F.col("_k")))
            .distinct()
            .collect()
        }
    )[:k]
    assert sk[some] == brute
    # (2) merge ≡ whole: split by user parity, sketch halves, union
    lo = src.where(F.col("_k") % 2 == 0)
    hi = src.where(F.col("_k") % 2 == 1)
    a = kmv_build(lo, F.col("_k"), ["event_type"], k=k)
    b = kmv_build(hi, F.col("_k"), ["event_type"], k=k)
    merged = {
        r.event_type: list(r.m)
        for r in a.join(b.withColumnRenamed("kmv", "kmv_b"), "event_type")
        .select("event_type", kmv_union(F.col("kmv"), F.col("kmv_b"), k).alias("m"))
        .collect()
    }
    assert merged == sk
    # (3) estimator accuracy in the estimation regime
    exact = {
        r.event_type: r.n
        for r in src.distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kb = 256
    est = {
        r.event_type: r.e
        for r in kmv_build(src, F.col("_k"), ["event_type"], k=kb)
        .select("event_type", kmv_estimate(F.col("kmv"), kb).alias("e"))
        .collect()
    }
    for t, n in exact.items():
        assert n > kb  # estimation regime, not exact-set degradation
        assert abs(est[t] - n) / n < 0.15, (t, est[t], n)


def test_cross_pairs_firstband_bit_identical(spark):
    """minhash_cross_pairs firstband (the bipartite firstband twin)
    must emit the identical verified cross-pair set as plain on a
    re-crawl-shaped input (new batch = reference docs with replica
    markers, near-dup-heavy against the reference)."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.dedup import (
        minhash_cross_pairs,
    )

    ref = load_table(spark, SF, "documents").select("doc_id", "text")
    new = _replica_corpus(ref, 4)
    sets = {}
    for strat in ("plain", "firstband"):
        sets[strat] = sorted(
            (r.left_id, r.right_id, r.jaccard)
            for r in minhash_cross_pairs(
                new, ref, threshold=0.5, strategy=strat
            ).collect()
        )
    assert sets["plain"] == sets["firstband"]
    assert len(sets["plain"]) > 0
    with pytest.raises(ValueError, match="strategy"):
        minhash_cross_pairs(new, ref, strategy="fastest")


def test_kmv_rolling_accuracy_and_shape(spark):
    """q_kmv_rolling: one row per (event_type, observed day); every
    estimate positive; MEDIAN relative error vs the exact rolling
    7-day distinct count under 10% (k=128 → σ ≈ 8.9%; individual
    cells may sit at 2σ, the median is stable)."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["q_kmv_rolling"](spark, sf).collect()
    ev = load_table(spark, sf, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    pairs = {(r.event_type, r.day) for r in ev.select("event_type", "day").distinct().collect()}
    types = {t for t, _ in pairs}
    days = {d for _, d in pairs}
    assert len(rows) == len(types) * len(days)
    exact = {}
    data = ev.collect()
    for t in types:
        for d in days:
            exact[(t, d)] = len(
                {
                    r.user_id
                    for r in data
                    if r.event_type == t and 0 <= (d - r.day).days <= 6
                }
            )
    errs = sorted(
        abs(r.est_uniques_7d - exact[(r.event_type, r.day)]) / exact[(r.event_type, r.day)]
        for r in rows
    )
    assert errs[len(errs) // 2] < 0.10, errs[len(errs) // 2]
    assert all(r.est_uniques_7d > 0 for r in rows)


def test_stream_kmv_equals_batch(spark):
    """The streamed twin must produce the identical pair-estimate rows
    as the batch query (merge ≡ whole end-to-end, not just per array)."""
    from crypto_price_data_pipeline_spark.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    batch = sorted(map(tuple, QUERIES["q_kmv_overlap"](spark, sf).collect()))
    streamed = sorted(map(tuple, QUERIES["q_stream_kmv"](spark, sf).collect()))
    assert streamed == batch and len(batch) == 10

def test_kmv_stamp_roundtrip_and_cross_k_merge_fails(spark, tmp_path):
    """r13 stamp parity: sketches carry (k, hash_bits) as column
    metadata, the stamp survives a parquet round-trip (schema-inferred
    read), and merging stamped sketches under a different k hard-fails
    in kmv_explode AND kmv_from_hashes instead of silently biasing the
    estimator. Unstamped caller-built tables stay trusted."""
    import pytest
    from pyspark.sql import functions as F
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.sketch import (
        kmv_build,
        kmv_explode,
        kmv_from_hashes,
        kmv_stamp,
    )

    ev = load_table(spark, SF, "events").select("event_type", "user_id")
    sk = kmv_build(ev, F.col("user_id"), ["event_type"], k=64)
    st = kmv_stamp(sk)
    assert st and int(st["k"]) == 64 and int(st["hash_bits"]) == 60

    d = str(tmp_path / "sk")
    sk.write.parquet(d)
    back = spark.read.parquet(d)
    st2 = kmv_stamp(back)
    assert st2 and int(st2["k"]) == 64, "stamp must survive parquet"

    # matched-k merge reproduces the whole-corpus sketch bit-exactly
    merged = kmv_from_hashes(
        kmv_explode(back, ["event_type"], k=64), ["event_type"], k=64
    )
    a = {r["event_type"]: r["kmv"] for r in merged.collect()}
    b = {r["event_type"]: r["kmv"] for r in sk.collect()}
    assert a == b

    # cross-k merge: hard failure at the validated entrance
    with pytest.raises(ValueError, match="stamp mismatch"):
        kmv_explode(back, ["event_type"], k=128)
    with pytest.raises(ValueError, match="stamp mismatch"):
        kmv_from_hashes(
            kmv_explode(back, ["event_type"]), ["event_type"], k=128
        )

    # unstamped input (caller-built rows) is trusted at any k
    plain = back.select("event_type", F.explode("kmv").alias("_h"))
    assert kmv_from_hashes(plain, ["event_type"], k=128).count() > 0
