"""Wave-36 units: the token-counting cube's r13 consumers. Pins the
r12 verdict's top item — counting passes relocated into the stored
(w, lang, nib, c, df) cube — at the PLAN level (no tokenize explode
left in counting-only queries; exactly the one irreducible scoring
explode in per-doc scorers) and at the VALUE level (cube-served
results bit-equal to inline recounting; NB classifier invariants)."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_counting_queries_have_no_tokenize_explode(spark):
    """q_vocab_coverage and q_word_freq are counting-only: after the
    cube relocation their plans must contain ZERO Generate (explode)
    nodes — the corpus tokenize runs once per corpus at cube build."""
    from crypto_price_data_pipeline_spark.queries import QUERIES

    for name in ("q_vocab_coverage", "q_word_freq"):
        plan = _plan(QUERIES[name](spark, SF))
        assert "Generate" not in plan, f"{name} still tokenizes:\n{plan}"


def test_scoring_queries_have_exactly_one_explode(spark):
    """Per-doc scorers keep exactly ONE tokenize explode — the
    irreducible scoring pass; the model/counting side must come from
    the cube scan."""
    from crypto_price_data_pipeline_spark.queries import QUERIES

    for name in ("q_nb_language_id", "q_dsir_sample"):
        plan = _plan(QUERIES[name](spark, SF))
        # formatted plans list each node once in the tree section and
        # once in the details; count tree-section occurrences only
        tree = plan.split("\n\n")[0]
        n = sum(1 for line in tree.splitlines() if "Generate " in line)
        assert n == 1, f"{name} has {n} Generate nodes:\n{tree}"


def test_vocab_coverage_matches_inline_recount(spark):
    """Cube-served vocab coverage ≡ the inline recounting form, column
    by column (exact integers + one double division)."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.dedup import tokens_col
    from crypto_price_data_pipeline_spark.queries import QUERIES

    got = {r["lang"]: r for r in QUERIES["q_vocab_coverage"](spark, SF).collect()}

    docs = load_table(spark, SF, "documents").select(
        "doc_id",
        "lang",
        tokens_col("text").alias("toks"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("nib"),
    )
    held_pred = F.col("nib").isin("c", "d", "e", "f")
    vocab = (
        docs.where(~held_pred)
        .select(F.explode(F.array_distinct("toks")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("token"))
        .limit(256)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    exp = {
        r["lang"]: r
        for r in (
            docs.where(held_pred)
            .select("lang", "doc_id", F.explode("toks").alias("token"))
            .join(F.broadcast(vocab), "token", "left")
            .groupBy("lang")
            .agg(
                F.countDistinct("doc_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_tok"),
                F.sum(
                    F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
                ).alias("n_oov"),
            )
            .collect()
        )
    }
    assert set(got) == set(exp)
    for lang, e in exp.items():
        g = got[lang]
        assert (g["n_docs"], g["n_tok"], g["n_oov"]) == (
            e["n_docs"],
            e["n_tok"],
            e["n_oov"],
        )
        assert g["oov_rate"] == e["n_oov"] / e["n_tok"]


def test_word_freq_matches_inline_recount(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.dedup import tokens_col
    from crypto_price_data_pipeline_spark.queries import QUERIES

    got = [tuple(r) for r in QUERIES["q_word_freq"](spark, SF).collect()]
    exp = [
        tuple(r)
        for r in (
            load_table(spark, SF, "documents")
            .select(F.explode(tokens_col("text")).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("word"))
            .limit(20)
            .collect()
        )
    ]
    assert got == exp


def test_nb_language_id_invariants(spark):
    """Self-labeled NB on the training corpus: every doc gets a
    prediction from the label set (+ 'und' only for token-less docs),
    accuracy clears the 4-class random floor, and the confusion
    diagonal is modal for most languages. (The synthetic corpus's
    text/label coupling is weak — the stopword classifier measures
    0.415 vs a 0.453 majority floor here — so random-floor + modal
    diagonal is the honest separation bar, not majority.)"""
    from collections import Counter

    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_nb_language_id"](spark, SF).collect()
    assert len(rows) == 500
    langs = {"en", "de", "es", "fr"}
    assert all(r["nb_pred"] in langs | {"und"} for r in rows)
    labeled = [r for r in rows if r["lang"] in langs]
    acc = sum(r["nb_pred"] == r["lang"] for r in labeled) / len(labeled)
    assert acc > 0.25, acc
    diag_modal = 0
    for lang in langs:
        preds = Counter(r["nb_pred"] for r in labeled if r["lang"] == lang)
        if preds and preds.most_common(1)[0][0] == lang:
            diag_modal += 1
    assert diag_modal >= 3, dict(acc=acc, diag_modal=diag_modal)


def _exact_replica_corpus(spark, r):
    from crypto_price_data_pipeline_spark.io.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    sub = docs.where(nib.isin("0", "1", "2", "3"))
    return sub.selectExpr(
        f"explode(sequence(0, {r - 1})) as _r", "doc_id", "text", "lang"
    ).selectExpr(f"doc_id * {r} + _r as doc_id", "text", "lang")


def test_overlap_collapse_bit_identical_to_plain(spark):
    """ngram_overlap collapse has NO semantic shift (identical text ⇒
    identical shingle set): pair sets must be bit-equal to plain on an
    exact-replica corpus, and auto must agree."""
    from crypto_price_data_pipeline_spark.operators.dedup import (
        ngram_overlap_pairs,
    )

    dup = _exact_replica_corpus(spark, 12).persist()
    try:
        kw = dict(block_cols=["lang"], k=3, threshold=0.6)
        plain = sorted(
            tuple(r) for r in ngram_overlap_pairs(dup, **kw).collect()
        )
        coll = sorted(
            tuple(r)
            for r in ngram_overlap_pairs(
                dup, strategy="collapse", **kw
            ).collect()
        )
        auto = sorted(
            tuple(r)
            for r in ngram_overlap_pairs(dup, strategy="auto", **kw).collect()
        )
        assert plain and plain == coll == auto
    finally:
        dup.unpersist()


def test_winnow_collapse_matches_reference_expansion(spark):
    """winnow collapse ≡ plain-over-distinct-texts + membership
    algebra (the collapsed-df semantics), checked pair by pair."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.text import (
        _winnowing_fp_hashes,
        winnowing_pairs,
    )

    R = 12
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    sub = docs.where(nib.isin("0", "1", "2", "3")).persist()
    dup = _exact_replica_corpus(spark, R)
    try:
        got = sorted(
            tuple(r) for r in winnowing_pairs(dup, strategy="collapse").collect()
        )
        op = winnowing_pairs(sub).collect()
        fp = _winnowing_fp_hashes(sub, "doc_id", "text", 8, 8)
        dfc = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("d"))
        kept = (
            fp.join(dfc.where(F.col("d") <= 50), "fp")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("nfp"))
        )
        ref = []
        for r in op:
            a, b, ns = r["id_a"], r["id_b"], r["n_shared"]
            ref += [
                (min(a * R + ra, b * R + rb), max(a * R + ra, b * R + rb), ns)
                for ra in range(R)
                for rb in range(R)
            ]
        for row in kept.collect():
            o, n = row["doc_id"], row["nfp"]
            if n >= 10:
                ref += [
                    (o * R + ra, o * R + rb, n)
                    for ra in range(R)
                    for rb in range(ra + 1, R)
                ]
        assert got == sorted(ref)
    finally:
        sub.unpersist()


def test_winnow_plain_cliff_and_collapse_fix(spark):
    """The measured df-cap cliff: at R=60 exact replicas every cluster
    fingerprint's raw df exceeds max_doc_freq=50, so plain returns
    ZERO pairs; collapse (df over distinct texts) finds the full
    C(60,2)-per-cluster mass."""
    from crypto_price_data_pipeline_spark.operators.text import winnowing_pairs

    dup = _exact_replica_corpus(spark, 60).persist()
    try:
        assert winnowing_pairs(dup).count() == 0
        n = winnowing_pairs(dup, strategy="collapse").count()
        assert n >= 60 * 59 // 2, n  # at least one full cluster
    finally:
        dup.unpersist()


def test_dup_stats_stamped_and_auto_reads_them(spark):
    """minhash_base / winnow_fp carry measured (n, distinct-identity)
    dup stats in their stamps (r13), and strategy='auto' with a
    stamped artifact decides WITHOUT touching df — pinned by passing a
    poisoned df whose evaluation would fail if auto ran its eager
    fallback aggregate."""
    from crypto_price_data_pipeline_spark.artifacts import (
        minhash_base,
        winnow_postings,
    )
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.dedup import (
        ngram_overlap_pairs,
    )
    from crypto_price_data_pipeline_spark.operators.text import winnowing_pairs

    base = minhash_base(spark, SF)
    pb = next(
        (f.metadata or {}).get("artifact_params")
        for f in base.schema.fields
        if (f.metadata or {}).get("artifact_params")
    )
    assert pb["mb_n"] >= pb["mb_dsig"] > 0
    fp = winnow_postings(spark, SF)
    pw = next(
        (f.metadata or {}).get("artifact_params")
        for f in fp.schema.fields
        if (f.metadata or {}).get("artifact_params")
    )
    assert pw["wf_n"] >= pw["wf_dsig"] > 0

    # poisoned df: any action on it raises (ANSI divide-by-zero in a
    # filter), so auto must not evaluate it when a stamp is available.
    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
    poisoned = docs.where(F.expr("1 div 0 = 1"))
    # pristine corpora: stamped ratio 1.0 -> plain; building the plan
    # must not raise (no eager action on the poisoned frame)
    # (max_docs=None skips the corpus-size gate, which is itself a
    # documented eager count — not the auto fallback under test)
    ngram_overlap_pairs(
        poisoned, block_cols=["lang"], base=base, strategy="auto",
        max_docs=None,
    )
    winnowing_pairs(poisoned, fp=fp, strategy="auto")


def test_kmv_sample_merge_equals_whole_and_quantile_accuracy(spark):
    """kmv_sample mergeability (union of per-chunk samples re-ranks to
    the whole-corpus sample BIT-EXACTLY — the semilattice contract)
    and the rolling quantile sketch's accuracy: median relative error
    of sketch p50/p90 vs the exact rolling quantiles < 10% at k=128."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.sketch import (
        kmv_sample,
        kmv_sample_from_hashes,
    )
    from crypto_price_data_pipeline_spark.queries import QUERIES

    ev = load_table(spark, SF, "events").select(
        "event_type", "event_id", "value"
    )
    whole = {
        r["event_type"]: r["smp"]
        for r in kmv_sample(
            ev, F.col("event_id"), F.col("value"), ["event_type"], k=64
        ).collect()
    }
    # 3 disjoint chunks -> per-chunk samples -> exploded re-rank
    chunked = kmv_sample(
        ev.withColumn("_c", F.pmod("event_id", F.lit(3))),
        F.col("event_id"),
        F.col("value"),
        ["event_type", "_c"],
        k=64,
    )
    merged = {
        r["event_type"]: r["smp"]
        for r in kmv_sample_from_hashes(
            chunked.select(
                "event_type", F.explode("smp").alias("_s")
            ).select(
                "event_type",
                F.col("_s._h").alias("_h"),
                F.col("_s._v").alias("_v"),
            ),
            ["event_type"],
            k=64,
            presalt=False,
        ).collect()
    }
    assert merged == whole

    got = {
        (r["event_type"], r["day"]): (r["p50_7d"], r["p90_7d"])
        for r in QUERIES["q_quantile_sketch"](spark, SF).collect()
    }
    evd = load_table(spark, SF, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    days = [r["day"] for r in evd.select("day").distinct().collect()]
    exact = {}
    for r in (
        evd.join(
            spark.createDataFrame(
                [(d,) for d in days], "wday date"
            ).withColumn("_lo", F.date_sub(F.col("wday"), 6)),
            (F.col("day") >= F.col("_lo")) & (F.col("day") <= F.col("wday")),
        )
        .groupBy("event_type", "wday")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .collect()
    ):
        exact[(r["event_type"], r["wday"])] = (r["p50"], r["p90"])
    assert set(got) == set(exact)
    errs = []
    for key, (g50, g90) in got.items():
        e50, e90 = exact[key]
        errs.append(abs(g50 - e50) / abs(e50))
        errs.append(abs(g90 - e90) / abs(e90))
    errs.sort()
    assert errs[len(errs) // 2] < 0.10, errs[len(errs) // 2]


def test_kmv_sample_stamp_and_cross_k_merge_fails(spark, tmp_path):
    """The value sample carries the same (k, hash_bits) stamp contract
    as the distinct sketch: parquet round-trip keeps it, and cross-k
    merges hard-fail at both validated entrances."""
    import pytest

    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.sketch import (
        kmv_sample,
        kmv_sample_explode,
        kmv_sample_from_hashes,
        kmv_stamp,
    )

    ev = load_table(spark, SF, "events").select(
        "event_type", "event_id", "value"
    )
    sk = kmv_sample(ev, F.col("event_id"), F.col("value"), ["event_type"], k=32)
    st = kmv_stamp(sk, "smp")
    assert st and st["sketch"] == "kmv_sample" and int(st["k"]) == 32

    d = str(tmp_path / "smp")
    sk.write.parquet(d)
    back = spark.read.parquet(d)
    assert int(kmv_stamp(back, "smp")["k"]) == 32

    merged = kmv_sample_from_hashes(
        kmv_sample_explode(back, ["event_type"], k=32), ["event_type"], k=32
    )
    a = {r["event_type"]: [tuple(s) for s in r["smp"]] for r in merged.collect()}
    b = {r["event_type"]: [tuple(s) for s in r["smp"]] for r in sk.collect()}
    assert a == b

    with pytest.raises(ValueError, match="stamp mismatch"):
        kmv_sample_explode(back, ["event_type"], k=64)
    with pytest.raises(ValueError, match="stamp mismatch"):
        kmv_sample_from_hashes(
            kmv_sample_explode(back, ["event_type"]), ["event_type"], k=64
        )


def test_winnow_collapse_raw_docs_mode_bit_identical_to_plain(spark):
    """collapse_df='raw_docs' weights each text group by membership, so
    the df cap sees exactly what plain's per-doc postings see —
    BIT-IDENTICAL pair sets on every corpus, on BOTH sides of the
    cliff (R=12: nonzero and equal; R=60: both zero), while candidate
    work stays O(distinct texts)."""
    from crypto_price_data_pipeline_spark.operators.text import winnowing_pairs

    for R in (12, 60):
        dup = _exact_replica_corpus(spark, R).persist()
        try:
            plain = sorted(tuple(r) for r in winnowing_pairs(dup).collect())
            compat = sorted(
                tuple(r)
                for r in winnowing_pairs(
                    dup, strategy="collapse", collapse_df="raw_docs"
                ).collect()
            )
            assert plain == compat, R
            if R == 60:
                assert plain == []  # the documented cliff, both modes
            else:
                assert plain
        finally:
            dup.unpersist()


def test_kmv_contamination_estimates_track_exact_jaccard(spark):
    """The sketch monitor's est_jaccard tracks the EXACT train/held
    8-gram Jaccard per source (k=256): median absolute error < 0.08 —
    the standard KMV coincidence-estimator regime for ~500-2500-gram
    sets — and the per-source ordering signal is preserved (Spearman-
    positive on the sources with nonzero exact overlap)."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.dedup import tokens_col
    from crypto_price_data_pipeline_spark.queries import QUERIES

    got = {
        r["source"]: r["est_jaccard"]
        for r in QUERIES["q_kmv_contamination"](spark, SF).collect()
    }

    docs = load_table(spark, SF, "documents").select("doc_id", "source", "text")
    held = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "c", "d", "e", "f"
    )
    toks = tokens_col("text")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(7), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 8)),
    )
    grams = docs.select(
        "source",
        F.when(held, F.lit("held")).otherwise(F.lit("train")).alias("s"),
        F.explode(sh).alias("g"),
    ).distinct()
    sets = (
        grams.groupBy("source", "g")
        .agg(
            F.max(F.when(F.col("s") == "train", 1).otherwise(0)).alias("t"),
            F.max(F.when(F.col("s") == "held", 1).otherwise(0)).alias("h"),
        )
        .groupBy("source")
        .agg(
            F.sum(F.col("t") * F.col("h")).alias("inter"),
            F.count(F.lit(1)).alias("union"),
        )
        .collect()
    )
    exact = {r["source"]: r["inter"] / r["union"] for r in sets}
    assert set(got) == set(exact)
    errs = sorted(abs(got[s] - exact[s]) for s in exact)
    assert errs[len(errs) // 2] < 0.08, errs
