"""Wave 35 [EXT]: DSIR-style importance resampling — target-
distribution data selection, the missing member of the curation
family (dedup → quality → language → contamination → MIXTURE →
SELECTION).

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") selects pretraining documents whose feature
distribution is close to a small TARGET corpus by an importance
weight under bag-of-features language models. This wave implements
the unigram form with one deliberate arithmetic change: the published
estimator sums LOG probability ratios, which is not bit-reproducible
across engines (libm ln differs in the last ulp); here each token's
importance ratio

    r(w) = p_t(w) / p_b(w)
         = (c_t(w)+1)·(N_b+V) / ((c_b(w)+1)·(N_t+V))

is a ratio of exact BIGINT products (IEEE-exact double division, the
products stay far below 2^53), summed through DECIMAL(38,18) and
averaged per document — the same log-free trick as the TF-IDF and
bigram-LM operators. The ordering signal (target-like documents score
high) is the published one; the arithmetic is exact on both engines.

Scale shape: ONE tokenize+explode pass feeds the target counts, the
background counts and the corpus totals; the ratio table is
vocabulary-sized (AQE broadcasts it), and the per-position scoring
stream aggregates per doc with map-side partial aggregation, so the
final shuffle carries |candidate docs| rows. Top-k is
TakeOrderedAndProject — no global-window single-partition sort.

Reference parity: [EXT] — the reference (bpi_crawler.py) has no
corpus tooling; this extends the training-data pipeline family the
driver mandates as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io.sources import load_table


def q_dsir_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Top-50 non-English-labeled documents ranked by unigram DSIR
    importance against the English-labeled target slice: the docs a
    target-distribution resampler would pull into the mixture first.
    Deterministic tie-break on doc_id at the cut."""
    from .operators.dedup import tokens_col
    from .session import scale_out

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    is_tgt = F.col("lang") == "en"
    tok = (
        scale_out(docs)
        .select("doc_id", "lang", F.explode(tokens_col("text")).alias("w"))
        .persist()
    )
    try:
        totals = tok.agg(
            F.sum(F.when(is_tgt, 1).otherwise(0)).cast("long").alias("_nt"),
            F.sum(F.when(~is_tgt, 1).otherwise(0)).cast("long").alias("_nb"),
            F.countDistinct("w").alias("_v"),
        )
        ct = tok.where(is_tgt).groupBy("w").agg(F.count(F.lit(1)).alias("_ct"))
        cb = tok.where(~is_tgt).groupBy("w").agg(F.count(F.lit(1)).alias("_cb"))
        rt = (
            cb.join(ct, "w", "left")
            .crossJoin(F.broadcast(totals))
            .select(
                "w",
                (
                    ((F.coalesce("_ct", F.lit(0)) + 1) * (F.col("_nb") + F.col("_v")))
                    .cast("double")
                    / ((F.col("_cb") + 1) * (F.col("_nt") + F.col("_v"))).cast(
                        "double"
                    )
                )
                .cast("decimal(38,18)")
                .alias("_r"),
            )
        )
        scored = (
            tok.where(~is_tgt)
            .join(rt, "w")
            .groupBy("doc_id")
            .agg(
                (F.sum("_r").cast("double") / F.count(F.lit(1))).alias("_m")
            )
        )
        out = (
            scored.join(docs.select("doc_id", "lang", "source"), "doc_id")
            .orderBy(F.desc("_m"), "doc_id")
            .limit(50)
            .select("doc_id", "lang", "source", F.round("_m", 9).alias("dsir_score"))
        )
        # eager: the exploded token table backs three aggregations and
        # the scoring join — release the cache before returning
        return out.localCheckpoint(eager=True)
    finally:
        tok.unpersist()


Q_DSIR_SQL = r"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS w
  FROM documents
),
tot AS (
  SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS nt,
         SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS nb,
         COUNT(DISTINCT w) AS v
  FROM tok
),
ct AS (SELECT w, COUNT(*) AS c FROM tok WHERE lang = 'en' GROUP BY 1),
cb AS (SELECT w, COUNT(*) AS c FROM tok WHERE lang <> 'en' GROUP BY 1),
rt AS (
  SELECT cb.w,
         CAST(CAST((COALESCE(ct.c, 0) + 1) * (tot.nb + tot.v) AS DOUBLE)
              / CAST((cb.c + 1) * (tot.nt + tot.v) AS DOUBLE)
              AS DECIMAL(38,18)) AS r
  FROM cb LEFT JOIN ct USING (w) CROSS JOIN tot
),
scored AS (
  SELECT t.doc_id, CAST(SUM(rt.r) AS DOUBLE) / COUNT(*) AS m
  FROM tok t JOIN rt ON t.w = rt.w
  WHERE t.lang <> 'en'
  GROUP BY 1
)
SELECT s.doc_id, d.lang, d.source, ROUND(s.m, 9) AS dsir_score
FROM scored s JOIN documents d ON s.doc_id = d.doc_id
ORDER BY s.m DESC, s.doc_id
LIMIT 50
"""


EXT35_QUERIES = {"q_dsir_sample": q_dsir_sample}
EXT35_ORACLES = {"q_dsir_sample": Q_DSIR_SQL}
