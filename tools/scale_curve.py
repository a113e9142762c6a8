#!/usr/bin/env python
"""Measured scale curves for the similarity tier (r13, the r12
verdict's #2 item): artifact-build and pair-family wall times at
1x / 4x / 10x corpus size, so the 100-TB linearity claims rest on a
measured exponent, not an argument.

Corpus construction — disjoint-shard replication: replica k of the
base corpus prefixes EVERY token with ``r<k>x`` (one regexp pass), so
replica vocabularies are disjoint. Cross-replica near-dup pairs are
impossible by construction, and each replica reproduces the base
corpus's internal similarity structure exactly — total candidate/pair
mass scales LINEARLY with corpus size. That is the point: the data's
work scales 1:1, so any super-linear wall-time exponent is the
ENGINE's (a quadratic all-pairs stage, a single-reducer funnel, a
non-broadcast join) — exactly what this script exists to catch. The
dup-heavy regime (pair mass scaling quadratically inside clusters) is
covered separately by q_simhash_dupheavy / q_minhash_dupheavy's
measured-stats strategy selection.

Serving-tier curves (r14, the r13 verdict's #6): ``--queries`` takes
a comma list of registry names and curves THOSE instead of the
similarity-tier default — built for the ANN probe paths
(q_lsh_served_topk / q_batch_lsh_topk / q_pq_topk) and the KMV /
quantile sketch builds (q_kmv_rolling / q_quantile_sketch). For those
the corpus build also replicates:

- embeddings: replica k cyclic-shifts every vector by k positions
  (np.roll semantics in pure column ops). A shift preserves norms and
  all WITHIN-replica dot products exactly — each replica reproduces
  the base corpus's neighbor structure — while cross-replica sims are
  decorrelated, so the index genuinely carries N× distinct content
  (identical-copy replication would make every probe trivially easy).
- events: ids offset (id·scale + k), ts/value/type carried — distinct
  counts and sketch work scale exactly 1:1.

Usage:
    python tools/scale_curve.py [--base /root/testdata/sf0.1]
                                [--scales 1,4,10]
                                [--queries name1,name2,...]

Prints a markdown table + one JSON line; paste the table into
SCALING.md. Wall times are single-run local[32] numbers — read them
for the EXPONENT (ratio vs scale), not as absolute benchmarks; the
bench-noise rule (NOTES.md) applies.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pair families measured (documents-only inputs; each is a registry
# callable, so the measured plan IS the served plan)
PAIR_QUERIES = [
    "q_minhash_pairs",
    "q_minhash_exact",
    "q_simhash_md5_pairs",
    "q_winnowing_pairs",
    "q_ngram_overlap",
    "q_tfidf_cosine_pairs",
    "q_lm_scores",
]
ARTIFACTS = ["minhash_base", "minhash_mins", "simhash32", "winnow_fp", "tfidf_w", "lm_bigram", "token_counts"]


def build_corpus(spark, base_sf: str, scale: int, out_dir: str) -> int:
    """scale disjoint-vocab replicas of the base documents table,
    written as <out_dir>/documents.parquet (load_table-compatible)."""
    from pyspark.sql import functions as F

    from crypto_price_data_pipeline_spark.io.sources import load_table

    docs = load_table(spark, base_sf, "documents")
    reps = docs.selectExpr(
        f"explode(sequence(0, {scale - 1})) AS _r",
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
    ).select(
        (F.col("doc_id") * scale + F.col("_r")).alias("doc_id"),
        F.regexp_replace(
            F.lower("text"),
            "([a-z0-9]+)",
            F.concat(F.lit("r"), F.col("_r").cast("string"), F.lit("x$1")),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    reps.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    emb = load_table(spark, base_sf, "embeddings")
    emb_reps = emb.selectExpr(
        f"explode(sequence(0, {scale - 1})) AS _r",
        "vec_id",
        "embedding",
        "label",
    ).selectExpr(
        f"vec_id * {scale} + _r AS vec_id",
        # replica-k cyclic shift: norms and within-replica dot products
        # are exactly preserved; cross-replica sims decorrelate
        "concat(slice(embedding, pmod(_r, size(embedding)) + 1,"
        "             size(embedding) - pmod(_r, size(embedding))),"
        "       slice(embedding, 1, pmod(_r, size(embedding)))) AS embedding",
        "label",
    )
    emb_reps.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )

    ev = load_table(spark, base_sf, "events")
    ev_reps = ev.selectExpr(
        f"explode(sequence(0, {scale - 1})) AS _r", "*"
    ).selectExpr(
        f"event_id * {scale} + _r AS event_id",
        "ts",
        f"user_id * {scale} + _r AS user_id",
        "event_type",
        "value",
        "props",
    )
    ev_reps.write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )
    return spark.read.parquet(os.path.join(out_dir, "documents.parquet")).count()


def measure(
    spark,
    sf_dir: str,
    queries: list[str] | None = None,
    materialize: str = "count",
) -> dict[str, float]:
    from pyspark.sql import functions as F

    from crypto_price_data_pipeline_spark import artifacts
    from crypto_price_data_pipeline_spark.queries import QUERIES

    times: dict[str, float] = {}
    if queries is None:
        for name in ARTIFACTS:
            t0 = time.monotonic()
            artifacts.rebuild(spark, sf_dir, name).count()
            times[f"artifact_{name}"] = round(time.monotonic() - t0, 3)
    for name in queries if queries is not None else PAIR_QUERIES:
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        if materialize == "full":
            # checksum EVERY output column: .count() lets Catalyst
            # prune expensive computed columns a query emits but no
            # aggregate consumes (q_boilerplate_strip's kept_text
            # rebuild vanished under count — the curve read as
            # sub-constant). The checksum forces the whole row.
            row = df.select(
                F.count(F.lit(1)).alias("_n"),
                F.bit_xor(
                    F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
                ).alias("_ck"),
            ).collect()[0]
            n = row["_n"]
        else:
            n = df.count()
        times[name] = round(time.monotonic() - t0, 3)
        times[f"{name}_rows"] = n
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scales", default="1,4,10")
    ap.add_argument(
        "--materialize",
        default="count",
        choices=["count", "full"],
        help="how to force each query: count (fast, default; matches "
        "the historical tables) or full (checksum every output column "
        "- required for transform queries whose expensive columns "
        "count() would prune)",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma list of registry names to curve instead of the "
        "similarity-tier default (artifacts are skipped in this mode)",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    qnames = args.queries.split(",") if args.queries else None

    from crypto_price_data_pipeline_spark.session import get_spark

    spark = get_spark()
    results: dict[int, dict] = {}
    for scale in scales:
        work = tempfile.mkdtemp(prefix=f"scale_curve_{scale}x_")
        try:
            n = build_corpus(spark, args.base, scale, work)
            print(f"-- scale {scale}x: {n} docs", file=sys.stderr)
            if scale == scales[0] and qnames:
                # discarded warm-up: Python-worker/JIT startup would
                # otherwise inflate the 1x point and FLATTER the
                # exponent (the similarity tier amortizes this across
                # its artifact builds; a short query list does not)
                measure(spark, work, qnames, args.materialize)
            times = measure(spark, work, qnames, args.materialize)
            times["n_docs"] = n
            results[scale] = times
        finally:
            shutil.rmtree(work, ignore_errors=True)

    base = results[scales[0]]
    keys = (
        qnames
        if qnames
        else [f"artifact_{a}" for a in ARTIFACTS] + PAIR_QUERIES
    )
    print("| entry | " + " | ".join(f"{s}x sec" for s in scales) +
          " | " + " | ".join(f"{s}x/1x" for s in scales[1:]) + " |")
    print("|" + "---|" * (1 + 2 * len(scales) - 1))
    for k in keys:
        ratios = [results[s][k] / base[k] if base[k] else float("nan") for s in scales[1:]]
        print(
            f"| {k} | "
            + " | ".join(f"{results[s][k]:.2f}" for s in scales)
            + " | "
            + " | ".join(f"{r:.2f}" for r in ratios)
            + " |"
        )
    print(json.dumps({"scales": scales, "results": {str(s): results[s] for s in scales}}))


if __name__ == "__main__":
    main()
