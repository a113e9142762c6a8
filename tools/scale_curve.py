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

Usage:
    python tools/scale_curve.py [--base /root/testdata/sf0.1]
                                [--scales 1,4,10] [--out -]

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
    return spark.read.parquet(os.path.join(out_dir, "documents.parquet")).count()


def measure(spark, sf_dir: str) -> dict[str, float]:
    from crypto_price_data_pipeline_spark import artifacts
    from crypto_price_data_pipeline_spark.queries import QUERIES

    times: dict[str, float] = {}
    for name in ARTIFACTS:
        t0 = time.monotonic()
        artifacts.rebuild(spark, sf_dir, name).count()
        times[f"artifact_{name}"] = round(time.monotonic() - t0, 3)
    for name in PAIR_QUERIES:
        t0 = time.monotonic()
        n = QUERIES[name](spark, sf_dir).count()
        times[name] = round(time.monotonic() - t0, 3)
        times[f"{name}_rows"] = n
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scales", default="1,4,10")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from crypto_price_data_pipeline_spark.session import get_spark

    spark = get_spark()
    results: dict[int, dict] = {}
    for scale in scales:
        work = tempfile.mkdtemp(prefix=f"scale_curve_{scale}x_")
        try:
            n = build_corpus(spark, args.base, scale, work)
            print(f"-- scale {scale}x: {n} docs", file=sys.stderr)
            times = measure(spark, work)
            times["n_docs"] = n
            results[scale] = times
        finally:
            shutil.rmtree(work, ignore_errors=True)

    base = results[scales[0]]
    keys = [f"artifact_{a}" for a in ARTIFACTS] + PAIR_QUERIES
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
