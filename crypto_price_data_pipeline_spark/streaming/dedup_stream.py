"""Incremental (streaming) near-duplicate dedup with a persistent
LSH signature store — the ingest-time dedup an ongoing crawl pipeline
runs, as opposed to the one-shot corpus dedup in operators/dedup.py.

Shape per micro-batch (``foreachBatch``):

  1. MinHash-sign the batch (per-row projection, no shuffle);
  2. band the batch signatures (`band_buckets`) and join them against
     the persistent POSTINGS store — only the batch is ever re-banded,
     history is joined as stored (band, bucket) rows, so per-batch
     work is O(batch + matching buckets), never O(corpus);
  3. verify LSH candidates with exact shingle Jaccard against the
     stored shingle sets, plus the same check within the batch
     (smaller-id partner);
  4. docs with a verified partner of smaller id are DROPPED; survivors
     append to the output table;
  5. the batch's signatures and postings append to the store —
     INCLUDING dropped docs' — so the decision rule is exactly the
     batch operator's anti-join semantics ("dup of any smaller-id
     doc"), not arrival-path-dependent transitive greediness.

The store is plain parquet here (the sandbox has no Delta/Iceberg
jars); at warehouse scale the same two tables live as a lakehouse
table bucketed by (band, bucket) so the candidate join co-locates
without a shuffle.

Determinism contract: chunk files are named with zero-padded indices
and fed ``maxFilesPerTrigger=1``, so micro-batches arrive in doc_id
order; combined with step 5 the final survivor set equals the batch
rule regardless of chunking (unit-tested 1-chunk ≡ 5-chunk ≡ batch
oracle). LSH recall caveats are the same as q_minhash_exact (pinned
there); the planted sf dups sit at Jaccard 1.0, where banding recall
is exact.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import band_buckets, minhash_signatures


def _append(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def stream_minhash_dedup(
    spark: SparkSession,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
    threshold: float = 0.4,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_k: int = 3,
    n_chunks: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Replay ``docs`` as an ``n_chunks``-micro-batch stream through
    the incremental dedup above; returns the survivor table (id,
    *keep_cols) read back from the parquet sink."""
    work = tempfile.mkdtemp(prefix="stream_dedup_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    src = os.path.join(work, "src")
    out = os.path.join(work, "out")
    post_store = os.path.join(work, "postings")
    sh_store = os.path.join(work, "shingles")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)

    cols = [id_col, text_col, *(keep_cols or [])]
    staged = docs.select(*cols)
    # stage the replay as n_chunks parquet dirs holding contiguous id
    # ranges, with strictly increasing mtimes: FileStreamSource orders
    # new files by modification time, so mtime + maxFilesPerTrigger=1
    # → micro-batches arrive in id order (see module docstring for why
    # order matters). Only the ~n_chunks cut points touch the driver;
    # chunk writes are distributed filters, no toPandas/collect.
    lo, hi = staged.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        n_chunks = 0
    cuts = [
        lo + (hi - lo + 1) * i // max(n_chunks, 1)
        for i in range(max(n_chunks, 1) + 1)
    ] if n_chunks else []
    import time as _time

    base = _time.time()
    for i in range(n_chunks):
        d = os.path.join(src, f"chunk_{i:05d}")
        staged.where(
            (F.col(id_col) >= cuts[i]) & (F.col(id_col) < cuts[i + 1])
        ).coalesce(1).write.mode("overwrite").parquet(d)
        for root, _dirs, files in os.walk(d):
            for fname in files:
                os.utime(os.path.join(root, fname), (base + i, base + i))

    # seed empty stores so every batch can read them unconditionally
    empty_post = spark.createDataFrame([], "_id long, band int, bucket long")
    empty_sh = spark.createDataFrame([], "_id long, _shingles array<long>")
    empty_post.write.mode("overwrite").parquet(post_store)
    empty_sh.write.mode("overwrite").parquet(sh_store)
    spark.createDataFrame([], staged.schema).write.mode("overwrite").parquet(out)

    post_schema, sh_schema = empty_post.schema, empty_sh.schema

    def _process(batch: DataFrame, _batch_id: int) -> None:
        bspark = batch.sparkSession
        sig = minhash_signatures(
            batch, id_col, text_col, num_hashes, shingle_k, seed
        ).persist()
        bands_b = band_buckets(sig, id_col, num_hashes, bands).persist()
        stored_post = bspark.read.schema(post_schema).parquet(post_store)
        stored_sh = bspark.read.schema(sh_schema).parquet(sh_store)

        probe = bands_b.select(
            F.col("_id").alias("id_b"), "band", "bucket"
        )
        index = stored_post.unionByName(bands_b).select(
            F.col("_id").alias("id_a"), "band", "bucket"
        )
        cand = (
            probe.join(index, ["band", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        all_sh = stored_sh.unionByName(sig.select(F.col(id_col).alias("_id"), "_shingles"))
        jac = (
            F.size(F.array_intersect("_sh_a", "_sh_b"))
            / F.size(F.array_union("_sh_a", "_sh_b"))
        ).alias("jaccard")
        dropped = (
            cand.join(
                all_sh.select(F.col("_id").alias("id_a"), F.col("_shingles").alias("_sh_a")),
                "id_a",
            )
            .join(
                sig.select(F.col(id_col).alias("id_b"), F.col("_shingles").alias("_sh_b")),
                "id_b",
            )
            .select("id_b", jac)
            .where(F.col("jaccard") >= threshold)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        survivors = batch.join(dropped, id_col, "left_anti")
        _append(survivors.select(*cols), out)
        # store EVERY seen doc's postings + shingles (dropped included)
        _append(bands_b, post_store)
        _append(sig.select(F.col(id_col).alias("_id"), "_shingles"), sh_store)
        sig.unpersist()
        bands_b.unpersist()

    stream = (
        spark.readStream.schema(staged.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    # per-batch state is tiny (one chunk's candidates); 32-partition
    # shuffles × several joins × n_chunks batches is pure scheduling
    # overhead at test scale. Session-global conf — lowered for the
    # stream, restored in finally (cf. stream_click_attribution's note;
    # at production batch sizes, size this to candidate volume).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.read.schema(staged.schema).parquet(out)
