"""Incremental ANN index maintenance ([EXT] §2.9 × §2.11): keep a
hyperplane-LSH index current as embedding vectors stream in — the
ingest-time complement to the batch index builders in
operators/similarity.py (an embedding pipeline re-embeds/ingests
continuously; rebuilding the index per batch of arrivals, not per
corpus, is what keeps 100 TB of vectors searchable).

Shape per micro-batch (``foreachBatch``):
  1. bucket the batch's vectors with the SAME deterministic hyperplanes
     the batch builder uses (pure projection, zero shuffle);
  2. write (vector row + _bucket) to a per-``batch_id`` subdirectory
     with OVERWRITE — a replayed batch rewrites identical content, so
     the store is exactly-once (same pattern as dedup_stream /
     continuous_agg);
  3. queries read the store (recursiveFileLookup) and probe buckets via
     lsh_cosine_topk — because the bucket id is a pure function of the
     vector and the planes, the incrementally-built index is
     ROW-IDENTICAL to a one-shot batch build (unit-tested), so query
     results match the batch path bit-for-bit.

At warehouse scale the store is a lakehouse table partitioned by
``_bucket`` (probe = partition pruning) and compaction bounds per-batch
file debris; new centroid-dependent indexes (IVF/PQ) additionally
retrain on a sample at a slower cadence and re-encode only on codebook
rotation.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import hyperplane_lsh_buckets


def stream_lsh_index(
    spark: SparkSession,
    embeddings: DataFrame,
    *,
    dim: int,
    bits: int = 6,
    seed: int = 42,
    n_chunks: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """Replay ``embeddings`` as an ``n_chunks``-micro-batch stream and
    maintain the bucketed index store; returns the index read back
    (original columns + ``_bucket``)."""
    work = tempfile.mkdtemp(prefix="stream_ann_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    src = os.path.join(work, "src")
    store = os.path.join(work, "index")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)

    from pyspark.sql import functions as F

    lo, hi = embeddings.agg(F.min(id_col), F.max(id_col)).first()
    cuts = [
        lo + (hi - lo + 1) * i // max(n_chunks, 1)
        for i in range(max(n_chunks, 1) + 1)
    ]
    import time as _time

    base = _time.time()
    for i in range(n_chunks):
        d = os.path.join(src, f"chunk_{i:05d}")
        embeddings.where(
            (F.col(id_col) >= cuts[i]) & (F.col(id_col) < cuts[i + 1])
        ).coalesce(1).write.mode("overwrite").parquet(d)
        for root, _dirs, files in os.walk(d):
            for fname in files:
                os.utime(os.path.join(root, fname), (base + i, base + i))

    indexed_schema = hyperplane_lsh_buckets(embeddings, dim, bits, seed).schema
    spark.createDataFrame([], indexed_schema).write.mode("overwrite").parquet(store)

    def _process(batch: DataFrame, batch_id: int) -> None:
        hyperplane_lsh_buckets(batch, dim, bits, seed).write.mode(
            "overwrite"
        ).parquet(os.path.join(store, f"batch_{batch_id:010d}"))

    q = (
        spark.readStream.schema(embeddings.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.schema(indexed_schema)
        .option("recursiveFileLookup", "true")
        .parquet(store)
    )
