"""Streaming SCD2 dimension maintenance: append-only version log +
merge-on-read suppression.

The batch builder (``operators/scd.scd2_history``) collapses a complete
snapshot table in one window pass. At ingest time the snapshots arrive
in micro-batches, possibly out of key-and-time order across batches, so
a per-batch "append the new version rows" strategy is WRONG: a late
snapshot can split or extend a version that a previous batch already
closed. Correct incremental SCD2 is merge-shaped, and the honest
streaming decomposition used here is the same one
``streaming/continuous_agg.py`` uses for rollups:

- **write path** (per micro-batch): reduce the batch to its distinct
  ``(key, ts, attrs)`` snapshot rows — a batch-local, replay-idempotent
  partial — and land them in a per-batch_id OVERWRITE store
  (re-delivery of a batch rewrites the same subdir; nothing
  accumulates twice).
- **read path**: union the partials, re-deduplicate ``(key, ts)``
  across batches (the same snapshot may arrive in two chunks), and run
  the ONE window pass of ``scd2_history`` over the merged log. The
  window cost is |dimension snapshots|, not |fact stream| — the
  read-side suppression is exactly the batch operator, so streamed ≡
  batch by construction, which the oracle verifies.
- **compaction**: the partial log is re-bucketable offline
  (``continuous_agg.compact_rollup`` pattern) so merge-on-read stays
  bounded by settled-version count, not batch count.

This is the lakehouse MERGE INTO pattern without a table format: the
log is the append side, the read view is the materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .partial_store import run_partial_stream


def stream_scd2_log(
    spark: SparkSession,
    snapshots_src: str,
    schema,
    log_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_col: str,
    attr_exprs: dict[str, "F.Column"],
) -> None:
    """Run the availableNow ingest: stream the snapshot source, reduce
    each micro-batch to distinct ``(key, ts, attr)`` partial rows, and
    land them per-batch_id. ``attr_exprs`` maps output attr name →
    Column over the source schema (MIN-reduced per (key, ts) so the
    partial is deterministic whatever the in-batch row order)."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        partial = batch.groupBy(*key_cols, ts_col).agg(
            *[F.min(expr).alias(name) for name, expr in attr_exprs.items()]
        )
        partial.write.mode("overwrite").parquet(f"{log_dir}/batch_{batch_id:05d}")

    run_partial_stream(
        spark, src=snapshots_src, schema=schema, sink=sink, ckpt=checkpoint_dir
    )


def read_scd2(
    spark: SparkSession,
    log_dir: str,
    read_schema: str,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Materialize the SCD2 history from the version log: cross-batch
    (key, ts) re-dedup (MIN per attr, matching the write partials) then
    the batch builder's single window pass."""
    from ..operators.scd import scd2_history

    log = (
        spark.read.schema(read_schema)
        .option("recursiveFileLookup", "true")
        .parquet(log_dir)
    )
    merged = log.groupBy(*key_cols, ts_col).agg(
        *[F.min(c).alias(c) for c in attr_cols]
    )
    return scd2_history(merged, key_cols, ts_col, attr_cols)
