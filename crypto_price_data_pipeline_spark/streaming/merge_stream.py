"""Streamed CDC capture for MERGE INTO: per-batch latest-change
partials + merge-on-read reduction.

The batch path (``operators/merge.merge_upsert``) applies ONE change
row per key. At ingest time the change events arrive in micro-batches
with a key's events possibly split across batches, so the streaming
decomposition mirrors ``scd_stream``/``continuous_agg``:

- **write path** (per micro-batch): reduce the batch to its latest
  event per key (argmax by the (ts, tiebreak) order — a batch-local,
  replay-idempotent partial) and land it in a per-batch_id OVERWRITE
  store. Re-delivery of a batch rewrites identical content.
- **read path**: union the partials and re-run the SAME argmax across
  batches. argmax over a total order is associative, so per-batch
  winners reduced again ≡ the global latest-per-key — which is why the
  streamed merge matches the batch oracle whatever the chunking.

State stays bounded by |keys| per batch, not |events|; the partial log
compacts with ``continuous_agg.compact_rollup``'s staged-swap pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from .partial_store import run_partial_stream


def stream_cdc_log(
    spark: SparkSession,
    src: str,
    schema,
    log_dir: str,
    checkpoint_dir: str,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    payload_cols: list[str],
) -> None:
    """availableNow ingest: per micro-batch, keep each key's latest row
    (ORDER BY ts DESC, tiebreak DESC) and land it per-batch_id."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(key_col).orderBy(
            F.col(ts_col).desc(), F.col(tiebreak_col).desc()
        )
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(key_col, ts_col, tiebreak_col, *payload_cols)
        )
        latest.write.mode("overwrite").parquet(f"{log_dir}/batch_{batch_id:05d}")

    run_partial_stream(
        spark, src=src, schema=schema, sink=sink, ckpt=checkpoint_dir
    )


def read_cdc_changes(
    spark: SparkSession,
    log_dir: str,
    read_schema: str,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Merge-on-read: union the per-batch winners, re-reduce to the
    global latest per key (same argmax — associative), return one
    change row per key."""
    log = spark.read.schema(read_schema).option(
        "recursiveFileLookup", "true"
    ).parquet(log_dir)
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
