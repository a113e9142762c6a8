"""Shared runner for the per-batch_id partial-store streams.

Every streamed≡batch twin in the registry follows one discipline: a
file-chunked source replayed with ``maxFilesPerTrigger=1`` under an
``availableNow`` trigger, a ``foreachBatch`` sink that computes a
DETERMINISTIC partial of the micro-batch and lands it under
``.../batch_<id>`` with OVERWRITE (so a replayed batch rewrites
identical content — exactly-once without a transactional sink), and a
read side that merges the partial store. This module owns the runner
block those queries previously inlined, for two reasons:

1. one definition of the replay contract instead of fifteen copies;
2. a test seam: the parameterized crash/restart test
   (``tests/test_stream_restart.py``) injects a crash AFTER a batch's
   store write but BEFORE its checkpoint commit — the worst replay
   window — restarts from the checkpoint, and asserts the store is
   row-identical to an uninterrupted run, for EVERY store builder
   that routes through here.

Reference parity: the reference's crawler appends one row per poll with
no replay story (`bpi_crawler.py:43-214`); the per-batch_id overwrite
store is the [EXT] exactly-once generalization documented in
SCALING.md.

The hook is intentionally process-local and test-only: production
callers never touch ``_test_hook``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

Sink = Callable[["DataFrame", int], None]  # noqa: F821 - doc alias

# test seam (see module docstring). When set, a dict with:
#   crash_after: int  - raise after this many successful sink calls
#   runs: list        - every run_partial_stream call appends its
#                       (src, schema, sink, ckpt) so a test can resume
#                       the exact crashed stream with the real sink.
_test_hook: dict | None = None


class _InjectedCrash(RuntimeError):
    pass


def fold_partials(dir_path: str, merged_fn: Callable[[], "DataFrame"]) -> int:
    """Shared staged-and-swap compaction for per-batch_id partial
    stores (r13 — one definition; compact_rollup and
    compact_artifact_store both call this): list the ``batch_*`` /
    ``compacted_*`` subdirs, materialize ``merged_fn()`` (the caller's
    settled form — a re-aggregation for decomposable rollup partials,
    a pure union rewrite for disjoint row partials) into a staging dir
    OUTSIDE ``dir_path`` so a recursive scan can never see its own
    output, then swap: remove the folded subdirs and rename the stage
    to ``compacted_0000000000``. Returns the number of subdirs folded
    (0 = nothing to do). The settled subdir is just another — bigger —
    partial, so compaction is associative and a second compact is a
    no-op. Crash contract (callers' docstrings): run while the
    maintenance stream is stopped, or fold only batch ids at or below
    the last committed checkpoint offset — a crashed batch replaying
    AFTER its partial was folded would re-create its subdir and
    double-count."""
    import os
    import shutil

    if not os.path.isdir(dir_path):
        return 0
    subdirs = [
        d
        for d in sorted(os.listdir(dir_path))
        if os.path.isdir(os.path.join(dir_path, d))
        and d.startswith(("batch_", "compacted_"))
    ]
    if len(subdirs) <= 1:
        return 0
    tmp = dir_path.rstrip("/") + ".compacting"
    merged_fn().write.mode("overwrite").parquet(tmp)
    for d in subdirs:
        shutil.rmtree(os.path.join(dir_path, d), ignore_errors=True)
    os.rename(tmp, os.path.join(dir_path, "compacted_0000000000"))
    return len(subdirs)


def day_chunk_expr(n: int = 3):
    """Chunk id in [0, n) from an event's day-of-month, used to split
    the events table into the replayed micro-batch files. Clamped with
    least(): a naive ``(dayofmonth-1) div 10`` maps day 31 to chunk 3,
    which ``range(3)`` never writes — rows born on the 31st would be
    silently absent from the stream while present in the batch oracle.
    """
    from pyspark.sql import functions as F

    return F.expr(
        f"least(cast((dayofmonth(ts) - 1) div 10 as int), {int(n) - 1})"
    )


def write_day_chunks(df, src: str, n: int = 3) -> None:
    """Materialize ``df`` (an events projection carrying ``ts``) as
    ``n`` single-file parquet chunks under ``src`` — the standard
    source layout every partial-store stream replays with
    ``maxFilesPerTrigger=1``. Every row lands in exactly one chunk
    (day-31 clamps into the last one, see day_chunk_expr)."""
    chunk = day_chunk_expr(n)
    for c in range(n):
        df.where(chunk == c).coalesce(1).write.parquet(f"{src}/chunk_{c}")


def run_partial_stream(
    spark: SparkSession,
    *,
    src: str,
    schema: StructType,
    sink: Sink,
    ckpt: str,
) -> None:
    """Replay the chunked parquet source one file per micro-batch
    through ``sink`` with availableNow + checkpoint semantics; blocks
    until the stream drains. ``sink`` must be deterministic per batch
    content and write with per-batch_id OVERWRITE (the replay
    contract above)."""
    effective = sink
    if _test_hook is not None:
        _test_hook.setdefault("runs", []).append(
            {"src": src, "schema": schema, "sink": sink, "ckpt": ckpt}
        )
        crash_after = _test_hook.get("crash_after")
        if crash_after is not None:
            done: list[int] = []

            def effective(batch, batch_id, _sink=sink, _done=done):  # noqa: F811
                _sink(batch, batch_id)
                _done.append(batch_id)
                if len(_done) >= crash_after:
                    raise _InjectedCrash(
                        f"injected crash after store write of batch {batch_id}"
                    )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .writeStream.foreachBatch(effective)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
