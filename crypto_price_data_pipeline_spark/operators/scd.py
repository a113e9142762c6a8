"""Slowly-changing-dimension (type 2) history builder.

The warehouse-side twin of the reference's append-only snapshot sink
(bpi_crawler.py:162-176 appends every poll as a new row): SCD2 turns an
append stream of per-key snapshots into versioned dimension rows with
effective_from / effective_to / is_current — the standard shape for
point-in-time joins (pair with ``operators.asof.asof_join`` on
``effective_from`` for as-of lookups).

Scale shape: one window over (key ORDER BY ts) — a single hash shuffle
on the key, no self-join, no driver loop. Consecutive-duplicate
suppression is a lag() compare in the same window pass, so building
history over 100 TB of snapshots costs exactly one sort-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-feed between two table snapshots: one row per
    changed key with change_type ∈ {insert, delete, update}.

    The emulation of a lakehouse CDF read for plain-parquet tables:
    one full-outer join on the key, null-safe column compare for
    updates. At 100 TB both snapshots shuffle once on the key —
    partition both tables by ingest date and diff partition-by-
    partition to prune unchanged history.
    """
    compare_cols = compare_cols or [c for c in new.columns if c not in key_cols]
    # presence markers travel with the values so one full-outer join
    # decides side membership even when every attribute is NULL
    o = old.select(
        *key_cols,
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    joined = o.join(n, key_cols, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    return (
        joined.select(
            *key_cols,
            F.when(F.col("_in_old").isNull(), F.lit("insert"))
            .when(F.col("_in_new").isNull(), F.lit("delete"))
            .when(changed, F.lit("update"))
            .alias("change_type"),
        )
        .where(F.col("change_type").isNotNull())
    )


def scd2_history(
    snapshots: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    suppress_unchanged: bool = True,
) -> DataFrame:
    """Collapse an append-only snapshot stream into SCD2 version rows.

    Each output row is one version of the key's attributes, valid over
    [effective_from, effective_to) (effective_to NULL = open/current).
    With ``suppress_unchanged`` consecutive snapshots with identical
    attributes extend the prior version instead of opening a new one.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    df = snapshots
    if suppress_unchanged:
        changed = F.lit(False)
        for c in attr_cols:
            prev = F.lag(c).over(w)
            # null-safe inequality: a change to/from NULL is a change
            changed = changed | ~F.col(c).eqNullSafe(prev)
        first = F.lag(ts_col).over(w).isNull()
        df = df.withColumn("_new_version", (first | changed).cast("int"))
        df = df.where(F.col("_new_version") == 1).drop("_new_version")
    w2 = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    return (
        df.select(
            *key_cols,
            F.col(ts_col).alias("effective_from"),
            F.lead(ts_col).over(w2).alias("effective_to"),
            *attr_cols,
        )
        .withColumn("is_current", F.col("effective_to").isNull())
    )
