"""As-of join (SURVEY.md §2.4 J2) — the robust form of the reference's
rate-enrichment lookup (bpi_crawler.py:72-91 fetches the rate for
``date=today``; the as-of form takes the latest rate ≤ event time, so a
missing day falls back instead of yielding NULL).

Spark has no native ASOF JOIN. Two implementations:

1. ``asof_join`` (default) — the *union + window* rewrite: tag both
   sides, union, and carry the last right-side value forward with
   ``last(col, ignorenulls=True)`` over (partition by key, order by
   time). One shuffle on the join key, all JVM, no Python. This is the
   scale path: state per key is O(1), skew handled by AQE.

2. ``asof_join_pandas`` — ``applyInPandas`` + ``pd.merge_asof`` per key
   group. Simpler to reason about, Arrow-batched, but pays the Python
   round-trip; kept as the semantic cross-check and for tolerance
   variants pandas already implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (direction="backward"), matching ``by`` keys.

    Right-side columns in ``value_cols`` are carried; ties on the time
    column resolve to the *right* row (right sorts before left at equal
    timestamps), matching pd.merge_asof's inclusive backward semantics.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")
    by = by or []
    value_cols = value_cols or [c for c in right.columns if c not in set(by) | {on}]

    lhs = left.select(
        *left.columns,
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    rhs = right.select(
        *[F.col(c) if c in set(by) | {on} else F.lit(None).cast(left.schema[c].dataType).alias(c) if c in left.columns else F.lit(None).alias(c) for c in left.columns],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = lhs.unionByName(rhs.select(lhs.columns))

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *unioned.columns,
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}") for c in value_cols],
        F.max(F.when(F.col("_is_left") == 0, F.col(on))).over(w).alias("_c_rt"),
    )
    out = carried.where(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        within = (
            F.col("_c_rt").isNotNull()
            & (F.unix_timestamp(F.col(on)) - F.unix_timestamp("_c_rt") <= tolerance_seconds)
        )
        out = out.select(
            *left.columns,
            *[F.when(within, F.col(f"_c_{c}")).alias(c) for c in value_cols],
        )
    else:
        out = out.select(*left.columns, *[F.col(f"_c_{c}").alias(c) for c in value_cols])
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """merge_asof per key group via applyInPandas (semantic cross-check)."""
    import pandas as pd
    from pyspark.sql import types as T

    value_cols = value_cols or [c for c in right.columns if c not in set(by) | {on}]
    # build a fresh StructType — DataFrame.schema is cached and
    # StructType.add mutates in place, so never .add onto df.schema
    out_schema = T.StructType(
        list(left.schema.fields) + [right.schema[c] for c in value_cols]
    )
    l_cols, keys = left.columns, list(by)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(on)
        rpdf = rpdf.sort_values(on)[[on] + value_cols]
        merged = pd.merge_asof(lpdf, rpdf, on=on, direction="backward")
        return merged[l_cols + value_cols]

    return left.groupBy(*keys).cogroup(right.groupBy(*keys)).applyInPandas(merge, out_schema)
