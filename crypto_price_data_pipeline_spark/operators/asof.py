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
    """For each left row, attach the nearest right row matching ``by``
    keys: the latest with ``right.on <= left.on`` (backward, default),
    the earliest with ``right.on >= left.on`` (forward), or whichever
    of the two is closer in time (nearest; ties resolve backward —
    pd.merge_asof's rule).

    Right-side columns in ``value_cols`` are carried; ties on the time
    column are inclusive in every direction (the right row at the exact
    left timestamp matches), matching pd.merge_asof.

    Plan shape is direction-independent: tag both sides, union, one
    shuffle on ``by``, then carry values across with last/first
    (ignorenulls) window functions — nearest just computes both carries
    in the same window pass and picks per-row, so it costs two sorts of
    the same unioned relation, never a join.

    All value columns plus the right timestamp travel as ONE struct
    through a single last/first carry, so the attached values always
    come from the same right row the tolerance/nearest decision is made
    on — a right row with a NULL value column attaches that NULL
    (pd.merge_asof semantics), never a value scavenged from an earlier
    row.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    by = by or []
    value_cols = value_cols or [c for c in right.columns if c not in set(by) | {on}]

    r_struct = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in value_cols]
        + [T.StructField("__rt", right.schema[on].dataType, True)]
    )
    lhs = left.select(
        *left.columns,
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r_struct).alias("_r"),
    )
    rhs = right.select(
        *[F.col(c) if c in set(by) | {on} else F.lit(None).cast(left.schema[c].dataType).alias(c) if c in left.columns else F.lit(None).alias(c) for c in left.columns],
        F.lit(0).alias("_is_left"),
        F.struct(
            *[F.col(c).alias(c) for c in value_cols], F.col(on).alias("__rt")
        ).alias("_r"),
    )
    unioned = lhs.unionByName(rhs.select(lhs.columns))

    # backward: right sorts BEFORE left at equal timestamps so the
    # trailing window includes it; forward mirrors (right after left)
    bw = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fw = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # the struct is non-null for every right row (even all-NULL value
    # fields), so ignorenulls skips exactly the interleaved left rows
    sel = list(unioned.columns)
    if direction in ("backward", "nearest"):
        sel.append(F.last("_r", ignorenulls=True).over(bw).alias("_b"))
    if direction in ("forward", "nearest"):
        sel.append(F.first("_r", ignorenulls=True).over(fw).alias("_f"))
    out = unioned.select(*sel).where(F.col("_is_left") == 1)

    # eligibility per side: a matched right timestamp exists and (when
    # a tolerance is given) lies within it. Timestamps compare in
    # integer microseconds — exact, so the nearest tie-break can't
    # drift from an integer-arithmetic oracle (unix_timestamp truncates
    # to seconds; double epoch has float rounding).
    if isinstance(left.schema[on].dataType, (T.TimestampType, T.TimestampNTZType)):
        num, tol_lit = F.unix_micros, (
            None if tolerance_seconds is None else F.lit(int(tolerance_seconds * 1_000_000))
        )
    else:
        num, tol_lit = (lambda c: c.cast("double")), (
            None if tolerance_seconds is None else F.lit(float(tolerance_seconds))
        )
    t = num(F.col(on))
    b_rt = F.col("_b").getField("__rt")
    f_rt = F.col("_f").getField("__rt")
    d_b = t - num(b_rt)
    d_f = num(f_rt) - t
    tol_ok = (lambda d: d <= tol_lit) if tolerance_seconds is not None else (lambda d: F.lit(True))
    if direction == "backward":
        pick = lambda c: F.when(b_rt.isNotNull() & tol_ok(d_b), F.col("_b").getField(c))  # noqa: E731
    elif direction == "forward":
        pick = lambda c: F.when(f_rt.isNotNull() & tol_ok(d_f), F.col("_f").getField(c))  # noqa: E731
    else:
        elig_b = b_rt.isNotNull() & tol_ok(d_b)
        elig_f = f_rt.isNotNull() & tol_ok(d_f)
        use_b = elig_b & (~elig_f | (d_b <= d_f))  # tie → backward
        pick = lambda c: F.when(use_b, F.col("_b").getField(c)).when(  # noqa: E731
            elig_f, F.col("_f").getField(c)
        )
    return out.select(*left.columns, *[pick(c).alias(c) for c in value_cols])


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str] | None = None,
    direction: str = "backward",
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
        merged = pd.merge_asof(lpdf, rpdf, on=on, direction=direction)
        return merged[l_cols + value_cols]

    return left.groupBy(*keys).cogroup(right.groupBy(*keys)).applyInPandas(merge, out_schema)
