"""Global total-order ranking without a global sort.

Every training run needs a reproducible global example order — the
"deterministic shuffle" that turns a corpus into epoch N's sample
sequence.  The naive Spark spelling,
``row_number().over(Window.orderBy(key))`` with no ``partitionBy``,
moves the WHOLE dataset onto one partition (Spark warns, then one
executor sorts 100 TB).  This module computes the identical rank with
the same two-phase decomposition ``operators/packing.py`` uses for its
prefix sum:

  1. bucket every row by a MONOTONE coarsening of the sort key (for the
     md5-hex keys used by the shuffle, the first 2 hex chars → 256
     uniform buckets; uniformity is free because the key is a hash);
  2. rank locally inside each bucket — ``Window.partitionBy(bucket)``,
     parallel across the cluster, each bucket ~N/256 rows;
  3. count rows per bucket (one 256-row agg, collected), build
     exclusive bucket-prefix offsets on the driver, broadcast back, and
     add: ``pos = bucket_prefix + local_rank``.

Monotone bucket + per-bucket orderBy(key) ⇒ the result is bit-identical
to the single-partition global window (verified in
tests/test_wave9.py), but the only shuffle is keyed by the bucket and
the driver ever sees ``num_buckets`` integers.  At 1000 executors use
4096+ buckets (pass ``prefix_chars=3``) so each bucket still fits a
task.

Reference parity: the reference ETL (bpi_crawler.py) orders nothing —
this is §2.11 [EXT] training-data surface (the epoch-shuffle primitive
feeding ``operators/packing.py``'s concat-and-chunk layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType
from pyspark.sql.window import Window

_BKT = "_ord_bkt"


def hex_prefix_bucket(key: Column | str, prefix_chars: int = 2) -> Column:
    """Bucket id from the first ``prefix_chars`` chars of a lowercase
    fixed-width hex key (md5/sha). Lexicographic hex order == numeric
    order of the prefix, so the bucket is a monotone coarsening of the
    key's sort order — the precondition ``global_order_index`` needs."""
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(c, 1, prefix_chars), 16, 10).cast("long")


def global_order_index(
    df: DataFrame,
    key_cols: list[str],
    bucket: Column,
    *,
    num_buckets: int,
    pos_col: str = "pos",
) -> DataFrame:
    """Add ``pos_col``: the 1-based global rank of each row under
    ``ORDER BY *key_cols`` — without ever forming a global sort.

    ``bucket`` MUST be a deterministic, monotone coarsening of the
    ``key_cols`` ordering (``bucket(a) < bucket(b)`` ⇒ ``a`` sorts
    before ``b``); ``key_cols`` must be a total order (include a unique
    tiebreaker — ties would make ranks nondeterministic).
    """
    bucketed = df.withColumn(_BKT, bucket)

    # phase 3 input: per-bucket row counts → exclusive prefixes.
    # num_buckets rows on the driver; broadcast back.
    counts = {
        r[_BKT]: r["n"]
        for r in bucketed.groupBy(_BKT).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    prefixes, acc = [], 0
    for b in sorted(counts):
        prefixes.append((b, acc))
        acc += int(counts[b])
    spark = SparkSession.getActiveSession() or df.sparkSession
    pref_df = spark.createDataFrame(
        prefixes or [(0, 0)], f"{_BKT} long, _ord_prefix long"
    )

    local = Window.partitionBy(_BKT).orderBy(*[F.col(c) for c in key_cols])
    return (
        bucketed.withColumn("_ord_local", F.row_number().over(local))
        .join(F.broadcast(pref_df), _BKT)
        .withColumn(pos_col, (F.col("_ord_local") + F.col("_ord_prefix")).cast("long"))
        .drop(_BKT, "_ord_local", "_ord_prefix")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    *,
    seed: str = "epoch0",
    pos_col: str = "pos",
    prefix_chars: int = 2,
) -> DataFrame:
    """Deterministic global training order: rank rows by
    ``md5(seed || ':' || id)`` (unique ids ⇒ total order; the id itself
    tie-breaks the ~2⁻⁶⁴ collision case). Changing ``seed`` produces an
    independent permutation — one corpus, one cheap rank pass per
    epoch, no RNG state anywhere."""
    key = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    out = global_order_index(
        df.withColumn("_shuffle_key", key),
        ["_shuffle_key", id_col],
        hex_prefix_bucket("_shuffle_key", prefix_chars),
        num_buckets=16**prefix_chars,
        pos_col=pos_col,
    )
    return out.drop("_shuffle_key")


def ntile_from_rank(pos_col: str, n: int, tiles: int) -> Column:
    """NTILE(tiles) bucket (1-based) computed from an exact 1-based
    global rank column — the piece that lets a two-phase
    ``global_order_index`` rank replace a single-partition NTILE
    window. Exact NTILE rule: with ``n = q*tiles + rem``, the first
    ``rem`` tiles hold ``q+1`` rows each, the rest ``q`` (SQL
    standard; matches Spark and DuckDB). Integer DIV only — float
    division could floor-err on exact bucket boundaries."""
    q, rem = divmod(n, tiles)
    if q == 0:  # fewer rows than tiles: each row gets its own tile
        return F.col(pos_col)
    cut = rem * (q + 1)
    return F.expr(
        f"CASE WHEN {pos_col} <= {cut} THEN ({pos_col} - 1) DIV {q + 1} + 1 "
        f"ELSE {rem} + ({pos_col} - 1 - {cut}) DIV {q} + 1 END"
    )


def global_order_index_inplan(
    df: DataFrame,
    key_cols: list[str],
    bucket: Column,
    *,
    pos_col: str = "pos",
) -> DataFrame:
    """``global_order_index`` with the bucket-prefix phase IN-PLAN: the
    per-bucket counts aggregate (≤ |bucket domain| rows by
    construction) takes its exclusive running sum from a window over
    that tiny aggregate — a bounded-domain single-partition window,
    exactly the compressed-domain case the plan-hygiene gate permits —
    and broadcasts back. Same contract as ``global_order_index``
    (monotone bucket, total-order key_cols), same bit-identical
    result, but ZERO driver round-trips: the whole rank is one lazy
    plan, so a caller composing several ranks (e.g. three RFM metrics)
    pays one job, not one collect per rank. Prefer this variant unless
    the caller needs the bucket counts driver-side anyway (packing's
    duplicate guard)."""
    bucketed = df.withColumn(_BKT, bucket)
    counts = bucketed.groupBy(_BKT).agg(F.count(F.lit(1)).alias("_ord_n"))
    woff = Window.orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        _BKT, F.coalesce(F.sum("_ord_n").over(woff), F.lit(0)).alias("_ord_off")
    )
    local = Window.partitionBy(_BKT).orderBy(*[F.col(c) for c in key_cols])
    return (
        bucketed.withColumn("_ord_local", F.row_number().over(local))
        .join(F.broadcast(offs), _BKT)
        .withColumn(pos_col, (F.col("_ord_local") + F.col("_ord_off")).cast("long"))
        .drop(_BKT, "_ord_local", "_ord_off")
    )


def global_order_offsets_inplan(
    df: DataFrame,
    key_cols: list[str],
    bucket: Column,
    *,
    weight_col: str,
    pos_col: str = "pos",
    offset_col: str = "offset",
    guard_unique_keys: bool = True,
) -> DataFrame:
    """``global_order_index_inplan`` extended with an EXCLUSIVE global
    running sum of ``weight_col`` in the same two-phase pass: the
    per-bucket aggregate carries (row count, weight total), the
    bounded-domain window over that tiny aggregate yields both bucket
    prefixes, and the per-bucket window computes local rank AND local
    exclusive cumsum in one sort. One bucket-keyed shuffle total —
    the caller gets ``pos`` (1-based global rank) and ``offset``
    (global exclusive weighted prefix, first row 0) from a single
    lazy plan, where the rank-then-``with_global_offsets`` composition
    paid a second full pass plus two driver round-trips (an eager
    min/max/count and a bucket-totals collect) that re-ran the whole
    upstream (e.g. the tokenize) once each.

    Same contract as ``global_order_index``: ``bucket`` must be a
    deterministic monotone coarsening of the ``key_cols`` order and
    ``key_cols`` a total order. ``guard_unique_keys`` (default) rides
    an in-plan lag check on the per-bucket sort: a duplicate key tuple
    (which would make ranks — and therefore offsets — nondeterministic
    across runs) or a NULL fails the job at action time, the
    fail-don't-corrupt contract of ``packing.with_global_offsets``,
    for zero extra shuffles."""
    bucketed = df.withColumn(_BKT, bucket)
    agg = bucketed.groupBy(_BKT).agg(
        F.count(F.lit(1)).alias("_ord_n"),
        F.sum(weight_col).alias("_ord_t"),
    )
    woff = Window.orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
    offs = agg.select(
        _BKT,
        F.coalesce(F.sum("_ord_n").over(woff), F.lit(0)).alias("_ord_off"),
        F.coalesce(F.sum("_ord_t").over(woff), F.lit(0)).alias("_ord_woff"),
    )
    local = Window.partitionBy(_BKT).orderBy(*[F.col(c) for c in key_cols])
    local_cum = local.rowsBetween(Window.unboundedPreceding, -1)
    lw = F.coalesce(F.sum(weight_col).over(local_cum), F.lit(0))
    if guard_unique_keys:
        tup = F.struct(*[F.col(c) for c in key_cols])
        guard = F.assert_true(
            F.forall(F.array(*[F.col(c).isNotNull() for c in key_cols]), lambda x: x)
            & ~tup.eqNullSafe(F.lag(tup).over(local)),
            F.concat(
                F.lit(
                    "global_order_offsets_inplan: NULL or duplicate key tuple "
                    f"{key_cols} (ranks/offsets would be nondeterministic) at: "
                ),
                tup.cast("string"),
            ),
        )
        # additive coalesce keeps the (always-NULL-on-success) assert
        # referenced inside the cumsum so neither column pruning nor
        # SimplifyConditionals can drop it — the with_global_offsets
        # trick (a when(p, x).otherwise(x) spelling was constant-folded
        # away, guard and all)
        lw = lw + F.coalesce(guard.cast("long"), F.lit(0))
    ranked = bucketed.withColumn("_ord_local", F.row_number().over(local)).withColumn(
        "_ord_lw", lw
    )
    # pos is always a long (it's a rank); the weighted offset keeps the
    # weight column's OWN sum type — casting a fractional (double /
    # decimal) running sum to long would silently truncate (r11
    # ADVICE). Integral weights still land as long via Spark's sum.
    integral = isinstance(
        df.schema[weight_col].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )
    off_expr = F.col("_ord_lw") + F.col("_ord_woff")
    if integral:
        off_expr = off_expr.cast("long")
    return (
        ranked.join(F.broadcast(offs), _BKT)
        .withColumn(pos_col, (F.col("_ord_local") + F.col("_ord_off")).cast("long"))
        .withColumn(offset_col, off_expr)
        .drop(_BKT, "_ord_local", "_ord_lw", "_ord_off", "_ord_woff")
    )


def ntile_from_rank_cols(pos: Column, n: Column, tiles: int) -> Column:
    """``ntile_from_rank`` with ``n`` as a COLUMN (e.g. from a 1-row
    broadcast count) instead of a driver-side int — lets the whole
    NTILE-from-rank pipeline stay one lazy plan. Same exact NTILE
    rule. Integer division is spelled ``(a - a % b) / b`` (the %
    stays in long arithmetic, the division is then an exact multiple)
    so no float-floor edge case can shift a boundary row."""

    def idiv(a: Column, b: Column) -> Column:
        return ((a - a % b) / b).cast("long")

    t = F.lit(tiles).cast("long")
    q = idiv(n.cast("long"), t)
    rem = n.cast("long") % t
    cut = rem * (q + 1)
    p = pos.cast("long")
    return F.when(q == 0, p).otherwise(
        F.when(p <= cut, idiv(p - 1, q + 1) + 1).otherwise(
            rem + idiv(p - 1 - cut, q) + 1
        )
    )
