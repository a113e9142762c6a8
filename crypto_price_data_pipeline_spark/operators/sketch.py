"""Count-Min sketch as a dataflow ([EXT] §2.11 'novel sketch').

A CMS is (depth × width) counters; each value increments one counter
per depth row (bucket = hash_d(value) mod width) and a point estimate
is the MIN of its depth counters — an overestimate with error ≤ εN at
probability 1-δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.

Expressed Spark-first: the sketch IS a DataFrame of (d, bucket, cnt)
rows built with one explode + one aggregation — mergeable across
partitions/streams by summing counters (the partial-agg property the
100 TB path needs; two corpus sketches union+sum into one). Hashes are
md5-derived (not xxhash64) so estimates are verifiable from any engine
with md5 — the DuckDB oracle rebuilds the identical sketch.

Here CMS complements the built-in sketches (approx_count_distinct =
HLL, percentile_approx = KLL): those answer distinct/quantile, CMS
answers per-key frequency in sublinear space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_bucket(value: Column, d: Column | int, width: int) -> Column:
    """hash_d(value) mod width, via the first 8 hex chars of
    md5('s' || d || value) — cross-engine reproducible."""
    h = F.md5(F.concat(F.lit("s"), F.lit(d) if isinstance(d, int) else d, value))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width))


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) counter rows.

    Pre-aggregates exact per-value counts first (map-side combinable;
    the explode then fans out |distinct values| × depth rows, not
    |rows| × depth), then sums counts into buckets."""
    counts = df.groupBy(F.col(col).cast("string").alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    fanned = counts.select(
        "_v",
        "_c",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select(
        "d",
        _md5_bucket(F.col("_v"), F.col("d").cast("string"), width).alias("bucket"),
        "_c",
    )
    return fanned.groupBy("d", "bucket").agg(F.sum("_c").alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): counters
    add. This is what makes CMS work across streams and partitions."""
    return a.unionByName(b).groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, queries: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-frequency estimates for each value in ``queries[col]``:
    min over the value's depth counters (missing counter → 0)."""
    fanned = queries.select(
        F.col(col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select(
        col,
        "d",
        _md5_bucket(F.col(col).cast("string"), F.col("d").cast("string"), width).alias("bucket"),
    )
    return (
        fanned.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("estimate"))
    )
