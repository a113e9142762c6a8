"""Range / interval join (SURVEY.md §2.4 J4).

A raw theta-join ``a.x between b.lo and b.hi`` plans as
BroadcastNestedLoopJoin — fine when one side is tiny (banding against a
small tiers table), quadratic disaster otherwise. ``band_join`` keeps
the broadcast-NL fast path for small range tables and provides the
bucketed rewrite for large ones: overlap each interval onto
fixed-width buckets, equi-join on the bucket id (hash shuffle, not NL),
then re-apply the exact predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    broadcast_ranges: bool = True,
    bucket_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to range rows with ``lo <= value < hi``.

    ``bucket_width`` switches to the scale path: explode each range into
    the buckets it overlaps, equi-join on ``floor(value/width)``, then
    filter exactly. Choose width ≈ median range length so each range
    explodes to O(1) buckets.
    """
    exact = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    if bucket_width is None:
        rng = F.broadcast(ranges) if broadcast_ranges else ranges
        return facts.join(rng, exact, how)

    w = float(bucket_width)
    bucketed_ranges = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor((F.col(hi_col) - F.lit(1e-9)) / w).cast("long"),
            )
        ),
    )
    bucketed_facts = facts.withColumn("_bucket", F.floor(F.col(value_col) / w).cast("long"))
    return (
        bucketed_facts.join(bucketed_ranges, ["_bucket"], how)
        .where(exact)
        .drop("_bucket")
    )
