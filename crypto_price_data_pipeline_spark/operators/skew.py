"""Skew-mitigation salted join (SURVEY.md §4 physical notes).

AQE's skew-join splitting handles sort-merge skew automatically
(enabled in session.py); this explicit salted join is the portable
fallback for the cases AQE can't split (e.g. skewed broadcast-side or
aggregation keys): the skewed side gets a deterministic salt in
[0, n), the other side is replicated across all n salt values, and the
join runs on (key, salt) — spreading one hot key over n tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with the skewed side salted deterministically.

    The salt derives from xxhash64 over ALL skewed-side columns (not
    rand()), so retries and replays produce identical partitioning —
    important for debugging and for idempotent downstream sinks.
    ``other`` is exploded ×salt_buckets; keep it the smaller side.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets))
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return left.join(right, on + ["_salt"], how).drop("_salt")
