"""Time-series subsequence similarity search ([EXT] — the UCR-style
z-normalized Euclidean motif query, the classic operator over exactly
the price-tick shape this engine ingests).

Find the k subsequences of a per-key ordered series closest to a query
pattern, comparing SHAPE not level: each length-m window is
z-normalized before the distance, so a spike at $10 matches a spike at
$10,000.

Spark-first shape: windows materialize via ``collect_list`` over a
rows-frame (no self-join, no explode — one pass over the series per
key, shuffle only on the partition key), then mean/std/z/distance are
higher-order array functions staged as separate projections (NOTES.md:
HOF lambdas re-evaluate captured subtrees — stage, don't inline). The
final top-k is TakeOrderedAndProject.

At 100 TB: the frame windowing is partition-local after the one
(key, time)-sort shuffle — the same shuffle an as-of join needs — and
m stays in the frame, never in row count. For corpus-vs-corpus motif
joins, block by key + LSH over SAX words before this verify step.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def znorm(pattern: list[float]) -> list[float]:
    """Z-normalize the query pattern driver-side (population std);
    literals are inlined so both engines see identical doubles."""
    m = len(pattern)
    mu = sum(pattern) / m
    var = sum((x - mu) ** 2 for x in pattern) / m
    sd = math.sqrt(var)
    if sd == 0:
        raise ValueError("constant pattern has no shape to match")
    return [(x - mu) / sd for x in pattern]


def subsequence_search(
    events: DataFrame,
    pattern: list[float],
    key_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    k: int = 10,
) -> DataFrame:
    """Top-k z-normalized matches of ``pattern`` per the whole table.

    Returns (event_id, event_type, dist) where event_id is the window's
    first row — ordered by distance with a unique-key tiebreak."""
    m = len(pattern)
    q = znorm(pattern)
    ts, eid = order_cols

    # r11 rewrite: the former collect_list rows-frame + higher-order
    # aggregate/transform folds evaluated INTERPRETED lambdas over an
    # m-element array materialized per row. The identical math falls
    # out of m lead() columns over the same (key, time) sort — the one
    # window exec computes all m leads in a single pass, and every
    # fold below is plain double arithmetic inside whole-stage codegen
    # (no arrays, no lambda interpreter). Measured ~2× at sf0.1.
    # Bit-exactness: each sum is written as the same left-to-right
    # sequential chain (seeded 0.0) the oracle's list_reduce performs,
    # so means/stds/distances match the engine twin bit-for-bit.
    w = Window.partitionBy(key_col).orderBy(F.col(ts), F.col(eid))
    leads = [F.lead(value_col, j).over(w).alias(f"_l{j}") for j in range(m)]
    # complete-window gate: lead(id, m-1) non-null ⇔ m rows in frame
    # (id is never null) — the len(w) = m rows-frame condition.
    staged = events.select(
        F.col(eid), F.col(key_col), *leads,
        F.lead(F.col(eid), m - 1).over(w).alias("_full"),
    ).where(F.col("_full").isNotNull())

    def chain_sum(terms: list) -> object:
        acc = F.lit(0.0)
        for t in terms:
            acc = acc + t
        return acc

    ls = [F.col(f"_l{j}") for j in range(m)]
    with_mu = staged.withColumn("mu", chain_sum(ls) / m)
    with_sd = with_mu.withColumn(
        "sd",
        F.sqrt(
            chain_sum([(x - F.col("mu")) * (x - F.col("mu")) for x in ls]) / m
        ),
    ).where(F.col("sd") > 0)
    dist = F.sqrt(
        chain_sum(
            [
                ((x - F.col("mu")) / F.col("sd") - F.lit(qv))
                * ((x - F.col("mu")) / F.col("sd") - F.lit(qv))
                for x, qv in zip(ls, q)
            ]
        )
    )
    return (
        with_sd.select(eid, key_col, dist.alias("dist"))
        .orderBy("dist", eid)
        .limit(k)
    )
