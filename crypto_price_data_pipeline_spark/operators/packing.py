"""Sequence packing for LLM pre-training: assign documents to
fixed-length training sequences via a DISTRIBUTED global prefix sum.

The packing scheme is concat-and-chunk (the standard pre-training
layout: concatenate all documents in a deterministic order, then cut
the token stream every ``seq_len`` tokens).  Each document's placement
is fully determined by its exclusive running token offset in global
``order_col`` order — so the whole operator reduces to a global cumsum,
which is exactly the thing a naive Spark implementation gets wrong:

    ``F.sum(w).over(Window.orderBy(order_col))`` with no partitionBy
    moves EVERY row to a single partition (Spark even warns).  At
    100 TB that is one executor sorting the corpus.

Instead we do the classic two-phase parallel prefix sum:

  1. bucket rows by a monotone range function of ``order_col``
     (bucket boundaries respect the global order, so bucket id is a
     pure, deterministic function of the row — no repartition sampling,
     nothing to persist);
  2. local exclusive cumsum per bucket — a ``Window.partitionBy(bucket)``
     that parallelizes across the cluster;
  3. per-bucket totals (one tiny agg, ``num_buckets`` rows) are
     collected, turned into exclusive bucket prefixes on the driver,
     and broadcast-joined back.

Every shuffle is keyed by the bucket; nothing global ever lands on one
partition.  The result is bit-identical to the single-partition window
(integer weights, associative sum), verified in tests/test_packing.py.

Reference parity: the reference pipeline (bpi_crawler.py) has no
packing stage — this is part of the §2.11 training-data surface the
engine adds beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BKT = "_pack_bkt"
_LOCAL = "_pack_local"


def with_global_offsets(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    *,
    num_buckets: int = 64,
    offset_col: str = "offset",
) -> DataFrame:
    """Add ``offset_col``: the exclusive global running sum of
    ``weight_col`` in ascending ``order_col`` order (first row gets 0),
    computed with the two-phase distributed prefix sum above.

    ``order_col`` must be numeric, non-NULL, and distinct (it defines
    the global concatenation order — doc ids, row numbers, hashes).
    Violations RAISE instead of silently corrupting the packing: a NULL
    order would drop corpus rows through the bucket join, and duplicate
    order values make per-row offsets nondeterministic across runs.
    The guard rides the stats pass that already scans the corpus once
    (count/countDistinct fold into the same partial-agg stage as
    min/max — no extra shuffle beyond the aggregate's own).
    """
    lo, hi, n_rows, n_nonnull, n_distinct = df.agg(
        F.min(order_col),
        F.max(order_col),
        F.count(F.lit(1)),
        F.count(order_col),
        F.countDistinct(order_col),
    ).first()
    if n_nonnull < n_rows:
        raise ValueError(
            f"with_global_offsets: {n_rows - n_nonnull} row(s) have NULL "
            f"{order_col!r}; the global concatenation order is undefined — "
            "assign a non-NULL order key (e.g. monotonically_increasing_id)"
        )
    if n_distinct < n_nonnull:
        raise ValueError(
            f"with_global_offsets: {order_col!r} has {n_nonnull - n_distinct} "
            "duplicate value(s); offsets would be nondeterministic — use a "
            "unique order key or add a tiebreak column"
        )
    if lo is None:
        return df.withColumn(offset_col, F.lit(None).cast("long"))
    span = max(int(hi) - int(lo) + 1, 1)
    bucket = F.least(
        F.lit(num_buckets - 1),
        ((F.col(order_col) - F.lit(int(lo))).cast("double") * num_buckets / span).cast(
            "long"
        ),
    )
    bucketed = df.withColumn(_BKT, bucket)

    # phase 3 input: per-bucket totals -> exclusive bucket prefixes.
    # num_buckets rows on the driver; broadcast back.
    totals = {
        r[_BKT]: r["t"]
        for r in bucketed.groupBy(_BKT).agg(F.sum(weight_col).alias("t")).collect()
    }
    prefixes, acc = [], 0
    for b in range(num_buckets):
        prefixes.append((b, acc))
        acc += int(totals.get(b, 0) or 0)
    spark = SparkSession.getActiveSession() or df.sparkSession
    pref_df = spark.createDataFrame(prefixes, f"{_BKT} long, _pack_prefix long")

    local = Window.partitionBy(_BKT).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        bucketed.withColumn(_LOCAL, F.coalesce(F.sum(weight_col).over(local), F.lit(0)))
        .join(F.broadcast(pref_df), _BKT)
        .withColumn(offset_col, (F.col(_LOCAL) + F.col("_pack_prefix")).cast("long"))
        .drop(_BKT, _LOCAL, "_pack_prefix")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    seq_len: int,
    *,
    num_buckets: int = 64,
) -> DataFrame:
    """Concat-and-chunk packing: adds

    - ``offset``    — exclusive global token offset of the row,
    - ``seq_id``    — the sequence its first token lands in,
    - ``end_seq_id``— the sequence its last token lands in
      (> seq_id ⇔ the document straddles a sequence boundary).

    Zero-weight rows are dropped (they occupy no tokens).
    """
    packed = with_global_offsets(
        df.where(F.col(weight_col) > 0),
        order_col,
        weight_col,
        num_buckets=num_buckets,
    )
    return packed.withColumn(
        "seq_id", F.expr(f"offset div {int(seq_len)}")
    ).withColumn(
        "end_seq_id",
        F.expr(f"(offset + {weight_col} - 1) div {int(seq_len)}"),
    )
