"""Exact distributed heavy hitters: Misra-Gries candidate generation
per partition + exact recount of the (small) candidate set.

The naive ``groupBy(key).count()`` shuffles EVERY distinct key — at
100 TB with billions of distinct keys that is the whole job. The
two-pass form here shuffles only the candidates:

1. **Candidate pass (zero shuffle)**: each partition summarizes its
   keys with a bounded Misra-Gries sketch (Arrow-batched
   ``mapInPandas``; the MG decrement runs once per Arrow batch, so
   peak sketch memory is ``den`` counters PLUS one Arrow batch's
   distinct keys — bounded by
   ``spark.sql.execution.arrow.maxRecordsPerBatch``, default 10k, not
   by ``den`` alone). MG's guarantee: a key undercounts
   by at most ``n_p/(den+1)``, so ANY key with partition frequency
   above ``n_p/den`` survives — and a global heavy hitter (frequency
   > n/den) must exceed that in at least one partition (pigeonhole).
   Candidates are therefore a SUPERSET of the true heavy hitters under
   every possible partitioning.
2. **Recount pass**: the candidate set (≤ den per partition, deduped,
   broadcast) semi-joins the input, and only matching rows feed the
   exact count. The final filter ``freq * den > n`` is an integer
   comparison — no float threshold.

The output is exact and partition-invariant even though the candidate
set is not: false candidates are removed by the exact filter, and true
heavy hitters can never be missed. This is the pattern that keeps a
"top terms over the crawl" job from shuffling a billion-key long tail.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters"]


def heavy_hitters(df: DataFrame, col: str, *, den: int = 50) -> DataFrame:
    """Keys of ``df[col]`` with exact frequency > n/den, with their
    exact counts, ordered by (freq desc, key). ``den`` bounds the
    result size (< den keys); per-partition sketch memory is
    ``den + one Arrow batch's distinct keys`` (module docstring)."""
    n = df.count()  # scalar collect, O(1) driver state
    key_field = df.schema[col]

    def mg_partition(batches: Iterator) -> Iterator:
        import pandas as pd

        c: Counter = Counter()
        dtype = None
        for pdf in batches:
            dtype = pdf[col].dtype
            c.update(Counter(pdf[col].value_counts().to_dict()))
            if len(c) > den:
                # batch-decrement: subtract the (den+1)-th largest count
                # from everything and drop the non-positive tail — the
                # Misra-Gries merge step (Agarwal et al.), preserving
                # the undercount-≤ n_p/(den+1) bound.
                sub = sorted(c.values(), reverse=True)[den]
                c = Counter({k: v - sub for k, v in c.items() if v > sub})
        if c:
            yield pd.DataFrame({col: pd.Series(list(c.keys()), dtype=dtype)})

    # output schema derives from the input column's type — a bigint or
    # date key round-trips exactly instead of coercing through string
    from pyspark.sql.types import StructType

    cands = (
        df.select(col)
        .mapInPandas(mg_partition, schema=StructType([key_field]))
        .distinct()
    )
    return (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") * F.lit(den) > F.lit(n))
        .orderBy(F.col("freq").desc(), F.col(col))
    )
