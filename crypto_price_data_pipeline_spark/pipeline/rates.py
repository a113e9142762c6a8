"""FX-rate enrichment join (SURVEY.md §2.4 J1).

The reference calls a live convert API per record
(``gete_idr_price``, bpi_crawler.py:62-91: GET
api.apilayer.com/exchangerates_data/convert?from=USD&to=IDR&date=today,
then attaches ``result = amount × rate`` via ``update_one $set``).

Re-expressed as a broadcast equi-join of the snapshot stream against a
rates *dimension table* ``(from_ccy, to_ccy, rate_date, rate)`` — the
deterministic form the correctness oracle needs, and the form that
scales: the dimension is tiny, so the join is a broadcast hash join with
no shuffle of the (huge) fact side. The multiplication
``usd_rate × fx_rate`` happens engine-side (the reference delegated it
to the API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_idr_rate(
    enriched: DataFrame,
    fx_rates: DataFrame,
    from_ccy: str = "USD",
    to_ccy: str = "IDR",
) -> DataFrame:
    """Attach ``bpi_idr_rate_float = bpi_usd_rate_float * rate`` for the
    rate row matching (pair, event date). Left join: a missing rate row
    yields NULL (caught by the validation gate), never a dropped snapshot.
    """
    dim = fx_rates.where(
        (F.col("from_ccy") == from_ccy) & (F.col("to_ccy") == to_ccy)
    ).select("rate_date", "rate")
    return (
        enriched.join(
            F.broadcast(dim),
            F.to_date(enriched["_event_ts"]) == dim["rate_date"],
            "left",
        )
        .withColumn(
            "bpi_idr_rate_float", F.col("bpi_usd_rate_float") * F.col("rate")
        )
        .drop("rate_date", "rate")
    )
