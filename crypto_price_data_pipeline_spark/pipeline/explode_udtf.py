"""Payload-explosion UDTF (SURVEY.md §2.10).

The inverse of the wide flatten (P1): one BPI payload row → N currency
rows — the natural shape when the currency set is open-ended (the
MapType payload encoding). Implemented both ways:

- ``explode_currencies`` — pure DataFrame ops over the struct/map
  encoding (stack/explode): the fast path, always preferred;
- ``CurrencyExplode`` — a Python UDTF (Spark 3.5+ ``@udtf``): the
  declared UDTF surface for cases where per-row expansion logic is
  genuinely imperative (e.g. schema discovery per payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import udtf


def explode_currencies(payloads: DataFrame) -> DataFrame:
    """(snapshot_iso, ccy, rate_float, description) — one row per
    currency, struct or map encoded payloads."""
    bpi_type = payloads.schema["bpi"].dataType
    if isinstance(bpi_type, T.MapType):
        kv = payloads.select(
            F.col("time.updatedISO").alias("snapshot_iso"),
            F.explode("bpi").alias("ccy", "cur"),
        )
    else:
        codes = [f.name for f in bpi_type.fields]
        kv = payloads.select(
            F.col("time.updatedISO").alias("snapshot_iso"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("ccy"), F.col(f"bpi.{c}").alias("cur")
                        )
                        for c in codes
                    ]
                )
            ).alias("kv"),
        ).select("snapshot_iso", "kv.ccy", "kv.cur")
    return kv.select(
        "snapshot_iso",
        "ccy",
        F.translate("cur.rate", ",", "").try_cast("double").alias("rate_float"),
        F.col("cur.description").alias("description"),
    )


@udtf(returnType="ccy: string, rate_float: double, description: string")
class CurrencyExplode:
    """UDTF form: takes the bpi struct as a Row, yields one row per
    currency. Register with ``spark.udtf.register("currency_explode",
    CurrencyExplode)`` and call in SQL:
    ``SELECT t.* FROM payloads, LATERAL currency_explode(bpi) t``."""

    def eval(self, bpi):
        if bpi is None:
            return
        for ccy in bpi.__fields__ if hasattr(bpi, "__fields__") else []:
            cur = bpi[ccy]
            if cur is None:
                continue
            rate = None
            try:
                rate = float(str(cur["rate"]).replace(",", ""))
            except (TypeError, ValueError):
                pass
            yield (ccy, rate, cur["description"])
