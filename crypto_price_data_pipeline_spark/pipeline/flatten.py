"""Flatten the nested BPI payload into the 16-column enriched record.

Reproduces ``data_enrichment`` (reference: bpi_crawler.py:93-125) as one
pure DataFrame→DataFrame projection — nested-field extraction (P1),
renames (P2), de-comma casts (F1/F2), datetime parse/format round-trips
(F4-F6) — all JVM-side expressions, so the whole stage is a single
codegen'd projection over the scan; Catalyst prunes unread payload
fields at the source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalars import (
    de_comma_double,
    format_wall_ts,
    parse_bpi_updated,
    parse_iso_offset,
)


def _ccy(df: DataFrame, code: str) -> Column:
    """Currency sub-struct access for both encodings (struct / map)."""
    bpi_type = df.schema["bpi"].dataType
    if isinstance(bpi_type, T.MapType):
        return F.col("bpi").getItem(code)
    return F.col(f"bpi.{code}")


def flatten_payload(
    payloads: DataFrame,
    now: str | None = None,
    job_id: Column | None = None,
) -> DataFrame:
    """Payload rows → flat enriched rows (minus the IDR join, see rates.py).

    ``now`` freezes the wall-clock ``last_updated`` (reference:
    ``datetime.now()`` at bpi_crawler.py:118) for deterministic tests;
    ``job_id`` overrides the surrogate key (reference: Mongo ObjectId hex,
    bpi_crawler.py:171) — default is a deterministic content hash so that
    retries produce the same key (idempotent sink friendly), with
    ``F.expr("uuid()")`` as the engine-generated alternative.
    """
    usd, gbp, eur = _ccy(payloads, "USD"), _ccy(payloads, "GBP"), _ccy(payloads, "EUR")
    if job_id is None:
        job_id = F.md5(F.concat_ws("|", F.col("time.updatedISO"), F.col("chartName")))
    now_col = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()

    return payloads.select(
        job_id.alias("job_id"),
        F.col("disclaimer"),
        F.col("chartName").alias("chart_name"),
        usd["code"].alias("bpi_usd_code"),
        de_comma_double(usd["rate"]).alias("bpi_usd_rate_float"),
        usd["description"].alias("bpi_usd_description"),
        # GBP data lands under bpi_gdp_* — reference's declared schema
        # (bpi_crawler.py:107-109; misspelling preserved intentionally).
        gbp["code"].alias("bpi_gdp_code"),
        de_comma_double(gbp["rate"]).alias("bpi_gdp_rate_float"),
        gbp["description"].alias("bpi_gdp_description"),
        eur["code"].alias("bpi_eur_code"),
        de_comma_double(eur["rate"]).alias("bpi_eur_rate_float"),
        eur["description"].alias("bpi_eur_description"),
        # string-formatted timestamps, tz dropped (bpi_crawler.py:114-118)
        format_wall_ts(parse_bpi_updated(F.col("time.updated"))).alias("time_updated"),
        format_wall_ts(parse_iso_offset(F.col("time.updatedISO"))).alias("time_updated_iso"),
        format_wall_ts(now_col).alias("last_updated"),
        # typed event-time column kept for the rates join & streaming
        # surface (internal; dropped by the sink projection).
        parse_iso_offset(F.col("time.updatedISO")).alias("_event_ts"),
    )
