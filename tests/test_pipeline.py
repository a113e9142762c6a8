"""Pipeline parity tests: golden BPI payload through flatten/enrich/
validate (FIXTURES.md §1-3, reference semantics per SURVEY.md §1.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_price_data_pipeline_spark.pipeline import (
    BPI_PAYLOAD_SCHEMA,
    ENRICHED_COLUMNS,
    ValidationError,
    run_pipeline,
)

GOLDEN = (
    {"updated": "Dec 6, 2022 13:31:00 UTC", "updatedISO": "2022-12-06T13:31:00+00:00"},
    "This data was produced from the CoinDesk Bitcoin Price Index (USD).",
    "Bitcoin",
    {
        "USD": {"code": "USD", "rate": "17,091.0667", "description": "United States Dollar"},
        "GBP": {"code": "GBP", "rate": "14,022.2766", "description": "British Pound Sterling"},
        "EUR": {"code": "EUR", "rate": "16,105.2663", "description": "Euro"},
    },
)


def _rates(spark):
    return spark.createDataFrame(
        [("USD", "IDR", "2022-12-06", 15650.25)],
        "from_ccy string, to_ccy string, rate_date string, rate double",
    ).withColumn("rate_date", F.to_date("rate_date"))


def test_golden_payload_roundtrip(spark):
    payloads = spark.createDataFrame([GOLDEN], BPI_PAYLOAD_SCHEMA)
    out = run_pipeline(payloads, _rates(spark), now="2022-12-06 14:00:03")
    assert out.columns == ENRICHED_COLUMNS
    row = out.collect()[0].asDict()
    assert row["chart_name"] == "Bitcoin"
    assert row["bpi_usd_code"] == "USD"
    assert row["bpi_usd_rate_float"] == 17091.0667
    # GBP data under the reference's intentional gdp misspelling
    assert row["bpi_gdp_code"] == "GBP"
    assert row["bpi_gdp_rate_float"] == 14022.2766
    assert row["bpi_eur_rate_float"] == 16105.2663
    # engine-side multiplication replacing the convert API
    assert row["bpi_idr_rate_float"] == 17091.0667 * 15650.25
    # timestamps as wall-format strings, tz dropped
    assert row["time_updated"] == "2022-12-06 13:31:00"
    assert row["time_updated_iso"] == "2022-12-06 13:31:00"
    assert row["last_updated"] == "2022-12-06 14:00:03"
    # deterministic content-hash job id (32-hex like the Mongo ObjectId hex)
    assert len(row["job_id"]) == 32 and int(row["job_id"], 16) >= 0


def test_missing_rate_fails_gate(spark):
    payloads = spark.createDataFrame([GOLDEN], BPI_PAYLOAD_SCHEMA)
    no_match = spark.createDataFrame(
        [("USD", "IDR", "1999-01-01", 1.0)],
        "from_ccy string, to_ccy string, rate_date string, rate double",
    ).withColumn("rate_date", F.to_date("rate_date"))
    with pytest.raises(ValidationError):
        run_pipeline(payloads, no_match, now="2022-12-06 14:00:03")


def test_bad_timestamp_fails_gate_not_runtime(spark):
    bad = (
        {"updated": "garbage", "updatedISO": "not-iso"},
        "d",
        "Bitcoin",
        GOLDEN[3],
    )
    payloads = spark.createDataFrame([bad], BPI_PAYLOAD_SCHEMA)
    with pytest.raises(ValidationError):
        run_pipeline(payloads, _rates(spark), now="2022-12-06 14:00:03")


def test_idempotent_append(spark, tmp_path):
    from crypto_price_data_pipeline_spark.io.sinks import idempotent_append

    payloads = spark.createDataFrame([GOLDEN], BPI_PAYLOAD_SCHEMA)
    out = run_pipeline(payloads, _rates(spark), now="2022-12-06 14:00:03")
    path = str(tmp_path / "warehouse")
    assert idempotent_append(spark, out, path, keys=["job_id"]) == 1
    # replay: same batch appends nothing (replaces reference's manual
    # delete-after-load bookkeeping)
    assert idempotent_append(spark, out, path, keys=["job_id"]) == 0
    assert spark.read.parquet(path).count() == 1
