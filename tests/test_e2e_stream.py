"""End-to-end: custom http_poll streaming source → flatten/enrich
pipeline → idempotent warehouse. The full reference DAG chain
(crawl → enrich → flatten → validate → load) as one streaming job."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_price_data_pipeline_spark.pipeline.flatten import flatten_payload
from crypto_price_data_pipeline_spark.pipeline.rates import join_idr_rate
from crypto_price_data_pipeline_spark.pipeline.schema import (
    BPI_PAYLOAD_SCHEMA,
    ENRICHED_COLUMNS,
)


def test_http_poll_to_warehouse(spark, tmp_path):
    from crypto_price_data_pipeline_spark.io.sinks import idempotent_append
    from crypto_price_data_pipeline_spark.streaming.http_source import register

    register(spark)
    rates = spark.createDataFrame(
        [("USD", "IDR", "2022-12-06", 15650.25)],
        "from_ccy string, to_ccy string, rate_date string, rate double",
    ).withColumn("rate_date", F.to_date("rate_date"))

    raw = (
        spark.readStream.format("http_poll")
        .option("ticksPerBatch", "5")
        .load()
        .select(F.from_json("value", BPI_PAYLOAD_SCHEMA).alias("p"))
        .select("p.*")
    )
    enriched = join_idr_rate(
        flatten_payload(raw, now="2022-12-06 14:00:00"), rates
    ).select(*ENRICHED_COLUMNS)

    warehouse = str(tmp_path / "warehouse")

    def sink_batch(batch_df, epoch_id):
        idempotent_append(spark, batch_df, warehouse, keys=["job_id"])

    q = (
        enriched.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(warehouse)
    rows = out.collect()
    assert len(rows) == 5
    assert out.columns == ENRICHED_COLUMNS
    r = {row["time_updated_iso"]: row for row in rows}
    # synthetic fetcher: rate = 17000 + tick, all on 2022-12-06
    first = r["2022-12-06 12:00:00"]
    assert first["bpi_usd_rate_float"] == 17000.0
    assert first["bpi_idr_rate_float"] == 17000.0 * 15650.25
    assert first["bpi_gdp_code"] == "GBP"

    # replaying the same offsets into the sink appends nothing
    from crypto_price_data_pipeline_spark.streaming.http_source import default_fetch

    replay = (
        spark.createDataFrame([(v,) for v in default_fetch(0, 5)], "value string")
        .select(F.from_json("value", BPI_PAYLOAD_SCHEMA).alias("p"))
        .select("p.*")
    )
    replay_out = join_idr_rate(
        flatten_payload(replay, now="2022-12-06 14:00:00"), rates
    ).select(*ENRICHED_COLUMNS)
    from crypto_price_data_pipeline_spark.io.sinks import idempotent_append as ia

    assert ia(spark, replay_out, warehouse, keys=["job_id"]) == 0
    assert spark.read.parquet(warehouse).count() == 5
