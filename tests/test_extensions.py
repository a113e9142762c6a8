"""Tests for the UDTF / custom data source / stateful / pandas-UDF
surface and the MapType payload encoding."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crypto_price_data_pipeline_spark.pipeline.schema import (
    BPI_PAYLOAD_MAP_SCHEMA,
    BPI_PAYLOAD_SCHEMA,
)

GOLDEN = (
    {"updated": "Dec 6, 2022 13:31:00 UTC", "updatedISO": "2022-12-06T13:31:00+00:00"},
    "d",
    "Bitcoin",
    {
        "USD": {"code": "USD", "rate": "17,091.0667", "description": "United States Dollar"},
        "GBP": {"code": "GBP", "rate": "14,022.2766", "description": "British Pound Sterling"},
        "EUR": {"code": "EUR", "rate": "16,105.2663", "description": "Euro"},
    },
)


def test_flatten_accepts_map_encoding(spark):
    from crypto_price_data_pipeline_spark.pipeline.flatten import flatten_payload

    struct_df = spark.createDataFrame([GOLDEN], BPI_PAYLOAD_SCHEMA)
    map_df = spark.createDataFrame([GOLDEN], BPI_PAYLOAD_MAP_SCHEMA)
    a = flatten_payload(struct_df, now="2022-12-06 14:00:00").drop("_event_ts").collect()
    b = flatten_payload(map_df, now="2022-12-06 14:00:00").drop("_event_ts").collect()
    assert a == b


def test_explode_currencies_both_encodings(spark):
    from crypto_price_data_pipeline_spark.pipeline.explode_udtf import explode_currencies

    for schema in (BPI_PAYLOAD_SCHEMA, BPI_PAYLOAD_MAP_SCHEMA):
        df = spark.createDataFrame([GOLDEN], schema)
        rows = {r["ccy"]: r["rate_float"] for r in explode_currencies(df).collect()}
        assert rows == {"USD": 17091.0667, "GBP": 14022.2766, "EUR": 16105.2663}


def test_currency_explode_udtf(spark):
    from crypto_price_data_pipeline_spark.pipeline.explode_udtf import CurrencyExplode

    spark.udtf.register("currency_explode", CurrencyExplode)
    spark.createDataFrame([GOLDEN], BPI_PAYLOAD_SCHEMA).createOrReplaceTempView(
        "payloads_udtf"
    )
    rows = spark.sql(
        "SELECT t.* FROM payloads_udtf, LATERAL currency_explode(bpi) t"
    ).collect()
    got = {r["ccy"]: r["rate_float"] for r in rows}
    assert got == {"USD": 17091.0667, "GBP": 14022.2766, "EUR": 16105.2663}


def test_csv_json_text_sources(spark, tmp_path):
    from crypto_price_data_pipeline_spark.io.sources import (
        read_csv,
        read_json_lines,
        read_text_corpus,
    )

    csv = tmp_path / "in.csv"
    csv.write_text("id,price,ts\n1,10.5,2024-01-01 00:00:00\n2,oops,2024-01-02 00:00:00\n")
    schema = "id long, price double, ts timestamp"
    rows = read_csv(spark, str(csv), schema=schema).orderBy("id").collect()
    assert rows[0]["price"] == 10.5
    # PERMISSIVE: the bad double becomes null, row survives for the gate
    assert rows[1]["id"] == 2 and rows[1]["price"] is None

    jl = tmp_path / "in.jsonl"
    jl.write_text('{"id": 1, "v": "a"}\n{"id": 2, "v": "b"}\nnot json\n')
    jrows = read_json_lines(spark, str(jl), "id long, v string").collect()
    assert len(jrows) == 3  # malformed row kept as nulls, not a crash
    assert {r["v"] for r in jrows if r["v"]} == {"a", "b"}

    txt = tmp_path / "doc.txt"
    txt.write_text("line one\nline two\n")
    assert read_text_corpus(spark, str(txt)).count() == 2
    whole = read_text_corpus(spark, str(txt), whole_file=True).collect()
    assert len(whole) == 1 and "line two" in whole[0]["value"]


def test_compaction_and_sorted_write(spark, tmp_path):
    from crypto_price_data_pipeline_spark.io.sinks import (
        compact_parquet,
        write_sorted,
    )
    import glob

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    n = li.count()
    scattered = str(tmp_path / "scattered")
    li.repartition(40).write.parquet(scattered)  # simulate small-file debris
    assert len(glob.glob(f"{scattered}/*.parquet")) >= 40
    n_files = compact_parquet(spark, scattered, target_file_bytes=64 * 1024 * 1024)
    assert len(glob.glob(f"{scattered}/*.parquet")) == n_files < 40
    assert spark.read.parquet(scattered).count() == n  # lossless

    srt = str(tmp_path / "sorted")
    write_sorted(li.repartition(2), srt, sort_cols=["l_orderkey"])
    back = spark.read.parquet(srt)
    assert back.count() == n
    # row-group stats selectivity: a point predicate must push down
    pushed = back.where(F.col("l_orderkey") == 1)
    assert pushed.count() == li.where(F.col("l_orderkey") == 1).count()


def test_http_poll_source(spark, tmp_path):
    from crypto_price_data_pipeline_spark.streaming.http_source import register

    register(spark)

    def run(attempt: int):
        q = (
            spark.readStream.format("http_poll")
            .option("ticksPerBatch", "4")
            .load()
            .writeStream.format("memory")
            .queryName("http_out")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ckpt{attempt}"))
            .start()
        )
        q.awaitTermination()

    # retries: the Python-worker connect-back window is a HARDCODED 10s
    # in PythonWorkerFactory (PROCESS_WAIT_TIMEOUT_MS — no conf), and a
    # loaded host can miss it. Environment timing, not engine logic.
    import time

    for attempt in range(3):
        try:
            run(attempt)
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(5 * (attempt + 1))
    rows = spark.table("http_out").collect()
    assert len(rows) == 4
    # payloads parse through the real pipeline schema
    parsed = (
        spark.table("http_out")
        .select(F.from_json("value", BPI_PAYLOAD_SCHEMA).alias("p"))
        .select("p.bpi.USD.rate")
        .collect()
    )
    assert all(r["rate"] is not None for r in parsed)


def test_running_ohlc_stateful(spark, tmp_path):
    from crypto_price_data_pipeline_spark.streaming.stateful import running_ohlc

    src = tmp_path / "ev"
    src.mkdir()
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "btc", 10.0),
         (2, "2024-01-01 10:01:00", "btc", 30.0),
         (3, "2024-01-01 10:02:00", "btc", 5.0),
         (4, "2024-01-01 10:03:00", "btc", 20.0),
         (5, "2024-01-01 10:00:30", "eth", 2.0)],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(df.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q = (
        running_ohlc(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("ohlc_state_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    rows = {r["key"]: r for r in spark.table("ohlc_state_out").collect()}
    btc = rows["btc"]
    assert (btc["open"], btc["high"], btc["low"], btc["close"]) == (10.0, 30.0, 5.0, 20.0)
    assert btc["n"] == 4 and abs(btc["volume"] - 65.0) < 1e-9
    assert rows["eth"]["open"] == rows["eth"]["close"] == 2.0


def test_running_ohlc_state_survives_restart(spark, tmp_path):
    """Checkpoint recovery for the custom stateful operator (SURVEY §7
    risk): stop the query after the first batch, land new files, restart
    from the SAME checkpoint — the per-key state store must carry the
    running OHLC across the restart, so the final row equals a one-shot
    computation over all events (nothing reset, nothing recounted)."""
    from crypto_price_data_pipeline_spark.streaming.stateful import running_ohlc

    src = tmp_path / "ev"
    src.mkdir()
    schema = "event_id long, ts string, event_type string, value double"

    def mk(rows):
        return spark.createDataFrame(rows, schema).withColumn(
            "ts", F.to_timestamp("ts")
        )

    b1 = mk([(1, "2024-01-01 10:00:00", "btc", 10.0),
             (2, "2024-01-01 10:01:00", "btc", 30.0)])
    b1.write.parquet(str(src / "b1"))

    emitted: list = []

    def run_once():
        # memory sink can't recover from a checkpoint; foreachBatch can
        emitted.clear()

        def sink(batch, _bid):
            emitted.extend(batch.collect())

        stream = spark.readStream.schema(b1.schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        q = (
            running_ohlc(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()  # availableNow drains then STOPS the query

    run_once()
    first = {r["key"]: r for r in emitted}
    assert first["btc"]["n"] == 2 and first["btc"]["high"] == 30.0

    # query is dead; new data lands; restart from the same checkpoint
    b2 = mk([(3, "2024-01-01 10:02:00", "btc", 5.0),
             (4, "2024-01-01 10:03:00", "btc", 20.0)])
    b2.write.parquet(str(src / "b2"))
    run_once()
    btc = {r["key"]: r for r in emitted}["btc"]
    # open comes from batch 1's state (restored), close from batch 2;
    # counts/volume accumulate across the restart instead of resetting
    assert (btc["open"], btc["high"], btc["low"], btc["close"]) == (
        10.0, 30.0, 5.0, 20.0,
    )
    assert btc["n"] == 4 and abs(btc["volume"] - 65.0) < 1e-9


def test_running_ohlc_transform_with_state(spark, tmp_path):
    """Same semantics as test_running_ohlc_stateful on the Spark 4
    transformWithStateInPandas runtime (needs the RocksDB provider)."""
    from crypto_price_data_pipeline_spark.streaming.stateful import running_ohlc_tws

    import pytest

    if running_ohlc_tws is None:
        pytest.skip("transformWithStateInPandas unavailable")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("protobuf not installed (transformWithState state protocol needs it)")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "ev"
        src.mkdir()
        df = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", "btc", 10.0),
             (2, "2024-01-01 10:01:00", "btc", 30.0),
             (3, "2024-01-01 10:02:00", "btc", 5.0),
             (4, "2024-01-01 10:03:00", "btc", 20.0),
             (5, "2024-01-01 10:00:30", "eth", 2.0)],
            "event_id long, ts string, event_type string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))
        df.write.parquet(str(src / "b1"))
        stream = spark.readStream.schema(df.schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        q = (
            running_ohlc_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("ohlc_tws_out")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
        rows = {r["key"]: r for r in spark.table("ohlc_tws_out").collect()}
        btc = rows["btc"]
        assert (btc["open"], btc["high"], btc["low"], btc["close"]) == (10.0, 30.0, 5.0, 20.0)
        assert btc["n"] == 4 and abs(btc["volume"] - 65.0) < 1e-9
        assert rows["eth"]["open"] == rows["eth"]["close"] == 2.0
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_pandas_udfs(spark):
    from crypto_price_data_pipeline_spark.functions.pandas_udfs import (
        geometric_mean,
        winsorized_mean,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 100.0), ("b", 4.0), ("b", 9.0)], "k string, v double"
    )
    rows = {
        r["k"]: (r["gm"], r["wm"])
        for r in df.groupBy("k")
        .agg(geometric_mean("v").alias("gm"), winsorized_mean("v").alias("wm"))
        .collect()
    }
    assert abs(rows["a"][0] - 10.0) < 1e-9  # sqrt(1*100)
    assert abs(rows["b"][0] - 6.0) < 1e-9  # sqrt(36)
    assert math.isfinite(rows["a"][1])


def test_jdbc_roundtrip_embedded_derby(spark):
    """Exercise the JDBC sink + source against the Derby embedded engine
    (ships in pyspark's jars) — an in-JVM stand-in for the reference's
    Postgres warehouse append (bpi_crawler.py:173 to_sql)."""
    import pytest

    from crypto_price_data_pipeline_spark.io.sinks import jdbc_append
    from crypto_price_data_pipeline_spark.io.sources import jdbc_read

    url = "jdbc:derby:memory:graftdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.createDataFrame(
        [(1, "USD", 42.5), (2, "EUR", 39.1)], "id int, code string, rate double"
    )
    try:
        # Spark maps StringType -> CLOB on Derby, which can't be compared
        # in a pushed-down predicate; give the DDL an explicit VARCHAR
        jdbc_append(
            df, url, "rates", {**props, "createTableColumnTypes": "code VARCHAR(16)"}
        )
    except Exception as e:  # pragma: no cover - driver genuinely absent
        pytest.skip(f"embedded Derby unavailable: {e}")
    jdbc_append(df.where("id = 1"), url, "rates", props)  # append semantics
    back = jdbc_read(spark, url, "rates", props)
    assert back.count() == 3
    assert back.where("code = 'USD'").count() == 2
    assert {r["code"] for r in back.collect()} == {"USD", "EUR"}


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from crypto_price_data_pipeline_spark.io.sinks import write_orc
    from crypto_price_data_pipeline_spark.io.sources import read_orc

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).alias("part"),
        (F.col("id") * 2.5).alias("v"),
    )
    path = str(tmp_path / "orc_tbl")
    write_orc(df, path, partition_by=["part"])
    back = read_orc(spark, path)
    assert back.count() == 100
    filtered = back.where(F.col("part") == 2)
    assert filtered.count() == 25
    # partition pruning must reach the ORC scan
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
