"""Wave-12 units: streamed MERGE ≡ batch (+ restart no-op), skew
report sanity, confusion-matrix totals, time-weighted-average bounds,
stats-catalog invariants, streamed vocab drift ≡ batch rule."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_stream_merge_equals_batch(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    streamed = [tuple(r) for r in QUERIES["q_stream_merge"](spark, SF).collect()]
    batch = [tuple(r) for r in QUERIES["q_merge_upsert"](spark, SF).collect()]
    assert streamed == batch


def test_cdc_log_restart_is_noop(spark, tmp_path):
    """Re-running the availableNow ingest over the same source with the
    same checkpoint must not change the merged change set (replay
    safety of the per-batch_id overwrite store)."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.streaming.merge_stream import (
        read_cdc_changes,
        stream_cdc_log,
    )

    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    src = str(tmp_path / "src")
    for c in range(2):
        ev.where(F.col("event_id") % 2 == c).coalesce(1).write.parquet(
            f"{src}/chunk_{c}"
        )
    args = (
        spark,
        src,
        ev.schema,
        str(tmp_path / "log"),
        str(tmp_path / "ckpt"),
        "user_id",
        "ts",
        "event_id",
        ["event_type", "value"],
    )
    read_schema = (
        "user_id long, ts timestamp, event_id long, event_type string, value double"
    )
    stream_cdc_log(*args)
    first = {
        tuple(r)
        for r in read_cdc_changes(
            spark, str(tmp_path / "log"), read_schema, "user_id", "ts", "event_id"
        ).collect()
    }
    stream_cdc_log(*args)  # restart: checkpoint says all files done
    second = {
        tuple(r)
        for r in read_cdc_changes(
            spark, str(tmp_path / "log"), read_schema, "user_id", "ts", "event_id"
        ).collect()
    }
    assert first == second and first


def test_skew_report_consistent_with_tables(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = {r["table_name"]: r for r in QUERIES["q_skew_report"](spark, SF).collect()}
    assert set(rows) == {"orders", "lineitem"}
    assert rows["orders"]["n_rows"] == load_table(spark, SF, "orders").count()
    assert rows["lineitem"]["n_rows"] == load_table(spark, SF, "lineitem").count()
    for r in rows.values():
        assert 0 < r["top10_share"] <= 1.0
        assert r["max_freq"] >= r["p99_freq"] >= 0
        assert r["n_keys"] <= r["n_rows"]


def test_lang_confusion_totals(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_lang_confusion"](spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    langs = {r["lang"] for r in load_table(spark, SF, "documents").select("lang").distinct().collect()}
    preds = {"en", "de", "es", "fr", "und"}
    for r in rows:
        assert r["lang"] in langs and r["lang_pred"] in preds


def test_time_weighted_avg_within_value_range(spark):
    """A time-weighted mean with non-negative weights must lie within
    the [min, max] of the weighted values (the last event per user
    carries no weight)."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    out = {r["user_id"]: r for r in QUERIES["q_time_weighted_avg"](spark, SF).collect()}
    ev = load_table(spark, SF, "events").select("user_id", "ts", "event_id", "value")
    rows = sorted(ev.collect(), key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
    by_user: dict[int, list[float]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["value"])
    for uid, r in out.items():
        weighted = by_user[uid][:-1]  # last event has no interval
        assert min(weighted) - 1e-9 <= r["twa_value_r9"] <= max(weighted) + 1e-9


def test_table_stats_invariants(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_table_stats"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 < r["ndv"] <= r["n_rows"]
        assert r["n_null"] == 0
        assert r["min_val"] <= r["max_val"] or r["ndv"] == 1


def test_stream_vocab_drift_equals_batch_rule(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.text import tokenize
    from crypto_price_data_pipeline_spark.queries import QUERIES

    streamed = [tuple(r) for r in QUERIES["q_stream_vocab_drift"](spark, SF).collect()]
    docs = load_table(spark, SF, "documents").select(
        "doc_id",
        "text",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("nib"),
    )
    vocab = (
        docs.where(~F.col("nib").isin("c", "d", "e", "f"))
        .select(F.explode(F.array_distinct(tokenize("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("token"))
        .limit(256)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    batch = [
        tuple(r)
        for r in (
            docs.select(
                (F.col("doc_id") % 3).alias("chunk"),
                "doc_id",
                F.explode(tokenize("text")).alias("token"),
            )
            .join(F.broadcast(vocab), "token", "left")
            .groupBy("chunk")
            .agg(
                F.countDistinct("doc_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_tok"),
                F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)).alias(
                    "n_oov"
                ),
            )
            .withColumn(
                "oov_rate",
                F.col("n_oov").cast("double") / F.col("n_tok").cast("double"),
            )
            .orderBy("chunk")
            .collect()
        )
    ]
    assert streamed == batch
