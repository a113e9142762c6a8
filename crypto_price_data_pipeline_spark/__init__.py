"""crypto_price_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference crypto-price ETL (harysetiawan23/crypto-price-data-pipeline,
surveyed in SURVEY.md) on idiomatic Spark:

- ``pipeline``  — the reference's heart: flatten/enrich/validate/load of
  CoinDesk BPI price snapshots (reference: dags/bpi_crawler/bpi_crawler.py)
  as pure DataFrame transforms.
- ``io``        — sources (parquet star schema, JSON payloads, JDBC) and
  sinks (append/overwrite parquet, idempotent append, JDBC).
- ``functions`` — scalar helpers (de-comma cast, datetime parse/format).
- ``operators`` — relational + extension operators: as-of join, range
  join, dedup (exact/MinHash-LSH/SimHash), embedding similarity search,
  text analysis, multimodal column plumbing.
- ``streaming`` — Structured Streaming ingest (poll → accumulate → flush),
  watermarked windows, streaming dedup, OHLC rollups.

Everything is DataFrame/Catalyst-first; Python UDFs appear only where the
built-in operators cannot express the semantics (Arrow-batched, never
row-at-a-time in a hot path).
"""

__version__ = "0.1.0"
