"""Custom Python streaming data source for HTTP polling (SURVEY.md §2.1
S1/S2 true-streaming form; Spark 4 ``pyspark.sql.datasource`` API).

The reference polls the CoinDesk BPI endpoint on an Airflow cron
(bpi_crawler.py:43-60). Here the poll is a first-class Spark streaming
source: each micro-batch fetches whatever snapshots arrived since the
last committed offset, so checkpointing gives exactly-once delivery
into the pipeline with no XCom/Mongo bookkeeping.

Network access is injected: the source takes a ``fetcher`` module path
resolving to ``fetch(from_offset: int, to_offset: int) -> list[str]``
(JSON payload strings). The default fetcher is a deterministic
generator (for tests/CI); a production deployment points it at a real
HTTP client with the same contract.
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition


def default_fetch(from_offset: int, to_offset: int) -> list[str]:
    """Deterministic stand-in for the BPI endpoint: one synthetic
    snapshot per offset tick (minute cadence from a fixed epoch)."""
    out = []
    for i in range(from_offset, to_offset):
        minute = i % 60
        hour = 12 + (i // 60) % 12
        iso = f"2022-12-06T{hour:02d}:{minute:02d}:00+00:00"
        rate = 17000.0 + i
        payload = {
            "time": {
                "updated": f"Dec 6, 2022 {hour:02d}:{minute:02d}:00 UTC",
                "updatedISO": iso,
            },
            "disclaimer": "synthetic",
            "chartName": "Bitcoin",
            "bpi": {
                c: {
                    "code": c,
                    "rate": f"{rate * m:,.4f}",
                    "description": d,
                }
                for c, m, d in [
                    ("USD", 1.0, "United States Dollar"),
                    ("GBP", 0.82, "British Pound Sterling"),
                    ("EUR", 0.94, "Euro"),
                ]
            },
        }
        out.append(json.dumps(payload))
    return out


class _PollPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class HttpPollStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._batch_ticks = int(options.get("ticksperbatch", "3"))
        fetcher = options.get("fetcher")
        if fetcher:
            mod, name = fetcher.rsplit(":", 1)
            self._fetch = getattr(importlib.import_module(mod), name)
        else:
            self._fetch = default_fetch
        self._offset = 0

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def latestOffset(self) -> dict:
        # each trigger advances the poll window by ticksPerBatch
        self._offset += self._batch_ticks
        return {"tick": self._offset}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return [_PollPartition(start["tick"], end["tick"])]

    def commit(self, end: dict) -> None:
        pass

    def read(self, partition: _PollPartition) -> Iterator[tuple]:
        for raw in self._fetch(partition.start, partition.end):
            yield (raw,)


class HttpPollDataSource(DataSource):
    """spark.readStream.format("http_poll").option("ticksPerBatch", 5)
    → DataFrame[value: string] of raw JSON payloads; pipe into
    from_json(BPI_PAYLOAD_SCHEMA) + the flatten/enrich pipeline."""

    @classmethod
    def name(cls) -> str:
        return "http_poll"

    def schema(self) -> str:
        return "value string"

    def streamReader(self, schema) -> HttpPollStreamReader:
        return HttpPollStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(HttpPollDataSource)
