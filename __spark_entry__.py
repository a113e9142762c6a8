"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``crypto_price_data_pipeline_spark`` — see
``crypto_price_data_pipeline_spark/queries.py`` for the registry.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))


def _check_counts() -> tuple[dict[str, int], set[str]]:
    """How many times each query name has appeared in a past
    CORRECTNESS_r*.json, plus the names in the most recent round.
    Used to rotate the registry so the driver's 50-per-round sample
    eventually covers every query."""
    counts: dict[str, int] = {}
    latest: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            latest = set(rows)
            for name in rows:
                counts[name] = counts.get(name, 0) + 1
    return counts, latest


def _rotated(registry: dict) -> dict:
    """Stable sort: least-driver-checked queries first (ties broken by
    preferring names absent from the most recent round), so each round's
    50-query sample hits the names with the fewest CORRECTNESS rows."""
    counts, latest = _check_counts()
    names = list(registry)
    order = sorted(
        range(len(names)),
        key=lambda i: (counts.get(names[i], 0), names[i] in latest, i),
    )
    return {names[i]: registry[names[i]] for i in order}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape pricing summary) on sf0.001."""
    from crypto_price_data_pipeline_spark.queries import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crypto_price_data_pipeline_spark.queries import QUERIES

    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    from crypto_price_data_pipeline_spark.queries import ORACLES

    return dict(ORACLES)
