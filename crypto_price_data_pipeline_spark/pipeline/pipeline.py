"""End-to-end BPI pipeline: payloads + rates → validated enriched rows.

The Spark re-expression of the reference's full DAG chain
(crawl → idr-enrich → flatten → validate → load,
bpi_crawler.py:178-214). What was seven Celery tasks with Mongo/XCom
handoffs collapses into one lazy DataFrame plan: the staging store is
lineage, the validation is observe() metrics on the sink action, and the
load is whatever sink the caller points at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .flatten import flatten_payload
from .rates import join_idr_rate
from .schema import ENRICHED_COLUMNS
from .validate import check_observation, expectation_gate


def run_pipeline(
    payloads: DataFrame,
    fx_rates: DataFrame,
    now: str | None = None,
    sink=None,
) -> DataFrame:
    """Flatten → rates join → projection → expectation gate [→ sink].

    Returns the enriched DataFrame in the reference's 16-column sink
    order (bpi_crawler.py:172). If ``sink`` (a callable df→None) is
    given, the gate is enforced on the sink's own action — single pass,
    fail-closed (ValidationError raised after the write completes but
    before the caller proceeds; pair with idempotent_append so a failed
    batch can be retried safely).
    """
    enriched = join_idr_rate(flatten_payload(payloads, now=now), fx_rates)
    out = enriched.select(*ENRICHED_COLUMNS)
    if sink is not None:
        observed, obs = expectation_gate(out)
        sink(observed)
        check_observation(obs)
        return out
    from .validate import validate_eager

    return validate_eager(out)
