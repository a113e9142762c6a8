"""Registry-wide plan-hygiene gate: no registered query may plan a
CartesianProduct or row-at-a-time Python evaluation (BatchEvalPython).

This is the automated form of the per-operator `.explain` review: a
future edit that silently degrades a join to a cartesian product or
pushes a hot path out of codegen into row-Python fails here, not in a
100 TB run. Arrow-batched Python (ArrowEvalPython, FlatMapGroupsIn
Pandas, MapInPandas) is allowed — that's the sanctioned slow path."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# streaming wrappers execute real streams on call — covered by their
# own oracles/units; q_continuous_agg likewise.
_SKIP_EAGER_STREAMS = ("q_stream_", "q_continuous_agg")

# q_udtf_chunks exists to exercise the Python UDTF + LATERAL surface;
# UDTFs evaluate via BatchEvalPython by construction, and the
# DataFrame fast path is asserted equal in its oracle.
_ALLOWED_ROW_PYTHON = {"q_udtf_chunks"}

_FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def test_registry_plans_free_of_cartesian_and_row_python(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    offenders = {}
    for name, fn in QUERIES.items():
        if any(name.startswith(p) or name == p for p in _SKIP_EAGER_STREAMS):
            continue
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        hits = [
            t
            for t in _FORBIDDEN
            if t in plan and not (t == "BatchEvalPython" and name in _ALLOWED_ROW_PYTHON)
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, f"plan hygiene violations: {offenders}"
