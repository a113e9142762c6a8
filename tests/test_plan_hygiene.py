"""Registry-wide plan-hygiene gate: no registered query may plan a
CartesianProduct or row-at-a-time Python evaluation (BatchEvalPython).

This is the automated form of the per-operator `.explain` review: a
future edit that silently degrades a join to a cartesian product or
pushes a hot path out of codegen into row-Python fails here, not in a
100 TB run. Arrow-batched Python (ArrowEvalPython, FlatMapGroupsIn
Pandas, MapInPandas) is allowed — that's the sanctioned slow path."""

from __future__ import annotations

import re

import pytest

SF = "/root/testdata/sf0.001"

# ---- raw single-partition-window detector -------------------------
# A Window with no partitionBy plans `Exchange SinglePartition`: fine
# when its input is already compressed (an aggregate / limit / local
# table below the exchange bounds the rows funneled through the one
# task), a 100 TB-killer when a raw FileScan feeds it directly (the
# whole base table sorts on one executor). The detector walks the
# executedPlan tree text: flag iff some Window's subtree contains an
# Exchange SinglePartition whose input reaches a FileScan without
# crossing a bounding node. Round-9 sharpening (per the r8 review):
# an aggregate only BOUNDS the window when its grouping keys are a
# genuinely compressed domain — a HashAggregate keyed by a
# high-cardinality entity id (custkey, doc_id, user_id, ...) emits one
# row per ENTITY, which scales linearly with the data (hundreds of
# millions of customers at 100 TB), so it must NOT license a
# single-partition window above it (the pre-round-9 q_rfm_segments
# bug). Compressed-domain registry queries (q_ks_statistic,
# q_weighted_median, q_exact_median_2pass, day-level cumsums) pass
# structurally: their agg keys are value/day/bucket domains, not ids.

_MARK = re.compile(r"[+:]- ")
_AGG = re.compile(r"HashAggregate|SortAggregate|ObjectHashAggregate")
_BOUNDING = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|GlobalLimit|LocalLimit|"
    r"TakeOrderedAndProject|LocalTableScan|Scan ExistingRDD|BroadcastExchange|"
    r"ReusedExchange|WindowGroupLimit"
)
# entity-id grouping keys whose cardinality scales with the fact data:
# an aggregate keyed by any of these does not compress enough to bound
# a single-partition window. Round-10 (per the r9 watch item): the key
# list is DERIVED from the testdata schemas — every *_id / *key column
# of the tables — so a new entity-id column in a future testdata drop
# is covered without editing this file. Two hand-maintained pieces
# remain, both explicit: the compressed-domain allowlist (nation /
# region keys — fixed-size dimension domains, 25 and 5 values, which
# genuinely bound a window) and ids MINTED by operators rather than
# read from tables (chunk ids, sessionization ids).

_DIM_BOUNDED = re.compile(r"nationkey|regionkey")
_DERIVED_IDS = ("chunk_id", "session_id")


def _schema_id_keys(sf_dir: str = SF) -> set[str]:
    """Suffix-normalized id/key column names from the testdata parquet
    schemas (table prefixes like ``o_`` stripped so plan aliases that
    keep only the logical name still match)."""
    import glob
    import os

    import pyarrow.parquet as pq

    keys = set(_DERIVED_IDS)
    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        for name in pq.read_schema(path).names:
            low = re.sub(r"^[a-z]_", "", name.lower())
            if (low.endswith("_id") or low.endswith("key") or low == "id") and not _DIM_BOUNDED.search(low):
                keys.add(low)
    return keys


def _high_card_key_pattern(keys: set[str]) -> re.Pattern:
    return re.compile(r"keys=\[[^\]]*\b\w*(" + "|".join(sorted(keys)) + r")\w*#")


_HIGH_CARD_KEY = _high_card_key_pattern(_schema_id_keys())


def _depth(ln: str) -> int:
    m = _MARK.search(ln)
    return (m.start() // 3 + 1) if m else 0


def _bounds_window(ln: str) -> bool:
    """True when this plan node genuinely caps the row count flowing
    into a single-partition window above it."""
    if not _BOUNDING.search(ln):
        return False
    if _AGG.search(ln) and _HIGH_CARD_KEY.search(ln):
        return False  # per-entity agg: output ~ data size, not bounded
    return True


def raw_single_partition_window(plan: str) -> bool:
    lines = plan.splitlines()
    depths = [_depth(l) for l in lines]
    for i, ln in enumerate(lines):
        if "Window" not in ln or "WindowGroupLimit" in ln:
            continue
        di = depths[i]
        j = i + 1
        while j < len(lines) and depths[j] > di:
            if "Exchange SinglePartition" in lines[j]:
                dj = depths[j]
                k, bounds = j + 1, []
                while k < len(lines) and depths[k] > dj:
                    dk = depths[k]
                    while bounds and dk <= bounds[-1]:
                        bounds.pop()
                    if not bounds:
                        if _bounds_window(lines[k]):
                            bounds.append(dk)
                        elif "FileScan" in lines[k]:
                            return True
                    k += 1
            j += 1
    return False

# streaming wrappers execute real streams on call — covered by their
# own oracles/units; q_continuous_agg likewise.
_SKIP_EAGER_STREAMS = ("q_stream_", "q_continuous_agg", "q_compacted_rollup")

# q_udtf_chunks exists to exercise the Python UDTF + LATERAL surface;
# UDTFs evaluate via BatchEvalPython by construction, and the
# DataFrame fast path is asserted equal in its oracle.
_ALLOWED_ROW_PYTHON = {"q_udtf_chunks"}

_FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.slow  # registry-wide walk (~300 queries), see pytest.ini
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
        if raw_single_partition_window(plan):
            hits.append("raw-FileScan -> Exchange SinglePartition -> Window")
        if hits:
            offenders[name] = hits
    assert not offenders, f"plan hygiene violations: {offenders}"


def test_single_partition_window_detector_bites(spark):
    """The detector must flag the anti-pattern it exists for — the
    pre-round-8 q_equi_depth_histogram shape (ntile over the raw
    orders table with no partitionBy) — and must NOT flag the same
    window once an aggregate compresses the input below the exchange."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from crypto_price_data_pipeline_spark.io.sources import load_table

    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    bad = orders.withColumn("b", F.ntile(16).over(w))
    assert raw_single_partition_window(
        bad._jdf.queryExecution().executedPlan().toString()
    )
    compressed = (
        orders.groupBy("o_totalprice")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("o_totalprice"))
        )
    )
    assert not raw_single_partition_window(
        compressed._jdf.queryExecution().executedPlan().toString()
    )


def test_served_lsh_index_probe_prunes_partitions(spark, tmp_path):
    """The persisted-index serving path must turn bucket probes into
    directory-level pruning: the scan over a write_lsh_index table
    shows a non-empty PartitionFilters on _bucket, and the data filter
    set is empty (nothing row-level left to evaluate)."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.similarity import (
        hyperplane_lsh_buckets,
        lsh_cosine_topk,
        read_lsh_index,
        write_lsh_index,
    )

    emb = load_table(spark, SF, "embeddings")
    query = [float(x) for x in emb.first()["embedding"]]
    path = str(tmp_path / "lsh_index")
    write_lsh_index(hyperplane_lsh_buckets(emb, dim=len(query), bits=6), path)
    served = read_lsh_index(spark, path)
    probe = lsh_cosine_topk(served, query, k=10, bits=6, probe_radius=1)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines, f"no PartitionFilters in plan:\n{plan}"
    line = scan_lines[0]
    part = line.split("PartitionFilters:")[1].split("PushedFilters:")[0]
    assert "_bucket" in part and "[]" not in part.replace(" ", ""), line
    # radius-1 multiprobe over 6 bits probes 7 of 64 buckets
    n_parts = probe._jdf.queryExecution().executedPlan().toString().count("_bucket")
    assert n_parts >= 1


def test_served_ivf_index_probe_prunes_partitions(spark, tmp_path):
    """The persisted IVF index must prune at the _list directory level
    exactly like the LSH twin."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.similarity import (
        ivf_build,
        ivf_topk,
        read_ivf_index,
        write_ivf_index,
    )

    emb = load_table(spark, SF, "embeddings")
    query = [float(x) for x in emb.first()["embedding"]]
    path = str(tmp_path / "ivf_index")
    assigned, centroids = ivf_build(emb, n_lists=4)
    write_ivf_index(assigned, centroids, path)
    served, served_centroids = read_ivf_index(spark, path)
    assert served_centroids == centroids  # JSON round-trip is exact
    probe = ivf_topk(served, served_centroids, query, k=5, n_probe=2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines, f"no PartitionFilters in plan:\n{plan}"
    part = scan_lines[0].split("PartitionFilters:")[1].split("PushedFilters:")[0]
    assert "_list" in part and "[]" not in part.replace(" ", ""), scan_lines[0]


def test_served_pq_scan_reads_only_codes_columns(spark, tmp_path):
    """The served PQ ADC scan must touch only (vec_id, _codes) in the
    codes parquet — reading the 32x-compressed index, never a raw
    vector column — until the shortlist re-rank."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.similarity import (
        pq_build,
        read_pq_index,
        write_pq_index,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    query = [float(x) for x in emb.first()["embedding"]]
    path = str(tmp_path / "pq_index")
    codes, codebooks = pq_build(emb, m=8, codebook_k=16)
    write_pq_index(codes, codebooks, path)
    served_codes, served_books = read_pq_index(spark, path)
    assert served_books == codebooks  # JSON round-trip is exact
    # the ADC shortlist stage alone: scan served codes, score, top-200
    from crypto_price_data_pipeline_spark.operators.similarity import pq_topk

    ann = pq_topk(emb, served_codes, served_books, query, k=5, shortlist=50)
    plan = ann._jdf.queryExecution().executedPlan().toString()
    # identify the codes-table scan by its ReadSchema (the Location
    # path gets truncated in plan output under deep tmp dirs)
    code_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "_codes" in ln.split("ReadSchema:")[-1]
    ]
    assert code_scans, f"no codes-table scan found:\n{plan}"
    for ln in code_scans:
        schema = ln.split("ReadSchema:")[-1]
        assert "embedding" not in schema, ln


@pytest.mark.slow  # registry-wide walk (~300 queries), see pytest.ini
def test_registry_outputs_are_driver_canonicalizer_safe(spark):
    """No registered query may emit a top-level array/map/struct output
    column: the driver's correctness gate sorts the collected result by
    every column in pandas before hashing, and a list-valued cell raises
    `TypeError: unhashable type: 'list'` there even when the values are
    bit-exact (the round-8 q_dedup_provenance red row). List-shaped
    results must be serialized (array_join / concat_ws on the Spark
    side, array_to_string in the DuckDB oracle) before leaving the
    query. Streaming wrappers execute real streams on call and are
    covered by their batch twins' schemas — skipped here like the plan
    sweep above."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from crypto_price_data_pipeline_spark.queries import QUERIES

    offenders = {}
    for name, fn in QUERIES.items():
        if any(name.startswith(p) or name == p for p in _SKIP_EAGER_STREAMS):
            continue
        bad = [
            f.name
            for f in fn(spark, SF).schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-scalar output columns (driver cannot sort): {offenders}"


def test_detector_rejects_per_entity_agg_below_global_window(spark):
    """Round-9 sharpening must bite: the pre-round-9 q_rfm_segments
    shape — a per-customer aggregate feeding a no-partitionBy ntile —
    funnels one row PER CUSTOMER through one task (linear in the data
    at 100 TB) and must be flagged even though a HashAggregate sits
    below the exchange. A day-keyed aggregate (bounded domain) feeding
    the same window shape must still pass."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from crypto_price_data_pipeline_spark.io.sources import load_table

    orders = load_table(spark, SF, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("mon")
    )
    bad = per_cust.withColumn(
        "q", F.ntile(4).over(Window.orderBy("mon", "o_custkey"))
    )
    assert raw_single_partition_window(
        bad._jdf.queryExecution().executedPlan().toString()
    ), "per-entity agg must not bound a single-partition window"

    per_day = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev"))
    ok = per_day.withColumn(
        "cum",
        F.sum("rev").over(
            Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert not raw_single_partition_window(
        ok._jdf.queryExecution().executedPlan().toString()
    ), "day-domain agg is genuinely compressed and must pass"


def test_high_card_keys_derived_from_schema():
    """The derived key set must (a) cover everything the pre-round-10
    hardcoded regex covered, (b) exclude the bounded dimension domains,
    and (c) pick up a NEW entity-id column from a future schema without
    a code change (simulated via the pattern factory)."""
    keys = _schema_id_keys()
    for legacy in (
        "custkey", "orderkey", "partkey", "suppkey", "doc_id",
        "user_id", "vec_id", "chunk_id", "session_id", "event_id",
    ):
        assert legacy in keys, f"legacy high-card key {legacy} lost"
    assert "nationkey" not in keys and "regionkey" not in keys

    # a hypothetical future fact column outside today's hardcoded list
    pat = _high_card_key_pattern(keys | {"item_id"})
    assert pat.search("HashAggregate(keys=[item_id#42L], functions=[...])")
    assert not pat.search("HashAggregate(keys=[n_nationkey#7L], functions=[...])")


def test_detector_uses_derived_keys_not_literals():
    """Belt-and-braces for the derivation being live: a plan line keyed
    by a schema-derived id must be rejected as a bounding node, and a
    value-domain key accepted."""
    assert not _bounds_window(
        "+- HashAggregate(keys=[o_custkey#12L], functions=[sum(x)])"
    )
    assert _bounds_window(
        "+- HashAggregate(keys=[day#3, bucket#4], functions=[sum(x)])"
    )
