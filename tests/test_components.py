"""Connected-components clustering tests."""

from __future__ import annotations


def test_connected_components_chain(spark):
    from crypto_price_data_pipeline_spark.operators.components import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
    # chain 0-1-2-3, pair 4-5, isolated 6 — transitivity matters:
    # (0,3) was never tested as a pair but must share a component
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    comp = {
        r["id"]: r["component"]
        for r in connected_components(nodes, pairs, id_col="id").collect()
    }
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6}


def test_dedup_keep_component_min_vs_greedy(spark):
    from crypto_price_data_pipeline_spark.operators.components import (
        dedup_keep_component_min,
    )

    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(5)], "doc_id long, text string"
    )
    # chain 1-2, 2-3: greedy keep-min-id would also drop 2,3 here, but a
    # chain 3-4 without (1,4) shows the transitive merge
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"] for r in dedup_keep_component_min(df, pairs, "doc_id").collect()
    )
    assert kept == [0, 1]  # the whole 1-2-3-4 chain collapses into 1
