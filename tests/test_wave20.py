"""Wave-20 units: BFS distance law + generic operator check, Wilson
ordering properties, seasonality accounting, diversity bounds,
streamed paths ≡ batch."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_bfs_hops_operator_on_known_graph(spark):
    """Hand graph: 1-2-3 chain + 4-5 edge + isolated 6; sources {1,4}."""
    from crypto_price_data_pipeline_spark.operators.graph import bfs_hops

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    sources = spark.createDataFrame([(1,), (4,)], "id long")
    got = {r["id"]: r["dist"] for r in bfs_hops(pairs, sources).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 0, 5: 1}


def test_bfs_hops_registry_query_consistent(spark):
    """Every distance ≥ 1 has a neighbor at distance − 1; survivors
    are at distance 0 of themselves."""
    from collections import defaultdict

    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.operators.dedup import minhash_then_exact
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_bfs_hops"](spark, SF).collect()
    assert rows
    docs = load_table(spark, SF, "documents")
    adj = defaultdict(set)
    for p in minhash_then_exact(docs, threshold=0.5).select("id_a", "id_b").collect():
        adj[p["id_a"]].add(p["id_b"])
        adj[p["id_b"]].add(p["id_a"])
    dist = {r["doc_id"]: r["dist"] for r in rows}
    for r in rows:
        if r["doc_id"] == r["survivor"]:
            assert r["dist"] == 0
        else:
            assert r["dist"] >= 1
            assert any(
                dist.get(nb) == r["dist"] - 1 for nb in adj[r["doc_id"]]
            )


def test_wilson_lb_below_p_hat_and_ordering(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_wilson_ranking"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_lb_r9"] <= r["p_hat_r9"] + 1e-9
        assert r["clicks"] <= r["n"]
    lbs = [r["wilson_lb_r9"] for r in rows]
    assert lbs == sorted(lbs, reverse=True)


def test_dow_seasonality_shape(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_dow_seasonality"](spark, SF).collect()
    assert 1 <= len(rows) <= 7
    assert all(1 <= r["isodow"] <= 7 for r in rows)
    # 30 days minus 3-day edges each side = 24 full-window days
    assert sum(r["n_days"] for r in rows) == 24


def test_diversity_index_bounds(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_diversity_index"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["gini_simpson_r9"] < 1.0
        assert 1.0 - 1e-9 <= r["effective_langs_r9"] <= r["n_langs"] + 1e-9


def test_stream_paths_equals_batch(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    streamed = [tuple(r) for r in QUERIES["q_stream_paths"](spark, SF).collect()]
    batch = [tuple(r) for r in QUERIES["q_top_paths"](spark, SF).collect()]
    assert streamed == batch
