"""Wave-18 units: skyline dominance law, k-anonymity recount, cosine
bounds + spot value, drift accounting, Zipf monotonicity, path shape."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_pareto_front_is_exact_skyline(spark):
    """No survivor is dominated; every non-survivor is dominated —
    checked exhaustively against the raw part table."""
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    front = [
        (r["p_partkey"], float(r["p_retailprice"]), r["p_size"])
        for r in QUERIES["q_pareto_front"](spark, SF).collect()
    ]
    allp = [
        (r["p_partkey"], float(r["p_retailprice"]), r["p_size"])
        for r in load_table(spark, SF, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(p, pool):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in pool
        )

    keys = {p[0] for p in front}
    assert front and all(not dominated(p, allp) for p in front)
    assert all(dominated(p, allp) for p in allp if p[0] not in keys)


def test_k_anonymity_counts_below_k(spark):
    from collections import Counter

    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_k_anonymity"](spark, SF).collect()
    assert rows and all(0 < r["n"] < 4 for r in rows)
    raw = Counter(
        (r["c_nationkey"], r["c_mktsegment"], math.floor(float(r["c_acctbal"]) / 1000))
        for r in load_table(spark, SF, "customer").collect()
    )
    expect = {k: v for k, v in raw.items() if v < 4}
    got = {(r["c_nationkey"], r["c_mktsegment"], r["bal_band"]): r["n"] for r in rows}
    assert got == expect


def test_tfidf_cosine_bounds_and_spot_value(spark):
    """Pairs are ordered id_a<id_b, cosines in (0, 1]; one pair's
    cosine recomputed from raw trigram TF-IDF in pure Python."""
    from collections import Counter

    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES
    import re

    rows = QUERIES["q_tfidf_cosine_pairs"](spark, SF).collect()
    assert rows
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert all(0.0 < r["cos_r9"] <= 1.0 + 1e-9 for r in rows)

    docs = {
        r["doc_id"]: re.split(r"[^a-z0-9]+", r["text"].lower())
        for r in load_table(spark, SF, "documents").collect()
    }
    n_docs = len(docs)
    vecs: dict[int, Counter] = {}
    for did, toks in docs.items():
        toks = [t for t in toks if t]
        vecs[did] = Counter(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
    df = Counter(t for v in vecs.values() for t in v)

    def wvec(did):
        return {
            t: tf * float(n_docs) / df[t]
            for t, tf in vecs[did].items()
            if df[t] <= 50
        }

    r = rows[0]
    wa, wb = wvec(r["id_a"]), wvec(r["id_b"])
    dot = sum(wa[t] * wb[t] for t in wa.keys() & wb.keys())
    na = math.sqrt(sum(x * x for x in wa.values()))
    nb = math.sqrt(sum(x * x for x in wb.values()))
    assert abs(dot / (na * nb) - r["cos_r9"]) < 1e-4


def test_embedding_drift_accounts_every_vector(spark):
    from crypto_price_data_pipeline_spark.io.sources import load_table
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_embedding_drift"](spark, SF).collect()
    total = load_table(spark, SF, "embeddings").count()
    assert [r["dim"] for r in rows] == list(range(64))
    for r in rows:
        assert r["n_a"] + r["n_b"] == total
        assert abs(r["drift"] - abs(r["mean_a"] - r["mean_b"])) < 1e-15


def test_zipf_check_monotone(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_zipf_check"](spark, SF).collect()
    assert [r["rank"] for r in rows] == list(range(1, 21))
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    for r in rows:
        assert r["rf"] == r["rank"] * r["freq"]
        assert r["ratio_r9"] >= 1.0


def test_top_paths_shape(spark):
    from crypto_price_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_top_paths"](spark, SF).collect()
    assert 0 < len(rows) <= 10
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(1 <= len(r["path"].split(">")) <= 5 for r in rows)
