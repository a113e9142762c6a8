"""Embedding similarity search ([EXT], SURVEY.md §2.11) over
``embeddings(vec_id, embedding array<float>, label)``.

- ``cosine_topk`` — exact brute force: the query vector is a literal
  array folded into one codegen'd expression per row (dot product via
  zip_with + aggregate in double precision), then
  ``orderBy(desc).limit(k)`` which Spark plans as TakeOrderedAndProject
  (per-partition heap + driver merge — no global sort shuffle). This is
  the correctness baseline and is already the right plan for one-off
  queries at scale: a single scan, no shuffle.

- ``hyperplane_lsh_buckets`` / ``lsh_cosine_topk`` — the scale path for
  repeated queries: sign-random-projection LSH. B deterministic
  hyperplanes → B-bit bucket id; build once (partitioned by bucket),
  probe only the query's bucket (+ multi-probe neighbors at Hamming
  distance 1). Recall is tunable via B and probes; candidates are
  re-ranked exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import materialize as _eager_materialize


def _lit_vec(vec: list[float]) -> Column:
    """Literal double array in ONE py4j call. Element-wise
    F.lit().cast() was ~2 driver round-trips per component — a 64-dim
    query vector cost ~130 round-trips, and the LSH builders embed one
    literal vector PER HYPERPLANE (measured: 2.5s of pure DataFrame
    construction in the batched-LSH query). repr() emits the shortest
    string that round-trips to the same IEEE double and Spark's
    string→double cast is correctly rounded, so values are bit-exact
    vs the element-wise form (pinned by the ANN oracles)."""
    vals = ", ".join(f"cast('{float(x)!r}' as double)" for x in vec)
    return F.expr(f"array({vals})")


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ in double, folded left-to-right (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_similarity(emb_col: Column | str, query: list[float]) -> Column:
    c = F.col(emb_col) if isinstance(emb_col, str) else emb_col
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    dot = _dot(c, _lit_vec(query))
    norm = F.sqrt(_dot(c, c))
    return dot / (norm * F.lit(qnorm))


def cosine_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine; deterministic tiebreak on id."""
    return (
        embeddings.select(
            F.col(id_col), cosine_similarity(emb_col, query).alias("cosine_sim")
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (Box-Muller over a
    64-bit LCG — no numpy dependency in the executor closure)."""
    state = seed or 1
    planes = []

    def nxt() -> float:
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return ((state >> 11) + 1) / float(1 << 53)  # uniform (0,1]

    for _ in range(bits):
        plane = []
        while len(plane) < dim:
            u1, u2 = nxt(), nxt()
            r = math.sqrt(-2.0 * math.log(u1))
            plane.append(r * math.cos(2 * math.pi * u2))
            if len(plane) < dim:
                plane.append(r * math.sin(2 * math.pi * u2))
        planes.append(plane)
    return planes


def bucket_id_col(emb_col: Column | str, planes: list[list[float]]) -> Column:
    c = F.col(emb_col) if isinstance(emb_col, str) else emb_col
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.shiftleft(F.lit(1).cast("long"), i)
        bucket = bucket.bitwiseOR(
            F.when(_dot(c, _lit_vec(p)) >= 0, bit).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    emb_col: str = "embedding",
) -> DataFrame:
    """Add a ``_bucket`` column. Persist this (partitioned/bucketed by
    ``_bucket``) once; probes then scan ~n/2^bits rows."""
    planes = _hyperplanes(dim, bits, seed)
    return embeddings.withColumn("_bucket", bucket_id_col(emb_col, planes))


def _probe_masks(bits: int, probe_radius: int) -> list[int]:
    """XOR masks for every bucket within Hamming distance
    ``probe_radius`` of a query bucket (mask 0 = the bucket itself)."""
    from itertools import combinations

    masks = [0]
    for r in range(1, probe_radius + 1):
        for flip in combinations(range(bits), r):
            m = 0
            for i in flip:
                m |= 1 << i
            masks.append(m)
    return masks


def write_lsh_index(bucketed: DataFrame, path: str) -> None:
    """Persist the LSH index PARTITIONED BY ``_bucket`` — the serving
    layout the docstrings promise: a probe then reads only its probe
    buckets' directories (PartitionFilters in the scan, verified by
    tests/test_plan_hygiene.py), so query cost is proportional to the
    probed fraction of the corpus, not the corpus. One write per corpus
    version; 2^bits directories, each holding ~n/2^bits rows — size
    ``bits`` so per-bucket files stay in the 100 MB–1 GB range at the
    target corpus (bits=10 over 10^9 vectors ≈ 10^6 rows/bucket)."""
    bucketed.write.partitionBy("_bucket").mode("overwrite").parquet(path)


def read_lsh_index(spark: SparkSession, path: str) -> DataFrame:
    """Read the served index back. ``_bucket`` comes back as a
    partition column (directory-derived), so ``isin`` probes become
    partition pruning instead of data filters."""
    return spark.read.parquet(path)


def write_ivf_index(
    assigned: DataFrame, centroids: list[list[float]], path: str
) -> None:
    """Persist an IVF index: the assigned table PARTITIONED BY
    ``_list`` (a probe reads only its n_probe nearest lists'
    directories — same pruning story as write_lsh_index) plus the
    centroids as a JSON sidecar. The sidecar is driver-side local I/O:
    n_lists × dim floats — kilobytes — which on a cluster would live on
    the same shared filesystem as the parquet."""
    import json
    import os

    assigned.write.partitionBy("_list").mode("overwrite").parquet(
        os.path.join(path, "lists")
    )
    with open(os.path.join(path, "centroids.json"), "w") as fh:
        json.dump(centroids, fh)


def read_ivf_index(spark: SparkSession, path: str) -> tuple[DataFrame, list[list[float]]]:
    import json
    import os

    assigned = spark.read.parquet(os.path.join(path, "lists"))
    with open(os.path.join(path, "centroids.json")) as fh:
        centroids = json.load(fh)
    return assigned, centroids


def write_pq_index(
    codes: DataFrame, codebooks: list[list[list[float]]], path: str
) -> None:
    """Persist a PQ index: the 32×-compressed codes table (the thing
    the ADC scan reads — at 100 TB of raw vectors this is ~3 TB and is
    the only full-scan surface a query touches) plus the codebooks
    (m × k × d/m floats, kilobytes) as a JSON sidecar. The codes table
    has no probe key — ADC scans it whole by design — so it is written
    flat; what matters is that the scan's ReadSchema carries only
    (id, _codes), which the serving query's plan test asserts."""
    import json
    import os

    codes.write.mode("overwrite").parquet(os.path.join(path, "codes"))
    with open(os.path.join(path, "codebooks.json"), "w") as fh:
        json.dump(codebooks, fh)


def read_pq_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[list[list[float]]]]:
    import json
    import os

    codes = spark.read.parquet(os.path.join(path, "codes"))
    with open(os.path.join(path, "codebooks.json")) as fh:
        codebooks = json.load(fh)
    return codes, codebooks


def ivf_build(
    embeddings: DataFrame,
    n_lists: int = 16,
    seed: int = 42,
    emb_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF (inverted-file) index: k-means coarse quantizer over the
    corpus; every vector is assigned to its nearest centroid's list.

    Returns (assigned_df with ``_list`` column, centroids). Persist the
    assigned table partitioned by ``_list``; a probe then scans only
    n_probe/n_lists of the corpus. The complementary scale path to the
    hyperplane LSH (data-adaptive partitions vs oblivious hashes)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = embeddings.withColumn(
        "_features", array_to_vector(F.col(emb_col).cast("array<double>"))
    )

    def _fit(k: int):
        return KMeans(
            k=k, seed=seed, featuresCol="_features", predictionCol="_list"
        ).fit(vecs)

    # Spark KMeans needs k >= 2 and k <= |distinct points| (10 copies
    # of one vector fit no 2-means). The common path pays NO guard —
    # an always-on distinct().count() was a full extra corpus pass at
    # the target scale. Only the failure path (degenerate corpora by
    # construction: empty, single-vector, duplicate-heavy) computes
    # the exact distinct count, then clamps k or skips the fit — the
    # one distinct vector IS the centroid.
    try:
        model = _fit(max(2, n_lists))
    except Exception:
        n_distinct = (
            vecs.select(F.col(emb_col).cast("array<double>").alias("_e"))
            .distinct()
            .count()
        )
        # r10 ADVICE: only the k-vs-distinct degeneracy is handled
        # here. If the distinct count shows k WAS valid, the failure
        # was something else (executor loss, OOM, a real bug) —
        # re-raise it instead of retrying a blind refit. No message
        # sniffing: the version-stable signal is the count itself.
        if n_distinct >= max(2, n_lists):
            raise
        if n_distinct < 2:
            assigned = embeddings.withColumn("_list", F.lit(0).cast("int"))
            row = embeddings.select(
                F.col(emb_col).cast("array<double>").alias("_e")
            ).first()
            centroids = [[float(x) for x in row["_e"]]] if row else []
            return assigned, centroids
        model = _fit(max(2, min(n_lists, n_distinct)))
    assigned = model.transform(vecs).drop("_features")
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: rank centroids by cosine to the query (driver-side,
    n_lists is tiny), scan only the ``n_probe`` nearest lists, exact
    re-rank inside them."""

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return dot / (na * nb)

    ranked = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], query))
    probes = ranked[:n_probe]
    return (
        assigned.where(F.col("_list").isin(probes))
        .select(F.col(id_col), cosine_similarity(emb_col, query).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_cosine_topk(
    bucketed: DataFrame,
    query: list[float],
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: restrict to the query's bucket (+ every bucket within
    Hamming distance ``probe_radius`` when ``multiprobe``), then exact
    re-rank. Bucket pruning happens in the scan filter (partition
    pruning when the table is written partitioned by ``_bucket``).

    Recall/cost dial: Σ_{r≤radius} C(bits, r) probed buckets of 2^bits.
    bits=6 radius=1 probes 7/64 (~11% of a uniform corpus), radius=2
    probes 22/64 (~34%). Raise the radius (or lower bits) when the
    corpus is ANN-hostile — e.g. near-isotropic random embeddings,
    where sign projections separate poorly."""
    planes = _hyperplanes(len(query), bits, seed)
    qb = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) >= 0:
            qb |= 1 << i
    masks = _probe_masks(bits, probe_radius) if multiprobe else [0]
    probes = [qb ^ m for m in masks]
    return (
        bucketed.where(F.col("_bucket").isin(probes))
        .select(F.col(id_col), cosine_similarity(emb_col, query).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def quantize_int8(emb_col: Column | str, out_scale: str = "scale") -> list[Column]:
    """Symmetric per-vector int8 quantization: codes = trunc(x·127/max|x|).

    The storage transform for billion-vector corpora — 4× smaller than
    float32, dot products stay rank-correct to ~1% for unit-norm
    embeddings. Pure higher-order functions (one array_max + one
    transform per row, no shuffle, no Python). Returns [codes, scale]
    columns; dequantize as code·scale/127. Zero vectors quantize to
    all-zero codes with scale 0. Codes are ``array<tinyint>`` — the
    [-127, 127] range is guaranteed by construction, so the 4× saving
    is realized at rest, not just notionally.
    """
    c = F.col(emb_col) if isinstance(emb_col, str) else emb_col
    absmax = F.array_max(F.transform(c, lambda x: F.abs(x))).cast("double")
    codes = F.when(
        absmax > 0,
        F.transform(
            c,
            lambda x: (x.cast("double") * 127.0 / absmax).cast("int").cast("tinyint"),
        ),
    ).otherwise(F.transform(c, lambda x: F.lit(0).cast("tinyint")))
    return [codes.alias("codes"), absmax.alias(out_scale)]


def pq_build(
    embeddings: DataFrame,
    m: int = 8,
    codebook_k: int = 16,
    seed: int = 42,
    max_iter: int = 8,
    train_fraction: float | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Product quantization (Jégou et al., the workhorse of
    billion-scale ANN): split each d-dim vector into ``m`` subvectors,
    k-means each subspace to ``codebook_k`` centroids, and encode every
    vector as m small codes. At the defaults a 64-dim float vector
    (256 B) becomes 8 tinyint codes — 32× compression, which is what
    lets a 100 TB embedding corpus's index live in cluster memory while
    the raw vectors stay on disk for the re-rank.

    Returns (codes_df(id, _codes array<tinyint>), codebooks[m][k][d/m]).
    Training runs m small KMeans fits at ``max_iter`` Lloyd iterations
    (codebook quality saturates fast; 20→8 iters measured no recall
    change and ~2× faster training; sample the corpus at scale — the
    codebooks need thousands of vectors per centroid, not the corpus);
    encoding is ONE zero-shuffle projection: per subspace, squared-L2
    to each centroid via zip_with/aggregate HOFs over a literal
    codebook array, argmin via array_position(array_min). Persist the
    codes table once per corpus version.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = embeddings.select(
        id_col, F.col(emb_col).cast("array<double>").alias("_e")
    ).persist()
    first = base.first()
    if first is None:
        base.unpersist()
        raise ValueError("pq_build: embeddings table is empty — nothing to train on")
    # codebooks need ~thousands of vectors per centroid, not the corpus:
    # at 100 TB train on a seeded sample and encode everything
    train = base.sample(train_fraction, seed=seed) if train_fraction else base
    n_total = train.count()
    # ORDER MATTERS (r9 advice): resolve the undersized-sample fallback
    # BEFORE clamping codebook_k, else the clamp swallows the check —
    # a 2..k-1-row sample would silently train k=|sample| centroids,
    # and a 0/1-row sample from a big corpus would hit the degenerate
    # single-centroid branch even after train was reset to the corpus.
    if train_fraction and n_total < codebook_k:
        import warnings

        warnings.warn(
            f"pq_build: train_fraction={train_fraction} sampled "
            f"{n_total} rows < codebook_k={codebook_k}; training on "
            "the full corpus instead",
            stacklevel=2,
        )
        train = base
        n_total = base.count()
    # Spark KMeans needs k >= 2 AND k <= n: clamp to the FINAL train
    # set; the < 2 row degenerate corpus skips the fits below (the
    # single row's subvectors ARE the codebooks)
    codebook_k = max(2, min(codebook_k, n_total))
    dim = len(first["_e"])
    if dim % m:
        raise ValueError(f"pq_build: dim {dim} not divisible by m={m}")
    sub = dim // m
    codebooks: list[list[list[float]]] = []
    if n_total < 2:
        e = [float(x) for x in first["_e"]]
        codebooks = [[e[j * sub : (j + 1) * sub]] for j in range(m)]

    def _train_subspace(j: int) -> list[list[float]]:
        vecs = train.withColumn("_f", array_to_vector(F.slice("_e", j * sub + 1, sub)))

        def _fit(k: int):
            return KMeans(
                k=k,
                seed=seed + j,
                maxIter=max_iter,
                featuresCol="_f",
                predictionCol="_c",
            ).fit(vecs)

        try:
            model = _fit(codebook_k)
        except Exception:
            # duplicate-collapsed SUBSPACE (k distinct full vectors can
            # still share one subvector): same failure-path-only guard
            # as ivf_build — clamp by this subspace's distinct count,
            # or take the single distinct subvector as the codebook.
            # If the count shows codebook_k was valid, the failure was
            # unrelated (transient/executor) — re-raise (r10 ADVICE).
            nd = (
                train.select(F.slice("_e", j * sub + 1, sub).alias("_s"))
                .distinct()
                .count()
            )
            if nd >= codebook_k:
                raise
            if nd < 2:
                row = train.select(
                    F.slice("_e", j * sub + 1, sub).alias("_s")
                ).first()
                return [[float(x) for x in row["_s"]]]
            model = _fit(max(2, min(codebook_k, nd)))
        return [[float(x) for x in c] for c in model.clusterCenters()]

    if n_total >= 2:
        # the m fits are independent small jobs dominated by per-fit
        # scheduling, not compute — submit them concurrently (Spark's
        # scheduler interleaves driver-thread jobs; fits and results
        # are unchanged, only the wall time: 8 serial fits measured
        # ~8 s, concurrent ~2 s). Ordered by j on collection.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(m, 8)) as pool:
            codebooks = list(pool.map(_train_subspace, range(m)))

    def _code(j: int) -> Column:
        # one expr per codebook (k×d/m element-wise lits were ~256
        # py4j round-trips per subspace; see _lit_vec)
        cj = F.expr(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"cast('{float(x)!r}' as double)" for x in cent) + ")"
                for cent in codebooks[j]
            )
            + ")"
        )
        s = F.slice("_e", j * sub + 1, sub)
        d2 = F.transform(
            cj,
            lambda c: F.aggregate(
                F.zip_with(c, s, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return (F.array_position(d2, F.array_min(d2)) - 1).cast("tinyint")

    codes = base.select(
        id_col, F.array(*[_code(j) for j in range(m)]).alias("_codes")
    )
    try:
        return codes.transform(_eager_materialize), codebooks
    finally:
        base.unpersist()


def pq_topk(
    embeddings: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    shortlist: int = 200,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """ANN top-k by asymmetric distance computation (ADC) + exact
    re-rank: the query builds one inner-product lookup table per
    subspace on the driver (m × codebook_k floats), each code row
    scores as m table lookups (element_at — pure codegen, scans only
    the 32×-compressed codes table), the ``shortlist`` best candidates
    broadcast-join back to the raw vectors for an exact cosine re-rank.
    No shuffle until the final TakeOrderedAndProject; the raw-vector
    scan touches only shortlist rows (at 100 TB: the codes scan is the
    cost, shortlist I/O is noise)."""
    from functools import reduce
    from operator import add

    m = len(codebooks)
    sub = len(codebooks[0][0])
    luts = []
    for j in range(m):
        qs = query[j * sub : (j + 1) * sub]
        luts.append([sum(a * b for a, b in zip(qs, cent)) for cent in codebooks[j]])
    # one expr per subspace LUT (element-wise lits were k round-trips
    # each; see _lit_vec)
    adc = reduce(
        add,
        [
            F.element_at(
                F.expr(
                    "array("
                    + ", ".join(f"cast('{float(v)!r}' as double)" for v in luts[j])
                    + ")"
                ),
                F.get("_codes", j).cast("int") + 1,
            )
            for j in range(m)
        ],
    )
    short = (
        codes.select(id_col, adc.alias("_adc"))
        .orderBy(F.col("_adc").desc(), F.col(id_col).asc())
        .limit(shortlist)
    )
    return (
        embeddings.join(F.broadcast(short.select(id_col)), id_col)
        .select(id_col, cosine_similarity(emb_col, query).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_topk_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    q_id_col: str = "q_id",
    q_emb_col: str = "q_emb",
) -> DataFrame:
    """Exact cosine top-k for a BATCH of query vectors in one pass —
    the retrieval-serving shape (Q queries amortize one corpus scan)
    rather than Q separate jobs.

    Plan: broadcast the (small) query table, nested-loop each corpus
    row against all Q queries (Q·|corpus| score rows — but only
    (q_id, id, sim) triples, the vectors are dropped BEFORE the
    window shuffle), then row_number ≤ k per query. At 100 TB the scan
    is the cost and it happens once for the whole batch; the shuffle
    carries 24-byte triples. For large Q route per-query candidate
    pruning through the LSH/IVF/PQ indexes instead — this is the exact
    baseline they gate against."""
    e = F.col(emb_col).cast("array<double>")
    q = F.col(q_emb_col).cast("array<double>")
    sim = _dot(e, q) / (F.sqrt(_dot(e, e)) * F.sqrt(_dot(q, q)))
    scored = (
        embeddings.crossJoin(F.broadcast(queries))
        .select(q_id_col, id_col, sim.alias("cosine_sim"))
    )
    w = (
        Window.partitionBy(q_id_col)
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def lsh_topk_batch(
    bucketed: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    q_id_col: str = "q_id",
    q_emb_col: str = "q_emb",
) -> DataFrame:
    """Batched ANN through the LSH index — the scale path
    ``cosine_topk_batch``'s docstring gates against: instead of scoring
    all Q·N pairs, each corpus row scores only against the queries
    whose probe set contains its bucket.

    Plan: the (small) query table computes its own bucket ids in-plan
    (same deterministic hyperplanes as the index build — no collect),
    explodes the Σ C(bits,r) literal XOR masks into a
    (q_id, q_emb, _bucket) probe table, and broadcast-joins the corpus
    on ``_bucket``. One corpus pass, scoring only the probed fraction
    (~coverage · Q · N pairs instead of Q · N); vectors are dropped
    before the per-query window top-k shuffle, which carries 24-byte
    triples. Against a ``write_lsh_index`` table the bucket equi-join
    also enables dynamic partition pruning. Candidates within a probed
    bucket re-rank EXACTLY, so per-query results match single-query
    ``lsh_cosine_topk`` at the same bits/radius.

    Crossover, measured honestly: at sf0.1 (n=2000, Q=32) the exact
    nested loop is FASTER (1.8s vs 2.1-2.7s) — 64k scored pairs are
    cheaper than the probe table's hash-join overhead. The index path
    wins when per-pair scoring dominates, i.e. N·Q·dim large: at
    N=10⁹, Q=10⁴ the exact path scores 10¹³ pairs while radius-1
    probing scores ~11% of that with one extra broadcast join — use
    the exact baseline below ~10⁷ scored pairs, the index above."""
    planes = _hyperplanes(dim, bits, seed)
    masks = _probe_masks(bits, probe_radius)
    probes = (
        queries.withColumn("_qb", bucket_id_col(q_emb_col, planes))
        .select(
            q_id_col,
            q_emb_col,
            F.explode(
                F.expr(
                    "array(" + ", ".join(f"{m}L" for m in masks) + ")"
                )
            ).alias("_m"),
            "_qb",
        )
        .select(
            q_id_col,
            q_emb_col,
            F.col("_qb").bitwiseXOR(F.col("_m")).alias("_bucket"),
        )
    )
    e = F.col(emb_col).cast("array<double>")
    q = F.col(q_emb_col).cast("array<double>")
    sim = _dot(e, q) / (F.sqrt(_dot(e, e)) * F.sqrt(_dot(q, q)))
    scored = (
        bucketed.withColumn("_bucket", F.col("_bucket").cast("long"))
        .join(F.broadcast(probes), "_bucket")
        .select(q_id_col, id_col, sim.alias("cosine_sim"))
    )
    w = (
        Window.partitionBy(q_id_col)
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def knn_join(
    embeddings: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Exact k-nearest-neighbor SELF-join: for every item, its top-k
    most-cosine-similar other items — (id, nbr_id, cosine_sim_r9, rnk).
    The primitive behind dataset cartography, kNN relabeling, and
    duplicate-neighborhood audits; ``cosine_topk_batch`` answers Q
    external queries, this answers all N internal ones.

    Plan: norms precomputed in the scan projection, corpus broadcast
    once, BroadcastNestedLoopJoin scores N·(N-1) pairs in codegen, one
    row_number window per item (single shuffle on the id). Ties break
    on neighbor id for determinism.

    GATED quadratic baseline (refuses > ``max_rows``, same contract as
    the dedup pair baselines): at corpus scale route through the
    persisted index instead — ``lsh_topk_batch`` with the corpus itself
    as the query batch probes only each item's LSH buckets, making work
    candidate-proportional; re-rank survivors with this exact rule."""
    from .dedup import _gate_corpus_size

    _gate_corpus_size(embeddings, max_rows, "knn_join", "lsh_topk_batch over the persisted index")
    # norm_vectors materializes (id, vec, norm) before pairing (see its
    # docstring); the gated corpus keeps the checkpoint small.
    e = norm_vectors(embeddings, id_col, emb_col)
    a = e.select(F.col(id_col), F.col("_e").alias("_ea"), F.col("_n").alias("_na"))
    b = e.select(
        F.col(id_col).alias("nbr_id"), F.col("_e").alias("_eb"), F.col("_n").alias("_nb")
    )
    sim = _dot(F.col("_ea"), F.col("_eb")) / (F.col("_na") * F.col("_nb"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .where(F.col(id_col) != F.col("nbr_id"))
        .select(id_col, "nbr_id", sim.alias("_c"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_c").desc(), F.col("nbr_id").asc())
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(id_col, "nbr_id", F.round("_c", 9).alias("cosine_sim_r9"), "rnk")
        .orderBy(id_col, "rnk")
    )


def norm_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    emb_col: str = "embedding",
    materialize: bool = True,
) -> DataFrame:
    """(id, _e array<double>, _n) — the staged form every exact pair
    scorer consumes. With ``materialize`` (default) the table is
    repartitioned to full parallelism and localCheckpointed: a computed
    embedding/norm projection must NOT collapse into a pair join
    (Catalyst would re-evaluate it once per PAIR — measured 87s vs
    1.4s at sf0.1), and a single-file scan must not serialize the
    quadratic scoring onto one task. Pass ``materialize=False`` inside
    streams that checkpoint (or store) the result themselves."""
    out = df.select(
        F.col(id_col), F.col(emb_col).cast("array<double>").alias("_e")
    ).withColumn("_n", F.sqrt(_dot(F.col("_e"), F.col("_e"))))
    if materialize:
        spark = df.sparkSession
        out = out.repartition(spark.sparkContext.defaultParallelism).transform(
            _eager_materialize
        )
    return out


def cosine_pairs(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact near-identical pairs (id_a, id_b), id_a < id_b, with
    ``round(cosine, 9) >= threshold`` — THE shared pair rule of the
    semantic-dedup family (batch query, streaming processor, and their
    test reference all call this, so the rule cannot silently diverge).
    ``left``/``right`` are :func:`norm_vectors` outputs; ``right`` is
    broadcast (keep it batch/corpus sized accordingly). Quadratic by
    construction — callers gate corpus size or feed LSH candidates."""
    a = left.select(
        F.col(id_col).alias("id_a"), F.col("_e").alias("_ea"), F.col("_n").alias("_na")
    )
    b = right.select(
        F.col(id_col).alias("id_b"), F.col("_e").alias("_eb"), F.col("_n").alias("_nb")
    )
    sim = _dot(F.col("_ea"), F.col("_eb")) / (F.col("_na") * F.col("_nb"))
    return (
        a.crossJoin(F.broadcast(b))
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(sim, 9) >= threshold)
        .select("id_a", "id_b")
    )


def mmr_rerank(
    embeddings: DataFrame,
    query: list[float],
    *,
    k: int = 5,
    shortlist: int = 12,
    lam: float = 0.7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k: greedily pick the
    item maximizing ``lam * rel - (1-lam) * max_sim_to_selected``.

    The retrieval-diversity re-ranker (Carbonell & Goldstein '98) every
    RAG serving layer runs after ANN: relevance alone returns k
    near-duplicates; MMR trades relevance against redundancy.

    Scale shape: the DISTRIBUTED work is the exact ``shortlist``-sized
    relevance scan (TakeOrderedAndProject over the corpus — or swap in
    ``lsh_topk_batch`` for the probed index at scale); the greedy loop
    then runs over only ``shortlist`` rows as ``k-1`` statically
    unrolled argmax stages, every join broadcast, nothing collected.
    Greedy selection is inherently sequential in k — unrolling it into
    the plan keeps the whole thing one Catalyst job instead of k
    driver round-trips.

    Determinism: relevance and pairwise sims use the same left-fold
    dot product as :func:`cosine_topk` (bit-stable vs the DuckDB
    idiom); argmax ties break on ascending id.
    """
    short = (
        cosine_topk(embeddings, query, k=shortlist, id_col=id_col, emb_col=emb_col)
        .withColumnRenamed("cosine_sim", "rel")
        .join(embeddings.select(id_col, emb_col), id_col)
        .transform(_eager_materialize)  # tiny; stops Catalyst re-deriving
        # the corpus top-k scan once per unrolled greedy stage
    )
    a = short.select(F.col(id_col).alias("_a"), F.col(emb_col).alias("_va"))
    b = short.select(F.col(id_col).alias("_b"), F.col(emb_col).alias("_vb"))
    sim = _dot(F.col("_va").cast("array<double>"), F.col("_vb").cast("array<double>")) / (
        F.sqrt(_dot(F.col("_va").cast("array<double>"), F.col("_va").cast("array<double>")))
        * F.sqrt(_dot(F.col("_vb").cast("array<double>"), F.col("_vb").cast("array<double>")))
    )
    sims = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("_a") != F.col("_b"))
        .select("_a", "_b", sim.alias("_sim"))
        .transform(_eager_materialize)
    )

    picked = (
        short.orderBy(F.col("rel").desc(), F.col(id_col))
        .limit(1)
        .select(id_col, "rel", F.lit(1).alias("rank"), F.col("rel").alias("mmr_score"))
    )
    for step in range(2, k + 1):
        sel_ids = picked.select(F.col(id_col).alias("_b"))
        cand = (
            short.join(picked.select(id_col), id_col, "left_anti")
            .join(sims.join(F.broadcast(sel_ids), "_b"), F.col(id_col) == F.col("_a"))
            .groupBy(id_col, "rel")
            .agg(F.max("_sim").alias("_msim"))
            .select(
                id_col,
                "rel",
                (F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("_msim")).alias(
                    "mmr_score"
                ),
            )
        )
        nxt = (
            cand.orderBy(F.col("mmr_score").desc(), F.col(id_col))
            .limit(1)
            .select(id_col, "rel", F.lit(step).alias("rank"), "mmr_score")
        )
        # per-step truncation only (see session.materialize)
        picked = picked.unionByName(nxt).transform(
            lambda d: _eager_materialize(d, reliable=False)
        )
    return picked.select("rank", id_col, F.round("mmr_score", 9).alias("mmr_score_r9")).orderBy(
        "rank"
    )
