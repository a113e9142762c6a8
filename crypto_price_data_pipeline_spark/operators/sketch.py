"""Count-Min sketch as a dataflow ([EXT] §2.11 'novel sketch').

A CMS is (depth × width) counters; each value increments one counter
per depth row (bucket = hash_d(value) mod width) and a point estimate
is the MIN of its depth counters — an overestimate with error ≤ εN at
probability 1-δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.

Expressed Spark-first: the sketch IS a DataFrame of (d, bucket, cnt)
rows built with one explode + one aggregation — mergeable across
partitions/streams by summing counters (the partial-agg property the
100 TB path needs; two corpus sketches union+sum into one). Hashes are
md5-derived (not xxhash64) so estimates are verifiable from any engine
with md5 — the DuckDB oracle rebuilds the identical sketch.

Here CMS complements the built-in sketches (approx_count_distinct =
HLL, percentile_approx = KLL): those answer distinct/quantile, CMS
answers per-key frequency in sublinear space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_bucket(value: Column, d: Column | int, width: int) -> Column:
    """hash_d(value) mod width, via the first 8 hex chars of
    md5('s' || d || value) — cross-engine reproducible."""
    h = F.md5(F.concat(F.lit("s"), F.lit(d) if isinstance(d, int) else d, value))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width))


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) counter rows.

    Pre-aggregates exact per-value counts first (map-side combinable;
    the explode then fans out |distinct values| × depth rows, not
    |rows| × depth), then sums counts into buckets."""
    counts = df.groupBy(F.col(col).cast("string").alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    fanned = counts.select(
        "_v",
        "_c",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select(
        "d",
        _md5_bucket(F.col("_v"), F.col("d").cast("string"), width).alias("bucket"),
        "_c",
    )
    return fanned.groupBy("d", "bucket").agg(F.sum("_c").alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): counters
    add. This is what makes CMS work across streams and partitions."""
    return a.unionByName(b).groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, queries: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-frequency estimates for each value in ``queries[col]``:
    min over the value's depth counters (missing counter → 0)."""
    fanned = queries.select(
        F.col(col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select(
        col,
        "d",
        _md5_bucket(F.col(col).cast("string"), F.col("d").cast("string"), width).alias("bucket"),
    )
    return (
        fanned.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("estimate"))
    )


# ------------------------------------------------------------- KMV

# hash domain: 60 bits (15 md5 hex nibbles) — keeps every hash exactly
# representable as a POSITIVE bigint on both engines (16 nibbles could
# set the sign bit) and the estimator's double casts deterministic
KMV_M = 1 << 60
KMV_HASH_BITS = 60


def _kmv_meta(k: int, kind: str = "kmv") -> dict:
    return {"sketch": kind, "k": int(k), "hash_bits": KMV_HASH_BITS}


def kmv_stamp(df: DataFrame, col: str = "kmv") -> dict | None:
    """The sketch's build-parameter stamp (k + hash domain), carried
    as column metadata on the ``kmv`` array — it survives select /
    join propagation AND a parquet round-trip (Spark stores column
    metadata in the footer and restores it on schema-inferred reads),
    so a stored sketch table remembers what it was built with, the
    same contract as the minhash banding stats (artifacts.PARAMS).
    Returns None for unstamped (caller-built, trusted) tables."""
    for f in df.schema.fields:
        if f.name == col and str(f.metadata.get("sketch", "")).startswith("kmv"):
            return dict(f.metadata)
    return None


def _check_kmv_stamp(stamp: dict | None, k: int, what: str) -> None:
    if stamp is None:
        return
    if int(stamp["k"]) != int(k) or int(stamp.get("hash_bits", -1)) != KMV_HASH_BITS:
        raise ValueError(
            f"KMV stamp mismatch in {what}: input built with "
            f"k={stamp['k']}, hash_bits={stamp.get('hash_bits')}; caller "
            f"expects k={k}, hash_bits={KMV_HASH_BITS}. Merging sketches "
            "across k is not mergeable-to-spec (the k-th minimum of a "
            "k'-sketch union is biased) — rebuild one side."
        )


def kmv_explode(
    sketch: DataFrame, group_cols: list[str], k: int | None = None
) -> DataFrame:
    """Explode a sketch table to (group_cols…, _h) merge rows, the
    validated entrance to :func:`kmv_from_hashes`: when the table
    carries a stamp it must agree with the caller's ``k`` (hard-fail,
    never a silently biased merge), and the stamp is re-attached to
    ``_h`` so the re-rank validates again downstream."""
    stamp = kmv_stamp(sketch)
    if k is not None:
        _check_kmv_stamp(stamp, k, "kmv_explode")
    eff_k = int(stamp["k"]) if stamp is not None else k
    out = sketch.select(*group_cols, F.explode("kmv").alias("_h"))
    if eff_k is not None:
        out = out.withMetadata("_h", _kmv_meta(eff_k))
    return out


def kmv_hash(key: Column) -> Column:
    """60-bit uniform hash of a key: the first 15 hex nibbles of
    md5(cast(key as string)) — cross-engine reproducible (the DuckDB
    oracle folds the same nibbles digit-by-digit)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_build(
    df: DataFrame, key: Column, group_cols: list[str], k: int = 256
) -> DataFrame:
    """(group_cols…, kmv: array<bigint> ascending): the K-minimum-values
    (bottom-k) distinct sketch per group — the k smallest 60-bit hashes
    of the group's DISTINCT keys. The classic theta-family sketch: a
    group with fewer than k distinct keys stores them all (the sketch
    degrades to an exact distinct set); otherwise the k-th minimum
    estimates the distinct count as (k-1)/normalized(h_k), and two
    sketches support union / intersection / Jaccard estimation by pure
    array algebra (:func:`kmv_union`, :func:`kmv_pair_stats`) — the
    distinct-count complement of the CMS above (frequency) and the
    built-in HLL (approx_count_distinct, which cannot intersect).

    Scale shape: distinct (group, hash) → TWO bounded ranking windows
    (first partitioned by (group, hash-salt), then by group over the
    ≤ 64·k survivors) → one sorted collect of exactly ≤ k values per
    group. No window partition ever exceeds max(n/64-per-group, 64·k)
    rows, so a billion-key group never funnels through one reducer at
    full width; the collected arrays are ≤ k longs — broadcast-sized
    however large the data."""
    h = kmv_hash(key)
    return kmv_from_hashes(
        df.select(*group_cols, h.alias("_h")), group_cols, k
    )


def kmv_from_hashes(
    hashed: DataFrame, group_cols: list[str], k: int = 256, presalt: bool = True
) -> DataFrame:
    """Bottom-k sketch from ALREADY-hashed rows (group_cols…, _h) —
    the merge surface: because any hash among a group's k smallest is
    among the k smallest of whichever subset it came from, re-running
    this over the exploded union of per-batch sketches reproduces the
    whole-corpus sketch exactly (streaming/incremental maintenance
    reuses it; bit-equality unit-pinned).

    ``presalt``: the salted pre-ranking pass exists so an UNBOUNDED
    group (raw keys, or arbitrarily many merged partials) never
    funnels full-width through one reducer. A merge whose input is
    bounded by construction — e.g. a fixed window of w sketches, ≤w·k
    rows per group at ANY data size — may pass ``presalt=False`` and
    pay one ranking window instead of two; output is identical either
    way (the pre-pass only discards rows the final rank discards).

    Stamp contract (r13): when the input's ``_h`` carries a sketch
    stamp (attached by :func:`kmv_explode` from a stored table), it
    must agree with ``k`` — a cross-k merge hard-fails here instead
    of producing a biased estimator; unstamped inputs are trusted.
    The output ``kmv`` column is stamped with (k, hash_bits)."""
    _check_kmv_stamp(kmv_stamp(hashed, "_h"), k, "kmv_from_hashes")
    dist = hashed.distinct()
    from pyspark.sql.window import Window

    if presalt:
        w1 = Window.partitionBy(*group_cols, F.pmod("_h", F.lit(64))).orderBy(
            "_h"
        )
        dist = (
            dist.withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") <= k)
            .drop("_r1")
        )
    w2 = Window.partitionBy(*group_cols).orderBy("_h")
    kept = dist.withColumn("_r2", F.row_number().over(w2)).where(
        F.col("_r2") <= k
    )
    return kept.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("_h")).alias("kmv")
    ).withMetadata("kmv", _kmv_meta(k))


def kmv_estimate(sketch: Column, k: int = 256) -> Column:
    """Distinct-count estimate from a bottom-k sketch column: exact
    size below k, else (k-1)/(h_k/M) — written as that exact double
    expression on both engines (bit-reproducible)."""
    hk = F.element_at(sketch, k).cast("double") / F.lit(float(KMV_M))
    return F.when(
        F.size(sketch) < k, F.size(sketch).cast("double")
    ).otherwise(F.lit(float(k - 1)) / hk)


def kmv_union(a: Column, b: Column, k: int = 256) -> Column:
    """The union sketch: k smallest of the merged distinct hash sets —
    exactly the sketch kmv_build would produce on the concatenated
    inputs (merge ≡ whole, the mergeability contract)."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_pair_stats(a: Column, b: Column, k: int = 256) -> dict[str, Column]:
    """Set-operation estimates for two same-k sketches, as columns:
    ``est_union`` (distinct of A∪B), ``est_jaccard`` (shared fraction
    of the union sketch — the standard KMV coincidence estimator) and
    ``est_intersection`` (jaccard × union). All are deterministic
    functions of the two hash arrays, so a cross-engine oracle
    reproduces them exactly."""
    u = kmv_union(a, b, k)
    shared = F.size(F.array_intersect(u, F.array_intersect(a, b)))
    est_u = kmv_estimate(u, k)
    jac = shared.cast("double") / F.size(u)
    return {
        "est_union": est_u,
        "est_jaccard": jac,
        "est_intersection": jac * est_u,
    }


def _merge_k(tables: list[DataFrame], col: str, k_out, what: str) -> int:
    ks = []
    for t in tables:
        st = kmv_stamp(t, col)
        if st is None:
            raise ValueError(
                f"{what} requires stamped sketch tables (the stamp is "
                "what makes a cross-k merge checkable)"
            )
        ks.append(int(st["k"]))
    k = min(ks) if k_out == "min" else int(k_out)
    if any(kk < k for kk in ks):
        raise ValueError(
            f"{what}: k_out={k} exceeds an input's k={min(ks)} — the "
            "k-th minimum of a union that lost hashes beyond a smaller "
            "input's k-th minimum is biased upward; merge down "
            "(k_out='min') or rebuild the small side."
        )
    return k


def kmv_merge(
    tables: list[DataFrame],
    group_cols: list[str],
    k_out: int | str = "min",
) -> DataFrame:
    """Merge STAMPED distinct-sketch tables of (possibly) DIFFERENT k
    into one ``k_out`` sketch — the r13 stamp check hard-fails cross-k
    merges, but a rebuild is not actually necessary to merge DOWN: a
    union kept to the bottom min(k) IS a spec-valid min(k) sketch (any
    hash among a group's min(k) smallest is among the k'≥min(k)
    smallest of whichever input introduced it — the same semilattice
    argument as same-k merges, unit-pinned ≡ a direct min(k) build).
    ``k_out`` ABOVE any input's k stays a hard refusal: hashes beyond
    the smaller input's k-th minimum were discarded, so the union's
    k_out-th minimum would be biased upward. Unstamped tables are
    refused — the stamp is what makes the degrade checkable."""
    k = _merge_k(tables, "kmv", k_out, "kmv_merge")
    rows = None
    for t in tables:
        part = kmv_explode(t, group_cols).withMetadata("_h", {})
        rows = part if rows is None else rows.unionByName(part)
    return kmv_from_hashes(rows, group_cols, k=k)


def kmv_sample_merge(
    tables: list[DataFrame],
    group_cols: list[str],
    k_out: int | str = "min",
) -> DataFrame:
    """The value-sample twin of :func:`kmv_merge`: bottom-min(k) of a
    union of bottom-k' samples carries the values through the same
    semilattice argument (membership is a pure function of the hash,
    values ride along), so cross-k sample merges degrade to min(k)
    exactly like the distinct sketch — unit-pinned ≡ a direct min(k)
    build. Same refusal rules."""
    k = _merge_k(tables, "smp", k_out, "kmv_sample_merge")
    rows = None
    for t in tables:
        part = kmv_sample_explode(t, group_cols).withMetadata("_h", {})
        rows = part if rows is None else rows.unionByName(part)
    return kmv_sample_from_hashes(rows, group_cols, k=k)


# --------------------------------------------------- KMV value sample


def kmv_sample(
    df: DataFrame,
    key: Column,
    val: Column,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """(group_cols…, smp: array<struct<h,v>> ascending by hash): a
    DETERMINISTIC uniform row sample per group — the rows whose
    60-bit key hashes are the group's k smallest, carrying a value
    column. The bottom-k-by-hash rule makes the sample (a) uniform
    (md5 is uniform over the key domain), (b) MERGEABLE by the same
    semilattice argument as the distinct sketch (any hash among a
    window's k smallest is among the k smallest of whichever stored
    partial introduced it — so daily samples re-rank into any
    window's sample exactly), and (c) bit-reproducible cross-engine
    (membership is a pure function of md5). That is what the built-in
    percentile_approx (KLL) cannot offer a warehouse: its sketch is
    neither storable-and-mergeable at the SQL surface nor
    deterministic across engines. Quantiles read from the merged
    sample carry standard uniform-sampling error (unit-pinned <10%
    median relative error at k=128 on the rolling-window query).

    PRECONDITION: ``key`` unique per row (the winnow posting rule) —
    duplicate keys would collapse to one sampled row.
    """
    return kmv_sample_from_hashes(
        df.select(*group_cols, kmv_hash(key).alias("_h"), val.alias("_v")),
        group_cols,
        k,
    )


def kmv_sample_from_hashes(
    hashed: DataFrame, group_cols: list[str], k: int = 256, presalt: bool = True
) -> DataFrame:
    """Bottom-k value sample from ALREADY-hashed rows (group_cols…,
    _h, _v) — the merge surface (explode stored samples, re-rank).
    Same two-bounded-windows shape and ``presalt`` contract as
    :func:`kmv_from_hashes`; rows carry the value through the ranks.
    Output array is sorted by (hash, value) — deterministic even if
    two keys hash-collide. Same stamp contract as kmv_from_hashes:
    a stamped ``_h`` (from :func:`kmv_sample_explode`) must agree
    with ``k`` — cross-k sample merges are biased the same way
    cross-k distinct merges are.

    Like :func:`kmv_from_hashes`, input rows are deduplicated on
    (group, _h, _v) before ranking, so a replayed/duplicated merge
    partial (the crash-recovery double-count hazard) cannot occupy
    multiple of the k sample slots — merge is idempotent to the same
    faults the distinct-sketch path is."""
    from pyspark.sql.window import Window

    _check_kmv_stamp(kmv_stamp(hashed, "_h"), k, "kmv_sample_from_hashes")
    dist = hashed.dropDuplicates([*group_cols, "_h", "_v"])
    if presalt:
        w1 = Window.partitionBy(*group_cols, F.pmod("_h", F.lit(64))).orderBy(
            "_h", "_v"
        )
        dist = (
            dist.withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") <= k)
            .drop("_r1")
        )
    w2 = Window.partitionBy(*group_cols).orderBy("_h", "_v")
    kept = dist.withColumn("_r2", F.row_number().over(w2)).where(
        F.col("_r2") <= k
    )
    return kept.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("_h", "_v"))).alias("smp")
    ).withMetadata("smp", _kmv_meta(k, "kmv_sample"))


def kmv_sample_explode(
    table: DataFrame, group_cols: list[str], k: int | None = None
) -> DataFrame:
    """Explode a stored sample table to (group_cols…, _h, _v) merge
    rows — the validated entrance to :func:`kmv_sample_from_hashes`,
    mirroring :func:`kmv_explode`: a stamped table must agree with
    the caller's ``k`` (hard-fail), and the stamp re-attaches to
    ``_h`` so the re-rank validates again."""
    stamp = kmv_stamp(table, "smp")
    if k is not None:
        _check_kmv_stamp(stamp, k, "kmv_sample_explode")
    eff_k = int(stamp["k"]) if stamp is not None else k
    out = table.select(
        *group_cols, F.explode("smp").alias("_s")
    ).select(
        *group_cols, F.col("_s._h").alias("_h"), F.col("_s._v").alias("_v")
    )
    if eff_k is not None:
        out = out.withMetadata("_h", _kmv_meta(eff_k, "kmv_sample"))
    return out


def kmv_sample_quantile(smp: Column, p: float) -> Column:
    """Deterministic lower-nearest-rank quantile of a sample column:
    the value at rank ceil(p·n) of the sample's SORTED VALUES —
    written as the same integer-rank expression on both engines (no
    interpolation, so no float-divergence surface)."""
    vals = F.array_sort(F.transform(smp, lambda s: s["_v"]))
    rank = F.greatest(
        F.ceil(F.size(vals) * F.lit(float(p))).cast("int"), F.lit(1)
    )
    return F.element_at(vals, rank)
