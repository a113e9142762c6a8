"""Deduplication operators ([EXT], SURVEY.md §2.11) for the
training-data-pipeline surface, over ``documents(doc_id, text, ...)``.

All four families (exact, MinHash+LSH, SimHash, n-gram Jaccard verify)
are pure DataFrame ops — no Python UDFs — so they shuffle exactly where
the algorithm requires (the LSH band groupBy / pair join) and nowhere
else, and stay inside whole-stage codegen at 100 TB.

Design choices for scale:
- Signatures are computed in one projection over the scan (arrays +
  higher-order functions), so the only shuffles are the band-bucket
  self-join and the final anti-join.
- Candidate generation is LSH-blocked: pairs are only formed within a
  band bucket, never across the full corpus (no O(n²) crossJoin).
- The dedup *decision* is the standard greedy keep-min-id rule: a doc is
  dropped iff it verifies as a near-dup of a smaller-id doc. This is a
  single anti-join, deterministic, and avoids iterative connected
  components (which needs a fixpoint loop; planned as a later round's
  graph extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# deterministic universal-hash parameters (odd multipliers, fixed seed
# lineage: simple LCG constants — public-domain folklore values).
# 31-bit Mersenne prime: a*h stays < 2^62, so the universal hash never
# overflows int64 under ANSI arithmetic; 31-bit minhash values are
# ample for Jaccard estimation (collision prob 2^-31 per function).
_MERSENNE_P = (1 << 31) - 1


def _hash_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """n (a, b) pairs for h_i(x) = (a*x + b) mod p, reproducible."""
    params = []
    state = seed
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state | 1) % _MERSENNE_P
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE_P
        params.append((a, b))
    return params


def normalize_text(col: Column | str) -> Column:
    """lower → strip non-alphanumerics → collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^\p{L}\p{N}\s]", " "), r"\s+", " "))


def tokens_col(col: Column | str) -> Column:
    return F.split(normalize_text(col), " ")


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles of the normalized text (array<string>).

    Built with sequence+transform+slice — one codegen'd expression, no
    explode (the array never leaves the row).
    """
    toks = tokens_col(col)
    return F.array_distinct(
        F.when(
            F.size(toks) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def exact_dedup(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Exact dedup, keep the row with the smallest ``order_col`` per key
    group — deterministic (unlike dropDuplicates' keep-arbitrary), one
    hash shuffle on ``keys``."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Add ``_shingles`` and a ``_minhash`` array<long> of length
    ``num_hashes``: min over shingles of (a_i*x64(s)+b_i) mod p, with
    x64 = xxhash64 (JVM, codegen'd). Entirely per-row: zero shuffles.
    """
    sh = shingles(text_col, shingle_k).alias("_shingles")
    base = df.select("*", sh).withColumn(
        "_sh_hash", F.transform("_shingles", lambda s: F.xxhash64(s))
    )
    params = _hash_params(num_hashes, seed)

    def _minhash_fn(a: int, b: int):
        # single-arg closure (Spark maps lambda arity onto HOF arity)
        return lambda h: (
            F.lit(a) * F.pmod(h, F.lit(_MERSENNE_P)) + F.lit(b)
        ) % F.lit(_MERSENNE_P)

    sig = F.array(
        *[F.array_min(F.transform("_sh_hash", _minhash_fn(a, b))) for a, b in params]
    )
    return base.withColumn("_minhash", sig).drop("_sh_hash")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate candidate pairs verified by exact shingle Jaccard.

    signature → band hashes → explode(bands) → self-join per
    (band, band_hash) bucket → distinct candidate pairs → verify
    with exact Jaccard on the shingle sets. Returns
    (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, num_hashes, shingle_k, seed).select(
        F.col(id_col).alias("_id"), "_shingles", "_minhash"
    )
    banded = sig.select(
        "_id",
        "_shingles",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("_minhash", b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("_id", "_shingles", "bb.band", "bb.bucket")

    a = banded.select(
        F.col("_id").alias("id_a"), F.col("_shingles").alias("_sh_a"), "band", "bucket"
    )
    b = banded.select(
        F.col("_id").alias("id_b"), F.col("_shingles").alias("_sh_b"), "band", "bucket"
    )
    pairs = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sh_a", "_sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = (
        F.size(F.array_intersect("_sh_a", "_sh_b"))
        / F.size(F.array_union("_sh_a", "_sh_b"))
    ).alias("jaccard")
    return pairs.select("id_a", "id_b", jac).where(F.col("jaccard") >= threshold)


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    **kwargs,
) -> DataFrame:
    """Drop every doc that near-duplicates a smaller-id doc (greedy
    keep-min-id); one anti-join against the verified pair set."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, threshold=threshold, **kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, [id_col], "left_anti")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "simhash",
) -> DataFrame:
    """64-bit SimHash over word tokens, as one per-row expression.

    For each bit position i, the signed vote is Σ_tokens (bit_i ? +1 :
    -1); bit_i of the fingerprint is set iff the vote is positive. The
    token loop runs inside ``aggregate`` over the token-hash array —
    no explode, no shuffle.
    """
    th = F.transform(tokens_col(text_col), lambda t: F.xxhash64(t)).alias("_th")
    base = df.select("*", th)

    def _vote_fn(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    fp = F.lit(0).cast("long")
    for i in range(64):
        vote = F.aggregate(F.col("_th"), F.lit(0).cast("long"), _vote_fn(i))
        bit = F.shiftleft(F.lit(1).cast("long"), i)
        fp = fp.bitwiseOR(F.when(vote > 0, bit).otherwise(F.lit(0).cast("long")))
    return base.withColumn(out_col, fp).drop("_th")


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on each of four 16-bit bands
    (any pair within Hamming distance 3 of 64 bits shares at least one
    exact band — pigeonhole), then verify with ``bit_count(xor)``."""
    sh = simhash(df, text_col).select(F.col(id_col).alias("_id"), "simhash")
    banded = sh.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("_id", "simhash", "bb.band", "bb.bucket")
    a = banded.select(F.col("_id").alias("id_a"), F.col("simhash").alias("_h_a"), "band", "bucket")
    b = banded.select(F.col("_id").alias("id_b"), F.col("simhash").alias("_h_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_h_a").bitwiseXOR(F.col("_h_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over blocked pairs (the non-probabilistic
    baseline the MinHash path approximates). ``block_cols`` bounds the
    pair blowup (e.g. ["lang"]); omit only on small corpora."""
    base = df.select(F.col(id_col).alias("_id"), *(block_cols or []), shingles(text_col, k).alias("_sh"))
    a = base.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a"), *(block_cols or []))
    b = base.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b"), *(block_cols or []))
    pairs = a.join(b, block_cols) if block_cols else a.crossJoin(b)
    jac = (
        F.size(F.array_intersect("_sh_a", "_sh_b"))
        / F.size(F.array_union("_sh_a", "_sh_b"))
    ).alias("jaccard")
    return (
        pairs.where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jac)
        .where(F.col("jaccard") >= threshold)
    )
