from .asof import asof_join
from .range_join import band_join
from .dedup import exact_dedup, minhash_signatures, minhash_lsh_pairs, minhash_dedup, simhash, simhash_pairs
from .similarity import cosine_topk, hyperplane_lsh_buckets, lsh_cosine_topk
from .text import tokenize, token_count, quality_scores, language_id, fingerprint

__all__ = [
    "asof_join",
    "band_join",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "simhash",
    "simhash_pairs",
    "cosine_topk",
    "hyperplane_lsh_buckets",
    "lsh_cosine_topk",
    "tokenize",
    "token_count",
    "quality_scores",
    "language_id",
    "fingerprint",
]
