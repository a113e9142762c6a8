from .asof import asof_join
from .range_join import band_join
from .dedup import exact_dedup, minhash_signatures, minhash_lsh_pairs, minhash_dedup, minhash_band_stats, pick_minhash_strategy, minhash_cross_pairs, simhash, simhash_pairs, simhash_md5, simhash_md5_pairs
from .similarity import cosine_topk, hyperplane_lsh_buckets, lsh_cosine_topk, ivf_build, ivf_topk
from .text import tokenize, token_count, quality_scores, language_id, fingerprint
from .components import connected_components, dedup_keep_component_min
from .series import ema_by_key_chunked, ema_fold, emas_by_key_chunked
from .skew import salted_join
from .sketch import kmv_build, kmv_estimate, kmv_union, kmv_pair_stats, kmv_from_hashes

__all__ = [
    "asof_join",
    "band_join",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "minhash_band_stats",
    "pick_minhash_strategy",
    "minhash_cross_pairs",
    "simhash",
    "simhash_pairs",
    "simhash_md5",
    "simhash_md5_pairs",
    "cosine_topk",
    "hyperplane_lsh_buckets",
    "lsh_cosine_topk",
    "ivf_build",
    "ivf_topk",
    "connected_components",
    "dedup_keep_component_min",
    "ema_by_key_chunked",
    "emas_by_key_chunked",
    "ema_fold",
    "salted_join",
    "kmv_build",
    "kmv_estimate",
    "kmv_union",
    "kmv_pair_stats",
    "kmv_from_hashes",
    "tokenize",
    "token_count",
    "quality_scores",
    "language_id",
    "fingerprint",
]
