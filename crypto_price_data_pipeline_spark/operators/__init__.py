from .asof import asof_join
from .range_join import band_join
from .dedup import exact_dedup, minhash_signatures, minhash_lsh_pairs, minhash_dedup, simhash, simhash_pairs, simhash_md5, simhash_md5_pairs
from .similarity import cosine_topk, hyperplane_lsh_buckets, lsh_cosine_topk, ivf_build, ivf_topk
from .text import tokenize, token_count, quality_scores, language_id, fingerprint
from .components import connected_components, dedup_keep_component_min
from .series import ema_by_key_chunked, ema_fold, emas_by_key_chunked
from .skew import salted_join

__all__ = [
    "asof_join",
    "band_join",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_dedup",
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
    "tokenize",
    "token_count",
    "quality_scores",
    "language_id",
    "fingerprint",
]
