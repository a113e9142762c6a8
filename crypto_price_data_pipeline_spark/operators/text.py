"""Text analysis operators ([EXT], SURVEY.md §2.11) over
``documents(doc_id, text, lang, source, n_chars)``.

All pure Column expressions (codegen'd, shuffle-free per row):
tokenization, token counting (whitespace + a BPE-ish regex splitter),
quality scoring (length / punctuation / stopword / repetition ratios),
a rolling-hash document fingerprint, and an n-gram-profile language-ID
heuristic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small top-stopword profiles for the language-ID heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"],
}


def tokenize(col: Column | str) -> Column:
    """Whitespace tokens of the lowercased text (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def bpe_ish_tokens(col: Column | str) -> Column:
    """Sub-word-ish tokens: split on whitespace AND punctuation
    boundaries (the regex a BPE pre-tokenizer applies before merges)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), r"[\s\p{Punct}]+"),
        lambda t: t != "",
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach per-doc quality features + a composite score in [0,1].

    Features follow the public Gopher/C4-style filters: doc length,
    mean word length, punctuation density, stopword fraction, and a
    repetition ratio (1 - distinct/total tokens).
    """
    c = F.col(text_col)
    toks = tokenize(text_col)
    n_tok = F.size(toks)
    n_char = F.length(c)
    en_stop = F.array(*[F.lit(s) for s in _STOPWORDS["en"]])
    stop_frac = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t))) / F.greatest(
        n_tok, F.lit(1)
    )
    punct_ratio = (
        F.length(F.regexp_replace(c, r"[^\p{Punct}]", "")) / F.greatest(n_char, F.lit(1))
    )
    rep_ratio = F.lit(1.0) - F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    mean_word_len = (n_char - n_tok + 1) / F.greatest(n_tok, F.lit(1))
    score = (
        F.when((n_tok >= 5) & (n_tok <= 100000), 0.25).otherwise(0.0)
        + F.when((mean_word_len >= 2) & (mean_word_len <= 12), 0.25).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.25).otherwise(0.0)
        + F.when(rep_ratio <= 0.9, 0.25).otherwise(0.0)
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_frac, 6).alias("stopword_frac"),
        F.round(rep_ratio, 6).alias("repetition_ratio"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax over per-language stopword hit
    rates (ties → 'und'). A real model is out of scope; the operator
    shape (N score columns → greatest → case) is what scales."""
    toks = tokenize(text_col)
    n = F.greatest(F.size(toks), F.lit(1))

    def _hit_filter(ws: list[str]):
        return lambda t: t.isin(*ws)

    scores = {
        lang: F.size(F.filter(toks, _hit_filter(ws))) / n
        for lang, ws in _STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang, s in reversed(list(scores.items())):
        pred = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(pred)
    return df.withColumn(out_col, pred)


# PII patterns chosen for identical semantics under Java regex (Spark)
# and RE2 (DuckDB/Go scrubbers): no backreferences, no lookaround.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+\d{7,15}", "<PHONE>"),
)


def pii_scrub(col: Column | str) -> Column:
    """Replace emails, IPv4 addresses, and E.164-style phone numbers
    with placeholder tokens — the standard pre-training privacy pass.
    Pure ``regexp_replace`` chain: JVM-side codegen, engine-portable
    patterns (order matters: emails first so their digit runs can't be
    half-eaten by the IP/phone rules)."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def fingerprint(col: Column | str) -> Column:
    """Deterministic rolling-hash fingerprint of the token stream:
    fold h = rotl(h, 5) XOR xxhash64(token) (order-sensitive; equal
    token stream ⇔ equal fingerprint). XOR-rotate instead of multiply
    so the fold never overflows under ANSI arithmetic."""
    toks = tokenize(col)
    return F.aggregate(
        toks,
        F.lit(1125899906842597).cast("long"),
        lambda acc, t: (
            F.shiftleft(acc, 5).bitwiseOR(F.shiftrightunsigned(acc, 59))
        ).bitwiseXOR(F.xxhash64(t)),
    )


def fingerprint_md5(col: Column | str) -> Column:
    """Order-sensitive document fingerprint as a chained md5 fold over
    the token stream: h = md5(h || token). Slower than ``fingerprint``
    (string re-hash per step vs long arithmetic) but expressible in any
    engine with md5 — use it when fingerprints must be verified or
    joined across systems; use ``fingerprint`` for pure-Spark dedup."""
    toks = tokenize(col)
    return F.aggregate(
        toks, F.lit("fp0"), lambda acc, t: F.md5(F.concat(acc, t))
    )


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus term frequencies: explode tokens → count per word. The one
    text op that genuinely shuffles (groupBy word); partial aggregation
    (map-side combine) keeps the shuffle ≈ |vocab|, not |corpus|."""
    return (
        df.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
