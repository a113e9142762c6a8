"""Wave 37 [EXT]: boilerplate span removal — the dedup family's
missing TRANSFORM. Every dedup operator so far detects pairs
(minhash/simhash/winnowing/overlap) or drops whole documents
(exact/cross/semantic dedup); production training-data pipelines also
REWRITE documents, removing corpus-duplicated spans and keeping the
unique remainder (ExactSubstr-style span dedup / C4-class boilerplate
stripping). ``operators/text.boilerplate_strip`` is the n-gram-df
form of that transform: k-gram-granular span boundaries, exact string
output (no hash hiding), one posting shuffle + one df aggregate +
a zero-shuffle in-row rebuild.

Determinism contract: the rebuilt string is a pure function of the
normalized text and the gram document frequencies — both engines
compute the identical characters, so the oracle pins the FULL
rewritten string per document (the strongest check a transform can
carry), not a summary statistic.

Reference parity: [EXT] — the reference (bpi_crawler.py) has no
corpus tooling; this extends the driver-mandated dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io.sources import load_table


def q_boilerplate_strip(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide boilerplate span removal at k=8 chars, df cap 50:
    every normalized-character position covered by an 8-gram present
    in more than 50 documents is masked; the query emits each doc's
    full rewritten string + masked/total char counts (at sf0.001 this
    strips the shared template phrases — ~13% of normalized chars
    across 454/500 docs — while unique content survives verbatim).
    The oracle rebuilds gram dfs, the covered-position set and the
    surviving string relationally and must match bit-for-bit."""
    from .operators.text import boilerplate_strip
    from .session import scale_out

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return boilerplate_strip(
        scale_out(docs), "doc_id", "text", k=8, max_doc_freq=50
    ).orderBy("doc_id")


Q_BOILERPLATE_STRIP_SQL = r"""
WITH clean AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
  FROM documents
),
pos AS (
  SELECT doc_id, s,
         unnest(range(1, CAST(greatest(length(s) - 7, 0) AS BIGINT) + 1)) AS i
  FROM clean
),
g AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
             substring(s, CAST(i AS INTEGER), 8) AS g FROM pos),
hot AS (
  SELECT g FROM (SELECT DISTINCT g, doc_id FROM g)
  GROUP BY g HAVING COUNT(*) > 50
),
starts AS (SELECT doc_id, i FROM g JOIN hot USING (g)),
covered AS (
  SELECT DISTINCT doc_id, i + CAST(off AS INTEGER) AS p
  FROM starts, LATERAL (SELECT unnest(range(0, 8)) AS off) t
),
chars AS (
  SELECT c.doc_id, CAST(p.p AS INTEGER) AS p
  FROM clean c,
       LATERAL (SELECT unnest(range(1, CAST(length(c.s) AS BIGINT) + 1)) AS p) p
),
kept AS (
  SELECT ch.doc_id, ch.p
  FROM chars ch ANTI JOIN covered cv USING (doc_id, p)
),
rebuilt AS (
  SELECT c.doc_id,
         coalesce(
           (SELECT string_agg(substring(c.s, k.p, 1), '' ORDER BY k.p)
            FROM kept k WHERE k.doc_id = c.doc_id),
           '') AS kept_text,
         coalesce(
           (SELECT CAST(COUNT(*) AS INTEGER) FROM covered cv
            WHERE cv.doc_id = c.doc_id),
           0) AS n_masked,
         CAST(length(c.s) AS INTEGER) AS n_chars
  FROM clean c
)
SELECT doc_id, kept_text, n_masked, n_chars
FROM rebuilt ORDER BY doc_id
"""


EXT37_QUERIES = {
    "q_boilerplate_strip": q_boilerplate_strip,
}
EXT37_ORACLES = {
    "q_boilerplate_strip": Q_BOILERPLATE_STRIP_SQL,
}
