"""Multimodal column plumbing ([EXT], SURVEY.md §2.11).

Images / audio / video ride through the engine as opaque ``binary``
columns plus a typed metadata struct — the lakehouse-standard encoding
(parquet BYTE_ARRAY pages, no row-group bloat because binary columns
are column-pruned unless selected).

The Spark-side plumbing here is real and tested: schema, Arrow-batched
UDF signatures over ``mapInPandas``, batch shapes, and a deterministic
byte-histogram feature extractor (computable without media libraries).
The actual codec decode steps are STUBBED — this container has no
image/audio libs — behind ``NotImplementedError`` with the intended
signature documented.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table: each document's UTF-8 bytes as the
    binary payload (stands in for image bytes; every downstream op is
    payload-agnostic)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = "media_id long, n_bytes long, byte_hist array<long>"


def byte_histogram_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``: a
    ``bins``-bucket histogram of payload byte values. This is the real
    production shape for decode/resize/frame-sample UDFs — per-batch
    pandas in/out, no per-row Python — with a decode step any media lib
    can slot into."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        width = 256 // bins
        for pdf in batches:
            hists = [
                [0] * bins
                if b is None
                else [
                    sum(1 for x in b if lo <= x < lo + width)
                    for lo in range(0, 256, width)
                ]
                for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [0 if b is None else len(b) for b in pdf["payload"]],
                    "byte_hist": hists,
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def decode_image(media: DataFrame, fmt: str = "RGB") -> DataFrame:
    """STUB — decode payload → pixel tensor column.

    Intended signature: mapInPandas batches with output schema
    ``media_id long, pixels array<array<array<int>>>, width int,
    height int``; slot PIL/libvips into ``extract``. Unavailable in
    this container."""
    raise NotImplementedError("image codec libraries not available in this environment")


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB — video frame sampling (payload → one row per sampled frame
    via mapInPandas + per-batch explode). Unavailable here."""
    raise NotImplementedError("video codec libraries not available in this environment")
