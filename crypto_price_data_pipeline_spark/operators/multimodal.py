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


DECODED_SCHEMA = "media_id long, width int, height int, pixels array<array<int>>"


def _fake_image_decode(payload: bytes, width: int = 8) -> tuple[int, int, list[list[int]]]:
    """Deterministic stand-in decoder: payload bytes laid out row-major
    as a ``width``-wide grayscale image (last row zero-padded). Replace
    with PIL/libvips in environments that have them — the mapInPandas
    plumbing below is codec-agnostic."""
    n = len(payload)
    height = max(1, -(-n // width))
    padded = payload + b"\x00" * (width * height - n)
    return width, height, [
        list(padded[r * width:(r + 1) * width]) for r in range(height)
    ]


def decode_image(media: DataFrame, codec: str = "fake", width: int = 8) -> DataFrame:
    """payload → grayscale pixel tensor rows via Arrow-batched
    ``mapInPandas`` (the real production shape: per-batch pandas in/out,
    one Python worker per input partition, no per-row overhead).

    ``codec="fake"`` uses the deterministic byte-layout decoder above;
    ``codec="pil"`` is the slot for a real image library (absent in this
    container → NotImplementedError)."""
    if codec != "fake":
        raise NotImplementedError(
            f"image codec {codec!r} not available in this environment; "
            "plug a PIL/libvips decoder into the extract closure"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "pixels": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = _fake_image_decode(b"" if payload is None else payload, width)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["pixels"].append(px)
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, DECODED_SCHEMA)


def resize_image(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel tensors — pure pandas
    math inside mapInPandas, deterministic, codec-independent."""

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_px = []
            for w, h, px in zip(pdf["width"], pdf["height"], pdf["pixels"]):
                rows = [
                    [
                        int(px[min(h - 1, (r * h) // out_h)][min(w - 1, (c * w) // out_w)])
                        for c in range(out_w)
                    ]
                    for r in range(out_h)
                ]
                out_px.append(rows)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [out_w] * len(pdf),
                    "height": [out_h] * len(pdf),
                    "pixels": out_px,
                }
            )

    return decoded.mapInPandas(resample, DECODED_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_len int, frame binary"


def sample_frames(
    media: DataFrame, every_n: int = 4, frame_size: int = 64, codec: str = "fake"
) -> DataFrame:
    """Video frame sampling: payload → one row per sampled frame
    (per-batch explode inside mapInPandas — output rows ≠ input rows,
    which is exactly why this is mapInPandas and not a scalar UDF).

    The fake codec treats the payload as a stream of ``frame_size``-byte
    frames and keeps every ``every_n``-th; a real container parser slots
    into the same closure (``codec="ffmpeg"`` → NotImplementedError
    here)."""
    if codec != "fake":
        raise NotImplementedError(
            f"video codec {codec!r} not available in this environment"
        )

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_len": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = b"" if payload is None else bytes(payload)
                n_frames = max(1, -(-len(buf) // frame_size))
                for idx in range(0, n_frames, every_n):
                    frame = buf[idx * frame_size:(idx + 1) * frame_size]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_len"].append(len(frame))
                    out["frame"].append(frame)
            yield pd.DataFrame(out)

    return media.mapInPandas(explode_frames, FRAME_SCHEMA)
