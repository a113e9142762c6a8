"""Units for the pure-numpy baseline JPEG codec (operators/jpeg.py,
r13): roundtrip error bounds by content class and quality,
determinism, odd dimensions, color, the documented unsupported-corner
taxonomy (ValueError vs NotImplementedError), and the Spark
decode_image path incl. per-row skip tolerance."""

from __future__ import annotations

import numpy as np
import pytest

from crypto_price_data_pipeline_spark.operators.jpeg import (
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_gray,
)


def _gray(w=16, h=16, fn=lambda r, c: (r * 7 + c * 13) % 256):
    return np.fromfunction(np.vectorize(fn), (h, w)).astype(np.uint8)


def test_flat_block_roundtrip_exact():
    flat = np.full((16, 16), 130, dtype=np.uint8)
    w, h, px = jpeg_decode(jpeg_encode(flat, quality=90))
    assert (w, h) == (16, 16)
    assert np.abs(np.array(px) - 130).max() == 0


def test_gradient_roundtrip_tight_and_odd_dims():
    g = (np.add.outer(np.arange(37) * 3, np.arange(53) * 2) % 256).astype(
        np.uint8
    )
    enc = jpeg_encode(g, quality=95)
    w, h, px = jpeg_decode(enc)
    assert (w, h) == (53, 37)  # non-multiple-of-8 dims crop exactly
    assert np.abs(np.array(px) - g).max() <= 2


def test_noise_roundtrip_bounded_and_deterministic():
    # ASCII-noise content (the q_jpeg_decode corpus shape) exercises
    # the ZRL / high-category Huffman paths
    rng = (np.arange(256, dtype=np.int64) * 193 % 95 + 32).astype(np.uint8)
    a = rng.reshape(16, 16)
    for q, bound in ((95, 16), (75, 56)):
        enc = jpeg_encode(a, quality=q)
        assert enc == jpeg_encode(a, quality=q)  # deterministic bytes
        w, h, px = jpeg_decode(enc)
        assert np.abs(np.array(px) - a).max() <= bound, q


def test_color_roundtrip_bounded():
    ramp = np.linspace(0, 255, 24 * 24).reshape(24, 24)
    rgb = np.stack([ramp, ramp[::-1], np.full((24, 24), 77.0)], axis=2).astype(
        np.uint8
    )
    w, h, px = jpeg_decode(jpeg_encode(rgb, quality=95))
    a = np.array(px)
    chans = np.stack([(a >> 16) & 255, (a >> 8) & 255, a & 255], axis=2)
    assert np.abs(chans.astype(int) - rgb.astype(int)).max() <= 8


def test_encode_gray_bytes_convenience():
    data = bytes(range(64)) * 4
    w, h, px = jpeg_decode(jpeg_encode_gray(data, 16, quality=95))
    assert (w, h) == (16, 16)
    ref = np.frombuffer(data, dtype=np.uint8).reshape(16, 16)
    assert np.abs(np.array(px) - ref).max() <= 16


def test_unsupported_corner_taxonomy():
    enc = jpeg_encode(_gray(), quality=90)
    with pytest.raises(ValueError, match="bad SOI"):
        jpeg_decode(b"not a jpeg")
    with pytest.raises(NotImplementedError, match="SOF"):
        jpeg_decode(enc.replace(b"\xff\xc0", b"\xff\xc2", 1))
    # subsampled: patch the SOF0 sampling byte (0x11 -> 0x22)
    sof = enc.find(b"\xff\xc0")
    patched = bytearray(enc)
    patched[sof + 11] = 0x22
    with pytest.raises(NotImplementedError, match="subsampled"):
        jpeg_decode(bytes(patched))
    with pytest.raises(ValueError):
        jpeg_decode(enc[: len(enc) // 2])  # truncated stream


def test_spark_decode_image_jpeg_path_and_skip(spark):
    import pandas as pd

    from crypto_price_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    imgs = {i: _gray(fn=lambda r, c, i=i: (r * 5 + c * 11 + i * 37) % 256) for i in range(4)}
    rows = [(i, bytearray(jpeg_encode(a, quality=95))) for i, a in imgs.items()]
    rows.append((99, bytearray(b"corrupt")))
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [r[0] for r in rows], "payload": [r[1] for r in rows]})
    )
    got = {
        r["media_id"]: r
        for r in decode_image(media, codec="jpeg", on_error="skip").collect()
    }
    assert set(got) == set(imgs)  # corrupt row skipped, not fatal
    for i, a in imgs.items():
        r = got[i]
        assert (r["width"], r["height"]) == (16, 16)
        assert np.abs(np.array(r["pixels"]) - a).max() <= 16
    with pytest.raises(Exception):
        decode_image(media, codec="jpeg", on_error="raise").collect()


# -------------------------------------------- MJPEG AVI container


def test_mjpeg_avi_roundtrip_and_taxonomy():
    from crypto_price_data_pipeline_spark.operators.mjpeg import (
        avi_mjpeg_decode,
        avi_mjpeg_encode,
    )

    frames = []
    for i in range(5):
        a = (
            (np.add.outer(np.arange(16) * 3, np.arange(16) * 5) + i * 40) % 256
        ).astype(np.uint8)
        frames.append(bytes(a.reshape(-1)))
    enc = avi_mjpeg_encode(frames, 16, 16, fps=10, quality=95)
    assert enc == avi_mjpeg_encode(frames, 16, 16, fps=10, quality=95)
    w, h, cs, dec = avi_mjpeg_decode(enc)
    assert (w, h, cs, len(dec)) == (16, 16, "mjpeg", 5)
    for d, f in zip(dec, frames):
        err = np.abs(
            np.frombuffer(d, dtype=np.uint8).astype(int)
            - np.frombuffer(f, dtype=np.uint8).astype(int)
        ).max()
        assert err <= 16
    with pytest.raises(ValueError, match="RIFF"):
        avi_mjpeg_decode(b"not avi")
    with pytest.raises(ValueError, match="truncated"):
        avi_mjpeg_decode(enc[:100])


def test_spark_sample_video_frames_mjpeg(spark):
    import pandas as pd

    from crypto_price_data_pipeline_spark.operators.mjpeg import (
        avi_mjpeg_encode,
    )
    from crypto_price_data_pipeline_spark.operators.multimodal import (
        sample_video_frames,
    )

    frames = [bytes([(i * 7 + j) % 256 for j in range(64)]) for i in range(6)]
    payload = bytearray(avi_mjpeg_encode(frames, 8, 8, quality=95))
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [payload, bytearray(b"bad")]})
    )
    rows = sample_video_frames(
        media, every_n=2, codec="mjpeg", on_error="skip"
    ).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 2, 4]
    assert all(r["media_id"] == 1 and (r["width"], r["height"]) == (8, 8) for r in rows)
    with pytest.raises(NotImplementedError, match="video codec"):
        sample_video_frames(media, codec="ffmpeg")
