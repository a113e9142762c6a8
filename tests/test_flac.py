"""Units for the pure-Python FLAC codec (operators/flac.py, r13):
lossless roundtrips across subframe modes (verbatim / rice-coded
fixed predictors), multi-frame and stereo streams, determinism,
compression sanity, the unsupported-corner taxonomy and the Spark
decode_audio path with per-row skip tolerance."""

from __future__ import annotations

import pytest

from crypto_price_data_pipeline_spark.operators.flac import (
    flac_decode,
    flac_encode_pcm16,
)


def _signal(n):
    return [((i * 193) % 95 + 32) * 257 - 16384 for i in range(n)]


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed2"])
def test_lossless_roundtrip_all_modes_multiframe(mode):
    samples = _signal(5000)  # > one 4096 block: multi-frame path
    enc = flac_encode_pcm16(samples, 16_000, 1, subframe=mode)
    assert flac_decode(enc) == (16_000, 1, samples)
    assert enc == flac_encode_pcm16(samples, 16_000, 1, subframe=mode)


def test_stereo_roundtrip_and_compression():
    st = []
    for i in range(1000):
        st += [i * 31 % 20000 - 10000, -(i * 17 % 15000) + 5000]
    enc = flac_encode_pcm16(st, 44_100, 2, subframe="fixed2")
    assert flac_decode(enc) == (44_100, 2, st)
    raw = flac_encode_pcm16(st, 44_100, 2, subframe="verbatim")
    # the rice-coded fixed predictor must actually compress this
    assert len(enc) < len(raw)


def test_unsupported_corner_taxonomy():
    enc = flac_encode_pcm16(_signal(300), 16_000, 1)
    with pytest.raises(ValueError, match="bad magic"):
        flac_decode(b"not flac")
    corrupted = bytearray(enc)
    corrupted[-3] ^= 0xFF  # flip a frame byte -> CRC-16 must catch it
    with pytest.raises(ValueError, match="CRC"):
        flac_decode(bytes(corrupted))
    with pytest.raises(ValueError):
        flac_decode(enc[: len(enc) - 7])  # truncated


def test_spark_decode_audio_flac_path_and_skip(spark):
    import pandas as pd

    from crypto_price_data_pipeline_spark.operators.multimodal import (
        decode_audio,
    )

    clips = {i: _signal(128 + i) for i in range(3)}
    rows = [
        (i, bytearray(flac_encode_pcm16(s, 16_000, 1))) for i, s in clips.items()
    ]
    rows.append((99, bytearray(b"corrupt")))
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [r[0] for r in rows], "payload": [r[1] for r in rows]}
        )
    )
    got = {
        r["media_id"]: r
        for r in decode_audio(media, codec="flac", on_error="skip").collect()
    }
    assert set(got) == set(clips)
    for i, s in clips.items():
        r = got[i]
        assert (r["sample_rate"], r["n_channels"]) == (16_000, 1)
        assert list(r["samples"]) == s
    with pytest.raises(Exception):
        decode_audio(media, codec="flac", on_error="raise").collect()
    with pytest.raises(NotImplementedError, match="codec"):
        decode_audio(media, codec="mp3")
