"""Motion-JPEG AVI container codec (r13) — the compressed-VIDEO slot,
built on the pure-numpy baseline JPEG codec (operators/jpeg.py): each
frame is a real JPEG bitstream inside a real RIFF/AVI container
(hdrl with avih + strl/strh/strf, movi with 00dc chunks, idx1 index),
so the emitted files carry everything a standard AVI parser walks.

Scope (the PNG/JPEG/FLAC taxonomy): encoder writes grayscale MJPG
frames; decoder walks any AVI whose video chunks are baseline JPEGs
the jpeg module reads (00dc/00db chunks; other stream types are
skipped). Non-AVI bytes, truncated chunks and dimension disagreements
raise ValueError; compressed containers beyond MJPEG (mp4/webm/h264)
remain on the ``codec="ffmpeg"`` slot's NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import jpeg_decode, jpeg_encode


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def avi_mjpeg_encode(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
    quality: int = 95,
) -> bytes:
    """Encode grayscale luma planes (the y4m_encode frame convention:
    W·H bytes each) as an MJPEG AVI. Deterministic bytes."""
    for f in frames:
        if len(f) != width * height:
            raise ValueError(f"frame length {len(f)} != {width * height}")
    jpegs = [
        jpeg_encode(
            np.frombuffer(f, dtype=np.uint8).reshape(height, width), quality
        )
        for f in frames
    ]
    max_size = max((len(j) for j in jpegs), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        max_size * fps,  # dwMaxBytesPerSec
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        len(jpegs),  # total frames
        0,
        1,  # one stream
        max_size,
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<10I4H", 0, 0, 0, 1, fps, 0, len(jpegs), max_size,
                      0xFFFFFFFF, 0, 0, 0, width & 0xFFFF, height & 0xFFFF)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for j in jpegs:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", movi_body)
    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, ln)
        for off, ln in zip(offsets, (len(j) for j in jpegs))
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_mjpeg_decode(payload: bytes) -> tuple[int, int, str, list[bytes]]:
    """Decode an MJPEG AVI to (width, height, "mjpeg", luma_planes) —
    the y4m_decode return convention, so frame-sampling operators
    consume both containers identically. Color JPEG frames are
    luma-extracted via the standard Y transform of the packed RGB."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI header")

    frames: list[bytes] = []
    width = height = None

    def walk(buf: bytes) -> None:
        nonlocal width, height
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos:pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            body = buf[pos + 8:pos + 8 + ln]
            if len(body) != ln:
                raise ValueError("AVI chunk truncated")
            if tag == b"LIST":
                walk(body[4:])
            elif tag[2:4] in (b"dc", b"db") and body[:2] == b"\xff\xd8":
                w, h, px = jpeg_decode(body)
                if width is None:
                    width, height = w, h
                elif (w, h) != (width, height):
                    raise ValueError("AVI frame dimensions disagree")
                a = np.asarray(px, dtype=np.int64)
                if a.size and int(a.max()) > 255:  # packed RGB -> luma
                    r = (a >> 16) & 255
                    g = (a >> 8) & 255
                    b = a & 255
                    a = np.clip(
                        np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255
                    ).astype(np.int64)
                frames.append(bytes(a.astype(np.uint8).reshape(-1)))
            pos += 8 + ln + (ln % 2)

    walk(payload[12:])
    if width is None:
        raise ValueError("AVI contains no decodable MJPEG frames")
    return width, height, "mjpeg", frames
