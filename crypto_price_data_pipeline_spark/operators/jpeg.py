"""Baseline sequential JPEG codec in pure numpy — the compressed-image
slot (r13) that previously raised NotImplementedError for lack of PIL.

Scope (documented, like the PNG codec's corners): BASELINE sequential
DCT (SOF0), 8-bit, grayscale or YCbCr 4:4:4 — the encoder emits
exactly this profile, and the decoder additionally reads any
baseline file whose components are unsubsampled (sampling factors
1×1), with Huffman tables taken from the file's own DHT segments (a
generic canonical-Huffman reader, so Annex-K-coded files decode too).
Progressive (SOF2), arithmetic coding, subsampled chroma and restart
markers raise NotImplementedError — the remaining full-codec surface
stays on the ``pil`` slot.

Design notes:
- The encoder carries its OWN canonical Huffman tables in DHT
  (single-length code sets: 12 DC categories at 5 bits, 162 AC
  symbols at 9 bits). Any valid prefix code is legal JPEG — the
  tables ride in the file — so correctness never depends on
  reproducing the Annex K constants; compression ratio is the only
  casualty, which these operators do not measure.
- Quantization uses the Annex K example matrices scaled by the
  libjpeg quality rule — the piece that IS worth standard parity,
  since it fixes the loss profile the roundtrip tests bound.
- DCT/IDCT are float64 orthonormal matrix products (numpy), exact to
  rounding; the roundtrip error bound in tests comes from
  quantization, not the transform.

Return convention matches ``multimodal.png_decode``:
(width, height, pixels[row][col]) with gray values for 1-component
images and packed 0xRRGGBB for color.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K example quantization matrices (the standard loss profile)
_Q_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_Q_CHR = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _zigzag() -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()
        out.extend(diag)
    return out


_ZZ = _zigzag()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int64)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    a = np.sqrt(0.25) * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    a[0, :] = np.sqrt(0.125)
    return a


_DCT = _dct_matrix()

# --- our canonical Huffman tables (carried in DHT; see module doc) --
_DC_SYMBOLS = list(range(12))  # categories 0..11, all 5-bit codes
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]  # EOB, ZRL, then (run,size) — all 9-bit codes


def _canonical_codes(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    return {sym: (i, length) for i, sym in enumerate(symbols)}


_DC_CODES = _canonical_codes(_DC_SYMBOLS, 5)
_AC_CODES = _canonical_codes(_AC_SYMBOLS, 9)


def _dht_payload(table_class: int, table_id: int, symbols: list[int], length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bytes([table_class << 4 | table_id] + bits + symbols)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                b = self._acc
                self.out.append(b)
                if b == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        while self._n:
            self.write(1, 1)  # pad with 1s (the all-ones code is unused)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, bits) of JPEG magnitude coding; negatives in one's
    complement of their absolute value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    qtbl: np.ndarray,
    dc_pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    coef = _DCT @ (block - 128.0) @ _DCT.T
    quant = np.round(coef / qtbl).astype(np.int64)
    zz = quant[_ZZ_ROWS, _ZZ_COLS]
    dc = int(zz[0])
    size, bits = _magnitude(dc - dc_pred)
    code, nlen = dc_codes[size]
    w.write(code, nlen)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, nlen = ac_codes[0xF0]
            w.write(code, nlen)
            run -= 16
        size, bits = _magnitude(v)
        code, nlen = ac_codes[(run << 4) | size]
        w.write(code, nlen)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        code, nlen = ac_codes[0x00]
        w.write(code, nlen)
    return dc


def _pad_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def jpeg_encode(arr, quality: int = 90) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array (or
    nested lists) as a baseline sequential JFIF JPEG. Deterministic:
    same input + quality → identical bytes."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        planes = [a]
        comp_q = [0]
    elif a.ndim == 3 and a.shape[2] == 3:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)]
        comp_q = [0, 1, 1]
    else:
        raise ValueError("jpeg_encode expects (h,w) gray or (h,w,3) RGB")
    h, w = planes[0].shape
    qtbls = [_quality_scale(_Q_LUM, quality), _quality_scale(_Q_CHR, quality)]
    padded = [_pad_blocks(p) for p in planes]
    rows, cols = padded[0].shape[0] // 8, padded[0].shape[1] // 8

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qtbls[: max(comp_q) + 1]):
        zzq = qt[_ZZ_ROWS, _ZZ_COLS]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(v) for v in zzq
        )
    nf = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for ci in range(nf):
        out += bytes([ci + 1, 0x11, comp_q[ci]])
    for cls, tid, syms, ln in (
        (0, 0, _DC_SYMBOLS, 5),
        (1, 0, _AC_SYMBOLS, 9),
        (0, 1, _DC_SYMBOLS, 5),
        (1, 1, _AC_SYMBOLS, 9),
    ):
        payload = _dht_payload(cls, tid, syms, ln)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nf, nf)
    for ci in range(nf):
        tbl = 0 if comp_q[ci] == 0 else 1
        out += bytes([ci + 1, tbl << 4 | tbl])
    out += b"\x00\x3f\x00"

    bw = _BitWriter()
    preds = [0] * nf
    for br in range(rows):
        for bc in range(cols):
            for ci in range(nf):
                block = padded[ci][br * 8:(br + 1) * 8, bc * 8:(bc + 1) * 8]
                preds[ci] = _encode_block(
                    bw, block, qtbls[comp_q[ci]].astype(np.float64),
                    preds[ci], _DC_CODES, _AC_CODES,
                )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_encode_gray(data: bytes, width: int, quality: int = 90) -> bytes:
    """png_encode_gray-shaped convenience: row-major gray bytes."""
    h = len(data) // width
    a = np.frombuffer(data[: h * width], dtype=np.uint8).reshape(h, width)
    return jpeg_encode(a, quality)


# ------------------------------------------------------------ decode


class _BitReader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.buf):
                raise ValueError("JPEG entropy stream truncated")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.buf):
                    raise ValueError("JPEG entropy stream truncated at FF")
                marker = self.buf[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_decoder(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol from a DHT's canonical description —
    generic, so files carrying Annex K tables decode the same as ours."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    it = iter(symbols)
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = next(it)
            code += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(val: int, size: int) -> int:
    if size == 0:
        return 0
    if val < (1 << (size - 1)):
        return val - (1 << size) + 1
    return val


def jpeg_decode(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Baseline-sequential JPEG decoder (see module doc for scope).
    Returns (width, height, pixels[row][col]) — gray values for
    1-component images, packed 0xRRGGBB for 3-component. Raises
    ValueError on non-JPEG bytes / corrupt streams and
    NotImplementedError for progressive, arithmetic, subsampled or
    restart-interval files."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtbl: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[tuple[int, int]] = []  # (id, qtbl_id)
    size_wh: tuple[int, int] | None = None
    scan: list[tuple[int, int, int]] = []  # (comp idx, dc tbl, ac tbl)
    data_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} unsupported (baseline "
                "sequential SOF0 only)"
            )
        if pos + 4 > len(payload):
            raise ValueError("JPEG truncated in marker header")
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                vals = np.frombuffer(body[off + 1:off + 65], dtype=np.uint8)
                t = np.zeros((8, 8), dtype=np.int64)
                t[_ZZ_ROWS, _ZZ_COLS] = vals
                qtbl[tq] = t
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1:off + 17])
                n = sum(bits)
                syms = list(body[off + 17:off + 17 + n])
                huff[(cls, tid)] = _build_decoder(bits, syms)
                off += 17 + n
        elif marker == 0xC0:  # SOF0
            _prec, h, w, nf = struct.unpack(">BHHB", body[:6])
            size_wh = (w, h)
            for ci in range(nf):
                cid, samp, tq = body[6 + 3 * ci:9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG components unsupported (4:4:4 / "
                        "grayscale only)"
                    )
                comps.append((cid, tq))
        elif marker == 0xDD:
            raise NotImplementedError("JPEG restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for si in range(ns):
                cid, tbls = body[1 + 2 * si:3 + 2 * si]
                idx = next(i for i, (c, _) in enumerate(comps) if c == cid)
                scan.append((idx, tbls >> 4, tbls & 0xF))
            data_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if size_wh is None or data_start is None:
        raise ValueError("JPEG missing SOF0/SOS")
    if len(scan) < len(comps):
        # A first SOS covering fewer components than the frame declares
        # is a multi-scan (non-interleaved) baseline file; decoding only
        # the first scan would silently leave the remaining planes zero.
        raise NotImplementedError(
            "multi-scan (non-interleaved) baseline JPEG unsupported"
        )
    w, h = size_wh
    # entropy data runs until the EOI marker
    end = payload.rfind(b"\xff\xd9")
    br = _BitReader(payload[data_start:end if end > data_start else len(payload)])
    rows, cols = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((rows * 8, cols * 8)) for _ in comps]
    preds = [0] * len(comps)
    for brow in range(rows):
        for bcol in range(cols):
            for ci, dct, act in scan:
                zz = np.zeros(64, dtype=np.int64)
                size = _read_symbol(br, huff[(0, dct)])
                preds[ci] += _extend(br.read_bits(size), size)
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = _read_symbol(br, huff[(1, act)])
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("JPEG AC index overflow")
                    zz[k] = _extend(br.read_bits(size), size)
                    k += 1
                coef = np.zeros((8, 8))
                coef[_ZZ_ROWS, _ZZ_COLS] = zz
                block = _DCT.T @ (coef * qtbl[comps[ci][1]]) @ _DCT + 128.0
                planes[ci][
                    brow * 8:(brow + 1) * 8, bcol * 8:(bcol + 1) * 8
                ] = block
    planes = [np.clip(np.round(p[:h, :w]), 0, 255).astype(np.int64) for p in planes]
    if len(planes) == 1:
        return w, h, [[int(v) for v in row] for row in planes[0]]
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG unsupported")
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = np.clip(np.round(y + 1.402 * (cr - 128.0)), 0, 255).astype(np.int64)
    g = np.clip(
        np.round(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)), 0, 255
    ).astype(np.int64)
    b = np.clip(np.round(y + 1.772 * (cb - 128.0)), 0, 255).astype(np.int64)
    packed = (r << 16) | (g << 8) | b
    return w, h, [[int(v) for v in row] for row in packed]
