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
- Hot paths are numpy-batched (r14): DCT/quant/zigzag run as ONE
  stacked matmul over all blocks of an image on both sides, entropy
  bits are packed/unstuffed in whole-stream numpy passes, and the
  Huffman scan walks a rolling int bit-buffer with 16-bit peeks
  (canonical mincode/maxcode rows) instead of per-bit dict lookups —
  ~4-6× per image, byte-identical output to the per-bit r13 codec.
  Only the run-length state machine stays serial per block; at 100 TB
  the same mapInPandas boundary swaps in a native codec unchanged.

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


def _magnitude(v: int) -> tuple[int, int]:
    """(size, bits) of JPEG magnitude coding; negatives in one's
    complement of their absolute value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _block_zigzag_quant(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """All 8×8 blocks of a padded plane → (nblocks, 64) quantized
    zigzag coefficients in (brow, bcol) order, one batched matmul —
    the per-block DCT/quant/zigzag loop, vectorized (r14)."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        - 128.0
    )
    coef = np.matmul(np.matmul(_DCT, blocks), _DCT.T)
    quant = np.round(coef / qtbl).astype(np.int64)
    return quant[:, _ZZ_ROWS, _ZZ_COLS]


def _tokenize_blocks(
    zz_by_comp: list[np.ndarray],
    dc_codes: dict,
    ac_codes: dict,
) -> tuple[list[int], list[int]]:
    """Huffman token stream (values, bit-lengths) for MCU-interleaved
    blocks — plain-int run-length coding per block (the serial part of
    entropy coding); the bit-level packing is numpy (:func:`_pack_bits`).
    ``zz_by_comp``: per-component (nblocks, 64) quantized zigzag rows."""
    nf = len(zz_by_comp)
    nb = zz_by_comp[0].shape[0]
    # last nonzero AC index per block, vectorized (0 if AC all-zero)
    lasts = []
    for zz in zz_by_comp:
        rev = zz[:, :0:-1] != 0  # AC 63..1 reversed
        lasts.append(
            np.where(rev.any(axis=1), 63 - np.argmax(rev, axis=1), 0).tolist()
        )
    zzl = [zz.tolist() for zz in zz_by_comp]
    eob_code, eob_len = ac_codes[0x00]
    zrl_code, zrl_len = ac_codes[0xF0]
    tvals: list[int] = []
    tbits: list[int] = []
    preds = [0] * nf
    for b in range(nb):
        for ci in range(nf):
            blk = zzl[ci][b]
            dc = blk[0]
            diff = dc - preds[ci]
            preds[ci] = dc
            size, bits = _magnitude(diff)
            code, nlen = dc_codes[size]
            tvals.append(code)
            tbits.append(nlen)
            if size:
                tvals.append(bits)
                tbits.append(size)
            run = 0
            last = lasts[ci][b]
            for i in range(1, last + 1):
                v = blk[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    tvals.append(zrl_code)
                    tbits.append(zrl_len)
                    run -= 16
                size, bits = _magnitude(v)
                code, nlen = ac_codes[(run << 4) | size]
                tvals.append(code)
                tbits.append(nlen)
                tvals.append(bits)
                tbits.append(size)
                run = 0
            if last < 63:
                tvals.append(eob_code)
                tbits.append(eob_len)
    return tvals, tbits


def _pack_bits(tvals: list[int], tbits: list[int]) -> bytes:
    """MSB-first bit-pack a token stream, pad with 1s to a byte
    boundary, stuff 0x00 after every 0xFF — byte-identical to the old
    per-bit writer, in three numpy passes (r14)."""
    va = np.asarray(tvals, dtype=np.int64)
    nb = np.asarray(tbits, dtype=np.int64)
    total = int(nb.sum())
    if total == 0:
        return b""
    starts = np.cumsum(nb) - nb
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, nb)
    shifts = np.repeat(nb, nb) - 1 - within
    bits = ((np.repeat(va, nb) >> shifts) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
    by = np.packbits(bits)
    ff = np.flatnonzero(by == 0xFF)
    if ff.size:
        by = np.insert(by, ff + 1, 0)
    return by.tobytes()


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

    zz_by_comp = [
        _block_zigzag_quant(padded[ci], qtbls[comp_q[ci]].astype(np.float64))
        for ci in range(nf)
    ]
    tvals, tbits = _tokenize_blocks(zz_by_comp, _DC_CODES, _AC_CODES)
    out += _pack_bits(tvals, tbits)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_encode_gray(data: bytes, width: int, quality: int = 90) -> bytes:
    """png_encode_gray-shaped convenience: row-major gray bytes."""
    h = len(data) // width
    a = np.frombuffer(data[: h * width], dtype=np.uint8).reshape(h, width)
    return jpeg_encode(a, quality)


# ------------------------------------------------------------ decode


def _build_decoder(
    bits: list[int], symbols: list[int]
) -> tuple[list[tuple[int, int, int, int]], list[int]]:
    """Canonical-Huffman decode tables from a DHT description —
    generic, so files carrying Annex K tables decode the same as ours.
    Returns (rows, vals): one row per PRESENT code length, ordered
    short→long, as (length, mincode, maxcode, valptr) — the classic
    mincode/maxcode walk, driven by a 16-bit peek instead of per-bit
    reads (r14)."""
    rows: list[tuple[int, int, int, int]] = []
    code = 0
    k = 0
    for ln in range(1, 17):
        n = bits[ln - 1]
        if n:
            rows.append((ln, code, code + n - 1, k))
            code += n
            k += n
        code <<= 1
    return rows, list(symbols)


def _unstuff(ent: bytes) -> bytes:
    """Remove the 0x00 stuffed after every 0xFF entropy byte (numpy
    pass); any 0xFF followed by a non-zero is a stray marker and any
    trailing bare 0xFF is a truncation — same taxonomy as the old
    per-byte reader, with one documented tightening: validation covers
    the WHOLE segment up front, so junk bytes between the last
    consumed bit and EOI that the old lazy bit-reader never touched
    now also raise. A well-formed encoder never emits such bytes; the
    stricter contract trades tolerance of that malformation for the
    single-pass numpy unstuff."""
    arr = np.frombuffer(ent, dtype=np.uint8)
    if arr.size and arr[-1] == 0xFF:
        raise ValueError("JPEG entropy stream truncated at FF")
    ffp = np.flatnonzero(arr[:-1] == 0xFF)
    if ffp.size == 0:
        return ent
    if (arr[ffp + 1] != 0).any():
        raise ValueError("unexpected marker inside entropy data")
    return np.delete(arr, ffp + 1).tobytes()


def _extend(val: int, size: int) -> int:
    if size == 0:
        return 0
    if val < (1 << (size - 1)):
        return val - (1 << size) + 1
    return val


def _decode_entropy(
    data: bytes,
    scan: list[tuple[int, int, int]],
    huff: dict[tuple[int, int], tuple],
    n_mcus: int,
    n_comps: int,
) -> np.ndarray:
    """Serial Huffman/RLE scan decode → (n_mcus·len(scan), 64) zigzag
    coefficient rows in MCU-interleaved order. The only per-bit state
    machine left in the codec: a rolling int bit-buffer with 16-bit
    peeks (≈10 int ops per symbol vs ≈10 per BIT for the old dict
    reader); dequant/IDCT happen batched in the caller (r14)."""
    real_bits = len(data) * 8
    buf = data + b"\x00" * 4  # peek pad; real_bits guards overreads
    tables = [(huff[(0, d)], huff[(1, a)]) for _, d, a in scan]
    comp_of = [ci for ci, _, _ in scan]
    preds = [0] * n_comps
    acc = 0
    nacc = 0
    p = 0
    used = 0
    rows_list: list[list[int]] = []
    for _ in range(n_mcus):
        for si in range(len(scan)):
            dct, act = tables[si]
            ci = comp_of[si]
            row = [0] * 64
            # ---- DC symbol
            while nacc < 16:
                acc = ((acc << 8) | buf[p]) & 0xFFFFFF
                p += 1
                nacc += 8
            peek = (acc >> (nacc - 16)) & 0xFFFF
            for ln, mincode, maxcode, valptr in dct[0]:
                c = peek >> (16 - ln)
                if c <= maxcode:
                    size = dct[1][valptr + c - mincode]
                    break
            else:
                raise ValueError("invalid Huffman code in JPEG stream")
            used += ln
            nacc -= ln
            if size:
                while nacc < size:
                    acc = ((acc << 8) | buf[p]) & 0xFFFFFF
                    p += 1
                    nacc += 8
                used += size
                preds[ci] += _extend((acc >> (nacc - size)) & ((1 << size) - 1), size)
                nacc -= size
            row[0] = preds[ci]
            # ---- AC symbols
            k = 1
            while k < 64:
                while nacc < 16:
                    acc = ((acc << 8) | buf[p]) & 0xFFFFFF
                    p += 1
                    nacc += 8
                peek = (acc >> (nacc - 16)) & 0xFFFF
                for ln, mincode, maxcode, valptr in act[0]:
                    c = peek >> (16 - ln)
                    if c <= maxcode:
                        sym = act[1][valptr + c - mincode]
                        break
                else:
                    raise ValueError("invalid Huffman code in JPEG stream")
                used += ln
                nacc -= ln
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise ValueError("JPEG AC index overflow")
                while nacc < size:
                    acc = ((acc << 8) | buf[p]) & 0xFFFFFF
                    p += 1
                    nacc += 8
                used += size
                row[k] = _extend((acc >> (nacc - size)) & ((1 << size) - 1), size)
                nacc -= size
                k += 1
            if used > real_bits:
                raise ValueError("JPEG entropy stream truncated")
            rows_list.append(row)
    return np.array(rows_list, dtype=np.int64).reshape(-1, 64)


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
    huff: dict[tuple[int, int], tuple] = {}
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
    if [ci for ci, _, _ in scan] != list(range(len(comps))):
        # T.81 B.2.3: scan components SHALL follow the frame-header
        # order. The batched dequant/plane assembly below indexes
        # blocks positionally by frame order; a reordered (or
        # duplicated) SOS list would silently swap planes and quant
        # tables, so refuse the non-conforming stream outright.
        raise ValueError(
            "JPEG SOS component order differs from SOF frame order "
            "(non-conforming baseline stream)"
        )
    w, h = size_wh
    # entropy data runs until the EOI marker
    end = payload.rfind(b"\xff\xd9")
    ent = _unstuff(
        payload[data_start:end if end > data_start else len(payload)]
    )
    rows, cols = (h + 7) // 8, (w + 7) // 8
    try:
        zz = _decode_entropy(ent, scan, huff, rows * cols, len(comps))
    except IndexError:
        raise ValueError("JPEG entropy stream truncated") from None
    # batched dequant + IDCT over ALL blocks (MCU-interleaved order),
    # then one transpose/reshape per plane — no per-block numpy calls
    nc = len(comps)
    qzz = np.stack(
        [qtbl[tq][_ZZ_ROWS, _ZZ_COLS] for _, tq in comps]
    )  # (nc, 64)
    comp_idx = np.tile(np.arange(nc), rows * cols)
    coef = np.zeros((zz.shape[0], 8, 8))
    coef[:, _ZZ_ROWS, _ZZ_COLS] = zz * qzz[comp_idx]
    blocks = np.matmul(np.matmul(_DCT.T, coef), _DCT) + 128.0
    grid = (
        blocks.reshape(rows, cols, nc, 8, 8)
        .transpose(2, 0, 3, 1, 4)
        .reshape(nc, rows * 8, cols * 8)
    )
    planes = [
        np.clip(np.round(grid[ci, :h, :w]), 0, 255).astype(np.int64)
        for ci in range(nc)
    ]
    if len(planes) == 1:
        return w, h, planes[0].tolist()
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG unsupported")
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = np.clip(np.round(y + 1.402 * (cr - 128.0)), 0, 255).astype(np.int64)
    g = np.clip(
        np.round(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)), 0, 255
    ).astype(np.int64)
    b = np.clip(np.round(y + 1.772 * (cb - 128.0)), 0, 255).astype(np.int64)
    packed = (r << 16) | (g << 8) | b
    return w, h, packed.tolist()
