"""Minimal FLAC codec in pure Python — the compressed-audio slot
(r13) that previously raised NotImplementedError for lack of an audio
library. FLAC is LOSSLESS, so unlike the JPEG slot the roundtrip is
value-exact and the registry query oracles it the q_wav_decode way
(decode(encode(x)) == x per clip).

Scope (documented corners, the PNG/JPEG taxonomy):
- Encoder: 16-bit PCM, mono or independent stereo, fixed 4096-sample
  blocking; subframes are VERBATIM (raw) or FIXED order-0/2 with
  rice-coded residuals — every emitted stream is spec-valid FLAC a
  real decoder reads (headers, UTF-8 frame numbers, CRC-8/CRC-16 all
  real).
- Decoder: STREAMINFO + frames with CONSTANT / VERBATIM / FIXED
  (orders 0-4, rice methods 0 and 1, any partition order, escape
  codes, wasted bits) subframes, independent channels, any bps ≤ 32.
  LPC subframes, mid/side stereo and variable blocking raise
  NotImplementedError (the full-codec ``codec="libsndfile"`` slot);
  bad magic / bad sync / CRC mismatches raise ValueError.
"""

from __future__ import annotations

import struct


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        value &= (1 << nbits) - 1 if nbits else 0
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                self._acc = 0
                self._n = 0

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self._n:
            self.write(0, 1)


class _BitReader:
    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos  # byte position
        self._bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("FLAC bitstream truncated")
        b = (self.buf[self.pos] >> (7 - self._bit)) & 1
        self._bit += 1
        if self._bit == 8:
            self._bit = 0
            self.pos += 1
        return b

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read_bit() == 0:
            q += 1
        return q

    def align(self) -> None:
        if self._bit:
            self._bit = 0
            self.pos += 1


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF | (n >> (6 * (nbytes - 1)))
    out.append(lead & 0xFF)
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad FLAC UTF-8 coded number")
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation")
        n = (n << 6) | (c & 0x3F)
    return n


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else ((-r) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if u % 2 == 0 else -((u + 1) >> 1)


_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def flac_encode_pcm16(
    samples: list[int],
    sample_rate: int = 16_000,
    n_channels: int = 1,
    subframe: str = "fixed2",
    block_size: int = 4096,
) -> bytes:
    """Encode interleaved int16 samples as a spec-valid FLAC stream.
    ``subframe``: "verbatim" (raw), "fixed0" or "fixed2" (rice-coded
    residuals under the order-0/2 fixed predictor — the compression
    path). Deterministic: same input → identical bytes."""
    if len(samples) % n_channels:
        raise ValueError("sample count must be a multiple of n_channels")
    if subframe not in ("verbatim", "fixed0", "fixed2"):
        raise ValueError(f"unknown subframe mode {subframe!r}")
    n_frames_total = len(samples) // n_channels
    chans = [samples[c::n_channels] for c in range(n_channels)]

    # STREAMINFO: min/max blocksize equal (fixed blocking); md5 0 = unset
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_channels - 1, 3)
    si.write(15, 5)  # bits per sample - 1
    si.write(n_frames_total, 36)
    streaminfo = bytes(si.out) + b"\x00" * 16
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo

    order = {"verbatim": None, "fixed0": 0, "fixed2": 2}[subframe]
    for fi, start in enumerate(range(0, n_frames_total, block_size)):
        n = min(block_size, n_frames_total - start)
        # header fields sum to exactly 32 bits -> byte aligned before
        # the UTF-8 coded frame number
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocking strategy
        w.write(0b0111, 4)  # blocksize: 16-bit at end of header
        w.write(0b0000, 4)  # sample rate: from STREAMINFO
        w.write(n_channels - 1, 4)  # independent channels
        w.write(0b100, 3)  # 16 bits per sample
        w.write(0, 1)  # reserved
        hdr = bytearray(w.out)
        hdr += _utf8_number(fi)
        hdr += struct.pack(">H", n - 1)  # 16-bit blocksize-1
        hdr.append(_crc8(bytes(hdr)))
        fw = _BitWriter()
        fw.out = bytearray(hdr)
        for ch in range(n_channels):
            x = chans[ch][start:start + n]
            fw.write(0, 1)  # subframe header pad bit
            if order is None or n <= order:
                fw.write(0b000001, 6)  # VERBATIM
                fw.write(0, 1)  # no wasted bits
                for v in x:
                    fw.write(v & 0xFFFF, 16)
                continue
            fw.write(0b001000 | order, 6)  # FIXED, given order
            fw.write(0, 1)
            for v in x[:order]:  # warmup
                fw.write(v & 0xFFFF, 16)
            coef = _FIXED_COEF[order]
            res = [
                x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coef))
                for i in range(order, n)
            ]
            # rice method 0, partition order 0, simple param choice
            mean = sum(abs(r) for r in res) // max(len(res), 1) + 1
            param = min(14, max(0, mean.bit_length()))
            fw.write(0b00, 2)  # rice, 4-bit params
            fw.write(0, 4)  # partition order 0
            fw.write(param, 4)
            for r in res:
                u = _zigzag(r)
                fw.write_unary(u >> param)
                if param:
                    fw.write(u & ((1 << param) - 1), param)
        fw.align()
        frame = bytes(fw.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def flac_decode(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a FLAC stream to (sample_rate, n_channels, interleaved
    samples) — the wav_decode return convention. See module doc for
    the supported surface; raises ValueError on corrupt streams and
    NotImplementedError for LPC / mid-side / variable blocking."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream: bad magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        head = payload[pos]
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1:pos + 4])
        body = payload[pos + 4:pos + 4 + blen]
        if head & 0x7F == 0:
            streaminfo = body
        pos += 4 + blen
        if head & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC missing STREAMINFO")
    br = _BitReader(streaminfo)
    br.read(16)
    br.read(16)
    br.read(24)
    br.read(24)
    sample_rate = br.read(20)
    n_channels = br.read(3) + 1
    bps = br.read(5) + 1
    total = br.read(36)

    out_ch: list[list[int]] = [[] for _ in range(n_channels)]
    br = _BitReader(payload, pos)
    while br.pos < len(payload):
        frame_start = br.pos
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("bad FLAC frame sync")
        br.read(1)
        if br.read(1) != 0:
            raise NotImplementedError("variable-blocksize FLAC unsupported")
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        if ch_code >= 8:
            raise NotImplementedError("mid/side FLAC stereo unsupported")
        if ch_code + 1 != n_channels:
            raise ValueError("frame channel count disagrees with STREAMINFO")
        _read_utf8_number(br)
        if bs_code == 0b0110:
            n = br.read(8) + 1
        elif bs_code == 0b0111:
            n = br.read(16) + 1
        elif bs_code == 0b0001:
            n = 192
        elif 0b0010 <= bs_code <= 0b0101:
            n = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            n = 256 << (bs_code - 8)
        else:
            raise ValueError(f"reserved FLAC blocksize code {bs_code}")
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid FLAC sample-rate code")
        hdr_crc = br.read(8)
        if _crc8(payload[frame_start:br.pos - 1]) != hdr_crc:
            raise ValueError("FLAC frame header CRC mismatch")
        fbps = {
            0b000: bps, 0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24,
        }.get(ss_code)
        if fbps is None:
            raise ValueError(f"reserved FLAC sample-size code {ss_code}")
        for ch in range(n_channels):
            if br.read(1) != 0:
                raise ValueError("bad FLAC subframe pad bit")
            st = br.read(6)
            wasted = 0
            if br.read(1):
                wasted = 1 + br.read_unary()
            eff = fbps - wasted
            if st == 0b000000:  # CONSTANT
                v = br.read_signed(eff)
                x = [v] * n
            elif st == 0b000001:  # VERBATIM
                x = [br.read_signed(eff) for _ in range(n)]
            elif 0b001000 <= st <= 0b001100:  # FIXED
                order = st & 0b111
                x = [br.read_signed(eff) for _ in range(order)]
                method = br.read(2)
                if method >= 2:
                    raise ValueError("reserved FLAC residual method")
                pbits = 4 if method == 0 else 5
                po = br.read(4)
                nparts = 1 << po
                coef = _FIXED_COEF[order]
                for p in range(nparts):
                    cnt = (n >> po) - (order if p == 0 else 0)
                    param = br.read(pbits)
                    if param == (1 << pbits) - 1:  # escape: raw bits
                        raw = br.read(5)
                        res = [br.read_signed(raw) if raw else 0 for _ in range(cnt)]
                    else:
                        res = []
                        for _ in range(cnt):
                            q = br.read_unary()
                            u = (q << param) | (br.read(param) if param else 0)
                            res.append(_unzigzag(u))
                    for r in res:
                        pred = sum(c * x[-1 - j] for j, c in enumerate(coef))
                        x.append(r + pred)
            elif st >= 0b100000:
                raise NotImplementedError("LPC FLAC subframes unsupported")
            else:
                raise ValueError(f"reserved FLAC subframe type {st:06b}")
            out_ch[ch].extend(v << wasted for v in x)
        br.align()
        crc = br.read(16)
        if _crc16(payload[frame_start:br.pos - 2]) != crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        if total and len(out_ch[0]) >= total:
            break
    samples: list[int] = []
    nmin = min(len(c) for c in out_ch)
    for i in range(nmin):
        for ch in range(n_channels):
            samples.append(out_ch[ch][i])
    return sample_rate, n_channels, samples
