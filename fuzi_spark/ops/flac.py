"""FLAC audio decode + fixture encode in pure stdlib + numpy — no
audio library.

Closes the largest remaining non-WAV audio fake (ops/multimodal.py
module note): web corpora carry FLAC alongside WAV, and every audio
operator downstream (spectrograms, landmark fingerprints, feature
stats) consumes PCM — this module turns a FLAC stream into the same
(rate, channels, bits, n_frames, pcm_bytes) tuple `parse_wav`
produces, so the whole audio surface works on FLAC unchanged via the
`parse_audio` dispatch.

Decoder envelope (the full lossless core of the format spec):
- STREAMINFO metadata walk (other blocks skipped by length);
- frame headers: sync, UTF-8-coded frame index, all block-size and
  sample-rate encodings (inline 8/16-bit, table codes, STREAMINFO
  fallback), CRC bytes consumed;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients, signed shift), wasted-bits unary prefix;
- residuals: rice (4-bit) and rice2 (5-bit) methods, partition
  orders, escape-coded raw partitions, zigzag;
- stereo decorrelation: independent, left/side, right/side, mid/side
  (side channel decoded at bps+1 per spec).
Output is ALWAYS 16-bit signed little-endian interleaved PCM (smaller
sample widths scale up, larger shift down) — one convention for every
downstream consumer. Corrupt/truncated/non-FLAC bytes → None, never
raises (same totality contract as the image codecs).

The encoder exists for fixtures and synthetic corpora: spec-legal
streams (real CRC-8/CRC-16, real STREAMINFO MD5) with selectable
subframe strategies — verbatim, constant, fixed order 2 with
rice-coded residuals, a simple quantized-LPC mode, and mid/side or
left/side stereo — so every decoder path is exercised by round-trip
differentials against the known PCM (tests/test_ops.py::TestFlac).

Scale note: the bit-level walk is Python per sample (sequential data
dependence, same caveat as the PNG unfilter); fine for clip-sized
audio inside an Arrow batch — a corpus that ships libsndfile takes
over at the same seam.

Reference parity note: the reference (kylehughes/Fuzi) has no media
surface — pipeline-brief scope (multimodal training data).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

import numpy as np

# ---------------------------------------------------------------- CRCs

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 \
            else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)
del _b, _c


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TABLE[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ----------------------------------------------------------- bit reader


class _Bits:
    """MSB-first bit reader. IndexError past the end — the decoder's
    single corrupt-stream signal, caught at the top level."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        end = p + n
        if end > len(self.data) * 8:
            raise IndexError("flac bitstream exhausted")
        first, last = p >> 3, (end - 1) >> 3
        chunk = int.from_bytes(self.data[first:last + 1], "big")
        chunk >>= (last + 1) * 8 - end
        self.pos = end
        return chunk & ((1 << n) - 1)

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        data, p = self.data, self.pos
        total = len(data) * 8
        q = 0
        while True:
            if p >= total:
                raise IndexError("flac bitstream exhausted")
            byte = data[p >> 3]
            rem = 8 - (p & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                q += rem
                p += rem
                continue
            lead = rem - window.bit_length()
            q += lead
            p += lead + 1
            self.pos = p
            return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ------------------------------------------------------------ decoding

_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
# frame sample-rate codes 1-11 name fixed table rates; this decoder
# consumes their (zero) extra bits and reports the STREAMINFO rate,
# which the spec requires to agree for non-streamed files
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_coded(bits: _Bits) -> int:
    """The frame-number coding (UTF-8-like, up to 36 bits)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n_extra = 0
    mask = 0x40
    while b0 & mask:
        n_extra += 1
        mask >>= 1
    if n_extra < 1 or n_extra > 6:
        raise IndexError("bad utf8-coded number")
    v = b0 & (mask - 1)
    for _ in range(n_extra):
        b = bits.read(8)
        if (b & 0xC0) != 0x80:
            raise IndexError("bad utf8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residuals(bits: _Bits, blocksize: int, order: int) -> list:
    method = bits.read(2)
    if method > 1:
        raise IndexError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = bits.read(4)
    n_part = 1 << po
    if blocksize % n_part:
        # spec: partition sizes must divide the block evenly; the
        # first partition additionally loses `order` samples (n < 0
        # raises below)
        raise IndexError("bad partition order")
    out = []
    for part in range(n_part):
        n = blocksize // n_part - (order if part == 0 else 0)
        if n < 0:
            raise IndexError("bad partition geometry")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                for _ in range(n):
                    out.append(bits.signed(raw))
        else:
            for _ in range(n):
                q = bits.unary()
                r = bits.read(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> list:
    if bits.read(1):
        raise IndexError("subframe pad bit set")
    t = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise IndexError("wasted bits exceed bps")
    if t == 0:  # CONSTANT
        v = bits.signed(eff)
        out = [v] * blocksize
    elif t == 1:  # VERBATIM
        out = [bits.signed(eff) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED
        order = t & 7
        if order > 4 or order > blocksize:
            raise IndexError("bad fixed order")
        out = [bits.signed(eff) for _ in range(order)]
        res = _read_residuals(bits, blocksize, order)
        coef = _FIXED_COEF[order]
        for r in res:
            pred = 0
            for j, c in enumerate(coef):
                pred += c * out[-1 - j]
            out.append(r + pred)
    elif t >= 32:  # LPC
        order = (t & 31) + 1
        if order > blocksize:
            raise IndexError("bad lpc order")
        out = [bits.signed(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise IndexError("invalid lpc precision")
        shift = bits.signed(5)
        if shift < 0:
            raise IndexError("negative lpc shift")
        coef = [bits.signed(prec) for _ in range(order)]
        res = _read_residuals(bits, blocksize, order)
        for r in res:
            acc = 0
            for j in range(order):
                acc += coef[j] * out[-1 - j]
            out.append(r + (acc >> shift))
    else:
        raise IndexError("reserved subframe type")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(content) -> Optional[tuple]:
    """FLAC bytes → (sample_rate, n_channels, 16, n_frames,
    pcm_int16_le_bytes) — the parse_wav return contract, PCM always
    16-bit signed little-endian interleaved. None for non-FLAC or
    corrupt streams; never raises."""
    try:
        return _decode_flac(bytes(content))
    except Exception:
        return None


def _decode_flac(b: bytes) -> Optional[tuple]:
    if len(b) < 42 or b[:4] != b"fLaC":
        return None
    pos = 4
    streaminfo = None
    while pos + 4 <= len(b):
        hdr = b[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        ln = int.from_bytes(b[pos + 1:pos + 4], "big")
        body = b[pos + 4:pos + 4 + ln]
        if len(body) < ln:
            return None
        if btype == 0:
            if ln < 34:
                return None
            streaminfo = body
        pos += 4 + ln
        if last:
            break
    if streaminfo is None:
        return None
    si = _Bits(streaminfo)
    si.read(16)  # min block
    si.read(16)  # max block
    si.read(24)  # min frame
    si.read(24)  # max frame
    rate = si.read(20)
    n_ch = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    if rate == 0 or n_ch < 1 or n_ch > 8:
        return None

    channels_out = [[] for _ in range(n_ch)]
    bits = _Bits(b, pos * 8)
    n_total_bits = len(b) * 8

    def _one_frame() -> list:
        """Decode one frame's channel lists. Raises ValueError on any
        structurally invalid header field and lets the helpers'
        IndexError propagate on bitstream exhaustion — the caller
        treats EITHER as end-of-stream once >= 1 good frame exists
        (trailing junk can alias the 14-bit sync and then die
        mid-frame; that must not discard already-decoded audio)."""
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad sync")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_coded(bits)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 1:
            blocksize = 192
        elif 2 <= bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample-rate code")
        fbps = bps if ss_code == 0 else _BPS_CODES.get(ss_code)
        if fbps is None:
            raise ValueError("reserved sample-size code")
        bits.read(8)  # header CRC (consumed, not verified — tolerant)

        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise ValueError("channel count mismatch")
            subs = [
                _decode_subframe(bits, blocksize, fbps)
                for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("stereo decorrelation on non-stereo")
            if ch_code == 8:  # left/side
                left = _decode_subframe(bits, blocksize, fbps)
                side = _decode_subframe(bits, blocksize, fbps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(bits, blocksize, fbps + 1)
                right = _decode_subframe(bits, blocksize, fbps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(bits, blocksize, fbps)
                side = _decode_subframe(bits, blocksize, fbps + 1)
                L, R = [], []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    L.append((m2 + s) >> 1)
                    R.append((m2 - s) >> 1)
                subs = [L, R]
        else:
            raise ValueError("reserved channel assignment")
        bits.align()
        bits.read(16)  # frame CRC (consumed)
        return subs

    while bits.pos + 32 <= n_total_bits:
        try:
            subs = _one_frame()
        except (ValueError, IndexError):
            if channels_out[0]:
                break  # trailing junk after >= 1 good frame: tolerate
            return None
        for c in range(n_ch):
            channels_out[c].extend(subs[c])
        if total and len(channels_out[0]) >= total:
            break

    n_frames = len(channels_out[0])
    if n_frames == 0:
        return None
    if total:
        n_frames = min(n_frames, total)
    arr = np.empty((n_frames, n_ch), dtype=np.int64)
    for c in range(n_ch):
        arr[:, c] = channels_out[c][:n_frames]
    # normalize to 16-bit signed
    if bps < 16:
        arr = arr << (16 - bps)
    elif bps > 16:
        arr = arr >> (bps - 16)
    pcm = arr.astype("<i2").tobytes()
    return int(rate), int(n_ch), 16, int(n_frames), pcm


# ------------------------------------------------------------ encoding


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _utf8_code(w: _BitW, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    seqs = [(0xC0, 11), (0xE0, 16), (0xF0, 21), (0xF8, 26), (0xFC, 31)]
    for lead, cap in seqs:
        if v < (1 << cap):
            n_extra = seqs.index((lead, cap)) + 1
            w.write(lead | (v >> (6 * n_extra)), 8)
            for k in range(n_extra - 1, -1, -1):
                w.write(0x80 | ((v >> (6 * k)) & 0x3F), 8)
            return
    raise ValueError("frame number too large")


def _write_residuals(w: _BitW, res: list, force_escape: bool) -> None:
    """Single-partition rice (method 0). Param chosen from the mean
    magnitude; escape-coded raw when forced or when rice would blow
    past 30 bits per sample."""
    w.write(0, 2)  # rice method, 4-bit params
    w.write(0, 4)  # partition order 0
    zz = [((r << 1) if r >= 0 else (((-r) << 1) - 1)) for r in
          [int(x) for x in res]]
    maxbits = max((v.bit_length() for v in zz), default=0)
    if force_escape or maxbits > 28:
        width = max(2, maxbits + 1)
        if width > 31:
            raise ValueError("residual too wide")
        w.write(0xF, 4)  # escape
        w.write(width, 5)
        for r in res:
            w.write(int(r) & ((1 << width) - 1), width)
        return
    mean = (sum(zz) // max(1, len(zz))) if zz else 0
    param = max(0, mean.bit_length() - 1)
    param = min(param, 14)
    w.write(param, 4)
    for v in zz:
        q = v >> param
        w.unary(q)
        if param:
            w.write(v & ((1 << param) - 1), param)


def _write_subframe(
    w: _BitW, samples, bps: int, mode: str, force_escape: bool,
    wasted: int = 0,
) -> None:
    s = [int(x) for x in samples]
    if wasted:
        if mode not in ("constant", "verbatim"):
            raise ValueError(
                "encoder emits wasted bits for constant/verbatim only"
            )
        if any(v & ((1 << wasted) - 1) for v in s):
            raise ValueError(
                "wasted_bits requires samples divisible by 2^k"
            )
        s = [v >> wasted for v in s]
        bps_eff = bps - wasted
    else:
        bps_eff = bps

    def flags():
        # wasted-bits flag + unary count (k-1 zeros then a 1)
        if wasted:
            w.write(1, 1)
            w.write(1, wasted)
        else:
            w.write(0, 1)

    if mode == "constant" and len(set(s)) == 1:
        w.write(0, 1)
        w.write(0, 6)
        flags()
        w.write(s[0] & ((1 << bps_eff) - 1), bps_eff)
        return
    if mode == "verbatim" or len(s) <= 2:
        w.write(0, 1)
        w.write(1, 6)
        flags()
        for v in s:
            w.write(v & ((1 << bps_eff) - 1), bps_eff)
        return
    bps = bps_eff
    if mode == "lpc":
        order, prec, shift = 2, 12, 9
        coef = [3 << (shift - 1), -(1 << (shift - 1))]  # 1.5, -0.5
        w.write(0, 1)
        w.write(32 | (order - 1), 6)
        w.write(0, 1)
        for v in s[:order]:
            w.write(v & ((1 << bps) - 1), bps)
        w.write(prec - 1, 4)
        w.write(shift & 31, 5)
        for c in coef:
            w.write(c & ((1 << prec) - 1), prec)
        res = []
        for i in range(order, len(s)):
            acc = coef[0] * s[i - 1] + coef[1] * s[i - 2]
            res.append(s[i] - (acc >> shift))
        _write_residuals(w, res, force_escape)
        return
    # fixed order 2
    order = 2
    w.write(0, 1)
    w.write(8 | order, 6)
    w.write(0, 1)
    for v in s[:order]:
        w.write(v & ((1 << bps) - 1), bps)
    res = [
        s[i] - (2 * s[i - 1] - s[i - 2]) for i in range(order, len(s))
    ]
    _write_residuals(w, res, force_escape)


def encode_flac(
    pcm: np.ndarray,
    rate: int = 16000,
    mode: str = "fixed",
    stereo: str = "independent",
    block_size: int = 4096,
    force_escape: bool = False,
    wasted_bits: int = 0,
) -> bytes:
    """Encode (n, ch) int16 samples as a spec-legal FLAC stream (real
    CRC-8/CRC-16, real STREAMINFO MD5). mode ∈ {verbatim, constant,
    fixed, lpc}; stereo ∈ {independent, mid_side, left_side} (2-ch
    only); force_escape rice-escapes every residual partition;
    wasted_bits k emits the wasted-bits unary prefix (constant/
    verbatim modes, samples must be divisible by 2^k) — each knob
    exists to pin one decoder path."""
    pcm = np.asarray(pcm, dtype=np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    if n == 0 or ch < 1 or ch > 8:
        raise ValueError("bad shape")
    if stereo != "independent" and ch != 2:
        raise ValueError("stereo modes need 2 channels")
    bps = 16
    md5 = hashlib.md5(
        pcm.astype("<i2").tobytes()
    ).digest()

    si = _BitW()
    si.write(min(block_size, n), 16)
    si.write(min(block_size, n) if n <= block_size else block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    head = (
        b"fLaC"
        + bytes([0x80]) + (34).to_bytes(3, "big")
        + bytes(si.out) + md5
    )

    out = bytearray(head)
    frame_i = 0
    for start in range(0, n, block_size):
        blk = pcm[start:start + block_size]
        bs = blk.shape[0]
        w = _BitW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # 16-bit block size at end
        w.write(0, 4)  # rate from STREAMINFO
        if stereo == "left_side":
            w.write(8, 4)
        elif stereo == "mid_side":
            w.write(10, 4)
        else:
            w.write(ch - 1, 4)
        w.write(4, 3)  # 16 bps
        w.write(0, 1)
        _utf8_code(w, frame_i)
        w.write(bs - 1, 16)
        w.align()
        hdr = bytes(w.out)
        w.write(_crc8(hdr), 8)

        if stereo == "left_side":
            L = blk[:, 0]
            side = blk[:, 0] - blk[:, 1]
            _write_subframe(w, L, bps, mode, force_escape)
            _write_subframe(w, side, bps + 1, mode, force_escape)
        elif stereo == "mid_side":
            L, R = blk[:, 0], blk[:, 1]
            side = L - R
            mid = (L + R) >> 1
            _write_subframe(w, mid, bps, mode, force_escape)
            _write_subframe(w, side, bps + 1, mode, force_escape)
        else:
            for c in range(ch):
                _write_subframe(
                    w, blk[:, c], bps, mode, force_escape,
                    wasted=wasted_bits,
                )
        w.align()
        body = bytes(w.out)
        w.write(_crc16(body), 16)
        out += bytes(w.out)
        frame_i += 1
    return bytes(out)
