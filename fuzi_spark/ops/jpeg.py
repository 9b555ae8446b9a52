"""JPEG (ITU-T T.81, huffman) decode + encode in pure stdlib + numpy —
no image library. Baseline sequential (SOF0/SOF1) AND progressive
(SOF2: spectral selection x successive approximation, T.81 Annex G —
the form most real web JPEGs ship in).

This closes the last multimodal pixel-codec stub: PNG and GIF pixel
decodes are already real (ops/multimodal.py); with this module JPEG
images and MJPEG video frames get real pixels too. The decoders read
what real encoders emit — arbitrary DQT/DHT tables, 4:4:4 / 4:2:2 /
4:2:0 subsampling, restart markers, 16-bit quant entries, multi-scan
progressive streams with EOB runs and refinement bits — and return
None for anything outside the envelope (arithmetic coding, lossless,
12-bit progressive) or for corrupt streams; callers treat None as
pixels-unavailable and keep the header-only path. 12-bit
extended-sequential (SOF1, precision 12) decodes for real as of
round 5 — JPEG streams self-describe their huffman tables in DHT, so
nothing there is a non-derivable constant; samples land on the uint8
output contract via the 255/4095 max-range scale. Arithmetic coding
stays out (the QM-coder state tables ARE non-derivable constants). A progressive
stream truncated after >= 1 complete scan decodes to the partial
image (what browsers render); decode_baseline keeps its historical
baseline-only contract (None on SOF2) — decode_jpeg is the full
entry.

The encoder exists to build test fixtures and synthetic corpora: it
emits spec-legal baseline interleaved scans with self-describing DHT
segments (simple canonical fixed-length tables — any decoder must read
the tables from the stream, so optimal huffman lengths buy nothing for
fixtures). At quality=100 every quant entry is 1, so a solid-gray
image round-trips BIT-EXACTLY (DC-only blocks, zero AC, no chroma
error) — which is what lets the SQL oracle predict decoded features
from the construction formula (see q_image_pixels).

Determinism: both directions are pure functions of their input bytes /
pixels. The IDCT/FDCT are the exact orthonormal DCT-II matrices in
float64 (T.81 Annex A defines the ideal transform; integer-DCT
implementations approximate it, we don't have to).

Scale note: entropy decoding walks the bitstream in Python (sequential
data dependence, same caveat as the PNG unfilter walk) — fine for
web-sized images inside an Arrow batch; a cluster image that ships
PIL/libjpeg takes over via the existing _have_pil gate in
ops/multimodal.py.

Reference parity note: the reference (kylehughes/Fuzi) has no media
surface (/root/reference/Sources is XML/HTML only) — this is
pipeline-brief scope (multimodal training-data preparation).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# zigzag scan order: ZIGZAG[i] = natural (row-major) index of the i-th
# coefficient in transmission order (T.81 Figure A.6).
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# T.81 Annex K.1 example quantization tables (the de-facto standard
# base tables every IJG-derived encoder scales by quality).
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: FDCT F = C @ B @ C.T,
    IDCT B = C.T @ F @ C."""
    x = np.arange(8, dtype=np.float64)
    u = x.reshape(-1, 1)
    c = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: q<50 → 5000/q %, else (200−2q) %; entries
    clamped to [1, 255]. quality=100 ⇒ all-ones (lossless-for-DC)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# --------------------------------------------------------------- decode


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (stuffing
    already removed). Raises IndexError past the end — the decoder's
    single corrupt-stream signal, caught at the top level."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > len(self.bits):
            raise IndexError("bitstream exhausted")
        self.pos = p + n
        v = 0
        for b in self.bits[p:p + n]:
            v = (v << 1) | int(b)
        return v

    def huff(self, table: dict) -> int:
        code = 0
        length = 0
        bits = self.bits
        p = self.pos
        n = len(bits)
        while length < 16:
            if p >= n:
                raise IndexError("bitstream exhausted")
            code = (code << 1) | int(bits[p])
            p += 1
            length += 1
            v = table.get((length, code))
            if v is not None:
                self.pos = p
                return v
        raise IndexError("invalid huffman code")


def _build_huff(bits: list, vals: bytes) -> dict:
    """Canonical huffman per T.81 C.2: {(length, code): value}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s-bit magnitude to signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_scan_at(buf: bytes, pos: int):
    """Entropy-coded data from pos: unstuff 0xFF00, split at RSTn,
    stop at any other marker. Returns (list of segments, position of
    the terminating marker's 0xFF — or len(buf) if none)."""
    segs = []
    cur = bytearray()
    n = len(buf)
    i = pos
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            i = n
            break
        m = buf[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        else:  # real marker: end of scan
            break
    segs.append(bytes(cur))
    return segs, i


def _split_scan(buf: bytes, pos: int):
    return _split_scan_at(buf, pos)[0]


def decode_baseline(content) -> Optional[np.ndarray]:
    """Decode a baseline (SOF0/SOF1, huffman) JPEG to an (h, w, c)
    uint8 array — c=3 RGB for color streams, c=1 for grayscale;
    12-bit (SOF1 precision 12) samples scale onto uint8 by 255/4095.
    None for progressive/arithmetic streams, missing tables, or
    corrupt/truncated entropy data. Never raises."""
    try:
        return _decode(bytes(content))
    except Exception:
        return None


def decode_jpeg(content) -> Optional[np.ndarray]:
    """Decode a baseline (SOF0/SOF1) OR progressive (SOF2) huffman
    JPEG — the full envelope real web encoders emit. Progressive
    streams accumulate coefficients across spectral-selection and
    successive-approximation scans (T.81 Annex G) and IDCT once at
    the end, so a fully-transmitted progressive re-encode of the same
    quantized coefficients decodes BIT-IDENTICALLY to its sequential
    sibling (pinned in tests). 12-bit sequential decodes (255/4095
    scale); None for arithmetic/lossless/12-bit-progressive streams
    or corrupt data. Never raises."""
    try:
        return _decode(bytes(content), allow_progressive=True)
    except Exception:
        return None


def _decode(
    buf: bytes, allow_progressive: bool = False
) -> Optional[np.ndarray]:
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        return None
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    dri = 0
    i = 2
    n = len(buf)
    while i + 4 <= n:
        if buf[i] != 0xFF:
            i += 1
            continue
        marker = buf[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            if frame is not None and frame.get("prog_scans"):
                return _prog_finalize(frame, qt)
            return None  # EOI before any decodable scan
        seglen = struct.unpack(">H", buf[i + 2:i + 4])[0]
        seg = buf[i + 4:i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[p:p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg[p:p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                if len(tbl) != 64:
                    return None
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # store in natural order
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                cnt = sum(bits)
                vals = seg[p + 17:p + 17 + cnt]
                if len(vals) != cnt:
                    return None
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(
                    bits, vals
                )
                p += 17 + cnt
        elif marker in (0xC0, 0xC1) or (
            marker == 0xC2 and allow_progressive
        ):  # SOF0 baseline / SOF1 ext seq / SOF2 progressive
            prec = seg[0]
            if prec not in (8, 12):
                return None
            if prec == 12 and marker == 0xC2:
                return None  # 12-bit progressive: out of envelope
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if h == 0 or w == 0 or ncomp not in (1, 3, 4):
                return None
            comps = []
            for k in range(ncomp):
                cid = seg[6 + 3 * k]
                hv = seg[7 + 3 * k]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15,
                     "tq": seg[8 + 3 * k]}
                )
            frame = {"h": h, "w": w, "comps": comps, "prec": prec}
            if marker == 0xC2:
                frame["progressive"] = True
                if not _prog_alloc(frame):
                    return None
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive (baseline entry) / lossless / arith
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            if frame.get("progressive"):
                end = _prog_scan(
                    buf, i + 2 + seglen, seg, frame, huff_dc, huff_ac,
                    dri,
                )
                if end is None:
                    return None
                i = end
                continue
            ns = seg[0]
            if ns != len(frame["comps"]):
                return None  # multi-scan not supported
            for k in range(ns):
                cid = seg[1 + 2 * k]
                td, ta = seg[2 + 2 * k] >> 4, seg[2 + 2 * k] & 15
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cid), None
                )
                if comp is None:
                    return None
                comp["td"], comp["ta"] = td, ta
            return _decode_scan(
                buf, i + 2 + seglen, frame, qt, huff_dc, huff_ac, dri
            )
        i += 2 + seglen
    if frame is not None and frame.get("prog_scans"):
        # truncated after at least one complete scan: decode what
        # arrived (the progressive contract real browsers honor)
        return _prog_finalize(frame, qt)
    return None


def _decode_scan(buf, pos, frame, qt, huff_dc, huff_ac, dri):
    h, w = frame["h"], frame["w"]
    prec = frame.get("prec", 8)
    half = float(1 << (prec - 1))       # level shift: 128 / 2048
    dc_cat_max = 11 if prec == 8 else 15
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0 or hmax > 4 or vmax > 4:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        if c["tq"] not in qt or c["td"] not in huff_dc \
                or c["ta"] not in huff_ac:
            return None
        c["qtab"] = qt[c["tq"]].astype(np.float64)
        c["dctab"] = huff_dc[c["td"]]
        c["actab"] = huff_ac[c["ta"]]
        c["plane"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        c["pred"] = 0

    segs = _split_scan(buf, pos)
    seg_i = 0
    reader = _BitReader(segs[0])
    n_mcu = mcux * mcuy
    coef = np.zeros(64, dtype=np.float64)
    for m in range(n_mcu):
        if dri and m and m % dri == 0:
            seg_i += 1
            if seg_i >= len(segs):
                return None  # truncated: missing restart segment
            reader = _BitReader(segs[seg_i])
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef[:] = 0.0
                    s = reader.huff(c["dctab"])
                    if s > dc_cat_max:
                        return None
                    diff = _extend(reader.read(s), s)
                    c["pred"] += diff
                    coef[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = reader.huff(c["actab"])
                        r, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            return None
                        coef[ZIGZAG[k]] = _extend(
                            reader.read(sz), sz
                        )
                        k += 1
                    block = (coef * c["qtab"]).reshape(8, 8)
                    px = _C.T @ block @ _C + half
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    c["plane"][y0:y0 + 8, x0:x0 + 8] = px

    planes = []
    # 12-bit samples (0..4095) map onto the uint8 output contract by
    # the max-range scale; 8-bit stays exact (scale == 1)
    scale = 255.0 / float((1 << prec) - 1)
    for c in comps:
        p = c["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.round(planes[0] * scale), 0, 255) \
            .astype(np.uint8)
        return g[:, :, None]
    if len(comps) == 4:
        return None  # CMYK out of envelope
    y, cb, cr = planes
    r = y + 1.402 * (cr - half)
    g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
    b = y + 1.772 * (cb - half)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb * scale), 0, 255).astype(np.uint8)


# ------------------------------------------------------- progressive


def _prog_alloc(frame) -> bool:
    """Allocate per-component zigzag-order coefficient grids sized to
    the interleaved MCU geometry (non-interleaved scans iterate the
    sub-grid of blocks that actually cover the component)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0 or hmax > 4 or vmax > 4:
        return False
    h, w = frame["h"], frame["w"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    frame.update(hmax=hmax, vmax=vmax, mcux=mcux, mcuy=mcuy)
    for c in comps:
        if c["h"] not in (1, 2, 3, 4) or c["v"] not in (1, 2, 3, 4):
            return False
        c["coef"] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
        )
        # non-interleaved block grid: blocks covering the component's
        # own sample grid (T.81 A.2.2), <= the interleaved grid
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        c["bw"] = -(-cw // 8)
        c["bh"] = -(-ch // 8)
        c["pred"] = 0
    frame["prog_scans"] = 0
    return True


def _refine_nonzero(reader, zz, k, p1):
    """One AC-refinement correction bit for an already-nonzero
    coefficient (T.81 G.1.2.3): a 1-bit appends p1 toward larger
    magnitude if that bit is not already set."""
    if reader.read(1) and (int(zz[k]) & p1) == 0:
        zz[k] += p1 if zz[k] > 0 else -p1


def _prog_scan(buf, pos, seg, frame, huff_dc, huff_ac, dri):
    """Decode one progressive scan (T.81 Annex G), updating the
    per-component coefficient grids in place. Returns the buffer
    position of the marker that ended the scan, or None on any
    contract violation."""
    comps = frame["comps"]
    ns = seg[0]
    if ns < 1 or len(seg) < 4 + 2 * ns:
        return None
    scomps = []
    for k in range(ns):
        cid = seg[1 + 2 * k]
        td, ta = seg[2 + 2 * k] >> 4, seg[2 + 2 * k] & 15
        comp = next((c for c in comps if c["id"] == cid), None)
        if comp is None:
            return None
        scomps.append((comp, td, ta))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
    if al > 13 or ah > 13 or (ah and ah != al + 1):
        return None
    segs, end = _split_scan_at(buf, pos)
    reader = _BitReader(segs[0])
    seg_i = 0

    if ss == 0:
        # DC scan: Se must be 0; interleaved over the scan's comps
        # (all components) or a single comp's own block grid
        if se != 0:
            return None
        tabs = {}
        if ah == 0:
            for comp, td, _ta in scomps:
                if td not in huff_dc:
                    return None
                tabs[comp["id"]] = huff_dc[td]
        for comp, _td, _ta in scomps:
            comp["pred"] = 0
        if ns > 1:
            if ns != len(comps):
                return None
            units = frame["mcux"] * frame["mcuy"]
        else:
            units = scomps[0][0]["bw"] * scomps[0][0]["bh"]
        for m in range(units):
            if dri and m and m % dri == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    return None
                reader = _BitReader(segs[seg_i])
                for comp, _td, _ta in scomps:
                    comp["pred"] = 0
            if ns > 1:
                my, mx = divmod(m, frame["mcux"])
                for comp, _td, _ta in scomps:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            _dc_unit(
                                reader, comp,
                                my * comp["v"] + by,
                                mx * comp["h"] + bx,
                                ah, al, tabs,
                            )
            else:
                comp = scomps[0][0]
                by, bx = divmod(m, comp["bw"])
                _dc_unit(reader, comp, by, bx, ah, al, tabs)
    else:
        # AC scan: exactly one component, band within 1..63
        if ns != 1 or not (1 <= ss <= se <= 63):
            return None
        comp, _td, ta = scomps[0]
        if ta not in huff_ac:
            return None
        actab = huff_ac[ta]
        p1 = 1 << al
        eobrun = 0
        for m in range(comp["bw"] * comp["bh"]):
            if dri and m and m % dri == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    return None
                reader = _BitReader(segs[seg_i])
                eobrun = 0
            by, bx = divmod(m, comp["bw"])
            zz = comp["coef"][by, bx]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.huff(actab)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read(r)
                        break
                    k += r
                    if k > se:
                        return None
                    zz[k] = _extend(reader.read(s), s) << al
                    k += 1
            else:
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.huff(actab)
                        r, s = rs >> 4, rs & 15
                        val = 0
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.read(r)
                                break
                            # r == 15 (ZRL): skip 16 zero-history slots
                        elif s == 1:
                            val = p1 if reader.read(1) else -p1
                        else:
                            return None
                        while k <= se:
                            if zz[k] != 0:
                                _refine_nonzero(reader, zz, k, p1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            zz[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if zz[k] != 0:
                            _refine_nonzero(reader, zz, k, p1)
                        k += 1
                    eobrun -= 1
    frame["prog_scans"] += 1
    return end


def _dc_unit(reader, comp, by, bx, ah, al, tabs):
    zz = comp["coef"][by, bx]
    if ah == 0:
        s = reader.huff(tabs[comp["id"]])
        if s > 11:
            raise IndexError("DC category out of range")
        diff = _extend(reader.read(s), s)
        comp["pred"] += diff
        zz[0] = comp["pred"] << al
    else:
        if reader.read(1):
            zz[0] = int(zz[0]) | (1 << al)


def _prog_finalize(frame, qt) -> Optional[np.ndarray]:
    """Dequantize + batch-IDCT the accumulated coefficient grids and
    assemble the image (same upsample/color path as the baseline
    decoder, vectorized over all blocks at once)."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            return None
        qtab = qt[c["tq"]].astype(np.float64)  # natural order
        zz = c["coef"].astype(np.float64)  # (by, bx, 64) zigzag
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz
        nby, nbx = nat.shape[0], nat.shape[1]
        blocks = (nat * qtab).reshape(nby, nbx, 8, 8)
        px = np.einsum(
            "ij,abjk,kl->abil", _C.T, blocks, _C, optimize=True
        ) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    if len(comps) == 4:
        return None  # CMYK out of envelope
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------- encode


class _BitWriter:
    """MSB-first bit writer with 0xFF→0xFF00 stuffing; flush pads the
    final byte with 1-bits (T.81 F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _enc_tables():
    """Fixture huffman tables (self-described in DHT, so any valid
    table works): DC = twelve 4-bit codes for categories 0–11; AC =
    162 8-bit codes for every (run, size) symbol. Canonical codes;
    the all-ones code of each length stays unused as T.81 C.2 wants."""
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = bytes(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_syms.sort()
    ac_bits = [0] * 16
    ac_bits[7] = 162
    ac_vals = bytes(ac_syms)
    return dc_bits, dc_vals, ac_bits, ac_vals


def _enc_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


def _csize(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(
    wr: _BitWriter, block: np.ndarray, qtab: np.ndarray,
    pred: int, dc_codes: dict, ac_codes: dict,
) -> int:
    f = _C @ (block - 128.0) @ _C.T
    q = np.round(f / qtab.reshape(8, 8)).astype(np.int64)
    zz = q.ravel()[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _csize(diff)
    code, ln = dc_codes[s]
    wr.write(code, ln)
    if s:
        wr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            wr.write(code, ln)
            run -= 16
        s = _csize(v)
        code, ln = ac_codes[(run << 4) | s]
        wr.write(code, ln)
        wr.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]
        wr.write(code, ln)
    return dc


def _enc_tables_prog():
    """Progressive fixture huffman tables: the baseline fixture AC
    table plus the EOBn symbols (r<<4 for r=1..14) progressive EOB
    runs need. 176 8-bit codes — the all-ones code stays unused."""
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = bytes(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ] + [r << 4 for r in range(1, 15)]
    ac_syms.sort()
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)
    return dc_bits, dc_vals, ac_bits, bytes(ac_syms)


def _to_coef_grids(arr: np.ndarray, quality: int, subsampling: str):
    """Color-convert, subsample, pad, FDCT and quantize — returning
    per-component ZIGZAG coefficient grids (by, bx, 64) int32 plus the
    geometry the scan emitters need. Mirrors encode_baseline's
    pipeline exactly (so a progressive stream built from these grids
    decodes bit-identically to the baseline encode of the same
    pixels)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad dimensions")
    if ch not in (1, 3):
        raise ValueError("grayscale or RGB only")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be 4:4:4 or 4:2:0")
    gray = ch == 1
    qy = scale_quant(QT_LUMA, quality)
    qc = scale_quant(QT_CHROMA, quality)
    sub = 2 if (not gray and subsampling == "4:2:0") else 1

    a = arr.astype(np.float64)
    if gray:
        planes = [a[:, :, 0]]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub == 2:
            cbp = _pad_edge(cb, 2)
            crp = _pad_edge(cr, 2)
            cb = cbp.reshape(
                cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            cr = crp.reshape(
                crp.shape[0] // 2, 2, crp.shape[1] // 2, 2
            ).mean(axis=(1, 3))
        planes = [y, cb, cr]

    mcu = 8 * sub
    planes[0] = _pad_edge(planes[0], mcu)
    for i in range(1, len(planes)):
        planes[i] = _pad_edge(planes[i], 8)
        need_h = planes[0].shape[0] // sub
        need_w = planes[0].shape[1] // sub
        p = planes[i]
        planes[i] = np.pad(
            p,
            ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])),
            mode="edge",
        )

    qtabs = [qy.astype(np.float64)] + (
        [] if gray else [qc.astype(np.float64)] * 2
    )
    grids = []
    for plane, qtab in zip(planes, qtabs):
        ph, pw = plane.shape
        by, bx = ph // 8, pw // 8
        blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        f = np.einsum(
            "ij,abjk,kl->abil", _C, blocks - 128.0, _C.T, optimize=True
        )
        q = np.round(f / qtab.reshape(8, 8)).astype(np.int32)
        nat = q.transpose(0, 1, 2, 3).reshape(by, bx, 64)
        grids.append(nat[:, :, ZIGZAG])
    return h, w, gray, sub, grids, qy, qc


class _EobState:
    """EOB-run accumulator for progressive AC scans: counts blocks,
    buffers the refinement correction bits the decoder will read for
    run blocks, and flushes as one EOBn symbol immediately followed by
    that run's correction bits (T.81 G.1.2.3: each EOBn's extra bits
    and the run's correction bits follow the symbol). The run is
    capped at 0x7FFF (libjpeg's EOBRUN cap) and flushed eagerly at the
    cap via bump(), so flush() never has to split a run across EOBn
    windows — a split would interleave windows and bits wrongly."""

    MAX_RUN = 0x7FFF

    def __init__(self, wr, ac_codes):
        self.wr = wr
        self.ac_codes = ac_codes
        self.count = 0
        self.bits: list = []

    def bump(self, corr=()) -> None:
        """Add one all-zero (post-point-transform) block to the run,
        with its refinement correction bits (if any)."""
        self.count += 1
        self.bits.extend(corr)
        if self.count >= self.MAX_RUN:
            self.flush()

    def flush(self) -> None:
        if not self.count:
            return
        r = self.count.bit_length() - 1
        code, ln = self.ac_codes[r << 4]
        self.wr.write(code, ln)
        if r:
            self.wr.write(self.count - (1 << r), r)
        self.count = 0
        for b in self.bits:
            self.wr.write(b, 1)
        self.bits = []


def encode_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    al: int = 1,
    band_splits: tuple = (5,),
    restart_interval: int = 0,
    scan_order: str = "comp",
) -> bytes:
    """Encode an (h, w[, 1|3]) uint8 array as a PROGRESSIVE (SOF2)
    huffman JPEG — spectral selection (DC scan, then AC bands split at
    `band_splits`) crossed with `al` successive-approximation levels
    (first scans at Al=al, then one refinement scan per level down to
    0). The emitted coefficients are exactly encode_baseline's
    quantized grids, so decode_jpeg(progressive) must equal
    decode_baseline(baseline) bit-for-bit at the same quality — the
    differential the tests pin. restart_interval (in MCUs/blocks)
    exercises the per-segment EOB-run and predictor resets;
    scan_order='band' emits the mozjpeg-style band-major interleave
    (all components' first passes per band, then refinement sweeps) —
    same coefficients, different scan script."""
    if al < 0 or al > 10:
        raise ValueError("al must be in 0..10")
    h, w, gray, sub, grids, qy, qc = _to_coef_grids(
        arr, quality, subsampling
    )
    ncomp = 1 if gray else 3
    samp = [(sub, sub)] + ([] if gray else [(1, 1), (1, 1)])
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # non-interleaved per-component block counts (decoder contract)
    bdims = []
    for ci in range(ncomp):
        cw = -(-(w * samp[ci][0]) // hmax)
        chh = -(-(h * samp[ci][1]) // vmax)
        bdims.append((-(-chh // 8), -(-cw // 8)))

    dc_bits, dc_vals, ac_bits, ac_vals = _enc_tables_prog()
    dc_codes = _enc_codes(dc_bits, dc_vals)
    ac_codes = _enc_codes(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tq, tbl in ((0, qy),) + (((1, qc),) if not gray else ()):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(x) for x in tbl[ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">H", 8 + 3 * ncomp) + b"\x08"
    out += struct.pack(">HH", h, w) + bytes([ncomp])
    if gray:
        out += bytes([1, 0x11, 0])
    else:
        out += bytes([1, (sub << 4) | sub, 0, 2, 0x11, 1, 3, 0x11, 1])
    for tc_th in (0x00, 0x10) if gray else (0x00, 0x10, 0x01, 0x11):
        bits, vals = (
            (dc_bits, dc_vals) if (tc_th >> 4) == 0
            else (ac_bits, ac_vals)
        )
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + vals
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4)
        out += struct.pack(">H", restart_interval)

    def sos_header(comp_specs, ss, se, ah, al_):
        hdr = bytearray(
            b"\xff\xda" + struct.pack(">H", 6 + 2 * len(comp_specs))
        )
        hdr += bytes([len(comp_specs)])
        for cid, tdta in comp_specs:
            hdr += bytes([cid, tdta])
        hdr += bytes([ss, se, (ah << 4) | al_])
        return hdr

    mcux = grids[0].shape[1] // samp[0][0]
    mcuy = grids[0].shape[0] // samp[0][1]

    def emit_restart(wr, m, holder):
        wr.flush()
        holder += wr.out
        holder += bytes(
            [0xFF, 0xD0 + ((m // restart_interval - 1) % 8)]
        )

    # ---- DC first scan (interleaved, Ah=0, Al=al)
    out += sos_header(
        [(ci + 1, (0 if gray else min(ci, 1)) << 4)
         for ci in range(ncomp)],
        0, 0, 0, al,
    )
    wr = _BitWriter()
    preds = [0] * ncomp
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            emit_restart(wr, m, out)
            wr = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            hs, vs = samp[ci]
            for by in range(vs):
                for bx in range(hs):
                    dc = int(
                        grids[ci][my * vs + by, mx * hs + bx, 0]
                    ) >> al  # arithmetic shift per T.81 G.1.2.1
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    s = _csize(diff)
                    code, ln = dc_codes[s]
                    wr.write(code, ln)
                    if s:
                        wr.write(
                            diff if diff > 0 else diff + (1 << s) - 1, s
                        )
    wr.flush()
    out += wr.out

    # ---- DC refinement scans (one bit per block per level)
    for a in range(al, 0, -1):
        out += sos_header(
            [(ci + 1, 0) for ci in range(ncomp)], 0, 0, a, a - 1
        )
        wr = _BitWriter()
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                emit_restart(wr, m, out)
                wr = _BitWriter()
            my, mx = divmod(m, mcux)
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        dc = int(
                            grids[ci][my * vs + by, mx * hs + bx, 0]
                        )
                        wr.write((dc >> (a - 1)) & 1, 1)
        wr.flush()
        out += wr.out

    # ---- AC scans: per component, per band; first pass then refines
    bands = []
    lo = 1
    for split in tuple(band_splits) + (63,):
        if not (lo <= split <= 63):
            raise ValueError(f"bad band split {split}")
        bands.append((lo, split))
        lo = split + 1
        if lo > 63:
            break
    # scan ordering: 'comp' groups a component's first pass with its
    # refinements; 'band' is the mozjpeg-style interleave real web
    # encoders emit — ALL first passes band-major across components,
    # then refinement sweeps per approximation level. Scans are
    # independent coefficient updates, so both orders must decode
    # identically (pinned in tests).
    def ac_first(ci, ss, se):
        nonlocal out
        bh_c, bw_c = bdims[ci]
        g = grids[ci]
        ta = 0 if gray else min(ci, 1)
        # first pass at Al=al
        out += sos_header([(ci + 1, ta)], ss, se, 0, al)
        wr = _BitWriter()
        eob = _EobState(wr, ac_codes)
        for m in range(bh_c * bw_c):
            if restart_interval and m and m % restart_interval == 0:
                eob.flush()
                emit_restart(wr, m, out)
                wr = _BitWriter()
                eob = _EobState(wr, ac_codes)
            by, bx = divmod(m, bw_c)
            zz = g[by, bx]
            t = [
                (1 if zz[k] > 0 else -1) * (abs(int(zz[k])) >> al)
                for k in range(ss, se + 1)
            ]
            last = len(t) - 1
            while last >= 0 and t[last] == 0:
                last -= 1
            if last < 0:
                eob.bump()
                continue
            eob.flush()
            run = 0
            for v in t[: last + 1]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    wr.write(code, ln)
                    run -= 16
                s = _csize(v)
                code, ln = ac_codes[(run << 4) | s]
                wr.write(code, ln)
                wr.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last < len(t) - 1:
                eob.bump()
        eob.flush()
        wr.flush()
        out += wr.out

    def ac_refine(ci, ss, se, a):
        nonlocal out
        bh_c, bw_c = bdims[ci]
        g = grids[ci]
        ta = 0 if gray else min(ci, 1)
        # refinement pass Ah=a, Al=a-1
        out += sos_header([(ci + 1, ta)], ss, se, a, a - 1)
        wr = _BitWriter()
        eob = _EobState(wr, ac_codes)
        for m in range(bh_c * bw_c):
            if restart_interval and m and \
                    m % restart_interval == 0:
                eob.flush()
                emit_restart(wr, m, out)
                wr = _BitWriter()
                eob = _EobState(wr, ac_codes)
            by, bx = divmod(m, bw_c)
            zz = g[by, bx]
            # events in position order, decoder-walk order
            events = []  # ('c', bit) | ('z',) | ('n', signbit)
            for k in range(ss, se + 1):
                v = int(zz[k])
                mag = abs(v)
                if mag >> a:  # nonzero history
                    events.append(("c", (mag >> (a - 1)) & 1))
                elif (mag >> (a - 1)) & 1:  # newly nonzero
                    events.append(("n", 1 if v > 0 else 0))
                else:
                    events.append(("z",))
            if not any(e[0] == "n" for e in events):
                eob.bump(e[1] for e in events if e[0] == "c")
                continue
            eob.flush()
            qi = 0
            run = sum(
                1 for e in events if e[0] == "z"
            )  # recomputed per symbol below
            i2 = 0
            n_ev = len(events)
            while i2 < n_ev:
                # find next 'n'; count zeros before it
                j = i2
                zrun = 0
                found = -1
                while j < n_ev:
                    if events[j][0] == "n":
                        found = j
                        break
                    if events[j][0] == "z":
                        zrun += 1
                    j += 1
                if found < 0:
                    # tail: EOB carries remaining corrections
                    if i2 < n_ev:
                        eob.bump(
                            e[1]
                            for e in events[i2:]
                            if e[0] == "c"
                        )
                    break
                # emit ZRLs while the zero run exceeds 15,
                # walking events exactly as the decoder does
                while zrun > 15:
                    code, ln = ac_codes[0xF0]
                    wr.write(code, ln)
                    consumed = 0
                    while consumed < 16:
                        e = events[i2]
                        i2 += 1
                        if e[0] == "z":
                            consumed += 1
                        else:  # 'c'
                            wr.write(e[1], 1)
                    zrun -= 16
                code, ln = ac_codes[(zrun << 4) | 1]
                wr.write(code, ln)
                wr.write(events[found][1], 1)  # sign bit
                # corrections crossed up to the placement slot
                for e in events[i2:found]:
                    if e[0] == "c":
                        wr.write(e[1], 1)
                i2 = found + 1
            del qi, run
        eob.flush()
        wr.flush()
        out += wr.out

    if scan_order == "comp":
        for ci in range(ncomp):
            for (ss, se) in bands:
                ac_first(ci, ss, se)
                for a in range(al, 0, -1):
                    ac_refine(ci, ss, se, a)
    elif scan_order == "band":
        for (ss, se) in bands:
            for ci in range(ncomp):
                ac_first(ci, ss, se)
        for a in range(al, 0, -1):
            for (ss, se) in bands:
                for ci in range(ncomp):
                    ac_refine(ci, ss, se, a)
    else:
        raise ValueError("scan_order must be 'comp' or 'band'")
    out += b"\xff\xd9"
    return bytes(out)


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_baseline(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8
    array as a baseline interleaved JPEG. quality per IJG scaling
    (100 ⇒ all-ones quant tables); subsampling '4:4:4' or '4:2:0'
    (color only); restart_interval in MCUs (0 = none)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad dimensions")
    if ch not in (1, 3):
        raise ValueError("grayscale or RGB only")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be 4:4:4 or 4:2:0")
    gray = ch == 1
    qy = scale_quant(QT_LUMA, quality)
    qc = scale_quant(QT_CHROMA, quality)
    sub = 2 if (not gray and subsampling == "4:2:0") else 1

    a = arr.astype(np.float64)
    if gray:
        planes = [a[:, :, 0]]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub == 2:
            cbp = _pad_edge(cb, 2)
            crp = _pad_edge(cr, 2)
            cb = cbp.reshape(
                cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            cr = crp.reshape(
                crp.shape[0] // 2, 2, crp.shape[1] // 2, 2
            ).mean(axis=(1, 3))
        planes = [y, cb, cr]

    mcu = 8 * sub
    planes[0] = _pad_edge(planes[0], mcu)
    for i in range(1, len(planes)):
        planes[i] = _pad_edge(planes[i], 8)
        # chroma plane must cover ceil(padded_luma / sub) blocks
        need_h = planes[0].shape[0] // sub
        need_w = planes[0].shape[1] // sub
        p = planes[i]
        planes[i] = np.pad(
            p,
            ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])),
            mode="edge",
        )

    dc_bits, dc_vals, ac_bits, ac_vals = _enc_tables()
    dc_codes = _enc_codes(dc_bits, dc_vals)
    ac_codes = _enc_codes(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tq, tbl in ((0, qy),) + ((1, qc),) if not gray else ((0, qy),):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(x) for x in tbl[ZIGZAG])  # zigzag order
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * ncomp) + b"\x08"
    out += struct.pack(">HH", h, w) + bytes([ncomp])
    if gray:
        out += bytes([1, 0x11, 0])
    else:
        out += bytes([1, (sub << 4) | sub, 0, 2, 0x11, 1, 3, 0x11, 1])
    for tc_th in (0x00, 0x10) if gray else (0x00, 0x10, 0x01, 0x11):
        bits, vals = (
            (dc_bits, dc_vals) if (tc_th >> 4) == 0
            else (ac_bits, ac_vals)
        )
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + vals
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4)
        out += struct.pack(">H", restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp)
    out += bytes([ncomp])
    if gray:
        out += bytes([1, 0x00])
    else:
        out += bytes([1, 0x00, 2, 0x11, 3, 0x11])
    out += b"\x00\x3f\x00"

    qtabs = [qy.astype(np.float64)] + (
        [] if gray else [qc.astype(np.float64)] * 2
    )
    samp = [(sub, sub)] + ([] if gray else [(1, 1), (1, 1)])
    mcux = planes[0].shape[1] // mcu
    mcuy = planes[0].shape[0] // mcu
    wr = _BitWriter()
    preds = [0] * ncomp
    m = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and m and m % restart_interval == 0:
                wr.flush()
                out += wr.out
                out += bytes(
                    [0xFF, 0xD0 + ((m // restart_interval - 1) % 8)]
                )
                wr = _BitWriter()
                preds = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = planes[ci][y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(
                            wr, block, qtabs[ci], preds[ci],
                            dc_codes, ac_codes,
                        )
            m += 1
    wr.flush()
    out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


def _enc_tables12():
    """12-bit fixture huffman tables (self-described in DHT): DC =
    sixteen 5-bit codes for categories 0-15 (12-bit DC diffs reach
    category 15: |DC| <= 8*2048 after the level-shifted DCT); AC =
    ZRL + EOB + (run, size) for sizes 1..14, all 9-bit codes (226 of
    512 — the all-ones code of each length stays unused per T.81
    C.2)."""
    dc_bits = [0, 0, 0, 0, 16] + [0] * 11
    dc_vals = bytes(range(16))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 15)
    ]
    ac_syms.sort()
    ac_bits = [0] * 16
    ac_bits[8] = len(ac_syms)
    return dc_bits, dc_vals, ac_bits, bytes(ac_syms)


def encode_baseline12(
    arr: np.ndarray,
    quality: int = 90,
) -> bytes:
    """Encode an (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB array
    of 12-BIT samples (uint16, 0..4095) as an extended-sequential
    (SOF1, precision 12) huffman JPEG — 4:4:4, no restarts. Level
    shift 2048, 16-bit (Pq=1) quantization tables, DC categories to
    15 and AC sizes to 14. The decoder maps 12-bit samples onto its
    uint8 contract via the 255/4095 max-range scale (see
    _decode_scan), so decode(encode_baseline12(x)) ~= x >> 4 — the
    differential the tests pin. Closes the '12-bit JPEG' half of the
    r4 envelope note honestly: JPEG streams self-describe their
    huffman tables in DHT, so unlike MP3 there is no non-derivable
    constant here; arithmetic coding (QM-coder state tables) remains
    out of envelope."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad dimensions")
    if ch not in (1, 3):
        raise ValueError("grayscale or RGB only")
    if arr.dtype.kind not in "iu" or int(arr.max(initial=0)) > 4095 \
            or int(arr.min(initial=0)) < 0:
        raise ValueError("12-bit samples must be integers in 0..4095")
    gray = ch == 1
    a = arr.astype(np.float64)
    if gray:
        planes = [a[:, :, 0]]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 2048.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 2048.0
        planes = [y, cb, cr]
    planes = [_pad_edge(p, 8) for p in planes]

    # quant values scaled into the 16-bit table range: the 8-bit IJG
    # tables govern RELATIVE step sizes; 12-bit samples carry 16x the
    # amplitude, so steps scale by 16 to keep the same visual quality
    qy = scale_quant(QT_LUMA, quality).astype(np.int64) * 16
    qc = scale_quant(QT_CHROMA, quality).astype(np.int64) * 16

    dc_bits, dc_vals, ac_bits, ac_vals = _enc_tables12()
    dc_codes = _enc_codes(dc_bits, dc_vals)
    ac_codes = _enc_codes(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    tabs = ((0, qy),) if gray else ((0, qy), (1, qc))
    for tq, tbl in tabs:
        out += b"\xff\xdb" + struct.pack(">H", 3 + 128)
        out += bytes([(1 << 4) | tq])
        for x in tbl[ZIGZAG]:
            out += struct.pack(">H", int(x))
    ncomp = 1 if gray else 3
    out += b"\xff\xc1" + struct.pack(">H", 8 + 3 * ncomp) + b"\x0c"
    out += struct.pack(">HH", h, w) + bytes([ncomp])
    if gray:
        out += bytes([1, 0x11, 0])
    else:
        out += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    for tc_th in (0x00, 0x10) if gray else (0x00, 0x10, 0x01, 0x11):
        bits, vals = (
            (dc_bits, dc_vals) if (tc_th >> 4) == 0
            else (ac_bits, ac_vals)
        )
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + vals
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp)
    out += bytes([ncomp])
    if gray:
        out += bytes([1, 0x00])
    else:
        out += bytes([1, 0x00, 2, 0x11, 3, 0x11])
    out += b"\x00\x3f\x00"

    qtabs = [qy.astype(np.float64)] + (
        [] if gray else [qc.astype(np.float64)] * 2
    )
    bh, bw = planes[0].shape[0] // 8, planes[0].shape[1] // 8
    wr = _BitWriter()
    preds = [0] * ncomp
    for my in range(bh):
        for mx in range(bw):
            for ci in range(ncomp):
                block = planes[ci][my * 8:my * 8 + 8,
                                   mx * 8:mx * 8 + 8]
                f = _C @ (block - 2048.0) @ _C.T
                q = np.round(
                    f / qtabs[ci].reshape(8, 8)).astype(np.int64)
                zz = q.ravel()[ZIGZAG]
                dc = int(zz[0])
                diff = dc - preds[ci]
                preds[ci] = dc
                s = _csize(diff)
                code, ln = dc_codes[s]
                wr.write(code, ln)
                if s:
                    wr.write(
                        diff if diff > 0 else diff + (1 << s) - 1, s)
                last = 63
                while last > 0 and zz[last] == 0:
                    last -= 1
                run = 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        wr.write(code, ln)
                        run -= 16
                    s = _csize(v)
                    code, ln = ac_codes[(run << 4) | s]
                    wr.write(code, ln)
                    wr.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    code, ln = ac_codes[0x00]
                    wr.write(code, ln)
    wr.flush()
    out += wr.out
    out += b"\xff\xd9"
    return bytes(out)
