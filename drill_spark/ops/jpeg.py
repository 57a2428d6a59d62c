"""Baseline (SOF0) + progressive (SOF2) JPEG codec — stdlib struct +
numpy, no codec libs.

Implements the public ITU-T T.81 baseline process: DQT/DHT/SOF0/SOS
segment parsing, canonical Huffman decode of DC-difference and AC
run-length coefficients with byte-unstuffing and RSTn restart
handling, dequantization + inverse zigzag, the separable 8x8 type-III
DCT, chroma upsampling for 4:4:4 / 4:2:2 / 4:2:0 samplings, and the
JFIF YCbCr<->RGB color transform.

Progressive (SOF2) decode implements T.81 G.1.2 in full: spectral
selection (per-scan Ss..Se coefficient bands, interleaved DC scans,
non-interleaved AC scans with EOB-run codes) and successive
approximation (DC arithmetic point transform + bit refinement, AC
magnitude point transform with newly-nonzero insertion and
correction-bit refinement). Coefficients accumulate across scans and
reconstruct once at EOI through the same IDCT/upsample/color path as
baseline — so for identical quantized coefficients, baseline and
progressive decodes are bit-identical, which is the test oracle.
Arithmetic-coded and lossless processes raise NotImplementedError
naming the process.

The encoder exists for fixtures and roundtrip oracles: 4:4:4 baseline
with the T.81 Annex K quantization/Huffman tables at libjpeg-style
quality scaling. At the default quality 75 the luminance DC step is
exactly 8 — the 8x8 DCT's DC gain — so a constant-gray image survives
encode->decode bit-exactly, which is what lets ext_multimodal_decode
keep a closed-form SQL oracle over real JPEG payloads.

Reference boundary this replaces: ops/multimodal.py previously listed
JPEG entropy decode as a labeled stub (the reference's image format
plugin reads only metadata; decode parity is an extension surface).
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# T.81 Annex K.1 quantization tables (zigzag order applied at use)
_QT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
])
_QT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
])

# T.81 Annex K.3 typical Huffman tables: (bits[16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix():
    T = np.zeros((8, 8))
    for i in range(8):
        c = math_sqrt_half if i == 0 else 1.0
        for j in range(8):
            T[i, j] = c * np.cos((2 * j + 1) * i * np.pi / 16) / 2
    return T


math_sqrt_half = 1 / np.sqrt(2)
_T = _dct_matrix()


def _scale_table(base, quality):
    """libjpeg quality scaling (quality 50 = Annex K as-is)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = np.floor((base.astype(np.int64) * scale + 50) / 100).astype(np.int64)
    return np.clip(t, 1, 255)


# ------------------------------------------------------------- decode


class _Bits:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            if self.pos >= len(self.d):
                self.acc = (self.acc << 8) | 0
                self.n += 8
                continue
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos] if self.pos < len(self.d) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed literal 0xFF
                else:
                    # marker: behave as if padded (caller handles RST)
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def align_restart(self):
        """Skip to just past the next RSTn marker; drop partial bits."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.d):
            if self.d[self.pos] == 0xFF and 0xD0 <= self.d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        self.pos = len(self.d)

    def read_code(self, sym, ln):
        """One Huffman symbol via the 16-bit peek LUT (sym/ln lists
        from _HuffTable.lut16) — replaces up to 16 single-bit reads."""
        if self.n < 16:
            self._fill()
        peek = (self.acc >> (self.n - 16)) & 0xFFFF
        length = ln[peek]
        if not length:
            raise ValueError("invalid Huffman code in entropy stream")
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return sym[peek]

    def read_rs_val(self, sym, ln):
        """Huffman symbol + its (sym & 15)-bit EXTENDed value in one
        call — the baseline hot path (one method call per coefficient
        instead of symbol + read + extend)."""
        n = self.n
        if n < 16:
            self._fill()
            n = self.n
        acc = self.acc
        peek = (acc >> (n - 16)) & 0xFFFF
        length = ln[peek]
        if not length:
            raise ValueError("invalid Huffman code in entropy stream")
        rs = sym[peek]
        n -= length
        s = rs & 15
        if s:
            if n < s:
                self.n = n
                self.acc = acc & ((1 << n) - 1)
                self._fill()
                acc, n = self.acc, self.n
            v = (acc >> (n - s)) & ((1 << s) - 1)
            n -= s
            if v < (1 << (s - 1)):
                v += 1 - (1 << s)
        else:
            v = 0
        self.acc = acc & ((1 << n) - 1)
        self.n = n
        return rs, v


class _HuffTable(dict):
    """(length, code) -> symbol dict for a canonical JPEG Huffman
    table, plus a lazily built 16-bit-peek LUT for the fast decode
    path: every 16-bit window whose prefix is a valid code maps to
    (symbol, code length), so one peek replaces up to 16 single-bit
    reads. Subclassing dict keeps every existing (length, code) lookup
    working unchanged."""

    def lut16(self):
        lut = getattr(self, "_lut16", None)
        if lut is None:
            sym = np.full(65536, -1, dtype=np.int32)
            ln = np.zeros(65536, dtype=np.int32)
            for (length, code), s in self.items():
                base = code << (16 - length)
                span = 1 << (16 - length)
                sym[base: base + span] = s
                ln[base: base + span] = length
            # plain lists: scalar indexing in the hot loop is ~3x
            # faster on lists than on numpy arrays
            lut = self._lut16 = (sym.tolist(), ln.tolist())
        return lut


def _build_decode_table(bits, vals):
    """(length, code) -> symbol for a canonical JPEG Huffman table."""
    lut = _HuffTable()
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


def _decode_symbol(br: _Bits, lut) -> int:
    if isinstance(lut, _HuffTable):
        sym, ln = lut.lut16()
        return br.read_code(sym, ln)
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0/SOF1) or progressive (SOF2) JPEG bytes ->
    (H, W, 3) uint8 RGB."""
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt = {}
    huff = {}
    comps = None
    W = H = None
    restart_interval = 0
    progressive = False
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack_from(">H", b, pos + 2)[0]
        seg = b[pos + 4: pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 15
                s += 1
                if pq:
                    vals = np.frombuffer(seg[s: s + 128], dtype=">u2").astype(np.int64)
                    s += 128
                else:
                    vals = np.frombuffer(seg[s: s + 64], dtype=np.uint8).astype(np.int64)
                    s += 64
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = vals
                qt[tq] = tab.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 15
                bits = list(seg[s + 1: s + 17])
                n = sum(bits)
                vals = list(seg[s + 17: s + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                s += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / ext. sequential / progressive
            progressive = marker == 0xC2
            prec, H, W, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG sample precision {prec} (only 8)")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} "
                "(baseline SOF0/SOF1 and progressive SOF2 supported)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 15))
            data_start = pos + 2 + seglen
            if not progressive:
                return _decode_scan(
                    b[data_start:], comps, scan, qt, huff, W, H, restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            end = _entropy_end(b, data_start)
            _decode_progressive_scan(
                b[data_start:end], comps, scan, huff, W, H,
                ss, se, ahal >> 4, ahal & 15, restart_interval,
            )
            pos = end
            continue
        elif marker == 0xD9:  # EOI
            if progressive and comps and any("coef" in c for c in comps):
                return _reconstruct_progressive(comps, qt, W, H)
            break
        pos += 2 + seglen
    if progressive and comps and any("coef" in c for c in comps):
        return _reconstruct_progressive(comps, qt, W, H)  # truncated: no EOI
    raise ValueError("no SOS segment found")


def _entropy_end(b: bytes, start: int) -> int:
    """Index of the first real marker after entropy-coded data
    (0xFF followed by anything but a stuffed 0x00 or RSTn)."""
    i = start
    while i + 1 < len(b):
        if b[i] == 0xFF and b[i + 1] != 0x00 and not (0xD0 <= b[i + 1] <= 0xD7):
            return i
        i += 1
    return len(b)


def _decode_scan(data, comps, scan, qt, huff, W, H, restart_interval):
    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    mcux = (W + 8 * maxh - 1) // (8 * maxh)
    mcuy = (H + 8 * maxv - 1) // (8 * maxv)
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id[cs]
        c["td"], c["ta"] = td, ta
        order.append(c)
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        c["dc"] = 0

    br = _Bits(bytes(data))
    # entropy pass: coefficients per block into (nblocks, 64) natural
    # order; dequant + IDCT run batched afterwards (one einsum per
    # component instead of two 8x8 matmuls per block)
    for c in order:
        c["rows"] = []
        c["luts"] = (huff[(0, c["td"])].lut16(), huff[(1, c["ta"])].lut16())
    mcu_count = 0
    zz = ZIGZAG
    read_rs_val = br.read_rs_val
    for _my in range(mcuy):
        for _mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart()
                for c in order:
                    c["dc"] = 0
            mcu_count += 1
            for c in order:
                (dsym, dln), (asym, aln) = c["luts"]
                rows = c["rows"]
                for _sub in range(c["v"] * c["h"]):
                    row = [0.0] * 64
                    rows.append(row)
                    _, diff = read_rs_val(dsym, dln)
                    c["dc"] += diff
                    row[0] = c["dc"]
                    k = 1
                    while k < 64:
                        rs, val = read_rs_val(asym, aln)
                        s = rs & 15
                        if s == 0:
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            break
                        row[zz[k]] = val
                        k += 1

    Tt = _T.T
    for c in order:
        v, h = c["v"], c["h"]
        blocks = np.asarray(c["rows"]).reshape(-1, 8, 8) * qt[c["tq"]][None]
        px = np.einsum("ij,bjk,kl->bil", Tt, blocks, _T) + 128.0
        c["plane"] = (
            px.reshape(mcuy, mcux, v, h, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * v * 8, mcux * h * 8)
        )
        del c["rows"], c["luts"]

    return _planes_to_rgb(comps, W, H, maxh, maxv)


def _planes_to_rgb(comps, W, H, maxh, maxv) -> np.ndarray:
    """Upsample each component's sample plane to full resolution and
    apply the JFIF YCbCr->RGB transform (shared baseline/progressive
    tail)."""
    planes = []
    for c in comps:
        p = c["plane"]
        if c["h"] != maxh or c["v"] != maxv:
            p = np.repeat(np.repeat(p, maxv // c["v"], axis=0), maxh // c["h"], axis=1)
        planes.append(p[:H, :W])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).round().astype("uint8")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.clip(np.stack([r, g, bl], axis=2), 0, 255).round().astype("uint8")


# ------------------------------------------- progressive decode (T.81 G.1.2)


def _ac_first(br: _Bits, lut, cf, Ss, Se, Al, state) -> None:
    """First AC scan of a band: run-length/size symbols with EOB-run
    codes; decoded magnitudes enter at precision Al (G.1.2.2)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = Ss
    while k <= Se:
        rs = _decode_symbol(br, lut)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            eobrun = (1 << r) - 1  # current block completes the run
            if r:
                eobrun += br.read(r)
            state["eobrun"] = eobrun
            break
        k += r
        if k > Se:
            raise ValueError("progressive AC scan ran past Se")
        cf[ZIGZAG[k]] = _extend(br.read(s), s) << Al
        k += 1


def _ac_refine(br: _Bits, lut, cf, Ss, Se, Al, state) -> None:
    """AC refinement scan (G.1.2.3): newly-nonzero coefficients enter
    at +-2^Al; already-nonzero coefficients receive one correction bit
    each as the scan walks over them; EOB runs count whole blocks whose
    remainder carries correction bits only."""
    p1 = 1 << Al
    k = Ss
    if state["eobrun"] == 0:
        while k <= Se:
            rs = _decode_symbol(br, lut)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r  # includes the current block's tail
                    if r:
                        eobrun += br.read(r)
                    state["eobrun"] = eobrun
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                newval = p1 if br.read(1) else -p1
            while k <= Se:
                z = ZIGZAG[k]
                if cf[z] != 0:
                    if br.read(1) and (abs(int(cf[z])) & p1) == 0:
                        cf[z] += p1 if cf[z] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= Se:
                cf[ZIGZAG[k]] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= Se:  # remainder of the block: correction bits only
            z = ZIGZAG[k]
            if cf[z] != 0:
                if br.read(1) and (abs(int(cf[z])) & p1) == 0:
                    cf[z] += p1 if cf[z] > 0 else -p1
            k += 1
        state["eobrun"] -= 1


def _decode_progressive_scan(data, comps, scan, huff, W, H,
                             Ss, Se, Ah, Al, restart_interval) -> None:
    """Decode one progressive scan into the per-component coefficient
    accumulators (created on first use). DC scans may be interleaved;
    AC scans are single-component over the component's own block grid
    (T.81 G.1.1)."""
    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    mcux = (W + 8 * maxh - 1) // (8 * maxh)
    mcuy = (H + 8 * maxv - 1) // (8 * maxv)
    by_id = {c["id"]: c for c in comps}
    for c in comps:
        if "coef" not in c:
            c["coef"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
    order = []
    for cs, td, ta in scan:
        c = by_id[cs]
        c["td"], c["ta"] = td, ta
        order.append(c)

    br = _Bits(bytes(data))
    state = {"eobrun": 0}

    def comp_blocks(c):
        comp_w = (W * c["h"] + maxh - 1) // maxh
        comp_h = (H * c["v"] + maxv - 1) // maxv
        return (comp_h + 7) // 8, (comp_w + 7) // 8

    if Ss == 0:
        # ---- DC scan ----
        if Se != 0:
            raise ValueError("progressive DC scan must have Se=0 (T.81 G.1.1.1)")
        for c in order:
            c["dc"] = 0

        def dc_block(c, byy, bxx):
            cf = c["coef"][byy, bxx]
            if Ah == 0:
                s = _decode_symbol(br, huff[(0, c["td"])])
                c["dc"] += _extend(br.read(s), s)
                cf[0] = c["dc"] << Al
            elif br.read(1):
                cf[0] |= 1 << Al

        if len(order) > 1:
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and unit and unit % restart_interval == 0:
                        br.align_restart()
                        for c in order:
                            c["dc"] = 0
                    unit += 1
                    for c in order:
                        for vy in range(c["v"]):
                            for vx in range(c["h"]):
                                dc_block(c, my * c["v"] + vy, mx * c["h"] + vx)
        else:
            c = order[0]
            bh_, bw_ = comp_blocks(c)
            unit = 0
            for byy in range(bh_):
                for bxx in range(bw_):
                    if restart_interval and unit and unit % restart_interval == 0:
                        br.align_restart()
                        c["dc"] = 0
                    unit += 1
                    dc_block(c, byy, bxx)
        return

    # ---- AC scan: single component, own block grid ----
    if len(order) != 1:
        raise ValueError("progressive AC scan must be non-interleaved (ns=1)")
    c = order[0]
    lut = huff[(1, c["ta"])]
    bh_, bw_ = comp_blocks(c)
    unit = 0
    for byy in range(bh_):
        for bxx in range(bw_):
            if restart_interval and unit and unit % restart_interval == 0:
                br.align_restart()
                state["eobrun"] = 0
            unit += 1
            cf = c["coef"][byy, bxx]
            if Ah == 0:
                _ac_first(br, lut, cf, Ss, Se, Al, state)
            else:
                _ac_refine(br, lut, cf, Ss, Se, Al, state)


def _reconstruct_progressive(comps, qt, W, H) -> np.ndarray:
    """Dequantize the accumulated coefficient planes, IDCT every block
    (vectorized einsum), and reuse the baseline upsample/color tail."""
    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    for c in comps:
        q = qt[c["tq"]].reshape(64).astype(np.float64)  # natural order
        by, bx = c["coef"].shape[:2]
        blocks = (c["coef"] * q).reshape(by, bx, 8, 8)
        px = np.einsum("ij,abjk,kl->abil", _T.T, blocks, _T) + 128.0
        c["plane"] = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return _planes_to_rgb(comps, W, H, maxh, maxv)


# ------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s


def _build_encode_table(bits, vals):
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return lut


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _block_syms(zz, diff, dct, act, vput, lput):
    """Append one block's (value, bitlength) symbol stream (DC diff +
    AC run/size coding) to the vput/lput lists. zz: 64 Python ints in
    zigzag order; diff: DC difference for this block."""
    s = _category(diff)
    code, ln = dct[s]
    vput(code)
    lput(ln)
    if s:
        vput(diff if diff >= 0 else diff + (1 << s) - 1)
        lput(s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act[0xF0]
            vput(code)
            lput(ln)
            run -= 16
        s = _category(v)
        code, ln = act[(run << 4) | s]
        vput(code)
        lput(ln)
        vput(v if v >= 0 else v + (1 << s) - 1)
        lput(s)
        run = 0
    if last_nz < 63:
        code, ln = act[0x00]
        vput(code)
        lput(ln)


def _pack_entropy(vals, lens) -> bytes:
    """(value, bitlength) stream -> packed entropy bytes, MSB-first,
    1-padded to a byte boundary, 0x00-stuffed after every 0xFF —
    byte-identical to feeding each pair through _BitWriter.write +
    flush, but as ~16 vector scatters instead of a call per symbol."""
    if not lens:
        return b""
    v = np.asarray(vals, dtype=np.int64)
    ln = np.asarray(lens, dtype=np.int64)
    ends = np.cumsum(ln)
    total = int(ends[-1])
    starts = ends - ln
    bitarr = np.zeros((total + 7) & ~7, dtype=np.uint8)
    for j in range(int(ln.max())):
        m = ln > j
        bitarr[starts[m] + j] = (v[m] >> (ln[m] - 1 - j)) & 1
    bitarr[total:] = 1  # flush pads with 1s
    packed = np.packbits(bitarr)
    stuff = np.flatnonzero(packed == 0xFF)
    if len(stuff):
        packed = np.insert(packed, stuff + 1, 0)
    return packed.tobytes()


def _encoder_planes(img, quality: int, subsampling: str):
    """Shared front half of both encoders: RGB->YCbCr, padding to the
    MCU grid, chroma decimation, scaled quant tables. Returns
    (H, W, sh, sv, mcux, mcuy, ql, qc, yp, cbp, crp)."""
    img = np.asarray(img, dtype=np.float64)
    H, W = img.shape[:2]
    r, g, bch = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * bch
    cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128.0

    sh, sv = {"4:4:4": (1, 1), "4:2:0": (2, 2)}[subsampling]
    ql = _scale_table(_QT_LUMA, quality)
    qc = _scale_table(_QT_CHROMA, quality)

    mw, mh = 8 * sh, 8 * sv  # MCU pixel size
    mcux, mcuy = (W + mw - 1) // mw, (H + mh - 1) // mh

    def pad_to(p, th, tw):
        return np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")

    yp = pad_to(y, mcuy * mh, mcux * mw)
    if (sh, sv) == (1, 1):
        cbp, crp = pad_to(cb, mcuy * 8, mcux * 8), pad_to(cr, mcuy * 8, mcux * 8)
    else:
        full_cb = pad_to(cb, mcuy * mh, mcux * mw)
        full_cr = pad_to(cr, mcuy * mh, mcux * mw)
        cbp = full_cb.reshape(mcuy * 8, sv, mcux * 8, sh).mean(axis=(1, 3))
        crp = full_cr.reshape(mcuy * 8, sv, mcux * 8, sh).mean(axis=(1, 3))
    return H, W, sh, sv, mcux, mcuy, ql, qc, yp, cbp, crp


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_seg(tq, tab):
    return _seg(0xDB, bytes([tq]) + bytes(tab.reshape(64)[ZIGZAG].astype(np.uint8)))


def _dht_seg(tc, th, bits, vals):
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


_APP0_JFIF = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")


def encode_jpeg(img, quality: int = 75, subsampling: str = "4:4:4") -> bytes:
    """numpy (H, W, 3) uint8 RGB -> baseline JFIF bytes.

    subsampling "4:4:4" (default, exact-DC fixture path) or "4:2:0"
    (2x2 chroma decimation, the common camera layout — exercises the
    decoder's upsampling path)."""
    H, W, sh, sv, mcux, mcuy, ql, qc, yp, cbp, crp = _encoder_planes(
        img, quality, subsampling
    )
    dc_l = _build_encode_table(*_DC_LUMA)
    dc_c = _build_encode_table(*_DC_CHROMA)
    ac_l = _build_encode_table(*_AC_LUMA)
    ac_c = _build_encode_table(*_AC_CHROMA)

    # batched DCT + quantization (one einsum per plane), zigzag rows as
    # Python int lists for the symbol loop, then one vectorized bit pack
    yzz = _block_coefs(yp, ql)[:, :, ZIGZAG]
    yzz = (
        yzz.reshape(mcuy, sv, mcux, sh, 64)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, 64)
        .tolist()
    )
    cbzz = _block_coefs(cbp, qc)[:, :, ZIGZAG].reshape(-1, 64).tolist()
    crzz = _block_coefs(crp, qc)[:, :, ZIGZAG].reshape(-1, 64).tolist()
    vals: list[int] = []
    lens: list[int] = []
    vput, lput = vals.append, lens.append
    pred = [0, 0, 0]
    subs = sv * sh
    for m in range(mcuy * mcux):
        for j in range(subs):
            zz = yzz[m * subs + j]
            _block_syms(zz, zz[0] - pred[0], dc_l, ac_l, vput, lput)
            pred[0] = zz[0]
        for ci, rows, dct, act in ((1, cbzz, dc_c, ac_c), (2, crzz, dc_c, ac_c)):
            zz = rows[m]
            _block_syms(zz, zz[0] - pred[ci], dct, act, vput, lput)
            pred[ci] = zz[0]
    entropy = _pack_entropy(vals, lens)

    sof = _seg(0xC0, struct.pack(">BHHB", 8, H, W, 3)
               + bytes([1, (sh << 4) | sv, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (b"\xff\xd8" + _APP0_JFIF + _dqt_seg(0, ql) + _dqt_seg(1, qc)
            + _dht_seg(0, 0, *_DC_LUMA) + _dht_seg(0, 1, *_DC_CHROMA)
            + _dht_seg(1, 0, *_AC_LUMA) + _dht_seg(1, 1, *_AC_CHROMA)
            + sof + sos + entropy + b"\xff\xd9")


# --------------------------------------------------- progressive encode


# libjpeg's standard scan script for 3-component YCbCr (jcparam.c —
# public layout): DC of all components at Al=1, AC bands per component
# at coarse precision, then DC + AC refinements down to full precision.
_STD_PROGRESSIVE_SCANS = [
    # (component indexes, Ss, Se, Ah, Al)
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),
]


def _block_coefs(plane, q):
    """(BY*8, BX*8) sample plane -> (BY, BX, 64) quantized DCT
    coefficients in natural order (q is the 8x8 natural-order table)."""
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (plane - 128.0).reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,kl->abil", _T, blocks, _T.T)
    return np.round(coef / q.astype(np.float64)).astype(np.int64).reshape(by, bx, 64)


def _emit_ac_first(bw, act, zz, Ss, Se, Al):
    """One block of a first AC scan: magnitude point transform
    (abs >> Al, sign kept), run/size coding, per-block EOB0 (valid —
    EOB-run accumulation is an optimization, not a requirement)."""
    vals = []
    for k in range(Ss, Se + 1):
        v = int(zz[ZIGZAG[k]])
        m = abs(v) >> Al
        vals.append(m if v >= 0 else -m)
    last_nz = max((i for i, v in enumerate(vals) if v), default=-1)
    run = 0
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = act[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < Se - Ss:
        code, ln = act[0x00]  # EOB0
        bw.write(code, ln)


def _emit_ac_refine(bw, act, zz, Ss, Se, Al):
    """One block of an AC refinement scan: newly-nonzero coefficients
    (magnitude 1 at this precision) emit run/1 symbols + sign bit;
    already-nonzero ones contribute buffered correction bits; the tail
    past the last newly-nonzero coefficient rides on EOB0."""
    p1 = 1 << Al
    mags = []
    for k in range(Ss, Se + 1):
        v = int(zz[ZIGZAG[k]])
        mags.append((abs(v) >> Al, v >= 0))
    eob_i = max((i for i, (m, _pos) in enumerate(mags) if m == 1), default=-1)
    run = 0
    corr: list[int] = []
    for i in range(eob_i + 1):
        m, positive = mags[i]
        if m == 0:
            run += 1
            continue
        # a pending ZRL must go out at the FIRST nonzero coefficient
        # after its 16-zero span — correction-bit positions included —
        # or bits buffered later would wrongly ride with it
        while run > 15:
            code, ln = act[0xF0]
            bw.write(code, ln)
            for bit in corr:
                bw.write(bit, 1)
            corr = []
            run -= 16
        if m > 1:  # nonzero history: correction bit, rides with next symbol
            corr.append(m & 1)
            continue
        code, ln = act[(run << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if positive else 0, 1)
        for bit in corr:
            bw.write(bit, 1)
        corr = []
        run = 0
    tail = [m & 1 for m, _pos in mags[eob_i + 1:] if m > 1]
    if eob_i < Se - Ss:
        code, ln = act[0x00]  # EOB0: decoder refines the remainder
        bw.write(code, ln)
        for bit in corr + tail:
            bw.write(bit, 1)


def encode_jpeg_progressive(img, quality: int = 75,
                            subsampling: str = "4:4:4",
                            scans=None) -> bytes:
    """numpy (H, W, 3) uint8 RGB -> progressive (SOF2) JFIF bytes.

    Entropy-codes the SAME quantized coefficients as encode_jpeg, just
    ordered by the scan script (default: libjpeg's standard 10-scan
    spectral-selection + successive-approximation script), so
    decode_jpeg(progressive) must equal decode_jpeg(baseline) exactly
    — the oracle the tests assert. Annex K Huffman tables suffice
    because EOB runs are emitted per block (EOB0)."""
    H, W, sh, sv, mcux, mcuy, ql, qc, yp, cbp, crp = _encoder_planes(
        img, quality, subsampling
    )
    dc_tabs = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA),
               _build_encode_table(*_DC_CHROMA)]
    ac_tabs = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA),
               _build_encode_table(*_AC_CHROMA)]
    comps = [
        {"h": sh, "v": sv, "coef": _block_coefs(yp, ql)},
        {"h": 1, "v": 1, "coef": _block_coefs(cbp, qc)},
        {"h": 1, "v": 1, "coef": _block_coefs(crp, qc)},
    ]

    def comp_blocks(c):
        comp_w = (W * c["h"] + sh - 1) // sh
        comp_h = (H * c["v"] + sv - 1) // sv
        return (comp_h + 7) // 8, (comp_w + 7) // 8

    out = bytearray()
    for cidx, Ss, Se, Ah, Al in (scans or _STD_PROGRESSIVE_SCANS):
        ns = len(cidx)
        body = bytes([ns])
        for ci in cidx:
            td = ci if ci < 2 else 1  # luma tables 0, chroma tables 1
            body += bytes([ci + 1, (td << 4) | td])
        body += bytes([Ss, Se, (Ah << 4) | Al])
        out += _seg(0xDA, body)

        bw = _BitWriter()
        if Ss == 0:
            preds = {ci: 0 for ci in cidx}
            if ns > 1:
                for my in range(mcuy):
                    for mx in range(mcux):
                        for ci in cidx:
                            c = comps[ci]
                            for vy in range(c["v"]):
                                for vx in range(c["h"]):
                                    zz = c["coef"][my * c["v"] + vy,
                                                   mx * c["h"] + vx]
                                    _emit_dc_progressive(
                                        bw, dc_tabs[min(ci, 1)], zz, Ah, Al,
                                        preds, ci)
            else:
                c = comps[cidx[0]]
                bh_, bw_ = comp_blocks(c)
                for byy in range(bh_):
                    for bxx in range(bw_):
                        _emit_dc_progressive(
                            bw, dc_tabs[min(cidx[0], 1)], c["coef"][byy, bxx],
                            Ah, Al, preds, cidx[0])
        else:
            c = comps[cidx[0]]
            act = ac_tabs[min(cidx[0], 1)]
            bh_, bw_ = comp_blocks(c)
            for byy in range(bh_):
                for bxx in range(bw_):
                    zz = c["coef"][byy, bxx]
                    if Ah == 0:
                        _emit_ac_first(bw, act, zz, Ss, Se, Al)
                    else:
                        _emit_ac_refine(bw, act, zz, Ss, Se, Al)
        bw.flush()
        out += bytes(bw.out)

    sof = _seg(0xC2, struct.pack(">BHHB", 8, H, W, 3)
               + bytes([1, (sh << 4) | sv, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    return (b"\xff\xd8" + _APP0_JFIF + _dqt_seg(0, ql) + _dqt_seg(1, qc)
            + _dht_seg(0, 0, *_DC_LUMA) + _dht_seg(0, 1, *_DC_CHROMA)
            + _dht_seg(1, 0, *_AC_LUMA) + _dht_seg(1, 1, *_AC_CHROMA)
            + sof + bytes(out) + b"\xff\xd9")


def _emit_dc_progressive(bw, dct, zz, Ah, Al, preds, ci):
    """One block of a DC scan: first pass codes the Al-shifted
    prediction difference; refinement passes emit one bit."""
    if Ah == 0:
        v = int(zz[0]) >> Al  # DC uses the arithmetic point transform
        diff = v - preds[ci]
        preds[ci] = v
        s = _category(diff)
        code, ln = dct[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    else:
        bw.write((int(zz[0]) >> Al) & 1, 1)
