"""Baseline TIFF codec — pure struct/zlib/numpy from the TIFF 6.0 spec.

The reference's image format plugin (contrib/format-image, via
metadata-extractor) reads TIFF *metadata*; pixel decode is this repo's
extension surface, same as the other from-scratch codecs. Covered:

- both byte orders (II/MM), classic 32-bit IFDs;
- stripped images (StripOffsets/StripByteCounts/RowsPerStrip);
- compressions: 1 (none), 5 (TIFF-variant LZW: MSB-first bit packing,
  9..12-bit codes, EARLY code-width change per the spec's §13 note),
  8/32946 (zlib Deflate), 32773 (PackBits §9);
- predictor 2 (horizontal differencing);
- photometric 0/1 (gray, incl. WhiteIsZero inversion), 2 (RGB[A]),
  3 (palette via ColorMap's 16-bit ramps);
- 8-bit samples (other depths raise by name).

decode_tiff returns (H, W, 3) uint8 RGB like the sibling codecs; the
encoder exists for fixtures/roundtrips and writes any of the four
compressions with optional predictor.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PREDICTOR = 317
_TAG_COLORMAP = 320

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}


def _read_ifd(b: bytes, e: str, off: int) -> dict[int, list[int]]:
    n = struct.unpack_from(e + "H", b, off)[0]
    tags: dict[int, list[int]] = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(e + "HHI", b, off + 2 + 12 * i)
        voff = off + 2 + 12 * i + 8
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size > 4:
            voff = struct.unpack_from(e + "I", b, voff)[0]
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:
            continue  # rationals/ascii not needed for decode
        tags[tag] = list(struct.unpack_from(e + fmt * cnt, b, voff))
    return tags


def probe_tiff_header(payload: bytes):
    """(width, height) from the first IFD, or None if not a TIFF."""
    b = bytes(payload or b"")
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        return None
    tags = _read_ifd(b, e, struct.unpack_from(e + "I", b, 4)[0])
    if _TAG_WIDTH in tags and _TAG_HEIGHT in tags:
        return tags[_TAG_WIDTH][0], tags[_TAG_HEIGHT][0]
    return None


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i: i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + 1
        while (j < len(data) and j - i < 128
               and not (j + 1 < len(data) and data[j] == data[j + 1])):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF §13 LZW: MSB-first bit packing, 256=Clear, 257=EOI, codes
    258.., width 9->12 with EARLY change (the width grows one code
    sooner than GIF's)."""
    CLEAR, EOI, FIRST = 256, 257, 258
    table: dict[int, bytes] = {}
    width = 9
    next_code = FIRST
    out = bytearray()
    prev = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            acc &= (1 << nbits) - 1
            if code == CLEAR:
                table = {}
                width = 9
                next_code = FIRST
                prev = None
                continue
            if code == EOI:
                return bytes(out[:expected])
            if prev is None:
                entry = bytes([code]) if code < 256 else table[code]
            elif code < 256:
                entry = bytes([code])
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:  # KwKwK
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError("corrupt TIFF LZW stream")
            # early change + decoder-lag: grow one entry before the
            # table fills the width, one sooner than the GIF variant
            if next_code == (1 << width) - 2 and width < 12:
                width += 1
            out += entry
            prev = entry
            if len(out) >= expected:
                return bytes(out[:expected])
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI, FIRST = 256, 257, 258
    table: dict[bytes, int] = {}
    width = 9
    next_code = FIRST
    codes: list[tuple[int, int]] = [(CLEAR, width)]
    wbuf = b""
    for byte in data:
        k = wbuf + bytes([byte])
        if len(k) == 1 or k in table:
            wbuf = k
            continue
        codes.append((table[wbuf] if len(wbuf) > 1 else wbuf[0], width))
        table[k] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        if next_code >= 4094:
            codes.append((CLEAR, width))
            table = {}
            width = 9
            next_code = FIRST
        wbuf = bytes([byte])
    if wbuf:
        codes.append((table[wbuf] if len(wbuf) > 1 else wbuf[0], width))
    codes.append((EOI, width))
    acc = nbits = 0
    out = bytearray()
    for code, wd in codes:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF bytes -> (H, W, 3) uint8 RGB (first IFD)."""
    b = bytes(payload)
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    tags = _read_ifd(b, e, struct.unpack_from(e + "I", b, 4)[0])
    w = tags[_TAG_WIDTH][0]
    h = tags[_TAG_HEIGHT][0]
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [8] * spp)
    if any(v != 8 for v in bits):
        raise NotImplementedError(f"TIFF BitsPerSample {bits} (8-bit only)")
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    photo = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    pred = tags.get(_TAG_PREDICTOR, [1])[0]
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags.get(_TAG_STRIP_COUNTS, [len(b) - offsets[0]])
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]

    raw = bytearray()
    rows_left = h
    for off, cnt in zip(offsets, counts):
        strip_rows = min(rps, rows_left)
        rows_left -= strip_rows
        expected = strip_rows * w * spp
        chunk = b[off: off + cnt]
        if comp == 1:
            raw += chunk[:expected]
        elif comp == 5:
            raw += _tiff_lzw_decode(chunk, expected)
        elif comp in (8, 32946):
            raw += zlib.decompress(chunk)[:expected]
        elif comp == 32773:
            raw += _packbits_decode(chunk, expected)
        else:
            raise NotImplementedError(f"TIFF compression {comp}")
    img = np.frombuffer(bytes(raw), dtype="uint8")[: h * w * spp]
    img = img.reshape(h, w, spp).copy()
    if pred == 2:  # horizontal differencing: undo by cumulative sum
        img = np.cumsum(img.astype("uint32"), axis=1, dtype="uint32")
        img = (img & 0xFF).astype("uint8")
    elif pred != 1:
        raise NotImplementedError(f"TIFF predictor {pred}")

    if photo == 3:  # palette: ColorMap holds 16-bit R..G..B ramps
        cm = tags[_TAG_COLORMAP]
        n = len(cm) // 3
        pal = (np.array(cm, dtype="uint32").reshape(3, n).T >> 8).astype("uint8")
        return pal[np.minimum(img[:, :, 0], n - 1)]
    if photo in (0, 1):
        g = img[:, :, 0]
        if photo == 0:  # WhiteIsZero
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    if photo == 2:
        return np.ascontiguousarray(img[:, :, :3])
    raise NotImplementedError(f"TIFF photometric {photo}")


def encode_tiff(img, compression: int = 1, predictor: int = 1,
                rows_per_strip: int | None = None,
                byte_order: str = "<") -> bytes:
    """numpy (H, W, 3) uint8 RGB -> stripped baseline TIFF."""
    img = np.asarray(img, dtype="uint8")
    h, w = img.shape[:2]
    spp = 3
    e = byte_order
    rps = rows_per_strip or h
    data = img
    if predictor == 2:
        d = img.astype("int16")
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        data = (d & 0xFF).astype("uint8")
    strips = []
    for y0 in range(0, h, rps):
        rows = data[y0: y0 + rps].tobytes()
        if compression == 1:
            strips.append(rows)
        elif compression == 5:
            strips.append(_tiff_lzw_encode(rows))
        elif compression == 8:
            strips.append(zlib.compress(rows))
        elif compression == 32773:
            strips.append(_packbits_encode(rows))
        else:
            raise NotImplementedError(f"TIFF compression {compression}")

    header = struct.pack(e + "2sHI", b"II" if e == "<" else b"MM", 42, 8)
    # layout: header(8) | IFD | out-of-line values | strips
    n_entries = 10
    ifd_size = 2 + 12 * n_entries + 4
    val_off = 8 + ifd_size
    extra = bytearray()

    def arr_val(values, typ):
        nonlocal extra
        fmt = _TYPE_FMT[typ]
        size = _TYPE_SIZE[typ] * len(values)
        if size <= 4:
            packed = struct.pack(e + fmt * len(values), *values)
            return packed.ljust(4, b"\x00")
        off = val_off + len(extra)
        extra += struct.pack(e + fmt * len(values), *values)
        return struct.pack(e + "I", off)

    # strip offsets resolve after we know the value-block size; reserve
    n_strips = len(strips)
    entries = []

    def entry(tag, typ, cnt, raw4):
        entries.append(struct.pack(e + "HHI", tag, typ, cnt) + raw4)

    entry(_TAG_WIDTH, 4, 1, struct.pack(e + "I", w))
    entry(_TAG_HEIGHT, 4, 1, struct.pack(e + "I", h))
    entry(_TAG_BITS, 3, 3, arr_val([8, 8, 8], 3))
    entry(_TAG_COMPRESSION, 3, 1, struct.pack(e + "HH", compression, 0))
    entry(_TAG_PHOTOMETRIC, 3, 1, struct.pack(e + "HH", 2, 0))
    strip_off_pos = len(entries)
    entry(_TAG_STRIP_OFFSETS, 4, n_strips, b"\x00\x00\x00\x00")
    entry(_TAG_SPP, 3, 1, struct.pack(e + "HH", spp, 0))
    entry(_TAG_ROWS_PER_STRIP, 4, 1, struct.pack(e + "I", rps))
    entry(_TAG_STRIP_COUNTS, 4, n_strips,
          arr_val([len(s) for s in strips], 4))
    entry(_TAG_PREDICTOR, 3, 1, struct.pack(e + "HH", predictor, 0))

    # now place strips after the extra block and fill in their offsets
    strips_base = val_off + len(extra) + (4 * n_strips if n_strips > 1 else 0)
    offs = []
    pos = strips_base
    for s in strips:
        offs.append(pos)
        pos += len(s)
    if n_strips == 1:
        entries[strip_off_pos] = struct.pack(
            e + "HHI", _TAG_STRIP_OFFSETS, 4, 1) + struct.pack(e + "I", offs[0])
    else:
        off = val_off + len(extra)
        entries[strip_off_pos] = struct.pack(
            e + "HHI", _TAG_STRIP_OFFSETS, 4, n_strips) + struct.pack(e + "I", off)
        extra += struct.pack(e + "I" * n_strips, *offs)

    ifd = struct.pack(e + "H", n_entries) + b"".join(entries) + b"\x00\x00\x00\x00"
    return header + ifd + bytes(extra) + b"".join(strips)
