"""Multimodal column plumbing (extension surface).

Pattern: media as opaque `binary` payload + typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over mapInPandas. Real pure-Python codec decoders for
the self-describing formats live in this package (BMP/PNG/WAV below,
JPEG in ops/jpeg.py, TIFF in ops/tiff.py, FLAC in ops/flac.py,
AVI/QOI in ops/video.py); only codecs whose decode tables can't be
validated in this container (MPEG audio frames, H.264 samples) gate
by name.
Everything Spark-side — schema, batch iteration, partitioning, UDF
signatures — is real and tested.

Scale design: payloads stay columnar (Arrow) end to end; mapInPandas
streams record batches so a partition never fully materializes; feature
extraction parallelism == partition count; metadata-only queries never
touch the payload column (Parquet column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, kind string, n_bytes bigint, feat_mean double, feat_dim int"
)


def attach_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture:
    binary payload + metadata struct (kind, n_bytes, checksum)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("kind"),
            F.octet_length(payload).alias("n_bytes"),
            F.crc32(payload).alias("checksum"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> list[float]:
    """STUB decode kernel — stands in for image/audio decode (PIL /
    torchaudio / ffmpeg are not in this container). Deterministic fake:
    8 "features" from byte statistics. Swap this single function for a
    real decoder; the Spark plumbing around it is unchanged."""
    if payload is None:
        raise NotImplementedError("real media decode requires codec libs")
    b = payload[:1024]
    n = max(len(b), 1)
    return [sum(b) / n / 255.0 + i * 0.0 for i in range(8)]


def extract_features(df: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas feature extraction over (id, payload, meta).

    Arrow record batches in, pandas out — the canonical shape for any
    per-row media kernel (decode, resize, embed).

    ``decoder`` is the pluggable-model seam: a callable
    ``(bytes) -> list[float]`` (a real PIL/torchaudio/ffmpeg feature
    extractor loaded per executor) that replaces :func:`decode_stub`
    inside the same kernel — schema and plumbing unchanged. Default
    None keeps the documented deterministic stub as the fixture
    default."""
    decode = decoder or decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: decode(bytes(p)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feat_mean": feats.map(lambda f: round(sum(f) / len(f), 6)),
                    "feat_dim": feats.map(len),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


PROBE_SCHEMA = "doc_id bigint, format string, width int, height int, n_bytes bigint"


def _isobmff_ispe(b: bytes):
    """(width, height) from the first ispe (ImageSpatialExtents)
    property box of an ISOBMFF (AVIF/HEIC) payload: walk
    meta -> iprp -> ipco -> ispe, skipping fullbox headers."""
    import struct

    def walk(start: int, end: int, depth: int = 0):
        pos = start
        while pos + 8 <= end:
            size, typ = struct.unpack_from(">I4s", b, pos)
            hdr = 8
            if size == 1 and pos + 16 <= end:  # 64-bit largesize
                size = struct.unpack_from(">Q", b, pos + 8)[0]
                hdr = 16
            if size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                return None
            if typ == b"ispe" and pos + hdr + 12 <= end:
                w, h = struct.unpack_from(">II", b, pos + hdr + 4)
                return w, h
            if typ in (b"meta", b"iprp", b"ipco") and depth < 6:
                body = pos + hdr + (4 if typ == b"meta" else 0)  # fullbox
                found = walk(body, pos + size, depth + 1)
                if found:
                    return found
            pos += size
        return None

    return walk(0, len(b))


def probe_image_header(payload: bytes):
    """REAL (not stubbed) image metadata: container headers carry
    dimensions without any codec — PNG IHDR, JPEG SOFn scan, GIF
    logical screen, BMP info header. The reference's image format
    plugin (contrib/format-image) reads exactly this metadata tier.
    Returns (format, width, height) or ('unknown', None, None)."""
    import struct

    b = payload or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if b[:3] == b"GIF" and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return "bmp", w, abs(h)
    if len(b) >= 128 and b[0] == 0x0A and b[1] in (0, 2, 3, 5) and b[2] in (0, 1):
        x0, y0, x1, y1 = struct.unpack("<HHHH", b[4:12])
        return "pcx", x1 - x0 + 1, y1 - y0 + 1
    if b[:1] == b"P" and b[1:2] in b"123456" and b[2:3].isspace():
        toks = []
        i = 2
        while len(toks) < 2 and i < min(len(b), 256):
            if b[i:i + 1] == b"#":
                while i < len(b) and b[i] not in (10, 13):
                    i += 1
            elif b[i:i + 1].isspace():
                i += 1
            else:
                j = i
                while j < len(b) and not b[j:j + 1].isspace():
                    j += 1
                try:
                    toks.append(int(b[i:j]))
                except ValueError:
                    return "pnm", None, None
                i = j
        return ("pnm", toks[0], toks[1]) if len(toks) == 2 else ("pnm", None, None)
    if b[:4] == b"qoif" and len(b) >= 12:
        w, h = struct.unpack(">II", b[4:12])
        return "qoi", w, h
    if b[:4] == b"\x00\x00\x01\x00" and len(b) >= 22:
        count = struct.unpack("<H", b[4:6])[0]
        best = (0, 0)
        for i in range(count):
            if 6 + 16 * i + 2 > len(b):
                break
            w = b[6 + 16 * i] or 256
            h = b[7 + 16 * i] or 256
            if w * h > best[0] * best[1]:
                best = (w, h)
        return "ico", best[0] or None, best[1] or None
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        from drill_spark.ops.tiff import probe_tiff_header

        dims = probe_tiff_header(b)
        return ("tiff", *dims) if dims else ("tiff", None, None)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP" and len(b) >= 16:
        kind = b[12:16]
        if kind == b"VP8X" and len(b) >= 30:  # extended: 24-bit canvas minus one
            w = int.from_bytes(b[24:27], "little") + 1
            h = int.from_bytes(b[27:30], "little") + 1
            return "webp", w, h
        if kind == b"VP8L" and len(b) >= 25 and b[20] == 0x2F:  # lossless
            bits = int.from_bytes(b[21:25], "little")
            return "webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
        if kind == b"VP8 " and len(b) >= 30 and b[23:26] == b"\x9d\x01\x2a":
            w = int.from_bytes(b[26:28], "little") & 0x3FFF
            h = int.from_bytes(b[28:30], "little") & 0x3FFF
            return "webp", w, h
        return "webp", None, None
    if len(b) >= 12 and b[4:8] == b"ftyp" and b[8:12] in (
            b"avif", b"avis", b"heic", b"heix", b"mif1"):
        kind = "avif" if b[8:12] in (b"avif", b"avis") else "heic"
        dims = _isobmff_ispe(b)
        return (kind, *dims) if dims else (kind, None, None)
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF marker
        pos = 2
        while pos + 9 < len(b) and b[pos] == 0xFF:
            marker, seglen = b[pos + 1], int.from_bytes(b[pos + 2 : pos + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[pos + 5 : pos + 9])
                return "jpeg", w, h
            pos += 2 + seglen
        return "jpeg", None, None
    return "unknown", None, None


def probe_images(df: DataFrame) -> DataFrame:
    """mapInPandas header probe over (doc_id, payload): real metadata
    extraction (format + dimensions) with zero decode work per row —
    the cheap first pass a media pipeline runs before deciding what to
    decode at all."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = pdf["payload"].map(lambda p: probe_image_header(bytes(p)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": probed.map(lambda t: t[0]),
                    "width": probed.map(lambda t: t[1]),
                    "height": probed.map(lambda t: t[2]),
                    "n_bytes": pdf["payload"].map(lambda p: len(bytes(p))),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=PROBE_SCHEMA)


# -------------------------------------------------- mpeg audio probe

# public ISO 11172-3 / 13818-3 header tables (kbps / Hz)
_MPEG_BITRATES = {
    # (version_group, layer) -> 14 bitrates; version_group: 1=MPEG1, 2=MPEG2/2.5
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MPEG_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _mpeg_frame_header(b: bytes, pos: int):
    """Parse one MPEG audio frame header at pos; returns (frame_size,
    samples_per_frame, sample_rate, bitrate_kbps, channels, layer,
    version) or None if pos doesn't hold a valid header."""
    if pos + 4 > len(b):
        return None
    h = int.from_bytes(b[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (h >> 19) & 3        # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer_bits = (h >> 17) & 3      # 3=Layer I, 2=Layer II, 1=Layer III
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    if ver_bits == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    layer = 4 - layer_bits
    vgroup = 1 if ver_bits == 3 else 2
    bitrate = _MPEG_BITRATES[(vgroup, layer)][br_idx - 1] * 1000
    rate = _MPEG_RATES[ver_bits][sr_idx]
    if layer == 1:
        frame_size = (12 * bitrate // rate + padding) * 4
        samples = 384
    else:
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        frame_size = samples // 8 * bitrate // rate + padding
    channels = 1 if mode == 3 else 2
    version = {3: "1", 2: "2", 0: "2.5"}[ver_bits]
    return frame_size, samples, rate, bitrate // 1000, channels, layer, version


def _syncsafe(n: int) -> bytes:
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])


def build_id3v2(tags: dict[str, str]) -> bytes:
    """Spec-built ID3v2.4 tag (id3.org structure): text frames with
    UTF-8 encoding, syncsafe sizes — fixture generator, independent of
    the parser."""
    frames = b""
    for fid, text in tags.items():
        payload = b"\x03" + text.encode("utf-8")
        frames += fid.encode("latin1") + _syncsafe(len(payload)) + b"\x00\x00" + payload
    return b"ID3\x04\x00\x00" + _syncsafe(len(frames)) + frames


# v2.2 3-char frame ids -> the v2.3/2.4 4-char ids callers key on
_ID3V22_IDS = {"TT2": "TIT2", "TP1": "TPE1", "TAL": "TALB", "TYE": "TYER",
               "TRK": "TRCK", "TCO": "TCON"}


def _parse_id3v22(b: bytes) -> dict[str, str]:
    """ID3v2.2 layout (the old iTunes tag): 3-byte frame ids, 3-byte
    big-endian sizes, no frame flags; text encodings 0 (latin-1) and
    1 (UTF-16 with BOM). Ids are mapped to their v2.3 successors."""
    size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
    pos, end = 10, min(10 + size, len(b))
    out: dict[str, str] = {}
    while pos + 6 <= end:
        fid = b[pos:pos + 3]
        if fid == b"\x00\x00\x00":
            break
        fsz = int.from_bytes(b[pos + 3:pos + 6], "big")
        data = b[pos + 6:pos + 6 + fsz]
        if fid[:1] == b"T" and data:
            enc, body = data[0], data[1:]
            try:
                txt = body.decode("utf-16" if enc == 1 else "latin-1")
                out[_ID3V22_IDS.get(fid.decode("latin1"),
                                    fid.decode("latin1"))] = txt.rstrip("\x00")
            except (UnicodeDecodeError, LookupError):
                pass
        pos += 6 + fsz
    return out


def parse_id3v2(payload: bytes) -> dict[str, str]:
    """REAL ID3v2 text-frame parser (v2.2 + v2.3 + v2.4 from the public
    spec): syncsafe tag size, per-frame size form by version, extended
    headers skipped, text encodings
    0/1/2/3 (latin-1 / UTF-16 BOM / UTF-16BE / UTF-8). Returns
    {frame_id: text} for T*** frames; {} when no tag."""
    b = bytes(payload or b"")
    if b[:3] != b"ID3" or len(b) < 10:
        return {}
    ver = b[3]
    if ver == 2:
        return _parse_id3v22(b)
    if ver < 2:
        return {}
    flags = b[5]
    size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
    pos, end = 10, min(10 + size, len(b))
    if flags & 0x40 and pos + 4 <= end:
        # extended header precedes the frames: v2.4 stores its total
        # size syncsafe (self-inclusive), v2.3 big-endian EXCLUDING the
        # 4 size bytes themselves
        if ver >= 4:
            ext = (b[pos] << 21) | (b[pos + 1] << 14) | (b[pos + 2] << 7) | b[pos + 3]
        else:
            ext = int.from_bytes(b[pos:pos + 4], "big") + 4
        pos += ext
    out: dict[str, str] = {}
    while pos + 10 <= end:
        fid = b[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break
        if ver >= 4:  # v2.4 frame sizes are syncsafe
            fsz = (b[pos + 4] << 21) | (b[pos + 5] << 14) | (b[pos + 6] << 7) | b[pos + 7]
        else:
            fsz = int.from_bytes(b[pos + 4:pos + 8], "big")
        data = b[pos + 10:pos + 10 + fsz]
        if fid[:1] == b"T" and data:
            enc, body = data[0], data[1:]
            try:
                if enc == 0:
                    txt = body.decode("latin-1")
                elif enc == 1:
                    txt = body.decode("utf-16")
                elif enc == 2:
                    txt = body.decode("utf-16-be")
                else:
                    txt = body.decode("utf-8")
                out[fid.decode("latin1")] = txt.rstrip("\x00")
            except (UnicodeDecodeError, LookupError):
                pass
        pos += 10 + fsz
    return out


def probe_mpeg_audio(payload: bytes) -> dict:
    """REAL MPEG audio (MP3/MP2/MP1) metadata from the public frame
    header layout (ISO 11172-3 §2.4.1.3): walks every frame (ID3v2 tag
    skipped via its syncsafe size), so VBR streams report the true
    per-frame bitrate mix. Returns layer/version/sample_rate/channels/
    n_frames/duration_s/bitrate_kbps (average). Full psychoacoustic
    sample decode stays behind the labeled stub boundary."""
    b = bytes(payload or b"")
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        pos = 10 + (
            (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
        )
    n_frames = 0
    total_samples = 0
    bitrate_sum = 0
    first = None
    while pos < len(b):
        hdr = _mpeg_frame_header(b, pos)
        if hdr is None:
            if n_frames == 0:
                pos += 1  # resync scan before the first frame only
                continue
            break
        frame_size, samples, rate, kbps, channels, layer, version = hdr
        if first is None:
            first = (rate, channels, layer, version)
        n_frames += 1
        total_samples += samples
        bitrate_sum += kbps
        pos += max(frame_size, 4)
    if first is None:
        raise NotImplementedError("no MPEG audio frames in payload")
    rate, channels, layer, version = first
    tags = parse_id3v2(b)
    return {
        "kind": f"audio/mpeg-layer{layer}",
        "mpeg_version": version,
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_s": round(total_samples / rate, 4),
        "bitrate_kbps": round(bitrate_sum / n_frames, 1),
        "title": tags.get("TIT2"),
        "artist": tags.get("TPE1"),
    }


def build_mpeg_frames(
    n_frames: int, layer: int = 3, bitrate_kbps: int = 128,
    sample_rate: int = 44100, channels: int = 2,
) -> bytes:
    """Spec-built MPEG audio stream: valid frame headers + silent
    payload bytes (fixture generator — built from the header tables, so
    tests of the walker don't depend on the walker)."""
    sr_idx = _MPEG_RATES[3].index(sample_rate)
    br_idx = _MPEG_BITRATES[(1, layer)].index(bitrate_kbps) + 1
    layer_bits = 4 - layer
    mode = 3 if channels == 1 else 0
    h = (
        (0x7FF << 21) | (3 << 19) | (layer_bits << 17) | (1 << 16)
        | (br_idx << 12) | (sr_idx << 10) | (0 << 9) | (mode << 6)
    )
    if layer == 1:
        frame_size = (12 * bitrate_kbps * 1000 // sample_rate) * 4
    else:
        frame_size = 144 * bitrate_kbps * 1000 // sample_rate
    frame = h.to_bytes(4, "big") + b"\x00" * (frame_size - 4)
    return frame * n_frames


# ----------------------------------------------------- real codecs
#
# The container ships no media libraries, but BMP, PNG and WAV are
# fully decodable with stdlib struct/zlib + numpy — so one REAL codec
# path exercises the mapInPandas plumbing end to end (the other
# formats keep the labeled stubs below).


def encode_bmp(arr) -> bytes:
    """numpy (H, W, 3) uint8 -> 24-bit BI_RGB BMP."""
    import struct

    import numpy as np

    arr = np.asarray(arr, dtype="uint8")
    h, w, _ = arr.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += arr[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    off = 14 + 40
    size = off + len(body)
    head = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return head + info + bytes(body)


def decode_bmp(payload: bytes):
    """BMP -> numpy (H, W, 3) uint8: 24/32-bit BI_RGB plus 8/4-bit
    paletted images with BI_RLE8/BI_RLE4 run-length compression
    (delta/EOL/EOB escapes per the spec)."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0] if hdr_size >= 40 else 0
    flip = h > 0
    h = abs(h)
    if comp in (1, 2) and bpp in (4, 8):
        n_colors = struct.unpack_from("<I", payload, 46)[0] or (1 << bpp)
        pal = np.frombuffer(
            payload[14 + hdr_size: 14 + hdr_size + 4 * n_colors], dtype="uint8"
        ).reshape(n_colors, 4)[:, [2, 1, 0]]
        idx = np.zeros((h, w), dtype="uint8")
        x = y = 0
        i = off
        while i + 1 < len(payload):
            a, b_ = payload[i], payload[i + 1]
            i += 2
            if a:  # encoded run of a pixels
                if comp == 1:
                    vals = [b_] * a
                else:  # RLE4: two alternating nibbles
                    vals = [(b_ >> 4) if k % 2 == 0 else (b_ & 0x0F)
                            for k in range(a)]
                for v in vals:
                    if x < w and y < h:
                        idx[y, x] = v
                    x += 1
            elif b_ == 0:  # end of line
                x, y = 0, y + 1
            elif b_ == 1:  # end of bitmap
                break
            elif b_ == 2:  # delta
                x += payload[i]
                y += payload[i + 1]
                i += 2
            else:  # absolute mode: b_ literal pixels, word-aligned
                if comp == 1:
                    lits = list(payload[i: i + b_])
                    i += (b_ + 1) & ~1
                else:
                    nbytes = (b_ + 1) // 2
                    raw = payload[i: i + nbytes]
                    lits = []
                    for k in range(b_):
                        byte = raw[k // 2]
                        lits.append((byte >> 4) if k % 2 == 0 else (byte & 0x0F))
                    i += (nbytes + 1) & ~1
                for v in lits:
                    if x < w and y < h:
                        idx[y, x] = v
                    x += 1
        img = pal[np.minimum(idx, len(pal) - 1)]
        return img[::-1] if flip else img
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    nb = bpp // 8
    stride = (w * nb + 3) // 4 * 4
    rows = []
    for y in range(h):
        rowb = payload[off + y * stride: off + y * stride + w * nb]
        px = np.frombuffer(rowb, dtype="uint8").reshape(w, nb)[:, :3][:, ::-1]  # BGR->RGB
        rows.append(px)
    img = np.stack(rows)
    return img[::-1] if flip else img


# Adam7 pass layout (PNG spec 8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def decode_png(payload: bytes):
    """PNG -> numpy (H, W, 3) uint8: gray / RGB / gray+alpha / RGBA /
    palette color types, bit depths 1/2/4/8/16 (16-bit keeps the high
    byte, the spec's 8-bit reduction), Adam7 interlacing — pure zlib +
    the PNG filter/serialization spec."""
    import struct
    import zlib

    import numpy as np

    from drill_spark.readers.pdf_core import _png_predictor

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    plte = None
    w = h = bitd = ctype = interlace = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8: pos + 8 + ln]
        if typ == b"IHDR":
            w, h, bitd, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype="uint8").reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG without PLTE chunk")
    raw = zlib.decompress(bytes(idat))

    def depass(buf: bytes, pw: int, ph: int) -> np.ndarray:
        """One (sub-)image's filtered scanlines -> (ph, pw, channels)
        uint8 samples with the bit depth expanded."""
        unflt = _png_predictor(buf, channels, bitd, pw)
        if bitd == 8:
            arr = np.frombuffer(unflt, dtype="uint8")
            return arr.reshape(ph, pw, channels)
        if bitd == 16:
            arr = np.frombuffer(unflt, dtype=">u2").reshape(ph, pw, channels)
            return (arr >> 8).astype("uint8")
        # 1/2/4-bit: unpack MSB-first per scanline (channels is 1 here)
        stride = (pw * bitd + 7) // 8
        rows = np.frombuffer(unflt, dtype="uint8").reshape(ph, stride)
        bits = np.unpackbits(rows, axis=1)[:, : pw * bitd].reshape(ph, pw, bitd)
        vals = (bits * (1 << np.arange(bitd - 1, -1, -1))).sum(axis=2)
        return vals.astype("uint8")[:, :, None]

    if interlace:
        img = np.zeros((h, w, channels), dtype="uint8")
        pos = 0
        for xs, ys, xst, yst in _ADAM7:
            pw = (w - xs + xst - 1) // xst
            ph = (h - ys + yst - 1) // yst
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * channels * bitd + 7) // 8
            nbytes = ph * (1 + stride)
            img[ys::yst, xs::xst] = depass(raw[pos: pos + nbytes], pw, ph)
            pos += nbytes
    else:
        img = depass(raw, w, h)

    if ctype == 3:
        return plte[img[:, :, 0]]
    if ctype == 0 and bitd < 8:  # scale sub-8-bit gray to full range
        img = (img.astype("uint16") * 255 // ((1 << bitd) - 1)).astype("uint8")
    if channels == 1:
        return np.repeat(img, 3, axis=2)
    if channels == 2:  # gray+alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(img[:, :, :3])


def _gif_lzw_decode(data: bytes, min_code: int, npix: int) -> bytes:
    """GIF-variant LZW (spec Appendix F): little-endian bit packing,
    variable code width min_code+1..12, CLEAR resets the table, KwKwK
    case handled. Returns exactly npix index bytes."""
    clear = 1 << min_code
    eoi = clear + 1
    table = {i: bytes([i]) for i in range(clear)}
    width = min_code + 1
    next_code = eoi + 1
    out = bytearray()
    prev = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = {i: bytes([i]) for i in range(clear)}
                width = min_code + 1
                next_code = eoi + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out[:npix])
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:  # KwKwK
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError("corrupt GIF LZW stream")
            # the decoder's table is one entry behind the encoder's, so
            # the width grows one step early (the classic LZW off-by-one)
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            out += entry
            prev = entry
            if len(out) >= npix:
                return bytes(out[:npix])
    return bytes(out[:npix])


# GIF interlace passes (spec section 20): (row_start, row_step)
_GIF_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


def decode_gif(payload: bytes):
    """First frame of a GIF87a/89a -> numpy (H, W, 3) uint8: logical
    screen + global/local color tables, extension-block skipping, the
    GIF LZW variant, four-pass row interlacing; transparency is
    flattened (the canvas starts at the background color)."""
    import struct

    import numpy as np

    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(b[pos: pos + 3 * n], dtype="uint8").reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype="uint8")
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(b) and b[pos]:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 7)
            pal = np.frombuffer(b[pos: pos + 3 * n], dtype="uint8").reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image with no color table")
        min_code = b[pos]
        pos += 1
        data = bytearray()
        while pos < len(b) and b[pos]:
            ln = b[pos]
            data += b[pos + 1: pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # block terminator
        idx = np.frombuffer(
            _gif_lzw_decode(bytes(data), min_code, iw * ih), dtype="uint8"
        ).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            ordered = np.empty_like(idx)
            src = 0
            for start, step in _GIF_INTERLACE:
                rows = range(start, ih, step)
                ordered[list(rows)] = idx[src: src + len(rows)]
                src += len(rows)
            idx = ordered
        canvas[top: top + ih, left: left + iw] = pal[np.minimum(idx, len(pal) - 1)]
        return canvas  # first frame only
    return canvas


def decode_qoi(payload: bytes):
    """QOI ("Quite OK Image", qoiformat.org spec): the run/diff/luma/
    index/literal chunk stream with the 64-slot color hash ->
    (H, W, 3) uint8 RGB (alpha dropped)."""
    import struct

    import numpy as np

    b = bytes(payload)
    if b[:4] != b"qoif":
        raise ValueError("not a QOI")
    w, h = struct.unpack_from(">II", b, 4)
    n_px = w * h
    out = np.zeros((n_px, 4), dtype="uint8")
    index = [(0, 0, 0, 0)] * 64
    r, g, bl, a = 0, 0, 0, 255
    i, px = 14, 0
    while px < n_px and i < len(b):
        c = b[i]
        i += 1
        if c == 0xFE:  # RGB
            r, g, bl = b[i], b[i + 1], b[i + 2]
            i += 3
        elif c == 0xFF:  # RGBA
            r, g, bl, a = b[i], b[i + 1], b[i + 2], b[i + 3]
            i += 4
        else:
            tag = c >> 6
            if tag == 0:  # INDEX
                r, g, bl, a = index[c & 0x3F]
            elif tag == 1:  # DIFF, bias 2
                r = (r + ((c >> 4) & 3) - 2) & 0xFF
                g = (g + ((c >> 2) & 3) - 2) & 0xFF
                bl = (bl + (c & 3) - 2) & 0xFF
            elif tag == 2:  # LUMA
                dg = (c & 0x3F) - 32
                d2 = b[i]
                i += 1
                r = (r + dg + ((d2 >> 4) & 0x0F) - 8) & 0xFF
                g = (g + dg) & 0xFF
                bl = (bl + dg + (d2 & 0x0F) - 8) & 0xFF
            else:  # RUN, bias -1
                run = (c & 0x3F) + 1
                out[px: px + run] = (r, g, bl, a)
                px += run
                index[(r * 3 + g * 5 + bl * 7 + a * 11) % 64] = (r, g, bl, a)
                continue
        out[px] = (r, g, bl, a)
        px += 1
        index[(r * 3 + g * 5 + bl * 7 + a * 11) % 64] = (r, g, bl, a)
    return np.ascontiguousarray(out[:, :3].reshape(h, w, 3))


def encode_qoi(img) -> bytes:
    """numpy (H, W, 3) uint8 RGB -> QOI bytes (all five chunk ops)."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype="uint8")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    out = bytearray(b"qoif" + struct.pack(">IIBB", w, h, 3, 0))
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for r, g, b_ in flat:
        r, g, b_ = int(r), int(g), int(b_)
        if (r, g, b_) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        key = (r * 3 + g * 5 + b_ * 7 + 255 * 11) % 64
        if index[key] == (r, g, b_, 255):
            out.append(key)
        else:
            dr = (r - pr) & 0xFF
            dg = (g - pg) & 0xFF
            db = (b_ - pb) & 0xFF
            sdr = dr - 256 if dr > 127 else dr
            sdg = dg - 256 if dg > 127 else dg
            sdb = db - 256 if db > 127 else db
            if -2 <= sdr <= 1 and -2 <= sdg <= 1 and -2 <= sdb <= 1:
                out.append(0x40 | ((sdr + 2) << 4) | ((sdg + 2) << 2) | (sdb + 2))
            elif -32 <= sdg <= 31 and -8 <= sdr - sdg <= 7 and -8 <= sdb - sdg <= 7:
                out.append(0x80 | (sdg + 32))
                out.append(((sdr - sdg + 8) << 4) | (sdb - sdg + 8))
            else:
                out += bytes([0xFE, r, g, b_])
        index[key] = (r, g, b_, 255)
        pr, pg, pb = r, g, b_
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def decode_pnm(payload: bytes):
    """NetPBM P1-P6 (the interchange staple of image pipelines):
    ASCII and binary bitmap/graymap/pixmap, comment-tolerant headers,
    maxval scaling incl. 16-bit -> (H, W, 3) uint8 RGB."""
    import numpy as np

    b = bytes(payload)
    if b[:1] != b"P" or b[1:2] not in b"123456":
        raise ValueError("not a PNM")
    kind = int(b[1:2])

    # header tokens with '#' comments; returns (tokens, data offset)
    toks, i, n = [], 2, len(b)
    need = 2 if kind in (1, 4) else 3
    while len(toks) < need and i < n:
        c = b[i:i + 1]
        if c == b"#":
            while i < n and b[i] not in (10, 13):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not b[j:j + 1].isspace() and b[j:j + 1] != b"#":
                j += 1
            toks.append(int(b[i:j]))
            i = j
    i += 1  # single whitespace after the header
    w, h = toks[0], toks[1]
    maxval = toks[2] if need == 3 else 1

    if kind in (1, 2, 3):  # ASCII
        vals = np.array(b[i - 1:].split(), dtype="int64")
        if kind == 1:  # bitmap: 1 = black
            img = (1 - vals[: w * h]).reshape(h, w) * 255
            return np.repeat(img[:, :, None], 3, axis=2).astype("uint8")
        if kind == 2:
            g = (vals[: w * h].reshape(h, w) * 255 // maxval).astype("uint8")
            return np.repeat(g[:, :, None], 3, axis=2)
        px = (vals[: w * h * 3].reshape(h, w, 3) * 255 // maxval)
        return px.astype("uint8")

    data = b[i:]
    if kind == 4:  # packed bits, MSB first, row-padded
        stride = (w + 7) // 8
        rows = np.frombuffer(data[: h * stride], dtype="uint8").reshape(h, stride)
        bits = np.unpackbits(rows, axis=1)[:, :w]
        img = (1 - bits) * 255
        return np.repeat(img[:, :, None], 3, axis=2).astype("uint8")
    ch = 1 if kind == 5 else 3
    if maxval > 255:  # 16-bit big-endian samples
        arr = np.frombuffer(data[: h * w * ch * 2], dtype=">u2").astype("int64")
    else:
        arr = np.frombuffer(data[: h * w * ch], dtype="uint8").astype("int64")
    arr = (arr * 255 // maxval).astype("uint8").reshape(h, w, ch)
    return np.repeat(arr, 3, axis=2) if ch == 1 else arr


def decode_ico(payload: bytes):
    """Windows ICO: pick the largest directory entry; PNG-compressed
    entries dispatch to decode_png, classic DIB entries decode the
    doubled-height BITMAPINFOHEADER (XOR image; the AND mask is
    flattened away) -> (H, W, 3) uint8 RGB."""
    import struct

    import numpy as np

    b = bytes(payload)
    _z, typ, count = struct.unpack_from("<HHH", b, 0)
    if typ not in (1, 2) or count == 0:
        raise ValueError("not an ICO")
    best = None
    for i in range(count):
        w8, h8, _pal, _z2, _planes, _bpp, size, off = struct.unpack_from(
            "<BBBBHHII", b, 6 + 16 * i)
        w = w8 or 256
        h = h8 or 256
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, size, off)
    w, h, size, off = best
    sub = b[off: off + size]
    if sub[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(sub)
    # classic DIB: BITMAPINFOHEADER with DOUBLED height (XOR + AND)
    hsz, bw, bh2, _pl, bpp = struct.unpack_from("<IiiHH", sub, 0)
    bh = bh2 // 2
    pos = hsz
    pal = None
    if bpp <= 8:
        n = 1 << bpp
        pal = np.frombuffer(sub[pos: pos + 4 * n], dtype="uint8").reshape(n, 4)
        pos += 4 * n
    if bpp == 32:
        stride = bw * 4
        rows = np.frombuffer(sub[pos: pos + stride * bh], dtype="uint8")
        img = rows.reshape(bh, bw, 4)[::-1, :, [2, 1, 0]]
        return np.ascontiguousarray(img)
    if bpp == 24:
        stride = (bw * 3 + 3) & ~3
        img = np.zeros((bh, bw, 3), dtype="uint8")
        for y in range(bh):
            row = np.frombuffer(sub[pos + y * stride: pos + y * stride + bw * 3],
                                dtype="uint8").reshape(bw, 3)
            img[bh - 1 - y] = row[:, [2, 1, 0]]
        return img
    if bpp in (4, 8):
        per = 8 // bpp
        stride = ((bw + per - 1) // per + 3) & ~3
        img = np.zeros((bh, bw, 3), dtype="uint8")
        for y in range(bh):
            row = np.frombuffer(sub[pos + y * stride: pos + (y + 1) * stride],
                                dtype="uint8")
            if bpp == 8:
                idx = row[:bw]
            else:
                hi = row >> 4
                lo = row & 0x0F
                idx = np.stack([hi, lo], axis=1).reshape(-1)[:bw]
            img[bh - 1 - y] = pal[idx][:, [2, 1, 0]]
        return img
    raise NotImplementedError(f"ICO DIB bpp {bpp}")


def decode_tga(payload: bytes):
    """Truevision TGA (spec types 1/2/9/10): color-mapped and
    truecolor images, uncompressed and RLE-packed, 16/24/32-bit
    pixels, origin-bit vertical flip -> (H, W, 3) uint8 RGB."""
    import struct

    import numpy as np

    b = bytes(payload)
    (idlen, cmap_type, img_type, cm_first, cm_len, cm_bits,
     _x0, _y0, w, h, bpp, desc) = struct.unpack_from("<BBBHHBHHHHBB", b, 0)
    pos = 18 + idlen
    cmap = None
    if cmap_type == 1:
        entry = (cm_bits + 7) // 8  # spec entry sizes: 15/16 -> 2 bytes, 24 -> 3, 32 -> 4
        raw = b[pos: pos + cm_len * entry]
        pos += cm_len * entry
        cm = np.frombuffer(raw, dtype="uint8").reshape(cm_len, entry)
        cmap = np.zeros((cm_first + cm_len, 3), dtype="uint8")
        if entry >= 3:
            cmap[cm_first:] = cm[:, [2, 1, 0]]
        elif entry == 2:  # 15/16-bit 5-5-5 entries, same expansion as pixels
            v = cm[:, 0].astype("uint16") | (cm[:, 1].astype("uint16") << 8)
            cmap[cm_first:] = np.stack(
                [((v >> 10) & 31) * 255 // 31,
                 ((v >> 5) & 31) * 255 // 31,
                 (v & 31) * 255 // 31], axis=1).astype("uint8")
        else:
            raise NotImplementedError(f"TGA colormap entry size {cm_bits} bits")
    px_bytes = bpp // 8
    n_px = w * h
    if img_type in (9, 10, 11):  # RLE
        out = bytearray()
        i = pos
        while len(out) < n_px * px_bytes and i < len(b):
            hdr = b[i]
            i += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:  # run packet: one pixel repeated
                out += b[i: i + px_bytes] * count
                i += px_bytes
            else:  # raw packet
                out += b[i: i + px_bytes * count]
                i += px_bytes * count
        raw = bytes(out[: n_px * px_bytes])
    else:
        raw = b[pos: pos + n_px * px_bytes]
    arr = np.frombuffer(raw, dtype="uint8").reshape(h, w, px_bytes)
    if img_type in (1, 9):  # color-mapped: indices through the palette
        img = cmap[np.minimum(arr[:, :, 0], len(cmap) - 1)]
    elif bpp == 16:
        v = arr[:, :, 0].astype("uint16") | (arr[:, :, 1].astype("uint16") << 8)
        img = np.stack([((v >> 10) & 31) * 255 // 31,
                        ((v >> 5) & 31) * 255 // 31,
                        (v & 31) * 255 // 31], axis=2).astype("uint8")
    elif img_type == 3:  # grayscale
        img = np.repeat(arr[:, :, :1], 3, axis=2)
    else:  # BGR[A]
        img = arr[:, :, [2, 1, 0]]
    if not (desc & 0x20):  # origin bottom-left: flip vertical
        img = img[::-1]
    return np.ascontiguousarray(img)


def decode_pcx(payload: bytes):
    """ZSoft PCX: version-5 8-bit paletted (VGA palette trailer) and
    24-bit (3-plane) images with the byte-RLE of the spec ->
    (H, W, 3) uint8 RGB."""
    import struct

    import numpy as np

    b = bytes(payload)
    (magic, _ver, enc, bits, x0, y0, x1, y1) = struct.unpack_from("<BBBBHHHH", b, 0)
    if magic != 0x0A:
        raise ValueError("not a PCX")
    planes = b[65]
    stride = struct.unpack_from("<H", b, 66)[0]
    w, h = x1 - x0 + 1, y1 - y0 + 1
    need = stride * planes * h
    if enc == 1:
        out = bytearray()
        i = 128
        while len(out) < need and i < len(b):
            v = b[i]
            i += 1
            if (v & 0xC0) == 0xC0:
                out += bytes([b[i]]) * (v & 0x3F)
                i += 1
            else:
                out.append(v)
        raw = bytes(out[:need])
    else:
        raw = b[128: 128 + need]
    rows = np.frombuffer(raw, dtype="uint8").reshape(h, planes, stride)
    if bits == 8 and planes == 3:
        return np.ascontiguousarray(rows[:, [0, 1, 2], :w].transpose(0, 2, 1))
    if bits == 8 and planes == 1:
        idx = rows[:, 0, :w]
        if len(b) >= 769 and b[-769] == 0x0C:  # VGA palette trailer
            pal = np.frombuffer(b[-768:], dtype="uint8").reshape(256, 3)
            return pal[idx]
        return np.repeat(idx[:, :, None], 3, axis=2)
    raise NotImplementedError(f"PCX bits={bits} planes={planes}")


def encode_gif(img) -> bytes:
    """numpy (H, W, 3) uint8 -> single-frame GIF89a (global palette
    built from the image's distinct colors — must be <= 256; greedy
    LZW per the spec's Appendix F)."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype="uint8")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    bits = max(2, (len(pal) - 1).bit_length())
    gct = np.zeros((1 << bits, 3), dtype="uint8")
    gct[: len(pal)] = pal
    min_code = max(2, bits)
    clear, eoi = 1 << min_code, (1 << min_code) + 1

    # greedy LZW (mirrors the decoder's growth rule, one entry ahead)
    table = {bytes([i]): i for i in range(clear)}
    next_code, width = eoi + 1, min_code + 1
    codes = [(clear, width)]
    wbuf = b""
    for v in idx.astype("uint8").tobytes():
        k = wbuf + bytes([v])
        if k in table:
            wbuf = k
            continue
        codes.append((table[wbuf], width))
        table[k] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4095:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code, width = eoi + 1, min_code + 1
        wbuf = bytes([v])
    if wbuf:
        codes.append((table[wbuf], width))
    codes.append((eoi, width))
    acc = n = 0
    lzw = bytearray()
    for code, wd in codes:
        acc |= code << n
        n += wd
        while n >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        lzw.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0) + bytes([min_code])
    for i in range(0, len(lzw), 255):
        part = lzw[i: i + 255]
        out += bytes([len(part)]) + part
    out += b"\x00\x3b"
    return bytes(out)


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """numpy float [-1, 1] mono -> 16-bit PCM WAV."""
    import io
    import wave

    import numpy as np

    pcm = (np.clip(np.asarray(samples), -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(pcm.tobytes())
    return buf.getvalue()


def mulaw_decode_byte(c: int) -> int:
    """ITU-T G.711 mu-law expansion (closed-form segment/mantissa
    decode — no lookup table needed; the published table IS this
    formula evaluated over 0..255)."""
    u = ~c & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return -mag if u & 0x80 else mag


def mulaw_encode(val: int) -> int:
    """G.711 mu-law compression of a 16-bit sample."""
    sign = 0x80 if val < 0 else 0
    mag = min((-val if val < 0 else val) + 0x84, 0x7FFF)
    exp = mag.bit_length() - 8  # segment: top bit position above bit 7
    mant = (mag >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def alaw_decode_byte(c: int) -> int:
    """ITU-T G.711 A-law expansion (closed form)."""
    a = c ^ 0x55
    seg = (a >> 4) & 7
    t = (a & 0x0F) << 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


def alaw_encode(val: int) -> int:
    """G.711 A-law compression of a 16-bit sample (13-bit precision)."""
    sign = 0x80 if val >= 0 else 0
    mag = min(val if val >= 0 else -val - 1, 0x7FFF) >> 3  # 13-bit domain
    if mag < 32:
        seg, mant = 0, mag >> 1
    else:
        seg = mag.bit_length() - 5
        mant = (mag >> seg) & 0x0F
    return (sign | (seg << 4) | mant) ^ 0x55


def _wav_chunks(b: bytes):
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return fmt, data


def encode_wav_g711(samples, sample_rate: int = 8000, law: str = "mulaw") -> bytes:
    """numpy float [-1, 1] mono -> G.711-companded WAV (format tag 7
    mu-law / 6 A-law, one byte per sample)."""
    import struct

    import numpy as np

    enc = mulaw_encode if law == "mulaw" else alaw_encode
    tag = 7 if law == "mulaw" else 6
    pcm = (np.clip(np.asarray(samples), -1, 1) * 32767).astype("int64")
    body = bytes(enc(int(v)) for v in pcm)
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    out = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")
    return b"RIFF" + struct.pack("<I", len(out)) + out


def decode_wav(payload: bytes):
    """WAV -> (numpy float32 mono in [-1, 1], sample_rate). PCM
    8/16/24/32-bit, IEEE float 32/64 (format tag 3), plus REAL G.711
    mu-law/A-law expansion (format tags 7/6, the telephony companding
    codecs — closed-form, no tables)."""
    import io
    import struct
    import wave

    import numpy as np

    fmt, data = _wav_chunks(bytes(payload))
    tag, nch, rate = struct.unpack_from("<HHI", fmt, 0)
    if tag in (6, 7):
        table = np.array(
            [(mulaw_decode_byte if tag == 7 else alaw_decode_byte)(c)
             for c in range(256)],
            dtype="float32",
        ) / 32767.0
        x = table[np.frombuffer(data, dtype="uint8")]
        if nch > 1:
            x = x.reshape(-1, nch).mean(axis=1)
        return x, rate
    bits = struct.unpack_from("<H", fmt, 14)[0] if len(fmt) >= 16 else 16
    if tag == 3:  # IEEE float
        x = np.frombuffer(data, dtype="<f4" if bits == 32 else "<f8").astype("float32")
        if nch > 1:
            x = x.reshape(-1, nch).mean(axis=1)
        return x, rate
    if tag == 1 and bits in (24, 32):
        if bits == 24:
            u = np.frombuffer(data, dtype="uint8").reshape(-1, 3).astype("int32")
            v = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
            v = (v ^ 0x800000) - 0x800000  # sign-extend 24 -> 32
            x = v.astype("float32") / 8388607.0
        else:
            x = np.frombuffer(data, dtype="<i4").astype("float32") / 2147483647.0
        if nch > 1:
            x = x.reshape(-1, nch).mean(axis=1)
        return x, rate
    with wave.open(io.BytesIO(payload), "rb") as wv:
        n = wv.getnframes()
        rate = wv.getframerate()
        width = wv.getsampwidth()
        nch = wv.getnchannels()
        raw = wv.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype("float32") / 32767.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype="uint8").astype("float32") - 128.0) / 127.0
    else:
        raise NotImplementedError(f"WAV sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def decode_aiff(payload: bytes):
    """AIFF/AIFF-C -> (numpy float32 mono in [-1, 1], sample_rate):
    IFF chunk walk, the COMM chunk's 80-bit extended-float sample rate
    decoded manually, big-endian PCM 8/16/24/32 from SSND (AIFF-C
    'NONE'/'sowt' compression only; codecs raise by name)."""
    import struct

    import numpy as np

    b = bytes(payload)
    if b[:4] != b"FORM" or b[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF")
    pos = 12
    comm = ssnd = None
    while pos + 8 <= len(b):
        cid, ln = struct.unpack_from(">4sI", b, pos)
        body = b[pos + 8: pos + 8 + ln]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND")
    nch, _nframes, bits = struct.unpack_from(">HIH", comm, 0)
    # 80-bit IEEE 754 extended: 1 sign, 15 exponent (bias 16383),
    # 64-bit explicit-integer-bit mantissa
    se, mant = struct.unpack_from(">HQ", comm, 8)
    exp = se & 0x7FFF
    rate = int(mant * (2.0 ** (exp - 16383 - 63))) if mant else 0
    little = False
    if len(comm) >= 22:  # AIFF-C compression id
        ctype = comm[18:22]
        if ctype == b"sowt":
            little = True
        elif ctype not in (b"NONE", b""):
            raise NotImplementedError(f"AIFF-C compression {ctype!r}")
    off, _blk = struct.unpack_from(">II", ssnd, 0)
    data = ssnd[8 + off:]
    e = "<" if little else ">"
    if bits == 16:
        x = np.frombuffer(data[: len(data) // 2 * 2], dtype=e + "i2").astype("float32") / 32767.0
    elif bits == 8:
        x = np.frombuffer(data, dtype="int8").astype("float32") / 127.0
    elif bits == 24:
        u = np.frombuffer(data[: len(data) // 3 * 3], dtype="uint8").reshape(-1, 3).astype("int32")
        v = ((u[:, 0] << 16) | (u[:, 1] << 8) | u[:, 2]) if not little else \
            ((u[:, 2] << 16) | (u[:, 1] << 8) | u[:, 0])
        v = (v ^ 0x800000) - 0x800000
        x = v.astype("float32") / 8388607.0
    elif bits == 32:
        x = np.frombuffer(data[: len(data) // 4 * 4], dtype=e + "i4").astype("float32") / 2147483647.0
    else:
        raise NotImplementedError(f"AIFF bits {bits}")
    if nch > 1:
        x = x[: len(x) // nch * nch].reshape(-1, nch).mean(axis=1)
    return x, rate


def decode_au(payload: bytes):
    """Sun AU/SND (the classic speech-corpus container) -> (numpy
    float32 mono, sample_rate): big-endian header, encodings 1 (G.711
    mu-law), 2/3/4/5 (linear PCM 8/16/24/32), 27 (A-law)."""
    import struct

    import numpy as np

    b = bytes(payload)
    if b[:4] != b".snd":
        raise ValueError("not an AU")
    off, _size, enc, rate, nch = struct.unpack_from(">IIIII", b, 4)
    data = b[off:]
    if enc == 1:
        table = np.array([mulaw_decode_byte(c) for c in range(256)],
                         dtype="float32") / 32767.0
        x = table[np.frombuffer(data, dtype="uint8")]
    elif enc == 27:
        table = np.array([alaw_decode_byte(c) for c in range(256)],
                         dtype="float32") / 32767.0
        x = table[np.frombuffer(data, dtype="uint8")]
    elif enc == 2:
        x = np.frombuffer(data, dtype="int8").astype("float32") / 127.0
    elif enc == 3:
        x = np.frombuffer(data[: len(data) // 2 * 2], dtype=">i2").astype("float32") / 32767.0
    elif enc == 4:
        u = np.frombuffer(data[: len(data) // 3 * 3], dtype="uint8").reshape(-1, 3).astype("int32")
        v = (u[:, 0] << 16) | (u[:, 1] << 8) | u[:, 2]
        v = (v ^ 0x800000) - 0x800000
        x = v.astype("float32") / 8388607.0
    elif enc == 5:
        x = np.frombuffer(data[: len(data) // 4 * 4], dtype=">i4").astype("float32") / 2147483647.0
    else:
        raise NotImplementedError(f"AU encoding {enc}")
    if nch > 1:
        x = x[: len(x) // nch * nch].reshape(-1, nch).mean(axis=1)
    return x, rate


def _is_image_magic(b: bytes) -> bool:
    return (b[:2] == b"BM" or b[:8] == b"\x89PNG\r\n\x1a\n"
            or b[:2] == b"\xff\xd8" or b[:3] == b"GIF"
            or b[:4] in (b"II*\x00", b"MM\x00*")
            or (len(b) >= 128 and b[:1] == b"\x0a" and b[2:3] in (b"\x00", b"\x01"))
            or (b[:1] == b"P" and b[1:2] in b"123456" and b[2:3].isspace())
            or b[:4] == b"qoif"
            or b[:4] == b"\x00\x00\x01\x00")


def decode_media_image(b: bytes):
    """Image decode dispatch by magic bytes -> ((H, W, 3) uint8, kind).
    Raises ValueError on non-image payloads, NotImplementedError for
    gated sub-formats (by name)."""
    b = bytes(b or b"")
    if not _is_image_magic(b):
        raise ValueError("payload is not a supported image format")
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:2] == b"\xff\xd8":
        from drill_spark.ops.jpeg import decode_jpeg

        return decode_jpeg(b)
    if b[:3] == b"GIF":
        return decode_gif(b)
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        from drill_spark.ops.tiff import decode_tiff

        return decode_tiff(b)
    if b[:1] == b"\x0a":
        return decode_pcx(b)
    if b[:1] == b"P" and b[1:2] in b"123456":
        return decode_pnm(b)
    if b[:4] == b"qoif":
        return decode_qoi(b)
    if b[:4] == b"\x00\x00\x01\x00":
        return decode_ico(b)
    return decode_png(b)


_IMG_KINDS = {b"BM": "image/bmp", b"\xff\xd8": "image/jpeg"}


def decode_media(payload: bytes) -> dict:
    """REAL decode dispatch by magic bytes: BMP/PNG/baseline-JPEG ->
    dims + mean pixel value; WAV -> sample count, rate, RMS amplitude.
    Raises NotImplementedError for formats whose codecs aren't
    in-container (progressive JPEG, MP3, video) — the stub boundary,
    made explicit."""
    import numpy as np

    b = bytes(payload or b"")
    if _is_image_magic(b):
        if b[:2] == b"BM":
            kind = "image/bmp"
        elif b[:2] == b"\xff\xd8":
            kind = "image/jpeg"
        elif b[:3] == b"GIF":
            kind = "image/gif"
        elif b[:4] in (b"II*\x00", b"MM\x00*"):
            kind = "image/tiff"
        elif b[:1] == b"\x0a":
            kind = "image/pcx"
        elif b[:1] == b"P" and b[1:2] in b"123456":
            kind = "image/pnm"
        elif b[:4] == b"qoif":
            kind = "image/qoi"
        elif b[:4] == b"\x00\x00\x01\x00":
            kind = "image/ico"
        else:
            kind = "image/png"
        img = decode_media_image(b)
        return {
            "kind": kind,
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "n_samples": None,
            "sample_rate": None,
            "mean_val": round(float(img.mean()), 4),
        }
    audio_kind = None
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        audio_kind, (x, rate) = "audio/wav", decode_wav(b)
    elif b[:4] == b"FORM" and b[8:12] in (b"AIFF", b"AIFC"):
        audio_kind, (x, rate) = "audio/aiff", decode_aiff(b)
    elif b[:4] == b".snd":
        audio_kind, (x, rate) = "audio/basic", decode_au(b)
    if audio_kind:
        return {
            "kind": audio_kind,
            "width": None,
            "height": None,
            "n_samples": int(len(x)),
            "sample_rate": int(rate),
            "mean_val": round(float((x * x).mean() ** 0.5), 4),
        }
    if b[:4] == b"fLaC":
        # REAL lossless audio decode (ops/flac.py): integer-exact
        # samples, CRC + MD5 verified, normalized like the WAV path.
        from drill_spark.ops.flac import decode_flac

        pcm, rate, bps = decode_flac(b)
        xf = pcm.astype("float64") / ((1 << (bps - 1)) - 1)
        mono = xf.mean(axis=1) if xf.shape[1] > 1 else xf[:, 0]
        return {
            "kind": "audio/flac",
            "width": None,
            "height": None,
            "n_samples": int(len(pcm)),
            "sample_rate": int(rate),
            "mean_val": round(float((mono * mono).mean() ** 0.5), 4),
        }
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        # REAL video decode (ops/video.py): BI_RGB byte-exact, MJPG via
        # the from-scratch JPEG codec. n_samples = frame count,
        # sample_rate = fps, mean over every decoded frame.
        from drill_spark.ops.video import decode_avi

        meta, frames = decode_avi(b)
        mean = float(np.mean([f.mean() for f in frames])) if frames else 0.0
        return {
            "kind": "video/avi",
            "width": int(meta["width"]),
            "height": int(meta["height"]),
            "n_samples": int(meta["n_frames"]),
            "sample_rate": int(meta["fps"]) if meta["fps"] else None,
            "mean_val": round(mean, 4),
        }
    is_mpeg_audio = b[:3] == b"ID3" or (
        len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0
    )
    if is_mpeg_audio:
        # PERMANENT BOUNDARY (decided round 7, see COVERAGE.md): MPEG
        # audio SAMPLE decode. Metadata (layer/rate/channels/frames/
        # duration/VBR bitrate/ID3 tags) is fully real via
        # probe_mpeg_audio. Layer III sample decode is built on pure
        # table data — ~900 Huffman codewords (ISO 11172-3 Table B.7)
        # and the 512-coefficient synthesis window (Table B.3) — that
        # cannot be derived from first principles, and this container
        # has no spec text, no decoder library, and no network to
        # retrieve them; a mistranscribed codeword yields
        # plausible-but-wrong PCM, which is worse than this named gate.
        # Layers I/II share the synthesis-window table, so they gate
        # with it.
        raise NotImplementedError(
            "MPEG audio sample decode gates: the ISO Huffman/synthesis-"
            "window tables are unavailable in this container (metadata "
            "via probe_mpeg_audio is real; see COVERAGE.md boundary)"
        )
    raise NotImplementedError(
        "real decode for this format needs codec libs not in this container"
    )


DECODE_SCHEMA = (
    "doc_id bigint, kind string, width int, height int, "
    "n_samples int, sample_rate int, mean_val double"
)


def media_decode(df: DataFrame) -> DataFrame:
    """mapInPandas REAL decode over (doc_id, payload): BMP/PNG pixels
    and WAV samples are actually decoded on executors (numpy, Arrow
    batches) — the stub-free path proving the multimodal plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows.append({"doc_id": doc_id, **decode_media(bytes(payload))})
            yield pd.DataFrame.from_records(
                rows,
                columns=["doc_id", "kind", "width", "height",
                         "n_samples", "sample_rate", "mean_val"],
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=DECODE_SCHEMA)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize for BMP/PNG/baseline-JPEG payloads: numpy
    nearest-neighbor sampling, re-encoded as BMP. Falls back to
    NotImplementedError for other formats (the stub boundary)."""
    import numpy as np

    b = bytes(payload)
    if b[:2] == b"BM":
        img = decode_bmp(b)
    elif b[:2] == b"\xff\xd8":
        from drill_spark.ops.jpeg import decode_jpeg

        img = decode_jpeg(b)
    else:
        img = decode_png(b)
    ys = (np.arange(height) * img.shape[0] // height).clip(0, img.shape[0] - 1)
    xs = (np.arange(width) * img.shape[1] // width).clip(0, img.shape[1] - 1)
    return encode_bmp(img[np.ix_(ys, xs)])


RESIZE_SCHEMA = "doc_id bigint, payload binary, width int, height int"


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize kernel (real impl: PIL/opencv). Deterministic fake:
    truncate/pad the payload to width*height bytes so output size is the
    'resized' dimensions — preserves the real kernel's contract that
    output payload size is a function of target dims."""
    if payload is None:
        raise NotImplementedError("real resize requires image codec libs")
    target = width * height
    return bytes(payload[:target]).ljust(target, b"\0")


def resize(df: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """mapInPandas resize over (doc_id, payload): the per-row media
    transform shape (decode -> transform -> re-encode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(lambda p: resize_stub(bytes(p), width, height)),
                    "width": width,
                    "height": height,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """mapInPandas frame sampling: one input row (video payload) ->
    up to n_frames output rows — the 1-to-N exploding UDTF shape. AVI
    payloads get REAL evenly-strided container frames (ops/video.py;
    frame_idx = source frame index, MJPG frames directly decodable);
    other payloads keep the labeled equal-stride byte-slice stand-in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drill_spark.ops.video import sample_frames

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    for i, fr in sample_frames(b, n_frames):
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(fr)
                    continue
                stride = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * stride : (i + 1) * stride])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("doc_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


CHUNK_SCHEMA = "doc_id bigint, chunk_idx int, start_s double, end_s double, chunk binary"


def audio_chunk(
    df: DataFrame,
    sample_rate: int = 16_000,
    bytes_per_sample: int = 2,
    chunk_s: float = 2.0,
    overlap_s: float = 0.5,
) -> DataFrame:
    """mapInPandas audio segmentation: one input row (audio payload) ->
    overlapping fixed-length windows with time bounds — the shape an
    ASR/embedding pipeline feeds to its model (real impl: torchaudio /
    soundfile decode first). STUB: the payload is treated as raw PCM
    (sample_rate * bytes_per_sample bytes per second); windowing math,
    schema, and batch iteration are the real plumbing.
    """
    bps = sample_rate * bytes_per_sample
    step = max(int((chunk_s - overlap_s) * bps), 1)
    width = max(int(chunk_s * bps), 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, ends, chunks = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                pos, i = 0, 0
                while pos < len(b):
                    piece = b[pos : pos + width]
                    ids.append(doc_id)
                    idxs.append(i)
                    starts.append(round(pos / bps, 6))
                    ends.append(round((pos + len(piece)) / bps, 6))
                    chunks.append(piece)
                    pos += step
                    i += 1
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_idx": idxs, "start_s": starts, "end_s": ends, "chunk": chunks}
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=CHUNK_SCHEMA)
