"""AVI video container codec — real video decode for the multimodal
pipeline (frame sampling / frame decode / pixel stats), pure stdlib +
numpy, built from the public RIFF/AVI container layout (msdn AVIMAINHEADER/
AVISTREAMHEADER/BITMAPINFOHEADER) like the other from-scratch codecs.

Two frame codecs:
- BI_RGB (uncompressed DIB): bottom-up BGR rows padded to 4 bytes —
  byte-exact decode, used by the closed-form oracle query;
- MJPG (Motion JPEG): each frame is a baseline JPEG, decoded through
  ``ops/jpeg.py`` (the from-scratch codec).

This moves "video" out of the labeled stub boundary: ``frame_sample``
over an AVI payload returns genuine container frames, and
``decode_media`` reports real width/height/frame-count/fps/pixel-mean.
Codecs beyond MJPG/BI_RGB (H.264 etc.) remain explicitly gated.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------- encode


def _pad2(b: bytes) -> bytes:
    return b + (b"\x00" if len(b) & 1 else b"")


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(payload)) + _pad2(payload)


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _dib_frame(img: np.ndarray) -> bytes:
    """RGB HxWx3 -> bottom-up BGR rows, 4-byte padded (BI_RGB DIB)."""
    h, w, _ = img.shape
    row_len = (w * 3 + 3) & ~3
    out = bytearray()
    for y in range(h - 1, -1, -1):
        row = img[y, :, ::-1].tobytes()  # BGR
        out += row + b"\x00" * (row_len - len(row))
    return bytes(out)


def encode_avi(frames: list[np.ndarray], fps: int = 10, codec: str = "raw") -> bytes:
    """Spec-built AVI writer: ``raw`` (BI_RGB DIB) or ``mjpg`` frames.
    All frames must share one (h, w, 3) uint8 shape."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w, _ = frames[0].shape
    if codec == "raw":
        payloads = [_dib_frame(f) for f in frames]
        compression = 0  # BI_RGB
        handler = b"DIB "
    elif codec == "mjpg":
        from drill_spark.ops.jpeg import encode_jpeg

        payloads = [encode_jpeg(f) for f in frames]
        compression = struct.unpack("<I", b"MJPG")[0]
        handler = b"MJPG"
    else:
        raise NotImplementedError(f"AVI codec {codec!r} (raw | mjpg)")

    max_size = max(len(p) for p in payloads)
    avih = struct.pack(
        "<10I4I",
        1_000_000 // fps,      # dwMicroSecPerFrame
        max_size * fps,        # dwMaxBytesPerSec
        0, 0x10,               # padding, AVIF_HASINDEX
        len(frames), 0, 1, max_size,
        w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sI2H8I4h",
        b"vids", handler, 0, 0, 0, 0,
        1, fps,                # dwScale / dwRate -> fps
        0, len(frames), max_size, 0xFFFFFFFF & -1, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40, w, h, 1, 24, compression,
        len(payloads[0]), 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------- decode


def _walk_chunks(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_avi(payload: bytes) -> dict:
    """Container walk: header fields + raw frame chunk list (no frame
    decode). Raises on non-AVI input."""
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') payload")
    meta = {"width": None, "height": None, "fps": None, "n_frames": 0,
            "compression": 0, "bit_count": 24}
    frames: list[bytes] = []

    def walk_list(start: int, end: int) -> None:
        for fourcc, off, size in _walk_chunks(b, start, end):
            if fourcc == b"LIST":
                walk_list(off + 4, off + size)
            elif fourcc == b"avih":
                vals = struct.unpack_from("<10I", b, off)
                meta["fps"] = round(1_000_000 / vals[0]) if vals[0] else None
                meta["width"], meta["height"] = vals[8], vals[9]
            elif fourcc == b"strf" and size >= 40:
                (_, _, _, _, bit_count, comp) = struct.unpack_from("<I2i2HI", b, off)[:6]
                meta["compression"] = comp
                meta["bit_count"] = bit_count
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append(b[off : off + size])

    walk_list(12, 8 + struct.unpack_from("<I", b, 4)[0])
    meta["n_frames"] = len(frames)
    meta["frames"] = frames
    return meta


def decode_frame(frame: bytes, meta: dict) -> np.ndarray:
    """One container frame -> HxWx3 uint8 RGB."""
    comp = meta["compression"]
    if frame[:2] == b"\xff\xd8" or comp == struct.unpack("<I", b"MJPG")[0]:
        from drill_spark.ops.jpeg import decode_jpeg

        img = decode_jpeg(frame)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        return img
    if comp == 0:  # BI_RGB bottom-up BGR
        w, h = meta["width"], meta["height"]
        if meta["bit_count"] != 24:
            raise NotImplementedError(f"DIB bit count {meta['bit_count']}")
        row_len = (w * 3 + 3) & ~3
        rows = [
            np.frombuffer(frame, dtype=np.uint8, count=w * 3, offset=y * row_len)
            .reshape(w, 3)[:, ::-1]
            for y in range(h)
        ]
        return np.stack(rows[::-1], axis=0)
    raise NotImplementedError(
        f"AVI frame codec 0x{comp:08x} — only BI_RGB and MJPG are decoded")


def decode_avi(payload: bytes) -> tuple[dict, list[np.ndarray]]:
    meta = parse_avi(payload)
    frames = [decode_frame(f, meta) for f in meta["frames"]]
    return meta, frames


def sample_frames(payload: bytes, n_frames: int) -> list[tuple[int, bytes]]:
    """Evenly-strided REAL frame selection: (source frame index, frame
    chunk bytes). MJPG chunks are directly decodable JPEGs."""
    meta = parse_avi(payload)
    total = meta["n_frames"]
    if total == 0:
        return []
    n = min(n_frames, total)
    idxs = [round(i * (total - 1) / max(n - 1, 1)) for i in range(n)]
    # dedupe while preserving order (short videos)
    seen: list[int] = []
    for i in idxs:
        if i not in seen:
            seen.append(i)
    return [(i, meta["frames"][i]) for i in seen]
