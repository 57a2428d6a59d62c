"""Multimodal column plumbing (extension surface).

Pattern: media as opaque `binary` payload + typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over mapInPandas. The image/audio codecs are NOT in
this container, so the decode kernel is stubbed (deterministic fake
clearly marked); everything Spark-side — schema, batch iteration,
partitioning, UDF signatures — is real and tested.

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


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (id, payload, meta).

    Arrow record batches in, pandas out — the canonical shape for any
    per-row media kernel (decode, resize, embed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: decode_stub(bytes(p)))
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
    n_frames output rows — the 1-to-N exploding UDTF shape (real impl:
    ffmpeg keyframe extraction). STUB: equal-stride byte slices."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
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
