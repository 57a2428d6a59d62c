"""Audio fingerprint deduplication — the audio analog of the image
pHash stack (ops/phash.py), built on this repo's real WAV/AIFF/AU/FLAC
decoders.

The per-frame hash is the Haitsma-Kalker / Philips robust hash (ISMIR
2002, "A Highly Robust Audio Fingerprinting System"): frame the signal,
compute energy in logarithmically spaced bands, and take the sign of
the band-energy difference along both frequency and time — each frame
yields ``n_bands - 1`` bits. The construction is invariant to overall
gain (scaling multiplies every band energy, differences keep their
sign) and robust to re-encoding noise.

Dedup uses the winnowing-style anchor pattern (ops/winnow.py): frame
hashes equi-join across documents (one shuffle, hot hashes capped);
matching pairs verify by the modal frame OFFSET — true copies (possibly
trimmed) align many frames at one consistent offset, coincidental
collisions scatter.

Scope: the transforms this detects EXACTLY are the lossless ones a
curation pipeline actually meets for raw audio — gain changes
(sign-of-difference is scale-invariant), leading/trailing trims at
frame-hop granularity (the offset histogram), container conversion
(WAV <-> AIFF <-> AU <-> FLAC through the real decoders) and channel
mixdown. Lossy re-encodes (MP3/AAC) perturb near-zero band differences
and need BER-tolerant sub-fingerprint matching — out of scope with the
sample-decode gate, documented boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frame_hashes(samples, sample_rate: int, frame: int = 2048,
                 hop: int = 1024, n_bands: int = 17) -> list[int]:
    """Per-frame Haitsma-Kalker hashes (n_bands - 1 bits each) of a
    mono float signal in [-1, 1]."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim > 1:
        x = x.mean(axis=1)
    if len(x) < frame:
        return []
    win = np.hanning(frame)
    # log-spaced band edges over 300 Hz .. min(3000, nyquist*0.9)
    f_lo, f_hi = 300.0, min(3000.0, 0.9 * sample_rate / 2)
    edges = np.geomspace(f_lo, f_hi, n_bands + 1)
    bins = np.clip((edges * frame / sample_rate).astype(int), 1, frame // 2 - 1)
    n_frames = 1 + (len(x) - frame) // hop
    # One strided frame matrix -> ONE rfft over the 2-D batch (pocketfft
    # runs the identical per-row transform, so band energies and hence
    # hash bits are bit-identical to a per-frame loop — asserted in
    # tests/test_extops.py::test_audio_frame_hashes_bit_identical_to_loop)
    # instead of n_frames Python-loop FFT calls.
    frames_mat = np.lib.stride_tricks.sliding_window_view(x, frame)[::hop]
    spec = np.abs(np.fft.rfft(frames_mat * win, axis=1)) ** 2
    energies = np.empty((n_frames, n_bands))
    for b in range(n_bands):
        lo, hi = bins[b], max(bins[b + 1], bins[b] + 1)
        # .sum(axis=1) over the contiguous slice keeps numpy's pairwise
        # summation order, matching the scalar spec[lo:hi].sum()
        energies[:, b] = spec[:, lo:hi].sum(axis=1)
    # sign of the time-difference of the frequency-difference, packed
    # MSB-first exactly like the scalar (bits << 1 | sign) loop
    d = ((energies[1:, :-1] - energies[1:, 1:])
         - (energies[:-1, :-1] - energies[:-1, 1:]))
    shifts = np.arange(n_bands - 2, -1, -1, dtype=np.int64)
    packed = ((d > 0).astype(np.int64) << shifts).sum(axis=1)
    return [int(v) for v in packed]


def _decode_audio(payload: bytes):
    """(samples, rate) via the real decoders; ValueError on non-audio."""
    from drill_spark.ops.multimodal import decode_aiff, decode_au, decode_wav

    b = bytes(payload or b"")
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return decode_wav(b)
    if b[:4] == b"FORM" and b[8:12] in (b"AIFF", b"AIFC"):
        return decode_aiff(b)
    if b[:4] == b".snd":
        return decode_au(b)
    if b[:4] == b"fLaC":
        from drill_spark.ops.flac import decode_flac

        x, rate, *_ = decode_flac(b)
        return x, rate
    raise ValueError("payload is not a supported audio container")


FP_SCHEMA = "doc_id bigint, fh bigint, frame_idx int"


def audio_fingerprints(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload",
                       frame: int = 2048, hop: int = 1024) -> DataFrame:
    """(id, frame_hash, frame_idx) — one Arrow pass over the payload
    column through the real audio decoders; non-audio payloads are
    skipped, not fatal."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fhs, idxs = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    x, rate = _decode_audio(p)
                except Exception:
                    continue
                for t, h in enumerate(frame_hashes(x, rate, frame, hop)):
                    ids.append(i)
                    fhs.append(h)
                    idxs.append(t)
            yield pd.DataFrame({"doc_id": ids, "fh": fhs, "frame_idx": idxs})

    return df.select(F.col(id_col).alias(id_col),
                     F.col(payload_col)).mapInPandas(run, schema=FP_SCHEMA)


def audio_near_dupes(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload",
                     min_matches: int = 8, max_bucket: int = 64) -> DataFrame:
    """(id_a < id_b, offset, n_matches) — audio duplicate pairs: the
    modal frame offset with at least ``min_matches`` aligned frame-hash
    matches. One equi-join on the frame hash (hot hashes capped), the
    alignment histogram is a codegen'd groupBy — no cross product, no
    driver work."""
    fps = audio_fingerprints(df, id_col, payload_col)
    capped = (
        fps.withColumn(
            "_r", F.row_number().over(
                Window.partitionBy("fh").orderBy("doc_id", "frame_idx")))
        .where(F.col("_r") <= max_bucket)
        .drop("_r")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    aligned = (
        a.join(b, (F.col("a.fh") == F.col("b.fh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                (F.col("b.frame_idx") - F.col("a.frame_idx")).alias("offset"),
                F.col("a.frame_idx").alias("_fa"))
        .distinct()  # one vote per (pair, offset, source frame)
        .groupBy("id_a", "id_b", "offset")
        .agg(F.count("*").alias("n_matches"))
        .where(F.col("n_matches") >= min_matches)
    )
    w = Window.partitionBy("id_a", "id_b").orderBy(
        F.desc("n_matches"), F.asc("offset"))
    return (aligned.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1).drop("_r"))
