"""Perceptual-hash image deduplication — the image-side analog of the
text near-dup stack (ops/dedup.py), built on this repo's from-scratch
codecs (ops/multimodal.py, ops/jpeg.py, ops/tiff.py).

The hash is the standard DCT pHash (Zauner 2010, "Implementation and
Benchmarking of Perceptual Image Hash Functions"; the pHash.org /
imagehash method): grayscale -> area-resample to 32x32 -> 2-D DCT-II ->
top-left 8x8 low-frequency block -> bit i = coeff_i > median(AC).
Near-identical images (re-encodes, resizes, small brightness shifts)
land within a few bits; unrelated images differ in ~32.

Scale shape (the banded-bucket pattern the text simhash uses,
ops/dedup.py:208): hashing is one Arrow mapInPandas over the payload
column; candidate generation explodes each 64-bit hash into
``bands`` fixed-width band keys and equi-joins on (band, value) — NO
all-pairs product; verification is one xor+bit_count per candidate
pair, in codegen. A hot bucket (constant-color corpus — blank
thumbnails, logo boilerplate are common in crawl data) is capped with
a row_number <= max_bucket per (band, band_bits), the same cap the
audio (ops/audiofp.py) and video (ops/videofp.py) siblings use;
past the cap recall degrades gracefully (a pair is still found if it
co-survives in ANY of its ``bands`` buckets) instead of the join
going quadratic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def phash64(payload: bytes) -> int:
    """64-bit DCT perceptual hash of one encoded image payload."""
    from drill_spark.ops.multimodal import decode_media_image

    return phash64_array(decode_media_image(bytes(payload)))


def phash64_array(img) -> int:
    """64-bit DCT perceptual hash of a decoded (H, W, 3) uint8 array
    (shared by the image payload path and the video frame path)."""
    import numpy as np

    gray = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
            + 0.114 * img[:, :, 2]).astype(np.float64)
    small = _area_resample(gray, 32, 32)
    d = _dct2(small)[:8, :8]
    flat = d.flatten()
    med = np.median(flat[1:])  # AC median; DC excluded (overall level)
    bits = flat > med
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h - (1 << 64) if h >= (1 << 63) else h  # signed for BIGINT


def _area_resample(a, out_h: int, out_w: int):
    """Box-average resample to (out_h, out_w) — pHash's smoothing step,
    exact for any input size via bin-edge accumulation."""
    import numpy as np

    h, w = a.shape
    ys = (np.arange(out_h + 1) * h / out_h).round().astype(int)
    xs = (np.arange(out_w + 1) * w / out_w).round().astype(int)
    ys[-1], xs[-1] = h, w
    out = np.empty((out_h, out_w))
    csum = np.zeros((h + 1, w + 1))
    csum[1:, 1:] = a.cumsum(axis=0).cumsum(axis=1)
    for i in range(out_h):
        # inputs SMALLER than the target repeat pixels (clamped bins)
        y0 = min(ys[i], h - 1)
        y1 = min(max(ys[i + 1], y0 + 1), h)
        for j in range(out_w):
            x0 = min(xs[j], w - 1)
            x1 = min(max(xs[j + 1], x0 + 1), w)
            s = (csum[y1, x1] - csum[y0, x1] - csum[y1, x0] + csum[y0, x0])
            out[i, j] = s / ((y1 - y0) * (x1 - x0))
    return out


def _dct2(a):
    """2-D DCT-II via the orthonormal DCT matrix (same transform the
    JPEG codec uses, sized 32)."""
    import numpy as np

    n = a.shape[0]
    k = np.arange(n)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= np.sqrt(1 / n)
    m[1:] *= np.sqrt(2 / n)
    return m @ a @ m.T


PHASH_SCHEMA = "doc_id bigint, phash bigint"


def image_phash(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """(id, phash) — one Arrow pass over the payload column; rows whose
    payload no codec accepts are dropped (logged shape: a corrupt blob
    must not kill a 100 TB job)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    hashes.append(phash64(bytes(p)))
                    ids.append(i)
                except Exception:
                    continue  # non-image / unsupported payload
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    return df.select(F.col(id_col).alias(id_col),
                     F.col(payload_col)).mapInPandas(run, schema=PHASH_SCHEMA)


def phash_near_dupes(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload",
                     bands: int = 4, max_hamming: int = 6,
                     max_bucket: int = 1024) -> DataFrame:
    """Near-duplicate image pairs (id_a < id_b, hamming <= max_hamming).

    Banding guarantee: two hashes within ``max_hamming`` bits share at
    least one unchanged band whenever max_hamming < bands (pigeonhole
    over 64/bands-bit bands) — with the defaults (4 bands of 16 bits,
    hamming <= 6) a pair is missed only if its >= 7 differing bits
    spread across all 4 bands, i.e. recall is probabilistic above
    bands-1 bits, exactly like the reference-free simhash banding in
    ops/dedup.py. One shuffle keyed (band, band_bits); candidates
    verified by xor bit_count in codegen.

    Hot-bucket cap: each (band, band_bits) bucket is truncated to
    ``max_bucket`` rows (deterministic row_number over doc_id) before
    the self-join, bounding a bucket's pair output at max_bucket^2/2 —
    without it a corpus of m near-constant images (all-black
    thumbnails) produces m^2/2 candidates in one bucket. Recall
    trade-off, same as videofp/audiofp: a capped-out pair survives if
    BOTH rows stay under the cap in at least one of its ``bands``
    buckets; truly identical images past the cap are better handled by
    exact dedup (ops/dedup.py) first."""
    hashed = image_phash(df, id_col, payload_col)
    width = 64 // bands
    mask = (1 << width) - 1
    banded = hashed.select(
        "doc_id", "phash",
        F.posexplode(F.array(*[
            (F.shiftright(F.col("phash"), i * width)
             .bitwiseAND(F.lit(mask))).alias(f"b{i}")
            for i in range(bands)
        ])).alias("band", "band_bits"),
    )
    capped = (
        banded.withColumn(
            "_r", F.row_number().over(
                Window.partitionBy("band", "band_bits")
                .orderBy("doc_id")))
        .where(F.col("_r") <= max_bucket)
        .drop("_r")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_bits") == F.col("b.band_bits"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.col("a.phash").alias("ph_a"),
                F.col("b.phash").alias("ph_b"))
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
