"""Video duplicate detection — the third leg of the multimodal dedup
triad (image: ops/phash.py; audio: ops/audiofp.py), on this repo's real
AVI decoder (ops/video.py).

Per-frame fingerprints are the DCT pHash of each decoded frame; pairing
follows the offset-alignment pattern: frame hashes band into fixed
slices and equi-join across documents (one shuffle, no all-pairs),
candidate frame matches verify by hamming distance in codegen, and a
pair is a duplicate when one consistent frame OFFSET accumulates
``min_matches`` aligned near-identical frames — re-encoded (MJPG) or
brightness-shifted copies align, coincidental hash collisions scatter.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FP_SCHEMA = "doc_id bigint, frame_idx int, phash bigint"


def video_frame_phashes(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """(id, frame_idx, phash) for every frame of every AVI payload —
    one Arrow pass through the real decoder; non-video payloads are
    skipped, not fatal."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drill_spark.ops.phash import phash64_array
        from drill_spark.ops.video import decode_avi

        for pdf in batches:
            ids, idxs, hs = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _meta, frames = decode_avi(bytes(p))
                except Exception:
                    continue
                for t, fr in enumerate(frames):
                    ids.append(i)
                    idxs.append(t)
                    hs.append(phash64_array(fr))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "phash": hs})

    return df.select(F.col(id_col).alias(id_col),
                     F.col(payload_col)).mapInPandas(run, schema=FP_SCHEMA)


def video_near_dupes(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload",
                     bands: int = 4, max_hamming: int = 6,
                     min_matches: int = 3, max_bucket: int = 64) -> DataFrame:
    """(id_a < id_b, offset, n_matches): video pairs whose modal frame
    offset aligns at least ``min_matches`` frames within ``max_hamming``
    pHash bits. Candidates come from the banded equi-join (pigeonhole:
    a frame pair within max_hamming < bands bits always shares a band);
    verification is xor+bit_count plus the offset histogram — all
    codegen, one shuffle keyed (band, bits)."""
    fps = video_frame_phashes(df, id_col, payload_col)
    width = 64 // bands
    mask = (1 << width) - 1
    banded = fps.select(
        "doc_id", "frame_idx", "phash",
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
                .orderBy("doc_id", "frame_idx")))
        .where(F.col("_r") <= max_bucket)
        .drop("_r")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    aligned = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_bits") == F.col("b.band_bits"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                (F.col("b.frame_idx") - F.col("a.frame_idx")).alias("offset"),
                F.col("a.frame_idx").alias("_fa"),
                F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
                .alias("_ham"))
        .where(F.col("_ham") <= max_hamming)
        .distinct()  # one vote per (pair, offset, source frame)
        .groupBy("id_a", "id_b", "offset")
        .agg(F.count("*").alias("n_matches"))
        .where(F.col("n_matches") >= min_matches)
    )
    w = Window.partitionBy("id_a", "id_b").orderBy(
        F.desc("n_matches"), F.asc("offset"))
    return (aligned.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1).drop("_r"))
