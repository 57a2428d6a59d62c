"""Cross-modal (CLIP-style) embedding + retrieval plumbing.

The 100 TB multimodal-curation pattern: encode images and captions into
ONE joint vector space, then run text→image / image→text retrieval and
alignment filtering (CLIP-score style) as ordinary cosine top-k joins.
The reference engine has no counterpart; this is part of the
training-data-pipeline extension surface.

What is REAL here (and tested): the Spark shape end-to-end —
Arrow-batched ``mapInPandas`` decode of genuine image bytes through the
repo's own from-scratch codecs (``ops/multimodal.decode_media_image``:
BMP/PNG/GIF/JPEG/…), a fixed-seed Gaussian projection into the joint
space (matrix generated per-executor from the seed — broadcast-free,
~dim*19 floats), L2 normalization, and a broadcast cosine top-k with
deterministic tie-breaks. What is a STUB (and documented): the trained
encoder weights. A real deployment swaps ``_RAW_DIM``-feature extraction
+ random projection for an ONNX/torch forward pass inside the same
``mapInPandas`` kernel — the schema, batching, and join shape do not
change. The stub is still *aligned by construction*: the caption
encoder predicts the image's mean color and flat-grid features from
color words / literal ``rgb(r,g,b)`` spans, so matching pairs really do
land near each other and retrieval is meaningfully testable (top-1
identity on solid-color corpora, cross-container: a PNG and a BMP of
the same color embed identically).

Scale shape: encode is one Arrow pass per side (no shuffle); retrieval
broadcasts the (small) query side and the per-query top-k is a
window-heap — state per task is k rows, never the corpus; no
driver-side loops.
"""

from __future__ import annotations

import math
import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RAW_DIM = 19  # mean r,g,b + 4x4 grayscale grid
_SEED = 7

# tiny color lexicon for the caption-side stub encoder
_COLORS = {
    "black": (0, 0, 0), "white": (255, 255, 255), "red": (255, 0, 0),
    "green": (0, 255, 0), "blue": (0, 0, 255), "yellow": (255, 255, 0),
    "cyan": (0, 255, 255), "magenta": (255, 0, 255), "gray": (128, 128, 128),
}
_RGB_RE = re.compile(r"rgb\((\d+),\s*(\d+),\s*(\d+)\)")


def _projection(dim: int) -> np.ndarray:
    """Fixed-seed Gaussian projection (RAW_DIM -> dim), regenerated from
    the seed wherever it's needed — nothing to broadcast. Cached per
    process so per-row encoding doesn't re-run the generator."""
    m = _projection_cache.get(dim)
    if m is None:
        rng = np.random.default_rng(_SEED)
        m = _projection_cache[dim] = rng.standard_normal((_RAW_DIM, dim))
    return m


_projection_cache: dict[int, np.ndarray] = {}


def _embed_raw(raw: np.ndarray, dim: int) -> list[float]:
    v = raw @ _projection(dim)
    n = float(np.linalg.norm(v))
    if n == 0.0:
        return [0.0] * dim
    return [round(float(x), 6) for x in v / n]


def _image_raw(payload: bytes) -> np.ndarray:
    """Mean RGB + 4x4 grayscale grid from a REAL decode (the repo's
    own codecs; raises on undecodable bytes like the codecs do)."""
    from drill_spark.ops.multimodal import decode_media_image

    img = np.asarray(decode_media_image(payload), dtype=np.float64)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    mean_rgb = img.reshape(-1, img.shape[-1])[:, :3].mean(axis=0) / 255.0
    gray = img[..., :3].mean(axis=-1) / 255.0
    h, w = gray.shape
    grid = np.zeros(16)
    for gy in range(4):
        for gx in range(4):
            cell = gray[gy * h // 4:(gy + 1) * h // 4 or h,
                        gx * w // 4:(gx + 1) * w // 4 or w]
            grid[gy * 4 + gx] = cell.mean() if cell.size else 0.0
    return np.concatenate([mean_rgb, grid])


def _caption_raw(text: str) -> np.ndarray:
    """Predict the image's raw features from the caption: literal
    ``rgb(r,g,b)`` spans win, else the mean of named colors, else
    mid-gray. The grid is flat at the predicted luminance (exactly what
    a solid-color image produces)."""
    t = (text or "").lower()
    m = _RGB_RE.search(t)
    if m:
        rgb = np.array([int(m.group(i)) for i in (1, 2, 3)], dtype=np.float64)
    else:
        hits = [np.array(v, dtype=np.float64)
                for w, v in _COLORS.items() if w in t]
        rgb = (np.mean(hits, axis=0) if hits
               else np.array([128.0, 128.0, 128.0]))
    rgb = rgb / 255.0
    return np.concatenate([rgb, np.full(16, rgb.mean())])


def embed_images(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload", dim: int = 32,
                 encoder=None) -> DataFrame:
    """(id, embedding) from image bytes.

    ``encoder`` is the pluggable-model seam: a callable
    ``(iterable of bytes) -> list[list[float]]`` (e.g. an ONNX/torch
    CLIP forward pass loaded per executor) that replaces the stub
    feature+projection encoder INSIDE the same Arrow-batched kernel —
    schema, batching, and everything downstream are unchanged. Default
    None keeps the deterministic fixture encoder (real image decode
    through the repo codecs, documented stub projection)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if encoder is not None:
                embs = [list(map(float, v))
                        for v in encoder([bytes(p) for p in pdf[payload_col]])]
            else:
                embs = [
                    _embed_raw(_image_raw(bytes(p)), dim)
                    for p in pdf[payload_col]
                ]
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": embs})

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, embedding array<double>"
    )


def embed_captions(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", dim: int = 32,
                   encoder=None) -> DataFrame:
    """(id, embedding) from caption text via the same joint space.
    ``encoder``: pluggable-model seam — ``(iterable of str) ->
    list[list[float]]``, same contract as :func:`embed_images`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if encoder is not None:
                embs = [list(map(float, v))
                        for v in encoder([str(t) for t in pdf[text_col]])]
            else:
                embs = [
                    _embed_raw(_caption_raw(t), dim) for t in pdf[text_col]
                ]
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": embs})

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, embedding array<double>"
    )


def crossmodal_topk(candidates: DataFrame, queries: DataFrame,
                    id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Cosine top-k across modalities: for every query embedding (e.g.
    captions) the k nearest candidate embeddings (e.g. images).
    Embeddings are pre-normalized, so cosine is a plain dot product in
    codegen. Returns (query_id, neighbor_id, cosine, rank); ties break
    on neighbor id. Queries broadcast; per-query top-k is a window heap.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col("embedding").alias("qv"))
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col("embedding").alias("cv"))
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine", F.round(dot, 4))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def alignment_filter(images: DataFrame, captions: DataFrame,
                     id_col: str = "doc_id", threshold: float = 0.28,
                     dim: int = 32,
                     image_embeddings: DataFrame | None = None,
                     caption_embeddings: DataFrame | None = None) -> DataFrame:
    """CLIP-score pair filtering (the LAION recipe): embed both sides,
    join image i with caption i, keep pairs whose joint-space cosine
    clears ``threshold``. Returns (id, cosine). One equi-join on id —
    shuffle keyed by id, no cross join anywhere.

    Pluggable-model seam: pass precomputed ``image_embeddings`` /
    ``caption_embeddings`` tables ((id, embedding array<double>),
    L2-normalized — e.g. a real CLIP batch-inference output) and the
    corresponding encode pass is skipped entirely; the stub encoders
    remain the fixture default."""
    iv = (image_embeddings if image_embeddings is not None
          else embed_images(images, id_col=id_col, dim=dim)).select(
        F.col(id_col), F.col("embedding").alias("iv"))
    cv = (caption_embeddings if caption_embeddings is not None
          else embed_captions(captions, id_col=id_col, dim=dim)).select(
        F.col(id_col), F.col("embedding").alias("cv"))
    dot = F.aggregate(
        F.zip_with("iv", "cv", lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        iv.join(cv, id_col)
        .withColumn("cosine", F.round(dot, 4))
        .where(F.col("cosine") >= threshold)
        .select(id_col, "cosine")
    )
