"""Cross-modal (CLIP-style) embedding + retrieval (ops/crossmodal.py):
retrieval identity on solid-color corpora through the REAL image
codecs, cross-container embedding equality, alignment filtering, and
the broadcast plan shape. The corpus-scale run is ext_crossmodal_topk
(rows-only by design — the projection matrix is not SQL-expressible)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from drill_spark.ops.crossmodal import (
    alignment_filter,
    crossmodal_topk,
    embed_captions,
    embed_images,
)
from drill_spark.ops.multimodal import encode_bmp, encode_qoi

_NAMED = [
    (0, "red", (255, 0, 0)),
    (1, "green", (0, 255, 0)),
    (2, "blue", (0, 0, 255)),
    (3, "yellow", (255, 255, 0)),
    (4, "cyan", (0, 255, 255)),
    (5, "magenta", (255, 0, 255)),
]


def _images(spark, mk=encode_bmp):
    rows = [
        (i, bytearray(mk(np.full((8, 8, 3), rgb, dtype=np.uint8))))
        for i, _, rgb in _NAMED
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def _captions(spark):
    rows = [(i, f"a {name} square") for i, name, _ in _NAMED]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_caption_retrieves_own_image_top1(spark):
    got = crossmodal_topk(
        embed_images(_images(spark)), embed_captions(_captions(spark)), k=2
    ).where(F.col("rank") == 1).collect()
    assert len(got) == len(_NAMED)
    for r in got:
        assert r["neighbor_id"] == r["query_id"]
        assert r["cosine"] > 0.99


def test_embeddings_are_container_invariant(spark):
    bmp = {r["doc_id"]: r["embedding"]
           for r in embed_images(_images(spark, encode_bmp)).collect()}
    qoi = {r["doc_id"]: r["embedding"]
           for r in embed_images(_images(spark, encode_qoi)).collect()}
    assert bmp.keys() == qoi.keys()
    for k in bmp:
        assert bmp[k] == qoi[k]  # same pixels -> same embedding, any codec


def test_alignment_filter_separates_pairs(spark):
    imgs = _images(spark)
    good = _captions(spark)
    # mismatched captions: shift every caption to the "wrong" image
    bad = good.select(
        ((F.col("doc_id") + 3) % 6).alias("doc_id"), "text")
    kept_good = alignment_filter(imgs, good, threshold=0.99)
    kept_bad = alignment_filter(imgs, bad, threshold=0.99)
    assert kept_good.count() == len(_NAMED)
    assert kept_bad.count() == 0


def test_crossmodal_topk_plan_broadcasts_queries(spark):
    plan = crossmodal_topk(
        embed_images(_images(spark)), embed_captions(_captions(spark)), k=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
