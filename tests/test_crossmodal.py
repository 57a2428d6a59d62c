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


def test_pluggable_encoder_seam(spark):
    """The model seam: a user-supplied encoder callable replaces the
    stub inside the same kernel. A trivial 'real model' stand-in (unit
    vector picked by payload length / text length parity) must flow
    through both sides and drive retrieval."""

    def image_encoder(payloads):
        return [[1.0, 0.0] if len(p) % 2 == 0 else [0.0, 1.0]
                for p in payloads]

    def caption_encoder(texts):
        return [[1.0, 0.0] if len(t) % 2 == 0 else [0.0, 1.0]
                for t in texts]

    iv = embed_images(_images(spark), encoder=image_encoder)
    cv = embed_captions(_captions(spark), encoder=caption_encoder)
    assert {tuple(r.embedding) for r in iv.collect()} <= {(1.0, 0.0), (0.0, 1.0)}
    got = crossmodal_topk(iv, cv, k=1).collect()
    assert all(r.cosine in (0.0, 1.0) for r in got)


def test_alignment_filter_accepts_embedding_tables(spark):
    """User-supplied embedding tables skip the encode pass entirely —
    the CLIP-batch-inference integration path."""
    from drill_spark.ops.crossmodal import alignment_filter

    iv = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "doc_id long, embedding array<double>")
    cv = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0])], "doc_id long, embedding array<double>")
    got = {r.doc_id: r.cosine for r in alignment_filter(
        None, None, image_embeddings=iv, caption_embeddings=cv,
        threshold=0.5).collect()}
    assert got == {0: 1.0}


def test_extract_features_pluggable_decoder(spark):
    """Same seam on the generic media-feature kernel."""
    from drill_spark.ops.multimodal import attach_payload, extract_features

    docs = spark.createDataFrame(
        [(1, "abcd"), (2, "xyz")], "doc_id long, text string")
    got = {r.doc_id: (r.feat_mean, r.feat_dim) for r in extract_features(
        attach_payload(docs), decoder=lambda b: [float(len(b)), 0.0]
    ).collect()}
    assert got == {1: (2.0, 2), 2: (1.5, 2)}
