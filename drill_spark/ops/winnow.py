"""Exact-substring duplicate detection via winnowing fingerprints.

Doc-level near-dup (MinHash/SimHash, ops/dedup.py) misses the other
duplication mode training corpora carry: long VERBATIM substrings
repeated across otherwise-different documents (boilerplate, licenses,
quoted passages — the case Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better", attacks with a suffix array).
A distributed suffix array is driver-hostile; this module uses
winnowing (Schleimer, Wilkerson, Aiken 2003, "Winnowing: Local
Algorithms for Document Fingerprinting" — the MOSS algorithm), which
has the guarantee we need: any common substring of at least
``k + window - 1`` characters shares at least one selected fingerprint,
so fingerprint equality is a complete candidate generator for spans of
the guarantee length.

Scale shape (the banded-dedup pattern): fingerprinting is one Arrow
mapInPandas pass; candidates come from ONE equi-join on the
fingerprint hash (never all-pairs), hot hashes capped like simhash
bands; verification joins the texts of candidate pairs only and
extends each shared anchor to the maximal exact span in one
applyInPandas over pair groups.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MOD = (1 << 61) - 1
_BASE = 257


def winnow_fingerprints(text: str, k: int = 8, window: int = 4):
    """[(hash, pos)] selected by robust winnowing: rightmost minimal
    k-gram hash per window of ``window`` consecutive k-gram hashes."""
    n = len(text)
    if n < k:
        return []
    h = 0
    pw = pow(_BASE, k - 1, _MOD)
    hashes = []
    for i, c in enumerate(text):
        h = (h * _BASE + ord(c)) % _MOD
        if i >= k:
            h = (h - ord(text[i - k]) * pw * _BASE) % _MOD
        if i >= k - 1:
            hashes.append(h)
    out = []
    last = None
    for w0 in range(0, len(hashes) - window + 1):
        # rightmost minimum in hashes[w0 : w0+window]
        m_i, m_v = w0, hashes[w0]
        for j in range(w0, w0 + window):
            if hashes[j] <= m_v:
                m_i, m_v = j, hashes[j]
        if last != (m_v, m_i):
            out.append((m_v, m_i))
            last = (m_v, m_i)
    if not out and hashes:  # shorter than one window: keep the min gram
        m_i = min(range(len(hashes)), key=lambda j: hashes[j])
        out = [(hashes[m_i], m_i)]
    return out


FP_SCHEMA = "doc_id bigint, fp bigint, pos int"


def fingerprint_docs(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     k: int = 8, window: int = 4) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps, poss = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                for h, p in winnow_fingerprints(str(t or ""), k, window):
                    ids.append(i)
                    fps.append(h - (1 << 63) if h >= (1 << 63) else h)
                    poss.append(p)
            yield pd.DataFrame({"doc_id": ids, "fp": fps, "pos": poss})

    return df.select(F.col(id_col).alias(id_col),
                     F.col(text_col)).mapInPandas(run, schema=FP_SCHEMA)


SPAN_SCHEMA = ("id_a bigint, id_b bigint, pos_a int, pos_b int, "
               "span_len int")


def _extend_span(a: str, b: str, pa: int, pb: int, k: int):
    """Maximal exact common span around the shared k-gram anchor."""
    lo = 0
    while pa - lo - 1 >= 0 and pb - lo - 1 >= 0 and a[pa - lo - 1] == b[pb - lo - 1]:
        lo += 1
    hi = k
    while pa + hi < len(a) and pb + hi < len(b) and a[pa + hi] == b[pb + hi]:
        hi += 1
    return pa - lo, pb - lo, lo + hi


def substring_dup_spans(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", min_len: int = 40,
                        k: int = 8, window: int = 4,
                        max_bucket: int = 64,
                        max_anchors: int = 256) -> DataFrame:
    """(id_a < id_b, pos_a, pos_b, span_len) — maximal verbatim common
    substrings of at least ``min_len`` chars between document pairs.
    Complete for spans >= max(min_len, k + window - 1) by the winnowing
    guarantee. ``max_bucket`` caps a fingerprint's doc list (stopword
    boilerplate shared by everything would otherwise quadratically
    explode one bucket — same hot-bucket cap as the LSH dedup).
    ``max_anchors`` caps the per-pair anchor list (two long
    near-identical documents otherwise contribute ~len/window anchors
    to ONE collect_list row); spans stay recoverable because ANY
    surviving anchor inside a span re-derives the whole span via
    _extend_span — only pairs whose shared material spans more than
    max_anchors DISTINCT spans can lose the tail ones."""
    fps = fingerprint_docs(df, id_col, text_col, k, window)
    capped = (
        fps.withColumn(
            "_r", F.row_number().over(
                Window.partitionBy("fp").orderBy("doc_id", "pos")))
        .where(F.col("_r") <= max_bucket)
        .drop("_r")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    # ONE anchor list per candidate pair, so each document's text joins
    # once per PAIR, not once per shared fingerprint
    cands = (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.col("a.pos").alias("pos_a"),
                F.col("b.pos").alias("pos_b"))
        .distinct()
        .withColumn(
            "_r", F.row_number().over(
                Window.partitionBy("id_a", "id_b")
                .orderBy("pos_a", "pos_b")))
        .where(F.col("_r") <= max_anchors)
        .groupBy("id_a", "id_b")
        .agg(F.collect_list(F.struct("pos_a", "pos_b")).alias("_anchors"))
    )
    texts = df.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_txt"))
    joined = (
        cands.join(texts.withColumnRenamed("_tid", "id_a")
                   .withColumnRenamed("_txt", "_txt_a"), "id_a")
        .join(texts.withColumnRenamed("_tid", "id_b")
              .withColumnRenamed("_txt", "_txt_b"), "id_b")
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for ia, ib, anchors, ta, tb in zip(
                pdf["id_a"], pdf["id_b"], pdf["_anchors"],
                pdf["_txt_a"], pdf["_txt_b"],
            ):
                ta, tb = str(ta), str(tb)
                best: dict[tuple, int] = {}
                for anc in anchors:
                    pa, pb = int(anc["pos_a"]), int(anc["pos_b"])
                    sa, sb, ln = _extend_span(ta, tb, pa, pb, k)
                    if ln >= min_len:
                        key = (sa, sb)  # anchors in one span collapse
                        best[key] = max(best.get(key, 0), ln)
                rows.extend((int(ia), int(ib), sa, sb, ln)
                            for (sa, sb), ln in best.items())
            yield pd.DataFrame(
                rows or None,
                columns=["id_a", "id_b", "pos_a", "pos_b", "span_len"],
            )

    return joined.mapInPandas(verify, schema=SPAN_SCHEMA)


def remove_dup_spans(df: DataFrame, spans: DataFrame,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """APPLY exact-substring dedup: cut every detected duplicate span
    out of the lower-priority (id_b) document, keeping id_a's copy —
    the Lee et al. 2022 "deduplicating training data" removal step over
    substring_dup_spans output.

    Returns the rows of ``df`` with ``text_col`` replaced by the
    cleaned text plus ``removed_chars``. Overlapping spans (one doc
    duplicated against several partners) merge via cursor clamping, so
    each character is removed at most once.

    Scale shape: ONE groupBy(id_b) collects each document's cut list
    (bounded: spans per doc <= partners x spans-per-pair, both capped
    upstream by max_bucket / max_anchors), one left join back to the
    corpus, and the cutting itself is a Catalyst ``aggregate`` HOF over
    the sorted cut list — substring concatenation in whole-stage
    codegen, no Python in the apply path."""
    cuts = spans.groupBy(F.col("id_b").alias(id_col)).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("pos_b").cast("bigint").alias("p"),
                         F.col("span_len").cast("bigint").alias("l")))
        ).alias("__cuts"))
    joined = df.join(cuts, id_col, "left")
    txt = F.col(text_col)
    init = F.struct(F.lit("").alias("out"), F.lit(0).cast("bigint").alias("cur"))

    def step(acc, c):
        # emit [cur, p) then jump the cursor past the span; clamps make
        # overlapping/contained spans merge instead of double-cutting
        keep = F.substring(
            txt, (acc["cur"] + 1).cast("int"),
            F.greatest(c["p"] - acc["cur"], F.lit(0).cast("bigint")).cast("int"))
        return F.struct(
            F.concat(acc["out"], keep).alias("out"),
            F.greatest(acc["cur"], c["p"] + c["l"]).alias("cur"))

    def fin(acc):
        return F.concat(
            acc["out"],
            F.substring(txt, (acc["cur"] + 1).cast("int"),
                        (F.length(txt).cast("bigint") - acc["cur"]).cast("int")))

    clean = F.when(F.col("__cuts").isNull(), txt).otherwise(
        F.aggregate("__cuts", init, step, fin))
    return (
        joined.withColumn("__clean", clean)
        .withColumn("removed_chars",
                    (F.length(txt) - F.length("__clean")).cast("bigint"))
        .drop("__cuts", text_col)
        .withColumnRenamed("__clean", text_col)
    )
