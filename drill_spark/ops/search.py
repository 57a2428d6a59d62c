"""Full-text retrieval operators: BM25 top-k search, inverted-index
postings, and per-document TF-IDF keyword extraction.

The reference ships no search engine; this is part of the
training-data-pipeline extension surface (retrieval-style corpus
exploration and retrieval-based decontamination). Everything is a pure
Catalyst plan:

- the postings build is one tokenize+explode pass and one (term, doc)
  aggregation — at 100 TB this is the classic term-sharded inverted
  index and can be materialized once (``build_postings`` → write as
  parquet bucketed by term) and reused across queries;
- an inline BM25 search filters the exploded token stream to the
  query's terms BEFORE any shuffle, so only query-term postings move;
- document length comes from ``size(split(...))`` on the scan — no
  explode, no shuffle;
- per-term document frequencies and the corpus (N, avgdl) row are tiny
  aggregates joined back via broadcast;
- top-k is ``orderBy(...).limit(k)`` → TakeOrderedAndProject (per-
  partition heaps + driver merge of k rows), never a global sort.

Scores use Lucene's BM25 idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``
(non-negative for df <= N) and tf-idf uses the sklearn smooth idf
``ln((1 + N)/(1 + df)) + 1``. Ranking compares scores rounded to 6
decimals (ties broken by id/term) so results are reproducible across
engines whose ``ln`` differs in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from drill_spark.ops.dedup import tokens

_K1 = 1.2
_B = 0.75


def _term_stream(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (id, token) occurrence; empty tokens dropped."""
    return (
        df.select(id_col, F.explode(tokens(F.col(text_col))).alias("term"))
        .where(F.col("term") != "")
    )


def build_postings(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Inverted-index postings: one row per (term, id) with the term
    frequency. One explode + one aggregation (shuffle on (term, id));
    materialize with ``.write.bucketBy(n, "term")`` to make repeated
    searches scan-only."""
    return (
        _term_stream(df, id_col, text_col)
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )


def doc_lengths(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, dl) token counts straight off the scan — size(split()),
    zero shuffles."""
    return df.select(
        id_col,
        F.size(F.filter(tokens(F.col(text_col)), lambda t: t != "")).alias("dl"),
    )


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = _K1, b: float = _B, id_col: str = "doc_id",
              text_col: str = "text",
              postings: DataFrame | None = None) -> DataFrame:
    """BM25 top-k document retrieval for a bag-of-words query.

    Returns (id, score) of the k highest-scoring documents, score
    rounded to 6 decimals, ranked (rounded score desc, id asc). When
    ``postings`` is given (a ``build_postings`` result, e.g. read back
    from a bucketed table) the text column is only used for document
    lengths; otherwise postings are built inline restricted to the
    query's terms, so the aggregation shuffle carries query-term rows
    only — at 100 TB that is a few rows per matching document, not the
    token stream.
    """
    terms = sorted({t.strip().lower() for t in query_terms if t.strip()})
    if not terms:
        raise ValueError("bm25_topk: empty query")

    if postings is None:
        stream = _term_stream(df, id_col, text_col)
        stream = stream.where(F.col("term").isin(terms))
        post = stream.groupBy("term", id_col).agg(F.count("*").alias("tf"))
    else:
        post = postings.where(F.col("term").isin(terms))

    dl = doc_lengths(df, id_col, text_col)
    corpus = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    dfreq = post.groupBy("term").agg(F.count("*").alias("df"))

    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))

    scored = (
        post.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .select(id_col, (idf * norm).alias("part"))
        .groupBy(id_col)
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def tfidf_keywords(df: DataFrame, top_n: int = 3, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-document top-n keywords by smooth tf-idf.

    Returns (id, term, tfidf, kw_rank). Document frequencies are a
    vocabulary-sized aggregate (bounded regardless of corpus size)
    joined back via broadcast; the per-document ranking is one window
    partitioned by id — state per task is one document's vocabulary.
    Ranked by (tfidf rounded to 6 desc, term asc) for reproducibility.
    """
    post = build_postings(df, id_col, text_col)
    n_docs = df.agg(F.count("*").alias("n_docs"))
    dfreq = post.groupBy("term").agg(F.count("*").alias("df"))

    idf = F.log((F.lit(1.0) + F.col("n_docs")) / (F.col("df") + 1.0)) + 1.0
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term"))
    return (
        post.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(id_col, "term", F.round(F.col("tf") * idf, 6).alias("tfidf"))
        .withColumn("kw_rank", F.row_number().over(w))
        .where(F.col("kw_rank") <= top_n)
        .select(id_col, "term", "tfidf", "kw_rank")
    )
