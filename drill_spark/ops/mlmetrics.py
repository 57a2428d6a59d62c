"""Classifier-evaluation metrics for quality-scorer pipelines.

A training-data pipeline that gates documents on a learned quality
score (fastText-style classifier, trigram-LM ratio, DSIR weight) needs
to EVALUATE that scorer at corpus scale before trusting it: ROC-AUC
against a labeled slice, and a reliability table showing where the
scores are miscalibrated. Both are published textbook statistics
(Mann-Whitney U for AUC — Hanley & McNeil 1982; reliability diagrams /
Brier score — Brier 1950, Niculescu-Mizil & Caruana 2005) re-expressed
as exact integer rank arithmetic so the distributed result is
bit-deterministic and a SQL oracle can replay it.

Scale shape: scores are binned to fixed decimal precision first
(``score_decimals``), so every downstream aggregate runs on the
DISTINCT-BIN table — bounded by 10^decimals regardless of corpus size.
The per-bin ordered window is a single-partition window over that
bounded table (the same accepted shape as the sketch merges), never
over corpus rows; the corpus-scale work is ONE map-combined groupBy.
Ties are handled by the standard midrank convention, computed exactly:
AUC = (sum over bins of pos_b * (2*neg_below_b + neg_b)) / (2*P*N) —
all-integer until the final division, so Spark and DuckDB agree to the
last bit. Binning IS the documented approximation: AUC is exact for
the binned scores (scores that already carry <= ``score_decimals``
decimals are evaluated exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binary_auc(df: DataFrame, label_col: str, score_col: str,
               score_decimals: int = 6) -> DataFrame:
    """ROC-AUC of ``score_col`` against binary ``label_col`` (0/1),
    exact under midrank tie handling on scores binned to
    ``score_decimals`` decimals.

    Returns ONE row: (n_pos, n_neg, auc) with auc floored to 6
    decimals (one double division of exact bigints; floor, not
    round, so engines can't disagree at a rounding midpoint). A
    single-class input (only positives or only negatives — plausible
    for a first streaming micro-batch) surfaces auc = NULL, matching
    :func:`binary_auc_by_group`, never NaN.
    """
    scale = 10 ** int(score_decimals)
    binned = df.select(
        F.floor(F.col(score_col) * scale).cast("long").alias("b"),
        F.col(label_col).cast("long").alias("y"),
    )
    g = binned.groupBy("b").agg(
        F.sum("y").alias("pos"),
        (F.count("*") - F.sum("y")).alias("neg"),
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    contrib = (
        g.withColumn("neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0)))
        .select(
            (F.col("pos") * (2 * F.col("neg_below") + F.col("neg")))
            .alias("u2"),
            "pos", "neg",
        )
    )
    return contrib.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        # floor-to-6-decimals, not round(): a ratio can land exactly on
        # a rounding midpoint where Spark HALF_UP and DuckDB diverge
        F.when(
            (F.sum("pos") > 0) & (F.sum("neg") > 0),
            F.floor(F.sum("u2") / (2.0 * F.sum("pos") * F.sum("neg"))
                    * 1e6) / 1e6,
        ).alias("auc"),
    )


def binary_auc_by_group(df: DataFrame, group_col: str, label_col: str,
                        score_col: str,
                        score_decimals: int = 6) -> DataFrame:
    """Per-group ROC-AUC — scorer drift by source/language/shard, the
    slice-level view a quality gate monitors (a scorer that holds 0.9
    overall and 0.6 on one language is a filter that silently skews
    the mixture). Same exact midrank arithmetic as :func:`binary_auc`,
    with every step keyed by the group: the rank window partitions on
    (group), so per-task state is one group's distinct-bin table.

    Returns (group_col, n_pos, n_neg, auc) — auc is NULL for a group
    lacking both classes (undefined, surfaced rather than skipped).
    """
    scale = 10 ** int(score_decimals)
    g = (
        df.select(
            F.col(group_col).alias("g"),
            F.floor(F.col(score_col) * scale).cast("long").alias("b"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("g", "b")
        .agg(F.sum("y").alias("pos"),
             (F.count("*") - F.sum("y")).alias("neg"))
    )
    w = (Window.partitionBy("g").orderBy("b")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        g.withColumn("neg_below",
                     F.coalesce(F.sum("neg").over(w), F.lit(0)))
        .groupBy("g")
        .agg(
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum("neg").cast("long").alias("n_neg"),
            F.when(
                (F.sum("pos") > 0) & (F.sum("neg") > 0),
                F.floor(
                    F.sum(F.col("pos") * (2 * F.col("neg_below")
                                          + F.col("neg")))
                    / (2.0 * F.sum("pos") * F.sum("neg")) * 1e6) / 1e6,
            ).alias("auc"),
        )
        .select(F.col("g").alias(group_col), "n_pos", "n_neg", "auc")
    )


def calibration_bins(df: DataFrame, label_col: str, score_col: str,
                     n_bins: int = 10,
                     score_decimals: int = 6) -> DataFrame:
    """Reliability table: equal-width score bins with the count, the
    positive fraction, and the mean score per bin — the data behind a
    reliability diagram. Mean scores stay exact: per-row scores floor
    to integer micro-units, sum as bigint, divide once.

    Returns (bin, n, n_pos, mean_score, frac_pos), bin in [0, n_bins).
    """
    scale = 10 ** int(score_decimals)
    b = F.least(
        F.floor(F.col(score_col) * n_bins), F.lit(n_bins - 1)
    ).cast("int")
    return (
        df.select(
            b.alias("bin"),
            F.col(label_col).cast("long").alias("y"),
            F.floor(F.col(score_col) * scale).cast("long").alias("su"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            (F.floor(F.sum("su") / (F.count("*") * float(scale)) * 1e6)
             / 1e6).alias("mean_score"),
            (F.floor(F.sum("y") / F.count("*") * 1e6) / 1e6)
            .alias("frac_pos"),
        )
        .orderBy("bin")
    )


def retrieval_eval(retrieved: DataFrame, relevant: DataFrame,
                   query_col: str = "query_id", doc_col: str = "doc_id",
                   rank_col: str = "rank", k: int = 10) -> DataFrame:
    """Retrieval-quality evaluation: per-query recall@k and reciprocal
    rank of a ranked result list against a relevance set — the numbers
    a search/RAG stack is graded by (recall@k for candidate
    generation, RR for ranking; Manning et al., IR evaluation).

    Exactness discipline: every metric is a per-QUERY rational of
    integer counts — no cross-query mean (a sum of doubles would be
    accumulation-order dependent); the caller aggregates however it
    wants. recall@k floors to 6 decimals; the reciprocal rank is
    reported as integer micro-units (floor(1e6/first_hit_rank)) so it
    hash-matches across engines.

    Scale shape: the retrieved side filters to rank <= k FIRST
    (bounded at queries x k rows), then one equi-join on (query, doc)
    against the relevance set and one groupBy per side — nothing
    scales with corpus size beyond the inputs themselves.

    Returns (query_col, n_rel, hits_at_k, recall_at_k, rr_micro) for
    every query present in ``relevant``; queries with no retrieved
    hits report zeros.
    """
    if k < 1:
        raise ValueError(f"retrieval_eval: k >= 1, got {k}")
    # Distinct on (query, doc) AFTER the rank<=k filter, keeping the
    # best rank: a doc retrieved at several ranks <= k must count once
    # in hits_at_k (else recall_at_k can exceed 1.0 while the relevance
    # side is distinct). The groupBy runs on the bounded queries x k
    # table, not the corpus.
    r = (retrieved.where(F.col(rank_col) <= int(k))
         .groupBy(F.col(query_col).alias("__q"),
                  F.col(doc_col).alias("__d"))
         .agg(F.min(rank_col).alias("__r")))
    rel = relevant.select(F.col(query_col).alias("__q"),
                          F.col(doc_col).alias("__d")).distinct()
    nrel = rel.groupBy("__q").agg(F.count("*").alias("n_rel"))
    per = (r.join(rel, ["__q", "__d"])
           .groupBy("__q")
           .agg(F.count("*").alias("hits_at_k"),
                F.min("__r").alias("__first")))
    return (
        nrel.join(per, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.col("n_rel").cast("long").alias("n_rel"),
            F.coalesce("hits_at_k", F.lit(0)).cast("long")
            .alias("hits_at_k"),
            (F.floor(F.coalesce("hits_at_k", F.lit(0)) / F.col("n_rel")
                     * 1e6) / 1e6).alias("recall_at_k"),
            F.coalesce(F.floor(1e6 / F.col("__first")), F.lit(0))
            .cast("long").alias("rr_micro"),
        )
    )


def brier_score(df: DataFrame, label_col: str, score_col: str,
                score_decimals: int = 6) -> DataFrame:
    """Mean squared error of the probabilistic score (Brier 1950),
    computed in integer micro-units so the sum is exact: per row
    (floor(score*10^d) - label*10^d)^2 as bigint, one division at the
    end. Returns ONE row (n, brier); brier is NULL (not NaN) for an
    empty input."""
    scale = 10 ** int(score_decimals)
    d = (F.floor(F.col(score_col) * scale).cast("long")
         - F.col(label_col).cast("long") * scale)
    return df.select((d * d).alias("e2")).agg(
        F.count("*").cast("long").alias("n"),
        F.when(
            F.count("*") > 0,
            F.floor(F.sum("e2") / (F.count("*") * float(scale) * scale)
                    * 1e6) / 1e6,
        ).alias("brier"),
    )
