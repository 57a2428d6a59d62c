"""Fuzzy join / entity resolution: token blocking + edit-distance
verify, as one equi-join plan.

The classic record-linkage shape (Papadakis et al. blocking surveys,
Dedoop/Magellan): generate candidate pairs by joining on a shared
blocking key — here shared lowercase tokens — then verify candidates
with an exact string distance. All Catalyst:

- blocking is ONE equi-join on the token column (shuffle bounded by
  the token streams, never an all-pairs product);
- hot tokens (stopword-like blocking keys that would make one bucket
  quadratic) are dropped by a document-frequency cap *before* the
  join — the standard stop-token pruning; recall is then limited to
  pairs sharing a sub-cap token, which the caller trades off via
  ``max_df`` (None keeps everything);
- a cheap length-band prefilter (|len(a) - len(b)| <= max_dist, a
  necessary condition for edit distance) runs in codegen before the
  O(len^2) levenshtein, which itself is Catalyst's built-in
  ``levenshtein`` — no Python in the row path.

The verify metric is exact Levenshtein so results are deterministic
and engine-portable (integer distances, no float thresholds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drill_spark.ops.dedup import tokens


def _block_keys(df: DataFrame, id_col: str, text_col: str,
                max_df: int | None) -> DataFrame:
    """Distinct (id, token) blocking pairs, hot tokens pruned."""
    keys = (
        df.select(id_col, F.explode(tokens(F.col(text_col))).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    if max_df is not None:
        freq = keys.groupBy("tok").agg(F.count("*").alias("df"))
        keys = (
            keys.join(F.broadcast(freq.where(F.col("df") > max_df)),
                      "tok", "left_anti")
        )
    return keys


def fuzzy_join(left: DataFrame, right: DataFrame, left_id: str,
               left_col: str, right_id: str, right_col: str,
               max_dist: int = 2,
               max_df: int | None = None) -> DataFrame:
    """Join rows whose strings are within ``max_dist`` edits and share
    at least one (sub-``max_df``) token.

    Returns (left_id, right_id, left_col, right_col, dist). Candidate
    generation is an equi-join on tokens; the df cap is evaluated on
    the LEFT stream (the big side at scale — the right stream prunes
    with the same token set so both sides drop the same keys).
    """
    if len({left_id, left_col, right_id, right_col}) != 4:
        raise ValueError("fuzzy_join: column names must be distinct "
                         "(alias the inputs)")
    lk = _block_keys(left, left_id, left_col, max_df=max_df)
    rk = _block_keys(right, right_id, right_col, max_df=None)
    if max_df is not None:
        # prune the right stream with the left's surviving token set so
        # hot tokens never reach the join from either side
        rk = rk.join(lk.select("tok").distinct(), "tok", "left_semi")

    cand = (
        lk.join(rk, "tok")
        .select(left_id, right_id)
        .distinct()
    )
    out = (
        cand.join(left.select(left_id, left_col), left_id)
        .join(right.select(right_id, right_col), right_id)
        .where(F.abs(F.length(left_col) - F.length(right_col)) <= max_dist)
        .withColumn("dist", F.levenshtein(F.col(left_col), F.col(right_col)))
        .where(F.col("dist") <= max_dist)
    )
    return out.select(left_id, right_id, left_col, right_col, "dist")
