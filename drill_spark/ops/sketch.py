"""Frequency-sketch operators — exact heavy hitters at bounded memory.

The 100 TB problem: "which URLs / domains / tokens appear in more than
1/k of all rows" over a column with BILLIONS of distinct values. The
naive ``groupBy(col).count()`` shuffles every distinct key — shuffle
sized by the CARDINALITY, not the answer. The classic two-pass scheme
(Misra-Gries 1982 summaries + an exact verify pass) bounds the state
instead:

- **pass 1 (candidates)**: each task maintains a Misra-Gries summary
  with k counters (decrement-all when full) and also emits its row
  count. MG guarantees any item with LOCAL count > n_p/(k+1) survives
  locally, and by pigeonhole any item with GLOBAL count > n/(k+1)
  exceeds that local threshold in at least one task — so the union of
  per-task candidate sets (<= k rows per task, independent of
  cardinality) is a SUPERSET of the true heavy hitters. The summary
  output is persisted: it is k*n_tasks rows, so both the total and the
  candidate set come from ONE scan of the data.
- **pass 2 (verify)**: broadcast the candidate set (tiny), semi-join
  to count ONLY candidate keys exactly, keep count * (k+1) > total.

Result: EXACT phi-heavy-hitters for phi = 1/(k+1), two data scans,
shuffle and state sized by k * n_tasks instead of key cardinality.
Deterministic (no sampling, no hash error) — which is why the driver
query is DuckDB-oracle-backed with a closed-form HAVING clause.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_partition(col: str, k: int):
    """mapInPandas pass-1 kernel: one Misra-Gries summary per task,
    emitting candidate keys (n_rows null) plus one per-task row-count
    marker (key null)."""

    def run(batches):
        import pandas as pd

        counters: dict = {}
        n = 0
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                n += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = []
                    for key in counters:  # decrement-all (the MG step)
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {col: list(counters.keys()) + [None],
             "n_rows": [None] * len(counters) + [n]})

    return run


def heavy_hitters(df: DataFrame, col: str, k: int = 50) -> DataFrame:
    """Items of ``col`` whose count is strictly greater than n/(k+1)
    (n = non-null rows), with their EXACT counts. Two scans, state
    bounded by k per task. Returns (col, cnt)."""
    if k < 1:
        raise ValueError("heavy_hitters: k must be >= 1")
    src = df.select(col)
    schema = T.StructType([src.schema[col],
                           T.StructField("n_rows", T.LongType(), True)])
    summary = src.mapInPandas(_mg_partition(col, k), schema).persist()
    total = summary.agg(F.sum("n_rows")).first()[0] or 0
    candidates = (
        summary.where(F.col(col).isNotNull()).select(col).distinct()
    )
    return (
        src.join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") * (k + 1) > F.lit(total))
    )
