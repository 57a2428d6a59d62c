"""Link-graph operators — PageRank centrality over crawl graphs.

The published crawl-curation stacks rank hosts/pages by link
centrality (Common Crawl publishes harmonic-centrality and
PageRank-style host rankings; quality filters consume them). With the
WARC readers and `ops/text.html_links` producing the edge list, this
module closes the loop: a distributed PageRank whose per-iteration
cost is ONE shuffle (the contribution aggregation by destination).

Scale shape (mirrors ops/dedup's connected-components loop):

- ranks and out-degrees are (node, value) tables co-keyed with the
  edge list's src — each iteration is edges ⋈ ranks ⋈ degrees (all on
  src) followed by a single groupBy(dst) SUM: one shuffle per
  iteration, sized by the EDGE list, never materializing anything
  per-pair beyond it.
- dangling mass (nodes with no out-links — link targets that were
  never crawled) is folded back uniformly each iteration, computed as
  a single-row aggregate CROSS-joined into the update (stays inside
  the plan; no driver round-trip per iteration).
- lineage is cut with a lazy ``localCheckpoint`` every few rounds
  (same trick as the CC loop) so N iterations cost N plans, not one
  exponentially nested plan.

Determinism: the update is pure arithmetic on (1-d)/n and edge
fan-out, so a fixed iteration count is exactly replayable — the
driver query's DuckDB oracle unrolls the same iterations in SQL CTEs
and hash-matches to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous PageRank updates
    over the directed edge list. Ranks sum to 1 (dangling mass is
    redistributed uniformly)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for it in range(iterations):
        with_deg = ranks.join(deg, ranks["node"] == deg["src"], "left")
        # nodes with no out-edges contribute their whole rank to the
        # uniform dangling pool; a single-row aggregate joined in
        dangling = with_deg.where(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("_c"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(dangling)
            .select(
                "node",
                (F.lit(base)
                 + F.lit(damping)
                 * (F.coalesce(F.col("_c"), F.lit(0.0))
                    + F.col("_dm") / F.lit(float(n)))).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
