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


# ---------------- KMV / theta distinct-count sketches ----------------
#
# The companion problem to heavy hitters: "how many DISTINCT users /
# urls / tokens per segment, and how much do two segments overlap"
# over columns with billions of distinct values. Exact count_distinct
# shuffles one row per distinct key (cardinality-sized); the KMV
# (k-minimum-values) sketch (Bar-Yossef et al. 2002; the theta sketch
# of the Apache DataSketches library, Dasgupta et al. 2016) keeps only
# the k smallest hash values per segment — bounded state, mergeable,
# and DETERMINISTIC given the hash, which is why these queries are
# DuckDB-oracle-backed (the oracle reproduces the exact same sketch
# with a row_number window; reference analog: Drill's approx NDV
# aggregates in exec/java-exec HLL functions, same role).
#
# Scale shape mirrors heavy_hitters: pass 1 is a mapInPandas kernel
# with one k-slot summary per segment per task (state k * segments *
# tasks, independent of cardinality); the only shuffle carries <= k
# hashes per (segment, task). The merge is associative: the global k
# smallest distinct hashes = k smallest of the union of partial
# sketches, so the distributed result is bit-identical to a
# single-pass computation.

_KMV_DENOM = float(1 << 60)  # hash domain: 60-bit ints (15 hex chars)


def _kmv_partition(seg_col: str, k: int):
    """mapInPandas pass-1 kernel: per segment, the k smallest distinct
    hash values seen in this task. Hashes arrive precomputed from the
    JVM (codegen md5), so the Python side is pure numpy — per batch,
    np.unique per segment (sorted ascending) sliced to k, merged into
    the carried state (the merge is associative, so batch-wise folding
    preserves exactly 'k smallest distinct of everything seen')."""

    def run(batches):
        import numpy as np
        import pandas as pd

        state: dict = {}  # seg -> ascending np.ndarray of <= k hashes
        for pdf in batches:
            for seg, grp in pdf.groupby(seg_col, sort=False,
                                        dropna=True)["__hv"]:
                top = np.unique(grp.to_numpy())[:k]
                prev = state.get(seg)
                if prev is not None:
                    top = np.unique(np.concatenate([prev, top]))[:k]
                state[seg] = top
        yield pd.DataFrame(
            {seg_col: list(state.keys()),
             "hashes": [v.tolist() for v in state.values()]})

    return run


def _kmv_sketches(df: DataFrame, seg_col: str, item_col: str,
                  k: int) -> DataFrame:
    """(segment, hashes) with the global k smallest distinct hash
    values per segment."""
    if k < 2:
        raise ValueError("kmv: k must be >= 2")
    # 60-bit hash computed JVM-side (whole-stage codegen over the scan;
    # the cast to string pins the exact rendering the SQL oracle's
    # CAST(x AS VARCHAR) produces) — the Python kernel only selects
    # k-minima, vectorized.
    hv = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    src = (
        df.where(F.col(seg_col).isNotNull() & F.col(item_col).isNotNull())
        .select(seg_col, hv.alias("__hv"))
    )
    schema = T.StructType([
        src.schema[seg_col],
        T.StructField("hashes", T.ArrayType(T.LongType()), True),
    ])
    partials = src.mapInPandas(_kmv_partition(seg_col, k), schema)
    return partials.groupBy(seg_col).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("hashes")))),
            1, k,
        ).alias("hashes")
    )


def kmv_distinct(df: DataFrame, seg_col: str, item_col: str,
                 k: int = 64) -> DataFrame:
    """Approximate distinct ``item_col`` count per ``seg_col`` with a
    k-minimum-values sketch. Exact below k distinct values; above, the
    unbiased KMV estimator (k-1)/theta with theta = the k-th smallest
    normalized hash (relative standard error ~ 1/sqrt(k-2)).

    Returns (segment, n_hashes, theta_hash, est_distinct) — est
    rounded to 4 decimals so the oracle comparison is float-stable.
    """
    sk = _kmv_sketches(df, seg_col, item_col, k)
    n = F.size("hashes")
    theta = F.element_at("hashes", n).cast("double")
    est = F.when(n < k, n.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(_KMV_DENOM) / theta, 4)
    )
    return sk.select(
        F.col(seg_col),
        n.cast("long").alias("n_hashes"),
        F.element_at("hashes", n).alias("theta_hash"),
        est.alias("est_distinct"),
    )


def kmv_overlap(df: DataFrame, seg_col: str, item_col: str,
                seg_a: str, seg_b: str, k: int = 64) -> DataFrame:
    """Set-overlap estimates between two segments from their KMV
    sketches — the theta-sketch intersection/union estimators
    (Dasgupta et al. 2016): theta = min(theta_a, theta_b); every
    retained hash below theta is a uniform sample of the segment, so
    |sample ∩| / theta estimates the distinct intersection.

    Returns one row (seg_a, seg_b, est_a, est_b, est_union,
    est_intersect, jaccard). Deterministic given the hash → oracle-
    backed. The two sketch rows are tiny; the overlap math is array
    HOFs on <= k elements.
    """
    sk = _kmv_sketches(
        df.where(F.col(seg_col).isin(seg_a, seg_b)), seg_col, item_col, k
    )
    full = F.lit(int(_KMV_DENOM))

    def side(seg: str, h: str, t: str) -> DataFrame:
        # agg(first) always yields exactly one row, so an ABSENT segment
        # degrades to an empty sketch (theta = full domain -> all
        # estimates 0.0) instead of collapsing the crossJoin to 0 rows.
        return (
            sk.where(F.col(seg_col) == seg)
            .agg(F.first("hashes").alias(h))
            .select(F.coalesce(F.col(h),
                               F.array().cast("array<long>")).alias(h))
            .select(F.col(h),
                    F.when(F.size(h) < k, full)
                    .otherwise(F.element_at(h, F.size(h))).alias(t))
        )

    a = side(seg_a, "ha", "ta")
    b = side(seg_b, "hb", "tb")
    j = a.crossJoin(F.broadcast(b))  # 1 row x 1 row
    theta = F.least("ta", "tb")
    under = lambda c: F.filter(c, lambda h: h < theta)  # noqa: E731
    inter = F.size(F.array_intersect(under(F.col("ha")), under(F.col("hb"))))
    union = F.size(F.array_distinct(F.concat(under(F.col("ha")),
                                             under(F.col("hb")))))
    # Multiply BEFORE dividing so the IEEE association order matches the
    # DuckDB oracle's left-associative (count * DENOM) / theta exactly —
    # a 1-ulp difference could round differently at 4 decimals.
    est = lambda c: F.round(  # noqa: E731
        c.cast("double") * F.lit(_KMV_DENOM) / theta.cast("double"), 4)
    return j.select(
        F.lit(seg_a).alias("seg_a"),
        F.lit(seg_b).alias("seg_b"),
        est(F.size(under(F.col("ha")))).alias("est_a"),
        est(F.size(under(F.col("hb")))).alias("est_b"),
        est(union).alias("est_union"),
        est(inter).alias("est_intersect"),
        F.round(
            F.when(union > 0, inter.cast("double") / union.cast("double"))
            .otherwise(F.lit(0.0)), 4
        ).alias("jaccard"),
    )


def kmv_rolling_distinct(df: DataFrame, time_col: str, item_col: str,
                         k: int = 64, n_days: int = 7) -> DataFrame:
    """Rolling n-day distinct counts from per-day KMV sketches — the
    mergeability payoff: distinct counts are not additive, so a naive
    rolling distinct re-scans n days of raw rows per day, but sketch
    MERGE (k smallest of the union) is associative, so each day's raw
    data is summarized ONCE and every rolling window is an array merge
    of <= n_days tiny sketches (the DataSketches segment-rollup
    pattern; at 100 TB the window stage touches one k-length array per
    day, never raw rows).

    Returns (day, est_day, est_rolling) — both estimates deterministic
    given the hash, so the query is oracle-backed.
    """
    from pyspark.sql import Window

    daily = _kmv_sketches(
        df.select(F.date_trunc("day", F.col(time_col)).alias("__day"),
                  item_col),
        "__day", item_col, k)
    # Distribute the rolling window instead of a global-order (single
    # partition) sort: bucket days into coarse ranges of B >= n_days
    # days, replicate each day's sketch into its own bucket AND the
    # next one (so every window's <= n_days-1 lookback is locally
    # present), run the window PARTITIONED by bucket, and keep only
    # the home-bucket replica. Each day appears exactly once per
    # partition, duplication is a flat 2x on the already-tiny per-day
    # sketch table, and a century of days spreads over ~100 yearly
    # partitions rather than one.
    bucket_days = max(int(n_days), 365)
    dnum = F.datediff(F.col("__day"), F.lit("1970-01-01")).cast("long")
    rep = (
        daily.withColumn("__dnum", dnum)
        .withColumn("__off", F.explode(F.array(F.lit(0), F.lit(1))))
        .withColumn(
            "__bucket",
            F.floor(F.col("__dnum") / F.lit(bucket_days)) + F.col("__off"))
    )
    w = (Window.partitionBy("__bucket").orderBy(F.col("__dnum").asc())
         .rangeBetween(-(n_days - 1), Window.currentRow))
    merged = F.slice(
        F.array_sort(F.array_distinct(
            F.flatten(F.collect_list("hashes").over(w)))),
        1, k)

    def _est(h):
        n = F.size(h)
        theta = F.element_at(h, n).cast("double")
        return F.when(n < k, n.cast("double")).otherwise(
            F.round(F.lit(float(k - 1)) * F.lit(_KMV_DENOM) / theta, 4))

    return (
        rep.withColumn("__roll", merged)
        .where(F.col("__off") == 0)
        .select(
            F.col("__day").cast("date").alias("day"),
            _est(F.col("hashes")).alias("est_day"),
            _est(F.col("__roll")).alias("est_rolling"),
        )
    )


def rolling_quantiles(df: DataFrame, time_col: str, val_col: str,
                      lo: float, hi: float, n_bins: int = 128,
                      n_days: int = 7,
                      quantiles: tuple[float, ...] = (0.5, 0.95)
                      ) -> DataFrame:
    """Rolling n-day quantile estimates from ADDITIVE per-day
    histograms — the quantile companion to kmv_rolling_distinct.
    Quantiles (like distincts) are not additive, but fixed-bin
    histograms are: each day's raw rows reduce to <= n_bins counts
    ONCE, every rolling window is a vector add of <= n_days tiny
    histograms, and the estimate reads the cumulative distribution at
    the target rank (bin-midpoint rule). Deterministic — no sampling,
    no centroid drift (the reason this is oracle-backed while t-digest
    style sketches are error-bounded only).

    Values are clamped into [lo, hi); estimate error is bounded by the
    bin width (hi-lo)/n_bins. Returns (day, n_rolling, q50, q95, ...)
    one column per requested quantile, rounded to 4 decimals.

    Scale shape: ONE map-combined (day, bin) count aggregation over the
    raw rows; everything after operates on days x n_bins rows (a
    decade of days x 128 bins = half a million tiny rows, not data).
    """
    from pyspark.sql import Window

    if not hi > lo:
        raise ValueError("rolling_quantiles: hi must be > lo")
    if n_days < 1 or n_bins < 2:
        raise ValueError("rolling_quantiles: need n_days >= 1, n_bins >= 2")
    span = float(hi) - float(lo)
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor(
            (F.col(val_col) - F.lit(float(lo))) * n_bins / F.lit(span)
        ).cast("int")),
    )
    day = F.date_trunc("day", F.col(time_col))
    v = F.col(val_col).cast("double")
    per = (
        # NaN excluded like null: a non-ANSI int cast would silently
        # drop NaN into bin 0 and drag quantiles toward lo.
        df.where(v.isNotNull() & ~F.isnan(v))
        .groupBy(day.alias("__day"), bin_.alias("__bin"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    dnum = F.datediff(F.col("__day"), F.lit("1970-01-01")).cast("long")
    roll_w = (Window.partitionBy("__bin").orderBy(dnum.asc())
              .rangeBetween(-(n_days - 1), Window.currentRow))
    # per (day, bin): rolling count. Days where a bin had no rows are
    # absent — backfill by joining the day spine to the bin spine so
    # every (day, bin) pair exists before the range window runs.
    days = per.select("__day").distinct()
    bins = per.select("__bin").distinct()
    dense = (
        days.crossJoin(F.broadcast(bins))
        .join(per, ["__day", "__bin"], "left")
        .withColumn("__c", F.coalesce("__c", F.lit(0)))
    )
    rolled = dense.withColumn("__rc", F.sum("__c").over(roll_w))
    cum_w = (Window.partitionBy("__day").orderBy("__bin")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (
        rolled.withColumn("__cum", F.sum("__rc").over(cum_w))
        .withColumn("__tot", F.sum("__rc").over(Window.partitionBy("__day")))
    )
    aggs = [F.max("__tot").cast("long").alias("n_rolling")]
    for q in quantiles:
        qbin = F.min(
            F.when(F.col("__cum") >= F.lit(q) * F.col("__tot"), F.col("__bin"))
        )
        name = f"q{int(round(q * 100)):02d}"
        aggs.append(F.round(
            (qbin + 0.5) * span / n_bins + float(lo), 4).alias(name))
    return (
        cum.groupBy(F.col("__day").cast("date").alias("day"))
        .agg(*aggs)
        .where(F.col("n_rolling") > 0)
    )


def _cms_check(width: int, depth: int) -> None:
    if width < 1 or depth < 1:
        raise ValueError("cms: need width >= 1 and depth >= 1")


def _cms_bucket(j, key_col, width: int):
    """The CMS hash, shared by build and estimate so the two can never
    drift: bucket_j(key) = 32-bit md5('<j>:' || key) % width. ``j`` may
    be a Python int or a Column."""
    seed = (F.lit(f"{j}:") if isinstance(j, int)
            else F.concat(j.cast("string"), F.lit(":")))
    return (
        F.conv(
            F.substring(F.md5(F.concat(seed, key_col.cast("string"))), 1, 8),
            16, 10).cast("long") % width
    )


def cms_build(df: DataFrame, col: str, width: int = 1024,
              depth: int = 4) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of ``col``:
    ``depth`` md5-seeded hash rows x ``width`` counters. The build is
    ONE map-combined aggregation whose output is <= depth*width rows
    regardless of key cardinality — the additive frequency summary
    (point-query companion to Misra-Gries top-k: MG answers "which
    keys are heavy", CMS answers "how often is THIS key", both at
    bounded state). Mergeable: sketches of two datasets add
    counter-wise. Deterministic given the hash → oracle-backed.

    Returns (j, bucket, c)."""
    _cms_check(width, depth)
    rows = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _cms_bucket(j, F.col(col), width).alias("bucket"))
        for j in range(depth)
    ])
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(rows).alias("h"))
        .groupBy(F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, col: str,
                 width: int = 1024, depth: int = 4) -> DataFrame:
    """Point-frequency estimates for the ``probes`` keys from a
    cms_build sketch: min over the depth counters the key hashes to
    (never underestimates; overestimate bounded by collisions ~ N/width
    per row, min over depth rows). Probes x depth is a tiny spine;
    the sketch side joins on (j, bucket) — broadcast when the sketch
    fits, which at depth*width rows it always does.

    Returns (key, est)."""
    _cms_check(width, depth)
    spine = probes.where(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("__key"),
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
    ).withColumn("bucket", _cms_bucket(F.col("j"), F.col("__key"), width))
    return (
        spine.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(F.col("__key").alias("key"))
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two cms_build sketches (same width/depth/hash): counters
    add cell-wise, so the merged sketch equals the sketch of the
    unioned data exactly — the property that lets per-partition /
    per-day / per-snapshot sketches roll up without touching raw
    rows."""
    return (
        a.unionByName(b).groupBy("j", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def kmv_merge(a: DataFrame, b: DataFrame, seg_col: str,
              k: int) -> DataFrame:
    """Merge two _kmv_sketches outputs: per segment, the k smallest of
    the union of retained hashes — exactly the sketch of the unioned
    data (associativity), so per-dataset sketches roll up losslessly."""
    return (
        a.unionByName(b).groupBy(seg_col)
        .agg(F.slice(
            F.array_sort(F.array_distinct(
                F.flatten(F.collect_list("hashes")))), 1, k
        ).alias("hashes"))
    )
