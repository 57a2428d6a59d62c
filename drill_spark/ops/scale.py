"""Scale utilities: skew-salted joins and bucketed co-located joins.

These are the knobs SURVEY §2.10 maps from Drill's exchange planning
(HashToRandomExchange / DrillDistributionTrait) onto Spark's shuffle:

- **salted_join** — when one join key is pathologically hot, AQE's skew
  split (on by default in `session.get_spark`) handles most cases at
  runtime; salting is the *static* fallback for known-degenerate keys
  (e.g. null-ish sentinel ids in a 100 TB fact table). The hot side
  gets a deterministic salt in [0, salt); the small side is replicated
  salt times; the join key becomes (key, salt) so one hot key spreads
  over `salt` reducers. Result-set equality with the plain join is
  guaranteed (replication × salt partition covers every pair exactly
  once).

- **write_bucketed / bucketed co-located join** — Drill co-locates by
  hash distribution trait; Spark persists the distribution as bucketed
  tables: both sides bucketed on the join key with the same bucket
  count join WITHOUT a shuffle (no Exchange above either scan). The
  pre-shuffle is paid once at write time — the right trade for
  fact tables joined repeatedly on the same key at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_SALT_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"}


def salted_join(
    hot: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join a skew-prone large side against a smaller side with key
    salting. Output columns = hot's columns + small's non-key columns
    (like df.join(other, on)).

    Only inner/left/left_semi are supported: the small side is replicated
    ``salt`` times, so right/full joins would emit every unmatched
    small-side row once per replica (and anti joins lose rows)."""
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: the "
            "replicated small side would duplicate unmatched rows in "
            "right/full joins. Use AQE skew handling for those."
        )
    salt_col = "_salt"
    # deterministic pseudo-salt from the row content keeps re-runs stable
    hot_salted = hot.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(salt))
    )
    replicas = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    return hot_salted.join(replicas, on + [salt_col], how).drop(salt_col)


def choose_skew_strategy(
    hot: DataFrame,
    on: list[str],
    how: str = "inner",
    skew_threshold: float = 4.0,
) -> dict:
    """Measure-then-decide half of the documented skew auto-path
    (``skew_profile`` → ``salted_join``): profile the join key on the
    hot side and return the strategy a plain Spark join cannot always
    pick for itself.

    AQE's OptimizeSkewedJoin splits oversized sort-merge partitions at
    runtime (proven in tests/test_scale.py::test_aqe_skew_join_split),
    but it only applies to shuffle-join reads — it cannot help when the
    downstream plan PINS the partitioning (a window or groupBy keyed on
    the same hot column reuses the join's exchange, so splitting it
    would break the required distribution), and it never fires for
    broadcast-ineligible shapes it can't re-read. Those are the cases
    where static salting is the right call, and the decision needs a
    measurement, not a guess.

    Cost: ONE map-side-combined count over the hot side's key with a
    top-1 TakeOrdered — bounded output, the same pass skew_profile runs.
    Returns {strategy, skew, share, key}: strategy is 'salted' when the
    heaviest key's count exceeds ``skew_threshold``× the mean per-key
    count AND ``how`` is salt-safe, else 'plain' (AQE's runtime split
    covers the rest).

    Reference anchor: Drill hash-distributes both join sides by key
    (planner/physical/DrillDistributionTrait.java:144) with no skew
    mitigation at all — a hot key lands on one minor fragment; this
    auto-path is the scale story Drill lacks.
    """
    kcol = (
        F.col(on[0]) if len(on) == 1
        else F.concat_ws("\x1f", *[F.col(c).cast("string") for c in on])
    )
    prof = skew_profile(hot.select(kcol.alias("__k")), "__k", top=1).collect()
    if not prof:
        return {"strategy": "plain", "skew": 0.0, "share": 0.0, "key": None}
    r = prof[0]
    salt_ok = (how.lower().replace("_", "")
               in {h.replace("_", "") for h in _SALT_SAFE_HOW})
    strategy = ("salted" if (r["skew"] >= skew_threshold and salt_ok)
                else "plain")
    return {"strategy": strategy, "skew": float(r["skew"]),
            "share": float(r["share"]), "key": r["key"]}


def auto_skew_join(
    hot: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    skew_threshold: float = 4.0,
    salt: int = 16,
) -> DataFrame:
    """The documented skew auto-path: profile the hot side's join key
    (one bounded aggregation), then route — ``salted_join`` when one
    key exceeds ``skew_threshold``× the mean per-key count and the join
    type is salt-safe, plain join otherwise (AQE's runtime skew split
    handles moderate sort-merge skew on its own). Result-set equality
    with the plain join holds on both routes. At 100 TB, size ``salt``
    ≈ hot-key rows / target partition rows so the hottest key spreads
    to that many reducers."""
    decision = choose_skew_strategy(hot, on, how, skew_threshold)
    if decision["strategy"] == "salted":
        return salted_join(hot, small, on, how, salt)
    return hot.join(small, on, how)


def salted_topk(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    salt: int = 16,
) -> DataFrame:
    """Top-k rows per key under key skew — the WINDOW shape AQE cannot
    split: `row_number() OVER (PARTITION BY key ORDER BY v)` requires
    every row of a key in ONE task, so a key holding 30% of a 100 TB
    table serializes 30 TB through one core and AQE's skew-join split
    never applies (it only rewrites shuffle-read JOINS, and splitting a
    window's exchange would violate the operator's required
    distribution).

    Two-stage salted rewrite with exact result equality: stage 1 ranks
    within (key, salt) — the hot key spreads over `salt` tasks — and
    keeps k rows per salt; stage 2 ranks the <= salt*k survivors per
    key. The global top-k of a key is contained in the union of its
    per-salt top-k's (any row beaten by >= k rows globally is beaten by
    >= k rows within its own salt bucket... conversely every global
    top-k row survives its bucket), so stage 2 sees every winner.

    Ties broken by the remaining column values' hash is NOT done —
    like Spark's own row_number, ties beyond (order_col) are
    partition-order dependent; pass a unique tiebreak column inside
    order_col upstream if exact tie determinism is needed (the tests
    use unique order values).
    """
    from pyspark.sql import Window

    order = F.asc(order_col) if ascending else F.desc(order_col)
    salt_col = "_tk_salt"
    salted = df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)))
    w1 = Window.partitionBy(*key_cols, salt_col).orderBy(order)
    stage1 = (salted.withColumn("_r1", F.row_number().over(w1))
              .where(F.col("_r1") <= k).drop("_r1", salt_col))
    w2 = Window.partitionBy(*key_cols).orderBy(order)
    return (stage1.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k))


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and sorted) table so future joins and
    aggregations on bucket_cols need no shuffle."""
    import os
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a dropped managed table can leave its location behind after a
    # crashed run; overwrite mode refuses to reuse it — clear it
    loc = os.path.join(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace("file:", ""), name.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)
    writer = df.write.mode("overwrite").bucketBy(buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(name)


def skew_profile(df, key_col: str, top: int = 5):
    """Key-skew diagnostic — the measurement you run BEFORE choosing a
    join/agg strategy at scale: per-key counts for the ``top`` heaviest
    keys plus each key's share of all rows and the ratio of its count
    to the mean per-key count (``skew``; >> 1 means salting or AQE
    skew-join territory for any shuffle keyed on this column).

    Shape: ONE map-side-combined count aggregation + TakeOrdered for
    the top slice (never a global sort); the totals join is a
    single-row broadcast. Deterministic ties: count desc, then key.
    """
    from pyspark.sql import functions as F

    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key", "cnt",
            F.round(F.col("cnt") / F.col("total_rows"), 6).alias("share"),
            F.round(F.col("cnt") * F.col("n_keys") / F.col("total_rows"), 4)
            .alias("skew"),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(top)
    )


def mad_outliers(df, key_col: str, val_col: str, k: float = 3.0):
    """Robust per-key outlier detection via the median absolute
    deviation — the monitoring primitive a 100 TB pipeline runs over
    its metric streams (MAD tolerates the very outliers a stddev
    z-score would absorb).

    Flags rows with |v - median| > k * MAD. Returns the flagged rows as
    (key, value, med, mad, score) with score = |v-med|/MAD rounded 4dp.
    Keys whose MAD is 0 (constant values) flag nothing.

    Scale shape: two exact-median aggregations (the second over
    deviations, which requires the first — MAD is inherently
    two-pass) and two equi-joins, ALL keyed by the same column so the
    exchanges reuse; no windows over the raw stream, no driver state.
    """
    med = df.groupBy(key_col).agg(
        F.median(val_col).alias("med"))
    dev = (
        df.join(med, key_col)
        .groupBy(key_col)
        .agg(F.median(F.abs(F.col(val_col) - F.col("med"))).alias("mad"),
             F.first("med").alias("med"))
    )
    return (
        df.join(dev, key_col)
        .where((F.col("mad") > 0)
               & (F.abs(F.col(val_col) - F.col("med"))
                  > F.lit(k) * F.col("mad")))
        .select(
            F.col(key_col), F.col(val_col),
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            F.round(F.abs(F.col(val_col) - F.col("med")) / F.col("mad"),
                    4).alias("score"),
        )
    )
