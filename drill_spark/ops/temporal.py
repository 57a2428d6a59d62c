"""Temporal join operators: as-of join and point-in-interval (range)
join (extension surface — SURVEY §2.3 notes the reference has neither;
its only non-equi path is a broadcast nested-loop join).

Scale design — both operators avoid the naive O(n·m) inequality join:

- **as_of_join**: union both sides tagged, one sort per user key
  (window: last right-row carried forward), then filter to left rows.
  Cost = one shuffle on the partition key + one in-partition sort —
  the same profile as a windowed aggregation, independent of how many
  right rows precede each left row. (A join-then-rank formulation
  explodes on hot keys; this one cannot.)

- **point_in_interval_join**: bucketize. Intervals explode to the
  fixed-width buckets they overlap, points land in exactly one bucket,
  the join is EQUI on (key, bucket), exact containment is a post-
  filter. Shuffle is hash(key, bucket) — bounded fan-out = interval
  span / width, tunable; never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_vals: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row (right_ts <=
    left_ts) within the same `on` group. Right value columns arrive as
    <name><suffix>; rows with no prior right row get nulls.
    """
    right_vals = right_vals or [c for c in right.columns if c not in on and c != right_ts]
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    rt = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_vals],
    ).withColumn("_side", F.lit(0))
    merged = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp (ties are
    # "as of now" inclusive), matching ASOF JOIN <= semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in right_vals
        ],
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_c_{c}").alias(f"{c}{suffix}") for c in right_vals
    ]
    return carried.where(F.col("_side") == 1).select(*out_cols)


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
) -> DataFrame:
    """Equi-bucketed point-in-[start, end) join.

    Output = points' columns + intervals' non-key columns, one row per
    containing interval.
    """
    pb = points.withColumn("_bk", F.floor(F.col(point_col) / bucket_width).cast("long"))
    iv = intervals.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width).cast("long"),
                F.floor((F.col(end_col) - 1e-9) / bucket_width).cast("long"),
            )
        ),
    )
    joined = pb.join(iv, on + ["_bk"]).where(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("_bk")


def gap_fill_locf(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    val_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Time-bucket gap filling with last-observation-carried-forward —
    the TimescaleDB ``time_bucket_gapfill`` + ``locf(avg(...))`` idiom
    (the reference's nearestDate/time_bucket family has no gapfill).

    Buckets each row to ``unit``, aggregates the value per (key,
    bucket), generates each key's FULL bucket grid from its own min to
    max bucket (``sequence`` + explode — no driver loop, no cross
    join against a global calendar), left-joins the observations and
    carries the last non-null aggregate forward per key.

    Scale shape: one groupBy shuffle on (key, bucket); the grid
    explode is bounded by each key's own span / unit; LOCF is one
    window sorted within the key partition. Returns (key, bucket,
    value, n_events) where n_events = 0 marks filled gaps.
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    obs = (
        df.groupBy(F.col(key_col), bucket)
        .agg(F.round(F.avg(val_col), 4).alias("v"),
             F.count("*").alias("n_obs"))
    )
    grid = (
        obs.groupBy(key_col)
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(
            key_col,
            F.explode(
                F.expr(f"sequence(b0, b1, interval 1 {unit})")
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy(key_col).orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            F.last("v", ignorenulls=True).over(w).alias("value"),
            F.coalesce("n_obs", F.lit(0)).alias("n_events"),
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap_seconds: float = 1800.0,
    order_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization — the classic clickstream/telemetry
    rollup (and the batch twin of Spark's streaming session windows): a
    new session opens when the gap from the key's previous event
    exceeds ``gap_seconds``.

    Returns one row per session: (key, session_idx, session_start,
    session_end, n_events, duration_s). ``session_idx`` is the 1-based
    session ordinal within the key — deterministic given the
    (ts, order_col) sort.

    Scale shape: ONE shuffle on the key; the session-start flag, its
    running sum, and the final rollup all run inside that partition
    (two windows over the same sort — Catalyst reuses the exchange and
    sort), so state per task is one key's event stream, and session
    assignment never materializes a cross join or a driver loop.
    Timestamps compare as epoch doubles (exact for microsecond
    precision), matching the DuckDB oracle bit-for-bit.
    """
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    # NTZ timestamps don't cast straight to double; epoch-seconds diffs
    # are tz-invariant either way
    sec = F.col(ts_col).cast("timestamp").cast("double")
    new_sess = F.when(
        F.lag(sec).over(w).isNull()
        | ((sec - F.lag(sec).over(w)) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = (
        df.withColumn("__new", new_sess)
        .withColumn(
            "session_idx",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        run.groupBy(key_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.max(sec) - F.min(sec), 6
            ).alias("duration_s"),
        )
    )


def funnel(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: float | None = None,
) -> DataFrame:
    """Ordered funnel analysis — the product-analytics staple: how many
    keys (users) reached step 1, then step 2 AFTER their step-1 time,
    ... optionally all within ``within_seconds`` of step 1.

    Semantics: t1 = the key's earliest step-1 event; t_k = earliest
    step-k event strictly after t_{k-1} (and within the window when
    given). A key counts toward step k only if it completed every
    earlier step in order.

    Returns (step_idx, step, n_keys) — one row per step, funnel-
    monotone.

    Scale shape: one filtered aggregation per step, ALL keyed by the
    same column, with broadcast-size carry tables only when the key
    cardinality is bounded by the prior step's survivors; each round is
    agg + equi-join on the key, no window over the whole stream, no
    collect_list of a key's events (hot keys never materialize their
    history). Steps are few and fixed; shuffles stay proportional to
    the matching event subsets, shrinking monotonically down the
    funnel.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    sec = F.col(ts_col).cast("timestamp").cast("double")
    ev = df.select(
        F.col(key_col), F.col(type_col).alias("__t"), sec.alias("__s"))
    # step 1: earliest matching event per key
    cur = (
        ev.where(F.col("__t") == steps[0])
        .groupBy(key_col)
        .agg(F.min("__s").alias("__ts1"))
        .withColumn("__prev", F.col("__ts1"))
    )
    counts = [(1, steps[0], cur)]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.where(F.col("__t") == step)
            .join(cur.select(key_col, "__ts1", "__prev"), key_col)
            .where(
                (F.col("__s") > F.col("__prev"))
                & (
                    F.lit(within_seconds is None)
                    | (F.col("__s") - F.col("__ts1")
                       <= F.lit(within_seconds or 0.0))
                )
            )
            .groupBy(key_col)
            .agg(F.min("__s").alias("__next"),
                 F.first("__ts1").alias("__ts1"))
            .select(key_col, "__ts1", F.col("__next").alias("__prev"))
        )
        counts.append((i, step, nxt))
        cur = nxt
    out = None
    for i, step, frame in counts:
        row = frame.agg(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def retention(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    unit: str = "week",
) -> DataFrame:
    """Cohort retention — the second product-analytics staple: keys
    cohort by the period of their FIRST event; each later active
    period counts them at offset = periods since the cohort period.

    Returns (cohort, offset, n_keys): n_keys at offset 0 is the cohort
    size; the offset-k row counts cohort members active k periods on.

    Scale shape: one distinct-(key, period) aggregation, one min-period
    aggregation, one equi-join on the key, one final rollup — every
    shuffle keyed by the key or the bounded (cohort, offset) pair; the
    cohort table is keys-sized, never events-sized.
    """
    days = {"day": 1, "week": 7}
    if unit not in days:
        raise ValueError(f"unsupported retention unit: {unit}")
    period = F.date_trunc(unit, F.col(ts_col))
    active = df.select(
        F.col(key_col), period.alias("__p")).distinct()
    cohort = active.groupBy(key_col).agg(F.min("__p").alias("cohort"))
    return (
        active.join(cohort, key_col)
        .select(
            key_col, "cohort",
            (F.datediff(F.col("__p"), F.col("cohort"))
             / days[unit]).cast("int").alias("offset"),
        )
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


def event_paths(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    event_col: str,
    gap_seconds: float = 1800.0,
    max_steps: int = 8,
    order_col: str | None = None,
    top: int = 100,
) -> DataFrame:
    """Top user-journey paths: sessionize (same gap rule as
    :func:`sessionize`), render each session's first ``max_steps``
    events as an ordered ``a > b > c`` path string, and count sessions
    per path — the classic product-analytics "paths" report (what do
    sessions actually do, in order).

    Scale shape: ONE shuffle on the key (session flag + running sum +
    the per-session ordered aggregate all share the exchange/sort),
    then a map-combined count keyed by path and a TakeOrdered top-N —
    path cardinality is bounded by |event types|^max_steps in theory
    and by real behavior in practice, never by event volume.
    Deterministic given the (ts, order_col) sort, so the whole report
    hash-checks against a SQL oracle.

    Returns (path, n_sessions), ``top`` rows, ordered by count desc
    then path.
    """
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    sec = F.col(ts_col).cast("timestamp").cast("double")
    new_sess = F.when(
        F.lag(sec).over(w).isNull()
        | ((sec - F.lag(sec).over(w)) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = (
        df.withColumn("__new", new_sess)
        .withColumn(
            "__sess",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    sort_key = [sec.alias("__t")] \
        + ([F.col(order_col).alias("__o")] if order_col else []) \
        + [F.col(event_col).alias("__e")]
    paths = (
        run.groupBy(key_col, "__sess")
        .agg(F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(*sort_key))),
                    lambda s: s["__e"],
                ),
                1, int(max_steps),
            ), " > ").alias("path"))
    )
    return (
        paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(int(top))
    )


def event_transitions(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    event_col: str,
    gap_seconds: float = 1800.0,
    order_col: str | None = None,
) -> DataFrame:
    """First-order event transition matrix — the Markov companion of
    :func:`event_paths`/:func:`funnel`: within each gap session, count
    consecutive (from_event, to_event) steps and each from-event's
    outgoing share. Session boundaries break chains (the last event of
    one session never transitions into the next), which is the whole
    point of computing this post-sessionization.

    Scale shape: the same ONE key-shuffle as sessionize (lag flag,
    running session sum, and the next-event lead all share the
    exchange/sort), then a map-combined count keyed by the event pair
    — output is |event types|², independent of event volume.

    Returns (from_event, to_event, n, share) with share = n over the
    from-event's outgoing total, rounded 4dp for engine portability.
    """
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    sec = F.col(ts_col).cast("timestamp").cast("double")
    new_sess = F.when(
        F.lag(sec).over(w).isNull()
        | ((sec - F.lag(sec).over(w)) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = (
        df.withColumn("__new", new_sess)
        .withColumn(
            "__sess",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("__next", F.lead(F.col(event_col)).over(w))
        .withColumn("__next_sess", F.lead(F.col("__sess")).over(w))
    )
    pairs = (
        run.where(F.col("__next").isNotNull()
                  & (F.col("__next_sess") == F.col("__sess")))
        .groupBy(F.col(event_col).alias("from_event"),
                 F.col("__next").alias("to_event"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_event")
    return pairs.select(
        "from_event", "to_event", "n",
        F.round(F.col("n") / F.sum("n").over(tot), 4).alias("share"),
    )
