"""Structured Streaming over events: streaming results must equal the
batch twin on the same finite data (backfill-equivalence property)."""

from __future__ import annotations

from pyspark.sql import functions as F

from drill_spark.session import load_fixture
from drill_spark.streaming import events as ev

from .conftest import SF_DIR


def _batch_events(spark):
    return load_fixture(spark, SF_DIR, "events").withColumn("ts", F.col("ts").cast("timestamp"))


def test_tumbling_matches_batch(spark):
    stream = ev.read_event_stream(spark, SF_DIR)
    got = ev.run_to_completion(ev.tumbling_counts(stream), "t_tumbling", "complete")
    expect = (
        _batch_events(spark)
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_v"))
        .select(F.col("window.start").alias("ws"), "event_type", "n", "sum_v")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))
    assert got.count() > 0


def test_session_matches_batch(spark):
    stream = ev.read_event_stream(spark, SF_DIR)
    got = ev.run_to_completion(ev.session_counts(stream), "t_session", "complete")
    expect = (
        _batch_events(spark)
        .groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("session_window.start").alias("session_start"), "user_id", "n_events")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_stream_dedup(spark):
    stream = ev.read_event_stream(spark, SF_DIR)
    got = ev.run_to_completion(ev.stream_dedup(stream), "t_dedup")
    n_events = _batch_events(spark).count()
    n_distinct = _batch_events(spark).select("event_id").distinct().count()
    assert got.count() == n_distinct <= n_events


def test_stateful_user_totals(spark):
    """applyInPandasWithState operator: final per-user state must equal
    the batch groupBy on the same finite data."""
    stream = ev.read_event_stream(spark, SF_DIR)
    got = ev.run_to_completion(ev.user_running_totals(stream), "t_state", "update")
    # update mode emits one row per user per micro-batch; the final
    # emission per user (max n) is the completed state
    final = {}
    for r in got.collect():
        if r["user_id"] not in final or r["n"] > final[r["user_id"]][0]:
            final[r["user_id"]] = (r["n"], r["total"])
    expect = {
        r["user_id"]: (r["n"], r["total"])
        for r in _batch_events(spark)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert final == expect


def test_sliding(spark):
    stream = ev.read_event_stream(spark, SF_DIR)
    got = ev.run_to_completion(ev.sliding_rates(stream), "t_sliding", "complete")
    assert got.count() > 0
    # every event lands in width/slide = 2 windows
    total = got.agg(F.sum("n")).head()[0]
    assert total == 2 * _batch_events(spark).count()
