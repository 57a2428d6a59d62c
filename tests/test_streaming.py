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


def test_stream_static_enrich_matches_batch(spark):
    from drill_spark.streaming.events import (
        read_event_stream,
        run_to_completion,
        stream_static_enrich,
    )

    dim = spark.createDataFrame(
        [(u, f"tier{u % 3}") for u in range(30)], "user_id bigint, tier string"
    )
    stream = stream_static_enrich(read_event_stream(spark, SF_DIR), dim)
    got = run_to_completion(stream, "enriched")
    batch = load_fixture(spark, SF_DIR, "events").join(F.broadcast(dim), "user_id", "left")
    assert got.count() == batch.count()
    g = {r["event_id"]: r["tier"] for r in got.collect()}
    for r in batch.collect():
        assert g[r["event_id"]] == r["tier"]


def test_stream_stream_join_matches_batch(spark):
    """Backfill equivalence: the watermarked stream-stream interval join
    equals the same join run as a batch query."""
    from drill_spark.streaming.events import (
        read_event_stream,
        run_to_completion,
        stream_stream_join,
    )

    got = run_to_completion(
        stream_stream_join(read_event_stream(spark, SF_DIR)), "attributed"
    )
    ev = load_fixture(spark, SF_DIR, "events")
    a = ev.where("event_type = 'view'").selectExpr("user_id", "event_id as a_id", "ts as a_ts")
    b = ev.where("event_type = 'purchase'").selectExpr(
        "user_id as b_user", "event_id as b_id", "ts as b_ts"
    )
    batch = a.join(
        b, F.expr("user_id = b_user AND b_ts >= a_ts AND b_ts <= a_ts + interval 12 hours")
    )
    expect = {(r["a_id"], r["b_id"]) for r in batch.collect()}
    have = {(r["a_id"], r["b_id"]) for r in got.collect()}
    assert have == expect and len(expect) > 0


def test_stream_to_delta_exactly_once(spark, tmp_path):
    """Streamed events land in a Delta table equal to the batch read;
    a replayed micro-batch (same txn appId+version) is skipped and a
    new batch id advances the txn — the exactly-once contract of the
    foreachBatch + txn sink."""
    import os

    from drill_spark.readers.delta import load_snapshot, read_delta
    from drill_spark.streaming.events import (
        commit_batch_idempotent,
        read_event_stream,
        stream_to_delta,
    )

    tbl = str(tmp_path / "delta_sink")
    ckpt = str(tmp_path / "ckpt")
    events = read_event_stream(spark, SF_DIR)
    q = stream_to_delta(events.select("event_id", "event_type", "value"),
                        tbl, ckpt, app_id="t_sink")
    q.awaitTermination()

    batch = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    got = read_delta(spark, tbl)
    assert got.count() == batch.count()
    assert abs(got.agg({"value": "sum"}).first()[0]
               - batch.agg({"value": "sum"}).first()[0]) < 1e-6

    committed = load_snapshot(spark, tbl).txns["t_sink"]
    replay = spark.range(3).selectExpr(
        "id as event_id", "'dup' as event_type", "cast(id as double) as value"
    )
    # at-least-once replay: an already-committed batch id is a no-op
    before = read_delta(spark, tbl).count()
    assert commit_batch_idempotent(replay, tbl, "t_sink", committed) is False
    assert read_delta(spark, tbl).count() == before
    # a genuinely new batch id goes through and advances the txn
    assert commit_batch_idempotent(replay, tbl, "t_sink", committed + 1) is True
    assert read_delta(spark, tbl).count() == before + 3
    assert load_snapshot(spark, tbl).txns["t_sink"] == committed + 1


def test_delta_txn_survives_checkpoint(spark, tmp_path):
    """PROTOCOL.md requires checkpoints to carry transaction
    identifiers: after checkpointing and deleting all JSON commits, the
    txn version must still be visible (otherwise a restarted sink would
    double-write)."""
    import glob
    import os

    from drill_spark.readers.delta import (
        load_snapshot,
        write_checkpoint,
        write_delta,
    )

    tbl = str(tmp_path / "txn_ckpt")
    write_delta(spark.range(5).withColumnRenamed("id", "v"), tbl, txn=("app_a", 0))
    write_delta(spark.range(5, 9).withColumnRenamed("id", "v"), tbl,
                mode="append", txn=("app_a", 1))
    write_checkpoint(spark, tbl)
    for f in glob.glob(os.path.join(glob.escape(tbl), "_delta_log", "*.json")):
        os.remove(f)
    snap = load_snapshot(spark, tbl)
    assert snap.txns == {"app_a": 1}
    assert len(snap.files) >= 1


def test_stream_to_iceberg_exactly_once(spark, tmp_path):
    """Iceberg exactly-once sink: replayed micro-batches are skipped by
    the snapshot-summary stamp, matching the Delta sink's guarantee."""
    from pyspark.sql import functions as F

    from drill_spark.readers.iceberg import read_iceberg
    from drill_spark.streaming.events import commit_iceberg_batch_idempotent

    tbl = str(tmp_path / "ice_sink")
    b0 = spark.range(5).select(F.col("id").alias("v"))
    b1 = spark.range(5, 9).select(F.col("id").alias("v"))

    assert commit_iceberg_batch_idempotent(b0, tbl, "app", 0) is True
    assert commit_iceberg_batch_idempotent(b1, tbl, "app", 1) is True
    # replays: both must be no-ops
    assert commit_iceberg_batch_idempotent(b0, tbl, "app", 0) is False
    assert commit_iceberg_batch_idempotent(b1, tbl, "app", 1) is False
    got = sorted(r.v for r in read_iceberg(spark, tbl).collect())
    assert got == list(range(9))
    # a later batch still lands
    b2 = spark.range(9, 10).select(F.col("id").alias("v"))
    assert commit_iceberg_batch_idempotent(b2, tbl, "app", 2) is True
    assert read_iceberg(spark, tbl).count() == 10


def test_stream_to_iceberg_preexisting_table(spark, tmp_path):
    """Streaming into an Iceberg table that pre-exists from
    CTAS/write_iceberg must NOT drop batch 0: only a snapshot carrying
    this app's stamp counts as a replay."""
    from pyspark.sql import functions as F

    from drill_spark.readers.iceberg import read_iceberg, write_iceberg
    from drill_spark.streaming.events import commit_iceberg_batch_idempotent

    tbl = str(tmp_path / "ice_pre")
    write_iceberg(spark.range(3).select(F.col("id").alias("v")), tbl)
    b0 = spark.range(100, 105).select(F.col("id").alias("v"))
    assert commit_iceberg_batch_idempotent(b0, tbl, "app", 0) is True
    got = sorted(r.v for r in read_iceberg(spark, tbl).collect())
    assert got == [0, 1, 2, 100, 101, 102, 103, 104]
    # replay of batch 0 is now stamp-guarded
    assert commit_iceberg_batch_idempotent(b0, tbl, "app", 0) is False
    assert read_iceberg(spark, tbl).count() == 8
    # a second app's batch 0 still lands (independent stamp namespace)
    assert commit_iceberg_batch_idempotent(
        spark.range(200, 201).select(F.col("id").alias("v")), tbl, "app2", 0
    ) is True
    assert read_iceberg(spark, tbl).count() == 9


def test_stream_incremental_dedup_and_replay(spark, tmp_path):
    """Streaming ingest dedup: batch 1 drops digests batch 0 already
    introduced; replaying the whole stream with a FRESH checkpoint
    (at-least-once delivery) neither grows the store nor duplicates
    the output — both Delta txn guards hold."""
    import os

    from drill_spark.readers.delta import read_delta
    from drill_spark.streaming.events import stream_incremental_dedup

    src = str(tmp_path / "src")
    rows0 = [(1, "alpha beta"), (2, "alpha  BETA"), (3, "gamma")]
    rows1 = [(10, "gamma"), (11, "delta"), (12, "delta")]
    spark.createDataFrame(rows0, "doc_id bigint, text string").coalesce(
        1).write.parquet(src)
    spark.createDataFrame(rows1, "doc_id bigint, text string").coalesce(
        1).write.mode("append").parquet(src)
    parts = sorted(
        (os.path.join(src, f) for f in os.listdir(src)
         if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    for i, p in enumerate(parts):
        os.utime(p, (1_600_000_000 + i * 60,) * 2)

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = stream_incremental_dedup(
            stream, str(tmp_path / "store"), str(tmp_path / "out"), ckpt)
        q.awaitTermination()

    run(str(tmp_path / "ckpt1"))
    got = sorted(r.doc_id for r in
                 read_delta(spark, str(tmp_path / "out")).collect())
    # 1 beats 2 (same normalized digest), 3 in batch 0; 10 collides
    # with 3's digest, 11 beats 12 within batch 1
    assert got == [1, 3, 11]
    store_rows = read_delta(spark, str(tmp_path / "store")).count()
    run(str(tmp_path / "ckpt2"))  # full replay, fresh checkpoint
    again = sorted(r.doc_id for r in
                   read_delta(spark, str(tmp_path / "out")).collect())
    assert again == [1, 3, 11]
    assert read_delta(spark, str(tmp_path / "store")).count() == store_rows


def test_stream_incremental_near_dedup_and_replay(spark, tmp_path):
    """Streaming NEAR-dup ingest: batch 1's light edit of a batch-0
    document drops via the persistent MinHash store, its novel doc
    survives; a full replay with a fresh checkpoint (at-least-once
    delivery) neither grows the store nor duplicates the output."""
    import os

    from drill_spark.readers.delta import read_delta
    from drill_spark.streaming.events import stream_incremental_near_dedup

    base = ("the quick brown fox jumps over the lazy dog while seventy "
            "bright students read long books about distributed systems "
            "and query engines every single evening")
    novel = ("a fresh unrelated essay on medieval architecture featuring "
             "cathedrals buttresses stained glass and the masons who cut "
             "stone for generations in small guild towns")
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, base)], "doc_id bigint, text string").coalesce(1) \
        .write.parquet(src)
    spark.createDataFrame(
        [(10, base.replace("lazy", "sleepy")), (11, novel)],
        "doc_id bigint, text string").coalesce(1) \
        .write.mode("append").parquet(src)
    parts = sorted(
        (os.path.join(src, f) for f in os.listdir(src)
         if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    for i, p in enumerate(parts):
        os.utime(p, (1_600_000_000 + i * 60,) * 2)

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = stream_incremental_near_dedup(
            stream, str(tmp_path / "store"), str(tmp_path / "out"), ckpt,
            sim_threshold=0.6)
        q.awaitTermination()

    run(str(tmp_path / "ckpt1"))
    got = sorted(r.doc_id for r in
                 read_delta(spark, str(tmp_path / "out")).collect())
    assert got == [1, 11]  # 10 is a near-copy of 1 across batches
    store_rows = read_delta(spark, str(tmp_path / "store")).count()
    run(str(tmp_path / "ckpt2"))  # full replay, fresh checkpoint
    again = sorted(r.doc_id for r in
                   read_delta(spark, str(tmp_path / "out")).collect())
    assert again == [1, 11]
    assert read_delta(spark, str(tmp_path / "store")).count() == store_rows


def test_stream_dedup_after_batch_backfill(spark, tmp_path):
    """The review scenario: a store built by BATCH backfill (txn
    versions 0..N under the batch appId) then a FRESH streaming query
    against the same store — the stream's epoch 0 must NOT read as a
    replay of backfill batch 0: new documents survive and their
    digests append; backfilled duplicates still drop."""
    import os

    from drill_spark.ops.dedup import incremental_dedup
    from drill_spark.readers.delta import read_delta
    from drill_spark.streaming.events import stream_incremental_dedup

    store = str(tmp_path / "store")
    backfill = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id bigint, text string")
    assert sorted(r.doc_id for r in
                  incremental_dedup(backfill, store).collect()) == [1, 2]

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(10, "beta"), (11, "gamma")],  # 10 dups the backfill, 11 is new
        "doc_id bigint, text string").coalesce(1).write.parquet(src)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            os.utime(os.path.join(src, f), (1_600_000_000,) * 2)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_incremental_dedup(
        stream, store, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination()
    got = sorted(r.doc_id for r in
                 read_delta(spark, str(tmp_path / "out")).collect())
    assert got == [11]
    # 11's digest joined the store (alpha, beta, gamma)
    assert read_delta(spark, store).count() == 3


def test_stream_crawl_ingest_two_waves_and_replay(spark, tmp_path):
    """Streaming crawl ingest (streaming/crawl.py): wave 1 of .warc.gz
    archives is extracted into the Delta documents table; wave 2
    appends only its own documents; re-running with a fresh checkpoint
    (at-least-once replay of every epoch) does not duplicate rows —
    the txn(app_id, epoch) guard holds."""
    from drill_spark.readers.delta import read_delta
    from drill_spark.readers.warc import write_warc
    from drill_spark.streaming.crawl import stream_crawl_ingest

    src = str(tmp_path / "crawl")

    def wave(lo, hi):
        pages = spark.createDataFrame(
            [(f"https://ex.org/{i}",
              f"<html><title>p{i}</title><body><p>text {i}</p></body></html>")
             for i in range(lo, hi)],
            "target_uri string, text string",
        )
        write_warc(pages.coalesce(1), src)

    out = str(tmp_path / "docs")

    def run(ckpt):
        q = stream_crawl_ingest(spark, src, out, ckpt)
        q.awaitTermination()

    wave(0, 6)
    run(str(tmp_path / "ck1"))
    assert read_delta(spark, out).count() == 6
    wave(6, 10)
    run(str(tmp_path / "ck1"))  # same checkpoint: only the new archive
    got = {r["url"]: (r["title"], r["text"])
           for r in read_delta(spark, out).collect()}
    assert got == {f"https://ex.org/{i}": (f"p{i}", f"text {i}")
                   for i in range(10)}
    run(str(tmp_path / "ck2"))  # fresh checkpoint: full replay, no dups
    assert read_delta(spark, out).count() == 10
    cols = set(read_delta(spark, out).columns)
    assert {"url", "fetched_at", "title", "text",
            "src_file", "record_offset"} <= cols


def test_stream_heavy_hitters_matches_batch(spark):
    """The verified streaming heavy hitters equal the batch operator's
    output exactly — the MG candidate superset guarantee holds across
    micro-batch boundaries, so arrival order/batching can't change the
    verified answer."""
    from drill_spark.ops.sketch import heavy_hitters

    stream = ev.read_event_stream(spark, SF_DIR)
    tbl = ev.run_to_completion(
        ev.stream_heavy_hitters(stream, "event_type", k=8, n_buckets=4),
        "t_stream_hh", "update")
    # bounded state: at most k candidates per bucket in every summary
    for r in tbl.collect():
        assert len(r["keys"]) <= 8 and len(r["keys"]) == len(r["counts"])
    batch = _batch_events(spark).select(
        F.col("event_type").cast("string").alias("event_type"))
    got = ev.verified_stream_heavy_hitters(
        spark, tbl, batch, "event_type", k=8)
    want = heavy_hitters(batch, "event_type", k=8)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_stream_kmv_distinct_equals_batch(spark):
    """The streamed KMV sketch is bit-identical to the batch sketch —
    merge associativity/commutativity makes the result independent of
    micro-batch boundaries and arrival order."""
    from drill_spark.ops.sketch import kmv_distinct

    stream = ev.read_event_stream(spark, SF_DIR)
    tbl = ev.run_to_completion(
        ev.stream_kmv_distinct(stream, "event_type", "user_id", k=8),
        "t_stream_kmv", "update")
    got = ev.latest_kmv_sketches(tbl, "event_type", k=8)
    want = kmv_distinct(
        _batch_events(spark).select(
            F.col("event_type").cast("string").alias("event_type"),
            "user_id"),
        "event_type", "user_id", k=8)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_stream_incremental_setsim_and_replay(spark, tmp_path):
    """Streaming EXACT set-similarity ingest: batch 1's light edit of
    a batch-0 document drops via the persistent postings store (exact
    Jaccard, not a MinHash estimate), its novel doc survives; a full
    replay with a fresh checkpoint neither grows the store nor
    duplicates the output — and the store holds postings, never text."""
    import os

    from drill_spark.readers.delta import read_delta
    from drill_spark.streaming.events import stream_incremental_setsim

    base = ("the quick brown fox jumps over the lazy dog while seventy "
            "bright students read long books about distributed systems "
            "and query engines every single evening")
    novel = ("a fresh unrelated essay on medieval architecture featuring "
             "cathedrals buttresses stained glass and the masons who cut "
             "stone for generations in small guild towns")
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, base)], "doc_id bigint, text string").coalesce(1) \
        .write.parquet(src)
    spark.createDataFrame(
        [(10, base.replace("lazy", "sleepy")), (11, novel)],
        "doc_id bigint, text string").coalesce(1) \
        .write.mode("append").parquet(src)
    parts = sorted(
        (os.path.join(src, f) for f in os.listdir(src)
         if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    for i, p in enumerate(parts):
        os.utime(p, (1_600_000_000 + i * 60,) * 2)

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = stream_incremental_setsim(
            stream, str(tmp_path / "store"), str(tmp_path / "out"), ckpt,
            threshold=0.8)
        q.awaitTermination()

    run(str(tmp_path / "ckpt1"))
    got = sorted(r.doc_id for r in
                 read_delta(spark, str(tmp_path / "out")).collect())
    # doc 10 differs from doc 1 by one word: J = 24/26 >= 0.8 -> drops
    assert got == [1, 11]
    store = read_delta(spark, str(tmp_path / "store"))
    store_rows = store.count()
    assert "text" not in store.columns
    run(str(tmp_path / "ckpt2"))  # full replay, fresh checkpoint
    again = sorted(r.doc_id for r in
                   read_delta(spark, str(tmp_path / "out")).collect())
    assert again == [1, 11]
    assert read_delta(spark, str(tmp_path / "store")).count() == store_rows


def test_stream_incremental_substr_and_replay(spark, tmp_path):
    """Streaming ExactSubstr ingest: batch 1's document containing a
    verbatim batch-0 span is cleaned via the persistent span-digest
    store (the span's tokens removed, the novel framing kept); a full
    replay with a fresh checkpoint neither grows the store nor
    duplicates the output — and the store holds digests, never text."""
    import os

    from drill_spark.readers.delta import read_delta
    from drill_spark.streaming.events import stream_incremental_substr

    span = "the quick brown fox jumps over the lazy dog"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, span)], "doc_id bigint, text string").coalesce(1) \
        .write.parquet(src)
    spark.createDataFrame(
        [(10, f"intro words {span} outro words"),
         (11, "a fresh unrelated essay on medieval architecture")],
        "doc_id bigint, text string").coalesce(1) \
        .write.mode("append").parquet(src)
    parts = sorted(
        (os.path.join(src, f) for f in os.listdir(src)
         if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    for i, p in enumerate(parts):
        os.utime(p, (1_600_000_000 + i * 60,) * 2)

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = stream_incremental_substr(
            stream, str(tmp_path / "store"), str(tmp_path / "out"), ckpt,
            min_tokens=4)
        q.awaitTermination()

    run(str(tmp_path / "ckpt1"))
    got = {r.doc_id: (r.n_removed, r.clean_text) for r in
           read_delta(spark, str(tmp_path / "out")).collect()}
    assert got[1] == (0, span)                       # canonical batch
    assert got[10] == (9, "intro words outro words")  # span scrubbed
    assert got[11][0] == 0                            # novel untouched
    store = read_delta(spark, str(tmp_path / "store"))
    store_rows = store.count()
    assert set(store.columns) == {"h", "batch_id"}
    run(str(tmp_path / "ckpt2"))  # full replay, fresh checkpoint
    again = {r.doc_id: (r.n_removed, r.clean_text) for r in
             read_delta(spark, str(tmp_path / "out")).collect()}
    assert again == got
    assert read_delta(spark, str(tmp_path / "store")).count() == store_rows


def test_stream_quality_auc_running_and_replay(spark, tmp_path):
    """Streaming AUC monitor: the per-batch running rows equal the
    batch operator on each prefix (bin-count folding is exactly
    associative), and a full replay with a fresh checkpoint neither
    grows the bin store nor duplicates output rows."""
    import os

    from drill_spark.ops.mlmetrics import binary_auc
    from drill_spark.readers.delta import read_delta
    from drill_spark.streaming.events import stream_quality_auc

    rows0 = [(i, i % 2, 0.1 + 0.35 * (i % 2) + (i % 10) / 50.0)
             for i in range(0, 60, 2)]
    rows1 = [(i, i % 2, 0.1 + 0.35 * (i % 2) + (i % 10) / 50.0)
             for i in range(1, 60, 2)]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows0, "doc_id bigint, y int, score double").coalesce(1) \
        .write.parquet(src)
    spark.createDataFrame(
        rows1, "doc_id bigint, y int, score double").coalesce(1) \
        .write.mode("append").parquet(src)
    parts = sorted(
        (os.path.join(src, f) for f in os.listdir(src)
         if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    for i, p in enumerate(parts):
        os.utime(p, (1_600_000_000 + i * 60,) * 2)

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id bigint, y int, score double")
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = stream_quality_auc(
            stream, str(tmp_path / "store"), str(tmp_path / "out"), ckpt)
        q.awaitTermination()

    run(str(tmp_path / "ckpt1"))
    out = {r.batch_id: (r.n_pos, r.n_neg, r.auc) for r in
           read_delta(spark, str(tmp_path / "out")).collect()}
    assert set(out) == {0, 1}

    df0 = spark.createDataFrame(rows0, "doc_id bigint, y int, score double")
    dfall = spark.createDataFrame(rows0 + rows1,
                                  "doc_id bigint, y int, score double")
    exp0 = binary_auc(df0, "y", "score").collect()[0]
    expall = binary_auc(dfall, "y", "score").collect()[0]
    assert out[0] == (exp0.n_pos, exp0.n_neg, exp0.auc)
    assert out[1] == (expall.n_pos, expall.n_neg, expall.auc)
    assert 0.5 < out[1][2] <= 1.0

    store_rows = read_delta(spark, str(tmp_path / "store")).count()
    run(str(tmp_path / "ckpt2"))  # full replay, fresh checkpoint
    again = {r.batch_id: (r.n_pos, r.n_neg, r.auc) for r in
             read_delta(spark, str(tmp_path / "out")).collect()}
    assert again == out
    assert read_delta(spark, str(tmp_path / "store")).count() == store_rows


def test_stream_quality_auc_single_class_first_batch(spark, tmp_path):
    """A single-class first micro-batch (all positives) reports
    auc = NULL — not NaN — and the monitor recovers a real AUC once
    the second batch brings negatives."""
    import os

    from drill_spark.readers.delta import read_delta
    from drill_spark.streaming.events import stream_quality_auc

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, 1, 0.6 + i / 100.0) for i in range(10)],
        "doc_id bigint, y int, score double").coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(100 + i, 0, 0.1 + i / 100.0) for i in range(10)],
        "doc_id bigint, y int, score double").coalesce(1) \
        .write.mode("append").parquet(src)
    parts = sorted(
        (os.path.join(src, f) for f in os.listdir(src)
         if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    for i, p in enumerate(parts):
        os.utime(p, (1_600_000_000 + i * 60,) * 2)

    stream = (
        spark.readStream.schema("doc_id bigint, y int, score double")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_quality_auc(
        stream, str(tmp_path / "store"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"))
    q.awaitTermination()
    out = {r.batch_id: (r.n_pos, r.n_neg, r.auc) for r in
           read_delta(spark, str(tmp_path / "out")).collect()}
    assert out[0] == (10, 0, None)         # undefined, surfaced as NULL
    assert out[1] == (10, 10, 1.0)         # perfectly separated prefix


def test_stream_lang_mix_drift_and_replay(spark, tmp_path):
    """Streaming language-mix monitor: batch 0 is English-heavy,
    batch 1 adds German so the running mix moves toward the baseline
    and the integer-ppm L1 drift DROPS; an unobserved baseline
    language contributes its full target weight (silence is drift).
    Full replay with a fresh checkpoint neither grows the store nor
    duplicates the output."""
    import os

    from drill_spark.readers.delta import read_delta
    from drill_spark.streaming.events import stream_lang_mix

    en = ("the children watched the river rise over the old stone "
          "bridge while their mother called them back inside")
    de = ("die kinder sahen zu wie der fluss ueber die alte steinerne "
          "bruecke stieg waehrend ihre mutter sie zurueck ins haus rief")
    src = str(tmp_path / "src")
    rows0 = [(i, en + f" tail {i}") for i in range(4)]
    rows1 = [(10 + i, de + f" anhang {i}") for i in range(4)]
    spark.createDataFrame(rows0, "doc_id bigint, text string").coalesce(
        1).write.parquet(src)
    spark.createDataFrame(rows1, "doc_id bigint, text string").coalesce(
        1).write.mode("append").parquet(src)
    parts = sorted(
        (os.path.join(src, f) for f in os.listdir(src)
         if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    for i, p in enumerate(parts):
        os.utime(p, (1_600_000_000 + i * 60,) * 2)

    baseline = {"en": 0.5, "de": 0.5}

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = stream_lang_mix(
            stream, str(tmp_path / "store"), str(tmp_path / "out"),
            ckpt, baseline=baseline)
        q.awaitTermination()

    run(str(tmp_path / "ckpt1"))
    out = read_delta(spark, str(tmp_path / "out")).collect()
    by_batch = {}
    for r in out:
        by_batch.setdefault(r.batch_id, {})[r.pred_lang] = r
    # batch 0: all-en mix -> share en = 1.0, de row present with 0
    b0 = by_batch[0]
    assert b0["en"].share == 1.0 and b0["en"].n_docs == 4
    assert b0["de"].share == 0.0 and b0["de"].n_docs == 0
    # drift: |1.0-0.5| + |0-0.5| = 1.0
    assert b0["en"].l1_drift == 1.0
    # batch 1: 4 en + 4 de -> both 0.5, drift 0
    b1 = by_batch[1]
    assert b1["en"].share == 0.5 and b1["de"].share == 0.5
    assert b1["en"].l1_drift == 0.0
    assert b1["en"].l1_drift < b0["en"].l1_drift
    store_rows = read_delta(spark, str(tmp_path / "store")).count()
    run(str(tmp_path / "ckpt2"))  # full replay, fresh checkpoint
    assert len(read_delta(spark, str(tmp_path / "out")).collect()) == len(out)
    assert read_delta(spark, str(tmp_path / "store")).count() == store_rows
