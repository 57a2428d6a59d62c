"""Delta Lake and Iceberg table-format readers (reference:
contrib/format-deltalake/, contrib/format-iceberg/). The Delta log
fixtures are hand-written to the public PROTOCOL.md layout (not via
our own writer) wherever the test checks reader semantics, so the
reader is validated against the spec, not against itself."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from drill_spark.readers.delta import load_snapshot, read_delta, write_delta
from drill_spark.readers.iceberg import read_iceberg, write_iceberg

from .conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------------------ delta


def test_delta_roundtrip_partitioned(spark, tmp_path):
    src = (
        spark.read.parquet(os.path.join(SF_DIR, "supplier.parquet"))
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    )
    tbl = str(tmp_path / "sup_delta")
    write_delta(src, tbl, partition_by=["s_nationkey"])
    got = read_delta(spark, tbl)
    assert got.schema == src.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal").schema
    assert _rows(got.select(*src.columns)) == _rows(src)


def test_delta_append_and_time_travel(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df1 = spark.range(5).select(F.col("id").cast("long"))
    df2 = spark.range(5, 8).select(F.col("id").cast("long"))
    write_delta(df1, tbl)
    write_delta(df2, tbl, mode="append")
    assert read_delta(spark, tbl).count() == 8
    v0 = read_delta(spark, tbl, {"versionAsOf": 0})
    assert _rows(v0) == [(i,) for i in range(5)]


def test_delta_remove_action_handwritten(spark, tmp_path):
    """Spec-conformant hand-written log: 2 adds, then a remove of one —
    the reconciliation rule must drop the removed file."""
    tbl = tmp_path / "hand"
    log = tbl / "_delta_log"
    log.mkdir(parents=True)
    spark.range(3).write.parquet(str(tbl / "f1"))
    spark.range(3, 10).write.parquet(str(tbl / "f2"))
    f1 = ["f1/" + f for f in os.listdir(tbl / "f1") if f.endswith(".parquet")]
    f2 = ["f2/" + f for f in os.listdir(tbl / "f2") if f.endswith(".parquet")]
    schema = spark.range(1).schema.json()
    with open(log / f"{0:020d}.json", "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps({"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                                         "schemaString": schema, "partitionColumns": []}}) + "\n")
        for p in f1 + f2:
            f.write(json.dumps({"add": {"path": p, "partitionValues": {}, "size": 1,
                                        "modificationTime": 0, "dataChange": True}}) + "\n")
    with open(log / f"{1:020d}.json", "w") as f:
        for p in f1:
            f.write(json.dumps({"remove": {"path": p, "dataChange": True}}) + "\n")
    got = read_delta(spark, str(tbl))
    assert _rows(got) == [(i,) for i in range(3, 10)]
    # and versionAsOf=0 still sees all ten rows
    assert read_delta(spark, str(tbl), {"versionAsOf": 0}).count() == 10


def test_delta_checkpoint_replay(spark, tmp_path):
    """_last_checkpoint + later JSON commits combine: checkpoint carries
    the compacted adds, the tail commit removes one file."""
    tbl = tmp_path / "ckpt"
    log = tbl / "_delta_log"
    log.mkdir(parents=True)
    spark.range(4).write.parquet(str(tbl / "a"))
    spark.range(4, 6).write.parquet(str(tbl / "b"))
    fa = ["a/" + f for f in os.listdir(tbl / "a") if f.endswith(".parquet")]
    fb = ["b/" + f for f in os.listdir(tbl / "b") if f.endswith(".parquet")]
    schema = spark.range(1).schema.json()
    # checkpoint parquet at version 1 with the standard action-struct layout
    add_rows = [
        {"add": {"path": p, "partitionValues": {}, "size": 1, "modificationTime": 0,
                 "dataChange": True},
         "metaData": None, "protocol": None, "remove": None}
        for p in fa + fb
    ]
    meta_row = {
        "add": None, "remove": None,
        "metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                     "schemaString": schema, "partitionColumns": []},
        "protocol": None,
    }
    proto_row = {"add": None, "remove": None, "metaData": None,
                 "protocol": {"minReaderVersion": 1}}
    ck_schema = (
        "add struct<path:string,partitionValues:map<string,string>,size:long,"
        "modificationTime:long,dataChange:boolean>,"
        "remove struct<path:string,dataChange:boolean>,"
        "metaData struct<id:string,format:struct<provider:string,options:map<string,string>>,"
        "schemaString:string,partitionColumns:array<string>>,"
        "protocol struct<minReaderVersion:int>"
    )
    spark.createDataFrame([meta_row, proto_row] + add_rows, ck_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "ckraw"))
    part = next(
        f for f in os.listdir(tmp_path / "ckraw") if f.endswith(".parquet")
    )
    os.rename(tmp_path / "ckraw" / part, log / f"{1:020d}.checkpoint.parquet")
    with open(log / "_last_checkpoint", "w") as f:
        json.dump({"version": 1, "size": len(add_rows) + 2}, f)
    with open(log / f"{2:020d}.json", "w") as f:
        for p in fb:
            f.write(json.dumps({"remove": {"path": p, "dataChange": True}}) + "\n")
    got = read_delta(spark, str(tbl))
    assert _rows(got) == [(i,) for i in range(4)]


def test_delta_unsupported_features_raise(spark, tmp_path):
    tbl = tmp_path / "dv"
    log = tbl / "_delta_log"
    log.mkdir(parents=True)
    schema = spark.range(1).schema.json()
    with open(log / f"{0:020d}.json", "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                                         "readerFeatures": ["typeWidening"]}}) + "\n")
        f.write(json.dumps({"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                                         "schemaString": schema, "partitionColumns": []}}) + "\n")
    with pytest.raises(NotImplementedError, match="typeWidening"):
        read_delta(spark, str(tbl))


def test_delta_via_sqlfront_autodetect(session, tmp_path):
    """A directory with _delta_log is detected as a delta table by the
    format matcher (DeltaFormatMatcher.java parity)."""
    src = session.spark.range(7).select(F.col("id").alias("v"))
    tbl = str(tmp_path / "auto")
    write_delta(src, tbl)
    got = session.sql(f"select count(*) as n from dfs.`{tbl}`")
    assert got.collect()[0][0] == 7


# ---------------------------------------------------------------- iceberg


def test_iceberg_roundtrip(spark, tmp_path):
    src = (
        spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
        .select("r_regionkey", "r_name")
    )
    tbl = str(tmp_path / "region_ice")
    write_iceberg(src, tbl)
    got = read_iceberg(spark, tbl)
    assert [f.name for f in got.schema.fields] == ["r_regionkey", "r_name"]
    assert _rows(got) == _rows(src)


def test_iceberg_autodetect_and_relocation(session, tmp_path):
    """Reading through the SQL front detects metadata/*.metadata.json;
    moving the table directory still resolves (paths rebased)."""
    import shutil

    src = session.spark.range(9).select(F.col("id").alias("k"))
    tbl = str(tmp_path / "ice")
    write_iceberg(src, tbl)
    moved = str(tmp_path / "ice_moved")
    shutil.move(tbl, moved)
    got = session.sql(f"select count(*) as n from dfs.`{moved}`")
    assert got.collect()[0][0] == 9


def _data_file_rows(spark, tbl):
    """(file_path, pos, k) for every live row — to pick delete targets."""
    from drill_spark.readers.iceberg import read_iceberg

    rows = (
        read_iceberg(spark, tbl)
        .select(
            F.regexp_replace(F.col("_metadata.file_path"), "^file:/*", "/").alias("fp"),
            F.col("_metadata.row_index").alias("pos"),
            "k",
        )
        .collect()
    )
    return [(r.fp, r.pos, r.k) for r in rows]


def test_iceberg_positional_deletes(spark, tmp_path):
    """Format-v2 position delete files (spec 'Position Delete Files':
    file_path + pos columns) drop exactly the named rows; the
    pre-delete snapshot still time-travels to the full set."""
    from drill_spark.readers.iceberg import append_delete_files

    src = spark.range(20).select(F.col("id").alias("k"))
    tbl = str(tmp_path / "icepos")
    write_iceberg(src, tbl)
    targets = [(fp, pos) for fp, pos, k in _data_file_rows(spark, tbl) if k % 3 == 0]
    append_delete_files(tbl, position_deletes=targets)
    got = sorted(r.k for r in read_iceberg(spark, tbl).collect())
    assert got == [k for k in range(20) if k % 3 != 0]
    assert read_iceberg(spark, tbl, {"snapshot-id": 1}).count() == 20


def test_iceberg_equality_deletes(spark, tmp_path):
    """Format-v2 equality delete files (spec 'Equality Delete Files':
    equality_ids in the manifest entry) drop every row matching the
    delete rows on the named columns, null-safely."""
    from drill_spark.readers.iceberg import append_delete_files

    src = spark.createDataFrame(
        [(i, None if i % 5 == 0 else f"g{i % 3}") for i in range(15)],
        "k long, grp string",
    )
    tbl = str(tmp_path / "iceeq")
    write_iceberg(src, tbl)
    dels = spark.createDataFrame([("g1",), (None,)], "grp string")
    append_delete_files(tbl, equality_deletes=dels, equality_cols=["grp"])
    got = read_iceberg(spark, tbl).collect()
    assert all(r.grp not in (None, "g1") for r in got)
    assert len(got) == sum(
        1 for i in range(15) if i % 5 != 0 and i % 3 != 1
    )


def test_iceberg_equality_deletes_distributed_write(spark, tmp_path):
    """The equality-delete set is written through Spark's distributed
    parquet writer (never toPandas): a multi-partition delete DataFrame
    lands as multiple spec-legal delete files, each its own manifest
    entry, and the read applies them all."""
    import glob

    from drill_spark.readers.iceberg import append_delete_files

    src = spark.range(200).select(F.col("id").alias("k"))
    tbl = str(tmp_path / "icemulti")
    write_iceberg(src, tbl)
    dels = spark.range(0, 100).select(F.col("id").alias("k")).repartition(4)
    append_delete_files(tbl, equality_deletes=dels, equality_cols=["k"])
    eq_files = glob.glob(os.path.join(tbl, "data", "*-eq-deletes.parquet"))
    assert len(eq_files) > 1  # one per non-empty writer partition
    got = sorted(r.k for r in read_iceberg(spark, tbl).collect())
    assert got == list(range(100, 200))


def test_iceberg_delete_sequence_scoping(spark, tmp_path):
    """An equality delete applies only to data files with a STRICTLY
    OLDER sequence number — rows re-added after the delete survive
    (the merge-on-read upsert pattern)."""
    from drill_spark.readers.avro import decode_file, encode_file
    from drill_spark.readers.iceberg import (
        _MANIFEST_ENTRY_SCHEMA,
        _table_metadata,
        append_delete_files,
    )

    src = spark.createDataFrame([(1, "old"), (2, "keep")], "k long, v string")
    tbl = str(tmp_path / "iceup")
    write_iceberg(src, tbl)
    append_delete_files(
        tbl,
        equality_deletes=spark.createDataFrame([(1,)], "k long"),
        equality_cols=["k"],
    )
    # append a third snapshot re-adding k=1 at sequence number 3
    import pyarrow as pa
    import pyarrow.parquet as pq
    import uuid

    meta = _table_metadata(tbl)
    newf = os.path.join(tbl, "data", f"{uuid.uuid4()}-readd.parquet")
    pq.write_table(pa.table({"k": pa.array([1], pa.int64()),
                             "v": pa.array(["new"], pa.string())}), newf)
    seq, snap_id = 3, 3
    entry = {
        "status": 1, "snapshot_id": snap_id, "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {"content": 0, "file_path": newf, "file_format": "PARQUET",
                      "partition": {}, "record_count": 1,
                      "file_size_in_bytes": os.path.getsize(newf)},
    }
    mdir = os.path.join(tbl, "metadata")
    mpath = os.path.join(mdir, f"{uuid.uuid4()}-m1.avro")
    with open(mpath, "wb") as f:
        f.write(encode_file(_MANIFEST_ENTRY_SCHEMA, [entry]))
    cur = next(s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"])
    with open(cur["manifest-list"], "rb") as f:
        _, rows = decode_file(f.read())
    from drill_spark.readers.iceberg import _MANIFEST_LIST_SCHEMA

    rows = list(rows) + [{
        "manifest_path": mpath, "manifest_length": os.path.getsize(mpath),
        "partition_spec_id": 0, "content": 0, "sequence_number": seq,
        "min_sequence_number": seq, "added_snapshot_id": snap_id,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": 1,
        "existing_rows_count": 0, "deleted_rows_count": 0,
    }]
    mlpath = os.path.join(mdir, f"snap-{snap_id}-1-{uuid.uuid4()}.avro")
    with open(mlpath, "wb") as f:
        f.write(encode_file(_MANIFEST_LIST_SCHEMA, rows))
    meta["last-sequence-number"] = seq
    meta["current-snapshot-id"] = snap_id
    meta["snapshots"].append({"snapshot-id": snap_id, "sequence-number": seq,
                              "timestamp-ms": 0, "manifest-list": mlpath,
                              "summary": {"operation": "append"}, "schema-id": 0})
    import json as _json

    with open(os.path.join(mdir, "v3.metadata.json"), "w") as f:
        _json.dump(meta, f)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write("3")

    got = sorted((r.k, r.v) for r in read_iceberg(spark, tbl).collect())
    assert got == [(1, "new"), (2, "keep")]


def test_iceberg_snapshot_option(spark, tmp_path):
    src = spark.range(4).select(F.col("id").alias("k"))
    tbl = str(tmp_path / "icesnap")
    write_iceberg(src, tbl)
    got = read_iceberg(spark, tbl, {"snapshot-id": 1})
    assert got.count() == 4
    with pytest.raises(ValueError, match="not in table metadata"):
        read_iceberg(spark, tbl, {"snapshot-id": 99})


def test_delta_partition_filter_prunes_branches(spark, tmp_path):
    """A filter on a Delta partition column constant-folds per branch:
    the executed plan scans only the matching partition's files."""
    src = spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "v long, bucket int"
    )
    tbl = str(tmp_path / "part_prune")
    write_delta(src, tbl, partition_by=["bucket"])
    df = read_delta(spark, tbl).filter(F.col("bucket") == 2)
    assert df.count() == 25
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==", 1)[0]
    # 4 partitions -> only 1 surviving parquet scan after pruning
    assert plan.count("Scan parquet") == 1, plan


def test_delta_auto_checkpoint_write_and_replay(spark, tmp_path):
    """11 appends cross the checkpoint cadence: version 10 must produce
    a classic checkpoint + _last_checkpoint, and the snapshot must
    survive cleanup of every pre-checkpoint JSON commit (the reader is
    then provably reading the checkpoint, not the log)."""
    import glob
    import os

    from drill_spark.readers.delta import CHECKPOINT_INTERVAL

    tbl = str(tmp_path / "ckpt_tbl")
    for i in range(CHECKPOINT_INTERVAL + 1):
        df = spark.range(i * 10, i * 10 + 10).withColumnRenamed("id", "v")
        write_delta(df, tbl, mode="append" if i else "error")
    log = os.path.join(tbl, "_delta_log")
    ckpt = os.path.join(log, f"{CHECKPOINT_INTERVAL:020d}.checkpoint.parquet")
    assert os.path.exists(ckpt), "auto-checkpoint at version 10 missing"
    assert os.path.exists(os.path.join(log, "_last_checkpoint"))

    before = {r.v for r in read_delta(spark, tbl).collect()}
    assert before == set(range(110))
    # delete all JSON commits covered by the checkpoint (log cleanup)
    for f in glob.glob(os.path.join(glob.escape(log), "*.json")):
        v = int(os.path.basename(f).split(".")[0])
        if v <= CHECKPOINT_INTERVAL:
            os.remove(f)
    after = {r.v for r in read_delta(spark, tbl).collect()}
    assert after == before


def test_delta_checkpoint_carries_deletion_vectors(spark, tmp_path):
    """An explicit checkpoint after DELETE must persist the DV
    descriptors: with every JSON commit removed, the deleted rows stay
    deleted when reading through the checkpoint alone."""
    import glob
    import os

    from drill_spark.readers.delta import delete_where, write_checkpoint

    tbl = str(tmp_path / "ckpt_dv_tbl")
    write_delta(spark.range(0, 100).withColumnRenamed("id", "v"), tbl)
    assert delete_where(spark, tbl, "v % 10 = 3") == 10
    write_checkpoint(spark, tbl)
    for f in glob.glob(os.path.join(glob.escape(tbl), "_delta_log", "*.json")):
        os.remove(f)
    got = {r.v for r in read_delta(spark, tbl).collect()}
    assert got == {v for v in range(100) if v % 10 != 3}


def test_iceberg_delete_where(spark, tmp_path):
    """Row-level DELETE on an Iceberg v2 table: matched rows become
    position-delete files committed as a new snapshot; the pre-delete
    snapshot still time-travels to the full set."""
    from drill_spark.readers.iceberg import delete_where

    src = spark.range(50).select(F.col("id").alias("k"))
    tbl = str(tmp_path / "ice_delwhere")
    write_iceberg(src, tbl)
    n = delete_where(spark, tbl, "k % 5 = 2")
    assert n == 10
    got = sorted(r.k for r in read_iceberg(spark, tbl).collect())
    assert got == [k for k in range(50) if k % 5 != 2]
    assert read_iceberg(spark, tbl, {"snapshot-id": 1}).count() == 50


def test_iceberg_delete_where_is_incremental(spark, tmp_path):
    """A second DELETE counts only newly-deleted rows (already-deleted
    rows are excluded by applying existing deletes first), and both
    delete snapshots compose on read."""
    from drill_spark.readers.iceberg import delete_where

    src = spark.range(40).select(F.col("id").alias("k"))
    tbl = str(tmp_path / "ice_delwhere2")
    write_iceberg(src, tbl)
    assert delete_where(spark, tbl, "k < 10") == 10
    # overlaps [0, 10): only [10, 15) is newly deleted
    assert delete_where(spark, tbl, "k < 15") == 5
    got = sorted(r.k for r in read_iceberg(spark, tbl).collect())
    assert got == list(range(15, 40))
    # no matches -> no commit, count stays
    assert delete_where(spark, tbl, "k < 0") == 0
    assert read_iceberg(spark, tbl).count() == 25


def test_delta_optimize_compacts_and_purges_dvs(spark, tmp_path):
    """OPTIMIZE rewrites small files and DV-carrying files: rows stay
    identical, deleted rows are physically purged (no DV remains), and
    the pre-optimize version still time-travels."""
    from drill_spark.readers.delta import delete_where, load_snapshot, optimize

    tbl = str(tmp_path / "opt")
    # 3 commits of small files
    for i in range(3):
        write_delta(spark.range(i * 10, i * 10 + 10).withColumnRenamed("id", "v"),
                    tbl, mode="append" if i else "error")
    assert delete_where(spark, tbl, "v % 7 = 0") == 5
    expect = sorted(v for v in range(30) if v % 7 != 0)

    pre_files = len(load_snapshot(spark, tbl).files)
    stats = optimize(spark, tbl)
    assert stats["rewritten"] == pre_files and stats["added"] >= 1

    snap = load_snapshot(spark, tbl)
    assert not any(e.get("dv") for e in snap.files.values()), "DVs must be purged"
    assert sorted(r.v for r in read_delta(spark, tbl).collect()) == expect
    # dataChange=false commit: logical content unchanged at prior version
    assert sorted(
        r.v for r in read_delta(spark, tbl, {"versionAsOf": 3}).collect()
    ) == expect


def test_delta_vacuum_removes_orphans(spark, tmp_path):
    """VACUUM deletes unreferenced files past retention and keeps every
    live file (incl. live DV files); dry_run only reports."""
    import os

    from drill_spark.readers.delta import delete_where, optimize, vacuum

    tbl = str(tmp_path / "vac")
    for i in range(2):
        write_delta(spark.range(i * 10, i * 10 + 10).withColumnRenamed("id", "v"),
                    tbl, mode="append" if i else "error")
    delete_where(spark, tbl, "v = 3")        # creates one DV file
    delete_where(spark, tbl, "v = 4")        # supersedes it -> old DV orphaned
    optimize(spark, tbl)                     # orphans all old parquet + DVs

    listed = vacuum(spark, tbl, retention_hours=0, dry_run=True)
    assert listed, "expected orphaned files"
    for rel in listed:
        assert os.path.exists(os.path.join(tbl, rel))

    gone = vacuum(spark, tbl, retention_hours=0)
    assert gone == listed
    for rel in gone:
        assert not os.path.exists(os.path.join(tbl, rel))
    # table still reads correctly after vacuum
    assert sorted(r.v for r in read_delta(spark, tbl).collect()) == [
        v for v in range(20) if v not in (3, 4)
    ]
    # retention respected: fresh orphans survive a 7-day window
    assert vacuum(spark, tbl, retention_hours=168, dry_run=True) == []


def test_delta_update_where(spark, tmp_path):
    """Row-level UPDATE: matched rows masked by DVs + updated copies
    appended in ONE commit; expressions see pre-update values; earlier
    deletes are never resurrected; time travel sees the old values."""
    from drill_spark.readers.delta import delete_where, update_where

    tbl = str(tmp_path / "upd")
    write_delta(
        spark.range(10).selectExpr("id as k", "cast(id * 10 as double) as amt"), tbl
    )
    assert delete_where(spark, tbl, "k = 9") == 1           # version 1
    n = update_where(spark, tbl, "k >= 5", {"amt": "amt + 0.5"})
    assert n == 4                                           # 5..8 (9 is deleted)
    got = {r.k: r.amt for r in read_delta(spark, tbl).collect()}
    assert got == {k: k * 10 + (0.5 if k >= 5 else 0.0) for k in range(9)}
    old = {r.k: r.amt for r in read_delta(spark, tbl, {"versionAsOf": 1}).collect()}
    assert old == {k: float(k * 10) for k in range(9)}


def test_sql_update_statement(session, tmp_path):
    from drill_spark.readers.delta import write_delta

    spark = session.spark
    session.register_workspace("dfs.upd", str(tmp_path), "parquet", writable=True)
    tbl = str(tmp_path / "u")
    write_delta(spark.range(6).selectExpr("id as k", "'a' as tag"), tbl)
    out = session.sql(
        "UPDATE dfs.upd.`u` SET tag = concat(tag, '-', cast(k as string)) WHERE k % 2 = 0"
    ).collect()[0]
    assert out.rows_updated == 3
    got = {r.k: r.tag for r in session.sql("select * from dfs.upd.`u`").collect()}
    assert got == {k: (f"a-{k}" if k % 2 == 0 else "a") for k in range(6)}


def test_delta_merge_into_upsert(spark, tmp_path):
    """MERGE INTO: matched rows updated (DV mask + rewritten copies),
    unmatched source rows inserted — one commit, counts exact."""
    from drill_spark.readers.delta import merge_into

    tbl = str(tmp_path / "merge")
    write_delta(spark.range(5).selectExpr("id as k", "cast(id as double) as amt"), tbl)
    src = spark.createDataFrame(
        [(3, 300.0), (4, 400.0), (7, 700.0), (8, 800.0)], "k long, amt double"
    )
    stats = merge_into(
        spark, tbl, src, on="t.k = src.k",
        when_matched_update={"amt": "src.amt"},
        when_not_matched_insert={"k": "src.k", "amt": "src.amt"},
    )
    assert stats == {"updated": 2, "deleted": 0, "inserted": 2}
    got = {r.k: r.amt for r in read_delta(spark, tbl).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 300.0, 4: 400.0, 7: 700.0, 8: 800.0}


def test_delta_merge_matched_delete_and_ambiguity(spark, tmp_path):
    """WHEN MATCHED DELETE masks without copies; duplicate source
    matches raise the SQL-standard cardinality error."""
    import pytest as _pytest

    from drill_spark.readers.delta import merge_into

    tbl = str(tmp_path / "merge_del")
    write_delta(spark.range(6).selectExpr("id as k", "cast(id as double) as amt"), tbl)
    src = spark.createDataFrame([(1,), (4,)], "k long")
    stats = merge_into(spark, tbl, src, on="t.k = src.k", when_matched_delete=True)
    assert stats["deleted"] == 2
    assert sorted(r.k for r in read_delta(spark, tbl).collect()) == [0, 2, 3, 5]

    dup_src = spark.createDataFrame([(2, 1.0), (2, 2.0)], "k long, amt double")
    with _pytest.raises(ValueError, match="multiple source rows"):
        merge_into(spark, tbl, dup_src, on="t.k = src.k",
                   when_matched_update={"amt": "src.amt"})


def test_iceberg_expire_snapshots(spark, tmp_path):
    """expire_snapshots drops old snapshots + exclusively-referenced
    files; shared data files survive and the current snapshot still
    reads; expired ids no longer time-travel."""
    import os

    from drill_spark.readers.iceberg import delete_where, expire_snapshots

    tbl = str(tmp_path / "ice_expire")
    write_iceberg(spark.range(30).select(F.col("id").alias("k")), tbl)
    delete_where(spark, tbl, "k < 5")     # snapshot 2
    delete_where(spark, tbl, "k < 10")    # snapshot 3

    stats = expire_snapshots(spark, tbl, keep_last=1)
    assert stats["expired"] == 2 and stats["removed_files"] >= 2

    got = sorted(r.k for r in read_iceberg(spark, tbl).collect())
    assert got == list(range(10, 30))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in table metadata"):
        read_iceberg(spark, tbl, {"snapshot-id": 1})
    # idempotent: nothing further to expire
    assert expire_snapshots(spark, tbl) == {"expired": 0, "removed_files": 0}


def test_iceberg_append_snapshot(session, tmp_path):
    """write_iceberg(mode='append') commits an APPEND snapshot; INSERT
    INTO auto-detects iceberg tables; time travel sees each snapshot;
    deletes committed before an append still apply."""
    from drill_spark.readers.iceberg import delete_where, write_iceberg

    spark = session.spark
    tbl = str(tmp_path / "ice_append")
    write_iceberg(spark.range(5).select(F.col("id").alias("k")), tbl)
    delete_where(spark, tbl, "k = 0")
    write_iceberg(spark.range(5, 8).select(F.col("id").alias("k")), tbl, mode="append")
    got = sorted(r.k for r in read_iceberg(spark, tbl).collect())
    assert got == [1, 2, 3, 4, 5, 6, 7]
    assert read_iceberg(spark, tbl, {"snapshot-id": 1}).count() == 5

    session.register_workspace("dfs.ice", str(tmp_path), "parquet", writable=True)
    session.sql("INSERT INTO dfs.ice.`ice_append` select cast(99 as long) as k")
    assert session.sql(
        "select count(*) as n from dfs.ice.`ice_append`"
    ).collect()[0].n == 8


def test_iceberg_rewrite_data_files(spark, tmp_path):
    """Compaction: live rows rewritten into fresh files, REPLACE
    snapshot scans no delete files, pre-rewrite snapshot still
    time-travels, and expire_snapshots then reclaims the old files."""
    import glob
    import os

    from drill_spark.readers.iceberg import (
        delete_where,
        expire_snapshots,
        rewrite_data_files,
    )

    tbl = str(tmp_path / "ice_rw")
    write_iceberg(spark.range(40).select(F.col("id").alias("k")), tbl)
    delete_where(spark, tbl, "k % 4 = 1")
    stats = rewrite_data_files(spark, tbl)
    assert stats["rows"] == 30 and stats["added_files"] >= 1

    expect = sorted(k for k in range(40) if k % 4 != 1)
    assert sorted(r.k for r in read_iceberg(spark, tbl).collect()) == expect
    # the delete snapshot still time-travels with merge-on-read
    assert read_iceberg(spark, tbl, {"snapshot-id": 2}).count() == 30
    assert read_iceberg(spark, tbl, {"snapshot-id": 1}).count() == 40

    n_before = len(glob.glob(os.path.join(glob.escape(tbl), "data", "*.parquet")))
    expire_snapshots(spark, tbl, keep_last=1)
    n_after = len(glob.glob(os.path.join(glob.escape(tbl), "data", "*.parquet")))
    assert n_after < n_before
    assert sorted(r.k for r in read_iceberg(spark, tbl).collect()) == expect


def test_iceberg_update_where(spark, tmp_path):
    """Iceberg row-level UPDATE: one snapshot commits both the position
    deletes and the updated copies; prior snapshot time-travels."""
    from drill_spark.readers.iceberg import delete_where, update_where

    tbl = str(tmp_path / "ice_upd")
    write_iceberg(
        spark.range(10).selectExpr("id as k", "cast(id * 10 as double) as amt"), tbl
    )
    assert delete_where(spark, tbl, "k = 9") == 1
    assert update_where(spark, tbl, "k >= 5", {"amt": "amt + 0.5"}) == 4
    got = {r.k: r.amt for r in read_iceberg(spark, tbl).collect()}
    assert got == {k: k * 10 + (0.5 if k >= 5 else 0.0) for k in range(9)}
    assert read_iceberg(spark, tbl, {"snapshot-id": 1}).count() == 10


def test_iceberg_merge_into(session, tmp_path):
    """Iceberg MERGE: upsert + ambiguity guard, and the SQL face routes
    by table format."""
    import pytest as _pytest

    from drill_spark.readers.iceberg import merge_into

    spark = session.spark
    tbl = str(tmp_path / "ice_mrg")
    write_iceberg(
        spark.range(5).selectExpr("id as k", "cast(id as double) as amt"), tbl
    )
    src = spark.createDataFrame([(3, 300.0), (7, 700.0)], "k long, amt double")
    stats = merge_into(
        spark, tbl, src, on="t.k = src.k",
        when_matched_update={"amt": "src.amt"},
        when_not_matched_insert={"k": "src.k", "amt": "src.amt"},
    )
    assert stats == {"updated": 1, "deleted": 0, "inserted": 1}
    got = {r.k: r.amt for r in read_iceberg(spark, tbl).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 300.0, 4: 4.0, 7: 700.0}

    dup = spark.createDataFrame([(2, 1.0), (2, 2.0)], "k long, amt double")
    with _pytest.raises(ValueError, match="multiple source rows"):
        merge_into(spark, tbl, dup, on="t.k = src.k",
                   when_matched_update={"amt": "src.amt"})

    session.register_workspace("dfs.imrg", str(tmp_path), "parquet", writable=True)
    spark.createDataFrame([(0, 0.5)], "k long, amt double") \
        .createOrReplaceTempView("ice_cdc")
    out = session.sql(
        "MERGE INTO dfs.imrg.`ice_mrg` USING (select * from ice_cdc) AS src "
        "ON t.k = src.k WHEN MATCHED THEN UPDATE SET amt = src.amt"
    ).collect()[0]
    assert out.updated == 1
    assert session.sql(
        "select amt from dfs.imrg.`ice_mrg` where k = 0"
    ).collect()[0].amt == 0.5


def test_delta_update_partitioned_table(spark, tmp_path):
    """UPDATE on a partitioned Delta table: conditions may reference
    partition columns, updated copies land in the right hive dirs, and
    partition values survive in the commit."""
    from drill_spark.readers.delta import load_snapshot, update_where

    tbl = str(tmp_path / "upd_part")
    src = spark.range(20).selectExpr(
        "id as k", "cast(id % 4 as int) as bucket", "cast(0 as double) as v"
    )
    write_delta(src, tbl, partition_by=["bucket"])
    n = update_where(spark, tbl, "bucket = 2 and k >= 10", {"v": "k * 1.0"})
    assert n == 3  # k in {10, 14, 18} have bucket 2... k%4==2 -> 10, 14, 18
    got = {r.k: (r.bucket, r.v) for r in read_delta(spark, tbl).collect()}
    assert len(got) == 20
    for k, (b, v) in got.items():
        expect = float(k) if (k % 4 == 2 and k >= 10) else 0.0
        assert (b, v) == (k % 4, expect), (k, b, v)
    snap = load_snapshot(spark, tbl)
    # every add entry still carries its partition value
    assert all(e["pv"].get("bucket") is not None for e in snap.files.values())


def test_delta_table_changes_feed(spark, tmp_path):
    """CDF-style change feed from the log: appends -> inserts, DV
    deletes -> deletes, UPDATE -> delete+insert pair, compaction ->
    nothing."""
    from drill_spark.readers.delta import (
        delete_where,
        optimize,
        table_changes,
        update_where,
    )

    tbl = str(tmp_path / "cdf")
    write_delta(spark.range(5).selectExpr("id as k", "cast(0 as double) as v"), tbl)  # v0
    write_delta(spark.range(5, 8).selectExpr("id as k", "cast(0 as double) as v"),
                tbl, mode="append")                                                   # v1
    assert delete_where(spark, tbl, "k = 6") == 1                                     # v2
    assert update_where(spark, tbl, "k = 7", {"v": "9.5"}) == 1                       # v3
    optimize(spark, tbl)                                                              # v4

    ch = table_changes(spark, tbl, from_version=0).collect()
    by = {}
    for r in ch:
        by.setdefault((r._commit_version, r._change_type), set()).add(r.k)
    assert by[(0, "insert")] == {0, 1, 2, 3, 4}  # inclusive startingVersion
    assert by[(1, "insert")] == {5, 6, 7}
    assert by[(2, "delete")] == {6}
    assert by[(3, "delete")] == {7}
    assert by[(3, "insert")] == {7}
    assert not any(v == 4 for v, _ in by), "compaction must emit no changes"
    # the updated insert carries the new value
    upd = [r for r in ch if r._commit_version == 3 and r._change_type == "insert"]
    assert upd[0].v == 9.5
    # windowed read: [2, 2] captures only the delete commit
    assert {r.k for r in table_changes(spark, tbl, 2, 2).collect()} == {6}


def test_delta_table_changes_partitioned(spark, tmp_path):
    """The change feed carries partition columns (CDF returns every
    table column)."""
    from drill_spark.readers.delta import delete_where, table_changes

    tbl = str(tmp_path / "cdf_part")
    src = spark.range(8).selectExpr("id as k", "cast(id % 2 as int) as b")
    write_delta(src, tbl, partition_by=["b"])
    delete_where(spark, tbl, "k = 3")
    ch = table_changes(spark, tbl, 0).collect()
    assert all(r.b == r.k % 2 for r in ch), sorted((r.k, r.b) for r in ch)
    dels = [r for r in ch if r._change_type == "delete"]
    assert [(r.k, r.b) for r in dels] == [(3, 1)]


def test_iceberg_read_incremental(spark, tmp_path):
    """Incremental append scan: only rows added in the requested
    snapshot window, tagged with _snapshot_id; delete/replace
    snapshots contribute nothing."""
    from drill_spark.readers.iceberg import delete_where, read_incremental

    tbl = str(tmp_path / "ice_inc")
    write_iceberg(spark.range(3).select(F.col("id").alias("k")), tbl)       # snap 1
    write_iceberg(spark.range(3, 6).select(F.col("id").alias("k")), tbl,
                  mode="append")                                            # snap 2
    delete_where(spark, tbl, "k = 0")                                       # snap 3
    write_iceberg(spark.range(6, 8).select(F.col("id").alias("k")), tbl,
                  mode="append")                                            # snap 4

    inc = read_incremental(spark, tbl, from_snapshot=1).collect()
    got = {}
    for r in inc:
        got.setdefault(r._snapshot_id, set()).add(r.k)
    assert got == {2: {3, 4, 5}, 4: {6, 7}}
    # window ending before the last append
    assert {r.k for r in read_incremental(spark, tbl, 1, 3).collect()} == {3, 4, 5}
    assert read_incremental(spark, tbl, 4).count() == 0


def test_time_travel_by_timestamp_and_history(spark, tmp_path):
    """timestampAsOf resolves to the latest commit at-or-before the
    timestamp (both formats); DESCRIBE HISTORY lists every commit."""
    import time

    from drill_spark.readers.delta import describe_history
    from drill_spark.readers.iceberg import write_iceberg as _wi

    d_tbl = str(tmp_path / "ts_delta")
    write_delta(spark.range(3).withColumnRenamed("id", "v"), d_tbl)
    time.sleep(1.2)
    t_mid = int(time.time() * 1000)
    time.sleep(1.2)
    write_delta(spark.range(3, 9).withColumnRenamed("id", "v"), d_tbl, mode="append")

    assert read_delta(spark, d_tbl, {"timestampAsOf": t_mid}).count() == 3
    assert read_delta(spark, d_tbl, {"timestampAsOf": int(time.time() * 1000)}).count() == 9
    import pytest as _pytest

    with _pytest.raises(ValueError, match="precedes"):
        read_delta(spark, d_tbl, {"timestampAsOf": 1000})

    hist = {r.version: r.operation for r in describe_history(spark, d_tbl).collect()}
    assert hist == {0: "CREATE TABLE AS SELECT", 1: "WRITE"}

    i_tbl = str(tmp_path / "ts_ice")
    _wi(spark.range(4).select(F.col("id").alias("k")), i_tbl)
    time.sleep(1.2)
    t_mid = int(time.time() * 1000)
    time.sleep(1.2)
    _wi(spark.range(4, 6).select(F.col("id").alias("k")), i_tbl, mode="append")
    assert read_iceberg(spark, i_tbl, {"as-of-timestamp": t_mid}).count() == 4
    assert read_iceberg(
        spark, i_tbl, {"as-of-timestamp": int(time.time() * 1000)}
    ).count() == 6


def test_delta_vacuum_retention_from_deletion_time(spark, tmp_path):
    """Retention is measured from the REMOVE action's deletionTimestamp,
    not file age: a file written long ago but removed just now must
    survive the window (time travel within retention keeps working)."""
    import os
    import time

    from drill_spark.readers.delta import optimize, vacuum

    tbl = str(tmp_path / "vac_ret")
    write_delta(spark.range(10).withColumnRenamed("id", "v"), tbl)
    write_delta(spark.range(10, 20).withColumnRenamed("id", "v"), tbl, mode="append")
    # age every data file far past the 7-day window
    old = time.time() - 30 * 86400
    for root, dirs, files in os.walk(tbl):
        dirs[:] = [d for d in dirs if d != "_delta_log"]
        for f in files:
            os.utime(os.path.join(root, f), (old, old))
    optimize(spark, tbl)  # removes the aged files NOW

    # default retention: removal is recent -> nothing eligible
    assert vacuum(spark, tbl, dry_run=True) == []
    # pre-optimize version still time-travels
    assert read_delta(spark, tbl, {"versionAsOf": 1}).count() == 20
    # zero retention: the removed files go
    assert len(vacuum(spark, tbl, retention_hours=0)) > 0


# ------------------------------------------- delta scale + log-cleanup paths


def test_delta_large_dv_never_decodes_on_driver(spark, tmp_path, monkeypatch):
    """A DV past _DV_DRIVER_DECODE_MAX must decode on EXECUTORS only:
    the driver-side read_descriptor is patched to raise, so any driver
    materialization of the (file, row) tuples fails the test. Covers
    read_delta, the annotated scan feeding UPDATE/MERGE, and the CDF
    diff, on a multi-file table with a >10^5-position DV."""
    import drill_spark.readers.delta_dv as delta_dv
    from drill_spark.readers.delta import (
        _DV_DRIVER_DECODE_MAX,
        delete_where,
        load_snapshot,
        table_changes,
        update_where,
    )

    tbl = str(tmp_path / "bigdv")
    n = 300_000
    write_delta(
        spark.range(n).repartition(2).withColumnRenamed("id", "v"), tbl
    )
    assert delete_where(spark, tbl, "v % 2 = 0") == n // 2
    snap = load_snapshot(spark, tbl)
    total_card = sum(
        e["dv"]["cardinality"] for e in snap.files.values() if e.get("dv")
    )
    assert total_card == n // 2 > _DV_DRIVER_DECODE_MAX

    def boom(*a, **k):
        raise AssertionError("driver-side DV decode on the read path")

    monkeypatch.setattr(delta_dv, "read_descriptor", boom)
    # force even the per-file CDF diffs (75k positions each) through the
    # executor path — the per-call driver threshold is a size heuristic,
    # the contract under test is that past it NOTHING decodes driver-side
    import drill_spark.readers.delta as delta_mod

    monkeypatch.setattr(delta_mod, "_DV_DRIVER_DECODE_MAX", 1000)

    # plain read: deleted rows masked, no driver decode
    assert read_delta(spark, tbl).count() == n // 2
    got = read_delta(spark, tbl).agg(F.sum("v")).collect()[0][0]
    assert got == sum(v for v in range(n) if v % 2)

    # CDF over the delete commit: executor-side diff path
    cdf = table_changes(spark, tbl, 1, 1)
    assert cdf.where("_change_type = 'delete'").count() == n // 2

    # UPDATE goes through _live_annotated_scan + executor DV build
    assert update_where(spark, tbl, "v = 1", {"v": "v + 1000000"}) == 1
    assert read_delta(spark, tbl).where("v = 1000001").count() == 1


def test_delta_append_and_dml_after_log_cleanup(spark, tmp_path):
    """After checkpoint-based JSON log cleanup, the table still EXISTS:
    append derives the next version from the snapshot (not the JSON
    files), mode='error' still refuses, and DML commits land at the
    right version — nothing silently restarts the log at 0."""
    import glob

    from drill_spark.readers.delta import CHECKPOINT_INTERVAL, delete_where

    tbl = str(tmp_path / "cleanup_append")
    for i in range(CHECKPOINT_INTERVAL + 1):
        df = spark.range(i * 10, i * 10 + 10).withColumnRenamed("id", "v")
        write_delta(df, tbl, mode="append" if i else "error")
    log = os.path.join(tbl, "_delta_log")
    for f in glob.glob(os.path.join(glob.escape(log), "*.json")):
        os.remove(f)

    with pytest.raises(ValueError, match="already exists"):
        write_delta(spark.range(1).withColumnRenamed("id", "v"), tbl)

    write_delta(
        spark.range(110, 120).withColumnRenamed("id", "v"), tbl, mode="append"
    )
    assert os.path.exists(os.path.join(log, f"{CHECKPOINT_INTERVAL + 1:020d}.json")), \
        "append after log cleanup must continue the version sequence"
    assert {r.v for r in read_delta(spark, tbl).collect()} == set(range(120))

    assert delete_where(spark, tbl, "v >= 115") == 5
    assert os.path.exists(os.path.join(log, f"{CHECKPOINT_INTERVAL + 2:020d}.json"))
    assert read_delta(spark, tbl).count() == 115


def test_delta_vacuum_honors_checkpointed_tombstones(spark, tmp_path):
    """A file REMOVED recently but WRITTEN long ago must survive a
    vacuum inside the retention window even after JSON log cleanup:
    the checkpoint carries the remove tombstones (deletionTimestamp),
    so vacuum must not fall back to the ancient file mtime."""
    import glob
    import time

    from drill_spark.readers.delta import optimize, vacuum, write_checkpoint

    tbl = str(tmp_path / "tomb")
    for i in range(2):
        write_delta(spark.range(i * 10, i * 10 + 10).withColumnRenamed("id", "v"),
                    tbl, mode="append" if i else "error")
    old_files = {
        rel for rel in os.listdir(tbl) if rel.endswith(".parquet")
    }
    stats = optimize(spark, tbl)  # removes the small files "now"
    assert stats["rewritten"] >= 2
    write_checkpoint(spark, tbl)
    log = os.path.join(tbl, "_delta_log")
    for f in glob.glob(os.path.join(glob.escape(log), "*.json")):
        os.remove(f)

    # pretend the replaced files were written 10 days ago
    ancient = time.time() - 10 * 24 * 3600
    for rel in old_files:
        os.utime(os.path.join(tbl, rel), (ancient, ancient))

    # removal is recent -> inside the 24h window nothing may be listed
    assert vacuum(spark, tbl, retention_hours=24, dry_run=True) == []
    # zero retention: now they are fair game, and the table still reads
    doomed = vacuum(spark, tbl, retention_hours=0)
    assert set(doomed) >= old_files
    assert read_delta(spark, tbl).count() == 20


def test_iceberg_read_incremental_raises_on_overwrite(spark, tmp_path):
    """An overwrite snapshot (UPDATE/MERGE) inside the incremental
    window must raise — an append-only feed cannot represent rewritten
    rows — unless the caller opts into skipping explicitly."""
    from drill_spark.readers.iceberg import read_incremental, update_where

    tbl = str(tmp_path / "ice_inc_ow")
    write_iceberg(spark.range(3).select(F.col("id").alias("k")), tbl)       # snap 1
    update_where(spark, tbl, "k = 1", {"k": "k + 100"})                     # snap 2
    write_iceberg(spark.range(10, 12).select(F.col("id").alias("k")), tbl,
                  mode="append")                                            # snap 3

    with pytest.raises(ValueError, match="overwrite snapshot"):
        read_incremental(spark, tbl, from_snapshot=1)
    # window before the overwrite is unaffected
    assert read_incremental(spark, tbl, 2).count() == 2
    # explicit opt-in skips it
    got = {r.k for r in read_incremental(
        spark, tbl, 1, skip_overwrites=True).collect()}
    assert got == {10, 11}


def test_delta_restore_table(spark, tmp_path):
    """RESTORE TABLE to an earlier version: the log-only commit brings
    the file set back, later versions remain time-travelable, and a
    restore across a DELETE resurrects the rows."""
    from drill_spark.readers.delta import delete_where, restore_table

    tbl = str(tmp_path / "restore")
    write_delta(spark.range(10).withColumnRenamed("id", "v"), tbl)        # v0
    write_delta(spark.range(10, 15).withColumnRenamed("id", "v"), tbl,
                mode="append")                                            # v1
    assert delete_where(spark, tbl, "v < 3") == 3                         # v2
    assert read_delta(spark, tbl).count() == 12

    stats = restore_table(spark, tbl, version=1)                          # v3
    assert stats["restored_version"] == 1
    assert sorted(r.v for r in read_delta(spark, tbl).collect()) == list(range(15))
    # pre-restore state still reachable
    assert read_delta(spark, tbl, {"versionAsOf": 2}).count() == 12
    # restore to v0 drops the appended files too
    restore_table(spark, tbl, version=0)
    assert read_delta(spark, tbl).count() == 10
    with pytest.raises(ValueError, match="exactly one"):
        restore_table(spark, tbl)


def test_iceberg_rollback_to_snapshot(spark, tmp_path):
    from drill_spark.readers.iceberg import rollback_to_snapshot

    tbl = str(tmp_path / "ice_rb")
    write_iceberg(spark.range(4).select(F.col("id").alias("k")), tbl)       # snap 1
    write_iceberg(spark.range(4, 9).select(F.col("id").alias("k")), tbl,
                  mode="append")                                            # snap 2
    assert read_iceberg(spark, tbl).count() == 9
    rollback_to_snapshot(tbl, 1)
    assert read_iceberg(spark, tbl).count() == 4
    # the later snapshot is still addressable
    assert read_iceberg(spark, tbl, {"snapshot-id": 2}).count() == 9
    with pytest.raises(ValueError, match="not in table history"):
        rollback_to_snapshot(tbl, 99)


def test_iceberg_identity_partitioned_write(spark, tmp_path):
    """Identity-partitioned Iceberg writes: hive-layout data dirs, the
    partition columns kept IN the data files (the Iceberg convention),
    and typed partition values in every manifest entry — the metadata
    real engines prune on. Appends honor the table's spec; DML still
    works on the partitioned table."""
    from drill_spark.readers.avro import decode_file
    from drill_spark.readers.iceberg import _table_metadata, delete_where

    tbl = str(tmp_path / "ice_part")
    df = spark.range(12).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("cell"),
    )
    write_iceberg(df, tbl, partition_by=["cell"])
    got = read_iceberg(spark, tbl)
    assert sorted(got.columns) == ["cell", "k"]
    assert sorted((r.k, r.cell) for r in got.collect()) == [
        (i, i % 3) for i in range(12)]

    # manifests carry TYPED partition values
    meta = _table_metadata(tbl)
    spec = meta["partition-specs"][0]
    assert spec["fields"][0]["name"] == "cell"
    assert spec["fields"][0]["transform"] == "identity"
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    with open(snap["manifest-list"], "rb") as f:
        _, ml = decode_file(f.read())
    with open(ml[0]["manifest_path"], "rb") as f:
        _, entries = decode_file(f.read())
    parts = {e["data_file"]["partition"]["cell"] for e in entries}
    assert parts == {0, 1, 2}
    assert all(isinstance(p, int) for p in parts)

    # append honors the spec; earlier snapshot still time-travels
    write_iceberg(spark.range(12, 15).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("cell")),
        tbl, mode="append")
    assert read_iceberg(spark, tbl).count() == 15
    assert read_iceberg(spark, tbl, {"snapshot-id": 1}).count() == 12

    # row-level DML on the partitioned table
    assert delete_where(spark, tbl, "k >= 13") == 2
    assert read_iceberg(spark, tbl).count() == 13


def test_iceberg_partitioned_update_merge_compaction(spark, tmp_path):
    """UPDATE / MERGE / rewrite_data_files on identity-partitioned
    Iceberg tables (r6, closing the r5 gate): rewritten and inserted
    files land in hive-layout partition dirs with typed partition
    values in their manifest entries; an UPDATE that changes the
    partition column moves the row to its new partition."""
    from drill_spark.readers.avro import decode_file
    from drill_spark.readers.iceberg import (
        _table_metadata, merge_into, rewrite_data_files, update_where,
    )

    tbl = str(tmp_path / "ice_part_dml")
    df = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("int").alias("cell"),
        (F.col("id") * 10).alias("v"),
    )
    write_iceberg(df, tbl, partition_by=["cell"])

    # UPDATE leaving the partition untouched
    assert update_where(spark, tbl, "k < 3", {"v": "v + 1"}) == 3
    got = {r.k: (r.cell, r.v) for r in read_iceberg(spark, tbl).collect()}
    assert got[0] == (0, 1) and got[1] == (1, 11) and got[2] == (0, 21)
    assert got[5] == (1, 50)

    # UPDATE that MOVES rows across partitions
    assert update_where(spark, tbl, "k = 4", {"cell": "1"}) == 1
    got = {r.k: r.cell for r in read_iceberg(spark, tbl).collect()}
    assert got[4] == 1

    # manifest entries for the new files carry typed partition values
    meta = _table_metadata(tbl)
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    with open(snap["manifest-list"], "rb") as f:
        _, ml = decode_file(f.read())
    data_manifests = [m for m in ml if m["content"] == 0]
    parts = set()
    for m in data_manifests:
        with open(m["manifest_path"], "rb") as f:
            _, entries = decode_file(f.read())
        parts |= {e["data_file"]["partition"].get("cell") for e in entries}
    assert parts <= {0, 1} and 1 in parts

    # MERGE: update one row, insert one new row (new partition value ok)
    src = spark.createDataFrame([(1, 99), (100, 7)], "k bigint, nv bigint")
    out = merge_into(
        spark, tbl, src, "t.k = src.k",
        when_matched_update={"v": "src.nv"},
        when_not_matched_insert={"k": "src.k", "cell": "cast(0 as int)",
                                 "v": "src.nv"},
    )
    assert out == {"updated": 1, "deleted": 0, "inserted": 1}
    got = {r.k: r.v for r in read_iceberg(spark, tbl).collect()}
    assert got[1] == 99 and got[100] == 7 and len(got) == 11

    # compaction keeps every row, pays down the delete debt, and the
    # replacement files sit in partition dirs
    res = rewrite_data_files(spark, tbl)
    assert res["rows"] == 11
    got2 = {r.k: (r.cell, r.v) for r in read_iceberg(spark, tbl).collect()}
    assert {k: v for k, (c, v) in got2.items()} == got
    meta2 = _table_metadata(tbl)
    snap2 = next(s for s in meta2["snapshots"]
                 if s["snapshot-id"] == meta2["current-snapshot-id"])
    with open(snap2["manifest-list"], "rb") as f:
        _, ml2 = decode_file(f.read())
    assert all(m["content"] == 0 for m in ml2)  # REPLACE: no delete debt
    with open(ml2[0]["manifest_path"], "rb") as f:
        _, entries2 = decode_file(f.read())
    assert {e["data_file"]["partition"]["cell"] for e in entries2} == {0, 1}
    assert all("_p_cell=" in e["data_file"]["file_path"] for e in entries2)
