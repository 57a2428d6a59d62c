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
                                         "readerFeatures": ["deletionVectors"]}}) + "\n")
        f.write(json.dumps({"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                                         "schemaString": schema, "partitionColumns": []}}) + "\n")
    with pytest.raises(NotImplementedError, match="deletionVectors"):
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


def test_iceberg_delete_files_raise(spark, tmp_path):
    src = spark.range(3).select(F.col("id").alias("k"))
    tbl = str(tmp_path / "icedel")
    write_iceberg(src, tbl)
    # flip the manifest-list row to content=1 (delete manifest)
    from drill_spark.readers.avro import decode_file, encode_file
    from drill_spark.readers.iceberg import _MANIFEST_LIST_SCHEMA, _table_metadata

    meta = _table_metadata(tbl)
    ml = meta["snapshots"][0]["manifest-list"]
    with open(ml, "rb") as f:
        _, rows = decode_file(f.read())
    rows[0]["content"] = 1
    with open(ml, "wb") as f:
        f.write(encode_file(_MANIFEST_LIST_SCHEMA, rows))
    with pytest.raises(NotImplementedError, match="delete"):
        read_iceberg(spark, tbl)


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
