"""Paimon table format (reference contrib/format-paimon reads via the
paimon-java library; native layout walker here, readers/paimon.py).
No binary reference fixtures exist (the reference's tests build tables
through the library at run time), so reader semantics are exercised
against the published layout: our writer's output plus hand-written
manifests for the reconciliation / merge-engine rules."""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from drill_spark.readers.avro import encode_file
from drill_spark.readers.paimon import (
    _MANIFEST_ENTRY_SCHEMA,
    _MANIFEST_META_SCHEMA,
    read_paimon,
    write_paimon,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_roundtrip_append_time_travel(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = spark.range(10).select("id", (F.col("id") % 3).alias("k"))
    write_paimon(df, tbl)
    got = read_paimon(spark, tbl)
    assert got.columns == ["id", "k"] and got.count() == 10
    write_paimon(spark.range(10, 15).select("id", (F.col("id") % 3).alias("k")),
                 tbl, mode="append")
    assert read_paimon(spark, tbl).count() == 15
    assert read_paimon(spark, tbl, {"snapshot-id": 1}).count() == 10


def test_delete_entry_reconciliation(spark, tmp_path):
    """A hand-written snapshot whose delta manifest DELETEs one data
    file: the reconciliation must drop exactly that file's rows."""
    tbl = str(tmp_path / "d")
    write_paimon(spark.range(6).coalesce(1).select("id"), tbl)
    write_paimon(spark.range(6, 9).coalesce(1).select("id"), tbl, mode="append")
    # find the first snapshot's data file name
    from drill_spark.readers.paimon import active_files, load_snapshot

    snap1 = load_snapshot(tbl, 1)
    first_file = active_files(tbl, snap1)[0]["meta"]["_FILE_NAME"]
    # snapshot 3: delta manifest deletes that file
    entries = [{
        "_KIND": 1, "_PARTITION": b"", "_BUCKET": 0, "_TOTAL_BUCKETS": 1,
        "_FILE": {"_FILE_NAME": first_file, "_FILE_SIZE": 1, "_ROW_COUNT": -1,
                  "_MIN_SEQUENCE_NUMBER": 0, "_MAX_SEQUENCE_NUMBER": 0,
                  "_SCHEMA_ID": 0, "_LEVEL": 0, "_EXTRA_FILES": [],
                  "_CREATION_TIME": 0},
    }]
    mf = f"manifest-{uuid.uuid4()}-0.avro"
    blob = encode_file(_MANIFEST_ENTRY_SCHEMA, entries)
    with open(os.path.join(tbl, "manifest", mf), "wb") as f:
        f.write(blob)
    ml = f"manifest-list-{uuid.uuid4()}-0.avro"
    with open(os.path.join(tbl, "manifest", ml), "wb") as f:
        f.write(encode_file(_MANIFEST_META_SCHEMA, [{
            "_FILE_NAME": mf, "_FILE_SIZE": len(blob),
            "_NUM_ADDED_FILES": 0, "_NUM_DELETED_FILES": 1, "_SCHEMA_ID": 0}]))
    # snapshot 3's base = the full state of snapshot 2 (base + delta)
    from drill_spark.readers.avro import decode_file

    snap2 = load_snapshot(tbl, 2)
    metas = []
    for src in (snap2.get("baseManifestList"), snap2.get("deltaManifestList")):
        with open(os.path.join(tbl, "manifest", src), "rb") as f:
            _, ms = decode_file(f.read())
        metas.extend(ms)
    base = f"manifest-list-{uuid.uuid4()}-0.avro"
    with open(os.path.join(tbl, "manifest", base), "wb") as f:
        f.write(encode_file(_MANIFEST_META_SCHEMA, [
            {k: m.get(k) for k in ("_FILE_NAME", "_FILE_SIZE", "_NUM_ADDED_FILES",
                                   "_NUM_DELETED_FILES", "_SCHEMA_ID")} for m in metas]))
    with open(os.path.join(tbl, "snapshot", "snapshot-3"), "w") as f:
        json.dump({"version": 3, "id": 3, "schemaId": 0,
                   "baseManifestList": base,
                   "deltaManifestList": ml,
                   "commitKind": "COMPACT", "timeMillis": 0}, f)
    with open(os.path.join(tbl, "snapshot", "LATEST"), "w") as f:
        f.write("3")
    # base of snapshot 2 holds file-1's ADD... base+delta(2) also has
    # file 2; deleting file 1 leaves rows 6..8
    assert _rows(read_paimon(spark, tbl)) == [(i,) for i in range(6, 9)]


def test_pk_table_deduplicate_merge(spark, tmp_path):
    """Primary-key table with LSM system columns: the deduplicate
    merge keeps the max-sequence row per key and drops DELETE kinds."""
    tbl = tmp_path / "pk"
    (tbl / "schema").mkdir(parents=True)
    (tbl / "snapshot").mkdir()
    (tbl / "manifest").mkdir()
    (tbl / "bucket-0").mkdir()
    with open(tbl / "schema" / "schema-0", "w") as f:
        json.dump({"version": 3, "id": 0,
                   "fields": [{"id": 0, "name": "k", "type": "BIGINT NOT NULL"},
                              {"id": 1, "name": "v", "type": "STRING"}],
                   "highestFieldId": 1, "partitionKeys": [],
                   "primaryKeys": ["k"],
                   "options": {"file.format": "parquet",
                               "merge-engine": "deduplicate"}}, f)
    # LSM rows: k=1 updated (seq 1 -> 3), k=2 deleted at seq 4, k=3 plain
    rows = [
        (1, "old", 1, 0), (1, "new", 3, 0),
        (2, "gone", 2, 0), (2, None, 4, 3),
        (3, "keep", 5, 0),
    ]
    pdf = spark.createDataFrame(
        rows, "k bigint, v string, _SEQUENCE_NUMBER bigint, _VALUE_KIND int")
    pdf.coalesce(1).write.parquet(str(tbl / "stage"))
    part = next(p for p in os.listdir(tbl / "stage") if p.endswith(".parquet"))
    name = f"data-{uuid.uuid4()}-0.parquet"
    os.replace(tbl / "stage" / part, tbl / "bucket-0" / name)
    entries = [{
        "_KIND": 0, "_PARTITION": b"", "_BUCKET": 0, "_TOTAL_BUCKETS": 1,
        "_FILE": {"_FILE_NAME": name, "_FILE_SIZE": 1, "_ROW_COUNT": 5,
                  "_MIN_SEQUENCE_NUMBER": 1, "_MAX_SEQUENCE_NUMBER": 5,
                  "_SCHEMA_ID": 0, "_LEVEL": 0, "_EXTRA_FILES": [],
                  "_CREATION_TIME": 0}}]
    mf = f"manifest-{uuid.uuid4()}-0.avro"
    blob = encode_file(_MANIFEST_ENTRY_SCHEMA, entries)
    with open(tbl / "manifest" / mf, "wb") as f:
        f.write(blob)
    ml = f"manifest-list-{uuid.uuid4()}-0.avro"
    with open(tbl / "manifest" / ml, "wb") as f:
        f.write(encode_file(_MANIFEST_META_SCHEMA, [{
            "_FILE_NAME": mf, "_FILE_SIZE": len(blob),
            "_NUM_ADDED_FILES": 1, "_NUM_DELETED_FILES": 0, "_SCHEMA_ID": 0}]))
    with open(tbl / "snapshot" / "snapshot-1", "w") as f:
        json.dump({"version": 3, "id": 1, "schemaId": 0,
                   "baseManifestList": None, "deltaManifestList": ml,
                   "commitKind": "APPEND", "timeMillis": 0}, f)
    with open(tbl / "snapshot" / "LATEST", "w") as f:
        f.write("1")
    got = read_paimon(spark, str(tbl))
    assert got.columns == ["k", "v"]
    assert _rows(got) == [(1, "new"), (3, "keep")]


def test_autodetect_via_sqlfront(session, tmp_path):
    tbl = str(tmp_path / "auto")
    write_paimon(session.spark.range(7).select(F.col("id").alias("v")), tbl)
    got = session.sql(f"select count(*) as n from dfs.`{tbl}`")
    assert got.collect()[0]["n"] == 7


def test_not_a_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="not a"):
        read_paimon(spark, str(tmp_path))


def test_paimon_pk_writer_upsert_roundtrip(spark, tmp_path):
    """Primary-key writes: later commits upsert via the LSM system
    columns; delete markers drop keys; time travel sees pre-merge."""
    from drill_spark.readers.paimon import read_paimon, write_paimon

    tbl = str(tmp_path / "pk_tbl")
    write_paimon(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string"),
        tbl, primary_keys=["k"],
    )
    # upsert: update k=2, insert k=4, delete k=3
    write_paimon(
        spark.createDataFrame(
            [(2, "B", "I"), (4, "d", "I"), (3, "c", "D")],
            "k int, v string, op string",
        ),
        tbl, mode="append", primary_keys=["k"], row_kind_col="op",
    )
    got = {(r.k, r.v) for r in read_paimon(spark, tbl).collect()}
    assert got == {(1, "a"), (2, "B"), (4, "d")}
    # snapshot 1 = pre-merge state
    old = {(r.k, r.v) for r in read_paimon(spark, tbl, {"snapshot-id": 1}).collect()}
    assert old == {(1, "a"), (2, "b"), (3, "c")}


def test_paimon_pk_writer_guards(spark, tmp_path):
    import pytest as _pytest

    from drill_spark.readers.paimon import write_paimon

    tbl = str(tmp_path / "pk_guard")
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string")
    with _pytest.raises(ValueError, match="duplicate primary keys"):
        write_paimon(dup, tbl, primary_keys=["k"])
    with _pytest.raises(ValueError, match="not in data"):
        write_paimon(dup, str(tmp_path / "pk2"), primary_keys=["nope"])


def test_paimon_sql_delete_and_update(session, tmp_path):
    """SQL DELETE/UPDATE on paimon PK tables commit LSM delete markers
    / upsert copies; append tables refuse with CTAS guidance."""
    import pytest as _pytest

    from drill_spark.readers.paimon import write_paimon

    spark = session.spark
    session.register_workspace("dfs.pm", str(tmp_path), "parquet", writable=True)
    tbl = str(tmp_path / "t")
    write_paimon(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string"),
        tbl, primary_keys=["k"],
    )
    out = session.sql("DELETE FROM dfs.pm.`t` WHERE k = 2").collect()[0]
    assert out.rows_deleted == 1
    out = session.sql("UPDATE dfs.pm.`t` SET v = concat(v, '!') WHERE k = 3").collect()[0]
    assert out.rows_updated == 1
    got = {(r.k, r.v) for r in session.sql("select * from dfs.pm.`t`").collect()}
    assert got == {(1, "a"), (3, "c!")}
    with _pytest.raises(ValueError, match="primary key column"):
        session.sql("UPDATE dfs.pm.`t` SET k = 9 WHERE k = 1")

    ap = str(tmp_path / "append_t")
    write_paimon(spark.createDataFrame([(1, "x")], "k int, v string"), ap)
    with _pytest.raises(NotImplementedError, match="primary-key"):
        session.sql("DELETE FROM dfs.pm.`append_t` WHERE k = 1")
