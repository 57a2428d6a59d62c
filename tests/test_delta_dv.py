"""Delta deletion vectors + column mapping (reference reads these via
delta-standalone inside contrib/format-deltalake/; here the published
PROTOCOL.md formats are decoded directly — readers/delta_dv.py).

Codec tests exercise the spec's RoaringBitmapArray framing (Z85, array
/ bitset / run containers, 64-bit bitmap groups); reader tests use
hand-written logs where reader semantics are under test, so the reader
is validated against the spec, not against our own writer."""

from __future__ import annotations

import json
import os
import struct

import pytest
from pyspark.sql import functions as F

from drill_spark.readers.delta import delete_where, read_delta, write_delta
from drill_spark.readers.delta_dv import (
    deserialize_bitmap_array,
    read_descriptor,
    serialize_bitmap_array,
    write_dv_file,
    z85_decode,
    z85_encode,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------------- codec


def test_z85_roundtrip():
    for data in (b"", b"\x00\x00\x00\x00", os.urandom(16), bytes(range(32, 52))):
        assert z85_decode(z85_encode(data)) == data
    # the ZeroMQ RFC's own test vector
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"


@pytest.mark.parametrize(
    "values",
    [
        [],
        [0],
        [0, 1, 2, 65535, 65536, 1 << 20],
        list(range(5000)),  # > 4096 cardinality -> bitset container
        [7, (3 << 32) | 9, (3 << 32) | 10],  # 64-bit groups with gaps
    ],
)
def test_bitmap_array_roundtrip(values):
    assert deserialize_bitmap_array(serialize_bitmap_array(values)) == sorted(set(values))


def test_run_container_decode():
    """Hand-build a cookie-12346 run-container bitmap (our serializer
    never emits runs, but real writers do) and decode it."""
    n = 1
    cookie = struct.pack("<I", 12346 | ((n - 1) << 16))
    run_flags = b"\x01"  # container 0 is a run container
    desc = struct.pack("<HH", 5, 11 - 1)  # key=5, cardinality 11
    body = struct.pack("<H", 2) + struct.pack("<HH", 10, 4) + struct.pack("<HH", 100, 5)
    buf = struct.pack("<iq", 1681511377, 1) + cookie + run_flags + desc + body
    got = deserialize_bitmap_array(buf)
    hi = 5 << 16
    assert got == [hi | v for v in list(range(10, 15)) + list(range(100, 106))]


def test_dv_file_roundtrip(tmp_path):
    idx = [0, 3, 7, 100_000, (2 << 32) | 5]
    desc = write_dv_file(str(tmp_path), idx)
    assert desc["storageType"] == "u" and desc["cardinality"] == 5
    assert read_descriptor(str(tmp_path), desc) == sorted(idx)


def test_dv_checksum_guard(tmp_path):
    desc = write_dv_file(str(tmp_path), [1, 2, 3])
    # corrupt the payload byte after the size header
    fname = next(f for f in os.listdir(tmp_path) if f.startswith("deletion_vector_"))
    p = os.path.join(tmp_path, fname)
    blob = bytearray(open(p, "rb").read())
    blob[6] ^= 0xFF
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        read_descriptor(str(tmp_path), desc)


# ------------------------------------------------------------- reader


def test_delete_where_merge_on_read(spark, tmp_path):
    tbl = str(tmp_path / "t")
    write_delta(spark.range(100).select("id", (F.col("id") % 10).alias("k")), tbl)
    assert delete_where(spark, tbl, "k = 3") == 10
    got = read_delta(spark, tbl)
    assert got.count() == 90 and got.where("k = 3").count() == 0
    # second delete unions into the existing DVs (10 new rows only)
    assert delete_where(spark, tbl, "k in (3, 7)") == 10
    assert read_delta(spark, tbl).count() == 80
    # pre-delete version still sees everything
    assert read_delta(spark, tbl, {"versionAsOf": 0}).count() == 100


def test_delete_where_partitioned(spark, tmp_path):
    tbl = str(tmp_path / "p")
    write_delta(
        spark.range(60).select("id", (F.col("id") % 3).alias("part")),
        tbl,
        partition_by=["part"],
    )
    assert delete_where(spark, tbl, "id % 2 = 0") == 30
    got = read_delta(spark, tbl)
    assert got.count() == 30 and got.where("id % 2 = 0").count() == 0
    # partition values still attach on the DV branch
    assert _rows(got.groupBy("part").count()) == [(0, 10), (1, 10), (2, 10)]


def test_dv_inline_descriptor(spark, tmp_path):
    """storageType "i": the bitmap Z85-inlined in the descriptor itself
    (hand-written log — reader vs spec)."""
    tbl = tmp_path / "inline"
    log = tbl / "_delta_log"
    log.mkdir(parents=True)
    spark.range(10).coalesce(1).write.parquet(str(tbl / "d"))
    f1 = next("d/" + f for f in os.listdir(tbl / "d") if f.endswith(".parquet"))
    data = serialize_bitmap_array([0, 2, 4])
    pad = (-len(data)) % 4
    desc = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
        "offset": None,
        "sizeInBytes": len(data),
        "cardinality": 3,
    }
    schema = spark.range(1).schema.json()
    with open(log / f"{0:020d}.json", "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                                         "readerFeatures": ["deletionVectors"],
                                         "writerFeatures": ["deletionVectors"]}}) + "\n")
        f.write(json.dumps({"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                                         "schemaString": schema, "partitionColumns": []}}) + "\n")
        f.write(json.dumps({"add": {"path": f1, "partitionValues": {}, "size": 1,
                                    "modificationTime": 0, "dataChange": True,
                                    "deletionVector": desc}}) + "\n")
    got = read_delta(spark, str(tbl))
    # rows 0,2,4 of the single sorted-by-write-order file are deleted
    assert got.count() == 7


def test_dv_update_reconciliation_order(spark, tmp_path):
    """A DV update commit carries add(path,newDV) BEFORE remove(path,
    oldDV); keying by (path, dvId) must keep the new entry."""
    tbl = tmp_path / "recon"
    log = tbl / "_delta_log"
    log.mkdir(parents=True)
    spark.range(10).coalesce(1).write.parquet(str(tbl / "d"))
    f1 = next("d/" + f for f in os.listdir(tbl / "d") if f.endswith(".parquet"))
    old_desc = write_dv_file(str(tbl), [0])
    new_desc = write_dv_file(str(tbl), [0, 1, 2])
    schema = spark.range(1).schema.json()
    base = {"path": f1, "partitionValues": {}, "size": 1, "modificationTime": 0,
            "dataChange": True}
    with open(log / f"{0:020d}.json", "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                                         "readerFeatures": ["deletionVectors"],
                                         "writerFeatures": ["deletionVectors"]}}) + "\n")
        f.write(json.dumps({"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                                         "schemaString": schema, "partitionColumns": []}}) + "\n")
        f.write(json.dumps({"add": {**base, "deletionVector": old_desc}}) + "\n")
    with open(log / f"{1:020d}.json", "w") as f:
        f.write(json.dumps({"add": {**base, "deletionVector": new_desc}}) + "\n")
        f.write(json.dumps({"remove": {**base, "deletionVector": old_desc}}) + "\n")
    assert read_delta(spark, str(tbl)).count() == 7


def test_column_mapping_name_mode(spark, tmp_path):
    """delta.columnMapping.mode=name: parquet stores physical col-UUID
    names; the reader must restore logical names (hand-written log)."""
    tbl = tmp_path / "cm"
    log = tbl / "_delta_log"
    log.mkdir(parents=True)
    phys = spark.createDataFrame(
        [(1, "a"), (2, "b")], "`col-9cafda1&` int, `col-77b2df1%` string"
    )
    phys.coalesce(1).write.parquet(str(tbl / "d"))
    f1 = next("d/" + f for f in os.listdir(tbl / "d") if f.endswith(".parquet"))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "integer", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-9cafda1&"}},
            {"name": "name", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-77b2df1%"}},
        ],
    }
    with open(log / f"{0:020d}.json", "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"}}}) + "\n")
        f.write(json.dumps({"add": {"path": f1, "partitionValues": {}, "size": 1,
                                    "modificationTime": 0, "dataChange": True}}) + "\n")
    got = read_delta(spark, str(tbl))
    assert got.columns == ["id", "name"]
    assert _rows(got) == [(1, "a"), (2, "b")]


def test_column_mapping_partitioned(spark, tmp_path):
    """Column mapping + partition columns: add.partitionValues is keyed
    by the PHYSICAL name; values must land under the logical column."""
    tbl = tmp_path / "cmp"
    log = tbl / "_delta_log"
    log.mkdir(parents=True)
    phys = spark.createDataFrame([(1,), (2,)], "`col-aa` int")
    phys.coalesce(1).write.parquet(str(tbl / "d"))
    f1 = next("d/" + f for f in os.listdir(tbl / "d") if f.endswith(".parquet"))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "v", "type": "integer", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aa"}},
            {"name": "region", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bb"}},
        ],
    }
    with open(log / f"{0:020d}.json", "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": ["region"],
            "configuration": {"delta.columnMapping.mode": "name"}}}) + "\n")
        f.write(json.dumps({"add": {"path": f1, "partitionValues": {"col-bb": "emea"},
                                    "size": 1, "modificationTime": 0,
                                    "dataChange": True}}) + "\n")
    got = read_delta(spark, str(tbl))
    assert got.columns == ["v", "region"]
    assert _rows(got) == [(1, "emea"), (2, "emea")]


def test_v2_checkpoint_with_sidecars(spark, tmp_path):
    """V2 checkpoint layout: a UUID-named checkpoint parquet whose
    add actions live in _sidecars files referenced by sidecar actions
    (hand-written per the protocol's V2 Checkpoint spec)."""
    import uuid as _uuid

    tbl = tmp_path / "v2ck"
    log = tbl / "_delta_log"
    side = log / "_sidecars"
    side.mkdir(parents=True)
    spark.range(4).coalesce(1).write.parquet(str(tbl / "d1"))
    spark.range(4, 9).coalesce(1).write.parquet(str(tbl / "d2"))
    f1 = next("d1/" + f for f in os.listdir(tbl / "d1") if f.endswith(".parquet"))
    f2 = next("d2/" + f for f in os.listdir(tbl / "d2") if f.endswith(".parquet"))
    schema = spark.range(1).schema.json()

    add_schema = ("add struct<path:string,partitionValues:map<string,string>,"
                  "size:long,modificationTime:long,dataChange:boolean>")
    sc_name = f"{_uuid.uuid4()}.parquet"
    rows = [{"add": {"path": p, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}} for p in (f1, f2)]
    spark.createDataFrame(rows, add_schema).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "scraw"))
    part = next(f for f in os.listdir(tmp_path / "scraw") if f.endswith(".parquet"))
    os.rename(tmp_path / "scraw" / part, side / sc_name)

    ck_schema = ("metaData struct<id:string,format:struct<provider:string,"
                 "options:map<string,string>>,schemaString:string,"
                 "partitionColumns:array<string>>,"
                 "protocol struct<minReaderVersion:int,minWriterVersion:int,"
                 "readerFeatures:array<string>,writerFeatures:array<string>>,"
                 "sidecar struct<path:string,sizeInBytes:long>")
    ck_rows = [
        {"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema, "partitionColumns": []}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint"],
                      "writerFeatures": ["v2Checkpoint"]}},
        {"sidecar": {"path": sc_name, "sizeInBytes": 1}},
    ]
    spark.createDataFrame(ck_rows, ck_schema).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "ckraw"))
    part = next(f for f in os.listdir(tmp_path / "ckraw") if f.endswith(".parquet"))
    os.rename(tmp_path / "ckraw" / part, log / f"{1:020d}.checkpoint.{_uuid.uuid4()}.parquet")
    with open(log / "_last_checkpoint", "w") as f:
        json.dump({"version": 1, "size": 3}, f)

    got = read_delta(spark, str(tbl))
    assert sorted(r[0] for r in got.collect()) == list(range(9))


def test_delete_where_partition_predicate(spark, tmp_path):
    """DELETE conditions may reference partition columns (values
    re-attached via the broadcast path map before the filter)."""
    tbl = str(tmp_path / "pp")
    write_delta(
        spark.range(30).select("id", (F.col("id") % 3).alias("part")),
        tbl,
        partition_by=["part"],
    )
    assert delete_where(spark, tbl, "part = 1 and id < 20") == 7
    got = read_delta(spark, tbl)
    assert got.count() == 23
    assert got.where("part = 1").count() == 3  # ids 22, 25, 28


def test_delete_where_many_files_executor_side(spark, tmp_path):
    """DELETE over a many-file table: the DV bitmaps are built by the
    groupBy-file applyInPandas stage on the executors (the driver sees
    only per-file descriptors), and a second DELETE unions into the
    executor-written DVs correctly."""
    tbl = str(tmp_path / "many")
    write_delta(
        spark.range(2000).repartition(20).select("id", (F.col("id") % 10).alias("k")),
        tbl,
    )
    import glob

    assert len(glob.glob(os.path.join(tbl, "*.parquet"))) >= 20
    assert delete_where(spark, tbl, "k in (1, 2, 3)") == 600
    got = read_delta(spark, tbl)
    assert got.count() == 1400 and got.where("k in (1,2,3)").count() == 0
    # union path: k=3 already deleted, only k=4 rows are new
    assert delete_where(spark, tbl, "k in (3, 4)") == 200
    assert read_delta(spark, tbl).count() == 1200


def test_bitmap_exact_4096_boundary():
    """Cardinality exactly 4096 sits on the array/bitset container
    boundary; the spec (and our reader) treat <=4096 as an array
    container, so the writer must too — a delete matching every 16th
    row of a 65536-row file produces exactly this shape."""
    vals = list(range(4096))
    assert deserialize_bitmap_array(serialize_bitmap_array(vals)) == vals
    mixed = list(range(4096)) + [(1 << 32) | 7]  # boundary group + next bitmap
    assert deserialize_bitmap_array(serialize_bitmap_array(mixed)) == sorted(mixed)


def test_remove_without_dv_cancels_only_plain_add(spark, tmp_path):
    """remove(path, dv=null) must cancel only add(path, dv=null): a
    commit attaching a DV to a plain file may order add(path, newDV)
    before remove(path, null) — the file must survive with the DV."""
    tbl = tmp_path / "plainrm"
    log = tbl / "_delta_log"
    log.mkdir(parents=True)
    spark.range(10).coalesce(1).write.parquet(str(tbl / "d"))
    f1 = next("d/" + f for f in os.listdir(tbl / "d") if f.endswith(".parquet"))
    dv = write_dv_file(str(tbl), [0, 1, 2])
    schema = spark.range(1).schema.json()
    base = {"path": f1, "partitionValues": {}, "size": 1, "modificationTime": 0,
            "dataChange": True}
    with open(log / f"{0:020d}.json", "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                                         "readerFeatures": ["deletionVectors"],
                                         "writerFeatures": ["deletionVectors"]}}) + "\n")
        f.write(json.dumps({"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                                         "schemaString": schema, "partitionColumns": []}}) + "\n")
        f.write(json.dumps({"add": base}) + "\n")
    with open(log / f"{1:020d}.json", "w") as f:
        # spec-legal ordering hazard: the add precedes the remove
        f.write(json.dumps({"add": {**base, "deletionVector": dv}}) + "\n")
        f.write(json.dumps({"remove": {**base, "deletionTimestamp": 0}}) + "\n")
    assert read_delta(spark, str(tbl)).count() == 7


def test_delete_where_merges_existing_protocol(spark, tmp_path):
    """delete_where must union deletionVectors into the table's existing
    protocol, not replace it — prior feature declarations (timestampNtz
    here) and legacy implied writer features must survive."""
    from drill_spark.readers.delta import load_snapshot

    tbl = str(tmp_path / "proto")
    write_delta(spark.range(20).select("id", (F.col("id") % 2).alias("k")), tbl)
    commit0 = os.path.join(tbl, "_delta_log", f"{0:020d}.json")
    lines = open(commit0).read().splitlines()
    out = []
    for ln in lines:
        a = json.loads(ln)
        if "protocol" in a:
            a["protocol"] = {"minReaderVersion": 3, "minWriterVersion": 7,
                             "readerFeatures": ["timestampNtz"],
                             "writerFeatures": ["timestampNtz", "appendOnly"]}
        out.append(json.dumps(a))
    open(commit0, "w").write("\n".join(out) + "\n")
    assert delete_where(spark, tbl, "k = 1") == 10
    proto = load_snapshot(spark, tbl).protocol
    assert set(proto["readerFeatures"]) == {"timestampNtz", "deletionVectors"}
    assert {"timestampNtz", "appendOnly", "deletionVectors"} <= set(proto["writerFeatures"])


def test_delete_where_upgrades_legacy_protocol(spark, tmp_path):
    """Upgrading a legacy (1,2) protocol to table features materializes
    the implied writer features (appendOnly, invariants)."""
    from drill_spark.readers.delta import load_snapshot

    tbl = str(tmp_path / "legacy")
    write_delta(spark.range(10).select("id", (F.col("id") % 2).alias("k")), tbl)
    assert delete_where(spark, tbl, "k = 0") == 5
    proto = load_snapshot(spark, tbl).protocol
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "deletionVectors" in proto["readerFeatures"]
    assert {"appendOnly", "invariants", "deletionVectors"} <= set(proto["writerFeatures"])


@pytest.mark.parametrize("dirname", ["sp ace", "plu+s", "pct%20"])
def test_dv_on_table_path_with_special_chars(spark, tmp_path, dirname):
    """Spark URI-encodes _metadata.file_path (space -> %20); the DV
    anti-join keys must still match log-derived raw paths — and a
    literal `+` or `%` in the path must not be mangled by the decode."""
    tbl = str(tmp_path / dirname)
    write_delta(spark.range(40).select("id", (F.col("id") % 4).alias("k")), tbl)
    assert delete_where(spark, tbl, "k = 2") == 10
    got = read_delta(spark, tbl)
    assert got.count() == 30 and got.where("k = 2").count() == 0


def test_bitmap_array_roundtrip_property():
    """Property: any 64-bit index set survives the RoaringBitmapArray
    codec (array, bitset and multi-group paths hit by construction)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    idx = st.sets(st.integers(min_value=0, max_value=(1 << 40) - 1), max_size=300)

    @settings(max_examples=60, deadline=None)
    @given(idx)
    def check(values):
        assert deserialize_bitmap_array(serialize_bitmap_array(values)) == sorted(values)

    check()


def test_z85_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=64).filter(lambda b: len(b) % 4 == 0))
    def check(data):
        assert z85_decode(z85_encode(data)) == data

    check()


def _make_cm_table(spark, tbl):
    """Hand-written name-mode column-mapped table: logical (id, name),
    physical col-UUID names, 6 rows."""
    import json
    import os

    log = tbl / "_delta_log"
    log.mkdir(parents=True)
    phys = spark.createDataFrame(
        [(i, chr(97 + i)) for i in range(6)],
        "`col-9cafda1&` int, `col-77b2df1%` string",
    )
    phys.coalesce(1).write.parquet(str(tbl / "d"))
    f1 = next("d/" + f for f in os.listdir(tbl / "d") if f.endswith(".parquet"))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "integer", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-9cafda1&"}},
            {"name": "name", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-77b2df1%"}},
        ],
    }
    with open(log / f"{0:020d}.json", "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 2,
                                         "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"}}}) + "\n")
        f.write(json.dumps({"add": {"path": f1, "partitionValues": {}, "size": 1,
                                    "modificationTime": 0,
                                    "dataChange": True}}) + "\n")


def test_column_mapped_dml_name_mode(spark, tmp_path):
    """DELETE / UPDATE / MERGE on a name-mode column-mapped table
    (formerly gated): conditions use LOGICAL names, new data files are
    written under PHYSICAL names, and the reader keeps restoring the
    logical view after every commit."""
    from drill_spark.readers.delta import delete_where, merge_into, update_where

    tbl = tmp_path / "cm_dml"
    _make_cm_table(spark, tbl)
    path = str(tbl)

    assert delete_where(spark, path, "id = 5") == 1
    assert sorted(r.id for r in read_delta(spark, path).collect()) == [0, 1, 2, 3, 4]

    assert update_where(spark, path, "id >= 3", {"name": "upper(name)"}) == 2
    got = {r.id: r.name for r in read_delta(spark, path).collect()}
    assert got == {0: "a", 1: "b", 2: "c", 3: "D", 4: "E"}

    src = spark.createDataFrame([(4, "zz"), (100, "new")], "id int, name string")
    stats = merge_into(
        spark, path, src, "t.id = src.id",
        when_matched_update={"name": "src.name"},
        when_not_matched_insert={"id": "src.id", "name": "src.name"},
    )
    assert stats == {"updated": 1, "deleted": 0, "inserted": 1}
    got = {r.id: r.name for r in read_delta(spark, path).collect()}
    assert got == {0: "a", 1: "b", 2: "c", 3: "D", 4: "zz", 100: "new"}
    # the new data files really carry physical names
    import pyarrow.parquet as pq

    new_parts = [f for f in os.listdir(tbl) if f.endswith(".parquet")]
    assert new_parts, "expected appended physical-named files at table root"
    cols = pq.read_schema(str(tbl / new_parts[0])).names
    assert "col-9cafda1&" in cols and "id" not in cols


def test_column_mapped_optimize_and_id_mode_dml(spark, tmp_path):
    from drill_spark.readers.delta import delete_where, load_snapshot, optimize, update_where

    tbl = tmp_path / "cm_opt"
    _make_cm_table(spark, tbl)
    path = str(tbl)
    assert delete_where(spark, path, "id % 2 = 0") == 3
    stats = optimize(spark, path, small_file_bytes=1024 * 1024)
    assert stats["rewritten"] >= 1
    snap = load_snapshot(spark, path)
    assert not any(e.get("dv") for e in snap.files.values())
    assert sorted(r.id for r in read_delta(spark, path).collect()) == [1, 3, 5]

    # id mode (r6, formerly gated): writes attach parquet field ids
    # from delta.columnMapping.id, so an id-matching reader resolves
    # the rewritten files; conditions still use logical names
    commits = sorted((tbl / "_delta_log").glob("*.json"))
    lines = []
    for line in commits[0].read_text().splitlines():
        a = json.loads(line)
        if "metaData" in a:
            a["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
        lines.append(json.dumps(a))
    commits[0].write_text("\n".join(lines) + "\n")
    before = {f for f in os.listdir(tbl) if f.endswith(".parquet")}
    assert update_where(spark, path, "id = 1", {"name": "'x'"}) == 1
    got = {r.id: r.name for r in read_delta(spark, path).collect()}
    assert got[1] == "x" and sorted(got) == [1, 3, 5]
    import pyarrow.parquet as pq

    new_files = [f for f in os.listdir(tbl)
                 if f.endswith(".parquet") and f not in before]
    assert new_files
    sch = pq.read_schema(str(tbl / new_files[0]))
    fids = {f.name: (f.metadata or {}).get(b"PARQUET:field_id")
            for f in sch}
    assert fids.get("col-9cafda1&") == b"1"  # physical name + field id
