"""Avro Object Container File reader/writer.

Cross-validated against the GENUINE Apache Avro Java library
(avro-1.12 on Spark's classpath, driven via py4j): files written by
the JVM are decoded by our pure-Python reader, and files written by
our encoder are read back by the JVM — so the implementation is held
to the public spec, not merely to itself.

Reference parity target: store/avro/AvroBatchReader.java (schema from
file header, per-file scan granularity).
"""

from __future__ import annotations

import datetime
import json
import os

import pytest

from drill_spark.readers.avro import (
    decode_file,
    encode_file,
    read_avro,
    read_avro_schema,
    spark_to_avro_schema,
    write_avro,
)

SCHEMA = {
    "type": "record",
    "name": "ev",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "maybe", "type": ["null", "string"]},
        {"name": "color", "type": {"type": "enum", "name": "col", "symbols": ["RED", "BLUE"]}},
        {"name": "nested", "type": {"type": "record", "name": "sub", "fields": [
            {"name": "x", "type": "int"}, {"name": "y", "type": "float"}]}},
    ],
}

ROWS = [
    {"id": 1, "name": "a", "score": 1.5, "tags": ["t1", "t2"], "props": {"k": 7},
     "maybe": None, "color": "RED", "nested": {"x": 3, "y": 2.5}},
    {"id": 2, "name": "b", "score": -0.25, "tags": [], "props": {},
     "maybe": "yes", "color": "BLUE", "nested": {"x": -4, "y": 0.0}},
]


def _jvm_write(spark, path, schema_json, rows, codec=None):
    """Write a genuine avro file with the Java library via py4j."""
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    if codec:
        writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(schema, jvm.java.io.File(path))
    for row in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        for f in schema.getFields():
            name = f.name()
            v = row[name]
            ftype = json.loads(f.schema().toString())
            if isinstance(ftype, dict) and ftype.get("type") == "array":
                arr = jvm.java.util.ArrayList()
                for item in v:
                    arr.add(item)
                v = arr
            elif isinstance(ftype, dict) and ftype.get("type") == "map":
                m = jvm.java.util.HashMap()
                for k, item in v.items():
                    m.put(k, item)
                v = m
            elif isinstance(ftype, dict) and ftype.get("type") == "enum":
                v = jvm.org.apache.avro.generic.GenericData.EnumSymbol(f.schema(), v)
            elif isinstance(ftype, dict) and ftype.get("type") == "record":
                sub = jvm.org.apache.avro.generic.GenericData.Record(f.schema())
                for sf in f.schema().getFields():
                    sub.put(sf.name(), v[sf.name()])
                v = sub
            rec.put(name, v)
        writer.append(rec)
    writer.close()


def _jvm_read(spark, path):
    """Read an avro file back with the Java library; rows as JSON strings."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    out = []
    while reader.hasNext():
        out.append(json.loads(reader.next().toString()))
    reader.close()
    return out


def test_decode_jvm_written_file(spark, tmp_path):
    p = str(tmp_path / "jvm.avro")
    _jvm_write(spark, p, json.dumps(SCHEMA), ROWS)
    schema, records = decode_file(open(p, "rb").read())
    assert schema["name"] == "ev"
    assert records[0]["id"] == 1 and records[0]["maybe"] is None
    assert records[0]["tags"] == ["t1", "t2"] and records[0]["props"] == {"k": 7}
    assert records[1]["maybe"] == "yes" and records[1]["color"] == "BLUE"
    assert records[0]["nested"] == {"x": 3, "y": 2.5}


def test_decode_jvm_deflate_codec(spark, tmp_path):
    p = str(tmp_path / "jvm_deflate.avro")
    _jvm_write(spark, p, json.dumps(SCHEMA), ROWS, codec="deflate")
    _, records = decode_file(open(p, "rb").read())
    assert [r["id"] for r in records] == [1, 2]


def test_jvm_reads_our_encoder(spark, tmp_path):
    p = str(tmp_path / "ours.avro")
    with open(p, "wb") as f:
        f.write(encode_file(SCHEMA, ROWS))
    back = _jvm_read(spark, p)
    assert back[0]["id"] == 1 and back[0]["name"] == "a"
    assert back[1]["maybe"] == "yes"
    assert back[0]["nested"] == {"x": 3, "y": 2.5}


def test_logical_types_roundtrip(tmp_path):
    sch = {"type": "record", "name": "t", "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
    ]}
    rows = [{"d": datetime.date(2020, 2, 29),
             "ts": datetime.datetime(2021, 6, 1, 12, 30, 0, 123456)}]
    _, back = decode_file(encode_file(sch, rows))
    assert back == rows


def test_read_avro_distributed(spark, tmp_path):
    p = str(tmp_path / "jvm.avro")
    _jvm_write(spark, p, json.dumps(SCHEMA), ROWS)
    df = read_avro(spark, p)
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["name"] == "a" and got[2]["maybe"] == "yes"
    assert got[1]["tags"] == ["t1", "t2"]
    assert dict(got[1]["props"]) == {"k": 7}
    _, st = read_avro_schema(p)
    assert [f.name for f in st.fields] == [f["name"] for f in SCHEMA["fields"]]


def test_write_avro_distributed_roundtrip(spark, tmp_path):
    src = spark.range(100).selectExpr(
        "id", "cast(id as string) as s", "cast(id * 0.5 as double) as v"
    ).repartition(4)
    out = str(tmp_path / "out")
    files = write_avro(src, out)
    assert 1 <= len(files) <= 4 and all(f.endswith(".avro") for f in files)
    back = read_avro(spark, out)
    assert back.count() == 100
    assert back.selectExpr("sum(id) as t").head()["t"] == 4950
    # the JVM library accepts every part file we wrote
    assert sum(len(_jvm_read(spark, f)) for f in files) == 100


def test_spark_to_avro_schema_maps_core_types(spark):
    df = spark.range(1).selectExpr(
        "id", "cast(id as string) s", "cast(id as double) d",
        "array(1L, 2L) arr", "named_struct('a', 1) st"
    )
    sch = spark_to_avro_schema(df.schema)
    by_name = {f["name"]: f["type"] for f in sch["fields"]}
    assert by_name["id"] == ["null", "long"]
    assert by_name["arr"][1]["type"] == "array"
    assert by_name["st"][1]["type"] == "record"


def test_sqlfront_avro_path(session, tmp_path):
    p = str(tmp_path / "t.avro")
    sch = {"type": "record", "name": "t", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    with open(p, "wb") as f:
        f.write(encode_file(sch, [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]))
    rows = session.sql(f"select b from dfs.`{p}` where a = 2").collect()
    assert [r["b"] for r in rows] == ["y"]


def test_unsupported_union_errors(tmp_path):
    sch = {"type": "record", "name": "t", "fields": [
        {"name": "u", "type": ["int", "string"]}]}
    from drill_spark.readers.avro import _avro_to_spark_type

    with pytest.raises(NotImplementedError):
        _avro_to_spark_type(sch)


def test_range_split_contract(tmp_path):
    """Hadoop-style sync-split ownership: for ANY adjoining split grid,
    every block is decoded exactly once (no duplicates, no gaps)."""
    from drill_spark.readers.avro import decode_range, encode_file

    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "i", "type": "long"}, {"name": "s", "type": "string"}],
    }
    recs = [{"i": i, "s": "x" * 50} for i in range(5000)]
    p = tmp_path / "split.avro"
    p.write_bytes(encode_file(schema, recs, block_bytes=1 << 12))
    size = p.stat().st_size
    for n in (1, 2, 5, 13, 32):
        bounds = [size * i // n for i in range(n + 1)]
        got = [
            r["i"]
            for i in range(n)
            for r in decode_range(str(p), bounds[i], bounds[i + 1])[1]
        ]
        assert got == list(range(5000)), f"{n} splits: {len(got)} records"


def test_read_avro_splits_large_file(spark, tmp_path):
    """read_avro fans a single large file out over multiple byte-range
    tasks and still returns every row exactly once."""
    from drill_spark.readers.avro import encode_file, read_avro

    schema = {"type": "record", "name": "r", "fields": [{"name": "i", "type": "long"}]}
    p = tmp_path / "big.avro"
    p.write_bytes(encode_file(schema, ({"i": i} for i in range(30000)), block_bytes=1 << 12))
    df = read_avro(spark, str(p), split_bytes=1 << 16)  # force many splits
    assert df.count() == 30000
    assert df.agg({"i": "sum"}).head()[0] == 30000 * 29999 // 2
