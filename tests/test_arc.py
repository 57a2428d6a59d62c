"""ARC legacy web-archive reader tests (readers/arc.py) — shares the
gzip-member split machinery with warc.py; only the validator differs."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from drill_spark.readers.arc import (
    _arc_header_fields,
    _arc_prefix_ok,
    read_arc,
    write_arc,
)


def _pages(spark, n=60):
    return spark.createDataFrame(
        [(f"http://ex.org/a/{i}", f"arc body {i} " * (i % 5 + 1))
         for i in range(n)],
        "url string, text string",
    )


def test_arc_roundtrip_and_envelope(spark, tmp_path):
    d = str(tmp_path / "arc")
    write_arc(_pages(spark).repartition(2), d)
    df = read_arc(spark, d)
    recs = df.filter(~F.col("url").startswith("filedesc://"))
    assert recs.count() == 60
    assert df.filter(F.col("url").startswith("filedesc://")).count() == 2
    row = recs.orderBy("url").first()
    assert row["http_status"] == 200
    assert row["http_content_type"].startswith("text/html")
    assert not bytes(row["payload"]).startswith(b"HTTP/")
    assert row["arc_date"] is not None and row["ip"] == "127.0.0.1"
    got = {r["url"]: bytes(r["payload"]).decode() for r in recs.collect()}
    want = {r["url"]: r["text"] for r in _pages(spark).collect()}
    assert got == want


def test_arc_tiny_splits_exactly_once(spark, tmp_path):
    d = str(tmp_path / "arc")
    write_arc(_pages(spark).repartition(2), d)
    df = read_arc(spark, d, split_bytes=512)
    assert df.count() == 62
    assert df.select("url", "record_offset").distinct().count() == 62


def test_arc_plain_uncompressed(spark, tmp_path):
    d = str(tmp_path / "plain")
    write_arc(_pages(spark, 10), d, compress=False)
    df = read_arc(spark, d)
    assert df.filter(~F.col("url").startswith("filedesc://")).count() == 10


def test_arc_v2_header_and_validator():
    v1 = b"http://ex.org/x 1.2.3.4 20200101000000 text/html 42"
    v2 = (b"http://ex.org/x 1.2.3.4 20200101000000 text/html 200 "
          b"checksum loc 0 f.arc 42")
    assert _arc_header_fields(v1) is not None
    assert _arc_header_fields(v2) is not None
    assert _arc_header_fields(b"not a header line") is None
    assert _arc_header_fields(b"a b c d e f") is None
    assert _arc_prefix_ok(v1 + b"\npayload")
    assert not _arc_prefix_ok(b"random text\nmore")


def test_arc_gz_magic_false_positive_in_payload(spark, tmp_path):
    inner = gzip.compress(b"http://fake/ 1.1.1.1 20200101000000 x/y 3\nabc")
    payload = b"A" * 50 + inner + b"B" * 50
    df = spark.createDataFrame([("http://ex.org/fp", bytearray(payload))],
                               "url string, payload binary")
    d = str(tmp_path / "fp")
    write_arc(df, d)
    for split in (1 << 20, 64):
        out = read_arc(spark, d, split_bytes=split)
        rows = out.filter(~F.col("url").startswith("filedesc://")).collect()
        assert len(rows) == 1
        assert bytes(rows[0]["payload"]) == payload


def test_arc_sql_suffix_inference(session, spark, tmp_path):
    d = str(tmp_path / "sqlarc")
    write_arc(_pages(spark, 4), d)
    n = session.sql(
        f"select count(*) as n from dfs.`{d}` "
        "where url not like 'filedesc://%'"
    ).collect()[0]["n"]
    assert n == 4
