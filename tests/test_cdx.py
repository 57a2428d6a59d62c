"""CDXJ capture index (readers/cdx.py): sorted shard layout +
cluster.idx, point lookup, single-member ranged fetch."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from drill_spark.readers.cdx import (
    cdx_lookup,
    fetch_record,
    generate_cdx,
    read_cdx,
    surt_key,
)
from drill_spark.readers.warc import write_warc


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    pages = spark.createDataFrame(
        [(f"https://h{i % 9}.example/p/{i}", f"cdx body {i}")
         for i in range(90)],
        "target_uri string, text string",
    )
    src = str(tmp_path_factory.mktemp("cdx") / "crawl")
    write_warc(pages.repartition(3), src)
    out = src + "_cdx"
    stats = generate_cdx(spark, src, out, shards=4)
    return src, out, stats


def test_surt_key(spark):
    df = spark.createDataFrame(
        [("https://www.Sub.Example.COM/a/b?q=1",),
         ("http://example.com",)], "url string")
    keys = [r.k for r in df.select(surt_key(F.col("url")).alias("k")).collect()]
    assert keys == ["com,example,sub)/a/b", "com,example)/"]


def test_generate_layout_and_sorted_shards(crawl, spark):
    src, out, stats = crawl
    assert stats["records"] == 90 and 1 <= stats["shards"] <= 4
    assert os.path.exists(os.path.join(out, "cluster.idx"))
    idx = read_cdx(spark, out)
    assert idx.count() == 90
    # keys must be globally ordered across the range-partitioned shards
    with open(os.path.join(out, "cluster.idx")) as f:
        firsts = [ln.split("\t")[0] for ln in f]
    assert firsts == sorted(firsts)
    rows = idx.collect()
    assert all(r.offset is not None and r.length > 0 for r in rows)


def test_lookup_and_fetch_roundtrip(crawl):
    src, out, _ = crawl
    hits = cdx_lookup(out, "https://h3.example/p/3")
    assert len(hits) == 1
    h = hits[0]
    assert h["status"] == "200"
    rec = fetch_record(os.path.join(src, h["filename"]), int(h["offset"]))
    assert rec["target_uri"] == "https://h3.example/p/3"
    assert bytes(rec["payload"]) == b"cdx body 3"
    assert rec["record_length"] == int(h["length"])


def test_lookup_misses_cleanly(crawl):
    _, out, _ = crawl
    assert cdx_lookup(out, "https://nowhere.example/x") == []


def test_surt_key_py_matches_catalyst_for_ported_urls(spark):
    """Driver-side lookup key must equal the Catalyst surt_key for
    every URL shape — explicit ports were the historical divergence
    (the port must vanish from BOTH host labels and path)."""
    from drill_spark.readers.cdx import surt_key_py

    urls = [
        "https://www.Sub.Example.COM/a/b?q=1",
        "http://example.com",
        "http://example.com:8080/with/port?x=1",
        "https://www.example.com:443/",
        "http://h1.example:8000",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    catalyst = [r.k for r in
                df.select(surt_key(F.col("url")).alias("k")).collect()]
    assert [surt_key_py(u) for u in urls] == catalyst


def test_lookup_finds_ported_url(spark, tmp_path):
    pages = spark.createDataFrame(
        [("http://ported.example:8080/x/y", "ported body")],
        "target_uri string, text string")
    src = str(tmp_path / "crawl")
    write_warc(pages, src)
    out = src + "_cdx"
    generate_cdx(spark, src, out, shards=2)
    hits = cdx_lookup(out, "http://ported.example:8080/x/y")
    assert len(hits) == 1
    rec = fetch_record(os.path.join(src, hits[0]["filename"]),
                       int(hits[0]["offset"]))
    assert bytes(rec["payload"]) == b"ported body"
