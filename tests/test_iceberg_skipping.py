"""Iceberg manifest-stats file skipping (readers/iceberg_stats.py +
iceberg.py wiring).

The contract under test: (1) every data_file manifest entry written by
this repo's Iceberg writers (CTAS, append, DML rewrite, compaction)
carries footer-derived lower/upper bounds, null and value counts in
the spec's single-value serialization; (2) a `predicate` read option
prunes the data-file list during metadata-only scan planning, with
bit-exact results (entries without stats kept, unparseable predicates
prune nothing); (3) identity partition values prune even without
bounds. Reference parity: contrib/storage-iceberg delegates the same
planning to iceberg-core's planFiles()/InclusiveMetricsEvaluator.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from drill_spark.readers.avro import decode_file
from drill_spark.readers.iceberg import (
    append_iceberg,
    read_iceberg,
    skipping_report,
    update_where,
    write_iceberg,
)
from drill_spark.readers.iceberg_stats import decode_single, encode_single


def _entries(table):
    """All manifest entries of the CURRENT snapshot, decoded."""
    import json

    mdir = os.path.join(table, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        v = f.read().strip()
    with open(os.path.join(mdir, f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    with open(snap["manifest-list"], "rb") as f:
        _, manifests = decode_file(f.read())
    out = []
    for m in manifests:
        with open(m["manifest_path"], "rb") as f:
            _, rows = decode_file(f.read())
        out.extend(rows)
    return out


# ---------------------------------------------- single-value serde


@pytest.mark.parametrize("t,v", [
    ("boolean", True),
    ("boolean", False),
    ("int", -123456),
    ("long", 2**40 + 17),
    ("float", 1.5),
    ("double", -2.75e10),
    ("string", "hello wörld"),
])
def test_single_value_roundtrip(t, v):
    b = encode_single(t, v)
    assert b is not None
    assert decode_single(t, b) == v


def test_single_value_date_timestamp():
    d = datetime.date(2024, 3, 1)
    assert decode_single("date", encode_single("date", d)) == "2024-03-01"
    ts = datetime.datetime(2024, 3, 1, 12, 30, 45, 250000)
    out = decode_single("timestamp", encode_single("timestamp", ts))
    assert out == "2024-03-01T12:30:45.250000"


def test_single_value_unsupported_omitted():
    assert encode_single("decimal(10, 2)", 1) is None
    assert encode_single("string", "x" * 100) is None  # over bound cap
    assert encode_single("double", float("nan")) is None


# ---------------------------------------------- writer stats


def test_write_iceberg_entries_carry_stats(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10.5, "alpha"), (2, -3.25, None), (3, 99.0, "zeta")],
        "id bigint, v double, s string",
    ).coalesce(1)
    write_iceberg(df, tbl)
    es = _entries(tbl)
    assert len(es) == 1
    d = es[0]["data_file"]
    assert d["record_count"] == 3
    lows = {r["key"]: r["value"] for r in d["lower_bounds"]}
    highs = {r["key"]: r["value"] for r in d["upper_bounds"]}
    nulls = {r["key"]: r["value"] for r in d["null_value_counts"]}
    counts = {r["key"]: r["value"] for r in d["value_counts"]}
    # field ids are 1-based in schema order: id=1, v=2, s=3
    assert decode_single("long", lows[1]) == 1
    assert decode_single("long", highs[1]) == 3
    assert decode_single("double", lows[2]) == -3.25
    assert decode_single("double", highs[2]) == 99.0
    assert decode_single("string", lows[3]) == "alpha"
    assert decode_single("string", highs[3]) == "zeta"
    assert nulls[3] == 1 and nulls[1] == 0
    assert counts[1] == 3 and counts[3] == 3


def test_append_entries_carry_stats(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = spark.range(10).select(F.col("id").cast("long"))
    write_iceberg(df.coalesce(1), tbl)
    append_iceberg(
        spark.range(100, 110).select(F.col("id").cast("long")).coalesce(1),
        tbl)
    es = _entries(tbl)
    assert len(es) == 2
    ranges = sorted(
        (decode_single("long", {r["key"]: r["value"] for r in
                                e["data_file"]["lower_bounds"]}[1]),
         decode_single("long", {r["key"]: r["value"] for r in
                                e["data_file"]["upper_bounds"]}[1]))
        for e in es)
    assert ranges == [(0, 9), (100, 109)]


# ---------------------------------------------- read-path pruning


def _ranged_table(spark, tmp_path, name="orders"):
    """8 files with disjoint id ranges via range repartition + sort."""
    tbl = str(tmp_path / name)
    df = (
        spark.range(8000)
        .select(
            F.col("id").cast("long"),
            (F.col("id") % 97).cast("double").alias("v"),
            F.concat(F.lit("k"), F.lpad((F.col("id") % 50).cast("string"),
                                        2, "0")).alias("s"),
        )
        .repartitionByRange(8, "id")
        .sortWithinPartitions("id")
    )
    write_iceberg(df, tbl)
    return tbl


def test_predicate_prunes_and_is_exact(spark, tmp_path):
    tbl = _ranged_table(spark, tmp_path)
    rep = skipping_report(spark, tbl, "id >= 2000 and id < 3000")
    assert rep["total"] == 8
    assert rep["candidates"] < rep["total"]  # pruning really happened

    pruned = read_iceberg(spark, tbl, {"predicate": "id >= 2000 and id < 3000"})
    full = read_iceberg(spark, tbl).where("id >= 2000 and id < 3000")
    assert pruned.count() == full.count() == 1000
    assert pruned.exceptAll(full).count() == 0
    # the scan really touches fewer files
    assert len(set(pruned.inputFiles())) < 8


def test_predicate_string_and_in(spark, tmp_path):
    tbl = _ranged_table(spark, tmp_path, "t2")
    pruned = read_iceberg(spark, tbl, {"predicate": "id in (17, 4242)"})
    assert sorted(r.id for r in pruned.collect()) == [17, 4242]
    assert len(set(pruned.inputFiles())) <= 2


def test_or_not_and_unparseable_predicates(spark, tmp_path):
    tbl = _ranged_table(spark, tmp_path, "t3")
    # OR prunes to the two edge files via the may-match dual
    pred = "id < 100 or id >= 7900"
    rep = skipping_report(spark, tbl, pred)
    assert rep["candidates"] <= 2
    got = read_iceberg(spark, tbl, {"predicate": pred})
    assert got.count() == 200
    # NOT inverts through must-match
    rep2 = skipping_report(spark, tbl, "not (id < 7000)")
    assert rep2["candidates"] <= 2
    assert read_iceberg(
        spark, tbl, {"predicate": "not (id < 7000)"}).count() == 1000
    # genuinely unparseable (expression): keeps everything, still exact
    rep3 = skipping_report(spark, tbl, "id % 2 = 0")
    assert rep3["candidates"] == rep3["total"]
    assert read_iceberg(
        spark, tbl, {"predicate": "id % 2 = 0"}).count() == 4000


def test_partition_value_pruning(spark, tmp_path):
    tbl = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(i, i % 4, f"r{i}") for i in range(400)],
        "id bigint, bucket int, s string",
    )
    write_iceberg(df, tbl, partition_by=["bucket"])
    rep = skipping_report(spark, tbl, "bucket = 2")
    assert rep["total"] >= 4 and rep["candidates"] < rep["total"]
    got = read_iceberg(spark, tbl, {"predicate": "bucket = 2"})
    assert got.count() == 100
    assert all(r.bucket == 2 for r in got.collect())


def test_all_files_pruned_returns_typed_empty(spark, tmp_path):
    tbl = _ranged_table(spark, tmp_path, "t4")
    rep = skipping_report(spark, tbl, "id > 1000000")
    assert rep["candidates"] == 0
    got = read_iceberg(spark, tbl, {"predicate": "id > 1000000"})
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "v", "s"]


def test_dml_rewritten_files_keep_stats(spark, tmp_path):
    """UPDATE rewrites data files through _write_data_entries — the
    new files must carry bounds so skipping survives DML."""
    tbl = str(tmp_path / "dml")
    write_iceberg(
        spark.range(1000).select(F.col("id").cast("long"),
                                 F.lit(0.0).alias("v")).coalesce(2), tbl)
    update_where(spark, tbl, "id < 10", {"v": "1.5"})
    es = [e for e in _entries(tbl)
          if e["data_file"].get("content", 0) == 0 and e.get("status") == 1]
    assert es, "update must add rewritten data files"
    assert all(e["data_file"].get("lower_bounds") for e in es)

    # and the pruned read over the updated table stays exact
    got = read_iceberg(spark, tbl, {"predicate": "v > 1.0"})
    assert got.count() == 10


def test_sql_table_function_predicate(session):
    """predicate => flows through the SQL table-function options."""
    import tempfile

    spark = session.spark
    with tempfile.TemporaryDirectory() as d:
        tbl = os.path.join(d, "t")
        write_iceberg(
            spark.range(4000).select(F.col("id").cast("long"))
            .repartitionByRange(4, "id").sortWithinPartitions("id"), tbl)
        rows = session.sql(
            f"select count(*) n from table(dfs.`{tbl}`"
            "(type => 'iceberg', predicate => 'id < 1000'))").collect()
        assert rows[0].n == 1000


def test_manifest_level_pruning(spark, tmp_path):
    """Each append commits one manifest with partition field
    summaries; a partition predicate drops whole MANIFESTS before
    their entries are decoded (the ManifestEvaluator level)."""
    tbl = str(tmp_path / "ml")
    for b in range(4):
        df = spark.createDataFrame(
            [(b * 100 + i, b) for i in range(100)],
            "id bigint, bucket int").coalesce(1)
        if b == 0:
            write_iceberg(df, tbl, partition_by=["bucket"])
        else:
            append_iceberg(df, tbl)
    rep = skipping_report(spark, tbl, "bucket = 2")
    assert rep["manifests_total"] == 4
    assert rep["manifests_kept"] == 1
    got = read_iceberg(spark, tbl, {"predicate": "bucket = 2"})
    assert got.count() == 100 and all(r.bucket == 2 for r in got.collect())
    # non-partition predicate: summaries cannot prune manifests, the
    # per-file bounds still prune files, results exact
    rep2 = skipping_report(spark, tbl, "id < 150")
    assert rep2["manifests_kept"] == 4
    assert rep2["candidates"] < rep2["total"]
    assert read_iceberg(spark, tbl, {"predicate": "id < 150"}).count() == 150
