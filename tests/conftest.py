"""Shared test fixtures: one SparkSession, a DuckDB oracle, and a
multiset comparison helper modeled on the reference's TestBuilder
(`/root/reference/exec/java-exec/src/test/java/org/apache/drill/test/TestBuilder.java`
`.unOrdered()` / `.sqlBaselineQuery()` — SQL-as-oracle golden compare).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from drill_spark.session import FIXTURE_TABLES, DrillSession, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("drill_spark_tests", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def session(spark):
    return DrillSession(spark=spark)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    _register_views(con, SF_DIR)
    yield con
    con.close()


def _register_views(con, sf_dir: str) -> None:
    for t in FIXTURE_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create or replace view {t} as select * from read_parquet('{p}')")


def make_duck(sf_dir: str):
    con = duckdb.connect()
    _register_views(con, sf_dir)
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def assert_same_results(spark_df, duck_con, sql: str, check_rows: int | None = None):
    """Order-insensitive compare of a Spark DataFrame vs DuckDB SQL,
    columns sorted by name (mirrors the driver's hash compare)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(c.lower() for c in s_cols) == sorted(c.lower() for c in d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    sm = rows_to_multiset([c.lower() for c in s_cols], s_rows)
    dm = rows_to_multiset([c.lower() for c in d_cols], d_rows)
    assert len(sm) == len(dm), f"row count mismatch: spark={len(sm)} duck={len(dm)}"
    if check_rows is not None:
        assert len(sm) >= check_rows, f"expected >= {check_rows} rows, got {len(sm)}"
    mismatches = [(a, b) for a, b in zip(sm, dm) if a != b]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
