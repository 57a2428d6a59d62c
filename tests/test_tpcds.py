"""TPC-DS q73 on fixture-derived star schema (reference:
exec/java-exec/src/test/resources/tpcds-sf1/q73.sql, run by
TestTpcdsSf1Queries.java; the repeated-run stability test mirrors
TestTpcdsSf1Leaks.java's rerun-the-query leak canary)."""

from __future__ import annotations

from drill_spark import tpcds
from drill_spark.plans import explain_str

from .conftest import SF_DIR


def _run(spark):
    df = tpcds.QUERIES["tpcds_q73"](spark, SF_DIR)
    return sorted(map(tuple, df.collect()))


def test_q73_shape_and_filters(spark):
    rows = _run(spark)
    assert rows, "q73 must match rows on the fixture-derived schema"
    assert len(rows) <= 1000
    for r in rows:
        assert 1 <= r[5] <= 5           # cnt between 1 and 5
        assert r[2] in ("Mr.", "Ms.")   # salutation domain
        assert r[3] in ("Y", "N")


def test_q73_plan_is_broadcast_star(spark):
    """The three constant-size dimensions and the date spine must
    broadcast; the top-1000 must be TakeOrdered, not a global sort."""
    df = tpcds.QUERIES["tpcds_q73"](spark, SF_DIR)
    phys = explain_str(df)
    assert phys.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in phys
    assert "TakeOrderedAndProject" in phys


def test_q73_repeated_runs_stable(spark):
    """TestTpcdsSf1Leaks analog: rerun the query and require (a)
    identical results and (b) post-GC JVM heap growth bounded — a
    leaking plan (accumulated broadcasts / un-freed pages) trips the
    bound after a few reruns."""
    jvm_rt = spark._jvm.java.lang.Runtime.getRuntime()

    def used_heap():
        jvm_rt.gc()
        return jvm_rt.totalMemory() - jvm_rt.freeMemory()

    first = _run(spark)
    base = used_heap()
    for _ in range(3):
        assert _run(spark) == first
    growth = used_heap() - base
    assert growth < 512 * 1024 * 1024, f"heap grew {growth >> 20} MiB"


def test_q7_plan_is_four_dim_broadcast_star(spark):
    """q7 joins four constant-size dimensions: every one must
    broadcast, the aggregate must be partial+final on the fact, and
    top-100 must be TakeOrdered."""
    df = tpcds.QUERIES["tpcds_q07"](spark, SF_DIR)
    phys = explain_str(df)
    assert phys.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in phys
    assert "TakeOrderedAndProject" in phys


def test_q42_q52_agree_on_brand_totals(spark):
    """q42 (category) and q52 (brand) share the manager-1/Nov/2000
    slice, so their revenue totals over the slice must agree."""
    q42 = tpcds.QUERIES["tpcds_q42"](spark, SF_DIR).collect()
    q52 = tpcds.QUERIES["tpcds_q52"](spark, SF_DIR).collect()
    assert abs(sum(r["sum_ss"] for r in q42)
               - sum(r["ext_price"] for r in q52)) < 0.02 * max(len(q42), len(q52))


def test_q67_rollup_and_rank_shape(spark):
    """The rollup monster: every category's rows are rank<=10, the
    all-null grand-total row ranks 1 in the null category partition,
    and each category's rank-1 sumsales dominates its partition."""
    rows = tpcds.QUERIES["tpcds_q67"](spark, SF_DIR).collect()
    assert rows
    by_cat = {}
    for r in rows:
        assert r["rk"] <= 10
        by_cat.setdefault(r["i_category"], []).append(r)
    assert None in by_cat  # rollup grand-total level present
    for cat, rs in by_cat.items():
        top = max(x["sumsales"] for x in rs)
        assert all(x["sumsales"] <= top for x in rs)
        assert any(x["rk"] == 1 and x["sumsales"] == top for x in rs)


def test_q96_count_and_q68_city_mismatch(spark):
    cnt = tpcds.QUERIES["tpcds_q96"](spark, SF_DIR).first()["cnt"]
    assert cnt > 0  # the fixture slice must actually match
    rows = tpcds.QUERIES["tpcds_q68"](spark, SF_DIR).collect()
    assert rows and all(r["current_city"] != r["bought_city"]
                        for r in rows)
    phys = explain_str(tpcds.QUERIES["tpcds_q68"](spark, SF_DIR))
    assert phys.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in phys
