"""Scale utilities: salted joins (skew) and bucketed co-located joins.

The assertions here are the 100 TB contracts: salting must not change
the join result; bucketed joins must eliminate the shuffle (no Exchange
above either scan in the final plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from drill_spark import plans
from drill_spark.ops.scale import salted_join, write_bucketed
from drill_spark.session import load_fixture

from .conftest import SF_DIR


def test_salted_join_equals_plain_join(spark):
    orders = load_fixture(spark, SF_DIR, "orders")
    customer = load_fixture(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    plain = orders.join(customer, ["o_custkey"]).groupBy("c_nationkey").count()
    salted = (
        salted_join(orders, customer, ["o_custkey"], salt=8)
        .groupBy("c_nationkey")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    orders = load_fixture(spark, SF_DIR, "orders").limit(500)
    dim = spark.createDataFrame([(1, "x")], "o_custkey int, tag string")
    plain = orders.join(dim, ["o_custkey"], "left").count()
    salted = salted_join(orders, dim, ["o_custkey"], how="left", salt=4).count()
    assert plain == salted == 500


def test_bucketed_join_has_no_shuffle(spark):
    """Both sides bucketed on the join key → SortMergeJoin directly over
    the scans; the only Exchange allowed is for the final small agg."""
    orders = load_fixture(spark, SF_DIR, "orders")
    customer = load_fixture(spark, SF_DIR, "customer")
    write_bucketed(spark, orders.select("o_orderkey", "o_custkey", "o_totalprice"),
                   "b_orders", ["o_custkey"], buckets=8)
    write_bucketed(spark, customer.select("c_custkey", "c_nationkey"),
                   "b_customer", ["c_custkey"], buckets=8)
    # disable broadcast so the shuffle-elimination witness is visible
    # (at real scale both sides are too big to broadcast anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        ).select("o_orderkey", "c_nationkey")
        s = plans.explain_str(joined)
        # co-located: SortMergeJoin with NO shuffle Exchange on either side
        assert "SortMergeJoin" in s, s
        assert "Exchange hashpartitioning" not in s, s
        # and it still answers correctly
        n = joined.count()
        plain = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_asof_join_is_not_a_nested_loop(spark):
    """The as-of union+window formulation must never plan a nested-loop
    or cartesian join (the naive inequality-join formulation does)."""
    from drill_spark import extops

    df = extops.QUERIES["ext_asof_join"](spark, SF_DIR)
    s = plans.explain_str(df)
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s, s
    assert "Window" in s


def test_range_join_is_equi_bucketed(spark):
    """Point-in-interval join runs as an equi hash join on the bucket
    id, with containment as a post-filter — not an inequality NLJ."""
    from drill_spark import extops

    df = extops.QUERIES["ext_range_join"](spark, SF_DIR)
    s = plans.explain_str(df)
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s, s


def test_bucketed_agg_has_no_shuffle(spark):
    """Aggregation on the bucket key reuses the persisted distribution."""
    orders = load_fixture(spark, SF_DIR, "orders")
    write_bucketed(spark, orders.select("o_custkey", "o_totalprice"),
                   "b_orders_agg", ["o_custkey"], buckets=8)
    agg = spark.table("b_orders_agg").groupBy("o_custkey").agg(F.sum("o_totalprice"))
    s = plans.explain_str(agg)
    assert "Exchange" not in s, s
    spark.sql("DROP TABLE IF EXISTS b_orders_agg")


def test_crawl_pipeline_single_shuffle(spark):
    """WARC scan -> HTML extract -> dup-signal window: the extraction
    chain must pipeline onto the scan (no exchange between them); the
    ONLY exchange in the plan is the dup-hash window's."""
    from drill_spark import extops

    df = extops.QUERIES["ext_crawl_pipeline"](spark, SF_DIR)
    rep = plans.explain_report(df)
    assert rep["shuffles"] <= 1, rep
    s = plans.explain_str(df)
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s


def test_heavy_hitters_broadcasts_candidates(spark):
    """The verify join must broadcast the (tiny) candidate set — the
    source side never shuffles on the key; the only key-wide exchange
    is the final exact count over CANDIDATE keys only."""
    from drill_spark.ops.sketch import heavy_hitters

    df = spark.createDataFrame(
        [(i % 7,) for i in range(1000)], "value long").repartition(4)
    hh = heavy_hitters(df, "value", k=3)
    s = plans.explain_str(hh)
    assert "BroadcastHashJoin" in s, s
    assert "SortMergeJoin" not in s and "ShuffledHashJoin" not in s, s
