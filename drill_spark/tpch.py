"""TPC-H query corpus, adapted to the driver fixtures.

The reference ships the 22 modified TPC-H queries at
exec/java-exec/src/test/resources/queries/tpch/01.sql-22.sql and runs
them single-node and distributed (TestTpchSingleMode.java,
TestTpchDistributed.java:28-31). The driver fixtures (TESTDATA.md) are a
*simplified* TPC-H star schema — no partsupp table and fewer columns —
so every query here keeps the reference query's **plan shape** (the
operators exercised: scans, multi-way joins, correlated/scalar
subqueries, EXISTS/IN/NOT EXISTS, group-having, top-k, case-sums) while
substituting available columns. Adaptations are noted per query.

Dialect: each query is ONE SQL string executed verbatim by both Spark
SQL and the DuckDB oracle, so result column names and semantics cannot
drift. Shared-dialect rules:
- DATE literals only (fixture date columns are parquet timestamps).
- cast(year(..) as int); cast conditional-count sums to bigint
  (DuckDB sums integers into HUGEINT).
- round() every float aggregate (summation order differs between
  engines at the last ulp).
- every LIMIT query has a total order (unique tie-break column).

Scale notes: these queries are pure Catalyst — joins pick
broadcast/SMJ/shuffled-hash via CBO+AQE; the small dims (region,
nation, supplier, part at any SF; customer at small SF) sit under the
broadcast threshold so the big fact joins are broadcast, not shuffled.
Aggregates are partial+final automatically. Nothing here collects to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from drill_spark.session import FIXTURE_TABLES, load_fixture, prepare_session

import os
import re
import weakref


# Per-session registration state, keyed by the session object itself
# (WeakKeyDictionary: an id() key could collide after GC of an old session).
_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def tables_in(sql: str) -> tuple[str, ...]:
    """Fixture tables referenced by a query (word-token scan — reliable
    for our corpus, where fixture names never appear as other identifiers)."""
    words = set(re.findall(r"[a-z_]+", sql.lower()))
    return tuple(t for t in FIXTURE_TABLES if t in words)


def ensure_views(spark: SparkSession, sf_dir: str, tables=None) -> None:
    """Register fixture parquet as temp views on ANY session (the driver
    harness hands us a vanilla SparkSession — required confs are applied
    here, runtime-settable).

    Lazy + fault-isolated: only the requested ``tables`` (default: all)
    are registered, each independently, so a defect in one fixture never
    fails queries that don't touch it. Memoized per (session, sf_dir) so
    repeated queries skip the driver-side footer reads; switching sf_dir
    re-registers."""
    prepare_session(spark)
    key = os.path.abspath(sf_dir)
    state = _REGISTERED.setdefault(spark, {})
    if state.get("sf") != key:
        state.clear()
        state.update(sf=key, done=set())
    done: set = state["done"]
    errors: list[tuple[str, Exception]] = []
    for t in tables if tables is not None else FIXTURE_TABLES:
        if t in done:
            continue
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        try:
            load_fixture(spark, sf_dir, t).createOrReplaceTempView(t)
            done.add(t)
        except Exception as e:  # isolate: other tables still register
            errors.append((t, e))
    if errors:
        detail = "; ".join(f"{t}: {e}" for t, e in errors)
        raise RuntimeError(f"fixture registration failed for {detail}") from errors[0][1]


TPCH: dict[str, str] = {}

# Q1 — pricing summary report (reference 01.sql). Unmodified shape:
# scan -> filter -> hash agg (8 aggs) -> sort.
TPCH["tpch_q01"] = """
select
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2) as sum_qty,
  round(sum(l_extendedprice), 2) as sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) as sum_charge,
  round(avg(l_quantity), 4) as avg_qty,
  round(avg(l_extendedprice), 4) as avg_price,
  round(avg(l_discount), 4) as avg_disc,
  count(*) as count_order
from lineitem
where l_shipdate <= date '2001-08-06'
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
"""

# Q2 — min-cost supplier (02.sql). Adapted: no partsupp/ps_supplycost;
# the part->supplier link is lineitem and the correlated-min becomes a
# per-part max over s_acctbal. The reference phrases it as a correlated
# scalar subquery; here the decorrelation is written out as a window
# max over partkey — same semantics, ONE shuffle on partkey instead of
# the correlated plan's aggregate+rejoin (5 exchanges -> 3 measured).
TPCH["tpch_q02"] = """
with part_supp as (
  select distinct l_partkey as partkey, l_suppkey as suppkey
  from lineitem
),
eu_supp as (
  select ps.partkey, s.s_acctbal, s.s_name, n.n_name,
         max(s.s_acctbal) over (partition by ps.partkey) as max_acctbal
  from part_supp ps
  join supplier s on s.s_suppkey = ps.suppkey
  join nation n on s.s_nationkey = n.n_nationkey
  join region r on n.n_regionkey = r.r_regionkey
  where r.r_name = 'EUROPE'
)
select
  round(e.s_acctbal, 2) as s_acctbal,
  e.s_name,
  e.n_name,
  p.p_partkey,
  p.p_name
from part p
join eu_supp e on p.p_partkey = e.partkey
where p.p_size = 15 and p.p_type = 'SMALL' and e.s_acctbal = e.max_acctbal
order by s_acctbal desc, n_name, s_name, p_partkey
limit 100
"""

# Q3 — shipping priority (03.sql). Adapted: o_shippriority -> o_orderpriority.
TPCH["tpch_q03"] = """
select
  o_orderkey,
  round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
  cast(o_orderdate as date) as o_orderdate,
  o_orderpriority
from customer
join orders on c_custkey = o_custkey
join lineitem on l_orderkey = o_orderkey
where c_mktsegment = 'BUILDING'
  and o_orderdate < date '1998-03-15'
  and l_shipdate > date '1998-03-15'
group by o_orderkey, o_orderdate, o_orderpriority
order by revenue desc, o_orderkey
limit 10
"""

# Q4 — order priority checking (04.sql). Adapted: EXISTS predicate uses
# l_shipdate > o_orderdate (no l_commitdate/l_receiptdate in fixture).
TPCH["tpch_q04"] = """
select o_orderpriority, count(*) as order_count
from orders
where o_orderdate >= date '1996-01-01' and o_orderdate < date '1996-04-01'
  and exists (
    select 1 from lineitem
    where l_orderkey = o_orderkey and l_shipdate > o_orderdate
  )
group by o_orderpriority
order by o_orderpriority
"""

# Q5 — local supplier volume (05.sql). Unmodified shape (6-way join).
TPCH["tpch_q05"] = """
select n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
from customer
join orders on c_custkey = o_custkey
join lineitem on l_orderkey = o_orderkey
join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
join nation on s_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
where r_name = 'ASIA'
  and o_orderdate >= date '1996-01-01' and o_orderdate < date '1997-01-01'
group by n_name
order by revenue desc, n_name
"""

# Q6 — forecasting revenue change (06.sql). Unmodified shape.
TPCH["tpch_q06"] = """
select round(sum(l_extendedprice * l_discount), 2) as revenue
from lineitem
where l_shipdate >= date '1996-01-01' and l_shipdate < date '1997-01-01'
  and l_discount between 0.05 and 0.07
  and l_quantity < 24
"""

# Q7 — volume shipping (07.sql). Unmodified shape (two nation aliases).
TPCH["tpch_q07"] = """
select supp_nation, cust_nation, l_year, round(sum(volume), 2) as revenue
from (
  select
    n1.n_name as supp_nation,
    n2.n_name as cust_nation,
    cast(year(l_shipdate) as int) as l_year,
    l_extendedprice * (1 - l_discount) as volume
  from supplier
  join lineitem on s_suppkey = l_suppkey
  join orders on o_orderkey = l_orderkey
  join customer on c_custkey = o_custkey
  join nation n1 on s_nationkey = n1.n_nationkey
  join nation n2 on c_nationkey = n2.n_nationkey
  where ((n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2')
      or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1'))
    and l_shipdate between date '1996-01-01' and date '1997-12-31'
) shipping
group by supp_nation, cust_nation, l_year
order by supp_nation, cust_nation, l_year
"""

# Q8 — national market share (08.sql). Adapted: p_type equality ('ECONOMY').
TPCH["tpch_q08"] = """
select o_year,
  round(sum(case when nation = 'NATION_3' then volume else 0 end) / sum(volume), 4) as mkt_share
from (
  select
    cast(year(o_orderdate) as int) as o_year,
    l_extendedprice * (1 - l_discount) as volume,
    n2.n_name as nation
  from part
  join lineitem on p_partkey = l_partkey
  join supplier on s_suppkey = l_suppkey
  join orders on l_orderkey = o_orderkey
  join customer on o_custkey = c_custkey
  join nation n1 on c_nationkey = n1.n_nationkey
  join region on n1.n_regionkey = r_regionkey
  join nation n2 on s_nationkey = n2.n_nationkey
  where r_name = 'EUROPE' and p_type = 'ECONOMY'
    and o_orderdate between date '1995-01-01' and date '1996-12-31'
) all_nations
group by o_year
order by o_year
"""

# Q9 — product type profit (09.sql). Adapted: no ps_supplycost term.
TPCH["tpch_q09"] = """
select nation, o_year, round(sum(amount), 2) as sum_profit
from (
  select
    n_name as nation,
    cast(year(o_orderdate) as int) as o_year,
    l_extendedprice * (1 - l_discount) as amount
  from part
  join lineitem on p_partkey = l_partkey
  join supplier on s_suppkey = l_suppkey
  join orders on o_orderkey = l_orderkey
  join nation on s_nationkey = n_nationkey
  where p_name like '%red%'
) profit
group by nation, o_year
order by nation, o_year desc
"""

# Q10 — returned item reporting (10.sql). Adapted: fixture customer cols.
TPCH["tpch_q10"] = """
select
  c_custkey,
  c_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
  round(c_acctbal, 2) as c_acctbal,
  n_name
from customer
join orders on c_custkey = o_custkey
join lineitem on l_orderkey = o_orderkey
join nation on c_nationkey = n_nationkey
where o_orderdate >= date '1996-10-01' and o_orderdate < date '1997-01-01'
  and l_returnflag = 'R'
group by c_custkey, c_name, c_acctbal, n_name
order by revenue desc, c_custkey
limit 20
"""

# Q11 — important stock (11.sql). Adapted: no partsupp; value =
# supplier account balances per nation vs a global-fraction scalar
# subquery in HAVING (same group-having-scalar-subquery shape).
TPCH["tpch_q11"] = """
select n_name, round(sum(s_acctbal), 2) as value
from supplier
join nation on s_nationkey = n_nationkey
group by n_name
having sum(s_acctbal) > (select sum(s_acctbal) * 0.02 from supplier)
order by value desc, n_name
"""

# Q12 — shipping modes (12.sql). Adapted: l_shipmode -> o_orderpriority
# classes, grouped by l_linestatus.
TPCH["tpch_q12"] = """
select
  l_linestatus,
  cast(sum(case when o_orderpriority = '1-URGENT' or o_orderpriority = '2-HIGH'
           then 1 else 0 end) as bigint) as high_line_count,
  cast(sum(case when o_orderpriority <> '1-URGENT' and o_orderpriority <> '2-HIGH'
           then 1 else 0 end) as bigint) as low_line_count
from orders
join lineitem on o_orderkey = l_orderkey
where l_shipdate >= date '1996-01-01' and l_shipdate < date '1997-01-01'
group by l_linestatus
order by l_linestatus
"""

# Q13 — customer distribution (13.sql). Adapted: no o_comment filter;
# filter on o_orderpriority instead. Left join + double aggregation.
TPCH["tpch_q13"] = """
select c_count, count(*) as custdist
from (
  select c_custkey, count(o_orderkey) as c_count
  from customer
  left join orders on c_custkey = o_custkey
    and o_orderpriority <> '4-NOT SPECIFIED'
  group by c_custkey
) c_orders
group by c_count
order by custdist desc, c_count desc
"""

# Q14 — promotion effect (14.sql). Adapted: p_type equality.
TPCH["tpch_q14"] = """
select round(
    100.0 * sum(case when p_type = 'PROMO' then l_extendedprice * (1 - l_discount) else 0 end)
    / sum(l_extendedprice * (1 - l_discount)), 4) as promo_revenue
from lineitem
join part on l_partkey = p_partkey
where l_shipdate >= date '1996-09-01' and l_shipdate < date '1996-10-01'
"""

# Q15 — top supplier (15.sql). CTE in place of the view; scalar-max join.
TPCH["tpch_q15"] = """
with revenue as (
  select l_suppkey as supplier_no, sum(l_extendedprice * (1 - l_discount)) as total_revenue
  from lineitem
  where l_shipdate >= date '1996-01-01' and l_shipdate < date '1996-04-01'
  group by l_suppkey
)
select s_suppkey, s_name, round(total_revenue, 2) as total_revenue
from supplier
join revenue on s_suppkey = supplier_no
where total_revenue = (select max(total_revenue) from revenue)
order by s_suppkey
"""

# Q16 — parts/supplier relationship (16.sql). Adapted: partsupp ->
# distinct lineitem link; NOT IN subquery on supplier acctbal.
TPCH["tpch_q16"] = """
select p_brand, p_type, p_size, count(distinct l_suppkey) as supplier_cnt
from lineitem
join part on p_partkey = l_partkey
where p_brand <> 'Brand#1'
  and p_type <> 'SMALL'
  and p_size in (1, 5, 10, 15, 20, 25, 30, 35)
  and l_suppkey not in (select s_suppkey from supplier where s_acctbal < 0)
group by p_brand, p_type, p_size
order by supplier_cnt desc, p_brand, p_type, p_size
"""

# Q17 — small-quantity-order revenue (17.sql). Adapted: p_container ->
# p_size; correlated scalar AVG subquery preserved.
TPCH["tpch_q17"] = """
select round(sum(l_extendedprice) / 7.0, 2) as avg_yearly
from lineitem
join part on p_partkey = l_partkey
where p_brand = 'Brand#23' and p_size <= 5
  and l_quantity < (
    select 0.5 * avg(l2.l_quantity) from lineitem l2 where l2.l_partkey = p_partkey
  )
"""

# Q18 — large volume customers (18.sql). IN over group-having subquery.
TPCH["tpch_q18"] = """
select
  c_name, c_custkey, o_orderkey,
  cast(o_orderdate as date) as o_orderdate,
  round(o_totalprice, 2) as o_totalprice,
  round(sum(l_quantity), 2) as sum_qty
from customer
join orders on c_custkey = o_custkey
join lineitem on o_orderkey = l_orderkey
where o_orderkey in (
  select l_orderkey from lineitem group by l_orderkey having sum(l_quantity) > 140
)
group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
order by o_totalprice desc, o_orderkey
limit 100
"""

# Q19 — discounted revenue (19.sql). Adapted: p_container -> p_size
# bands; OR-of-ANDs predicate preserved (join condition pushdown test).
TPCH["tpch_q19"] = """
select round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
from lineitem
join part on p_partkey = l_partkey
where
  (p_brand = 'Brand#12' and p_size between 1 and 5 and l_quantity between 1 and 11)
  or (p_brand = 'Brand#23' and p_size between 1 and 10 and l_quantity between 10 and 20)
  or (p_brand = 'Brand#3' and p_size between 1 and 15 and l_quantity between 20 and 30)
"""

# Q20 — potential part promotion (20.sql). Adapted: nested IN chain via
# lineitem (no partsupp availability predicate).
TPCH["tpch_q20"] = """
select s_name, round(s_acctbal, 2) as s_acctbal
from supplier
join nation on s_nationkey = n_nationkey
where n_name = 'NATION_5'
  and s_suppkey in (
    select l_suppkey from lineitem
    join part on p_partkey = l_partkey
    where p_name like 'red%'
  )
order by s_name
"""

# Q21 — suppliers who kept orders waiting (21.sql). Adapted: the
# commit/receipt-date lateness predicate becomes returnflag='R'; the
# EXISTS / NOT EXISTS double-correlated shape is preserved.
TPCH["tpch_q21"] = """
select s_name, count(*) as numwait
from supplier
join lineitem l1 on s_suppkey = l1.l_suppkey
join orders on o_orderkey = l1.l_orderkey
join nation on s_nationkey = n_nationkey
where o_orderstatus = 'F' and l1.l_returnflag = 'R'
  and exists (
    select 1 from lineitem l2
    where l2.l_orderkey = l1.l_orderkey and l2.l_suppkey <> l1.l_suppkey
  )
  and not exists (
    select 1 from lineitem l3
    where l3.l_orderkey = l1.l_orderkey and l3.l_suppkey <> l1.l_suppkey
      and l3.l_returnflag = 'R'
  )
  and n_name = 'NATION_7'
group by s_name
order by numwait desc, s_name
limit 100
"""

# Q22 — global sales opportunity (22.sql). Adapted: c_phone country code
# -> c_name digit slice; NOT EXISTS uses rare 'P' orders so the
# anti-join is non-trivially selective.
TPCH["tpch_q22"] = """
select cntrycode, count(*) as numcust, round(sum(c_acctbal), 2) as totacctbal
from (
  select substring(c_name, 15, 2) as cntrycode, c_acctbal
  from customer
  where substring(c_name, 15, 2) in ('00', '01', '02', '05', '11', '12', '13')
    and c_acctbal > (select avg(c_acctbal) from customer where c_acctbal > 0.0)
    and not exists (
      select 1 from orders
      where o_custkey = c_custkey and o_orderstatus = 'P'
    )
) custsale
group by cntrycode
order by cntrycode
"""


def make_query_fn(sql: str):
    needed = tables_in(sql)

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_views(spark, sf_dir, needed)
        return spark.sql(sql)

    return fn


def queries() -> dict:
    return {name: make_query_fn(sql) for name, sql in TPCH.items()}


def oracle_sql() -> dict[str, str]:
    # Same dialect-shared strings run on DuckDB (views pre-registered).
    return dict(TPCH)
