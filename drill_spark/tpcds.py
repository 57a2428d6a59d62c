"""TPC-DS coverage on the driver fixtures.

Reference: exec/java-exec/src/test/resources/tpcds-sf1/q73.sql (run by
TestTpcdsSf1Queries.java / TestTpcdsSf1Leaks.java). The container ships
no TPC-DS generator, so the star-schema inputs are DERIVED from the
TPC-H fixtures with closed-form arithmetic — identically on the Spark
side (DataFrame API) and in the DuckDB oracle (CTEs) — keeping the
correctness row a true cross-engine hash check of the q73 plan shape:
a multi-way dimension-filtered join, a two-key aggregate, a HAVING-like
range filter on the count, and a customer join with top-N.

Scale shape: the three dimension frames are tiny (constant-size) →
broadcast joins; the fact scan aggregates on (ticket, customer) with
map-side partials; the final order by cnt is a TakeOrdered top-1000,
never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drill_spark.session import load_fixture

_COUNTIES = [
    "Saginaw County", "Sumner County", "Appanoose County",
    "Daviess County", "Ziebach County", "Walker County",
    "Richland County", "Williamson County",
]


def _store_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact table derived from lineitem⋈orders: the natural 1..7
    lineitem multiplicity per orderkey gives count(*) the spread q73's
    `cnt between 1 and 5` filter needs."""
    li = load_fixture(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_partkey",
        "l_extendedprice")
    orders = load_fixture(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_orderkey").alias("ss_ticket_number"),
            F.col("o_custkey").alias("ss_customer_sk"),
            (F.lit(2451180) + F.col("l_orderkey") % 120).alias("ss_sold_date_sk"),
            (F.col("l_suppkey") % 10).alias("ss_store_sk"),
            ((F.col("l_orderkey") + F.col("l_linenumber")) % 50).alias("ss_hdemo_sk"),
            (F.col("l_partkey") % 200).alias("ss_item_sk"),
            F.col("l_extendedprice").alias("ss_ext_sales_price"),
        )
    )


def _date_dim(spark: SparkSession) -> DataFrame:
    return spark.sql(
        "select d_date_sk, 1998 + cast(d_date_sk % 5 as int) as d_year, "
        "1 + cast(d_date_sk % 12 as int) as d_moy "
        "from (select explode(sequence(2451000, 2451499)) as d_date_sk)")


def _item(spark: SparkSession) -> DataFrame:
    return spark.sql(
        "select id as i_item_sk, "
        "cast(id % 37 as int) + 1 as i_brand_id, "
        "'Brand#' || cast(cast(id % 37 as int) + 1 as string) as i_brand, "
        "cast(id % 50 as int) + 1 as i_manufact_id, "
        "cast(id % 100 as int) + 1 as i_manager_id "
        "from (select explode(sequence(0, 199)) as id)")


def _store(spark: SparkSession) -> DataFrame:
    counties = ", ".join(f"'{c}'" for c in _COUNTIES)
    return spark.sql(
        f"select id as s_store_sk, "
        f"element_at(array({counties}), cast(id % 8 as int) + 1) as s_county "
        f"from (select explode(sequence(0, 9)) as id)")


def _household_demographics(spark: SparkSession) -> DataFrame:
    return spark.sql(
        "select id as hd_demo_sk, "
        "case cast(id % 3 as int) when 0 then '>10000' "
        "     when 1 then 'unknown' else '5001-10000' end as hd_buy_potential, "
        "cast(id % 4 as int) as hd_vehicle_count, "
        "cast(id % 9 as int) as hd_dep_count "
        "from (select explode(sequence(0, 49)) as id)")


def _customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_fixture(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("c_customer_sk"),
        F.col("c_name").alias("c_last_name"),
        F.substring("c_name", 1, 9).alias("c_first_name"),
        F.when(F.col("c_custkey") % 2 == 0, "Mr.").otherwise("Ms.")
        .alias("c_salutation"),
        F.when(F.col("c_custkey") % 3 == 0, "Y").otherwise("N")
        .alias("c_preferred_cust_flag"),
    )


def q_tpcds_q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q73: households with >1 dependents-per-vehicle buying in four
    counties, grouped per (ticket, customer), 1..5-item baskets joined
    back to customer, top 1000 by basket size."""
    ss = _store_sales(spark, sf_dir)
    d = _date_dim(spark)
    s = _store(spark)
    hd = _household_demographics(spark)
    c = _customer(spark, sf_dir)

    dj = (
        ss.join(F.broadcast(d), ss.ss_sold_date_sk == d.d_date_sk)
        .join(F.broadcast(s), ss.ss_store_sk == s.s_store_sk)
        .join(F.broadcast(hd), ss.ss_hdemo_sk == hd.hd_demo_sk)
        .where(
            (F.col("hd_buy_potential").isin(">10000", "unknown"))
            & (F.col("hd_vehicle_count") > 0)
            & (
                F.when(F.col("hd_vehicle_count") > 0,
                       F.col("hd_dep_count") / F.col("hd_vehicle_count"))
                .otherwise(F.lit(None)) > 1)
            & (F.col("s_county").isin(*_COUNTIES[:4]))
            & (F.col("ss_sold_date_sk").between(2451180, 2451269))
        )
        .groupBy("ss_ticket_number", "ss_customer_sk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt").between(1, 5))
        .withColumnRenamed("ss_ticket_number", "sstn")
        .withColumnRenamed("ss_customer_sk", "sscsk")
    )
    out = (
        dj.join(c, dj.sscsk == c.c_customer_sk)
        .select("c_last_name", "c_first_name", "c_salutation",
                "c_preferred_cust_flag", "sstn", "cnt")
        .orderBy(F.desc("cnt"), "sstn")   # sstn tiebreak: deterministic hash
        .limit(1000)
    )
    return out


_COUNTY_SQL = ", ".join(f"'{c}'" for c in _COUNTIES)

# Shared DuckDB CTE block — must stay the exact twin of the DataFrame
# derivations above.
_DIMS_SQL = f"""
with store_sales as (
  select l.l_orderkey as ss_ticket_number,
         o.o_custkey as ss_customer_sk,
         2451180 + l.l_orderkey % 120 as ss_sold_date_sk,
         l.l_suppkey % 10 as ss_store_sk,
         (l.l_orderkey + l.l_linenumber) % 50 as ss_hdemo_sk,
         l.l_partkey % 200 as ss_item_sk,
         l.l_extendedprice as ss_ext_sales_price
  from lineitem l join orders o on l.l_orderkey = o.o_orderkey
),
date_dim as (
  select d_date_sk, 1998 + cast(d_date_sk % 5 as int) as d_year,
         1 + cast(d_date_sk % 12 as int) as d_moy
  from (select unnest(generate_series(2451000, 2451499)) as d_date_sk)
),
item as (
  select id as i_item_sk,
         cast(id % 37 as int) + 1 as i_brand_id,
         'Brand#' || cast(cast(id % 37 as int) + 1 as varchar) as i_brand,
         cast(id % 50 as int) + 1 as i_manufact_id,
         cast(id % 100 as int) + 1 as i_manager_id
  from (select unnest(generate_series(0, 199)) as id)
),
store as (
  select id as s_store_sk,
         ([{_COUNTY_SQL}])[cast(id % 8 as int) + 1] as s_county
  from (select unnest(generate_series(0, 9)) as id)
),
household_demographics as (
  select id as hd_demo_sk,
         case cast(id % 3 as int) when 0 then '>10000'
              when 1 then 'unknown' else '5001-10000' end as hd_buy_potential,
         cast(id % 4 as int) as hd_vehicle_count,
         cast(id % 9 as int) as hd_dep_count
  from (select unnest(generate_series(0, 49)) as id)
),
cust as (
  select c_custkey as c_customer_sk,
         c_name as c_last_name,
         substring(c_name, 1, 9) as c_first_name,
         case when c_custkey % 2 = 0 then 'Mr.' else 'Ms.' end as c_salutation,
         case when c_custkey % 3 = 0 then 'Y' else 'N' end as c_preferred_cust_flag
  from customer
)
"""

ORACLE_TPCDS_Q73 = _DIMS_SQL + f""",
dj as (
  select ss.ss_ticket_number as sstn, ss.ss_customer_sk as sscsk,
         cast(count(*) as bigint) as cnt
  from store_sales ss, date_dim d, store s, household_demographics hd
  where ss.ss_sold_date_sk = d.d_date_sk
    and ss.ss_store_sk = s.s_store_sk
    and ss.ss_hdemo_sk = hd.hd_demo_sk
    and (hd.hd_buy_potential = '>10000' or hd.hd_buy_potential = 'unknown')
    and hd.hd_vehicle_count > 0
    and case when hd.hd_vehicle_count > 0
             then cast(hd.hd_dep_count as double) / hd.hd_vehicle_count
             else null end > 1
    and s.s_county in ({", ".join(f"'{c}'" for c in _COUNTIES[:4])})
    and ss.ss_sold_date_sk between 2451180 and 2451269
  group by ss.ss_ticket_number, ss.ss_customer_sk
)
select c.c_last_name, c.c_first_name, c.c_salutation,
       c.c_preferred_cust_flag, dj.sstn, dj.cnt
from dj, cust c
where dj.sscsk = c.c_customer_sk
  and dj.cnt between 1 and 5
order by dj.cnt desc, dj.sstn
limit 1000
"""


def q_tpcds_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 (TPC-DS spec shape): brand-level November sales for one
    manufacturer across years — date/item broadcast, one partial-
    aggregated groupBy on the fact, TakeOrdered top-100."""
    ss = _store_sales(spark, sf_dir)
    d = _date_dim(spark)
    i = _item(spark)
    out = (
        ss.join(F.broadcast(d), ss.ss_sold_date_sk == d.d_date_sk)
        .join(F.broadcast(i), ss.ss_item_sk == i.i_item_sk)
        .where((F.col("i_manufact_id") == 25) & (F.col("d_moy") == 11))
        .groupBy("d_year", "i_brand_id", "i_brand")
        .agg(F.round(F.sum("ss_ext_sales_price"), 2).alias("sum_agg"))
        .orderBy("d_year", F.desc("sum_agg"), "i_brand_id")
        .limit(100)
        .select("d_year", F.col("i_brand_id").alias("brand_id"),
                F.col("i_brand").alias("brand"), "sum_agg")
    )
    return out


ORACLE_TPCDS_Q3 = _DIMS_SQL + """
select d_year, i_brand_id as brand_id, i_brand as brand,
       round(sum(ss_ext_sales_price), 2) as sum_agg
from date_dim, store_sales, item
where d_date_sk = ss_sold_date_sk and ss_item_sk = i_item_sk
  and i_manufact_id = 25 and d_moy = 11
group by d_year, i_brand_id, i_brand
order by d_year, sum_agg desc, brand_id
limit 100
"""


def q_tpcds_q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q55: one manager's brand revenue for one (year, month) — same
    broadcast-star shape, single-group filter."""
    ss = _store_sales(spark, sf_dir)
    d = _date_dim(spark)
    i = _item(spark)
    return (
        ss.join(F.broadcast(d), ss.ss_sold_date_sk == d.d_date_sk)
        .join(F.broadcast(i), ss.ss_item_sk == i.i_item_sk)
        .where((F.col("i_manager_id") == 13) & (F.col("d_moy") == 11)
               & (F.col("d_year") == 1999))
        .groupBy("i_brand_id", "i_brand")
        .agg(F.round(F.sum("ss_ext_sales_price"), 2).alias("ext_price"))
        .orderBy(F.desc("ext_price"), "i_brand_id")
        .limit(100)
        .select(F.col("i_brand_id").alias("brand_id"),
                F.col("i_brand").alias("brand"), "ext_price")
    )


ORACLE_TPCDS_Q55 = _DIMS_SQL + """
select i_brand_id as brand_id, i_brand as brand,
       round(sum(ss_ext_sales_price), 2) as ext_price
from date_dim, store_sales, item
where d_date_sk = ss_sold_date_sk and ss_item_sk = i_item_sk
  and i_manager_id = 13 and d_moy = 11 and d_year = 1999
group by i_brand_id, i_brand
order by ext_price desc, brand_id
limit 100
"""


QUERIES = {
    "tpcds_q73": q_tpcds_q73,
    "tpcds_q03": q_tpcds_q3,
    "tpcds_q55": q_tpcds_q55,
}
ORACLES = {
    "tpcds_q73": ORACLE_TPCDS_Q73,
    "tpcds_q03": ORACLE_TPCDS_Q3,
    "tpcds_q55": ORACLE_TPCDS_Q55,
}


def queries():
    return dict(QUERIES)


def oracle_sql():
    return dict(ORACLES)
