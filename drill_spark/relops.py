"""Relational-operator coverage queries (SURVEY §2.3-§2.9).

One named query per operator family in the reference's inventory, each
with a DuckDB oracle. Where Spark SQL and DuckDB share a dialect the
query is ONE string (like tpch.py); where dialects diverge (explode vs
unnest, stack vs UNPIVOT, json path fns, time windows) the Spark side
uses the DataFrame API or Spark SQL and the oracle is written
separately — semantics, row multiset, and column names always match.

Reference operators covered here (citations in SURVEY §2):
- joins: HashJoin (inner/left/right/full/semi/anti), MergeJoin,
  NestedLoopJoin (theta/cross) — physical/impl/join/*
- LateralJoin+Unnest / FLATTEN — physical/impl/unnest, flatten
- set ops: UnionAll, HashSetOp INTERSECT/EXCEPT [ALL] — physical/impl/union, setop
- HashAgg/StreamingAgg + ROLLUP/CUBE/GROUPING SETS + distinct/statistical
  aggregates — physical/impl/aggregate, AggrTypes*.tdd, CorrelationTypes.tdd
- Window operator, all ranking/offset fns + frames — physical/impl/window
- TopN / Limit / PartitionLimit — physical/impl/TopN, limit
- Values — physical/impl/values
- UNPIVOT (UnpivotMapsRecordBatch), kvgen (Mappify.java), convert_from
  (conv/JsonConvertFrom.java)
- scalar function families — expr/fn/impl/* (string/date/math/hash)

Determinism rules for the oracle hash-compare: every window ORDER BY
carries a unique tie-break key; ntile/row_number order by unique keys
only; float aggregates rounded.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from drill_spark.tpch import ensure_views, tables_in


@dataclass
class Spec:
    spark_sql: str  # run through spark.sql after view registration
    oracle: str | None = None  # None -> same string as spark_sql


SPECS: dict[str, Spec] = {}


def _q(name: str, spark_sql: str, oracle: str | None = None) -> None:
    SPECS[name] = Spec(spark_sql, oracle)


# ---------------------------------------------------------------- joins

_q("op_join_inner", """
select r_name, count(*) as n_customers, round(sum(c_acctbal), 2) as total_bal
from customer
join nation on c_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
group by r_name
order by r_name
""")

_q("op_join_left", """
select n_name, count(o_orderkey) as n_urgent
from nation
left join customer on c_nationkey = n_nationkey
left join orders on o_custkey = c_custkey and o_orderpriority = '1-URGENT'
group by n_name
order by n_name
""")

_q("op_join_right", """
select n_name, count(c_custkey) as n_cust
from customer
right join nation on c_nationkey = n_nationkey
group by n_name
order by n_name
""")

_q("op_join_full", """
select coalesce(cn.n_name, sn.n_name) as n_name,
       coalesce(n_cust, 0) as n_cust,
       coalesce(n_supp, 0) as n_supp
from (select n_name, count(*) as n_cust from customer join nation on c_nationkey = n_nationkey group by n_name) cn
full outer join (select n_name, count(*) as n_supp from supplier join nation on s_nationkey = n_nationkey group by n_name) sn
  on cn.n_name = sn.n_name
order by n_name
""")

# semi: EXISTS lowers to LeftSemi in Catalyst (DrillDistinctJoinToSemiJoinRule analog)
_q("op_join_semi", """
select c_mktsegment, count(*) as n
from customer
where exists (select 1 from orders where o_custkey = c_custkey and o_orderstatus = 'P')
group by c_mktsegment
order by c_mktsegment
""")

_q("op_join_anti", """
select c_mktsegment, count(*) as n
from customer
where not exists (select 1 from orders where o_custkey = c_custkey and o_orderstatus = 'P')
group by c_mktsegment
order by c_mktsegment
""")

# theta join -> BroadcastNestedLoopJoin (NestedLoopJoinBatch.java:70 analog)
_q("op_join_theta", """
select n1.n_name as a, n2.n_name as b
from nation n1
join nation n2
  on n1.n_regionkey = n2.n_regionkey and n1.n_nationkey < n2.n_nationkey
order by a, b
""")

_q("op_join_cross", """
select r1.r_name as a, r2.r_name as b
from region r1 cross join region r2
order by a, b
""")

# ------------------------------------------------------------- set ops

_q("op_union_all", """
select n_name as name from nation where n_regionkey = 0
union all
select r_name as name from region
order by name
""")

_q("op_union_distinct", """
select n_regionkey as k from nation
union
select r_regionkey as k from region
order by k
""")

_q("op_intersect", """
select n_regionkey as k from nation
intersect
select r_regionkey as k from region where r_regionkey < 3
order by k
""")

_q("op_except", """
select n_nationkey as k from nation
except
select n_regionkey as k from nation
order by k
""")

_q("op_intersect_all", """
select c_nationkey as k from customer where c_acctbal > 0
intersect all
select c_nationkey as k from customer where c_mktsegment = 'BUILDING'
order by k
""")

_q("op_except_all", """
select c_nationkey as k from customer
except all
select c_nationkey as k from customer where c_mktsegment = 'BUILDING'
order by k
""")

# ---------------------------------------------------- aggregation forms

_q("op_agg_rollup", """
select r_name, n_name, count(*) as n,
       grouping(r_name) as g_r, grouping(n_name) as g_n
from nation
join region on n_regionkey = r_regionkey
group by rollup(r_name, n_name)
order by r_name nulls first, n_name nulls first
""")

_q("op_agg_cube", """
select l_returnflag, l_linestatus, round(sum(l_quantity), 2) as sum_qty
from lineitem
group by cube(l_returnflag, l_linestatus)
order by l_returnflag nulls first, l_linestatus nulls first
""")

_q("op_agg_grouping_sets", """
select o_orderstatus, o_orderpriority, count(*) as n
from orders
group by grouping sets ((o_orderstatus), (o_orderpriority), ())
order by o_orderstatus nulls first, o_orderpriority nulls first
""")

_q("op_agg_distinct", """
select o_orderstatus,
       count(distinct o_custkey) as n_cust,
       count(*) as n_orders
from orders
group by o_orderstatus
order by o_orderstatus
""")

_q("op_agg_stats", """
select l_returnflag,
       round(stddev_samp(l_quantity), 4) as sd_qty,
       round(stddev_pop(l_quantity), 4) as sdp_qty,
       round(var_samp(l_discount), 6) as var_disc,
       round(var_pop(l_discount), 6) as varp_disc,
       round(corr(l_quantity, l_extendedprice), 4) as corr_qe,
       round(covar_samp(l_quantity, l_extendedprice), 2) as covar_qe,
       round(covar_pop(l_quantity, l_extendedprice), 2) as covarp_qe
from lineitem
group by l_returnflag
order by l_returnflag
""")

_q("op_agg_minmax_sum_avg", """
select o_orderpriority,
       min(o_totalprice) as min_p, max(o_totalprice) as max_p,
       round(sum(o_totalprice), 2) as sum_p, round(avg(o_totalprice), 4) as avg_p,
       count(*) as n
from orders
group by o_orderpriority
order by o_orderpriority
""")

# percentile family (MedianFunctions.java / TDigestFunctions.java analog):
# Spark `percentile`/`median` are exact-interpolated = DuckDB quantile_cont.
_q(
    "op_agg_percentile",
    """
select l_returnflag,
       round(median(l_quantity), 4) as med_qty,
       round(percentile(l_quantity, 0.25), 4) as p25,
       round(percentile(l_quantity, 0.75), 4) as p75
from lineitem
group by l_returnflag
order by l_returnflag
""",
    oracle="""
select l_returnflag,
       round(median(l_quantity), 4) as med_qty,
       round(quantile_cont(l_quantity, 0.25), 4) as p25,
       round(quantile_cont(l_quantity, 0.75), 4) as p75
from lineitem
group by l_returnflag
order by l_returnflag
""",
)

_q("op_agg_bitwise", """
select p_brand,
       bit_and(p_size) as band, bit_or(p_size) as bor, bit_xor(p_size) as bxor
from part
group by p_brand
order by p_brand
""")

# HAVING over agg (group filter)
_q("op_agg_having", """
select c_nationkey, count(*) as n
from customer
group by c_nationkey
having count(*) > 40
order by c_nationkey
""")

# ------------------------------------------------------------- windows

_q("op_window_ranks", """
select c_custkey,
       c_nationkey,
       row_number() over (partition by c_nationkey order by c_acctbal desc, c_custkey) as rn,
       rank() over (partition by c_nationkey order by c_acctbal desc, c_custkey) as rnk,
       dense_rank() over (partition by c_nationkey order by c_acctbal desc, c_custkey) as drnk,
       round(percent_rank() over (partition by c_nationkey order by c_acctbal desc, c_custkey), 6) as prnk,
       round(cume_dist() over (partition by c_nationkey order by c_acctbal desc, c_custkey), 6) as cd
from customer
where c_nationkey < 5
""")

_q("op_window_ntile", """
select c_custkey, ntile(4) over (order by c_custkey) as quartile
from customer
""")

_q("op_window_leadlag", """
select o_orderkey,
       o_custkey,
       lag(o_orderkey) over (partition by o_custkey order by o_orderkey) as prev_k,
       lead(o_orderkey) over (partition by o_custkey order by o_orderkey) as next_k
from orders
where o_custkey < 50
""")

_q("op_window_frames", """
select o_orderkey,
       round(sum(o_totalprice) over (partition by o_custkey order by o_orderkey
             rows between unbounded preceding and current row), 2) as running_total,
       round(avg(o_totalprice) over (partition by o_custkey order by o_orderkey
             rows between 1 preceding and 1 following), 4) as centered_avg,
       first_value(o_orderkey) over (partition by o_custkey order by o_orderkey) as first_k,
       last_value(o_orderkey) over (partition by o_custkey order by o_orderkey
             rows between unbounded preceding and unbounded following) as last_k
from orders
where o_custkey < 50
""")

_q(
    "op_window_ignore_nulls",
    # IGNORE NULLS placement differs: Spark trails the call,
    # DuckDB puts it inside the argument list
    """
select l_orderkey, l_linenumber,
       lead(cmt) over w as next_c,
       lag(cmt, 1, 'none') over w as prev_c,
       first_value(cmt) ignore nulls over (partition by l_orderkey order by l_linenumber
             rows between unbounded preceding and unbounded following) as first_nn,
       last_value(cmt) ignore nulls over (partition by l_orderkey order by l_linenumber
             rows between unbounded preceding and unbounded following) as last_nn,
       nth_value(cmt, 2) over (partition by l_orderkey order by l_linenumber
             rows between unbounded preceding and unbounded following) as second_c
from (select l_orderkey, l_linenumber,
             case when l_linenumber % 2 = 0 then null else l_returnflag end as cmt
      from lineitem where l_orderkey < 60)
window w as (partition by l_orderkey order by l_linenumber)
""",
    oracle="""
select l_orderkey, l_linenumber,
       lead(cmt) over w as next_c,
       lag(cmt, 1, 'none') over w as prev_c,
       first_value(cmt ignore nulls) over (partition by l_orderkey order by l_linenumber
             rows between unbounded preceding and unbounded following) as first_nn,
       last_value(cmt ignore nulls) over (partition by l_orderkey order by l_linenumber
             rows between unbounded preceding and unbounded following) as last_nn,
       nth_value(cmt, 2) over (partition by l_orderkey order by l_linenumber
             rows between unbounded preceding and unbounded following) as second_c
from (select l_orderkey, l_linenumber,
             case when l_linenumber % 2 = 0 then null else l_returnflag end as cmt
      from lineitem where l_orderkey < 60)
window w as (partition by l_orderkey order by l_linenumber)
""",
)

_q("op_window_range_frame", """
select p_partkey,
       count(*) over (order by p_size range between 2 preceding and current row) as n_close
from part
where p_partkey < 200
""")

# per-partition limit (PartitionLimitRecordBatch analog)
_q("op_partition_limit", """
select * from (
  select c_nationkey, c_custkey,
         row_number() over (partition by c_nationkey order by c_acctbal desc, c_custkey) as rn
  from customer
) t
where rn <= 3
order by c_nationkey, rn
""")

# ------------------------------------------------- sort / limit / values

_q("op_topn", """
select o_orderkey, round(o_totalprice, 2) as o_totalprice
from orders
order by o_totalprice desc, o_orderkey
limit 25
""")

_q("op_limit_offset", """
select o_orderkey
from orders
order by o_orderkey
limit 10 offset 20
""")

_q("op_values", """
select * from (values (1, 'one'), (2, 'two'), (3, 'three')) as t(id, name)
order by id
""")

_q("op_sort_multi_key", """
select c_custkey, c_nationkey, c_mktsegment
from customer
where c_custkey < 100
order by c_nationkey asc, c_mktsegment desc, c_custkey
""")

# ------------------------------------------- complex data / lateral

# FLATTEN / LateralJoin+Unnest (FlattenRecordBatch.java:70, UnnestRecordBatch.java:55)
_q(
    "op_flatten_explode",
    """
select w as word, count(*) as n
from documents
lateral view explode(split(text, ' ')) t as w
where doc_id < 50
group by w
having count(*) > 20
order by w
""",
    oracle="""
select w as word, count(*) as n
from (select unnest(string_split(text, ' ')) as w from documents where doc_id < 50) t
group by w
having count(*) > 20
order by w
""",
)

# kvgen + unpivot via stack (Mappify.java / UnpivotMapsRecordBatch.java)
_q(
    "op_unpivot_stack",
    """
select c_custkey, metric, round(val, 2) as val
from customer
lateral view stack(2, 'acctbal', c_acctbal, 'nationkey', cast(c_nationkey as double)) s as metric, val
where c_custkey < 20
order by c_custkey, metric
""",
    oracle="""
select c_custkey, metric, round(val, 2) as val
from (
  select c_custkey, 'acctbal' as metric, c_acctbal as val from customer
  union all
  select c_custkey, 'nationkey' as metric, cast(c_nationkey as double) as val from customer
) u
where c_custkey < 20
order by c_custkey, metric
""",
)

# PIVOT (transpose statuses to columns)
_q(
    "op_pivot",
    """
select * from (
  select o_orderpriority, o_orderstatus, o_totalprice from orders
)
pivot (round(sum(o_totalprice), 2) for o_orderstatus in ('O', 'F', 'P'))
order by o_orderpriority
""",
    oracle="""
select o_orderpriority,
       round(sum(case when o_orderstatus = 'O' then o_totalprice end), 2) as "O",
       round(sum(case when o_orderstatus = 'F' then o_totalprice end), 2) as "F",
       round(sum(case when o_orderstatus = 'P' then o_totalprice end), 2) as "P"
from orders
group by o_orderpriority
order by o_orderpriority
""",
)

# convert_from(col,'JSON') analog: JSON path extraction on events.props
# (conv/JsonConvertFrom.java; Spark: get_json_object / from_json)
_q(
    "op_convert_from_json",
    """
select event_type,
       round(sum(cast(get_json_object(props, '$.k') as double)), 2) as sum_k,
       count(*) as n
from events
group by event_type
order by event_type
""",
    oracle="""
select event_type,
       round(sum(cast(json_extract_string(props, '$.k') as double)), 2) as sum_k,
       count(*) as n
from events
group by event_type
order by event_type
""",
)

# ------------------------------------------------- scalar function families

_q("op_string_fns", """
select c_custkey,
       lower(c_name) as lo, upper(c_name) as up,
       substring(c_name, 1, 8) as sub,
       replace(c_name, 'Customer', 'C') as rep,
       reverse(c_name) as rev,
       lpad(cast(c_custkey as varchar(12)), 12, '0') as pad,
       trim(concat(' ', c_name, ' ')) as trimmed,
       split_part(c_name, '#', 2) as num_part,
       left(c_name, 4) as l4, right(c_name, 4) as r4,
       length(c_name) as len,
       instr(c_name, '#') as pos
from customer
where c_custkey < 30
""")

_q(
    "op_date_fns",
    """
select o_orderkey,
       cast(year(o_orderdate) as int) as y,
       cast(month(o_orderdate) as int) as m,
       cast(day(o_orderdate) as int) as d,
       date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd') as mstart,
       date_format(last_day(o_orderdate), 'yyyy-MM-dd') as mend,
       cast(quarter(o_orderdate) as int) as q,
       cast(dayofweek(o_orderdate) as int) as dow,
       datediff(date '2000-01-01', o_orderdate) as days_to_2000
from orders
where o_orderkey < 100
""",
    oracle="""
select o_orderkey,
       cast(year(o_orderdate) as int) as y,
       cast(month(o_orderdate) as int) as m,
       cast(day(o_orderdate) as int) as d,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') as mstart,
       strftime(last_day(cast(o_orderdate as date)), '%Y-%m-%d') as mend,
       cast(quarter(o_orderdate) as int) as q,
       cast(dayofweek(o_orderdate) as int) + 1 as dow,
       datediff('day', cast(o_orderdate as date), date '2000-01-01') as days_to_2000
from orders
where o_orderkey < 100
""",
)

_q("op_math_fns", """
select l_orderkey, l_linenumber,
       abs(l_quantity - 25) as a,
       cast(ceil(l_discount * 100) as bigint) as c,
       cast(floor(l_tax * 100) as bigint) as f,
       round(sqrt(l_quantity), 4) as sq,
       round(exp(l_discount), 6) as e,
       round(ln(l_quantity + 1), 6) as lg,
       round(log10(l_extendedprice), 6) as l10,
       round(power(l_quantity, 2), 2) as pw,
       mod(cast(l_quantity as int), 7) as md,
       cast(sign(l_quantity - 25) as int) as sg
from lineitem
where l_orderkey < 40
""")

# contrib UDF families (string distance, CIDR, AES roundtrip, query
# parsing — ops/phonetics, ops/strdist, functions.py parity layer);
# DuckDB oracles via its native levenshtein/jaccard + closed-form CIDR
_q(
    "op_contrib_fns",
    """
select c_custkey,
       cast(levenshtein_distance(c_name, c_mktsegment) as double) as lev,
       round(jaccard_distance(c_name, c_mktsegment), 6) as jac,
       aes_decrypt(aes_encrypt(c_name, 'key1'), 'key1') as aes_rt,
       in_network(concat('10.', cast(c_custkey % 256 as string), '.7.9'),
                  '10.0.0.0/9') as innet,
       netmask(concat('10.', cast(c_custkey % 256 as string), '.0.0/16')) as nm,
       low_address(concat('10.', cast(c_custkey % 256 as string), '.0.0/16')) as lo,
       high_address(concat('10.', cast(c_custkey % 256 as string), '.0.0/16')) as hi,
       address_count(concat('10.', cast(c_custkey % 256 as string), '.0.0/16')) as cnt,
       parse_query(concat('u=', cast(c_custkey as string), '&v=', c_mktsegment))['u'] as pq,
       parentpath(concat('/data/', c_mktsegment, '/f.parquet')) as pp,
       repeatstr(substring(c_name, 1, 2), 3) as rp,
       is_empty(nullif(c_mktsegment, 'BUILDING')) as emp
from customer
where c_custkey <= 200
""",
    oracle="""
select c_custkey,
       cast(levenshtein(c_name, c_mktsegment) as double) as lev,
       round(1.0 - jaccard(c_name, c_mktsegment), 6) as jac,
       c_name as aes_rt,
       (c_custkey % 256) < 128 as innet,
       '255.255.0.0' as nm,
       concat('10.', cast(c_custkey % 256 as varchar), '.0.1') as lo,
       concat('10.', cast(c_custkey % 256 as varchar), '.255.254') as hi,
       cast(65534 as bigint) as cnt,
       cast(c_custkey as varchar) as pq,
       concat('/data/', c_mktsegment) as pp,
       repeat(substring(c_name, 1, 2), 3) as rp,
       (c_mktsegment = 'BUILDING') as emp
from customer
where c_custkey <= 200
""",
)

_q(
    "op_hash_fns",
    """
select c_custkey, md5(c_name) as h_md5, sha2(c_name, 256) as h_sha256
from customer
where c_custkey < 20
""",
    oracle="""
select c_custkey, md5(c_name) as h_md5, sha256(c_name) as h_sha256
from customer
where c_custkey < 20
""",
)

_q("op_conditional_fns", """
select o_orderkey,
       case when o_totalprice > 100000 then 'big' when o_totalprice > 10000 then 'mid' else 'small' end as bucket,
       coalesce(nullif(o_orderstatus, 'O'), 'open') as status2,
       (o_orderstatus = 'F') as is_f
from orders
where o_orderkey < 60
""")

_q("op_cast_fns", """
select o_orderkey,
       cast(floor(o_totalprice) as bigint) as price_int,
       cast(o_orderkey as varchar(20)) as key_str,
       cast(o_orderdate as date) as d,
       cast(cast(o_orderkey as double) as int) as roundtrip
from orders
where o_orderkey < 60
""")

# -------------------------------------------- subquery forms (§3/§4 rewrites)

_q("op_scalar_subquery", """
select c_custkey, round(c_acctbal, 2) as c_acctbal
from customer
where c_acctbal > (select avg(c_acctbal) * 1.8 from customer)
order by c_custkey
""")

_q("op_in_subquery", """
select s_suppkey, s_name
from supplier
where s_nationkey in (select n_nationkey from nation where n_regionkey = 2)
order by s_suppkey
""")

_q("op_correlated_subquery", """
select c_custkey
from customer c
where c_acctbal > (
  select coalesce(avg(c2.c_acctbal), 0) + 4000 from customer c2
  where c2.c_nationkey = c.c_nationkey
)
order by c_custkey
""")

# ------------------------------------------------ time windows (events)

# tumbling window: Spark window() vs DuckDB time_bucket
_q(
    "op_time_window_tumbling",
    """
select cast(window.start as timestamp_ntz) as ws, event_type, count(*) as n,
       round(sum(value), 2) as sum_v
from (
  select window(ts, '6 hours') as window, event_type, value from events
)
group by window, event_type
having count(*) > 5
order by ws, event_type
""",
    oracle="""
select time_bucket(interval '6 hours', ts) as ws, event_type, count(*) as n,
       round(sum(value), 2) as sum_v
from events
group by 1, 2
having count(*) > 5
order by 1, 2
""",
)

# session windows (gap 10 min): Spark session_window vs gaps-and-islands SQL
_q(
    "op_session_window",
    """
select user_id, cast(session_window.start as timestamp_ntz) as session_start,
       count(*) as n_events
from (
  select session_window(ts, '10 minutes') as session_window, user_id from events
)
group by session_window, user_id
having count(*) >= 3
order by user_id, session_start
""",
    oracle="""
with flagged as (
  select user_id, ts,
         case when ts - lag(ts) over (partition by user_id order by ts, event_id)
                   > interval '10 minutes'
              or lag(ts) over (partition by user_id order by ts, event_id) is null
              then 1 else 0 end as new_sess
  from events
),
sessions as (
  select user_id, ts,
         sum(new_sess) over (partition by user_id order by ts rows unbounded preceding) as sess_id
  from flagged
)
select user_id, min(ts) as session_start, count(*) as n_events
from sessions
group by user_id, sess_id
having count(*) >= 3
order by user_id, session_start
""",
)

# exact-row dedup (dropDuplicates analog; streaming dedup's batch oracle)
_q("op_distinct_rows", """
select distinct user_id, event_type
from events
where user_id < 40
order by user_id, event_type
""")

# ----------------------------------------- more scalar/agg families

# string distance (contrib/udfs StringDistanceFunctions.java)
_q("op_string_distance", """
select c_custkey,
       levenshtein(c_name, 'Customer#000000001') as lev,
       levenshtein(substring(c_name, 10), cast(c_custkey as varchar(18))) as lev2
from customer
where c_custkey < 40
""")

# regexp family (StringFunctions.java:214-299)
_q(
    "op_regexp_fns",
    """
select c_custkey,
       regexp_extract(c_name, '([0-9]+)', 1) as digits,
       regexp_replace(c_name, '[0-9]', '#') as masked,
       (c_name rlike '^Customer#0*[0-9]+$') as well_formed
from customer
where c_custkey < 30
""",
    oracle="""
select c_custkey,
       regexp_extract(c_name, '([0-9]+)', 1) as digits,
       regexp_replace(c_name, '[0-9]', '#', 'g') as masked,
       regexp_matches(c_name, '^Customer#0*[0-9]+$') as well_formed
from customer
where c_custkey < 30
""",
)

# binary codecs (conv/ convert_from/convert_to analogs: base64/hex)
_q(
    "op_encode_fns",
    """
select c_custkey,
       base64(cast(c_name as binary)) as b64,
       hex(cast(c_name as binary)) as hx,
       ascii(c_name) as first_code
from customer
where c_custkey < 25
""",
    oracle="""
select c_custkey,
       to_base64(encode(c_name)) as b64,
       hex(c_name) as hx,
       ascii(c_name) as first_code
from customer
where c_custkey < 25
""",
)

# interval arithmetic (DateTypeFunctions.java:107-166 interval ctors,
# :407-428 date_add/sub with intervals)
_q(
    "op_interval_arith",
    """
select o_orderkey,
       cast(cast(o_orderdate as date) + interval '3' month as date) as plus_3m,
       cast(cast(o_orderdate as date) - interval '90' day as date) as minus_90d,
       cast(cast(o_orderdate as date) + interval '1' year as date) as plus_1y
from orders
where o_orderkey < 80
""",
    oracle="""
select o_orderkey,
       cast(cast(o_orderdate as date) + interval 3 month as date) as plus_3m,
       cast(cast(o_orderdate as date) - interval 90 day as date) as minus_90d,
       cast(cast(o_orderdate as date) + interval 1 year as date) as plus_1y
from orders
where o_orderkey < 80
""",
)

# grouping_id composed from grouping() bits (GroupingFunctions.java:38-61)
_q("op_grouping_id", """
select o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) * 2 + grouping(o_orderpriority) as gid,
       count(*) as n
from orders
group by rollup(o_orderstatus, o_orderpriority)
order by gid, o_orderstatus nulls first, o_orderpriority nulls first
""")


# count(*)-only query (Drill: ConvertCountToDirectScanRule — metadata-only
# scan; Spark reads parquet footers via the aggregate pushdown path)
_q("op_count_star", """
select count(*) as n_rows from lineitem
""")

# array function family over split() arrays (RepeatedValueVectors surface:
# repeated_count ≈ size/len, repeated_contains ≈ array_contains)
_q(
    "op_array_fns",
    """
select doc_id,
       size(split(trim(text), ' ')) as n_tokens,
       array_contains(split(trim(lower(text)), ' '), 'the') as has_the,
       size(array_distinct(split(trim(lower(text)), ' '))) as n_unique
from documents
where doc_id < 40
""",
    oracle="""
select doc_id,
       len(string_split(trim(text), ' ')) as n_tokens,
       list_contains(string_split(trim(lower(text)), ' '), 'the') as has_the,
       len(list_distinct(string_split(trim(lower(text)), ' '))) as n_unique
from documents
where doc_id < 40
""",
)

# lead/lag with offset + default (WindowFunction.java LEAD/LAG branch)
_q("op_window_lead_default", """
select o_orderkey,
       lag(o_orderkey, 2, -1) over (partition by o_custkey order by o_orderkey) as prev2,
       lead(o_orderkey, 2, -1) over (partition by o_custkey order by o_orderkey) as next2
from orders
where o_custkey < 40
""")

# ---------------------------------------------- null semantics (VALUES-built)
# The fixtures carry no nulls; these build nullable rows inline —
# reference model: TestJoinNullable.java (null keys never equi-match),
# TestUnionAll null reconciliation, null-aware aggs/sorts.

_q("op_join_nullable", """
with l as (select * from (values (1, 'a'), (2, 'b'), (cast(null as int), 'c')) as t(k, v)),
     r as (select * from (values (1, 'x'), (cast(null as int), 'y')) as t(k, w))
select l.k as k, l.v as v, r.w as w
from l left join r on l.k = r.k
order by v
""")

_q("op_agg_nulls", """
with t as (select * from (values (1, 10.0), (1, cast(null as double)), (2, 20.0),
                                 (cast(null as int), 30.0)) as t(k, x))
select k,
       count(*) as n_rows,
       count(x) as n_vals,
       round(coalesce(sum(x), 0), 2) as sum_x,
       round(coalesce(avg(x), 0), 2) as avg_x
from t
group by k
order by k nulls first
""")

_q("op_sort_nulls", """
with t as (select * from (values (1, 'a'), (cast(null as int), 'b'), (3, 'c'),
                                 (cast(null as int), 'd')) as t(k, v))
select k, v from t
order by k desc nulls last, v
""")

_q("op_null_predicates", """
with t as (select * from (values (1), (cast(null as int)), (3)) as t(k))
select
  count(*) as n,
  cast(sum(case when k is null then 1 else 0 end) as bigint) as n_null,
  cast(sum(case when k is not null then 1 else 0 end) as bigint) as n_notnull,
  cast(sum(case when k is distinct from 1 then 1 else 0 end) as bigint) as n_distinct_from_1
from t
""")

# null-safe equality: Spark <=>  vs  DuckDB IS NOT DISTINCT FROM
_q(
    "op_null_safe_join",
    """
with l as (select * from (values (1), (cast(null as int))) as t(k)),
     r as (select * from (values (1), (cast(null as int))) as t(k))
select count(*) as n_matches
from l join r on l.k <=> r.k
""",
    oracle="""
with l as (select * from (values (1), (cast(null as int))) as t(k)),
     r as (select * from (values (1), (cast(null as int))) as t(k))
select count(*) as n_matches
from l join r on l.k is not distinct from r.k
""",
)

# ------------------------------------------------- decimal arithmetic
# (Drill DECIMAL9/18/28/38 + VARDECIMAL -> DecimalType; exact sums must
# agree bit-for-bit across engines, unlike float aggregation)

_q("op_decimal_agg", """
select l_returnflag,
       cast(sum(cast(l_extendedprice as decimal(18, 2))) as double) as sum_price,
       cast(sum(cast(l_quantity as decimal(12, 2)) * cast(l_discount as decimal(8, 4))) as double) as sum_qd,
       cast(min(cast(l_extendedprice as decimal(18, 2))) as double) as min_price,
       cast(max(cast(l_extendedprice as decimal(18, 2))) as double) as max_price
from lineitem
group by l_returnflag
order by l_returnflag
""")

_q("op_decimal_arith", """
select o_orderkey,
       cast(cast(o_totalprice as decimal(18, 2)) + cast(1.05 as decimal(6, 2)) as double) as plus_d,
       cast(cast(o_totalprice as decimal(18, 2)) * cast(2 as decimal(4, 0)) as double) as times_2,
       cast(round(cast(o_totalprice as decimal(18, 2)) / cast(3 as decimal(4, 0)), 4) as double) as div_3
from orders
where o_orderkey < 50
""")

# ------------------------------------------------- approximate aggregates
# (hll / hll_merge, StatisticsAggrFunctions.java:148-230; tdigest
# TDigestFunctions.java:57). Estimates are hash-design-specific, so these
# are rows-only in the driver compare (no oracle by design); the pytest
# suite bounds their error against exact values instead.

ROWS_ONLY: dict[str, str] = {
    "op_agg_approx_ndv": """
select o_orderstatus,
       approx_count_distinct(o_custkey) as approx_cust,
       count(*) as n
from orders
group by o_orderstatus
order by o_orderstatus
""",
    "op_agg_hll_sketch": """
select hll_sketch_estimate(hll_sketch_agg(o_custkey)) as est_custkeys
from orders
""",
}

# approx_percentile upgraded rows-only -> hash-oracle (r13): Spark's
# GK summary keeps EVERY sample while n <= accuracy, so with accuracy
# 100k the sf0.01 groups (~20-30k rows) are answered EXACTLY, and the
# exact-mode rank convention was measured identical to DuckDB's
# quantile_disc (incl. even counts and repeated values). The oracle
# checks the sketch path in its exact regime — the approximate regime
# (n > accuracy, reached at sf1 in the soak) stays bounded by the
# pytest error-band test. quantile_disc returns DECIMAL for int
# input; cast to double so the hash normalizer sees matching types.
_q("op_agg_approx_percentile", """
select l_returnflag,
       approx_percentile(l_quantity, 0.5, 100000) as approx_med,
       approx_percentile(l_quantity, array(0.25, 0.9), 100000) as approx_qs
from lineitem
group by l_returnflag
order by l_returnflag
""", """
select l_returnflag,
       cast(quantile_disc(l_quantity, 0.5) as double) as approx_med,
       cast(quantile_disc(l_quantity, [0.25, 0.9]) as double[]) as approx_qs
from lineitem
group by l_returnflag
order by l_returnflag
""")


def make_query_fn(sql: str):
    from drill_spark.functions import ensure_registered, rewrite_convert_calls

    needed = tables_in(sql)
    sql = rewrite_convert_calls(sql)  # static text: expand drill-isms once

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_registered(spark)
        ensure_views(spark, sf_dir, needed)
        return spark.sql(sql)

    return fn


def queries() -> dict:
    out = {name: make_query_fn(spec.spark_sql) for name, spec in SPECS.items()}
    out.update({name: make_query_fn(sql) for name, sql in ROWS_ONLY.items()})
    return out


def oracle_sql() -> dict[str, str]:
    return {name: (spec.oracle or spec.spark_sql) for name, spec in SPECS.items()}
