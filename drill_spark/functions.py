"""Drill function-compat layer.

Drill's scalar function registry lives at
exec/java-exec/.../expr/fn/FunctionImplementationRegistry.java:83 with
~hundreds of @FunctionTemplate classes (StringFunctions.java:98-1945,
DateTypeFunctions.java:61-572, MathFunctions.java:37-213, Mappify.java:53,
SimpleRepeatedFunctions.java:45, conv/JsonConvertFrom.java, ...).

Most names exist in Spark already (SURVEY §2.9). This module registers the
*missing* Drill-named functions as **SQL UDFs** (Spark 4 `CREATE TEMPORARY
FUNCTION ... RETURN <expr>`), so the implementations stay JVM-side inside
Catalyst / whole-stage codegen — no Python round trip in the hot path.
Only functions whose semantics genuinely cannot be expressed as a SQL
expression fall back to Python UDFs (none in the core set).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (arg signature, return expression). All pure Catalyst expressions.
_SQL_UDFS: dict[str, tuple[str, str]] = {
    # --- complex / repeated (Drill signature surface, SURVEY §2.8) ---
    # kvgen: struct/map -> array<struct<key,value>> (Mappify.java:53-66)
    "kvgen": ("m MAP<STRING, STRING>", "map_entries(m)"),
    # repeated_count: array length (RepeatedCountFunctions.java)
    "repeated_count": ("a ARRAY<STRING>", "size(a)"),
    # repeated_contains (SimpleRepeatedFunctions.java:45+)
    "repeated_contains": ("a ARRAY<STRING>, x STRING", "array_contains(a, x)"),
    # --- string (StringFunctions.java) — names Spark lacks ---
    "binary_string": ("s STRING", "cast(s AS BINARY)"),  # StringFunctions.java:1794
    "string_binary": ("b BINARY", "cast(b AS STRING)"),  # StringFunctions.java:1815
    "charsubstring": ("s STRING, p INT, l INT", "substring(s, p, l)"),
    "strpos": ("s STRING, sub STRING", "instr(s, sub)"),  # StringFunctions.java:640
    # --- date/time (DateTypeFunctions.java) ---
    "isdate": ("s STRING", "try_cast(s AS DATE) IS NOT NULL"),  # :61
    # age -> rendered year-month interval string (interval types are
    # not collectable to Python; keep the SQL-visible semantics)
    "age": (
        "a TIMESTAMP, b TIMESTAMP",
        "concat(CAST(CAST(months_between(a, b) AS INT) div 12 AS STRING), ' years ',"
        " CAST(CAST(months_between(a, b) AS INT) % 12 AS STRING), ' mons')",
    ),
    "statement_timestamp": ("", "current_timestamp()"),  # :338-383
    "timeofday": ("", "date_format(current_timestamp(), 'yyyy-MM-dd HH:mm:ss.SSS zzz')"),
    # time_bucket over epoch millis (contrib/udfs TimeBucketFunctions.java)
    "time_bucket": (
        "ts TIMESTAMP, width_ms BIGINT",
        "timestamp_millis(CAST(floor(unix_millis(ts) / width_ms) * width_ms AS BIGINT))",
    ),
    "time_bucket_ms": ("ms BIGINT, width_ms BIGINT", "CAST(floor(ms / width_ms) * width_ms AS BIGINT)"),
    # --- union-type helpers (UnionFunctions.java; no union vector in Spark,
    # typeof() exists in Spark SQL already) ---
    "sqltypeof": ("x STRING", "typeof(x)"),
    "drilltypeof": ("x STRING", "typeof(x)"),
    # --- context (ContextFunctions.java) ---
    "session_id": ("", "uuid()"),
    # --- pattern matching (StringFunctions.java like/ilike/similar);
    # ilike / to_number / current_schema are Spark 4 built-ins already ---
    # Drill regexp_matches = full-string match (java Pattern.matches)
    "regexp_matches": ("s STRING, pat STRING", "s RLIKE concat('^(?:', pat, ')$')"),
    "similar_to": (
        "s STRING, pat STRING",
        "s RLIKE concat('^', regexp_replace(regexp_replace(pat, '%', '.*'), '_', '.'), '$')",
    ),
    # --- network (contrib/udfs NetworkFunctions.java) ---
    "inet_aton": (
        "ip STRING",
        "CAST(split(ip, '\\\\.')[0] AS BIGINT) * 16777216 + CAST(split(ip, '\\\\.')[1] AS BIGINT) * 65536"
        " + CAST(split(ip, '\\\\.')[2] AS BIGINT) * 256 + CAST(split(ip, '\\\\.')[3] AS BIGINT)",
    ),
    "inet_ntoa": (
        "n BIGINT",
        "concat(CAST(n div 16777216 % 256 AS STRING), '.', CAST(n div 65536 % 256 AS STRING), '.',"
        " CAST(n div 256 % 256 AS STRING), '.', CAST(n % 256 AS STRING))",
    ),
    "is_valid_ip": (
        "ip STRING",
        r"ip RLIKE '^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$'",
    ),
    "is_private_ip": (
        "ip STRING",
        r"ip RLIKE '^(10\\.|192\\.168\\.|172\\.(1[6-9]|2[0-9]|3[01])\\.)'",
    ),
    # --- threat hunting (contrib/udfs ThreatHuntingFunctions.java) ---
    "punycode_detect": ("s STRING", "s LIKE '%xn--%'"),
    # shannon entropy of a string's characters (DGA-domain heuristic),
    # pure higher-order-function expression — stays in Catalyst
    "entropy": (
        "s STRING",
        "aggregate(array_distinct(split(s, '')), CAST(0 AS DOUBLE),"
        " (acc, d) -> acc - (size(filter(split(s, ''), c -> c = d)) / CAST(length(s) AS DOUBLE))"
        " * log2(size(filter(split(s, ''), c -> c = d)) / CAST(length(s) AS DOUBLE)))",
    ),
}


def _stmt(name: str, sig: str, body: str) -> str:
    # RETURNS type is inferred from the body expression (Spark >= 4.0).
    return f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) RETURN {body}"


def register_all(spark: SparkSession, strict: bool = False) -> list[str]:
    """Register the compat functions; returns the list registered.

    Uses SQL UDFs (Spark >= 4.0 `CREATE TEMPORARY FUNCTION ... RETURN
    <expr>`) so calls inline into Catalyst plans and stay inside
    whole-stage codegen — no Python round trip.
    """
    registered: list[str] = []
    failed: list[tuple[str, Exception]] = []
    for name, (sig, body) in _SQL_UDFS.items():
        try:
            spark.sql(_stmt(name, sig, body))
            registered.append(name)
        except Exception as e:
            # Older Spark without SQL UDFs: skip; python helpers in
            # drill_spark.ops still provide the functionality.
            failed.append((name, e))
    if strict and failed:
        raise RuntimeError(f"compat functions failed to register: {failed}")
    return registered
