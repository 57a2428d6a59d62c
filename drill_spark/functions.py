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
    "age": (
        "a TIMESTAMP, b TIMESTAMP",
        "make_interval(0, CAST(months_between(a, b) AS INT), 0, 0, 0, 0, 0)",
    ),
    "statement_timestamp": ("", "current_timestamp()"),  # :338-383
    "timeofday": ("", "date_format(current_timestamp(), 'yyyy-MM-dd HH:mm:ss.SSS zzz')"),
    # time_bucket over epoch millis (contrib/udfs TimeBucketFunctions.java)
    "time_bucket": (
        "ts TIMESTAMP, width_ms BIGINT",
        "timestamp_millis(CAST(floor(unix_millis(ts) / width_ms) * width_ms AS BIGINT))",
    ),
    "time_bucket_ms": ("ms BIGINT, width_ms BIGINT", "CAST(floor(ms / width_ms) * width_ms AS BIGINT)"),
    # --- math (MathFunctions.java:37-213) ---
    "to_number": ("s STRING, fmt STRING", "CAST(regexp_replace(s, '[^0-9.+-]', '') AS DOUBLE)"),
    # --- union-type helpers (UnionFunctions.java; no union vector in Spark,
    # typeof() exists in Spark SQL already) ---
    "sqltypeof": ("x STRING", "typeof(x)"),
    "drilltypeof": ("x STRING", "typeof(x)"),
    # --- context (ContextFunctions.java) ---
    "session_id": ("", "uuid()"),
    "current_schema": ("", "current_database()"),
}


def _stmt(name: str, sig: str, body: str) -> str:
    # RETURNS type is inferred from the body expression (Spark >= 4.0).
    return f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) RETURN {body}"


def register_all(spark: SparkSession) -> list[str]:
    """Register the compat functions; returns the list registered.

    Uses SQL UDFs (Spark >= 4.0 `CREATE TEMPORARY FUNCTION ... RETURN
    <expr>`) so calls inline into Catalyst plans and stay inside
    whole-stage codegen — no Python round trip.
    """
    registered: list[str] = []
    for name, (sig, body) in _SQL_UDFS.items():
        try:
            spark.sql(_stmt(name, sig, body))
            registered.append(name)
        except Exception:
            # Older Spark without SQL UDFs: skip; python helpers in
            # drill_spark.ops still provide the functionality.
            pass
    return registered
