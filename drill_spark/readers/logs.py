"""Regex-driven text formats: Drill's generic `log` format plugin and
its httpd/syslog cousins re-expressed as Catalyst pipelines.

Reference: contrib/format-log/ (LogFormatPlugin — a format plugin
configured with a regex + named fields, each line matched into columns),
contrib/format-httpd/ (HttpdLogFormatPlugin), contrib/format-syslog/.

Spark shape: `spark.read.text` (one string column, splittable files,
parallel by HDFS block) + one `regexp_extract` per field — all
whole-stage codegen, no Python. Unmatched lines surface in a
`_unmatched` column instead of erroring (Drill keeps them as nulls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Apache combined log format (HttpdLogFormatPlugin's default)
HTTPD_COMBINED_REGEX = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\S+) "([^"]*)" "([^"]*)"'
)
HTTPD_COMBINED_FIELDS = [
    ("client_ip", "string"),
    ("ident", "string"),
    ("user", "string"),
    ("ts_raw", "string"),
    ("method", "string"),
    ("path", "string"),
    ("protocol", "string"),
    ("status", "int"),
    ("bytes", "long"),
    ("referer", "string"),
    ("user_agent", "string"),
]

# RFC 3164-ish syslog line (format-syslog)
SYSLOG_REGEX = r"^<(\d+)>(\w{3}\s+\d+ \d{2}:\d{2}:\d{2}) (\S+) ([^:\[]+)(?:\[(\d+)\])?: (.*)$"
SYSLOG_FIELDS = [
    ("pri", "int"),
    ("ts_raw", "string"),
    ("host", "string"),
    ("app", "string"),
    ("pid", "int"),
    ("message", "string"),
]


def read_log(
    spark: SparkSession,
    path: str,
    regex: str,
    fields: list[tuple[str, str]],
    keep_unmatched: bool = False,
) -> DataFrame:
    """Generic regex log table (LogFormatPlugin analog).

    fields = [(name, spark_type), ...] — one per regex capture group.
    Matched lines parse into typed columns; unmatched lines yield nulls
    (and the raw line in `_unmatched` when keep_unmatched).
    """
    raw = spark.read.text(path)
    matched = raw.withColumn("_m", F.col("value").rlike(regex))
    cols = [
        F.when(F.col("_m"), F.regexp_extract("value", regex, i + 1)).cast(typ).alias(name)
        for i, (name, typ) in enumerate(fields)
    ]
    if keep_unmatched:
        cols.append(F.when(~F.col("_m"), F.col("value")).alias("_unmatched"))
    return matched.select(*cols)


def read_httpd_log(spark: SparkSession, path: str, **kw) -> DataFrame:
    df = read_log(spark, path, HTTPD_COMBINED_REGEX, HTTPD_COMBINED_FIELDS, **kw)
    return df.withColumn(
        "ts", F.to_timestamp("ts_raw", "dd/MMM/yyyy:HH:mm:ss Z")
    )


def read_syslog(spark: SparkSession, path: str, **kw) -> DataFrame:
    df = read_log(spark, path, SYSLOG_REGEX, SYSLOG_FIELDS, **kw)
    # RFC3164 severity/facility decomposition of PRI
    return df.withColumn("severity", F.col("pri") % 8).withColumn(
        "facility", F.col("pri") / 8
    ).withColumn("facility", F.col("facility").cast("int"))
