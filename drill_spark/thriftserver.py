"""JDBC/ODBC wire protocol surface: Spark's HiveServer2-compatible
Thrift server over the engine session.

Reference: Drill ships its own JDBC driver (``exec/jdbc/``,
``DrillJdbcDriverIT``) and ODBC client (``contrib/native/client``), so
external BI tools speak SQL to a drillbit over the wire. The Spark-first
equivalent is the HiveServer2 Thrift protocol every JDBC/ODBC BI
connector already speaks: ``start_thrift_server`` boots
``HiveThriftServer2`` inside the engine's JVM over THIS session's
SQLContext, so workspaces/views registered here are queryable from any
``jdbc:hive2://`` client.

Session-visibility note: each JDBC connection gets its own Spark session
state, so plain temp views are not visible across the wire. Tables are
therefore published as GLOBAL temp views (``global_temp.<name>``), which
Spark shares across sessions by design — ``publish_views=True`` does
this for every fixture/temp view name passed in.

The smoke path is real: tests drive ``org.apache.hive.jdbc.HiveDriver``
(bundled with pyspark) through py4j against the running server — an
actual Thrift wire roundtrip, not a mock.
"""

from __future__ import annotations

import socket
import time

from pyspark.sql import DataFrame, SparkSession


def _free_port(host: str) -> int:
    s = socket.socket()
    s.bind((host, 0))
    port = s.getsockname()[1]
    s.close()
    return port


def start_thrift_server(
    spark: SparkSession,
    host: str = "127.0.0.1",
    port: int = 0,
    publish: dict[str, DataFrame] | None = None,
    timeout_s: float = 60.0,
):
    """Start HiveThriftServer2 on this session's JVM; returns
    ``(server, port)``. ``publish`` DataFrames become global temp views
    visible to every JDBC connection. ``server.stop()`` shuts it down."""
    if port == 0:
        port = _free_port(host)
    jvm = spark.sparkContext._jvm
    try:
        hts = jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
        # touch the class so a missing jar fails here, crisply
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.hive.thriftserver.HiveThriftServer2")
    except Exception as e:  # pragma: no cover - jar always bundled in pyspark
        raise NotImplementedError(
            "the JDBC/ODBC surface requires spark-hive-thriftserver on the "
            "classpath (bundled with the pyspark distribution)") from e
    spark.conf.set("hive.server2.thrift.port", str(port))
    spark.conf.set("hive.server2.thrift.bind.host", host)
    # every JDBC connection shares THIS session's state, so the
    # engine's registered functions (drill compat layer) and temp views
    # resolve over the wire — the embedded-drillbit behavior
    try:
        spark.conf.set("spark.sql.hive.thriftServer.singleSession", "true")
    except Exception:
        pass  # older/locked conf: connections still see global views
    for name, df in (publish or {}).items():
        df.createOrReplaceGlobalTempView(name)
    server = hts.startWithContext(spark._jsparkSession.sqlContext())
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            socket.create_connection((host, port), 1).close()
            return server, port
        except OSError:
            time.sleep(0.25)
    server.stop()
    raise TimeoutError(f"thrift server did not open {host}:{port} "
                       f"within {timeout_s}s")


def publish_fixture_tables(session, sf_dir: str) -> dict[str, DataFrame]:
    """The TESTDATA tables as a publishable view map (global_temp.*)."""
    from drill_spark.session import FIXTURE_TABLES, load_fixture
    import os

    out = {}
    for t in FIXTURE_TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            out[t] = load_fixture(session.spark, sf_dir, t)
    return out


def jdbc_query(
    spark: SparkSession, port: int, sql: str, host: str = "127.0.0.1"
) -> list[tuple]:
    """Execute SQL through the REAL Hive JDBC driver in the JVM (the
    wire path a BI tool takes), returning rows as python tuples.
    Column values come back via ResultSet.getObject → py4j."""
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName("org.apache.hive.jdbc.HiveDriver")
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:hive2://{host}:{port}/default", "", "")
    try:
        st = conn.createStatement()
        rs = st.executeQuery(sql)
        meta = rs.getMetaData()
        ncols = meta.getColumnCount()
        rows: list[tuple] = []
        while rs.next():
            rows.append(tuple(rs.getObject(i + 1) for i in range(ncols)))
        return rows
    finally:
        conn.close()
