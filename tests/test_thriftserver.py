"""JDBC/ODBC wire surface: a real HiveThriftServer2 over the engine
session, driven by the real org.apache.hive.jdbc.HiveDriver (both
bundled with pyspark) — an actual Thrift roundtrip on a socket, the
analog of Drill's exec/jdbc driver tests.

One server per JVM: HiveThriftServer2 keeps static HiveServer2 state,
so a stop/start cycle inside one test process is not reliable — all
wire assertions share a single lifecycle."""

from __future__ import annotations

from drill_spark.thriftserver import jdbc_query


def test_jdbc_wire_roundtrip(session):
    server, port = session.serve_jdbc(sf_dir="/root/testdata/sf0.001")
    try:
        # join + aggregate through the wire
        rows = jdbc_query(
            session.spark, port,
            "SELECT r.r_name, COUNT(*) AS n "
            "FROM global_temp.nation n JOIN global_temp.region r "
            "ON n.n_regionkey = r.r_regionkey "
            "GROUP BY r.r_name ORDER BY r.r_name")
        assert [(str(a), int(b)) for a, b in rows] == [
            ("AFRICA", 5), ("AMERICA", 5), ("ASIA", 5),
            ("EUROPE", 5), ("MIDDLE EAST", 5)]

        # fixture publication: every TESTDATA table is reachable
        cnt = jdbc_query(
            session.spark, port,
            "SELECT COUNT(*) AS n FROM global_temp.lineitem")
        assert [int(r[0]) for r in cnt] == [6000]

        # scalar expression path (no FROM): planner + type marshalling
        one = jdbc_query(session.spark, port, "SELECT 1 + 1 AS two")
        assert [tuple(map(int, r)) for r in one] == [(2,)]

        # the compat function registry is visible across the wire
        # (session-scoped UDFs ride the shared session state)
        fx = jdbc_query(session.spark, port,
                        "SELECT soundex('jaime') AS sx,"
                        " levenshtein_distance('abc', 'abd') AS lev,"
                        " netmask('10.0.0.0/16') AS nm")
        assert [(str(a), float(b), str(c)) for a, b, c in fx] == [("J500", 1.0, "255.255.0.0")]
    finally:
        server.stop()
