"""External storage plugins: JDBC databases and Kafka topics as tables.

Drill references:
- contrib/storage-jdbc/src/main/java/org/apache/drill/exec/store/jdbc/
  JdbcStoragePlugin.java — an external RDBMS as a schema; Drill pushes
  filters/projects/joins down via Calcite's JDBC adapter.
- contrib/storage-kafka/src/main/java/org/apache/drill/exec/store/kafka/
  KafkaStoragePlugin.java — a topic scanned as a batch table with
  kafkaMsgOffset/partition metadata columns.

Spark-first mapping:
- JDBC: ``spark.read.format("jdbc")`` — Catalyst's JDBCRelation prunes
  columns and pushes predicates into the database (visible as
  PushedFilters in the scan node), the same division of labor as
  Drill's JdbcPushDownFilter. Scale: a single-partition JDBC read is a
  driver-side bottleneck at 100 TB, so ``partition_column`` /
  ``num_partitions`` options map straight onto Spark's partitioned
  JDBC scan (parallel range queries against the DB).
- Kafka: ``spark.read.format("kafka")`` with earliest→latest offsets is
  exactly the reference's batch-topic semantics; partitions map 1:1 to
  Kafka partitions (one task per partition-range). The connector jar
  (spark-sql-kafka) is not bundled in every deployment — the error
  names the gap, like the excel reader's openpyxl gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """Read one table (or a ``(select ...) t`` pushdown subquery) from a
    JDBC workspace. Options recognized (Drill's plugin config analogs):
    driver, user, password, partition_column/lower_bound/upper_bound/
    num_partitions (parallel scan), fetchsize."""
    opts = {**(ws_options or {}), **(query_options or {})}
    opts.pop("type", None)
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    # normalize Drill-ish snake_case names onto Spark's JDBC option names
    renames = {
        "partition_column": "partitionColumn",
        "lower_bound": "lowerBound",
        "upper_bound": "upperBound",
        "num_partitions": "numPartitions",
    }
    for k, v in opts.items():
        reader = reader.option(renames.get(k, k), v)
    try:
        return reader.load()
    except Exception as e:
        if "No suitable driver" in str(e) or "ClassNotFoundException" in str(e):
            raise NotImplementedError(
                f"JDBC driver for {url!r} is not on the Spark classpath; "
                "pass driver=<class> and add the jar via spark.jars"
            ) from e
        raise


KAFKA_COLUMNS = ("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")


def read_kafka_topic(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """Read a Kafka topic as a batch table (earliest..latest), the
    reference's KafkaGroupScan semantics. Returns the connector's
    metadata schema (KAFKA_COLUMNS); decode ``value`` downstream with
    convert_from / from_json / our avro decode_file."""
    opts = {**(ws_options or {}), **(query_options or {})}
    opts.pop("type", None)
    reader = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", opts.pop("startingOffsets", "earliest"))
        .option("endingOffsets", opts.pop("endingOffsets", "latest"))
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        msg = str(e)
        if "Failed to find data source: kafka" in msg or "ClassNotFoundException" in msg:
            raise NotImplementedError(
                "the spark-sql-kafka connector jar is not bundled in this "
                "deployment; add org.apache.spark:spark-sql-kafka-0-10 to "
                "spark.jars.packages to enable kafka workspaces"
            ) from e
        raise


def read_mongo_collection(
    spark: SparkSession,
    connection_uri: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """Read ``db.collection`` through the MongoDB Spark connector —
    the reference's mongo storage plugin semantics (contrib/
    storage-mongo MongoStoragePlugin.java: a database as a schema,
    collections as tables, filter/project pushdown via the plugin's
    scan spec; the Spark connector's aggregation-pipeline pushdown is
    the same division of labor). ``table`` is ``<db>.<collection>``
    (Drill's mongo.`db`.`coll` path). Connector jar
    (org.mongodb.spark:mongo-spark-connector) gated like kafka."""
    opts = {**(ws_options or {}), **(query_options or {})}
    opts.pop("type", None)
    db, _, coll = table.partition(".")
    if not coll:
        raise ValueError(f"mongo table must be db.collection, got {table!r}")
    reader = (
        spark.read.format("mongodb")
        .option("connection.uri", connection_uri)
        .option("database", db)
        .option("collection", coll)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        msg = str(e)
        if "Failed to find data source: mongodb" in msg or "ClassNotFoundException" in msg:
            raise NotImplementedError(
                "the mongo-spark connector jar is not bundled in this "
                "deployment; add org.mongodb.spark:mongo-spark-connector "
                "to spark.jars.packages to enable mongo workspaces"
            ) from e
        raise


def read_hive_table(
    spark: SparkSession,
    database: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """Resolve a table through the session's Hive catalog — the
    reference's hive storage plugin semantics (contrib/storage-hive/core
    HiveStoragePlugin.java: metastore databases as schemas, tables
    planned through HiveMetadataProvider; Spark's HiveExternalCatalog
    reads the same metastore, and parquet/orc-backed Hive tables get
    Spark's native vectorized scan via convertMetastoreParquet/Orc).
    ``table`` is ``tbl`` (resolved in ``database``) or ``db.tbl``.
    Requires a hive-enabled session — gated with a naming error like
    the connector workspaces, because catalogImplementation is a
    static conf fixed at the first session build."""
    impl = spark.conf.get("spark.sql.catalogImplementation", "in-memory")
    if impl != "hive":
        raise NotImplementedError(
            "this SparkSession was built without the Hive catalog "
            "(spark.sql.catalogImplementation="
            f"{impl!r}); construct the engine session with "
            "drill_spark.session.get_spark(hive=True) or SPARK_GRAFT_HIVE=1 "
            "to enable hive.<db>.<table> resolution"
        )
    qual = table if "." in table else (f"{database}.{table}" if database else table)
    return spark.table(".".join(f"`{p}`" for p in qual.split(".")))


def read_elasticsearch_index(
    spark: SparkSession,
    nodes: str,
    index: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """Read an index through elasticsearch-hadoop ("es" data source) —
    the reference's elasticsearch plugin semantics (contrib/
    storage-elasticsearch ElasticsearchDrillSchemaFactory.java via
    Calcite's ES adapter: indexes as tables, filters compiled into ES
    queries; es-hadoop's pushdown option is the same). One Spark task
    per index shard. Jar gated like kafka."""
    opts = {**(ws_options or {}), **(query_options or {})}
    opts.pop("type", None)
    reader = (
        spark.read.format("org.elasticsearch.spark.sql")
        .option("es.nodes", nodes)
        .option("es.resource", index)
        .option("pushdown", opts.pop("pushdown", "true"))
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        msg = str(e)
        if "Failed to find data source" in msg or "ClassNotFoundException" in msg:
            raise NotImplementedError(
                "the elasticsearch-hadoop jar is not bundled in this "
                "deployment; add org.elasticsearch:elasticsearch-spark-30 "
                "to spark.jars.packages to enable elasticsearch workspaces"
            ) from e
        raise


def _gate(e: Exception, source: str, package: str, plugin: str):
    msg = str(e)
    if (f"Failed to find data source: {source}" in msg
            or "ClassNotFoundException" in msg
            or "Could not load" in msg):
        raise NotImplementedError(
            f"the {plugin} connector jar is not bundled in this deployment; "
            f"add {package} to spark.jars.packages to enable {plugin} "
            "workspaces"
        ) from e
    raise e


def read_cassandra_table(
    spark: SparkSession,
    contact_points: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """Cassandra storage plugin analog (contrib/storage-cassandra
    CassandraStoragePlugin.java: keyspaces as schemas, tables via the
    Calcite-Cassandra adapter with filter pushdown). ``table`` is
    ``<keyspace>.<table>`` (Drill's cassandra.`ks`.`tbl`); reads go
    through the DataStax Spark connector, which does the same
    predicate/projection pushdown division of labor. Connector-jar
    gated like kafka/mongo."""
    opts = {**(ws_options or {}), **(query_options or {})}
    opts.pop("type", None)
    ks, _, tbl = table.partition(".")
    if not tbl:
        raise ValueError(f"cassandra table must be keyspace.table, got {table!r}")
    reader = (
        spark.read.format("org.apache.spark.sql.cassandra")
        .option("spark.cassandra.connection.host", contact_points)
        .option("keyspace", ks)
        .option("table", tbl)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        _gate(e, "org.apache.spark.sql.cassandra",
              "com.datastax.spark:spark-cassandra-connector", "cassandra")


def read_hbase_table(
    spark: SparkSession,
    zookeeper_quorum: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """HBase storage plugin analog (contrib/storage-hbase
    HBaseStoragePlugin.java: row-key pushdown scans over column
    families). Reads go through the hbase-spark connector; the column
    mapping (the connector's ``hbase.columns.mapping``) comes from
    workspace/query options, mirroring how the reference's plugin maps
    families to Drill maps. Connector-jar gated."""
    opts = {**(ws_options or {}), **(query_options or {})}
    opts.pop("type", None)
    reader = (
        spark.read.format("org.apache.hadoop.hbase.spark")
        .option("hbase.zookeeper.quorum", zookeeper_quorum)
        .option("hbase.table", table)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        _gate(e, "org.apache.hadoop.hbase.spark",
              "org.apache.hbase.connectors.spark:hbase-spark", "hbase")


def read_druid_datasource(
    spark: SparkSession,
    broker_url: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """Druid storage plugin analog (contrib/storage-druid: datasources
    as tables with filter pushdown into native Druid queries). Reads
    route through Druid's Avatica JDBC endpoint
    (``<broker>/druid/v2/sql/avatica/``) via Spark's parallel JDBC
    source — the same SQL-pushdown division the reference gets from
    its REST scan spec. Avatica-driver-jar gated."""
    opts = {**(ws_options or {}), **(query_options or {})}
    opts.pop("type", None)
    url = f"jdbc:avatica:remote:url={broker_url.rstrip('/')}/druid/v2/sql/avatica/"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", "org.apache.calcite.avatica.remote.Driver")
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        _gate(e, "jdbc", "org.apache.calcite.avatica:avatica-core", "druid")


def read_splunk_index(
    spark: SparkSession,
    connection_url: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """Splunk storage plugin analog (contrib/storage-splunk: indexes as
    tables, SPL pushdown). Reads go through the splunk-spark connector
    data source; connector-jar gated with the naming error pattern."""
    opts = {**(ws_options or {}), **(query_options or {})}
    opts.pop("type", None)
    reader = (
        spark.read.format("splunk")
        .option("url", connection_url)
        .option("index", table)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        _gate(e, "splunk", "com.splunk.spark:splunk-spark", "splunk")


def read_kudu_table(
    spark: SparkSession,
    masters: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """Kudu storage plugin analog (contrib/storage-kudu: tablets as
    scan ranges, predicate pushdown). Reads go through the kudu-spark
    connector; jar gated."""
    opts = {**(ws_options or {}), **(query_options or {})}
    opts.pop("type", None)
    reader = (
        spark.read.format("kudu")
        .option("kudu.master", masters)
        .option("kudu.table", table)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        _gate(e, "kudu", "org.apache.kudu:kudu-spark3", "kudu")


def read_phoenix_table(
    spark: SparkSession,
    zookeeper_url: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """Phoenix storage plugin analog (contrib/storage-phoenix: SQL over
    HBase with pushdown). Reads go through the phoenix-spark
    connector; jar gated."""
    opts = {**(ws_options or {}), **(query_options or {})}
    opts.pop("type", None)
    reader = (
        spark.read.format("phoenix")
        .option("zkUrl", zookeeper_url)
        .option("table", table)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        _gate(e, "phoenix", "org.apache.phoenix:phoenix-spark", "phoenix")


def read_opentsdb_metric(
    spark: SparkSession,
    base_url: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """OpenTSDB storage plugin — REAL implementation (contrib/
    storage-opentsdb Schema.java / OpenTSDBGroupScan: metrics as
    tables, time-range + aggregator pushed into /api/query). OpenTSDB
    speaks plain JSON REST, so no connector jar is needed: the driver
    POSTs the query (endpoints have no splits, exactly like the
    reference's and our http plugin), and the per-timestamp datapoints
    distribute as (metric, tags map, ts, value) rows.

    ``table`` is the metric name; options: ``start`` (default
    ``1h-ago``), ``end``, ``aggregator`` (default ``sum``), ``downsample``."""
    import json as _json
    import urllib.request

    opts = {**(ws_options or {}), **(query_options or {})}
    sub = {"aggregator": opts.get("aggregator", "sum"), "metric": table}
    if opts.get("downsample"):
        sub["downsample"] = opts["downsample"]
    body = {"start": opts.get("start", "1h-ago"), "queries": [sub]}
    if opts.get("end"):
        body["end"] = opts["end"]
    req = urllib.request.Request(
        base_url.rstrip("/") + "/api/query",
        data=_json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        results = _json.loads(resp.read())
    rows = []
    for series in results:
        metric = series.get("metric", table)
        tags = series.get("tags") or {}
        for ts, val in sorted((series.get("dps") or {}).items()):
            rows.append({"metric": metric, "tags": tags,
                         "ts": int(ts), "val": float(val)})
    # Explicit schema: tags is always map<string,string> (not an
    # inferred struct of whichever keys this response happened to
    # carry), and zero datapoints yields an EMPTY TYPED result — a
    # schemaless json read of no rows would produce zero columns and
    # break every downstream select.
    schema = T.StructType([
        T.StructField("metric", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("ts", T.LongType()),
        T.StructField("val", T.DoubleType()),
    ])
    lines = [_json.dumps(r) for r in rows]
    if not lines:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(
        spark.sparkContext.parallelize(lines, max(1, len(lines) // 5000 + 1)))


def read_googlesheets_tab(
    spark: SparkSession,
    spreadsheet_id: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """Google Sheets storage plugin analog (contrib/storage-googlesheets:
    tabs as tables via the Sheets API v4 with OAuth). Reads go through
    the spark-google-spreadsheets data source; gated on BOTH the
    connector jar and the OAuth credential files the reference's plugin
    config carries (clientID/clientSecret/refresh token)."""
    opts = {**(ws_options or {}), **(query_options or {})}
    opts.pop("type", None)
    if not opts.get("credentialsPath"):
        raise NotImplementedError(
            "googlesheets workspaces need OAuth credentials "
            "(credentialsPath option -> a Google service-account json), "
            "matching the reference plugin's clientID/clientSecret config"
        )
    reader = (
        spark.read.format("com.github.potix2.spark.google.spreadsheets")
        .option("serviceAccountId", opts.get("serviceAccountId", ""))
        .option("credentialPath", opts["credentialsPath"])
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load(f"{spreadsheet_id}/{table}")
    except Exception as e:
        _gate(e, "com.github.potix2.spark.google.spreadsheets",
              "com.github.potix2:spark-google-spreadsheets", "googlesheets")


def read_maprdb_table(
    spark: SparkSession,
    _path: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """MapR-DB storage plugin analog (contrib/format-maprdb): JSON
    tables through the proprietary MapR Spark connector; gated — the
    connector ships only with the MapR (HPE Ezmeral) platform."""
    opts = {**(ws_options or {}), **(query_options or {})}
    opts.pop("type", None)
    reader = spark.read.format("com.mapr.db.spark.sql").option("tableName", table)
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        _gate(e, "com.mapr.db.spark.sql",
              "com.mapr.db:maprdb-spark (MapR/Ezmeral platform only)", "maprdb")


# Drill type name (REST metadata) → Spark type for the remote-drill
# client. Complex types (ARRAY/MAP) fall back to JSON schema inference.
_DRILL_TO_SPARK = {
    "VARCHAR": T.StringType(), "BIGINT": T.LongType(), "INT": T.IntegerType(),
    "SMALLINT": T.ShortType(), "TINYINT": T.ByteType(),
    "FLOAT8": T.DoubleType(), "FLOAT4": T.FloatType(),
    "BIT": T.BooleanType(), "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampType(), "TIME": T.StringType(),
    "VARBINARY": T.BinaryType(),
}


def _drill_rest_schema(columns, metadata):
    """Typed schema from the reference's QueryResult.metadata strings;
    None when any column is complex (→ JSON inference)."""
    import re

    if not metadata or len(metadata) != len(columns):
        return None
    fields = []
    for name, m in zip(columns, metadata):
        m = m.strip().upper()
        dec = re.match(r"VARDECIMAL\((\d+),\s*(\d+)\)", m)
        if dec:
            dt = T.DecimalType(int(dec.group(1)), int(dec.group(2)))
        else:
            dt = _DRILL_TO_SPARK.get(m.split("(")[0])
        if dt is None:
            return None
        fields.append(T.StructField(name, dt))
    return T.StructType(fields)


def read_drill_query(
    spark: SparkSession,
    base_url: str,
    sql: str,
    auth: tuple | None = None,
    auto_limit: int | None = None,
    timeout: float = 600.0,
) -> DataFrame:
    """Drill storage plugin — REAL implementation of the reference's
    drill-on-drill connector (contrib/storage-drill/.../
    DrillStoragePlugin.java, DrillScanSpec.java: a query delegated
    verbatim to a REMOTE Drill cluster), speaking the REST protocol
    (server/rest/RestQueryRunner.java) instead of the native RPC —
    which our own server.py serves, so the two ends interoperate.

    The ENTIRE SQL ships to the remote engine — complete pushdown by
    construction, exactly the reference's model (the remote plans and
    executes; we read its Screen output). The result set is the
    remote's to bound (``auto_limit`` mirrors the REST autoLimit); at
    100 TB the remote does the heavy lifting and this reader only
    transports the final rows, the same shape as the reference's
    DrillRecordReader draining result batches.

    The typed schema is rebuilt from the reply's ``metadata`` type
    names (so ZERO-row results stay fully typed); complex columns fall
    back to JSON inference over the returned rows.
    """
    import base64
    import json as _json
    import urllib.request

    body = {"queryType": "SQL", "query": sql}
    if auto_limit is not None:
        body["autoLimit"] = int(auto_limit)
    headers = {"Content-Type": "application/json"}
    if auth:
        tok = base64.b64encode(f"{auth[0]}:{auth[1]}".encode()).decode()
        headers["Authorization"] = f"Basic {tok}"
    req = urllib.request.Request(
        base_url.rstrip("/") + "/query.json",
        data=_json.dumps(body).encode(), headers=headers,
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            payload = _json.loads(resp.read())
    except urllib.error.HTTPError as e:
        try:
            payload = _json.loads(e.read())
        except Exception:
            raise RuntimeError(f"remote drill at {base_url}: HTTP {e.code}")
    if payload.get("queryState") != "COMPLETED":
        raise RuntimeError(
            "remote drill query FAILED: "
            + str(payload.get("errorMessage", payload))
        )
    # a silently capped reply must never pass for the full result: the
    # server caps at its default autoLimit when the client sends none
    attempted = payload.get("attemptedAutoLimit")
    capped = payload.get("truncated")
    if capped is None and attempted:  # older servers: heuristic
        capped = payload.get("rowCount") == attempted
    if capped and auto_limit is None:
        raise RuntimeError(
            f"remote drill truncated the result at {attempted} rows "
            f"(its default autoLimit); pass autoLimit => '0' to fetch "
            f"everything, a positive cap to accept truncation, or push "
            f"the aggregation to the remote via query => '...'")
    cols = list(payload.get("columns") or [])
    rows = payload.get("rows") or []
    schema = _drill_rest_schema(cols, payload.get("metadata"))
    lines = [_json.dumps(r) for r in rows]
    if schema is not None:
        if not lines:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).json(
            spark.sparkContext.parallelize(
                lines, max(1, len(lines) // 5000 + 1)))
    if not lines:
        # complex metadata + zero rows: all we know are the names
        return spark.createDataFrame(
            [], T.StructType([T.StructField(c, T.StringType()) for c in cols]))
    return spark.read.json(
        spark.sparkContext.parallelize(lines, max(1, len(lines) // 5000 + 1)))


def read_drill_table(
    spark: SparkSession,
    base_url: str,
    table: str,
    ws_options: dict | None = None,
    query_options: dict | None = None,
) -> DataFrame:
    """Workspace face of the drill plugin: ``drill_ws.`table``` scans a
    remote table (``select * from <table>`` on the remote — its own
    planner prunes/pushes from there), or pass ``query => '...'`` to
    delegate arbitrary SQL (the reference's DrillScanSpec carries
    exactly such a serialized query)."""
    opts = {**(ws_options or {}), **(query_options or {})}
    sql = opts.get("query") or f"select * from {table}"
    auth = None
    if opts.get("user") is not None:
        auth = (opts.get("user"), opts.get("password", ""))
    raw_limit = opts.get("autoLimit")
    return read_drill_query(
        spark, base_url, sql, auth=auth,
        auto_limit=int(raw_limit) if raw_limit is not None else None,
        timeout=float(opts.get("timeout", 600.0)))
