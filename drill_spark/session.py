"""Engine session: the Drill "Foreman + session options" analog.

Drill runs a per-query Foreman (reference:
exec/java-exec/src/main/java/org/apache/drill/exec/work/foreman/Foreman.java:97)
over a drillbit cluster coordinated by ZooKeeper; session options are set
via ALTER SESSION SET (planner/sql/handlers/SetOptionHandler.java). On
Spark, the cluster/scheduling layer is Spark itself; this module provides
the session object: SparkSession construction tuned for the engine,
Drill-style option names mapped to Spark confs, workspace/table
resolution, and ``sql()`` with the Drill path-as-table front end.

Scale notes (100 TB target):
- AQE on: runtime coalescing, skew-join splitting, broadcast demotion.
- Runtime bloom-filter join pushdown on (Drill's RuntimeFilterRouter
  analog, work/filter/RuntimeFilterRouter.java, is built into Spark).
- shuffle.partitions defaults to max(2*cores, 64) locally; on a real
  cluster AQE coalesces from spark.sql.adaptive.coalescePartitions.*,
  so an over-estimate is safe, an under-estimate is not.
- Session timezone pinned UTC so results are stable across clusters
  (and match the DuckDB oracle used in tests).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Drill session-option name -> Spark conf name (+ value mapper).
# Drill options live in exec/java-exec/.../ExecConstants.java; we map the
# planner/exec options that have a direct Spark equivalent and keep the
# rest in a session-local dict (visible via sys.options) so ALTER SESSION
# never errors on a known Drill option.
_OPTION_MAP: dict[str, str] = {
    "planner.slice_target": "spark.sql.shuffle.partitions",  # parallelism knob analog
    "planner.broadcast_threshold": "spark.sql.autoBroadcastJoinThreshold",
    "planner.enable_broadcast_join": "spark.sql.autoBroadcastJoinThreshold",
    "planner.memory.max_query_memory_per_node": "spark.sql.shuffle.spill.numElementsForceSpillThreshold",
    "exec.enable_union_type": "spark.sql.variant.enabled",
    "drill.exec.functions.cast_empty_string_to_null": "spark.sql.legacy.castEmptyStringToNull",
    "planner.enable_hashjoin": "spark.sql.join.preferSortMergeJoin",
}


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "drill_spark",
    cores: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or return) the engine SparkSession with scale-ready defaults."""
    cores = cores or _default_parallelism()
    shuffle_parts = max(2 * cores, 64)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        # --- planner / runtime optimizations (Drill §4 analogs, all built-in) ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # --- semantics ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")  # Drill's lenient casts (TypeCastRules.java:40)
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # events.parquet carries TIMESTAMP(NANOS) which Spark's reader
        # rejects; read as long and convert (see load_fixture)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # keep driver logs sane
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_fixture(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver fixture table, normalizing exotic physical types.

    events.ts is parquet TIMESTAMP(NANOS,false); with
    spark.sql.legacy.parquet.nanosAsLong it arrives as raw nanos — convert
    to TIMESTAMP_NTZ (micros, matching DuckDB's truncation) here so every
    consumer sees a timestamp column.
    """
    from pyspark.sql import functions as F  # local: keep module import light

    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    return df


@dataclass
class Workspace:
    """Drill workspace: a named root directory with a default format.

    Reference: storage plugin config workspaces
    (exec/java-exec/.../store/dfs/WorkspaceConfig.java).
    """

    name: str
    path: str
    default_format: str = "parquet"
    writable: bool = False


@dataclass
class DrillSession:
    """Engine session wrapping a SparkSession.

    Drill analog: UserSession + Foreman. ``sql()`` accepts Drill-flavored
    SQL (backtick path tables, ALTER SESSION SET, SHOW FILES) and
    standard Spark SQL; everything else is delegated to Catalyst.
    """

    spark: SparkSession = field(default_factory=get_spark)
    workspaces: dict[str, Workspace] = field(default_factory=dict)
    options: dict[str, str] = field(default_factory=dict)
    aliases: dict[str, str] = field(default_factory=dict)
    materialized: dict[str, str] = field(default_factory=dict)
    profiles: list[dict] = field(default_factory=list)
    temp_tables: list[str] = field(default_factory=list)
    _view_counter: int = 0

    def __post_init__(self) -> None:
        from drill_spark import functions as _fns

        _fns.register_all(self.spark)
        if "dfs" not in self.workspaces:
            self.workspaces["dfs"] = Workspace("dfs", "/", "parquet")
            self.workspaces["dfs.tmp"] = Workspace("dfs.tmp", "/tmp", "parquet", writable=True)

    # ---------------- workspace / table resolution ----------------

    def register_workspace(self, name: str, path: str, default_format: str = "parquet") -> None:
        self.workspaces[name] = Workspace(name, path, default_format)

    def register_fixture_tables(self, sf_dir: str) -> None:
        """Register the driver parquet fixtures as temp views (TESTDATA.md)."""
        for t in FIXTURE_TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                load_fixture(self.spark, sf_dir, t).createOrReplaceTempView(t)

    def table(self, name: str) -> DataFrame:
        """Resolve a Drill-style table name (``dfs.tmp`/x.json```, plain
        view name, or bare path) to a DataFrame."""
        from drill_spark.catalog import resolve_table

        return resolve_table(self, name)

    # ---------------- SQL front end ----------------

    def sql(self, query: str) -> DataFrame:
        """Run SQL. Drill-isms are rewritten first (sqlfront); the result
        is always executed by Catalyst via ``spark.sql``.

        Each statement is recorded in ``profiles`` (sys.profiles analog:
        Drill's QueryManager keeps per-query profiles). plan_ms covers
        rewrite+analysis; execution is lazy and runs on the action."""
        import datetime
        import time

        from drill_spark.sqlfront import execute

        entry = {
            "query": query.strip(),
            "start_ts": datetime.datetime.now(),
            "plan_ms": 0.0,
            "state": "FAILED",
        }
        t0 = time.perf_counter()
        try:
            df = execute(self, query)
            entry["state"] = "COMPLETED"
            return df
        finally:
            entry["plan_ms"] = round((time.perf_counter() - t0) * 1000, 3)
            self.profiles.append(entry)
            if len(self.profiles) > 1000:  # bounded history, like the web UI
                del self.profiles[:-1000]

    # ---------------- session options ----------------

    def set_option(self, name: str, value: str) -> None:
        """ALTER SESSION SET analog (SetOptionHandler.java)."""
        self.options[name] = value
        spark_conf = _OPTION_MAP.get(name)
        if spark_conf is not None:
            self.spark.conf.set(spark_conf, value)
        elif name.startswith("spark."):
            self.spark.conf.set(name, value)

    def get_option(self, name: str, default: str | None = None) -> str | None:
        return self.options.get(name, default)

    def _fresh_view(self, hint: str = "t") -> str:
        self._view_counter += 1
        return f"_drill_{hint}_{self._view_counter}"

    def close(self) -> None:
        """End the session: drop session-scoped temp tables and
        materialized views (Drill drops temporary tables on session
        close — UserSession teardown). The shared SparkSession is NOT
        stopped; it may serve other sessions."""
        import shutil

        for path in self.temp_tables:
            shutil.rmtree(path, ignore_errors=True)
        self.temp_tables.clear()
        for name, path in list(self.materialized.items()):
            try:
                self.spark.catalog.dropTempView(name)
            except Exception:
                pass
            shutil.rmtree(path, ignore_errors=True)
        self.materialized.clear()
        self.aliases.clear()
