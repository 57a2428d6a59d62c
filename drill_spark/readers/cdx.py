"""CDXJ capture index — random access into web archives.

Common Crawl (and every wayback-style system) pairs its archives with
a CDX index: one line per capture, keyed by SURT-canonicalized URL,
carrying the exact (filename, offset, length) of the record's gzip
member. Consumers fetch ONE page with a ranged read + one member
decompress — no archive scanning. This module provides the pywb-style
CDXJ flavor ("<urlkey> <timestamp> <json>" lines, sorted) built on the
repo's WARC machinery:

- ``generate_cdx``: one distributed metadata-only pass over the
  archives (payload bytes never move — readers/warc.py's
  ``with_payload=False``) producing range-partitioned, sorted CDXJ
  shards plus a ``cluster.idx`` of (first-key, shard) pairs — the
  Common Crawl layout that lets a lookup touch ONE shard.
- ``read_cdx``: the index itself as a DataFrame (it is a plain sorted
  text table; at 100 TB the index is the thing you JOIN against).
- ``cdx_lookup``: driver-side point lookup — binary-search the tiny
  cluster.idx, scan one shard, return the capture coordinates.
- ``fetch_record``: decompress exactly one member at (file, offset)
  and return the parsed record — the ranged-GET consumer path.

SURT keying (Sort-friendly URI Reordering Transform): host labels
reversed and comma-joined (``com,example)/path``) so one domain's
captures are CONTIGUOUS in the sorted index — the property that makes
per-domain range scans cheap.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drill_spark.readers.warc import (
    _parse_buffer_records,
    _is_member_at,
    read_warc,
)


def surt_key(col):
    """URL -> SURT key, pure Catalyst: lowercase host labels reversed
    and comma-joined, then ``)/`` + path (query dropped — capture
    dedup keys on the resource)."""
    host = F.lower(F.regexp_extract(col, r"^[a-zA-Z]+://([^/:?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(col, r"^[a-zA-Z]+://[^/?#]*([^?#]*)", 1)
    return F.concat(rev, F.lit(")"), F.when(path == "", "/").otherwise(path))


def generate_cdx(
    spark: SparkSession, warc_path, out_dir: str, shards: int = 4,
    split_bytes: int = 32 << 20,
) -> dict:
    """Build the CDXJ index + cluster.idx for an archive set. Returns
    {"shards": n, "records": n}."""
    recs = read_warc(spark, warc_path, split_bytes=split_bytes,
                     with_payload=False).filter(
        F.col("warc_type") == "response")
    line = F.concat_ws(
        " ",
        F.col("urlkey"),
        F.date_format("warc_date", "yyyyMMddHHmmss"),
        F.to_json(F.struct(
            F.col("target_uri").alias("url"),
            F.col("http_status").cast("string").alias("status"),
            F.col("payload_digest").alias("digest"),
            F.element_at(F.split(F.col("file"), "/"), -1).alias("filename"),
            F.col("record_offset").cast("string").alias("offset"),
            F.col("record_length").cast("string").alias("length"),
        )),
    )
    keyed = recs.withColumn("urlkey", surt_key(F.col("target_uri")))
    # Use the requested shard count directly — range partitions with no
    # rows simply emit no shard file, so no counting pass is needed to
    # clamp (a count() here would force a full extra decode of every
    # archive before the real indexing pass).
    n_shards = max(1, shards)
    lines = (
        keyed.select("urlkey", line.alias("line"))
        .repartitionByRange(n_shards, "urlkey")
        .sortWithinPartitions("urlkey")
    )
    os.makedirs(out_dir, exist_ok=True)

    import pandas as pd

    def write_shard(batches):
        # Stream lines to the shard file as they arrive — never hold a
        # partition's full index in executor RAM. First key names the
        # file; spool to a temp name until it's known.
        import hashlib

        f = None
        first = None
        tmp = None
        n = 0
        for pdf in batches:
            for k, ln in zip(pdf["urlkey"], pdf["line"]):
                if f is None:
                    first = k
                    tag = hashlib.md5(first.encode()).hexdigest()[:8]
                    tmp = os.path.join(out_dir, f"cdx-{tag}.cdxj")
                    f = open(tmp, "w")
                f.write(ln)
                f.write("\n")
                n += 1
        if f is not None:
            f.close()
            yield pd.DataFrame({"first_key": [first],
                                "file": [os.path.basename(tmp)],
                                "n": [n]})

    manifest = sorted(
        lines.mapInPandas(write_shard,
                          "first_key string, file string, n long").collect(),
        key=lambda r: r["first_key"])
    with open(os.path.join(out_dir, "cluster.idx"), "w") as f:
        for r in manifest:
            f.write(f"{r['first_key']}\t{r['file']}\t{r['n']}\n")
    return {"shards": len(manifest), "records": int(sum(r["n"] for r in manifest))}


def read_cdx(spark: SparkSession, cdx_dir: str) -> DataFrame:
    """The CDXJ index as a typed DataFrame (urlkey, ts, url, status,
    digest, filename, offset, length)."""
    raw = spark.read.text(os.path.join(cdx_dir, "*.cdxj"))
    parts = F.split(F.col("value"), " ", 3)
    j = F.from_json(
        F.element_at(parts, 3),
        "url string, status string, digest string, filename string, "
        "offset string, length string")
    return raw.select(
        F.element_at(parts, 1).alias("urlkey"),
        F.element_at(parts, 2).alias("ts"),
        j["url"].alias("url"),
        j["status"].cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["filename"].alias("filename"),
        j["offset"].cast("long").alias("offset"),
        j["length"].cast("long").alias("length"),
    )


def surt_key_py(url: str) -> str:
    """Driver-side twin of :func:`surt_key`. MUST mirror the Catalyst
    expressions exactly: the host group stops at ``:`` (port excluded
    from the reversed labels) while the path regex's host part
    ``[^/?#]*`` consumes ``host:port`` so the port never leaks into
    the path — keys for ported URLs match on both sides."""
    import re

    m = re.match(r"^[a-zA-Z]+://([^/:?#]*)", url)
    host = (m.group(1) if m else "").lower()
    host = re.sub(r"^www\.", "", host)
    pm = re.match(r"^[a-zA-Z]+://[^/?#]*([^?#]*)", url)
    path = (pm.group(1) if pm else "") or "/"
    return ",".join(reversed(host.split("."))) + ")" + path


def cdx_lookup(cdx_dir: str, url: str) -> list[dict]:
    """Driver-side point lookup: binary-search cluster.idx for the
    shard, scan that ONE shard for the key. Returns capture dicts."""
    import bisect

    with open(os.path.join(cdx_dir, "cluster.idx")) as f:
        entries = [ln.rstrip("\n").split("\t") for ln in f if ln.strip()]
    if not entries:
        return []
    key = surt_key_py(url)
    firsts = [e[0] for e in entries]
    i = bisect.bisect_right(firsts, key) - 1
    out = []
    for idx in {max(i, 0)}:
        with open(os.path.join(cdx_dir, entries[idx][1])) as f:
            for ln in f:
                if ln.startswith(key + " "):
                    k, ts, j = ln.rstrip("\n").split(" ", 2)
                    d = json.loads(j)
                    d.update(urlkey=k, ts=ts)
                    out.append(d)
    return out


def fetch_record(archive_path: str, offset: int) -> dict:
    """Decompress exactly ONE gzip member at ``offset`` and return the
    parsed record — the ranged-GET consumer path a CDX hit feeds."""
    import zlib

    with open(archive_path, "rb") as fh:
        if not _is_member_at(fh, offset):
            raise ValueError(
                f"{archive_path}: no validated WARC member at {offset}")
        fh.seek(offset)
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = bytearray()
        fed = 0
        while not d.eof:
            chunk = fh.read(1 << 20)
            if not chunk:
                raise ValueError(f"{archive_path}: truncated member")
            fed += len(chunk)
            out += d.decompress(chunk)
    length = fed - len(d.unused_data)
    rows = _parse_buffer_records(bytes(out), offset, archive_path, length)
    if not rows:
        raise ValueError(f"{archive_path}: empty member at {offset}")
    return rows[0]
