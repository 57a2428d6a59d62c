"""Iceberg per-data-file column statistics and scan-time file skipping.

The Iceberg spec makes every ``data_file`` manifest entry carry
``value_counts`` / ``null_value_counts`` / ``lower_bounds`` /
``upper_bounds`` — maps keyed by FIELD ID whose values are the spec's
single-value binary serialization (Appendix D: little-endian fixed
width for numerics, UTF-8 for strings, days/micros ints for
date/timestamp). Real engines plan a selective scan by evaluating the
predicate against these bounds and never opening pruned files; at
100 TB (O(10^5-10^6) data files) that metadata-only planning step is
the difference between a scan and a full-table read. Reference
parity: the reference's Iceberg plugin delegates the same pruning to
the Iceberg library's ManifestEvaluator/InclusiveMetricsEvaluator
(contrib/storage-iceberg reads through iceberg-core's planFiles()).

This module is the write/read half-pair for readers/iceberg.py:

- ``data_file_stats`` derives the four maps from the parquet FOOTER of
  a just-written file (no data re-read), exactly like the Delta
  sibling (delta_stats.file_stats_json);
- ``encode_single`` / ``decode_single`` implement Appendix D for the
  types our writer emits; anything else is omitted — skipping is an
  optimization, never a correctness dependency (read_iceberg keeps
  files without usable bounds and re-applies the predicate as a real
  Catalyst filter);
- ``stats_to_delta_shape`` re-expresses one entry's maps in the
  {minValues, maxValues, nullCount, numRecords} shape so the SAME
  pruning oracle (delta_stats.file_may_match + the conjunct parser)
  serves both table formats — one satisfiability engine, two formats.
"""

from __future__ import annotations

import math
import struct

# Avro schema fragments for the stats maps. Iceberg stores non-string-
# keyed maps as array<record{key, value}> with logicalType "map"; the
# field-ids are fixed by the spec (value_counts 109/119/120,
# null_value_counts 110/121/122, lower_bounds 125/126/127,
# upper_bounds 128/129/130).


def _kv_array(name: str, kid: int, vid: int, vtype: str) -> dict:
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": kid},
                {"name": "value", "type": vtype, "field-id": vid},
            ],
        },
    }


ICE_STATS_FIELDS = [
    {"name": "value_counts", "field-id": 109,
     "type": ["null", _kv_array("k119_v120", 119, 120, "long")]},
    {"name": "null_value_counts", "field-id": 110,
     "type": ["null", _kv_array("k121_v122", 121, 122, "long")]},
    {"name": "lower_bounds", "field-id": 125,
     "type": ["null", _kv_array("k126_v127", 126, 127, "bytes")]},
    {"name": "upper_bounds", "field-id": 128,
     "type": ["null", _kv_array("k129_v130", 129, 130, "bytes")]},
]

# manifest-list partition field summaries (spec field-ids 507-511,
# 518): one row per partition-spec field, letting the planner skip
# WHOLE manifests — at 100 TB (thousands of manifests) the level above
# per-file skipping.
ML_PARTITIONS_FIELD = {
    "name": "partitions", "field-id": 507,
    "type": ["null", {
        "type": "array",
        "element-id": 508,
        "items": {
            "type": "record",
            "name": "r508",
            "fields": [
                {"name": "contains_null", "type": "boolean",
                 "field-id": 509},
                {"name": "contains_nan", "type": ["null", "boolean"],
                 "field-id": 518},
                {"name": "lower_bound", "type": ["null", "bytes"],
                 "field-id": 510},
                {"name": "upper_bound", "type": ["null", "bytes"],
                 "field-id": 511},
            ],
        },
    }],
}

_EPOCH_ORD = 719163  # datetime.date(1970, 1, 1).toordinal()

# String bounds above this length are omitted, like the Delta sibling
# (a truncated upper bound would need tie-breaker surgery to stay a
# valid bound; long strings rarely prune anyway).
_MAX_BOUND_STRING = 64


def encode_single(ice_type: str, v) -> bytes | None:
    """Iceberg single-value serialization (spec Appendix D) for one
    footer statistic, or None when the value cannot be represented
    faithfully for this type — the bound is then simply omitted."""
    import datetime

    if v is None:
        return None
    try:
        if ice_type == "boolean":
            return b"\x01" if v else b"\x00"
        if ice_type == "int":
            return struct.pack("<i", int(v))
        if ice_type == "long":
            return struct.pack("<q", int(v))
        if ice_type == "float":
            return None if math.isnan(v) else struct.pack("<f", float(v))
        if ice_type == "double":
            return None if math.isnan(v) else struct.pack("<d", float(v))
        if ice_type == "date":
            if isinstance(v, datetime.date):
                return struct.pack("<i", v.toordinal() - _EPOCH_ORD)
            return struct.pack("<i", int(v))
        if ice_type in ("timestamp", "timestamptz"):
            if isinstance(v, datetime.datetime):
                base = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
                us = round((v - base).total_seconds() * 1_000_000)
                return struct.pack("<q", us)
            return struct.pack("<q", int(v))
        if ice_type == "string":
            if isinstance(v, bytes):
                v = v.decode("utf-8")
            if not isinstance(v, str) or len(v) > _MAX_BOUND_STRING:
                return None
            return v.encode("utf-8")
    except (OverflowError, ValueError, UnicodeDecodeError, struct.error):
        return None
    return None  # decimal/binary/uuid/nested: no bounds written


def decode_single(ice_type: str, b: bytes | None):
    """Inverse of encode_single onto the comparable domain
    delta_stats._comparable understands: numbers stay numbers,
    date/timestamp become fixed-width ISO strings (lexicographic ==
    chronological), strings decode as UTF-8. None when undecodable."""
    import datetime

    if b is None:
        return None
    b = bytes(b)
    try:
        if ice_type == "boolean" and len(b) == 1:
            return b != b"\x00"
        if ice_type == "int" and len(b) == 4:
            return struct.unpack("<i", b)[0]
        if ice_type == "long" and len(b) == 8:
            return struct.unpack("<q", b)[0]
        if ice_type == "float" and len(b) == 4:
            v = struct.unpack("<f", b)[0]
            return None if math.isnan(v) else v
        if ice_type == "double" and len(b) == 8:
            v = struct.unpack("<d", b)[0]
            return None if math.isnan(v) else v
        if ice_type == "date" and len(b) == 4:
            days = struct.unpack("<i", b)[0]
            return datetime.date.fromordinal(_EPOCH_ORD + days).isoformat()
        if ice_type in ("timestamp", "timestamptz") and len(b) == 8:
            us = struct.unpack("<q", b)[0]
            dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(
                microseconds=us)
            return dt.isoformat(timespec="microseconds")
        if ice_type == "string":
            return b.decode("utf-8")
    except (struct.error, ValueError, UnicodeDecodeError, OverflowError):
        return None
    return None


def data_file_stats(abs_path: str, name_to_id: dict[str, int],
                    name_to_type: dict[str, str]) -> dict:
    """Stats maps for one parquet data file from its footer only:
    {"record_count": n, "value_counts": [...], "null_value_counts":
    [...], "lower_bounds": [...], "upper_bounds": [...]} with the map
    entries as [{"key": field_id, "value": ...}] rows ready for the
    Avro kv-array encoding. Columns whose footer stats are absent or
    unrepresentable are omitted from the affected map — partial stats
    are valid per the spec."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(abs_path).metadata
    except Exception:
        return {"record_count": 0, "value_counts": None,
                "null_value_counts": None, "lower_bounds": None,
                "upper_bounds": None}
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    counts: dict = {}
    bad_range: set = set()
    bad_null: set = set()
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            fid = name_to_id.get(name)
            if fid is None or "." in name:  # nested leaf — omitted
                continue
            # parquet num_values counts nulls for leaf columns, which
            # is exactly Iceberg's value_counts definition
            counts[fid] = counts.get(fid, 0) + int(col.num_values)
            st = col.statistics
            if st is None:
                bad_range.add(fid)
                bad_null.add(fid)
                continue
            if st.null_count is not None:
                nulls[fid] = nulls.get(fid, 0) + int(st.null_count)
            else:
                bad_null.add(fid)
            if not st.has_min_max:
                # all-null chunks legitimately lack min/max and do not
                # narrow the range; any other chunk without them leaves
                # the column's true range unknown
                if st.null_count is None or \
                        int(st.null_count) != int(col.num_values):
                    bad_range.add(fid)
                continue
            t = name_to_type.get(name, "")
            lo, hi = encode_single(t, st.min), encode_single(t, st.max)
            if lo is None or hi is None:
                bad_range.add(fid)
                continue
            dl, dh = decode_single(t, lo), decode_single(t, hi)
            mins[fid] = lo if fid not in mins or _lt(dl, decode_single(
                t, mins[fid])) else mins[fid]
            maxs[fid] = hi if fid not in maxs or _lt(decode_single(
                t, maxs[fid]), dh) else maxs[fid]
    for fid in bad_range:
        mins.pop(fid, None)
        maxs.pop(fid, None)
    for fid in bad_null:
        nulls.pop(fid, None)

    def kv(d):
        return [{"key": k, "value": v} for k, v in sorted(d.items())] or None

    return {
        "record_count": md.num_rows,
        "value_counts": kv(counts),
        "null_value_counts": kv(nulls),
        "lower_bounds": kv(mins),
        "upper_bounds": kv(maxs),
    }


def _lt(a, b) -> bool:
    try:
        return a < b
    except TypeError:
        return False


def partition_field_summaries(entries: list[dict],
                              part_fields: list) -> list | None:
    """field_summary rows (spec order) over one data manifest's
    entries' identity partition values, for the manifest-list
    ``partitions`` field. None when the spec has no partition fields
    or no entry carries partition values."""
    if not part_fields or not entries:
        return None
    out = []
    for name, t in part_fields:
        vals = [(e.get("data_file") or {}).get("partition", {}).get(name)
                for e in entries]
        nn = [v for v in vals if v is not None]
        lo = encode_single(t, min(nn)) if nn else None
        hi = encode_single(t, max(nn)) if nn else None
        out.append({
            "contains_null": len(nn) < len(vals),
            "contains_nan": None,
            # if a bound fails to serialize, leave BOTH open — a
            # one-sided range would still prune correctly, but keeping
            # the pair symmetric makes the summary easier to audit
            "lower_bound": lo if lo is not None and hi is not None else None,
            "upper_bound": hi if lo is not None and hi is not None else None,
        })
    return out


def manifest_pseudo_stats(m_row: dict, part_fields: list) -> dict | None:
    """One manifest-list row's ``partitions`` summaries re-expressed in
    the {minValues, maxValues, nullCount} shape, so the SAME
    satisfiability engine that prunes files prunes manifests. None when
    the row carries no summaries (old writers — the manifest is kept).
    """
    sums = m_row.get("partitions")
    if not sums or not part_fields:
        return None
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    for (name, t), s in zip(part_fields, sums):
        if not isinstance(s, dict):
            continue
        lo = decode_single(t, s.get("lower_bound")) \
            if s.get("lower_bound") is not None else None
        hi = decode_single(t, s.get("upper_bound")) \
            if s.get("upper_bound") is not None else None
        if lo is not None:
            mins[name] = lo
        if hi is not None:
            maxs[name] = hi
        if s.get("contains_null") is False:
            nulls[name] = 0
    if not mins and not maxs and not nulls:
        return None
    return {"minValues": mins, "maxValues": maxs, "nullCount": nulls}


def stats_to_delta_shape(data_file: dict, id_to_name: dict[int, str],
                         id_to_type: dict[int, str]) -> dict | None:
    """One manifest entry's stats maps -> the {numRecords, minValues,
    maxValues, nullCount} dict delta_stats.file_may_match evaluates —
    the shared satisfiability engine for both table formats. Returns
    None when the entry carries no usable stats (the file is kept)."""
    def as_map(v):
        if v is None:
            return {}
        if isinstance(v, dict):  # genuine avro map decoders
            return {int(k): x for k, x in v.items()}
        return {int(r["key"]): r["value"] for r in v}

    lowers = as_map(data_file.get("lower_bounds"))
    uppers = as_map(data_file.get("upper_bounds"))
    nulls = as_map(data_file.get("null_value_counts"))
    num = data_file.get("record_count")
    if not lowers and not uppers and not nulls:
        return None
    mins: dict = {}
    maxs: dict = {}
    ncnt: dict = {}
    for fid, b in lowers.items():
        name, t = id_to_name.get(fid), id_to_type.get(fid, "")
        v = decode_single(t, b) if name else None
        if name is not None and v is not None:
            mins[name] = v
    for fid, b in uppers.items():
        name, t = id_to_name.get(fid), id_to_type.get(fid, "")
        v = decode_single(t, b) if name else None
        if name is not None and v is not None:
            maxs[name] = v
    for fid, n in nulls.items():
        name = id_to_name.get(fid)
        if name is not None and n is not None:
            ncnt[name] = int(n)
    return {
        "numRecords": num,
        "minValues": mins,
        "maxValues": maxs,
        "nullCount": ncnt,
    }
