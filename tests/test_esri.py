"""ESRI shapefile reader (reference contrib/format-esri
ShpBatchReader.java). Spec fixtures are built inline with struct.pack
from the public Shapefile Technical Description — independent of the
module's own writer — so the decoder is validated against the spec,
not against itself."""

from __future__ import annotations

import datetime
import struct

import pytest

from drill_spark.readers.esri import (
    decode_dbf,
    decode_shp,
    read_shp,
    read_srid,
    write_shp,
)


def _shp_file(records: list[bytes]) -> bytes:
    body = b""
    for i, content in enumerate(records):
        body += struct.pack(">ii", i + 1, len(content) // 2) + content
    header = struct.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, (100 + len(body)) // 2)
    header += struct.pack("<ii", 1000, 1) + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    return header + body


def test_point_record_to_wkb():
    rec = struct.pack("<idd", 1, 30.5, -10.25)
    (gid, stype, wkb), = decode_shp(_shp_file([rec]))
    assert (gid, stype) == (1, "Point")
    assert wkb == struct.pack("<BIdd", 1, 1, 30.5, -10.25)


def test_polygon_two_rings_to_wkb():
    outer = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
    inner = [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0)]
    pts = outer + inner
    rec = struct.pack("<i", 5) + struct.pack("<4d", 0, 0, 10, 10)
    rec += struct.pack("<ii", 2, len(pts)) + struct.pack("<2i", 0, len(outer))
    rec += b"".join(struct.pack("<dd", x, y) for x, y in pts)
    (_, stype, wkb), = decode_shp(_shp_file([rec]))
    assert stype == "Polygon"
    order, wtype, nrings = struct.unpack_from("<BII", wkb, 0)
    assert (order, wtype, nrings) == (1, 3, 2)
    n_outer = struct.unpack_from("<I", wkb, 9)[0]
    assert n_outer == 5
    x0, y0 = struct.unpack_from("<dd", wkb, 13)
    assert (x0, y0) == (0.0, 0.0)


def test_polyline_multipart_and_z_variant():
    p1 = [(0.0, 0.0), (1.0, 1.0)]
    p2 = [(5.0, 5.0), (6.0, 5.0), (7.0, 4.0)]
    pts = p1 + p2
    def mk(stype, extra=b""):
        rec = struct.pack("<i", stype) + struct.pack("<4d", 0, 0, 7, 5)
        rec += struct.pack("<ii", 2, len(pts)) + struct.pack("<2i", 0, len(p1))
        rec += b"".join(struct.pack("<dd", x, y) for x, y in pts) + extra
        return rec

    (_, stype, wkb), = decode_shp(_shp_file([mk(3)]))
    assert stype == "Polyline"
    assert struct.unpack_from("<BII", wkb, 0) == (1, 5, 2)  # MultiLineString, 2 parts
    # PolyLineZ: same XY block + z-range/z-values appended; XY must match
    zblock = struct.pack(f"<{2 + len(pts)}d", *([0.0] * (2 + len(pts))))
    (_, stype_z, wkb_z), = decode_shp(_shp_file([mk(13, zblock)]))
    assert stype_z == "Polyline" and wkb_z == wkb


def test_null_shape_and_multipoint():
    null_rec = struct.pack("<i", 0)
    mp = struct.pack("<i", 8) + struct.pack("<4d", 0, 0, 2, 2)
    mp += struct.pack("<i", 2) + struct.pack("<4d", 1.0, 1.0, 2.0, 2.0)
    rows = decode_shp(_shp_file([null_rec, mp]))
    assert rows[0][1] == "Null" and rows[0][2] is None
    assert struct.unpack_from("<BII", rows[1][2], 0) == (1, 4, 2)


def _dbf_file() -> bytes:
    fields = [("NAME", "C", 8, 0), ("POP", "N", 10, 0), ("AREA", "N", 12, 3),
              ("SEEN", "D", 8, 0), ("URBAN", "L", 1, 0)]
    record_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    out = bytearray(struct.pack("<B3BIHH20x", 3, 24, 1, 1, 3, header_size, record_size))
    for name, t, ln, dec in fields:
        out += name.encode().ljust(11, b"\x00") + t.encode()
        out += b"\x00" * 4 + bytes([ln, dec]) + b"\x00" * 14
    out += b"\x0d"
    out += b" " + b"alpha   " + b"      1200" + b"      12.500" + b"20240131" + b"T"
    out += b"*" + b"deleted " + b"         1" + b"       0.001" + b"20240101" + b"F"
    out += b" " + b"beta    " + b"          " + b"            " + b"        " + b"?"
    out += b"\x1a"
    return bytes(out)


def test_dbf_types_and_deleted_rows():
    rows = decode_dbf(_dbf_file())
    assert len(rows) == 2  # deleted record dropped
    assert rows[0] == {
        "NAME": "alpha", "POP": 1200, "AREA": 12.5,
        "SEEN": datetime.date(2024, 1, 31), "URBAN": True,
    }
    assert rows[1] == {"NAME": "beta", "POP": None, "AREA": None,
                       "SEEN": None, "URBAN": None}


def test_srid_regex_matches_reference_pattern(tmp_path):
    p = tmp_path / "x.prj"
    p.write_text(
        'PROJCS["X",GEOGCS["Y",DATUM["D",SPHEROID["S",1.0,2.0]]],'
        'AUTHORITY["EPSG","32633"]]'
    )
    assert read_srid(str(p)) == 32633
    assert read_srid(str(tmp_path / "missing.prj")) == 0


def test_read_shp_dataframe_surface(spark, tmp_path):
    rows = [
        {"x": 10.0, "y": 20.0, "city": "aa", "pop": 100},
        {"x": 11.5, "y": 21.5, "city": "bb", "pop": 250},
    ]
    write_shp(rows, str(tmp_path / "cities"), srid=4326)
    df = read_shp(spark, str(tmp_path / "cities.shp"))
    assert [f.name for f in df.schema.fields] == ["gid", "srid", "shapeType", "geom", "city", "pop"]
    got = sorted((r.gid, r.srid, r.shapeType, r.city, r.pop, bytes(r.geom))
                 for r in df.collect())
    assert got[0][:5] == (1, 4326, "Point", "aa", 100)
    assert got[0][5] == struct.pack("<BIdd", 1, 1, 10.0, 20.0)


def test_shp_via_sqlfront(session, tmp_path):
    rows = [{"x": float(i), "y": float(-i), "tag": f"t{i}"} for i in range(5)]
    write_shp(rows, str(tmp_path / "pts"))
    got = session.sql(
        f"select count(*) as n, max(tag) as mt from dfs.`{tmp_path}/pts.shp` where gid > 1"
    ).collect()
    assert got[0][0] == 4 and got[0][1] == "t4"
