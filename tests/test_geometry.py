"""General ST_* geometry surface — parity with the reference's
TestGeometryFunctions.java cases (contrib/udfs gis/, ESRI-backed
there; pure planar kernel in ops/geometry.py here)."""

from __future__ import annotations

import pytest

from drill_spark.ops import geometry as geo


P = geo.parse_wkt


# ----------------------------------------------------- kernel parity


def test_wkt_roundtrip_and_json():
    g = P("POINT (-121.895 37.339)")
    assert geo.to_wkt(g) == "POINT (-121.895 37.339)"
    assert geo.as_json(g) == '{"x":-121.895,"y":37.339,"spatialReference":{"wkid":4326}}'
    assert geo.as_geojson(g) == (
        '{"type":"Point","coordinates":[-121.895,37.339],'
        '"crs":{"type":"name","properties":{"name":"EPSG:4326"}}}'
    )


def test_intersects_disjoint():
    assert not geo.intersects(P("POINT(0 0)"), P("LINESTRING(2 0,0 2)"))
    assert geo.intersects(P("POINT(0 0)"), P("LINESTRING(0 0,0 2)"))
    assert geo.disjoint(P("POINT(0 0)"), P("LINESTRING(2 0,0 2)"))
    assert not geo.disjoint(P("POINT(0 0)"), P("LINESTRING(0 0,0 2)"))


def test_relate_buffer_circle():
    big = geo.buffer(P("POINT(1 2)"), 2)
    assert geo.relate(P("POINT(1 2)"), big, "0FFFFF212")
    assert geo.relate(P("POINT(1 2)"), big, "*FF*FF212")
    assert not geo.relate(P("POINT(0 0)"), big, "*FF*FF212")


def test_touches():
    line = P("LINESTRING(0 0, 1 1, 0 2)")
    assert not geo.touches(line, P("POINT(1 1)"))  # interior, not boundary
    assert geo.touches(line, P("POINT(0 2)"))      # endpoint


def test_equals_collinear_lines():
    assert geo.equals(P("LINESTRING(0 0, 10 10)"), P("LINESTRING(0 0, 5 5, 10 10)"))
    assert not geo.equals(P("LINESTRING(0 0, 10 10)"), P("LINESTRING(0 0, 5 6, 10 10)"))


def test_contains_union_circles():
    small = geo.buffer(P("POINT(1 2)"), 10)
    big = geo.buffer(P("POINT(1 2)"), 20)
    assert not geo.contains(small, big)
    assert geo.contains(big, small)
    u = geo.union(small, big)
    assert geo.contains(big, u) and geo.equals(big, u)


def test_point_on_line_predicates():
    a, b = P("POINT(1 0.5)"), P("LINESTRING(1 0, 1 1, 3 5)")
    assert not geo.overlaps(a, b)
    assert not geo.crosses(a, b)
    assert geo.intersects(a, b)
    assert geo.contains(b, a)


def test_crossing_lines():
    l1, l2 = P("LINESTRING(0 0, 2 2)"), P("LINESTRING(0 2, 2 0)")
    assert geo.crosses(l1, l2) and geo.intersects(l1, l2)
    assert not geo.touches(l1, l2)


def test_polygon_point_and_holes():
    donut = P("POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))")
    assert geo.point_in_polygon((2, 2), donut[1]) == 1
    assert geo.point_in_polygon((5, 5), donut[1]) == -1  # in the hole
    assert geo.point_in_polygon((0, 5), donut[1]) == 0   # on boundary
    assert geo.contains(donut, P("POINT(2 2)"))
    assert not geo.contains(donut, P("POINT(5 5)"))


def test_wkb_roundtrip():
    for wkt in (
        "POINT (3 4)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOINT (1 1, 2 2)",
    ):
        g = P(wkt)
        assert geo.from_wkb(geo.to_wkb(g)) == g


def test_envelope_extrema():
    g = P("LINESTRING(1 2, 5 -3, 4 7)")
    assert geo.extrema(g) == (1, 5, -3, 7)
    env = geo.envelope(g)
    assert env[0] == "POLYGON" and geo.contains(env, P("POINT(3 3)"))


def test_union_unsupported_overlap_raises():
    a = P("POLYGON((0 0,2 0,2 2,0 2,0 0))")
    b = P("POLYGON((1 1,3 1,3 3,1 3,1 1))")
    with pytest.raises(NotImplementedError):
        geo.union(a, b)


# ----------------------------------------------------- SQL surface


def test_sql_geometry_functions(session):
    q = session.sql
    assert q("select st_astext_geom(st_geomfromtext('POINT (-121.895 37.339)')) t").collect()[0].t \
        == "POINT (-121.895 37.339)"
    assert q("select st_relate('POINT (1 2)', st_buffer('POINT (1 2)', 2.0), '0FFFFF212') t").collect()[0].t
    assert q("select st_equals('LINESTRING (0 0, 10 10)', 'LINESTRING (0 0, 5 5, 10 10)') t").collect()[0].t
    assert q("select st_intersects('POINT (0 0)', 'LINESTRING (2 0, 0 2)') t").collect()[0].t is False
    assert q("select st_geomfromtext(cast(null as string)) t").collect()[0].t is None
    assert q("select st_xmax('LINESTRING (0 0, 5 7)') t").collect()[0].t == 5.0
    wkb = q("select st_geomfromwkb(st_asbinary('POLYGON ((0 0, 4 0, 4 4, 0 0))')) t").collect()[0].t
    assert wkb == "POLYGON ((0 0, 4 0, 4 4, 0 0))"


def test_wkb_roundtrip_property():
    """Property: WKB encode/decode is lossless for arbitrary polygons
    and linestrings (finite coordinates)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    coord = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).map(
        lambda v: round(v, 6))
    pts = st.lists(st.tuples(coord, coord), min_size=2, max_size=12)

    @settings(max_examples=60, deadline=None)
    @given(pts)
    def check(p):
        line = ("LINESTRING", p)
        assert geo.from_wkb(geo.to_wkb(line)) == line
        ring = p + [p[0]]
        poly = ("POLYGON", [ring])
        assert geo.from_wkb(geo.to_wkb(poly)) == poly

    check()
