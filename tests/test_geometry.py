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


def test_union_mixed_dimension_disjoint():
    """Disjoint mixed-dimension union (formerly a gate): both operands
    survive as a GEOMETRYCOLLECTION."""
    a = P("POLYGON((0 0,2 0,2 2,0 2,0 0))")
    line = P("LINESTRING(5 5, 6 6)")
    u = geo.union(a, line)
    assert u[0] == "GEOMETRYCOLLECTION"
    assert sorted(m[0] for m in u[1]) == ["LINESTRING", "POLYGON"]


def test_line_polygon_predicates():
    """DE-9IM line-vs-polygon (new matrix): crosses / within /
    contains / touches across the boundary cases."""
    poly = P("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert geo.crosses(P("LINESTRING(2 2, 8 2)"), poly)
    assert not geo.crosses(P("LINESTRING(1 1, 3 3)"), poly)
    assert geo.within(P("LINESTRING(1 1, 3 3)"), poly)
    assert geo.contains(poly, P("LINESTRING(1 1, 3 3)"))
    # riding the boundary only: touches, does not cross
    assert geo.touches(P("LINESTRING(0 -1, 0 5)"), poly)
    assert not geo.crosses(P("LINESTRING(0 -1, 0 5)"), poly)
    assert geo.disjoint(P("LINESTRING(9 9, 10 10)"), poly)
    assert geo.intersects(P("LINESTRING(2 2, 8 2)"), poly)


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


def test_union_overlapping_squares():
    """Clipping-kernel union of crossing polygons (STUnion.java:34 —
    previously gated): areas must be inclusion-exclusion exact."""
    a = geo.parse_wkt("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")
    b = geo.parse_wkt("POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))")
    u = geo.union(a, b)
    assert u[0] == "POLYGON"
    assert abs(abs(geo._ring_area(u[1][0])) - 7.0) < 1e-9
    i = geo.intersection(a, b)
    assert abs(abs(geo._ring_area(i[1][0])) - 1.0) < 1e-9
    d = geo.difference(a, b)
    assert abs(abs(geo._ring_area(d[1][0])) - 3.0) < 1e-9
    # union contains both operands; difference is disjoint from b's interior
    assert geo.contains(u, a) and geo.contains(u, b)
    assert geo.point_in_polygon((1.5, 1.5), d[1]) == -1


def test_union_shared_edge_reference_fixture():
    """The reference's own UnionAggregate fixture (sample-data/
    polygons.tsv, TestGeometryFunctions.testUnionAggregateQuery):
    squares sharing an edge merge into one polygon, two groups stay a
    MULTIPOLYGON; semantics checked by area + membership (ESRI's exact
    vertex ordering is a rendering choice, not a semantic one)."""
    rows = [
        "POLYGON((0 0, 0 1, 1 1, 1 0, 0 0))",
        "POLYGON((0 0, 0 -1, 1 -1, 1 0, 0 0))",
        "POLYGON((10 10, 10 11, 11 11, 11 10, 10 10))",
        "POLYGON((10 10, 10 9, 11 9, 11 10, 10 10))",
    ]
    g1 = geo.union_all([geo.parse_wkt(r) for r in rows[:2]])
    assert g1[0] == "POLYGON"
    assert abs(abs(geo._ring_area(g1[1][0])) - 2.0) < 1e-9
    assert geo.point_in_polygon((0.5, 0.0), g1[1]) == 1  # the shared edge is interior now
    ga = geo.union_all([geo.parse_wkt(r) for r in rows])
    assert ga[0] == "MULTIPOLYGON" and len(ga[1]) == 2


def test_difference_produces_hole():
    a = geo.parse_wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    b = geo.parse_wkt("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))")
    d = geo.difference(a, b)
    assert d[0] == "POLYGON" and len(d[1]) == 2  # outer + hole
    assert geo.point_in_polygon((1.5, 1.5), d[1]) == -1
    assert geo.point_in_polygon((0.5, 0.5), d[1]) == 1
    # fully-covered difference is empty
    assert geo.difference(b, a) is None


def test_union_idempotent_and_contained():
    a = geo.parse_wkt("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))")
    u = geo.union(a, a)
    assert abs(abs(geo._ring_area(u[1][0])) - 1.0) < 1e-9
    big = geo.parse_wkt("POLYGON((-1 -1, 2 -1, 2 2, -1 2, -1 -1))")
    u2 = geo.union(a, big)
    assert abs(abs(geo._ring_area(u2[1][0])) - 9.0) < 1e-9


def test_buffer_linestring_and_polygon():
    """Non-point buffers (STBuffer.java:36 — previously point-only):
    capsule unions through the clipping kernel."""
    lb = geo.buffer(geo.parse_wkt("LINESTRING(0 0, 10 0)"), 1.0)
    ring = lb[1] if lb[0] == "POLYGON" else lb[1][0]
    assert geo.point_in_polygon((5, 0.5), ring) == 1
    assert geo.point_in_polygon((-0.5, 0), ring) == 1  # round cap
    assert geo.point_in_polygon((5, 1.5), ring) == -1
    pb = geo.buffer(geo.parse_wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"), 1.0)
    ring = pb[1] if pb[0] == "POLYGON" else pb[1][0]
    assert geo.point_in_polygon((2, 2), ring) == 1      # body kept
    assert geo.point_in_polygon((-0.5, 2), ring) == 1   # dilated edge
    assert geo.point_in_polygon((-1.5, 2), ring) == -1  # beyond distance


def test_negative_buffer_erodes_polygon():
    """Erosion (STBuffer.java:36 negative distance): for a rectangle
    the result is EXACTLY the inset rectangle (the corner arcs are
    dominated by the straight-edge offsets), over-erosion is empty,
    and zero-width geometries erode to empty."""
    sq = geo.parse_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    er = geo.buffer(sq, -2.0)
    assert er is not None and er[0] == "POLYGON"
    assert abs(abs(geo._ring_area(er[1][0])) - 36.0) < 1e-6
    assert geo.equals(er, geo.parse_wkt("POLYGON((2 2, 8 2, 8 8, 2 8, 2 2))"))
    # erosion then dilation stays inside the original (opening)
    back = geo.buffer(er, 2.0)
    assert geo.contains(geo.buffer(sq, 1e-6), back)
    # past the inradius: empty
    assert geo.buffer(sq, -5.5) is None
    assert geo.buffer(geo.parse_wkt("POINT(1 1)"), -1.0) is None
    assert geo.buffer(geo.parse_wkt("LINESTRING(0 0, 5 0)"), -1.0) is None


def test_mixed_dimension_union_and_clipping():
    """GEOS-shaped mixed-dimension overlays: point/line vs polygon
    unions produce GEOMETRYCOLLECTION with the low-dim part clipped to
    OUTSIDE the polygon; intersection/difference clip directly."""
    poly = geo.parse_wkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    pt_out = geo.parse_wkt("POINT(9 9)")
    pt_in = geo.parse_wkt("POINT(2 2)")
    line = geo.parse_wkt("LINESTRING(2 2, 8 2)")

    u = geo.union(poly, pt_out)
    assert u[0] == "GEOMETRYCOLLECTION" and len(u[1]) == 2
    assert geo.union(poly, pt_in) == poly  # contained: polygon wins

    # line crosses the boundary at x=4: outside part is (4 2)->(8 2)
    u2 = geo.union(line, poly)
    assert u2[0] == "GEOMETRYCOLLECTION"
    ls = [m for m in u2[1] if m[0] == "LINESTRING"]
    assert len(ls) == 1
    (x1, y1), (x2, y2) = ls[0][1][0], ls[0][1][-1]
    assert abs(x1 - 4) < 1e-9 and abs(x2 - 8) < 1e-9

    inter = geo.intersection(line, poly)
    assert inter[0] == "LINESTRING"
    assert abs(inter[1][0][0] - 2) < 1e-9 and abs(inter[1][-1][0] - 4) < 1e-9
    assert geo.intersection(pt_in, poly) == pt_in
    assert geo.intersection(pt_out, poly) is None

    diff = geo.difference(line, poly)
    assert diff[0] == "LINESTRING" and abs(diff[1][0][0] - 4) < 1e-9
    assert geo.difference(pt_in, poly) is None
    assert geo.difference(pt_out, poly) == pt_out

    # WKT/WKB roundtrip of the collection result
    wkt = geo.to_wkt(u2)
    assert wkt.startswith("GEOMETRYCOLLECTION (")
    assert geo.to_wkt(geo.parse_wkt(wkt)) == wkt
    assert geo.to_wkt(geo.from_wkb(geo.to_wkb(u2))) == wkt

    # union_all over mixed dims folds through collections
    ua = geo.union_all([pt_out, poly, line])
    assert ua[0] == "GEOMETRYCOLLECTION"
    kinds = sorted(m[0] for m in ua[1])
    assert kinds == ["LINESTRING", "POINT", "POLYGON"]


def test_transform_reference_vector():
    """STTransform.java:37 parity: the reference test's proj4j vector
    (EPSG:2249 state-plane ftUS -> 4326) reproduced closed-form."""
    g = geo.transform_geom(geo.parse_wkt("POINT (743238 2967416)"), 2249, 4326)
    assert abs(g[1][0] - -71.1776848522251) < 1e-12
    assert abs(g[1][1] - 42.3902896512902) < 1e-12


def test_transform_roundtrips_and_gate():
    from drill_spark.ops.crs import CrsTransform

    cases = {
        3857: [(-71.0, 42.0), (3.1, 46.2), (-132.0, 62.0)],
        3395: [(-71.0, 42.0), (3.1, 46.2), (-132.0, 62.0)],
        2154: [(3.1, 46.2), (2.35, 48.85), (-1.5, 43.5)],   # France
        5070: [(-96.0, 38.0), (-71.0, 42.0), (-120.0, 45.0)],  # CONUS
        3578: [(-132.5, 62.0), (-138.0, 64.0)],             # Yukon
        32619: [(-71.0, 42.0)], 26919: [(-71.0, 42.0)],     # UTM 19N
        25832: [(9.5, 50.0), (11.9, 48.1)],                 # UTM 32N (ETRS89)
        2249: [(-71.0, 42.0)], 2263: [(-74.0, 40.7)],
    }
    for code, pts in cases.items():
        t = CrsTransform(4326, code)
        ti = CrsTransform(code, 4326)
        for lon, lat in pts:
            x, y = ti(*t(lon, lat))
            assert abs(x - lon) < 1e-8 and abs(y - lat) < 1e-8, code
    with pytest.raises(NotImplementedError, match="EPSG:99999"):
        CrsTransform(4326, 99999)


def test_transform_projection_anchors():
    """Closed-form anchors: the projection origin maps to the false
    easting/northing exactly, and World Mercator's equator scale is
    a * lambda (Snyder 7-7 with e-terms vanishing at phi=0)."""
    import math

    from drill_spark.ops.crs import CrsTransform, epsg_params

    for code in (2154, 5070, 3578):
        p = epsg_params(code)
        x, y = CrsTransform(4326, code)(p["lon_0"], p["lat_0"])
        assert abs(x - p["x_0"]) < 1e-6 and abs(y - p["y_0"]) < 1e-6, code
    x, y = CrsTransform(4326, 3395)(45.0, 0.0)
    assert abs(x - 6378137.0 * math.radians(45)) < 1e-6 and abs(y) < 1e-6


def test_register_epsg_proj4_string():
    """Any registry code becomes usable via its published PROJ.4
    string: a re-registration of Lambert-93 under a private code must
    match the builtin EPSG:2154 to the millimetre."""
    from drill_spark.ops.crs import CrsTransform, register_epsg

    register_epsg(990154, "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 "
                          "+lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80 "
                          "+units=m +no_defs")
    a = CrsTransform(4326, 2154)(2.3522, 48.8566)
    b = CrsTransform(4326, 990154)(2.3522, 48.8566)
    assert abs(a[0] - b[0]) < 1e-3 and abs(a[1] - b[1]) < 1e-3
    # utm form with zone/south keywords
    register_epsg(990001, "+proj=utm +zone=19 +ellps=WGS84")
    c = CrsTransform(4326, 32619)(-71.0, 42.0)
    d = CrsTransform(4326, 990001)(-71.0, 42.0)
    assert abs(c[0] - d[0]) < 1e-6 and abs(c[1] - d[1]) < 1e-6


def test_proj4_numeric_ellipsoid_and_unknown_gate():
    """Numeric +a/+b/+rf always define the figure, even without +ellps
    (sphere-based registry CRSs must NOT silently project on WGS84);
    an unknown named ellipsoid raises by name instead of KeyError."""
    import math

    import pytest

    from drill_spark.ops.crs import CrsTransform, parse_proj4, register_epsg

    # +a/+rf identical to GRS80 must match the named form exactly
    register_epsg(990201, "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 "
                          "+lon_0=3 +x_0=700000 +y_0=6600000 "
                          "+a=6378137 +rf=298.257222101 +units=m")
    a = CrsTransform(4326, 2154)(2.3522, 48.8566)
    b = CrsTransform(4326, 990201)(2.3522, 48.8566)
    assert abs(a[0] - b[0]) < 1e-6 and abs(a[1] - b[1]) < 1e-6

    # a sphere radius (+a only, no +ellps) must be honored: spherical
    # mercator on a=R has x = R * lambda, NOT the WGS84 6378137 value
    R = 6370997.0  # the classic authalic sphere of the registry
    register_epsg(990202, f"+proj=merc +a={R} +b={R} +units=m")
    x, _ = CrsTransform(4326, 990202)(45.0, 0.0)
    assert abs(x - R * math.radians(45)) < 1e-6
    assert abs(x - 6378137.0 * math.radians(45)) > 1000

    with pytest.raises(NotImplementedError, match="airy"):
        parse_proj4("+proj=merc +ellps=airy")
    with pytest.raises(NotImplementedError, match="bessel"):
        parse_proj4("+proj=longlat +ellps=bessel")


def test_closed_line_covering_polygon_boundary():
    """A closed linestring that rides the polygon boundary exactly:
    exterior(line) ∩ boundary(polygon) must be F (the line covers the
    whole ring), while a partial ride leaves it 1."""
    sq = geo.parse_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    ring = geo.parse_wkt("LINESTRING (0 0, 0 1, 1 1, 1 0, 0 0)")
    m = geo.de9im(ring, sq)
    assert m[0] == ["F", "1", "F"]       # line interior rides the boundary
    assert m[1] == ["F", "F", "F"]       # closed line: no boundary
    assert m[2] == ["2", "F", "2"]       # exterior covers no boundary part
    assert geo.touches(ring, sq)
    # partial ride: one edge only -> uncovered boundary remains
    edge = geo.parse_wkt("LINESTRING (0 0, 1 0)")
    m2 = geo.de9im(edge, sq)
    assert m2[2] == ["2", "1", "2"]
    # a crossing line leaves the boundary uncovered too
    cross = geo.parse_wkt("LINESTRING (-1 0.5, 2 0.5)")
    m3 = geo.de9im(cross, sq)
    assert m3[0][0] == "1" and m3[2][1] == "1"


def test_geometrycollection_de9im():
    """DE-9IM over GEOMETRYCOLLECTION operands (closes the documented
    gate): exact by decomposition when components are pairwise disjoint
    and each touches at most one component of the other operand; the
    two violated preconditions still gate by name."""
    gc = P("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (5 5, 6 6))")
    sq = P("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert geo.de9im(gc, sq) == [["0", "F", "1"],
                                 ["F", "F", "0"],
                                 ["2", "1", "2"]]
    assert geo.intersects(gc, sq) and not geo.disjoint(gc, sq)

    gc2 = P("GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)),"
            " POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10)))")
    ln = P("LINESTRING (-1 0.5, 2 0.5)")
    assert geo.de9im(gc2, ln) == [["1", "F", "2"],
                                  ["0", "F", "1"],
                                  ["1", "0", "2"]]
    # a far-away collection is disjoint
    assert geo.disjoint(gc2, P("POINT (50 50)"))

    with pytest.raises(NotImplementedError, match="overlapping"):
        geo.de9im(P("GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)),"
                    " POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1)))"), sq)
    with pytest.raises(NotImplementedError, match="multiple components"):
        geo.de9im(P("GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)),"
                    " POLYGON ((3 0, 4 0, 4 1, 3 1, 3 0)))"),
                  P("LINESTRING (-1 0.5, 5 0.5)"))


def test_sql_union_difference_transform(session):
    q = session.sql
    # union of crossing polygons via SQL (area via the aggregate path)
    r = q("select st_unionaggregate(g) u from (select explode(array("
          "'POLYGON((0 0, 0 1, 1 1, 1 0, 0 0))',"
          "'POLYGON((0 0, 0 -1, 1 -1, 1 0, 0 0))')) g) t").collect()[0]
    assert r.u.startswith("POLYGON")
    r2 = q("select st_difference('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))',"
           "'POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))') d").collect()[0]
    assert r2.d.count("(") == 3  # POLYGON ((outer), (hole))
    r3 = q("select st_xmin(st_transform('POINT (743238 2967416)', 2249, 4326)) x,"
           " st_ymin(st_transform('POINT (743238 2967416)', 2249, 4326)) y").collect()[0]
    assert abs(r3.x - -71.1776848522251) < 1e-9 and abs(r3.y - 42.3902896512902) < 1e-9
    # grouped aggregate matches the reference's per-group fixture shape
    r4 = q("select k, st_unionaggregate(g) u from (select 1 k,"
           " 'POLYGON((0 0, 0 1, 1 1, 1 0, 0 0))' g union all select 1,"
           " 'POLYGON((0 0, 0 -1, 1 -1, 1 0, 0 0))' union all select 2,"
           " 'POLYGON((10 10, 10 11, 11 11, 11 10, 10 10))') t group by k"
           " order by k").collect()
    assert r4[0].u.startswith("POLYGON") and r4[1].u.startswith("POLYGON")


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


def test_overlay_inclusion_exclusion_property():
    """Property: for random axis-aligned rectangles the overlay kernel
    must satisfy area(A) + area(B) = area(A u B) + area(A n B) and
    area(A \\ B) = area(A) - area(A n B) exactly (up to float eps) —
    a global correctness invariant no single fixture can fake."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def rect(x0, y0, w, h):
        return ("POLYGON", [[(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                             (x0, y0 + h), (x0, y0)]])

    def area(g):
        """Signed-ring sum: holes subtract, multipolygons add."""
        if g is None:
            return 0.0
        polys = [g[1]] if g[0] == "POLYGON" else g[1]
        return sum(geo._ring_area(r) for poly in polys for r in poly)

    coords = st.integers(-8, 8)
    side = st.integers(1, 9)

    @settings(max_examples=40, deadline=None)
    @given(coords, coords, side, side, coords, coords, side, side)
    def check(ax, ay, aw, ah, bx, by, bw, bh):
        A, B = rect(ax, ay, aw, ah), rect(bx, by, bw, bh)
        aA, aB = float(aw * ah), float(bw * bh)
        inter = geo.intersection(A, B)
        uni = geo.union(A, B)
        diff = geo.difference(A, B)
        ai, au, ad = area(inter), area(uni), area(diff)
        assert abs((aA + aB) - (au + ai)) < 1e-6, (aA, aB, au, ai)
        assert abs(ad - (aA - ai)) < 1e-6, (ad, aA, ai)

    check()


def test_multilinestring_surface():
    """MULTILINESTRING across the surface (the reference's ESRI types
    include it): WKT/WKB roundtrip, DE-9IM by decomposition, extrema,
    and buffering as the capsule union of all member segments."""
    ml = P("MULTILINESTRING ((0 0, 1 1), (2 0, 3 1))")
    assert geo.to_wkt(ml) == "MULTILINESTRING ((0 0, 1 1), (2 0, 3 1))"
    assert geo.from_wkb(geo.to_wkb(ml)) == ml
    sq = P("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert geo.intersects(ml, sq)
    assert geo.crosses(ml, sq)
    assert geo.disjoint(P("MULTILINESTRING ((5 5, 6 6))"), sq)
    assert geo.extrema(ml) == (0.0, 3.0, 0.0, 1.0)
    buf = geo.buffer(ml, 0.1)
    assert buf is not None
    assert geo.intersects(buf, P("POINT (0.5 0.5)"))
    assert geo.disjoint(buf, P("POINT (1.5 0.5)"))
