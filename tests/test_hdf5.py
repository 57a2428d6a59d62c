"""HDF5 reader (reference contrib/format-hdf5 HDF5BatchReader.java).
Validation runs against the reference plugin's own .h5 fixtures,
reproducing the values its TestHDF5Format asserts."""

from __future__ import annotations

import os

import pytest

from drill_spark.readers.hdf5 import read_hdf5, scan_hdf5

REF_DIR = "/root/reference/contrib/format-hdf5/src/test/resources/hdf5"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference tree absent"
)


def _scan(name):
    with open(os.path.join(REF_DIR, name), "rb") as f:
        return scan_hdf5(f.read())


def test_dset_matrix():
    """TestHDF5Format.testStarQuery: /dset is a 4x6 int matrix 1..24."""
    objs = {o["path"]: o for o in _scan("dset.h5")}
    d = objs["/dset"]
    assert d["dims"] == [4, 6]
    assert d["value"] == [list(range(r * 6 + 1, r * 6 + 7)) for r in range(4)]


def test_scalar_datatypes():
    """testFloat32/Int64ScalarQuery...: every /datatype/* dataset holds
    [min, 1..8, max] of its type; vlen unicode decodes through the
    global heap."""
    objs = {o["path"]: o for o in _scan("scalar.h5")}
    assert objs["/datatype/int32"]["value"] == [-(2**31), *range(1, 9), 2**31 - 1]
    assert objs["/datatype/int64"]["value"] == [-(2**63), *range(1, 9), 2**63 - 1]
    assert objs["/datatype/uint8"]["value"] == [0, *range(1, 9), 255]
    f32 = objs["/datatype/float32"]["value"]
    assert f32[0] == pytest.approx(-3.4028234663852886e38) and f32[1:9] == list(
        map(float, range(1, 9))
    )
    uni = objs["/datatype/unicode"]["value"]
    assert uni[1] == "Ελληνικά" and uni[2] == "日本語"
    assert objs["/nd/3D"]["dims"] == [4, 2, 5]


def test_browsing_groups_links_and_data():
    """testFilterWithNonProjectedFieldQuery: exactly four datasets;
    testFlattenColumnQuery: dmat is the 1.1..9.9 3x3 matrix; soft links
    surface as LINK objects."""
    objs = _scan("browsing.h5")
    datasets = {o["path"] for o in objs if o["kind"] == "DATASET"}
    assert datasets == {"/groupA/date", "/groupA/string", "/groupB/dmat", "/groupB/inarr"}
    dmat = next(o for o in objs if o["path"] == "/groupB/dmat")
    assert dmat["value"] == [
        [1.1, 2.2, 3.3], [4.4, 5.5, 6.6], [7.7, 8.8, 9.9]
    ]
    assert any(o["kind"] == "LINK" for o in objs)
    assert {o["path"] for o in objs if o["kind"] == "DATATYPE"} == {
        "/__DATA_TYPES__/Enum_Boolean", "/__DATA_TYPES__/String_VariableLength"
    }


def test_compound_members():
    objs = {o["path"]: o for o in _scan("non-scalar.h5")}
    v = objs["/compound"]["value"]
    assert v["field 1"][:5] == [0, 1, 2, 3, 4]
    assert len(v["field 1"]) == 100


def test_read_hdf5_metadata_dataframe(spark):
    df = read_hdf5(spark, os.path.join(REF_DIR, "dset.h5"))
    rows = {r.path: r for r in df.collect()}
    d = rows["/dset"]
    assert d.data_type == "DATASET" and d.file_name == "dset.h5"
    assert d.data_size == 96 and d.element_count == 24
    assert d.dataset_data_type == "int" and d.dimensions == "[4, 6]"
    assert [list(r) for r in d.int_data][0] == [1, 2, 3, 4, 5, 6]


def test_default_path_projection(spark):
    """testStarProjectDatasetQuery: 2-D int -> int_col_0..5 columns with
    the matrix rows; 1-D -> a column named after the dataset."""
    df = read_hdf5(spark, os.path.join(REF_DIR, "dset.h5"), {"defaultPath": "/dset"})
    assert df.columns == [f"int_col_{i}" for i in range(6)]
    got = sorted(tuple(r) for r in df.collect())
    assert got[0] == (1, 2, 3, 4, 5, 6) and got[3] == (19, 20, 21, 22, 23, 24)

    f32 = read_hdf5(
        spark, os.path.join(REF_DIR, "scalar.h5"), {"defaultPath": "/datatype/float32"}
    )
    assert f32.columns == ["float32"]
    vals = sorted(r[0] for r in f32.collect())
    assert vals[1:9] == [float(x) for x in range(1, 9)]


def test_compound_default_path(spark):
    """testCompoundStarQuery: defaultPath '/compound' projects members
    as sanitized field_N columns."""
    df = read_hdf5(
        spark, os.path.join(REF_DIR, "non-scalar.h5"), {"defaultPath": "/compound"}
    )
    assert df.columns[:2] == ["field_1", "field_2"]
    assert df.where("field_1 < 5").count() == 5


def test_via_sqlfront_table_function(session):
    got = session.sql(
        f"select path, data_type from dfs.`{REF_DIR}/browsing.h5` "
        "where data_type = 'DATASET' order by path"
    ).collect()
    assert [r[0] for r in got] == [
        "/groupA/date", "/groupA/string", "/groupB/dmat", "/groupB/inarr"
    ]
    proj = session.sql(
        f"select * from table(dfs.`{REF_DIR}/dset.h5` "
        "(`type` => 'hdf5', defaultPath => '/dset')) where int_col_0 > 6"
    ).collect()
    assert len(proj) == 3


def test_attributes(session):
    """testAttributes parity: /groupB carries important=false (a shared
    committed bool-enum datatype) resolvable in SQL through the
    attributes map."""
    got = session.sql(
        f"select path from dfs.`{REF_DIR}/browsing.h5` "
        "where attributes['important'] = 'false'"
    ).collect()
    assert [r[0] for r in got] == ["/groupB"]
    objs = {o["path"]: o for o in _scan("browsing.h5")}
    assert objs["/groupA/date"]["attrs"]["__TYPE_VARIANT__"].startswith(
        "TIMESTAMP_MILLISECONDS"
    )


def test_write_h5_simple_roundtrip(tmp_path):
    """The minimal writer emits files the reader (and so the oracle
    query) decodes exactly — int64 and float64 1-D datasets."""
    from drill_spark.readers.hdf5 import write_h5_simple

    p = tmp_path / "t.h5"
    write_h5_simple({"a": [7, 14, 21], "b": [0.5, 1.25, -3.75]}, str(p))
    objs = {o["path"]: o for o in scan_hdf5(p.read_bytes())}
    assert objs["/a"]["value"] == [7, 14, 21]
    assert objs["/b"]["value"] == [0.5, 1.25, -3.75]


def test_v2_layout_compact_links(tmp_path):
    """New-layout file: superblock v3 + OHDR root group with compact
    link messages — spec-built by write_h5_v2, values must match."""
    from drill_spark.readers.hdf5 import scan_hdf5, write_h5_v2

    p = str(tmp_path / "v2.h5")
    write_h5_v2({"ints": [1, 2, 3, 40], "floats": [1.5, -2.25, 3.125]}, p)
    objs = {o["path"]: o for o in scan_hdf5(open(p, "rb").read())}
    assert objs["/"]["kind"] == "GROUP"
    assert objs["/ints"]["value"] == [1, 2, 3, 40]
    assert objs["/floats"]["value"] == [1.5, -2.25, 3.125]


def test_v2_layout_dense_group(tmp_path):
    """Dense new-layout group: links live in a fractal heap direct
    block enumerated via the name-index v2 B-tree."""
    from drill_spark.readers.hdf5 import scan_hdf5, write_h5_v2

    p = str(tmp_path / "v2d.h5")
    data = {f"ds{i}": [i * 10 + j for j in range(4)] for i in range(6)}
    write_h5_v2(data, p, dense=True)
    objs = {o["path"]: o for o in scan_hdf5(open(p, "rb").read())}
    for i in range(6):
        assert objs[f"/ds{i}"]["value"] == [i * 10 + j for j in range(4)]


def test_v2_layout_values_equal_classic(tmp_path):
    """Same data through classic and v2 writers -> identical values
    (the layouts differ, the decode must not)."""
    from drill_spark.readers.hdf5 import scan_hdf5, write_h5_simple, write_h5_v2

    data = {"a": [7, 8, 9], "b": [0.5, 1.5]}
    p1, p2 = str(tmp_path / "c.h5"), str(tmp_path / "n.h5")
    write_h5_simple(data, p1)
    write_h5_v2(data, p2)
    v1 = {o["path"]: o.get("value") for o in scan_hdf5(open(p1, "rb").read())}
    v2 = {o["path"]: o.get("value") for o in scan_hdf5(open(p2, "rb").read())}
    assert v1 == v2
