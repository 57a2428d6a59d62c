"""MS Access (.mdb/.accdb) reader — parity with the reference's own
fixtures (contrib/format-access, Jackcess-backed MSAccessBatchReader;
TestMSAccessReader.java expectations). The Jet on-disk layout is the
publicly documented one (mdbtools HACKING notes); these tests decode
every fixture vintage the reference ships, Jet3 (V1997) through ACE
2019 extended date/time."""

from __future__ import annotations

import datetime
import os
from decimal import Decimal

import pytest

from drill_spark.readers.msaccess import (
    list_access_tables,
    read_access,
    read_access_table,
)

REF = "/root/reference/contrib/format-access/src/test/resources/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference access fixtures not present"
)


def _load(rel):
    with open(os.path.join(REF, rel), "rb") as f:
        return f.read()


# Every vintage carries the same Table1 (testStarQueryWithDataTypes
# values). The reference's expected `H` shows 4 because Drill's
# scale-0 VARDECIMAL vector rounds; the stored MONEY value is 3.5.
EXPECTED_T1 = [
    {"A": "a", "B": "b", "C": 0, "D": 0, "E": 0, "F": 0.0,
     "G": datetime.datetime(1981, 12, 12), "H": Decimal("0"), "I": False},
    {"A": "abcdefg", "B": "hijklmnop", "C": 2, "D": 222, "E": 333333333,
     "F": 444.555, "G": datetime.datetime(1974, 9, 21),
     "H": Decimal("3.5"), "I": True},
]


@pytest.mark.parametrize("rel", [
    "V1997/testV1997.mdb",      # Jet3: 2 KiB pages, cp1252 names
    "V2000/testV2000.mdb",
    "V2003/testV2003.mdb",
    "V2007/testV2007.accdb",
    "V2010/testV2010.accdb",
])
def test_table1_all_vintages(rel):
    cols, rows = read_access_table(_load(rel), "Table1")
    assert [c["name"] for c in cols] == list("ABCDEFGHI")
    # page-scan row order varies by vintage; content must not
    assert sorted(rows, key=lambda r: r["A"]) == EXPECTED_T1


def test_ext_datetime_v2019():
    """testStarQuery: ACE extended date/time + calculated column."""
    cols, rows = read_access_table(_load("V2019/extDateTestV2019.accdb"), "Table1")
    assert [c["name"] for c in cols] == [
        "ID", "Field1", "DateExt", "DateNormal", "DateExtStr", "DateNormalCalc"]
    assert len(rows) == 9  # testSerDe count
    exp = [
        (1, "row1", datetime.datetime(2020, 6, 17), "6/17/2020"),
        (2, "row2", datetime.datetime(2021, 6, 14), "6/14/2021"),
        (3, "row3", datetime.datetime(2021, 6, 14, 12, 45), "6/14/2021 12:45:00.0000000 PM"),
        (4, "row4", datetime.datetime(2021, 6, 14, 1, 45), "6/14/2021 1:45:00.0000000 AM"),
        (5, "row5", None, None),
    ]
    for row, (i, f1, dt, dstr) in zip(rows, exp):
        assert row["ID"] == i and row["Field1"] == f1
        assert row["DateExt"] == dt and row["DateNormal"] == dt
        assert row["DateNormalCalc"] == dt
        assert row["DateExtStr"] == dstr


def test_metadata_listing():
    """testMetadataStarQuery: table/row_count/col_count/columns."""
    tabs = list_access_tables(_load("V2019/extDateTestV2019.accdb"))
    assert len(tabs) == 1
    t = tabs[0]
    assert t["table"] == "Table1"
    assert t["row_count"] == 9 and t["col_count"] == 6
    assert t["columns"] == ["ID", "Field1", "DateExt", "DateNormal",
                            "DateExtStr", "DateNormalCalc"]
    assert str(t["created_date"]) == "2021-06-03 20:09:56.993000"


def test_missing_table_raises():
    with pytest.raises(KeyError, match="NoSuch"):
        read_access_table(_load("V2010/testV2010.accdb"), "NoSuchTable")


# ------------------------------------------------------- spark reader


def test_spark_rows_and_schema(spark):
    df = read_access(spark, os.path.join(REF, "V2010/testV2010.accdb"),
                     table_name="Table1")
    assert [f.name for f in df.schema.fields] == list("ABCDEFGHI")
    got = sorted(df.collect(), key=lambda r: r["A"])
    assert got[0]["A"] == "a" and got[0]["I"] is False
    assert got[1]["E"] == 333333333 and abs(got[1]["F"] - 444.555) < 1e-9
    assert got[1]["I"] is True


def test_spark_metadata_mode(spark):
    df = read_access(spark, os.path.join(REF, "V2019/extDateTestV2019.accdb"))
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["table"] == "Table1"
    assert rows[0]["row_count"] == 9


def test_sqlfront_access_table(session):
    p = os.path.join(REF, "V2010/testV2010.accdb")
    df = session.sql(
        f"select E from table(dfs.`{p}`(type => 'msaccess', tableName => 'Table1')) where I = true"
    )
    assert [r["E"] for r in df.collect()] == [333333333]


def test_fixture_writer_roundtrip():
    """The spec-built Jet4 fixture writer roundtrips through the
    independently fixture-validated reader, nulls included."""
    import tempfile

    from drill_spark.readers.msaccess import write_access_table

    rows = [[i, float(i) * 1.5, f"name{i}"] for i in range(300)] + [[999, None, None]]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.mdb")
        write_access_table(p, "things", [("k", "int"), ("v", "double"), ("s", "text")], rows)
        data = open(p, "rb").read()
        tabs = list_access_tables(data)
        assert tabs[0]["table"] == "things" and tabs[0]["row_count"] == 301
        _, got = read_access_table(data, "things")
        assert sorted(r["k"] for r in got) == sorted(r[0] for r in rows)
        by_k = {r["k"]: r for r in got}
        assert by_k[7] == {"k": 7, "v": 10.5, "s": "name7"}
        assert by_k[999] == {"k": 999, "v": None, "s": None}
