"""DFDL subset reader — parity with contrib/format-daffodil's
TestDaffodilReader.java, run against the reference plugin's own schema
and data fixtures (test resources, i.e. data files, not code), plus
spec-built checks independent of those fixtures."""

from __future__ import annotations

import gzip
import os
import struct
from datetime import datetime
from decimal import Decimal

import pytest

from drill_spark.readers.dfdl import (
    DFDL_TWO_INT_XSD,
    DfdlSchema,
    parse_dfdl_file,
    read_dfdl,
    write_dfdl_ints,
)

REF = "/root/reference/contrib/format-daffodil/src/test/resources"
SCHEMA_DIR = os.path.join(REF, "schema")
DATA_DIR = os.path.join(REF, "data")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SCHEMA_DIR), reason="reference daffodil fixtures absent")


def _read(spark, schema_name: str, data_name: str):
    return read_dfdl(
        spark,
        os.path.join(DATA_DIR, data_name),
        schema_uri=f"file://{SCHEMA_DIR}/{schema_name}.dfdl.xsd",
        root_name="row",
    )


def test_simple_gz(spark):
    """testSimpleQuery1: one int row, gzip transparent."""
    df = _read(spark, "simple", "data01Int.dat.gz")
    assert df.schema.simpleString() == "struct<col:int>"
    assert [r.col for r in df.collect()] == [0x00000101]


def test_simple_six_rows(spark):
    """testSimpleQuery2: root element parsed repeatedly until EOF."""
    df = _read(spark, "simple", "data06Int.dat")
    assert [r.col for r in df.orderBy("col").collect()] == [257, 258, 259, 260, 261, 262]


def test_complex_rows(spark):
    """testComplexQuery1/2: two-int rowType -> two columns."""
    df = _read(spark, "complex1", "data02Int.dat")
    assert df.collect() == [pytest.approx((257, 258))]
    df6 = _read(spark, "complex1", "data06Int.dat")
    assert sorted(map(tuple, df6.collect())) == [(257, 258), (259, 260), (261, 262)]


def test_complex_array_of_maps(spark):
    """testComplexArrayQuery1: {257, 258, [{259,260} x5 ...]} — unbounded
    inner array is greedy to EOF, so one row consumes all 12 ints."""
    rows = _read(spark, "complexArray1", "data12Int.dat").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.a1, r.a2) == (257, 258)
    assert [(b.b1, b.b2) for b in r.b] == [
        (259, 260), (261, 262), (257, 258), (259, 260), (261, 262)]


def test_simple_array_field(spark):
    """testSimpleArrayQuery1: all 12 ints into one array column."""
    rows = _read(spark, "simpleArrayField1", "data12Int.dat").collect()
    assert len(rows) == 1
    assert rows[0].col == [257, 258, 259, 260, 261, 262, 257, 258, 259, 260, 261, 262]


def test_complex_array_bounded_inner(spark):
    """testComplexArrayQuery2: maxOccurs=3 inner vector — greedy up to 3,
    clean stop at EOF: {257, 258, [{259,[260,261,262]}, {257,[258,259,260]},
    {261,[262]}]}"""
    rows = _read(spark, "complexArray2", "data12Int.dat").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.a1, r.a2) == (257, 258)
    assert [(b.b1, list(b.b2)) for b in r.b] == [
        (259, [260, 261, 262]), (257, [258, 259, 260]), (261, [262])]


def test_more_types1_text(spark):
    """testMoreTypes1: text representation, %SP; separators, %NL;
    terminator, textBooleanTrueRep=T/F, hexBinary via iso-8859-1,
    quoted string initiator/terminator."""
    rows = _read(spark, "moreTypes1", "moreTypes1.txt.dat").collect()
    assert len(rows) == 2
    a, b = rows
    assert (a["int"], a["long"], a["short"], a["byte"]) == (
        2147483647, 9223372036854775807, 32767, 127)
    assert a["boolean"] is True
    assert a["double"] == 1.7976931348623157e308
    assert a["float"] == pytest.approx(3.4028235e38)
    assert bytes(a["hexBinary"]) == b"12345678"  # chars 0x31..0x38
    assert a["string"] == "daffodil"
    assert (b["int"], b["byte"], b["boolean"], b["string"]) == (
        -2147483648, -128, False, "drill")
    assert bytes(b["hexBinary"]) == b"87654321"


def test_more_types2_text(spark):
    """testMoreTypes2: unsigned/huge integer types -> decimal(38,0)
    (reference VARDECIMAL), decimal -> string (VARCHAR), date/time/
    dateTime conversions."""
    df = _read(spark, "moreTypes2", "moreTypes2.txt.dat")
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["uint"] == 4294967295
    assert r["ulong"] == Decimal("18446744073709551615")
    assert (r["ushort"], r["ubyte"]) == (65535, 255)
    assert r["integer"] == Decimal("-18446744073709551616")
    assert r["nonNegativeInteger"] == Decimal("18446744073709551616")
    assert r["decimal"] == "0.18446744073709551616"
    assert str(r["date"]) == "1970-01-01"
    assert r["time"] == "00:00"  # LocalTime.toString convention
    assert r["dateTime"] == datetime(1970, 1, 1, 0, 0, 0)


def test_root_name_errors(spark, tmp_path):
    with pytest.raises(ValueError, match="rootName"):
        read_dfdl(
            spark,
            os.path.join(DATA_DIR, "data01Int.dat.gz"),
            schema_uri=f"file://{SCHEMA_DIR}/simple.dfdl.xsd",
            root_name="nope",
        )


def test_spec_built_roundtrip(spark, tmp_path):
    """Reader independence: a spec-built binary fixture (struct.pack)
    parsed through the same path, plus the gz branch."""
    data = tmp_path / "two.dat"
    write_dfdl_ints([(1, 2), (3, 4), (5, 6)], str(data))
    xsd = tmp_path / "two.dfdl.xsd"
    xsd.write_text(DFDL_TWO_INT_XSD)
    df = read_dfdl(spark, str(data), schema_uri=str(xsd), root_name="row")
    assert sorted(map(tuple, df.collect())) == [(1, 2), (3, 4), (5, 6)]
    gz = tmp_path / "two.dat.gz"
    gz.write_bytes(gzip.compress(data.read_bytes()))
    df2 = read_dfdl(spark, str(gz), schema_uri=str(xsd), root_name="row")
    assert sorted(map(tuple, df2.collect())) == [(1, 2), (3, 4), (5, 6)]


def test_parse_errors_are_crisp():
    schema = DfdlSchema(DFDL_TWO_INT_XSD)
    root = schema.root_element("row")
    with pytest.raises(Exception, match="EOF"):
        parse_dfdl_file(struct.pack(">iii", 1, 2, 3), schema, root)


def test_sqlfront_table_function(session, tmp_path):
    """The reference's query shape: table(dfs.`...` (type => 'daffodil',
    schemaURI => ..., rootName => 'row'))."""
    data = tmp_path / "rows.dat"
    write_dfdl_ints([(257, 258), (259, 260)], str(data))
    xsd = tmp_path / "rows.dfdl.xsd"
    xsd.write_text(DFDL_TWO_INT_XSD)
    out = session.sql(
        f"SELECT a1, a2 FROM table(dfs.`{data}` (type => 'daffodil', "
        f"schemaURI => '{xsd}', rootName => 'row')) ORDER BY a1"
    ).collect()
    assert [tuple(r) for r in out] == [(257, 258), (259, 260)]


def test_dfdl_binary_property_roundtrip():
    """Property: any int-pair table round-trips through the spec-built
    writer and the subset parser (no Spark needed — kernel level)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = DfdlSchema(DFDL_TWO_INT_XSD)
    root = schema.root_element("row")

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.tuples(
        st.integers(-2**31, 2**31 - 1), st.integers(-2**31, 2**31 - 1)),
        max_size=40))
    def check(rows):
        buf = b"".join(struct.pack(">ii", a, b) for a, b in rows)
        parsed = parse_dfdl_file(buf, schema, root)
        assert [(r["a1"], r["a2"]) for r in parsed] == rows

    check()


_CHOICE_TEXT_XSD = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           xmlns:dfdl="http://www.ogf.org/dfdl/dfdl-1.0/">
  <xs:annotation><xs:appinfo source="http://www.ogf.org/dfdl/">
    <dfdl:format representation="text" encoding="utf-8"/>
  </xs:appinfo></xs:annotation>
  <xs:element name="row">
    <xs:complexType>
      <xs:sequence dfdl:separator="," dfdl:terminator="%NL;">
        <xs:element name="id" type="xs:int"/>
        <xs:choice>
          <xs:element name="tag" type="xs:string" dfdl:initiator="#"/>
          <xs:element name="num" type="xs:int"/>
        </xs:choice>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>"""


def test_choice_text(spark, tmp_path):
    """xs:choice (implicit length): branch by speculative parse — an
    initiator-marked string vs a bare int; unchosen branch is null."""
    from drill_spark.readers.dfdl import DfdlSchema, parse_dfdl_file

    schema = DfdlSchema(_CHOICE_TEXT_XSD)
    root = schema.root_element("row")
    rows = parse_dfdl_file(b"1,#alpha\n2,42\n3,#beta\n", schema, root)
    assert rows == [
        {"id": 1, "tag": "alpha", "num": None},
        {"id": 2, "tag": None, "num": 42},
        {"id": 3, "tag": "beta", "num": None},
    ]
    # end-to-end through the reader with the flattened nullable columns
    sp = str(tmp_path / "choice.dfdl.xsd")
    dp = str(tmp_path / "choice.dat")
    with open(sp, "w") as f:
        f.write(_CHOICE_TEXT_XSD)
    with open(dp, "wb") as f:
        f.write(b"1,#alpha\n2,42\n")
    df = read_dfdl(spark, dp, schema_uri=f"file://{sp}", root_name="row")
    assert df.schema.simpleString() == "struct<id:int,tag:string,num:int>"
    assert sorted(map(tuple, df.collect())) == [(1, "alpha", None), (2, None, 42)]


_PARSED_TEXT_XSD = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           xmlns:dfdl="http://www.ogf.org/dfdl/dfdl-1.0/">
  <xs:annotation><xs:appinfo source="http://www.ogf.org/dfdl/">
    <dfdl:format representation="text" encoding="utf-8"/>
  </xs:appinfo></xs:annotation>
  <xs:element name="row">
    <xs:complexType>
      <xs:sequence dfdl:separator=";" dfdl:terminator="|">
        <xs:element name="name" type="xs:string"/>
        <xs:element name="vals" type="xs:int" maxOccurs="unbounded"
                    dfdl:occursCountKind="parsed"/>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>"""


def test_occurs_count_kind_parsed_text(spark):
    """occursCountKind='parsed': occurrence count discovered purely by
    parsing — separator-joined ints until the record terminator, zero
    occurrences allowed (minOccurs is validation-only)."""
    from drill_spark.readers.dfdl import DfdlSchema, parse_dfdl_file

    schema = DfdlSchema(_PARSED_TEXT_XSD)
    root = schema.root_element("row")
    rows = parse_dfdl_file(b"a;1;2;3|b;7|c|", schema, root)
    assert rows == [
        {"name": "a", "vals": [1, 2, 3]},
        {"name": "b", "vals": [7]},
        {"name": "c", "vals": []},
    ]


_CHOICE_BIN_XSD = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           xmlns:dfdl="http://www.ogf.org/dfdl/dfdl-1.0/">
  <xs:annotation><xs:appinfo source="http://www.ogf.org/dfdl/">
    <dfdl:format representation="binary"/>
  </xs:appinfo></xs:annotation>
  <xs:element name="row">
    <xs:complexType>
      <xs:choice>
        <xs:element name="wide" type="xs:int"/>
        <xs:element name="narrow" type="xs:short"/>
      </xs:choice>
    </xs:complexType>
  </xs:element>
</xs:schema>"""


def test_choice_binary_first_match_wins(spark):
    """Binary choice resolves by speculative parse in schema order:
    4 remaining bytes take the int branch; a trailing 2-byte record
    falls through to the short branch (DFDL's documented
    first-success-wins rule for implicit choices)."""
    from drill_spark.readers.dfdl import DfdlSchema, parse_dfdl_file

    schema = DfdlSchema(_CHOICE_BIN_XSD)
    root = schema.root_element("row")
    rows = parse_dfdl_file(struct.pack(">ih", 70000, 33), schema, root)
    assert rows == [
        {"wide": 70000, "narrow": None},
        {"wide": None, "narrow": 33},
    ]


def test_occurs_count_kind_parsed_binary(spark):
    """Binary parsed-count array: ints to EOF even with maxOccurs=2
    in the schema (count is a parse outcome, bounds are validation)."""
    from drill_spark.readers.dfdl import DfdlSchema, parse_dfdl_file

    xsd = _CHOICE_BIN_XSD.replace(
        '<xs:choice>\n        <xs:element name="wide" type="xs:int"/>\n        <xs:element name="narrow" type="xs:short"/>\n      </xs:choice>',
        '<xs:sequence><xs:element name="v" type="xs:int" maxOccurs="2" '
        'dfdl:occursCountKind="parsed"/></xs:sequence>')
    schema = DfdlSchema(xsd)
    root = schema.root_element("row")
    rows = parse_dfdl_file(struct.pack(">iiii", 1, 2, 3, 4), schema, root)
    assert rows == [{"v": [1, 2, 3, 4]}]


def test_occurs_count_expression(spark):
    """occursCountKind='expression' with a sibling reference — the
    count-prefixed-array idiom — in binary and text representations."""
    from drill_spark.readers.dfdl import DfdlSchema, parse_dfdl_file

    bin_xsd = _CHOICE_BIN_XSD.replace(
        "<xs:choice>", "<xs:sequence>").replace(
        '<xs:element name="wide" type="xs:int"/>',
        '<xs:element name="n" type="xs:int"/>').replace(
        '<xs:element name="narrow" type="xs:short"/>',
        '<xs:element name="vals" type="xs:short" maxOccurs="unbounded" '
        'dfdl:occursCountKind="expression" dfdl:occursCount="{ ../n }"/>').replace(
        "</xs:choice>", "</xs:sequence>")
    schema = DfdlSchema(bin_xsd)
    root = schema.root_element("row")
    data = (struct.pack(">i", 2) + struct.pack(">hh", 7, 8)
            + struct.pack(">i", 0)
            + struct.pack(">i", 1) + struct.pack(">h", 5))
    rows = parse_dfdl_file(data, schema, root)
    assert rows == [
        {"n": 2, "vals": [7, 8]},
        {"n": 0, "vals": []},
        {"n": 1, "vals": [5]},
    ]

    text_xsd = _PARSED_TEXT_XSD.replace(
        '<xs:element name="name" type="xs:string"/>',
        '<xs:element name="n" type="xs:int"/>').replace(
        'dfdl:occursCountKind="parsed"',
        'dfdl:occursCountKind="expression" dfdl:occursCount="{ ../n }"')
    schema = DfdlSchema(text_xsd)
    root = schema.root_element("row")
    rows = parse_dfdl_file(b"2;10;11|0|1;9|", schema, root)
    assert rows == [
        {"n": 2, "vals": [10, 11]},
        {"n": 0, "vals": []},
        {"n": 1, "vals": [9]},
    ]


def test_explicit_length_fixed_width(spark):
    """lengthKind='explicit': fixed-width text records (padded name +
    zoned int) and binary records with length-prefixed-by-schema
    string/hexBinary fields."""
    from drill_spark.readers.dfdl import DfdlSchema, parse_dfdl_file

    text_xsd = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           xmlns:dfdl="http://www.ogf.org/dfdl/dfdl-1.0/">
  <xs:annotation><xs:appinfo source="http://www.ogf.org/dfdl/">
    <dfdl:format representation="text" encoding="utf-8"/>
  </xs:appinfo></xs:annotation>
  <xs:element name="row">
    <xs:complexType>
      <xs:sequence dfdl:terminator="%NL;">
        <xs:element name="name" type="xs:string" dfdl:lengthKind="explicit"
                    dfdl:length="6" dfdl:textPadKind="padChar"
                    dfdl:textStringPadCharacter="_"/>
        <xs:element name="qty" type="xs:int" dfdl:lengthKind="explicit"
                    dfdl:length="4"/>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>"""
    schema = DfdlSchema(text_xsd)
    root = schema.root_element("row")
    rows = parse_dfdl_file(b"apple_0042\nfig___0007\n", schema, root)
    assert rows == [{"name": "apple", "qty": 42}, {"name": "fig", "qty": 7}]

    bin_xsd = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           xmlns:dfdl="http://www.ogf.org/dfdl/dfdl-1.0/">
  <xs:annotation><xs:appinfo source="http://www.ogf.org/dfdl/">
    <dfdl:format representation="binary"/>
  </xs:appinfo></xs:annotation>
  <xs:element name="row">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="tag" type="xs:string" dfdl:lengthKind="explicit"
                    dfdl:length="4" dfdl:textPadKind="padChar"/>
        <xs:element name="n" type="xs:int"/>
        <xs:element name="blob" type="xs:hexBinary"
                    dfdl:lengthKind="explicit" dfdl:length="3"/>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>"""
    schema = DfdlSchema(bin_xsd)
    root = schema.root_element("row")
    data = b"ab  " + struct.pack(">i", 9) + b"\x01\x02\x03" \
         + b"cdef" + struct.pack(">i", -1) + b"\xff\x00\x7f"
    rows = parse_dfdl_file(data, schema, root)
    assert rows == [
        {"tag": "ab", "n": 9, "blob": b"\x01\x02\x03"},
        {"tag": "cdef", "n": -1, "blob": b"\xff\x00\x7f"},
    ]

    # sibling-reference length expressions are implemented (r6,
    # test_length_expression_sibling_reference); richer expressions
    # stay a named gate
    import pytest as _pytest

    expr_xsd = bin_xsd.replace('dfdl:length="3"',
                               'dfdl:length="{ ../n * 2 }"')
    schema = DfdlSchema(expr_xsd)
    root = schema.root_element("row")
    with _pytest.raises(NotImplementedError, match="outside the subset"):
        parse_dfdl_file(data, schema, root)


def test_choice_length_kind_explicit(spark):
    """choiceLengthKind='explicit' (spec §15.1): the choice occupies
    exactly dfdl:choiceLength bytes — a short winning branch skips the
    fill so the next field aligns; a branch that would overrun fails."""
    from drill_spark.readers.dfdl import DfdlSchema, parse_dfdl_file

    xsd = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           xmlns:dfdl="http://www.ogf.org/dfdl/dfdl-1.0/">
  <xs:annotation><xs:appinfo source="http://www.ogf.org/dfdl/">
    <dfdl:format representation="binary"/>
  </xs:appinfo></xs:annotation>
  <xs:element name="row">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="kind" type="xs:byte"/>
        <xs:choice dfdl:choiceLengthKind="explicit" dfdl:choiceLength="4">
          <xs:element name="tag" type="xs:string" dfdl:lengthKind="explicit"
                      dfdl:length="{ ../kind }" dfdl:textPadKind="padChar"/>
          <xs:element name="num" type="xs:int"/>
        </xs:choice>
        <xs:element name="after" type="xs:short"/>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>"""
    schema = DfdlSchema(xsd)
    root = schema.root_element("row")
    # record 1: kind=2 -> 2-char string branch inside the 4-byte
    # region (2 fill bytes skipped); record 2: kind=9 -> string branch
    # overruns the region and fails, int branch wins
    data = (struct.pack(">b", 2) + b"hi\x00\x00" + struct.pack(">h", 7)
            + struct.pack(">b", 9) + struct.pack(">i", 1234)
            + struct.pack(">h", 8))
    rows = parse_dfdl_file(data, schema, root)
    assert rows == [
        {"kind": 2, "tag": "hi", "num": None, "after": 7},
        {"kind": 9, "tag": None, "num": 1234, "after": 8},
    ]


def test_length_expression_sibling_reference(spark):
    """dfdl:length='{ ../n }' — the length-prefixed-field idiom — in
    binary and text representations."""
    from drill_spark.readers.dfdl import DfdlSchema, parse_dfdl_file

    bin_xsd = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           xmlns:dfdl="http://www.ogf.org/dfdl/dfdl-1.0/">
  <xs:annotation><xs:appinfo source="http://www.ogf.org/dfdl/">
    <dfdl:format representation="binary"/>
  </xs:appinfo></xs:annotation>
  <xs:element name="row">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="n" type="xs:short"/>
        <xs:element name="body" type="xs:string" dfdl:lengthKind="explicit"
                    dfdl:length="{ ../n }"/>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>"""
    schema = DfdlSchema(bin_xsd)
    root = schema.root_element("row")
    data = struct.pack(">h", 5) + b"hello" + struct.pack(">h", 2) + b"ok"
    assert parse_dfdl_file(data, schema, root) == [
        {"n": 5, "body": "hello"}, {"n": 2, "body": "ok"}]

    text_xsd = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
           xmlns:dfdl="http://www.ogf.org/dfdl/dfdl-1.0/">
  <xs:annotation><xs:appinfo source="http://www.ogf.org/dfdl/">
    <dfdl:format representation="text" encoding="utf-8"/>
  </xs:appinfo></xs:annotation>
  <xs:element name="row">
    <xs:complexType>
      <xs:sequence dfdl:separator="," dfdl:terminator="%NL;">
        <xs:element name="n" type="xs:int"/>
        <xs:element name="body" type="xs:string" dfdl:lengthKind="explicit"
                    dfdl:length="{ ../n }"/>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>"""
    schema = DfdlSchema(text_xsd)
    root = schema.root_element("row")
    rows = parse_dfdl_file(b"3,abc\n5,wx,yz\n", schema, root)
    assert rows == [{"n": 3, "body": "abc"}, {"n": 5, "body": "wx,yz"}]
