"""PDF table extraction — parity with the reference's own fixtures.

The reference reads PDFs via PDFBox+tabula (contrib/format-pdf); its
TestPdfFormat.java asserts exact rows/columns on the bundled PDFs.
These tests run OUR ISO-32000 + published-table-extraction pipeline
against the same binary fixtures and assert the same expectations —
reader-vs-fixture parity, the SAS/SPSS/HDF5 test pattern."""

from __future__ import annotations

import os

import pytest

from drill_spark.readers.pdf import (
    _fix_bidi,
    extract_pdf,
    read_pdf,
    write_pdf_table,
)

REF = "/root/reference/contrib/format-pdf/src/test/resources/pdf"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference pdf fixtures not present"
)


def _load(name):
    with open(os.path.join(REF, name), "rb") as f:
        return f.read()


# ---------------------------------------------------- pure extraction


def test_argentina_table_shape_and_values():
    """TestPdfFormat.testFullScan: 32 rows without header extraction;
    testStarQuery: exact header names and Rio Negro row values."""
    tables, meta = extract_pdf(_load("argentina_diputados_voting_record.pdf"))
    assert meta["_page_count"] == 1 and meta["_table_count"] == 1
    t = tables[0]
    assert len(t) == 32
    assert t[0] == ["Apellido y Nombre", "Bloque político", "Provincia", None]
    rio = [r for r in t if r[2] == "Rio Negro"]
    assert rio == [
        ["ALBRIEU, Oscar Edmundo Nicolas", "Frente para la Victoria - PJ", "Rio Negro", "AFIRMATIVO"],
        ["AVOSCAN, Herman Horacio", "Frente para la Victoria - PJ", "Rio Negro", "AFIRMATIVO"],
        ["CEJAS, Jorge Alberto", "Frente para la Victoria - PJ", "Rio Negro", "AFIRMATIVO"],
    ]


def test_encrypted_rc4_password():
    """testEncryptedFile: RC4-encrypted, user password, 8 data rows."""
    tables, _ = extract_pdf(_load("encrypted.pdf"), password="userpassword")
    t = tables[0]
    assert t[0][0] == "FLA Audit Profile"
    assert [r[:2] for r in t[1:5]] == [
        ["Country", "China"],
        ["Factory name", "01001523B"],
        ["IEM", "BVCPS (HK), Shen Zhen Office"],
        ["Date of audit", "May 20-22, 2003"],
    ]
    assert len(t) == 9


def test_encrypted_wrong_password_raises():
    with pytest.raises(PermissionError):
        extract_pdf(_load("encrypted.pdf"), password="nope")


def test_schools_counts_both_algorithms():
    """testPageMerge (basic: 46+45*3+41 raw -> 221 combined) and the
    spreadsheet grid (11 ruled columns incl. First Name/Address split)."""
    data = _load("schools.pdf")
    tables, meta = extract_pdf(data)
    assert meta["_page_count"] == 5
    assert [len(t) for t in tables] == [46, 46, 46, 46, 42]
    ss_tables, _ = extract_pdf(data, algorithm="spreadsheet")
    assert ss_tables[0][0][:4] == ["Last Name", "First Name", "Address", "City"]
    assert ss_tables[0][1][:3] == ["Lidstad", "Dick & Peg", "62 Mississippi River Blvd N"]


def test_metadata_20():
    """testMetadataQuery field parity on 20.pdf (mod date exact; the
    prose creation date parses to its literal value)."""
    _, meta = extract_pdf(_load("20.pdf"))
    assert meta["_page_count"] == 1
    assert meta["_title"] == "Agricultural Landuse Survey in The Sumas River Watershed Summa"
    assert meta["_author"] == "Vision"
    assert meta["_creator"] == "PScript5.dll Version 5.2.2"
    assert meta["_producer"] == "Acrobat Distiller 7.0.5 (Windows)"
    assert meta["_trapped"] is None
    assert meta["_table_count"] == 1
    assert str(meta["_modification_date"]) == "2009-01-01 18:38:55"
    assert meta["_creation_date"] is not None


def test_arabic_rtl_logical_order():
    """testUnicode: visual-order Arabic restored to logical order."""
    tables, _ = extract_pdf(_load("arabic.pdf"))
    t = tables[0]
    assert t[0] == ["مرحباً", "اسمي سلطان"]
    assert t[1] == ["انا من ولاية كارولينا الشمال", "من اين انت؟"]
    assert t[2] == ["1234", "عندي 47 قطط"]
    assert t[3] == ["هل انت شباك؟", "اسمي Jeremy في الانجليزية"]
    assert t[4] == ["Jeremy is جرمي in Arabic", None]


def test_labor_no_tables_with_spreadsheet():
    """testFileWithNoTables: no ruled grid -> zero tables."""
    tables, meta = extract_pdf(_load("labor.pdf"), algorithm="spreadsheet")
    assert tables == [] and meta["_table_count"] == 0
    assert meta["_producer"] == "itext-paulo-155 (itextpdf.sf.net-lowagie.com)"
    assert str(meta["_creation_date"]) == "2015-04-25 23:09:47"


def test_fix_bidi_mixed():
    assert _fix_bidi("plain text") == "plain text"
    assert _fix_bidi("123") == "123"


# ------------------------------------------------------- spark reader


def test_reader_header_modes(spark):
    p = os.path.join(REF, "argentina_diputados_voting_record.pdf")
    df = read_pdf(spark, p)
    assert df.columns[:4] == ["Apellido y Nombre", "Bloque político", "Provincia", "field_0"]
    assert df.count() == 31
    assert read_pdf(spark, p, extract_headers=False).count() == 32


def test_reader_combine_pages_and_table_index(spark):
    p = os.path.join(REF, "schools.pdf")
    assert read_pdf(spark, p, combine_pages=True).count() == 221
    # testSpecificTable: defaultTableIndex=3 -> 45 rows
    assert read_pdf(spark, p, default_table_index=3).count() == 45


def test_reader_no_tables_emits_metadata_row(spark):
    df = read_pdf(spark, os.path.join(REF, "labor.pdf"), algorithm="spreadsheet")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["_table_count"] == 0 and rows[0]["_page_count"] == 1


def test_sqlfront_pdf_path_table(session):
    p = os.path.join(REF, "argentina_diputados_voting_record.pdf")
    df = session.sql(f"select `Provincia`, count(*) as n from dfs.`{p}` group by 1 order by n desc limit 1")
    top = df.collect()[0]
    assert top["n"] >= 2


# ------------------------------------------------------ writer roundtrip


def test_writer_roundtrip_multipage(spark, tmp_path):
    rows = [[f"name{i}", str(i), f"cat{i % 3}"] for i in range(80)]
    p = str(tmp_path / "t.pdf")
    write_pdf_table(p, ["Name", "Value", "Category"], rows, title="A Title")
    tables, meta = extract_pdf(open(p, "rb").read())
    assert meta["_page_count"] == 2 and len(tables) == 2
    assert tables[0][0] == ["Name", "Value", "Category"]
    got = [r for t in tables for r in t[1:]]
    assert got == [[f"name{i}", str(i), f"cat{i % 3}"] for i in range(80)]
    df = read_pdf(spark, p, combine_pages=True)
    assert df.count() == 80


@pytest.mark.parametrize("name,algo,min_tables", [
    ("us-017", "basic", 2),
    ("us-020", "basic", 5),
    ("campaign_donors", "basic", 1),
    ("twotables", "basic", 2),          # both tables on the page found
    ("twotables", "spreadsheet", 2),    # ruled grids (CJK text)
    ("spreadsheet_no_bounding_frame", "basic", 1),
    ("jpeg2000", "basic", 0),           # image-only page: no tables
])
def test_remaining_fixtures_extract(name, algo, min_tables):
    """Every reference fixture parses and detection stays stable (no
    exact tabula parity asserted for these — regression guards)."""
    tables, meta = extract_pdf(_load(f"{name}.pdf"), algorithm=algo)
    assert len(tables) >= min_tables
    for t in tables:
        assert all(len(r) == len(t[0]) for r in t)


def test_sqlfront_pdf_table_function(session):
    p = os.path.join(REF, "schools.pdf")
    df = session.sql(
        f"select count(*) as n from table(dfs.`{p}`(type => 'pdf', combinePages => 'true'))"
    )
    assert df.collect()[0]["n"] == 221
