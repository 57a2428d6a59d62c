"""SPSS .sav reader (reference contrib/format-spss
SpssBatchReader.java). Two validation sources: a synthetic file built
byte-by-byte from the public system-file layout, and — when the
reference tree is present — the reference plugin's own binary fixture,
reproducing the exact rows its TestSpssReader asserts."""

from __future__ import annotations

import os
import struct

import pytest

from drill_spark.readers.spss import decode_sav, read_sav

REF_SAV = "/root/reference/contrib/format-spss/src/test/resources/spss/testdata.sav"


def _sav(compressed: bool) -> bytes:
    """Two numeric vars (one with value labels) + one 10-byte string
    var (2 elements), 3 cases."""
    bias = 100.0
    out = bytearray()
    out += b"$FL2" + b"@(#) test".ljust(60)
    out += struct.pack("<iiiii", 2, 4, 1 if compressed else 0, 0, 3)
    out += struct.pack("<d", bias)
    out += b"01 Jan 24" + b"00:00:00" + b" " * 64 + b"\x00" * 3
    assert len(out) == 176

    def var(vtype, name):
        # rtype, vtype, has_label, n_missing, print_fmt, write_fmt, name
        return struct.pack("<iiiiii", 2, vtype, 0, 0, 0, 0) + name.ljust(8).encode()

    out += var(0, "AGE")
    out += var(0, "GRP")
    out += var(10, "NAME")
    out += var(-1, "NAME")  # continuation element for the 10-byte string
    # value labels for GRP (element index 2)
    out += struct.pack("<ii", 3, 2)
    for val, lab in ((1.0, "one"), (2.0, "two")):
        rec = struct.pack("<d", val) + bytes([len(lab)]) + lab.encode()
        out += rec + b" " * (-len(rec) % 8)
    out += struct.pack("<iii", 4, 1, 2)
    out += struct.pack("<ii", 999, 0)

    cases = [
        (31.0, 1.0, b"alpha     "),
        (45.0, 2.0, b"betabetabe"),
        (None, 9.0, b"          "),
    ]
    if not compressed:
        for age, grp, nm in cases:
            out += struct.pack("<d", age if age is not None else -1.7976931348623157e308)
            out += struct.pack("<d", grp)
            out += nm[:8] + nm[8:].ljust(8)
    else:
        def cmds(*cs):
            pad = (-len(cs)) % 8
            return bytes(cs) + b"\x00" * pad

        # case1: AGE=31 -> biased code 131; GRP=1 -> 101; NAME literal (253) x2
        stream = cmds(131, 101, 253, 253) + b"alpha   " + b"  ".ljust(8)
        # case2: AGE=45 -> 145; GRP=2 -> 102; literal, literal
        stream += cmds(145, 102, 253, 253) + b"betabeta" + b"be".ljust(8)
        # case3: AGE sysmiss (255); GRP=9 -> 109; spaces (254) x2
        stream += cmds(255, 109, 254, 254, 252)
        out += stream
    return bytes(out)


@pytest.mark.parametrize("compressed", [False, True])
def test_synthetic_sav(compressed):
    d, rows = decode_sav(_sav(compressed))
    assert [v.name for v in d.variables] == ["AGE", "GRP", "NAME"]
    assert d.compressed is compressed
    assert rows[0] == {"AGE": 31.0, "GRP": 1.0, "GRP_value": "one", "NAME": "alpha"}
    assert rows[1]["NAME"] == "betabetabe"
    assert rows[1]["GRP_value"] == "two"
    assert rows[2]["AGE"] is None
    assert rows[2]["GRP_value"] is None  # code 9 has no label
    assert rows[2]["NAME"] == ""


@pytest.mark.skipif(not os.path.exists(REF_SAV), reason="reference tree absent")
def test_reference_fixture_parity():
    """Reproduces TestSpssReader.testStarQuery/testSerDe: 25 rows; the
    d16=4 slice yields IDs 47/53/66 with the asserted labels/weights."""
    with open(REF_SAV, "rb") as f:
        d, rows = decode_sav(f.read())
    assert len(rows) == 25
    sel = sorted((r for r in rows if r["d16"] == 4.0), key=lambda r: r["ID"])
    assert [r["ID"] for r in sel] == [47.0, 53.0, 66.0]
    assert {r["Urban_value"] for r in sel} == {"Urban"}
    assert {r["District_value"] for r in sel} == {"Kabul"}
    assert sel[0]["Sample_Weight"] == pytest.approx(20098.33333333333)
    assert sel[2]["Sample_Weight"] == pytest.approx(8626.0)
    assert sel[0]["s_1"] == ""


@pytest.mark.skipif(not os.path.exists(REF_SAV), reason="reference tree absent")
def test_read_sav_via_sqlfront(session):
    got = session.sql(
        f"select ID, Urban, Urban_value from dfs.`{REF_SAV}` where d16 = 4 order by ID"
    ).collect()
    assert [(r[0], r[1], r[2]) for r in got] == [
        (47.0, 1.0, "Urban"), (53.0, 1.0, "Urban"), (66.0, 1.0, "Urban")
    ]


def test_write_sav_roundtrip(spark, tmp_path):
    """The minimal writer emits files the reader (and so the oracle
    query) decodes exactly: numerics, sysmiss, value labels, strings."""
    from drill_spark.readers.spss import write_sav

    rows = [
        {"K": 1.0, "NAME": "alpha"},
        {"K": 2.0, "NAME": "a-much-longer-name"},
        {"K": None, "NAME": ""},
    ]
    p = tmp_path / "t.sav"
    write_sav(rows, str(p), value_labels={"K": {1.0: "one", 2.0: "two"}})
    d, got = decode_sav(p.read_bytes())
    assert [v.name for v in d.variables] == ["K", "NAME"]
    assert got[0] == {"K": 1.0, "K_value": "one", "NAME": "alpha"}
    assert got[1]["NAME"] == "a-much-longer-name"
    assert got[2]["K"] is None and got[2]["K_value"] is None
