"""Pcap format reader (contrib/format-pcap PcapFormatPlugin.java analog).

Test captures are BUILT FROM THE LIBPCAP SPEC with raw struct.pack —
independent of the reader implementation — covering both byte orders,
the nanosecond magic, IPv4 TCP/UDP, and truncated/unknown frames.
"""

from __future__ import annotations

import struct

import pytest

from drill_spark.readers.pcap import decode_pcap, read_pcap


def _eth_ipv4(proto: int, src_ip: bytes, dst_ip: bytes, l4: bytes) -> bytes:
    eth = bytes(range(6)) + bytes(range(6, 12)) + b"\x08\x00"  # dst, src mac, IPv4
    ihl = 5
    ip = struct.pack(
        ">BBHHHBBH4s4s",
        (4 << 4) | ihl, 0, 20 + len(l4), 1, 0, 64, proto, 0, src_ip, dst_ip,
    )
    return eth + ip + l4


def _tcp(sport: int, dport: int, flags: int = 0x18) -> bytes:
    return struct.pack(">HHIIBBHHH", sport, dport, 1, 2, 5 << 4, flags, 8192, 0, 0)


def _udp(sport: int, dport: int) -> bytes:
    return struct.pack(">HHHH", sport, dport, 8, 0)


def _pcap(frames: list[bytes], endian: str = "<", ns: bool = False) -> bytes:
    magic = {
        ("<", False): b"\xd4\xc3\xb2\xa1",
        (">", False): b"\xa1\xb2\xc3\xd4",
        ("<", True): b"\x4d\x3c\xb2\xa1",
        (">", True): b"\xa1\xb2\x3c\x4d",
    }[(endian, ns)]
    out = magic + struct.pack(endian + "HHiIII", 2, 4, 0, 0, 65535, 1)
    frac = 500_000_000 if ns else 500_000  # always 0.5s
    for i, f in enumerate(frames):
        out += struct.pack(endian + "IIII", 1_600_000_000 + i, frac, len(f), len(f)) + f
    return out


FRAMES = [
    _eth_ipv4(6, bytes([10, 0, 0, 1]), bytes([10, 0, 0, 2]), _tcp(443, 51000)),
    _eth_ipv4(17, bytes([192, 168, 1, 5]), bytes([8, 8, 8, 8]), _udp(5353, 53)),
    b"\x00\x01\x02",  # truncated garbage frame
]


@pytest.mark.parametrize("endian,ns", [("<", False), (">", False), ("<", True)])
def test_decode_pcap_variants(endian, ns):
    rows = decode_pcap(_pcap(FRAMES, endian, ns))
    assert [r["type"] for r in rows] == ["TCP", "UDP", "UNKNOWN"]
    tcp, udp, bad = rows
    assert tcp["src_ip"] == "10.0.0.1" and tcp["dst_ip"] == "10.0.0.2"
    assert (tcp["src_port"], tcp["dst_port"]) == (443, 51000)
    assert tcp["tcp_flags"] == 0x18
    assert tcp["src_mac_address"] == "06:07:08:09:0A:0B"
    assert udp["dst_port"] == 53 and udp["tcp_flags"] is None
    assert bad["data"] == b"\x00\x01\x02" and bad["packet_length"] == 3
    # 0.5s fraction decodes identically for micro and nano captures
    assert all(r["timestamp"].microsecond == 500_000 for r in rows)


def test_read_pcap_distributed(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"cap{i}.pcap").write_bytes(_pcap(FRAMES))
    df = read_pcap(spark, str(tmp_path))
    assert df.count() == 9
    assert df.where("type = 'TCP' and dst_port = 51000").count() == 3
    got = df.groupBy("type").count().collect()
    assert {r["type"]: r["count"] for r in got} == {"TCP": 3, "UDP": 3, "UNKNOWN": 3}


def test_pcap_sqlfront_path(session, tmp_path):
    p = tmp_path / "t.pcap"
    p.write_bytes(_pcap(FRAMES))
    rows = session.sql(
        f"select src_ip, dst_port from dfs.`{p}` where type = 'UDP'"
    ).collect()
    assert [(r["src_ip"], r["dst_port"]) for r in rows] == [("192.168.1.5", 53)]


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        decode_pcap(b"NOTPCAP" + b"\x00" * 40)


def test_table_format_gates(spark, tmp_path):
    """daffodil without a schemaURI names the missing option (it is now
    a native reader, tests/test_dfdl.py); delta/iceberg/paimon read
    natively and identify a non-table directory crisply."""
    from drill_spark.readers.files import read_auto

    with pytest.raises(ValueError, match="schemaURI"):
        read_auto(spark, str(tmp_path), "daffodil")

    for fmt, msg in (("iceberg", "not a"), ("delta", "not a"), ("paimon", "not a")):
        with pytest.raises(FileNotFoundError, match=msg):
            read_auto(spark, str(tmp_path), fmt)
