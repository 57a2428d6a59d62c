"""Pcapng reader (reference contrib/format-pcapng PcapngBatchReader /
PcapColumn column surface). Captures are assembled from the public
pcapng block spec with struct.pack, independent of the decoder."""

from __future__ import annotations

import struct

import pytest

from drill_spark.readers.pcapng import decode_pcapng, read_pcapng


def _block(btype: int, body: bytes, bo: str = "<") -> bytes:
    total = 12 + len(body) + (-len(body)) % 4
    return (
        struct.pack(bo + "II", btype, total)
        + body + b"\x00" * ((-len(body)) % 4)
        + struct.pack(bo + "I", total)
    )


def _opt(code: int, val: bytes, bo: str = "<") -> bytes:
    return struct.pack(bo + "HH", code, len(val)) + val + b"\x00" * ((-len(val)) % 4)


def _shb(bo: str = "<", opts: bytes = b"") -> bytes:
    body = struct.pack(bo + "IHHq", 0x1A2B3C4D, 1, 0, -1) + opts
    return _block(0x0A0D0D0A, body, bo)


def _idb(tsresol: int | None = None, bo: str = "<", extra: bytes = b"") -> bytes:
    opts = extra
    if tsresol is not None:
        opts += _opt(9, bytes([tsresol]), bo)
    opts += struct.pack(bo + "HH", 0, 0)
    return _block(0x00000001, struct.pack(bo + "HHI", 1, 0, 0) + opts, bo)


def _tcp_frame(src_port=1234, dst_port=80, flags=0x12, ack=777) -> bytes:
    eth = bytes(6) + bytes(range(6)) + b"\x08\x00"
    tcp = struct.pack(">HHIIBB", src_port, dst_port, 1, ack, 0x50, flags) + b"\x00" * 8
    ip = bytes([0x45, 0]) + struct.pack(">H", 20 + len(tcp)) + b"\x00" * 4
    ip += bytes([64, 6]) + b"\x00\x00" + bytes([10, 0, 0, 1]) + bytes([10, 0, 0, 2])
    return eth + ip + tcp


def _epb(frame: bytes, ts: int, bo: str = "<") -> bytes:
    body = struct.pack(bo + "IIIII", 0, ts >> 32, ts & 0xFFFFFFFF, len(frame), len(frame))
    return _block(0x00000006, body + frame, bo)


def test_epb_tcp_columns_and_flags():
    ts = 1_700_000_000 * 10**6 + 250_000  # microseconds (default tsresol)
    cap = _shb() + _idb() + _epb(_tcp_frame(flags=0x12), ts)
    (r,) = decode_pcapng(cap)
    assert r["type"] == "TCP" and r["src_ip"] == "10.0.0.1" and r["dst_port"] == 80
    assert r["timestamp"].year == 2023 and r["timestamp"].microsecond == 250_000
    assert r["tcp_ack"] == 777
    assert r["tcp_flags"] == 0x12
    assert r["tcp_flags_syn"] == 1 and r["tcp_flags_ack"] == 1
    assert r["tcp_flags_fin"] == 0 and r["tcp_flags_rst"] == 0
    assert r["tcp_parsed_flags"] == "ACK|SYN"
    assert r["tcp_session"] is not None


def test_session_id_is_bidirectional():
    ts = 1_700_000_000 * 10**6
    fwd = _tcp_frame(src_port=1234, dst_port=80)
    # reverse direction: swap ips and ports
    rev = bytearray(_tcp_frame(src_port=80, dst_port=1234))
    rev[26:30], rev[30:34] = bytes([10, 0, 0, 2]), bytes([10, 0, 0, 1])
    cap = _shb() + _idb() + _epb(fwd, ts) + _epb(bytes(rev), ts + 1)
    r1, r2 = decode_pcapng(cap)
    assert r1["tcp_session"] == r2["tcp_session"]


def test_tsresol_nanoseconds_and_big_endian():
    ts_ns = 1_700_000_000 * 10**9 + 123
    cap = _shb(">") + _idb(tsresol=9, bo=">") + _epb(_tcp_frame(), ts_ns, ">")
    (r,) = decode_pcapng(cap)
    assert r["timestamp"].year == 2023
    # pcapng spec: power-of-2 resolution when the high bit is set
    ts_p2 = 1_700_000_000 * (1 << 20)
    cap2 = _shb() + _idb(tsresol=0x80 | 20) + _epb(_tcp_frame(), ts_p2)
    (r2,) = decode_pcapng(cap2)
    assert r2["timestamp"].year == 2023


def test_stat_mode_metadata():
    opts = _opt(2, b"bigiron") + _opt(3, b"linux-6.1") + _opt(4, b"dumpcap") \
        + struct.pack("<HH", 0, 0)
    idb_opts = _opt(2, b"eth0") + _opt(8, struct.pack("<Q", 10**9))
    cap = _shb(opts=opts) + _idb(extra=idb_opts) + _epb(_tcp_frame(), 0)
    (r,) = decode_pcapng(cap, stat=True)
    assert r["shb_hardware"] == "bigiron" and r["shb_os"] == "linux-6.1"
    assert r["shb_userappl"] == "dumpcap"
    assert r["if_name"] == "eth0" and r["if_speed"] == 10**9


def test_not_pcapng_raises():
    with pytest.raises(ValueError, match="Section Header"):
        decode_pcapng(b"\xd4\xc3\xb2\xa1" + b"\x00" * 20)


def test_read_pcapng_via_sqlfront(session, tmp_path):
    ts = 1_700_000_000 * 10**6
    cap = _shb() + _idb() + _epb(_tcp_frame(flags=0x02), ts) + _epb(_tcp_frame(flags=0x10), ts + 5)
    (tmp_path / "c.pcapng").write_bytes(cap)
    got = session.sql(
        f"select type, tcp_parsed_flags from dfs.`{tmp_path}/c.pcapng` order by `timestamp`"
    ).collect()
    assert [(r[0], r[1]) for r in got] == [("TCP", "SYN"), ("TCP", "ACK")]
    stat = session.sql(
        f"select * from table(dfs.`{tmp_path}/c.pcapng`(`type` => 'pcapng', stat => 'true'))"
    ).collect()
    assert len(stat) == 1 and stat[0].path.endswith("c.pcapng")
