"""FLAC codec (ops/flac.py): encoder/decoder roundtrips plus hand-built
frames for every decoder path the encoder itself never emits (LPC,
VERBATIM, RICE2, escape partitions, wasted bits, stereo decorrelation,
fixed block-size codes) — the decode expectations are computed
independently with plain Python arithmetic."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from drill_spark.ops.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_encode,
    decode_flac,
    encode_flac,
    probe_flac,
)


def test_roundtrip_mono_sine():
    x = (np.sin(np.arange(10000) / 20) * 12000).astype("int64")
    blob = encode_flac(x, 16000)
    y, rate, bps = decode_flac(blob)
    assert (rate, bps) == (16000, 16)
    assert np.array_equal(y[:, 0], x)
    assert len(blob) < len(x) * 2 * 0.6  # genuinely compresses


def test_roundtrip_stereo_noise():
    rng = np.random.default_rng(7)
    st_ = np.stack([rng.integers(-32768, 32767, 9000), np.full(9000, 123)], axis=1)
    y, _, _ = decode_flac(encode_flac(st_, 44100))
    assert np.array_equal(y, st_)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 5, 4096, 4097])
def test_roundtrip_boundary_lengths(n):
    x = (np.arange(n) * 97) % 5000 - 2500
    y, _, _ = decode_flac(encode_flac(x, 8000))
    assert y.shape == (n, 1) and np.array_equal(y[:, 0], x)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_roundtrip_depths(bits):
    lim = 1 << (bits - 1)
    x = (np.sin(np.arange(3000) / 9) * (lim // 2)).astype("int64")
    y, _, got = decode_flac(encode_flac(x, 22050, bits=bits))
    assert got == bits and np.array_equal(y[:, 0], x)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=700))
def test_roundtrip_property(xs):
    x = np.array(xs, dtype="int64")
    y, _, _ = decode_flac(encode_flac(x, 8000))
    assert np.array_equal(y[:, 0] if len(xs) else y.reshape(-1), x)


def test_corruption_detected():
    blob = bytearray(encode_flac(np.arange(5000) % 2000, 16000))
    blob[len(blob) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def test_truncation_detected():
    blob = encode_flac(np.arange(5000) % 2000, 16000)
    with pytest.raises(ValueError):
        decode_flac(blob[: len(blob) - 10])


# ------------------------------------------------- hand-built streams


def _streaminfo(bs, n, rate=8000, nch=1, bps=16):
    w = _BitWriter()
    w.write(bs, 16)
    w.write(bs, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(rate, 20)
    w.write(nch - 1, 3)
    w.write(bps - 1, 5)
    w.write(n, 36)
    w.align()
    body = bytes(w.buf) + b"\x00" * 16  # zero MD5 -> check skipped
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame(bs_code, bs, chan_code, write_subframes, rate=8000, bps_code=0b100):
    """Hand-assemble one frame; write_subframes(BitWriter) fills the
    channel payloads."""
    hw = _BitWriter()
    hw.write(0b11111111111110, 14)
    hw.write(0, 2)              # reserved + fixed blocking
    hw.write(bs_code, 4)
    hw.write(0, 4)              # sample rate from STREAMINFO
    hw.write(chan_code, 4)
    hw.write(bps_code, 3)
    hw.write(0, 1)
    hw.align()
    head = bytes(hw.buf) + _utf8_encode(0)
    if bs_code == 6:
        head += bytes([bs - 1])
    elif bs_code == 7:
        head += struct.pack(">H", bs - 1)
    head += bytes([_crc8(head)])
    sw = _BitWriter()
    write_subframes(sw)
    sw.align()
    frame = head + bytes(sw.buf)
    return frame + struct.pack(">H", _crc16(frame))


def _write_verbatim(w, samples, bps=16):
    w.write(0, 1)
    w.write(1, 6)  # VERBATIM
    w.write(0, 1)
    for v in samples:
        w.write(v & ((1 << bps) - 1), bps)


def test_decode_lpc_subframe():
    """LPC order 2, precision 12, shift 3, coefs [5, -2]: the decoder
    must reproduce x[i] = ((5*x[i-1] - 2*x[i-2]) >> 3) + e[i]."""
    warm = [100, 104]
    res = [3, -2, 0, 7, -5, 1, 2, -1]
    bs = len(warm) + len(res)

    def sub(w):
        w.write(0, 1)
        w.write(0x20 | 1, 6)   # LPC, order 2
        w.write(0, 1)
        for v in warm:
            w.write(v & 0xFFFF, 16)
        w.write(12 - 1, 4)     # precision
        w.write(3, 5)          # shift
        for c in (5, -2):
            w.write(c & 0xFFF, 12)
        w.write(0, 2)          # RICE
        w.write(0, 4)          # partition order 0
        w.write(2, 4)          # rice param 2
        for r in res:
            z = (r << 1) if r >= 0 else (-(r << 1) - 1)
            w.write(1, (z >> 2) + 1)
            w.write(z & 3, 2)

    blob = _streaminfo(bs, bs) + _frame(6, bs, 0, sub)
    y, _, _ = decode_flac(blob)
    x = list(warm)
    for e in res:
        x.append(((5 * x[-1] - 2 * x[-2]) >> 3) + e)
    assert list(y[:, 0]) == x


def test_decode_wasted_bits():
    """CONSTANT subframe with 2 wasted bits: stored value is shifted
    left by 2 on output."""
    bs = 16

    def sub(w):
        w.write(0, 1)
        w.write(0, 6)          # CONSTANT
        w.write(1, 1)          # wasted-bits flag
        w.write(1, 2)          # unary 1 -> k = 2 wasted bits
        w.write(777 & 0x3FFF, 14)  # bps reduced to 14

    blob = _streaminfo(bs, bs) + _frame(6, bs, 0, sub)
    y, _, _ = decode_flac(blob)
    assert list(y[:, 0]) == [777 << 2] * bs


def test_decode_rice2_and_escape_partitions():
    """FIXED order 0 with RICE2 coding, partition order 1: partition 0
    uses an escaped (verbatim 9-bit) partition, partition 1 rice2."""
    res = [200, -200, 150, -150, 3, -3, 2, -2]
    bs = len(res)

    def sub(w):
        w.write(0, 1)
        w.write(8, 6)          # FIXED order 0
        w.write(0, 1)
        w.write(1, 2)          # RICE2 (5-bit params)
        w.write(1, 4)          # partition order 1 -> 2 partitions
        w.write(0x1F, 5)       # partition 0: escape
        w.write(9, 5)          # raw bits
        for r in res[:4]:
            w.write(r & 0x1FF, 9)
        w.write(1, 5)          # partition 1: rice2 param 1
        for r in res[4:]:
            z = (r << 1) if r >= 0 else (-(r << 1) - 1)
            w.write(1, (z >> 1) + 1)
            w.write(z & 1, 1)

    blob = _streaminfo(bs, bs) + _frame(6, bs, 0, sub)
    y, _, _ = decode_flac(blob)
    assert list(y[:, 0]) == res


@pytest.mark.parametrize(
    "chan_code,expect",
    [
        (8, lambda l, s: (l, [a - b for a, b in zip(l, s)])),      # left/side
        (9, lambda s, r: ([a + b for a, b in zip(s, r)], r)),      # side/right
        (
            10,
            lambda m, s: (
                [((mm << 1 | (ss & 1)) + ss) >> 1 for mm, ss in zip(m, s)],
                [((mm << 1 | (ss & 1)) - ss) >> 1 for mm, ss in zip(m, s)],
            ),
        ),  # mid/side
    ],
)
def test_decode_stereo_decorrelation(chan_code, expect):
    c0 = [1000, -500, 250, 4]
    c1 = [3, -3, 17, -101]  # the side channel (one extra bit wide)
    bs = 4
    wide = {8: (16, 17), 9: (17, 16), 10: (16, 17)}[chan_code]

    def sub(w):
        _write_verbatim(w, c0, bps=wide[0])
        _write_verbatim(w, c1, bps=wide[1])

    blob = _streaminfo(bs, bs, nch=2) + _frame(6, bs, chan_code, sub)
    y, _, _ = decode_flac(blob)
    left, right = expect(c0, c1)
    assert list(y[:, 0]) == left and list(y[:, 1]) == right


def test_decode_fixed_blocksize_code():
    """Block-size code 1 = 192 samples with no trailing size field."""
    samples = [(i * 37) % 400 - 200 for i in range(192)]

    def sub(w):
        _write_verbatim(w, samples)

    blob = _streaminfo(192, 192) + _frame(1, 192, 0, sub)
    y, _, _ = decode_flac(blob)
    assert list(y[:, 0]) == samples


def test_probe_reads_streaminfo_only():
    p = probe_flac(encode_flac(np.zeros(4800, dtype=int), 48000))
    assert p["sample_rate"] == 48000 and p["n_samples"] == 4800
    assert p["channels"] == 1 and p["bits_per_sample"] == 16
    assert abs(p["duration_s"] - 0.1) < 1e-9


def test_decode_fixed_order4_many_partitions():
    """FIXED order 4 (residual = 4th finite difference; reconstruction
    is a depth-4 seeded cumsum chain in the vectorized decoder) with
    partition order 2 -> 4 Rice partitions with DIFFERENT params,
    exercising back-to-back partition slices of the 1-bit index."""
    import random

    rng = random.Random(99)
    bs = 64
    # build x from known residuals so expected output is closed-form
    warm = [10, 13, 9, 14]
    res = [rng.randrange(-6, 7) for _ in range(bs - 4)]
    x = list(warm)
    for e in res:
        pred = 4 * x[-1] - 6 * x[-2] + 4 * x[-3] - 1 * x[-4]
        x.append(pred + e)

    def sub(w):
        w.write(0, 1)
        w.write(0b001000 | 4, 6)  # FIXED, order 4
        w.write(0, 1)
        for v in warm:
            w.write(v & 0xFFFF, 16)
        w.write(0, 2)              # RICE (4-bit params)
        w.write(2, 4)              # partition order 2 -> 4 partitions
        # partition 0: bs/4 - order = 12 samples; partitions 1-3: 16
        params = [1, 3, 0, 2]
        idx = 0
        for part, p in enumerate(params):
            cnt = (bs >> 2) - (4 if part == 0 else 0)
            w.write(p, 4)
            for r in res[idx: idx + cnt]:
                z = (r << 1) if r >= 0 else (-(r << 1) - 1)
                w.write(1, (z >> p) + 1)     # unary quotient + stop
                if p:
                    w.write(z & ((1 << p) - 1), p)
            idx += cnt
        assert idx == len(res)

    blob = _streaminfo(bs, bs) + _frame(6, bs, 0, sub)
    y, _, _ = decode_flac(blob)
    assert list(y[:, 0]) == x
