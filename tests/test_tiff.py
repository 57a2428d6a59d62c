"""Baseline TIFF codec (ops/tiff.py) — TIFF 6.0 spec fixtures.

Roundtrip oracles: the encoder and decoder share only the wire format,
and every compression (none / TIFF-LZW with its early-change width
rule / Deflate / PackBits), both byte orders, multi-strip layouts and
the horizontal-differencing predictor must reproduce pixels exactly.
Palette and gray photometrics are built by hand against closed forms.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from drill_spark.ops.tiff import (
    _packbits_decode,
    _packbits_encode,
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    decode_tiff,
    encode_tiff,
    probe_tiff_header,
)


def test_packbits_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        n = int(rng.integers(1, 400))
        # runs + noise mix to hit both literal and repeat branches
        data = bytes(rng.integers(0, 4, n, dtype=np.uint8))
        assert _packbits_decode(_packbits_encode(data), n) == data


def test_tiff_lzw_roundtrip():
    rng = np.random.default_rng(2)
    for n in (1, 50, 1000, 20000):  # 20000 forces width growth 9->12
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), n) == data
    runs = b"\x07" * 5000 + b"\x09\x07\x07\x09" * 100  # KwKwK stress
    assert _tiff_lzw_decode(_tiff_lzw_encode(runs), len(runs)) == runs


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
@pytest.mark.parametrize("pred", [1, 2])
def test_tiff_rgb_roundtrip(comp, pred):
    rng = np.random.default_rng(comp * 10 + pred)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    for order in ("<", ">"):
        payload = encode_tiff(img, compression=comp, predictor=pred,
                              byte_order=order)
        assert (decode_tiff(payload) == img).all(), (comp, pred, order)
        assert probe_tiff_header(payload) == (9, 13)


def test_tiff_multi_strip():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(23, 7, 3), dtype=np.uint8)
    payload = encode_tiff(img, compression=32773, rows_per_strip=5)
    assert (decode_tiff(payload) == img).all()


def test_tiff_gray_and_palette():
    # hand-built gray (BlackIsZero and WhiteIsZero) + palette IFDs
    def build(photo, pixels, colormap=None, spp=1):
        e = "<"
        h, w = pixels.shape[:2]
        strip = pixels.tobytes()
        tags = [
            (256, 4, 1, struct.pack(e + "I", w)),
            (257, 4, 1, struct.pack(e + "I", h)),
            (258, 3, 1, struct.pack(e + "HH", 8, 0)),
            (259, 3, 1, struct.pack(e + "HH", 1, 0)),
            (262, 3, 1, struct.pack(e + "HH", photo, 0)),
            (277, 3, 1, struct.pack(e + "HH", spp, 0)),
            (279, 4, 1, struct.pack(e + "I", len(strip))),
        ]
        extra = b""
        n = len(tags) + 1 + (1 if colormap is not None else 0)
        ifd_size = 2 + 12 * n + 4
        strip_off = 8 + ifd_size
        if colormap is not None:
            cm = struct.pack(e + "H" * len(colormap), *colormap)
            tags.append((320, 3, len(colormap),
                         struct.pack(e + "I", strip_off)))
            extra = cm
            strip_off += len(cm)
        tags.append((273, 4, 1, struct.pack(e + "I", strip_off)))
        tags.sort(key=lambda t: t[0])
        ifd = struct.pack(e + "H", n)
        for tag, typ, cnt, raw in tags:
            ifd += struct.pack(e + "HHI", tag, typ, cnt) + raw.ljust(4, b"\x00")
        ifd += b"\x00\x00\x00\x00"
        return struct.pack(e + "2sHI", b"II", 42, 8) + ifd + extra + strip

    g = np.array([[0, 100, 255], [1, 2, 3]], dtype=np.uint8)
    out = decode_tiff(build(1, g))
    assert (out == np.repeat(g[:, :, None], 3, axis=2)).all()
    out0 = decode_tiff(build(0, g))  # WhiteIsZero inverts
    assert (out0 == np.repeat((255 - g)[:, :, None], 3, axis=2)).all()

    # palette: 4-entry ColorMap, 16-bit ramps (value = 8-bit << 8)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    reds, greens, blues = [10, 20, 30, 40], [50, 60, 70, 80], [90, 100, 110, 120]
    cm = [v << 8 for v in reds + greens + blues]
    out = decode_tiff(build(3, idx, colormap=cm))
    expect = np.stack([np.array(reds)[idx], np.array(greens)[idx],
                       np.array(blues)[idx]], axis=2)
    assert (out == expect).all()


def test_tiff_media_dispatch():
    from drill_spark.ops.multimodal import decode_media, probe_image_header

    img = np.full((4, 6, 3), 77, dtype=np.uint8)
    payload = encode_tiff(img, compression=5)
    assert probe_image_header(payload) == ("tiff", 6, 4)
    got = decode_media(payload)
    assert got["kind"] == "image/tiff"
    assert (got["width"], got["height"], got["mean_val"]) == (6, 4, 77.0)


def test_tiff_gates_are_named():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_tiff(img))
    # flip compression tag (259) value to an unsupported scheme (4 = T.6)
    e = "<"
    n = struct.unpack_from(e + "H", payload, 8)[0]
    for i in range(n):
        tag = struct.unpack_from(e + "H", payload, 10 + 12 * i)[0]
        if tag == 259:
            struct.pack_into(e + "H", payload, 10 + 12 * i + 8, 4)
    with pytest.raises(NotImplementedError, match="compression 4"):
        decode_tiff(bytes(payload))
