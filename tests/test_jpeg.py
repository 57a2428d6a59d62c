"""Baseline JPEG codec (ops/jpeg.py) — ITU-T T.81 sequential DCT.

The reference's image plugin (contrib/format-image) reads only
metadata; pixel decode is this repo's extension surface, previously a
labeled stub boundary in ops/multimodal.py. Oracles here are
closed-form: constant-gray images survive the q75 codec EXACTLY (the
luminance DC step is 8 — the 8x8 DCT's DC gain), and structured
images bound their quantization error.
"""

from __future__ import annotations

import numpy as np
import pytest

from drill_spark.ops.jpeg import decode_jpeg, encode_jpeg


def test_constant_gray_exact_roundtrip():
    for v in (0, 7, 99, 128, 200, 255):
        for shape in ((3, 5), (8, 8), (17, 9)):
            img = np.full((*shape, 3), v, dtype="uint8")
            out = decode_jpeg(encode_jpeg(img))
            assert out.shape == (*shape, 3)
            assert (out == v).all(), (v, shape)


def test_structured_roundtrip_bounded_error():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, 95))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 12

    gx = np.linspace(0, 255, 64)
    grad = np.stack([np.tile(gx, (32, 1))] * 3, axis=2).astype("uint8")
    out = decode_jpeg(encode_jpeg(grad, 90))
    assert np.abs(out.astype(int) - grad.astype(int)).mean() < 3


def test_420_subsampling_roundtrip():
    """4:2:0 exercises the decoder's MCU interleave + chroma upsampling;
    on 2x2-aligned color content the decimation is lossless, so the
    error must track the 4:4:4 error."""
    rng = np.random.default_rng(3)
    small = rng.integers(64, 192, size=(16, 11, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)
    e444 = np.abs(decode_jpeg(encode_jpeg(img, 95)).astype(int) - img.astype(int)).mean()
    e420 = np.abs(
        decode_jpeg(encode_jpeg(img, 95, "4:2:0")).astype(int) - img.astype(int)
    ).mean()
    assert e420 < e444 + 3.0


def test_progressive_gate():
    """A SOF2 (progressive) frame header names the unsupported process
    instead of decoding garbage."""
    img = np.zeros((8, 8, 3), dtype="uint8")
    data = bytearray(encode_jpeg(img))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(bytes(data))


def test_header_probe_and_media_decode_dispatch():
    from drill_spark.ops.multimodal import decode_media, probe_image_header

    img = np.full((10, 20, 3), 55, dtype="uint8")
    payload = encode_jpeg(img)
    assert probe_image_header(payload) == ("jpeg", 20, 10)
    got = decode_media(payload)
    assert got["kind"] == "image/jpeg"
    assert (got["width"], got["height"]) == (20, 10)
    assert got["mean_val"] == 55.0


def test_resize_jpeg_payload():
    from drill_spark.ops.multimodal import decode_bmp, resize_image

    img = np.full((12, 16, 3), 80, dtype="uint8")
    out = resize_image(encode_jpeg(img), 8, 6)
    assert (decode_bmp(out) == 80).all()


def test_roundtrip_property():
    """Property: any uint8 image decodes to the right shape with
    bounded per-pixel luma error at high quality."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**31 - 1))
    def check(h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 98))
        assert out.shape == img.shape
        luma = lambda a: 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
        assert np.abs(luma(out.astype(float)) - luma(img.astype(float))).mean() < 16

    check()
