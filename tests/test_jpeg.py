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


def test_progressive_exactly_matches_baseline():
    """The progressive encoder entropy-codes the SAME quantized
    coefficients as the baseline encoder, so decoding both must give
    bit-identical RGB — an exact oracle covering interleaved DC scans
    with successive approximation, spectral-selection AC bands, and
    AC refinement (the full T.81 G.1.2 surface)."""
    from drill_spark.ops.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    for sub in ("4:4:4", "4:2:0"):
        for shape in ((24, 17), (8, 8), (3, 5), (16, 32)):
            img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
            base = decode_jpeg(encode_jpeg(img, 85, sub))
            prog = decode_jpeg(encode_jpeg_progressive(img, 85, sub))
            assert (base == prog).all(), (sub, shape)


def test_progressive_spectral_only_script():
    """A custom spectral-selection-only script (no successive
    approximation) — the other common progressive layout."""
    from drill_spark.ops.jpeg import encode_jpeg_progressive

    scans = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 9, 0, 0),
        ([0], 10, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(19, 23, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, 90))
    prog = decode_jpeg(encode_jpeg_progressive(img, 90, scans=scans))
    assert (base == prog).all()


def test_progressive_malformed_dc_scan_rejected():
    """A baseline-shaped SOS (Ss=0, Se=63) inside a SOF2 frame is
    invalid per T.81 G.1.1.1 and must raise, not decode garbage."""
    img = np.zeros((8, 8, 3), dtype="uint8")
    data = bytearray(encode_jpeg(img))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(data))


def test_unsupported_processes_still_gated():
    """Lossless (SOF3) and arithmetic (SOF9) still raise by name."""
    img = np.zeros((8, 8, 3), dtype="uint8")
    for sof, name in ((0xC3, "SOF3"), (0xC9, "SOF9")):
        data = bytearray(encode_jpeg(img))
        idx = bytes(data).find(b"\xff\xc0")
        data[idx + 1] = sof
        with pytest.raises(NotImplementedError, match=name):
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


def test_progressive_equality_property():
    """Property: for ANY image, progressive and baseline decodes are
    bit-identical (they entropy-code the same coefficients)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from drill_spark.ops.jpeg import encode_jpeg_progressive

    @settings(max_examples=12, deadline=None)
    @given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**31 - 1),
           st.sampled_from(["4:4:4", "4:2:0"]), st.sampled_from([70, 85, 95]))
    def check(h, w, seed, sub, q):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, q, sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, q, sub))
        assert (base == prog).all()

    check()
