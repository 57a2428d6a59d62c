"""Image format reader (reference contrib/format-image
ImageBatchReader.java + GenericMetadataDirectory tag surface). EXIF
fixtures are assembled byte-by-byte from the public EXIF/TIFF spec —
independent of the parser under test."""

from __future__ import annotations

import struct

from drill_spark.readers.image import parse_exif, probe_image_meta, read_images


def _tiff_exif(bo: str = "<") -> bytes:
    """TIFF blob: IFD0 {Make='TestCam', Orientation=6, ExifIFD->{ISO=200,
    DateTimeOriginal}, GPSIFD->{GPSLatitude 3 rationals}}."""
    def entry(tag, typ, cnt, payload):
        return struct.pack(bo + "HHI", tag, typ, cnt) + payload

    def off(v):
        return struct.pack(bo + "I", v)

    make = b"TestCam\x00"
    dto = b"2024:06:01 10:00:00\x00"
    # layout: header(8) IFD0(2+4*12+4=54) -> data area
    ifd0_off = 8
    n0 = 4
    ifd0_end = ifd0_off + 2 + n0 * 12 + 4
    make_off = ifd0_end
    exif_off = make_off + len(make)
    gps_off = exif_off + 2 + 2 * 12 + 4 + len(dto)
    dto_off = exif_off + 2 + 2 * 12 + 4
    gps_end = gps_off + 2 + 1 * 12 + 4
    lat_off = gps_end

    ifd0 = struct.pack(bo + "H", n0)
    ifd0 += entry(0x010F, 2, len(make), off(make_off))          # Make
    ifd0 += entry(0x0112, 3, 1, struct.pack(bo + "HH", 6, 0))   # Orientation
    ifd0 += entry(0x8769, 4, 1, off(exif_off))                  # Exif pointer
    ifd0 += entry(0x8825, 4, 1, off(gps_off))                   # GPS pointer
    ifd0 += off(0)

    exif = struct.pack(bo + "H", 2)
    exif += entry(0x8827, 3, 1, struct.pack(bo + "HH", 200, 0))  # ISO
    exif += entry(0x9003, 2, len(dto), off(dto_off))             # DateTimeOriginal
    exif += off(0)

    gps = struct.pack(bo + "H", 1)
    gps += entry(0x0002, 5, 3, off(lat_off))                     # GPSLatitude
    gps += off(0)
    lat = struct.pack(bo + "IIIIII", 47, 1, 30, 1, 125, 10)

    blob = bytearray(b"II" if bo == "<" else b"MM")
    blob += struct.pack(bo + "H", 42) + off(ifd0_off)
    blob += ifd0 + make + exif + dto + gps + lat
    return bytes(blob)


def test_parse_exif_both_byte_orders():
    for bo in ("<", ">"):
        tags = parse_exif(_tiff_exif(bo))
        assert tags["Make"] == "TestCam"
        assert tags["Orientation"] == "6"
        assert tags["ISOSpeedRatings"] == "200"
        assert tags["DateTimeOriginal"] == "2024:06:01 10:00:00"
        assert tags["GPSLatitude"] == "47, 30, 12.5"


def _jpeg_with_exif() -> bytes:
    tiff = _tiff_exif("<")
    app1 = b"Exif\x00\x00" + tiff
    jfif = b"JFIF\x00\x01\x02\x01" + struct.pack(">HH", 300, 300) + b"\x00\x00"
    sof = struct.pack(">BHHB", 8, 480, 640, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    out = b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    out += b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += b"\xff\xd9"
    return out


def test_jpeg_meta_with_exif_and_jfif():
    m = probe_image_meta(_jpeg_with_exif())
    assert (m["format"], m["pixel_width"], m["pixel_height"]) == ("jpeg", 640, 480)
    assert m["color_mode"] == "YCbCr" and m["bits_per_pixel"] == 24
    assert m["dpi_width"] == 300.0 and m["orientation"] == 6
    assert m["exif"]["Make"] == "TestCam"


def _png(w=100, h=50, ctype=6, depth=8, phys=None) -> bytes:
    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + b"\x00\x00\x00\x00"

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if phys:
        out += chunk(b"pHYs", struct.pack(">IIB", phys, phys, 1))
    return out + chunk(b"IEND", b"")


def test_png_meta_rgba_and_dpi():
    m = probe_image_meta(_png(phys=11811))  # 11811 ppm = 300 dpi
    assert (m["format"], m["pixel_width"], m["pixel_height"]) == ("png", 100, 50)
    assert m["color_mode"] == "RGBA" and m["has_alpha"] is True
    assert m["bits_per_pixel"] == 32
    assert m["dpi_width"] == 300.0


def test_gif_and_bmp_meta():
    gif = b"GIF89a" + struct.pack("<HH", 12, 7) + bytes([0xF7, 0, 0])
    m = probe_image_meta(gif)
    assert (m["format"], m["pixel_width"], m["pixel_height"]) == ("gif", 12, 7)
    assert m["bits_per_pixel"] == 8

    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 33, -44) + b"\x00\x00"
    bmp += struct.pack("<H", 24) + b"\x00" * 8 + struct.pack("<ii", 11811, 11811)
    m = probe_image_meta(bmp)
    assert (m["format"], m["pixel_width"], m["pixel_height"]) == ("bmp", 33, 44)
    assert m["color_mode"] == "RGB" and m["dpi_width"] == 300.0


def test_read_images_dataframe(spark, tmp_path):
    (tmp_path / "a.png").write_bytes(_png(w=10, h=20))
    (tmp_path / "b.jpg").write_bytes(_jpeg_with_exif())
    (tmp_path / "noise.txt").write_text("not an image")
    df = read_images(spark, str(tmp_path))
    rows = {r.file_name: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.jpg"}
    assert rows["a.png"].pixel_width == 10 and rows["a.png"].format == "png"
    assert rows["b.jpg"].exif["Model"] if "Model" in rows["b.jpg"].exif else True
    assert rows["b.jpg"].orientation == 6
    assert rows["b.jpg"].file_size == len(_jpeg_with_exif())


def test_image_via_sqlfront(session, tmp_path):
    (tmp_path / "x.png").write_bytes(_png(w=64, h=32))
    got = session.sql(
        f"select format, pixel_width, exif['Make'] as mk from dfs.`{tmp_path}/x.png`"
    ).collect()
    assert got[0][0] == "png" and got[0][1] == 64 and got[0][2] is None
