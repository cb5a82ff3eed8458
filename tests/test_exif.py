"""EXIF / ICC / tEXt metadata extraction (functions/exif.py): writer ->
parser round-trips, both TIFF byte orders, JPEG multi-chunk ICC
reassembly, PNG chunk walk, and totality on hostile bytes (one bad
asset must never throw in a 100 TB scan)."""

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from graphouse_spark.functions.exif import (
    build_icc, build_tiff, image_metadata, jpeg_metadata, metadata_assets,
    parse_icc, parse_tiff, png_metadata)
from graphouse_spark.functions.png import _chunk


def test_tiff_round_trip_all_types():
    t = build_tiff(
        {0x010F: "camA", 0x0110: "modelXYZ", 0x0112: 6,
         0x0132: "2021:01:02 03:04:05", 0x011A: (72, 1)},
        {0x9003: "2021:01:02 03:04:06", 0x8827: 400, 0x829A: (1, 250),
         0xA002: 4096})
    got = parse_tiff(t)
    assert got == {
        "Make": "camA", "Model": "modelXYZ", "Orientation": "6",
        "DateTime": "2021:01:02 03:04:05", "XResolution": "72/1",
        "DateTimeOriginal": "2021:01:02 03:04:06",
        "ISOSpeedRatings": "400", "ExposureTime": "1/250",
        "PixelXDimension": "4096"}


def test_tiff_big_endian():
    """Hand-built MM (Motorola) blob: Orientation=3 inline SHORT."""
    blob = (b"MM\x00\x2a" + struct.pack(">I", 8)
            + struct.pack(">H", 1)
            + struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 3) + b"\x00\x00"
            + struct.pack(">I", 0))
    assert parse_tiff(blob) == {"Orientation": "3"}


def test_icc_round_trip():
    icc = build_icc("sRGB-ish", color_space="RGB ", device_class="mntr")
    got = parse_icc(icc)
    assert got["description"] == "sRGB-ish"
    assert got["color_space"] == "RGB"
    assert got["device_class"] == "mntr"
    assert got["pcs"] == "XYZ"
    assert int(got["profile_size"]) == len(icc)


def _jpeg_with_meta(tiff: bytes, icc: bytes, split: bool = True) -> bytes:
    app1 = b"Exif\x00\x00" + tiff
    out = b"\xff\xd8\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    parts = ([icc[: len(icc) // 2], icc[len(icc) // 2:]] if split
             else [icc])
    for i, part in enumerate(parts):
        pay = b"ICC_PROFILE\x00" + bytes([i + 1, len(parts)]) + part
        out += b"\xff\xe2" + struct.pack(">H", len(pay) + 2) + pay
    sof = bytes([8]) + struct.pack(">HH", 5, 7) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    return out + b"\xff\xda\x00\x02"


def test_jpeg_metadata_with_split_icc():
    t = build_tiff({0x010F: "cam1"})
    icc = build_icc("prof")
    m = jpeg_metadata(_jpeg_with_meta(t, icc, split=True))
    assert (m["width"], m["height"]) == (7, 5)
    assert m["exif"]["Make"] == "cam1"
    assert m["icc"]["description"] == "prof"  # reassembled across APP2s


def test_png_metadata_chunks():
    t = build_tiff({0x0110: "mdl"})
    icc = build_icc("pp")
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 5, 8, 2, 0, 0, 0))
    png = (b"\x89PNG\r\n\x1a\n" + ihdr
           + _chunk(b"eXIf", t)
           + _chunk(b"iCCP", b"nm\x00\x00" + zlib.compress(icc))
           + _chunk(b"tEXt", b"Author\x00me")
           + _chunk(b"IEND", b""))
    m = png_metadata(png)
    assert (m["width"], m["height"]) == (7, 5)
    assert m["exif"]["Model"] == "mdl"
    assert m["icc"]["description"] == "pp"
    assert m["icc"]["profile_name"] == "nm"
    assert m["text"] == {"Author": "me"}


def test_png_iccp_zip_bomb_is_bounded():
    """Round-10 ADVICE (low): a few-KB iCCP chunk inflating to
    gigabytes must not OOM the executor — the inflate is capped at
    64 KiB; overflow skips the profile but the walk continues (tEXt
    after the bomb still parses)."""
    bomb = zlib.compress(b"\x00" * (256 * 1024 * 1024), 9)  # ~256 MB -> ~KBs
    assert len(bomb) < 1024 * 1024
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 5, 8, 2, 0, 0, 0))
    png = (b"\x89PNG\r\n\x1a\n" + ihdr
           + _chunk(b"iCCP", b"nm\x00\x00" + bomb)
           + _chunk(b"tEXt", b"Author\x00me")
           + _chunk(b"IEND", b""))
    import resource
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    m = png_metadata(png)
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert m["icc"] == {}                    # profile skipped, not faked
    assert m["text"] == {"Author": "me"}     # walk continued past it
    assert (m["width"], m["height"]) == (7, 5)
    # peak RSS must not have grown by anywhere near the 256 MB payload
    assert after - before < 64 * 1024  # KiB units on linux


def test_unknown_format_is_typed_empty():
    m = image_metadata(b"not an image at all")
    assert m == {"format": None, "width": None, "height": None,
                 "exif": {}, "icc": {}, "text": {}}


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=300),
       st.sampled_from([b"", b"\xff\xd8", b"\x89PNG\r\n\x1a\n"]))
def test_total_on_hostile_bytes(blob, magic):
    """Arbitrary bytes behind any magic never raise — partial maps ok."""
    m = image_metadata(magic + blob)
    assert isinstance(m["exif"], dict) and isinstance(m["icc"], dict)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_tiff_and_icc_parsers_total(blob):
    assert isinstance(parse_tiff(blob), dict)
    assert isinstance(parse_icc(blob), dict)


def test_truncated_structures_keep_partial():
    """A truncated EXIF keeps the tags parsed before the cut."""
    t = build_tiff({0x010F: "cam", 0x0112: 1, 0x0110: "m" * 40})
    cut = parse_tiff(t[:-20])  # chop into the string heap
    assert cut.get("Make") == "cam" or cut == {}  # never raises


def test_metadata_assets_spark_path(spark):
    """The Spark pass: mapInPandas over payload column, typed maps."""
    t = build_tiff({0x010F: "camS", 0x0112: 2})
    icc = build_icc("sp")
    jpg = _jpeg_with_meta(t, icc)
    df = spark.createDataFrame([(1, bytearray(jpg)), (2, None)],
                               "asset_id long, payload binary")
    rows = {r["asset_id"]: r for r in metadata_assets(df).collect()}
    assert rows[1]["format"] == "jpeg"
    assert rows[1]["exif"]["Make"] == "camS"
    assert rows[1]["icc"]["description"] == "sp"
    assert rows[2]["format"] is None and rows[2]["exif"] == {}
