"""Pure-python PNG codec: lossless round-trip + per-filter proofs."""

import struct
import zlib

import numpy as np
import pytest

from graphouse_spark.functions.png import _chunk, decode_png, encode_png


def test_lossless_roundtrip_all_color_types():
    rng = np.random.default_rng(3)
    for shape in [(1, 1), (5, 7), (9, 4, 3), (6, 6, 4), (3, 8, 2)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        d = decode_png(encode_png(img))
        assert (d["width"], d["height"]) == (shape[1], shape[0])
        assert (d["pixels"] == img).all()


def _png_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Build a PNG whose row y uses scanline filter ftypes[y] — the
    FORWARD filters implemented independently here, so decode's
    unfiltering is checked against a second implementation."""
    h, w = img.shape[:2]
    nc = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * nc).astype(np.int64)
    stride = w * nc
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        f = ftypes[y]
        line = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = cur[x - nc] if x >= nc else 0
            b = prev[x]
            c = prev[x - nc] if x >= nc else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else b if pb <= pc else c
            line[x] = (cur[x] - pred) & 0xFF
        raw.append(f)
        raw += bytes(int(v) for v in line)
        prev = cur
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nc]
    sig = b"\x89PNG\r\n\x1a\n"
    return (sig
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def test_all_five_scanline_filters_unfilter_correctly():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (10, 6, 3)).astype(np.uint8)
    for f in range(5):
        d = decode_png(_png_with_filters(img, [f] * 10))
        assert (d["pixels"] == img).all(), f"filter {f}"
    # mixed filters per row
    d = decode_png(_png_with_filters(img, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]))
    assert (d["pixels"] == img).all()


def test_crc_and_unsupported_rejected():
    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(encode_png(img))
    data[40] ^= 0xFF  # corrupt inside IDAT -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # 16-bit depth refused honestly
    bad = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)))
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bad)


def test_decode_assets_includes_png(spark):
    from graphouse_spark.functions.multimodal import decode_assets

    payload = encode_png(np.full((3, 5), 42, dtype=np.uint8))
    assets = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "asset_id long, modality string, payload binary")
    row = decode_assets(assets).collect()[0]
    assert row["format"] == "png"
    assert (row["width"], row["height"], row["n_channels"]) == (5, 3, 1)
    assert row["mean_value"] == 42.0


def test_mp4_metadata_box_walk(spark):
    """ISO-BMFF metadata parse on a byte-built fixture: ftyp + moov
    (mvhd timescale/duration, trak/tkhd 16.16 width/height)."""
    import struct

    from graphouse_spark.functions.multimodal import decode_payload

    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    mvhd = bytes(1) * 4 + struct.pack(">II", 0, 0) \
        + struct.pack(">II", 1000, 7500) + bytes(80)  # 7.5 s @ 1000 tz
    tkhd = bytes(4) + bytes(8) + struct.pack(">I", 1) + bytes(4) \
        + struct.pack(">I", 7500) + bytes(8 + 2 + 2 + 2 + 2 + 36) \
        + struct.pack(">II", 640 << 16, 360 << 16)
    payload = (box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
               + box(b"moov", box(b"mvhd", mvhd)
                     + box(b"trak", box(b"tkhd", tkhd))))
    meta = decode_payload(payload)
    assert meta["format"] == "mp4"
    assert meta["duration_ms"] == 7500
    assert (meta["width"], meta["height"]) == (640, 360)


def test_real_codec_resize_and_features(spark):
    """real_codec=True now actually decodes/resizes/re-encodes with the
    in-repo codecs (formerly NotImplementedError): a 2x2-block PNG
    resized to half comes back pixel-exact; features carry real content
    stats; undecodable image payloads still fail loudly."""
    from graphouse_spark.functions.multimodal import (
        extract_features,
        resize_images,
    )

    base = np.repeat(np.repeat(
        np.array([[10, 200], [60, 130]], dtype=np.uint8), 4, 0), 4, 1)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(base)))],
        "asset_id long, modality string, payload binary")

    out = resize_images(assets, width=2, height=2, real_codec=True).collect()[0]
    assert (out["width"], out["height"]) == (2, 2)
    resized = decode_png(bytes(out["payload"]))["pixels"]
    assert (resized == np.array([[10, 200], [60, 130]], dtype=np.uint8)).all()

    feats = extract_features(assets, real_codec=True,
                             n_features=6).collect()[0]["features"]
    # [w, h, channels, mean, std, first-channel mean]
    assert feats[0] == 8.0 and feats[1] == 8.0 and feats[2] == 1.0
    assert feats[3] == pytest.approx(base.mean())

    junk = spark.createDataFrame(
        [(2, "image", bytearray(b"not an image"))],
        "asset_id long, modality string, payload binary")
    with pytest.raises(Exception, match="no in-repo codec"):
        resize_images(junk, real_codec=True).collect()
