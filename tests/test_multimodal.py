"""Multimodal plumbing: Arrow-batched stubs with real schemas/batching."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.multimodal import (
    extract_features,
    frame_sample_plan,
    resize_images,
    synthetic_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return synthetic_assets(spark, docs)


def test_extract_features_deterministic_schema(spark, assets):
    out = extract_features(assets, n_features=8)
    rows = out.limit(50).collect()
    assert rows and all(len(r["features"]) == 8 for r in rows if r["features"])
    a = out.orderBy("asset_id").limit(5).collect()
    b = extract_features(assets, n_features=8).orderBy("asset_id").limit(5).collect()
    assert a == b  # sha1-derived stub: stable across runs


def test_real_codec_raises_only_for_undecodable_payloads(spark, assets):
    """real_codec=True is now REAL for the in-repo codec formats
    (tests/test_png.py::test_real_codec_resize_and_features); these
    synthetic text payloads are not decodable images, so the real path
    must still fail loudly rather than fake features."""
    imgs = assets.filter(F.col("modality") == "image")
    with pytest.raises(Exception, match="no in-repo codec"):
        extract_features(imgs, real_codec=True).collect()
    with pytest.raises(Exception, match="no in-repo codec"):
        resize_images(imgs, real_codec=True).collect()


def test_resize_contract(spark, assets):
    out = resize_images(assets, width=8, height=8).collect()
    imgs = [r for r in out if r["modality"] == "image"]
    rest = [r for r in out if r["modality"] != "image"]
    assert imgs and all(r["n_bytes"] == 8 * 8 * 3 for r in imgs)
    assert all((r["width"], r["height"]) == (8, 8) for r in imgs)
    assert all(r["width"] is None and r["height"] is None for r in rest)
    assert len(out) == len(imgs) + len(rest)  # nothing dropped


def test_frame_sample_counts_follow_metadata(spark, assets):
    plan = frame_sample_plan(assets, every_ms=500)
    per = plan.groupBy("asset_id").agg(F.count(F.lit(1)).alias("n")).collect()
    durations = {r["asset_id"]: r["duration_ms"]
                 for r in assets.filter(F.col("modality") == "video").collect()}
    assert per and all(r["n"] == durations[r["asset_id"]] // 500 + 1 for r in per)


# --- real codec-free decoders (WAV/BMP/PPM) ---

def _make_wav(rate=8000, freq=440.0, seconds=0.25):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    n = int(rate * seconds)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack("<h", int(20000 * math.sin(2 * math.pi * freq * i / rate)))
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def _make_bmp(w=4, h=2, rgb=(10, 20, 30)):
    import struct

    row = (bytes(rgb[::-1]) * w)  # BMP stores BGR
    pad = b"\x00" * ((4 - (w * 3) % 4) % 4)
    pixels = (row + pad) * h
    header_size = 14 + 40
    file_size = header_size + len(pixels)
    return (
        b"BM" + struct.pack("<IHHI", file_size, 0, 0, header_size)
        + struct.pack("<iiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
        + pixels
    )


def _make_ppm(w=3, h=2, value=100):
    return f"P6\n# test\n{w} {h}\n255\n".encode() + bytes([value]) * (w * h * 3)


def test_real_decoders_wav_bmp_ppm(spark):
    import math

    from graphouse_spark.functions.multimodal import decode_assets

    rows = [
        (1, "audio", _make_wav()),
        (2, "image", _make_bmp()),
        (3, "image", _make_ppm()),
        (4, "video", b"\x00\x01\x02 not a known container"),
    ]
    df = spark.createDataFrame(rows, "asset_id long, modality string, payload binary")
    out = {r["asset_id"]: r for r in decode_assets(df).collect()}

    wav = out[1]
    assert wav["format"] == "wav"
    assert (wav["n_channels"], wav["sample_rate"], wav["duration_ms"]) == (1, 8000, 250)
    # sine RMS = amplitude / sqrt(2), within quantization tolerance
    assert abs(wav["rms"] - 20000 / math.sqrt(2)) < 150
    assert abs(wav["mean_value"]) < 50  # zero-mean signal

    bmp = out[2]
    assert (bmp["format"], bmp["width"], bmp["height"]) == ("bmp", 4, 2)
    assert bmp["mean_value"] == pytest.approx((10 + 20 + 30) / 3)

    ppm = out[3]
    assert (ppm["format"], ppm["width"], ppm["height"]) == ("ppm", 3, 2)
    assert ppm["mean_value"] == 100.0

    assert out[4]["format"] == "unknown"
