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


def test_video_sample_decode_round_trip(spark):
    """MJPEG MP4 built byte-for-byte -> sample tables located -> each
    frame decoded by the pure-python JPEG codec. Flat-gray frames with
    DC quantum 8 round-trip the DCT EXACTLY, so every mean is exact;
    timestamps come from stts x mdhd timescale."""
    import numpy as np

    from graphouse_spark.functions.multimodal import (
        build_mjpeg_mp4,
        decode_payload,
        decode_video_frames,
    )

    mp4 = build_mjpeg_mp4(
        [np.full((16, 24), c, dtype=np.uint8) for c in (8, 64, 200)], fps=5)
    meta = decode_payload(mp4)
    assert meta["format"] == "mp4" and meta["duration_ms"] == 600
    assert (meta["width"], meta["height"]) == (24, 16)
    assert meta["codec"] == "jpeg" and meta["n_samples"] == 3

    assets = spark.createDataFrame(
        [(1, "video", mp4), (2, "image", b"\x89PNG")],
        "asset_id long, modality string, payload binary")
    rows = sorted(decode_video_frames(assets).collect(),
                  key=lambda r: r["sample_idx"])
    # image row filtered JVM-side; 3 frame rows for the video
    assert [r["asset_id"] for r in rows] == [1, 1, 1]
    assert [r["sample_ts_ms"] for r in rows] == [0, 200, 400]
    assert [r["mean_value"] for r in rows] == [8.0, 64.0, 200.0]
    assert all(r["codec"] == "jpeg" and r["width"] == 24 and r["height"] == 16
               for r in rows)


def test_video_every_ms_strides_samples(spark):
    import numpy as np

    from graphouse_spark.functions.multimodal import (
        build_mjpeg_mp4,
        decode_video_frames,
    )

    # 10 frames at 5 fps = one per 200 ms; every_ms=400 keeps every 2nd
    mp4 = build_mjpeg_mp4(
        [np.full((8, 8), k * 10, dtype=np.uint8) for k in range(10)], fps=5)
    assets = spark.createDataFrame([(7, "video", mp4)],
                                   "asset_id long, modality string, payload binary")
    rows = sorted(decode_video_frames(assets, every_ms=400).collect(),
                  key=lambda r: r["sample_idx"])
    assert [r["sample_idx"] for r in rows] == [0, 2, 4, 6, 8]
    assert [r["mean_value"] for r in rows] == [0.0, 20.0, 40.0, 60.0, 80.0]


def test_video_non_jpeg_codec_raises():
    """A codec the repo cannot decode must raise, never fake pixels."""
    import numpy as np
    import pytest

    from graphouse_spark.functions.multimodal import (
        build_mjpeg_mp4,
        video_frame_stats,
    )

    mp4 = bytearray(build_mjpeg_mp4(
        [np.full((8, 8), 50, dtype=np.uint8)], fps=5))
    # splice the stsd sample-entry fourcc to avc1 and break the JPEG
    # SOI sniff so neither path claims the sample
    i = bytes(mp4).index(b"stsd")
    assert bytes(mp4[i + 16:i + 20]) == b"jpeg"
    mp4[i + 16:i + 20] = b"avc1"
    soi = bytes(mp4).index(b"\xff\xd8\xff")
    mp4[soi:soi + 3] = b"\x00\x00\x00"
    with pytest.raises(NotImplementedError, match="avc1"):
        video_frame_stats(bytes(mp4))


def test_video_stats_kernel_multi_chunk():
    """Sample location must follow stsc/stco even when samples spread
    over several chunks (one chunk per sample here)."""
    import struct

    import numpy as np

    from graphouse_spark.functions.multimodal import (
        _mp4_samples,
        _parse_mp4,
        build_mjpeg_mp4,
    )

    mp4 = build_mjpeg_mp4(
        [np.full((8, 8), c, dtype=np.uint8) for c in (10, 20)], fps=2)
    trak = _parse_mp4(mp4)["tracks"][0]
    samples = _mp4_samples(trak)
    assert len(samples) == 2
    # rebuild the tables as two single-sample chunks; same byte ranges
    trak2 = dict(trak)
    trak2["stsc"] = [(1, 1, 1)]
    trak2["chunk_offsets"] = [s[0] for s in samples]
    assert _mp4_samples(trak2) == samples
    assert struct.unpack_from(">I", mp4, samples[0][0])[0] or True
