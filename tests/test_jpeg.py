"""Pure-python baseline JPEG codec: round-trip + structural proofs.

Same oracle posture as the BMP/PPM byte-built fixtures: images are
constructed pixel by pixel, encoded by the module's own encoder, and
must decode back within the quantization bound (exactly, for flat
DC-only images with the default DC quantum of 8)."""

import numpy as np
import pytest

from graphouse_spark.functions.jpeg import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)


def test_flat_gray_roundtrip_exact_all_values():
    """DC-only blocks with quantum 8: every gray level and every
    non-multiple-of-8 geometry round-trips EXACTLY."""
    for v in (0, 1, 17, 127, 128, 200, 254, 255):
        for (h, w) in [(1, 1), (5, 7), (8, 8), (9, 17)]:
            img = np.full((h, w), v, dtype=np.uint8)
            d = decode_baseline_jpeg(encode_baseline_jpeg(img))
            assert (d["width"], d["height"], d["n_channels"]) == (w, h, 1)
            assert (d["pixels"] == img).all(), (v, h, w)


def test_gradient_gray_within_quant_bound():
    x = np.linspace(0, 255, 40 * 56).reshape(40, 56).astype(np.uint8)
    d = decode_baseline_jpeg(encode_baseline_jpeg(x))
    err = np.abs(d["pixels"].astype(float) - x.astype(float))
    assert err.max() <= 4 and err.mean() < 1.0


def test_random_blocks_roundtrip_bound():
    """Hard case: iid random pixels maximize AC energy; the error stays
    bounded by the flat-8 quant table (each coefficient off by <= 4)."""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    d = decode_baseline_jpeg(encode_baseline_jpeg(img))
    err = np.abs(d["pixels"].astype(float) - img.astype(float))
    # worst-case IDCT accumulation of 64 coefficient errors of 4
    assert err.max() <= 32 and err.mean() < 4


def test_rgb_444_and_420_roundtrip():
    rng = np.random.default_rng(7)
    coarse = rng.integers(40, 216, (3, 4, 3)).astype(np.float64)
    img = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1) \
        .astype(np.uint8)[:20, :30]
    d = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert d["n_channels"] == 3 and d["pixels"].shape == (20, 30, 3)
    err = np.abs(d["pixels"].astype(float) - img.astype(float))
    assert err.max() <= 4
    d = decode_baseline_jpeg(encode_baseline_jpeg(img, subsample=True))
    assert d["pixels"].shape == (20, 30, 3)
    err = np.abs(d["pixels"].astype(float) - img.astype(float))
    assert err.max() <= 16  # chroma box-filter loss on block edges


def test_custom_quant_table_parsed():
    """A coarser table degrades precision — proof the decoder reads DQT
    rather than assuming the encoder's default."""
    img = np.full((8, 8), 77, dtype=np.uint8)
    q = np.full(64, 8, dtype=np.int32)
    q[0] = 16  # DC quantum 16: 8*(77-128) = -408 -> -26*16 = -416 -> 76
    d = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=q))
    assert abs(int(d["pixels"][0, 0]) - 77) == 1


def test_rejects_non_baseline():
    img = np.full((8, 8), 10, dtype=np.uint8)
    data = bytearray(encode_baseline_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_baseline_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"not a jpeg")


def test_decode_assets_includes_jpeg(spark):
    """The multimodal mapInPandas path sniffs and decodes JPEG next to
    BMP/PPM/WAV — format, dims and mean flow into the typed schema."""
    from graphouse_spark.functions.multimodal import decode_assets

    payload = encode_baseline_jpeg(np.full((3, 5), 99, dtype=np.uint8))
    assets = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "asset_id long, modality string, payload binary")
    row = decode_assets(assets).collect()[0]
    assert row["format"] == "jpeg"
    assert (row["width"], row["height"], row["n_channels"]) == (5, 3, 1)
    assert row["mean_value"] == 99.0


def test_restart_markers_roundtrip():
    """DRI + RSTn path: encoder emits restart markers every 2 MCUs
    (DC predictors reset, byte alignment); decoder must resync and
    reproduce the image within the same quant bound as without."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    plain = decode_baseline_jpeg(encode_baseline_jpeg(img))["pixels"]
    with_rst = decode_baseline_jpeg(
        encode_baseline_jpeg(img, restart_interval=2))["pixels"]
    assert (plain == with_rst).all()
    err = np.abs(with_rst.astype(float) - img.astype(float))
    assert err.max() <= 32
    # color + subsampling + restarts together
    imgc = rng.integers(0, 256, (17, 22, 3)).astype(np.uint8)
    a = decode_baseline_jpeg(encode_baseline_jpeg(imgc, subsample=True))
    b = decode_baseline_jpeg(
        encode_baseline_jpeg(imgc, subsample=True, restart_interval=1))
    assert (a["pixels"] == b["pixels"]).all()


def test_rgb_422_roundtrip():
    """4:2:2 (horizontal-only chroma subsampling) exercises the
    asymmetric upsample path (rx=2, ry=1)."""
    rng = np.random.default_rng(9)
    coarse = rng.integers(40, 216, (3, 4, 3)).astype(np.float64)
    img = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1) \
        .astype(np.uint8)[:19, :27]
    d = decode_baseline_jpeg(encode_baseline_jpeg(img, subsample="422"))
    assert d["pixels"].shape == (19, 27, 3)
    err = np.abs(d["pixels"].astype(float) - img.astype(float))
    assert err.max() <= 16
