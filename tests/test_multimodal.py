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


def test_real_codec_paths_raise(spark, assets):
    with pytest.raises(NotImplementedError):
        extract_features(assets, real_codec=True)
    with pytest.raises(NotImplementedError):
        resize_images(assets, real_codec=True)


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
