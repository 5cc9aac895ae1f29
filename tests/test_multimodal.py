"""Multimodal binary-column plumbing: schema, Arrow batching through
mapInPandas, deterministic fake decode, and the real-decode stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from vector_databases___hydrate_chroma_db_collection_spark.multimodal.binary import (
    ASSET_SCHEMA,
    extract_audio_features,
    extract_image_features,
    sample_video_frames,
)


@pytest.fixture()
def assets(spark):
    rows = []
    for i in range(30):
        content = (f"payload-{i}" * (i + 1)).encode()
        modality = ("image", "audio", "video")[i % 3]
        rows.append((f"a{i}", modality, bytearray(content), {"idx": str(i)}))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_image_features_deterministic(assets):
    out = extract_image_features(assets)
    rows = {r["asset_id"]: r for r in out.collect()}
    assert len(rows) == 10  # only image modality
    r = rows["a0"]
    data = b"payload-0"
    assert r["sha256"] == hashlib.sha256(data).hexdigest()
    h = hashlib.sha256(data).digest()
    assert r["width"] == 64 + h[0] % 512
    assert r["height"] == 64 + h[1] % 512
    # re-run produces identical values
    again = {x["asset_id"]: x for x in extract_image_features(assets).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_audio_features_schema(assets):
    out = extract_audio_features(assets)
    assert [f.name for f in out.schema.fields] == [
        "asset_id",
        "sample_rate",
        "duration_ms",
        "rms",
        "sha256",
    ]
    assert out.count() == 10
    assert out.filter(F.col("sample_rate").isin(8000, 16000, 22050, 44100)).count() == 10


def test_video_frame_sampling_bounded(assets):
    out = sample_video_frames(assets, max_frames=4)
    per_asset = out.groupBy("asset_id").count().collect()
    assert len(per_asset) == 10
    assert all(r["count"] <= 4 for r in per_asset)


def test_real_decode_raises_not_implemented(assets):
    with pytest.raises(Exception) as exc_info:
        extract_image_features(assets, decode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_column_pruning_keeps_bytes_out_of_metadata_plans(assets, tmp_path):
    # Metadata-only plans over an asset table must not read `content`:
    # write to parquet, filter on meta, check the scan's ReadSchema.
    path = str(tmp_path / "assets")
    assets.write.parquet(path)
    spark = assets.sparkSession
    df = spark.read.parquet(path).filter("modality = 'image'").select("asset_id", "meta")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan
