"""Multimodal columns: image/audio/video as opaque binary + metadata.

Design (SURVEY.md §2.B / driver north star): an asset is a row
``(asset_id STRING, modality STRING, content BINARY,
meta MAP<STRING,STRING>)``. Content-addressed processing runs through
``mapInPandas`` so each Arrow batch of binaries is handled by one
Python call (never per-row UDFs), and the output schema is fixed so
Catalyst can plan around the opaque step.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
the decode kernels are stubbed two ways:

- ``decode=deterministic_fake``: a seeded, content-derived fake
  (dimensions/duration from a hash of the bytes) — lets every test
  assert real plumbing (schema, batching, partition behavior) with
  stable values.
- ``decode=real``: raises NotImplementedError at the first batch with
  a clear message naming the missing dependency.

At 100 TB the binary column dominates I/O: keep assets in their own
table, filter/join on metadata first, and only pipe the surviving
rows' bytes through the decode stage (Parquet column pruning makes
the bytes-not-needed case free).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ASSET_SCHEMA = (
    "asset_id string, modality string, content binary, meta map<string,string>"
)

IMAGE_FEATURE_SCHEMA = (
    "asset_id string, width int, height int, channels int, sha256 string"
)

AUDIO_FEATURE_SCHEMA = (
    "asset_id string, sample_rate int, duration_ms long, rms double, sha256 string"
)

FRAME_SAMPLE_SCHEMA = "asset_id string, frame_idx int, frame_sha256 string"


def _fake_dims(content: bytes) -> tuple[int, int, int]:
    h = hashlib.sha256(content).digest()
    return 64 + h[0] % 512, 64 + h[1] % 512, 1 + h[2] % 3


def extract_image_features(assets: DataFrame, *, decode: str = "deterministic_fake") -> DataFrame:
    """(asset_id, width, height, channels, sha256) per image asset.

    Arrow-batched: one Python invocation per ~10k rows, bytes stay
    off the JVM heap. Real decode would swap ``_fake_dims`` for
    PIL.Image.open over io.BytesIO.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode == "real":
            raise NotImplementedError(
                "real image decode requires PIL, which is not installed; "
                "use decode='deterministic_fake'"
            )
        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                data = bytes(content)
                w, h, c = _fake_dims(data)
                rows.append(
                    (aid, w, h, c, hashlib.sha256(data).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "channels", "sha256"]
            )

    return (
        assets.filter("modality = 'image'")
        .select("asset_id", "content")
        .mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)
    )


def extract_audio_features(assets: DataFrame, *, decode: str = "deterministic_fake") -> DataFrame:
    """(asset_id, sample_rate, duration_ms, rms, sha256) per audio asset."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode == "real":
            raise NotImplementedError(
                "real audio decode requires librosa/soundfile, which are not "
                "installed; use decode='deterministic_fake'"
            )
        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                data = bytes(content)
                h = hashlib.sha256(data).digest()
                sr = (8000, 16000, 22050, 44100)[h[0] % 4]
                duration_ms = 100 + int.from_bytes(h[1:4], "big") % 60000
                rms = round(h[4] / 255.0, 6)
                rows.append((aid, sr, duration_ms, rms, hashlib.sha256(data).hexdigest()))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "sample_rate", "duration_ms", "rms", "sha256"],
            )

    return (
        assets.filter("modality = 'audio'")
        .select("asset_id", "content")
        .mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
    )


def sample_video_frames(
    assets: DataFrame, *, every_n: int = 10, max_frames: int = 8, decode: str = "deterministic_fake"
) -> DataFrame:
    """Explode each video asset into sampled frame fingerprints.
    Output cardinality is bounded (max_frames per asset) so the
    downstream shuffle is predictable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode == "real":
            raise NotImplementedError(
                "real video decode requires ffmpeg/av, which are not installed; "
                "use decode='deterministic_fake'"
            )
        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                data = bytes(content)
                n_frames = min(max_frames, 1 + len(data) // max(every_n, 1))
                for i in range(n_frames):
                    fp = hashlib.sha256(data + i.to_bytes(4, "big")).hexdigest()
                    rows.append((aid, i, fp))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_sha256"])

    return (
        assets.filter("modality = 'video'")
        .select("asset_id", "content")
        .mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
    )
