"""Multimodal columns: image/audio/video as opaque binary + metadata.

Design (SURVEY.md §2.B / driver north star): an asset is a row
``(asset_id STRING, modality STRING, content BINARY,
meta MAP<STRING,STRING>)``. Content-addressed processing runs through
``mapInPandas`` so each Arrow batch of binaries is handled by one
Python call (never per-row UDFs), and the output schema is fixed so
Catalyst can plan around the opaque step.

Decode modes:

- ``decode=deterministic_fake``: a seeded, content-derived fake
  (dimensions/duration from a hash of the bytes) — lets every test
  assert real plumbing (schema, batching, partition behavior) with
  stable values.
- ``decode=real`` (image): PIL when importable; otherwise the
  dependency-free header parsers in ``codecs.py`` (PNG/GIF/BMP/
  JPEG/netpbm — real format parsing, which is all the feature schema
  needs). Undecodable bytes yield NULL feature columns, never a
  failed job.
- ``decode=real`` (audio): WAV/RIFF PCM fully decoded via stdlib
  ``wave`` + numpy — sample rate, duration, and true RMS from the
  actual samples. Compressed codecs (mp3/ogg) need librosa/soundfile
  and yield NULLs when those are absent.
- ``decode=real`` (video features): container-HEADER parsing via
  ``codecs.sniff_video`` — MP4-family box walk (mvhd duration, tkhd
  geometry) and AVI MainAVIHeader (frames, geometry, duration), no
  codec needed; Matroska/WebM recognized by magic only. Frame PIXEL
  decode (``sample_video_frames(decode='real')``) stays gated —
  demuxing/decoding needs ffmpeg/av; raises NotImplementedError.
  ``decode='headers'`` samples frame TIMESTAMPS from the real parsed
  duration instead (fingerprints stay content-hashes).

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

VIDEO_FEATURE_SCHEMA = (
    "asset_id string, container string, width int, height int, "
    "duration_ms long, n_frames int, sha256 string"
)


def _fake_dims(content: bytes) -> tuple[int, int, int]:
    h = hashlib.sha256(content).digest()
    return 64 + h[0] % 512, 64 + h[1] % 512, 1 + h[2] % 3


def extract_image_features(assets: DataFrame, *, decode: str = "deterministic_fake") -> DataFrame:
    """(asset_id, width, height, channels, sha256) per image asset.

    Arrow-batched: one Python invocation per ~10k rows, bytes stay
    off the JVM heap. ``decode='real'`` prefers PIL (pixel-accurate,
    any format) and falls back to the stdlib header parsers in
    ``codecs.sniff_image``; bytes neither path can read produce NULL
    dims (sha256 still populated) so one corrupt asset never kills a
    100 TB decode stage.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode == "real":
            try:
                from PIL import Image  # optional, pixel-accurate path

                def dims(data: bytes):
                    import io

                    try:
                        with Image.open(io.BytesIO(data)) as im:
                            return im.width, im.height, len(im.getbands())
                    except Exception:  # noqa: BLE001 - per-asset degrade
                        return None
            except ImportError:
                from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
                    sniff_image as dims,
                )
        else:
            def dims(data: bytes):
                return _fake_dims(data)

        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                if content is None:
                    # per-asset degrade: a NULL payload yields NULL
                    # features, never a task-killing TypeError
                    rows.append((aid, None, None, None, None))
                    continue
                data = bytes(content)
                d = dims(data)
                w, h, c = d if d is not None else (None, None, None)
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
    """(asset_id, sample_rate, duration_ms, rms, sha256) per audio
    asset. ``decode='real'`` fully decodes WAV/RIFF PCM via stdlib
    ``wave`` (true RMS over the samples); compressed codecs yield
    NULL features unless librosa/soundfile are importable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode == "real":
            from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
                decode_wav,
            )

            def features(data: bytes):
                return decode_wav(data)
        else:
            def features(data: bytes):
                h = hashlib.sha256(data).digest()
                sr = (8000, 16000, 22050, 44100)[h[0] % 4]
                duration_ms = 100 + int.from_bytes(h[1:4], "big") % 60000
                rms = round(h[4] / 255.0, 6)
                return sr, duration_ms, rms

        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                if content is None:
                    rows.append((aid, None, None, None, None))
                    continue
                data = bytes(content)
                f = features(data)
                sr, duration_ms, rms = f if f is not None else (None, None, None)
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


def extract_video_features(
    assets: DataFrame, *, decode: str = "deterministic_fake"
) -> DataFrame:
    """(asset_id, container, width, height, duration_ms, n_frames,
    sha256) per video asset. ``decode='real'`` parses the CONTAINER
    HEADER (``codecs.sniff_video``: MP4-family boxes, AVI
    MainAVIHeader, Matroska magic) — the same
    no-external-dependency contract as the image sniffers; bytes no
    parser recognizes yield NULL features (sha256 still populated).
    Pixel/codec decode is not needed for this schema and stays
    behind ``sample_video_frames(decode='real')``'s gate."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode == "real":
            from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
                sniff_video as features,
            )
        else:
            def features(data: bytes):
                h = hashlib.sha256(data).digest()
                return (
                    ("mp4", "avi", "mkv")[h[0] % 3],
                    160 + h[1] % 4096,
                    120 + h[2] % 2160,
                    1000 + int.from_bytes(h[3:6], "big") % 3_600_000,
                    1 + h[6],
                )

        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                if content is None:
                    rows.append((aid, None, None, None, None, None, None))
                    continue
                data = bytes(content)
                f = features(data)
                container, w, h, dur, nf = (
                    f if f is not None else (None, None, None, None, None)
                )
                rows.append(
                    (aid, container, w, h, dur, nf, hashlib.sha256(data).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "container",
                    "width",
                    "height",
                    "duration_ms",
                    "n_frames",
                    "sha256",
                ],
            )

    return (
        assets.filter("modality = 'video'")
        .select("asset_id", "content")
        .mapInPandas(run, schema=VIDEO_FEATURE_SCHEMA)
    )


def sample_video_frames(
    assets: DataFrame, *, every_n: int = 10, max_frames: int = 8, decode: str = "deterministic_fake"
) -> DataFrame:
    """Explode each video asset into sampled frame fingerprints.
    Output cardinality is bounded (max_frames per asset) so the
    downstream shuffle is predictable.

    Modes: ``deterministic_fake`` fingerprints hash-derived pseudo
    frames; ``headers`` samples frame indices UNIFORMLY OVER THE REAL
    PARSED DURATION (``codecs.sniff_video``) — the sampling grid a
    production frame-sampler would use — while fingerprints remain
    content hashes (no pixel decode exists without ffmpeg);
    ``real`` (actual pixel decode) raises NotImplementedError naming
    the dependency."""

    # fail FAST at the driver: the unsupported configuration needs no
    # data, so it must not surface as a retried executor PythonException
    if decode == "real":
        raise NotImplementedError(
            "real video frame decode requires ffmpeg/av, which are not "
            "installed; use decode='headers' (real container timing, "
            "hash fingerprints) or decode='deterministic_fake'"
        )
    if decode not in ("deterministic_fake", "headers"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode == "headers":
            from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
                sniff_video,
            )

        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                if content is None:
                    continue  # a NULL payload yields no sampled frames
                data = bytes(content)
                if decode == "headers":
                    meta = sniff_video(data)
                    dur = meta[3] if meta is not None else None
                    nf = meta[4] if meta is not None else None
                    # frames every `every_n` ms of REAL duration,
                    # capped; unparseable timing degrades to 1 frame
                    n_frames = (
                        min(max_frames, max(1, int(dur // max(every_n, 1))))
                        if dur
                        else min(max_frames, nf or 1)
                    )
                else:
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
