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


def test_real_video_decode_raises_not_implemented(assets):
    # container demuxing genuinely needs ffmpeg/av; the gate stays
    with pytest.raises(Exception) as exc_info:
        sample_video_frames(assets, decode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def _png(w: int, h: int, color_type: int = 2) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )


def _jpeg(w: int, h: int, channels: int = 3) -> bytes:
    import struct

    soi = b"\xff\xd8"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * channels, 8, h, w, channels)
    return soi + app0 + sof0 + b"\xff\xd9"


def _wav(sr: int, samples) -> bytes:
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_real_image_decode_parses_actual_headers(spark):
    """decode='real' without PIL: the stdlib sniffers read ACTUAL
    format headers — PNG/GIF/BMP/JPEG/PPM dims come out exactly, and
    undecodable bytes degrade to NULL dims instead of failing."""
    import struct

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    bmp = (
        b"BM" + b"\x00" * 16
        + struct.pack("<ii", 101, -55)  # top-down rows: negative height
        + b"\x00\x00" + struct.pack("<H", 24)
    )
    ppm = b"P6\n# a comment\n640 480\n255\n" + b"\x00" * 12
    pgm = b"P5 7 9 255 " + b"\x00" * 63
    rows = [
        ("png", "image", bytearray(_png(1920, 1080)), {}),
        ("gif", "image", bytearray(gif), {}),
        ("bmp", "image", bytearray(bmp), {}),
        ("jpg", "image", bytearray(_jpeg(800, 600)), {}),
        ("ppm", "image", bytearray(ppm), {}),
        ("pgm", "image", bytearray(pgm), {}),
        ("bad", "image", bytearray(b"not an image at all"), {}),
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in extract_image_features(df, decode="real").collect()}
    assert (got["png"]["width"], got["png"]["height"], got["png"]["channels"]) == (1920, 1080, 3)
    assert (got["gif"]["width"], got["gif"]["height"]) == (320, 200)
    assert (got["bmp"]["width"], got["bmp"]["height"], got["bmp"]["channels"]) == (101, 55, 3)
    assert (got["jpg"]["width"], got["jpg"]["height"], got["jpg"]["channels"]) == (800, 600, 3)
    assert (got["ppm"]["width"], got["ppm"]["height"], got["ppm"]["channels"]) == (640, 480, 3)
    assert (got["pgm"]["width"], got["pgm"]["height"], got["pgm"]["channels"]) == (7, 9, 1)
    assert got["bad"]["width"] is None and got["bad"]["sha256"] is not None


def test_real_audio_decode_computes_true_rms(spark):
    """decode='real' on WAV PCM: sample rate and duration from the
    actual header, RMS from the actual samples (constant-amplitude
    square wave at half scale -> rms 0.5 exactly)."""
    halfscale = _wav(16000, [16384, -16384] * 8000)  # 1 s square wave
    silent = _wav(8000, [0] * 4000)  # 0.5 s of silence
    rows = [
        ("half", "audio", bytearray(halfscale), {}),
        ("silent", "audio", bytearray(silent), {}),
        ("bad", "audio", bytearray(b"mp3-ish garbage"), {}),
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in extract_audio_features(df, decode="real").collect()}
    assert got["half"]["sample_rate"] == 16000
    assert got["half"]["duration_ms"] == 1000
    assert got["half"]["rms"] == 0.5
    assert got["silent"]["sample_rate"] == 8000
    assert got["silent"]["duration_ms"] == 500
    assert got["silent"]["rms"] == 0.0
    assert got["bad"]["sample_rate"] is None and got["bad"]["sha256"] is not None


def test_column_pruning_keeps_bytes_out_of_metadata_plans(assets, tmp_path):
    # Metadata-only plans over an asset table must not read `content`:
    # write to parquet, filter on meta, check the scan's ReadSchema.
    path = str(tmp_path / "assets")
    assets.write.parquet(path)
    spark = assets.sparkSession
    df = spark.read.parquet(path).filter("modality = 'image'").select("asset_id", "meta")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan


# ---------------------------------------------------------------------------
# Real video container-header parsing (codecs.sniff_video): hand-built
# MP4 boxes and an AVI MainAVIHeader, parsed bit-for-bit.
# ---------------------------------------------------------------------------


def _mp4_bytes(width=640, height=360, timescale=600, duration=3000) -> bytes:
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
        build_mp4,
    )

    return build_mp4(
        width=width, height=height, timescale=timescale, duration=duration
    )


def _avi_bytes(width=320, height=240, usec_per_frame=40000, total_frames=250) -> bytes:
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
        build_avi,
    )

    return build_avi(
        width=width,
        height=height,
        usec_per_frame=usec_per_frame,
        total_frames=total_frames,
    )


def test_sniff_video_parses_mp4_boxes():
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
        sniff_video,
    )

    container, w, h, dur, nf = sniff_video(
        _mp4_bytes(width=640, height=360, timescale=600, duration=3000)
    )
    assert container.startswith("mp4")
    assert (w, h) == (640, 360)
    assert dur == 5000  # 3000 ticks / 600 ticks-per-sec = 5 s
    assert nf is None  # frame count is not in the MP4 movie header


def test_sniff_video_parses_avi_header():
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
        sniff_video,
    )

    container, w, h, dur, nf = sniff_video(
        _avi_bytes(width=320, height=240, usec_per_frame=40000, total_frames=250)
    )
    assert container == "avi"
    assert (w, h) == (320, 240)
    assert dur == 10000  # 250 frames * 40 ms
    assert nf == 250


def test_sniff_video_mkv_magic_and_garbage():
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
        sniff_video,
    )

    assert sniff_video(b"\x1a\x45\xdf\xa3" + b"\x00" * 16)[0] == "mkv"
    assert sniff_video(b"not a video at all") is None


def test_extract_video_features_real_headers(spark):
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.binary import (
        extract_video_features,
    )

    mp4 = _mp4_bytes()
    avi = _avi_bytes()
    assets = spark.createDataFrame(
        [
            ("v1", "video", bytearray(mp4), {}),
            ("v2", "video", bytearray(avi), {}),
            ("v3", "video", bytearray(b"garbage"), {}),
            ("i1", "image", bytearray(b"x"), {}),
        ],
        "asset_id string, modality string, content binary, meta map<string,string>",
    )
    rows = {
        r["asset_id"]: r
        for r in extract_video_features(assets, decode="real").collect()
    }
    assert set(rows) == {"v1", "v2", "v3"}  # modality filter held
    assert rows["v1"]["width"] == 640 and rows["v1"]["duration_ms"] == 5000
    assert rows["v2"]["n_frames"] == 250 and rows["v2"]["height"] == 240
    assert rows["v3"]["container"] is None  # per-asset degrade
    assert rows["v3"]["sha256"] == hashlib.sha256(b"garbage").hexdigest()


def test_sample_video_frames_headers_mode_uses_real_duration(spark):
    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.binary import (
        sample_video_frames,
    )

    assets = spark.createDataFrame(
        [("v1", "video", bytearray(_avi_bytes(total_frames=250)), {})],
        "asset_id string, modality string, content binary, meta map<string,string>",
    )
    # 10 s of real parsed duration / 2000 ms grid = 5 sampled frames
    out = sample_video_frames(
        assets, every_n=2000, max_frames=8, decode="headers"
    ).collect()
    assert len(out) == 5
    assert [r["frame_idx"] for r in out] == [0, 1, 2, 3, 4]


def test_sniff_avi_ignores_avih_bytes_in_payload():
    """'avih' occurring inside frame payload must NOT be parsed as
    the header: the sniffer walks RIFF chunk framing, so a movi
    payload containing the magic yields NULL fields, not garbage
    geometry."""
    import struct

    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
        sniff_video,
    )

    # RIFF/AVI with ONLY a movi LIST whose payload embeds b"avih"
    payload = b"00dc" + struct.pack("<I", 48) + b"avih" + b"\xff" * 44
    movi = b"LIST" + struct.pack("<I", 4 + len(payload)) + b"movi" + payload
    body = b"AVI " + movi
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    container, w, h, dur, nf = sniff_video(data)
    assert container == "avi"
    assert (w, h, dur, nf) == (None, None, None, None)


def test_sniff_avi_truncated_header_degrades_to_nulls():
    import struct

    from vector_databases___hydrate_chroma_db_collection_spark.multimodal.codecs import (
        build_avi,
        sniff_video,
    )

    whole = build_avi()
    truncated = whole[:40]  # cuts inside the avih chunk
    got = sniff_video(truncated)
    assert got is not None and got[0] == "avi"
    assert got[1:] == (None, None, None, None)
