"""Dependency-free real decoders for the multimodal feature kernels.

The container has no PIL/librosa/ffmpeg, but "real" feature
extraction does not need pixel decode for the image feature schema
(width/height/channels) — every mainstream raster format carries the
geometry in its header, and parsing that header IS what production
metadata sniffers do (Pillow's lazy ``open``, the ``imagesize``
package). WAV audio goes further: stdlib-parseable PCM, so sample
rate, duration, and true RMS come from the actual samples.

Formats:
- image: PNG (IHDR), GIF (logical screen), BMP (BITMAPINFOHEADER),
  netpbm P5/P6, JPEG (SOF0/1/2 scan over segment markers).
- audio: WAV/RIFF PCM (any sample width; RMS normalized to [-1, 1]).

Unknown/corrupt bytes return ``None`` — at 100 TB a decode stage must
degrade per-asset, never kill the job on one bad file; callers emit
null feature columns and the pipeline filters on them.
"""

from __future__ import annotations

import io
import struct
import wave

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_image(data: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from real format headers, or None."""
    try:
        if data.startswith(_PNG_MAGIC) and data[12:16] == b"IHDR":
            w, h = struct.unpack(">II", data[16:24])
            channels = _PNG_CHANNELS.get(data[25])
            return (w, h, channels) if channels else None
        if data[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", data[6:10])
            return (w, h, 3)
        if data[:2] == b"BM" and len(data) >= 30:
            w, h = struct.unpack("<ii", data[18:26])
            bpp = struct.unpack("<H", data[28:30])[0]
            return (w, abs(h), max(1, bpp // 8))
        if data[:2] in (b"P5", b"P6"):
            return _sniff_netpbm(data)
        if data[:2] == b"\xff\xd8":
            return _sniff_jpeg(data)
    except (struct.error, IndexError, ValueError):
        return None
    return None


def _sniff_netpbm(data: bytes) -> tuple[int, int, int] | None:
    """P5 (grayscale) / P6 (RGB): ASCII header 'P6 <w> <h> <maxval>'
    with #-comments allowed between tokens."""
    channels = 1 if data[:2] == b"P5" else 3
    tokens: list[int] = []
    i = 2
    while len(tokens) < 2 and i < len(data):
        c = data[i : i + 1]
        if c == b"#":  # comment to end of line
            i = data.find(b"\n", i)
            if i < 0:
                return None
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            tokens.append(int(data[i:j]))
            i = j
    if len(tokens) != 2:
        return None
    return (tokens[0], tokens[1], channels)


def _sniff_jpeg(data: bytes) -> tuple[int, int, int] | None:
    """Walk JFIF segment markers to the first SOF0/1/2 frame header:
    precision(1) height(2) width(2) components(1)."""
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers, no length
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if marker in (0xC0, 0xC1, 0xC2):
            if i + 9 >= n:
                return None
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            return (w, h, data[i + 9])
        i += 2 + seg_len
    return None


def decode_wav(data: bytes) -> tuple[int, int, float] | None:
    """(sample_rate, duration_ms, rms) from actual PCM samples, or
    None for non-WAV/compressed/corrupt content. RMS is computed over
    all channels, normalized by the sample width's full scale."""
    import numpy as np

    try:
        with wave.open(io.BytesIO(data)) as wf:
            sr = wf.getframerate()
            n_frames = wf.getnframes()
            width = wf.getsampwidth()
            raw = wf.readframes(n_frames)
    except (wave.Error, EOFError, struct.error):
        return None
    if sr <= 0 or width not in (1, 2, 3, 4):
        return None
    duration_ms = int(round(n_frames * 1000.0 / sr))
    if not raw:
        return (sr, duration_ms, 0.0)
    if width == 1:  # unsigned 8-bit, offset binary
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        full_scale = 128.0
    elif width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        full_scale = 32768.0
    elif width == 3:  # 24-bit little-endian: widen to int32 by byte view
        b = np.frombuffer(raw[: (len(raw) // 3) * 3], dtype=np.uint8).reshape(-1, 3)
        wide = np.zeros((b.shape[0], 4), dtype=np.uint8)
        wide[:, 1:] = b  # low byte padding -> value << 8 in int32
        samples = wide.view("<i4").astype(np.float64).ravel() / 256.0
        full_scale = 8388608.0
    else:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64)
        full_scale = 2147483648.0
    rms = float(np.sqrt(np.mean((samples / full_scale) ** 2)))
    return (sr, duration_ms, round(rms, 6))


def _sniff_mp4(data: bytes):
    """ISO BMFF (MP4/MOV/M4V) header walk: duration from
    ``moov/mvhd`` (duration/timescale), geometry from the first
    video-plausible ``trak/tkhd`` (16.16 fixed-point width/height).
    Box framing per ISO/IEC 14496-12 §4.2 (32-bit size, size==1 =>
    64-bit largesize, size==0 => to-end-of-file)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    brand = data[8:12].decode("latin-1").strip()

    def boxes(start: int, end: int):
        off = start
        while off + 8 <= end:
            (size,) = struct.unpack(">I", data[off : off + 4])
            btype = data[off + 4 : off + 8]
            hdr = 8
            if size == 1:
                if off + 16 > end:
                    return
                (size,) = struct.unpack(">Q", data[off + 8 : off + 16])
                hdr = 16
            elif size == 0:
                size = end - off
            if size < hdr or off + size > end:
                return
            yield btype, off + hdr, off + size
            off += size

    duration_ms = None
    width = height = None

    def walk(start: int, end: int) -> None:
        nonlocal duration_ms, width, height
        for btype, a, b in boxes(start, end):
            if btype in (b"moov", b"trak"):
                walk(a, b)
            elif btype == b"mvhd" and b - a >= 20:
                ver = data[a]
                try:
                    if ver == 1:
                        (timescale,) = struct.unpack(">I", data[a + 20 : a + 24])
                        (duration,) = struct.unpack(">Q", data[a + 24 : a + 32])
                    else:
                        (timescale,) = struct.unpack(">I", data[a + 12 : a + 16])
                        (duration,) = struct.unpack(">I", data[a + 16 : a + 20])
                except struct.error:
                    continue
                if timescale > 0:
                    duration_ms = int(duration * 1000 // timescale)
            elif btype == b"tkhd":
                # v0: 76 bytes of fields+matrix before width; v1: 88
                off_wh = a + (88 if data[a] == 1 else 76)
                if off_wh + 8 <= b:
                    w_fp, h_fp = struct.unpack(
                        ">II", data[off_wh : off_wh + 8]
                    )
                    w, h = w_fp >> 16, h_fp >> 16
                    if w > 0 and h > 0:  # audio/hint tracks carry 0x0
                        width, height = w, h

    walk(0, len(data))
    return (f"mp4/{brand}" if brand else "mp4", width, height, duration_ms, None)


def _sniff_avi(data: bytes):
    """AVI/RIFF: the ``avih`` MainAVIHeader chunk carries
    micro-seconds-per-frame, total frames, and geometry as
    little-endian u32s (OpenDML / msdn AVIMAINHEADER layout).

    The header is located by WALKING the RIFF chunk framing
    ([fourcc][u32 size][payload], word-aligned; LIST chunks carry a
    subtype then sub-chunks) rather than a raw byte search — at
    corpus scale the 4-byte pattern 'avih' routinely occurs inside
    compressed frame payload, and unpacking arbitrary movi bytes as
    the header would emit garbage geometry instead of NULLs."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None

    def find_avih(start: int, end: int, depth: int = 0):
        off = start
        while off + 8 <= end and depth < 8:
            fourcc = data[off : off + 4]
            (size,) = struct.unpack("<I", data[off + 4 : off + 8])
            body_start, body_end = off + 8, off + 8 + size
            if body_end > end:
                return None  # truncated chunk: stop, do not guess
            if fourcc == b"avih":
                return body_start if size >= 40 else None
            if fourcc == b"LIST" and size >= 4:
                got = find_avih(body_start + 4, body_end, depth + 1)
                if got is not None:
                    return got
            off = body_end + (size & 1)  # chunks are word-aligned
        return None

    i = find_avih(12, len(data))
    if i is None:
        return ("avi", None, None, None, None)
    f = struct.unpack("<10I", data[i : i + 40])
    usec_per_frame, total_frames, width, height = f[0], f[4], f[8], f[9]
    duration_ms = (
        int(usec_per_frame * total_frames // 1000)
        if usec_per_frame > 0 and total_frames > 0
        else None
    )
    return (
        "avi",
        width or None,
        height or None,
        duration_ms,
        total_frames or None,
    )


def sniff_video(data: bytes):
    """(container, width, height, duration_ms, n_frames) from the
    container header, or ``None`` for unrecognized bytes. Real
    parsing, no codec needed: MP4-family boxes and AVI/RIFF headers
    carry geometry and timing in plain structs; Matroska/WebM is
    recognized by EBML magic but its variable-length element tree is
    not walked (fields come back NULL — frame PIXEL decode would
    need ffmpeg either way and stays behind the decode='real' gate)."""
    if len(data) >= 4 and data[:4] == b"\x1a\x45\xdf\xa3":
        return ("mkv", None, None, None, None)
    got = _sniff_mp4(data)
    if got is not None:
        return got
    return _sniff_avi(data)


def build_mp4(
    *, width: int = 640, height: int = 360, timescale: int = 600, duration: int = 3000
) -> bytes:
    """Minimal VALID ISO BMFF fixture (ftyp + moov{mvhd v0,
    trak{tkhd v0}}) for tests and oracle-checked queries —
    ``sniff_video`` round-trips every field. Duration is
    ``duration/timescale`` seconds."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 16
        + b"\x00\x01\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00"
        + b"\x00\x00\x00\x00\x00\x01\x00\x00\x00\x00\x00\x00"
        + b"\x00\x00\x00\x00\x00\x00\x00\x00\x40\x00\x00\x00"
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


def build_avi(
    *,
    width: int = 320,
    height: int = 240,
    usec_per_frame: int = 40000,
    total_frames: int = 250,
) -> bytes:
    """Minimal VALID AVI/RIFF fixture (LIST hdrl > avih
    MainAVIHeader) — ``sniff_video`` round-trips every field."""
    avih_fields = struct.pack(
        "<10I", usec_per_frame, 0, 0, 0, total_frames, 0, 1, 0, width, height
    )
    avih = b"avih" + struct.pack("<I", len(avih_fields)) + avih_fields
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    body = b"AVI " + hdrl
    return b"RIFF" + struct.pack("<I", len(body)) + body
