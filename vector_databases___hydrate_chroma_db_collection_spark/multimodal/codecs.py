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
