"""Real media codecs for the multimodal operators — dependency-free core.

Design: the decode operators (multimodal.py) call these per Arrow batch
inside ``mapInPandas``. Preference order per payload:

1. **PIL / soundfile** when importable (fast C paths, all formats) —
   optional, absent in this container.
2. **Pure-stdlib fallbacks** (always available): PNG via ``zlib`` +
   ``struct`` + numpy unfiltering; baseline-sequential JPEG via
   ``operators/jpeg.py`` (round 6 — Huffman/DCT in numpy, 4:4:4/4:2:2/
   4:2:0, restart markers; progressive still needs PIL); WAV (PCM
   8/16/24/32-bit) via the ``wave`` stdlib module. These make
   ``fake=False`` a REAL path in any environment — no more plan-time
   NotImplementedError.
3. Payloads neither path can decode yield ``decode_ok=False`` rows — the
   DLQ-style per-row contract a pipeline wants, instead of failing the job.

Scale note: the stdlib PNG unfilter pays a Python loop per scanline for
filter types 1/3/4 (Sub/Avg/Paeth are sequential in x by definition);
throughput-critical clusters should ship Pillow, which the operators pick
up automatically. Decode work is embarrassingly parallel (narrow
projection, zero shuffle) either way.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> samples per pixel


def try_pil():
    """Return PIL.Image if Pillow is importable, else None."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except Exception:
        return None


def try_soundfile():
    try:
        import soundfile  # type: ignore

        return soundfile
    except Exception:
        return None


# ---------------------------------------------------------------------------
# PNG (pure stdlib): 8-bit depth, color types 0/2/4/6, non-interlaced
# ---------------------------------------------------------------------------


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG to a (height, width, channels) uint8 array.

    Supports bit depth 8, color types gray / RGB / gray+alpha / RGBA,
    non-interlaced (the overwhelming majority of real-world PNGs; Pillow
    handles the rest when present). Raises ValueError on anything else.
    """
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} interlace={interlace})"
        )
    ch = _CHANNELS[color]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    p = 0
    for y in range(h):
        f = int(raw[p])
        line = raw[p + 1 : p + 1 + stride].astype(np.int32)
        p += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up — vectorized
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub/Average/Paeth — sequential in x per spec
            cur = np.empty(stride, np.int32)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if (x >= ch and y) else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    q = a + b - c
                    pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _filter_line(f: int, line: np.ndarray, prev: np.ndarray, ch: int) -> np.ndarray:
    """Forward PNG filter (encode side), sequential per spec for 1/3/4."""
    line = line.astype(np.int32)
    prev = prev.astype(np.int32)
    if f == 0:
        return line.astype(np.uint8)
    if f == 2:
        return ((line - prev) & 0xFF).astype(np.uint8)
    out = np.empty(len(line), np.int32)
    for x in range(len(line)):
        a = int(line[x - ch]) if x >= ch else 0
        b = int(prev[x])
        c = int(prev[x - ch]) if x >= ch else 0
        if f == 1:
            pred = a
        elif f == 3:
            pred = (a + b) >> 1
        else:
            q = a + b - c
            pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (int(line[x]) - pred) & 0xFF
    return out.astype(np.uint8)


def png_encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a (h, w) or (h, w, channels) uint8 array as an 8-bit PNG.

    ``filter_type`` applies one filter to every scanline (0 is the fast
    path; 1-4 exist so tests can round-trip every decoder branch against
    an independent forward transform).
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}[ch]
    flat = a.reshape(h, w * ch)
    lines = []
    zero = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        prev = flat[y - 1] if y else zero
        lines.append(bytes([filter_type]) + _filter_line(filter_type, flat[y], prev, ch).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV (stdlib `wave`): PCM 8/16/24/32-bit, any channel count
# ---------------------------------------------------------------------------


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV to (sample_rate, float64 array of shape
    (n_frames, n_channels)) normalized to [-1, 1)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        rate = f.getframerate()
        nch = f.getnchannels()
        width = f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if width == 1:  # unsigned 8-bit
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 3:  # 24-bit: pad each triple to 4 bytes, sign via shift
        raw = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        padded = np.zeros((len(raw), 4), dtype=np.uint8)
        padded[:, 1:] = raw
        x = (np.ascontiguousarray(padded).view("<i4")[:, 0] >> 8).astype(np.float64) / 8388608.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return rate, x.reshape(-1, nch)


def wav_decode_int(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV to (sample_rate, int64 array of shape
    (n_frames, n_channels)) of the RAW integer samples — no float
    normalization, so downstream integer fingerprints stay exact at
    EVERY sample width (8-bit is recentered to signed, matching
    ``wav_decode``'s -128 offset)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        rate = f.getframerate()
        nch = f.getnchannels()
        width = f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if width == 1:  # unsigned 8-bit
        v = np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
    elif width == 2:
        v = np.frombuffer(frames, dtype="<i2").astype(np.int64)
    elif width == 3:  # 24-bit: pad each triple to 4 bytes, sign via shift
        raw = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        padded = np.zeros((len(raw), 4), dtype=np.uint8)
        padded[:, 1:] = raw
        v = (np.ascontiguousarray(padded).view("<i4")[:, 0] >> 8).astype(np.int64)
    elif width == 4:
        v = np.frombuffer(frames, dtype="<i4").astype(np.int64)
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return rate, v.reshape(-1, nch)


def wav_encode(rate: int, samples: np.ndarray) -> bytes:
    """Encode (n_frames,) or (n_frames, n_channels) int16 samples as WAV."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(a.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(a.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# dispatch helpers used by the mapInPandas operators
# ---------------------------------------------------------------------------


def decode_image_bytes(b: bytes):
    """(h, w, channels) uint8 pixels, or None if nothing can decode it.

    PIL first when present (fast C paths, every format); stdlib PNG and
    baseline-JPEG decoders otherwise (round 6: ``operators/jpeg.py`` —
    SOF0 Huffman streams, i.e. the vast majority of real-world JPEGs;
    progressive JPEGs still need PIL).
    """
    pil = try_pil()
    if pil is not None:
        try:
            img = pil.open(io.BytesIO(b))
            return np.asarray(img.convert("RGB") if img.mode == "P" else img)
        except Exception:
            return None
    if b[:8] == PNG_SIG:
        try:
            return png_decode(b)
        except Exception:
            return None
    if b[:2] == b"\xff\xd8":
        from etl_file_loader_spark.operators import jpeg as _jpeg

        try:
            return _jpeg.jpeg_decode(b)
        except Exception:
            return None
    return None


def decode_audio_bytes(b: bytes):
    """(rate, (frames, channels) float64 in [-1,1)) or None."""
    if b[:4] == b"RIFF":
        try:
            return wav_decode(b)
        except Exception:
            pass
    sf = try_soundfile()
    if sf is not None:
        try:
            x, rate = sf.read(io.BytesIO(b), dtype="float64", always_2d=True)
            return rate, x
        except Exception:
            return None
    return None
