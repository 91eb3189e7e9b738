"""Pure-stdlib image/audio codecs (zlib/struct/wave — no PIL/torchaudio).

The container ships no imaging or audio libraries, but PNG and WAV/PCM are
simple enough to implement completely from the published specs, which
turns the multimodal decode kernels from stubs into REAL byte-level
decoders: ``decode_png`` parses signature/IHDR/IDAT and reverses all five
scanline filters per the PNG spec (RFC 2083); ``decode_wav`` parses the
RIFF container via the stdlib ``wave`` module. The encoders exist so
tests and fixtures can generate genuine files, and so the report sink
(pipeline/plots.py) can emit real PNG figures — parity with the
reference's matplotlib output (reference
scripts/generate_benchmark_reports.py:312-550) without the dependency.

If PIL/torchaudio ARE present, the kernels in binaryops.py prefer them;
these functions are the always-available fallback.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as PNG
    (8-bit, filter 0 per scanline, one zlib-deflated IDAT)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, h, w = 0, arr.shape[0], arr.shape[1]
        raw_rows = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, h, w = 2, arr.shape[0], arr.shape[1]
        raw_rows = arr.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 ("None") prepended to every scanline
    raw = b"".join(b"\x00" + raw_rows[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale/RGB PNG to a (h, w) or (h, w, 3) uint8
    array. Full filter support (None/Sub/Up/Average/Paeth); no interlace,
    no palette — the subset the encoder above and common tools emit."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color_type not in (0, 2) or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color_type} "
                    f"interlace={interlace})"
                )
            nch = 1 if color_type == 0 else 3
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        row = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        ftype = raw[r * (stride + 1)]
        prev = out[r - 1] if r else np.zeros(stride, dtype=np.uint8)
        if ftype == 1:  # Sub
            for i in range(nch, stride):
                row[i] = (row[i] + row[i - nch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - nch] if i >= nch else 0
                row[i] = (row[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - nch] if i >= nch else 0
                ul = int(prev[i - nch]) if i >= nch else 0
                row[i] = (row[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out[r] = np.frombuffer(bytes(row), dtype=np.uint8)
    return out.reshape(h, w) if nch == 1 else out.reshape(h, w, 3)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode mono int16 samples as a WAV/RIFF PCM file (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a mono 16-bit WAV to (sample_rate, int16 array)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2 or f.getnchannels() != 1:
            raise ValueError("only mono PCM16 supported")
        rate = f.getframerate()
        frames = f.readframes(f.getnframes())
    return rate, np.frombuffer(frames, dtype="<i2")
