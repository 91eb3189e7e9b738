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


# ---------------------------------------------------------------------------
# BMP (Windows BITMAPINFOHEADER, 24-bit uncompressed) — spec: MS docs /
# Windows BMP file format, public since Windows 3.0.
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as a 24-bit BMP
    (BI_RGB, bottom-up rows, 4-byte row padding, BGR byte order)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    # bottom-up scanlines, BGR
    body = b"".join(arr[r, :, ::-1].tobytes() + pad for r in range(h - 1, -1, -1))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (h, w, 3) uint8 RGB. Handles
    bottom-up and top-down (negative height) row orders."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h = struct.unpack("<Iii", data[14:26])
    planes, bpp, comp = struct.unpack("<HHI", data[26:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for r in range(h):
        src = offset + r * stride
        row = np.frombuffer(data[src : src + w * 3], dtype=np.uint8).reshape(w, 3)
        dst = r if top_down else h - 1 - r
        out[dst] = row[:, ::-1]  # BGR -> RGB
    return out


# ---------------------------------------------------------------------------
# GIF (GIF87a/89a, palette + LZW) — spec: CompuServe GIF89a specification
# (public, 1990); LZW variable-width codes per Appendix F.
# ---------------------------------------------------------------------------


def _gif_lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable code width, little-endian bit packing,
    CLEAR emitted first and whenever the table fills to 4096."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(1 << min_code_size)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    seq: tuple = ()
    for px in indices.tolist():
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(1 << min_code_size)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = (px,)
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int, n_px: int) -> np.ndarray:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    table: list[tuple] = [(i,) for i in range(1 << min_code_size)] + [(), ()]
    out: list[int] = []
    acc = 0
    nbits = 0
    prev: tuple | None = None
    pos = 0
    while len(out) < n_px and (pos < len(data) or nbits >= width):
        while nbits < width and pos < len(data):
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [(i,) for i in range(1 << min_code_size)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        else:  # the KwKwK case
            entry = prev + (prev[0],)
            table.append(entry)
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.asarray(out[:n_px], dtype=np.int32)


def encode_gif_frames(frames: list, delay_cs: int = 10) -> bytes:
    """Encode a list of same-size (h, w) gray / (h, w, 3) RGB uint8 frames
    as an animated GIF89a: one global palette over the union of colors
    (<= 256), a graphic-control extension + image descriptor per frame —
    the standard animation layout."""
    arrs = []
    for img in frames:
        a = np.asarray(img, dtype=np.uint8)
        if a.ndim == 2:
            a = np.stack([a] * 3, axis=2)
        arrs.append(a)
    if not arrs:
        raise ValueError("no frames")
    h, w = arrs[0].shape[:2]
    if any(a.shape[:2] != (h, w) for a in arrs):
        raise ValueError("frames must share dimensions")
    flat = np.concatenate([a.reshape(-1, 3) for a in arrs])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <= 256 colors, got {len(palette)}")
    pal_bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    pal_size = 1 << pal_bits
    pal_bytes = np.zeros((pal_size, 3), dtype=np.uint8)
    pal_bytes[: len(palette)] = palette
    min_code_size = max(2, pal_bits)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) << 4) | (pal_bits - 1), 0, 0)
    out += pal_bytes.tobytes()
    px_per = h * w
    for f in range(len(arrs)):
        if len(arrs) > 1:
            # graphic-control extension: disposal=1 (leave), given delay
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code_size])
        idx = inverse[f * px_per : (f + 1) * px_per].astype(np.int32)
        lzw = _gif_lzw_encode(idx, min_code_size)
        for i in range(0, len(lzw), 255):  # sub-blocks
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 (<= 256 distinct
    colors) as a single-frame GIF89a with a global palette."""
    return encode_gif_frames([img])


def decode_gif_frames(data: bytes, max_frames: int | None = None) -> list:
    """Decode every frame of a GIF87a/89a (global or per-frame local
    palettes, no interlace) to a list of (h, w, 3) uint8 RGB arrays.

    Frames are COMPOSITED onto the logical-screen canvas: each frame's
    left/top offset, transparency index, and disposal method (1 leave,
    2 restore-to-background, 3 restore-to-previous) are honored, so
    animated GIFs with partial-frame updates yield correct full-canvas
    per-frame pixels (and hence correct per-frame statistics)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    background = np.zeros((h, w, 3), dtype=np.uint8)
    if global_pal is not None and bg < len(global_pal):
        background[:] = global_pal[bg]
    canvas = background.copy()
    disposal, tidx = 0, None  # pending graphic-control state
    frames: list = []
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            label = data[pos + 1]
            if label == 0xF9 and data[pos + 2] >= 4:
                packed = data[pos + 3]
                disposal = (packed >> 2) & 0x7
                tidx = data[pos + 6] if packed & 0x1 else None
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            fl, ft, iw, ih, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            palette = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                palette = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1  # block terminator
            if palette is None:
                raise ValueError("GIF frame has no palette")
            if fl + iw > w or ft + ih > h:
                raise ValueError("GIF frame rectangle exceeds logical screen")
            idx = _gif_lzw_decode(bytes(lzw), min_code_size, iw * ih).reshape(ih, iw)
            prev = canvas.copy() if disposal == 3 else None
            patch = palette[idx]
            target = canvas[ft : ft + ih, fl : fl + iw]
            if tidx is not None:
                mask = idx != tidx
                target[mask] = patch[mask]
            else:
                target[:] = patch
            frames.append(canvas.copy())
            if disposal == 2:
                canvas[ft : ft + ih, fl : fl + iw] = background[
                    ft : ft + ih, fl : fl + iw
                ]
            elif disposal == 3 and prev is not None:
                canvas = prev
            disposal, tidx = 0, None
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"bad GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF has no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the first frame of a GIF to (h, w, 3) uint8 RGB."""
    return decode_gif_frames(data, max_frames=1)[0]


# ---------------------------------------------------------------------------
# JPEG (baseline DCT, ITU-T T.81 / ISO 10918-1, public spec) — 4:4:4, no
# subsampling. The Huffman tables are self-defined canonical tables
# (every baseline decoder reads tables from the DHT segment, so any
# valid canonical table yields a spec-conformant file; Annex K's tables
# are only a compression optimization).
# ---------------------------------------------------------------------------

_JPEG_QL = np.array([  # Annex K luminance quantization (quality 50 base)
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

_JPEG_QC = np.array([  # Annex K chrominance quantization
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag permutation, generated (anti-diagonal walk)."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            ij.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(i * 8 + j for i, j in ij)
    return np.asarray(order, dtype=np.int64)


_ZZ = _zigzag_order()

_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = (np.sqrt(0.125) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )


def _jpeg_tables(quality: int):
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_JPEG_QL * scale + 50) // 100, 1, 255)
    qc = np.clip((_JPEG_QC * scale + 50) // 100, 1, 255)
    return ql, qc


# Canonical Huffman: all 12 DC categories at code length 4; all 162 AC
# symbols (EOB, ZRL, run 0-15 x size 1-10) at code length 8. Valid
# (2^4 > 12, 2^8 > 162, all-ones never assigned), trivially invertible.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [r * 16 + s for r in range(16) for s in range(1, 11)]
_AC_SYMS = sorted(set(_AC_SYMS))
_DC_CODE = {sym: (i, 4) for i, sym in enumerate(_DC_SYMS)}
_AC_CODE = {sym: (i, 8) for i, sym in enumerate(_AC_SYMS)}


def _dht(cls: int, tid: int, syms: list, length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(syms)
    payload = bytes([cls << 4 | tid]) + bytes(bits) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n = 0
            self.acc = 0


def _cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _cat_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: category + extra bits (ones' complement
    for negatives)."""
    c = _cat(v)
    return c, (v if v >= 0 else v + (1 << c) - 1)


def _encode_block(bw: _BitWriter, block: np.ndarray, qt: np.ndarray, pred: int) -> int:
    coef = _DCT @ (block.astype(np.float64) - 128.0) @ _DCT.T
    q = np.round(coef / qt).astype(np.int64).ravel()[_ZZ]
    dc = int(q[0])
    c, bits = _cat_bits(dc - pred)
    code, ln = _DC_CODE[c]
    bw.write(code, ln)
    if c:
        bw.write(bits, c)
    run = 0
    last_nz = int(np.max(np.nonzero(q)[0])) if np.any(q) else 0
    for i in range(1, 64):
        v = int(q[i])
        if i > last_nz:
            code, ln = _AC_CODE[0x00]  # EOB
            bw.write(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = _AC_CODE[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        c, bits = _cat_bits(v)
        code, ln = _AC_CODE[run * 16 + c]
        bw.write(code, ln)
        bw.write(bits, c)
        run = 0
    return dc


def encode_jpeg(
    img: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as baseline JPEG
    (4:4:4, self-defined canonical Huffman tables in DHT).
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers every
    that many MCUs (predictors reset, stream byte-aligned) — the decoder
    conformance case for files from encoders that use restarts."""
    arr = np.asarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    ql, qc = _jpeg_tables(quality)
    if gray:
        planes = [(arr.astype(np.float64), ql, 0)]
    else:
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [(y, ql, 0), (cb, qc, 1), (cr, qc, 1)]
    bh, bw8 = (h + 7) // 8, (w + 7) // 8
    out = bytearray(b"\xff\xd8")  # SOI
    for tid, qt in ((0, ql),) if gray else ((0, ql), (1, qc)):
        payload = bytes([tid]) + bytes(qt.ravel()[_ZZ].astype(np.uint8))
        out += b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht(0, 0, _DC_SYMS, 4) + _dht(1, 0, _AC_SYMS, 8)
    if not gray:
        out += _dht(0, 1, _DC_SYMS, 4) + _dht(1, 1, _AC_SYMS, 8)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        t = 0 if cid == 1 else 0x11
        sos += bytes([cid, t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    bwr = _BitWriter()
    preds = [0] * ncomp
    mcu = 0
    for by in range(bh):
        for bx in range(bw8):  # interleaved MCU = one 8x8 block per comp
            if restart_interval and mcu and mcu % restart_interval == 0:
                bwr.flush()  # byte-align (1-padded) before the marker
                bwr.out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                preds = [0] * ncomp
            mcu += 1
            for ci, (plane, qt, _tid) in enumerate(planes):
                blk = np.full((8, 8), 128.0)
                ys, xs = by * 8, bx * 8
                sub = plane[ys : min(ys + 8, h), xs : min(xs + 8, w)]
                blk[: sub.shape[0], : sub.shape[1]] = sub
                # edge padding (replicate) avoids ringing against the 128 fill
                if sub.shape[0] < 8:
                    blk[sub.shape[0] :, : sub.shape[1]] = sub[-1:, :]
                if sub.shape[1] < 8:
                    blk[:, sub.shape[1] :] = blk[:, sub.shape[1] - 1 : sub.shape[1]]
                preds[ci] = _encode_block(bwr, blk, qt, preds[ci])
    bwr.flush()
    out += bwr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            if b == 0xFF:
                if (
                    self.pos + 1 < len(self.data)
                    and self.data[self.pos + 1] == 0x00
                ):
                    self.pos += 2  # stuffed byte
                else:
                    # a real marker: stop feeding (pad with zeros); pos
                    # stays AT the marker so restart() can consume RSTn
                    break
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def restart(self):
        """Consume an RSTn marker at the current position and resume
        bit-reading after it (JPEG restart-interval support). Discards
        any pending bits (the entropy stream is byte-aligned before each
        RSTn by spec)."""
        self.acc = 0
        self.n = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected RSTn marker at restart interval")

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        if self.n < length:  # pad tail with zeros
            self.acc <<= length - self.n
            self.n = length
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v


def _extend(v: int, c: int) -> int:
    return v if v >= (1 << (c - 1)) else v - (1 << c) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) non-subsampled JPEG to (h, w) or
    (h, w, 3) uint8. Huffman tables come from the DHT segments and
    DRI/RSTn restart intervals are honored (DC predictors reset, reader
    realigned at each marker), so files from any conformant encoder
    decode (1x1 sampling only)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple, dict] = {}
    comps = []
    h = w = None
    scan = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int64)
                t[_ZZ] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qts[tq] = t.reshape(8, 8)
                p += 65
        elif marker == 0xC0:
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            p = 6
            for _ in range(nc):
                cid, samp, tq = seg[p], seg[p + 1], seg[p + 2]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported (1x1 only)")
                comps.append({"id": cid, "tq": tq})
                p += 3
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline SOF0 supported")
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = seg[p + 1 : p + 17]
                nsym = sum(bits)
                vals = seg[p + 17 : p + 17 + nsym]
                table = {}
                code = 0
                vi = 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[vi]
                        code += 1
                        vi += 1
                    code <<= 1
                huff[(cls, tid)] = table
                p += 17 + nsym
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            ns = seg[0]
            stabs = {}
            p = 1
            for _ in range(ns):
                cid, t = seg[p], seg[p + 1]
                stabs[cid] = (t >> 4, t & 0xF)
                p += 2
            scan = (stabs, pos + seglen)
            break
        pos += seglen
    if scan is None or h is None:
        raise ValueError("JPEG missing SOS/SOF")
    stabs, dpos = scan
    br = _BitReader(data[dpos:])

    def read_sym(table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read(1)
            if (ln, code) in table:
                return table[(ln, code)]
        raise ValueError("bad Huffman code")

    bh, bw8 = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bw8 * 8)) for _ in comps]
    preds = [0] * len(comps)
    mcu = 0
    for by in range(bh):
        for bx in range(bw8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.restart()
                preds = [0] * len(comps)
            mcu += 1
            for ci, comp in enumerate(comps):
                dct_t, act_t = stabs[comp["id"]]
                dc_tab, ac_tab = huff[(0, dct_t)], huff[(1, act_t)]
                q = np.zeros(64, dtype=np.int64)
                c = read_sym(dc_tab)
                diff = _extend(br.read(c), c) if c else 0
                preds[ci] += diff
                q[0] = preds[ci]
                i = 1
                while i < 64:
                    rs = read_sym(ac_tab)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        i += 16
                        continue
                    i += rs >> 4
                    size = rs & 0xF
                    if i > 63:
                        break
                    q[i] = _extend(br.read(size), size)
                    i += 1
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZZ] = q
                block = coef.reshape(8, 8) * qts[comp["tq"]]
                pix = _DCT.T @ block @ _DCT + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Format sniffing / auto-dispatch
# ---------------------------------------------------------------------------


def sniff_image_format(data: bytes) -> str:
    """Identify an image blob by magic bytes: png | bmp | gif | jpeg."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"GIF8":
        return "gif"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    raise ValueError("unknown image format")


def decode_image_auto(data: bytes) -> np.ndarray:
    """Decode any supported format (PNG/BMP/GIF/JPEG) to a uint8 array —
    (h, w) grayscale or (h, w, 3) RGB depending on the file."""
    fmt = sniff_image_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "gif":
        return decode_gif(data)
    return decode_jpeg(data)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize with pure integer source indexing
    (src_row = dst_row * h // height) — deterministic across platforms,
    no float rounding anywhere."""
    arr = np.asarray(img, dtype=np.uint8)
    h, w = arr.shape[:2]
    ri = (np.arange(height, dtype=np.int64) * h) // height
    ci = (np.arange(width, dtype=np.int64) * w) // width
    return arr[ri][:, ci]


# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 audio frame headers, ISO 11172-3 / 13818-3 public
# spec) — header-walk metadata only, no audio decode. Retires the former
# deterministic-fake audio kernel: the parser reads real sync words,
# bitrate/sample-rate indices, and padding to step frame to frame.
# ---------------------------------------------------------------------------

# bitrate tables in kbps, indexed [version_group][layer][bitrate_index]
_MP3_BITRATES_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_MP3_BITRATES_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {  # [version_bits][sample_rate_index]
    3: [44100, 48000, 32000],  # MPEG-1
    2: [22050, 24000, 16000],  # MPEG-2
    0: [11025, 12000, 8000],  # MPEG-2.5
}


def _mp3_frame(pos: int, data: bytes):
    """Parse one MP3 frame header at ``pos``; returns
    (frame_len, sample_rate, bitrate_kbps, samples_per_frame) or None if
    the bytes at ``pos`` are not a valid sync/header."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, _b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version_bits = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer_bits = (b1 >> 1) & 0x3  # 3=Layer I, 2=Layer II, 1=Layer III
    if version_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits  # 1, 2, 3
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    padding = (b2 >> 1) & 0x1
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / reserved
    table = _MP3_BITRATES_V1 if version_bits == 3 else _MP3_BITRATES_V2
    bitrate = table[layer][br_idx] * 1000
    sample_rate = _MP3_RATES[version_bits][sr_idx]
    if layer == 1:
        frame_len = (12 * bitrate // sample_rate + padding) * 4
        samples = 384
    else:
        per = 144 if (layer == 2 or version_bits == 3) else 72
        frame_len = per * bitrate // sample_rate + padding
        samples = 1152 if (layer == 2 or version_bits == 3) else 576
    return frame_len, sample_rate, bitrate // 1000, samples


def parse_mp3_metadata(data: bytes) -> dict:
    """Walk the MP3 frame headers: skip an ID3v2 tag if present, then
    step frame to frame via each header's computed length. Returns
    sample_rate / bitrate_kbps of the first frame, total frame count,
    and duration_ms = total_samples * 1000 // sample_rate (exact integer
    arithmetic — oracle-checkable)."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = 0
        for b in data[6:10]:  # synchsafe 7-bit bytes
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    n_frames = 0
    total_samples = 0
    sample_rate = 0
    bitrate_kbps = 0
    while True:
        fr = _mp3_frame(pos, data)
        if fr is None:
            break
        frame_len, sr, br, samples = fr
        if n_frames == 0:
            sample_rate, bitrate_kbps = sr, br
        n_frames += 1
        total_samples += samples
        pos += frame_len
    if n_frames == 0:
        raise ValueError("no MP3 frames found")
    return {
        "sample_rate": sample_rate,
        "bitrate_kbps": bitrate_kbps,
        "n_frames": n_frames,
        "duration_ms": total_samples * 1000 // sample_rate,
    }


def encode_mp3_frames(
    sr_idx: int, br_idx: int, n_frames: int, fill_key: int = 0, id3_pad: int = 0
) -> bytes:
    """Emit a structurally valid MPEG-1 Layer III stream: ``n_frames``
    frames with real sync words and correct computed frame lengths
    (payload is deterministic filler — header-level validity only, which
    is all the metadata parser reads). ``id3_pad`` > 0 prepends an ID3v2
    tag of that body size to exercise tag skipping."""
    out = bytearray()
    if id3_pad:
        size = bytes(
            [(id3_pad >> 21) & 0x7F, (id3_pad >> 14) & 0x7F, (id3_pad >> 7) & 0x7F, id3_pad & 0x7F]
        )
        out += b"ID3" + bytes([4, 0, 0]) + size + bytes((fill_key + i) % 256 for i in range(id3_pad))
    bitrate = _MP3_BITRATES_V1[3][br_idx] * 1000
    sample_rate = _MP3_RATES[3][sr_idx]
    frame_len = 144 * bitrate // sample_rate  # padding bit 0
    header = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0xC0])
    for f in range(n_frames):
        out += header
        out += bytes((fill_key + f + i) % 256 for i in range(frame_len - 4))
    return bytes(out)


# ---------------------------------------------------------------------------
# MP4 (ISO base media file format, ISO 14496-12 public spec) — box-walk
# metadata only, no codec. Retires the former byte-slice video stub.
# ---------------------------------------------------------------------------

def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _mp4_fullbox(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _mp4_box(btype, bytes([version]) + flags.to_bytes(3, "big") + body)


def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        body_off = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body_off = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield btype, body_off, pos + size
        pos += size


def parse_mp4_metadata(data: bytes) -> dict:
    """Walk the ISO-BMFF box tree: mvhd gives movie timescale/duration,
    each trak's hdlr gives the handler type ('vide'/'soun'), and the
    first audio track's mdhd timescale is the audio sample rate (the
    standard convention). Parsing only — no sample tables, no codec."""
    timescale = duration = 0
    n_video = n_audio = n_tracks = 0
    audio_rate = 0
    moov = None
    for btype, off, boxend in _iter_boxes(data, 0, len(data)):
        if btype == b"moov":
            moov = (off, boxend)
    if moov is None:
        raise ValueError("no moov box")
    for btype, off, boxend in _iter_boxes(data, *moov):
        if btype == b"mvhd":
            version = data[off]
            if version == 1:
                timescale, duration = struct.unpack(">IQ", data[off + 20 : off + 32])
            else:
                timescale, duration = struct.unpack(">II", data[off + 12 : off + 20])
        elif btype == b"trak":
            n_tracks += 1
            handler = b""
            mdhd_ts = 0
            for t2, o2, e2 in _iter_boxes(data, off, boxend):
                if t2 != b"mdia":
                    continue
                for t3, o3, e3 in _iter_boxes(data, o2, e2):
                    if t3 == b"mdhd":
                        v = data[o3]
                        if v == 1:
                            (mdhd_ts,) = struct.unpack(">I", data[o3 + 20 : o3 + 24])
                        else:
                            (mdhd_ts,) = struct.unpack(">I", data[o3 + 12 : o3 + 16])
                    elif t3 == b"hdlr":
                        handler = data[o3 + 8 : o3 + 12]
            if handler == b"vide":
                n_video += 1
            elif handler == b"soun":
                n_audio += 1
                if audio_rate == 0:
                    audio_rate = mdhd_ts
    if timescale == 0:
        raise ValueError("mvhd missing or zero timescale")
    return {
        "n_tracks": n_tracks,
        "n_video": n_video,
        "n_audio": n_audio,
        "duration_ms": duration * 1000 // timescale,
        "audio_rate": audio_rate,
    }


def encode_mp4(
    duration_ms: int,
    n_video: int = 1,
    n_audio: int = 0,
    audio_rate: int = 44100,
    fill_key: int = 0,
) -> bytes:
    """Emit a structurally valid ISO-BMFF file: ftyp + moov{mvhd +
    trak{tkhd, mdia{mdhd, hdlr}}*} + mdat filler. Metadata-complete
    (timescale/duration/handlers), sample tables omitted — the subset
    the metadata parser (and any box walker) reads."""
    timescale = 1000
    mvhd = _mp4_fullbox(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration_ms * timescale // 1000)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", n_video + n_audio + 1),
    )
    traks = b""
    track_id = 1
    for kind in ["vide"] * n_video + ["soun"] * n_audio:
        ts = 90000 if kind == "vide" else audio_rate
        tkhd = _mp4_fullbox(
            b"tkhd",
            0,
            7,
            struct.pack(">IIII", 0, 0, track_id, 0)
            + struct.pack(">I", duration_ms * timescale // 1000)
            + b"\x00" * 60,
        )
        mdhd = _mp4_fullbox(
            b"mdhd",
            0,
            0,
            struct.pack(">IIII", 0, 0, ts, duration_ms * ts // 1000)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _mp4_fullbox(
            b"hdlr",
            0,
            0,
            struct.pack(">I", 0) + kind.encode() + b"\x00" * 12 + b"handler\x00",
        )
        traks += _mp4_box(b"trak", tkhd + _mp4_box(b"mdia", mdhd + hdlr))
        track_id += 1
    moov = _mp4_box(b"moov", mvhd + traks)
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _mp4_box(b"mdat", bytes((fill_key + i) % 256 for i in range(16 + fill_key % 32)))
    return ftyp + moov + mdat
