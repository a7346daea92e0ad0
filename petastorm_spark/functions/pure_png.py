"""Pure-python PNG encode/decode (W3C PNG spec / RFC 2083) on stdlib
zlib + struct only.

This is the fallback backend for :class:`CompressedImageCodec` when no
image library (PIL/OpenCV) is importable — it produces REAL ``.png``
bytes any external tool can open, instead of a private raw container.
Scope (enough for tensor-codec parity, not a general PNG library):

  - encode: 8/16-bit grayscale (color type 0) and RGB (color type 2),
    non-interlaced, filter type None per scanline;
  - decode: same color types/depths, all five scanline filters
    (None/Sub/Up/Average/Paeth), non-interlaced only — so PNGs written
    by common encoders (which do use filters) decode too.

Palette, alpha, and Adam7 interlacing raise NotImplementedError.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """PNG bytes for an HxW (grayscale) or HxWx3 (RGB) uint8/uint16
    array. Scanlines use filter type 0 — zlib does the compressing."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        color, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, channels = 2, 3
    else:
        raise ValueError(
            f"png_encode expects HxW or HxWx3, got shape {arr.shape}"
        )
    if arr.dtype == np.uint8:
        depth = 8
        raw = arr.tobytes()
    elif arr.dtype == np.uint16:
        depth = 16
        raw = arr.astype(">u2").tobytes()  # network byte order per spec
    else:
        raise ValueError(f"png_encode expects uint8/uint16, got {arr.dtype}")
    h, w = int(arr.shape[0]), int(arr.shape[1])
    stride = w * channels * (depth // 8)
    lines = b"".join(
        b"\x00" + raw[y * stride : (y + 1) * stride] for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines, compress_level))
        + _chunk(b"IEND", b"")
    )


def _paeth(left: int, up: int, upleft: int) -> int:
    p = left + up - upleft
    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
    if pa <= pb and pa <= pc:
        return left
    return up if pb <= pc else upleft


def _unfilter_line(
    ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    if ftype == 0:  # None
        return line
    if ftype == 1:  # Sub: recon[x] = filt[x] + recon[x - bpp]
        n = len(line)
        pad = (-n) % bpp
        padded = np.concatenate([line, np.zeros(pad, np.uint8)]) if pad else line
        rec = (
            np.cumsum(padded.reshape(-1, bpp).astype(np.int64), axis=0) & 0xFF
        ).astype(np.uint8).reshape(-1)
        return rec[:n]
    if ftype == 2:  # Up (uint8 addition wraps mod 256, as specified)
        return line + prev
    rec = np.empty_like(line)
    if ftype == 3:  # Average
        for x in range(len(line)):
            left = int(rec[x - bpp]) if x >= bpp else 0
            rec[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        return rec
    if ftype == 4:  # Paeth
        for x in range(len(line)):
            left = int(rec[x - bpp]) if x >= bpp else 0
            upleft = int(prev[x - bpp]) if x >= bpp else 0
            rec[x] = (int(line[x]) + _paeth(left, int(prev[x]), upleft)) & 0xFF
        return rec
    raise ValueError(f"unknown PNG filter type {ftype}")


def png_decode(data: bytes) -> np.ndarray:
    if data[:8] != _SIG:
        raise ValueError("not a PNG byte stream")
    pos = 8
    ihdr = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if interlace != 0:
        raise NotImplementedError("interlaced PNG not supported")
    if color not in (0, 2) or depth not in (8, 16) or comp != 0 or filt != 0:
        raise NotImplementedError(
            f"unsupported PNG (color type {color}, bit depth {depth}); "
            "only 8/16-bit grayscale and RGB decode here"
        )
    channels = 1 if color == 0 else 3
    bpp = channels * (depth // 8)
    stride = w * bpp
    decomp = zlib.decompress(b"".join(idat))
    if len(decomp) != h * (stride + 1):
        raise ValueError("PNG scanline payload has unexpected size")
    mat = np.frombuffer(decomp, np.uint8).reshape(h, stride + 1)
    ftypes = mat[:, 0]
    if not ftypes.any():
        # all scanlines use filter None (what png_encode writes): one
        # vectorized copy — keeps the hot read path out of python-loop
        # GIL territory so reader worker threads actually scale
        out = np.ascontiguousarray(mat[:, 1:])
    else:
        out = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            prev = _unfilter_line(int(ftypes[y]), mat[y, 1:].copy(), prev, bpp)
            out[y] = prev
    if depth == 16:
        arr = out.reshape(h * stride // 2, 2).view(">u2").astype(np.uint16)
        arr = arr.reshape(h, w, channels)
    else:
        arr = out.reshape(h, w, channels)
    return arr[:, :, 0] if channels == 1 else arr
