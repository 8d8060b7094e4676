"""Tile payload codecs — from-scratch numpy + zlib (no PIL available).

The engine stores image/tile pixels as a ``bytes:binary`` column with a
``fmt`` discriminator (input_hint schema). Two lossless codecs:

- ``raw16``: numpy uint16 row-major ``tobytes`` (w*h*2 bytes).
- ``png``:   minimal PNG, grayscale 8/16-bit, written with filter 0;
  the decoder handles all five standard filters (None/Sub/Up/Average/
  Paeth) so any valid grayscale PNG round-trips.

Reference role: GeoTrellis's GeoTiff reader/writer + render/png
(``raster/.../io/geotiff/``, ``raster/.../render/png/`` — upstream 3.x
layout, SURVEY.md §0). GeoTiff itself is intentionally NOT ported: in a
table-native engine the windowed-read job is done by Parquet row-group
pruning (SURVEY.md §2.S1).

Both codecs are lossless, so the north-rule PSNR>=40dB decoded-pixel
invariant holds with PSNR = inf.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_tile", "decode_tile", "png_encode_gray", "png_decode_gray"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode_gray(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode a 2-D uint8/uint16 array as grayscale PNG (filter 0)."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("png_encode_gray expects a 2-D array")
    if arr.dtype == np.uint8:
        depth, payload = 8, arr
    elif arr.dtype == np.uint16:
        depth, payload = 16, arr.astype(">u2")
    else:
        raise ValueError(f"unsupported dtype {arr.dtype} (uint8|uint16)")
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)  # color type 0 = gray
    raw = payload.tobytes()
    bpr = w * (depth // 8)
    scanlines = b"".join(
        b"\x00" + raw[r * bpr : (r + 1) * bpr] for r in range(h)
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines, level))
        + _chunk(b"IEND", b"")
    )


def _unfilter(data: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    bpr = w * bpp
    out = np.zeros((h, bpr), dtype=np.uint8)
    pos = 0
    prev = np.zeros(bpr, dtype=np.uint8)
    for r in range(h):
        f = data[pos]
        pos += 1
        line = np.frombuffer(data, dtype=np.uint8, count=bpr, offset=pos).copy()
        pos += bpr
        if f == 1:  # Sub
            for i in range(bpp, bpr):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for i in range(bpr):
                left = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(bpr):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(out[r - 1, i - bpp]) if (i >= bpp and r > 0) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out[r] = line
        prev = out[r]
    return out


def png_decode_gray(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = depth = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if color != 0 or interlace != 0:
                raise ValueError("only non-interlaced grayscale PNG supported")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    bpp = depth // 8
    rows = _unfilter(raw, h, w, bpp)
    if depth == 8:
        return rows.reshape(h, w)
    return rows.reshape(h, w * 2).view(">u2").astype(np.uint16).reshape(h, w)


def encode_tile(arr: np.ndarray, fmt: str) -> bytes:
    """Encode a 2-D uint16 pixel array per the table's fmt column."""
    if fmt == "raw16":
        return np.ascontiguousarray(arr, dtype="<u2").tobytes()
    if fmt == "png":
        return png_encode_gray(np.asarray(arr, dtype=np.uint16))
    raise ValueError(f"unsupported fmt {fmt!r}")


def decode_tile(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode a payload to a (h, w) uint16 array."""
    if fmt == "raw16":
        return np.frombuffer(data, dtype="<u2").astype(np.uint16).reshape(h, w)
    if fmt == "png":
        arr = png_decode_gray(data)
        if arr.shape != (h, w):
            raise ValueError(f"PNG dims {arr.shape} != metadata {(h, w)}")
        return arr.astype(np.uint16)
    raise ValueError(f"unsupported fmt {fmt!r}")
