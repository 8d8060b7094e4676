"""Cloud-Optimized GeoTIFF codec, from scratch against the public
TIFF 6.0 + GeoTIFF 1.1 (OGC 19-008r4) specifications: tiled image
organization (tags 322-325) and baseline strip organization
(RowsPerStrip/StripOffsets/StripByteCounts — the reference reader's
other segment layout; windowed strip reads fetch whole intersecting
strips), ModelPixelScale/ModelTiepoint geo
transform (33550/33922), GeoKeyDirectory CRS tags (34735), reduced-
resolution overview IFDs chained behind the primary (NewSubfileType=1),
and the COG layout contract — ALL IFDs and tag values live in a
bounded header region BEFORE any tile data, so a reader can plan every
byte range it needs from one small prefix fetch.

Reference role: geotrellis.raster.io.geotiff.GeoTiffReader +
geotrellis.raster.RasterSource — windowed reads of tiled GeoTIFFs are
the reference's primary ingestion path. The 100 TB shape is the whole
point of the format: ``Cog.read_extent`` touches exactly the tiles
that intersect the query window (plus the one prefix fetch), never the
raster; on object storage those become HTTP range requests. The
``fetch(offset, size)`` protocol makes that contract unit-testable —
tests assert on the recorded ranges.

Shares the PackBits section-9 and LZW section-13 codecs with
core/tiff.py; adds Deflate
(TIFF compression 8, zlib bitstream) for real compression ratios.
No external image/geo library — pure numpy + struct + zlib.
"""

from __future__ import annotations

import struct
import zlib
from typing import Callable

import numpy as np

from .tiff import (
    COMP_LZW,
    COMP_NONE,
    COMP_PACKBITS,
    T_ROWS_PER_STRIP,
    T_STRIP_COUNTS,
    T_STRIP_OFFSETS,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)

COMP_DEFLATE = 8  # "Adobe" Deflate — the modern standard value

# tag ids beyond core/tiff.py's baseline set
T_NEW_SUBFILE = 254
T_WIDTH = 256
T_LENGTH = 257
T_BITS = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_SPP = 277
T_PLANAR = 284
T_TILE_WIDTH = 322
T_TILE_LENGTH = 323
T_TILE_OFFSETS = 324
T_TILE_COUNTS = 325
T_SAMPLE_FORMAT = 339
T_PIXEL_SCALE = 33550
T_TIEPOINT = 33922
T_GEOKEYS = 34735

T_PREDICTOR = 317

TYPE_SHORT = 3
TYPE_LONG = 4
TYPE_DOUBLE = 12
TYPE_LONG8 = 16  # BigTIFF
_TYPE = {
    TYPE_SHORT: ("H", 2),
    TYPE_LONG: ("I", 4),
    TYPE_DOUBLE: ("d", 8),
    TYPE_LONG8: ("Q", 8),
    17: ("q", 8),  # SLONG8
    18: ("Q", 8),  # IFD8
}

PRED_NONE, PRED_HORIZONTAL = 1, 2

# GeoKey ids (GeoTIFF 1.1 section 6)
GK_MODEL_TYPE = 1024  # 1=Projected, 2=Geographic2D
GK_RASTER_TYPE = 1025  # 1=PixelIsArea
GK_GEOGRAPHIC_CS = 2048
GK_PROJECTED_CS = 3072

_COMP_NAME = {"none": COMP_NONE, "packbits": COMP_PACKBITS,
              "lzw": COMP_LZW, "deflate": COMP_DEFLATE}


def _geokeys(epsg: int) -> list[int]:
    """GeoKeyDirectory SHORT array for one EPSG code. 4326 is the only
    geographic CRS the engine uses; everything else is projected
    (3857 in practice)."""
    if epsg == 4326:
        keys = [
            (GK_MODEL_TYPE, 0, 1, 2),
            (GK_RASTER_TYPE, 0, 1, 1),
            (GK_GEOGRAPHIC_CS, 0, 1, epsg),
        ]
    else:
        keys = [
            (GK_MODEL_TYPE, 0, 1, 1),
            (GK_RASTER_TYPE, 0, 1, 1),
            (GK_PROJECTED_CS, 0, 1, epsg),
        ]
    out = [1, 1, 0, len(keys)]
    for k in keys:
        out.extend(k)
    return out


def _parse_geokeys(vals: list[int]) -> int | None:
    """EPSG code out of a GeoKeyDirectory value array (None if the
    directory carries neither a geographic nor a projected CS key)."""
    n = vals[3] if len(vals) >= 4 else 0
    epsg = None
    for i in range(n):
        kid, loc, cnt, val = vals[4 + 4 * i : 8 + 4 * i]
        if kid in (GK_GEOGRAPHIC_CS, GK_PROJECTED_CS) and loc == 0:
            epsg = val
    return epsg


def _downsample2(px: np.ndarray) -> np.ndarray:
    """Nearest (top-left of each 2x2 block) 2x reduction — deterministic
    and NoData-sentinel-safe (never invents values by averaging a
    sentinel into data). Odd trailing row/col handled by the same
    stride pick."""
    return px[:, ::2, ::2]


def _tile_grid(h: int, w: int, ts: int) -> tuple[int, int]:
    return (h + ts - 1) // ts, (w + ts - 1) // ts


def _cut_tiles(
    px: np.ndarray, ts: int, bo: str, comp: int, predictor: int = PRED_NONE
) -> tuple[list[bytes], int, int]:
    """Pad-and-cut one level into compressed chunky tile blobs in
    row-major tile order (TIFF 6.0 section 15 layout). Predictor 2 =
    horizontal differencing per sample per row (mod 2^16), applied
    BEFORE compression — what makes Deflate bite on smooth rasters."""
    bands, h, w = px.shape
    nty, ntx = _tile_grid(h, w, ts)
    padded = np.zeros((bands, nty * ts, ntx * ts), dtype=np.uint16)
    padded[:, :h, :w] = px
    chunky = padded.transpose(1, 2, 0)  # (rows, cols, bands), native u16
    tiles = []
    for ty in range(nty):
        for tx in range(ntx):
            t = np.ascontiguousarray(
                chunky[ty * ts : (ty + 1) * ts, tx * ts : (tx + 1) * ts]
            )
            if predictor == PRED_HORIZONTAL:
                t = t.copy()
                t[:, 1:, :] -= chunky[
                    ty * ts : (ty + 1) * ts,
                    tx * ts : tx * ts + ts - 1,
                ]  # uint16 wraparound difference, per sample per row
            raw = t.astype(f"{bo}u2").tobytes()
            if comp == COMP_PACKBITS:
                tiles.append(packbits_encode(raw))
            elif comp == COMP_LZW:
                tiles.append(lzw_encode(raw))
            elif comp == COMP_DEFLATE:
                tiles.append(zlib.compress(raw, 6))
            else:
                tiles.append(raw)
    return tiles, nty, ntx


def _cut_strips(
    px: np.ndarray, rps: int, bo: str, comp: int, predictor: int = PRED_NONE
) -> tuple[list[bytes], int, int]:
    """Cut one level into compressed full-width strip blobs (TIFF 6.0
    baseline strip organization; the last strip is SHORT, not padded —
    unlike tiles)."""
    bands, h, w = px.shape
    chunky = px.transpose(1, 2, 0)
    strips = []
    for r0 in range(0, h, rps):
        t = np.ascontiguousarray(chunky[r0 : r0 + rps]).copy()
        if predictor == PRED_HORIZONTAL:
            t[:, 1:, :] -= chunky[r0 : r0 + rps, : w - 1]
        raw = t.astype(f"{bo}u2").tobytes()
        if comp == COMP_PACKBITS:
            strips.append(packbits_encode(raw))
        elif comp == COMP_LZW:
            strips.append(lzw_encode(raw))
        elif comp == COMP_DEFLATE:
            strips.append(zlib.compress(raw, 6))
        else:
            strips.append(raw)
    return strips, len(strips), 1


def geotiff_encode(
    px: np.ndarray,
    extent: tuple[float, float, float, float],
    epsg: int = 3857,
    tile_size: int = 256,
    compression: str = "deflate",
    overviews: bool = True,
    byteorder: str = "<",
    bigtiff: bool = False,
    predictor: int = PRED_NONE,
    tiled: bool = True,
    rows_per_strip: int = 64,
) -> bytes:
    """Encode uint16 (bands, h, w) pixels as a Cloud-Optimized GeoTIFF:
    tiled layout, geo transform + CRS tags, 2x-reduced overview IFDs
    down to one tile, header-first byte layout (header + every IFD +
    every external tag value precede the first tile byte).

    ``extent`` is (xmin, ymin, xmax, ymax) in CRS units; pixel (0,0) is
    the top-left corner (north-up, PixelIsArea).

    ``bigtiff=True`` writes BigTIFF (version 43: 8-byte offsets/counts,
    20-byte IFD entries) — the form a >4 GiB production COG requires;
    classic TIFF's 32-bit offsets top out there. ``predictor=2`` turns
    on horizontal differencing before compression (tag 317).

    ``tiled=False`` writes the STRIP-organized form (RowsPerStrip /
    StripOffsets / StripByteCounts) the reference's GeoTiffReader also
    accepts — windowed reads then fetch whole intersecting strips
    (full image width), which is exactly the access-pattern penalty
    COG's tiled layout exists to avoid; ``tile_size`` still sets the
    overview decimation cutoff.
    """
    if px.ndim != 3 or px.shape[0] not in (1, 3):
        raise ValueError(f"geotiff_encode wants (1|3, h, w), got {px.shape}")
    if tiled and tile_size % 16:
        raise ValueError("TIFF 6.0: TileWidth/TileLength must be % 16 == 0")
    if predictor not in (PRED_NONE, PRED_HORIZONTAL):
        raise ValueError(f"unsupported predictor {predictor} (1|2)")
    bands, h, w = px.shape
    xmin, ymin, xmax, ymax = map(float, extent)
    comp = _COMP_NAME[compression]
    bo = byteorder

    levels = [px.astype(np.uint16)]
    if overviews:
        while min(levels[-1].shape[1], levels[-1].shape[2]) > tile_size:
            levels.append(_downsample2(levels[-1]))

    per_level = [
        _cut_tiles(lv, tile_size, bo, comp, predictor) if tiled
        else _cut_strips(lv, rows_per_strip, bo, comp, predictor)
        for lv in levels
    ]

    sx = (xmax - xmin) / w
    sy = (ymax - ymin) / h

    # format geometry: classic vs BigTIFF
    off_type = TYPE_LONG8 if bigtiff else TYPE_LONG
    hdr_len = 16 if bigtiff else 8
    entry_len = 20 if bigtiff else 12
    nfmt = "Q" if bigtiff else "H"      # IFD entry count
    cfmt = "Q" if bigtiff else "I"      # per-entry value count
    ofmt = "Q" if bigtiff else "I"      # offsets / next-IFD
    inline = 8 if bigtiff else 4
    nsz = struct.calcsize(nfmt)
    osz = struct.calcsize(ofmt)

    def ifd_tags(li: int) -> list[tuple[int, int, list]]:
        lv = levels[li]
        tiles, nty, ntx = per_level[li]
        _, lh, lw = lv.shape
        tags: list[tuple[int, int, list]] = [
            (T_NEW_SUBFILE, TYPE_LONG, [0 if li == 0 else 1]),
            (T_WIDTH, TYPE_LONG, [lw]),
            (T_LENGTH, TYPE_LONG, [lh]),
            (T_BITS, TYPE_SHORT, [16] * bands),
            (T_COMPRESSION, TYPE_SHORT, [comp]),
            (T_PHOTOMETRIC, TYPE_SHORT, [2 if bands == 3 else 1]),
            (T_SPP, TYPE_SHORT, [bands]),
            (T_PLANAR, TYPE_SHORT, [1]),
            (T_SAMPLE_FORMAT, TYPE_SHORT, [1] * bands),
        ]
        if tiled:
            tags += [
                (T_TILE_WIDTH, TYPE_SHORT, [tile_size]),
                (T_TILE_LENGTH, TYPE_SHORT, [tile_size]),
                (T_TILE_OFFSETS, off_type, [0] * len(tiles)),  # patched
                (T_TILE_COUNTS, off_type, [len(t) for t in tiles]),
            ]
        else:
            tags += [
                (T_ROWS_PER_STRIP, TYPE_LONG, [rows_per_strip]),
                (T_STRIP_OFFSETS, off_type, [0] * len(tiles)),  # patched
                (T_STRIP_COUNTS, off_type, [len(t) for t in tiles]),
            ]
        if predictor != PRED_NONE:
            tags.append((T_PREDICTOR, TYPE_SHORT, [predictor]))
        if li == 0:
            tags += [
                (T_PIXEL_SCALE, TYPE_DOUBLE, [sx, sy, 0.0]),
                (T_TIEPOINT, TYPE_DOUBLE, [0.0, 0.0, 0.0, xmin, ymax, 0.0]),
                (T_GEOKEYS, TYPE_SHORT, [float(v) for v in _geokeys(epsg)]),
            ]
        return sorted(tags, key=lambda t: t[0])

    all_tags = [ifd_tags(li) for li in range(len(levels))]

    # --- lay out: header | IFD+ext per level | tile data -------------
    off = hdr_len
    ifd_offsets, ext_offsets = [], []
    for tags in all_tags:
        ifd_offsets.append(off)
        off += nsz + entry_len * len(tags) + osz
        ext_offsets.append(off)
        for _, typ, vals in tags:
            fmt, sz = _TYPE[typ]
            total = sz * len(vals)
            if total > inline:
                off += total + (total % 2)
    data_start = off + (off % 2)

    tile_offsets: list[list[int]] = []
    off = data_start
    for tiles, _, _ in per_level:
        offs = []
        for t in tiles:
            offs.append(off)
            off += len(t)
        tile_offsets.append(offs)

    out = bytearray()
    out += (b"II" if bo == "<" else b"MM")
    if bigtiff:
        out += struct.pack(f"{bo}HHH", 43, 8, 0)
        out += struct.pack(f"{bo}Q", ifd_offsets[0])
    else:
        out += struct.pack(f"{bo}H", 42) + struct.pack(
            f"{bo}I", ifd_offsets[0]
        )
    for li, tags in enumerate(all_tags):
        nxt = ifd_offsets[li + 1] if li + 1 < len(all_tags) else 0
        ext = bytearray()
        ext_base = ext_offsets[li]
        entries = bytearray()
        for tag, typ, vals in tags:
            if tag in (T_TILE_OFFSETS, T_STRIP_OFFSETS):
                vals = tile_offsets[li]
            fmt, sz = _TYPE[typ]
            if typ == TYPE_SHORT:
                vals = [int(v) for v in vals]
            packed = struct.pack(f"{bo}{len(vals)}{fmt}", *vals)
            entries += struct.pack(f"{bo}HH{cfmt}", tag, typ, len(vals))
            if len(packed) <= inline:
                entries += packed.ljust(inline, b"\x00")
            else:
                entries += struct.pack(f"{bo}{ofmt}", ext_base + len(ext))
                ext += packed
                if len(ext) % 2:
                    ext += b"\x00"
        out += struct.pack(f"{bo}{nfmt}", len(tags)) + entries
        out += struct.pack(f"{bo}{ofmt}", nxt)
        out += ext
    out = out.ljust(data_start, b"\x00")
    for tiles, _, _ in per_level:
        for t in tiles:
            out += t
    return bytes(out)


# ---------------------------------------------------------------- read

class RecordingFetch:
    """In-memory ``fetch`` over a blob that records every requested
    (offset, size) range — the test double for an object-store range
    reader."""

    def __init__(self, data: bytes):
        self.data = bytes(data)
        self.ranges: list[tuple[int, int]] = []

    def __call__(self, offset: int, size: int) -> bytes:
        self.ranges.append((offset, size))
        return self.data[offset : offset + size]


class _Ifd:
    __slots__ = (
        "width", "height", "bands", "comp", "tile_size",
        "ntx", "nty", "tile_offsets", "tile_counts", "predictor",
        "tiled", "rps",
    )


class Cog:
    """Windowed reader over the ``fetch(offset, size) -> bytes``
    protocol. One bounded prefix fetch parses the full IFD chain (the
    COG layout contract); each ``read_window`` call then fetches ONLY
    the tile byte ranges that intersect the window."""

    PREFIX = 16384

    def __init__(self, fetch: Callable[[int, int], bytes]):
        self._fetch = fetch
        self._buf = bytearray(fetch(0, self.PREFIX))
        if self._buf[:2] == b"II":
            self.bo = "<"
        elif self._buf[:2] == b"MM":
            self.bo = ">"
        else:
            raise ValueError("not a TIFF: bad byte-order mark")
        (magic,) = struct.unpack_from(f"{self.bo}H", self._buf, 2)
        if magic == 42:
            self.big = False
            (ifd_off,) = struct.unpack_from(f"{self.bo}I", self._buf, 4)
        elif magic == 43:
            self.big = True
            osize, zero = struct.unpack_from(f"{self.bo}HH", self._buf, 4)
            if osize != 8 or zero != 0:
                raise ValueError(
                    f"malformed BigTIFF header ({osize}, {zero})"
                )
            (ifd_off,) = struct.unpack_from(f"{self.bo}Q", self._buf, 8)
        else:
            raise ValueError(f"not a TIFF: magic {magic} != 42|43")
        self.ifds: list[_Ifd] = []
        self.pixel_scale: tuple[float, float] | None = None
        self.tiepoint: tuple[float, float] | None = None
        self.epsg: int | None = None
        while ifd_off:
            ifd_off = self._parse_ifd(ifd_off)

    # -- header plumbing ----------------------------------------------
    def _ensure(self, end: int) -> None:
        if end > len(self._buf):
            self._buf += self._fetch(len(self._buf), end - len(self._buf))
            if end > len(self._buf):
                raise ValueError("truncated TIFF header region")

    def _values(self, typ: int, count: int, entry_off: int):
        fmt, sz = _TYPE[typ]
        vpos = entry_off + (12 if self.big else 8)
        inline = 8 if self.big else 4
        total = sz * count
        if total <= inline:
            return struct.unpack_from(
                f"{self.bo}{count}{fmt}", self._buf, vpos
            )
        (voff,) = struct.unpack_from(
            f"{self.bo}{'Q' if self.big else 'I'}", self._buf, vpos
        )
        self._ensure(voff + total)
        return struct.unpack_from(f"{self.bo}{count}{fmt}", self._buf, voff)

    def _parse_ifd(self, off: int) -> int:
        nsz = 8 if self.big else 2
        esz = 20 if self.big else 12
        osz = 8 if self.big else 4
        nfmt = "Q" if self.big else "H"
        self._ensure(off + nsz)
        (n,) = struct.unpack_from(f"{self.bo}{nfmt}", self._buf, off)
        self._ensure(off + nsz + esz * n + osz)
        tags: dict[int, tuple] = {}
        for i in range(n):
            e = off + nsz + esz * i
            tag, typ, count = struct.unpack_from(
                f"{self.bo}HH{'Q' if self.big else 'I'}", self._buf, e
            )
            if typ not in _TYPE:
                continue
            tags[tag] = self._values(typ, count, e)

        ifd = _Ifd()
        ifd.width = tags[T_WIDTH][0]
        ifd.height = tags[T_LENGTH][0]
        ifd.bands = tags.get(T_SPP, (1,))[0]
        ifd.comp = tags.get(T_COMPRESSION, (COMP_NONE,))[0]
        if ifd.comp not in (
            COMP_NONE, COMP_PACKBITS, COMP_LZW, COMP_DEFLATE
        ):
            raise ValueError(f"unsupported compression {ifd.comp}")
        bits = tags.get(T_BITS, (16,) * ifd.bands)
        if any(b != 16 for b in bits):
            raise ValueError(f"only 16-bit samples supported, got {bits}")
        ifd.tiled = T_TILE_WIDTH in tags
        if ifd.tiled:
            if tags[T_TILE_WIDTH][0] != tags[T_TILE_LENGTH][0]:
                raise ValueError("non-square tiles unsupported")
            ifd.tile_size = tags[T_TILE_WIDTH][0]
            ifd.rps = 0
            ifd.nty, ifd.ntx = _tile_grid(
                ifd.height, ifd.width, ifd.tile_size
            )
            ifd.tile_offsets = list(tags[T_TILE_OFFSETS])
            ifd.tile_counts = list(tags[T_TILE_COUNTS])
            if len(ifd.tile_offsets) != ifd.nty * ifd.ntx:
                raise ValueError("TileOffsets count != tile grid size")
        elif T_STRIP_OFFSETS in tags:
            ifd.tile_size = 0
            ifd.rps = tags.get(T_ROWS_PER_STRIP, (ifd.height,))[0]
            ifd.ntx = 1
            ifd.nty = -(-ifd.height // ifd.rps)
            ifd.tile_offsets = list(tags[T_STRIP_OFFSETS])
            ifd.tile_counts = list(tags[T_STRIP_COUNTS])
            if len(ifd.tile_offsets) != ifd.nty:
                raise ValueError("StripOffsets count != strip count")
        else:
            raise ValueError("neither tiled nor striped TIFF")
        ifd.predictor = tags.get(T_PREDICTOR, (PRED_NONE,))[0]
        if ifd.predictor not in (PRED_NONE, PRED_HORIZONTAL):
            raise ValueError(f"unsupported predictor {ifd.predictor}")
        self.ifds.append(ifd)

        if T_PIXEL_SCALE in tags:
            sx, sy = tags[T_PIXEL_SCALE][0], tags[T_PIXEL_SCALE][1]
            self.pixel_scale = (float(sx), float(sy))
        if T_TIEPOINT in tags:
            tp = tags[T_TIEPOINT]
            self.tiepoint = (float(tp[3]), float(tp[4]))  # (xmin, ymax)
        if T_GEOKEYS in tags:
            self.epsg = _parse_geokeys([int(v) for v in tags[T_GEOKEYS]])

        (nxt,) = struct.unpack_from(
            f"{self.bo}{'Q' if self.big else 'I'}",
            self._buf,
            off + (8 if self.big else 2) + (20 if self.big else 12) * n,
        )
        return nxt

    # -- geo ------------------------------------------------------------
    @property
    def extent(self) -> tuple[float, float, float, float]:
        if self.pixel_scale is None or self.tiepoint is None:
            raise ValueError("no geo transform tags")
        sx, sy = self.pixel_scale
        x0, y1 = self.tiepoint
        main = self.ifds[0]
        return (x0, y1 - sy * main.height, x0 + sx * main.width, y1)

    # -- windowed read ---------------------------------------------------
    def _tile(self, ifd: _Ifd, ty: int, tx: int) -> np.ndarray:
        i = ty * ifd.ntx + tx
        chunk = self._fetch(ifd.tile_offsets[i], ifd.tile_counts[i])
        if ifd.tiled:
            ch, cw = ifd.tile_size, ifd.tile_size
        else:  # strip: full width, last strip short (never padded)
            ch = min(ifd.rps, ifd.height - ty * ifd.rps)
            cw = ifd.width
        expected = ch * cw * ifd.bands * 2
        if ifd.comp == COMP_PACKBITS:
            raw = packbits_decode(chunk, expected)
        elif ifd.comp == COMP_LZW:
            raw = lzw_decode(chunk, expected)
        elif ifd.comp == COMP_DEFLATE:
            raw = zlib.decompress(chunk)
            if len(raw) != expected:
                raise ValueError("deflate tile size mismatch")
        else:
            raw = chunk
            if len(raw) != expected:
                raise ValueError("raw tile size mismatch")
        arr = np.frombuffer(raw, dtype=f"{self.bo}u2").astype(np.uint16)
        arr = arr.reshape(ch, cw, ifd.bands)
        if ifd.predictor == PRED_HORIZONTAL:
            # inverse differencing: running sum across columns per
            # sample, mod 2^16 (uint16 cumsum wraps)
            arr = np.cumsum(arr, axis=1, dtype=np.uint16)
        return arr

    def read_window(
        self, x0: int, y0: int, x1: int, y1: int, level: int = 0
    ) -> np.ndarray:
        """Pixel-space window [x0,x1) x [y0,y1) at overview ``level`` as
        uint16 (bands, h, w). Fetches only intersecting tiles."""
        ifd = self.ifds[level]
        x0, y0 = max(0, x0), max(0, y0)
        x1, y1 = min(ifd.width, x1), min(ifd.height, y1)
        if x0 >= x1 or y0 >= y1:
            return np.zeros((ifd.bands, 0, 0), dtype=np.uint16)
        out = np.zeros((y1 - y0, x1 - x0, ifd.bands), dtype=np.uint16)
        if ifd.tiled:
            ts = ifd.tile_size
            for ty in range(y0 // ts, (y1 - 1) // ts + 1):
                for tx in range(x0 // ts, (x1 - 1) // ts + 1):
                    tile = self._tile(ifd, ty, tx)
                    gy0, gx0 = ty * ts, tx * ts
                    ry0, ry1 = max(y0, gy0), min(y1, gy0 + ts)
                    rx0, rx1 = max(x0, gx0), min(x1, gx0 + ts)
                    out[ry0 - y0 : ry1 - y0, rx0 - x0 : rx1 - x0] = tile[
                        ry0 - gy0 : ry1 - gy0, rx0 - gx0 : rx1 - gx0
                    ]
        else:  # striped: fetch intersecting full-width strips only
            rps = ifd.rps
            for ty in range(y0 // rps, (y1 - 1) // rps + 1):
                strip = self._tile(ifd, ty, 0)
                gy0 = ty * rps
                ry0, ry1 = max(y0, gy0), min(y1, gy0 + strip.shape[0])
                out[ry0 - y0 : ry1 - y0, :] = strip[
                    ry0 - gy0 : ry1 - gy0, x0:x1
                ]
        return np.ascontiguousarray(out.transpose(2, 0, 1))

    def read_extent(
        self,
        extent: tuple[float, float, float, float],
        level: int = 0,
    ) -> tuple[np.ndarray, tuple[int, int]]:
        """CRS-space window at overview ``level``: returns (pixels,
        (px0, py0)) — the decoded block plus its top-left pixel
        coordinate at that level (for re-anchoring into a layer grid).
        """
        sx, sy = self.pixel_scale
        tx0, ty1 = self.tiepoint
        scale = 1 << level
        qx0, qy0, qx1, qy1 = extent
        px0 = int(np.floor((qx0 - tx0) / (sx * scale)))
        px1 = int(np.ceil((qx1 - tx0) / (sx * scale)))
        py0 = int(np.floor((ty1 - qy1) / (sy * scale)))
        py1 = int(np.ceil((ty1 - qy0) / (sy * scale)))
        win = self.read_window(px0, py0, px1, py1, level)
        return win, (max(0, px0), max(0, py0))


def geotiff_decode(data: bytes, level: int = 0) -> np.ndarray:
    """Whole-raster decode at one overview level (parity surface with
    the other codecs; windowed access goes through ``Cog``)."""
    cog = Cog(RecordingFetch(data))
    ifd = cog.ifds[level]
    return cog.read_window(0, 0, ifd.width, ifd.height, level)
