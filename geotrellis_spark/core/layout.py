"""Tile layouts and key math — vectorized numpy.

Re-expression of GeoTrellis layout machinery (reference, upstream 3.x
layout — see SURVEY.md §0: ``layer/src/main/scala/geotrellis/layer/
{LayoutDefinition,MapKeyTransform,ZoomedLayoutScheme,
FloatingLayoutScheme,SpatialKey}.scala``):

- :class:`LayoutDefinition`  — world extent + grid-of-tiles shape, with
  vectorized ``point_to_key`` / ``key_to_extent`` / ``extent_to_key_range``
  (MapKeyTransform role).
- :class:`ZoomedLayoutScheme` — power-of-two world pyramid: zoom z has a
  ``2^z x 2^z`` tile grid over the CRS world extent; row 0 is north/top
  (slippy-map / TMS-XYZ convention GeoTrellis implements).
- :class:`FloatingLayoutScheme` — grid fit to the data extent at native
  resolution.

CRS support is the two the engine needs, closed-form (no proj4):
WebMercator (EPSG:3857) and LatLng (EPSG:4326).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

WEBMERCATOR_MAX = 20037508.342789244  # == 6378137 * pi
EARTH_RADIUS = 6378137.0

__all__ = [
    "Extent",
    "TileLayout",
    "LayoutDefinition",
    "ZoomedLayoutScheme",
    "FloatingLayoutScheme",
    "lonlat_to_webmercator",
    "webmercator_to_lonlat",
    "lonlat_to_slippy_key",
    "WEBMERCATOR_MAX",
]


@dataclass(frozen=True)
class Extent:
    """Axis-aligned bounding box (reference ``vector/.../Extent.scala``)."""

    xmin: float
    ymin: float
    xmax: float
    ymax: float

    @property
    def width(self) -> float:
        return self.xmax - self.xmin

    @property
    def height(self) -> float:
        return self.ymax - self.ymin

    def intersects(self, other: "Extent") -> bool:
        return (
            self.xmin <= other.xmax
            and self.xmax >= other.xmin
            and self.ymin <= other.ymax
            and self.ymax >= other.ymin
        )


@dataclass(frozen=True)
class TileLayout:
    """Grid-of-tiles shape (reference ``raster/.../TileLayout.scala``)."""

    layout_cols: int
    layout_rows: int
    tile_cols: int
    tile_rows: int


@dataclass(frozen=True)
class LayoutDefinition:
    """Extent + TileLayout, with the MapKeyTransform key math.

    Row 0 is the NORTH/top row (GeoTrellis ``SpatialKey`` convention).
    """

    extent: Extent
    tile_layout: TileLayout

    @property
    def tile_width(self) -> float:
        return self.extent.width / self.tile_layout.layout_cols

    @property
    def tile_height(self) -> float:
        return self.extent.height / self.tile_layout.layout_rows

    @property
    def cell_width(self) -> float:
        return self.tile_width / self.tile_layout.tile_cols

    @property
    def cell_height(self) -> float:
        return self.tile_height / self.tile_layout.tile_rows

    def point_to_key(self, x, y) -> tuple[np.ndarray, np.ndarray]:
        """Map points to (key_col, key_row); clamped to the grid so
        points on the far edge land in the last tile (GeoTrellis
        MapKeyTransform behavior for the world extent's max edge)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        col = np.floor((x - self.extent.xmin) / self.tile_width).astype(np.int64)
        row = np.floor((self.extent.ymax - y) / self.tile_height).astype(np.int64)
        col = np.clip(col, 0, self.tile_layout.layout_cols - 1)
        row = np.clip(row, 0, self.tile_layout.layout_rows - 1)
        return col, row

    def key_to_extent(self, col, row):
        """Per-key extents as (xmin, ymin, xmax, ymax) arrays."""
        col = np.asarray(col, dtype=np.float64)
        row = np.asarray(row, dtype=np.float64)
        tw, th = self.tile_width, self.tile_height
        xmin = self.extent.xmin + col * tw
        ymax = self.extent.ymax - row * th
        return xmin, ymax - th, xmin + tw, ymax

    def extent_to_key_range(self, e: Extent) -> tuple[int, int, int, int]:
        """GridBounds of keys overlapping an extent:
        (col_min, row_min, col_max, row_max), inclusive, clamped."""
        eps = 1e-12
        c0 = math.floor((e.xmin - self.extent.xmin) / self.tile_width + eps)
        c1 = math.ceil((e.xmax - self.extent.xmin) / self.tile_width - eps) - 1
        r0 = math.floor((self.extent.ymax - e.ymax) / self.tile_height + eps)
        r1 = math.ceil((self.extent.ymax - e.ymin) / self.tile_height - eps) - 1
        c0 = max(c0, 0)
        r0 = max(r0, 0)
        c1 = min(max(c1, c0), self.tile_layout.layout_cols - 1)
        r1 = min(max(r1, r0), self.tile_layout.layout_rows - 1)
        return c0, r0, c1, r1

    def cell_lattice(self, col: int, row: int) -> tuple[np.ndarray, np.ndarray]:
        """Cell-center coordinates of tile (col,row): xs (tile_cols,),
        ys (tile_rows,) with ys descending (row-major north-up)."""
        xmin, ymin, xmax, ymax = self.key_to_extent(col, row)
        cw, ch = self.cell_width, self.cell_height
        xs = float(xmin) + (np.arange(self.tile_layout.tile_cols) + 0.5) * cw
        ys = float(ymax) - (np.arange(self.tile_layout.tile_rows) + 0.5) * ch
        return xs, ys


def _world_extent(crs: str) -> Extent:
    if crs == "webmercator":
        m = WEBMERCATOR_MAX
        return Extent(-m, -m, m, m)
    if crs == "latlng":
        return Extent(-180.0, -90.0, 180.0, 90.0)
    raise ValueError(f"unsupported crs: {crs!r} (webmercator|latlng)")


@dataclass(frozen=True)
class ZoomedLayoutScheme:
    """Power-of-two pyramid over the CRS world extent.

    Reference ``layer/.../ZoomedLayoutScheme.scala``: zoom z =>
    ``TileLayout(2^z, 2^z, tile_size, tile_size)``;
    ``zoomForResolution``: z* = log2(world_width / (res * tile_size)),
    floor if frac(z*) < resolution_threshold else ceil.
    """

    crs: str = "webmercator"
    tile_size: int = 256
    resolution_threshold: float = 0.1

    @property
    def world_extent(self) -> Extent:
        return _world_extent(self.crs)

    def level_for_zoom(self, zoom: int) -> LayoutDefinition:
        n = 1 << zoom
        return LayoutDefinition(
            self.world_extent, TileLayout(n, n, self.tile_size, self.tile_size)
        )

    def zoom_for_resolution(self, resolution: float) -> int:
        w = self.world_extent.width
        z_star = math.log2(w / (resolution * self.tile_size))
        if z_star < 0:
            return 0
        frac = z_star - math.floor(z_star)
        return math.floor(z_star) if frac < self.resolution_threshold else math.ceil(z_star)


@dataclass(frozen=True)
class FloatingLayoutScheme:
    """Grid fit to the data at native resolution (zoom = 0).

    Reference ``layer/.../FloatingLayoutScheme.scala``:
    layout_cols = ceil(extent.width / (cell_width * tile_size)), rows
    analogous; layout extent anchored at the data extent's TOP-LEFT and
    expanded south/east to whole tiles.
    """

    tile_size: int = 256

    def level_for(
        self, data_extent: Extent, cell_width: float, cell_height: float
    ) -> LayoutDefinition:
        tw = cell_width * self.tile_size
        th = cell_height * self.tile_size
        cols = max(1, math.ceil(data_extent.width / tw - 1e-12))
        rows = max(1, math.ceil(data_extent.height / th - 1e-12))
        ext = Extent(
            data_extent.xmin,
            data_extent.ymax - rows * th,
            data_extent.xmin + cols * tw,
            data_extent.ymax,
        )
        return LayoutDefinition(
            ext, TileLayout(cols, rows, self.tile_size, self.tile_size)
        )


# ------------------------------------------------------- CRS transforms

def lonlat_to_webmercator(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -89.99999, 89.99999)
    x = EARTH_RADIUS * np.radians(lon)
    y = EARTH_RADIUS * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x, y) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / EARTH_RADIUS)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / EARTH_RADIUS)) - np.pi / 2.0)
    return lon, lat


def lonlat_to_slippy_key(lon, lat, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Slippy-map / TMS-XYZ tile of a lon/lat at a WebMercator zoom —
    the public spec GeoTrellis's WebMercator ZoomedLayoutScheme key
    assignment implements (row 0 north). Golden: Philadelphia
    (-75.16, 39.95) @ z=12 -> (1192, 1551)."""
    scheme = ZoomedLayoutScheme("webmercator")
    x, y = lonlat_to_webmercator(lon, lat)
    return scheme.level_for_zoom(zoom).point_to_key(x, y)
