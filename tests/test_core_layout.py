"""Layout/key-math golden tests (FIXTURES.md §F4; reference spec role:
``layer/src/test/.../{ZoomedLayoutSchemeSpec,FloatingLayoutSchemeSpec,
MapKeyTransformSpec}.scala``)."""

import math

import numpy as np

from geotrellis_spark.core.layout import (
    WEBMERCATOR_MAX,
    Extent,
    FloatingLayoutScheme,
    ZoomedLayoutScheme,
    lonlat_to_slippy_key,
    lonlat_to_webmercator,
    webmercator_to_lonlat,
)


def test_world_extents():
    assert ZoomedLayoutScheme("webmercator").world_extent.xmax == WEBMERCATOR_MAX
    assert math.isclose(WEBMERCATOR_MAX, 6378137.0 * math.pi)
    assert ZoomedLayoutScheme("latlng").world_extent == Extent(-180, -90, 180, 90)


def test_slippy_goldens():
    # (0,0) @ z=1 -> (1,1)
    c, r = lonlat_to_slippy_key(0.0, 0.0, 1)
    assert (int(c), int(r)) == (1, 1)
    # top-left corner of the world @ z=0 -> (0,0)
    c, r = lonlat_to_slippy_key(-180.0, 85.0511, 0)
    assert (int(c), int(r)) == (0, 0)
    # Philadelphia @ z=12 -> (1192, 1551); row 0 is north
    c, r = lonlat_to_slippy_key(-75.16, 39.95, 12)
    assert (int(c), int(r)) == (1192, 1551)


def test_point_to_key_row0_north():
    ld = ZoomedLayoutScheme("latlng").level_for_zoom(1)
    # northern hemisphere point -> row 0
    c, r = ld.point_to_key(10.0, 45.0)
    assert int(r) == 0
    c, r = ld.point_to_key(10.0, -45.0)
    assert int(r) == 1
    # far edge clamps into last tile
    c, r = ld.point_to_key(180.0, -90.0)
    assert (int(c), int(r)) == (1, 1)


def test_key_to_extent_inverse():
    ld = ZoomedLayoutScheme("webmercator").level_for_zoom(3)
    xmin, ymin, xmax, ymax = ld.key_to_extent(2, 5)
    # center of that extent maps back to the key
    c, r = ld.point_to_key((xmin + xmax) / 2, (ymin + ymax) / 2)
    assert (int(c), int(r)) == (2, 5)
    assert math.isclose(xmax - xmin, ld.tile_width)


def test_extent_to_key_range():
    ld = ZoomedLayoutScheme("latlng").level_for_zoom(2)  # 4x4, 90deg x 45deg tiles
    c0, r0, c1, r1 = ld.extent_to_key_range(Extent(-100, -10, -80, 50))
    assert (c0, c1) == (0, 1)
    # y: 50 -> row floor((90-50)/45)=0; -10 -> row floor((90-(-10))/45)=2
    assert (r0, r1) == (0, 2)
    # exact tile boundary extent covers exactly that tile
    c0, r0, c1, r1 = ld.extent_to_key_range(Extent(-90, 0, 0, 45))
    assert (c0, r0, c1, r1) == (1, 1, 1, 1)


def test_zoom_for_resolution_threshold():
    s = ZoomedLayoutScheme("webmercator", tile_size=256, resolution_threshold=0.1)
    w = s.world_extent.width
    # exact power-of-two resolution -> exact zoom
    res_z8 = w / (256 * 2**8)
    assert s.zoom_for_resolution(res_z8) == 8
    # resolution slightly coarser (z* = 7.95): frac=0.95 >= 0.1 -> ceil -> 8
    assert s.zoom_for_resolution(w / (256 * 2**7.95)) == 8
    # z* = 8.05: frac 0.05 < 0.1 -> floor -> 8
    assert s.zoom_for_resolution(w / (256 * 2**8.05)) == 8
    # z* = 8.5 -> ceil -> 9
    assert s.zoom_for_resolution(w / (256 * 2**8.5)) == 9


def test_floating_layout_scheme():
    s = FloatingLayoutScheme(tile_size=256)
    # exact fit: 512x512 cells at cellsize 1 -> 2x2 layout
    ld = s.level_for(Extent(0, 0, 512, 512), 1.0, 1.0)
    assert (ld.tile_layout.layout_cols, ld.tile_layout.layout_rows) == (2, 2)
    assert ld.extent == Extent(0, 0, 512, 512)
    # +1 cell overflow -> 3x2, anchored top-left, expanded south/east
    ld = s.level_for(Extent(0, 0, 513, 512), 1.0, 1.0)
    assert (ld.tile_layout.layout_cols, ld.tile_layout.layout_rows) == (3, 2)
    assert ld.extent.xmin == 0 and ld.extent.ymax == 512
    assert ld.extent.xmax == 768 and ld.extent.ymin == 0


def test_webmercator_roundtrip():
    lon = np.array([-75.16, 0.0, 120.5])
    lat = np.array([39.95, 0.0, -33.2])
    x, y = lonlat_to_webmercator(lon, lat)
    lon2, lat2 = webmercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_cell_lattice():
    ld = ZoomedLayoutScheme("latlng", tile_size=4).level_for_zoom(0)
    xs, ys = ld.cell_lattice(0, 0)
    np.testing.assert_allclose(xs, [-135, -45, 45, 135])
    np.testing.assert_allclose(ys, [67.5, 22.5, -22.5, -67.5])  # descending
