"""Layer reprojection e2e (G1): LatLng -> WebMercator warp goldens."""

import numpy as np
import pytest

from geotrellis_spark.core import codecs, sfc
from geotrellis_spark.core.layout import ZoomedLayoutScheme
from geotrellis_spark.operators import reproject

ZOOM = 2
T = 64


def _layer(spark, value_fn, zoom=ZOOM, keys=None):
    """Build a LatLng layer at ``zoom`` with T-px tiles whose pixel
    values come from value_fn(lon, lat); full-world unless ``keys``
    (iterable of (col,row)) restricts coverage."""
    ld = ZoomedLayoutScheme("latlng", T).level_for_zoom(zoom)
    rows = []
    n = 1 << zoom
    for kc, kr in (
        keys if keys is not None
        else ((c, r) for c in range(n) for r in range(n))
    ):
        xs, ys = ld.cell_lattice(kc, kr)
        gx, gy = np.meshgrid(xs, ys)
        px = np.rint(value_fn(gx, gy)).astype(np.uint16)
        rows.append(
            ("src", zoom, kc, kr, int(sfc.zorder(kc, kr)),
             bytearray(codecs.encode_tile(px, "raw16")), "raw16", T, T,
             "uint16ud0")
        )
    return spark.createDataFrame(
        rows,
        "layer string, zoom int, key_col long, key_row long, cell_id long, "
        "tile binary, fmt string, w int, h int, cell_type string",
    )


def test_reproject_constant_exact(spark):
    src = _layer(spark, lambda lon, lat: np.full(lon.shape, 7.0))
    out = reproject.reproject_layer(src, ZOOM, "latlng", "webmercator", T)
    tiles = out.collect()
    n = 1 << ZOOM
    assert len(tiles) == n * n  # full world covered
    for r in tiles:
        px = codecs.decode_tile(bytes(r["tile"]), T, T, r["fmt"])
        assert (px == 7).all(), (r["key_col"], r["key_row"])
        assert r["layer"] == "src_webmercator"


def test_reproject_lon_gradient(spark):
    src = _layer(spark, lambda lon, lat: 1000.0 + lon * 2.0)
    out = reproject.reproject_layer(src, ZOOM, "latlng", "webmercator", T)
    dst_ld = ZoomedLayoutScheme("webmercator", T).level_for_zoom(ZOOM)
    from geotrellis_spark.core.layout import webmercator_to_lonlat

    checked = 0
    for r in out.collect():
        px = codecs.decode_tile(bytes(r["tile"]), T, T, r["fmt"]).astype(np.float64)
        xs, ys = dst_ld.cell_lattice(r["key_col"], r["key_row"])
        gx, gy = np.meshgrid(xs, ys)
        lon, lat = webmercator_to_lonlat(gx.ravel(), gy.ravel())
        expect = 1000.0 + lon.reshape(T, T) * 2.0
        # bilinear of a linear-in-lon field is exact up to uint16
        # rounding of source pixels (<=0.5) + result rint (<=0.5)
        np.testing.assert_allclose(px, expect, atol=1.01)
        checked += 1
    assert checked == (1 << ZOOM) ** 2


def test_reproject_layer_utm_gradient(spark):
    """LatLng -> UTM 33N onto a FloatingLayoutScheme grid: a linear
    field in (lon, lat) must re-emerge at the UTM pixel centers mapped
    back through the exact inverse transform. Proves the composed CRS
    pair, the warped-extent floating layout fit, and the warp itself."""
    from geotrellis_spark.core import proj

    zoom = 5  # latlng tiles 11.25 x 5.625 deg
    keys = [(c, r) for c in (16, 17) for r in (6, 7, 8)]
    f = lambda lon, lat: 20000.0 + 100.0 * lon + 50.0 * lat  # noqa: E731
    src = _layer(spark, f, zoom=zoom, keys=keys)
    out = reproject.reproject_layer_utm(src, zoom, zone=33, tile_size=T)
    tiles = out.collect()
    assert tiles and all(r["zoom"] == 0 for r in tiles)
    assert all(r["layer"] == "src_utm:33n" for r in tiles)

    # source coverage: cols 16-17 -> lon [0, 22.5], rows 6-8 ->
    # lat [39.375, 56.25]; stay one source cell inside the edge so
    # bilinear support is complete
    src_cw, src_ch = 11.25 / T, 5.625 / T
    checked = 0
    for r in tiles:
        px = codecs.decode_tile(
            bytes(r["tile"]), T, T, r["fmt"]
        ).astype(np.float64)
        # the same layout the operator fits (shared helper)
        from geotrellis_spark.core.layout import ZoomedLayoutScheme as _Z

        src_ld = _Z("latlng", T).level_for_zoom(zoom)
        x0, _, _, y1 = src_ld.key_to_extent(16, 6)
        _, y0, x1, _ = src_ld.key_to_extent(17, 8)
        fwd, inv = reproject._crs_pair("latlng", "utm:33n")
        dst_ld = reproject.fit_floating_layout(
            (float(x0), float(y0), float(x1), float(y1)),
            fwd, src_ld.cell_width, src_ld.cell_height, T,
        )
        xs, ys = dst_ld.cell_lattice(r["key_col"], r["key_row"])
        ggx, ggy = np.meshgrid(xs, ys)
        lon, lat = proj.utm_inverse(ggx.ravel(), ggy.ravel(), 33)
        inside = (
            (lon > 0.0 + src_cw) & (lon < 22.5 - src_cw)
            & (lat > 39.375 + src_ch) & (lat < 56.25 - src_ch)
        )
        # exclude one-source-cell bands around INTERNAL source-tile
        # seams: bilinear clamps at each source tile's edge (no
        # cross-tile neighbors in this operator), so a 2-D gradient is
        # only exactly reproduced away from seams
        for s in (11.25,):
            inside &= np.abs(lon - s) > 2 * src_cw
        for s in (45.0, 50.625):
            inside &= np.abs(lat - s) > 2 * src_ch
        inside = inside.reshape(T, T)
        expect = f(lon, lat).reshape(T, T)
        if inside.any():
            np.testing.assert_allclose(
                px[inside], expect[inside], atol=1.01
            )
            checked += 1
        # outside coverage must be nodata fill (0) or seam-clamped
        # (bilinear edge clamp bounded by half a source cell of
        # gradient: 100 deg^-1 * src_cw / 2 ~ 8.8, + rounding)
        assert ((px[~inside] == 0) | (np.abs(
            px[~inside] - expect[~inside]) <= 12.0)).all()
    assert checked >= 4


def test_reproject_layer_polar_gradient(spark):
    """LatLng -> north polar stereographic (polar:n) floating warp: a
    lat-only linear field re-emerges at polar pixel centers mapped back
    through the exact inverse. Lon-only seams are free (field constant
    along them); the one internal lat seam is masked."""
    from geotrellis_spark.core import proj

    zoom = 5
    keys = [(c, r) for c in (10, 11, 12, 13) for r in (0, 1)]
    f = lambda lon, lat: 40000.0 - 400.0 * (90.0 - lat)  # noqa: E731
    src = _layer(spark, f, zoom=zoom, keys=keys)
    out = reproject.reproject_layer_floating(
        src, zoom, "polar:n", tile_size=T
    )
    rows = out.collect()
    assert rows and all(r["layer"] == "src_polar:n" for r in rows)

    src_ch = 5.625 / T
    fwd, inv = reproject._crs_pair("latlng", "polar:n")
    from geotrellis_spark.core.layout import ZoomedLayoutScheme as _Z

    src_ld = _Z("latlng", T).level_for_zoom(zoom)
    x0, _, _, y1 = src_ld.key_to_extent(10, 0)
    _, y0, x1, _ = src_ld.key_to_extent(13, 1)
    dst_ld = reproject.fit_floating_layout(
        (float(x0), float(y0), float(x1), float(y1)),
        fwd, src_ld.cell_width, src_ld.cell_height, T,
    )
    checked = 0
    for r in rows:
        px = codecs.decode_tile(
            bytes(r["tile"]), T, T, r["fmt"]
        ).astype(np.float64)
        xs, ys = dst_ld.cell_lattice(r["key_col"], r["key_row"])
        ggx, ggy = np.meshgrid(xs, ys)
        lon, lat = proj.ps_inverse(
            ggx.ravel(), ggy.ravel(), 70.0, -45.0
        )
        inside = (
            (lon > -67.5 + src_ch) & (lon < -22.5 - src_ch)
            & (lat > 78.75 + src_ch) & (lat < 90.0 - src_ch)
            & (np.abs(lat - 84.375) > 2 * src_ch)  # internal lat seam
        ).reshape(T, T)
        expect = f(lon, lat).reshape(T, T)
        if inside.any():
            np.testing.assert_allclose(px[inside], expect[inside],
                                       atol=1.01)
            checked += 1
    assert checked >= 3


def test_polar_full_ring_extent_not_collapsed(spark):
    """Regression: a layer spanning the FULL longitude ring warped to
    polar:s used to collapse the fitted bbox to ~0 width (3x3 extent
    sample hit sin(lam)~0 at lons {-180,0,180}) and silently dropped
    nearly everything. The dense-sample fit must cover the ring: output
    tiles exist in all four quadrants of the polar plane."""
    from geotrellis_spark.core import proj

    zoom = 3  # latlng tiles 45 x 22.5 deg
    keys = [(c, 7) for c in range(8)]  # lat [-90, -67.5], all lons
    src = _layer(spark, lambda lon, lat: np.full(lon.shape, 7.0),
                 zoom=zoom, keys=keys)
    out = reproject.reproject_layer_floating(src, zoom, "polar:s",
                                             tile_size=T)
    rows = out.collect()
    assert len(rows) >= 4
    # locate each output tile's center in polar coords via the shared
    # layout fit; quadrant coverage proves the bbox spanned the ring
    from geotrellis_spark.core.layout import ZoomedLayoutScheme as _Z

    src_ld = _Z("latlng", T).level_for_zoom(zoom)
    x0, _, _, y1 = src_ld.key_to_extent(0, 7)
    _, y0, x1, _ = src_ld.key_to_extent(7, 7)
    fwd, _ = reproject._crs_pair("latlng", "polar:s")
    dst_ld = reproject.fit_floating_layout(
        (float(x0), float(y0), float(x1), float(y1)),
        fwd, src_ld.cell_width, src_ld.cell_height, T,
    )
    quads = set()
    valid = 0
    for r in rows:
        px = codecs.decode_tile(bytes(r["tile"]), T, T, r["fmt"])
        if (px == 7).any():
            valid += 1
            xs, ys = dst_ld.cell_lattice(r["key_col"], r["key_row"])
            quads.add((xs.mean() > 0, ys.mean() > 0))
    assert valid >= 4
    assert len(quads) == 4, quads
