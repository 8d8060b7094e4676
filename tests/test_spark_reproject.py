"""Layer reprojection e2e (G1): LatLng -> WebMercator warp goldens."""

import numpy as np
import pytest

from geotrellis_spark.core import codecs, sfc
from geotrellis_spark.core.layout import ZoomedLayoutScheme
from geotrellis_spark.operators import reproject

ZOOM = 2
T = 64


def _layer(spark, value_fn):
    """Build a full-world LatLng layer at ZOOM with T-px tiles whose
    pixel values come from value_fn(lon, lat)."""
    ld = ZoomedLayoutScheme("latlng", T).level_for_zoom(ZOOM)
    rows = []
    n = 1 << ZOOM
    for kc in range(n):
        for kr in range(n):
            xs, ys = ld.cell_lattice(kc, kr)
            gx, gy = np.meshgrid(xs, ys)
            px = value_fn(gx, gy).astype(np.uint16)
            rows.append(
                ("src", ZOOM, kc, kr, int(sfc.zorder(kc, kr)),
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
