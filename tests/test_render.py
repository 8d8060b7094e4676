"""Render surface (operators/render.py + RGBA PNG codec): ColorMap
LessThanOrEqualTo semantics vs a naive per-pixel loop, NoData
transparency, ramp interpolation endpoints, RGBA PNG round-trip
(incl. filtered input), and the Spark renderPng narrow map.
"""

from __future__ import annotations

import numpy as np
import pytest

from geotrellis_spark.core import codecs
from geotrellis_spark.core.kernels import NODATA_U16
from geotrellis_spark.operators.render import ColorMap, color_ramp, render_png

RED, GREEN, BLUE = 0xFF0000FF, 0x00FF00FF, 0x0000FFFF
GRAY = 0x80808080


def test_colormap_lte_semantics_vs_naive():
    cmap = ColorMap([10, 20, 30], [RED, GREEN, BLUE], fallback=GRAY)
    rng = np.random.default_rng(5)
    px = rng.integers(0, 45, size=(17, 13)).astype(np.uint16)
    got = cmap.apply(px)

    def naive(v):
        if v == NODATA_U16:
            return (0, 0, 0, 0)
        for brk, col in zip([10, 20, 30], [RED, GREEN, BLUE]):
            if v <= brk:
                return tuple((col >> s) & 0xFF for s in (24, 16, 8, 0))
        return tuple((GRAY >> s) & 0xFF for s in (24, 16, 8, 0))

    for r in range(px.shape[0]):
        for c in range(px.shape[1]):
            assert tuple(got[r, c]) == naive(int(px[r, c])), (r, c, px[r, c])


def test_colormap_validation():
    with pytest.raises(ValueError, match="breaks"):
        ColorMap([1, 2], [RED])
    with pytest.raises(ValueError, match="ascending"):
        ColorMap([2, 1], [RED, GREEN])


def test_color_ramp_endpoints_and_midpoint():
    ramp = color_ramp([0x000000FF, 0xFF0000FF], 3)
    assert ramp[0] == 0x000000FF
    assert ramp[-1] == 0xFF0000FF
    assert ramp[1] == 0x800000FF  # rint(127.5) = 128 banker's? rint->128
    assert len(color_ramp([RED], 5)) == 5  # single stop = constant
    assert set(color_ramp([RED], 5)) == {RED}


def test_png_rgba_roundtrip():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(33, 21, 4), dtype=np.uint8)
    blob = codecs.png_encode_rgba(img)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(codecs.png_decode_rgba(blob), img)
    with pytest.raises(ValueError):
        codecs.png_encode_rgba(img[:, :, :3])  # not RGBA
    # gray PNG is rejected by the RGBA decoder
    with pytest.raises(ValueError, match="RGBA"):
        codecs.png_decode_rgba(
            codecs.png_encode_gray(np.zeros((4, 4), np.uint16))
        )


def test_spark_render_png(spark):
    from geotrellis_spark import synth
    from geotrellis_spark.operators import tiling

    tiles = tiling.tile_images(
        synth.synth_images(spark, 20, partitions=2), 4, 256, fmt="png"
    )
    cmap = ColorMap([20000, 40000, 65535], [RED, GREEN, BLUE])
    out = render_png(tiles, cmap).collect()
    assert out and all(bytes(r["png"])[:8] == b"\x89PNG\r\n\x1a\n" for r in out)
    r = out[0]
    px = codecs.decode_tile(bytes(r["tile"]), r["w"], r["h"], r["fmt"])
    rgba = codecs.png_decode_rgba(bytes(r["png"]))
    assert rgba.shape == (r["h"], r["w"], 4)
    # NoData pixels render transparent; data pixels opaque
    nod = px == NODATA_U16
    assert (rgba[nod][:, 3] == 0).all()
    assert (rgba[~nod][:, 3] == 255).all()
    # spot-check the break mapping on data pixels
    sel = ~nod & (px <= 20000)
    if sel.any():
        assert (rgba[sel] == [255, 0, 0, 255]).all()
