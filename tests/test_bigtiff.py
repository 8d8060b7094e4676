"""BigTIFF (version 43: 8-byte offsets/counts, 20-byte IFD entries)
and Predictor=2 (horizontal differencing) in the COG codec — the two
features that matter at 100 TB: classic TIFF tops out at 4 GiB, and
differencing is what makes Deflate bite on smooth rasters.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geotrellis_spark.core import geotiff
from geotrellis_spark.core.geotiff import Cog, RecordingFetch


def _px(bands, h, w, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 65536, size=(bands, h, w), dtype=np.uint16)
    return base


def _smooth(bands, h, w):
    y, x = np.mgrid[0:h, 0:w]
    return (
        (np.sin(x / 37.0) * np.cos(y / 23.0) * 20000 + 30000)
        .astype(np.uint16)[None]
        .repeat(bands, axis=0)
    )


@pytest.mark.parametrize("byteorder", ["<", ">"])
@pytest.mark.parametrize("compression", ["none", "deflate"])
def test_bigtiff_roundtrip(byteorder, compression):
    px = _px(1, 200, 300)
    blob = geotiff.geotiff_encode(
        px, (0.0, 0.0, 3.0, 2.0), tile_size=64,
        compression=compression, byteorder=byteorder, bigtiff=True,
    )
    bo = byteorder
    assert struct.unpack_from(f"{bo}H", blob, 2)[0] == 43  # version
    assert struct.unpack_from(f"{bo}H", blob, 4)[0] == 8   # offset size
    assert np.array_equal(geotiff.geotiff_decode(blob), px)


def test_bigtiff_windowed_read_and_geo():
    px = _px(3, 256, 256)
    blob = geotiff.geotiff_encode(
        px, (10.0, 20.0, 12.0, 22.0), epsg=4326, tile_size=64,
        bigtiff=True,
    )
    fetch = RecordingFetch(blob)
    cog = Cog(fetch)
    assert fetch.ranges == [(0, Cog.PREFIX)]  # IFD chain in the prefix
    assert cog.epsg == 4326
    assert cog.extent == pytest.approx((10.0, 20.0, 12.0, 22.0))
    win = cog.read_window(70, 10, 130, 60)
    assert np.array_equal(win, px[:, 10:60, 70:130])


def test_bigtiff_overviews():
    px = _px(1, 512, 512)
    blob = geotiff.geotiff_encode(
        px, (0.0, 0.0, 1.0, 1.0), tile_size=64, bigtiff=True
    )
    cog = Cog(RecordingFetch(blob))
    assert len(cog.ifds) >= 3
    assert np.array_equal(
        geotiff.geotiff_decode(blob, level=2), px[:, ::4, ::4]
    )


@pytest.mark.parametrize("bigtiff", [False, True])
@pytest.mark.parametrize("compression", ["deflate", "packbits", "none"])
def test_predictor2_roundtrip(bigtiff, compression):
    px = _px(3, 130, 190, seed=11)
    blob = geotiff.geotiff_encode(
        px, (0.0, 0.0, 1.9, 1.3), tile_size=64,
        compression=compression, predictor=2, bigtiff=bigtiff,
    )
    assert np.array_equal(geotiff.geotiff_decode(blob), px)
    # windowed read applies the inverse predictor per tile too
    cog = Cog(RecordingFetch(blob))
    win = cog.read_window(33, 47, 150, 111)
    assert np.array_equal(win, px[:, 47:111, 33:150])


def test_predictor2_improves_smooth_compression():
    px = _smooth(1, 512, 512)
    flat = geotiff.geotiff_encode(
        px, (0, 0, 1, 1), tile_size=256, compression="deflate"
    )
    pred = geotiff.geotiff_encode(
        px, (0, 0, 1, 1), tile_size=256, compression="deflate", predictor=2
    )
    assert len(pred) < 0.7 * len(flat)  # differencing must bite


def test_classic_rejects_predictor3_and_unknown():
    px = _px(1, 64, 64)
    with pytest.raises(ValueError):
        geotiff.geotiff_encode(px, (0, 0, 1, 1), predictor=3)
