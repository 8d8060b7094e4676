"""Lossy DCT tile codec (north-rule 'PSNR>=40dB for lossy formats'
per-row invariant). Pure numpy — no Spark session needed."""

import numpy as np
import pytest

from geotrellis_spark.core import codecs, imagery


def _noisy(i, w=200, h=136, hole_frac=0.05, seed=0):
    px = imagery.synth_pixels(i, w, h)
    rng = np.random.default_rng(seed + i)
    px[rng.random(px.shape) < hole_frac] = 0
    return px


def test_psnr_meets_north_rule_on_20_images():
    for i in range(20):
        px = _noisy(i)
        dec = codecs.decode_tile(codecs.encode_tile(px, "dct"), 200, 136, "dct")
        valid = px != 0
        p = imagery.psnr(px[valid].astype(float), dec[valid].astype(float))
        assert p >= 40.0, (i, p)


def test_nodata_mask_bit_exact_and_never_invented():
    px = _noisy(3)
    dec = codecs.dct_decode_gray(codecs.dct_encode_gray(px))
    np.testing.assert_array_equal(dec == 0, px == 0)


def test_all_nodata_and_no_nodata_tiles():
    z = np.zeros((16, 24), dtype=np.uint16)
    assert (codecs.dct_decode_gray(codecs.dct_encode_gray(z)) == 0).all()
    full = np.full((16, 24), 777, dtype=np.uint16)
    dec = codecs.dct_decode_gray(codecs.dct_encode_gray(full))
    assert (dec != 0).all()
    assert imagery.psnr(full.astype(float), dec.astype(float)) >= 40.0


def test_non_multiple_of_8_dims_and_determinism():
    px = _noisy(7, w=203, h=101)
    e1 = codecs.dct_encode_gray(px)
    e2 = codecs.dct_encode_gray(px)
    assert e1 == e2
    dec = codecs.dct_decode_gray(e1)
    assert dec.shape == (101, 203)


def test_compresses_vs_raw16_and_quality_tradeoff():
    # white-noise image: the worst case for transform coding, where
    # the rate/quality trade-off is unambiguous
    rng = np.random.default_rng(1)
    px = rng.integers(1, 65535, (256, 256)).astype(np.uint16)
    enc95 = codecs.dct_encode_gray(px, quality=95)
    enc10 = codecs.dct_encode_gray(px, quality=10)
    assert len(enc95) < px.nbytes
    assert len(enc10) < len(enc95)
    with pytest.raises(ValueError):
        codecs.dct_encode_gray(px, quality=0)


def test_uint16_dynamic_range_preserved():
    # high-amplitude gradient exercising the full 16-bit range
    g = (np.linspace(0, 65535, 64 * 64).reshape(64, 64)).astype(np.uint16)
    g[g == 0] = 1
    dec = codecs.dct_decode_gray(codecs.dct_encode_gray(g))
    assert imagery.psnr(g.astype(float), dec.astype(float)) >= 40.0


def test_tile_images_dct_roundtrip_psnr(spark):
    """The lossy codec through the real pipeline: tile the same images
    as fmt='dct' and fmt='raw16'; every dct tile must decode with
    PSNR >= 40dB vs its lossless twin and an identical NoData mask."""
    from geotrellis_spark import synth
    from geotrellis_spark.operators import tiling

    images = synth.synth_images(spark, 40, partitions=4)
    raw = {
        r["cell_id"]: codecs.decode_tile(bytes(r["tile"]), 256, 256, "raw16")
        for r in tiling.tile_images(images, 5, 256, fmt="raw16").collect()
    }
    lossy = tiling.tile_images(images, 5, 256, fmt="dct").collect()
    assert len(lossy) == len(raw) > 0
    for r in lossy:
        want = raw[r["cell_id"]]
        got = codecs.decode_tile(bytes(r["tile"]), 256, 256, "dct")
        np.testing.assert_array_equal(got == 0, want == 0)
        valid = want != 0
        if valid.any():
            p = imagery.psnr(want[valid].astype(float), got[valid].astype(float))
            assert p >= 40.0, (r["cell_id"], p)


def test_nodata_65535_nudges_down_not_wrap():
    # nodata at the TOP of the range: colliding valid pixels must nudge
    # to 65534, never wrap to 0
    px = np.full((16, 16), 65535, dtype=np.uint16)
    px[0, 0] = 60000  # one valid pixel in a NoData sea -> mean fill
    enc = codecs.dct_encode_gray(px, nodata=65535)
    dec = codecs.dct_decode_gray(enc, nodata=65535)
    np.testing.assert_array_equal(dec == 65535, px == 65535)
    assert dec[0, 0] != 0 and dec[0, 0] != 65535
