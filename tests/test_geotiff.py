"""Cloud-Optimized GeoTIFF codec + raster source.

Codec: round-trip bit-exactness, overview decimation, GeoKey/transform
round-trip, the COG header-first layout contract, and — the point of
the format — that a windowed read fetches ONLY the byte ranges of
internal tiles intersecting the window (proven on recorded ranges).
Source: the Spark windowed-ingest path must produce tiles bit-identical
to the full `tile_images` spine over the same (tile-aligned) extent.

Reference: geotrellis.raster.io.geotiff.GeoTiffReader,
geotrellis.raster.RasterSource windowed reads.
"""

from __future__ import annotations

import numpy as np
import pytest

from geotrellis_spark.core import geotiff
from geotrellis_spark.core.geotiff import Cog, RecordingFetch


def _px(bands: int, h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 65536, size=(bands, h, w), dtype=np.uint16)


@pytest.mark.parametrize("bands", [1, 3])
@pytest.mark.parametrize(
    "compression", ["none", "packbits", "lzw", "deflate"]
)
@pytest.mark.parametrize("byteorder", ["<", ">"])
def test_roundtrip_bit_exact(bands, compression, byteorder):
    px = _px(bands, 200, 130)
    blob = geotiff.geotiff_encode(
        px, (-10.0, 40.0, 3.0, 53.0), epsg=4326, tile_size=64,
        compression=compression, byteorder=byteorder,
    )
    assert np.array_equal(geotiff.geotiff_decode(blob), px)


def test_overviews_are_nearest_decimation():
    px = _px(1, 300, 520)
    blob = geotiff.geotiff_encode(
        px, (0.0, 0.0, 52.0, 30.0), tile_size=64
    )
    cog = Cog(RecordingFetch(blob))
    assert len(cog.ifds) >= 3
    for lv in range(1, len(cog.ifds)):
        expect = px[:, :: 1 << lv, :: 1 << lv]
        assert np.array_equal(geotiff.geotiff_decode(blob, level=lv), expect)
    # chain terminates once a level fits one tile
    last = cog.ifds[-1]
    assert min(last.width, last.height) <= 64


@pytest.mark.parametrize("epsg", [4326, 3857])
def test_geo_tags_roundtrip(epsg):
    px = _px(1, 128, 256)
    ext = (-20037508.0, 0.0, 0.0, 10018754.0) if epsg == 3857 else (
        -180.0, 0.0, 0.0, 90.0
    )
    cog = Cog(RecordingFetch(geotiff.geotiff_encode(px, ext, epsg=epsg)))
    assert cog.epsg == epsg
    assert cog.extent == pytest.approx(ext, rel=1e-12)


def test_cog_layout_header_first_and_single_prefix_fetch():
    """The COG contract: one bounded prefix fetch plans everything —
    parsing the full IFD chain (3+ levels, external DOUBLE/SHORT tag
    values included) never reads past the prefix, and every tile byte
    offset lies beyond the IFD region."""
    px = _px(3, 600, 700)
    blob = geotiff.geotiff_encode(px, (0.0, 0.0, 7.0, 6.0), tile_size=64)
    fetch = RecordingFetch(blob)
    cog = Cog(fetch)
    assert fetch.ranges == [(0, Cog.PREFIX)]
    first_tile = min(o for ifd in cog.ifds for o in ifd.tile_offsets)
    assert first_tile <= Cog.PREFIX  # IFD region is bounded
    # every IFD was parsed from inside the prefix
    assert len(cog.ifds) >= 3


def test_windowed_read_fetches_only_intersecting_tiles():
    px = _px(1, 512, 512)
    blob = geotiff.geotiff_encode(
        px, (0.0, 0.0, 512.0, 512.0), tile_size=64, compression="deflate"
    )
    fetch = RecordingFetch(blob)
    cog = Cog(fetch)
    n_open = len(fetch.ranges)
    win = cog.read_window(100, 130, 200, 190)
    assert np.array_equal(win, px[:, 130:190, 100:200])
    ifd = cog.ifds[0]
    # cols 100..199 -> tx 1..3, rows 130..189 -> ty 2 only: 3 tiles
    want = {
        (ifd.tile_offsets[ty * ifd.ntx + tx], ifd.tile_counts[ty * ifd.ntx + tx])
        for ty in (2,) for tx in (1, 2, 3)
    }
    got = set(fetch.ranges[n_open:])
    assert got == want


def test_window_read_overview_level():
    px = _px(1, 512, 512)
    blob = geotiff.geotiff_encode(px, (0.0, 0.0, 512.0, 512.0), tile_size=64)
    cog = Cog(RecordingFetch(blob))
    lv1 = cog.read_window(10, 20, 70, 60, level=1)
    assert np.array_equal(lv1, px[:, ::2, ::2][:, 20:60, 10:70])


def test_read_extent_exact_on_lattice():
    from geotrellis_spark.sources.cog_source import lattice_extent

    zoom, T = 5, 256
    gx, gy, w, h = 1000, 900, 128, 64
    px = _px(1, h, w)
    ext = lattice_extent(gx, gy, w, h, zoom, T)
    cog = Cog(RecordingFetch(geotiff.geotiff_encode(px, ext, tile_size=64)))
    # query a sub-box, also lattice-aligned
    sub = lattice_extent(gx + 32, gy + 16, 64, 32, zoom, T)
    win, (px0, py0) = cog.read_extent(sub)
    assert (px0, py0) == (32, 16)
    assert np.array_equal(win, px[:, 16:48, 32:96])


def test_malformed_rejects():
    with pytest.raises(ValueError, match="byte-order"):
        Cog(RecordingFetch(b"XX" + b"\x00" * 100))
    px = _px(1, 32, 32)
    from geotrellis_spark.core import tiff

    # strip-organized baseline TIFF (no geo tags) now parses as a
    # striped IFD — the reference reader accepts both segment layouts
    stripped = tiff.tiff_encode(px)
    cog = Cog(RecordingFetch(stripped))
    assert not cog.ifds[0].tiled
    assert np.array_equal(cog.read_window(0, 0, 32, 32), px)
    with pytest.raises(ValueError):
        geotiff.geotiff_encode(px, (0, 0, 1, 1), tile_size=50)  # %16


def test_multimodal_gtiff_decode():
    from geotrellis_spark.operators import multimodal

    for bands in (1, 3):
        px = _px(bands, 96, 80)
        blob = geotiff.geotiff_encode(px, (0.0, 0.0, 8.0, 9.6), tile_size=32)
        out = multimodal.decode_image_multiband(blob, 80, 96, "gtiff", bands)
        assert np.array_equal(out, px)
    px1 = _px(1, 64, 64)
    blob1 = geotiff.geotiff_encode(px1, (0.0, 0.0, 1.0, 1.0), tile_size=32)
    assert np.array_equal(
        multimodal.decode_image(blob1, 64, 64, "gtiff"), px1[0]
    )


def test_spark_cog_layer_matches_full_ingest(spark, tmp_path):
    """End to end: images -> COG catalog -> windowed read -> merged
    layer == the full tile_images spine restricted to the same cells,
    for a tile-aligned query extent."""
    from geotrellis_spark import synth
    from geotrellis_spark.operators import tiling
    from geotrellis_spark.sources import cog_source

    zoom, T, n = 5, 256, 60
    images = synth.synth_images(spark, n, partitions=4)
    store = str(tmp_path / "cogs")
    cog_source.write_cog_store(images, zoom, store, tile_size=T)

    full = {
        (r["key_col"], r["key_row"]): (r["tile"], r["w"], r["h"])
        for r in tiling.tile_images(images, zoom, T).collect()
    }
    assert full, "fixture produced no tiles"
    # tile-aligned window around a populated cell
    kc, kr = sorted(full)[len(full) // 2]
    ext = cog_source.lattice_extent(
        (kc - 1) * T, (kr - 1) * T, 3 * T, 3 * T, zoom, T
    )
    got = tiling.merge_tiles(
        cog_source.cog_window_pieces(
            cog_source.images_to_cogs(images, zoom, T), ext, zoom, T
        ),
        zoom,
        T,
    ).collect()
    assert got, "windowed read produced no tiles"
    for r in got:
        assert (kc - 1) <= r["key_col"] <= (kc + 1)
        assert (kr - 1) <= r["key_row"] <= (kr + 1)
        ref = full[(r["key_col"], r["key_row"])]
        assert (r["tile"], r["w"], r["h"]) == ref

    # the store round-trips through parquet identically
    via_store = cog_source.read_cog_layer(spark, store, ext, zoom, T)
    got2 = {
        (r["key_col"], r["key_row"]): r["tile"] for r in via_store.collect()
    }
    assert got2 == {
        (r["key_col"], r["key_row"]): r["tile"] for r in got
    }


def test_spark_catalog_prune_reaches_parquet(spark, tmp_path):
    """The bbox intersect filter must appear as PushedFilters on the
    parquet scan of the COG catalog (catalog-level prune is free)."""
    import io
    from contextlib import redirect_stdout

    from geotrellis_spark import synth
    from geotrellis_spark.sources import cog_source

    store = str(tmp_path / "cogs")
    cog_source.write_cog_store(
        synth.synth_images(spark, 20, partitions=2), 5, store
    )
    df = spark.read.parquet(store).where(
        cog_source._bbox_filter((0.0, 0.0, 10.0, 10.0))
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    ]
    assert pushed and "LessThan(xmin" in pushed[0]


# ---------------------------------------------------------------- strips

@pytest.mark.parametrize("compression", ["none", "packbits", "lzw",
                                         "deflate"])
def test_striped_roundtrip_bit_exact(compression):
    """Strip-organized GeoTIFF (the reference reader's other segment
    layout): bit-exact round-trip incl. a short last strip (200 rows,
    rps 48 -> 5 strips, last 8 rows)."""
    px = _px(3, 200, 130, seed=9)
    blob = geotiff.geotiff_encode(
        px, (-10.0, 40.0, 3.0, 53.0), epsg=4326, tiled=False,
        rows_per_strip=48, compression=compression, overviews=False,
    )
    assert np.array_equal(geotiff.geotiff_decode(blob), px)


def test_striped_predictor_and_bigtiff():
    rng = np.random.default_rng(4)
    smooth = np.cumsum(
        rng.integers(-2, 3, (1, 96, 200)), axis=2
    ).astype(np.uint16) + 500
    for bigtiff in (False, True):
        blob = geotiff.geotiff_encode(
            smooth, (0.0, 0.0, 20.0, 9.6), tiled=False, rows_per_strip=32,
            predictor=2, bigtiff=bigtiff, overviews=False,
        )
        assert np.array_equal(geotiff.geotiff_decode(blob), smooth)
    # predictor makes deflate bite on the smooth raster
    plain = geotiff.geotiff_encode(
        smooth, (0.0, 0.0, 20.0, 9.6), tiled=False, rows_per_strip=32,
        overviews=False,
    )
    pred = geotiff.geotiff_encode(
        smooth, (0.0, 0.0, 20.0, 9.6), tiled=False, rows_per_strip=32,
        predictor=2, overviews=False,
    )
    assert len(pred) < len(plain)


def test_striped_window_fetches_only_intersecting_strips():
    px = _px(1, 320, 96, seed=11)
    blob = geotiff.geotiff_encode(
        px, (0.0, 0.0, 9.6, 32.0), tiled=False, rows_per_strip=64,
        compression="none", overviews=False,
    )
    fetch = RecordingFetch(blob)
    cog = Cog(fetch)
    fetch.ranges.clear()
    win = cog.read_window(10, 130, 60, 200)  # rows 130-199 -> strips 2,3
    assert np.array_equal(win, px[:, 130:200, 10:60])
    # exactly two data fetches, matching strips 2 and 3's byte ranges
    ifd = cog.ifds[0]
    want = {(ifd.tile_offsets[2], ifd.tile_counts[2]),
            (ifd.tile_offsets[3], ifd.tile_counts[3])}
    assert set(fetch.ranges) == want


def test_striped_overview_chain():
    px = _px(1, 512, 512, seed=13)
    blob = geotiff.geotiff_encode(
        px, (0.0, 0.0, 51.2, 51.2), tiled=False, rows_per_strip=64,
        tile_size=128, overviews=True,
    )
    cog = Cog(RecordingFetch(blob))
    assert len(cog.ifds) == 3  # 512 -> 256 -> 128
    assert cog.ifds[1].width == 256 and not cog.ifds[1].tiled
    lvl1 = cog.read_window(0, 0, 256, 256, level=1)
    assert np.array_equal(lvl1, geotiff.geotiff_decode(blob, level=1))
