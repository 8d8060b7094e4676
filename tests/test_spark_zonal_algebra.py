"""Zonal/polygonal summaries + layer map algebra + rasterize e2e vs
numpy oracles (reference spec roles: zonal/polygonal summary specs,
``LocalTileRDDMethods`` specs, ``RasterizeRDDSpec`` — SURVEY.md §5)."""

import numpy as np
import pytest

from geotrellis_spark import synth
from geotrellis_spark.core import codecs, geom as G, kernels
from geotrellis_spark.core.layout import ZoomedLayoutScheme
from geotrellis_spark.operators import algebra, tiling, zonal
from tests.test_spark_tiling import oracle_tiles

ZOOM = 3
T = 256
LAYOUT = ZoomedLayoutScheme("latlng", T).level_for_zoom(ZOOM)


@pytest.fixture(scope="module")
def tiles_df(spark):
    images = synth.synth_images(spark, 100, partitions=4)
    df = tiling.tile_images(images, ZOOM, T, salt_buckets=2).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def oracle():
    return oracle_tiles(100, ZOOM, T)


def test_local_scalar_and_binary(spark, tiles_df, oracle):
    plus = algebra.local_scalar_layer(tiles_df, "add", 10)
    got = {
        (r["key_col"], r["key_row"]): codecs.decode_tile(bytes(r["tile"]), T, T, r["fmt"])
        for r in plus.collect()
    }
    for key, canvas in oracle.items():
        expect = kernels.local_binary("add", canvas, 10)
        np.testing.assert_array_equal(got[key], expect, err_msg=str(key))

    # layer + layer: (a+10) - a == 10 where data (and a+10 doesn't
    # clip at the uint16 ceiling), NoData propagates
    diff = algebra.local_binary_layers(plus, tiles_df, "subtract")
    for r in diff.collect():
        tile = codecs.decode_tile(bytes(r["tile"]), T, T, r["fmt"])
        canvas = oracle[(r["key_col"], r["key_row"])]
        data = (canvas != 0) & (canvas <= 65525)
        assert set(np.unique(tile[data])) <= {10}
        assert (tile[canvas == 0] == 0).all()


def test_local_stats_layers(spark, tiles_df):
    doubled = algebra.local_scalar_layer(tiles_df, "multiply", 2)
    mean = algebra.local_stats_layers([tiles_df, doubled], "mean")
    row = mean.limit(1).collect()[0]
    base = {
        (r["key_col"], r["key_row"]): codecs.decode_tile(bytes(r["tile"]), T, T, r["fmt"])
        for r in tiles_df.collect()
    }[(row["key_col"], row["key_row"])]
    got = codecs.decode_tile(bytes(row["tile"]), T, T, row["fmt"])
    data = base != 0
    # mean(x, 2x(clipped)) == 1.5x rounded (rint) where no clipping
    ok = data & (base.astype(np.int64) * 2 <= 65535)
    np.testing.assert_array_equal(
        got[ok], np.rint(base[ok].astype(np.float64) * 1.5).astype(np.uint16)
    )


def test_polygonal_summary(spark, tiles_df, oracle):
    # polygon = exactly tile (4,3) extent at ZOOM (aligned rectangle)
    xmin, ymin, xmax, ymax = LAYOUT.key_to_extent(4, 3)
    ring = np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]], dtype=float
    )
    polys = spark.createDataFrame(
        [(1, bytearray(G.wkb_write_polygon([ring])))], "geom_id long, wkb binary"
    )
    out = zonal.polygonal_summary(tiles_df, polys, LAYOUT, ZOOM).collect()
    canvas = oracle.get((4, 3))
    if canvas is None or (canvas == 0).all():
        assert out == []
        return
    vals = canvas[canvas != 0].astype(np.float64)
    row = {r["geom_id"]: r for r in out}[1]
    assert row["count"] == vals.size
    assert row["sum"] == pytest.approx(vals.sum())
    assert row["min"] == vals.min() and row["max"] == vals.max()
    assert row["mean"] == pytest.approx(vals.mean())


def test_zonal_stats_tiles(spark, tiles_df, oracle):
    # zone layer: constant zone = key parity (derived from the values
    # layer itself so layouts match)
    zones = algebra.local_unary_layer(tiles_df, "defined")  # 1 where data
    out = zonal.zonal_stats_tiles(tiles_df, zones).collect()
    stats = {r["zone"]: r for r in out}
    all_vals = np.concatenate(
        [c[c != 0].astype(np.float64) for c in oracle.values()]
    )
    assert stats[1]["count"] == all_vals.size
    assert stats[1]["sum"] == pytest.approx(all_vals.sum())


def test_rasterize_features(spark):
    # two overlapping aligned rectangles; higher zindex wins
    e1 = LAYOUT.key_to_extent(2, 2)
    half_w = (e1[2] - e1[0]) / 2
    r1 = np.array([[e1[0], e1[1]], [e1[2], e1[1]], [e1[2], e1[3]], [e1[0], e1[3]]])
    r2 = np.array([[e1[0] + half_w, e1[1]], [e1[2], e1[1]],
                   [e1[2], e1[3]], [e1[0] + half_w, e1[3]]])
    feats = spark.createDataFrame(
        [
            (1, 100, 1, bytearray(G.wkb_write_polygon([r1]))),
            (2, 200, 2, bytearray(G.wkb_write_polygon([r2]))),
        ],
        "fid long, burn_value long, zidx long, wkb binary",
    )
    out = algebra.rasterize_features(
        feats, LAYOUT, ZOOM, value_col="burn_value", zindex_col="zidx"
    )
    tiles = {(r["key_col"], r["key_row"]): r for r in out.collect()}
    t22 = codecs.decode_tile(bytes(tiles[(2, 2)]["tile"]), T, T, "raw16")
    # left half = 100, right half = 200 (z-index priority)
    assert (t22[:, : T // 2] == 100).all()
    assert (t22[:, T // 2 :] == 200).all()
