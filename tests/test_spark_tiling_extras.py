"""Stitch (T8), layer merge (Q4), zoom resample (G4) e2e goldens."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from geotrellis_spark import synth
from geotrellis_spark.core import codecs, kernels, sfc
from geotrellis_spark.operators import tiling
from tests.test_spark_tiling import oracle_tiles

ZOOM, T = 3, 256


@pytest.fixture(scope="module")
def tiles_df(spark):
    images = synth.synth_images(spark, 80, partitions=4)
    df = tiling.tile_images(images, ZOOM, T, salt_buckets=2).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def oracle():
    return oracle_tiles(80, ZOOM, T)


def test_stitch(spark, tiles_df, oracle):
    sub = tiles_df.where(F.col("key_row") == 3)
    world = tiling.stitch(sub, T)
    keys = [k for k in oracle if k[1] == 3]
    c0 = min(k[0] for k in keys)
    for (kc, kr) in keys:
        np.testing.assert_array_equal(
            world[:, (kc - c0) * T : (kc - c0 + 1) * T], oracle[(kc, kr)]
        )


def test_merge_layers_priority(spark, tiles_df, oracle):
    # b = a scaled: merged must equal a where a has data, b elsewhere
    from geotrellis_spark.operators import algebra

    b = algebra.local_scalar_layer(tiles_df, "multiply", 0).withColumn(
        "layer", F.lit("b")
    )
    # multiply by 0 -> all data cells become 0 (= NoData!), so instead
    # use add 1 as the secondary layer
    b = algebra.local_scalar_layer(tiles_df, "add", 1).withColumn(
        "layer", F.lit("b")
    )
    merged = tiling.merge_layers(tiles_df, b, ZOOM, T)
    got = {
        (r["key_col"], r["key_row"]): codecs.decode_tile(bytes(r["tile"]), T, T, r["fmt"])
        for r in merged.collect()
    }
    for key, canvas in oracle.items():
        expect = kernels.merge_first_wins(
            canvas, kernels.local_binary("add", canvas, 1)
        )
        np.testing.assert_array_equal(got[key], expect, err_msg=str(key))


def test_zoom_resample(spark, tiles_df, oracle):
    out = tiling.zoom_resample(tiles_df, ZOOM, ZOOM + 1, T)
    rows = out.where((F.col("key_col") == 8) & (F.col("key_row") == 6)).collect()
    if not rows:
        pytest.skip("no tile at that child key in fixture")
    child = codecs.decode_tile(bytes(rows[0]["tile"]), T, T, rows[0]["fmt"])
    parent = oracle[(4, 3)]
    expect = kernels.resample_nearest(parent[: T // 2, : T // 2], T, T)
    np.testing.assert_array_equal(child, expect)
    assert rows[0]["cell_id"] == int(sfc.zorder(8, 6))
    # count: every parent tile yields exactly 4 children
    assert out.count() == tiles_df.count() * 4
