"""Pipeline JSON AST (plans/pipeline.py, the spark-pipeline S9 role):
an interpreted read->tile->pyramid->write AST must produce the same
layer the direct API calls produce, writes must land readable, and
malformed ASTs (unknown node, type-state mismatch, missing param) must
fail loudly at interpretation time.
"""

from __future__ import annotations

import pytest

from geotrellis_spark.plans.pipeline import PipelineError, run_pipeline


def test_ast_equals_direct_calls(spark, tmp_path):
    from geotrellis_spark import synth
    from geotrellis_spark.operators import tiling
    from geotrellis_spark.sources import iceberg_shape as ice

    wh = str(tmp_path / "wh")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out = run_pipeline(
        spark,
        [
            {"type": "read.synth", "n": 40},
            {"type": "transform.tile", "zoom": 5, "fmt": "png"},
            {"type": "transform.pyramid", "to_zoom": 4},
            {"type": "write.layer", "warehouse": wh, "layer": "images"},
        ],
    )
    assert out["kind"] == "levels" and out["zoom"] == 5
    assert len(out["writes"][0]["snapshots"]) == 2  # z5 + z4

    direct = tiling.tile_images(
        synth.synth_images(spark, 40, partitions=4), 5, 256, fmt="png"
    )
    want = {
        (r["key_col"], r["key_row"]): bytes(r["tile"])
        for r in direct.collect()
    }
    got = {
        (r["key_col"], r["key_row"]): bytes(r["tile"])
        for r in ice.read_tiles(spark, wh, zoom=5).collect()
    }
    assert got == want

    # pyramid level landed too and is non-empty
    assert ice.read_tiles(spark, wh, zoom=4).count() > 0


def test_json_string_input_and_parquet_write(spark, tmp_path):
    p = str(tmp_path / "tiles_pq")
    out = run_pipeline(
        spark,
        f"""[
          {{"type": "read.synth", "n": 20}},
          {{"type": "transform.tile", "zoom": 4}},
          {{"type": "write.parquet", "path": "{p}"}}
        ]""",
    )
    assert out["kind"] == "tiles"
    assert spark.read.parquet(p).count() == out["result"].count()


@pytest.mark.parametrize(
    "ast,msg",
    [
        ([], "non-empty"),
        ([{"type": "transform.tile", "zoom": 3}], "needs an images"),
        (
            [{"type": "read.synth", "n": 5},
             {"type": "transform.pyramid", "to_zoom": 2}],
            "needs a tile layer",
        ),
        ([{"type": "read.synth"}], "requires 'n'"),
        ([{"type": "no.such.node"}], "unknown pipeline node"),
        (
            [{"type": "read.synth", "n": 5},
             {"type": "transform.tile", "zoom": 3},
             {"type": "transform.pyramid", "to_zoom": 9}],
            "> base zoom",
        ),
    ],
)
def test_malformed_asts_fail_loudly(spark, ast, msg):
    with pytest.raises(PipelineError, match=msg):
        run_pipeline(spark, ast)


def test_reproject_node_equals_direct(spark):
    from geotrellis_spark import synth
    from geotrellis_spark.operators import reproject, tiling

    out = run_pipeline(
        spark,
        [
            {"type": "read.synth", "n": 30},
            {"type": "transform.tile", "zoom": 4, "tile_size": 64},
            {"type": "transform.reproject", "to_crs": "webmercator"},
        ],
    )
    assert out["kind"] == "tiles" and out["zoom"] == 4
    direct = reproject.reproject_layer(
        tiling.tile_images(
            synth.synth_images(spark, 30, partitions=4), 4, 64
        ),
        4, "latlng", "webmercator", 64,
    )
    want = {
        (r["key_col"], r["key_row"]): bytes(r["tile"])
        for r in direct.collect()
    }
    got = {
        (r["key_col"], r["key_row"]): bytes(r["tile"])
        for r in out["result"].collect()
    }
    assert got == want and got


def test_reproject_node_utm_and_type_state(spark):
    out = run_pipeline(
        spark,
        [
            {"type": "read.synth", "n": 20},
            {"type": "transform.tile", "zoom": 4, "tile_size": 64},
            {"type": "transform.reproject", "to_crs": "utm:33n"},
        ],
    )
    rows = out["result"].collect()
    assert out["zoom"] == 0 and rows
    assert all(r["layer"].endswith("_utm:33n") for r in rows)

    with pytest.raises(PipelineError, match="needs a tile layer"):
        run_pipeline(
            spark,
            [{"type": "read.synth", "n": 5},
             {"type": "transform.reproject", "to_crs": "webmercator"}],
        )


def test_write_pngs_node(spark, tmp_path):
    """write.pngs: the render sink inside the DSL — PNGs land as
    parquet and equal render_png applied directly."""
    import numpy as np

    from geotrellis_spark import synth
    from geotrellis_spark.core import codecs
    from geotrellis_spark.operators import render, tiling

    path = str(tmp_path / "pngs")
    breaks = [1000, 20000, 40000, 65535]
    colors = [0x0000FFFF, 0x00FF00FF, 0xFF0000FF, 0xFFFFFFFF]
    out = run_pipeline(
        spark,
        [
            {"type": "read.synth", "n": 25},
            {"type": "transform.tile", "zoom": 4, "tile_size": 64},
            {"type": "write.pngs", "path": path,
             "breaks": breaks, "colors": colors},
        ],
    )
    assert out["writes"][0]["levels"] == 1
    got = {
        (r["key_col"], r["key_row"]): bytes(r["png"])
        for r in spark.read.parquet(path).collect()
    }
    cmap = render.ColorMap(breaks, colors)
    direct = render.render_png(
        tiling.tile_images(
            synth.synth_images(spark, 25, partitions=4), 4, 64
        ),
        cmap,
    )
    want = {
        (r["key_col"], r["key_row"]): bytes(r["png"])
        for r in direct.collect()
    }
    assert got == want and got
    # decoded RGBA matches the colormap of the decoded tile
    (kc, kr), png = next(iter(got.items()))
    rgba = codecs.png_decode_rgba(png)
    assert rgba.shape == (64, 64, 4)

    with pytest.raises(PipelineError, match="needs tiles"):
        run_pipeline(spark, [
            {"type": "read.synth", "n": 2},
            {"type": "write.pngs", "path": path, "breaks": [1],
             "colors": [2]},
        ])


def test_documents_flow_nodes(spark, tmp_path):
    """read.documents -> transform.domain_cap -> write.shards: the
    training-data flow through the DSL equals calling the operators
    directly."""
    from geotrellis_spark.operators import sampling

    src = "/root/testdata/sf0.001/documents.parquet"
    path = str(tmp_path / "shards")
    out = run_pipeline(spark, [
        {"type": "read.documents", "path": src},
        {"type": "transform.domain_cap", "max_share_milli": 40,
         "salt": 7},
        {"type": "write.shards", "path": path, "target_tokens": 2000,
         "salt": 3},
    ])
    assert out["kind"] == "docs" and out["writes"][0]["n_shards"] > 1
    docs = spark.read.parquet(src)
    keep = sampling.domain_cap(docs, 40, salt=7).select("doc_id")
    want = sampling.token_shards(docs.join(keep, "doc_id"), 2000, salt=3)
    got = spark.read.parquet(path)
    assert sorted(
        (r["doc_id"], r["shard"]) for r in got.select(
            "doc_id", "shard").collect()
    ) == sorted(
        (r["doc_id"], r["shard"]) for r in want.select(
            "doc_id", "shard").collect()
    )
    with pytest.raises(PipelineError, match="needs a documents"):
        run_pipeline(spark, [
            {"type": "read.synth", "n": 2},
            {"type": "transform.domain_cap", "max_share_milli": 10},
        ])


def test_augment_node(spark, tmp_path):
    """transform.augment == augment_images called directly; type-state
    rejects augmenting a tile layer."""
    from geotrellis_spark import synth
    from geotrellis_spark.operators import multimodal

    out = run_pipeline(spark, [
        {"type": "read.synth", "n": 10},
        {"type": "transform.augment", "crop": 32, "salt": 4},
    ])
    assert out["kind"] == "augmented"
    got = {r["id"]: bytes(r["img"]) for r in out["result"].collect()}
    imgs = synth.synth_images(spark, 10).selectExpr(
        "*", "xxhash64(image_id) as ordinal"
    )
    want = {
        r["id"]: bytes(r["img"])
        for r in multimodal.augment_images(
            imgs, crop=32, salt=4, id_col="image_id",
            ordinal_col="ordinal", bytes_col="bytes",
        ).collect()
    }
    assert got == want and len(got) == 10
    with pytest.raises(PipelineError, match="needs an images"):
        run_pipeline(spark, [
            {"type": "read.synth", "n": 2},
            {"type": "transform.tile", "zoom": 3},
            {"type": "transform.augment", "crop": 8},
        ])
