"""Declarative ingest pipeline: a JSON AST interpreted to engine
calls — the twin of the reference's spark-pipeline module
(geotrellis.spark.pipeline.ast: read -> transform[reproject, tile,
pyramid] -> write, circe-parsed JSON), re-expressed over the
DataFrame stages this engine already has. ``transform.reproject``
covers both ZoomedLayoutScheme pairs (latlng <-> webmercator) and
UTM targets (``to_crs: "utm:33n"`` -> FloatingLayoutScheme fit).

The AST is a JSON list of nodes, each ``{"type": "<verb.kind>", ...}``
applied in order to a single flowing value (images table -> tile
layer -> pyramid levels), e.g.::

    [
      {"type": "read.synth", "n": 500},
      {"type": "transform.tile", "zoom": 6, "fmt": "png"},
      {"type": "transform.pyramid", "to_zoom": 4},
      {"type": "write.layer", "warehouse": "/tmp/wh", "layer": "img"}
    ]

Spark SQL is the real query language of this engine; the pipeline AST
exists for the reference's declarative-ingest parity and for config-
driven jobs (jobs/pipeline.py runs a JSON file). Unknown node types,
missing required params, and type-state mismatches (e.g. pyramid
before tile) fail loudly at interpretation time — the same contract
the reference's typed AST enforces at compile time.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


class PipelineError(ValueError):
    pass


def _req(node: dict, key: str):
    if key not in node:
        raise PipelineError(
            f"node {node.get('type')!r} requires {key!r}"
        )
    return node[key]


def run_pipeline(spark: SparkSession, ast: list[dict] | str) -> dict:
    """Interpret a pipeline AST. Returns a summary dict: the terminal
    state kind, per-write metadata, and the final DataFrame under
    'result' (lazily defined — nothing executes until a write node or
    the caller acts)."""
    from .. import synth
    from ..operators import tiling
    from ..sources import cog_source
    from ..sources import iceberg_shape as ice

    if isinstance(ast, str):
        ast = json.loads(ast)
    if not isinstance(ast, list) or not ast:
        raise PipelineError("pipeline AST must be a non-empty list")

    # raster flow: empty -> images -> tiles -> levels;
    # training-data flow: empty -> docs (domain_cap/shards) and
    # images -> augmented (augment) — parity-plus over the reference's
    # raster-only AST
    state_kind = "empty"
    value = None
    zoom = None
    tile_size = 256
    writes: list[dict] = []

    for i, node in enumerate(ast):
        t = node.get("type")
        if t == "read.synth":
            value = synth.synth_images(spark, int(_req(node, "n")))
            state_kind = "images"
        elif t == "read.parquet":
            value = spark.read.parquet(_req(node, "path"))
            state_kind = "images"
        elif t == "read.layer":
            value = ice.read_tiles(
                spark, _req(node, "warehouse"), zoom=int(_req(node, "zoom"))
            )
            zoom = int(node["zoom"])
            tile_size = int(node.get("tile_size", 256))
            state_kind = "tiles"
        elif t == "read.cogs":
            tile_size = int(node.get("tile_size", 256))
            value = cog_source.read_cog_layer(
                spark,
                _req(node, "path"),
                tuple(_req(node, "extent")),
                int(_req(node, "zoom")),
                tile_size,
            )
            zoom = int(node["zoom"])
            state_kind = "tiles"
        elif t == "read.documents":
            value = spark.read.parquet(_req(node, "path"))
            state_kind = "docs"
        elif t == "transform.domain_cap":
            if state_kind != "docs":
                raise PipelineError(
                    f"transform.domain_cap needs a documents input, "
                    f"have {state_kind} (node {i})"
                )
            from ..operators import sampling

            keep = sampling.domain_cap(
                value,
                int(_req(node, "max_share_milli")),
                salt=int(node.get("salt", 0)),
            ).select("doc_id")
            value = value.join(keep, "doc_id")
            state_kind = "docs"
        elif t == "transform.augment":
            if state_kind != "images":
                raise PipelineError(
                    f"transform.augment needs an images input, have "
                    f"{state_kind} (node {i})"
                )
            from ..operators import multimodal

            # hash-plan ordinal: an explicit integer column when given,
            # the id itself when integral, else a stable hash of the id
            # string — never a format-specific substring that would
            # silently collide on foreign id shapes
            ordc = node.get("ordinal_col")
            imgs = value
            if ordc is None:
                if dict(value.dtypes).get("image_id") in (
                    "tinyint", "smallint", "int", "bigint"
                ):
                    ordc = "image_id"
                else:
                    imgs = value.selectExpr(
                        "*", "xxhash64(image_id) as ordinal"
                    )
                    ordc = "ordinal"
            value = multimodal.augment_images(
                imgs,
                crop=int(_req(node, "crop")),
                salt=int(node.get("salt", 0)),
                id_col="image_id",
                ordinal_col=ordc,
                bytes_col="bytes",
            )
            state_kind = "augmented"
        elif t == "write.shards":
            if state_kind != "docs":
                raise PipelineError(
                    f"write.shards needs a documents input, have "
                    f"{state_kind} (node {i})"
                )
            from ..operators import sampling

            path = _req(node, "path")
            plan = sampling.write_token_shards(
                value, path,
                int(_req(node, "target_tokens")),
                salt=int(node.get("salt", 0)),
            )
            from pyspark.sql import functions as F

            # shards are a contiguous 0..max prefix by construction:
            # one narrow max-agg, not a distinct shuffle + second scan
            writes.append({
                "path": path,
                "n_shards": int(
                    plan.agg(F.max("shard")).collect()[0][0]
                ) + 1,
            })
        elif t == "transform.tile":
            if state_kind != "images":
                raise PipelineError(
                    f"transform.tile needs an images input, have "
                    f"{state_kind} (node {i})"
                )
            zoom = int(_req(node, "zoom"))
            tile_size = int(node.get("tile_size", 256))
            value = tiling.tile_images(
                value,
                zoom,
                tile_size,
                int(node.get("salt_buckets", 8)),
                layer=node.get("layer", "images"),
                fmt=node.get("fmt", "raw16"),
            )
            state_kind = "tiles"
        elif t == "transform.reproject":
            if state_kind != "tiles":
                raise PipelineError(
                    f"transform.reproject needs a tile layer, have "
                    f"{state_kind} (node {i})"
                )
            from ..operators import reproject as rp

            to_crs = str(_req(node, "to_crs")).lower()
            from_crs = str(node.get("from_crs", "latlng")).lower()
            method = node.get("method", "bilinear")
            if to_crs.startswith(("utm:", "polar:")):
                value = rp.reproject_layer_floating(
                    value, zoom, to_crs, from_crs=from_crs,
                    tile_size=tile_size, method=method,
                )
                zoom = 0  # FloatingLayoutScheme output
            else:
                value = rp.reproject_layer(
                    value, zoom, from_crs, to_crs, tile_size, method
                )
            state_kind = "tiles"
        elif t == "transform.pyramid":
            if state_kind != "tiles":
                raise PipelineError(
                    f"transform.pyramid needs a tile layer, have "
                    f"{state_kind} (node {i})"
                )
            to_zoom = int(_req(node, "to_zoom"))
            if to_zoom > zoom:
                raise PipelineError(
                    f"pyramid to_zoom {to_zoom} > base zoom {zoom}"
                )
            value = tiling.build_pyramid(value, zoom, to_zoom, tile_size)
            state_kind = "levels"
        elif t == "write.layer":
            wh = _req(node, "warehouse")
            if state_kind == "tiles":
                snap = ice.write_tiles(value, wh, mode="overwrite")
                writes.append({"warehouse": wh, "snapshots": [snap]})
            elif state_kind == "levels":
                snaps = [
                    ice.write_tiles(lv, wh, mode="overwrite")
                    for _z, lv in value
                ]
                writes.append({"warehouse": wh, "snapshots": snaps})
            else:
                raise PipelineError(
                    f"write.layer needs tiles/levels, have {state_kind}"
                )
        elif t == "write.pngs":
            # the saveAsGeoTiffs/render sink role (S7) inside the DSL:
            # colormap-render every tile to an RGBA PNG column and land
            # (zoom, key_col, key_row, png) as parquet
            if state_kind not in ("tiles", "levels"):
                raise PipelineError(
                    f"write.pngs needs tiles/levels, have {state_kind}"
                )
            from ..operators import render

            cmap = render.ColorMap(
                [int(b) for b in _req(node, "breaks")],
                [int(c) for c in _req(node, "colors")],
                nodata_color=int(node.get("nodata_color", 0)),
                fallback=int(node.get("fallback", 0)),
            )
            dfs = (
                [lv for _z, lv in value] if state_kind == "levels"
                else [value]
            )
            path = _req(node, "path")
            for k, df in enumerate(dfs):
                render.render_png(df, cmap).select(
                    "zoom", "key_col", "key_row", "png"
                ).write.mode("overwrite" if k == 0 else "append").parquet(
                    path
                )
            writes.append({"path": path, "levels": len(dfs)})
        elif t == "write.parquet":
            if state_kind == "empty":
                raise PipelineError(
                    f"write.parquet needs an upstream read (node {i})"
                )
            df = value[-1][1] if state_kind == "levels" else value
            df.write.mode("overwrite").parquet(_req(node, "path"))
            writes.append({"path": node["path"]})
        else:
            raise PipelineError(f"unknown pipeline node type {t!r}")

    result: DataFrame | None
    if state_kind == "levels":
        result = value[-1][1]
    else:
        result = value
    return {"kind": state_kind, "writes": writes, "result": result,
            "zoom": zoom}
