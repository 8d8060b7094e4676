"""Layer reprojection between LatLng and WebMercator (G1).

Reference re-expression (upstream 3.x layout, SURVEY.md §0):
``spark/.../reproject/TileRDDReproject.scala`` +
``raster/.../reproject/RasterRegionReproject.scala``. The reference
buffers tiles, warps per tile, re-keys to the target layout, merges.
Here the shape is target-driven in one shuffle:

1. every source tile computes (numpy, closed-form CRS math) which
   TARGET tiles its extent overlaps and emits one copy per target key
   (the BufferTiles role — the copies ARE the buffer);
2. groupBy(target cell) assembles the source mosaic and inverse-maps
   each target pixel center back to source coordinates, sampling
   bilinear (or NN); first-non-NaN wins across sources.

Closed-form transforms only (WebMercator <-> LatLng); proj4 generality
is out of scope (SURVEY.md §2.G1).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from ..core import codecs, grouped, kernels, sfc
from ..core.layout import (
    ZoomedLayoutScheme,
    lonlat_to_webmercator,
    webmercator_to_lonlat,
)
from .tiling import TILE_SCHEMA

_SRC_SCHEMA = StructType(
    [
        StructField("cell_id", LongType()),       # target cell
        StructField("key_col", LongType()),
        StructField("key_row", LongType()),
        StructField("src_xmin", DoubleType()),    # source-CRS extent
        StructField("src_ymax", DoubleType()),
        StructField("src_cw", DoubleType()),
        StructField("src_ch", DoubleType()),
        StructField("tile", BinaryType()),
        StructField("fmt", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("layer", StringType()),
        StructField("cell_type", StringType()),
    ]
)


def reproject_layer(
    tiles: DataFrame,
    zoom: int,
    from_crs: str = "latlng",
    to_crs: str = "webmercator",
    tile_size: int = 256,
    method: str = "bilinear",
) -> DataFrame:
    """Warp a tile layer to the other CRS's ZoomedLayoutScheme at the
    same zoom. Output layer name gets a ``_{to_crs}`` suffix."""
    if {from_crs, to_crs} != {"latlng", "webmercator"}:
        raise ValueError("supported CRS pair: latlng <-> webmercator")
    src_ld = ZoomedLayoutScheme(from_crs, tile_size).level_for_zoom(zoom)
    dst_ld = ZoomedLayoutScheme(to_crs, tile_size).level_for_zoom(zoom)
    fwd = lonlat_to_webmercator if to_crs == "webmercator" else webmercator_to_lonlat
    inv = webmercator_to_lonlat if to_crs == "webmercator" else lonlat_to_webmercator
    n = 1 << zoom
    T = tile_size

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in _SRC_SCHEMA.fields}
            for i in range(len(pdf)):
                kc, kr = int(pdf["key_col"].iloc[i]), int(pdf["key_row"].iloc[i])
                sxmin, symin, sxmax, symax = (
                    float(x) for x in src_ld.key_to_extent(kc, kr)
                )
                # source extent corners -> target CRS bbox (both CRS are
                # axis-monotone so corners bound the warped extent)
                cx = np.array([sxmin, sxmax, sxmin, sxmax])
                cy = np.array([symin, symin, symax, symax])
                tx, ty = fwd(cx, cy)
                c0, r0, c1, r1 = dst_ld.extent_to_key_range(
                    type(dst_ld.extent)(tx.min(), ty.min(), tx.max(), ty.max())
                )
                for tc in range(c0, min(c1, n - 1) + 1):
                    for tr in range(r0, min(r1, n - 1) + 1):
                        out["cell_id"].append(int(sfc.zorder(tc, tr)))
                        out["key_col"].append(tc)
                        out["key_row"].append(tr)
                        out["src_xmin"].append(sxmin)
                        out["src_ymax"].append(symax)
                        out["src_cw"].append(src_ld.cell_width)
                        out["src_ch"].append(src_ld.cell_height)
                        out["tile"].append(bytes(pdf["tile"].iloc[i]))
                        out["fmt"].append(pdf["fmt"].iloc[i])
                        out["w"].append(int(pdf["w"].iloc[i]))
                        out["h"].append(int(pdf["h"].iloc[i]))
                        out["layer"].append(pdf["layer"].iloc[i])
                        out["cell_type"].append(pdf["cell_type"].iloc[i])
            yield pd.DataFrame(out)

    sample = kernels.bilinear_sample if method == "bilinear" else kernels.nearest_sample

    def warp(cell: int, pdf: pd.DataFrame) -> dict:
        tc, tr = int(pdf["key_col"].iloc[0]), int(pdf["key_row"].iloc[0])
        xs, ys = dst_ld.cell_lattice(tc, tr)
        gx, gy = np.meshgrid(xs, ys)
        slon, slat = inv(gx.ravel(), gy.ravel())  # target centers -> source CRS
        acc = np.full(T * T, np.nan)
        for i in range(len(pdf)):
            src = codecs.decode_tile(
                bytes(pdf["tile"].iloc[i]), int(pdf["w"].iloc[i]),
                int(pdf["h"].iloc[i]), pdf["fmt"].iloc[i],
            )
            u = (slon - pdf["src_xmin"].iloc[i]) / pdf["src_cw"].iloc[i] - 0.5
            v = (pdf["src_ymax"].iloc[i] - slat) / pdf["src_ch"].iloc[i] - 0.5
            vals = sample(src, u, v)
            take = np.isnan(acc) & ~np.isnan(vals)
            acc[take] = vals[take]
        out = np.where(np.isnan(acc), 0.0, np.rint(np.clip(acc, 0, 65535)))
        row = pdf.iloc[0]
        return {
            "layer": f"{row['layer']}_{to_crs}", "zoom": zoom,
            "key_col": tc, "key_row": tr, "cell_id": cell,
            "tile": codecs.encode_tile(out.reshape(T, T).astype(np.uint16),
                                       row["fmt"]),
            "fmt": row["fmt"], "w": T, "h": T,
            "cell_type": row["cell_type"],
        }

    exploded = tiles.mapInPandas(explode, _SRC_SCHEMA)
    return grouped.grouped_rows(exploded, "cell_id", warp, TILE_SCHEMA)
