"""Vector-tile sink: polygons -> per-cell Mapbox Vector Tile blobs.

Reference role: geotrellis.vectortile layer WRITE (the vector twin of
the raster tile sink; the codec itself lives in core/mvt.py, S8).
Composition:

1. ``spatial.cover_cells(clip=True)`` explodes each polygon to its
   covering layout cells WITH the geometry Sutherland-Hodgman-clipped
   to each cell (the ClipToGrid contract) — so the per-tile payload is
   proportional to geometry INSIDE the tile, never the whole feature.
2. One hash-shuffle groups clipped pieces by cell.
3. A grouped Arrow stage encodes ONE MVT blob per cell via
   ``mvt.encode_mvt`` (which quantizes onto the spec's integer grid;
   clips that collapse to zero area at that resolution drop).

100 TB shape: identical to the raster ingest spine — narrow explode,
single shuffle on cell_id, per-cell work bounded by clipped geometry;
a world-scale basemap build is exactly this plan fanned wider.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..core import geom as G
from ..core import mvt

TILE_SCHEMA = StructType(
    [
        StructField("zoom", IntegerType()),
        StructField("key_col", LongType()),
        StructField("key_row", LongType()),
        StructField("cell_id", LongType()),
        StructField("n_features", LongType()),
        StructField("mvt", BinaryType()),
    ]
)


def cell_extent(key_col: int, key_row: int, zoom: int
                ) -> tuple[float, float, float, float]:
    """World bounds of layout cell (key_col, key_row) at ``zoom`` —
    delegated to the ONE latlng world-grid definition (core/layout.py)
    rather than re-deriving the formula here."""
    from ..core.layout import ZoomedLayoutScheme

    ld = ZoomedLayoutScheme("latlng").level_for_zoom(zoom)
    x0, y0, x1, y1 = ld.key_to_extent(key_col, key_row)
    return (float(x0), float(y0), float(x1), float(y1))


def vector_tiles(
    polys: DataFrame,
    zoom: int,
    extent: int = mvt.EXTENT,
    layer_name: str = "features",
    id_col: str = "geom_id",
    wkb_col: str = "wkb",
) -> DataFrame:
    """Build one MVT blob per covering layout cell from a polygon
    table. Output: (zoom, key_col, key_row, cell_id, n_features, mvt).
    Features keep their ids; degenerate clips (bbox-cover false
    positives, quantization-collapsed slivers) drop before encoding.
    """
    from . import spatial

    cells = spatial.cover_cells(
        polys.select(id_col, wkb_col), zoom, wkb_col, clip=True
    ).where(F.col("clipped_wkb").isNotNull())

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        kc = int(pdf["key_col"].iloc[0])
        kr = int(pdf["key_row"].iloc[0])
        cid = int(pdf["cell_id"].iloc[0])
        text = cell_extent(kc, kr, zoom)
        feats = []
        for i in range(len(pdf)):
            wkb = bytes(pdf["clipped_wkb"].iloc[i])
            _kind, rings = G.wkb_read(wkb)
            # survives quantization? (same grid formula encode_mvt uses)
            if mvt._signed_area(mvt.grid_ring(rings[0], text, extent)) == 0:
                continue
            feats.append({"id": int(pdf[id_col].iloc[i]), "wkb": wkb})
        if not feats:  # every clip collapsed on the integer grid
            return pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in TILE_SCHEMA.fields}
            )
        blob = mvt.encode_mvt(layer_name, feats, text, extent)
        return pd.DataFrame(
            {
                "zoom": [zoom],
                "key_col": [kc],
                "key_row": [kr],
                "cell_id": [cid],
                "n_features": [len(feats)],
                "mvt": [blob],
            }
        )

    return cells.groupBy("cell_id").applyInPandas(encode, TILE_SCHEMA)
