"""Deterministic synthetic ``images`` table (FIXTURES.md §F2).

Exact input_hint schema: (image_id:string, bytes:binary, w:int, h:int,
fmt:string, caption:string, phash:bigint). Generated DISTRIBUTED via
``spark.range(n).mapInPandas`` — each partition regenerates its rows
independently from the ordinal (Philox keyed by i), which is also what
makes per-partition checkpoint/resume testable (no driver-side data).

Geolocation is derived, not stored: lon/lat from the ordinal via the
FIXTURES.md integer-hash formulas, EXCEPT a hot-spot cluster — every
10th image maps into one 0.5 x 0.5 degree box (real spatial skew, the
thing salting + AQE must handle).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .core import codecs, imagery
from .functions import exprs

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)

_ADJ = ("amber", "quiet", "vivid", "rustic", "bright", "mossy", "pale", "stark")
_NOUN = ("harbor", "ridge", "meadow", "canyon", "grove", "delta", "mesa", "fjord")
_SIZES = (64, 128, 256)

HOT_LON, HOT_LAT = exprs.HOT_LON, exprs.HOT_LAT  # hot-spot box corner


def image_lonlat(ordinal: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Derived geolocation: FIXTURES.md hash formulas, with every 10th
    image concentrated into the hot-spot box (exprs.image_lonlat_np —
    the same formula the tiling anchor and the SQL oracles use)."""
    return exprs.image_lonlat_np(ordinal)


def make_row(i: int) -> dict:
    """One deterministic image row (pure python/numpy; used by both the
    Spark generator and the pytest oracle)."""
    w = _SIZES[(i * 7) % 3]
    h = _SIZES[(i * 13) % 3]
    px = imagery.synth_pixels(i, w, h)
    fmt = "png" if i % 3 == 0 else "raw16"
    lon, lat = image_lonlat(np.array([i]))
    caption = (
        f"{_ADJ[i % len(_ADJ)]} {_NOUN[i % len(_NOUN)]} "
        f"at {lon[0]:.3f},{lat[0]:.3f}"
    )
    return {
        "image_id": f"img{i:012d}",
        "bytes": codecs.encode_tile(px, fmt),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": int(imagery.phash64(px)),
    }


def paint_region(
    n: int,
    zoom: int,
    tile_size: int,
    x0: int,
    y0: int,
    w: int,
    h: int,
    pix_cache: dict | None = None,
) -> np.ndarray:
    """Pure-python oracle painter: the global pixel region
    ``[y0:y0+h, x0:x0+w]`` at ``zoom`` as the merged result of the first
    ``n`` deterministic images (T7 first-non-NoData-wins, lower ordinal
    wins). Returns float64 with NaN wherever no image contributed data
    (off-world, uncovered, or NoData hole) — exactly the padded-canvas
    representation the focal stencil consumes. Independent of the Spark
    cut/merge machinery (only shares the anchor formula)."""
    from .operators.tiling import image_anchor

    i = np.arange(n, dtype=np.int64)
    ws = np.array([_SIZES[(k * 7) % 3] for k in range(n)], dtype=np.int64)
    hs = np.array([_SIZES[(k * 13) % 3] for k in range(n)], dtype=np.int64)
    gx, gy = image_anchor(i, ws, hs, zoom, tile_size)
    canvas = np.full((h, w), np.nan)
    for k in range(n):
        ix0, iy0 = int(gx[k]), int(gy[k])
        rx0, rx1 = max(ix0, x0), min(ix0 + int(ws[k]), x0 + w)
        ry0, ry1 = max(iy0, y0), min(iy0 + int(hs[k]), y0 + h)
        if rx0 >= rx1 or ry0 >= ry1:
            continue
        if pix_cache is not None and k in pix_cache:
            px = pix_cache[k]
        else:
            px = imagery.synth_pixels(k, int(ws[k]), int(hs[k]))
            if pix_cache is not None:
                pix_cache[k] = px
        piece = px[ry0 - iy0 : ry1 - iy0, rx0 - ix0 : rx1 - ix0].astype(np.float64)
        view = canvas[ry0 - y0 : ry1 - y0, rx0 - x0 : rx1 - x0]
        win = np.isnan(view) & (piece != 0)  # 0 == NODATA_U16 sentinel
        view[win] = piece[win]
    return canvas


def synth_images(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic images table of ``n`` rows."""
    if partitions is None:
        partitions = max(8, min(64, n // 2000 or 8))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_row(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGES_SCHEMA.fields])

    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        gen, IMAGES_SCHEMA
    )
