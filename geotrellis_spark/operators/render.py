"""Tile rendering: ColorMap / ColorRamp -> RGBA PNG tiles.

Reference role: geotrellis.raster.render — ``ColorMap`` (value breaks
-> colors, LessThanOrEqualTo boundary semantics, noDataColor /
fallbackColor options), ``ColorRamp.stops`` interpolation, and
``tile.renderPng(colorMap)``; plus the layer-level PNG sink
(SURVEY §2 S7). Colors are 0xRRGGBBAA ints, the reference's packing.

100 TB shape: rendering is a pure narrow map over the tiles table —
one Arrow-batched stage, no shuffle; a world basemap render is
embarrassingly parallel and the PNG bytes land as a normal column
write.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..core import codecs
from ..core.kernels import NODATA_U16


def _split_rgba(colors: np.ndarray) -> np.ndarray:
    """0xRRGGBBAA ints -> (n, 4) uint8."""
    c = np.asarray(colors, dtype=np.int64)
    return np.stack(
        [(c >> 24) & 0xFF, (c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF],
        axis=-1,
    ).astype(np.uint8)


def color_ramp(stops: list[int], n: int) -> list[int]:
    """ColorRamp.stops(n): interpolate ``stops`` (0xRRGGBBAA) to ``n``
    evenly spaced colors, linear per channel (the reference's ramp
    expansion)."""
    if n < 1 or not stops:
        raise ValueError("need n >= 1 and at least one stop")
    src = _split_rgba(np.array(stops)).astype(np.float64)
    if len(stops) == 1:
        src = np.vstack([src, src])
    t = np.linspace(0.0, len(src) - 1.0, n)
    i0 = np.clip(np.floor(t).astype(np.int64), 0, len(src) - 2)
    frac = (t - i0)[:, None]
    rgba = np.rint(src[i0] * (1 - frac) + src[i0 + 1] * frac).astype(
        np.int64
    )
    return [
        int((r << 24) | (g << 16) | (b << 8) | a) for r, g, b, a in rgba
    ]


class ColorMap:
    """breaks[i] owns values v <= breaks[i] (and > breaks[i-1]) — the
    reference's default LessThanOrEqualTo boundary. Values above the
    last break take ``fallback``; the NoData sentinel takes
    ``nodata_color`` (default fully transparent)."""

    def __init__(
        self,
        breaks: list[int],
        colors: list[int],
        nodata_color: int = 0x00000000,
        fallback: int = 0x00000000,
        nodata: int = NODATA_U16,
    ):
        if len(breaks) != len(colors):
            raise ValueError(
                f"{len(breaks)} breaks need {len(breaks)} colors, "
                f"got {len(colors)}"
            )
        if list(breaks) != sorted(breaks):
            raise ValueError("breaks must be ascending")
        self.breaks = np.asarray(breaks, dtype=np.int64)
        # lookup table: index i = color of break i, index len = fallback
        self.lut = np.vstack(
            [_split_rgba(np.array(colors)), _split_rgba(np.array([fallback]))]
        )
        self.nodata_rgba = _split_rgba(np.array([nodata_color]))[0]
        self.nodata = nodata

    def apply(self, px: np.ndarray) -> np.ndarray:
        """uint16 (h, w) -> RGBA uint8 (h, w, 4), fully vectorized
        (one searchsorted + one gather)."""
        v = np.asarray(px, dtype=np.int64)
        idx = np.searchsorted(self.breaks, v, side="left")
        rgba = self.lut[idx]
        rgba[v == self.nodata] = self.nodata_rgba
        return rgba


def render_png(
    tiles: DataFrame, cmap: ColorMap, tile_col: str = "tile"
) -> DataFrame:
    """renderPng over a tile layer: adds a ``png`` RGBA column. Pure
    narrow map — zero exchanges."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pngs = []
            for i in range(len(pdf)):
                px = codecs.decode_tile(
                    bytes(pdf[tile_col].iloc[i]),
                    int(pdf["w"].iloc[i]),
                    int(pdf["h"].iloc[i]),
                    pdf["fmt"].iloc[i],
                )
                pngs.append(codecs.png_encode_rgba(cmap.apply(px)))
            out = pdf.copy()
            out["png"] = pngs
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in tiles.schema.fields
    ) + ", png binary"
    return tiles.mapInPandas(gen, schema)
