"""Iterative layer ops: cross-tile cost distance (RV5).

Re-expression of ``spark/.../costdistance/IterativeCostDistance.scala``
(upstream 3.x layout, SURVEY.md §0): the reference keeps a driver-side
changed-keys queue and re-runs tile Dijkstra until quiescent. Here each
round is ONE Spark job: every tile ships its 1-pixel (cost, friction)
edge strips to its 8 neighbors (the BufferTiles shape), each group
re-runs the seeded Dijkstra on the padded canvas, and a distributed
aggregate counts improved tiles — the driver only reads that one number
per round. Lineage is truncated by localCheckpoint, so rounds stay
O(1) plan-size. Convergence: cost values only decrease and are bounded
below, and each round propagates any improvement at least one tile
outward, so at most O(layout diagonal) rounds run; ``max_iters`` is a
hard guard.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..core import codecs, grouped, raster_ops, sfc
from ..core.kernels import NODATA_U16, _to_float

STATE_SCHEMA = StructType(
    [
        StructField("cell_id", LongType()),
        StructField("key_col", LongType()),
        StructField("key_row", LongType()),
        StructField("zoom", IntegerType()),
        StructField("friction", BinaryType()),  # float64 (T,T)
        StructField("cost", BinaryType()),      # float64 (T,T), inf = unreached
        StructField("changed", IntegerType()),
    ]
)

_STRIP_SCHEMA = StructType(
    [
        StructField("cell_id", LongType()),
        StructField("key_col", LongType()),
        StructField("key_row", LongType()),
        StructField("zoom", IntegerType()),
        StructField("dx", IntegerType()),
        StructField("dy", IntegerType()),
        StructField("friction", BinaryType()),
        StructField("cost", BinaryType()),
        StructField("changed", IntegerType()),
    ]
)

_DIRS = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]


def iterative_cost_distance(
    friction_tiles: DataFrame,
    sources: list[tuple[int, int]],
    tile_size: int = 256,
    max_iters: int = 64,
) -> DataFrame:
    """Accumulated least-cost surface from global source pixels over a
    tiled friction layer. ``sources``: (global_row, global_col) pixels
    at the layer zoom. Returns (cell_id, key_col, key_row, zoom, cost)
    with cost a float64 (T,T) plane (inf = unreachable)."""
    T = tile_size
    src = sorted(sources)

    def init(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in STATE_SCHEMA.fields}
            for i in range(len(pdf)):
                fr = _to_float(
                    codecs.decode_tile(
                        bytes(pdf["tile"].iloc[i]), T, T, pdf["fmt"].iloc[i]
                    ),
                    NODATA_U16,
                )
                kc, kr = int(pdf["key_col"].iloc[i]), int(pdf["key_row"].iloc[i])
                cost = np.full((T, T), np.inf)
                for gr, gc in src:
                    if kr * T <= gr < (kr + 1) * T and kc * T <= gc < (kc + 1) * T:
                        cost[gr - kr * T, gc - kc * T] = 0.0
                out["cell_id"].append(int(pdf["cell_id"].iloc[i]))
                out["key_col"].append(kc)
                out["key_row"].append(kr)
                out["zoom"].append(int(pdf["zoom"].iloc[i]))
                out["friction"].append(fr.tobytes())
                out["cost"].append(cost.tobytes())
                out["changed"].append(1)
            yield pd.DataFrame(out)

    state = friction_tiles.mapInPandas(init, STATE_SCHEMA).localCheckpoint()

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in _STRIP_SCHEMA.fields}
            for i in range(len(pdf)):
                kc, kr = int(pdf["key_col"].iloc[i]), int(pdf["key_row"].iloc[i])
                zoom = int(pdf["zoom"].iloc[i])
                n = 1 << zoom
                fr = np.frombuffer(bytes(pdf["friction"].iloc[i])).reshape(T, T)
                co = np.frombuffer(bytes(pdf["cost"].iloc[i])).reshape(T, T)
                chg = int(pdf["changed"].iloc[i])

                def emit(tc, tr, dx, dy, f_, c_):
                    out["cell_id"].append(int(sfc.zorder(tc, tr)))
                    out["key_col"].append(tc)
                    out["key_row"].append(tr)
                    out["zoom"].append(zoom)
                    out["dx"].append(dx)
                    out["dy"].append(dy)
                    out["friction"].append(np.ascontiguousarray(f_).tobytes())
                    out["cost"].append(np.ascontiguousarray(c_).tobytes())
                    out["changed"].append(chg)

                emit(kc, kr, 0, 0, fr, co)
                for dx, dy in _DIRS:
                    tc, tr = kc + dx, kr + dy
                    if not (0 <= tc < n and 0 <= tr < n):
                        continue
                    rows = slice(T - 1, T) if dy == 1 else (
                        slice(0, 1) if dy == -1 else slice(0, T))
                    cols = slice(T - 1, T) if dx == 1 else (
                        slice(0, 1) if dx == -1 else slice(0, T))
                    emit(tc, tr, -dx, -dy, fr[rows, cols], co[rows, cols])
            yield pd.DataFrame(out)

    def relax(cell: int, pdf: pd.DataFrame) -> dict | None:
        if not pdf["changed"].to_numpy().any():
            # quiescent neighborhood: nothing can improve — skip Dijkstra
            ci = pdf.index[(pdf["dx"] == 0) & (pdf["dy"] == 0)]
            if len(ci) == 0:
                return None
            row = pdf.loc[ci[0]]
            return {
                "cell_id": cell,
                "key_col": int(row["key_col"]),
                "key_row": int(row["key_row"]),
                "zoom": int(row["zoom"]),
                "friction": bytes(row["friction"]),
                "cost": bytes(row["cost"]),
                "changed": 0,
            }
        padf = np.full((T + 2, T + 2), np.nan)
        padc = np.full((T + 2, T + 2), np.inf)
        center = None
        for i in range(len(pdf)):
            dx, dy = int(pdf["dx"].iloc[i]), int(pdf["dy"].iloc[i])
            h_ = T if dy == 0 else 1
            w_ = T if dx == 0 else 1
            fr = np.frombuffer(bytes(pdf["friction"].iloc[i])).reshape(h_, w_)
            co = np.frombuffer(bytes(pdf["cost"].iloc[i])).reshape(h_, w_)
            rs = 0 if dy == -1 else (T + 1 if dy == 1 else 1)
            cs = 0 if dx == -1 else (T + 1 if dx == 1 else 1)
            padf[rs : rs + h_, cs : cs + w_] = fr
            padc[rs : rs + h_, cs : cs + w_] = co
            if dx == 0 and dy == 0:
                center = i
        if center is None:
            return None
        old = np.frombuffer(bytes(pdf["cost"].iloc[center])).reshape(T, T)
        new = raster_ops.cost_distance_seeded(padf, padc)[1 : T + 1, 1 : T + 1]
        improved = bool((new < old - 1e-12).any())
        return {
            "cell_id": cell,
            "key_col": int(pdf["key_col"].iloc[center]),
            "key_row": int(pdf["key_row"].iloc[center]),
            "zoom": int(pdf["zoom"].iloc[center]),
            "friction": bytes(pdf["friction"].iloc[center]),
            "cost": np.ascontiguousarray(np.minimum(new, old)).tobytes(),
            "changed": int(improved),
        }

    for _ in range(max_iters):
        strips = state.mapInPandas(explode, _STRIP_SCHEMA)
        state = grouped.grouped_rows(
            strips, "cell_id", relax, STATE_SCHEMA
        ).localCheckpoint()
        n_changed = state.agg(F.sum("changed")).collect()[0][0]
        if not n_changed:
            break
    return state.select("cell_id", "key_col", "key_row", "zoom", "cost")
