"""Iterative layer ops: cross-tile cost distance (RV5) and layer
viewshed (RV6).

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
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..core import codecs, geom as G, grouped, raster_ops, sfc
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


_VIEWSHED_SCHEMA = StructType(
    [
        StructField("cell_id", LongType()),
        StructField("key_col", LongType()),
        StructField("key_row", LongType()),
        StructField("zoom", IntegerType()),
        StructField("visible", BinaryType()),  # bool (T,T)
    ]
)

_NEEDS_SCHEMA = StructType(
    [
        StructField("tgt_cell", LongType()),
        StructField("tgt_kc", LongType()),
        StructField("tgt_kr", LongType()),
        StructField("src_cell", LongType()),
        # the REQUESTED hull bbox (tile units, layer-relative): canvas
        # bounds must come from here, not from which source tiles
        # happen to exist — a sparse layer otherwise shifts the canvas
        # origin and corrupts every global index into it
        StructField("hull_kc_lo", LongType()),
        StructField("hull_kc_hi", LongType()),
        StructField("hull_kr_lo", LongType()),
        StructField("hull_kr_hi", LongType()),
    ]
)


def layer_viewshed(
    dem_tiles: DataFrame,
    vr: int,
    vc: int,
    observer_height: float = 0.0,
    tile_size: int = 256,
    samples_per_cell: float = 2.0,
    nodata=NODATA_U16,
    max_gather_bytes: int | None = 8 << 30,
) -> DataFrame:
    """Cross-tile viewshed (RV6 layer level; reference role
    ``spark/.../viewshed/IterativeViewshed.scala``). ``(vr, vc)`` is the
    viewpoint pixel in STITCHED layer coordinates (origin = the min
    present key). Returns (cell_id, key_col, key_row, zoom, visible)
    with ``visible`` a bool (T,T) plane, bit-identical to running
    ``raster_ops.viewshed`` on the stitched layer.

    Spark-first shape: instead of the reference's driver-queue ray
    iteration, this is ONE declared shuffle. Every line of sight from
    the eye to a target tile lies inside the convex hull of {eye} and
    the tile's corners, so each target tile gathers exactly the source
    tiles overlapping its (margin-padded) hull, assembles that terrain
    on a local canvas, and runs the same sampled-LOS row kernel as the
    single-array op with GLOBAL coordinates — exact by construction,
    embarrassingly parallel per tile, no per-round driver actions. Cost
    is the hull terrain duplication (~sqrt(n_tiles) x layer bytes for a
    central viewpoint), the price of replacing O(diagonal) iterative
    rounds with one shuffle; absent tiles inside a hull block sight
    (NoData semantics).

    ``max_gather_bytes`` guards that cost cliff: before shuffling any
    terrain, the exact gather list is counted (the enumeration is
    per-tile geometry math, no tile bytes) and the job REFUSES with a
    clear error when the duplicated payload would exceed the budget —
    run on a coarser pyramid zoom (``tiling.pyramid``) or raise the
    budget explicitly instead of silently shuffling ~sqrt(n) x layer
    bytes. ``None`` disables the guard."""
    T = tile_size
    spc = samples_per_cell
    b = dem_tiles.agg(
        F.min("key_col"), F.max("key_col"), F.min("key_row"), F.max("key_row")
    ).collect()[0]
    min_kc, max_kc, min_kr, max_kr = int(b[0]), int(b[1]), int(b[2]), int(b[3])
    W = (max_kc - min_kc + 1) * T
    H = (max_kr - min_kr + 1) * T
    zoom_val = dem_tiles.select("zoom").first()[0]

    def enum_needs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core import geom as G

        for pdf in batches:
            out = {f.name: [] for f in _NEEDS_SCHEMA.fields}
            for i in range(len(pdf)):
                kc, kr = int(pdf["key_col"].iloc[i]), int(pdf["key_row"].iloc[i])
                c0 = (kc - min_kc) * T
                r0 = (kr - min_kr) * T
                pts = np.array(
                    [
                        [float(vc), float(vr)],
                        [c0, r0], [c0 + T - 1, r0],
                        [c0 + T - 1, r0 + T - 1], [c0, r0 + T - 1],
                    ]
                )
                hull = G.convex_hull(pts)
                hx0, hy0 = pts[:, 0].min(), pts[:, 1].min()
                hx1, hy1 = pts[:, 0].max(), pts[:, 1].max()
                kc_lo = max(int((hx0 - 2) // T), 0)
                kc_hi = min(int((hx1 + 2) // T), (W - 1) // T)
                kr_lo = max(int((hy0 - 2) // T), 0)
                kr_hi = min(int((hy1 + 2) // T), (H - 1) // T)
                tgt_cell = int(sfc.zorder(kc, kr))
                for sc in range(kc_lo, kc_hi + 1):
                    for sr in range(kr_lo, kr_hi + 1):
                        rect = (
                            sc * T - 2.0, sr * T - 2.0,
                            (sc + 1) * T + 1.0, (sr + 1) * T + 1.0,
                        )
                        if hull.shape[0] >= 4:  # closed ring, >=3 distinct
                            if G.clip_polygon_to_rect(hull, *rect) is None:
                                continue
                        out["tgt_cell"].append(tgt_cell)
                        out["tgt_kc"].append(kc)
                        out["tgt_kr"].append(kr)
                        out["src_cell"].append(
                            int(sfc.zorder(sc + min_kc, sr + min_kr))
                        )
                        out["hull_kc_lo"].append(kc_lo)
                        out["hull_kc_hi"].append(kc_hi)
                        out["hull_kr_lo"].append(kr_lo)
                        out["hull_kr_hi"].append(kr_hi)
            yield pd.DataFrame(out)

    needs = dem_tiles.select("key_col", "key_row").mapInPandas(
        enum_needs, _NEEDS_SCHEMA
    )
    if max_gather_bytes is not None:
        needs = needs.localCheckpoint()
        # every needs row gathers one TxT source tile onto a target's
        # canvas; the float64 canvas assembly dominates the footprint
        est = needs.count() * T * T * 8
        if est > max_gather_bytes:
            raise ValueError(
                f"layer_viewshed hull gather would duplicate ~{est:,} "
                f"bytes of terrain (> max_gather_bytes={max_gather_bytes:,})"
                "; run on a coarser pyramid level (tiling.pyramid) or "
                "raise max_gather_bytes explicitly"
            )
    joined = needs.join(
        dem_tiles.select(
            F.col("cell_id").alias("src_cell"),
            F.col("key_col").alias("src_kc"),
            F.col("key_row").alias("src_kr"),
            "tile", "fmt",
        ),
        "src_cell",
    )

    def compute(cell: int, pdf: pd.DataFrame) -> dict | None:
        kc = int(pdf["tgt_kc"].iloc[0])
        kr = int(pdf["tgt_kr"].iloc[0])
        src_kc = pdf["src_kc"].to_numpy(np.int64) - min_kc
        src_kr = pdf["src_kr"].to_numpy(np.int64) - min_kr
        row_lo = int(pdf["hull_kr_lo"].iloc[0]) * T
        col_lo = int(pdf["hull_kc_lo"].iloc[0]) * T
        ch = (int(pdf["hull_kr_hi"].iloc[0]) + 1) * T - row_lo
        cw = (int(pdf["hull_kc_hi"].iloc[0]) + 1) * T - col_lo
        canvas = np.full((ch, cw), np.nan)
        for i in range(len(pdf)):
            f = _to_float(
                codecs.decode_tile(
                    bytes(pdf["tile"].iloc[i]), T, T, pdf["fmt"].iloc[i]
                ),
                nodata,
            )
            rr = src_kr[i] * T - row_lo
            cc = src_kc[i] * T - col_lo
            canvas[rr : rr + T, cc : cc + T] = f
        fn = np.where(np.isnan(canvas), np.inf, canvas)
        eye_f = canvas[vr - row_lo, vc - col_lo]
        vis = np.zeros((T, T), dtype=bool)
        r0 = (kr - min_kr) * T
        c0 = (kc - min_kc) * T
        if not np.isnan(eye_f):
            eye = eye_f + observer_height
            cg = c0 + np.arange(T, dtype=np.float64)
            dx = cg - vc
            for rl in range(T):
                rg = r0 + rl
                dy = float(rg - vr)
                dist = np.hypot(dx, dy)
                # row max over the FULL stitched width (hypot of the
                # farther edge column) — keeps n identical to the
                # single-array op
                far = max(float(vc), float(W - 1 - vc))
                n = max(int(np.hypot(far, dy) * spc), 1)
                t = (np.arange(1, n) / n)[:, None]
                sx = vc + t * dx[None, :]
                sy = vr + t * dy
                x0 = np.clip(np.floor(sx).astype(np.int64), 0, W - 2)
                y0 = np.clip(np.floor(sy).astype(np.int64), 0, H - 2)
                fx = sx - x0
                fy = sy - y0
                x0c = x0 - col_lo
                y0c = y0 - row_lo
                w00 = (1 - fy) * (1 - fx)
                w01 = (1 - fy) * fx
                w10 = fy * (1 - fx)
                w11 = fy * fx
                c00, c01 = fn[y0c, x0c], fn[y0c, x0c + 1]
                c10, c11 = fn[y0c + 1, x0c], fn[y0c + 1, x0c + 1]
                nodata_hit = (
                    ((w00 > 0) & np.isinf(c00))
                    | ((w01 > 0) & np.isinf(c01))
                    | ((w10 > 0) & np.isinf(c10))
                    | ((w11 > 0) & np.isinf(c11))
                )
                terrain = (
                    np.where(np.isinf(c00), 0.0, c00) * w00
                    + np.where(np.isinf(c01), 0.0, c01) * w01
                    + np.where(np.isinf(c10), 0.0, c10) * w10
                    + np.where(np.isinf(c11), 0.0, c11) * w11
                )
                trow = canvas[rg - row_lo, c0 - col_lo : c0 - col_lo + T]
                sight = eye + t * (trow[None, :] - eye)
                before = t * dist[None, :] < (dist[None, :] - 0.5)
                blocked = (
                    (nodata_hit | (terrain > sight + 1e-9)) & before
                ).any(axis=0)
                vis[rl, :] = ~blocked & ~np.isnan(trow)
            if r0 <= vr < r0 + T and c0 <= vc < c0 + T:
                vis[vr - r0, vc - c0] = not np.isnan(eye_f)
        return {
            "cell_id": cell,
            "key_col": kc,
            "key_row": kr,
            "zoom": int(zoom_val),
            "visible": vis.tobytes(),
        }

    return grouped.grouped_rows(joined, "tgt_cell", compute, _VIEWSHED_SCHEMA)


_RG_STATE = StructType(
    [
        StructField("cell_id", LongType()),
        StructField("key_col", LongType()),
        StructField("key_row", LongType()),
        StructField("labels", BinaryType()),  # int64 (T,T) local labels
    ]
)

_RG_BORDER = StructType(
    [
        StructField("ekey", LongType()),   # shared-edge id
        StructField("side", IntegerType()),
        StructField("pos", IntegerType()),
        StructField("label", LongType()),  # packed global node id
        StructField("value", LongType()),  # cell value (exact equality)
    ]
)

_LABEL_BITS = 20  # local labels < 2^20 (tile <= 1024x1024)


def _pack_node(cell_id: int, label) -> int:
    return (int(cell_id) << _LABEL_BITS) | int(label)


def region_group_layer(
    tiles: DataFrame,
    tile_size: int = 256,
    connectivity: int = 4,
    nodata=NODATA_U16,
    max_driver_edges: int = 200_000,
    max_iters: int = 64,
) -> DataFrame:
    """RV4 at layer level: connected equal-value regions across tile
    borders (cross-tile dissolve of ``raster_ops.region_group``).

    Shape: (1) one narrow map labels each tile locally and emits its
    4 border runs keyed by the shared edge; (2) a plain equi-join on
    (edge, pos) + value equality yields the cross-tile label adjacency
    graph; (3) the DISTINCT label pairs are dissolved to their
    component minimum node id — on the driver (union-find + broadcast
    root map) only while the edge count stays under
    ``max_driver_edges``; above the guard the dissolve runs fully
    distributed via ``dedup.dedup_clusters`` min-label propagation
    with pointer jumping (O(log diameter) rounds), and the root map is
    shuffled to its owning tiles keyed by cell_id (packed label >>
    label-bits) instead of ever being collected — a 100 TB layer with
    fine-grained regions never puts O(tiles x tile_edge) pairs on the
    driver; (4) one narrow relabel map rewrites each tile. Both paths
    converge to the SAME fixpoint (minimum packed node id per
    component), so region ids are path-independent: the packed
    (cell_id << 20 | local_label) of the component's minimum node —
    deterministic, not dense. connectivity=8 additionally matches
    edge positions +-1 and joins the two diagonal pixel pairs at every
    4-tile corner junction.

    Returns (cell_id, key_col, key_row, labels) with ``labels`` an
    int64 (T,T) plane, 0 = NoData."""
    if connectivity not in (4, 8):  # pragma: no cover
        raise ValueError(connectivity)
    T = tile_size
    spark = tiles.sparkSession

    def label_tiles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in _RG_STATE.fields}
            for i in range(len(pdf)):
                t = codecs.decode_tile(
                    bytes(pdf["tile"].iloc[i]), T, T, pdf["fmt"].iloc[i]
                )
                lab = raster_ops.region_group(t, connectivity, nodata)
                out["cell_id"].append(int(pdf["cell_id"].iloc[i]))
                out["key_col"].append(int(pdf["key_col"].iloc[i]))
                out["key_row"].append(int(pdf["key_row"].iloc[i]))
                out["labels"].append(lab.tobytes())
            yield pd.DataFrame(out)

    state = tiles.mapInPandas(label_tiles, _RG_STATE).localCheckpoint()
    tile_vals = tiles.select("cell_id", "tile", "fmt")
    with_tiles = state.join(tile_vals, "cell_id")

    def borders(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in _RG_BORDER.fields}
            for i in range(len(pdf)):
                kc = int(pdf["key_col"].iloc[i])
                kr = int(pdf["key_row"].iloc[i])
                cid = int(pdf["cell_id"].iloc[i])
                lab = np.frombuffer(
                    bytes(pdf["labels"].iloc[i]), dtype=np.int64
                ).reshape(T, T)
                t = codecs.decode_tile(
                    bytes(pdf["tile"].iloc[i]), T, T, pdf["fmt"].iloc[i]
                ).astype(np.int64)

                def emit(edge_cell, orient, side, labs, vals, dpos=0,
                         at=None):
                    labs = np.atleast_1d(np.asarray(labs))
                    vals = np.atleast_1d(np.asarray(vals))
                    keep = labs > 0
                    if not keep.any():
                        return
                    ek = (int(edge_cell) << 2) | orient
                    ps = (np.nonzero(keep)[0] if at is None
                          else np.atleast_1d(np.asarray(at))[keep])
                    out["ekey"] += [ek] * len(ps)
                    out["side"] += [side] * len(ps)
                    out["pos"] += [int(p) + dpos for p in ps]
                    out["label"] += [
                        _pack_node(cid, v) for v in labs[keep]
                    ]
                    out["value"] += [int(v) for v in vals[keep]]

                # vertical edge between (kc,kr) and (kc+1,kr): key by the
                # LEFT tile; horizontal edge keyed by the TOP tile. For
                # 8-connectivity, side 0 also emits at pos +-1 (diagonal
                # neighbors along the shared edge) and orient=2 carries
                # the two diagonal pairs of each 4-tile corner junction.
                offs = (0,) if connectivity == 4 else (-1, 0, 1)
                for d in offs:
                    emit(sfc.zorder(kc, kr), 0, 0, lab[:, -1], t[:, -1], d)
                    emit(sfc.zorder(kc, kr), 1, 0, lab[-1, :], t[-1, :], d)
                if kc > 0:
                    emit(sfc.zorder(kc - 1, kr), 0, 1, lab[:, 0], t[:, 0])
                if kr > 0:
                    emit(sfc.zorder(kc, kr - 1), 1, 1, lab[0, :], t[0, :])
                if connectivity == 8:
                    # corner junction keyed by its top-left tile: pos 0
                    # pairs TL<->BR, pos 1 pairs TR<->BL
                    emit(sfc.zorder(kc, kr), 2, 0,
                         lab[-1, -1], t[-1, -1], at=[0])
                    if kc > 0:
                        emit(sfc.zorder(kc - 1, kr), 2, 0,
                             lab[-1, 0], t[-1, 0], at=[1])
                    if kr > 0:
                        emit(sfc.zorder(kc, kr - 1), 2, 1,
                             lab[0, -1], t[0, -1], at=[1])
                    if kc > 0 and kr > 0:
                        emit(sfc.zorder(kc - 1, kr - 1), 2, 1,
                             lab[0, 0], t[0, 0], at=[0])
            yield pd.DataFrame(out)

    bdf = with_tiles.mapInPandas(borders, _RG_BORDER)
    a = bdf.where(F.col("side") == 0).select(
        "ekey", "pos", F.col("label").alias("lab_a"), F.col("value").alias("va")
    )
    b = bdf.where(F.col("side") == 1).select(
        "ekey", "pos", F.col("label").alias("lab_b"), F.col("value").alias("vb")
    )
    adj_df = (
        a.join(b, ["ekey", "pos"])
        .where(F.col("va") == F.col("vb"))
        .select("lab_a", "lab_b")
        .distinct()
        .localCheckpoint()
    )

    def relabel_rows(pdf: pd.DataFrame, roots_for) -> pd.DataFrame:
        out = {f.name: [] for f in _RG_STATE.fields}
        for i in range(len(pdf)):
            cid = int(pdf["cell_id"].iloc[i])
            lab = np.frombuffer(
                bytes(pdf["labels"].iloc[i]), dtype=np.int64
            ).reshape(T, T)
            packed = np.where(lab > 0, (cid << _LABEL_BITS) | lab, 0)
            roots = roots_for(pdf, i)
            if roots:
                # one vectorized LUT pass (unique+inverse), not a
                # full-tile mask scan per label
                uniq, inv = np.unique(packed, return_inverse=True)
                mapped = np.array(
                    [
                        roots.get(int(u), int(u)) if u > 0 else 0
                        for u in uniq
                    ],
                    dtype=np.int64,
                )
                packed = mapped[inv].reshape(packed.shape)
            out["cell_id"].append(cid)
            out["key_col"].append(int(pdf["key_col"].iloc[i]))
            out["key_row"].append(int(pdf["key_row"].iloc[i]))
            out["labels"].append(packed.tobytes())
        return pd.DataFrame(out)

    n_edges = adj_df.count()
    if n_edges <= max_driver_edges:
        # small-layer fast path: collect + union-find + broadcast.
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for row in adj_df.collect():
            ra, rb = find(int(row["lab_a"])), find(int(row["lab_b"]))
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo  # min node id wins: deterministic roots
        root_map = {x: find(x) for x in list(parent)}
        bc = spark.sparkContext.broadcast(root_map)

        def relabel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield relabel_rows(pdf, lambda _pdf, _i: bc.value)

        return state.mapInPandas(relabel, _RG_STATE)

    # distributed dissolve: min-label propagation over the label graph
    # (same fixpoint as the union-find: component minimum node id).
    # Each packed node belongs to exactly ONE tile (cell_id is its top
    # bits), so the root map partitions cleanly by tile — one shuffle
    # keyed by cell_id delivers each tile only its own remaps.
    from .dedup import dedup_clusters

    roots_df = dedup_clusters(adj_df, "lab_a", "lab_b", max_iters=max_iters)
    remaps = (
        roots_df.where(F.col("cluster") != F.col("doc_id"))
        .select(
            F.expr(f"doc_id >> {_LABEL_BITS}").alias("cell_id"),
            F.struct(
                F.col("doc_id").alias("node"), F.col("cluster").alias("root")
            ).alias("m"),
        )
        .groupBy("cell_id")
        .agg(F.collect_list("m").alias("remap"))
    )
    state2 = state.join(remaps, "cell_id", "left")

    def relabel_dist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def roots_for(pdf, i):
            rm = pdf["remap"].iloc[i]
            if rm is None or not hasattr(rm, "__len__"):
                return {}
            return {int(x["node"]): int(x["root"]) for x in rm}

        for pdf in batches:
            yield relabel_rows(pdf, roots_for)

    return state2.mapInPandas(relabel_dist, _RG_STATE)


def vectorize_layer_dissolved(
    tiles: DataFrame,
    layout,
    tile_size: int = 256,
    nodata=NODATA_U16,
) -> DataFrame:
    """RV3 at layer level: vectorize with cross-tile region dissolve.
    ``region_group_layer`` stitches the label space; each global region
    then gathers its per-tile masks (one shuffle keyed by region id),
    assembles them on a bbox canvas, and boundary-traces ONCE — so a
    region spanning tiles yields one polygon with no internal tile
    seams. Memory per task is the region's bbox (fine for real-world
    regions; a layer-spanning region degenerates to a single task —
    the same bound the reference's collected vectorize has).

    Returns (region long, value double, wkb binary) in world coords."""
    T = tile_size
    rg = region_group_layer(tiles, T, 4, nodata)
    with_tiles = rg.join(tiles.select("cell_id", "tile", "fmt"), "cell_id")

    _PIECE = StructType(
        [
            StructField("region", LongType()),
            StructField("key_col", LongType()),
            StructField("key_row", LongType()),
            StructField("value", DoubleType()),
            StructField("mask", BinaryType()),  # bool (T,T)
        ]
    )

    def pieces(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in _PIECE.fields}
            for i in range(len(pdf)):
                lab = np.frombuffer(
                    bytes(pdf["labels"].iloc[i]), dtype=np.int64
                ).reshape(T, T)
                t = codecs.decode_tile(
                    bytes(pdf["tile"].iloc[i]), T, T, pdf["fmt"].iloc[i]
                )
                for reg in np.unique(lab[lab > 0]):
                    m = lab == reg
                    rs, cs = np.nonzero(m)
                    out["region"].append(int(reg))
                    out["key_col"].append(int(pdf["key_col"].iloc[i]))
                    out["key_row"].append(int(pdf["key_row"].iloc[i]))
                    out["value"].append(float(t[rs[0], cs[0]]))
                    out["mask"].append(m.tobytes())
            yield pd.DataFrame(out)

    pc = with_tiles.mapInPandas(pieces, _PIECE)

    OUT = StructType(
        [
            StructField("region", LongType()),
            StructField("value", DoubleType()),
            StructField("wkb", BinaryType()),
        ]
    )

    def assemble(region: int, pdf: pd.DataFrame) -> dict:
        kcs = pdf["key_col"].to_numpy(np.int64)
        krs = pdf["key_row"].to_numpy(np.int64)
        kc0, kr0 = int(kcs.min()), int(krs.min())
        ch = (int(krs.max()) - kr0 + 1) * T
        cw = (int(kcs.max()) - kc0 + 1) * T
        canvas = np.zeros((ch, cw), dtype=bool)
        for i in range(len(pdf)):
            m = np.frombuffer(
                bytes(pdf["mask"].iloc[i]), dtype=bool
            ).reshape(T, T)
            rr = (int(krs[i]) - kr0) * T
            cc = (int(kcs[i]) - kc0) * T
            canvas[rr : rr + T, cc : cc + T] = m
        rings = raster_ops.trace_mask_rings(canvas)
        xmin0, _, xmax0, ymax0 = (
            float(v) for v in layout.key_to_extent(kc0, kr0)
        )
        cwp = (xmax0 - xmin0) / T  # world units per pixel
        chp = layout.tile_height / T if hasattr(layout, "tile_height") else cwp
        world = [
            np.column_stack(
                [xmin0 + r[:, 0] * cwp, ymax0 - r[:, 1] * chp]
            )
            for r in rings
        ]
        return {
            "region": region,
            "value": float(pdf["value"].iloc[0]),
            "wkb": G.wkb_write_polygon(world),
        }

    return grouped.grouped_rows(pc, "region", assemble, OUT)


# ------------------------------------------- layer flow accumulation

_FLOW_STATE = StructType(
    [
        StructField("cell_id", LongType()),
        StructField("key_col", LongType()),
        StructField("key_row", LongType()),
        StructField("zoom", IntegerType()),
        StructField("fdir", BinaryType()),  # int32 (T,T) D8 codes
        StructField("inj", BinaryType()),   # int64 (T,T) cross-tile inflow
        StructField("acc", BinaryType()),   # int64 (T,T)
        StructField("changed", IntegerType()),
    ]
)

_FLOW_STRIP = StructType(
    [
        StructField("cell_id", LongType()),
        StructField("key_col", LongType()),
        StructField("key_row", LongType()),
        StructField("zoom", IntegerType()),
        StructField("dx", IntegerType()),
        StructField("dy", IntegerType()),
        StructField("fdir", BinaryType()),
        StructField("units", BinaryType()),  # int64: weight + acc on the strip
        StructField("changed", IntegerType()),
    ]
)


def iterative_flow_accumulation(
    fdir_tiles: DataFrame, tile_size: int = 256, max_iters: int = 64
) -> DataFrame:
    """Layer-level D8 flow accumulation over a tiled direction grid
    (reference role: raster hydrology Accumulation lifted to layers —
    same border-exchange shape as IterativeCostDistance above).

    Jacobi iteration on the tile graph: every round each tile (a)
    re-solves LOCAL accumulation with per-cell weights
    1 + inj (inj = units arriving from other tiles), (b) ships its
    1-pixel border strips of (fdir, 1 + inj + acc) to the 8 neighbors,
    (c) neighbors recompute inj from the strips' cells whose direction
    points into them. inj grows monotonically to the global fixed
    point; after k rounds every flow path crossing <= k tile borders
    is exact. Driver reads ONE number per round (changed-tile count).

    ``fdir_tiles``: (cell_id, key_col, key_row, zoom, fdir) with fdir
    raw int32 (T,T) bytes. Returns the same keys + acc (int64 bytes).
    """
    T = tile_size

    def init(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in _FLOW_STATE.fields}
            for i in range(len(pdf)):
                fd = np.frombuffer(
                    bytes(pdf["fdir"].iloc[i]), dtype=np.int32
                ).reshape(T, T)
                from ..core.kernels import flow_accumulation

                acc = flow_accumulation(fd)
                out["cell_id"].append(int(pdf["cell_id"].iloc[i]))
                out["key_col"].append(int(pdf["key_col"].iloc[i]))
                out["key_row"].append(int(pdf["key_row"].iloc[i]))
                out["zoom"].append(int(pdf["zoom"].iloc[i]))
                out["fdir"].append(fd.tobytes())
                out["inj"].append(np.zeros((T, T), dtype=np.int64).tobytes())
                out["acc"].append(acc.tobytes())
                out["changed"].append(1)
            yield pd.DataFrame(out)

    state = fdir_tiles.mapInPandas(init, _FLOW_STATE).localCheckpoint()

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in _FLOW_STRIP.fields}
            for i in range(len(pdf)):
                kc, kr = int(pdf["key_col"].iloc[i]), int(pdf["key_row"].iloc[i])
                zoom = int(pdf["zoom"].iloc[i])
                n = 1 << zoom
                fd = np.frombuffer(bytes(pdf["fdir"].iloc[i]), np.int32).reshape(T, T)
                acc = np.frombuffer(bytes(pdf["acc"].iloc[i]), np.int64).reshape(T, T)
                units = 1 + acc  # acc already includes pass-through inj
                chg = int(pdf["changed"].iloc[i])

                def emit(tc, tr, dx, dy, f_, u_):
                    out["cell_id"].append(int(sfc.zorder(tc, tr)))
                    out["key_col"].append(tc)
                    out["key_row"].append(tr)
                    out["zoom"].append(zoom)
                    out["dx"].append(dx)
                    out["dy"].append(dy)
                    out["fdir"].append(np.ascontiguousarray(f_).tobytes())
                    out["units"].append(np.ascontiguousarray(u_).tobytes())
                    out["changed"].append(chg)

                emit(kc, kr, 0, 0, fd, units)
                for dx, dy in _DIRS:
                    tc, tr = kc + dx, kr + dy
                    if not (0 <= tc < n and 0 <= tr < n):
                        continue
                    rows = slice(T - 1, T) if dy == 1 else (
                        slice(0, 1) if dy == -1 else slice(0, T))
                    cols = slice(T - 1, T) if dx == 1 else (
                        slice(0, 1) if dx == -1 else slice(0, T))
                    emit(tc, tr, -dx, -dy, fd[rows, cols], units[rows, cols])
            yield pd.DataFrame(out)

    # (dr, dc) per ESRI code, matching core/kernels._D8_OFF
    _code_delta = {1: (0, 1), 2: (1, 1), 4: (1, 0), 8: (1, -1),
                   16: (0, -1), 32: (-1, -1), 64: (-1, 0), 128: (-1, 1)}

    def resolve(cell: int, pdf: pd.DataFrame) -> dict | None:
        from ..core.kernels import flow_accumulation

        ci = pdf.index[(pdf["dx"] == 0) & (pdf["dy"] == 0)]
        if len(ci) == 0:
            return None
        crow = pdf.loc[ci[0]]
        fd = np.frombuffer(bytes(crow["fdir"]), np.int32).reshape(T, T)
        pad_f = np.zeros((T + 2, T + 2), dtype=np.int32)
        pad_u = np.zeros((T + 2, T + 2), dtype=np.int64)
        for i in range(len(pdf)):
            dx, dy = int(pdf["dx"].iloc[i]), int(pdf["dy"].iloc[i])
            h_ = T if dy == 0 else 1
            w_ = T if dx == 0 else 1
            f_ = np.frombuffer(bytes(pdf["fdir"].iloc[i]), np.int32).reshape(h_, w_)
            u_ = np.frombuffer(bytes(pdf["units"].iloc[i]), np.int64).reshape(h_, w_)
            rs = 0 if dy == -1 else (T + 1 if dy == 1 else 1)
            cs = 0 if dx == -1 else (T + 1 if dx == 1 else 1)
            pad_f[rs : rs + h_, cs : cs + w_] = f_
            pad_u[rs : rs + h_, cs : cs + w_] = u_
        # injections: ring cells whose D8 receiver lies inside center
        inj = np.zeros((T, T), dtype=np.int64)
        ring = np.zeros((T + 2, T + 2), dtype=bool)
        ring[0, :] = ring[-1, :] = ring[:, 0] = ring[:, -1] = True
        for code, (dr, dc) in _code_delta.items():
            m = ring & (pad_f == code) & (pad_u > 0)
            if not m.any():
                continue
            rr, cc = m.nonzero()
            tr = rr + dr - 1  # center coords
            tc = cc + dc - 1
            ok = (tr >= 0) & (tr < T) & (tc >= 0) & (tc < T)
            np.add.at(inj, (tr[ok], tc[ok]), pad_u[rr[ok], cc[ok]])
        # acc = strictly-upstream units (local solve, inflow as extra
        # per-cell generation) PLUS inj itself: injected units already
        # passed THROUGH the receiving cell on their way in.
        # change detection compares resulting UNITS (1 + acc) to the
        # center strip's previous units — equivalent to comparing
        # (inj, acc) state, and available without carrying old state.
        acc = flow_accumulation(fd, weights=1 + inj) + inj
        units_new = 1 + acc
        units_old = pad_u[1 : T + 1, 1 : T + 1]
        changed = int(not np.array_equal(units_new, units_old))
        return {
            "cell_id": cell,
            "key_col": int(crow["key_col"]),
            "key_row": int(crow["key_row"]),
            "zoom": int(crow["zoom"]),
            "fdir": fd.tobytes(),
            "inj": inj.tobytes(),
            "acc": acc.tobytes(),
            "changed": changed,
        }

    for _ in range(max_iters):
        strips = state.mapInPandas(explode, _FLOW_STRIP)
        state = grouped.grouped_rows(
            strips, "cell_id", resolve, _FLOW_STATE
        ).localCheckpoint()
        n_changed = state.agg(F.sum("changed")).collect()[0][0]
        if not n_changed:
            return state.select("cell_id", "key_col", "key_row", "zoom", "acc")
    # rounds needed = tile-border crossings of the longest flow path;
    # returning silently would hand back WRONG hydrology
    raise RuntimeError(
        f"iterative_flow_accumulation did not converge in {max_iters} "
        "rounds — raise max_iters (one round per tile-border crossing "
        "of the longest flow path)"
    )


def dem_flow_accumulation(
    dem_tiles: DataFrame, tile_size: int = 256, max_iters: int = 64
) -> DataFrame:
    """Full layer-native hydrology chain: DEM tile layer -> D8 flow
    direction (ONE focal shuffle — direction needs only a 1-px halo)
    -> cross-tile accumulation (border-exchange rounds). Equals the
    whole-array flow_direction + flow_accumulation composition exactly
    (tested on a multi-tile fixture)."""
    from . import tiling

    fdir_tiles = tiling.focal_tiles(
        dem_tiles, "flowdir", radius=1, tile_size=tile_size
    )
    T = tile_size

    def to_state(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"cell_id": [], "key_col": [], "key_row": [],
                   "zoom": [], "fdir": []}
            for i in range(len(pdf)):
                fd = codecs.decode_tile(
                    bytes(pdf["tile"].iloc[i]), T, T, pdf["fmt"].iloc[i]
                ).astype(np.int32)
                out["cell_id"].append(int(pdf["cell_id"].iloc[i]))
                out["key_col"].append(int(pdf["key_col"].iloc[i]))
                out["key_row"].append(int(pdf["key_row"].iloc[i]))
                out["zoom"].append(int(pdf["zoom"].iloc[i]))
                out["fdir"].append(fd.tobytes())
            yield pd.DataFrame(out)

    fd = fdir_tiles.mapInPandas(
        to_state,
        "cell_id long, key_col long, key_row long, zoom int, fdir binary",
    )
    return iterative_flow_accumulation(fd, tile_size, max_iters)
