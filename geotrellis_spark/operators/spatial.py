"""Spatial operators: cell assignment, range pruning, PIP join, kNN.

Spark-first re-expression of GeoTrellis join machinery (upstream 3.x
layout, SURVEY.md §0):

- ``assign_cells``      — T1+T12 (``ZoomedLayoutScheme`` keying +
  ``ZSpatialKeyIndex``): key/cell-id columns via a vectorized pandas UDF
  over numpy kernels (north_rule: no per-row Python).
- ``cell_range_filter`` — T13+Q1 (``KeyIndex.indexRanges`` +
  ``LayerQuery``): extent -> exact Z-range list -> ``cell_id BETWEEN``
  predicates that Parquet/Iceberg min-max stats prune on.
- ``pip_join``          — J3/J5 (``ClipToGrid`` + per-cell predicate,
  ``VectorJoin``): cover-cell explode + broadcast equi-join + vectorized
  ray-cast refine. Replaces the reference's partition-wise nested loop
  (``spark/.../join/VectorJoin.scala``) with an equi-join Catalyst can
  plan — the engine's flagship improvement.
- ``knn_join``          — J4 (``KNearestRDD``): H3-style ring expansion
  on the cell grid with the exact-distance stopping guarantee, window
  top-k per query; brute-force fallback guarantees exactness.

Scale notes: points side is never collected; polygon/query sides are
broadcast when small (the common case — matches the reference's
driver-collected geometry pattern) and fall back to shuffle equi-joins
on cell_id otherwise.
"""

from __future__ import annotations

import pandas as pd
import numpy as np
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from ..core import geom as G
from ..core import sfc
from ..functions import exprs

_KEY_STRUCT = StructType(
    [
        StructField("key_col", LongType()),
        StructField("key_row", LongType()),
        StructField("cell_id", LongType()),
    ]
)


def assign_cells(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    zoom: int,
    index: str = "zorder",
    out_prefix: str = "",
    impl: str = "udf",
    udf_once: bool = False,
) -> DataFrame:
    """Add key_col/key_row/cell_id for the LatLng ZoomedLayoutScheme at
    ``zoom``. Two implementations with identical output:

    - ``impl="udf"`` (default): vectorized pandas UDF (Arrow batches ->
      numpy) — the kernel path the driver oracle proves equal to SQL.
    - ``impl="expr"``: pure JVM expressions (the same SQL the oracles
      use) — whole-stage-codegen'd, no python workers; the production
      hot path when key assignment is plumbing rather than the op
      under test (zorder only).

    ``udf_once`` (guide §4.4): mark the keying UDF nondeterministic so
    a downstream filter on its output (cell_range_filter's BETWEEN
    prune) cannot be pushed below the projection and DUPLICATE the
    evaluation — two ArrowEvalPython nodes, every row keyed twice
    (plans/r06/range_query_before.txt; sf1.0 range_query 12.5 -> 3.5s).
    Opt-in, not default: the nondeterminism flag also BLOCKS the
    optimizer from pruning an unused UDF (a filterless consumer that
    only counts keys would start paying the full evaluation), so turn
    it on exactly where a filter consumes the keys. The function is in
    fact deterministic; the flag only forbids cloning/reordering."""
    if impl == "expr" and index == "zorder":
        kc = exprs.key_col_sql(lon_col, zoom)
        kr = exprs.key_row_sql(lat_col, zoom)
        out = df.withColumn(
            f"{out_prefix}key_col", F.expr(kc)
        ).withColumn(f"{out_prefix}key_row", F.expr(kr))
        return out.withColumn(
            f"{out_prefix}cell_id",
            F.expr(
                exprs.zorder_sql(
                    f"{out_prefix}key_col", f"{out_prefix}key_row", zoom
                )
            ),
        )

    @F.pandas_udf(_KEY_STRUCT)
    def keys_udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        col, row = exprs.key_np(
            lon.astype("float64").to_numpy(), lat.astype("float64").to_numpy(), zoom
        )
        if index == "zorder":
            cell = sfc.zorder(col, row)
        elif index == "hilbert":
            cell = sfc.hilbert_xy2d(max(zoom, 1), col, row)
        else:  # pragma: no cover
            raise ValueError(index)
        return pd.DataFrame({"key_col": col, "key_row": row, "cell_id": cell})

    if udf_once:
        keys_udf = keys_udf.asNondeterministic()
    k = f"{out_prefix}_k" if out_prefix else "_k"
    out = df.withColumn(k, keys_udf(F.col(lon_col), F.col(lat_col)))
    for f in ("key_col", "key_row", "cell_id"):
        out = out.withColumn(f"{out_prefix}{f}", F.col(f"{k}.{f}"))
    return out.drop(k)


def s2_assign(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    level: int,
    out_col: str = "s2_cell",
) -> DataFrame:
    """Global S2-style cube-face Hilbert cell id (core/s2cell.py) —
    the pole-free alternative to the lattice key indexes: near-uniform
    cell areas everywhere on the sphere, prefix-nesting parents, and
    contiguous descendant id ranges for scan pruning. One vectorized
    Arrow batch map, zero exchanges."""
    from ..core import s2cell

    @F.pandas_udf(LongType())
    def s2_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            s2cell.s2_cell(
                lon.to_numpy(np.float64), lat.to_numpy(np.float64), level
            )
        )

    return df.withColumn(out_col, s2_udf(F.col(lon_col), F.col(lat_col)))


def s2_range_filter(
    df: DataFrame,
    level: int,
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_col: str = "s2_cell",
) -> DataFrame:
    """Prune-then-refine bbox filter on an S2-keyed table (Q1/T13 on
    the sphere): the box's conservative cell cover (core/s2cell.py)
    collapses to a handful of merged contiguous id ranges — a pure
    codegen'd OR-of-BETWEEN predicate that prunes on the stored cell
    column (sort/partition the table by it and this reaches row-group
    stats) — then the exact lon/lat predicate refines survivors."""
    from ..core import s2cell

    cover = s2cell.s2_cover((lon_min, lat_min, lon_max, lat_max), level)
    out = df.where(_cell_ranges_pred(cover, cell_col))
    return out.where(
        (F.col(lon_col) >= lon_min) & (F.col(lon_col) <= lon_max)
        & (F.col(lat_col) >= lat_min) & (F.col(lat_col) <= lat_max)
    )


def s2_radius_filter(
    df: DataFrame,
    level: int,
    lon: float,
    lat: float,
    radius_deg: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_col: str = "s2_cell",
) -> DataFrame:
    """Radius (spherical-cap) query via S2 prune-then-refine: the
    cap's conservative cell cover (s2_cover_cap) prunes on merged id
    ranges, then the exact haversine predicate (JVM trig expressions,
    codegen'd — no Python in the refine) keeps rows within
    ``radius_deg`` of (lon, lat)."""
    from ..core import s2cell

    if float(radius_deg) < 0.0:
        raise ValueError(f"radius_deg must be >= 0, got {radius_deg}")
    cover = s2cell.s2_cover_cap(lon, lat, radius_deg, level)
    out = df.where(_cell_ranges_pred(cover, cell_col))
    dist_deg = haversine_deg(
        F.lit(float(lon)), F.lit(float(lat)),
        F.col(lon_col), F.col(lat_col),
    )
    return out.where(dist_deg <= float(radius_deg))


def _cell_ranges_pred(cover, cell_col: str):
    """Merged contiguous [lo, hi) id ranges of a cell cover as one
    codegen'd OR-of-BETWEEN Column (shared by every S2 prune path).
    An empty cover yields literal false — nothing can match — rather
    than a None predicate."""
    ranges = sfc.merge_ranges([(int(c), int(c) + 1) for c in cover])
    pred = None
    for lo, hi in ranges:
        p = (F.col(cell_col) >= lo) & (F.col(cell_col) < hi)
        pred = p if pred is None else (pred | p)
    return F.lit(False) if pred is None else pred


def s2_convex_region_filter(
    df: DataFrame,
    level: int,
    ring,
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_col: str = "s2_cell",
) -> DataFrame:
    """Convex-region query via S2 prune-then-refine: the polygon's
    conservative cell cover (s2_cover_polygon) prunes on merged id
    ranges, then the CONVEX refine is the half-plane test — for every
    CCW edge (x0,y0)->(x1,y1), keep rows with
    (x1-x0)*(lat-y0) - (y1-y0)*(lon-x0) >= 0. Pure IEEE multiply/
    subtract: codegen on the JVM AND bit-identical in any engine that
    evaluates the same arithmetic, so the refine needs no float
    margin (unlike trig). Raises on non-convex/CW rings — arbitrary
    polygons go through the pip_join machinery instead."""
    ext = np.asarray(ring, dtype=np.float64)
    if np.array_equal(ext[0], ext[-1]):
        ext = ext[:-1]
    n = len(ext)
    # convexity + CCW check: every consecutive cross product positive
    for k in range(n):
        a, b, c = ext[k], ext[(k + 1) % n], ext[(k + 2) % n]
        cross = (b[0] - a[0]) * (c[1] - a[1]) \
            - (b[1] - a[1]) * (c[0] - a[0])
        if cross <= 0:
            raise ValueError(
                "ring must be strictly convex and CCW; use pip_join "
                "for general polygons"
            )
    from ..core import s2cell

    cover = s2cell.s2_cover_polygon(ext, level)
    out = df.where(_cell_ranges_pred(cover, cell_col))
    pred = None
    for k in range(n):
        x0, y0 = float(ext[k][0]), float(ext[k][1])
        x1, y1 = float(ext[(k + 1) % n][0]), float(ext[(k + 1) % n][1])
        p = (
            (F.lit(x1 - x0) * (F.col(lat_col) - F.lit(y0))
             - F.lit(y1 - y0) * (F.col(lon_col) - F.lit(x0))) >= 0.0
        )
        pred = p if pred is None else (pred & p)
    return out.where(pred)


def haversine_deg(lon1, lat1, lon2, lat2):
    """Great-circle angular distance in degrees between two lon/lat
    Column pairs — pure JVM trig expressions (codegen; the Python twin
    is core/s2cell.angular_distance)."""
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dl = F.radians(lon2 - lon1)
    hav = (
        F.pow(F.sin((p2 - p1) / 2.0), 2.0)
        + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dl / 2.0), 2.0)
    )
    return F.degrees(2.0 * F.asin(F.sqrt(hav)))


def s2_knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    level: int = 6,
    r0_deg: float = 1.0,
    max_rounds: int = 8,
    lon_col: str = "lon",
    lat_col: str = "lat",
    q_id_col: str = "q_id",
    q_lon_col: str = "q_lon",
    q_lat_col: str = "q_lat",
    point_cols: tuple[str, ...] | None = None,
    cell_col: str = "s2_cell",
) -> DataFrame:
    """Exact k-nearest-neighbors ON THE SPHERE (haversine angular
    distance) — the J4 operator re-expressed with S2 cap covers, which
    makes it correct at the poles and across the antimeridian where
    the planar ``knn_join``'s degree metric and grid rings are wrong.

    Per round the cap radius doubles (r0, 2*r0, ...): every pending
    query's conservative cap cover at ``level`` is generated by ONE
    distributed mapInPandas explode, joined to the S2-keyed points in
    ONE broadcast equi-join on the cell id, and ranked by ONE window.
    Stopping rule: the cover is a SUPERSET of the cap, so once a query
    holds k candidates with kth-distance <= r no point outside the cap
    (all at distance > r) can displace them — exactness is a cover
    property, not a metric approximation. Covers of successive rounds
    overlap, so pending queries are re-covered fresh each round (no
    union of disjoint rings); satisfied queries freeze their top-k and
    leave the loop. Queries still pending after ``max_rounds`` fall
    back to one brute-force pass — exactness is unconditional.

    The queries side is never collected (driver work per round is one
    count); the cover explode is Python per QUERY row (bounded by the
    small queries side), never per point. ``points`` must not already
    carry a ``cell_id`` column (the cover join binds that name).
    Returns: q_id, point columns, dist (degrees), rank.
    """
    from pyspark.sql.window import Window

    from ..core import s2cell

    points = s2_assign(points, lon_col, lat_col, level,
                       out_col=cell_col).cache()
    if point_cols is None:
        point_cols = tuple(
            c for c in points.columns if c != cell_col
        )
    tie_col = point_cols[0]

    qk = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_lon_col).alias("q_lon"),
        F.col(q_lat_col).alias("q_lat"),
    )
    qid_type = qk.schema["q_id"].dataType.simpleString()
    cov_schema = (
        f"q_id {qid_type}, q_lon double, q_lat double, cell_id long"
    )
    pending = qk.localCheckpoint(eager=False)

    dist = haversine_deg(
        F.col("q_lon"), F.col("q_lat"), F.col(lon_col), F.col(lat_col)
    )
    win = Window.partitionBy("q_id").orderBy(
        F.col("dist").asc(), F.col(tie_col).asc()
    )

    def cap_cells(df: DataFrame, radius: float) -> DataFrame:
        def gen(batches):
            for pdf in batches:
                for i in range(len(pdf)):
                    cells = s2cell.s2_cover_cap(
                        float(pdf["q_lon"].iloc[i]),
                        float(pdf["q_lat"].iloc[i]),
                        radius, level,
                    )
                    out = pdf.iloc[[i] * len(cells)].reset_index(
                        drop=True
                    )[["q_id", "q_lon", "q_lat"]]
                    out["cell_id"] = cells
                    yield out

        return df.mapInPandas(gen, cov_schema)

    results = None
    n_pending = pending.count()
    for t in range(max_rounds):
        if n_pending == 0:
            break
        r = r0_deg * (2.0 ** t)
        cand = points.join(
            F.broadcast(cap_cells(pending, r)),
            points[cell_col] == F.col("cell_id"),
        )
        ranked = (
            cand.select("q_id", *point_cols, dist.alias("dist"))
            .withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .localCheckpoint(eager=False)
        )
        stats = ranked.groupBy("q_id").agg(
            F.count("*").alias("cnt"), F.max("dist").alias("kth")
        )
        done = stats.where(
            (F.col("cnt") >= k) & (F.col("kth") <= r)
        ).select("q_id")
        frozen = ranked.join(done, "q_id")
        results = (
            frozen if results is None else results.unionByName(frozen)
        ).localCheckpoint(eager=False)
        pending = pending.join(done, "q_id", "left_anti").localCheckpoint(
            eager=False
        )
        n_pending = pending.count()

    if n_pending > 0:
        brute = (
            points.crossJoin(F.broadcast(pending))
            .select("q_id", *point_cols, dist.alias("dist"))
            .withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
        )
        results = (
            brute if results is None else results.unionByName(brute)
        )
    if results is None:  # empty queries side
        spark = points.sparkSession
        types = {f.name: f.dataType.simpleString()
                 for f in points.schema.fields}
        fields = ", ".join(f"`{c}` {types[c]}" for c in point_cols)
        return spark.createDataFrame(
            [], f"q_id {qid_type}, {fields}, dist double, rank int"
        )
    return results.select("q_id", *point_cols, "dist", "rank")


def cell_range_filter(
    df: DataFrame,
    zoom: int,
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
    cell_col: str = "cell_id",
    max_ranges: int = 64,
    key_col: str = "key_col",
    key_row: str = "key_row",
) -> DataFrame:
    """Prune-then-refine (Q1/T13): coarse Z-range BETWEEN predicates
    (what Parquet/Iceberg min-max stats skip on; capped at
    ``max_ranges`` so wide rectangles coalesce with false positives)
    plus the exact key-rectangle refine predicate — both ordinary
    Catalyst predicates, both pushed to the scan."""
    n = 1 << zoom
    c0 = int(np.clip(np.floor((lon_min + 180.0) / 360.0 * n), 0, n - 1))
    c1 = int(np.clip(np.floor((lon_max + 180.0) / 360.0 * n), 0, n - 1))
    r0 = int(np.clip(np.floor((90.0 - lat_max) / 180.0 * n), 0, n - 1))
    r1 = int(np.clip(np.floor((90.0 - lat_min) / 180.0 * n), 0, n - 1))
    ranges = sfc.zorder_ranges(c0, c1, r0, r1, max_ranges=max_ranges)
    pred: Column = F.lit(False)
    for lo, hi in ranges:
        pred = pred | F.col(cell_col).between(lo, hi)
    refine = (
        F.col(key_col).between(c0, c1) & F.col(key_row).between(r0, r1)
    )
    return df.where(pred & refine)


def cover_cells(
    polys: DataFrame,
    zoom: int,
    wkb_col: str = "wkb",
    clip: bool = False,
    bbox: bool = False,
) -> DataFrame:
    """Explode polygons to their covering cells at ``zoom`` (bbox cover;
    ClipToGrid's cell enumeration). Output: input columns + key_col/
    key_row/cell_id, one row per (polygon, covering cell). Fully
    vectorized explode (numpy repeat/cumsum — no per-row python in the
    hot path; only the bbox header parse is per polygon).

    ``clip=True`` additionally emits ``clipped_wkb`` — each ring
    Sutherland–Hodgman-clipped to the cell extent (ClipToGrid's per-cell
    clip, the J5 ``vector_cells`` contract): downstream refine work is
    then proportional to the geometry INSIDE the cell, not the whole
    polygon. NULL where the exterior ring vanishes (bbox-cover false
    positive)."""
    n = 1 << zoom
    extra = [
        StructField("key_col", LongType()),
        StructField("key_row", LongType()),
        StructField("cell_id", LongType()),
    ]
    if bbox:
        from pyspark.sql.types import DoubleType

        extra += [
            StructField("bbox_xmin", DoubleType()),
            StructField("bbox_ymin", DoubleType()),
            StructField("bbox_xmax", DoubleType()),
            StructField("bbox_ymax", DoubleType()),
        ]
    if clip:
        from pyspark.sql.types import BinaryType

        extra.append(StructField("clipped_wkb", BinaryType()))
    schema = StructType(polys.schema.fields + extra)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            wkbs = [bytes(b) for b in pdf[wkb_col]]
            bb = np.array([G.polygon_bbox(b) for b in wkbs], dtype=np.float64)
            c0 = np.clip(np.floor((bb[:, 0] + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
            c1 = np.clip(np.floor((bb[:, 2] + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
            r0 = np.clip(np.floor((90.0 - bb[:, 3]) / 180.0 * n), 0, n - 1).astype(np.int64)
            r1 = np.clip(np.floor((90.0 - bb[:, 1]) / 180.0 * n), 0, n - 1).astype(np.int64)
            nrows = r1 - r0 + 1
            ncell = (c1 - c0 + 1) * nrows
            total = int(ncell.sum())
            idx = np.repeat(np.arange(len(pdf)), ncell)
            offs = np.concatenate(([0], np.cumsum(ncell)[:-1]))
            j = np.arange(total) - np.repeat(offs, ncell)  # local cell ordinal
            cols = c0[idx] + j // nrows[idx]
            rows = r0[idx] + j % nrows[idx]
            out = pdf.iloc[idx].reset_index(drop=True)
            out["key_col"] = cols
            out["key_row"] = rows
            out["cell_id"] = sfc.zorder(cols, rows)
            if bbox:
                out["bbox_xmin"] = bb[idx, 0]
                out["bbox_ymin"] = bb[idx, 1]
                out["bbox_xmax"] = bb[idx, 2]
                out["bbox_ymax"] = bb[idx, 3]
            if clip:
                # Batched per POLYGON, not per (polygon, cell): each of
                # the polygon's rings is Sutherland–Hodgman-clipped
                # against ALL its cover cells in one vectorized pass
                # (core.geom.clip_ring_to_rects_batch); only the WKB
                # serialization of surviving rings remains per cell.
                xmin_a = -180.0 + cols * 360.0 / n
                xmax_a = -180.0 + (cols + 1) * 360.0 / n
                ymax_a = 90.0 - rows * 180.0 / n
                ymin_a = 90.0 - (rows + 1) * 180.0 / n
                clipped: list = [None] * total
                for ri in range(len(pdf)):
                    lo = int(offs[ri])
                    hi = lo + int(ncell[ri])
                    if hi == lo:
                        continue
                    kind, payload = G.wkb_read(wkbs[ri])
                    rings_in = (
                        payload if kind == "polygon"
                        else [r for poly in payload for r in poly]
                    )
                    per_cell: list[list] = [[] for _ in range(hi - lo)]
                    for rg in rings_in:
                        pts, cnts = G.clip_ring_to_rects_batch(
                            rg, xmin_a[lo:hi], ymin_a[lo:hi],
                            xmax_a[lo:hi], ymax_a[lo:hi],
                        )
                        for j in np.nonzero(cnts > 0)[0]:
                            ring = pts[j, : cnts[j]]
                            per_cell[j].append(
                                np.vstack([ring, ring[:1]])
                            )
                    for j, rings in enumerate(per_cell):
                        if rings:
                            clipped[lo + j] = G.wkb_write_polygon(rings)
                out["clipped_wkb"] = clipped
            yield out

    return polys.mapInPandas(gen, schema)


@F.pandas_udf(BooleanType())
def _pip_udf(lon: pd.Series, lat: pd.Series, wkb: pd.Series) -> pd.Series:
    """Vectorized ray-cast PIP refine.

    Fast path: when the batch's distinct geometries are all single-ring
    polygons with a common vertex count (the overwhelmingly common
    shape after cover-cell clipping), the whole batch is evaluated in
    ONE numpy pass — each row against its own ring, no per-group python
    loop (which was steal/GIL-sensitive and 2-3x noisier). Other
    geometries fall back to per-group ray casting."""
    out = np.zeros(len(lon), dtype=bool)
    px = lon.to_numpy(dtype=np.float64)
    py = lat.to_numpy(dtype=np.float64)
    codes, uniques = pd.factorize(wkb)
    parsed = [G.wkb_read(bytes(w)) for w in uniques]
    simple = [
        i for i, (kind, payload) in enumerate(parsed)
        if kind == "polygon" and len(payload) == 1
    ]
    by_nv: dict[int, list[int]] = {}
    for i in simple:
        ring = parsed[i][1][0]
        closed = np.array_equal(ring[0], ring[-1])
        by_nv.setdefault((ring.shape[0], closed), []).append(i)
    handled = np.zeros(len(uniques), dtype=bool)
    for (nv, closed), idxs in by_nv.items():
        rings = np.stack(
            [
                parsed[i][1][0] if closed
                else np.vstack([parsed[i][1][0], parsed[i][1][0][:1]])
                for i in idxs
            ]
        )
        lut = np.full(len(uniques), -1, dtype=np.int64)
        lut[idxs] = np.arange(len(idxs))
        m = lut[codes] >= 0
        if m.any():
            out[m] = G.points_in_own_polygon(px[m], py[m], rings[lut[codes[m]]])
        handled[idxs] = True
    for gi in np.nonzero(~handled)[0]:
        m = codes == gi
        out[m] = G.points_in_polygon(px[m], py[m], bytes(uniques[gi]))
    return pd.Series(out)


def _pip_by_ord(bc):
    """Refine UDF for the broadcast path: rows carry only the polygon
    ordinal; geometry comes from the broadcast variable. Same fast
    path as _pip_udf (whole-batch vectorized single-ring PIP)."""

    @F.pandas_udf(BooleanType())
    def refine(lon: pd.Series, lat: pd.Series, ordn: pd.Series) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        px = lon.to_numpy(dtype=np.float64)
        py = lat.to_numpy(dtype=np.float64)
        codes = ordn.to_numpy(dtype=np.int64)
        wkbs = bc.value
        uniq = np.unique(codes)
        parsed = {int(u): G.wkb_read(wkbs[int(u)]) for u in uniq}
        by_nv: dict[tuple, list[int]] = {}
        other: list[int] = []
        for u, (kind, payload) in parsed.items():
            if kind == "polygon" and len(payload) == 1:
                ring = payload[0]
                closed = bool(np.array_equal(ring[0], ring[-1]))
                by_nv.setdefault((ring.shape[0], closed), []).append(u)
            else:
                other.append(u)
        for (nv, closed), us in by_nv.items():
            rings = np.stack(
                [
                    parsed[u][1][0] if closed
                    else np.vstack([parsed[u][1][0], parsed[u][1][0][:1]])
                    for u in us
                ]
            )
            lut = np.full(int(codes.max()) + 1, -1, dtype=np.int64)
            lut[np.asarray(us)] = np.arange(len(us))
            pos = lut[codes]
            m = pos >= 0
            if m.any():
                out[m] = G.points_in_own_polygon(px[m], py[m], rings[pos[m]])
        for u in other:
            m = codes == u
            out[m] = G.points_in_polygon(px[m], py[m], wkbs[u])
        return pd.Series(out)

    return refine


def pip_join(
    points: DataFrame,
    polys: DataFrame,
    zoom: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    wkb_col: str = "wkb",
    broadcast_polys: bool = True,
    points_have_cells: bool = False,
    max_broadcast_polys: int = 100_000,
    max_broadcast_cells: int = 4_000_000,
) -> DataFrame:
    """Point-in-polygon join: equi-join on covering cell_id, a pushed
    JVM-side bbox prefilter (kills the ~4x bbox-cover false-positive
    explosion BEFORE any python runs — whole-stage-codegen comparisons),
    then exact vectorized ray-cast refine. Returns points columns +
    polygon columns (minus wkb) for each containing polygon.

    Broadcast path (small polygon side — the reference's driver-
    collected geometry pattern): geometries travel ONCE as a Spark
    broadcast variable; the refine UDF receives only an int polygon
    ordinal per row, so per-row Arrow traffic is 8 bytes instead of the
    whole WKB (measured ~3x on complex polygons). The path is SIZE-
    GUARDED: more than ``max_broadcast_polys`` polygons, or a cover-cell
    enumeration exceeding ``max_broadcast_cells`` (e.g. a continent-
    sized polygon at high zoom), automatically falls back to the
    distributed path — nothing unbounded ever sits on the driver. The
    distributed path (broadcast_polys=False) keeps WKB columns
    end-to-end."""
    if not points_have_cells:
        points = assign_cells(points, lon_col, lat_col, zoom, impl="expr")
    rows = None
    if broadcast_polys:
        # one driver action guards AND fetches: collect limit+1 rows —
        # a separate count() would evaluate the polys plan twice
        rows = polys.limit(max_broadcast_polys + 1).collect()
        if len(rows) > max_broadcast_polys:
            broadcast_polys = False  # too many polygons for the driver
            rows = None
    if broadcast_polys:
        spark = points.sparkSession
        other_cols = [c for c in polys.columns if c != wkb_col]
        wkbs = [bytes(r[wkb_col]) for r in rows]
        n = 1 << zoom
        bb = np.array(
            [G.polygon_bbox(w) for w in wkbs], dtype=np.float64
        ).reshape(-1, 4)
        c0 = np.clip(np.floor((bb[:, 0] + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
        c1 = np.clip(np.floor((bb[:, 2] + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
        r0 = np.clip(np.floor((90.0 - bb[:, 3]) / 180.0 * n), 0, n - 1).astype(np.int64)
        r1 = np.clip(np.floor((90.0 - bb[:, 1]) / 180.0 * n), 0, n - 1).astype(np.int64)
        nrows = r1 - r0 + 1
        ncell = (c1 - c0 + 1) * nrows
        total = int(ncell.sum())
        if total > max_broadcast_cells:
            broadcast_polys = False  # enumeration too big for the driver
        else:
            bc = spark.sparkContext.broadcast(wkbs)
            # vectorized cell enumeration (repeat/cumsum — the
            # cover_cells trick, no driver-side double for loop)
            idx = np.repeat(np.arange(len(rows)), ncell)
            offs = np.concatenate(([0], np.cumsum(ncell)[:-1]))
            j = np.arange(total) - np.repeat(offs, ncell)
            cols = c0[idx] + j // nrows[idx]
            rws = r0[idx] + j % nrows[idx]
            # explicit index: with zero other_cols a bare dict frame
            # has 0 rows and .iloc[idx] would raise out-of-bounds
            base = pd.DataFrame(
                {c: [r[c] for r in rows] for c in other_cols},
                index=range(len(rows)),
            )
            cell_pdf = base.iloc[idx].reset_index(drop=True)
            cell_pdf["cell_id"] = sfc.zorder(cols, rws)
            cell_pdf["_poly_ord"] = idx.astype(np.int32)
            cell_pdf["bbox_xmin"] = bb[idx, 0]
            cell_pdf["bbox_ymin"] = bb[idx, 1]
            cell_pdf["bbox_xmax"] = bb[idx, 2]
            cell_pdf["bbox_ymax"] = bb[idx, 3]
    if broadcast_polys:
        cells_schema = ", ".join(
            [
                f"{c} {polys.schema[c].dataType.simpleString()}"
                for c in other_cols
            ]
            + [
                "cell_id long", "_poly_ord int", "bbox_xmin double",
                "bbox_ymin double", "bbox_xmax double", "bbox_ymax double",
            ]
        )
        cells = F.broadcast(spark.createDataFrame(cell_pdf, cells_schema))
        joined = points.join(cells, "cell_id", "inner").where(
            F.col(lon_col).between(F.col("bbox_xmin"), F.col("bbox_xmax"))
            & F.col(lat_col).between(F.col("bbox_ymin"), F.col("bbox_ymax"))
        )
        refined = joined.where(
            _pip_by_ord(bc)(F.col(lon_col), F.col(lat_col), F.col("_poly_ord"))
        )
        return refined.drop(
            "_poly_ord", "bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"
        )
    cells = cover_cells(polys, zoom, wkb_col, bbox=True).drop(
        "key_col", "key_row"
    )
    joined = points.join(cells, "cell_id", "inner").where(
        F.col(lon_col).between(F.col("bbox_xmin"), F.col("bbox_xmax"))
        & F.col(lat_col).between(F.col("bbox_ymin"), F.col("bbox_ymax"))
    )
    refined = joined.where(_pip_udf(F.col(lon_col), F.col(lat_col), F.col(wkb_col)))
    return refined.drop(
        wkb_col, "bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"
    )


def vector_join(
    a: DataFrame,
    b: DataFrame,
    zoom: int,
    a_id: str = "a_id",
    b_id: str = "b_id",
    a_wkb: str = "wkb",
    b_wkb: str = "wkb",
    broadcast_b: bool = True,
) -> DataFrame:
    """General vector x vector intersects join (J2, the reference's
    ``spark/.../join/VectorJoin.scala`` partition-wise nested loop
    re-expressed): both sides explode to covering cells, equi-join on
    cell_id (Catalyst-plannable; broadcast the small side), de-dupe the
    (a_id, b_id) candidates that co-occur in several cells — on the id
    pair ONLY, so the dedup shuffle never carries WKB binaries — then
    re-attach geometry (a side by equi-join, b side by broadcast) and
    refine with the exact geom x geom intersects predicate, evaluated
    as ONE batched numpy pass per Arrow batch
    (core.geom.polygons_intersect_batch — no per-pair python).
    Output: a_id, b_id."""
    ca = cover_cells(a.select(a_id, a_wkb), zoom, a_wkb).select(a_id, "cell_id")
    cb = cover_cells(b.select(b_id, b_wkb), zoom, b_wkb).select(b_id, "cell_id")
    if broadcast_b:
        cb = F.broadcast(cb)
    cand = ca.join(cb, "cell_id").dropDuplicates([a_id, b_id])
    b_geom = b.select(b_id, F.col(b_wkb).alias("_wkb_b"))
    if broadcast_b:
        b_geom = F.broadcast(b_geom)
    cand = cand.join(
        a.select(a_id, F.col(a_wkb).alias("_wkb_a")), a_id
    ).join(b_geom, b_id)

    @F.pandas_udf(BooleanType())
    def _intersects(wa: pd.Series, wb: pd.Series) -> pd.Series:
        return pd.Series(
            G.polygons_intersect_batch(
                [bytes(x) for x in wa], [bytes(y) for y in wb]
            )
        )

    return cand.where(_intersects(F.col("_wkb_a"), F.col("_wkb_b"))).select(
        a_id, b_id
    )


def spacetime_join(
    a: DataFrame,
    b: DataFrame,
    zoom: int,
    lon_a: str = "lon",
    lat_a: str = "lat",
    t_a: str = "ts",
    lon_b: str = "lon",
    lat_b: str = "lat",
    t_b: str = "ts",
    t_unit: str = "day",
    epoch: str = "2024-01-01",
    broadcast_b: bool = False,
) -> DataFrame:
    """J7 dedicated temporal-slice join (reference role ``spark/.../
    join`` over SpaceTimeKey layers): key both sides with the spatial
    cell at ``zoom`` plus the time bucket (``t_unit`` since ``epoch`` —
    the Z3 key's temporal component), then ONE equi-join on
    (cell_id, t_ord). Catalyst plans it as an ordinary shuffled/broadcast
    hash join — co-located by the same key the layer is stored under
    (S3 SFC-sorted buckets), so at 100 TB the join is shuffle-free on a
    bucketed layer. Returns a columns + b columns + (cell_id, t_ord)."""
    if t_unit == "day":
        bucket = lambda c: F.datediff(  # noqa: E731
            F.col(c).cast("date"), F.lit(epoch).cast("date")
        )
    elif t_unit == "hour":
        # floor, not truncate-toward-zero: pre-epoch timestamps would
        # otherwise share a double-width bucket 0 with the first hour
        bucket = lambda c: F.floor(  # noqa: E731
            (
                F.col(c).cast("long")
                - F.lit(epoch).cast("timestamp").cast("long")
            ) / 3600
        )
    else:  # pragma: no cover
        raise ValueError(t_unit)
    ka = assign_cells(a, lon_a, lat_a, zoom, impl="expr").withColumn(
        "t_ord", bucket(t_a).cast("long")
    ).drop("key_col", "key_row")
    kb = assign_cells(b, lon_b, lat_b, zoom, impl="expr").withColumn(
        "t_ord", bucket(t_b).cast("long")
    ).drop("key_col", "key_row")
    if broadcast_b:
        kb = F.broadcast(kb)
    return ka.join(kb, ["cell_id", "t_ord"])


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    zoom: int = 6,
    lon_col: str = "lon",
    lat_col: str = "lat",
    q_id_col: str = "q_id",
    q_lon_col: str = "q_lon",
    q_lat_col: str = "q_lat",
    max_rings: int = 16,
    point_cols: tuple[str, ...] | None = None,
    rings_per_round: int = 3,
) -> DataFrame:
    """Exact k-nearest-neighbors of each query point (planar degrees
    distance, ties broken by the point's first id column).

    Strategy (J4 re-expressed, fully batched): per round, ALL pending
    queries' ring-r candidate cells are generated by ONE distributed
    explode (vectorized ring_k), joined to the points in ONE broadcast
    equi-join, ranked by ONE window, and the stopping rule (kth
    candidate distance covered by the searched-radius guarantee
    ring*tile_height) is ONE distributed aggregate. The queries side is
    never collected; driver work per round is a single count. Lineage
    is truncated by lazy localCheckpoints, so total driver actions are
    <= 2*max_rings + 2 regardless of query-table size. Queries still
    unsatisfied at ``max_rings`` fall back to a brute-force pass —
    exactness is unconditional.

    ``rings_per_round`` rings are searched per round (one explode/join
    covers rings lo..hi; the stopping guarantee uses hi, so exactness
    is unchanged): most queries satisfy within rings 0-2, making the
    TYPICAL driver-action count 2 instead of 2 per ring — on a busy
    cluster each action is a scheduled job, and job latency (not data
    volume) dominates this operator at every scale.

    Returns: q_id, point columns, dist, rank.
    """
    from pyspark.sql.window import Window

    n = 1 << zoom
    th = 180.0 / n  # tile height in degrees == min cell dimension

    points = assign_cells(points, lon_col, lat_col, zoom, impl="expr").cache()
    if point_cols is None:
        point_cols = tuple(
            c for c in points.columns if c not in ("key_col", "key_row", "cell_id")
        )
    tie_col = point_cols[0]

    qk = assign_cells(
        queries.select(
            F.col(q_id_col).alias("q_id"),
            F.col(q_lon_col).alias("q_lon"),
            F.col(q_lat_col).alias("q_lat"),
        ),
        "q_lon", "q_lat", zoom, impl="expr",
    ).select(
        "q_id", "q_lon", "q_lat",
        F.col("key_col").alias("qc"), F.col("key_row").alias("qr"),
    )
    qid_type = qk.schema["q_id"].dataType.simpleString()
    ring_schema = f"q_id {qid_type}, q_lon double, q_lat double, cell_id long"
    pending = qk.localCheckpoint(eager=False)

    # plain products, not pow(): x*x is one exactly-rounded multiply in
    # every engine, so the oracle's sqrt(dx*dx + dy*dy) is bit-identical
    dx = F.col(lon_col) - F.col("q_lon")
    dy = F.col(lat_col) - F.col("q_lat")
    dist = F.sqrt(dx * dx + dy * dy)
    win = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col(tie_col).asc())

    def ring_cells(df: DataFrame, lo: int, hi: int) -> DataFrame:
        """Vectorized explode: each pending query -> its ring lo..hi
        cells (rings are disjoint, so the union has no duplicates)."""

        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                qc = pdf["qc"].to_numpy(np.int64)
                qr = pdf["qr"].to_numpy(np.int64)
                for ring in range(lo, hi + 1):
                    idx, nc, nr = sfc.ring_k(qc, qr, ring, n, n)
                    out = pdf.iloc[idx].reset_index(drop=True)[
                        ["q_id", "q_lon", "q_lat"]
                    ]
                    out["cell_id"] = sfc.zorder(nc, nr)
                    yield out

        return df.mapInPandas(gen, ring_schema)

    results = None
    n_pending = pending.count()
    ring = 0
    while ring < max_rings:
        if n_pending == 0:
            break
        hi = min(ring + max(rings_per_round, 1) - 1, max_rings - 1)
        cand = points.join(
            F.broadcast(ring_cells(pending, ring, hi)), "cell_id"
        )
        batch = cand.select(
            "q_id", "q_lon", "q_lat", *point_cols, dist.alias("dist")
        )
        merged = batch if results is None else results.unionByName(batch)
        results = merged.localCheckpoint(eager=False)
        guarantee = hi * th
        ring = hi + 1
        stats = (
            results.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .groupBy("q_id")
            .agg(F.count("*").alias("cnt"), F.max("dist").alias("kth"))
        )
        done = stats.where(
            (F.col("cnt") >= k) & (F.col("kth") <= guarantee)
        ).select("q_id")
        pending = pending.join(done, "q_id", "left_anti").localCheckpoint(
            eager=False
        )
        n_pending = pending.count()

    if n_pending > 0:
        # brute-force fallback for queries the rings didn't satisfy
        batch = points.crossJoin(
            F.broadcast(pending.select("q_id", "q_lon", "q_lat"))
        ).select("q_id", "q_lon", "q_lat", *point_cols, dist.alias("dist"))
        results = batch if results is None else results.unionByName(batch)

    out = (
        results.dropDuplicates(["q_id", tie_col])
        .withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .drop("q_lon", "q_lat")
    )
    return out


# --------------------------------------------- persisted vector index

def write_s2_store(
    df: DataFrame,
    base: str,
    level: int,
    coarse_level: int = 3,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> None:
    """Persist a point table as an S2-keyed query-many store: rows get
    the level-``level`` cell id, land hive-partitioned by their
    COARSE-LEVEL PARENT cell (``s2_cell >> 2*(level-coarse)`` — the
    shift-nesting parent, so any cover's merged fine ranges map to an
    explicit partition IN-list) and SFC-sorted within files (min-max
    row-group stats on the sorted cell column). This is the layout the
    PLANS.md S2 captures assume when they say the prune 'reaches
    row-group stats on a cell-keyed store' — read back with
    :func:`read_s2_store`, whose plans show non-empty PartitionFilters
    AND pushed cell bounds. Store metadata rides along so readers
    cannot desync from the write layout."""
    keyed = s2_assign(df, lon_col, lat_col, level)
    shift = 2 * (level - coarse_level)
    (
        keyed.withColumn(
            "s2_part", F.expr(f"s2_cell div {1 << shift}")
        )
        # s2_part FIRST: the dynamic-partition writer re-sorts by the
        # partition column otherwise, destroying the SFC file order
        .repartition("s2_part")
        .sortWithinPartitions("s2_part", "s2_cell")
        .write.mode("overwrite")
        .partitionBy("s2_part")
        .parquet(f"{base}/rows")
    )
    df.sparkSession.createDataFrame(
        [(level, coarse_level)], "level int, coarse_level int"
    ).write.mode("overwrite").parquet(f"{base}/_store_meta")


def read_s2_store(
    spark,
    base: str,
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Bbox query over a :func:`write_s2_store` store, all three prune
    layers explicit in the plan: (1) the bbox's COARSE cover becomes a
    partition IN-list on ``s2_part`` — directories never listed, shows
    as PartitionFilters; (2) the FINE cover's merged BETWEEN ranges on
    the sorted ``s2_cell`` column — pushed to the scan, skipping
    row-groups via min-max stats; (3) the exact lon/lat refine, also
    scan-pushed codegen. No Python anywhere in the read path."""
    from ..core import s2cell

    meta = spark.read.parquet(f"{base}/_store_meta").collect()[0]
    level, coarse = int(meta["level"]), int(meta["coarse_level"])
    bbox = (lon_min, lat_min, lon_max, lat_max)
    parts = [int(c) for c in s2cell.s2_cover(bbox, coarse)]
    df = spark.read.parquet(f"{base}/rows").where(
        F.col("s2_part").isin(parts)
    )
    return s2_range_filter(
        df, level, *bbox, lon_col=lon_col, lat_col=lat_col
    )


def write_vector_index(
    polys: DataFrame,
    base: str,
    zoom: int,
    wkb_col: str = "wkb",
    n_buckets: int = 32,
) -> None:
    """Persist the J5 vector_cells table as a query-many PIP index:
    cover cells (with bbox prefilter columns and the geometry) written
    hive-partitioned by bucket(cell_id) and SFC-sorted within files —
    the vector-side twin of the tile LayerWriter (S3). Repeated point
    batches then skip the cover-cell explode entirely and join against
    a co-bucketed store; with a region filter the scan prunes to the
    region's buckets/row-groups (min-max on the sorted cell_id).
    Index metadata (zoom, n_buckets) rides along so queries cannot
    desync from the write layout."""
    cells = cover_cells(polys, zoom, wkb_col, bbox=True).drop(
        "key_col", "key_row"
    )
    (
        cells.withColumn(
            "cbucket", F.pmod(F.col("cell_id"), F.lit(n_buckets)).cast("int")
        )
        .repartition("cbucket")
        # cbucket FIRST: the dynamic-partition writer requires the
        # partition column leading the sort order — sorting by cell_id
        # alone makes the writer insert its own re-sort on cbucket,
        # silently destroying the SFC file order (measured)
        .sortWithinPartitions("cbucket", "cell_id")
        .write.mode("overwrite")
        .partitionBy("cbucket")
        .parquet(f"{base}/cells")
    )
    polys.sparkSession.createDataFrame(
        [(zoom, n_buckets)], "zoom int, n_buckets int"
    ).write.mode("overwrite").parquet(f"{base}/_index_meta")


def pip_join_indexed(
    spark,
    base: str,
    points: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    wkb_col: str = "wkb",
) -> DataFrame:
    """PIP join against a persisted vector index — the broadcast-free,
    explode-free scale path for HUGE polygon sets: points key to cells
    (codegen), equi-join the stored cover-cell table on
    (cbucket, cell_id), pushed bbox prefilter, exact vectorized
    ray-cast refine. Same results as ``pip_join`` on the indexed
    polygons (tested); no geometry ever visits the driver."""
    meta = spark.read.parquet(f"{base}/_index_meta").collect()[0]
    zoom, n_buckets = int(meta["zoom"]), int(meta["n_buckets"])
    keyed = assign_cells(points, lon_col, lat_col, zoom, impl="expr").drop(
        "key_col", "key_row"
    ).withColumn(
        "cbucket", F.pmod(F.col("cell_id"), F.lit(n_buckets)).cast("int")
    )
    idx = spark.read.parquet(f"{base}/cells")
    joined = keyed.join(idx, ["cbucket", "cell_id"], "inner").where(
        F.col(lon_col).between(F.col("bbox_xmin"), F.col("bbox_xmax"))
        & F.col(lat_col).between(F.col("bbox_ymin"), F.col("bbox_ymax"))
    )
    refined = joined.where(
        _pip_udf(F.col(lon_col), F.col(lat_col), F.col(wkb_col))
    )
    return refined.drop(
        wkb_col, "bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax", "cbucket"
    )


def polygon_stats(
    polys: DataFrame, id_col: str = "geom_id", wkb_col: str = "wkb"
) -> DataFrame:
    """RV9 measure ops: exact shoelace area + centroid accumulators
    per polygon, computed from the DECODED WKB exterior ring in one
    narrow Arrow-batched map. For integer-lattice vertices everything
    is exact int64: area2 = sum cross products (2x signed area),
    sx/sy = centroid numerators (centroid = (sx/(3*area2),
    sy/(3*area2))). The oracle recomputes the same sums from the
    polygons' GENERATING formula in pure SQL — so a green check proves
    the WKB write -> parse -> kernel path end-to-end against an
    independent derivation."""
    from ..core import geom as G

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"_id": [], "area2": [], "sx": [], "sy": []}
            for i in range(len(pdf)):
                kind, rings = G.wkb_read(bytes(pdf[wkb_col].iloc[i]))
                if kind != "polygon":  # pragma: no cover
                    raise ValueError(kind)
                ring = np.round(np.asarray(rings[0], np.float64)).astype(
                    np.int64
                )
                # drop closing vertex if present
                if (ring[0] == ring[-1]).all():
                    ring = ring[:-1]
                x, y = ring[:, 0], ring[:, 1]
                x2, y2 = np.roll(x, -1), np.roll(y, -1)
                cross = x * y2 - x2 * y
                out["_id"].append(int(pdf[id_col].iloc[i]))
                out["area2"].append(int(cross.sum()))
                out["sx"].append(int(((x + x2) * cross).sum()))
                out["sy"].append(int(((y + y2) * cross).sum()))
            yield pd.DataFrame(out)

    schema = f"_id long, area2 long, sx long, sy long"
    return polys.select(id_col, wkb_col).mapInPandas(gen, schema).selectExpr(
        f"_id as {id_col}", "area2", "sx", "sy"
    )
