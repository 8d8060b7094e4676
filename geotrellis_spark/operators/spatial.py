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
) -> DataFrame:
    """Add key_col/key_row/cell_id for the LatLng ZoomedLayoutScheme at
    ``zoom``. Vectorized pandas UDF (Arrow batches -> numpy)."""

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

    k = f"{out_prefix}_k" if out_prefix else "_k"
    out = df.withColumn(k, keys_udf(F.col(lon_col), F.col(lat_col)))
    for f in ("key_col", "key_row", "cell_id"):
        out = out.withColumn(f"{out_prefix}{f}", F.col(f"{k}.{f}"))
    return out.drop(k)


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


def cover_cells(polys: DataFrame, zoom: int, wkb_col: str = "wkb") -> DataFrame:
    """Explode polygons to their covering cells at ``zoom`` (bbox cover;
    ClipToGrid's cell enumeration). Output: input columns + key_col/
    key_row/cell_id, one row per (polygon, covering cell)."""
    n = 1 << zoom
    schema = StructType(
        polys.schema.fields
        + [
            StructField("key_col", LongType()),
            StructField("key_row", LongType()),
            StructField("cell_id", LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                xmin, ymin, xmax, ymax = G.polygon_bbox(bytes(row[wkb_col]))
                c0 = int(np.clip(np.floor((xmin + 180.0) / 360.0 * n), 0, n - 1))
                c1 = int(np.clip(np.floor((xmax + 180.0) / 360.0 * n), 0, n - 1))
                r0 = int(np.clip(np.floor((90.0 - ymax) / 180.0 * n), 0, n - 1))
                r1 = int(np.clip(np.floor((90.0 - ymin) / 180.0 * n), 0, n - 1))
                cols, rws = np.meshgrid(
                    np.arange(c0, c1 + 1), np.arange(r0, r1 + 1), indexing="ij"
                )
                cols = cols.ravel()
                rws = rws.ravel()
                cells = sfc.zorder(cols, rws)
                for c, r, cell in zip(cols, rws, cells):
                    d = row.to_dict()
                    d.update(key_col=int(c), key_row=int(r), cell_id=int(cell))
                    rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return polys.mapInPandas(gen, schema)


@F.pandas_udf(BooleanType())
def _pip_udf(lon: pd.Series, lat: pd.Series, wkb: pd.Series) -> pd.Series:
    """Vectorized ray-cast PIP. Groups the Arrow batch by polygon so each
    distinct geometry is parsed once and tested against its whole point
    sub-batch at once."""
    out = np.zeros(len(lon), dtype=bool)
    px = lon.to_numpy(dtype=np.float64)
    py = lat.to_numpy(dtype=np.float64)
    codes, uniques = pd.factorize(wkb)
    for gi, w in enumerate(uniques):
        m = codes == gi
        out[m] = G.points_in_polygon(px[m], py[m], bytes(w))
    return pd.Series(out)


def pip_join(
    points: DataFrame,
    polys: DataFrame,
    zoom: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    wkb_col: str = "wkb",
    broadcast_polys: bool = True,
    points_have_cells: bool = False,
) -> DataFrame:
    """Point-in-polygon join: equi-join on covering cell_id, then exact
    vectorized ray-cast refine. Returns points columns + polygon columns
    (minus wkb) for each containing polygon."""
    if not points_have_cells:
        points = assign_cells(points, lon_col, lat_col, zoom)
    cells = cover_cells(polys, zoom, wkb_col).drop("key_col", "key_row")
    if broadcast_polys:
        cells = F.broadcast(cells)
    joined = points.join(cells, "cell_id", "inner")
    refined = joined.where(_pip_udf(F.col(lon_col), F.col(lat_col), F.col(wkb_col)))
    return refined.drop(wkb_col)


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
) -> DataFrame:
    """Exact k-nearest-neighbors of each query point (planar degrees
    distance, ties broken by the point's first id column).

    Strategy (J4 re-expressed): expand H3-style cell rings around each
    query until the kth candidate distance is covered by the searched
    radius guarantee (ring r covers min distance r * tile_height), then
    window top-k. Queries still unsatisfied at ``max_rings`` fall back
    to a brute-force pass — exactness is unconditional.

    Returns: q_id, point columns, dist, rank.
    """
    from pyspark.sql.window import Window

    n = 1 << zoom
    th = 180.0 / n  # tile height in degrees == min cell dimension

    points = assign_cells(points, lon_col, lat_col, zoom).cache()
    q_rows = queries.select(q_id_col, q_lon_col, q_lat_col).collect()
    if point_cols is None:
        point_cols = tuple(
            c for c in points.columns if c not in ("key_col", "key_row", "cell_id")
        )
    tie_col = point_cols[0]

    qc, qr = exprs.key_np(
        np.array([r[q_lon_col] for r in q_rows]),
        np.array([r[q_lat_col] for r in q_rows]),
        zoom,
    )
    q_ids = [r[q_id_col] for r in q_rows]
    q_lons = {r[q_id_col]: float(r[q_lon_col]) for r in q_rows}
    q_lats = {r[q_id_col]: float(r[q_lat_col]) for r in q_rows}
    q_cell = {qid: (int(c), int(r)) for qid, c, r in zip(q_ids, qc, qr)}

    spark = points.sparkSession
    pending = set(q_ids)
    results = None
    searched_rings = 0
    # plain products, not pow(): x*x is one exactly-rounded multiply in
    # every engine, so the oracle's sqrt(dx*dx + dy*dy) is bit-identical
    dx = F.col(lon_col) - F.col("q_lon")
    dy = F.col(lat_col) - F.col("q_lat")
    dist = F.sqrt(dx * dx + dy * dy)
    win = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col(tie_col).asc())

    for ring in range(max_rings):
        if not pending:
            break
        # candidate cells for this ring, for still-pending queries
        rows = []
        for qid in pending:
            c, r = q_cell[qid]
            _, nc, nr = sfc.ring_k([c], [r], ring, n, n)
            cells = sfc.zorder(nc, nr)
            for cell in cells.tolist():
                rows.append((qid, q_lons[qid], q_lats[qid], int(cell)))
        if rows:
            qdf = spark.createDataFrame(rows, ["q_id", "q_lon", "q_lat", "cell_id"])
            cand = points.join(F.broadcast(qdf), "cell_id")
            batch = cand.select(
                "q_id", "q_lon", "q_lat", *point_cols, dist.alias("dist")
            )
            results = batch if results is None else results.unionByName(batch)
        searched_rings = ring
        # check stopping condition: kth distance within guarantee radius
        if results is not None:
            topk = results.withColumn("rank", F.row_number().over(win)).where(
                F.col("rank") <= k
            )
            stats = (
                topk.groupBy("q_id")
                .agg(F.count("*").alias("cnt"), F.max("dist").alias("kth"))
                .collect()
            )
            guarantee = searched_rings * th
            done = {
                s["q_id"]
                for s in stats
                if s["cnt"] >= k and s["kth"] <= guarantee
            }
            pending -= done

    if pending:
        # brute-force fallback for queries the rings didn't satisfy
        rows = [(qid, q_lons[qid], q_lats[qid]) for qid in pending]
        qdf = spark.createDataFrame(rows, ["q_id", "q_lon", "q_lat"])
        batch = points.crossJoin(F.broadcast(qdf)).select(
            "q_id", "q_lon", "q_lat", *point_cols, dist.alias("dist")
        )
        results = batch if results is None else results.unionByName(batch)

    out = (
        results.dropDuplicates(["q_id", tie_col])
        .withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .drop("q_lon", "q_lat")
    )
    return out
