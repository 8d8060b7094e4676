"""Spatial join / kNN / pruning e2e vs numpy oracles (reference spec
role: ``spark/src/test/.../join/VectorJoinSpec``, ``knn/KNearestSpec``,
``partition/SpacePartitionerSpec`` — SURVEY.md §5)."""

import numpy as np
import pytest

from geotrellis_spark.core import geom as G
from geotrellis_spark.functions import exprs
from geotrellis_spark.operators import spatial

N_POINTS = 2000


@pytest.fixture(scope="module")
def points_df(spark):
    df = spark.range(N_POINTS).selectExpr(
        "id",
        f"{exprs.lon_sql('id')} as lon",
        f"{exprs.lat_sql('id')} as lat",
    )
    return df.cache()


def _oracle_lonlat():
    return exprs.lonlat_np(np.arange(N_POINTS), np.arange(N_POINTS))


def test_assign_cells_matches_sql_formula(spark, points_df):
    out = spatial.assign_cells(points_df, "lon", "lat", 8)
    got = {r["id"]: (r["key_col"], r["key_row"], r["cell_id"]) for r in out.collect()}
    sql = points_df.selectExpr(
        "id",
        f"{exprs.key_col_sql('lon', 8)} as kc",
        f"{exprs.key_row_sql('lat', 8)} as kr",
    ).selectExpr("id", "kc", "kr", f"{exprs.zorder_sql('kc', 'kr', 8)} as cell")
    for r in sql.collect():
        assert got[r["id"]] == (r["kc"], r["kr"], r["cell"]), r["id"]


def test_cell_range_filter_equals_rectangle(points_df):
    df = spatial.assign_cells(points_df, "lon", "lat", 6)
    pruned = spatial.cell_range_filter(df, 6, -60.0, -30.0, 70.0, 55.0)
    got = sorted(r["id"] for r in pruned.collect())
    lon, lat = _oracle_lonlat()
    col, row = exprs.key_np(lon, lat, 6)
    c0, _ = exprs.key_np(np.array([-60.0]), np.array([0.0]), 6)
    c1, _ = exprs.key_np(np.array([70.0]), np.array([0.0]), 6)
    _, r0 = exprs.key_np(np.array([0.0]), np.array([55.0]), 6)
    _, r1 = exprs.key_np(np.array([0.0]), np.array([-30.0]), 6)
    keep = (col >= c0[0]) & (col <= c1[0]) & (row >= r0[0]) & (row <= r1[0])
    assert got == sorted(np.arange(N_POINTS)[keep].tolist())


def _diamond(cx, cy, rx, ry):
    return G.wkb_write_polygon(
        [np.array([[cx - rx, cy], [cx, cy - ry], [cx + rx, cy], [cx, cy + ry]])]
    )


def test_pip_join_diamonds(spark, points_df):
    polys = [(i, _diamond(-150.0 + i * 15.0, -60.0 + i * 7.0, 12.0, 9.0))
             for i in range(20)]
    polys_df = spark.createDataFrame(polys, ["geom_id", "wkb"])
    out = spatial.pip_join(points_df, polys_df, zoom=5)
    got = sorted((r["id"], r["geom_id"]) for r in out.collect())
    lon, lat = _oracle_lonlat()
    expect = []
    for gid, wkb in polys:
        inside = G.points_in_polygon(lon, lat, wkb)
        expect += [(int(i), gid) for i in np.arange(N_POINTS)[inside]]
    assert got == sorted(expect)
    assert len(got) > 20  # non-trivial join


def test_knn_exact(spark, points_df):
    queries = [(i, -170.0 + i * 40.0, -70.0 + i * 17.0) for i in range(8)]
    qdf = spark.createDataFrame(queries, ["q_id", "q_lon", "q_lat"])
    out = spatial.knn_join(
        points_df, qdf, k=5, zoom=5, point_cols=("id", "lon", "lat"), max_rings=6
    )
    got = {(r["q_id"], r["rank"]): r["id"] for r in out.collect()}
    lon, lat = _oracle_lonlat()
    for qid, qlon, qlat in queries:
        d = np.hypot(lon - qlon, lat - qlat)
        order = np.lexsort((np.arange(N_POINTS), d))[:5]
        for rank, pid in enumerate(order, start=1):
            assert got[(qid, rank)] == int(pid), (qid, rank)
    assert len(got) == 8 * 5


def test_knn_many_queries_bounded_actions(spark, points_df):
    """Batched ring search: a 400-query table completes exactly with
    driver work independent of query count (the J4 scale contract)."""
    qn = 400
    qdf = spark.range(qn).selectExpr(
        "id as q_id",
        f"{exprs.lon_sql('(id + 3) * 41')} as q_lon",
        f"{exprs.lat_sql('(id + 7) * 59')} as q_lat",
    )
    out = spatial.knn_join(
        points_df, qdf, k=3, zoom=5, point_cols=("id", "lon", "lat"),
        max_rings=4,
    )
    got = {(r["q_id"], r["rank"]): r["id"] for r in out.collect()}
    assert len(got) == qn * 3
    lon, lat = _oracle_lonlat()
    qlon, qlat = exprs.lonlat_np((np.arange(qn) + 3) * 41, (np.arange(qn) + 7) * 59)
    for qid in range(0, qn, 37):  # spot-check a deterministic sample
        d = np.hypot(lon - qlon[qid], lat - qlat[qid])
        order = np.lexsort((np.arange(N_POINTS), d))[:3]
        for rank, pid in enumerate(order, start=1):
            assert got[(qid, rank)] == int(pid), (qid, rank)


def test_cover_cells_clipped(spark):
    """J5 vector_cells contract: per-cell clipped geometry is exact —
    clipped areas sum to the polygon area, and PIP against the clipped
    ring equals PIP against the original for points inside the cell."""
    zoom = 3
    n = 1 << zoom
    ring = np.array(
        [[-100.0, -30.0], [40.0, -50.0], [60.0, 40.0], [-70.0, 55.0]]
    )
    wkb = G.wkb_write_polygon([ring])
    polys_df = spark.createDataFrame([(1, bytearray(wkb))], "geom_id long, wkb binary")
    rows = spatial.cover_cells(polys_df, zoom, clip=True).collect()
    assert len(rows) > 4
    area = 0.0
    rng = np.random.default_rng(11)
    for r in rows:
        if r["clipped_wkb"] is None:
            continue
        kind, rings = G.wkb_read(bytes(r["clipped_wkb"]))
        assert kind == "polygon"
        area += sum(abs(G.shoelace_area(rg)) for rg in rings)
        # random points strictly inside this cell
        xmin = -180.0 + r["key_col"] * 360.0 / n
        ymax = 90.0 - r["key_row"] * 180.0 / n
        px = xmin + rng.uniform(0.01, 0.99, 50) * (360.0 / n)
        py = ymax - rng.uniform(0.01, 0.99, 50) * (180.0 / n)
        np.testing.assert_array_equal(
            G.points_in_polygon(px, py, bytes(r["clipped_wkb"])),
            G.points_in_polygon(px, py, wkb),
        )
    assert area == pytest.approx(abs(G.shoelace_area(ring)), rel=1e-9)


def test_assign_cells_expr_equals_udf(spark):
    # the codegen expr path must be bit-identical to the pandas-UDF
    # kernel path (both are oracle-proven against the same SQL)
    pts = spark.range(2000).selectExpr(
        "id",
        "cast(((id * 2654435761) % 4294967296) / 4294967296.0 * 360.0 - 180.0"
        " as double) as lon",
        "cast(((id * 40503) % 65536) / 65536.0 * 180.0 - 90.0 as double) as lat",
    )
    a = spatial.assign_cells(pts, "lon", "lat", 7).select(
        "id", "key_col", "key_row", "cell_id"
    )
    b = spatial.assign_cells(pts, "lon", "lat", 7, impl="expr").select(
        "id", "key_col", "key_row", "cell_id"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pip_join_indexed_matches_pip_join(spark, tmp_path):
    """Persisted vector index (write once, query many, broadcast-free):
    pip_join_indexed over the stored cover-cell table must equal
    pip_join on the same polygons and points."""
    from geotrellis_spark.operators import spatial
    from geotrellis_spark.plans import driver_queries as dq

    pts = dq._events_pts(spark, "/root/testdata/sf0.001")
    polys = dq._grid_polys(spark)
    base = str(tmp_path / "vindex")
    spatial.write_vector_index(polys, base, zoom=5)

    got = spatial.pip_join_indexed(spark, base, pts)
    want = spatial.pip_join(pts, polys, zoom=5)
    key_cols = ["event_id"] + [
        c for c in want.columns if c not in pts.columns and c in got.columns
    ]
    g = {tuple(r) for r in got.select(*key_cols).collect()}
    w = {tuple(r) for r in want.select(*key_cols).collect()}
    assert g == w and g
    # layout really is hive-partitioned by cbucket
    import glob
    assert glob.glob(f"{base}/cells/cbucket=*")


def test_vector_index_files_actually_sfc_sorted(spark, tmp_path):
    """The writer's dynamic-partition re-sort must not destroy the
    cell_id order inside files (the min-max pruning contract)."""
    import glob
    import pyarrow.parquet as pq

    from geotrellis_spark.operators import spatial
    from geotrellis_spark.plans import driver_queries as dq

    base = str(tmp_path / "vindex")
    spatial.write_vector_index(dq._grid_polys(spark), base, zoom=5)
    files = glob.glob(f"{base}/cells/cbucket=*/part-*.parquet")
    assert files
    for f in files:
        cells = pq.read_table(f, columns=["cell_id"])["cell_id"].to_pylist()
        assert cells == sorted(cells), f
