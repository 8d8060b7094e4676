"""Round-3 regression tests for the ADVICE findings: hole-ring
intersection in polygons_intersect, MVT ring winding, viewshed NoData
NaN poisoning on grid-line samples."""

import numpy as np
import pytest

from geotrellis_spark.core import geom, mvt, raster_ops
from geotrellis_spark.operators import spatial


# --------------------------------------- polygons_intersect hole rings

def _c_hole():
    """Polygon A = big square with a C-shaped (concave) hole: the hole
    spans [2,8]x[2,8] minus a notch [4,6]x[2,5] of A-material jutting
    up into it from the hole's bottom edge."""
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    hole = np.array(
        [[2, 2], [4, 2], [4, 5], [6, 5], [6, 2], [8, 2], [8, 8], [2, 8]],
        dtype=float,
    )
    return geom.wkb_write_polygon([outer, hole])


def test_intersect_across_hole_notch():
    # Triangle B sits entirely inside the hole cavity by vertices, but
    # its bottom edge crosses the notch (real A-material at x in [4,6],
    # y < 5): the pair DOES intersect.
    a = _c_hole()
    tri = np.array([[3, 4], [7, 4], [5, 7]], dtype=float)
    b = geom.wkb_write_polygon([tri])
    assert geom.polygons_intersect(a, b)
    assert geom.polygons_intersect(b, a)


def test_no_intersect_fully_inside_hole():
    # Triangle fully inside the hole cavity, clear of the notch: disjoint.
    a = _c_hole()
    tri = np.array([[6.5, 5.5], [7.5, 5.5], [7.0, 7.5]], dtype=float)
    b = geom.wkb_write_polygon([tri])
    assert not geom.polygons_intersect(a, b)
    assert not geom.polygons_intersect(b, a)


# ------------------------------------------------------- MVT winding

def test_mvt_ring_winding_and_roles():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], dtype=float)
    # Feed both rings in the SAME (ccw world) orientation — encoder must
    # fix the winding regardless of input orientation.
    wkb = geom.wkb_write_polygon([outer, hole])
    data = mvt.encode_mvt("t", [{"wkb": wkb, "id": 1}], (0, 0, 10, 10))
    feats = mvt.decode_mvt(data)["t"]["features"]
    assert feats[0]["ring_roles"] == ["exterior", "hole"]
    parts = feats[0]["parts"]
    # signed area in grid coords: exterior positive, hole negative
    assert mvt._signed_area(parts[0]) > 0
    assert mvt._signed_area(parts[1]) < 0


def test_mvt_winding_input_orientation_invariant():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], dtype=float)
    flipped = geom.wkb_write_polygon([outer[::-1].copy(), hole[::-1].copy()])
    data = mvt.encode_mvt("t", [{"wkb": flipped, "id": 1}], (0, 0, 10, 10))
    feats = mvt.decode_mvt(data)["t"]["features"]
    assert feats[0]["ring_roles"] == ["exterior", "hole"]


# ---------------------------------------------- viewshed NoData corner

def test_viewshed_nodata_zero_weight_no_nan_poison():
    # Rays along the viewpoint's own row sample exactly ON the row-2
    # grid line (fy == 0), so the row-3 bilinear corners get weight 0.
    # A NoData cell at (3,4) therefore contributes inf * 0 — which the
    # old weighted sum turned into NaN, silencing the genuine finite
    # wall at (2,4) in the SAME window and wrongly marking cells past
    # it visible. Per-corner masking must keep the wall blocking.
    nodata = 65535
    dem = np.zeros((5, 9), dtype=np.uint16) + 10
    dem[3, 4] = nodata          # zero-weight NoData corner
    dem[2, 4] = 1000            # finite wall in the same window
    vs = raster_ops.viewshed(dem, 2, 0, observer_height=1.0, nodata=nodata)
    assert vs[2, 0] and vs[2, 3]        # viewpoint + cells before wall
    assert not vs[2, 6] and not vs[2, 8]  # wall still blocks past col 4


def test_viewshed_zero_weight_nodata_does_not_block():
    # Same geometry but NO wall: the zero-weight NoData corner alone
    # must not block (it never participates in the interpolation).
    nodata = 65535
    dem = np.zeros((5, 9), dtype=np.uint16) + 10
    dem[3, 4] = nodata
    vs = raster_ops.viewshed(dem, 2, 0, observer_height=1.0, nodata=nodata)
    assert vs[2, :].all()
    assert not vs[3, 4]                 # the NoData cell itself


# ------------------------------------------- batched geometry kernels

def test_polygons_intersect_batch_matches_scalar():
    rng = np.random.default_rng(7)

    def rand_poly(nv, cx, cy, r):
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(0.3 * r, r, nv)
        ring = np.column_stack(
            [cx + rad * np.cos(ang), cy + rad * np.sin(ang)]
        )
        return geom.wkb_write_polygon([ring])

    was, wbs = [], []
    for _ in range(400):
        was.append(rand_poly(int(rng.integers(3, 9)), rng.uniform(-5, 5),
                             rng.uniform(-5, 5), rng.uniform(0.5, 3)))
        wbs.append(rand_poly(int(rng.integers(3, 9)), rng.uniform(-5, 5),
                             rng.uniform(-5, 5), rng.uniform(0.5, 3)))
    # holed pairs exercise the scalar fallback inside the batch
    wh = _c_hole()
    for _ in range(20):
        was.append(wh)
        wbs.append(rand_poly(4, rng.uniform(-2, 12), rng.uniform(-2, 12), 3.0))
    batch = geom.polygons_intersect_batch(was, wbs)
    scalar = np.array(
        [geom.polygons_intersect(a, b) for a, b in zip(was, wbs)]
    )
    np.testing.assert_array_equal(batch, scalar)
    assert 0 < scalar.sum() < len(scalar)  # both outcomes exercised


def test_clip_ring_to_rects_batch_matches_scalar():
    rng = np.random.default_rng(3)
    for _ in range(50):
        nv = int(rng.integers(3, 10))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(1, 5, nv)
        ring = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
        k = 20
        xmin = rng.uniform(-6, 4, k)
        ymin = rng.uniform(-6, 4, k)
        xmax = xmin + rng.uniform(0.5, 4, k)
        ymax = ymin + rng.uniform(0.5, 4, k)
        pts, cnt = geom.clip_ring_to_rects_batch(ring, xmin, ymin, xmax, ymax)
        for j in range(k):
            want = geom.clip_polygon_to_rect(
                ring, xmin[j], ymin[j], xmax[j], ymax[j]
            )
            if want is None:
                assert cnt[j] == 0
            else:
                np.testing.assert_array_equal(pts[j, : cnt[j]], want[:-1])


# -------------------------------------- pip_join broadcast size guard

def test_pip_join_world_polygon_falls_back(spark):
    """A world-spanning polygon whose cover-cell enumeration exceeds the
    broadcast cap must fall back to the distributed path and still be
    exact (VERDICT r2 'what's wrong' #2)."""
    from geotrellis_spark.functions import exprs

    pts = spark.range(300).selectExpr(
        "id",
        f"{exprs.lon_sql('id * 13')} as lon",
        f"{exprs.lat_sql('id * 29')} as lat",
    )
    world = geom.wkb_write_polygon([np.array(
        [[-179.9, -89.9], [179.9, -89.9], [179.9, 89.9], [-179.9, 89.9]]
    )])
    small = geom.wkb_write_polygon([np.array(
        [[-10.0, -10.0], [10.0, -10.0], [10.0, 10.0], [-10.0, 10.0]]
    )])
    polys = spark.createDataFrame(
        [(1, bytearray(world)), (2, bytearray(small))],
        "geom_id long, wkb binary",
    )
    out = spatial.pip_join(
        pts, polys, zoom=6, max_broadcast_cells=1000
    )  # world at zoom 6 = 4096 cells > cap -> distributed path
    got = sorted((r["id"], r["geom_id"]) for r in out.collect())
    lon, lat = exprs.lonlat_np(np.arange(300) * 13, np.arange(300) * 29)
    expect = []
    for gid, wkb in ((1, world), (2, small)):
        inside = geom.points_in_polygon(lon, lat, wkb)
        expect += [(int(i), gid) for i in np.arange(300)[inside]]
    assert got == sorted(expect)
    # same query under the default caps (broadcast path) is identical
    out2 = spatial.pip_join(pts, polys, zoom=6)
    assert sorted((r["id"], r["geom_id"]) for r in out2.collect()) == got


def test_vector_join_with_holes(spark):
    """vector_join refine now goes through the batched kernel; pairs
    whose intersection is only visible across a hole ring must appear
    (the ADVICE hole-notch case, end-to-end through Spark)."""
    a_polys = [(1, bytearray(_c_hole()))]
    tri_in = np.array([[3.0, 4.0], [7.0, 4.0], [5.0, 7.0]])      # crosses notch
    tri_out = np.array([[6.5, 5.5], [7.5, 5.5], [7.0, 7.5]])     # inside hole
    b_polys = [
        (10, bytearray(geom.wkb_write_polygon([tri_in]))),
        (20, bytearray(geom.wkb_write_polygon([tri_out]))),
    ]
    a = spark.createDataFrame(a_polys, "a_id long, wkb binary")
    b = spark.createDataFrame(b_polys, "b_id long, wkb binary")
    out = spatial.vector_join(a, b, zoom=6)
    got = sorted((r["a_id"], r["b_id"]) for r in out.collect())
    assert got == [(1, 10)]
