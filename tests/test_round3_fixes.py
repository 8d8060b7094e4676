"""Round-3 regression tests for the ADVICE findings: hole-ring
intersection in polygons_intersect, MVT ring winding, viewshed NoData
NaN poisoning on grid-line samples."""

import numpy as np

from geotrellis_spark.core import geom, mvt, raster_ops


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
