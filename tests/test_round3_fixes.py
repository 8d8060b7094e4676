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


# ------------------------------------------- cross-tile layer viewshed

def test_layer_viewshed_matches_whole_region_golden(spark):
    """RV6 at layer level: viewshed over a 3x3-tile DEM equals the
    single-array whole-region viewshed, bit for bit (including rays
    crossing tile borders and a NoData pocket)."""
    import pandas as pd
    from geotrellis_spark.core import codecs, sfc
    from geotrellis_spark.operators import iterative

    T = 16
    rng = np.random.default_rng(9)
    world = (rng.integers(5, 40, size=(3 * T, 3 * T))).astype(np.uint16)
    world[10:14, 20:24] = 2000   # a high plateau casting shadows
    world[30:33, 8:11] = 65535   # NoData pocket (blocks sight)
    rows = []
    for kr in range(3):
        for kc in range(3):
            tile = world[kr * T : (kr + 1) * T, kc * T : (kc + 1) * T]
            rows.append({
                "layer": "dem", "zoom": 2, "key_col": kc, "key_row": kr,
                "cell_id": int(sfc.zorder(kc, kr)),
                "tile": codecs.encode_tile(tile, "raw16"),
                "fmt": "raw16",
            })
    dem_df = spark.createDataFrame(pd.DataFrame(rows))
    vr, vc = 7, 5   # viewpoint in the NW tile; rays cross every border
    out = iterative.layer_viewshed(
        dem_df, vr, vc, observer_height=2.0, tile_size=T
    )
    got = np.zeros((3 * T, 3 * T), dtype=bool)
    seen = 0
    for r in out.collect():
        v = np.frombuffer(bytes(r["visible"]), dtype=bool).reshape(T, T)
        got[r["key_row"] * T : (r["key_row"] + 1) * T,
            r["key_col"] * T : (r["key_col"] + 1) * T] = v
        seen += 1
    assert seen == 9
    want = raster_ops.viewshed(world, vr, vc, observer_height=2.0)
    np.testing.assert_array_equal(got, want)
    assert 0 < want.sum() < want.size  # both outcomes exercised


def test_layer_viewshed_center_viewpoint(spark):
    import pandas as pd
    from geotrellis_spark.core import codecs, sfc
    from geotrellis_spark.operators import iterative

    T = 16
    rng = np.random.default_rng(21)
    world = (rng.integers(50, 60, size=(2 * T, 2 * T))).astype(np.uint16)
    world[:, 20] = 500  # wall through both tile rows
    rows = []
    for kr in range(2):
        for kc in range(2):
            tile = world[kr * T : (kr + 1) * T, kc * T : (kc + 1) * T]
            rows.append({
                "layer": "dem", "zoom": 1, "key_col": kc, "key_row": kr,
                "cell_id": int(sfc.zorder(kc, kr)),
                "tile": codecs.encode_tile(tile, "raw16"),
                "fmt": "raw16",
            })
    dem_df = spark.createDataFrame(pd.DataFrame(rows))
    vr, vc = 16, 16  # exactly on the 4-tile corner
    out = iterative.layer_viewshed(dem_df, vr, vc, tile_size=T)
    got = np.zeros((2 * T, 2 * T), dtype=bool)
    for r in out.collect():
        v = np.frombuffer(bytes(r["visible"]), dtype=bool).reshape(T, T)
        got[r["key_row"] * T : (r["key_row"] + 1) * T,
            r["key_col"] * T : (r["key_col"] + 1) * T] = v
    np.testing.assert_array_equal(
        got, raster_ops.viewshed(world, vr, vc)
    )


# --------------------------------------- cross-tile region dissolve

def _tile_layer_df(spark, world, T, zoom):
    import pandas as pd
    from geotrellis_spark.core import codecs, sfc

    rows = []
    for kr in range(world.shape[0] // T):
        for kc in range(world.shape[1] // T):
            tile = world[kr * T : (kr + 1) * T, kc * T : (kc + 1) * T]
            rows.append({
                "layer": "l", "zoom": zoom, "key_col": kc, "key_row": kr,
                "cell_id": int(sfc.zorder(kc, kr)),
                "tile": codecs.encode_tile(tile, "raw16"),
                "fmt": "raw16",
            })
    return spark.createDataFrame(pd.DataFrame(rows))


def test_region_group_layer_matches_whole_array(spark):
    """RV4 dissolve: region partition over a 2x2-tile layer is
    label-bijective with whole-array region_group (regions crossing
    both border orientations, NoData holes, same-value-but-disjoint
    regions)."""
    from geotrellis_spark.operators import iterative

    T = 16
    rng = np.random.default_rng(5)
    world = rng.choice([1, 1, 2, 3], size=(2 * T, 2 * T)).astype(np.uint16)
    world[rng.random((2 * T, 2 * T)) < 0.08] = 65535  # NoData holes
    df = _tile_layer_df(spark, world, T, zoom=1)
    out = iterative.region_group_layer(df, tile_size=T)
    got = np.zeros((2 * T, 2 * T), dtype=np.int64)
    for r in out.collect():
        lab = np.frombuffer(bytes(r["labels"]), dtype=np.int64).reshape(T, T)
        got[r["key_row"] * T : (r["key_row"] + 1) * T,
            r["key_col"] * T : (r["key_col"] + 1) * T] = lab
    want = raster_ops.region_group(world, 4)
    # zero masks align exactly
    np.testing.assert_array_equal(got == 0, want == 0)
    # label partitions are bijective
    fwd, bwd = {}, {}
    for g, w in zip(got.ravel(), want.ravel()):
        if w == 0:
            continue
        assert fwd.setdefault(w, g) == g, (w, g)
        assert bwd.setdefault(g, w) == w, (g, w)
    assert len(fwd) == int(want.max())  # same region count


def test_vectorize_layer_dissolved_no_tile_seams(spark):
    """RV3 dissolve: a region spanning all 4 tiles vectorizes to ONE
    polygon whose even-odd rasterization reproduces the whole-layer
    mask exactly (no internal tile-border seams)."""
    from geotrellis_spark.core.layout import (
        Extent, LayoutDefinition, TileLayout,
    )
    from geotrellis_spark.operators import iterative

    T = 16
    world = np.full((2 * T, 2 * T), 7, dtype=np.uint16)
    world[0:4, :] = 1          # a second region along the top
    world[12:20, 12:20] = 1    # a cross-border square of value 1
    world[14:18, 14:18] = 7    # with a hole filled by the 7-region
    df = _tile_layer_df(spark, world, T, zoom=1)
    layout = LayoutDefinition(
        Extent(0.0, 0.0, 2.0 * T, 2.0 * T), TileLayout(2, 2, T, T)
    )
    out = iterative.vectorize_layer_dissolved(df, layout, tile_size=T)
    rows = out.collect()
    want_regions = raster_ops.region_group(world, 4)
    assert len(rows) == int(want_regions.max())  # one polygon per region
    # even-odd rasterization of each polygon == its region mask
    yy, xx = np.mgrid[0 : 2 * T, 0 : 2 * T]
    # cell centers in world coords (layout maps 1 pixel = 1 unit, y-down)
    px = xx.ravel() + 0.5
    py = (2 * T - yy.ravel()) - 0.5
    got = np.zeros((2 * T, 2 * T), dtype=np.int64)
    for i, r in enumerate(rows, start=1):
        inside = geom.points_in_polygon(px, py, bytes(r["wkb"]))
        m = inside.reshape(2 * T, 2 * T)
        assert not (got[m] != 0).any()  # polygons are disjoint
        got[m] = i
        # value is consistent with the mask
        assert (world[m] == r["value"]).all()
    np.testing.assert_array_equal(got != 0, want_regions != 0)
    # partition equivalence against the whole-array region labels
    fwd = {}
    for g, w in zip(got.ravel(), want_regions.ravel()):
        if w == 0:
            continue
        assert fwd.setdefault(w, g) == g


# ----------------------------------------------- universal kriging RV8

def test_universal_kriging_exact_and_drift():
    px = np.array([2.0, 8.0, 5.0])
    py = np.array([2.0, 3.0, 8.0])
    xs = np.arange(10) + 0.5
    ys = (9 - np.arange(10)) + 0.5
    gx, gy = np.meshgrid(xs, ys)
    # (1) exact interpolator: evaluate on a lattice that contains the
    # sample locations and read the prediction at each sample
    pv = np.array([10.0, 30.0, 17.0])
    zs = raster_ops.universal_kriging(px, py, pv, px, py, rng=6.0, sill=2.0)
    # the (i, i) lattice cell is sample i's own (x, y)
    np.testing.assert_allclose(np.diag(zs), pv, atol=1e-9)
    # (2) a pure linear trend is reproduced EXACTLY everywhere (the
    # property ordinary kriging lacks — it reverts to the mean)
    trend = lambda x, y: 3.0 + 2.0 * x - 1.5 * y  # noqa: E731
    pvt = trend(px, py)
    zt = raster_ops.universal_kriging(px, py, pvt, xs, ys, rng=6.0, sill=2.0)
    np.testing.assert_allclose(zt, trend(gx, gy), atol=1e-8)
    zo = raster_ops.ordinary_kriging(px, py, pvt, xs, ys, rng=6.0, sill=2.0)
    assert np.abs(zo - trend(gx, gy)).max() > 1.0  # OK genuinely differs far away
    # (3) drift='constant' degenerates to ordinary kriging
    zc = raster_ops.universal_kriging(
        px, py, pv, xs, ys, rng=6.0, sill=2.0, drift="constant"
    )
    zo2 = raster_ops.ordinary_kriging(px, py, pv, xs, ys, rng=6.0, sill=2.0)
    np.testing.assert_allclose(zc, zo2, atol=1e-10)


# ------------------------------------ minhash cap + multi-probe recall

def test_minhash_dedup_cap_preserves_clusters(spark):
    """The production entry caps hot buckets but every kept doc still
    pairs with the bucket representative: duplicate clusters survive."""
    import pandas as pd
    from geotrellis_spark.operators import dedup

    docs = pd.DataFrame({
        "doc_id": range(40),
        "text": ["the same boilerplate text repeated verbatim here"] * 30
                + [f"unique document number {i} with its own words" for i in range(10)],
    })
    df = spark.createDataFrame(docs)
    capped = dedup.minhash_dedup(df, max_bucket=5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    exact = {(r["doc_a"], r["doc_b"])
             for r in dedup.minhash_candidates(df).collect()}
    assert pairs <= exact
    # far fewer pairs than the quadratic exact enumeration...
    assert len(pairs) < len(exact)
    # ...but every duplicate doc is still reachable from doc 0 (the
    # bucket representative): cluster connectivity preserved
    linked = {b for a, b in pairs if a == 0} | {0}
    assert linked >= set(range(1, 5))  # at least the kept bucket members


def test_multiprobe_recall_not_below_bucketed(spark):
    """Flip-1 probing can only ADD candidates, so per-query recall vs
    the exact top-k is >= the single-bucket LSH's recall."""
    from geotrellis_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["q_id"], r["vec_id"])
             for r in similarity.cosine_topk(emb).collect()}
    single = {(r["q_id"], r["vec_id"])
              for r in similarity.lsh_topk(emb).collect()}
    multi = {(r["q_id"], r["vec_id"])
             for r in similarity.multiprobe_topk(emb).collect()}
    rec_single = len(single & exact) / len(exact)
    rec_multi = len(multi & exact) / len(exact)
    assert rec_multi >= rec_single


def test_geo_kriging_custom_basis():
    """GeoKriging role: a caller-supplied drift basis reproduces a
    surface built from those covariates exactly, everywhere."""
    px = np.array([1.0, 6.0, 3.0, 8.0])
    py = np.array([2.0, 1.0, 7.0, 8.0])
    surf = lambda x, y: 5.0 + 2.0 * np.sin(0.3 * x) - 0.7 * y  # noqa: E731
    basis = lambda x, y: np.stack(  # noqa: E731
        [np.ones_like(x), np.sin(0.3 * x), y], axis=-1
    )
    xs = np.arange(10) + 0.5
    ys = (9 - np.arange(10)) + 0.5
    z = raster_ops.universal_kriging(
        px, py, surf(px, py), xs, ys, rng=4.0, sill=1.5, basis_fn=basis
    )
    gx, gy = np.meshgrid(xs, ys)
    np.testing.assert_allclose(z, surf(gx, gy), atol=1e-8)


def test_region_group_layer_8conn(spark):
    """8-connectivity dissolve: diagonal-only connections across both
    a shared edge and the exact 4-tile corner junction merge regions."""
    from geotrellis_spark.operators import iterative

    T = 16
    world = np.zeros((2 * T, 2 * T), dtype=np.uint16)
    # region touching the 4-tile corner diagonally: (15,15) and (16,16)
    world[T - 1, T - 1] = 7
    world[T, T] = 7
    # diagonal step across the vertical edge: (3,15) and (4,16)
    world[3, T - 1] = 9
    world[4, T] = 9
    # plus a background region of value 1 everywhere else
    world[world == 0] = 1
    df = _tile_layer_df(spark, world, T, zoom=1)
    for conn in (4, 8):
        out = iterative.region_group_layer(df, tile_size=T, connectivity=conn)
        got = np.zeros((2 * T, 2 * T), dtype=np.int64)
        for r in out.collect():
            lab = np.frombuffer(bytes(r["labels"]), dtype=np.int64).reshape(T, T)
            got[r["key_row"] * T : (r["key_row"] + 1) * T,
                r["key_col"] * T : (r["key_col"] + 1) * T] = lab
        want = raster_ops.region_group(world, conn)
        fwd, bwd = {}, {}
        for g, w in zip(got.ravel(), want.ravel()):
            assert fwd.setdefault(w, g) == g, (conn, w, g)
            assert bwd.setdefault(g, w) == w, (conn, g, w)
    # and the 8-conn merge genuinely happened
    assert got[T - 1, T - 1] == got[T, T]
    assert got[3, T - 1] == got[4, T]


def test_layer_viewshed_sparse_layer_no_crash(spark):
    """A layer with an ABSENT tile must not shift the canvas origin
    (global indices would silently wrap/crash): present tiles still
    compute, absent terrain blocks sight per NoData semantics."""
    import pandas as pd

    from geotrellis_spark.core import codecs, sfc
    from geotrellis_spark.operators import iterative

    T = 16
    world = np.full((3 * T, 3 * T), 10, dtype=np.uint16)
    rows = []
    for kr in range(3):
        for kc in range(3):
            if (kc, kr) == (1, 1):
                continue  # hole in the middle of the layer
            tile = world[kr * T : (kr + 1) * T, kc * T : (kc + 1) * T]
            rows.append({
                "layer": "dem", "zoom": 2, "key_col": kc, "key_row": kr,
                "cell_id": int(sfc.zorder(kc, kr)),
                "tile": codecs.encode_tile(tile, "raw16"),
                "fmt": "raw16",
            })
    dem_df = spark.createDataFrame(pd.DataFrame(rows))
    out = iterative.layer_viewshed(dem_df, 7, 5, observer_height=2.0,
                                   tile_size=T).collect()
    assert len(out) == 8  # every present tile produced a plane
    planes = {(r["key_col"], r["key_row"]):
              np.frombuffer(bytes(r["visible"]), dtype=bool).reshape(T, T)
              for r in out}
    # the eye's own tile sees itself (flat terrain)
    assert planes[(0, 0)].all()
    # the far corner's rays pass THROUGH the missing tile -> blocked
    assert not planes[(2, 2)].any()
