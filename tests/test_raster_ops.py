"""Goldens for region group, cost distance, IDW, contrast/render ops,
and the StreamingHistogram sketch (reference spec roles:
``RegionGroupSpec``, ``CostDistanceSpec``, ``StreamingHistogramSpec``,
``HistogramEqualizationSpec`` — SURVEY.md §5)."""

import numpy as np
import pytest

from geotrellis_spark.core import raster_ops as R
from geotrellis_spark.core.histogram import StreamingHistogram


def test_region_group_4conn():
    t = np.array(
        [[1, 1, 2], [2, 1, 2], [2, 2, 2]], dtype=np.uint16
    )
    labels = R.region_group(t, 4)
    # the 1s form one region; the 2s are 4-connected around the corner
    assert labels[0, 0] == labels[0, 1] == labels[1, 1]
    assert labels[0, 2] == labels[1, 2] == labels[2, 2] == labels[2, 0]
    assert labels[0, 0] != labels[0, 2]


def test_region_group_8conn_diagonal():
    t = np.array([[1, 0], [0, 1]], dtype=np.uint16)  # 0 = NoData
    l4 = R.region_group(t, 4)
    l8 = R.region_group(t, 8)
    assert l4[0, 0] != l4[1, 1]
    assert l8[0, 0] == l8[1, 1]
    assert l4[0, 1] == 0  # NoData unlabeled


def test_region_group_nodata_and_order():
    t = np.array([[5, 0, 5]], dtype=np.uint16)
    labels = R.region_group(t)
    np.testing.assert_array_equal(labels, [[1, 0, 2]])


def test_cost_distance_uniform():
    f = np.ones((3, 3), dtype=np.uint16)
    d = R.cost_distance(f, [(0, 0)])
    assert d[0, 0] == 0.0
    assert d[0, 1] == pytest.approx(1.0)  # mean friction 1 * dist 1
    assert d[1, 1] == pytest.approx(np.sqrt(2))
    assert d[2, 2] == pytest.approx(2 * np.sqrt(2))


def test_cost_distance_barrier():
    f = np.ones((3, 3), dtype=np.uint16)
    f[:, 1] = 0  # NoData column blocks
    d = R.cost_distance(f, [(1, 0)])
    assert np.isinf(d[1, 2])


def test_idw_exact_at_points():
    xs = np.array([0.5, 1.5, 2.5])
    ys = np.array([2.5, 1.5, 0.5])
    out = R.idw(
        np.array([0.5]), np.array([2.5]), np.array([7.0]), xs, ys
    )
    assert out[0, 0] == pytest.approx(7.0)
    # single point -> constant surface
    np.testing.assert_allclose(out, 7.0)


def test_idw_weighting():
    xs = np.array([0.0, 10.0])
    ys = np.array([0.0])
    out = R.idw(
        np.array([0.0, 10.0]), np.array([0.0, 0.0]), np.array([0.0, 100.0]),
        xs, ys,
    )
    assert out[0, 0] == pytest.approx(0.0)
    assert out[0, 1] == pytest.approx(100.0)


def test_histogram_equalize_monotone():
    rng = np.random.default_rng(3)
    t = rng.integers(1, 1000, size=(16, 16)).astype(np.uint16)
    eq = R.histogram_equalize(t)
    a, b = t.ravel(), eq.ravel()
    order = np.argsort(a, kind="stable")
    assert (np.diff(b[order].astype(np.int64)) >= 0).all()
    assert b.min() >= 1 and b.max() <= 65535


def test_sigmoidal_and_colormap():
    t = np.array([[0, 30000, 65535]], dtype=np.uint16)
    s = R.sigmoidal_contrast(t)
    assert s[0, 0] == 0  # NoData preserved
    breaks = np.array([10.0, 100.0])
    colors = np.array([[255, 0, 0, 255], [0, 255, 0, 255]])
    rgba = R.color_map_rgba(
        np.array([[5, 50, 0]], dtype=np.uint16), breaks, colors
    )
    np.testing.assert_array_equal(rgba[0, 0], [255, 0, 0, 255])
    np.testing.assert_array_equal(rgba[0, 1], [0, 255, 0, 255])
    np.testing.assert_array_equal(rgba[0, 2], [0, 0, 0, 0])  # NoData


def test_mask_and_convert():
    t = np.array([[1, 2], [3, 4]], dtype=np.uint16)
    m = np.array([[1, 0], [0, 1]])
    out = R.mask_by_mask(t, m)
    np.testing.assert_array_equal(out, [[1, 0], [0, 4]])
    inv = R.mask_by_mask(t, m, inverse=True)
    np.testing.assert_array_equal(inv, [[0, 2], [3, 0]])
    f = R.convert_cells(t, "float64")
    assert np.isnan(f[0, 0]) == False  # noqa: E712  (1 is data)
    t2 = np.array([[0, 9]], dtype=np.uint16)
    f2 = R.convert_cells(t2, "float32")
    assert np.isnan(f2[0, 0]) and f2[0, 1] == 9.0


def test_streaming_histogram_quantiles():
    rng = np.random.default_rng(11)
    data = rng.normal(100, 15, size=20000)
    h = StreamingHistogram(80)
    # build from 20 partial sketches and merge (the distributed path)
    parts = [
        StreamingHistogram(80).update(chunk) for chunk in np.split(data, 20)
    ]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.total == 20000
    assert merged.mean() == pytest.approx(data.mean(), rel=1e-3)
    for q in (0.1, 0.5, 0.9):
        assert merged.quantile(q) == pytest.approx(
            np.quantile(data, q), rel=0.02
        )
    breaks = merged.quantile_breaks(4)
    assert breaks == sorted(breaks)


def test_streaming_histogram_exact_small():
    h = StreamingHistogram(80).update(np.array([1.0, 1.0, 2.0, 5.0]))
    assert h.total == 4
    assert h.mode() == 1.0
    assert h.mean() == pytest.approx(2.25)


# ------------------------------------------------------- contours

def test_contours_ramp_vertical_line():
    import numpy as np

    from geotrellis_spark.core import raster_ops as R

    # z = x: the 2.5-contour is the vertical line x = 2.5
    z = np.tile(np.arange(6, dtype=float), (5, 1))
    lines = R.contours(z, 2.5)
    pts = np.vstack(lines)
    assert np.allclose(pts[:, 0], 2.5)
    # spans the full height as one chained polyline
    assert max(len(l) for l in lines) >= 5


def test_contours_pyramid_closed_ring():
    import numpy as np

    from geotrellis_spark.core import raster_ops as R

    # pyramid peak in the middle: the mid-level contour is ONE closed
    # ring around the peak
    y, x = np.indices((9, 9)).astype(float)
    z = 8.0 - np.maximum(np.abs(x - 4), np.abs(y - 4)) * 2.0
    lines = R.contours(z, 5.0)
    closed = [l for l in lines
              if np.allclose(l[0], l[-1]) and len(l) > 4]
    assert len(closed) == 1
    ring = closed[0]
    # every vertex lies where the grid linearly crosses 5.0: at
    # chebyshev distance 1.5 from the center
    cheb = np.maximum(np.abs(ring[:, 0] - 4), np.abs(ring[:, 1] - 4))
    assert np.allclose(cheb, 1.5)


def test_contours_level_outside_range_empty():
    import numpy as np

    from geotrellis_spark.core import raster_ops as R

    z = np.zeros((4, 4))
    assert R.contours(z, 10.0) == []
    assert R.contours(z, -10.0) == []


def test_contours_saddle_connects_high_center():
    import numpy as np

    from geotrellis_spark.core import raster_ops as R

    # case 5 (TL+BR high) with high center: the high region is one
    # diagonal band, so the two contour segments must isolate the LOW
    # corners (TR and BL) — i.e. touch the right+top and left+bottom
    # edges respectively, NOT hug the high corners
    z = np.array([[1.0, 0.0], [0.0, 1.0]])
    lines = R.contours(z, 0.5)  # center avg 0.5 >= level -> connected
    assert len(lines) == 2
    for l in lines:
        xs, ys = set(l[:, 0]), set(l[:, 1])
        # each segment joins two ADJACENT edges around a low corner
        assert len(l) == 2
    ends = sorted(tuple(sorted(map(tuple, l))) for l in lines)
    # segment near TR: (x=0.5,y=0)-(x=1,y=0.5); near BL: (0,0.5)-(0.5,1)
    assert ends == [(((0.0, 0.5)), ((0.5, 1.0))), (((0.5, 0.0)), ((1.0, 0.5)))]


def test_contours_nan_cells_skipped():
    import numpy as np

    from geotrellis_spark.core import raster_ops as R

    z = np.array([[1.0, np.nan, 1.0], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0]])
    lines = R.contours(z, 0.5)  # must not raise
    for l in lines:
        assert not np.isnan(l).any()


def test_contours_horizontal_line_chains_fully():
    import numpy as np

    from geotrellis_spark.core import raster_ops as R

    # z = y: segments run against the scan order; backward chaining
    # must still assemble ONE polyline, not per-cell fragments
    z = np.tile(np.arange(5, dtype=float)[:, None], (1, 6))
    lines = R.contours(z, 2.5)
    assert len(lines) == 1 and len(lines[0]) >= 6
    assert np.allclose(lines[0][:, 1], 2.5)
