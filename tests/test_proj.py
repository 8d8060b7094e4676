"""Ellipsoidal Transverse Mercator / UTM (core/proj.py).

The series is validated against series-independent anchors, not
against itself: the published WGS84 quarter meridian, the defined
central-meridian scale k0 (via numerical differentiation against the
closed-form meridian curvature radius), exact central-meridian
easting, east-west symmetry, hemisphere false northing, and
forward/inverse round-trips at double precision."""

import math

import numpy as np
import pytest

from geotrellis_spark.core import proj


def test_roundtrip_double_precision():
    rng = np.random.default_rng(3)
    lon = rng.uniform(9.0, 21.0, 5000)   # zone 33 +/- a zone of slop
    lat = rng.uniform(-80.0, 84.0, 5000)
    x, y = proj.utm_forward(lon, lat, 33)
    lon2, lat2 = proj.utm_inverse(x, y, 33)
    assert np.abs(lon2 - lon).max() < 1e-11
    assert np.abs(lat2 - lat).max() < 1e-11
    xs, ys = proj.utm_forward(lon, lat, 33, south=True)
    lon3, lat3 = proj.utm_inverse(xs, ys, 33, south=True)
    assert np.abs(lon3 - lon).max() < 1e-11


def test_quarter_meridian_anchor():
    """Northing on the central meridian at the pole with k0=1, FN=0 is
    the meridian quadrant: 10,001,965.729 m on WGS84 (published value,
    independent of our series)."""
    _, y = proj.tm_forward(15.0, 89.999999, 15.0, k0=1.0, fe=0.0)
    assert abs(float(y) - 10_001_965.729) < 0.5  # latitude clip ~0.11 m


def test_central_meridian_easting_and_scale():
    lats = np.linspace(-80.0, 80.0, 9)
    x, _ = proj.utm_forward(np.full(9, 15.0), lats, 33)
    assert np.abs(x - proj.UTM_FE).max() == 0.0
    # point scale on the CM == k0: dN/dM with M'(phi) closed-form
    d = 1e-6
    _, y1 = proj.utm_forward(15.0, 45.0, 33)
    _, y2 = proj.utm_forward(15.0, 45.0 + d, 33)
    e2 = proj.WGS84_F * (2.0 - proj.WGS84_F)
    mp = (
        proj.WGS84_A * (1.0 - e2)
        / (1.0 - e2 * math.sin(math.radians(45.0)) ** 2) ** 1.5
        * math.radians(d)
    )
    assert abs(float(y2 - y1) / mp - proj.UTM_K0) < 1e-6


def test_symmetry_and_hemispheres():
    xw, yw = proj.utm_forward(13.0, 47.0, 33)
    xe, ye = proj.utm_forward(17.0, 47.0, 33)
    assert abs((proj.UTM_FE - float(xw)) - (float(xe) - proj.UTM_FE)) < 1e-6
    assert abs(float(yw) - float(ye)) < 1e-6
    xn, yn = proj.utm_forward(15.0, -30.0, 33, south=False)
    xs, ys = proj.utm_forward(15.0, -30.0, 33, south=True)
    assert abs((float(ys) - float(yn)) - proj.UTM_FN_SOUTH) < 1e-9
    assert float(xn) == float(xs)
    # easting shrinks toward the pole (meridian convergence)
    x45, _ = proj.utm_forward(17.0, 45.0, 33)
    x75, _ = proj.utm_forward(17.0, 75.0, 33)
    assert float(x75) < float(x45)


def test_utm_zone_and_cm():
    assert proj.utm_zone(-180.0) == 1
    assert proj.utm_zone(-0.0001) == 30
    assert proj.utm_zone(0.0) == 31
    assert proj.utm_zone(15.0) == 33
    assert proj.utm_zone(179.999) == 60
    assert proj.utm_central_meridian(33) == 15.0
    assert proj.utm_central_meridian(31) == 3.0
    with pytest.raises(ValueError):
        proj.utm_central_meridian(0)


def test_crs_registry():
    fwd, inv = proj.crs_transforms("utm:33n")
    x, y = fwd(np.array([14.0]), np.array([48.0]))
    lon, lat = inv(x, y)
    assert abs(float(lon) - 14.0) < 1e-11
    assert abs(float(lat) - 48.0) < 1e-11

    fwd, inv = proj.crs_transforms("latlng")
    x, y = fwd(np.array([1.0]), np.array([2.0]))
    assert float(x) == 1.0 and float(y) == 2.0

    from geotrellis_spark.core.layout import lonlat_to_webmercator

    fwd, _ = proj.crs_transforms("webmercator")
    assert fwd is lonlat_to_webmercator

    for bad in ("utm:", "utm:33", "utm:61n", "epsg:32633"):
        with pytest.raises(ValueError):
            proj.crs_transforms(bad)


def test_polar_stereographic_roundtrip_and_anchors():
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180.0, 180.0, 5000)
    lat = rng.uniform(35.0, 89.9, 5000)
    x, y = proj.ps_forward(lon, lat, 70.0, -45.0)
    lon2, lat2 = proj.ps_inverse(x, y, 70.0, -45.0)
    assert np.abs((lon2 - lon + 180) % 360 - 180).max() < 1e-11
    assert np.abs(lat2 - lat).max() < 1e-11

    lat_s = rng.uniform(-89.9, -35.0, 5000)
    xs, ys = proj.ps_forward(lon, lat_s, -71.0, 0.0, south=True)
    lon3, lat3 = proj.ps_inverse(xs, ys, -71.0, 0.0, south=True)
    assert np.abs((lon3 - lon + 180) % 360 - 180).max() < 1e-11
    assert np.abs(lat3 - lat_s).max() < 1e-11

    # pole -> origin
    x0, y0 = proj.ps_forward(123.0, 90.0, 70.0, -45.0)
    assert float(x0) == 0.0 and float(y0) == 0.0

    # point scale == 1 exactly at the standard parallel (numerical
    # differentiation along the parallel vs the closed-form arc)
    d = 1e-6
    x1, y1 = proj.ps_forward(10.0, 70.0, 70.0, -45.0)
    x2, y2 = proj.ps_forward(10.0 + d, 70.0, 70.0, -45.0)
    e2 = proj.WGS84_F * (2.0 - proj.WGS84_F)
    nrad = proj.WGS84_A / math.sqrt(
        1.0 - e2 * math.sin(math.radians(70.0)) ** 2
    )
    arc = nrad * math.cos(math.radians(70.0)) * math.radians(d)
    k = math.hypot(float(x2 - x1), float(y2 - y1)) / arc
    assert abs(k - 1.0) < 1e-7

    # rotation equivariance: +90 deg of longitude rotates (x, y) 90 deg
    xa, ya = proj.ps_forward(-45.0, 80.0, 70.0, -45.0)  # lam = 0
    xb, yb = proj.ps_forward(45.0, 80.0, 70.0, -45.0)   # lam = 90
    assert abs(float(xa)) < 1e-9 and float(ya) < 0
    assert abs(float(xb) + float(ya)) < 1e-6 and abs(float(yb)) < 1e-6

    fwd, inv = proj.crs_transforms("polar:s")
    x, y = fwd(np.array([10.0]), np.array([-75.0]))
    lon4, lat4 = inv(x, y)
    assert abs(float(lon4) - 10.0) < 1e-11
    assert abs(float(lat4) + 75.0) < 1e-11
