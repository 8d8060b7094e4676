"""Ellipsoidal Transverse Mercator + UTM — the "proj4 generality"
slice of G1 (SURVEY.md §2.G1).

Reference role: ``geotrellis.proj4`` routes every CRS pair through
proj4j; this engine keeps closed-form numpy transforms instead and
this module widens the registered family beyond the two spherical
world CRSs (LatLng, WebMercator) to the projected CRS class real
rasters actually ship in: WGS84 UTM zones (EPSG 326xx / 327xx).

Math is the public Krüger series in the third flattening ``n`` with
Karney's order-n^6 coefficients ("Transverse Mercator with an
accuracy of a few nanometers", J. Geodesy 2011; the same series
proj/GeographicLib implement), so within a standard UTM zone the
round-trip error is far below one nanometer — verified by the pytest
suite together with series-independent anchors (the WGS84 quarter
meridian, central-meridian scale, hemisphere false northing).

Everything is vectorized float64 numpy; scalars broadcast.
"""

from __future__ import annotations

import math

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563

UTM_K0 = 0.9996
UTM_FE = 500_000.0
UTM_FN_SOUTH = 10_000_000.0


def _tm_constants(a: float, f: float):
    """Rectifying radius A and the Krüger alpha (forward) / beta
    (inverse) series coefficients, order n^6."""
    n = f / (2.0 - f)
    n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
    big_a = a / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0 + n6 / 256.0)
    alpha = np.array([
        n / 2.0 - 2.0 / 3.0 * n2 + 5.0 / 16.0 * n3 + 41.0 / 180.0 * n4
        - 127.0 / 288.0 * n5 + 7891.0 / 37800.0 * n6,
        13.0 / 48.0 * n2 - 3.0 / 5.0 * n3 + 557.0 / 1440.0 * n4
        + 281.0 / 630.0 * n5 - 1983433.0 / 1935360.0 * n6,
        61.0 / 240.0 * n3 - 103.0 / 140.0 * n4 + 15061.0 / 26880.0 * n5
        + 167603.0 / 181440.0 * n6,
        49561.0 / 161280.0 * n4 - 179.0 / 168.0 * n5
        + 6601661.0 / 7257600.0 * n6,
        34729.0 / 80640.0 * n5 - 3418889.0 / 1995840.0 * n6,
        212378941.0 / 319334400.0 * n6,
    ])
    beta = np.array([
        n / 2.0 - 2.0 / 3.0 * n2 + 37.0 / 96.0 * n3 - 1.0 / 360.0 * n4
        - 81.0 / 512.0 * n5 + 96199.0 / 604800.0 * n6,
        1.0 / 48.0 * n2 + 1.0 / 15.0 * n3 - 437.0 / 1440.0 * n4
        + 46.0 / 105.0 * n5 - 1118711.0 / 3870720.0 * n6,
        17.0 / 480.0 * n3 - 37.0 / 840.0 * n4 - 209.0 / 4480.0 * n5
        + 5569.0 / 90720.0 * n6,
        4397.0 / 161280.0 * n4 - 11.0 / 504.0 * n5
        - 830251.0 / 7257600.0 * n6,
        4583.0 / 161280.0 * n5 - 108847.0 / 3991680.0 * n6,
        20648693.0 / 638668800.0 * n6,
    ])
    e = np.sqrt(f * (2.0 - f))
    return big_a, alpha, beta, e


_WGS84_CONSTS = _tm_constants(WGS84_A, WGS84_F)


def tm_forward(
    lon, lat, lon0: float, k0: float = UTM_K0,
    fe: float = UTM_FE, fn: float = 0.0,
    a: float = WGS84_A, f: float = WGS84_F,
):
    """Ellipsoidal Transverse Mercator forward: (lon, lat) degrees ->
    (easting, northing) meters about central meridian ``lon0``.
    Valid well beyond a UTM zone (|lon - lon0| up to tens of degrees);
    breaks down approaching the 90-degree antimeridian singularity."""
    big_a, alpha, _, e = (
        _WGS84_CONSTS if (a, f) == (WGS84_A, WGS84_F)
        else _tm_constants(a, f)
    )
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(
        np.clip(np.asarray(lat, dtype=np.float64), -89.999999, 89.999999)
    )
    s = np.sin(phi)
    # conformal latitude via tau-prime (Karney eq. 7-9)
    tau = np.tan(phi)
    sigma = np.sinh(e * np.arctanh(e * s))
    taup = tau * np.sqrt(1.0 + sigma * sigma) - sigma * np.sqrt(
        1.0 + tau * tau
    )
    xi = np.arctan2(taup, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.hypot(taup, np.cos(lam)))
    xs, es = xi.copy(), eta.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        xs = xs + alpha[j] * np.sin(w * xi) * np.cosh(w * eta)
        es = es + alpha[j] * np.cos(w * xi) * np.sinh(w * eta)
    return fe + k0 * big_a * es, fn + k0 * big_a * xs


def tm_inverse(
    x, y, lon0: float, k0: float = UTM_K0,
    fe: float = UTM_FE, fn: float = 0.0,
    a: float = WGS84_A, f: float = WGS84_F,
):
    """Ellipsoidal Transverse Mercator inverse of :func:`tm_forward`."""
    big_a, _, beta, e = (
        _WGS84_CONSTS if (a, f) == (WGS84_A, WGS84_F)
        else _tm_constants(a, f)
    )
    eta = (np.asarray(x, dtype=np.float64) - fe) / (k0 * big_a)
    xi = (np.asarray(y, dtype=np.float64) - fn) / (k0 * big_a)
    xs, es = xi.copy(), eta.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        xs = xs - beta[j] * np.sin(w * xi) * np.cosh(w * eta)
        es = es - beta[j] * np.cos(w * xi) * np.sinh(w * eta)
    lam = np.arctan2(np.sinh(es), np.cos(xs))
    # conformal -> geodetic latitude: fixed-point on the standard
    # isometric-latitude relation (geometric convergence, ratio ~e^2)
    chi = np.arctan2(np.sin(xs), np.hypot(np.sinh(es), np.cos(xs)))
    t = np.tan(np.pi / 4.0 + chi / 2.0)
    phi = chi
    for _ in range(12):
        sp = e * np.sin(phi)
        phi = 2.0 * np.arctan(
            t * ((1.0 + sp) / (1.0 - sp)) ** (e / 2.0)
        ) - np.pi / 2.0
    return np.degrees(lam) + lon0, np.degrees(phi)


def utm_zone(lon, lat=None) -> np.ndarray:
    """Standard 6-degree UTM zone number for a longitude (1..60).
    The Norway/Svalbard grid exceptions are cartographic conventions,
    not math, and are deliberately not applied — callers pick zones."""
    lon = np.asarray(lon, dtype=np.float64)
    return (np.floor((lon + 180.0) / 6.0).astype(np.int64) % 60) + 1


def utm_central_meridian(zone: int) -> float:
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone must be 1..60, got {zone}")
    return -183.0 + 6.0 * zone


def utm_forward(lon, lat, zone: int, south: bool = False):
    """WGS84 UTM forward (EPSG 326xx north / 327xx south)."""
    return tm_forward(
        lon, lat, utm_central_meridian(zone),
        fn=UTM_FN_SOUTH if south else 0.0,
    )


def utm_inverse(x, y, zone: int, south: bool = False):
    return tm_inverse(
        x, y, utm_central_meridian(zone),
        fn=UTM_FN_SOUTH if south else 0.0,
    )


# ------------------------------------------- polar stereographic

def _ps_t(phi: np.ndarray, e: float) -> np.ndarray:
    """Snyder (1987) eq. 15-9: the isometric-colatitude half-angle
    term of the ellipsoidal polar stereographic."""
    s = e * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - s) / (1.0 + s)
    ) ** (e / 2.0)


def ps_forward(
    lon, lat, lat_ts: float, lon0: float, south: bool = False,
    fe: float = 0.0, fn: float = 0.0,
    a: float = WGS84_A, f: float = WGS84_F,
):
    """Ellipsoidal polar stereographic with a standard parallel
    (Snyder 1987 section 21, eqs 21-33/34): the polar-science CRS
    family (EPSG 3413-style north, EPSG 3031-style south).  For the
    south aspect, coordinates are computed in the mirrored hemisphere
    (phi -> -phi, lambda -> -lambda), the standard trick."""
    e = math.sqrt(f * (2.0 - f))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(
        np.clip(np.asarray(lat, dtype=np.float64), -90.0, 90.0)
    )
    if south:
        lam, phi = -lam, -phi
    phi_ts = math.radians(abs(lat_ts))
    st = e * math.sin(phi_ts)
    t_ts = math.tan(math.pi / 4.0 - phi_ts / 2.0) / (
        (1.0 - st) / (1.0 + st)
    ) ** (e / 2.0)
    m_ts = math.cos(phi_ts) / math.sqrt(1.0 - (e * math.sin(phi_ts)) ** 2)
    rho = a * m_ts * _ps_t(phi, e) / t_ts
    x = rho * np.sin(lam)
    y = -rho * np.cos(lam)
    if south:
        x, y = -x, -y
    return fe + x, fn + y


def ps_inverse(
    x, y, lat_ts: float, lon0: float, south: bool = False,
    fe: float = 0.0, fn: float = 0.0,
    a: float = WGS84_A, f: float = WGS84_F,
):
    e = math.sqrt(f * (2.0 - f))
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    if south:
        x, y = -x, -y
    phi_ts = math.radians(abs(lat_ts))
    st = e * math.sin(phi_ts)
    t_ts = math.tan(math.pi / 4.0 - phi_ts / 2.0) / (
        (1.0 - st) / (1.0 + st)
    ) ** (e / 2.0)
    m_ts = math.cos(phi_ts) / math.sqrt(1.0 - (e * math.sin(phi_ts)) ** 2)
    rho = np.hypot(x, y)
    t = rho * t_ts / (a * m_ts)
    # Snyder eq. 7-9 fixed point for phi (geometric convergence ~e^2)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(12):
        s = e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0)
        )
    lam = np.arctan2(x, -y)
    if south:
        lam, phi = -lam, -phi
    return np.degrees(lam) + lon0, np.degrees(phi)


# the two conventional polar-science parameterizations
POLAR_NORTH = {"lat_ts": 70.0, "lon0": -45.0, "south": False}
POLAR_SOUTH = {"lat_ts": -71.0, "lon0": 0.0, "south": True}


# ------------------------------------------------------- CRS registry

def _parse_utm(name: str) -> tuple[int, bool]:
    body = name.split(":", 1)[1].strip().lower()
    if not body or body[-1] not in "ns":
        raise ValueError(
            f"bad UTM CRS {name!r}: want 'utm:<zone><n|s>' e.g. utm:33n"
        )
    return int(body[:-1]), body[-1] == "s"


def crs_transforms(name: str):
    """(from_lonlat, to_lonlat) numpy transform pair for a CRS name:
    'latlng', 'webmercator', or 'utm:<zone><n|s>'.  Both callables take
    and return a coordinate pair of float64 arrays."""
    from .layout import lonlat_to_webmercator, webmercator_to_lonlat

    key = name.strip().lower()
    if key == "latlng":
        ident = lambda x, y: (  # noqa: E731
            np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
        )
        return ident, ident
    if key == "webmercator":
        return lonlat_to_webmercator, webmercator_to_lonlat
    if key.startswith("utm:"):
        zone, south = _parse_utm(key)
        utm_central_meridian(zone)  # validate eagerly
        return (
            lambda lon, lat: utm_forward(lon, lat, zone, south),
            lambda x, y: utm_inverse(x, y, zone, south),
        )
    if key in ("polar:n", "polar:s"):
        ps = POLAR_NORTH if key == "polar:n" else POLAR_SOUTH
        return (
            lambda lon, lat: ps_forward(lon, lat, **ps),
            lambda x, y: ps_inverse(x, y, **ps),
        )
    raise ValueError(
        f"unknown CRS {name!r} "
        "(latlng | webmercator | utm:<zone><n|s> | polar:<n|s>)"
    )
