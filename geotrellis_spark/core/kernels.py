"""Per-tile numeric kernels — pure numpy, executed inside pandas/Arrow
UDFs by the Spark operators (never per-row Python; north_rule).

Reference semantics reimplemented (upstream 3.x layout, SURVEY.md §0):

- merge:      ``raster/.../merge/`` — first-non-NoData-wins cell union.
- local ops:  ``raster/.../mapalgebra/local/*.scala`` — elementwise,
  NoData-propagating (any NoData operand => NoData result).
- focal ops:  ``raster/.../mapalgebra/focal/*.scala`` — Square(r)
  neighborhood stencils over buffered tiles; NoData cells excluded from
  the neighborhood statistic (GeoTrellis skips non-data cells).
- slope/aspect/hillshade: Horn's 3x3 method (GDAL-compatible), as in
  ``raster/.../mapalgebra/focal/{Slope,Aspect,Hillshade}.scala``.
- resample:   ``raster/.../resample/`` — NearestNeighbor + Bilinear +
  2x block decimation (pyramid downsample).
- rasterize:  ``raster/.../rasterize/polygon/PolygonRasterizer.scala`` —
  scanline even-odd fill over cell centers.
- zonal:      ``raster/.../mapalgebra/zonal/`` — per-zone partials via
  bincount (map-side partial aggregation; Spark's hash-agg finishes).

NoData convention (D3): float tiles use NaN; integer tiles use an
explicit sentinel (default 0 for uint16 image payloads).
"""

from __future__ import annotations

import numpy as np

NODATA_U16 = 0  # uint16 sentinel (UserDefinedNoData(0))

__all__ = [
    "is_nodata",
    "merge_first_wins",
    "local_binary",
    "local_unary",
    "local_stack_stats",
    "focal_stat",
    "focal_mean",
    "focal_sum",
    "focal_min",
    "focal_max",
    "focal_median",
    "focal_std",
    "focal_mode",
    "conway",
    "slope",
    "aspect",
    "hillshade",
    "resample_nearest",
    "resample_bilinear",
    "decimate2",
    "rasterize_polygon",
    "zonal_partials",
    "NODATA_U16",
]


def is_nodata(a: np.ndarray, nodata=NODATA_U16) -> np.ndarray:
    if np.issubdtype(a.dtype, np.floating):
        return np.isnan(a)
    return a == nodata


def merge_first_wins(a: np.ndarray, b: np.ndarray, nodata=NODATA_U16) -> np.ndarray:
    """Tile.merge: keep a where a has data; fill NoData cells from b."""
    return np.where(is_nodata(a, nodata), b, a)


def _to_float(a: np.ndarray, nodata) -> np.ndarray:
    """Lift to float64 with NaN NoData (kernel-internal representation)."""
    f = a.astype(np.float64)
    if not np.issubdtype(a.dtype, np.floating):
        f[a == nodata] = np.nan
    return f


def _from_float(f: np.ndarray, like_dtype, nodata) -> np.ndarray:
    if np.issubdtype(np.dtype(like_dtype), np.floating):
        return f.astype(like_dtype)
    out = np.where(np.isnan(f), float(nodata), np.rint(f))
    info = np.iinfo(like_dtype)
    return np.clip(out, info.min, info.max).astype(like_dtype)


_BINARY = {
    "add": np.add,
    "subtract": np.subtract,
    "multiply": np.multiply,
    "divide": np.divide,
    "pow": np.power,
    "min": np.fmin,
    "max": np.fmax,
    "equal": lambda a, b: (a == b).astype(np.float64),
    "unequal": lambda a, b: (a != b).astype(np.float64),
    "greater": lambda a, b: (a > b).astype(np.float64),
    "greaterorequal": lambda a, b: (a >= b).astype(np.float64),
    "less": lambda a, b: (a < b).astype(np.float64),
    "lessorequal": lambda a, b: (a <= b).astype(np.float64),
}

_UNARY = {
    "negate": np.negative,
    "abs": np.abs,
    "ceil": np.ceil,
    "floor": np.floor,
    "round": np.rint,
    "log": np.log,
    "log10": np.log10,
    "sqrt": np.sqrt,
    "exp": np.exp,
    "not": lambda a: (a == 0).astype(np.float64),
    "defined": None,  # special-cased
    "undefined": None,
}


def local_binary(op: str, a: np.ndarray, b, nodata=NODATA_U16) -> np.ndarray:
    """Binary local op; b is a tile or a scalar. NoData propagates."""
    fa = _to_float(a, nodata)
    fb = _to_float(np.asarray(b), nodata) if isinstance(b, np.ndarray) else float(b)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = _BINARY[op](fa, fb)
    mask = np.isnan(fa)
    if isinstance(fb, np.ndarray):
        mask = mask | np.isnan(fb)
    r = np.where(mask, np.nan, r)
    return _from_float(r, a.dtype, nodata)


def local_unary(op: str, a: np.ndarray, nodata=NODATA_U16) -> np.ndarray:
    fa = _to_float(a, nodata)
    if op == "defined":
        return (~np.isnan(fa)).astype(np.uint8)
    if op == "undefined":
        return np.isnan(fa).astype(np.uint8)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = _UNARY[op](fa)
    return _from_float(np.where(np.isnan(fa), np.nan, r), a.dtype, nodata)


def local_stack_stats(stack: np.ndarray, stat: str, nodata=NODATA_U16) -> np.ndarray:
    """N-ary local stat over a (n, h, w) stack: mean/variance/variety/
    majority/minority/min/max/sum (NoData-aware)."""
    f = np.stack([_to_float(t, nodata) for t in stack])
    with np.errstate(invalid="ignore"):
        if stat == "mean":
            return np.nanmean(f, axis=0)
        if stat == "sum":
            return np.nansum(f, axis=0)
        if stat == "min":
            return np.nanmin(f, axis=0)
        if stat == "max":
            return np.nanmax(f, axis=0)
        if stat == "variance":
            return np.nanvar(f, axis=0, ddof=1)
        if stat == "variety":
            srt = np.sort(f, axis=0)
            uniq = np.sum(
                (srt[1:] != srt[:-1]) & ~np.isnan(srt[1:]), axis=0
            ) + (~np.isnan(srt[0])).astype(np.int64)
            return uniq.astype(np.float64)
        if stat in ("majority", "minority"):
            h, w = f.shape[1:]
            out = np.full((h, w), np.nan)
            pick = np.argmax if stat == "majority" else np.argmin
            for r in range(h):  # per-row vectorized bincount fallback
                for c in range(w):
                    v = f[:, r, c]
                    v = v[~np.isnan(v)]
                    if v.size:
                        vals, cnt = np.unique(v, return_counts=True)
                        out[r, c] = vals[pick(cnt)]
            return out
    raise ValueError(f"unknown stack stat {stat}")


# ---------------------------------------------------------------- focal

def _windows(padded: np.ndarray, radius: int) -> np.ndarray:
    """(h, w, k, k) sliding windows over a NaN-padded array."""
    k = 2 * radius + 1
    return np.lib.stride_tricks.sliding_window_view(padded, (k, k))


def focal_stat(
    tile: np.ndarray, stat: str, radius: int = 1, nodata=NODATA_U16
) -> np.ndarray:
    """Square(radius) focal statistic; NoData cells excluded from the
    neighborhood; result float64 with NaN where no data cell in window.

    ``tile`` may already be a buffered tile — the caller crops back to
    the center region (BufferTiles contract, SURVEY.md §2.F).
    """
    f = _to_float(tile, nodata)
    padded = np.pad(f, radius, constant_values=np.nan)
    w = _windows(padded, radius).reshape(f.shape + (-1,))
    with np.errstate(invalid="ignore"), np.testing.suppress_warnings() as sup:
        sup.filter(RuntimeWarning)
        if stat == "mean":
            return np.nanmean(w, axis=-1)
        if stat == "sum":
            return np.nansum(w, axis=-1)
        if stat == "min":
            return np.nanmin(w, axis=-1)
        if stat == "max":
            return np.nanmax(w, axis=-1)
        if stat == "median":
            return np.nanmedian(w, axis=-1)
        if stat == "std":
            return np.nanstd(w, axis=-1)
        if stat == "mode":
            out = np.full(f.shape, np.nan)
            for r in range(f.shape[0]):
                for c in range(f.shape[1]):
                    v = w[r, c]
                    v = v[~np.isnan(v)]
                    if v.size:
                        vals, cnt = np.unique(v, return_counts=True)
                        out[r, c] = vals[np.argmax(cnt)]
            return out
    raise ValueError(f"unknown focal stat {stat}")


def focal_mean(tile, radius=1, nodata=NODATA_U16):
    return focal_stat(tile, "mean", radius, nodata)


def focal_sum(tile, radius=1, nodata=NODATA_U16):
    return focal_stat(tile, "sum", radius, nodata)


def focal_min(tile, radius=1, nodata=NODATA_U16):
    return focal_stat(tile, "min", radius, nodata)


def focal_max(tile, radius=1, nodata=NODATA_U16):
    return focal_stat(tile, "max", radius, nodata)


def focal_median(tile, radius=1, nodata=NODATA_U16):
    return focal_stat(tile, "median", radius, nodata)


def focal_std(tile, radius=1, nodata=NODATA_U16):
    return focal_stat(tile, "std", radius, nodata)


def focal_mode(tile, radius=1, nodata=NODATA_U16):
    return focal_stat(tile, "mode", radius, nodata)


def conway(tile: np.ndarray) -> np.ndarray:
    """Game of life (reference test favorite ``focal/Conway.scala``):
    live cell = 1. Standard B3/S23 rules."""
    alive = (tile > 0).astype(np.int64)
    padded = np.pad(alive, 1)
    n = _windows(padded, 1).reshape(alive.shape + (-1,)).sum(axis=-1) - alive
    return (((alive == 1) & ((n == 2) | (n == 3))) | ((alive == 0) & (n == 3))).astype(
        tile.dtype
    )


def _horn_gradients(dem: np.ndarray, cw: float, ch: float, z_factor: float = 1.0):
    p = np.pad(dem.astype(np.float64), 1, mode="edge")
    a = p[:-2, :-2]; b = p[:-2, 1:-1]; c = p[:-2, 2:]
    d = p[1:-1, :-2]; f = p[1:-1, 2:]
    g = p[2:, :-2]; h_ = p[2:, 1:-1]; i = p[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * cw) * z_factor
    dzdy = ((g + 2 * h_ + i) - (a + 2 * b + c)) / (8.0 * ch) * z_factor
    return dzdx, dzdy


def slope(dem: np.ndarray, cw: float = 1.0, ch: float = 1.0, z_factor: float = 1.0):
    """Slope in degrees, Horn's method (GDAL-compatible)."""
    dzdx, dzdy = _horn_gradients(dem, cw, ch, z_factor)
    return np.degrees(np.arctan(np.hypot(dzdx, dzdy)))


def aspect(dem: np.ndarray, cw: float = 1.0, ch: float = 1.0):
    """Aspect in degrees clockwise from north; flat cells -> 0."""
    dzdx, dzdy = _horn_gradients(dem, cw, ch)
    asp = np.degrees(np.arctan2(dzdy, -dzdx))
    asp = np.where(asp < 0, 90.0 - asp, np.where(asp > 90.0, 360.0 - asp + 90.0, 90.0 - asp))
    flat = (dzdx == 0) & (dzdy == 0)
    return np.where(flat, 0.0, asp % 360.0)


def hillshade(
    dem: np.ndarray,
    cw: float = 1.0,
    ch: float = 1.0,
    azimuth: float = 315.0,
    altitude: float = 45.0,
    z_factor: float = 1.0,
):
    """Hillshade 0..255, Horn gradients + standard illumination formula."""
    dzdx, dzdy = _horn_gradients(dem, cw, ch, z_factor)
    slope_r = np.arctan(np.hypot(dzdx, dzdy))
    aspect_r = np.arctan2(dzdy, -dzdx)
    az = np.radians(360.0 - azimuth + 90.0)
    alt = np.radians(altitude)
    shaded = np.sin(alt) * np.cos(slope_r) + np.cos(alt) * np.sin(slope_r) * np.cos(
        az - aspect_r
    )
    return np.clip(255.0 * np.maximum(shaded, 0.0), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- resample

def resample_nearest(tile: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = tile.shape
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return tile[np.ix_(rows, cols)]


def resample_bilinear(
    tile: np.ndarray, out_h: int, out_w: int, nodata=NODATA_U16
) -> np.ndarray:
    f = _to_float(tile, nodata)
    h, w = f.shape
    ry = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    rx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ry).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(rx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ry - y0, 0.0, 1.0)[:, None]
    wx = np.clip(rx - x0, 0.0, 1.0)[None, :]
    tl = f[np.ix_(y0, x0)]; tr = f[np.ix_(y0, x1)]
    bl = f[np.ix_(y1, x0)]; br = f[np.ix_(y1, x1)]
    out = tl * (1 - wy) * (1 - wx) + tr * (1 - wy) * wx + bl * wy * (1 - wx) + br * wy * wx
    return _from_float(out, tile.dtype, nodata)


def bilinear_sample(
    tile: np.ndarray, u: np.ndarray, v: np.ndarray, nodata=NODATA_U16
) -> np.ndarray:
    """Sample ``tile`` at fractional pixel coords (u = col, v = row,
    pixel centers at integers). Out-of-bounds or any-NoData-corner
    samples return NaN. Used by the reproject warp (G1)."""
    f = _to_float(tile, nodata)
    h, w = f.shape
    out = np.full(u.shape, np.nan)
    ok = (u >= -0.5) & (u <= w - 0.5) & (v >= -0.5) & (v <= h - 0.5)
    if not ok.any():
        return out
    uu = np.clip(u[ok], 0, w - 1)
    vv = np.clip(v[ok], 0, h - 1)
    x0 = np.floor(uu).astype(np.int64)
    y0 = np.floor(vv).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = uu - x0
    wy = vv - y0
    val = (
        f[y0, x0] * (1 - wy) * (1 - wx)
        + f[y0, x1] * (1 - wy) * wx
        + f[y1, x0] * wy * (1 - wx)
        + f[y1, x1] * wy * wx
    )
    out[ok] = val
    return out


def nearest_sample(
    tile: np.ndarray, u: np.ndarray, v: np.ndarray, nodata=NODATA_U16
) -> np.ndarray:
    """NearestNeighbor variant of :func:`bilinear_sample`."""
    f = _to_float(tile, nodata)
    h, w = f.shape
    out = np.full(u.shape, np.nan)
    ok = (u >= -0.5) & (u <= w - 0.5) & (v >= -0.5) & (v <= h - 0.5)
    x = np.clip(np.rint(u[ok]).astype(np.int64), 0, w - 1)
    y = np.clip(np.rint(v[ok]).astype(np.int64), 0, h - 1)
    out[ok] = f[y, x]
    return out


def decimate2(tile: np.ndarray) -> np.ndarray:
    """2x downsample by NearestNeighbor (pyramid default: top-left of
    each 2x2 block — matches NN at the parent cell center convention
    used for pyramid tests in FIXTURES.md §F4)."""
    return tile[::2, ::2]


# ------------------------------------------------------------ rasterize

def rasterize_polygon(
    rings: list[np.ndarray],
    xs: np.ndarray,
    ys: np.ndarray,
) -> np.ndarray:
    """Even-odd scanline fill over cell centers.

    xs: cell-center x coords (ascending, tile_cols), ys: cell-center y
    coords (descending, tile_rows). Returns (rows, cols) bool mask.
    Equivalent to PIP of every cell center (the property the reference
    tests assert: rasterized mask == PIP(cell centers))."""
    cols = xs.shape[0]
    rows = ys.shape[0]
    mask = np.zeros((rows, cols), dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        x0, y0 = r[:-1, 0], r[:-1, 1]
        x1, y1 = r[1:, 0], r[1:, 1]
        nz = y0 != y1
        x0, y0, x1, y1 = x0[nz], y0[nz], x1[nz], y1[nz]
        if x0.size == 0:
            continue
        ymin = np.minimum(y0, y1)[None, :]
        ymax = np.maximum(y0, y1)[None, :]
        yc = ys[:, None]
        # half-open (ymin, ymax] crossing rule — must match
        # geom._crossings so rasterize == PIP-of-centers holds exactly
        active = (yc > ymin) & (yc <= ymax)
        t = (yc - y0[None, :]) / (y1 - y0)[None, :]
        xc = x0[None, :] + t * (x1 - x0)[None, :]
        # parity of crossings right of each cell center
        cross = active[:, None, :] & (xs[None, :, None] < xc[:, None, :])
        mask ^= (cross.sum(axis=2) % 2).astype(bool)
    return mask


# ---------------------------------------------------------------- zonal

def zonal_partials(
    values: np.ndarray, zones: np.ndarray, nodata=NODATA_U16
) -> dict[int, tuple[int, float, float, float]]:
    """Per-zone (count, sum, min, max) partials for one tile via bincount
    — the map-side half of Spark's partial+final hash aggregation."""
    v = _to_float(values, nodata).ravel()
    z = zones.astype(np.int64).ravel()
    ok = ~np.isnan(v)
    v, z = v[ok], z[ok]
    if v.size == 0:
        return {}
    uz, inv = np.unique(z, return_inverse=True)
    cnt = np.bincount(inv)
    s = np.bincount(inv, weights=v)
    mins = np.full(uz.shape, np.inf)
    maxs = np.full(uz.shape, -np.inf)
    np.minimum.at(mins, inv, v)
    np.maximum.at(maxs, inv, v)
    return {
        int(uz[i]): (int(cnt[i]), float(s[i]), float(mins[i]), float(maxs[i]))
        for i in range(uz.shape[0])
    }
