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
    "neighborhood_mask",
    "focal_stat",
    "focal_mean",
    "focal_sum",
    "focal_min",
    "focal_max",
    "focal_median",
    "focal_std",
    "focal_mode",
    "convolve",
    "morans_i_global",
    "morans_i_local",
    "conway",
    "slope",
    "aspect",
    "hillshade",
    "resample_nearest",
    "resample_bilinear",
    "resample_cubic",
    "resample_average",
    "resample_mode",
    "decimate2",
    "euclidean_distance",
    "rasterize_polygon",
    "rasterize_line",
    "rasterize_points",
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
    # bitwise int ops (local/{And,Or,Xor}.scala semantics: operate on
    # the integer cell values; NoData propagates like every local op)
    "and": lambda a, b: np.bitwise_and(a.astype(np.int64), np.int64(b) if np.isscalar(b) else b.astype(np.int64)).astype(np.float64),
    "or": lambda a, b: np.bitwise_or(a.astype(np.int64), np.int64(b) if np.isscalar(b) else b.astype(np.int64)).astype(np.float64),
    "xor": lambda a, b: np.bitwise_xor(a.astype(np.int64), np.int64(b) if np.isscalar(b) else b.astype(np.int64)).astype(np.float64),
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


def if_cell(tile: np.ndarray, cond, value: float, nodata=NODATA_U16) -> np.ndarray:
    """local/IfCell.scala: where ``cond(cell)`` holds, replace the cell
    with ``value``; NoData cells stay NoData."""
    f = _to_float(tile, nodata)
    r = np.where(cond(f), float(value), f)
    return _from_float(np.where(np.isnan(f), np.nan, r), tile.dtype, nodata)


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
            stack_lastaxis = np.moveaxis(f, 0, -1)  # (h, w, n)
            return _window_mode(
                stack_lastaxis, (h, w), pick="max" if stat == "majority" else "min"
            )
    raise ValueError(f"unknown stack stat {stat}")


# ---------------------------------------------------------------- focal

def _windows(padded: np.ndarray, radius: int) -> np.ndarray:
    """(h, w, k, k) sliding windows over a NaN-padded array."""
    k = 2 * radius + 1
    return np.lib.stride_tricks.sliding_window_view(padded, (k, k))


def neighborhood_mask(kind: str, radius: int, **kw) -> np.ndarray:
    """Boolean (k, k) mask selecting the cells of a GeoTrellis
    Neighborhood (``raster/.../mapalgebra/focal/Neighborhood.scala``
    role): square | circle | annulus(inner=) | nesw | wedge(start=,
    end= degrees, counter-clockwise from east)."""
    k = 2 * radius + 1
    dy, dx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    if kind == "square":
        return np.ones((k, k), dtype=bool)
    if kind == "circle":
        return dx * dx + dy * dy <= radius * radius
    if kind == "annulus":
        inner = float(kw.get("inner", 1.0))
        d2 = dx * dx + dy * dy
        return (d2 >= inner * inner) & (d2 <= radius * radius)
    if kind == "nesw":  # plus shape: N/E/S/W arms + center
        return (dx == 0) | (dy == 0)
    if kind == "wedge":
        start = float(kw.get("start", 0.0))
        end = float(kw.get("end", 90.0))
        ang = np.degrees(np.arctan2(-dy, dx)) % 360.0  # CCW from east
        inside = (
            ((ang - start) % 360.0) <= ((end - start) % 360.0)
            if start != end
            else np.ones((k, k), dtype=bool)
        )
        inside = inside & (dx * dx + dy * dy <= radius * radius)
        inside[radius, radius] = True  # center always participates
        return inside
    raise ValueError(f"unknown neighborhood {kind!r}")


def _apply_target(
    result: np.ndarray, tile_f: np.ndarray, target: str
) -> np.ndarray:
    """TargetCell semantics (``focal/TargetCell.scala`` role): compute
    only where the center cell is data ('data') / NoData ('nodata');
    other cells keep their original value."""
    if target == "all":
        return result
    if target == "data":
        return np.where(np.isnan(tile_f), tile_f, result)
    if target == "nodata":
        return np.where(np.isnan(tile_f), result, tile_f)
    raise ValueError(f"unknown target {target!r}")


def focal_stat(
    tile: np.ndarray,
    stat: str,
    radius: int = 1,
    nodata=NODATA_U16,
    neighborhood: str | np.ndarray = "square",
    target: str = "all",
) -> np.ndarray:
    """Focal statistic over any Neighborhood (Square/Circle/Annulus/
    Nesw/Wedge or an explicit (k,k) bool mask); NoData cells excluded
    from the neighborhood; result float64 with NaN where no data cell
    in window. ``target`` gives TargetCell semantics.

    ``tile`` may already be a buffered tile — the caller crops back to
    the center region (BufferTiles contract, SURVEY.md §2.F).
    """
    f = _to_float(tile, nodata)
    padded = np.pad(f, radius, constant_values=np.nan)
    w = _windows(padded, radius).reshape(f.shape + (-1,))
    if isinstance(neighborhood, np.ndarray):
        mask = neighborhood.astype(bool)
    else:
        mask = neighborhood_mask(neighborhood, radius)
    if not mask.all():
        w = np.where(mask.ravel()[None, None, :], w, np.nan)

    def _done(res):
        return _apply_target(res, f, target)

    with np.errstate(invalid="ignore"), np.testing.suppress_warnings() as sup:
        sup.filter(RuntimeWarning)
        if stat == "mean":
            return _done(np.nanmean(w, axis=-1))
        if stat == "sum":
            return _done(np.nansum(w, axis=-1))
        if stat == "min":
            return _done(np.nanmin(w, axis=-1))
        if stat == "max":
            return _done(np.nanmax(w, axis=-1))
        if stat == "median":
            return _done(np.nanmedian(w, axis=-1))
        if stat == "std":
            return _done(np.nanstd(w, axis=-1))
        if stat == "mode":
            return _done(_window_mode(w, f.shape))
    raise ValueError(f"unknown focal stat {stat}")


def _window_mode(
    w: np.ndarray, shape: tuple[int, int], pick: str = "max"
) -> np.ndarray:
    """Vectorized per-window mode/anti-mode (smallest value wins count
    ties, the np.unique/argmax convention): sort each window, run-length
    via boundary diffs — no per-pixel python loop. ``pick='min'`` gives
    the minority (least frequent) value instead."""
    s = np.sort(w, axis=-1)  # NaNs sort to the end
    m = s.shape[-1]
    # run id of each sorted slot (new run where value changes)
    new_run = np.ones(s.shape, dtype=np.int64)
    new_run[..., 1:] = (s[..., 1:] != s[..., :-1]).astype(np.int64)
    run_id = np.cumsum(new_run, axis=-1) - 1  # 0-based run index per slot
    valid = ~np.isnan(s)
    # accumulate run lengths: scatter-add 1 for each valid slot
    flat_counts = np.zeros(s.shape, dtype=np.int64).reshape(-1, m)
    flat_run = run_id.reshape(-1, m)
    flat_valid = valid.reshape(-1, m)
    rows = np.repeat(np.arange(flat_run.shape[0]), m).reshape(-1, m)
    np.add.at(flat_counts, (rows[flat_valid], flat_run[flat_valid]), 1)
    if pick == "max":
        best_run = np.argmax(flat_counts, axis=-1)  # first max = smallest value
    else:  # minority: least frequent existing run (0-count runs excluded)
        best_run = np.argmin(
            np.where(flat_counts > 0, flat_counts, np.iinfo(np.int64).max),
            axis=-1,
        )
    # first slot of each run: where run_id == best_run first occurs
    first_slot = np.argmax(flat_run == best_run[:, None], axis=-1)
    out = s.reshape(-1, m)[np.arange(flat_run.shape[0]), first_slot]
    out = np.where(flat_valid.any(axis=-1), out, np.nan)
    return out.reshape(shape)


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


def convolve(
    tile: np.ndarray,
    kernel: np.ndarray,
    nodata=NODATA_U16,
    target: str = "all",
) -> np.ndarray:
    """Focal convolution (``focal/{Convolve,Kernel}.scala`` role):
    weighted sum of the window, NoData cells skipped (their weight
    contributes nothing — GeoTrellis Kernel semantics). ``kernel`` is a
    (k, k) float array, k odd. Result float64, NaN where the window has
    no data cell."""
    kernel = np.asarray(kernel, dtype=np.float64)
    kh, kw = kernel.shape
    if kh != kw or kh % 2 == 0:
        raise ValueError("convolve kernel must be square with odd size")
    radius = kh // 2
    f = _to_float(tile, nodata)
    padded = np.pad(f, radius, constant_values=np.nan)
    w = _windows(padded, radius).reshape(f.shape + (-1,))
    kv = kernel.ravel()[None, None, :]
    with np.errstate(invalid="ignore"):
        terms = w * kv
        res = np.nansum(terms, axis=-1)
        res = np.where(np.isnan(w).all(axis=-1), np.nan, res)
    return _apply_target(res, f, target)


def morans_i_global(tile: np.ndarray, nodata=NODATA_U16) -> float:
    """Global Moran's I spatial autocorrelation scalar
    (``focal/ScalarMoransICalculation`` role): queen-contiguity binary
    weights (8 neighbors), NoData excluded. I = (n/SumW) *
    sum_ij w_ij z_i z_j / sum_i z_i^2 over deviations z = v - mean."""
    f = _to_float(tile, nodata)
    ok = ~np.isnan(f)
    n = int(ok.sum())
    if n < 2:
        return float("nan")
    z = np.where(ok, f - f[ok].mean(), 0.0)
    # sum over the 8 queen directions of z_i * z_j, and the weight count
    num = 0.0
    sw = 0.0
    h, w_ = f.shape
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            ys = slice(max(0, dy), h + min(0, dy))
            xs = slice(max(0, dx), w_ + min(0, dx))
            ys2 = slice(max(0, -dy), h + min(0, -dy))
            xs2 = slice(max(0, -dx), w_ + min(0, -dx))
            pair_ok = ok[ys, xs] & ok[ys2, xs2]
            num += float((z[ys, xs] * z[ys2, xs2])[pair_ok].sum())
            sw += float(pair_ok.sum())
    den = float((z[ok] ** 2).sum())
    if sw == 0 or den == 0:
        return float("nan")
    return (n / sw) * (num / den)


def morans_i_local(tile: np.ndarray, nodata=NODATA_U16) -> np.ndarray:
    """Local Moran's I per cell (``focal/TileMoransICalculation`` role):
    I_i = z_i * sum_j(w_ij z_j) / (sum z^2 / n), queen weights."""
    f = _to_float(tile, nodata)
    ok = ~np.isnan(f)
    n = int(ok.sum())
    if n < 2:
        return np.full(f.shape, np.nan)
    z = f - f[ok].mean()
    zf = np.where(ok, z, np.nan)
    padded = np.pad(zf, 1, constant_values=np.nan)
    w = _windows(padded, 1).reshape(f.shape + (-1,))
    w = np.delete(w, 4, axis=-1)  # drop the center from the 3x3 window
    with np.errstate(invalid="ignore"):
        lag = np.nansum(w, axis=-1)
    m2 = float((z[ok] ** 2).sum()) / n
    return np.where(ok, z * lag / m2, np.nan)


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


def _resample_separable(
    tile: np.ndarray, out_h: int, out_w: int, kfn, support: int,
    nodata=NODATA_U16,
) -> np.ndarray:
    """Generic separable kernel resampler: taps in
    [-support+1, support]; weights from kfn(offset); per-axis weight
    normalization (so truncated edge windows stay unbiased). Windows
    containing NoData propagate NaN -> NoData (the reference marks
    them NoData)."""
    f = _to_float(tile, nodata)
    h, w = f.shape
    ry = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    rx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.floor(ry).astype(np.int64)
    x0 = np.floor(rx).astype(np.int64)
    fy = ry - y0
    fx = rx - x0
    out = np.zeros((out_h, out_w))
    wy_sum = np.zeros(out_h)
    wx_sum = np.zeros(out_w)
    taps = range(-support + 1, support + 1)
    for j in taps:
        wy_sum += kfn(j - fy)
    for i in taps:
        wx_sum += kfn(i - fx)
    for j in taps:
        wy = (kfn(j - fy) / wy_sum)[:, None]
        yy = np.clip(y0 + j, 0, h - 1)
        row_acc = np.zeros((out_h, out_w))
        for i in taps:
            wx = (kfn(i - fx) / wx_sum)[None, :]
            xx = np.clip(x0 + i, 0, w - 1)
            row_acc += f[np.ix_(yy, xx)] * wx
        out += row_acc * wy
    return _from_float(out, tile.dtype, nodata)


def _keys_kernel(a: float):
    def _k(t: np.ndarray) -> np.ndarray:
        at = np.abs(t)
        return np.where(
            at <= 1,
            (a + 2) * at**3 - (a + 3) * at**2 + 1,
            np.where(at < 2, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
        )
    return _k


def resample_cubic(
    tile: np.ndarray, out_h: int, out_w: int, nodata=NODATA_U16, a: float = -0.5
) -> np.ndarray:
    """Cubic-convolution resample (Keys 1981, the GDAL/GeoTrellis
    CubicConvolution default a=-0.5; ``resample/CubicConvolution
    Resample.scala`` role). Separable 4-tap kernel."""
    return _resample_separable(tile, out_h, out_w, _keys_kernel(a), 2, nodata)


def resample_cubic_spline(
    tile: np.ndarray, out_h: int, out_w: int, nodata=NODATA_U16
) -> np.ndarray:
    """Cubic B-spline resample (``resample/CubicSplineResample.scala``
    role): smoothing 4-tap B-spline kernel (not interpolating — the
    reference's convention)."""

    def _k(t: np.ndarray) -> np.ndarray:
        at = np.abs(t)
        return np.where(
            at <= 1,
            (4 - 6 * at**2 + 3 * at**3) / 6.0,
            np.where(at < 2, (2 - at) ** 3 / 6.0, 0.0),
        )

    return _resample_separable(tile, out_h, out_w, _k, 2, nodata)


def resample_lanczos(
    tile: np.ndarray, out_h: int, out_w: int, nodata=NODATA_U16, a: int = 3
) -> np.ndarray:
    """Lanczos-windowed sinc resample (``resample/LanczosResample.scala``
    role), a=3 (6 taps per axis), per-axis weight normalization."""

    def _k(t: np.ndarray) -> np.ndarray:
        t = np.asarray(t, dtype=np.float64)
        return np.where(
            np.abs(t) < 1e-12,
            1.0,
            np.where(
                np.abs(t) < a,
                a * np.sin(np.pi * t) * np.sin(np.pi * t / a)
                / (np.pi * np.pi * t * t),
                0.0,
            ),
        )

    return _resample_separable(tile, out_h, out_w, _k, a, nodata)


def _resample_block(tile, out_h, out_w, reducer, nodata):
    h, w = tile.shape
    by, bx = h // out_h, w // out_w
    if by * out_h != h or bx * out_w != w:
        raise ValueError("aggregate resample needs integer block ratios")
    f = _to_float(tile, nodata).reshape(out_h, by, out_w, bx)
    with np.errstate(invalid="ignore"), np.testing.suppress_warnings() as sup:
        sup.filter(RuntimeWarning)
        return _from_float(reducer(f), tile.dtype, nodata)


def resample_max(tile, out_h, out_w, nodata=NODATA_U16):
    """Aggregate Max downsample (``resample/MaxResample.scala`` role)."""
    return _resample_block(tile, out_h, out_w,
                           lambda f: np.nanmax(f, axis=(1, 3)), nodata)


def resample_min(tile, out_h, out_w, nodata=NODATA_U16):
    """Aggregate Min downsample (``resample/MinResample.scala`` role)."""
    return _resample_block(tile, out_h, out_w,
                           lambda f: np.nanmin(f, axis=(1, 3)), nodata)


def resample_median(tile, out_h, out_w, nodata=NODATA_U16):
    """Aggregate Median downsample (``resample/MedianResample.scala``)."""
    return _resample_block(tile, out_h, out_w,
                           lambda f: np.nanmedian(f, axis=(1, 3)), nodata)


def resample_sum(tile, out_h, out_w, nodata=NODATA_U16):
    """Aggregate Sum downsample (``resample/SumResample.scala`` role);
    all-NoData blocks stay NoData."""

    def red(f):
        s = np.nansum(f, axis=(1, 3))
        return np.where(np.isnan(f).all(axis=(1, 3)), np.nan, s)

    return _resample_block(tile, out_h, out_w, red, nodata)


def resample_average(
    tile: np.ndarray, out_h: int, out_w: int, nodata=NODATA_U16
) -> np.ndarray:
    """Aggregate downsample: mean of each source block (NoData-aware;
    ``resample/AverageResample.scala`` role). Requires integer block
    ratios (the pyramid case: 2x)."""
    h, w = tile.shape
    by, bx = h // out_h, w // out_w
    if by * out_h != h or bx * out_w != w:
        raise ValueError("resample_average needs integer block ratios")
    f = _to_float(tile, nodata).reshape(out_h, by, out_w, bx)
    with np.errstate(invalid="ignore"), np.testing.suppress_warnings() as sup:
        sup.filter(RuntimeWarning)
        return _from_float(
            np.nanmean(f, axis=(1, 3)), tile.dtype, nodata
        )


def resample_mode(
    tile: np.ndarray, out_h: int, out_w: int, nodata=NODATA_U16
) -> np.ndarray:
    """Aggregate downsample: mode of each source block (NoData-aware,
    smallest value wins ties; ``resample/ModeResample.scala`` role)."""
    h, w = tile.shape
    by, bx = h // out_h, w // out_w
    if by * out_h != h or bx * out_w != w:
        raise ValueError("resample_mode needs integer block ratios")
    f = _to_float(tile, nodata).reshape(out_h, by, out_w, bx)
    blocks = f.transpose(0, 2, 1, 3).reshape(out_h, out_w, by * bx)
    return _from_float(
        _window_mode(blocks, (out_h, out_w)), tile.dtype, nodata
    )


def euclidean_distance(mask: np.ndarray, cw: float = 1.0, ch: float = 1.0) -> np.ndarray:
    """Exact Euclidean distance transform: distance from every cell
    center to the nearest True cell (RV7 ``distance/EuclideanDistance
    Tile`` role, computed per tile). Felzenszwalb & Huttenlocher's
    two-pass separable lower-envelope algorithm (O(n) per scanline,
    public domain formulation). Cells with no feature anywhere -> inf."""

    def _edt1d(frow: np.ndarray) -> np.ndarray:
        n = frow.shape[0]
        d = np.full(n, np.inf)
        v = np.zeros(n, dtype=np.int64)  # locations of parabolas
        zb = np.full(n + 1, np.inf)  # boundaries
        zb[0] = -np.inf
        k = 0
        first = True
        for q in range(n):
            if frow[q] == np.inf:
                continue
            if first:
                v[0] = q
                zb[0], zb[1] = -np.inf, np.inf
                k = 0
                first = False
                continue
            while True:
                p = v[k]
                s = ((frow[q] + q * q) - (frow[p] + p * p)) / (2 * q - 2 * p)
                if s <= zb[k]:
                    k -= 1
                else:
                    break
            k += 1
            v[k] = q
            zb[k] = s
            zb[k + 1] = np.inf
        if first:
            return d
        k = 0
        for q in range(n):
            while zb[k + 1] < q:
                k += 1
            p = v[k]
            d[q] = (q - p) * (q - p) + frow[p]
        return d

    h, w = mask.shape
    f = np.where(mask, 0.0, np.inf)
    # column pass then row pass, with anisotropic cell size folded in
    # by scaling coordinates (distance in cw/ch units)
    tmp = np.empty((h, w))
    for x in range(w):
        tmp[:, x] = _edt1d(f[:, x]) * (ch * ch)
    out = np.empty((h, w))
    for y in range(h):
        out[y, :] = _edt1d(tmp[y, :] / (cw * cw)) * (cw * cw)
    return np.sqrt(out)


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


def rasterize_points(
    pxs: np.ndarray, pys: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Burn points into the cell grid (RV1 point branch): a point marks
    the cell whose extent contains it (floor math on the cell lattice;
    xs ascending cell-center x, ys descending cell-center y)."""
    cols = xs.shape[0]
    rows = ys.shape[0]
    cw = xs[1] - xs[0] if cols > 1 else 1.0
    ch = ys[0] - ys[1] if rows > 1 else 1.0
    x0 = xs[0] - cw / 2.0
    y1 = ys[0] + ch / 2.0  # top edge
    c = np.floor((np.asarray(pxs, dtype=np.float64) - x0) / cw).astype(np.int64)
    r = np.floor((y1 - np.asarray(pys, dtype=np.float64)) / ch).astype(np.int64)
    ok = (c >= 0) & (c < cols) & (r >= 0) & (r < rows)
    mask = np.zeros((rows, cols), dtype=bool)
    mask[r[ok], c[ok]] = True
    return mask


def rasterize_line(
    pts: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Burn a polyline into the cell grid (RV1 line branch): dense
    sampling at sub-cell steps marks every cell the line passes through
    (the DDA role, vectorized — each segment sampled at ~2 samples per
    cell-width)."""
    cols = xs.shape[0]
    rows = ys.shape[0]
    cw = xs[1] - xs[0] if cols > 1 else 1.0
    ch = ys[0] - ys[1] if rows > 1 else 1.0
    step = min(cw, ch) / 2.0
    mask = np.zeros((rows, cols), dtype=bool)
    p = np.asarray(pts, dtype=np.float64)
    for i in range(p.shape[0] - 1):
        (ax, ay), (bx, by) = p[i], p[i + 1]
        n = max(int(np.hypot(bx - ax, by - ay) / step) + 1, 2)
        t = np.linspace(0.0, 1.0, n)
        mask |= rasterize_points(ax + t * (bx - ax), ay + t * (by - ay), xs, ys)
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


# ----------------------------------------------------------- hydrology
# Reference role: raster/src/main/scala/geotrellis/raster/hydrology/
# {Fill,FlowDirection,Accumulation}.scala (upstream layout; mount
# empty) — reimplemented from the published D8 algorithms.

_D8_OFF = (  # (dr, dc, esri_code, distance)
    (0, 1, 1, 1.0), (1, 1, 2, 2 ** 0.5), (1, 0, 4, 1.0),
    (1, -1, 8, 2 ** 0.5), (0, -1, 16, 1.0), (-1, -1, 32, 2 ** 0.5),
    (-1, 0, 64, 1.0), (-1, 1, 128, 2 ** 0.5),
)


def hydro_fill(dem: np.ndarray, threshold: float = 0.0) -> np.ndarray:
    """Fill single-cell pits: a cell strictly lower than ALL 8
    neighbors by more than ``threshold`` is raised to its lowest
    neighbor. One vectorized pass (the reference Fill's semantics —
    repeated application converges for multi-pass filling)."""
    z = dem.astype(np.float64)
    p = np.pad(z, 1, mode="edge")
    nmin = np.full_like(z, np.inf)
    for dr, dc, _code, _d in _D8_OFF:
        nmin = np.minimum(nmin, p[1 + dr : 1 + dr + z.shape[0],
                                  1 + dc : 1 + dc + z.shape[1]])
    pit = z < nmin - threshold
    return np.where(pit, nmin, z)


def flow_direction(dem: np.ndarray, cw: float = 1.0, ch: float = 1.0) -> np.ndarray:
    """D8 flow direction (ESRI encoding E=1 SE=2 S=4 SW=8 W=16 NW=32
    N=64 NE=128): the neighbor with the steepest positive drop
    (drop / distance; distance is the true per-direction step —
    cw east-west, ch north-south, hypot(cw, ch) diagonal — so
    anisotropic cells rank directions correctly); ties and flats
    resolve to the LOWEST code (deterministic). Cells with no
    downslope neighbor (pits) get 0."""
    z = dem.astype(np.float64)
    p = np.pad(z, 1, mode="edge")
    best = np.zeros_like(z)
    code = np.zeros(z.shape, dtype=np.int32)
    for dr, dc, c, _dist in _D8_OFF:
        d = float(np.hypot(dc * cw, dr * ch))
        drop = (z - p[1 + dr : 1 + dr + z.shape[0],
                      1 + dc : 1 + dc + z.shape[1]]) / d
        better = drop > best
        best = np.where(better, drop, best)
        code = np.where(better, c, code)
    return code


def flow_accumulation(
    fdir: np.ndarray,
    weights: np.ndarray | None = None,
    max_iters: int | None = None,
) -> np.ndarray:
    """Upstream-unit count per cell from a D8 direction grid
    (Accumulation's semantics: a cell's value = units generated by
    cells whose flow path passes through it, NOT counting its own).
    ``weights``: units each cell generates (default 1 — plain upstream
    cell count; the layer op injects cross-tile inflow here).
    Vectorized fixed-point: each round pushes every cell's
    (weight + acc) to its receiver; converges in longest-flow-path
    rounds. Cycles (possible only on synthetic dir grids) are cut by
    the iteration cap."""
    h, w = fdir.shape
    if max_iters is None:
        max_iters = h * w  # longest possible path
    wt = (
        np.ones((h, w), dtype=np.int64)
        if weights is None
        else weights.astype(np.int64)
    )
    acc = np.zeros((h, w), dtype=np.int64)
    rows, cols = np.indices((h, w))
    rcv_r = np.full((h, w), -1)
    rcv_c = np.full((h, w), -1)
    for dr, dc, c, _d in _D8_OFF:
        m = fdir == c
        rcv_r = np.where(m, rows + dr, rcv_r)
        rcv_c = np.where(m, cols + dc, rcv_c)
    inside = (
        (rcv_r >= 0) & (rcv_r < h) & (rcv_c >= 0) & (rcv_c < w)
    )
    src = inside.nonzero()
    tgt = (rcv_r[src], rcv_c[src])
    for _ in range(max_iters):
        new = np.zeros_like(acc)
        np.add.at(new, tgt, wt[src] + acc[src])
        if np.array_equal(new, acc):
            break
        acc = new
    return acc
