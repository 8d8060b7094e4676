"""Per-tile raster analysis ops — pure numpy kernels (run inside the
Spark operators' pandas UDFs).

Reference reimplementations (upstream 3.x layout, SURVEY.md §0):

- ``region_group``   — RV4 ``raster/.../regiongroup/RegionGroup.scala``:
  label connected equal-value regions (4- or 8-connectivity), two-pass
  union-find.
- ``cost_distance``  — RV5 ``raster/.../costdistance/CostDistance.scala``:
  Dijkstra over a friction surface from source cells (tile-level; the
  iterative layer version exchanges borders — post-MVP).
- ``idw``            — RV8 ``raster/.../interpolation/
  InverseDistanceWeighted.scala``: inverse-distance-weighted surface
  from a point set.
- ``histogram_equalize`` / ``histogram_match`` / ``sigmoidal_contrast``
  — G5 ``raster/.../{equalization,matching,sigmoidal}/``.
- ``color_map_rgba`` — G6 ``raster/.../render/ColorMap.scala``: value
  breaks -> RGBA via LUT.
- ``crop`` / ``mask_by_geom`` / ``convert_cells`` — G3 tile-shaping.
"""

from __future__ import annotations

import heapq

import numpy as np

from . import kernels
from .kernels import NODATA_U16


def region_group(tile: np.ndarray, connectivity: int = 4, nodata=NODATA_U16) -> np.ndarray:
    """Label 4/8-connected equal-value regions; NoData cells get label 0;
    labels are 1..K in first-visit (row-major) order.

    Vectorized min-label propagation with pointer jumping (label =
    smallest flat index reachable in the region; doubling convergence,
    ~log2(n) sweeps of pure numpy ops — no per-pixel python loop)."""
    h, w = tile.shape
    nod = kernels.is_nodata(tile, nodata)
    data = ~nod
    lab = np.where(data, np.arange(h * w, dtype=np.int64).reshape(h, w), -1)
    offsets = [(0, 1), (1, 0)]
    if connectivity == 8:
        offsets += [(1, 1), (1, -1)]

    def slices(dr: int, dc: int):
        sa = (slice(max(0, -dr), h - max(0, dr)),
              slice(max(0, -dc), w - max(0, dc)))
        sb = (slice(max(0, dr), h - max(0, -dr)),
              slice(max(0, dc), w - max(0, -dc)))
        return sa, sb

    eqs = []
    for dr, dc in offsets:
        sa, sb = slices(dr, dc)
        eqs.append((sa, sb, (tile[sa] == tile[sb]) & data[sa] & data[sb]))

    while True:
        prev = lab
        m = lab.copy()
        for sa, sb, eq in eqs:
            a, b = m[sa], lab[sb]
            np.minimum(a, np.where(eq, b, a), out=a)
            b2, a2 = m[sb], lab[sa]
            np.minimum(b2, np.where(eq, a2, b2), out=b2)
        flat = m.ravel()
        ok = flat >= 0
        flat[ok] = flat[flat[ok]]  # pointer jump: follow label-of-label
        flat[ok] = flat[flat[ok]]
        lab = flat.reshape(h, w)
        if np.array_equal(lab, prev):
            break
    # renumber densely: region roots are their min flat index, which is
    # also the region's first row-major visit -> sorted roots = 1..K
    roots = np.unique(lab[lab >= 0])
    out = np.zeros((h, w), dtype=np.int64)
    if roots.size:
        out[lab >= 0] = np.searchsorted(roots, lab[lab >= 0]) + 1
    return out


def vectorize_tile(
    tile: np.ndarray, connectivity: int = 4, nodata=NODATA_U16
) -> list[tuple[float, list[np.ndarray]]]:
    """RV3 vectorize (``raster/.../vectorize/`` role): trace each
    connected equal-value region into polygon rings (exterior + holes)
    in PIXEL-CORNER coordinates ((col, row), row increasing down; the
    caller maps to world coords via the layout affine).

    Boundary-following: every region cell emits its exposed edges
    directed with the region interior on the LEFT; stitching start ->
    end (preferring the left turn at ambiguous corner junctions) yields
    closed loops. The largest-|area| loop is the exterior, the rest are
    holes. Even-odd rasterization of the result reproduces the region
    mask exactly (the property the tests assert)."""
    labels = region_group(tile, connectivity, nodata)
    out: list[tuple[float, list[np.ndarray]]] = []
    nlab = int(labels.max())
    for lab in range(1, nlab + 1):
        m = labels == lab
        rs, cs = np.nonzero(m)
        value = float(tile[rs[0], cs[0]])
        out.append((value, trace_mask_rings(m)))
    return out


def trace_mask_rings(m: np.ndarray) -> list[np.ndarray]:
    """Boundary-trace one boolean region mask into rings (exterior
    first, then holes), pixel-corner coordinates — the core of
    vectorize_tile, reusable on cross-tile assembled masks."""
    h, w = m.shape
    pad = np.zeros((h + 2, w + 2), dtype=bool)
    pad[1:-1, 1:-1] = m
    # exposed edges, interior on the left (y-down coords):
    edges: dict[tuple, list[tuple]] = {}

    def add(p, q):
        edges.setdefault(p, []).append(q)

    up_exposed = m & ~pad[:-2, 1:-1]
    dn_exposed = m & ~pad[2:, 1:-1]
    lf_exposed = m & ~pad[1:-1, :-2]
    rt_exposed = m & ~pad[1:-1, 2:]
    for r, c in zip(*np.nonzero(up_exposed)):
        add((c, r), (c + 1, r))          # top edge, rightward
    for r, c in zip(*np.nonzero(rt_exposed)):
        add((c + 1, r), (c + 1, r + 1))  # right edge, downward
    for r, c in zip(*np.nonzero(dn_exposed)):
        add((c + 1, r + 1), (c, r + 1))  # bottom edge, leftward
    for r, c in zip(*np.nonzero(lf_exposed)):
        add((c, r + 1), (c, r))          # left edge, upward
    rings: list[np.ndarray] = []
    while edges:
        start = next(iter(edges))
        ring = [start]
        cur = start
        prev_dir = None
        while True:
            outs = edges[cur]
            if len(outs) == 1 or prev_dir is None:
                nxt = outs.pop()
            else:
                # ambiguous corner: prefer the LEFT turn relative to
                # the incoming direction (keeps loops face-consistent)
                def turn(q):
                    dx, dy = q[0] - cur[0], q[1] - cur[1]
                    # cross(prev_dir, new_dir); y-down => left turn < 0
                    return prev_dir[0] * dy - prev_dir[1] * dx
                outs.sort(key=turn)
                nxt = outs.pop(0)
            if not edges[cur]:
                del edges[cur]
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            if nxt == start:
                break
            ring.append(nxt)
            cur = nxt
        # drop collinear midpoints (unit edges merge into runs)
        arr = np.asarray(ring, dtype=np.float64)
        keep = np.ones(len(arr), dtype=bool)
        for i in range(len(arr)):
            a = arr[i - 1]
            b = arr[i]
            cpt = arr[(i + 1) % len(arr)]
            if (b[0] - a[0]) * (cpt[1] - a[1]) == (b[1] - a[1]) * (cpt[0] - a[0]):
                keep[i] = False
        rings.append(arr[keep])
    # exterior = largest |area|; holes follow
    rings.sort(key=lambda r: -abs(G_shoelace(r)))
    return rings


def G_shoelace(ring: np.ndarray) -> float:
    r = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    x, y = r[:-1, 0], r[:-1, 1]
    x1, y1 = r[1:, 0], r[1:, 1]
    return float(0.5 * np.sum(x * y1 - x1 * y))


def cost_distance(
    friction: np.ndarray, sources: list[tuple[int, int]], nodata=NODATA_U16
) -> np.ndarray:
    """Dijkstra accumulated cost from source cells over a friction
    surface (cost to move between adjacent cells = mean friction *
    distance; diagonal distance = sqrt(2)). NoData friction blocks."""
    f = kernels._to_float(friction, nodata)
    h, w = f.shape
    dist = np.full((h, w), np.inf)
    for r, c in sources:
        dist[r, c] = 0.0
    return cost_distance_seeded(f, dist)


def cost_distance_seeded(f: np.ndarray, seed: np.ndarray) -> np.ndarray:
    """Dijkstra relaxation from ALL cells with finite seed cost (the
    border-exchange primitive of RV5 IterativeCostDistance): returns
    the element-wise best of seed and any cheaper path through the
    tile. ``f`` is float friction with NaN blocking."""
    h, w = f.shape
    dist = seed.astype(np.float64).copy()
    pq: list[tuple[float, int, int]] = []
    for r, c in zip(*np.nonzero(np.isfinite(dist))):
        heapq.heappush(pq, (float(dist[r, c]), int(r), int(c)))
    moves = [
        (-1, 0, 1.0), (1, 0, 1.0), (0, -1, 1.0), (0, 1, 1.0),
        (-1, -1, 2**0.5), (-1, 1, 2**0.5), (1, -1, 2**0.5), (1, 1, 2**0.5),
    ]
    while pq:
        d, r, c = heapq.heappop(pq)
        if d > dist[r, c]:
            continue
        fc = f[r, c]
        if np.isnan(fc):
            continue
        for dr, dc, mult in moves:
            nr, nc = r + dr, c + dc
            if not (0 <= nr < h and 0 <= nc < w):
                continue
            fn = f[nr, nc]
            if np.isnan(fn):
                continue
            nd = d + mult * 0.5 * (fc + fn)
            if nd < dist[nr, nc]:
                dist[nr, nc] = nd
                heapq.heappush(pq, (nd, nr, nc))
    return dist


def idw(
    px: np.ndarray, py: np.ndarray, pv: np.ndarray,
    xs: np.ndarray, ys: np.ndarray, power: float = 2.0, eps: float = 1e-12,
) -> np.ndarray:
    """Inverse-distance-weighted interpolation of points (px,py,pv)
    onto the cell-center lattice (xs ascending, ys descending).
    Fully vectorized: (rows, cols, npoints) weight tensor."""
    gx, gy = np.meshgrid(xs, ys)
    d2 = (gx[..., None] - px) ** 2 + (gy[..., None] - py) ** 2
    exact = d2 <= eps
    w = 1.0 / np.maximum(d2, eps) ** (power / 2.0)
    out = (w * pv).sum(axis=-1) / w.sum(axis=-1)
    hit = exact.any(axis=-1)
    if hit.any():
        idx = exact.argmax(axis=-1)
        out[hit] = pv[idx[hit]]
    return out


def viewshed(
    dem: np.ndarray,
    vr: int,
    vc: int,
    observer_height: float = 0.0,
    nodata=NODATA_U16,
    samples_per_cell: float = 2.0,
) -> np.ndarray:
    """RV6 Viewshed (``raster/.../viewshed/`` role, tile-level): a cell
    is visible iff no sampled point on the line of sight to the
    viewpoint rises above the sight line (R3 sampled line-of-sight with
    bilinear terrain interpolation — the dense-sampling formulation of
    the reference's ray method). Vectorized over whole rows of cells;
    NoData terrain blocks sight. Returns bool (h, w)."""
    f = kernels._to_float(dem, nodata)
    h, w = f.shape
    eye = f[vr, vc] + observer_height
    if np.isnan(eye):
        return np.zeros((h, w), dtype=bool)
    out = np.zeros((h, w), dtype=bool)
    cols = np.arange(w, dtype=np.float64)
    fn = np.where(np.isnan(f), np.inf, f)  # NoData blocks
    for r in range(h):
        dx = cols - vc
        dy = float(r - vr)
        dist = np.hypot(dx, dy)
        n = max(int(dist.max() * samples_per_cell), 1)
        t = (np.arange(1, n) / n)[:, None]  # interior sample fractions
        sx = vc + t * dx[None, :]
        sy = vr + t * dy
        x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 2)
        y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 2)
        fx = sx - x0
        fy = sy - y0
        w00 = (1 - fy) * (1 - fx)
        w01 = (1 - fy) * fx
        w10 = fy * (1 - fx)
        w11 = fy * fx
        c00, c01 = fn[y0, x0], fn[y0, x0 + 1]
        c10, c11 = fn[y0 + 1, x0], fn[y0 + 1, x0 + 1]
        # Per-corner masking: a NoData (inf) corner blocks only when its
        # bilinear weight is > 0 — letting inf flow through the weighted
        # sum would yield inf*0 = NaN on grid-line samples and wrongly
        # mark the cell visible. Interpolate finite values separately.
        nodata_hit = (
            ((w00 > 0) & np.isinf(c00))
            | ((w01 > 0) & np.isinf(c01))
            | ((w10 > 0) & np.isinf(c10))
            | ((w11 > 0) & np.isinf(c11))
        )
        terrain = (
            np.where(np.isinf(c00), 0.0, c00) * w00
            + np.where(np.isinf(c01), 0.0, c01) * w01
            + np.where(np.isinf(c10), 0.0, c10) * w10
            + np.where(np.isinf(c11), 0.0, c11) * w11
        )
        sight = eye + t * (f[r, :][None, :] - eye)  # LOS elevation at t
        # only samples strictly before the target cell can block it
        before = t * dist[None, :] < (dist[None, :] - 0.5)
        blocked = ((nodata_hit | (terrain > sight + 1e-9)) & before).any(axis=0)
        out[r, :] = ~blocked & ~np.isnan(f[r, :])
    out[vr, vc] = not np.isnan(f[vr, vc])
    return out


def spherical_variogram(h: np.ndarray, rng: float, sill: float, nugget: float) -> np.ndarray:
    """Spherical semivariogram gamma(h) (``vector/.../interpolation/
    Semivariogram.scala`` role)."""
    h = np.asarray(h, dtype=np.float64)
    inside = nugget + (sill - nugget) * (1.5 * h / rng - 0.5 * (h / rng) ** 3)
    return np.where(h == 0.0, 0.0, np.where(h < rng, inside, sill))


def ordinary_kriging(
    px: np.ndarray, py: np.ndarray, pv: np.ndarray,
    xs: np.ndarray, ys: np.ndarray,
    rng: float = 100.0, sill: float = 1.0, nugget: float = 0.0,
) -> np.ndarray:
    """Ordinary kriging of sample points onto the cell-center lattice
    (RV8, ``vector/.../interpolation/OrdinaryKriging.scala`` role) with
    a spherical variogram. One (n+1)x(n+1) system solved once; the
    prediction for every grid cell is then a single matmul — exact
    interpolator (reproduces sample values at sample locations)."""
    n = px.shape[0]
    dxy = np.hypot(px[:, None] - px[None, :], py[:, None] - py[None, :])
    a = np.full((n + 1, n + 1), 1.0)
    a[:n, :n] = spherical_variogram(dxy, rng, sill, nugget)
    a[n, n] = 0.0
    gx, gy = np.meshgrid(xs, ys)
    d0 = np.hypot(gx[..., None] - px, gy[..., None] - py)  # (rows, cols, n)
    b = np.concatenate(
        [
            spherical_variogram(d0, rng, sill, nugget),
            np.ones(d0.shape[:2] + (1,)),
        ],
        axis=-1,
    )
    wts = np.linalg.solve(a, b.reshape(-1, n + 1).T).T  # (cells, n+1)
    out = (wts[:, :n] * pv[None, :]).sum(axis=-1)
    return out.reshape(gx.shape)


def simple_kriging(
    px: np.ndarray, py: np.ndarray, pv: np.ndarray,
    xs: np.ndarray, ys: np.ndarray, mean: float,
    rng: float = 100.0, sill: float = 1.0, nugget: float = 0.0,
) -> np.ndarray:
    """Simple kriging with KNOWN mean (RV8 ``SimpleKriging.scala``
    role): residuals r = v - mean, weights from the covariance system
    C w = c0 (C = sill - gamma), prediction = mean + w.r."""
    n = px.shape[0]
    dxy = np.hypot(px[:, None] - px[None, :], py[:, None] - py[None, :])
    cmat = sill - spherical_variogram(dxy, rng, sill, nugget)
    gx, gy = np.meshgrid(xs, ys)
    d0 = np.hypot(gx[..., None] - px, gy[..., None] - py)
    c0 = sill - spherical_variogram(d0, rng, sill, nugget)
    wts = np.linalg.solve(cmat, c0.reshape(-1, n).T).T
    return mean + (wts * (pv - mean)[None, :]).sum(axis=-1).reshape(gx.shape)


def universal_kriging(
    px: np.ndarray, py: np.ndarray, pv: np.ndarray,
    xs: np.ndarray, ys: np.ndarray,
    rng: float = 100.0, sill: float = 1.0, nugget: float = 0.0,
    drift: str = "linear", basis_fn=None,
) -> np.ndarray:
    """Universal kriging (RV8, ``vector/.../interpolation/
    UniversalKriging.scala`` role): ordinary kriging augmented with a
    polynomial DRIFT model — the kriging system is extended with the
    drift basis F evaluated at the samples ([[Gamma, F], [F^T, 0]]),
    and the per-cell RHS carries the basis at the prediction point, so
    the estimator is exact at samples and reproduces any surface inside
    the drift space (a linear trend is predicted exactly everywhere,
    which ordinary kriging reverts to the mean instead).
    drift: 'constant' (== ordinary), 'linear' [1,x,y], 'quadratic'
    adds x^2, xy, y^2.

    ``basis_fn`` (GeoKriging, ``vector/.../interpolation/
    GeoKriging.scala`` role): a caller-supplied ``f(x, y) -> (..., m)``
    drift basis replaces the polynomial — arbitrary geographic
    covariates (distance-to-coast, elevation model, ...) become drift
    terms in the same extended system."""

    def basis(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        if basis_fn is not None:
            return np.asarray(basis_fn(x, y), dtype=np.float64)
        cols = [np.ones_like(x)]
        if drift in ("linear", "quadratic"):
            cols += [x, y]
        if drift == "quadratic":
            cols += [x * x, x * y, y * y]
        elif drift not in ("constant", "linear"):  # pragma: no cover
            raise ValueError(drift)
        return np.stack(cols, axis=-1)

    n = px.shape[0]
    fb = basis(px, py)                       # (n, m)
    m = fb.shape[1]
    dxy = np.hypot(px[:, None] - px[None, :], py[:, None] - py[None, :])
    a = np.zeros((n + m, n + m))
    a[:n, :n] = spherical_variogram(dxy, rng, sill, nugget)
    a[:n, n:] = fb
    a[n:, :n] = fb.T
    gx, gy = np.meshgrid(xs, ys)
    d0 = np.hypot(gx[..., None] - px, gy[..., None] - py)  # (rows, cols, n)
    b = np.concatenate(
        [spherical_variogram(d0, rng, sill, nugget), basis(gx, gy)], axis=-1
    )
    wts = np.linalg.solve(a, b.reshape(-1, n + m).T).T  # (cells, n+m)
    out = (wts[:, :n] * pv[None, :]).sum(axis=-1)
    return out.reshape(gx.shape)


def histogram_equalize(tile: np.ndarray, nodata=NODATA_U16) -> np.ndarray:
    """Global histogram equalization to the full uint16 range (G5)."""
    f = kernels._to_float(tile, nodata)
    ok = ~np.isnan(f)
    if not ok.any():
        return tile.copy()
    vals = f[ok]
    order = np.argsort(vals, kind="stable")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(vals.size)
    eq = ranks / max(vals.size - 1, 1) * 65534.0 + 1.0  # keep 0 = NoData
    out = np.full(f.shape, float(NODATA_U16))
    out[ok] = eq
    return out.astype(tile.dtype)


def histogram_match(
    tile: np.ndarray, ref_cdf_values: np.ndarray, ref_cdf_quantiles: np.ndarray,
    nodata=NODATA_U16,
) -> np.ndarray:
    """Match tile's value distribution to a reference CDF (G5): value ->
    empirical quantile -> reference value at that quantile."""
    f = kernels._to_float(tile, nodata)
    ok = ~np.isnan(f)
    vals = f[ok]
    q = np.searchsorted(np.sort(vals), vals, side="right") / vals.size
    matched = np.interp(q, ref_cdf_quantiles, ref_cdf_values)
    out = np.full(f.shape, float(NODATA_U16))
    out[ok] = matched
    return out.astype(tile.dtype)


def sigmoidal_contrast(
    tile: np.ndarray, alpha: float = 0.5, beta: float = 10.0, nodata=NODATA_U16
) -> np.ndarray:
    """GDAL-style sigmoidal contrast stretch (G5), normalized domain."""
    f = kernels._to_float(tile, nodata)
    x = f / 65535.0
    sig = lambda t: 1.0 / (1.0 + np.exp(beta * (alpha - t)))  # noqa: E731
    lo, hi = sig(0.0), sig(1.0)
    y = (sig(x) - lo) / (hi - lo)
    out = np.where(np.isnan(f), float(NODATA_U16), np.clip(y, 0, 1) * 65535.0)
    return out.astype(tile.dtype)


def color_map_rgba(
    tile: np.ndarray, breaks: np.ndarray, colors: np.ndarray, nodata=NODATA_U16
) -> np.ndarray:
    """ColorMap render (G6): value <= breaks[i] -> colors[i] (RGBA
    uint8); above last break -> last color; NoData -> transparent."""
    f = kernels._to_float(tile, nodata)
    idx = np.searchsorted(breaks, np.nan_to_num(f, nan=0.0), side="left")
    idx = np.minimum(idx, len(colors) - 1)
    rgba = colors[idx]
    rgba = rgba.copy()
    rgba[np.isnan(f)] = (0, 0, 0, 0)
    return rgba.astype(np.uint8)


def crop(tile: np.ndarray, r0: int, c0: int, r1: int, c1: int) -> np.ndarray:
    """G3 crop to a pixel window (end-exclusive)."""
    return tile[r0:r1, c0:c1].copy()


def split(tile: np.ndarray, sub_h: int, sub_w: int) -> list[tuple[int, int, np.ndarray]]:
    """G3 split: slice a tile into a grid of (row_off, col_off, sub)
    subtiles (``raster/.../split/`` role); ragged edges kept smaller."""
    h, w = tile.shape
    out = []
    for r0 in range(0, h, sub_h):
        for c0 in range(0, w, sub_w):
            out.append((r0, c0, tile[r0 : r0 + sub_h, c0 : c0 + sub_w].copy()))
    return out


def normalize(
    tile: np.ndarray, old_min: float, old_max: float,
    new_min: float, new_max: float, nodata=NODATA_U16,
) -> np.ndarray:
    """G3 normalize: linear map [old_min, old_max] -> [new_min, new_max]
    (``raster/.../Tile.normalize`` role); NoData preserved."""
    f = kernels._to_float(tile, nodata)
    span = old_max - old_min
    if span == 0:
        r = np.full(f.shape, new_min, dtype=np.float64)
    else:
        r = (f - old_min) / span * (new_max - new_min) + new_min
    return kernels._from_float(np.where(np.isnan(f), np.nan, r), tile.dtype, nodata)


def rescale(tile: np.ndarray, new_min: float, new_max: float, nodata=NODATA_U16) -> np.ndarray:
    """G3 rescale: normalize from the tile's own min/max."""
    f = kernels._to_float(tile, nodata)
    ok = ~np.isnan(f)
    if not ok.any():
        return tile.copy()
    return normalize(tile, float(f[ok].min()), float(f[ok].max()),
                     new_min, new_max, nodata)


def mask_by_mask(tile: np.ndarray, mask: np.ndarray, inverse: bool = False,
                 nodata=NODATA_U16) -> np.ndarray:
    """G3 mask/inverseMask: cells outside (inside, if inverse) the mask
    become NoData. ``mask`` is the RV1 rasterized geometry."""
    keep = mask.astype(bool) ^ bool(inverse)
    out = tile.copy()
    if np.issubdtype(tile.dtype, np.floating):
        out[~keep] = np.nan
    else:
        out[~keep] = nodata
    return out


def convert_cells(tile: np.ndarray, dtype: str, nodata_out=None,
                  nodata_in=NODATA_U16) -> np.ndarray:
    """G3 convert: celltype change with NoData remap."""
    f = kernels._to_float(tile, nodata_in)
    target = np.dtype(dtype)
    if np.issubdtype(target, np.floating):
        return f.astype(target)
    if nodata_out is None:
        nodata_out = 0
    out = np.where(np.isnan(f), float(nodata_out), np.rint(f))
    info = np.iinfo(target)
    return np.clip(out, info.min, info.max).astype(target)


_MS_TABLE = {
    1: [("left", "top")], 2: [("top", "right")], 3: [("left", "right")],
    4: [("right", "bottom")], 6: [("top", "bottom")],
    7: [("left", "bottom")], 8: [("bottom", "left")],
    9: [("bottom", "top")], 11: [("bottom", "right")],
    12: [("right", "left")], 13: [("right", "top")],
    14: [("top", "left")],
}


def contours(grid: np.ndarray, level: float) -> list[np.ndarray]:
    """Marching-squares iso-contour extraction at ``level``: returns
    polylines ((n,2) arrays of (x, y) in pixel coordinates, y down);
    closed loops repeat their first vertex. Linear interpolation along
    cell edges; saddle cells (cases 5/10) disambiguate by the cell's
    center average (center high => the two high corners CONNECT, so
    the segments isolate the low corners). Cells touching a NaN
    (NoData) corner emit no segments. Chains extend forward AND
    backward from each seed, so open lines assemble regardless of the
    per-cell segment orientation. Not in the GeoTrellis reference —
    complements vectorize/hillshade for raster cartography."""
    z = grid.astype(np.float64)
    h, w = z.shape
    if h < 2 or w < 2:
        return []
    z00 = z[:-1, :-1]
    z01 = z[:-1, 1:]
    z10 = z[1:, :-1]
    z11 = z[1:, 1:]
    case = (
        (z00 >= level).astype(np.int8)
        + 2 * (z01 >= level).astype(np.int8)
        + 4 * (z11 >= level).astype(np.int8)
        + 8 * (z10 >= level).astype(np.int8)
    )
    valid = ~(
        np.isnan(z00) | np.isnan(z01) | np.isnan(z10) | np.isnan(z11)
    )

    def frac(a, b):
        # fraction along the edge a -> b where the level crosses
        return (level - a) / (b - a) if b != a else 0.5

    rows, cols = np.nonzero((case > 0) & (case < 15) & valid)
    segs: list[tuple[tuple, tuple]] = []
    for r, c in zip(rows, cols):
        a, b = z[r, c], z[r, c + 1]
        d, e = z[r + 1, c], z[r + 1, c + 1]
        pts = {
            "top": (c + frac(a, b), float(r)),
            "right": (float(c + 1), r + frac(b, e)),
            "bottom": (c + frac(d, e), float(r + 1)),
            "left": (float(c), r + frac(a, d)),
        }
        cs = int(case[r, c])
        if cs in (5, 10):  # saddle: center average decides pairing
            center_hi = (a + b + d + e) / 4.0 >= level
            if cs == 5:  # TL + BR high
                names = ([("top", "right"), ("left", "bottom")] if center_hi
                         else [("left", "top"), ("bottom", "right")])
            else:        # TR + BL high
                names = ([("left", "top"), ("bottom", "right")] if center_hi
                         else [("top", "right"), ("left", "bottom")])
        else:
            names = _MS_TABLE[cs]
        segs.extend((pts[p], pts[q]) for p, q in names)

    # chain endpoint-to-endpoint, forward from each seed's tail and
    # backward from its head (quantized keys beat float jitter)
    def key(p):
        return (round(p[0] * 1048576), round(p[1] * 1048576))

    by_start: dict[tuple, list[int]] = {}
    by_end: dict[tuple, list[int]] = {}
    for i, (p, q) in enumerate(segs):
        by_start.setdefault(key(p), []).append(i)
        by_end.setdefault(key(q), []).append(i)

    out: list[np.ndarray] = []
    used = set()

    def take(pool, kk):
        for j in pool.get(kk, []):
            if j not in used:
                used.add(j)
                return j
        return None

    for i, (p0, q0) in enumerate(segs):
        if i in used:
            continue
        used.add(i)
        line = [p0, q0]
        while True:  # forward
            j = take(by_start, key(line[-1]))
            if j is None:
                break
            line.append(segs[j][1])
            if key(line[-1]) == key(line[0]):
                break
        if key(line[-1]) != key(line[0]):
            while True:  # backward from the head
                j = take(by_end, key(line[0]))
                if j is None:
                    break
                line.insert(0, segs[j][0])
        out.append(np.asarray(line, dtype=np.float64))
    return out
