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
    labels are 1..K in first-visit (row-major) order."""
    h, w = tile.shape
    labels = np.zeros((h, w), dtype=np.int64)
    nod = kernels.is_nodata(tile, nodata)
    parent: list[int] = [0]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nxt = 1
    for r in range(h):
        for c in range(w):
            if nod[r, c]:
                continue
            v = tile[r, c]
            left = labels[r, c - 1] if c > 0 and tile[r, c - 1] == v else 0
            up = labels[r - 1, c] if r > 0 and tile[r - 1, c] == v else 0
            cand = [x for x in (left, up) if x]
            if connectivity == 8 and r > 0:
                if c > 0 and tile[r - 1, c - 1] == v and labels[r - 1, c - 1]:
                    cand.append(labels[r - 1, c - 1])
                if c + 1 < w and tile[r - 1, c + 1] == v and labels[r - 1, c + 1]:
                    cand.append(labels[r - 1, c + 1])
            if not cand:
                labels[r, c] = nxt
                parent.append(nxt)
                nxt += 1
            else:
                m = min(cand)
                labels[r, c] = m
                for x in cand:
                    union(m, x)
    # second pass: resolve + renumber densely in first-visit order
    remap: dict[int, int] = {}
    out = np.zeros_like(labels)
    k = 1
    for r in range(h):
        for c in range(w):
            lab = labels[r, c]
            if lab == 0:
                continue
            root = find(lab)
            if root not in remap:
                remap[root] = k
                k += 1
            out[r, c] = remap[root]
    return out


def cost_distance(
    friction: np.ndarray, sources: list[tuple[int, int]], nodata=NODATA_U16
) -> np.ndarray:
    """Dijkstra accumulated cost from source cells over a friction
    surface (cost to move between adjacent cells = mean friction *
    distance; diagonal distance = sqrt(2)). NoData friction blocks."""
    f = kernels._to_float(friction, nodata)
    h, w = f.shape
    dist = np.full((h, w), np.inf)
    pq: list[tuple[float, int, int]] = []
    for r, c in sources:
        dist[r, c] = 0.0
        heapq.heappush(pq, (0.0, r, c))
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
