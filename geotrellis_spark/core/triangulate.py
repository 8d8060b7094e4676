"""Delaunay triangulation + Voronoi diagram (RV10, reference role
``vector/.../triangulation/DelaunayTriangulation.scala`` and
``voronoi/``) — textbook public-domain formulations:

- ``delaunay``      — Bowyer–Watson incremental insertion with a
  super-triangle; returns triangle vertex-index triples. The empty-
  circumcircle property is the pytest oracle.
- ``voronoi_cells`` — bounded Voronoi cell per site by successive
  half-plane clipping of the bounding box with perpendicular
  bisectors (exact for the bounded region; O(n) clips per site —
  right shape for per-tile/per-partition point sets).
"""

from __future__ import annotations

import numpy as np

__all__ = ["delaunay", "voronoi_cells", "clip_halfplane"]


def _circumcircle(p: np.ndarray, a: int, b: int, c: int):
    ax, ay = p[a]
    bx, by = p[b]
    cx, cy = p[c]
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return None
    ux = (
        (ax * ax + ay * ay) * (by - cy)
        + (bx * bx + by * by) * (cy - ay)
        + (cx * cx + cy * cy) * (ay - by)
    ) / d
    uy = (
        (ax * ax + ay * ay) * (cx - bx)
        + (bx * bx + by * by) * (ax - cx)
        + (cx * cx + cy * cy) * (bx - ax)
    ) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2


def delaunay(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer–Watson. ``points``: (n, 2). Returns triangles as sorted
    vertex-index triples (indices into the input array)."""
    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    if n < 3:
        return []
    # super-triangle enclosing everything
    cx, cy = pts.mean(axis=0)
    m = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 100.0
    sup = np.array(
        [[cx - 2 * m, cy - m], [cx + 2 * m, cy - m], [cx, cy + 2 * m]]
    )
    p = np.vstack([pts, sup])
    s0, s1, s2 = n, n + 1, n + 2
    tris: list[tuple[int, int, int]] = [(s0, s1, s2)]
    circ = {(s0, s1, s2): _circumcircle(p, s0, s1, s2)}
    for i in range(n):
        px, py = p[i]
        bad = []
        for t in tris:
            cc = circ[t]
            if cc is not None and (px - cc[0]) ** 2 + (py - cc[1]) ** 2 <= cc[2]:
                bad.append(t)
        # boundary of the cavity = edges appearing exactly once
        edge_count: dict[tuple[int, int], int] = {}
        for a, b, c in bad:
            for e in ((a, b), (b, c), (c, a)):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        for t in bad:
            tris.remove(t)
            del circ[t]
        for (a, b), cnt in edge_count.items():
            if cnt == 1:
                t = tuple(sorted((a, b, i)))
                tris.append(t)
                circ[t] = _circumcircle(p, *t)
    out = [
        t for t in tris if t[0] < n and t[1] < n and t[2] < n
    ]
    return [tuple(sorted(t)) for t in out]


def clip_halfplane(ring: np.ndarray, a: float, b: float, c: float) -> np.ndarray | None:
    """Clip a ring to the half-plane a*x + b*y <= c (Sutherland–Hodgman
    single edge). Returns the clipped ring (open) or None."""
    pts = np.asarray(ring, dtype=np.float64)
    if np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    out: list[tuple[float, float]] = []
    m = pts.shape[0]
    for i in range(m):
        cur = pts[i]
        nxt = pts[(i + 1) % m]
        fc = a * cur[0] + b * cur[1] - c
        fn = a * nxt[0] + b * nxt[1] - c
        if fc <= 0:
            out.append(tuple(cur))
            if fn > 0:
                t = fc / (fc - fn)
                out.append(tuple(cur + t * (nxt - cur)))
        elif fn <= 0:
            t = fc / (fc - fn)
            out.append(tuple(cur + t * (nxt - cur)))
    if len(out) < 3:
        return None
    return np.asarray(out, dtype=np.float64)


def voronoi_cells(
    points: np.ndarray, bbox: tuple[float, float, float, float]
) -> list[np.ndarray | None]:
    """Bounded Voronoi cell (closed ring) per site, clipped to bbox.
    cell(i) = bbox ∩ {x : |x - p_i| <= |x - p_j| for all j} — each
    bisector is one half-plane clip."""
    pts = np.asarray(points, dtype=np.float64)
    xmin, ymin, xmax, ymax = bbox
    base = np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]]
    )
    cells: list[np.ndarray | None] = []
    n = pts.shape[0]
    for i in range(n):
        ring = base
        for j in range(n):
            if i == j or ring is None:
                continue
            # half-plane closer to i than j: 2(pj-pi)·x <= |pj|^2-|pi|^2
            dx, dy = pts[j] - pts[i]
            c = (pts[j] @ pts[j] - pts[i] @ pts[i]) / 2.0
            ring = clip_halfplane(ring, dx, dy, c)
        cells.append(
            None if ring is None else np.vstack([ring, ring[:1]])
        )
    return cells
