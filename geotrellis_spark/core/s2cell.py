"""S2-style cube-face cell IDs — the pole-free global index family
the north-star spec names ("SpaceTimeKey/SpatialKey Z-order and
Hilbert indexing re-expressed as H3/S2 cell IDs").

Reference role: geotrellis.layer key indexes (``ZSpatialKeyIndex``,
``HilbertSpatialKeyIndex``) operate on a lat/lng or mercator lattice,
which degenerates at the poles (cells shrink, key ranges fragment).
This module implements the published S2 construction from scratch —
cube-face decomposition, central projection to face (u, v), the
quadratic (u -> s) re-parameterization that evens out cell areas, and
a Hilbert curve position within the face — giving a global 63-bit id
``face * 4^level + hilbert_pos`` whose cells are near-uniform in area
everywhere on the sphere, with prefix-nesting parents and contiguous
descendant ranges (the range-prune primitive, T13's role globally).

This is the S2 GEOMETRY (faces, projection, quadratic ST, Hilbert
locality), not a bit-for-bit clone of Google's id layout: without a
reference implementation in the sandbox, id-compatibility would be
an unverifiable claim, so the honest contract is the construction +
its invariants (round-trip, nesting, range contiguity, area
uniformity, locality), all pytest-gated.

Pure vectorized numpy; float64 throughout.
"""

from __future__ import annotations

import numpy as np

from .sfc import hilbert_d2xy, hilbert_xy2d

MAX_LEVEL = 30  # 3 bits face + 60 bits position = 63 bits


def _lonlat_to_xyz(lon, lat):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def _face_uv(x, y, z):
    """Cube face (0..5: +x,+y,+z,-x,-y,-z by dominant axis) and the
    central-projection (u, v) in [-1, 1] on that face (published S2
    face/axis conventions)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az), np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4),
                 np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ufn, vfn) in enumerate((
        (lambda: y / x, lambda: z / x),        # +x
        (lambda: -x / y, lambda: z / y),       # +y
        (lambda: -x / z, lambda: -y / z),      # +z
        (lambda: z / x, lambda: y / x),        # -x
        (lambda: z / y, lambda: -x / y),       # -y
        (lambda: -y / z, lambda: -x / z),      # -z
    )):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ufn()[m]
                v[m] = vfn()[m]
    return face, u, v


def _uv_from_face(face, u, v):
    """Inverse of :func:`_face_uv`: unit-sphere direction (unnormalized
    is fine for lon/lat extraction)."""
    one = np.ones_like(u)
    xs = [one, -u, -u, -one, v, v]
    ys = [u, one, -v, -v, -one, u]
    zs = [v, v, one, -u, -u, -one]
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    face = np.asarray(face)
    for f in range(6):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = xs[f][m], ys[f][m], zs[f][m]
    return x, y, z


def _u_to_s(u):
    """S2's quadratic re-parameterization: linear-in-u cells are ~5.2x
    larger at face centers than corners; the quadratic evens the areas
    (max/min ~2.1)."""
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(0.0, 1.0 + 3.0 * u)),
        1.0 - 0.5 * np.sqrt(np.maximum(0.0, 1.0 - 3.0 * u)),
    )


def _s_to_u(s):
    return np.where(
        s >= 0.5,
        (4.0 * s * s - 1.0) / 3.0,
        (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0,
    )


def s2_cell(lon, lat, level: int) -> np.ndarray:
    """Cell id at ``level``: face * 4^level + hilbert_position."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be 0..{MAX_LEVEL}, got {level}")
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _face_uv(x, y, z)
    n = np.int64(1) << level
    i = np.clip((_u_to_s(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((_u_to_s(v) * n).astype(np.int64), 0, n - 1)
    if level == 0:
        return face
    return face * (np.int64(1) << (2 * level)) + hilbert_xy2d(level, i, j)


def s2_decode(cell, level: int):
    """(face, i, j) of a cell id."""
    cell = np.asarray(cell, dtype=np.int64)
    if level == 0:
        z = np.zeros_like(cell)
        return cell, z, z
    face = cell >> (2 * level)
    pos = cell & ((np.int64(1) << (2 * level)) - 1)
    i, j = hilbert_d2xy(level, pos)
    return face, i, j


def s2_center(cell, level: int):
    """(lon, lat) of the cell center."""
    face, i, j = s2_decode(cell, level)
    n = float(1 << level)
    u = _s_to_u((np.asarray(i, dtype=np.float64) + 0.5) / n)
    v = _s_to_u((np.asarray(j, dtype=np.float64) + 0.5) / n)
    x, y, z = _uv_from_face(face, u, v)
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat


def s2_parent(cell, level: int, delta: int = 1) -> np.ndarray:
    """Parent id ``delta`` levels up — a pure shift, because the
    Hilbert position prefix-nests (each parent's four children are
    consecutive on the curve)."""
    if delta < 0 or delta > level:
        raise ValueError(f"delta must be 0..{level}, got {delta}")
    return np.asarray(cell, dtype=np.int64) >> (2 * delta)


def _cell_lonlat_box(cell: int, level: int, samples: int = 9):
    """Conservative lon/lat bounding box of one cell: its ij-perimeter
    sampled ``samples`` points per edge, dilated by the largest gap
    between adjacent samples (the smooth boundary cannot wander further
    between samples than their spacing at these curvatures).  A cell
    whose samples reach a pole gets the full longitude range."""
    n = 1 << level
    fa, ia, ja = s2_decode(np.array([cell], dtype=np.int64), level)
    face, i, j = int(fa[0]), int(ia[0]), int(ja[0])
    t = np.linspace(0.0, 1.0, samples)
    per = np.concatenate([
        np.stack([i + t, np.full_like(t, float(j))], 1),
        np.stack([np.full_like(t, i + 1.0), j + t], 1),
        np.stack([i + 1.0 - t, np.full_like(t, j + 1.0)], 1),
        np.stack([np.full_like(t, float(i)), j + 1.0 - t], 1),
    ])
    u = _s_to_u(per[:, 0] / n)
    v = _s_to_u(per[:, 1] / n)
    x, y, z = _uv_from_face(np.full(len(per), face, np.int64), u, v)
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    # dilation: max angular step between neighboring samples
    dlat = np.abs(np.diff(lat)).max()
    dlon = np.abs((np.diff(lon) + 180.0) % 360.0 - 180.0).max()
    pad = float(max(dlat, dlon))
    # a cell containing a pole (the (s,t)=(0.5,0.5) point of face 2 or
    # 5) spans every longitude; its boundary lats bound the other edge
    if face in (2, 5) and i <= n / 2 <= i + 1 and j <= n / 2 <= j + 1:
        if face == 2:
            return -180.0, float(lat.min()) - pad, 180.0, 90.0
        return -180.0, -90.0, 180.0, float(lat.max()) + pad
    if np.abs(np.diff(lon)).max() > 180.0:  # crosses the antimeridian:
        # express lons in [0, 360) — the caller's +/-360 shifts match
        lonw = np.where(lon < 0.0, lon + 360.0, lon)
        return (
            float(lonw.min()) - pad, float(lat.min()) - pad,
            float(lonw.max()) + pad, float(lat.max()) + pad,
        )
    return (
        float(lon.min()) - pad, float(lat.min()) - pad,
        float(lon.max()) + pad, float(lat.max()) + pad,
    )


def s2_cover(
    bbox: tuple[float, float, float, float], level: int
) -> np.ndarray:
    """Cells at ``level`` conservatively covering a lon/lat box
    (lon0, lat0, lon1, lat1), found by recursive refinement from the
    six faces with a dilated-bbox intersection test — the CellUnion
    role: feed :func:`s2_range`/``merge_ranges`` for a prune-then-
    refine scan (T13's MergeQueue on the sphere).  Conservative
    (superset) by construction; the pytest gate proves empirically
    that every point inside the box lands in a cover cell.  No
    antimeridian-wrapping query boxes (split the box first)."""
    lon0, lat0, lon1, lat1 = (float(v) for v in bbox)
    if lon0 > lon1:
        raise ValueError("antimeridian-wrapping bbox: split it first")
    out: list[int] = []
    stack: list[tuple[int, int]] = [(f, 0) for f in range(6)]
    while stack:
        cell, lvl = stack.pop()
        cx0, cy0, cx1, cy1 = _cell_lonlat_box(cell, lvl)
        # lon overlap with 360-wrap candidates
        lon_hit = any(
            cx0 + s <= lon1 and cx1 + s >= lon0
            for s in (-360.0, 0.0, 360.0)
        )
        if not (lon_hit and cy0 <= lat1 and cy1 >= lat0):
            continue
        if lvl == level:
            out.append(int(cell))
        else:
            stack.extend(
                (cell * 4 + k, lvl + 1) for k in range(4)
            )
    return np.array(sorted(out), dtype=np.int64)


def s2_cover_polygon(ring, level: int) -> np.ndarray:
    """Cells at ``level`` conservatively covering a simple lon/lat
    polygon (exterior ring, (n,2) array) — the polygon twin of
    :func:`s2_cover`/:func:`s2_cover_cap`. Refinement keeps a cell
    when its dilated lon/lat box EXACTLY intersects the polygon
    (core.geom.polygons_intersect on the box rectangle, tried at the
    three +-360 lon shifts): the dilated box is a superset of the true
    cell region, so the cover is a superset of the truly-intersecting
    cells — refine downstream pays for the slack. Holes never widen a
    polygon, so covering the exterior ring is conservative for any
    polygon-with-holes. No antimeridian-wrapping rings (split first,
    like s2_cover)."""
    from . import geom as G

    ext = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(ext[0], ext[-1]):
        ext = np.vstack([ext, ext[:1]])
    poly_wkb = G.wkb_write_polygon([ext])
    px0, py0 = ext.min(axis=0)
    px1, py1 = ext.max(axis=0)
    out: list[int] = []
    stack: list[tuple[int, int]] = [(f, 0) for f in range(6)]
    while stack:
        cell, lvl = stack.pop()
        cx0, cy0, cx1, cy1 = _cell_lonlat_box(cell, lvl)
        hit = False
        for s in (-360.0, 0.0, 360.0):
            if cx0 + s > px1 or cx1 + s < px0 or cy0 > py1 or cy1 < py0:
                continue
            box = np.array([
                [cx0 + s, cy0], [cx1 + s, cy0],
                [cx1 + s, cy1], [cx0 + s, cy1], [cx0 + s, cy0],
            ])
            if G.polygons_intersect(
                G.wkb_write_polygon([box]), poly_wkb
            ):
                hit = True
                break
        if not hit:
            continue
        if lvl == level:
            out.append(int(cell))
        else:
            stack.extend((cell * 4 + k, lvl + 1) for k in range(4))
    return np.array(sorted(out), dtype=np.int64)


def angular_distance(lon1, lat1, lon2, lat2):
    """Great-circle angular distance in DEGREES (haversine)."""
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dl = np.radians(
        np.asarray(lon2, dtype=np.float64)
        - np.asarray(lon1, dtype=np.float64)
    )
    a = (
        np.sin((p2 - p1) / 2.0) ** 2
        + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    )
    return np.degrees(
        2.0 * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))
    )


def s2_cover_cap(
    lon: float, lat: float, radius_deg: float, level: int
) -> np.ndarray:
    """Cells at ``level`` conservatively covering the spherical cap of
    angular radius ``radius_deg`` around (lon, lat) — the circle twin
    of :func:`s2_cover` (radius queries, geofences, kNN seeds).

    Conservative inclusion: a cell is kept when the haversine distance
    from the cap center to its dilated lon/lat box's clamped point is
    <= radius + the box's degree-diagonal.  Any point of an
    intersecting cell is within diag of the clamped point, so
    intersecting cells can never be excluded (plain-degree diagonal
    over-estimates the angular diagonal — safe); the cost is one ring
    of extra cells, and the exact refine downstream pays for it."""
    lon, lat = float(lon), float(lat)
    out: list[int] = []
    stack: list[tuple[int, int]] = [(f, 0) for f in range(6)]
    while stack:
        cell, lvl = stack.pop()
        cx0, cy0, cx1, cy1 = _cell_lonlat_box(cell, lvl)
        # clamp with the +-360 lon candidates (boxes may be in [0,360))
        best = None
        for s in (-360.0, 0.0, 360.0):
            cl = min(max(lon, cx0 + s), cx1 + s)
            cp = min(max(lat, cy0), cy1)
            d = float(angular_distance(lon, lat, cl, cp))
            best = d if best is None else min(best, d)
        diag = float(np.hypot(cx1 - cx0, cy1 - cy0))
        if best > radius_deg + diag:
            continue
        if lvl == level:
            out.append(int(cell))
        else:
            stack.extend((cell * 4 + k, lvl + 1) for k in range(4))
    return np.array(sorted(out), dtype=np.int64)


def s2_range(cell, level: int, to_level: int):
    """[lo, hi) of the descendants of ``cell`` (at ``level``) at the
    finer ``to_level`` — contiguous, so a cover of S2 cells turns into
    a handful of id ranges the scan can prune on (T13's MergeQueue
    role on the sphere)."""
    if to_level < level:
        raise ValueError("to_level must be >= level")
    cell = np.asarray(cell, dtype=np.int64)
    shift = 2 * (to_level - level)
    return cell << shift, (cell + 1) << shift
