"""Vector geometry — from-scratch numpy (no shapely/JTS available).

Covers the subset of GeoTrellis's vector surface the engine needs
(reference, upstream 3.x layout — SURVEY.md §0: ``vector/src/main/scala/
geotrellis/vector/{Geometry,Extent}.scala``, ``io/wkb/WKB.scala``,
``methods/`` predicate sugar; the heavy lifting upstream is JTS):

- WKB read/write for Point / LineString / Polygon / MultiPolygon
  (little-endian, the public OGC spec).
- ``points_in_polygon`` — vectorized even-odd ray casting of a point
  batch against one polygon (with holes). Edge convention matches the
  classic crossing rule GeoTrellis inherits from JTS for cell-center
  tests: a point exactly on a horizontal edge is handled by the
  half-open (ymin, ymax] crossing test (boundary points fall SOUTH,
  matching the floor((90-lat)/180*n) key-row convention).
- ``clip_polygon_to_rect`` — Sutherland–Hodgman rectangle clip
  (ClipToGrid's per-cell clip, ``spark/.../clip/ClipToGrid.scala``).
- bbox / shoelace area / centroid / point-segment distance.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "wkb_write_polygon",
    "wkb_write_point",
    "wkb_read",
    "points_in_polygon",
    "points_in_rings",
    "clip_polygon_to_rect",
    "polygon_bbox",
    "shoelace_area",
    "polygon_centroid",
    "point_segment_distance",
]

_GEOM_POINT = 1
_GEOM_LINESTRING = 2
_GEOM_POLYGON = 3
_GEOM_MULTIPOINT = 4
_GEOM_MULTILINESTRING = 5
_GEOM_MULTIPOLYGON = 6


def wkb_write_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _GEOM_POINT, x, y)


def wkb_write_polygon(rings: list[np.ndarray]) -> bytes:
    """rings: list of (n,2) float64 arrays, first = exterior; rings are
    closed automatically if the last vertex != first."""
    out = [struct.pack("<BII", 1, _GEOM_POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", ring.shape[0]))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def _read_ring(buf: memoryview, off: int) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    pts = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return pts.astype(np.float64), off + 16 * n


def wkb_read(wkb: bytes):
    """Parse WKB -> (kind, payload).

    kind 'point' -> (x, y); 'linestring' -> (n,2) array;
    'polygon' -> list[(n,2)] rings; 'multipolygon' -> list[list[rings]].
    """
    buf = memoryview(wkb)
    byte_order, gtype = struct.unpack_from("<BI", buf, 0)
    if byte_order != 1:
        raise ValueError("big-endian WKB not supported")
    gtype &= 0xFF  # strip SRID/Z flags
    off = 5
    if gtype == _GEOM_POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return "point", (x, y)
    if gtype == _GEOM_LINESTRING:
        pts, _ = _read_ring(buf, off)
        return "linestring", pts
    if gtype == _GEOM_POLYGON:
        (nrings,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _read_ring(buf, off)
            rings.append(ring)
        return "polygon", rings
    if gtype == _GEOM_MULTIPOLYGON:
        (npolys,) = struct.unpack_from("<I", buf, off)
        off += 4
        polys = []
        for _ in range(npolys):
            _, ptype = struct.unpack_from("<BI", buf, off)
            if (ptype & 0xFF) != _GEOM_POLYGON:
                raise ValueError("multipolygon member is not a polygon")
            off += 5
            (nrings,) = struct.unpack_from("<I", buf, off)
            off += 4
            rings = []
            for _ in range(nrings):
                ring, off = _read_ring(buf, off)
                rings.append(ring)
            polys.append(rings)
        return "multipolygon", polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _crossings(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing parity of each point vs one ring. Vectorized
    over points; loops over edges (rings are small, point batches big)."""
    inside = np.zeros(px.shape, dtype=bool)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    for i in range(x0.shape[0]):
        a, b, c, d = x0[i], y0[i], x1[i], y1[i]
        if b == d:
            continue  # horizontal edge never crosses the half-open test
        # half-open (ymin, ymax]: a point exactly on a horizontal
        # boundary falls in the SOUTH polygon, matching the
        # floor((90-lat)/180*n) key-row convention and the SQL oracles
        cond = (py > min(b, d)) & (py <= max(b, d))
        if not cond.any():
            continue
        # x coordinate where the edge crosses the point's horizontal ray
        t = (py - b) / (d - b)
        xc = a + t * (c - a)
        inside ^= cond & (px < xc)
    return inside


def points_in_rings(px, py, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd PIP of a point batch vs a polygon given as ring list
    (exterior + holes). Returns bool mask."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        inside ^= _crossings(px, py, ring)
    return inside


def points_in_polygon(px, py, wkb: bytes) -> np.ndarray:
    kind, payload = wkb_read(wkb)
    if kind == "polygon":
        return points_in_rings(px, py, payload)
    if kind == "multipolygon":
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        inside = np.zeros(px.shape, dtype=bool)
        for rings in payload:
            inside |= points_in_rings(px, py, rings)
        return inside
    raise ValueError(f"PIP needs polygonal geometry, got {kind}")


def clip_polygon_to_rect(
    ring: np.ndarray, xmin: float, ymin: float, xmax: float, ymax: float
) -> np.ndarray | None:
    """Sutherland–Hodgman clip of one (convex or concave) ring against an
    axis-aligned rectangle. Returns the clipped ring (closed) or None."""
    pts = np.asarray(ring, dtype=np.float64)
    if np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]

    def clip_edge(poly: list, inside_fn, intersect_fn) -> list:
        out = []
        n = len(poly)
        for i in range(n):
            cur, nxt = poly[i], poly[(i + 1) % n]
            cin, nin = inside_fn(cur), inside_fn(nxt)
            if cin:
                out.append(cur)
                if not nin:
                    out.append(intersect_fn(cur, nxt))
            elif nin:
                out.append(intersect_fn(cur, nxt))
        return out

    def ix(p, q, x):
        t = (x - p[0]) / (q[0] - p[0])
        return (x, p[1] + t * (q[1] - p[1]))

    def iy(p, q, y):
        t = (y - p[1]) / (q[1] - p[1])
        return (p[0] + t * (q[0] - p[0]), y)

    poly = [tuple(p) for p in pts]
    for inside_fn, intersect_fn in (
        (lambda p: p[0] >= xmin, lambda p, q: ix(p, q, xmin)),
        (lambda p: p[0] <= xmax, lambda p, q: ix(p, q, xmax)),
        (lambda p: p[1] >= ymin, lambda p, q: iy(p, q, ymin)),
        (lambda p: p[1] <= ymax, lambda p, q: iy(p, q, ymax)),
    ):
        poly = clip_edge(poly, inside_fn, intersect_fn)
        if not poly:
            return None
    arr = np.asarray(poly, dtype=np.float64)
    return np.vstack([arr, arr[:1]])


def polygon_bbox(wkb: bytes) -> tuple[float, float, float, float]:
    kind, payload = wkb_read(wkb)
    if kind == "polygon":
        ext = payload[0]
    elif kind == "multipolygon":
        ext = np.vstack([rings[0] for rings in payload])
    elif kind == "linestring":
        ext = payload
    elif kind == "point":
        x, y = payload
        return x, y, x, y
    else:  # pragma: no cover
        raise ValueError(kind)
    return (
        float(ext[:, 0].min()),
        float(ext[:, 1].min()),
        float(ext[:, 0].max()),
        float(ext[:, 1].max()),
    )


def shoelace_area(ring: np.ndarray) -> float:
    """Signed area (positive = counter-clockwise)."""
    r = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    x, y = r[:-1, 0], r[:-1, 1]
    x1, y1 = r[1:, 0], r[1:, 1]
    return float(0.5 * np.sum(x * y1 - x1 * y))


def polygon_centroid(ring: np.ndarray) -> tuple[float, float]:
    r = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    x, y = r[:-1, 0], r[:-1, 1]
    x1, y1 = r[1:, 0], r[1:, 1]
    cross = x * y1 - x1 * y
    a = 0.5 * np.sum(cross)
    if abs(a) < 1e-300:
        return float(x.mean()), float(y.mean())
    cx = np.sum((x + x1) * cross) / (6.0 * a)
    cy = np.sum((y + y1) * cross) / (6.0 * a)
    return float(cx), float(cy)


def point_segment_distance(px, py, ax, ay, bx, by) -> np.ndarray:
    """Distance from point batch to one segment."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    if L2 == 0:
        return np.hypot(px - ax, py - ay)
    t = np.clip(((px - ax) * dx + (py - ay) * dy) / L2, 0.0, 1.0)
    return np.hypot(px - (ax + t * dx), py - (ay + t * dy))
