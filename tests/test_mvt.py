"""MVT sink (operators/vector_tiles.py) + r5 codec extensions: the
Spark per-cell blobs must match an independent clip+quantize
derivation feature-for-feature; zero-area quantized rings must drop
per spec; property types and value-table dedup round-trip. (The base
codec — winding, commands, protobuf wire — is covered in
test_round3_fixes.py from the round the codec landed.)
"""

from __future__ import annotations

import numpy as np
import pytest

from geotrellis_spark.core import geom as G
from geotrellis_spark.core import mvt


def _sq(x0, y0, s=10.0):
    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float
    )


def test_properties_dedupe_and_types():
    feats = [
        {"wkb": G.wkb_write_point(1, 1),
         "props": {"name": "a", "rank": 3, "score": 1.5, "on": True}},
        {"wkb": G.wkb_write_point(2, 2),
         "props": {"name": "b", "rank": 3, "on": False}},
    ]
    blob = mvt.encode_mvt("x", feats, (0, 0, 10, 10))
    layer = mvt.decode_mvt(blob)["x"]
    assert layer["extent"] == mvt.EXTENT
    got = [f["props"] for f in layer["features"]]
    assert got[0] == {"name": "a", "rank": 3, "score": 1.5, "on": True}
    assert got[1] == {"name": "b", "rank": 3, "on": False}
    # 'rank': 3 appears ONCE in the value table (dedup)
    assert blob.count(mvt._value_msg(3)) == 1


def test_zero_area_quantized_ring_drops():
    """A sliver thinner than half a grid cell collapses to zero area
    after quantization — the ring (and a feature losing its exterior)
    must drop rather than emit an invalid polygon."""
    sliver = G.wkb_write_polygon(
        [np.array([[0, 0], [10, 0], [10, 1e-5], [0, 1e-5]])]
    )
    fat = G.wkb_write_polygon([_sq(2, 2, 5)])
    blob = mvt.encode_mvt(
        "t", [{"wkb": sliver, "id": 1}, {"wkb": fat, "id": 2}], (0, 0, 10, 10)
    )
    feats = mvt.decode_mvt(blob)["t"]["features"]
    assert [f["id"] for f in feats] == [2]

    # a hole that collapses drops alone; the exterior survives
    poly = G.wkb_write_polygon(
        [_sq(0, 0, 10), np.array([[4, 4], [6, 4], [6, 4 + 1e-5], [4, 4 + 1e-5]])]
    )
    feats = mvt.decode_mvt(
        mvt.encode_mvt("t", [{"wkb": poly, "id": 7}], (0, 0, 10, 10))
    )["t"]["features"]
    assert feats[0]["ring_roles"] == ["exterior"]


def test_multipolygon_parts_and_roles():
    import struct

    multi = (
        b"\x01" + struct.pack("<II", 6, 2)
        + G.wkb_write_polygon([_sq(0, 0, 2)])
        + G.wkb_write_polygon([_sq(6, 6, 2)])
    )
    feats = mvt.decode_mvt(
        mvt.encode_mvt("m", [{"wkb": multi, "id": 1}], (0, 0, 10, 10))
    )["m"]["features"]
    assert feats[0]["ring_roles"] == ["exterior", "exterior"]


def test_grid_ring_is_encode_mvts_formula():
    ring = _sq(1.23, 4.56, 2.5)
    ext = (0.0, 0.0, 10.0, 10.0)
    g = mvt.grid_ring(ring, ext)
    assert g.dtype == np.int64
    want_x = np.rint(ring[:, 0] / 10 * mvt.EXTENT)
    want_y = np.rint((10 - ring[:, 1]) / 10 * mvt.EXTENT)
    assert np.array_equal(g[:, 0], want_x.astype(np.int64))
    assert np.array_equal(g[:, 1], want_y.astype(np.int64))


def test_spark_vector_tiles(spark):
    """Sink parity: per-cell MVT features == independent clip+quantize
    of each polygon against that cell."""
    from geotrellis_spark.core.geom import clip_polygon_to_rect
    from geotrellis_spark.operators import vector_tiles as vt

    zoom, extent = 3, 4096
    n = 1 << zoom
    rows = []
    for k in range(9):
        lon0 = -170.0 + (k % 3) * 95.0
        lat0 = -80.0 + (k // 3) * 50.0
        ring = np.array(
            [[lon0, lat0], [lon0 + 30, lat0],
             [lon0 + 30, lat0 + 30], [lon0, lat0 + 30]]
        )
        rows.append((k, bytearray(G.wkb_write_polygon([ring]))))
    polys = spark.createDataFrame(rows, "geom_id long, wkb binary")
    tiles = {
        (r["key_col"], r["key_row"]): r
        for r in vt.vector_tiles(polys, zoom, extent).collect()
    }
    assert tiles

    expect: dict[tuple, dict[int, np.ndarray]] = {}
    for k, wkb in rows:
        _, rings = G.wkb_read(bytes(wkb))
        bb = G.polygon_bbox(bytes(wkb))
        c0 = int(np.clip(np.floor((bb[0] + 180) / 360 * n), 0, n - 1))
        c1 = int(np.clip(np.floor((bb[2] + 180) / 360 * n), 0, n - 1))
        r0 = int(np.clip(np.floor((90 - bb[3]) / 180 * n), 0, n - 1))
        r1 = int(np.clip(np.floor((90 - bb[1]) / 180 * n), 0, n - 1))
        for tc in range(c0, c1 + 1):
            for tr in range(r0, r1 + 1):
                text = vt.cell_extent(tc, tr, zoom)
                clipped = clip_polygon_to_rect(
                    rings[0], text[0], text[1], text[2], text[3]
                )
                if clipped is None:
                    continue
                q = mvt.grid_ring(clipped, text, extent)
                if mvt._signed_area(q) == 0:
                    continue  # mirror the sink's sliver drop
                expect.setdefault((tc, tr), {})[k] = q
    assert set(tiles) == set(expect)
    for cell, want in expect.items():
        layer = mvt.decode_mvt(bytes(tiles[cell]["mvt"]))["features"]
        assert tiles[cell]["n_features"] == len(want)
        got = {f["id"]: f for f in layer["features"]}
        assert set(got) == set(want)
        for fid, q in want.items():
            assert got[fid]["ring_roles"] == ["exterior"]
            part = got[fid]["parts"][0]
            # same vertex set (winding/closure normalization aside)
            assert {tuple(v) for v in part} == {tuple(v) for v in q}
