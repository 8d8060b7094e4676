"""Shapefile codec (core/shapefile.py) + source: .shp/.shx/.dbf
round-trips for point/polyline/polygon (holes, multipolygon winding
regroup), header fields, dBase typing, and the Spark dimension
read/write path against the grid-polygon fixture.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geotrellis_spark.core import geom as G
from geotrellis_spark.core import shapefile as SF


def _sq(x0, y0, s=10.0):
    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]]
    )


def test_point_roundtrip():
    wkbs = [G.wkb_write_point(1.5, -2.25), G.wkb_write_point(-100, 80)]
    shp, shx = SF.shp_encode(wkbs)
    assert struct.unpack_from(">i", shp, 0)[0] == 9994
    assert struct.unpack_from("<i", shp, 32)[0] == SF.SHP_POINT
    back = SF.shp_decode(shp)
    assert [G.wkb_read(b) for b in back] == [G.wkb_read(w) for w in wkbs]
    # shx: one 8-byte entry per record after the 100-byte header
    assert len(shx) == 100 + 8 * 2


def test_polyline_roundtrip():
    lines = [
        G.wkb_write_linestring(np.array([[0, 0], [5, 5], [10, 0]], float))
    ]
    back = SF.shp_decode(SF.shp_encode(lines)[0])
    kind, pts = G.wkb_read(back[0])
    assert kind == "linestring"
    assert np.array_equal(pts, [[0, 0], [5, 5], [10, 0]])


def test_polygon_hole_and_multipolygon_winding():
    outer, hole = _sq(0, 0, 100), _sq(20, 20, 10)
    wkb = G.wkb_write_polygon([outer, hole])
    shp, _ = SF.shp_encode([wkb])
    kind, rings = G.wkb_read(SF.shp_decode(shp)[0])
    assert kind == "polygon" and len(rings) == 2
    # exterior CW (negative y-up area) got normalized on write; decode
    # regrouped it as exterior again and the vertex sets survive
    assert {tuple(v) for v in rings[0][:-1]} == {tuple(v) for v in outer}
    assert {tuple(v) for v in rings[1][:-1]} == {tuple(v) for v in hole}

    # two disjoint exteriors in ONE multipolygon record round-trip
    multi = (
        b"\x01" + struct.pack("<II", 6, 2)
        + G.wkb_write_polygon([_sq(0, 0)])
        + G.wkb_write_polygon([_sq(50, 50)])
    )
    shp2, _ = SF.shp_encode([multi])
    kind, polys = G.wkb_read(SF.shp_decode(shp2)[0])
    assert kind == "multipolygon" and len(polys) == 2


def test_mixed_types_rejected():
    with pytest.raises(ValueError, match="mixed"):
        SF.shp_encode(
            [G.wkb_write_point(0, 0), G.wkb_write_polygon([_sq(0, 0)])]
        )


def test_dbf_roundtrip_types():
    fields = [("NAME", "C", 12, 0), ("POP", "N", 10, 0), ("AREA", "N", 12, 3)]
    rows = [
        {"NAME": "alpha", "POP": 1234, "AREA": 56.125},
        {"NAME": "beta-longer", "POP": 0, "AREA": 0.5},
    ]
    back = SF.dbf_decode(SF.dbf_encode(rows, fields))
    assert back == [
        {"NAME": "alpha", "POP": 1234, "AREA": 56.125},
        {"NAME": "beta-longer", "POP": 0, "AREA": 0.5},
    ]


def test_dbf_numeric_overflow_raises():
    # rjust truncation would silently drop the MOST significant digits
    # (12345 in an N(3) field -> '123'): fail loudly instead
    with pytest.raises(ValueError, match="exceeds declared"):
        SF.dbf_encode([{"POP": 12345}], [("POP", "N", 3, 0)])
    with pytest.raises(ValueError, match="exceeds declared"):
        SF.dbf_encode([{"AREA": 12345.5}], [("AREA", "N", 6, 2)])


def test_full_sidecar_set_and_mismatch_guard():
    wkbs = [G.wkb_write_point(i, i) for i in range(3)]
    files = SF.shapefile_write(wkbs)
    feats = SF.shapefile_read(files["shp"], files["dbf"])
    assert [a for _g, a in feats] == [{"FID": 0}, {"FID": 1}, {"FID": 2}]
    with pytest.raises(ValueError, match="rows for"):
        SF.shapefile_read(
            files["shp"], SF.dbf_encode([{"X": 1}], [("X", "N", 4, 0)])
        )


def test_rejects_non_shapefile():
    with pytest.raises(ValueError, match="file code"):
        SF.shp_decode(b"\x00" * 128)
    with pytest.raises(ValueError, match="dBase"):
        SF.dbf_decode(b"\x7f" + b"\x00" * 64)


def test_spark_dimension_roundtrip(spark):
    from geotrellis_spark.plans.driver_queries import _grid_polys
    from geotrellis_spark.sources import shapefile_source as src

    polys = _grid_polys(spark)  # 1024 grid polygons
    fields = [("GEOM_ID", "N", 10, 0)]
    files = src.write_shapefile(
        polys.selectExpr("geom_id as GEOM_ID", "wkb"),
        attr_fields=fields,
        order_col="GEOM_ID",
    )
    back = src.read_shapefile(spark, files["shp"], files["dbf"])
    got = {r["GEOM_ID"]: bytes(r["wkb"]) for r in back.collect()}
    want = {r["geom_id"]: bytes(r["wkb"]) for r in polys.collect()}
    assert set(got) == set(want)
    for k in want:
        # winding may normalize; vertex sets are preserved
        _, rw = G.wkb_read(want[k])
        _, rg = G.wkb_read(got[k])
        assert {tuple(v) for v in rw[0]} == {tuple(v) for v in rg[0]}

    with pytest.raises(ValueError, match="max_records"):
        src.write_shapefile(polys, max_records=10)


def test_dbf_null_numeric_roundtrip():
    """dBase blank numerics are NULL: None / '' encode as all-spaces
    and decode back to None (regression: int('') used to crash)."""
    shp = SF

    fields = [("POP", "N", 10, 0), ("AREA", "N", 12, 3),
              ("NAME", "C", 8, 0)]
    rows = [
        {"POP": None, "AREA": 1.5, "NAME": "a"},
        {"POP": 7, "AREA": "", "NAME": None},
        {},  # all keys missing
    ]
    back = shp.dbf_decode(shp.dbf_encode(rows, fields))
    assert back[0] == {"POP": None, "AREA": 1.5, "NAME": "a"}
    assert back[1] == {"POP": 7, "AREA": None, "NAME": ""}
    assert back[2] == {"POP": None, "AREA": None, "NAME": ""}


def test_shapefile_write_derives_fields_and_distinct_attr_dicts():
    shp = SF

    wkbs = [
        G.wkb_write_point(1.0, 2.0),
        G.wkb_write_point(3.0, 4.0),
    ]
    blobs = shp.shapefile_write(
        wkbs, attrs=[{"NAME": "ab", "POP": 10}, {"NAME": "c", "POP": None}]
    )
    feats = shp.shapefile_read(blobs["shp"], blobs["dbf"])
    assert feats[0][1] == {"NAME": "ab", "POP": 10}
    assert feats[1][1] == {"NAME": "c", "POP": None}
    # no dbf: each feature gets its OWN attr dict
    feats = shp.shapefile_read(blobs["shp"])
    feats[0][1]["x"] = 1
    assert feats[1][1] == {}


def test_read_shapefile_types_from_descriptors(spark):
    """Column types come from the dbf field descriptors: a blank
    numeric in record 0 must not mistype the column as string."""
    shp = SF
    from geotrellis_spark.sources import shapefile_source

    wkbs = [G.wkb_write_point(0.0, 0.0), G.wkb_write_point(1.0, 1.0)]
    blobs = shp.shapefile_write(
        wkbs,
        attrs=[{"POP": None}, {"POP": 1234}],
        fields=[("POP", "N", 10, 0)],
    )
    df = shapefile_source.read_shapefile(
        spark, blobs["shp"], blobs["dbf"]
    )
    assert dict(df.dtypes)["POP"] == "bigint"
    got = {r["fid"]: r["POP"] for r in df.collect()}
    assert got == {0: None, 1: 1234}
