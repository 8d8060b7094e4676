"""Baseline TIFF codec (core/tiff.py): round-trips, PackBits
primitives, byte orders, Spark transcode path, malformed rejects."""

import numpy as np
import pytest

from geotrellis_spark.core import tiff


@pytest.mark.parametrize("bands", [1, 3])
@pytest.mark.parametrize("comp", ["none", "packbits"])
@pytest.mark.parametrize("bo", ["<", ">"])
def test_roundtrip_exact(bands, comp, bo):
    rng = np.random.default_rng(11)
    px = rng.integers(0, 65536, (bands, 70, 41), dtype=np.uint16)
    px[:, :15, :] = 7  # flat region exercises replicate runs
    blob = tiff.tiff_encode(px, compression=comp, rows_per_strip=16,
                            byteorder=bo)
    back = tiff.tiff_decode(blob)
    assert back.dtype == np.uint16 and (back == px).all()


def test_packbits_primitives():
    rng = np.random.default_rng(5)
    cases = [b"", b"\x00" * 300, b"abc" * 3, b"aab",
             bytes(rng.integers(0, 256, 997, dtype=np.uint8))]
    for blob in cases:
        enc = tiff.packbits_encode(blob)
        assert tiff.packbits_decode(enc, len(blob)) == blob
    # 128 header byte is a decoder no-op
    assert tiff.packbits_decode(b"\x80\x00a", 1) == b"a"


def test_single_strip_and_uneven_tail():
    px = np.arange(3 * 50 * 9, dtype=np.uint16).reshape(3, 50, 9)
    blob = tiff.tiff_encode(px, rows_per_strip=64)   # one strip
    assert (tiff.tiff_decode(blob) == px).all()
    blob = tiff.tiff_encode(px, rows_per_strip=7)    # 8 strips, tail 1
    assert (tiff.tiff_decode(blob) == px).all()


def test_malformed_rejects():
    import struct
    with pytest.raises(ValueError):
        tiff.tiff_decode(b"XX" + b"\x00" * 10)
    with pytest.raises(ValueError):
        tiff.tiff_decode(b"II" + struct.pack("<H", 43) + b"\x00" * 8)
    px = np.ones((1, 8, 8), dtype=np.uint16)
    blob = bytearray(tiff.tiff_encode(px))
    with pytest.raises(ValueError):  # truncated strip data
        tiff.tiff_decode(bytes(blob[:20]))
    with pytest.raises(ValueError):
        tiff.packbits_decode(b"\x05ab", 6)  # literal overrun


def test_spark_transcode_raw16_tiff_raw16(spark):
    """Distributed path: raw16 -> tiff -> raw16 is bit-identical,
    multiband rows included."""
    from geotrellis_spark.operators import multimodal as M

    rng = np.random.default_rng(2)
    rows = []
    for i in range(6):
        bands = 3 if i % 2 else 1
        px = rng.integers(0, 65536, (bands, 16, 12), dtype=np.uint16)
        rows.append((i, 12, 16, "raw16", bands,
                     bytearray(np.ascontiguousarray(px, "<u2").tobytes())))
    df = spark.createDataFrame(
        rows, "image_id long, w int, h int, fmt string, bands int,"
        " img binary")
    t = M.transcode_image_multiband(df, "tiff")
    back = M.transcode_image_multiband(t, "raw16")
    orig = {r["image_id"]: bytes(r["img"]) for r in df.collect()}
    got = {r["image_id"]: bytes(r["img"]) for r in back.collect()}
    assert orig == got
    fmts = {r["fmt"] for r in t.collect()}
    assert fmts == {"tiff"}
