"""Baseline TIFF codec (core/tiff.py): round-trips, PackBits
primitives, byte orders, Spark transcode path, malformed rejects."""

import numpy as np
import pytest

from geotrellis_spark.core import tiff


@pytest.mark.parametrize("bands", [1, 3])
@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
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


def test_lzw_spec_fixture():
    """Pin the exact TIFF 6.0 section-13 bitstream for a tiny input,
    hand-traced from the spec pseudocode (codes emitted: Clear, 7, 258,
    8, 8, 258, 6, 6, EOI — all 9-bit).  An independent 5-line MSB-first
    bit packer re-derives the expected bytes, so encoder packing, code
    choice, and the early-change schedule are all fixed by the spec,
    not by our own decoder."""
    data = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    codes = [256, 7, 258, 8, 8, 258, 6, 6, 257]
    acc = nacc = 0
    expected = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        nacc += 9
        while nacc >= 8:
            nacc -= 8
            expected.append((acc >> nacc) & 0xFF)
    if nacc:
        expected.append((acc << (8 - nacc)) & 0xFF)
    enc = tiff.lzw_encode(data)
    assert enc == bytes(expected)
    assert tiff.lzw_decode(enc, len(data)) == data


def test_lzw_width_boundaries_and_reset():
    """Round-trips crossing every code-width boundary (9->10->11->12)
    and the 4094-entry table reset.  These streams only decode if the
    decoder's early-change schedule is exactly one entry ahead of the
    encoder's — an off-by-one raises mid-stream (verified: a decoder
    bumping at 511 instead of 510 fails on the random case)."""
    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"a",
        bytes(rng.integers(0, 256, 50_000, dtype=np.uint8)),  # resets
        bytes(rng.integers(0, 4, 100_000, dtype=np.uint8)),
        b"abc" * 40_000,
        bytes(rng.integers(0, 256, 700, dtype=np.uint8)),  # 9->10 only
    ]
    for blob in cases:
        enc = tiff.lzw_encode(blob)
        assert tiff.lzw_decode(enc, len(blob)) == blob
    with pytest.raises(ValueError):
        tiff.lzw_decode(b"\x00\x01", 100)  # truncated


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
