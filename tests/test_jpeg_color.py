"""Color JPEG (YCbCr 4:2:0/4:4:4) — round-trip, bitstream structure,
and the multiband Spark transcode plumbing."""

import struct

import numpy as np
import pytest

from geotrellis_spark.core import jpeg as J
from geotrellis_spark.core.imagery import psnr, synth_pixels


def _natural_rgb(i: int, w: int = 64, h: int = 48) -> np.ndarray:
    """Natural-ish 3-band synth: structured luma from the synth
    corpus, smooth chroma gradients (real image channels are
    correlated — independent-channel noise is the known 4:2:0 worst
    case, where subsampling discards genuinely independent chroma)."""
    gy = np.linspace(-18, 18, h)[:, None]
    gx = np.linspace(-15, 15, w)[None, :]
    cb = gy + gx * 0.5
    cr = gx - gy * 0.3
    y8 = 30.0 + (synth_pixels(i, w, h) >> 8).astype(np.float64) * 0.74
    return J.ycbcr_to_rgb(y8 - 128.0, cb, cr)


def test_roundtrip_psnr_40db_per_channel_q95_420():
    for i in range(5):
        px = _natural_rgb(i)
        data = J.jpeg_encode_rgb(px, quality=95, subsampling="420")
        out = J.jpeg_decode(data)
        assert out.shape == px.shape
        for c in range(3):
            assert psnr(px[..., c], out[..., c], peak=255.0) >= 40.0, (i, c)


def test_444_beats_420_and_both_roundtrip():
    px = _natural_rgb(3)
    d420 = J.jpeg_encode_rgb(px, quality=90, subsampling="420")
    d444 = J.jpeg_encode_rgb(px, quality=90, subsampling="444")
    p420 = min(
        psnr(px[..., c], J.jpeg_decode(d420)[..., c], peak=255.0)
        for c in range(3)
    )
    p444 = min(
        psnr(px[..., c], J.jpeg_decode(d444)[..., c], peak=255.0)
        for c in range(3)
    )
    assert p444 >= p420
    assert len(d420) < len(d444)  # subsampling actually saves bytes


def test_color_bitstream_structure():
    px = _natural_rgb(1)
    data = J.jpeg_encode_rgb(px, quality=85)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    pos = 2
    markers = []
    sof = None
    dqt_ids = []
    n_dht = 0
    while True:
        marker = data[pos + 1]
        if marker == 0xDA:
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        payload = data[pos + 4 : pos + 2 + ln]
        markers.append(marker)
        if marker == 0xC0:
            sof = payload
        elif marker == 0xDB:
            off = 0
            while off < len(payload):
                dqt_ids.append(payload[off] & 0xF)
                off += 65
        elif marker == 0xC4:
            n_dht += 1
        pos += 2 + ln
    prec, h, w, nc = struct.unpack_from(">BHHB", sof, 0)
    assert (prec, h, w, nc) == (8, 48, 64, 3)
    assert sof[6:9] == bytes([1, 0x22, 0])   # Y: 2x2 sampling, qt 0
    assert sof[9:12] == bytes([2, 0x11, 1])  # Cb: 1x1, qt 1
    assert sof[12:15] == bytes([3, 0x11, 1])
    assert sorted(dqt_ids) == [0, 1]
    assert n_dht == 4  # luma DC/AC + chroma DC/AC


def test_odd_dimensions_and_dispatch():
    rng = np.random.default_rng(11)
    for (h, w) in ((17, 23), (16, 33), (9, 8)):
        base = np.clip(
            np.linspace(0, 200, h)[:, None]
            + np.linspace(0, 50, w)[None, :], 0, 255
        )
        px = np.stack([base, base * 0.9, base * 0.8], -1).astype(np.uint8)
        out = J.jpeg_decode(J.jpeg_encode(px, quality=95))
        assert out.shape == (h, w, 3)
        assert min(
            psnr(px[..., c], out[..., c], peak=255.0) for c in range(3)
        ) >= 40.0
    g = rng.integers(0, 256, (21, 13), np.uint8)
    out = J.jpeg_decode(J.jpeg_encode(g, quality=90))
    assert out.ndim == 2 and out.shape == (21, 13)


def test_decode_gray_rejects_color():
    px = _natural_rgb(0)
    data = J.jpeg_encode_rgb(px)
    with pytest.raises(ValueError, match="color"):
        J.jpeg_decode_gray(data)


def test_spark_multiband_transcode(spark):
    """Spark-side plumbing: raw16 3-band rows -> color JPEG -> decode;
    schema preserved, PSNR >= 40 per band on the high bytes, raw16
    multiband round-trip bit-exact."""
    from geotrellis_spark.operators import multimodal as M

    rows = []
    for i in range(6):
        rgb = _natural_rgb(i)  # (h, w, 3) uint8
        px = rgb.transpose(2, 0, 1).astype(np.uint16) * 257
        rows.append((f"img{i}", px.tobytes(), 64, 48, "raw16", 3))
    df = spark.createDataFrame(
        rows, "image_id string, img binary, w int, h int, fmt string, bands int"
    )
    jp = M.transcode_image_multiband(df, "jpeg", quality=95)
    assert jp.schema == df.schema
    got = {r["image_id"]: r for r in jp.collect()}
    assert len(got) == 6
    for i in range(6):
        r = got[f"img{i}"]
        assert r["fmt"] == "jpeg" and r["bands"] == 3
        dec = M.decode_image_multiband(
            bytes(r["img"]), r["w"], r["h"], "jpeg", 3
        )
        assert dec.shape == (3, 48, 64) and dec.dtype == np.uint16
        orig = _natural_rgb(i).transpose(2, 0, 1)
        for b in range(3):
            assert psnr(orig[b], (dec[b] >> 8).astype(np.uint8),
                        peak=255.0) >= 40.0
    # raw16 multiband loops back bit-exact through the same plumbing
    back = M.transcode_image_multiband(jp, "raw16")
    r0 = back.where("image_id = 'img0'").collect()[0]
    dec0 = M.decode_image_multiband(bytes(r0["img"]), 64, 48, "raw16", 3)
    jdec0 = M.decode_image_multiband(
        bytes(got["img0"]["img"]), 64, 48, "jpeg", 3
    )
    assert np.array_equal(dec0, jdec0)


def test_noninterleaved_gray_scan_ignores_sampling_factors():
    """T.81 A.2: a single-component scan is non-interleaved — one data
    unit per MCU over the component's own block grid, regardless of
    the SOF0 sampling factors. Patching a grayscale file's sampling
    byte from 0x11 to 0x22 must not change the decode."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (24, 40), np.uint8)
    data = bytearray(J.jpeg_encode_gray(img, quality=90))
    base = J.jpeg_decode(bytes(data))
    # locate SOF0 and patch the component sampling byte
    pos = 2
    while True:
        marker = data[pos + 1]
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if marker == 0xC0:
            assert data[pos + 4 + 7] == 0x11
            data[pos + 4 + 7] = 0x22
            break
        pos += 2 + ln
    patched = J.jpeg_decode(bytes(data))
    assert np.array_equal(patched, base)


def test_multiband_single_band_jpeg_transcode(spark):
    """bands==1 rows through the multiband transcode take the
    grayscale JPEG path (regression: encode_tile has no jpeg branch)."""
    from geotrellis_spark.operators import multimodal as M

    g = (synth_pixels(7, 48, 32)).astype(np.uint16)
    df = spark.createDataFrame(
        [("g0", g.tobytes(), 48, 32, "raw16", 1)],
        "image_id string, img binary, w int, h int, fmt string, bands int",
    )
    out = M.transcode_image_multiband(df, "jpeg", quality=95).collect()[0]
    assert out["fmt"] == "jpeg" and out["bands"] == 1
    dec = M.decode_image_multiband(bytes(out["img"]), 48, 32, "jpeg", 1)
    assert dec.shape == (1, 32, 48)
    assert psnr((g >> 8).astype(np.uint8),
                (dec[0] >> 8).astype(np.uint8), peak=255.0) >= 30.0


def test_restart_markers_roundtrip_gray_and_color():
    """DRI emission: encoders with restart_interval produce RSTm-
    segmented scans (independently decodable intervals, per-component
    DC reset) that decode IDENTICALLY to the no-DRI stream."""
    rng = np.random.default_rng(31)
    g = rng.integers(0, 256, (40, 56), np.uint8)
    plain = J.jpeg_decode(J.jpeg_encode_gray(g, quality=90))
    dri = J.jpeg_encode_gray(g, quality=90, restart_interval=3)
    assert b"\xff\xdd" in dri                      # DRI segment
    assert any(bytes([0xFF, 0xD0 + m]) in dri for m in range(8))
    assert np.array_equal(J.jpeg_decode(dri), plain)

    px = _natural_rgb(2)
    plain_c = J.jpeg_decode(J.jpeg_encode_rgb(px, quality=90))
    dri_c = J.jpeg_encode_rgb(px, quality=90, restart_interval=2)
    assert b"\xff\xdd" in dri_c
    assert np.array_equal(J.jpeg_decode(dri_c), plain_c)
