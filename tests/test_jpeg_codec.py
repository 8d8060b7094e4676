"""Baseline grayscale JPEG codec (core/jpeg.py) — pure numpy, no
libjpeg. Round-trip + bitstream-structure + Spark-pipeline tests."""

import numpy as np
import pytest

from geotrellis_spark.core import imagery, jpeg


def _img(i, w=120, h=88):
    return (imagery.synth_pixels(i, w, h) >> 8).astype(np.uint8)


def test_roundtrip_psnr_and_compression():
    for i in (1, 7, 42):
        px = _img(i)
        enc = jpeg.jpeg_encode_gray(px, quality=85)
        dec = jpeg.jpeg_decode_gray(enc)
        assert dec.shape == px.shape and dec.dtype == np.uint8
        p = imagery.psnr(px.astype(float), dec.astype(float), peak=255.0)
        assert p >= 40.0, (i, p)
        assert len(enc) < px.nbytes / 3  # really compresses


def test_bitstream_structure():
    enc = jpeg.jpeg_encode_gray(_img(3), quality=75)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    # JFIF APP0, DQT, SOF0, two DHTs, SOS all present in order
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4",
                   b"\xff\xda"):
        assert marker in enc, marker
    assert enc.count(b"\xff\xc4") >= 2  # DC + AC tables


def test_non_multiple_of_8_and_extremes():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (57, 91)).astype(np.uint8)
    dec = jpeg.jpeg_decode_gray(jpeg.jpeg_encode_gray(px, quality=95))
    assert dec.shape == (57, 91)
    p = imagery.psnr(px.astype(float), dec.astype(float), peak=255.0)
    assert p >= 38.0  # white noise at q95: JPEG-typical
    for v in (0, 255):
        flat = np.full((16, 24), v, np.uint8)
        out = jpeg.jpeg_decode_gray(jpeg.jpeg_encode_gray(flat))
        np.testing.assert_array_equal(out, flat)


def test_quality_controls_rate():
    px = _img(11, 128, 128)
    sizes = [len(jpeg.jpeg_encode_gray(px, q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]
    with pytest.raises(ValueError):
        jpeg.jpeg_encode_gray(px, quality=0)
    with pytest.raises(ValueError):
        jpeg.jpeg_encode_gray(px.astype(np.uint16))
    with pytest.raises(ValueError):
        jpeg.jpeg_decode_gray(b"not a jpeg")


def test_spark_transcode_and_features(spark):
    """jpeg through the real pipeline: transcode raw16 images to jpeg,
    recompute features off the jpeg payloads — phash of the decoded
    jpeg stays within a small hamming distance of the original
    (lossy-but-perceptually-stable, the invariant phash exists for)."""
    from geotrellis_spark import synth
    from geotrellis_spark.operators import multimodal as mm

    images = synth.synth_images(spark, 20, partitions=2).selectExpr(
        "cast(substring(image_id, 4) as long) as image_id",
        "bytes as img", "w", "h", "fmt",
    )
    jp = mm.transcode_image(images, "jpeg", quality=90)
    rows = {r["image_id"]: r for r in jp.collect()}
    assert all(r["fmt"] == "jpeg" for r in rows.values())
    feats = {r["image_id"]: r for r in mm.image_features(jp).collect()}
    orig = {r["image_id"]: r for r in mm.image_features(images).collect()}
    for iid in feats:
        d = imagery.hamming64(
            np.int64(feats[iid]["phash"]), np.int64(orig[iid]["phash"])
        )
        assert int(d) <= 10, (iid, int(d))


def test_dqt_after_sof0_with_distinct_table_ids():
    """T.81 allows DQT segments after SOF0; a late DQT defining a
    DIFFERENT table id must not clobber the component's quant-table
    selector (regression: the parse loop used to reuse the selector
    variable for the DQT table id)."""
    import struct

    import numpy as np

    from geotrellis_spark.core import jpeg as J

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    data = J.jpeg_encode_gray(img, quality=90)
    baseline = J.jpeg_decode_gray(data)

    # re-segment: move the real DQT (as table id 1) AFTER SOF0, set the
    # component selector to 1, and append a junk DQT with table id 0
    pos = 2
    segs = []
    while True:
        marker = data[pos + 1]
        if marker == 0xDA:
            tail = data[pos:]
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        segs.append((marker, data[pos : pos + 2 + ln]))
        pos += 2 + ln
    by = {m: bytearray(s) for m, s in segs if m != 0xC4}
    dhts = [bytes(s) for m, s in segs if m == 0xC4]
    dqt = by[0xDB]
    dqt[4] = 0x01  # Pq=0, Tq=1
    sof = by[0xC0]
    sof[4 + 8] = 0x01  # component Tq selector -> 1 (2 marker + 2 len hdr)
    junk = bytes([0xFF, 0xDB, 0x00, 0x43, 0x00]) + bytes(64)  # id 0, all-zero
    reordered = (
        data[:2] + bytes(by[0xE0]) + bytes(sof) + bytes(dqt) + junk
        + b"".join(dhts) + tail
    )
    out = J.jpeg_decode_gray(reordered)
    assert np.array_equal(out, baseline)
