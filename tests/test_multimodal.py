"""Multimodal pipeline tests: image resize/features, audio windowed
features, video frame sampling — real Spark plumbing over the
deterministic in-repo codecs; external codecs stay marked stubs."""

import numpy as np
import pandas as pd
import pytest

from geotrellis_spark.core import codecs, imagery, kernels
from geotrellis_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def images_df(spark):
    rows = []
    for i in range(12):
        px = imagery.synth_pixels(i, 32, 24)
        rows.append({
            "image_id": i, "img": codecs.encode_tile(px, "png"),
            "w": 32, "h": 24, "fmt": "png",
        })
    return spark.createDataFrame(pd.DataFrame(rows)).cache()


def test_image_resize_matches_kernel(spark, images_df):
    out = {r["image_id"]: r for r in
           mm.image_resize(images_df, 16, 12).collect()}
    assert len(out) == 12
    for i in range(12):
        r = out[i]
        assert (r["w"], r["h"]) == (16, 12)
        got = codecs.decode_tile(bytes(r["img"]), 16, 12, "png")
        want = np.nan_to_num(
            kernels.resample_bilinear(imagery.synth_pixels(i, 32, 24), 12, 16),
            nan=0.0,
        ).astype(np.uint16)
        np.testing.assert_array_equal(got, want)


def test_image_features_phash_invariant(spark, images_df):
    feats = {r["image_id"]: r for r in mm.image_features(images_df).collect()}
    for i in range(12):
        px = imagery.synth_pixels(i, 32, 24).astype(np.float64)
        assert feats[i]["phash"] == int(imagery.phash64(px))
        assert feats[i]["mean_milli"] == int(np.floor(px.mean() * 1000))


def test_external_image_codec_is_stub():
    # jpeg is REAL now (core/jpeg.py) — a truncated stream errors as
    # a malformed bitstream, not a stub
    with pytest.raises((ValueError, IndexError)):
        mm.decode_image(b"\xff\xd8\xff", 8, 8, "jpeg")
    with pytest.raises(NotImplementedError, match="STUB"):
        mm.decode_image(b"", 8, 8, "webp")
    with pytest.raises(NotImplementedError, match="STUB"):
        mm.decode_audio(b"", "mp3")


def test_audio_features_golden(spark):
    audio = mm.synth_audio(spark, 6, sample_rate=8000, n_samples=4096)
    rows = mm.audio_features(audio, frame=1024, hop=512).collect()
    # (4096 - 1024) // 512 + 1 = 7 frames per clip
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r["audio_id"], []).append(r)
    assert set(by_id) == set(range(6))
    assert all(len(v) == 7 for v in by_id.values())
    # numpy golden for one clip
    pcm_rows = {r["audio_id"]: r for r in audio.collect()}
    x = np.frombuffer(bytes(pcm_rows[3]["pcm"]), dtype="<i2") / 32768.0
    f0 = sorted(by_id[3], key=lambda r: r["frame_ord"])[0]
    rms0 = np.sqrt((x[:1024] ** 2).mean())
    assert f0["rms_milli"] == int(np.floor(rms0 * 1000))
    zcr0 = (np.diff(np.signbit(x[:1024])) != 0).mean()
    assert f0["zcr_milli"] == int(np.floor(zcr0 * 1000))
    # a pure tone has RMS ~ 0.6/sqrt(2): sanity-band every frame
    assert all(300 < r["rms_milli"] < 700 for r in rows)


def test_audio_determinism(spark):
    a = {r["audio_id"]: bytes(r["pcm"])
         for r in mm.synth_audio(spark, 4, n_samples=2048).collect()}
    b = {r["audio_id"]: bytes(r["pcm"])
         for r in mm.synth_audio(spark, 4, n_samples=2048, partitions=2).collect()}
    assert a == b  # partitioning never changes the payloads


def test_frame_sample_byte_exact(spark):
    vids = mm.synth_video(spark, 3, n_frames=10, w=16, h=16)
    sampled = mm.frame_sample(vids, every_k=3).collect()
    blobs = {r["video_id"]: r for r in vids.collect()}
    # frames 0, 3, 6, 9 per video
    got = {}
    for r in sampled:
        got.setdefault(r["video_id"], []).append(r)
    fb = 16 * 16 * 2
    for vid, rows in got.items():
        assert sorted(r["frame_ord"] for r in rows) == [0, 3, 6, 9]
        blob = bytes(blobs[vid]["frames"])
        for r in rows:
            f = r["frame_ord"]
            assert bytes(r["frame"]) == blob[f * fb : (f + 1) * fb]
            px = np.frombuffer(bytes(r["frame"]), dtype="<u2").reshape(16, 16)
            assert r["phash"] == int(imagery.phash64(px.astype(np.float64)))


def test_frame_sample_external_codec_is_stub(spark):
    import pyspark.sql.functions as F

    vids = mm.synth_video(spark, 1, n_frames=4, w=8, h=8)
    h264 = vids.withColumn("codec", F.lit("h264"))
    with pytest.raises(Exception, match="STUB"):
        mm.frame_sample(h264).collect()
