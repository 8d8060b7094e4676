"""IMA ADPCM audio + keyframed delta-DCT video codecs (core/av_codecs)
and their multimodal-operator wiring."""

import numpy as np
import pytest

from geotrellis_spark.core import av_codecs as av, imagery


def _tone(n=16000, sr=8000, f0=440.0):
    t = np.arange(n) / sr
    sig = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
    return np.clip(sig * 32767, -32768, 32767).astype(np.int16)


def _stack(vid=3, nf=24, w=48, h=40):
    base = imagery.synth_pixels(vid, w, h).astype(np.float64)
    return np.stack([
        np.clip(base * (0.5 + f / nf), 0, 65535) for f in range(nf)
    ]).astype("<u2")


def test_adpcm_ratio_snr_and_determinism():
    pcm = _tone()
    enc = av.adpcm_encode(pcm)
    assert enc == av.adpcm_encode(pcm)
    # 4 bits/sample + 8-byte header
    assert len(enc) == 8 + (len(pcm) + 1) // 2
    dec = av.adpcm_decode(enc)
    assert dec.dtype == np.int16 and dec.shape == pcm.shape
    err = dec.astype(float) - pcm.astype(float)
    snr = 10 * np.log10((pcm.astype(float) ** 2).mean() / (err**2).mean())
    assert snr >= 20.0, snr  # spec-typical IMA quality on tonal content


def test_adpcm_odd_length_and_silence():
    pcm = _tone(n=777)
    assert (av.adpcm_decode(av.adpcm_encode(pcm)).shape[0]) == 777
    silence = np.zeros(100, dtype=np.int16)
    dec = av.adpcm_decode(av.adpcm_encode(silence))
    assert np.abs(dec.astype(int)).max() <= 2  # step floor only


def test_ddct_psnr_seek_and_index():
    stack = _stack()
    enc = av.ddct_encode(stack)
    assert len(enc) < stack.nbytes  # really compresses
    dec = av.ddct_decode(enc)
    assert dec.shape == stack.shape
    for f in range(stack.shape[0]):
        p = imagery.psnr(stack[f].astype(float), dec[f].astype(float))
        assert p >= 40.0, (f, p)
    # frame seek == full decode, across keyframe boundaries
    for f in (0, 1, 7, 8, 9, 23):
        np.testing.assert_array_equal(av.ddct_decode_frame(enc, f), dec[f])
    with pytest.raises(IndexError):
        av.ddct_decode_frame(enc, 24)


def test_ddct_scene_cut_resets_at_keyframe():
    # abrupt content change mid-GOP: residuals clamp but the next
    # keyframe resets drift exactly
    a = _stack(vid=1, nf=8)
    b = _stack(vid=9, nf=8)
    stack = np.concatenate([a, b])  # cut at frame 8 == keyframe
    enc = av.ddct_encode(stack, keyframe_every=8)
    dec = av.ddct_decode(enc)
    p = imagery.psnr(stack[8].astype(float), dec[8].astype(float))
    assert p >= 40.0


def test_transcode_audio_spark_roundtrip(spark):
    from geotrellis_spark.operators import multimodal as mm

    audio = mm.synth_audio(spark, 6, n_samples=4000, partitions=2)
    adpcm = mm.transcode_audio(audio, "adpcm")
    rows = {r["audio_id"]: r for r in adpcm.collect()}
    assert all(r["codec"] == "adpcm" for r in rows.values())
    # features still computable straight off the compressed payloads
    feats = mm.audio_features(adpcm, frame=512, hop=256)
    assert feats.count() > 0
    # round-trip back to pcm16 stays close
    back = {r["audio_id"]: r for r in
            mm.transcode_audio(adpcm, "pcm16").collect()}
    src = {r["audio_id"]: r for r in audio.collect()}
    for aid, r in back.items():
        x = np.frombuffer(bytes(src[aid]["pcm"]), "<i2").astype(float)
        y = np.frombuffer(bytes(r["pcm"]), "<i2").astype(float)
        snr = 10 * np.log10((x**2).mean() / ((x - y) ** 2).mean())
        assert snr >= 15.0, (aid, snr)


def test_transcode_video_and_frame_sample_seek(spark):
    from geotrellis_spark.operators import multimodal as mm

    video = mm.synth_video(spark, 4, n_frames=16, w=32, h=32, partitions=2)
    ddct = mm.transcode_video(video, "ddct")
    raw_frames = {
        (r["video_id"], r["frame_ord"]): bytes(r["frame"])
        for r in mm.frame_sample(video, every_k=4, with_phash=False).collect()
    }
    ddct_frames = {
        (r["video_id"], r["frame_ord"]): bytes(r["frame"])
        for r in mm.frame_sample(ddct, every_k=4, with_phash=False).collect()
    }
    assert set(raw_frames) == set(ddct_frames) and raw_frames
    for key in raw_frames:
        want = np.frombuffer(raw_frames[key], "<u2").astype(float)
        got = np.frombuffer(ddct_frames[key], "<u2").astype(float)
        assert imagery.psnr(want, got) >= 40.0, key
