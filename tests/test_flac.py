"""FLAC codec (core/flac.py): lossless round-trip bit-exactness over
tonal / noisy / constant / stereo / awkward-length signals, container
structure (marker, STREAMINFO fields), checksum verification (CRC-8,
CRC-16, MD5 all tamper-detected), compression on predictable signals,
and the Spark transcode path.
"""

from __future__ import annotations

import numpy as np
import pytest

from geotrellis_spark.core import flac


def _tone(n: int, freq: float = 440.0, sr: int = 8000, seed: int = 0):
    t = np.arange(n) / sr
    sig = 0.5 * np.sin(2 * np.pi * freq * t)
    if seed:
        rng = np.random.default_rng(seed)
        sig += 0.02 * rng.standard_normal(n)
    return np.clip(sig * 32767, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize(
    "pcm",
    [
        _tone(4096),                      # exactly one block
        _tone(10000, seed=3),             # multi-frame + short tail
        _tone(100),                       # single tiny frame
        np.zeros(5000, dtype=np.int16),   # constant subframes
        np.full(4097, -32768, np.int16),  # constant, extreme value
        np.array([7], dtype=np.int16),    # one sample
        np.random.default_rng(9).integers(
            -32768, 32768, 6000
        ).astype(np.int16),               # incompressible noise (escape)
    ],
    ids=["block", "multi", "tiny", "zeros", "const-min", "one", "noise"],
)
def test_roundtrip_mono(pcm):
    blob = flac.flac_encode(pcm, 8000)
    out, sr = flac.flac_decode(blob)
    assert sr == 8000
    assert out.shape == (1, len(pcm))
    assert np.array_equal(out[0], pcm)


def test_roundtrip_stereo():
    left = _tone(9000, 330.0, seed=1)
    right = _tone(9000, 550.0, seed=2)
    pcm = np.stack([left, right])
    out, sr = flac.flac_decode(flac.flac_encode(pcm, 44100))
    assert sr == 44100
    assert np.array_equal(out, pcm)


def test_container_structure():
    blob = flac.flac_encode(_tone(5000), 8000)
    assert blob[:4] == b"fLaC"
    assert blob[4] & 0x80           # last-metadata flag
    assert blob[4] & 0x7F == 0      # STREAMINFO type
    assert int.from_bytes(blob[5:8], "big") == 34


def test_compresses_predictable_signal():
    pcm = _tone(16000)  # pure tone: order-2 prediction bites
    blob = flac.flac_encode(pcm, 8000)
    assert len(blob) < 2 * len(pcm) * 0.75  # >=25% under raw PCM


@pytest.mark.parametrize(
    "where", ["header_crc", "frame_body", "md5"]
)
def test_tamper_detected(where):
    pcm = _tone(6000, seed=4)
    blob = bytearray(flac.flac_encode(pcm, 8000))
    if where == "md5":
        blob[30] ^= 0xFF  # inside the STREAMINFO md5 field (bytes 26-41)
    elif where == "header_crc":
        blob[4 + 4 + 34 + 4] ^= 0x01  # a frame-header byte after sync
    else:
        blob[-10] ^= 0x10  # inside the last frame's subframe bits
    with pytest.raises(ValueError, match="CRC|MD5|mismatch|sync"):
        flac.flac_decode(bytes(blob))


def test_rejects_non_flac():
    with pytest.raises(ValueError, match="not a FLAC"):
        flac.flac_decode(b"RIFF" + b"\x00" * 64)


def test_spark_transcode_lossless(spark):
    from geotrellis_spark.operators import multimodal

    audio = multimodal.synth_audio(spark, 6, n_samples=5000)
    back = multimodal.transcode_audio(
        multimodal.transcode_audio(audio, "flac"), "pcm16"
    )
    orig = {r["audio_id"]: bytes(r["pcm"]) for r in audio.collect()}
    got = {r["audio_id"]: bytes(r["pcm"]) for r in back.collect()}
    assert got == orig  # bit-exact through the distributed path

    # decode_audio consumes flac payloads directly (audio_features path)
    fl = multimodal.transcode_audio(audio, "flac").collect()
    x = multimodal.decode_audio(bytes(fl[0]["pcm"]), "flac")
    ref = multimodal.decode_audio(orig[fl[0]["audio_id"]], "pcm16")
    assert np.array_equal(x, ref)
