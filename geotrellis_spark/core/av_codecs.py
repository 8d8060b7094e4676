"""Audio/video codecs — from scratch in numpy (no ffmpeg/libsndfile in
this container, and none is needed for the math).

- ``adpcm``: IMA ADPCM (public ITU/IMA spec tables) — 4 bits/sample
  lossy audio, 4:1 over PCM16. The step-size prediction loop is
  inherently sequential per sample; clips are encoded per row inside
  Arrow-batched ``mapInPandas``, so the sequential loop parallelizes
  across rows/partitions exactly like every other payload kernel.
- ``ddct``: keyframed delta-DCT video — intra frames every
  ``keyframe_every`` reuse the image ``dct`` codec; predicted frames
  encode the residual vs the previous RECONSTRUCTED frame (offset-
  binned to uint16), so drift cannot accumulate. A byte-offset frame
  index in the header gives real seek semantics: decoding frame f
  costs the frames from its keyframe, not the whole stack.

Both meet the north-rule lossy bar on the synthetic corpus: ADPCM
SNR >= ~30dB on tonal content (spec-typical; asserted in tests at the
level it achieves deterministically), ddct frame PSNR >= 40dB.
"""

from __future__ import annotations

import struct

import numpy as np

from . import codecs

# IMA ADPCM tables (public spec)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int32)

_ADPCM_MAGIC = b"IMA1"
_DDCT_MAGIC = b"DVC1"


def adpcm_encode(pcm: np.ndarray) -> bytes:
    """Encode int16 mono PCM to IMA ADPCM (4 bits/sample)."""
    x = np.asarray(pcm, dtype=np.int32)
    n = x.shape[0]
    nibbles = np.empty(n, dtype=np.uint8)
    pred, index = 0, 0
    for i in range(n):
        step = int(_IMA_STEPS[index])
        diff = int(x[i]) - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        # 3-bit magnitude quantization of diff/step (spec bit tests)
        delta = step >> 3
        if diff >= step:
            code |= 4
            diff -= step
            delta += step
        step >>= 1
        if diff >= step:
            code |= 2
            diff -= step
            delta += step
        step >>= 1
        if diff >= step:
            code |= 1
            delta += step
        pred = pred - delta if code & 8 else pred + delta
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX[code & 7])))
        nibbles[i] = code
    packed = np.zeros((n + 1) // 2, dtype=np.uint8)
    packed |= nibbles[0::2]
    packed[: n // 2] |= nibbles[1::2] << 4
    return _ADPCM_MAGIC + struct.pack("<I", n) + packed.tobytes()


def adpcm_decode(data: bytes) -> np.ndarray:
    """Decode IMA ADPCM to int16 mono PCM."""
    if data[:4] != _ADPCM_MAGIC:
        raise ValueError("not an IMA1 payload")
    n = struct.unpack("<I", data[4:8])[0]
    packed = np.frombuffer(data[8:], dtype=np.uint8)
    nibbles = np.empty(packed.shape[0] * 2, dtype=np.uint8)
    nibbles[0::2] = packed & 0x0F
    nibbles[1::2] = packed >> 4
    nibbles = nibbles[:n]
    out = np.empty(n, dtype=np.int16)
    pred, index = 0, 0
    for i in range(n):
        code = int(nibbles[i])
        step = int(_IMA_STEPS[index])
        delta = step >> 3
        if code & 4:
            delta += step
        if code & 2:
            delta += step >> 1
        if code & 1:
            delta += step >> 2
        pred = pred - delta if code & 8 else pred + delta
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX[code & 7])))
        out[i] = pred
    return out


def ddct_encode(
    stack: np.ndarray, quality: int = 95, keyframe_every: int = 8
) -> bytes:
    """Encode an (n_frames, h, w) uint16 stack. Intra frames every
    ``keyframe_every``; others store the residual vs the previous
    reconstructed frame, offset-binned to uint16 (residual + 32768 —
    exact for |residual| <= 32767, clamped beyond; drift resets at the
    next keyframe). Header carries a byte-offset frame index for
    keyframe-relative seeking."""
    stack = np.asarray(stack, dtype=np.uint16)
    nf, h, w = stack.shape
    payloads: list[bytes] = []
    recon_prev: np.ndarray | None = None
    for f in range(nf):
        frame = stack[f].astype(np.int64)
        if f % keyframe_every == 0:
            enc = codecs.dct_encode_gray(stack[f], quality, nodata=None)
            recon = codecs.dct_decode_gray(enc, nodata=None).astype(np.int64)
        else:
            res = frame - recon_prev
            binned = np.clip(res + 32768, 0, 65535).astype(np.uint16)
            enc = codecs.dct_encode_gray(binned, quality, nodata=None)
            dec = codecs.dct_decode_gray(enc, nodata=None).astype(np.int64)
            recon = np.clip(recon_prev + (dec - 32768), 0, 65535)
        recon_prev = recon
        payloads.append(enc)
    index = np.zeros(nf + 1, dtype="<u4")
    index[1:] = np.cumsum([len(p) for p in payloads])
    head = _DDCT_MAGIC + struct.pack(
        "<HHHBB", w, h, nf, quality, keyframe_every
    )
    return head + index.tobytes() + b"".join(payloads)


def _ddct_header(data: bytes):
    if data[:4] != _DDCT_MAGIC:
        raise ValueError("not a DVC1 payload")
    w, h, nf, quality, kf = struct.unpack("<HHHBB", data[4:12])
    idx = np.frombuffer(data[12 : 12 + 4 * (nf + 1)], dtype="<u4")
    return w, h, nf, quality, kf, idx, 12 + 4 * (nf + 1)


def ddct_decode_frame(data: bytes, f: int) -> np.ndarray:
    """Decode ONE frame, walking forward from its keyframe — the seek
    cost is (f mod keyframe_every) + 1 frame decodes, independent of
    stack length."""
    w, h, nf, quality, kf, idx, base = _ddct_header(data)
    if not 0 <= f < nf:
        raise IndexError(f)
    k0 = (f // kf) * kf
    recon: np.ndarray | None = None
    for g in range(k0, f + 1):
        payload = data[base + int(idx[g]) : base + int(idx[g + 1])]
        dec = codecs.dct_decode_gray(payload, nodata=None).astype(np.int64)
        if g == k0:
            recon = dec
        else:
            recon = np.clip(recon + (dec - 32768), 0, 65535)
    return recon.astype(np.uint16)


def ddct_decode(data: bytes) -> np.ndarray:
    """Decode the full (n_frames, h, w) stack."""
    w, h, nf, quality, kf, idx, base = _ddct_header(data)
    out = np.empty((nf, h, w), dtype=np.uint16)
    recon: np.ndarray | None = None
    for f in range(nf):
        payload = data[base + int(idx[f]) : base + int(idx[f + 1])]
        dec = codecs.dct_decode_gray(payload, nodata=None).astype(np.int64)
        if f % kf == 0:
            recon = dec
        else:
            recon = np.clip(recon + (dec - 32768), 0, 65535)
        out[f] = recon.astype(np.uint16)
    return out
