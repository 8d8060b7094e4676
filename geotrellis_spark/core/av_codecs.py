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


def audio_fingerprint64(
    pcm: np.ndarray, frame: int = 1024, hop: int = 512
) -> int:
    """64-bit spectral-peak audio fingerprint (the Shazam-family
    landmark idea reduced to one global hash per clip): Hann-windowed
    frames -> power spectrum -> 64 log-spaced per-bin-mean band
    energies averaged over frames -> bit b = 1 iff band b is within
    12 dB of the LOUDEST band. Ratio-to-max cancels any constant gain
    (scale- and DC-invariant by construction); a lossy transcode's
    noise floor (~-35 dB for ADPCM) never enters the 12 dB window, so
    re-encodes flip <=1-2 bits (measured over the synth corpus), while
    structurally different content (tonal peaks vs broadband noise —
    which lights ALL bands) differs in dozens. Known resolution
    limit: two sparse tonal clips have small popcounts, so their
    distance is bounded by popcount sums — a high-recall CANDIDATE
    generator; precision comes from the downstream exact/embedding
    refine stages. Adjacent-band sign schemes and median-floor
    thresholds both fail here (flat or numerically-zero floors make
    those comparisons coin flips)."""
    x = np.asarray(pcm, dtype=np.float64)
    x = x - x.mean()  # DC-invariant: codec paths differ in offset
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    win = np.hanning(frame)
    spec = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
    n_bins = spec.shape[1]
    # 64 log-spaced band edges over [1, n_bins); each band >= 1 bin
    edges = np.unique(
        np.round(np.geomspace(1, n_bins - 1, 65)).astype(np.int64)
    )
    if len(edges) < 65:
        # low end collapsed under rounding: backfill with the smallest
        # unused bins in [1, n_bins) so there are always 65 edges
        missing = np.setdiff1d(
            np.arange(1, n_bins, dtype=np.int64), edges
        )[: 65 - len(edges)]
        edges = np.sort(np.concatenate([edges, missing]))
    band_e = np.add.reduceat(spec, edges[:-1], axis=1)[:, :64]
    # per-bin mean energy so band width does not bias the comparison
    widths = np.diff(edges)[:64].astype(np.float64)
    mean_e = band_e.mean(axis=0) / widths
    bits = (mean_e > mean_e.max() / 16.0).astype(np.int64)
    fp = np.int64(0)
    for k in range(64):
        fp |= bits[k] << np.int64(k)
    return int(fp)
