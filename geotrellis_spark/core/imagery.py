"""Image-payload utilities: deterministic synthesis, phash, PSNR.

- ``phash64``    — 8x8 average-hash of a grayscale image (block-mean >
  global mean => bit set), bit (r*8+c) for block (r,c), MSB-first packing
  into int64. Deterministic and recomputable from decoded pixels: the
  per-row invariant checkable in tests (input_hint).
- ``psnr``       — peak signal-to-noise ratio; inf for identical images
  (both our codecs are lossless, so the >=40dB invariant holds trivially).
- ``synth_pixels`` — deterministic per-image pattern (FIXTURES.md §F2):
  pattern class from the image ordinal, pixels from
  ``np.random.Generator(Philox(key=i))`` so ANY partition can regenerate
  its rows independently (what makes per-partition resume testable).
"""

from __future__ import annotations

import numpy as np
from numpy.random import Generator, Philox

__all__ = ["phash64", "psnr", "synth_pixels", "hamming64"]

_PATTERNS = ("constant", "gradient", "checker", "noise", "holes")


def phash64(img: np.ndarray) -> np.int64:
    """8x8 average-hash. Image is block-averaged to 8x8 (ignoring any
    ragged remainder by cropping to a multiple of 8), then bit (r*8+c)
    is set iff block-mean > overall mean of the 8x8 grid."""
    h, w = img.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    crop = img[: bh * 8, : bw * 8].astype(np.float64)
    if crop.shape[0] < 8 or crop.shape[1] < 8:
        crop = np.pad(crop, ((0, 8 - crop.shape[0] % 8 if crop.shape[0] < 8 else 0),
                             (0, 8 - crop.shape[1] % 8 if crop.shape[1] < 8 else 0)),
                      mode="edge")
        bh, bw = crop.shape[0] // 8, crop.shape[1] // 8
    blocks = crop.reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).ravel()
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    return np.int64(np.bitwise_or.reduce(weights[bits]) if bits.any() else 0)


def hamming64(a, b) -> np.ndarray:
    """Vectorized hamming distance between int64 hash batches."""
    x = (np.asarray(a).astype(np.int64) ^ np.asarray(b).astype(np.int64)).astype(
        np.uint64
    )
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 65535.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


def synth_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic uint16 pixels for image ordinal ``i``.

    Patterns cycle {constant, gradient, checker, noise, holes}; 'holes'
    embeds NoData (0) blocks so merge/focal kernels see real NoData.
    Values stay in [0, 65535]; non-hole patterns avoid the 0 sentinel.
    """
    pattern = _PATTERNS[i % len(_PATTERNS)]
    rng = Generator(Philox(key=np.uint64(i)))
    if pattern == "constant":
        return np.full((h, w), 1 + (i * 257) % 65000, dtype=np.uint16)
    if pattern == "gradient":
        gy = np.linspace(1, 60000, h)[:, None]
        gx = np.linspace(0, 5000, w)[None, :]
        return np.clip(gy + gx, 1, 65535).astype(np.uint16)
    if pattern == "checker":
        ys, xs = np.mgrid[0:h, 0:w]
        cell = 8
        v = ((ys // cell + xs // cell) % 2).astype(np.uint16)
        return (1 + v * ((i * 911) % 60000)).astype(np.uint16)
    if pattern == "noise":
        return rng.integers(1, 65536, size=(h, w), dtype=np.uint16)
    # holes: noise with NoData(0) rectangles
    img = rng.integers(1, 65536, size=(h, w), dtype=np.uint16)
    n_holes = 1 + i % 3
    for _ in range(n_holes):
        r0 = int(rng.integers(0, max(h - 8, 1)))
        c0 = int(rng.integers(0, max(w - 8, 1)))
        img[r0 : r0 + 8, c0 : c0 + 8] = 0
    return img
