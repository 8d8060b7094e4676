"""Baseline JPEG (ITU-T T.81) from scratch in numpy — no libjpeg/PIL.
Grayscale AND color (YCbCr, 4:2:0 chroma-subsampled or 4:4:4):

- encoder: JFIF wrapper, Annex K.1 luma + K.2 chroma quant tables
  scaled by quality, SOF0 (1 or 3 components with sampling factors),
  the four Annex K.3 Huffman tables, per-block DCT -> quantize ->
  zigzag -> DC-differential + AC run-length entropy coding with byte
  stuffing; color scans are interleaved MCUs (4 Y + Cb + Cr per
  16x16 MCU at 4:2:0) with per-component DC prediction.
- decoder: full marker parse (DQT/SOF0/DHT/SOS/DRI), canonical
  Huffman table reconstruction from BITS/HUFFVAL, interleaved-MCU
  entropy decode with restart-marker support, dequantize, IDCT,
  chroma upsample, inverse JFIF color transform.

Round-trip is PSNR-tested per channel; the bitstream follows the
public spec byte-for-byte (markers, stuffing, canonical code
assignment), though no external decoder exists in this sandbox to
cross-check interop.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import _QTABLE, _qscale, dct2_blocks, idct2_blocks

# ---- spec constants (ITU-T T.81 Annex K) ----

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# Annex K.2 chrominance quantization table (row-major)
CHROMA_QTABLE = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

# Annex K.3 chrominance DC (Table K.4) and AC (Table K.6) tables
DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_C_VALS = list(range(12))

AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the spec's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)


def _quant_table(quality: int) -> np.ndarray:
    q = np.floor((_QTABLE * _qscale(quality) + 50.0) / 100.0)
    return np.clip(q, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # stuffing
        # mask consumed high bits: without this the int grows with the
        # whole stream and every shift goes quadratic (measured 60x on
        # a 512x512 image)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)

    def restart(self, m: int) -> None:
        """Pad to a byte boundary and emit RSTm (markers are raw —
        never byte-stuffed)."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.buf.append(0xFF)
        self.buf.append(0xD0 + (m % 8))


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw: "_BitWriter", blk, prev_dc: int, dc_enc, ac_enc) -> int:
    """Entropy-encode one zigzagged quantized block; returns the new
    DC predictor. Shared by the grayscale and interleaved-color scans."""
    dc = int(blk[0])
    diff = dc - prev_dc
    cat = _category(diff)
    code, ln = dc_enc[cat]
    bw.write(code, ln)
    if cat:
        v = diff if diff >= 0 else diff + (1 << cat) - 1
        bw.write(v, cat)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last_nz = int(nz[-1]) + 1 if nz.size else 0
    for i in range(1, last_nz + 1):
        v = int(blk[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = ac_enc[(run << 4) | cat]
        bw.write(code, ln)
        u = v if v >= 0 else v + (1 << cat) - 1
        bw.write(u, cat)
        run = 0
    if last_nz < 63:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _plane_zz(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """float plane (multiple-of-8 dims) -> zigzagged quantized blocks
    shaped (nby, nbx, 64)."""
    coefs = dct2_blocks(plane)
    q = np.round(coefs / qt).astype(np.int32)
    nby, nbx = q.shape[0], q.shape[1]
    return q.reshape(nby, nbx, 64)[:, :, ZIGZAG]


def jpeg_encode_gray(
    arr: np.ndarray, quality: int = 85,
    restart_interval: int | None = None,
) -> bytes:
    """Encode a 2-D uint8 array as a baseline JFIF grayscale JPEG.
    ``restart_interval`` (in MCUs = blocks) emits a DRI segment and
    RSTm markers: each restart interval is independently decodable
    (DC predictor resets), the property a parallel or fault-tolerant
    decoder shards on."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim != 2:
        raise ValueError("jpeg_encode_gray expects 2-D uint8")
    h, w = a.shape
    qt = _quant_table(quality)
    ph, pw = (-h) % 8, (-w) % 8
    f = np.pad(a.astype(np.float64), ((0, ph), (0, pw)), mode="edge") - 128.0
    zz = _plane_zz(f, qt).reshape(-1, 64)  # row-major block order

    bw = _BitWriter()
    prev_dc = 0
    for bi, blk in enumerate(zz):
        if restart_interval and bi and bi % restart_interval == 0:
            bw.restart(bi // restart_interval - 1)
            prev_dc = 0
        prev_dc = _encode_block(bw, blk, prev_dc, _DC_ENC, _AC_ENC)
    scan = bw.flush()

    out = b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + bytes(int(x) for x in qt.ravel()[ZIGZAG]))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(
        0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    )
    out += _seg(
        0xFFC4,
        b"\x00" + bytes(DC_BITS) + bytes(DC_VALS),
    )
    out += _seg(
        0xFFC4,
        b"\x10" + bytes(AC_BITS) + bytes(AC_VALS),
    )
    out += _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"  # EOI
    return out


# ------------------------------------------------- color (YCbCr 4:2:0)

def rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF color transform, level-shifted for the DCT (Y-128; Cb/Cr
    already centered on 0)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return y, cb, cr


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Inverse JFIF transform (inputs level-shifted as above) ->
    (h, w, 3) uint8."""
    yy = y + 128.0
    r = yy + 1.402 * cr
    g = yy - 0.344136286 * cb - 0.714136286 * cr
    b = yy + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _chroma_quant_table(quality: int) -> np.ndarray:
    q = np.floor((CHROMA_QTABLE * _qscale(quality) + 50.0) / 100.0)
    return np.clip(q, 1, 255).astype(np.int32)


_DC_C_ENC = _canonical_codes(DC_C_BITS, DC_C_VALS)
_AC_C_ENC = _canonical_codes(AC_C_BITS, AC_C_VALS)


def jpeg_encode_rgb(
    arr: np.ndarray, quality: int = 85, subsampling: str = "420",
    restart_interval: int | None = None,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline JFIF color
    JPEG: YCbCr transform, 4:2:0 chroma subsampling (2x2 box mean; or
    '444' for full-resolution chroma), Annex K.1 luma + K.2 chroma
    quant tables, the four Annex K.3 Huffman tables, interleaved MCU
    scan (4 Y + Cb + Cr blocks per 16x16 MCU at 4:2:0) with per-
    component DC prediction."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("jpeg_encode_rgb expects (h, w, 3) uint8")
    if subsampling not in ("420", "444"):
        raise ValueError("subsampling must be '420' or '444'")
    h, w = a.shape[:2]
    sub = 2 if subsampling == "420" else 1
    mcu = 8 * sub
    qt_l = _quant_table(quality)
    qt_c = _chroma_quant_table(quality)

    ph, pw = (-h) % mcu, (-w) % mcu
    padded = np.pad(a, ((0, ph), (0, pw), (0, 0)), mode="edge")
    y, cb, cr = rgb_to_ycbcr(padded)
    if sub == 2:
        H, W = padded.shape[:2]
        cb = cb.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
    zz_y = _plane_zz(y, qt_l)
    zz_cb = _plane_zz(cb, qt_c)
    zz_cr = _plane_zz(cr, qt_c)

    bw = _BitWriter()
    dc_y = dc_cb = dc_cr = 0
    mcus_y, mcus_x = zz_cb.shape[0], zz_cb.shape[1]
    mi = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mi and mi % restart_interval == 0:
                bw.restart(mi // restart_interval - 1)
                dc_y = dc_cb = dc_cr = 0
            mi += 1
            for v in range(sub):
                for u in range(sub):
                    dc_y = _encode_block(
                        bw, zz_y[my * sub + v, mx * sub + u],
                        dc_y, _DC_ENC, _AC_ENC,
                    )
            dc_cb = _encode_block(
                bw, zz_cb[my, mx], dc_cb, _DC_C_ENC, _AC_C_ENC
            )
            dc_cr = _encode_block(
                bw, zz_cr[my, mx], dc_cr, _DC_C_ENC, _AC_C_ENC
            )
    scan = bw.flush()

    samp = 0x22 if sub == 2 else 0x11
    out = b"\xff\xd8"
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(
        0xFFDB,
        b"\x00" + bytes(int(x) for x in qt_l.ravel()[ZIGZAG])
        + b"\x01" + bytes(int(x) for x in qt_c.ravel()[ZIGZAG]),
    )
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xFFC4, b"\x01" + bytes(DC_C_BITS) + bytes(DC_C_VALS))
    out += _seg(0xFFC4, b"\x11" + bytes(AC_C_BITS) + bytes(AC_C_VALS))
    out += _seg(
        0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0x3F, 0])
    )
    out += scan
    out += b"\xff\xd9"
    return out


def jpeg_encode(
    arr: np.ndarray, quality: int = 85,
    restart_interval: int | None = None, **kw,
) -> bytes:
    """Dispatch: 2-D uint8 -> grayscale, (h, w, 3) uint8 -> color.
    ``restart_interval`` forwards to BOTH paths; remaining keywords
    (``subsampling``) are color-only and REJECTED for grayscale input
    rather than silently dropped."""
    a = np.asarray(arr)
    if a.ndim == 2:
        if kw:
            raise TypeError(
                f"grayscale input does not accept {sorted(kw)}"
            )
        return jpeg_encode_gray(a, quality, restart_interval)
    return jpeg_encode_rgb(
        a, quality, restart_interval=restart_interval, **kw
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed
                else:
                    # marker: back up, feed 1-bits (decoder will stop
                    # at block-count boundary before consuming garbage)
                    self.pos -= 1
                    b = 0xFF
                    self.acc = (self.acc << 8) | b
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        if self.n < k:
            self.acc <<= (k - self.n)
            self.n = k
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1  # drop consumed bits (see writer)
        return v


def _decode_tables(bits: list[int], vals: list[int]):
    """(length, code) -> value lookup from the canonical assignment."""
    codes = _canonical_codes(bits, vals)
    by_len: dict[int, list[tuple[int, int]]] = {}
    for v, (c, ln) in codes.items():
        by_len.setdefault(ln, []).append((c, v))
    lut = {}
    for ln, items in by_len.items():
        for c, v in items:
            lut[(ln, c)] = v
    return lut


def _read_huff(br: _BitReader, lut) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bits(1)
        if (ln, code) in lut:
            return lut[(ln, code)]
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _decode_one_block(br: _BitReader, dc_lut, ac_lut, prev_dc: int):
    """Entropy-decode one block -> (zigzagged coefs (64,), new DC)."""
    blk = np.zeros(64, np.int32)
    cat = _read_huff(br, dc_lut)
    diff = _extend(br.bits(cat), cat) if cat else 0
    prev_dc += diff
    blk[0] = prev_dc
    k = 1
    while k < 64:
        rs = _read_huff(br, ac_lut)
        r, cat = rs >> 4, rs & 0xF
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += r
        if k > 63:
            raise ValueError("AC index out of range")
        blk[k] = _extend(br.bits(cat), cat)
        k += 1
    return blk, prev_dc


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG: grayscale -> (h, w) uint8; YCbCr color
    (any sampling our encoder emits — 4:2:0 or 4:4:4 — plus any
    H,V in {1,2}) -> (h, w, 3) uint8 RGB. Interleaved-MCU entropy
    decode with per-component DC prediction and restart support
    (restart interval counts MCUs)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []  # (cid, hs, vs, tq)
    scan_sel: dict[int, tuple[int, int]] = {}  # cid -> (td, ta)
    scan_order: list[int] = []
    scan_start = None
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG stream")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2 : pos + ln]
        if marker == 0xDB:
            off = 0
            while off < len(payload):
                # distinct local for the DQT table id: a DQT segment is
                # legal AFTER SOF0 (T.81 B.2.4.1) and must not clobber
                # any component's quant-table SELECTOR
                pq, tqi = payload[off] >> 4, payload[off] & 0xF
                off += 1
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, np.int32)
                t[ZIGZAG] = np.frombuffer(
                    payload[off : off + 64], np.uint8
                )
                qts[tqi] = t.reshape(8, 8)
                off += 64
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8 or nc not in (1, 3):
                raise ValueError("baseline 8-bit, 1 or 3 components only")
            comps = []
            for ci in range(nc):
                cid = payload[6 + 3 * ci]
                samp = payload[7 + 3 * ci]
                comps.append(
                    (cid, samp >> 4, samp & 0xF, payload[8 + 3 * ci])
                )
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("baseline (SOF0) only")
        elif marker == 0xC4:
            off = 0
            while off < len(payload):
                tc, th = payload[off] >> 4, payload[off] & 0xF
                bits = list(payload[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(payload[off + 17 : off + 17 + nv])
                huff[(tc, th)] = _decode_tables(bits, vals)
                off += 17 + nv
        elif marker == 0xDD:
            (restart,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:
            # scan header: ns, then per component (id, Td<<4|Ta)
            ns = payload[0]
            for si in range(ns):
                cid = payload[1 + 2 * si]
                td_ta = payload[2 + 2 * si]
                scan_sel[cid] = (td_ta >> 4, td_ta & 0xF)
                scan_order.append(cid)
            scan_start = pos + ln
            break
        pos += ln
    if h is None:
        raise ValueError("no SOF0")
    if scan_start is None:
        raise ValueError("no SOS marker (truncated JPEG)")
    if len(scan_order) < len(comps):
        raise ValueError(
            "multi-scan (non-interleaved multi-component) JPEG unsupported"
        )
    if set(scan_order) != {c[0] for c in comps}:
        raise ValueError("SOS components do not match SOF0")
    for _, hs, vs, _ in comps:
        if hs not in (1, 2) or vs not in (1, 2):
            raise ValueError(f"unsupported sampling {hs}x{vs}")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    interleaved = len(scan_order) > 1
    by_cid = {c[0]: c for c in comps}
    if interleaved:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        # per-component zigzag block planes (block-grid indexed)
        planes = {
            cid: np.zeros((mcus_y * vs, mcus_x * hs, 64), np.int32)
            for cid, hs, vs, _ in comps
        }
    else:
        # T.81 A.2: a single-component scan is NON-interleaved — one
        # data unit per MCU over the component's OWN block grid
        # (ceil(comp dims / 8)), regardless of declared sampling
        # factors; restart intervals count data units
        cid0, hs0, vs0, _ = by_cid[scan_order[0]]
        comp_w = -(-(w * hs0) // hmax)
        comp_h = -(-(h * vs0) // vmax)
        mcus_x = -(-comp_w // 8)
        mcus_y = -(-comp_h // 8)
        planes = {cid0: np.zeros((mcus_y, mcus_x, 64), np.int32)}
    n_mcus = mcus_x * mcus_y
    luts = {}
    for cid in scan_order:
        td, ta = scan_sel[cid]
        try:
            luts[cid] = (huff[(0, td)], huff[(1, ta)])
        except KeyError as e:
            raise ValueError(f"missing Huffman table {e}") from None
    for cid, _, _, tq in comps:
        if tq not in qts:
            raise ValueError(f"missing quant table {tq}")

    # split entropy data on restart markers if DRI declared
    end = data.rfind(b"\xff\xd9")
    if end < scan_start:  # EOI missing or a header byte pair matched
        end = len(data)
    body = data[scan_start:end]
    segments = [body]
    if restart:
        segments = []
        cur = bytearray()
        i = 0
        while i < len(body):
            if body[i] == 0xFF and i + 1 < len(body) and 0xD0 <= body[i + 1] <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            cur.append(body[i])
            i += 1
        segments.append(bytes(cur))

    mi = 0
    for segdata in segments:
        br = _BitReader(segdata)
        prev = dict.fromkeys(scan_order, 0)
        limit = min(mi + (restart or n_mcus), n_mcus)
        while mi < limit:
            my, mx = divmod(mi, mcus_x)
            for cid in scan_order:
                dc_lut, ac_lut = luts[cid]
                if interleaved:
                    _, hs, vs, _ = by_cid[cid]
                    for v in range(vs):
                        for u in range(hs):
                            blk, prev[cid] = _decode_one_block(
                                br, dc_lut, ac_lut, prev[cid]
                            )
                            planes[cid][my * vs + v, mx * hs + u] = blk
                else:
                    blk, prev[cid] = _decode_one_block(
                        br, dc_lut, ac_lut, prev[cid]
                    )
                    planes[cid][my, mx] = blk
            mi += 1

    out_planes = {}
    for cid, hs, vs, tq in comps:
        zz = planes[cid]
        nby, nbx = zz.shape[0], zz.shape[1]
        dezz = np.zeros((nby, nbx, 64), np.int32)
        dezz[:, :, ZIGZAG] = zz
        coefs = dezz.reshape(nby, nbx, 8, 8).astype(np.float64) * qts[tq]
        plane = idct2_blocks(coefs)
        # upsample to full MCU-grid resolution by pixel replication,
        # then crop to the declared image size
        plane = np.repeat(
            np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
        )
        out_planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        img = out_planes[comps[0][0]] + 128.0
        return np.clip(np.round(img), 0, 255).astype(np.uint8)
    y_cid, cb_cid, cr_cid = (c[0] for c in comps)
    return ycbcr_to_rgb(
        out_planes[y_cid], out_planes[cb_cid], out_planes[cr_cid]
    )


def jpeg_decode_gray(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to a 2-D uint8 array."""
    out = jpeg_decode(data)
    if out.ndim != 2:
        raise ValueError("color JPEG passed to jpeg_decode_gray")
    return out
