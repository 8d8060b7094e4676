"""Baseline JPEG (ITU-T T.81), grayscale, from scratch in numpy —
no libjpeg/PIL. Upgrades the multimodal 'jpeg' fmt from a stub to a
real codec for 8-bit grayscale images:

- encoder: JFIF wrapper, one quant table (Annex K.1 scaled by
  quality), SOF0 single component, the standard Annex K.3 luminance
  DC/AC Huffman tables, per-block DCT -> quantize -> zigzag ->
  DC-differential + AC run-length entropy coding with byte stuffing.
- decoder: full marker parse (DQT/SOF0/DHT/SOS/DRI), canonical
  Huffman table reconstruction from BITS/HUFFVAL, entropy decode with
  restart-marker support, dequantize, IDCT, level shift.

Round-trip is PSNR-tested; the bitstream follows the public spec
byte-for-byte (markers, stuffing, canonical code assignment), though
no external decoder exists in this sandbox to cross-check interop.
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


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def jpeg_encode_gray(arr: np.ndarray, quality: int = 85) -> bytes:
    """Encode a 2-D uint8 array as a baseline JFIF grayscale JPEG."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim != 2:
        raise ValueError("jpeg_encode_gray expects 2-D uint8")
    h, w = a.shape
    qt = _quant_table(quality)
    ph, pw = (-h) % 8, (-w) % 8
    f = np.pad(a.astype(np.float64), ((0, ph), (0, pw)), mode="edge") - 128.0
    coefs = dct2_blocks(f)
    q = np.round(coefs / qt).astype(np.int32)
    zz = q.reshape(-1, 64)[:, ZIGZAG]  # row-major block order

    bw = _BitWriter()
    prev_dc = 0
    for blk in zz:
        dc = int(blk[0])
        diff = dc - prev_dc
        prev_dc = dc
        cat = _category(diff)
        code, ln = _DC_ENC[cat]
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
                code, ln = _AC_ENC[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            cat = _category(v)
            code, ln = _AC_ENC[(run << 4) | cat]
            bw.write(code, ln)
            u = v if v >= 0 else v + (1 << cat) - 1
            bw.write(u, cat)
            run = 0
        if last_nz < 63:
            code, ln = _AC_ENC[0x00]  # EOB
            bw.write(code, ln)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(int(x) for x in qt.ravel()[ZIGZAG]))
    out += seg(
        0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    )
    out += seg(
        0xFFC4,
        b"\x00" + bytes(DC_BITS) + bytes(DC_VALS),
    )
    out += seg(
        0xFFC4,
        b"\x10" + bytes(AC_BITS) + bytes(AC_VALS),
    )
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"  # EOI
    return out


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


def jpeg_decode_gray(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to a 2-D uint8 array."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    tq = td = ta = 0
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
                # the component's quant-table SELECTOR `tq`
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
            if prec != 8 or nc != 1:
                raise ValueError("baseline grayscale only")
            tq = payload[8]  # component spec: id, sampling, Tq
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
            td_ta = payload[2]
            td, ta = td_ta >> 4, td_ta & 0xF
            scan_start = pos + ln
            break
        pos += ln
    if h is None:
        raise ValueError("no SOF0")
    if scan_start is None:
        raise ValueError("no SOS marker (truncated JPEG)")
    try:
        dc_lut = huff[(0, td)]
        ac_lut = huff[(1, ta)]
        qt = qts[tq]
    except KeyError as e:
        raise ValueError(f"missing Huffman/quant table {e}") from None
    H, W = h + ((-h) % 8), w + ((-w) % 8)
    nby, nbx = H // 8, W // 8
    n_blocks = nby * nbx
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
    out_blocks = np.zeros((n_blocks, 64), np.int32)
    bi = 0
    for segdata in segments:
        br = _BitReader(segdata)
        prev_dc = 0
        limit = min(bi + (restart or n_blocks), n_blocks)
        while bi < limit:
            cat = _read_huff(br, dc_lut)
            diff = _extend(br.bits(cat), cat) if cat else 0
            prev_dc += diff
            blk = out_blocks[bi]
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
            bi += 1
    dezz = np.zeros((n_blocks, 64), np.int32)
    dezz[:, ZIGZAG] = out_blocks
    coefs = dezz.reshape(nby, nbx, 8, 8).astype(np.float64) * qt
    img = idct2_blocks(coefs)[:h, :w] + 128.0
    return np.clip(np.round(img), 0, 255).astype(np.uint8)
