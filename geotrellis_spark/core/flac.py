"""FLAC lossless audio codec (fixed-predictor subset), from scratch
against the public FLAC format specification (RFC 9639 / xiph.org):
fLaC marker + STREAMINFO metadata block, fixed-blocksize frames with
UTF-8-coded frame numbers and CRC-8 header / CRC-16 frame checksums,
CONSTANT / VERBATIM / FIXED(0-4) subframes with Rice-coded residuals
(4-bit parameters, escape code to raw), and the trailing MD5 of the
unencoded samples. 16-bit samples, 1-2 independent channels.

The encoder picks the cheapest of constant / best fixed order per
subframe and the exact optimal Rice parameter by total-bit scan; the
decoder handles any Rice partition order and verifies all three
checksums. Round-trip is bit-exact (lossless). No external audio
library — pure numpy + struct + hashlib.

Reference role: the reference engine's ingestion treats audio as typed
binary payloads (SURVEY §2 multimodal); 'flac' joins pcm16/adpcm as a
REAL container instead of an env-bound stub, the same increment the
baseline JPEG/TIFF codecs made for images.

Bit accumulators mask consumed bits (the core/jpeg.py lesson: an
unmasked accumulator makes encode/decode quadratic in stream length).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_BLOCK = 4096

# fixed-predictor residual coefficient rows (order 0..4)
_FIXED = (
    (),
    (1,),
    (2, -1),
    (3, -3, 1),
    (4, -6, 4, -1),
)


def _crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (FLAC frame-header checksum)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 (FLAC frame checksum)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


def _utf8_code(v: int) -> bytes:
    """FLAC's extended-UTF-8 coding of frame/sample numbers."""
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF00 >> nbytes) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (v >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((v >> shift) & 0x3F))
    return bytes(out)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
            self.acc &= (1 << self.n) - 1  # mask consumed bits

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= nbits
        v = (self.acc >> self.n) & ((1 << nbits) - 1)
        self.acc &= (1 << self.n) - 1  # mask consumed bits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def align(self) -> None:
        self.n = 0
        self.acc = 0


def _residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _best_rice_param(res: np.ndarray) -> tuple[int, int]:
    """(param, total_bits) minimizing the Rice cost; param 15 = escape
    to raw with the minimal sufficient bit size."""
    z = (np.abs(res) << 1) - (res < 0)
    best_p, best_bits = 15, 0
    maxz = int(z.max()) if len(z) else 0
    raw_bits = max(maxz.bit_length() + 1, 2)
    best_bits = 5 + raw_bits * len(res)
    for p in range(15):
        bits = int((z >> p).sum()) + (p + 1) * len(z)
        if bits < best_bits:
            best_p, best_bits = p, bits
    return best_p, best_bits


def _write_residual(bw: _BitWriter, res: np.ndarray) -> None:
    bw.write(0, 2)  # coding method: 4-bit Rice parameters
    bw.write(0, 4)  # partition order 0 — one partition
    p, _ = _best_rice_param(res)
    if p == 15:
        maxz = int(((np.abs(res) << 1) - (res < 0)).max()) if len(res) else 0
        raw = max(maxz.bit_length() + 1, 2)
        bw.write(0b1111, 4)
        bw.write(raw, 5)
        for r in res:
            bw.write(int(r) & ((1 << raw) - 1), raw)
        return
    bw.write(p, 4)
    for r in res:
        r = int(r)
        z = (r << 1) ^ (r >> 63)
        bw.write_unary(z >> p)
        if p:
            bw.write(z & ((1 << p) - 1), p)


def _read_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    po = br.read(4)
    nparts = 1 << po
    if bs % nparts or bs // nparts <= order and po:
        raise ValueError("invalid Rice partition order")
    out: list[int] = []
    for part in range(nparts):
        n = (bs >> po) - (order if part == 0 else 0)
        p = br.read(pbits)
        if p == (1 << pbits) - 1:  # escape: raw residuals
            raw = br.read(5)
            out.extend(br.read_signed(raw) for _ in range(n))
            continue
        for _ in range(n):
            q = br.read_unary()
            z = (q << p) | (br.read(p) if p else 0)
            out.append((z >> 1) ^ -(z & 1))
    return np.array(out, dtype=np.int64)


def _encode_subframe(bw: _BitWriter, x: np.ndarray) -> None:
    bs = len(x)
    if np.all(x == x[0]):
        bw.write(0, 1)          # zero pad bit
        bw.write(0b000000, 6)   # CONSTANT
        bw.write(0, 1)          # no wasted bits
        bw.write(int(x[0]) & 0xFFFF, 16)
        return
    best_o, best_bits, best_res = 0, None, None
    for o in range(min(4, bs - 1) + 1):
        res = _residual(x, o)
        _, bits = _best_rice_param(res)
        total = 16 * o + bits
        if best_bits is None or total < best_bits:
            best_o, best_bits, best_res = o, total, res
    bw.write(0, 1)
    bw.write(0b001000 | best_o, 6)  # FIXED, order best_o
    bw.write(0, 1)
    for i in range(best_o):
        bw.write(int(x[i]) & 0xFFFF, 16)
    _write_residual(bw, best_res)


def _decode_subframe(br: _BitReader, bs: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    typ = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits-per-sample flag
        wasted = 1 + br.read_unary()
    if typ == 0:  # CONSTANT
        v = br.read(16 - wasted)
        v = v - (1 << (16 - wasted)) if v >= (1 << (15 - wasted)) else v
        x = np.full(bs, v, dtype=np.int64)
    elif typ == 1:  # VERBATIM
        x = np.array(
            [br.read_signed(16 - wasted) for _ in range(bs)], dtype=np.int64
        )
    elif 8 <= typ <= 12:  # FIXED order 0-4
        order = typ - 8
        warm = np.array(
            [br.read_signed(16 - wasted) for _ in range(order)],
            dtype=np.int64,
        )
        res = _read_residual(br, bs, order)
        # diff^order(x) == res; invert by iterated cumsum, seeding level
        # k with diff^(k-1)(x)[0] == diff^(k-1)(warmup)[0]
        x = res
        for k in range(order, 0, -1):
            lead = warm
            for _ in range(k - 1):
                lead = np.diff(lead)
            x = np.concatenate([lead[:1], x]).cumsum()
        x = x.astype(np.int64)
    else:
        raise ValueError(f"unsupported subframe type {typ} (LPC not in subset)")
    return x << wasted


def flac_encode(pcm: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 samples — (n,) mono or (channels, n), 1-2
    channels — as a FLAC stream (fixed-blocksize frames, independent
    channels)."""
    if pcm.ndim == 1:
        pcm = pcm[None, :]
    ch, n = pcm.shape
    if ch not in (1, 2):
        raise ValueError(f"1-2 channels supported, got {ch}")
    if not (1 <= sample_rate < (1 << 20)):
        raise ValueError("sample_rate must fit 20 bits")
    pcm = pcm.astype(np.int64)
    md5 = hashlib.md5(
        np.ascontiguousarray(
            pcm.astype("<i2").T  # interleaved little-endian, per spec
        ).tobytes()
    ).digest()

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(1, 1)      # last metadata block
    si.write(0, 7)      # STREAMINFO
    si.write(34, 24)    # length
    si.write(min(_BLOCK, n), 16)  # min blocksize
    si.write(_BLOCK, 16)          # max blocksize
    si.write(0, 24)     # min framesize unknown
    si.write(0, 24)     # max framesize unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(15, 5)     # bits per sample - 1
    si.write(n, 36)
    out += si.bytes() + md5

    for fi, s0 in enumerate(range(0, n, _BLOCK)):
        bs = min(_BLOCK, n - s0)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)  # sync
        bw.write(0, 1)                  # reserved
        bw.write(0, 1)                  # fixed-blocksize stream
        bw.write(0b1100 if bs == 4096 else 0b0111, 4)
        bw.write(0, 4)                  # sample rate: from STREAMINFO
        bw.write(ch - 1, 4)             # independent channels
        bw.write(0b100, 3)              # 16-bit samples
        bw.write(0, 1)                  # reserved
        for b in _utf8_code(fi):
            bw.write(b, 8)
        if bs != 4096:
            bw.write(bs - 1, 16)
        bw.align()
        hdr = bw.bytes()
        bw = _BitWriter()
        for c in range(ch):
            _encode_subframe(bw, pcm[c, s0 : s0 + bs])
        bw.align()
        frame = hdr + bytes([_crc8(hdr)]) + bw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def flac_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream (fixed-predictor subset) to
    (int16 (channels, n), sample_rate). Verifies CRC-8 per frame
    header, CRC-16 per frame, and the stream MD5."""
    data = bytes(data)
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("truncated metadata block header")
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        length = int.from_bytes(hdr[1:4], "big")
        if btype == 0:
            streaminfo = data[pos + 4 : pos + 4 + length]
        pos += 4 + length
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min blocksize
    max_bs = si.read(16)
    si.read(24)
    si.read(24)
    sample_rate = si.read(20)
    ch = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    md5_expect = streaminfo[18:34]
    if bps != 16:
        raise ValueError(f"only 16-bit streams supported, got {bps}")
    if ch > 2:
        raise ValueError("1-2 channels supported")

    chans: list[list[np.ndarray]] = [[] for _ in range(ch)]
    got = 0
    while got < total:
        frame_start = pos
        br = _BitReader(data, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        br.read(1)
        br.read(1)  # blocking strategy (number re-derived below)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ca = br.read(4)
        if ca != ch - 1 or ca > 1:
            raise ValueError("only independent channels in subset")
        if br.read(3) != 0b100:
            raise ValueError("frame sample size != 16")
        br.read(1)
        lead = br.read(8)  # UTF-8 coded number (value unused)
        extra = 0
        if lead >= 0xC0:
            while lead & 0x40:
                br.read(8)
                extra += 1
                lead <<= 1
        if bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 8:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError(f"reserved blocksize code {bs_code}")
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        if bs > max_bs:
            raise ValueError("frame blocksize exceeds STREAMINFO max")
        br.align()
        hdr_end = br.pos
        if _crc8(data[frame_start:hdr_end]) != data[hdr_end]:
            raise ValueError("frame header CRC-8 mismatch")
        br = _BitReader(data, hdr_end + 1)
        for c in range(ch):
            chans[c].append(_decode_subframe(br, bs))
        br.align()
        (crc_got,) = struct.unpack_from(">H", data, br.pos)
        if _crc16(data[frame_start : br.pos]) != crc_got:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.pos + 2
        got += bs

    pcm = np.stack([np.concatenate(c)[:total] for c in chans])
    if md5_expect != b"\x00" * 16:
        md5 = hashlib.md5(
            np.ascontiguousarray(pcm.astype("<i2").T).tobytes()
        ).digest()
        if md5 != md5_expect:
            raise ValueError("stream MD5 mismatch")
    return pcm.astype(np.int16), sample_rate
