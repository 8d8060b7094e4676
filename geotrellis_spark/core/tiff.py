"""Baseline TIFF codec, from scratch against the public TIFF 6.0
specification (Adobe, 1992): little- or big-endian header, single
IFD, strip-organized uint16 samples, Compression = none (1), LZW (5,
section 13 with the early-change width schedule), or PackBits (32773),
Photometric BlackIsZero / RGB, chunky planar config. No external
image library — pure numpy byte assembly.

Reference-role note: the GeoTrellis reference reads GeoTIFF rasters
(geotrellis.raster.io.geotiff). This module implements the baseline
strip-organized TIFF 6.0 subset; the full georeferenced TILED form —
CRS/extent tags, overview IFDs, COG layout, windowed byte-range reads
— lives in core/geotiff.py (which shares the PackBits codec defined
here).
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF 6.0 tag ids (section 8: baseline required fields)
T_WIDTH = 256
T_LENGTH = 257
T_BITS = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIP_OFFSETS = 273
T_SPP = 277
T_ROWS_PER_STRIP = 278
T_STRIP_COUNTS = 279
T_PLANAR = 284

TYPE_SHORT = 3
TYPE_LONG = 4
_TYPE_SIZE = {TYPE_SHORT: 2, TYPE_LONG: 4}

COMP_NONE = 1
COMP_LZW = 5
COMP_PACKBITS = 32773

# TIFF 6.0 section 13 LZW constants: 8-bit-native table, codes are
# MSB-first bit-packed, 9..12 bits wide with the spec's "early change"
# (width bumps one code before the power of two).
_LZW_CLEAR = 256
_LZW_EOI = 257
_LZW_FIRST = 258
_LZW_MAX_TABLE = 4094  # table reset point: 4095/4096 are never used


def lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 section-13 LZW.  Emits ClearCode, then the standard
    greedy longest-prefix walk; code width grows 9->12 one step early
    (when the NEXT table entry would be 511/1023/2047, per the spec's
    published off-by-one that every reader implements), and the table
    resets via ClearCode when entry 4094 would be created.  The string
    table is a dict keyed by (prefix_code, byte) so lookups are O(1)
    without materializing strings."""
    out = bytearray()
    acc = 0          # bit accumulator (MSB-first)
    nacc = 0

    def put(code: int, bits: int) -> None:
        nonlocal acc, nacc
        acc = (acc << bits) | code
        nacc += bits
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
        acc &= (1 << nacc) - 1  # keep the accumulator bounded

    table: dict[tuple[int, int], int] = {}
    next_code = _LZW_FIRST
    bits = 9
    put(_LZW_CLEAR, bits)
    omega = -1  # current prefix code; -1 = empty
    for k in data:
        if omega < 0:
            omega = k
            continue
        ext = table.get((omega, k))
        if ext is not None:
            omega = ext
            continue
        put(omega, bits)
        table[(omega, k)] = next_code
        next_code += 1
        # early change: the width must fit next_code + 1 (the decoder
        # adds its mirror entry before reading the following code)
        if next_code == (1 << bits) - 1 and bits < 12:
            bits += 1
        omega = k
        if next_code == _LZW_MAX_TABLE:
            put(omega, bits)
            put(_LZW_CLEAR, bits)
            table.clear()
            next_code = _LZW_FIRST
            bits = 9
            omega = -1
    if omega >= 0:
        put(omega, bits)
        # mirror the decoder: it allocates an entry after this code,
        # so EOI's width must account for it (early change included)
        next_code += 1
        if next_code == (1 << bits) - 1 and bits < 12:
            bits += 1
    put(_LZW_EOI, bits)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    """Decode a TIFF section-13 LZW stream to exactly ``expected``
    bytes.  Handles ClearCode resets, the KwKwK not-yet-in-table case,
    and the early-change width schedule (width bumps when the table
    size reaches 510/1022/2046 — one entry before the encoder's
    511/1023/2047, covering the decoder's one-entry lag)."""
    out = bytearray()
    # table: code -> bytes; codes 0..255 are single bytes
    single = [bytes([i]) for i in range(256)]
    table: list[bytes] = []
    bits = 9
    acc = 0
    nacc = 0
    pos = 0
    n = len(data)
    old: bytes | None = None

    def get() -> int:
        nonlocal acc, nacc, pos
        while nacc < bits:
            if pos >= n:
                raise ValueError("LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nacc += 8
        nacc -= bits
        code = (acc >> nacc) & ((1 << bits) - 1)
        acc &= (1 << nacc) - 1
        return code

    while True:
        code = get()
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = []
            bits = 9
            old = None
            continue
        if old is None:
            if code > 255:
                raise ValueError("LZW: first code after clear not a byte")
            s = single[code]
        elif code < 256:
            s = single[code]
            table.append(old + s[:1])
        elif code - _LZW_FIRST < len(table):
            s = table[code - _LZW_FIRST]
            table.append(old + s[:1])
        elif code - _LZW_FIRST == len(table):  # KwKwK
            s = old + old[:1]
            table.append(s)
        else:
            raise ValueError(f"LZW: code {code} beyond table")
        out += s
        old = s
        # early change, decoder side: the decoder's table lags the
        # encoder's by exactly one entry mid-stream, so it must widen
        # one entry earlier — at table size 510/1022/2046 where the
        # encoder widens at 511/1023/2047 (TIFF 6.0 section 13)
        if _LZW_FIRST + len(table) == (1 << bits) - 2 and bits < 12:
            bits += 1
        if len(out) >= expected:
            break
    if len(out) != expected:
        raise ValueError(f"LZW decoded {len(out)} bytes, expected {expected}")
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """PackBits (TIFF 6.0 section 9): literal runs ``n-1`` headers in
    [0,127], replicate runs ``257-n`` headers in [129,255]; 128 is a
    no-op never emitted. Runs of >= 3 equal bytes are replicated."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find replicate run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j
            continue
        # literal run: scan until a >=3 replicate run starts
        j = i
        while j < n and j - i < 128:
            if (
                j + 2 < n
                and data[j] == data[j + 1] == data[j + 2]
            ):
                break
            j += 1
        out.append(j - i - 1)
        out.extend(data[i:j])
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Decode a PackBits stream to exactly ``expected`` bytes."""
    out = bytearray()
    i, n = 0, len(data)
    while len(out) < expected:
        if i >= n:
            raise ValueError("PackBits stream truncated")
        h = data[i]
        i += 1
        if h < 128:  # literal of h+1 bytes
            if i + h + 1 > n:
                raise ValueError("PackBits literal overruns stream")
            out.extend(data[i : i + h + 1])
            i += h + 1
        elif h > 128:  # replicate next byte 257-h times
            if i >= n:
                raise ValueError("PackBits replicate overruns stream")
            out.extend(data[i : i + 1] * (257 - h))
            i += 1
        # h == 128: no-op
    if len(out) != expected:
        raise ValueError(
            f"PackBits decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def tiff_encode(
    px: np.ndarray,
    compression: str = "none",
    rows_per_strip: int = 64,
    byteorder: str = "<",
) -> bytes:
    """Encode uint16 (bands, h, w) pixels — 1 band (BlackIsZero) or 3
    bands (RGB) — as a baseline TIFF: header, strip data, one IFD.
    ``byteorder`` '<' writes II (little-endian), '>' writes MM."""
    if px.ndim != 3 or px.shape[0] not in (1, 3):
        raise ValueError(f"tiff_encode wants (1|3, h, w), got {px.shape}")
    bands, h, w = px.shape
    comp = {
        "none": COMP_NONE, "packbits": COMP_PACKBITS, "lzw": COMP_LZW,
    }[compression]
    bo = byteorder
    # chunky pixel-interleaved sample order, per-strip byte slabs
    chunky = np.ascontiguousarray(
        px.transpose(1, 2, 0).astype(f"{bo}u2")
    )
    strips = []
    for r0 in range(0, h, rows_per_strip):
        raw = chunky[r0 : r0 + rows_per_strip].tobytes()
        if comp == COMP_PACKBITS:
            strips.append(packbits_encode(raw))
        elif comp == COMP_LZW:
            strips.append(lzw_encode(raw))
        else:
            strips.append(raw)

    magic = b"II" if bo == "<" else b"MM"
    header_len = 8
    data_off = header_len
    strip_offsets = []
    for s in strips:
        strip_offsets.append(data_off)
        data_off += len(s)
    if data_off % 2:  # keep IFD word-aligned
        data_off += 1
    ifd_off = data_off

    def entry(tag: int, typ: int, values) -> tuple[bytes, bytes]:
        """IFD entry bytes + external value bytes (b'' if inline)."""
        count = len(values)
        size = _TYPE_SIZE[typ] * count
        fmt = "H" if typ == TYPE_SHORT else "I"
        packed = struct.pack(f"{bo}{count}{fmt}", *values)
        if size <= 4:
            return (
                struct.pack(f"{bo}HHI", tag, typ, count)
                + packed.ljust(4, b"\x00"),
                b"",
            )
        return struct.pack(f"{bo}HHI", tag, typ, count), packed

    n_strips = len(strips)
    tags = [
        (T_WIDTH, TYPE_LONG, [w]),
        (T_LENGTH, TYPE_LONG, [h]),
        (T_BITS, TYPE_SHORT, [16] * bands),
        (T_COMPRESSION, TYPE_SHORT, [comp]),
        (T_PHOTOMETRIC, TYPE_SHORT, [2 if bands == 3 else 1]),
        (T_STRIP_OFFSETS, TYPE_LONG, strip_offsets),
        (T_SPP, TYPE_SHORT, [bands]),
        (T_ROWS_PER_STRIP, TYPE_LONG, [rows_per_strip]),
        (T_STRIP_COUNTS, TYPE_LONG, [len(s) for s in strips]),
        (T_PLANAR, TYPE_SHORT, [1]),
    ]
    # lay out external value area after the IFD
    ifd_len = 2 + 12 * len(tags) + 4
    ext_off = ifd_off + ifd_len
    entries = []
    ext = bytearray()
    for tag, typ, values in tags:
        head, extern = entry(tag, typ, values)
        if extern:
            entries.append(head + struct.pack(f"{bo}I", ext_off + len(ext)))
            ext.extend(extern)
            if len(ext) % 2:
                ext.append(0)
        else:
            entries.append(head)

    out = bytearray()
    out += magic + struct.pack(f"{bo}H", 42) + struct.pack(f"{bo}I", ifd_off)
    for s in strips:
        out += s
    out = out.ljust(ifd_off, b"\x00")
    out += struct.pack(f"{bo}H", len(tags))
    for e in entries:
        out += e
    out += struct.pack(f"{bo}I", 0)  # next-IFD = none
    out += bytes(ext)
    assert n_strips == len(strip_offsets)
    return bytes(out)


def _read_ifd(data: bytes, bo: str, off: int) -> dict[int, list[int]]:
    (n,) = struct.unpack_from(f"{bo}H", data, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(f"{bo}HHI", data, e)
        if typ not in _TYPE_SIZE:
            continue  # RATIONAL/ASCII etc — not needed for baseline
        size = _TYPE_SIZE[typ] * count
        fmt = "H" if typ == TYPE_SHORT else "I"
        if size <= 4:
            vals = struct.unpack_from(f"{bo}{count}{fmt}", data, e + 8)
        else:
            (voff,) = struct.unpack_from(f"{bo}I", data, e + 8)
            vals = struct.unpack_from(f"{bo}{count}{fmt}", data, voff)
        tags[tag] = list(vals)
    return tags


def tiff_decode(data: bytes) -> np.ndarray:
    """Decode a baseline TIFF (uint16 samples, none/PackBits, chunky)
    to uint16 (bands, h, w). Handles II and MM byte orders."""
    data = bytes(data)
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    try:
        (magic,) = struct.unpack_from(f"{bo}H", data, 2)
        if magic != 42:
            raise ValueError(f"not a TIFF: magic {magic} != 42")
        (ifd_off,) = struct.unpack_from(f"{bo}I", data, 4)
        tags = _read_ifd(data, bo, ifd_off)
    except struct.error as e:  # truncated header/IFD
        raise ValueError(f"truncated TIFF structure: {e}") from e

    w = tags[T_WIDTH][0]
    h = tags[T_LENGTH][0]
    spp = tags.get(T_SPP, [1])[0]
    bits = tags.get(T_BITS, [16] * spp)
    if any(b != 16 for b in bits):
        raise ValueError(f"only 16-bit samples supported, got {bits}")
    comp = tags.get(T_COMPRESSION, [COMP_NONE])[0]
    if comp not in (COMP_NONE, COMP_PACKBITS, COMP_LZW):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if tags.get(T_PLANAR, [1])[0] != 1:
        raise ValueError("only chunky PlanarConfiguration supported")
    rps = tags.get(T_ROWS_PER_STRIP, [h])[0]
    offsets = tags[T_STRIP_OFFSETS]
    counts = tags[T_STRIP_COUNTS]
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")

    row_bytes = w * spp * 2
    raw = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - i * rps)
        expected = nrows * row_bytes
        chunk = data[off : off + cnt]
        if comp == COMP_PACKBITS:
            raw += packbits_decode(chunk, expected)
        elif comp == COMP_LZW:
            raw += lzw_decode(chunk, expected)
        else:
            if len(chunk) != expected:
                raise ValueError(
                    f"strip {i}: {len(chunk)} bytes, expected {expected}"
                )
            raw += chunk
    arr = np.frombuffer(bytes(raw), dtype=f"{bo}u2").reshape(h, w, spp)
    return np.ascontiguousarray(arr.transpose(2, 0, 1)).astype(np.uint16)
