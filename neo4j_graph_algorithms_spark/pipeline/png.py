"""REAL PNG codec built on stdlib zlib — no image libraries required.

The multimodal pipeline (`pipeline/multimodal.py`) treats images as opaque
binary columns; this module makes `image/png` a genuinely real codec path
the way `audio/wav` already is: payloads are valid PNG files (RFC 2083 /
ISO 15948 layout — 8-byte signature, length/type/data/CRC32 chunks, zlib
DEFLATE IDAT, per-scanline filters), produced and consumed with nothing but
`zlib` + `struct` + numpy.

Scope (honestly bounded): 8-bit greyscale (colour type 0) and 8-bit
truecolour RGB (colour type 2), non-interlaced — the kinds a training-data
pipeline synthesises for itself.  The DECODER implements all five scanline
filters (None/Sub/Up/Average/Paeth) and verifies every chunk CRC, so it
reads such PNGs from any writer, not only ours; palette / alpha / 16-bit /
Adam7 raise NotImplementedError rather than guessing.

Reference parity note: the reference engine has no media handling at all
(it is a graph-procedure library); this module belongs to the
training-data-pipeline surface the build brief adds on top.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# filter type codes, per the PNG spec "Filtering" section
FILT_NONE, FILT_SUB, FILT_UP, FILT_AVG, FILT_PAETH = 0, 1, 2, 3, 4


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor: nearest of left/up/up-left to a+b-c (spec order:
    left wins ties, then up)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(raw: np.ndarray, prev: np.ndarray, ftype: int, bpp: int) -> np.ndarray:
    """Forward filter one scanline (uint8 raw bytes) -> filtered bytes."""
    raw16 = raw.astype(np.int16)
    prev16 = prev.astype(np.int16)
    left = np.zeros_like(raw16)
    left[bpp:] = raw16[:-bpp]
    upleft = np.zeros_like(prev16)
    upleft[bpp:] = prev16[:-bpp]
    if ftype == FILT_NONE:
        out = raw16
    elif ftype == FILT_SUB:
        out = raw16 - left
    elif ftype == FILT_UP:
        out = raw16 - prev16
    elif ftype == FILT_AVG:
        out = raw16 - (left + prev16) // 2
    elif ftype == FILT_PAETH:
        pred = np.fromiter(
            (_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prev16, upleft)),
            dtype=np.int16,
            count=len(raw16),
        )
        out = raw16 - pred
    else:
        raise ValueError(f"bad filter type {ftype}")
    return (out % 256).astype(np.uint8)


def encode_png(pixels: np.ndarray, filter_type: int | str = FILT_NONE) -> bytes:
    """uint8 array (H,W) greyscale or (H,W,3) RGB -> PNG bytes.

    `filter_type`: a fixed filter 0..4 for every scanline, or 'mixed' to
    cycle through all five (exercises every inverse-filter path in any
    decoder that reads the output)."""
    if pixels.dtype != np.uint8:
        raise ValueError("pixels must be uint8")
    if pixels.ndim == 2:
        color_type, channels = 0, 1
        h, w = pixels.shape
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = pixels.shape[:2]
    else:
        raise ValueError("expected (H,W) grey or (H,W,3) RGB")

    flat = pixels.reshape(h, w * channels)
    prev = np.zeros(w * channels, dtype=np.uint8)
    parts = []
    for y in range(h):
        ftype = (y % 5) if filter_type == "mixed" else int(filter_type)
        filtered = _filter_row(flat[y], prev, ftype, channels)
        parts.append(bytes([ftype]) + filtered.tobytes())
        prev = flat[y]
    idat = zlib.compress(b"".join(parts), 6)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter_row(filt: np.ndarray, prev: np.ndarray, ftype: int, bpp: int) -> np.ndarray:
    """Inverse-filter one scanline.  None/Up are vectorized; Sub/Avg/Paeth
    carry a left-neighbour dependency so they scan the row (fine: decode
    cost is dominated by DEFLATE anyway, and this is the small-payload
    plumbing path)."""
    n = len(filt)
    if ftype == FILT_NONE:
        return filt.copy()
    if ftype == FILT_UP:
        return (filt.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
    out = np.zeros(n, dtype=np.int32)
    f32 = filt.astype(np.int32)
    p32 = prev.astype(np.int32)
    if ftype == FILT_SUB:
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (f32[i] + left) & 0xFF
    elif ftype == FILT_AVG:
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (f32[i] + (left + p32[i]) // 2) & 0xFF
    elif ftype == FILT_PAETH:
        for i in range(n):
            left = int(out[i - bpp]) if i >= bpp else 0
            upleft = int(p32[i - bpp]) if i >= bpp else 0
            out[i] = (f32[i] + _paeth(left, int(p32[i]), upleft)) & 0xFF
    else:
        raise ValueError(f"bad filter type byte {ftype}")
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H,W) for greyscale, (H,W,3) for RGB.

    Verifies the signature and every chunk CRC; supports any mix of the
    five scanline filters; rejects (NotImplementedError) bit depths != 8,
    palette/alpha colour types, and interlaced images."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk data")
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, ...) are CRC-checked then skipped
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, compression, filter_method, interlace = ihdr
    if depth != 8 or color_type not in (0, 2):
        raise NotImplementedError(
            f"only 8-bit grey/RGB supported (depth={depth}, colour type={color_type})"
        )
    if compression != 0 or filter_method != 0:
        raise ValueError("nonstandard compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlacing not supported")
    channels = 1 if color_type == 0 else 3
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT payload size mismatch")

    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        prev = _unfilter_row(rows[y, 1:], prev, int(rows[y, 0]), channels)
        out[y] = prev
    return out if channels == 1 else out.reshape(h, w, 3)
