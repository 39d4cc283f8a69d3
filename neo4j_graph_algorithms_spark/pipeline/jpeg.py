"""REAL baseline-JPEG codec in pure stdlib + numpy — no image libraries.

Completes the real-codec trio (pipeline/png.py zlib PNG, pipeline/gif.py
LZW GIF): payloads are genuine ITU-T T.81 baseline JPEG files — SOI, DQT,
SOF0, DHT, SOS marker segments, canonical Huffman entropy coding with
0xFF00 byte stuffing, zigzag-ordered quantized 8×8 DCT blocks, EOI.

Scope (honestly bounded, like PNG's palette/interlace bounds): 8-bit
baseline sequential, GREYSCALE or 3-component YCbCr (4:4:4 / 4:2:2 /
4:2:0 and any integer-ratio sampling grid).  The DECODER reads the
quantization and Huffman tables FROM THE STREAM (not hardcoded) and
honours per-component table ids, so it decodes baseline JPEGs from any
writer (including Annex-K-table ones); progressive (SOF2), extended
(SOF1+), CMYK (4 components), 16-bit quant tables, and restart intervals
raise NotImplementedError rather than guessing.

Colour conversion is the JFIF YCbCr→RGB transform in DOCUMENTED 8-bit
fixed point so a SQL oracle can reproduce it bit-exactly (float rounding
is engine-dependent; `x >> 8` on int64 is not):
    R = clip(floor((256·Y            + 359·(Cr−128) + 128) / 256))
    G = clip(floor((256·Y −  88·(Cb−128) − 183·(Cr−128) + 128) / 256))
    B = clip(floor((256·Y + 454·(Cb−128)             + 128) / 256))
(359 ≈ 1.402·256, 88 ≈ 0.344136·256, 183 ≈ 0.714136·256, 454 ≈
1.772·256 — max error vs the real-valued JFIF transform < 1 LSB.)

Determinism note for the oracle: JPEG is lossy, so the gate fixture uses
BLOCK-CONSTANT images (every 8×8 block one grey value).  A constant block
has exactly one nonzero DCT coefficient, DC = 8·(v−128); with the DC
quantizer set to 8 the quantized code is exactly v−128 and the decoder's
IDCT + rounding reproduces v bit-exactly (the float DCT's ~1e-13 noise
never moves an integer across the 0.5 rounding boundary).  So the DuckDB
twin regenerates pixels by formula while Spark round-trips a genuine
Huffman-coded JPEG.  Lossy behavior on arbitrary images is pytest-checked
with an error-bound roundtrip instead.

Reference parity note: the reference engine has no media handling (it is
a graph-procedure library); this belongs to the training-data-pipeline
surface the build brief adds on top.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

# orthonormal 8-point DCT-II matrix: T @ B @ T.T is the forward transform
_T = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# default quantization table (zigzag order): DC=8 makes block-constant
# images roundtrip EXACTLY (see module docstring); AC=1 is near-lossless
DEFAULT_QTABLE = np.array([8] + [1] * 63, dtype=np.int64)

# self-defined canonical Huffman tables, embedded in DHT (the decoder
# reads them back from the stream): DC = 12 symbols at length 4, AC = all
# 162 baseline (run,size) symbols at length 9 — valid canonical codes
# (the all-ones codeword of each length is never assigned), deterministic,
# deliberately simple rather than Annex-K-optimal.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = [0x00] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0xF0]
_AC_BITS = [0] * 8 + [len(_AC_VALS)] + [0] * 7


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical code construction."""
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


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-fill, per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, bits) per the T.81 magnitude-category coding."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _encode_block(
    wr: _BitWriter, block: np.ndarray, q: np.ndarray, prev_dc: int
) -> int:
    """DCT + quantize + Huffman-code one 8×8 uint8 block; returns its DC
    (the caller threads it as the next block's predictor)."""
    coef = _T @ (block.astype(np.float64) - 128.0) @ _T.T
    zz = np.round(coef[_ZZ_ROWS, _ZZ_COLS] / q).astype(np.int64)
    # DC: differential
    diff = int(zz[0]) - prev_dc
    s, bits = _magnitude(diff)
    code, length = _DC_CODES[s]
    wr.put(code, length)
    if s:
        wr.put(bits, s)
    # AC: run-length (RRRRSSSS), ZRL for 16-zero runs, EOB tail
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if (zz[1:] != 0).any() else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_CODES[0xF0]
            wr.put(code, length)
            run -= 16
        s, bits = _magnitude(v)
        code, length = _AC_CODES[(run << 4) | s]
        wr.put(code, length)
        wr.put(bits, s)
        run = 0
    if last_nz < 63:
        code, length = _AC_CODES[0x00]
        wr.put(code, length)
    return int(zz[0])


def encode_jpeg(pixels: np.ndarray, qtable: np.ndarray | None = None) -> bytes:
    """uint8 (H,W) greyscale -> baseline JPEG bytes.

    Any size (blocks padded by edge replication); `qtable` is 64 zigzag-
    ordered quantizers (default DEFAULT_QTABLE: exact for block-constant
    images, near-lossless otherwise)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 2:
        raise ValueError("expected uint8 (H,W) greyscale")
    q = DEFAULT_QTABLE if qtable is None else np.asarray(qtable, dtype=np.int64)
    if q.shape != (64,) or (q < 1).any() or (q > 255).any():
        raise ValueError("qtable must be 64 values in [1, 255]")
    h, w = pixels.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(pixels, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")

    wr = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            prev_dc = _encode_block(wr, block, q, prev_dc)

    qseg = bytes([0x00]) + bytes(int(v) for v in q)
    dht_dc = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _seg(0xFFDB, qseg)
        + _seg(0xFFC0, sof)
        + _seg(0xFFC4, dht_dc)
        + _seg(0xFFC4, dht_ac)
        + _seg(0xFFDA, sos)
        + wr.flush()
        + b"\xff\xd9"
    )


def _pad_blocks(plane: np.ndarray, unit: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(
        plane, ((0, -h % unit), (0, -w % unit)), mode="edge"
    )


def encode_jpeg_color(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    subsample: bool = True,
    qtable: np.ndarray | None = None,
) -> bytes:
    """uint8 Y (H,W) + Cb/Cr planes -> 3-component baseline JPEG bytes.

    `subsample=True` writes YCbCr 4:2:0 (luma sampling 2×2, chroma planes
    must be (ceil(H/2), ceil(W/2)) — the caller supplies chroma at its
    stored resolution, so a chroma-constant fixture round-trips exactly);
    `subsample=False` writes 4:4:4 (all planes (H,W)).  Luma uses
    quant/Huffman table ids 0, chroma ids 1 (the common layout — forces
    the decoder's per-component table selection onto a real two-table
    stream); both quant tables are `qtable` (default DEFAULT_QTABLE:
    exact for block-constant planes)."""
    for name, p in (("y", y), ("cb", cb), ("cr", cr)):
        if p.dtype != np.uint8 or p.ndim != 2:
            raise ValueError(f"expected uint8 (H,W) {name} plane")
    q = DEFAULT_QTABLE if qtable is None else np.asarray(qtable, dtype=np.int64)
    if q.shape != (64,) or (q < 1).any() or (q > 255).any():
        raise ValueError("qtable must be 64 values in [1, 255]")
    h, w = y.shape
    fac = 2 if subsample else 1
    want = (-(-h // fac), -(-w // fac))
    if cb.shape != want or cr.shape != want:
        raise ValueError(f"chroma planes must be {want} for this sampling")

    yp = _pad_blocks(y, 8 * fac)
    cbp, crp = _pad_blocks(cb, 8), _pad_blocks(cr, 8)
    wr = _BitWriter()
    dc = {"y": 0, "cb": 0, "cr": 0}
    for my in range(yp.shape[0] // (8 * fac)):
        for mx in range(yp.shape[1] // (8 * fac)):
            for v in range(fac):
                for hh in range(fac):
                    by, bx = my * fac + v, mx * fac + hh
                    dc["y"] = _encode_block(
                        wr, yp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], q, dc["y"]
                    )
            dc["cb"] = _encode_block(
                wr, cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], q, dc["cb"]
            )
            dc["cr"] = _encode_block(
                wr, crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], q, dc["cr"]
            )

    samp = 0x22 if subsample else 0x11
    qseg = (
        bytes([0x00]) + bytes(int(v) for v in q)
        + bytes([0x01]) + bytes(int(v) for v in q)
    )
    dht = b"".join(
        _seg(0xFFC4, bytes([cls_id]) + bytes(bits) + bytes(vals))
        for cls_id, bits, vals in (
            (0x00, _DC_BITS, _DC_VALS),
            (0x10, _AC_BITS, _AC_VALS),
            (0x01, _DC_BITS, _DC_VALS),
            (0x11, _AC_BITS, _AC_VALS),
        )
    )
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _seg(0xFFDB, qseg)
        + _seg(0xFFC0, sof)
        + dht
        + _seg(0xFFDA, sos)
        + wr.flush()
        + b"\xff\xd9"
    )


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_huffman_tables(data: bytes) -> dict[tuple[int, int], dict]:
    """One DHT payload -> {(class, id): canonical decode tables}."""
    out = {}
    pos = 0
    while pos < len(data):
        tc_th = data[pos]
        tc, th = tc_th >> 4, tc_th & 0x0F
        bits = list(data[pos + 1 : pos + 17])
        n = sum(bits)
        vals = list(data[pos + 17 : pos + 17 + n])
        # standard mincode/maxcode/valptr canonical decoding arrays
        mincode, maxcode, valptr = {}, {}, {}
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                valptr[length] = k
                mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                maxcode[length] = code - 1
            else:
                maxcode[length] = -1
            code <<= 1
        out[(tc, th)] = {
            "mincode": mincode, "maxcode": maxcode, "valptr": valptr, "vals": vals,
        }
        pos += 17 + n
    return out


def _huff_decode(rd: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        if table["maxcode"][length] >= code >= table["mincode"].get(length, 1 << 30):
            return table["vals"][table["valptr"][length] + code - table["mincode"][length]]
    raise ValueError("invalid Huffman code")


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _decode_block_zz(
    rd: _BitReader, dc_t: dict, ac_t: dict, prev_dc: int
) -> tuple[np.ndarray, int]:
    """Entropy-decode one block's 64 zigzag coefficients (DC differential
    already resolved); returns (zz, new DC predictor)."""
    zz = np.zeros(64, dtype=np.int64)
    s = _huff_decode(rd, dc_t)
    prev_dc += _extend(rd.bits(s), s)
    zz[0] = prev_dc
    k = 1
    while k < 64:
        rs = _huff_decode(rd, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(rd.bits(s), s)
        k += 1
    return zz, prev_dc


def _idct_block(zz: np.ndarray, q: np.ndarray) -> np.ndarray:
    coef = np.zeros((8, 8))
    coef[_ZZ_ROWS, _ZZ_COLS] = zz * q
    block = _T.T @ coef @ _T + 128.0
    return np.clip(np.round(block), 0, 255).astype(np.uint8)


def ycbcr_to_rgb_fixed(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray
) -> np.ndarray:
    """JFIF YCbCr→RGB in documented 8-bit fixed point (module docstring) —
    integer-exact, so a SQL oracle reproduces it with floor arithmetic."""
    yv = y.astype(np.int64) << 8
    cbd = cb.astype(np.int64) - 128
    crd = cr.astype(np.int64) - 128
    r = (yv + 359 * crd + 128) >> 8
    g = (yv - 88 * cbd - 183 * crd + 128) >> 8
    b = (yv + 454 * cbd + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 (H,W) greyscale or (H,W,3) RGB array.

    Tables are read from the stream and selected per component (works on
    any writer's baseline files, two-table luma/chroma layouts included);
    3-component YCbCr streams support any integer-ratio sampling grid
    (4:4:4 / 4:2:2 / 4:2:0 / ...) with replicate chroma upsampling and the
    module-docstring fixed-point RGB transform.  Progressive/extended
    SOFs, CMYK, 16-bit quant tables, and restart intervals raise
    NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[dict] = []
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker sync lost")
        if pos + 2 > len(payload):
            raise ValueError("truncated at marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(payload):
            raise ValueError("truncated marker segment header")
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if pos + 2 + length > len(payload):
            raise ValueError("truncated marker segment payload")
        data = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                qtables[tq] = np.array(list(data[p + 1 : p + 65]), dtype=np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            htables.update(_decode_huffman_tables(data))
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack(">BHHB", data[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    "only 1 (greyscale) or 3 (YCbCr) components"
                )
            if len(data) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF component specs")
            comps = [
                {
                    "cid": data[6 + 3 * i],
                    "h": data[7 + 3 * i] >> 4,
                    "v": data[7 + 3 * i] & 0x0F,
                    "tq": data[8 + 3 * i],
                }
                for i in range(ncomp)
            ]
            if any(c["h"] < 1 or c["v"] < 1 for c in comps):
                raise ValueError("zero sampling factor")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals not supported")
        elif marker == 0xDA:  # SOS: entropy data follows
            if h is None:
                raise ValueError("SOS before SOF")
            ns = data[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "only single-scan baseline (all components interleaved)"
                )
            scan: dict[int, tuple[dict, dict]] = {}
            for i in range(ns):
                cs, td_ta = data[1 + 2 * i], data[2 + 2 * i]
                scan[cs] = (htables[(0, td_ta >> 4)], htables[(1, td_ta & 0x0F)])
            rd = _BitReader(payload, pos + 2 + length)

            if len(comps) == 1:
                dc_t, ac_t = scan[comps[0]["cid"]]
                q = qtables[comps[0]["tq"]]
                bh, bw = -(-h // 8), -(-w // 8)
                out = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
                prev_dc = 0
                for by in range(bh):
                    for bx in range(bw):
                        zz, prev_dc = _decode_block_zz(rd, dc_t, ac_t, prev_dc)
                        out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                            _idct_block(zz, q)
                        )
                return out[:h, :w]

            # 3-component interleaved MCU scan (T.81 A.2.3)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if any(hmax % c["h"] or vmax % c["v"] for c in comps):
                raise NotImplementedError(
                    "non-integer chroma sampling ratios not supported"
                )
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            planes = {
                c["cid"]: np.zeros(
                    (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.uint8
                )
                for c in comps
            }
            prev = {c["cid"]: 0 for c in comps}
            for my in range(mcuy):
                for mx in range(mcux):
                    for c in comps:
                        dc_t, ac_t = scan[c["cid"]]
                        q = qtables[c["tq"]]
                        plane = planes[c["cid"]]
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                zz, prev[c["cid"]] = _decode_block_zz(
                                    rd, dc_t, ac_t, prev[c["cid"]]
                                )
                                by, bx = my * c["v"] + v, mx * c["h"] + hh
                                plane[
                                    by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                                ] = _idct_block(zz, q)
            up = {}
            for c in comps:
                p = planes[c["cid"]]
                p = np.repeat(p, vmax // c["v"], axis=0)
                p = np.repeat(p, hmax // c["h"], axis=1)
                up[c["cid"]] = p[:h, :w]
            y_p, cb_p, cr_p = (up[c["cid"]] for c in comps)
            return ycbcr_to_rgb_fixed(y_p, cb_p, cr_p)
        # APPn / COM / other: skip
        pos += 2 + length
    raise ValueError("no SOS segment found")


def jpeg_color_planes(
    media_id: int, width: int, height: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic MCU-CONSTANT YCbCr planes (one value per 16×16 luma
    MCU and channel) whose 4:2:0 JPEG roundtrip is exact — every coded
    block is constant, so only the exactly-coded DC survives quantization
    and replicate upsampling reproduces the constant chroma bit-for-bit.
    MCU (my, mx) of media m:
        Y  = (17·mx + 29·my + 31·m) % 256
        Cb = (11·mx +  7·my + 13·m) % 256
        Cr = ( 5·mx + 23·my + 19·m) % 256
    Returns (y, cb, cr) with chroma at stored (subsampled) resolution."""
    mx_l = np.arange(width, dtype=np.int64) // 16
    my_l = np.arange(height, dtype=np.int64) // 16
    y = ((17 * mx_l[None, :] + 29 * my_l[:, None] + 31 * media_id) % 256).astype(
        np.uint8
    )
    mx_c = np.arange(-(-width // 2), dtype=np.int64) // 8
    my_c = np.arange(-(-height // 2), dtype=np.int64) // 8
    cb = ((11 * mx_c[None, :] + 7 * my_c[:, None] + 13 * media_id) % 256).astype(
        np.uint8
    )
    cr = ((5 * mx_c[None, :] + 23 * my_c[:, None] + 19 * media_id) % 256).astype(
        np.uint8
    )
    return y, cb, cr


def jpeg_block_pixels(media_id: int, width: int, height: int) -> np.ndarray:
    """Deterministic BLOCK-CONSTANT grid (8×8 blocks one value each) whose
    JPEG roundtrip is exact: block (by, bx) of media m =
    (17·bx + 29·by + 31·m) % 256."""
    bx = np.arange(width, dtype=np.int64) // 8
    by = np.arange(height, dtype=np.int64) // 8
    return ((17 * bx[None, :] + 29 * by[:, None] + 31 * media_id) % 256).astype(
        np.uint8
    )
