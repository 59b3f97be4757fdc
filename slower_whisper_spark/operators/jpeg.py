"""Baseline JPEG (SOF0) pixel decode — stdlib + numpy, no codec library.

Completes the multimodal decode tier (see operators/multimodal.py: PNG via
zlib, GIF via pure-Python LZW): Huffman entropy decode, dequantize, 8×8
IDCT, chroma upsampling and the JFIF YCbCr→RGB transform are all here, so
the common web JPEG (baseline sequential, 8-bit, gray or YCbCr, any
h/v sampling factors incl. 4:2:0 and 4:2:2, restart markers) decodes to
real pixels. Out of scope → None (caller hash-fallback): progressive
(SOF2), arithmetic coding, 12-bit precision, CMYK.

Performance shape: the entropy decode is a per-symbol Python loop — JPEG's
Huffman stream is inherently sequential per scan segment, exactly the spot
a production pipeline swaps in a codec library (libjpeg-turbo) behind the
same ``decode_jpeg_pixels`` signature. Everything after entropy decode
(dequantize, IDCT, upsample, color transform) is vectorized numpy over all
blocks at once. Ref parity: the reference ships no image codecs at all
(transcription/ is audio-only); this extends its media surface the way a
multimodal training pipeline needs.
"""

from __future__ import annotations

import struct

import numpy as np

# canonical zigzag scan order: i-th transmitted coefficient's flat index in
# the row-major 8x8 block (JPEG spec Figure 5 / libjpeg jpeg_natural_order)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal DCT-II basis: T[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
# forward DCT = T @ (block-128) @ T.T, inverse = T.T @ coeffs @ T
_x = np.arange(8)
IDCT_BASIS = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) / 2.0
IDCT_BASIS[0] /= np.sqrt(2.0)
del _x


def build_huffman(counts: bytes, symbols: bytes) -> dict:
    """Canonical JPEG Huffman table: {(bit_length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy-coded bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG magnitude decoding: a size-bit value with high bit 0 is negative."""
    if size and v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _decode_block(br: _BitReader, dc_tab: dict, ac_tab: dict, pred: int):
    """One 8×8 block of zigzag-ordered quantized coefficients + new DC pred."""
    coeffs = np.zeros(64, dtype=np.int32)
    size = br.read_symbol(dc_tab)
    diff = _extend(br.read_bits(size), size) if size else 0
    pred += diff
    coeffs[0] = pred
    k = 1
    while k < 64:
        rs = br.read_symbol(ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        coeffs[k] = _extend(br.read_bits(size), size)
        k += 1
    return coeffs, pred


def _split_scan(b: bytes, start: int):
    """De-stuff entropy-coded data from ``start``: returns (intervals, end)
    where intervals are the byte runs between restart markers; stops at EOI
    or any other marker (progressive second scan → caller rejects)."""
    intervals, cur = [], bytearray()
    i = start
    n = len(b)
    while i < n:
        c = b[i]
        if c != 0xFF:
            cur.append(c)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = b[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: interval boundary
            intervals.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:
            # 0xFF fill byte(s) the spec permits before a marker: consume
            # the leading 0xFF and re-examine — treating it as end-of-scan
            # truncated valid baseline streams mid-scan (ADVICE r5 #5)
            i += 1
        else:  # EOI or a following marker segment
            break
    intervals.append(bytes(cur))
    return intervals, i


def decode_jpeg_pixels(b: bytes) -> np.ndarray | None:
    """Decode a baseline JPEG to (height, width, 1|3) uint8 (gray | RGB).

    Marker walk collects DQT/DHT/SOF0/DRI; the SOS entropy stream is
    de-stuffed and split at restart markers (DC predictors and bit phase
    reset per interval, per spec); MCUs decode per-component blocks; then
    one vectorized pass does dequantize → IDCT → +128 → clamp for ALL
    blocks of a component at once, samples upsample to the full grid, and
    3-component images apply the JFIF YCbCr→RGB transform. Returns None
    for non-baseline/unsupported streams (progressive, arithmetic, 12-bit,
    CMYK) and corrupt data.
    """
    if b[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
        frame = None
        restart = 0
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xD9:  # EOI before any scan
                return None
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            seg = b[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:  # DQT: one or more tables
                j = 0
                while j < len(seg):
                    prec, tid = seg[j] >> 4, seg[j] & 0x0F
                    j += 1
                    if prec:  # 16-bit table
                        vals = np.frombuffer(seg[j : j + 128], dtype=">u2")
                        j += 128
                    else:
                        vals = np.frombuffer(seg[j : j + 64], dtype=np.uint8)
                        j += 64
                    qt[tid] = vals.astype(np.int32)
                i += 2 + seg_len
            elif marker == 0xC4:  # DHT: one or more tables
                j = 0
                while j < len(seg):
                    cls, tid = seg[j] >> 4, seg[j] & 0x0F
                    counts = seg[j + 1 : j + 17]
                    nsym = sum(counts)
                    symbols = seg[j + 17 : j + 17 + nsym]
                    huff[(cls, tid)] = build_huffman(counts, symbols)
                    j += 17 + nsym
                i += 2 + seg_len
            elif marker == 0xC0 or marker == 0xC1:  # baseline / ext. sequential
                prec, h_img, w_img, ncomp = struct.unpack(">BHHB", seg[:6])
                if prec != 8 or ncomp not in (1, 3) or not h_img or not w_img:
                    return None
                comps = []
                for c in range(ncomp):
                    cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                    comps.append(
                        {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                    )
                frame = (h_img, w_img, comps)
                i += 2 + seg_len
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                return None  # progressive / arithmetic / 12-bit variants
            elif marker == 0xDD:  # DRI
                restart = struct.unpack(">H", seg[:2])[0]
                i += 2 + seg_len
            elif marker == 0xDA:  # SOS: start entropy decode
                if frame is None:
                    return None
                ns = seg[0]
                sel = {}
                for c in range(ns):
                    cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                    sel[cid] = (tabs >> 4, tabs & 0x0F)
                h_img, w_img, comps = frame
                if len(sel) != len(comps):
                    return None  # non-interleaved multi-scan not supported
                intervals, _end = _split_scan(b, i + 2 + seg_len)
                return _decode_scan(
                    h_img, w_img, comps, sel, qt, huff, intervals, restart
                )
            else:  # APPn / COM / unknown: skip
                i += 2 + seg_len
        return None
    except (struct.error, IndexError, KeyError, ValueError, EOFError):
        return None


def _decode_scan(h_img, w_img, comps, sel, qt, huff, intervals, restart):
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    if not (1 <= max_h <= 4 and 1 <= max_v <= 4):
        return None
    mcus_x = -(-w_img // (8 * max_h))
    mcus_y = -(-h_img // (8 * max_v))
    n_mcus = mcus_x * mcus_y
    # per-component list of zigzag coefficient rows, filled MCU-major
    blocks = {c["id"]: [] for c in comps}
    preds = {c["id"]: 0 for c in comps}
    mcu = 0
    for iv_idx, interval in enumerate(intervals):
        br = _BitReader(interval)
        for c in comps:
            preds[c["id"]] = 0
        end = min(n_mcus, mcu + restart) if restart else n_mcus
        while mcu < end:
            for c in comps:
                dc = huff.get((0, sel[c["id"]][0]))
                ac = huff.get((1, sel[c["id"]][1]))
                if dc is None or ac is None:
                    return None
                for _ in range(c["h"] * c["v"]):
                    coeffs, preds[c["id"]] = _decode_block(
                        br, dc, ac, preds[c["id"]]
                    )
                    blocks[c["id"]].append(coeffs)
            mcu += 1
        if mcu >= n_mcus:
            break
    if mcu < n_mcus:
        return None  # truncated stream
    planes = {}
    for c in comps:
        arr = np.stack(blocks[c["id"]])  # (n_blocks, 64) zigzag ints
        deq = np.zeros_like(arr)
        deq[:, ZIGZAG] = arr * qt[c["tq"]][None, :]  # de-zigzag + dequantize
        spatial = np.einsum(
            "ux,buv,vy->bxy",
            IDCT_BASIS,
            deq.reshape(-1, 8, 8).astype(np.float64),
            IDCT_BASIS,
        )
        samples = np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)
        # blocks are MCU-major, v*h per MCU: scatter to the sample grid
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        grid = samples.reshape(mcus_y, mcus_x, c["v"], c["h"], 8, 8)
        grid = grid.transpose(0, 2, 4, 1, 3, 5).reshape(bh * 8, bw * 8)
        # upsample to the full-resolution grid (sample replication per JFIF)
        up = np.repeat(
            np.repeat(grid, max_v // c["v"], axis=0), max_h // c["h"], axis=1
        )
        planes[c["id"]] = up[:h_img, :w_img]
    if len(comps) == 1:
        return planes[comps[0]["id"]][..., None]
    y, cb, cr = (planes[c["id"]].astype(np.float64) for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.dstack([r, g, bl])), 0, 255).astype(np.uint8)
