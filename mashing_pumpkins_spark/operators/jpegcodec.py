"""Baseline-sequential JPEG codec in pure numpy + stdlib — no external
image libraries, mirroring the PNG codec's role (multimodal.py): a REAL
decoder behind ``decode_image`` for the dominant crawl image format, with
an encoder so tests and driver queries can build deterministic payloads.

Public-spec sources only: ITU-T T.81 / ISO 10918-1 (marker syntax, Annex K
example quantization + Huffman tables, Annex F entropy coding procedures)
and the JFIF 1.02 spec (BT.601 full-range color transform). Reference
parity note: the reference repo (lgautier/mashing-pumpkins) has no image
path at all — this module belongs to the LLM-training-data extensions, as
SURVEY.md §2 lists for multimodal columns.

Scope (documented, enforced):
  decode  baseline (SOF0), extended-sequential (SOF1) AND progressive
          (SOF2) Huffman scans — progressive per T.81 Annex G: spectral
          selection, successive approximation, DC/AC first + refinement
          passes, EOB runs, interleaved DC / non-interleaved AC scans —
          8-bit samples, 1 or 3 components, sampling factors 1-2
          (4:4:4 / 4:2:2 / 4:2:0), restart markers, 8/16-bit DQT.
          Arithmetic coding (SOF9+), hierarchical, lossless, 12-bit, and
          non-interleaved multi-scan SEQUENTIAL files raise
          NotImplementedError; truncated/corrupt streams raise
          ValueError. Decompression-bomb cap: H*W*components is checked
          against ``max_pixels`` BEFORE any entropy decode (the PNG
          codec's cap contract).
  encode  grayscale HxW or RGB HxWx3 uint8 -> baseline JFIF bytes
          (encode_jpeg) or progressive SOF2 with a libjpeg-style scan
          script (encode_jpeg_progressive — ships its own AC Huffman
          table since the Annex K baseline tables carry no EOBn symbols);
          quality 1-100 (Annex K tables, libjpeg-style scaling), 4:4:4 or
          4:2:0, optional restart interval (baseline). Not a
          rate/quality-optimized encoder — a spec-faithful payload
          builder; progressive and baseline encodes of the same image
          decode to IDENTICAL pixels (the coefficient pipeline is shared).
"""

from __future__ import annotations

import struct
from functools import lru_cache as _lru_cache

import numpy as np

# ---------------------------------------------------------------- tables
# ITU-T T.81 Annex K.1 — example quantization tables (row-major).
STD_LUMA_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
STD_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# zig-zag scan order: ZIGZAG[i] = row-major index of the i-th coefficient.
def _zigzag_order() -> np.ndarray:
    # anti-diagonals in order; odd diagonals walk down (row ascending),
    # even diagonals walk up (column ascending) — T.81 Figure 5
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 — typical Huffman tables as (BITS[1..16], HUFFVAL) pairs.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: F = M @ B @ M.T is exactly the T.81
# FDCT (S(0,0) = 8 * mean(B - 128) convention); B = M.T @ F @ M inverts it
_k = np.arange(8.0)
_M = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_M[0, :] = 1.0 / (2.0 * np.sqrt(2.0))


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables scaled by IJG quality semantics (public libjpeg
    formula): scale = 5000/q below 50 else 200-2q, clipped to [1,255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def s(t: np.ndarray) -> np.ndarray:
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.int32)
    return s(STD_LUMA_QT), s(STD_CHROMA_QT)


# ------------------------------------------------------------- bit writer
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def pad_to_byte(self) -> None:
        if self._nbits:
            self.write((1 << (8 - self._nbits)) - 1, 8 - self._nbits)


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the canonical code assignment of
    T.81 Annex C."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


# ---------------------------------------------------------------- encoder
def _prepare_components(
    img: np.ndarray, quality: int, subsampling: str
) -> tuple[list[np.ndarray], list[tuple[int, int]], np.ndarray, np.ndarray, int, int, bool]:
    """Shared encoder front half: color transform, subsample, pad, FDCT,
    quantize. Returns (comp_blocks[(by,bx,8,8) int64], hv, luma_qt,
    chroma_qt, mcus_x, mcus_y, color)."""
    a = np.asarray(img)
    if a.dtype != np.uint8 or a.ndim not in (2, 3) or (a.ndim == 3 and a.shape[2] != 3):
        raise ValueError("expected HxW or HxWx3 uint8")
    if a.size == 0:
        raise ValueError("empty image")
    h, w = a.shape[:2]
    color = a.ndim == 3
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    sub = color and subsampling == "4:2:0"

    luma_qt, chroma_qt = quality_tables(quality)
    if color:
        f = a.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = 128.0 - 0.168735892 * f[..., 0] - 0.331264108 * f[..., 1] + 0.5 * f[..., 2]
        cr = 128.0 + 0.5 * f[..., 0] - 0.418687589 * f[..., 1] - 0.081312411 * f[..., 2]
        planes = [np.clip(np.rint(p), 0, 255) for p in (y, cb, cr)]
    else:
        planes = [a.astype(np.float64)]

    hv = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * len(planes)
    hmax = max(x for x, _ in hv)
    vmax = max(y_ for _, y_ in hv)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    comp_blocks = []  # per component: (blocks_y, blocks_x, 8, 8) quantized int
    for ci, plane in enumerate(planes):
        hi, vi = hv[ci]
        if ci > 0 and sub:
            # box downsample by 2 (edge-replicate odd dimensions first)
            if plane.shape[0] % 2:
                plane = np.vstack([plane, plane[-1:]])
            if plane.shape[1] % 2:
                plane = np.hstack([plane, plane[:, -1:]])
            plane = np.rint(
                (plane[0::2, 0::2] + plane[1::2, 0::2] + plane[0::2, 1::2] + plane[1::2, 1::2]) / 4.0
            )
        by, bx = mcus_y * vi, mcus_x * hi
        target_h, target_w = by * 8, bx * 8
        pad_h, pad_w = target_h - plane.shape[0], target_w - plane.shape[1]
        plane = np.pad(plane, ((0, pad_h), (0, pad_w)), mode="edge")
        blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
        coefs = np.einsum("ij,abjk,lk->abil", _M, blocks, _M)
        qt = luma_qt if ci == 0 else chroma_qt
        comp_blocks.append(np.rint(coefs / qt).astype(np.int64))
    return comp_blocks, hv, luma_qt, chroma_qt, mcus_x, mcus_y, color


def encode_jpeg(
    img: np.ndarray,
    quality: int = 75,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 as baseline JFIF.

    ``subsampling``: "4:4:4" or "4:2:0" (ignored for grayscale).
    ``restart_interval``: MCUs between RSTn markers (0 = none) — lets
    tests exercise the decoder's restart path."""
    a = np.asarray(img)
    comp_blocks, hv, luma_qt, chroma_qt, mcus_x, mcus_y, color = _prepare_components(
        img, quality, subsampling
    )
    h, w = a.shape[:2]

    dc_tables = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
                 _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_tables = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
                 _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    def encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, tsel: int) -> int:
        dc_tab, ac_tab = dc_tables[tsel], ac_tables[tsel]
        dc = int(zz[0])
        size, bits = _magnitude(dc - pred)
        code, length = dc_tab[size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for i in range(1, 64):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, l = ac_tab[0xF0]  # ZRL
                bw.write(c, l)
                run -= 16
            size, bits = _magnitude(v)
            c, l = ac_tab[(run << 4) | size]
            bw.write(c, l)
            bw.write(bits, size)
            run = 0
            if i == last_nz:
                break
        if last_nz < 63:
            c, l = ac_tab[0x00]  # EOB
            bw.write(c, l)
        return dc

    # entropy-coded scan
    body = bytearray()
    bw = _BitWriter()
    ncomps = len(comp_blocks)
    preds = [0] * ncomps
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.pad_to_byte()
                body += bw.out
                body += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0] * ncomps
            for ci in range(ncomps):
                hi, vi = hv[ci]
                tsel = 0 if ci == 0 else 1
                for byi in range(vi):
                    for bxi in range(hi):
                        block = comp_blocks[ci][my * vi + byi, mx * hi + bxi]
                        zz = block.reshape(64)[ZIGZAG]
                        preds[ci] = encode_block(bw, zz, preds[ci], tsel)
            mcu_count += 1
    bw.pad_to_byte()
    body += bw.out

    # ----- markers
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x02\x01\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(luma_qt.reshape(64)[ZIGZAG].astype(np.uint8)))
    if color:
        out += seg(0xDB, bytes([0x01]) + bytes(chroma_qt.reshape(64)[ZIGZAG].astype(np.uint8)))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = hv[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    def dht(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if color:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder
class _BitReader:
    """MSB-first buffered reader over an already-unstuffed byte segment.
    ``peek*`` pads with zeros past the stream end (never consumes);
    ``skip``/``read_bits`` raise on true exhaustion, preserving the
    truncation contract."""

    __slots__ = ("data", "pos", "_acc", "_nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def _fill(self, need: int) -> None:
        while self._nbits < need:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy segment")
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._nbits += 8

    def _peek(self, n: int) -> int:
        while self._nbits < n and self.pos < len(self.data):
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._nbits += 8
        if self._nbits >= n:
            return (self._acc >> (self._nbits - n)) & ((1 << n) - 1)
        return (self._acc << (n - self._nbits)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self._fill(n)
        self._nbits -= n
        self._acc &= (1 << self._nbits) - 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self._acc >> (self._nbits - n)) & ((1 << n) - 1)
        self._nbits -= n
        self._acc &= (1 << self._nbits) - 1
        return v


class _HuffTable:
    """Canonical decode per T.81 F.2.2.3 (MINCODE/MAXCODE/VALPTR), with an
    8-bit prefix lookup fast path: symbols whose code is <= 8 bits (the
    overwhelming majority in real tables) resolve with one peek + one
    table index instead of a per-bit walk."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.fast = [(-1, 0)] * 256
        code = 0
        idx = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = idx
                self.mincode[length] = code
                if length <= 8:
                    for _ in range(bits[length - 1]):
                        base = code << (8 - length)
                        entry = (vals[idx], length)
                        for suffix in range(1 << (8 - length)):
                            self.fast[base | suffix] = entry
                        code += 1
                        idx += 1
                else:
                    code += bits[length - 1]
                    idx += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        sym, length = self.fast[br._peek(8)]
        if length:
            br.skip(length)
            return sym
        code16 = br._peek(16)
        for length in range(9, 17):
            c = code16 >> (16 - length)
            if c <= self.maxcode[length]:
                br.skip(length)
                return self.vals[self.valptr[length] + c - self.mincode[length]]
        raise ValueError("invalid Huffman code")

    def blob(self) -> np.ndarray:
        """This table in the C kernel's int32 layout (_jpeg_cext):
        fast[256] ((len<<16)|sym, -1 = long code), maxcode[17],
        mincode[17], valptr[17], vals[256]. Built once, cached."""
        b = getattr(self, "_blob", None)
        if b is None:
            fast = np.array(
                [((ln << 16) | sym) if ln else -1 for sym, ln in self.fast],
                dtype=np.int32,
            )
            vals = np.zeros(256, dtype=np.int32)
            vals[: len(self.vals)] = self.vals
            b = np.concatenate(
                [
                    fast,
                    np.array(self.maxcode, dtype=np.int32),
                    np.array(self.mincode, dtype=np.int32),
                    np.array(self.valptr, dtype=np.int32),
                    vals,
                ]
            )
            self._blob = b
        return b


@_lru_cache(maxsize=256)
def _huff_table_cached(bits: tuple, vals: tuple) -> "_HuffTable":
    """Memoized table construction: crawls reuse a handful of tables
    (Annex K or libjpeg-optimized) across millions of images, and the
    256-entry fast-path fill dominated small-image decode profiles.
    Tables are immutable after construction, so sharing is safe."""
    return _HuffTable(list(bits), list(vals))


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits back to a signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded data from `start`, splitting at RSTn.
    Returns (segments, index of the terminating marker's 0xFF).

    Scans only the 0xFF positions (numpy flatnonzero) instead of every
    byte, cutting raw segments at RST pairs and unstuffing each with one
    C-level bytes.replace — semantics identical to the per-byte walk it
    replaced (every 0xFF in entropy data is either stuffed FF 00, an RST
    pair, or the scan-terminating marker)."""
    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    raw_parts: list[bytes] = []
    seg_start = start
    for pos in np.flatnonzero(arr[start:] == 0xFF):
        pos = int(pos) + start
        if pos < seg_start:  # second byte of an already-consumed pair
            continue
        if pos + 1 >= n:
            raise ValueError("truncated JPEG stream")
        m = data[pos + 1]
        if m == 0x00:
            continue  # stuffed data byte, resolved by the replace below
        raw_parts.append(data[seg_start:pos])
        if 0xD0 <= m <= 0xD7:  # RSTn
            seg_start = pos + 2
            continue
        # any real marker terminates the scan
        return [p.replace(b"\xff\x00", b"\xff") for p in raw_parts], pos
    raise ValueError("JPEG scan not terminated by a marker")


def decode_jpeg(
    payload: bytes, max_pixels: int = 64 << 20, *, _cext: bool = False
) -> np.ndarray:
    """Decode baseline (SOF0), extended-sequential (SOF1) and PROGRESSIVE
    (SOF2) Huffman JPEG to HxW (grayscale) or HxWx3 (RGB) uint8. See
    module docstring for scope; arithmetic / hierarchical / 12-bit raise
    NotImplementedError, malformed input raises ValueError. ``max_pixels``
    caps H*W*components before entropy decode (decompression-bomb guard,
    same contract as decode_png). ``_cext`` routes baseline entropy scans
    through the self-compiled C kernel when it loads (decode_jpeg_cext is
    the public entry; coefficients and pixels are identical either way).

    Progressive scans (spectral selection + successive approximation, DC
    and AC first/refinement passes, interleaved DC / non-interleaved AC,
    restart markers) accumulate quantized coefficients per component per
    T.81 Annex G; dequantization + IDCT run once at EOI."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (h, w, comps, progressive); comps = [(cid, hi, vi, tq)]
    coefs: list[np.ndarray] | None = None  # per comp: (by, bx, 64) zigzag ints
    any_scan = False
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("truncated JPEG marker segment")
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        seg = payload[i + 4 : i + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG marker segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    zz = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                elif pq == 1:
                    zz = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    raise ValueError("bad DQT precision")
                if len(zz) != 64:
                    raise ValueError("truncated DQT")
                qts[tq] = zz[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("truncated DHT")
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_table_cached(
                    tuple(bits), tuple(vals)
                )
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            if frame is not None:
                raise ValueError("multiple SOF markers")
            precision, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG unsupported")
            comps = []
            for c in range(nc):
                cid, hvbyte, tq = seg[6 + 3 * c : 9 + 3 * c]
                hi, vi = hvbyte >> 4, hvbyte & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError("sampling factors beyond 2 unsupported")
                comps.append((cid, hi, vi, tq))
            if fh == 0 or fw == 0:
                raise ValueError("zero image dimension")
            if fh * fw * nc > max_pixels:
                raise ValueError(
                    f"JPEG dimensions {fw}x{fh}x{nc} exceed max_pixels={max_pixels}"
                )
            frame = (fh, fw, comps, marker == 0xC2)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-fw // (8 * hmax))
            mcus_y = -(-fh // (8 * vmax))
            coefs = [
                np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int64)
                for (_cid, hi, vi, _tq) in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic/hierarchical/lossless JPEG not supported "
                "(baseline, extended-sequential and progressive Huffman only)"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel.append((cs, tabs >> 4, tabs & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            i = _decode_one_scan(
                payload, i + 2 + seg_len, frame, scan_sel,
                ss, se, ah, al, coefs, qts, dc_tabs, ac_tabs, restart_interval,
                use_cext=_cext,
            )
            any_scan = True
            continue
        # APPn / COM / others: skip
        i += 2 + seg_len
    if frame is None or not any_scan:
        raise ValueError("no image data (missing SOF or SOS)")
    return _reconstruct(frame, coefs, qts)


def _decode_one_scan(
    payload, start, frame, scan_sel, ss, se, ah, al,
    coefs, qts, dc_tabs, ac_tabs, ri, use_cext=False,
):
    """Decode one entropy-coded scan into the coefficient store. Returns
    the payload index of the scan-terminating marker. ``use_cext`` sends
    baseline (non-progressive) scans through the C kernel when loaded —
    same coefficients, same error contract; progressive scans always take
    the Python path."""
    fh, fw, comps, progressive = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    if not progressive:
        ss, se, ah, al = 0, 63, 0, 0
        if len(scan_sel) != len(comps):
            raise NotImplementedError(
                "non-interleaved multi-scan sequential JPEG unsupported"
            )
    else:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scan_sel) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        if se > 63 or ss > se:
            raise ValueError("bad spectral selection")

    # resolve scan components -> (comp_index, dc_tab|None, ac_tab|None)
    members = []
    for cs, td, ta in scan_sel:
        ci = next(
            (j for j, (cid, *_rest) in enumerate(comps) if cid == cs), None
        )
        if ci is None:
            raise ValueError("scan component not in frame")
        need_dc = ss == 0
        need_ac = se > 0
        if need_dc and ah == 0 and td not in dc_tabs:
            raise ValueError("missing DC Huffman table")
        if need_ac and ta not in ac_tabs:
            raise ValueError("missing AC Huffman table")
        members.append((ci, dc_tabs.get(td), ac_tabs.get(ta)))

    segments, end = _split_scan(payload, start)

    # unit geometry: interleaved -> MCUs over all members; single-component
    # scan -> that component's own block raster (T.81 A.2.2)
    interleaved = len(members) > 1
    if interleaved:
        total_units = mcus_x * mcus_y
    else:
        ci = members[0][0]
        _cid, hi, vi, _tq = comps[ci]
        nb_x = -(-(fw * hi) // (8 * hmax))
        nb_y = -(-(fh * vi) // (8 * vmax))
        total_units = nb_x * nb_y
    if ri and len(segments) < -(-total_units // ri):
        raise ValueError("truncated JPEG scan (missing restart segments)")

    if not progressive and use_cext:
        from . import _jpeg_cext

        lib = _jpeg_cext.load()
        if lib is not None:
            _decode_scan_c(
                lib, segments, members, comps, coefs, interleaved,
                mcus_x, nb_x if not interleaved else 1, total_units, ri,
            )
            return end

    preds = [0] * len(comps)
    eobrun = 0
    br = _BitReader(segments[0])
    seg_idx = 0
    unit = 0
    while unit < total_units:
        if ri and unit and unit % ri == 0:
            seg_idx += 1
            br = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, mcus_x)
            for ci, dc_tab, ac_tab in members:
                _cid, hi, vi, _tq = comps[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        blk = coefs[ci][my * vi + byi, mx * hi + bxi]
                        preds[ci], eobrun = _decode_block(
                            br, blk, dc_tab, ac_tab, preds[ci], eobrun,
                            progressive, ss, se, ah, al,
                        )
        else:
            ci, dc_tab, ac_tab = members[0]
            by, bx = divmod(unit, nb_x)
            blk = coefs[ci][by, bx]
            preds[ci], eobrun = _decode_block(
                br, blk, dc_tab, ac_tab, preds[ci], eobrun,
                progressive, ss, se, ah, al,
            )
        unit += 1
    return end


def _decode_scan_c(
    lib, segments, members, comps, coefs, interleaved, mcus_x, nb_x,
    total_units, ri,
):
    """Drive the C kernel over one baseline scan: one call per restart
    segment (predictors reset per segment, exactly the Python loop's
    contract). Coefficient grids are written in place."""
    import ctypes

    from . import _jpeg_cext

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    member_geom = np.zeros(3 * len(members), dtype=np.int32)
    dc_off = np.zeros(len(members), dtype=np.int32)
    ac_off = np.zeros(len(members), dtype=np.int32)
    blob_list, offsets = [], {}
    offset = 0
    for m, (ci, dc_tab, ac_tab) in enumerate(members):
        _cid, hi, vi, _tq = comps[ci]
        member_geom[3 * m : 3 * m + 3] = (ci, hi, vi)
        for tab, arr in ((dc_tab, dc_off), (ac_tab, ac_off)):
            if id(tab) not in offsets:
                b = tab.blob()
                offsets[id(tab)] = offset
                blob_list.append(b)
                offset += len(b)
            arr[m] = offsets[id(tab)]
    tables = np.ascontiguousarray(np.concatenate(blob_list), dtype=np.int32)
    grids = (ctypes.c_void_p * len(coefs))(*[c.ctypes.data for c in coefs])
    grid_bx = np.array([c.shape[1] for c in coefs], dtype=np.int64)
    step = ri if ri else total_units
    unit, seg_idx = 0, 0
    while unit < total_units:
        preds = np.zeros(len(coefs), dtype=np.int64)
        count = min(step, total_units - unit)
        seg = segments[seg_idx]
        rc = lib.mp_decode_scan_units(
            seg, len(seg), len(members),
            member_geom.ctypes.data_as(i32p),
            tables.ctypes.data_as(i32p),
            dc_off.ctypes.data_as(i32p),
            ac_off.ctypes.data_as(i32p),
            1 if interleaved else 0, mcus_x, nb_x,
            unit, count,
            grids, grid_bx.ctypes.data_as(i64p),
            preds.ctypes.data_as(i64p),
        )
        if rc:
            raise ValueError(_jpeg_cext.error_message(rc))
        unit += count
        seg_idx += 1


def _decode_block(br, zz, dc_tab, ac_tab, pred, eobrun, progressive, ss, se, ah, al):
    """Decode one 8x8 block's contribution for the current scan into `zz`
    (a view into the coefficient store, zigzag order). Returns the updated
    (dc prediction, eobrun)."""
    if not progressive:
        size = dc_tab.decode(br)
        if size > 11:
            raise ValueError("invalid DC size category")
        pred += _extend(br.read_bits(size), size)
        zz[0] = pred
        k = 1
        while k < 64:
            rs = ac_tab.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC index overflow")
            zz[k] = _extend(br.read_bits(s), s)
            k += 1
        return pred, eobrun

    if ss == 0:  # DC scan
        if ah == 0:  # first pass
            size = dc_tab.decode(br)
            if size > 11:
                raise ValueError("invalid DC size category")
            pred += _extend(br.read_bits(size), size)
            zz[0] = pred << al
        else:  # refinement: one raw bit
            if br.read_bits(1):
                zz[0] = int(zz[0]) | (1 << al)
        return pred, eobrun

    # AC scans (G.1.2.2 first pass / G.1.2.3 refinement)
    if ah == 0:  # first pass for this band
        if eobrun > 0:
            return pred, eobrun - 1
        k = ss
        while k <= se:
            rs = ac_tab.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.read_bits(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC index overflow in progressive scan")
            zz[k] = _extend(br.read_bits(s), s) << al
            k += 1
        return pred, eobrun

    # AC refinement
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac_tab.decode(br)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:  # EOBn: run includes this block
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad refinement size category")
                newval = p1 if br.read_bits(1) else -p1
            # advance: correction bits on nonzero-history coefficients,
            # count r zero-history positions
            while k <= se:
                cur = int(zz[k])
                if cur != 0:
                    if br.read_bits(1) and (abs(cur) & p1) == 0:
                        zz[k] = cur + (p1 if cur >= 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("refinement position overflow")
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            cur = int(zz[k])
            if cur != 0:
                if br.read_bits(1) and (abs(cur) & p1) == 0:
                    zz[k] = cur + (p1 if cur >= 0 else -p1)
            k += 1
        eobrun -= 1
    return pred, eobrun


def _reconstruct(frame, coefs, qts):
    """Dequantize + batch IDCT + reassemble/upsample/color-convert."""
    fh, fw, comps, _progressive = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        if tq not in qts:
            raise ValueError("missing quantization table")
        qt = qts[tq].astype(np.int64)
        grid = coefs[ci]  # (by, bx, 64) zigzag
        by, bx = grid.shape[:2]
        nat = grid[:, :, UNZIGZAG].reshape(by * bx, 8, 8) * qt
        # batched IDCT M.T @ nat @ M as two LARGE GEMMs (8x8-batched
        # matmul pays per-block dispatch overhead): X = nat @ M, then
        # M.T @ X = (X.T @ M).T per block
        x = (nat.astype(np.float64).reshape(-1, 8) @ _M).reshape(-1, 8, 8)
        xt = np.ascontiguousarray(x.transpose(0, 2, 1)).reshape(-1, 8)
        pixels = (
            (xt @ _M).reshape(-1, 8, 8).transpose(0, 2, 1).reshape(by, bx, 8, 8)
            + 128.0
        )
        plane = pixels.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# -------------------------------------------------- progressive encoder
# The Annex K baseline AC tables carry no EOBn symbols (r,0) for r=1..14 —
# progressive scans need them, which is why real progressive encoders ship
# custom Huffman tables in the DHT. This static table covers every symbol a
# progressive AC scan can emit: EOB1..EOB15 runs (0x00..0xE0), ZRL (0xF0)
# and all (run 0-15, size 1-10) pairs — 176 symbols at lengths 7/8/9
# (Kraft sum 0.906 < 1, so the all-ones code stays unassigned as T.81
# Annex C's table-building flow guarantees).
_PROG_AC_VALS = (
    [r << 4 for r in range(15)]  # EOBn
    + [0xF0]  # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 64, 96, 16, 0, 0, 0, 0, 0, 0, 0]
assert sum(_PROG_AC_BITS) == len(_PROG_AC_VALS) == 176


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 75, subsampling: str = "4:4:4"
) -> bytes:
    """Encode as PROGRESSIVE JFIF (SOF2) with a libjpeg-style scan script:
    interleaved DC first pass at Al=1, per-component AC first passes for
    bands 1-5 and 6-63 at Al=1, an interleaved DC refinement, then
    per-component AC refinements — exercising spectral selection,
    successive approximation, EOB runs and both refinement algorithms.
    Coefficients (and therefore fully-decoded output) are identical to
    ``encode_jpeg`` at the same quality/subsampling."""
    comp_blocks, hv, luma_qt, chroma_qt, mcus_x, mcus_y, color = _prepare_components(
        img, quality, subsampling
    )
    a = np.asarray(img)
    h, w = a.shape[:2]
    ncomps = len(comp_blocks)
    hmax = max(x for x, _ in hv)
    vmax = max(y_ for _, y_ in hv)
    # zigzag-ordered coefficient grids per component
    czz = [
        cb.reshape(cb.shape[0], cb.shape[1], 64)[:, :, ZIGZAG] for cb in comp_blocks
    ]
    dc_tables = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
                 _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    prog_ac = _build_encode_table(_PROG_AC_BITS, _PROG_AC_VALS)
    ac_tables = [prog_ac, prog_ac]

    def interleaved_blocks():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomps):
                    hi, vi = hv[ci]
                    for byi in range(vi):
                        for bxi in range(hi):
                            yield ci, czz[ci][my * vi + byi, mx * hi + bxi]

    def comp_blocks_raster(ci):
        hi, vi = hv[ci]
        nb_x = -(-(w * hi) // (8 * hmax))
        nb_y = -(-(h * vi) // (8 * vmax))
        for by in range(nb_y):
            for bx in range(nb_x):
                yield czz[ci][by, bx]

    def dc_first_scan(al):
        bw = _BitWriter()
        preds = [0] * ncomps
        for ci, zz in interleaved_blocks():
            d = int(zz[0]) >> al
            size, bits = _magnitude(d - preds[ci])
            code, length = dc_tables[0 if ci == 0 else 1][size]
            bw.write(code, length)
            bw.write(bits, size)
            preds[ci] = d
        bw.pad_to_byte()
        return bytes(bw.out)

    def dc_refine_scan(al):
        bw = _BitWriter()
        for _ci, zz in interleaved_blocks():
            bw.write((int(zz[0]) >> al) & 1, 1)
        bw.pad_to_byte()
        return bytes(bw.out)

    def ac_first_scan(ci, ss, se, al):
        bw = _BitWriter()
        ac = ac_tables[0 if ci == 0 else 1]
        state = {"eobrun": 0}

        def flush_eob():
            n = state["eobrun"]
            if n:
                nbits = n.bit_length() - 1
                code, length = ac[nbits << 4]
                bw.write(code, length)
                bw.write(n - (1 << nbits), nbits)
                state["eobrun"] = 0

        for zz in comp_blocks_raster(ci):
            vals = [
                (1 if int(v) >= 0 else -1) * (abs(int(v)) >> al)
                for v in zz[ss : se + 1]
            ]
            nz = [i for i, v in enumerate(vals) if v]
            if not nz:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for i in range(nz[-1] + 1):
                v = vals[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac[0xF0]
                    bw.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if nz[-1] < se - ss:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    flush_eob()
        flush_eob()
        bw.pad_to_byte()
        return bytes(bw.out)

    def ac_refine_scan(ci, ss, se, al):
        """Exact mirror of the decoder's G.1.2.3 walk: correction bits for
        nonzero-history coefficients are emitted in the positions the
        decoder reads them (after each symbol's own bits; EOB-covered
        blocks' bits after the flushed EOBn)."""
        bw = _BitWriter()
        ac = ac_tables[0 if ci == 0 else 1]
        ah = al + 1
        state = {"eobrun": 0, "pending": []}

        def flush_eob():
            if state["eobrun"]:
                n = state["eobrun"]
                nbits = n.bit_length() - 1
                code, length = ac[nbits << 4]
                bw.write(code, length)
                bw.write(n - (1 << nbits), nbits)
                state["eobrun"] = 0
            for b in state["pending"]:
                bw.write(b, 1)
            state["pending"] = []

        for zz in comp_blocks_raster(ci):
            band = [int(v) for v in zz[ss : se + 1]]
            absv = [abs(v) >> al for v in band]
            hist = [abs(v) >> ah for v in band]
            newsigs = [
                i for i in range(len(band)) if hist[i] == 0 and absv[i] == 1
            ]
            k = 0
            if newsigs:
                flush_eob()
                for ns in newsigs:
                    r = sum(
                        1 for j in range(k, ns) if hist[j] == 0
                    )
                    while r > 15:
                        code, length = ac[0xF0]
                        bw.write(code, length)
                        cnt = 0
                        while cnt < 16:
                            if hist[k] != 0:
                                bw.write(absv[k] & 1, 1)
                            else:
                                cnt += 1
                            k += 1
                        r -= 16
                    code, length = ac[(r << 4) | 1]
                    bw.write(code, length)
                    bw.write(1 if band[ns] > 0 else 0, 1)
                    while k < ns:
                        if hist[k] != 0:
                            bw.write(absv[k] & 1, 1)
                        k += 1
                    k = ns + 1
            # trailing part of the band (or whole band if no new sigs):
            # covered by an EOB run; history correction bits attach to it
            if k <= se - ss or not newsigs:
                tail_bits = [absv[j] & 1 for j in range(k, se - ss + 1) if hist[j] != 0]
                state["eobrun"] += 1
                state["pending"].extend(tail_bits)
                if state["eobrun"] == 0x7FFF:
                    flush_eob()
        flush_eob()
        bw.pad_to_byte()
        return bytes(bw.out)

    # ----- assemble the stream
    def seg(marker: int, payload_: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload_) + 2) + payload_

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x02\x01\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(luma_qt.reshape(64)[ZIGZAG].astype(np.uint8)))
    if color:
        out += seg(0xDB, bytes([0x01]) + bytes(chroma_qt.reshape(64)[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomps)
    for ci in range(ncomps):
        hi, vi = hv[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)  # SOF2: progressive

    def dht(tclass, tid, bits, vals):
        return seg(0xC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, _PROG_AC_BITS, _PROG_AC_VALS)
    if color:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, _PROG_AC_BITS, _PROG_AC_VALS)

    def sos(members, ss, se, ah, al, body):
        hdr = bytes([len(members)])
        for ci in members:
            hdr += bytes([ci + 1, ((0 if ci == 0 else 1) << 4) | (0 if ci == 0 else 1)])
        hdr += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, hdr) + body

    all_comps = list(range(ncomps))
    out += sos(all_comps, 0, 0, 0, 1, dc_first_scan(1))
    for ci in all_comps:
        out += sos([ci], 1, 5, 0, 1, ac_first_scan(ci, 1, 5, 1))
        out += sos([ci], 6, 63, 0, 1, ac_first_scan(ci, 6, 63, 1))
    out += sos(all_comps, 0, 0, 1, 0, dc_refine_scan(0))
    for ci in all_comps:
        out += sos([ci], 1, 5, 1, 0, ac_refine_scan(ci, 1, 5, 0))
        out += sos([ci], 6, 63, 1, 0, ac_refine_scan(ci, 6, 63, 0))
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------- pluggable backend
# The pure-numpy decoder above is a measured ~0.7-1.5 MP/s-per-core
# ceiling — fine for gate queries, 10-30x below a native lib for a
# 100 TB multimodal pass. decode_jpeg_auto is the escape hatch: it
# dispatches to Pillow (libjpeg/libjpeg-turbo) when that wheel is
# importable on the worker, else to the self-compiled C entropy kernel
# (_jpeg_cext — baseline scan loop in C, everything else shared with the
# pure decoder) when a C toolchain exists, and falls back to the pure
# decoder otherwise — all inside the SAME mapInPandas plumbing (schema,
# null-row contract, bomb cap unchanged). Select explicitly with the
# MP_SPARK_JPEG_BACKEND env var ("pure" | "pillow" | "cext") — on a
# cluster, propagate it with spark.executorEnv.MP_SPARK_JPEG_BACKEND;
# unset means auto-detect per worker process (cached).

_BACKEND_CACHE: str | None = None


def jpeg_backend(override: str | None = None) -> str:
    """Resolve the active JPEG decode backend: explicit ``override`` >
    ``MP_SPARK_JPEG_BACKEND`` env > auto-detect ("pillow" iff PIL
    imports, else "cext" iff the self-compiled C kernel loads, else
    "pure"). Detection is cached per process."""
    global _BACKEND_CACHE
    import os

    choice = override or os.environ.get("MP_SPARK_JPEG_BACKEND")
    if choice:
        if choice not in ("pure", "pillow", "cext"):
            raise ValueError(f"unknown JPEG backend {choice!r}")
        return choice
    if _BACKEND_CACHE is None:
        try:
            import PIL.Image  # noqa: F401

            _BACKEND_CACHE = "pillow"
        except ImportError:
            from . import _jpeg_cext

            _BACKEND_CACHE = "cext" if _jpeg_cext.load() is not None else "pure"
    return _BACKEND_CACHE


def decode_jpeg_pillow(payload: bytes, max_pixels: int = 64 << 20) -> np.ndarray:
    """Native-lib decode via Pillow, normalized to the pure decoder's
    contract: grayscale -> HxW uint8, everything else -> HxWx3 RGB uint8;
    the bomb cap is enforced from the header BEFORE pixel decode (Image
    .open is lazy until load())."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    w, h = img.size
    ncomp = max(1, len(img.getbands()))
    if h * w * ncomp > max_pixels:
        raise ValueError(
            f"image {w}x{h}x{ncomp} exceeds max_pixels={max_pixels}"
        )
    if img.mode != "L":
        img = img.convert("RGB")
    return np.asarray(img)


def decode_jpeg_auto(
    payload: bytes, max_pixels: int = 64 << 20, backend: str | None = None
) -> np.ndarray:
    """Backend-dispatched JPEG decode (see jpeg_backend). Pixel caveat:
    T.81 does not mandate a bit-exact IDCT, so the two backends may
    differ by ±1-2 LSB on general images (tests pin the tolerance);
    DC-only blocks — the deterministic oracle fixtures — reconstruct to
    exact flat values under BOTH, so oracle results are
    backend-independent."""
    resolved = jpeg_backend(backend)
    if resolved == "pillow":
        return decode_jpeg_pillow(payload, max_pixels)
    if resolved == "cext":
        return decode_jpeg_cext(payload, max_pixels)
    return decode_jpeg(payload, max_pixels)


def decode_jpeg_cext(payload: bytes, max_pixels: int = 64 << 20) -> np.ndarray:
    """The pure decoder with the baseline entropy loop in the
    self-compiled C kernel (_jpeg_cext) — marker parse, table build,
    dequant/IDCT/color all shared, so coefficients and pixels are
    IDENTICAL to decode_jpeg (pinned by tests/test_jpeg_cext.py);
    progressive scans transparently keep the Python path. Raises
    RuntimeError when the kernel is unavailable — auto-detection
    (jpeg_backend) only selects "cext" when it loads."""
    from . import _jpeg_cext

    if _jpeg_cext.load() is None:
        raise RuntimeError(
            "JPEG C kernel unavailable (no C toolchain, compile failure, "
            "or MP_SPARK_JPEG_CEXT=0)"
        )
    return decode_jpeg(payload, max_pixels, _cext=True)
