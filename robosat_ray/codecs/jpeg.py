"""From-scratch baseline JPEG (ITU-T T.81) codec in numpy.

Closes the last reference I/O seam: robosat's tile loader accepts
webp/jpg imagery (reference robosat/tiles.py:65-100 routes any raster
extension through PIL). No PIL/cv2 exists in this environment, so the
PUBLIC baseline-sequential-DCT wire format is implemented from the
spec itself:

  file  := SOI [APPn/COM]* DQT+ SOF0 DHT+ [DRI] SOS entropy EOI
  DQT   := Pq(4b)=0 Tq(4b), 64 bytes in zigzag order
  SOF0  := P=8, Y, X, Nf x (Ci, Hi(4b) Vi(4b), Tqi)
  DHT   := Tc(4b) Th(4b), BITS[1..16], HUFFVAL  (canonical codes, F.2)
  SOS   := Ns x (Csj, Tdj(4b) Taj(4b)), Ss=0 Se=63 Ah=Al=0
  scan  := interleaved MCUs; per component Vi x Hi blocks per MCU;
           DC = Huffman(category) + magnitude bits (ones' complement
           for negatives, F.12 EXTEND), AC = (run,size) symbols with
           EOB/ZRL; 0xFF bytes stuffed as FF 00; RSTn every Ri MCUs
           resets the DC predictors on a byte boundary.

Decode pixel math (vectorized over all blocks): dequantize ->
de-zigzag -> 2D IDCT as M.T @ S @ M with the orthonormal DCT-II
matrix -> +128, round, clip; chroma planes nearest-upsampled by
(Hmax/Hi, Vmax/Vi); YCbCr -> RGB per JFIF (BT.601 full range).

Supported: 8-bit baseline sequential, any component layout whose
sampling factors divide the max (gray, 4:4:4, 4:2:2, 4:2:0),
restart intervals, multiple DQT/DHT segments. Progressive (SOF2),
extended sequential (SOF1), arithmetic coding (SOF9+/DAC), 12-bit
precision and hierarchical modes raise NotImplementedError — the
documented seam where a full codec stack drops in.

Losslessness note for oracle gating: JPEG is lossy in general, but an
image that is CONSTANT on each 8x8 block has only DC energy; with an
all-ones quantization table the DC coefficient 8*(v-128) is an exact
integer, every AC is exactly 0, and decode reproduces the input
bit-for-bit. The jpeg_features query synthesizes exactly that blocky
subspace so its DuckDB oracle can replay the decoded pixels, while
the entropy/marker layer being traversed is the real wire format
(arbitrary-content round trips are pinned separately in tests with
the +/-4 quant=1 error bound).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag: ZIGZAG[i] = raster index of the i-th coefficient in scan order
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)  # UNZIGZAG[raster] = zigzag position

# Annex K.1 luminance quantization table (raster order), for tests and
# the lossy encode path; the oracle chain uses all-ones.
STD_LUMA_QUANT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# Annex K.3: default Huffman tables (BITS counts for lengths 1..16,
# then HUFFVAL symbol lists).
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


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II: S = M @ s @ M.T, s = M.T @ S @ M."""
    x = np.arange(8)
    M = np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16.0) / 2.0
    M[0] *= 1.0 / np.sqrt(2.0)
    return M


_DCT_M = _dct_matrix()


def fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(N, 8, 8) level-shifted samples -> (N, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M, optimize=True)


def idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(N, 8, 8) coefficients -> (N, 8, 8) samples (pre level shift)."""
    return np.einsum("ux,nuv,vy->nxy", _DCT_M, coeffs, _DCT_M, optimize=True)


# --------------------------------------------------------------------------
# Huffman tables


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """BITS/HUFFVAL -> {symbol: (code, length)} (canonical, C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical Huffman decode per F.16: MINCODE/MAXCODE/VALPTR."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = reader.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("invalid Huffman code in entropy stream")
            code = (code << 1) | reader.read_bit()
        return self.vals[self.valptr[length] + code - self.mincode[length]]


class _BitReader:
    """MSB-first bit reader over UNSTUFFED entropy bytes."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                # spec: pad with 1-bits at the tail of the scan
                return 1
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, size: int) -> int:
    """F.12: magnitude bits -> signed value (ones' complement)."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.buf = (self.buf << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.buf >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.buf &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --------------------------------------------------------------------------
# encoder


def _encode_component_blocks(
    coeffs_zz: np.ndarray, writer: _BitWriter, dc_codes, ac_codes, dc_pred: int
) -> int:
    """Entropy-encode one sequence of (N, 64) zigzag-ordered quantized
    coefficient rows; returns the updated DC predictor."""
    for row in coeffs_zz:
        diff = int(row[0]) - dc_pred
        dc_pred = int(row[0])
        size = _category(diff)
        code, length = dc_codes[size]
        writer.write(code, length)
        if size:
            bits = diff if diff > 0 else diff + (1 << size) - 1
            writer.write(bits, size)
        nz = np.nonzero(row[1:])[0]
        prev = 0
        for idx in nz:
            k = int(idx) + 1
            run = k - prev - 1
            prev = k
            while run >= 16:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            v = int(row[k])
            size = _category(v)
            code, length = ac_codes[(run << 4) | size]
            writer.write(code, length)
            bits = v if v > 0 else v + (1 << size) - 1
            writer.write(bits, size)
        if prev != 63:
            code, length = ac_codes[0x00]  # EOB
            writer.write(code, length)
    return dc_pred


def _plane_to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h, w) -> (N, 8, 8) float blocks (edge-replicated to 8-mults),
    plus the block grid dims."""
    h, w = plane.shape
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    p = np.pad(plane.astype(np.float64), ((0, H - h), (0, W - w)), mode="edge")
    nby, nbx = H // 8, W // 8
    blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, nby, nbx


def _quantize_zz(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """FDCT + quantize + zigzag: (N, 8, 8) samples -> (N, 64) int32."""
    S = fdct_blocks(blocks - 128.0)
    q = np.round(S.reshape(-1, 64) / qtab[None, :].astype(np.float64))
    return q.astype(np.int32)[:, ZIGZAG]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg_gray(
    img: np.ndarray, qtab: np.ndarray | None = None, restart_interval: int = 0
) -> bytes:
    """(h, w) uint8 -> baseline JFIF grayscale bytes. qtab: 64 ints in
    RASTER order (default all-ones: lossless for 8x8-blockwise-constant
    images, <=4-level error otherwise)."""
    img = np.asarray(img)
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg_gray expects (h, w) uint8")
    qtab = np.ones(64, np.int64) if qtab is None else np.asarray(qtab, np.int64)
    h, w = img.shape
    blocks, nby, nbx = _plane_to_blocks(img)
    zz = _quantize_zz(blocks, qtab)

    dc_codes = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0x00]) + bytes(int(qtab[ZIGZAG[i]]) for i in range(64)))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(
        0xFFC4,
        bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
        + bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS),
    )
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))

    if restart_interval:
        n = len(zz)
        rst = 0
        for s in range(0, n, restart_interval):
            writer = _BitWriter()
            _encode_component_blocks(zz[s : s + restart_interval], writer, dc_codes, ac_codes, 0)
            writer.flush()
            out += writer.out
            if s + restart_interval < n:
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
    else:
        writer = _BitWriter()
        _encode_component_blocks(zz, writer, dc_codes, ac_codes, 0)
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def encode_jpeg_color(
    rgb: np.ndarray, qtab: np.ndarray | None = None, subsample: bool = False
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF YCbCr bytes; subsample=True
    writes 4:2:0 (2x2 box-averaged chroma), else 4:4:4."""
    rgb = np.asarray(rgb)
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_jpeg_color expects (h, w, 3) uint8")
    qtab = np.ones(64, np.int64) if qtab is None else np.asarray(qtab, np.int64)
    h, w = rgb.shape[:2]
    ycc = _rgb_to_ycbcr(rgb)
    planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    if subsample:
        if h % 2 or w % 2:
            raise NotImplementedError("4:2:0 encode needs even dimensions")
        for i in (1, 2):
            p = planes[i]
            planes[i] = np.round(
                (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            )
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    comp_zz = []
    comp_grids = []
    for ci, (p, (hi, vi)) in enumerate(zip(planes, samp)):
        # pad the plane so its block grid covers mcu grid exactly
        ph = mcuy * vi * 8
        pw = mcux * hi * 8
        pp = np.pad(
            p.astype(np.float64),
            ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
            mode="edge",
        )
        blocks = pp.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        comp_zz.append(_quantize_zz(blocks, qtab))
        comp_grids.append((ph // 8, pw // 8))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0x00]) + bytes(int(qtab[ZIGZAG[i]]) for i in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    out += _seg(0xFFC0, sof)
    out += _seg(
        0xFFC4,
        bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
        + bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
        + bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS)
        + bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS),
    )
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    writer = _BitWriter()
    preds = [0, 0, 0]
    codes = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hi, vi) in enumerate(samp):
                _, nbx = comp_grids[ci]
                for v in range(vi):
                    for hh in range(hi):
                        bi = (my * vi + v) * nbx + (mx * hi + hh)
                        preds[ci] = _encode_component_blocks(
                            comp_zz[ci][bi : bi + 1], writer, *codes[ci], preds[ci]
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# decoder


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Scan data from `start` -> (entropy segments split on RSTn, end
    offset of the terminating marker). Stuffed FF00 is unstuffed."""
    segs = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("truncated entropy stream")
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w) uint8 for 1 component, (h, w, 3)
    uint8 RGB for 3 components."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload (real codec seam)")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    sof = None
    restart = 0
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("marker expected in JPEG header stream")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/extended/arithmetic JPEG modes are a real "
                "codec seam (baseline sequential SOF0 only)"
            )
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables (seam)")
                zz = np.frombuffer(body[j + 1 : j + 65], np.uint8).astype(np.int64)
                raster = np.zeros(64, np.int64)
                raster[ZIGZAG] = zz  # stored in zigzag order
                qtabs[tq] = raster
                j += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(body[j + 17 : j + 17 + cnt])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                j += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("12-bit precision (seam)")
            comps = []
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            sof = (h, w, comps)
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scomp = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                scomp.append((cs, tdta >> 4, tdta & 0xF))
            segs, end = _split_entropy(payload, i + 2 + seglen)
            return _decode_scan(sof, scomp, qtabs, huff, segs, restart)
        i += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(sof, scomp, qtabs, huff, segs, restart) -> np.ndarray:
    h, w, comps = sof
    byid = {c["id"]: c for c in comps}
    order = [byid[cs] for cs, _, _ in scomp]
    tables = [(huff[(0, td)], huff[(1, ta)]) for _, td, ta in scomp]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(hmax % c["h"] or vmax % c["v"] for c in comps):
        raise NotImplementedError("non-dividing sampling factors (seam)")
    if len(order) == 1:
        # non-interleaved single-component scan: MCU = one block
        c = order[0]
        nbx = (w * c["h"] + 8 * hmax - 1) // (8 * hmax)
        nby = (h * c["v"] + 8 * vmax - 1) // (8 * vmax)
        grids = {c["id"]: (nby, nbx)}
        mcu_layout = [(c["id"], 0, 1, 1, nbx)]
        n_mcu = nbx * nby
        mcux = nbx
    else:
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        n_mcu = mcux * mcuy
        grids = {c["id"]: (mcuy * c["v"], mcux * c["h"]) for c in comps}
        mcu_layout = None  # generic path below

    coeff = {
        c["id"]: np.zeros((grids[c["id"]][0] * grids[c["id"]][1], 64), np.int32)
        for c in order
    }

    mcu_i = 0
    for seg in segs:
        reader = _BitReader(seg)
        preds = {c["id"]: 0 for c in order}
        limit = min(n_mcu, mcu_i + restart) if restart else n_mcu
        while mcu_i < limit:
            if len(order) == 1:
                c = order[0]
                dc_t, ac_t = tables[0]
                _decode_block(reader, dc_t, ac_t, coeff[c["id"]][mcu_i], preds, c["id"])
            else:
                my, mx = divmod(mcu_i, mcux)
                for ci, c in enumerate(order):
                    dc_t, ac_t = tables[ci]
                    nbx_c = grids[c["id"]][1]
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            bi = (my * c["v"] + v) * nbx_c + (mx * c["h"] + hh)
                            _decode_block(reader, dc_t, ac_t, coeff[c["id"]][bi], preds, c["id"])
            mcu_i += 1
        if mcu_i >= n_mcu:
            break

    if mcu_i < n_mcu:
        raise ValueError("entropy stream ended before all MCUs decoded")

    # dequantize + IDCT per component (vectorized), upsample, stack
    planes = []
    for c in order:
        zz = coeff[c["id"]].astype(np.float64) * qtabs[c["tq"]][ZIGZAG][None, :]
        raster = np.zeros_like(zz)
        raster[:, ZIGZAG] = zz
        blocks = idct_blocks(raster.reshape(-1, 8, 8)) + 128.0
        nby, nbx = grids[c["id"]]
        plane = (
            blocks.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
        plane = np.clip(np.round(plane), 0, 255).astype(np.uint8)
        # nearest-upsample to full resolution, crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0]
    if len(planes) == 3:
        y = planes[0].astype(np.float64)
        cb = planes[1].astype(np.float64) - 128.0
        cr = planes[2].astype(np.float64) - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136286 * cb - 0.714136286 * cr
        b = y + 1.772 * cb
        return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    raise NotImplementedError(f"{len(planes)}-component JPEG (seam)")


def _decode_block(reader, dc_t, ac_t, out_row, preds, cid):
    size = dc_t.decode(reader)
    diff = _extend(reader.receive(size), size)
    preds[cid] += diff
    out_row[0] = preds[cid]
    k = 1
    while k < 64:
        sym = ac_t.decode(reader)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        out_row[k] = _extend(reader.receive(size), size)
        k += 1


def decode_jpeg_gray8(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w) uint8; multi-component payloads raise
    at the seam (the media pipeline carries gray8 tensors)."""
    out = decode_jpeg(payload)
    if out.ndim != 2:
        raise NotImplementedError("color JPEG in a gray8 pipeline (seam)")
    return out
