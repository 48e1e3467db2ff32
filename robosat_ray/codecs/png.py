"""Pure numpy + stdlib-zlib PNG codec (8-bit, non-interlaced).

Closes the reference's real raster-tile I/O seam without PIL: robosat
reads slippy-map tiles with `Image.open` and writes paletted class
masks with `Image.fromarray(mask, mode="P"); out.putpalette(palette)`
(reference robosat/tiles.py:65-100, robosat/tools/masks.py:62-69,
robosat/tools/rasterize.py:126-140). This module implements the PNG
container itself from the public spec (RFC 2083 / W3C PNG):

- encode: color type 0 (gray8), 2 (RGB8), 3 (palette8) — filter 0 on
  every row (deterministic bytes; zlib level fixed), one IDAT, CRC32
  per chunk. Byte-stable across runs/platforms, so payloads can be
  hash-compared in oracle queries.
- decode: bit depth 8, color types 0/2/3, non-interlaced, ALL five
  row filters (None/Sub/Up/Average/Paeth), any IDAT chunking. CRCs
  verified. Everything else (16-bit, interlace, alpha types 4/6)
  raises NotImplementedError — the documented seam where a full codec
  (PIL/libpng) drops in at deployment.

The fast path is vectorized: our own encoder always emits filter 0,
which un-filters as a pure memcpy; Sub/Up rows are vectorized numpy
(lane cumsum / row add); only Average/Paeth rows — never produced by
this encoder — fall back to a per-pixel loop.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_IHDR = struct.Struct(">IIBBBBB")  # width, height, depth, color, comp, filt, interlace

GRAY = 0
RGB = 2
PALETTE = 3
_CHANNELS = {GRAY: 1, RGB: 3, PALETTE: 1}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, palette: np.ndarray | list | None = None) -> bytes:
    """(h, w) uint8 -> gray8 PNG; (h, w, 3) uint8 -> RGB8 PNG;
    (h, w) uint8 + palette ((n, 3) uint8 or flat PIL-style list) ->
    paletted PNG (the reference's mask layout). Filter 0 rows, fixed
    zlib level 6 -> byte-deterministic output."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if palette is not None:
        if img.ndim != 2:
            raise ValueError("paletted PNG needs a 2-d index image")
        pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
        color, channels = PALETTE, 1
    elif img.ndim == 2:
        pal, color, channels = None, GRAY, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        pal, color, channels = None, RGB, 3
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    rows = img.reshape(h, w * channels)
    raw = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 1:] = rows  # filter byte 0 per row
    out = [_MAGIC, _chunk(b"IHDR", _IHDR.pack(w, h, 8, color, 0, 0, 0))]
    if pal is not None:
        out.append(_chunk(b"PLTE", pal.tobytes()))
    out.append(_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """(h, 1 + w*bpp) filtered scanlines -> (h, w*bpp) recon bytes."""
    ftypes = raw[:, 0]
    data = raw[:, 1:].astype(np.int64)
    recon = np.zeros((h, w * bpp), dtype=np.int64)
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        f = ftypes[y]
        line = data[y]
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub — per-lane cumsum mod 256
            lanes = line.reshape(-1, bpp)
            cur = (np.cumsum(lanes, axis=0) & 0xFF).reshape(-1)
        elif f in (3, 4):  # Average / Paeth — sequential in-row
            cur = np.zeros_like(line)
            for i in range(len(line)):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                if f == 3:
                    cur[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                    cur[i] = (line[i] + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {f} (real codec seam)")
        recon[y] = cur
        prev = cur
    return recon.astype(np.uint8)


def decode_png(payload: bytes) -> tuple[np.ndarray, np.ndarray | None]:
    """PNG bytes -> (image, palette). image is (h, w) uint8 for gray
    and palette types (palette returned as (n, 3) uint8 for type 3,
    else None) or (h, w, 3) uint8 for RGB. CRC-checked; 8-bit
    non-interlaced 0/2/3 only (NotImplementedError elsewhere)."""
    if payload[:8] != _MAGIC:
        raise NotImplementedError("not a PNG payload (real codec seam)")
    pos = 8
    ihdr = None
    pal = None
    idat = []
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = _IHDR.unpack(body)
        elif tag == b"PLTE":
            pal = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3).copy()
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or color not in _CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} color={color} interlace={interlace} needs a full codec"
        )
    bpp = _CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    expect = h * (1 + w * bpp)
    if len(raw) != expect:
        raise ValueError(f"PNG scanline payload {len(raw)} != expected {expect}")
    recon = _unfilter(raw.reshape(h, 1 + w * bpp), h, w, bpp)
    if color == RGB:
        return recon.reshape(h, w, 3), None
    if color == PALETTE:
        if pal is None:
            raise ValueError("paletted PNG missing PLTE")
        return recon.reshape(h, w), pal
    return recon.reshape(h, w), None


def decode_png_gray8(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) uint8 single-channel view: gray as-is,
    palette -> index values (the reference reads masks back as class
    indices: np.array(Image.open(path)) on a mode-P image), RGB
    rejected (channel semantics are the caller's call)."""
    img, _pal = decode_png(payload)
    if img.ndim != 2:
        raise NotImplementedError("RGB PNG where single-channel mask expected")
    return img
