"""Pure numpy + stdlib-zlib PNG codec.

Closes the reference's real raster-tile I/O seam without PIL: robosat
reads slippy-map tiles with `Image.open` and writes paletted class
masks with `Image.fromarray(mask, mode="P"); out.putpalette(palette)`
(reference robosat/tiles.py:65-100, robosat/tools/masks.py:62-69,
robosat/tools/rasterize.py:126-140). This module implements the PNG
container itself from the public spec (RFC 2083 / W3C PNG):

- encode: color types 0 (gray), 2 (RGB), 3 (palette8), 4 (gray+alpha),
  6 (RGBA) at depth 8, and 0/2/4/6 at depth 16 (uint16 input,
  big-endian samples); optional Adam7 interlacing. Filter 0 on every
  row (deterministic bytes; zlib level fixed), one IDAT, CRC32 per
  chunk. Byte-stable across runs/platforms, so payloads can be
  hash-compared in oracle queries (the default 8-bit non-interlaced
  path emits the same bytes as always).
- decode: depths 8 and 16, color types 0/2/3/4/6, non-interlaced AND
  Adam7-interlaced, ALL five row filters (None/Sub/Up/Average/Paeth),
  any IDAT chunking. CRCs verified. Sub-byte depths (1/2/4) raise
  NotImplementedError — the remaining documented seam.

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
GRAY_ALPHA = 4
RGBA = 6
_CHANNELS = {GRAY: 1, RGB: 3, PALETTE: 1, GRAY_ALPHA: 2, RGBA: 4}

# Adam7 passes: (x0, y0, dx, dy) per the PNG spec
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(
    img: np.ndarray,
    palette: np.ndarray | list | None = None,
    interlace: bool = False,
) -> bytes:
    """(h, w) -> gray PNG; (h, w, 2) -> gray+alpha; (h, w, 3) -> RGB;
    (h, w, 4) -> RGBA; (h, w) uint8 + palette ((n, 3) uint8 or flat
    PIL-style list) -> paletted PNG (the reference's mask layout).
    uint8 input writes depth 8, uint16 writes depth 16 (big-endian
    samples). interlace=True writes Adam7 passes. Filter 0 rows, fixed
    zlib level 6 -> byte-deterministic output (the default 8-bit
    non-interlaced path is byte-identical to the original encoder)."""
    img = np.ascontiguousarray(img)
    if img.dtype == np.uint16:
        depth = 16
    elif img.dtype == np.uint8:
        depth = 8
    else:
        raise ValueError(f"unsupported PNG sample dtype {img.dtype}")
    if palette is not None:
        if img.ndim != 2 or depth != 8:
            raise ValueError("paletted PNG needs a 2-d uint8 index image")
        pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
        color, channels = PALETTE, 1
    elif img.ndim == 2:
        pal, color, channels = None, GRAY, 1
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        pal, channels = None, img.shape[2]
        color = {2: GRAY_ALPHA, 3: RGB, 4: RGBA}[channels]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    # sample bytes: big-endian per spec for depth 16
    as_bytes = (
        img.astype(">u2").view(np.uint8).reshape(h, w, channels * 2)
        if depth == 16
        else img.reshape(h, w, channels)
    )
    bpp = channels * (depth // 8)

    def scanlines(block: np.ndarray) -> bytes:
        bh, bw = block.shape[:2]
        raw = np.zeros((bh, 1 + bw * bpp), dtype=np.uint8)
        raw[:, 1:] = block.reshape(bh, bw * bpp)  # filter byte 0 per row
        return raw.tobytes()

    if interlace:
        payload = b"".join(
            scanlines(as_bytes[y0::dy, x0::dx])
            for x0, y0, dx, dy in _ADAM7
            if as_bytes[y0::dy, x0::dx].size
        )
    else:
        payload = scanlines(as_bytes)
    out = [
        _MAGIC,
        _chunk(b"IHDR", _IHDR.pack(w, h, depth, color, 0, 0, 1 if interlace else 0)),
    ]
    if pal is not None:
        out.append(_chunk(b"PLTE", pal.tobytes()))
    out.append(_chunk(b"IDAT", zlib.compress(payload, 6)))
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
    """PNG bytes -> (image, palette). Gray/palette -> (h, w); multi-
    channel -> (h, w, ch); dtype uint8 for depth 8, uint16 for depth
    16. palette returned as (n, 3) uint8 for type 3, else None.
    CRC-checked; depths 8/16, color types 0/2/3/4/6, plain or Adam7
    interlaced. Sub-byte depths raise NotImplementedError (seam)."""
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
    if (
        depth not in (8, 16)
        or comp != 0
        or filt != 0
        or interlace not in (0, 1)
        or color not in _CHANNELS
        or (color == PALETTE and depth != 8)
    ):
        raise NotImplementedError(
            f"PNG depth={depth} color={color} interlace={interlace} needs a full codec"
        )
    ch = _CHANNELS[color]
    bpp = ch * (depth // 8)
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if interlace == 0:
        expect = h * (1 + w * bpp)
        if len(raw) != expect:
            raise ValueError(f"PNG scanline payload {len(raw)} != expected {expect}")
        recon = _unfilter(raw.reshape(h, 1 + w * bpp), h, w, bpp).reshape(h, w, bpp)
    else:
        # Adam7: each pass is an independently filtered sub-image
        recon = np.zeros((h, w, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = len(range(x0, w, dx))
            ph = len(range(y0, h, dy))
            if pw == 0 or ph == 0:
                continue
            sz = ph * (1 + pw * bpp)
            sub = _unfilter(raw[off : off + sz].reshape(ph, 1 + pw * bpp), ph, pw, bpp)
            recon[y0::dy, x0::dx, :] = sub.reshape(ph, pw, bpp)
            off += sz
        if off != len(raw):
            raise ValueError("PNG interlaced payload size mismatch")
    if depth == 16:
        img = (
            (recon.reshape(h, w, ch, 2)[..., 0].astype(np.uint16) << 8)
            | recon.reshape(h, w, ch, 2)[..., 1]
        )
    else:
        img = recon.reshape(h, w, ch)
    if color == PALETTE:
        if pal is None:
            raise ValueError("paletted PNG missing PLTE")
        return img.reshape(h, w), pal
    if ch == 1:
        return img.reshape(h, w), None
    return img, None


def decode_png_gray8(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) uint8 single-channel view: gray as-is,
    palette -> index values (the reference reads masks back as class
    indices: np.array(Image.open(path)) on a mode-P image), RGB
    rejected (channel semantics are the caller's call)."""
    img, _pal = decode_png(payload)
    if img.ndim != 2 or img.dtype != np.uint8:
        raise NotImplementedError(
            "multi-channel or 16-bit PNG where an 8-bit single-channel "
            "mask was expected"
        )
    return img
