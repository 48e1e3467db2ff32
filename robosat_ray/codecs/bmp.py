"""Pure-numpy BMP codec (8-bit paletted grayscale, uncompressed).

A real bytes->pixels decode path for the multimodal pipeline in a
container without PIL/cv2: the synth side writes genuine BMP files
(BITMAPFILEHEADER + BITMAPINFOHEADER + 256-entry grayscale palette +
bottom-up 4-byte-padded rows, the standard Windows 3.x layout) and the
decoder parses them back. Anything outside 8-bpp uncompressed raises
NotImplementedError — that is the seam where a full codec (PIL,
libjpeg) drops in at deployment.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res, res, data offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # 40-byte BITMAPINFOHEADER
_PALETTE = np.zeros((256, 4), dtype=np.uint8)
_PALETTE[:, 0] = _PALETTE[:, 1] = _PALETTE[:, 2] = np.arange(256, dtype=np.uint8)
_PALETTE_BYTES = _PALETTE.tobytes()


def encode_bmp_gray8(img: np.ndarray) -> bytes:
    """(h, w) uint8 -> BMP bytes (8-bpp paletted grayscale,
    bottom-up rows padded to 4 bytes)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = img[::-1]  # BMP stores bottom row first
    offset = _FILE_HDR.size + _INFO_HDR.size + len(_PALETTE_BYTES)
    data = rows.tobytes()
    header = _FILE_HDR.pack(b"BM", offset + len(data), 0, 0, offset)
    info = _INFO_HDR.pack(40, w, h, 1, 8, 0, len(data), 2835, 2835, 256, 0)
    return header + info + _PALETTE_BYTES + data


def decode_bmp_gray8(payload: bytes) -> np.ndarray:
    """BMP bytes -> (h, w) uint8 grayscale. Supports the encoder's
    format family: 8-bpp uncompressed with a palette, bottom-up or
    top-down rows. Pixel value = the palette's blue channel (equal to
    R and G for grayscale palettes)."""
    if payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload (real codec seam)")
    _, _, _, _, offset = _FILE_HDR.unpack_from(payload, 0)
    (
        info_size, w, h, planes, bpp, compression,
        _img_size, _xppm, _yppm, colors_used, _important,
    ) = _INFO_HDR.unpack_from(payload, _FILE_HDR.size)
    if info_size < 40 or planes != 1:
        raise NotImplementedError("unsupported BMP header (real codec seam)")
    if bpp != 8 or compression != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} needs a full codec"
        )
    n_colors = colors_used or 256
    pal_off = _FILE_HDR.size + info_size
    pal = np.frombuffer(payload, dtype=np.uint8, count=n_colors * 4, offset=pal_off)
    gray_lut = pal.reshape(n_colors, 4)[:, 0]  # blue channel
    top_down = h < 0
    h = abs(h)
    stride = (w + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=offset
    ).reshape(h, stride)[:, :w]
    idx = rows if top_down else rows[::-1]
    return gray_lut[idx]
