"""Class-mask color palettes + paletted-PNG mask I/O.

Reference semantics: robosat/colors.py make_palette builds a flat
PIL palette from named Mapbox design colors, and mask writers save
`Image.fromarray(mask, mode="P")` with that palette
(robosat/tools/masks.py:62-69, tools/rasterize.py:126-140,
tools/predict.py mask output). Here the same public color table
feeds codecs/png.encode_png(color type 3) directly — masks round-trip
as class indices with the colors carried in PLTE.
"""

from __future__ import annotations

import numpy as np

from robosat_ray.codecs.png import decode_png, encode_png

# Mapbox design-system colors (public: https://www.mapbox.com/base/styling/color/)
COLORS: dict[str, tuple[int, int, int]] = {
    "dark": (0x40, 0x40, 0x40),
    "gray": (0xEE, 0xEE, 0xEE),
    "light": (0xF8, 0xF8, 0xF8),
    "white": (0xFF, 0xFF, 0xFF),
    "cyan": (0x3B, 0xB2, 0xD0),
    "blue": (0x38, 0x87, 0xBE),
    "bluedark": (0x22, 0x3B, 0x53),
    "denim": (0x50, 0x66, 0x7F),
    "navy": (0x28, 0x35, 0x3D),
    "navydark": (0x22, 0x2B, 0x30),
    "purple": (0x8A, 0x8A, 0xCB),
    "teal": (0x41, 0xAF, 0xA5),
    "green": (0x56, 0xB8, 0x81),
    "yellow": (0xF1, 0xF0, 0x75),
    "mustard": (0xFB, 0xB0, 0x3B),
    "orange": (0xF9, 0x88, 0x6C),
    "red": (0xE5, 0x5E, 0x5E),
    "pink": (0xED, 0x64, 0x98),
}


def make_palette(*names: str) -> np.ndarray:
    """Color names -> (n, 3) uint8 palette, one entry per class index
    (reference robosat/colors.py:45-53 returns the same values as a
    flat PIL list)."""
    return np.array([COLORS[n] for n in names], dtype=np.uint8)


def encode_mask_png(mask: np.ndarray, colors=("denim", "orange")) -> bytes:
    """(h, w) uint8 class-index mask -> paletted PNG bytes, the
    reference's on-disk mask layout (background class first)."""
    return encode_png(np.asarray(mask, np.uint8), palette=make_palette(*colors))


def decode_mask_png(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Paletted-PNG mask bytes -> ((h, w) uint8 class indices,
    (n, 3) palette). The reference reads masks back the same way:
    np.array(Image.open(path)) on a mode-P file yields the indices."""
    img, pal = decode_png(payload)
    if pal is None:
        raise ValueError("mask PNG is not paletted")
    return img, pal
