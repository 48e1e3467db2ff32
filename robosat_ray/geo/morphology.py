"""Binary morphology (erosion/dilation/open/close) with elliptic
(disk) structuring elements, from scratch in numpy.

Reference semantics: cv2.morphologyEx MORPH_OPEN / MORPH_CLOSE with
cv2.getStructuringElement(MORPH_ELLIPSE, (eps, eps)) at
robosat/features/core.py:65-92 (denoise = open, grow = close), default
eps=20 px (robosat/features/parking.py:12-13).
"""

from __future__ import annotations

import numpy as np


def disk_kernel(size: int) -> np.ndarray:
    """Elliptic structuring element, matching cv2.getStructuringElement
    (MORPH_ELLIPSE, (size, size)): boolean (size, size) disk."""
    r = size / 2.0
    c = (size - 1) / 2.0
    y, x = np.mgrid[0:size, 0:size]
    # cv2 uses an inscribed ellipse; the standard formulation keeps
    # cells whose center distance from the kernel center is <= radius
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    dy = (y - c)
    dx = (x - c)
    return (dx * dx + dy * dy) * inv_r2 <= 1.0 + 1e-9


def _dilate_bool(img: np.ndarray, kern: np.ndarray) -> np.ndarray:
    """Binary dilation via shifted ORs (one shift per kernel cell —
    vectorized over the image; kernels are small, images 256²/512²)."""
    kh, kw = kern.shape
    cy, cx = (kh - 1) // 2, (kw - 1) // 2
    out = np.zeros_like(img, dtype=bool)
    H, W = img.shape
    for ky, kx in np.argwhere(kern):
        dy, dx = int(ky) - cy, int(kx) - cx
        ys0, ys1 = max(0, dy), min(H, H + dy)
        xs0, xs1 = max(0, dx), min(W, W + dx)
        yd0, yd1 = max(0, -dy), min(H, H - dy)
        xd0, xd1 = max(0, -dx), min(W, W - dx)
        out[yd0:yd1, xd0:xd1] |= img[ys0:ys1, xs0:xs1]
    return out


def dilate(img: np.ndarray, size: int) -> np.ndarray:
    return _dilate_bool(img.astype(bool), disk_kernel(size)).astype(img.dtype)


def erode(img: np.ndarray, size: int) -> np.ndarray:
    # erosion = complement of dilation of the complement (with the
    # reflected kernel; the disk is symmetric)
    inv = ~img.astype(bool)
    return (~_dilate_bool(inv, disk_kernel(size))).astype(img.dtype)


def opening(img: np.ndarray, size: int) -> np.ndarray:
    """Morphological open = erode then dilate (reference `denoise`,
    features/core.py:65-77): removes speckles smaller than the kernel."""
    return dilate(erode(img, size), size)


def closing(img: np.ndarray, size: int) -> np.ndarray:
    """Morphological close = dilate then erode (reference `grow`,
    features/core.py:80-92): fills holes smaller than the kernel."""
    return erode(dilate(img, size), size)
