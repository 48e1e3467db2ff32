"""Joint train-time augmentations (SURVEY.md M22; reference
robosat/transforms.py:83-132 — JointRandomFlipOrRotate applies ONE
sampled transform to image and label together so they stay aligned).

Engine shape: a stateless map_batches transform with DETERMINISTIC
per-row sampling — the transform is chosen by an integer hash of
(seed, tile_x, tile_y), not a global RNG, so results are reproducible
across runs, partitionings and cluster sizes (a shared RNG sequence
would not be). Image and mask payloads receive the identical
transform (the "joint" contract). Torch-free: masks/images are uint8
grids in binary columns."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from robosat_ray.geo.raster import binary_views

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _draw(seed: int, tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    """Per-row transform id in [0, 8): 4 rotations x 2 horizontal
    flips, from a splitmix-style integer hash."""
    h = (
        (tx.astype(np.uint64) * np.uint64(2654435761))
        ^ (ty.astype(np.uint64) * np.uint64(40503))
        ^ (np.uint64(seed) * _MIX)
    )
    h ^= h >> np.uint64(33)
    h *= _MIX
    h ^= h >> np.uint64(29)
    return (h % np.uint64(8)).astype(np.int64)


def apply_transform(grid: np.ndarray, t: int) -> np.ndarray:
    """Transform 0-7: rot90 by (t % 4), then horizontal flip if
    t >= 4. Deterministic, area-preserving, invertible."""
    out = np.rot90(grid, k=int(t % 4))
    if t >= 4:
        out = np.fliplr(out)
    return np.ascontiguousarray(out)


def joint_augment_batch(batch: pa.Table, seed: int = 0, columns=("data",)) -> pa.Table:
    """Apply the SAME per-row transform to every payload column in
    `columns` (image + label stay aligned)."""
    txs = batch.column("tile_x").to_numpy()
    tys = batch.column("tile_y").to_numpy()
    sizes = batch.column("size").to_numpy()
    ts = _draw(seed, txs, tys)
    out = {name: batch.column(name) for name in batch.column_names}
    for col in columns:
        views = binary_views(batch.column(col))
        new = []
        for v, size, t in zip(views, sizes, ts):
            g = np.frombuffer(v, dtype=np.uint8).reshape(int(size), int(size))
            new.append(apply_transform(g, int(t)).tobytes())
        out[col] = pa.array(new, pa.binary())
    out["aug_id"] = pa.array(ts)
    return pa.table(out)


def joint_augment(masks_ds, seed: int = 0, columns=("data",)):
    return masks_ds.map_batches(
        lambda b: joint_augment_batch(b, seed, columns), batch_format="pyarrow"
    )
