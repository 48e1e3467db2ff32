"""M22: joint augmentations — determinism, joint alignment, and
fg-count invariance (rotations/flips preserve mass)."""

import numpy as np
import pyarrow as pa

from robosat_ray.stages.augment import apply_transform, joint_augment, joint_augment_batch


def _masks_batch(n=6, size=8, two_cols=False):
    rng = np.random.RandomState(3)
    rows = {
        "tile_x": pa.array(np.arange(n, dtype=np.int64)),
        "tile_y": pa.array(np.arange(n, dtype=np.int64) * 7),
        "size": pa.array(np.full(n, size, dtype=np.int64)),
        "data": pa.array([rng.randint(0, 2, (size, size)).astype(np.uint8).tobytes() for _ in range(n)], pa.binary()),
    }
    if two_cols:
        rows["image"] = rows["data"]
    return pa.table(rows)


def test_transforms_preserve_mass_and_invert():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    seen = set()
    for t in range(8):
        out = apply_transform(g, t)
        assert out.sum() == g.sum()
        seen.add(out.tobytes())
    assert len(seen) == 8  # all eight transforms distinct


def test_joint_augment_deterministic_and_aligned(ray_session):
    import ray.data

    b = _masks_batch(two_cols=True)
    a1 = joint_augment_batch(b, seed=5, columns=("data", "image"))
    a2 = joint_augment_batch(b, seed=5, columns=("data", "image"))
    assert a1.equals(a2), "same seed must reproduce"
    a3 = joint_augment_batch(b, seed=6, columns=("data", "image"))
    assert not a1.equals(a3), "different seed changes draws"
    # joint: both columns got the SAME transform per row
    assert a1.column("data").to_pylist() == a1.column("image").to_pylist()
    # fg mass preserved per row
    for before, after in zip(b.column("data").to_pylist(), a1.column("data").to_pylist()):
        assert np.frombuffer(before, np.uint8).sum() == np.frombuffer(after, np.uint8).sum()
    # end-to-end through a Dataset
    ds = joint_augment(ray.data.from_arrow(b), seed=5, columns=("data", "image"))
    out = ds.take_all()
    assert len(out) == b.num_rows
    assert all(0 <= r["aug_id"] < 8 for r in out)


def test_partitioning_invariance(ray_session):
    """Per-row hash draws => identical output regardless of block
    layout (a global RNG sequence would fail this)."""
    import ray.data

    b = _masks_batch(n=12)
    one = joint_augment(ray.data.from_arrow(b), seed=9).to_pandas()
    many = joint_augment(ray.data.from_arrow(b).repartition(6), seed=9).to_pandas()
    key = lambda df: df.sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(key(one), key(many))
