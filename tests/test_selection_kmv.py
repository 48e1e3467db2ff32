"""Pins for set_cover (partition-invariant greedy argmax) and
kmv_sketch (mergeable bottom-k)."""

import numpy as np
import pandas as pd


def test_set_cover_partition_invariant(ray_session):
    import pyarrow as pa
    import ray.data

    from robosat_ray.stages.selection import set_cover

    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(60)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 25)))
        for _ in range(80)
    ]
    t = pa.table({"doc_id": pa.array(np.arange(80), pa.int64()),
                  "text": pa.array(texts)})
    a = set_cover(ray.data.from_arrow(t).repartition(1))
    b = set_cover(ray.data.from_arrow(t).repartition(13))
    pd.testing.assert_frame_equal(a, b)
    # greedy gains are non-increasing
    assert (np.diff(a["gain"].to_numpy()) <= 0).all()


def test_kmv_bottom_k_merge_property():
    """bottom-k of a union == bottom-k of the union of bottom-k's."""
    rng = np.random.default_rng(8)
    k = 64
    parts = [np.unique(rng.integers(0, 10**12, 500)) for _ in range(5)]
    full = np.unique(np.concatenate(parts))[:k]
    merged = np.unique(np.concatenate([p[:k] for p in parts]))[:k]
    assert np.array_equal(full, merged)
