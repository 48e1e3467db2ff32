"""KMeans spec tests (oracle parity covers the full chain)."""

import numpy as np
import pyarrow as pa
import ray.data

from robosat_ray.stages.cluster import _assign, kmeans_assignments


def _toy_ds(n_blocks: int):
    rng = np.random.default_rng(7)
    E = rng.normal(size=(240, 8)).astype(np.float32) * 0.3
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(240, dtype=np.int64)),
            "embedding": pa.array(list(E), pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(tab).repartition(n_blocks)


def test_partition_invariance(ray_session):
    a = kmeans_assignments(_toy_ds(2), k=4, iters=2).to_pandas()
    b = kmeans_assignments(_toy_ds(11), k=4, iters=2).to_pandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_assign_tie_breaks_to_smallest_cluster():
    Q = np.array([[0, 0]], dtype=np.int64)
    M = np.array([[1, 0], [0, 1], [3, 3]], dtype=np.int64)  # 0 and 1 tie
    c, d2 = _assign(Q, M)
    assert c[0] == 0 and d2[0] == 1


def test_empty_cluster_keeps_centroid(ray_session):
    # 3 identical points, k=2: cluster 1 never wins a point after the
    # first update, so its centroid must carry over unchanged
    tab = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array([[0.1, 0.1]] * 3, pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tab)
    out = kmeans_assignments(ds, k=2, iters=2).to_pandas()
    assert (out["cluster"] == 0).all()
    assert (out["dist2"] == 0).all()
