"""SemDeDup: planted-variant recall, keep rule, tile-blocking
exactness, partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from robosat_ray.stages import semdedup as sd


def _emb(n, d=64, seed=2):
    rng = np.random.default_rng(seed)
    E = rng.normal(size=(n, d))
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(E), pa.list_(pa.float64())),
            }
        )
    )


def _with_variants(ds):
    from robosat_ray.stages.ann import with_emb_variants_batch

    return ds.map_batches(with_emb_variants_batch, batch_format="pyarrow")


def test_scaled_variants_are_semantic_dups(ray_session):
    n = 350
    out = sd.semdedup(_with_variants(_emb(n))).to_pandas().set_index("vec_id")
    planted = [i for i in range(n) if i % 7 == 0]
    found = 0
    for i in planted:
        if out.loc[i, "cluster"] != out.loc[-(i + 1), "cluster"]:
            # cluster-boundary recall loss — inherent to SemDeDup (the
            # scaled variant can cross an L2 centroid boundary); the
            # within-cluster scan never compares such a pair
            continue
        found += 1
        # cosine(v, c*v) == 1 >= tau: co-clustered pair found both ways
        assert out.loc[i, "n_dups"] >= 1
        assert out.loc[-(i + 1), "n_dups"] >= 1
        # variant id is negative -> smaller -> the base is the drop
        assert out.loc[i, "keep"] == 0
        assert out.loc[-(i + 1), "keep"] == 1
    # the overwhelming majority of variants co-cluster with their base
    assert found >= 0.8 * len(planted)
    # random gaussians in d=64 almost never reach cos >= 0.8: nothing
    # outside the planted pairs is dropped
    others = out.loc[[i for i in range(n) if i % 7 != 0]]
    assert (others["keep"] == 1).all()


def test_tile_blocking_is_exact(ray_session, monkeypatch):
    """Forcing 7-row tiles must not change anything (the blocked
    matmul is a memory bound, not an approximation)."""
    ds = _with_variants(_emb(200, seed=9))
    a = sd.semdedup(ds).to_pandas().sort_values("vec_id").reset_index(drop=True)
    monkeypatch.setattr(sd, "_TILE", 7)
    b = sd.semdedup(ds).to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_partition_invariance(ray_session):
    cols = ["vec_id", "cluster", "n_dups", "keep"]

    def run(ds):
        df = sd.semdedup(ds).to_pandas()
        return df[cols].sort_values("vec_id").reset_index(drop=True)

    a = run(_with_variants(_emb(300, seed=4)))
    b = run(_with_variants(_emb(300, seed=4)).repartition(11))
    pd.testing.assert_frame_equal(a, b)


def test_auto_k_bounds_cluster_size(ray_session, monkeypatch):
    """Default k scales with the corpus (k = ceil(n / SEM_TARGET_CLUSTER)):
    4x the vectors -> ~4x the clusters, mean cluster size flat — the
    in-cluster quadratic is bounded by construction, not by caller
    discipline (round-4 VERDICT item)."""
    monkeypatch.setattr(sd, "SEM_TARGET_CLUSTER", 500)
    sizes = {}
    for n in (5000, 20000):
        out = sd.semdedup(_emb(n, seed=11)).to_pandas()
        assert len(out) == n
        k = max(10, -(-n // 500))
        assert out["cluster"].max() < k
        sizes[n] = out.groupby("cluster").size()
    # 4x data -> >=2x non-empty clusters (k went 10 -> 40), and the
    # mean cluster size did NOT grow with the corpus
    assert len(sizes[20000]) >= 2 * len(sizes[5000])
    assert sizes[20000].mean() <= 1.3 * sizes[5000].mean()
