"""SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication") — the cluster-then-
compare semantic dedup used on LAION/web corpora: kmeans-cluster the
embeddings, then inside each cluster drop every vector that has a
semantic duplicate (cosine >= SEM_TAU) with a smaller vec_id. The
clustering bounds the quadratic comparison to cluster-local pairs —
the whole point of the algorithm.

Spec (mirrored bit-for-bit in oracle.SEMDEDUP):
- clusters: the EXISTING integer-Lloyd kmeans (stages/cluster.py,
  k=10, iters=3 — the `kmeans` query's exact assignment)
- coarse unit lattice: qn = floor((v / ||v||) * 1024) per dim (the
  ann.py normalize-then-floor convention at a scale where every
  integer below stays in int64: dot <= 2^26, 25*dot^2 <= 2^57)
- duplicate pair: dot > 0 AND 25*dot^2 >= 16*|a|^2*|b|^2  (tau=0.8,
  tau^2 = 16/25 — exact integer compare, no float cosine)
- output per vec: (vec_id, cluster, n_dups, keep); keep = 1 iff no
  in-cluster duplicate partner has a smaller vec_id

Scale shape: assignment is the broadcast-model kmeans; the pair scan
is ONE cluster co-partition with a BLOCKED in-group matmul (2048-row
tiles, so a hot cluster never materializes its full m x m Gram
matrix). By DEFAULT k now scales with the corpus — k = max(10,
ceil(n / SEM_TARGET_CLUSTER)) — so expected cluster size (and with it
the in-cluster quadratic) is bounded by construction, the way SemDeDup
itself runs ~100k clusters on LAION. The registered `semdedup` query
pins k=10 explicitly to share the `kmeans` query's oracle chain
(oracle.SEMDEDUP unrolls exactly that k).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SEM_SCALE = 1024.0
SEM_TAU_NUM = 16  # tau^2 = 16/25  (tau = 0.8)
SEM_TAU_DEN = 25
_TILE = 2048

# expected cluster size the auto-k targets: the in-cluster quadratic
# is ~(SEM_TARGET_CLUSTER)^2/2 dots per cluster regardless of corpus
# size, so 100x the data means ~100x the clusters, not 100x^2 the work
SEM_TARGET_CLUSTER = 4096


def quantize_unit(E: np.ndarray) -> np.ndarray:
    """float (n, d) -> floor((v/||v||) * 1024) int64 (the ann.py
    normalize-then-floor IEEE chain at coarse scale)."""
    E = np.asarray(E, np.float64)
    norms = np.sqrt((E * E).sum(axis=1, keepdims=True))
    if not np.all(norms > 0):
        raise ValueError("quantize_unit: zero-norm embedding row")
    return np.floor((E / norms) * SEM_SCALE).astype(np.int64)


def _dedup_cluster(group: pd.DataFrame) -> pd.DataFrame:
    ids = group["vec_id"].to_numpy(np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    Q = np.stack(group["qn"].to_numpy()[order]).astype(np.int64)
    n2 = (Q * Q).sum(axis=1)
    m = len(ids)
    n_dups = np.zeros(m, dtype=np.int64)
    min_partner = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
    for i0 in range(0, m, _TILE):
        i1 = min(i0 + _TILE, m)
        G = Q[i0:i1] @ Q.T  # (tile, m) int64; |dot| <= 2^26
        lhs = SEM_TAU_DEN * G * G
        rhs = SEM_TAU_NUM * n2[i0:i1, None] * n2[None, :]
        dup = (G > 0) & (lhs >= rhs)
        dup[np.arange(i0, i1) - i0, np.arange(i0, i1)] = False  # self
        n_dups[i0:i1] = dup.sum(axis=1)
        any_rows = dup.any(axis=1)
        if any_rows.any():
            # smallest partner id per row (ids ascending -> argmax bit)
            first = dup[any_rows].argmax(axis=1)
            min_partner[i0:i1][any_rows] = ids[first]
    keep = (min_partner > ids).astype(np.int64)
    return pd.DataFrame(
        {
            "vec_id": ids,
            "cluster": group["cluster"].to_numpy(np.int64)[order],
            "n_dups": n_dups,
            "keep": keep,
        }
    )


def semdedup(emb_ds, k: int | None = None):
    """-> (vec_id, cluster, n_dups, keep): fit the kmeans model,
    label + coarse-lattice-quantize in ONE pass, then the cluster
    co-partition dedup scan.

    k=None (the default) scales the cluster count with the corpus —
    max(KMEANS_K, ceil(n / SEM_TARGET_CLUSTER)) — so expected cluster
    size stays ~constant and the in-cluster quadratic is bounded by
    construction (round-4 VERDICT "what's wrong" #3). Pass an explicit
    k to pin it (the registered query pins KMEANS_K to match its
    unrolled SQL oracle)."""
    import ray

    from robosat_ray.stages.cluster import (
        KMEANS_ITERS,
        KMEANS_K,
        _assign,
        kmeans_model,
    )

    if k is None:
        n = emb_ds.count()
        k = max(KMEANS_K, -(-n // SEM_TARGET_CLUSTER))
    M = kmeans_model(emb_ds, k, KMEANS_ITERS)
    ref = ray.put(M)

    def label(batch: pa.Table, _ref=ref) -> pa.Table:
        from robosat_ray.stages.ann import _emb_matrix

        cent = ray.get(_ref)
        from robosat_ray.stages.cluster import KMEANS_SCALE

        ids, E = _emb_matrix(batch)  # one float decode serves both
        c, _ = _assign(np.floor(E * KMEANS_SCALE).astype(np.int64), cent)
        qn = quantize_unit(E)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(c),
                "qn": pa.array(list(qn), pa.list_(pa.int64())),
            }
        )

    return (
        emb_ds.map_batches(label, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(_dedup_cluster, batch_format="pandas")
    )
