"""Distributed KMeans over the embedding column — the iterative
broadcast-model pattern: tiny model state (k x d int64 centroids)
broadcast each round via ray.put, one streaming assignment +
partial-sum pass per Lloyd iteration, driver-side merge of
k x blocks partial rows. The whole chain is INTEGER-exact so it has a
bit-for-bit DuckDB twin (oracle.KMEANS, iterations unrolled as CTE
blocks like the ANN_IVF oracle):

  q          = floor(embedding * 1e6) per dim          (int64 lattice)
  init       = quantized vectors of the k smallest vec_ids (j = rank)
  assign     = argmin_j ||q - m_j||^2, ties -> smallest j
  update     = m_j := elementwise floor(sum / count); empty cluster
               keeps its previous centroid
  output     = (vec_id, cluster, dist2) against the final centroids

Overflow bounds: |q| <= ~2^20 (unit-scale embeddings x 1e6), so
dist2 <= d * (2^21)^2 = 2^48 at d=64, and cluster sums stay under
2^63 up to ~10^13 member vectors.

Scale shape: iters + 1 streaming passes over the dataset (Lloyd needs
a full pass per round by definition); per-pass driver traffic is
k x d x blocks int64s, independent of the corpus size. No shuffle.
At petabyte scale the quantized dataset can be materialized once into
the object store to skip re-reading parquet per round; the default
stays streaming (re-read) so nothing is ever pinned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KMEANS_K = 10
KMEANS_ITERS = 3
KMEANS_SCALE = 1_000_000


def _quant_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    from robosat_ray.stages.ann import _emb_matrix

    ids, E = _emb_matrix(batch)  # E is float64
    return ids, np.floor(E * KMEANS_SCALE).astype(np.int64)


def _assign(Q: np.ndarray, M: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """argmin_j ||q - m_j||^2 with first-occurrence (= smallest j)
    ties, plus the winning dist2 — exact int64 via the expansion
    ||q||^2 - 2 q.m + ||m||^2 (all terms < 2^48 at d=64)."""
    qq = (Q * Q).sum(axis=1, keepdims=True)
    mm = (M * M).sum(axis=1)[None, :]
    d2 = qq - 2 * (Q @ M.T) + mm
    c = d2.argmin(axis=1)
    return c.astype(np.int64), d2[np.arange(len(c)), c]


def _init_centroids(emb_ds, k: int) -> np.ndarray:
    """Quantized vectors of the k smallest vec_ids: per-block head-k
    partials -> driver merge (k x blocks rows, no sort shuffle)."""

    def headk(batch: pa.Table) -> pa.Table:
        ids, Q = _quant_matrix(batch)
        order = np.argsort(ids, kind="stable")[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order]),
                "q": pa.array(list(Q[order]), pa.list_(pa.int64())),
            }
        )

    rows = emb_ds.map_batches(headk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    return np.array([r["q"] for r in rows[:k]], dtype=np.int64)


def kmeans_model(emb_ds, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """-> (k, d) int64 centroid lattice after `iters` Lloyd rounds
    (the fitting half of kmeans_assignments; stages/semdedup.py reuses
    it to label + lattice-quantize in one pass)."""
    import ray

    M = _init_centroids(emb_ds, k)
    d = M.shape[1]
    for _ in range(iters):
        ref = ray.put(M)

        def partial(batch: pa.Table, _ref=ref, _k=k, _d=d) -> pa.Table:
            cent = ray.get(_ref)
            ids, Q = _quant_matrix(batch)
            c, _ = _assign(Q, cent)
            sums = np.zeros((_k, _d), dtype=np.int64)
            np.add.at(sums, c, Q)
            counts = np.bincount(c, minlength=_k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(_k, dtype=np.int64)),
                    "n": pa.array(counts),
                    "s": pa.array(list(sums), pa.list_(pa.int64())),
                }
            )

        parts = emb_ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((k, d), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["s"], dtype=np.int64)
            counts[r["cluster"]] += r["n"]
        nz = counts > 0
        M = M.copy()
        M[nz] = sums[nz] // counts[nz, None]  # floor-div == the SQL twin
    return M


def kmeans_assignments(emb_ds, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """-> Dataset (vec_id, cluster, dist2): full-corpus integer Lloyd."""
    import ray

    M = kmeans_model(emb_ds, k, iters)
    ref = ray.put(M)

    def label(batch: pa.Table, _ref=ref) -> pa.Table:
        cent = ray.get(_ref)
        ids, Q = _quant_matrix(batch)
        c, d2 = _assign(Q, cent)
        return pa.table(
            {"vec_id": pa.array(ids), "cluster": pa.array(c), "dist2": pa.array(d2)}
        )

    return emb_ds.map_batches(label, batch_format="pyarrow")
