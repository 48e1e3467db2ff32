"""Train/val split + epoch shuffle (SURVEY.md O5; reference
robosat/tools/train.py:273-274 — DataLoader(shuffle=True) per epoch
over a directory-split dataset).

Engine shape: the split is a deterministic hash of the key column
(stable across runs, partitioning and cluster size — a directory
split does not scale to 10^12 rows), and the epoch shuffle is Ray
Data's distributed `random_shuffle(seed=...)` — a full shuffle the
streaming executor pipelines block-wise (no driver materialization).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SPLIT_MIX = np.uint64(0x9E3779B97F4A7C15)


def _val_mask(keys: np.ndarray, val_frac: float) -> np.ndarray:
    h = (keys.astype(np.uint64) * SPLIT_MIX) >> np.uint64(40)
    return (h % np.uint64(1000)) < np.uint64(int(val_frac * 1000))


def train_val_split(ds, val_frac: float = 0.1, key: str = "doc_id"):
    """-> (train_ds, val_ds): disjoint, exhaustive, deterministic."""

    def part(batch: pa.Table, want_val: bool) -> pa.Table:
        m = _val_mask(batch.column(key).to_numpy(), val_frac)
        return batch.filter(pa.array(m == want_val))

    train = ds.map_batches(
        lambda b: part(b, False), batch_format="pyarrow"
    )
    val = ds.map_batches(lambda b: part(b, True), batch_format="pyarrow")
    return train, val


def shuffled_epoch(train_ds, seed: int):
    """Seeded distributed shuffle for one training epoch (O5)."""
    return train_ds.random_shuffle(seed=seed)


# leakage-safe split: the val fraction in 2^32-ths, Knuth-hash
# threshold identical to the SAMPLE_STRATIFIED oracle idiom
SAFE_SPLIT_VAL_THRESHOLD = int(0.1 * 4294967296)


def leakage_safe_split(docs_ds, threshold: float = 0.5):
    """Near-dup-aware train/val split: every document of a duplicate
    CLUSTER lands on the same side (split decided by a deterministic
    hash of the cluster id, not the doc id), so no near-duplicate of
    a validation doc can leak into train — the eval-integrity step a
    naive per-doc split silently violates. -> (doc_id, cluster_id,
    split 'train'|'val'). Composes dup_clusters (LSH mine -> CC ->
    canonical labels); the split map itself is one stateless
    vectorized batch pass."""
    from robosat_ray.stages.neardup import dup_clusters

    clusters = dup_clusters(docs_ds, threshold)

    def assign(b: pa.Table) -> pa.Table:
        cid = b.column("cluster_id").to_numpy().astype(np.uint64)
        h = ((cid % np.uint64(4294967296)) * np.uint64(2654435761)
             + np.uint64(7)) % np.uint64(4294967296)
        isval = h < np.uint64(SAFE_SPLIT_VAL_THRESHOLD)
        split = np.where(isval, "val", "train")
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "cluster_id": b.column("cluster_id"),
                "split": pa.array(split, pa.string()),
            }
        )

    return clusters.map_batches(assign, batch_format="pyarrow")
