"""Sampling + per-group top-k — training-data pipeline staples
(subset selection and "best N per stratum" curation; no robosat
counterpart, task-brief family).

Both are deterministic: sampling uses a key hash (stable across runs,
partitionings and cluster sizes — a global RNG is not), top-k uses a
total order with explicit integer tie-breaks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SAMPLE_MUL = np.uint64(2654435761)
MOD32 = np.uint64(1 << 32)


def sample_hash(keys: np.ndarray, seed: int) -> np.ndarray:
    """((key mod 2^32) * MUL + seed) mod 2^32 — bounded operands so
    the SQL oracle (HUGEINT) and numpy (uint64) agree at any key
    magnitude."""
    k = keys.astype(np.uint64) % MOD32
    return (k * SAMPLE_MUL + np.uint64(seed)) % MOD32


def stratified_sample(ds, key_col: str = "doc_id", frac: float = 0.2, seed: int = 7):
    """Keep rows whose key hash falls under frac * 2^32 — a uniform
    rate within every stratum (the hash is independent of any other
    column), reproducible and join-stable (the same key always lands
    the same way)."""
    thr = np.uint64(int(frac * float(MOD32)))

    def f(batch: pa.Table) -> pa.Table:
        h = sample_hash(batch.column(key_col).to_numpy(), seed)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(f, batch_format="pyarrow")


def _topk_group(group: pd.DataFrame, order_cols, ascending, k: int) -> pd.DataFrame:
    g = group.sort_values(order_cols, ascending=ascending, kind="stable").head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def top_k_per_group(ds, group_col: str, order_cols, ascending, k: int):
    """Top-k rows per group under a total order (ties must be broken
    by a unique column in order_cols). Low-cardinality group columns
    group directly; bucket high-cardinality keys first (the
    running_totals pattern in stages/events.py)."""
    return ds.groupby(group_col).map_groups(
        lambda g: _topk_group(g, order_cols, ascending, k), batch_format="pandas"
    )


def weighted_sample(docs_ds, seed: int = 7):
    """Deterministic weighted subsample (the data-mixing primitive):
    keep a document with probability equal to its alpha ratio, as an
    integer threshold in 2^32 units compared against the stable key
    hash. Pure per-batch map — scale-free, reproducible across
    partitionings, join-stable — and bit-exact against the SQL twin
    (threshold and hash are both integer arithmetic)."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        n_chars = pc.utf8_length(texts).cast(pa.int64()).to_numpy()
        alpha_only = pc.replace_substring_regex(texts, "[^A-Za-z]", "")
        n_alpha = pc.utf8_length(alpha_only).cast(pa.int64()).to_numpy()
        thr = n_alpha * (1 << 32) // np.maximum(n_chars, 1)
        h = sample_hash(batch.column("doc_id").to_numpy(), seed).astype(np.int64)
        keep = pa.array(h < thr)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(keep),
                "n_chars": pa.array(n_chars).filter(keep),
                "n_alpha": pa.array(n_alpha).filter(keep),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )
