"""Distributed dense linear-algebra primitives over the embedding
column — the gram / covariance matrix that PCA, whitening, and
low-rank sketches are built from.

gram_matrix computes G = E^T E exactly: every embedding value is
quantized to an int64 lattice (floor(v * 1e4 + 0.5), bit-equal to the
DuckDB twin's arithmetic on the same float32 parquet values), so the
per-batch partial M^T M is an exact algebraic combiner — d x d int64
per batch regardless of batch size, summed elementwise downstream.
At 10^9 x 64-d vectors the partial traffic is (n_batches x 64 x 64)
int64, the fact table never shuffles, and |q| <= ~2e4 keeps the sum
inside int64 through ~1e9 rows (documented bound, asserted).

Reference parity: the reference's closest surface is per-tile mask
statistics (robosat/tools/weights.py accumulates per-class counts
across the dataset); this is the same partial-sum-of-outer-products
pattern generalized to dense vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

QSCALE = 10_000.0  # embedding value -> int lattice
# |q| <= QMAX keeps sum(q_i * q_j) within int64 for <= 1e9 vectors
QMAX = 3_000_000


def _quantized_matrix(batch: pa.Table) -> np.ndarray:
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    q = np.floor(flat * QSCALE + 0.5).astype(np.int64)
    assert np.abs(q).max(initial=0) <= QMAX, "quantized value out of int64-safe range"
    return q.reshape(batch.num_rows, -1)


def gram_matrix(emb_ds) -> pd.DataFrame:
    """embeddings -> upper-triangle gram entries (i, j, gram), i <= j,
    over the quantized int lattice. Exact combiner: per-batch M^T M."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        M = _quantized_matrix(batch)
        d = M.shape[1]
        G = M.T @ M  # int64 exact
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "ij": pa.array(iu.astype(np.int64) * d + ju),
                "v": pa.array(G[iu, ju]),
            }
        )

    agg = (
        emb_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ij")
        .aggregate(Sum("v", alias_name="gram"))
        .to_pandas()
    )
    # recover (i, j) from the composite key; d from the max index
    d = int(np.sqrt(agg["ij"].max())) + 1 if len(agg) else 0
    out = pd.DataFrame(
        {
            "i": (agg["ij"] // d).astype(np.int64),
            "j": (agg["ij"] % d).astype(np.int64),
            "gram": agg["gram"].astype(np.int64),
        }
    )
    return out.sort_values(["i", "j"]).reset_index(drop=True)
