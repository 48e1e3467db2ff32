"""Class-weight histogram aggregate (SURVEY.md A1; reference
robosat/tools/weights.py:36-59: sequential per-tile bincount sum, then
w = 1 / ln(1.02 + p)). Engine shape: per-batch partial bincounts
(map_batches combiner) -> tiny global sum -> driver finalizer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def partial_bincount(batch: pa.Table, n_classes: int = 2) -> pa.Table:
    from robosat_ray.geo.raster import binary_flat_chunks

    counts = np.zeros(n_classes, dtype=np.int64)
    # zero-copy flat view over ALL masks in the batch: one bincount per
    # Arrow chunk, no per-row Python loop
    for flat in binary_flat_chunks(batch.column("data")):
        counts += np.bincount(flat, minlength=n_classes)[:n_classes]
    return pa.table({f"c{i}": pa.array([counts[i]]) for i in range(n_classes)})


def class_weights(masks_ds, n_classes: int = 2) -> pd.DataFrame:
    """-> DataFrame (class_idx, pixel_count, weight_micro) with the
    reference's weight formula w = 1 / ln(1.02 + p), emitted as an
    int64 micro-weight (w * 1e6, half-up)."""
    from ray.data.aggregate import Sum

    partials = masks_ds.map_batches(
        lambda b: partial_bincount(b, n_classes), batch_format="pyarrow"
    )
    agg = partials.aggregate(*[Sum(f"c{i}", alias_name=f"c{i}") for i in range(n_classes)])
    counts = np.array([agg[f"sum(c{i})"] if f"sum(c{i})" in agg else agg[f"c{i}"] for i in range(n_classes)], dtype=np.int64)
    total = counts.sum()
    probs = counts / total
    # integer micro-weight: numpy log and DuckDB ln can differ by 1 ulp,
    # and float64 ROUND implementations disagree in the last bit — an
    # int64 at 1e-6 precision is byte-stable across both (flip needs the
    # true value within ~4e-9 of a .5 boundary). Same IEEE expression
    # shape as the oracle: 1000000.0 / ln(1.02 + p), half-up.
    weight_micro = np.floor(1000000.0 / np.log(1.02 + probs) + 0.5).astype(np.int64)
    return pd.DataFrame(
        {
            "class_idx": np.arange(n_classes, dtype=np.int64),
            "pixel_count": counts,
            "weight_micro": weight_micro,
        }
    )
