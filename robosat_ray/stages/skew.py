"""Partition-skew diagnostics — the quantitative version of the
north-star's hot-cell story: per-Z_JOIN-cell page counts summarized
as an EXACT integer Gini coefficient plus the hottest cell's share.
This is the report a 100-TB operator reads before deciding salting
factors (the flagship's hot_cell_map bounds skew; this op measures
it).

Exactness (mirrored in oracle.SKEW_REPORT): cells ranked by the
unique composite key (count, cell) ascending; with x_i the counts and
r_i the 1-based row_number,
  gini = (2 * sum(r*x) - (n+1) * sum(x)) / (n * sum(x))
emitted as the exact integer pair (gini_num, gini_den) — no float
division. top_share_bp = max_count * 10000 // total.

Scale shape: per-batch cell combiners -> one cell groupby (the same
shuffle cover uses), then the distributed exact-rank machinery over
the CELL table (bounded by distinct cells, not pages), then scalar
partials. Pages shuffle once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

CELL_SHIFT = np.int64(1) << 25  # cell = tx*2^12+ty < 2^24 at Z_JOIN=12


def skew_report(docs_ds) -> pd.DataFrame:
    """documents -> one row (n_cells, total_pages, gini_num, gini_den,
    top_share_bp) over the Z_JOIN cell distribution."""
    from ray.data.aggregate import Sum

    from robosat_ray.stages.rank import exact_rank
    from robosat_ray.synth.pages import page_coords
    import robosat_ray.constants as C

    n_grid = float(1 << C.Z_JOIN)
    ni = np.int64(1 << C.Z_JOIN)

    def cells(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        lon, my = page_coords(ids)
        tx = np.floor((lon + 180.0) / 360.0 * n_grid).astype(np.int64)
        ty = np.floor(my * n_grid).astype(np.int64)
        cell = tx * ni + ty
        uk, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {"cell": pa.array(uk), "c": pa.array(cnt.astype(np.int64))}
        )

    per_cell = (
        docs_ds.select_columns(["doc_id"])
        .map_batches(cells, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("c", alias_name="n"))
        .materialize()  # cell-bounded; reused for rank + scalars
    )

    def keyed(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy()
        cell = b.column("cell").to_numpy()
        assert len(cell) == 0 or cell.max() < (1 << 25), "cell key range"
        return pa.table(
            {
                "doc_id": pa.array(cell),  # rank machinery's id column
                "score": pa.array(n * CELL_SHIFT + cell),
            }
        )

    ranked = exact_rank(per_cell.map_batches(keyed, batch_format="pyarrow"))

    def partials(b: pa.Table) -> pa.Table:
        r = b.column("rank").to_numpy()
        x = b.column("score").to_numpy() // CELL_SHIFT  # recover count
        return pa.table(
            {
                "rx": pa.array([int((r * x).sum())], pa.int64()),
                "x": pa.array([int(x.sum())], pa.int64()),
                "mx": pa.array([int(x.max()) if len(x) else 0], pa.int64()),
                "k": pa.array([len(x)], pa.int64()),
            }
        )

    agg = ranked.map_batches(partials, batch_format="pyarrow")
    sums = agg.sum(["rx", "x", "k"])
    mx = int(agg.max("mx"))
    rx = int(sums["sum(rx)"])
    total = int(sums["sum(x)"])
    n_cells = int(sums["sum(k)"])
    return pd.DataFrame(
        {
            "n_cells": np.array([n_cells], dtype=np.int64),
            "total_pages": np.array([total], dtype=np.int64),
            "gini_num": np.array(
                [2 * rx - (n_cells + 1) * total], dtype=np.int64
            ),
            "gini_den": np.array([n_cells * total], dtype=np.int64),
            "top_share_bp": np.array([mx * 10_000 // total], dtype=np.int64),
        }
    )
