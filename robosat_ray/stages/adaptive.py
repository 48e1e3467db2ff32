"""Equi-depth adaptive tiling — the skew-proof alternative to fixed
slippy tiles: split the page corpus into 16 x 16 cells holding (as
near as possible) EQUAL page counts, by independent exact NTILE over
the lon and my axes. This is how a production tiler picks balanced
partition boundaries for dense-city skew (the reference's fixed z/x/y
grid is exactly what makes cities hot; robosat tools/cover.py:30
enumerates fixed tiles — this op derives the balanced grid instead).

Determinism (mirrored bit-for-bit in oracle.ADAPTIVE_GRID): each axis
is ordered by the composite integer key (quantized coord, doc_id) —
key = (floor(coord * scale + 0.5) + OFFSET) * 2^31 + doc_id, unique
and int64-safe — and NTILE(16) assigns rank-balanced buckets (the
first n%16 buckets take the extra row, SQL semantics, formula
verified against DuckDB).

Scale shape: two exact-rank scans (the distributed RANK machinery of
stages/rank.exact_rank: 64-bucket histogram offsets + per-bucket
searchsorted), one doc_id co-partition join of the two rank columns,
and a 256-row final groupby. Page rows shuffle exactly twice (once
per axis rank), partials everywhere else.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GRID_K = 16
XOFF = 200_000_000  # lon quantized at 1e6: range (-1.8e8, 1.8e8)
YOFF = 0  # my in [0, 1), quantized at 1e8: already non-negative
XSCALE = 1_000_000.0
YSCALE = 100_000_000.0
_SHIFT = np.int64(1) << 31


def _ntile_from_rank(rank: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) bucket (1-based) from the unique 1-based rank."""
    q, rem = n // k, n % k
    first = rem * (q + 1)
    return np.where(
        rank <= first,
        (rank - 1) // (q + 1) + 1,
        rem + (rank - first - 1) // max(q, 1) + 1,
    ).astype(np.int64)


def adaptive_grid(docs_ds, k: int = GRID_K):
    """documents -> (bx, by, n_pages): the equi-depth k x k grid."""
    from ray.data.aggregate import Sum

    from robosat_ray.synth.pages import page_coords
    from robosat_ray.stages.join import copartition_join
    from robosat_ray.stages.rank import exact_rank

    def keys(axis: str):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy()
            assert len(ids) == 0 or ids.max() < (1 << 31), "doc_id range"
            lon, my = page_coords(ids)
            if axis == "x":
                qv = np.floor(lon * XSCALE + 0.5).astype(np.int64) + XOFF
            else:
                qv = np.floor(my * YSCALE + 0.5).astype(np.int64) + YOFF
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "score": pa.array(qv * _SHIFT + ids),
                }
            )

        return f

    base = docs_ds.select_columns(["doc_id"])
    rx = exact_rank(base.map_batches(keys("x"), batch_format="pyarrow"))
    ry = exact_rank(base.map_batches(keys("y"), batch_format="pyarrow"))
    n_total = docs_ds.count()

    def bx_col(b: pa.Table) -> pa.Table:
        r = b.column("rank").to_numpy()
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "bx": pa.array(_ntile_from_rank(r, n_total, k)),
            }
        )

    def by_col(b: pa.Table) -> pa.Table:
        r = b.column("rank").to_numpy()
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "by": pa.array(_ntile_from_rank(r, n_total, k)),
            }
        )

    jx = rx.map_batches(bx_col, batch_format="pyarrow")
    jy = ry.map_batches(by_col, batch_format="pyarrow")
    j = copartition_join(
        jx, jy, on="doc_id",
        schema_hints={
            "left": {"doc_id": pa.int64(), "bx": pa.int64()},
            "right": {"doc_id": pa.int64(), "by": pa.int64()},
        },
    )

    def cellc(b: pa.Table) -> pa.Table:
        bx = b.column("bx").to_numpy()
        by = b.column("by").to_numpy()
        key = bx * (k + 1) + by
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"gk": pa.array(uk), "c": pa.array(cnt.astype(np.int64))}
        )

    agg = (
        j.map_batches(cellc, batch_format="pyarrow")
        .groupby("gk")
        .aggregate(Sum("c", alias_name="n_pages"))
    )

    def finish(b: pa.Table) -> pa.Table:
        gk = b.column("gk").to_numpy()
        return pa.table(
            {
                "bx": pa.array(gk // (k + 1)),
                "by": pa.array(gk % (k + 1)),
                "n_pages": b.column("n_pages"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
