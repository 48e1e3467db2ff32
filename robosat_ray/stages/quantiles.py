"""Exact distributed quantiles over a quantized numeric column.

Two-pass histogram algorithm (the classic exact-quantile shape for
large data — no raw-row shuffle at any point):

1. HISTOGRAM pass: each batch emits ONE dense int64 histogram row per
   group present (bucket = (value - vmin) >> shift, <= 65536 buckets);
   a groupby(group) over these tiny array rows sums them and locates,
   for every requested quantile, its target bucket and the exact
   remaining offset within that bucket.
2. RESOLVE pass: a filtered scan keeps only rows landing in a target
   (group, bucket) pair — n/buckets of the data per quantile — and a
   small groupby sorts each such slice to read off the exact value.

The only all-to-all traffic is histogram rows (groups x blocks x
~512KB) and the target-bucket slices. Ray's sort-based groupby over
near-unique (group, value) keys — the naive formulation — measured 4x
slower at sf0.1 and degrades with cardinality; this one is bounded by
the histogram size regardless of row count.

Quantile definition (mirrored exactly by the SQL oracle, integer
arithmetic only): q-quantile = smallest value whose running count
reaches ceil(q * n / 100) within its group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_QS = (25, 50, 75, 95)  # percent, kept integer end-to-end
MAX_BUCKETS = 1 << 16


def _bucket_params(vmin: int, vmax: int) -> tuple[int, int]:
    """shift and bucket count covering [vmin, vmax]."""
    span = max(int(vmax) - int(vmin) + 1, 1)
    shift = 0
    while (span >> shift) > MAX_BUCKETS:
        shift += 1
    n_buckets = (span >> shift) + 1
    return shift, n_buckets


def group_quantiles(ds, group_col: str, value_col: str, qs=DEFAULT_QS):
    """ds must carry an int64 `value_col` (quantize floats upstream).
    -> Dataset (group, q_pct, value): one row per group x quantile."""
    import ray
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(value_col), Max(value_col))
    vmin = int(agg[f"min({value_col})"])
    vmax = int(agg[f"max({value_col})"])
    shift, n_buckets = _bucket_params(vmin, vmax)

    def hist_rows(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy()
        b = (v - vmin) >> shift
        out_g, out_h = [], []
        for grp in np.unique(g):
            m = g == grp
            out_g.append(grp)
            out_h.append(np.bincount(b[m], minlength=n_buckets).astype(np.int64))
        return pa.table(
            {
                group_col: pa.array(out_g),
                "hist": pa.array([h for h in out_h], pa.list_(pa.int64())),
            }
        )

    def locate(gdf: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(n_buckets, dtype=np.int64)
        for row in gdf["hist"].to_numpy():
            h += np.asarray(row, dtype=np.int64)
        cum = np.cumsum(h)
        total = int(cum[-1])
        rows = []
        for q in qs:
            target = (int(q) * total + 99) // 100  # ceil(q*total/100)
            b = int(np.searchsorted(cum, target))
            before = int(cum[b - 1]) if b > 0 else 0
            rows.append((gdf[group_col].iloc[0], int(q), b, target - before))
        return pd.DataFrame(rows, columns=[group_col, "q_pct", "bucket", "offset"])

    targets = (
        ds.map_batches(hist_rows, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(locate, batch_format="pandas")
        .to_pandas()
    )  # tiny: groups x quantiles rows of metadata

    # broadcast the needed (group, bucket) set + per-pair offsets;
    # groups indexed so the filter is a pure composite-int isin
    need = {}
    # iterrows, not itertuples: itertuples RENAMES columns that are
    # invalid identifiers (e.g. a caller's "_g" group), breaking getattr
    for _, r in targets.iterrows():
        need.setdefault((r[group_col], int(r["bucket"])), []).append(
            (int(r["q_pct"]), int(r["offset"]))
        )
    gmap = {g: i for i, g in enumerate(sorted({g for g, _ in need}))}
    need_keys = np.array(
        sorted(gmap[g] * n_buckets + b for g, b in need), dtype=np.int64
    )
    need_ref = ray.put((need, gmap, need_keys))

    def resolve_filter(batch: pa.Table) -> pa.Table:
        _, gm, keys = ray.get(need_ref)
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy()
        b = (v - vmin) >> shift
        # per-UNIQUE-group dict lookup (a handful), then vectorized isin
        ug, inv = np.unique(g, return_inverse=True)
        gidx = np.array([gm.get(x, -1) for x in ug], dtype=np.int64)
        key = gidx[inv] * np.int64(n_buckets) + b
        keep = (gidx[inv] >= 0) & np.isin(key, keys)
        t = batch.filter(pa.array(keep))
        bb = (t.column(value_col).to_numpy() - vmin) >> shift
        return t.append_column("bucket", pa.array(bb.astype(np.int64)))

    def pick(gdf: pd.DataFrame) -> pd.DataFrame:
        nd, _, _ = ray.get(need_ref)
        grp = gdf[group_col].iloc[0]
        bucket = int(gdf["bucket"].iloc[0])
        vals = np.sort(gdf[value_col].to_numpy())
        rows = [(grp, int(q), int(vals[off - 1])) for q, off in nd[(grp, bucket)]]
        return pd.DataFrame(rows, columns=[group_col, "q_pct", "value"])

    return (
        ds.map_batches(resolve_filter, batch_format="pyarrow")
        .groupby([group_col, "bucket"])
        .map_groups(pick, batch_format="pandas")
    )
