"""Dataset profiling: per-column statistics as an algebraic aggregate
(the engine's `describe` primitive; no robosat counterpart — every
data engine ships one).

Shape: one partial row per (column, batch) — count, null count, and
micro-quantized min/max/sum — then a tiny groupby(column) combine.
Quantization floor(x*1e6 + 0.5) keeps every statistic int64-exact so
the SQL twin matches bit-for-bit (a float SUM would be
association-order-dependent across partitions)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MICRO = 1e6


def _partials(batch: pa.Table, columns: list[str]) -> pa.Table:
    names, ns, nulls, mins, maxs, sums = [], [], [], [], [], []
    for c in columns:
        col = batch.column(c)
        a = col.to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.isnan(a)
        v = np.floor(a[valid] * MICRO + 0.5).astype(np.int64)
        names.append(c)
        ns.append(len(a))
        nulls.append(int((~valid).sum()))
        mins.append(int(v.min()) if len(v) else np.iinfo(np.int64).max)
        maxs.append(int(v.max()) if len(v) else np.iinfo(np.int64).min)
        sums.append(int(v.sum()))
    return pa.table(
        {
            "column": pa.array(names, pa.string()),
            "pn": pa.array(ns, pa.int64()),
            "pnull": pa.array(nulls, pa.int64()),
            "pmin": pa.array(mins, pa.int64()),
            "pmax": pa.array(maxs, pa.int64()),
            "psum": pa.array(sums, pa.int64()),
        }
    )


def table_stats(ds, columns: list[str]):
    """-> Dataset (column, n, n_null, min_micro, max_micro, sum_micro,
    mean_micro): exact integer column statistics in one streaming pass
    + a |columns|-row combine."""
    from ray.data.aggregate import Max, Min, Sum

    parts = ds.select_columns(columns).map_batches(
        lambda b: _partials(b, columns), batch_format="pyarrow"
    )
    agg = parts.groupby("column").aggregate(
        Sum("pn", alias_name="n"),
        Sum("pnull", alias_name="n_null"),
        Min("pmin", alias_name="min_micro"),
        Max("pmax", alias_name="max_micro"),
        Sum("psum", alias_name="sum_micro"),
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy()
        nn = b.column("n_null").to_numpy()
        s = b.column("sum_micro").to_numpy()
        mean = s // np.maximum(n - nn, 1)
        return b.append_column("mean_micro", pa.array(mean.astype(np.int64)))

    return agg.map_batches(finish, batch_format="pyarrow")
