"""Generic relational equi-join stages (the engine's reusable join
operator family, SURVEY.md §2.4 generalized beyond the spatial joins):

- broadcast_join: small side ray.put once, vectorized pyarrow-compute
  lookup join per batch — zero shuffle, the dimension-table pattern.
- copartition_join: both sides bucketed by key hash (tagged union, ONE
  all-to-all), pandas C-kernel merge inside each map_groups bucket —
  the large x large pattern; skew-bounded by the well-mixed bucket
  hash (functions/hashing.py).

Strategy rule of thumb at 100 TB: broadcast while the small side fits
a worker heap (dimension tables, lookup maps), co-partition otherwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.functions.hashing import hash_bucket

NUM_JOIN_BUCKETS = 64


def _as_table(ds_or_table) -> pa.Table:
    if isinstance(ds_or_table, pa.Table):
        return ds_or_table
    # small-side gather: the broadcast pattern REQUIRES the right side
    # to fit on one machine; callers pick the strategy accordingly
    refs = ds_or_table.to_arrow_refs()
    import ray

    tables = [t for t in ray.get(refs) if t.num_rows > 0]
    if not tables:
        schema = pa.schema(
            [(n, t) for n, t in zip(ds_or_table.schema().names, ds_or_table.schema().types)]
        )
        return schema.empty_table()
    return pa.concat_tables(tables)


def broadcast_join(left_ds, right, on: str, how: str = "inner"):
    """left (Dataset) ⋈ right (small Dataset or Table) on one int64
    key. Right is broadcast via ray.put once; each batch resolves
    matches with a sorted-array searchsorted (no Python loop, no
    shuffle). how: 'inner' or 'left' (left fills nulls)."""
    import ray

    rt = _as_table(right).combine_chunks()
    keys = rt.column(on).to_numpy()
    order = np.argsort(keys, kind="stable")
    rref = ray.put((keys[order], rt.take(pa.array(order))))
    rcols = [c for c in rt.column_names if c != on]

    def join_batch(batch: pa.Table, _ref=rref) -> pa.Table:
        rkeys, rtab = ray.get(_ref)
        lk = batch.column(on).to_numpy()
        if len(rkeys) == 0:
            pos_c = np.zeros(len(lk), dtype=np.int64)
            hit = np.zeros(len(lk), dtype=bool)
        else:
            pos = np.searchsorted(rkeys, lk)
            pos_c = np.clip(pos, 0, len(rkeys) - 1)
            hit = (pos < len(rkeys)) & (rkeys[pos_c] == lk)
        if how == "inner":
            sel = np.nonzero(hit)[0]
            out = batch.take(pa.array(sel))
            ridx = pa.array(pos_c[sel])
            for c in rcols:
                out = out.append_column(c, rtab.column(c).take(ridx))
            return out
        # left: keep all rows, null right columns where unmatched
        out = batch
        if len(rkeys) == 0:
            for c in rcols:
                out = out.append_column(c, pa.nulls(len(batch), rtab.schema.field(c).type))
            return out
        ridx = pa.array(np.where(hit, pos_c, 0))
        valid = pa.array(hit)
        for c in rcols:
            vals = rtab.column(c).take(ridx)
            vals = pa.compute.if_else(valid, vals.combine_chunks(), pa.scalar(None, vals.type))
            out = out.append_column(c, vals)
        return out

    return left_ds.map_batches(join_batch, batch_format="pyarrow")


def _merge_bucket(
    group: pd.DataFrame, on: str, lcols: list, rcols: list, how: str,
    ldtypes: dict, rdtypes: dict,
) -> pd.DataFrame:
    lmask = group["_side"].to_numpy() == 0
    # the null-filled union columns widened ints to float64 in the
    # pandas block; each side's OWN columns are null-free, so restore
    # the original dtypes before merging
    left = group.loc[lmask, [on] + lcols].astype(ldtypes)
    right = group.loc[~lmask, [on] + rcols].astype(rdtypes)
    return left.merge(right, on=on, how=how)


def copartition_join(left_ds, right_ds, on: str, how: str = "inner",
                     num_buckets: int = NUM_JOIN_BUCKETS,
                     schema_hints: dict | None = None):
    """large ⋈ large equi-join: tag sides, union, ONE hash-bucket
    shuffle, pandas merge per bucket. Non-key column names must be
    disjoint (TPC-H style); asserted at build time.

    `schema_hints` ({col: pa.DataType} per side: {'left': {...},
    'right': {...}}) pins the side schemas explicitly. Without hints,
    Dataset.schema() is used — but beware: Ray infers schema from a
    limit-1 sample, and if that sample block comes out EMPTY (an
    upstream filter/inner-join dropped it) a trailing Project's pruning
    may not be reflected, yielding stale column lists. Pipelines whose
    sides end in select_columns after a filter should pass hints."""
    if schema_hints is not None:
        ltypes = dict(schema_hints["left"])
        rtypes = dict(schema_hints["right"])
    else:
        lschema = left_ds.schema()
        rschema = right_ds.schema()
        ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}
        rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}
    lcols = [c for c in ltypes if c != on]
    rcols = [c for c in rtypes if c != on]
    overlap = set(lcols) & set(rcols)
    assert not overlap, f"non-key column collision: {overlap}"

    # both sides rebuilt in ONE column layout (on, lcols, rcols) with
    # the absent side null-filled, so the union schemas align
    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch.column(on).to_numpy()
        t = pa.table({on: batch.column(on)})
        for c in lcols:
            t = t.append_column(c, pa.nulls(len(t), ltypes[c]))
        for c in rcols:
            t = t.append_column(c, batch.column(c))
        t = t.append_column("_side", pa.array(np.full(len(t), 1, np.int8)))
        return t.append_column("_bucket", pa.array(hash_bucket(k, num_buckets)))

    def tag_left(batch: pa.Table) -> pa.Table:
        t = pa.table({on: batch.column(on)})
        for c in lcols:
            t = t.append_column(c, batch.column(c))
        for c in rcols:
            t = t.append_column(c, pa.nulls(len(t), rtypes[c]))
        t = t.append_column("_side", pa.array(np.full(len(t), 0, np.int8)))
        k = batch.column(on).to_numpy()
        return t.append_column("_bucket", pa.array(hash_bucket(k, num_buckets)))

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    ldtypes = {c: ltypes[c].to_pandas_dtype() for c in [on] + lcols}
    rdtypes = {c: rtypes[c].to_pandas_dtype() for c in [on] + rcols}
    return both.groupby("_bucket").map_groups(
        lambda g: _merge_bucket(g, on, lcols, rcols, how, ldtypes, rdtypes),
        batch_format="pandas",
    )
