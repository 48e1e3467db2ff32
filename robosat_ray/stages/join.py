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

NULL join keys never match (NOT-EXISTS semantics, both strategies):
inner joins and semi joins drop null-keyed rows, left joins emit them
null-extended, anti joins keep them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.functions.hashing import key_bucket

NUM_JOIN_BUCKETS = 64


# past this per-key width, fixed-width unicode stops paying: one long
# outlier key would pad EVERY element to its length (4 B/char)
_MAX_U_CHARS = 64


def compact_arrow(ds):
    """Materialization barrier that returns `ds` with uniformly-Arrow
    blocks, dropping empty blocks by metadata (zero data movement).

    Why: Ray's map operators pass EMPTY input blocks through without
    calling the UDF (ray/data/_internal/planner/plan_udf_map_op.py,
    "For empty input blocks, we directly output them without calling
    the UDF"), and all-to-all stages (sort / aggregate shuffles) emit
    schema-less empty PANDAS blocks. Those empties then survive every
    downstream `batch_format="pyarrow"` map unconverted, and a later
    type-uniform consumer (`union(...).groupby(...)`) dies with
    `AssertionError: (BlockType.ARROW, BlockType.PANDAS)` — observed
    at the 100x sssp stress (7.8M-pair graph, shuffle strategy), never
    at sf0.01 where no shuffle partition comes out empty. Use at the
    per-round materialization barriers of iterative shuffle loops.

    Non-empty non-Arrow stragglers are converted block-remote; if all
    blocks are empty, one is kept (converted) so the dataset keeps a
    schema for downstream count()/union."""
    import ray
    import ray.data
    from ray.data.block import BlockAccessor

    kept: list = []       # refs of non-empty blocks (arrow by contract)
    fallback = None       # one empty block, converted, if nothing is kept
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                kept.append(ref)
            elif fallback is None:
                fallback = ref

    @ray.remote
    def _to_arrow(block):
        return BlockAccessor.for_block(block).to_arrow()

    if not kept:
        assert fallback is not None, "dataset yielded no blocks at all"
        kept = [fallback]
    # one tiny remote task per block, never through the driver;
    # BlockAccessor.to_arrow is zero-copy identity for Arrow blocks
    return ray.data.from_arrow_refs([_to_arrow.remote(r) for r in kept])


def _keys_valid(col) -> tuple[np.ndarray, np.ndarray]:
    """Join-key column -> (key array, validity mask). NULL keys never
    match (NOT-EXISTS semantics — callers zero their hits through the
    mask; the "" / NaN placeholder the null slots carry can therefore
    never produce a false join). Object (string) arrays become
    fixed-width unicode for C-speed searchsorted unless an outlier key
    would inflate every element past _MAX_U_CHARS — then they stay
    object dtype (Python-compare searchsorted, memory-safe)."""
    a = col.to_numpy(zero_copy_only=False)
    valid = ~pd.isna(a)
    if a.dtype == object:
        if not valid.all():
            a = np.where(valid, a, "")
        u = a.astype("U")
        if u.dtype.itemsize > 4 * _MAX_U_CHARS:
            return a, valid
        return u, valid
    return a, valid


def _blocks_as_tables(refs) -> list:
    """ray.get + normalize: to_arrow_refs can hand back raw pandas
    blocks unconverted (notably empty ones from pandas map_groups);
    coerce everything to non-empty Arrow tables."""
    import ray

    out = []
    for t in ray.get(refs):
        if isinstance(t, pd.DataFrame):
            if len(t) == 0:
                continue
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows > 0:
            out.append(t)
    return out


def _as_table(ds_or_table) -> pa.Table:
    if isinstance(ds_or_table, pa.Table):
        return ds_or_table
    # small-side gather: the broadcast pattern REQUIRES the right side
    # to fit on one machine; callers pick the strategy accordingly
    tables = _blocks_as_tables(ds_or_table.to_arrow_refs())
    if not tables:
        schema = pa.schema(
            [(n, t) for n, t in zip(ds_or_table.schema().names, ds_or_table.schema().types)]
        )
        return schema.empty_table()
    return pa.concat_tables(tables)


def broadcast_join(left_ds, right, on: str, how: str = "inner"):
    """left (Dataset) ⋈ right (small Dataset or Table) on one key
    column (int64 or string). Right is broadcast via ray.put once; each batch resolves
    matches with sorted-array searchsorted lo/hi bounds plus a
    run-length expansion, so DUPLICATE right keys produce the full
    many-to-many cross product (no Python loop, no shuffle).
    how: 'inner' or 'left' (left fills nulls on unmatched rows)."""
    import ray

    rt = _as_table(right).combine_chunks()
    rt = rt.filter(pa.compute.is_valid(rt.column(on)))  # null keys never match
    keys, _ = _keys_valid(rt.column(on))
    order = np.argsort(keys, kind="stable")
    rref = ray.put((keys[order], rt.take(pa.array(order))))
    rcols = [c for c in rt.column_names if c != on]

    def join_batch(batch: pa.Table, _ref=rref) -> pa.Table:
        rkeys, rtab = ray.get(_ref)
        lk, lvalid = _keys_valid(batch.column(on))
        n = len(lk)
        if len(rkeys) == 0:
            if how == "inner":
                return _empty_with(batch, rtab, rcols)
            out = batch
            for c in rcols:
                out = out.append_column(c, pa.nulls(n, rtab.schema.field(c).type))
            return out
        lo = np.searchsorted(rkeys, lk, side="left")
        hi = np.searchsorted(rkeys, lk, side="right")
        counts = np.where(lvalid, hi - lo, 0)
        if how == "inner":
            total = int(counts.sum())
            lidx = np.repeat(np.arange(n), counts)
            starts = np.repeat(lo, counts)
            cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
            ridx = starts + (np.arange(total) - np.repeat(cum, counts))
            out = batch.take(pa.array(lidx))
            rsel = pa.array(ridx)
            for c in rcols:
                out = out.append_column(c, rtab.column(c).take(rsel))
            return out
        # left: unmatched rows keep ONE null-filled output row
        ecounts = np.maximum(counts, 1)
        total = int(ecounts.sum())
        lidx = np.repeat(np.arange(n), ecounts)
        starts = np.repeat(lo, ecounts)
        cum = np.concatenate(([0], np.cumsum(ecounts)[:-1]))
        ridx = starts + (np.arange(total) - np.repeat(cum, ecounts))
        hit = np.repeat(counts > 0, ecounts)
        ridx = np.where(hit, ridx, 0)
        out = batch.take(pa.array(lidx))
        rsel = pa.array(ridx)
        valid = pa.array(hit)
        for c in rcols:
            vals = rtab.column(c).take(rsel)
            vals = pa.compute.if_else(valid, vals.combine_chunks(), pa.scalar(None, vals.type))
            out = out.append_column(c, vals)
        return out

    return left_ds.map_batches(join_batch, batch_format="pyarrow")


def _empty_with(batch: pa.Table, rtab: pa.Table, rcols: list) -> pa.Table:
    out = batch.slice(0, 0)
    for c in rcols:
        out = out.append_column(c, pa.nulls(0, rtab.schema.field(c).type))
    return out


def _bucket_of_column(col, n: int) -> np.ndarray:
    """Bucket ids for a join-key COLUMN, null-safe and dtype-stable.
    An integer column carrying nulls widens to float64 under
    to_numpy(), which would route key_bucket down the string-hash path
    and DESYNCHRONIZE the two sides of the shuffle (an int64 32 and a
    float64 32.0 hash differently). Nulls bucket as the type's zero —
    harmless, since null keys never match anything."""
    if pa.types.is_integer(col.type):
        filled = pa.compute.fill_null(col, 0)
        return key_bucket(
            filled.to_numpy(zero_copy_only=False).astype(np.int64), n
        )
    a = col.to_numpy(zero_copy_only=False)
    mask = pd.isna(a)
    if mask.any():
        a = np.where(mask, "", a)
    return key_bucket(a, n)


def _merge_bucket(
    group: pd.DataFrame, on: str, lcols: list, rcols: list, how: str,
    ldtypes: dict, rdtypes: dict,
) -> pd.DataFrame:
    lmask = group["_side"].to_numpy() == 0
    # the null-filled union columns widened ints to float64 in the
    # pandas block; each side's OWN columns are null-free, so restore
    # the original dtypes before merging. Exception: under how='left'
    # the KEY column legitimately carries the left side's null keys
    # (they ride through to come out null-extended), so an integer key
    # restores to pandas nullable Int*/UInt* instead of crashing on
    # NaN->int. Right-side null keys were dropped pre-shuffle, so a
    # null key can never find a match partner.
    if how == "left" and group.loc[lmask, on].isna().any():
        ldtypes = {**ldtypes, on: _nullable_dtype(ldtypes[on])}
        rdtypes = {**rdtypes, on: _nullable_dtype(rdtypes[on])}
    left = group.loc[lmask, [on] + lcols].astype(ldtypes)
    right = group.loc[~lmask, [on] + rcols].astype(rdtypes)
    return left.merge(right, on=on, how=how)


def _nullable_dtype(np_dtype):
    kind = np.dtype(np_dtype).kind
    if kind in "iu":
        name = np.dtype(np_dtype).name  # e.g. int64 -> Int64
        return name[0].upper() + name[1:]
    return np_dtype


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
        # null right keys can never match: drop before the shuffle
        batch = batch.filter(pa.compute.is_valid(batch.column(on)))
        k = batch.column(on).to_numpy()
        t = pa.table({on: batch.column(on)})
        for c in lcols:
            t = t.append_column(c, pa.nulls(len(t), ltypes[c]))
        for c in rcols:
            t = t.append_column(c, batch.column(c))
        t = t.append_column("_side", pa.array(np.full(len(t), 1, np.int8)))
        return t.append_column("_bucket", pa.array(key_bucket(k, num_buckets)))

    def tag_left(batch: pa.Table) -> pa.Table:
        if how == "inner":
            # null left keys can never match either; under 'left' they
            # ride through and come out null-extended (right side holds
            # no nulls, so the pandas merge cannot NaN-match them)
            batch = batch.filter(pa.compute.is_valid(batch.column(on)))
        t = pa.table({on: batch.column(on)})
        for c in lcols:
            t = t.append_column(c, batch.column(c))
        for c in rcols:
            t = t.append_column(c, pa.nulls(len(t), rtypes[c]))
        t = t.append_column("_side", pa.array(np.full(len(t), 0, np.int8)))
        return t.append_column(
            "_bucket", pa.array(_bucket_of_column(batch.column(on), num_buckets))
        )

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    ldtypes = {c: ltypes[c].to_pandas_dtype() for c in [on] + lcols}
    rdtypes = {c: rtypes[c].to_pandas_dtype() for c in [on] + rcols}
    return both.groupby("_bucket").map_groups(
        lambda g: _merge_bucket(g, on, lcols, rcols, how, ldtypes, rdtypes),
        batch_format="pandas",
    )


def _membership_mask(batch: pa.Table, on: str, rkeys: np.ndarray) -> np.ndarray:
    lk, valid = _keys_valid(batch.column(on))
    if len(rkeys) == 0:
        return np.zeros(len(lk), dtype=bool)
    pos = np.searchsorted(rkeys, lk)
    pos_c = np.clip(pos, 0, len(rkeys) - 1)
    return (pos < len(rkeys)) & (rkeys[pos_c] == lk) & valid


def broadcast_semi_join(left_ds, right, on: str, anti: bool = False):
    """left SEMI (or ANTI) join right on one key column (int64 or
    string): keep left rows
    whose key does (semi) / does not (anti) appear in the right side.
    Only the right side's DISTINCT KEY ARRAY is broadcast (ray.put of a
    sorted int64 array — far smaller than the table), and the left
    side streams through a searchsorted membership filter: zero
    shuffle, the reference's subset (O3) / dedupe-keep (O4) shape.
    A Dataset right side is reduced to per-batch distinct keys BEFORE
    the driver gather, so the gather is bounded by the distinct-key
    count, not the right row count."""
    import ray

    if isinstance(right, pa.Table):
        vk = right.column(on).filter(pa.compute.is_valid(right.column(on)))
        raw, _ = _keys_valid(vk)
    else:
        def _dist(b: pa.Table) -> pa.Table:
            vk = b.column(on).filter(pa.compute.is_valid(b.column(on)))
            arr, _ = _keys_valid(vk)
            return pa.table({on: pa.array(np.unique(arr))})

        dist = right.map_batches(_dist, batch_format="pyarrow")
        # only the key column is gathered; an all-empty right side has
        # no inferable schema, so build the empty key array directly
        tabs = _blocks_as_tables(dist.to_arrow_refs())
        raw = (
            np.concatenate([_keys_valid(t.column(on))[0] for t in tabs])
            if tabs
            else np.array([], dtype=np.int64)
        )
    rkeys = np.unique(raw)
    rref = ray.put(rkeys)

    def filter_batch(batch: pa.Table, _ref=rref) -> pa.Table:
        member = _membership_mask(batch, on, ray.get(_ref))
        keep = ~member if anti else member
        return batch.take(pa.array(np.nonzero(keep)[0]))

    return left_ds.map_batches(filter_batch, batch_format="pyarrow")


def copartition_semi_join(left_ds, right_ds, on: str, anti: bool = False,
                          num_buckets: int = NUM_JOIN_BUCKETS,
                          schema_hints: dict | None = None):
    """Shuffle semi/anti join for a large right side: right is reduced
    to distinct keys per batch, both sides hash-bucketed in ONE
    all-to-all, membership decided per bucket with searchsorted. Left
    rows keep their full payload through the shuffle; right ships only
    its key column (null-filled to the union layout).

    `schema_hints` = {'left': {col: pa.DataType}} pins the left
    schema (same Ray sampled-schema caveat as copartition_join)."""
    if schema_hints is not None:
        ltypes = dict(schema_hints["left"])
    else:
        lschema = left_ds.schema()
        ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}
    lcols = [c for c in ltypes if c != on]

    def key_rows(batch: pa.Table) -> pa.Table:
        vk = batch.column(on).filter(pa.compute.is_valid(batch.column(on)))
        k = np.unique(vk.to_numpy(zero_copy_only=False))
        t = pa.table({on: pa.array(k)})
        for c in lcols:
            t = t.append_column(c, pa.nulls(len(t), ltypes[c]))
        t = t.append_column("_side", pa.array(np.ones(len(k), np.int8)))
        return t.append_column("_bucket", pa.array(key_bucket(k, num_buckets)))

    def tag_left(batch: pa.Table) -> pa.Table:
        t = pa.table({on: batch.column(on)})
        for c in lcols:
            t = t.append_column(c, batch.column(c))
        t = t.append_column("_side", pa.array(np.zeros(len(batch), np.int8)))
        return t.append_column(
            "_bucket", pa.array(_bucket_of_column(batch.column(on), num_buckets))
        )

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(key_rows, batch_format="pyarrow")
    )

    # null-filled union columns widen ints to float64 in the pandas
    # block; left rows themselves are null-free, so restore dtypes
    ldtypes = {c: ltypes[c].to_pandas_dtype() for c in [on] + lcols}

    def filter_bucket(group: pd.DataFrame) -> pd.DataFrame:
        side = group["_side"].to_numpy()
        rkeys = np.unique(group.loc[side == 1, on].to_numpy())
        left = group[side == 0]
        lk = left[on].to_numpy()
        # null left keys are never members (NOT-EXISTS semantics);
        # they must also be masked out of searchsorted, which cannot
        # order None/NaN against real keys
        lvalid = ~pd.isna(lk)
        member = np.zeros(len(lk), dtype=bool)
        if len(rkeys) and lvalid.any():
            lv = lk[lvalid]
            pos = np.clip(np.searchsorted(rkeys, lv), 0, len(rkeys) - 1)
            member[lvalid] = rkeys[pos] == lv
        keep = ~member if anti else member
        out = left.iloc[np.nonzero(keep)[0]]
        out = out.drop(columns=["_side", "_bucket"])
        # anti keeps null-keyed rows: an integer key restores to the
        # pandas nullable dtype instead of crashing on NaN -> int
        types = dict(ldtypes)
        if out[on].isna().any():
            types[on] = _nullable_dtype(ldtypes[on])
        return out.astype(types)

    return both.groupby("_bucket").map_groups(filter_bucket, batch_format="pandas")


AUTO_BROADCAST_ROWS = 2_000_000


def auto_join(left_ds, right_ds, on: str, how: str = "inner",
              broadcast_limit: int = AUTO_BROADCAST_ROWS,
              num_buckets: int = NUM_JOIN_BUCKETS,
              schema_hints: dict | None = None):
    """Scale-aware strategy switch between broadcast_join and
    copartition_join (same rule the spatial join uses at its 2M-row
    footprint threshold).

    The right side is probed with limit(broadcast_limit + 1) — the
    streaming executor stops producing once the limit is satisfied, so
    the probe cost is bounded by the threshold, never the full right
    side. If the whole right side arrived under the limit it is
    ALREADY materialized: broadcast it (zero shuffle on the large
    left). Otherwise fall back to the co-partition plan over the
    original (lazy) right dataset; the probe prefix is recomputed,
    which is the bounded price of not knowing the build-side size a
    priori."""
    probe = right_ds.limit(broadcast_limit + 1).materialize()
    if probe.count() <= broadcast_limit:
        return broadcast_join(left_ds, _as_table(probe), on=on, how=how)
    return copartition_join(
        left_ds, right_ds, on=on, how=how,
        num_buckets=num_buckets, schema_hints=schema_hints,
    )


# ---------------- Bloom-filter join pruning ----------------

BLOOM_BITS_PER_KEY = 10  # ~1% FP at K=7 hashes
BLOOM_K = 7
# Hard ceiling on the broadcast filter: 2^30 bits = 128 MiB, safely
# shippable via ray.put at any right-side cardinality. Above
# 2^30 / BITS_PER_KEY (~107M) distinct keys the FP rate degrades
# gracefully (the filter only prunes the shuffle — the exact
# co-partition semi-join downstream guarantees correctness), instead
# of the filter itself growing into a multi-GB broadcast.
BLOOM_MAX_BITS = 1 << 30


def _bloom_positions(keys: np.ndarray, num_bits: int) -> np.ndarray:
    """(n, K) bit positions by double hashing: g_i = h1 + i*h2 mod m
    (Kirsch-Mitzenmacher). splitmix64-style mixes, all uint64."""
    k = keys.astype(np.uint64)
    h = (k + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h1 = h * np.uint64(0x94D049BB133111EB)
    h2 = (h ^ (h >> np.uint64(31))) | np.uint64(1)  # odd => full-period stride
    i = np.arange(BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(num_bits))


def build_bloom(right_ds, on: str, num_bits: int):
    """Distributed Bloom build: every batch folds its keys into a full
    num_bits array and emits ONE binary row (num_bits/8 bytes); the
    per-batch rows — one per block, not per key — OR together on the
    driver. Size num_bits ~= BLOOM_BITS_PER_KEY x distinct keys."""
    words = (num_bits + 63) // 64

    def fold(batch: pa.Table) -> pa.Table:
        vk = batch.column(on).filter(pa.compute.is_valid(batch.column(on)))
        arr = np.zeros(words, dtype=np.uint64)
        if len(vk):
            pos = _bloom_positions(vk.to_numpy(zero_copy_only=False), num_bits).ravel()
            np.bitwise_or.at(arr, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([arr.tobytes()], pa.binary())})

    parts = right_ds.map_batches(fold, batch_format="pyarrow").to_pandas()
    out = np.zeros(words, dtype=np.uint64)
    for b in parts["bits"]:
        out |= np.frombuffer(b, dtype=np.uint64)
    return out


def bloom_contains(bloom: np.ndarray, num_bits: int, keys: np.ndarray) -> np.ndarray:
    pos = _bloom_positions(keys, num_bits)
    bits = (bloom[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


def bloom_semi_join(left_ds, right_ds, on: str, num_bits: int,
                    schema_hints: dict | None = None):
    """Exact semi-join with Bloom pre-shuffle pruning: the filter
    (built distributed from the right side, broadcast once via
    ray.put) drops every left row whose key is provably absent BEFORE
    the all-to-all, so the exact copartition semi-join shuffles only
    the ~matching rows plus the FP tail (~1%). No false negatives =>
    the result equals the plain semi-join bit-for-bit; the filter only
    changes how many rows ride the shuffle. This is the standard
    runtime-filter optimization for large ⋉ large joins where neither
    side fits a broadcast. num_bits is clamped to BLOOM_MAX_BITS so
    the broadcast size is bounded by construction — a right side with
    billions of keys trades FP rate (more shuffled rows), never
    correctness or driver memory."""
    import ray

    num_bits = min(int(num_bits), BLOOM_MAX_BITS)
    bloom = build_bloom(right_ds, on, num_bits)
    ref = ray.put(bloom)

    def prefilter(batch: pa.Table, _ref=ref) -> pa.Table:
        blm = ray.get(_ref)
        k = batch.column(on).to_numpy(zero_copy_only=False)
        valid = pa.compute.is_valid(batch.column(on)).to_numpy(zero_copy_only=False)
        keep = np.zeros(len(batch), dtype=bool)
        if valid.any():
            keep[valid] = bloom_contains(blm, num_bits, k[valid])
        return batch.filter(pa.array(keep))

    pruned = left_ds.map_batches(prefilter, batch_format="pyarrow")
    return copartition_semi_join(pruned, right_ds, on, schema_hints=schema_hints)
