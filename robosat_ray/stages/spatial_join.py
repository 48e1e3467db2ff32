"""Point-in-polygon spatial join — the engine's headline operator
(SURVEY.md §2.4 J9; reference analog: rtree bbox probe + shapely
`intersects` loops at robosat/tools/merge.py:47-56 and
robosat/tools/dedupe.py:45-68, which hold the whole index in driver
RAM — here both sides are co-partitioned by Web-Mercator cell and the
probe runs distributed).

Shape:
  footprints --flat_map--> one copy per covered cell  \\
                                                        union -> groupby(bucket)
  points     --bucket = f(cell, salt)                 /        -> map_groups(probe)

Skew: hot cells (dense cities) are detected with a cheap pre-aggregated
count pass; their points are salted across `k = ceil(count / cap)`
buckets and the cell's feature copies are replicated into each salted
bucket (north rule: "explicit salting of hot cells"). All hot paths are
vectorized numpy / Arrow `take` — no Python per-row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from robosat_ray import constants as C
from robosat_ray.geo import tiles as T
from robosat_ray.geo.polygon import build_edge_list, pip_pairs

from robosat_ray.functions.hashing import mix64

_RING_T = pa.list_(pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())])))


def _bucket_of(cell: np.ndarray, salt: np.ndarray, num_buckets: int) -> np.ndarray:
    """Well-mixed cell bucket (+ salt offset): a bare multiplicative
    mix mod a power of two only sees `cell mod num_buckets`, which for
    z-cells is `ty mod num_buckets` — city stripes would skew the
    shuffle join."""
    return ((mix64(cell) + salt.astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int64)


def hot_cell_map(
    points_ds, z: int, cap: int = 20000, top_k: int = 65536, sample_mod: int = 0
) -> dict:
    """Cheap two-stage count: per-batch partial counts per cell
    (map_batches combiner) -> small groupby sum -> driver-side
    {cell: k_salt} for cells whose row count exceeds `cap`. Only cells
    above cap ever reach the driver, and the map is additionally
    bounded to the `top_k` HOTTEST of them (at 10^12 rows, millions of
    cells could each exceed a fixed cap; the driver dict must stay
    O(top_k)).

    Detection runs on a DETERMINISTIC 1/sample_mod row sample
    (mix64(doc_id) residue; sample_mod=0 auto-picks cap//256, i.e.
    a genuinely hot cell still contributes ~256+ sampled rows, so the
    estimate's relative error is a few percent). Salting is
    correctness-invariant (tests/test_oracle_parity.py salting
    invariance), so both the sampling and the top-k bound only trade
    residual skew — a missed borderline cell keeps k_salt=1, and every
    cell dropped by top-k is no hotter than the coolest kept one.
    The pre-pass therefore costs one map-only scan plus a groupby of
    the SAMPLED cells, not an all-to-all of every row."""
    if sample_mod <= 0:
        sample_mod = max(1, cap // 256)
    threshold = cap // sample_mod

    def partial_counts(batch: pa.Table) -> pa.Table:
        cells = batch.column("cell").to_numpy()
        if sample_mod > 1:
            ids = batch.column("doc_id").to_numpy()
            cells = cells[mix64(ids) % np.uint64(sample_mod) == 0]
        uniq, cnt = np.unique(cells, return_counts=True)
        return pa.table({"cell": uniq, "partial": cnt.astype(np.int64)})

    from ray.data.aggregate import Sum

    cols = ["cell"] if sample_mod == 1 else ["doc_id", "cell"]
    counts = (
        points_ds.select_columns(cols)
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("partial", alias_name="n"))
    )
    def topk_partial(batch: pa.Table) -> pa.Table:
        # per-block top-k: the driver then sees <= top_k x n_blocks
        # rows and takes the global top-k — ONE pass, no Ray sort (a
        # sort operator adds a boundary-sampling execution of the
        # whole upstream count pipeline, measured ~1.5x the stage)
        n = batch.column("n").to_numpy()
        if len(n) > top_k:
            sel = np.argpartition(n, len(n) - top_k)[len(n) - top_k :]
            batch = batch.take(pa.array(np.sort(sel)))
        return batch

    hot = counts.filter(expr=f"n > {threshold}").map_batches(
        topk_partial, batch_format="pyarrow"
    ).take_all()
    if len(hot) > top_k:
        hot.sort(key=lambda r: -r["n"])
        hot = hot[:top_k]
    return {
        int(r["cell"]): int(np.ceil(r["n"] * sample_mod / cap)) for r in hot
    }


def _apply_hot_k(cells: np.ndarray, hot: dict) -> np.ndarray:
    """Vectorized {cell -> k_salt} lookup (k=1 default)."""
    ks = np.ones(len(cells), dtype=np.int64)
    if hot:
        hot_cells = np.fromiter(hot.keys(), dtype=np.int64, count=len(hot))
        hot_ks = np.fromiter(hot.values(), dtype=np.int64, count=len(hot))
        order = np.argsort(hot_cells)
        hot_cells, hot_ks = hot_cells[order], hot_ks[order]
        pos = np.searchsorted(hot_cells, cells)
        pos = np.clip(pos, 0, len(hot_cells) - 1)
        m = hot_cells[pos] == cells
        ks[m] = hot_ks[pos[m]]
    return ks


def _explode_footprints(batch: pa.Table, z: int, num_buckets: int, hot: dict) -> pa.Table:
    """One row per (covered cell, distinct salted bucket) per footprint.
    Fully vectorized cartesian explode (same shape as cover's)."""
    minx = batch.column("minx").to_numpy()
    miny = batch.column("miny").to_numpy()
    maxx = batch.column("maxx").to_numpy()
    maxy = batch.column("maxy").to_numpy()
    tx0, ty0, tx1, ty1 = T.tile_range(minx, miny, maxx, maxy, z)
    ny = (ty1 - ty0 + 1).astype(np.int64)
    reps = (tx1 - tx0 + 1).astype(np.int64) * ny
    row = np.repeat(np.arange(len(minx)), reps)
    offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
    tx = tx0[row] + offs // ny[row]
    ty = ty0[row] + offs % ny[row]
    cells = tx * np.int64(1 << z) + ty

    ks = _apply_hot_k(cells, hot)
    # expand each (row, cell) to its k distinct salt buckets
    row2 = np.repeat(row, ks)
    cell2 = np.repeat(cells, ks)
    salt2 = np.arange(int(ks.sum())) - np.repeat(np.cumsum(ks) - ks, ks)
    bucket2 = _bucket_of(cell2, salt2, num_buckets)
    # dedupe (row, cell, bucket): different salts can hash to one bucket
    key = (row2 * np.int64(1 << 40)) + (cell2 % np.int64(1 << 34)) * num_buckets + bucket2
    _, keep = np.unique(key, return_index=True)
    row2, cell2, bucket2 = row2[keep], cell2[keep], bucket2[keep]

    taken = batch.take(pa.array(row2))
    n = len(row2)
    return pa.table(
        {
            "bucket": pa.array(bucket2, type=pa.int64()),
            "cell": pa.array(cell2, type=pa.int64()),
            "role": pa.array(np.zeros(n, dtype=np.int8)),
            "feature_id": taken.column("feature_id"),
            "kind": taken.column("kind"),
            "minx": taken.column("minx"),
            "miny": taken.column("miny"),
            "maxx": taken.column("maxx"),
            "maxy": taken.column("maxy"),
            "rings": taken.column("rings"),
            "doc_id": pa.nulls(n, pa.int64()),
            "url": pa.nulls(n, pa.string()),
            "lon": pa.nulls(n, pa.float64()),
            "my": pa.nulls(n, pa.float64()),
        }
    )


def _point_payload(batch: pa.Table, num_buckets: int, hot: dict) -> pa.Table:
    cells = batch.column("cell").to_numpy()
    ids = batch.column("doc_id").to_numpy()
    ks = _apply_hot_k(cells, hot)
    salts = np.where(ks > 1, ids % np.maximum(ks, 1), 0)
    buckets = _bucket_of(cells, salts, num_buckets)
    n = len(cells)
    return pa.table(
        {
            "bucket": pa.array(buckets, type=pa.int64()),
            "cell": pa.array(cells, type=pa.int64()),
            "role": pa.array(np.ones(n, dtype=np.int8)),
            "feature_id": pa.nulls(n, pa.int64()),
            "kind": pa.nulls(n, pa.string()),
            "minx": pa.nulls(n, pa.float64()),
            "miny": pa.nulls(n, pa.float64()),
            "maxx": pa.nulls(n, pa.float64()),
            "maxy": pa.nulls(n, pa.float64()),
            "rings": pa.nulls(n, _RING_T),
            "doc_id": batch.column("doc_id"),
            "url": batch.column("url"),
            "lon": batch.column("lon"),
            "my": batch.column("my"),
        }
    )


def _ring_buffers(rings_col: pa.ChunkedArray | pa.ListArray):
    """Arrow list<list<struct<x,y>>> -> flat numpy buffers + offsets.

    Returns (feat_ring_off, ring_pt_off, xs, ys): feature fi's rings are
    indices feat_ring_off[fi]..feat_ring_off[fi+1]; ring r's points are
    xs[ring_pt_off[r]:ring_pt_off[r+1]]."""
    if isinstance(rings_col, pa.ChunkedArray):
        rings_col = rings_col.combine_chunks()
    l1 = rings_col  # list of rings per feature
    feat_ring_off = l1.offsets.to_numpy()
    l2 = l1.values  # list of points per ring
    ring_pt_off = l2.offsets.to_numpy()
    pts = l2.values  # struct array
    xs = pts.field("x").to_numpy()
    ys = pts.field("y").to_numpy()
    return feat_ring_off, ring_pt_off, xs, ys


def _probe_vectorized(
    p_cell,
    p_lon,
    p_my,
    cell_uniq,
    cell_off,
    copy_feat,
    copy_cell,
    f_minx,
    f_miny,
    f_maxx,
    f_maxy,
    edges,
):
    """Fully vectorized probe: map each point to its cell's feature-copy
    range (sorted representation), expand to candidate pairs with the
    repeat/offset trick, bbox-filter, then exact general-polygon PIP
    via the flat-edge pip_pairs kernel. Returns (point_idx, feat_idx,
    copy_idx) matched pairs."""
    if len(cell_uniq) == 0 or len(p_cell) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    pos = np.searchsorted(cell_uniq, p_cell)
    pos_c = np.clip(pos, 0, len(cell_uniq) - 1)
    has = cell_uniq[pos_c] == p_cell
    pidx0 = np.nonzero(has)[0]
    if len(pidx0) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    slot = pos_c[pidx0]
    cnt = cell_off[slot + 1] - cell_off[slot]
    tot = int(cnt.sum())
    pair_p = np.repeat(pidx0, cnt)
    copy_i = (
        np.arange(tot)
        - np.repeat(np.cumsum(cnt) - cnt, cnt)
        + np.repeat(cell_off[slot], cnt)
    )
    fi = copy_feat[copy_i]
    X = p_lon[pair_p]
    Y = p_my[pair_p]
    inb = (f_minx[fi] <= X) & (X <= f_maxx[fi]) & (f_miny[fi] <= Y) & (Y <= f_maxy[fi])
    pair_p = pair_p[inb]
    fi = fi[inb]
    copy_i = copy_i[inb]
    inside = pip_pairs(p_lon[pair_p], p_my[pair_p], fi, *edges)
    return pair_p[inside], fi[inside], copy_i[inside]


def _probe_group(group: pa.Table) -> pa.Table:
    """Per-bucket join: co-partitioned feature copies x points, output
    assembled with Arrow takes — no per-row Python."""
    roles = group.column("role").to_numpy()
    feats = group.filter(pa.array(roles == 0)).combine_chunks()
    pts = group.filter(pa.array(roles == 1)).combine_chunks()
    empty = pa.table(
        {
            "url": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "feature_id": pa.array([], pa.int64()),
            "kind": pa.array([], pa.string()),
            "cell": pa.array([], pa.int64()),
        }
    )
    if feats.num_rows == 0 or pts.num_rows == 0:
        return empty

    p_cell = pts.column("cell").to_numpy()
    p_lon = pts.column("lon").to_numpy()
    p_my = pts.column("my").to_numpy()

    f_cell = feats.column("cell").to_numpy()
    order = np.argsort(f_cell, kind="stable")
    copy_cell = f_cell[order]
    copy_feat = order  # local feature-row index per sorted copy
    cell_uniq, first = np.unique(copy_cell, return_index=True)
    cell_off = np.append(first, len(copy_cell))

    fro, rpo, rxs, rys = _ring_buffers(feats.column("rings"))
    edges = build_edge_list(fro, rpo, rxs, rys)

    p_idx_np, f_idx_np, _ = _probe_vectorized(
        p_cell,
        p_lon,
        p_my,
        cell_uniq,
        cell_off,
        copy_feat,
        copy_cell,
        feats.column("minx").to_numpy(),
        feats.column("miny").to_numpy(),
        feats.column("maxx").to_numpy(),
        feats.column("maxy").to_numpy(),
        edges,
    )
    if len(p_idx_np) == 0:
        return empty
    p_idx = pa.array(p_idx_np)
    f_idx = pa.array(f_idx_np)
    return pa.table(
        {
            "url": pts.column("url").take(p_idx),
            "doc_id": pts.column("doc_id").take(p_idx),
            "feature_id": feats.column("feature_id").take(f_idx),
            "kind": feats.column("kind").take(f_idx),
            "cell": feats.column("cell").take(f_idx),
        }
    )


def spatial_join(
    points_ds,
    footprints_ds,
    z: int = C.Z_JOIN,
    num_buckets: int = C.NUM_JOIN_BUCKETS,
    hot: dict | None = None,
):
    """Shuffle (co-partition) PIP join: points (url, doc_id, lon, my,
    cell) ⋈ footprints (feature_id, kind, bbox, rings) at cell zoom z.

    This is the both-sides-large scale path (each side streams through
    one groupby shuffle). `hot` is an optional {cell: k_salt} map (from
    hot_cell_map); pass {} / None to disable salting."""
    hot = hot or {}
    fx = footprints_ds.map_batches(
        lambda b: _explode_footprints(b, z, num_buckets, hot), batch_format="pyarrow"
    )
    px = points_ds.map_batches(
        lambda b: _point_payload(b, num_buckets, hot), batch_format="pyarrow"
    )
    both = fx.union(px)
    return both.groupby("bucket").map_groups(_probe_group, batch_format="pyarrow")


class BroadcastProber:
    """Actor-pool PIP probe with the footprint side broadcast once per
    actor (the T3/T6 pattern of SURVEY.md §2.3: `ray.put` the small
    side, build the per-cell index in __init__, probe per batch).

    Zero shuffle: the scan side streams through the pool. Used when the
    footprint side fits comfortably in a worker heap; the shuffle join
    above is the path when it doesn't."""

    # the probe indexes at a FINER zoom than the join-semantics cell so
    # dense city cells don't fan every point out to hundreds of copies:
    # at z+3 there are 64 subcells per cell (~5 candidates per point)
    INDEX_ZOOM_DELTA = 3

    def __init__(self, feet_ref, z: int):
        import ray

        feet: pa.Table = ray.get(feet_ref) if not isinstance(feet_ref, pa.Table) else feet_ref
        feet = feet.combine_chunks()
        self.zi = z + self.INDEX_ZOOM_DELTA
        z = self.zi
        minx = feet.column("minx").to_numpy()
        miny = feet.column("miny").to_numpy()
        maxx = feet.column("maxx").to_numpy()
        maxy = feet.column("maxy").to_numpy()
        tx0, ty0, tx1, ty1 = T.tile_range(minx, miny, maxx, maxy, z)
        ny = (ty1 - ty0 + 1).astype(np.int64)
        reps = (tx1 - tx0 + 1).astype(np.int64) * ny
        row = np.repeat(np.arange(len(minx)), reps)
        offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
        tx = tx0[row] + offs // ny[row]
        ty = ty0[row] + offs % ny[row]
        cells = tx * np.int64(1 << z) + ty
        order = np.argsort(cells, kind="stable")
        self.copy_cell = cells[order]  # sorted cell per feature-copy
        self.copy_feat = row[order]  # feature index per copy
        self.cell_uniq, first = np.unique(self.copy_cell, return_index=True)
        self.cell_off = np.append(first, len(self.copy_cell))
        self.f_minx, self.f_miny, self.f_maxx, self.f_maxy = minx, miny, maxx, maxy
        self.f_table = feet.select(["feature_id", "kind"])
        fro, rpo, rxs, rys = _ring_buffers(feet.column("rings"))
        self.edges = build_edge_list(fro, rpo, rxs, rys)

    def __call__(self, batch: pa.Table) -> pa.Table:
        p_cell = batch.column("cell").to_numpy()
        p_lon = batch.column("lon").to_numpy()
        p_my = batch.column("my").to_numpy()
        # point subcell at the index zoom (output keeps the z-level cell)
        tx, ty = T.lonmy_to_tile(p_lon, p_my, self.zi)
        p_icell = tx * np.int64(1 << self.zi) + ty
        p_idx_np, f_idx_np, _ = _probe_vectorized(
            p_icell,
            p_lon,
            p_my,
            self.cell_uniq,
            self.cell_off,
            self.copy_feat,
            self.copy_cell,
            self.f_minx,
            self.f_miny,
            self.f_maxx,
            self.f_maxy,
            self.edges,
        )
        if len(p_idx_np) == 0:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "feature_id": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.string()),
                    "cell": pa.array([], pa.int64()),
                }
            )
        p_idx = pa.array(p_idx_np)
        f_idx = pa.array(f_idx_np)
        return pa.table(
            {
                "url": batch.column("url").take(p_idx),
                "doc_id": batch.column("doc_id").take(p_idx),
                "feature_id": self.f_table.column("feature_id").take(f_idx),
                "kind": self.f_table.column("kind").take(f_idx),
                "cell": pa.array(p_cell[p_idx_np]),
            }
        )


# per-worker-process prober cache: the broadcast index is built once
# per (object ref, zoom) in each Ray worker, then reused across tasks.
# Stateless tasks + worker cache = elastic scheduling (no actor-pool
# sizing that can starve upstream stages).
_PROBER_CACHE: dict = {}


def _probe_batch_task(batch: pa.Table, wrapped_ref, z: int) -> pa.Table:
    import ray

    ref = wrapped_ref[0]
    key = (ref.hex() if hasattr(ref, "hex") else id(ref), z)
    prober = _PROBER_CACHE.get(key)
    if prober is None:
        prober = BroadcastProber(ray.get(ref), z)
        _PROBER_CACHE.clear()  # hold at most one index per worker
        _PROBER_CACHE[key] = prober
    return prober(batch)


def broadcast_spatial_join(points_ds, feet_table: pa.Table, z: int = C.Z_JOIN, concurrency=None):
    """Broadcast-side PIP join: `feet_table` is ray.put once; each
    worker builds the per-cell index on first use (cached) and probes
    batches as elastic stateless tasks. `concurrency` is accepted for
    API compatibility (None = let the scheduler decide)."""
    import ray

    ref = ray.put(feet_table)
    return points_ds.map_batches(
        _probe_batch_task,
        fn_args=([ref], z),  # wrapped in a list so Ray doesn't auto-deref
        batch_format="pyarrow",
        # NOTE: do NOT set batch_size here — Ray's re-batching of Arrow
        # blocks costs ~8x on this stage (measured); candidate-pair
        # memory is bounded by keeping BLOCKS small (~8k rows) instead,
        # via num_blocks at the source (see bench.py / flagship).
    )
