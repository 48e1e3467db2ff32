"""Merge stage: group features whose buffered geometries touch into
connected components (SURVEY.md J6 + T5 + A5; reference
robosat/tools/merge.py:25-89 — buffer each shape by `threshold`,
rtree bbox probe + intersects -> graph edges, DFS components, union
per component — all in driver RAM with an explicit scaling TODO at
graph/core.py:14-15).

Engine shape: edge detection runs distributed (broadcast per-cell
index, probe per batch — every touching pair shares at least one cell
of either bbox, so per-cell detection finds all edges). Components:
below DRIVER_CC_EDGE_CAP edges, an array union-find on the driver
(edge list << data) whose (ids, labels) numpy pair is broadcast and
attached with np.searchsorted; above the cap,
runtime.components.distributed_components (min-label propagation +
pointer jumping, all groupby shuffles) and a doc-bucket co-partition
join attach — the driver never materializes the component map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray import constants as C
from robosat_ray.geo import tiles as T
from robosat_ray.functions.hashing import hash_bucket
from robosat_ray.geo.graph import min_label_arrays

DRIVER_CC_EDGE_CAP = 2_000_000
# footprint rows above which edge detection abandons the broadcast
# bbox index (merge's input is corpus-derived features that scale
# with the data) for the cell co-partition shuffle path — the same
# switch flagship.py applies at BROADCAST_LIMIT
MERGE_BROADCAST_FEET_CAP = 2_000_000


class EdgeFinder:
    """Broadcast bbox index over the (buffered) feature rects; per
    batch emits overlap edges (a < b). Buffering an axis-aligned rect
    by eps == expanding its bounds by eps (exact, square joins)."""

    def __init__(self, feet_ref, z: int, eps_x: float, eps_y: float):
        import ray

        feet = ray.get(feet_ref) if not isinstance(feet_ref, pa.Table) else feet_ref
        feet = feet.combine_chunks()
        self.fid = feet.column("feature_id").to_numpy()
        self.minx = feet.column("minx").to_numpy() - eps_x
        self.miny = feet.column("miny").to_numpy() - eps_y
        self.maxx = feet.column("maxx").to_numpy() + eps_x
        self.maxy = feet.column("maxy").to_numpy() + eps_y
        self.eps_x = eps_x
        self.eps_y = eps_y
        z = z + 3  # fine-grained index (same trick as the PIP probe)
        self.z = z
        tx0, ty0, tx1, ty1 = T.tile_range(self.minx, self.miny, self.maxx, self.maxy, z)
        ny = (ty1 - ty0 + 1).astype(np.int64)
        reps = (tx1 - tx0 + 1).astype(np.int64) * ny
        row = np.repeat(np.arange(len(self.minx)), reps)
        offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
        tx = tx0[row] + offs // ny[row]
        ty = ty0[row] + offs % ny[row]
        cells = tx * np.int64(1 << z) + ty
        order = np.argsort(cells, kind="stable")
        self.copy_cell = cells[order]
        self.copy_feat = row[order]
        self.cell_uniq, first = np.unique(self.copy_cell, return_index=True)
        self.cell_off = np.append(first, len(self.copy_cell))

    def __call__(self, batch: pa.Table) -> pa.Table:
        bid = batch.column("feature_id").to_numpy()
        bminx = batch.column("minx").to_numpy() - self.eps_x
        bminy = batch.column("miny").to_numpy() - self.eps_y
        bmaxx = batch.column("maxx").to_numpy() + self.eps_x
        bmaxy = batch.column("maxy").to_numpy() + self.eps_y
        tx0, ty0, tx1, ty1 = T.tile_range(bminx, bminy, bmaxx, bmaxy, self.z)
        ny = (ty1 - ty0 + 1).astype(np.int64)
        reps = (tx1 - tx0 + 1).astype(np.int64) * ny
        row = np.repeat(np.arange(len(bid)), reps)
        offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
        tx = tx0[row] + offs // ny[row]
        ty = ty0[row] + offs % ny[row]
        cells = tx * np.int64(1 << self.z) + ty
        # candidates: copies in the same cell
        pos = np.searchsorted(self.cell_uniq, cells)
        pos = np.clip(pos, 0, max(len(self.cell_uniq) - 1, 0))
        has = len(self.cell_uniq) > 0
        hit = has & (self.cell_uniq[pos] == cells) if has else np.zeros(len(cells), bool)
        prow = row[hit]
        slot = pos[hit]
        cnt = self.cell_off[slot + 1] - self.cell_off[slot]
        tot = int(cnt.sum())
        pair_b = np.repeat(prow, cnt)
        copy_i = (
            np.arange(tot)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
            + np.repeat(self.cell_off[slot], cnt)
        )
        fi = self.copy_feat[copy_i]
        keep = (
            (self.minx[fi] <= bmaxx[pair_b])
            & (bminx[pair_b] <= self.maxx[fi])
            & (self.miny[fi] <= bmaxy[pair_b])
            & (bminy[pair_b] <= self.maxy[fi])
            & (self.fid[fi] != bid[pair_b])
        )
        a = np.minimum(bid[pair_b[keep]], self.fid[fi[keep]])
        b = np.maximum(bid[pair_b[keep]], self.fid[fi[keep]])
        key = a * np.int64(1 << 32) + b
        uniqk = np.unique(key)
        return pa.table(
            {
                "a": pa.array(uniqk // np.int64(1 << 32)),
                "b": pa.array(uniqk % np.int64(1 << 32)),
            }
        )


_EDGE_CELL_BUCKETS = 64


def _explode_buffered_cells(batch: pa.Table, z: int, eps_x: float, eps_y: float) -> pa.Table:
    """One row per covered fine-grid cell per eps-buffered feature
    bbox (the EdgeFinder cell cover, emitted as shuffle rows instead
    of a broadcast index — same vectorized cartesian explode as
    spatial_join._explode_footprints)."""
    fid = batch.column("feature_id").to_numpy()
    minx = batch.column("minx").to_numpy() - eps_x
    miny = batch.column("miny").to_numpy() - eps_y
    maxx = batch.column("maxx").to_numpy() + eps_x
    maxy = batch.column("maxy").to_numpy() + eps_y
    tx0, ty0, tx1, ty1 = T.tile_range(minx, miny, maxx, maxy, z)
    ny = (ty1 - ty0 + 1).astype(np.int64)
    reps = (tx1 - tx0 + 1).astype(np.int64) * ny
    row = np.repeat(np.arange(len(fid)), reps)
    offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
    tx = tx0[row] + offs // ny[row]
    ty = ty0[row] + offs % ny[row]
    cells = tx * np.int64(1 << z) + ty
    return pa.table(
        {
            "cell": pa.array(cells),
            "bucket": pa.array(hash_bucket(cells, _EDGE_CELL_BUCKETS)),
            "feature_id": pa.array(fid[row]),
            "minx": pa.array(minx[row]),
            "miny": pa.array(miny[row]),
            "maxx": pa.array(maxx[row]),
            "maxy": pa.array(maxy[row]),
        }
    )


def _cell_overlap_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Within one cell bucket: per equal-cell run, all-pairs closed
    bbox-overlap test on the (already eps-buffered) rects — the same
    keep predicate as EdgeFinder.__call__ (every touching pair shares
    at least one covered cell of either buffered bbox). Pairs repeat
    across cells/buckets; dedup_pairs_ds collapses them downstream."""
    cells = group["cell"].to_numpy()
    fid = group["feature_id"].to_numpy()
    minx = group["minx"].to_numpy()
    miny = group["miny"].to_numpy()
    maxx = group["maxx"].to_numpy()
    maxy = group["maxy"].to_numpy()
    order = np.lexsort((fid, cells))
    cells, fid = cells[order], fid[order]
    minx, miny, maxx, maxy = minx[order], miny[order], maxx[order], maxy[order]
    m = len(cells)
    starts = np.concatenate([[0], np.nonzero(np.diff(cells))[0] + 1, [m]]).astype(np.int64)
    lens = np.diff(starts)
    # ragged all-pairs over equal-cell runs, fully vectorized: element
    # j (global) pairs with every earlier element of ITS run -> j is
    # repeated `within[j]` times, its partners are the run prefix
    run_start = np.repeat(starts[:-1], lens)
    within = np.arange(m, dtype=np.int64) - run_start
    total = int(within.sum())
    if total == 0:
        return pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
        )
    jj = np.repeat(np.arange(m, dtype=np.int64), within)
    base = np.cumsum(within) - within
    ii = np.arange(total, dtype=np.int64) - np.repeat(base, within) + np.repeat(
        run_start, within
    )
    keep = (
        (minx[ii] <= maxx[jj])
        & (minx[jj] <= maxx[ii])
        & (miny[ii] <= maxy[jj])
        & (miny[jj] <= maxy[ii])
        & (fid[ii] != fid[jj])
    )
    return pd.DataFrame(
        {
            "a": np.minimum(fid[ii[keep]], fid[jj[keep]]),
            "b": np.maximum(fid[ii[keep]], fid[jj[keep]]),
        }
    )


def _edges_shuffle(feet_ds, z: int, eps_x: float, eps_y: float):
    """Distributed edge detection with NO broadcast index: explode
    each buffered bbox to its covered fine-grid cells, co-partition by
    cell bucket, emit overlap edges per cell group, dedupe pairs with
    the bucketed lexsort idiom — the 100x-corpus path (the footprint
    table never lands on the driver or in an actor broadcast)."""
    import functools

    from robosat_ray.stages.neardup import dedup_pairs_ds

    zz = z + 3  # same fine grid as the broadcast EdgeFinder
    rows = feet_ds.map_batches(
        functools.partial(_explode_buffered_cells, z=zz, eps_x=eps_x, eps_y=eps_y),
        batch_format="pyarrow",
    )
    cand = rows.groupby("bucket").map_groups(
        _cell_overlap_pairs, batch_format="pandas"
    )
    return dedup_pairs_ds(cand)


def merge_components(
    feet_ds,
    feet_table: pa.Table,
    z: int = C.Z_JOIN,
    eps_x: float = C.MERGE_EPS_X,
    eps_y: float = C.MERGE_EPS_Y,
    edge_strategy: str = "auto",
):
    """-> Dataset (feature_id, component_id = min feature_id in its
    buffered-overlap component). Strategy switch on edge count: driver
    union-find + broadcast searchsorted attach below
    DRIVER_CC_EDGE_CAP, distributed label propagation + co-partition
    attach above (skew-safe: one giant component can't OOM a driver
    that never gathers the label map). edge_strategy switches the
    edge-detection plan: 'broadcast' (bbox index ray.put once) below
    MERGE_BROADCAST_FEET_CAP footprint rows, 'shuffle' (cell
    co-partition, no broadcast) above — both proven bit-equal."""
    mode, payload = _component_labels(
        feet_ds, feet_table, z, eps_x, eps_y, edge_strategy
    )
    if mode == "arrays":
        import ray

        pair_ref = ray.put(payload)

        def attach(batch: pa.Table) -> pa.Table:
            s, lab = ray.get(pair_ref)
            fids = batch.column("feature_id").to_numpy()
            out = lab[np.searchsorted(s, fids)]
            return pa.table(
                {"feature_id": pa.array(fids), "component_id": pa.array(out)}
            )

        return feet_ds.map_batches(attach, batch_format="pyarrow")
    return _copartition_attach(feet_ds, payload)


def _component_labels(feet_ds, feet_table, z, eps_x, eps_y, edge_strategy="auto"):
    """Edge detection + connected components. Returns
    ('arrays', (sorted_ids, labels)) when the edge list fits the
    driver cap (the (ids, labels) numpy pair is the same size as the
    already-broadcast feet table), else ('ds', labels_dataset) from
    the fully distributed path. Edge detection itself strategy-
    switches on footprint count (see merge_components docstring)."""
    import ray

    if edge_strategy == "auto":
        edge_strategy = (
            "broadcast"
            if feet_table.num_rows <= MERGE_BROADCAST_FEET_CAP
            else "shuffle"
        )
    if edge_strategy == "shuffle":
        edges = _edges_shuffle(feet_ds, z, eps_x, eps_y).materialize()
    else:
        ref = ray.put(feet_table)
        edges = feet_ds.map_batches(
            EdgeFinder, fn_constructor_args=(ref, z, eps_x, eps_y),
            batch_format="pyarrow", concurrency=(1, 8), num_cpus=1,
        ).materialize()  # edge list << data (may carry cross-batch
        # duplicate pairs — the min-label consumers are idempotent)

    if edges.count() <= DRIVER_CC_EDGE_CAP:
        et = edges.to_pandas()
        ids = feet_table.column("feature_id").to_numpy()
        ea = et["a"].to_numpy() if "a" in et.columns else np.array([], np.int64)
        eb = et["b"].to_numpy() if "b" in et.columns else np.array([], np.int64)
        return "arrays", min_label_arrays(ids, ea, eb)

    from robosat_ray.runtime.components import distributed_components

    nodes = feet_ds.map_batches(
        lambda b: pa.table({"node": b.column("feature_id")}),
        batch_format="pyarrow",
    )
    return "ds", distributed_components(nodes, edges)


_ATTACH_BUCKETS = 64


def _copartition_attach(feet_ds, labels_ds, columns=("feature_id",)):
    """(feature_id, <passthrough columns>) x (node, label) ->
    (<columns>, component_id) via ONE feature-bucket groupby join —
    no driver, no broadcast map. Roles are distinguished by a `__role`
    sentinel so passthrough columns ride the same shuffle instead of
    needing a second join."""
    columns = list(columns)

    def feet_rows(b: pa.Table) -> pa.Table:
        f = b.column("feature_id").to_numpy()
        t = b.select(columns)
        t = t.append_column("__label", pa.array(np.zeros(len(f), np.int64)))
        t = t.append_column("__role", pa.array(np.zeros(len(f), np.int8)))
        return t.append_column("bucket", pa.array(hash_bucket(f, _ATTACH_BUCKETS)))

    def label_rows(b: pa.Table) -> pa.Table:
        n = b.column("node").to_numpy()
        cols = {c: pa.array(np.zeros(len(n))) for c in columns if c != "feature_id"}
        t = pa.table({"feature_id": pa.array(n), **cols}).select(columns)
        t = t.append_column("__label", b.column("label"))
        t = t.append_column("__role", pa.array(np.ones(len(n), np.int8)))
        return t.append_column("bucket", pa.array(hash_bucket(n, _ATTACH_BUCKETS)))

    both = feet_ds.map_batches(feet_rows, batch_format="pyarrow").union(
        labels_ds.map_batches(label_rows, batch_format="pyarrow")
    )

    def join(group: pd.DataFrame) -> pd.DataFrame:
        lab = group[group["__role"] == 1]
        s = lab["feature_id"].to_numpy()
        order = np.argsort(s, kind="stable")
        s, lv = s[order], lab["__label"].to_numpy()[order]
        out = group[group["__role"] == 0].drop(
            columns=["__label", "__role", "bucket"], errors="ignore"
        ).copy()
        out["component_id"] = lv[np.searchsorted(s, out["feature_id"].to_numpy())]
        return out

    return both.groupby("bucket").map_groups(join, batch_format="pandas")


def rect_union_area(minx, miny, maxx, maxy) -> float:
    """Exact area of a union of axis-aligned rects via coordinate
    compression (x-slabs x y-interval merging)."""
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    xs = np.unique(np.concatenate([minx, maxx]))
    total = 0.0
    for x0, x1 in zip(xs[:-1], xs[1:]):
        m = (minx < x1) & (maxx > x0)
        if not m.any():
            continue
        ys = np.stack([miny[m], maxy[m]], axis=1)
        ys = ys[np.argsort(ys[:, 0])]
        covered = 0.0
        cur_lo, cur_hi = ys[0]
        for lo, hi in ys[1:]:
            if lo > cur_hi:
                covered += cur_hi - cur_lo
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        covered += cur_hi - cur_lo
        total += covered * (x1 - x0)
    return float(total)


def _tagged_feet(feet_ds, feet_table, z, eps_x, eps_y, columns, edge_strategy="auto"):
    """feet Dataset with component_id appended, plus a component-hash
    bucket for the per-component groupby. Broadcast searchsorted tag
    below the edge cap; co-partition join above it (no driver map)."""
    mode, payload = _component_labels(
        feet_ds, feet_table, z, eps_x, eps_y, edge_strategy
    )

    def bucketed(batch: pa.Table) -> pa.Table:
        c = batch.column("component_id").to_numpy()
        return batch.append_column("bucket", pa.array(hash_bucket(c, 64)))

    if mode == "arrays":
        import ray

        pair_ref = ray.put(payload)

        def tag(batch: pa.Table) -> pa.Table:
            s, lab = ray.get(pair_ref)
            fids = batch.column("feature_id").to_numpy()
            out = lab[np.searchsorted(s, fids)]
            return batch.select(columns).append_column("component_id", pa.array(out))

        tagged = feet_ds.map_batches(tag, batch_format="pyarrow")
        return tagged.map_batches(bucketed, batch_format="pyarrow")

    # ONE co-partition join carries the passthrough columns alongside
    # the label attach (previously two sequential joins shuffled every
    # feet row twice)
    joined = _copartition_attach(feet_ds, payload, columns=columns)
    return joined.map_batches(bucketed, batch_format="pyarrow")


def merge_unions(
    feet_ds,
    feet_table: pa.Table,
    z: int = C.Z_JOIN,
    eps_x: float = C.MERGE_EPS_X,
    eps_y: float = C.MERGE_EPS_Y,
    edge_strategy: str = "auto",
):
    """A5 invariants, oracle-checkable: per component — member count,
    member-bbox extent, exact union area of the member rects (as an
    int64 quantized at 1e-10, so the engine's slab-scan and the SQL
    oracle's island-scan summation orders can't flip a compared bit).
    Distributed per component via groupby; no driver materialization."""
    tagged = _tagged_feet(
        feet_ds, feet_table, z, eps_x, eps_y,
        ["feature_id", "minx", "miny", "maxx", "maxy"],
        edge_strategy,
    )

    def reduce_comp(group: pd.DataFrame) -> pd.DataFrame:
        # per-component bbox/count via sort + reduceat (no pandas
        # sub-groupby / per-component dict rows); only the exact
        # union-area slab scan stays per-component
        cids = group["component_id"].to_numpy(np.int64)
        minx = group["minx"].to_numpy(np.float64)
        miny = group["miny"].to_numpy(np.float64)
        maxx = group["maxx"].to_numpy(np.float64)
        maxy = group["maxy"].to_numpy(np.float64)
        order = np.argsort(cids, kind="stable")
        cids, minx, miny, maxx, maxy = (
            cids[order], minx[order], miny[order], maxx[order], maxy[order]
        )
        n = len(cids)
        if n == 0:
            return pd.DataFrame(
                {
                    "component_id": pd.Series([], dtype=np.int64),
                    "n_members": pd.Series([], dtype=np.int64),
                    "minx": pd.Series([], dtype=np.float64),
                    "miny": pd.Series([], dtype=np.float64),
                    "maxx": pd.Series([], dtype=np.float64),
                    "maxy": pd.Series([], dtype=np.float64),
                    "union_area_q": pd.Series([], dtype=np.int64),
                }
            )
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = cids[1:] != cids[:-1]
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], n)
        areas = np.empty(len(starts), dtype=np.int64)
        for k, (s, e) in enumerate(zip(starts, ends)):
            areas[k] = int(
                np.round(rect_union_area(minx[s:e], miny[s:e], maxx[s:e], maxy[s:e]) * 1e10)
            )
        return pd.DataFrame(
            {
                "component_id": cids[starts],
                "n_members": (ends - starts).astype(np.int64),
                "minx": np.minimum.reduceat(minx, starts),
                "miny": np.minimum.reduceat(miny, starts),
                "maxx": np.maximum.reduceat(maxx, starts),
                "maxy": np.maximum.reduceat(maxy, starts),
                "union_area_q": areas,
            }
        )

    return tagged.groupby("bucket").map_groups(reduce_comp, batch_format="pandas")


def merge_geometry(
    feet_ds,
    feet_table: pa.Table,
    z: int = C.Z_JOIN,
    eps_x: float = C.MERGE_EPS_X,
    eps_y: float = C.MERGE_EPS_Y,
    edge_strategy: str = "auto",
):
    """Full reference merge output (tools/merge.py:63-81): per
    component, the MERGED GEOMETRY — union of member rects buffered by
    the edge threshold (2*eps: EdgeFinder expands both sides by eps,
    so features join iff their gap <= 2*eps, the reference's
    `buffered(i).intersects(j)` with threshold 2*eps), eroded back by
    the same amount (exact rectilinear closing on compressed grids),
    rings oriented exterior-positive / holes-negative like the
    reference's `orient(merged, sign=1.0)`. Emits the ring geometry
    (same nested list layout as the footprints table) plus area and
    ring-count invariants. Runs per component inside map_groups —
    distributed, driver-free.

    All-rect components take the EXACT compressed-grid closing;
    components with any general (non-rect) member fall back to a
    deterministic raster closing over the member rings
    (geo/rectilinear.raster_closing_grid; error bounded by the cell
    size) and are flagged `exact = False`."""
    import ray

    from robosat_ray.geo.rectilinear import (
        closing_grid, raster_closing_grid, rings_area, trace_rings,
    )
    from robosat_ray.stages.dedupe import _rect_flags
    from robosat_ray.stages.spatial_join import _ring_buffers

    tagged = _tagged_feet(
        feet_ds, feet_table, z, eps_x, eps_y,
        ["feature_id", "minx", "miny", "maxx", "maxy"],
        edge_strategy,
    )
    tx, ty = 2.0 * eps_x, 2.0 * eps_y

    # broadcast ring geometry for the general-member fallback: sorted
    # ids + rect flags + flat ring buffers (rect components never
    # touch them — the exact compressed-grid path uses bboxes only)
    ft = feet_table.combine_chunks()
    sids = ft.column("feature_id").to_numpy()
    order = np.argsort(sids, kind="stable")
    fro, rpo, rxs, rys = _ring_buffers(ft.column("rings"))
    flags = _rect_flags(
        fro, rpo, rxs, rys,
        ft.column("minx").to_numpy(), ft.column("miny").to_numpy(),
        ft.column("maxx").to_numpy(), ft.column("maxy").to_numpy(),
    )
    geo_ref = ray.put((sids[order], order, flags, fro, rpo, rxs, rys))

    def _member_rings(prep, row_idx: int):
        _, _, _, fro, rpo, rxs, rys = prep
        return [
            (rxs[rpo[r] : rpo[r + 1]], rys[rpo[r] : rpo[r + 1]])
            for r in range(fro[row_idx], fro[row_idx + 1])
        ]

    def geom_comp(group: pd.DataFrame) -> pd.DataFrame:
        prep = ray.get(geo_ref)
        s, order, flags = prep[0], prep[1], prep[2]
        rows = []
        for cid, g in group.groupby("component_id", sort=False):
            fids = g["feature_id"].to_numpy()
            ridx = order[np.searchsorted(s, fids)]
            if bool(flags[ridx].all()):
                exact = True
                xs, ys, cov = closing_grid(
                    g["minx"].to_numpy(), g["miny"].to_numpy(),
                    g["maxx"].to_numpy(), g["maxy"].to_numpy(), tx, ty,
                )
            else:
                exact = False
                xs, ys, cov = raster_closing_grid(
                    [_member_rings(prep, int(i)) for i in ridx], tx, ty
                )
            rings = trace_rings(xs, ys, cov)
            signed = [
                0.5 * float(np.sum(rx[:-1] * ry[1:] - rx[1:] * ry[:-1]))
                for rx, ry in rings
            ]
            rows.append(
                {
                    "component_id": int(cid),
                    "n_members": len(g),
                    "n_polys": sum(1 for s in signed if s > 0),
                    "n_holes": sum(1 for s in signed if s < 0),
                    "n_vertices": sum(len(rx) - 1 for rx, _ in rings),
                    "merged_area": rings_area(rings),
                    "exact": exact,
                    "rings": [
                        [{"x": float(x), "y": float(y)} for x, y in zip(rx, ry)]
                        for rx, ry in rings
                    ],
                }
            )
        return pd.DataFrame(rows).astype(
            {
                "component_id": np.int64,
                "n_members": np.int64,
                "n_polys": np.int64,
                "n_holes": np.int64,
                "n_vertices": np.int64,
            }
        )

    return tagged.groupby("bucket").map_groups(geom_comp, batch_format="pandas")


def _candidate_cuts(vmin: np.ndarray, vmax: np.ndarray, t: float) -> np.ndarray:
    """Candidate result-grid cut values for one component along one
    axis: member bbox coords plus their ±2t closing offsets, snapped to
    original coordinates (the same _snap_vals rule closing_grid uses)
    and clipped to the snapped shrunk frame. By construction this is a
    SUPERSET of the closing result's cut set, so every candidate cell
    is wholly inside or outside the merged geometry — cell-center
    membership serializes the geometry exactly. Mirrored bit-for-bit
    by the MERGE_RING_CELLS SQL oracle."""
    from robosat_ray.geo.rectilinear import _snap_vals

    orig = np.concatenate([vmin, vmax])
    g0 = _snap_vals(np.array([(vmin - t).min() + t]), orig)[0]
    g1 = _snap_vals(np.array([(vmax + t).max() - t]), orig)[0]
    if g0 >= g1:
        return np.empty(0, dtype=np.float64)
    raw = np.concatenate([vmin, vmax, (vmin - t) - t, (vmax + t) + t])
    return np.unique(np.clip(_snap_vals(raw, orig), g0, g1))


def _pip_grid_even_odd(ccx: np.ndarray, ccy: np.ndarray, rings) -> np.ndarray:
    """Even-odd membership of a GRID of probe points (ccx x ccy) vs
    closed rectilinear rings: per probe row, the active vertical
    segments' x's are sorted once and each probe column resolves with
    one searchsorted (+x ray parity) — O(ny * (S + nx log S)), never
    points-x-segments. Probes are cell centers, never on cut lines, so
    there are no boundary ties. Returns bool (len(ccx), len(ccy))."""
    vx_p, vy0_p, vy1_p = [], [], []
    for rx, ry in rings:
        x0, y0, x1, y1 = rx[:-1], ry[:-1], rx[1:], ry[1:]
        vert = x0 == x1
        if vert.any():
            vx_p.append(x0[vert])
            vy0_p.append(np.minimum(y0[vert], y1[vert]))
            vy1_p.append(np.maximum(y0[vert], y1[vert]))
    inside = np.zeros((len(ccx), len(ccy)), dtype=bool)
    if not vx_p:
        return inside
    vx = np.concatenate(vx_p)
    vy0 = np.concatenate(vy0_p)
    vy1 = np.concatenate(vy1_p)
    for j, yc in enumerate(ccy):
        xs = np.sort(vx[(vy0 <= yc) & (yc < vy1)])
        cnt = len(xs) - np.searchsorted(xs, ccx)
        inside[:, j] = (cnt & 1).astype(bool)
    return inside


# verification-size cap for merge_ring_cells (see its docstring)
MERGE_CELLS_MEMBER_CAP = 256


def merge_ring_cells(
    feet_ds,
    feet_table: pa.Table,
    z: int = C.Z_JOIN,
    eps_x: float = C.MERGE_EPS_X,
    eps_y: float = C.MERGE_EPS_Y,
    member_cap: int = MERGE_CELLS_MEMBER_CAP,
    edge_strategy: str = "auto",
):
    """Hash-hard serialization of the merge_geometry RING OUTPUT: per
    component, the candidate compressed grid (member bbox cuts ± the
    closing offsets) with each cell's even-odd membership AGAINST THE
    TRACED OUTPUT RINGS. Because the candidate cuts are a superset of
    the result cuts, the (cell, inside) rows determine the merged
    geometry 1:1 — the MERGE_RING_CELLS oracle derives the same rows
    from the dilate/erode set rule without ever tracing rings, so a
    sorted value-hash match pins the ring geometry exactly (reference
    chain: robosat/tools/merge.py:63-81). Exact for rectilinear
    members (the synth corpus); rows: (component_id, x0q, y0q, x1q,
    y1q, inside) with bounds quantized at 1e-10.

    The serialization is quadratic in member count (candidate cells ~
    (4n)^2), so it CAPS at MERGE_CELLS_MEMBER_CAP members — mirrored
    by the oracle's HAVING COUNT(*) <= cap — keeping the verification
    query bounded at any corpus scale (a whole-city 1500-member
    component would alone emit 36M rows). Components above the cap
    remain pinned by the merge_unions exact-area/bbox and
    merge_components oracles, which have no size cap."""
    from robosat_ray.geo.rectilinear import closing_grid, trace_rings

    tagged = _tagged_feet(
        feet_ds, feet_table, z, eps_x, eps_y,
        ["feature_id", "minx", "miny", "maxx", "maxy"],
        edge_strategy,
    )
    tx, ty = 2.0 * eps_x, 2.0 * eps_y

    def cells_comp(group: pd.DataFrame) -> pd.DataFrame:
        out = {
            "component_id": [], "x0q": [], "y0q": [], "x1q": [], "y1q": [],
            "inside": [],
        }
        for cid, g in group.groupby("component_id", sort=False):
            if len(g) > member_cap:
                continue
            minx = g["minx"].to_numpy()
            miny = g["miny"].to_numpy()
            maxx = g["maxx"].to_numpy()
            maxy = g["maxy"].to_numpy()
            cxs = _candidate_cuts(minx, maxx, tx)
            cys = _candidate_cuts(miny, maxy, ty)
            if len(cxs) < 2 or len(cys) < 2:
                continue
            xs, ys, cov = closing_grid(minx, miny, maxx, maxy, tx, ty)
            rings = trace_rings(xs, ys, cov)
            ccx = 0.5 * (cxs[:-1] + cxs[1:])
            ccy = 0.5 * (cys[:-1] + cys[1:])
            inside = _pip_grid_even_odd(ccx, ccy, rings).ravel()
            bx0, by0 = np.meshgrid(cxs[:-1], cys[:-1], indexing="ij")
            bx1, by1 = np.meshgrid(cxs[1:], cys[1:], indexing="ij")
            n = inside.size
            out["component_id"].append(np.full(n, int(cid), dtype=np.int64))
            out["x0q"].append(np.floor(bx0.ravel() * 1e10 + 0.5).astype(np.int64))
            out["y0q"].append(np.floor(by0.ravel() * 1e10 + 0.5).astype(np.int64))
            out["x1q"].append(np.floor(bx1.ravel() * 1e10 + 0.5).astype(np.int64))
            out["y1q"].append(np.floor(by1.ravel() * 1e10 + 0.5).astype(np.int64))
            out["inside"].append(inside.astype(np.int64))
        if not out["component_id"]:
            return pd.DataFrame(
                {k: pd.Series([], dtype=np.int64) for k in out}
            )
        return pd.DataFrame({k: np.concatenate(v) for k, v in out.items()})

    return tagged.groupby("bucket").map_groups(cells_comp, batch_format="pandas")
