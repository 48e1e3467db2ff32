"""Dedupe stage: IoU-threshold near-duplicate suppression of predicted
shapes against a reference footprint set (SURVEY.md J7/O4; reference
robosat/tools/dedupe.py:30-73 — rtree over ALL OSM shapes in driver
RAM, per predicted shape keep iff no bbox hit, no intersection, or
IoU < threshold).

Engine semantics (matches the reference rule): keep a predicted shape
iff it has no positively-intersecting reference shapes, or
IoU(pred, union(intersecting reference shapes)) < threshold
(reference tools/dedupe.py:56-67: `functools.reduce(union,
intersecting)` then `iou(pred, union)`). "Intersecting" here means
positive-area overlap; the reference's shapely `.intersects` also
counts measure-zero boundary touches, which cannot change the IoU
numerator but can enlarge the union denominator — the synthetic
corpus has no exact boundary touches, so the two predicates agree on
it. Union areas: coordinate-compression scanline for all-rect
neighborhoods (exact, any k), inclusion-exclusion over intersector
subsets with empty-subset pruning for general polygons
(geo/clip.union_iou).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from robosat_ray import constants as C
from robosat_ray.geo import tiles as T
from robosat_ray.geo.clip import union_iou
from robosat_ray.stages.spatial_join import _ring_buffers


def _feature_areas(fro, rpo, rxs, rys) -> np.ndarray:
    """Vectorized per-feature polygon area (exterior minus holes) from
    the flat ring buffers: per-ring shoelace via a prefix sum of cross
    terms, then signed reduceat by feature."""
    if len(fro) <= 1:
        return np.zeros(0, dtype=np.float64)
    cross = rxs[:-1] * rys[1:] - rxs[1:] * rys[:-1]
    cs = np.concatenate([[0.0], np.cumsum(cross)])
    # rings are closed (first == last): sum cross over [a, b-2]
    ring_area = 0.5 * (cs[rpo[1:] - 1] - cs[rpo[:-1]])
    sgn = np.full(len(ring_area), -1.0)
    sgn[fro[:-1]] = 1.0  # first ring of each feature is the exterior
    return np.add.reduceat(np.abs(ring_area) * sgn, fro[:-1])


def _rect_union_areas(px0, py0, px1, py1, fx0, fy0, fx1, fy1):
    """(area(U), area(pred ∩ U)) for a rect pred and rect intersectors
    — cover grid + union area from geo.rectilinear (one kernel, not a
    clone), plus the pred-clipped cell sum for the intersection."""
    from robosat_ray.geo.rectilinear import grid_area, union_cover_grid

    xs, ys, cov = union_cover_grid(fx0, fy0, fx1, fy1)
    area_u = grid_area(xs, ys, cov)
    cwx = np.maximum(np.minimum(xs[1:], px1) - np.maximum(xs[:-1], px0), 0.0)
    cwy = np.maximum(np.minimum(ys[1:], py1) - np.maximum(ys[:-1], py0), 0.0)
    inter = float((np.outer(cwx, cwy)[cov]).sum())
    return area_u, inter


def _rect_flags(fro, rpo, rxs, rys, minx, miny, maxx, maxy) -> np.ndarray:
    """Which features are single-ring axis-aligned rects (ring == its
    own bbox)? Those take the exact vectorized IoU path. Fully
    vectorized (no per-feature Python)."""
    n = len(fro) - 1
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    fro = np.asarray(fro)
    rpo = np.asarray(rpo)
    nrings = np.diff(fro)
    first = rpo[fro[:-1]]
    npts = rpo[fro[:-1] + 1] - first
    cand = np.nonzero((nrings == 1) & (npts == 5))[0]
    if len(cand) == 0:
        return out
    offs = first[cand][:, None] + np.arange(5)[None, :]
    X = rxs[offs]
    Y = rys[offs]
    mnx, mxx = minx[cand][:, None], maxx[cand][:, None]
    mny, mxy = miny[cand][:, None], maxy[cand][:, None]
    ok = (
        ((X == mnx) | (X == mxx)).all(axis=1)
        & ((Y == mny) | (Y == mxy)).all(axis=1)
        & (X.min(axis=1) == minx[cand]) & (X.max(axis=1) == maxx[cand])
        & (Y.min(axis=1) == miny[cand]) & (Y.max(axis=1) == maxy[cand])
    )
    out[cand] = ok
    return out


def _feature_bboxes(fro, rpo, rxs, rys):
    """Vectorized per-feature bbox from the flat ring buffers."""
    fro = np.asarray(fro)
    rpo = np.asarray(rpo)
    if len(fro) <= 1:
        z = np.zeros(0)
        return z, z, z, z
    starts = rpo[fro[:-1]]
    minx = np.minimum.reduceat(rxs, starts)
    maxx = np.maximum.reduceat(rxs, starts)
    miny = np.minimum.reduceat(rys, starts)
    maxy = np.maximum.reduceat(rys, starts)
    return minx, miny, maxx, maxy


class DedupeProber:
    """Broadcast per-cell index over reference footprints; per batch of
    predicted shapes computes max pairwise IoU and filters."""

    def __init__(self, feet_ref, z: int, threshold: float):
        import ray

        feet = ray.get(feet_ref) if not isinstance(feet_ref, pa.Table) else feet_ref
        feet = feet.combine_chunks()
        self.threshold = threshold
        self.minx = feet.column("minx").to_numpy()
        self.miny = feet.column("miny").to_numpy()
        self.maxx = feet.column("maxx").to_numpy()
        self.maxy = feet.column("maxy").to_numpy()
        fro, rpo, rxs, rys = _ring_buffers(feet.column("rings"))
        self.rings = (fro, rpo, rxs, rys)
        self.f_area = _feature_areas(fro, rpo, rxs, rys)
        self.f_is_rect = _rect_flags(fro, rpo, rxs, rys, self.minx, self.miny, self.maxx, self.maxy)
        self.z = z + 3
        tx0, ty0, tx1, ty1 = T.tile_range(self.minx, self.miny, self.maxx, self.maxy, self.z)
        ny = (ty1 - ty0 + 1).astype(np.int64)
        reps = (tx1 - tx0 + 1).astype(np.int64) * ny
        row = np.repeat(np.arange(len(self.minx)), reps)
        offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
        tx = tx0[row] + offs // ny[row]
        ty = ty0[row] + offs % ny[row]
        cells = tx * np.int64(1 << self.z) + ty
        order = np.argsort(cells, kind="stable")
        self.copy_cell = cells[order]
        self.copy_feat = row[order]
        self.cell_uniq, first = np.unique(self.copy_cell, return_index=True)
        self.cell_off = np.append(first, len(self.copy_cell))

    def _feature_rings(self, fi: int):
        fro, rpo, rxs, rys = self.rings
        out = []
        for r in range(fro[fi], fro[fi + 1]):
            a, b = rpo[r], rpo[r + 1]
            out.append((rxs[a:b], rys[a:b]))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        pid = batch.column("pred_id").to_numpy()
        pminx = batch.column("minx").to_numpy()
        pminy = batch.column("miny").to_numpy()
        pmaxx = batch.column("maxx").to_numpy()
        pmaxy = batch.column("maxy").to_numpy()
        pfro, prpo, prxs, prys = _ring_buffers(batch.column("rings"))

        # candidate (pred, ref) pairs via the cell index
        tx0, ty0, tx1, ty1 = T.tile_range(pminx, pminy, pmaxx, pmaxy, self.z)
        ny = (ty1 - ty0 + 1).astype(np.int64)
        reps = (tx1 - tx0 + 1).astype(np.int64) * ny
        row = np.repeat(np.arange(len(pid)), reps)
        offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
        tx = tx0[row] + offs // ny[row]
        ty = ty0[row] + offs % ny[row]
        cells = tx * np.int64(1 << self.z) + ty
        if len(self.cell_uniq):
            pos = np.clip(np.searchsorted(self.cell_uniq, cells), 0, len(self.cell_uniq) - 1)
            hit = self.cell_uniq[pos] == cells
        else:
            pos = np.zeros(len(cells), dtype=np.int64)
            hit = np.zeros(len(cells), dtype=bool)
        prow = row[hit]
        slot = pos[hit]
        cnt = self.cell_off[slot + 1] - self.cell_off[slot]
        tot = int(cnt.sum())
        pair_p = np.repeat(prow, cnt)
        copy_i = (
            np.arange(tot)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
            + np.repeat(self.cell_off[slot], cnt)
        )
        fi = self.copy_feat[copy_i]
        keep = (
            (self.minx[fi] < pmaxx[pair_p])
            & (pminx[pair_p] < self.maxx[fi])
            & (self.miny[fi] < pmaxy[pair_p])
            & (pminy[pair_p] < self.maxy[fi])
        )
        pair_p = pair_p[keep]
        fi = fi[keep]
        # dedupe (pred, ref) pairs seen via multiple cells
        key = pair_p * np.int64(1 << 32) + fi
        _, ki = np.unique(key, return_index=True)
        pair_p, fi = pair_p[ki], fi[ki]

        # Union-IoU rule, pruned first with a vectorized per-pred upper
        # bound: inter(pred, U) <= Σ_i min(bbox_inter_i, |f_i|) and
        # <= |pred|; union(pred, U) >= |pred|, and for every PROVABLY
        # intersecting pair (rect x rect with positive bbox overlap)
        # also >= |pred| + |f_i| - inter_cap_i. ub < threshold => the
        # true IoU is < threshold => keep without the exact kernel.
        n = len(pid)
        ix = np.maximum(
            0.0,
            np.minimum(pmaxx[pair_p], self.maxx[fi]) - np.maximum(pminx[pair_p], self.minx[fi]),
        )
        iy = np.maximum(
            0.0,
            np.minimum(pmaxy[pair_p], self.maxy[fi]) - np.maximum(pminy[pair_p], self.miny[fi]),
        )
        bbox_inter = ix * iy
        p_area = _feature_areas(pfro, prpo, prxs, prys)
        bminx, bminy, bmaxx, bmaxy = _feature_bboxes(pfro, prpo, prxs, prys)
        p_is_rect = _rect_flags(pfro, prpo, prxs, prys, bminx, bminy, bmaxx, bmaxy)
        cap = np.minimum(bbox_inter, self.f_area[fi])
        sum_cap = np.bincount(pair_p, weights=cap, minlength=n)
        # denominator: max over provable pairs of |p| + |f| - cap
        denom = p_area.copy()
        provable = p_is_rect[pair_p] & self.f_is_rect[fi] & (bbox_inter > 0.0)
        if provable.any():
            dp = p_area[pair_p[provable]] + self.f_area[fi[provable]] - cap[provable]
            np.maximum.at(denom, pair_p[provable], dp)
        ub = np.minimum(sum_cap, p_area) / np.maximum(denom, 1e-300)
        iou_val = np.zeros(n, dtype=np.float64)
        # pair_p is sorted ascending (np.unique on pred-major keys)
        starts = np.searchsorted(pair_p, np.arange(n))
        ends = np.searchsorted(pair_p, np.arange(n), side="right")
        for p_local in np.nonzero(ub >= self.threshold)[0]:
            sl = slice(starts[p_local], ends[p_local])
            fis = fi[sl]
            binter = bbox_inter[sl]
            if p_is_rect[p_local] and bool(self.f_is_rect[fis].all()):
                # rect x rect: bbox intersection IS the intersection
                m = binter > 0.0
                if not m.any():
                    continue
                sel = fis[m]
                if len(sel) == 1:
                    # single intersector: closed form, no scanline
                    area_u = self.f_area[sel[0]]
                    inter_u = binter[m][0]
                else:
                    area_u, inter_u = _rect_union_areas(
                        pminx[p_local], pminy[p_local], pmaxx[p_local], pmaxy[p_local],
                        self.minx[sel], self.miny[sel], self.maxx[sel], self.maxy[sel],
                    )
            else:
                pr = [
                    (prxs[prpo[r] : prpo[r + 1]], prys[prpo[r] : prpo[r + 1]])
                    for r in range(pfro[p_local], pfro[p_local + 1])
                ]
                # bbox-positive candidates only; union_iou's own
                # inclusion-exclusion handles non-intersectors exactly
                # (their terms are 0), so no pre-pass with the clip
                # kernel — that would run the expensive triangulation
                # twice per intersector
                inters = [
                    self._feature_rings(int(f))
                    for f, bi in zip(fis, binter)
                    if bi > 0.0
                ]
                if not inters:
                    continue
                iou_val[p_local] = union_iou(pr, inters)
                continue
            union = p_area[p_local] + area_u - inter_u
            iou_val[p_local] = inter_u / union if union > 0 else 0.0
        survivors = iou_val < self.threshold
        return pa.table(
            {
                "pred_id": pa.array(pid[survivors]),
            }
        )


def dedupe_survivors(
    pred_ds,
    feet_table: pa.Table,
    z: int = C.Z_JOIN,
    threshold: float = C.DEDUPE_IOU_THRESHOLD,
    strategy: str = "auto",
    feet_ds=None,
):
    """strategy: 'broadcast' (reference table ray.put once, per-actor
    cell index — right while the OSM side fits a worker heap),
    'shuffle' (cell co-partition, no broadcast — the path for a
    corpus-scale reference side), or 'auto' by reference row count vs
    DEDUPE_BROADCAST_FEET_CAP. Both proven bit-equal
    (tests/test_union_iou.py strategy-flip test)."""
    import ray

    if strategy == "auto":
        strategy = (
            "broadcast"
            if feet_table.num_rows <= DEDUPE_BROADCAST_FEET_CAP
            else "shuffle"
        )
    if strategy == "shuffle":
        import ray.data

        return dedupe_survivors_shuffle(
            pred_ds,
            feet_ds if feet_ds is not None else ray.data.from_arrow(feet_table),
            z,
            threshold,
        )

    ref = ray.put(feet_table)
    return pred_ds.map_batches(
        DedupeProber,
        fn_constructor_args=(ref, z, threshold),
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )


# predicted-shape rows above which... actually the BROADCAST side here
# is the REFERENCE footprint table (external, usually bounded); the
# switch exists so a corpus-scale reference side can't OOM the workers
# (VERDICT r3: "no shuffle fallback; add the same strategy switch for
# symmetry" with merge/flagship).
DEDUPE_BROADCAST_FEET_CAP = 2_000_000
_DD_BUCKETS = 64


def _explode_geom_cells(batch: pa.Table, id_col: str, zz: int, role: int) -> pa.Table:
    """One row per covered zz-cell per shape, carrying the full
    geometry payload (bbox + rings) — the co-partition transport for
    the shuffle dedupe."""
    from robosat_ray.functions.hashing import hash_bucket

    minx = batch.column("minx").to_numpy()
    miny = batch.column("miny").to_numpy()
    maxx = batch.column("maxx").to_numpy()
    maxy = batch.column("maxy").to_numpy()
    tx0, ty0, tx1, ty1 = T.tile_range(minx, miny, maxx, maxy, zz)
    ny = (ty1 - ty0 + 1).astype(np.int64)
    reps = (tx1 - tx0 + 1).astype(np.int64) * ny
    row = np.repeat(np.arange(len(minx)), reps)
    offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
    tx = tx0[row] + offs // ny[row]
    ty = ty0[row] + offs % ny[row]
    cells = tx * np.int64(1 << zz) + ty
    taken = batch.take(pa.array(row))
    return pa.table(
        {
            "cell": pa.array(cells),
            "cbucket": pa.array(hash_bucket(cells, _DD_BUCKETS)),
            "role": pa.array(np.full(len(cells), role, np.int8)),
            "id": taken.column(id_col),
            "minx": taken.column("minx"),
            "miny": taken.column("miny"),
            "maxx": taken.column("maxx"),
            "maxy": taken.column("maxy"),
            "rings": taken.column("rings"),
        }
    )


def _cell_pairs_group(t: pa.Table) -> pa.Table:
    """Within one cell bucket: per equal-cell run, (pred x ref) pairs
    with strictly-positive bbox overlap (the DedupeProber keep
    predicate) -> REF payload rows keyed by pred_id + pred-hash bucket.
    Pairs repeat across cells; the pred-side group uniquifies."""
    from robosat_ray.functions.hashing import hash_bucket

    cells = t.column("cell").to_numpy()
    role = t.column("role").to_numpy()
    ids = t.column("id").to_numpy()
    minx = t.column("minx").to_numpy()
    miny = t.column("miny").to_numpy()
    maxx = t.column("maxx").to_numpy()
    maxy = t.column("maxy").to_numpy()
    order = np.lexsort((role, ids, cells))
    cells_s, role_s, ids_s = cells[order], role[order], ids[order]
    m = len(cells_s)
    starts = np.concatenate([[0], np.nonzero(np.diff(cells_s))[0] + 1, [m]]).astype(np.int64)
    lens = np.diff(starts)
    run_start = np.repeat(starts[:-1], lens)
    within = np.arange(m, dtype=np.int64) - run_start
    total = int(within.sum())
    empty = pa.table(
        {
            "pbucket": pa.array([], pa.int64()),
            "pred_id": pa.array([], pa.int64()),
            "role": pa.array([], pa.int8()),
            "id": pa.array([], pa.int64()),
            "minx": pa.array([], pa.float64()),
            "miny": pa.array([], pa.float64()),
            "maxx": pa.array([], pa.float64()),
            "maxy": pa.array([], pa.float64()),
            "rings": pa.array([], t.column("rings").type),
        }
    )
    if total == 0:
        return empty
    jj = np.repeat(np.arange(m, dtype=np.int64), within)
    base = np.cumsum(within) - within
    ii = np.arange(total, dtype=np.int64) - np.repeat(base, within) + np.repeat(
        run_start, within
    )
    oi, oj = order[ii], order[jj]
    # one side pred (role 1), the other ref (role 0); open-interval
    # bbox overlap, matching DedupeProber.__call__'s keep
    is_pair = role[oi] != role[oj]
    keep = (
        is_pair
        & (minx[oi] < maxx[oj])
        & (minx[oj] < maxx[oi])
        & (miny[oi] < maxy[oj])
        & (miny[oj] < maxy[oi])
    )
    oi, oj = oi[keep], oj[keep]
    pred_idx = np.where(role[oi] == 1, oi, oj)
    ref_idx = np.where(role[oi] == 1, oj, oi)
    pred_ids = ids[pred_idx]
    taken = t.take(pa.array(ref_idx))
    return pa.table(
        {
            "pbucket": pa.array(hash_bucket(pred_ids, _DD_BUCKETS)),
            "pred_id": pa.array(pred_ids),
            "role": pa.array(np.zeros(len(pred_ids), np.int8)),
            "id": taken.column("id"),
            "minx": taken.column("minx"),
            "miny": taken.column("miny"),
            "maxx": taken.column("maxx"),
            "maxy": taken.column("maxy"),
            "rings": taken.column("rings"),
        }
    )


def _survivors_group(t: pa.Table, z: int, threshold: float) -> pa.Table:
    """Within one pred bucket: preds (role 1 carriers) + every
    candidate ref of every pred in the bucket (role 0, possibly
    repeated). Builds a local feet sub-table from the unique refs and
    runs the UNCHANGED DedupeProber kernel over the preds — bit-equal
    to the broadcast path by construction (every positively-
    intersecting ref shares a covered cell with its pred, so it is in
    this bucket; extra refs pair with no cell of a given pred or fail
    the same keep tests)."""
    role = t.column("role").to_numpy()
    ids = t.column("id").to_numpy()
    pred_rows = np.nonzero(role == 1)[0]
    if len(pred_rows) == 0:
        return pa.table({"pred_id": pa.array([], pa.int64())})
    ref_rows = np.nonzero(role == 0)[0]
    _, uniq = np.unique(ids[ref_rows], return_index=True)
    feet = t.take(pa.array(ref_rows[uniq])).select(
        ["minx", "miny", "maxx", "maxy", "rings"]
    )
    _, uniq_p = np.unique(ids[pred_rows], return_index=True)
    preds = t.take(pa.array(pred_rows[uniq_p]))
    pred_batch = pa.table(
        {
            "pred_id": preds.column("id"),
            "minx": preds.column("minx"),
            "miny": preds.column("miny"),
            "maxx": preds.column("maxx"),
            "maxy": preds.column("maxy"),
            "rings": preds.column("rings"),
        }
    )
    prober = DedupeProber(feet.combine_chunks(), z, threshold)
    return prober(pred_batch)


def dedupe_survivors_shuffle(
    pred_ds, feet_ds, z: int = C.Z_JOIN, threshold: float = C.DEDUPE_IOU_THRESHOLD
):
    """Shuffle-plan dedupe: NO broadcast reference table. Both sides
    explode to covered z+3 cells (geometry payload rides the shuffle),
    candidate (pred, ref) pairs form per cell bucket, then every pred
    regroups with ALL its candidate refs on a pred-hash bucket and the
    unchanged union-IoU kernel decides. Left-outer semantics: pred
    carrier rows always reach the pred bucket, so preds with no
    candidates survive."""
    zz = z + 3
    feet_cells = feet_ds.map_batches(
        lambda b: _explode_geom_cells(b, "feature_id", zz, role=0),
        batch_format="pyarrow",
    )
    pred_cells = pred_ds.map_batches(
        lambda b: _explode_geom_cells(b, "pred_id", zz, role=1),
        batch_format="pyarrow",
    )
    pairs = (
        pred_cells.union(feet_cells)
        .groupby("cbucket")
        .map_groups(_cell_pairs_group, batch_format="pyarrow")
    )

    def pred_carriers(batch: pa.Table) -> pa.Table:
        from robosat_ray.functions.hashing import hash_bucket

        pid = batch.column("pred_id").to_numpy()
        n = len(pid)
        return pa.table(
            {
                "pbucket": pa.array(hash_bucket(pid, _DD_BUCKETS)),
                "pred_id": pa.array(pid),
                "role": pa.array(np.ones(n, np.int8)),
                "id": pa.array(pid),
                "minx": batch.column("minx"),
                "miny": batch.column("miny"),
                "maxx": batch.column("maxx"),
                "maxy": batch.column("maxy"),
                "rings": batch.column("rings"),
            }
        )

    carriers = pred_ds.map_batches(pred_carriers, batch_format="pyarrow")
    import functools

    return (
        pairs.union(carriers)
        .groupby("pbucket")
        .map_groups(
            functools.partial(_survivors_group, z=z, threshold=threshold),
            batch_format="pyarrow",
        )
    )
