"""Dedupe stage: IoU-threshold near-duplicate suppression of predicted
shapes against a reference footprint set (SURVEY.md J7/O4; reference
robosat/tools/dedupe.py:30-73 — rtree over ALL OSM shapes in driver
RAM, per predicted shape keep iff no bbox hit, no intersection, or
IoU < threshold).

Engine semantics: keep a predicted shape iff its max pairwise IoU
against any bbox-intersecting reference shape is < threshold (equal to
the reference's IoU-vs-union when intersectors don't overlap each
other, which the synthetic corpus guarantees; the union variant is
available via geo.clip inclusion-exclusion). IoU is computed with the
general polygon kernel (ear-clip triangulation + convex clipping) on
the ring geometry — not a rect fast path — so the code path matches
arbitrary polygons.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from robosat_ray import constants as C
from robosat_ray.geo import tiles as T
from robosat_ray.geo.clip import iou
from robosat_ray.stages.spatial_join import _ring_buffers


def _rect_flags(fro, rpo, rxs, rys, minx, miny, maxx, maxy) -> np.ndarray:
    """Which features are single-ring axis-aligned rects (ring == its
    own bbox)? Those take the exact vectorized IoU path."""
    n = len(fro) - 1
    out = np.zeros(n, dtype=bool)
    for i in range(n):
        if fro[i + 1] - fro[i] != 1:
            continue
        a, b = rpo[fro[i]], rpo[fro[i] + 1]
        if b - a != 5:
            continue
        xs = rxs[a:b]
        ys = rys[a:b]
        if (
            set(np.unique(xs)) == {minx[i], maxx[i]}
            and set(np.unique(ys)) == {miny[i], maxy[i]}
        ):
            out[i] = True
    return out


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

    _pred_rect_cache: dict | None = None

    def _pred_is_rect(self, pfro, prpo, prxs, prys, p_local: int) -> bool:
        if self._pred_rect_cache is None or self._pred_rect_cache.get("fro") is not pfro:
            n = len(pfro) - 1
            minx = np.array([prxs[prpo[pfro[i]] : prpo[pfro[i] + 1]].min() for i in range(n)])
            maxx = np.array([prxs[prpo[pfro[i]] : prpo[pfro[i] + 1]].max() for i in range(n)])
            miny = np.array([prys[prpo[pfro[i]] : prpo[pfro[i] + 1]].min() for i in range(n)])
            maxy = np.array([prys[prpo[pfro[i]] : prpo[pfro[i] + 1]].max() for i in range(n)])
            self._pred_rect_cache = {
                "fro": pfro,
                "flags": _rect_flags(pfro, prpo, prxs, prys, minx, miny, maxx, maxy),
            }
        return bool(self._pred_rect_cache["flags"][p_local])

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

        # IoU per candidate pair: an UPPER BOUND prunes first
        # (inter <= bbox-inter, union >= max area => ub >= true IoU);
        # only pairs whose bound reaches the threshold get the exact
        # general-polygon kernel. For axis-aligned rects the bound IS
        # exact, so the survivor set is identical either way (tested).
        ix = np.maximum(
            0.0,
            np.minimum(pmaxx[pair_p], self.maxx[fi]) - np.maximum(pminx[pair_p], self.minx[fi]),
        )
        iy = np.maximum(
            0.0,
            np.minimum(pmaxy[pair_p], self.maxy[fi]) - np.maximum(pminy[pair_p], self.miny[fi]),
        )
        bbox_inter = ix * iy
        area_p = (pmaxx[pair_p] - pminx[pair_p]) * (pmaxy[pair_p] - pminy[pair_p])
        area_f = (self.maxx[fi] - self.minx[fi]) * (self.maxy[fi] - self.miny[fi])
        ub = bbox_inter / np.maximum(np.maximum(area_p, area_f), 1e-300)
        max_iou = np.zeros(len(pid), dtype=np.float64)
        need = np.nonzero(ub >= self.threshold)[0]
        for idx in need:
            p_local = pair_p[idx]
            f_local = fi[idx]
            if self.f_is_rect[f_local] and self._pred_is_rect(pfro, prpo, prxs, prys, p_local):
                inter = bbox_inter[idx]
                v = inter / (area_p[idx] + area_f[idx] - inter)
            else:
                pr = [
                    (prxs[prpo[r] : prpo[r + 1]], prys[prpo[r] : prpo[r + 1]])
                    for r in range(pfro[p_local], pfro[p_local + 1])
                ]
                v = iou(pr, self._feature_rings(int(f_local)))
            if v > max_iou[p_local]:
                max_iou[p_local] = v
        survivors = max_iou < self.threshold
        return pa.table(
            {
                "pred_id": pa.array(pid[survivors]),
            }
        )


def dedupe_survivors(pred_ds, feet_table: pa.Table, z: int = C.Z_JOIN, threshold: float = C.DEDUPE_IOU_THRESHOLD):
    import ray

    ref = ray.put(feet_table)
    return pred_ds.map_batches(
        DedupeProber,
        fn_constructor_args=(ref, z, threshold),
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )
