"""Nearest-footprint map matching: every page snaps to the closest
reference geometry within a bounded search ring — the all-pages analog
of the reference's rtree nearest-candidate probe (robosat uses
`idx.nearest(shape(feature).bounds, 1)` per candidate feature in
robosat/tools/dedupe.py:45-49; here the LARGE side is the probe side,
so the index is broadcast and every page batch probes it).

Search semantics: candidates are footprints whose CENTER falls in the
3x3 tile ring (z=12) around the page's tile; the winner is the
(squared-distance, feature_id)-minimal candidate. Distance lives on
the knn plane (lon, my*360) quantized to integer micro units — after
the one float floor() (expression-tree-mirrored in the SQL twin) the
d2 comparison is pure int64, so engine and oracle rank candidates
bit-identically. Pages with no footprint center in their ring are
omitted (bounded-radius matcher, the map-matching contract).

Scale shape: the footprint side is the EXTERNAL reference geometry
(bounded, the T3/T6 broadcast pattern — same justification as
dedupe_survivors); it broadcasts once via ray.put and each actor
builds its cell CSR once in __init__. Pages stream: per batch, 9
searchsorted cell probes + one CSR expansion + one lexsort — no
shuffle at all, output is one row per matched page.

int64 headroom: ring-bounded offsets are <= 2 tiles ~ 0.176 deg ~
176k micro units, so d2 <= ~6.2e10.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from robosat_ray import constants as C

# micro quantization of the knn (lon, my*360) plane
MATCH_Q = 1_000_000.0


def quantize_plane(lon: np.ndarray, my: np.ndarray):
    """(lon, my) -> integer micro coords on the knn plane. Exact-op
    chain (mirrored in oracle.NEAREST_FOOT): floor(lon * 1e6),
    floor(my * 360.0 * 1e6)."""
    xq = np.floor(lon * MATCH_Q).astype(np.int64)
    yq = np.floor(my * 360.0 * MATCH_Q).astype(np.int64)
    return xq, yq


class _NearestProbe:
    """Actor-pool stage: footprint cell-CSR built once per actor."""

    def __init__(self, feet_ref, z: int):
        import ray

        fid, kind, cxq, cyq, ftx, fty = ray.get(feet_ref)
        ni = 1 << z
        cell = ftx * ni + fty
        order = np.argsort(cell, kind="stable")  # stable: feature order kept
        self.fid = fid[order]
        self.kind = kind[order]
        self.cxq = cxq[order]
        self.cyq = cyq[order]
        cells = cell[order]
        self.uc, starts = np.unique(cells, return_index=True)
        self.off = np.append(starts, len(cells)).astype(np.int64)
        self.ni = ni
        self.z = z

    def __call__(self, batch: pa.Table) -> pa.Table:
        from robosat_ray.geo.tiles import lonmy_to_tile

        ids = batch.column("doc_id").to_numpy()
        lon = batch.column("lon").to_numpy()
        my = batch.column("my").to_numpy()
        xq, yq = quantize_plane(lon, my)
        tx, ty = lonmy_to_tile(lon, my, self.z)
        p_idx_all, f_idx_all = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                key = (tx + dx) * self.ni + (ty + dy)
                slot = np.searchsorted(self.uc, key)
                ok = (slot < len(self.uc)) & (
                    self.uc[np.clip(slot, 0, len(self.uc) - 1)] == key
                )
                pg = np.nonzero(ok)[0]
                if len(pg) == 0:
                    continue
                s = slot[pg]
                cnt = self.off[s + 1] - self.off[s]
                total = int(cnt.sum())
                if total == 0:
                    continue
                rep = np.repeat(np.arange(len(pg)), cnt)
                pos = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
                f_idx_all.append(self.off[s][rep] + pos)
                p_idx_all.append(pg[rep])
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "feature_id": pa.array([], pa.int64()),
                "kind": pa.array([], pa.string()),
                "d2q": pa.array([], pa.int64()),
            }
        )
        if not p_idx_all:
            return empty
        pidx = np.concatenate(p_idx_all)
        fidx = np.concatenate(f_idx_all)
        ddx = xq[pidx] - self.cxq[fidx]
        ddy = yq[pidx] - self.cyq[fidx]
        d2 = ddx * ddx + ddy * ddy
        # per-page argmin with (d2, feature_id) tie-break: one lexsort,
        # keep the first row of each page run
        order = np.lexsort((self.fid[fidx], d2, pidx))
        pidx, fidx, d2 = pidx[order], fidx[order], d2[order]
        first = np.ones(len(pidx), dtype=bool)
        first[1:] = pidx[1:] != pidx[:-1]
        pidx, fidx, d2 = pidx[first], fidx[first], d2[first]
        return pa.table(
            {
                "doc_id": pa.array(ids[pidx]),
                "feature_id": pa.array(self.fid[fidx]),
                "kind": pa.array(self.kind[fidx], pa.string()),
                "d2q": pa.array(d2),
            }
        )


def nearest_footprint(points_ds, partkeys: np.ndarray, z: int = C.Z_JOIN):
    """points (doc_id, lon, my) x footprint reference (part keys) ->
    (doc_id, feature_id, kind, d2q): the nearest footprint center in
    each page's 3x3 tile ring."""
    import ray

    from robosat_ray.geo.tiles import lonmy_to_tile
    from robosat_ray.synth.footprints import footprint_centers

    k = np.asarray(partkeys, dtype=np.int64)
    cx, cy = footprint_centers(k)
    cxq, cyq = quantize_plane(cx, cy)
    ftx, fty = lonmy_to_tile(cx, cy, z)
    kind = np.asarray(C.FOOT_KINDS, dtype=object)[(k % 4).astype(np.int64)]
    feet_ref = ray.put((k, kind.astype("U"), cxq, cyq, ftx, fty))
    return points_ds.map_batches(
        _NearestProbe,
        fn_constructor_args=(feet_ref, z),
        batch_format="pyarrow",
        concurrency=(2, 8),
    )
