"""STR-packed bounding-box tree, from scratch in numpy.

Replaces the rtree index the reference builds over whole datasets in
driver RAM (robosat/spatial/core.py:80-100, leaf_capacity=1000). In the
engine a small tree is built *per cell / per bucket* inside a stage
(actor __init__ or map_groups), never over the whole dataset.

Packing: Sort-Tile-Recursive (Leutenegger et al. 1997, public
literature): sort by center-x into vertical slices, sort each slice by
center-y, cut into nodes of `capacity` entries; repeat upward.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    def __init__(self, minx, miny, maxx, maxy, capacity: int = 16):
        self.minx = np.asarray(minx, dtype=np.float64)
        self.miny = np.asarray(miny, dtype=np.float64)
        self.maxx = np.asarray(maxx, dtype=np.float64)
        self.maxy = np.asarray(maxy, dtype=np.float64)
        self.n = len(self.minx)
        self.capacity = capacity
        # levels[0] = leaf order (permutation of input indices);
        # each upper level: (child_start, child_end, bbox arrays)
        if self.n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels = []
            return
        cx = (self.minx + self.maxx) * 0.5
        cy = (self.miny + self.maxy) * 0.5
        n_leaves = int(np.ceil(self.n / capacity))
        n_slices = int(np.ceil(np.sqrt(n_leaves)))
        per_slice = n_slices * capacity
        ix = np.argsort(cx, kind="stable")
        order = np.empty(self.n, dtype=np.int64)
        pos = 0
        for s in range(0, self.n, per_slice):
            sl = ix[s : s + per_slice]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            order[pos : pos + len(sl)] = sl
            pos += len(sl)
        self.order = order

        # build upper levels of bboxes
        self.levels = []
        lo_minx = self.minx[order]
        lo_miny = self.miny[order]
        lo_maxx = self.maxx[order]
        lo_maxy = self.maxy[order]
        while len(lo_minx) > 1:
            m = len(lo_minx)
            k = int(np.ceil(m / capacity))
            starts = np.arange(k) * capacity
            ends = np.minimum(starts + capacity, m)
            nminx = np.array([lo_minx[a:b].min() for a, b in zip(starts, ends)])
            nminy = np.array([lo_miny[a:b].min() for a, b in zip(starts, ends)])
            nmaxx = np.array([lo_maxx[a:b].max() for a, b in zip(starts, ends)])
            nmaxy = np.array([lo_maxy[a:b].max() for a, b in zip(starts, ends)])
            self.levels.append((starts, ends, nminx, nminy, nmaxx, nmaxy))
            lo_minx, lo_miny, lo_maxx, lo_maxy = nminx, nminy, nmaxx, nmaxy

    def query_box(self, qminx: float, qminy: float, qmaxx: float, qmaxy: float) -> np.ndarray:
        """Indices of input boxes whose bbox intersects the query bbox."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        if not self.levels:
            idx = np.arange(self.n)
        else:
            # descend from the top level
            top = self.levels[-1]
            frontier = np.arange(len(top[0]))
            for lvl in range(len(self.levels) - 1, -1, -1):
                starts, ends, nminx, nminy, nmaxx, nmaxy = self.levels[lvl]
                hit = frontier[
                    (nminx[frontier] <= qmaxx)
                    & (nmaxx[frontier] >= qminx)
                    & (nminy[frontier] <= qmaxy)
                    & (nmaxy[frontier] >= qminy)
                ]
                if len(hit) == 0:
                    return np.empty(0, dtype=np.int64)
                frontier = np.concatenate(
                    [np.arange(starts[h], ends[h]) for h in hit]
                )
            idx = frontier
        leaf = self.order[idx]
        m = (
            (self.minx[leaf] <= qmaxx)
            & (self.maxx[leaf] >= qminx)
            & (self.miny[leaf] <= qmaxy)
            & (self.maxy[leaf] >= qminy)
        )
        return leaf[m]

    def query_points(self, px: np.ndarray, py: np.ndarray):
        """Candidate (point_index, box_index) pairs with point inside box
        bbox. Vectorized sweep: points are binned against leaf boxes via
        a level-order descent per point batch."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        if self.n == 0 or len(px) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        # For per-cell group sizes (<= a few thousand boxes), a direct
        # broadcast against leaf bboxes beats tree descent in numpy.
        if self.n <= 512:
            inx = (self.minx[None, :] <= px[:, None]) & (px[:, None] <= self.maxx[None, :])
            iny = (self.miny[None, :] <= py[:, None]) & (py[:, None] <= self.maxy[None, :])
            pi, bi = np.nonzero(inx & iny)
            return pi.astype(np.int64), bi.astype(np.int64)
        pis = []
        bis = []
        for i in range(len(px)):
            hits = self.query_box(px[i], py[i], px[i], py[i])
            if len(hits):
                pis.append(np.full(len(hits), i, dtype=np.int64))
                bis.append(hits)
        if not pis:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(pis), np.concatenate(bis)
