"""Union-find connected components (array-based, path compression).

Replaces the reference's adjacency-set graph + recursive DFS components
(robosat/graph/core.py:4-104) — which holds every edge in driver RAM
and carries an explicit scaling TODO (graph/core.py:14-15). The engine
runs one union-find per cell group plus bounded boundary-resolution
rounds across cells (see stages/merge.py).
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, a: int) -> int:
        p = self.parent
        root = a
        while p[root] != root:
            root = p[root]
        while p[a] != root:
            p[a], a = root, p[a]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb

    def components(self) -> np.ndarray:
        """Root label per element (roots are minimal element ids)."""
        return np.array([self.find(i) for i in range(len(self.parent))], dtype=np.int64)


def connected_components_from_edges(n: int, ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    uf = UnionFind(n)
    for a, b in zip(ea, eb):
        uf.union(int(a), int(b))
    return uf.components()


def min_label_arrays(ids: np.ndarray, ea: np.ndarray, eb: np.ndarray):
    """Vectorized variant of min_label_propagation: returns
    (sorted_unique_ids, labels) numpy pair — the broadcast-and-
    searchsorted representation (no Python dict in any hot path)."""
    ids = np.asarray(ids, dtype=np.int64)
    ea = np.asarray(ea, dtype=np.int64)
    eb = np.asarray(eb, dtype=np.int64)
    uniq = np.unique(np.concatenate([ids, ea, eb])) if len(ea) else np.unique(ids)
    n = len(uniq)
    lab = np.arange(n, dtype=np.int64)
    if len(ea):
        ia = np.searchsorted(uniq, ea)
        ib = np.searchsorted(uniq, eb)
        # iterative min-propagation + pointer jumping (fully
        # vectorized; O(log diameter) rounds) — replaces the Python
        # edge loop of the union-find
        while True:
            m = np.minimum(lab[ia], lab[ib])
            before = lab.sum()
            np.minimum.at(lab, ia, m)
            np.minimum.at(lab, ib, m)
            while True:
                nl = lab[lab]
                if np.array_equal(nl, lab):
                    break
                lab = nl
            if lab.sum() == before:
                break
    # labels are minimal dense indices and uniq is ascending, so the
    # label's original id IS the component min id
    return uniq, uniq[lab]


def min_label_propagation(ids: np.ndarray, ea: np.ndarray, eb: np.ndarray, rounds: int = 0):
    """Component labels for arbitrary int64 node ids given edges
    (ea[i] -- eb[i]), by mapping ids to dense indices + union-find.
    Returns {id -> min id of its component}."""
    uniq = np.unique(np.concatenate([ids, ea, eb])) if len(ea) else np.unique(ids)
    pos = {int(v): i for i, v in enumerate(uniq)}
    uf = UnionFind(len(uniq))
    for a, b in zip(ea, eb):
        uf.union(pos[int(a)], pos[int(b)])
    comp = uf.components()
    # min original id per component root
    min_id: dict[int, int] = {}
    for v, c in zip(uniq, comp):
        c = int(c)
        if c not in min_id or int(v) < min_id[c]:
            min_id[c] = int(v)
    return {int(v): min_id[int(c)] for v, c in zip(uniq, comp)}
