"""Exact fixed-round k-core peeling over a distributed edge list —
the monotone-contraction Pregel primitive, completing the graph family
next to stages/bfs.py (frontier expansion), stages/sssp.py (min-plus
relaxation), stages/pagerank.py (fixed-point iteration) and
runtime/components.py (label propagation). Peeling's per-round state
is the SURVIVOR set, which only ever shrinks — so early exit at the
fixpoint is value-identical to running all rounds, and the engine,
both strategies, and the unrolled SQL twin agree bit-for-bit.

Semantics (deterministic, mirrored by oracle.KCORE):
- round 0 survivors = every node with >= 1 edge;
- round i survivors = round i-1 survivors whose degree WITHIN the
  round i-1 survivor set is >= CORE_K;
- after PEEL_ROUNDS rounds: in_core = 1 for survivors, core_deg =
  degree within the final survivor set (0 if a survivor lost all
  its neighbors in the last round); non-survivors and isolated
  nodes report in_core 0, core_deg -1.
This is classic k-core peeling (Seidman 1983) with a bounded round
count — the same fixed-iteration contract as pagerank/bfs/sssp; at
the fixpoint (reached quickly on natural graphs) it IS the k-core.

Strategies (the engine's standard broadcast/shuffle switch):
- broadcast (node table <= KCORE_BROADCAST_NODE_CAP): the survivor
  set lives on the driver as a sorted numpy array; each round is one
  ray.put of the set + one map_batches over the materialized edge
  list (per-batch both-endpoints-alive gather + in-batch bincount
  partials) + one node-bounded groupby-sum.
- shuffle (bigger graphs): survivor membership is a Dataset; each
  round co-partition-joins edges against it on src then on dst
  (traffic bounded by the SURVIVING edges — peeled regions of a
  10^12-node graph stop moving), then a groupby-count >= k filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.stages.bfs import _degrees

CORE_K = 3
PEEL_ROUNDS = 4
KCORE_BROADCAST_NODE_CAP = 2_000_000


def _alive_deg_broadcast(edges, alive: np.ndarray):
    """Degree within `alive` (sorted) for every alive src with >= 1
    surviving edge -> (nodes array, counts array)."""
    import ray

    aref = ray.put(alive)

    def part(batch: pa.Table, _a=aref) -> pa.Table:
        a = ray.get(_a)
        s = batch.column("src").to_numpy()
        t = batch.column("dst").to_numpy()
        ps = np.searchsorted(a, s)
        pt = np.searchsorted(a, t)
        ok = (
            (ps < len(a))
            & (a[np.clip(ps, 0, len(a) - 1)] == s)
            & (pt < len(a))
            & (a[np.clip(pt, 0, len(a) - 1)] == t)
        )
        un, cnt = np.unique(s[ok], return_counts=True)
        return pa.table({"node": pa.array(un), "c": pa.array(cnt.astype(np.int64))})

    # driver sum-combine of the compact per-block partials (the
    # broadcast contract already holds node-length arrays on the
    # driver) — one streaming execution per round, no groupby shuffle;
    # value-identical to the former groupby-Sum
    from robosat_ray.stages.bfs import combine_partials

    cnt, touched = combine_partials(
        edges.map_batches(part, batch_format="pyarrow"),
        alive, 0, np.add, val="c",
    )
    del aref
    return alive[touched], cnt[touched]


def _peel_broadcast(edges, deg_ds, k: int, rounds: int):
    """-> (final sorted survivor array, matching core_deg array)."""
    alive = np.sort(deg_ds.to_pandas()["src"].to_numpy())
    nodes = cnt = None
    for _ in range(rounds):
        if len(alive) == 0:
            break
        nodes, cnt = _alive_deg_broadcast(edges, alive)
        new_alive = nodes[cnt >= k]
        if len(new_alive) == len(alive):  # fixpoint: monotone shrink
            return alive, cnt[np.searchsorted(nodes, alive)]
        alive = new_alive
    if len(alive) == 0:
        return alive, np.empty(0, dtype=np.int64)
    nodes, cnt = _alive_deg_broadcast(edges, alive)
    out = np.zeros(len(alive), dtype=np.int64)
    pos = np.searchsorted(alive, nodes)
    out[pos] = cnt
    return alive, out


def _alive_edges_shuffle(edges_n, alive_ds, num_buckets: int):
    """Co-partition filter to edges with BOTH endpoints alive ->
    Dataset (node == src, dst)."""
    from robosat_ray.stages.join import copartition_join

    hints1 = {
        "left": {"node": pa.int64()},
        "right": {"node": pa.int64(), "dst": pa.int64()},
    }
    j1 = copartition_join(
        alive_ds, edges_n, on="node", how="inner",
        num_buckets=num_buckets, schema_hints=hints1,
    )

    def rekey(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("dst"), "src": batch.column("node")})

    hints2 = {
        "left": {"node": pa.int64()},
        "right": {"node": pa.int64(), "src": pa.int64()},
    }
    j2 = copartition_join(
        alive_ds, j1.map_batches(rekey, batch_format="pyarrow"),
        on="node", how="inner", num_buckets=num_buckets, schema_hints=hints2,
    )

    def back(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("src"), "dst": batch.column("node")})

    return j2.map_batches(back, batch_format="pyarrow")


def _alive_deg_shuffle(edges_n, alive_ds, num_buckets: int):
    """-> Dataset (node, dg) over alive srcs with >= 1 surviving edge."""
    from ray.data.aggregate import Sum

    both = _alive_edges_shuffle(edges_n, alive_ds, num_buckets)

    def part(batch: pa.Table) -> pa.Table:
        un, cnt = np.unique(batch.column("node").to_numpy(), return_counts=True)
        return pa.table({"node": pa.array(un), "c": pa.array(cnt.astype(np.int64))})

    return (
        both.map_batches(part, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("c", alias_name="dg"))
    )


def _peel_shuffle(edges_n, deg_ds, k: int, rounds: int, num_buckets: int):
    """-> Dataset (node, cdeg) covering exactly the final survivors.
    compact_arrow at every round barrier: drops the schema-less empty
    pandas blocks all-to-all stages emit (they bypass pyarrow maps and
    crash type-uniform consumers with mixed block types)."""
    from robosat_ray.stages.join import compact_arrow

    def node_only(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node")})

    def src_nodes(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("src")})

    alive = compact_arrow(deg_ds.map_batches(src_nodes, batch_format="pyarrow"))
    n_alive = alive.count()
    for _ in range(rounds):
        if n_alive == 0:
            break
        surv = compact_arrow(
            _alive_deg_shuffle(edges_n, alive, num_buckets).filter(expr=f"dg >= {k}")
        )
        n_new = surv.count()
        if n_new == n_alive:  # fixpoint: monotone shrink
            return surv
        alive = compact_arrow(surv.map_batches(node_only, batch_format="pyarrow"))
        n_alive = n_new

    from robosat_ray.stages.join import copartition_join

    cdeg = _alive_deg_shuffle(edges_n, alive, num_buckets)
    hints = {
        "left": {"node": pa.int64()},
        "right": {"node": pa.int64(), "dg": pa.int64()},
    }
    lab = copartition_join(
        alive, cdeg, on="node", how="left",
        num_buckets=num_buckets, schema_hints=hints,
    )

    def fill0(batch: pa.Table) -> pa.Table:
        d = batch.column("dg").to_numpy(zero_copy_only=False)
        d = np.where(pd.isna(d), 0, d).astype(np.int64)
        return pa.table({"node": batch.column("node"), "dg": pa.array(d)})

    return compact_arrow(lab.map_batches(fill0, batch_format="pyarrow"))


class _AttachCore:
    """Label every input node with (in_core, core_deg): broadcast the
    sorted final survivor + core-degree arrays, searchsorted per batch."""

    def __init__(self, ref, id_col: str):
        import ray

        self.nodes, self.cdeg = ray.get(ref) if not isinstance(ref, tuple) else ref
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        inc = np.zeros(len(ids), dtype=np.int64)
        cd = np.full(len(ids), -1, dtype=np.int64)
        if len(self.nodes):
            pos = np.searchsorted(self.nodes, ids)
            hit = (pos < len(self.nodes)) & (
                self.nodes[np.clip(pos, 0, len(self.nodes) - 1)] == ids
            )
            inc[hit] = 1
            cd[hit] = self.cdeg[pos[hit]]
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "in_core": pa.array(inc),
                "core_deg": pa.array(cd),
            }
        )


def kcore(edges_ds, nodes_ds, id_col: str = "node", k: int = CORE_K,
          rounds: int = PEEL_ROUNDS, strategy: str = "auto",
          broadcast_cap: int = KCORE_BROADCAST_NODE_CAP,
          num_buckets: int | None = None):
    """edges_ds: (src:int64, dst:int64), BOTH directions present for
    undirected graphs, each undirected edge exactly once per direction.
    nodes_ds: the full node universe (one row per node, column
    `id_col`). -> Dataset (id_col, in_core 0/1, core_deg; -1 for
    non-core / isolated nodes)."""
    import ray

    edges = edges_ds.materialize()  # scanned once per peel round
    deg = _degrees(edges).materialize()
    if strategy == "auto":
        strategy = "broadcast" if deg.count() <= broadcast_cap else "shuffle"

    if strategy == "broadcast":
        alive, cdeg = _peel_broadcast(edges, deg, k, rounds)
        ref = ray.put((alive, cdeg))
        return nodes_ds.map_batches(
            _AttachCore, fn_constructor_args=(ref, id_col),
            batch_format="pyarrow", concurrency=(1, 8), num_cpus=1,
        )

    from robosat_ray.stages.join import NUM_JOIN_BUCKETS, copartition_join

    nb = num_buckets or NUM_JOIN_BUCKETS

    def e_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("src"), "dst": batch.column("dst")})

    edges_n = edges.map_batches(e_rows, batch_format="pyarrow").materialize()
    core = _peel_shuffle(edges_n, deg, k, rounds, nb)

    def node_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column(id_col)})

    hints = {
        "left": {"node": pa.int64()},
        "right": {"node": pa.int64(), "dg": pa.int64()},
    }
    lab = copartition_join(
        nodes_ds.map_batches(node_rows, batch_format="pyarrow"),
        core, on="node", how="left", num_buckets=nb, schema_hints=hints,
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("dg").to_numpy(zero_copy_only=False)
        miss = pd.isna(d)
        cd = np.where(miss, -1, d).astype(np.int64)
        inc = np.where(miss, 0, 1).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column("node"),
                "in_core": pa.array(inc),
                "core_deg": pa.array(cd),
            }
        )

    return lab.map_batches(finish, batch_format="pyarrow")
