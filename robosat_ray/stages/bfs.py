"""Exact k-superstep BFS hop distances over a distributed edge list —
the frontier-expansion primitive of the Pregel family (complements
stages/pagerank.py's fixed-point loop and runtime/components.py's
connected components: BFS's per-round state is the FRONTIER, which
shrinks/grows with the wave, not the whole node set).

Semantics (deterministic, mirrored by oracle.BFS_HOPS):
- source = the max-degree node of the edge list, ties broken by min
  node id (a hub start reaches a real gradient; min-id starts land in
  tiny fringe components on natural data);
- dist(n) = exact unweighted hop distance from the source, computed
  with BFS_K supersteps, so dist <= BFS_K; nodes not reached within
  BFS_K hops (or absent from the edge list entirely) report -1.

Two superstep strategies (the engine's standard broadcast/shuffle
switch, flip-tested bit-equal):
- broadcast (node table <= BFS_BROADCAST_NODE_CAP): dist lives on the
  driver as two sorted numpy arrays; each superstep is one ray.put of
  the CURRENT FRONTIER (not the full dist vector) + one map_batches
  over the materialized edge list (per-batch membership gather +
  in-batch dst dedup) + one frontier-sized groupby.
- shuffle (bigger graphs): frontier ⋈ edges co-partition join emits
  candidate dsts, a second co-partition left-join against the dist
  table keeps the newly reached, dist = union (materialized as the
  superstep barrier). Per-round shuffle volume is frontier-degree
  bounded — the idle 99% of a 10^12-node graph never moves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

BFS_K = 6
BFS_BROADCAST_NODE_CAP = 2_000_000


def combine_partials(ds, nodes: np.ndarray, init: int, ufunc,
                     key: str = "node", val: str | None = None):
    """Stream compact per-block partial rows (key[, val]) into a
    full-length int64 array over the sorted node universe `nodes` —
    the broadcast-strategy replacement for a per-round
    `groupby(key).aggregate(...)` shuffle. The driver already holds
    node-length arrays under the broadcast contract, so the combine is
    node-bounded by construction; partial volume is whatever the
    per-batch combiner already compacted to (<= uniques per block).
    -> (out array, touched boolean mask). Fails loudly if a partial
    key is missing from `nodes` (silent wrong-slot gather otherwise).
    Shared by the graph family's broadcast rounds (bfs / sssp /
    pagerank / kcore)."""
    out = np.full(len(nodes), init, dtype=np.int64)
    touched = np.zeros(len(nodes), dtype=bool)
    for batch in ds.iter_batches(batch_format="pyarrow"):
        if batch.num_rows == 0:  # all-to-all empties may lack a schema
            continue
        n = batch.column(key).to_numpy()
        pos = np.searchsorted(nodes, n)
        assert (
            nodes[np.clip(pos, 0, len(nodes) - 1)] == n
        ).all(), "partial key missing from the node universe"
        touched[pos] = True
        if val is not None:
            ufunc.at(out, pos, batch.column(val).to_numpy())
    return out, touched


def _degrees(edges_ds):
    from ray.data.aggregate import Count

    return edges_ds.groupby("src").aggregate(Count(alias_name="dg"))


def _source_node(deg_ds) -> int:
    """max degree, tie -> min node id; per-block top-1 partials, final
    pick on the driver (no global sort)."""

    def top1(batch: pa.Table) -> pa.Table:
        node = batch.column("src").to_numpy()
        dg = batch.column("dg").to_numpy()
        if len(node) == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dg": pa.array([], pa.int64())})
        best = np.lexsort((node, -dg))[0]
        return pa.table({"src": pa.array(node[best : best + 1]),
                         "dg": pa.array(dg[best : best + 1])})

    cands = deg_ds.map_batches(top1, batch_format="pyarrow").to_pandas()
    assert len(cands) > 0, "empty edge list"
    best = np.lexsort((cands["src"].to_numpy(), -cands["dg"].to_numpy()))[0]
    return int(cands["src"].iloc[best])


def _bfs_broadcast(edges, deg_ds, k: int) -> tuple[np.ndarray, np.ndarray]:
    """-> (sorted nodes-with-edges array, dist array; unreached -1)."""
    import ray

    nodes = np.sort(deg_ds.to_pandas()["src"].to_numpy())
    dist = np.full(len(nodes), -1, dtype=np.int64)
    src = _source_node(deg_ds)
    dist[np.searchsorted(nodes, src)] = 0
    frontier = np.array([src], dtype=np.int64)

    for d in range(1, k + 1):
        if len(frontier) == 0:
            break
        fref = ray.put(np.sort(frontier))

        def expand(batch: pa.Table, _f=fref) -> pa.Table:
            f = ray.get(_f)
            s = batch.column("src").to_numpy()
            t = batch.column("dst").to_numpy()
            pos = np.searchsorted(f, s)
            hit = (pos < len(f)) & (f[np.clip(pos, 0, len(f) - 1)] == s)
            return pa.table({"node": pa.array(np.unique(t[hit]))})

        # driver combine of the compact per-block partials (the
        # broadcast contract already holds node-length arrays on the
        # driver) — one streaming execution, no groupby shuffle
        _, seen = combine_partials(
            edges.map_batches(expand, batch_format="pyarrow"), nodes, 0, None
        )
        new = seen & (dist == -1)
        dist[new] = d
        frontier = nodes[new]
        del fref
    return nodes, dist


def _bfs_shuffle(edges, deg_ds, k: int, num_buckets: int):
    """-> Dataset (node, dist) covering exactly the reached nodes."""
    import ray.data

    from robosat_ray.stages.join import compact_arrow, copartition_join

    src = _source_node(deg_ds)
    dist = ray.data.from_arrow(
        pa.table({"node": pa.array([src]), "dist": pa.array([0], pa.int64())})
    ).materialize()
    frontier = ray.data.from_arrow(
        pa.table({"node": pa.array([src], pa.int64())})
    ).materialize()

    def e_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("src"), "dst": batch.column("dst")})

    edges_n = edges.map_batches(e_rows, batch_format="pyarrow").materialize()
    hints_exp = {
        "left": {"node": pa.int64()},
        "right": {"node": pa.int64(), "dst": pa.int64()},
    }
    hints_new = {
        "left": {"node": pa.int64()},
        "right": {"node": pa.int64(), "dist": pa.int64()},
    }

    for d in range(1, k + 1):
        if frontier.count() == 0:
            break
        cand = copartition_join(
            frontier, edges_n, on="node", how="inner",
            num_buckets=num_buckets, schema_hints=hints_exp,
        )

        def dedup(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": pa.array(np.unique(batch.column("dst").to_numpy()))}
            )

        cand_u = (
            cand.map_batches(dedup, batch_format="pyarrow").groupby("node").count()
        )

        def drop_count(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch.column("node")})

        cand_u = cand_u.map_batches(drop_count, batch_format="pyarrow")
        hit = copartition_join(
            cand_u, dist, on="node", how="left",
            num_buckets=num_buckets, schema_hints=hints_new,
        )

        def keep_new(batch: pa.Table, _d=d) -> pa.Table:
            mask = pa.compute.is_null(batch.column("dist"))
            f = batch.filter(mask)
            return pa.table(
                {
                    "node": f.column("node"),
                    "dist": pa.array(np.full(len(f), _d, np.int64)),
                }
            )

        # compact_arrow: round barrier — drops the schema-less empty
        # pandas blocks all-to-all stages emit (they bypass pyarrow
        # maps and crash type-uniform consumers with mixed block types)
        new = compact_arrow(hit.map_batches(keep_new, batch_format="pyarrow"))
        if new.count() == 0:
            break
        dist = dist.union(new).materialize()
        frontier = compact_arrow(
            new.map_batches(
                lambda b: pa.table({"node": b.column("node")}),
                batch_format="pyarrow",
            )
        )
    return dist


class _AttachDist:
    """Label every input node with its BFS dist (-1 when unreached):
    broadcast sorted (node, dist) arrays, searchsorted per batch."""

    def __init__(self, ref, id_col: str):
        import ray

        self.nodes, self.dist = ray.get(ref) if not isinstance(ref, tuple) else ref
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        out = np.full(len(ids), -1, dtype=np.int64)
        if len(self.nodes):
            pos = np.searchsorted(self.nodes, ids)
            hit = (pos < len(self.nodes)) & (
                self.nodes[np.clip(pos, 0, len(self.nodes) - 1)] == ids
            )
            out[hit] = self.dist[pos[hit]]
        return pa.table({self.id_col: pa.array(ids), "dist": pa.array(out)})


def bfs_hops(edges_ds, nodes_ds, id_col: str = "node", k: int = BFS_K,
             strategy: str = "auto",
             broadcast_cap: int = BFS_BROADCAST_NODE_CAP,
             num_buckets: int | None = None):
    """edges_ds: (src:int64, dst:int64), BOTH directions present for
    undirected graphs, no parallel-edge requirement. nodes_ds: the full
    node universe (one row per node, column `id_col`) — nodes without
    edges report dist -1. -> Dataset (id_col, dist)."""
    import ray

    edges = edges_ds.materialize()  # scanned once per superstep
    deg = _degrees(edges).materialize()
    if strategy == "auto":
        strategy = "broadcast" if deg.count() <= broadcast_cap else "shuffle"

    if strategy == "broadcast":
        nodes, dist = _bfs_broadcast(edges, deg, k)
        reached = dist >= 0
        ref = ray.put((nodes[reached], dist[reached]))
        return nodes_ds.map_batches(
            _AttachDist, fn_constructor_args=(ref, id_col),
            batch_format="pyarrow", concurrency=(1, 8), num_cpus=1,
        )

    from robosat_ray.stages.join import NUM_JOIN_BUCKETS

    dist_ds = _bfs_shuffle(edges, deg, k, num_buckets or NUM_JOIN_BUCKETS)
    from robosat_ray.stages.join import copartition_join

    def node_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column(id_col)})

    hints = {
        "left": {"node": pa.int64()},
        "right": {"node": pa.int64(), "dist": pa.int64()},
    }
    lab = copartition_join(
        nodes_ds.map_batches(node_rows, batch_format="pyarrow"),
        dist_ds, on="node", how="left",
        num_buckets=num_buckets or NUM_JOIN_BUCKETS, schema_hints=hints,
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        d = np.where(pd.isna(d), -1, d).astype(np.int64)
        return pa.table({id_col: batch.column("node"), "dist": pa.array(d)})

    return lab.map_batches(finish, batch_format="pyarrow")
