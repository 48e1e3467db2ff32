"""Exact K-round single-source shortest paths (Bellman-Ford
supersteps with delta frontiers) over a distributed weighted edge
list — the min-plus-semiring Pregel primitive, completing the graph
family next to stages/bfs.py (hop frontier), stages/pagerank.py
(fixed-point) and runtime/components.py (label propagation).

Semantics (deterministic, mirrored by oracle.SSSP):
- edges carry integer weights w >= 1;
- source = the max-degree node of the edge list, ties broken by min
  node id (bfs._source_node, the shared hub rule);
- wdist(n) = exact minimum path weight over paths of <= SSSP_K edges
  from the source (K Bellman-Ford rounds); nodes not reachable within
  K hops (or absent from the edge list) report -1.

The delta-frontier optimization — each round relaxes only edges out
of nodes whose distance IMPROVED last round — is value-identical to
full Bellman-Ford rounds (a node relaxed twice at the same distance
contributes nothing new), so both strategies and the SQL twin agree
bit-for-bit:
- broadcast (node table <= SSSP_BROADCAST_NODE_CAP): dist lives on
  the driver as sorted numpy arrays; each round ships only the DELTA
  frontier (nodes + dists) via ray.put, maps the edge list once
  (searchsorted gather + per-batch min per dst), and min-reduces a
  frontier-degree-bounded candidate table.
- shuffle (bigger graphs): delta ⋈ edges co-partition join emits
  weighted candidates, groupby-min per dst, then a co-partition
  left-join against the running dist table keeps strict improvements;
  dist is compacted by union + groupby-min per round (the superstep
  barrier). Per-round traffic is delta-degree bounded — the settled
  part of a 10^12-node graph never moves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.stages.bfs import _degrees, _source_node

SSSP_K = 4
SSSP_BROADCAST_NODE_CAP = 2_000_000
_UNSET = np.int64(1) << np.int64(62)


def _sssp_broadcast(edges, deg_ds, k: int):
    """-> (sorted nodes-with-edges, dist array; unreached _UNSET)."""
    import ray

    nodes = np.sort(deg_ds.to_pandas()["src"].to_numpy())
    dist = np.full(len(nodes), _UNSET, dtype=np.int64)
    src = _source_node(deg_ds)
    dist[np.searchsorted(nodes, src)] = 0
    delta_n = np.array([src], dtype=np.int64)
    delta_d = np.array([0], dtype=np.int64)

    for _ in range(k):
        if len(delta_n) == 0:
            break
        order = np.argsort(delta_n)
        fref = ray.put((delta_n[order], delta_d[order]))

        def relax(batch: pa.Table, _f=fref) -> pa.Table:
            fn, fd = ray.get(_f)
            s = batch.column("src").to_numpy()
            t = batch.column("dst").to_numpy()
            w = batch.column("w").to_numpy()
            pos = np.searchsorted(fn, s)
            hit = (pos < len(fn)) & (fn[np.clip(pos, 0, len(fn) - 1)] == s)
            cand_n = t[hit]
            cand_v = fd[pos[hit]] + w[hit]
            # in-batch min per dst
            un, codes = np.unique(cand_n, return_inverse=True)
            mv = np.full(len(un), _UNSET, dtype=np.int64)
            np.minimum.at(mv, codes, cand_v)
            return pa.table({"node": pa.array(un), "v": pa.array(mv)})

        # driver min-combine of the compact per-block partials (the
        # broadcast contract already holds node-length arrays on the
        # driver) — one streaming execution per round, no groupby
        # shuffle; value-identical to the former groupby-Min
        from robosat_ray.stages.bfs import combine_partials

        cv, _ = combine_partials(
            edges.map_batches(relax, batch_format="pyarrow"),
            nodes, int(_UNSET), np.minimum, val="v",
        )
        better = cv < dist
        dist[better] = cv[better]
        delta_n, delta_d = nodes[better], cv[better]
        del fref
    return nodes, dist


def _sssp_shuffle(edges_n, deg_ds, k: int, num_buckets: int):
    """-> Dataset (node, dist) covering exactly the reached nodes.
    edges_n: (node == src, dst, w), materialized."""
    import ray.data
    from ray.data.aggregate import Min

    from robosat_ray.stages.join import compact_arrow, copartition_join

    src = _source_node(deg_ds)
    start = pa.table(
        {"node": pa.array([src], pa.int64()), "dist": pa.array([0], pa.int64())}
    )
    dist = ray.data.from_arrow(start).materialize()
    delta = dist
    hints_exp = {
        "left": {"node": pa.int64(), "dist": pa.int64()},
        "right": {"node": pa.int64(), "dst": pa.int64(), "w": pa.int64()},
    }
    hints_new = {
        "left": {"node": pa.int64(), "mv": pa.int64()},
        "right": {"node": pa.int64(), "dist": pa.int64()},
    }

    for _ in range(k):
        if delta.count() == 0:
            break
        cand = copartition_join(
            delta, edges_n, on="node", how="inner",
            num_buckets=num_buckets, schema_hints=hints_exp,
        )

        def c_rows(batch: pa.Table) -> pa.Table:
            d = batch.column("dist").to_numpy()
            w = batch.column("w").to_numpy()
            t = batch.column("dst").to_numpy()
            un, codes = np.unique(t, return_inverse=True)
            mv = np.full(len(un), _UNSET, dtype=np.int64)
            np.minimum.at(mv, codes, d + w)
            return pa.table({"node": pa.array(un), "v": pa.array(mv)})

        cand_min = (
            cand.map_batches(c_rows, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("v", alias_name="mv"))
        )
        hit = copartition_join(
            cand_min, dist, on="node", how="left",
            num_buckets=num_buckets, schema_hints=hints_new,
        )

        def keep_better(batch: pa.Table) -> pa.Table:
            mv = batch.column("mv").to_numpy()
            d = batch.column("dist").to_numpy(zero_copy_only=False)
            d = np.where(pd.isna(d), _UNSET, d).astype(np.int64)
            better = mv < d
            return pa.table(
                {
                    "node": pa.array(batch.column("node").to_numpy()[better]),
                    "dist": pa.array(mv[better]),
                }
            )

        # compact_arrow: round barrier — drops the schema-less empty
        # pandas blocks all-to-all stages emit (they bypass pyarrow
        # maps and crash the union+groupby with mixed block types)
        delta = compact_arrow(hit.map_batches(keep_better, batch_format="pyarrow"))
        if delta.count() == 0:
            break
        dist = compact_arrow(
            dist.union(delta)
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
        )
    return dist


def sssp(edges_ds, nodes_ds, id_col: str = "node", k: int = SSSP_K,
         strategy: str = "auto",
         broadcast_cap: int = SSSP_BROADCAST_NODE_CAP,
         num_buckets: int | None = None):
    """edges_ds: (src:int64, dst:int64, w:int64 >= 1), BOTH directions
    present for undirected graphs. nodes_ds: the full node universe
    (one row per node, column `id_col`) — nodes without edges report
    wdist -1. -> Dataset (id_col, wdist)."""
    import ray

    from robosat_ray.stages.bfs import _AttachDist

    edges = edges_ds.materialize()  # scanned once per round
    deg = _degrees(edges).materialize()
    if strategy == "auto":
        strategy = "broadcast" if deg.count() <= broadcast_cap else "shuffle"

    if strategy == "broadcast":
        nodes, dist = _sssp_broadcast(edges, deg, k)
        reached = dist < _UNSET
        ref = ray.put((nodes[reached], dist[reached]))
        out = nodes_ds.map_batches(
            _AttachDist, fn_constructor_args=(ref, id_col),
            batch_format="pyarrow", concurrency=(1, 8), num_cpus=1,
        )
    else:
        from robosat_ray.stages.join import NUM_JOIN_BUCKETS, copartition_join

        def e_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch.column("src"),
                    "dst": batch.column("dst"),
                    "w": batch.column("w"),
                }
            )

        edges_n = edges.map_batches(e_rows, batch_format="pyarrow").materialize()
        nb = num_buckets or NUM_JOIN_BUCKETS
        dist_ds = _sssp_shuffle(edges_n, deg, k, nb)
        hints = {
            "left": {"node": pa.int64()},
            "right": {"node": pa.int64(), "dist": pa.int64()},
        }

        def node_rows(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch.column(id_col)})

        lab = copartition_join(
            nodes_ds.map_batches(node_rows, batch_format="pyarrow"),
            dist_ds, on="node", how="left",
            num_buckets=nb, schema_hints=hints,
        )

        def finish(batch: pa.Table) -> pa.Table:
            d = batch.column("dist").to_numpy(zero_copy_only=False)
            d = np.where(pd.isna(d), -1, d).astype(np.int64)
            return pa.table({id_col: batch.column("node"), "dist": pa.array(d)})

        out = lab.map_batches(finish, batch_format="pyarrow")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: batch.column(id_col), "wdist": batch.column("dist")}
        )

    return out.map_batches(rename, batch_format="pyarrow")
