"""Fixed-iteration integer PageRank over a distributed edge list —
the engine's iterative-algorithm surface (the Pregel-style loop every
graph measure at 10^12-edge scale reduces to: re-join ranks to edges,
aggregate contributions, repeat).

Determinism contract: all arithmetic is int64 micro-units with floor
division (rank_0 = 1_000_000; contribution = r // out_deg; update =
150_000 + (85 * Σ contributions) // 100, i.e. damping 0.85 and
teleport 0.15 in exact integers), so the result is partition-order
invariant and the unrolled SQL twin matches bit-for-bit — no float
convergence fuzz.

Two superstep strategies (the engine's standard broadcast/shuffle
switch, flip-tested bit-equal):
- broadcast (node table ≤ PR_BROADCAST_NODE_CAP): the rank vector
  lives on the driver as two sorted numpy arrays, each superstep is
  ONE ray.put + ONE map_batches over the materialized edge list (per-
  batch searchsorted gather + in-batch dst combiner) + one node-sized
  groupby gather. No joins at all.
- shuffle (bigger graphs): per superstep one edges ⋈ ranks
  co-partition join + one groupby-dst sum, rank table materialized as
  the superstep barrier (O(nodes), distributed, never on the driver).
  Out-degree is attached to the edge list once up front.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PR_ITERS = 6
PR_R0 = 1_000_000
PR_TELEPORT = 150_000
PR_DAMP_NUM = 85
PR_DAMP_DEN = 100
# above this many nodes the rank vector stops fitting a driver/worker
# heap comfortably (2M nodes = 32 MB of arrays) and the superstep
# switches to the co-partition join plan
PR_BROADCAST_NODE_CAP = 2_000_000


def _update(s: np.ndarray) -> np.ndarray:
    return PR_TELEPORT + (PR_DAMP_NUM * s) // PR_DAMP_DEN


def pagerank_micro(edges_ds, iters: int = PR_ITERS, strategy: str = "auto",
                   broadcast_cap: int = PR_BROADCAST_NODE_CAP):
    """edges_ds: (src:int64, dst:int64), duplicates allowed (parallel
    edges each carry mass). Every node must appear as BOTH a src and a
    dst (undirected graphs encoded as two directed edges satisfy this;
    it rules out dangling-mass bookkeeping). -> Dataset (node,
    rank_micro) after `iters` exact-integer iterations."""
    from ray.data.aggregate import Count

    deg = edges_ds.groupby("src").aggregate(Count(alias_name="sdeg"))
    if strategy == "auto":
        strategy = "broadcast" if deg.count() <= broadcast_cap else "shuffle"
    if strategy == "broadcast":
        return _pagerank_broadcast(edges_ds, deg, iters)
    return _pagerank_shuffle(edges_ds, deg, iters)


def _pagerank_broadcast(edges_ds, deg, iters: int):
    import ray
    import ray.data

    deg_df = deg.to_pandas()  # node table, ≤ cap rows by construction
    order = np.argsort(deg_df["src"].to_numpy(), kind="stable")
    nodes = deg_df["src"].to_numpy()[order]
    sdeg = deg_df["sdeg"].to_numpy()[order]
    r = np.full(len(nodes), PR_R0, dtype=np.int64)
    edges = edges_ds.materialize()

    for _ in range(iters):
        contrib_ref = ray.put((nodes, r // sdeg))

        def contrib(batch: pa.Table) -> pa.Table:
            n, c = ray.get(contrib_ref)
            src = batch.column("src").to_numpy()
            dst = batch.column("dst").to_numpy()
            vals = c[np.searchsorted(n, src)]
            # in-batch dst combiner: the shuffle moves ≤ nodes rows
            # per block instead of one row per edge
            uniq, inv = np.unique(dst, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, vals)
            return pa.table({"dst": pa.array(uniq), "c": pa.array(sums)})

        # driver sum-combine of the compact per-block partials (the
        # broadcast contract already holds node-length arrays on the
        # driver) — one streaming execution per iteration, no groupby
        # shuffle; value-identical to the former groupby-Sum
        from robosat_ray.stages.bfs import combine_partials

        sums, touched = combine_partials(
            edges.map_batches(contrib, batch_format="pyarrow"),
            nodes, 0, np.add, key="dst", val="c",
        )
        r = np.full(len(nodes), PR_TELEPORT, dtype=np.int64)  # no in-edges → teleport only
        r[touched] = _update(sums[touched])
        del contrib_ref

    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "rank_micro": pa.array(r)})
    )


def _pagerank_shuffle(edges_ds, deg, iters: int):
    from ray.data.aggregate import Sum

    from robosat_ray.stages.join import copartition_join

    hints_e = {
        "left": {"src": pa.int64(), "dst": pa.int64()},
        "right": {"src": pa.int64(), "sdeg": pa.int64()},
    }
    edges3 = copartition_join(edges_ds, deg, on="src", how="inner",
                              schema_hints=hints_e).materialize()

    def init_ranks(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("src"),
                "r": pa.array(np.full(len(batch), PR_R0, np.int64)),
            }
        )

    ranks = deg.map_batches(init_ranks, batch_format="pyarrow").materialize()

    hints_j = {
        "left": {"src": pa.int64(), "dst": pa.int64(), "sdeg": pa.int64()},
        "right": {"src": pa.int64(), "r": pa.int64()},
    }
    for _ in range(iters):
        j = copartition_join(edges3, ranks, on="src", how="inner",
                             schema_hints=hints_j)

        def contrib(batch: pa.Table) -> pa.Table:
            r = batch.column("r").to_numpy()
            d = batch.column("sdeg").to_numpy()
            return pa.table(
                {"dst": batch.column("dst"), "c": pa.array(r // d)}
            )

        sums = (
            j.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="s"))
        )

        def update(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch.column("dst"),
                    "r": pa.array(_update(batch.column("s").to_numpy())),
                }
            )

        ranks = sums.map_batches(update, batch_format="pyarrow").materialize()

    def final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch.column("src"), "rank_micro": batch.column("r")}
        )

    return ranks.map_batches(final, batch_format="pyarrow")


HITS_ITERS = 3


def hits_scores(edges_ds, iters: int = HITS_ITERS, strategy: str = "auto",
                broadcast_cap: int = PR_BROADCAST_NODE_CAP):
    """Unnormalized integer HITS (Kleinberg hubs/authorities), the
    two-coupled-vector Pregel loop PageRank's single vector can't
    express: a_k(dst) = sum_in h_{k-1}, h_k(src) = sum_out a_k.
    h_0 = 1. Exact int64 (values grow ~deg^2 per round; asserted
    within range). edges_ds must contain every node as src and dst
    (symmetric bipartite encoding, as q_pagerank builds).
    -> Dataset (node, hub, auth) after `iters` rounds."""
    from ray.data.aggregate import Count

    deg = edges_ds.groupby("src").aggregate(Count(alias_name="sdeg"))
    if strategy == "auto":
        strategy = "broadcast" if deg.count() <= broadcast_cap else "shuffle"
    if strategy == "broadcast":
        return _hits_broadcast(edges_ds, deg, iters)
    return _hits_shuffle(edges_ds, deg, iters)


def _edge_gather_sum(edges, nodes: np.ndarray, vals: np.ndarray,
                     key_in: str, key_out: str) -> np.ndarray:
    """sum over edges of vals[key_in] grouped by key_out, via compact
    per-block partials combined on the driver (nodes-length arrays)."""
    import ray

    from robosat_ray.stages.bfs import combine_partials

    ref = ray.put((nodes, vals))

    def contrib(batch: pa.Table) -> pa.Table:
        n, v = ray.get(ref)
        src = batch.column(key_in).to_numpy()
        dst = batch.column(key_out).to_numpy()
        c = v[np.searchsorted(n, src)]
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, c)
        return pa.table({"dst": pa.array(uniq), "c": pa.array(sums)})

    sums, touched = combine_partials(
        edges.map_batches(contrib, batch_format="pyarrow"),
        nodes, 0, np.add, key="dst", val="c",
    )
    out = np.zeros(len(nodes), dtype=np.int64)
    out[touched] = sums[touched]
    assert np.abs(out).max(initial=0) < 1 << 61, "HITS int64 growth bound"
    return out


def _hits_broadcast(edges_ds, deg, iters: int):
    import ray
    import ray.data

    deg_df = deg.to_pandas()
    nodes = np.sort(deg_df["src"].to_numpy(np.int64))
    h = np.ones(len(nodes), dtype=np.int64)
    a = np.zeros(len(nodes), dtype=np.int64)
    edges = edges_ds.materialize()
    for _ in range(iters):
        a = _edge_gather_sum(edges, nodes, h, "src", "dst")
        h = _edge_gather_sum(edges, nodes, a, "dst", "src")
    return ray.data.from_arrow(
        pa.table(
            {"node": pa.array(nodes), "hub": pa.array(h), "auth": pa.array(a)}
        )
    )


def _hits_shuffle(edges_ds, deg, iters: int):
    from ray.data.aggregate import Sum

    from robosat_ray.stages.join import copartition_join

    edges = edges_ds.materialize()

    def init_h(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("src"),
                "hv": pa.array(np.ones(len(batch), np.int64)),
            }
        )

    h = deg.map_batches(init_h, batch_format="pyarrow").materialize()
    a = None
    he = {"left": {"src": pa.int64(), "dst": pa.int64()},
          "right": {"src": pa.int64(), "hv": pa.int64()}}
    ha = {"left": {"src": pa.int64(), "dst": pa.int64()},
          "right": {"dst": pa.int64(), "av": pa.int64()}}
    for _ in range(iters):
        j = copartition_join(edges, h, on="src", how="inner", schema_hints=he)

        def to_a(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"dst": batch.column("dst"), "c": batch.column("hv")}
            )

        a = (
            j.map_batches(to_a, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="av"))
            .materialize()
        )
        j2 = copartition_join(edges, a, on="dst", how="inner", schema_hints=ha)

        def to_h(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"src": batch.column("src"), "c": batch.column("av")}
            )

        h = (
            j2.map_batches(to_h, batch_format="pyarrow")
            .groupby("src")
            .aggregate(Sum("c", alias_name="hv"))
            .materialize()
        )

    hn = h.map_batches(
        lambda b: b.rename_columns(["node", "hub"]), batch_format="pyarrow"
    )
    an = a.map_batches(
        lambda b: b.rename_columns(["node", "auth"]), batch_format="pyarrow"
    )
    out = copartition_join(
        hn, an, on="node",
        schema_hints={"left": {"node": pa.int64(), "hub": pa.int64()},
                      "right": {"node": pa.int64(), "auth": pa.int64()}},
    )
    return out.select_columns(["node", "hub", "auth"])
