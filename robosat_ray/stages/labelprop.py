"""K-round synchronous min-label propagation — the bounded community
detector of the Pregel family (label = min node id reachable within K
hops). Complements the graph suite: bfs.py propagates DISTANCE from
one source, sssp.py weighted distance, runtime/components.py runs CC
to a FIXED POINT for the dedup clusters; this is the K-round label
wave every node seeds — the classic "community id" building block
(Raghavan et al. 2007, synchronous deterministic min-rule variant, so
the result is exactly SQL-mirrorable).

Semantics (mirrored bit-for-bit in oracle.LABEL_PROP):
- l_0(n) = n for EVERY node (isolated points are their own community)
- l_{k+1}(n) = min(l_k(n), min over neighbors m of l_k(m))
- community(n) = l_K(n),  K = LP_K

Two round strategies (the engine's standard broadcast/shuffle switch,
flip-tested bit-equal in tests/test_labelprop.py):
- broadcast (nodes-with-edges <= LP_BROADCAST_NODE_CAP): labels live
  on the driver as sorted numpy arrays; each round ships ONLY the
  delta frontier (nodes whose label changed) via ray.put, expands it
  over the materialized edge list with an in-batch per-dst min
  compaction, and combines the compact partials driver-side
  (bfs.combine_partials with np.minimum).
- shuffle (bigger graphs): frontier ⋈ edges co-partition join emits
  (dst, lbl) messages, per-batch min compaction + groupby-min, then a
  co-partition left join against the label table keeps strict
  improvements; per-round traffic is frontier-degree bounded plus one
  node-bounded label rewrite.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

LP_K = 5
LP_BROADCAST_NODE_CAP = 2_000_000


def _lp_broadcast(edges, deg_ds, k: int) -> tuple[np.ndarray, np.ndarray]:
    """-> (sorted nodes-with-edges, their final labels)."""
    import ray

    from robosat_ray.stages.bfs import combine_partials

    nodes = np.sort(deg_ds.to_pandas()["src"].to_numpy())
    lbl = nodes.copy()
    f_nodes, f_lbl = nodes, lbl

    for _ in range(k):
        if len(f_nodes) == 0:
            break
        fref = ray.put((f_nodes, f_lbl))

        def expand(batch: pa.Table, _f=fref) -> pa.Table:
            fn, fl = ray.get(_f)
            s = batch.column("src").to_numpy()
            t = batch.column("dst").to_numpy()
            pos = np.searchsorted(fn, s)
            hit = (pos < len(fn)) & (fn[np.clip(pos, 0, len(fn) - 1)] == s)
            t, msg = t[hit], fl[pos[hit]]
            # in-batch per-dst min compaction
            uniq, inv = np.unique(t, return_inverse=True)
            best = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(best, inv, msg)
            return pa.table({"node": pa.array(uniq), "lbl": pa.array(best)})

        cand, seen = combine_partials(
            edges.map_batches(expand, batch_format="pyarrow"),
            nodes, np.iinfo(np.int64).max, np.minimum, val="lbl",
        )
        improved = seen & (cand < lbl)
        lbl = np.where(improved, cand, lbl)
        f_nodes, f_lbl = nodes[improved], lbl[improved]
        del fref
    return nodes, lbl


def _lp_shuffle(edges, deg_ds, k: int, num_buckets: int):
    """-> Dataset (node, lbl) over exactly the nodes with edges."""
    import ray.data

    from robosat_ray.stages.join import compact_arrow, copartition_join

    def init_rows(batch: pa.Table) -> pa.Table:
        n = batch.column("src")
        return pa.table({"node": n, "lbl": n})

    labels = deg_ds.map_batches(init_rows, batch_format="pyarrow").materialize()
    frontier = labels
    hints_exp = {
        "left": {"node": pa.int64(), "lbl": pa.int64()},
        "right": {"node": pa.int64(), "dst": pa.int64()},
    }
    hints_upd = {
        "left": {"node": pa.int64(), "cand": pa.int64()},
        "right": {"node": pa.int64(), "lbl": pa.int64()},
    }

    def e_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("src"), "dst": batch.column("dst")})

    edges_n = edges.map_batches(e_rows, batch_format="pyarrow").materialize()

    for _ in range(k):
        if frontier.count() == 0:
            break
        cand = copartition_join(
            frontier, edges_n, on="node", how="inner",
            num_buckets=num_buckets, schema_hints=hints_exp,
        )

        def msg_min(batch: pa.Table) -> pa.Table:
            t = batch.column("dst").to_numpy()
            m = batch.column("lbl").to_numpy()
            uniq, inv = np.unique(t, return_inverse=True)
            best = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(best, inv, m)
            return pa.table({"node": pa.array(uniq), "cand": pa.array(best)})

        cand_min = (
            compact_arrow(cand.map_batches(msg_min, batch_format="pyarrow"))
            .groupby("node")
            .min("cand")
        )

        def norm_cols(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch.column("node"), "cand": batch.column("min(cand)")}
            )

        cand_min = cand_min.map_batches(norm_cols, batch_format="pyarrow")
        joined = copartition_join(
            cand_min, labels, on="node", how="left",
            num_buckets=num_buckets, schema_hints=hints_upd,
        )

        def improvements(batch: pa.Table) -> pa.Table:
            c = batch.column("cand").to_numpy(zero_copy_only=False)
            l = batch.column("lbl").to_numpy(zero_copy_only=False)
            # every cand node has edges, so lbl is never null here —
            # fail loudly rather than gather a wrong slot
            assert not pd.isna(l).any(), "message for node outside label table"
            keep = c.astype(np.int64) < l.astype(np.int64)
            return pa.table(
                {
                    "node": pa.array(
                        batch.column("node").to_numpy()[keep]
                    ),
                    "lbl": pa.array(c[keep].astype(np.int64)),
                }
            )

        new = compact_arrow(
            joined.map_batches(improvements, batch_format="pyarrow")
        ).materialize()
        if new.count() == 0:
            break
        def rename_new(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch.column("node"), "lbl_new": batch.column("lbl")}
            )

        hints_lab = {
            "left": {"node": pa.int64(), "lbl": pa.int64()},
            "right": {"node": pa.int64(), "lbl_new": pa.int64()},
        }
        merged = copartition_join(
            labels,
            new.map_batches(rename_new, batch_format="pyarrow"),
            on="node", how="left",
            num_buckets=num_buckets, schema_hints=hints_lab,
        )

        def apply_new(batch: pa.Table) -> pa.Table:
            old = batch.column("lbl").to_numpy(zero_copy_only=False)
            upd = batch.column("lbl_new").to_numpy(zero_copy_only=False)
            out = np.where(pd.isna(upd), old, upd).astype(np.int64)
            return pa.table({"node": batch.column("node"), "lbl": pa.array(out)})

        labels = compact_arrow(
            merged.map_batches(apply_new, batch_format="pyarrow")
        ).materialize()
        frontier = new
    return labels


class _AttachLabel:
    """community per input node; nodes without edges are their own
    community (label = own id)."""

    def __init__(self, ref, id_col: str):
        import ray

        self.nodes, self.lbl = ray.get(ref) if not isinstance(ref, tuple) else ref
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        out = ids.astype(np.int64).copy()
        if len(self.nodes):
            pos = np.searchsorted(self.nodes, ids)
            hit = (pos < len(self.nodes)) & (
                self.nodes[np.clip(pos, 0, len(self.nodes) - 1)] == ids
            )
            out[hit] = self.lbl[pos[hit]]
        return pa.table({self.id_col: pa.array(ids), "community": pa.array(out)})


def label_prop(edges_ds, nodes_ds, id_col: str = "node", k: int = LP_K,
               strategy: str = "auto",
               broadcast_cap: int = LP_BROADCAST_NODE_CAP,
               num_buckets: int | None = None):
    """edges_ds: (src:int64, dst:int64), BOTH directions for
    undirected graphs. nodes_ds: full node universe (column `id_col`).
    -> Dataset (id_col, community)."""
    import ray

    from robosat_ray.stages.bfs import _degrees

    edges = edges_ds.materialize()
    deg = _degrees(edges).materialize()
    if strategy == "auto":
        strategy = "broadcast" if deg.count() <= broadcast_cap else "shuffle"

    if strategy == "broadcast":
        nodes, lbl = _lp_broadcast(edges, deg, k)
        ref = ray.put((nodes, lbl))
        return nodes_ds.map_batches(
            _AttachLabel, fn_constructor_args=(ref, id_col),
            batch_format="pyarrow", concurrency=(1, 8), num_cpus=1,
        )

    from robosat_ray.stages.join import NUM_JOIN_BUCKETS, copartition_join

    lab_ds = _lp_shuffle(edges, deg, k, num_buckets or NUM_JOIN_BUCKETS)

    def node_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column(id_col)})

    hints = {
        "left": {"node": pa.int64()},
        "right": {"node": pa.int64(), "lbl": pa.int64()},
    }
    lab = copartition_join(
        nodes_ds.map_batches(node_rows, batch_format="pyarrow"),
        lab_ds, on="node", how="left",
        num_buckets=num_buckets or NUM_JOIN_BUCKETS, schema_hints=hints,
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy()
        l = batch.column("lbl").to_numpy(zero_copy_only=False)
        out = np.where(pd.isna(l), n, l).astype(np.int64)
        return pa.table({id_col: pa.array(n), "community": pa.array(out)})

    return lab.map_batches(finish, batch_format="pyarrow")
