"""Distributed connected components over a Dataset of edges —
min-label propagation with pointer jumping (Hash-to-Min family,
public literature). Removes the driver-side union-find from the merge
path at 10^12 scale: every step is a groupby shuffle over (node,
label) / (edge endpoint) rows; convergence in O(log diameter) rounds.

Round = edge-relax (labels flow across edges) then pointer-jump
(label(n) <- label(label(n)), halving pointer depth); loop until no
label changes. Node ids and labels are int64; component label = min
node id in the component (same contract as geo.graph).

NOTE: each round is ~5 Dataset executions; on this single-node sandbox
Ray's per-execution overhead (~1-2s) dominates at test scale —
stages/merge.py therefore defaults to the driver union-find (the edge
LIST is tiny relative to the data) and this module is the documented,
tested 10^12-scale path for when the edge list outgrows a driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.functions.hashing import hash_bucket


def _min_by_node(ds):
    from ray.data.aggregate import Min

    return ds.groupby("node").aggregate(Min("label", alias_name="label"))


def _edge_relax(labels_ds, edges_ds):
    """One propagation step: each node's label is offered to all its
    neighbors. Implemented as union + groupby(key) where key carries
    both the label owner and the neighbor requests."""
    def lab_rows(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "key": b.column("node"),
                "role": pa.array(np.zeros(n, np.int8)),
                "val": b.column("label"),
            }
        )

    def edge_rows(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy()
        bb = b.column("b").to_numpy()
        key = np.concatenate([a, bb])
        val = np.concatenate([bb, a])
        n = len(key)
        return pa.table(
            {
                "key": pa.array(key),
                "role": pa.array(np.ones(n, np.int8)),
                "val": pa.array(val),
            }
        )

    both = labels_ds.map_batches(lab_rows, batch_format="pyarrow").union(
        edges_ds.map_batches(edge_rows, batch_format="pyarrow")
    )

    def offer(group: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized (sort + reduceat + searchsorted): per key
        # with a label row, emit (key, min-label) and relay that label
        # to every edge neighbor val — no per-key Python loop
        keys = group["key"].to_numpy(np.int64)
        roles = group["role"].to_numpy(np.int8)
        vals = group["val"].to_numpy(np.int64)
        m0 = roles == 0
        k0, v0 = keys[m0], vals[m0]
        if len(k0) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 "label": pd.Series([], dtype=np.int64)})
        o0 = np.argsort(k0, kind="stable")
        k0, v0 = k0[o0], v0[o0]
        ch = np.empty(len(k0), dtype=bool)
        ch[0] = True
        ch[1:] = k0[1:] != k0[:-1]
        starts = np.nonzero(ch)[0]
        labeled = k0[starts]
        lab = np.minimum.reduceat(v0, starts)
        k1, v1 = keys[~m0], vals[~m0]
        pos = np.clip(np.searchsorted(labeled, k1), 0, len(labeled) - 1)
        has = labeled[pos] == k1
        return pd.DataFrame(
            {
                "node": np.concatenate([labeled, v1[has]]),
                "label": np.concatenate([lab, lab[pos[has]]]),
            }
        )

    def bucket(b: pa.Table) -> pa.Table:
        k = b.column("key").to_numpy()
        return b.append_column("bucket", pa.array(hash_bucket(k, 64)))

    offered = (
        both.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(offer, batch_format="pandas")
    )
    return _min_by_node(offered)


def _pointer_jump(labels_ds):
    """label(n) <- label(label(n)): nodes ask their label-node for ITS
    label (one co-partition groupby), then take the min."""
    def self_rows(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "key": b.column("node"),
                "role": pa.array(np.zeros(n, np.int8)),
                "val": b.column("label"),
            }
        )

    def req_rows(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "key": b.column("label"),
                "role": pa.array(np.ones(n, np.int8)),
                "val": b.column("node"),
            }
        )

    both = labels_ds.map_batches(self_rows, batch_format="pyarrow").union(
        labels_ds.map_batches(req_rows, batch_format="pyarrow")
    )

    def answer(group: pd.DataFrame) -> pd.DataFrame:
        # vectorized like offer(); a key with no label row answers
        # with itself (label = key)
        keys = group["key"].to_numpy(np.int64)
        roles = group["role"].to_numpy(np.int8)
        vals = group["val"].to_numpy(np.int64)
        uniq = np.unique(keys)
        m0 = roles == 0
        k0, v0 = keys[m0], vals[m0]
        lab_all = uniq.copy()  # default: answer with the key itself
        if len(k0):
            o0 = np.argsort(k0, kind="stable")
            k0, v0 = k0[o0], v0[o0]
            ch = np.empty(len(k0), dtype=bool)
            ch[0] = True
            ch[1:] = k0[1:] != k0[:-1]
            starts = np.nonzero(ch)[0]
            lab_all[np.searchsorted(uniq, k0[starts])] = np.minimum.reduceat(v0, starts)
        k1, v1 = keys[~m0], vals[~m0]
        return pd.DataFrame(
            {
                "node": np.concatenate([uniq, v1]),
                "label": np.concatenate([lab_all, lab_all[np.searchsorted(uniq, k1)]]),
            }
        )

    def bucket(b: pa.Table) -> pa.Table:
        k = b.column("key").to_numpy()
        return b.append_column("bucket", pa.array(hash_bucket(k, 64)))

    answered = (
        both.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(answer, batch_format="pandas")
    )
    return _min_by_node(answered)


def distributed_components(nodes_ds, edges_ds, max_rounds: int = 30):
    """nodes (node:int64) x edges (a, b) -> Dataset (node, label=min
    node id of its component). Loops edge-relax + pointer-jump until a
    fixed point (checked by an order-insensitive label checksum)."""
    def init(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"), "label": b.column("node")})

    labels = nodes_ds.map_batches(init, batch_format="pyarrow").materialize()

    def state_sig(lds) -> int:
        # cheap convergence fingerprint: sum of labels (monotonically
        # decreasing under min-propagation, so equal sum == fixed point)
        from ray.data.aggregate import Sum

        return int(lds.aggregate(Sum("label", alias_name="s"))["s"])

    sig = state_sig(labels)
    for _ in range(max_rounds):
        # repartition each round: groupby outputs many small blocks and
        # the union doubles block count per round otherwise (task-count
        # explosion, measured 4s -> 160s/round by round 3)
        labels = _edge_relax(labels, edges_ds).repartition(8).materialize()
        labels = _pointer_jump(labels).repartition(8).materialize()
        new_sig = state_sig(labels)
        if new_sig == sig:
            break
        sig = new_sig
    return labels
