"""Exact grid-DBSCAN (Ester et al. 1996) over the derived page
points — the density-based spatial clustering every geo pipeline
reaches for once hexbin counts aren't enough. Beyond-reference scope
(robosat has no clustering tool); the spatial machinery mirrors the
reference's tile-partitioned thinking (cover/merge:
/root/reference/robosat/tools/merge.py:47-56 adjacency semantics).

Deterministic, integer-exact contract (mirrored bit-for-bit in
oracle.DBSCAN):

- plane: xq = floor((lon+180)/360 * 2^DB_Q), yq = floor(my * 2^DB_Q)
  (the tile_x/tile_y floor chain at zoom DB_Q — verified bit-identical
  numpy vs DuckDB elsewhere in the repo)
- eps-neighbor: (dx^2 + dy^2) <= DB_R^2 on the quantized plane
- core: |N_eps(p)| >= DB_MINPTS, where the neighborhood INCLUDES p
- cluster label: MIN doc_id over the cluster's core points (min-label
  CC over the core-core eps graph)
- border: non-core with >= 1 core eps-neighbor; label = MIN over its
  core neighbors' cluster labels (the deterministic tie rule — classic
  DBSCAN assigns to the first-discovered core, which is scan-order
  dependent)
- noise: everything else; label -1, role 'noise'

Scale shape: points emit into the 3x3 grid cells of side DB_R around
their home cell (9 compact rows each), so every eps-pair co-occurs in
exactly one cell group — pair (p, q) is mined ONCE, in the smaller
doc_id's home cell. The per-cell resident x member distance check is
the algorithm's inherent local quadratic (same contract as SemDeDup's
within-cluster scan); cell side == eps bounds it to the eps-disc
density. Everything downstream operates on the PAIR table (bounded by
true eps-pair volume, far below n^2 under any sane eps): below
DBSCAN_DRIVER_PAIR_CAP pairs the flags/CC/labels resolve on the driver
(numpy bincount + min-label union-find) and broadcast as three sorted
arrays; above it, the documented distributed path runs the same logic
as co-partition groupbys + runtime.components.distributed_components
(no broadcast anywhere). Both paths proven bit-equal by the
strategy-flip test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray import constants as C
from robosat_ray.functions.hashing import hash_bucket

# pairs are 16 bytes/row on the driver: 20M ~= 320 MB, comfortably
# inside a driver heap; above it the co-partition + distributed-CC
# path takes over (correct but execution-overhead-bound on a single
# node — the runtime/components caveat; on a real cluster the shuffles
# parallelize)
DBSCAN_DRIVER_PAIR_CAP = 20_000_000
_CELL_M = 1 << 21  # cell-key packing stride (cell coords < 2^DB_Q / DB_R)
_N_BUCKETS = 64


def _quantize(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ids = batch.column("doc_id").to_numpy()
    lon = batch.column("lon").to_numpy()
    my = batch.column("my").to_numpy()
    n = float(1 << C.DB_Q)
    xq = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    yq = np.floor(my * n).astype(np.int64)
    return ids, xq, yq


def _emit9(batch: pa.Table) -> pa.Table:
    """Each point -> 9 rows, one per cell of the 3x3 block around its
    home cell; is_res marks the home-cell row. Cell side == DB_R, so
    any eps-pair shares at least the smaller point's home cell."""
    ids, xq, yq = _quantize(batch)
    cx, cy = xq // C.DB_R, yq // C.DB_R
    n = len(ids)
    out_ck, out_res = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            out_ck.append((cx + dx) * _CELL_M + (cy + dy))
            out_res.append(
                np.full(n, dx == 0 and dy == 0, dtype=np.bool_)
            )
    ck = np.concatenate(out_ck)
    return pa.table(
        {
            "ck": pa.array(ck),
            "doc_id": pa.array(np.tile(ids, 9)),
            "xq": pa.array(np.tile(xq, 9)),
            "yq": pa.array(np.tile(yq, 9)),
            "is_res": pa.array(np.concatenate(out_res)),
        }
    )


def _mine_pairs(group: pd.DataFrame, with_d2: bool = False) -> pd.DataFrame:
    """One cell group: residents x all members, keep dist^2 <= R^2 and
    resident.doc_id < member.doc_id — each unordered eps-pair is
    emitted exactly once across all groups (in the smaller id's home
    cell, which the larger id's 3x3 emit always covers). with_d2 adds
    the quantized squared distance column (sssp edge weights)."""
    ids = group["doc_id"].to_numpy()
    xq = group["xq"].to_numpy()
    yq = group["yq"].to_numpy()
    res = group["is_res"].to_numpy()
    ri = np.flatnonzero(res)
    if len(ri) == 0 or len(ids) < 2:
        empty = pd.Series([], dtype=np.int64)
        cols = {"a": empty, "b": empty}
        if with_d2:
            cols["d2"] = empty
        return pd.DataFrame(cols)
    dx = xq[ri][:, None] - xq[None, :]
    dy = yq[ri][:, None] - yq[None, :]
    d2 = dx * dx + dy * dy
    ok = (d2 <= C.DB_R * C.DB_R) & (ids[ri][:, None] < ids[None, :])
    ai, bj = np.nonzero(ok)
    out = {"a": ids[ri][ai], "b": ids[bj]}
    if with_d2:
        out["d2"] = d2[ai, bj]
    return pd.DataFrame(out)


def eps_pairs(pts_ds, with_d2: bool = False):
    """points (doc_id, lon, my) -> materialized pairs Dataset (a, b
    [, d2]): all unordered eps-pairs, each exactly once. ONE groupby
    shuffle of 9 compact rows per point."""
    import functools

    rows = pts_ds.map_batches(_emit9, batch_format="pyarrow")
    return (
        rows.groupby("ck")
        .map_groups(
            functools.partial(_mine_pairs, with_d2=with_d2),
            batch_format="pandas",
        )
        .materialize()
    )


def _resolve_driver(pairs: pd.DataFrame):
    """pairs -> (sorted ids appearing in pairs, role code 1=core
    2=border, label) numpy triple, all derived with bincount /
    union-find / lexsort. Points absent from pairs are noise (deg 0 <
    minPts - 1)."""
    from robosat_ray.geo.graph import min_label_arrays

    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    ids = np.unique(np.concatenate([a, b]))
    deg = np.bincount(np.searchsorted(ids, a), minlength=len(ids))
    deg += np.bincount(np.searchsorted(ids, b), minlength=len(ids))
    core = deg + 1 >= C.DB_MINPTS
    ca = core[np.searchsorted(ids, a)]
    cb = core[np.searchsorted(ids, b)]
    # min-label CC over core-core edges
    both = ca & cb
    uniq, lab = min_label_arrays(ids[core], a[both], b[both])
    # attach cluster labels to core points (uniq covers exactly ids[core])
    label = np.full(len(ids), -1, dtype=np.int64)
    label[core] = lab[np.searchsorted(uniq, ids[core])]
    # border: exactly-one-core pairs, min core-label per noncore side
    one_a = ca & ~cb  # a core, b border candidate
    one_b = cb & ~ca
    nc = np.concatenate([b[one_a], a[one_b]])
    cl = np.concatenate(
        [label[np.searchsorted(ids, a[one_a])], label[np.searchsorted(ids, b[one_b])]]
    )
    role = np.where(core, 1, 0).astype(np.int8)
    if len(nc):
        order = np.lexsort((cl, nc))
        nc, cl = nc[order], cl[order]
        first = np.concatenate([[True], nc[1:] != nc[:-1]])
        pos = np.searchsorted(ids, nc[first])
        label[pos] = cl[first]  # min label = first after lexsort
        role[pos] = 2
    return ids, role, label


class _Assign:
    """Final labeling map: broadcast (sorted ids, role, label) arrays,
    searchsorted per batch; points outside the arrays are noise."""

    def __init__(self, ref):
        import ray

        self.ids, self.role, self.label = (
            ray.get(ref) if not isinstance(ref, tuple) else ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        role = np.zeros(len(ids), np.int8)
        label = np.full(len(ids), -1, dtype=np.int64)
        if len(self.ids):
            pos = np.searchsorted(self.ids, ids)
            hit = (pos < len(self.ids)) & (
                self.ids[np.clip(pos, 0, len(self.ids) - 1)] == ids
            )
            role[hit] = self.role[pos[hit]]
            label[hit] = self.label[pos[hit]]
        names = np.array(["noise", "core", "border"])
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "role": pa.array(names[role], pa.string()),
                "label": pa.array(label),
            }
        )


# ---------------------------------------------------------------------------
# distributed path (pairs > DBSCAN_DRIVER_PAIR_CAP): the same rule as
# co-partition groupbys — no driver materialization of pairs, no
# broadcast. Used above the cap; proven bit-equal to the driver path.
# ---------------------------------------------------------------------------


def _degrees_ds(pairs_ds):
    from ray.data.aggregate import Count

    def endpoints_np(bt: pa.Table) -> pa.Table:
        both = np.concatenate([bt.column("a").to_numpy(), bt.column("b").to_numpy()])
        return pa.table({"doc_id": pa.array(both)})

    return pairs_ds.map_batches(endpoints_np, batch_format="pyarrow").groupby(
        "doc_id"
    ).aggregate(Count(alias_name="deg"))


def _attach_flag(pairs_ds, core_ds, side: str, out: str):
    """pairs x core ids -> pairs + boolean column `out` = (side in
    core), via one hash-bucket co-partition groupby (role sentinel)."""

    def pair_rows(bt: pa.Table) -> pa.Table:
        k = bt.column(side).to_numpy()
        t = bt.append_column("__role", pa.array(np.zeros(len(bt), np.int8)))
        return t.append_column("__bk", pa.array(hash_bucket(k, _N_BUCKETS)))

    def core_rows(bt: pa.Table) -> pa.Table:
        k = bt.column("doc_id").to_numpy()
        n = len(k)
        t = pa.table(
            {
                "a": pa.array(k) if side == "a" else pa.array(np.zeros(n, np.int64)),
                "b": pa.array(k) if side == "b" else pa.array(np.zeros(n, np.int64)),
            }
        )
        for col in pairs_ds.schema().names:
            if col not in ("a", "b"):
                t = t.append_column(col, pa.array(np.zeros(n, np.int64)))
        t = t.select(pairs_ds.schema().names)
        t = t.append_column("__role", pa.array(np.ones(n, np.int8)))
        return t.append_column("__bk", pa.array(hash_bucket(k, _N_BUCKETS)))

    both = pairs_ds.map_batches(pair_rows, batch_format="pyarrow").union(
        core_ds.map_batches(core_rows, batch_format="pyarrow")
    )

    def join(group: pd.DataFrame) -> pd.DataFrame:
        is_core_row = group["__role"].to_numpy() == 1
        ck = np.sort(group.loc[is_core_row, side].to_numpy())
        out_df = group[~is_core_row].drop(columns=["__role", "__bk"]).copy()
        k = out_df[side].to_numpy()
        if len(ck):
            pos = np.searchsorted(ck, k)
            flag = (pos < len(ck)) & (ck[np.clip(pos, 0, len(ck) - 1)] == k)
        else:
            flag = np.zeros(len(k), np.bool_)
        out_df[out] = flag.astype(np.int64)  # int64 keeps the union
        # schema uniform (core sentinel rows carry int64 zero columns)
        return out_df

    return both.groupby("__bk").map_groups(join, batch_format="pandas")


def _resolve_distributed(pairs_ds, pts_ds):
    """The driver-path rule as Dataset stages. Returns the final
    (doc_id, role, label) Dataset."""
    from ray.data.aggregate import Min

    from robosat_ray.runtime.components import distributed_components

    deg = _degrees_ds(pairs_ds)

    def core_filter(bt: pa.Table) -> pa.Table:
        keep = bt.column("deg").to_numpy() + 1 >= C.DB_MINPTS
        return pa.table({"doc_id": bt.column("doc_id").filter(pa.array(keep))})

    core_ds = deg.map_batches(core_filter, batch_format="pyarrow").materialize()

    flagged = _attach_flag(
        _attach_flag(pairs_ds, core_ds, "a", "ca"), core_ds, "b", "cb"
    ).materialize()

    def core_edges(bt: pa.Table) -> pa.Table:
        keep = pa.array(
            (bt.column("ca").to_numpy() == 1) & (bt.column("cb").to_numpy() == 1)
        )
        f = bt.filter(keep)
        return pa.table({"a": f.column("a"), "b": f.column("b")})

    def core_nodes(bt: pa.Table) -> pa.Table:
        return pa.table({"node": bt.column("doc_id")})

    labels_ds = distributed_components(
        core_ds.map_batches(core_nodes, batch_format="pyarrow"),
        flagged.map_batches(core_edges, batch_format="pyarrow"),
    ).materialize()  # (node, label) for every core point

    # border candidates: exactly one core endpoint -> (nc, core_id)
    def one_core(bt: pa.Table) -> pa.Table:
        a = bt.column("a").to_numpy()
        b = bt.column("b").to_numpy()
        ca = bt.column("ca").to_numpy() == 1
        cb = bt.column("cb").to_numpy() == 1
        oa = ca & ~cb
        ob = cb & ~ca
        return pa.table(
            {
                "nc": pa.array(np.concatenate([b[oa], a[ob]])),
                "node": pa.array(np.concatenate([a[oa], b[ob]])),
            }
        )

    cand = flagged.map_batches(one_core, batch_format="pyarrow")

    # attach the core's cluster label via a node-bucket co-partition
    def cand_rows(bt: pa.Table) -> pa.Table:
        k = bt.column("node").to_numpy()
        t = bt.append_column("label", pa.array(np.zeros(len(bt), np.int64)))
        t = t.append_column("__role", pa.array(np.zeros(len(bt), np.int8)))
        return t.append_column("__bk", pa.array(hash_bucket(k, _N_BUCKETS)))

    def label_rows(bt: pa.Table) -> pa.Table:
        k = bt.column("node").to_numpy()
        t = pa.table(
            {
                "nc": pa.array(np.zeros(len(k), np.int64)),
                "node": pa.array(k),
                "label": bt.column("label"),
            }
        )
        t = t.append_column("__role", pa.array(np.ones(len(k), np.int8)))
        return t.append_column("__bk", pa.array(hash_bucket(k, _N_BUCKETS)))

    def attach_label(group: pd.DataFrame) -> pd.DataFrame:
        lab = group[group["__role"] == 1]
        s = lab["node"].to_numpy()
        order = np.argsort(s, kind="stable")
        s, lv = s[order], lab["label"].to_numpy()[order]
        out_df = group[group["__role"] == 0][["nc", "node"]].copy()
        pos = np.searchsorted(s, out_df["node"].to_numpy())
        assert len(out_df) == 0 or (
            len(s) > 0 and (s[np.clip(pos, 0, len(s) - 1)] == out_df["node"].to_numpy()).all()
        ), "core id missing its label row"
        out_df["label"] = lv[pos]
        return out_df[["nc", "label"]]

    border = (
        cand.map_batches(cand_rows, batch_format="pyarrow")
        .union(labels_ds.map_batches(label_rows, batch_format="pyarrow"))
        .groupby("__bk")
        .map_groups(attach_label, batch_format="pandas")
        .groupby("nc")
        .aggregate(Min("label", alias_name="label"))
    )

    # final: pts U core labels U border labels, resolved per doc bucket
    def pts_rows(bt: pa.Table) -> pa.Table:
        ids = bt.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "label": pa.array(np.full(len(ids), -1, np.int64)),
                "__role": pa.array(np.zeros(len(ids), np.int8)),
                "__bk": pa.array(hash_bucket(ids, _N_BUCKETS)),
            }
        )

    def core_lab_rows(bt: pa.Table) -> pa.Table:
        ids = bt.column("node").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "label": bt.column("label"),
                "__role": pa.array(np.ones(len(ids), np.int8)),
                "__bk": pa.array(hash_bucket(ids, _N_BUCKETS)),
            }
        )

    def border_rows(bt: pa.Table) -> pa.Table:
        ids = bt.column("nc").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "label": bt.column("label"),
                "__role": pa.array(np.full(len(ids), 2, np.int8)),
                "__bk": pa.array(hash_bucket(ids, _N_BUCKETS)),
            }
        )

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["doc_id"].to_numpy()
        role = group["__role"].to_numpy()
        lab = group["label"].to_numpy()
        base = role == 0
        out_ids = ids[base]
        order = np.argsort(out_ids, kind="stable")
        out_ids = out_ids[order]
        out_role = np.zeros(len(out_ids), np.int8)
        out_lab = np.full(len(out_ids), -1, np.int64)
        for rcode in (2, 1):  # border first, core overwrites
            sel = role == rcode
            pos = np.searchsorted(out_ids, ids[sel])
            out_role[pos] = rcode
            out_lab[pos] = lab[sel]
        names = np.array(["noise", "core", "border"])
        return pd.DataFrame(
            {"doc_id": out_ids, "role": names[out_role], "label": out_lab}
        )

    return (
        pts_ds.map_batches(pts_rows, batch_format="pyarrow")
        .union(labels_ds.map_batches(core_lab_rows, batch_format="pyarrow"))
        .union(border.map_batches(border_rows, batch_format="pyarrow"))
        .groupby("__bk")
        .map_groups(finalize, batch_format="pandas")
    )


def dbscan(pts_ds, strategy: str = "auto"):
    """points (doc_id, lon, my) -> (doc_id, role in
    {core,border,noise}, label = min core doc_id of the cluster, -1
    for noise). strategy: 'driver' (pairs resolve on the driver,
    labeling broadcast as sorted arrays), 'distributed' (co-partition
    groupbys + distributed CC, no broadcast), 'auto' switches on
    DBSCAN_DRIVER_PAIR_CAP."""
    import ray

    pts_ds = pts_ds.materialize()  # consumed twice (pairs + labeling)
    pairs = eps_pairs(pts_ds)
    if strategy == "auto":
        strategy = (
            "driver" if pairs.count() <= DBSCAN_DRIVER_PAIR_CAP else "distributed"
        )
    if strategy == "distributed":
        return _resolve_distributed(pairs, pts_ds)
    ids, role, label = _resolve_driver(pairs.to_pandas())
    ref = ray.put((ids, role, label))
    return pts_ds.map_batches(
        _Assign, fn_constructor_args=(ref,),
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=1,
    )
