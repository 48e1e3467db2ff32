"""Spatial statistics over the geocoded tile grid: global Moran's I
spatial autocorrelation of per-tile page counts (rook adjacency).

Everything is algebraic partials — no broadcast table, no driver
materialization of the grid. The mean-centering that makes Moran's I
look non-distributable is folded out exactly:

    z_i = N*n_i - S   (integer; N tiles, S total pages)
    num = sum_{i~j} z_i z_j = N^2*P1 - N*S*P2 + S^2*W
    den = N * sum_i z_i^2 = ... = N^2*SN2 - N*S^2   (up to the 1/N)

with P1 = sum n_i n_j, P2 = sum (n_i + n_j), W = #ordered adjacent
pairs, SN2 = sum n_i^2 — ALL plain sums of per-cell partials. The
final combine is exact Python-int arithmetic on five scalars.
Moran's I itself = (N / W) * num / den using the returned integers.

Reference analog: robosat has no spatial stats, but the tile grid and
adjacency are its core key space (`robosat/tiles.py:139-227` adjacent
tiles); this is the analytics layer a web-scale tile table needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray import constants as C

_NI = 1 << C.Z_JOIN
N_STAT_BUCKETS = 64


def _neighbor_messages(batch: pa.Table) -> pa.Table:
    """Each occupied cell emits its home row plus one message per
    in-range rook neighbor (no antimeridian wrap: out-of-range x or y
    neighbors are dropped, matching the oracle's inner join). Rows are
    keyed by a hash bucket of the DESTINATION cell so the regroup is a
    64-bucket shuffle, not one tiny group per cell."""
    from robosat_ray.functions.hashing import hash_bucket

    cell = batch.column("cell").to_numpy()
    n = batch.column("n").to_numpy().astype(np.int64)
    tx = cell // _NI
    ty = cell % _NI
    keys = [cell]
    vals = [n]
    homes = [np.ones(len(cell), dtype=np.int64)]
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        nx, ny = tx + dx, ty + dy
        ok = (nx >= 0) & (nx < _NI) & (ny >= 0) & (ny < _NI)
        keys.append((nx * _NI + ny)[ok])
        vals.append(n[ok])
        homes.append(np.zeros(int(ok.sum()), dtype=np.int64))
    key = np.concatenate(keys)
    return pa.table(
        {
            "key": pa.array(key),
            "n": pa.array(np.concatenate(vals)),
            "home": pa.array(np.concatenate(homes)),
            "mbucket": pa.array(hash_bucket(key, N_STAT_BUCKETS)),
        }
    )


def _bucket_partials(group: pd.DataFrame) -> pd.DataFrame:
    """One destination-hash bucket: vectorized per-cell combine of the
    home count with its neighbor messages, summed to SIX scalars per
    bucket (the whole bucket collapses — no per-cell rows leave)."""
    key = group["key"].to_numpy(np.int64)
    n = group["n"].to_numpy(np.int64)
    home = group["home"].to_numpy(np.int64) == 1
    order = np.argsort(key, kind="stable")
    key, n, home = key[order], n[order], home[order]
    uniq, inv = np.unique(key, return_inverse=True)
    k = len(uniq)
    # home count per cell (0 if the destination is unoccupied)
    nj = np.zeros(k, dtype=np.int64)
    nj[inv[home]] = n[home]
    occupied = np.zeros(k, dtype=bool)
    occupied[inv[home]] = True
    msg = ~home
    deg = np.bincount(inv[msg], minlength=k)
    sm = np.zeros(k, dtype=np.int64)
    np.add.at(sm, inv[msg], n[msg])  # exact int64 (the np.add.at idiom)
    occ = occupied
    return pd.DataFrame(
        {
            "w": [np.int64(deg[occ].sum())],
            "p1": [np.int64((nj[occ] * sm[occ]).sum())],
            "p2": [np.int64((deg[occ] * nj[occ] + sm[occ]).sum())],
            "nt": [np.int64(occ.sum())],
            "s": [np.int64(nj[occ].sum())],
            "sn2": [np.int64((nj[occ] * nj[occ]).sum())],
        }
    )


def moran_i(points_ds):
    """-> one row (n_tiles, w_pairs, moran_num, moran_den): exact
    integer numerator/denominator of Moran's I over per-tile page
    counts with rook (4-neighbor) adjacency at the join zoom.
    moran_num = sum over ordered adjacent pairs of z_i z_j and
    moran_den = N * sum z_i^2 with z_i = N*n_i - S; the usual
    I = (N/W) * (sum z_i z_j / sum z_i^2) = moran_num * N /
    (W * moran_den / N)... callers use I = (N * moran_num) /
    (W * moran_den / N) — both integers are returned so any float
    presentation stays a pure driver-side formatting choice.

    Scale shape: points -> ONE cell groupby (count), cell table ->
    ONE message groupby (adjacency), per-cell algebraic partials,
    global Sum. No broadcast, no driver grid. Oracle: oracle.MORAN."""
    from ray.data.aggregate import Count, Sum

    counts = points_ds.select_columns(["cell"]).groupby("cell").aggregate(
        Count(alias_name="n")
    )
    partials = (
        counts.map_batches(_neighbor_messages, batch_format="pyarrow")
        .groupby("mbucket")
        .map_groups(_bucket_partials, batch_format="pandas")
    )
    agg = partials.aggregate(
        Sum("w", alias_name="w"),
        Sum("p1", alias_name="p1"),
        Sum("p2", alias_name="p2"),
        Sum("nt", alias_name="nt"),
        Sum("s", alias_name="s"),
        Sum("sn2", alias_name="sn2"),
    )
    # exact Python-int combine of five scalars (no overflow: Python int)
    w, p1, p2, nt, s, sn2 = (
        int(agg["w"]),
        int(agg["p1"]),
        int(agg["p2"]),
        int(agg["nt"]),
        int(agg["s"]),
        int(agg["sn2"]),
    )
    num = nt * nt * p1 - nt * s * p2 + s * s * w
    den = nt * nt * sn2 - nt * s * s
    return pd.DataFrame(
        {
            "n_tiles": [np.int64(nt)],
            "w_pairs": [np.int64(w)],
            "moran_num": [np.int64(num)],
            "moran_den": [np.int64(den)],
        }
    )
