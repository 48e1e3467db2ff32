"""Bloom-filter semi-join — probabilistic filter pushdown, the classic
big-join prefilter (build a tiny bit array over the small side's keys,
broadcast it, drop big-side rows that can't match BEFORE the shuffle).

The filter is DETERMINISTIC (md5-derived bit positions, the codebase's
md5_number convention), so its false positives are reproducible and the
ENTIRE op — build, probe, FP set included — has a bit-exact DuckDB twin
(oracle.BLOOM_JOIN). This is the semi-join the engine would place in
front of a distributed join at 10^12 rows; the exact subset op (J4)
remains for when the key set itself fits a broadcast.

Spec: m = 32768 bits (4 KiB broadcast, corpus-size-independent), h = 2
positions per key: pos_i(x) = md5_64('bl<i>-' || x) mod m, where
md5_64 is the little-endian low 8 bytes of md5 (== DuckDB md5_number
mod 2^64).

Relation to stages/join.py's Bloom runtime filter (BLOOM_K=7
splitmix64, used by recent_lineitems): that one ACCELERATES an exact
semi-join (FPs removed downstream, hash needs no SQL twin, so it uses
the faster fully-vectorized mix); this one IS the final operator (FPs
part of the deterministic output), which forces the md5_number hash
the oracle can replicate. Same build/probe shape, different contracts.

Scale shape: the build side streams to per-block partial bitmaps
(m/64 uint64 words per block) OR-merged on the driver; the probe side
is a pure map with an in-batch per-UNIQUE-key md5 (worker-lifetime
cached — keys repeat across lineitems), then an in-batch partial
aggregate so the final groupby sees (groups x blocks) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BLOOM_M = 32768  # bits
BLOOM_H = 2

_BLOOM_HASH_CACHE: dict[tuple[int, int], int] = {}


def bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n,) int64 keys -> (n, BLOOM_H) int64 bit positions in [0, m).
    md5 once per (salt, unique key) per worker lifetime."""
    from robosat_ray.functions.text_hash import hash64

    cache = _BLOOM_HASH_CACHE

    def pos(i: int, v: int) -> int:
        r = cache.get((i, v))
        if r is None:
            r = hash64(f"bl{i}-{v}") % BLOOM_M
            if len(cache) < 4_000_000:
                cache[(i, v)] = r
        return r

    uniq, inv = np.unique(keys, return_inverse=True)
    out = np.empty((len(uniq), BLOOM_H), dtype=np.int64)
    for i in range(BLOOM_H):
        out[:, i] = np.fromiter(
            (pos(i, int(v)) for v in uniq), dtype=np.int64, count=len(uniq)
        )
    return out[inv]


def build_bloom(keys_ds, column: str) -> np.ndarray:
    """Stream the build side into per-block partial bitmaps, OR-merge
    driver-side -> (m/64,) uint64 words."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(column).to_numpy().astype(np.int64)
        words = np.zeros(BLOOM_M // 64, dtype=np.uint64)
        if len(keys):
            p = bloom_positions(keys).ravel()
            np.bitwise_or.at(words, p // 64, np.uint64(1) << (p % 64).astype(np.uint64))
        return pa.table({"w": pa.array([words], pa.list_(pa.uint64()))})

    merged = np.zeros(BLOOM_M // 64, dtype=np.uint64)
    for row in keys_ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged |= np.asarray(row["w"], dtype=np.uint64)
    return merged


def _member_mask(keys: np.ndarray, words: np.ndarray) -> np.ndarray:
    p = bloom_positions(keys)
    ok = np.ones(len(keys), dtype=bool)
    for i in range(BLOOM_H):
        bit = (words[p[:, i] // 64] >> (p[:, i] % 64).astype(np.uint64)) & np.uint64(1)
        ok &= bit.astype(bool)
    return ok


def bloom_semijoin_agg(lineitem_ds, urgent_orders_ds):
    """lineitem rows whose l_orderkey passes the Bloom filter built
    over urgent order keys -> (l_returnflag, n_pass, sum_qty).
    False positives are part of the (deterministic) output — that IS
    the operator's contract; the exact semi-join is op J4."""
    import ray
    from ray.data.aggregate import Sum

    words = build_bloom(urgent_orders_ds, "o_orderkey")
    ref = ray.put(words)

    def probe(batch: pa.Table, _ref=ref) -> pa.Table:
        import pandas as pd

        w = ray.get(_ref)
        keys = batch.column("l_orderkey").to_numpy().astype(np.int64)
        ok = _member_mask(keys, w)
        flags = np.asarray(batch.column("l_returnflag").to_pandas(), dtype="U1")[ok]
        qty = batch.column("l_quantity").to_numpy()[ok].astype(np.int64)
        codes, uniq = pd.factorize(flags, sort=True)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, codes, qty)
        return pa.table(
            {
                "l_returnflag": pa.array(list(uniq), pa.string()),
                "n_pass": pa.array(n),
                "sum_qty": pa.array(s),
            }
        )

    return (
        lineitem_ds.map_batches(probe, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n_pass", alias_name="n_pass"), Sum("sum_qty", alias_name="sum_qty")
        )
    )
