"""Distinct-count operators over the events log (LLM-pipeline family:
corpus cardinality / daily-active-user style statistics).

- daily_active_users: EXACT per-day COUNT(DISTINCT user_id). Shape for
  100 TB: (day, user) pairs are deduped inside each batch first, then
  ONE hash-bucket shuffle co-locates each user's rows (bucket is a
  function of user only, so a pair can never be double-counted across
  buckets); per-bucket nunique rows are tiny and the final per-day Sum
  is a small algebraic groupby. No group ever holds more than one
  user-bucket's pairs — skew-bounded by the well-mixed bucket hash.

- hll_registers / hll_estimate: HyperLogLog sketch (Flajolet et al.
  2007, standard public construction) as an algebraic aggregate:
  per-batch register partials (numpy scatter-max) -> groupby(Max).
  The register table is INTEGER-exact and deterministic (md5-based
  value hash, the same hash64 the minhash family uses), so it is
  oracle-checkable in SQL bit-for-bit; the float estimate is derived
  from the registers on the (4096-row) result. At 100 TB the sketch
  shuffles at most m rows per input block, never raw values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.functions.hashing import hash_bucket

DAY_US = 86_400_000_000

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers
# h // M leaves 64 - 12 = 52 bits; rho = leading zeros in that 52-bit
# field + 1, so rho in [1, 53] for every hashed value
HLL_RHO_MAX = 53

_N_USER_BUCKETS = 64


def _day_user_pairs(batch: pa.Table, n_buckets: int) -> pa.Table:
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    users = batch.column("user_id").to_numpy()
    day = ts // DAY_US
    # in-batch dedup: at most one (day, user) pair leaves per batch
    pair = np.unique(np.stack([day, users], axis=1), axis=0)
    return pa.table(
        {
            "day": pa.array(pair[:, 0]),
            "user_id": pa.array(pair[:, 1]),
            "bucket": pa.array(hash_bucket(pair[:, 1], n_buckets)),
        }
    )


def _bucket_nunique(group: pd.DataFrame) -> pd.DataFrame:
    sub = group.groupby("day", sort=True)["user_id"].nunique()
    return pd.DataFrame(
        {
            "day": sub.index.to_numpy(np.int64),
            "n": sub.to_numpy(np.int64),
        }
    )


def daily_active_users(events_ds, n_buckets: int = _N_USER_BUCKETS):
    """-> (day, n_users): exact distinct users per UTC day."""
    from ray.data.aggregate import Sum

    pairs = events_ds.map_batches(
        lambda b: _day_user_pairs(b, n_buckets), batch_format="pyarrow"
    )
    per_bucket = pairs.groupby("bucket").map_groups(
        _bucket_nunique, batch_format="pandas"
    )
    return per_bucket.groupby("day").aggregate(Sum("n", alias_name="n_users"))


_HLL_HASH_CACHE: dict[int, int] = {}


def _hash_int_values(vals: np.ndarray) -> np.ndarray:
    """md5 per WORKER-lifetime-unique value (the _token_hash cache
    idiom of functions/text_hash.py): values repeat across batches
    (user ids are vocabulary-bounded), so the md5 loop amortizes to
    once per distinct value per worker instead of once per batch."""
    from robosat_ray.functions.text_hash import hash64

    cache = _HLL_HASH_CACHE

    def h(v: int) -> int:
        r = cache.get(v)
        if r is None:
            r = hash64(str(v))
            if len(cache) < 4_000_000:
                cache[v] = r
        return r

    return np.fromiter((h(int(v)) for v in vals), dtype=np.uint64, count=len(vals))


def _hll_partial(batch: pa.Table, col: str) -> pa.Table:
    vals = np.unique(batch.column(col).to_numpy())
    hs = _hash_int_values(vals)
    idx = (hs % np.uint64(HLL_M)).astype(np.int64)
    w = (hs // np.uint64(HLL_M)).astype(np.int64)  # < 2^52
    # exact integer bit_length: w < 2^53 so the float64 cast is exact
    # and frexp's exponent IS bit_length(w)
    bl = np.where(w > 0, np.frexp(w.astype(np.float64))[1], 0)
    rho = HLL_RHO_MAX - bl
    reg = np.zeros(HLL_M, np.int64)
    np.maximum.at(reg, idx, rho)
    nz = np.nonzero(reg)[0]
    return pa.table(
        {"register_idx": pa.array(nz), "rho": pa.array(reg[nz])}
    )


def hll_registers(ds, col: str = "user_id"):
    """-> (register_idx, rho) for every register hit by >= 1 value.
    Deterministic integer result: exact-comparable against the SQL
    twin (oracle.HLL_USERS)."""
    from ray.data.aggregate import Max

    parts = ds.map_batches(
        _hll_partial, fn_kwargs={"col": col}, batch_format="pyarrow"
    )
    return parts.groupby("register_idx").aggregate(Max("rho", alias_name="rho"))


def hll_estimate(registers: pd.DataFrame, m: int = HLL_M) -> float:
    """Bias-corrected HLL estimate from the register table (Flajolet
    2007 §4, incl. the small-range linear-counting correction)."""
    reg = np.zeros(m, np.float64)
    reg[registers["register_idx"].to_numpy(np.int64)] = registers["rho"].to_numpy(
        np.float64
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -reg))
    zeros = int(np.sum(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


KMV_K = 64


def kmv_sketch(events_ds, k: int = KMV_K):
    """K-minimum-values distinct sketch per event_type: the k smallest
    (md5 // 16) hash values of the distinct users — a mergeable
    bottom-k sketch (estimate ~ (k-1) * 2^60 / kth_value), emitted as
    the deterministic (event_type, kh) rows so the DuckDB twin is
    bit-equal. Partials are bottom-k per batch: shuffle volume is
    k x types x blocks, never users."""

    def partial(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        u = b.column("user_id").to_numpy()
        codes, uniq = pd.factorize(et, sort=False)
        out_t: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        for c, t in enumerate(uniq):
            vals = np.unique(u[codes == c])
            hs = _hash_int_values(vals)
            kh = np.unique((hs // np.uint64(16)).astype(np.int64))
            out_t.append(np.full(min(len(kh), k), t, dtype=object))
            out_h.append(kh[: min(len(kh), k)])  # kh sorted ascending
        return pa.table(
            {
                "event_type": pa.array(
                    np.concatenate(out_t) if out_t else [], pa.string()
                ),
                "kh": pa.array(
                    np.concatenate(out_h)
                    if out_h
                    else np.array([], np.int64)
                ),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        kh = np.unique(g["kh"].to_numpy(np.int64))[:k]
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]] * len(kh), "kh": kh}
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finish, batch_format="pandas")
    )
