"""Interval self-overlap join + peak-concurrency sweep — the
"concurrent in-flight shipments" question, and the one join shape the
events family does not yet cover (events.py has as-of and band/range
joins; this is interval x interval OVERLAP, the telemetry/booking
staple). Same family as the reference's tile-adjacency overlap tests
(/root/reference/robosat/tools/merge.py:47-56 decides merges by
geometric overlap; here the geometry is 1-D time).

Spec (mirrored bit-for-bit in oracle.SHIP_OVERLAP, all integer days):
- interval per lineitem: s = epoch_days(l_shipdate),
  e = s + 1 + int(l_quantity) % 30  (deterministic synthetic duration;
  the table carries no receipt date)
- two intervals of the SAME supplier overlap iff a.s <= b.e AND
  b.s <= a.e (inclusive ends); n_overlap_pairs counts unordered pairs
- peak_concurrency = max number of intervals covering any single day,
  computed by the +1/-1 boundary sweep with the -1 at e + 1 and ties
  resolved "-1 before +1" (an interval ending the day another starts
  DOES overlap it, inclusive ends)

Scale shape: ONE suppkey hash-bucket shuffle; inside a bucket both
the pair count and the sweep are fully vectorized ACROSS supplier
segments (offset-key searchsorted for the pair count, segmented
cumsum + maximum.reduceat for the sweep — zero per-supplier Python).
Output is one row per supplier; nothing is broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

N_OVERLAP_BUCKETS = 64
DUR_MOD = 30  # duration = 1 + int(quantity) % DUR_MOD days
US_PER_DAY = 86_400 * 1_000_000


def _intervals(b: pa.Table) -> pa.Table:
    """(suppkey, s, e) integer-day intervals + the shuffle bucket."""
    from robosat_ray.functions.hashing import hash_bucket

    supp = b.column("l_suppkey").to_numpy()
    ts = b.column("l_shipdate").cast(pa.int64()).to_numpy()
    s = ts // US_PER_DAY  # floor days since epoch
    # rint matches SQL CAST(double AS BIGINT) rounding (qty is integral)
    dur = 1 + np.rint(b.column("l_quantity").to_numpy()).astype(np.int64) % DUR_MOD
    return pa.table(
        {
            "obucket": pa.array(hash_bucket(supp, N_OVERLAP_BUCKETS)),
            "suppkey": pa.array(supp),
            "s": pa.array(s),
            "e": pa.array(s + dur),
        }
    )


def _overlap_bucket(g: pd.DataFrame) -> pd.DataFrame:
    supp = g["suppkey"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    e = g["e"].to_numpy(np.int64)

    codes, uniq = pd.factorize(supp, sort=True)
    n_seg = len(uniq)
    counts = np.bincount(codes, minlength=n_seg).astype(np.int64)
    starts = np.zeros(n_seg, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])

    # ---- pair count: offset-key searchsorted across all segments.
    # key = code * span + (day - dmin) is globally sorted iff rows are
    # sorted by (code, s); searchsorted of code*span + (e - dmin)
    # then lands inside the same segment because e - dmin < span.
    dmin = s.min() if len(s) else 0
    span = (e.max() - dmin + 2) if len(s) else 2
    order = np.lexsort((s, codes))
    cs, ss, es = codes[order], s[order], e[order]
    key = cs * span + (ss - dmin)
    probe = cs * span + (es - dmin)
    hi = np.searchsorted(key, probe, side="right")
    rank = np.arange(len(key), dtype=np.int64)
    per_row = hi - rank - 1  # j > i (in s-order) with s_j <= e_i
    pair_cnt = np.zeros(n_seg, dtype=np.int64)
    np.add.at(pair_cnt, cs, per_row)

    # ---- peak concurrency: +1 at s, -1 at e+1, "-1 before +1" on
    # ties, segmented running sum, per-segment max.
    ev_code = np.concatenate([cs, cs])
    ev_day = np.concatenate([ss, es + 1])
    delta = np.concatenate(
        [np.ones(len(cs), dtype=np.int64), -np.ones(len(cs), dtype=np.int64)]
    )
    eorder = np.lexsort((delta, ev_day, ev_code))
    ec, ed = ev_code[eorder], delta[eorder]
    run = np.cumsum(ed)
    seg_first = np.zeros(len(ec), dtype=bool)
    seg_first[0] = True
    seg_first[1:] = ec[1:] != ec[:-1]
    seg_starts = np.flatnonzero(seg_first)
    base = run[seg_starts] - ed[seg_starts]
    run = run - np.repeat(base, np.diff(np.append(seg_starts, len(ec))))
    peak = np.maximum.reduceat(run, seg_starts)

    return pd.DataFrame(
        {
            "suppkey": uniq,
            "n_intervals": counts,
            "n_overlap_pairs": pair_cnt,
            "peak_concurrency": peak,
        }
    )


def ship_overlap(lineitem_ds):
    """-> (suppkey, n_intervals, n_overlap_pairs, peak_concurrency),
    one row per supplier."""
    iv = lineitem_ds.select_columns(
        ["l_suppkey", "l_quantity", "l_shipdate"]
    ).map_batches(_intervals, batch_format="pyarrow")
    out = iv.groupby("obucket").map_groups(
        _overlap_bucket, batch_format="pandas"
    )
    return out.to_pandas().sort_values("suppkey").reset_index(drop=True)
