"""Chain-rule debounce dedup over the event stream — the streaming
dedup every telemetry/impression pipeline runs: an event is KEPT only
if at least DEBOUNCE_GAP has passed since the last KEPT event of the
same (user_id, event_type); dropped events do NOT reset the clock
(that chain rule is what distinguishes debounce from the LAG-based
filter, and what makes it a genuinely stateful sequential scan).

The scan is vectorized as a FRONTIER algorithm instead of a per-event
Python loop: all keys in a bucket advance together — one round marks
every key's current kept event and jumps its frontier with ONE
np.searchsorted over a (key, ts) composite-sorted array, so a round
costs O(bucket log bucket) and the number of rounds is the longest
kept-chain, not the event count.

Oracle: oracle.DEBOUNCE — a recursive CTE whose working set is exactly
the per-key frontier (one row per key per round), the same algorithm
in SQL form.

Scale shape: ONE hash-bucket shuffle on user_id (all of a user's
events co-locate; event_type stays inside the bucket), per-bucket
frontier scan, output rows bounded by key cardinality. Composite keys
pack (group index << 48 | ts offset), asserting the bucket's time span
fits 48 bits (~9 years in microseconds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEBOUNCE_GAP_US = 60_000_000
N_DEBOUNCE_BUCKETS = 64
_TS_BITS = 48


def _frontier_debounce(ts: np.ndarray, gidx: np.ndarray) -> np.ndarray:
    """ts int64 (sorted within each contiguous group), gidx int64 group
    index per row (non-decreasing) -> kept bool mask, chain rule."""
    n = len(ts)
    kept = np.zeros(n, dtype=bool)
    if n == 0:
        return kept
    base = ts.min()
    off = (ts - base).astype(np.int64)
    assert off.max() + DEBOUNCE_GAP_US < (1 << _TS_BITS), (
        "bucket time span exceeds the 48-bit composite pack"
    )
    comp = (gidx << _TS_BITS) | off
    # group bounds (gidx is non-decreasing)
    starts = np.concatenate([[0], np.nonzero(np.diff(gidx))[0] + 1])
    ends = np.concatenate([starts[1:], [n]])
    f = starts.copy()
    while True:
        active = f < ends
        if not active.any():
            break
        fa = f[active]
        kept[fa] = True
        # jump each frontier to its key's first event >= last kept + gap;
        # composite keys keep the search inside the key's own slice
        target = (gidx[fa] << _TS_BITS) | (off[fa] + DEBOUNCE_GAP_US)
        f[active] = np.searchsorted(comp, target, side="left")
    return kept


def _bucket_scan(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(
        ["user_id", "event_type", "tus", "event_id"], kind="stable"
    ).reset_index(drop=True)
    key = g["user_id"].astype(str) + "\x00" + g["event_type"].astype(str)
    gidx, _ = pd.factorize(key, sort=False)  # non-decreasing after the sort
    kept = _frontier_debounce(
        g["tus"].to_numpy(np.int64), gidx.astype(np.int64)
    )
    g["kept"] = kept
    g["kept_id"] = np.where(kept, g["event_id"].to_numpy(np.int64), 0)
    out = (
        g.groupby(["user_id", "event_type"], sort=False)
        .agg(
            n_events=("event_id", "size"),
            n_kept=("kept", "sum"),
            kept_id_sum=("kept_id", "sum"),
        )
        .reset_index()
    )
    for c in ("n_events", "n_kept", "kept_id_sum"):
        out[c] = out[c].astype(np.int64)
    return out


def debounce_counts(events_ds):
    """-> (user_id, event_type, n_events, n_kept, kept_id_sum)."""
    from robosat_ray.functions.hashing import hash_bucket

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
                "event_id": batch.column("event_id"),
                "tus": batch.column("ts").cast(pa.int64()),
                "ubucket": pa.array(hash_bucket(uid, N_DEBOUNCE_BUCKETS)),
            }
        )

    return (
        events_ds.select_columns(["user_id", "event_type", "event_id", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(_bucket_scan, batch_format="pandas")
    )
