"""Timeline/state operators over the `events` log: SCD-2 validity
intervals, fixed-grid gap filling (resample + forward fill), exact
dyadic EWMA smoothing, and session path (trigram) mining.

All four follow the engine's stream-shape idiom (see stages/events.py,
reference semantics robosat `tools/` loops are per-row; here every
stage is ONE user-hash-bucket shuffle + vectorized per-bucket numpy):
the events table is treated as a keyed changelog, (ts, event_id) is a
total order within a user, and all values are exact integer
micro-units so the DuckDB oracles hash-match bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.functions.hashing import hash_bucket

N_TL_BUCKETS = 64
HOUR_US = 3_600_000_000
# SCD-2 open-interval sentinel: 2100-01-01T00:00:00Z in microseconds
# (NULL-free so the driver's value-hash compare stays total-ordered).
SCD2_OPEN_US = 4_102_444_800_000_000
EWMA_WINDOW = 16


def _vmicro(values: np.ndarray) -> np.ndarray:
    return np.floor(values * 1e6 + 0.5).astype(np.int64)


def _tag(events_ds, cols, with_value: bool):
    """Project + micro-cast + attach the user hash bucket (the one
    shuffle key every stage here shares)."""

    def tag(batch: pa.Table) -> pa.Table:
        out = {
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "tus": batch.column("ts").cast(pa.int64()),
        }
        if "event_type" in cols:
            out["event_type"] = batch.column("event_type")
        if with_value:
            out["vmicro"] = pa.array(_vmicro(batch.column("value").to_numpy()))
        uid = batch.column("user_id").to_numpy()
        out["tbucket"] = pa.array(hash_bucket(uid, N_TL_BUCKETS))
        return pa.table(out)

    return events_ds.select_columns(cols).map_batches(
        tag, batch_format="pyarrow"
    )


# ---------------------------------------------------------------- SCD-2


def _scd2_bucket(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(
        ["user_id", "event_type", "tus", "event_id"], kind="stable"
    )
    uid = g["user_id"].to_numpy(np.int64)
    et = np.asarray(g["event_type"].to_numpy(), dtype="U")
    tus = g["tus"].to_numpy(np.int64)
    # next row's tus where the (user, event_type) key continues, else open
    valid_to = np.full(len(g), SCD2_OPEN_US, dtype=np.int64)
    if len(g) > 1:
        same = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        valid_to[:-1][same] = tus[1:][same]
    return pd.DataFrame(
        {
            "user_id": uid,
            "event_type": g["event_type"].to_numpy(),
            "state_event_id": g["event_id"].to_numpy(np.int64),
            "valid_from_us": tus,
            "valid_to_us": valid_to,
            "value_micro": g["vmicro"].to_numpy(np.int64),
        }
    )


def scd2(events_ds):
    """Slowly-changing-dimension type-2 build: every event becomes a
    state row with a [valid_from, valid_to) validity interval per
    (user_id, event_type) — valid_to = the key's next event time,
    open intervals pinned to SCD2_OPEN_US (2100-01-01). The CDC
    complement of compact_state (which keeps only the live row).

    Scale shape: ONE user hash-bucket shuffle, per-bucket lexsort +
    shifted-compare (no per-row Python); output rows == input rows.
    Reference analog: robosat resume markers are state-by-existence
    (`tools/download.py:48-49`); the engine makes state history a
    first-class table. Oracle: oracle.SCD2 (LEAD window)."""
    return (
        _tag(events_ds, ["event_id", "user_id", "event_type", "ts", "value"], True)
        .groupby("tbucket")
        .map_groups(_scd2_bucket, batch_format="pandas")
    )


# ------------------------------------------------------------- gap fill


def _gap_fill_bucket(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["user_id", "tus", "event_id"], kind="stable")
    uid = g["user_id"].to_numpy(np.int64)
    tus = g["tus"].to_numpy(np.int64)
    eid = g["event_id"].to_numpy(np.int64)
    vm = g["vmicro"].to_numpy(np.int64)
    # same-instant events collapse to the highest event_id (the asof
    # tie rule mirrored in the oracle's QUALIFY)
    last_of_instant = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        last_of_instant[:-1] = (uid[1:] != uid[:-1]) | (tus[1:] != tus[:-1])
    uid, tus, eid, vm = (
        uid[last_of_instant],
        tus[last_of_instant],
        eid[last_of_instant],
        vm[last_of_instant],
    )
    out_u, out_h, out_e, out_v = [], [], [], []
    starts = np.flatnonzero(
        np.concatenate(([True], uid[1:] != uid[:-1])) if len(uid) else []
    )
    bounds = np.append(starts, len(uid))
    for i in range(len(starts)):
        lo, hi = bounds[i], bounds[i + 1]
        t = tus[lo:hi]
        h0 = -((-t[0]) // HOUR_US)  # ceil div
        h1 = t[-1] // HOUR_US
        if h1 < h0:
            continue
        grid = np.arange(h0, h1 + 1, dtype=np.int64)
        idx = np.searchsorted(t, grid * HOUR_US, side="right") - 1
        out_u.append(np.full(len(grid), uid[lo], dtype=np.int64))
        out_h.append(grid)
        out_e.append(eid[lo:hi][idx])
        out_v.append(vm[lo:hi][idx])
    if not out_u:
        return pd.DataFrame(
            {
                "user_id": pd.Series([], dtype=np.int64),
                "hour_id": pd.Series([], dtype=np.int64),
                "asof_event_id": pd.Series([], dtype=np.int64),
                "value_micro": pd.Series([], dtype=np.int64),
            }
        )
    return pd.DataFrame(
        {
            "user_id": np.concatenate(out_u),
            "hour_id": np.concatenate(out_h),
            "asof_event_id": np.concatenate(out_e),
            "value_micro": np.concatenate(out_v),
        }
    )


def gap_fill(events_ds):
    """Resample each user's event series onto the hourly grid with
    forward fill: one sample per whole hour h in [ceil(min_ts/h),
    floor(max_ts/h)], carrying the value of the latest event at or
    before the hour boundary (ties: highest event_id). The streaming
    analog of SQL's generate_series + ASOF JOIN.

    Scale shape: ONE user hash-bucket shuffle; per bucket a sort +
    one searchsorted per user (the per-user loop is over USERS in the
    bucket, not rows — each iteration fully vectorized). Output is
    users x span-hours, independent of event density. Oracle:
    oracle.GAP_FILL (generate_series + ASOF JOIN)."""
    return (
        _tag(events_ds, ["event_id", "user_id", "ts", "value"], True)
        .groupby("tbucket")
        .map_groups(_gap_fill_bucket, batch_format="pandas")
    )


# ----------------------------------------------------------- exact EWMA


def _ewma_bucket(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["user_id", "tus", "event_id"], kind="stable")
    uid = g["user_id"].to_numpy(np.int64)
    vm = g["vmicro"].to_numpy(np.int64)
    n = len(g)
    # row index within each user's series (0-based), vectorized
    new_user = np.concatenate(([True], uid[1:] != uid[:-1])) if n else np.array([], bool)
    seg_start = np.flatnonzero(new_user)
    rn = np.arange(n, dtype=np.int64)
    rn -= np.repeat(seg_start, np.diff(np.append(seg_start, n)))
    num = np.zeros(n, dtype=np.int64)
    den = np.zeros(n, dtype=np.int64)
    # 16 vectorized shifted passes: weight 2^(W-1-k) for the event k
    # steps back, masked to the same user's window
    for k in range(EWMA_WINDOW):
        w = np.int64(1) << (EWMA_WINDOW - 1 - k)
        if k == 0:
            valid = np.ones(n, dtype=bool)
            shifted = vm
        else:
            valid = np.zeros(n, dtype=bool)
            valid[k:] = (uid[k:] == uid[:-k]) & (rn[k:] >= k)
            shifted = np.zeros(n, dtype=np.int64)
            shifted[k:] = vm[:-k]
        num += np.where(valid, shifted, 0) * w
        den += np.where(valid, w, 0)
    return pd.DataFrame(
        {
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": uid,
            "ewma_num": num,
            "ewma_den": den,
        }
    )


def ewma(events_ds):
    """Dyadic EWMA (alpha = 1/2) of each user's value series, exact:
    per event, ewma_num = sum_{k=0..15} v[t-k] * 2^(15-k) and
    ewma_den = sum 2^(15-k) over the available trailing window (both
    int64; the smoothed value is num/den). Dyadic weights keep every
    term integral, so engine and SQL agree bit-for-bit regardless of
    summation order — the engine's general rule for making floating
    recursions (EWMA/Holt) hash-hard.

    Scale shape: ONE user hash-bucket shuffle; per bucket 16
    vectorized shifted passes (window is constant), zero per-row
    Python. Oracle: oracle.EWMA (bounded self-join)."""
    return (
        _tag(events_ds, ["event_id", "user_id", "ts", "value"], True)
        .groupby("tbucket")
        .map_groups(_ewma_bucket, batch_format="pandas")
    )


# -------------------------------------------------------- session paths


def _paths_bucket(group: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    g = group.sort_values(["user_id", "tus", "event_id"], kind="stable")
    uid = g["user_id"].to_numpy(np.int64)
    tus = g["tus"].to_numpy(np.int64)
    et = np.asarray(g["event_type"].to_numpy(), dtype="U")
    n = len(g)
    same = np.zeros(n, dtype=bool)
    if n > 1:
        same[1:] = (uid[1:] == uid[:-1]) & (tus[1:] - tus[:-1] < gap_us)
    # trigram at i requires links i->i+1 and i+1->i+2 both in-session
    if n < 3:
        return pd.DataFrame(
            {"path": pd.Series([], dtype=object), "n": pd.Series([], dtype=np.int64)}
        )
    keep = same[1:-1] & same[2:]
    a, b, c = et[:-2][keep], et[1:-1][keep], et[2:][keep]
    if len(a) == 0:
        return pd.DataFrame(
            {"path": pd.Series([], dtype=object), "n": pd.Series([], dtype=np.int64)}
        )
    key = np.char.add(np.char.add(np.char.add(np.char.add(a, ">"), b), ">"), c)
    uniq, counts = np.unique(key, return_counts=True)
    return pd.DataFrame({"path": uniq.astype(object), "n": counts.astype(np.int64)})


def session_paths(events_ds, gap_us: int | None = None):
    """Session path mining: counts of every CONSECUTIVE event-type
    trigram "a>b>c" whose two links both stay inside one session
    (same gap rule as sessionize/event_transitions — the order-3
    extension of the Markov transition table).

    Scale shape: one user hash-bucket shuffle, per-bucket vectorized
    trigram compaction (partials bounded by |event_type|^3 per
    bucket), then a tiny groupby Sum. Oracle: oracle.SESSION_PATHS."""
    from ray.data.aggregate import Sum

    from robosat_ray.stages.events import SESSION_GAP_US

    gap = SESSION_GAP_US if gap_us is None else gap_us
    per_bucket = (
        _tag(events_ds, ["event_id", "user_id", "event_type", "ts"], False)
        .groupby("tbucket")
        .map_groups(lambda g: _paths_bucket(g, gap), batch_format="pandas")
    )
    return per_bucket.groupby("path").aggregate(Sum("n", alias_name="n"))
