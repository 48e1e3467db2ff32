"""Stream-shaped operators over the `events` log table (ts-ordered,
keyed by user): tumbling windows and per-key running aggregates.

Ray Data has no event-time watermarks; the engine treats the input as
a partitioned log: `groupby(key)` co-locates a key's events, windowing
/ running state is computed over the sorted group (ray guide pattern).
Ordering assumption: within one user, (ts, event_id) is a total order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.functions.hashing import hash_bucket

HOUR_US = 3_600_000_000


def add_window(batch: pa.Table, window_us: int = HOUR_US) -> pa.Table:
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    return batch.append_column("window_id", pa.array(ts // window_us))


def tumbling_window_agg(events_ds, window_us: int = HOUR_US):
    """-> (user_id, window_id, n_events, sum_value, max_value): partial
    window assignment in map_batches, algebraic groupby aggregate."""
    from ray.data.aggregate import Count, Max, Sum

    withw = events_ds.map_batches(
        lambda b: add_window(b, window_us), batch_format="pyarrow"
    )
    return withw.groupby(["user_id", "window_id"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
        Max("value", alias_name="max_value"),
    )


def hopping_window_agg(events_ds, window_us: int = 4 * HOUR_US,
                       hop_us: int = HOUR_US):
    """-> (window_start, n_events, sum_value_micro): HOPPING (sliding)
    windows of length `window_us` advancing by `hop_us` (window_us must
    be a multiple). Each event is expanded to its window_us/hop_us
    member windows inside map_batches — a constant-factor fan-out, no
    state — then ONE algebraic groupby aggregates per window start.
    Values are quantized to integer micro-units per row (identical
    IEEE expression in the SQL twin) so the Sum is an exact int64."""
    k = window_us // hop_us
    assert k * hop_us == window_us, "window_us must be a multiple of hop_us"

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        base = ts // hop_us
        starts = ((base[:, None] - np.arange(k)[None, :]) * hop_us).ravel()
        v = batch.column("value").to_numpy()
        vmicro = np.floor(v * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "window_start": pa.array(starts),
                "v_micro": pa.array(np.repeat(vmicro, k)),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        events_ds.map_batches(expand, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("v_micro", alias_name="sum_value_micro"),
        )
    )


def _running_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """One user-hash bucket: vectorized per-user cumsum/cumcount over
    the (user, ts, event_id)-sorted rows — pandas' C groupby kernels,
    not a Python loop over thousands of single-user groups."""
    g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
    by = g.groupby("user_id", sort=False)
    g["running_value"] = by["value"].cumsum()
    g["seq"] = by.cumcount().to_numpy() + 1
    return g[["event_id", "user_id", "running_value", "seq"]]


NUM_USER_BUCKETS = 64


def running_totals(events_ds):
    """-> per-event running sum + sequence number within its user's
    ts-ordered stream. Grouped by a compact user-hash bucket (a raw
    user_id groupby makes millions of tiny pandas groups; 64 buckets
    amortize the per-group overhead while the in-bucket kernels stay
    vectorized)."""

    def bucket(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        return b.append_column("ubucket", pa.array(hash_bucket(u, NUM_USER_BUCKETS)))

    return (
        events_ds.select_columns(["event_id", "user_id", "ts", "value"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(_running_bucket, batch_format="pandas")
    )


def _composite_keys(user: np.ndarray, ts: np.ndarray, base: int, span: int) -> np.ndarray:
    """Lexicographic (user, ts) order collapsed into one sortable int64:
    user * span + (ts - base). Caller guarantees 0 <= ts - base < span
    and max(user) * span < 2**62 (asserted) so searchsorted over the
    composite equals a two-key lexicographic search."""
    comp = user.astype(np.int64) * np.int64(span) + (ts - np.int64(base))
    return comp


def _asof_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """One user-hash bucket of the tagged union (side 0 = right/match
    candidates, side 1 = left/probe rows): vectorized as-of lookup —
    for each left row the right row of the SAME user with the largest
    ts <= left ts. Single searchsorted over composite (user, ts) keys;
    no per-user Python."""
    side = group["side"].to_numpy()
    uid = group["user_id"].to_numpy().astype(np.int64)
    ts = group["ts"].to_numpy().astype(np.int64)
    eid = group["event_id"].to_numpy().astype(np.int64)
    val = group["value"].to_numpy().astype(np.float64)

    lmask = side == 1
    rmask = ~lmask
    out_cols = ("event_id", "user_id", "ts_us", "match_event_id", "match_value_micro", "lag_us")
    if not lmask.any():
        return pd.DataFrame({c: np.empty(0, dtype=np.int64) for c in out_cols})

    base = int(ts.min())
    span = int(ts.max()) - base + 2
    assert int(uid.max()) * span < 2**62, "composite key overflow; widen key strategy"

    l_uid, l_ts, l_eid = uid[lmask], ts[lmask], eid[lmask]
    r_uid, r_ts, r_eid, r_val = uid[rmask], ts[rmask], eid[rmask], val[rmask]

    if len(r_uid):
        # sort right side by (user, ts, event_id); dedupe ties on
        # (user, ts) keeping the max event_id (deterministic, matches
        # the oracle's max/max_by group)
        order = np.lexsort((r_eid, r_ts, r_uid))
        r_uid, r_ts, r_eid, r_val = r_uid[order], r_ts[order], r_eid[order], r_val[order]
        keep = np.ones(len(r_uid), dtype=bool)
        keep[:-1] = (r_uid[1:] != r_uid[:-1]) | (r_ts[1:] != r_ts[:-1])
        r_uid, r_ts, r_eid, r_val = r_uid[keep], r_ts[keep], r_eid[keep], r_val[keep]
        rcomp = _composite_keys(r_uid, r_ts, base, span)
        idx = np.searchsorted(rcomp, _composite_keys(l_uid, l_ts, base, span), side="right") - 1
        valid = (idx >= 0) & (r_uid[np.maximum(idx, 0)] == l_uid)
    else:
        idx = np.full(len(l_uid), -1)
        valid = np.zeros(len(l_uid), dtype=bool)

    safe = np.maximum(idx, 0)
    m_eid = np.where(valid, r_eid[safe] if len(r_uid) else -1, -1).astype(np.int64)
    m_val = np.where(valid, r_val[safe] if len(r_uid) else 0.0, 0.0)
    lag = np.where(valid, l_ts - (r_ts[safe] if len(r_uid) else 0), -1).astype(np.int64)
    return pd.DataFrame(
        {
            "event_id": l_eid,
            "user_id": l_uid,
            "ts_us": l_ts,
            "match_event_id": m_eid,
            # int64 micro-units (identical IEEE expression on the SQL
            # side) — no float-rounding-mode parity hazard
            "match_value_micro": np.floor(m_val * 1e6 + 0.5).astype(np.int64),
            "lag_us": lag,
        }
    )


def _tag_union(events_ds, left_type: str, right_type: str):
    """Filter the two event types, tag side, cast ts to int64 us, and
    bucket by user hash — the shared co-partition prologue for the
    as-of and range joins. One shuffle, both sides."""

    def prep(b: pa.Table, side: int) -> pa.Table:
        t = pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts").cast(pa.int64()),
                "value": b.column("value"),
            }
        )
        t = t.append_column("side", pa.array(np.full(len(t), side, dtype=np.int8)))
        u = t.column("user_id").to_numpy()
        return t.append_column("ubucket", pa.array(hash_bucket(u, NUM_USER_BUCKETS)))

    cols = ["event_id", "user_id", "ts", "event_type", "value"]
    left = events_ds.select_columns(cols).filter(expr=f"event_type == '{left_type}'").map_batches(
        lambda b: prep(b.drop_columns(["event_type"]), 1), batch_format="pyarrow"
    )
    right = events_ds.select_columns(cols).filter(expr=f"event_type == '{right_type}'").map_batches(
        lambda b: prep(b.drop_columns(["event_type"]), 0), batch_format="pyarrow"
    )
    return left.union(right)


def asof_join(events_ds, left_type: str = "purchase", right_type: str = "view"):
    """Attribution as-of join (the classic streaming/temporal-join the
    reference has no analog for; ray guide co-partition pattern): for
    each `left_type` event, the latest `right_type` event of the same
    user with ts <= the left event's ts. -> (event_id, user_id, ts_us,
    match_event_id|-1, match_value_micro|0, lag_us|-1). Ties on (user,
    ts) resolve to max event_id, matching the SQL oracle's dedup."""
    return (
        _tag_union(events_ds, left_type, right_type)
        .groupby("ubucket")
        .map_groups(_asof_bucket, batch_format="pandas")
    )


RANGE_WINDOW_US = HOUR_US


def _range_bucket(group: pd.DataFrame, window_us: int) -> pd.DataFrame:
    """One bucket: for each left row, COUNT and SUM of right-side rows
    of the same user in [ts - window_us, ts). Two searchsorteds over
    composite keys + prefix-sum difference — O((n+m) log m), fully
    vectorized. Values are quantized to int64 micro-units per row
    BEFORE the prefix sum (same pattern as window.py / hopping), so
    window sums are exact integers regardless of bucket size — a
    float64 cumsum's rounding error grows with row count and would
    eventually diverge from the oracle's direct SUM."""
    side = group["side"].to_numpy()
    uid = group["user_id"].to_numpy().astype(np.int64)
    ts = group["ts"].to_numpy().astype(np.int64)
    eid = group["event_id"].to_numpy().astype(np.int64)
    val = group["value"].to_numpy().astype(np.float64)

    lmask = side == 1
    rmask = ~lmask
    if not lmask.any():
        return pd.DataFrame(
            {
                "event_id": np.empty(0, dtype=np.int64),
                "user_id": np.empty(0, dtype=np.int64),
                "n_prior": np.empty(0, dtype=np.int64),
                "sum_prior_micro": np.empty(0, dtype=np.int64),
            }
        )

    # base shifted below min(ts) - window so (ts - window) offsets stay
    # non-negative and the composite keeps user-major lexicographic order
    base = int(ts.min()) - window_us
    span = int(ts.max()) - base + 2
    assert int(uid.max()) * span < 2**62, "composite key overflow; widen key strategy"

    l_uid, l_ts, l_eid = uid[lmask], ts[lmask], eid[lmask]
    r_uid, r_ts, r_val = uid[rmask], ts[rmask], val[rmask]
    if len(r_uid):
        order = np.lexsort((r_ts, r_uid))
        r_uid, r_ts, r_val = r_uid[order], r_ts[order], r_val[order]
        rcomp = _composite_keys(r_uid, r_ts, base, span)
        lo = np.searchsorted(rcomp, _composite_keys(l_uid, l_ts - window_us, base, span), side="left")
        hi = np.searchsorted(rcomp, _composite_keys(l_uid, l_ts, base, span), side="left")
        r_micro = np.floor(r_val * 1e6 + 0.5).astype(np.int64)
        prefix = np.concatenate(([0], np.cumsum(r_micro)))
        n = (hi - lo).astype(np.int64)
        s = np.where(n > 0, prefix[hi] - prefix[lo], 0)
    else:
        n = np.zeros(len(l_uid), dtype=np.int64)
        s = np.zeros(len(l_uid), dtype=np.int64)
    return pd.DataFrame(
        {
            "event_id": l_eid,
            "user_id": l_uid,
            "n_prior": n,
            "sum_prior_micro": s.astype(np.int64),
        }
    )


def range_join(
    events_ds,
    left_type: str = "purchase",
    right_type: str = "click",
    window_us: int = RANGE_WINDOW_US,
):
    """Sliding-interval range join: for each `left_type` event, count
    and sum the `right_type` events of the same user in the preceding
    [ts - window, ts) interval. Same one-shuffle co-partition shape as
    asof_join; sums are exact int64 micro-units on both sides, so
    partial-aggregation order can never diverge from SQL."""
    return (
        _tag_union(events_ds, left_type, right_type)
        .groupby("ubucket")
        .map_groups(lambda g: _range_bucket(g, window_us), batch_format="pandas")
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_counts(events_ds):
    """Per-user pivot of the event log: one column per event type
    (n_<type>) plus the purchase-value sum — indicator columns in
    map_batches, then a single algebraic groupby (the classic
    pivot-as-aggregate; no per-user groups materialize)."""
    from ray.data.aggregate import Sum

    def ind(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        val = b.column("value").to_numpy()
        cols = {"user_id": b.column("user_id")}
        for t in EVENT_TYPES:
            cols[f"n_{t}"] = pa.array((et == t).astype(np.int64))
        cols["purchase_cents"] = pa.array(
            np.where(et == "purchase", np.floor(val * 100.0 + 0.5), 0.0).astype(np.int64)
        )
        return pa.table(cols)

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES]
    aggs.append(Sum("purchase_cents", alias_name="purchase_cents"))
    return (
        events_ds.select_columns(["user_id", "event_type", "value"])
        .map_batches(ind, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*aggs)
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def _sessionize_bucket(group: pd.DataFrame, gap_us: int = SESSION_GAP_US) -> pd.DataFrame:
    """One user-hash bucket: vectorized gap-based sessionization over
    the (user, ts, event_id)-sorted rows — pure integer math, no
    per-session Python."""
    g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = g["user_id"].to_numpy()
    brk = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        brk[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] >= gap_us)
    sid = np.cumsum(brk)
    df = pd.DataFrame({"user_id": uid, "ts": ts, "sid": sid})
    out = df.groupby(["user_id", "sid"], sort=False).agg(
        session_start=("ts", "min"),
        session_end=("ts", "max"),
        n_events=("ts", "size"),
    ).reset_index()
    out["duration_us"] = out["session_end"] - out["session_start"]
    return out[["user_id", "session_start", "n_events", "duration_us"]].astype(
        {
            "user_id": np.int64,
            "session_start": np.int64,
            "n_events": np.int64,
            "duration_us": np.int64,
        }
    )


def sessionize(events_ds, gap_us: int = SESSION_GAP_US):
    """Gap-based sessions per user (classic streaming sessionization,
    expressed as a bucketed sorted-group computation): -> (user_id,
    session_start us, n_events, duration_us). All-integer output."""

    def bucket(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        return b.append_column("ubucket", pa.array(hash_bucket(u, NUM_USER_BUCKETS)))

    return (
        events_ds.select_columns(["event_id", "user_id", "ts"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(lambda g: _sessionize_bucket(g, gap_us), batch_format="pandas")
    )


DAY_US = 86_400_000_000


def rollup_day_type(events_ds, cube: bool = False):
    """ROLLUP-style multi-level aggregate in one shuffle: exact counts
    and value cents at (day, event_type), (day) and () levels —
    with cube=True also the (event_type) set, i.e. CUBE(day, type). Only
    the finest level aggregates the raw stream (algebraic groupby);
    the upper levels re-aggregate the already-tiny fine result, so no
    second pass over the data. Rolled-up keys use sentinels
    (day = -1, event_type = '(all)') rather than NULL so the result
    hash-compares cleanly across engines."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    def base(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy()
        cents = np.floor(b.column("value").to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "day": pa.array(ts // DAY_US),
                "event_type": b.column("event_type"),
                "cents": pa.array(cents),
            }
        )

    fine = (
        events_ds.select_columns(["ts", "event_type", "value"])
        .map_batches(base, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("cents", alias_name="value_cents"))
    )

    # the fine result is bounded by |days| x |event_types| whatever the
    # input scale — the upper grouping sets re-aggregate IT on the
    # driver (three extra Ray executions for a few-thousand-row table
    # cost more scheduling than compute)
    fp = fine.to_pandas()
    if len(fp) == 0:  # empty dataset loses its schema entirely
        fp = pd.DataFrame(
            {
                "day": pd.Series([], dtype=np.int64),
                "event_type": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype=np.int64),
                "value_cents": pd.Series([], dtype=np.int64),
            }
        )
    else:
        fp = fp.astype({"day": np.int64, "n_events": np.int64, "value_cents": np.int64})
    by_day = (
        fp.groupby("day", as_index=False)[["n_events", "value_cents"]]
        .sum()
        .assign(event_type="(all)")
    )
    if len(fp) == 0:
        # SQL ROLLUP still emits the grand-total grouping set on empty
        # input: one row (COUNT 0, SUM NULL) — mirror it exactly
        return ray.data.from_arrow(
            pa.table(
                {
                    "day": pa.array([-1], pa.int64()),
                    "event_type": pa.array(["(all)"], pa.string()),
                    "n_events": pa.array([0], pa.int64()),
                    "value_cents": pa.array([None], pa.int64()),
                }
            )
        )
    total = pd.DataFrame(
        {
            "day": np.array([-1], dtype=np.int64),
            "event_type": ["(all)"],
            "n_events": np.array([fp["n_events"].sum()], dtype=np.int64),
            "value_cents": np.array([fp["value_cents"].sum()], dtype=np.int64),
        }
    )
    cols = ["day", "event_type", "n_events", "value_cents"]
    pieces = [fp[cols], by_day[cols], total[cols]]
    if cube:
        by_type = (
            fp.groupby("event_type", as_index=False)[["n_events", "value_cents"]]
            .sum()
            .assign(day=np.int64(-1))
        )
        pieces.insert(2, by_type[cols])
    out = pd.concat(pieces, ignore_index=True)
    return ray.data.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


# --- event-stream bookkeeping: late arrivals + changelog compaction ---

N_BOOK_BUCKETS = 64


def _late_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """Per user, arrival order = event_id: late_by = running max of
    PRIOR arrivals' event-times minus own event-time (>= 0; first
    arrival is never late). One sort + cummax, no per-event Python."""
    g = group.sort_values(["user_id", "event_id"], kind="stable")
    t = g["tus"].to_numpy(np.int64)
    codes, _ = pd.factorize(g["user_id"], sort=False)
    # per-user running max of PRIOR arrivals: segmented cummax, one
    # pass per user segment (segments are bucket-local and contiguous)
    starts = np.concatenate([[0], np.nonzero(np.diff(codes))[0] + 1])
    prior = np.empty(len(t), dtype=np.int64)
    for s, e in zip(starts, np.concatenate([starts[1:], [len(t)]])):
        seg = t[s:e]
        prior[s] = np.iinfo(np.int64).min  # first arrival: no prior
        if e - s > 1:
            prior[s + 1 : e] = np.maximum.accumulate(seg[:-1])
    late = np.maximum(prior - t, 0)
    late[starts] = 0
    return pd.DataFrame(
        {
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "late_by_us": late.astype(np.int64),
        }
    )


def late_events(events_ds):
    """-> (event_id, user_id, late_by_us): how far behind the user's
    watermark (max event-time among EARLIER-ARRIVING events, arrival
    order = event_id) each event lands. ONE user hash-bucket shuffle,
    per-bucket sort + segmented cummax."""
    from robosat_ray.functions.hashing import hash_bucket

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "tus": batch.column("ts").cast(pa.int64()),
                "lbucket": pa.array(hash_bucket(uid, N_BOOK_BUCKETS)),
            }
        )

    return (
        events_ds.select_columns(["event_id", "user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("lbucket")
        .map_groups(_late_bucket, batch_format="pandas")
    )


def _compact_bucket(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(
        ["user_id", "event_type", "tus", "event_id"], kind="stable"
    )
    # last row per (user, event_type) = latest ts, tiebreak highest id
    last = ~g.duplicated(subset=["user_id", "event_type"], keep="last")
    out = g[last]
    return pd.DataFrame(
        {
            "user_id": out["user_id"].to_numpy(np.int64),
            "event_type": out["event_type"].to_numpy(),
            "last_event_id": out["event_id"].to_numpy(np.int64),
            "last_tus": out["tus"].to_numpy(np.int64),
            "last_value_micro": out["vmicro"].to_numpy(np.int64),
        }
    )


def compact_state(events_ds):
    """Changelog compaction (the upsert/CDC staple): latest event per
    (user_id, event_type) — max ts, ties broken by highest event_id —
    with its value in exact integer micro-units. ONE user hash-bucket
    shuffle, per-bucket sort + duplicated(keep='last')."""
    from robosat_ray.functions.hashing import hash_bucket

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        v = batch.column("value").to_numpy()
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
                "tus": batch.column("ts").cast(pa.int64()),
                "vmicro": pa.array(
                    np.floor(v * 1e6 + 0.5).astype(np.int64)
                ),
                "cbucket": pa.array(hash_bucket(uid, N_BOOK_BUCKETS)),
            }
        )

    return (
        events_ds.select_columns(
            ["event_id", "user_id", "event_type", "ts", "value"]
        )
        .map_batches(tag, batch_format="pyarrow")
        .groupby("cbucket")
        .map_groups(_compact_bucket, batch_format="pandas")
    )


def _transitions_bucket(group: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """One user-hash bucket: adjacent same-session event-type pairs
    over the (user, ts, event_id)-sorted rows, compacted to per-bucket
    (from_type, to_type, n) partial counts — one np.unique over joined
    fixed-width unicode, no per-pair Python."""
    g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = g["user_id"].to_numpy()
    et = np.asarray(g["event_type"].to_numpy(), dtype="U")
    same = np.zeros(len(g), dtype=bool)
    if len(g) > 1:
        same[1:] = (uid[1:] == uid[:-1]) & (ts[1:] - ts[:-1] < gap_us)
    keep = same[1:]
    frm = et[:-1][keep]
    to = et[1:][keep]
    if len(frm) == 0:
        return pd.DataFrame(
            {
                "from_type": pd.Series([], dtype=object),
                "to_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
    key = np.char.add(np.char.add(frm, "\x1f"), to)
    uniq, counts = np.unique(key, return_counts=True)
    split = np.char.partition(uniq, "\x1f")
    return pd.DataFrame(
        {
            "from_type": split[:, 0].astype(object),
            "to_type": split[:, 2].astype(object),
            "n": counts.astype(np.int64),
        }
    )


def event_transitions(events_ds, gap_us: int = SESSION_GAP_US):
    """Markov transition counts of the event stream: (from_type,
    to_type, n) over CONSECUTIVE events of the same user that fall in
    the same session (gap < gap_us — the sessionize(342) break rule
    negated, so transition chains never cross a session boundary).

    Scale shape: one user-hash bucket shuffle (the sessionize plan),
    per-bucket vectorized adjacency + compaction to type-pair
    partials (bounded by |event_type|² per bucket), then a tiny
    groupby Sum. Sequence mining with zero per-event Python."""
    from ray.data.aggregate import Sum

    def bucket(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        return b.append_column("ubucket", pa.array(hash_bucket(u, NUM_USER_BUCKETS)))

    per_bucket = (
        events_ds.select_columns(["event_id", "user_id", "ts", "event_type"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(lambda g: _transitions_bucket(g, gap_us), batch_format="pandas")
    )
    return per_bucket.groupby(["from_type", "to_type"]).aggregate(
        Sum("n", alias_name="n")
    )


def _interval_union_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """One user-hash bucket: merge overlapping [s, e) intervals per
    user (gaps-and-islands over VARIABLE-length intervals — unlike
    _sessionize_bucket(334) the end points are not monotone, so the
    island break compares each start against the RUNNING MAX of all
    previous ends, not just the previous row). Vectorized: one sort,
    one segment cummax, one cumsum."""
    g = group.sort_values(["user_id", "s", "e"], kind="stable")
    uid = g["user_id"].to_numpy()
    s = g["s"].to_numpy()
    e = g["e"].to_numpy()
    runmax = pd.Series(e).groupby(pd.Series(uid), sort=False).cummax().to_numpy()
    brk = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        brk[1:] = (uid[1:] != uid[:-1]) | (s[1:] > runmax[:-1])
    isl = np.cumsum(brk)
    df = pd.DataFrame({"user_id": uid, "s": s, "e": e, "isl": isl})
    islands = (
        df.groupby(["user_id", "isl"], sort=False)
        .agg(st=("s", "min"), en=("e", "max"))
        .reset_index()
    )
    islands["length"] = islands["en"] - islands["st"]
    out = (
        islands.groupby("user_id", sort=False)
        .agg(n_islands=("isl", "size"), covered_micro=("length", "sum"))
        .reset_index()
    )
    return out.astype(
        {"user_id": np.int64, "n_islands": np.int64, "covered_micro": np.int64}
    )


def interval_union(events_ds):
    """Per-user union of overlapping time intervals: each event opens
    the interval [ts, ts + max(value seconds, 0)); merged islands are
    counted and their total covered microseconds summed -> (user_id,
    n_islands, covered_micro). The classic interval-merge / coverage
    operator (calendar busy-time, sensor uptime), integer-exact
    (dur_micro = floor(value*1e6 + 0.5) clamped at 0, identical IEEE
    expr in the SQL twin).

    Scale shape: one user-hash bucket shuffle, then a fully
    vectorized per-bucket merge — no per-interval Python, partials
    bounded by users per bucket."""

    def to_iv(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy()
        dur = np.floor(b.column("value").to_numpy() * 1_000_000.0 + 0.5).astype(
            np.int64
        )
        np.maximum(dur, 0, out=dur)
        u = b.column("user_id").to_numpy()
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "s": pa.array(ts),
                "e": pa.array(ts + dur),
                "ubucket": pa.array(hash_bucket(u, NUM_USER_BUCKETS)),
            }
        )

    return (
        events_ds.select_columns(["user_id", "ts", "value"])
        .map_batches(to_iv, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(_interval_union_bucket, batch_format="pandas")
    )


# CUSUM drift (cents subtracted from every observation) and alert
# threshold — tuned so the synthetic stream (values 0..490, mean ~50)
# produces a meaningful but sparse alert set.
CUSUM_DRIFT_CENTS = 6000
CUSUM_THRESHOLD_CENTS = 40000


def _cusum_bucket(group: pd.DataFrame, k: int, h: int) -> pd.DataFrame:
    """One user-hash bucket: the CUSUM recursion s_i = max(0, s_{i-1}
    + z_i) is computed in CLOSED FORM — s_i = P_i - min(0, cummin P_i)
    with P = cumsum(z) — so the sequential scan becomes two vectorized
    per-user prefix passes (groupby cumsum + cummin), no per-event
    Python and an exact non-recursive SQL twin."""
    g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
    uid = g["user_id"].to_numpy()
    z = g["z"].to_numpy()
    s_uid = pd.Series(uid)
    cp = pd.Series(z).groupby(s_uid, sort=False).cumsum().to_numpy()
    cm = pd.Series(cp).groupby(s_uid, sort=False).cummin().to_numpy()
    stat = cp - np.minimum(cm, 0)
    df = pd.DataFrame(
        {"user_id": uid, "alert": (stat > h).astype(np.int64), "stat": stat}
    )
    out = (
        df.groupby("user_id", sort=False)
        .agg(n_alerts=("alert", "sum"), max_stat=("stat", "max"))
        .reset_index()
    )
    return out.astype(
        {"user_id": np.int64, "n_alerts": np.int64, "max_stat": np.int64}
    )


def cusum_alerts(events_ds, k: int = CUSUM_DRIFT_CENTS,
                 h: int = CUSUM_THRESHOLD_CENTS):
    """Per-user CUSUM change detection over the (ts, event_id)-ordered
    value stream: s_i = max(0, s_{i-1} + cents_i - k), alert when
    s_i > h -> (user_id, n_alerts, max_stat). The classic sequential
    monitoring statistic (Page 1954), made distributed + vectorized by
    the cumsum - cummin closed form (see _cusum_bucket). Integer-exact
    cents. Scale shape: one user-bucket shuffle, two prefix passes."""

    def to_z(b: pa.Table) -> pa.Table:
        cents = np.floor(b.column("value").to_numpy() * 100.0 + 0.5).astype(np.int64)
        u = b.column("user_id").to_numpy()
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts": b.column("ts").cast(pa.int64()),
                "event_id": b.column("event_id"),
                "z": pa.array(cents - k),
                "ubucket": pa.array(hash_bucket(u, NUM_USER_BUCKETS)),
            }
        )

    return (
        events_ds.select_columns(["event_id", "user_id", "ts", "value"])
        .map_batches(to_z, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(lambda g: _cusum_bucket(g, k, h), batch_format="pandas")
    )


# fixed day-index origin for the trend regressor: keeps x small so the
# int64 moment products n*Σxy and n*Σxx stay far from overflow (the
# slope is shift-invariant, so any fixed origin gives the same result)
TREND_DAY_ORIGIN = 19700


def user_trend(events_ds):
    """Per-user OLS trend of daily value: slope of cents over the
    event's day index, returned as the EXACT RATIONAL
    (slope_num = n*Σxy - Σx*Σy, slope_den = n*Σxx - Σx*Σx) — no
    float division anywhere, so the SQL twin (HUGEINT moments cast
    to BIGINT) matches bit-for-bit. The per-group companion of the
    global ols_fit: five algebraic moments via one groupby, partials
    combined per batch with np.add.at."""
    from ray.data.aggregate import Sum

    def moments(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy()
        x = ts // DAY_US - TREND_DAY_ORIGIN
        y = np.floor(b.column("value").to_numpy() * 100.0 + 0.5).astype(np.int64)
        u = b.column("user_id").to_numpy()
        uu, inv = np.unique(u, return_inverse=True)
        out = {
            "user_id": uu,
            "n": np.bincount(inv).astype(np.int64),
        }
        for name, v in (("sx", x), ("sy", y), ("sxy", x * y), ("sxx", x * x)):
            acc = np.zeros(len(uu), dtype=np.int64)
            np.add.at(acc, inv, v)
            out[name] = acc
        return pa.table({k: pa.array(v) for k, v in out.items()})

    agg = (
        events_ds.select_columns(["user_id", "ts", "value"])
        .map_batches(moments, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("n", alias_name="n_events"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_events").to_numpy()
        sx = b.column("sx").to_numpy()
        sy = b.column("sy").to_numpy()
        sxy = b.column("sxy").to_numpy()
        sxx = b.column("sxx").to_numpy()
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "n_events": pa.array(n),
                "slope_num": pa.array(n * sxy - sx * sy),
                "slope_den": pa.array(n * sxx - sx * sx),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _twap_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """One user-hash bucket: last-observation-carried-forward time
    integral per user -> twap_num = sum(dt_i * cents_i) over
    consecutive (ts, event_id)-ordered events, twap_den = sum(dt_i)
    (telescopes to last_ts - first_ts). All-vectorized diff/weighting;
    equal-ts ties carry dt = 0 so tie order cannot change the sums."""
    g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
    uid = g["user_id"].to_numpy()
    ts = g["ts"].to_numpy()
    cents = g["cents"].to_numpy()
    n = len(g)
    same_user = np.zeros(n, dtype=bool)
    if n > 1:
        same_user[:-1] = uid[1:] == uid[:-1]
    dt = np.zeros(n, dtype=np.int64)
    if n > 1:
        dt[:-1] = ts[1:] - ts[:-1]
    dt[~same_user] = 0  # last event of each user contributes nothing
    df = pd.DataFrame(
        {"user_id": uid, "num": dt * cents, "den": dt, "one": np.int64(1)}
    )
    out = (
        df.groupby("user_id", sort=False)
        .agg(n_events=("one", "sum"), twap_num=("num", "sum"), twap_den=("den", "sum"))
        .reset_index()
    )
    return out.astype(
        {
            "user_id": np.int64,
            "n_events": np.int64,
            "twap_num": np.int64,
            "twap_den": np.int64,
        }
    )


def twap(events_ds):
    """Per-user time-weighted average value (TWAP) as the exact
    rational (twap_num, twap_den): each event's cents weighted by the
    time until the user's next event (LOCF integral), no float
    division anywhere -> (user_id, n_events, twap_num, twap_den).
    Scale shape: one user-bucket shuffle, vectorized per-bucket diff."""

    def prep(b: pa.Table) -> pa.Table:
        cents = np.floor(b.column("value").to_numpy() * 100.0 + 0.5).astype(np.int64)
        u = b.column("user_id").to_numpy()
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts": b.column("ts").cast(pa.int64()),
                "event_id": b.column("event_id"),
                "cents": pa.array(cents),
                "ubucket": pa.array(hash_bucket(u, NUM_USER_BUCKETS)),
            }
        )

    return (
        events_ds.select_columns(["event_id", "user_id", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(_twap_bucket, batch_format="pandas")
    )


MEDIAN_WINDOW = 5  # ROWS BETWEEN (MEDIAN_WINDOW-1) PRECEDING AND CURRENT


def rolling_median(events_ds, window: int = MEDIAN_WINDOW):
    """Exact per-user rolling median of the cent-quantized value over
    the trailing `window` rows ((ts, event_id) order) — time-series
    denoising, the rank-statistic window the running-sum family can't
    express. Emits med2_cents = 2 x median (sum of the two middle
    values on even prefixes), keeping the result integral.

    Scale shape: ONE user hash-bucket shuffle; inside a bucket, full
    windows are a (n x window) stride view sorted row-wise, and the
    (window-1) ramp-up rows per user are handled per-width vectorized
    across ALL users in the bucket (no per-user Python)."""
    from robosat_ray.functions.hashing import hash_bucket

    w = int(window)

    def prep(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        return pa.table(
            {
                "ubucket": pa.array(hash_bucket(u, NUM_USER_BUCKETS)),
                "user_id": b.column("user_id"),
                "tsu": b.column("ts").cast(pa.int64()),
                "event_id": b.column("event_id"),
                "cents": pa.array(
                    np.floor(b.column("value").to_numpy() * 100.0 + 0.5).astype(
                        np.int64
                    )
                ),
            }
        )

    def med2_rows(W: np.ndarray) -> np.ndarray:
        """2x median of each row of a (m x k) int matrix."""
        k = W.shape[1]
        S = np.sort(W, axis=1)
        if k % 2:
            return 2 * S[:, k // 2]
        return S[:, k // 2 - 1] + S[:, k // 2]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["tsu"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        u, eid, c = u[order], eid[order], c[order]
        n = len(u)
        # position within user segment
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = u[1:] != u[:-1]
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
        p = np.arange(n) - seg_start
        out = np.empty(n, dtype=np.int64)
        full = p >= w - 1
        if full.any():
            from numpy.lib.stride_tricks import sliding_window_view

            W = sliding_window_view(c, w)  # row i = c[i..i+w-1]
            out[full] = med2_rows(W[np.flatnonzero(full) - (w - 1)])
        for width in range(1, w):
            idx = np.flatnonzero(p == width - 1)
            if len(idx) == 0:
                continue
            W = np.stack([c[idx - width + 1 + j] for j in range(width)], axis=1)
            out[idx] = med2_rows(W)
        return pd.DataFrame({"event_id": eid, "med2_cents": out})

    return (
        events_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def mode_per_user(events_ds):
    """Exact mode: each user's most frequent event_type (ties break to
    the lexicographically smallest type) plus its count — the
    distributed argmax-per-group aggregate. Per-batch (user, type)
    combiners -> ONE user-bucket shuffle -> per-bucket lexsort argmax;
    output is one row per user."""
    from robosat_ray.functions.hashing import hash_bucket

    def partial(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(et, sort=True)
        key = u * np.int64(len(uniq) if len(uniq) else 1) + codes
        uk, cnt = np.unique(key, return_counts=True)
        nv = np.int64(len(uniq) if len(uniq) else 1)
        uu = uk // nv
        cc = uk % nv
        return pa.table(
            {
                "ubucket": pa.array(hash_bucket(uu, NUM_USER_BUCKETS)),
                "user_id": pa.array(uu),
                "event_type": pa.array(uniq[cc], pa.string()),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["user_id", "event_type"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        agg = agg.sort_values(
            ["user_id", "c", "event_type"],
            ascending=[True, False, True],
            kind="stable",
        )
        first = agg.groupby("user_id", sort=True).head(1)
        return pd.DataFrame(
            {
                "user_id": first["user_id"].to_numpy(np.int64),
                "mode_type": first["event_type"].to_numpy(object),
                "n": first["c"].to_numpy(np.int64),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def user_journey(events_ds):
    """Per-user journey summary: first and last event type in
    (ts, event_id) order, event count, and active span — the
    FIRST_VALUE/LAST_VALUE window surface. ONE user hash-bucket
    shuffle; per bucket a single lexsort gives segment first/last
    rows and min/max timestamps (no per-user Python)."""
    from robosat_ray.functions.hashing import hash_bucket

    def prep(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        return pa.table(
            {
                "ubucket": pa.array(hash_bucket(u, NUM_USER_BUCKETS)),
                "user_id": b.column("user_id"),
                "tsu": b.column("ts").cast(pa.int64()),
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["tsu"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        new = np.ones(len(u), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        last = np.r_[new[1:], True]
        starts = np.flatnonzero(new)
        seg_id = np.cumsum(new) - 1
        n_seg = len(starts)
        cnt = np.bincount(seg_id, minlength=n_seg).astype(np.int64)
        tmin = np.full(n_seg, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(tmin, seg_id, ts)
        tmax = np.full(n_seg, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(tmax, seg_id, ts)
        return pd.DataFrame(
            {
                "user_id": u[new],
                "first_type": et[new],
                "last_type": et[last],
                "n_events": cnt,
                "span_us": tmax - tmin,
            }
        )

    return (
        events_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
