"""As-of and range joins over the events log: kernel edge cases vs a
brute-force reference, on a corpus engineered for ties and boundaries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from robosat_ray.stages.events import asof_join, range_join

US = 1_000_000
HOUR = 3600 * US


def _corpus():
    """Hand-built log: (user, ts) ties on the right side, unmatched
    lefts, exact window-boundary rows, an empty-right user."""
    rows = [
        # user 1: two views at the SAME ts (tie -> max event_id wins)
        (10, 1, 100 * US, "view", 1.5),
        (11, 1, 100 * US, "view", 2.5),
        (12, 1, 200 * US, "purchase", 9.0),   # matches view 11
        (13, 1, 100 * US, "purchase", 9.0),   # ts == view ts -> still matches (<=)
        # user 2: purchase BEFORE any view -> unmatched
        (20, 2, 50 * US, "purchase", 1.0),
        (21, 2, 60 * US, "view", 4.0),
        (22, 2, 70 * US, "purchase", 1.0),    # matches view 21
        # user 3: no views at all
        (30, 3, 10 * US, "purchase", 1.0),
        # user 4: clicks at exact window boundaries of a purchase at t=2h
        (40, 4, 2 * HOUR - HOUR, "click", 1.0),      # ts - 1h: INCLUDED (>= lo)
        (41, 4, 2 * HOUR - 1, "click", 2.0),          # just inside
        (42, 4, 2 * HOUR, "click", 4.0),              # ts itself: EXCLUDED (< hi)
        (43, 4, 2 * HOUR - HOUR - 1, "click", 8.0),   # just before lo: EXCLUDED
        (44, 4, 2 * HOUR, "purchase", 0.0),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    return ray.data.from_arrow(t)


def test_asof_ties_and_unmatched():
    out = (
        asof_join(_corpus(), "purchase", "view")
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # tie at ts=100: max event_id (11) wins, value follows the winner
    assert out.loc[12, "match_event_id"] == 11
    assert out.loc[12, "match_value_micro"] == 2_500_000
    assert out.loc[12, "lag_us"] == 100 * US
    # equal-ts match allowed (<= semantics)
    assert out.loc[13, "match_event_id"] == 11
    assert out.loc[13, "lag_us"] == 0
    # unmatched lefts get sentinels
    assert out.loc[20, "match_event_id"] == -1
    assert out.loc[20, "lag_us"] == -1
    assert out.loc[30, "match_event_id"] == -1
    # normal match
    assert out.loc[22, "match_event_id"] == 21


def test_range_join_boundaries():
    out = (
        range_join(_corpus(), "purchase", "click", window_us=HOUR)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # window [ts-1h, ts): includes 40 (== lo) and 41, excludes 42 (== ts)
    # and 43 (lo - 1)
    assert out.loc[44, "n_prior"] == 2
    assert out.loc[44, "sum_prior_micro"] == 3_000_000
    # purchases with no clicks at all -> zeros
    assert out.loc[12, "n_prior"] == 0
    assert out.loc[12, "sum_prior_micro"] == 0


def test_asof_matches_bruteforce_random():
    """Random log vs an O(n^2) reference implementation."""
    rng = np.random.default_rng(7)
    n = 400
    uid = rng.integers(0, 12, n)
    ts = rng.integers(0, 5000, n) * US
    types = np.where(rng.random(n) < 0.5, "purchase", "view")
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(types.tolist()),
            "value": pa.array(rng.random(n).round(3), pa.float64()),
        }
    )
    got = (
        asof_join(ray.data.from_arrow(t), "purchase", "view")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["tsu"] = df["ts"].astype("int64")
    want_rows = []
    for _, p in df[df.event_type == "purchase"].iterrows():
        cand = df[
            (df.event_type == "view")
            & (df.user_id == p.user_id)
            & (df.tsu <= p.tsu)
        ]
        if len(cand):
            best_ts = cand.tsu.max()
            at = cand[cand.tsu == best_ts]
            w = at.loc[at.event_id.idxmax()]
            want_rows.append((p.event_id, w.event_id, int(np.floor(w.value * 1e6 + 0.5)), p.tsu - w.tsu))
        else:
            want_rows.append((p.event_id, -1, 0, -1))
    want = pd.DataFrame(
        want_rows, columns=["event_id", "match_event_id", "match_value_micro", "lag_us"]
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "match_event_id", "match_value_micro", "lag_us"]], want
    )


def test_range_matches_bruteforce_random():
    rng = np.random.default_rng(11)
    n = 400
    uid = rng.integers(0, 12, n)
    ts = rng.integers(0, 3 * 3600, n) * US
    types = np.where(rng.random(n) < 0.5, "purchase", "click")
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(types.tolist()),
            "value": pa.array(rng.random(n).round(3), pa.float64()),
        }
    )
    got = (
        range_join(ray.data.from_arrow(t), "purchase", "click", window_us=HOUR)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["tsu"] = df["ts"].astype("int64")
    want_rows = []
    for _, p in df[df.event_type == "purchase"].iterrows():
        cand = df[
            (df.event_type == "click")
            & (df.user_id == p.user_id)
            & (df.tsu >= p.tsu - HOUR)
            & (df.tsu < p.tsu)
        ]
        want_rows.append((p.event_id, len(cand), int(np.floor(cand.value.to_numpy() * 1e6 + 0.5).astype(np.int64).sum())))
    want = pd.DataFrame(want_rows, columns=["event_id", "n_prior", "sum_prior_micro"]).sort_values(
        "event_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["event_id", "n_prior", "sum_prior_micro"]], want)


def test_joins_partitioning_invariant():
    """Co-partition joins must give identical results regardless of
    input block layout (1 block vs many)."""
    rng = np.random.default_rng(21)
    n = 300
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 9, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 4000, n) * US, pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(np.where(rng.random(n) < 0.5, "purchase", "view").tolist()),
            "value": pa.array(rng.random(n).round(3), pa.float64()),
        }
    )

    def run(ds):
        return (
            asof_join(ds, "purchase", "view")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )

    one = run(ray.data.from_arrow(t))
    many = run(ray.data.from_arrow(t).repartition(13))
    pd.testing.assert_frame_equal(one, many)


def test_asof_join_randomized_vs_merge_asof(ray_session):
    """Randomized cross-check vs pandas.merge_asof: heavy (user, ts)
    tie density, users with no candidates, exact-ts matches."""
    import ray.data

    from robosat_ray.stages.events import asof_join

    rng = np.random.default_rng(5)
    n = 4000
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                rng.integers(0, 2000, n).astype("datetime64[s]").astype("datetime64[us]")
            ),
            "user_id": pa.array(rng.integers(0, 30, n).astype(np.int64)),
            "event_type": pa.array(
                np.asarray(["purchase", "view", "click"], dtype=object)[
                    rng.integers(0, 3, n)
                ],
                pa.string(),
            ),
            "value": pa.array(np.round(rng.random(n), 3)),
        }
    )
    got = (
        asof_join(ray.data.from_arrow(events).repartition(5))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    df = events.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    L = df[df["event_type"] == "purchase"].sort_values(["ts_us", "event_id"])
    R = df[df["event_type"] == "view"].sort_values(["ts_us", "event_id"])
    R = R.assign(rts=R["ts_us"], rid=R["event_id"], rval=R["value"])
    exp = pd.merge_asof(
        L, R[["ts_us", "user_id", "rts", "rid", "rval"]],
        on="ts_us", by="user_id", direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    # merge_asof picks the LAST right row in sort order for ts ties ==
    # the engine's max-event_id tie-break (R sorted by (ts, event_id))
    assert len(got) == len(exp)
    assert (got["event_id"].to_numpy() == exp["event_id"].to_numpy()).all()
    match = exp["rid"].fillna(-1).astype(np.int64).to_numpy()
    assert (got["match_event_id"].to_numpy() == match).all()
    lag = (exp["ts_us"] - exp["rts"]).fillna(-1).astype(np.int64).to_numpy()
    got_lag = got["lag_us"].to_numpy()
    ok = match == -1
    assert (got_lag[~ok] == lag[~ok]).all()
    assert (got_lag[ok] == -1).all()
    assert (got.loc[match == -1, "match_value_micro"] == 0).all()
    assert (match != -1).sum() > 100 and (match == -1).sum() > 0


def test_range_join_randomized_vs_bruteforce(ray_session):
    """Randomized interval-join cross-check vs an O(n*m) brute force:
    boundary inclusivity [ts-w, ts), same-ts exclusion, empty users."""
    import ray.data

    from robosat_ray.stages.events import range_join

    rng = np.random.default_rng(9)
    n = 2500
    w = 50 * US
    ts_us = rng.integers(0, 600, n) * US  # coarse grid: many exact-boundary hits
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts_us.astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, 20, n).astype(np.int64)),
            "event_type": pa.array(
                np.asarray(["purchase", "click", "view"], dtype=object)[
                    rng.integers(0, 3, n)
                ],
                pa.string(),
            ),
            "value": pa.array(np.round(rng.random(n), 3)),
        }
    )
    got = (
        range_join(ray.data.from_arrow(events).repartition(4), window_us=w)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = events.to_pandas()
    df["tus"] = df["ts"].astype("int64")
    L = df[df["event_type"] == "purchase"]
    R = df[df["event_type"] == "click"]
    assert len(got) == len(L)
    for _, row in L.sample(200, random_state=0).iterrows():
        m = R[
            (R["user_id"] == row["user_id"])
            & (R["tus"] >= row["tus"] - w)
            & (R["tus"] < row["tus"])
        ]
        g = got[got["event_id"] == row["event_id"]].iloc[0]
        assert g["n_prior"] == len(m), row["event_id"]
        assert g["sum_prior_micro"] == int(np.floor(m["value"].to_numpy() * 1e6 + 0.5).astype(np.int64).sum()), row["event_id"]
