"""Pins for sliding_dau, rolling_median, and the HITS strategy flip."""

import numpy as np
import pandas as pd
import pytest


def test_hits_broadcast_equals_shuffle(ray_session):
    import ray.data

    from robosat_ray.stages.pagerank import hits_scores

    rng = np.random.default_rng(9)
    src = rng.integers(0, 40, 600).astype(np.int64)
    dst = rng.integers(0, 40, 600).astype(np.int64)
    m = src != dst
    # symmetric encoding so every node is both src and dst
    s = np.concatenate([src[m], dst[m]])
    d = np.concatenate([dst[m], src[m]])
    edges = ray.data.from_pandas(pd.DataFrame({"src": s, "dst": d}))
    a = hits_scores(edges, strategy="broadcast").to_pandas()
    b = hits_scores(edges, strategy="shuffle").to_pandas()
    a = a.sort_values("node").reset_index(drop=True)
    b = b.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_sliding_dau_brute(ray_session):
    import ray.data

    from robosat_ray.stages.retention import sliding_dau

    rng = np.random.default_rng(4)
    n = 3000
    us_per_day = 86_400 * 1_000_000
    days = rng.integers(100, 160, n).astype(np.int64)
    users = rng.integers(0, 50, n).astype(np.int64)
    ts = days * us_per_day + rng.integers(0, us_per_day, n)
    ev = ray.data.from_arrow(
        __import__("pyarrow").table(
            {
                "user_id": users,
                "ts": ts.astype("datetime64[us]"),
            }
        )
    )
    got = sliding_dau(ev).sort_values("day").reset_index(drop=True)
    # brute force
    df = pd.DataFrame({"day": days, "user_id": users}).drop_duplicates()
    want = []
    for d in sorted(df["day"].unique()):
        w = df[(df["day"] >= d - 6) & (df["day"] <= d)]
        want.append((d, w["user_id"].nunique()))
    want = pd.DataFrame(want, columns=["day", "dau7"])
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64)
    )


@pytest.mark.parametrize("seed", [1, 2])
def test_rolling_median_vs_pandas(seed, ray_session):
    """Full stage (incl. per-user ramp-up widths) vs pandas rolling
    median with min_periods=1 — same semantics as the DuckDB window."""
    import pyarrow as pa
    import ray.data

    from robosat_ray.stages.events import MEDIAN_WINDOW, rolling_median

    rng = np.random.default_rng(seed)
    n = 400
    user = rng.integers(0, 12, n).astype(np.int64)
    tsu = rng.integers(0, 10**9, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    val = rng.integers(-500, 500, n).astype(np.float64) / 100.0
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_id": eid,
                "user_id": user,
                "ts": tsu.astype("datetime64[us]"),
                "value": val,
            }
        )
    )
    got = (
        rolling_median(ev)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    cents = np.floor(val * 100.0 + 0.5).astype(np.int64)
    sdf = pd.DataFrame(
        {"user_id": user, "tsu": tsu, "event_id": eid, "cents": cents}
    ).sort_values(["user_id", "tsu", "event_id"])
    ref = (
        sdf.groupby("user_id")["cents"]
        .rolling(MEDIAN_WINDOW, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
    )
    want = (
        pd.DataFrame(
            {
                "event_id": sdf["event_id"].to_numpy(),
                "med2_cents": (2 * ref).astype(np.int64).to_numpy(),
            }
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
