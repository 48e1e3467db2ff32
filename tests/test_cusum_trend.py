"""CUSUM alerts + per-user trend (stages/events)."""

import numpy as np
import pandas as pd
import pyarrow as pa

DAY_US = 86_400_000_000


def _ev(rows):
    """rows: (event_id, user_id, ts_us, value)"""
    import ray.data

    e, u, t, v = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(np.asarray(e, np.int64)),
                "user_id": pa.array(np.asarray(u, np.int64)),
                "ts": pa.array(np.asarray(t, np.int64)).cast(pa.timestamp("us")),
                "value": pa.array(np.asarray(v, np.float64)),
            }
        )
    )


def _cusum(rows, k, h, blocks=None):
    from robosat_ray.stages.events import cusum_alerts

    ds = _ev(rows)
    if blocks:
        ds = ds.repartition(blocks)
    return (
        cusum_alerts(ds, k=k, h=h)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def _cusum_ref(values, k, h):
    """The literal recursion the closed form must reproduce."""
    s, n_alerts, mx = 0, 0, 0
    for v in values:
        s = max(0, s + int(round(v * 100)) - k)
        n_alerts += s > h
        mx = max(mx, s)
    return n_alerts, mx


def test_cusum_matches_literal_recursion(ray_session):
    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 200, size=400)
    rows = [(i, 1, i * 1000, float(v)) for i, v in enumerate(vals)]
    out = _cusum(rows, k=9000, h=30000)
    n_ref, mx_ref = _cusum_ref(vals, 9000, 30000)
    assert out.n_alerts.tolist() == [n_ref]
    assert out.max_stat.tolist() == [mx_ref]


def test_cusum_resets_at_zero(ray_session):
    # one spike then a long quiet stretch: the statistic decays back
    # to 0 and stays there (never goes negative)
    rows = [(0, 5, 0, 500.0)] + [(i, 5, i * 1000, 1.0) for i in range(1, 50)]
    out = _cusum(rows, k=10000, h=35000)
    assert out.n_alerts.tolist() == [1]  # only the spike row
    assert out.max_stat.tolist() == [40000]


def test_cusum_partition_invariance(ray_session):
    rng = np.random.default_rng(5)
    rows = [
        (i, int(rng.integers(0, 7)), int(rng.integers(0, 10**9)), float(rng.uniform(0, 300)))
        for i in range(500)
    ]
    a = _cusum(rows, k=8000, h=25000)
    b = _cusum(rows, k=8000, h=25000, blocks=11)
    pd.testing.assert_frame_equal(a, b)


def _trend(rows, blocks=None):
    from robosat_ray.stages.events import user_trend

    ds = _ev(rows)
    if blocks:
        ds = ds.repartition(blocks)
    return (
        user_trend(ds.select_columns(["user_id", "ts", "value"]))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def test_trend_exact_slope(ray_session):
    # user 1: cents = 100 * day + 500 exactly -> slope_num/slope_den == 100
    base_day = 19723
    rows = [
        (i, 1, (base_day + i) * DAY_US, (100 * (base_day + i - 19700) + 500) / 100.0)
        for i in range(10)
    ]
    out = _trend(rows)
    assert len(out) == 1
    assert out.slope_num.iloc[0] % out.slope_den.iloc[0] == 0
    assert out.slope_num.iloc[0] // out.slope_den.iloc[0] == 100
    assert out.n_events.iloc[0] == 10


def test_trend_constant_is_zero_slope(ray_session):
    rows = [(i, 2, (19723 + i) * DAY_US, 7.5) for i in range(6)]
    out = _trend(rows)
    assert out.slope_num.tolist() == [0]
    assert out.slope_den.tolist() != [0]


def test_trend_single_day_zero_den(ray_session):
    # all events on one day: den = 0 (vertical), num = 0 too
    rows = [(i, 3, 19723 * DAY_US + i, float(i)) for i in range(5)]
    out = _trend(rows)
    assert out.slope_den.tolist() == [0]


def test_trend_partition_invariance(ray_session):
    rng = np.random.default_rng(9)
    rows = [
        (
            i,
            int(rng.integers(0, 8)),
            int((19723 + rng.integers(0, 30)) * DAY_US + rng.integers(0, DAY_US)),
            float(rng.uniform(0, 400)),
        )
        for i in range(600)
    ]
    a = _trend(rows)
    b = _trend(rows, blocks=13)
    pd.testing.assert_frame_equal(a, b)
