"""Funnel: greedy earliest-match chain semantics beyond the oracle
parity sweep."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.funnel import FUNNEL_HORIZON_US, funnel

H = FUNNEL_HORIZON_US
S = 1_000_000


def _events(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    np.array([r[2] for r in rows], dtype="datetime64[us]")
                ),
            }
        )
    )


def test_greedy_earliest_match_can_block_conversion(ray_session):
    """The EARLIEST qualifying view anchors step 3 — a later view that
    would have led to a purchase does not count (greedy, not optimal:
    the industry-standard funnel semantics this operator pins)."""
    rows = [
        (1, "signup", 0),
        (1, "view", 10 * S),          # earliest view -> anchors step 3
        (1, "view", H - S),           # later view (ignored as anchor)
        (1, "purchase", 10 * S + H + S),  # within H of the LATER view only
    ]
    out = funnel(_events(rows)).to_pandas().set_index("user_id")
    assert out.loc[1, "stage"] == 2
    assert out.loc[1, "t2_us"] == 10 * S
    assert out.loc[1, "t3_us"] == -1


def test_horizon_boundary_and_strict_after(ray_session):
    rows = [
        (1, "signup", 0),
        (1, "view", H),            # exactly H after t1: kept (<=)
        (2, "signup", 0),
        (2, "view", H + 1),        # H+1: outside
        (3, "signup", 0),
        (3, "view", 0),            # simultaneous: strict > excludes it
        (4, "view", 0),            # no signup at all -> stage 0
    ]
    out = funnel(_events(rows)).to_pandas().set_index("user_id")
    assert out.loc[1, "stage"] == 2 and out.loc[1, "t2_us"] == H
    assert out.loc[2, "stage"] == 1
    assert out.loc[3, "stage"] == 1
    assert out.loc[4, "stage"] == 0 and out.loc[4, "t1_us"] == -1


def test_full_conversion(ray_session):
    rows = [
        (7, "signup", 5 * S),
        (7, "view", 6 * S),
        (7, "purchase", 7 * S),
        (7, "purchase", 6 * S),  # before the view: not a conversion
    ]
    out = funnel(_events(rows)).to_pandas().set_index("user_id")
    assert out.loc[7, "stage"] == 3
    assert out.loc[7, "t3_us"] == 7 * S


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(13)
    types = np.array(["signup", "view", "purchase", "click"])
    rows = [
        (int(rng.integers(0, 40)), str(types[rng.integers(0, 4)]),
         int(rng.integers(0, 3 * H)))
        for _ in range(4000)
    ]
    cols = ["user_id", "stage", "t1_us", "t2_us", "t3_us"]

    def run(ds):
        df = funnel(ds).to_pandas()
        return df[cols].sort_values("user_id").reset_index(drop=True)

    a = run(_events(rows))
    b = run(_events(rows).repartition(17))
    pd.testing.assert_frame_equal(a, b)
