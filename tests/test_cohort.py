"""Cohort retention: triangle semantics on an enumerable corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.cohort import WEEK_US, cohort_retention


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


def test_triangle_semantics(ray_session):
    W = WEEK_US
    rows = [
        # user 1: signs up week 0, active weeks 0, 1, 3
        (1, "signup", 0), (1, "click", W + 5), (1, "view", 3 * W + 5),
        # user 2: signs up week 0, active week 0 only (twice: distinct!)
        (2, "signup", 10), (2, "click", 20),
        # user 3: signs up week 1, pre-signup activity week 0 (excluded)
        (3, "view", 5), (3, "signup", W + 5), (3, "click", 2 * W + 5),
        # user 4: never signs up -> in no cohort
        (4, "click", 5),
    ]
    out = (
        cohort_retention(_events(rows))
        .to_pandas()
        .set_index(["cohort_week", "k"])["n_users"]
        .sort_index()
    )
    want = {
        (0, 0): 2,  # users 1, 2
        (0, 1): 1,  # user 1
        (0, 3): 1,  # user 1
        (1, 0): 1,  # user 3
        (1, 1): 1,  # user 3
    }
    assert dict(out) == want


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(21)
    types = np.array(["signup", "view", "click"])
    rows = [
        (int(rng.integers(0, 60)), str(types[rng.integers(0, 3)]),
         int(rng.integers(0, 20 * WEEK_US)))
        for _ in range(5000)
    ]

    def run(ds):
        df = cohort_retention(ds).to_pandas()
        return df.sort_values(["cohort_week", "k"]).reset_index(drop=True)

    a = run(_events(rows))
    b = run(_events(rows).repartition(17))
    pd.testing.assert_frame_equal(a, b)
