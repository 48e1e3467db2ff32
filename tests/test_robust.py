"""Robust stats: exact median/MAD vs naive on a heavy-tailed
construction where outliers actually exist."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.robust import robust_stats


def _li(groups):
    rows_g, rows_v = [], []
    for g, vals in groups.items():
        rows_g += [g] * len(vals)
        rows_v += list(vals)
    return ray.data.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(rows_g, pa.string()),
                "l_extendedprice": pa.array(
                    [v / 100.0 for v in rows_v], pa.float64()
                ),
            }
        )
    )


def _naive(vals):
    v = np.sort(np.asarray(vals, dtype=np.int64))
    n = len(v)
    med = v[int(np.ceil(n / 2)) - 1]  # smallest with cum count >= ceil(n/2)
    dev = np.sort(np.abs(np.asarray(vals, dtype=np.int64) - med))
    mad = dev[int(np.ceil(n / 2)) - 1]
    n_out = int((np.abs(np.asarray(vals, dtype=np.int64) - med) > 3 * mad).sum())
    return med, mad, n_out


def test_heavy_tail_outliers(ray_session):
    rng = np.random.default_rng(17)
    groups = {
        # tight core + far spikes: the spikes are outliers by 3-MAD
        "A": list(rng.integers(10_000, 10_200, size=500))
        + [1_000_000, 2_000_000, 5],
        # symmetric wide: no outliers
        "B": list(rng.integers(0, 100_000, size=400)),
    }
    out = (
        robust_stats(_li(groups)).set_index("l_returnflag").sort_index()
    )
    for g, vals in groups.items():
        med, mad, n_out = _naive(vals)
        assert out.loc[g, "median_cents"] == med
        assert out.loc[g, "mad_cents"] == mad
        assert out.loc[g, "n_outliers"] == n_out
        assert out.loc[g, "n_rows"] == len(vals)
    assert out.loc["A", "n_outliers"] == 3  # the spikes, nothing else


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(23)
    groups = {c: list(rng.integers(0, 10_000, size=700)) for c in "XYZ"}
    a = robust_stats(_li(groups)).sort_values("l_returnflag").reset_index(drop=True)
    b = (
        robust_stats(_li(groups).repartition(9))
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
