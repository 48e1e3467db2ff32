"""Mergeable base-2 quantile sketch: exact bin function at power-of-2
boundaries, partition invariance (mergeability), quantile rule."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.qsketch import log2_bins, quantile_sketch


def test_log2_bins_exact_at_boundaries():
    v = np.array([1, 2, 3, 4, 7, 8, 1023, 1024, 1025, 2**40, 2**52 - 1, 2**52], np.int64)
    want = np.array([0, 1, 1, 2, 2, 3, 9, 10, 10, 40, 51, 52], np.int64)
    np.testing.assert_array_equal(log2_bins(v), want)
    # zero/negative clamp to bin 0
    np.testing.assert_array_equal(log2_bins(np.array([0, -5], np.int64)), [0, 0])


def test_partition_invariance_mergeability(ray_session):
    rng = np.random.default_rng(4)
    t = pa.table(
        {
            "lang": pa.array(np.random.default_rng(1).choice(["en", "de", "fr"], 5000)),
            "n_chars": pa.array(rng.integers(1, 100000, 5000).astype(np.int64)),
        }
    )
    a = quantile_sketch(ray.data.from_arrow(t), "lang", "n_chars")
    b = quantile_sketch(ray.data.from_arrow(t).repartition(17), "lang", "n_chars")
    cols = ["lang", "q_micro"]
    pd.testing.assert_frame_equal(
        a.sort_values(cols).reset_index(drop=True),
        b.sort_values(cols).reset_index(drop=True),
    )


def test_quantile_rule_vs_exact(ray_session):
    """The reported [lo, hi] bucket must contain the EXACT quantile
    value (the sketch's factor-2 guarantee, tight for its rank rule)."""
    rng = np.random.default_rng(6)
    vals = rng.integers(1, 1_000_000, 20000).astype(np.int64)
    t = pa.table({"lang": pa.array(["xx"] * len(vals)), "n_chars": pa.array(vals)})
    out = quantile_sketch(ray.data.from_arrow(t), "lang", "n_chars")
    s = np.sort(vals)
    for _, r in out.iterrows():
        qm = r["q_micro"]
        # the sketch's rank: first value index with cum*1e6 >= qm*n —
        # cum at a value v = count of elements in bins <= bin(v)
        exact_rank_val = s[min(len(s) - 1, int(np.ceil(qm * len(s) / 1e6)) - 1)]
        # the r-th smallest value lies in the reported bin by
        # construction (cum(b-1) < r <= cum(b)): strict containment
        assert r["lo"] <= exact_rank_val <= r["hi"]
        assert r["hi"] == 2 * r["lo"] - 1  # factor-2 interval
