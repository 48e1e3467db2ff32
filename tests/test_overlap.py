"""Kernel-level pins for stages/overlap.py (the oracle-parity test in
test_oracle_parity.py covers the full pipeline)."""

import numpy as np
import pandas as pd

from robosat_ray.stages.overlap import _overlap_bucket


def _run(supp, s, e):
    g = pd.DataFrame({"suppkey": supp, "s": s, "e": e})
    return _overlap_bucket(g).set_index("suppkey")


def test_inclusive_end_overlap_and_peak_ties():
    # [0,5] and [5,9] share day 5 -> overlap, peak 2;
    # [0,4] and [5,9] are disjoint (the -1 at e+1=5 applies BEFORE
    # the +1 at day 5) -> no pair, peak 1.
    r = _run([1, 1, 2, 2], [0, 5, 0, 5], [5, 9, 4, 9])
    assert r.loc[1, "n_overlap_pairs"] == 1 and r.loc[1, "peak_concurrency"] == 2
    assert r.loc[2, "n_overlap_pairs"] == 0 and r.loc[2, "peak_concurrency"] == 1


def test_pair_count_matches_brute_force_across_segments():
    rng = np.random.default_rng(7)
    n = 400
    supp = rng.integers(0, 5, n)
    s = rng.integers(0, 60, n)
    e = s + rng.integers(0, 10, n)
    r = _run(supp, s, e)
    for k in range(5):
        m = supp == k
        ss, ee = s[m], e[m]
        brute = sum(
            int(ss[i] <= ee[j] and ss[j] <= ee[i])
            for i in range(len(ss))
            for j in range(i + 1, len(ss))
        )
        assert r.loc[k, "n_overlap_pairs"] == brute
        days = np.arange(0, 75)
        cover = ((ss[None, :] <= days[:, None]) & (days[:, None] <= ee[None, :])).sum(1)
        assert r.loc[k, "peak_concurrency"] == cover.max()
        assert r.loc[k, "n_intervals"] == m.sum()
