"""Prefix-filter pins for stages/ppjoin.py (full-pipeline oracle
parity runs in test_oracle_parity.py; the oracle is brute force, so
parity IS the completeness proof at data scale)."""

import numpy as np
import pandas as pd

from robosat_ray.stages.ppjoin import (
    PP_TAU_DEN,
    PP_TAU_NUM,
    _mine_pairs,
    _prefix_rows,
)


def test_prefix_length_rule():
    # one doc, n tokens, df ties -> prefix = n - ceil(tau*n) + 1
    # smallest-(df, th) tokens
    for n in (1, 5, 10, 54):
        g = pd.DataFrame(
            {
                "doc_id": np.full(n, 7, np.int64),
                "th": np.arange(n, dtype=np.int64),
                "df": np.ones(n, dtype=np.int64),
                "n": np.full(n, n, np.int64),
            }
        )
        out = _prefix_rows(g)
        want_len = n - ((PP_TAU_NUM * n + PP_TAU_DEN - 1) // PP_TAU_DEN) + 1
        assert len(out) == want_len
        assert sorted(out["th"]) == list(range(want_len))  # df-tie -> min th first


def test_rare_tokens_indexed_first():
    # the doc's prefix must take the LOWEST-df tokens
    g = pd.DataFrame(
        {
            "doc_id": np.full(10, 1, np.int64),
            "th": np.arange(10, dtype=np.int64),
            "df": np.array([100, 1, 100, 2, 100, 3, 100, 100, 100, 100], np.int64),
            "n": np.full(10, 10, np.int64),
        }
    )
    out = _prefix_rows(g)  # l = 10 - 9 + 1 = 2
    assert set(out["th"]) == {1, 3}


def test_verify_path_flip_bit_equal(monkeypatch):
    """Forcing the candidate set down the co-partition verify path
    (cap = 0: dedup_pairs_ds + carrier/need join) must reproduce the
    broadcast fast path bit-for-bit."""
    import robosat_ray.stages.ppjoin as pp
    from robosat_ray.pipelines.queries import _docs_ds

    sf = "/root/testdata/sf0.001"
    a = pp.ppjoin_pairs(_docs_ds(sf))
    monkeypatch.setattr(pp, "PP_BROADCAST_PAIR_CAP", 0)
    b = pp.ppjoin_pairs(_docs_ds(sf))
    pd.testing.assert_frame_equal(a, b)


def test_mine_pairs_ragged_triu_and_length_filter():
    # token 5 shared by docs 1,2,3 (sizes 10,10,4): size-4 doc fails
    # the length filter vs size-10 (10*4 < 9*10)
    g = pd.DataFrame(
        {
            "th": np.array([5, 5, 5, 9], np.int64),
            "doc_id": np.array([1, 2, 3, 1], np.int64),
            "n": np.array([10, 10, 4, 10], np.int64),
        }
    )
    out = _mine_pairs(g).sort_values(["a", "b"]).reset_index(drop=True)
    assert list(map(tuple, out[["a", "b"]].to_numpy())) == [(1, 2)]
