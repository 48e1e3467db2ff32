"""Distinct-count + hopping-window operators (stages/distinct.py,
stages/events.py:hopping_window_agg)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from robosat_ray.stages.distinct import (
    HLL_M,
    daily_active_users,
    hll_estimate,
    hll_registers,
)
from robosat_ray.stages.events import HOUR_US, hopping_window_agg

DAY_US = 86_400_000_000


def _events(rng, n, n_users, span_days=5):
    ts = rng.integers(0, span_days * DAY_US, size=n)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
            "value": rng.uniform(0, 100, size=n),
        }
    )


def test_daily_active_users_exact():
    rng = np.random.default_rng(7)
    df = _events(rng, 5000, 300)
    want = (
        df.assign(day=df["ts"].astype(np.int64) // DAY_US)
        .groupby("day")["user_id"]
        .nunique()
        .rename("n_users")
        .reset_index()
    )
    got = (
        daily_active_users(ray.data.from_pandas(df).repartition(7))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hopping_window_matches_pandas():
    rng = np.random.default_rng(8)
    df = _events(rng, 4000, 50, span_days=2)
    k = 4
    ts = df["ts"].astype(np.int64).to_numpy()
    base = ts // HOUR_US
    starts = ((base[:, None] - np.arange(k)[None, :]) * HOUR_US).ravel()
    vm = np.repeat(np.floor(df["value"].to_numpy() * 1e6 + 0.5).astype(np.int64), k)
    want = (
        pd.DataFrame({"window_start": starts, "v": vm})
        .groupby("window_start")
        .agg(n_events=("v", "size"), sum_value_micro=("v", "sum"))
        .reset_index()
    )
    got = (
        hopping_window_agg(ray.data.from_pandas(df).repartition(5))
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every window holds the union of its k hops: total expanded rows
    assert got["n_events"].sum() == len(df) * k


def test_hopping_window_rejects_non_multiple():
    ds = ray.data.from_pandas(_events(np.random.default_rng(0), 10, 3))
    with pytest.raises(AssertionError):
        hopping_window_agg(ds, window_us=3 * HOUR_US, hop_us=2 * HOUR_US)


def test_hll_registers_partitioning_invariant_and_estimate():
    rng = np.random.default_rng(9)
    n_true = 2000
    users = rng.choice(np.arange(10_000_000, dtype=np.int64), size=n_true, replace=False)
    df = pd.DataFrame({"user_id": np.repeat(users, 3)})  # duplicates

    got1 = hll_registers(ray.data.from_pandas(df).repartition(2)).to_pandas()
    got2 = hll_registers(ray.data.from_pandas(df.sample(frac=1, random_state=1)).repartition(11)).to_pandas()
    key = lambda d: d.sort_values("register_idx").reset_index(drop=True)
    # the sketch is a pure function of the value SET: invariant to
    # row order, duplication, and partitioning
    pd.testing.assert_frame_equal(key(got1), key(got2))

    est = hll_estimate(got1)
    # standard error ~ 1.04/sqrt(4096) = 1.6%; allow 5%
    assert abs(est - n_true) / n_true < 0.05


def test_hll_small_range_correction():
    df = pd.DataFrame({"user_id": np.arange(40, dtype=np.int64)})
    reg = hll_registers(ray.data.from_pandas(df)).to_pandas()
    assert len(reg) <= 40 <= HLL_M
    est = hll_estimate(reg)
    # linear-counting regime: tiny cardinalities stay near-exact
    assert abs(est - 40) / 40 < 0.05


def test_top_tokens_matches_pandas():
    from robosat_ray.stages.text_ops import top_tokens

    rng = np.random.default_rng(13)
    vocab = np.array([f"w{i}" for i in range(50)])
    texts = [
        " ".join(rng.choice(vocab, rng.integers(5, 40)))
        for _ in range(300)
    ]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64), "text": texts})
    toks = pd.Series(" ".join(texts).split(" "))
    want = (
        toks.value_counts()
        .rename_axis("token")
        .reset_index(name="total")
        .sort_values(["total", "token"], ascending=[False, True], kind="stable")
        .head(7)
        .reset_index(drop=True)
    )
    got = top_tokens(ray.data.from_pandas(df).repartition(5), k=7)
    assert list(got["token"]) == list(want["token"])
    assert list(got["total"]) == list(want["total"])
    assert list(got["rank"]) == list(range(1, 8))


def test_quality_percentile_filter():
    from robosat_ray.stages.quality import quality_percentile_filter

    rng = np.random.default_rng(17)
    # mixed-quality docs: mostly-alpha vs digit-heavy
    texts = []
    for i in range(200):
        if i % 4 == 0:
            texts.append("12345 678 " * rng.integers(2, 6))
        else:
            texts.append("clean alpha words only " * rng.integers(2, 6))
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    got = (
        quality_percentile_filter(ray.data.from_pandas(df).repartition(5), q_pct=25)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # ground truth with the same integer rule
    n_alpha = df["text"].str.count("[A-Za-z]").to_numpy(np.float64)
    n_chars = np.maximum(df["text"].str.len().to_numpy(np.int64), 1).astype(np.float64)
    micro = np.floor(1e6 * n_alpha / n_chars + 0.5).astype(np.int64)
    sv = np.sort(micro)
    target = (25 * len(sv) + 99) // 100
    thr = sv[target - 1]
    want = df.loc[micro >= thr, ["doc_id"]].reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert (got["ratio_micro"].to_numpy() >= thr).all()


def test_chunking_covers_all_tokens_with_overlap():
    from robosat_ray.stages.text_ops import chunk_documents

    rng = np.random.default_rng(23)
    texts = [
        " ".join(f"t{i}" for i in range(n))
        for n in [0, 1, 63, 64, 65, 112, 113, 200, int(rng.integers(300, 400))]
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    got = (
        chunk_documents(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    # empty doc emits nothing
    assert 0 not in set(got["doc_id"])
    for did, n in [(1, 1), (2, 63), (3, 64), (4, 65), (5, 112), (6, 113), (7, 200)]:
        sub = got[got["doc_id"] == did]
        toks = df.loc[did, "text"].split(" ")
        # reconstruction: stride-48 prefixes of each chunk concatenated
        # (plus the final chunk's tail) give back the token stream
        rebuilt = []
        for _, r in sub.iterrows():
            rebuilt.extend(r["chunk"].split(" ")[:48])
        last = sub.iloc[-1]["chunk"].split(" ")
        rebuilt.extend(last[48:])
        assert rebuilt == toks, f"doc {did}"
        assert (sub["n_tokens"] <= 64).all()
        # overlap: consecutive chunks share w - s = 16 tokens
        chunks = [r.split(" ") for r in sub["chunk"]]
        for a, b in zip(chunks, chunks[1:]):
            assert a[48:] == b[: len(a) - 48]


def test_group_quantiles_randomized_vs_bruteforce(ray_session):
    """Randomized exact-quantile cross-check: the two-pass histogram
    machinery must equal the direct rule (smallest value whose running
    count reaches ceil(q*total/100)) on skewed, duplicate-heavy data."""
    import ray.data

    from robosat_ray.stages.quantiles import group_quantiles

    rng = np.random.default_rng(3)
    n = 20000
    g = rng.choice(np.asarray(["a", "b", "c"], dtype=object), n)
    # heavy duplication + skew + negatives + huge spread
    v = np.where(
        rng.random(n) < 0.5,
        rng.integers(-50, 50, n),
        rng.integers(-10**9, 10**9, n),
    ).astype(np.int64)
    tbl = pa.table({"grp": pa.array(g, pa.string()), "val": pa.array(v)})
    got = (
        group_quantiles(ray.data.from_arrow(tbl).repartition(6), "grp", "val")
        .to_pandas()
        .set_index(["grp", "q_pct"])
        .sort_index()
    )
    df = pd.DataFrame({"grp": g, "val": v})
    for grp, sub in df.groupby("grp"):
        s = np.sort(sub["val"].to_numpy())
        total = len(s)
        for q in (25, 50, 75, 95):
            rank = (q * total + 99) // 100  # ceil(q*total/100)
            expect = int(s[rank - 1])
            assert got.loc[(grp, q), "value"] == expect, (grp, q)
