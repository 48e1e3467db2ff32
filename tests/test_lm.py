"""Bigram LM fluency: hand-computed tiny-corpus scores, common-vs-
gibberish ordering, degenerate docs (empty / one token), and
partition invariance."""

import numpy as np
import pyarrow as pa
import ray.data

from robosat_ray.functions.text_hash import hash64
from robosat_ray.stages.lm import N_LM_BUCKETS, lm_fluency

B = 1099511628211
U = 1 << 64


def _ub(t):
    return hash64(t) % N_LM_BUCKETS


def _bb(a, b):
    return ((hash64(a) * B + hash64(b)) % U) % N_LM_BUCKETS


def _docs(texts, blocks=1):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
    )
    return ds.repartition(blocks) if blocks > 1 else ds


def _run(texts, blocks=1):
    out = lm_fluency(_docs(texts, blocks)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _ref(texts):
    """quadratic reference: exact hashed-bucket counts in plain dicts."""
    uni, bi = {}, {}
    for t in texts:
        toks = t.split(" ")
        for w in toks:
            uni[_ub(w)] = uni.get(_ub(w), 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[_bb(a, b)] = bi.get(_bb(a, b), 0) + 1
    rows = []
    for i, t in enumerate(texts):
        toks = t.split(" ")
        ps = [
            (1000 * bi[_bb(a, b)]) // uni[_ub(a)]
            for a, b in zip(toks, toks[1:])
        ]
        rows.append((i, len(ps), sum(ps) // len(ps) if ps else 0))
    return rows


def test_hand_computed_tiny_corpus():
    texts = ["the cat sat", "the cat ran", "the cat sat", "zq"]
    out = _run(texts)
    for i, nb, f in _ref(texts):
        assert out["n_bigrams"].iloc[i] == nb
        assert out["fluency_milli"].iloc[i] == f
    # "the cat" occurs 3x after "the" (3x): p = 1000; "cat sat" 2/3,
    # "cat ran" 1/3 — doc 0 = (1000 + 666) // 2 = 833 (bucket
    # collisions can only raise this; assert the collision-free value
    # holds on this vocabulary)
    assert out["fluency_milli"].iloc[0] == 833
    assert out["n_bigrams"].iloc[3] == 0 and out["fluency_milli"].iloc[3] == 0


def test_common_beats_gibberish():
    common = "data engine runs fast"
    # same vocabulary, shuffled order: unigrams are common (count 21)
    # but its bigrams occur once -> p ~ 1000 // 21 = 47 each
    texts = [common] * 20 + ["fast engine data runs", ""]
    out = _run(texts)
    assert out["fluency_milli"].iloc[0] >= 952  # 20/21 per bigram
    assert out["fluency_milli"].iloc[20] <= 47
    assert out["n_bigrams"].iloc[21] == 0  # '' splits to one token


def test_partition_invariance():
    rng = np.random.RandomState(7)
    vocab = np.array([f"w{i}" for i in range(30)])
    texts = [
        " ".join(vocab[rng.randint(0, 30, rng.randint(0, 12))]) for _ in range(200)
    ]
    a = _run(texts, blocks=1)
    b = _run(texts, blocks=7)
    assert (a["fluency_milli"] == b["fluency_milli"]).all()
    assert (a["n_bigrams"] == b["n_bigrams"]).all()
    for i, nb, f in _ref(texts):
        assert out_eq(a, i, nb, f)


def out_eq(df, i, nb, f):
    return df["n_bigrams"].iloc[i] == nb and df["fluency_milli"].iloc[i] == f
