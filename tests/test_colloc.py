"""Collocation lift (stages/text_ops.colloc_lift)."""

import re

import numpy as np
import pyarrow as pa

from robosat_ray.stages.text_ops import colloc_lift

_TOK = re.compile(r"[A-Za-z0-9]+")


def _brute(texts, k=25, min_count=5):
    """Quadratic Python-int reference for the exact lift ranking."""
    uni: dict[str, int] = {}
    bi: dict[str, int] = {}
    t_tok = 0
    n_bi = 0
    for t in texts:
        toks = _TOK.findall(t)
        t_tok += len(toks)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[f"{a} {b}"] = bi.get(f"{a} {b}", 0) + 1
            n_bi += 1
    rows = []
    for bg, c in bi.items():
        if c < min_count:
            continue
        l, r = bg.split(" ", 1)
        lift = c * t_tok * t_tok * 1_000_000 // (n_bi * uni[l] * uni[r])
        rows.append((bg, c, lift))
    rows.sort(key=lambda x: (-x[2], x[0]))
    return rows[:k]


def _ds(texts, blocks=None):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    return ds.repartition(blocks) if blocks else ds


def test_matches_brute_reference(ray_session):
    # planted strong collocation: "zx qy" always adjacent, both rare
    texts = []
    for i in range(40):
        base = f"alpha beta gamma delta alpha beta w{i % 7} beta alpha"
        if i % 4 == 0:
            base += " zx qy zx qy"
        texts.append(base)
    want = _brute(texts)
    got = colloc_lift(_ds(texts))
    assert len(got) == len(want)
    for row, (bg, c, lift) in zip(got.itertuples(index=False), want):
        assert (row.bigram, row.total, row.lift_ppm) == (bg, c, lift)
    # the planted pair must out-lift the stopword-ish pairs
    assert got.bigram.iloc[0] == "zx qy"


def test_partition_invariance(ray_session):
    texts = [
        f"k{i % 11} v{i % 5} k{i % 11} v{i % 5} shared token stream" for i in range(60)
    ]
    import pandas as pd

    a = colloc_lift(_ds(texts))
    b = colloc_lift(_ds(texts, blocks=13))
    pd.testing.assert_frame_equal(a, b)


def test_min_count_floor(ray_session):
    # every bigram appears exactly once -> nothing clears the floor
    texts = [f"a{i} b{i} c{i}" for i in range(30)]
    got = colloc_lift(_ds(texts))
    assert len(got) == 0
