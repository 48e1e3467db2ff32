"""Fixed-round k-core peeling: planted graphs with known cores,
rounds-cap semantics (a chain that peels layer by layer), strategy
flip (broadcast vs shuffle) bit-equality, partition invariance, and a
quadratic reference peeler."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.kcore import kcore


def _graph(pairs, nodes, blocks=1):
    a = np.array([p[0] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs], np.int64)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )
    )
    nd = ray.data.from_arrow(pa.table({"node": pa.array(np.asarray(nodes, np.int64))}))
    if blocks > 1:
        edges = edges.repartition(blocks)
        nd = nd.repartition(min(blocks, len(nodes)))
    return edges, nd


def _run(edges, nodes, **kw):
    out = kcore(edges, nodes, **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def _reference_peel(pairs, nodes, k, rounds):
    """Quadratic reference: literal round-by-round peeling."""
    alive = {n for p in pairs for n in p}
    for _ in range(rounds):
        deg = {}
        for a, b in pairs:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        new = {n for n in alive if deg.get(n, 0) >= k}
        if new == alive:
            break
        alive = new
    deg = {}
    for a, b in pairs:
        if a in alive and b in alive:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
    return {
        n: (1, deg.get(n, 0)) if n in alive else (0, -1) for n in nodes
    }


def test_clique_plus_tail():
    # 4-clique (every node degree 3) survives 3-core peeling forever;
    # the pendant tail (5-6) and the isolated node do not.
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pairs = clique + [(4, 5), (5, 6)]
    edges, nodes = _graph(pairs, [1, 2, 3, 4, 5, 6, 9])
    out = _run(edges, nodes, k=3).set_index("node")
    assert (out.loc[[1, 2, 3, 4], "in_core"] == 1).all()
    assert (out.loc[[1, 2, 3, 4], "core_deg"] == 3).all()
    assert (out.loc[[5, 6, 9], "in_core"] == 0).all()
    assert (out.loc[[5, 6, 9], "core_deg"] == -1).all()


def test_rounds_cap_peels_layer_by_layer():
    # chain 1-2-...-10 under k=2: each round removes the two current
    # endpoints. rounds=2 leaves 5..6? No: chain of 10, round 1 drops
    # 1 and 10, round 2 drops 2 and 9 -> survivors 3..8 with end
    # degrees 1 (the cap freezes mid-peel); full peeling empties it.
    pairs = [(i, i + 1) for i in range(1, 10)]
    edges, nodes = _graph(pairs, list(range(1, 11)))
    out = _run(edges, nodes, k=2, rounds=2).set_index("node")
    assert (out.loc[[1, 2, 9, 10], "in_core"] == 0).all()
    assert (out.loc[[3, 4, 5, 6, 7, 8], "in_core"] == 1).all()
    assert out.loc[3, "core_deg"] == 1 and out.loc[8, "core_deg"] == 1
    assert out.loc[5, "core_deg"] == 2
    edges2, nodes2 = _graph(pairs, list(range(1, 11)))
    out9 = _run(edges2, nodes2, k=2, rounds=9)
    assert (out9["in_core"] == 0).all()


def test_strategy_flip_bit_equal_and_partition_invariant():
    rng = np.random.RandomState(31)
    n = 140
    pairs = set()
    while len(pairs) < 320:
        a, b = rng.randint(1, n + 1, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pairs = sorted(pairs)
    nodes = list(range(1, n + 1)) + [7000]
    e3, n3 = _graph(pairs, nodes, blocks=3)
    e7, n7 = _graph(pairs, nodes, blocks=7)
    a = _run(e3, n3, strategy="broadcast")
    b = _run(e7, n7, strategy="shuffle", num_buckets=4)
    pd.testing.assert_frame_equal(a, b)
    assert (a["in_core"] == 1).any() and (a["in_core"] == 0).any()


def test_vs_quadratic_reference():
    rng = np.random.RandomState(37)
    n = 100
    pairs = set()
    while len(pairs) < 240:
        a, b = rng.randint(1, n + 1, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pairs = sorted(pairs)
    nodes = list(range(1, n + 1))
    want = _reference_peel(pairs, nodes, k=3, rounds=4)
    edges, ndset = _graph(pairs, nodes, blocks=4)
    out = _run(edges, ndset).set_index("node")
    for node in nodes:
        inc, cd = want[node]
        assert out.loc[node, "in_core"] == inc, node
        assert out.loc[node, "core_deg"] == cd, node
