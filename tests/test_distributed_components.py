"""Distributed connected components vs the driver union-find — the
10^12-scale replacement for merge's driver-side step."""

import numpy as np
import pytest


def _run(nodes, edges_a, edges_b):
    import ray.data

    from robosat_ray.runtime.components import distributed_components

    nodes_ds = ray.data.from_arrow(
        __import__("pyarrow").table({"node": list(map(int, nodes))})
    )
    edges_ds = ray.data.from_arrow(
        __import__("pyarrow").table(
            {"a": list(map(int, edges_a)), "b": list(map(int, edges_b))}
        )
    )
    out = distributed_components(nodes_ds, edges_ds).to_pandas()
    return dict(zip(out["node"], out["label"]))


def test_chain_and_isolated(ray_session):
    # path graph 0-1-2-...-19 (diameter 19: exercises pointer jumping)
    nodes = np.arange(25)
    ea = np.arange(0, 19)
    eb = np.arange(1, 20)
    got = _run(nodes, ea, eb)
    for n in range(20):
        assert got[n] == 0, (n, got[n])
    for n in range(20, 25):
        assert got[n] == n


def test_random_graph_matches_union_find(ray_session):
    from robosat_ray.geo.graph import min_label_propagation

    rng = np.random.default_rng(17)
    n = 150
    ea = rng.integers(0, n, 200)
    eb = rng.integers(0, n, 200)
    got = _run(np.arange(n), ea, eb)
    want = min_label_propagation(np.arange(n), ea.astype(np.int64), eb.astype(np.int64))
    assert got == want


def test_matches_driver_union_find_on_footprints(ray_session):
    import ray.data

    from robosat_ray.geo.graph import min_label_propagation
    from robosat_ray.stages.merge import EdgeFinder
    from robosat_ray.runtime.components import distributed_components
    from robosat_ray.synth.footprints import footprints_dataset, footprints_table
    from robosat_ray import constants as C

    sf = "/root/testdata/sf0.001"
    feet_t = footprints_table(sf)
    ref = ray.put(feet_t)
    edges = footprints_dataset(sf).map_batches(
        EdgeFinder,
        fn_constructor_args=(ref, C.Z_JOIN, C.MERGE_EPS_X, C.MERGE_EPS_Y),
        batch_format="pyarrow",
        concurrency=(1, 4),
        num_cpus=1,
    ).materialize()
    import pyarrow as pa

    nodes_ds = ray.data.from_arrow(
        pa.table({"node": feet_t.column("feature_id")})
    )
    got = distributed_components(nodes_ds, edges).to_pandas()
    got_map = dict(zip(got["node"], got["label"]))

    et = edges.to_pandas()
    ids = feet_t.column("feature_id").to_numpy()
    want = min_label_propagation(
        ids, et["a"].to_numpy(np.int64), et["b"].to_numpy(np.int64)
    )
    assert len(got_map) == len(want)
    for n, l in want.items():
        assert got_map[n] == l, (n, got_map[n], l)


def test_merge_components_distributed_path_equal(ray_session, monkeypatch):
    """Forcing DRIVER_CC_EDGE_CAP=0 routes merge through
    distributed_components + the co-partition attach; labels and
    merge_unions invariants must match the broadcast union-find path."""
    import robosat_ray.stages.merge as mg
    from robosat_ray.synth.footprints import footprints_dataset, footprints_table

    sf = "/root/testdata/sf0.001"
    feet_t = footprints_table(sf)
    base = mg.merge_components(footprints_dataset(sf), feet_t).to_pandas()
    base_u = mg.merge_unions(footprints_dataset(sf), feet_t).to_pandas()
    monkeypatch.setattr(mg, "DRIVER_CC_EDGE_CAP", 0)
    dist = mg.merge_components(footprints_dataset(sf), feet_t).to_pandas()
    dist_u = mg.merge_unions(footprints_dataset(sf), feet_t).to_pandas()
    key = lambda df: df.sort_values(list(df.columns)).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(
        key(base[sorted(base.columns)]), key(dist[sorted(dist.columns)])
    )
    pd.testing.assert_frame_equal(
        key(base_u[sorted(base_u.columns)]), key(dist_u[sorted(dist_u.columns)])
    )


def test_pagerank_strategies_bit_equal_and_exact(ray_session):
    """Broadcast and shuffle supersteps produce identical integer
    ranks; a hand-walked 3-node path graph pins the exact arithmetic
    (r//deg contributions, 0.85/0.15 integer damping)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from robosat_ray.stages.pagerank import pagerank_micro

    # path graph a-b-c as doubled directed edges
    src = np.array([0, 1, 1, 2], np.int64)
    dst = np.array([1, 0, 2, 1], np.int64)
    edges = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    got = (
        pagerank_micro(edges, iters=2, strategy="broadcast")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # hand walk: deg = [1, 2, 1]; r0 = 1e6
    r = {0: 10**6, 1: 10**6, 2: 10**6}
    deg = {0: 1, 1: 2, 2: 1}
    for _ in range(2):
        c = {n: r[n] // deg[n] for n in r}
        s = {0: c[1], 1: c[0] + c[2], 2: c[1]}
        r = {n: 150_000 + (85 * s[n]) // 100 for n in r}
    want = pd.DataFrame(
        {"node": [0, 1, 2], "rank_micro": [r[0], r[1], r[2]]}
    ).astype({"node": "int64", "rank_micro": "int64"})
    pd.testing.assert_frame_equal(got, want)

    # random undirected graph: strategy flip is bit-equal
    rng = np.random.RandomState(5)
    s2 = rng.randint(0, 300, 2000)
    d2 = rng.randint(0, 300, 2000)
    edges2 = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.concatenate([s2, d2]).astype("int64")),
                "dst": pa.array(np.concatenate([d2, s2]).astype("int64")),
            }
        )
    )
    a = (
        pagerank_micro(edges2, strategy="broadcast")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    b = (
        pagerank_micro(edges2, strategy="shuffle")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
