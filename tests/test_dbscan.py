"""Grid-DBSCAN: planted geometry (known core/border/noise roles),
driver vs distributed strategy bit-equality, partition invariance,
pair-mining exactness vs a quadratic reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray import constants as C
from robosat_ray.stages.dbscan import dbscan, eps_pairs

N = float(1 << C.DB_Q)


def _pts(ids, xq, yq, blocks=1):
    """Build a points dataset whose quantized coords are EXACTLY the
    given integers (invert the floor chain through the open interval
    midpoint)."""
    xq = np.asarray(xq, np.float64)
    yq = np.asarray(yq, np.float64)
    lon = (xq + 0.5) / N * 360.0 - 180.0
    my = (yq + 0.5) / N
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, np.int64)),
                "lon": pa.array(lon),
                "my": pa.array(my),
            }
        )
    )
    return ds.repartition(blocks) if blocks > 1 else ds


def _run(ds, **kw):
    out = dbscan(ds, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _quad_pairs(ids, xq, yq):
    ids = np.asarray(ids, np.int64)
    xq = np.asarray(xq, np.int64)
    yq = np.asarray(yq, np.int64)
    dx = xq[:, None] - xq[None, :]
    dy = yq[:, None] - yq[None, :]
    ok = (dx * dx + dy * dy <= C.DB_R * C.DB_R) & (ids[:, None] < ids[None, :])
    ai, bj = np.nonzero(ok)
    return set(zip(ids[ai].tolist(), ids[bj].tolist()))


def test_planted_roles():
    # cluster A: 4 mutually-eps points (all core at minPts=4, label=1)
    # border: point 5 within eps of core 1 only (count 2 < 4)
    # noise: point 9 far away
    # point 5 at (1170,1000): d(2)=120 <= R, d(4)=130 > R, d(1)=170 > R
    # -> exactly one core neighbor + self = 2 < minPts -> border
    ids = [1, 2, 3, 4, 5, 9]
    xq = [1000, 1050, 1000, 1050, 1170, 900000]
    yq = [1000, 1000, 1050, 1050, 1000, 500000]
    out = _run(_pts(ids, xq, yq))
    by = out.set_index("doc_id")
    assert list(by.loc[[1, 2, 3, 4], "role"]) == ["core"] * 4
    assert list(by.loc[[1, 2, 3, 4], "label"]) == [1, 1, 1, 1]
    assert by.loc[5, "role"] == "border" and by.loc[5, "label"] == 1
    assert by.loc[9, "role"] == "noise" and by.loc[9, "label"] == -1


def test_two_clusters_and_min_border_label():
    # two 4-cliques far apart; a border point eps-adjacent to one core
    # of EACH cluster takes the MIN cluster label (the deterministic
    # tie rule)
    ids = [10, 11, 12, 13, 20, 21, 22, 23, 30]
    xq = [1000, 1050, 1000, 1050, 2000, 2050, 2000, 2050, 1500]
    yq = [1000, 1000, 1050, 1050, 1000, 1000, 1050, 1050, 1000]
    # move the cliques so point 30 is within eps of 11 and 20:
    xq = [1300, 1372, 1300, 1372, 1628, 1700, 1628, 1700, 1500]
    out = _run(_pts(ids, xq, yq))
    by = out.set_index("doc_id")
    assert set(by.loc[[10, 11, 12, 13], "label"]) == {10}
    assert set(by.loc[[20, 21, 22, 23], "label"]) == {20}
    assert by.loc[30, "role"] == "border" and by.loc[30, "label"] == 10


def test_pair_mining_exact_vs_quadratic():
    rng = np.random.RandomState(7)
    n = 400
    ids = np.arange(1, n + 1)
    xq = rng.randint(0, 2000, n)
    yq = rng.randint(0, 2000, n)
    got = eps_pairs(_pts(ids, xq, yq, blocks=5)).to_pandas()
    got_set = set(zip(got["a"].tolist(), got["b"].tolist()))
    assert len(got) == len(got_set), "pair emitted more than once"
    assert got_set == _quad_pairs(ids, xq, yq)


def test_strategy_flip_bit_equal_and_partition_invariant():
    rng = np.random.RandomState(11)
    n = 600
    ids = np.arange(1, n + 1)
    # three dense blobs + sparse background: all roles exercised
    xq = np.concatenate(
        [
            rng.randint(1000, 1400, 150),
            rng.randint(5000, 5400, 150),
            rng.randint(9000, 9400, 150),
            rng.randint(0, 300000, 150),
        ]
    )
    yq = np.concatenate(
        [
            rng.randint(1000, 1400, 150),
            rng.randint(1000, 1400, 150),
            rng.randint(1000, 1400, 150),
            rng.randint(0, 300000, 150),
        ]
    )
    # planted 4-clique + a satellite at distance 120 from one member:
    # guaranteed border (dense random blobs produce only cores)
    ids = np.concatenate([ids, [701, 702, 703, 704, 705]])
    xq = np.concatenate([xq, [50000, 50050, 50000, 50050, 50170]])
    yq = np.concatenate([yq, [50000, 50000, 50050, 50050, 50000]])
    a = _run(_pts(ids, xq, yq, blocks=3), strategy="driver")
    b = _run(_pts(ids, xq, yq, blocks=7), strategy="distributed")
    pd.testing.assert_frame_equal(a, b)
    roles = set(a["role"])
    assert roles == {"core", "border", "noise"}, roles
