"""Bloom filter spec tests (oracle parity covers the join chain)."""

import numpy as np
import pyarrow as pa
import ray.data

from robosat_ray.stages.bloom import _member_mask, bloom_positions, build_bloom


def _build_local(keys: np.ndarray) -> np.ndarray:
    from robosat_ray.stages.bloom import BLOOM_M

    words = np.zeros(BLOOM_M // 64, dtype=np.uint64)
    p = bloom_positions(keys).ravel()
    np.bitwise_or.at(words, p // 64, np.uint64(1) << (p % 64).astype(np.uint64))
    return words


def test_no_false_negatives():
    keys = np.arange(0, 5000, 3, dtype=np.int64)
    words = _build_local(keys)
    assert _member_mask(keys, words).all()


def test_false_positives_are_deterministic_and_bounded():
    keys = np.arange(0, 3000, dtype=np.int64)
    words = _build_local(keys)
    probe = np.arange(100_000, 140_000, dtype=np.int64)  # disjoint
    fp1 = _member_mask(probe, words)
    fp2 = _member_mask(probe, words)
    assert (fp1 == fp2).all()
    rate = fp1.mean()
    # m=32768, n=3000, h=2 -> expected ~ (1 - e^-2n/m)^2 ~ 2.8%
    assert 0.005 < rate < 0.08


def test_distributed_build_equals_local(ray_session):
    keys = np.arange(17, 4000, 7, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"o_orderkey": pa.array(keys)})
    ).repartition(9)
    assert (build_bloom(ds, "o_orderkey") == _build_local(keys)).all()
