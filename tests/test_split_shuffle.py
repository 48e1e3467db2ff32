"""O5: train/val split determinism + seeded random_shuffle
reproducibility (reference train.py:273-274 DataLoader(shuffle=True))."""

import numpy as np

from robosat_ray.stages.split import shuffled_epoch, train_val_split

SF = "/root/testdata/sf0.001"


def _docs():
    import ray.data

    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])


def test_split_disjoint_exhaustive_deterministic(ray_session):
    train, val = train_val_split(_docs(), val_frac=0.2)
    t1 = sorted(r["doc_id"] for r in train.take_all())
    v1 = sorted(r["doc_id"] for r in val.take_all())
    assert set(t1).isdisjoint(v1)
    everything = sorted(r["doc_id"] for r in _docs().take_all())
    assert sorted(t1 + v1) == everything
    assert 0.05 < len(v1) / len(everything) < 0.4  # roughly val_frac
    # deterministic across a second run
    train2, val2 = train_val_split(_docs(), val_frac=0.2)
    assert sorted(r["doc_id"] for r in train2.take_all()) == t1
    assert sorted(r["doc_id"] for r in val2.take_all()) == v1


def test_seeded_shuffle_reproducible(ray_session):
    train, _ = train_val_split(_docs(), val_frac=0.2)
    a = [r["doc_id"] for r in shuffled_epoch(train, seed=7).take_all()]
    b = [r["doc_id"] for r in shuffled_epoch(train, seed=7).take_all()]
    c = [r["doc_id"] for r in shuffled_epoch(train, seed=8).take_all()]
    assert a == b, "same seed must reproduce the same order"
    assert sorted(a) == sorted(c), "different seed keeps membership"
    assert a != c, "different seed gives a different order"
    assert a != sorted(a), "shuffle actually permutes"
