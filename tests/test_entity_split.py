"""Entity clusters (stages/neardup.entity_clusters) + leakage-safe
split (stages/split.leakage_safe_split)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _docs(rows, blocks=None):
    import ray.data

    ids, langs, texts = zip(*rows)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, np.int64)),
                "lang": pa.array(langs, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    return ds.repartition(blocks) if blocks else ds


def test_entity_clusters_transitive(ray_session):
    from robosat_ray.stages.neardup import entity_clusters

    # a-b within distance 8, b-c within 8, a-c NOT (distance 12):
    # transitivity still puts all three in one entity
    base = "entity00" + "m" * 40
    b1 = "entity00" + "m" * 34 + "y" * 6
    c1 = "entity00" + "m" * 28 + "y" * 12
    rows = [(1, "en", base), (2, "en", b1), (3, "en", c1), (9, "en", "other000" + "q" * 40)]
    out = (
        entity_clusters(_docs(rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.cluster_id.tolist() == [1, 1, 1, 9]
    assert out.cluster_size.tolist() == [3, 3, 3, 1]
    assert out.keep.tolist() == [1, 0, 0, 1]


def test_entity_clusters_partition_invariance(ray_session):
    from robosat_ray.stages.neardup import entity_clusters

    rng = np.random.default_rng(17)
    bases = ["".join(rng.choice(list("abcdef"), size=40)) for _ in range(4)]
    rows = []
    for i in range(80):
        body = list(bases[i % 4])
        for p in rng.choice(40, size=int(rng.integers(0, 10)), replace=False):
            body[p] = "z"
        rows.append((i, "en", f"blk{i % 4:05d}" + "".join(body)))
    a = entity_clusters(_docs(rows)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = entity_clusters(_docs(rows, blocks=7)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_safe_split_keeps_clusters_together(ray_session):
    import ray.data

    from robosat_ray.stages.split import leakage_safe_split

    # near-identical docs (one token changed out of 40) form clusters;
    # every member of a cluster must land on the same side
    rows = []
    for g in range(30):
        base = [f"tok{g}_{j}" for j in range(40)]
        for v in range(3):
            t = list(base)
            if v:
                t[-v] = f"var{v}"
            rows.append((g * 10 + v, " ".join(t)))
    ids, texts = zip(*rows)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = leakage_safe_split(ds).to_pandas()
    per_cluster = out.groupby("cluster_id")["split"].nunique()
    assert (per_cluster == 1).all()
    # both sides populated across 30 clusters with a 10% val hash
    assert set(out.split) == {"train", "val"}
    # determinism
    out2 = leakage_safe_split(ds.repartition(5)).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )
