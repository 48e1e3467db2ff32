"""Exact-substring removal (Lee et al. rewrite): planted duplicates,
broadcast vs co-partition strategy equality, partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.spans import (
    SPAN_SAMPLE_MOD,
    SPAN_W,
    _span_hash_positions,
    remove_dup_spans,
)


def _mk(docs: dict[int, str]):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(docs), pa.int64()),
                "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
            }
        )
    )


def _run(ds, **kw):
    out = remove_dup_spans(ds, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_planted_duplicate_cut_from_later_doc(ray_session):
    # a 48-token shared run guarantees >= 1 sampled anchor w.h.p.;
    # build it from tokens whose spans we can check directly
    shared = " ".join(f"boiler{i}" for i in range(48))
    pre = " ".join(f"a{i}" for i in range(20))
    post = " ".join(f"b{i}" for i in range(20))
    docs = {1: pre + " " + shared, 2: shared + " " + post, 3: pre + " " + post}
    h, _, _ = _span_hash_positions([shared])
    n_anchors = int((h % np.uint64(SPAN_SAMPLE_MOD) == 0).sum())
    assert n_anchors >= 1, "fixture must contain at least one anchor"
    out = _run(_mk(docs))
    by = out.set_index("doc_id")
    # doc 1 holds every canonical first occurrence -> untouched
    assert by.loc[1, "n_removed"] == 0
    assert by.loc[1, "clean_text"] == docs[1]
    # doc 2's copies of the duplicated anchors are cut
    assert by.loc[2, "n_removed"] > 0
    assert len(by.loc[2, "clean_text"]) < len(docs[2])
    # the non-shared suffix survives
    assert by.loc[2, "clean_text"].endswith(post)
    # doc 3 shares no 16-token span with anything -> byte-identical
    assert by.loc[3, "n_removed"] == 0
    assert by.loc[3, "clean_text"] == docs[3]


def test_within_doc_repeat_keeps_first(ray_session):
    rep = " ".join(f"lic{i}" for i in range(40))
    mid = " ".join(f"m{i}" for i in range(10))
    docs = {7: rep + " " + mid + " " + rep}
    out = _run(_mk(docs))
    row = out.iloc[0]
    assert row["n_removed"] > 0
    # the first occurrence's tokens survive: text still starts with rep
    assert row["clean_text"].startswith(rep)


def test_strategy_flip_bit_equal(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    shared = " ".join(f"tmpl{i}" for i in range(32))
    docs = {}
    for i in range(60):
        body = " ".join(rng.choice(vocab, size=30))
        docs[i] = body + (" " + shared if i % 4 == 0 else "")
    a = _run(_mk(docs))  # broadcast path (removals tiny)
    b = _run(_mk(docs), broadcast_cap=0)  # forced co-partition path
    pd.testing.assert_frame_equal(a[["doc_id", "n_removed", "clean_text"]],
                                  b[["doc_id", "n_removed", "clean_text"]])
    assert (a["n_removed"] > 0).any()


def test_partition_invariance(ray_session):
    shared = " ".join(f"c{i}" for i in range(40))
    docs = {i: f"head{i} " + shared for i in range(24)}
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
        }
    )
    a = _run(ray.data.from_arrow(tbl))
    b = _run(ray.data.from_arrow(tbl).repartition(13))
    pd.testing.assert_frame_equal(a, b)
    # exactly one canonical copy of each duplicated anchor span survives
    assert (a["n_removed"] == 0).sum() >= 1
    assert (a["n_removed"] > 0).sum() >= 20


def test_short_docs_pass_through(ray_session):
    docs = {1: "only three tokens", 2: "only three tokens"}
    # < SPAN_W tokens: no spans, no removals, byte-identical output
    out = _run(_mk(docs))
    assert (out["n_removed"] == 0).all()
    assert list(out["clean_text"]) == [docs[1], docs[2]]
