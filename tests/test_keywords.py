"""Per-doc keyword extraction (stages/text_ops.doc_keywords)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.stages.text_ops import doc_keywords


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


def test_rare_token_wins(ray_session):
    # "common" is in every doc (idf_milli = 1000); "rareword" only in
    # doc 0 (idf_milli = 1000 * n) -> rareword wins in doc 0 even at
    # tf 1 vs tf 3
    texts = ["common common common rareword"] + ["common filler"] * 9
    got = doc_keywords(_ds(texts)).to_pandas().sort_values("doc_id")
    assert got.keyword.iloc[0] == "rareword"
    assert int(got.tfidf_milli.iloc[0]) == 10_000  # 1 * (1000*10)//1


def test_tie_breaks_to_smallest_token(ray_session):
    # two tokens with identical tf and idf in one doc -> smaller wins
    texts = ["zz aa", "zz aa"]
    got = doc_keywords(_ds(texts)).to_pandas()
    assert set(got.keyword) == {"aa"}


def test_partition_invariance(ray_session):
    texts = [f"w{i % 13} common w{(i * 7) % 13} w{i % 13}" for i in range(80)]
    a = doc_keywords(_ds(texts)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        doc_keywords(_ds(texts, blocks=11))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
