"""Greedy coverage-maximizing corpus selection (facility-location /
set-cover greedy) — the "pick the K most informative documents" data
curation step (submodular-greedy selection, the facility-location
workhorse of coverage-based training-data sampling).

Algorithm (mirrored level-for-level in oracle.SET_COVER): K rounds;
each round scores every document by the number of its DISTINCT tokens
not yet covered by previous winners, and selects max gain with min
doc_id as the tie-break; documents with zero remaining gain drop out.

Scale shape: the per-doc token sets are materialized ONCE as a list
column (streaming, per-doc rows — never flattened into a token fact
table); each round is ONE zero-shuffle streaming pass computing
per-batch local argmax partials (a scalar per block) reduced on the
driver, plus a tiny indexed fetch of the winner's tokens. The covered
set is bounded by K x tokens-per-doc and broadcast via ray.put.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SET_COVER_ROUNDS = 4
TOKEN_RE = r"[A-Za-z0-9]+"


def doc_token_sets(docs_ds):
    """documents -> (doc_id, toks: list<string> DISTINCT per doc)."""
    import re

    rx = re.compile(TOKEN_RE)

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        toks = [sorted(set(rx.findall(t))) for t in texts]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "toks": pa.array(toks, type=pa.list_(pa.string())),
            }
        )

    return docs_ds.map_batches(per_batch, batch_format="pyarrow")


def set_cover(docs_ds, rounds: int = SET_COVER_ROUNDS) -> pd.DataFrame:
    """-> (round, doc_id, gain) for each greedy winner."""
    import ray

    tok = doc_token_sets(docs_ds).materialize()
    covered: set[str] = set()
    out_rounds: list[int] = []
    out_docs: list[int] = []
    out_gains: list[int] = []

    for r in range(1, rounds + 1):
        cov_ref = ray.put(pa.array(sorted(covered), type=pa.string()))

        def local_best(batch: pa.Table, _ref=cov_ref) -> pa.Table:
            cov = ray.get(_ref)
            ids = batch.column("doc_id").to_numpy()
            col = batch.column("toks")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.values
            new = pc.invert(pc.is_in(flat, value_set=cov)).to_numpy(
                zero_copy_only=False
            )
            offs = col.offsets.to_numpy()
            gains = np.add.reduceat(
                np.r_[new.astype(np.int64), 0], offs[:-1]
            ) * (np.diff(offs) > 0)
            m = gains > 0
            if not m.any():
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "gain": pa.array([], pa.int64()),
                    }
                )
            # local argmax: max gain, min doc_id
            best = np.flatnonzero(m & (gains == gains[m].max()))
            w = best[np.argmin(ids[best])]
            return pa.table(
                {
                    "doc_id": pa.array([int(ids[w])], pa.int64()),
                    "gain": pa.array([int(gains[w])], pa.int64()),
                }
            )

        cands = tok.map_batches(local_best, batch_format="pyarrow").to_pandas()
        if len(cands) == 0:
            break
        cands = cands.sort_values(
            ["gain", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        win_doc = int(cands["doc_id"].iloc[0])
        win_gain = int(cands["gain"].iloc[0])
        out_rounds.append(r)
        out_docs.append(win_doc)
        out_gains.append(win_gain)
        wtoks = (
            tok.filter(expr=f"doc_id == {win_doc}")
            .take(1)[0]["toks"]
        )
        covered.update(wtoks)

    return pd.DataFrame(
        {
            "round": np.array(out_rounds, dtype=np.int64),
            "doc_id": np.array(out_docs, dtype=np.int64),
            "gain": np.array(out_gains, dtype=np.int64),
        }
    )
