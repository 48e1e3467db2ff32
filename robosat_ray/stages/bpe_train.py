"""BPE merge training — the tokenizer-fit primitive (Sennrich 2016
byte-pair encoding): K greedy rounds, each counting adjacent symbol
pairs over the whole corpus and merging the most frequent pair into a
fresh single-byte symbol (chr(round)).

Spec (mirrored bit-for-bit in oracle.BPE_MERGES):
- corpus is printable ASCII (asserted), so byte pairs == char pairs
  and numeric pair-code order == lexicographic string order;
- round r counts OVERLAPPING adjacent pairs of the text with rounds
  1..r-1's merges applied (str.replace / SQL replace are both greedy
  left-to-right non-overlapping — verified identical);
- winner = max count, lexicographically smallest pair on ties.

Scale shape: each round is ONE zero-shuffle streaming pass — a dense
65536-bin bincount per batch (a fixed-size partial regardless of
batch rows), a 65536-row groupby, a driver argmax. Replaced texts are
never materialized: each pass re-applies the (<= K)-entry merge table
inside the batch. K passes total.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

BPE_ROUNDS = 3


def _pair_counts(texts: list[str], merges: list[str]) -> np.ndarray:
    """Dense 65536-bin counts of adjacent byte pairs after applying
    `merges` (merge i -> chr(i+1)). Pairs spanning document boundaries
    are excluded via a \\x00 separator."""
    for i, m in enumerate(merges):
        texts = [t.replace(m, chr(i + 1)) for t in texts]
    s = "\x00".join(texts)
    arr = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
    assert arr.max(initial=0) < 128, "corpus must be ASCII for byte==char BPE"
    if len(arr) < 2:
        return np.zeros(65536, dtype=np.int64)
    codes = arr[:-1].astype(np.int64) * 256 + arr[1:]
    m = (arr[:-1] != 0) & (arr[1:] != 0)
    return np.bincount(codes[m], minlength=65536).astype(np.int64)


def bpe_merges(docs_ds, rounds: int = BPE_ROUNDS) -> pd.DataFrame:
    """documents -> (round, pair, cnt) greedy BPE merge table."""
    from ray.data.aggregate import Sum

    merges: list[str] = []
    out = []
    for r in range(1, rounds + 1):
        ms = list(merges)

        def partial(b: pa.Table, _ms=ms) -> pa.Table:
            c = _pair_counts(b.column("text").to_pylist(), _ms)
            nz = np.flatnonzero(c)
            return pa.table({"code": pa.array(nz), "c": pa.array(c[nz])})

        counts = (
            docs_ds.select_columns(["text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("code")
            .aggregate(Sum("c", alias_name="n"))
            .to_pandas()  # <= 65536 rows
        )
        if len(counts) == 0:
            break
        best = counts.sort_values(
            ["n", "code"], ascending=[False, True]
        ).iloc[0]
        code, cnt = int(best["code"]), int(best["n"])
        pair = chr(code // 256) + chr(code % 256)
        merges.append(pair)
        out.append((r, pair, cnt))
    return pd.DataFrame(out, columns=["round", "pair", "cnt"]).astype(
        {"round": np.int64, "cnt": np.int64}
    )
