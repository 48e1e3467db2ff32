"""Training-sequence packing — the concat-and-chunk step of LLM
pretraining: documents are concatenated in a deterministic global
order (doc_id ascending) and the token stream is sliced into
fixed-length training sequences of SEQ_LEN tokens. Each doc's
placement is a pure function of the GLOBAL prefix sum of token counts
before it, which makes this the engine's distributed ordered
prefix-scan primitive.

Spec (mirrored bit-for-bit in oracle.PACK):
- n_tokens = len(string_split(text, ' ')) (count of ' ' + 1 — exact
  DuckDB twin, no regex divergence surface)
- tok_offset = sum of n_tokens over all docs with smaller doc_id
- first_seq = tok_offset // SEQ_LEN
- last_seq  = (tok_offset + n_tokens - 1) // SEQ_LEN  (n_tokens >= 1
  always: string_split of any string has at least one element)
- n_seqs    = last_seq - first_seq + 1

Scale shape (two-pass scan, the classic Blelloch decomposition):
- one cheap min/max aggregate fixes N_PACK_BUCKETS contiguous doc_id
  ranges (range partition ON THE SCAN KEY — a hash bucket would break
  prefix order);
- pass A streams per-bucket partial token sums (in-batch bincount,
  <= buckets x blocks tiny rows to the driver), exclusive-cumsum ->
  one bucket-offset broadcast;
- pass B co-partitions by bucket and runs the local cumsum + offset.
No global sort, no corpus materialization; the only shuffle is the
bucket co-partition. Dense doc_ids give balanced ranges; a skewed id
space would want quantile boundaries instead (same two-pass shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SEQ_LEN = 2048
N_PACK_BUCKETS = 64


def _token_counts(batch: pa.Table) -> np.ndarray:
    """count(' ') + 1 == DuckDB len(string_split(text, ' '))."""
    return (
        pc.count_substring(batch.column("text"), " ").to_numpy() + 1
    ).astype(np.int64)


def _bucket_of(ids: np.ndarray, lo: int, hi: int) -> np.ndarray:
    span = hi - lo + 1
    return ((ids - lo) * N_PACK_BUCKETS // span).astype(np.int64)


def pack_sequences(documents_ds, seq_len: int = SEQ_LEN):
    """-> (doc_id, n_tokens, tok_offset, first_seq, last_seq, n_seqs)."""
    import ray

    docs = documents_ds.select_columns(["doc_id", "text"])
    lo = int(docs.min("doc_id"))
    hi = int(docs.max("doc_id"))

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(_token_counts(batch)),
                "pbucket": pa.array(_bucket_of(ids, lo, hi)),
            }
        )

    counted = docs.map_batches(stats, batch_format="pyarrow")

    # pass A: per-bucket partial sums -> exclusive cumsum -> broadcast
    def partial(batch: pa.Table) -> pa.Table:
        sums = np.zeros(N_PACK_BUCKETS, dtype=np.int64)
        np.add.at(
            sums,
            batch.column("pbucket").to_numpy(),
            batch.column("n_tokens").to_numpy(),
        )
        return pa.table({"s": pa.array([sums], pa.list_(pa.int64()))})

    totals = np.zeros(N_PACK_BUCKETS, dtype=np.int64)
    for row in counted.map_batches(partial, batch_format="pyarrow").take_all():
        totals += np.asarray(row["s"], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])
    ref = ray.put(offsets)

    # pass B: local ordered cumsum per bucket + the bucket's offset
    def scan(group: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        offs = ray.get(_ref)
        g = group.sort_values("doc_id", kind="stable").reset_index(drop=True)
        n = g["n_tokens"].to_numpy(np.int64)
        off = np.cumsum(n) - n + offs[int(g["pbucket"].iloc[0])]
        first = off // seq_len
        last = (off + n - 1) // seq_len
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "n_tokens": n,
                "tok_offset": off,
                "first_seq": first,
                "last_seq": last,
                "n_seqs": last - first + 1,
            }
        )

    return counted.groupby("pbucket").map_groups(scan, batch_format="pandas")
