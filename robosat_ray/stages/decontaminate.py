"""Benchmark decontamination — the train/eval overlap check every LLM
pretraining pipeline runs before training (GPT-3 appendix C, PaLM,
Llama: remove training documents sharing any 13-gram with an eval
benchmark). A train doc is CONTAMINATED if at least one of its
stride-1 13-token windows also occurs in the benchmark set.

Spec (mirrored bit-for-bit in oracle.DECONTAMINATE):

- window hash: the spans.py polynomial fold (md5_64 token hashes,
  acc = acc*B + th mod 2^64, B < 2^41 so the SQL twin's HUGEINT
  intermediates never overflow), with DECON_W = 13.
- benchmark fixture: docs with doc_id % DECON_BENCH_MOD == 0 AND
  doc_id < DECON_BENCH_MAX_ID stand in for the external eval suite.
  The id cap is the scale contract: a real benchmark (MMLU, GSM8K,
  HELM, ...) is a FIXED few-MB artifact that does not grow with the
  corpus, and the cap makes the fixture behave the same way — the
  broadcast n-gram set is bounded BY CONSTRUCTION (< ~9k docs
  regardless of corpus size), never corpus-proportional.
- output: one row per TRAIN doc (not in the benchmark predicate):
  (doc_id, n_grams, n_hits, contaminated) — window count, matching
  window occurrences, 0/1 flag. Short docs (< 13 tokens) appear with
  n_grams = 0.

Scale shape: pass 1 streams the (bounded) benchmark docs into
per-batch unique hash sets, np.unique on the driver, ONE sorted-array
broadcast (ray.put). Pass 2 is a pure map over the train corpus —
hash windows, one searchsorted membership test, bincount hits per
doc. No shuffle at all; the corpus-sized side never aggregates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DECON_W = 13
DECON_BENCH_MOD = 23
DECON_BENCH_MAX_ID = 200_000


def _bench_hash_partial(batch: pa.Table) -> pa.Table:
    from robosat_ray.stages.spans import _span_hashes

    texts = batch.column("text").to_pylist()
    h, _ = _span_hashes(texts, w=DECON_W)
    return pa.table({"h": pa.array(np.unique(h))})


def build_benchmark_grams(bench_ds) -> np.ndarray:
    """Benchmark docs -> sorted unique uint64 window hashes (driver
    side; bounded by the fixed benchmark size, not the corpus)."""
    parts = bench_ds.map_batches(
        _bench_hash_partial, batch_format="pyarrow"
    ).take_all()
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.array([r["h"] for r in parts], dtype=np.uint64))


def decontaminate(documents_ds):
    """-> (doc_id, n_grams, n_hits, contaminated) per train doc."""
    import ray

    from robosat_ray.stages.spans import _span_hashes

    docs = documents_ds.select_columns(["doc_id", "text"])

    def is_bench(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        m = (ids % DECON_BENCH_MOD == 0) & (ids < DECON_BENCH_MAX_ID)
        return batch.append_column("_bench", pa.array(m))

    tagged = docs.map_batches(is_bench, batch_format="pyarrow")
    bench = tagged.filter(expr="_bench == True")
    grams = build_benchmark_grams(bench)
    ref = ray.put(grams)

    def probe(batch: pa.Table, _ref=ref) -> pa.Table:
        g = ray.get(_ref)
        keep = ~batch.column("_bench").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy()[keep]
        texts = [
            t
            for t, k in zip(batch.column("text").to_pylist(), keep)
            if k
        ]
        h, doc_of = _span_hashes(texts, w=DECON_W)
        n_docs = len(texts)
        n_grams = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
        if len(g):
            pos = np.searchsorted(g, h)
            hit = (pos < len(g)) & (g[np.minimum(pos, len(g) - 1)] == h)
        else:
            hit = np.zeros(len(h), dtype=bool)
        n_hits = np.zeros(n_docs, dtype=np.int64)
        np.add.at(n_hits, doc_of[hit], 1)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_grams": pa.array(n_grams),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array((n_hits > 0).astype(np.int64)),
            }
        )

    return tagged.map_batches(probe, batch_format="pyarrow")
