"""Exact set-similarity self-join via PREFIX FILTERING (PPJoin-lite,
Xiao et al. 2011 "Efficient Similarity Joins for Near-Duplicate
Detection") — the EXACT counterpart of the probabilistic near-dup
family: MinHash-LSH (neardup.py) trades recall for speed, the capped
n-gram index (ngram_jaccard) trades completeness for bounded posting
lists; prefix filtering is COMPLETE BY CONSTRUCTION, so the engine
can use an aggressive candidate filter while the oracle stays plain
brute force with no cap to mirror.

The prefix principle: order every document's unique-token set by one
global total order (here ascending document frequency, ties by token
hash — rare tokens first, the PPJoin heuristic that keeps stopwords
out of the index) and index only each doc's first
l = n - ceil(tau * n) + 1 tokens. Any pair with Jaccard >= tau must
share at least one indexed prefix token (pigeonhole: missing all of
A's prefix leaves at most ceil(tau*n)-1 < tau*n <= |A^B| shared), so
mining only prefix-posting collisions loses nothing.

Spec (tau = PP_TAU_NUM/PP_TAU_DEN = 9/10, all-integer; mirrored by
the brute-force oracle.PPJOIN):
- corpus = the caller's documents + the house near-dup variants
  (neardup.with_variants_batch); the registered query scopes to the
  deterministic doc_id % 10 == 0 subset because the synthetic corpus
  contains ~1.2M genuinely near-identical pairs at sf0.1 — the EXACT
  result itself is that large, not an engine artifact
- token set = DISTINCT md5-hashed space-split tokens
- keep pair (a < b) iff 19*|A^B| >= 9*(|A| + |B|)   [<=> J >= 9/10]
- output (a, b, inter_sz, union_sz)

Scale shape: zero broadcasts on the mining path — df is a
token-bounded groupby, the df attach and the per-doc prefix regroup
are co-partition shuffles, prefix postings carry ~(1-tau) of token
volume, and the candidate length filter (5*min >= 3*max) prunes
before pairing. Verify reuses the near-dup carrier/need co-partition
join (neardup._attach_hashes) — the 10^12-doc path with a driver
broadcast fast path below BROADCAST_PAIR_CAP, exactly like
near_dup_pairs_ds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.functions.hashing import hash_bucket, hash_bucket2
from robosat_ray.stages.join import NUM_JOIN_BUCKETS

PP_TAU_NUM, PP_TAU_DEN = 9, 10
PP_BROADCAST_PAIR_CAP = 500_000


def _token_set_rows(batch: pa.Table, ids_ref=None) -> pa.Table:
    """(doc_id, text) -> (doc_id, hashes = sorted unique token md5s);
    with ids_ref, only for docs in the broadcast member array."""
    import ray

    from robosat_ray.functions.text_hash import _batch_token_hashes

    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    if ids_ref is not None:
        want = ray.get(ids_ref[0]) if not isinstance(ids_ref[0], np.ndarray) else ids_ref[0]
        pos = np.searchsorted(want, ids)
        member = (pos < len(want)) & (want[np.clip(pos, 0, len(want) - 1)] == ids)
        keep = np.nonzero(member)[0]
    else:
        keep = np.arange(len(ids))
    th, doc_off = _batch_token_hashes([texts[i] for i in keep])
    n_docs = len(doc_off) - 1
    doc_of = np.repeat(np.arange(n_docs), np.diff(doc_off))
    order = np.lexsort((th, doc_of))
    d, h = doc_of[order], th[order]
    uniq = np.ones(len(h), dtype=bool)
    uniq[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    d, h = d[uniq], h[uniq]
    off = np.concatenate([[0], np.cumsum(np.bincount(d, minlength=n_docs))])
    return pa.table(
        {
            "doc_id": pa.array(ids[keep]),
            "hashes": pa.ListArray.from_arrays(
                pa.array(off, pa.int32()), pa.array(h, pa.uint64())
            ),
        }
    )


def _postings(batch: pa.Table) -> pa.Table:
    """token-set rows -> (th int64, doc_id, n) posting rows."""
    ids = batch.column("doc_id").to_numpy()
    hashes = batch.column("hashes")
    arr = hashes.combine_chunks() if isinstance(hashes, pa.ChunkedArray) else hashes
    flat = arr.flatten().to_numpy().astype(np.int64, copy=False)  # u64 view
    lens = np.diff(arr.offsets.to_numpy())
    return pa.table(
        {
            "th": pa.array(flat),
            "doc_id": pa.array(np.repeat(ids, lens)),
            "n": pa.array(np.repeat(lens.astype(np.int64), lens)),
        }
    )


def _prefix_rows(group: pd.DataFrame) -> pd.DataFrame:
    """Within one doc_id bucket: per doc, sort tokens by (df, th) and
    keep the first n - ceil(tau*n) + 1 — the PPJoin prefix."""
    doc = group["doc_id"].to_numpy(np.int64)
    th = group["th"].to_numpy(np.int64)
    df = group["df"].to_numpy(np.int64)
    n = group["n"].to_numpy(np.int64)
    order = np.lexsort((th, df, doc))
    doc, th, n = doc[order], th[order], n[order]
    starts = np.ones(len(doc), dtype=bool)
    starts[1:] = doc[1:] != doc[:-1]
    rank = np.arange(len(doc)) - np.repeat(
        np.flatnonzero(starts), np.diff(np.append(np.flatnonzero(starts), len(doc)))
    )
    ceil_tau_n = (PP_TAU_NUM * n + PP_TAU_DEN - 1) // PP_TAU_DEN
    keep = rank < (n - ceil_tau_n + 1)
    return pd.DataFrame(
        {
            "th": th[keep],
            "doc_id": doc[keep],
            "n": n[keep],
            "mbucket": hash_bucket(th[keep], NUM_JOIN_BUCKETS),
        }
    )


def _mine_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Within one token bucket: per equal-th run, all (a < b) doc
    pairs passing the length filter 5*min(nA,nB) >= 3*max(nA,nB)
    (|A^B| <= min and J >= 3/5 force min >= tau*max). Vectorized
    ragged triu, mirroring neardup._shingle_run_pairs."""
    th = group["th"].to_numpy(np.int64)
    doc = group["doc_id"].to_numpy(np.int64)
    n = group["n"].to_numpy(np.int64)
    empty = pd.DataFrame(
        {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
    )
    m = len(th)
    if m == 0:
        return empty
    order = np.lexsort((doc, th))
    th, doc, n = th[order], doc[order], n[order]
    starts = np.concatenate(
        [[0], np.nonzero(np.diff(th))[0] + 1, [m]]
    ).astype(np.int64)
    lens = np.diff(starts)
    npairs = lens * (lens - 1) // 2
    total = int(npairs.sum())
    if total == 0:
        return empty
    run_of = np.repeat(np.arange(len(lens)), npairs)
    k = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(npairs[:-1])]), npairs
    )
    L = lens[run_of]
    # ragged triu indexing: pair k within a run of length L -> (i, j)
    i = (
        L
        - 2
        - np.floor(np.sqrt(-8.0 * k + 4.0 * L * (L - 1) - 7) / 2.0 - 0.5)
    ).astype(np.int64)
    j = (k + i + 1 - L * (L - 1) // 2 + (L - i) * ((L - i) - 1) // 2).astype(
        np.int64
    )
    base = np.repeat(starts[:-1], npairs)
    ia, ib = base + i, base + j
    a, b = doc[ia], doc[ib]
    na, nb = n[ia], n[ib]
    lo, hi = np.minimum(na, nb), np.maximum(na, nb)
    ok = PP_TAU_DEN * lo >= PP_TAU_NUM * hi
    a, b = a[ok], b[ok]
    lo_doc = np.minimum(a, b)
    hi_doc = np.maximum(a, b)
    return pd.DataFrame({"a": lo_doc, "b": hi_doc})


def _pp_verify(group: pd.DataFrame) -> pd.DataFrame:
    """Within one pair bucket: exact intersection of the two UNIQUE
    token sets per pair; keep (NUM+DEN)*inter >= NUM*(nA+nB)
    [<=> J >= tau, integer-exact]. Same vectorized
    lexsort-run counting as neardup._verify_pairs, plus sizes out."""
    a = group["a"].to_numpy()
    b = group["b"].to_numpy()
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    n = len(a)
    empty = pd.DataFrame(
        {
            "a": pd.Series([], dtype=np.int64),
            "b": pd.Series([], dtype=np.int64),
            "inter_sz": pd.Series([], dtype=np.int64),
            "union_sz": pd.Series([], dtype=np.int64),
        }
    )
    if n == 0:
        return empty
    assert n % 2 == 0 and (a[0::2] == a[1::2]).all() and (
        b[0::2] == b[1::2]
    ).all(), "pair side missing"
    hashes = group["hashes"].to_numpy()[order]
    lens = np.fromiter((len(h) for h in hashes), dtype=np.int64, count=n)
    npairs = n // 2
    flat = (
        np.concatenate([np.asarray(h, dtype=np.uint64) for h in hashes])
        if lens.sum()
        else np.empty(0, np.uint64)
    )
    rp = np.repeat(np.arange(n, dtype=np.int64) // 2, lens)
    o2 = np.lexsort((flat, rp))
    fp, pp = flat[o2], rp[o2]
    eqm = (pp[1:] == pp[:-1]) & (fp[1:] == fp[:-1])
    inter = np.bincount(pp[1:][eqm], minlength=npairs).astype(np.int64)
    sizes = lens[0::2] + lens[1::2]
    keep = (PP_TAU_NUM + PP_TAU_DEN) * inter >= PP_TAU_NUM * sizes
    return pd.DataFrame(
        {
            "a": a[0::2][keep].astype(np.int64),
            "b": b[0::2][keep].astype(np.int64),
            "inter_sz": inter[keep],
            "union_sz": (sizes - inter)[keep],
        }
    )


def ppjoin_pairs(docs_ds) -> pd.DataFrame:
    """documents (+house variants) -> DataFrame (a, b, inter_sz,
    union_sz) of ALL pairs with token-set Jaccard >= 3/5."""
    import ray
    import ray.data

    from robosat_ray.stages.join import copartition_join
    from robosat_ray.stages.neardup import dedup_pairs_ds, with_variants_batch

    # sets is consumed twice (postings now, verify carriers later) but
    # NOT materialized: re-running the tokenize+hash scan is cheaper
    # than pinning a corpus-sized list column in the object store at
    # 10^12 docs (the near_dup shingle precedent)
    docs = docs_ds.map_batches(with_variants_batch, batch_format="pyarrow")
    sets = docs.map_batches(_token_set_rows, batch_format="pyarrow")

    postings = sets.map_batches(_postings, batch_format="pyarrow")
    df = postings.groupby("th").count()

    def df_cols(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"th": batch.column("th"), "df": batch.column("count()")}
        )

    df = df.map_batches(df_cols, batch_format="pyarrow")
    hints = {
        "left": {"th": pa.int64(), "doc_id": pa.int64(), "n": pa.int64()},
        "right": {"th": pa.int64(), "df": pa.int64()},
    }
    with_df = copartition_join(
        postings, df, on="th", how="inner",
        num_buckets=NUM_JOIN_BUCKETS, schema_hints=hints,
    )

    def tag_doc(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "dbucket",
            pa.array(hash_bucket(batch.column("doc_id").to_numpy(), NUM_JOIN_BUCKETS)),
        )

    prefixed = (
        with_df.map_batches(tag_doc, batch_format="pyarrow")
        .groupby("dbucket")
        .map_groups(_prefix_rows, batch_format="pandas")
    )
    cand = prefixed.groupby("mbucket").map_groups(
        _mine_pairs, batch_format="pandas"
    ).materialize()

    empty = pd.DataFrame(
        {
            "a": pd.Series([], dtype=np.int64),
            "b": pd.Series([], dtype=np.int64),
            "inter_sz": pd.Series([], dtype=np.int64),
            "union_sz": pd.Series([], dtype=np.int64),
        }
    )
    n_cand = cand.count()
    if n_cand == 0:
        return empty

    if n_cand <= PP_BROADCAST_PAIR_CAP:
        # small candidate set: dedup on the driver and broadcast the
        # member ids so verify carriers are computed (and shuffled)
        # only for pair members — the near_dup fast path
        pdf = cand.to_pandas()
        ab = np.unique(
            np.stack([pdf["a"].to_numpy(), pdf["b"].to_numpy()], axis=1), axis=0
        )
        pairs = ray.data.from_arrow(
            pa.table({"a": pa.array(ab[:, 0]), "b": pa.array(ab[:, 1])})
        )
        ids_ref = ray.put(np.unique(ab))
        sets = docs.map_batches(
            _token_set_rows, fn_kwargs={"ids_ref": [ids_ref]},
            batch_format="pyarrow",
        )
    else:
        pairs = dedup_pairs_ds(cand)

    from robosat_ray.stages.neardup import _attach_hashes

    def need_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        doc = np.concatenate([a, b])
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "a": pa.array(np.concatenate([a, a])),
                "b": pa.array(np.concatenate([b, b])),
                "hashes": pa.nulls(len(doc), pa.list_(pa.uint64())),
                "dbucket": pa.array(hash_bucket(doc, NUM_JOIN_BUCKETS)),
            }
        )

    def set_tagged(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        neg = np.full(len(ids), -1, dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "a": pa.array(neg),
                "b": pa.array(neg),
                "hashes": batch.column("hashes"),
                "dbucket": pa.array(hash_bucket(ids, NUM_JOIN_BUCKETS)),
            }
        )

    both = pairs.map_batches(need_rows, batch_format="pyarrow").union(
        sets.map_batches(set_tagged, batch_format="pyarrow")
    )
    attached = both.groupby("dbucket").map_groups(
        _attach_hashes, batch_format="pandas"
    )
    verified = attached.groupby("pbucket").map_groups(
        _pp_verify, batch_format="pandas"
    )
    out = verified.to_pandas()
    if len(out) == 0:
        return empty
    return out.sort_values(["a", "b"]).reset_index(drop=True)
