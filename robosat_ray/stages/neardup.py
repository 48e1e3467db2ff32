"""Near-duplicate detection: MinHash + LSH banding + exact-Jaccard
verification (the classic shingle -> minhash -> band -> bucket-groupby
-> candidate-pairs -> verify pipeline; SNIPPETS/ray-guide pattern).

Scale shape: the banding pass and the bucket groupby are fully
distributed, and the exact-Jaccard verify is a doc_id co-partition
join executed in map_groups — the driver never sees shingle sets or
candidate pairs, only the final verified (a, b) rows. The shingle
computation for the verify has a strategy switch like the spatial
join: when the candidate set is small its distinct doc ids are
broadcast (ray.put of a sorted int64 array) and shingles are computed
only for members; above the cap every document's shingles flow into
the co-partition join (full-corpus payload but no driver involvement
— the 10^12-doc path)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.functions.hashing import hash_bucket
from robosat_ray.functions.text_hash import N_BANDS, band_keys

VARIANT_OFFSET = 10_000_000
# below this many verified pairs, connected components run as one
# vectorized min-label pass on the driver (the pair set is tiny and
# the label map gets broadcast right after anyway); above it, the
# distributed label-propagation path keeps one giant dup cluster from
# ever landing on the driver
DRIVER_CC_EDGE_CAP = 2_000_000


def with_variants_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> documents + deterministic near-dup variants:
    every doc_id % 5 == 0 gets a copy (id + VARIANT_OFFSET) whose first
    token is replaced by 'zzvariant' (mirrored in the SQL oracle)."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    sel = ids % 5 == 0
    assert len(ids) == 0 or ids.max() < VARIANT_OFFSET, (
        "doc_id range reaches VARIANT_OFFSET: variant ids would collide")
    v_ids = ids[sel] + VARIANT_OFFSET
    v_texts = [
        "zzvariant" + t[t.index(" ") :] if " " in t else "zzvariant"
        for t, s in zip(texts, sel)
        if s
    ]
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate([ids, v_ids])),
            "text": pa.array(texts + v_texts, pa.string()),
        }
    )


# compact bucket count: equal band keys co-locate for ANY modulus;
# 256 buckets keep per-group pandas overhead amortized (4096 measured
# ~2x slower at sf0.1 from tiny-group overhead) while staying well
# above the executor's parallelism
NUM_LSH_BUCKETS = 256


def _band_rows(batch: pa.Table) -> pa.Table:
    """Band keys fold the band index in, so plain key equality defines
    LSH candidacy; rows are grouped by a COMPACT bucket
    (key % NUM_LSH_BUCKETS) rather than the raw key — a groupby over
    millions of singleton buckets pays per-group overhead, a few
    hundred buckets don't (band keys are already uniform hashes, so a
    bare modulus is fine HERE)."""
    from robosat_ray.functions.text_hash import batch_band_keys, batch_minhash_signatures

    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    out_id = np.repeat(ids, N_BANDS)
    bands = np.arange(N_BANDS, dtype=np.uint64)
    sigs = batch_minhash_signatures(texts)  # (n_docs, N_PERM) one numpy pass
    combined = (
        batch_band_keys(sigs).astype(np.uint64) * np.uint64(1099511628211)
        + bands[None, :]
    ) & np.uint64(0x7FFFFFFFFFFFFFFF)
    keys = combined.astype(np.int64).reshape(-1)
    return pa.table(
        {
            "doc_id": pa.array(out_id),
            "band_key": pa.array(keys),
            "bucket": pa.array(keys % NUM_LSH_BUCKETS),
        }
    )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Within a compact bucket: sort by exact band_key, emit all pairs
    of each equal-key run (vectorized, 200-doc cap per run)."""
    keys = group["band_key"].to_numpy()
    ids = group["doc_id"].to_numpy()
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(keys))[0] + 1, [len(keys)]])
    out_a, out_b = [], []
    for s, e in zip(starts[:-1], starts[1:]):
        n = e - s
        if n < 2 or n > 200:  # cap pathological buckets
            continue
        run = np.unique(ids[s:e])
        if len(run) < 2:
            continue
        ii, jj = np.triu_indices(len(run), k=1)
        out_a.append(run[ii])
        out_b.append(run[jj])
    if not out_a:
        return pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
        )
    return pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})


NUM_JOIN_BUCKETS = 64
BROADCAST_PAIR_CAP = 500_000


def _dedup_sorted(a: np.ndarray, b: np.ndarray):
    """Distinct (a, b) rows via lexsort + adjacent-drop; returns the
    pairs (a, b)-sorted."""
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.ones(len(a), dtype=bool)
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return a[keep], b[keep]


def dedup_pairs_ds(cand_ds):
    """Distinct (a, b) pair rows WITHOUT a Ray two-key Aggregate:
    in-batch lexsort dedup (candidate pairs repeat once per agreeing
    band, so the pre-dedup collapses most of the volume), ONE
    hash-bucket shuffle, per-bucket lexsort dedup — the same
    co-partition idiom the verify join uses. Ray's sort-based
    groupby(['a','b']).aggregate() measured ~20x slower on
    millions of pair rows (112 s for 1.2M rows at 32 cpus)."""
    from robosat_ray.functions.hashing import hash_bucket2

    def tag(batch: pa.Table) -> pa.Table:
        a, b = _dedup_sorted(
            batch.column("a").to_numpy(), batch.column("b").to_numpy()
        )
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "pbucket": pa.array(hash_bucket2(a, b, NUM_JOIN_BUCKETS)),
            }
        )

    def uniq(group: pd.DataFrame) -> pd.DataFrame:
        a, b = _dedup_sorted(group["a"].to_numpy(), group["b"].to_numpy())
        return pd.DataFrame({"a": a.astype(np.int64), "b": b.astype(np.int64)})

    return (
        cand_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(uniq, batch_format="pandas")
    )


def _shingle_rows(batch: pa.Table, ids_ref=None) -> pa.Table:
    """(doc_id, text) -> (doc_id, hashes); with ids_ref, only for docs
    in the broadcast sorted candidate-id array (np.searchsorted)."""
    import ray

    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    if ids_ref is not None:
        want = ray.get(ids_ref[0]) if not isinstance(ids_ref[0], np.ndarray) else ids_ref[0]
        pos = np.searchsorted(want, ids)
        member = (pos < len(want)) & (want[np.clip(pos, 0, len(want) - 1)] == ids)
        keep = np.nonzero(member)[0]
    else:
        keep = np.arange(len(ids))
    from robosat_ray.functions.text_hash import batch_shingle_sets

    flat, set_off = batch_shingle_sets([texts[i] for i in keep])
    return pa.table(
        {
            "doc_id": pa.array(ids[keep]),
            "hashes": pa.ListArray.from_arrays(
                pa.array(set_off, pa.int32()), pa.array(flat, pa.uint64())
            ),
        }
    )


def _attach_hashes(group: pd.DataFrame) -> pd.DataFrame:
    """Within one doc_id-hash bucket: rows are either shingle carriers
    (a == -1) or pair-need rows; emit each pair-need row with its
    doc's hashes attached (sorted-carrier searchsorted gather, no
    per-row dict), keyed for the pair-bucket regroup."""
    is_sh = group["a"].to_numpy() < 0
    sh = group[is_sh]
    sh_ids = sh["doc_id"].to_numpy()
    order = np.argsort(sh_ids, kind="stable")
    sh_ids = sh_ids[order]
    sh_hashes = sh["hashes"].to_numpy()[order]
    pr = group[~is_sh]
    a = pr["a"].to_numpy()
    b = pr["b"].to_numpy()
    need = pr["doc_id"].to_numpy()
    pos = np.searchsorted(sh_ids, need)
    # every pair-need doc must have its carrier row — fail LOUDLY if
    # the invariant ever breaks (a silent wrong-doc gather would emit
    # wrong Jaccard verdicts instead of a visible error)
    assert len(need) == 0 or (
        len(sh_ids) > 0
        and (sh_ids[np.clip(pos, 0, len(sh_ids) - 1)] == need).all()
    ), "pair-need doc_id missing its shingle-carrier row"
    hashes = sh_hashes[pos]
    from robosat_ray.functions.hashing import hash_bucket2

    return pd.DataFrame(
        {
            "a": a,
            "b": b,
            "hashes": hashes,
            "pbucket": hash_bucket2(a, b, NUM_JOIN_BUCKETS),
        }
    )


def _verify_pairs(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Within one pair bucket: each (a, b) has exactly two rows (the a
    side and the b side); exact sorted-set Jaccard decides.

    Vectorized across the whole bucket: all hash sets concatenate into
    one flat array tagged by pair index; after one lexsort, adjacent
    equal (pair, hash) runs count the intersections (each side is a
    UNIQUE set, so multiplicity within a pair is at most 2) — no
    per-pair Python set ops."""
    a = group["a"].to_numpy()
    b = group["b"].to_numpy()
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    n = len(a)
    empty = pd.DataFrame(
        {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
    )
    if n == 0:
        return empty
    assert n % 2 == 0 and (a[0::2] == a[1::2]).all() and (
        b[0::2] == b[1::2]
    ).all(), "pair side missing"
    hashes = group["hashes"].to_numpy()[order]
    lens = np.fromiter((len(h) for h in hashes), dtype=np.int64, count=n)
    npairs = n // 2
    if lens.sum():
        flat = np.concatenate([np.asarray(h, dtype=np.uint64) for h in hashes])
    else:
        flat = np.empty(0, dtype=np.uint64)
    rp = np.repeat(np.arange(n, dtype=np.int64) // 2, lens)
    o2 = np.lexsort((flat, rp))
    fp, pp = flat[o2], rp[o2]
    eqm = (pp[1:] == pp[:-1]) & (fp[1:] == fp[:-1])
    inter = np.bincount(pp[1:][eqm], minlength=npairs).astype(np.int64)
    union = (lens[0::2] + lens[1::2]) - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)  # 0/0 => 1.0
    keep = jac >= threshold
    return pd.DataFrame(
        {
            "a": a[0::2][keep].astype(np.int64),
            "b": b[0::2][keep].astype(np.int64),
        }
    )


def near_dup_pairs_ds(docs_ds, threshold: float = 0.5):
    """-> Dataset (a, b) of document pairs with exact shingle-set
    Jaccard >= threshold, found via LSH (64 bands x 2 rows: recall at
    j >= 0.5 is 1 - (1 - j^2)^64 > 0.98, and > 1 - 1e-9 for the
    synthetic variants at j ~ 0.8). Verify runs as a distributed
    co-partition join; see module docstring for the scale shape."""
    bands = docs_ds.map_batches(_band_rows, batch_format="pyarrow")
    cand = bands.groupby("bucket").map_groups(
        _bucket_pairs, batch_format="pandas"
    ).materialize()  # small; consumed by strategy decision + need-rows
    return _verified_pairs(cand, docs_ds, threshold)


def _verified_pairs(cand, docs_ds, threshold: float):
    """LSH candidate Dataset (a, b) -> exact-Jaccard-verified pairs:
    the broadcast / co-partition verify switch shared by the self-join
    (near_dup_pairs_ds) and the cross-corpus delta join
    (delta_dup_pairs_ds). docs_ds must carry (doc_id, text) for every
    id appearing in cand."""
    import ray
    import ray.data

    n_cand = cand.count()
    empty = pd.DataFrame(
        {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
    )
    if n_cand == 0:
        return ray.data.from_pandas(empty)

    if n_cand <= BROADCAST_PAIR_CAP:
        # small candidate set: dedup pairs on the driver (they must be
        # gathered anyway for the id broadcast) — saves the groupby
        # all-to-all — and broadcast sorted distinct doc ids so
        # shingles are computed (and shuffled) only for members
        pdf = cand.to_pandas()
        ab = np.unique(
            np.stack([pdf["a"].to_numpy(), pdf["b"].to_numpy()], axis=1), axis=0
        )
        pairs = ray.data.from_arrow(
            pa.table({"a": pa.array(ab[:, 0]), "b": pa.array(ab[:, 1])})
        )
        ids_ref = ray.put(np.unique(ab))
        shingles = docs_ds.map_batches(
            _shingle_rows, fn_kwargs={"ids_ref": [ids_ref]}, batch_format="pyarrow"
        )
    else:
        # 10^12-doc path: no driver gather. Pairs MUST be deduped
        # before the join here (a true near-dup matches ~tens of
        # bands; shipping its shingles once per band would inflate the
        # pair-bucket shuffle by that factor), and every doc's
        # shingles flow into the co-partition join.
        pairs = dedup_pairs_ds(cand)
        shingles = docs_ds.map_batches(_shingle_rows, batch_format="pyarrow")

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

    def sh_tagged(batch: pa.Table) -> pa.Table:
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
        shingles.map_batches(sh_tagged, batch_format="pyarrow")
    )
    attached = both.groupby("dbucket").map_groups(_attach_hashes, batch_format="pandas")
    verified = attached.groupby("pbucket").map_groups(
        lambda g: _verify_pairs(g, threshold), batch_format="pandas"
    )
    return verified


def near_dup_pairs(docs_ds, threshold: float = 0.5) -> pd.DataFrame:
    """DataFrame wrapper over near_dup_pairs_ds (verified pairs are a
    tiny result set — materializing THEM is fine)."""
    out = near_dup_pairs_ds(docs_ds, threshold).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
        )
    return out.astype({"a": np.int64, "b": np.int64})


def delta_shard_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> the synthetic NEW shard for the delta-dedup
    query: a zzvariant copy (id + VARIANT_OFFSET, first token replaced)
    of every doc_id % 3 == 0 document — mirrored in oracle.DELTA_DUP."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    sel = ids % 3 == 0
    assert len(ids) == 0 or ids.max() < VARIANT_OFFSET
    v_ids = ids[sel] + VARIANT_OFFSET
    v_texts = [
        "zzvariant" + t[t.index(" ") :] if " " in t else "zzvariant"
        for t, s in zip(texts, sel)
        if s
    ]
    return pa.table(
        {
            "doc_id": pa.array(v_ids),
            "text": pa.array(v_texts, pa.string()),
        }
    )


def _bucket_cross_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Within a compact bucket: sort by exact band_key, emit the
    CROSS-SIDE (ref x new) pairs of each equal-key run (the asymmetric
    analog of _bucket_pairs; same 200-row run cap)."""
    keys = group["band_key"].to_numpy()
    ids = group["doc_id"].to_numpy()
    sides = group["side"].to_numpy()
    order = np.lexsort((ids, keys))
    keys, ids, sides = keys[order], ids[order], sides[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(keys))[0] + 1, [len(keys)]])
    out_a, out_b = [], []
    for s, e in zip(starts[:-1], starts[1:]):
        n = e - s
        if n < 2 or n > 200:  # cap pathological buckets
            continue
        ref = np.unique(ids[s:e][sides[s:e] == 0])
        new = np.unique(ids[s:e][sides[s:e] == 1])
        if len(ref) == 0 or len(new) == 0:
            continue
        out_a.append(np.repeat(ref, len(new)))
        out_b.append(np.tile(new, len(ref)))
    if not out_a:
        return pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
        )
    return pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})


def delta_dup_pairs_ds(ref_ds, new_ds, threshold: float = 0.5):
    """Incremental-ingest near-dup join: (ref_id, new_id) pairs where a
    NEW shard document has exact shingle Jaccard >= threshold against a
    PRIOR-corpus document — the asymmetric A x B analog of
    near_dup_pairs_ds (the reference's dedupe-against-existing
    semantics, robosat/tools/dedupe.py:31-58, applied to text). Same
    distributed banding; candidate mining keeps only cross-side pairs
    (ref x ref and new x new runs emit nothing), then the shared
    broadcast/co-partition exact verify over the union of both doc
    sets. doc_id ranges of the two sides must be disjoint."""

    def side_tag(side):
        def f(batch: pa.Table) -> pa.Table:
            out = _band_rows(batch)
            return out.append_column(
                "side", pa.array(np.full(len(out), side, dtype=np.int8))
            )

        return f

    bands = ref_ds.map_batches(side_tag(0), batch_format="pyarrow").union(
        new_ds.map_batches(side_tag(1), batch_format="pyarrow")
    )
    cand = bands.groupby("bucket").map_groups(
        _bucket_cross_pairs, batch_format="pandas"
    ).materialize()
    return _verified_pairs(cand, ref_ds.union(new_ds), threshold)


def simhash_table(docs_ds):
    """-> Dataset (doc_id, simhash int64, n_tokens) — 64-bit SimHash
    fingerprints, oracle-checked (SIMHASH). Batch-vectorized: one
    factorize + md5-per-unique-token per batch (batch_simhash64), the
    token count from an Arrow split kernel — no per-doc Python."""
    import pyarrow.compute as pc

    from robosat_ray.functions.text_hash import batch_simhash64

    def f(batch: pa.Table) -> pa.Table:
        texts_col = batch.column("text")
        texts = texts_col.to_pylist()
        hs = batch_simhash64(texts) & np.uint64(0x7FFFFFFFFFFFFFFF)
        nt = pc.list_value_length(pc.split_pattern(texts_col, " "))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(hs.astype(np.int64)),
                "n_tokens": pc.cast(nt, pa.int64()),
            }
        )

    return docs_ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash hamming-distance near-dup pairs (banded, pigeonhole-exact)
# ---------------------------------------------------------------------------

# 4 bands x 16 bits over the 63-bit simhash: any pair with hamming
# distance <= SIMHASH_MAX_HAMMING (< number of bands) must agree on at
# least one full band (pigeonhole), so band-equality candidacy is
# EXACT, not approximate — the banded plan returns the identical pair
# set a quadratic all-pairs scan would, at O(collisions) cost.
SIMHASH_N_BANDS = 4
SIMHASH_BAND_BITS = 16
SIMHASH_MAX_HAMMING = 3
# cap pathological equal-band runs (a run that large means thousands of
# near-identical fingerprints — exact dedup upstream is the real fix).
# The cap TRUNCATES each run deterministically to its smallest doc_ids
# (never drops the whole run) and is mirrored bit-for-bit in the
# SIMHASH_DUP oracle's QUALIFY row_number() <= cap, so engine and SQL
# stay identical even on skewed corpora that exceed the cap.
_SIMDUP_RUN_CAP = 1000


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR reduction, no Python loop)."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def _simband_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash) -> SIMHASH_N_BANDS rows per doc keyed by
    (band index folded with the band's 16-bit value); grouped by a
    compact bucket like the LSH pass (band keys are uniform, bare
    modulus is fine)."""
    ids = batch.column("doc_id").to_numpy()
    sh = batch.column("simhash").to_numpy().astype(np.uint64)
    bands = np.arange(SIMHASH_N_BANDS, dtype=np.uint64)
    vals = (sh[:, None] >> (bands[None, :] * np.uint64(SIMHASH_BAND_BITS))) & np.uint64(
        0xFFFF
    )
    # fold band index into the key so one equality test covers both
    keys = ((bands[None, :] << np.uint64(SIMHASH_BAND_BITS)) | vals).astype(
        np.int64
    ).reshape(-1)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, SIMHASH_N_BANDS)),
            "simhash": pa.array(np.repeat(sh.astype(np.int64), SIMHASH_N_BANDS)),
            "band_key": pa.array(keys),
            "bucket": pa.array(keys % NUM_LSH_BUCKETS),
        }
    )


def _simband_pairs(group: pd.DataFrame, max_hamming: int,
                   run_cap: int = _SIMDUP_RUN_CAP) -> pd.DataFrame:
    """One compact bucket: sort by exact band key, all-pairs within
    each equal-key run, popcount(xor) filter — fully vectorized."""
    keys = group["band_key"].to_numpy()
    ids = group["doc_id"].to_numpy()
    sh = group["simhash"].to_numpy().astype(np.uint64)
    order = np.lexsort((ids, keys))
    keys, ids, sh = keys[order], ids[order], sh[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(keys))[0] + 1, [len(keys)]])
    out_a, out_b, out_h = [], [], []
    for s, e in zip(starts[:-1], starts[1:]):
        # rows are (key, doc_id)-sorted, so s..s+cap keeps the run's
        # smallest doc_ids — the same subset the oracle's QUALIFY keeps
        e = min(e, s + run_cap)
        n = e - s
        if n < 2:
            continue
        ii, jj = np.triu_indices(n, k=1)
        h = popcount64(sh[s + ii] ^ sh[s + jj])
        keep = h <= max_hamming
        if keep.any():
            out_a.append(ids[s + ii[keep]])
            out_b.append(ids[s + jj[keep]])
            out_h.append(h[keep])
    if not out_a:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype=np.int64),
                "doc_b": pd.Series([], dtype=np.int64),
                "hamming": pd.Series([], dtype=np.int64),
            }
        )
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    return pd.DataFrame(
        {
            "doc_a": np.minimum(a, b).astype(np.int64),
            "doc_b": np.maximum(a, b).astype(np.int64),
            "hamming": np.concatenate(out_h),
        }
    )


def simhash_dup_pairs(docs_ds, max_hamming: int = SIMHASH_MAX_HAMMING,
                      run_cap: int = _SIMDUP_RUN_CAP):
    """-> Dataset (doc_a, doc_b, hamming): all document pairs whose
    63-bit SimHash fingerprints differ by <= max_hamming bits."""
    sh = simhash_table(docs_ds).select_columns(["doc_id", "simhash"])
    return banded_hamming_pairs(sh, max_hamming, run_cap)


def banded_hamming_pairs(sh, max_hamming: int = SIMHASH_MAX_HAMMING,
                         run_cap: int = _SIMDUP_RUN_CAP):
    """(doc_id, simhash int64 63-bit) Dataset -> all pairs within
    max_hamming bits. The fingerprint-agnostic half of the SimHash
    dup pipeline (stages/phash.py feeds image dHashes through it).

    Plan: 4-way band explode -> bucketed groupby -> in-group
    all-pairs popcount verify -> bucketed pair-dedupe (a pair can
    surface from several agreeing bands; same lexsort idiom as
    dedup_pairs_ds — Ray's two-key Aggregate is pathologically slow at
    millions of pair rows). Requires max_hamming < SIMHASH_N_BANDS for
    the pigeonhole guarantee."""
    from robosat_ray.functions.hashing import hash_bucket2

    assert max_hamming < SIMHASH_N_BANDS, "pigeonhole guarantee needs k < bands"
    pairs = (
        sh.map_batches(_simband_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: _simband_pairs(g, max_hamming, run_cap),
            batch_format="pandas",
        )
    )

    def _first_of_run(a, b, h):
        order = np.lexsort((h, b, a))
        a, b, h = a[order], b[order], h[order]
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return a[first], b[first], h[first]  # h sorted within run: first = min

    def tag(batch: pa.Table) -> pa.Table:
        a, b, h = _first_of_run(
            batch.column("doc_a").to_numpy(),
            batch.column("doc_b").to_numpy(),
            batch.column("hamming").to_numpy(),
        )
        return pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(b),
                "hamming": pa.array(h),
                "pbucket": pa.array(hash_bucket2(a, b, NUM_JOIN_BUCKETS)),
            }
        )

    def min_group(group: pd.DataFrame) -> pd.DataFrame:
        a, b, h = _first_of_run(
            group["doc_a"].to_numpy(),
            group["doc_b"].to_numpy(),
            group["hamming"].to_numpy(),
        )
        return pd.DataFrame(
            {
                "doc_a": a.astype(np.int64),
                "doc_b": b.astype(np.int64),
                "hamming": h.astype(np.int64),
            }
        )

    return (
        pairs.map_batches(tag, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(min_group, batch_format="pandas")
    )


def dup_clusters(docs_ds, threshold: float = 0.5):
    """Near-dup cluster canonicalization: LSH pair mining -> connected
    components over the pair graph -> per-document cluster id (min
    doc_id in the component), cluster size, and a keep flag marking
    the canonical representative (reference analog: the keep/drop
    decision of tools/dedupe.py:48-67, lifted from pairs to whole
    duplicate clusters — the form an LLM-data dedupe actually needs)."""
    pairs = near_dup_pairs_ds(docs_ds, threshold).materialize()
    return pair_clusters(pairs, docs_ds.select_columns(["doc_id"]))


def pair_clusters(pairs, ids):
    """Generic pair-graph cluster canonicalization: any materialized
    (a, b, ...) pair Dataset + the full id universe -> per-id
    (doc_id, cluster_id = min doc_id in component, cluster_size,
    keep). Shared by dup_clusters (MinHash pairs) and entity_clusters
    (edit-distance pairs).

    Scale shape: CC runs ONLY over edge-touched nodes (duplicate pairs
    are sparse relative to the corpus), via the distributed
    label-propagation + pointer-jumping loop in runtime/components.py
    — never a driver union-find. The (node, label) map is attached
    back to the full corpus with a LEFT broadcast join (the label map
    is bounded by 2x the verified pairs; above the broadcast cap
    stages/join.copartition_join is the drop-in same-signature
    replacement); untouched documents label themselves (size-1
    clusters) without ever entering the shuffle."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from robosat_ray.runtime.components import distributed_components
    from robosat_ray.stages.join import broadcast_join

    def _finalize(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id")
        cid = (
            pc.coalesce(batch.column("cluster_id"), doc)
            if "cluster_id" in batch.column_names
            else doc
        )
        size = (
            pc.coalesce(batch.column("cluster_size"), pa.scalar(1, pa.int64()))
            if "cluster_size" in batch.column_names
            else pa.array(np.ones(len(batch), dtype=np.int64))
        )
        keep = pc.cast(pc.equal(cid, doc), pa.int64())
        return pa.table(
            {
                "doc_id": doc,
                "cluster_id": pc.cast(cid, pa.int64()),
                "cluster_size": pc.cast(size, pa.int64()),
                "keep": keep,
            }
        )

    n_pairs = pairs.count()
    if n_pairs == 0:
        return ids.map_batches(_finalize, batch_format="pyarrow")

    if n_pairs <= DRIVER_CC_EDGE_CAP:
        # small edge list (the overwhelmingly common case: dup pairs
        # << corpus): vectorized min-label propagation on the driver —
        # the pair set was already materialized for the count, and the
        # (ids, labels) map is broadcast next anyway
        from robosat_ray.geo.graph import min_label_arrays

        pdf = pairs.to_pandas()
        ea = pdf["a"].to_numpy(dtype=np.int64)
        eb = pdf["b"].to_numpy(dtype=np.int64)
        nodes_arr, labels_arr = min_label_arrays(
            np.unique(np.concatenate([ea, eb])), ea, eb
        )
        _, inv, cnt = np.unique(labels_arr, return_inverse=True, return_counts=True)
        lab_sized = pa.table(
            {
                "doc_id": pa.array(nodes_arr),
                "cluster_id": pa.array(labels_arr),
                "cluster_size": pa.array(cnt[inv].astype(np.int64)),
            }
        )
    else:
        # skew-safe path: one giant dup cluster can't OOM the driver —
        # distributed label propagation + pointer jumping
        def touched(batch: pa.Table) -> pa.Table:
            a = batch.column("a").to_numpy()
            b = batch.column("b").to_numpy()
            return pa.table({"node": pa.array(np.unique(np.concatenate([a, b])))})

        nodes = (
            pairs.map_batches(touched, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"])
        )
        labels = distributed_components(nodes, pairs)

        def as_map(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": pc.cast(batch.column("node"), pa.int64()),
                    "cluster_id": pc.cast(batch.column("label"), pa.int64()),
                }
            )

        lab_map = labels.map_batches(as_map, batch_format="pyarrow")
        sizes = lab_map.groupby("cluster_id").aggregate(
            Count(alias_name="cluster_size")
        )

        def sz_rows(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "cluster_id": pc.cast(b.column("cluster_id"), pa.int64()),
                    "cluster_size": pc.cast(b.column("cluster_size"), pa.int64()),
                }
            )

        # label map may exceed driver memory here by construction, so
        # BOTH attaches stay distributed: sizes onto labels, then the
        # sized label map onto the corpus, each one hash-bucket shuffle
        from robosat_ray.stages.join import copartition_join

        i64 = pa.int64()
        lab_sized = copartition_join(
            lab_map, sizes.map_batches(sz_rows, batch_format="pyarrow"),
            on="cluster_id", how="left",
            schema_hints={
                "left": {"doc_id": i64, "cluster_id": i64},
                "right": {"cluster_id": i64, "cluster_size": i64},
            },
        )
        joined = copartition_join(
            ids, lab_sized, on="doc_id", how="left",
            schema_hints={
                "left": {"doc_id": i64},
                "right": {"doc_id": i64, "cluster_id": i64, "cluster_size": i64},
            },
        )
        return joined.map_batches(_finalize, batch_format="pyarrow")

    joined = broadcast_join(ids, lab_sized, on="doc_id", how="left")
    return joined.map_batches(_finalize, batch_format="pyarrow")


# per-shingle posting-list cap for the EXACT n-gram Jaccard join:
# equal-shingle runs keep only the NGRAM_RUN_CAP smallest doc_ids
# (stopword-like shingles would otherwise mine quadratic pairs);
# mirrored in the oracle's QUALIFY row_number — full SETS still score
# every mined pair exactly (the cap bounds mining, not scoring)
NGRAM_RUN_CAP = 50


def _shingle_explode(batch: pa.Table) -> pa.Table:
    """(doc_id, hashes) -> one (sbucket, shash, doc_id) row per
    shingle: the inverted-index posting rows."""
    from robosat_ray.functions.hashing import hash_bucket

    ids = batch.column("doc_id").to_numpy()
    hashes = batch.column("hashes")
    flat = hashes.combine_chunks().flatten() if isinstance(hashes, pa.ChunkedArray) else hashes.flatten()
    offs = (
        hashes.combine_chunks().offsets.to_numpy()
        if isinstance(hashes, pa.ChunkedArray)
        else hashes.offsets.to_numpy()
    )
    lens = np.diff(offs)
    doc = np.repeat(ids, lens)
    sh = flat.to_numpy().astype(np.int64, copy=False)
    return pa.table(
        {
            "sbucket": pa.array(hash_bucket(sh, NUM_JOIN_BUCKETS)),
            "shash": pa.array(sh),
            "doc_id": pa.array(doc),
        }
    )


def _shingle_run_pairs(group: pd.DataFrame, run_cap: int) -> pd.DataFrame:
    """Within one shingle bucket: per equal-shingle run (sorted by
    doc_id, truncated to the run cap's smallest ids), all (a < b)
    pairs — vectorized ragged triu, no per-run Python beyond the
    truncation mask."""
    sh = group["shash"].to_numpy()
    doc = group["doc_id"].to_numpy()
    order = np.lexsort((doc, sh))
    sh, doc = sh[order], doc[order]
    m = len(sh)
    if m == 0:
        return pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
        )
    starts = np.concatenate([[0], np.nonzero(np.diff(sh))[0] + 1, [m]]).astype(np.int64)
    lens = np.diff(starts)
    run_start = np.repeat(starts[:-1], lens)
    within = np.arange(m, dtype=np.int64) - run_start
    keep_elem = within < run_cap  # posting-list truncation (docs sorted)
    within = np.where(keep_elem, within, 0)
    total = int(within.sum())
    if total == 0:
        return pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
        )
    jj = np.repeat(np.arange(m, dtype=np.int64), within)
    base = np.cumsum(within) - within
    ii = np.arange(total, dtype=np.int64) - np.repeat(base, within) + np.repeat(
        run_start, within
    )
    a = np.minimum(doc[ii], doc[jj])
    b = np.maximum(doc[ii], doc[jj])
    m2 = a != b
    return pd.DataFrame({"a": a[m2], "b": b[m2]})


def _score_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """_verify_pairs with the threshold removed: emit the exact
    integer (n_inter, n_union) and jac_ppm = (inter * 10^6) // union
    per pair (int64 floor division, bit-equal to the SQL twin)."""
    a = group["a"].to_numpy()
    b = group["b"].to_numpy()
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    n = len(a)
    empty = pd.DataFrame(
        {
            "a": pd.Series([], dtype=np.int64),
            "b": pd.Series([], dtype=np.int64),
            "n_inter": pd.Series([], dtype=np.int64),
            "n_union": pd.Series([], dtype=np.int64),
            "jac_ppm": pd.Series([], dtype=np.int64),
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
        else np.empty(0, dtype=np.uint64)
    )
    rp = np.repeat(np.arange(n, dtype=np.int64) // 2, lens)
    o2 = np.lexsort((flat, rp))
    fp, pp = flat[o2], rp[o2]
    eqm = (pp[1:] == pp[:-1]) & (fp[1:] == fp[:-1])
    inter = np.bincount(pp[1:][eqm], minlength=npairs).astype(np.int64)
    union = (lens[0::2] + lens[1::2]) - inter
    jac_ppm = np.where(union > 0, (inter * 1_000_000) // np.maximum(union, 1), 1_000_000)
    return pd.DataFrame(
        {
            "a": a[0::2].astype(np.int64),
            "b": b[0::2].astype(np.int64),
            "n_inter": inter,
            "n_union": union,
            "jac_ppm": jac_ppm.astype(np.int64),
        }
    )


def ngram_jaccard_pairs_ds(docs_ds, run_cap: int = NGRAM_RUN_CAP):
    """EXACT n-gram (3-shingle) Jaccard join, standalone (the brief's
    'n-gram Jaccard' dedup op as a first-class scored operator, not
    just near_dup's verify): inverted-index posting rows per shingle
    hash, per-run capped pair mining (one groupby), bucketed pair
    dedup, then full-set co-partition attach + exact integer scoring.
    No broadcast anywhere; every stage is a bounded shuffle."""
    import functools

    from robosat_ray.functions.hashing import hash_bucket

    shingles = docs_ds.map_batches(_shingle_rows, batch_format="pyarrow")
    postings = shingles.map_batches(_shingle_explode, batch_format="pyarrow")
    cand = postings.groupby("sbucket").map_groups(
        functools.partial(_shingle_run_pairs, run_cap=run_cap),
        batch_format="pandas",
    )
    pairs = dedup_pairs_ds(cand)

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

    def sh_tagged(batch: pa.Table) -> pa.Table:
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
        shingles.map_batches(sh_tagged, batch_format="pyarrow")
    )
    attached = both.groupby("dbucket").map_groups(_attach_hashes, batch_format="pandas")
    return attached.groupby("pbucket").map_groups(_score_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# Edit-distance (Levenshtein) near-dup pairs with prefix blocking
# ---------------------------------------------------------------------------

# fuzzy record-linkage shape: block on (lang, first EDIT_BLOCK_PREFIX
# chars), compare the first EDIT_SLICE chars with exact Levenshtein.
EDIT_SLICE = 64
EDIT_BLOCK_PREFIX = 8
EDIT_MAX_DIST = 8
# cap pathological blocks to their smallest doc_ids, mirrored in the
# EDIT_DUP oracle's QUALIFY row_number() <= cap (same contract as
# _SIMDUP_RUN_CAP above)
_EDIT_RUN_CAP = 256


def _batch_levenshtein(M: np.ndarray, L: np.ndarray,
                       ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
    """Exact Levenshtein distance for many string pairs at once.
    M is the (n, maxlen) uint32 code-point matrix (numpy 'U' storage
    is UTF-32, so this is code-point-exact like SQL levenshtein()),
    L the true lengths, (ii, jj) the pair index arrays. Classic
    rolling-row DP vectorized over ALL pairs: the j-wise insertion
    recurrence curr[j] = min(curr[j], curr[j-1] + 1) is closed in one
    vector step via min-accumulate of (curr - j) + j, so the whole DP
    is maxlen iterations of O(P * maxlen) numpy kernels, zero
    per-pair Python."""
    P = len(ii)
    maxlen = M.shape[1]
    A, B = M[ii], M[jj]
    la, lb = L[ii].astype(np.int32), L[jj].astype(np.int32)
    ar = np.arange(maxlen + 1, dtype=np.int32)
    prev = np.broadcast_to(ar, (P, maxlen + 1)).copy()
    ans = np.where(la == 0, lb, np.int32(-1))
    for i in range(1, maxlen + 1):
        cost = (B != A[:, i - 1][:, None]).astype(np.int32)
        curr = np.empty_like(prev)
        curr[:, 0] = i
        curr[:, 1:] = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        curr = np.minimum.accumulate(curr - ar, axis=1) + ar
        hit = la == i
        if hit.any():
            ans[hit] = curr[hit, lb[hit]]
        prev = curr
    return ans


def _edit_pairs(group: pd.DataFrame, max_dist: int = EDIT_MAX_DIST,
                run_cap: int = _EDIT_RUN_CAP) -> pd.DataFrame:
    """One compact bucket: factorize the exact block key (carried as a
    string, so hash collisions cannot merge two blocks), all-pairs
    within each capped block, batched-DP Levenshtein filter."""
    empty = pd.DataFrame(
        {
            "a": pd.Series([], dtype=np.int64),
            "b": pd.Series([], dtype=np.int64),
            "dist": pd.Series([], dtype=np.int64),
        }
    )
    if len(group) < 2:
        return empty
    codes, _ = pd.factorize(group["bkey"].to_numpy(), sort=False)
    ids = group["doc_id"].to_numpy()
    order = np.lexsort((ids, codes))
    codes, ids = codes[order], ids[order]
    s64 = group["s64"].to_numpy()[order]
    M = np.asarray(s64, dtype=f"U{EDIT_SLICE}").view(np.uint32).reshape(
        len(s64), EDIT_SLICE
    )
    L = np.count_nonzero(M, axis=1).astype(np.int32)  # no interior NULs in text
    starts = np.concatenate([[0], np.nonzero(np.diff(codes))[0] + 1, [len(codes)]])
    ii_all, jj_all = [], []
    for s, e in zip(starts[:-1], starts[1:]):
        # (code, doc_id)-sorted: s..s+cap keeps the block's smallest
        # doc_ids, the subset the oracle's QUALIFY keeps
        e = min(e, s + run_cap)
        n = e - s
        if n < 2:
            continue
        ii, jj = np.triu_indices(n, k=1)
        ii_all.append(ii + s)
        jj_all.append(jj + s)
    if not ii_all:
        return empty
    ii = np.concatenate(ii_all)
    jj = np.concatenate(jj_all)
    d = _batch_levenshtein(M, L, ii, jj)
    keep = d <= max_dist
    return pd.DataFrame(
        {
            "a": ids[ii[keep]].astype(np.int64),
            "b": ids[jj[keep]].astype(np.int64),
            "dist": d[keep].astype(np.int64),
        }
    )


def edit_dup_pairs_ds(docs_ds, max_dist: int = EDIT_MAX_DIST):
    """Edit-distance near-dup pairs -> Dataset (a, b, dist): doc pairs
    sharing (lang, first EDIT_BLOCK_PREFIX chars) whose first
    EDIT_SLICE chars are within Levenshtein max_dist. The fuzzy
    record-linkage operator (blocking + exact verify), integer-exact
    against SQL levenshtein().

    Scale shape: shuffle rows are one (doc_id, bkey, s64) triple per
    doc (<= ~80 bytes) grouped by a 256-bucket compact hash; each
    block is capped at _EDIT_RUN_CAP smallest doc_ids (oracle-
    mirrored), so per-bucket pair work is bounded; the DP verify is
    one vectorized batch per bucket."""
    import pyarrow.compute as pc

    from robosat_ray.functions.text_hash import hash64

    def rows(batch: pa.Table) -> pa.Table:
        s64 = pc.utf8_slice_codeunits(batch.column("text"), 0, EDIT_SLICE)
        pfx = pc.utf8_slice_codeunits(batch.column("text"), 0, EDIT_BLOCK_PREFIX)
        bkey = pc.binary_join_element_wise(
            batch.column("lang"), pfx, "\x1f"
        ).to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(bkey, sort=False)
        uh = np.array([hash64(u) for u in uniq], dtype=np.uint64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "bkey": pa.array(bkey, pa.string()),
                "s64": s64,
                "bucket": pa.array(
                    (uh[codes] % np.uint64(NUM_LSH_BUCKETS)).astype(np.int64)
                ),
            }
        )

    return (
        docs_ds.select_columns(["doc_id", "lang", "text"])
        .map_batches(rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: _edit_pairs(g, max_dist), batch_format="pandas")
    )


def entity_clusters(docs_ds, max_dist: int = EDIT_MAX_DIST):
    """Entity resolution end-to-end: edit-distance blocking + verify
    (edit_dup_pairs_ds) -> connected components over the match graph
    -> per-document entity id (min doc_id), entity size and the
    canonical-representative flag. The classic record-linkage
    composition (block, compare, cluster), sharing pair_clusters with
    the MinHash dedup family."""
    pairs = edit_dup_pairs_ds(docs_ds, max_dist).materialize()
    return pair_clusters(pairs, docs_ds.select_columns(["doc_id"]))
