"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: broadcast query matrix, per-batch numpy
  matmul local top-k, tiny groupby merge — exact, O(N·Q), the
  baseline the oracle checks.
- IVF variant (scale path): k-means-lite coarse centroids (deterministic
  seeded init, few Lloyd iterations on a sample), assign vectors to
  nearest centroid in a map_batches, probe only the nprobe closest
  lists per query. Recall (not exactness) verified in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray import constants as C


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy()
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    E = flat.reshape(len(ids), -1)
    return ids, E


class CosineTopK:
    """Per-batch local top-k against the broadcast query matrix."""

    def __init__(self, qids: np.ndarray, Q: np.ndarray, k: int):
        self.qids = np.asarray(qids, dtype=np.int64)
        Qn = np.asarray(Q, dtype=np.float64)
        self.Qn = Qn / np.linalg.norm(Qn, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, E = _emb_matrix(batch)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        sims = self.Qn @ En.T  # (Q, B)
        self_m = ids[None, :] == self.qids[:, None]
        sims[self_m] = -np.inf
        k = min(self.k, sims.shape[1])
        from robosat_ray.functions.topk import topk_indices

        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            order = topk_indices(-sims[qi], ids, k)
            out_q.append(np.full(len(order), self.qids[qi], dtype=np.int64))
            out_n.append(ids[order])
            out_s.append(sims[qi][order])
        return pa.table(
            {
                "query_id": np.concatenate(out_q) if out_q else np.array([], np.int64),
                "neighbor_id": np.concatenate(out_n) if out_n else np.array([], np.int64),
                "sim": np.concatenate(out_s) if out_s else np.array([], np.float64),
            }
        )


def _merge_topk(group: pd.DataFrame, k: int) -> pd.DataFrame:
    g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="stable").head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g[["query_id", "neighbor_id", "rank"]]


def ann_brute_topk(emb_ds, qids, Q, k: int = C.ANN_K):
    stage = CosineTopK(qids, Q, k)
    local = emb_ds.map_batches(stage, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pandas"
    )


# ---------------- IVF (scale path) ----------------

def train_centroids(sample: np.ndarray, n_lists: int, iters: int = 8):
    """Deterministic k-means-lite on a driver-side sample. Init picks
    evenly-spaced sample rows (floor(c*m/k)) rather than an RNG draw:
    equally spread over the (vec_id-ordered) sample, and exactly
    reproducible by the SQL oracle's unrolled-Lloyd CTE chain."""
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    m = len(sample)
    k = min(n_lists, m)
    idx = np.floor(np.arange(k) * m / k).astype(np.int64)
    cent = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IVFProbe:
    """Filter each batch to vectors whose coarse list is among the
    nprobe closest lists of ANY query, then local top-k (union of
    per-query candidate sets — correct merge happens downstream)."""

    def __init__(self, qids, Q, centroids, k: int, nprobe: int):
        self.inner = CosineTopK(qids, Q, k)
        self.cent = np.asarray(centroids, np.float64)
        # same list selection as the partitioned path (equality tested)
        self.allowed = allowed_lists(Q, self.cent, nprobe)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, E = _emb_matrix(batch)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        assign = np.argmax(En @ self.cent.T, axis=1)
        keep = np.isin(assign, self.allowed)
        return self.inner(batch.filter(pa.array(keep)))


def ann_ivf_topk(emb_ds, qids, Q, centroids, k: int = C.ANN_K, nprobe: int = 4):
    stage = IVFProbe(qids, Q, centroids, k, nprobe)
    local = emb_ds.map_batches(stage, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pandas"
    )


# ---------------- embedding-cosine near-dup (dedup family) ----------------

def with_emb_variants_batch(batch: pa.Table) -> pa.Table:
    """embeddings batch -> rows + deterministic near-dup variants:
    every vec_id % 7 == 0 gets a copy with id -(vec_id + 1) — negative
    ids CANNOT collide with any real non-negative vec_id, unlike an
    additive offset — scaled by 1 + (vec_id % 5 + 1)/100:
    cosine-identical to its source (scale invariance), far from every
    other vector (corpus max off-pair cosine ~0.51). Mirrored in the
    SQL oracle."""
    ids = batch.column("vec_id").to_numpy()
    E = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
    sel = ids % 7 == 0
    v_ids = -(ids[sel] + 1)
    factor = 1.0 + ((ids[sel] % 5).astype(np.float64) + 1.0) / 100.0
    V = E[sel] * factor[:, None]
    out_ids = np.concatenate([ids, v_ids])
    out_E = np.concatenate([E, V], axis=0)
    return pa.table(
        {
            "vec_id": pa.array(out_ids),
            "embedding": pa.array(list(out_E), pa.list_(pa.float64())),
        }
    )


class CosineDupPairs:
    """Broadcast reference matrix; per batch emits (a < b) pairs with
    cosine >= threshold — exact (no LSH recall loss). The broadcast
    side is the small-side pattern (ray.put once, read per worker);
    when the reference side outgrows a worker heap the LSH-bucketed
    candidate pass (stages/neardup.py) is the scale path and this
    kernel becomes its verify step."""

    def __init__(self, ref, threshold: float):
        import ray

        tbl = ray.get(ref) if not isinstance(ref, pa.Table) else ref
        self.all_ids = tbl.column("vec_id").to_numpy()
        A = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
        self.Alln = A / np.linalg.norm(A, axis=1, keepdims=True)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, E = _emb_matrix(batch)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        sims = En @ self.Alln.T
        ii, jj = np.nonzero(
            (sims >= self.threshold) & (ids[:, None] < self.all_ids[None, :])
        )
        return pa.table(
            {
                "a": pa.array(ids[ii]),
                "b": pa.array(self.all_ids[jj]),
            }
        )


def emb_dup_pairs(emb_ds, emb_table: pa.Table, threshold: float = 0.8):
    """-> Dataset (a, b): vector pairs with cosine >= threshold."""
    import ray

    ref = ray.put(emb_table)
    return emb_ds.map_batches(
        CosineDupPairs,
        fn_constructor_args=(ref, threshold),
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )


# ---------------- IVF with READ pruning (the real scale path) ----------------
#
# A scan-everything IVF only prunes COMPUTE. The scale path writes the
# vectors ONCE as list-partitioned Parquet (hive layout,
# list_id=<n>/...), so a query set touching nprobe lists reads a
# strict subset of the files — the other lists never leave storage.

def build_ivf_index(emb_ds, centroids, out_dir: str):
    """Assign each vector to its coarse list and persist as
    list-partitioned Parquet. One-time build, reused across query
    sets (assignment is NOT recomputed per query)."""
    cent = np.asarray(centroids, np.float64)

    def assign(batch: pa.Table) -> pa.Table:
        ids, E = _emb_matrix(batch)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        a = np.argmax(En @ cent.T, axis=1)
        return batch.append_column("list_id", pa.array(a.astype(np.int64)))

    emb_ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["list_id"]
    )
    return out_dir


def allowed_lists(Q, centroids, nprobe: int) -> np.ndarray:
    Qn = np.asarray(Q, np.float64)
    Qn = Qn / np.linalg.norm(Qn, axis=1, keepdims=True)
    cent = np.asarray(centroids, np.float64)
    sims = Qn @ cent.T
    nprobe = min(nprobe, cent.shape[0])
    # stable sort: ties resolve to the lowest list id, like the SQL
    # oracle's ORDER BY dot DESC, cid
    return np.unique(np.argsort(-sims, axis=1, kind="stable")[:, :nprobe].ravel())


def ann_ivf_partitioned(
    index_dir: str, qids, Q, centroids, k: int = C.ANN_K, nprobe: int = 4
):
    """Top-k over ONLY the nprobe-nearest list partitions of a
    persisted IVF index — the read itself is pruned (pass
    `columns=`-style dir selection, not a post-read filter)."""
    import os

    import ray.data

    lists = allowed_lists(Q, centroids, nprobe)
    paths = [
        os.path.join(d, f)
        for l in lists
        if os.path.isdir(d := os.path.join(index_dir, f"list_id={int(l)}"))
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not paths:
        import pandas as pd

        return ray.data.from_pandas(
            pd.DataFrame({"query_id": [], "neighbor_id": [], "rank": []})
        )
    emb = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    return ann_brute_topk(emb, qids, Q, k)


# ---------------- hyperplane-LSH near-dup (the scale path the exact
# CosineDupPairs docstring promises) ----------------

EMB_LSH_PLANES = 64
EMB_LSH_BANDS = 4
EMB_LSH_BAND_BITS = 16
EMB_LSH_SCALE = 1048576.0  # 2^20: integer-exact quantization
# few, fat buckets: map_groups pays per-group pandas overhead, so the
# shuffle groups by a coarse bucket and the per-band-key runs are
# found vectorized (lexsort + run boundaries) inside each group
EMB_LSH_NUM_BUCKETS = 64
_PLANE_CACHE: dict[int, np.ndarray] = {}


def lsh_plane_matrix(dim: int) -> np.ndarray:
    """Deterministic integer hyperplanes: w[p, d] = md5-derived value
    in [-8, 8). Integer weights x integer-quantized vectors make every
    sign bit exact int64 arithmetic — the SQL twin reproduces bucket
    membership bit-for-bit, which float hyperplanes cannot promise."""
    W = _PLANE_CACHE.get(dim)
    if W is None:
        from robosat_ray.functions.text_hash import hash64

        W = np.empty((EMB_LSH_PLANES, dim), dtype=np.int64)
        for p in range(EMB_LSH_PLANES):
            for d in range(dim):
                W[p, d] = hash64(f"lshw-{p}-{d}") % 16 - 8
        _PLANE_CACHE[dim] = W
    return W


def _lsh_band_rows(batch: pa.Table) -> pa.Table:
    """(vec_id, embedding) -> EMB_LSH_BANDS rows keyed by (band index
    in high bits | 16 sign bits). A scaled duplicate flips a plane only
    when |integer dot| < the quantization error bound (~2^-11 relative)
    — pigeonhole: <= EMB_LSH_BANDS-1 flips still share a band."""
    ids, E = _emb_matrix(batch)
    Qv = np.floor(E * EMB_LSH_SCALE).astype(np.int64)
    W = lsh_plane_matrix(E.shape[1])
    bits = (Qv @ W.T > 0).astype(np.uint64)  # (N, P) exact int64 dots
    weights = np.uint64(1) << np.arange(EMB_LSH_BAND_BITS, dtype=np.uint64)
    keys = np.empty((len(ids), EMB_LSH_BANDS), dtype=np.int64)
    for b in range(EMB_LSH_BANDS):
        seg = bits[:, b * EMB_LSH_BAND_BITS:(b + 1) * EMB_LSH_BAND_BITS]
        keys[:, b] = ((np.uint64(b) << np.uint64(EMB_LSH_BAND_BITS))
                      | (seg * weights[None, :]).sum(axis=1)).astype(np.int64)
    flat = keys.reshape(-1)
    return pa.table(
        {
            "vec_id": pa.array(np.repeat(ids, EMB_LSH_BANDS)),
            "band_key": pa.array(flat),
            "bucket": pa.array(flat % EMB_LSH_NUM_BUCKETS),
        }
    )


EMB_LSH_RUN_CAP = 200  # mirrored by the oracle's row_number QUALIFY


def _lsh_bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """All (a < b) pairs sharing an exact band_key inside one bucket,
    fully vectorized: lexsort by (band_key, vec_id), run boundaries by
    diff, per-run triu pairing. A pathological band key (many
    identical/near-zero vectors) is truncated to its EMB_LSH_RUN_CAP
    smallest vec_ids before pairing — bounds any single task at cap²
    pairs, and the SQL twin applies the identical deterministic
    truncation so parity survives."""
    keys = group["band_key"].to_numpy()
    ids = group["vec_id"].to_numpy()
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(keys))[0] + 1, [len(keys)]])
    out_a, out_b = [], []
    for s, e in zip(starts[:-1], starts[1:]):
        if e - s < 2:
            continue
        run = np.unique(ids[s:e])[:EMB_LSH_RUN_CAP]
        if len(run) < 2:
            continue
        ii, jj = np.triu_indices(len(run), 1)
        out_a.append(run[ii])
        out_b.append(run[jj])
    if not out_a:
        return pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
        )
    return pd.DataFrame(
        {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
    )


class LSHVerify:
    """Broadcast corpus lookup + exact cosine threshold on candidate
    pairs (the CosineDupPairs kernel narrowed to LSH candidates). Used
    below EMB_VERIFY_BROADCAST_CAP corpus rows; above it
    emb_dup_pairs_lsh switches to the vec_id co-partition verify
    (_verify_pairs_copartition), which never materializes the
    embedding matrix anywhere."""

    def __init__(self, ref, threshold: float):
        import ray

        ids, En = ray.get(ref)
        self.ids = ids
        self.En = En
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        ia = np.searchsorted(self.ids, a)
        ib = np.searchsorted(self.ids, b)
        sims = np.einsum("ij,ij->i", self.En[ia], self.En[ib])
        keep = sims >= self.threshold
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})


# corpus rows above which the LSH verify abandons the broadcast
# embedding matrix (at 10^9 x 64-d float64 that broadcast is ~512 GB)
# for the vec_id co-partition join — the same strategy switch
# neardup.near_dup_pairs_ds applies at BROADCAST_PAIR_CAP
EMB_VERIFY_BROADCAST_CAP = 2_000_000
_EMB_JOIN_BUCKETS = 64


def _attach_embs(group: pd.DataFrame) -> pd.DataFrame:
    """Within one vec_id-hash bucket: rows are either normalized-
    embedding carriers (role == 0) or pair-need rows (role == 1); emit
    each pair-need row with its vector attached (sorted-carrier
    searchsorted gather), keyed for the pair-bucket regroup. Mirror of
    neardup._attach_hashes with a fixed-width float payload."""
    from robosat_ray.functions.hashing import hash_bucket2

    is_carrier = group["role"].to_numpy() == 0
    car = group[is_carrier]
    car_ids = car["vec_id"].to_numpy()
    order = np.argsort(car_ids, kind="stable")
    car_ids = car_ids[order]
    car_embs = car["emb"].to_numpy()[order]
    pr = group[~is_carrier]
    a = pr["a"].to_numpy()
    b = pr["b"].to_numpy()
    need = pr["vec_id"].to_numpy()
    pos = np.searchsorted(car_ids, need)
    assert len(need) == 0 or (
        len(car_ids) > 0
        and (car_ids[np.clip(pos, 0, len(car_ids) - 1)] == need).all()
    ), "pair-need vec_id missing its embedding-carrier row"
    return pd.DataFrame(
        {
            "a": a,
            "b": b,
            "emb": car_embs[pos] if len(need) else car_embs[:0],
            "pbucket": hash_bucket2(a, b, _EMB_JOIN_BUCKETS),
        }
    )


def _verify_cosine_group(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Within one pair bucket: each (a, b) has exactly two rows (the a
    side's vector and the b side's); exact cosine (same einsum as the
    broadcast LSHVerify) decides."""
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
    E = np.vstack([np.asarray(e, np.float64) for e in group["emb"].to_numpy()[order]])
    sims = np.einsum("ij,ij->i", E[0::2], E[1::2])
    keep = sims >= threshold
    return pd.DataFrame(
        {"a": a[0::2][keep].astype(np.int64), "b": b[0::2][keep].astype(np.int64)}
    )


def _verify_pairs_copartition(pairs_ds, emb_ds, threshold: float):
    """Exact-cosine verify with NO broadcast matrix: normalized
    vectors co-partition with the candidate pairs on a vec_id hash
    bucket (one shuffle), then pairs regroup on a pair bucket for the
    two-sided cosine — the 10^9-vector path (the embedding column
    never leaves the distributed plane)."""
    from robosat_ray.functions.hashing import hash_bucket

    dim_list = pa.list_(pa.float64())

    def carrier_rows(batch: pa.Table) -> pa.Table:
        ids, E = _emb_matrix(batch)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        n = len(ids)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "a": pa.array(np.zeros(n, np.int64)),
                "b": pa.array(np.zeros(n, np.int64)),
                "emb": pa.array(list(En), dim_list),
                "role": pa.array(np.zeros(n, np.int8)),
                "dbucket": pa.array(hash_bucket(ids, _EMB_JOIN_BUCKETS)),
            }
        )

    def need_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        vec = np.concatenate([a, b])
        n = len(vec)
        return pa.table(
            {
                "vec_id": pa.array(vec),
                "a": pa.array(np.concatenate([a, a])),
                "b": pa.array(np.concatenate([b, b])),
                "emb": pa.nulls(n, dim_list),
                "role": pa.array(np.ones(n, np.int8)),
                "dbucket": pa.array(hash_bucket(vec, _EMB_JOIN_BUCKETS)),
            }
        )

    both = pairs_ds.map_batches(need_rows, batch_format="pyarrow").union(
        emb_ds.map_batches(carrier_rows, batch_format="pyarrow")
    )
    attached = both.groupby("dbucket").map_groups(_attach_embs, batch_format="pandas")
    return attached.groupby("pbucket").map_groups(
        lambda g: _verify_cosine_group(g, threshold), batch_format="pandas"
    )


def emb_dup_pairs_lsh(
    emb_ds,
    emb_table: pa.Table | None = None,
    threshold: float = C.EMB_DUP_THRESHOLD,
    verify_strategy: str = "auto",
):
    """-> Dataset (a, b): cosine >= threshold pairs found via
    hyperplane-LSH banding (64 integer planes, 4 x 16-bit bands,
    bucketed groupby) + exact-cosine verify. Candidate mining never
    does all-pairs: only exact 16-bit band collisions meet. Pair
    dedup uses the bucketed lexsort idiom (neardup.dedup_pairs_ds) —
    Ray's two-key Aggregate degrades badly at millions of pair rows.

    verify_strategy: 'broadcast' (corpus fits a worker heap: ray.put
    the normalized matrix once, searchsorted lookups per batch),
    'copartition' (10^9-vector path: vec_id co-partition join, no
    broadcast), or 'auto' (by corpus row count vs
    EMB_VERIFY_BROADCAST_CAP; a missing emb_table forces
    copartition). Both paths are bit-equal (tested at 10x corpus)."""
    import ray

    from robosat_ray.stages.neardup import dedup_pairs_ds

    bands = emb_ds.map_batches(_lsh_band_rows, batch_format="pyarrow")
    cand = bands.groupby("bucket").map_groups(_lsh_bucket_pairs, batch_format="pandas")
    pairs = dedup_pairs_ds(cand)

    if verify_strategy == "auto":
        n_vec = emb_table.num_rows if emb_table is not None else None
        verify_strategy = (
            "broadcast"
            if n_vec is not None and n_vec <= EMB_VERIFY_BROADCAST_CAP
            else "copartition"
        )
    if verify_strategy == "copartition":
        return _verify_pairs_copartition(pairs, emb_ds, threshold)

    ids = emb_table.column("vec_id").to_numpy()
    order = np.argsort(ids, kind="stable")
    E = np.array(emb_table.column("embedding").to_pylist(), dtype=np.float64)[order]
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    ref = ray.put((ids[order], En))
    return pairs.map_batches(
        LSHVerify,
        fn_constructor_args=(ref, threshold),
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )


# ---------------- Product quantization (integer lattice) ----------------

# PQ over an integer lattice: embeddings quantize to qv =
# floor((v + 1) * 2^20) (shifted non-negative so numpy // and DuckDB
# // agree — they differ on negatives), per-subspace k-means runs in
# EXACT int64 arithmetic (L2^2 distances, floor-div centroid means),
# and ADC scores are int64 sums — the whole pipeline is order-free
# and bit-exact against the unrolled-Lloyd SQL twin (ANN_PQ), the
# same oracle pattern ANN_IVF uses. Classic PQ (Jegou et al. 2011)
# semantics; the lattice quantization is the determinism device.
PQ_M = 8          # subspaces (EMB_DIM 64 -> 8 dims each)
PQ_K = 16         # centroids per subspace -> 4-bit codes
PQ_ITERS = 8
PQ_SCALE = 1 << 20
PQ_SHIFT = 1.0    # value offset before scaling (keeps the lattice >= 0)


def quantize_lattice(E: np.ndarray) -> np.ndarray:
    """float (n, d) -> L2-NORMALIZE then int64 lattice points (same
    IEEE expressions as the SQL twin: v / sqrt(sum v^2), then
    CAST(FLOOR((vn + 1.0) * 1048576.0) AS BIGINT)). Normalizing first
    makes lattice L2 monotone with cosine, so PQ ranks approximate the
    cosine ANN family. (The norm's float sum order can differ from
    DuckDB's by 1 ulp; a lattice-boundary flip needs the normalized
    value within ~2^-52 of a 2^-20 boundary — odds ~1e-10 per value.)"""
    E = np.asarray(E, np.float64)
    norms = np.sqrt((E * E).sum(axis=1, keepdims=True))
    if not np.all(norms > 0):
        # an all-zero embedding would yield NaN -> floor(NaN) -> an
        # undefined int64 sentinel, silently diverging from the SQL
        # twin (which would error or produce a different row)
        raise ValueError("quantize_lattice: zero-norm embedding row")
    En = E / norms
    return np.floor((En + PQ_SHIFT) * float(PQ_SCALE)).astype(np.int64)


def train_pq_codebooks(sample_q: np.ndarray) -> np.ndarray:
    """(n, EMB_DIM) int64 lattice sample -> (PQ_M, PQ_K, sub) int64
    codebooks. Per subspace: even-spaced init (floor(c*n/k), the
    train_centroids rule), PQ_ITERS Lloyd steps with exact int64 L2^2
    assignment (ties -> lowest cid) and floor-div integer means
    (empty clusters keep their previous centroid)."""
    n, dim = sample_q.shape
    sub = dim // PQ_M
    k = min(PQ_K, n)
    books = np.zeros((PQ_M, k, sub), dtype=np.int64)
    for m in range(PQ_M):
        S = sample_q[:, m * sub : (m + 1) * sub]
        idx = np.floor(np.arange(k) * n / k).astype(np.int64)
        cent = S[idx].copy()
        for _ in range(PQ_ITERS):
            d2 = ((S[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # first min = lowest cid
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = S[mask].sum(axis=0) // int(mask.sum())
        books[m, :k] = cent
    return books


def pq_encode_batch(batch: pa.Table, books: np.ndarray) -> pa.Table:
    """embeddings batch -> (vec_id, pqcode): per-subspace argmin-L2
    code (ties lowest cid), packed 4 bits per subspace into one
    int64."""
    ids, E = _emb_matrix(batch)
    Q = quantize_lattice(E)
    sub = Q.shape[1] // PQ_M
    packed = np.zeros(len(ids), dtype=np.int64)
    for m in range(PQ_M):
        S = Q[:, m * sub : (m + 1) * sub]
        d2 = ((S[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
        codes = np.argmin(d2, axis=1).astype(np.int64)
        packed |= codes << (4 * m)
    return pa.table({"vec_id": pa.array(ids), "pqcode": pa.array(packed)})


class PQTopK:
    """ADC scan: per-query distance tables (int64, (nq, M, K)) built
    once per actor from the broadcast codebooks; per batch the packed
    codes gather-sum to exact int64 approx distances."""

    def __init__(self, qids, Q, books, k: int):
        self.qids = np.asarray(qids, dtype=np.int64)
        self.books = np.asarray(books, dtype=np.int64)
        self.k = k
        Qq = quantize_lattice(np.asarray(Q, np.float64))
        nq = len(self.qids)
        M, K, sub = self.books.shape
        self.tables = np.zeros((nq, M, K), dtype=np.int64)
        for m in range(M):
            qs = Qq[:, m * sub : (m + 1) * sub]
            self.tables[:, m, :] = (
                (qs[:, None, :] - self.books[m][None, :, :]) ** 2
            ).sum(axis=2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        packed = batch.column("pqcode").to_numpy()
        nq = len(self.qids)
        dist = np.zeros((nq, len(ids)), dtype=np.int64)
        for m in range(self.books.shape[0]):
            codes = (packed >> (4 * m)) & 0xF
            dist += self.tables[:, m, codes]
        self_m = ids[None, :] == self.qids[:, None]
        out_q, out_n, out_s = [], [], []
        from robosat_ray.functions.topk import topk_indices

        for qi in range(nq):
            d = dist[qi].copy()
            valid = ~self_m[qi]
            vids = ids[valid]
            dv = d[valid]
            k = min(self.k, len(vids))
            order = topk_indices(dv, vids, k)
            out_q.append(np.full(len(order), self.qids[qi], dtype=np.int64))
            out_n.append(vids[order])
            out_s.append(-dv[order])  # negate: _merge_topk ranks sim DESC
        return pa.table(
            {
                "query_id": np.concatenate(out_q) if out_q else np.array([], np.int64),
                "neighbor_id": np.concatenate(out_n) if out_n else np.array([], np.int64),
                "sim": np.concatenate(out_s) if out_s else np.array([], np.int64),
            }
        )


PQ_RERANK = 100  # ADC shortlist depth fed to the exact re-rank


class PQRerank:
    """Exact-cosine re-rank over the broadcast ADC shortlist: per
    batch, only vectors some query shortlisted pay the full-vector
    cosine (at 10^9 vectors the ADC scan reads 8 bytes/vector and
    this stage touches `rerank` vectors per query — the IVFADC +
    re-rank deployment shape of Jegou et al. 2011)."""

    def __init__(self, qids, Q, cand_ref):
        import ray

        self.qids = np.asarray(qids, dtype=np.int64)
        Qn = np.asarray(Q, dtype=np.float64)
        self.Qn = Qn / np.linalg.norm(Qn, axis=1, keepdims=True)
        self.cand = ray.get(cand_ref) if not isinstance(cand_ref, dict) else cand_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, E = _emb_matrix(batch)
        out_q, out_n, out_s = [], [], []
        En = None
        for qi, qid in enumerate(self.qids):
            want = self.cand.get(int(qid))
            if want is None or not len(want):
                continue
            pos = np.searchsorted(want, ids)
            hit = (pos < len(want)) & (want[np.clip(pos, 0, len(want) - 1)] == ids)
            if not hit.any():
                continue
            if En is None:
                En = E / np.linalg.norm(E, axis=1, keepdims=True)
            sel = np.flatnonzero(hit)
            sims = En[sel] @ self.Qn[qi]
            out_q.append(np.full(len(sel), qid, dtype=np.int64))
            out_n.append(ids[sel])
            out_s.append(sims)
        return pa.table(
            {
                "query_id": np.concatenate(out_q) if out_q else np.array([], np.int64),
                "neighbor_id": np.concatenate(out_n) if out_n else np.array([], np.int64),
                "sim": np.concatenate(out_s) if out_s else np.array([], np.float64),
            }
        )


def ann_pq_topk(emb_ds, qids, Q, books, k: int = C.ANN_K, rerank: int = PQ_RERANK):
    """-> (query_id, neighbor_id, rank): PQ/ADC candidate generation +
    exact-cosine re-rank. Stage 1 scans ONLY the 4-bit codes (8
    bytes/vector instead of 512 — the 64x memory compression that
    makes billion-vector scans feasible) to a per-query ADC shortlist
    of `rerank` ids (bounded by queries x rerank BY CONSTRUCTION, so
    gathering it is a broadcast, not a data gather); stage 2 re-ranks
    the shortlist with exact cosine. Bit-exact SQL twin: oracle.ANN_PQ
    runs the identical integer-ADC shortlist + cosine re-rank."""
    import functools

    import ray

    enc = functools.partial(pq_encode_batch, books=books)
    codes = emb_ds.map_batches(enc, batch_format="pyarrow")
    local = codes.map_batches(
        PQTopK, fn_constructor_args=(qids, Q, books, rerank),
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=1,
    )
    shortlist = (
        local.groupby("query_id")
        .map_groups(lambda g: _merge_topk(g, rerank), batch_format="pandas")
        .to_pandas()
    )
    qs = shortlist["query_id"].to_numpy()
    ns = shortlist["neighbor_id"].to_numpy()
    cand = {int(q): np.sort(ns[qs == q]) for q in np.unique(qs)}
    ref = ray.put(cand)
    local2 = emb_ds.map_batches(
        PQRerank, fn_constructor_args=(qids, Q, ref),
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=1,
    )
    return local2.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pandas"
    )


RNN_STRIDE = 7
RNN_K = 5


def rnn_pairs(emb_sub_ds, qids, Q, k: int = RNN_K):
    """Reciprocal nearest neighbors over the stride-subset universe:
    (a, b) with a < b where each is in the other's cosine top-k — the
    mutual-match criterion used for high-precision record linking /
    near-dup mining (one-directional kNN keeps hub false-positives;
    reciprocity kills them).

    Exact brute baseline on the stride universe (the broadcast query
    matrix is bounded by corpus/RNN_STRIDE — the same documented knob
    as ann_brute_topk; the IVF/LSH stages are the 10^9-vector path).
    The reciprocity check is a groupby on the unordered pair key over
    the (queries x k)-bounded top-k table — no extra pass over the
    corpus."""
    from ray.data.aggregate import Count

    topk = ann_brute_topk(emb_sub_ds, qids, Q, k=k)

    def pair_key(batch: pa.Table) -> pa.Table:
        q = batch.column("query_id").to_numpy()
        n = batch.column("neighbor_id").to_numpy()
        lo = np.minimum(q, n)
        hi = np.maximum(q, n)
        assert len(hi) == 0 or hi.max() < 2_000_000_011, "pair-key range"
        return pa.table(
            {
                "pk": pa.array(lo * 2_000_000_011 + hi),
                "a": pa.array(lo),
                "b": pa.array(hi),
                # exactly one of a mutual pair's two directed rows has
                # query < neighbor — that row is the single emitter
                "fwd": pa.array((q < n).astype(np.int64)),
            }
        )

    keyed = topk.map_batches(pair_key, batch_format="pyarrow")
    counts = keyed.groupby("pk").aggregate(Count(alias_name="n2"))

    # reciprocal iff both directed edges exist (top-k rows are unique
    # per (query, neighbor), so count == 2 <=> mutual)
    from robosat_ray.stages.join import copartition_join

    hints = {
        "left": {"pk": pa.int64(), "a": pa.int64(), "b": pa.int64(),
                 "fwd": pa.int64()},
        "right": {"pk": pa.int64(), "n2": pa.int64()},
    }
    j = copartition_join(keyed, counts, on="pk", schema_hints=hints)

    def emit(batch: pa.Table) -> pa.Table:
        m = pa.compute.and_(
            pa.compute.equal(batch.column("n2"), 2),
            pa.compute.equal(batch.column("fwd"), 1),
        )
        b2 = batch.filter(m)
        return pa.table({"a": b2.column("a"), "b": b2.column("b")})

    return j.map_batches(emit, batch_format="pyarrow")
