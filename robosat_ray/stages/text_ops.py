"""Text-analysis and dedup stages over the `documents` table — the
training-data-pipeline operators the engine adds beyond the reference
(exact dedup, token stats; minhash/simhash live in functions/ and are
wired in later stages). All vectorized or per-row-cheap map_batches.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")  # mirrored by the oracle's regexp_extract_all


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def add_text_hash(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return batch.append_column(
        "text_hash", pa.array([_md5_hex(t) for t in texts], type=pa.string())
    )


def exact_dedup_groups(documents_ds):
    """md5(text) -> (text_hash, keep_id = min doc_id, n_dups). The
    classic exact-dedup shape: hash in map_batches, then an algebraic
    groupby aggregate (no group materialization)."""
    from ray.data.aggregate import Count, Min

    hashed = documents_ds.select_columns(["doc_id", "text"]).map_batches(
        add_text_hash, batch_format="pyarrow"
    )
    return (
        hashed.select_columns(["text_hash", "doc_id"])
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups"))
    )


def token_stats_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    n_tok = np.fromiter(
        (len(_TOKEN_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )
    n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok),
            "n_chars": pa.array(n_chars),
        }
    )


def token_counts(documents_ds):
    """Per-doc token + char counts (whitespace/alnum tokenizer)."""
    return documents_ds.select_columns(["doc_id", "text"]).map_batches(
        token_stats_batch, batch_format="pyarrow"
    )


# Manber-style mod-p document fingerprints (the classic `sif` scheme):
# Rabin-Karp polynomial hash over every k-char gram, keep hashes
# ≡ 0 (mod p). Position-independent fingerprint SET per doc — shared
# fingerprints between docs indicate copied substrings.
FP_K = 8
FP_B = 128
FP_M = 2**31 - 1
FP_P = 16
_FP_POW = np.array([pow(FP_B, FP_K - 1 - j, FP_M) for j in range(FP_K)], dtype=np.int64)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Vectorized per doc: code points -> sliding k-gram windows ->
    (windows @ powvec) mod M -> mod-p selection -> unique set. Code
    points (not utf-8 bytes) so the SQL oracle's ord(substr(..)) is
    the identical value; max term 0x10FFFF * 2^31 * k fits int64."""
    from numpy.lib.stride_tricks import sliding_window_view

    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").to_numpy()
    out_ids, out_fps = [], []
    for did, t in zip(ids, texts):
        if len(t) < FP_K:
            continue
        cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        h = (sliding_window_view(cps, FP_K) @ _FP_POW) % FP_M
        sel = np.unique(h[h % FP_P == 0])
        out_ids.append(np.full(len(sel), did, dtype=np.int64))
        out_fps.append(sel)
    return pa.table(
        {
            "doc_id": pa.array(
                np.concatenate(out_ids) if out_ids else np.array([], np.int64)
            ),
            "fp": pa.array(
                np.concatenate(out_fps) if out_fps else np.array([], np.int64)
            ),
        }
    )


def doc_fingerprints(documents_ds):
    """-> DISTINCT (doc_id, fp): the document's rolling-hash
    fingerprint set. Per-doc uniqueness happens in the batch kernel;
    no global dedup needed (fps are emitted once per doc by
    construction)."""
    return documents_ds.select_columns(["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )


def token_partial_counts(batch: pa.Table) -> pa.Table:
    """One (token, n) row per DISTINCT token in the batch — the
    in-batch combiner that bounds the heavy-hitter shuffle by
    vocabulary x blocks instead of total token count."""
    texts = batch.column("text").to_pylist()
    toks: list[str] = []
    for t in texts:
        toks.extend(_TOKEN_RE.findall(t))
    if not toks:
        return pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    # fixed-width unicode so np.unique sorts at C speed (tokens are
    # short; object-dtype unique falls back to Python comparisons)
    uniq, counts = np.unique(np.asarray(toks, dtype="U"), return_counts=True)
    return pa.table(
        {"token": pa.array(list(uniq), pa.string()), "n": pa.array(counts.astype(np.int64))}
    )


def top_tokens(documents_ds, k: int = 20):
    """-> (token, total, rank): the k most frequent tokens across the
    corpus (heavy hitters / hot-key detection), deterministic tiebreak
    count DESC then token ASC. Partial counts per batch -> one string
    groupby Sum over vocabulary-bounded rows -> tiny top-k."""
    from ray.data.aggregate import Sum

    totals = (
        documents_ds.select_columns(["text"])
        .map_batches(token_partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="total"))
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        t = batch.column("total").to_numpy()
        if len(t) > k:
            # keep EVERY row tied with the block's k-th largest count:
            # a count-only argpartition[:k] would drop arbitrary
            # members of a tie straddling the k-th place, losing
            # tokens the global (count DESC, token ASC) order keeps
            kth = np.partition(t, len(t) - k)[len(t) - k]
            batch = batch.take(pa.array(np.nonzero(t >= kth)[0]))
        return batch

    import pandas as pd  # final k*blocks rows: tiny driver-side pick

    small = totals.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    small = small.sort_values(
        ["total", "token"], ascending=[False, True], kind="stable"
    ).head(k)
    small["rank"] = np.arange(1, len(small) + 1, dtype=np.int64)
    return small.reset_index(drop=True)


CHUNK_W = 64  # tokens per training window
CHUNK_S = 48  # stride (W - S = 16 tokens of overlap)


def chunk_batch(batch: pa.Table, w: int = CHUNK_W, s: int = CHUNK_S) -> pa.Table:
    """(doc_id, text) -> sliding token windows (doc_id, chunk_id,
    chunk, n_tokens): the LLM-pretraining chunking step. Chunk j
    covers tokens [j*s, j*s + w); j runs 0 .. ceil((n-w)/s) (0 when
    n <= w), so every token is covered and consecutive chunks overlap
    by w - s tokens. Chunks are whitespace-joined token windows — the
    SQL twin reproduces them exactly via 1-based inclusive list
    slices. Empty docs emit no chunks."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    out_id, out_j, out_c, out_n = [], [], [], []
    for doc_id, t in zip(ids, texts):
        toks = _TOKEN_RE.findall(t)
        n = len(toks)
        if n == 0:
            continue
        j_max = 0 if n <= w else (n - w + s - 1) // s
        for j in range(j_max + 1):
            piece = toks[j * s : j * s + w]
            out_id.append(doc_id)
            out_j.append(j)
            out_c.append(" ".join(piece))
            out_n.append(len(piece))
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(out_id, np.int64)),
            "chunk_id": pa.array(np.asarray(out_j, np.int64)),
            "chunk": pa.array(out_c, pa.string()),
            "n_tokens": pa.array(np.asarray(out_n, np.int64)),
        }
    )


def chunk_documents(documents_ds, w: int = CHUNK_W, s: int = CHUNK_S):
    """Sliding-window chunking as a pure streaming flat map — output
    rows scale with token count, never held outside one batch."""
    return documents_ds.select_columns(["doc_id", "text"]).map_batches(
        lambda b: chunk_batch(b, w, s), batch_format="pyarrow"
    )


# BPE-ish pretokenizer (GPT-2-style alternation, lookahead-free so
# Python re and RE2 agree; branches are first-char-disjoint so
# leftmost-first vs leftmost-longest cannot diverge either)
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"
_BPE_ALPHA = r" ?[A-Za-z]+"
_BPE_DIGIT = r" ?[0-9]+"
_BPE_OTHER = r" ?[^A-Za-z0-9 ]+"


def bpe_token_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> BPE-ish pretoken counts (full alternation +
    per-class runs). pandas str.count = non-overlapping left-to-right
    matches, the same rule as DuckDB regexp_extract_all length."""
    s = batch.column("text").to_pandas()
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bpe": pa.array(s.str.count(BPE_PATTERN).to_numpy(np.int64)),
            "n_alpha_runs": pa.array(s.str.count(_BPE_ALPHA).to_numpy(np.int64)),
            "n_digit_runs": pa.array(s.str.count(_BPE_DIGIT).to_numpy(np.int64)),
            "n_punct_runs": pa.array(s.str.count(_BPE_OTHER).to_numpy(np.int64)),
        }
    )


def bpe_token_counts(documents_ds):
    return documents_ds.select_columns(["doc_id", "text"]).map_batches(
        bpe_token_batch, batch_format="pyarrow"
    )


# Feature-hashing width for doc_rarity's vocabulary: the idf map is a
# dense int64 array of exactly this many slots (2 MiB broadcast)
# REGARDLESS of corpus vocabulary — web-scale token sets (urls, hex
# ids, typos) are unbounded, so the map must be capped by
# construction, not by assumption. Hash = md5 low-8-bytes
# little-endian (functions/text_hash.hash64), the same stable
# convention the SimHash oracle already mirrors via md5_number.
N_RARITY_BUCKETS = 1 << 18


def _token_buckets(uniq: np.ndarray) -> np.ndarray:
    """md5-bucket for each batch-unique token (cached per worker)."""
    from robosat_ray.functions.text_hash import _token_hash

    return np.fromiter(
        (_token_hash(t) % N_RARITY_BUCKETS for t in uniq),
        dtype=np.int64,
        count=len(uniq),
    )


def doc_rarity(documents_ds):
    """TF-IDF-style two-phase corpus op, integer-exact end to end:
    phase 1 aggregates global document frequency per HASHED token
    bucket (in-batch (doc, bucket) dedup first, so the shuffle rows
    are bounded by buckets x blocks, never the raw vocabulary);
    phase 2 broadcasts the dense bucket->idf array once via ray.put
    and scores every document in-batch with factorize + gather — no
    second shuffle. idf_milli = (1000 * N_docs) // df avoids
    logarithms so the SQL twin is bit-exact; df is per BUCKET, the
    standard feature-hashing trade (rare tokens sharing a bucket
    share an idf) that keeps the broadcast capped by construction."""
    import ray
    from ray.data.aggregate import Count

    docs = documents_ds.select_columns(["doc_id", "text"])
    n_docs = docs.count()

    def bucket_rows(batch: pa.Table) -> pa.Table:
        lists = pa.compute.split_pattern(batch.column("text"), " ")
        lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        parents = pa.compute.list_parent_indices(lists).to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(lists.values.to_pandas(), sort=False)
        bkt = _token_buckets(np.asarray(uniq, dtype=object))
        # distinct (doc, bucket): docs are whole within a batch, so
        # in-batch dedup IS global dedup
        key = parents * np.int64(N_RARITY_BUCKETS) + bkt[codes]
        ub = np.unique(key) % N_RARITY_BUCKETS
        return pa.table({"bucket": pa.array(ub.astype(np.int64))})

    df_tab = (
        docs.map_batches(bucket_rows, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="df"))
    ).to_pandas()
    idf_dense = np.zeros(N_RARITY_BUCKETS, dtype=np.int64)
    bs = df_tab["bucket"].to_numpy(dtype=np.int64)
    idf_dense[bs] = 1000 * n_docs // df_tab["df"].to_numpy(dtype=np.int64)
    ref = ray.put(idf_dense)

    def score(batch: pa.Table, _ref=ref) -> pa.Table:
        idf_vals = ray.get(_ref)
        lists = pa.compute.split_pattern(batch.column("text"), " ")
        lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        parents = pa.compute.list_parent_indices(lists).to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(lists.values.to_pandas(), sort=False)
        n = len(batch)
        k = max(len(uniq), 1)
        ukey = np.unique(parents * k + codes.astype(np.int64))
        updoc = ukey // k
        ucode = ukey % k
        bkt = _token_buckets(np.asarray(uniq, dtype=object))
        vals = idf_vals[bkt[ucode]]  # every scored bucket has df >= 1
        n_distinct = np.bincount(updoc, minlength=n).astype(np.int64)
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, updoc, vals)
        safe = np.maximum(n_distinct, 1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "distinct_tokens": pa.array(n_distinct),
                "rarity_milli": pa.array(s // safe),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


# Count-Min sketch shape (Cormode & Muthukrishnan 2005): 4 salted
# hash rows x 8192 counters = a fixed 256 KiB sketch regardless of
# vocabulary — the mergeable frequency sketch next to HLL.
CMS_DEPTH = 4
CMS_WIDTH = 8192


def cms_partial(batch: pa.Table) -> pa.Table:
    """One batch -> the NONZERO cells of its partial Count-Min sketch
    (cell = d * CMS_WIDTH + w, pn = counter value). Tokens factorize
    once per batch; each depth hashes the UNIQUE tokens with an
    md5-salted key (the house md5-low-8-LE convention, cached per
    worker) and np.add.at folds the counts — per-batch output is
    bounded by depth x width, never vocabulary."""
    from robosat_ray.functions.text_hash import _token_hash

    t = token_partial_counts(batch)
    uniq = t.column("token").to_pylist()
    counts = t.column("n").to_numpy()
    cells, vals = [], []
    for d in range(CMS_DEPTH):
        cols = np.fromiter(
            (_token_hash(f"cms{d}-{u}") % CMS_WIDTH for u in uniq),
            dtype=np.int64,
            count=len(uniq),
        )
        row = np.zeros(CMS_WIDTH, dtype=np.int64)
        np.add.at(row, cols, counts)
        nz = np.flatnonzero(row)
        cells.append(d * CMS_WIDTH + nz)
        vals.append(row[nz])
    return pa.table(
        {
            "cell": pa.array(np.concatenate(cells) if cells else np.empty(0, np.int64)),
            "pn": pa.array(np.concatenate(vals) if vals else np.empty(0, np.int64)),
        }
    )


def cms_sketch(documents_ds):
    """-> Dataset (d, w, total): the nonzero cells of a Count-Min
    sketch over corpus token frequencies. Pure algebraic aggregate —
    per-batch partial sketches (bounded depth x width rows) merge by
    cell-wise SUM in one groupby; point estimates are
    min_d(sketch[d][h_d(token)]) with the classic eps = e/width
    overcount bound. Deterministic md5-salted hashes make the whole
    sketch exactly SQL-expressible (oracle CMS_SKETCH)."""
    from ray.data.aggregate import Sum

    cells = (
        documents_ds.select_columns(["text"])
        .map_batches(cms_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("pn", alias_name="total"))
    )

    def unpack(batch: pa.Table) -> pa.Table:
        c = batch.column("cell").to_numpy()
        return pa.table(
            {
                "d": pa.array(c // CMS_WIDTH),
                "w": pa.array(c % CMS_WIDTH),
                "total": batch.column("total"),
            }
        )

    return cells.map_batches(unpack, batch_format="pyarrow")


def normalized_dedup_groups(documents_ds):
    """Case/whitespace-normalized exact dedup — the standard web-text
    pre-dedup that catches re-crawls differing only in casing or
    whitespace: key = md5 of lower(text) with whitespace runs
    collapsed to single spaces and ends trimmed (Arrow utf8_lower +
    RE2 replace, C-speed), then the same algebraic Min/Count groupby
    as exact_dedup_groups. -> (norm_hash, keep_id, n_dups). Mirrored
    exactly by the NORMALIZED_DEDUP oracle (DuckDB lower /
    regexp_replace('\\s+') / trim compute the identical key)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    def norm_hash(batch: pa.Table) -> pa.Table:
        t = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(batch.column("text")), r"\s+", " "
            ),
            characters=" ",
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "norm_hash": pa.array(
                    [_md5_hex(s) for s in t.to_pylist()], type=pa.string()
                ),
            }
        )

    return (
        documents_ds.select_columns(["doc_id", "text"])
        .map_batches(norm_hash, batch_format="pyarrow")
        .groupby("norm_hash")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups"))
    )


def bigram_partial_counts(batch: pa.Table) -> pa.Table:
    """One (bigram, n) row per DISTINCT adjacent token pair in the
    batch — the in-batch combiner for collocation mining. Bigrams
    never cross document boundaries. Counting is one np.unique over
    fixed-width unicode per batch (the token_partial_counts idiom);
    the only per-doc Python is the findall tokenization it shares
    with every other token stage."""
    texts = batch.column("text").to_pylist()
    lefts: list[str] = []
    rights: list[str] = []
    for t in texts:
        toks = _TOKEN_RE.findall(t)
        if len(toks) >= 2:
            lefts.extend(toks[:-1])
            rights.extend(toks[1:])
    if not lefts:
        return pa.table(
            {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    la = np.asarray(lefts, dtype="U")
    ra = np.asarray(rights, dtype="U")
    big = np.char.add(np.char.add(la, " "), ra)
    uniq, counts = np.unique(big, return_counts=True)
    return pa.table(
        {
            "bigram": pa.array(list(uniq), pa.string()),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def top_bigrams(documents_ds, k: int = 25):
    """-> (bigram, total, rank): the k most frequent adjacent token
    pairs (collocations — the classic phrase-mining first pass),
    deterministic tiebreak count DESC then bigram ASC. Same algebraic
    shape as top_tokens: vocabulary²-bounded partials -> one string
    groupby Sum -> tie-preserving per-block top-k -> tiny driver
    pick."""
    from ray.data.aggregate import Sum

    totals = (
        documents_ds.select_columns(["text"])
        .map_batches(bigram_partial_counts, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="total"))
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        t = batch.column("total").to_numpy()
        if len(t) > k:
            kth = np.partition(t, len(t) - k)[len(t) - k]
            batch = batch.take(pa.array(np.nonzero(t >= kth)[0]))
        return batch

    small = totals.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    small = small.sort_values(
        ["total", "bigram"], ascending=[False, True], kind="stable"
    ).head(k)
    small["rank"] = np.arange(1, len(small) + 1, dtype=np.int64)
    return small.reset_index(drop=True)


# Inverted-index posting-list head length: the engine publishes the
# first POSTING_K doc_ids (ascending) per token plus the exact df.
# Capping the published list — NOT the df count — is what keeps the
# output bounded by vocabulary x K at any corpus size; a full posting
# list for a stopword at web scale is the whole corpus.
POSTING_K = 16


def posting_partials(batch: pa.Table, k: int = POSTING_K) -> pa.Table:
    """One (token, df, head) row per DISTINCT token in the batch:
    df = number of batch docs containing the token, head = comma-
    joined first k of those doc_ids ascending. Each document lives in
    exactly one batch row, so batch-level (token, doc) dedup IS the
    global dedup and the partials are algebraic (df sums; heads merge
    by sorted-list union). One lexsort over the batch's (token, doc)
    pairs — no per-token Python loops."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    toks: list[str] = []
    doc_of: list[int] = []
    for doc_id, t in zip(ids, texts):
        found = _TOKEN_RE.findall(t)
        toks.extend(found)
        doc_of.extend([doc_id] * len(found))
    empty = pa.table(
        {
            "token": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "head": pa.array([], pa.string()),
        }
    )
    if not toks:
        return empty
    tok_arr = np.asarray(toks, dtype="U")
    doc_arr = np.asarray(doc_of, dtype=np.int64)
    codes, uniq_tok = pd.factorize(tok_arr, sort=True)
    # distinct (token, doc) pairs, ordered by (token, doc)
    order = np.lexsort((doc_arr, codes))
    c = codes[order]
    d = doc_arr[order]
    keep = np.ones(len(c), dtype=bool)
    keep[1:] = (c[1:] != c[:-1]) | (d[1:] != d[:-1])
    c = c[keep]
    d = d[keep]
    # per-token df + head-k join via reduceat boundaries
    starts = np.nonzero(np.r_[True, c[1:] != c[:-1]])[0]
    ends = np.r_[starts[1:], len(c)]
    dfs = (ends - starts).astype(np.int64)
    d_str = d.astype("U")
    heads = [",".join(d_str[s : min(s + k, e)]) for s, e in zip(starts, ends)]
    return pa.table(
        {
            "token": pa.array(list(uniq_tok[c[starts]]), pa.string()),
            "df": pa.array(dfs),
            "head": pa.array(heads, pa.string()),
        }
    )


def _merge_posting_group(group: pd.DataFrame, k: int = POSTING_K) -> pd.DataFrame:
    """Combine one token's partials: df sums exactly; the head is the
    first k of the merged sorted doc lists (each partial already
    sorted ascending, doc sets disjoint across batches)."""
    docs = np.sort(
        np.concatenate(
            [
                np.array(h.split(","), dtype=np.int64) if h else np.array([], np.int64)
                for h in group["head"]
            ]
        )
    )[:k]
    return pd.DataFrame(
        {
            "token": [group["token"].iloc[0]],
            "df": [int(group["df"].sum())],
            "head": [",".join(str(x) for x in docs)],
        }
    )


def postings(documents_ds, k: int = POSTING_K):
    """Distributed inverted index -> (token, df, head): exact document
    frequency plus the first k posting doc_ids per token. Partials are
    vocabulary-bounded per batch (never total-token-count rows), the
    groupby is over vocabulary x blocks rows, and each group is at
    most one row per block — stopword skew costs block-count rows,
    not df rows. The published head keeps the OUTPUT bounded by
    vocabulary x k at any corpus size."""
    parts = documents_ds.select_columns(["doc_id", "text"]).map_batches(
        lambda b: posting_partials(b, k), batch_format="pyarrow"
    )
    return parts.groupby("token").map_groups(
        lambda g: _merge_posting_group(g, k), batch_format="pandas"
    )


TRI_TOP_K = 60  # token-graph node budget: edges bounded by K^2 BY CONSTRUCTION


def token_triangles(documents_ds, k: int = TRI_TOP_K):
    """Triangle counts on the token co-occurrence graph: nodes = the
    top-k corpus tokens (count DESC, token ASC — deterministic under
    ties), edges = unordered distinct adjacent-bigram pairs between
    them. -> (token, n_tri) for tokens in >=1 triangle.

    Scale shape: the node set caps the graph BY CONSTRUCTION (<= k^2/2
    edges regardless of corpus size), so edge MINING is the only
    corpus-scale work — bigram partials filtered to the top set inside
    map_batches (vocabulary-bounded rows out) — while the triangle
    enumeration runs on the driver over the bounded adjacency matrix
    (diag(A^3)/2, exact ints)."""
    top = top_tokens(documents_ds, k=k)
    keep = set(top["token"])

    def edge_partials(batch: pa.Table) -> pa.Table:
        t = bigram_partial_counts(batch)
        bi = t.column("bigram").to_pylist()
        a_out, b_out = [], []
        for s in bi:
            w1, w2 = s.split(" ", 1)
            if w1 != w2 and w1 in keep and w2 in keep:
                a, b = (w1, w2) if w1 < w2 else (w2, w1)
                a_out.append(a)
                b_out.append(b)
        return pa.table(
            {"a": pa.array(a_out, pa.string()), "b": pa.array(b_out, pa.string())}
        )

    from ray.data.aggregate import Count

    edges = (
        documents_ds.select_columns(["text"])
        .map_batches(edge_partials, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )  # <= k^2/2 rows by construction
    nodes = sorted(keep)
    idx = {t: i for i, t in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    ai = np.fromiter((idx[x] for x in edges["a"]), np.int64, len(edges))
    bi_ = np.fromiter((idx[x] for x in edges["b"]), np.int64, len(edges))
    A[ai, bi_] = 1
    A[bi_, ai] = 1
    tri_per_node = np.diag(A @ A @ A) // 2
    mask = tri_per_node > 0
    out = pd.DataFrame(
        {
            "token": np.asarray(nodes, dtype=object)[mask],
            "n_tri": tri_per_node[mask],
        }
    ).sort_values("token").reset_index(drop=True)
    return out


# minimum bigram support before a lift score is meaningful (classic
# collocation-mining noise floor; rare pairs get huge lifts by chance)
COLLOC_MIN_COUNT = 5


def colloc_lift(documents_ds, k: int = 25, min_count: int = COLLOC_MIN_COUNT):
    """-> (bigram, total, lift_ppm, rank): the k adjacent token pairs
    most over-represented vs token independence — the PMI-family
    collocation score, kept EXACT by scoring the lift ratio as one
    integer floor division instead of a log:

        lift_ppm = (c_xy * T * T * 10^6) // (N_bi * c_x * c_y)

    (c_xy bigram count, c_x/c_y unigram counts, T total tokens, N_bi
    total bigrams — lift = P(xy) / (P(x) P(y)); PMI = log(lift) is
    monotone in it, so the ranking is PMI's). Python-int numerators on
    the engine side, HUGEINT on the SQL side: bit-identical.

    Scale shape: bigram totals via the vocabulary²-bounded partial
    combiner + ONE string groupby (exactly top_bigrams); unigram
    totals are vocabulary-bounded and broadcast once into the scoring
    map (the doc_rarity idf-broadcast idiom — capped BY CONSTRUCTION);
    min_count prunes the scored table before any per-row work; final
    pick is a tie-preserving per-block top-k then a tiny driver sort.
    Tiebreak lift_ppm DESC, bigram ASC."""
    import ray
    from ray.data.aggregate import Sum

    bi = (
        documents_ds.select_columns(["text"])
        .map_batches(bigram_partial_counts, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="total"))
    )
    uni = (
        documents_ds.select_columns(["text"])
        .map_batches(token_partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="c"))
        .to_pandas()  # vocabulary-bounded by construction
    )
    t_tokens = int(uni["c"].sum())
    counts = dict(zip(uni["token"], (int(v) for v in uni["c"])))
    cref = ray.put((counts, t_tokens))

    # total bigram mass: exact and tiny (sum of the grouped totals).
    # Materialize the vocabulary²-bounded totals ONCE — the same
    # blocks feed the scoring pass below (no recompute).
    bi = bi.materialize()
    n_bi = 0
    for b in bi.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            n_bi += int(np.sum(b.column("total").to_numpy()))

    def score(batch: pa.Table, _c=cref) -> pa.Table:
        cnts, t_tok = ray.get(_c)
        tot = batch.column("total").to_numpy()
        keep = tot >= min_count
        bigrams = batch.column("bigram").to_pylist()
        out_b: list[str] = []
        out_t: list[int] = []
        out_l: list[int] = []
        tt6 = t_tok * t_tok * 1_000_000  # Python int: no overflow
        for i in np.nonzero(keep)[0]:
            bg = bigrams[i]
            l, r = bg.split(" ", 1)
            c_xy = int(tot[i])
            out_b.append(bg)
            out_t.append(c_xy)
            out_l.append(c_xy * tt6 // (n_bi * cnts[l] * cnts[r]))
        return pa.table(
            {
                "bigram": pa.array(out_b, pa.string()),
                "total": pa.array(out_t, pa.int64()),
                "lift_ppm": pa.array(out_l, pa.int64()),
            }
        )

    scored = bi.map_batches(score, batch_format="pyarrow")

    def local_topk(batch: pa.Table) -> pa.Table:
        lv = batch.column("lift_ppm").to_numpy()
        if len(lv) > k:
            kth = np.partition(lv, len(lv) - k)[len(lv) - k]
            batch = batch.take(pa.array(np.nonzero(lv >= kth)[0]))
        return batch

    small = scored.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if small.empty:  # nothing cleared min_count: keep the typed schema
        small = pd.DataFrame(
            {
                "bigram": pd.Series([], dtype=object),
                "total": pd.Series([], dtype=np.int64),
                "lift_ppm": pd.Series([], dtype=np.int64),
            }
        )
    small = small.sort_values(
        ["lift_ppm", "bigram"], ascending=[False, True], kind="stable"
    ).head(k)
    small["rank"] = np.arange(1, len(small) + 1, dtype=np.int64)
    return small.reset_index(drop=True)


def doc_keywords(documents_ds):
    """Per-document keyword extraction: the token with the maximal
    tf * idf_milli score (tie -> lexicographically smallest token) —
    the per-doc argmax companion of doc_rarity, sharing its two-phase
    plan: hashed-bucket df aggregate (shuffle rows bounded by buckets
    x blocks), dense idf broadcast once via ray.put, then an in-batch
    vectorized score + lexsort argmax. Integer-exact (idf_milli =
    (1000 * N) // df; score = tf * idf_milli), so the SQL twin ranks
    bit-identically. -> (doc_id, keyword, tfidf_milli)."""
    import ray
    from ray.data.aggregate import Count

    docs = documents_ds.select_columns(["doc_id", "text"])
    n_docs = docs.count()

    def bucket_rows(batch: pa.Table) -> pa.Table:
        lists = pa.compute.split_pattern(batch.column("text"), " ")
        lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        parents = pa.compute.list_parent_indices(lists).to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(lists.values.to_pandas(), sort=False)
        bkt = _token_buckets(np.asarray(uniq, dtype=object))
        key = parents * np.int64(N_RARITY_BUCKETS) + bkt[codes]
        ub = np.unique(key) % N_RARITY_BUCKETS
        return pa.table({"bucket": pa.array(ub.astype(np.int64))})

    df_tab = (
        docs.map_batches(bucket_rows, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="df"))
    ).to_pandas()
    idf_dense = np.zeros(N_RARITY_BUCKETS, dtype=np.int64)
    bs = df_tab["bucket"].to_numpy(dtype=np.int64)
    idf_dense[bs] = 1000 * n_docs // df_tab["df"].to_numpy(dtype=np.int64)
    ref = ray.put(idf_dense)

    def pick(batch: pa.Table, _ref=ref) -> pa.Table:
        idf_vals = ray.get(_ref)
        lists = pa.compute.split_pattern(batch.column("text"), " ")
        lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        parents = pa.compute.list_parent_indices(lists).to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(lists.values.to_pandas(), sort=False)
        k = max(len(uniq), 1)
        ukey, tf = np.unique(parents * k + codes.astype(np.int64), return_counts=True)
        updoc = ukey // k
        ucode = ukey % k
        bkt = _token_buckets(np.asarray(uniq, dtype=object))
        score = tf.astype(np.int64) * idf_vals[bkt[ucode]]
        toks = np.asarray(uniq, dtype="U")[ucode]
        # per-doc argmax with (score DESC, token ASC) tie-break: one
        # lexsort (last key primary), first row per doc run
        order = np.lexsort((toks, -score, updoc))
        updoc, ucode, score, toks = (
            updoc[order], ucode[order], score[order], toks[order],
        )
        first = np.ones(len(updoc), dtype=bool)
        first[1:] = updoc[1:] != updoc[:-1]
        ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids[updoc[first]]),
                "keyword": pa.array(list(toks[first]), pa.string()),
                "tfidf_milli": pa.array(score[first]),
            }
        )

    return docs.map_batches(pick, batch_format="pyarrow")


CHK_BUCKETS = 64
_MASK63 = (1 << 63) - 1


def table_checksum(docs_ds, n_buckets: int = CHK_BUCKETS):
    """Merkle-style anti-entropy fingerprint: per bucket (doc_id %
    n_buckets), the XOR of 63-bit md5 row hashes of "doc_id|text" plus
    the row count — the order-insensitive, mergeable table-equality
    certificate used to verify replication / resume output at scale
    (same XOR construction as runtime/lineage.batch_checksum, here
    with a bit-exact DuckDB twin via md5_number % 2^63).

    Scale shape: per-batch partials are (bucket, xor, count) — the
    shuffle carries n_buckets rows per block, never documents."""
    import hashlib

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        texts = b.column("text").to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{i}|{t}".encode("utf-8")).digest()[:8],
                    "little",
                )
                & _MASK63
                for i, t in zip(ids, texts)
            ),
            dtype=np.int64,
            count=len(ids),
        )
        bk = (ids % n_buckets).astype(np.int64)
        uk = np.unique(bk)
        xors = np.zeros(len(uk), dtype=np.int64)
        cnts = np.zeros(len(uk), dtype=np.int64)
        pos = np.searchsorted(uk, bk)
        np.bitwise_xor.at(xors, pos, h)
        np.add.at(cnts, pos, 1)
        return pa.table(
            {
                "bucket": pa.array(uk),
                "x": pa.array(xors),
                "c": pa.array(cnts),
            }
        )

    parts = docs_ds.map_batches(partial, batch_format="pyarrow")

    def xor_fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": [int(g["bucket"].iloc[0])],
                "xor63": [int(np.bitwise_xor.reduce(g["x"].to_numpy(np.int64)))],
                "n_rows": [int(g["c"].sum())],
            }
        )

    return parts.groupby("bucket").map_groups(xor_fold, batch_format="pandas")
