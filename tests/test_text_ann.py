"""Text sketches, langid, ANN — property/recall tests (non-SQL ops)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from robosat_ray.functions.text_hash import (
    hamming64,
    jaccard_sorted,
    minhash_signature,
    shingle_hash_set,
    simhash64,
    tokenize,
)


def test_minhash_estimates_jaccard():
    a = shingle_hash_set("the quick brown fox jumps over the lazy dog " * 8)
    b = shingle_hash_set("the quick brown fox jumped over the lazy dog " * 8)
    sa = minhash_signature(a)
    sb = minhash_signature(b)
    est = float(np.mean(sa == sb))
    true = jaccard_sorted(a, b)
    assert abs(est - true) < 0.15


def test_simhash_similar_texts_close():
    t1 = "spark table join merge filter sort window batch stream value " * 5
    t2 = t1.replace("filter", "select", 1)
    t3 = "completely different words entirely unrelated content here now"
    h1, h2, h3 = (simhash64(tokenize(t)) for t in (t1, t2, t3))
    assert hamming64(h1, h2) < 8
    assert hamming64(h1, h3) > 12


def test_langid_on_real_sentences():
    from robosat_ray.stages.quality import LangId

    samples = {
        "en": "the cat sat on the mat and it is happy with the sun",
        "de": "der hund und die katze sind nicht mit der maus im haus",
        "fr": "le chat est dans la maison et les oiseaux sont pour toi",
        "es": "el perro es una mascota que vive con los gatos por la casa",
    }
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(samples)), pa.int64()),
            "text": pa.array(list(samples.values()), pa.string()),
        }
    )
    out = LangId()(batch)
    preds = out.column("pred_lang").to_pylist()
    assert preds == list(samples.keys())


def test_ann_ivf_recall(ray_session):
    import ray.data

    from robosat_ray import constants as C
    from robosat_ray.stages.ann import ann_brute_topk, ann_ivf_topk, train_centroids

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.01"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    E = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    sel = ids % C.ANN_STRIDE == 0
    qids, Q = ids[sel], E[sel]
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = ann_brute_topk(emb, qids, Q).to_pandas()
    cent = train_centroids(E[:400], n_lists=16)
    approx = ann_ivf_topk(emb, qids, Q, cent, nprobe=6).to_pandas()
    # recall@5: fraction of exact neighbors found by IVF
    ex = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.7, recall


def test_ann_ivf_partitioned_prunes_reads_and_matches(ray_session):
    """The persisted IVF index must (a) give results identical to the
    in-memory IVF scan, (b) touch a STRICT subset of the list
    partitions at nprobe=6 of 16 lists."""
    import os

    import ray.data

    from robosat_ray import constants as C
    from robosat_ray.stages.ann import (
        allowed_lists, ann_ivf_partitioned, ann_ivf_topk, train_centroids,
    )
    from robosat_ray.pipelines.queries import ivf_index_dir

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.01"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    E = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    sel = ids % C.ANN_STRIDE == 0
    qids, Q = ids[sel], E[sel]
    cent = train_centroids(E[:400], n_lists=16)
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = ivf_index_dir(sf, force=True)
    n_parts = len([d for d in os.listdir(idx) if d.startswith("list_id=")])

    # a small query set (the per-query serving shape) touches a strict
    # subset of the list partitions
    q3, Q3 = qids[:3], Q[:3]
    lists = allowed_lists(Q3, cent, nprobe=6)
    assert len(lists) < n_parts, (len(lists), n_parts)
    part3 = ann_ivf_partitioned(idx, q3, Q3, cent, nprobe=6).to_pandas()
    mem3 = ann_ivf_topk(emb, q3, Q3, cent, nprobe=6).to_pandas()
    key = lambda df: sorted(map(tuple, df[["query_id", "neighbor_id", "rank"]].to_numpy()))
    assert key(part3) == key(mem3)

    # full query set: identical results through the persisted index
    part = ann_ivf_partitioned(idx, qids, Q, cent, nprobe=6).to_pandas()
    mem = ann_ivf_topk(emb, qids, Q, cent, nprobe=6).to_pandas()
    assert key(part) == key(mem)


def test_near_dup_finds_all_variants(ray_session):
    from robosat_ray.pipelines.queries import q_near_dup
    from robosat_ray.stages.neardup import VARIANT_OFFSET

    pairs = q_near_dup("/root/testdata/sf0.001")
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    # every doc_id % 5 == 0 with enough tokens must pair with its variant
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    for d, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        if d % 5 == 0 and len(txt.split(" ")) >= 13:  # j=(S-1)/(S+1) > 0.5 needs S >= 4; margin
            assert (d, d + VARIANT_OFFSET) in got, d


def test_near_dup_copartition_path_equals_broadcast(ray_session, monkeypatch):
    """Forcing BROADCAST_PAIR_CAP=0 routes the verify through the
    full co-partition join (the 10^12-doc path, no driver gather of
    candidate ids); the verified pair set must be identical."""
    import robosat_ray.stages.neardup as nd
    from robosat_ray.pipelines.queries import q_near_dup

    base = q_near_dup("/root/testdata/sf0.001")
    monkeypatch.setattr(nd, "BROADCAST_PAIR_CAP", 0)
    full = q_near_dup("/root/testdata/sf0.001")
    key = lambda df: sorted(zip(df["a"].astype(int), df["b"].astype(int)))
    assert key(base) == key(full)
    assert len(base) > 0


def test_fingerprints_detect_copied_substring(ray_session):
    """Shared mod-p rolling-hash fingerprints locate copied text: a doc
    containing a long substring of another shares fps with it; an
    unrelated doc shares (essentially) none. Position-independent."""
    import pyarrow as pa
    import ray.data

    from robosat_ray.stages.text_ops import doc_fingerprints

    src = "the quick brown fox jumps over the lazy dog while the band plays on and on " * 6
    copied = "PREFIX padding text here. " + src[40:300] + " SUFFIX trailing."
    other = "completely different content with zero overlap whatsoever in grams " * 7
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([src, copied, other])})
    fps = doc_fingerprints(ray.data.from_arrow(t)).to_pandas()
    by = {d: set(g["fp"]) for d, g in fps.groupby("doc_id")}
    overlap_copy = len(by[1] & by[2])
    overlap_other = len(by[1] & by[3]) if 3 in by else 0
    assert overlap_copy >= 3, (overlap_copy, len(by[1]), len(by[2]))
    assert overlap_other == 0, overlap_other
    # per-doc sets are deduped by construction
    assert len(fps) == len(fps.drop_duplicates())


def test_dup_clusters_transitive_chain(ray_session):
    """A ~ B and B ~ C (but A !~ C) must land in ONE cluster with the
    min doc_id as representative — the property pairwise dedupe lacks
    and connected-components canonicalization exists to provide."""
    import ray.data

    from robosat_ray.stages.neardup import dup_clusters

    base = [f"w{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[:34] + [f"x{i}" for i in range(6)])   # j(a,b) high
    c = " ".join(base[12:34] + [f"x{i}" for i in range(6)] + [f"y{i}" for i in range(8)])
    lone = " ".join(f"z{i}" for i in range(40))
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 20, 30, 99], pa.int64()),
                "text": pa.array([a, b, c, lone]),
            }
        )
    )
    out = dup_clusters(docs, threshold=0.5).to_pandas().set_index("doc_id")
    from robosat_ray.functions.text_hash import jaccard_sorted, shingle_hash_set

    sa, sb, sc = (np.array(sorted(shingle_hash_set(t))) for t in (a, b, c))
    assert jaccard_sorted(sa, sb) >= 0.5 and jaccard_sorted(sb, sc) >= 0.5
    assert jaccard_sorted(sa, sc) < 0.5  # genuinely transitive-only
    assert out.loc[10, "cluster_id"] == 10 and out.loc[10, "keep"] == 1
    assert out.loc[20, "cluster_id"] == 10 and out.loc[20, "keep"] == 0
    assert out.loc[30, "cluster_id"] == 10 and out.loc[30, "keep"] == 0
    assert out.loc[99, "cluster_id"] == 99 and out.loc[99, "cluster_size"] == 1
    assert (out.loc[[10, 20, 30], "cluster_size"] == 3).all()


def test_repetition_batch_vs_bruteforce():
    from collections import Counter

    from robosat_ray.stages.quality import repetition_batch

    rng = np.random.default_rng(7)
    texts = [
        " ".join(rng.choice(["a", "b", "c", "dd", "e"], size=rng.integers(1, 30)))
        for _ in range(60)
    ] + ["solo", "x x", "p q p q p q"]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    out = repetition_batch(t).to_pandas().set_index("doc_id")
    for i, txt in enumerate(texts):
        toks = txt.split(" ")
        cnt = Counter(toks)
        tris = Counter(tuple(toks[j:j + 3]) for j in range(len(toks) - 2))
        n_tri = max(len(toks) - 2, 0)
        dup = n_tri - len(tris)
        assert out.loc[i, "n_tokens"] == len(toks)
        assert out.loc[i, "distinct_tokens"] == len(cnt)
        assert out.loc[i, "top_token_n"] == max(cnt.values())
        assert out.loc[i, "dup_trigrams"] == dup
        assert out.loc[i, "top_token_ppm"] == max(cnt.values()) * 1_000_000 // len(toks)
        assert out.loc[i, "dup_trigram_ppm"] == (
            dup * 1_000_000 // n_tri if n_tri else 0
        )


def test_dup_clusters_distributed_cc_path_equal(ray_session, monkeypatch):
    """Forcing DRIVER_CC_EDGE_CAP=0 routes clustering through the
    distributed label-propagation CC; output must be identical."""
    import ray.data

    import robosat_ray.stages.neardup as nd

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(nd.with_variants_batch, batch_format="pyarrow")
    base = nd.dup_clusters(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(nd, "DRIVER_CC_EDGE_CAP", 0)
    dist = nd.dup_clusters(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(base, dist)
    assert (base["cluster_size"] > 1).any()


def test_emb_dup_lsh_equals_exact(ray_session):
    """LSH-banded near-dup finds exactly the pairs the exact
    threshold join finds on the variants corpus (scaled duplicates
    flip at most quantization-noise sign bits, far under the 3-flip
    pigeonhole budget)."""
    from robosat_ray.pipelines.queries import q_emb_dup, q_emb_dup_lsh

    sf = "/root/testdata/sf0.001"
    exact = q_emb_dup(sf).to_pandas()
    lsh = q_emb_dup_lsh(sf).to_pandas()
    key = lambda df: sorted(zip(df["a"].astype(int), df["b"].astype(int)))
    assert key(lsh) == key(exact)
    assert len(lsh) > 0


def test_bpe_token_batch_vs_re():
    import re

    from robosat_ray.stages.text_ops import BPE_PATTERN, bpe_token_batch

    texts = [
        "hello world",
        "a1b2 c3!  d--e",
        "42 4 2",
        "!!!",
        "  double  spaces  ",
        "mixedCASE tokens, punct; 2026-08-17",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    out = bpe_token_batch(t).to_pandas().set_index("doc_id")
    for i, s in enumerate(texts):
        assert out.loc[i, "n_bpe"] == len(re.findall(BPE_PATTERN, s))
        assert out.loc[i, "n_alpha_runs"] == len(re.findall(r" ?[A-Za-z]+", s))
        assert out.loc[i, "n_punct_runs"] == len(re.findall(r" ?[^A-Za-z0-9 ]+", s))


def test_emb_dup_lsh_pathological_bucket_capped(ray_session):
    """300 identical vectors share every band key; the run cap bounds
    candidate mining at C(200,2) pairs of the smallest vec_ids (the
    oracle applies the identical truncation)."""
    import ray.data

    from robosat_ray.stages.ann import EMB_LSH_RUN_CAP, emb_dup_pairs_lsh

    n = 300
    vec = (np.arange(64, dtype=np.float64) % 7 - 3.0) / 10.0
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(vec)] * n, pa.list_(pa.float64())),
        }
    )
    pairs = emb_dup_pairs_lsh(ray.data.from_arrow(tbl), tbl).to_pandas()
    cap = EMB_LSH_RUN_CAP
    assert len(pairs) == cap * (cap - 1) // 2
    assert pairs["a"].max() < cap and pairs["b"].max() < cap


def test_events_rollup_empty_input(ray_session):
    """SQL ROLLUP on empty input still emits the grand-total grouping
    set: one row (day=-1, '(all)', 0, NULL). The engine must match."""
    import ray.data

    from robosat_ray.stages.events import rollup_day_type

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
            "props": pa.array([], pa.string()),
        }
    )
    out = rollup_day_type(ray.data.from_arrow(empty)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["day"] == -1 and row["event_type"] == "(all)"
    assert row["n_events"] == 0 and pd.isna(row["value_cents"])


def test_batch_kernels_equal_per_doc_references():
    """batch_shingle_sets / batch_minhash_signatures / batch_simhash64
    must be bit-identical to the per-doc kernels on adversarial docs
    (empty, single-token, repeated-token, long)."""
    from robosat_ray.functions.text_hash import (
        batch_minhash_signatures,
        batch_shingle_sets,
        batch_simhash64,
        minhash_signature,
        simhash64,
        tokenize,
    )

    rng = np.random.default_rng(7)
    vocab = ["tok%d" % i for i in range(40)] + ["", "zzvariant"]
    texts = [""]
    for n in (1, 2, 3, 4, 30, 150):
        texts += [" ".join(rng.choice(vocab, n)) for _ in range(4)]
    texts += ["a a a a a", " leading", "trailing ", "mid  gap"]
    flat, off = batch_shingle_sets(texts)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(flat[off[i] : off[i + 1]], shingle_hash_set(t))
    sig = batch_minhash_signatures(texts)
    sh = batch_simhash64(texts)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(sig[i], minhash_signature(shingle_hash_set(t)))
        assert int(sh[i]) == simhash64(tokenize(t))


def test_cms_estimates_upper_bound_and_match_heavy_tokens(ray_session):
    """Count-Min property check on the real corpus: for every token,
    est = min_d sketch[d][h_d(token)] >= true count (no undercount,
    ever), and the top heavy hitters estimate EXACTLY (width >>
    vocabulary here, so collisions are rare)."""
    import ray.data

    from robosat_ray.functions.text_hash import _token_hash
    from robosat_ray.stages.text_ops import (
        CMS_DEPTH,
        CMS_WIDTH,
        _TOKEN_RE,
        cms_sketch,
    )

    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    sk = cms_sketch(docs).to_pandas()
    grid = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    grid[sk["d"].to_numpy(), sk["w"].to_numpy()] = sk["total"].to_numpy()

    import pyarrow.parquet as pq

    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"]).column("text").to_pylist()
    from collections import Counter

    true = Counter()
    for t in texts:
        true.update(_TOKEN_RE.findall(t))
    ests = {
        tok: min(
            grid[d][_token_hash(f"cms{d}-{tok}") % CMS_WIDTH]
            for d in range(CMS_DEPTH)
        )
        for tok in true
    }
    assert all(ests[t] >= c for t, c in true.items())  # never undercounts
    for tok, c in true.most_common(20):
        assert ests[tok] == c, (tok, ests[tok], c)


def test_ann_pq_recall_floor(ray_session):
    """PQ shortlist + exact re-rank must recover most of the exact
    cosine top-k even on this near-orthogonal synthetic corpus
    (measured 0.87; assert a safe floor). Exactness of the
    implementation itself is pinned by the ANN_PQ oracle."""
    from robosat_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    got = QUERIES["ann_pq"](sf).to_pandas()
    exact = QUERIES["ann"](sf).to_pandas()
    g = got.groupby("query_id")["neighbor_id"].apply(set)
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    rec = sum(len(g[q] & e[q]) for q in e.index) / sum(len(e[q]) for q in e.index)
    assert rec >= 0.7, rec


def test_emb_dup_lsh_copartition_equals_broadcast(ray_session):
    """The 10^9-vector verify path (vec_id co-partition join, no
    broadcast embedding matrix) must emit bit-identical pairs to the
    broadcast LSHVerify path on the same corpus."""
    import pyarrow.parquet as pq
    import ray.data

    from robosat_ray.stages.ann import emb_dup_pairs_lsh, with_emb_variants_batch

    sf = "/root/testdata/sf0.001"
    tbl = with_emb_variants_batch(
        pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    )
    base = emb_dup_pairs_lsh(
        ray.data.from_arrow(tbl), tbl, verify_strategy="broadcast"
    ).to_pandas()
    cop = emb_dup_pairs_lsh(
        ray.data.from_arrow(tbl), tbl, verify_strategy="copartition"
    ).to_pandas()
    key = lambda df: sorted(zip(df["a"].astype(int), df["b"].astype(int)))
    assert key(base) == key(cop)
    assert len(base) > 0


def test_pii_scrub_redacts_planted_and_organic():
    """Batch-level invariants of the scrub kernels: every planted
    contact is found (>=1 email + >=1 phone per doc), redaction
    removes every match, and organic PII in the body is caught too."""
    import pyarrow as pa

    from robosat_ray.stages.scrub import (
        EMAIL_TOKEN,
        PHONE_TOKEN,
        plant_contacts_batch,
        scrub_batch,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([7, 42], pa.int64()),
            "text": pa.array(
                ["plain body text", "reach me at alice.b-c@sub.example.co.uk ok"]
            ),
        }
    )
    out = scrub_batch(plant_contacts_batch(docs))
    n_em = out.column("n_emails").to_pylist()
    n_ph = out.column("n_phones").to_pylist()
    assert n_em == [1, 2]  # planted only / planted + organic
    assert n_ph == [1, 1]
    for s in out.column("scrubbed").to_pylist():
        assert "@" not in s and "+1-" not in s
        assert EMAIL_TOKEN in s and PHONE_TOKEN in s
    # planted phone is doc_id % 10000 zero-padded
    assert "user7@" not in out.column("scrubbed").to_pylist()[0]


def test_posting_partials_df_and_head_invariants():
    """df counts distinct docs (not occurrences); head is the first-K
    ascending doc ids; multi-batch merge equals a single-batch run."""
    import pandas as pd
    import pyarrow as pa

    from robosat_ray.stages.text_ops import (
        _merge_posting_group,
        posting_partials,
    )

    b = pa.table(
        {
            "doc_id": pa.array([3, 1, 2], pa.int64()),
            "text": pa.array(["cat cat dog", "cat", "dog emu"]),
        }
    )
    t = posting_partials(b, k=2).to_pandas().set_index("token")
    assert t.loc["cat", "df"] == 2 and t.loc["cat", "head"] == "1,3"
    assert t.loc["dog", "df"] == 2 and t.loc["dog", "head"] == "2,3"
    assert t.loc["emu", "df"] == 1 and t.loc["emu", "head"] == "2"
    # split the same docs across two "batches": merged partials must
    # reproduce the single-batch result (algebraic combine)
    p1 = posting_partials(b.slice(0, 1), k=2).to_pandas()
    p2 = posting_partials(b.slice(1, 2), k=2).to_pandas()
    merged = (
        pd.concat([p1, p2])
        .groupby("token", group_keys=False)[["token", "df", "head"]]
        .apply(lambda g: _merge_posting_group(g, k=2))
        .reset_index(drop=True)
        .set_index("token")
    )
    pd.testing.assert_frame_equal(merged.sort_index(), t.sort_index())


def test_bigram_partials_respect_doc_boundaries():
    import pyarrow as pa

    from robosat_ray.stages.text_ops import bigram_partial_counts

    b = pa.table(
        {"text": pa.array(["a b", "b a b", "c"])}  # 'b a' must not bridge docs
    )
    t = bigram_partial_counts(b).to_pandas().set_index("bigram")["n"].to_dict()
    assert t == {"a b": 2, "b a": 1}


def test_clean_corpus_composition_semantics(ray_session):
    """Crafted corpus: exact dups collapse first, then normalized
    dups collapse among exact keepers, then the percentile gate
    drops low-alpha survivors — and group sizes count the right
    stage's members."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from robosat_ray.stages.clean import clean_corpus

    rows = [
        (1, "Nice Clean Prose"),        # keeper of exact group {1,2}
        (2, "Nice Clean Prose"),        # exact dup of 1
        (3, "nice  clean   prose"),     # normalized dup of 1 (ws+case)
        (4, "totally different text"),  # independent survivor
        (5, "1234 9999 ,,,, !!!!"),     # low alpha ratio -> gated out
        (6, "other words entirely"),    # independent survivor
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
    )
    # 4 survivors: the q=50 pick rule is the 2nd-smallest ratio, so
    # exactly the all-digit doc falls below the gate (at q=25 the
    # ceil rule keeps all 4 — too coarse for this corpus size)
    out = clean_corpus(ds, q_pct=50).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 4, 6]
    by = out.set_index("doc_id")
    assert by.loc[1, "n_exact"] == 2  # {1,2}
    assert by.loc[1, "n_norm"] == 2   # {1, 3} among exact keepers
    assert by.loc[4, "n_exact"] == 1 and by.loc[4, "n_norm"] == 1


def test_token_triangles_known_graph(ray_session):
    """Hand-built corpus: tokens a b c form a triangle (bigrams ab,
    bc, ca), d attaches to a and b only after c->d lacks the closing
    edge... construct exactly: edges ab, bc, ca, ad -> one triangle
    {a,b,c}, d in none."""
    import pyarrow as pa
    import ray.data

    from robosat_ray.stages.text_ops import token_triangles

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["aa bb", "bb cc", "cc aa", "aa dd"]),
            }
        )
    )
    out = token_triangles(docs, k=10).set_index("token")["n_tri"].to_dict()
    assert out == {"aa": 1, "bb": 1, "cc": 1}


def test_delta_dup_cross_side_and_flip(ray_session, monkeypatch):
    """Delta dedup: every pair is cross-side (ref < VARIANT_OFFSET <=
    new), the planted variants are found, and the forced co-partition
    verify path (BROADCAST_PAIR_CAP=0) is bit-equal to broadcast."""
    import pandas as pd

    from robosat_ray.pipelines.queries import _docs_ds
    from robosat_ray.stages import neardup as nd

    sf = "/root/testdata/sf0.001"
    ref = _docs_ds(sf)
    new = _docs_ds(sf).map_batches(nd.delta_shard_batch, batch_format="pyarrow")
    a = nd.delta_dup_pairs_ds(ref, new).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert len(a) > 0
    assert (a["a"] < nd.VARIANT_OFFSET).all()
    assert (a["b"] >= nd.VARIANT_OFFSET).all()
    # the planted (doc, doc + OFFSET) identity pairs dominate
    planted = a[a["b"] - nd.VARIANT_OFFSET == a["a"]]
    assert len(planted) >= 0.5 * len(a["b"].unique())
    monkeypatch.setattr(nd, "BROADCAST_PAIR_CAP", 0)
    b = nd.delta_dup_pairs_ds(ref, new).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a.astype(np.int64), b.astype(np.int64))
