"""Text quality scoring + language-ID heuristics over `documents`
(training-data-pipeline ops; no robosat counterpart).

Quality features are exact integer/IEEE math mirrored by the SQL
oracle (alpha ratio, token stats). Language-ID is a stopword-profile
heuristic, mirrored exactly by the LANGID SQL oracle (regexp word
extraction + profile join + unique-argmax); accuracy additionally
asserted in tests on constructed samples.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ALPHA = re.compile(r"[A-Za-z]")

# tiny stopword profiles (public common-word lists)
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "von"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "pour", "que", "dans"},
    "es": {"el", "la", "que", "de", "los", "es", "una", "por", "con", "para"},
}
_LANGS = sorted(LANG_PROFILES)


def quality_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> quality features. All vectorized Arrow kernels
    so the oracle SQL computes bit-identical doubles."""
    texts = batch.column("text")
    n_chars = pc.utf8_length(texts)
    alpha_only = pc.replace_substring_regex(texts, "[^A-Za-z]", "")
    n_alpha = pc.utf8_length(alpha_only)
    toks = pc.extract_regex  # noqa: F841  (regex token count below)
    n_tokens = pc.list_value_length(pc.split_pattern_regex(texts, "[ ]+"))
    alpha_ratio = pc.divide(
        pc.cast(n_alpha, pa.float64()), pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
    )
    avg_token_len = pc.divide(
        pc.cast(n_chars, pa.float64()), pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64())
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_alpha": pc.cast(n_alpha, pa.int64()),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "alpha_ratio": alpha_ratio,
            "avg_token_len": avg_token_len,
        }
    )


def quality_scores(docs_ds):
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow"
    )


class LangId:
    """Stateful stage (actor pool): sorted stopword profiles built once
    per actor (__init__), scoring per batch. Prediction = unique argmax
    stopword-hit count (ties or zero hits -> 'und'); stop_ratio =
    max hits / word count.

    Fully vectorized: one RE2 split on the complement of the word
    class (identical word set to findall('[a-zäöüéèêàçñ]+')), one
    factorize for word codes, then per-language np.isin over the
    BATCH-UNIQUE words only + bincount per doc — no per-token Python
    (the same factorize pattern doc_rarity/repetition_batch use)."""

    def __init__(self):
        self.profiles = [
            np.sort(np.asarray(sorted(LANG_PROFILES[lang]), dtype=object))
            for lang in _LANGS
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        n = len(batch)
        lower = pc.utf8_lower(batch.column("text"))
        lists = pc.split_pattern_regex(lower, "[^a-zäöüéèêàçñ]+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        parents = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(lists.values.to_pandas(), sort=False)
        uniq = np.asarray(uniq, dtype=object)
        nonempty = uniq != ""  # split emits "" at word-class boundaries
        word_rows = nonempty[codes]
        n_words = np.bincount(parents[word_rows], minlength=n).astype(np.int64)

        hits = np.zeros((len(_LANGS), n), dtype=np.int64)
        for li, prof in enumerate(self.profiles):
            member = np.isin(uniq, prof)
            rows = member[codes]
            if rows.any():
                hits[li] = np.bincount(parents[rows], minlength=n)
        mx = hits.max(axis=0)
        n_at_max = (hits == mx[None, :]).sum(axis=0)
        best_idx = np.argmax(hits == mx[None, :], axis=0)  # first (lex-min) winner
        langs_arr = np.asarray(_LANGS, dtype=object)
        preds = np.where(
            (mx > 0) & (n_at_max == 1) & (n_words > 0), langs_arr[best_idx], "und"
        )
        scores = np.where(n_words > 0, mx / np.maximum(n_words, 1), 0.0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(preds, pa.string()),
                "stop_ratio": pa.array(scores, pa.float64()),
            }
        )


def langid(docs_ds, concurrency=(1, 4)):
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )


def quality_percentile_filter(docs_ds, q_pct: int = 25):
    """Keep documents whose alpha ratio is at or above the corpus'
    q_pct-th percentile (the percentile-gated quality filter of LLM
    data pipelines). Composition of quality_batch and the exact
    two-pass quantile machinery: the ratio is quantized to an int64
    micro-ratio with the identical IEEE expression the SQL twin uses,
    the global threshold comes from stages/quantiles.group_quantiles
    over ONE constant group (a scalar result — materializing it is the
    broadcast, not a gather), and the filter is a second pass over
    the materialized ratio table. -> (doc_id, ratio_micro)."""
    from robosat_ray.stages.quantiles import group_quantiles

    def ratio_rows(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        n_alpha = q.column("n_alpha").to_numpy().astype(np.float64)
        n_chars = np.maximum(q.column("n_chars").to_numpy(), 1).astype(np.float64)
        micro = np.floor(1000000.0 * n_alpha / n_chars + 0.5).astype(np.int64)
        return pa.table(
            {
                "doc_id": q.column("doc_id"),
                "ratio_micro": pa.array(micro),
                "_g": pa.array(np.zeros(len(micro), np.int64)),
            }
        )

    # materialize ONCE: group_quantiles consumes the dataset three
    # times (min/max, histogram, resolve) and the final filter a
    # fourth — without this, each pass re-runs the regex-heavy scan
    # over the raw text; the (doc_id, ratio_micro) table is tiny
    ratios = docs_ds.map_batches(ratio_rows, batch_format="pyarrow").materialize()
    thr_df = group_quantiles(ratios, "_g", "ratio_micro", qs=(q_pct,)).to_pandas()
    threshold = int(thr_df["value"].iloc[0])

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch.column("ratio_micro"), pa.scalar(threshold))
        return batch.filter(m).select(["doc_id", "ratio_micro"])

    return ratios.map_batches(keep, batch_format="pyarrow")


def repetition_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> Gopher-style repetition signals, all integer
    and exactly mirrored by the REP_SIGNALS SQL oracle: token counts,
    distinct tokens, the modal token's count, duplicate token-trigram
    count, and parts-per-million ratios computed with int64 floor
    division (so parity cannot hinge on float rounding).

    Vectorized: one literal-space split (identical semantics to
    DuckDB's string_split(text, ' '), including empty tokens), one
    factorize for token codes, then bincount/reduceat group math —
    no per-row Python."""
    import pandas as pd

    ids = batch.column("doc_id")
    n = len(batch)
    lists = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
    codes, uniques = pd.factorize(flat.to_pandas(), sort=False)
    codes = codes.astype(np.int64)
    k = max(len(uniques), 1)

    n_tokens = np.bincount(parents, minlength=n).astype(np.int64)

    # per-(doc, token) counts via one unique over the combined key
    key = parents * k + codes
    ukey, ucounts = np.unique(key, return_counts=True)
    updoc = ukey // k
    distinct_tokens = np.bincount(updoc, minlength=n).astype(np.int64)
    top_token_n = np.zeros(n, dtype=np.int64)
    if len(ukey):
        starts = np.r_[0, np.flatnonzero(np.diff(updoc)) + 1]
        top_token_n[updoc[starts]] = np.maximum.reduceat(ucounts, starts)

    # token trigrams: rows (doc, c0, c1, c2); parents is nondecreasing
    # so parent[i] == parent[i+2] implies all three share a doc
    dup_trigrams = np.zeros(n, dtype=np.int64)
    n_tri = np.zeros(n, dtype=np.int64)
    if len(parents) >= 3:
        valid = parents[:-2] == parents[2:]
        if valid.any():
            tp = parents[:-2][valid]
            rows = np.empty((int(valid.sum()), 4), dtype=np.int64)
            rows[:, 0] = tp
            rows[:, 1] = codes[:-2][valid]
            rows[:, 2] = codes[1:-1][valid]
            rows[:, 3] = codes[2:][valid]
            v = np.ascontiguousarray(rows).view(
                np.dtype((np.void, rows.dtype.itemsize * 4))
            ).ravel()
            uv = np.unique(v)
            udoc = np.frombuffer(uv.tobytes(), dtype=np.int64).reshape(-1, 4)[:, 0]
            n_tri = np.bincount(tp, minlength=n).astype(np.int64)
            dup_trigrams = n_tri - np.bincount(udoc, minlength=n).astype(np.int64)

    safe_tok = np.maximum(n_tokens, 1)
    safe_tri = np.maximum(n_tri, 1)
    return pa.table(
        {
            "doc_id": ids,
            "n_tokens": pa.array(n_tokens),
            "distinct_tokens": pa.array(distinct_tokens),
            "top_token_n": pa.array(top_token_n),
            "dup_trigrams": pa.array(dup_trigrams),
            "top_token_ppm": pa.array(top_token_n * 1_000_000 // safe_tok),
            "distinct_ppm": pa.array(distinct_tokens * 1_000_000 // safe_tok),
            "dup_trigram_ppm": pa.array(dup_trigrams * 1_000_000 // safe_tri),
        }
    )


def repetition_signals(docs_ds):
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        repetition_batch, batch_format="pyarrow"
    )
