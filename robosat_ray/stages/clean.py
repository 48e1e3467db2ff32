"""End-to-end corpus cleaning — the composition a real training-data
user runs, as ONE streaming pipeline: exact dedup → normalized dedup
→ percentile quality gate. Demonstrates that the engine's cleaning
stages compose without driver-side materialization of the corpus:

  pass 1  one scan of the text computes ALL per-doc keys at once
          (md5, normalized md5, int64 micro alpha-ratio) — the
          operators share the scan instead of re-reading text;
  pass 2  exact-dup groupby keeps min-doc_id per md5 group; because
          exact-group members share the text BYTES, the keeper's
          norm_hash / ratio ride through the aggregate as Min()s
          (all equal within the group) — no join back to the corpus;
  pass 3  normalized-dup groupby over the exact survivors; members
          here may differ in raw bytes (case/whitespace), so the
          keeper's own ratio comes from a doc_id co-partition join
          (survivor set ⋈ keeper set, both corpus-scale — never a
          broadcast);
  pass 4  the quality threshold is the exact distributed q-th
          percentile of the SURVIVORS' ratios (the gate is computed
          on the cleaned pool, mirrored in the oracle), then one
          streaming filter.

Output: (doc_id, n_exact, n_norm, ratio_micro) for every surviving
document. Every step is algebraic (groupby aggregates, one bucketed
join, scalar threshold broadcast) — scale-safe at 10^12 docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from robosat_ray.stages.text_ops import _md5_hex


def clean_keys_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, text_hash, norm_hash, ratio_micro):
    every cleaning key in one pass over the text. The micro-ratio is
    the identical IEEE expression quality_percentile_filter and the
    SQL twin use; normalization is the normalized_dedup_groups
    expression (lower → collapse \\s+ → trim)."""
    texts = batch.column("text")
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(texts), r"\s+", " "),
        characters=" ",
    )
    n_chars = pc.cast(pc.utf8_length(texts), pa.int64()).to_numpy()
    n_alpha = (
        pc.cast(pc.utf8_length(pc.replace_substring_regex(texts, "[^A-Za-z]", "")), pa.int64())
        .to_numpy()
    )
    micro = np.floor(
        1000000.0 * n_alpha.astype(np.float64) / np.maximum(n_chars, 1).astype(np.float64)
        + 0.5
    ).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text_hash": pa.array(
                [_md5_hex(s) for s in texts.to_pylist()], pa.string()
            ),
            "norm_hash": pa.array([_md5_hex(s) for s in norm.to_pylist()], pa.string()),
            "ratio_micro": pa.array(micro),
        }
    )


def clean_corpus(docs_ds, q_pct: int = 25):
    """-> Dataset (doc_id, n_exact, n_norm, ratio_micro): the docs
    surviving exact dedup, normalized dedup, and the q_pct-percentile
    quality gate, with their duplicate-group sizes."""
    from ray.data.aggregate import Count, Min

    from robosat_ray.stages.join import copartition_join
    from robosat_ray.stages.quantiles import group_quantiles

    keys = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        clean_keys_batch, batch_format="pyarrow"
    )
    # exact-dup keepers; norm_hash/ratio are constant within an exact
    # group (same bytes), so Min() carries the keeper's values
    ex = (
        keys.groupby("text_hash")
        .aggregate(
            Min("doc_id", alias_name="doc_id"),
            Count(alias_name="n_exact"),
            Min("norm_hash", alias_name="norm_hash"),
            Min("ratio_micro", alias_name="ratio_micro"),
        )
        .drop_columns(["text_hash"])
    )
    nx = (
        ex.select_columns(["norm_hash", "doc_id"])
        .groupby("norm_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_norm"))
        .drop_columns(["norm_hash"])
    )
    hints = {
        "left": {"doc_id": pa.int64(), "n_exact": pa.int64(), "ratio_micro": pa.int64()},
        "right": {"doc_id": pa.int64(), "n_norm": pa.int64()},
    }
    kept = copartition_join(
        ex.drop_columns(["norm_hash"]),
        nx,
        on="doc_id",
        how="inner",
        schema_hints=hints,
    )

    # exact percentile of the survivors' ratios: the survivor table is
    # (4 int64 cols)/doc — materialized once because the quantile
    # machinery + final filter make 4 passes, and re-running the
    # upstream dedup per pass would re-scan the raw text each time
    def with_g(batch: pa.Table) -> pa.Table:
        return batch.append_column("_g", pa.array(np.zeros(len(batch), np.int64)))

    kept = kept.map_batches(with_g, batch_format="pyarrow").materialize()
    thr_df = group_quantiles(kept, "_g", "ratio_micro", qs=(q_pct,)).to_pandas()
    threshold = int(thr_df["value"].iloc[0])

    def gate(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch.column("ratio_micro"), pa.scalar(threshold))
        return batch.filter(m).select(["doc_id", "n_exact", "n_norm", "ratio_micro"])

    return kept.map_batches(gate, batch_format="pyarrow")
