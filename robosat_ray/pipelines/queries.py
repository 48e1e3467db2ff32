"""Driver-facing query registry: each entry is a callable
(sf_dir) -> Dataset, paired 1:1 with an oracle SQL string in
robosat_ray/oracle.py. Used by __ray_entry__.queries().
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from robosat_ray import constants as C
from robosat_ray import oracle
from robosat_ray.pipelines.flagship import flagship, points_dataset
from robosat_ray.stages.cover import cover_tiles
from robosat_ray.stages.extract_text import add_extract_text
from robosat_ray.stages.knn import knn_match
from robosat_ray.stages.text_ops import exact_dedup_groups, token_counts
from robosat_ray.synth.footprints import footprints_dataset
from robosat_ray.synth.pages import page_coords, pages_dataset

# broadcast cap for the customer side of q_local_supplier_revenue —
# module-level so tests can lower it to force the co-partition path
CUSTOMER_BROADCAST_ROWS = 2_000_000


def q_extract_text(sf_dir: str):
    """pages.html -> text, byte-identical per url (BASELINE invariant)."""
    pages = pages_dataset(sf_dir, drop_golden_text=True)
    return add_extract_text(pages).select_columns(["url", "text"])


def q_tile_assign(sf_dir: str):
    return points_dataset(sf_dir).select_columns(
        ["url", "doc_id", "tile_x", "tile_y", "cell"]
    )


def q_cover(sf_dir: str):
    return cover_tiles(footprints_dataset(sf_dir))


def q_spatial_join(sf_dir: str):
    return flagship(sf_dir, through_html=False)


def q_join_agg(sf_dir: str):
    """Grouped aggregate over the join output: hit count and distinct
    doc count per footprint kind (distinct = a second keyed groupby,
    not a driver-side set)."""
    from ray.data.aggregate import Count

    joined = flagship(sf_dir, through_html=False)
    pairs = joined.select_columns(["kind", "doc_id"])
    hits = pairs.groupby("kind").aggregate(Count(alias_name="n_hits"))
    distinct_pairs = pairs.groupby(["kind", "doc_id"]).aggregate(Count(alias_name="_c"))
    docs = distinct_pairs.groupby("kind").aggregate(Count(alias_name="n_docs"))
    import pandas as pd  # small results: merge on the driver

    out = hits.to_pandas().merge(docs.to_pandas(), on="kind")
    return out[["kind", "n_hits", "n_docs"]]


def _query_points(sf_dir: str):
    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]) \
        .column("doc_id").to_numpy()
    qids = ids[ids % C.KNN_STRIDE == 0]
    qx, qy = page_coords(qids)
    return qids, qx, qy


def q_knn(sf_dir: str):
    qids, qx, qy = _query_points(sf_dir)
    return knn_match(points_dataset(sf_dir), qids, qx, qy, k=C.KNN_K)


def q_exact_dedup(sf_dir: str):
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup_groups(docs)


def q_token_count(sf_dir: str):
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return token_counts(docs)


def q_rasterize_fg(sf_dir: str):
    """Rasterize footprints into 64px tile masks; emit per-tile
    foreground pixel counts (the scanline-burn analog of the
    reference's rasterize, checked against a SQL pixel-center oracle)."""
    from robosat_ray.stages.rasterize import rasterize

    masks = rasterize(footprints_dataset(sf_dir), size=64)
    return masks.select_columns(["tile_x", "tile_y", "fg"])


def q_pbf_extract(sf_dir: str):
    """The reference `rs extract` chain through REAL .osm.pbf bytes:
    footprints encoded into a multi-blob PBF file (vectorized varint /
    zigzag / delta / zlib writer), then read back via the distributed
    from-scratch reader (blob-parallel inflate + protobuf parse,
    building/parking tag filters, ref-hash co-partition node join,
    ring assembly). Emits the decoded bboxes on the exact 1e-7-degree
    grid the PBF stores, so the oracle (feet CTE, same quantization)
    gates the whole container round trip bit-exactly."""
    import hashlib
    import os

    from robosat_ray.sources.osm_pbf import extract_pbf, footprints_to_blocks, write_pbf
    from robosat_ray.synth.footprints import footprints_table

    feet = footprints_table(sf_dir)
    tag = hashlib.md5(f"{sf_dir}:{feet.num_rows}".encode()).hexdigest()[:12]
    path = f"/tmp/robosat_ray_pbf/{tag}.osm.pbf"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.part.{os.getpid()}"
        write_pbf(tmp, footprints_to_blocks(feet))
        os.replace(tmp, path)

    ext = extract_pbf(path, kinds=("building", "parking"))

    def quantize(batch):
        import pyarrow as pa

        q = lambda c: pa.array(
            np.floor(batch.column(c).to_numpy() * 1e7 + 0.5).astype(np.int64)
        )
        return pa.table(
            {
                "feature_id": batch.column("feature_id"),
                "kind": batch.column("kind"),
                "minx_d7": q("minx"),
                "miny_d7": q("miny"),
                "maxx_d7": q("maxx"),
                "maxy_d7": q("maxy"),
            }
        )

    return ext.map_batches(quantize, batch_format="pyarrow")


def q_mask_png(sf_dir: str):
    """Rasterize masks round-tripped through the reference's paletted
    PNG layout (tools/masks.py:62-69): fg + positional checksum are
    recomputed from DECODED container bytes, gating the from-scratch
    PNG codec (codecs/png.py) against the pixel-center SQL oracle."""
    from robosat_ray.stages.rasterize import mask_png_stats, rasterize

    masks = rasterize(footprints_dataset(sf_dir), size=64)
    return mask_png_stats(masks)


def q_featurize(sf_dir: str):
    """Masks -> vector polygons (threshold/contours/simplify/px->world;
    reference rs features), serialized as the canonical boundary-edge
    rows of the OUTPUT rings — a lossless, order-free form the DuckDB
    oracle derives independently from its recursive-CTE component
    pixels, making the full ring geometry (incl. holes) hash-hard
    instead of rows-only."""
    from robosat_ray.stages.featurize import featurize, featurize_edges
    from robosat_ray.stages.rasterize import rasterize

    masks = rasterize(footprints_dataset(sf_dir), size=64)
    return featurize_edges(featurize(masks), size=64)


def q_featurize_stats(sf_dir: str):
    """Featurize invariants, oracle-checked per mask component:
    area_px (corner-polygon shoelace == pixel count) + world bbox
    (the px->world affine), vs a DuckDB recursive-CTE connected-
    components oracle over per-rect pixel spans."""
    from robosat_ray.stages.featurize import featurize
    from robosat_ray.stages.rasterize import rasterize

    masks = rasterize(footprints_dataset(sf_dir), size=64)
    feats = featurize(masks)

    def stats(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tile_x": b.column("tile_x"),
                "tile_y": b.column("tile_y"),
                "area_px": pa.array(
                    np.round(b.column("area_px").to_numpy()).astype(np.int64)
                ),
                "minx": b.column("minx"),
                "miny": b.column("miny"),
                "maxx": b.column("maxx"),
                "maxy": b.column("maxy"),
            }
        )

    return feats.map_batches(stats, batch_format="pyarrow")


def q_featurize_moments(sf_dir: str):
    """Ring-geometry correctness up to second-order pixel moments: the
    engine's OUTPUT rings, round-tripped through the inverse affine and
    an even-odd fill, must enclose exactly the oracle's CC pixel sets
    (n, Σi, Σj, Σi², Σj², Σij per component)."""
    from robosat_ray.stages.featurize import featurize, ring_pixel_moments
    from robosat_ray.stages.rasterize import rasterize

    masks = rasterize(footprints_dataset(sf_dir), size=64)
    return ring_pixel_moments(featurize(masks), size=64)


def q_merge_components(sf_dir: str):
    from robosat_ray.stages.merge import merge_components
    from robosat_ray.synth.footprints import footprints_table

    return merge_components(footprints_dataset(sf_dir), footprints_table(sf_dir))


def q_merge_unions(sf_dir: str):
    """A5 invariants: per-component member count, bbox extent, exact
    rect-union area (1e-10-quantized int64) — oracle-checked against a
    DuckDB scanline over the recursive component CTE."""
    from robosat_ray.stages.merge import merge_unions
    from robosat_ray.synth.footprints import footprints_table

    return merge_unions(footprints_dataset(sf_dir), footprints_table(sf_dir))


def q_merge_geometry(sf_dir: str):
    """Reference merge chain output (tools/merge.py:63-81), serialized
    hash-hard: the engine traces the MERGED rings (buffer-union-erode
    closing) and even-odd-tests every candidate compressed-grid cell
    against them; the oracle derives the same (cell, inside) rows from
    the dilate/erode set rule without tracing — a value-hash match
    pins the ring geometry exactly. The raw ring dump remains
    available via stages/merge.merge_geometry (exactness additionally
    tested in tests/test_merge_union.py)."""
    from robosat_ray.stages.merge import merge_ring_cells
    from robosat_ray.synth.footprints import footprints_table

    return merge_ring_cells(footprints_dataset(sf_dir), footprints_table(sf_dir))


def q_dedupe(sf_dir: str):
    from robosat_ray.stages.dedupe import dedupe_survivors
    from robosat_ray.synth.footprints import footprints_table, predicted_dataset

    return dedupe_survivors(predicted_dataset(sf_dir), footprints_table(sf_dir))


def _docs_ds(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def q_ngram_jaccard(sf_dir: str):
    """Standalone EXACT n-gram Jaccard join (the brief's n-gram
    Jaccard dedup op as a first-class scored operator): inverted-index
    posting rows per 3-shingle, per-shingle posting cap (50 smallest
    doc_ids, mirrored in the oracle QUALIFY), full-set co-partition
    scoring — emits integer (n_inter, n_union, jac_ppm) per pair."""
    from robosat_ray.stages.neardup import ngram_jaccard_pairs_ds, with_variants_batch

    docs = _docs_ds(sf_dir).map_batches(with_variants_batch, batch_format="pyarrow")
    return ngram_jaccard_pairs_ds(docs)


def q_near_dup(sf_dir: str):
    """MinHash-LSH near-dup pairs over documents + synthetic variants,
    verified with exact shingle-set Jaccard (>= 0.5)."""
    from robosat_ray.stages.neardup import near_dup_pairs, with_variants_batch

    docs = _docs_ds(sf_dir).map_batches(with_variants_batch, batch_format="pyarrow")
    return near_dup_pairs(docs)


def q_mvt_tiles(sf_dir: str):
    """Vector-tile sink round trip: footprints -> per-covered-tile REAL
    Mapbox Vector Tile bytes (from-scratch codecs/mvt.py: command
    stream, zigzag deltas, keys/values tables) -> stats recomputed from
    the DECODED geometry + tags. Oracle: oracle.MVT_TILES."""
    from robosat_ray.stages.vtiles import mvt_tile_stats

    return mvt_tile_stats(footprints_dataset(sf_dir))


def q_delta_dup(sf_dir: str):
    """Delta dedup (incremental ingest): the NEW shard (zzvariant
    copies of doc_id % 3 == 0) near-dup-joined AGAINST the prior
    corpus — asymmetric LSH banding (cross-side candidate runs only) +
    the shared exact-Jaccard co-partition verify. Oracle:
    oracle.DELTA_DUP."""
    import pyarrow as _pa

    from robosat_ray.stages.neardup import delta_dup_pairs_ds, delta_shard_batch

    ref = _docs_ds(sf_dir)
    new = _docs_ds(sf_dir).map_batches(delta_shard_batch, batch_format="pyarrow")
    pairs = delta_dup_pairs_ds(ref, new)

    def rename(b: _pa.Table) -> _pa.Table:
        return _pa.table({"ref_id": b.column("a"), "new_id": b.column("b")})

    return pairs.map_batches(rename, batch_format="pyarrow")


def q_bpe_tokens(sf_dir: str):
    """BPE-ish regex pretokenization counts (the second half of the
    token-counting brief next to the whitespace tokenizer)."""
    from robosat_ray.stages.text_ops import bpe_token_counts

    return bpe_token_counts(_docs_ds(sf_dir))


def q_sample_weighted(sf_dir: str):
    """Deterministic quality-weighted subsample: P(keep) = alpha
    ratio, integer threshold vs the stable key hash."""
    from robosat_ray.stages.sampling import weighted_sample

    return weighted_sample(_docs_ds(sf_dir))


def q_doc_rarity(sf_dir: str):
    """Corpus-statistics scoring (TF-IDF shape): global document
    frequency -> broadcast idf map -> per-doc rarity, integer-exact."""
    from robosat_ray.stages.text_ops import doc_rarity

    return doc_rarity(_docs_ds(sf_dir))


def q_dup_clusters(sf_dir: str):
    """Near-dup cluster canonicalization: LSH pairs -> distributed
    connected components -> per-doc (cluster_id, cluster_size, keep)
    with the min-doc_id representative kept (reference keep/drop rule
    of tools/dedupe.py lifted from pairs to whole clusters)."""
    from robosat_ray.stages.neardup import dup_clusters, with_variants_batch

    docs = _docs_ds(sf_dir).map_batches(with_variants_batch, batch_format="pyarrow")
    return dup_clusters(docs)


def q_rep_signals(sf_dir: str):
    """Gopher-style repetition quality signals (modal-token and
    duplicate-trigram ppm ratios), integer-exact vs the SQL twin."""
    from robosat_ray.stages.quality import repetition_signals

    return repetition_signals(_docs_ds(sf_dir))


def q_simhash(sf_dir: str):
    from robosat_ray.stages.neardup import simhash_table

    return simhash_table(_docs_ds(sf_dir))


def q_fingerprints(sf_dir: str):
    """Document fingerprinting (Manber mod-p rolling hash): per doc
    the DISTINCT set of selected k-gram Rabin-Karp hashes — shared
    fingerprints across docs locate copied substrings at scale."""
    from robosat_ray.stages.text_ops import doc_fingerprints

    return doc_fingerprints(_docs_ds(sf_dir))



def q_normalized_dedup(sf_dir: str):
    """Normalized exact dedup (case/whitespace-folded keys) — the
    web-text pre-dedup next to exact_dedup; Arrow-kernel
    normalization, algebraic Min/Count groupby."""
    from robosat_ray.stages.text_ops import normalized_dedup_groups

    return normalized_dedup_groups(_docs_ds(sf_dir))


def q_quality(sf_dir: str):
    from robosat_ray.stages.quality import quality_scores

    return quality_scores(_docs_ds(sf_dir))


def q_langid(sf_dir: str):
    from robosat_ray.stages.quality import langid

    return langid(_docs_ds(sf_dir))


def _ann_queries(sf_dir: str):
    """Select the 1/ANN_STRIDE query vectors with a STREAMING scan —
    each record batch keeps only its selected rows, so driver memory
    is bounded by the (stride-bounded) query set, never the full
    embedding column."""
    f = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    ids_parts, emb_parts = [], []
    for rb in f.iter_batches(columns=["vec_id", "embedding"]):
        ids = rb.column(0).to_numpy().astype(np.int64)
        sel = np.flatnonzero(ids % C.ANN_STRIDE == 0)
        if len(sel):
            ids_parts.append(ids[sel])
            emb_parts.append(
                np.array(rb.column(1).take(pa.array(sel)).to_pylist(), dtype=np.float64)
            )
    qids = np.concatenate(ids_parts)
    Q = np.concatenate(emb_parts)
    order = np.argsort(qids, kind="stable")
    return qids[order], Q[order]


def q_ann(sf_dir: str):
    import ray.data

    from robosat_ray.stages.ann import ann_brute_topk

    qids, Q = _ann_queries(sf_dir)
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ann_brute_topk(emb, qids, Q)



def q_ann_pq(sf_dir: str):
    """Product-quantization ANN (integer lattice): per-subspace int64
    k-means codebooks trained on the 400-smallest-vec_id sample, 4-bit
    codes (8 bytes/vector — the 64x memory compression of
    billion-vector scans), exact-int ADC top-k. The ENTIRE chain has a
    bit-exact SQL twin (oracle.ANN_PQ, unrolled integer Lloyd)."""
    from robosat_ray.stages.ann import ann_pq_topk, quantize_lattice, train_pq_codebooks

    import ray.data

    qids, Q = _ann_queries(sf_dir)
    books = train_pq_codebooks(quantize_lattice(_smallest_sample(sf_dir)))
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ann_pq_topk(emb, qids, Q, books)


def q_emb_dup(sf_dir: str):
    """Embedding-cosine near-dup (dedup family): exact all-pairs
    threshold join of base vectors + deterministic scaled variants.
    Broadcast reference matrix + streaming probe batches; the
    LSH-bucketed candidate pass (stages/neardup.py) is the scale path
    when the reference side outgrows a worker heap."""
    import ray.data

    from robosat_ray.stages.ann import emb_dup_pairs, with_emb_variants_batch

    # one read + one variant pass: the broadcast table IS the corpus
    # (small side by design); the streaming probe re-reads it as a
    # Dataset rather than re-deriving variants from parquet
    table = with_emb_variants_batch(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    )
    emb = ray.data.from_arrow(table)
    return emb_dup_pairs(emb, table, threshold=C.EMB_DUP_THRESHOLD)


def q_emb_dup_lsh(sf_dir: str):
    """Hyperplane-LSH embedding near-dup (the scale path of emb_dup):
    64 integer hyperplanes, 4 x 16-bit bands, bucketed groupby
    candidate mining, exact-cosine verify — bucket membership is
    int64-exact, so the SQL twin reproduces the full LSH plan."""
    import ray.data

    from robosat_ray.stages.ann import emb_dup_pairs_lsh, with_emb_variants_batch

    table = with_emb_variants_batch(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    )
    emb = ray.data.from_arrow(table)
    return emb_dup_pairs_lsh(emb, table, threshold=C.EMB_DUP_THRESHOLD)


def q_class_weights(sf_dir: str):
    """A1: global per-class pixel histogram over rasterized masks +
    the reference's 1/ln(1.02+p) weight rule."""
    from robosat_ray.stages.rasterize import rasterize
    from robosat_ray.stages.weights import class_weights

    return class_weights(rasterize(footprints_dataset(sf_dir), size=64))


# segmentation_metrics and epoch_loss aggregate the SAME expensive
# rasterize -> halo -> scorer-pool -> label-join chain; share ONE
# materialized prob_pairs dataset between them instead of running the
# 13s upstream twice (round-4 VERDICT fusion item). Keyed by (sf_dir,
# ray job id): a fresh ray.init invalidates the cached object refs.
_PROB_PAIRS_CACHE: dict = {}


def _prob_pairs_shared(sf_dir: str):
    import ray

    from robosat_ray.stages.rasterize import rasterize
    from robosat_ray.stages.scorer import prob_pairs

    key = (sf_dir, ray.get_runtime_context().get_job_id())
    hit = _PROB_PAIRS_CACHE.get("entry")
    if hit is not None and hit[0] == key:
        return hit[1]
    labels = rasterize(footprints_dataset(sf_dir), size=64)
    pp = prob_pairs(labels).materialize()
    _PROB_PAIRS_CACHE["entry"] = (key, pp)  # single slot bounds memory
    return pp


def q_segmentation_metrics(sf_dir: str):
    """Full prediction-pipeline story (halo exchange -> scorer actor
    pool -> quantize -> ensemble softvote -> confusion aggregate).
    Deterministic stand-in model; oracle: oracle.SEGMENTATION_METRICS."""
    from robosat_ray.stages.metrics import segmentation_metrics
    from robosat_ray.stages.scorer import pred_from_prob_pairs

    pairs = pred_from_prob_pairs(_prob_pairs_shared(sf_dir))
    return segmentation_metrics(pairs)


def q_epoch_loss(sf_dir: str):
    """A7: epoch mean binary cross-entropy of the softvote
    probability vs labels — algebraic combo-count aggregate, LUT-based
    SQL oracle (same CTE core as segmentation_metrics)."""
    from robosat_ray.stages.metrics import epoch_loss

    return epoch_loss(_prob_pairs_shared(sf_dir))


def q_events_window(sf_dir: str):
    import ray.data

    from robosat_ray.stages.events import tumbling_window_agg

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    out = tumbling_window_agg(ev)

    def round_sum(batch: pa.Table) -> pa.Table:
        # np.round (scale, rint, divide) matches DuckDB ROUND bit-for-bit;
        # pyarrow.compute.round multiplies back and lands on different floats
        r = np.round(batch.column("sum_value").to_numpy(), 6)
        return batch.set_column(
            batch.schema.get_field_index("sum_value"), "sum_value", pa.array(r)
        )

    return out.map_batches(round_sum, batch_format="pyarrow")


def q_events_running(sf_dir: str):
    import ray.data

    from robosat_ray.stages.events import running_totals

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    out = running_totals(ev)

    def round_col(batch: pa.Table) -> pa.Table:
        r = np.round(batch.column("running_value").to_numpy(), 6)
        return batch.set_column(
            batch.schema.get_field_index("running_value"), "running_value", pa.array(r)
        )

    return out.map_batches(round_col, batch_format="pyarrow")


def q_events_sessions(sf_dir: str):
    """Gap-based sessionization per user (30-min inactivity gap) —
    the classic streaming session window as a bucketed sorted-group
    computation; all-integer output with an exact islands oracle."""
    import ray.data

    from robosat_ray.stages.events import sessionize

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return sessionize(ev)


def q_events_window_fns(sf_dir: str):
    """Ordered window functions (lag/lead/row_number/rolling-frame
    sum/rank) within each user's event stream — the windowed-aggregate
    family as ONE co-partition shuffle + vectorized pandas kernels;
    all-integer output with a DuckDB window-function oracle."""
    import ray.data

    from robosat_ray.stages.window import window_functions

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    return window_functions(ev)


def q_simhash_dup(sf_dir: str):
    """SimHash hamming-distance near-dup pairs (<=3 differing bits)
    via pigeonhole-exact 4x16-bit banding — candidacy by band-equality
    groupby, popcount verify in-group, pair-dedupe across bands."""
    from robosat_ray.stages.neardup import simhash_dup_pairs

    return simhash_dup_pairs(_docs_ds(sf_dir))


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped pricing summary over lineitem: per-batch
    quantize-to-cents + partial per-group sums (combiner inside
    map_batches), then a tiny 6-group global aggregate — the
    pre-aggregate-before-groupby pattern at its purest."""
    import ray.data
    from ray.data.aggregate import Sum

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    cutoff = np.datetime64("1999-01-01").astype("datetime64[us]").astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        ts = b.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = ts <= cutoff
        p = b.column("l_extendedprice").to_numpy()[keep]
        d = b.column("l_discount").to_numpy()[keep]
        t = b.column("l_tax").to_numpy()[keep]
        q = b.column("l_quantity").to_numpy()[keep]
        df = pd.DataFrame(
            {
                "l_returnflag": b.column("l_returnflag").to_numpy(zero_copy_only=False)[keep],
                "l_linestatus": b.column("l_linestatus").to_numpy(zero_copy_only=False)[keep],
                # identical IEEE exprs as the oracle's floor(x*100+0.5)
                "sum_qty_c": np.floor(q * 100 + 0.5).astype(np.int64),
                "sum_base_c": np.floor(p * 100 + 0.5).astype(np.int64),
                "sum_disc_c": np.floor(p * (1 - d) * 100 + 0.5).astype(np.int64),
                "sum_charge_c": np.floor(p * (1 - d) * (1 + t) * 100 + 0.5).astype(
                    np.int64
                ),
            }
        )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False, as_index=False)
            .agg(
                sum_qty_c=("sum_qty_c", "sum"),
                sum_base_c=("sum_base_c", "sum"),
                sum_disc_c=("sum_disc_c", "sum"),
                sum_charge_c=("sum_charge_c", "sum"),
                n_rows=("sum_qty_c", "size"),
            )
        )
        g["n_rows"] = g["n_rows"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_c", alias_name="sum_qty_c"),
            Sum("sum_base_c", alias_name="sum_base_c"),
            Sum("sum_disc_c", alias_name="sum_disc_c"),
            Sum("sum_charge_c", alias_name="sum_charge_c"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )


def q_order_revenue(sf_dir: str):
    """TPC-H-Q3-style relational pipeline over the generic join
    operators: customer(BUILDING) ⋈nation broadcast -> orders(pre-1996)
    broadcast-joined to the customer map -> lineitem auto_join on
    orderkey (broadcast while the filtered order map fits a worker,
    co-partition shuffle past 2M rows) -> per-nation revenue.
    Revenue quantized to integer cents PER ROW (floor(x*100 + 0.5),
    identical IEEE expr in SQL) so the aggregate is an exact int64 sum
    — order-free across partial aggregation."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    from robosat_ray.stages.join import auto_join, broadcast_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_mktsegment"]
    ).filter(expr="c_mktsegment == 'BUILDING'")
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).map_batches(
        lambda b: b.rename_columns(["c_nationkey", "n_name"]), batch_format="pyarrow"
    )
    cust_n = broadcast_join(cust, nation, on="c_nationkey", how="inner").select_columns(
        ["c_custkey", "n_name"]
    )

    cutoff = np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def pre96(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate").cast(pa.int64()).to_numpy()
        return b.filter(pa.array(ts < cutoff)).drop_columns(["o_orderdate"])

    orders = orders.map_batches(pre96, batch_format="pyarrow").map_batches(
        lambda b: b.rename_columns(["l_orderkey", "c_custkey"]), batch_format="pyarrow"
    )
    orders_n = broadcast_join(orders, cust_n, on="c_custkey", how="inner").select_columns(
        ["l_orderkey", "n_name"]
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def cents(b: pa.Table) -> pa.Table:
        rev = b.column("l_extendedprice").to_numpy() * (
            1.0 - b.column("l_discount").to_numpy()
        )
        q = np.floor(rev * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {"l_orderkey": b.column("l_orderkey"), "rev_cents": pa.array(q)}
        )

    li = li.map_batches(cents, batch_format="pyarrow")
    joined = auto_join(
        li, orders_n, on="l_orderkey", how="inner",
        # explicit side schemas: orders_n ends in filter -> inner join
        # -> select_columns, where Ray's sampled schema is unreliable
        # (only consulted on the co-partition fallback path)
        schema_hints={
            "left": {"l_orderkey": pa.int64(), "rev_cents": pa.int64()},
            "right": {"l_orderkey": pa.int64(), "n_name": pa.string()},
        },
    )
    return joined.groupby("n_name").aggregate(
        Count(alias_name="n_lines"), Sum("rev_cents", alias_name="revenue_cents")
    )


def q_events_cube(sf_dir: str):
    """CUBE(day, event_type): the rollup plus the (event_type)-only
    grouping set — still one data pass, upper sets from the tiny fine
    result."""
    import ray.data

    from robosat_ray.stages.events import rollup_day_type

    return rollup_day_type(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
        ),
        cube=True,
    )


def q_table_stats(sf_dir: str):
    """Data-profiling primitive: exact integer column statistics over
    lineitem in one streaming pass + a 4-row combine."""
    import ray.data

    from robosat_ray.stages.profile import table_stats

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    return table_stats(
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols), cols
    )


def q_recent_lineitems(sf_dir: str):
    """Exact semi-join accelerated by a Bloom runtime filter: lineitem
    ⋉ date-windowed orders. The filter is built distributed from the
    orders side (one bit-array row per block, OR'd on the driver,
    broadcast once) and prunes non-matching lineitems BEFORE the
    all-to-all, so the exact copartition semi-join shuffles only
    matches + the ~1% FP tail. No false negatives => result identical
    to the plain semi-join (the oracle)."""
    import ray.data
    from ray.data.aggregate import Sum

    from robosat_ray.stages.join import BLOOM_BITS_PER_KEY, bloom_semi_join

    lo = np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
    hi = np.datetime64("1998-01-01").astype("datetime64[us]").astype(np.int64)

    def o_keys(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate").cast(pa.int64()).to_numpy()
        b = b.filter(pa.array((ts >= lo) & (ts < hi)))
        return pa.table({"l_orderkey": b.column("o_orderkey").cast(pa.int64())})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(o_keys, batch_format="pyarrow")
    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )
    joined = bloom_semi_join(
        li, orders, on="l_orderkey",
        num_bits=BLOOM_BITS_PER_KEY * n_orders,
        schema_hints={"left": {"l_orderkey": pa.int64(), "l_returnflag": pa.string()}},
    )

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        codes, uniq = pd.factorize(b.column("l_returnflag").to_pandas(), sort=False)
        return pa.table(
            {
                "l_returnflag": pa.array(np.asarray(uniq, dtype=object), pa.string()),
                "pn": pa.array(np.bincount(codes, minlength=len(uniq)).astype(np.int64)),
            }
        )

    return joined.map_batches(partial, batch_format="pyarrow").groupby(
        "l_returnflag"
    ).aggregate(Sum("pn", alias_name="n_lines"))


def q_events_rollup(sf_dir: str):
    """ROLLUP(day, event_type) counts + value cents: one algebraic
    groupby over the stream, upper levels re-aggregated from the tiny
    fine result (never a second data pass)."""
    import ray.data

    from robosat_ray.stages.events import rollup_day_type

    return rollup_day_type(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
        )
    )


def q_local_supplier_revenue(sf_dir: str):
    """TPC-H-Q5-shape pipeline: revenue from lineitems whose supplier
    and ordering customer share a nation inside one region — a 6-table
    join whose c_nationkey == s_nationkey predicate no single equi-join
    key carries (it becomes a post-join filter). Shape: the dim chain
    region ⋈ nation ⋈ supplier collapses into ONE broadcast supplier
    map; orders(date-filtered) ⋈ customer broadcasts while customer
    fits (probed from parquet METADATA — zero execution cost) and
    falls back to the distributed co-partition join above the cap;
    lineitem streams through both joins + the filter, and only the
    tiny per-nation aggregate shuffles."""
    import ray.data
    from ray.data.aggregate import Sum

    from robosat_ray.stages.join import auto_join, broadcast_join

    # dims are small BY DEFINITION of the broadcast pattern, so they
    # are prepared as plain Arrow tables on the driver (each Ray
    # micro-execution for a 25-row dim costs ~2 s of fixed scheduling
    # — measured 6 serial prep executions = half the query wall time)
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    asia = region.filter(pc.equal(region.column("r_name"), "ASIA"))
    rkeys = asia.column("r_regionkey").to_numpy().astype(np.int64)
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    nmask = np.isin(nation.column("n_regionkey").to_numpy().astype(np.int64), rkeys)
    nat = nation.filter(pa.array(nmask))
    nat_keys = nat.column("n_nationkey").to_numpy().astype(np.int64)
    nat_order = np.argsort(nat_keys, kind="stable")
    nat_keys = nat_keys[nat_order]
    nat_names = np.asarray(nat.column("n_name").to_pylist(), dtype=object)[nat_order]

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    snat = supp.column("s_nationkey").to_numpy().astype(np.int64)
    smask = np.isin(snat, nat_keys)
    spos = np.searchsorted(nat_keys, snat[smask])
    supp_map = pa.table(
        {
            "l_suppkey": pa.array(
                supp.column("s_suppkey").to_numpy().astype(np.int64)[smask]
            ),
            "s_nationkey": pa.array(snat[smask]),
            "n_name": pa.array(nat_names[spos], pa.string()),
        }
    )

    lo = np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
    hi = np.datetime64("1998-01-01").astype("datetime64[us]").astype(np.int64)

    def o_window(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = (ts >= lo) & (ts < hi)
        b = b.filter(pa.array(keep))
        return pa.table(
            {
                "l_orderkey": b.column("o_orderkey").cast(pa.int64()),
                "o_custkey": b.column("o_custkey").cast(pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(o_window, batch_format="pyarrow")

    # orders ⋈ customer: broadcast while customer fits in a worker
    # heap, co-partition shuffle above the cap. The probe is parquet
    # METADATA (num_rows), not an execution — zero cost either way.
    def c_cols(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b.column("c_custkey").cast(pa.int64()),
                "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
            }
        )

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if n_cust <= CUSTOMER_BROADCAST_ROWS:
        cust = c_cols(
            pq.read_table(
                f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
            )
        )
        oc = broadcast_join(orders, cust, on="o_custkey", how="inner")
    else:
        from robosat_ray.stages.join import copartition_join

        cust_ds = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).map_batches(c_cols, batch_format="pyarrow")
        oc = copartition_join(
            orders, cust_ds, on="o_custkey", how="inner",
            schema_hints={
                "left": {"l_orderkey": pa.int64(), "o_custkey": pa.int64()},
                "right": {"o_custkey": pa.int64(), "c_nationkey": pa.int64()},
            },
        )
    # materialized: small (date-filtered key map), and auto_join's
    # strategy probe + the join itself would otherwise re-execute the
    # whole orders⋈customer chain
    orders_c = oc.select_columns(["l_orderkey", "c_nationkey"]).materialize()

    def li_cents(b: pa.Table) -> pa.Table:
        rev = b.column("l_extendedprice").to_numpy() * (
            1.0 - b.column("l_discount").to_numpy()
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
                "l_suppkey": b.column("l_suppkey").cast(pa.int64()),
                "rev_cents": pa.array(np.floor(rev * 100.0 + 0.5).astype(np.int64)),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_cents, batch_format="pyarrow")
    li_s = broadcast_join(li, supp_map, on="l_suppkey", how="inner")
    joined = auto_join(
        li_s, orders_c, on="l_orderkey", how="inner",
        schema_hints={
            "left": {
                "l_orderkey": pa.int64(), "l_suppkey": pa.int64(),
                "rev_cents": pa.int64(), "s_nationkey": pa.int64(),
                "n_name": pa.string(),
            },
            "right": {"l_orderkey": pa.int64(), "c_nationkey": pa.int64()},
        },
    )

    def local_partial(b: pa.Table) -> pa.Table:
        # filter + in-batch combiner: the global groupby then shuffles
        # (batches x nations) partial rows, not every joined line
        import pandas as pd

        keep = pc.equal(b.column("s_nationkey"), b.column("c_nationkey"))
        b = b.filter(keep)
        names = b.column("n_name").to_pandas()
        codes, uniq = pd.factorize(names, sort=False)
        cents = b.column("rev_cents").to_numpy()
        k = len(uniq)
        # int64 accumulation (np.add.at), never a float64 weighted
        # bincount — partial sums stay exact integer cents end to end
        pc_sum = np.zeros(k, dtype=np.int64)
        np.add.at(pc_sum, codes, cents)
        return pa.table(
            {
                "n_name": pa.array(np.asarray(uniq, dtype=object), pa.string()),
                "pn": pa.array(np.bincount(codes, minlength=k).astype(np.int64)),
                "pc": pa.array(pc_sum),
            }
        )

    return joined.map_batches(local_partial, batch_format="pyarrow").groupby(
        "n_name"
    ).aggregate(
        Sum("pn", alias_name="n_lines"), Sum("pc", alias_name="revenue_cents")
    )


def q_price_quantiles(sf_dir: str):
    """Exact distributed quantiles of lineitem price (integer cents)
    per returnflag — the scalable exact algorithm: algebraic
    (group, value)->count reduction first, quantile pick over the
    compressed table after. Pure-integer rule mirrored in SQL."""
    import ray.data

    from robosat_ray.stages.quantiles import group_quantiles

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )

    def cents(b: pa.Table) -> pa.Table:
        q = np.floor(b.column("l_extendedprice").to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {"l_returnflag": b.column("l_returnflag"), "price_cents": pa.array(q)}
        )

    return group_quantiles(
        li.map_batches(cents, batch_format="pyarrow"), "l_returnflag", "price_cents"
    )


def q_events_pivot(sf_dir: str):
    """Per-user pivot: event counts per type + purchase cents sum —
    pivot expressed as indicator columns + one algebraic groupby."""
    import ray.data

    from robosat_ray.stages.events import pivot_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )
    return pivot_counts(ev)


def q_events_asof(sf_dir: str):
    """Attribution as-of join: for each purchase event, the latest view
    event of the same user at or before it (DuckDB ASOF LEFT JOIN is
    the oracle). Sentinels (-1 / 0.0) encode the unmatched-left rows so
    the output stays single-dtype per column."""
    import ray.data

    from robosat_ray.stages.events import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    return asof_join(ev, left_type="purchase", right_type="view")


def q_events_range_join(sf_dir: str):
    """Sliding-interval range join: per purchase, count + sum of the
    same user's click events in the preceding hour [ts-1h, ts)."""
    import ray.data

    from robosat_ray.stages.events import range_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    return range_join(ev, left_type="purchase", right_type="click")


def q_sample_stratified(sf_dir: str):
    """Deterministic hash sampling of documents (rate 0.2, seed 7) —
    reproducible across partitionings; exact WHERE-clause oracle."""
    import ray.data

    from robosat_ray.stages.sampling import stratified_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return stratified_sample(docs, frac=0.2, seed=7)


def q_top_docs_per_lang(sf_dir: str):
    """Per-group top-k curation: the 5 longest documents per lang
    (ties broken by doc_id) — exact ROW_NUMBER oracle."""
    import ray.data

    from robosat_ray.stages.sampling import top_k_per_group

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    return top_k_per_group(
        docs, "lang", ["n_chars", "doc_id"], [False, True], k=5
    )



def q_cms_sketch(sf_dir: str):
    """Count-Min frequency sketch over the corpus token stream — the
    mergeable sketch family next to HLL (hll_users): fixed 4x8192
    cells whatever the vocabulary, per-batch partials merged by one
    algebraic groupby; deterministic salted hashes give an exact
    DuckDB twin."""
    from robosat_ray.stages.text_ops import cms_sketch

    return cms_sketch(_docs_ds(sf_dir))


def q_quadkeys(sf_dir: str):
    """Bing quadkey cell encoding (the quadkey/S2-style hierarchical
    cell id of SURVEY's points schema) at z=12: numeric Morton form +
    the textual base-4 key, both vectorized (magic-number bit spread,
    fixed-width byte-matrix string build — geo/tiles.py:quadkey)."""
    import pyarrow as pa

    from robosat_ray.geo.tiles import quadkey, quadkey_str

    pts = points_dataset(sf_dir).select_columns(["doc_id", "tile_x", "tile_y"])

    def qk(batch: pa.Table) -> pa.Table:
        tx = batch.column("tile_x").to_numpy()
        ty = batch.column("tile_y").to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "tile_x": batch.column("tile_x"),
                "tile_y": batch.column("tile_y"),
                "quadkey": pa.array(quadkey(tx, ty, C.Z_JOIN)),
                "qk": pa.array(quadkey_str(tx, ty, C.Z_JOIN), pa.string()),
            }
        )

    return pts.map_batches(qk, batch_format="pyarrow")


def q_quadkey_agg(sf_dir: str):
    """Hierarchical cell rollup: page count + distinct-tile count per
    level-8 quadkey prefix (the parent-cell aggregation hierarchical
    ids exist for — H3 coarsening analog). Two-level algebraic plan:
    in-batch (cell -> count) combiner, per-cell groupby sum, then the
    tiny per-cell table re-aggregates to prefixes — the raw pages
    never shuffle."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from robosat_ray.geo.tiles import quadkey

    pts = points_dataset(sf_dir).select_columns(["tile_x", "tile_y"])

    def partial(batch: pa.Table) -> pa.Table:
        qk = quadkey(
            batch.column("tile_x").to_numpy(),
            batch.column("tile_y").to_numpy(),
            C.Z_JOIN,
        )
        uk, cnt = np.unique(qk, return_counts=True)
        return pa.table(
            {
                "qk8": pa.array(uk >> 8),
                "cell": pa.array(uk),
                "pn": pa.array(cnt.astype(np.int64)),
            }
        )

    per_cell = (
        pts.map_batches(partial, batch_format="pyarrow")
        .groupby(["qk8", "cell"])
        .aggregate(Sum("pn", alias_name="pn"))
    )

    def one(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qk8": batch.column("qk8"),
                "pn": batch.column("pn"),
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )

    return (
        per_cell.map_batches(one, batch_format="pyarrow")
        .groupby("qk8")
        .aggregate(Sum("pn", alias_name="n_pages"), Sum("one", alias_name="n_tiles"))
    )


def q_top_tiles(sf_dir: str):
    """Top-10 tiles by page count (partial per-batch counts -> groupby
    sum -> global sort + limit; deterministic (n desc, tile) order)."""
    from ray.data.aggregate import Sum

    pts = points_dataset(sf_dir).select_columns(["tile_x", "tile_y"])

    def partial(batch: pa.Table) -> pa.Table:
        tx = batch.column("tile_x").to_numpy()
        ty = batch.column("tile_y").to_numpy()
        key = tx * np.int64(1 << 22) + ty
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "tile_x": pa.array(uniq // np.int64(1 << 22)),
                "tile_y": pa.array(uniq % np.int64(1 << 22)),
                "partial": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = (
        pts.map_batches(partial, batch_format="pyarrow")
        .groupby(["tile_x", "tile_y"])
        .aggregate(Sum("partial", alias_name="n"))
    )
    return counts.sort(["n", "tile_x", "tile_y"], descending=[True, False, False]).limit(10)


def q_media_features(sf_dir: str):
    """Multimodal plumbing end-to-end (synth media -> actor-pool decode
    stub -> resize -> features). Rows-only check (fake decode)."""
    from robosat_ray.stages.multimodal import media_pipeline

    return media_pipeline(sf_dir)


def q_quantile_sketch(sf_dir: str):
    """Mergeable base-2 DDSketch quantiles of n_chars per lang (p50/
    p90/p99 buckets with value bounds): dense (group x bin) bincount
    partials, one tiny groupby Sum, driver finalize on a |langs| x 63
    table. Oracle: oracle.QUANTILE_SKETCH (integer-exact bin LUT)."""
    import ray.data

    from robosat_ray.stages.qsketch import quantile_sketch

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    return quantile_sketch(docs, "lang", "n_chars")


def q_jpeg_features(sf_dir: str):
    """Baseline-JPEG container round trip (the last reference raster
    format, robosat/tiles.py:65-100): blocky Weyl tensors REALLY
    encoded as baseline JPEG (from-scratch Huffman/DCT writer), parsed
    back through the magic-dispatched actor-pool decoder, resized,
    featurized. Oracle: oracle.JPEG_FEATURES replays the lossless
    blocky subspace."""
    from robosat_ray.stages.multimodal import jpeg_media_pipeline

    return jpeg_media_pipeline(sf_dir)


def _smallest_sample(sf_dir: str, limit: int = 400) -> np.ndarray:
    """Training sample = embeddings of the `limit` SMALLEST vec_ids —
    enforced explicitly (oracle parity: ORDER BY vec_id LIMIT n)
    instead of assuming the file is vec_id-ascending — via a streaming
    scan holding at most 2x the sample on the driver."""
    f = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    best_ids = np.empty(0, dtype=np.int64)
    best_emb = np.empty((0, C.EMB_DIM), dtype=np.float64)
    for rb in f.iter_batches(columns=["vec_id", "embedding"]):
        ids = rb.column(0).to_numpy().astype(np.int64)
        take = np.argsort(ids, kind="stable")[:limit]
        emb = np.array(
            rb.column(1).take(pa.array(take)).to_pylist(), dtype=np.float64
        )
        best_ids = np.concatenate([best_ids, ids[take]])
        best_emb = np.concatenate([best_emb, emb])
        keep = np.argsort(best_ids, kind="stable")[:limit]
        best_ids, best_emb = best_ids[keep], best_emb[keep]
    return best_emb


def _ivf_centroids(sf_dir: str):
    from robosat_ray.stages.ann import train_centroids

    return train_centroids(_smallest_sample(sf_dir), n_lists=16)


def ivf_index_dir(sf_dir: str, force: bool = False) -> str:
    """Build (once) the list-partitioned IVF index for an sf dir under
    /tmp; testdata is immutable so the cache is keyed by path."""
    import hashlib
    import os
    import shutil

    from robosat_ray.stages.ann import build_ivf_index

    # v2: deterministic even-spacing centroid init (SQL-oracle parity)
    key = hashlib.md5(f"{sf_dir}:v2".encode()).hexdigest()[:12]
    out = f"/tmp/robosat_ray_ivf/{key}"
    if force and os.path.isdir(out):
        shutil.rmtree(out)
    if not os.path.isdir(out):
        import ray.data

        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        build_ivf_index(emb, _ivf_centroids(sf_dir), out)
    return out


def q_ann_ivf(sf_dir: str):
    """Approximate ANN over a list-partitioned Parquet IVF index —
    the nprobe pruning happens at the READ (only the selected
    list_id=... directories are opened), not as a post-scan filter.
    Exact oracle: the whole IVF chain (deterministic centroid init,
    8 unrolled Lloyd iterations, assignment, nprobe union, cosine
    top-k) re-derived in SQL (oracle.ANN_IVF)."""
    from robosat_ray.stages.ann import ann_ivf_partitioned

    qids, Q = _ann_queries(sf_dir)
    cent = _ivf_centroids(sf_dir)
    return ann_ivf_partitioned(ivf_index_dir(sf_dir), qids, Q, cent, nprobe=6)


def q_compare_filter(sf_dir: str):
    """J5/A6: fg-share range filter over rasterized tiles (reference
    tools/compare.py keep-range semantics)."""
    import pyarrow.compute as pc

    from robosat_ray.stages.rasterize import rasterize

    masks = rasterize(footprints_dataset(sf_dir), size=64)
    lim = 64 * 64 * 0.25

    def keep(b: pa.Table) -> pa.Table:
        fg = b.column("fg")
        m = pc.and_(pc.greater(fg, 0), pc.less_equal(pc.cast(fg, pa.float64()), lim))
        return b.filter(m)

    return masks.map_batches(keep, batch_format="pyarrow").select_columns(
        ["tile_x", "tile_y", "fg"]
    )


def q_subset(sf_dir: str):
    """J4/O3/S10: semi-join subset — keep rasterized tiles covered by
    at least one 'building' footprint (broadcast tile-id set filter)."""
    import ray

    from robosat_ray.stages.cover import explode_cover_batch
    from robosat_ray.stages.rasterize import rasterize
    from robosat_ray.synth.footprints import footprints_table

    feet = footprints_table(sf_dir)
    bmask = pa.compute.equal(feet.column("kind"), "building")
    bfeet = feet.filter(bmask)
    cov = explode_cover_batch(bfeet, C.Z_JOIN)
    keys = np.unique(
        (cov.column("tile_x").to_numpy().astype(np.int64) << 26)
        | cov.column("tile_y").to_numpy().astype(np.int64)
    )
    ref = ray.put(keys)

    def keep(b: pa.Table) -> pa.Table:
        allowed = ray.get(ref)  # sorted int64 keys — searchsorted filter
        tx = b.column("tile_x").to_numpy().astype(np.int64)
        ty = b.column("tile_y").to_numpy().astype(np.int64)
        k = (tx << 26) | ty
        pos = np.clip(np.searchsorted(allowed, k), 0, len(allowed) - 1)
        m = allowed[pos] == k
        return b.filter(pa.array(m))

    masks = rasterize(footprints_dataset(sf_dir), size=64)
    return masks.map_batches(keep, batch_format="pyarrow").select_columns(
        ["tile_x", "tile_y", "fg"]
    )


def q_cust_no_orders(sf_dir: str):
    """Generic ANTI-join (TPC-H-Q22 flavor): customers with no orders
    since mid-2000 (lapsed customers). broadcast_semi_join(anti=True):
    the orders side is reduced to per-batch distinct keys, only the
    sorted distinct-key int64 array is broadcast, and the customer
    side streams through a searchsorted membership filter — zero
    shuffle."""
    import datetime as _dt

    import pyarrow.compute as pc
    import ray.data

    from robosat_ray.stages.join import broadcast_semi_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )

    def recent(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(
            batch.column("o_orderdate"),
            pa.scalar(_dt.datetime(2000, 7, 1), pa.timestamp("us")),
        )
        return pa.table({"c_custkey": batch.filter(m).column("o_custkey")})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(recent, batch_format="pyarrow")
    return broadcast_semi_join(cust, orders, on="c_custkey", anti=True)


def q_active_parts(sf_dir: str):
    """Generic SEMI-join through the co-partition (shuffle) strategy:
    parts with at least one max-quantity (50) shipment. Both sides are
    large at 100 TB — neither is gathered or broadcast; the lineitem
    side ships only its (filtered, per-batch-distinct) key column
    through ONE hash-bucket all-to-all."""
    import pyarrow.compute as pc
    import ray.data

    from robosat_ray.stages.join import copartition_semi_join

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    )

    def bigqty(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch.column("l_quantity"), pa.scalar(50.0))
        return pa.table({"p_partkey": batch.filter(m).column("l_partkey")})

    li = li.map_batches(bigqty, batch_format="pyarrow")
    hints = {"left": {"p_partkey": pa.int64(), "p_size": pa.int32()}}
    return copartition_semi_join(part, li, on="p_partkey", schema_hints=hints)


def q_lang_families(sf_dir: str):
    """Broadcast join on a STRING key: documents.lang against a tiny
    in-code script-family dimension (the url/lang-keyed lookup shape a
    webtext pipeline needs), then per-family totals. The dim table is
    ray.put once; left batches resolve via fixed-width-unicode
    searchsorted — zero shuffle."""
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count, Sum

    from robosat_ray.stages.join import broadcast_join

    dim = pa.table(
        {
            "lang": ["de", "en", "es", "fr", "zh"],
            "family": ["latin", "latin", "latin", "latin", "cjk"],
        }
    )
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def chars(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n_chars": pc.utf8_length(batch.column("text")).cast(pa.int64()),
            }
        )

    withlen = docs.map_batches(chars, batch_format="pyarrow")
    return (
        broadcast_join(withlen, dim, on="lang")
        .groupby("family")
        .aggregate(
            Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
        )
    )


def q_order_counts_dist(sf_dir: str):
    """TPC-H-Q13-style distribution: how many customers placed exactly
    k non-urgent orders (k includes 0 — the LEFT join's null side).
    Scale shape: orders pre-aggregated to per-customer counts (small
    output) BEFORE the join; copartition_join(how='left') keeps both
    sides streaming; final histogram is a tiny algebraic groupby."""
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count

    from robosat_ray.stages.join import copartition_join

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def non_urgent(batch: pa.Table) -> pa.Table:
        m = pc.not_equal(batch.column("o_orderpriority"), pa.scalar("1-URGENT"))
        return pa.table({"c_custkey": batch.filter(m).column("o_custkey")})

    counts = (
        orders.map_batches(non_urgent, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Count(alias_name="c_count"))
    )
    joined = copartition_join(
        cust, counts, on="c_custkey", how="left",
        schema_hints={
            "left": {"c_custkey": pa.int64()},
            "right": {"c_custkey": pa.int64(), "c_count": pa.int64()},
        },
    )

    def fill_zero(batch: pa.Table) -> pa.Table:
        c = batch.column("c_count")
        return pa.table(
            {"c_count": pc.coalesce(c, pa.scalar(0, c.type)).cast(pa.int64())}
        )

    return (
        joined.map_batches(fill_zero, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Count(alias_name="n_cust"))
    )


def q_hopping_window(sf_dir: str):
    """Hopping (sliding) 4h windows advancing hourly over the events
    log: constant-factor event expansion in map_batches, one algebraic
    groupby — no per-key state, no sort."""
    import ray.data

    from robosat_ray.stages.events import hopping_window_agg

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    return hopping_window_agg(ev)


def q_daily_users(sf_dir: str):
    """Exact per-day COUNT(DISTINCT user_id): in-batch pair dedup ->
    one user-bucket shuffle -> tiny per-day Sum."""
    import ray.data

    from robosat_ray.stages.distinct import daily_active_users

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    return daily_active_users(ev)


def q_hll_users(sf_dir: str):
    """HyperLogLog register table over user_id (p=12): deterministic
    integer sketch, bit-exact against the SQL twin; the cardinality
    estimate is derived from these registers (accuracy asserted in
    tests/test_distinct.py against the exact count)."""
    import ray.data

    from robosat_ray.stages.distinct import hll_registers

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return hll_registers(ev, col="user_id")


def q_top_tokens(sf_dir: str):
    """Corpus heavy hitters: top-20 tokens by frequency (hot-key /
    skew detection). In-batch partial counts bound the shuffle by
    vocabulary x blocks; per-block argpartition top-k bounds the
    driver gather to k x blocks rows."""
    from robosat_ray.stages.text_ops import top_tokens

    return top_tokens(_docs_ds(sf_dir), k=20)


def q_quality_filter(sf_dir: str):
    """Percentile-gated quality filter: keep documents at/above the
    corpus P25 alpha micro-ratio (quality scoring composed with the
    exact distributed quantile threshold)."""
    from robosat_ray.stages.quality import quality_percentile_filter

    return quality_percentile_filter(_docs_ds(sf_dir), q_pct=25)


def q_chunks(sf_dir: str):
    """LLM-pretraining chunking: 64-token sliding windows with stride
    48 over every document — a streaming flat map, chunk text exactly
    reproduced by the SQL list-slice twin."""
    from robosat_ray.stages.text_ops import chunk_documents

    return chunk_documents(_docs_ds(sf_dir))


def q_pii_scrub(sf_dir: str):
    """PII redaction with engine↔oracle RE2 parity: plant one
    deterministic email + phone per doc (pure function of doc_id,
    mirrored in SQL), then count + redact with the exact pattern
    strings the oracle passes to DuckDB's RE2. Byte-exact scrubbed
    text, pure streaming map — no shuffle."""
    from robosat_ray.stages.scrub import pii_scrub

    return pii_scrub(_docs_ds(sf_dir))


def q_top_bigrams(sf_dir: str):
    """Adjacent-token collocations: top-25 bigrams by exact count
    (phrase-mining first pass), count DESC / bigram ASC tiebreak."""
    from robosat_ray.stages.text_ops import top_bigrams

    return top_bigrams(_docs_ds(sf_dir))


def q_postings(sf_dir: str):
    """Distributed inverted index: exact per-token document frequency
    plus the first-K posting doc_ids, output bounded by vocab × K."""
    from robosat_ray.stages.text_ops import postings

    return postings(_docs_ds(sf_dir))


def q_clean_corpus(sf_dir: str):
    """End-to-end cleaning composition: exact dedup -> normalized
    dedup -> survivor-percentile quality gate, one shared text scan,
    all-algebraic (two groupbys + one co-partition join + a scalar
    threshold broadcast)."""
    from robosat_ray.stages.clean import clean_corpus

    return clean_corpus(_docs_ds(sf_dir))


def q_geohash(sf_dir: str):
    """Geohash cell encoding (public base32, lon-first interleave) of
    every page at 6-char precision: the third cell system next to
    z/x/y tiles and quadkeys, fully vectorized (shared Morton
    spreader + byte-matrix string build)."""
    import pyarrow as pa

    from robosat_ray.geo.tiles import geohash_cells, geohash_str

    pts = points_dataset(sf_dir).select_columns(["doc_id", "lon", "my"])

    def gh(batch: pa.Table) -> pa.Table:
        code = geohash_cells(
            batch.column("lon").to_numpy(), batch.column("my").to_numpy()
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "gh_int": pa.array(code),
                "gh": pa.array(geohash_str(code), pa.string()),
            }
        )

    return pts.map_batches(gh, batch_format="pyarrow")


def q_hilbert(sf_dir: str):
    """Hilbert-curve index of every page's z=12 tile — the locality-
    preserving cell ORDER (adjacent tiles adjacent on the curve, which
    Morton breaks across quadrant seams): the key you'd range-
    partition on to keep spatial neighbors in the same shard."""
    import pyarrow as pa

    from robosat_ray.geo.tiles import hilbert_d

    pts = points_dataset(sf_dir).select_columns(["doc_id", "tile_x", "tile_y"])

    def h(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "tile_x": batch.column("tile_x"),
                "tile_y": batch.column("tile_y"),
                "h": pa.array(
                    hilbert_d(
                        batch.column("tile_x").to_numpy(),
                        batch.column("tile_y").to_numpy(),
                        C.Z_JOIN,
                    )
                ),
            }
        )

    return pts.map_batches(h, batch_format="pyarrow")


def q_hexbin(sf_dir: str):
    """Per-hex page counts on the pointy-top axial grid (H3's planar
    analog): in-batch (q, r) combiner -> one small groupby Sum — raw
    pages never shuffle."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from robosat_ray.geo.tiles import hexbin_axial

    pts = points_dataset(sf_dir).select_columns(["doc_id", "lon", "my"])

    def hb(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy()
        y = batch.column("my").to_numpy() * 360.0 - 180.0
        q, r = hexbin_axial(lon, y)
        # offset pack (coords are a few hundred at most): non-negative
        # composite key so unique/unpack are plain integer division
        OFF, M = 1 << 20, 1 << 21
        key = (q + OFF) * M + (r + OFF)
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "hq": pa.array(uniq // M - OFF, pa.int64()),
                "hr": pa.array(uniq % M - OFF, pa.int64()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    agg = (
        pts.map_batches(hb, batch_format="pyarrow")
        .groupby(["hq", "hr"])
        .aggregate(Sum("n", alias_name="n_pages"))
    )
    return agg


def q_pagerank(sf_dir: str):
    """Integer PageRank (6 supersteps) on the bipartite page<->
    footprint graph from the flagship join: per iteration one edge<->
    rank co-partition join + one groupby-dst sum — the Pregel loop as
    Ray Data primitives, bit-exact vs the unrolled SQL twin."""
    import pyarrow as pa

    from robosat_ray.stages.pagerank import pagerank_micro

    joined = flagship(sf_dir, through_html=False).select_columns(
        ["doc_id", "feature_id"]
    )

    def mk_edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy() * 2
        f = batch.column("feature_id").to_numpy() * 2 + 1
        return pa.table(
            {
                "src": pa.array(np.concatenate([d, f])),
                "dst": pa.array(np.concatenate([f, d])),
            }
        )

    return pagerank_micro(joined.map_batches(mk_edges, batch_format="pyarrow"))


def q_token_triangles(sf_dir: str):
    """Triangle counts on the token co-occurrence graph (top-60
    tokens, adjacent-bigram edges): distributed edge mining bounded BY
    CONSTRUCTION at K^2 pairs, exact diag(A^3)/2 per member."""
    from robosat_ray.stages.text_ops import token_triangles

    return token_triangles(_docs_ds(sf_dir))


def q_dup_spans(sf_dir: str):
    """Cross-document repeated-span detection (Lee et al.
    substring-dedup signal): sampled 16-token rolling-hash anchors,
    one hash-bucket shuffle, tie-keeping local top-k. Oracle:
    oracle.DUP_SPANS (HUGEINT wraparound fold twin)."""
    from robosat_ray.stages.neardup import with_variants_batch
    from robosat_ray.stages.spans import dup_spans

    docs = _docs_ds(sf_dir).map_batches(with_variants_batch, batch_format="pyarrow")
    return dup_spans(docs)


def q_bloom_join(sf_dir: str):
    """Bloom-filter semi-join prefilter (deterministic FPs included):
    4 KiB bitmap built over urgent order keys, broadcast once, probe
    is a pure map + in-batch partial agg. Oracle: oracle.BLOOM_JOIN."""
    import ray.data

    from robosat_ray.stages.bloom import bloom_semijoin_agg

    urgent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).filter(expr="o_orderpriority == '1-URGENT'")
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_quantity"],
    )
    return bloom_semijoin_agg(li, urgent)


def q_kmeans(sf_dir: str):
    """Distributed full-corpus KMeans (integer Lloyd): broadcast
    k x d centroid model per round, streaming assignment + partial
    sums, driver merge of k x blocks rows. Oracle: unrolled-CTE
    integer Lloyd (oracle.KMEANS)."""
    import ray.data

    from robosat_ray.stages.cluster import kmeans_assignments

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_assignments(emb)


def q_url_stats(sf_dir: str):
    """URL parse + registered-domain aggregation (C4/RefinedWeb-style
    per-domain curation stats): deterministic URL fixture from
    documents, one RE2 extract_regex parse, (domain, lang) partial
    pre-agg -> two vocabulary-bounded groupbys. Oracle: URL_STATS."""
    import ray.data

    from robosat_ray.stages.urls import rich_urls_batch, url_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return url_stats(docs.map_batches(rich_urls_batch, batch_format="pyarrow"))


def q_bm25(sf_dir: str):
    """Integer-exact BM25 top-k retrieval (ranked search over the
    training corpus): two streaming passes (stats reduce to one row,
    then score + per-block top-k), no shuffle. Oracle: oracle.BM25."""
    from robosat_ray.stages.retrieval import bm25_topk

    return bm25_topk(_docs_ds(sf_dir))


def q_debounce(sf_dir: str):
    """Chain-rule event debounce (streaming telemetry dedup): keep an
    event only if >= 60 s since the last KEPT event of the same
    (user_id, event_type) — dropped events do not reset the clock.
    One hash-bucket shuffle on user_id, then a vectorized per-bucket
    FRONTIER scan (rounds = longest kept-chain, one searchsorted per
    round). Oracle: oracle.DEBOUNCE (recursive-CTE frontier twin)."""
    import ray.data

    from robosat_ray.stages.debounce import debounce_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    return debounce_counts(ev)


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3-style 13-gram train/eval
    overlap): the bounded benchmark fixture's window hashes broadcast
    once (sorted array, ray.put), the train corpus probed with a pure
    map — searchsorted membership + bincount hits, zero shuffles.
    Oracle: oracle.DECONTAMINATE."""
    from robosat_ray.stages.decontaminate import decontaminate

    return decontaminate(_docs_ds(sf_dir))


def q_pack(sf_dir: str):
    """Training-sequence packing (concat-and-chunk): the distributed
    ordered prefix-scan — range-bucket on doc_id, per-bucket partial
    token sums to the driver, one bucket-offset broadcast, local
    cumsum per bucket. Oracle: oracle.PACK (window-frame twin)."""
    from robosat_ray.stages.pack import pack_sequences

    return pack_sequences(_docs_ds(sf_dir))


def q_domain_cap(sf_dir: str):
    """Per-domain contribution cap (RefinedWeb curation rule): parse
    the URL fixture, ONE regdom hash-bucket shuffle, per-bucket
    lexsort + run-length rank, keep <= 3 docs per domain by a
    deterministic LCG rank hash. Oracle: oracle.DOMAIN_CAP."""
    import ray.data

    from robosat_ray.stages.domain_cap import domain_cap

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return domain_cap(docs)


def q_ingest(sf_dir: str):
    """Incremental snapshot ingestion: dedup a new crawl snapshot
    against the existing corpus (content anti-join) AND against
    itself (mirror dedup) in ONE md5 hash-bucket co-partition —
    corpus-scale x corpus-scale, no broadcast side. Oracle:
    oracle.INGEST."""
    from robosat_ray.stages.ingest import ingest_snapshot

    return ingest_snapshot(_docs_ds(sf_dir))


def q_quality_rank(sf_dir: str):
    """Exact distributed rank/percentile normalization of the quality
    score: the pack.py two-pass prefix scan generalized to a VALUE
    key (value-range buckets so ties co-locate, per-bucket counts +
    one offset broadcast, local searchsorted rank). Oracle:
    oracle.QUALITY_RANK (RANK() window twin)."""
    from robosat_ray.stages.rank import quality_rank

    return quality_rank(_docs_ds(sf_dir))


def q_funnel(sf_dir: str):
    """Ordered funnel analysis (signup -> view -> purchase, each step
    within 24 h of the previous matched step, earliest-match greedy):
    one user_id hash-bucket shuffle, per-bucket vectorized
    filter + groupby-min + gather per step. Oracle: oracle.FUNNEL."""
    import ray.data

    from robosat_ray.stages.funnel import funnel

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    return funnel(ev)


def q_cohort(sf_dir: str):
    """Weekly cohort retention triangle (first-signup cohorts, k-week
    activity): ONE user_id hash-bucket shuffle computes cohorts AND
    distinct activity per bucket, exact partial counts, tiny final
    sum. Oracle: oracle.COHORT."""
    import ray.data

    from robosat_ray.stages.cohort import cohort_retention

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    return cohort_retention(ev)


def q_phash_dup(sf_dir: str):
    """Image perceptual-hash dedup: REAL container decode (BMP) ->
    63-bit dHash -> the SimHash pigeonhole banding (shared machinery,
    one fingerprint map adapts the text near-dup stack to images).
    Fixture plants one-bad-pixel re-encodes. Oracle: oracle.PHASH_DUP."""
    from robosat_ray.stages.phash import phash_dup_pairs

    return phash_dup_pairs(_docs_ds(sf_dir))


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): kmeans-cluster the embeddings
    (the `kmeans` query's exact integer-Lloyd chain), then inside each
    cluster drop every vector with a smaller-id semantic duplicate
    (integer tau=0.8 cosine on a coarse unit lattice, blocked in-group
    matmul). Oracle: oracle.SEMDEDUP."""
    import ray.data

    from robosat_ray.stages.ann import with_emb_variants_batch
    from robosat_ray.stages.cluster import KMEANS_K
    from robosat_ray.stages.semdedup import semdedup

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(with_emb_variants_batch, batch_format="pyarrow")
    # k pinned: oracle.SEMDEDUP unrolls exactly KMEANS_K clusters
    return semdedup(emb, k=KMEANS_K)


def q_late_events(sf_dir: str):
    """Late-arrival accounting (watermark lag): per event, how far
    behind the user's running-max event-time (over earlier ARRIVALS,
    arrival order = event_id) it lands. One user hash-bucket shuffle,
    segmented cummax per bucket. Oracle: oracle.LATE_EVENTS."""
    import ray.data

    from robosat_ray.stages.events import late_events

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return late_events(ev)


def q_compact_state(sf_dir: str):
    """Changelog compaction (upsert/CDC staple): latest event per
    (user_id, event_type) with exact integer-micro value. One user
    hash-bucket shuffle, per-bucket sort + keep-last. Oracle:
    oracle.COMPACT_STATE."""
    import ray.data

    from robosat_ray.stages.events import compact_state

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )
    return compact_state(ev)


def q_robust_stats(sf_dir: str):
    """Per-group robust stats (exact median + MAD + 3-MAD outlier
    count): the exact-quantile histogram machinery composed twice
    plus one counting pass — three streaming scans, no raw-row
    shuffle. Oracle: oracle.ROBUST_STATS."""
    import ray.data

    from robosat_ray.stages.robust import robust_stats

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    )
    return robust_stats(li)


def q_mix_sample(sf_dir: str):
    """Temperature-balanced mixture sampling (p ∝ sqrt(domain size),
    alpha=0.5 multilingual/domain tempering): vocabulary-bounded
    count groupby, exact driver-side largest-remainder allocation,
    then the domain co-partition rank scan with per-domain caps.
    Oracle: oracle.MIX_SAMPLE."""
    import ray.data

    from robosat_ray.stages.mixture import mix_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return mix_sample(docs)


def q_span_clean(sf_dir: str):
    """Exact-substring removal (the rewrite step of Lee et al. 2022):
    every non-first occurrence of a duplicated sampled 16-token span
    is cut from its doc; the canonical occurrence and untouched docs
    pass through byte-identical. One anchor-occurrence hash-bucket
    shuffle + a broadcast↔co-partition removal attach. Oracle:
    oracle.SPAN_CLEAN (over the dup_spans variant corpus)."""
    from robosat_ray.stages.neardup import with_variants_batch
    from robosat_ray.stages.spans import remove_dup_spans

    docs = _docs_ds(sf_dir).map_batches(with_variants_batch, batch_format="pyarrow")
    return remove_dup_spans(docs)


def q_dbscan(sf_dir: str):
    """Exact grid-DBSCAN over the page points (eps = DB_R units on
    the zoom-DB_Q quantized plane, minPts = DB_MINPTS): one cell-group
    shuffle mines every eps-pair exactly once, then core/border/noise
    roles and min-label cluster ids resolve on the pair table (driver
    below DBSCAN_DRIVER_PAIR_CAP pairs, co-partition groupbys +
    distributed CC above — bit-equal, see test_dbscan). Oracle:
    oracle.DBSCAN (blocked self-join + recursive-CTE CC)."""
    from robosat_ray.stages.dbscan import dbscan

    pts = points_dataset(sf_dir).select_columns(["doc_id", "lon", "my"])
    return dbscan(pts)


def q_skyline(sf_dir: str):
    """Pareto front of documents on (max alpha-quality micro score,
    max token count): algebraic two-stage skyline — per-block partial
    fronts, one score-bucket shuffle, <= 62-row suffix-extremum
    driver table (no data-scale broadcast, no cap). Oracle:
    oracle.SKYLINE (NOT EXISTS dominance)."""
    from robosat_ray.stages.skyline import skyline

    return skyline(_docs_ds(sf_dir))


def q_bfs_hops(sf_dir: str):
    """Exact 6-superstep BFS hop distances over the eps-pair graph of
    the page points (the dbscan pair miner reused as a graph source);
    source = max-degree hub, tie min id; unreached (incl. isolated
    points) report -1. Broadcast/shuffle superstep switch, flip-tested
    bit-equal. Oracle: oracle.BFS_HOPS (recursive CTE wave)."""
    import pyarrow as pa

    from robosat_ray.stages.bfs import bfs_hops
    from robosat_ray.stages.dbscan import eps_pairs

    pts = points_dataset(sf_dir).select_columns(["doc_id", "lon", "my"]).materialize()
    pairs = eps_pairs(pts)

    def both_dir(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs.map_batches(both_dir, batch_format="pyarrow")
    return bfs_hops(edges, pts.select_columns(["doc_id"]), id_col="doc_id")


def q_lm_score(sf_dir: str):
    """Hashed bigram LM fluency per document (CCNet-style quality
    signal, logarithm-free): corpus unigram/bigram occurrence counts
    in a 2 x 2^18-slot broadcast model, floor-mean integer conditional
    probability per doc. Oracle: oracle.LM_SCORE."""
    from robosat_ray.stages.lm import lm_fluency

    return lm_fluency(_docs_ds(sf_dir))


def q_sssp(sf_dir: str):
    """Exact 4-round weighted shortest paths (Bellman-Ford supersteps
    with delta frontiers) over the eps-pair graph, edge weight = 1 +
    quantized squared distance; source = max-degree hub, tie min id;
    unreached within K hops -> -1. Broadcast/shuffle round switch,
    flip-tested bit-equal. Oracle: oracle.SSSP (unrolled K-level CTE)."""
    import pyarrow as pa

    from robosat_ray.stages.dbscan import eps_pairs
    from robosat_ray.stages.sssp import sssp

    pts = points_dataset(sf_dir).select_columns(["doc_id", "lon", "my"]).materialize()
    pairs = eps_pairs(pts, with_d2=True)

    def both_dir(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        d2 = batch.column("d2").to_numpy()
        w = 1 + d2
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
                "w": pa.array(np.concatenate([w, w])),
            }
        )

    edges = pairs.map_batches(both_dir, batch_format="pyarrow")
    return sssp(edges, pts.select_columns(["doc_id"]), id_col="doc_id")


def q_kcore(sf_dir: str):
    """Fixed-round k-core peeling (Seidman 1983; 4 rounds, k=3) over
    the eps-pair graph: survivors of round i are round i-1 survivors
    with >= k neighbors among round i-1 survivors. in_core 0/1 +
    core_deg within the final core (-1 for peeled/isolated points).
    Broadcast/shuffle peel switch, flip-tested bit-equal. Oracle:
    oracle.KCORE (unrolled survivor-set levels)."""
    import pyarrow as pa

    from robosat_ray.stages.dbscan import eps_pairs
    from robosat_ray.stages.kcore import kcore

    pts = points_dataset(sf_dir).select_columns(["doc_id", "lon", "my"]).materialize()
    pairs = eps_pairs(pts)

    def both_dir(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs.map_batches(both_dir, batch_format="pyarrow")
    return kcore(edges, pts.select_columns(["doc_id"]), id_col="doc_id")


def q_ols_fit(sf_dir: str):
    """Distributed OLS fit of the quality model n_alpha ~ b0 +
    b1*n_tokens + b2*n_chars: exact integer sufficient statistics
    (per-block partials, Python-int driver reduce, zero shuffle),
    Cramer 3x3 solve in float64 with the expression tree mirrored by
    oracle.OLS_FIT, betas as int64 micros."""
    from robosat_ray.stages.regress import ols_fit

    return ols_fit(_docs_ds(sf_dir))


def q_ols_residuals(sf_dir: str):
    """Top-20 curation outliers of the OLS quality model: docs whose
    alphabetic mass diverges most from the length-based expectation
    (|resid_micro| desc, tie doc_id asc). Residuals are pure int64
    arithmetic once the betas are micros. Oracle: oracle.OLS_RESIDUALS."""
    from robosat_ray.stages.regress import ols_residuals

    return ols_residuals(_docs_ds(sf_dir))


def q_cheapest_supplier(sf_dir: str):
    """TPC-H-Q2-shaped argmin-per-group join-back: for every part
    with lineitems, the cheapest offer and the supplier making it
    (tie -> min suppkey). The two-key argmin (price, suppkey) is
    encoded into ONE int64 (price_cents * 2^20 + suppkey, suppkey
    asserted < 2^20), so the whole reduction is per-block
    np.minimum.at partials + one part-bounded groupby-Min — no
    window, no sort. Supplier names attach via a broadcast lookup
    (dimension-table pattern). Oracle: oracle.CHEAPEST_SUPPLIER."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Min

    ENC = 1 << 20
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )

    def enc_argmin(batch: pa.Table) -> pa.Table:
        price = np.floor(
            batch.column("l_extendedprice").to_numpy() * 100 + 0.5
        ).astype(np.int64)
        sk = batch.column("l_suppkey").to_numpy()
        assert sk.max(initial=0) < ENC and sk.min(initial=0) >= 0, (
            "suppkey outside the 2^20 encode range"
        )
        e = price * ENC + sk
        pk = batch.column("l_partkey").to_numpy()
        un, codes = np.unique(pk, return_inverse=True)
        mv = np.full(len(un), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mv, codes, e)
        return pa.table({"p_partkey": pa.array(un), "enc": pa.array(mv)})

    m = (
        li.map_batches(enc_argmin, batch_format="pyarrow")
        .groupby("p_partkey")
        .aggregate(Min("enc", alias_name="enc"))
    )

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    skeys = sup.column("s_suppkey").to_numpy().astype(np.int64)
    order = np.argsort(skeys)
    sref = ray.put((skeys[order], sup.column("s_name").to_numpy()[order]))

    def finish(batch: pa.Table, _s=sref) -> pa.Table:
        keys, names = ray.get(_s)
        enc = batch.column("enc").to_numpy()
        price = enc // ENC
        sk = enc % ENC
        pos = np.searchsorted(keys, sk)
        assert (keys[np.clip(pos, 0, len(keys) - 1)] == sk).all(), (
            "lineitem references an unknown supplier"
        )
        return pa.table(
            {
                "p_partkey": batch.column("p_partkey"),
                "min_price_cents": pa.array(price),
                "s_suppkey": pa.array(sk),
                "s_name": pa.array(names[pos]),
            }
        )

    return m.map_batches(finish, batch_format="pyarrow")


def q_idw_interp(sf_dir: str):
    """IDW interpolation of page n_chars to tile centers over the
    occupied z=12 lattice: 3x3 halo contributions with pure-integer
    weights (w = 2^24 // (px_dist^2 + 1)), per-batch compaction to
    (tile, num, den, n_own) partials, ONE tile-bounded groupby Sum,
    exact floor-ratio finisher. Oracle: oracle.IDW_INTERP."""
    import ray.data

    from robosat_ray.stages.interp import idw_tile_interp

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return idw_tile_interp(docs)


def q_colloc_lift(sf_dir: str):
    """Collocation mining by lift (the PMI-family score kept exact as
    one integer floor division): top-25 adjacent token pairs most
    over-represented vs token independence, min support 5. Oracle:
    oracle.COLLOC_LIFT."""
    from robosat_ray.stages.text_ops import colloc_lift

    return colloc_lift(_docs_ds(sf_dir))


def q_nearest_foot(sf_dir: str):
    """Map matching: every page snaps to the nearest footprint center
    within its 3x3 tile ring (z=12) — broadcast cell-CSR probe, zero
    shuffle, exact integer distance ranking. Oracle:
    oracle.NEAREST_FOOT."""
    import pyarrow.parquet as pq

    from robosat_ray.stages.mapmatch import nearest_footprint

    keys = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey"]
    ).column("p_partkey").to_numpy()
    pts = points_dataset(sf_dir).select_columns(["doc_id", "lon", "my"])
    return nearest_footprint(pts, keys)


def q_promo_share(sf_dir: str):
    """TPC-H-Q14-shaped promo revenue share for ship-year 1996:
    revenue in exact integer cents, part types attached via a
    broadcast dimension lookup (ray.put once, searchsorted per
    batch), one-row partials summed by a constant-key groupby, the
    share ratio finished with Python ints (the 1e6-scaled numerator
    outgrows int64 at sf>=0.1). Oracle: oracle.PROMO_SHARE."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy().astype(np.int64)
    order = np.argsort(pk)
    is_promo = (np.asarray(part.column("p_type").to_pylist(), dtype=object) == "PROMO")[order]
    pref = ray.put((pk[order], is_promo))
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")

    def partial(batch: pa.Table, _p=pref) -> pa.Table:
        keys, promo = ray.get(_p)
        ship = batch.column("l_shipdate").to_numpy()
        keep = (ship >= lo) & (ship < hi)
        ext = batch.column("l_extendedprice").to_numpy()[keep]
        disc = batch.column("l_discount").to_numpy()[keep]
        pkey = batch.column("l_partkey").to_numpy()[keep]
        rev = np.floor(ext * (1 - disc) * 100 + 0.5).astype(np.int64)
        pos = np.searchsorted(keys, pkey)
        assert (keys[np.clip(pos, 0, len(keys) - 1)] == pkey).all(), (
            "lineitem references an unknown part"
        )
        isp = promo[pos]
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "promo_cents": pa.array([int(rev[isp].sum())], pa.int64()),
                "total_cents": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        p = int(batch.column("promo_cents")[0].as_py())
        t = int(batch.column("total_cents")[0].as_py())
        return pa.table(
            {
                "promo_cents": pa.array([p], pa.int64()),
                "total_cents": pa.array([t], pa.int64()),
                "promo_share_micro": pa.array([p * 1_000_000 // t], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_event_transitions(sf_dir: str):
    """Same-session Markov transition counts of the event stream:
    one user-hash bucket shuffle, per-bucket vectorized adjacency,
    type-pair-bounded partials, tiny groupby Sum. Oracle:
    oracle.EVENT_TRANSITIONS."""
    import ray.data

    from robosat_ray.stages.events import event_transitions

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return event_transitions(ev)


def q_basket_pairs(sf_dir: str):
    """Market-basket co-occurrence mining: top-25 distinct part pairs
    bought in the same order (count DESC, part_a/part_b ASC ties).
    One l_orderkey hash-bucket shuffle; per-bucket pandas self-merge
    generates pairs (bounded: TPC-H orders hold <= 7 lineitems, so
    the pair blow-up is <= 21 per order BY CONSTRUCTION of the
    schema); pairs encode into one int64 and compact per bucket; a
    second pkey hash-bucket pass combines counts exactly and emits
    per-bucket tie-preserving top-25s (pair counts are ~all-unique
    keys — the worst case for Ray's sort aggregate, 57 s vs 3 s
    measured at sf0.01). Oracle: oracle.BASKET_PAIRS."""
    import ray.data

    from robosat_ray.functions.hashing import hash_bucket

    ENC = 1 << 32
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "obucket",
            pa.array(hash_bucket(b.column("l_orderkey").to_numpy(), 64)),
        )

    def pairs(group):
        import pandas as pd

        d = group[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        if m.empty:
            return pd.DataFrame(
                {
                    "part_a": pd.Series([], dtype=np.int64),
                    "part_b": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        key = m["l_partkey_x"].to_numpy() * ENC + m["l_partkey_y"].to_numpy()
        uniq, counts = np.unique(key, return_counts=True)
        # single int64 pair key: Ray's multi-key aggregate is a known
        # hot spot (see the r3 near-dup pair-dedup fix) — decode to
        # (part_a, part_b) only after the tiny top-k
        return pd.DataFrame({"pkey": uniq, "n": counts.astype(np.int64)})

    mined = (
        li.map_batches(bucket, batch_format="pyarrow")
        .groupby("obucket")
        .map_groups(pairs, batch_format="pandas")
    )

    # pair counts are ~all-unique keys, the worst case for Ray's
    # sort-based aggregate (57 s for 119k keys at sf0.01, measured).
    # Instead: pkey hash-bucket co-partition, per-bucket exact
    # unique-sum, and — because pkey -> bucket is a FUNCTION, every
    # pair's count combines fully inside one bucket — a per-bucket
    # tie-preserving top-25. The global top-25 is a subset of the
    # union of bucket top-25s.
    def pbucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "pbucket", pa.array(hash_bucket(b.column("pkey").to_numpy(), 64))
        )

    def bucket_topk(group):
        import pandas as pd

        key = group["pkey"].to_numpy()
        n = group["n"].to_numpy()
        uniq, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, n)
        if len(tot) > 25:
            kth = np.partition(tot, len(tot) - 25)[len(tot) - 25]
            keep = tot >= kth
            uniq, tot = uniq[keep], tot[keep]
        return pd.DataFrame({"pkey": uniq, "n": tot})

    small = (
        mined.map_batches(pbucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    small["part_a"] = (small["pkey"] // ENC).astype(np.int64)
    small["part_b"] = (small["pkey"] % ENC).astype(np.int64)
    small = small.drop(columns=["pkey"])
    small = small.sort_values(
        ["n", "part_a", "part_b"], ascending=[False, True, True], kind="stable"
    ).head(25)
    small["rank"] = np.arange(1, len(small) + 1, dtype=np.int64)
    return small.reset_index(drop=True)


def q_zonal_stats(sf_dir: str):
    """Zonal statistics: per footprint zone, count/sum/min/max of the
    pages whose point falls inside it — the flagship PIP join with
    the page payload attached via a doc_id co-partition join, then
    ONE zone-bounded groupby. Oracle: oracle.ZONAL_STATS."""
    import pyarrow as _pa
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    from robosat_ray.stages.join import copartition_join

    joined = flagship(sf_dir, through_html=False).select_columns(
        ["doc_id", "feature_id"]
    )
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    j = copartition_join(
        joined,
        docs,
        on="doc_id",
        schema_hints={
            "left": {"doc_id": _pa.int64(), "feature_id": _pa.int64()},
            "right": {"doc_id": _pa.int64(), "n_chars": _pa.int64()},
        },
    )
    return j.groupby("feature_id").aggregate(
        Count(alias_name="n_pages"),
        Sum("n_chars", alias_name="sum_chars"),
        Min("doc_id", alias_name="min_doc"),
        Max("doc_id", alias_name="max_doc"),
    )


def q_doc_keywords(sf_dir: str):
    """Per-document keyword: argmax tf*idf_milli over the doc's
    tokens (tie -> smallest token), hashed-bucket idf broadcast once.
    Oracle: oracle.DOC_KEYWORDS."""
    from robosat_ray.stages.text_ops import doc_keywords

    return doc_keywords(_docs_ds(sf_dir))


def q_interval_union(sf_dir: str):
    """Per-user union of overlapping [ts, ts + value-seconds)
    intervals: merged-island count + total covered microseconds —
    the interval-merge/coverage operator (variable-length ends, so
    the break rule needs a running-max, not sessionize's prev-row
    gap). Oracle: oracle.INTERVAL_UNION."""
    import ray.data

    from robosat_ray.stages.events import interval_union

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return interval_union(ev)


def q_edit_dup(sf_dir: str):
    """Edit-distance near-dup pairs: (lang, 8-char prefix) blocking,
    capped blocks, exact batched-DP Levenshtein over 64-char slices
    (fuzzy record linkage). Oracle: oracle.EDIT_DUP."""
    import ray.data

    from robosat_ray.stages.neardup import edit_dup_pairs_ds

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    return edit_dup_pairs_ds(docs)


def q_top_supplier(sf_dir: str):
    """TPC-H-Q15-shape: supplier(s) with max 1996Q1 lineitem revenue,
    ties kept. Exact integer cents per row, per-batch np.add.at
    partials, dimension-bounded per-supplier aggregate materialized
    once; names fetched for the WINNER SET only (tiny isin filter
    pushed through the supplier scan — no supplier broadcast).
    Oracle: oracle.TOP_SUPPLIER."""
    import ray.data
    from ray.data.aggregate import Sum

    lo = np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
    hi = np.datetime64("1996-04-01").astype("datetime64[us]").astype(np.int64)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate").cast(pa.int64()).to_numpy()
        m = (ts >= lo) & (ts < hi)
        sk = b.column("l_suppkey").to_numpy()[m]
        rev = b.column("l_extendedprice").to_numpy()[m] * (
            1.0 - b.column("l_discount").to_numpy()[m]
        )
        cents = np.floor(rev * 100.0 + 0.5).astype(np.int64)
        uk, inv = np.unique(sk, return_inverse=True)
        tot = np.zeros(len(uk), dtype=np.int64)
        np.add.at(tot, inv, cents)
        return pa.table({"s_suppkey": pa.array(uk), "cents": pa.array(tot)})

    per_supp = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("cents", alias_name="total_rev_cents"))
        .materialize()
    )
    maxv = per_supp.max("total_rev_cents")
    winners = per_supp.filter(expr=f"total_rev_cents == {maxv}").to_pandas()
    warr = np.sort(winners["s_suppkey"].to_numpy(dtype=np.int64))

    def pick(b: pa.Table) -> pa.Table:
        k = b.column("s_suppkey").to_numpy()
        return b.filter(pa.array(np.isin(k, warr)))

    names = (
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
        )
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    out = names.merge(winners, on="s_suppkey").sort_values("s_suppkey")
    return out[["s_suppkey", "s_name", "total_rev_cents"]].reset_index(drop=True)


def q_cusum_alerts(sf_dir: str):
    """Per-user CUSUM change detection (Page's statistic) over the
    ordered value stream — sequential recursion made distributed via
    the cumsum - cummin closed form. Oracle: oracle.CUSUM_ALERTS."""
    import ray.data

    from robosat_ray.stages.events import cusum_alerts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    return cusum_alerts(ev)


def q_user_trend(sf_dir: str):
    """Per-user OLS trend slope as an exact rational (num, den) —
    five algebraic moments, one groupby, no float division.
    Oracle: oracle.USER_TREND."""
    import ray.data

    from robosat_ray.stages.events import user_trend

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return user_trend(ev)


def q_twap(sf_dir: str):
    """Per-user time-weighted average value (LOCF integral) as an
    exact rational (num, den) — one user-bucket shuffle, vectorized
    per-bucket diff. Oracle: oracle.TWAP."""
    import ray.data

    from robosat_ray.stages.events import twap

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    return twap(ev)


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of the quality-score and length ranks
    (top-50 by fused score): two exact distributed RANK() passes, one
    doc_id co-partition join, bounded partial top-k.
    Oracle: oracle.RRF_FUSION."""
    import ray.data

    from robosat_ray.stages.rank import rrf_fusion

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    return rrf_fusion(docs)


def q_entity_clusters(sf_dir: str):
    """Entity resolution: edit-distance match pairs -> connected
    components -> canonical entity labels (block, compare, cluster).
    Oracle: oracle.ENTITY_CLUSTERS."""
    import ray.data

    from robosat_ray.stages.neardup import entity_clusters

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    return entity_clusters(docs)


def q_safe_split(sf_dir: str):
    """Leakage-safe train/val split: near-dup clusters assigned to a
    side as a unit (cluster-id hash), so no validation near-dup leaks
    into train. Oracle: oracle.SAFE_SPLIT."""
    from robosat_ray.stages.neardup import with_variants_batch
    from robosat_ray.stages.split import leakage_safe_split

    docs = _docs_ds(sf_dir).map_batches(with_variants_batch, batch_format="pyarrow")
    return leakage_safe_split(docs)


def q_ann_recall(sf_dir: str):
    """Retrieval eval harness: recall@k of the IVF index against the
    exact brute-force scan — per-query hit count over the SAME query
    sample both pipelines share. Result is bounded by n_queries x k,
    so the final merge is a driver-side frame op by construction.
    Oracle: oracle.ANN_RECALL."""
    brute = q_ann(sf_dir).to_pandas()
    ivf = q_ann_ivf(sf_dir).to_pandas()
    hit = ivf[["query_id", "neighbor_id"]].assign(hit=np.int64(1))
    m = brute.merge(hit, on=["query_id", "neighbor_id"], how="left")
    m["hit"] = m["hit"].fillna(0).astype(np.int64)
    out = (
        m.groupby("query_id", sort=True)
        .agg(n_hits=("hit", "sum"), k=("hit", "size"))
        .reset_index()
    )
    return out.astype({"query_id": np.int64, "n_hits": np.int64, "k": np.int64})


def _events_ds(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def q_scd2(sf_dir: str):
    """SCD type-2 state-interval build over the event changelog:
    [valid_from, valid_to) per (user_id, event_type), open intervals
    pinned. One user hash-bucket shuffle. Oracle: oracle.SCD2."""
    from robosat_ray.stages.timeline import scd2

    return scd2(_events_ds(sf_dir))


def q_gap_fill(sf_dir: str):
    """Hourly resample + forward fill of each user's value series
    (the streaming generate_series + ASOF JOIN). Oracle:
    oracle.GAP_FILL."""
    from robosat_ray.stages.timeline import gap_fill

    return gap_fill(_events_ds(sf_dir))


def q_ewma(sf_dir: str):
    """Exact dyadic EWMA (alpha=1/2, trailing 16 events) per event as
    int64 numerator/denominator — hash-hard smoothing. Oracle:
    oracle.EWMA."""
    from robosat_ray.stages.timeline import ewma

    return ewma(_events_ds(sf_dir))


def q_session_paths(sf_dir: str):
    """Session path mining: counts of in-session event-type trigrams
    "a>b>c" (order-3 Markov extension of event_transitions). Oracle:
    oracle.SESSION_PATHS."""
    from robosat_ray.stages.timeline import session_paths

    return session_paths(_events_ds(sf_dir))


def q_moran(sf_dir: str):
    """Global Moran's I (rook adjacency) of per-tile page counts as
    exact integer numerator/denominator — spatial autocorrelation of
    the geocoded corpus with zero broadcasts: one cell groupby + one
    64-bucket message groupby, algebraic partials throughout. Oracle:
    oracle.MORAN."""
    from robosat_ray.stages.spatial_stats import moran_i

    return moran_i(points_dataset(sf_dir))


def q_label_prop(sf_dir: str):
    """5-round synchronous min-label propagation over the eps-pair
    graph: community = min doc_id within 5 hops (isolated points are
    their own community). Delta-frontier supersteps with the standard
    broadcast/shuffle switch, flip-tested bit-equal. Oracle:
    oracle.LABEL_PROP (unrolled K-level groupby-min CTE)."""
    import pyarrow as pa

    from robosat_ray.stages.dbscan import eps_pairs
    from robosat_ray.stages.labelprop import label_prop

    pts = points_dataset(sf_dir).select_columns(["doc_id", "lon", "my"]).materialize()
    pairs = eps_pairs(pts)

    def both_dir(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs.map_batches(both_dir, batch_format="pyarrow")
    return label_prop(edges, pts.select_columns(["doc_id"]), id_col="doc_id")


def q_ppjoin(sf_dir: str):
    """Exact tau=9/10 Jaccard set-similarity self-join over hashed
    unique token sets (doc_id % 10 == 0 subset + house variants) via
    PPJoin prefix filtering: df-ordered prefixes are complete by
    pigeonhole, so the candidate filter is aggressive and the result
    is still EXACT — the lossless counterpart to the MinHash/SimHash
    near-dup family. Oracle: oracle.PPJOIN (plain brute force —
    nothing to mirror)."""
    import pyarrow as pa

    from robosat_ray.stages.ppjoin import ppjoin_pairs

    def subset(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return batch.filter(pa.array(ids % 10 == 0))

    return ppjoin_pairs(_docs_ds(sf_dir).map_batches(subset, batch_format="pyarrow"))


def q_tile_pyramid(sf_dir: str):
    """Full tile-pyramid rollup: page counts at EVERY zoom level
    Z_JOIN..0 (the slippy-map mipmap — rs cover's tile set aggregated
    up the pyramid). Two-stage algebraic plan: in-batch (cell, count)
    combiner + leaf-cell groupby, then the tiny leaf table fans out
    its ancestor chain (13 rows per leaf cell) into one final groupby
    — raw pages shuffle once, the pyramid never sees them. Oracle:
    oracle.TILE_PYRAMID."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    pts = points_dataset(sf_dir).select_columns(["tile_x", "tile_y"])
    z_top = C.Z_JOIN

    def partial(batch: pa.Table) -> pa.Table:
        tx = batch.column("tile_x").to_numpy()
        ty = batch.column("tile_y").to_numpy()
        cell = tx * (1 << z_top) + ty
        uk, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {"cell": pa.array(uk), "pn": pa.array(cnt.astype(np.int64))}
        )

    leaf = (
        pts.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("pn", alias_name="pn"))
    )

    def ancestors(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        pn = batch.column("pn").to_numpy()
        tx, ty = cell >> z_top, cell % (1 << z_top)
        zs = np.arange(z_top + 1, dtype=np.int64)
        n = len(cell)
        z = np.tile(zs, n)
        sh = z_top - z
        txr = np.repeat(tx, z_top + 1) >> sh
        tyr = np.repeat(ty, z_top + 1) >> sh
        return pa.table(
            {
                "z": pa.array(z),
                "tx": pa.array(txr),
                "ty": pa.array(tyr),
                "pn": pa.array(np.repeat(pn, z_top + 1)),
            }
        )

    out = (
        leaf.map_batches(ancestors, batch_format="pyarrow")
        .groupby(["z", "tx", "ty"])
        .aggregate(Sum("pn", alias_name="n_pages"))
    )
    return out


def q_audience_overlap(sf_dir: str):
    """Pairwise audience Jaccard across event types: distinct-user
    intersection / union per unordered type pair, via one user-bucket
    shuffle with types^2-bounded partials. Oracle:
    oracle.AUDIENCE_OVERLAP."""
    from robosat_ray.stages.audience import audience_overlap

    return audience_overlap(_events_ds(sf_dir))


def q_ship_overlap(sf_dir: str):
    """Interval self-overlap join per supplier: unordered overlapping
    shipment-window pairs + peak day-concurrency, computed in ONE
    suppkey hash-bucket shuffle with segment-vectorized searchsorted /
    sweep kernels (interval x interval overlap — the join shape asof /
    range joins don't cover). Oracle: oracle.SHIP_OVERLAP."""
    import ray

    from robosat_ray.stages.overlap import ship_overlap

    return ship_overlap(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_quantity", "l_shipdate"],
        )
    )


def q_small_qty_revenue(sf_dir: str):
    """TPC-H-Q17-shape: correlated per-part average join-back — revenue
    of lineitems below 0.2x their part's average quantity, exact
    integers end-to-end. Oracle: oracle.SMALL_QTY_REVENUE."""
    import ray.data

    from robosat_ray.stages.tpch import small_qty_revenue

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    return small_qty_revenue(li)


def q_big_orders(sf_dir: str):
    """TPC-H-Q18-shape: groupby-HAVING winner orders (sum quantity >
    250) enriched through orders and customer join-backs.
    Oracle: oracle.BIG_ORDERS."""
    import ray.data

    from robosat_ray.stages.tpch import big_orders

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    return big_orders(li, orders, cust)


def q_part_share(sf_dir: str):
    """TPC-H-Q11-shape: global-scalar HAVING — parts whose revenue
    share exceeds 1.5x the mean share; the total is one driver scalar
    over the group-bounded per-part table, never a second shuffle.
    Oracle: oracle.PART_SHARE."""
    import ray.data

    from robosat_ray.stages.tpch import part_share

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    return part_share(li)


def q_late_suppliers(sf_dir: str):
    """TPC-H-Q21-shape: suppliers who were the SOLE late shipper on a
    multi-supplier order — per-(order,supplier) lateness then per-order
    distinct/late counts inside ONE orderkey hash-bucket shuffle.
    Oracle: oracle.LATE_SUPPLIERS."""
    import ray.data

    from robosat_ray.stages.tpch import late_suppliers

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    return late_suppliers(li, orders, supp)


def q_convex_hull(sf_dir: str):
    """Distributed convex hull per region group (city extent polygon):
    per-batch LOCAL hulls are an exact combiner (hull(union) =
    hull(union of hulls)), so the per-group finish sees only
    O(batches x hull size) points. Integer-lattice orientation tests;
    oracle is the O(n^3) brute-force edge predicate.
    Oracle: oracle.CONVEX_HULL."""
    import ray.data

    from robosat_ray.stages.hull import convex_hull_edges

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"]
    )
    return convex_hull_edges(parts)


def q_gram_matrix(sf_dir: str):
    """Exact int64 gram matrix E^T E over quantized embeddings — the
    distributed PCA/covariance primitive: per-batch M^T M partials
    (d x d per batch, facts never shuffle). Oracle: oracle.GRAM_MATRIX."""
    import ray.data

    from robosat_ray.stages.linalg import gram_matrix

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )
    return gram_matrix(emb)


def q_sliding_dau(sf_dir: str):
    """7-day rolling distinct active users per day, computed as per-user
    coverage intervals + a +1/-1 day sweep — no day x user range join.
    Oracle: oracle.SLIDING_DAU (the brute-force range join)."""
    import ray.data

    from robosat_ray.stages.retention import sliding_dau

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return sliding_dau(ev)


def q_rolling_median(sf_dir: str):
    """Exact per-user rolling median (trailing 5 rows) of the cent
    value — rank-statistic windowing via stride-view sort per bucket.
    Oracle: oracle.ROLLING_MEDIAN."""
    import ray.data

    from robosat_ray.stages.events import rolling_median

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    return rolling_median(ev)


def q_hits(sf_dir: str):
    """Integer HITS hubs/authorities (3 rounds) on the page<->footprint
    bipartite graph — the two-coupled-vector Pregel loop.
    Oracle: oracle.HITS (unrolled CTE chain)."""
    import pyarrow as pa

    from robosat_ray.stages.pagerank import hits_scores

    joined = flagship(sf_dir, through_html=False).select_columns(
        ["doc_id", "feature_id"]
    )

    def mk_edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy() * 2
        f = batch.column("feature_id").to_numpy() * 2 + 1
        return pa.table(
            {
                "src": pa.array(np.concatenate([d, f])),
                "dst": pa.array(np.concatenate([f, d])),
            }
        )

    return hits_scores(joined.map_batches(mk_edges, batch_format="pyarrow"))


def q_set_cover(sf_dir: str):
    """Greedy coverage-maximizing corpus selection (4 submodular
    rounds): per-round zero-shuffle argmax partials over per-doc token
    sets, covered set broadcast. Oracle: oracle.SET_COVER."""
    import ray.data

    from robosat_ray.stages.selection import set_cover

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return set_cover(docs)


def q_kmv_sketch(sf_dir: str):
    """K-minimum-values distinct sketch per event type (mergeable
    bottom-k of md5 hashes) — completes the sketch family (HLL, CMS,
    Bloom). Oracle: oracle.KMV_SKETCH."""
    import ray.data

    from robosat_ray.stages.distinct import kmv_sketch

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return kmv_sketch(ev)


def q_seg_intersect(sf_dir: str):
    """Exact road-segment x building-rect intersection join (SAT corner
    test on the integer lattice), cell co-partitioned with owner-cell
    single emission — the line-geometry join beyond PIP/bbox.
    Oracle: oracle.SEG_INTERSECT."""
    from robosat_ray.stages.seg_intersect import seg_intersect
    from robosat_ray.synth.footprints import footprints_dataset

    return seg_intersect(footprints_dataset(sf_dir))


def q_rnn_match(sf_dir: str):
    """Reciprocal nearest neighbors (mutual cosine top-k) over the
    stride-subset universe — the high-precision match criterion for
    record linking / near-dup mining. Oracle: oracle.RNN_MATCH."""
    import ray.data

    from robosat_ray.stages.ann import RNN_STRIDE, rnn_pairs

    f = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    ids_parts, emb_parts = [], []
    for rb in f.iter_batches(columns=["vec_id", "embedding"]):
        ids = rb.column(0).to_numpy().astype(np.int64)
        sel = np.flatnonzero(ids % RNN_STRIDE == 0)
        if len(sel):
            ids_parts.append(ids[sel])
            emb_parts.append(
                np.array(
                    rb.column(1).take(pa.array(sel)).to_pylist(),
                    dtype=np.float64,
                )
            )
    qids = np.concatenate(ids_parts)
    Q = np.concatenate(emb_parts)
    def sub(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy()
        return b.filter(pa.array(ids % RNN_STRIDE == 0))

    emb_sub = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(sub, batch_format="pyarrow")
    return rnn_pairs(emb_sub, qids, Q)


def q_table_checksum(sf_dir: str):
    """Per-bucket XOR-of-md5 table fingerprint (anti-entropy /
    replication-verification certificate); mergeable, shuffle carries
    buckets only. Oracle: oracle.TABLE_CHECKSUM."""
    import ray.data

    from robosat_ray.stages.text_ops import table_checksum

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return table_checksum(docs)


def q_adaptive_grid(sf_dir: str):
    """Equi-depth 16x16 adaptive tiling (exact NTILE per axis) — the
    skew-proof balanced partition grid for hot cities; two distributed
    rank scans + one doc co-partition join. Oracle: oracle.ADAPTIVE_GRID."""
    import ray.data

    from robosat_ray.stages.adaptive import adaptive_grid

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    return adaptive_grid(docs)


def q_skew_report(sf_dir: str):
    """Exact integer Gini + hottest-cell share of the per-cell page
    distribution — the skew diagnostic behind the flagship's salting
    decisions. Oracle: oracle.SKEW_REPORT."""
    import ray.data

    from robosat_ray.stages.skew import skew_report

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    return skew_report(docs)


def q_domain_drift(sf_dir: str):
    """Per-source token-distribution L1 drift vs the global mixture
    (256 md5 buckets, exact per-million shares) — the data-mixture
    shift diagnostic. Oracle: oracle.DOMAIN_DRIFT."""
    import ray.data

    from robosat_ray.stages.drift import domain_drift

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    return domain_drift(docs)


def q_bpe_merges(sf_dir: str):
    """Greedy BPE merge training (3 rounds): per-round zero-shuffle
    dense pair-count partials + driver argmax — the tokenizer-fit
    primitive. Oracle: oracle.BPE_MERGES."""
    import ray.data

    from robosat_ray.stages.bpe_train import bpe_merges

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return bpe_merges(docs)


def q_union_area(sf_dir: str):
    """Exact dissolve: union AREA of each region's building rects via
    x-strip scanline + per-strip y-interval union (gaps-and-islands),
    all integer lattice arithmetic. Oracle: oracle.UNION_AREA."""
    from robosat_ray.stages.union_area import union_area
    from robosat_ray.synth.footprints import footprints_dataset

    return union_area(footprints_dataset(sf_dir))


def q_priority_counts(sf_dir: str):
    """TPC-H-Q4-shape: EXISTS semi-join aggregate — orders with any
    late lineitem counted per priority; lineitems reduce to per-order
    max shipdate inside combiners. Oracle: oracle.PRIORITY_COUNTS."""
    import ray.data

    from robosat_ray.stages.tpch import priority_counts

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
    )
    return priority_counts(li, orders)


def q_mode_per_user(sf_dir: str):
    """Exact distributed mode (argmax-per-group): each user's most
    frequent event type, ties to the smallest type.
    Oracle: oracle.MODE_PER_USER."""
    import ray.data

    from robosat_ray.stages.events import mode_per_user

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return mode_per_user(ev)


def q_user_journey(sf_dir: str):
    """Per-user first/last-touch journey summary (FIRST/LAST_VALUE
    window surface): one user-bucket shuffle, segment-vectorized
    first/last/min/max. Oracle: oracle.USER_JOURNEY."""
    import ray.data

    from robosat_ray.stages.events import user_journey

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return user_journey(ev)


QUERIES = {
    "extract_text": q_extract_text,
    "tile_assign": q_tile_assign,
    "cover": q_cover,
    "spatial_join": q_spatial_join,
    "join_agg": q_join_agg,
    "knn": q_knn,
    "exact_dedup": q_exact_dedup,
    "token_count": q_token_count,
    "fingerprints": q_fingerprints,
    "rasterize_fg": q_rasterize_fg,
    "mask_png": q_mask_png,
    "pbf_extract": q_pbf_extract,
    "merge_components": q_merge_components,
    "dedupe": q_dedupe,
    "near_dup": q_near_dup,
    "ngram_jaccard": q_ngram_jaccard,
    "simhash": q_simhash,
    "quality": q_quality,
    "langid": q_langid,
    "ann": q_ann,
    "class_weights": q_class_weights,
    "segmentation_metrics": q_segmentation_metrics,
    "events_window": q_events_window,
    "events_running": q_events_running,
    "top_tiles": q_top_tiles,
    "media_features": q_media_features,
    "jpeg_features": q_jpeg_features,
    "quantile_sketch": q_quantile_sketch,
    "delta_dup": q_delta_dup,
    "mvt_tiles": q_mvt_tiles,
    "ann_ivf": q_ann_ivf,
    "compare_filter": q_compare_filter,
    "subset": q_subset,
    "merge_unions": q_merge_unions,
    "merge_geometry": q_merge_geometry,
    "featurize": q_featurize,
    "featurize_stats": q_featurize_stats,
    "featurize_moments": q_featurize_moments,
    "emb_dup": q_emb_dup,
    "epoch_loss": q_epoch_loss,
    "events_sessions": q_events_sessions,
    "order_revenue": q_order_revenue,
    "price_quantiles": q_price_quantiles,
    "events_pivot": q_events_pivot,
    "events_asof": q_events_asof,
    "events_range_join": q_events_range_join,
    "sample_stratified": q_sample_stratified,
    "top_docs_per_lang": q_top_docs_per_lang,
    "events_window_fns": q_events_window_fns,
    "simhash_dup": q_simhash_dup,
    "pricing_summary": q_pricing_summary,
    "cust_no_orders": q_cust_no_orders,
    "active_parts": q_active_parts,
    "hopping_window": q_hopping_window,
    "daily_users": q_daily_users,
    "hll_users": q_hll_users,
    "order_counts_dist": q_order_counts_dist,
    "lang_families": q_lang_families,
    "top_tokens": q_top_tokens,
    "quality_filter": q_quality_filter,
    "chunks": q_chunks,
    "dup_clusters": q_dup_clusters,
    "rep_signals": q_rep_signals,
    "local_supplier_revenue": q_local_supplier_revenue,
    "events_rollup": q_events_rollup,
    "emb_dup_lsh": q_emb_dup_lsh,
    "bpe_tokens": q_bpe_tokens,
    "doc_rarity": q_doc_rarity,
    "sample_weighted": q_sample_weighted,
    "recent_lineitems": q_recent_lineitems,
    "table_stats": q_table_stats,
    "events_cube": q_events_cube,
    "quadkeys": q_quadkeys,
    "quadkey_agg": q_quadkey_agg,
    "cms_sketch": q_cms_sketch,
    "ann_pq": q_ann_pq,
    "normalized_dedup": q_normalized_dedup,
    "pii_scrub": q_pii_scrub,
    "top_bigrams": q_top_bigrams,
    "postings": q_postings,
    "clean_corpus": q_clean_corpus,
    "geohash": q_geohash,
    "hilbert": q_hilbert,
    "hexbin": q_hexbin,
    "pagerank": q_pagerank,
    "token_triangles": q_token_triangles,
    "bm25": q_bm25,
    "url_stats": q_url_stats,
    "kmeans": q_kmeans,
    "bloom_join": q_bloom_join,
    "dup_spans": q_dup_spans,
    "debounce": q_debounce,
    "decontaminate": q_decontaminate,
    "pack": q_pack,
    "domain_cap": q_domain_cap,
    "ingest": q_ingest,
    "quality_rank": q_quality_rank,
    "funnel": q_funnel,
    "cohort": q_cohort,
    "phash_dup": q_phash_dup,
    "semdedup": q_semdedup,
    "late_events": q_late_events,
    "compact_state": q_compact_state,
    "robust_stats": q_robust_stats,
    "mix_sample": q_mix_sample,
    "span_clean": q_span_clean,
    "dbscan": q_dbscan,
    "skyline": q_skyline,
    "bfs_hops": q_bfs_hops,
    "lm_score": q_lm_score,
    "sssp": q_sssp,
    "kcore": q_kcore,
    "ols_fit": q_ols_fit,
    "ols_residuals": q_ols_residuals,
    "cheapest_supplier": q_cheapest_supplier,
    "idw_interp": q_idw_interp,
    "colloc_lift": q_colloc_lift,
    "nearest_foot": q_nearest_foot,
    "promo_share": q_promo_share,
    "event_transitions": q_event_transitions,
    "basket_pairs": q_basket_pairs,
    "zonal_stats": q_zonal_stats,
    "doc_keywords": q_doc_keywords,
    "interval_union": q_interval_union,
    "edit_dup": q_edit_dup,
    "top_supplier": q_top_supplier,
    "cusum_alerts": q_cusum_alerts,
    "user_trend": q_user_trend,
    "twap": q_twap,
    "rrf_fusion": q_rrf_fusion,
    "entity_clusters": q_entity_clusters,
    "safe_split": q_safe_split,
    "ann_recall": q_ann_recall,
    "scd2": q_scd2,
    "gap_fill": q_gap_fill,
    "ewma": q_ewma,
    "session_paths": q_session_paths,
    "moran": q_moran,
    "ship_overlap": q_ship_overlap,
    "label_prop": q_label_prop,
    "ppjoin": q_ppjoin,
    "tile_pyramid": q_tile_pyramid,
    "audience_overlap": q_audience_overlap,
    "small_qty_revenue": q_small_qty_revenue,
    "big_orders": q_big_orders,
    "part_share": q_part_share,
    "late_suppliers": q_late_suppliers,
    "convex_hull": q_convex_hull,
    "gram_matrix": q_gram_matrix,
    "sliding_dau": q_sliding_dau,
    "rolling_median": q_rolling_median,
    "hits": q_hits,
    "set_cover": q_set_cover,
    "kmv_sketch": q_kmv_sketch,
    "seg_intersect": q_seg_intersect,
    "rnn_match": q_rnn_match,
    "table_checksum": q_table_checksum,
    "adaptive_grid": q_adaptive_grid,
    "skew_report": q_skew_report,
    "domain_drift": q_domain_drift,
    "bpe_merges": q_bpe_merges,
    "union_area": q_union_area,
    "priority_counts": q_priority_counts,
    "mode_per_user": q_mode_per_user,
    "user_journey": q_user_journey,
}

# every queries() entry has a DuckDB oracle (zero rows-only): the two
# former geometry dumps are now hash-hard via canonical serializations
# (featurize -> boundary-edge rows, merge_geometry -> candidate-grid
# cell membership vs the traced rings)
ORACLES = {
    "extract_text": oracle.EXTRACT_TEXT,
    "tile_assign": oracle.TILE_ASSIGN,
    "cover": oracle.COVER,
    "spatial_join": oracle.SPATIAL_JOIN,
    "join_agg": oracle.JOIN_AGG,
    "knn": oracle.KNN,
    "exact_dedup": oracle.EXACT_DEDUP,
    "token_count": oracle.TOKEN_COUNT,
    "fingerprints": oracle.DOC_FINGERPRINTS,
    "rasterize_fg": oracle.RASTERIZE_FG,
    "merge_components": oracle.MERGE_COMPONENTS,
    "dedupe": oracle.DEDUPE,
    "near_dup": oracle.NEAR_DUP,
    "quality": oracle.QUALITY,
    "ann": oracle.ANN,
    "ann_ivf": oracle.ANN_IVF,
    "class_weights": oracle.CLASS_WEIGHTS,
    "compare_filter": oracle.COMPARE_FILTER,
    "subset": oracle.SUBSET,
    "events_window": oracle.EVENTS_WINDOW,
    "events_running": oracle.EVENTS_RUNNING,
    "top_tiles": oracle.TOP_TILES,
    "merge_unions": oracle.MERGE_UNIONS,
    "merge_geometry": oracle.MERGE_RING_CELLS,
    "simhash": oracle.SIMHASH,
    "langid": oracle.LANGID,
    "featurize": oracle.FEATURIZE_EDGES,
    "featurize_stats": oracle.FEATURIZE_STATS,
    "featurize_moments": oracle.FEATURIZE_MOMENTS,
    "segmentation_metrics": oracle.SEGMENTATION_METRICS,
    "emb_dup": oracle.EMB_DUP,
    "epoch_loss": oracle.EPOCH_LOSS,
    "media_features": oracle.MEDIA_FEATURES,
    "jpeg_features": oracle.JPEG_FEATURES,
    "quantile_sketch": oracle.QUANTILE_SKETCH,
    "delta_dup": oracle.DELTA_DUP,
    "mvt_tiles": oracle.MVT_TILES,
    "mask_png": oracle.MASK_PNG,
    "pbf_extract": oracle.PBF_EXTRACT,
    "ngram_jaccard": oracle.NGRAM_JACCARD,
    "events_sessions": oracle.EVENTS_SESSIONS,
    "order_revenue": oracle.ORDER_REVENUE,
    "price_quantiles": oracle.PRICE_QUANTILES,
    "events_pivot": oracle.EVENTS_PIVOT,
    "events_asof": oracle.EVENTS_ASOF,
    "events_range_join": oracle.EVENTS_RANGE_JOIN,
    "sample_stratified": oracle.SAMPLE_STRATIFIED,
    "top_docs_per_lang": oracle.TOP_DOCS_PER_LANG,
    "events_window_fns": oracle.EVENTS_WINDOW_FNS,
    "simhash_dup": oracle.SIMHASH_DUP,
    "pricing_summary": oracle.PRICING_SUMMARY,
    "cust_no_orders": oracle.CUST_NO_ORDERS,
    "active_parts": oracle.ACTIVE_PARTS,
    "hopping_window": oracle.HOPPING_WINDOW,
    "daily_users": oracle.DAILY_USERS,
    "hll_users": oracle.HLL_USERS,
    "order_counts_dist": oracle.ORDER_COUNTS_DIST,
    "lang_families": oracle.LANG_FAMILIES,
    "top_tokens": oracle.TOP_TOKENS,
    "quality_filter": oracle.QUALITY_FILTER,
    "chunks": oracle.CHUNKS,
    "dup_clusters": oracle.DUP_CLUSTERS,
    "rep_signals": oracle.REP_SIGNALS,
    "local_supplier_revenue": oracle.LOCAL_SUPPLIER_REVENUE,
    "events_rollup": oracle.EVENTS_ROLLUP,
    "emb_dup_lsh": oracle.EMB_DUP_LSH,
    "bpe_tokens": oracle.BPE_TOKENS,
    "doc_rarity": oracle.DOC_RARITY,
    "sample_weighted": oracle.SAMPLE_WEIGHTED,
    "recent_lineitems": oracle.RECENT_LINEITEMS,
    "table_stats": oracle.TABLE_STATS,
    "events_cube": oracle.EVENTS_CUBE,
    "quadkeys": oracle.QUADKEYS,
    "quadkey_agg": oracle.QUADKEY_AGG,
    "cms_sketch": oracle.CMS_SKETCH,
    "ann_pq": oracle.ANN_PQ,
    "normalized_dedup": oracle.NORMALIZED_DEDUP,
    "pii_scrub": oracle.PII_SCRUB,
    "top_bigrams": oracle.TOP_BIGRAMS,
    "postings": oracle.POSTINGS,
    "clean_corpus": oracle.CLEAN_CORPUS,
    "geohash": oracle.GEOHASH,
    "hilbert": oracle.HILBERT,
    "hexbin": oracle.HEXBIN,
    "pagerank": oracle.PAGERANK,
    "token_triangles": oracle.TOKEN_TRIANGLES,
    "bm25": oracle.BM25,
    "url_stats": oracle.URL_STATS,
    "kmeans": oracle.KMEANS,
    "bloom_join": oracle.BLOOM_JOIN,
    "dup_spans": oracle.DUP_SPANS,
    "debounce": oracle.DEBOUNCE,
    "decontaminate": oracle.DECONTAMINATE,
    "pack": oracle.PACK,
    "domain_cap": oracle.DOMAIN_CAP,
    "ingest": oracle.INGEST,
    "quality_rank": oracle.QUALITY_RANK,
    "funnel": oracle.FUNNEL,
    "cohort": oracle.COHORT,
    "phash_dup": oracle.PHASH_DUP,
    "semdedup": oracle.SEMDEDUP,
    "late_events": oracle.LATE_EVENTS,
    "compact_state": oracle.COMPACT_STATE,
    "robust_stats": oracle.ROBUST_STATS,
    "mix_sample": oracle.MIX_SAMPLE,
    "span_clean": oracle.SPAN_CLEAN,
    "dbscan": oracle.DBSCAN,
    "skyline": oracle.SKYLINE,
    "bfs_hops": oracle.BFS_HOPS,
    "lm_score": oracle.LM_SCORE,
    "sssp": oracle.SSSP,
    "kcore": oracle.KCORE,
    "ols_fit": oracle.OLS_FIT,
    "ols_residuals": oracle.OLS_RESIDUALS,
    "cheapest_supplier": oracle.CHEAPEST_SUPPLIER,
    "idw_interp": oracle.IDW_INTERP,
    "colloc_lift": oracle.COLLOC_LIFT,
    "nearest_foot": oracle.NEAREST_FOOT,
    "promo_share": oracle.PROMO_SHARE,
    "event_transitions": oracle.EVENT_TRANSITIONS,
    "basket_pairs": oracle.BASKET_PAIRS,
    "zonal_stats": oracle.ZONAL_STATS,
    "doc_keywords": oracle.DOC_KEYWORDS,
    "interval_union": oracle.INTERVAL_UNION,
    "edit_dup": oracle.EDIT_DUP,
    "top_supplier": oracle.TOP_SUPPLIER,
    "cusum_alerts": oracle.CUSUM_ALERTS,
    "user_trend": oracle.USER_TREND,
    "twap": oracle.TWAP,
    "rrf_fusion": oracle.RRF_FUSION,
    "entity_clusters": oracle.ENTITY_CLUSTERS,
    "safe_split": oracle.SAFE_SPLIT,
    "ann_recall": oracle.ANN_RECALL,
    "scd2": oracle.SCD2,
    "gap_fill": oracle.GAP_FILL,
    "ewma": oracle.EWMA,
    "session_paths": oracle.SESSION_PATHS,
    "moran": oracle.MORAN,
    "ship_overlap": oracle.SHIP_OVERLAP,
    "label_prop": oracle.LABEL_PROP,
    "ppjoin": oracle.PPJOIN,
    "tile_pyramid": oracle.TILE_PYRAMID,
    "audience_overlap": oracle.AUDIENCE_OVERLAP,
    "small_qty_revenue": oracle.SMALL_QTY_REVENUE,
    "big_orders": oracle.BIG_ORDERS,
    "part_share": oracle.PART_SHARE,
    "late_suppliers": oracle.LATE_SUPPLIERS,
    "convex_hull": oracle.CONVEX_HULL,
    "gram_matrix": oracle.GRAM_MATRIX,
    "sliding_dau": oracle.SLIDING_DAU,
    "rolling_median": oracle.ROLLING_MEDIAN,
    "hits": oracle.HITS,
    "set_cover": oracle.SET_COVER,
    "kmv_sketch": oracle.KMV_SKETCH,
    "seg_intersect": oracle.SEG_INTERSECT,
    "rnn_match": oracle.RNN_MATCH,
    "table_checksum": oracle.TABLE_CHECKSUM,
    "adaptive_grid": oracle.ADAPTIVE_GRID,
    "skew_report": oracle.SKEW_REPORT,
    "domain_drift": oracle.DOMAIN_DRIFT,
    "bpe_merges": oracle.BPE_MERGES,
    "union_area": oracle.UNION_AREA,
    "priority_counts": oracle.PRIORITY_COUNTS,
    "mode_per_user": oracle.MODE_PER_USER,
    "user_journey": oracle.USER_JOURNEY,
}
