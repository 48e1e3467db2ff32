"""rs-style CLI (reference robosat/tools/__main__.py:22-53 subcommand
frame): each subcommand builds a Dataset pipeline and writes/prints
results. Owns the Ray session (library code never calls ray.init).

    python -m robosat_ray.cli <cmd> --sf DIR [--out DIR] ...

Subcommands mirror the reference tools: cover, rasterize, features,
merge, dedupe, predict, weights — plus the graft pipelines: join
(flagship spatial join), knn, neardup, ann, bench-style stats.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _emit(ds_or_df, out: str | None, key_col: str | None = None):
    from robosat_ray.runtime.resume import write_partitioned

    if out:
        if hasattr(ds_or_df, "write_parquet"):
            if key_col:
                man = write_partitioned(ds_or_df, out, key_col=key_col)
                print(man.to_json(orient="records"))
            else:
                ds_or_df.write_parquet(out)
                print(json.dumps({"written": out}))
        else:
            ds_or_df.to_parquet(out)
            print(json.dumps({"written": out}))
    else:
        df = ds_or_df.to_pandas() if hasattr(ds_or_df, "to_pandas") else ds_or_df
        print(df.head(20).to_string())
        print(json.dumps({"rows": len(df)}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="robosat_ray")
    p.add_argument("cmd", choices=[
        "cover", "rasterize", "features", "merge", "merge-geometry",
        "dedupe", "predict", "weights", "join", "knn", "neardup",
        "embdup", "ann", "lineage", "asof", "rangejoin", "revenue",
        "quantiles", "pivot", "fingerprints", "extract", "rollup",
        "dupclusters", "rarity", "bpetokens", "embdup-lsh",
    ])
    p.add_argument("--type", default="parking",
                   help="extractor plugin name for `extract` (registry in runtime/plugins.py)")
    p.add_argument("--sf", default="/root/testdata/sf0.001")
    p.add_argument("--out", default=None)
    p.add_argument("--num-cpus", type=int, default=8)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--zoom", type=int, default=None)
    args = p.parse_args(argv)

    _init_ray(args.num_cpus)
    import ray

    from robosat_ray import constants as C
    from robosat_ray.pipelines import queries as Q

    z = args.zoom or C.Z_JOIN
    sf = args.sf

    if args.cmd == "cover":
        _emit(Q.q_cover(sf), args.out)
    elif args.cmd == "rasterize":
        from robosat_ray.stages.rasterize import rasterize
        from robosat_ray.synth.footprints import footprints_dataset

        _emit(rasterize(footprints_dataset(sf), z=z, size=args.size), args.out)
    elif args.cmd == "features":
        from robosat_ray.stages.featurize import featurize
        from robosat_ray.stages.rasterize import rasterize
        from robosat_ray.synth.footprints import footprints_dataset

        masks = rasterize(footprints_dataset(sf), z=z, size=args.size)
        _emit(featurize(masks, z=z).drop_columns(["rings"]), args.out)
    elif args.cmd == "merge":
        _emit(Q.q_merge_components(sf), args.out)
    elif args.cmd == "merge-geometry":
        _emit(Q.q_merge_geometry(sf), args.out)
    elif args.cmd == "embdup":
        _emit(Q.q_emb_dup(sf), args.out)
    elif args.cmd == "dedupe":
        _emit(Q.q_dedupe(sf), args.out)
    elif args.cmd == "predict":
        _emit(Q.q_segmentation_metrics(sf), args.out)
    elif args.cmd == "weights":
        _emit(Q.q_class_weights(sf), args.out)
    elif args.cmd == "join":
        from robosat_ray.pipelines.flagship import flagship

        _emit(flagship(sf), args.out, key_col="cell")
    elif args.cmd == "knn":
        _emit(Q.q_knn(sf), args.out)
    elif args.cmd == "neardup":
        _emit(Q.q_near_dup(sf), args.out)
    elif args.cmd == "ann":
        _emit(Q.q_ann(sf), args.out)
    elif args.cmd == "asof":
        _emit(Q.q_events_asof(sf), args.out)
    elif args.cmd == "rangejoin":
        _emit(Q.q_events_range_join(sf), args.out)
    elif args.cmd == "revenue":
        _emit(Q.q_order_revenue(sf), args.out)
    elif args.cmd == "quantiles":
        _emit(Q.q_price_quantiles(sf), args.out)
    elif args.cmd == "pivot":
        _emit(Q.q_events_pivot(sf), args.out)
    elif args.cmd == "fingerprints":
        _emit(Q.q_fingerprints(sf), args.out)
    elif args.cmd == "rollup":
        _emit(Q.q_events_rollup(sf), args.out)
    elif args.cmd == "dupclusters":
        _emit(Q.q_dup_clusters(sf), args.out)
    elif args.cmd == "rarity":
        _emit(Q.q_doc_rarity(sf), args.out)
    elif args.cmd == "bpetokens":
        _emit(Q.q_bpe_tokens(sf), args.out)
    elif args.cmd == "embdup-lsh":
        _emit(Q.q_emb_dup_lsh(sf), args.out)
    elif args.cmd == "extract":
        from robosat_ray.runtime.plugins import run_extractor
        from robosat_ray.synth.footprints import footprints_dataset

        _emit(
            run_extractor(footprints_dataset(sf), args.type).drop_columns(["rings"]),
            args.out,
        )
    elif args.cmd == "lineage":
        from robosat_ray.runtime.lineage import lineage_table

        print(lineage_table().to_string())
    ray.shutdown()


if __name__ == "__main__":
    main()
