"""User-extension surface: plugin registries + declared-schema stages.

The reference exposes two plugin registries (robosat README.md:300-316):
OSM extractor handlers — a name->class dict in tools/extract.py:7-9
with a predicate/projection contract — and post-processing featurize
handlers in tools/features.py:14-16 with an `apply(tile, mask)`
contract. This module is the Ray-Data-native counterpart (SURVEY
§2.9): a plugin is a batch callable `(pa.Table) -> pa.Table`, a
registry is a plain dict behind register/get helpers, and `stage()`
wraps any batch fn with input/output schema validation so a contract
violation raises in the worker where it happened — not three shuffles
downstream, the failure mode the reference's implicit-by-convention
schemas invite.

Extractor contract   : footprints batch (feature_id, kind, minx, miny,
                       maxx, maxy, rings) -> kept/derived feature rows.
Featurizer contract  : rasters batch (tile_z, tile_x, tile_y, size,
                       data) -> feature rows (the reference's
                       `apply(tile, mask)` per-tile loop, batched).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

EXTRACTORS: dict[str, Callable] = {}
FEATURIZERS: dict[str, Callable] = {}


def register_extractor(name: str):
    """Decorator: register a footprints-batch extractor plugin (the
    reference's osmium-handler registration, tools/extract.py:7-9)."""

    def deco(fn: Callable) -> Callable:
        EXTRACTORS[name] = fn
        return fn

    return deco


def register_featurizer(name: str):
    """Decorator: register a mask-batch featurizer plugin (the
    reference's handler registration, tools/features.py:14-16)."""

    def deco(fn: Callable) -> Callable:
        FEATURIZERS[name] = fn
        return fn

    return deco


def get_extractor(name: str) -> Callable:
    try:
        return EXTRACTORS[name]
    except KeyError:
        raise KeyError(
            f"unknown extractor {name!r}; registered: {sorted(EXTRACTORS)}"
        ) from None


def get_featurizer(name: str) -> Callable:
    try:
        return FEATURIZERS[name]
    except KeyError:
        raise KeyError(
            f"unknown featurizer {name!r}; registered: {sorted(FEATURIZERS)}"
        ) from None


class SchemaViolation(TypeError):
    pass


def check_schema(batch: pa.Table, schema: pa.Schema, where: str) -> None:
    """Exact name+type boundary check (order-insensitive; extra or
    missing columns and any type drift all raise)."""
    got = {f.name: f.type for f in batch.schema}
    want = {f.name: f.type for f in schema}
    if got != want:
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        drift = sorted(
            n for n in set(got) & set(want) if got[n] != want[n]
        )
        raise SchemaViolation(
            f"{where}: schema contract violated"
            + (f"; missing {missing}" if missing else "")
            + (f"; unexpected {extra}" if extra else "")
            + (
                "; type drift "
                + str([(n, str(want[n]), str(got[n])) for n in drift])
                if drift
                else ""
            )
        )


def stage(
    fn: Callable,
    input_schema: pa.Schema | None = None,
    output_schema: pa.Schema | None = None,
    name: str | None = None,
) -> Callable:
    """Wrap a batch fn with declared-schema validation at both
    boundaries. Use as the `map_batches` callable."""
    label = name or getattr(fn, "__name__", "stage")

    def wrapped(batch: pa.Table) -> pa.Table:
        if input_schema is not None:
            check_schema(batch, input_schema, f"{label} input")
        out = fn(batch)
        if output_schema is not None:
            check_schema(out, output_schema, f"{label} output")
        return out

    wrapped.__name__ = label
    return wrapped


# ---------------------------------------------------------------------------
# Built-in plugins (the reference ships parking/building/road handlers)

FOOTPRINTS_SCHEMA = pa.schema(
    [
        ("feature_id", pa.int64()),
        ("kind", pa.string()),
        ("minx", pa.float64()),
        ("miny", pa.float64()),
        ("maxx", pa.float64()),
        ("maxy", pa.float64()),
        (
            "rings",
            pa.list_(pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())]))),
        ),
    ]
)


def _kind_extractor(kind: str) -> Callable:
    import pyarrow.compute as pc

    def extract(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("kind"), kind))

    extract.__name__ = f"extract_{kind}"
    return extract


# reference: osm/parking.py (amenity=parking predicate) and
# osm/building.py (building=* predicate) — here the predicate is the
# kind column the synthesized footprints carry
register_extractor("parking")(_kind_extractor("parking"))
register_extractor("building")(_kind_extractor("building"))


@register_extractor("road")
def extract_road(batch: pa.Table) -> pa.Table:
    """Reference osm/road.py:99-148: keep road features and attach the
    per-feature buffer width in meters (lane-count heuristic keyed on
    feature_id, standing in for the OSM lanes tag)."""
    import pyarrow.compute as pc

    from robosat_ray.functions.roads import road_widths_vec

    roads = batch.filter(pc.equal(batch.column("kind"), "road"))
    fid = roads.column("feature_id").to_numpy()
    highway = np.asarray(["residential", "primary", "motorway"], dtype=object)[
        (fid % 3).astype(np.int64)
    ]
    lanes = (fid % 4).astype(np.int64)
    widths = road_widths_vec(highway, lanes, (fid % 2).astype(bool))
    return roads.append_column("width_m", pa.array(widths, pa.float64()))


def run_extractor(footprints_ds, name: str):
    """footprints Dataset -> extracted features via a registered
    plugin, with the footprints contract enforced on input batches."""
    fn = get_extractor(name)
    return footprints_ds.map_batches(
        stage(fn, input_schema=FOOTPRINTS_SCHEMA, name=f"extractor:{name}"),
        batch_format="pyarrow",
    )


@register_featurizer("default")
def featurize_default(batch: pa.Table) -> pa.Table:
    """Reference features/parking.py handler chain (threshold ->
    denoise -> grow -> contours -> simplify -> featurize)."""
    from robosat_ray import constants as C
    from robosat_ray.stages.featurize import featurize_batch

    return featurize_batch(batch, C.Z_JOIN, 0, 0, 0.0)


def run_featurizer(masks_ds, name: str):
    fn = get_featurizer(name)
    return masks_ds.map_batches(
        stage(fn, name=f"featurizer:{name}"), batch_format="pyarrow"
    )
