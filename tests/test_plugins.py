"""Plugin registry + declared-schema stage contract (reference
README.md:300-316 extension surface; SURVEY §2.9)."""

import numpy as np
import pyarrow as pa
import pytest

from robosat_ray.runtime.plugins import (
    EXTRACTORS,
    FEATURIZERS,
    FOOTPRINTS_SCHEMA,
    SchemaViolation,
    check_schema,
    get_extractor,
    register_extractor,
    run_extractor,
    run_featurizer,
    stage,
)

SF = "/root/testdata/sf0.001"


def test_builtin_registries_populated():
    assert {"parking", "building", "road"} <= set(EXTRACTORS)
    assert "default" in FEATURIZERS
    with pytest.raises(KeyError, match="registered"):
        get_extractor("nope")


def test_register_decorator_roundtrip():
    @register_extractor("_test_tmp")
    def f(batch):
        return batch

    assert EXTRACTORS["_test_tmp"] is f
    del EXTRACTORS["_test_tmp"]


def test_run_extractor_filters_kind(ray_session):
    from robosat_ray.synth.footprints import footprints_dataset

    feet = footprints_dataset(SF)
    parking = run_extractor(feet, "parking").to_pandas()
    assert len(parking) > 0
    assert (parking["kind"] == "parking").all()
    total = feet.count()
    sizes = [run_extractor(feet, k).count() for k in ("parking", "building", "road")]
    assert sum(sizes) < total  # real predicates, not pass-through


def test_road_extractor_attaches_width(ray_session):
    from robosat_ray.synth.footprints import footprints_dataset

    roads = run_extractor(footprints_dataset(SF), "road").to_pandas()
    assert len(roads) > 0
    assert (roads["width_m"] > 0).all()
    # deterministic: width is a pure function of feature_id
    again = run_extractor(footprints_dataset(SF), "road").to_pandas()
    assert (roads.sort_values("feature_id")["width_m"].to_numpy()
            == again.sort_values("feature_id")["width_m"].to_numpy()).all()


def test_featurizer_plugin_matches_direct_call(ray_session):
    from robosat_ray import constants as C
    from robosat_ray.stages.featurize import featurize
    from robosat_ray.stages.rasterize import rasterize
    from robosat_ray.synth.footprints import footprints_dataset

    masks = rasterize(footprints_dataset(SF), z=C.Z_JOIN, size=64)
    via_plugin = run_featurizer(masks, "default").drop_columns(["rings"]).to_pandas()
    direct = featurize(masks, z=C.Z_JOIN).drop_columns(["rings"]).to_pandas()
    cols = sorted(via_plugin.columns)
    a = via_plugin[cols].sort_values(cols).reset_index(drop=True)
    b = direct[cols].sort_values(cols).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_schema_contract_raises_on_drift():
    t = pa.table({"feature_id": pa.array([1], pa.int64())})
    with pytest.raises(SchemaViolation, match="missing"):
        check_schema(t, FOOTPRINTS_SCHEMA, "x")
    wrapped = stage(lambda b: b.append_column("junk", pa.array([0])),
                    output_schema=pa.schema([("feature_id", pa.int64())]))
    with pytest.raises(SchemaViolation, match="unexpected"):
        wrapped(t)
    drift = pa.table({"feature_id": pa.array([1.0], pa.float64())})
    with pytest.raises(SchemaViolation, match="type drift"):
        check_schema(drift, pa.schema([("feature_id", pa.int64())]), "x")
