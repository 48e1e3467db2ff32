"""Tiles-CSV source/sink round trip (reference robosat tiles.py format:
x,y,z rows, blank lines skipped)."""


def test_tiles_csv_roundtrip(ray_session, tmp_path):
    import ray.data

    from robosat_ray.sources.tiles_csv import tiles_from_csv, tiles_to_csv

    path = str(tmp_path / "tiles.csv")
    # the reference fixture row (tests/fixtures/tiles.csv): 69623,104945,18
    with open(path, "w") as f:
        f.write("69623,104945,18\n\n655,1583,12\n")
    ds = tiles_from_csv(path)
    rows = sorted(
        (r["tile_x"], r["tile_y"], r["z"]) for r in ds.take_all()
    )
    assert rows == [(655, 1583, 12), (69623, 104945, 18)]

    out = str(tmp_path / "out.csv")
    tiles_to_csv(ds, out)
    with open(out) as f:
        lines = [l.strip() for l in f if l.strip()]
    assert lines == ["655,1583,12", "69623,104945,18"]


def test_range_source_equals_plain_replication(ray_session):
    """The range-of-block-ids synthetic source must produce the same
    multiset of rows as plain read+replicate."""
    import pandas as pd

    from robosat_ray.synth.pages import documents_source

    a = documents_source(
        "/root/testdata/sf0.001", ["doc_id", "text", "lang"], replicas=3, num_blocks=7
    ).to_pandas()
    b = documents_source(
        "/root/testdata/sf0.001", ["doc_id", "text", "lang"], replicas=3
    ).to_pandas()
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )
