"""Every queries() entry vs its DuckDB oracle on sf0.001 — the same
comparison the driver runs at sf0.01 (CORRECTNESS gate)."""

import pytest

from robosat_ray.pipelines.queries import ORACLES, QUERIES
from tests.util import assert_frames_match, duck

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name):
    got = QUERIES[name](SF)
    if name not in ORACLES:
        # rows-only contract (non-SQL-expressible op): stable non-empty result
        import pandas as pd

        n = len(got) if isinstance(got, pd.DataFrame) else got.count()
        assert n > 0
        return
    con = duck(SF)
    want = con.sql(ORACLES[name]).df()
    assert_frames_match(got, want)


def test_salting_does_not_change_join():
    """Forcing aggressive hot-cell salting must not change the shuffle
    join output (correctness-under-skew-mitigation)."""
    from robosat_ray.pipelines.flagship import flagship

    base = flagship(
        SF, through_html=False, salt=False, join_strategy="shuffle"
    ).to_pandas()
    salted = flagship(
        SF, through_html=False, salt=True, salt_cap=10, join_strategy="shuffle"
    ).to_pandas()
    # the driver hot-map bound: forcing top_k tiny drops most hot
    # cells back to k=1 — still identical output (bound is skew-only)
    capped = flagship(
        SF, through_html=False, salt=True, salt_cap=10, salt_top_k=3,
        join_strategy="shuffle",
    ).to_pandas()
    cols = sorted(base.columns)
    a = base[cols].sort_values(cols).reset_index(drop=True)
    b = salted[cols].sort_values(cols).reset_index(drop=True)
    c = capped[cols].sort_values(cols).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_broadcast_equals_shuffle_join():
    """The broadcast-prober join and the co-partition shuffle join are
    interchangeable strategies: identical output rows."""
    from robosat_ray.pipelines.flagship import flagship

    a = flagship(SF, through_html=False, join_strategy="broadcast").to_pandas()
    b = flagship(
        SF, through_html=False, salt=False, join_strategy="shuffle"
    ).to_pandas()
    cols = sorted(a.columns)
    import pandas as pd

    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_flagship_through_html_equals_points_path():
    from robosat_ray.pipelines.flagship import flagship

    a = flagship(SF, through_html=True, salt=False).to_pandas()
    b = flagship(SF, through_html=False, salt=False).to_pandas()
    cols = sorted(a.columns)
    import pandas as pd

    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_join_invariant_under_partitioning():
    """Distributed invariant (SURVEY §5.2): the flagship join output is
    identical whatever the input block structure."""
    import pandas as pd

    from robosat_ray.pipelines.flagship import flagship

    a = flagship(SF, through_html=False, num_blocks=1).to_pandas()
    b = flagship(SF, through_html=False, num_blocks=16).to_pandas()
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )
