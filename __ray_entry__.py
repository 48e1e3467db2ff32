"""Driver contract for the graft builder (Ray Data target).

The driver calls ray.init() itself before importing this module; none
of these functions (nor the robosat_ray library) call ray.init() /
ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline (pages -> extract_text -> geocode/tile-assign
    -> PIP spatial join vs footprints) on sf0.001."""
    from robosat_ray.pipelines.flagship import flagship

    return flagship(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from robosat_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from robosat_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
