"""Deterministic synthesis of the Common-Crawl-style `pages` table and
the `footprints` polygon table, derived from the driver's testdata
tables (`documents`, `part`) via integer hash chains.

Every float the DuckDB oracle checks is produced by IEEE-exact ops
(divide by 2^32, one multiply, one add) so numpy and DuckDB agree
bit-for-bit — see robosat_ray/constants.py and robosat_ray/oracle.py.
"""

from robosat_ray.synth.pages import page_coords, pages_dataset, render_html
from robosat_ray.synth.footprints import footprint_rects, footprints_dataset

__all__ = [
    "page_coords",
    "pages_dataset",
    "render_html",
    "footprint_rects",
    "footprints_dataset",
]
