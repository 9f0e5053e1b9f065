"""One-off generator for the committed district SHP/DBF fixture
(tilemaker_spark/data/districts.{shp,dbf}).

Uses the INDEPENDENT test writer (tests/test_shapefile.py — written
against the public ESRI whitepaper / dBase III layout, deliberately not
sharing code with the reader) so the driver-level `spatial_join_pip_shp`
query exercises the real `shapefile.py` parser on real file bytes
(reference: src/read_shp.cpp:101-249).

Rerun after changing the district grid: PYTHONPATH=.:tests python
scripts/gen_shp_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from test_shapefile import (DBF_FIELDS, LINES_DBF_FIELDS,  # noqa: E402
                            _district_shapes_and_attrs,
                            _polyline_shapes_and_attrs, write_dbf, write_shp)

out_dir = os.path.join(os.path.dirname(__file__), "..", "tilemaker_spark", "data")
os.makedirs(out_dir, exist_ok=True)
shapes, rows = _district_shapes_and_attrs()
write_shp(os.path.join(out_dir, "districts.shp"), shapes)
write_dbf(os.path.join(out_dir, "districts.dbf"), DBF_FIELDS, rows)
print(f"wrote {len(shapes)} district polygons to {out_dir}")
shapes, rows = _polyline_shapes_and_attrs()
write_shp(os.path.join(out_dir, "lines.shp"), shapes)
write_dbf(os.path.join(out_dir, "lines.dbf"), LINES_DBF_FIELDS, rows)
print(f"wrote {len(shapes)} polylines to {out_dir}")
