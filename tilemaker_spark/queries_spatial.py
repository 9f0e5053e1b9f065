"""Spatial join / kNN / raster<->vector queries + DuckDB oracles.

The Spark side runs the general engine (Morton cell equi-join +
vectorized ray-casting; ring-expansion kNN with certified fallback).
The oracles are closed-form: districts are diamonds on a grid, so
point-in-polygon is an exact integer inequality, and kNN distances are
exact int64 — no floating-point ambiguity anywhere.
"""

from __future__ import annotations

import os

from . import spatial
from .queries_core import GEOCODE_CTE, _XF, _YF


def q_spatial_join_pip(spark, sf_dir):
    return spatial.poi_district_join(spark, sf_dir)


def q_spatial_join_pip_shp(spark, sf_dir):
    """S8 driver-visible DIRECTLY (VERDICT r3 ask #9): the same PIP join
    but with the district table parsed from REAL committed .shp/.dbf
    bytes by the pure-struct ESRI/dBase reader (shapefile.py, reference
    src/read_shp.cpp:101-249) instead of the synthetic generator. The
    oracle is identical to spatial_join_pip — the fixture encodes the
    same diamonds (written by the independent test writer)."""
    from . import shapefile as SHP

    data = os.path.join(os.path.dirname(__file__), "data")
    districts = SHP.district_table_from_shapefile(
        spark, os.path.join(data, "districts.shp"),
        os.path.join(data, "districts.dbf"), lat_is_projected=True)
    return spatial.point_in_polygon_join(spatial._points(spark, sf_dir), districts)


def q_spatial_join_pip_big(spark, sf_dir):
    """J4 LARGE-reference-layer arm (VERDICT r4 ask #2): the same PIP
    join forced down the non-broadcast path — shuffle-hash equi-join on
    cell, polygon cover shipped as compressed sorted Morton ranges
    (spatial.cells_to_ranges) and re-expanded JVM-side. Same rows as
    spatial_join_pip (oracle unchanged); the PLAN difference (no
    BroadcastExchange on the cover side) is asserted in
    tests/test_pipeline.py::test_pip_big_path_no_broadcast."""
    return spatial.point_in_polygon_join(
        spatial._points(spark, sf_dir), spatial.district_table(spark),
        broadcast_ok=False)


def q_j8_shp_line_cover(spark, sf_dir):
    """J8 driver row (polyline tile cover from a REAL shapefile): the
    committed lines.shp/.dbf fixture — multi-part PolyLine records whose
    vertices are a closed-form function of the record id
    (tests/test_shapefile.polyline_vertices) — is parsed by the
    pure-struct ESRI reader (reference src/read_shp.cpp:101-166 PolyLine
    arm), packed, and run through the SAME batched DDA cover as the OSM
    pipeline (tileassign.assign_base_tiles / kernels.tilecover,
    reference src/shp_mem_tiles.cpp + tile cover). The oracle SQL
    regenerates the vertices and re-derives the walk exactly (every
    segment shorter than one z14 tile, identical IEEE op order — the
    proven pyramid_tiles pattern)."""
    from pyspark.sql import functions as F

    from . import shapefile as SHP
    from . import tileassign
    from .kernels import geompack

    data = os.path.join(os.path.dirname(__file__), "data")
    by_rec: dict = {}
    for r in SHP.read_shapefile(os.path.join(data, "lines.shp"),
                                os.path.join(data, "lines.dbf"),
                                lat_is_projected=True):
        if r["shape_type"] != SHP.SHP_POLYLINE:
            continue
        lid = int(r["attrs"]["line_id"])
        by_rec.setdefault(lid, []).append((r["ring_lon"], r["ring_latp"]))
    rows = [(lid, bytearray(geompack.pack_line(parts)), None, None)
            for lid, parts in sorted(by_rec.items())]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, min(8, max(1, len(rows)))),
        "line_id BIGINT, geom BINARY, lon INT, latp INT")
    # rebalance=False: the fixture is 48 driver-local rows — an
    # unpersisted LogicalRDD is unsizable, and the conservative scale
    # mode would insert a cores*8-task exchange for nothing
    assigned = tileassign.assign_base_tiles(df, 14, rebalance=False)
    return assigned.select("line_id", F.col("tile_x").alias("x"),
                           F.col("tile_y").alias("y"))


def q_knn_places(spark, sf_dir):
    return spatial.poi_knn(spark, sf_dir)


def q_rasterize_z12(spark, sf_dir):
    return spatial.rasterize_points(spatial._points(spark, sf_dir))


def q_vectorize_cells(spark, sf_dir):
    z = spatial.VECTORIZE_ZOOM
    return spatial.vectorize_raster(
        spatial.rasterize_points(spatial._points(spark, sf_dir), zoom=z), zoom=z)


def q_classify_intersects(spark, sf_dir):
    """F5 x J4: Intersects()-during-classify — district membership
    becomes a string attr + numeric attr on the emitted features."""
    from pyspark.sql import functions as F

    feats = spatial.with_district_attrs(
        spatial._points(spark, sf_dir), spatial.district_table(spark))
    return feats.select(
        "object_id", "layer",
        F.element_at("attrs", "district").alias("district"),
        F.element_at("attrs_num", "district_id").alias("district_id"))


def q_classify_intersects_ways(spark, sf_dir):
    """F5 x J4 WAY arm: Intersects()-during-classify for way features —
    the query location is the way's first/last node (reference:
    src/osm_lua_processing.cpp:400-401, refine src/shp_mem_tiles.cpp:49-57)."""
    from pyspark.sql import functions as F

    from . import assemble, classify, geocode

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nodes, ways, _ = geocode.geocode(docs)
    way_feats = classify.classify_ways(ways)
    way_coords = assemble.ways_with_coords(ways, nodes)
    qpts = spatial.way_query_points(way_feats, way_coords)
    feats = spatial.with_district_attrs(
        way_feats, spatial.district_table(spark), query_points=qpts)
    return feats.select(
        "object_id", "layer",
        F.element_at("attrs", "district").alias("district"),
        F.element_at("attrs_num", "district_id").alias("district_id"))


QUERIES = {
    "spatial_join_pip": q_spatial_join_pip,
    "spatial_join_pip_shp": q_spatial_join_pip_shp,
    "spatial_join_pip_big": q_spatial_join_pip_big,
    "j8_shp_line_cover": q_j8_shp_line_cover,
    "knn_places": q_knn_places,
    "rasterize_z12": q_rasterize_z12,
    "vectorize_cells": q_vectorize_cells,
    "classify_intersects": q_classify_intersects,
    "classify_intersects_ways": q_classify_intersects_ways,
}


_DISTRICT_CTE = """
, districts AS (
  SELECT region*1000 + gx*100 + gy AS district_id,
         94750000 + (region % 8)*2000000 + gx*400000 AS cx,
         534700000 + (region // 8)*2000000 + gy*400000 AS cy
  FROM (SELECT unnest(range(64)) AS region),
       (SELECT unnest(range(4)) AS gx), (SELECT unnest(range(8)) AS gy)
)
"""

_RASTER_CTE = """
, raster AS (
  SELECT
    CAST(floor((CAST(lon AS DOUBLE)/10000000.0 + 180.0) * (1.0/360.0) * 4096.0) AS BIGINT) AS x,
    CAST(floor((180.0 - CAST(latp AS DOUBLE)/10000000.0) * (1.0/360.0) * 4096.0) AS BIGINT) AS y,
    CAST(floor((CAST(lon AS DOUBLE)/10000000.0 + 180.0) * (1.0/360.0) * 65536.0) AS BIGINT) % 16 AS px,
    CAST(floor((180.0 - CAST(latp AS DOUBLE)/10000000.0) * (1.0/360.0) * 65536.0) AS BIGINT) % 16 AS py,
    count(*) AS n
  FROM node_feats
  GROUP BY 1, 2, 3, 4
)
"""


_RASTER8_CTE = """
, raster8 AS (
  SELECT
    CAST(floor((CAST(lon AS DOUBLE)/10000000.0 + 180.0) * (1.0/360.0) * 256.0) AS BIGINT) AS x,
    CAST(floor((180.0 - CAST(latp AS DOUBLE)/10000000.0) * (1.0/360.0) * 256.0) AS BIGINT) AS y,
    CAST(floor((CAST(lon AS DOUBLE)/10000000.0 + 180.0) * (1.0/360.0) * 4096.0) AS BIGINT) % 16 AS px,
    CAST(floor((180.0 - CAST(latp AS DOUBLE)/10000000.0) * (1.0/360.0) * 4096.0) AS BIGINT) % 16 AS py,
    count(*) AS n
  FROM node_feats
  GROUP BY 1, 2, 3, 4
)
"""


_PIP_SQL = GEOCODE_CTE + _DISTRICT_CTE + f"""
SELECT f.object_id, f.layer, d.district_id
FROM node_feats f JOIN districts d
  ON abs(CAST(f.lon AS BIGINT) - d.cx) + abs(CAST(f.latp AS BIGINT) - d.cy) < {spatial.DIST_R}
"""

def _dbf_record_count(path: str) -> int:
    """Record count from a dBase III header (uint32 LE at offset 4) —
    ties the J8 oracle's id enumeration to the COMMITTED fixture, so a
    regenerated lines.dbf with a different line count cannot silently
    diverge from the range the oracle walks."""
    import struct

    with open(path, "rb") as f:
        return struct.unpack_from("<I", f.read(8), 4)[0]


_N_FIXTURE_LINES = _dbf_record_count(
    os.path.join(os.path.dirname(__file__), "data", "lines.dbf"))

# J8 oracle: regenerate the fixture polylines closed-form
# (tests/test_shapefile.polyline_vertices, same lattice as the corpus
# lines) and re-derive the z14 DDA walk exactly — identical IEEE op
# order to kernels.tilecover (the proven pyramid_tiles pattern; every
# segment delta <= 7000 fixed units << one z14 tile, so each segment
# crosses at most one border per axis and the walk closes in SQL).
_J8_LINES_SQL = f"""
WITH hs AS (
  SELECT i, (i * 2654435761 + 40503) % 4294967296 AS h
  FROM (SELECT unnest(range({_N_FIXTURE_LINES})) AS i)
),
base AS (
  SELECT i, h, CAST(4 + h % 9 AS INT) AS nv,
    CASE WHEN h % 3 = 1 AND (h // 3) % 3 = 1 THEN 4000
         ELSE ((h % 3) - 1) * 4000 END AS sx,
    (((h // 3) % 3) - 1) * 4000 AS sy,
    CAST(94710000 + (h % 1630) * 1000 AS BIGINT) AS lon0,
    CAST(534600000 + ((h // 7) % 3200) * 1000 AS BIGINT) AS latp0
  FROM hs
),
parts AS (
  SELECT *, 0 AS off FROM base
  UNION ALL
  SELECT *, 1000000 FROM base WHERE i % 4 = 0
),
verts AS (
  SELECT i,
    list_transform(range(nv), j -> lon0 + off + j*sx + ((h*(j+1)) % 7)*500) AS lons,
    list_transform(range(nv), j -> latp0 + off + j*sy + ((h*(j+2)) % 5)*500) AS latps
  FROM parts
),
segv AS (
  SELECT i AS fid, lons, latps,
         unnest(range(1, CAST(len(lons) AS INT))) AS j
  FROM verts
),
segs AS (
  SELECT fid, lons[j] AS al, latps[j] AS ap,
         lons[j+1] AS bl, latps[j+1] AS bp
  FROM segv
),
segf AS (
  SELECT fid,
    {{xf1}} AS xf1, {{yf1}} AS yf1,
    {{xf2}} AS xf2, {{yf2}} AS yf2
  FROM segs
),
segt AS (
  SELECT *, CAST(trunc(xf1) AS BIGINT) AS x1, CAST(trunc(yf1) AS BIGINT) AS y1,
            CAST(trunc(xf2) AS BIGINT) AS x2, CAST(trunc(yf2) AS BIGINT) AS y2
  FROM segf
),
cand AS (
  SELECT fid, x1 AS x, y1 AS y FROM segt
  UNION ALL SELECT fid, x2, y2 FROM segt
  UNION ALL
  SELECT fid, greatest(x1, x2),
    CAST(trunc(yf1 + (CAST(greatest(x1, x2) AS DOUBLE) - xf1) * ((yf2 - yf1) / (xf2 - xf1))) AS BIGINT)
  FROM segt WHERE x1 <> x2
  UNION ALL
  SELECT fid,
    CAST(trunc(xf1 + (CAST(greatest(y1, y2) AS DOUBLE) - yf1) * ((xf2 - xf1) / (yf2 - yf1))) AS BIGINT),
    greatest(y1, y2)
  FROM segt WHERE y1 <> y2
)
SELECT DISTINCT fid AS line_id, x, y FROM cand
"""
_J8_LINES_SQL = _J8_LINES_SQL.format(
    xf1=_XF.format(v="al"), yf1=_YF.format(v="ap"),
    xf2=_XF.format(v="bl"), yf2=_YF.format(v="bp"))

ORACLES = {
    "spatial_join_pip": _PIP_SQL,
    "spatial_join_pip_shp": _PIP_SQL,
    "spatial_join_pip_big": _PIP_SQL,
    "j8_shp_line_cover": _J8_LINES_SQL,
    "knn_places": GEOCODE_CTE + """
, q AS (SELECT object_id, lon, latp FROM node_feats WHERE layer = 'poi'),
p AS (SELECT object_id AS place_id, lon, latp FROM node_feats WHERE layer = 'place'),
sc AS (
  SELECT q.object_id, p.place_id,
    (CAST(q.lon AS BIGINT) - p.lon) * (CAST(q.lon AS BIGINT) - p.lon)
    + (CAST(q.latp AS BIGINT) - p.latp) * (CAST(q.latp AS BIGINT) - p.latp) AS dist2
  FROM q, p
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY object_id ORDER BY dist2, place_id) AS rank
  FROM sc
)
SELECT object_id, place_id, dist2, CAST(rank AS INT) AS rank FROM r WHERE rank <= 3
""",
    "rasterize_z12": GEOCODE_CTE + _RASTER_CTE + """
SELECT 12 AS z, x, y, px, py, n FROM raster
""",
    "vectorize_cells": GEOCODE_CTE + _RASTER8_CTE + """
SELECT 8 AS z, x, y, px, py, n,
  (x*16 + px) * (360.0/4096.0) - 180.0 AS min_lon,
  (x*16 + px + 1) * (360.0/4096.0) - 180.0 AS max_lon,
  180.0 - (y*16 + py + 1) * (360.0/4096.0) AS min_latp,
  180.0 - (y*16 + py) * (360.0/4096.0) AS max_latp
FROM raster8 WHERE n >= 2
""",
    "classify_intersects": GEOCODE_CTE + _DISTRICT_CTE + f"""
, hits AS (
  SELECT f.object_id, f.layer, min(d.district_id) AS did
  FROM node_feats f JOIN districts d
    ON abs(CAST(f.lon AS BIGINT) - d.cx) + abs(CAST(f.latp AS BIGINT) - d.cy) < {spatial.DIST_R}
  GROUP BY 1, 2
)
SELECT f.object_id, f.layer,
  'd' || h.did AS district,
  CAST(h.did AS DOUBLE) AS district_id
FROM node_feats f LEFT JOIN hits h USING (object_id, layer)
""",
    "classify_intersects_ways": GEOCODE_CTE + _DISTRICT_CTE + f"""
, wends AS (
  SELECT f.object_id, f.layer,
         CAST(p.lons[1] AS BIGINT) AS lon, CAST(p.latps[1] AS BIGINT) AS latp
  FROM way_feats f JOIN way_pts p ON f.object_id = p.way_id
  UNION ALL
  SELECT f.object_id, f.layer,
         CAST(p.lons[-1] AS BIGINT), CAST(p.latps[-1] AS BIGINT)
  FROM way_feats f JOIN way_pts p ON f.object_id = p.way_id
),
whits AS (
  SELECT w.object_id, w.layer, min(d.district_id) AS did
  FROM wends w JOIN districts d
    ON abs(w.lon - d.cx) + abs(w.latp - d.cy) < {spatial.DIST_R}
  GROUP BY 1, 2
)
SELECT f.object_id, f.layer,
  'd' || h.did AS district,
  CAST(h.did AS DOUBLE) AS district_id
FROM way_feats f LEFT JOIN whits h USING (object_id, layer)
""",
}
