"""Deterministic geocoder: web-page rows -> OSM-shaped feature tables.

The graft's source stage (SURVEY.md §0.1): instead of parsing .osm.pbf
(reference: src/read_pbf.cpp), features are derived from a document
table by pure integer arithmetic on a per-document number — fully
declarative Catalyst column expressions (no Python on this path), and
reproducible in ANSI SQL for the DuckDB oracle and in pure Python for
the golden oracle (tests/oracle.py).

Emits the three stores of FIXTURES.md §2 mirroring the reference's
OSMStore (include/osm_store.h:40-137):
  geo_nodes(node_id, lon, latp, tags, src)       int32-scale x 1e7 coords
  geo_ways(way_id, refs ARRAY<LONG>, tags, src)
  geo_relations(rel_id, outer_refs, inner_refs, tags, src)

Geocode rule (seeded by doc number d):
  h  = (d * 2654435761) % 2^32
  nf = h % 4 features; for k < nf:
  hk = (h + k*1013904223) % 2^32
  h2 = ((hk // 64) * 2654435761 + 40503) % 2^32   (decorrelated from
       hk's low-bit mods — hk % 3 selects kind, so every other variant
       choice must key off h2, not hk)
  kind = hk % 3 (0 point, 1 line, 2 polygon)
  region = (h // 65536) % 64                     doc-level 8x8 block grid
  lon0  = 94710000 + (hk % 1630) * 1000 + (region % 8) * 2000000
  latp0 = 534600000 + ((hk / 7) % 3200) * 1000 + (region // 8) * 2000000
  point: 1 tagged node, tag variant h2 % 6
  line:  nv = 4 + h2 % 9 vertices, integer step+wiggle walk (steps from
         h2), waterway iff h2 % 5 == 0 else highway[h2 % 4]
  poly:  octagon of radius r = 2000 + h2 % 8000 (+ closing vertex),
         tag variant h2 % 3
         h2 % 8 == 0  -> emitted as a RELATION of two open outer ways
                         (exercises J2 ring stitching)
         h2 % 16 == 0 -> plus an inner-octagon hole way (r/3)
IDs: node_id = d*256 + k*32 + j; way_id = d*8 + k*2 (+1);
     rel_id = d*8 + k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M32 = 4294967296
MUL = 2654435761
ADD = 1013904223
H2ADD = 40503

# octagon unit offsets (index j % 8)
OCT_DX = [1, 1, 0, -1, -1, -1, 0, 1]
OCT_DY = [0, 1, 1, 1, 0, -1, -1, -1]

POI_TAGS = [("amenity", "cafe"), ("amenity", "school"), ("shop", "bakery"),
            ("shop", "supermarket"), ("place", "town"), ("amenity", "bank")]
HIGHWAY_VALS = ["primary", "secondary", "residential", "track"]
POLY_TAGS = [("building", "yes"), ("natural", "water"), ("landuse", "forest")]


def doc_num_col(df: DataFrame) -> Column:
    """Per-document number: doc_id if present, else parsed from the url
    pattern https://...{n}/page/{n} (FIXTURES.md §1)."""
    if "doc_id" in df.columns:
        return F.col("doc_id").cast("long")
    return F.regexp_extract(F.col("url"), r"page/(\d+)$", 1).cast("long")


def _h(d: Column) -> Column:
    """(d * MUL) mod 2^32 without int64 overflow at planetary ids.

    The naive product overflows a signed long once d ≥ 2^63/MUL ≈
    3.47e9 — under the north rule's 10^12-document table that is every
    doc beyond the first 0.35%. Reduce mod 2^32 first, then split the
    multiplicand into 16-bit halves so every intermediate stays below
    2^49; the result is bit-identical to the ideal d*MUL mod 2^32 for
    all NONNEGATIVE longs — doc ids by contract (for negative d the
    truncated-% decomposition a != hi*65536 + lo breaks) — and
    therefore to the old expression wherever it didn't overflow: every
    committed golden/oracle value is unchanged. The DuckDB oracle
    (queries_core._H_SQL) mirrors this split form, so query/oracle
    pairs stay comparable at planetary ids. Regression coverage across
    the overflow boundary: tests/test_pipeline.py::test_geocode_hash_overflow."""
    a = d % F.lit(M32)
    hi = F.floor(a / F.lit(65536))
    lo = a % F.lit(65536)
    return (((hi * F.lit(MUL)) % F.lit(65536)) * F.lit(65536)
            + lo * F.lit(MUL)) % F.lit(M32)


def _h2(hk: Column) -> Column:
    """Variant-selection hash, decorrelated from hk's low-bit residues."""
    return (F.floor(hk / 64) * F.lit(MUL) + F.lit(H2ADD)) % F.lit(M32)


# Plan-construction note: this module is on every query's path and its
# plan used to be built from ~1.5k pyspark Column calls — each a Py4J
# round-trip (~1 ms), so the BUILD cost rivaled small-SF execution.
# The builders below therefore use selectExpr with whole-projection SQL
# strings (ONE round-trip per select, parsed JVM-side); the Column
# helpers above are kept for external callers (probe builders in
# queries_bytes). Semantics are pinned by the parity suite: the
# selectExpr plans produce row-identical output to the original Column
# plans at sf0.01 AND at planetary ids past the int64-overflow
# boundary (tests/test_pipeline.py::test_geocode_hash_overflow, the 53
# query/oracle pairs, and the pyramid byte goldens).

_EMPTY_TAGS_SQL = ("map_from_arrays(CAST(array() AS ARRAY<STRING>), "
                   "CAST(array() AS ARRAY<STRING>))")


def _sql_str_array(vals) -> str:
    return "array(" + ", ".join("'" + v + "'" for v in vals) + ")"


def _seed_frame(docs: DataFrame) -> DataFrame:
    """One row per (doc, feature k) with hash, kind and anchor coords."""
    d_expr = ("CAST(doc_id AS BIGINT)" if "doc_id" in docs.columns
              else r"CAST(regexp_extract(url, 'page/(\\d+)$', 1) AS BIGINT)")
    src_expr = "url" if "url" in docs.columns else "CAST(doc_id AS STRING)"
    # _h as SQL (16-bit-split modular multiply, see _h above)
    base = (docs
            .selectExpr(f"{d_expr} AS d", f"{src_expr} AS src")
            .selectExpr("d", "src", f"d % {M32} AS a")
            .selectExpr("d", "src",
                        f"(((FLOOR(a / 65536) * {MUL}) % 65536) * 65536"
                        f" + (a % 65536) * {MUL}) % {M32} AS h"))
    feats = (base
             .selectExpr("d", "src", "h", "explode(sequence(0, 2)) AS k")
             .where("k < h % 4"))
    # doc-level region: an 8x8 grid of 0.2-degree blocks — pages cluster
    # geographically (like real web corpora), and density per block stays
    # bounded as the corpus grows instead of piling one bbox ever denser
    return (feats
            .selectExpr("d", "src", "k",
                        f"(h + k * {ADD}) % {M32} AS hk",
                        "CAST(h / 65536 AS BIGINT) % 64 AS region")
            .selectExpr(
                "d", "src", "k", "hk",
                f"(FLOOR(hk / 64) * {MUL} + {H2ADD}) % {M32} AS h2",
                "hk % 3 AS kind",
                "CAST(94710000 + (hk % 1630) * 1000"
                " + (region % 8) * 2000000 AS INT) AS lon0",
                "CAST(534600000 + (CAST(hk / 7 AS BIGINT) % 3200) * 1000"
                " + CAST(region / 8 AS BIGINT) * 2000000 AS INT) AS latp0",
                "d * 256 + k * 32 AS nid0",
                "d * 8 + k * 2 AS wid0",
                "d * 8 + k AS rid"))


def _poly_r(hk: Column) -> Column:
    return (F.lit(2000) + hk % 8000).cast("int")


def geocode(docs: DataFrame):
    """-> (geo_nodes, geo_ways, geo_relations) DataFrames.

    Everything below is Catalyst column expressions over
    explode(sequence(...)) — zero Python, zero shuffles (narrow plan
    pushed onto the document scan).
    """
    seeds = _seed_frame(docs)
    idx6 = "CAST(h2 % 6 + 1 AS INT)"
    poi_tags_sql = (
        "map_from_arrays("
        f"array(element_at({_sql_str_array(k for k, _ in POI_TAGS)}, {idx6}), 'name'), "
        f"array(element_at({_sql_str_array(v for _, v in POI_TAGS)}, {idx6}), "
        "concat('poi-', d, '-', k)))")
    poly_tags_sql = (
        "map_from_arrays("
        f"array(element_at({_sql_str_array(k for k, _ in POLY_TAGS)}, CAST(h2 % 3 + 1 AS INT))), "
        f"array(element_at({_sql_str_array(v for _, v in POLY_TAGS)}, CAST(h2 % 3 + 1 AS INT))))")
    line_tags_sql = (
        "CASE WHEN h2 % 5 = 0 "
        "THEN map_from_arrays(array('waterway'), array('stream')) "
        "ELSE map_from_arrays(array('highway'), "
        f"array(element_at({_sql_str_array(HIGHWAY_VALS)}, CAST(h2 % 4 + 1 AS INT)))) END")
    oct_dx_sql = "array(" + ", ".join(str(v) for v in OCT_DX) + ")"
    oct_dy_sql = "array(" + ", ".join(str(v) for v in OCT_DY) + ")"

    # ---- points: 1 tagged node
    point_nodes = seeds.where("kind = 0").selectExpr(
        "nid0 AS node_id", "lon0 AS lon", "latp0 AS latp",
        f"{poi_tags_sql} AS tags", "src")

    # ---- lines: nv shape nodes + 1 way
    lines = seeds.where("kind = 1").selectExpr(
        "*",
        "CAST(4 + h2 % 9 AS INT) AS nv",
        "CASE WHEN h2 % 3 = 1 AND CAST(h2 / 3 AS BIGINT) % 3 = 1 THEN 4000"
        " ELSE (h2 % 3 - 1) * 4000 END AS sx",
        "(CAST(h2 / 3 AS BIGINT) % 3 - 1) * 4000 AS sy")
    line_nodes = (
        lines.selectExpr("*", "explode(sequence(0, nv - 1)) AS j")
        .selectExpr(
            "nid0 + j AS node_id",
            "CAST(lon0 + j * sx + ((hk * (j + 1)) % 7) * 500 AS INT) AS lon",
            "CAST(latp0 + j * sy + ((hk * (j + 2)) % 5) * 500 AS INT) AS latp",
            f"{_EMPTY_TAGS_SQL} AS tags", "src"))
    line_ways = lines.selectExpr(
        "wid0 AS way_id",
        "transform(sequence(0, nv - 1), j -> nid0 + j) AS refs",
        f"{line_tags_sql} AS tags", "src")

    # ---- polygons: octagon ring (8 nodes; way refs close the ring)
    polys = seeds.where("kind = 2").selectExpr(
        "*", "CAST(2000 + h2 % 8000 AS INT) AS r")
    poly_nodes = (
        polys.selectExpr("*", "explode(sequence(0, 7)) AS j")
        .selectExpr(
            "nid0 + j AS node_id",
            f"CAST(lon0 + element_at({oct_dx_sql}, j + 1) * r AS INT) AS lon",
            f"CAST(latp0 + element_at({oct_dy_sql}, j + 1) * r AS INT) AS latp",
            f"{_EMPTY_TAGS_SQL} AS tags", "src"))
    # inner-hole nodes for h2 % 16 == 0 (smaller octagon, ids nid0+8..15)
    hole_nodes = (
        polys.where("h2 % 16 = 0")
        .selectExpr("*", "explode(sequence(0, 7)) AS j")
        .selectExpr(
            "nid0 + 8 + j AS node_id",
            f"CAST(lon0 + element_at({oct_dx_sql}, j + 1)"
            " * CAST(r / 3 AS INT) AS INT) AS lon",
            f"CAST(latp0 + element_at({oct_dy_sql}, j + 1)"
            " * CAST(r / 3 AS INT) AS INT) AS latp",
            f"{_EMPTY_TAGS_SQL} AS tags", "src"))

    # plain closed-way polygons (not relation-built)
    simple_poly_ways = polys.where("h2 % 8 <> 0").selectExpr(
        "wid0 AS way_id",
        "concat(transform(sequence(0, 7), j -> nid0 + j), array(nid0)) AS refs",
        f"{poly_tags_sql} AS tags", "src")

    # relation-built polygons: ring split into two OPEN ways (J2 stitch)
    rel_polys = polys.where("h2 % 8 = 0")
    rel_way_a = rel_polys.selectExpr(
        "wid0 AS way_id",
        "transform(sequence(0, 4), j -> nid0 + j) AS refs",
        f"{_EMPTY_TAGS_SQL} AS tags", "src")
    rel_way_b = rel_polys.selectExpr(
        "wid0 + 1 AS way_id",
        "concat(transform(sequence(4, 7), j -> nid0 + j), array(nid0)) AS refs",
        f"{_EMPTY_TAGS_SQL} AS tags", "src")
    # hole ways get ids offset into free id space (2^40 past any wid0)
    hole_ways = rel_polys.where("h2 % 16 = 0").selectExpr(
        f"wid0 + {2 ** 40} AS way_id",
        "concat(transform(sequence(0, 7), j -> nid0 + 8 + j),"
        " array(nid0 + 8)) AS refs",
        f"{_EMPTY_TAGS_SQL} AS tags", "src")

    relations = rel_polys.selectExpr(
        "rid AS rel_id",
        "array(wid0, wid0 + 1) AS outer_refs",
        f"CASE WHEN h2 % 16 = 0 THEN array(wid0 + {2 ** 40})"
        " ELSE CAST(array() AS ARRAY<BIGINT>) END AS inner_refs",
        "map_concat(map_from_arrays(array('type'), array('multipolygon')), "
        f"{poly_tags_sql}) AS tags",
        "src")

    geo_nodes = point_nodes.unionByName(line_nodes).unionByName(poly_nodes).unionByName(hole_nodes)
    geo_ways = line_ways.unionByName(simple_poly_ways).unionByName(rel_way_a) \
                        .unionByName(rel_way_b).unionByName(hole_ways)
    return geo_nodes, geo_ways, relations
