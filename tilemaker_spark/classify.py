"""Layer classification (F1/F2/F5/F6) — the Lua hook surface, declaratively.

The reference dispatches every object to a user Lua function
(node_function/way_function, src/osm_lua_processing.cpp:369-530) that
emits 0..n Layer() calls with attributes. Here the same contract is a
declarative rule table compiled to Catalyst CASE/WHEN expressions
producing ARRAY<STRUCT<layer, kind, attrs>>, then explode — one feature
row per emission, entirely JVM-side (north_rule: no per-row Python).

Contract details preserved (SURVEY.md §2.9):
- node_keys pre-filter before tag work (F1, src/read_pbf.cpp:35-52)
- Find()/Holds() -> element_at/map_contains_key (F2)
- IsClosed(): refs[1]==refs[-1] (F4, src/osm_store.cpp:76-79)
- empty-string attributes dropped (src/osm_lua_processing.cpp:329)
- relations are processed like closed ways (src/osm_lua_processing.cpp:470-489)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# significant node keys (F1) — cf. process.lua:3 node_keys
NODE_KEYS = ["amenity", "shop", "place"]

KIND_POINT, KIND_LINE, KIND_POLYGON = 1, 2, 3


def tag(k: str) -> Column:
    """Find(): '' if absent (reference: src/osm_lua_processing.cpp:96-101)."""
    return F.coalesce(F.element_at(F.col("tags"), k), F.lit(""))


def holds(k: str) -> Column:
    """Holds() (reference: src/osm_lua_processing.cpp:103-107)."""
    return F.element_at(F.col("tags"), k).isNotNull()


@dataclass
class Rule:
    layer: str
    pred: Column
    kind: int                       # emitted geometry kind for this rule
    elem: str                       # 'node' | 'way' | 'relation'
    attrs: dict = field(default_factory=dict)   # Attribute(): name -> Column (string)
    num_attrs: dict = field(default_factory=dict)   # AttributeNumeric() -> double
    bool_attrs: dict = field(default_factory=dict)  # AttributeBoolean() -> boolean
    as_centroid: bool = False       # LayerAsCentroid (A6)


def _typed_map(attrs: dict, spark_type: str, drop_empty: bool) -> Column:
    names = list(attrs.keys())
    if not names:
        return F.map_from_arrays(F.array().cast("array<string>"),
                                 F.array().cast(f"array<{spark_type}>"))
    m = F.map_from_arrays(
        F.array(*[F.lit(n) for n in names]),
        F.array(*[attrs[n].cast(spark_type) for n in names]),
    )
    # empty-string attribute values dropped (osm_lua_processing.cpp:329);
    # null numerics/booleans (failed casts, like Lua tonumber(nil)) too
    if drop_empty:
        return F.map_filter(m, lambda k, v: v.isNotNull() & (v != ""))
    return F.map_filter(m, lambda k, v: v.isNotNull())


def _emission(rule: Rule) -> Column:
    """One Layer() emission: string attrs (Attribute), numeric attrs as
    double (AttributeNumeric -> Tile_Value float arm) and boolean attrs
    (AttributeBoolean -> bool arm); reference:
    src/osm_lua_processing.cpp:327-356."""
    payload = F.struct(
        F.lit(rule.layer).alias("layer"),
        F.lit(rule.kind).alias("kind"),
        _typed_map(rule.attrs, "string", True).alias("attrs"),
        _typed_map(rule.num_attrs, "double", False).alias("attrs_num"),
        _typed_map(rule.bool_attrs, "boolean", False).alias("attrs_bool"),
        F.lit(rule.as_centroid).alias("as_centroid"),
    )
    return F.when(rule.pred, payload).otherwise(F.lit(None))


def default_node_rules() -> list:
    """POI/place classification — vocab follows process.lua:16-24."""
    return [
        Rule("poi", holds("amenity") | holds("shop"), KIND_POINT, "node",
             {"class": F.coalesce(F.element_at(F.col("tags"), "amenity"),
                                  F.element_at(F.col("tags"), "shop")),
              "name": tag("name")}),
        Rule("place", holds("place"), KIND_POINT, "node",
             {"class": tag("place"), "name": tag("name")},
             # AttributeNumeric: rank derived from the name, like the
             # openmaptiles profile's numeric rank attributes
             # (src/osm_lua_processing.cpp:335-344)
             num_attrs={"rank": F.length(tag("name")).cast("double")}),
    ]


def default_way_rules() -> list:
    """Way/relation classification — vocab follows process.lua:26-46.
    ``is_closed`` column gates polygon emission (F4)."""
    closed = F.col("is_closed")
    return [
        Rule("transportation", holds("highway"), KIND_LINE, "way",
             {"class": tag("highway")},
             # AttributeBoolean (src/osm_lua_processing.cpp:350-356)
             bool_attrs={"paved": tag("highway").isin("primary", "secondary")}),
        Rule("waterway", holds("waterway") & ~closed, KIND_LINE, "way",
             {"class": tag("waterway")}),
        Rule("building", holds("building") & closed, KIND_POLYGON, "way", {}),
        Rule("water", (tag("natural") == "water") & closed, KIND_POLYGON, "way",
             {"class": F.lit("water")}),
        Rule("landcover", (holds("landuse") | holds("leisure")) & closed, KIND_POLYGON, "way",
             {"class": F.coalesce(F.element_at(F.col("tags"), "landuse"),
                                  F.element_at(F.col("tags"), "leisure"))}),
    ]


def significant_nodes(nodes: DataFrame, node_keys: list | None = None) -> DataFrame:
    """F1: pushdown filter — node processed only if it has a significant key
    (reference: src/read_pbf.cpp:35-52). Catalyst predicate, pushed to scan."""
    keys = node_keys or NODE_KEYS
    pred = F.arrays_overlap(F.map_keys(F.col("tags")),
                            F.array(*[F.lit(k) for k in keys]))
    return nodes.where(F.size(F.map_keys(F.col("tags"))) > 0).where(pred)


def classify_nodes(nodes: DataFrame, rules: list | None = None) -> DataFrame:
    """-> features(object_id, elem, layer, kind, attrs, as_centroid, lon, latp)"""
    rules = rules or default_node_rules()
    sig = significant_nodes(nodes)
    emissions = F.filter(F.array(*[_emission(r) for r in rules]), lambda e: e.isNotNull())
    return (
        sig.select(
            F.col("node_id").alias("object_id"),
            F.lit("node").alias("elem"),
            F.col("lon"), F.col("latp"),
            F.explode(emissions).alias("e"),
        )
        .select("object_id", "elem", "lon", "latp",
                F.col("e.layer").alias("layer"), F.col("e.kind").alias("kind"),
                F.col("e.attrs").alias("attrs"),
                F.col("e.attrs_num").alias("attrs_num"),
                F.col("e.attrs_bool").alias("attrs_bool"),
                F.col("e.as_centroid").alias("as_centroid"))
    )


def classify_ways(ways: DataFrame, rules: list | None = None) -> DataFrame:
    """-> features(object_id, elem, layer, kind, attrs, as_centroid)
    ``ways`` must have (way_id, refs, tags). IsClosed computed here (F4)."""
    rules = rules or default_way_rules()
    w = ways.withColumn(
        "is_closed",
        F.element_at(F.col("refs"), 1) == F.element_at(F.col("refs"), -1),
    )
    emissions = F.filter(F.array(*[_emission(r) for r in rules]), lambda e: e.isNotNull())
    return (
        w.select(F.col("way_id").alias("object_id"), F.lit("way").alias("elem"),
                 F.explode(emissions).alias("e"))
        .select("object_id", "elem",
                F.col("e.layer").alias("layer"), F.col("e.kind").alias("kind"),
                F.col("e.attrs").alias("attrs"),
                F.col("e.attrs_num").alias("attrs_num"),
                F.col("e.attrs_bool").alias("attrs_bool"),
                F.col("e.as_centroid").alias("as_centroid"))
    )


def classify_relations(relations: DataFrame, rules: list | None = None) -> DataFrame:
    """Relations run through the way rules with IsClosed()==true
    (reference: src/osm_lua_processing.cpp:470-489)."""
    rules = rules or default_way_rules()
    r = relations.withColumn("is_closed", F.lit(True))
    emissions = F.filter(F.array(*[_emission(x) for x in rules]), lambda e: e.isNotNull())
    return (
        r.select(F.col("rel_id").alias("object_id"), F.lit("relation").alias("elem"),
                 F.explode(emissions).alias("e"))
        .select("object_id", "elem",
                F.col("e.layer").alias("layer"), F.col("e.kind").alias("kind"),
                F.col("e.attrs").alias("attrs"),
                F.col("e.attrs_num").alias("attrs_num"),
                F.col("e.attrs_bool").alias("attrs_bool"),
                F.col("e.as_centroid").alias("as_centroid"))
    )
