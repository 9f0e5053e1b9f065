"""Geometry assembly: J1 way->node join, J2 relation ring assembly.

The reference resolves way node-refs through in-RAM hash maps
(include/osm_store.h:293-308) and assembles multipolygons per relation
(include/osm_store.h:172-256). Here:

- J1 is a set-level equi-join: posexplode(refs) ⋈ nodes on node_id,
  then groupBy(way_id) with an order-restoring sort_array — pure
  DataFrame ops, sort-merge or broadcast as Catalyst/AQE chooses.
- J2 is applyInPandas grouped by rel_id (groups are tiny — a handful
  of member ways), running the faithful fixpoint stitcher
  (kernels.geomops.assemble_rings) + hole assignment + winding fix.

Output geometry is the packed binary of kernels.geompack (int32
fixed-point), carried through the tile stages as one BINARY column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .kernels import geomops, geompack


def ways_with_coords(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """J1: way refs -> ordered coordinate arrays.

    -> (way_id, refs, lons ARRAY<INT>, latps ARRAY<INT>)
    reference: include/osm_store.h:293-308 (fillPoints).
    """
    exploded = ways.select("way_id", F.posexplode("refs").alias("pos", "node_id"))
    joined = exploded.join(nodes.select("node_id", "lon", "latp"), "node_id")
    return (
        joined.groupBy("way_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "node_id", "lon", "latp"))).alias("pts"))
        .select(
            "way_id",
            F.col("pts.node_id").alias("refs"),
            F.col("pts.lon").alias("lons"),
            F.col("pts.latp").alias("latps"),
        )
    )


def assemble_way_geometries(features: DataFrame, way_coords: DataFrame) -> DataFrame:
    """Attach geometry to way-features: linestring or single-ring polygon.

    Winding correction for polygons happens in the encode stage (same
    place the reference's geom::correct effectively lands for simple
    ways). -> features + (lons, latps).
    """
    wf = features.where(F.col("elem") == "way")
    return wf.join(
        way_coords.select(F.col("way_id").alias("object_id"), "lons", "latps"),
        "object_id",
    )


_REL_GEOM_SCHEMA = (
    "object_id long, elem string, layer string, kind int, "
    "attrs map<string,string>, attrs_num map<string,double>, "
    "attrs_bool map<string,boolean>, as_centroid boolean, geom binary, "
    "feat_minzoom int"
)


def assemble_relation_geometries(rel_features: DataFrame, relations: DataFrame,
                                 way_coords: DataFrame) -> DataFrame:
    """J2: multipolygon assembly per relation — streaming grouped
    execution (repartition + JVM sort + mapInPandas; see streamgroups):
    groups are tiny (a handful of member ways each), so per-group
    applyInPandas overhead used to dominate (measured 45 s for 5k
    relations; the actual stitching is milliseconds).

    Joins member ways (preserving member order — the reference's greedy
    stitcher is order-dependent, include/osm_store.h:186-239) to their
    coords, then per relation: stitch outer rings by shared endpoints,
    assign inners to the outer that contains them, fix winding.
    """
    from .streamgroups import group_slices, stream_grouped

    members = relations.select(
        "rel_id",
        F.posexplode(F.concat("outer_refs", "inner_refs")).alias("m_pos", "way_id"),
        F.size("outer_refs").alias("n_outer"),
    ).withColumn("role", F.when(F.col("m_pos") < F.col("n_outer"), F.lit("outer")).otherwise(F.lit("inner")))

    mem_coords = members.join(way_coords, "way_id", "left")
    feat = rel_features.select(
        F.col("object_id").alias("rel_id"), "elem", "layer", "kind",
        "attrs", "attrs_num", "attrs_bool", "as_centroid")
    # numPartitions MUST be pinned (REPARTITION_BY_NUM): an unpinned
    # repartition(col) is AQE-optimizable, and since mapInPandas declares
    # no required distribution, AQE's local shuffle read can hand each
    # task one MAPPER's slice of the hash partitions — splitting a
    # rel_id's members across tasks. Measured at x64/32 cores: 14,956 of
    # 20,004 relations assembled as partial half-rings (then rollup's
    # dropDuplicates kept an arbitrary half -> parallelism-dependent
    # tiles). Pinning the count makes the exchange user-specified, which
    # AQE never rewrites.
    from .session import python_stage_partitions

    grouped = (mem_coords.join(feat, "rel_id")
               .repartition(python_stage_partitions(rel_features.sparkSession,
                                                    input_df=rel_features),
                            F.col("rel_id"))
               .sortWithinPartitions("rel_id", "layer", "m_pos"))

    out_cols = ["object_id", "elem", "layer", "kind", "attrs", "attrs_num",
                "attrs_bool", "as_centroid", "geom", "feat_minzoom"]

    def _assemble_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        rel = pdf["rel_id"].to_numpy(dtype=np.int64)
        role = pdf["role"].to_numpy(dtype=object)
        refs = pdf["refs"].to_numpy(dtype=object)
        lons = pdf["lons"].to_numpy(dtype=object)
        latps = pdf["latps"].to_numpy(dtype=object)
        elem = pdf["elem"].to_numpy(dtype=object)
        layer = pdf["layer"].to_numpy(dtype=object)
        kind = pdf["kind"].to_numpy(dtype=np.int64)
        attrs = pdf["attrs"].to_numpy(dtype=object)
        anum = pdf["attrs_num"].to_numpy(dtype=object)
        abool = pdf["attrs_bool"].to_numpy(dtype=object)
        asc = pdf["as_centroid"].to_numpy()
        out_rows = []
        for s, e in group_slices(pdf, ["rel_id", "layer"]):
            # missing member ways tolerated with a warning by the
            # reference (README.md:114) — drop them
            rows = [j for j in range(s, e) if refs[j] is not None]
            if not rows:
                continue
            outer_ids = [np.asarray(refs[j], dtype=np.int64)
                         for j in rows if role[j] == "outer"]
            inner_ids = [np.asarray(refs[j], dtype=np.int64)
                         for j in rows if role[j] == "inner"]
            coord: dict = {}
            for j in rows:
                for nid, lo, la in zip(refs[j], lons[j], latps[j]):
                    coord[int(nid)] = (int(lo), int(la))
            outers, inners = geomops.assemble_rings(outer_ids, inner_ids)

            def ring_xy(ids):
                lo = np.fromiter((coord[int(i)][0] for i in ids), dtype=np.int64, count=len(ids))
                la = np.fromiter((coord[int(i)][1] for i in ids), dtype=np.int64, count=len(ids))
                return lo, la

            polys = []
            # Deliberate reference parity: each inner ring is attached
            # to EVERY outer that contains it, exactly like the
            # reference's per-outer `geom::within(inner, poly.outer())`
            # loop (include/osm_store.h:241-250). For a nested
            # lake->island->pond relation this duplicates the pond hole
            # under both outers (flipping even-odd parity there) — an
            # ideal assembler would attach each inner to its SMALLEST
            # containing outer, but the contract here is matching the
            # reference's output, not improving on it.
            for o in outers:
                ox, oy = ring_xy(o)
                ox, oy = geomops.correct_winding(ox, oy, outer=True)
                rings = [(ox, oy)]
                for inn in inners:
                    ix, iy = ring_xy(inn)
                    if geomops.ring_within_ring(ix.astype(np.float64), iy.astype(np.float64),
                                                ox.astype(np.float64), oy.astype(np.float64)):
                        ix, iy = geomops.correct_winding(ix, iy, outer=False)
                        rings.append((ix, iy))
                polys.append(rings)
            if not polys:
                continue
            j0 = rows[0]
            area2 = 0
            for rings in polys:
                ox, oy = rings[0]
                area2 += abs(int(np.sum(ox[:-1] * oy[1:] - ox[1:] * oy[:-1])))
            out_rows.append((int(rel[j0]), elem[j0], layer[j0], int(kind[j0]),
                             attrs[j0], anum[j0], abool[j0], bool(asc[j0]),
                             geompack.pack_polygon(polys),
                             feature_minzoom_py(3, area2, 0)))
        return pd.DataFrame(out_rows, columns=out_cols)

    return grouped.mapInPandas(stream_grouped(["rel_id"], _assemble_batch),
                               schema=_REL_GEOM_SCHEMA)


def pack_way_geometries(way_feats_with_coords: DataFrame) -> DataFrame:
    """Pack (lons, latps) into binary geom per feature kind — vectorized
    pandas UDF (Arrow batches)."""
    from pyspark.sql.types import BinaryType
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _pack(kind: pd.Series, lons: pd.Series, latps: pd.Series) -> pd.Series:
        out = []
        for k, lo, la in zip(kind, lons, latps):
            lo = np.asarray(lo, dtype=np.int64)
            la = np.asarray(la, dtype=np.int64)
            if k == 3:  # polygon: single ring, winding corrected
                ox, oy = geomops.correct_winding(lo, la, outer=True)
                out.append(geompack.pack_polygon([[(ox, oy)]]))
            else:
                out.append(geompack.pack_line([(lo, la)]))
        return pd.Series(out)

    return (
        way_feats_with_coords
        .withColumn("geom", _pack(F.col("kind"), F.col("lons"), F.col("latps")))
        .drop("lons", "latps")
    )


# Per-feature minzoom by size (projected-degree fixed-point units).
# Mirrors the reference's Lua pattern of gating features into low zooms
# by Area()/Length() thresholds (resources/process-openmaptiles.lua
# sets minzoom from way_area; CONFIGURATION.md:147-199) — and at scale
# it is what BOUNDS a z6 tile's group size: small features simply do
# not exist at low zooms, no matter how many rows the input has.
AREA2_MINZOOM = [(400_000_000, 6), (150_000_000, 9), (40_000_000, 11)]
AREA2_MINZOOM_ELSE = 12
LEN2_MINZOOM = [(300_000_000, 8), (100_000_000, 10)]
LEN2_MINZOOM_ELSE = 11


def _shoelace2(lons: Column, latps: Column) -> Column:
    """|2 × area| over a closed ring, exact int64 (same formula as the
    A7 oracle — queries_core.q_a7_poly_area)."""
    return F.abs(F.aggregate(
        F.sequence(F.lit(1), F.size(lons) - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.element_at(lons, i).cast("long") * F.element_at(latps, i + 1).cast("long")
        - F.element_at(lons, i + 1).cast("long") * F.element_at(latps, i).cast("long")))


def _seg_len2(lons: Column, latps: Column) -> Column:
    return F.aggregate(
        F.sequence(F.lit(1), F.size(lons) - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + (F.element_at(lons, i + 1).cast("long") - F.element_at(lons, i).cast("long"))
        * (F.element_at(lons, i + 1).cast("long") - F.element_at(lons, i).cast("long"))
        + (F.element_at(latps, i + 1).cast("long") - F.element_at(latps, i).cast("long"))
        * (F.element_at(latps, i + 1).cast("long") - F.element_at(latps, i).cast("long")))


def _threshold_case(measure: Column, table: list, default: int) -> Column:
    expr = F.lit(default)
    for bound, z in reversed(table):
        expr = F.when(measure >= bound, F.lit(z)).otherwise(expr)
    return expr


def feature_minzoom_py(kind: int, area2: int, len2: int) -> int:
    """Pure-Python mirror of the minzoom thresholds (oracle side)."""
    if kind == 3:
        for bound, z in AREA2_MINZOOM:
            if area2 >= bound:
                return z
        return AREA2_MINZOOM_ELSE
    if kind == 2:
        for bound, z in LEN2_MINZOOM:
            if len2 >= bound:
                return z
        return LEN2_MINZOOM_ELSE
    return 0


def assemble_features(nodes: DataFrame, ways: DataFrame, relations: DataFrame,
                      node_feats: DataFrame, way_feats: DataFrame,
                      rel_feats: DataFrame) -> DataFrame:
    """Full assembly -> features(object_id, elem, layer, kind, attrs,
    as_centroid, geom BINARY, lon, latp, feat_minzoom).

    Point features keep (lon, latp) columns and a null geom — points are
    the common case and skip binary packing entirely.
    """
    point_features = node_feats.select(
        "object_id", "elem", "layer", "kind", "attrs", "attrs_num", "attrs_bool",
        "as_centroid",
        F.lit(None).cast("binary").alias("geom"), "lon", "latp",
        F.lit(0).alias("feat_minzoom"))

    # way_coords feeds BOTH the way branch and the relation branch of the
    # union; an eager localCheckpoint materializes the J1 join+groupBy
    # exactly once and truncates the lineage (a lazy persist would race:
    # both branches run in the same job and would each compute it).
    # At cluster scale this is the durable stage-checkpoint boundary.
    way_coords = ways_with_coords(ways, nodes).localCheckpoint()
    wf = assemble_way_geometries(way_feats, way_coords)
    fmz = F.when(F.col("kind") == 3,
                 _threshold_case(_shoelace2(F.col("lons"), F.col("latps")),
                                 AREA2_MINZOOM, AREA2_MINZOOM_ELSE)) \
           .when(F.col("kind") == 2,
                 _threshold_case(_seg_len2(F.col("lons"), F.col("latps")),
                                 LEN2_MINZOOM, LEN2_MINZOOM_ELSE)) \
           .otherwise(F.lit(0))
    wf = wf.withColumn("feat_minzoom", fmz)
    wf_packed = pack_way_geometries(wf).select(
        "object_id", "elem", "layer", "kind", "attrs", "attrs_num", "attrs_bool",
        "as_centroid", "geom",
        F.lit(None).cast("int").alias("lon"), F.lit(None).cast("int").alias("latp"),
        "feat_minzoom")

    rf = assemble_relation_geometries(rel_feats, relations, way_coords).select(
        "object_id", "elem", "layer", "kind", "attrs", "attrs_num", "attrs_bool",
        "as_centroid", "geom",
        F.lit(None).cast("int").alias("lon"), F.lit(None).cast("int").alias("latp"),
        "feat_minzoom")

    return point_features.unionByName(wf_packed).unionByName(rf)
