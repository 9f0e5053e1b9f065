"""Per-tile MVT encode stage (A4/A5/A8, F8/F9, G5-G18, W3/W4).

One applyInPandas over groupBy(z, x, y): inside each group the full
reference tile-worker flow (src/tile_worker.cpp:102-254) runs
vectorized per feature:

  sort/dedup (A4, src/tile_data.cpp:125-136)
  -> per output-layer group in declaration order (W4)
  -> zoom-range filter (F8) + simplify tolerance (src/tile_worker.cpp:167-176)
  -> clip (G7-G9, src/output_object.cpp:25-74)
  -> optional same-attribute merge (A5, --combine)
  -> Douglas-Peucker (G10) -> 4096-grid scale (G6)
  -> MVT command stream (G16) + attr dictionaries (A8/G17)
  -> protobuf + gzip (G18)

Returns (z, x, y, tile BINARY, feature_count, geometry_hash) — the
metrics columns feed the lineage table (north_rule).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .config import Config
from .kernels import clip as C, geomops, geompack, mercator as M, mvt, simplify as S

ENCODE_SCHEMA = ("z int, x long, y long, tile binary, feature_count int, "
                 "geometry_hash long, raw_bytes int")


def _attrs_key(attrs: dict) -> str:
    """Canonical attribute sort key (A4) — mirrors the reference's
    lexicographic Tile_Value compare (src/output_object.cpp:154-176)."""
    if not attrs:
        return ""
    return "\x1f".join(f"{k}\x1e{attrs[k]}" for k in sorted(attrs))


def _scale_ring(bb: M.TileBbox, lons: np.ndarray, latps: np.ndarray):
    return bb.scale_latp_lon(latps, lons)


def _encode_feature_geom(row, bb: M.TileBbox, tol: float, include_centroid: bool):
    """-> (geom_type, command list) or None if clipped/degenerate away."""
    kind = row["kind"]
    box = bb.clip_box
    if kind == 1 or row["as_centroid"]:
        if row["as_centroid"] and row["geom"] is not None:
            gk, payload = geompack.unpack(bytes(row["geom"]))
            rings_f = [[(lo / 1e7, la / 1e7) for lo, la in rings] for rings in payload]
            cx, cy = geomops.multipolygon_centroid(
                [[(np.asarray(x), np.asarray(y)) for x, y in rings] for rings in rings_f])
        else:
            cx, cy = row["lon"] / 1e7, row["latp"] / 1e7
        if not C.clip_point(cx, cy, box):
            return None
        px, py = bb.scale_latp_lon(np.array([cy]), np.array([cx]))
        return mvt.GEOM_POINT, mvt.encode_point_geometry(int(px[0]), int(py[0]))

    gk, payload = geompack.unpack(bytes(row["geom"]))
    if kind == 2:  # multilinestring
        parts = []
        for lo, la in payload:
            pieces = C.clip_line(lo / 1e7, la / 1e7, box)
            for xs, ys in pieces:
                if tol > 0.0:
                    xs, ys = S.simplify_line(xs, ys, tol)
                parts.append(_scale_ring(bb, xs, ys))
        cmds = mvt.encode_line_geometry(parts)
        return (mvt.GEOM_LINESTRING, cmds) if cmds else None

    # polygon
    polys = []
    for rings in payload:
        out_rings = []
        for ri, (lo, la) in enumerate(rings):
            xs, ys = lo / 1e7, la / 1e7
            if not C.ring_within_box(xs, ys, box):
                res = C.clip_ring(xs, ys, box)
                if res is None:
                    if ri == 0:
                        out_rings = []
                        break
                    continue
                xs, ys = res
                xs, ys = geomops.correct_winding(xs, ys, outer=(ri == 0))
            if tol > 0.0:
                res = S.simplify_ring(xs, ys, tol)
                if res is None:
                    if ri == 0:
                        out_rings = []
                        break
                    continue
                xs, ys = res
            out_rings.append(_scale_ring(bb, xs, ys))
        if out_rings:
            polys.append(out_rings)
    cmds = mvt.encode_polygon_geometry(polys)
    return (mvt.GEOM_POLYGON, cmds) if cmds else None


def make_encoder(cfg: Config):
    """Returns the applyInPandas function closure (cfg is tiny; it ships
    in the pickled closure — the broadcast-variable pattern without the
    SparkContext dependency)."""
    layer_order = cfg.layer_order
    layers_cfg = cfg.layers

    def encode_tiles(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (z, x, y), g in pdf.groupby(["z", "x", "y"], sort=False):
            z, x, y = int(z), int(x), int(y)
            bb = M.TileBbox(x, y, z)
            # F7: skip tiles wholly outside config bbox
            if cfg.bounding_box is not None:
                mnl, mnla, mxl, mxla = cfg.bounding_box
                if mxl <= bb.min_lon or mnl >= bb.max_lon or \
                   mxla <= bb.min_lat or mnla >= bb.max_lat:
                    continue
            # A4: canonical sort + dedup (_ak precomputed in Catalyst by
            # encode_zoom; python fallback for direct callers)
            if "_ak" not in g.columns:
                g = g.assign(_ak=[_attrs_key(a) for a in g["attrs"]])
            g = g.sort_values(["layer", "kind", "_ak", "elem", "object_id"], kind="mergesort")
            g = g.drop_duplicates(["layer", "kind", "_ak", "elem", "object_id"])

            vt_layers = []
            n_feats = 0
            ghash = 0
            for group in layer_order:
                dicts = mvt.LayerDicts()
                feats = []
                for sub in group:
                    ld = layers_cfg[sub]
                    if z < ld.minzoom or z > ld.maxzoom:
                        continue  # F8
                    rows = g[g["layer"] == sub]
                    if rows.empty:
                        continue
                    tol = ld.simplify_tolerance(z, y)
                    merged_rows = rows
                    if cfg.combine_similar:
                        # A5: same (kind, attrs) run merged into one
                        # multi-geometry feature (concatenating parts)
                        merged = []
                        for (_, _ak), run in rows.groupby(["kind", "_ak"], sort=False):
                            first = run.iloc[0].copy()
                            if len(run) > 1 and first["kind"] in (2, 3) and first["geom"] is not None:
                                bufs = [geompack.unpack(bytes(b)) for b in run["geom"]]
                                if first["kind"] == 2:
                                    parts = [p for _, pl in bufs for p in pl]
                                    first["geom"] = geompack.pack_line(parts)
                                else:
                                    polys = [p for _, pl in bufs for p in pl]
                                    first["geom"] = geompack.pack_polygon(polys)
                                merged.append(first)
                            else:
                                merged.extend(r for _, r in run.iterrows())
                        merged_rows = pd.DataFrame(merged) if merged else rows.iloc[0:0]
                    for row in merged_rows.to_dict("records"):
                        res = _encode_feature_geom(row, bb, tol, False)
                        if res is None:
                            continue  # F9 / G7 drop
                        gt, cmds = res
                        tag_idx = []
                        for k in sorted(row["attrs"] or {}):
                            tag_idx.append(dicts.key_index(k))
                            tag_idx.append(dicts.value_index(row["attrs"][k]))
                        feats.append(mvt.encode_feature(
                            gt, cmds, tag_idx,
                            feature_id=int(row["object_id"]) if cfg.include_ids else None))
                        n_feats += 1
                        ghash = (ghash * 1000003 + zlib.crc32(bytes(np.array(cmds, dtype=np.int64))) + gt) & 0x7FFFFFFFFFFFFFFF
                if feats:
                    vt_layers.append(mvt.encode_layer(
                        group[0], feats, dicts.keys, dicts.values,
                        version=cfg.mvt_version))
            # NB: the reference writes the tile file even when every layer
            # filtered out (src/tile_worker.cpp:229-250) — keep the row
            # with an empty Tile message for exact tile-set parity
            raw = mvt.encode_tile(vt_layers)
            data = mvt.compress_tile(raw, use_gzip=cfg.gzip) if cfg.compress else raw
            out.append({"z": z, "x": x, "y": y, "tile": data,
                        "feature_count": n_feats,
                        "geometry_hash": int(ghash),
                        "raw_bytes": len(raw)})
        cols = ["z", "x", "y", "tile", "feature_count", "geometry_hash", "raw_bytes"]
        return pd.DataFrame(out, columns=cols)

    return encode_tiles


LAYER_GROUP_SCHEMA = ("z int, x long, y long, order_idx int, layer_bytes binary, "
                      "feature_count int, layer_hash long, raw_bytes int")


def make_layer_encoder(cfg: Config):
    """Per-(tile, OUTPUT-layer) encoder — the skew answer for metro
    tiles: MVT layers are independent (sort/dedup A4, merge A5 and the
    key/value dictionaries A8 are all per-layer), so encoding them as
    separate groups multiplies parallelism by the layer count and
    bounds the largest group at 1/n_layers of the hottest tile. The
    cheap cross-layer work (W4 ordering, protobuf framing, gzip) moves
    to assemble_tiles."""
    layer_order = cfg.layer_order
    layers_cfg = cfg.layers
    group_index = {group[0]: (i, group) for i, group in enumerate(layer_order)}

    def encode_layer_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (z, x, y, out_layer), g in pdf.groupby(["z", "x", "y", "_out_layer"], sort=False):
            z, x, y = int(z), int(x), int(y)
            bb = M.TileBbox(x, y, z)
            if cfg.bounding_box is not None:
                mnl, mnla, mxl, mxla = cfg.bounding_box
                if mxl <= bb.min_lon or mnl >= bb.max_lon or \
                   mxla <= bb.min_lat or mnla >= bb.max_lat:
                    continue  # F7
            if "_ak" not in g.columns:
                g = g.assign(_ak=[_attrs_key(a) for a in g["attrs"]])
            # elem is part of the identity: way and relation id spaces
            # overlap in the geocoder, and without it the dedup winner
            # was partition-order dependent (observed as a ±1 feature
            # count between runs)
            g = g.sort_values(["layer", "kind", "_ak", "elem", "object_id"], kind="mergesort")
            g = g.drop_duplicates(["layer", "kind", "_ak", "elem", "object_id"])

            order_idx, group = group_index[out_layer]
            dicts = mvt.LayerDicts()
            feats = []
            n_feats = 0
            ghash = 0
            for sub in group:
                ld = layers_cfg[sub]
                if z < ld.minzoom or z > ld.maxzoom:
                    continue  # F8
                rows = g[g["layer"] == sub]
                if rows.empty:
                    continue
                tol = ld.simplify_tolerance(z, y)
                merged_rows = rows
                if cfg.combine_similar:
                    merged = []
                    for (_, _ak), run in rows.groupby(["kind", "_ak"], sort=False):
                        first = run.iloc[0].copy()
                        if len(run) > 1 and first["kind"] in (2, 3) and first["geom"] is not None:
                            bufs = [geompack.unpack(bytes(b)) for b in run["geom"]]
                            if first["kind"] == 2:
                                parts = [p for _, pl in bufs for p in pl]
                                first["geom"] = geompack.pack_line(parts)
                            else:
                                polys = [p for _, pl in bufs for p in pl]
                                first["geom"] = geompack.pack_polygon(polys)
                            merged.append(first)
                        else:
                            merged.extend(r for _, r in run.iterrows())
                    merged_rows = pd.DataFrame(merged) if merged else rows.iloc[0:0]
                for row in merged_rows.to_dict("records"):
                    res = _encode_feature_geom(row, bb, tol, False)
                    if res is None:
                        continue  # F9 / G7 drop
                    gt, cmds = res
                    tag_idx = []
                    for k in sorted(row["attrs"] or {}):
                        tag_idx.append(dicts.key_index(k))
                        tag_idx.append(dicts.value_index(row["attrs"][k]))
                    feats.append(mvt.encode_feature(
                        gt, cmds, tag_idx,
                        feature_id=int(row["object_id"]) if cfg.include_ids else None))
                    n_feats += 1
                    ghash = (ghash * 1000003 + zlib.crc32(bytes(np.array(cmds, dtype=np.int64))) + gt) & 0x7FFFFFFFFFFFFFFF
            if not feats:
                continue
            layer_msg = mvt.encode_layer(group[0], feats, dicts.keys, dicts.values,
                                         version=cfg.mvt_version)
            framed = mvt.encode_tile([layer_msg])  # Tile.layers framing
            out.append({"z": z, "x": x, "y": y, "order_idx": order_idx,
                        "layer_bytes": framed, "feature_count": n_feats,
                        "layer_hash": int(ghash), "raw_bytes": len(framed)})
        cols = ["z", "x", "y", "order_idx", "layer_bytes", "feature_count",
                "layer_hash", "raw_bytes"]
        return pd.DataFrame(out, columns=cols)

    return encode_layer_groups


def encode_zoom(assigned: DataFrame, cfg: Config) -> DataFrame:
    """(z,x,y,...feature rows) -> (z,x,y,tile,...) in two stages:
    per-(tile,output-layer) encode, then Catalyst tile assembly.

    Scale-critical shaping BEFORE the shuffle (all Catalyst):
    - F8 zoom-range filter pushed down: a z0 tile would otherwise
      receive every feature in the world as one group (60k+ rows per
      mapper at sf0.1×8 — unbounded at 100 TB) only to drop them after
      the shuffle. Tile-set parity with the reference (which emits
      empty tiles, src/tile_worker.cpp:229-250) is preserved by a
      distinct-coords left join that re-adds fully-filtered tiles with
      an empty MVT body.
    - the canonical attribute sort key (A4) is computed as a column so
      the per-tile Python loop never re-derives it per row.
    """
    from pyspark.sql import functions as F

    minz = F.create_map(*[x for name, ld in cfg.layers.items()
                          for x in (F.lit(name), F.lit(ld.minzoom))])
    maxz = F.create_map(*[x for name, ld in cfg.layers.items()
                          for x in (F.lit(name), F.lit(ld.maxzoom))])
    ak = F.array_join(
        F.transform(F.array_sort(F.map_entries("attrs")),
                    lambda e: F.concat_ws("\x1e", e["key"], e["value"])),
        "\x1f")
    out_layer = F.create_map(*[x for name in cfg.layers
                               for x in (F.lit(name), F.lit(cfg.output_layer_of(name)))])
    eligible = (assigned
                .where((F.col("z") >= F.element_at(minz, F.col("layer")))
                       & (F.col("z") <= F.element_at(maxz, F.col("layer"))))
                .withColumn("_ak", ak)
                .withColumn("_out_layer", F.element_at(out_layer, F.col("layer"))))
    layer_groups = eligible.groupBy("z", "x", "y", "_out_layer").applyInPandas(
        make_layer_encoder(cfg), schema=LAYER_GROUP_SCHEMA)

    # ---- W4 tile assembly: order layers, concat framed bytes (Catalyst)
    parts = (layer_groups.groupBy("z", "x", "y").agg(
        F.sort_array(F.collect_list(F.struct("order_idx", "layer_bytes"))).alias("parts"),
        F.sort_array(F.collect_list(F.struct("order_idx", "layer_hash"))).alias("hparts"),
        F.sum("feature_count").cast("int").alias("feature_count"),
        F.sum("raw_bytes").cast("int").alias("raw_bytes")))
    raw_col = F.aggregate("parts", F.lit(b""),
                          lambda acc, p: F.concat(acc, p["layer_bytes"]))
    hash_col = F.aggregate(
        "hparts", F.lit(0).cast("long"),
        lambda acc, p: (acc * 31 + F.pmod(p["layer_hash"], F.lit(1000000007))) % F.lit(1000000007))
    assembled = parts.select("z", "x", "y", raw_col.alias("raw"),
                             hash_col.alias("geometry_hash"),
                             "feature_count", "raw_bytes")

    # gzip/deflate (G18) — vectorized scalar pandas UDF over tile bytes
    if cfg.compress:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BinaryType

        use_gzip = cfg.gzip

        @pandas_udf(BinaryType())
        def compress(raw):
            return raw.apply(lambda b: mvt.compress_tile(bytes(b), use_gzip=use_gzip))

        assembled = assembled.withColumn("tile", compress(F.col("raw")))
    else:
        assembled = assembled.withColumn("tile", F.col("raw"))
    tiles = assembled.select("z", "x", "y", "tile", "feature_count",
                             "geometry_hash", "raw_bytes")

    # empty-tile parity: the tile COORD set derives from the index, not
    # from post-filter contents (reference: tile_data.cpp:163-170)
    empty_raw = mvt.encode_tile([])
    empty_bytes = (mvt.compress_tile(empty_raw, use_gzip=cfg.gzip)
                   if cfg.compress else empty_raw)
    coords = assigned.select("z", "x", "y").distinct()
    if cfg.bounding_box is not None:
        # F7 for the coord set (same skip the per-group encoder applies)
        mnl, mnla, mxl, mxla = cfg.bounding_box
        two_z = F.shiftleft(F.lit(1).cast("long"), F.col("z"))
        t_minlon = F.col("x") / two_z * 360.0 - 180.0
        t_maxlon = (F.col("x") + 1) / two_z * 360.0 - 180.0

        def _tile_lat(y_expr):
            latp = F.lit(180.0) - y_expr / two_z * 360.0
            return F.degrees(F.atan(F.exp(F.radians(latp)))) * 2.0 - 90.0

        t_minlat = _tile_lat(F.col("y") + 1)
        t_maxlat = _tile_lat(F.col("y").cast("double"))
        coords = coords.where((F.lit(mxl) > t_minlon) & (F.lit(mnl) < t_maxlon)
                              & (F.lit(mxla) > t_minlat) & (F.lit(mnla) < t_maxlat))
    return (coords.join(tiles, ["z", "x", "y"], "left")
            .select("z", "x", "y",
                    F.coalesce(F.col("tile"), F.lit(empty_bytes)).alias("tile"),
                    F.coalesce(F.col("feature_count"), F.lit(0)).alias("feature_count"),
                    F.coalesce(F.col("geometry_hash"), F.lit(0).cast("long")).alias("geometry_hash"),
                    F.coalesce(F.col("raw_bytes"), F.lit(0)).alias("raw_bytes")))
