"""Spatial join + kNN + raster<->vector (J4 family, north_rule).

The reference answers Intersects()/FindIntersecting() with a per-layer
boost R-tree + exact refine (src/shp_mem_tiles.cpp:26-57). At 10^12
rows an in-process tree is impossible, so the engine uses the
cell-index equi-join pattern (BASELINE.json north_rule):

  1. encode points to Morton (z-order) cells at CELL_ZOOM — pure
     Catalyst bit math (JVM, whole-stage codegen);
  2. cover each polygon with cells — batched numpy in an
     Arrow-vectorized pandas UDF, plus STRtree-style sorted Morton
     ranges for index compactness;
  3. equi-join points to polygon cover cells (broadcast when the
     polygon side is small, shuffle hash join otherwise);
  4. refine with prepared vectorized ray-casting (numpy, one batch per
     Arrow page — no per-row Python).

kNN is exact: cell-ring candidate expansion (5x5 window equi-join) +
a provable safe-radius test; queries whose k-th candidate cannot be
certified inside the window fall back to a broadcast brute-force pass,
so results equal true kNN always (the DuckDB oracle is plain
brute-force SQL).

Reference layer: deterministic "district" diamonds over the geocode
bbox — |dx|*r + |dy|*r compares stay in exact int64, so the oracle is
closed-form integer SQL while the Spark side exercises the general
ray-cast kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import classify, geocode
from .kernels import geomops

CELL_ZOOM = 16          # join-cell resolution (point-in-polygon)
KNN_CELL_ZOOM = 13      # coarser cells for kNN ring expansion
KNN_K = 3
KNN_RING = 2            # 5x5 window

# district grid (fixed-point 1e7 coords, inside the geocoder bbox)
DIST_X0 = 94750000
DIST_Y0 = 534700000
DIST_PITCH = 400000
DIST_NX = 4
DIST_NY = 8
DIST_R = 173333         # not a multiple of 1000 -> no grid point on edges


# ------------------------------------------------------------- cell codes

def morton_interleave_np(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized Morton code (x even bits, y odd bits)."""
    out = np.zeros(len(x), dtype=np.int64)
    x = x.astype(np.int64)
    y = y.astype(np.int64)
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def morton_expr(x: Column, y: Column, bits: int) -> Column:
    """Morton interleave of two (small, already-named) integer columns."""
    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = (acc
               + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
               + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1))
    return acc


def with_point_cell(df: DataFrame, lon_col: str = "lon", latp_col: str = "latp",
                    zoom: int = CELL_ZOOM, out: str = "cell") -> DataFrame:
    """Add a Morton cell column — staged projections so the tile floor
    expression is computed ONCE per axis, not inlined into all 2*zoom
    bit terms (inlining blows the codegen tree up to ~30 s of janino
    compile per plan)."""
    from .tileassign import point_tile_expr

    x, y = point_tile_expr(F.col(lon_col), F.col(latp_col), zoom)
    staged = df.withColumn("_cx", x).withColumn("_cy", y)
    return (staged.withColumn(out, morton_expr(F.col("_cx"), F.col("_cy"), zoom))
                  .drop("_cx", "_cy"))


def point_cell_expr(lon_col: Column, latp_col: Column, zoom: int = CELL_ZOOM) -> Column:
    """Single-Column Morton cell (compact inputs only — prefer
    with_point_cell for plans that survive codegen audits)."""
    from .tileassign import point_tile_expr

    x, y = point_tile_expr(lon_col, latp_col, zoom)
    return morton_expr(x, y, zoom)


def sql_point_cell(lon_expr: str, latp_expr: str, zoom: int = CELL_ZOOM) -> str:
    """The same Morton expression as DuckDB SQL (oracle side)."""
    x = (f"CAST(floor((CAST({lon_expr} AS DOUBLE)/10000000.0 + 180.0)"
         f" * (1.0/360.0) * {float(1 << zoom)}) AS BIGINT)")
    y = (f"CAST(floor((180.0 - CAST({latp_expr} AS DOUBLE)/10000000.0)"
         f" * (1.0/360.0) * {float(1 << zoom)}) AS BIGINT)")
    terms = []
    for b in range(zoom):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def cells_to_ranges(cells: np.ndarray):
    """Sorted Morton cells -> [(start, end)] inclusive ranges
    (the STRtree-style compressed index the north_star names)."""
    if len(cells) == 0:
        return []
    cells = np.unique(cells)
    breaks = np.nonzero(np.diff(cells) != 1)[0]
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [len(cells) - 1]])
    return [(int(cells[s]), int(cells[e])) for s, e in zip(starts, ends)]


# ---------------------------------------------------------- district layer

def district_table(spark: SparkSession) -> DataFrame:
    """Deterministic diamond reference polygons (the shapefile-layer
    stand-in, cf. S8 src/read_shp.cpp:101-249), replicated across the
    geocoder's 8x8 region blocks — 2048 polygons, still tiny enough to
    broadcast.

    Sliced to 8 partitions explicitly: the default createDataFrame
    slicing (= defaultParallelism, 32 here) gives a locally-built
    ExistingRDD whose per-slice scan overhead (~130 ms each) dwarfs
    the data — measured 4.5 s to scan under coalesce(1), 0.6 s at 8
    parallel slices. Driver-local reference layers want few, fat
    slices."""
    rows = []
    for region in range(64):
        rx = (region % 8) * 2000000
        ry = (region // 8) * 2000000
        for gx in range(DIST_NX):
            for gy in range(DIST_NY):
                cx = DIST_X0 + rx + gx * DIST_PITCH
                cy = DIST_Y0 + ry + gy * DIST_PITCH
                ring_lon = [cx + DIST_R, cx, cx - DIST_R, cx, cx + DIST_R]
                ring_latp = [cy, cy + DIST_R, cy, cy - DIST_R, cy]
                rows.append((region * 1000 + gx * 100 + gy, cx, cy, ring_lon, ring_latp))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 8),
        "district_id INT, cx INT, cy INT, ring_lon ARRAY<INT>, ring_latp ARRAY<INT>")


def district_cover_cells(districts: DataFrame, zoom: int = CELL_ZOOM,
                         compact: bool = False) -> DataFrame:
    """Polygon -> covering Morton cells, batched numpy in an
    Arrow-vectorized pandas UDF (tilecover DDA walk + scanline fill,
    then Morton interleave).

    ``compact=False`` (small broadcastable layers): cells emitted
    directly at the input's own parallelism.

    ``compact=True`` (large layers): the UDF emits sorted Morton RANGES
    (cells_to_ranges — the STRtree-style compressed index) at the
    input's own parallelism, and Catalyst re-expands them JVM-side with
    sequence(); the Python->JVM Arrow transfer carries O(ranges) rows
    instead of O(cells), and no coalesce(1) bottleneck exists."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    from .kernels import tilecover

    def _cells(lons, latps):
        lo = np.asarray(lons, dtype=np.float64) / 1e7
        la = np.asarray(latps, dtype=np.float64) / 1e7
        # bbox cover: a conservative SUPERSET of intersected cells —
        # required for join correctness (the refine step discards
        # non-matching candidates; a tighter cover that missed a
        # corner cell would silently drop join rows). The tighter
        # DDA+scanline cover (tilecover.polygon_cover_tiles) is
        # reserved for tile ASSIGNMENT where reference parity — not
        # supersetness — is the contract.
        tids = tilecover.bbox_cover_tiles(lo.min(), la.min(), lo.max(), la.max(), zoom)
        xs = tids >> 32
        ys = tids & 0xFFFFFFFF
        return morton_interleave_np(xs, ys, zoom)

    if compact:
        @pandas_udf(ArrayType(ArrayType(LongType())))
        def cover_ranges(ring_lon, ring_latp):
            return pd.Series([
                [[s, e] for s, e in cells_to_ranges(_cells(lons, latps))]
                for lons, latps in zip(ring_lon, ring_latp)])

        return (districts
                .withColumn("rng", F.explode(cover_ranges(F.col("ring_lon"),
                                                          F.col("ring_latp"))))
                .withColumn("cell", F.explode(F.sequence(F.element_at("rng", 1),
                                                         F.element_at("rng", 2))))
                .select("district_id", "cell", "ring_lon", "ring_latp"))

    @pandas_udf(ArrayType(LongType()))
    def cover(ring_lon, ring_latp):
        return pd.Series([_cells(lons, latps).tolist()
                          for lons, latps in zip(ring_lon, ring_latp)])

    # run at the input's own parallelism: a coalesce(1) here SERIALIZES
    # the parent slices' fixed scan overhead into one task (measured
    # 4.5 s for a 32-slice local table vs 0.6 s left parallel), and the
    # broadcast that follows doesn't care how many partitions feed it
    return (districts
            .withColumn("cell", F.explode(cover(F.col("ring_lon"), F.col("ring_latp"))))
            .select("district_id", "cell", "ring_lon", "ring_latp"))


# ------------------------------------------------------ point-in-polygon

def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nodes, _, _ = geocode.geocode(docs)
    return classify.classify_nodes(nodes)


def point_in_polygon_join(points: DataFrame, districts: DataFrame,
                          broadcast_ok: bool = True) -> DataFrame:
    """J4: cell equi-join + vectorized ray-cast refine.

    points must carry (object_id, layer, lon, latp). Two physical paths
    for the same logical join, chosen by ``broadcast_ok`` (the caller
    knows its reference layer; the reference's R-tree handles any
    in-RAM layer, src/shp_mem_tiles.cpp:26-89):

    - True (small reference layer, the common case): polygon cover is
      broadcast; at 10^12 points the plan is scan -> codegen cell expr
      -> broadcast hash join -> Arrow refine — no shuffle of the point
      table at all.
    - False (layer too large to broadcast — planetary water polygons):
      the SAME equi-join runs as a SHUFFLE_HASH join on cell. The
      polygon index is computed at input parallelism and shipped
      Python->JVM as compressed sorted Morton ranges (cells_to_ranges),
      re-expanded by Catalyst sequence() — never collected driver-side,
      never broadcast. Both sides shuffle once on cell; the refine is
      unchanged."""
    if broadcast_ok:
        cover = district_cover_cells(districts)
    else:
        cover = district_cover_cells(districts, compact=True)
    pts = with_point_cell(points)
    if broadcast_ok:
        cand = pts.join(F.broadcast(cover), "cell")
    else:
        cand = pts.join(cover.hint("shuffle_hash"), "cell")

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def inside(district_id, lon, latp, ring_lon, ring_latp):
        # one numpy ray-cast batch per Arrow page, grouped by polygon id
        # so each ring is "prepared" (converted to numpy) exactly once
        out = np.zeros(len(lon), dtype=bool)
        lon_v = lon.to_numpy(dtype=np.float64)
        latp_v = latp.to_numpy(dtype=np.float64)
        did = district_id.to_numpy()
        for d in np.unique(did):
            ii = np.nonzero(did == d)[0]
            rx = np.asarray(ring_lon.iloc[ii[0]], dtype=np.float64)
            ry = np.asarray(ring_latp.iloc[ii[0]], dtype=np.float64)
            out[ii] = geomops.points_in_ring(lon_v[ii], latp_v[ii], rx, ry)
        return pd.Series(out)

    return (cand
            .where(inside(F.col("district_id"), F.col("lon"), F.col("latp"),
                          F.col("ring_lon"), F.col("ring_latp")))
            .select("object_id", "layer", "district_id"))


def poi_district_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline spatial join: every classified point vs districts."""
    return point_in_polygon_join(_points(spark, sf_dir), district_table(spark))


def way_query_points(way_feats: DataFrame, way_coords: DataFrame) -> DataFrame:
    """Spatial-query locations for WAY features (F5 x J4 way arm).

    The reference sets (lon1, latp1)/(lon2, latp2) from the way's FIRST
    and LAST nodes (src/osm_lua_processing.cpp:400-401) and refines
    Intersects()/FindIntersecting() by testing exactly those two points
    against each candidate reference geometry
    (src/shp_mem_tiles.cpp:49-57) — so way-Intersects == "polygon
    contains first node OR last node". Emits up to two (object_id,
    layer, lon, latp) query rows per way feature, ready for the same
    broadcast cell-join the node path uses."""
    ends = way_coords.select(
        F.col("way_id").alias("object_id"),
        F.explode(F.array(
            F.struct(F.element_at("lons", 1).alias("lon"),
                     F.element_at("latps", 1).alias("latp")),
            F.struct(F.element_at("lons", -1).alias("lon"),
                     F.element_at("latps", -1).alias("latp")))).alias("p"),
    ).select("object_id", "p.lon", "p.latp")
    return way_feats.select("object_id", "layer").join(ends, "object_id")


def with_district_attrs(features: DataFrame, districts: DataFrame,
                        str_attrs: dict | None = None,
                        num_attrs: dict | None = None,
                        bool_attrs: dict | None = None,
                        query_points: DataFrame | None = None) -> DataFrame:
    """F5 x J4: Intersects()/FindIntersecting() DURING classification
    (reference: Lua way/node functions query the shapefile layer
    mid-classify, src/osm_lua_processing.cpp:112-130,
    src/shp_mem_tiles.cpp:26-57; CONFIGURATION.md:175-199).

    The classification rule's attribute table gains reference-layer
    columns via the same broadcast cell-join + refine — the point table
    is never shuffled, so a rule can consume spatial membership at
    10^12 rows.

    ``str_attrs``/``num_attrs``/``bool_attrs`` are the
    ``attribute_function`` remap hook (S8, src/read_shp.cpp:40-77):
    dicts of attr name -> Column over the matched reference-layer row's
    SOURCE COLUMNS (district_id, cx, cy, ...), typed like the
    reference's string/double/bool Tile_Value arms. Defaults emit
    'district' (string) and 'district_id' (numeric).

    ``query_points`` overrides the spatial-query locations: a DataFrame
    of (object_id, layer, lon, latp) rows, possibly several per
    feature — pass ``way_query_points(...)`` for way features (whose
    lon/latp columns are null; the reference queries their first/last
    node instead). Defaults to ``features`` itself (node semantics)."""
    if str_attrs is None:
        str_attrs = {"district": F.concat(F.lit("d"), F.col("district_id").cast("string"))}
    if num_attrs is None:
        num_attrs = {"district_id": F.col("district_id").cast("double")}
    bool_attrs = bool_attrs or {}
    pts = query_points if query_points is not None else features
    hits = (point_in_polygon_join(pts, districts)
            .groupBy("object_id", "layer")
            .agg(F.min("district_id").alias("_did")))   # deterministic pick
    # attach the reference layer's source columns for the remap exprs
    # (tiny dim table -> broadcast)
    src_cols = districts.drop("ring_lon", "ring_latp")
    hits = hits.join(F.broadcast(src_cols),
                     hits["_did"] == src_cols["district_id"], "left").drop("_did")
    joined = features.join(hits, ["object_id", "layer"], "left")
    in_d = F.col("district_id").isNotNull()

    def _mk(attrs, cast_t):
        return F.map_from_arrays(
            F.array(*[F.lit(n) for n in attrs]),
            F.array(*[attrs[n].cast(cast_t) for n in attrs]))

    out = joined
    if str_attrs:
        out = out.withColumn("attrs", F.when(
            in_d, F.map_concat(F.col("attrs"), _mk(str_attrs, "string"))
            ).otherwise(F.col("attrs")))
    if num_attrs:
        out = out.withColumn("attrs_num", F.when(
            in_d, F.map_concat(F.col("attrs_num"), _mk(num_attrs, "double"))
            ).otherwise(F.col("attrs_num")))
    if bool_attrs:
        out = out.withColumn("attrs_bool", F.when(
            in_d, F.map_concat(F.col("attrs_bool"), _mk(bool_attrs, "boolean"))
            ).otherwise(F.col("attrs_bool")))
    return out.drop(*[c for c in src_cols.columns])


# ----------------------------------------------------------------- kNN

def knn_join(queries: DataFrame, places: DataFrame, k: int = KNN_K,
             cell_zoom: int = KNN_CELL_ZOOM, ring: int = KNN_RING) -> DataFrame:
    """Exact kNN via cell-ring expansion with certified fallback.

    queries/places: (id-col, lon, latp) with id cols 'object_id' /
    'place_id'. Phase 1 joins each query's (2*ring+1)^2 cell window to
    the bucketed places (equi-join on cell — the scale path). A query's
    top-k is certified exact when its k-th candidate distance is inside
    the provable safe radius (ring cells minus one, in fixed units);
    uncertified queries re-run against a broadcast brute-force pass.
    Distances are exact int64 (squared fixed-point)."""
    from pyspark.sql.window import Window
    from .tileassign import point_tile_expr

    qx, qy = point_tile_expr(F.col("lon"), F.col("latp"), cell_zoom)
    px, py = point_tile_expr(F.col("lon"), F.col("latp"), cell_zoom)

    # p and q are each consumed by several join branches below; without
    # materialization every branch re-executes the caller's upstream
    # subtree (e.g. geocode+classify in poi_knn) from scratch
    p = places.select("place_id", F.col("lon").alias("p_lon"), F.col("latp").alias("p_latp"),
                      (px * F.lit(1 << cell_zoom) + py).alias("cell")).localCheckpoint()
    offs = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]
    q = queries.select("object_id", "lon", "latp",
                       qx.alias("qx"), qy.alias("qy")).localCheckpoint()
    q_cells = q.select(
        "object_id", "lon", "latp",
        F.explode(F.array(*[
            (F.col("qx") + dx) * F.lit(1 << cell_zoom) + (F.col("qy") + dy)
            for dx, dy in offs])).alias("cell"))

    dist2 = ((F.col("lon").cast("long") - F.col("p_lon").cast("long"))
             * (F.col("lon").cast("long") - F.col("p_lon").cast("long"))
             + (F.col("latp").cast("long") - F.col("p_latp").cast("long"))
             * (F.col("latp").cast("long") - F.col("p_latp").cast("long")))

    cand = (q_cells.join(p, "cell")
            .select("object_id", "place_id", dist2.alias("dist2")))
    w = Window.partitionBy("object_id").orderBy("dist2", "place_id")
    # ranked feeds THREE consumers (good, the certify stats, the anti
    # join) — materialize it or Catalyst re-executes the window+join
    # subtree per consumer (the round-1 minhash lesson; measured 100+ s
    # of a 25 s job re-run). On a cluster this is the natural
    # stage-checkpoint boundary.
    ranked = (cand.withColumn("rank", F.row_number().over(w))
              .where(F.col("rank") <= k).localCheckpoint())

    # certification: k-th distance must fit inside (ring-?) cells in BOTH
    # axes; conservative fixed-unit cell sizes (floor - 1)
    w_lon = int(360e7 / (1 << cell_zoom)) - 1
    w_latp = w_lon  # same projected-degree scale on both axes
    safe = (ring - 0) * min(w_lon, w_latp)
    safe2 = (safe - 1) * (safe - 1)
    stats = ranked.groupBy("object_id").agg(
        F.count(F.lit(1)).alias("n_cand"), F.max("dist2").alias("kth_dist2"))
    certified = stats.where((F.col("n_cand") >= k)
                            & (F.col("kth_dist2") <= F.lit(safe2))).localCheckpoint()
    good = ranked.join(certified.select("object_id"), "object_id", "left_semi")

    # fallback stage 1: WIDER ring window for uncertified queries — same
    # bounded equi-join shape, never a whole-table broadcast. At sane
    # densities this certifies (ring*8 covers ~any local sparsity hole).
    uncert = (q.join(certified.select("object_id"), "object_id", "left_anti")
              .localCheckpoint())
    wide = ring * 8
    # two sequence explodes keep the codegen tree small (a 33x33 literal
    # array of cell expressions measurably blows janino compile time)
    u_cells = (uncert
               .select("object_id", "lon", "latp", "qx", "qy",
                       F.explode(F.sequence(F.lit(-wide), F.lit(wide))).alias("ddx"))
               .select("object_id", "lon", "latp", "qx", "qy", "ddx",
                       F.explode(F.sequence(F.lit(-wide), F.lit(wide))).alias("ddy"))
               .select("object_id", "lon", "latp",
                       ((F.col("qx") + F.col("ddx")) * F.lit(1 << cell_zoom)
                        + (F.col("qy") + F.col("ddy"))).alias("cell")))
    cand_w = (u_cells.join(p, "cell")
              .select("object_id", "place_id", dist2.alias("dist2")))
    ranked_w = (cand_w.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k).localCheckpoint())
    safe_w = wide * min(w_lon, w_latp)
    safe2_w = (safe_w - 1) * (safe_w - 1)
    stats_w = ranked_w.groupBy("object_id").agg(
        F.count(F.lit(1)).alias("n_cand"), F.max("dist2").alias("kth_dist2"))
    cert_w = stats_w.where((F.col("n_cand") >= k)
                           & (F.col("kth_dist2") <= F.lit(safe2_w))).localCheckpoint()
    good_w = ranked_w.join(cert_w.select("object_id"), "object_id", "left_semi")

    # fallback stage 2: exact brute force for the residue. The RESIDUAL
    # QUERY side (provably tiny: only queries whose ring*8 window holds
    # < k places) is broadcast; the places table is streamed past it —
    # never collected, never broadcast (the round-1 version broadcast
    # all of places, an unbounded driver-side cost at 10^12 rows).
    residue = (uncert.join(cert_w.select("object_id"), "object_id", "left_anti")
               .select("object_id", "lon", "latp"))
    brute = (F.broadcast(residue).crossJoin(p.drop("cell"))
             .select("object_id", "place_id", dist2.alias("dist2")))
    brute_ranked = brute.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)

    return (good.unionByName(good_w).unionByName(brute_ranked)
            .select("object_id", "place_id", "dist2", "rank"))


def poi_knn(spark: SparkSession, sf_dir: str, k: int = KNN_K) -> DataFrame:
    """kNN headline: each poi point's k nearest 'place' points."""
    pts = _points(spark, sf_dir)
    queries = pts.where(F.col("layer") == "poi").select("object_id", "lon", "latp")
    places = pts.where(F.col("layer") == "place").select(
        F.col("object_id").alias("place_id"), "lon", "latp")
    return knn_join(queries, places, k)


# ----------------------------------------------------- raster <-> vector

RASTER_ZOOM = 12
RASTER_BINS = 16        # 16x16 bins per tile


def rasterize_points(points: DataFrame, zoom: int = RASTER_ZOOM,
                     bins: int = RASTER_BINS) -> DataFrame:
    """Vector -> raster: bin points into per-tile pixel-grid counts
    (pure groupBy — the relational rasterizer)."""
    from .tileassign import point_tile_expr

    fx, fy = point_tile_expr(F.col("lon"), F.col("latp"), zoom)
    bx, by = point_tile_expr(F.col("lon"), F.col("latp"), zoom + 4)  # 16 = 2^4 bins
    return (points
            .select(fx.alias("x"), fy.alias("y"),
                    (bx % bins).alias("px"), (by % bins).alias("py"))
            .groupBy("x", "y", "px", "py")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("z", F.lit(zoom)))


# vectorize demo runs at a coarser zoom than the rasterize demo: at z12
# the synthetic density never reaches threshold 2 (the round-1 oracle
# passed on 0 = 0, verifying nothing) — z8 bins aggregate enough points
# for a populated result at every test SF
VECTORIZE_ZOOM = 8


def vectorize_raster(raster: DataFrame, threshold: int = 2,
                     zoom: int = RASTER_ZOOM, bins: int = RASTER_BINS) -> DataFrame:
    """Raster -> vector: cells >= threshold emitted as bbox polygons
    (lon/latp double bounds) — closed-form column math."""
    gx = F.col("x") * bins + F.col("px")
    gy = F.col("y") * bins + F.col("py")
    scale = F.lit(360.0 / float((1 << zoom) * bins))
    return (raster.where(F.col("n") >= threshold)
            .select("z", "x", "y", "px", "py", "n",
                    (gx * scale - 180.0).alias("min_lon"),
                    ((gx + 1) * scale - 180.0).alias("max_lon"),
                    (F.lit(180.0) - (gy + 1) * scale).alias("min_latp"),
                    (F.lit(180.0) - gy * scale).alias("max_latp")))
