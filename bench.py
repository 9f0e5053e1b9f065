"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line.

Headline metric follows BASELINE.json: tiles/sec for the full z0-z14
MVT pyramid, plus spatial-join rows/sec, over the geocoded documents
table. Run with a different SPARK_GRAFT_CPUS to produce the two-
parallelism scaling evidence recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from tilemaker_spark.session import get_spark
    from tilemaker_spark import pipeline

    spark = get_spark(app_name=f"bench[{cpus}]", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm the scan/JVM outside the timed sections

    queries: dict = {}
    extras: dict = {}

    # ---- q_pyramid: full z0-z14 MVT pyramid (the flagship job)
    t0 = time.time()
    tiles = pipeline.pyramid_df(spark, docs)
    agg = tiles.selectExpr("count(*) AS n", "sum(feature_count) AS feats",
                           "sum(raw_bytes) AS rb").collect()[0]
    dt = time.time() - t0
    queries["q_pyramid"] = round(dt, 3)
    extras["tiles"] = int(agg["n"])
    extras["tiles_per_sec"] = round(agg["n"] / dt, 2)
    extras["encoded_features"] = int(agg["feats"])

    # ---- q_features: geocode -> classify -> assemble throughput
    t0 = time.time()
    nodes, ways, rels = pipeline.build_stores(spark, docs)
    features = pipeline.build_features(nodes, ways, rels)
    n_feat = features.count()
    dt = time.time() - t0
    queries["q_features"] = round(dt, 3)
    extras["features"] = n_feat
    extras["features_per_sec"] = round(n_feat / dt, 2)

    # ---- q_tile_assign: base-zoom cover join (feature x tile fan-out)
    from tilemaker_spark import tileassign
    t0 = time.time()
    assigned = tileassign.assign_base_tiles(features, 14)
    n_assigned = assigned.count()
    dt = time.time() - t0
    queries["q_tile_assign"] = round(dt, 3)
    extras["assigned_rows"] = n_assigned
    extras["assign_rows_per_sec"] = round(n_assigned / dt, 2)

    # ---- q_spatial_join: cell-index point-in-polygon join (north_rule)
    try:
        from tilemaker_spark import spatial
        t0 = time.time()
        joined = spatial.poi_district_join(spark, sf_dir)
        n_join = joined.count()
        dt = time.time() - t0
        queries["q_spatial_join"] = round(dt, 3)
        extras["join_rows"] = n_join
        extras["join_rows_per_sec"] = round(n_join / dt, 2)
    except ImportError:
        pass

    # ---- q_dedup: MinHash-LSH near-duplicate candidates over documents
    try:
        from tilemaker_spark import queries_text
        t0 = time.time()
        pairs = queries_text.q_minhash_lsh_pairs(spark, sf_dir)
        n_pairs = pairs.count()
        dt = time.time() - t0
        queries["q_dedup_minhash"] = round(dt, 3)
        extras["dedup_pairs"] = n_pairs
    except ImportError:
        pass

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "z0-z14 pyramid wall seconds (sum of headline queries)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": cpus,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
