"""Decompose the N-independent fixed cost of the pyramid job.

BASELINE.md's scaling target is throughput efficiency >=0.8 from N to
4N; BENCH round 2 measured ~40-106 s of N-independent wall per run and
attributed it (by fit, not measurement) to whole-stage-codegen janino
compilation, Python worker pool startup, and plan analysis. This probe
measures the components directly at one parallelism level:

  cold           first run in a fresh JVM (codegen compile + worker pool
                 spawn + JIT all included)
  cold_nocodegen first run with spark.sql.codegen.wholeStage=false in a
                 fresh JVM (no janino whole-stage classes to compile)
  warm           min of later runs in the same session (codegen cache
                 hit, workers alive — the steady state of a long job)

cold - warm      = total amortizable fixed cost
cold - cold_nocodegen (compared across fresh JVMs) isolates the
                 whole-stage-compile share.

Usage: python scripts/fixed_cost_probe.py <cpus> <mult> [nocodegen]
Prints one JSON line per run; drive it twice (with/without nocodegen)
from a wrapper to get both cold variants.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    nocodegen = len(sys.argv) > 3 and sys.argv[3] == "nocodegen"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = (SparkSession.builder.master(f"local[{cpus}]")
         .appName("fixed-cost-probe")
         .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false"))
    if nocodegen:
        b = b.config("spark.sql.codegen.wholeStage", "false")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from tilemaker_spark import pipeline

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = (base
            .select("*", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("_rep"))
            .select((F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
                    *[c for c in base.columns if c != "doc_id"]))
    docs = docs.repartition(cpus * 2).cache()
    docs.count()

    walls = []
    for _ in range(3):
        t0 = time.time()
        tiles = pipeline.pyramid_df(spark, docs)
        tiles.selectExpr("count(*) n").collect()
        walls.append(round(time.time() - t0, 2))
    print(json.dumps({"cpus": cpus, "mult": mult, "nocodegen": nocodegen,
                      "cold": walls[0], "warm": min(walls[1:]),
                      "reps": walls}))
    spark.stop()


if __name__ == "__main__":
    main()
