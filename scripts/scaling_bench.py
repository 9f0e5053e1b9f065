"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

The sandbox has no real cluster, so per the driver instruction the
same job runs at two parallelism levels — local[N] and local[4N] —
on the same input; we report throughput at both plus the scaling
efficiency  eff = (t_N / t_4N) / 4.

The measured job is the flagship z0-z14 pyramid over a REPLICATED
documents table (doc_id-shifted copies — deterministic, compute-heavy
enough that parallel work dominates fixed JVM overhead). Timing starts
after the session and input are warm.

Usage:
  python scripts/scaling_bench.py run <cpus> <mult>   # one level, prints JSON
  python scripts/scaling_bench.py                     # both levels + summary
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

MULT_DEFAULT = 8
N_SMALL = 8
N_BIG = 32


def run_level(cpus: int, mult: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from tilemaker_spark.session import get_spark
    from tilemaker_spark import pipeline

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"scaling[{cpus}]", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = base.count()
    # deterministic replication: doc_id shifted per copy -> distinct features
    docs = base
    for i in range(1, mult):
        docs = docs.unionByName(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)))
    docs = docs.repartition(cpus * 2).cache()
    n_docs = docs.count()  # warm cache before timing

    t0 = time.time()
    tiles = pipeline.pyramid_df(spark, docs)
    agg = tiles.selectExpr("count(*) n", "sum(feature_count) feats").collect()[0]
    dt = time.time() - t0
    print(json.dumps({
        "cpus": cpus, "mult": mult, "docs": n_docs, "base_docs": n_base,
        "tiles": int(agg["n"]), "encoded_features": int(agg["feats"]),
        "wall_sec": round(dt, 2),
        "tiles_per_sec": round(agg["n"] / dt, 3),
        "features_per_sec": round(agg["feats"] / dt, 1),
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "run":
        run_level(int(sys.argv[2]), int(sys.argv[3]))
        return
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else MULT_DEFAULT
    results = {}
    for cpus in (N_SMALL, N_BIG):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run", str(cpus), str(mult)],
            capture_output=True, text=True, timeout=3600)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line, flush=True)
    t_small = results[N_SMALL]["wall_sec"]
    t_big = results[N_BIG]["wall_sec"]
    speedup = t_small / t_big
    eff = speedup / (N_BIG / N_SMALL)
    summary = {
        "n_small": N_SMALL, "n_big": N_BIG,
        "wall_small": t_small, "wall_big": t_big,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "throughput_small_feats_per_sec": results[N_SMALL]["features_per_sec"],
        "throughput_big_feats_per_sec": results[N_BIG]["features_per_sec"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
