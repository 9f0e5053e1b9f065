"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so per the driver instruction
the same jobs run at two parallelism levels — local[N] and local[4N] —
on the same input; we report throughput at both plus
eff = (t_N / t_4N) / 4 per job.

Machine ceiling: this host's all-core turbo drop inflates per-task CPU
time ~1.64x between 1-core and 32-core load (measured by cpu_ceiling),
so even perfectly parallel work cannot exceed ~0.89 efficiency from
8 -> 32 processes. Report it alongside the job numbers.

Jobs (one warm SparkSession per level):
  pyramid   — flagship z0-z14 MVT pyramid over replicated documents
  minhash   — MinHash-LSH near-dup candidate pairs + Jaccard refine
  spjoin    — Morton-cell point-in-polygon join + kNN

Usage:
  python scripts/scaling_bench.py run <cpus> <mult>   # one level, one JSON line
  python scripts/scaling_bench.py [mult]              # both levels + summary
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

MULT_DEFAULT = 16
N_SMALL = 8
N_BIG = 32


def _burn(_):
    t0 = time.time()
    x = 0
    for i in range(20_000_000):
        x += i * i
    return time.time() - t0


def cpu_ceiling() -> dict:
    """Pure-CPU parallel throughput at 1/N_SMALL/N_BIG procs (measures
    the host's all-core frequency drop — the max achievable scaling).
    _burn is module-level so Pool can pickle it under any start method."""
    import multiprocessing as mp

    burn = _burn
    out = {}
    for procs in (1, N_SMALL, N_BIG):
        with mp.Pool(procs) as pool:
            t0 = time.time()
            pool.map(burn, range(procs))
            out[procs] = round(procs / (time.time() - t0), 2)  # tasks/sec
    ceil = (out[N_BIG] / out[N_SMALL]) / (N_BIG / N_SMALL)
    return {"throughput_tasks_per_sec": out, "max_efficiency": round(ceil, 3)}


def run_level(cpus: int, mult: int, jobs: str = "all") -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from tilemaker_spark.session import get_spark
    from tilemaker_spark import pipeline, spatial, textops, classify, geocode

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_reps = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "1")))
    spark = get_spark(app_name=f"scaling[{cpus}]", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # single-scan replication: explode a replica index instead of a
    # mult-way union (a 64-branch union plan costs seconds of
    # driver-side analysis per action — serial, input-proportional,
    # and purely a bench-harness artifact)
    docs = (base
            .select("*", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("_rep"))
            .select((F.col("doc_id").cast("long")
                     + F.col("_rep").cast("long") * 10_000_000).alias("doc_id"),
                    *[c for c in base.columns if c != "doc_id"]))
    docs = docs.repartition(cpus * 2).cache()
    n_docs = docs.count()

    res = {"cpus": cpus, "mult": mult, "docs": n_docs, "reps": n_reps}
    want = set(jobs.split(",")) if jobs != "all" else {"pyramid", "minhash", "spjoin"}

    def reps(fn):
        """min-of-N within ONE session: reps 2+ run with warm codegen
        caches and a live Python worker pool — the per-executor
        amortized steady state a long-running cluster job sits in."""
        vals = []
        for _ in range(n_reps):
            t0 = time.time()
            out = fn()
            vals.append(round(time.time() - t0, 2))
        return min(vals), vals, out

    if "pyramid" in want:
        def _pyr():
            tiles = pipeline.pyramid_df(spark, docs)
            return tiles.selectExpr("count(*) n", "sum(feature_count) f").collect()[0]
        res["pyramid_sec"], res["pyramid_reps"], agg = reps(_pyr)
        res["tiles"] = int(agg["n"])
        res["encoded_features"] = int(agg["f"])
        res["tiles_per_sec"] = round(agg["n"] / res["pyramid_sec"], 2)

    if "minhash" in want:
        res["minhash_sec"], res["minhash_reps"], n_pairs = reps(
            lambda: textops.minhash_lsh_pairs(docs).count())
        res["minhash_pairs"] = n_pairs

    if "spjoin" in want:
        def _spj():
            nodes, _, _ = geocode.geocode(docs)
            pts = classify.classify_nodes(nodes)
            n_join = spatial.point_in_polygon_join(pts, spatial.district_table(spark)).count()
            queries = pts.where(F.col("layer") == "poi").select("object_id", "lon", "latp")
            places = pts.where(F.col("layer") == "place").select(
                F.col("object_id").alias("place_id"), "lon", "latp")
            return n_join, spatial.knn_join(queries, places).count()
        res["spjoin_sec"], res["spjoin_reps"], (n_join, n_knn) = reps(_spj)
        res["join_rows"] = n_join
        res["knn_rows"] = n_knn
        res["join_rows_per_sec"] = round((n_join + n_knn) / res["spjoin_sec"], 1)

    print(json.dumps(res))
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "run":
        run_level(int(sys.argv[2]), int(sys.argv[3]),
                  sys.argv[4] if len(sys.argv) > 4 else "all")
        return
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else MULT_DEFAULT
    results = {}
    for cpus in (N_SMALL, N_BIG):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run", str(cpus), str(mult)],
            capture_output=True, text=True, timeout=7200)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line, flush=True)
    try:
        ceiling = cpu_ceiling()
    except Exception as e:
        ceiling = {"error": str(e)[:100]}
    summary = {"n_small": N_SMALL, "n_big": N_BIG, "mult": mult}
    for job in ("pyramid", "minhash", "spjoin"):
        ts = results[N_SMALL][f"{job}_sec"]
        tb = results[N_BIG][f"{job}_sec"]
        summary[f"{job}_eff"] = round((ts / tb) / (N_BIG / N_SMALL), 3)
        summary[f"{job}_wall"] = [ts, tb]
    summary["cpu_ceiling"] = ceiling
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
