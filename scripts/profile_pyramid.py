"""Stage-level decomposition of the pyramid job via Spark event logs.

BENCH round 2 fit the scaling gap as an N-independent "fixed cost", but
the fitted constant grew with input (~40 s at x16 -> ~106 s at x64),
which means part of it is SERIAL WORK THAT GROWS WITH DATA, not Spark
overhead. This probe runs pyramid_df with the event log enabled and
reports, per stage: wall (completion - submission), the sum of task run
times (parallelizable work), the max task time (the stage's critical
path — a stage cannot finish faster than its slowest task no matter how
many cores), and task count. A stage whose max-task ~= wall at high N
is the scaling bottleneck.

Usage: python scripts/profile_pyramid.py <cpus> <mult> [reps]
Prints one JSON line: per-run walls + per-stage table for the LAST
(warm) run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def _eventlog_lines(path: str):
    """Yield lines from a v1 single-file log or a v2 rolling dir."""
    def _open(fp):
        if fp.endswith(".zstd"):
            import zstandard
            fh = open(fp, "rb")
            return zstandard.ZstdDecompressor().stream_reader(fh)
        return open(fp, "rb")

    import io

    if os.path.isdir(path):
        parts = sorted(p for p in os.listdir(path) if p.startswith("events_"))
        for p in parts:
            with io.TextIOWrapper(_open(os.path.join(path, p))) as f:
                yield from f
    else:
        with io.TextIOWrapper(_open(path)) as f:
            yield from f


def parse_eventlog(path: str):
    """Event log -> list of stage dicts with wall / task-sum / max-task."""
    stages = {}
    tasks = {}
    if True:
        for line in _eventlog_lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[sid] = {
                    "stage": sid,
                    "name": si.get("Stage Name", "")[:60],
                    "wall_s": round((comp - sub) / 1000.0, 2) if sub and comp else None,
                    "sub_ms": sub,
                    "tasks": si.get("Number of Tasks"),
                }
            elif et == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                tm = ev.get("Task Metrics") or {}
                run = tm.get("Executor Run Time", 0)
                d = tasks.setdefault(sid, {"sum_ms": 0, "max_ms": 0, "n": 0,
                                           "py_ms": 0})
                d["sum_ms"] += run
                d["max_ms"] = max(d["max_ms"], run)
                d["n"] += 1
    out = []
    for sid, s in sorted(stages.items()):
        t = tasks.get(sid, {})
        s["task_sum_s"] = round(t.get("sum_ms", 0) / 1000.0, 2)
        s["max_task_s"] = round(t.get("max_ms", 0) / 1000.0, 2)
        out.append(s)
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    if n_reps < 1:
        sys.exit("n_reps must be >= 1")

    evdir = "/tmp/spark-events"
    os.makedirs(evdir, exist_ok=True)
    for f in os.listdir(evdir):
        p = os.path.join(evdir, f)
        # a prior run may have left a v2 rolling event-log DIRECTORY
        # here; tolerate concurrent cleanup / permission surprises — a
        # leftover foreign file must not abort the profile run
        try:
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        except OSError as e:
            print(f"# warn: could not clear {p}: {e}", file=sys.stderr)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("pyramid-profile")
             .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
             .config("spark.driver.memory", "24g")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", evdir)
             .config("spark.eventLog.rolling.enabled", "false")
             .config("spark.eventLog.compress", "false")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from tilemaker_spark import pipeline

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = (base
            .select("*", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("_rep"))
            .select((F.col("doc_id").cast("long") + F.col("_rep").cast("long") * 10_000_000)
                    .alias("doc_id"),
                    *[c for c in base.columns if c != "doc_id"]))
    docs = docs.repartition(cpus * 2).cache()
    docs.count()

    walls = []
    marks = []          # wall-clock boundaries of each rep, epoch ms
    for _ in range(n_reps):
        t0 = time.time()
        tiles = pipeline.pyramid_df(spark, docs)
        agg = tiles.selectExpr("count(*) n", "sum(feature_count) f").collect()[0]
        walls.append(round(time.time() - t0, 2))
        marks.append((int(t0 * 1000), int(time.time() * 1000)))

    app_id = spark.sparkContext.applicationId
    spark.stop()

    ev_path = os.path.join(evdir, app_id)
    if not os.path.exists(ev_path):
        ev_path = os.path.join(evdir, f"eventlog_v2_{app_id}")
    all_stages = parse_eventlog(ev_path)
    # keep only stages of the LAST (warm) rep, by submission-time window
    lo, hi = marks[-1]
    warm_stages = [s for s in all_stages
                   if s["sub_ms"] and lo <= s["sub_ms"] <= hi]
    for s in warm_stages:
        s.pop("sub_ms", None)
    total_wall = sum(s["wall_s"] or 0 for s in warm_stages)
    total_task = sum(s["task_sum_s"] for s in warm_stages)
    crit = sum(s["max_task_s"] for s in warm_stages)
    print(json.dumps({
        "cpus": cpus, "mult": mult,
        "walls": walls, "tiles": int(agg["n"]), "features": int(agg["f"]),
        "warm_stage_wall_sum_s": round(total_wall, 1),
        "warm_task_sum_s": round(total_task, 1),
        "warm_critical_path_s": round(crit, 1),
        "sched_gap_s": round(walls[-1] - total_wall, 1),
        "stages": warm_stages,
    }))


if __name__ == "__main__":
    main()
