"""SparkSession construction with scale-oriented defaults.

Tuned for the target execution model (SURVEY.md §4): AQE on (runtime
re-planning + skew-join splitting), Arrow-batched pandas UDFs, modest
broadcast threshold so small dims (config/ref layers) broadcast while
the big feature tables sort-merge.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tilemaker_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # at cluster scale this is sized to data volume; in local mode
        # 2x cores balances hash-partition skew (measured 3x row skew at
        # 1x) while AQE coalesces the small ones
        shuffle_partitions = max(int(cpus) * 2, 16)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size is a first-order throughput knob for the
        # streaming encoders: per-batch fixed cost measured ~0.4 s with
        # binary columns — 20k-row batches made a 9 s transfer take 89 s
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def python_stage_partitions(spark: SparkSession, multiplier: int = 8) -> int:
    """Partition count for Python-CPU-heavy (mapInPandas) stages.

    AQE's coalescing is BYTE-based and blind to per-row Python CPU cost,
    so a Python-heavy stage left at `spark.sql.shuffle.partitions`
    granularity floors the stage wall at its largest task no matter how
    many cores run it. Measured (scripts/profile_pyramid.py, 8 cores,
    x64 input, 16 shuffle partitions): the MVT encode stage coalesced to
    11 tasks with a 48.5 s max task inside a 139 s job — the "fixed
    cost" of the round-2 scaling fit was really this coarse-partition
    critical path, which grows with data and shrinks with nothing.

    Explicit fine hash partitioning (cores x multiplier, never below the
    session's shuffle partitions) bounds max-task at ~1/multiplier of a
    core's share, so adding executors keeps helping; AQE is deliberately
    bypassed (explicit numPartitions is not coalesced)."""
    par = spark.sparkContext.defaultParallelism
    try:
        base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        base = 200
    return max(par * multiplier, base)
