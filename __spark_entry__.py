"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — the full z0-z14 MVT pyramid over the
sf0.001 documents table (geocode -> classify -> assemble -> tile
assign -> rollup -> per-tile MVT encode), returning the tiles table.

queries()/oracle_sql(): per-operator correctness pairs (SURVEY.md §2);
the Spark side runs the real engine code path, the SQL side re-derives
the answer in DuckDB from first principles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: z0-z14 MVT pyramid on /root/testdata/sf0.001."""
    from tilemaker_spark import pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tiles = pipeline.pyramid_df(spark, docs)
    # drop the raw tile bytes for a stable, comparable schema
    return tiles.select("z", "x", "y", "feature_count", "geometry_hash", "raw_bytes")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tilemaker_spark import queries_core

    q: dict = {}
    q.update(queries_core.QUERIES)
    try:
        from tilemaker_spark import queries_bytes
        q.update(queries_bytes.QUERIES)
    except ImportError:
        pass
    try:
        from tilemaker_spark import queries_text
        q.update(queries_text.QUERIES)
    except ImportError:
        pass
    try:
        from tilemaker_spark import queries_spatial
        q.update(queries_spatial.QUERIES)
    except ImportError:
        pass
    try:
        from tilemaker_spark import queries_media
        q.update(queries_media.QUERIES)
    except ImportError:
        pass
    return q


def oracle_sql() -> dict[str, str]:
    from tilemaker_spark import queries_core

    o: dict = {}
    o.update(queries_core.ORACLES)
    try:
        from tilemaker_spark import queries_bytes
        o.update(queries_bytes.ORACLES)
    except ImportError:
        pass
    try:
        from tilemaker_spark import queries_text
        o.update(queries_text.ORACLES)
    except ImportError:
        pass
    try:
        from tilemaker_spark import queries_spatial
        o.update(queries_spatial.ORACLES)
    except ImportError:
        pass
    try:
        from tilemaker_spark import queries_media
        o.update(queries_media.ORACLES)
    except ImportError:
        pass
    return o
