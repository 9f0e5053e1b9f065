"""Structured Streaming ingest: a growing web-crawl table -> feature
stream (incremental geocode/classify), checkpointed and resumable.

The reference is strictly batch (one .osm.pbf in, one .mbtiles out).
At crawl scale the documents table GROWS — this module re-expresses
the geocode -> classify front half of the pipeline as an incremental
Structured Streaming job:

  spark.readStream(documents dir)          file source, exactly-once
    -> geocode (pure narrow column exprs — streaming-safe by design)
    -> classify (CASE/WHEN + explode — narrow, streaming-safe)
    -> writeStream.trigger(availableNow).start(features dir)

Because every geocode/classify expression is stateless and narrow
(SURVEY.md §0.1), the streaming plan is identical to the batch plan —
no watermarks or state stores needed until the join/rollup stages,
which run as periodic batch jobs over the accumulated features table
(the Iceberg-style incremental-batch pattern). Checkpointing gives
exactly-once file processing: a restarted stream skips every already-
committed input file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import classify, geocode

# the documents parquet schema (TESTDATA.md) — file streams need an
# explicit schema (no inference at stream start)
DOCUMENTS_SCHEMA = ("doc_id long, url string, warc_ts timestamp, "
                    "html binary, text string, lang string")


def stream_documents(spark: SparkSession, path: str,
                     schema: str = DOCUMENTS_SCHEMA,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a growing documents directory."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def stream_point_features(docs: DataFrame) -> DataFrame:
    """documents stream -> classified point-feature stream.

    Point features are fully derivable per-document (nodes never span
    documents in the geocode rule), so this is the maximal stateless
    streaming prefix. Way/relation assembly needs cross-row joins and
    runs as incremental batch over the accumulated store."""
    nodes, _, _ = geocode.geocode(docs)
    return classify.classify_nodes(nodes)


def stream_stores(docs: DataFrame):
    """documents stream -> (nodes, ways, relations) streams — the raw
    geocoded stores, each independently sinkable to its parquet dir."""
    return geocode.geocode(docs)


def write_stream(df: DataFrame, out_path: str, checkpoint_path: str,
                 await_termination: bool = True):
    """Append ``df`` (a streaming frame) to ``out_path`` with
    exactly-once checkpointing; availableNow trigger processes all
    currently-available input then stops (the incremental-batch
    pattern — each invocation is one resumable catch-up pass)."""
    q = (df.writeStream
         .format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint_path)
         .trigger(availableNow=True)
         .outputMode("append")
         .start())
    if await_termination:
        q.awaitTermination()
    return q
