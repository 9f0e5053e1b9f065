"""Structured Streaming ingest: incremental geocode/classify with
exactly-once file checkpointing (tilemaker_spark/streaming.py)."""

import os
import shutil

from pyspark.sql import functions as F

from conftest import SF_DIR


def _write_chunk(spark, src, lo, hi, out_dir, name):
    (src.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .coalesce(1).write.mode("overwrite")
        .parquet(os.path.join(out_dir, name)))
    # move part files up so the stream dir is a flat file source
    part_dir = os.path.join(out_dir, name)
    for f in os.listdir(part_dir):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(part_dir, f),
                        os.path.join(out_dir, f"{name}.parquet"))
    shutil.rmtree(part_dir)


def test_incremental_feature_stream(spark, tmp_path):
    from tilemaker_spark import streaming, classify, geocode

    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "feats_out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    # batch oracle for the same rows
    def batch_count(hi):
        docs = src.where(F.col("doc_id") < hi)
        nodes, _, _ = geocode.geocode(docs)
        return classify.classify_nodes(nodes).count()

    # ---- chunk 1 arrives
    _write_chunk(spark, src, 0, 200, in_dir, "chunk1")
    feats = streaming.stream_point_features(
        streaming.stream_documents(spark, in_dir))
    assert feats.isStreaming
    streaming.write_stream(feats, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == batch_count(200)

    # ---- chunk 2 arrives; resumed stream processes ONLY the new file
    _write_chunk(spark, src, 200, 500, in_dir, "chunk2")
    feats2 = streaming.stream_point_features(
        streaming.stream_documents(spark, in_dir))
    streaming.write_stream(feats2, out_dir, ckpt)
    n2 = spark.read.parquet(out_dir).count()
    assert n2 == batch_count(500)

    # ---- re-run with no new input: exactly-once (no duplicates)
    feats3 = streaming.stream_point_features(
        streaming.stream_documents(spark, in_dir))
    streaming.write_stream(feats3, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n2

    # streamed output values match the batch path exactly
    streamed = spark.read.parquet(out_dir).select("object_id", "layer", "kind")
    docs = src.where(F.col("doc_id") < 500)
    nodes, _, _ = geocode.geocode(docs)
    batch = classify.classify_nodes(nodes).select("object_id", "layer", "kind")
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
