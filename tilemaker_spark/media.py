"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as plain BINARY columns with a
STRUCT metadata column; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas UDFs over mapInPandas. The
image/audio codecs aren't available in this container, so the real
decoders are STUBS (NotImplementedError) behind `decode_real`; the
deterministic fake decoder keeps the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — real and tested.

At 100 TB the shape matters: payloads stay columnar (never exploded),
metadata extraction is a single mapInPandas pass, and frame sampling
emits (doc_id, frame_idx) rows without materializing frames driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, n_bytes int, kind string, width int, height int, "
                "n_frames int, checksum long")


def with_media_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic fake binary payload derived from text
    (the stand-in for a real image/audio blob column)."""
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))


try:  # optional codec dependency — absent in this container
    from PIL import Image as _PILImage  # type: ignore
except ImportError:
    _PILImage = None

HAVE_CODECS = _PILImage is not None


def decode_real(payload: bytes):
    """Real image decode seam: uses Pillow when available (returns
    (kind, width, height, n_frames, checksum) like _fake_meta), raises
    NotImplementedError otherwise so callers can fall back to the
    deterministic fake path."""
    if _PILImage is None:
        raise NotImplementedError(
            "media decoding requires PIL/ffmpeg-class libraries; "
            "use extract_media_features (deterministic fake) in this environment")
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:
        width, height = im.size
        n_frames = int(getattr(im, "n_frames", 1))
        checksum = 0
        for b in payload[:16]:
            checksum = (checksum * 131 + b) % 1000000007
        return "image", int(width), int(height), n_frames, checksum


def _fake_meta(buf: bytes):
    """Deterministic fake decode: metadata derived from byte length and
    the first bytes — stands in for (width, height, frames) of a real
    codec while exercising identical plumbing."""
    n = len(buf)
    kind = ("image", "audio", "video")[n % 3]
    width = 64 + n % 192
    height = 64 + (n // 7) % 192
    n_frames = 1 if kind == "image" else n % 10 + 1
    checksum = 0
    for b in buf[:16]:
        checksum = (checksum * 131 + b) % 1000000007
    return kind, width, height, n_frames, checksum


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction — one Arrow batch at a time,
    payload never leaves the executor."""

    def extract(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                kind, w, h, nf, cs = _fake_meta(buf)
                rows.append({"doc_id": int(doc_id), "n_bytes": len(buf),
                             "kind": kind, "width": w, "height": h,
                             "n_frames": nf, "checksum": cs})
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "kind", "width",
                                              "height", "n_frames", "checksum"])

    return media.mapInPandas(extract, schema=MEDIA_SCHEMA)


def sample_frames(features: DataFrame, stride: int = 3) -> DataFrame:
    """Frame sampling: every `stride`-th frame index per video/audio —
    pure Catalyst explode(sequence(...)), no Python."""
    return (features
            .where(F.col("n_frames") > 1)
            .select("doc_id", "kind", "n_frames",
                    F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1,
                                         F.lit(stride))).alias("frame_idx")))


def resize_stub(features: DataFrame, max_side: int = 128) -> DataFrame:
    """Resize planning (the compute part is codec-bound and stubbed):
    target dims preserving aspect ratio, integer math only."""
    scale_num = F.lit(max_side)
    longest = F.greatest("width", "height")
    return features.select(
        "doc_id", "width", "height",
        F.when(longest <= max_side, F.col("width"))
         .otherwise((F.col("width") * scale_num / longest).cast("int")).alias("out_w"),
        F.when(longest <= max_side, F.col("height"))
         .otherwise((F.col("height") * scale_num / longest).cast("int")).alias("out_h"),
    )
