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


# ---------------------------------------- real decode: BMP / PPM / PIL
# Uncompressed 24-bit BMP and binary PPM (P6) are struct-parseable in
# pure Python/numpy, so the decode path runs FOR REAL in a codec-less
# container; JPEG/PNG and multi-frame formats stay behind the PIL seam.

def encode_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic 24-bit uncompressed BMP fixture: pixel byte j of
    the unpadded bottom-up stream has value (seed + j) % 256, so
    width/height/pixel_sum are closed-form in (width, height, seed)."""
    import struct

    row_bytes = width * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      img_size, 2835, 2835, 0, 0)
    vals = ((seed + np.arange(height * row_bytes, dtype=np.int64)) % 256).astype(np.uint8)
    if pad:
        padded = np.zeros((height, stride), dtype=np.uint8)
        padded[:, :row_bytes] = vals.reshape(height, row_bytes)
        data = padded.tobytes()
    else:
        data = vals.tobytes()
    return header + dib + data


def decode_bmp(buf: bytes):
    """Parse a BI_RGB 24-bit BMP -> (width, height, pixel_sum). The sum
    covers pixel bytes only (row padding excluded)."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", buf, 10)
    _dib, width, height, _planes, bpp = struct.unpack_from("<IiiHH", buf, 14)
    (comp,) = struct.unpack_from("<I", buf, 30)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only BI_RGB 24-bit BMP supported (bpp={bpp})")
    h = abs(height)
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    arr = np.frombuffer(buf, dtype=np.uint8, count=stride * h,
                        offset=offset).reshape(h, stride)
    return int(width), h, int(arr[:, :row_bytes].sum(dtype=np.int64))


def decode_ppm(buf: bytes):
    """Parse a binary PPM (P6) -> (width, height, pixel_sum)."""
    i = 0
    toks = []
    while len(toks) < 4:
        while buf[i:i + 1].isspace():
            i += 1
        if buf[i:i + 1] == b"#":
            while buf[i:i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j:j + 1].isspace():
            j += 1
        toks.append(buf[i:j])
        i = j
    if toks[0] != b"P6":
        raise ValueError("not a P6 PPM")
    w, h = int(toks[1]), int(toks[2])
    data = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=i + 1)
    return w, h, int(data.sum(dtype=np.int64))


def decode_real(payload: bytes):
    """Real image decode: pure-struct BMP/PPM arms (run in ANY
    environment, returning the decoded pixel sum as the checksum), PIL
    for JPEG/PNG-class formats when available (header checksum, as
    pixel access is codec-owned there), NotImplementedError otherwise
    so callers can fall back to the deterministic fake path."""
    if payload[:2] == b"BM":
        w, h, psum = decode_bmp(payload)
        return "image", w, h, 1, psum
    if payload[:2] == b"P6":
        w, h, psum = decode_ppm(payload)
        return "image", w, h, 1, psum
    if _PILImage is None:
        raise NotImplementedError(
            "JPEG/PNG decoding requires PIL/ffmpeg-class libraries; "
            "BMP/PPM decode is built in; use extract_media_features "
            "(deterministic fake) for other formats in this environment")
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:
        width, height = im.size
        n_frames = int(getattr(im, "n_frames", 1))
        checksum = 0
        for b in payload[:16]:
            checksum = (checksum * 131 + b) % 1000000007
        return "image", int(width), int(height), n_frames, checksum


def with_real_media_payload(docs: DataFrame) -> DataFrame:
    """Deterministic BMP payloads, decodable for real in this container:
    width = 4*(1 + doc_id%16) (multiple of 4 -> padless rows),
    height = 1 + (doc_id//16)%16, seed = doc_id%256 — all closed-form in
    doc_id so a SQL oracle re-derives width/height/pixel_sum exactly."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            payloads = [encode_bmp(int(4 * (1 + d % 16)),
                                   int(1 + (d // 16) % 16),
                                   int(d % 256)) for d in ids]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(gen, schema="doc_id long, payload binary")


REAL_MEDIA_SCHEMA = ("doc_id long, n_bytes int, kind string, width int, "
                     "height int, n_frames int, pixel_sum long")


def extract_media_features_real(media: DataFrame) -> DataFrame:
    """mapInPandas REAL decode (BMP/PPM struct parse, PIL seam) — same
    executor-side plumbing as extract_media_features, but the metadata
    comes from the decoded image, not the fake header."""
    def extract(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                kind, w, h, nf, psum = decode_real(buf)
                rows.append((int(doc_id), len(buf), kind, w, h, nf, int(psum)))
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "kind", "width",
                                              "height", "n_frames", "pixel_sum"])

    return media.mapInPandas(extract, schema=REAL_MEDIA_SCHEMA)


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
