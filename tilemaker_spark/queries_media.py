"""Multimodal plumbing queries + DuckDB oracles.

The payload is a deterministic fake (text bytes) so the decode stub's
metadata is closed-form SQL; what's under test is the real Spark-side
plumbing: binary column handling, mapInPandas batch shape, explode
frame sampling, integer resize math.
"""

from __future__ import annotations

from . import media


def q_media_features(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return media.extract_media_features(media.with_media_payload(docs))


def q_media_frame_sample(spark, sf_dir):
    return media.sample_frames(q_media_features(spark, sf_dir))


def q_media_resize(spark, sf_dir):
    return media.resize_stub(q_media_features(spark, sf_dir))


def q_media_decode(spark, sf_dir):
    """REAL decode: deterministic BMP payloads generated executor-side,
    struct-parsed back (width/height/pixel-sum) — no codec libraries
    needed, so this runs the actual decode path in any environment."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return media.extract_media_features_real(media.with_real_media_payload(docs))


def q_media_decode_png(spark, sf_dir):
    """REAL decode of a COMPRESSED format: deterministic PNG payloads
    (zlib IDAT, all five filter types) generated executor-side, decoded
    back through the pure-Python PNG critical path — width/height/
    pixel_sum are closed-form in doc_id (n_bytes is compression-
    dependent, so it is not part of the contract)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = media.extract_media_features_real(media.with_png_media_payload(docs))
    return feats.select("doc_id", "kind", "width", "height", "n_frames",
                        F.col("pixel_sum"))


def q_media_decode_jpeg(spark, sf_dir):
    """REAL decode of an ENTROPY-CODED format: deterministic DC-only
    baseline-4:2:0 JPEG payloads generated executor-side, decoded back
    through the from-scratch T.81 path (Huffman scan decode, dequant,
    IDCT, chroma upsample, YCbCr->RGB). DC-only constant blocks with DC
    quantizer step 8 decode EXACTLY, so width/height/pixel_sum are
    closed-form in doc_id (n_bytes is entropy-coding-dependent, so it
    is not part of the contract)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = media.extract_media_features_real(media.with_jpeg_media_payload(docs))
    return feats.select("doc_id", "kind", "width", "height", "n_frames",
                        F.col("pixel_sum"))


QUERIES = {
    "media_features": q_media_features,
    "media_frame_sample": q_media_frame_sample,
    "media_resize": q_media_resize,
    "media_decode": q_media_decode,
    "media_decode_png": q_media_decode_png,
    "media_decode_jpeg": q_media_decode_jpeg,
}


_META_CTE = """
WITH m AS (
  SELECT doc_id,
    CAST(octet_length(encode(text)) AS INT) AS n_bytes,
    (['image','audio','video'])[CAST(octet_length(encode(text)) % 3 AS INT) + 1] AS kind,
    CAST(64 + octet_length(encode(text)) % 192 AS INT) AS width,
    CAST(64 + (octet_length(encode(text)) // 7) % 192 AS INT) AS height,
    CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 1
         ELSE CAST(octet_length(encode(text)) % 10 + 1 AS INT) END AS n_frames,
    -- checksum over OCTETS (hex-pair extraction), matching the
    -- engine's byte iteration over the UTF-8 payload — character
    -- semantics (ord/substr on text) would silently desynchronize on
    -- the first multibyte character
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, CAST(least(17, octet_length(encode(text)) + 1) AS INT)),
                     i -> ('0x' || substr(hex(encode(text)), CAST(2*i - 1 AS INT), 2))::BIGINT)),
      (acc, b) -> (acc * 131 + b) % 1000000007) AS checksum
  FROM documents
)
"""


ORACLES = {
    "media_features": _META_CTE + """
SELECT doc_id, n_bytes, kind, width, height, n_frames, checksum FROM m
""",
    "media_frame_sample": _META_CTE + """
SELECT doc_id, kind, n_frames, CAST(unnest(range(0, n_frames, 3)) AS INT) AS frame_idx
FROM m WHERE n_frames > 1
""",
    "media_resize": _META_CTE + """
SELECT doc_id, width, height,
  CASE WHEN greatest(width, height) <= 128 THEN width
       ELSE CAST(floor(width * 128.0 / greatest(width, height)) AS INT) END AS out_w,
  CASE WHEN greatest(width, height) <= 128 THEN height
       ELSE CAST(floor(height * 128.0 / greatest(width, height)) AS INT) END AS out_h
FROM m
""",
    # real BMP decode: the engine's pixel bytes are (seed + j) % 256 over
    # j in [0, w*h*3), so pixel_sum = F(seed + nb) - F(seed) with
    # F(m) = 32640*(m//256) + r*(r-1)/2, r = m%256 (sum of i%256, i<m)
    "media_decode": """
WITH p AS (
  SELECT doc_id,
    4 * (1 + doc_id % 16) AS w,
    1 + (doc_id // 16) % 16 AS h,
    doc_id % 256 AS seed
  FROM documents
), q AS (
  SELECT doc_id, w, h, seed, w * h * 3 AS nb FROM p
)
SELECT doc_id,
  CAST(54 + nb AS INT) AS n_bytes,
  'image' AS kind,
  CAST(w AS INT) AS width,
  CAST(h AS INT) AS height,
  1 AS n_frames,
  CAST((32640 * ((seed + nb) // 256)
        + ((seed + nb) % 256) * (((seed + nb) % 256) - 1) // 2)
       - (32640 * (seed // 256) + (seed % 256) * ((seed % 256) - 1) // 2)
       AS BIGINT) AS pixel_sum
FROM q
""",
    # real PNG decode: raw (pre-filter) pixel bytes are (seed + j) % 256
    # over j in [0, w*h*3) — the same prefix-sum closed form; the zlib/
    # filter wire layer must reconstruct exactly this stream
    "media_decode_png": """
WITH p AS (
  SELECT doc_id,
    3 + doc_id % 13 AS w,
    1 + (doc_id // 13) % 12 AS h,
    doc_id % 256 AS seed
  FROM documents
), q AS (
  SELECT doc_id, w, h, seed, w * h * 3 AS nb FROM p
)
SELECT doc_id,
  'image' AS kind,
  CAST(w AS INT) AS width,
  CAST(h AS INT) AS height,
  1 AS n_frames,
  CAST((32640 * ((seed + nb) // 256)
        + ((seed + nb) % 256) * (((seed + nb) % 256) - 1) // 2)
       - (32640 * (seed // 256) + (seed % 256) * ((seed % 256) - 1) // 2)
       AS BIGINT) AS pixel_sum
FROM q
""",
    # real baseline-JPEG decode: DC-only 4:2:0 fixture — each 8x8 luma
    # block is the constant (seed + 17*bx + 29*by) % 256 and decodes
    # exactly, chroma is 128 (YCbCr->RGB identity on Y), so
    # pixel_sum = 3 * sum over blocks of crop_w * crop_h * block_value
    "media_decode_jpeg": """
WITH p AS (
  SELECT doc_id,
    9 + doc_id % 24 AS w,
    9 + (doc_id // 24) % 24 AS h,
    doc_id % 256 AS seed
  FROM documents
)
SELECT doc_id,
  'image' AS kind,
  CAST(w AS INT) AS width,
  CAST(h AS INT) AS height,
  1 AS n_frames,
  CAST(3 * list_sum(flatten(
    list_transform(range(0, (w + 7) // 8), bx ->
      list_transform(range(0, (h + 7) // 8), by ->
        least(8, w - 8 * bx) * least(8, h - 8 * by)
        * ((seed + 17 * bx + 29 * by) % 256))))) AS BIGINT) AS pixel_sum
FROM p
""",
}
