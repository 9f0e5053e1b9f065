"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as plain BINARY columns with a
STRUCT metadata column; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas UDFs over mapInPandas.
`decode_real` decodes uncompressed 24-bit BMP, binary PPM (P6),
8-bit PNG (stdlib-zlib inflate + numpy filter reconstruction), and
baseline JPEG (from-scratch T.81 Huffman + IDCT decoder,
kernels/jpeg.py) FOR REAL in this codec-less container —
driver-verified against closed-form pixel-sum oracles (media_decode /
media_decode_png / media_decode_jpeg). Progressive JPEG and
multi-frame formats sit behind the PIL import seam (absent here); the
deterministic fake decoder keeps that plumbing — schema, partitioning,
UDF signature, batch shape — real and tested.

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


# ---- PNG: pure-Python critical path (IHDR/IDAT/IEND, stdlib zlib
# inflate, per-row filter reconstruction in numpy). No codec library:
# the PNG spec's five filter types are plain byte arithmetic.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # gray, RGB, palette, gray+A, RGBA


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib as _z

    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", _z.crc32(tag + body)))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PaethPredictor over int16 arrays (PNG spec §6.6)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic 8-bit RGB PNG fixture: raw pixel byte j of the
    top-down unfiltered stream is (seed + j) % 256 — same closed form
    as encode_bmp — with row r filtered by type r % 5, so decoding
    exercises every filter reconstruction (None/Sub/Up/Average/Paeth)."""
    import struct
    import zlib as _z

    bpp = 3
    rb = width * bpp
    raw = ((seed + np.arange(height * rb, dtype=np.int64)) % 256) \
        .astype(np.uint8).reshape(height, rb)
    out = bytearray()
    prev = np.zeros(rb, dtype=np.uint8)
    for r in range(height):
        row = raw[r]
        ft = r % 5
        left = np.concatenate([np.zeros(bpp, dtype=np.uint8), row[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.uint8), prev[:-bpp]])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - ((left.astype(np.int16) + prev.astype(np.int16)) // 2).astype(np.uint8)
        else:
            filt = row - _paeth(left, prev, ul)
        out.append(ft)
        out.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def decode_png(buf: bytes):
    """Parse an 8-bit gray/RGB/RGBA PNG -> (width, height, pixel_sum):
    chunk walk, zlib inflate of the concatenated IDAT stream, then
    filter-type reconstruction per scanline (PNG spec §6; the left/
    up/average/Paeth predictors use RECONSTRUCTED neighbor bytes)."""
    import struct
    import zlib as _z

    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i = 8
    width = height = bitdepth = colortype = None
    idat = bytearray()
    palette = None
    while i < len(buf):
        (ln,) = struct.unpack_from(">I", buf, i)
        tag = buf[i + 4:i + 8]
        body = buf[i + 8:i + 8 + ln]
        i += 12 + ln
        if tag == b"PLTE":
            # per-entry r+g+b sums: palette pixels contribute their RGB
            palette = np.frombuffer(body, dtype=np.uint8) \
                .reshape(-1, 3).sum(axis=1, dtype=np.int64)
        elif tag == b"IHDR":
            width, height, bitdepth, colortype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if bitdepth != 8 or colortype not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"only 8-bit gray/RGB/palette/RGBA PNG supported "
                    f"(depth={bitdepth}, color={colortype})")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    bpp = _PNG_CHANNELS[colortype]
    rb = width * bpp
    stream = np.frombuffer(_z.decompress(bytes(idat)), dtype=np.uint8)
    if len(stream) != height * (rb + 1):
        raise ValueError("PNG stream length mismatch")
    stream = stream.reshape(height, rb + 1)
    prev = np.zeros(rb, dtype=np.uint8)
    total = 0
    for r in range(height):
        ft = int(stream[r, 0])
        row = stream[r, 1:].copy()
        if ft == 0:
            pass
        elif ft == 2:  # Up — vectorized (no left dependency)
            row += prev
        elif ft in (1, 3, 4):  # left-dependent: sequential per byte
            for j in range(rb):
                a = int(row[j - bpp]) if j >= bpp else 0
                b = int(prev[j])
                c = int(prev[j - bpp]) if j >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (int(row[j]) + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        if colortype == 3:
            if palette is None:
                raise ValueError("palette PNG missing PLTE")
            total += int(palette[row].sum(dtype=np.int64))
        else:
            total += int(row.sum(dtype=np.int64))
        prev = row
    return int(width), int(height), total


def decode_real(payload: bytes):
    """Real image decode: pure-struct BMP/PPM arms (run in ANY
    environment, returning the decoded pixel sum as the checksum),
    from-scratch PNG and baseline-JPEG decoders, PIL for the remaining
    codec-owned formats (progressive JPEG, multi-frame) when available
    (header checksum there, as pixel access is codec-owned),
    NotImplementedError otherwise so callers can fall back to the
    deterministic fake path."""
    if payload[:2] == b"BM":
        w, h, psum = decode_bmp(payload)
        return "image", w, h, 1, psum
    if payload[:2] == b"P6":
        w, h, psum = decode_ppm(payload)
        return "image", w, h, 1, psum
    if payload[:8] == _PNG_SIG:
        try:
            w, h, psum = decode_png(payload)
            return "image", w, h, 1, psum
        except NotImplementedError:
            if _PILImage is None:  # 16-bit / sub-byte / interlaced
                raise
    if payload[:2] == b"\xff\xd8":
        from .kernels import jpeg as _jpeg

        try:
            w, h, psum = _jpeg.decode_jpeg(payload)
            return "image", w, h, 1, psum
        except NotImplementedError:
            if _PILImage is None:  # progressive: codec-owned
                raise
    if _PILImage is None:
        raise NotImplementedError(
            "progressive-JPEG/multi-frame/other-format decoding requires "
            "PIL/ffmpeg-class libraries; BMP/PPM/PNG(8-bit)/baseline-JPEG "
            "decode is built in; use extract_media_features (deterministic "
            "fake) for other formats in this environment")
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


def with_png_media_payload(docs: DataFrame) -> DataFrame:
    """Deterministic PNG payloads (a COMPRESSED format decoded for real
    in this container): width = 3 + doc_id%13, height = 1 + (doc_id//13)%12,
    seed = doc_id%256 — raw pixel bytes are (seed+j)%256, so pixel_sum
    stays closed-form in doc_id while the wire bytes go through zlib and
    all five PNG filter types (row r uses filter r%5)."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            payloads = [encode_png(int(3 + d % 13),
                                   int(1 + (d // 13) % 12),
                                   int(d % 256)) for d in ids]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(gen, schema="doc_id long, payload binary")


def with_jpeg_media_payload(docs: DataFrame) -> DataFrame:
    """Deterministic baseline-JPEG payloads (an ENTROPY-CODED format
    decoded for real in this container): width = 9 + doc_id%24,
    height = 9 + (doc_id//24)%24, seed = doc_id%256. DC-only 4:2:0
    blocks decode exactly (see kernels/jpeg.py), so pixel_sum =
    3 * sum over 8x8 luma blocks of crop_w*crop_h*((seed+17bx+29by)%256)
    stays closed-form in doc_id while the wire bytes go through Huffman
    coding, dequantization, the IDCT, chroma upsampling and YCbCr->RGB."""
    from .kernels import jpeg as _jpeg

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            payloads = [_jpeg.encode_dc_jpeg(int(9 + d % 24),
                                             int(9 + (d // 24) % 24),
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
