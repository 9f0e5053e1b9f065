"""Mapbox Vector Tile encoding (G16-G18) — hand-rolled protobuf writer.

Re-expresses the reference's tile serialization:
- command stream (MoveTo/LineTo/ClosePath, delta + zigzag):
  src/write_geometry.cpp:93-130 — including the exact quirks: strings
  with <2 points dropped, consecutive identical pixels deduped, strings
  whose lineTo count collapses to 0 dropped, lastPos carried across
  rings/parts within one feature, closePath appended for rings.
- per-layer key/value dictionaries: src/output_object.cpp:99-138 (A8/G17).
- Tile/Layer/Feature/Value protobuf: include/vector_tile.proto:7-100
  (version 2, extent 4096 — src/tile_worker.cpp:186-187).
- gzip/zlib compression: src/helpers.cpp:20-65 (G18).

No protobuf library needed: the writer emits wire-format bytes directly
(deterministic field order).
"""

from __future__ import annotations

import gzip as _gzip
import struct
import zlib

import numpy as np

GEOM_UNKNOWN, GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 0, 1, 2, 3


# ---------------------------------------------------------------- protobuf
_VARINT1 = [bytes([i]) for i in range(128)]


def _varint(n: int) -> bytes:
    if 0 <= n < 128:
        return _VARINT1[n]
    out = bytearray()
    n &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _packed_varints(field: int, values) -> bytes:
    payload = b"".join(_varint(int(v)) for v in values)
    return _len_delim(field, payload)


def zigzag32(n) -> np.ndarray:
    """(n << 1) ^ (n >> 31) on int32 (reference: src/write_geometry.cpp:103)."""
    n = np.asarray(n, dtype=np.int64)
    return ((n << 1) ^ (n >> 63)).astype(np.uint64)


# ---------------------------------------------------- vectorized varints
def varint_array(vals, return_lens: bool = False):
    """Vectorized varint encoding of an integer array -> concatenated
    bytes (optionally also the per-value byte lengths).

    Loops over byte POSITIONS (<=10), not values — the per-value work is
    numpy. This is the packed-geometry hot path: one call per feature
    instead of one Python ``_varint`` per command int.
    """
    v = np.asarray(vals, dtype=np.int64).astype(np.uint64)
    n = len(v)
    if n == 0:
        return (b"", np.empty(0, np.int64)) if return_lens else b""
    if n <= 48 and not return_lens:
        # scalar path: numpy's per-call overhead (~100 us of array
        # machinery) dwarfs the work for short command lists — points
        # are 3 ints, small lines a few dozen
        return b"".join(_varint(int(x)) for x in v)
    nb = np.ones(n, np.int64)
    for k in range(1, 10):
        m = v >= np.uint64(1 << (7 * k))
        if not m.any():
            break
        nb += m
    total = int(nb.sum())
    out = np.zeros(total, np.uint8)
    offs = np.concatenate(([0], np.cumsum(nb)[:-1]))
    kmax = int(nb.max())
    for k in range(kmax):
        mask = nb > k
        idx = offs[mask] + k
        byte = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = ((nb[mask] > k + 1).astype(np.uint8)) << 7
        out[idx] = byte | cont
    blob = out.tobytes()
    return (blob, nb) if return_lens else blob


# ------------------------------------------------------------ command stream
def encode_point_geometry(px: int, py: int) -> list:
    """Single point: MoveTo x1 (reference: src/tile_worker.cpp:112-115)."""
    return [9, int(zigzag32(px)), int(zigzag32(py))]


def write_delta_string(pxs: np.ndarray, pys: np.ndarray, last_pos: list,
                       close_path: bool) -> list:
    """One linestring/ring -> command ints; mutates last_pos [x, y].

    Faithful to src/write_geometry.cpp:93-130.
    """
    n = len(pxs)
    if n < 2:
        return []
    geometry = []
    last_x = int(pxs[0])
    last_y = int(pys[0])
    dx = last_x - last_pos[0]
    dy = last_y - last_pos[1]
    geometry.append(9)  # moveTo, repeat x1
    geometry.append(int(zigzag32(dx)))
    geometry.append(int(zigzag32(dy)))
    length = 0
    geometry.append(0)  # lineTo opcode placeholder (index 3)
    for i in range(1, n):
        x = int(pxs[i])
        y = int(pys[i])
        if x == last_x and y == last_y:
            continue
        geometry.append(int(zigzag32(x - last_x)))
        geometry.append(int(zigzag32(y - last_y)))
        last_x, last_y = x, y
        length += 1
    if length == 0:
        return []
    geometry[3] = (length << 3) + 2
    if close_path:
        geometry.append(7 + 8)  # closePath x1
    last_pos[0] = last_x
    last_pos[1] = last_y
    return geometry


def delta_string_cmds(pxs: np.ndarray, pys: np.ndarray, last_pos: list,
                      close_path: bool):
    """Vectorized ``write_delta_string``: same semantics (same-as-last-
    retained pixel skip — provably equal to consecutive-duplicate drop,
    since last_retained always equals the previous input point — <2-pt
    and zero-lineTo strings dropped, lastPos carried), returning an
    int64 command array or None. reference: src/write_geometry.cpp:93-130."""
    n = len(pxs)
    if n < 2:
        return None
    px = np.asarray(pxs, dtype=np.int64)
    py = np.asarray(pys, dtype=np.int64)
    keep = np.empty(n, dtype=bool)
    keep[0] = True
    np.not_equal(px[1:], px[:-1], out=keep[1:])
    keep[1:] |= py[1:] != py[:-1]
    rx = px[keep]
    ry = py[keep]
    m = len(rx) - 1
    if m == 0:
        return None
    out = np.empty(4 + 2 * m + (1 if close_path else 0), dtype=np.int64)
    out[0] = 9
    dx0 = int(rx[0]) - last_pos[0]
    dy0 = int(ry[0]) - last_pos[1]
    out[1] = (dx0 << 1) ^ (dx0 >> 63)
    out[2] = (dy0 << 1) ^ (dy0 >> 63)
    out[3] = (m << 3) + 2
    ddx = np.diff(rx)
    ddy = np.diff(ry)
    out[4:4 + 2 * m:2] = (ddx << 1) ^ (ddx >> 63)
    out[5:5 + 2 * m:2] = (ddy << 1) ^ (ddy >> 63)
    if close_path:
        out[-1] = 15  # closePath x1
    last_pos[0] = int(rx[-1])
    last_pos[1] = int(ry[-1])
    return out


def encode_line_geometry(parts: list) -> list:
    """Multilinestring -> command ints. ``parts`` = [(pxs, pys), ...]."""
    last_pos = [0, 0]
    out: list = []
    for pxs, pys in parts:
        out.extend(write_delta_string(np.asarray(pxs), np.asarray(pys), last_pos, False))
    return out


def encode_polygon_geometry(polys: list) -> list:
    """Multipolygon -> command ints. ``polys`` = list of polygons, each a
    list of rings (pxs, pys), ring 0 exterior (reference:
    src/write_geometry.cpp:23-52 — all rings closePath, lastPos shared)."""
    last_pos = [0, 0]
    out: list = []
    for rings in polys:
        for pxs, pys in rings:
            out.extend(write_delta_string(np.asarray(pxs), np.asarray(pys), last_pos, True))
    return out


# ------------------------------------------------------------------- values
def encode_value(v) -> bytes:
    """Tile_Value message bytes (include/vector_tile.proto:16-27).
    Accepts str, bool, int, float — one arm set."""
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, str):
        return _len_delim(1, v.encode("utf-8"))
    if isinstance(v, (int, np.integer)):
        return _tag(4, 0) + _varint(int(v) & 0xFFFFFFFFFFFFFFFF if v >= 0 else (int(v) + (1 << 64)))
    if isinstance(v, (float, np.floating)):
        # tilemaker writes float_value for Lua numerics (src/osm_lua_processing.cpp:344)
        return _tag(2, 5) + struct.pack("<f", float(v))
    raise TypeError(f"unsupported attribute value type: {type(v)}")


def encode_feature(geom_type: int, geometry: list, tag_idx: list,
                   feature_id: int | None = None) -> bytes:
    out = bytearray()
    if feature_id is not None:
        out += _tag(1, 0) + _varint(int(feature_id))
    if tag_idx:
        out += _packed_varints(2, tag_idx)
    out += _tag(3, 0) + _varint(geom_type)
    out += _packed_varints(4, geometry)
    return bytes(out)


def encode_feature_raw(geom_type: int, geom_bytes: bytes, tag_idx: list,
                       feature_id: int | None = None) -> bytes:
    """Like encode_feature but the packed geometry varints are already
    bytes (from varint_array) — the vectorized encode path."""
    out = bytearray()
    if feature_id is not None:
        out += _tag(1, 0) + _varint(int(feature_id))
    if tag_idx:
        out += _packed_varints(2, tag_idx)
    out += _tag(3, 0) + _varint(geom_type)
    out += _tag(4, 2) + _varint(len(geom_bytes)) + geom_bytes
    return bytes(out)


def encode_layer(name: str, features: list, keys: list, values: list,
                 version: int = 2, extent: int = 4096) -> bytes:
    """Layer message: features already encoded, keys are str, values are
    raw python values (encoded here)."""
    out = bytearray()
    out += _tag(15, 0) + _varint(version)
    out += _len_delim(1, name.encode("utf-8"))
    for f in features:
        out += _len_delim(2, f)
    for k in keys:
        out += _len_delim(3, k.encode("utf-8"))
    for v in values:
        out += _len_delim(4, encode_value(v))
    out += _tag(5, 0) + _varint(extent)
    return bytes(out)


def encode_tile(layers: list) -> bytes:
    """Tile message: repeated Layer field 3."""
    return b"".join(_len_delim(3, layer) for layer in layers)


class LayerDicts:
    """Per-layer key/value dictionary builder (A8/G17), mirroring
    findValue/writeAttributes (src/output_object.cpp:99-138): linear
    first-occurrence indices."""

    def __init__(self):
        self.keys: list = []
        self.values: list = []
        self._kidx: dict = {}
        self._vidx: dict = {}

    def key_index(self, k: str) -> int:
        i = self._kidx.get(k)
        if i is None:
            i = len(self.keys)
            self.keys.append(k)
            self._kidx[k] = i
        return i

    def value_index(self, v) -> int:
        kk = (type(v).__name__, v)
        i = self._vidx.get(kk)
        if i is None:
            i = len(self.values)
            self.values.append(v)
            self._vidx[kk] = i
        return i


def compress_tile(data: bytes, use_gzip: bool = True, level: int = -1) -> bytes:
    """G18 (reference: src/helpers.cpp:20-65). Deterministic at fixed level.
    gzip wrapper written with mtime=0 for byte-stable output."""
    if use_gzip:
        return _gzip.compress(data, compresslevel=6 if level == -1 else level, mtime=0)
    return zlib.compress(data, level)
