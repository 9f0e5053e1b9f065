"""Compact binary geometry packing for Arrow transfer between stages.

Geometries move between Spark stages as a single BINARY column (fast
Arrow transfer, small shuffle payload) holding fixed-point int32
(lon, latp) x 1e7 coordinates — the reference's storage convention
(include/coordinates.h:51-54).

Wire format (little-endian):
  u8  kind            1=point 2=linestring 3=polygon (multi-part capable)
  point:      i32 lon, i32 latp
  linestring: u32 nparts, then per part: u32 npts, npts * (i32 lon, i32 latp)
  polygon:    u32 npolys, per poly: u32 nrings, per ring: u32 npts,
              npts * (i32 lon, i32 latp)   (ring 0 = exterior)
"""

from __future__ import annotations

import struct

import numpy as np

KIND_POINT, KIND_LINE, KIND_POLYGON = 1, 2, 3


def _pack_coords(lon: np.ndarray, latp: np.ndarray) -> bytes:
    arr = np.empty((len(lon), 2), dtype="<i4")
    arr[:, 0] = lon
    arr[:, 1] = latp
    return arr.tobytes()


def pack_point(lon: int, latp: int) -> bytes:
    return struct.pack("<Bii", KIND_POINT, int(lon), int(latp))


def pack_line(parts: list) -> bytes:
    """parts = [(lon_arr, latp_arr), ...]"""
    out = [struct.pack("<BI", KIND_LINE, len(parts))]
    for lon, latp in parts:
        out.append(struct.pack("<I", len(lon)))
        out.append(_pack_coords(np.asarray(lon), np.asarray(latp)))
    return b"".join(out)


def pack_polygon(polys: list) -> bytes:
    """polys = [[(lon_arr, latp_arr), ...rings], ...]"""
    out = [struct.pack("<BI", KIND_POLYGON, len(polys))]
    for rings in polys:
        out.append(struct.pack("<I", len(rings)))
        for lon, latp in rings:
            out.append(struct.pack("<I", len(lon)))
            out.append(_pack_coords(np.asarray(lon), np.asarray(latp)))
    return b"".join(out)


def unpack(buf: bytes):
    """Returns (kind, payload):
    point -> (1, (lon, latp)); line -> (2, [(lon_arr, latp_arr), ...]);
    polygon -> (3, [[(lon_arr, latp_arr), ...], ...])."""
    kind = buf[0]
    if kind == KIND_POINT:
        lon, latp = struct.unpack_from("<ii", buf, 1)
        return kind, (lon, latp)
    off = 1
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    if kind == KIND_LINE:
        parts = []
        for _ in range(n):
            (npts,) = struct.unpack_from("<I", buf, off)
            off += 4
            arr = np.frombuffer(buf, dtype="<i4", count=npts * 2, offset=off).reshape(-1, 2)
            off += npts * 8
            parts.append((arr[:, 0].astype(np.int64), arr[:, 1].astype(np.int64)))
        return kind, parts
    if kind == KIND_POLYGON:
        polys = []
        for _ in range(n):
            (nrings,) = struct.unpack_from("<I", buf, off)
            off += 4
            rings = []
            for _ in range(nrings):
                (npts,) = struct.unpack_from("<I", buf, off)
                off += 4
                arr = np.frombuffer(buf, dtype="<i4", count=npts * 2, offset=off).reshape(-1, 2)
                off += npts * 8
                rings.append((arr[:, 0].astype(np.int64), arr[:, 1].astype(np.int64)))
            polys.append(rings)
        return kind, polys
    raise ValueError(f"bad geometry kind {kind}")


def geometry_hash(buf: bytes) -> int:
    """Stable 63-bit content hash for lineage metrics (north_rule)."""
    import zlib
    return (zlib.crc32(buf) << 31) ^ zlib.adler32(buf)
