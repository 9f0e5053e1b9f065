"""Real ESRI Shapefile (.shp) + dBase III (.dbf) ingestion (S8).

Re-expresses the reference's shapefile reader (src/read_shp.cpp:101-249,
which wraps shapelib): the main-file header scan, per-record Polygon /
PolyLine / Point parsing, and the DBF attribute join by record index
(reference: readShapefile attribute handling src/read_shp.cpp:162-213).
Pure `struct` parsing against the public ESRI whitepaper layout — no
shapelib dependency.

Spark shape: a shapefile reference layer is SMALL relative to the main
corpus (the reference memory-maps it whole per worker); here it parses
driver-side into a DataFrame destined for broadcast — same shape as the
synthetic `spatial.district_table`, so everything downstream (cell
cover, PIP join, kNN, attribute remap) is source-agnostic.

Coordinates: the reference re-projects shapefile latitude to latp at
ingest (src/read_shp.cpp:62-99 point/ring insertion via `latp2latzoom`
-driven geometry store). `lat_is_projected=False` applies the same
`lat2latp` conversion; fixtures that already store latp pass True.
"""

from __future__ import annotations

import struct

import numpy as np

SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5

_HDR = struct.Struct(">i5ii")          # file code, 5 unused, length (words)
_HDR2 = struct.Struct("<ii8d")         # version, shape type, bbox
_RECHDR = struct.Struct(">ii")         # record number, content length (words)


def read_shp(path: str) -> list:
    """Parse a .shp main file -> list of records.

    Each record: {"rec": n, "type": t, "parts": [(xs, ys) float64 …]}
    (Point records become a single 1-vertex part).
    """
    with open(path, "rb") as f:
        buf = f.read()
    code, *_unused, _flen = _HDR.unpack_from(buf, 0)
    if code != 9994:
        raise ValueError(f"not a shapefile (file code {code})")
    version, _gtype = _HDR2.unpack_from(buf, 28)[:2]
    if version != 1000:
        raise ValueError(f"unsupported shapefile version {version}")
    out = []
    off = 100
    n = len(buf)
    while off + 8 <= n:
        recno, clen = _RECHDR.unpack_from(buf, off)
        off += 8
        end = off + clen * 2
        (stype,) = struct.unpack_from("<i", buf, off)
        if stype == SHP_POINT:
            x, y = struct.unpack_from("<2d", buf, off + 4)
            parts = [(np.array([x]), np.array([y]))]
        elif stype in (SHP_POLYLINE, SHP_POLYGON):
            nparts, npts = struct.unpack_from("<2i", buf, off + 36)
            pstart = off + 44
            part_idx = np.frombuffer(buf, dtype="<i4", count=nparts, offset=pstart)
            xy = np.frombuffer(buf, dtype="<f8", count=npts * 2,
                               offset=pstart + nparts * 4).reshape(-1, 2)
            bounds = np.concatenate((part_idx.astype(np.int64), [npts]))
            parts = [(xy[a:b, 0].copy(), xy[a:b, 1].copy())
                     for a, b in zip(bounds[:-1], bounds[1:]) if b - a > 0]
        elif stype == 0:   # null shape
            parts = []
        else:
            raise ValueError(f"unsupported shape type {stype}")
        out.append({"rec": recno, "type": stype, "parts": parts})
        off = end
    return out


def read_dbf(path: str) -> tuple:
    """Parse a dBase III .dbf -> (field_names, rows) with rows as dicts;
    'N' fields become float/int, 'C' fields stripped strings
    (reference attribute typing: src/read_shp.cpp:170-199)."""
    with open(path, "rb") as f:
        buf = f.read()
    nrec, hdr_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    fields = []
    off = 32
    while off < hdr_size - 1 and buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fdec = buf[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    rows = []
    off = hdr_size
    for _ in range(nrec):
        if off + rec_size > len(buf):
            break
        if buf[off:off + 1] == b"*":      # deleted record
            off += rec_size
            continue
        pos = off + 1
        row = {}
        for name, ftype, flen, fdec in fields:
            raw = buf[pos:pos + flen].decode("ascii", "replace").strip()
            pos += flen
            if ftype == "N" and raw:
                row[name] = float(raw) if fdec else int(raw)
            elif ftype == "N":
                row[name] = None
            else:
                row[name] = raw
        rows.append(row)
        off += rec_size
    return [f[0] for f in fields], rows


def read_shapefile(shp_path: str, dbf_path: str | None = None,
                   lat_is_projected: bool = False) -> list:
    """.shp (+ optional .dbf) -> rows of
    (rec, shape_type, ring_lon, ring_latp, attrs) with 1e7 fixed-point
    int coordinates, first part only per record carried as the ring
    (multi-part records emit one row per part, like the reference's
    per-ring insertion src/read_shp.cpp:62-99)."""
    from .kernels import mercator as M

    shapes = read_shp(shp_path)
    attrs_rows = None
    if dbf_path is not None:
        _, attrs_rows = read_dbf(dbf_path)
    out = []
    for i, rec in enumerate(shapes):
        attrs = attrs_rows[i] if attrs_rows is not None and i < len(attrs_rows) else {}
        for xs, ys in rec["parts"]:
            latp = ys if lat_is_projected else np.asarray(M.lat2latp(ys))
            out.append({
                "rec": rec["rec"], "shape_type": rec["type"],
                "ring_lon": np.round(np.asarray(xs) * 1e7).astype(np.int64),
                "ring_latp": np.round(latp * 1e7).astype(np.int64),
                "attrs": attrs,
            })
    return out


def district_table_from_shapefile(spark, shp_path: str,
                                  dbf_path: str | None = None,
                                  lat_is_projected: bool = True):
    """Drop-in replacement for spatial.district_table sourced from real
    SHP/DBF bytes: expects polygon records whose DBF carries a numeric
    `district_id` (attribute column selection mirrors the reference's
    --shapefile layer config, CONFIGURATION.md:175-199)."""
    rows = []
    for r in read_shapefile(shp_path, dbf_path, lat_is_projected=lat_is_projected):
        lons = r["ring_lon"]
        latps = r["ring_latp"]
        did = int(r["attrs"].get("district_id", r["rec"]))
        cx = int(r["attrs"].get("cx", lons.mean()))
        cy = int(r["attrs"].get("cy", latps.mean()))
        rows.append((did, cx, cy, [int(v) for v in lons], [int(v) for v in latps]))
    # few fat slices, not defaultParallelism: per-slice scan overhead on
    # locally-built ExistingRDDs dwarfs the data (see spatial.district_table)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, min(8, max(1, len(rows)))),
        "district_id INT, cx INT, cy INT, ring_lon ARRAY<INT>, ring_latp ARRAY<INT>")
