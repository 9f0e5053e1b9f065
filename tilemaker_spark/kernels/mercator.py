"""Spherical-Mercator projection + tile coordinate math (G1-G6).

Bit-exact re-expression of the reference's coordinate kernels
(reference: src/coordinates.cpp:18-94, include/coordinates.h:51-155).
All functions are vectorized numpy float64 and replicate the exact
operation order of the C++ (e.g. ``(lon+180.0) * (1/360.0)`` —
multiply by reciprocal, not divide — and C cast-truncation toward
zero when flooring to tile integers).

Coordinates follow the reference convention: fixed-point int32,
degrees x 1e7, with latitude pre-projected to "latp"
(reference: src/read_pbf.cpp:30).
"""

from __future__ import annotations

import numpy as np

# Earth mean radius, reference: include/coordinates.h:85
RADIUS_METER = 6371000.0
# reference: include/coordinates.h:60-61
MAX_LAT = 85.0511
MIN_LAT = -MAX_LAT
# fixed-point scale, reference: src/read_pbf.cpp:30, src/coordinates.cpp:39-40
FIXED = 10000000.0


def lat2latp(lat):
    """Project latitude to spherical Mercator (reference: src/coordinates.cpp:23)."""
    lat = np.asarray(lat, dtype=np.float64)
    return np.degrees(np.log(np.tan(np.radians(lat + 90.0) / 2.0)))


def latp2lat(latp):
    """Inverse Mercator projection (reference: src/coordinates.cpp:24)."""
    latp = np.asarray(latp, dtype=np.float64)
    return np.degrees(np.arctan(np.exp(np.radians(latp))) * 2.0) - 90.0


def lon2tilexf(lon, z: int):
    """Fractional tile-x (reference: src/coordinates.cpp:27 — scalbn == ldexp)."""
    lon = np.asarray(lon, dtype=np.float64)
    return np.ldexp((lon + 180.0) * (1.0 / 360.0), int(z))


def latp2tileyf(latp, z: int):
    """Fractional tile-y (reference: src/coordinates.cpp:28)."""
    latp = np.asarray(latp, dtype=np.float64)
    return np.ldexp((180.0 - latp) * (1.0 / 360.0), int(z))


def lat2tileyf(lat, z: int):
    """reference: src/coordinates.cpp:29"""
    return latp2tileyf(lat2latp(lat), z)


def lon2tilex(lon, z: int):
    """Integer tile-x; C uint cast truncates toward zero (src/coordinates.cpp:30)."""
    return np.trunc(lon2tilexf(lon, z)).astype(np.int64)


def latp2tiley(latp, z: int):
    """Integer tile-y (reference: src/coordinates.cpp:31)."""
    return np.trunc(latp2tileyf(latp, z)).astype(np.int64)


def tilex2lon(x, z: int):
    """reference: src/coordinates.cpp:33"""
    x = np.asarray(x, dtype=np.float64)
    return np.ldexp(x, -int(z)) * 360.0 - 180.0


def tiley2latp(y, z: int):
    """reference: src/coordinates.cpp:34"""
    y = np.asarray(y, dtype=np.float64)
    return 180.0 - np.ldexp(y, -int(z)) * 360.0


def tiley2lat(y, z: int):
    """reference: src/coordinates.cpp:35"""
    return latp2lat(tiley2latp(y, z))


def latplon2index(latp_fixed, lon_fixed, base_zoom: int):
    """Fixed-point (latp, lon) int32 x 1e7 -> base-zoom tile (x, y).

    reference: src/coordinates.cpp:38-41.
    """
    x = lon2tilex(np.asarray(lon_fixed, dtype=np.float64) / FIXED, base_zoom)
    y = latp2tiley(np.asarray(latp_fixed, dtype=np.float64) / FIXED, base_zoom)
    return x, y


def degp2meter(degp, latp):
    """Projected degrees -> meters at latitude (reference: src/coordinates.cpp:44-46)."""
    degp = np.asarray(degp, dtype=np.float64)
    return RADIUS_METER * np.radians(degp) * np.cos(np.radians(latp2lat(latp)))


def meter2degp(meter, latp):
    """Meters -> projected degrees (reference: src/coordinates.cpp:47-49)."""
    meter = np.asarray(meter, dtype=np.float64)
    return np.degrees((1.0 / RADIUS_METER) * (meter / np.cos(np.radians(latp2lat(latp)))))


class TileBbox:
    """Tile bounds + pixel scaling, 0.5% clip margin, 4096 extent.

    reference: src/coordinates.cpp:73-94. Note the reference derives
    minLatp/maxLatp via a lat round-trip (tiley2latp -> latp2lat ->
    lat2latp); we replicate that exact float path.
    """

    __slots__ = ("zoom", "x", "y", "min_lon", "max_lon", "min_lat", "max_lat",
                 "min_latp", "max_latp", "xmargin", "ymargin", "xscale", "yscale")

    def __init__(self, x: int, y: int, zoom: int):
        self.zoom = zoom
        self.x = x
        self.y = y
        self.min_lon = float(tilex2lon(x, zoom))
        self.min_lat = float(tiley2lat(y + 1, zoom))
        self.max_lon = float(tilex2lon(x + 1, zoom))
        self.max_lat = float(tiley2lat(y, zoom))
        self.min_latp = float(lat2latp(self.min_lat))
        self.max_latp = float(lat2latp(self.max_lat))
        self.xmargin = (self.max_lon - self.min_lon) / 200.0
        self.ymargin = (self.max_latp - self.min_latp) / 200.0
        self.xscale = (self.max_lon - self.min_lon) / 4096.0
        self.yscale = (self.max_latp - self.min_latp) / 4096.0

    @property
    def clip_box(self):
        """(xmin, ymin, xmax, ymax) in (lon, latp) with margin."""
        return (self.min_lon - self.xmargin, self.min_latp - self.ymargin,
                self.max_lon + self.xmargin, self.max_latp + self.ymargin)

    def scale_latp_lon(self, latp, lon):
        """(lon, latp) degrees -> integer tile-local pixel, C truncation.

        reference: src/coordinates.cpp:90-94 (int cast truncates toward 0,
        which matters for negative margin-region pixels).
        """
        px = np.trunc((np.asarray(lon, dtype=np.float64) - self.min_lon) / self.xscale)
        py = np.trunc((self.max_latp - np.asarray(latp, dtype=np.float64)) / self.yscale)
        return px.astype(np.int64), py.astype(np.int64)
