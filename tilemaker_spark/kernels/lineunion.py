"""Geometric linestring union for --combine (A5 line arm).

The reference merges same-attribute linestrings in a tile with
``geom::union_`` over MultiLinestrings (src/tile_worker.cpp:66-99):
the accumulator starts as the first feature's geometry and each next
feature contributes only the portions of its lines NOT already covered
— so exact duplicates vanish, collinear overlaps are emitted once, and
disjoint lines concatenate.  boost's linear-linear union is a 1-D
set union over collinear supports; crossing at isolated points does not
modify either line (a point has linear measure zero).

This kernel reproduces that semantic EXACTLY in integer arithmetic on
the 1e7 fixed-point coordinates (pre-clip, so no float snapping is ever
needed):

- each segment lies on an integer line *support* keyed by its reduced
  direction (dx/g, dy/g, canonicalized sign) and offset
  c = dy_r*x0 - dx_r*y0 — exact int64, collinear iff equal key;
- along a support, position t = x*dx_r + y*dy_r is a strictly monotone
  integer parameter; covered portions form an interval set per support;
- a new segment keeps only its sub-intervals outside the covered set,
  then extends it.  Interval endpoints map back to exact lattice points
  (t steps by dx_r^2 + dy_r^2 per lattice step along the support).

Output parts preserve input vertex order; consecutive surviving pieces
of one input part are re-chained so an untouched line round-trips
byte-identically.
"""

from __future__ import annotations

from math import gcd

import numpy as np


def _support_key(x0: int, y0: int, x1: int, y1: int):
    """(dir_r, offset) support key + oriented reduced direction.

    Returns (key, dxr, dyr) where key identifies the infinite line and
    (dxr, dyr) is the canonical reduced direction used for the t
    parameter (flipped so the first nonzero of (dxr, dyr) is > 0 —
    both orientations of a segment share the key AND the parameter)."""
    dx = x1 - x0
    dy = y1 - y0
    g = gcd(abs(dx), abs(dy))
    dxr, dyr = dx // g, dy // g
    if dxr < 0 or (dxr == 0 and dyr < 0):
        dxr, dyr = -dxr, -dyr
    # offset: cross(dir_r, p) is constant for p on the line
    c = dyr * x0 - dxr * y0
    return (dxr, dyr, c), dxr, dyr


def _sub_intervals(t0: int, t1: int, covered: list):
    """Portions of [t0, t1] not covered by the sorted disjoint interval
    list ``covered`` -> list of (a, b) with a < b."""
    out = []
    cur = t0
    for a, b in covered:
        if b <= cur:
            continue
        if a >= t1:
            break
        if a > cur:
            out.append((cur, min(a, t1)))
        cur = max(cur, b)
        if cur >= t1:
            break
    if cur < t1:
        out.append((cur, t1))
    return out


def _add_interval(covered: list, t0: int, t1: int) -> None:
    """Insert [t0, t1] into the sorted disjoint interval list, merging."""
    import bisect

    i = bisect.bisect_left(covered, (t0, t0))
    # merge with predecessor if touching/overlapping
    if i > 0 and covered[i - 1][1] >= t0:
        i -= 1
        t0 = covered[i][0]
        t1 = max(t1, covered[i][1])
    j = i
    while j < len(covered) and covered[j][0] <= t1:
        t1 = max(t1, covered[j][1])
        j += 1
    covered[i:j] = [(t0, t1)]


def union_line_parts(parts):
    """boost geom::union_ fold over linestring parts.

    ``parts``: iterable of (lons, latps) int arrays (1e7 fixed-point).
    Returns the union as a list of (lons, latps) int64 arrays: part 0's
    surviving pieces first, in order, then part 1's, ... (the
    reference's accumulate-in-iteration-order shape,
    src/tile_worker.cpp:74-99)."""
    covered: dict = {}   # support key -> sorted disjoint [(t0, t1)]
    out = []
    for lons, latps in parts:
        xs = np.asarray(lons, dtype=np.int64)
        ys = np.asarray(latps, dtype=np.int64)
        chain_x: list = []
        chain_y: list = []

        def flush():
            if len(chain_x) >= 2:
                out.append((np.array(chain_x, dtype=np.int64),
                            np.array(chain_y, dtype=np.int64)))
            chain_x.clear()
            chain_y.clear()

        for i in range(len(xs) - 1):
            x0, y0, x1, y1 = int(xs[i]), int(ys[i]), int(xs[i + 1]), int(ys[i + 1])
            if x0 == x1 and y0 == y1:
                continue
            key, dxr, dyr = _support_key(x0, y0, x1, y1)
            ta = x0 * dxr + y0 * dyr
            tb = x1 * dxr + y1 * dyr
            rev = ta > tb
            lo, hi = (tb, ta) if rev else (ta, tb)
            cov = covered.setdefault(key, [])
            keep = _sub_intervals(lo, hi, cov)
            _add_interval(cov, lo, hi)
            if rev:
                keep = [(b, a) for a, b in reversed(keep)]
            # norm = t-step per lattice step along the reduced direction
            norm = dxr * dxr + dyr * dyr

            def pt(t):
                k = (t - ta) // norm
                return x0 + k * dxr, y0 + k * dyr

            for a, b in keep:
                pa = pt(a)
                pb = pt(b)
                if chain_x and (chain_x[-1], chain_y[-1]) == pa:
                    chain_x.append(pb[0])
                    chain_y.append(pb[1])
                else:
                    flush()
                    chain_x.extend((pa[0], pb[0]))
                    chain_y.extend((pa[1], pb[1]))
        flush()
    return out
