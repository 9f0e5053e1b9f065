"""Douglas-Peucker simplification (G10).

Matches boost::geometry::simplify semantics as invoked by the
reference (src/write_geometry.cpp:23-28,55-60,75-80): standard DP with
a perpendicular-distance tolerance; endpoints always kept; applied to
linestrings and to each polygon ring. The per-zoom tolerance formula
lives in tilemaker_spark/config.py (reference: src/tile_worker.cpp:167-176).

Implementation is an iterative stack (deterministic, no recursion limit)
over float64 numpy arrays.
"""

from __future__ import annotations

import numpy as np


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask of Douglas-Peucker at perpendicular distance tol."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    if n <= 2 or tol <= 0.0:
        if tol <= 0.0:
            keep[:] = True
        return keep
    tol2 = tol * tol
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        ax, ay = xs[i], ys[i]
        bx, by = xs[j], ys[j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        mx = xs[i + 1:j]
        my = ys[i + 1:j]
        if seg2 == 0.0:
            d2 = (mx - ax) ** 2 + (my - ay) ** 2
        else:
            # perpendicular distance to the infinite line through a-b
            # (boost::geometry's DP uses segment distance; for the max-
            # deviation vertex inside a chain the two coincide except at
            # projections beyond the endpoints, which we handle below)
            t = ((mx - ax) * dx + (my - ay) * dy) / seg2
            t = np.clip(t, 0.0, 1.0)
            px = ax + t * dx
            py = ay + t * dy
            d2 = (mx - px) ** 2 + (my - py) ** 2
        k = int(np.argmax(d2))
        if d2[k] > tol2:
            k += i + 1
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_line(xs: np.ndarray, ys: np.ndarray, tol: float):
    """Simplify an open linestring. Returns (xs, ys)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) <= 2 or tol <= 0.0:
        return xs, ys
    m = dp_keep_mask(xs, ys, tol)
    return xs[m], ys[m]


def simplify_ring(xs: np.ndarray, ys: np.ndarray, tol: float):
    """Simplify a closed ring (first==last). Returns (xs, ys) still closed,
    or None if it degenerates below 4 points (3 distinct vertices) —
    boost::geometry drops such rings from the output polygon."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if tol <= 0.0 or len(xs) <= 4:
        return xs, ys
    m = dp_keep_mask(xs, ys, tol)
    rx, ry = xs[m], ys[m]
    if len(rx) < 4:
        return None
    return rx, ry
