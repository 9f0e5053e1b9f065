"""Rectangular-window clipping kernels (G7-G9).

Semantics mirror the reference's ClipGeometryVisitor
(src/output_object.cpp:25-74): points kept iff within the box; lines
intersected with the box yielding a multilinestring; polygons clipped
via a polygon-boolean against the box (the reference uses Vatti/Clipper
ctIntersection even-odd — we use Sutherland-Hodgman per ring against the
rectangle, which is exact for a convex rectangular window, plus the same
`within`-box fast path at src/output_object.cpp:53).
"""

from __future__ import annotations

import numpy as np

Box = tuple  # (xmin, ymin, xmax, ymax)


def clip_point(x: float, y: float, box: Box) -> bool:
    """G7: boost::geometry::within for a point vs box is exclusive of the
    boundary (reference: src/output_object.cpp:26)."""
    xmin, ymin, xmax, ymax = box
    return (xmin < x < xmax) and (ymin < y < ymax)


def clip_points_mask(xs, ys, box: Box) -> np.ndarray:
    xmin, ymin, xmax, ymax = box
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    return (xs > xmin) & (xs < xmax) & (ys > ymin) & (ys < ymax)


def _clip_t(p: float, q: float, t0: float, t1: float):
    """Liang-Barsky parameter update for one boundary. Returns (t0, t1, ok)."""
    if p == 0.0:
        return t0, t1, q >= 0.0
    r = q / p
    if p < 0.0:
        if r > t1:
            return t0, t1, False
        if r > t0:
            t0 = r
    else:
        if r < t0:
            return t0, t1, False
        if r < t1:
            t1 = r
    return t0, t1, True


def clip_line(xs: np.ndarray, ys: np.ndarray, box: Box) -> list:
    """G8: linestring ∩ box -> list of (xs, ys) pieces (multilinestring).

    Liang-Barsky per segment; consecutive surviving segments whose
    endpoints chain are merged into one piece, matching
    boost::geometry::intersection's output topology
    (reference: src/output_object.cpp:33-37).
    """
    xmin, ymin, xmax, ymax = box
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    pieces = []
    cur_x: list = []
    cur_y: list = []
    for i in range(len(xs) - 1):
        x0, y0, x1, y1 = xs[i], ys[i], xs[i + 1], ys[i + 1]
        dx, dy = x1 - x0, y1 - y0
        t0, t1 = 0.0, 1.0
        ok = True
        for p, q in ((-dx, x0 - xmin), (dx, xmax - x0), (-dy, y0 - ymin), (dy, ymax - y0)):
            t0, t1, good = _clip_t(p, q, t0, t1)
            if not good:
                ok = False
                break
        if not ok or t0 > t1:
            if cur_x:
                pieces.append((np.array(cur_x), np.array(cur_y)))
                cur_x, cur_y = [], []
            continue
        cx0, cy0 = x0 + t0 * dx, y0 + t0 * dy
        cx1, cy1 = x0 + t1 * dx, y0 + t1 * dy
        if cur_x and cur_x[-1] == cx0 and cur_y[-1] == cy0:
            cur_x.append(cx1)
            cur_y.append(cy1)
        else:
            if cur_x:
                pieces.append((np.array(cur_x), np.array(cur_y)))
            cur_x = [cx0, cx1]
            cur_y = [cy0, cy1]
        if t1 < 1.0:  # exits the box — close the piece
            pieces.append((np.array(cur_x), np.array(cur_y)))
            cur_x, cur_y = [], []
    if cur_x:
        pieces.append((np.array(cur_x), np.array(cur_y)))
    # degenerate single-point pieces are useless downstream (encoder drops
    # <2-pt strings anyway, reference: src/write_geometry.cpp:94)
    return [(px, py) for px, py in pieces if len(px) >= 2]


def ring_within_box(xs: np.ndarray, ys: np.ndarray, box: Box) -> bool:
    """Fast path: whole ring inside box (reference: src/output_object.cpp:53)."""
    xmin, ymin, xmax, ymax = box
    return bool((xs >= xmin).all() and (xs <= xmax).all()
                and (ys >= ymin).all() and (ys <= ymax).all())


def clip_ring(xs: np.ndarray, ys: np.ndarray, box: Box):
    """G9: Sutherland-Hodgman of one ring against the rectangle.

    Returns (xs, ys) of the clipped ring (closed: first==last) or None
    if nothing remains. Exact for a convex clip window; fills the role
    of the reference's Clipper ctIntersection even-odd
    (src/output_object.cpp:62-68) for box clipping.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    # drop explicit closing vertex for the algorithm
    if len(xs) >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    xmin, ymin, xmax, ymax = box

    def clip_edge(px, py, inside, intersect):
        if len(px) == 0:
            return px, py
        nx, ny = [], []
        n = len(px)
        for i in range(n):
            cx, cy = px[i], py[i]
            pxp, pyp = px[i - 1], py[i - 1]
            cin, pin = inside(cx, cy), inside(pxp, pyp)
            if cin:
                if not pin:
                    ix, iy = intersect(pxp, pyp, cx, cy)
                    nx.append(ix)
                    ny.append(iy)
                nx.append(cx)
                ny.append(cy)
            elif pin:
                ix, iy = intersect(pxp, pyp, cx, cy)
                nx.append(ix)
                ny.append(iy)
        return nx, ny

    def ix_left(x0, y0, x1, y1):
        t = (xmin - x0) / (x1 - x0)
        return xmin, y0 + t * (y1 - y0)

    def ix_right(x0, y0, x1, y1):
        t = (xmax - x0) / (x1 - x0)
        return xmax, y0 + t * (y1 - y0)

    def ix_bot(x0, y0, x1, y1):
        t = (ymin - y0) / (y1 - y0)
        return x0 + t * (x1 - x0), ymin

    def ix_top(x0, y0, x1, y1):
        t = (ymax - y0) / (y1 - y0)
        return x0 + t * (x1 - x0), ymax

    px, py = list(xs), list(ys)
    px, py = clip_edge(px, py, lambda x, y: x >= xmin, ix_left)
    px, py = clip_edge(px, py, lambda x, y: x <= xmax, ix_right)
    px, py = clip_edge(px, py, lambda x, y: y >= ymin, ix_bot)
    px, py = clip_edge(px, py, lambda x, y: y <= ymax, ix_top)
    if len(px) < 3:
        return None
    px.append(px[0])
    py.append(py[0])
    return np.array(px, dtype=np.float64), np.array(py, dtype=np.float64)
