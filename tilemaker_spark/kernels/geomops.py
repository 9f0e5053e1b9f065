"""Geometry scalar ops: area, length, centroid, winding, point-in-polygon,
and multipolygon ring assembly (G11-G15, J2, A6, A7).

All pure numpy float64 / int64; no Spark imports.
"""

from __future__ import annotations

import numpy as np

from . import mercator as M


def signed_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Shoelace signed area of a ring (closed or open; closure implied).
    Positive = counter-clockwise in (lon, latp) space."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    if len(xs) < 3:
        return 0.0
    x2 = np.roll(xs, -1)
    y2 = np.roll(ys, -1)
    return 0.5 * float(np.sum(xs * y2 - x2 * ys))


def correct_winding(xs: np.ndarray, ys: np.ndarray, outer: bool):
    """G11: boost convention — outer rings clockwise, inners counter-clockwise
    (reference: geom::correct at include/osm_store.h:254, src/helpers.cpp:229-231).
    Returns possibly-reversed copies."""
    a = signed_area(xs, ys)
    cw = a < 0.0
    if (outer and cw) or (not outer and not cw):
        return xs, ys
    return xs[::-1].copy(), ys[::-1].copy()


def remove_spikes(xs: np.ndarray, ys: np.ndarray):
    """G12 validity repair: drop consecutive duplicate vertices and
    180-degree spike vertices (out-and-back along the same line), like
    boost geom::remove_spikes as the reference applies on polygon ingest
    (src/read_shp.cpp:214-225). Iterates to a fixpoint (removing a spike
    can expose another). Returns a closed (xs, ys) ring or None if the
    ring degenerates below a triangle."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]

    def _dup_mask(x, y, n):
        m = np.empty(n, dtype=bool)
        m[0] = (x[0] == x[-1]) and (y[0] == y[-1])
        np.equal(x[1:], x[:-1], out=m[1:])
        m[1:] &= y[1:] == y[:-1]
        return m

    def _spike_mask(x, y, n):
        # u = p[i] - p[i-1], v = p[i+1] - p[i]  (cyclic, slice-built —
        # np.roll's fancy-index machinery measured 4x the cost)
        ux = x - np.concatenate((x[-1:], x[:-1]))
        uy = y - np.concatenate((y[-1:], y[:-1]))
        vx = np.concatenate((ux[1:], ux[:1]))
        vy = np.concatenate((uy[1:], uy[:1]))
        return (ux * vy - uy * vx == 0.0) & (ux * vx + uy * vy < 0.0)

    n = len(xs)
    if n < 3:
        return None
    # fast path: clean ring (the overwhelmingly common case) returns
    # with two vectorized checks and no rebuild loop
    if not _dup_mask(xs, ys, n).any() and not _spike_mask(xs, ys, n).any():
        return (np.concatenate((xs, xs[:1])), np.concatenate((ys, ys[:1])))

    changed = True
    while changed:
        changed = False
        n = len(xs)
        if n < 3:
            return None
        dup = _dup_mask(xs, ys, n)
        if dup.any():
            xs, ys = xs[~dup], ys[~dup]
            changed = True
            continue
        spike = _spike_mask(xs, ys, len(xs))
        if spike.any():
            xs, ys = xs[~spike], ys[~spike]
            changed = True
    if len(xs) < 3:
        return None
    return (np.concatenate((xs, xs[:1])), np.concatenate((ys, ys[:1])))


def ring_centroid(xs: np.ndarray, ys: np.ndarray):
    """Area-weighted centroid of one ring (standard polygon centroid)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    if len(xs) < 3:
        return float(np.mean(xs)), float(np.mean(ys))
    x2 = np.roll(xs, -1)
    y2 = np.roll(ys, -1)
    cross = xs * y2 - x2 * ys
    a = np.sum(cross) / 2.0
    if a == 0.0:
        return float(np.mean(xs)), float(np.mean(ys))
    cx = float(np.sum((xs + x2) * cross) / (6.0 * a))
    cy = float(np.sum((ys + y2) * cross) / (6.0 * a))
    return cx, cy


def multipolygon_centroid(rings_per_poly):
    """A6 centroid of a multipolygon: area-weighted over outer rings minus
    holes (reference: geom::centroid at src/osm_lua_processing.cpp:304-309).
    ``rings_per_poly`` = list of polygons, each a list of (xs, ys) rings,
    ring 0 = exterior."""
    num_x = num_y = den = 0.0
    for rings in rings_per_poly:
        for i, (xs, ys) in enumerate(rings):
            a = signed_area(xs, ys)
            cx, cy = ring_centroid(xs, ys)
            # holes have opposite orientation -> opposite-signed area,
            # which subtracts naturally when orientations are corrected
            num_x += cx * a
            num_y += cy * a
            den += a
    if den == 0.0:
        # degenerate: fall back to mean of first ring
        xs, ys = rings_per_poly[0][0]
        return float(np.mean(xs)), float(np.mean(ys))
    return num_x / den, num_y / den


def line_length_degp(xs: np.ndarray, ys: np.ndarray) -> float:
    """Euclidean length in projected-degree space."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    return float(np.sum(np.hypot(np.diff(xs), np.diff(ys))))


def line_length_meters(xs: np.ndarray, ys: np.ndarray) -> float:
    """A7 Length(): per-segment degp2meter at segment-start latp, summed
    (reference: src/osm_lua_processing.cpp:156-163 computes geom::length in
    degrees then scales; we scale per segment at its mean latp for accuracy
    — documented divergence, both deterministic)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) < 2:
        return 0.0
    seg = np.hypot(np.diff(xs), np.diff(ys))
    mid = (ys[:-1] + ys[1:]) / 2.0
    return float(np.sum(M.degp2meter(seg, mid)))


def ring_area_meters2(xs: np.ndarray, ys: np.ndarray) -> float:
    """A7 Area(): shoelace in degp scaled to meters^2 at the ring's mean latp."""
    a = abs(signed_area(xs, ys))
    mean_latp = float(np.mean(np.asarray(ys, dtype=np.float64)))
    scale = float(M.degp2meter(1.0, mean_latp))
    return a * scale * scale


def points_in_ring(pxs: np.ndarray, pys: np.ndarray, rxs: np.ndarray, rys: np.ndarray) -> np.ndarray:
    """G13: vectorized even-odd ray casting — for each point, is it inside
    the ring? Boundary points are implementation-defined (consistent,
    deterministic). Vectorized over points x ring edges."""
    pxs = np.asarray(pxs, dtype=np.float64)
    pys = np.asarray(pys, dtype=np.float64)
    rxs = np.asarray(rxs, dtype=np.float64)
    rys = np.asarray(rys, dtype=np.float64)
    if len(rxs) >= 2 and rxs[0] == rxs[-1] and rys[0] == rys[-1]:
        rxs, rys = rxs[:-1], rys[:-1]
    n = len(rxs)
    inside = np.zeros(len(pxs), dtype=bool)
    x1, y1 = rxs, rys
    x2, y2 = np.roll(rxs, -1), np.roll(rys, -1)
    for i in range(n):
        a_y, b_y = y1[i], y2[i]
        a_x, b_x = x1[i], x2[i]
        crosses = (a_y > pys) != (b_y > pys)
        if not crosses.any():
            continue
        t = (pys - a_y) / (b_y - a_y)
        xint = a_x + t * (b_x - a_x)
        inside ^= crosses & (pxs < xint)
    return inside


def ring_within_ring(inner_xs, inner_ys, outer_xs, outer_ys) -> bool:
    """Approximate geom::within(inner, outer) as used for hole assignment
    (reference: include/osm_store.h:248): all inner vertices inside the
    outer ring. Adequate for well-formed OSM multipolygons."""
    if len(inner_xs) == 0:
        return False
    return bool(points_in_ring(np.asarray(inner_xs), np.asarray(inner_ys),
                               np.asarray(outer_xs), np.asarray(outer_ys)).all())


def assemble_rings(outer_ways: list, inner_ways: list):
    """J2: multipolygon ring assembly — faithful re-expression of the
    reference's fixpoint join (include/osm_store.h:186-239).

    ``outer_ways`` / ``inner_ways``: ordered lists of node-id numpy arrays
    (the *member order* of the relation, which the reference iterates —
    order-dependent greedy join; we preserve it for identical outputs).

    Returns (outer_rings, inner_rings_per_outer) where each ring is a
    node-id numpy array. Open inner ways are used as-is like the
    reference (it only ring-joins outers; inners are taken verbatim,
    include/osm_store.h:245-249).
    """
    outers: list = []
    done = [False] * len(outer_ways)
    if outer_ways:
        while True:
            added = 0
            for i, nodes in enumerate(outer_ways):
                if done[i]:
                    continue
                if len(nodes) >= 2 and nodes[0] == nodes[-1]:
                    outers.append(np.asarray(nodes, dtype=np.int64).copy())
                    added += 1
                    done[i] = True
                else:
                    nodes = np.asarray(nodes, dtype=np.int64)
                    j_first, j_last = nodes[0], nodes[-1]
                    joined = False
                    for k, o in enumerate(outers):
                        o_first, o_last = o[0], o[-1]
                        if j_first == j_last:
                            continue  # don't join already-closed
                        if o_last == j_first:
                            outers[k] = np.concatenate([o, nodes])
                            joined = True
                        elif o_last == j_last:
                            outers[k] = np.concatenate([o, nodes[::-1]])
                            joined = True
                        elif j_last == o_first:
                            outers[k] = np.concatenate([nodes, o])
                            joined = True
                        elif j_first == o_first:
                            outers[k] = np.concatenate([nodes[::-1], o])
                            joined = True
                        if joined:
                            break
                    if joined:
                        added += 1
                        done[i] = True
            if added == 0:
                # seed with one unallocated way (reference: osm_store.h:230-238)
                seeded = False
                for i, nodes in enumerate(outer_ways):
                    if not done[i]:
                        outers.append(np.asarray(nodes, dtype=np.int64).copy())
                        done[i] = True
                        seeded = True
                        break
                if not seeded:
                    break
            # loop again (reference reruns until no ways left)
            if all(done) :
                break
    inners = [np.asarray(w, dtype=np.int64) for w in inner_ways]
    return outers, inners
