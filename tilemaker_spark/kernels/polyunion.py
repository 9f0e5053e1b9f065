"""Even-odd multipolygon union (G15) — the --combine merge kernel.

Re-expresses the reference's Clipper ctUnion/pftEvenOdd merge
(src/tile_worker.cpp:21-64, src/helpers.cpp:108-230: coordinates
snapped to a 1e8 integer grid, even-odd fill, pairwise-accumulated
union) with a segment-selection boolean:

  1. snap all rings to an integer grid (1e8 per degree like the
     reference, capped so cross products stay exact in int64/float64);
  2. split every segment at its intersections / collinear overlaps with
     segments of OTHER input polygons (same rounded split point inserted
     into both, so stitching is exact integer endpoint matching);
  3. keep a sub-segment iff exactly one side of its midpoint is inside
     the union of the even-odd regions (vectorized ray-cast parity per
     input polygon), oriented with the interior on the left;
  4. dedupe identical directed sub-segments (coincident boundaries),
     stitch chains by endpoint with a leftmost-turn rule, classify
     output rings by orientation (CCW = outer under interior-on-left),
     and assign holes to their smallest enclosing outer.

Pure numpy + int arithmetic; deterministic. Degenerate inputs beyond
the snap resolution (boundaries closer than ~1e-4 pixel) may classify
a sliver inconsistently — same class of tolerance Clipper's integer
snapping has.
"""

from __future__ import annotations

import numpy as np

from . import geomops

# reference grid: src/helpers.cpp:108 (CLIPPER_SCALE = 1e8)
BASE_SCALE = 1e8
# keep |coord| <= 2^25 after origin shift so every cross product in the
# intersection / side tests is exact in int64 AND float64
MAX_COORD = float(1 << 25)
# scale guard: beyond this many segments fall back to concatenation
# (documented cap — a degenerate mega-run can't go O(S^2))
MAX_UNION_SEGMENTS = 20000


def union_polygons(polys):
    """polys: list of polygons, each a list of closed (xs, ys)
    float-degree rings (ring 0 outer, winding already corrected).
    Returns the region union in the same structure. Falls back to the
    input (concatenation semantics) past MAX_UNION_SEGMENTS."""
    return boolean_regions(polys, lambda m: m.any(axis=1), fallback=polys)


def clip_polygons_exact(polys, box):
    """G9 exact multipolygon ∩ box under even-odd semantics — the
    Vatti/Clipper-equivalent path (reference ctIntersection,
    src/output_object.cpp:62-68) used when per-ring Sutherland-Hodgman
    is unsound (a hole split by the clip boundary). The box becomes one
    more even-odd region; combine = (union of polygon regions) AND box."""
    xmin, ymin, xmax, ymax = box
    box_ring = (np.array([xmin, xmax, xmax, xmin, xmin], dtype=np.float64),
                np.array([ymin, ymin, ymax, ymax, ymin], dtype=np.float64))
    regions = list(polys) + [[box_ring]]
    np_ = len(polys)

    def combine(m):
        return m[:, :np_].any(axis=1) & m[:, np_]

    # fallback None: caller falls back to per-ring Sutherland-Hodgman
    return boolean_regions(regions, combine, fallback=None)


def boolean_regions(polys, combine, fallback):
    """Segment-selection boolean over even-odd regions. ``polys`` is a
    list of regions (each a list of closed float rings); ``combine``
    maps the per-point (P, n_regions) parity matrix to the compound
    region membership. Returns the compound region's polygons."""
    rings = []   # (pid, int_xs, int_ys) open rings
    all_x = []
    all_y = []
    for pid, rs in enumerate(polys):
        for xs, ys in rs:
            all_x.append(np.asarray(xs, dtype=np.float64))
            all_y.append(np.asarray(ys, dtype=np.float64))
    if not all_x:
        return []
    ox = min(a.min() for a in all_x)
    oy = min(a.min() for a in all_y)
    span = max(max(a.max() for a in all_x) - ox,
               max(a.max() for a in all_y) - oy, 1e-12)
    scale = min(BASE_SCALE, MAX_COORD / span)

    for pid, rs in enumerate(polys):
        for xs, ys in rs:
            ix = np.rint((np.asarray(xs, dtype=np.float64) - ox) * scale).astype(np.int64)
            iy = np.rint((np.asarray(ys, dtype=np.float64) - oy) * scale).astype(np.int64)
            if len(ix) >= 2 and ix[0] == ix[-1] and iy[0] == iy[-1]:
                ix, iy = ix[:-1], iy[:-1]
            # drop snap-duplicates
            keep = np.concatenate(([True], (ix[1:] != ix[:-1]) | (iy[1:] != iy[:-1])))
            ix, iy = ix[keep], iy[keep]
            if len(ix) >= 3:
                rings.append((pid, ix, iy))
    if not rings:
        return []

    # ---- segment soup
    sx0 = np.concatenate([ix for _, ix, _ in rings])
    sy0 = np.concatenate([iy for _, _, iy in rings])
    sx1 = np.concatenate([np.roll(ix, -1) for _, ix, _ in rings])
    sy1 = np.concatenate([np.roll(iy, -1) for _, _, iy in rings])
    spid = np.concatenate([np.full(len(ix), pid) for pid, ix, _ in rings])
    nz = (sx0 != sx1) | (sy0 != sy1)
    sx0, sy0, sx1, sy1, spid = sx0[nz], sy0[nz], sx1[nz], sy1[nz], spid[nz]
    S = len(sx0)
    if S > MAX_UNION_SEGMENTS:
        return fallback

    # ---- candidate pairs: bbox overlap between different input polygons
    bxmin = np.minimum(sx0, sx1)
    bxmax = np.maximum(sx0, sx1)
    bymin = np.minimum(sy0, sy1)
    bymax = np.maximum(sy0, sy1)
    ii, jj = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
    cand = ((ii < jj) & (spid[ii] != spid[jj])
            & (bxmin[ii] <= bxmax[jj]) & (bxmin[jj] <= bxmax[ii])
            & (bymin[ii] <= bymax[jj]) & (bymin[jj] <= bymax[ii]))
    pi, pj = np.nonzero(cand)

    splits: dict = {}  # seg index -> list of (x, y) split points

    def add_split(k, x, y):
        if (x == sx0[k] and y == sy0[k]) or (x == sx1[k] and y == sy1[k]):
            return
        splits.setdefault(int(k), []).append((int(x), int(y)))

    if len(pi):
        ax, ay = sx0[pi].astype(np.float64), sy0[pi].astype(np.float64)
        bx, by = sx1[pi].astype(np.float64), sy1[pi].astype(np.float64)
        cxx, cyy = sx0[pj].astype(np.float64), sy0[pj].astype(np.float64)
        dxx, dyy = sx1[pj].astype(np.float64), sy1[pj].astype(np.float64)
        r_x, r_y = bx - ax, by - ay
        s_x, s_y = dxx - cxx, dyy - cyy
        denom = r_x * s_y - r_y * s_x           # exact (|coords| <= 2^25)
        qp_x, qp_y = cxx - ax, cyy - ay
        t_num = qp_x * s_y - qp_y * s_x
        u_num = qp_x * r_y - qp_y * r_x
        for m in range(len(pi)):
            i, j = int(pi[m]), int(pj[m])
            if denom[m] != 0.0:
                t = t_num[m] / denom[m]
                u = u_num[m] / denom[m]
                if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
                    x = int(round(ax[m] + t * r_x[m]))
                    y = int(round(ay[m] + t * r_y[m]))
                    add_split(i, x, y)
                    add_split(j, x, y)
            elif t_num[m] == 0.0 and u_num[m] == 0.0:
                # collinear: split each at the other's interior endpoints
                for k, (ex0, ey0, ex1, ey1) in ((i, (sx0[j], sy0[j], sx1[j], sy1[j])),
                                                (j, (sx0[i], sy0[i], sx1[i], sy1[i]))):
                    for ex, ey in ((ex0, ey0), (ex1, ey1)):
                        if (min(sx0[k], sx1[k]) <= ex <= max(sx0[k], sx1[k])
                                and min(sy0[k], sy1[k]) <= ey <= max(sy0[k], sy1[k])):
                            add_split(k, ex, ey)

    # ---- sub-segments
    ssx0, ssy0, ssx1, ssy1 = [], [], [], []
    for k in range(S):
        pts = [(int(sx0[k]), int(sy0[k]))]
        if k in splits:
            mids = sorted(set(splits[k]),
                          key=lambda p: (p[0] - pts[0][0]) ** 2 + (p[1] - pts[0][1]) ** 2)
            pts.extend(mids)
        pts.append((int(sx1[k]), int(sy1[k])))
        for a, b in zip(pts[:-1], pts[1:]):
            if a != b:
                ssx0.append(a[0])
                ssy0.append(a[1])
                ssx1.append(b[0])
                ssy1.append(b[1])
    ssx0 = np.asarray(ssx0, dtype=np.float64)
    ssy0 = np.asarray(ssy0, dtype=np.float64)
    ssx1 = np.asarray(ssx1, dtype=np.float64)
    ssy1 = np.asarray(ssy1, dtype=np.float64)

    # ---- parity sampling: midpoint +/- eps along the left normal
    mx = (ssx0 + ssx1) / 2.0
    my = (ssy0 + ssy1) / 2.0
    dx = ssx1 - ssx0
    dy = ssy1 - ssy0
    ln = np.hypot(dx, dy)
    nxl = -dy / ln
    nyl = dx / ln
    eps = 0.25
    lx, ly = mx + eps * nxl, my + eps * nyl      # left sample
    rx, ry = mx - eps * nxl, my - eps * nyl      # right sample

    npoly = len(polys)
    left_in = combine(_inside_matrix(lx, ly, sx0, sy0, sx1, sy1, spid, npoly))
    right_in = combine(_inside_matrix(rx, ry, sx0, sy0, sx1, sy1, spid, npoly))
    keep = left_in != right_in
    # orient interior-on-left
    flip = keep & right_in
    fx0 = np.where(flip, ssx1, ssx0)[keep]
    fy0 = np.where(flip, ssy1, ssy0)[keep]
    fx1 = np.where(flip, ssx0, ssx1)[keep]
    fy1 = np.where(flip, ssy0, ssy1)[keep]

    # dedupe identical directed segments (coincident boundaries)
    seen = set()
    segs = []
    for a, b, c, d in zip(fx0.astype(np.int64), fy0.astype(np.int64),
                          fx1.astype(np.int64), fy1.astype(np.int64)):
        key = (int(a), int(b), int(c), int(d))
        if key not in seen:
            seen.add(key)
            segs.append(key)

    out_rings = _stitch(segs)

    # ---- classify + assign holes; back to float degrees
    outers = []
    holes = []
    for ring in out_rings:
        xs = np.array([p[0] for p in ring], dtype=np.float64)
        ys = np.array([p[1] for p in ring], dtype=np.float64)
        a = geomops.signed_area(xs, ys)
        if a == 0.0:
            continue
        if a > 0.0:
            outers.append((xs, ys, a))
        else:
            holes.append((xs, ys))
    result = []
    assign = [[] for _ in outers]
    for hxs, hys in holes:
        best = -1
        best_area = None
        for oi, (oxs, oys, oa) in enumerate(outers):
            if geomops.points_in_ring(hxs[:1], hys[:1], oxs, oys)[0]:
                if best_area is None or oa < best_area:
                    best, best_area = oi, oa
        if best >= 0:
            assign[best].append((hxs, hys))
    inv = 1.0 / scale
    for oi, (oxs, oys, _) in enumerate(outers):
        # pipeline convention: outers clockwise, holes counter-clockwise
        # (geomops.correct_winding / boost geom::correct)
        rs = [_close(oxs[::-1] * inv + ox, oys[::-1] * inv + oy)]
        for hxs, hys in assign[oi]:
            rs.append(_close(hxs[::-1] * inv + ox, hys[::-1] * inv + oy))
        result.append(rs)
    return result


def _close(xs, ys):
    return (np.concatenate((xs, xs[:1])), np.concatenate((ys, ys[:1])))


def _inside_matrix(px, py, sx0, sy0, sx1, sy1, spid, npoly) -> np.ndarray:
    """Per sample point and per region: even-odd parity membership.
    Vectorized ray cast (points x segments), parity folded per region
    id; returns a (n_points, n_regions) bool matrix."""
    P = len(px)
    inside = np.zeros((P, npoly), dtype=bool)
    x0 = sx0.astype(np.float64)[None, :]
    y0 = sy0.astype(np.float64)[None, :]
    x1 = sx1.astype(np.float64)[None, :]
    y1 = sy1.astype(np.float64)[None, :]
    pxc = px[:, None]
    pyc = py[:, None]
    crosses = (y0 > pyc) != (y1 > pyc)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (pyc - y0) / (y1 - y0)
        xint = x0 + t * (x1 - x0)
    hit = crosses & (pxc < xint)
    for pid in range(npoly):
        cols = spid == pid
        if cols.any():
            inside[:, pid] = (hit[:, cols].sum(axis=1) % 2).astype(bool)
    return inside


def _stitch(segs):
    """Chain directed segments into closed rings; at multi-way vertices
    take the leftmost (most counter-clockwise) continuation so touching
    rings separate deterministically."""
    from collections import defaultdict
    by_start = defaultdict(list)
    for si, (a, b, c, d) in enumerate(segs):
        by_start[(a, b)].append(si)
    used = [False] * len(segs)
    rings = []
    for start_i in range(len(segs)):
        if used[start_i]:
            continue
        chain = [start_i]
        used[start_i] = True
        a0, b0, c, d = segs[start_i]
        ring = [(a0, b0)]
        cur = (c, d)
        prev_dir = (c - a0, d - b0)
        closed = False
        while True:
            if cur == (a0, b0):
                closed = True
                break
            cands = [si for si in by_start.get(cur, []) if not used[si]]
            if not cands:
                break
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # leftmost turn relative to incoming direction
                def turn_key(si):
                    _, _, cc, dd = segs[si]
                    vx, vy = cc - cur[0], dd - cur[1]
                    cross = prev_dir[0] * vy - prev_dir[1] * vx
                    dot = prev_dir[0] * vx + prev_dir[1] * vy
                    import math
                    return -math.atan2(cross, dot)
                nxt = min(cands, key=turn_key)
            used[nxt] = True
            chain.append(nxt)
            ring.append(cur)
            _, _, cc, dd = segs[nxt]
            prev_dir = (cc - cur[0], dd - cur[1])
            cur = (cc, dd)
        if closed and len(ring) >= 3:
            rings.append(ring)
    return rings
