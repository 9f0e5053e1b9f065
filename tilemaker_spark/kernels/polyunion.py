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
# (documented cap — a degenerate mega-run can't stall an executor)
MAX_UNION_SEGMENTS = 20000
# candidate-pair guard: bbox-overlapping cross-polygon pairs beyond this
# (near-coincident mega-inputs) also fall back — keeps the split stage
# O(pairs) with pairs bounded, never O(S^2) blind. Pairs are processed
# in fixed-size chunks, so this caps TIME; memory stays O(_PAIR_CHUNK).
MAX_UNION_PAIRS = 20_000_000
# pairs processed per vectorized chunk (bounds peak memory to O(chunk))
_PAIR_CHUNK = 262_144
# parity-matrix cells (points x segments) per chunk
_PARITY_CHUNK = 4_000_000

# observability: open (non-closing) chains dropped by _stitch since
# module load — silent area loss is detectable (ADVICE round 2)
STITCH_OPEN_DROPS = 0

# set to a dict to capture internals (debug only)
_DEBUG = None


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

    # ---- candidate pairs: bbox overlap between different input polygons.
    # Sort-sweep on x (Clipper's scanbeam never materializes all pairs,
    # include/clipper.hpp — neither do we): for segment a in bxmin order,
    # candidates are the b > a with bxmin[b] <= bxmax[a]; enumerated in
    # fixed-size chunks so peak memory is O(_PAIR_CHUNK), never O(S^2).
    bxmin = np.minimum(sx0, sx1)
    bxmax = np.maximum(sx0, sx1)
    bymin = np.minimum(sy0, sy1)
    bymax = np.maximum(sy0, sy1)
    order = np.argsort(bxmin, kind="stable")
    oxmin = bxmin[order]
    ends = np.searchsorted(oxmin, bxmax[order], side="right")
    counts = np.maximum(ends - np.arange(S) - 1, 0)
    if int(counts.sum()) > MAX_UNION_PAIRS:
        return fallback

    # split points accumulated as flat arrays (seg index, x, y)
    sp_k: list = []
    sp_x: list = []
    sp_y: list = []

    def _emit_splits(kk, xx, yy):
        """Queue split points, dropping those equal to an endpoint."""
        at_end = (((xx == sx0[kk]) & (yy == sy0[kk]))
                  | ((xx == sx1[kk]) & (yy == sy1[kk])))
        keep = ~at_end
        if keep.any():
            sp_k.append(kk[keep])
            sp_x.append(xx[keep])
            sp_y.append(yy[keep])

    csum = np.concatenate(([0], np.cumsum(counts)))
    a_pos = 0
    while a_pos < S:
        # block of sweep positions whose total candidate count <= chunk
        stop = int(np.searchsorted(csum, csum[a_pos] + _PAIR_CHUNK, side="right"))
        stop = max(stop - 1, a_pos + 1)
        blk = np.arange(a_pos, min(stop, S))
        cnt = counts[blk]
        a_pos = int(blk[-1]) + 1
        tot = int(cnt.sum())
        if tot == 0:
            continue
        ai = np.repeat(blk, cnt)
        offs = np.arange(tot) - np.repeat(csum[blk] - csum[blk[0]], cnt)
        bi = ai + 1 + offs
        pi = order[ai]
        pj = order[bi]
        m = ((spid[pi] != spid[pj])
             & (bymin[pi] <= bymax[pj]) & (bymin[pj] <= bymax[pi]))
        pi, pj = pi[m], pj[m]
        if not len(pi):
            continue

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

        # proper (non-parallel) crossings — fully vectorized
        nonpar = denom != 0.0
        if nonpar.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.where(nonpar, t_num / denom, -1.0)
                u = np.where(nonpar, u_num / denom, -1.0)
            hitm = nonpar & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
            if hitm.any():
                hx = np.rint(ax[hitm] + t[hitm] * r_x[hitm]).astype(np.int64)
                hy = np.rint(ay[hitm] + t[hitm] * r_y[hitm]).astype(np.int64)
                _emit_splits(pi[hitm], hx, hy)
                _emit_splits(pj[hitm], hx, hy)

        # collinear overlaps: split each at the other's covered endpoints
        col = (~nonpar) & (t_num == 0.0) & (u_num == 0.0)
        if col.any():
            ci, cj = pi[col], pj[col]
            for kk, oth in ((ci, cj), (cj, ci)):
                kxmin, kxmax = bxmin[kk], bxmax[kk]
                kymin, kymax = bymin[kk], bymax[kk]
                for ex, ey in ((sx0[oth], sy0[oth]), (sx1[oth], sy1[oth])):
                    inb = ((kxmin <= ex) & (ex <= kxmax)
                           & (kymin <= ey) & (ey <= kymax))
                    if inb.any():
                        _emit_splits(kk[inb], ex[inb], ey[inb])

    # ---- sub-segments: bulk-copy unsplit segments (the overwhelming
    # majority), walk only the split ones in Python (O(#intersections))
    if sp_k:
        kall = np.concatenate(sp_k)
        xall = np.concatenate(sp_x)
        yall = np.concatenate(sp_y)
        so = np.argsort(kall, kind="stable")
        kall, xall, yall = kall[so], xall[so], yall[so]
        uk, kstart = np.unique(kall, return_index=True)
        kend = np.concatenate((kstart[1:], [len(kall)]))
    else:
        uk = np.empty(0, dtype=np.int64)
        kstart = kend = uk
    px0, py0, px1, py1, ppid = [], [], [], [], []  # array pieces, in k order

    def _bulk(lo, hi):
        if hi > lo:
            px0.append(sx0[lo:hi])
            py0.append(sy0[lo:hi])
            px1.append(sx1[lo:hi])
            py1.append(sy1[lo:hi])
            ppid.append(spid[lo:hi])

    prev = 0
    for ui in range(len(uk)):
        k = int(uk[ui])
        _bulk(prev, k)
        prev = k + 1
        x0k, y0k = int(sx0[k]), int(sy0[k])
        pts = [(x0k, y0k)]
        mids = {(int(x), int(y))
                for x, y in zip(xall[kstart[ui]:kend[ui]], yall[kstart[ui]:kend[ui]])}
        pts.extend(sorted(mids, key=lambda p: (p[0] - x0k) ** 2 + (p[1] - y0k) ** 2))
        pts.append((int(sx1[k]), int(sy1[k])))
        seg_pts = [(a, b) for a, b in zip(pts[:-1], pts[1:]) if a != b]
        if seg_pts:
            px0.append(np.array([a[0] for a, _ in seg_pts], dtype=np.int64))
            py0.append(np.array([a[1] for a, _ in seg_pts], dtype=np.int64))
            px1.append(np.array([b[0] for _, b in seg_pts], dtype=np.int64))
            py1.append(np.array([b[1] for _, b in seg_pts], dtype=np.int64))
            ppid.append(np.full(len(seg_pts), spid[k], dtype=spid.dtype))
    _bulk(prev, S)
    ssx0 = np.concatenate(px0).astype(np.float64)
    ssy0 = np.concatenate(py0).astype(np.float64)
    ssx1 = np.concatenate(px1).astype(np.float64)
    ssy1 = np.concatenate(py1).astype(np.float64)
    sspid = np.concatenate(ppid)
    # a near-coincident mega-overlap (every ring crossing every other)
    # can explode the arrangement; the parity stage is O(pieces x
    # overlapping-region pieces), so cap the piece count like the
    # segment count — degenerate inputs get the documented fallback
    if len(ssx0) > 3 * MAX_UNION_SEGMENTS:
        return fallback

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

    # parity is ray-cast against the SNAPPED sub-segment geometry, not
    # the original segments: a rounded crossing point sits up to ~0.7
    # grid units off the original line, which would defeat the +/-0.25
    # sampling — against the pieced boundary the midpoint is exactly on
    # its own piece, so the two samples always straddle it (Clipper
    # likewise operates wholly on snapped integer geometry,
    # include/clipper.hpp). Each region's pieced boundary remains a
    # closed loop (splits preserve connectivity), so even-odd parity is
    # well-defined.
    npoly = len(polys)
    left_in = combine(_inside_matrix(lx, ly, ssx0, ssy0, ssx1, ssy1, sspid, npoly))
    right_in = combine(_inside_matrix(rx, ry, ssx0, ssy0, ssx1, ssy1, sspid, npoly))
    if _DEBUG is not None:
        _DEBUG.update(ss=(ssx0, ssy0, ssx1, ssy1, sspid),
                      seg=(sx0, sy0, sx1, sy1, spid),
                      left_in=left_in, right_in=right_in)
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
    Returns a (n_points, n_regions) bool matrix.

    Sparse evaluation: a +x ray cast can only cross a region's boundary
    if the point's y lies within the region's y-range and its x is left
    of the region's xmax — so each region ray-casts only its bbox
    candidates (O(sum_r |cand_r| * |segs_r|), which for many small
    disjoint regions is near-linear instead of O(P*S)). The inner
    points-x-segments product is chunked to bound peak memory."""
    P = len(px)
    S = len(sx0)
    inside = np.zeros((P, npoly), dtype=bool)
    if P == 0 or S == 0:
        return inside
    # spid is nondecreasing by construction (rings appended per region)
    pids = np.arange(npoly)
    r_lo = np.searchsorted(spid, pids, side="left")
    r_hi = np.searchsorted(spid, pids, side="right")
    for pid in range(npoly):
        s, e = int(r_lo[pid]), int(r_hi[pid])
        if s == e:
            continue
        x0 = sx0[s:e].astype(np.float64)
        y0 = sy0[s:e].astype(np.float64)
        x1 = sx1[s:e].astype(np.float64)
        y1 = sy1[s:e].astype(np.float64)
        rymin = min(y0.min(), y1.min())
        rymax = max(y0.max(), y1.max())
        rxmax = max(x0.max(), x1.max())
        cand = np.nonzero((py >= rymin) & (py <= rymax) & (px <= rxmax))[0]
        if not len(cand):
            continue
        ns = e - s
        block = max(1, _PARITY_CHUNK // ns)
        for lo in range(0, len(cand), block):
            ci = cand[lo:lo + block]
            pxc = px[ci, None]
            pyc = py[ci, None]
            crosses = (y0[None, :] > pyc) != (y1[None, :] > pyc)
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (pyc - y0[None, :]) / (y1[None, :] - y0[None, :])
                xint = x0[None, :] + t * (x1[None, :] - x0[None, :])
            hit = crosses & (pxc < xint)
            inside[ci, pid] = (hit.sum(axis=1) % 2).astype(bool)
    return inside


def _stitch(segs):
    """Chain directed segments into closed rings; at multi-way vertices
    take the leftmost (most counter-clockwise) continuation so touching
    rings separate deterministically.

    A chain that fails to close releases its consumed segments back to
    the pool (so a locally-unbalanced start can't silently eat another
    ring's segments — ADVICE round 2) and the walk retries from later
    starts; chains that still never close are counted in
    STITCH_OPEN_DROPS for observability."""
    global STITCH_OPEN_DROPS
    from collections import defaultdict
    by_start = defaultdict(list)
    for si, (a, b, c, d) in enumerate(segs):
        by_start[(a, b)].append(si)
    used = [False] * len(segs)
    rings = []
    open_starts = set()
    for start_i in range(len(segs)):
        if used[start_i] or start_i in open_starts:
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
        else:
            # release the whole chain; never re-START from this segment
            # (it provably dead-ends) but leave it available as a
            # continuation for other chains
            for si in chain:
                used[si] = False
            open_starts.add(start_i)
    STITCH_OPEN_DROPS += sum(1 for si in open_starts if not used[si])
    return rings
