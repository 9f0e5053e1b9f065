"""Feature -> tile-set assignment kernels (J5-J9).

Re-expresses the reference's tile rasterization:
- point tile:        src/coordinates.cpp:38-41 (J9)
- segment DDA walk:  include/coordinates.h:93-133 (J5, insertIntermediateTiles)
- scanline y-fill:   src/coordinates.cpp:52-67 (J6, fillCoveredTiles)
- bbox cover:        src/shp_mem_tiles.cpp:123-135 (J7)

All take float64 (lon, latp) degree arrays and return int64 (x, y)
pairs at the given zoom. Output tile ids are packed as
``tile_id = (x << 32) | y`` for compact shuffle keys.
"""

from __future__ import annotations

import numpy as np

from . import mercator as M


def pack_tile(x, y):
    """(x, y) -> single int64 key; x, y < 2^31 at any zoom <= 30."""
    return (np.asarray(x, dtype=np.int64) << 32) | np.asarray(y, dtype=np.int64)


def unpack_tile(tid):
    tid = np.asarray(tid, dtype=np.int64)
    return tid >> 32, tid & 0xFFFFFFFF


def point_tile(lon, latp, zoom: int):
    """J9: single tile per point (reference: src/coordinates.cpp:38-41)."""
    return M.lon2tilex(lon, zoom), M.latp2tiley(latp, zoom)


def segment_walk_tiles(lons: np.ndarray, latps: np.ndarray, zoom: int) -> np.ndarray:
    """J5: every tile a polyline's vertices and segment border-crossings touch.

    Faithful port of the reference DDA (include/coordinates.h:93-133):
    for each consecutive vertex pair, insert the vertex tile, then for
    every x-border crossed insert (x_cur, trunc(yf1 + (x_cur - xf1)*slope)),
    and for every y-border crossed the symmetric tile. Returns unique
    packed tile ids (the reference inserts into an unordered_set).
    """
    lons = np.asarray(lons, dtype=np.float64)
    latps = np.asarray(latps, dtype=np.float64)
    xf = M.lon2tilexf(lons, zoom)
    yf = M.latp2tileyf(latps, zoom)
    xi = np.trunc(xf).astype(np.int64)
    yi = np.trunc(yf).astype(np.int64)

    out = [pack_tile(xi, yi)]
    n = len(lons)
    if n >= 2:
        xf1, yf1 = xf[:-1], yf[:-1]
        x1, y1, x2, y2 = xi[:-1], yi[:-1], xi[1:], yi[1:]
        dx = xf[1:] - xf[:-1]
        dy = yf[1:] - yf[:-1]

        # X-border crossings (vectorized over segments, loop over steps)
        cross_x = x1 != x2
        if cross_x.any():
            idx = np.nonzero(cross_x)[0]
            sl = dy[idx] / dx[idx]
            xmin = np.minimum(x1[idx], x2[idx])
            xmax = np.maximum(x1[idx], x2[idx])
            steps = xmax - xmin  # number of borders per segment
            max_steps = int(steps.max())
            for k in range(1, max_steps + 1):
                sel = steps >= k
                xcur = xmin[sel] + k
                ycur = np.trunc(yf1[idx[sel]] + (xcur.astype(np.float64) - xf1[idx[sel]]) * sl[sel]).astype(np.int64)
                out.append(pack_tile(xcur, ycur))

        cross_y = y1 != y2
        if cross_y.any():
            idx = np.nonzero(cross_y)[0]
            sl = dx[idx] / dy[idx]
            ymin = np.minimum(y1[idx], y2[idx])
            ymax = np.maximum(y1[idx], y2[idx])
            steps = ymax - ymin
            max_steps = int(steps.max())
            for k in range(1, max_steps + 1):
                sel = steps >= k
                ycur = ymin[sel] + k
                xcur = np.trunc(xf1[idx[sel]] + (ycur.astype(np.float64) - yf1[idx[sel]]) * sl[sel]).astype(np.int64)
                out.append(pack_tile(xcur, ycur))

    return np.unique(np.concatenate(out))


def fill_covered_tiles(tile_ids: np.ndarray) -> np.ndarray:
    """J6: per x-column, fill every y between successive covered tiles.

    reference: src/coordinates.cpp:52-67 — note the reference fills
    between *consecutive entries in the sorted list* (all gaps in the
    column), not just min..max once.
    """
    tile_ids = np.unique(np.asarray(tile_ids, dtype=np.int64))  # sorted == (x, y) lexicographic
    if len(tile_ids) == 0:
        return tile_ids
    x, y = unpack_tile(tile_ids)
    same_col = x[1:] == x[:-1]
    gap = y[1:] - y[:-1]
    need = same_col & (gap > 1)
    if not need.any():
        return tile_ids
    fills = []
    for i in np.nonzero(need)[0]:
        ys = np.arange(y[i] + 1, y[i + 1], dtype=np.int64)
        fills.append(pack_tile(np.full(len(ys), x[i], dtype=np.int64), ys))
    return np.unique(np.concatenate([tile_ids] + fills))


def batched_segment_walk(lons: np.ndarray, latps: np.ndarray,
                         chain_ids: np.ndarray, zoom: int):
    """J5 over MANY concatenated chains in one vectorized pass.

    ``chain_ids`` labels each vertex; consecutive equal labels form a
    chain. Semantics per chain are identical to
    :func:`segment_walk_tiles` (vertex tiles + DDA border crossings,
    include/coordinates.h:93-133) but the step loop runs once over the
    whole batch instead of once per feature: segments are sorted by
    crossing count so iteration k touches only the suffix with >= k
    crossings — total work stays O(sum of crossings), with no
    per-feature Python dispatch.

    Returns ``(chain_out, tile_out)`` int64 arrays (NOT uniqued).
    """
    lons = np.asarray(lons, dtype=np.float64)
    latps = np.asarray(latps, dtype=np.float64)
    chain_ids = np.asarray(chain_ids, dtype=np.int64)
    xf = M.lon2tilexf(lons, zoom)
    yf = M.latp2tileyf(latps, zoom)
    xi = np.trunc(xf).astype(np.int64)
    yi = np.trunc(yf).astype(np.int64)

    out_t = [pack_tile(xi, yi)]
    out_c = [chain_ids]
    if len(lons) >= 2:
        same = chain_ids[1:] == chain_ids[:-1]
        s = np.nonzero(same)[0]  # indices of segment start vertices
        if len(s):
            sxf1, syf1 = xf[s], yf[s]
            sx1, sy1, sx2, sy2 = xi[s], yi[s], xi[s + 1], yi[s + 1]
            sdx = xf[s + 1] - xf[s]
            sdy = yf[s + 1] - yf[s]
            scid = chain_ids[s]

            def _axis(a1, a2, af1, bf1, d_num, d_den, swap):
                # crossings along one axis: for each border k between
                # min(a1,a2) and max(a1,a2), other coord = trunc(bf1 +
                # (border - af1) * slope)
                cross = a1 != a2
                if not cross.any():
                    return
                idx = np.nonzero(cross)[0]
                sl = d_num[idx] / d_den[idx]
                amin = np.minimum(a1[idx], a2[idx])
                amax = np.maximum(a1[idx], a2[idx])
                steps = amax - amin
                order = np.argsort(steps, kind="stable")
                idx, sl, amin = idx[order], sl[order], amin[order]
                steps_sorted = steps[order]
                max_steps = int(steps_sorted[-1])
                for k in range(1, max_steps + 1):
                    lo = np.searchsorted(steps_sorted, k, side="left")
                    ii = idx[lo:]
                    acur = amin[lo:] + k
                    bcur = np.trunc(bf1[ii] + (acur.astype(np.float64) - af1[ii]) * sl[lo:]).astype(np.int64)
                    if swap:
                        out_t.append(pack_tile(bcur, acur))
                    else:
                        out_t.append(pack_tile(acur, bcur))
                    out_c.append(scid[ii])

            _axis(sx1, sx2, sxf1, syf1, sdy, sdx, swap=False)
            _axis(sy1, sy2, syf1, sxf1, sdx, sdy, swap=True)

    return np.concatenate(out_c), np.concatenate(out_t)


def batched_fill_covered(gids: np.ndarray, tile_ids: np.ndarray):
    """J6 over many fill groups at once (src/coordinates.cpp:52-67).

    Per group ``gid``: unique the tiles, then per x-column fill every y
    between successive covered tiles. The variable-length aranges are
    vectorized with the repeat/cumsum trick. Returns (gids, tiles)
    pairs — unique per group, fills included, unsorted.
    """
    gids = np.asarray(gids, dtype=np.int64)
    tile_ids = np.asarray(tile_ids, dtype=np.int64)
    if len(gids) == 0:
        return gids, tile_ids
    order = np.lexsort((tile_ids, gids))
    g, t = gids[order], tile_ids[order]
    keep = np.ones(len(g), dtype=bool)
    keep[1:] = (g[1:] != g[:-1]) | (t[1:] != t[:-1])
    g, t = g[keep], t[keep]
    x, y = unpack_tile(t)
    same = (g[1:] == g[:-1]) & (x[1:] == x[:-1])
    gap = y[1:] - y[:-1]
    need = same & (gap > 1)
    if not need.any():
        return g, t
    idx = np.nonzero(need)[0]
    counts = (gap[idx] - 1).astype(np.int64)
    total = int(counts.sum())
    reps = np.repeat(np.arange(len(idx), dtype=np.int64), counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(counts) - counts, counts)
    fy = y[idx][reps] + 1 + within
    fx = x[idx][reps]
    fg = g[idx][reps]
    return np.concatenate([g, fg]), np.concatenate([t, pack_tile(fx, fy)])


def polygon_cover_tiles(lons: np.ndarray, latps: np.ndarray, zoom: int) -> np.ndarray:
    """Ring walk + interior fill, as the reference does for polygons
    (src/osm_lua_processing.cpp:448-458: insertIntermediateTiles then
    fillCoveredTiles)."""
    return fill_covered_tiles(segment_walk_tiles(lons, latps, zoom))


def bbox_cover_tiles(min_lon: float, min_latp: float, max_lon: float,
                     max_latp: float, zoom: int) -> np.ndarray:
    """J7: all tiles in the envelope (reference: src/shp_mem_tiles.cpp:123-135)."""
    x1 = int(M.lon2tilex(min_lon, zoom))
    x2 = int(M.lon2tilex(max_lon, zoom))
    # y grows southward: max_latp -> smaller y
    y1 = int(M.latp2tiley(max_latp, zoom))
    y2 = int(M.latp2tiley(min_latp, zoom))
    xs = np.arange(min(x1, x2), max(x1, x2) + 1, dtype=np.int64)
    ys = np.arange(min(y1, y2), max(y1, y2) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return pack_tile(gx.ravel(), gy.ravel())
