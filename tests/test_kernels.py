"""Unit tests for the deterministic numpy kernels (SURVEY.md §5.1)."""

import math

import numpy as np
import pytest

from tilemaker_spark.kernels import clip, geomops, mercator as M, mvt, simplify, tilecover
from tilemaker_spark.kernels import geompack


class TestMercator:
    def test_lat2latp_closed_form(self):
        # lat=0 -> latp=0 (log tan 45deg = 0)
        assert M.lat2latp(0.0) == pytest.approx(0.0, abs=1e-12)
        # round trip
        for lat in [-85.0, -47.3, 0.0, 9.5, 47.27, 85.0]:
            assert float(M.latp2lat(M.lat2latp(lat))) == pytest.approx(lat, abs=1e-9)

    def test_exact_operation_order(self):
        # replicate (lon+180.0) * (1/360.0) not /360.0 (src/coordinates.cpp:27)
        lon = 9.5234567
        assert float(M.lon2tilexf(lon, 14)) == math.ldexp((lon + 180.0) * (1 / 360.0), 14)

    def test_tile_conversions(self):
        # z0: whole world is tile (0,0)
        assert int(M.lon2tilex(0.0, 0)) == 0
        assert int(M.latp2tiley(0.0, 0)) == 0
        # z1: lon just above 0 -> x=1
        assert int(M.lon2tilex(0.0001, 1)) == 1
        assert int(M.lon2tilex(-0.0001, 1)) == 0
        # inverse round trip at tile corners
        for z in (4, 10, 14):
            x = int(M.lon2tilex(9.52, z))
            lo = float(M.tilex2lon(x, z))
            hi = float(M.tilex2lon(x + 1, z))
            assert lo <= 9.52 < hi

    def test_latplon2index_fixed_point(self):
        # reference divides int32 coords by 1e7 (src/coordinates.cpp:38-41)
        lon_f, latp_f = 95300000, 520000000  # 9.53, 52.0 (projected)
        x, y = M.latplon2index(latp_f, lon_f, 14)
        assert int(x) == int(M.lon2tilex(9.53, 14))
        assert int(y) == int(M.latp2tiley(52.0, 14))

    def test_degp_meter_roundtrip(self):
        latp = 52.0
        m = float(M.degp2meter(0.01, latp))
        assert float(M.meter2degp(m, latp)) == pytest.approx(0.01, rel=1e-12)

    def test_tilebbox(self):
        bb = M.TileBbox(8580, 5738, 14)
        assert bb.min_lon < bb.max_lon
        assert bb.min_latp < bb.max_latp
        assert bb.xmargin == pytest.approx((bb.max_lon - bb.min_lon) / 200.0)
        assert bb.xscale == pytest.approx((bb.max_lon - bb.min_lon) / 4096.0)
        # pixel scaling truncates toward zero, incl. negatives
        px, py = bb.scale_latp_lon(bb.max_latp, bb.min_lon - bb.xscale * 1.5)
        assert int(px) == -1  # C truncation of -1.5
        px, py = bb.scale_latp_lon(bb.max_latp, bb.min_lon)
        assert (int(px), int(py)) == (0, 0)
        px, py = bb.scale_latp_lon(bb.min_latp, bb.max_lon)
        assert (int(px), int(py)) == (4096, 4096)


class TestTileCover:
    def test_point_tile(self):
        x, y = tilecover.point_tile(9.52, M.lat2latp(47.15), 14)
        assert int(x) == int(M.lon2tilex(9.52, 14))

    def test_pack_unpack(self):
        t = tilecover.pack_tile(8580, 5738)
        x, y = tilecover.unpack_tile(t)
        assert (int(x), int(y)) == (8580, 5738)

    def test_segment_walk_horizontal(self):
        # a horizontal segment crossing 3 tiles at z14
        z = 14
        x0 = 8580
        lon0 = float(M.tilex2lon(x0, z)) + 1e-6
        lon1 = float(M.tilex2lon(x0 + 3, z)) - 1e-6
        latp = float(M.tiley2latp(5738, z)) - 1e-6  # inside row y=5738
        tiles = tilecover.segment_walk_tiles(np.array([lon0, lon1]), np.array([latp, latp]), z)
        xs, ys = tilecover.unpack_tile(tiles)
        assert sorted(xs.tolist()) == [x0, x0 + 1, x0 + 2]
        assert set(ys.tolist()) == {5738}

    @staticmethod
    def _reference_walk(lons, latps, z):
        """Direct scalar transcription of insertIntermediateTiles
        (include/coordinates.h:93-133) as a test oracle."""
        tile_set = set()
        pts = list(zip(lons, latps))
        p2 = None
        for i, (lon, latp) in enumerate(pts):
            p1 = p2
            p2 = (lon, latp)
            xf2 = math.ldexp((lon + 180.0) * (1 / 360.0), z)
            yf2 = math.ldexp((180.0 - latp) * (1 / 360.0), z)
            x2, y2 = int(xf2), int(yf2)
            tile_set.add((x2, y2))
            if i == 0:
                continue
            xf1 = math.ldexp((p1[0] + 180.0) * (1 / 360.0), z)
            yf1 = math.ldexp((180.0 - p1[1]) * (1 / 360.0), z)
            x1, y1 = int(xf1), int(yf1)
            dx, dy = xf2 - xf1, yf2 - yf1
            if x1 != x2:
                slope = dy / dx
                for xc in range(min(x1, x2) + 1, max(x1, x2) + 1):
                    yc = int(yf1 + (float(xc) - xf1) * slope)
                    tile_set.add((xc, yc))
            if y1 != y2:
                slope = dx / dy
                for yc in range(min(y1, y2) + 1, max(y1, y2) + 1):
                    xc = int(xf1 + (float(yc) - yf1) * slope)
                    tile_set.add((xc, yc))
        return tile_set

    def test_segment_walk_matches_reference_transcription(self):
        """Vectorized DDA == scalar transcription of the C++ (incl. its
        corner-skip quirk) on random polylines."""
        rng = np.random.RandomState(7)
        z = 14
        for _ in range(20):
            n = rng.randint(2, 10)
            lons = 9.47 + rng.rand(n) * 0.17
            latps = float(M.lat2latp(47.05)) + rng.rand(n) * 0.3
            got = tilecover.segment_walk_tiles(lons, latps, z)
            xs, ys = tilecover.unpack_tile(got)
            got_set = set(zip(xs.tolist(), ys.tolist()))
            assert got_set == self._reference_walk(lons, latps, z)

    def test_segment_walk_dense_coverage(self):
        # every densely-sampled tile is in the walk or is a corner-skip
        # (diagonal neighbor of two walked tiles) — reference quirk
        z = 14
        p0 = (9.47, float(M.lat2latp(47.05)))
        p1 = (9.64, float(M.lat2latp(47.28)))
        tiles = tilecover.segment_walk_tiles(
            np.array([p0[0], p1[0]]), np.array([p0[1], p1[1]]), z)
        t = np.linspace(0, 1, 200001)
        lons = p0[0] + (p1[0] - p0[0]) * t
        latps = p0[1] + (p1[1] - p0[1]) * t
        dense = set(zip(M.lon2tilex(lons, z).tolist(), M.latp2tiley(latps, z).tolist()))
        xs, ys = tilecover.unpack_tile(tiles)
        got = set(zip(xs.tolist(), ys.tolist()))
        for (x, y) in dense - got:
            neighbors = {(x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)}
            assert len(neighbors & got) >= 2, f"non-corner miss at {(x, y)}"

    def test_fill_covered(self):
        # column x=5 has y=2 and y=6 -> fill 3,4,5 (reference fills gaps per column)
        ids = tilecover.pack_tile(np.array([5, 5, 7]), np.array([2, 6, 1]))
        filled = tilecover.fill_covered_tiles(ids)
        xs, ys = tilecover.unpack_tile(filled)
        got = set(zip(xs.tolist(), ys.tolist()))
        assert got == {(5, 2), (5, 3), (5, 4), (5, 5), (5, 6), (7, 1)}

    def test_bbox_cover(self):
        z = 6
        tiles = tilecover.bbox_cover_tiles(0.0, 0.0, 11.25, 11.25, z)
        xs, ys = tilecover.unpack_tile(tiles)
        assert len(tiles) == 9  # 3x3 block


class TestClip:
    BOX = (0.0, 0.0, 10.0, 10.0)

    def test_point(self):
        assert clip.clip_point(5, 5, self.BOX)
        assert not clip.clip_point(-1, 5, self.BOX)
        assert not clip.clip_point(0, 5, self.BOX)  # boundary excluded (geom::within)

    def test_line_fully_inside(self):
        pieces = clip.clip_line(np.array([1.0, 9.0]), np.array([1.0, 9.0]), self.BOX)
        assert len(pieces) == 1
        assert len(pieces[0][0]) == 2

    def test_line_crossing(self):
        pieces = clip.clip_line(np.array([-5.0, 15.0]), np.array([5.0, 5.0]), self.BOX)
        assert len(pieces) == 1
        xs, ys = pieces[0]
        assert xs[0] == 0.0 and xs[-1] == 10.0

    def test_line_out_in_out(self):
        # enters and leaves twice -> two pieces
        xs = np.array([-5.0, 5.0, 15.0, 5.0])
        ys = np.array([5.0, 5.0, 5.0, -5.0])
        pieces = clip.clip_line(xs, ys, self.BOX)
        assert len(pieces) == 2

    def test_line_fully_outside(self):
        assert clip.clip_line(np.array([-5.0, -1.0]), np.array([5.0, 5.0]), self.BOX) == []

    def test_ring_inside(self):
        xs = np.array([2.0, 8, 8, 2, 2])
        ys = np.array([2.0, 2, 8, 8, 2])
        out = clip.clip_ring(xs, ys, self.BOX)
        assert out is not None
        assert clip.ring_within_box(out[0], out[1], self.BOX)

    def test_ring_overlapping(self):
        xs = np.array([-5.0, 5, 5, -5, -5])
        ys = np.array([2.0, 2, 8, 8, 2])
        out = clip.clip_ring(xs, ys, self.BOX)
        assert out is not None
        rx, ry = out
        # clip result confined to box (property check per SURVEY.md §5.5)
        assert rx.min() >= 0.0 and rx.max() <= 10.0
        # area = 5x6 rectangle
        assert abs(geomops.signed_area(rx, ry)) == pytest.approx(30.0)

    def test_ring_outside(self):
        xs = np.array([20.0, 25, 25, 20, 20])
        ys = np.array([2.0, 2, 8, 8, 2])
        assert clip.clip_ring(xs, ys, self.BOX) is None


class TestSimplify:
    def test_collinear_dropped(self):
        xs = np.array([0.0, 5.0, 10.0])
        ys = np.array([0.0, 1e-9, 0.0])
        sx, sy = simplify.simplify_line(xs, ys, 0.01)
        assert len(sx) == 2

    def test_deviation_kept(self):
        xs = np.array([0.0, 5.0, 10.0])
        ys = np.array([0.0, 3.0, 0.0])
        sx, sy = simplify.simplify_line(xs, ys, 0.01)
        assert len(sx) == 3

    def test_output_subset_of_input(self):
        rng = np.random.RandomState(42)
        xs = np.cumsum(rng.rand(50))
        ys = rng.rand(50)
        sx, sy = simplify.simplify_line(xs, ys, 0.2)
        in_pts = set(zip(xs.tolist(), ys.tolist()))
        assert all((x, y) in in_pts for x, y in zip(sx.tolist(), sy.tolist()))
        assert sx[0] == xs[0] and sx[-1] == xs[-1]

    def test_ring_degenerates_to_none(self):
        # a tiny sliver ring collapses below 4 pts
        xs = np.array([0.0, 1.0, 2.0, 0.0])
        ys = np.array([0.0, 1e-12, 0.0, 0.0])
        assert simplify.simplify_ring(np.append(xs, 0.0), np.append(ys, 0.0), 1.0) is None


class TestGeomOps:
    def test_signed_area(self):
        xs = np.array([0.0, 4, 4, 0, 0])
        ys = np.array([0.0, 0, 3, 3, 0])
        assert geomops.signed_area(xs, ys) == pytest.approx(12.0)  # CCW positive
        assert geomops.signed_area(xs[::-1], ys[::-1]) == pytest.approx(-12.0)

    def test_correct_winding(self):
        xs = np.array([0.0, 4, 4, 0, 0])
        ys = np.array([0.0, 0, 3, 3, 0])
        ox, oy = geomops.correct_winding(xs, ys, outer=True)
        assert geomops.signed_area(ox, oy) < 0  # outer = CW (boost convention)
        ix, iy = geomops.correct_winding(xs, ys, outer=False)
        assert geomops.signed_area(ix, iy) > 0

    def test_centroid(self):
        xs = np.array([0.0, 4, 4, 0, 0])
        ys = np.array([0.0, 0, 4, 4, 0])
        cx, cy = geomops.ring_centroid(xs, ys)
        assert (cx, cy) == (pytest.approx(2.0), pytest.approx(2.0))

    def test_point_in_ring(self):
        rx = np.array([0.0, 10, 10, 0, 0])
        ry = np.array([0.0, 0, 10, 10, 0])
        inside = geomops.points_in_ring(np.array([5.0, 15.0, 5.0]),
                                        np.array([5.0, 5.0, -1.0]), rx, ry)
        assert inside.tolist() == [True, False, False]

    def test_point_in_concave_ring(self):
        # U-shape
        rx = np.array([0.0, 10, 10, 6, 6, 4, 4, 10, 10, 0, 0])
        ry = np.array([0.0, 0, 3, 3, 7, 7, 3, 3, 10, 10, 0])
        # that ring is self-intersecting; use a simple concave L instead
        rx = np.array([0.0, 10, 10, 5, 5, 0, 0])
        ry = np.array([0.0, 0, 5, 5, 10, 10, 0])
        inside = geomops.points_in_ring(np.array([2.0, 8.0]), np.array([8.0, 8.0]), rx, ry)
        assert inside.tolist() == [True, False]


class TestRingAssembly:
    """J2 edge cases per FIXTURES.md §2 (reference: include/osm_store.h:186-239)."""

    def test_closed_ways_passthrough(self):
        outers, inners = geomops.assemble_rings(
            [np.array([1, 2, 3, 1])], [np.array([7, 8, 9, 7])])
        assert len(outers) == 1 and outers[0].tolist() == [1, 2, 3, 1]
        assert inners[0].tolist() == [7, 8, 9, 7]

    def test_forward_join(self):
        outers, _ = geomops.assemble_rings(
            [np.array([1, 2, 3]), np.array([3, 4, 1])], [])
        assert len(outers) == 1
        assert outers[0].tolist() == [1, 2, 3, 3, 4, 1]

    def test_reversed_join(self):
        # second way shares its *end* with the outer's end -> appended reversed
        outers, _ = geomops.assemble_rings(
            [np.array([1, 2, 3]), np.array([1, 4, 3])], [])
        assert len(outers) == 1
        assert outers[0].tolist() == [1, 2, 3, 3, 4, 1]

    def test_prepend_join(self):
        outers, _ = geomops.assemble_rings(
            [np.array([2, 3, 4]), np.array([1, 5, 2])], [])
        assert len(outers) == 1
        assert outers[0].tolist() == [1, 5, 2, 2, 3, 4]

    def test_unmatched_seed(self):
        outers, _ = geomops.assemble_rings(
            [np.array([1, 2, 3, 1]), np.array([10, 11, 12])], [])
        assert len(outers) == 2

    def test_two_disjoint_rings_from_four_open_ways(self):
        outers, _ = geomops.assemble_rings(
            [np.array([1, 2]), np.array([2, 3, 1]),
             np.array([10, 11]), np.array([11, 12, 10])], [])
        assert len(outers) == 2


class TestMVT:
    def test_worked_example_from_spec(self):
        """include/vector_tile.proto:60-69: MoveTo(3,6), LineTo(8,12),
        LineTo(20,34), ClosePath => [9 6 12 18 10 12 24 44 15]
        (open-ring input: the spec example omits the closing vertex)."""
        cmds = mvt.encode_polygon_geometry(
            [[(np.array([3, 8, 20]), np.array([6, 12, 34]))]])
        assert cmds == [9, 6, 12, 18, 10, 12, 24, 44, 15]

    def test_closed_ring_emits_return_lineto(self):
        """The reference feeds boost rings that include the closing vertex
        (geom::correct closes them, src/helpers.cpp:230), so
        writeDeltaString emits a lineTo back to the start before
        ClosePath — replicate that faithfully."""
        cmds = mvt.encode_polygon_geometry(
            [[(np.array([3, 8, 20, 3]), np.array([6, 12, 34, 6]))]])
        assert cmds == [9, 6, 12, (3 << 3) + 2, 10, 12, 24, 44, 33, 55, 15]

    def test_point(self):
        assert mvt.encode_point_geometry(25, 17) == [9, 50, 34]

    def test_consecutive_dup_pixels_dropped(self):
        cmds = mvt.encode_line_geometry(
            [(np.array([0, 5, 5, 9]), np.array([0, 5, 5, 9]))])
        # 3 distinct pts -> moveTo + lineTo x2
        assert cmds[0] == 9 and cmds[3] == (2 << 3) + 2
        assert len(cmds) == 3 + 1 + 4

    def test_short_string_dropped(self):
        assert mvt.encode_line_geometry([(np.array([3]), np.array([4]))]) == []
        # all-identical pixels -> len==0 -> dropped (write_geometry.cpp:120)
        assert mvt.encode_line_geometry([(np.array([3, 3]), np.array([4, 4]))]) == []

    def test_lastpos_carries_across_parts(self):
        cmds = mvt.encode_line_geometry(
            [(np.array([0, 10]), np.array([0, 0])),
             (np.array([10, 20]), np.array([5, 5]))])
        # first part = 6 ints; second moveTo is delta from (10,0): dx=0, dy=5
        assert cmds[6:9] == [9, 0, 10]

    def test_zigzag(self):
        assert int(mvt.zigzag32(0)) == 0
        assert int(mvt.zigzag32(-1)) == 1
        assert int(mvt.zigzag32(1)) == 2
        assert int(mvt.zigzag32(-2)) == 3

    def test_tile_roundtrip_parseable(self):
        """Layer bytes decode as valid protobuf (spot-check wire format)."""
        f = mvt.encode_feature(mvt.GEOM_POINT, [9, 50, 34], [0, 0])
        layer = mvt.encode_layer("poi", [f], ["name"], ["x"])
        tile = mvt.encode_tile([layer])
        assert tile[0] == (3 << 3) | 2  # field 3, wire 2
        # compressed output is deterministic
        assert mvt.compress_tile(tile) == mvt.compress_tile(tile)

    def test_value_encoding(self):
        assert mvt.encode_value("ab") == b"\x0a\x02ab"
        assert mvt.encode_value(True) == b"\x38\x01"
        assert mvt.encode_value(7) == b"\x20\x07"

    def test_layer_dicts(self):
        d = mvt.LayerDicts()
        assert d.key_index("a") == 0
        assert d.key_index("b") == 1
        assert d.key_index("a") == 0
        assert d.value_index("x") == 0
        assert d.value_index(1) == 1
        assert d.value_index("x") == 0
        # bool and int 1 are distinct values
        assert d.value_index(True) == 2


class TestGeomPack:
    def test_point_roundtrip(self):
        k, (lon, latp) = geompack.unpack(geompack.pack_point(95300000, 520000000))
        assert k == 1 and lon == 95300000 and latp == 520000000

    def test_line_roundtrip(self):
        parts = [(np.array([1, 2, 3]), np.array([4, 5, 6]))]
        k, got = geompack.unpack(geompack.pack_line(parts))
        assert k == 2
        assert got[0][0].tolist() == [1, 2, 3]
        assert got[0][1].tolist() == [4, 5, 6]

    def test_polygon_roundtrip(self):
        polys = [[(np.array([0, 4, 4, 0]), np.array([0, 0, 3, 0])),
                  (np.array([1, 2, 2, 1]), np.array([1, 1, 2, 1]))]]
        k, got = geompack.unpack(geompack.pack_polygon(polys))
        assert k == 3
        assert len(got) == 1 and len(got[0]) == 2
        assert got[0][1][0].tolist() == [1, 2, 2, 1]


class TestBatchedCover:
    """Batched DDA walk / scanline fill == per-feature reference kernels."""

    def _random_chain(self, rng, npts):
        lon0 = rng.uniform(-170, 170)
        lat0 = rng.uniform(-60, 60)
        lons = lon0 + np.cumsum(rng.uniform(-0.3, 0.3, npts))
        lats = lat0 + np.cumsum(rng.uniform(-0.3, 0.3, npts))
        return ((lons * 1e7).astype(np.int64),
                (M.lat2latp(lats) * 1e7).astype(np.int64))

    def test_batched_walk_matches_per_chain(self):
        rng = np.random.default_rng(42)
        z = 14
        chains = [self._random_chain(rng, int(rng.integers(1, 40))) for _ in range(60)]
        lons = np.concatenate([c[0] for c in chains]).astype(np.float64) / 1e7
        lats = np.concatenate([c[1] for c in chains]).astype(np.float64) / 1e7
        cids = np.repeat(np.arange(len(chains), dtype=np.int64),
                         [len(c[0]) for c in chains])
        c_out, t_out = tilecover.batched_segment_walk(lons, lats, cids, z)
        for i, (lo, la) in enumerate(chains):
            want = tilecover.segment_walk_tiles(lo / 1e7, la / 1e7, z)
            got = np.unique(t_out[c_out == i])
            assert got.tolist() == want.tolist(), f"chain {i}"

    def test_batched_fill_matches_per_group(self):
        rng = np.random.default_rng(7)
        groups = []
        for _ in range(40):
            k = int(rng.integers(1, 30))
            xs = rng.integers(100, 110, k)
            ys = rng.integers(200, 230, k)
            groups.append(tilecover.pack_tile(xs, ys))
        gids = np.repeat(np.arange(len(groups), dtype=np.int64),
                         [len(g) for g in groups])
        fg, ft = tilecover.batched_fill_covered(gids, np.concatenate(groups))
        for i, g in enumerate(groups):
            want = tilecover.fill_covered_tiles(g)
            got = np.unique(ft[fg == i])
            assert got.tolist() == want.tolist(), f"group {i}"

    def test_cover_udf_batch_matches_reference_loop(self):
        """Drive the UDF's inner function on a mixed batch and compare
        against the original per-feature composition."""
        import pandas as pd
        from tilemaker_spark import tileassign

        rng = np.random.default_rng(3)
        z = 14
        rows = []
        for i in range(50):
            if i % 2 == 0:
                nparts = int(rng.integers(1, 3))
                parts = [self._random_chain(rng, int(rng.integers(2, 25)))
                         for _ in range(nparts)]
                rows.append((geompack.KIND_LINE, geompack.pack_line(parts)))
            else:
                npolys = int(rng.integers(1, 3))
                polys = []
                for _ in range(npolys):
                    lo, la = self._random_chain(rng, int(rng.integers(4, 20)))
                    lo = np.append(lo, lo[0])
                    la = np.append(la, la[0])
                    polys.append([(lo, la)])
                rows.append((geompack.KIND_POLYGON, geompack.pack_polygon(polys)))

        geom = pd.Series([b for _, b in rows])
        batched = tileassign._cover_udf(z).func(geom)

        for i, (k, buf) in enumerate(rows):
            gk, payload = geompack.unpack(bytes(buf))
            if gk == geompack.KIND_LINE:
                ids = [tilecover.segment_walk_tiles(lo / 1e7, la / 1e7, z)
                       for lo, la in payload]
                want = np.unique(np.concatenate(ids))
            else:
                ids = []
                for rings in payload:
                    rt = [tilecover.segment_walk_tiles(lo / 1e7, la / 1e7, z)
                          for lo, la in rings]
                    ids.append(tilecover.fill_covered_tiles(np.concatenate(rt)))
                want = np.unique(np.concatenate(ids))
            assert batched.iloc[i] == want.tolist(), f"feature {i}"
