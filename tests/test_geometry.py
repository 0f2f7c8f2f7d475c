"""Geometry kernel + STRtree checks."""

import numpy as np

from geospatial_studio_pipelines_spark.geo import geometry as G
from geospatial_studio_pipelines_spark.geo import wkb
from geospatial_studio_pipelines_spark.geo.strtree import STRtree

SQUARE = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)


def test_point_in_ring_basic():
    px = np.array([2.0, 5.0, 0.0, 4.0, -1.0])
    py = np.array([2.0, 2.0, 2.0, 4.0, -1.0])
    got = G.points_in_ring(px, py, SQUARE)
    assert got.tolist() == [True, False, True, True, False]  # boundary inclusive


def test_polygon_with_hole():
    hole = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=float)
    px = np.array([0.5, 2.0, 1.0])
    py = np.array([0.5, 2.0, 1.0])
    got = G.points_in_polygon(px, py, [SQUARE, hole])
    assert got.tolist() == [True, False, True]  # hole boundary still counts


def test_segments_cross():
    a0 = np.array([[0.0, 0.0]])
    a1 = np.array([[2.0, 2.0]])
    b0 = np.array([[0.0, 2.0], [3.0, 3.0], [2.0, 2.0]])
    b1 = np.array([[2.0, 0.0], [4.0, 4.0], [4.0, 2.0]])
    got = G.segments_cross(a0, a1, b0, b1)[0]
    assert got.tolist() == [True, False, True]  # cross, disjoint-collinear, touch


def test_polygon_bbox_intersects_cases():
    tri = np.array([[10, 10], [14, 10], [12, 14], [10, 10]], dtype=float)
    assert G.polygon_intersects_bbox([tri], 11, 11, 13, 12)  # box inside tri
    assert G.polygon_intersects_bbox([tri], 5, 5, 20, 20)  # tri inside box
    assert G.polygon_intersects_bbox([tri], 13.5, 9.5, 20, 10.5)  # edge crossing
    assert not G.polygon_intersects_bbox([tri], 15, 15, 16, 16)
    assert G.polygon_intersects_bbox([tri], 14, 10, 15, 11)  # corner touch counts


def test_area_centroid_perimeter():
    assert G.ring_area(SQUARE) == 16.0
    assert G.polygon_area([SQUARE]) == 16.0
    assert G.ring_perimeter(SQUARE) == 16.0
    assert G.ring_centroid(SQUARE) == (2.0, 2.0)


def test_simplify_keeps_shape():
    # square with redundant midpoints collapses back to 4 corners
    ring = np.array(
        [[0, 0], [2, 0.001], [4, 0], [4, 2], [4, 4], [2, 4], [0, 4], [0, 2], [0, 0]],
        dtype=float,
    )
    out = G.simplify_ring(ring, 0.01)
    assert len(out) == 5


def test_convex_hull_and_mrr():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(100, 2))
    hull = G.convex_hull(pts)
    assert G.points_in_ring(pts[:, 0], pts[:, 1], hull).all()
    rect = G.min_rotated_rect(hull)
    assert len(rect) == 5
    assert G.points_in_ring(pts[:, 0], pts[:, 1], rect).all()
    # mrr area <= aabb area
    aabb = G.oriented_envelope_of(hull)
    assert abs(G.ring_area(rect)) <= abs(G.ring_area(aabb)) + 1e-9


def test_rotate_ring_roundtrip():
    out = G.rotate_ring(G.rotate_ring(SQUARE, 37.0, (2, 2)), -37.0, (2, 2))
    assert np.allclose(out, SQUARE)


def test_wkb_roundtrip():
    poly = wkb.dumps_polygon([SQUARE])
    gt, rings = wkb.loads(poly)
    assert gt == wkb.POLYGON
    assert np.allclose(rings[0], SQUARE)
    assert wkb.envelope(poly) == (0, 0, 4, 4)
    mp = wkb.dumps_multipolygon([[SQUARE], [SQUARE + 10]])
    gt, polys = wkb.loads(mp)
    assert gt == wkb.MULTIPOLYGON and len(polys) == 2
    assert len(wkb.polygon_rings(mp)) == 2
    pt = wkb.dumps_point(1.5, 2.5)
    assert wkb.loads(pt) == (wkb.POINT, (1.5, 2.5))


def test_strtree_matches_naive():
    rng = np.random.default_rng(3)
    lo = rng.uniform(0, 100, size=(500, 2))
    sz = rng.uniform(0.1, 5, size=(500, 2))
    boxes = np.hstack([lo, lo + sz])
    tree = STRtree(boxes)
    for qx0, qy0, qx1, qy1 in [(10, 10, 20, 20), (0, 0, 100, 100), (99, 99, 99.5, 99.5), (-5, -5, -1, -1)]:
        naive = np.where(
            (boxes[:, 0] <= qx1) & (boxes[:, 2] >= qx0) & (boxes[:, 1] <= qy1) & (boxes[:, 3] >= qy0)
        )[0]
        got = tree.query(qx0, qy0, qx1, qy1)
        assert sorted(got.tolist()) == sorted(naive.tolist())
    qi, ti = tree.query_many(np.array([[10, 10, 20, 20], [200, 200, 201, 201]]))
    assert set(qi.tolist()) <= {0}


def test_strtree_empty_and_tiny():
    assert STRtree(np.empty((0, 4))).query(0, 0, 1, 1).size == 0
    t = STRtree(np.array([[0, 0, 1, 1], [5, 5, 6, 6]]))
    assert t.query(0.5, 0.5, 0.6, 0.6).tolist() == [0]


def test_buffer_ring_grows_convex():
    out = G.buffer_ring(SQUARE, 1.0)
    assert abs(G.ring_area(out)) > 16.0
    assert G.points_in_ring(SQUARE[:-1, 0], SQUARE[:-1, 1], out).all()


def test_polygon_intersects_boxes_matches_scalar():
    """Vectorized slab-test predicate must agree with the per-pair scalar
    predicate on random polygons × random boxes (the join's exact phase)."""
    rng = np.random.default_rng(7)
    for trial in range(20):
        k = 3 + trial % 6
        ang = 2 * np.pi * np.arange(k) / k + trial * 0.3
        r = 1.0 + rng.uniform(0, 3)
        cx, cy = rng.uniform(-10, 10, size=2)
        ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
        ring = np.vstack([ring, ring[:1]])
        rings = [ring]
        if trial % 3 == 0:
            hole = np.column_stack(
                [cx + 0.3 * r * np.cos(ang), cy + 0.3 * r * np.sin(ang)]
            )
            rings.append(np.vstack([hole, hole[:1]]))
        lo = rng.uniform(-14, 14, size=(200, 2))
        sz = rng.uniform(0.05, 6, size=(200, 2))
        boxes = np.hstack([lo, lo + sz])
        got = G.polygon_intersects_boxes(rings, boxes)
        want = np.array([G.polygon_intersects_bbox(rings, *b) for b in boxes])
        assert (got == want).all(), f"trial {trial}: {np.flatnonzero(got != want)[:5]}"


def test_polygon_intersects_boxes_degenerate():
    tri = np.array([[10, 10], [14, 10], [12, 14], [10, 10]], dtype=float)
    boxes = np.array(
        [
            [11, 11, 13, 12],   # inside
            [5, 5, 20, 20],     # contains
            [13.5, 9.5, 20, 10.5],  # edge crossing, no vertex inside
            [15, 15, 16, 16],   # disjoint
            [14, 10, 15, 11],   # corner touch
            [12, 14, 12, 14],   # zero-area box on vertex
        ]
    )
    got = G.polygon_intersects_boxes([tri], boxes)
    assert got.tolist() == [True, True, True, False, True, True]
    assert G.polygon_intersects_boxes([tri], np.empty((0, 4))).size == 0
