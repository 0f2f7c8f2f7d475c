"""Raster→vector→raster round-trip and regularization behavior (FIXTURES T4)."""

import numpy as np

from geospatial_studio_pipelines_spark import datagen
from geospatial_studio_pipelines_spark.codecs.image import decode_image
from geospatial_studio_pipelines_spark.geo import geometry as G
from geospatial_studio_pipelines_spark.geo import wkb
from geospatial_studio_pipelines_spark.operators import regularize, vectorize


def test_connected_components_counts():
    m = np.zeros((10, 10), dtype=bool)
    m[1:3, 1:4] = True
    m[5:9, 5:9] = True
    m[0, 9] = True
    labels = vectorize.connected_components(m)
    assert len(np.unique(labels)) == 4  # bg + 3 components


def test_trace_rectangle_exact():
    m = np.zeros((10, 12), dtype=bool)
    m[2:5, 3:9] = True  # 6x3 rectangle
    rings = vectorize.trace_component(m)
    assert len(rings) == 1
    assert len(rings[0]) == 5  # collinear merged: 4 corners + close
    assert abs(G.ring_area(rings[0])) == 18.0
    xs, ys = rings[0][:, 0], rings[0][:, 1]
    assert xs.min() == 3 and xs.max() == 9 and ys.min() == 2 and ys.max() == 5


def test_trace_with_hole():
    m = np.ones((8, 8), dtype=bool)
    m[3:5, 3:5] = False
    rings = vectorize.trace_component(m)
    assert len(rings) == 2
    assert abs(G.ring_area(rings[0])) == 64.0
    assert abs(G.ring_area(rings[1])) == 4.0


def test_roundtrip_rectilinear_exact():
    # vectorize → rasterize reproduces the mask exactly for rectilinear shapes
    for i in [0, 10, 20, 50]:
        row = datagen.label_row(i)
        mask = decode_image(row["label_bytes"])[:, :, 0] > 0
        feats = vectorize.raster_to_polygons(mask.astype(np.uint8), min_area=1.0)
        assert len(feats) == row["n_shapes"]
        back = vectorize.rasterize_polygons(
            [(f["rings"], 1.0) for f in feats], mask.shape, all_touched=False
        )
        inter = ((back > 0) & mask).sum()
        union = ((back > 0) | mask).sum()
        assert inter / union == 1.0, i  # exact round-trip


def test_min_area_filter_and_classes():
    m = np.zeros((20, 20), dtype=np.uint8)
    m[1:3, 1:3] = 1  # area 4 — dropped at min_area 10
    m[5:15, 5:15] = 2  # area 100, class 2
    feats = vectorize.raster_to_polygons(m, min_area=10.0, class_values=[1, 2])
    assert len(feats) == 1 and feats[0]["class"] == 2
    feats_all = vectorize.raster_to_polygons(m, min_area=1.0, class_values=[1, 2])
    assert len(feats_all) == 2


def test_vectorize_spark_stage(spark):
    labels = datagen.label_df(spark, 60)
    out = vectorize.vectorize(labels.withColumnRenamed("label_bytes", "masked_bytes"), min_area=1.0).toPandas()
    exp_counts = {r["image_id"]: r["n_shapes"] for r in (datagen.label_row(i) for i in range(0, 60, 10))}
    got_counts = out.groupby("image_id").size().to_dict()
    assert got_counts == exp_counts
    # every polygon rasterizes back into its own bbox
    for _, row in out.iterrows():
        rings = wkb.polygon_rings(bytes(row["geom_wkb"]))
        assert abs(G.ring_area(rings[0])) == row["area_px"]


def test_adaptive_regularization_rectangle_stays_rectangle():
    rect = np.array([[0, 0], [10, 0], [10, 6], [0, 6], [0, 0]], dtype=float)
    out = regularize.adaptive_regularization(rect)
    assert len(out) == 5
    assert np.isclose(abs(G.ring_area(out)), 60.0)


def test_adaptive_regularization_rotated_rectangle():
    rect = np.array([[0, 0], [10, 0], [10, 6], [0, 6], [0, 0]], dtype=float)
    rot = G.rotate_ring(rect, 30.0, (5, 3))
    out = regularize.adaptive_regularization(rot)
    # recovered as a 4-vertex polygon with ~same area
    assert len(out) == 5
    assert abs(abs(G.ring_area(out)) - 60.0) < 3.0


def test_orthogonal_regularization_inserts_right_angles():
    # L-shape with one slightly-off vertex gets orthogonalized
    ring = np.array(
        [[0, 0], [10, 0.4], [10, 5], [5, 5], [5, 10], [0, 10], [0, 0]], dtype=float
    )
    out = regularize.regularization(ring, angle_tolerance=10.0, simplify_tolerance=0.1)
    seg = np.diff(out, axis=0)
    ang = np.abs(np.rad2deg(np.arctan2(seg[:, 1], seg[:, 0]))) % 90
    # most segments near 0/90 after regularization
    assert (np.minimum(ang, 90 - ang) < 12).mean() >= 0.7


def test_hybrid_regularization_branches():
    rect = np.array([[0, 0], [10, 0], [10, 6], [0, 6], [0, 0]], dtype=float)
    out = regularize.hybrid_regularization(rect)
    # 36-bin histogram centers quantize the dominant angle to 2.5° (the
    # reference does the same), inflating the ortho hull slightly
    assert len(out) == 5
    assert np.isclose(abs(G.ring_area(out)), 60.0, rtol=0.15)
    # high-complexity shape → min rotated rectangle branch
    theta = np.linspace(0, 2 * np.pi, 41)
    star_r = np.where(np.arange(41) % 2 == 0, 5.0, 1.0)
    star = np.column_stack([star_r * np.cos(theta), star_r * np.sin(theta)])
    star[-1] = star[0]
    out2 = regularize.hybrid_regularization(star)
    assert len(out2) == 5


def test_regularize_spark_stage(spark):
    labels = datagen.label_df(spark, 40)
    polys = vectorize.vectorize(labels.withColumnRenamed("label_bytes", "masked_bytes"), min_area=1.0)
    out = regularize.regularize(polys, "adaptive_regularization").toPandas()
    assert len(out) > 0
    for _, row in out.iterrows():
        rings = wkb.polygon_rings(bytes(row["reg_wkb"]))
        # axis-aligned rectangles regularize to 4-vertex polygons (T4 contract)
        assert len(rings[0]) == 5


def test_connected_components_spiral_worst_case():
    """Perf regression guard: a snaking spiral (max component diameter) on a
    1200x1200 plane must label in seconds, not O(area x diameter) passes —
    the pre-union-find propagation took minutes here."""
    import time

    h = w = 1200
    m = np.zeros((h, w), bool)
    x0, x1, y0, y1 = 0, w - 1, 0, h - 1
    while x0 < x1 and y0 < y1:
        m[y0, x0 : x1 + 1] = True
        m[y0 : y1 + 1, x1] = True
        x0 += 4
        x1 -= 4
        y0 += 4
        y1 -= 4
    t0 = time.time()
    labels = vectorize.connected_components(m)
    assert time.time() - t0 < 10.0
    # one long snake per two spiral arms joined at corners: partition sanity
    assert labels[m].min() > 0 and (labels[~m] == 0).all()


def test_connected_components_matches_bfs():
    from collections import deque

    rng = np.random.default_rng(3)
    mm = rng.random((60, 70)) < 0.45
    labels = vectorize.connected_components(mm)
    seen = np.zeros_like(mm, dtype=int)
    c = 0
    for i in range(mm.shape[0]):
        for j in range(mm.shape[1]):
            if mm[i, j] and not seen[i, j]:
                c += 1
                q = deque([(i, j)])
                seen[i, j] = c
                while q:
                    a, b = q.popleft()
                    for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        na, nb = a + da, b + db
                        if (
                            0 <= na < mm.shape[0]
                            and 0 <= nb < mm.shape[1]
                            and mm[na, nb]
                            and not seen[na, nb]
                        ):
                            seen[na, nb] = c
                            q.append((na, nb))
    remap = {}
    for lab, ref in zip(labels[mm], seen[mm]):
        assert remap.setdefault(lab, ref) == ref  # same partition
    assert len(remap) == c
