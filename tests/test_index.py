"""Cell-index invariants: hexgrid (H3-style) and S2."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatial_studio_pipelines_spark.index import hexgrid as hg
from geospatial_studio_pipelines_spark.index import s2


def _pts(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(-60, 60, n), rng.uniform(-179, 179, n)


@pytest.mark.parametrize("res", [5, 8, 10, 12])
def test_hex_roundtrip_and_containment(res):
    lat, lng = _pts()
    c = hg.latlng_to_cell(lat, lng, res)
    assert np.all(hg.cell_resolution(c) == res)
    clat, clng = hg.cell_to_latlng(c)
    assert np.array_equal(hg.latlng_to_cell(clat, clng, res), c)
    # every point is within one circumradius of its cell center
    d = np.hypot(clat - lat, clng - lng)
    assert d.max() <= float(hg.cell_size(res)) * 1.0001


def test_hex_disk_ring_counts():
    c = hg.latlng_to_cell(12.3, 45.6, 9)
    for k in range(1, 5):
        disk = hg.grid_disk(c, k)
        ring = hg.grid_ring(c, k)
        assert len(disk) == 1 + 3 * k * (k + 1)
        assert len(ring) == 6 * k
        dd = hg.grid_distance(disk, np.full(len(disk), c))
        assert dd.max() == k
        rr = hg.grid_distance(ring, np.full(len(ring), c))
        assert np.all(rr == k)
        assert set(ring.tolist()) <= set(disk.tolist())


def test_hex_bbox_cover_contains_member_points():
    cells = set(hg.bbox_to_cells(10, 20, 13, 22, 7).tolist())
    rng = np.random.default_rng(0)
    lat = rng.uniform(20, 22, 500)
    lng = rng.uniform(10, 13, 500)
    got = hg.latlng_to_cell(lat, lng, 7)
    assert set(got.tolist()) <= cells


def test_hex_parent_contains_child_center():
    lat, lng = _pts(500)
    child = hg.latlng_to_cell(lat, lng, 10)
    parent = hg.cell_to_parent(child, 7)
    clat, clng = hg.cell_to_latlng(child)
    assert np.array_equal(hg.latlng_to_cell(clat, clng, 7), parent)


def test_res_for_extent_band():
    r = hg.res_for_extent(np.array([100.0, 1.0, 0.01, 1e-6]))
    # log_sqrt7(20/extent) floored then clamped to [5, 12]
    assert r.tolist() == [5, 5, 7, 12]
    assert np.all((r >= 5) & (r <= 12))


@pytest.mark.parametrize("level", [5, 12, 20, 30])
def test_s2_roundtrip(level):
    lat, lng = _pts()
    c = s2.latlng_to_cell(lat, lng, level)
    assert np.all(s2.cell_level(c) == level)
    clat, clng = s2.cell_to_latlng(c)
    assert np.array_equal(s2.latlng_to_cell(clat, clng, level), c)


def test_s2_known_token():
    # cross-checked with the reference S2 library: leaf cell at (0,0)
    c = s2.latlng_to_cell(0.0, 0.0, 30)
    assert s2.token(c) == ["1000000000000001"]


def test_s2_parent_range_containment():
    lat, lng = _pts(500)
    c = s2.latlng_to_cell(lat, lng, 24)
    for lvl in (4, 10, 16):
        p = s2.cell_parent(c, lvl)
        assert np.all(s2.cell_level(p) == lvl)
        assert np.all(s2.contains(p, c))
        assert np.all(s2.range_min(p) <= np.asarray(c.tolist()))  # leaf ids sit inside


def test_s2_range_partitioning_clusters_space():
    # nearby points share prefixes: parents at level 8 of two points 0.01° apart agree
    a = s2.cell_parent(s2.latlng_to_cell(10.0, 20.0, 30), 8)
    b = s2.cell_parent(s2.latlng_to_cell(10.001, 20.001, 30), 8)
    assert a.tolist() == b.tolist()


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-84.9, max_value=84.9),
    st.floats(min_value=-179.9, max_value=179.9),
    st.integers(min_value=5, max_value=12),
)
def test_hex_roundtrip_property(lat, lng, res):
    c = hg.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    clat, clng = hg.cell_to_latlng(c)
    assert hg.latlng_to_cell(clat, clng, res).tolist() == c.tolist()
