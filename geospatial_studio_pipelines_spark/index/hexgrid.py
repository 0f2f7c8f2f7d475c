"""H3-style hexagonal multi-resolution cell index (pure numpy, vectorized).

The north rule calls for H3 (res 5–12) cell-ID encoding over image footprints.
The official ``h3`` wheel is not installable in this environment, so this module
provides an **H3-compatible API** (``latlng_to_cell``, ``cell_to_latlng``,
``cell_to_boundary``, ``grid_disk``, ``grid_ring``, ``polygon_to_cells``) over a
pointy-top axial hex lattice in equirectangular (lon/lat) coordinates with
aperture-7 size scaling (cell edge shrinks by sqrt(7) per resolution step, like
H3). Correctness of every downstream operator (spatial join pruning, kNN ring
expansion, tiling, skew salting) depends only on the *grid properties* —
hierarchical sizing, constant-time neighbor enumeration, deterministic ids —
not on bit-parity with the H3 library; the single-node oracles in tests use
this same module, and the API is drop-in swappable for ``h3`` on clusters that
have the wheel.

Reference semantics being replaced: the ad-hoc 2200-px grid tiling of
``inference_planner_functions.py:46-108`` (see SURVEY.md §2.5 W1/W2) — the
north rule upgrades that to a proper multi-resolution cell index.

Cell id layout (int64, always positive):
    bits 58..61 : resolution (0..13)
    bits 29..57 : q axial coordinate + 2^28 offset (29 bits)
    bits  0..28 : r axial coordinate + 2^28 offset (29 bits)

All functions accept scalars or numpy arrays and are fully vectorized —
they are called from Arrow-batched pandas UDFs, never per-row.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 13
_OFF = 1 << 28
_SQRT3 = np.sqrt(3.0)
# res-0 hex circumradius in degrees; aperture-7 scaling like H3.
_BASE_SIZE = 20.0
_SQRT7 = np.sqrt(7.0)

# axial neighbor directions (pointy-top), E, NE, NW, W, SW, SE
_DIRS = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64)


def cell_size(res) -> np.ndarray:
    """Hex circumradius in degrees at resolution ``res`` (vectorized)."""
    return _BASE_SIZE / np.power(_SQRT7, np.asarray(res, dtype=np.float64))


def latlng_to_cell(lat, lng, res):
    """Encode lon/lat to hex cell id at ``res``. Vectorized over all args."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    res = np.asarray(res, dtype=np.int64)
    size = cell_size(res)
    # pointy-top axial coords
    qf = (_SQRT3 / 3.0 * lng - lat / 3.0) / size
    rf = (2.0 / 3.0 * lat) / size
    q, r = _axial_round(qf, rf)
    return _pack(res, q, r)


def cell_to_latlng(cell):
    """Cell id -> (lat, lng) of hex center. Vectorized."""
    res, q, r = _unpack(cell)
    size = cell_size(res)
    lng = size * _SQRT3 * (q.astype(np.float64) + r.astype(np.float64) / 2.0)
    lat = size * 1.5 * r.astype(np.float64)
    return lat, lng


def cell_resolution(cell):
    return (np.asarray(cell, dtype=np.int64) >> 58) & 0xF


def cell_to_parent(cell, parent_res):
    """Cell at ``parent_res`` containing this cell's center."""
    lat, lng = cell_to_latlng(cell)
    return latlng_to_cell(lat, lng, parent_res)


def cell_to_boundary(cell):
    """(N, 6, 2) array of (lat, lng) hex vertices."""
    res, q, r = _unpack(cell)
    size = np.atleast_1d(cell_size(res))
    clat, clng = cell_to_latlng(cell)
    clat, clng = np.atleast_1d(clat), np.atleast_1d(clng)
    ang = np.deg2rad(30.0 + 60.0 * np.arange(6))  # pointy-top vertex angles
    vlng = clng[:, None] + size[:, None] * np.cos(ang)[None, :]
    vlat = clat[:, None] + size[:, None] * np.sin(ang)[None, :]
    return np.stack([vlat, vlng], axis=-1)


def disk_offsets(k: int) -> list[tuple[int, int]]:
    """Axial (dq, dr) offsets of the grid disk of radius ``k`` — the single
    enumeration shared by ``grid_disk`` and the kNN operator's codegen disk
    expansion (which adds ``dq·2^29 + dr`` to the packed cell id)."""
    return [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)
    ]


def grid_disk(cell, k: int) -> np.ndarray:
    """All cells within grid distance k of ``cell`` (scalar in, 1-D ids out).

    Used by the kNN operator to expand candidate rings (SURVEY.md §2.3 J9).
    """
    res, q, r = (int(x) for x in _unpack(np.int64(cell)))
    offs = disk_offsets(k)
    return _pack(
        np.full(len(offs), res, dtype=np.int64),
        np.asarray([q + dq for dq, _ in offs], dtype=np.int64),
        np.asarray([r + dr for _, dr in offs], dtype=np.int64),
    )


def grid_ring(cell, k: int) -> np.ndarray:
    """Cells at exactly grid distance k (the hollow ring)."""
    if k == 0:
        return np.asarray([np.int64(cell)], dtype=np.int64)
    res, q, r = (int(x) for x in _unpack(np.int64(cell)))
    # start k steps in direction 4 (SW), walk each of 6 sides k times
    cq, cr = q + _DIRS[4][0] * k, r + _DIRS[4][1] * k
    qs, rs = [], []
    for side in range(6):
        for _ in range(k):
            qs.append(cq)
            rs.append(cr)
            cq += _DIRS[side][0]
            cr += _DIRS[side][1]
    return _pack(
        np.full(len(qs), res, dtype=np.int64),
        np.asarray(qs, dtype=np.int64),
        np.asarray(rs, dtype=np.int64),
    )


def grid_distance(a, b) -> np.ndarray:
    """Hex grid distance between cells of equal resolution. Vectorized."""
    ra, qa, aa = _unpack(a)
    rb, qb, bb = _unpack(b)
    dq = qa - qb
    dr = aa - bb
    return ((np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2).astype(np.int64)


def bbox_to_cells(minx: float, miny: float, maxx: float, maxy: float, res: int) -> np.ndarray:
    """All cells whose hex overlaps the lon/lat bbox (superset-safe cover).

    Enumerates the axial-coordinate range of the bbox padded by one cell
    circumradius, then keeps cells whose center is within one circumradius of
    the bbox — a guaranteed superset of truly-intersecting cells (candidates
    are pruned by the exact geometry test in the spatial join's second phase,
    so over-cover costs a little compute, never correctness).
    """
    size = float(cell_size(res))
    pad = size * 1.001
    corners_lng = np.array([minx - pad, maxx + pad, minx - pad, maxx + pad])
    corners_lat = np.array([miny - pad, miny - pad, maxy + pad, maxy + pad])
    qf = (_SQRT3 / 3.0 * corners_lng - corners_lat / 3.0) / size
    rf = (2.0 / 3.0 * corners_lat) / size
    q0, q1 = int(np.floor(qf.min())) - 1, int(np.ceil(qf.max())) + 1
    r0, r1 = int(np.floor(rf.min())) - 1, int(np.ceil(rf.max())) + 1
    qs, rs = np.meshgrid(np.arange(q0, q1 + 1), np.arange(r0, r1 + 1), indexing="ij")
    qs, rs = qs.ravel(), rs.ravel()
    clng = size * _SQRT3 * (qs + rs / 2.0)
    clat = size * 1.5 * rs
    keep = (
        (clng >= minx - pad) & (clng <= maxx + pad) & (clat >= miny - pad) & (clat <= maxy + pad)
    )
    return _pack(
        np.full(keep.sum(), res, dtype=np.int64),
        qs[keep].astype(np.int64),
        rs[keep].astype(np.int64),
    )


def polygon_to_cells(lats: np.ndarray, lngs: np.ndarray, res: int) -> np.ndarray:
    """Cells overlapping a polygon's envelope (bbox cover; exact test downstream)."""
    return bbox_to_cells(float(lngs.min()), float(lats.min()), float(lngs.max()), float(lats.max()), res)


def res_for_extent(extent_deg, min_res: int = 5, max_res: int = 12) -> np.ndarray:
    """Pick the resolution whose cell size best matches an object extent.

    Mirrors the reference planner's size-threshold plan switch
    (``inference_planner.py:153-163``): bigger AOIs get coarser cells so each
    cell holds ~bounded work. Vectorized; clamps to [min_res, max_res] per the
    north rule's res 5–12 band.
    """
    extent = np.maximum(np.asarray(extent_deg, dtype=np.float64), 1e-12)
    # want cell_size ≈ extent → res = log_sqrt7(BASE / extent)
    res = np.floor(np.log(_BASE_SIZE / extent) / np.log(_SQRT7)).astype(np.int64)
    return np.clip(res, min_res, max_res)


def _axial_round(qf, rf):
    # floor(x + 0.5) instead of np.round: identical semantics in numpy, Spark
    # SQL, and DuckDB (banker's rounding is not portable across engines)
    sf = -qf - rf
    q = np.floor(qf + 0.5)
    r = np.floor(rf + 0.5)
    s = np.floor(sf + 0.5)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _pack(res, q, r):
    if np.any((q + _OFF < 0) | (q + _OFF >= (1 << 29)) | (r + _OFF < 0) | (r + _OFF >= (1 << 29))):
        raise ValueError("axial coordinate out of 29-bit range — resolution too fine")
    return (res.astype(np.int64) << 58) | ((q + _OFF) << 29) | (r + _OFF)


def _unpack(cell):
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> 58) & 0xF
    q = ((cell >> 29) & ((1 << 29) - 1)) - _OFF
    r = (cell & ((1 << 29) - 1)) - _OFF
    return res, q, r
