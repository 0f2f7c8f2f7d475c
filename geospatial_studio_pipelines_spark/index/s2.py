"""S2 cell IDs — faithful, vectorized, pure-numpy implementation.

Implements the public S2 geometry cell-id scheme (quadratic projection onto
six cube faces + Hilbert space-filling curve), following the published
algorithm of the open-source s2geometry / s2sphere libraries. Provides the
subset the engine needs:

* ``latlng_to_cell(lat, lng, level)`` — encode (levels 0..30)
* ``cell_to_latlng(id)`` — cell-center decode
* ``cell_level(id)``, ``cell_parent(id, level)``
* ``range_min(id)`` / ``range_max(id)`` — Hilbert-contiguous descendant id
  range, the property that makes **range-partitioned shuffles on cell id**
  spatially clustering (north rule: "range-partitioned shuffles on cell ID")

Ids are returned reinterpreted as *signed* int64 (two's-complement) so they
fit Spark's LongType — the standard convention for storing S2 ids in
SQL engines. Hilbert ordering is preserved under the reinterpretation only
within faces 0..3; range containment (parent/descendant) is exact everywhere.

All entry points are vectorized over numpy arrays (8-iteration lookup-table
loop, no per-element Python), suitable for Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2
_MAX_SIZE = 1 << MAX_LEVEL

_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _SWAP | _INVERT)

_lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
_lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup(level: int, i: int, j: int, orig_orient: int, pos: int, orient: int) -> None:
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
        _lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(
            level,
            i + (r[idx] >> 1),
            j + (r[idx] & 1),
            orig_orient,
            pos + idx,
            orient ^ _POS_TO_ORIENT[idx],
        )


for _o in (0, _SWAP, _INVERT, _SWAP | _INVERT):
    _init_lookup(0, 0, 0, _o, 0, _o)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate(
        [
            (lambda: y / x, lambda: z / x, None),  # +x
            (lambda: -x / y, lambda: z / y, None),  # +y
            (lambda: -x / z, lambda: -y / z, None),  # +z
            (lambda: z / x, lambda: y / x, None),  # -x
            (lambda: z / y, lambda: -x / y, None),  # -y
            (lambda: -y / z, lambda: -x / z, None),  # -z
        ]
    ):
        m = face == f
        if np.any(m):
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(m, ue(), u)
                v = np.where(m, ve(), v)
    return face, u, v


def _face_uv_to_xyz(face, u, v):
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    one = np.ones_like(u)
    table = [
        (one, u, v),
        (-u, one, v),
        (-u, -v, one),
        (-one, -v, -u),
        (v, -one, -u),
        (v, u, -one),
    ]
    for f, (xe, ye, ze) in enumerate(table):
        m = face == f
        x = np.where(m, xe, x)
        y = np.where(m, ye, y)
        z = np.where(m, ze, z)
    return x, y, z


def _uv_to_st(u):
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _st_to_uv(s):
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def _st_to_ij(s):
    return np.clip(np.floor(_MAX_SIZE * s), 0, _MAX_SIZE - 1).astype(np.uint64)


def latlng_to_cell(lat, lng, level=MAX_LEVEL):
    """Encode (lat, lng) degrees to S2 cell id at ``level``; int64-reinterpreted."""
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lng = np.atleast_1d(np.asarray(lng, dtype=np.float64))
    phi = np.deg2rad(lat)
    theta = np.deg2rad(lng)
    cos_phi = np.cos(phi)
    x = np.cos(theta) * cos_phi
    y = np.sin(theta) * cos_phi
    z = np.sin(phi)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    leaf = _from_face_ij(face.astype(np.uint64), i, j)
    out = cell_parent_u64(leaf, level)
    return out.astype(np.int64)


def _from_face_ij(face, i, j):
    n = face << np.uint64(60)
    bits = face & np.uint64(_SWAP)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = np.uint64(k * _LOOKUP_BITS)
        bits += ((i >> kk) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> kk) & mask) << np.uint64(2)
        bits = _lookup_pos[bits.astype(np.int64)]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    return n * np.uint64(2) + np.uint64(1)


def _to_face_ij(cell):
    """Invert Hilbert: uint64 leaf-normalized id -> (face, i, j)."""
    face = cell >> np.uint64(61)
    bits = face & np.uint64(_SWAP)
    i = np.zeros_like(cell)
    j = np.zeros_like(cell)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        bits += ((cell >> np.uint64(k * 2 * _LOOKUP_BITS + 1)) & np.uint64((1 << (2 * nbits)) - 1)) << np.uint64(2)
        bits = _lookup_ij[bits.astype(np.int64)]
        i += (bits >> np.uint64(_LOOKUP_BITS + 2)) << np.uint64(k * _LOOKUP_BITS)
        j += ((bits >> np.uint64(2)) & np.uint64((1 << _LOOKUP_BITS) - 1)) << np.uint64(k * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    return face, i, j


def cell_level(cell) -> np.ndarray:
    """Level of a cell id (vectorized)."""
    c = np.atleast_1d(np.asarray(cell)).astype(np.uint64)
    lsb = c & (~c + np.uint64(1))
    # level = MAX_LEVEL - (bit_position(lsb) >> 1)
    bitpos = np.zeros_like(c, dtype=np.int64)
    tmp = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = tmp >= (np.uint64(1) << np.uint64(shift))
        bitpos += np.where(m, shift, 0)
        tmp = np.where(m, tmp >> np.uint64(shift), tmp)
    return (MAX_LEVEL - (bitpos >> 1)).astype(np.int64)


def cell_parent_u64(cell_u64, level):
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - int(level)))
    return (cell_u64 & ~(lsb - np.uint64(1))) | lsb


def cell_parent(cell, level):
    """Ancestor of ``cell`` at ``level`` (vectorized, int64 in/out)."""
    c = np.atleast_1d(np.asarray(cell)).astype(np.uint64)
    return cell_parent_u64(c, level).astype(np.int64)


def range_min(cell) -> np.ndarray:
    """Smallest leaf id contained in the cell (Hilbert range start)."""
    c = np.atleast_1d(np.asarray(cell)).astype(np.uint64)
    lsb = c & (~c + np.uint64(1))
    return (c - lsb + np.uint64(1)).astype(np.int64)


def range_max(cell) -> np.ndarray:
    """Largest leaf id contained in the cell (Hilbert range end)."""
    c = np.atleast_1d(np.asarray(cell)).astype(np.uint64)
    lsb = c & (~c + np.uint64(1))
    return (c + lsb - np.uint64(1)).astype(np.int64)


def cell_to_latlng(cell):
    """Cell id -> (lat, lng) degrees of the cell center (vectorized)."""
    c = np.atleast_1d(np.asarray(cell)).astype(np.uint64)
    # a cell id sits at the center of its Hilbert range, so decoding the id
    # itself as a curve position yields the center leaf's (i, j)
    face, i, j = _to_face_ij(c)
    # center st of the leaf cell containing (i, j): but for non-leaf ids the
    # decoded (i, j) is the leaf at the id's curve position = cell center.
    s = (i.astype(np.float64) + 0.5) / _MAX_SIZE
    t = (j.astype(np.float64) + 0.5) / _MAX_SIZE
    u = _st_to_uv(s)
    v = _st_to_uv(t)
    x, y, z = _face_uv_to_xyz(face.astype(np.int64), u, v)
    lat = np.rad2deg(np.arctan2(z, np.sqrt(x * x + y * y)))
    lng = np.rad2deg(np.arctan2(y, x))
    return lat, lng


def contains(parent, child) -> np.ndarray:
    """True where ``parent`` cell contains ``child`` cell (vectorized)."""
    return (np.asarray(range_min(parent)) <= np.asarray(range_min(child))) & (
        np.asarray(range_max(child)) <= np.asarray(range_max(parent))
    )


def token(cell) -> list[str]:
    """Canonical hex token (trailing zeros stripped), for debugging/lineage."""
    c = np.atleast_1d(np.asarray(cell)).astype(np.uint64)
    return [format(int(v), "016x").rstrip("0") or "0" for v in c]
