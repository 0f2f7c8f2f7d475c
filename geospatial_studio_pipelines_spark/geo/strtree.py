"""Packed Sort-Tile-Recursive (STR) R-tree over bounding boxes — pure numpy.

The reference relies on geopandas ``sjoin`` whose candidate pruning is a
shapely STRtree (``postprocess_generic_helper_functions.py:368``). This is the
same data structure, built once on the driver over the (small) AOI side,
pickled into a Spark **broadcast variable**, and queried inside Arrow-batched
UDF workers — the "broadcast R-tree-packed AOI polygons" of the north rule.

Packed layout = contiguous numpy arrays (no pointers), so pickling for
broadcast is cheap and queries are cache-friendly. Query cost O(log n + k).
"""

from __future__ import annotations

import numpy as np

_NODE_CAP = 16


class STRtree:
    """Static packed R-tree. ``boxes``: (N, 4) [minx, miny, maxx, maxy]."""

    def __init__(self, boxes: np.ndarray):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        if self.n == 0:
            self.levels: list[np.ndarray] = []
            self.order = np.empty(0, dtype=np.int64)
            self.leaf_boxes = boxes
            return
        # STR packing: sort by center-x, slice into vertical strips, sort each
        # strip by center-y — yields spatially coherent leaf runs.
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        nleaf = int(np.ceil(self.n / _NODE_CAP))
        nstrips = max(1, int(np.ceil(np.sqrt(nleaf))))
        strip_size = int(np.ceil(self.n / nstrips))
        order = np.argsort(cx, kind="stable")
        for s in range(nstrips):
            sl = slice(s * strip_size, min((s + 1) * strip_size, self.n))
            idx = order[sl]
            order[sl] = idx[np.argsort(cy[idx], kind="stable")]
        self.order = order.astype(np.int64)
        self.leaf_boxes = boxes[self.order]
        # build upper levels bottom-up: level[i] = (M, 4) node MBRs
        self.levels = []
        cur = self.leaf_boxes
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / _NODE_CAP))
            nxt = np.empty((m, 4), dtype=np.float64)
            for i in range(m):
                chunk = cur[i * _NODE_CAP : (i + 1) * _NODE_CAP]
                nxt[i, 0] = chunk[:, 0].min()
                nxt[i, 1] = chunk[:, 1].min()
                nxt[i, 2] = chunk[:, 2].max()
                nxt[i, 3] = chunk[:, 3].max()
            self.levels.append(nxt)
            cur = nxt
        self.levels.reverse()  # levels[0] = root level

    def query(self, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
        """Original indices of boxes whose MBR intersects the query box."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        if self.levels:
            nodes = np.arange(len(self.levels[0]), dtype=np.int64)
            for i, lvl in enumerate(self.levels):
                b = lvl[nodes]
                hit = (b[:, 0] <= maxx) & (b[:, 2] >= minx) & (b[:, 1] <= maxy) & (b[:, 3] >= miny)
                nodes = nodes[hit]
                child = (nodes[:, None] * _NODE_CAP + np.arange(_NODE_CAP)[None, :]).ravel()
                next_size = len(self.levels[i + 1]) if i + 1 < len(self.levels) else len(self.leaf_boxes)
                nodes = child[child < next_size]
        else:  # n <= _NODE_CAP: single leaf run, no upper levels
            nodes = np.arange(len(self.leaf_boxes), dtype=np.int64)
        b = self.leaf_boxes[nodes]
        hit = (b[:, 0] <= maxx) & (b[:, 2] >= minx) & (b[:, 1] <= maxy) & (b[:, 3] >= miny)
        return self.order[nodes[hit]]

    def query_many(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch query: (Q,4) boxes -> (query_idx, tree_idx) candidate pairs.

        Level-synchronous frontier traversal, vectorized across ALL queries
        at once: the frontier is a flat (query_idx, node_idx) pair array that
        is MBR-tested and child-expanded per level with numpy ops — no
        Python-per-query loop (a 16k-row Arrow batch costs a handful of
        numpy passes, not 16k tree walks)."""
        q = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        nq = len(q)
        if self.n == 0 or nq == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        if self.levels:
            nroot = len(self.levels[0])
            qi = np.repeat(np.arange(nq, dtype=np.int64), nroot)
            nodes = np.tile(np.arange(nroot, dtype=np.int64), nq)
            for i, lvl in enumerate(self.levels):
                b = lvl[nodes]
                qb = q[qi]
                hit = (
                    (b[:, 0] <= qb[:, 2]) & (b[:, 2] >= qb[:, 0])
                    & (b[:, 1] <= qb[:, 3]) & (b[:, 3] >= qb[:, 1])
                )
                qi, nodes = qi[hit], nodes[hit]
                child = (nodes[:, None] * _NODE_CAP + np.arange(_NODE_CAP)[None, :]).ravel()
                qi = np.repeat(qi, _NODE_CAP)
                next_size = len(self.levels[i + 1]) if i + 1 < len(self.levels) else len(self.leaf_boxes)
                ok = child < next_size
                qi, nodes = qi[ok], child[ok]
        else:  # n <= _NODE_CAP: single leaf run, no upper levels
            nleaf = len(self.leaf_boxes)
            qi = np.repeat(np.arange(nq, dtype=np.int64), nleaf)
            nodes = np.tile(np.arange(nleaf, dtype=np.int64), nq)
        b = self.leaf_boxes[nodes]
        qb = q[qi]
        hit = (
            (b[:, 0] <= qb[:, 2]) & (b[:, 2] >= qb[:, 0])
            & (b[:, 1] <= qb[:, 3]) & (b[:, 3] >= qb[:, 1])
        )
        return qi[hit], self.order[nodes[hit]]
