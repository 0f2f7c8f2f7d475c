"""kNN join via cell-ring expansion + per-partition local heaps (SURVEY §2.3 J9).

Not present in the reference (its only "nearest" op is the 1-NN in time,
``inference_planner_functions.py:180-198``); required by the north rule.

Algorithm (all DataFrame ops; driver only iterates over ring radii):

1. assign every point its hex cell at ``res``
2. round r: explode each *unresolved* query to ``grid_disk(cell, radius)``,
   equi-join against points-by-cell → candidates
3. **map-side top-k** (the "per-partition local heap"): inside each shuffle
   partition keep at most k candidates per query before the exchange — the
   top-k analog of a partial aggregation, bounding shuffle rows at
   k × partitions instead of the full candidate set
4. global top-k per query via window rank over (dist², neighbor_id)
5. a query is **provably resolved** when it has k neighbors and its k-th
   distance ≤ the minimum possible distance to any point outside the
   explored disk: points in cells at grid distance > g are ≥
   (1.5·g − 2)·R away (hex center spacing 1.5·R per grid step in the
   worst staircase direction, minus 2R for within-cell offsets)
6. unresolved queries (sparse regions) escalate: radius ×4, and finally a
   broadcast brute-force pass for any stragglers — correctness never
   depends on the density heuristic.

Distance metric: squared planar-degree (dx² + dy²) with neighbor-id
tie-break — deterministic, identical in numpy / Spark SQL / DuckDB (pure
polynomial arithmetic), per FIXTURES.md T6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import spatial as S
from ..index import hexgrid


def knn_join(
    points: DataFrame,
    k: int = 8,
    res: int | None = None,
    id_col: str = "image_id",
    initial_radius: int = 2,
    max_rounds: int = 3,
) -> DataFrame:
    """Self-kNN over (id, lat, lon): returns (id, neighbor_id, dist2, rank).

    ``res=None`` picks a resolution targeting ~3k points per disk from the
    table size and a global extent assumption (the planner analog of the
    reference's size-threshold mode switch).
    """
    n = points.count()
    if res is None:
        res = choose_res(n, k)
    size = float(hexgrid.cell_size(res))

    pts = points.select(
        F.col(id_col).alias("pid"), F.col("lat"), F.col("lon")
    ).withColumn("cell", S.hex_cell(F.col("lat"), F.col("lon"), res))
    pts = pts.cache()

    targets = pts.select(
        F.col("pid").alias("nid"),
        F.col("lat").alias("nlat"),
        F.col("lon").alias("nlon"),
        F.col("cell"),
    )

    unresolved = pts
    results: DataFrame | None = None
    radius = initial_radius

    for _round in range(max_rounds):
        if unresolved.isEmpty():
            break
        cand = _disk_candidates(unresolved, targets, radius)
        # materialize the round's top-k ONCE (localCheckpoint truncates
        # lineage): it feeds the resolve test, the solved rows, AND the next
        # round's anti-join — without it every downstream action re-runs the
        # candidate join + window, tripling the iterative work
        topk = _topk(cand, k).localCheckpoint(eager=True)
        bound = (1.5 * (radius + 1) - 2.0) * size
        bound2 = bound * bound if bound > 0 else 0.0
        stats = topk.groupBy("pid").agg(
            F.count("*").alias("cnt"), F.max("dist2").alias("kth")
        )
        done_ids = stats.filter((F.col("cnt") == k) & (F.col("kth") <= F.lit(bound2))).select("pid")
        solved = topk.join(done_ids, "pid", "left_semi")
        results = solved if results is None else results.unionByName(solved)
        unresolved = unresolved.join(done_ids, "pid", "left_anti").localCheckpoint(eager=True)
        radius *= 4

    if not unresolved.isEmpty():
        # sparse stragglers: exact pass, gated — see _brute_force
        rest = _brute_force(unresolved, pts, k, n_total=n)
        results = rest if results is None else results.unionByName(rest)

    pts.unpersist()
    return results.select(F.col("pid").alias(id_col), "nid", "dist2", "rank")


def choose_res(n: int, k: int, area_deg2: float = 360.0 * 120.0) -> int:
    """Resolution whose k-ring disk holds ≈ 3k points at uniform density."""
    density = max(n, 1) / area_deg2
    target_area = 3.0 * k / density  # deg² a disk should span
    cell_area = target_area / 19.0  # disk radius 2 = 19 cells
    edge = np.sqrt(cell_area / 2.598)  # hex area = (3√3/2) R²
    return int(hexgrid.res_for_extent(np.array([edge * 2]), 0, 12)[0])


#: past this many disk offsets the codegen explode expression would bloat
#: the generated method; larger radii (rare escalation rungs) keep the
#: Arrow-batched UDF path
_DISK_EXPR_MAX_CELLS = 512


def _disk_offsets(radius: int) -> list[tuple[int, int]]:
    """Axial (dq, dr) offsets of the grid disk — delegates to the single
    enumeration in ``hexgrid.disk_offsets`` so the codegen expansion and
    the ``grid_disk`` UDF fallback cannot drift apart."""
    return hexgrid.disk_offsets(radius)


def _disk_candidates(queries: DataFrame, targets: DataFrame, radius: int) -> DataFrame:
    offsets = _disk_offsets(radius)
    if len(offsets) <= _DISK_EXPR_MAX_CELLS:
        # pure-codegen disk expansion (r7): in the cell-id packing
        # (res<<58 | (q+OFF)<<29 | (r+OFF)) a (dq, dr) neighbor step is the
        # constant add dq·2^29 + dr — identical arithmetic to grid_disk's
        # unpack/add/repack — so the whole explode stays inside
        # whole-stage codegen instead of an Arrow round-trip per round
        disk_cells = F.array(
            *[F.col("cell") + F.lit((dq << 29) + dr) for dq, dr in offsets]
        )
    else:
        from pyspark.sql.pandas.functions import pandas_udf

        @pandas_udf("array<long>")
        def disk(cells: pd.Series) -> pd.Series:
            cache: dict[int, list[int]] = {}
            out = []
            for c in cells.values:
                got = cache.get(c)
                if got is None:
                    got = hexgrid.grid_disk(np.int64(c), radius).tolist()
                    cache[c] = got
                out.append(got)
            return pd.Series(out)

        disk_cells = disk(F.col("cell"))
    q = queries.withColumn("cell", F.explode(disk_cells))
    cand = q.join(targets, "cell").filter(F.col("pid") != F.col("nid"))
    dx = F.col("lon") - F.col("nlon")
    dy = F.col("lat") - F.col("nlat")
    # no pair dedup needed: disk cells are distinct and each target lives in
    # exactly one cell, so a (pid, nid) pair is emitted at most once — the
    # former dropDuplicates was an identity costing a full candidate
    # exchange per round (removed r7; pinned by the no-dedup plan test)
    return cand.select("pid", "nid", (dx * dx + dy * dy).alias("dist2"))


def _topk(cand: DataFrame, k: int) -> DataFrame:
    # Partial ("local heap") top-k before the exchange comes from Spark's
    # own WindowGroupLimit pushdown for row_number + rank<=k filters
    # (map-side Sort + WindowGroupLimit below the exchange) — the former
    # explicit mapInPandas partial did the same bounding through an Arrow
    # round-trip per round and is gone (r7).
    w = Window.partitionBy("pid").orderBy(F.col("dist2").asc(), F.col("nid").asc())
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


#: broadcast cap for the brute-force straggler pass (~32 B per point row)
POINTS_BROADCAST_MAX_BYTES = 256 << 20


def _brute_force(queries: DataFrame, all_pts: DataFrame, k: int,
                 n_total: int | None = None) -> DataFrame:
    """Exact kNN for straggler queries. Under ``POINTS_BROADCAST_MAX_BYTES``
    the full point table is the broadcast build side (fast small-table
    path); past it the table is NEVER broadcast — the (small) straggler
    query side is broadcast instead and the point table streams by, with
    the map-side partial top-k bounding the rank shuffle at
    k × queries × partitions rows."""
    qp = queries.select("pid", "lat", "lon")
    tp = all_pts.select(
        F.col("pid").alias("nid"), F.col("lat").alias("nlat"), F.col("lon").alias("nlon")
    )
    if n_total is None:
        n_total = all_pts.count()
    if n_total * 32 <= POINTS_BROADCAST_MAX_BYTES:
        cand = qp.join(F.broadcast(tp), qp.pid != tp.nid)
    else:
        cand = tp.join(F.broadcast(qp), qp.pid != tp.nid)
    dx = F.col("lon") - F.col("nlon")
    dy = F.col("lat") - F.col("nlat")
    cand = cand.select("pid", "nid", (dx * dx + dy * dy).alias("dist2"))
    return _topk(cand, k)


def knn_oracle(pdf: pd.DataFrame, k: int = 8, id_col: str = "image_id") -> pd.DataFrame:
    """Brute-force O(n²) single-node oracle (FIXTURES.md T6 knn_oracle):
    planar-degree metric, ties by neighbor id ascending."""
    ids = pdf[id_col].to_numpy()
    lat = pdf["lat"].to_numpy(dtype=np.float64)
    lon = pdf["lon"].to_numpy(dtype=np.float64)
    rows = []
    for i in range(len(pdf)):
        d2 = (lon - lon[i]) ** 2 + (lat - lat[i]) ** 2
        order = sorted((float(d2[j]), ids[j]) for j in range(len(pdf)) if j != i)[:k]
        for r, (dist2, nid) in enumerate(order, start=1):
            rows.append((ids[i], nid, dist2, r))
    return pd.DataFrame(rows, columns=[id_col, "nid", "dist2", "rank"])
