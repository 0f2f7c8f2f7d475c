"""Two-strategy spatial join (intersects) — the engine's core operator.

Reference semantics: ``gpd.sjoin(..., predicate="intersects")``
(``postprocess_generic_helper_functions.py:368``) joining image footprint
bboxes against AOI/mask polygons, plus the bbox clip pre-filter
(``:273, :291``). Re-expressed for Spark's execution model:

**Strategy A — broadcast** (AOI side fits in memory; the common case: the
reference reads the *same* LULC/land-polygon layers on every task).
The driver packs AOI envelopes into an STR R-tree + decoded rings, ships one
pickled broadcast variable, and a single ``mapInPandas`` pass over the images
streams Arrow batches through (R-tree candidate lookup → exact intersects).
**Zero shuffle** — the whole join is map-side, so it scales linearly with
executors (the property the N→4N efficiency rule measures).

**Strategy B — partitioned** (both sides large). Images and AOIs are each
exploded to covering hex cells at a common resolution; the join is a plain
equi-join on ``cell_id`` that Spark shuffles **with an explicit salt** on the
image side (AOI cells replicated per salt) so a hot cell — one giant AOI or
a dense region — spreads over ``n_salts`` reducers instead of one straggler
(SURVEY.md §4 "skew handling": the reference has none; a giant AOI just makes
one slow task). Exact geometry runs per matched pair, then pairs are
de-duplicated (a pair can match in several cells).

Both strategies return the same (image_id, aoi_id) pair set; tests assert
set-equality against a brute-force oracle.
"""

from __future__ import annotations

import pickle
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import spatial as S
from ..geo import geometry as G
from ..geo import wkb
from ..geo.strtree import STRtree
from ..index import hexgrid
from .tiling import explode_cover_cells


def pack_aois(aoi_pdf: pd.DataFrame) -> bytes:
    """Driver-side: decode WKB once, pack envelopes into an STRtree, pickle
    for broadcast. Geometry decode happens once per *job*, not once per task
    (the reference re-reads the layer file in every task container)."""
    rings = [wkb.polygon_rings(b) for b in aoi_pdf["geom_wkb"]]
    boxes = np.array(
        [
            [r[0][:, 0].min(), r[0][:, 1].min(), r[0][:, 0].max(), r[0][:, 1].max()]
            for r in rings
        ],
        dtype=np.float64,
    ).reshape(-1, 4)
    tree = STRtree(boxes)
    return pickle.dumps(
        {"ids": aoi_pdf["aoi_id"].to_numpy(), "rings": rings, "tree": tree},
        protocol=pickle.HIGHEST_PROTOCOL,
    )


def broadcast_spatial_join(
    images_fp: DataFrame,
    aoi_pdf: pd.DataFrame,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Map-side intersects join: images (with minx..maxy) × broadcast AOIs.

    Returns (image_id, aoi_id, *extra_cols). No shuffle appears in the plan.
    """
    packed = pack_aois(aoi_pdf)
    sc = images_fp.sparkSession.sparkContext
    bc = sc.broadcast(packed)
    cols = ["image_id", "minx", "miny", "maxx", "maxy", *extra_cols]
    out_schema = "image_id string, aoi_id string" + "".join(
        f", {c} {t}" for c, t in _schema_types(images_fp, extra_cols)
    )

    def join_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        aois = pickle.loads(bc.value)
        tree: STRtree = aois["tree"]
        rings = aois["rings"]
        ids = aois["ids"]
        for pdf in batches:
            if pdf.empty:
                continue
            qboxes = pdf[["minx", "miny", "maxx", "maxy"]].to_numpy(dtype=np.float64)
            qi, ti = tree.query_many(qboxes)
            # exact test vectorized per AOI: one numpy pass over all candidate
            # boxes of each polygon instead of a Python call per pair
            keep = np.zeros(len(qi), dtype=bool)
            for t in np.unique(ti):
                sel = ti == t
                keep[sel] = G.polygon_intersects_boxes(rings[t], qboxes[qi[sel]])
            qi, ti = qi[keep], ti[keep]
            out = pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy()[qi],
                    "aoi_id": ids[ti],
                }
            )
            for c in extra_cols:
                out[c] = pdf[c].to_numpy()[qi]
            yield out

    return images_fp.select(*cols).mapInPandas(join_partition, out_schema)


def partitioned_spatial_join(
    images_fp: DataFrame,
    aois: DataFrame,
    res: int = 5,
    n_salts: int = 8,
) -> DataFrame:
    """Shuffle-based intersects join on covering-cell equality with salting.

    ``res`` picks the prune granularity: coarser → fewer cells per AOI but
    more false candidates; finer → bigger AOI replication. res 5 (≈0.15°
    cells) suits footprint-scale (≈0.05°) probes.
    """
    img_cells = explode_cover_cells(
        images_fp.select("image_id", "minx", "miny", "maxx", "maxy"), res
    ).withColumn("salt", S.salt(F.col("image_id"), n_salts))

    aoi_cells = explode_cover_cells(
        aois.select("aoi_id", "geom_wkb", "bbox_minx", "bbox_miny", "bbox_maxx", "bbox_maxy"),
        res,
        bbox_cols=("bbox_minx", "bbox_miny", "bbox_maxx", "bbox_maxy"),
    ).withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))

    cand = img_cells.join(aoi_cells, ["cell_id", "salt"]).select(
        "image_id", "minx", "miny", "maxx", "maxy", "aoi_id", "geom_wkb"
    )

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ring_cache: dict[bytes, list[np.ndarray]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            bb = pdf[["minx", "miny", "maxx", "maxy"]].to_numpy(dtype=np.float64)
            # vectorize per distinct AOI within the batch (grouped by geom blob)
            aoi_ids = pdf["aoi_id"].to_numpy()
            order = np.argsort(aoi_ids, kind="stable")
            bounds = np.flatnonzero(
                np.r_[True, aoi_ids[order][1:] != aoi_ids[order][:-1], True]
            )
            for s, e in zip(bounds[:-1], bounds[1:]):
                idx = order[s:e]
                key = bytes(pdf["geom_wkb"].iloc[idx[0]])
                rings = ring_cache.get(key)
                if rings is None:
                    rings = wkb.polygon_rings(key)
                    ring_cache[key] = rings
                keep[idx] = G.polygon_intersects_boxes(rings, bb[idx])
            yield pdf.loc[keep, ["image_id", "aoi_id"]]

    pairs = cand.mapInPandas(exact, "image_id string, aoi_id string")
    # a footprint and an AOI can co-occur in several covering cells → dedupe
    return pairs.distinct()


def spatial_join_oracle(images_pdf: pd.DataFrame, aoi_pdf: pd.DataFrame) -> set[tuple[str, str]]:
    """Brute-force single-node oracle over the full cross product
    (FIXTURES.md T6 join_oracle) using the same geometry kernel."""
    out = set()
    rings_by_aoi = [(r["aoi_id"], wkb.polygon_rings(r["geom_wkb"])) for _, r in aoi_pdf.iterrows()]
    for _, im in images_pdf.iterrows():
        for aid, rings in rings_by_aoi:
            if G.polygon_intersects_bbox(rings, im["minx"], im["miny"], im["maxx"], im["maxy"]):
                out.add((im["image_id"], aid))
    return out


def _schema_types(df: DataFrame, cols: tuple[str, ...]):
    m = dict(df.dtypes)
    return [(c, m[c]) for c in cols]
