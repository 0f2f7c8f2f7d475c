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
    id_col: str = "image_id",
) -> DataFrame:
    """Map-side intersects join: images (with minx..maxy) × broadcast AOIs.

    Returns (id_col, aoi_id, *extra_cols). No shuffle appears in the plan.
    Id columns keep their input types — at 10^12 rows use int64 keys: a
    24M-pair output of 12-char strings moves ~5× the bytes of longs through
    Arrow and the sink.
    """
    packed = pack_aois(aoi_pdf)
    sc = images_fp.sparkSession.sparkContext
    bc = sc.broadcast(packed)
    cols = [id_col, "minx", "miny", "maxx", "maxy", *extra_cols]
    id_type = dict(images_fp.dtypes)[id_col]
    aoi_type = "bigint" if pd.api.types.is_integer_dtype(aoi_pdf["aoi_id"]) else "string"
    out_schema = f"{id_col} {id_type}, aoi_id {aoi_type}" + "".join(
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
                    id_col: pdf[id_col].to_numpy()[qi],
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
    id_col: str = "image_id",
) -> DataFrame:
    """Shuffle-based intersects join on covering-cell equality with salting.

    ``res`` picks the prune granularity: coarser → fewer cells per AOI but
    more false candidates; finer → bigger AOI replication. res 5 (≈0.15°
    cells) suits footprint-scale (≈0.05°) probes.
    """
    img_cells = explode_cover_cells(
        images_fp.select(id_col, "minx", "miny", "maxx", "maxy"), res
    ).withColumn("salt", S.salt(F.col(id_col), n_salts))

    # cell relation stays SLIM — geometry blobs never ride the candidate
    # stream (a ~250 B WKB replicated onto tens of millions of candidate
    # rows dominates shuffle + Arrow traffic; measured 6 GB at 8M probes)
    aoi_cells = explode_cover_cells(
        aois.select("aoi_id", "bbox_minx", "bbox_miny", "bbox_maxx", "bbox_maxy"),
        res,
        bbox_cols=("bbox_minx", "bbox_miny", "bbox_maxx", "bbox_maxy"),
    ).withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))

    cand = img_cells.join(aoi_cells, ["cell_id", "salt"]).select(
        id_col, "minx", "miny", "maxx", "maxy", "aoi_id", "salt"
    )

    # geometry joins the candidates via cogroup on (aoi_id, salt): the WKB
    # crosses Arrow once per GROUP, not once per row; the salt keeps a giant
    # AOI's candidates spread over n_salts groups (skew mitigation). A pair
    # that co-occurs in several covering cells has every copy in the SAME
    # group (salt is a function of the id), so dedupe is a cheap per-group
    # numpy unique — no extra exchange, no final distinct
    geoms = aois.select("aoi_id", "geom_wkb").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    pair_schema = ", ".join(f"{c} {t}" for c, t in _schema_types(cand, (id_col, "aoi_id")))

    def exact(left, right):
        # Arrow-native (applyInArrow): candidate batches reach numpy with
        # zero-copy column access — no pandas object materialization on the
        # 10M+-row candidate stream
        import pyarrow as pa

        id_type = left.schema.field(id_col).type
        aoi_type = left.schema.field("aoi_id").type
        if left.num_rows == 0 or right.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], id_type), "aoi_id": pa.array([], aoi_type)}
            )
        ids = left.column(id_col).to_numpy(zero_copy_only=False)
        _, first = np.unique(ids, return_index=True)  # per-group pair dedupe
        bb = np.column_stack(
            [left.column(c).to_numpy()[first] for c in ("minx", "miny", "maxx", "maxy")]
        )
        rings = wkb.polygon_rings(bytes(right.column("geom_wkb")[0].as_py()))
        keep = G.polygon_intersects_boxes(rings, bb)
        sel = pa.array(first[keep])
        return pa.table(
            {id_col: left.column(id_col).take(sel), "aoi_id": left.column("aoi_id").take(sel)}
        )

    return (
        cand.groupBy("aoi_id", "salt")
        .cogroup(geoms.groupBy("aoi_id", "salt"))
        .applyInArrow(exact, pair_schema)
    )


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
