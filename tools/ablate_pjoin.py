#!/usr/bin/env python
"""Ablation timing of partitioned_spatial_join variants (fresh JVM).
Attributes the reduce-stage cost among: the duplicated exchange read
(two join branches), the codegen join+filters, and the Arrow exact kernel.

Usage: python tools/ablate_pjoin.py <cores> <variant> [n_probe]
variants:
  current  — shipped operator (two branches, ReusedExchange)
  interior — interior(full)-cell branch only (codegen pairs, one exchange read)
  boundary — boundary-cell branch only (exact kernel, one exchange read)
  single   — ONE join over all cells + pass-through kernel (interior rows
             cross Arrow untested; boundary rows exact-tested)
"""
import json, os, pickle, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np
from pyspark.sql import functions as F
from geospatial_studio_pipelines_spark.session import spark_session
from geospatial_studio_pipelines_spark import datagen
from geospatial_studio_pipelines_spark.functions import spatial as S
from geospatial_studio_pipelines_spark.geo import wkb
from geospatial_studio_pipelines_spark.operators import footprints, spatial_join
from geospatial_studio_pipelines_spark.operators.spatial_join import (
    aoi_cover_cells, refpoint_owner_pred)
from geospatial_studio_pipelines_spark.operators.tiling import explode_cover_cells_expr

cores = int(sys.argv[1])
variant = sys.argv[2]
n_part = int(sys.argv[3]) if len(sys.argv) > 3 else 16_000_000
res = int(os.environ.get("PJOIN_RES", "5"))
n_salts = int(os.environ.get("PJOIN_SALTS", "1"))
INPUT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/gsp_scale_input")
spark = spark_session(app_name=f"ablate-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=int(os.environ.get("SP_SHUF", 2 * cores)),
                      extra_conf={"spark.sql.join.preferSortMergeJoin": "false"})
meta_dir = os.path.join(INPUT, "images_meta")


def dir_bytes(path):
    return sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(path) for f in fs if f.endswith(".parquet"))


spark.conf.set("spark.sql.files.maxPartitionBytes",
               str(max(262144, dir_bytes(meta_dir) // max(cores * 4, 64))))
spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")


def numeric_footprints(df):
    df = df.select("id", "w", "h", "phash").withColumns(
        {"lon": S.center_lon(F.col("phash")), "lat": S.center_lat(F.col("phash"))})
    bbox = S.footprint_bbox(F.col("lat"), F.col("lon"), F.col("w"), F.col("h"), 10.0)
    return df.withColumns(
        {"minx": bbox[0], "miny": bbox[1], "maxx": bbox[2], "maxy": bbox[3]})


def mat(df):
    df.write.format("noop").mode("overwrite").save()


small = footprints.with_footprint(datagen.images_df(spark, 4 * cores, partitions=cores))
mat(spatial_join.broadcast_spatial_join(small, datagen.aoi_pdf(16)))
fp = numeric_footprints(spark.read.parquet(meta_dir).filter(F.col("id") < n_part))
aois = datagen.aoi_df(spark, 500).withColumn(
    "aoi_id", F.substring("aoi_id", 5, 4).cast("long"))


def build_variant():
    if variant == "current":
        return spatial_join.partitioned_spatial_join(
            fp, aois, res=res, n_salts=n_salts, id_col="id")
    img_cells = explode_cover_cells_expr(
        fp.select("id", "minx", "miny", "maxx", "maxy"), res)
    acells = aoi_cover_cells(aois, res, with_geom=False).localCheckpoint()
    geom_bc = spark.sparkContext.broadcast(
        dict(aois.select("aoi_id", "geom_wkb").toLocalIterator()))
    keys = ["cell_id", "salt"]
    img_cells = img_cells.withColumn("salt", S.salt(F.col("id"), n_salts))
    acells = acells.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))

    def cand_of(aoi_cells):
        c = img_cells.join(aoi_cells.hint("shuffle_hash"), keys)
        c = c.filter(
            (F.col("minx") <= F.col("aoi_maxx")) & (F.col("maxx") >= F.col("aoi_minx"))
            & (F.col("miny") <= F.col("aoi_maxy")) & (F.col("maxy") >= F.col("aoi_miny")))
        return c.filter(refpoint_owner_pred(res))

    def exact_kernel(passthrough_full):
        def exact(batches):
            import pyarrow as pa
            import pyarrow.compute as pc
            ring_cache = {}
            from geospatial_studio_pipelines_spark.geo import geometry as G
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                col = {n: rb.column(i) for i, n in enumerate(rb.schema.names)}
                aoi = col["aoi_id"].to_numpy(zero_copy_only=False)
                boxes = np.column_stack(
                    [col[c].to_numpy() for c in ("minx", "miny", "maxx", "maxy")])
                keep = np.zeros(rb.num_rows, dtype=bool)
                if passthrough_full:
                    fullm = col["full"].to_numpy(zero_copy_only=False).astype(bool)
                    keep[fullm] = True
                    todo = np.flatnonzero(~fullm)
                else:
                    todo = np.arange(rb.num_rows)
                sub = aoi[todo]
                order = np.argsort(sub, kind="stable")
                sa = sub[order]
                starts = np.flatnonzero(np.r_[True, sa[1:] != sa[:-1]])
                bounds = np.r_[starts, sa.size]
                for s, e in zip(bounds[:-1], bounds[1:]):
                    gi = todo[order[s:e]]
                    key = int(sa[s])
                    rings = ring_cache.get(key)
                    if rings is None:
                        rings = ring_cache[key] = wkb.polygon_rings(bytes(geom_bc.value[key]))
                    keep[gi] = G.polygon_intersects_boxes(rings, boxes[gi])
                idx = pa.array(np.flatnonzero(keep))
                yield pa.record_batch(
                    [pc.take(col["id"], idx), pc.take(col["aoi_id"], idx)],
                    names=["id", "aoi_id"])
        return exact

    if variant == "center":
        # prototype: image joins by its CENTER cell only; AOI cover cells
        # computed over the bbox EXPANDED by max image half-extent (+2 cells
        # safety), so any bbox-overlapping pair still meets. No image-side
        # explode (4x fewer exchange rows), no ref-point dedup (one cell per
        # image => each pair matches at most once).
        from geospatial_studio_pipelines_spark.index import hexgrid
        r = fp.agg(F.max(F.col("maxx") - F.col("minx")).alias("w"),
                   F.max(F.col("maxy") - F.col("miny")).alias("h")).first()
        size = float(hexgrid.cell_size(res))
        px = float(r["w"] or 0) / 2 + 2 * size
        py = float(r["h"] or 0) / 2 + 2 * size

        import pandas as pd
        aoi_pdf_exp = aois.toPandas()
        # expand bbox driver-side for the prototype (operator will do it in the op)
        acells2_src = spark.createDataFrame(aoi_pdf_exp.assign(
            bbox_minx=aoi_pdf_exp.bbox_minx - px, bbox_maxx=aoi_pdf_exp.bbox_maxx + px,
            bbox_miny=aoi_pdf_exp.bbox_miny - py, bbox_maxy=aoi_pdf_exp.bbox_maxy + py))
        acells2 = aoi_cover_cells(acells2_src, res, with_geom=False).localCheckpoint()
        acells2 = acells2.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
        # restore true aoi bbox columns for the candidate prune
        true_bbox = spark.createDataFrame(aoi_pdf_exp[
            ["aoi_id", "bbox_minx", "bbox_miny", "bbox_maxx", "bbox_maxy"]])
        acells2 = (acells2.drop("aoi_minx", "aoi_miny", "aoi_maxx", "aoi_maxy")
                   .join(F.broadcast(true_bbox), "aoi_id")
                   .withColumnsRenamed({"bbox_minx": "aoi_minx", "bbox_miny": "aoi_miny",
                                        "bbox_maxx": "aoi_maxx", "bbox_maxy": "aoi_maxy"}))
        imgs = fp.select("id", "minx", "miny", "maxx", "maxy").withColumns({
            "cell_id": S.hex_cell((F.col("miny") + F.col("maxy")) / 2,
                                  (F.col("minx") + F.col("maxx")) / 2, res),
            "salt": S.salt(F.col("id"), n_salts)})

        def cand2(aoi_cells):
            c = imgs.join(aoi_cells.hint("shuffle_hash"), keys)
            return c.filter(
                (F.col("minx") <= F.col("aoi_maxx")) & (F.col("maxx") >= F.col("aoi_minx"))
                & (F.col("miny") <= F.col("aoi_maxy")) & (F.col("maxy") >= F.col("aoi_miny")))

        full_pairs = cand2(acells2.filter(F.col("full"))).select("id", "aoi_id")
        sel = cand2(acells2.filter(~F.col("full"))).select(
            "id", "aoi_id", "minx", "miny", "maxx", "maxy")
        return full_pairs.unionAll(sel.mapInArrow(exact_kernel(False), "id long, aoi_id long"))
    if variant == "interior":
        return cand_of(acells.filter(F.col("full"))).select("id", "aoi_id")
    if variant == "boundary":
        sel = cand_of(acells.filter(~F.col("full"))).select(
            "id", "aoi_id", "minx", "miny", "maxx", "maxy")
        return sel.mapInArrow(exact_kernel(False), "id long, aoi_id long")
    if variant == "single":
        sel = cand_of(acells).select(
            "id", "aoi_id", "full", "minx", "miny", "maxx", "maxy")
        return sel.mapInArrow(exact_kernel(True), "id long, aoi_id long")
    raise SystemExit(f"unknown variant {variant}")


j = build_variant()
mat(j.limit(0))
runs = []
for _ in range(2):
    t0 = time.time()
    mat(j)
    runs.append(round(time.time() - t0, 2))
print("ABLATE::" + json.dumps({"cores": cores, "variant": variant, "n": n_part,
                               "res": res, "runs": runs, "best": min(runs)}))
spark.stop()
