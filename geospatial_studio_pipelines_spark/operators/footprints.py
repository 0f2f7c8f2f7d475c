"""Footprint / metadata derivation — column expressions only (no UDF).

The reference derives an image's spatial extent from raster file metadata
(``raster_data_operations.py:34-45`` get_raster_bbox) and its acquisition
date from a filename regex (``user_store_download_operations.py:92-97``).
Here the same derivation happens as Catalyst expressions over the input-hint
columns, per the FIXTURES.md formulas, so it costs one codegen'd projection
over the scan — the plan shows a single WholeStageCodegen span with the
parquet scan's ReadSchema limited to the referenced columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import spatial as S


def with_footprint(images: DataFrame, m_per_px: float = 10.0) -> DataFrame:
    """Add lon/lat center, bbox (flat minx..maxy), date, modality, ordinal.

    ``ordinal`` (the i in img-{i:08d}) is parsed from image_id — the analog
    of the reference's filename-regex metadata extraction.
    """
    i = F.regexp_extract(F.col("image_id"), r"img-(\d+)", 1).cast("long").alias("ordinal")
    lon = S.center_lon(F.col("phash"))
    lat = S.center_lat(F.col("phash"))
    df = images.withColumns({"ordinal": i, "lon": lon, "lat": lat})
    bbox = S.footprint_bbox(F.col("lat"), F.col("lon"), F.col("w"), F.col("h"), m_per_px)
    return df.withColumns(
        {
            "minx": bbox[0],
            "miny": bbox[1],
            "maxx": bbox[2],
            "maxy": bbox[3],
            "date": S.acquisition_date(F.col("phash")),
            "modality": S.modality(F.col("ordinal")),
        }
    )


def extent_deg() -> Column:
    """max(bbox width, height) in degrees — drives per-image resolution choice."""
    return F.greatest(F.col("maxx") - F.col("minx"), F.col("maxy") - F.col("miny"))
