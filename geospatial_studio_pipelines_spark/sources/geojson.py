"""GeoJSON vector sink/source (SURVEY.md §2.1 S6) + ingest format validation
(S15).

The reference's postprocess step writes detected shapes as GeoJSON
(``postprocess_generic_helper_functions.py`` geojson outputs) and its ingest
validates/converts rasters to COG (``claimed_curated_upload_v2.py:383-425``).
Spark-first re-expression:

* ``write_geojsonl`` — newline-delimited GeoJSON (one Feature per line, the
  GDAL "GeoJSONSeq" layout): each partition writes its own part file via the
  text sink, so a 10^9-feature export never funnels through the driver. A
  FeatureCollection wrapper (``read back with to_feature_collection``) is a
  driver-side convenience for small exports only.
* ``read_geojsonl`` — the inverse scan: text source → ``from_json`` →
  WKB-encoded geometry + flattened bbox columns, the engine's native vector
  shape (flat bbox columns make the scan prunable, SURVEY §2.1 S7).
* ``validate_images`` — the S15 ingest gate: per-row codec validation
  (magic bytes + decode attempt + dimension check) producing a ``valid`` /
  ``reason`` pair; invalid rows are quarantined by filter, not by task
  failure (``verify_input_image``, ``claimed_curated_upload_v2.py:304-331``).
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codecs.image import decode_image
from ..geo import wkb


def _rings_to_geojson_coords(rings: list[np.ndarray]) -> list:
    return [[[float(x), float(y)] for x, y in r] for r in rings]


def write_geojsonl(
    df: DataFrame,
    path: str,
    geom_col: str = "geom_wkb",
    props: tuple[str, ...] = (),
) -> None:
    """Distributed newline-delimited GeoJSON export: WKB → Feature JSON per
    row inside an Arrow batch, then the plain text sink (one file per
    partition, no driver funnel)."""

    def to_feature(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for _, row in pdf.iterrows():
                rings = wkb.polygon_rings(bytes(row[geom_col]))
                feat = {
                    "type": "Feature",
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": _rings_to_geojson_coords(rings),
                    },
                    "properties": {p: _json_safe(row[p]) for p in props},
                }
                lines.append(json.dumps(feat, separators=(",", ":"), sort_keys=True))
            yield pd.DataFrame({"value": lines})

    df.select(geom_col, *props).mapInPandas(to_feature, "value string").write.mode(
        "overwrite"
    ).text(path)


def _json_safe(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v


def read_geojsonl(spark, path: str, props_schema: str = "") -> DataFrame:
    """Scan of a GeoJSONSeq export: text source → JSON parse per Arrow batch
    → (geom_wkb, bbox columns, properties). Flat bbox columns restore
    predicate pushdown for downstream spatial filters."""
    txt = spark.read.text(path)
    out_schema = "geom_wkb binary, minx double, miny double, maxx double, maxy double"
    prop_names = []
    if props_schema:
        out_schema += ", " + props_schema
        prop_names = [p.strip().split(" ")[0] for p in props_schema.split(",")]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                feat = json.loads(line)
                rings = [np.asarray(r, dtype=np.float64) for r in feat["geometry"]["coordinates"]]
                ext = rings[0]
                row = {
                    "geom_wkb": wkb.dumps_polygon(rings),
                    "minx": float(ext[:, 0].min()),
                    "miny": float(ext[:, 1].min()),
                    "maxx": float(ext[:, 0].max()),
                    "maxy": float(ext[:, 1].max()),
                }
                for p in prop_names:
                    row[p] = feat["properties"].get(p)
                rows.append(row)
            yield pd.DataFrame(rows, columns=["geom_wkb", "minx", "miny", "maxx", "maxy", *prop_names])

    return txt.mapInPandas(parse, out_schema)


def to_feature_collection(df: DataFrame, geom_col: str = "geom_wkb", props: tuple[str, ...] = ()) -> dict:
    """Driver-side FeatureCollection for SMALL result sets (the reference's
    single-file geojson artifact). Collects — do not call on a 10^9-row df."""
    feats = []
    for row in df.select(geom_col, *props).collect():
        rings = wkb.polygon_rings(bytes(row[geom_col]))
        feats.append(
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": _rings_to_geojson_coords(rings)},
                "properties": {p: _json_safe(row[p]) for p in props},
            }
        )
    return {"type": "FeatureCollection", "features": feats}


# ------------------------------------------------- S15: ingest format gate


def validate_images(
    df: DataFrame,
    bytes_col: str = "bytes",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Ingest-time format validation (``verify_input_image`` +
    COG-validate step, claimed_curated_upload_v2.py:304-331, :383-425):
    decode each blob, check it decodes at all and matches the declared
    dimensions. Emits ``valid boolean, reason string`` — quarantine by
    filter; a poisoned object must not kill the ingest job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            valid, reason = [], []
            for _, row in pdf.iterrows():
                try:
                    arr = decode_image(bytes(row[bytes_col]))
                    if arr.shape[0] != int(row[h_col]) or arr.shape[1] != int(row[w_col]):
                        valid.append(False)
                        reason.append(
                            f"dimension mismatch: decoded {arr.shape[1]}x{arr.shape[0]}, "
                            f"declared {row[w_col]}x{row[h_col]}"
                        )
                    else:
                        valid.append(True)
                        reason.append(None)
                except Exception as e:  # noqa: BLE001 — the gate's whole job
                    valid.append(False)
                    reason.append(f"decode failed: {e}")
            out = pdf.copy()
            out["valid"] = valid
            out["reason"] = reason
            yield out

    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes) + ", valid boolean, reason string"
    return df.mapInPandas(run, schema)


def quarantine_invalid(df: DataFrame, bytes_col: str = "bytes") -> tuple[DataFrame, DataFrame]:
    """(valid_rows, quarantined_rows_with_reason)."""
    flagged = validate_images(df, bytes_col)
    return (
        flagged.filter(F.col("valid")).drop("valid", "reason"),
        flagged.filter(~F.col("valid")).drop("valid"),
    )
