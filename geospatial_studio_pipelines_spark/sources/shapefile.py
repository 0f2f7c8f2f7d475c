"""ESRI Shapefile vector source (SURVEY.md §2.1 S7 format breadth).

The reference reads shapefile LULC tile indexes
(``postprocess_generic_helper_functions.py:333-335``, via geopandas/GDAL)
and gpkg/shp uploads (``user_store_download_operations.py:54-63``). No GDAL
exists here, so this is a from-scratch reader of the two public formats
involved: the ESRI shapefile main file (.shp, ESRI white paper layout) and
its dBase III attribute table (.dbf).

Spark-first shape: ``read_shapefile`` scans ``*.shp`` through Spark's
``binaryFile`` source — one task per FILE — and parses records inside an
Arrow batch, emitting the engine's native vector row
``(geom_wkb, minx, miny, maxx, maxy, *attributes)`` — identical to
``read_geojsonl``'s output, so every downstream spatial op (clip, joins,
mask-from-layer) consumes it unchanged. A tile-index directory of thousands
of shapefiles parallelizes across executors; a single .shp is one task
(the format is not block-splittable without external indexing — at 10^12
scale vector layers are the SMALL side).

Supported shapes: Polygon (type 5; multi-ring records become one polygon
with holes), Null (type 0, skipped). Attribute types: C→string, N/F→double
(long when 0 decimals), L→boolean, D→string.
"""

from __future__ import annotations

import glob as _glob
import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geo import wkb

_SHAPE_NULL = 0
_SHAPE_POLYGON = 5


def parse_shp(buf: bytes) -> list[list[np.ndarray]]:
    """Parse a .shp main file → list of ring-lists (one per record).
    Layout per the public ESRI spec: 100-byte header (file code 9994
    big-endian at 0, shape type little-endian at 32), then records of
    (record number int32 BE, content length in 16-bit words int32 BE)
    followed by record content."""
    if len(buf) < 100 or struct.unpack(">i", buf[0:4])[0] != 9994:
        raise ValueError("not a shapefile: bad file code")
    file_len = struct.unpack(">i", buf[24:28])[0] * 2  # 16-bit words → bytes
    out: list[list[np.ndarray]] = []
    pos = 100
    while pos + 8 <= min(file_len, len(buf)):
        content_words = struct.unpack(">i", buf[pos + 4 : pos + 8])[0]
        pos += 8
        end = pos + content_words * 2
        shape_type = struct.unpack("<i", buf[pos : pos + 4])[0]
        if shape_type == _SHAPE_NULL:
            pos = end
            continue
        if shape_type != _SHAPE_POLYGON:
            raise ValueError(f"unsupported shape type {shape_type} (only Polygon/Null)")
        num_parts, num_points = struct.unpack("<ii", buf[pos + 36 : pos + 44])
        parts = np.frombuffer(buf, dtype="<i4", count=num_parts, offset=pos + 44)
        pts = np.frombuffer(
            buf, dtype="<f8", count=2 * num_points, offset=pos + 44 + 4 * num_parts
        ).reshape(num_points, 2)
        bounds = np.concatenate([parts, [num_points]])
        rings = [pts[s:e].copy() for s, e in zip(bounds[:-1], bounds[1:])]
        out.append(rings)
        pos = end
    return out


def parse_dbf(buf: bytes) -> pd.DataFrame:
    """Parse a dBase III .dbf attribute table (the public xBase layout):
    32-byte header (record count LE uint32 at 4, header size LE uint16 at 8,
    record size at 10), 32-byte field descriptors until 0x0D, then
    fixed-width records, each prefixed by a deletion flag byte."""
    n_rec = struct.unpack("<I", buf[4:8])[0]
    hdr_size, rec_size = struct.unpack("<HH", buf[8:12])
    fields = []  # (name, type, length)
    pos = 32
    while pos < hdr_size - 1 and buf[pos] != 0x0D:
        name = buf[pos : pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    cols: dict[str, list] = {name: [] for name, *_ in fields}
    pos = hdr_size
    for _ in range(n_rec):
        rec = buf[pos : pos + rec_size]
        pos += rec_size
        if not rec or rec[0:1] == b"*":  # deleted row
            continue
        off = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[off : off + flen]
            off += flen
            txt = raw.decode("ascii", errors="replace").strip()
            if ftype in ("N", "F"):
                if not txt:
                    cols[name].append(None)
                elif ftype == "N" and fdec == 0 and "." not in txt:
                    cols[name].append(int(txt))
                else:
                    cols[name].append(float(txt))
            elif ftype == "L":
                cols[name].append(txt.upper() in ("T", "Y") if txt else None)
            else:  # C, D and anything else: text
                cols[name].append(txt or None)
    return pd.DataFrame(cols)


def _dbf_spark_schema(buf: bytes) -> str:
    parts = []
    pos = 32
    hdr_size = struct.unpack("<H", buf[8:10])[0]
    while pos < hdr_size - 1 and buf[pos] != 0x0D:
        name = buf[pos : pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        fdec = buf[pos + 17]
        if ftype in ("N", "F"):
            t = "long" if (ftype == "N" and fdec == 0) else "double"
        elif ftype == "L":
            t = "boolean"
        else:
            t = "string"
        parts.append(f"{name} {t}")
        pos += 32
    return ", ".join(parts)


def read_shapefile(spark, path: str, attrs_schema: str | None = None) -> DataFrame:
    """Scan shapefile(s) → (geom_wkb, minx, miny, maxx, maxy, *attributes).

    ``path`` is a file, directory, or glob of ``.shp`` files; the sibling
    ``.dbf`` (same stem) supplies attributes when present. One Spark task
    per file via the ``binaryFile`` source — records parse executor-side,
    never on the driver. ``attrs_schema`` (Spark DDL, e.g. ``"name string,
    area double"``) pins the attribute schema; when None it is derived by
    reading ONE sibling .dbf header on the driver (local paths only — pass
    it explicitly for object-store globs)."""
    pattern = path
    if not _glob.has_magic(pattern) and not pattern.endswith(".shp"):
        pattern = os.path.join(pattern, "*.shp")
    if attrs_schema is None:
        shps = sorted(_glob.glob(pattern))
        if not shps:
            raise FileNotFoundError(f"no .shp matches {pattern}")
        dbf_path = shps[0][:-4] + ".dbf"
        attrs_schema = (
            _dbf_spark_schema(open(dbf_path, "rb").read()) if os.path.exists(dbf_path) else ""
        )
    out_schema = "geom_wkb binary, minx double, miny double, maxx double, maxy double"
    attr_names = []
    if attrs_schema:
        out_schema += ", " + attrs_schema
        attr_names = [a.strip().split(" ")[0] for a in attrs_schema.split(",")]

    files = spark.read.format("binaryFile").load(pattern).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                rings_per_rec = parse_shp(bytes(row["content"]))
                rows = []
                for rings in rings_per_rec:
                    ext = rings[0]
                    rows.append(
                        {
                            "geom_wkb": wkb.dumps_polygon(rings),
                            "minx": float(ext[:, 0].min()),
                            "miny": float(ext[:, 1].min()),
                            "maxx": float(ext[:, 0].max()),
                            "maxy": float(ext[:, 1].max()),
                        }
                    )
                out = pd.DataFrame(
                    rows, columns=["geom_wkb", "minx", "miny", "maxx", "maxy"]
                )
                if attr_names:
                    dbf_path = row["path"].removeprefix("file:")[: -len(".shp")] + ".dbf"
                    if os.path.exists(dbf_path):
                        attrs = parse_dbf(open(dbf_path, "rb").read())
                        for a in attr_names:
                            out[a] = attrs[a].to_numpy()[: len(out)] if a in attrs else None
                    else:
                        for a in attr_names:
                            out[a] = None
                yield out

    return files.mapInPandas(parse, out_schema)


def write_shapefile(pdf: pd.DataFrame, path_stem: str, geom_col: str = "geom_wkb") -> None:
    """Driver-side .shp/.dbf writer for SMALL layers (test fixtures, AOI
    exports — the reference's shapefile artifacts are single small files).
    Attributes: every non-geometry column; ints → N(18,0), floats →
    N(18,6), rest → C(64)."""
    recs = [wkb.polygon_rings(bytes(b)) for b in pdf[geom_col]]
    shp_records = []
    gminx = gminy = np.inf
    gmaxx = gmaxy = -np.inf
    for i, rings in enumerate(recs):
        all_pts = np.concatenate(rings)
        minx, miny = all_pts.min(axis=0)
        maxx, maxy = all_pts.max(axis=0)
        gminx, gminy = min(gminx, minx), min(gminy, miny)
        gmaxx, gmaxy = max(gmaxx, maxx), max(gmaxy, maxy)
        parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
        content = struct.pack("<i", _SHAPE_POLYGON)
        content += struct.pack("<4d", minx, miny, maxx, maxy)
        content += struct.pack("<ii", len(rings), len(all_pts))
        content += parts.tobytes() + all_pts.astype("<f8").tobytes()
        shp_records.append(struct.pack(">ii", i + 1, len(content) // 2) + content)
    body = b"".join(shp_records)
    header = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    header += struct.pack(">i", (100 + len(body)) // 2)
    header += struct.pack("<ii", 1000, _SHAPE_POLYGON)
    header += struct.pack("<4d", gminx, gminy, gmaxx, gmaxy)
    header += struct.pack("<4d", 0, 0, 0, 0)  # z/m ranges
    with open(path_stem + ".shp", "wb") as f:
        f.write(header + body)
    attr_cols = [c for c in pdf.columns if c != geom_col]
    fields = []
    for c in attr_cols:
        if pd.api.types.is_integer_dtype(pdf[c]):
            fields.append((c, "N", 18, 0))
        elif pd.api.types.is_float_dtype(pdf[c]):
            fields.append((c, "N", 18, 6))
        else:
            fields.append((c, "C", 64, 0))
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    dbf = bytearray()
    dbf += struct.pack("<B3BIHH20x", 3, 0, 1, 1, len(pdf), hdr_size, rec_size)
    for name, ftype, flen, fdec in fields:
        dbf += struct.pack("<11sc4xBB14x", name.encode()[:11], ftype.encode(), flen, fdec)
    dbf += b"\x0d"
    for _, row in pdf.iterrows():
        dbf += b" "
        for name, ftype, flen, fdec in fields:
            v = row[name]
            if ftype == "N":
                txt = ("" if pd.isna(v) else (f"{v:.{fdec}f}" if fdec else str(int(v))))
                dbf += txt.rjust(flen).encode()[:flen]
            else:
                dbf += str("" if v is None else v).ljust(flen).encode()[:flen]
    dbf += b"\x1a"
    with open(path_stem + ".dbf", "wb") as f:
        f.write(bytes(dbf))
