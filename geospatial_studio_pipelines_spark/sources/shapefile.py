"""ESRI Shapefile vector source (SURVEY.md §2.1 S7 format breadth).

The reference reads shapefile LULC tile indexes
(``postprocess_generic_helper_functions.py:333-335``, via geopandas/GDAL)
and gpkg/shp uploads (``user_store_download_operations.py:54-63``), and its
upload path gates zip archives on shapefile completeness —
``.shp/.shx/.dbf`` all present (``user_store_download_operations.py:68-72``).
No GDAL exists here, so this is a from-scratch reader/writer of the public
formats involved: the ESRI shapefile main file (.shp, ESRI white paper
layout), its index (.shx) and its dBase III attribute table (.dbf).

Spark-first shape: ``read_shapefile`` scans ``*.shp`` AND sibling ``*.dbf``
through Spark's ``binaryFile`` source — one task per FILE — parses records
inside Arrow batches, and aligns attributes to geometries with an equi-join
on ``(stem, rec_no)``; no executor ever ``open()``s a sibling path, so the
read works identically on an object store (the r3 version read the .dbf
through the local filesystem and silently returned NULL attrs elsewhere).
Output is the engine's native vector row ``(geom_wkb, minx, miny, maxx,
maxy, *attributes)`` — identical to ``read_geojsonl``'s, so every
downstream spatial op consumes it unchanged. A tile-index directory of
thousands of shapefiles parallelizes across executors; a single .shp is one
task (the format is not block-splittable without external indexing — at
10^12 scale vector layers are the SMALL side).

Alignment correctness (r3 ADVICE, medium): Null (type 0) shapes and
dbf deleted-flag rows are kept as PLACEHOLDERS during parsing, so record
numbers — not positions in a filtered list — pair geometry with attributes;
a per-file record-count mismatch between .shp and .dbf fails loudly instead
of silently shifting every later record's attributes.

Supported shapes: Point (1), PolyLine (3 → LineString / MultiLineString
WKB), Polygon (5; multi-ring records become one polygon with holes), Null
(0, placeholder — dropped from output after alignment). Attribute types:
C→string, N/F→double (long when 0 decimals), L→boolean, D→string.
"""

from __future__ import annotations

import glob as _glob
import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo import wkb

_SHAPE_NULL = 0
_SHAPE_POINT = 1
_SHAPE_POLYLINE = 3
_SHAPE_POLYGON = 5

#: members a zip-of-shapefile upload must contain per stem (the reference's
#: completeness gate, user_store_download_operations.py:68-72)
REQUIRED_MEMBERS = (".shp", ".shx", ".dbf")


def parse_shp(buf: bytes) -> list[tuple[int, object]]:
    """Parse a .shp main file → one ``(shape_type, payload)`` PER RECORD in
    record order (Null records included as ``(0, None)`` — record alignment
    with the .dbf depends on it). Payload: Point → (x, y); PolyLine →
    list of (N,2) part arrays; Polygon → list of (N,2) ring arrays.
    Layout per the public ESRI spec: 100-byte header (file code 9994
    big-endian at 0, shape type little-endian at 32), then records of
    (record number int32 BE, content length in 16-bit words int32 BE)
    followed by record content."""
    if len(buf) < 100 or struct.unpack(">i", buf[0:4])[0] != 9994:
        raise ValueError("not a shapefile: bad file code")
    file_len = struct.unpack(">i", buf[24:28])[0] * 2  # 16-bit words → bytes
    out: list[tuple[int, object]] = []
    pos = 100
    while pos + 8 <= min(file_len, len(buf)):
        content_words = struct.unpack(">i", buf[pos + 4 : pos + 8])[0]
        pos += 8
        end = pos + content_words * 2
        shape_type = struct.unpack("<i", buf[pos : pos + 4])[0]
        if shape_type == _SHAPE_NULL:
            out.append((_SHAPE_NULL, None))
        elif shape_type == _SHAPE_POINT:
            x, y = struct.unpack("<dd", buf[pos + 4 : pos + 20])
            out.append((_SHAPE_POINT, (x, y)))
        elif shape_type in (_SHAPE_POLYLINE, _SHAPE_POLYGON):
            num_parts, num_points = struct.unpack("<ii", buf[pos + 36 : pos + 44])
            parts = np.frombuffer(buf, dtype="<i4", count=num_parts, offset=pos + 44)
            pts = np.frombuffer(
                buf, dtype="<f8", count=2 * num_points, offset=pos + 44 + 4 * num_parts
            ).reshape(num_points, 2)
            bounds = np.concatenate([parts, [num_points]])
            segs = [pts[s:e].copy() for s, e in zip(bounds[:-1], bounds[1:])]
            out.append((shape_type, segs))
        else:
            raise ValueError(
                f"unsupported shape type {shape_type} (Point/PolyLine/Polygon/Null)"
            )
        pos = end
    return out


def _record_wkb(shape_type: int, payload) -> bytes | None:
    if shape_type == _SHAPE_NULL:
        return None
    if shape_type == _SHAPE_POINT:
        return wkb.dumps_point(*payload)
    if shape_type == _SHAPE_POLYLINE:
        if len(payload) == 1:
            return wkb.dumps_linestring(payload[0])
        return wkb.dumps_multilinestring(payload)
    return wkb.dumps_polygon(payload)


def parse_dbf(buf: bytes, keep_deleted: bool = False) -> pd.DataFrame:
    """Parse a dBase III .dbf attribute table (the public xBase layout):
    32-byte header (record count LE uint32 at 4, header size LE uint16 at 8,
    record size at 10), 32-byte field descriptors until 0x0D, then
    fixed-width records, each prefixed by a deletion flag byte.
    ``keep_deleted=True`` keeps deleted-flag rows as all-None placeholders —
    required when aligning to .shp records by index."""
    n_rec = struct.unpack("<I", buf[4:8])[0]
    hdr_size, rec_size = struct.unpack("<HH", buf[8:12])
    fields = []  # (name, type, length, decimals)
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
            if keep_deleted:
                for name, *_ in fields:
                    cols[name].append(None)
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


def _stem(path: str) -> str:
    """file stem used as the geometry↔attribute join key (path minus
    extension, scheme prefix kept — stems are unique per layer)."""
    return os.path.splitext(path)[0]


def shapefile_zip_complete(names: list[str]) -> tuple[bool, dict[str, list[str]]]:
    """The reference's upload completeness gate: every ``.shp`` stem in a
    zip must ship its ``.shx`` and ``.dbf`` siblings
    (``user_store_download_operations.py:68-72``). Returns (ok, {stem:
    [missing extensions]}); a zip with no .shp at all is incomplete."""
    by_stem: dict[str, set[str]] = {}
    for n in names:
        stem, ext = os.path.splitext(n)
        by_stem.setdefault(stem, set()).add(ext.lower())
    missing = {
        stem: [e for e in REQUIRED_MEMBERS if e not in exts]
        for stem, exts in by_stem.items()
        if ".shp" in exts and any(e not in exts for e in REQUIRED_MEMBERS)
    }
    has_shp = any(".shp" in exts for exts in by_stem.values())
    return (has_shp and not missing), missing


def read_shapefile(
    spark, path: str, attrs_schema: str | None = None, validate_alignment: bool = True
) -> DataFrame:
    """Scan shapefile(s) → (geom_wkb, minx, miny, maxx, maxy, *attributes).

    ``path`` is a file, directory, or glob of ``.shp`` files; sibling
    ``.dbf``s (same stem) supply attributes when present. Both sides scan
    through the ``binaryFile`` source (one task per file, executor-side
    parsing, object-store safe) and align on ``(stem, rec_no)``.
    ``attrs_schema`` (Spark DDL, e.g. ``"name string, area double"``) pins
    the attribute schema; when None it is derived by reading ONE sibling
    .dbf header on the driver (local paths only — pass it explicitly for
    object-store globs). ``validate_alignment`` (default) compares per-file
    record counts between .shp and .dbf and raises on mismatch — the
    failure mode that silently shifts attributes otherwise."""
    pattern = path
    if _glob.has_magic(pattern):
        if not pattern.endswith(".shp"):
            raise ValueError(
                f"shapefile glob must end with '.shp' (got {pattern!r}): a bare "
                "glob like 'dir/tile*' would feed .dbf/.prj siblings into the "
                "geometry parser and every matched file into the attrs scan"
            )
    elif not pattern.endswith(".shp"):
        pattern = os.path.join(pattern, "*.shp")
    if attrs_schema is None:
        shps = sorted(_glob.glob(pattern))
        if not shps:
            raise FileNotFoundError(f"no .shp matches {pattern}")
        attrs_schema = ""
        for shp in shps:
            dbf_path = shp[:-4] + ".dbf"
            if os.path.exists(dbf_path):
                attrs_schema = _dbf_spark_schema(open(dbf_path, "rb").read())
                break
    attr_names = []
    if attrs_schema:
        attr_names = [a.strip().split(" ")[0] for a in attrs_schema.split(",")]

    geom_schema = (
        "stem string, rec_no int, geom_wkb binary, "
        "minx double, miny double, maxx double, maxy double"
    )
    shp_files = spark.read.format("binaryFile").load(pattern).select("path", "content")

    def parse_geoms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                stem = _stem(row["path"])
                rows = []
                for i, (stype, payload) in enumerate(parse_shp(bytes(row["content"]))):
                    g = _record_wkb(stype, payload)
                    if g is None:
                        rows.append((stem, i, None, None, None, None, None))
                    else:
                        minx, miny, maxx, maxy = wkb.envelope(g)
                        rows.append((stem, i, g, minx, miny, maxx, maxy))
                yield pd.DataFrame(
                    rows,
                    columns=["stem", "rec_no", "geom_wkb", "minx", "miny", "maxx", "maxy"],
                )

    geoms = shp_files.mapInPandas(parse_geoms, geom_schema)

    if not attr_names:
        return geoms.filter(F.col("geom_wkb").isNotNull()).drop("stem", "rec_no")

    dbf_pattern = pattern[:-4] + ".dbf" if pattern.endswith(".shp") else pattern
    attr_schema_full = "stem string, rec_no int, " + attrs_schema
    try:
        dbf_files = (
            spark.read.format("binaryFile")
            .load(dbf_pattern)
            .select("path", "content")
        )
    except AnalysisException as e:
        # ONLY path-not-found means "no .dbf anywhere → attrs all-null";
        # any other load failure (permissions, scheme config) re-raises
        # rather than silently nulling attributes and skipping alignment.
        cond = (
            e.getCondition() if hasattr(e, "getCondition") else e.getErrorClass()
        ) or ""
        if "PATH_NOT_FOUND" not in cond:
            raise
        out = geoms.filter(F.col("geom_wkb").isNotNull()).drop("stem", "rec_no")
        for spec in attrs_schema.split(","):
            name, typ = spec.strip().split(" ", 1)
            out = out.withColumn(name, F.lit(None).cast(typ.strip()))
        return out

    def parse_attrs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                # deleted rows stay as placeholders: rec_no aligns with .shp
                attrs = parse_dbf(bytes(row["content"]), keep_deleted=True)
                out = pd.DataFrame(
                    {
                        "stem": _stem(row["path"]),
                        "rec_no": np.arange(len(attrs), dtype=np.int32),
                    }
                )
                for a in attr_names:
                    out[a] = attrs[a] if a in attrs else None
                yield out

    attrs = dbf_files.mapInPandas(parse_attrs, attr_schema_full)

    if validate_alignment:
        # vector layers are the small side by contract: materialize both
        # parses once (lineage-truncated) and compare per-file record counts
        geoms = geoms.localCheckpoint(eager=True)
        attrs = attrs.localCheckpoint(eager=True)
        gc = geoms.groupBy("stem").agg(F.count("*").alias("n_shp"))
        ac = attrs.groupBy("stem").agg(F.count("*").alias("n_dbf"))
        bad = gc.join(ac, "stem").filter(F.col("n_shp") != F.col("n_dbf")).collect()
        if bad:
            detail = ", ".join(f"{r.stem}: shp={r.n_shp} dbf={r.n_dbf}" for r in bad)
            raise ValueError(f"shapefile record-count mismatch (.shp vs .dbf): {detail}")

    out = geoms.join(attrs, ["stem", "rec_no"], "left")
    return (
        out.filter(F.col("geom_wkb").isNotNull())
        .drop("stem", "rec_no")
        .select("geom_wkb", "minx", "miny", "maxx", "maxy", *attr_names)
    )


def _shape_record(geom: bytes | None) -> tuple[int, bytes, np.ndarray | None]:
    """→ (shape_type, record content bytes, points-or-None) for one geometry."""
    if geom is None:
        return _SHAPE_NULL, struct.pack("<i", _SHAPE_NULL), None
    gt, payload = wkb.loads(bytes(geom))
    if gt == wkb.POINT:
        x, y = payload
        return _SHAPE_POINT, struct.pack("<idd", _SHAPE_POINT, x, y), np.array([[x, y]])
    if gt in (wkb.LINESTRING, wkb.MULTILINESTRING):
        parts = [payload] if gt == wkb.LINESTRING else payload
        return _SHAPE_POLYLINE, _poly_content(_SHAPE_POLYLINE, parts), np.concatenate(parts)
    rings = wkb.polygon_rings(bytes(geom))
    return _SHAPE_POLYGON, _poly_content(_SHAPE_POLYGON, rings), np.concatenate(rings)


def _poly_content(shape_type: int, parts: list[np.ndarray]) -> bytes:
    all_pts = np.concatenate(parts)
    minx, miny = all_pts.min(axis=0)
    maxx, maxy = all_pts.max(axis=0)
    offsets = np.cumsum([0] + [len(p) for p in parts[:-1]]).astype("<i4")
    content = struct.pack("<i", shape_type)
    content += struct.pack("<4d", minx, miny, maxx, maxy)
    content += struct.pack("<ii", len(parts), len(all_pts))
    content += offsets.tobytes() + all_pts.astype("<f8").tobytes()
    return content


def write_shapefile(pdf: pd.DataFrame, path_stem: str, geom_col: str = "geom_wkb") -> None:
    """Driver-side .shp/.shx/.dbf writer for SMALL layers (test fixtures,
    AOI exports — the reference's shapefile artifacts are single small
    files). All non-null geometries must share one shape type (the format's
    header constraint); None geometries become Null records. Attributes:
    every non-geometry column; ints → N(18,0), floats → N(18,6), rest →
    C(64). Writes the .shx index too, so outputs pass the zip completeness
    gate."""
    shp_records = []
    shape_types = set()
    gminx = gminy = np.inf
    gmaxx = gmaxy = -np.inf
    for i, geom in enumerate(pdf[geom_col]):
        stype, content, pts = _shape_record(geom)
        if stype != _SHAPE_NULL:
            shape_types.add(stype)
            gminx = min(gminx, pts[:, 0].min())
            gminy = min(gminy, pts[:, 1].min())
            gmaxx = max(gmaxx, pts[:, 0].max())
            gmaxy = max(gmaxy, pts[:, 1].max())
        shp_records.append(struct.pack(">ii", i + 1, len(content) // 2) + content)
    if len(shape_types) > 1:
        raise ValueError(f"mixed shape types in one shapefile: {sorted(shape_types)}")
    file_type = shape_types.pop() if shape_types else _SHAPE_NULL
    if not np.isfinite(gminx):
        gminx = gminy = gmaxx = gmaxy = 0.0
    body = b"".join(shp_records)

    def _header(n_words: int) -> bytes:
        h = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
        h += struct.pack(">i", n_words)
        h += struct.pack("<ii", 1000, file_type)
        h += struct.pack("<4d", gminx, gminy, gmaxx, gmaxy)
        h += struct.pack("<4d", 0, 0, 0, 0)  # z/m ranges
        return h

    with open(path_stem + ".shp", "wb") as f:
        f.write(_header((100 + len(body)) // 2) + body)
    # .shx: same header, then (record offset, content length) in 16-bit words
    shx_body = b""
    off_words = 50
    for rec in shp_records:
        content_words = (len(rec) - 8) // 2
        shx_body += struct.pack(">ii", off_words, content_words)
        off_words += 4 + content_words
    with open(path_stem + ".shx", "wb") as f:
        f.write(_header((100 + len(shx_body)) // 2) + shx_body)

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
