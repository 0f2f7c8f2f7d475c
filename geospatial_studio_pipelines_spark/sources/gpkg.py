"""GeoPackage (.gpkg) vector source (SURVEY.md §2.1 S7 format breadth).

The reference's upload whitelist accepts ``.gpkg``
(``user_store_download_operations.py:54-63``) and its regularization step
writes GPKG (``postprocess_regularization.py:127-141``) — both via
GDAL/OGR, which doesn't exist here. GeoPackage is SQLite-backed, and both
formats are fully public (sqlite.org/fileformat2.html; OGC 12-128r19), so
this module carries a from-scratch READ-ONLY SQLite page/B-tree walker:

* 100-byte database header → page size / usable size,
* table B-trees: interior (0x05) + leaf (0x0D) pages, cell pointer
  arrays, varint record headers, all serial types, overflow-page chains
  (large geometry blobs spill — the chain walk is required, not optional),
* ``sqlite_master`` → root page by table name; CREATE TABLE SQL → column
  names/types (INTEGER PRIMARY KEY columns read back from the rowid, as
  SQLite stores them as NULL in the record),
* GPKG layer: ``gpkg_contents`` (data_type='features') +
  ``gpkg_geometry_columns`` → feature table + geometry column; GPKG
  geometry blobs (``GP`` magic, flags/envelope header) → plain WKB.

Spark-first shape mirrors ``read_shapefile``: ``read_gpkg`` scans
``*.gpkg`` through the ``binaryFile`` source — one task per FILE, parsing
executor-side — and emits the engine's native vector row ``(geom_wkb,
minx, miny, maxx, maxy, *attributes)``. Scope: journal-mode files at rest
(no WAL replay), rowid tables (GPKG feature tables are rowid tables by
spec — fid INTEGER PRIMARY KEY).

Tested non-circularly: fixtures are created with the stdlib ``sqlite3``
module (a REAL SQLite writer), then read back with this parser.
"""

from __future__ import annotations

import glob as _glob
import os
import re
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geo import wkb as _wkb

# --------------------------------------------------------------- SQLite

_SQLITE_MAGIC = b"SQLite format 3\x00"


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    """SQLite varint at pos → (value, next_pos). Big-endian 7-bit groups;
    a 9th byte contributes all 8 bits."""
    v = 0
    for i in range(8):
        b = buf[pos + i]
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos + i + 1
    return (v << 8) | buf[pos + 8], pos + 9


def _serial_value(st: int, body: bytes, off: int, rowid: int | None = None):
    """Decode one serial-type value → (python value, next offset)."""
    if st == 0:
        return None, off
    if 1 <= st <= 6:
        n = (0, 1, 2, 3, 4, 6, 8)[st]
        return int.from_bytes(body[off : off + n], "big", signed=True), off + n
    if st == 7:
        return struct.unpack(">d", body[off : off + 8])[0], off + 8
    if st == 8:
        return 0, off
    if st == 9:
        return 1, off
    if st >= 12 and st % 2 == 0:
        n = (st - 12) // 2
        return body[off : off + n], off + n
    if st >= 13:
        n = (st - 13) // 2
        return body[off : off + n].decode("utf-8", errors="replace"), off + n
    raise ValueError(f"reserved serial type {st}")


def _parse_record(body: bytes) -> list:
    hdr_len, pos = _varint(body, 0)
    serials = []
    while pos < hdr_len:
        st, pos = _varint(body, pos)
        serials.append(st)
    vals = []
    off = hdr_len
    for st in serials:
        v, off = _serial_value(st, body, off)
        vals.append(v)
    return vals


class _Db:
    """Read-only view over one SQLite database image (bytes)."""

    def __init__(self, buf: bytes):
        if buf[:16] != _SQLITE_MAGIC:
            raise ValueError("not a SQLite database (bad magic)")
        ps = struct.unpack(">H", buf[16:18])[0]
        self.page_size = 65536 if ps == 1 else ps
        self.usable = self.page_size - buf[20]  # minus reserved bytes/page
        self.buf = buf

    def _page(self, n: int) -> bytes:
        return self.buf[(n - 1) * self.page_size : n * self.page_size]

    def _payload(self, page: bytes, pos: int, payload_len: int) -> bytes:
        """Cell payload starting at pos, following the overflow chain when
        the payload spills (spec formulas: X = U-35 for table leaves)."""
        u = self.usable
        x = u - 35
        if payload_len <= x:
            return page[pos : pos + payload_len]
        m = ((u - 12) * 32 // 255) - 23
        k = m + (payload_len - m) % (u - 4)
        local = k if k <= x else m
        out = bytearray(page[pos : pos + local])
        nxt = struct.unpack(">I", page[pos + local : pos + local + 4])[0]
        while nxt and len(out) < payload_len:
            pg = self._page(nxt)
            nxt = struct.unpack(">I", pg[:4])[0]
            out += pg[4 : 4 + min(u - 4, payload_len - len(out))]
        return bytes(out)

    def walk_table(self, root: int) -> Iterator[tuple[int, list]]:
        """Yield (rowid, values) for every row of the table B-tree at
        ``root``, in rowid order (depth-first left-to-right)."""
        page = self._page(root)
        hdr_off = 100 if root == 1 else 0
        ptype = page[hdr_off]
        ncells = struct.unpack(">H", page[hdr_off + 3 : hdr_off + 5])[0]
        if ptype == 0x05:  # interior: left children + right-most pointer
            ptr_base = hdr_off + 12
            for i in range(ncells):
                cpos = struct.unpack(">H", page[ptr_base + 2 * i : ptr_base + 2 * i + 2])[0]
                child = struct.unpack(">I", page[cpos : cpos + 4])[0]
                yield from self.walk_table(child)
            right = struct.unpack(">I", page[hdr_off + 8 : hdr_off + 12])[0]
            yield from self.walk_table(right)
        elif ptype == 0x0D:  # leaf
            ptr_base = hdr_off + 8
            for i in range(ncells):
                cpos = struct.unpack(">H", page[ptr_base + 2 * i : ptr_base + 2 * i + 2])[0]
                plen, cpos = _varint(page, cpos)
                rowid, cpos = _varint(page, cpos)
                yield rowid, _parse_record(self._payload(page, cpos, plen))
        else:
            raise ValueError(f"unexpected B-tree page type 0x{ptype:02x}")

    def master(self) -> list[dict]:
        """sqlite_master rows: (type, name, tbl_name, rootpage, sql)."""
        out = []
        for _rowid, vals in self.walk_table(1):
            out.append(
                dict(zip(("type", "name", "tbl_name", "rootpage", "sql"), vals))
            )
        return out

    def read_table(self, name: str) -> tuple[list[str], list[str], list[list]]:
        """→ (column names, declared types, rows). INTEGER PRIMARY KEY
        columns are materialized from the rowid (stored as NULL in the
        record per the SQLite file format)."""
        entry = next(
            (m for m in self.master() if m["type"] == "table" and m["name"] == name),
            None,
        )
        if entry is None:
            raise KeyError(f"no such table {name!r}")
        cols, types, ipk = _parse_create_table(entry["sql"])
        rows = []
        for rowid, vals in self.walk_table(entry["rootpage"]):
            vals = list(vals) + [None] * (len(cols) - len(vals))  # ALTER-added cols
            if ipk is not None and vals[ipk] is None:
                vals[ipk] = rowid
            rows.append(vals[: len(cols)])
        return cols, types, rows


def _parse_create_table(sql: str) -> tuple[list[str], list[str], int | None]:
    """CREATE TABLE sql → (column names, declared types, INTEGER PRIMARY KEY
    column index or None). Splits the parenthesized body at depth-0 commas;
    table constraints (PRIMARY KEY(...), UNIQUE(...), …) are skipped."""
    body = sql[sql.index("(") + 1 : sql.rindex(")")]
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    names, types = [], []
    ipk = None
    constraint_kw = ("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    for p in parts:
        p = p.strip()
        if not p or p.split()[0].upper() in constraint_kw:
            continue
        mname = re.match(r'\s*(?:"([^"]+)"|`([^`]+)`|\[([^\]]+)\]|(\w+))', p)
        name = next(g for g in mname.groups() if g is not None)
        rest = p[mname.end():].strip()
        typ = rest.split()[0].upper() if rest else ""
        if "INTEGER" in rest.upper() and "PRIMARY KEY" in rest.upper():
            ipk = len(names)
        names.append(name)
        types.append(typ)
    return names, types, ipk


def _spark_type(decl: str) -> str:
    d = decl.upper()
    if "INT" in d or d == "BOOLEAN":
        return "long"
    if any(t in d for t in ("REAL", "FLOA", "DOUB")):
        return "double"
    if "BLOB" in d or d == "":
        return "binary"
    return "string"


# ----------------------------------------------------------------- GPKG


def parse_gpkg_blob(blob: bytes) -> bytes:
    """GPKG geometry blob (OGC 12-128r19 §2.1.3: 'GP' magic, version,
    flags, srs_id, optional envelope) → the embedded standard WKB."""
    if blob[:2] != b"GP":
        raise ValueError("not a GPKG geometry blob")
    flags = blob[3]
    if flags & 0x20:
        raise ValueError("extended GPKG geometry not supported")
    env_ind = (flags >> 1) & 0x07
    n_env = (0, 4, 6, 6, 8)[env_ind]
    return blob[8 + 8 * n_env :]


def gpkg_layers(buf: bytes) -> list[dict]:
    """Feature layers of a .gpkg image: [{table, geom_col, srs_id}]."""
    db = _Db(buf)
    c_cols, _t, c_rows = db.read_table("gpkg_contents")
    g_cols, _t2, g_rows = db.read_table("gpkg_geometry_columns")
    geom_by_table = {
        r[g_cols.index("table_name")]: r[g_cols.index("column_name")] for r in g_rows
    }
    out = []
    for r in c_rows:
        row = dict(zip(c_cols, r))
        if row.get("data_type") == "features":
            out.append(
                {
                    "table": row["table_name"],
                    "geom_col": geom_by_table.get(row["table_name"]),
                    "srs_id": row.get("srs_id"),
                }
            )
    return out


def _pick_layer(buf: bytes, table: str | None) -> dict:
    layers = gpkg_layers(buf)
    if table is not None:
        layers = [l for l in layers if l["table"] == table]
    if not layers:
        raise ValueError(f"no feature layer {'named ' + table if table else ''} in gpkg")
    return layers[0]


def _layer_schema(buf: bytes, table: str | None) -> tuple[list[str], list[str]]:
    """Attribute (names, spark types) of a layer from HEADER TABLES ONLY —
    gpkg_contents / gpkg_geometry_columns plus the feature table's CREATE
    TABLE SQL out of sqlite_master. No feature row, geometry blob, or
    envelope is materialized, so driver-side schema derivation on a large
    first .gpkg is O(header), not O(file)."""
    db = _Db(buf)
    lyr = _pick_layer(buf, table)
    entry = next(
        (m for m in db.master() if m["type"] == "table" and m["name"] == lyr["table"]),
        None,
    )
    if entry is None:
        raise ValueError(f"gpkg_contents names {lyr['table']!r} but no such table")
    cols, decls, _ipk = _parse_create_table(entry["sql"])
    gi = cols.index(lyr["geom_col"])
    names = [c for j, c in enumerate(cols) if j != gi]
    types = [_spark_type(decls[j]) for j, c in enumerate(cols) if j != gi]
    return names, types


def _layer_frame(buf: bytes, table: str | None) -> tuple[pd.DataFrame, list[str], list[str]]:
    """One .gpkg image → (frame with geom_wkb+bbox+attrs, attr names,
    attr spark types)."""
    db = _Db(buf)
    lyr = _pick_layer(buf, table)
    cols, decls, rows = db.read_table(lyr["table"])
    gi = cols.index(lyr["geom_col"])
    attr_names = [c for j, c in enumerate(cols) if j != gi]
    attr_types = [_spark_type(decls[j]) for j, c in enumerate(cols) if j != gi]
    out = []
    for vals in rows:
        blob = vals[gi]
        if blob is None:
            continue
        g = parse_gpkg_blob(bytes(blob))
        minx, miny, maxx, maxy = _wkb.envelope(g)
        out.append(
            [g, minx, miny, maxx, maxy] + [v for j, v in enumerate(vals) if j != gi]
        )
    frame = pd.DataFrame(
        out, columns=["geom_wkb", "minx", "miny", "maxx", "maxy", *attr_names]
    )
    return frame, attr_names, attr_types


def read_gpkg(
    spark, path: str, table: str | None = None, attrs_schema: str | None = None
) -> DataFrame:
    """Scan GeoPackage file(s) → (geom_wkb, minx, miny, maxx, maxy,
    *attributes) — the engine's native vector row, same as
    ``read_shapefile``/``read_geojsonl``.

    ``path`` is a file, directory, or glob of ``.gpkg`` files; one Spark
    task per file via ``binaryFile``, all parsing executor-side.
    ``table`` picks a layer when a file has several (default: the first
    'features' row of gpkg_contents). ``attrs_schema`` (Spark DDL) pins the
    attribute schema; when None it is derived from ONE file's header tables
    on the driver — sqlite_master CREATE TABLE SQL + gpkg_geometry_columns
    only, no feature rows parsed (local paths only — pass it explicitly
    for object-store globs)."""
    pattern = path
    if not _glob.has_magic(pattern) and not pattern.endswith(".gpkg"):
        pattern = os.path.join(pattern, "*.gpkg")
    if attrs_schema is None:
        files = sorted(_glob.glob(pattern))
        if not files:
            raise FileNotFoundError(f"no .gpkg matches {pattern}")
        names, types = _layer_schema(open(files[0], "rb").read(), table)
        attrs_schema = ", ".join(f"{n} {t}" for n, t in zip(names, types))
    out_schema = "geom_wkb binary, minx double, miny double, maxx double, maxy double"
    attr_names = []
    if attrs_schema:
        out_schema += ", " + attrs_schema
        attr_names = [a.strip().split(" ")[0] for a in attrs_schema.split(",")]

    files_df = spark.read.format("binaryFile").load(pattern).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                frame, names, _types = _layer_frame(bytes(row["content"]), table)
                out = frame[["geom_wkb", "minx", "miny", "maxx", "maxy"]].copy()
                for a in attr_names:
                    out[a] = frame[a] if a in frame.columns else None
                yield out

    return files_df.mapInPandas(parse, out_schema)


# ----------------------------------------------------------------- write

#: OGC 12-128r19 table 30 geometry type names by WKB type code.
_GEOM_TYPE_NAMES = {
    _wkb.POINT: "POINT",
    _wkb.LINESTRING: "LINESTRING",
    _wkb.POLYGON: "POLYGON",
    4: "MULTIPOINT",
    _wkb.MULTILINESTRING: "MULTILINESTRING",
    _wkb.MULTIPOLYGON: "MULTIPOLYGON",
}

#: GPKG application_id ('GPKG') and user_version (1.2.0) — OGC 12-128r19 §1.1.1.1.1.
_GPKG_APPLICATION_ID = 0x47504B47
_GPKG_USER_VERSION = 10200


def make_gpkg_blob(wkb_bytes: bytes, srs_id: int = 4326) -> bytes:
    """Standard WKB → GPKG geometry blob (OGC 12-128r19 §2.1.3): 'GP'
    magic, version 0, flags 0x03 (little-endian + xy envelope), srs_id,
    [minx, maxx, miny, maxy] envelope, then the WKB unchanged — the exact
    inverse of ``parse_gpkg_blob``."""
    minx, miny, maxx, maxy = _wkb.envelope(wkb_bytes)
    return (
        b"GP"
        + bytes([0, 0x03])
        + struct.pack("<i", srs_id)
        + struct.pack("<4d", minx, maxx, miny, maxy)
        + wkb_bytes
    )


def _sqlite_decl(series: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(series):
        return "BOOLEAN"
    if pd.api.types.is_integer_dtype(series):
        return "INTEGER"
    if pd.api.types.is_float_dtype(series):
        return "DOUBLE"
    if len(series) and isinstance(series.dropna().iloc[0] if len(series.dropna()) else "", (bytes, bytearray)):
        return "BLOB"
    return "TEXT"


def write_gpkg(
    pdf: pd.DataFrame,
    path: str,
    table: str = "layer",
    srs_id: int = 4326,
    geom_col: str = "geom_wkb",
) -> None:
    """Driver-side GeoPackage writer for SMALL layers (AOI exports, test
    fixtures — the reference writes its regularized vectors as single
    small .gpkg artifacts, `postprocess_regularization.py:127-141`).
    Mirrors ``write_shapefile``: geometry from ``geom_col`` (standard
    WKB), every other column becomes an attribute.

    The GPKG DOMAIN layer is from scratch — required header tables
    (gpkg_spatial_ref_sys / gpkg_contents / gpkg_geometry_columns),
    application_id/user_version pragmas, geometry blob encoding
    (``make_gpkg_blob``), extents, type names — while the SQLite pager/
    B-tree persistence uses the Python stdlib ``sqlite3`` module (the
    read side stays the engine's own file walker, so round-trip tests
    cross two independent SQLite implementations). Unlike the shapefile
    format, GPKG has no single-shape-type-per-file constraint: mixed
    geometries get type name GEOMETRY."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
        raise ValueError(f"invalid gpkg table name {table!r}")
    import sqlite3

    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute(f"PRAGMA application_id = {_GPKG_APPLICATION_ID}")
        con.execute(f"PRAGMA user_version = {_GPKG_USER_VERSION}")
        con.execute(
            "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, "
            "srs_id INTEGER NOT NULL PRIMARY KEY, organization TEXT NOT NULL, "
            "organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, "
            "description TEXT)"
        )
        # the three rows every GPKG must carry (§1.1.2.1.2) + the layer SRS
        srs_rows = [
            ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
            ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
            (
                "WGS 84 geodetic",
                4326,
                "EPSG",
                4326,
                'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
                '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
                "longitude/latitude on WGS 84",
            ),
        ]
        if srs_id not in {-1, 0, 4326}:
            srs_rows.append(
                (f"SRS {srs_id}", srs_id, "EPSG", srs_id, "undefined", None)
            )
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)", srs_rows
        )
        con.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, "
            "data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT "
            "DEFAULT '', last_change DATETIME NOT NULL DEFAULT "
            "(strftime('%Y-%m-%dT%H:%M:%fZ','now')), min_x DOUBLE, min_y DOUBLE, "
            "max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"
        )
        con.execute(
            "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, "
            "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, "
            "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, "
            "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"
        )

        attr_cols = [c for c in pdf.columns if c != geom_col]
        decls = ", ".join(
            f'"{c}" {_sqlite_decl(pdf[c])}' for c in attr_cols
        )
        con.execute(
            f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
            f"geom BLOB{', ' + decls if decls else ''})"
        )

        type_names = set()
        gminx = gminy = np.inf
        gmaxx = gmaxy = -np.inf
        rows = []
        for _, row in pdf.iterrows():
            g = row[geom_col]
            if g is None:
                rows.append((None, *[_py(row[c]) for c in attr_cols]))
                continue
            g = bytes(g)
            code = struct.unpack_from("<I", g, 1)[0] & 0xFFFF
            type_names.add(_GEOM_TYPE_NAMES.get(code, "GEOMETRY"))
            minx, miny, maxx, maxy = _wkb.envelope(g)
            gminx, gminy = min(gminx, minx), min(gminy, miny)
            gmaxx, gmaxy = max(gmaxx, maxx), max(gmaxy, maxy)
            rows.append((make_gpkg_blob(g, srs_id), *[_py(row[c]) for c in attr_cols]))
        gtype = type_names.pop() if len(type_names) == 1 else "GEOMETRY"
        ph = ", ".join("?" * (1 + len(attr_cols)))
        cols_sql = ", ".join(['geom'] + [f'"{c}"' for c in attr_cols])
        con.executemany(
            f'INSERT INTO "{table}" ({cols_sql}) VALUES ({ph})', rows
        )
        if not np.isfinite(gminx):
            gminx = gminy = gmaxx = gmaxy = None  # all-null layer: no extent
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (table, "features", table, gminx, gminy, gmaxx, gmaxy, srs_id),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
            (table, "geom", gtype, srs_id),
        )
        con.commit()
    finally:
        con.close()


def _py(v):
    """numpy scalar → plain Python for sqlite3 binding."""
    if isinstance(v, np.generic):
        return v.item()
    return v
