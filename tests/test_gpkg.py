"""GeoPackage source: from-scratch SQLite B-tree walker vs REAL SQLite.

Fixtures are written with the stdlib ``sqlite3`` module (an actual SQLite
engine), so the parser is tested non-circularly — including multi-page
B-trees (tiny page size → interior pages) and overflow-page chains (large
geometry blobs)."""

import sqlite3
import struct

import numpy as np
import pandas as pd
import pytest

from geospatial_studio_pipelines_spark.geo import wkb as W
from geospatial_studio_pipelines_spark.sources import gpkg as G


def _gpkg_blob(wkb_bytes: bytes, srs_id: int = 4326) -> bytes:
    """OGC GPKG geometry blob: GP magic, version 0, flags 0x03 (LE +
    xy envelope), srs_id, envelope, then the WKB."""
    minx, miny, maxx, maxy = W.envelope(wkb_bytes)
    return (
        b"GP"
        + bytes([0, 0x03])
        + struct.pack("<i", srs_id)
        + struct.pack("<4d", minx, maxx, miny, maxy)
        + wkb_bytes
    )


def _make_gpkg(path: str, geoms: list[bytes], names: list[str], values: list[float],
               page_size: int = 4096, table: str = "footprints") -> None:
    con = sqlite3.connect(path)
    con.execute(f"PRAGMA page_size={page_size}")
    con.execute(
        "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, "
        "data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT, "
        "last_change DATETIME, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, "
        "max_y DOUBLE, srs_id INTEGER)"
    )
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, "
        "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, "
        "srs_id INTEGER NOT NULL, z TINYINT, m TINYINT)"
    )
    con.execute(
        f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
        'geom BLOB, name TEXT, value DOUBLE)'
    )
    con.execute(
        "INSERT INTO gpkg_contents (table_name, data_type, identifier, srs_id) "
        "VALUES (?, 'features', ?, 4326)",
        (table, table),
    )
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', 'POLYGON', 4326, 0, 0)",
        (table,),
    )
    con.executemany(
        f'INSERT INTO "{table}" (geom, name, value) VALUES (?, ?, ?)',
        [(_gpkg_blob(g), n, v) for g, n, v in zip(geoms, names, values)],
    )
    con.commit()
    con.close()


def _tri(i: float) -> bytes:
    return W.dumps_polygon(
        [np.array([[i, 0.0], [i + 1.0, 0.0], [i + 0.5, 1.0], [i, 0.0]])]
    )


def test_gpkg_roundtrip_vs_sqlite3(spark, tmp_path):
    p = str(tmp_path / "layer.gpkg")
    geoms = [_tri(float(i)) for i in range(5)]
    _make_gpkg(p, geoms, [f"n{i}" for i in range(5)], [i * 0.5 for i in range(5)])
    got = G.read_gpkg(spark, p).orderBy("minx").collect()
    assert len(got) == 5
    for i, r in enumerate(got):
        assert bytes(r.geom_wkb) == geoms[i]  # exact WKB through the blob header
        assert r.name == f"n{i}" and r.value == i * 0.5
        assert r.fid == i + 1  # INTEGER PRIMARY KEY materialized from rowid
        assert (r.minx, r.maxx) == (float(i), float(i) + 1.0)


def test_gpkg_multipage_btree_and_overflow(spark, tmp_path):
    """512-byte pages force interior B-tree pages; a 400-vertex polygon
    (~6.4 KB WKB) forces an overflow-page chain."""
    p = str(tmp_path / "big.gpkg")
    n = 400
    geoms = [_tri(float(i)) for i in range(n)]
    theta = np.linspace(0.0, 2 * np.pi, 400)
    ring = np.stack([100.0 + np.cos(theta), 100.0 + np.sin(theta)], axis=1)
    ring[-1] = ring[0]
    big = W.dumps_polygon([ring])
    geoms.append(big)
    _make_gpkg(
        p, geoms, [f"n{i}" for i in range(n + 1)], [float(i) for i in range(n + 1)],
        page_size=512,
    )
    # parser-level check against the REAL engine's own view of the file
    buf = open(p, "rb").read()
    db = G._Db(buf)
    assert db.page_size == 512
    cols, _types, rows = db.read_table("footprints")
    con = sqlite3.connect(p)
    expect = con.execute("SELECT fid, name, value FROM footprints ORDER BY fid").fetchall()
    got_rows = sorted((r[cols.index("fid")], r[cols.index("name")], r[cols.index("value")]) for r in rows)
    assert got_rows == expect
    # the overflow-chained geometry survives byte-exact
    blob_by_fid = {r[cols.index("fid")]: bytes(r[cols.index("geom")]) for r in rows}
    assert G.parse_gpkg_blob(blob_by_fid[n + 1]) == big
    # and through Spark
    out = G.read_gpkg(spark, p)
    assert out.count() == n + 1
    big_row = out.filter("maxy > 50").collect()
    assert len(big_row) == 1 and bytes(big_row[0].geom_wkb) == big


def test_gpkg_directory_scan_and_table_select(spark, tmp_path):
    _make_gpkg(str(tmp_path / "a.gpkg"), [_tri(0.0)], ["a"], [1.0])
    _make_gpkg(str(tmp_path / "b.gpkg"), [_tri(10.0)], ["b"], [2.0])
    got = G.read_gpkg(spark, str(tmp_path)).orderBy("minx").collect()
    assert [r.name for r in got] == ["a", "b"]
    with pytest.raises(Exception, match="no feature layer"):
        G.read_gpkg(spark, str(tmp_path / "a.gpkg"), table="nope").collect()


def test_gpkg_layers_and_master_listing(tmp_path):
    p = str(tmp_path / "meta.gpkg")
    _make_gpkg(p, [_tri(0.0)], ["x"], [0.0], table="parcels")
    buf = open(p, "rb").read()
    layers = G.gpkg_layers(buf)
    assert layers == [{"table": "parcels", "geom_col": "geom", "srs_id": 4326}]
    names = {m["name"] for m in G._Db(buf).master() if m["type"] == "table"}
    assert {"gpkg_contents", "gpkg_geometry_columns", "parcels"} <= names


def test_gpkg_feeds_spatial_join(spark, tmp_path):
    """The emitted rows are the engine's native vector shape: clip by bbox
    works unchanged."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "join.gpkg")
    _make_gpkg(p, [_tri(float(i * 2)) for i in range(10)], [f"n{i}" for i in range(10)],
               [0.0] * 10)
    layer = G.read_gpkg(spark, p)
    hit = layer.filter((F.col("minx") < 5.0) & (F.col("maxx") > 0.5)).count()
    assert hit == 3  # tris at 0, 2, 4


def test_parse_gpkg_blob_rejects_garbage():
    with pytest.raises(ValueError, match="GPKG"):
        G.parse_gpkg_blob(b"\x00\x01\x02")


def test_layer_schema_is_header_only(tmp_path):
    """Driver-side schema derivation must come from sqlite_master CREATE
    TABLE SQL + gpkg header tables WITHOUT materializing feature rows:
    same names/types as the full parse, and it must survive a feature
    table whose rows would crash the row parser (corrupt geometry blob)."""
    p = str(tmp_path / "layer.gpkg")
    _make_gpkg(p, [_tri(0.0)], ["a"], [1.0])
    buf = open(p, "rb").read()
    names, types = G._layer_schema(buf, None)
    _frame, f_names, f_types = G._layer_frame(buf, None)
    assert names == f_names and types == f_types

    # corrupt the stored geometry blob: header-only derivation still works
    p2 = str(tmp_path / "bad.gpkg")
    _make_gpkg(p2, [_tri(0.0)], ["a"], [1.0])
    con = sqlite3.connect(p2)
    con.execute('UPDATE "footprints" SET geom = ?', (b"NOTAGPBLOB",))
    con.commit(); con.close()
    buf2 = open(p2, "rb").read()
    names2, types2 = G._layer_schema(buf2, None)
    assert names2 == names and types2 == types
    import pytest as _pytest

    with _pytest.raises(ValueError):
        G._layer_frame(buf2, None)


def test_write_gpkg_roundtrip_engine_and_sqlite3(spark, tmp_path):
    """S7 write symmetry (reference writes GPKG,
    postprocess_regularization.py:127-141): write with the engine's
    write_gpkg, verify with (a) the REAL sqlite3 module — header pragmas,
    required tables, geometry blob structure — and (b) the engine's own
    independent file walker via read_gpkg."""
    p = str(tmp_path / "out.gpkg")
    pdf = pd.DataFrame(
        {
            "geom_wkb": [_tri(0.0), _tri(5.0)],
            "name": ["a", "b"],
            "value": [1.5, 2.5],
            "code": np.array([7, 42], dtype=np.int64),
        }
    )
    G.write_gpkg(pdf, p, table="footprints")

    # (a) independent read: real SQLite
    con = sqlite3.connect(p)
    assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
    assert con.execute("PRAGMA user_version").fetchone()[0] == 10200
    assert con.execute("PRAGMA integrity_check").fetchone()[0] == "ok"
    ct = dict(con.execute(
        "SELECT table_name, data_type FROM gpkg_contents").fetchall())
    assert ct == {"footprints": "features"}
    gc = con.execute(
        "SELECT table_name, column_name, geometry_type_name, srs_id "
        "FROM gpkg_geometry_columns").fetchall()
    assert gc == [("footprints", "geom", "POLYGON", 4326)]
    exts = con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents").fetchone()
    assert exts == (0.0, 0.0, 6.0, 1.0)
    srs = {r[0] for r in con.execute("SELECT srs_id FROM gpkg_spatial_ref_sys")}
    assert {-1, 0, 4326} <= srs
    blob, name = con.execute(
        "SELECT geom, name FROM footprints ORDER BY fid LIMIT 1").fetchone()
    assert bytes(blob[:2]) == b"GP" and name == "a"
    assert G.parse_gpkg_blob(bytes(blob)) == bytes(pdf.geom_wkb[0])
    con.close()

    # (b) engine round-trip through the from-scratch walker
    rows = G.read_gpkg(spark, p).orderBy("fid").collect()
    assert len(rows) == 2
    assert [r.name for r in rows] == ["a", "b"]
    assert [r.code for r in rows] == [7, 42]
    assert [r.value for r in rows] == [1.5, 2.5]
    assert bytes(rows[0].geom_wkb) == bytes(pdf.geom_wkb[0])
    assert (rows[1].minx, rows[1].maxx) == (5.0, 6.0)


def test_write_gpkg_mixed_types_and_null_geom(spark, tmp_path):
    """Mixed geometry types → GEOMETRY type name (GPKG has no single-type
    constraint, unlike shapefile); None geometries persist as NULL."""
    p = str(tmp_path / "mixed.gpkg")
    pt = W.dumps_point(3.0, 4.0)
    pdf = pd.DataFrame({"geom_wkb": [_tri(0.0), pt, None], "tag": ["t", "p", "n"]})
    G.write_gpkg(pdf, p, table="mixed")
    con = sqlite3.connect(p)
    assert con.execute(
        "SELECT geometry_type_name FROM gpkg_geometry_columns").fetchone()[0] == "GEOMETRY"
    assert con.execute(
        "SELECT count(*) FROM mixed WHERE geom IS NULL").fetchone()[0] == 1
    con.close()
    rows = G.read_gpkg(spark, p).collect()  # NULL-geom rows are skipped by scan
    assert len(rows) == 2
    assert {r.tag for r in rows} == {"t", "p"}


def test_write_gpkg_rejects_bad_table_name(tmp_path):
    with pytest.raises(ValueError, match="invalid gpkg table"):
        G.write_gpkg(pd.DataFrame({"geom_wkb": []}), str(tmp_path / "x.gpkg"),
                     table="bad name; drop")
