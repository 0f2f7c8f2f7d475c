"""Classic NetCDF (CDF-1/CDF-2) source (SURVEY.md §2.1 S14/S15 breadth).

The reference accepts ``.nc`` uploads in its extension whitelist and ships
them to GeoServer (``user_store_download_operations.py:54-63``). No netCDF4
library exists here, so this parses the PUBLIC classic file format (the
NetCDF "CDF magic" layout from the Unidata spec): big-endian header of
dimension / attribute / variable lists, then fixed-offset variable data,
record variables interleaved per record.

Spark-first shape mirrors ``read_shapefile``: ``read_netcdf_var`` scans
``*.nc`` through the ``binaryFile`` source — one task per file — and emits
one row per file ``(path, var, bytes=raw-encoded array, w, h, c)`` plus the
grid bounds when 1-D ``lon``/``lat`` (or ``x``/``y``) coordinate variables
are present, ready for the raster operators. Scope: classic CDF-1/2 (the
format NCO/GDAL write by default), all six classic types, record dimension
supported; HDF5-backed NetCDF-4 is rejected with a clear error.

NetCDF-4/HDF5 is a DOCUMENTED scope-out (README "Interchange format set"):
the reference only touches .nc via GDAL and GeoServer publish (serving,
already out of scope), and this container has no independent HDF5
implementation (no h5py/netCDF4/scipy) — a from-scratch HDF5 reader could
only be tested against fixtures written by itself, circular evidence of
the kind the GPKG/shapefile sources were built to avoid.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C
_DTYPES = {1: ">i1", 2: "S1", 3: ">i2", 4: ">i4", 5: ">f4", 6: ">f8"}
_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u32(self) -> int:
        v = struct.unpack_from(">I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def u64(self) -> int:
        v = struct.unpack_from(">Q", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.buf[self.pos : self.pos + n].decode("ascii")
        self.pos += (n + 3) & ~3  # names pad to 4-byte boundary
        return s

    def values(self, nc_type: int, n: int):
        size = _SIZES[nc_type]
        raw = self.buf[self.pos : self.pos + size * n]
        self.pos += (size * n + 3) & ~3
        if nc_type == 2:
            return raw.decode("ascii", errors="replace")
        return np.frombuffer(raw, dtype=_DTYPES[nc_type], count=n)


def parse_netcdf(buf: bytes) -> dict:
    """→ {"dims": [(name, size)], "attrs": {...}, "vars": {name: ndarray},
    "var_attrs": {name: {...}}}. Record dimension resolved to its actual
    record count."""
    if buf[:3] != b"CDF":
        if buf[:8] == b"\x89HDF\r\n\x1a\n" or buf[:4] == b"\x89HDF":
            raise ValueError("NetCDF-4/HDF5 container — only classic CDF-1/2 supported")
        raise ValueError("not a NetCDF classic file (missing CDF magic)")
    version = buf[3]
    if version not in (1, 2):
        raise ValueError(f"unsupported CDF version {version}")
    offset64 = version == 2
    r = _Reader(buf)
    r.pos = 4
    numrecs = r.u32()  # 0xFFFFFFFF = STREAMING
    # dimensions
    tag = r.u32()
    ndims = r.u32()
    dims: list[tuple[str, int]] = []
    if tag == _NC_DIMENSION:
        for _ in range(ndims):
            dims.append((r.name(), r.u32()))

    def attr_block() -> dict:
        t = r.u32()
        n = r.u32()
        out = {}
        if t == _NC_ATTRIBUTE:
            for _ in range(n):
                nm = r.name()
                typ = r.u32()
                cnt = r.u32()
                out[nm] = r.values(typ, cnt)
        return out

    gattrs = attr_block()
    # variables
    tag = r.u32()
    nvars = r.u32()
    var_meta = []
    if tag == _NC_VARIABLE:
        for _ in range(nvars):
            nm = r.name()
            nd = r.u32()
            dimids = [r.u32() for _ in range(nd)]
            vattrs = attr_block()
            typ = r.u32()
            vsize = r.u32()
            begin = r.u64() if offset64 else r.u32()
            var_meta.append((nm, dimids, vattrs, typ, vsize, begin))

    rec_dim = next((i for i, (_, sz) in enumerate(dims) if sz == 0), None)
    rec_vars = [m for m in var_meta if m[1] and rec_dim is not None and m[1][0] == rec_dim]
    # per-record stride = Σ vsize of record vars (vsize already pads to 4);
    # a SINGLE record var is NOT padded per the spec exception
    rec_stride = sum(m[4] for m in rec_vars) if len(rec_vars) > 1 else (
        rec_vars[0][4] if rec_vars else 0
    )
    out_vars: dict[str, np.ndarray] = {}
    var_attrs: dict[str, dict] = {}
    for nm, dimids, vattrs, typ, vsize, begin in var_meta:
        shape = [dims[i][1] for i in dimids]
        var_attrs[nm] = vattrs
        is_rec = rec_dim is not None and dimids and dimids[0] == rec_dim
        if not is_rec:
            n = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(buf, dtype=_DTYPES[typ], count=n, offset=begin)
            out_vars[nm] = arr.reshape(shape) if shape else arr[0]
            continue
        per_rec_shape = shape[1:]
        per_rec_n = int(np.prod(per_rec_shape)) if per_rec_shape else 1
        nrec = numrecs if numrecs != 0xFFFFFFFF else 0
        recs = []
        for k in range(nrec):
            recs.append(
                np.frombuffer(buf, dtype=_DTYPES[typ], count=per_rec_n,
                              offset=begin + k * rec_stride)
            )
        arr = np.stack(recs) if recs else np.empty((0, *per_rec_shape), _DTYPES[typ])
        out_vars[nm] = arr.reshape((nrec, *per_rec_shape))
    return {"dims": dims, "attrs": gattrs, "vars": out_vars, "var_attrs": var_attrs}


def read_netcdf_var(spark, path: str, var: str) -> DataFrame:
    """Scan ``.nc`` file(s) → one raster row per file:
    ``(path, bytes raw-encoded (h, w, c) float32, w, h, c, minx..maxy)``.
    Bounds come from 1-D ``lon``/``lat`` (or ``x``/``y``) coordinate vars
    when present (cell-edge bounds from center spacing, the CF convention),
    NaN otherwise. 2-D vars become c=1; 3-D ``(band|time, y, x)`` keep the
    leading axis as channels."""
    from ..codecs.image import encode_image

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    out_schema = (
        "path string, bytes binary, w int, h int, c int, "
        "minx double, miny double, maxx double, maxy double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                nc = parse_netcdf(bytes(row["content"]))
                arr = np.asarray(nc["vars"][var], dtype=np.float32)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                elif arr.ndim == 3:
                    arr = np.moveaxis(arr, 0, 2)  # (band, y, x) → (y, x, band)
                else:
                    raise ValueError(f"{var}: expected 2-D/3-D grid, got {arr.shape}")
                bounds = [float("nan")] * 4
                lon = next((nc["vars"][k] for k in ("lon", "longitude", "x")
                            if k in nc["vars"]), None)
                lat = next((nc["vars"][k] for k in ("lat", "latitude", "y")
                            if k in nc["vars"]), None)
                if lon is not None and lat is not None and len(lon) > 1 and len(lat) > 1:
                    dx = (float(lon[-1]) - float(lon[0])) / (len(lon) - 1)
                    dy = (float(lat[-1]) - float(lat[0])) / (len(lat) - 1)
                    xs = sorted((float(lon[0]) - dx / 2, float(lon[-1]) + dx / 2))
                    ys = sorted((float(lat[0]) - dy / 2, float(lat[-1]) + dy / 2))
                    bounds = [xs[0], ys[0], xs[1], ys[1]]
                rows.append(
                    {
                        "path": row["path"],
                        "bytes": encode_image(arr, "raw"),
                        "w": arr.shape[1], "h": arr.shape[0], "c": arr.shape[2],
                        "minx": bounds[0], "miny": bounds[1],
                        "maxx": bounds[2], "maxy": bounds[3],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["path", "bytes", "w", "h", "c",
                               "minx", "miny", "maxx", "maxy"]
            )

    return files.mapInPandas(run, out_schema)


def write_netcdf(path: str, dims: list[tuple[str, int]],
                 variables: dict[str, tuple[list[str], np.ndarray]]) -> None:
    """Driver-side classic CDF-1 writer for SMALL files (fixtures, exports).
    ``variables``: name → (dim names, array). Types: int8/16/32, float32/64."""
    np_to_nc = {"int8": 1, "int16": 3, "int32": 4, "float32": 5, "float64": 6}
    dim_index = {n: i for i, (n, _) in enumerate(dims)}

    def pad4(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % 4)

    def name(s: str) -> bytes:
        return struct.pack(">I", len(s)) + pad4(s.encode())

    header = b"CDF\x01" + struct.pack(">I", 0)  # numrecs 0: no record vars
    header += struct.pack(">II", _NC_DIMENSION, len(dims))
    for n, sz in dims:
        header += name(n) + struct.pack(">I", sz)
    header += struct.pack(">II", 0, 0)  # no global attrs (ABSENT)
    var_hdrs = []
    for vname, (vdims, arr) in variables.items():
        typ = np_to_nc[str(arr.dtype)]
        vsize = (arr.size * _SIZES[typ] + 3) & ~3
        hdr = name(vname)
        hdr += struct.pack(">I", len(vdims))
        hdr += b"".join(struct.pack(">I", dim_index[d]) for d in vdims)
        hdr += struct.pack(">II", 0, 0)  # no var attrs
        hdr += struct.pack(">II", typ, vsize)
        var_hdrs.append((hdr, typ, vsize, arr))
    fixed = len(header) + 8 + sum(len(h) + 4 for h, *_ in var_hdrs)
    out = header + struct.pack(">II", _NC_VARIABLE, len(var_hdrs))
    begin = fixed
    datas = []
    for hdr, typ, vsize, arr in var_hdrs:
        out += hdr + struct.pack(">I", begin)
        datas.append(pad4(arr.astype(_DTYPES[typ]).tobytes()))
        begin += vsize
    with open(path, "wb") as f:
        f.write(out + b"".join(datas))
