"""CRS transforms + inverse-mapping grid warp (SURVEY.md §2.8 F7).

The reference shells out to ``gdalwarp -t_srs EPSG:4326`` whenever an input
raster's CRS differs (``raster_data_operations.py:363-431``,
``check_projection`` ``:16-31``) and matches rasters to a target grid with
``match_raster_to_target`` (``:434-462``). The Spark engine keeps pixels
inside Arrow batches, so the warp is a numpy kernel: destination pixel
centers are inverse-projected into the source grid and sampled
(nearest/bilinear), NODATA outside — the same inverse-mapping algorithm
gdalwarp implements.

Supported CRS: ``EPSG:4326`` (lon/lat degrees, equirectangular pixel grids)
and ``EPSG:3857`` (spherical web-mercator meters) — the pair the reference
actually moves between (its mask buffers go through 3857,
``postprocess_generic_helper_functions.py:273-277``). Formulas are the
standard published spherical-mercator equations (R = 6378137 m).
"""

from __future__ import annotations

import numpy as np

R_MERC = 6378137.0  # EPSG:3857 sphere radius (meters)
NODATA = -9999.0


def lonlat_to_webmerc(lon, lat):
    """EPSG:4326 → EPSG:3857. Latitude clamped to the mercator domain."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.051128779806589, 85.051128779806589)
    x = np.deg2rad(lon) * R_MERC
    y = np.log(np.tan(np.pi / 4.0 + np.deg2rad(lat) / 2.0)) * R_MERC
    return x, y


def webmerc_to_lonlat(x, y):
    """EPSG:3857 → EPSG:4326."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.rad2deg(x / R_MERC)
    lat = np.rad2deg(2.0 * np.arctan(np.exp(y / R_MERC)) - np.pi / 2.0)
    return lon, lat


_CRS_ALIASES = {
    "EPSG:4326": "EPSG:4326",
    "4326": "EPSG:4326",
    "WGS84": "EPSG:4326",
    "EPSG:3857": "EPSG:3857",
    "3857": "EPSG:3857",
}


def _norm_crs(crs: str) -> str:
    try:
        return _CRS_ALIASES[str(crs).upper()]
    except KeyError:
        raise ValueError(f"unsupported CRS {crs!r} (supported: EPSG:4326, EPSG:3857)")


def transform_points(src_crs: str, dst_crs: str, x, y):
    """Coordinate arrays from src_crs to dst_crs (identity when equal)."""
    s, d = _norm_crs(src_crs), _norm_crs(dst_crs)
    if s == d:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if s == "EPSG:4326":
        return lonlat_to_webmerc(x, y)
    return webmerc_to_lonlat(x, y)


def warp_array(
    arr: np.ndarray,
    src_bounds: tuple[float, float, float, float],
    src_crs: str,
    dst_bounds: tuple[float, float, float, float],
    dst_crs: str,
    out_h: int,
    out_w: int,
    method: str = "nearest",
    nodata: float = NODATA,
) -> np.ndarray:
    """Inverse-mapping warp of an (H, W, C) array from (src_bounds, src_crs)
    to an (out_h, out_w) grid over (dst_bounds, dst_crs). Bounds are
    (minx, miny, maxx, maxy) in their CRS; row 0 is the top (max y).
    Destination pixels whose center falls outside the source extent get
    ``nodata`` — gdalwarp's -dstnodata behavior."""
    h, w, c = arr.shape
    sminx, sminy, smaxx, smaxy = (float(v) for v in src_bounds)
    dminx, dminy, dmaxx, dmaxy = (float(v) for v in dst_bounds)
    # destination pixel centers in dst CRS
    dx = dminx + (np.arange(out_w) + 0.5) * (dmaxx - dminx) / out_w
    dy = dmaxy - (np.arange(out_h) + 0.5) * (dmaxy - dminy) / out_h
    gx, gy = np.meshgrid(dx, dy)
    sx, sy = transform_points(dst_crs, src_crs, gx.ravel(), gy.ravel())
    # fractional source pixel coordinates
    fx = (sx - sminx) / (smaxx - sminx) * w - 0.5
    fy = (smaxy - sy) / (smaxy - sminy) * h - 0.5
    out = np.full((out_h * out_w, c), nodata, dtype=np.float32)
    if method == "nearest":
        xi = np.rint(fx).astype(np.int64)
        yi = np.rint(fy).astype(np.int64)
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        out[ok] = arr[yi[ok], xi[ok], :]
    elif method == "bilinear":
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        ok = (fx >= -0.5) & (fx <= w - 0.5) & (fy >= -0.5) & (fy <= h - 0.5)
        x0c = np.clip(x0, 0, w - 1)
        y0c = np.clip(y0, 0, h - 1)
        x1c = np.clip(x0 + 1, 0, w - 1)
        y1c = np.clip(y0 + 1, 0, h - 1)
        wx = np.clip(fx - x0, 0.0, 1.0)[:, None]
        wy = np.clip(fy - y0, 0.0, 1.0)[:, None]
        a = arr.astype(np.float64).reshape(h * w, c)
        top = a[y0c * w + x0c] * (1 - wx) + a[y0c * w + x1c] * wx
        bot = a[y1c * w + x0c] * (1 - wx) + a[y1c * w + x1c] * wx
        val = (top * (1 - wy) + bot * wy).astype(np.float32)
        out[ok] = val[ok]
    else:
        raise ValueError(method)
    return out.reshape(out_h, out_w, c)
