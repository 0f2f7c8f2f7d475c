"""Classic NetCDF source: round-trip + grid extraction (S14/S15 breadth)."""

import numpy as np
import pytest

from geospatial_studio_pipelines_spark.codecs.image import decode_image
from geospatial_studio_pipelines_spark.sources import netcdf as NC


def test_parse_roundtrip(tmp_path):
    lat = np.linspace(40.0, 41.5, 4).astype(np.float64)
    lon = np.linspace(10.0, 11.0, 5).astype(np.float64)
    grid = (np.arange(20, dtype=np.float32) * 0.5).reshape(4, 5)
    p = str(tmp_path / "a.nc")
    NC.write_netcdf(
        p,
        dims=[("lat", 4), ("lon", 5)],
        variables={
            "lat": (["lat"], lat),
            "lon": (["lon"], lon),
            "sst": (["lat", "lon"], grid),
        },
    )
    nc = NC.parse_netcdf(open(p, "rb").read())
    assert dict(nc["dims"]) == {"lat": 4, "lon": 5}
    assert np.array_equal(nc["vars"]["lat"], lat)
    assert np.array_equal(nc["vars"]["lon"], lon)
    assert np.array_equal(nc["vars"]["sst"], grid)


def test_parse_rejects_non_classic():
    with pytest.raises(ValueError, match="CDF magic"):
        NC.parse_netcdf(b"nonsense" * 4)
    with pytest.raises(ValueError, match="HDF5"):
        NC.parse_netcdf(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)


def test_read_netcdf_var_spark(spark, tmp_path):
    lat = np.linspace(40.0, 41.5, 4).astype(np.float64)  # spacing 0.5
    lon = np.linspace(10.0, 11.0, 5).astype(np.float64)  # spacing 0.25
    grid = (np.arange(20, dtype=np.float32) * 0.5).reshape(4, 5)
    for stem in ("a", "b"):
        NC.write_netcdf(
            str(tmp_path / f"{stem}.nc"),
            dims=[("lat", 4), ("lon", 5)],
            variables={"lat": (["lat"], lat), "lon": (["lon"], lon),
                       "sst": (["lat", "lon"], grid)},
        )
    rows = NC.read_netcdf_var(spark, str(tmp_path) + "/*.nc", "sst").collect()
    assert len(rows) == 2
    r = rows[0]
    assert (r.w, r.h, r.c) == (5, 4, 1)
    # CF cell-edge bounds from center spacing
    assert abs(r.minx - (10.0 - 0.125)) < 1e-9 and abs(r.maxx - (11.0 + 0.125)) < 1e-9
    assert abs(r.miny - (40.0 - 0.25)) < 1e-9 and abs(r.maxy - (41.5 + 0.25)) < 1e-9
    assert np.array_equal(decode_image(bytes(r.bytes))[:, :, 0], grid)
