"""Image codec gates: PNG exact, DCT ('jpeg') PSNR >= 40 dB, raw round-trip."""

import numpy as np
import pytest

from geospatial_studio_pipelines_spark.codecs import image as C
from geospatial_studio_pipelines_spark.datagen import fixture_pixels


@pytest.mark.parametrize("w,h", [(64, 64), (224, 96), (256, 512), (63, 61)])
def test_png_lossless_roundtrip(w, h):
    arr = fixture_pixels(991, w, h)
    assert np.array_equal(C.decode_png(C.encode_png(arr)), arr)


def test_png_gray_and_rgba():
    g = (np.arange(40 * 30) % 256).astype(np.uint8).reshape(30, 40)
    assert np.array_equal(C.decode_png(C.encode_png(g))[:, :, 0], g)
    rgba = np.dstack([fixture_pixels(5, 16, 16), np.full((16, 16, 1), 7, np.uint8)])
    assert np.array_equal(C.decode_png(C.encode_png(rgba)), rgba)


def test_png_filtered_decode():
    # exercise filter-type decode paths (Sub/Up/Average/Paeth) by crafting
    # scanlines with explicit filters
    import struct
    import zlib

    arr = fixture_pixels(3, 8, 5)
    h, w, c = arr.shape
    rows = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int32)
        f = [0, 1, 2, 3, 4][y % 5]
        enc = np.empty_like(line)
        for i in range(w * c):
            a = line[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[i] = (line[i] - pred) & 0xFF
        rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    buf = b"".join(
        [
            C._PNG_SIG,
            C._chunk(b"IHDR", ihdr),
            C._chunk(b"IDAT", zlib.compress(b"".join(rows))),
            C._chunk(b"IEND", b""),
        ]
    )
    assert np.array_equal(C.decode_png(buf), arr)


@pytest.mark.parametrize("w,h", [(64, 64), (224, 224), (256, 512)])
def test_dct_psnr_gate(w, h):
    arr = fixture_pixels(31337, w, h)
    back = C.decode_dct(C.encode_dct(arr, 90))
    p = C.psnr(arr, back)
    assert p >= 40.0, p
    assert not np.array_equal(arr, back)  # genuinely lossy


def test_raw_float_roundtrip():
    f = np.linspace(-9999, 1e4, 32 * 33, dtype=np.float32).reshape(32, 33, 1)
    assert np.array_equal(C.decode_raw(C.encode_raw(f)), f)


def test_decode_dispatch():
    arr = fixture_pixels(2, 16, 16)
    assert np.array_equal(C.decode_image(C.encode_image(arr, "png")), arr)
    assert C.decode_image(C.encode_image(arr, "jpeg")).shape == arr.shape
    with pytest.raises(NotImplementedError):
        C.decode_image(b"\xff\xd8\xffnotreallyjpeg")
