"""URL fetch + binaryFile ingest (S3/S14 first half, end-to-end offline)."""

import numpy as np

from geospatial_studio_pipelines_spark.codecs.image import encode_image
from geospatial_studio_pipelines_spark.sources import ingest


def _img(seed, h=6, w=5, c=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (h, w, c)).astype(np.uint8)


def test_fetch_urls_file_scheme_and_quarantine(spark, tmp_path):
    good = tmp_path / "obj1.bin"
    good.write_bytes(b"payload-1")
    big = tmp_path / "obj2.bin"
    big.write_bytes(b"x" * 1024)
    urls = spark.createDataFrame(
        [("a", f"file://{good}"), ("b", f"file://{big}"),
         ("c", f"file://{tmp_path}/missing.bin")],
        "obj_id string, url string",
    )
    got = {
        r.obj_id: r
        for r in ingest.fetch_urls(urls, max_bytes=512, schemes=("file",)).collect()
    }
    assert got["a"].ok and bytes(got["a"].bytes) == b"payload-1" and got["a"].err is None
    assert not got["b"].ok and "exceeds" in got["b"].err  # oversize quarantined
    assert not got["c"].ok and got["c"].bytes is None  # missing quarantined
    assert got["c"].err  # reason captured, stage did not fail


def test_fetch_urls_scheme_allowlist_default_blocks_file(spark, tmp_path):
    """A poisoned URL table cannot read executor-local files: file:// (and
    any non-http(s) scheme) quarantines unless explicitly opted in."""
    secret = tmp_path / "secret.txt"
    secret.write_bytes(b"do-not-exfiltrate")
    urls = spark.createDataFrame(
        [("f", f"file://{secret}"), ("g", "gopher://evil.internal/x")],
        "obj_id string, url string",
    )
    got = {r.obj_id: r for r in ingest.fetch_urls(urls).collect()}
    assert not got["f"].ok and got["f"].bytes is None and "allowlist" in got["f"].err
    assert not got["g"].ok and "allowlist" in got["g"].err


def test_read_binary_dir_probes_dims_and_flags_garbage(spark, tmp_path):
    a = _img(1, 6, 5)
    b = _img(2, 8, 4)
    (tmp_path / "scene_a.png").write_bytes(encode_image(a, "png"))
    (tmp_path / "scene_b.raw").write_bytes(encode_image(b, "raw"))
    (tmp_path / "garbage.bin").write_bytes(b"\x00\x01not-an-image")
    df = ingest.read_binary_dir(spark, str(tmp_path))
    rows = {r.image_id: r for r in df.collect()}
    assert rows["scene_a"].fmt == "png" and (rows["scene_a"].w, rows["scene_a"].h) == (5, 6)
    assert rows["scene_b"].fmt == "raw" and (rows["scene_b"].w, rows["scene_b"].h) == (4, 8)
    assert rows["garbage"].fmt == "invalid" and rows["garbage"].w == -1
    # glob pruning happens at listing time
    only_png = ingest.read_binary_dir(spark, str(tmp_path), glob="*.png").collect()
    assert [r.image_id for r in only_png] == ["scene_a"]


def test_ingest_chains_into_validation_gate(spark, tmp_path):
    """read_binary_dir → validate_images/quarantine_invalid (S15) — the full
    object-store → clean image table path."""
    from geospatial_studio_pipelines_spark.sources.geojson import quarantine_invalid

    (tmp_path / "ok.png").write_bytes(encode_image(_img(3, 7, 7), "png"))
    (tmp_path / "bad.bin").write_bytes(b"junkjunkjunk")
    df = ingest.read_binary_dir(spark, str(tmp_path))
    valid, quarantined = quarantine_invalid(df)
    assert [r.image_id for r in valid.collect()] == ["ok"]
    q = quarantined.collect()
    assert len(q) == 1 and q[0].image_id == "bad" and q[0].reason
