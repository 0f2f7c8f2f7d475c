"""Object ingest: URL fetch + binary-directory scan (SURVEY.md §2.1 S3/S14
first half — the part the engine previously declared storage-layer).

The reference's download jobs pull presigned URLs / dataset archives into
the store (``user_store_download_operations.py:54-63``,
``sen2_download_operations.py`` fetch paths). Spark-first re-expression:

* ``fetch_urls`` — executor-side fetch of a DataFrame of URLs via urllib
  inside ``mapInPandas``: the driver never sees a byte, a failed URL
  quarantines as ``(ok=false, err)`` instead of failing the task (the
  reference retries whole pods on one bad object). ``file://`` URLs work
  offline — that is also how the sandbox tests it; http(s) uses the same
  code path on a networked cluster.
* ``read_binary_dir`` — Spark's ``binaryFile`` source over a directory of
  encoded images → the engine's image-table shape
  ``(image_id, bytes, w, h, fmt)``, dimensions probed from the codec
  header executor-side. This is the end-to-end "object store → image
  table" scan: partitioned by file, no driver funnel, ready for
  ``validate_images`` (S15) and the decode operators.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..codecs.image import decode_image

#: refuse single objects larger than this per fetch (an executor OOM guard:
#: one 80 GB mis-published object must quarantine, not kill the stage)
FETCH_MAX_BYTES = 1 << 30


#: schemes a URL table may fetch by default. The table is DATA, not config —
#: a poisoned row must not be able to read executor-local files (file://) or
#: probe internal endpoints through exotic handlers; disallowed schemes
#: quarantine as ok=false rows. Pass schemes=("file",) explicitly for
#: offline/local-fixture ingest.
FETCH_ALLOWED_SCHEMES = ("http", "https")


def fetch_urls(
    urls: DataFrame,
    url_col: str = "url",
    timeout_s: float = 30.0,
    max_bytes: int = FETCH_MAX_BYTES,
    schemes: tuple[str, ...] = FETCH_ALLOWED_SCHEMES,
) -> DataFrame:
    """(… , url) → (…, bytes, ok, err): distributed URL fetch with per-row
    error capture. Keeps every input column (pass-through schema). URLs whose
    scheme is not in ``schemes`` quarantine (SSRF/local-read guard)."""
    in_schema = ", ".join(f"{c} {t}" for c, t in urls.dtypes)
    out_schema = in_schema + ", bytes binary, ok boolean, err string"
    allowed = tuple(s.lower() for s in schemes)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.parse import urlsplit
        from urllib.request import urlopen

        for pdf in batches:
            if pdf.empty:
                continue
            blobs, oks, errs = [], [], []
            for u in pdf[url_col]:
                try:
                    scheme = urlsplit(u).scheme.lower()
                    if scheme not in allowed:
                        raise ValueError(
                            f"scheme {scheme!r} not in allowlist {allowed}"
                        )
                    with urlopen(u, timeout=timeout_s) as r:
                        data = r.read(max_bytes + 1)
                    if len(data) > max_bytes:
                        raise ValueError(f"object exceeds {max_bytes} bytes")
                    blobs.append(data)
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — quarantine, don't fail the stage
                    blobs.append(None)
                    oks.append(False)
                    errs.append(f"{type(e).__name__}: {e}")
            out = pdf.copy()
            out["bytes"] = blobs
            out["ok"] = oks
            out["err"] = errs
            yield out

    return urls.mapInPandas(fetch, out_schema)


def read_binary_dir(
    spark,
    path: str,
    glob: str = "*",
    id_from: str = "stem",
) -> DataFrame:
    """Directory of encoded image objects → image-table rows
    ``(image_id string, bytes binary, w int, h int, fmt string)``.

    Uses the ``binaryFile`` source (one task per file; ``pathGlobFilter``
    prunes at listing time). Dimensions/format probe decodes the header
    executor-side; undecodable blobs surface as ``fmt='invalid'`` with
    w=h=-1 so the S15 gate can quarantine them downstream."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            # zip over the two columns, not iterrows(): iterrows builds a
            # pandas Series object per row, pure overhead at 10^3+ files
            # per task
            for p, content in zip(pdf["path"].to_numpy(), pdf["content"].to_numpy()):
                name = os.path.basename(p)
                image_id = os.path.splitext(name)[0] if id_from == "stem" else name
                blob = bytes(content)
                try:
                    arr = decode_image(blob)
                    h, w = int(arr.shape[0]), int(arr.shape[1])
                    fmt = _sniff_format(blob)
                except Exception:  # noqa: BLE001 — poisoned object → flagged row
                    w = h = -1
                    fmt = "invalid"
                rows.append(
                    {"image_id": image_id, "bytes": blob, "w": w, "h": h, "fmt": fmt}
                )
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return files.mapInPandas(
        probe, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _sniff_format(blob: bytes) -> str:
    from ..codecs import image as I

    if blob[:8] == I._PNG_SIG:
        return "png"
    if blob[:4] == I._GJ_MAGIC:
        return "dct"
    if blob[:4] == I._GR_MAGIC:
        return "raw"
    return "unknown"
