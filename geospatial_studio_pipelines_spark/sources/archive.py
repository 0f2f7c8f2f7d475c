"""Archive source/sink (SURVEY.md §2.1 S13/S14).

The reference's curated-upload ingest wgets a dataset archive and
autodetect-extracts zip/tar (``download_dataset``,
``claimed_curated_upload_v2.py:304-331``); its postprocess zips task
artifacts for upload (``zip_inference_data``,
``postprocess_generic_helper_functions.py:407-428``). Spark-first:

* ``unpack_archives`` — a DataFrame of archive blobs → one row per member
  file, extracted INSIDE the Arrow batch (zip/tar autodetected per blob by
  magic bytes, like the reference's extension sniff). Distributed: each
  archive unpacks where its row lives; no driver funnel, no temp dirs.
  The download itself is the storage layer's concern (binaryFile scan /
  object-store connector), not this operator.
* ``write_zip`` — driver-side convenience producing the reference's
  single-artifact zip from a (name, bytes) result set. Collects; use only
  for per-task artifact bundles (the reference's usage), never for tables.
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _members(blob: bytes) -> list[tuple[str, bytes]]:
    """zip/tar autodetect (magic bytes, not filename — the blob may be
    unnamed): returns [(member_name, member_bytes), ...]."""
    if blob[:4] == b"PK\x03\x04" or blob[:4] == b"PK\x05\x06":
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            return [(n, zf.read(n)) for n in zf.namelist() if not n.endswith("/")]
    try:
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            return [
                (m.name, tf.extractfile(m).read())
                for m in tf.getmembers()
                if m.isfile()
            ]
    except tarfile.TarError:
        raise ValueError("unrecognized archive format (not zip, not tar)")


def unpack_archives(
    df: DataFrame,
    blob_col: str = "archive_bytes",
    name_col: str = "archive_name",
) -> DataFrame:
    """One output row per member file of each archive row:
    (archive_name, member_path, member_bytes, member_size)."""
    cols = [name_col, blob_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                for member, data in _members(bytes(row[blob_col])):
                    rows.append(
                        {
                            "archive_name": row[name_col],
                            "member_path": member,
                            "member_bytes": data,
                            "member_size": len(data),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["archive_name", "member_path", "member_bytes", "member_size"],
            )

    return df.select(*cols).mapInPandas(
        run,
        "archive_name string, member_path string, member_bytes binary, member_size long",
    )


def write_zip(df: DataFrame, path: str, name_col: str = "name", bytes_col: str = "bytes") -> int:
    """S13 artifact sink: zip the (name, bytes) rows into ONE file at
    ``path`` (the reference's per-task artifact bundle). Driver-side
    collect — bounded by the task artifact set, not table scale. Returns
    the member count."""
    n = 0
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for row in df.select(name_col, bytes_col).toLocalIterator():
            zf.writestr(str(row[name_col]), bytes(row[bytes_col]))
            n += 1
    return n
