"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial slice; ``queries()`` maps every
implemented operator family (SURVEY.md §2) to a (spark, sf_dir) callable;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (omitted only for
geometry/raster ops whose predicates aren't SQL-expressible — those carry a
rows-only check plus pytest single-node oracles).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geospatial_studio_pipelines_spark import contracts  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hex-cell assignment + bbox spatial join over footprints
    derived from /root/testdata/sf0.001 orders × part AOIs."""
    sf_dir = "/root/testdata/sf0.001"
    return contracts.q_bbox_spatial_join(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: fn for name, (fn, _sql) in contracts.QUERIES.items()
    }
    out.update(contracts.ROWS_ONLY_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in contracts.QUERIES.items()}
