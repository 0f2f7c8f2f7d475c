"""As-of / nearest-date join (SURVEY.md §2.3 J3).

Reference semantics (``inference_planner_functions.py:137-203``): for each
primary-modality acquisition date, find the closest secondary-modality date
within ``[p - pre_days, p + post_days]``; minimum absolute time difference
wins, and on a tie (one secondary a day before, one a day after) the
**earlier** secondary wins (the reference takes ``list.index(min(...))`` over
dates sorted ascending). Primaries with no in-window secondary are dropped.

Spark-first expression: a range join (AQE turns it into a broadcast range
join when one side is small) + window ranking — no UDF at all, so the whole
join stays JVM-side:

    primary JOIN secondary
      ON s.date BETWEEN p.date - pre AND p.date + post  [AND partition keys]
    rank by (abs(datediff), s.date) per primary row, keep rank 1

The ``(abs(diff), s.date)`` order key reproduces the reference tie-break
exactly. At scale the equality part of the key (``cell_id``) makes this a
shuffle hash join on cell with a small date-range amplification, not a
cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_nearest_date_join(
    primary: DataFrame,
    secondary: DataFrame,
    on: list[str],
    primary_date: str = "date",
    secondary_date: str = "date",
    pre_days: int = 1,
    post_days: int = 1,
    suffix: str = "_sec",
) -> DataFrame:
    """Nearest-date as-of join.

    ``on``: equality keys joined alongside the date-range predicate (e.g.
    ``["cell_id"]`` to match within a spatial cell, mirroring how the
    reference matches per-bbox). Output keeps all primary columns plus the
    secondary's columns suffixed.
    """
    p = primary.alias("p")
    s = secondary.alias("s")
    eq = [F.col(f"p.{k}") == F.col(f"s.{k}") for k in on]
    rng = [
        F.col(f"s.{secondary_date}") >= F.date_sub(F.col(f"p.{primary_date}"), pre_days),
        F.col(f"s.{secondary_date}") <= F.date_add(F.col(f"p.{primary_date}"), post_days),
    ]
    cond = rng[0] & rng[1]
    for e in eq:
        cond = cond & e

    joined = p.join(s, cond, "inner")
    diff = F.abs(F.datediff(F.col(f"s.{secondary_date}"), F.col(f"p.{primary_date}")))
    # dedupe key: every primary row (not just every date) picks one secondary
    part_cols = [F.col(f"p.{c}") for c in primary.columns]
    w = Window.partitionBy(*part_cols).orderBy(diff.asc(), F.col(f"s.{secondary_date}").asc())
    ranked = joined.withColumn("__rk", F.row_number().over(w))
    out_cols = [F.col(f"p.{c}").alias(c) for c in primary.columns] + [
        F.col(f"s.{c}").alias(c if c not in primary.columns else f"{c}{suffix}")
        for c in secondary.columns
        if c not in on
    ]
    return ranked.filter(F.col("__rk") == 1).select(*out_cols)


def asof_oracle_pandas(
    primary_pdf,
    secondary_pdf,
    on: list[str],
    primary_date: str = "date",
    secondary_date: str = "date",
    pre_days: int = 1,
    post_days: int = 1,
):
    """Single-node oracle: straight-line reimplementation of the reference
    loop (inference_planner_functions.py:180-198), including the
    earliest-on-tie behavior. Returns list of (primary_index, secondary_index).
    """
    import pandas as pd

    out = []
    sec_sorted = secondary_pdf.sort_values(secondary_date).reset_index()
    for pi, prow in primary_pdf.iterrows():
        cands = sec_sorted
        for k in on:
            cands = cands[cands[k] == prow[k]]
        if cands.empty:
            continue
        p = pd.Timestamp(prow[primary_date])
        lo, hi = p - pd.Timedelta(days=pre_days), p + pd.Timedelta(days=post_days)
        diffs = []
        for _, srow in cands.iterrows():
            t = pd.Timestamp(srow[secondary_date])
            diffs.append(abs(t - p) if lo <= t <= hi else pd.Timedelta(days=100))
        best = diffs.index(min(diffs))
        srow = cands.iloc[best]
        t = pd.Timestamp(srow[secondary_date])
        if lo <= t <= hi:
            out.append((pi, int(srow["index"])))
    return out
