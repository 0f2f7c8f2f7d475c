"""Masking suite — SCL scene-class, HLS bit-packed QA, value sentinels
(SURVEY.md §2.3 J4, §2.8 F11–F12).

Reference semantics reproduced exactly
(``postprocess_generic_helper_functions.py``):

* sentinel values: CLOUD=999, SNOW_OR_ICE=998, PERMANENT_WATER=997 (:38-52)
* ``s2_masking`` (:136-168): prediction pixels where the QA band ∈ the class
  list are set to the sentinel value
* ``hls_masking`` (:120-133): a QA *byte* is bad when any bit set in the
  mask-bit template is also set in the byte — computed here as a 256-entry
  lookup table instead of per-value string formatting
* LULC water class [1] (:50)

The raster-mask join (J4) is an equi-join on image_id followed by numpy
broadcasting inside one ``mapInPandas`` — the Spark shape of "align the
prediction with the input's QA band".
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..codecs.image import decode_image, encode_image

CLOUD_VALUE = 999.0
SNOW_OR_ICE_VALUE = 998.0
PERMANENT_WATER_VALUE = 997.0
S2_CLOUD_MASK = [3, 8, 9]
S2_SNOW_OR_ICE_MASK = [11]
S2_PERMANENT_WATER_MASK = [6]
LULC_PERMANENT_WATER_MASK = [1]
HLS_CLOUD_BITS = "00001111"
HLS_SNOW_BITS = "00010000"
HLS_WATER_BITS = "00100000"


def s2_mask_array(pred: np.ndarray, qa: np.ndarray, classes: list[int], value: float) -> np.ndarray:
    """Pointwise twin of s2_masking: where qa ∈ classes → value."""
    mask = np.isin(qa[:, :, 0], classes)
    out = pred.astype(np.float32).copy()
    out[mask] = value
    return out


def hls_bad_lut(mask_bits: str) -> np.ndarray:
    """256-entry bool LUT: byte v is bad iff (v & bits) != 0 — equivalent to
    the reference's per-value binary-string comparison (:122-128)."""
    bits = int(mask_bits, 2)
    v = np.arange(256, dtype=np.int64)
    return (v & bits) != 0


def hls_mask_array(pred: np.ndarray, qa_bytes: np.ndarray, mask_bits: str, value: float) -> np.ndarray:
    bad = hls_bad_lut(mask_bits)[qa_bytes[:, :, 0].astype(np.int64)]
    out = pred.astype(np.float32).copy()
    out[bad] = value
    return out


_CHAIN = [
    ("cloud", "s2", S2_CLOUD_MASK, HLS_CLOUD_BITS, CLOUD_VALUE),
    ("snow_or_ice", "s2", S2_SNOW_OR_ICE_MASK, HLS_SNOW_BITS, SNOW_OR_ICE_VALUE),
    ("permanent_water", "s2", S2_PERMANENT_WATER_MASK, HLS_WATER_BITS, PERMANENT_WATER_VALUE),
]


def apply_mask_chain(
    preds: DataFrame,
    qa: DataFrame,
    pred_col: str = "pred_bytes",
    qa_col: str = "qa_bytes",
    kinds: tuple[str, ...] = ("cloud", "snow_or_ice", "permanent_water"),
    scheme: str = "s2",
    out_col: str = "masked_bytes",
) -> DataFrame:
    """J4 + F11/F12: join predictions with QA rasters on image_id, apply the
    masking chain in the reference's order (cloud → snow → water,
    postprocess-generic-single.py:68-113). ``scheme``: 's2' uses class-code
    matching on the QA band; 'hls' uses the bit-packed LUT on ``qa_col``.
    """
    joined = preds.join(qa.select("image_id", qa_col), "image_id")
    steps = [c for c in _CHAIN if c[0] in kinds]
    carry = [c for c in preds.columns]
    schema = ", ".join(f"{c} {t}" for c, t in preds.dtypes) + f", {out_col} binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            outs = []
            for _, row in pdf.iterrows():
                pred = decode_image(bytes(row[pred_col]))
                qa_arr = decode_image(bytes(row[qa_col]))
                for _name, _s, classes, bits, value in steps:
                    if scheme == "s2":
                        pred = s2_mask_array(pred, qa_arr, classes, value)
                    else:
                        pred = hls_mask_array(pred, qa_arr, bits, value)
                outs.append(encode_image(pred.astype(np.float32), "raw"))
            out = pdf[carry].copy()
            out[out_col] = outs
            yield out

    return joined.mapInPandas(run, schema)


def mask_chain_oracle(pred: np.ndarray, qa: np.ndarray, scheme: str = "s2") -> np.ndarray:
    """Single-node oracle applying the same chain with the straight-line
    reference recipe (isin → where → fillna ≡ assignment)."""
    out = pred.astype(np.float32).copy()
    for _name, _s, classes, bits, value in _CHAIN:
        if scheme == "s2":
            m = np.isin(qa[:, :, 0], classes)
        else:
            m = (qa[:, :, 0].astype(np.int64) & int(bits, 2)) != 0
        out[m] = value
    return out
