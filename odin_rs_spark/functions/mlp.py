"""Dense MLP forward pass as a vectorized classify kernel (SURVEY §2.12;
parity: the ONNX smoke/fire classifier odin_onnx/src/lib.rs:47-150 —
load model → batch inputs → forward → argmax/confidence).

The container has no onnxruntime, but the *math* of an MLP classifier is
a handful of numpy matmuls — so, in the spirit of sources/netcdf3.py and
sources/imagecodec.py, the classify kernel is real and executable here:
weights are plain (W, b) arrays (a real deployment reads them out of the
ONNX initializer tensors, or swaps this forward for an onnxruntime
session — that file-format/runtime boundary is the one remaining seam,
and it is exactly where `operators.multimodal._decode_backend` already
documents the swap).

Determinism contract (what lets q125's DuckDB oracle replay the whole
network EXACTLY, no rounding tolerance): inputs are quantized to
1/`quant` steps (dyadic — exact in binary doubles) and weights are
dyadic rationals, so every product and sum in the forward pass is exact;
summation order is then irrelevant, argmax cannot flip on a phantom ulp,
and "confidence" is the exact top-two logit margin rather than a
transcendental softmax.

Scale shape: one Arrow-batched pandas UDF per row batch — embeddings
never shuffle, no driver round-trip; weight matrices ride the closure
(broadcast-sized by construction: a classifier head is KBs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)


def formula_weights(
    in_dim: int = 64, hidden: int = 8, out: int = 3, denom: int = 16
) -> dict:
    """Deterministic fixture weights (dyadic rationals k/denom): the
    checked-in 'model' q125 classifies with — both engines regenerate
    it from the formula, so no binary artifact is needed."""
    w1 = np.array(
        [
            [((i * 7 + k * 11) % 13 - 6) / denom for k in range(hidden)]
            for i in range(in_dim)
        ]
    )
    b1 = np.array([(k % 5 - 2) / denom for k in range(hidden)])
    w2 = np.array(
        [
            [((k * 5 + c * 3) % 11 - 5) / denom for c in range(out)]
            for k in range(hidden)
        ]
    )
    b2 = np.array([((c * 7) % 3 - 1) / denom for c in range(out)])
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2}


def mlp_forward(x: np.ndarray, weights: dict) -> np.ndarray:
    """(n, in_dim) → (n, out) logits; ReLU hidden layer. Exact when
    inputs/weights are dyadic (see module docstring)."""
    h = np.maximum(x @ weights["w1"] + weights["b1"], 0.0)
    return h @ weights["w2"] + weights["b2"]


CLASSIFY_SCHEMA = StructType(
    [
        StructField("pred", IntegerType()),
        StructField("margin", DoubleType()),
    ]
)


def mlp_classify(
    vec_col: Column | str, weights: dict, quant: int = 16
) -> Column:
    """bytes-free classify kernel: array<numeric> column →
    struct(pred, margin). `pred` = argmax with lowest-index tie-break;
    `margin` = top logit − runner-up (exact). Inputs quantize to
    floor(x·quant + 0.5)/quant first — the same engine-identical
    rounding the int8 path uses."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    def _udf(s: pd.Series) -> pd.DataFrame:
        # NULL embeddings (failed encoder rows) classify to NULL instead
        # of letting np.array build a ragged object array and fail the
        # matmul with an opaque shape error — same mask-and-skip
        # contract as the LSH/cell-assign/PQ kernels
        valid = np.array([v is not None for v in s])
        in_dim = weights["w1"].shape[0]
        x = np.array(
            [
                np.asarray(v, dtype=np.float64) if ok else np.zeros(in_dim)
                for v, ok in zip(s, valid)
            ]
        )
        xq = np.floor(x * quant + 0.5) / quant
        logits = mlp_forward(xq, weights)
        pred = np.argmax(logits, axis=1)  # first max wins ties
        part = np.partition(logits, -2, axis=1)
        margin = part[:, -1] - part[:, -2]
        out = pd.DataFrame(
            {"pred": pred.astype(np.int32), "margin": margin}
        ).astype({"pred": "Int32"})
        out.loc[~valid, ["pred", "margin"]] = None
        return out

    return F.pandas_udf(_udf, CLASSIFY_SCHEMA)(c)


def classify_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    weights: dict | None = None,
    quant: int = 16,
) -> DataFrame:
    """Attach (pred, margin) classification columns to an embedding
    frame — the odin_onnx predict_batch surface over DataFrames."""
    w = weights if weights is not None else formula_weights()
    out = df.withColumn("__cls", mlp_classify(vec_col, w, quant))
    return out.select(
        "*",
        F.col("__cls.pred").alias("pred"),
        F.col("__cls.margin").alias("margin"),
    ).drop("__cls")
