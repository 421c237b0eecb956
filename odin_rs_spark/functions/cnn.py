"""Conv-net forward pass as a vectorized classify kernel (SURVEY
§2.12; parity: the reference's smoke/fire image classifier is a CONV
net loaded from an .onnx file — odin_onnx/src/lib.rs:47-150 session →
fit image to model size → forward → class scores; functions/mlp.py
covers the dense-head class, this module covers the conv class).

Architecture handled (the `onnx.load_onnx_cnn` walk): Conv 3x3 SAME →
ReLU → MaxPool 2x2/2 → Flatten → Gemm. The forward is plain numpy —
an im2col matmul per Arrow batch, no per-pixel Python.

Determinism contract (the q125/q130 discipline, extended to conv):
pixels quantize to v/256 (dyadic) and weights are dyadic rationals
k/16, so every convolution product/sum is exact in binary doubles;
maxpool is order-free (max of exact values), argmax cannot flip on a
phantom ulp, and the DuckDB oracle replays the ENTIRE network —
convolution as a 9-term kernel join, pooling as a grouped max, the
dense head as an indexed-weight join — with zero tolerance.

Scale shape: one Arrow-batched pandas UDF per row batch; image bytes
never shuffle (decode happens in the same mapInPandas stage); weights
ride the closure (a small conv head is KBs, broadcast-sized)."""

from __future__ import annotations

import numpy as np


def formula_cnn_weights(
    in_ch: int = 1, n_filt: int = 4, side: int = 16, out: int = 3,
    denom: int = 16,
) -> dict:
    """Deterministic dyadic fixture weights (k/denom) — both engines
    regenerate them from the formula, so the committed .onnx fixture
    is bit-exact reproducible."""
    wc = np.array(
        [
            [
                [
                    [((f * 5 + c * 7 + dy * 3 + dx * 11) % 13 - 6) / denom
                     for dx in range(3)]
                    for dy in range(3)
                ]
                for c in range(in_ch)
            ]
            for f in range(n_filt)
        ]
    )
    bc = np.array([((f * 3) % 5 - 2) / denom for f in range(n_filt)])
    flat = n_filt * (side // 2) * (side // 2)
    wd = np.array(
        [
            [((i * 13 + o * 5) % 17 - 8) / denom for o in range(out)]
            for i in range(flat)
        ]
    )
    bd = np.array([((o * 5) % 3 - 1) / denom for o in range(out)])
    return {"wc": wc, "bc": bc, "wd": wd, "bd": bd}


def conv2d_same(x: np.ndarray, wc: np.ndarray, bc: np.ndarray) -> np.ndarray:
    """(n, C, H, W) × (F, C, 3, 3) → (n, F, H, W), SAME zero padding,
    stride 1 — vectorized im2col matmul (one BLAS call per batch)."""
    n, c, h, w = x.shape
    f = wc.shape[0]
    xp = np.zeros((n, c, h + 2, w + 2), dtype=x.dtype)
    xp[:, :, 1:-1, 1:-1] = x
    cols = np.empty((n, c, 3, 3, h, w), dtype=x.dtype)
    for dy in range(3):
        for dx in range(3):
            cols[:, :, dy, dx] = xp[:, :, dy : dy + h, dx : dx + w]
    cols = cols.reshape(n, c * 9, h * w)
    kern = wc.reshape(f, c * 9)
    out = np.einsum("fk,nkp->nfp", kern, cols)
    return out.reshape(n, f, h, w) + bc[None, :, None, None]


def maxpool2(x: np.ndarray) -> np.ndarray:
    """(n, F, H, W) → (n, F, H/2, W/2), 2x2 stride-2 max."""
    n, f, h, w = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"maxpool2 needs even dims, got {h}x{w}")
    r = x.reshape(n, f, h // 2, 2, w // 2, 2)
    return r.max(axis=(3, 5))


def cnn_forward(x: np.ndarray, weights: dict) -> np.ndarray:
    """(n, C, H, W) pixels → (n, out) logits: Conv-SAME → ReLU →
    MaxPool2 → Flatten (C-order: channel, row, col) → dense head.
    Exact when inputs/weights are dyadic (module docstring)."""
    h = np.maximum(conv2d_same(x, weights["wc"], weights["bc"]), 0.0)
    p = maxpool2(h)
    flat = p.reshape(p.shape[0], -1)
    return flat @ weights["wd"] + weights["bd"]


def classify_pixels(gray_batch: np.ndarray, weights: dict) -> tuple:
    """(n, H, W) uint8 grayscale → (pred int array, margin float
    array). Pixels normalize to v/256 (dyadic); margin = top logit −
    runner-up, exact."""
    x = gray_batch.astype(np.float64)[:, None, :, :] / 256.0
    logits = cnn_forward(x, weights)
    pred = np.argmax(logits, axis=1)
    part = np.partition(logits, -2, axis=1)
    return pred.astype(np.int32), part[:, -1] - part[:, -2]
