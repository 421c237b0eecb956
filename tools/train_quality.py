"""Train the quality-classifier fixture (fineweb-edu/DCLM pattern:
the keep decision is a trained model, not a rule list — here a tiny
logistic regression over six text-shape features, trained offline on
synthetic good/bad documents and shipped as
odin_rs_spark/sources/fixtures/quality_lr.csv).

Deterministic: fixed corpus formulas, zero init, fixed-step full-batch
gradient descent. Weights round to 6 decimals in the fixture; the
engine and the DuckDB oracle both consume the rounded values, so the
logit replays bit-for-bit.

Run: python tools/train_quality.py (rewrites the fixture in place)
"""

from __future__ import annotations

import csv
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from odin_rs_spark.functions.quality import (  # noqa: E402
    FEATURES,
    QUALITY_FIXTURE,
    quality_features_py,
)

GOOD_WORDS = (
    "the quick brown fox jumps over a lazy dog and runs through the field "
    "while morning light settles on the quiet river as people walk to the "
    "market with baskets of fresh bread and the children laugh in the park"
).split()

SPAM_BITS = [
    "BUY NOW!!! 100% FREE $$$ 4437-9921 CLICK",
    "win win win win win win win win",
    "!!!!!! ...... ;;;;;; ??????",
    "0118 999 881 999 119 7253 0118 999",
    "CHEAP CHEAP CHEAP DEAL DEAL DEAL",
    # degenerate stopword repetition: all-closed-class text must not
    # ride the stopword_ratio feature into the keep bucket
    "the the the the the the the the",
    "and and and of of of to to to",
    "is is is is it it it it a a a a",
]


def corpus() -> list[tuple[str, int]]:
    docs: list[tuple[str, int]] = []
    for i in range(60):
        n = 12 + i % 9
        words = [GOOD_WORDS[(i * 7 + j * 3) % len(GOOD_WORDS)] for j in range(n)]
        # natural docs end sentences with a period now and then
        text = " ".join(words) + "."
        docs.append((text, 1))
    for i in range(60):
        bits = [SPAM_BITS[(i + j) % len(SPAM_BITS)] for j in range(2 + i % 3)]
        docs.append((" ".join(bits), 0))
    return docs


def main() -> None:
    data = corpus()
    xs = [[quality_features_py(t)[f] for f in FEATURES] for t, _ in data]
    ys = [y for _, y in data]
    w = [0.0] * len(FEATURES)
    b = 0.0
    lr = 0.5
    for _ in range(4000):
        gw = [0.0] * len(FEATURES)
        gb = 0.0
        for x, y in zip(xs, ys):
            z = b + sum(wi * xi for wi, xi in zip(w, x))
            p = 1.0 / (1.0 + math.exp(-max(-60.0, min(60.0, z))))
            d = p - y
            gb += d
            for k in range(len(w)):
                gw[k] += d * x[k]
        n = len(xs)
        b -= lr * gb / n
        for k in range(len(w)):
            w[k] -= lr * gw[k] / n
    with open(QUALITY_FIXTURE, "w", newline="") as f:
        out = csv.writer(f)
        out.writerow(["feature", "weight"])
        out.writerow(["__bias__", f"{b:.6f}"])
        for name, wi in zip(FEATURES, w):
            out.writerow([name, f"{wi:.6f}"])
    # report training accuracy with the ROUNDED weights (what ships)
    wr = [round(wi, 6) for wi in w]
    br = round(b, 6)
    acc = sum(
        ((br + sum(wi * xi for wi, xi in zip(wr, x))) >= 0) == (y == 1)
        for x, y in zip(xs, ys)
    ) / len(xs)
    print(QUALITY_FIXTURE, "accuracy", acc)


if __name__ == "__main__":
    main()
