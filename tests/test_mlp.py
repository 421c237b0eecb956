"""MLP classify kernel (functions/mlp.py): exactness contract, argmax
tie-break, margin semantics, and the Spark classify surface."""

from __future__ import annotations

import numpy as np

from odin_rs_spark.functions.mlp import (
    classify_embeddings,
    formula_weights,
    mlp_forward,
)


def test_forward_is_exact_dyadic():
    """With 1/16-quantized inputs and dyadic weights every intermediate
    is an exact multiple of 1/4096 — so logits computed with ANY
    summation order are bit-identical (the property that lets the q125
    SQL oracle replay with exact equality)."""
    w = formula_weights()
    rng = np.random.default_rng(2)
    x = np.floor(rng.uniform(-0.6, 0.6, (50, 64)) * 16 + 0.5) / 16
    logits = mlp_forward(x, w)
    # reversed-order accumulation must agree to the bit
    h = np.maximum(x[:, ::-1] @ w["w1"][::-1] + w["b1"], 0.0)
    logits_rev = h[:, ::-1] @ w["w2"][::-1] + w["b2"]
    assert np.array_equal(logits, logits_rev)
    # every logit is a multiple of 1/4096
    assert np.array_equal(logits * 4096, np.round(logits * 4096))


def test_reference_loop_forward():
    w = formula_weights(in_dim=4, hidden=3, out=2)
    x = np.array([[0.25, -0.5, 0.0625, 1.0]])
    want_h = [
        max(0.0, w["b1"][k] + sum(x[0][i] * w["w1"][i][k] for i in range(4)))
        for k in range(3)
    ]
    want = [
        w["b2"][c] + sum(want_h[k] * w["w2"][k][c] for k in range(3))
        for c in range(2)
    ]
    assert np.allclose(mlp_forward(x, w)[0], want, rtol=0, atol=0)


def test_spark_classify_matches_numpy(spark, sf_dir):
    from odin_rs_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    rows = classify_embeddings(emb).select("vec_id", "embedding", "pred", "margin").collect()
    w = formula_weights()
    for r in rows[:40]:
        x = np.floor(np.array(r["embedding"], dtype=np.float64) * 16 + 0.5) / 16
        logits = mlp_forward(x[None, :], w)[0]
        assert r["pred"] == int(np.argmax(logits))
        srt = np.sort(logits)
        assert r["margin"] == srt[-1] - srt[-2]  # exact, no tolerance


def test_argmax_tie_breaks_low_index(spark):
    """Two identical output columns → exactly tied logits; pred must be
    the LOWER index (the rule the oracle's >= CASE chain encodes)."""
    from pyspark.sql import functions as F

    w = formula_weights(in_dim=4, hidden=3, out=3)
    w["w2"][:, 2] = w["w2"][:, 0]  # class 2 duplicates class 0
    w["b2"][2] = w["b2"][0]
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125, 0.0625])], "id long, v array<double>"
    )
    row = classify_embeddings(df, vec_col="v", weights=w).collect()[0]
    x = np.floor(np.array([0.5, -0.25, 0.125, 0.0625]) * 16 + 0.5) / 16
    logits = mlp_forward(x[None, :], w)[0]
    assert logits[0] == logits[2]
    if logits[0] >= logits[1]:  # tie at the top → index 0 must win
        assert row["pred"] == 0
        assert row["margin"] == 0.0  # runner-up is the duplicate
    else:
        assert row["pred"] == 1


def test_null_embedding_classifies_to_null(spark):
    """ADVICE r4: a None embedding row must yield NULL (pred, margin),
    not an opaque ragged-array shape error in the matmul."""
    from odin_rs_spark.functions.mlp import classify_embeddings, formula_weights

    w = formula_weights(in_dim=4, hidden=3, out=2)
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 1.0, 0.0]), (2, None)],
        "vec_id int, embedding array<double>",
    )
    rows = {r.vec_id: r for r in classify_embeddings(df, weights=w).collect()}
    assert rows[1].pred is not None and rows[1].margin is not None
    assert rows[2].pred is None and rows[2].margin is None
