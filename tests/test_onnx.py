"""ONNX protobuf wire-format I/O (functions/onnx.py): hand-derived
byte-level pins plus write→load roundtrips. Parity target:
odin_onnx/src/lib.rs:47-150 (load model file → forward); wire-format
coordinates from the public onnx.proto3 / protobuf encoding spec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from odin_rs_spark.functions.mlp import formula_weights, mlp_forward
from odin_rs_spark.functions.onnx import (
    _enc_field,
    _enc_node,
    _enc_tensor,
    _enc_varint,
    load_onnx_mlp,
    onnx_mlp_weights,
    parse_onnx,
    write_onnx_mlp,
)


def test_hand_packed_tensorproto_bytes():
    """Pin the wire format octet-by-octet, grib2-fixture style: a 2x2
    FLOAT tensor named 'w' built by hand from the protobuf spec, no
    encoder involved."""
    # field 1 (dims), wire 2 packed: tag = (1<<3)|2 = 0x0A, len 2, [2, 2]
    t = bytes([0x0A, 0x02, 0x02, 0x02])
    # field 2 (data_type), wire 0: tag = (2<<3)|0 = 0x10, FLOAT = 1
    t += bytes([0x10, 0x01])
    # field 8 (name), wire 2: tag = (8<<3)|2 = 0x42, len 1, 'w'
    t += bytes([0x42, 0x01]) + b"w"
    # field 9 (raw_data), wire 2: tag = (9<<3)|2 = 0x4A, len 16,
    # four little-endian float32: 1.0, -2.0, 0.5, 4.0
    t += bytes([0x4A, 0x10]) + struct.pack("<4f", 1.0, -2.0, 0.5, 4.0)
    # GraphProto with this single initializer (field 5, wire 2), inside
    # ModelProto.graph (field 7, wire 2): tags 0x2A and 0x3A
    graph = bytes([0x2A, len(t)]) + t
    model = bytes([0x3A, len(graph)]) + graph
    got = parse_onnx(model)["initializers"]["w"]
    assert got.shape == (2, 2)
    assert np.array_equal(got, np.array([[1.0, -2.0], [0.5, 4.0]]))


def test_roundtrip_exact_dyadic():
    import tempfile

    w = formula_weights()
    with tempfile.NamedTemporaryFile(suffix=".onnx") as f:
        write_onnx_mlp(f.name, w)
        got = load_onnx_mlp(f.name)
    for k in ("w1", "b1", "w2", "b2"):
        assert np.array_equal(got[k], w[k]), k
    x = np.random.RandomState(7).rand(4, 64)
    assert np.array_equal(mlp_forward(x, got), mlp_forward(x, w))


def test_checked_in_fixture_matches_formula():
    """The committed fixture IS formula_weights(): both engines can
    regenerate the oracle from the formula while Spark reads the file."""
    import os

    import odin_rs_spark

    path = os.path.join(
        os.path.dirname(os.path.abspath(odin_rs_spark.__file__)),
        "functions",
        "fixtures",
        "mlp_64_8_3.onnx",
    )
    got = load_onnx_mlp(path)
    w = formula_weights()
    for k in ("w1", "b1", "w2", "b2"):
        assert np.array_equal(got[k], w[k]), k


def _model_bytes(nodes: list[bytes], tensors: list[bytes]) -> bytes:
    graph = b"".join(_enc_field(1, 2, n) for n in nodes)
    graph += b"".join(_enc_field(5, 2, t) for t in tensors)
    return _enc_field(7, 2, graph)


def test_gemm_transB_honored():
    """PyTorch exports Gemm with transB=1 and W stored (out, in) — the
    loader must transpose it back."""
    w1 = np.arange(12, dtype=np.float64).reshape(4, 3)  # logical (in=4, h=3)
    b1 = np.zeros(3)
    w2 = np.eye(3)
    b2 = np.zeros(3)
    # AttributeProto: name=1 ('transB'), i=3 (1), encoded by hand
    attr = _enc_field(1, 2, b"transB") + _enc_field(3, 0, 1)
    gemm1 = (
        _enc_node("Gemm", ["x", "w1", "b1"], ["h_pre"], "d1")
        + _enc_field(5, 2, attr)
    )
    nodes = [
        gemm1,
        _enc_node("Relu", ["h_pre"], ["h"], "a1"),
        _enc_node("Gemm", ["h", "w2", "b2"], ["y"], "d2"),
    ]
    tensors = [
        _enc_tensor("w1", w1.T),  # stored transposed, as an exporter would
        _enc_tensor("b1", b1),
        _enc_tensor("w2", w2),
        _enc_tensor("b2", b2),
    ]
    got = onnx_mlp_weights(parse_onnx(_model_bytes(nodes, tensors)))
    assert np.array_equal(got["w1"], w1)


def test_matmul_add_spelling():
    w1 = np.ones((2, 2))
    nodes = [
        _enc_node("MatMul", ["x", "w1"], ["m"], "m1"),
        _enc_node("Add", ["m", "b1"], ["h_pre"], "a0"),
        _enc_node("Relu", ["h_pre"], ["h"], "r"),
        _enc_node("Gemm", ["h", "w2", "b2"], ["y"], "d2"),
    ]
    tensors = [
        _enc_tensor("w1", w1),
        _enc_tensor("b1", np.array([1.0, 2.0])),
        _enc_tensor("w2", np.eye(2)),
        _enc_tensor("b2", np.zeros(2)),
    ]
    got = onnx_mlp_weights(parse_onnx(_model_bytes(nodes, tensors)))
    assert np.array_equal(got["b1"], np.array([1.0, 2.0]))


def test_unsupported_op_and_dtype_raise():
    nodes = [_enc_node("Conv", ["x", "k"], ["y"], "c")]
    with pytest.raises(ValueError, match="Conv"):
        onnx_mlp_weights(parse_onnx(_model_bytes(nodes, [])))
    # data_type 11 (DOUBLE) rejected by name
    t = _enc_field(1, 2, _enc_varint(1)) + _enc_field(2, 0, 11)
    t += _enc_field(8, 2, b"d") + _enc_field(9, 2, struct.pack("<d", 1.0))
    with pytest.raises(ValueError, match="data_type 11"):
        parse_onnx(_model_bytes([], [t]))


def test_float_data_variant_parses():
    """Initializers may carry packed float_data (field 4) instead of
    raw_data — both are legal TensorProto encodings."""
    t = _enc_field(1, 2, _enc_varint(2))  # dims [2]
    t += _enc_field(2, 0, 1)
    t += _enc_field(4, 2, struct.pack("<2f", 3.0, -1.5))
    t += _enc_field(8, 2, b"v")
    got = parse_onnx(_model_bytes([], [t]))["initializers"]["v"]
    assert np.array_equal(got, np.array([3.0, -1.5]))


def test_truncated_and_corrupt_raise():
    with pytest.raises(ValueError):
        parse_onnx(b"\x3a\x7f")  # declared graph longer than buffer
    with pytest.raises(ValueError, match="no graph"):
        parse_onnx(_enc_field(1, 0, 8))
    # raw_data length disagreeing with dims
    t = _enc_field(1, 2, _enc_varint(3)) + _enc_field(2, 0, 1)
    t += _enc_field(8, 2, b"w") + _enc_field(9, 2, b"\x00" * 8)
    with pytest.raises(ValueError, match="raw_data"):
        parse_onnx(_model_bytes([], [t]))


# ---------------------------------------------------------------------------
# conv-net class (VERDICT r9 #4)
# ---------------------------------------------------------------------------


def test_cnn_roundtrip_and_fixture():
    import numpy as np

    from odin_rs_spark.functions.cnn import formula_cnn_weights
    from odin_rs_spark.functions.onnx import load_onnx_cnn, write_onnx_cnn

    w = formula_cnn_weights()
    import tempfile

    p = tempfile.mktemp(suffix=".onnx")
    write_onnx_cnn(p, w)
    w2 = load_onnx_cnn(p)
    for k in w:
        assert np.array_equal(w[k], w2[k]), k

    import os

    import odin_rs_spark

    fixture = os.path.join(
        os.path.dirname(os.path.abspath(odin_rs_spark.__file__)),
        "functions", "fixtures", "cnn_1x16x16_4f_3.onnx",
    )
    wf = load_onnx_cnn(fixture)
    for k in w:
        assert np.array_equal(w[k], wf[k]), k


def test_cnn_forward_matches_naive_loop():
    import numpy as np

    from odin_rs_spark.functions.cnn import (
        cnn_forward,
        formula_cnn_weights,
        maxpool2,
    )

    w = formula_cnn_weights()
    yy, xx = np.mgrid[0:16, 0:16]
    g = np.stack([((m * 17 + xx * 3 + yy * 5) % 200) for m in range(4)])
    x = g.astype(np.float64)[:, None] / 256.0
    n, c, H, W = x.shape
    Fh = w["wc"].shape[0]
    ref = np.zeros((n, Fh, H, W))
    xp = np.zeros((n, c, H + 2, W + 2))
    xp[:, :, 1:-1, 1:-1] = x
    for f in range(Fh):
        for dy in range(3):
            for dx in range(3):
                ref[:, f] += w["wc"][f, 0, dy, dx] * xp[:, 0, dy:dy + H, dx:dx + W]
        ref[:, f] += w["bc"][f]
    pool = np.maximum(ref, 0).reshape(n, Fh, 8, 2, 8, 2).max(axis=(3, 5))
    logits = pool.reshape(n, -1) @ w["wd"] + w["bd"]
    assert np.array_equal(cnn_forward(x, w), logits)
    with pytest.raises(ValueError, match="even dims"):
        maxpool2(np.zeros((1, 1, 3, 4)))


def test_cnn_graph_rejections():
    import numpy as np

    from odin_rs_spark.functions.cnn import formula_cnn_weights
    from odin_rs_spark.functions.onnx import (
        onnx_cnn_weights,
        parse_onnx,
        write_onnx_cnn,
    )
    import tempfile

    w = formula_cnn_weights()
    p = tempfile.mktemp(suffix=".onnx")
    write_onnx_cnn(p, w)
    model = parse_onnx(open(p, "rb").read())
    # wrong pads reject by value
    for node in model["nodes"]:
        if node["op"] == "Conv":
            node["attrs"]["pads"] = [0, 0, 0, 0]
    with pytest.raises(ValueError, match="pads"):
        onnx_cnn_weights(model)
    # an MLP graph is not a CNN graph
    from odin_rs_spark.functions.onnx import load_onnx_mlp

    import os

    import odin_rs_spark

    mlp_fixture = os.path.join(
        os.path.dirname(os.path.abspath(odin_rs_spark.__file__)),
        "functions", "fixtures", "mlp_64_8_3.onnx",
    )
    with pytest.raises(ValueError, match="incomplete CNN graph"):
        onnx_cnn_weights(parse_onnx(open(mlp_fixture, "rb").read()))
    # and the CNN fixture still fails the MLP walk loudly
    with pytest.raises(ValueError):
        load_onnx_mlp(p)


def test_ints_attribute_wire_roundtrip():
    """INTS attributes (kernel_shape/pads/strides) survive the wire."""
    from odin_rs_spark.functions.onnx import _enc_node, _parse_node

    enc = _enc_node("MaxPool", ["a"], ["b"], "p",
                    {"kernel_shape": [2, 2], "strides": [2, 2], "axis": 1})
    node = _parse_node(enc)
    assert node["attrs"]["kernel_shape"] == [2, 2]
    assert node["attrs"]["strides"] == [2, 2]
    assert node["attrs"]["axis"] == 1


def test_cnn_classify_media_skips_wrong_sized_images(spark):
    """A wrong-sized or undecodable image must be skippable per-row,
    not kill the whole Arrow batch inside np.stack."""
    import numpy as np

    from odin_rs_spark.functions.cnn import formula_cnn_weights
    from odin_rs_spark.operators.multimodal import cnn_classify_media
    from odin_rs_spark.sources.imagecodec import encode_png

    w = formula_cnn_weights()
    good = encode_png((np.arange(256).reshape(16, 16) % 200).astype(np.uint8))
    wrong = encode_png((np.arange(64).reshape(8, 8) % 200).astype(np.uint8))
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(wrong)),
         (3, bytearray(b"not an image"))],
        "media_id long, content binary",
    )
    rows = cnn_classify_media(media, w, on_error="skip").collect()
    assert [r.media_id for r in rows] == [1]
    with pytest.raises(Exception):
        cnn_classify_media(media, w, on_error="raise").collect()
