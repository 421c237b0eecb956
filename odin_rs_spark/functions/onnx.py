"""Minimal ONNX model-file I/O on the stdlib protobuf wire format
(SURVEY §2.12; parity: odin_onnx/src/lib.rs:47-150 — the reference
loads an .onnx file into an ort::Session and runs forward; here the
FILE side becomes real: initializer tensors parse straight out of the
protobuf bytes into numpy arrays that feed functions.mlp.mlp_forward).

No onnx/onnxruntime/protobuf package exists in this environment, and
none is needed: the protobuf wire format is four primitive shapes
(varint, 64-bit, length-delimited, 32-bit — Google's public encoding
spec), and the ONNX schema coordinates used here come from the public
onnx.proto3:

  ModelProto:  ir_version=1, opset_import=8, graph=7
  GraphProto:  node=1, name=2, initializer=5, input=11, output=12
  NodeProto:   input=1, output=2, name=3, op_type=4, attribute=5
  AttributeProto: name=1, f=2, i=3, type=20
  TensorProto: dims=1, data_type=2, float_data=4, name=8, raw_data=9

Scope: FLOAT (data_type=1) initializers, Gemm/MatMul/Add/Relu node
chains — the MLP-classifier shape the reference deploys. Anything
else raises with the offending op/type named, the same honest-seam
policy as sources/netcdf3.py and sources/grib2.py.

Determinism: the q130 fixture stores the dyadic formula_weights
(k/16) as float32 raw_data — exactly representable, so the file
round-trip is bit-exact and the DuckDB oracle replays the forward
pass from the weight formula with zero tolerance.
"""

from __future__ import annotations

import struct

import numpy as np

# -- protobuf wire primitives ----------------------------------------------


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode one base-128 varint at pos → (value, next_pos)."""
    val = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        val |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint exceeds 64 bits")


def _fields(buf: bytes):
    """Iterate a message's fields → (field_no, wire_type, payload).
    Payload is an int for varint/fixed types, bytes for length-delimited."""
    pos = 0
    while pos < len(buf):
        tag, pos = _uvarint(buf, pos)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, pos = _uvarint(buf, pos)
        elif wt == 2:  # length-delimited
            ln, pos = _uvarint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("length-delimited field runs past buffer")
            val, pos = buf[pos : pos + ln], pos + ln
        elif wt == 5:  # fixed32
            if pos + 4 > len(buf):
                raise ValueError("truncated fixed32")
            val, pos = struct.unpack("<I", buf[pos : pos + 4])[0], pos + 4
        elif wt == 1:  # fixed64
            if pos + 8 > len(buf):
                raise ValueError("truncated fixed64")
            val, pos = struct.unpack("<Q", buf[pos : pos + 8])[0], pos + 8
        else:
            raise ValueError(f"unsupported wire type {wt} (field {fno})")
        yield fno, wt, val


def _enc_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_field(fno: int, wt: int, payload: bytes | int) -> bytes:
    tag = _enc_varint((fno << 3) | wt)
    if wt == 0:
        return tag + _enc_varint(payload)
    return tag + _enc_varint(len(payload)) + payload


# -- ONNX parse -------------------------------------------------------------

_FLOAT = 1  # TensorProto.DataType.FLOAT


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    """TensorProto → (name, float64 ndarray). dims may arrive packed
    (one length-delimited varint run) or unpacked (repeated varint) —
    both are legal encodings of `repeated int64`."""
    dims: list[int] = []
    dtype = _FLOAT
    name = ""
    raw = None
    floats: list[float] = []
    for fno, wt, val in _fields(buf):
        if fno == 1:  # dims
            if wt == 0:
                dims.append(val)
            else:
                p = 0
                while p < len(val):
                    d, p = _uvarint(val, p)
                    dims.append(d)
        elif fno == 2:
            dtype = val
        elif fno == 4:  # float_data (packed fixed32 floats)
            if wt == 5:
                floats.append(struct.unpack("<f", struct.pack("<I", val))[0])
            else:
                floats.extend(
                    struct.unpack(f"<{len(val) // 4}f", val)
                )
        elif fno == 8:
            name = val.decode("utf-8")
        elif fno == 9:
            raw = val
    if dtype != _FLOAT:
        raise ValueError(
            f"initializer '{name}': data_type {dtype} unsupported (FLOAT only)"
        )
    n = int(np.prod(dims)) if dims else 0
    if raw is not None:
        if len(raw) != 4 * n:
            raise ValueError(
                f"initializer '{name}': raw_data {len(raw)} bytes != 4*{n}"
            )
        arr = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    else:
        if len(floats) != n:
            raise ValueError(
                f"initializer '{name}': {len(floats)} floats != {n}"
            )
        arr = np.array(floats, dtype=np.float64)
    return name, arr.reshape(dims)


def _parse_node(buf: bytes) -> dict:
    node = {"inputs": [], "outputs": [], "op": "", "name": "", "attrs": {}}
    for fno, wt, val in _fields(buf):
        if fno == 1:
            node["inputs"].append(val.decode("utf-8"))
        elif fno == 2:
            node["outputs"].append(val.decode("utf-8"))
        elif fno == 3:
            node["name"] = val.decode("utf-8")
        elif fno == 4:
            node["op"] = val.decode("utf-8")
        elif fno == 5:
            aname, f_val, i_val = "", None, None
            ints: list[int] = []
            for afno, awt, aval in _fields(val):
                if afno == 1:
                    aname = aval.decode("utf-8")
                elif afno == 2:
                    f_val = struct.unpack("<f", struct.pack("<I", aval))[0]
                elif afno == 3:
                    i_val = aval
                elif afno == 8:  # repeated int64 ints (packed or not)
                    if awt == 0:
                        ints.append(aval)
                    else:
                        p = 0
                        while p < len(aval):
                            d, p = _uvarint(aval, p)
                            ints.append(d)
            if ints:
                node["attrs"][aname] = ints
            else:
                node["attrs"][aname] = f_val if f_val is not None else i_val
    return node


def parse_onnx(data: bytes) -> dict:
    """ModelProto bytes → {"initializers": {name: ndarray},
    "nodes": [node dicts in graph order], "graph_name": str}."""
    graph = None
    for fno, wt, val in _fields(data):
        if fno == 7:
            graph = val
    if graph is None:
        raise ValueError("ModelProto has no graph (field 7)")
    inits: dict[str, np.ndarray] = {}
    nodes: list[dict] = []
    gname = ""
    for fno, wt, val in _fields(graph):
        if fno == 5:
            name, arr = _parse_tensor(val)
            inits[name] = arr
        elif fno == 1:
            nodes.append(_parse_node(val))
        elif fno == 2:
            gname = val.decode("utf-8")
    return {"initializers": inits, "nodes": nodes, "graph_name": gname}


def onnx_mlp_weights(model: dict) -> dict:
    """Walk a parsed model's node chain and assemble the 2-layer MLP
    weight dict functions.mlp.mlp_forward consumes ({w1,b1,w2,b2}).

    Accepts the two standard spellings of a dense layer — Gemm(X, W, b)
    (honoring transB) and MatMul(X, W) followed by Add(·, b) — with a
    Relu between the two layers; anything else raises with the op
    named. Layer order comes from the dataflow (each op consumes the
    previous output), not node array position."""
    inits = model["initializers"]
    layers: list[tuple[np.ndarray, np.ndarray]] = []
    saw_relu_at: list[int] = []
    pending_matmul: np.ndarray | None = None
    for node in model["nodes"]:
        op = node["op"]
        if op == "Gemm":
            w = inits[node["inputs"][1]]
            b = inits[node["inputs"][2]]
            if node["attrs"].get("transB"):
                w = w.T
            if node["attrs"].get("transA"):
                raise ValueError("Gemm transA unsupported")
            alpha = node["attrs"].get("alpha")
            beta = node["attrs"].get("beta")
            if alpha not in (None, 1.0) or beta not in (None, 1.0):
                raise ValueError("Gemm alpha/beta != 1 unsupported")
            layers.append((w, b))
        elif op == "MatMul":
            pending_matmul = inits[node["inputs"][1]]
        elif op == "Add":
            if pending_matmul is None:
                raise ValueError("Add without a preceding MatMul")
            b_name = next(n for n in node["inputs"] if n in inits)
            layers.append((pending_matmul, inits[b_name]))
            pending_matmul = None
        elif op == "Relu":
            saw_relu_at.append(len(layers))
        else:
            raise ValueError(f"unsupported op '{op}' in MLP graph")
    if len(layers) != 2:
        raise ValueError(f"expected 2 dense layers, found {len(layers)}")
    if saw_relu_at != [1]:
        raise ValueError("expected exactly one Relu between the two layers")
    (w1, b1), (w2, b2) = layers
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2}


def onnx_cnn_weights(model: dict) -> dict:
    """Walk a Conv → Relu → MaxPool → Flatten → Gemm graph (the
    reference's smoke/fire classifier class, odin_onnx/src/lib.rs:
    47-150 — a conv net, not an MLP) into the weight dict
    functions.cnn.cnn_forward consumes ({wc, bc, wd, bd}).

    Scope (errors name anything else): one Conv layer with SAME
    padding (pads [1,1,1,1] for 3x3), strides [1,1]; one 2x2/2 MaxPool;
    Flatten; one Gemm head (honoring transB). Multi-conv stacks are the
    same walk extended — rejected by count until a model needs them."""
    inits = model["initializers"]
    conv = pool = gemm = None
    order: list[str] = []
    for node in model["nodes"]:
        op = node["op"]
        order.append(op)
        if op == "Conv":
            if conv is not None:
                raise ValueError("multiple Conv layers unsupported")
            ks = node["attrs"].get("kernel_shape")
            pads = node["attrs"].get("pads", [0, 0, 0, 0])
            strides = node["attrs"].get("strides", [1, 1])
            if strides != [1, 1]:
                raise ValueError(f"Conv strides {strides} unsupported")
            if ks is not None and list(ks) != [3, 3]:
                raise ValueError(f"Conv kernel_shape {ks} != [3, 3]")
            if list(pads) != [1, 1, 1, 1]:
                raise ValueError(f"Conv pads {pads} != SAME [1,1,1,1]")
            conv = (inits[node["inputs"][1]], inits[node["inputs"][2]])
        elif op == "MaxPool":
            ks = node["attrs"].get("kernel_shape")
            strides = node["attrs"].get("strides")
            if list(ks or [2, 2]) != [2, 2] or list(strides or [2, 2]) != [2, 2]:
                raise ValueError("MaxPool must be 2x2 stride 2")
            pool = True
        elif op == "Gemm":
            w = inits[node["inputs"][1]]
            b = inits[node["inputs"][2]]
            if node["attrs"].get("transB"):
                w = w.T
            if node["attrs"].get("transA"):
                raise ValueError("Gemm transA unsupported")
            gemm = (w, b)
        elif op in ("Relu", "Flatten"):
            pass
        else:
            raise ValueError(f"unsupported op '{op}' in CNN graph")
    if conv is None or pool is None or gemm is None:
        raise ValueError(f"incomplete CNN graph: ops {order}")
    if order != ["Conv", "Relu", "MaxPool", "Flatten", "Gemm"]:
        raise ValueError(f"unexpected CNN op order {order}")
    wc, bc = conv
    wd, bd = gemm
    if wc.ndim != 4:
        raise ValueError(f"Conv weight rank {wc.ndim} != 4 (OIHW)")
    return {"wc": wc, "bc": bc, "wd": wd, "bd": bd}


def load_onnx_cnn(path: str) -> dict:
    """Read a conv-classifier .onnx file → cnn_forward-ready weights."""
    with open(path, "rb") as f:
        return onnx_cnn_weights(parse_onnx(f.read()))


def load_onnx_mlp(path: str) -> dict:
    """Read an .onnx file and return mlp_forward-ready weights — the
    load half of the reference's Session::new → run pipeline."""
    with open(path, "rb") as f:
        return onnx_mlp_weights(parse_onnx(f.read()))


# -- ONNX write (fixture generator / export sink) ---------------------------


def _enc_tensor(name: str, arr: np.ndarray) -> bytes:
    dims = b"".join(_enc_varint(d) for d in arr.shape)
    body = _enc_field(1, 2, dims)  # packed dims
    body += _enc_field(2, 0, _FLOAT)
    body += _enc_field(8, 2, name.encode("utf-8"))
    body += _enc_field(9, 2, arr.astype("<f4").tobytes())
    return body


def _enc_node(
    op: str,
    inputs: list[str],
    outputs: list[str],
    name: str,
    attrs: dict[str, list[int] | int] | None = None,
) -> bytes:
    body = b"".join(_enc_field(1, 2, s.encode("utf-8")) for s in inputs)
    body += b"".join(_enc_field(2, 2, s.encode("utf-8")) for s in outputs)
    body += _enc_field(3, 2, name.encode("utf-8"))
    body += _enc_field(4, 2, op.encode("utf-8"))
    for aname, aval in (attrs or {}).items():
        a = _enc_field(1, 2, aname.encode("utf-8"))
        if isinstance(aval, list):
            a += _enc_field(8, 2, b"".join(_enc_varint(v) for v in aval))
            a += _enc_field(20, 0, 7)  # AttributeType.INTS
        else:
            a += _enc_field(3, 0, int(aval))
            a += _enc_field(20, 0, 2)  # AttributeType.INT
        body += _enc_field(5, 2, a)
    return body


def write_onnx_mlp(path: str, weights: dict, graph_name: str = "mlp") -> None:
    """Serialize a 2-layer MLP as a minimal valid ModelProto:
    Gemm → Relu → Gemm with float32 raw_data initializers. This is the
    encode twin of `load_onnx_mlp` (fixture generation + an export
    sink for trained heads); a stock onnx parser reads the output —
    the wire bytes follow the public onnx.proto3 field numbers."""
    nodes = [
        _enc_node("Gemm", ["x", "w1", "b1"], ["h_pre"], "dense1"),
        _enc_node("Relu", ["h_pre"], ["h"], "act1"),
        _enc_node("Gemm", ["h", "w2", "b2"], ["logits"], "dense2"),
    ]
    _write_model(path, nodes, {k: np.asarray(v) for k, v in weights.items()},
                 graph_name)


def write_onnx_cnn(path: str, weights: dict, graph_name: str = "cnn") -> None:
    """Encode twin of `load_onnx_cnn`: Conv(SAME 3x3) → Relu →
    MaxPool(2x2/2) → Flatten → Gemm as a minimal valid ModelProto with
    INTS attributes (kernel_shape/pads/strides) on the wire."""
    nodes = [
        _enc_node("Conv", ["x", "wc", "bc"], ["c_pre"], "conv1",
                  {"kernel_shape": [3, 3], "pads": [1, 1, 1, 1],
                   "strides": [1, 1]}),
        _enc_node("Relu", ["c_pre"], ["c"], "act1"),
        _enc_node("MaxPool", ["c"], ["p"], "pool1",
                  {"kernel_shape": [2, 2], "strides": [2, 2]}),
        _enc_node("Flatten", ["p"], ["f"], "flat", {"axis": 1}),
        _enc_node("Gemm", ["f", "wd", "bd"], ["logits"], "dense"),
    ]
    _write_model(path, nodes, {k: np.asarray(v) for k, v in weights.items()},
                 graph_name)


def _write_model(path: str, nodes: list[bytes], tensors_in: dict,
                 graph_name: str) -> None:
    tensors = [_enc_tensor(k, v) for k, v in tensors_in.items()]
    graph = b"".join(_enc_field(1, 2, n) for n in nodes)
    graph += _enc_field(2, 2, graph_name.encode("utf-8"))
    graph += b"".join(_enc_field(5, 2, t) for t in tensors)
    # opset_import: OperatorSetIdProto{domain=1 (default ""), version=2}
    opset = _enc_field(2, 0, 13)
    model = (
        _enc_field(1, 0, 8)  # ir_version 8
        + _enc_field(8, 2, opset)
        + _enc_field(7, 2, graph)
    )
    with open(path, "wb") as f:
        f.write(model)
