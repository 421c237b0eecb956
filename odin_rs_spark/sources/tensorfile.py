"""Tensor shard readers: numpy `.npy` / `.npz` (public NEP-1 / numpy
format 1.0/2.0 spec) and `.safetensors` (the published safetensors
byte layout: u64-LE header length + JSON tensor table + flat data
region). These are the containers embedding shards and model weights
actually ship in; a corpus engine that audits embedding lakes needs to
scan them WITHOUT a framework dependency. Parsers are hand-rolled from
the specs; numpy's own loader is the independent test referee for
.npy/.npz (it wrote nothing here — both directions are cross-checked).

Scope (documented): dtypes <f2/<f4/<f8/<i4/<i8 (npy) and
F16/F32/F64/I32/I64 (safetensors), C-order, 1-D/2-D shapes. Fortran
order, object arrays, pickled payloads and other dtypes are named
rejections — a .npy with `allow_pickle` content is a code-execution
hazard and must NEVER be np.load'ed blind at scale. Error contract:
ValueError-only.
"""

from __future__ import annotations

import ast
import io
import json
import struct
import zipfile

import numpy as np

_NPY_MAGIC = b"\x93NUMPY"
_NPY_DTYPES = {
    "<f2": np.float16,
    "<f4": np.float32,
    "<f8": np.float64,
    "<i4": np.int32,
    "<i8": np.int64,
}
_ST_DTYPES = {
    "F16": np.float16,
    "F32": np.float32,
    "F64": np.float64,
    "I32": np.int32,
    "I64": np.int64,
}
_ST_SIZES = {"F16": 2, "F32": 4, "F64": 8, "I32": 4, "I64": 8}


# ---------------------------------------------------------------------------
# .npy
# ---------------------------------------------------------------------------

def parse_npy(buf: bytes) -> np.ndarray:
    """NEP-1 .npy bytes → ndarray (supported dtype subset, C order)."""
    if buf[:6] != _NPY_MAGIC:
        raise ValueError("npy magic missing")
    if len(buf) < 10:
        raise ValueError("npy header truncated")
    major = buf[6]
    if major == 1:
        hlen = struct.unpack("<H", buf[8:10])[0]
        hstart = 10
    elif major in (2, 3):
        if len(buf) < 12:
            raise ValueError("npy v2 header truncated")
        hlen = struct.unpack("<I", buf[8:12])[0]
        hstart = 12
    else:
        raise ValueError(f"unsupported npy version {major}")
    if hstart + hlen > len(buf):
        raise ValueError("npy header length out of bounds")
    try:
        header = ast.literal_eval(
            buf[hstart : hstart + hlen].decode("latin-1").strip()
        )
    except (ValueError, SyntaxError) as exc:
        raise ValueError(f"bad npy header dict: {exc}") from exc
    if not isinstance(header, dict):
        raise ValueError("npy header is not a dict")
    descr = header.get("descr")
    if descr not in _NPY_DTYPES:
        raise ValueError(f"unsupported npy dtype {descr!r}")
    if header.get("fortran_order"):
        raise ValueError("fortran-order npy not supported")
    shape = header.get("shape")
    if (
        not isinstance(shape, tuple)
        or not 1 <= len(shape) <= 2
        or not all(isinstance(s, int) and s >= 0 for s in shape)
    ):
        raise ValueError(f"unsupported npy shape {shape!r}")
    dt = np.dtype(_NPY_DTYPES[descr])
    n = int(np.prod(shape, dtype=np.int64))
    need = hstart + hlen + n * dt.itemsize
    if need > len(buf):
        raise ValueError("npy data truncated")
    arr = np.frombuffer(buf[hstart + hlen : need], dtype=dt).reshape(shape)
    return arr


def encode_npy(arr: np.ndarray) -> bytes:
    """Fixture twin (v1 header, same subset)."""
    descr = {v: k for k, v in _NPY_DTYPES.items()}.get(arr.dtype.type)
    if descr is None or arr.ndim not in (1, 2):
        raise ValueError("encoder supports the documented subset only")
    header = (
        "{'descr': '%s', 'fortran_order': False, 'shape': %s, }"
        % (descr, repr(arr.shape if arr.ndim > 1 else (arr.shape[0],)))
    )
    pad = 64 - (10 + len(header) + 1) % 64
    header = header + " " * pad + "\n"
    return (
        _NPY_MAGIC
        + b"\x01\x00"
        + struct.pack("<H", len(header))
        + header.encode("latin-1")
        + np.ascontiguousarray(arr).tobytes()
    )


def parse_npz(buf: bytes) -> dict[str, np.ndarray]:
    """.npz (zip of .npy members; store/deflate) → {name: ndarray}."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(buf))
        infos = zf.infolist()
    except zipfile.BadZipFile as exc:
        raise ValueError(f"bad npz container: {exc}") from exc
    out = {}
    for info in infos:
        if info.is_dir():
            continue
        name = info.filename
        if not name.endswith(".npy"):
            raise ValueError(f"npz member {name!r} is not a .npy")
        try:
            data = zf.read(info)
        except Exception as exc:
            raise ValueError(f"corrupt npz member {name!r}: {exc}") from exc
        out[name[:-4]] = parse_npy(data)
    return out


def encode_npz(arrays: dict[str, np.ndarray]) -> bytes:
    sink = io.BytesIO()
    with zipfile.ZipFile(sink, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, arr in arrays.items():
            zf.writestr(name + ".npy", encode_npy(arr))
    return sink.getvalue()


# ---------------------------------------------------------------------------
# .safetensors
# ---------------------------------------------------------------------------

def parse_safetensors(buf: bytes) -> tuple[dict[str, np.ndarray], dict]:
    """safetensors bytes → ({tensor: ndarray}, metadata dict)."""
    if len(buf) < 8:
        raise ValueError("safetensors shorter than header length field")
    hlen = struct.unpack("<Q", buf[:8])[0]
    if 8 + hlen > len(buf):
        raise ValueError("safetensors header length out of bounds")
    try:
        header = json.loads(buf[8 : 8 + hlen].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as exc:
        raise ValueError(f"bad safetensors header JSON: {exc}") from exc
    if not isinstance(header, dict):
        raise ValueError("safetensors header is not an object")
    data = buf[8 + hlen :]
    meta = header.pop("__metadata__", {}) or {}
    out = {}
    for name, spec in header.items():
        if not isinstance(spec, dict):
            raise ValueError(f"safetensors entry {name!r} is not an object")
        dtype = spec.get("dtype")
        if dtype not in _ST_DTYPES:
            raise ValueError(f"unsupported safetensors dtype {dtype!r}")
        shape = spec.get("shape")
        if (
            not isinstance(shape, list)
            or not 1 <= len(shape) <= 2
            or not all(isinstance(s, int) and s >= 0 for s in shape)
        ):
            raise ValueError(f"unsupported safetensors shape {shape!r}")
        offs = spec.get("data_offsets")
        if (
            not isinstance(offs, list)
            or len(offs) != 2
            or not all(isinstance(o, int) and o >= 0 for o in offs)
            or offs[1] < offs[0]
            or offs[1] > len(data)
        ):
            raise ValueError(f"bad safetensors data_offsets for {name!r}")
        n = 1
        for s in shape:
            n *= s
        if offs[1] - offs[0] != n * _ST_SIZES[dtype]:
            raise ValueError(
                f"safetensors {name!r} byte span does not match shape"
            )
        out[name] = np.frombuffer(
            data[offs[0] : offs[1]], dtype=_ST_DTYPES[dtype]
        ).reshape(shape)
    return out, meta


def encode_safetensors(
    arrays: dict[str, np.ndarray], metadata: dict | None = None
) -> bytes:
    names = {v: k for k, v in _ST_DTYPES.items()}
    header: dict[str, object] = {}
    body = bytearray()
    for name, arr in arrays.items():
        st = names.get(arr.dtype.type)
        if st is None or arr.ndim not in (1, 2):
            raise ValueError("encoder supports the documented subset only")
        raw = np.ascontiguousarray(arr).tobytes()
        header[name] = {
            "dtype": st,
            "shape": list(arr.shape),
            "data_offsets": [len(body), len(body) + len(raw)],
        }
        body += raw
    if metadata:
        header["__metadata__"] = metadata
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    return struct.pack("<Q", len(hjson)) + hjson + bytes(body)


# ---------------------------------------------------------------------------
# Spark walker — per-tensor stats across all three container kinds
# ---------------------------------------------------------------------------

TENSOR_SCHEMA = (
    "file string, container string, tensor string, dtype string, "
    "n_rows bigint, n_cols bigint, n bigint, sum_v double, "
    "min_v double, max_v double"
)


def tensor_stats(files_df, on_error: str = "raise"):
    """`binaryFile` rows over .npy/.npz/.safetensors shards → one row
    per tensor with exact float64-accumulated stats. Shard bytes never
    shuffle; stats reduce inside the scan task, so a PB-scale weight/
    embedding lake audit exchanges only (files × tensors) tiny rows."""
    import os as _os

    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def _tensors(path: str, buf: bytes):
        if buf[:6] == _NPY_MAGIC:
            return "npy", {"arr": parse_npy(buf)}
        if buf[:2] == b"PK":
            return "npz", parse_npz(buf)
        if path.endswith(".safetensors"):
            return "safetensors", parse_safetensors(buf)[0]
        raise ValueError(f"unrecognized tensor container {path!r}")

    def fn(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "file": [], "container": [], "tensor": [], "dtype": [],
                "n_rows": [], "n_cols": [], "n": [], "sum_v": [],
                "min_v": [], "max_v": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    kind, tensors = _tensors(path, bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                base = _os.path.basename(path)
                for tname, arr in tensors.items():
                    rows["file"].append(base)
                    rows["container"].append(kind)
                    rows["tensor"].append(tname)
                    rows["dtype"].append(str(arr.dtype))
                    rows["n_rows"].append(int(arr.shape[0]))
                    rows["n_cols"].append(
                        int(arr.shape[1]) if arr.ndim == 2 else 1
                    )
                    rows["n"].append(int(arr.size))
                    a64 = arr.astype(np.float64)
                    rows["sum_v"].append(float(a64.sum()) if arr.size else None)
                    rows["min_v"].append(float(a64.min()) if arr.size else None)
                    rows["max_v"].append(float(a64.max()) if arr.size else None)
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, TENSOR_SCHEMA)
