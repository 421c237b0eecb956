"""Tensor shard readers (sources/tensorfile): numpy's own loader is
the independent referee in BOTH directions, the pickled-payload
code-execution hazard is a named rejection, and the fuzz discipline
applies to all three containers."""

from __future__ import annotations

import io
import json
import struct

import numpy as np
import pytest

from odin_rs_spark.sources.tensorfile import (
    encode_npy,
    encode_npz,
    encode_safetensors,
    parse_npy,
    parse_npz,
    parse_safetensors,
    tensor_stats,
)


def _arr(dtype=np.float32, shape=(6, 4)):
    n = int(np.prod(shape))
    return (np.arange(n, dtype=np.float64).reshape(shape) / 8).astype(dtype)


class TestNumpyReferee:
    @pytest.mark.parametrize(
        "dtype", [np.float16, np.float32, np.float64, np.int32, np.int64]
    )
    def test_my_parser_reads_numpy_save(self, dtype):
        ref = _arr(dtype)
        sink = io.BytesIO()
        np.save(sink, ref)
        mine = parse_npy(sink.getvalue())
        assert mine.dtype == ref.dtype and (mine == ref).all()

    def test_numpy_reads_my_twin(self):
        ref = _arr(np.float64, (5,))
        got = np.load(io.BytesIO(encode_npy(ref)))
        assert (got == ref).all() and got.dtype == ref.dtype

    def test_npz_both_directions(self):
        arrays = {"a": _arr(), "b": _arr(np.int64, (3,))}
        # numpy reads mine
        rz = np.load(io.BytesIO(encode_npz(arrays)))
        assert set(rz.files) == {"a", "b"}
        assert (rz["a"] == arrays["a"]).all()
        # mine reads numpy's (compressed)
        sink = io.BytesIO()
        np.savez_compressed(sink, **arrays)
        mz = parse_npz(sink.getvalue())
        assert (mz["b"] == arrays["b"]).all()


class TestNamedRejections:
    def test_pickled_object_array_rejected(self):
        sink = io.BytesIO()
        np.save(sink, np.array([{"x": 1}], dtype=object), allow_pickle=True)
        with pytest.raises(ValueError, match="unsupported npy dtype"):
            parse_npy(sink.getvalue())

    def test_fortran_order_rejected(self):
        sink = io.BytesIO()
        np.save(sink, np.asfortranarray(_arr(np.float32, (4, 3))))
        with pytest.raises(ValueError, match="fortran"):
            parse_npy(sink.getvalue())

    def test_3d_shape_rejected(self):
        sink = io.BytesIO()
        np.save(sink, np.zeros((2, 2, 2), dtype=np.float32))
        with pytest.raises(ValueError, match="shape"):
            parse_npy(sink.getvalue())

    def test_safetensors_bf16_rejected(self):
        hdr = json.dumps(
            {"t": {"dtype": "BF16", "shape": [2], "data_offsets": [0, 4]}}
        ).encode()
        buf = struct.pack("<Q", len(hdr)) + hdr + bytes(4)
        with pytest.raises(ValueError, match="dtype"):
            parse_safetensors(buf)


class TestSafetensors:
    def test_roundtrip_with_metadata(self):
        arrays = {"w": _arr(np.float16, (4, 4)), "c": _arr(np.int32, (3,))}
        buf = encode_safetensors(arrays, metadata={"format": "pt"})
        out, meta = parse_safetensors(buf)
        assert meta == {"format": "pt"}
        for k in arrays:
            assert (out[k] == arrays[k]).all()

    def test_offset_span_mismatch_raises(self):
        hdr = json.dumps(
            {"t": {"dtype": "F32", "shape": [3], "data_offsets": [0, 8]}}
        ).encode()
        buf = struct.pack("<Q", len(hdr)) + hdr + bytes(8)
        with pytest.raises(ValueError, match="byte span"):
            parse_safetensors(buf)

    def test_offsets_beyond_data_raise(self):
        hdr = json.dumps(
            {"t": {"dtype": "F32", "shape": [4], "data_offsets": [0, 16]}}
        ).encode()
        buf = struct.pack("<Q", len(hdr)) + hdr + bytes(8)
        with pytest.raises(ValueError, match="data_offsets"):
            parse_safetensors(buf)


class TestFuzz:
    def test_npy_truncation_and_mutation(self):
        buf = encode_npy(_arr())
        for cut in range(0, len(buf), 7):
            try:
                parse_npy(buf[:cut])
            except ValueError:
                pass
        for off in range(0, min(len(buf), 80), 3):
            mutated = bytearray(buf)
            mutated[off] ^= 0xFF
            try:
                parse_npy(bytes(mutated))
            except ValueError:
                pass

    def test_safetensors_truncation_and_mutation(self):
        buf = encode_safetensors({"w": _arr()})
        for cut in range(0, len(buf), 7):
            try:
                parse_safetensors(buf[:cut])
            except ValueError:
                pass
        hlen = struct.unpack("<Q", buf[:8])[0]
        for off in range(0, 8 + hlen, 3):
            mutated = bytearray(buf)
            mutated[off] ^= 0xFF
            try:
                parse_safetensors(bytes(mutated))
            except ValueError:
                pass


class TestSparkWalker:
    def test_tensor_stats_walker(self, spark, tmp_path):
        (tmp_path / "a.npy").write_bytes(encode_npy(_arr()))
        (tmp_path / "w.safetensors").write_bytes(
            encode_safetensors({"w": _arr(np.float16, (4, 2))})
        )
        files = spark.read.format("binaryFile").load(str(tmp_path) + "/*")
        out = {r.container: r for r in tensor_stats(files).collect()}
        assert out["npy"].n == 24 and out["npy"].sum_v == 24 * 23 / 2 / 8
        assert out["safetensors"].dtype == "float16" and out["safetensors"].n_cols == 2

    def test_walker_on_error_skip(self, spark, tmp_path):
        (tmp_path / "bad.npy").write_bytes(b"\x93NUMPYgarbage")
        files = spark.read.format("binaryFile").load(str(tmp_path / "bad.npy"))
        assert tensor_stats(files, on_error="skip").count() == 0
