"""MessagePack codec (sources/msgpackcodec): twin round-trips across
the full supported type matrix, width-boundary forms, named extension
rejection, and the fuzz discipline."""

from __future__ import annotations

import pytest

from odin_rs_spark.sources.msgpackcodec import (
    decode_one,
    encode_msgpack,
    msgpack_records,
    parse_msgpack_stream,
)

VALUES = [
    None, True, False,
    0, 1, 127, 128, 255, 256, 65535, 65536, (1 << 32) - 1, 1 << 32,
    (1 << 64) - 1,
    -1, -32, -33, -128, -129, -32768, -32769, -(1 << 31), -(1 << 31) - 1,
    -(1 << 63),
    0.0, 1.5, -2.25, 1e300,
    "", "a", "x" * 31, "y" * 32, "z" * 300, "unicode → ok",
    b"", b"\x00\xff", b"b" * 300,
    [], [1, "two", None, [3.5]], list(range(20)),
    {}, {"k": 1, "nested": {"a": [True, None]}},
]


class TestRoundTrip:
    @pytest.mark.parametrize("v", VALUES, ids=lambda v: repr(v)[:30])
    def test_value_roundtrip(self, v):
        buf = encode_msgpack(v)
        got, pos = decode_one(buf, 0)
        assert pos == len(buf)
        assert got == v and type(got) is type(v)

    def test_concatenated_stream(self):
        objs = [{"seq": i, "v": i * 0.5} for i in range(50)]
        buf = b"".join(encode_msgpack(o) for o in objs)
        assert parse_msgpack_stream(buf) == objs

    def test_array16_and_map16_forms(self):
        v = list(range(70000))  # forces array32
        buf = encode_msgpack(v)
        assert buf[0] == 0xDD
        assert decode_one(buf, 0)[0] == v
        m = {f"k{i}": i for i in range(20)}  # map16
        bm = encode_msgpack(m)
        assert bm[0] == 0xDE
        assert decode_one(bm, 0)[0] == m


class TestRejections:
    def test_ext_types_named(self):
        for head in (b"\xd4\x01\x00", b"\xc7\x01\x00\x00"):
            with pytest.raises(ValueError, match="extension"):
                decode_one(head, 0)

    def test_c1_never_used(self):
        with pytest.raises(ValueError, match="never used"):
            decode_one(b"\xc1", 0)

    def test_non_string_map_key(self):
        # fixmap{1: 2} — int key
        with pytest.raises(ValueError, match="key"):
            decode_one(b"\x81\x01\x02", 0)

    def test_uint64_overflow_encode(self):
        with pytest.raises(ValueError):
            encode_msgpack(1 << 64)


class TestFuzz:
    def test_truncation_and_mutation_valueerror_only(self):
        buf = b"".join(
            encode_msgpack({"s": "abc" * 10, "n": i, "f": i * 0.5, "b": b"\x01" * 5})
            for i in range(20)
        )
        for cut in range(0, len(buf), 3):
            try:
                parse_msgpack_stream(buf[:cut])
            except ValueError:
                pass
        for off in range(0, len(buf), 5):
            m = bytearray(buf)
            m[off] ^= 0xFF
            try:
                parse_msgpack_stream(bytes(m))
            except ValueError:
                pass


class TestSparkWalker:
    def test_walker_projects_fields(self, spark, tmp_path):
        recs = [{"seq": i, "level": "info" if i % 2 else "warn",
                 "v": i * 0.25} for i in range(10)]
        p = tmp_path / "dump.msgpack"
        p.write_bytes(b"".join(encode_msgpack(r) for r in recs))
        files = spark.read.format("binaryFile").load(str(p))
        out = msgpack_records(
            files, {"seq": "bigint", "level": "string", "v": "double"}
        ).collect()
        assert len(out) == 10
        assert {r.seq: r.level for r in out}[0] == "warn"

    def test_walker_on_error_skip(self, spark, tmp_path):
        (tmp_path / "bad.msgpack").write_bytes(b"\xc1\xc1")
        files = spark.read.format("binaryFile").load(str(tmp_path / "bad.msgpack"))
        assert msgpack_records(files, {"seq": "bigint"}, on_error="skip").count() == 0
