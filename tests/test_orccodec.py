"""ORC reader (sources/orccodec): pyarrow's ORC writer is the
independent referee across compressions, RLEv2 sub-encodings,
nullability, dictionary/direct strings and multi-stripe files; the
fuzz discipline applies."""

from __future__ import annotations

import io

import pyarrow as pa
import pytest
from pyarrow import orc

from odin_rs_spark.sources.orccodec import orc_records, parse_orc

N = 3000


def _table() -> pa.Table:
    return pa.table(
        {
            # patched-base trigger: small values with huge outliers
            "ids": pa.array(
                [i if i % 500 else i * 10**9 for i in range(N)], pa.int64()
            ),
            "neg": pa.array(
                [(-1) ** i * (i % 97) * 1000 for i in range(N)], pa.int64()
            ),
            "mono": pa.array(range(100000, 100000 + N), pa.int64()),
            "const": pa.array([7] * N, pa.int64()),
            "ni": pa.array(
                [None if i % 9 == 0 else i for i in range(N)], pa.int64()
            ),
            "lc": pa.array([f"cat_{i % 5}" for i in range(N)], pa.string()),
            "hc": pa.array([f"name_{i:06d}" for i in range(N)], pa.string()),
            "ns": pa.array(
                [None if i % 4 == 0 else f"s{i % 11}" for i in range(N)],
                pa.string(),
            ),
            "b": pa.array([i % 3 == 0 for i in range(N)], pa.bool_()),
            "f": pa.array([i * 0.5 for i in range(N)], pa.float64()),
            "f32": pa.array([i * 0.5 for i in range(N)], pa.float32()),
            "i32": pa.array([i - 1500 for i in range(N)], pa.int32()),
            "i16": pa.array(
                [(i % 60000) - 30000 for i in range(N)], pa.int16()
            ),
        }
    )


def _bytes(table, comp="ZLIB", **kw) -> bytes:
    buf = io.BytesIO()
    orc.write_table(table, buf, compression=comp, **kw)
    return buf.getvalue()


class TestAgainstPyarrow:
    @pytest.mark.parametrize(
        "comp", ["UNCOMPRESSED", "ZLIB", "SNAPPY", "ZSTD", "LZ4"]
    )
    def test_full_matrix(self, comp):
        t = _table()
        out = parse_orc(_bytes(t, comp))
        assert out["n_rows"] == N
        for name in t.column_names:
            assert out["columns"][name] == t[name].to_pylist(), name

    def test_multi_stripe(self):
        t = _table()
        out = parse_orc(_bytes(t, "ZLIB", stripe_size=64 * 1024))
        assert out["n_rows"] == N
        assert out["columns"]["ids"] == t["ids"].to_pylist()
        assert out["columns"]["ns"] == t["ns"].to_pylist()


class TestRejections:
    def test_not_orc(self):
        with pytest.raises(ValueError, match="magic"):
            parse_orc(b"NOPE" + bytes(32))

    def test_unsupported_column_kind_named(self):
        t = pa.table({"ts": pa.array([1, 2], pa.timestamp("us"))})
        with pytest.raises(ValueError, match="timestamp"):
            parse_orc(_bytes(t))

    def test_truncation_ladder_valueerror_only(self):
        buf = _bytes(_table().select(["mono", "lc"]))
        for cut in range(0, len(buf), 37):
            try:
                parse_orc(buf[:cut])
            except ValueError:
                pass  # the only allowed failure mode

    def test_mutation_valueerror_only(self):
        small = pa.table(
            {"x": pa.array(range(200), pa.int64()),
             "s": pa.array([f"v{i % 7}" for i in range(200)], pa.string())}
        )
        buf = _bytes(small, "UNCOMPRESSED")
        for off in range(0, len(buf), 3):
            m = bytearray(buf)
            m[off] ^= 0xFF
            try:
                parse_orc(bytes(m))
            except ValueError:
                pass


class TestSparkWalker:
    def test_walker_projects_fields(self, spark, tmp_path):
        t = _table().select(["mono", "lc", "f", "ni"])
        p = tmp_path / "t.orc"
        p.write_bytes(_bytes(t, "ZSTD"))
        files = spark.read.format("binaryFile").load(str(p))
        out = orc_records(
            files,
            {"mono": "bigint", "lc": "string", "f": "double", "ni": "bigint"},
        ).collect()
        assert len(out) == N
        bymono = {r.mono: r for r in out}
        assert bymono[100000].lc == "cat_0" and bymono[100000].f == 0.0
        assert bymono[100009].ni is None  # i=9 -> null
        assert out[0].compression == "zstd"
