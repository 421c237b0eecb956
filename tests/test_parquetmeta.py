"""Parquet footer reader (sources/parquetmeta): pyarrow is the
independent referee (its writer produced the bytes, its reader is the
cross-check), plus the repo's truncation/mutation fuzz discipline and
the tail-slice (ranged-GET) contract."""

from __future__ import annotations

import io
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from odin_rs_spark.sources.parquetmeta import (
    parse_parquet_footer,
    parquet_rowgroup_stats,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "odin_rs_spark",
    "sources",
    "fixtures",
    "stats_rowgroups.parquet",
)


def _fixture_bytes() -> bytes:
    with open(FIXTURE, "rb") as f:
        return f.read()


def _arrow_bytes(compression="snappy", row_group_size=50) -> bytes:
    ids = list(range(200))
    tbl = pa.table(
        {
            "a": pa.array(ids, pa.int32()),
            "b": pa.array([i * 0.5 for i in ids], pa.float32()),
            "c": pa.array([i % 2 == 0 for i in ids], pa.bool_()),
            "d": pa.array([b"x" * (i % 3 + 1) for i in ids], pa.binary()),
        }
    )
    sink = io.BytesIO()
    pq.write_table(
        tbl, sink, row_group_size=row_group_size, compression=compression
    )
    return sink.getvalue()


class TestPyarrowCrossCheck:
    def test_fixture_matches_pyarrow_metadata(self):
        buf = _fixture_bytes()
        mine = parse_parquet_footer(buf)
        ref = pq.ParquetFile(io.BytesIO(buf)).metadata
        assert mine["num_rows"] == ref.num_rows
        assert len(mine["row_groups"]) == ref.num_row_groups
        for gi, rg in enumerate(mine["row_groups"]):
            rrg = ref.row_group(gi)
            assert rg["num_rows"] == rrg.num_rows
            assert rg["total_byte_size"] == rrg.total_byte_size
            for ci, c in enumerate(rg["columns"]):
                rc = rrg.column(ci)
                assert c["path"] == rc.path_in_schema
                assert c["num_values"] == rc.num_values
                assert c["codec"] == rc.compression
                assert c["data_page_offset"] == rc.data_page_offset
                assert c["total_compressed_size"] == rc.total_compressed_size
                st = rc.statistics
                assert c["null_count"] == st.null_count
                if c["min_num"] is not None:
                    assert c["min_num"] == float(st.min)
                    assert c["max_num"] == float(st.max)
                else:
                    assert c["min_str"] == st.min
                    assert c["max_str"] == st.max

    def test_other_physical_types_and_uncompressed(self):
        buf = _arrow_bytes(compression="none")
        mine = parse_parquet_footer(buf)
        types = {c["path"]: c["type"] for c in mine["row_groups"][0]["columns"]}
        assert types == {
            "a": "INT32",
            "b": "FLOAT",
            "c": "BOOLEAN",
            "d": "BYTE_ARRAY",
        }
        c0 = mine["row_groups"][0]["columns"]
        assert all(c["codec"] == "UNCOMPRESSED" for c in c0)
        # INT32 stats of row group 1: rows 50..99
        a1 = mine["row_groups"][1]["columns"][0]
        assert (a1["min_num"], a1["max_num"]) == (50.0, 99.0)
        # FLOAT stats decode via <f
        b0 = c0[1]
        assert (b0["min_num"], b0["max_num"]) == (0.0, 24.5)

    def test_gzip_and_zstd_codec_names(self):
        for comp, name in (("gzip", "GZIP"), ("zstd", "ZSTD")):
            mine = parse_parquet_footer(_arrow_bytes(compression=comp))
            assert mine["row_groups"][0]["columns"][0]["codec"] == name


class TestTailSlice:
    def test_footer_parses_from_tail_slice_only(self):
        buf = _fixture_bytes()
        footer_len = struct.unpack("<I", buf[-8:-4])[0]
        tail = buf[-(footer_len + 8 + 16) :]  # ranged GET with slop
        assert parse_parquet_footer(tail) == parse_parquet_footer(buf)

    def test_ambiguous_length_tail_slice_still_parses(self):
        # a ranged-GET tail slice of exactly footer_len+12 bytes is
        # indistinguishable from a minimal full file — it must PARSE
        # (r11 review: a head-magic length heuristic broke the
        # documented suffix-slice contract)
        buf = _fixture_bytes()
        footer_len = struct.unpack("<I", buf[-8:-4])[0]
        tail = buf[len(buf) - 8 - footer_len :]
        padded = b"\x00\x00\x00\x00" + tail  # len == footer_len + 12
        assert parse_parquet_footer(padded) == parse_parquet_footer(buf)

    def test_slice_shorter_than_footer_raises(self):
        buf = _fixture_bytes()
        footer_len = struct.unpack("<I", buf[-8:-4])[0]
        with pytest.raises(ValueError):
            parse_parquet_footer(buf[-(footer_len // 2) :])


class TestFuzz:
    def test_truncation_ladder_valueerror_only(self):
        buf = _arrow_bytes()
        for cut in range(0, len(buf), 97):
            try:
                parse_parquet_footer(buf[:cut])
            except ValueError:
                pass  # the only allowed failure mode

    def test_footer_mutation_valueerror_only(self):
        buf = bytearray(_arrow_bytes())
        footer_len = struct.unpack("<I", bytes(buf[-8:-4]))[0]
        start = len(buf) - 8 - footer_len
        for off in range(start, len(buf) - 8, 3):
            mutated = bytearray(buf)
            mutated[off] ^= 0xFF
            try:
                parse_parquet_footer(bytes(mutated))
            except ValueError:
                pass

    def test_not_parquet_raises(self):
        with pytest.raises(ValueError):
            parse_parquet_footer(b"PK\x03\x04" + b"\x00" * 100)
        with pytest.raises(ValueError):
            parse_parquet_footer(b"")


class TestSparkWalker:
    def test_rowgroup_stats_walker(self, spark):
        files = spark.read.format("binaryFile").load(FIXTURE)
        out = parquet_rowgroup_stats(files).collect()
        assert len(out) == 18  # 6 row groups x 3 columns
        ids = sorted(
            (r.rg, r.min_num, r.max_num)
            for r in out
            if r.col_name == "id"
        )
        assert ids[0] == (0, 0.0, 799.0) and ids[5] == (5, 4000.0, 4799.0)
        names = [r for r in out if r.col_name == "name"]
        assert {r.min_str for r in names} == {"k000"}
        assert sum(r.null_count for r in names) == 4800 // 7 + 1

    def test_walker_on_error_skip(self, spark, tmp_path):
        bad = tmp_path / "bad.parquet"
        bad.write_bytes(b"not parquet at all")
        files = spark.read.format("binaryFile").load(str(bad))
        assert parquet_rowgroup_stats(files, on_error="skip").count() == 0
        with pytest.raises(Exception):
            parquet_rowgroup_stats(files).collect()
