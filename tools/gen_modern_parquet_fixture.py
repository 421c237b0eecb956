"""Generate the committed MODERN-WRITER parquet fixture for q322:
v2 data pages, DELTA_BINARY_PACKED ids, DELTA_BYTE_ARRAY names, LZ4
compression, three row groups, planted nulls — the file shape
parquet-mr 2.x / arrow writers actually produce today. The q322
oracle reads the SAME file through DuckDB's own parquet reader, so
the comparison is decoder-vs-decoder on identical bytes.
Deterministic, no RNG."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "odin_rs_spark",
    "sources",
    "fixtures",
)


def main() -> None:
    ids = list(range(900))
    names = [None if i % 11 == 0 else f"doc_{i // 5:04d}_{i % 3}"
             for i in ids]
    vals = [None if i % 13 == 0 else i * 0.25 for i in ids]
    p = os.path.join(FIXDIR, "modern_lz4.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "name": pa.array(names, pa.string()),
                "val": pa.array(vals, pa.float64()),
            }
        ),
        p,
        row_group_size=300,
        compression="lz4",
        use_dictionary=False,
        column_encoding={
            "id": "DELTA_BINARY_PACKED",
            "name": "DELTA_BYTE_ARRAY",
            "val": "PLAIN",
        },
        data_page_version="2.0",
    )
    print(p, os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
