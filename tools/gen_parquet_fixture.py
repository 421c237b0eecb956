"""Generate the committed parquet footer-statistics fixture
(`sources/fixtures/stats_rowgroups.parquet`) for q290: 4800 rows in
six 800-row row groups, three columns chosen so every statistics shape
the parser decodes is on-path —

- `id`   INT64, sorted  → disjoint per-row-group min/max (the column
  file-skipping actually prunes on),
- `val`  DOUBLE = id*0.25 - 600 (exact in binary, so min/max round-trip
  through DuckDB's VARCHAR stats rendering without float drift),
- `name` BYTE_ARRAY 'kNNN' with NULLs every 7th row → per-row-group
  null_count variation (115/114/...) and string min/max.

Deterministic: no RNG, formulas only. Re-running overwrites in place.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "odin_rs_spark",
    "sources",
    "fixtures",
    "stats_rowgroups.parquet",
)


def main() -> None:
    ids = list(range(4800))
    tbl = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "val": pa.array([i * 0.25 - 600.0 for i in ids], pa.float64()),
            "name": pa.array(
                [None if i % 7 == 0 else "k%03d" % (i % 37) for i in ids],
                pa.string(),
            ),
        }
    )
    pq.write_table(tbl, OUT, row_group_size=800, compression="snappy")
    print(OUT, os.path.getsize(OUT), "bytes")


if __name__ == "__main__":
    main()
