"""Generate the committed PLAIN-encoding parquet fixture for q298
(`sources/fixtures/pages_plain.parquet`): 2100 rows in three 700-row
row groups, dictionary encoding OFF so data pages are PLAIN, and a
DIFFERENT codec per column — gzip / zstd / snappy — so one file
exercises every supported page codec (the q290 fixture covers the
snappy + RLE_DICTIONARY path). id stays sorted so the oracle can
derive the row-group index from the data itself (id // 700), immune
to reader parallelism reordering. Deterministic formulas, no RNG."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "odin_rs_spark",
    "sources",
    "fixtures",
    "pages_plain.parquet",
)


def main() -> None:
    ids = list(range(2100))
    tbl = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "val": pa.array([(i % 173) * 0.5 - 43.0 for i in ids], pa.float64()),
            "name": pa.array(
                [None if i % 5 == 0 else "v%02d" % (i % 29) for i in ids],
                pa.string(),
            ),
        }
    )
    pq.write_table(
        tbl,
        OUT,
        row_group_size=700,
        use_dictionary=False,
        compression={"id": "GZIP", "val": "ZSTD", "name": "SNAPPY"},
    )
    print(OUT, os.path.getsize(OUT), "bytes")


if __name__ == "__main__":
    main()
