"""Generate the committed ORC fixture for q323 — the Hive-era lake
format next to parquet: 600 formula records written by pyarrow's ORC
writer (the independent encoder) with ZSTD compression, two stripes,
nullable value column and a low-cardinality dictionary column. The
oracle replays the formulas in SQL. Deterministic, no RNG."""

import io
import os

import pyarrow as pa
from pyarrow import orc

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "odin_rs_spark",
    "sources",
    "fixtures",
)


def main() -> None:
    n = 600
    ids = list(range(n))
    t = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "kind": pa.array(
                [["click", "view", "purchase"][i % 3] for i in ids],
                pa.string(),
            ),
            "value": pa.array(
                [None if i % 11 == 0 else (i % 97) * 0.25 for i in ids],
                pa.float64(),
            ),
            "flag": pa.array([i % 2 == 0 for i in ids], pa.bool_()),
        }
    )
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="ZSTD", stripe_size=16 * 1024)
    p = os.path.join(FIXDIR, "events_archive.orc")
    with open(p, "wb") as fh:
        fh.write(buf.getvalue())
    print(p, os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
