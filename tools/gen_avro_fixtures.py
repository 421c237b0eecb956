"""Generate the committed Avro Object Container fixtures for q291:
six files x 400 formula records (global id = file*400 + i), one per
supported codec (null / deflate / zstandard / snappy / bzip2 / xz —
zstandard and snappy produced by the in-repo encoders, snappy with
the spec's trailing CRC32; bzip2/xz via stdlib bz2/lzma).
Deterministic, no RNG."""

import json
import os

from odin_rs_spark.sources.avrocodec import encode_avro

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "odin_rs_spark",
    "sources",
    "fixtures",
)

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Event",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "ts", "type": "long"},
            {"name": "kind", "type": "string"},
            {"name": "value", "type": ["null", "double"]},
            {"name": "flag", "type": "boolean"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
        ],
    }
)


def records(f: int) -> list[dict]:
    out = []
    for i in range(400):
        gid = f * 400 + i
        out.append(
            {
                "id": gid,
                "ts": 1700000000 + gid * 60,
                "kind": ["click", "view", "purchase"][gid % 3],
                "value": None if gid % 11 == 0 else (gid % 97) * 0.25,
                "flag": gid % 2 == 0,
                "tags": [f"t{(gid + j) % 7}" for j in range(gid % 4)],
            }
        )
    return out


def main() -> None:
    for f, codec in enumerate(["null", "deflate", "zstandard", "snappy", "bzip2", "xz"]):
        path = os.path.join(FIXDIR, f"events_{codec}.avro")
        with open(path, "wb") as fh:
            fh.write(encode_avro(SCHEMA, records(f), codec=codec))
        print(path, os.path.getsize(path), "bytes")


if __name__ == "__main__":
    main()
