"""Generate committed tensor-shard fixtures for q292 (all values are
dyadic rationals k/8 or k/4 so every dtype — including float16 —
stores them EXACTLY and the DuckDB oracle can replay sums with zero
tolerance). Deterministic formulas, no RNG."""

import os

import numpy as np

from odin_rs_spark.sources.tensorfile import encode_npy, encode_npz, encode_safetensors

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "odin_rs_spark",
    "sources",
    "fixtures",
)


def grid(nr, nc, a, b, m, off, den, dtype):
    i = np.arange(nr).reshape(-1, 1)
    j = np.arange(nc).reshape(1, -1)
    return (((i * a + j * b) % m - off) / den).astype(dtype)


def main() -> None:
    emb = grid(64, 16, 31, 17, 101, 50, 8.0, np.float32)
    with open(os.path.join(FIXDIR, "emb_f32.npy"), "wb") as f:
        f.write(encode_npy(emb))

    train = grid(48, 8, 13, 29, 89, 44, 4.0, np.float64)
    norms = ((np.arange(48) % 23) / 2.0).astype(np.float32)
    with open(os.path.join(FIXDIR, "emb_pack.npz"), "wb") as f:
        f.write(encode_npz({"train": train, "norms": norms}))

    w1 = grid(24, 12, 7, 3, 64, 32, 8.0, np.float32)
    b1 = ((np.arange(12) * 5 % 31 - 15) / 4.0).astype(np.float64)
    emb16 = grid(20, 4, 11, 5, 40, 20, 8.0, np.float16)
    counts = (np.arange(10) * 1000 + 7).astype(np.int64)
    with open(os.path.join(FIXDIR, "weights.safetensors"), "wb") as f:
        f.write(
            encode_safetensors(
                {"w1": w1, "b1": b1, "emb16": emb16, "counts": counts},
                metadata={"format": "pt"},
            )
        )
    for name in ("emb_f32.npy", "emb_pack.npz", "weights.safetensors"):
        print(name, os.path.getsize(os.path.join(FIXDIR, name)), "bytes")


if __name__ == "__main__":
    main()
