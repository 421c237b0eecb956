"""Generate the committed LOSSY JPEG 2000 GRIB2 fixture for q318
(DRT 5.40 compression type 1 — the 9/7 irreversible + scalar
quantization profile real NOAA HRRR/MRMS granules ship): a 96x64
integer formula field f(i,j) = (3i² + 5j² + 7ij) mod 4096 scaled by
2^-2, packed at qstep 1.0.

Lossy decode is deterministic given bytes (pure IEEE-754 float64
numpy ops, no FMA), so the oracle PINS the decoded aggregates: this
script decodes the exact bytes it wrote and prints the VALUES rows
pasted into Q318_SQL. Re-run after any codec change; a diff means the
decode changed and the catalog pin must be re-derived deliberately.

Deterministic, no RNG."""

import os

import numpy as np

from odin_rs_spark.sources.grib2 import parse_grib2, write_grib2_jpeg2000

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "odin_rs_spark",
    "sources",
    "fixtures",
)


def main() -> None:
    jj, ii = np.mgrid[0:64, 0:96]
    xi = (3 * ii * ii + 5 * jj * jj + 7 * ii * jj) % 4096
    vals = xi.astype(float) * 0.25
    p = os.path.join(FIXDIR, "hrrr_lossy.grib2")
    write_grib2_jpeg2000(
        p, vals, lat0=40.0, lon0=-105.0, dlat=-0.03, dlon=0.03,
        e_scale=-2, nbits=12, levels=3, lossy=True, qstep=1.0,
    )
    print(p, os.path.getsize(p), "bytes")

    g = parse_grib2(open(p, "rb").read())
    dec = g["values"]
    err = dec - vals
    print("max abs err (field units):", np.abs(err).max())
    # the q318 aggregate pin: per x-band (x % 8) over all cells
    print("-- Q318_SQL VALUES rows (xb, n_cells, sum_dec, sum_exact,")
    print("--                       max_abs_err, sum_abs_err):")
    for xb in range(8):
        m = (ii % 8) == xb
        print(
            f"  ({xb}, {int(m.sum())}, {round(float(dec[m].sum()), 6)}, "
            f"{round(float(vals[m].sum()), 6)}, "
            f"{round(float(np.abs(err[m]).max()), 6)}, "
            f"{round(float(np.abs(err[m]).sum()), 6)}),"
        )


if __name__ == "__main__":
    main()
