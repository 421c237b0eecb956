"""Generate the committed TILED/COMPRESSED GeoTIFF DEM fixtures for
q317 — the file shape real DEM tilesets actually ship (tiled +
DEFLATE/LZW + horizontal predictor; the reference reads these via
GDAL VRT mosaics, odin_dem/src/lib.rs:260-299). Two adjacent mosaic
tiles on a 0.01-degree north-up lattice:

  dem_tile_a.tif — 96x64 int16, tiled 32x16, DEFLATE, predictor 2,
    h(i,j) = (i*17 + j*23) % 700, nodata -9999 where (i+2j)%13 == 7,
    top-left (37N, 120W)
  dem_tile_b.tif — 96x64 uint16, tiled 16x16, LZW, predictor 2,
    h(i,j) = (i*29 + j*31) % 900, nodata 65000 where (3i+j)%11 == 4,
    top-left (37N, 119.04W) — the column-adjacent tile

Deterministic, no RNG."""

import os

import numpy as np

from odin_rs_spark.sources.geotiff import write_geotiff

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "odin_rs_spark",
    "sources",
    "fixtures",
)


def main() -> None:
    jj, ii = np.mgrid[0:64, 0:96]

    va = ((ii * 17 + jj * 23) % 700).astype(float)
    va[(ii + 2 * jj) % 13 == 7] = np.nan
    pa = os.path.join(FIXDIR, "dem_tile_a.tif")
    write_geotiff(
        pa, va, lat0=37.0, lon0=-120.0, dlat=-0.01, dlon=0.01,
        dtype="i2", nodata=-9999.0, compression="deflate", predictor=2,
        tile=(32, 16),
    )
    print(pa, os.path.getsize(pa), "bytes")

    vb = ((ii * 29 + jj * 31) % 900).astype(float)
    vb[(3 * ii + jj) % 11 == 4] = np.nan
    pb = os.path.join(FIXDIR, "dem_tile_b.tif")
    write_geotiff(
        pb, vb, lat0=37.0, lon0=-119.04, dlat=-0.01, dlon=0.01,
        dtype="u2", nodata=65000.0, compression="lzw", predictor=2,
        tile=(16, 16),
    )
    print(pb, os.path.getsize(pb), "bytes")


def bigtiff_fp3() -> None:
    """Third mosaic tile (r11b): BigTIFF + floating-point predictor 3 +
    DEFLATE + tiled — the >4 GB-mosaic header form and the float
    predictor GDAL writes, on one committed granule. Heights are
    dyadic (k * 0.25) so f4 storage is exact and the oracle replays
    the formula bit-for-bit: h(i,j) = ((i*13 + j*7) % 500) * 0.25,
    nodata -9999.0 where (i + 3*j) % 17 == 11."""
    import numpy as np

    jj, ii = np.mgrid[0:64, 0:96]
    v = (((ii * 13 + jj * 7) % 500) * 0.25).astype(float)
    v[(ii + 3 * jj) % 17 == 11] = np.nan
    p = os.path.join(FIXDIR, "dem_tile_c_big.tif")
    write_geotiff(
        p, v, lat0=37.0, lon0=-118.08, dlat=-0.01, dlon=0.01,
        dtype="f4", nodata=-9999.0, compression="deflate", predictor=3,
        tile=(32, 16), bigtiff=True,
    )
    print(p, os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
    bigtiff_fp3()
