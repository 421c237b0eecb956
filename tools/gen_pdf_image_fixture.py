"""Generate the committed image-bearing PDF fixture for q320
(/DCTDecode wired to the in-repo JPEG decoder, r11): three pages
mixing DCTDecode (JPEG) and FlateDecode (raw raster) image XObjects.

Flate rasters use modular formulas the oracle replays exactly in SQL;
JPEG decode is deterministic given bytes, so this script decodes what
it wrote and prints the pinned mean_px literals pasted into Q320_SQL
(the q318 discipline). Deterministic, no RNG."""

import os

import numpy as np

from odin_rs_spark.sources.pdfcodec import (
    encode_pdf_with_images,
    parse_pdf_images,
)

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "odin_rs_spark",
    "sources",
    "fixtures",
)


def main() -> None:
    jj, ii = np.mgrid[0:64, 0:64]
    # smooth fields for the JPEG pages (decode pinned, not replayed)
    smooth = np.clip(
        128 + 80 * np.sin(ii / 9.0) * np.cos(jj / 7.0), 0, 255
    ).astype(np.uint8)
    smooth_rgb = np.stack(
        [smooth, 255 - smooth, (smooth // 2 + 60).astype(np.uint8)], axis=-1
    )
    # modular fields for the Flate pages (oracle replays the formula)
    flate_rgb = np.stack(
        [
            ((ii * 3 + jj * 5) % 256).astype(np.uint8),
            ((ii * 7 + jj * 11) % 256).astype(np.uint8),
            ((ii * 13 + jj * 17) % 256).astype(np.uint8),
        ],
        axis=-1,
    )
    flate_gray = ((ii * 9 + jj * 2) % 251).astype(np.uint8)

    buf = encode_pdf_with_images(
        [
            [(smooth, "jpeg"), (flate_rgb, "flate")],
            [(smooth_rgb, "jpeg")],
            [(flate_gray, "flate")],
        ]
    )
    p = os.path.join(FIXDIR, "mixed_images.pdf")
    with open(p, "wb") as fh:
        fh.write(buf)
    print(p, os.path.getsize(p), "bytes")

    print("-- decoded image rows (page_no, name, cs, filter, mean_px):")
    for im in parse_pdf_images(open(p, "rb").read()):
        mean = (
            round(float(np.mean(im["pixels"])), 4)
            if im["pixels"] is not None else None
        )
        print(
            f"  ({im['page_no']}, '{im['name']}', '{im['colorspace']}', "
            f"'{im['filter']}', {mean}),"
        )


if __name__ == "__main__":
    main()
