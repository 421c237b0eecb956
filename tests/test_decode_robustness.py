"""Corrupt-granule behavior across the three binary decoders: every
malformed input raises ValueError ONLY (fuzzed by byte mutation and
truncation with hypothesis), and the Spark scan ops skip-and-audit
instead of dying when asked to — the 10⁶-granule contract: one bad file
must neither kill the scan nor disappear silently."""

from __future__ import annotations

import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import odin_rs_spark
from odin_rs_spark.sources.grib2 import parse_grib2
from odin_rs_spark.sources.imagecodec import decode_image, encode_png
from odin_rs_spark.sources.netcdf3 import parse_netcdf3

FIX = os.path.join(
    os.path.dirname(os.path.abspath(odin_rs_spark.__file__)), "sources", "fixtures"
)
NC = open(os.path.join(FIX, "grid_cdf1.nc"), "rb").read()
GRIB = open(os.path.join(FIX, "wind_t50.grib2"), "rb").read()
PNG = encode_png(np.arange(48, dtype=np.uint8).reshape(6, 8))


def _assert_valueerror_or_ok(fn, buf):
    try:
        fn(buf)
    except ValueError:
        pass  # the one allowed failure type
    # any other exception type propagates and fails the test


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(NC) - 1), st.integers(1, 255))
def test_netcdf_mutation_raises_valueerror_only(pos, flip):
    buf = bytearray(NC)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_netcdf3, bytes(buf))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(NC)))
def test_netcdf_truncation_raises_valueerror_only(cut):
    _assert_valueerror_or_ok(parse_netcdf3, NC[:cut])


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(GRIB) - 1), st.integers(1, 255))
def test_grib2_mutation_raises_valueerror_only(pos, flip):
    buf = bytearray(GRIB)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_grib2, bytes(buf))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(GRIB)))
def test_grib2_truncation_raises_valueerror_only(cut):
    _assert_valueerror_or_ok(parse_grib2, GRIB[:cut])


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(PNG) - 1), st.integers(1, 255))
def test_png_mutation_raises_valueerror_only(pos, flip):
    buf = bytearray(PNG)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(decode_image, bytes(buf))


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=200))
def test_arbitrary_bytes_raise_valueerror_only(junk):
    for fn in (parse_netcdf3, parse_grib2, decode_image):
        _assert_valueerror_or_ok(fn, junk)


def test_netcdf_scan_skip_and_audit(spark, tmp_path):
    from odin_rs_spark.sources.netcdf3 import (
        netcdf_decode_errors,
        netcdf_grid_cells,
    )

    good, bad = str(tmp_path / "a.nc"), str(tmp_path / "b.nc")
    open(good, "wb").write(NC)
    open(bad, "wb").write(NC[: len(NC) // 2])  # truncated granule
    files = spark.read.format("binaryFile").load(str(tmp_path) + "/*.nc")
    with pytest.raises(Exception):  # default: the corrupt granule raises
        netcdf_grid_cells(files, "speed", mask_var="quality").count()
    cells = netcdf_grid_cells(
        files, "speed", mask_var="quality", on_error="skip"
    )
    assert cells.count() == 16 * 12  # only the good granule's cells
    errs = netcdf_decode_errors(files).collect()
    assert len(errs) == 1 and errs[0]["path"].endswith("b.nc")
    assert "corrupt" in errs[0]["error"] or "truncated" in errs[0]["error"]


def test_grib2_scan_skip_and_audit(spark, tmp_path):
    from odin_rs_spark.sources.grib2 import grib2_decode_errors, grib2_grid_cells

    open(str(tmp_path / "a.grib2"), "wb").write(GRIB)
    open(str(tmp_path / "b.grib2"), "wb").write(GRIB[:60])
    files = spark.read.format("binaryFile").load(str(tmp_path) + "/*.grib2")
    cells = grib2_grid_cells(files, on_error="skip")
    assert cells.count() == 24 * 20
    errs = grib2_decode_errors(files).collect()
    assert len(errs) == 1 and errs[0]["path"].endswith("b.grib2")


def test_image_stats_skip_and_audit(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from odin_rs_spark.operators.multimodal import (
        image_decode_errors,
        image_pixel_stats,
    )

    import pandas as pd

    def _mk(s):
        return pd.Series(
            [bytes(PNG) if int(m) % 2 == 0 else b"JUNK" + bytes(20) for m in s]
        )

    mk = F.pandas_udf(_mk, BinaryType())
    media = spark.range(6).select(
        F.col("id").alias("media_id"), mk(F.col("id")).alias("content")
    )
    stats = image_pixel_stats(media, on_error="skip")
    assert stats.count() == 3
    errs = image_decode_errors(media)
    assert errs.count() == 3
    assert all("unrecognized" in r["error"] for r in errs.collect())


def test_bad_on_error_value_rejected(spark):
    from odin_rs_spark.sources.grib2 import grib2_grid_cells

    files = spark.read.format("binaryFile").load(
        os.path.join(FIX, "wind_t50.grib2")
    )
    with pytest.raises(ValueError, match="on_error"):
        grib2_grid_cells(files, on_error="ignore")


# ---------------------------------------------------------------------------
# round-6 codecs: WAV, AVI, JPEG — same mutation/truncation contract
# ---------------------------------------------------------------------------

from odin_rs_spark.sources.audiocodec import decode_wav, encode_wav
from odin_rs_spark.sources.avicodec import encode_avi, parse_avi_index
from odin_rs_spark.sources.jpegcodec import decode_jpeg, encode_jpeg

WAV = encode_wav(np.arange(-50, 50, dtype=np.int16), rate=8000)
AVI = encode_avi([20, 15, 30], width=32, height=24)
_jb, _jx = np.mgrid[0:3, 0:4]
JPEG = encode_jpeg(
    np.repeat(
        np.repeat((2 * ((_jx * 7 + _jb * 11) % 100) + 12), 8, axis=0), 8, axis=1
    ).astype(np.uint8)
)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(WAV) - 1), st.integers(1, 255))
def test_wav_mutation_raises_valueerror_only(pos, flip):
    buf = bytearray(WAV)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(decode_wav, bytes(buf))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(AVI) - 1), st.integers(1, 255))
def test_avi_mutation_raises_valueerror_only(pos, flip):
    buf = bytearray(AVI)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_avi_index, bytes(buf))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(JPEG) - 1), st.integers(1, 255))
def test_jpeg_mutation_raises_valueerror_only(pos, flip):
    buf = bytearray(JPEG)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(decode_jpeg, bytes(buf))


@settings(max_examples=30, deadline=None)
@given(st.integers(1, len(JPEG) - 1))
def test_jpeg_truncation_raises_valueerror_only(cut):
    _assert_valueerror_or_ok(decode_jpeg, JPEG[:cut])


def test_jpeg_huge_dims_rejected_before_allocation():
    """SOF0 width/height are raw 2-byte fields: a tiny file claiming
    65535x65535 must raise on the MCU-vs-scan-bytes bound, not attempt
    a ~34 GB plane allocation (the grib2-ng fuzzer class)."""
    import resource
    import struct as _s

    buf = bytearray(JPEG)
    sof = bytes(buf).find(b"\xff\xc0")
    _s.pack_into(">HH", buf, sof + 5, 65535, 65535)
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    with pytest.raises(ValueError, match="blocks but only"):
        decode_jpeg(bytes(buf))
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert after - before < 1_000_000  # KiB: no multi-GB spike


from odin_rs_spark.sources.geotiff import parse_geotiff, write_geotiff

import tempfile as _tf

_gt = _tf.mktemp(suffix=".tif")
write_geotiff(
    _gt, np.arange(24, dtype=np.float64).reshape(4, 6), 1, 2, -0.5, 0.5, dtype="f4"
)
TIFF = open(_gt, "rb").read()


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(TIFF) - 1), st.integers(1, 255))
def test_geotiff_mutation_raises_valueerror_only(pos, flip):
    buf = bytearray(TIFF)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_geotiff, bytes(buf))


@settings(max_examples=30, deadline=None)
@given(st.integers(1, len(TIFF) - 1))
def test_geotiff_truncation_raises_valueerror_only(cut):
    _assert_valueerror_or_ok(parse_geotiff, TIFF[:cut])


# ---- round-7 codecs: GIF and WARC under the same contract ----

def _gif_buf():
    from odin_rs_spark.sources.gifcodec import encode_gif

    g = ((np.arange(20)[:, None] * 7 + np.arange(24)[None, :] * 11) % 256).astype(
        np.uint8
    )
    return encode_gif(g, interlace=True)


GIFB = _gif_buf()


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(GIFB) - 1), st.integers(1, 255))
def test_gif_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.gifcodec import gif_frames

    buf = bytearray(GIFB)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(gif_frames, bytes(buf))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(GIFB)))
def test_gif_truncation_raises_valueerror_only(cut):
    from odin_rs_spark.sources.gifcodec import gif_frames

    _assert_valueerror_or_ok(gif_frames, GIFB[:cut])


def _warc_buf():
    from odin_rs_spark.sources.warc import encode_warc

    recs = [
        {"warc_type": "warcinfo", "block": b"software: x\r\n"},
        {
            "warc_type": "response",
            "target_uri": "https://a.example/p",
            "content_type": "application/http; msgtype=response",
            "block": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nbody",
        },
    ]
    return encode_warc(recs, gzip_members=True)


WARCB = _warc_buf()


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(WARCB) - 1), st.integers(1, 255))
def test_warc_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.warc import parse_warc

    buf = bytearray(WARCB)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_warc, bytes(buf))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(WARCB)))
def test_warc_truncation_raises_valueerror_only(cut):
    from odin_rs_spark.sources.warc import parse_warc

    _assert_valueerror_or_ok(parse_warc, WARCB[:cut])


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 400), st.integers(1, 255))
def test_avi_audio_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.avicodec import encode_avi, parse_avi_audio

    base = encode_avi(
        [10, 12], audio=np.arange(64, dtype=np.int16), audio_chunks=2
    )
    buf = bytearray(base)
    buf[pos % len(base)] ^= flip
    _assert_valueerror_or_ok(parse_avi_audio, bytes(buf))


IPNG = encode_png(
    np.arange(16 * 24, dtype=np.uint8).reshape(16, 24), interlace=True
)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(IPNG) - 1), st.integers(1, 255))
def test_interlaced_png_mutation_raises_valueerror_only(pos, flip):
    buf = bytearray(IPNG)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(decode_image, bytes(buf))


def _bmp_buf():
    from odin_rs_spark.sources.imagecodec import encode_bmp

    return encode_bmp(np.arange(12 * 10, dtype=np.uint8).reshape(12, 10))


BMPB = _bmp_buf()


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(BMPB) - 1), st.integers(1, 255))
def test_bmp_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.imagecodec import decode_bmp

    buf = bytearray(BMPB)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(decode_bmp, bytes(buf))


def _mulaw_wav():
    from odin_rs_spark.sources.audiocodec import MULAW_TABLE, encode_wav_mulaw

    return encode_wav_mulaw(
        MULAW_TABLE[(np.arange(200) * 13) % 256], rate=8000
    )


MUWAV = _mulaw_wav()


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(MUWAV) - 1), st.integers(1, 255))
def test_mulaw_wav_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.audiocodec import decode_wav

    buf = bytearray(MUWAV)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(decode_wav, bytes(buf))


# ---------------------------------------------------------------------------
# round-8 codecs: PDF (plain + /ObjStm), DOCX, EXIF, WARC HTTP wire
# decodings — same ValueError-only mutation/truncation contract
# ---------------------------------------------------------------------------

def _pdf_bufs():
    from odin_rs_spark.sources.pdfcodec import encode_pdf

    pages = [["alpha beta gamma", "second line"], ["page two"]]
    return (
        encode_pdf(pages, compress=True),
        encode_pdf(pages, compress=True, use_objstm=True),
    )


PDFB, PDFOS = _pdf_bufs()


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(PDFB) - 1), st.integers(1, 255))
def test_pdf_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.pdfcodec import parse_pdf_text

    buf = bytearray(PDFB)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_pdf_text, bytes(buf))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(PDFOS) - 1), st.integers(1, 255))
def test_pdf_objstm_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.pdfcodec import parse_pdf_text

    buf = bytearray(PDFOS)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_pdf_text, bytes(buf))


@settings(max_examples=40, deadline=None)
@given(st.integers(0, len(PDFB)))
def test_pdf_truncation_raises_valueerror_only(cut):
    from odin_rs_spark.sources.pdfcodec import parse_pdf_text

    _assert_valueerror_or_ok(parse_pdf_text, PDFB[:cut])


def _docx_buf():
    from odin_rs_spark.sources.officedoc import encode_docx

    return encode_docx(["hello & <x>", "second paragraph"])


DOCXB = _docx_buf()


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(DOCXB) - 1), st.integers(1, 255))
def test_docx_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.officedoc import parse_docx_text

    buf = bytearray(DOCXB)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_docx_text, bytes(buf))


@settings(max_examples=40, deadline=None)
@given(st.integers(0, len(DOCXB)))
def test_docx_truncation_raises_valueerror_only(cut):
    from odin_rs_spark.sources.officedoc import parse_docx_text

    _assert_valueerror_or_ok(parse_docx_text, DOCXB[:cut])


def _exif_jpeg():
    from odin_rs_spark.sources.exif import encode_exif_app1, insert_app1

    return insert_app1(
        JPEG,
        encode_exif_app1(
            make="CamX", orientation=6, gps=(12.5, -33.25), byte_order=">"
        ),
    )


EXIFJ = _exif_jpeg()


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(EXIFJ) - 1), st.integers(1, 255))
def test_exif_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.exif import parse_exif, strip_app_segments

    buf = bytearray(EXIFJ)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_exif, bytes(buf))
    _assert_valueerror_or_ok(strip_app_segments, bytes(buf))


def _http_block():
    from odin_rs_spark.sources.warc import encode_http_response

    return encode_http_response(
        b"hello wire body " * 8, chunked=True, content_encoding="gzip",
        chunk_size=7,
    )


HTTPB = _http_block()


def _decode_http(buf: bytes):
    from odin_rs_spark.sources.warc import decode_http_body, split_http_response

    status, hh, body = split_http_response(buf)
    decode_http_body(hh, body)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(HTTPB) - 1), st.integers(1, 255))
def test_http_wire_mutation_raises_valueerror_only(pos, flip):
    buf = bytearray(HTTPB)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(_decode_http, bytes(buf))


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=200))
def test_round8_arbitrary_bytes_raise_valueerror_only(junk):
    from odin_rs_spark.sources.exif import parse_exif
    from odin_rs_spark.sources.officedoc import parse_docx_text
    from odin_rs_spark.sources.pdfcodec import parse_pdf_text

    for fn in (parse_pdf_text, parse_docx_text, parse_exif, _decode_http):
        _assert_valueerror_or_ok(fn, junk)


# -- round-9 parsers: PDF with fonts, XLSX, PPTX -------------------------------


def _pdf_font_buf():
    from odin_rs_spark.sources.pdfcodec import encode_pdf

    return encode_pdf(
        [["xé—y", "café €"]],
        compress=True,
        font_spec={
            "base": "/WinAnsiEncoding",
            "differences": {65: "/eacute", 66: "/emdash"},
            "tounicode_chars": {0xD0: "☃"},
            "tounicode_range": (0xC1, 0xC3, "α"),
        },
        info={"title": "T →", "creation_date": "D:20260815090000Z"},
    )


PDFF = _pdf_font_buf()


@settings(max_examples=80, deadline=None)
@given(st.integers(0, len(PDFF) - 1), st.integers(1, 255))
def test_pdf_font_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.pdfcodec import parse_pdf_info, parse_pdf_text

    buf = bytearray(PDFF)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_pdf_text, bytes(buf))
    _assert_valueerror_or_ok(parse_pdf_info, bytes(buf))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(PDFF)))
def test_pdf_font_truncation_raises_valueerror_only(cut):
    from odin_rs_spark.sources.pdfcodec import parse_pdf_info, parse_pdf_text

    _assert_valueerror_or_ok(parse_pdf_text, PDFF[:cut])
    _assert_valueerror_or_ok(parse_pdf_info, PDFF[:cut])


def _xlsx_buf():
    from odin_rs_spark.sources.officedoc import encode_xlsx

    return encode_xlsx(
        [("S&1", [["a", 1, b"i&x"], [True, None, "a"]]), ("S2", [[2.5]])]
    )


XLSXB = _xlsx_buf()


@settings(max_examples=80, deadline=None)
@given(st.integers(0, len(XLSXB) - 1), st.integers(1, 255))
def test_xlsx_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.officedoc import parse_xlsx_cells

    buf = bytearray(XLSXB)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_xlsx_cells, bytes(buf))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(XLSXB)))
def test_xlsx_truncation_raises_valueerror_only(cut):
    from odin_rs_spark.sources.officedoc import parse_xlsx_cells

    _assert_valueerror_or_ok(parse_xlsx_cells, XLSXB[:cut])


def _pptx_buf():
    from odin_rs_spark.sources.officedoc import encode_pptx

    return encode_pptx([["t &1", "b"], ["s2"]])


PPTXB = _pptx_buf()


@settings(max_examples=80, deadline=None)
@given(st.integers(0, len(PPTXB) - 1), st.integers(1, 255))
def test_pptx_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.officedoc import parse_pptx_text

    buf = bytearray(PPTXB)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_pptx_text, bytes(buf))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(PPTXB)))
def test_pptx_truncation_raises_valueerror_only(cut):
    from odin_rs_spark.sources.officedoc import parse_pptx_text

    _assert_valueerror_or_ok(parse_pptx_text, PPTXB[:cut])


def _pdf_cid_buf():
    from odin_rs_spark.sources.pdfcodec import encode_pdf

    return encode_pdf(
        [["данные 模型"]],
        compress=True,
        font_spec={
            "cid": {1: " ", 2: "д", 3: "а", 4: "н", 5: "ы", 6: "е",
                    7: "模", 8: "型"},
            "cid_range": (0x20, 0x21, "α"),
        },
    )


PDFCID = _pdf_cid_buf()


@settings(max_examples=80, deadline=None)
@given(st.integers(0, len(PDFCID) - 1), st.integers(1, 255))
def test_pdf_cid_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.pdfcodec import parse_pdf_text

    buf = bytearray(PDFCID)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_pdf_text, bytes(buf))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(PDFCID)))
def test_pdf_cid_truncation_raises_valueerror_only(cut):
    from odin_rs_spark.sources.pdfcodec import parse_pdf_text

    _assert_valueerror_or_ok(parse_pdf_text, PDFCID[:cut])


# --- round-10 codecs: hdf5, zstd, j2k under the same contract ---------------

HDF5 = open(os.path.join(FIX, "grid_hdf5.nc"), "rb").read()
ZST = open(os.path.join(FIX, "formula_text_l19.zst"), "rb").read()
J2K_GRIB = open(os.path.join(FIX, "wind_j2k.grib2"), "rb").read()


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(HDF5) - 1), st.integers(1, 255))
def test_hdf5_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.hdf5 import parse_hdf5

    buf = bytearray(HDF5)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_hdf5, bytes(buf))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, len(ZST) - 1), st.integers(1, 255))
def test_zstd_mutation_raises_valueerror_only(pos, flip):
    from odin_rs_spark.sources.zstdcodec import zstd_decompress

    buf = bytearray(ZST)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(zstd_decompress, bytes(buf))


@settings(max_examples=40, deadline=None)
@given(st.integers(0, len(J2K_GRIB) - 1), st.integers(1, 255))
def test_j2k_grib_mutation_raises_valueerror_only(pos, flip):
    buf = bytearray(J2K_GRIB)
    buf[pos] ^= flip
    _assert_valueerror_or_ok(parse_grib2, bytes(buf))


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_random_bytes_never_crash_r10_codecs(data):
    from odin_rs_spark.sources.hdf5 import parse_hdf5
    from odin_rs_spark.sources.j2kcodec import decode_j2k
    from odin_rs_spark.sources.zstdcodec import zstd_decompress

    for fn in (parse_hdf5, zstd_decompress, decode_j2k):
        _assert_valueerror_or_ok(fn, data)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 65535), min_size=1, max_size=64))
def test_zstd_store_roundtrip_property(vals):
    from odin_rs_spark.sources.zstdcodec import (
        zstd_compress_store,
        zstd_decompress,
    )

    payload = b"".join(v.to_bytes(2, "big") for v in vals)
    assert zstd_decompress(zstd_compress_store(payload)) == payload


@settings(max_examples=20, deadline=None)
@given(
    st.integers(2, 40),
    st.integers(2, 40),
    st.integers(1, 3),
    st.integers(0, 2**32 - 1),
)
def test_j2k_roundtrip_property(h, w, levels, seed):
    from odin_rs_spark.sources.j2kcodec import decode_j2k, encode_j2k

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 4096, size=(h, w)).astype(np.int64)
    assert np.array_equal(decode_j2k(encode_j2k(img, levels=levels)), img)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 18), st.integers(0, 1)),
                min_size=1, max_size=500))
def test_mq_coder_roundtrip_property(seq):
    from odin_rs_spark.sources.j2kcodec import MQDecoder, MQEncoder

    enc = MQEncoder()
    for cx, d in seq:
        enc.encode(cx, d)
    dec = MQDecoder(enc.flush())
    assert all(dec.decode(cx) == d for cx, d in seq)
