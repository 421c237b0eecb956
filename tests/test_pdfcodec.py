"""PDF text extraction (sources/pdfcodec): object graph walk, Flate
streams, literal/hex string forms, escape handling, page order, and
the Spark per-page scan operator."""

from __future__ import annotations

import zlib

import pytest

from odin_rs_spark.sources.pdfcodec import (
    _extract_text,
    encode_pdf,
    parse_pdf_text,
    pdf_pages,
)

PAGES = [
    ["hello world (with parens)", "second line \\ backslash", "third"],
    ["page two single line"],
    [],
]


def test_roundtrip_flate_and_identity():
    for compress in (True, False):
        buf = encode_pdf(PAGES, compress=compress)
        assert parse_pdf_text(buf) == ["\n".join(p) for p in PAGES]


def test_both_string_forms_on_path():
    """The fixture twin emits even lines as literal strings (Tj) and
    odd lines as hex strings (TJ arrays) — assert both forms really
    appear in the identity-encoded bytes."""
    buf = encode_pdf([["lit-one", "hex-two"]], compress=False)
    assert b"(lit-one) Tj" in buf
    assert b"<" + b"hex-two".hex().encode() + b"> 120] TJ" in buf
    assert parse_pdf_text(buf) == ["lit-one\nhex-two"]


def test_literal_string_escapes():
    assert _extract_text(rb"BT (\101\102\103 \( \) \\ x) Tj ET") == r"ABC ( ) \ x"
    # line continuation backslash-newline vanishes
    assert _extract_text(b"BT (ab\\\ncd) Tj ET") == "abcd"
    # TJ kerning numbers are not text
    assert _extract_text(b"BT [(a) -120 (b) 40 (c)] TJ ET") == "abc"
    # Td starts a new line; ' shows on the next line
    assert _extract_text(b"BT (a) Tj 0 -14 Td (b) Tj ET") == "a\nb"
    assert _extract_text(b"BT (a) Tj (b) ' ET") == "a\nb"


def test_objstm_layout_roundtrip():
    """The modern-writer layout (PDF 1.5 /ObjStm): catalog, page tree
    and page dicts packed in ONE compressed object stream; content
    streams stay direct. All four (objstm × compress) combinations
    round-trip identically."""
    for objstm in (False, True):
        for compress in (True, False):
            buf = encode_pdf(PAGES, compress=compress, use_objstm=objstm)
            assert parse_pdf_text(buf) == ["\n".join(p) for p in PAGES]
            assert (b"/ObjStm" in buf) == objstm
    # a malformed ObjStm pair table raises by name
    buf = bytearray(encode_pdf([["x"]], compress=False, use_objstm=True))
    i = bytes(buf).find(b"/First")
    with pytest.raises(ValueError, match="ObjStm"):
        parse_pdf_text(bytes(buf[:i]) + b"/Zzz " + bytes(buf[i + 6:]))


def test_page_order_and_empty_page():
    buf = encode_pdf([["p0"], [], ["p2"]])
    assert parse_pdf_text(buf) == ["p0", "", "p2"]


def test_errors_named():
    with pytest.raises(ValueError, match="no %PDF header"):
        parse_pdf_text(b"GIF89a nope")
    with pytest.raises(ValueError, match="missing object"):
        parse_pdf_text(encode_pdf(PAGES)[:200])
    # corrupt flate payload inside an otherwise-valid wrapper: zero
    # the bytes after the LAST 'stream' keyword (the page content)
    good = bytearray(encode_pdf([["x"]], compress=True))
    sp = bytes(good).find(b"\nstream\n") + 8
    good[sp : sp + 8] = b"\x00" * 8
    with pytest.raises(ValueError, match="Flate"):
        parse_pdf_text(bytes(good))
    # unsupported filter named
    nofl = encode_pdf([["x"]], compress=False).replace(
        b"<< /Length", b"<< /Filter /LZWDecode /Length"
    )
    with pytest.raises(ValueError, match="LZWDecode unsupported"):
        parse_pdf_text(nofl)


def test_pdf_pages_spark(spark, tmp_path):
    a = tmp_path / "a.pdf"
    a.write_bytes(encode_pdf([["first page text"], ["second"]]))
    bad = tmp_path / "b.pdf"
    bad.write_bytes(b"%PDF-1.4 but truncated garbage")
    files = spark.read.format("binaryFile").load(str(a))
    rows = sorted(pdf_pages(files).collect(), key=lambda r: r.page_no)
    assert [(r.page_no, r.n_pages, r.text, r.n_chars) for r in rows] == [
        (0, 2, "first page text", 15),
        (1, 2, "second", 6),
    ]
    both = spark.read.format("binaryFile").load([str(a), str(bad)])
    kept = pdf_pages(both, on_error="skip").collect()
    assert {r.file for r in kept} == {"a.pdf"}
    with pytest.raises(Exception):
        pdf_pages(both).collect()


def test_index_prefers_parseable_declaration():
    """ADVICE r8: stream bytes coincidentally spelling 'N G obj'
    BEFORE the real declaration must not shadow it — candidate offsets
    are confirmed by tokenizing, falling back to the next occurrence."""
    from odin_rs_spark.sources.pdfcodec import _index_objects, _Tok

    buf = (
        b"1 0 obj << /Length 18 >> stream\n"
        b"2 0 obj >> nope\n"  # unparseable echo inside stream data
        b"endstream endobj\n"
        b"2 0 obj (real) endobj\n"
    )
    idx = _index_objects(buf)
    assert _Tok(buf, idx[2]).value() == b"real"


def test_simple_font_winansi_byte_pins():
    """Known-answer pins so the shared encode/decode layering cannot
    self-certify: € is 0x80 and é is 0xE9 in WinAnsiEncoding (cp1252),
    é is 0x8E in MacRomanEncoding — asserted on the WIRE bytes."""
    from odin_rs_spark.sources.pdfcodec import encode_pdf, parse_pdf_text

    pdf = encode_pdf(
        [["café €"]], compress=False, font_spec={"base": "/WinAnsiEncoding"}
    )
    assert b"(caf\xe9 \x80) Tj" in pdf
    assert parse_pdf_text(pdf) == ["café €"]
    mac = encode_pdf(
        [["café"]], compress=False, font_spec={"base": "/MacRomanEncoding"}
    )
    assert b"(caf\x8e) Tj" in mac
    assert parse_pdf_text(mac) == ["café"]


def test_simple_font_differences_remap():
    """/Differences steals the 'A'/'B' code slots for /eacute and
    /emdash: the wire says AB, the font says é— (a latin-1 decode
    would be WRONG); the stolen characters become unencodable."""
    from odin_rs_spark.sources.pdfcodec import encode_pdf, parse_pdf_text

    spec = {
        "base": "/WinAnsiEncoding",
        "differences": {65: "/eacute", 66: "/emdash"},
    }
    pdf = encode_pdf([["xé—y"]], compress=False, font_spec=spec)
    assert b"(xABy) Tj" in pdf  # the adversarial wire bytes
    assert parse_pdf_text(pdf) == ["xé—y"]
    with pytest.raises(ValueError, match="cannot encode"):
        encode_pdf([["A"]], font_spec=spec)
    with pytest.raises(ValueError, match="unknown glyph"):
        encode_pdf([["x"]], font_spec={"differences": {65: "/notaglyph"}})


def test_tounicode_bfchar_bfrange_and_ligatures():
    """/ToUnicode CMap: bfrange increments only the LAST UTF-16 code
    unit (§9.10.3); bfchar may map one code to a multi-char string
    (ligatures) — handcrafted CMap, decode-only."""
    from odin_rs_spark.sources.pdfcodec import (
        _parse_tounicode,
        encode_pdf,
        parse_pdf_text,
    )

    pdf = encode_pdf(
        [["a αβγ ☃"]],
        compress=False,
        font_spec={
            "tounicode_chars": {0xD0: "☃"},
            "tounicode_range": (0xC1, 0xC3, "α"),
        },
    )
    assert b"(a \xc1\xc2\xc3 \xd0) Tj" in pdf
    assert parse_pdf_text(pdf) == ["a αβγ ☃"]
    # ligature bfchar + array-form bfrange
    cmap = (
        b"1 beginbfchar <66> <00660069> endbfchar\n"
        b"1 beginbfrange <70> <71> [<0050> <0051>] endbfrange\n"
    )
    m = _parse_tounicode(cmap)
    assert m[0x66] == "fi" and m[0x70] == "P" and m[0x71] == "Q"
    with pytest.raises(ValueError, match="bfrange"):
        _parse_tounicode(b"1 beginbfrange <72> <70> <0050> endbfrange")


def test_font_tracking_via_tf():
    """Two fonts on one page: strings route through the CURRENT font
    set by Tf, not a per-page constant."""
    from odin_rs_spark.sources.pdfcodec import _extract_text

    fonts = {
        "/F1": None,  # latin-1
        "/F2": ("simple", [chr(0x2600 + c) for c in range(256)]),  # toy remap
    }
    content = b"BT /F1 12 Tf (ab) Tj /F2 12 Tf (\x01\x02) Tj ET"
    assert _extract_text(content, fonts) == "ab" + chr(0x2601) + chr(0x2602)


def test_cid_type0_identity_h():
    """CID/Type0 Identity-H — the subset-TrueType/CJK layout modern
    writers emit: 2-byte glyph codes are meaningless without the wide
    /ToUnicode CMap. Wire pin: 'да' is <00020003> on the wire; an
    unmapped code and an odd trailing byte decode as replacement
    chars, never crash."""
    from odin_rs_spark.sources.pdfcodec import (
        _extract_text,
        encode_pdf,
        parse_pdf_text,
    )

    spec = {
        "cid": {1: " ", 2: "д", 3: "а", 4: "н", 5: "ы", 6: "е"},
        "cid_range": (0x20, 0x22, "α"),
    }
    pdf = encode_pdf([["данные", "αβγ"]], compress=False, font_spec=spec)
    assert parse_pdf_text(pdf) == ["данные\nαβγ"]
    assert b"(\x00\x02\x00\x03\x00\x04\x00\x04\x00\x05\x00\x06) Tj" in pdf
    # unmapped code + odd trailing byte -> U+FFFD
    fonts = {"/F1": ("cid", {2: "д"})}
    got = _extract_text(b"BT /F1 1 Tf (\x00\x02\x00\x99\x01) Tj ET", fonts)
    assert got == "д��"
    # Type0 with NO ToUnicode: everything is replacement, not a crash
    fonts = {"/F1": ("cid", {})}
    assert _extract_text(b"BT /F1 1 Tf (\x00\x02) Tj ET", fonts) == "�"


class TestImageXObjects:
    """r11: /DCTDecode + /FlateDecode image XObjects (parse_pdf_images)."""

    def _imgs(self):
        import numpy as np

        jj, ii = np.mgrid[0:32, 0:32]
        smooth = np.clip(128 + 70 * np.sin(ii / 6.0) * np.cos(jj / 5.0),
                         0, 255).astype(np.uint8)
        rgb = np.stack([smooth, 255 - smooth, smooth // 2], axis=-1)
        return smooth, rgb

    def test_flate_raster_roundtrips_exactly(self):
        import numpy as np

        from odin_rs_spark.sources.pdfcodec import (
            encode_pdf_with_images,
            parse_pdf_images,
        )

        smooth, rgb = self._imgs()
        buf = encode_pdf_with_images([[(smooth, "flate"), (rgb, "flate")]])
        imgs = parse_pdf_images(buf)
        assert [i["name"] for i in imgs] == ["/Im0", "/Im1"]
        assert np.array_equal(imgs[0]["pixels"], smooth)
        assert np.array_equal(imgs[1]["pixels"], rgb)
        assert imgs[0]["colorspace"] == "/DeviceGray"
        assert imgs[1]["colorspace"] == "/DeviceRGB"

    def test_dct_decodes_close_to_source(self):
        import numpy as np

        from odin_rs_spark.sources.pdfcodec import (
            encode_pdf_with_images,
            parse_pdf_images,
        )

        smooth, rgb = self._imgs()
        buf = encode_pdf_with_images([[(smooth, "jpeg")], [(rgb, "jpeg")]])
        imgs = parse_pdf_images(buf)
        assert imgs[0]["filter"] == "/DCTDecode"
        assert imgs[0]["page_no"] == 0 and imgs[1]["page_no"] == 1
        # smooth fields survive baseline JPEG within a few levels
        assert np.abs(imgs[0]["pixels"].astype(float) - smooth).mean() < 4
        assert np.abs(imgs[1]["pixels"].astype(float) - rgb).mean() < 6

    def test_unknown_image_filter_surfaces_undecoded(self):
        from odin_rs_spark.sources.pdfcodec import (
            encode_pdf_with_images,
            parse_pdf_images,
        )

        smooth, _ = self._imgs()
        buf = encode_pdf_with_images([[(smooth, "flate")]])
        # rewrite the image's filter name to an unsupported one of the
        # same length so offsets stay valid
        buf = buf.replace(b"/Filter /FlateDecode", b"/Filter /JBIG2Decod_", 1)
        imgs = parse_pdf_images(buf)
        assert imgs[0]["pixels"] is None
        assert imgs[0]["filter"] == "/JBIG2Decod_"

    def test_committed_fixture_shape(self):
        import os

        import odin_rs_spark
        from odin_rs_spark.sources.pdfcodec import parse_pdf_images

        p = os.path.join(
            os.path.dirname(os.path.abspath(odin_rs_spark.__file__)),
            "sources", "fixtures", "mixed_images.pdf",
        )
        imgs = parse_pdf_images(open(p, "rb").read())
        assert [(i["page_no"], i["name"], i["filter"]) for i in imgs] == [
            (0, "/Im0", "/DCTDecode"), (0, "/Im1", "/FlateDecode"),
            (1, "/Im0", "/DCTDecode"), (2, "/Im0", "/FlateDecode"),
        ]
        assert all(i["pixels"] is not None for i in imgs)

    def test_image_mutation_fuzz_valueerror_only(self):
        from odin_rs_spark.sources.pdfcodec import (
            encode_pdf_with_images,
            parse_pdf_images,
        )

        smooth, _ = self._imgs()
        buf = encode_pdf_with_images([[(smooth, "jpeg"), (smooth, "flate")]])
        for off in range(0, len(buf), 23):
            m = bytearray(buf)
            m[off] ^= 0xFF
            try:
                parse_pdf_images(bytes(m))
            except ValueError:
                pass  # the only allowed failure mode
