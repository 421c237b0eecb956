"""DOCX text extraction (sources/officedoc): OOXML package walk,
run concatenation, XML entities, tab/break runs, the Spark per-
paragraph operator."""

from __future__ import annotations

import io
import zipfile

import pytest

from odin_rs_spark.sources.officedoc import (
    docx_paragraphs,
    encode_docx,
    parse_docx_text,
)

PARAS = ["Hello world & <tags> stay", "second paragraph", "", "café ’quotes’"]


def test_roundtrip_deflate_and_stored():
    for compress in (True, False):
        buf = encode_docx(PARAS, compress=compress)
        assert buf[:2] == b"PK"
        assert parse_docx_text(buf) == PARAS
        # byte-stable fixture twin (fixed ZIP timestamps)
        assert encode_docx(PARAS, compress=compress) == buf


def test_runs_tabs_and_breaks():
    """Text split across runs concatenates; <w:tab/> and <w:br/>
    contribute whitespace; empty <w:p/> yields an empty paragraph."""
    xml = (
        b'<?xml version="1.0"?><w:document xmlns:w="x"><w:body>'
        b"<w:p><w:r><w:t>a</w:t></w:r><w:tab/><w:r><w:t>b</w:t></w:r>"
        b"<w:br/><w:r><w:t>c</w:t></w:r></w:p>"
        b"<w:p/>"
        b"<w:p><w:r><w:t>&amp;lt; stays &amp; &lt;go&gt;</w:t></w:r></w:p>"
        b"</w:body></w:document>"
    )
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        zf.writestr("word/document.xml", xml)
    got = parse_docx_text(out.getvalue())
    # &amp; decodes LAST: '&amp;lt;' is the literal text '&lt;'
    assert got == ["a\tb\nc", "", "&lt; stays & <go>"]


def test_errors_named():
    with pytest.raises(ValueError, match="not a DOCX/ZIP"):
        parse_docx_text(b"plainly not a zip")
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        zf.writestr("other.txt", "x")
    with pytest.raises(ValueError, match="missing word/document.xml"):
        parse_docx_text(out.getvalue())


def test_docx_paragraphs_spark(spark, tmp_path):
    a = tmp_path / "a.docx"
    a.write_bytes(encode_docx(["first para", "second"]))
    bad = tmp_path / "b.docx"
    bad.write_bytes(b"PK\x03\x04 truncated garbage")
    files = spark.read.format("binaryFile").load(str(a))
    rows = sorted(docx_paragraphs(files).collect(), key=lambda r: r.para_no)
    assert [(r.para_no, r.n_paras, r.text, r.n_chars) for r in rows] == [
        (0, 2, "first para", 10),
        (1, 2, "second", 6),
    ]
    both = spark.read.format("binaryFile").load([str(a), str(bad)])
    kept = docx_paragraphs(both, on_error="skip").collect()
    assert {r.file for r in kept} == {"a.docx"}
    with pytest.raises(Exception):
        docx_paragraphs(both).collect()


def test_xlsx_roundtrip_and_shared_string_dedupe():
    """Repeated strings must share ONE <si> (the layout the format
    exists for) and resolve back by index; numeric cells surface the
    raw <v> literal; None leaves a gap."""
    from odin_rs_spark.sources.officedoc import encode_xlsx, parse_xlsx_cells

    wb = encode_xlsx(
        [
            ("Data & Co", [["dup", "u<q", None], [7, 2.5, "dup"]]),
            ("S2", [[b"inline & x", True, False]]),
        ]
    )
    import io
    import zipfile

    sst = zipfile.ZipFile(io.BytesIO(wb)).read("xl/sharedStrings.xml")
    assert sst.count(b"<si>") == 2  # 'dup' stored once
    cells = parse_xlsx_cells(wb)
    got = {(c["sheet"], c["row"], c["col"]): (c["celltype"], c["value"]) for c in cells}
    assert got[("Data & Co", 1, 1)] == ("s", "dup")
    assert got[("Data & Co", 1, 2)] == ("s", "u<q")
    assert ("Data & Co", 1, 3) not in got  # the None gap
    assert got[("Data & Co", 2, 1)] == ("n", "7")
    assert got[("Data & Co", 2, 2)] == ("n", "2.5")
    assert got[("Data & Co", 2, 3)] == ("s", "dup")
    assert got[("S2", 1, 1)] == ("inlineStr", "inline & x")
    assert got[("S2", 1, 2)] == ("b", "1")
    assert got[("S2", 1, 3)] == ("b", "0")
    # sheet order follows the workbook, resolved THROUGH the rels part
    assert [c["sheet_no"] for c in cells] == sorted(c["sheet_no"] for c in cells)


def test_xlsx_col_index_and_errors():
    from odin_rs_spark.sources.officedoc import _col_index, parse_xlsx_cells

    assert _col_index(b"A") == 1
    assert _col_index(b"Z") == 26
    assert _col_index(b"AA") == 27
    assert _col_index(b"BC") == 55
    with pytest.raises(ValueError, match="not an XLSX/ZIP"):
        parse_xlsx_cells(b"nope")
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.xml", b"<x/>")
    with pytest.raises(ValueError, match="missing xl/workbook.xml"):
        parse_xlsx_cells(buf.getvalue())


def test_pptx_roundtrip_and_slide_order():
    """Slides come back in NUMERIC part order (slide10 after slide9,
    not lexicographic); paragraphs join with newlines; entities
    decode."""
    from odin_rs_spark.sources.officedoc import encode_pptx, parse_pptx_text

    slides = [[f"slide {i} title", "b & <t>"] for i in range(11)]
    pp = encode_pptx(slides)
    got = parse_pptx_text(pp)
    assert len(got) == 11
    assert got[9] == "slide 9 title\nb & <t>"
    assert got[10] == "slide 10 title\nb & <t>"
    with pytest.raises(ValueError, match="no ppt/slides"):
        from odin_rs_spark.sources.officedoc import encode_docx

        parse_pptx_text(encode_docx(["x"]))
