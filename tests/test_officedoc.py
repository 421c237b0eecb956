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
