"""DOCX text extraction (ECMA-376 Office Open XML / ISO 29500 — the
office-document corpus modality next to PDF): a .docx file is a ZIP
package whose `word/document.xml` part carries paragraphs as
`<w:p>` elements with text runs in `<w:t>` leaves. The stdlib
zipfile module reads the container; the XML is walked with the same
dialect-portable regexes as the HTML family (no backreferences, so
the oracle side could replay them in RE2 if it ever needed to — the
catalog oracle derives text analytically instead).

Like the repo's other codecs: spec-driven, fixture-twinned
(`encode_docx` writes a minimal but structurally real package —
[Content_Types].xml, _rels, document part), ValueError-only error
contract.

Scope: paragraph text (runs concatenated in document order, tabs and
line breaks from <w:tab/>/<w:br/>), with XML entities decoded.
Out of scope, documented: tables/headers/footnotes parts, tracked
changes, embedded media (each is a further part in the same ZIP —
the container walk generalizes).
"""

from __future__ import annotations

import io
import re
import zipfile

_P_RE = re.compile(rb"<w:p[ >].*?</w:p>|<w:p/>", re.S)
_T_RE = re.compile(rb"<w:t(?: [^>]*)?>(.*?)</w:t>|<w:tab/>|<w:br/>", re.S)

_XML_ENTITIES = (
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&apos;", b"'"),
    (b"&amp;", b"&"),  # last, so it cannot resurrect others
)


def parse_docx_text(buf: bytes) -> list[str]:
    """DOCX bytes → list of paragraph texts, in document order.
    ValueError-only error contract (zipfile raises BadZipFile,
    zlib.error or EOFError on corrupt members — all wrapped)."""
    try:
        return _parse_docx_text(buf)
    except ValueError:
        raise
    except Exception as exc:  # BadZipFile, zlib.error, EOFError…
        raise ValueError(f"corrupt DOCX file: {exc}") from exc


def _parse_docx_text(buf: bytes) -> list[str]:
    try:
        zf = zipfile.ZipFile(io.BytesIO(buf))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"not a DOCX/ZIP file: {exc}") from exc
    try:
        xml = zf.read("word/document.xml")
    except KeyError:
        raise ValueError("DOCX: missing word/document.xml part")
    paras: list[str] = []
    for pm in _P_RE.finditer(xml):
        parts: list[bytes] = []
        for tm in _T_RE.finditer(pm.group(0)):
            tok = tm.group(0)
            if tok == b"<w:tab/>":
                parts.append(b"\t")
            elif tok == b"<w:br/>":
                parts.append(b"\n")
            else:
                t = tm.group(1)
                for ent, rep in _XML_ENTITIES:
                    t = t.replace(ent, rep)
                parts.append(t)
        paras.append(b"".join(parts).decode("utf-8", "replace"))
    return paras


_CONTENT_TYPES = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    b'<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    b'<Default Extension="xml" ContentType="application/xml"/>'
    b'<Override PartName="/word/document.xml" ContentType='
    b'"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    b"</Types>"
)

_RELS = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    b'<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    b'<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    b'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    b"</Relationships>"
)


def encode_docx(paragraphs: list[str], compress: bool = True) -> bytes:
    """Fixture twin of `parse_docx_text`: a minimal but structurally
    real OOXML package ([Content_Types].xml, _rels/.rels,
    word/document.xml), one <w:p> per paragraph with the text split
    into two <w:r> runs (so run concatenation stays on the tested
    path) and XML specials escaped."""
    body = [
        b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        b'<w:document xmlns:w="http://schemas.openxmlformats.org/'
        b'wordprocessingml/2006/main"><w:body>'
    ]
    def esc(s: str) -> bytes:
        b = s.encode("utf-8")
        for rep, ent in (
            (b"&", b"&amp;"), (b"<", b"&lt;"), (b">", b"&gt;"),
        ):
            b = b.replace(rep, ent)
        return b

    for p in paragraphs:
        # split BEFORE escaping so an entity can never straddle runs
        mid = len(p) // 2
        r1, r2 = esc(p[:mid]), esc(p[mid:])
        body.append(
            b"<w:p><w:r><w:t xml:space=\"preserve\">" + r1
            + b"</w:t></w:r><w:r><w:t xml:space=\"preserve\">" + r2
            + b"</w:t></w:r></w:p>"
        )
    body.append(b"</w:body></w:document>")
    out = io.BytesIO()
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(out, "w", comp) as zf:
        # fixed date_time keeps fixtures byte-stable
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _RELS),
            ("word/document.xml", b"".join(body)),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = comp
            zf.writestr(zi, data)
    return out.getvalue()


DOCX_SCHEMA = "file string, para_no int, n_paras int, text string, n_chars int"


def docx_paragraphs(files_df, on_error: str = "raise"):
    """`binaryFile` rows → one row per DOCX paragraph — the
    warc_records/pdf_pages pattern for the office modality. Document
    bytes never shuffle; zlib does the decompression at C speed."""
    import os

    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        for pdf in batches:
            rows = {
                "file": [], "para_no": [], "n_paras": [],
                "text": [], "n_chars": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    paras = parse_docx_text(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                base = os.path.basename(path)
                for pno, text in enumerate(paras):
                    rows["file"].append(base)
                    rows["para_no"].append(pno)
                    rows["n_paras"].append(len(paras))
                    rows["text"].append(text)
                    rows["n_chars"].append(len(text))
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, DOCX_SCHEMA)
