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
Round 9 adds the other two OOXML members a real corpus has (VERDICT
r8 #4): XLSX spreadsheets (workbook → rels → worksheet walk, shared
strings, inline strings, numeric/boolean cells) and PPTX
presentations (per-slide <a:p> paragraphs of <a:t> runs).
Out of scope, documented: tables/headers/footnotes parts, tracked
changes, embedded media, XLSX number FORMATTING (values surface as
the raw <v> text — exact, not locale-rendered), charts/notes parts.
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


# -- XLSX (SpreadsheetML) ------------------------------------------------------

_SHEET_RE = re.compile(
    rb"<sheet [^>]*?name=\"([^\"]*)\"[^>]*?r:id=\"([^\"]*)\"[^>]*/>"
)
_REL_RE = re.compile(rb"<Relationship [^>]*?Id=\"([^\"]*)\"[^>]*?Target=\"([^\"]*)\"[^>]*/>")
_SI_RE = re.compile(rb"<si>(.*?)</si>", re.S)
_XT_RE = re.compile(rb"<t(?: [^>]*)?>(.*?)</t>", re.S)
# attribute ORDER is not fixed in SpreadsheetML (writers emit
# r/s/t in any order) — match the element, then pull attributes
# independently (round-9 self-review; the r-first pattern silently
# dropped <c s="1" r="A1" t="s"> cells)
_CELL_RE = re.compile(rb"<c ([^>]*?)(?:/>|>(.*?)</c>)", re.S)
_R_ATTR = re.compile(rb"r=\"([A-Z]+)(\d+)\"")
_T_ATTR = re.compile(rb"t=\"([a-zA-Z]+)\"")
_V_RE = re.compile(rb"<v>(.*?)</v>", re.S)


def _xml_text(b: bytes) -> str:
    for ent, rep in _XML_ENTITIES:
        b = b.replace(ent, rep)
    return b.decode("utf-8", "replace")


def _col_index(ref: bytes) -> int:
    """'A'→1, 'Z'→26, 'AA'→27 (bijective base-26)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ch - 64)
    return n


def parse_xlsx_cells(buf: bytes) -> list[dict]:
    """XLSX bytes → list of cell dicts {sheet_no, sheet, row, col,
    celltype, value} in workbook sheet order then document cell order.
    celltype is the resolved kind ('s' shared string, 'inlineStr',
    'str' formula string, 'b' boolean, 'n' numeric); value is the
    TEXT of the cell — shared/inline strings resolved, numerics as
    the raw <v> literal (exact, never locale-rendered). ValueError-
    only error contract."""
    try:
        return _parse_xlsx_cells(buf)
    except ValueError:
        raise
    except Exception as exc:  # BadZipFile, zlib.error, IndexError…
        raise ValueError(f"corrupt XLSX file: {exc}") from exc


def _parse_xlsx_cells(buf: bytes) -> list[dict]:
    try:
        zf = zipfile.ZipFile(io.BytesIO(buf))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"not an XLSX/ZIP file: {exc}") from exc
    try:
        wb = zf.read("xl/workbook.xml")
    except KeyError:
        raise ValueError("XLSX: missing xl/workbook.xml part")
    try:
        rels = zf.read("xl/_rels/workbook.xml.rels")
    except KeyError:
        raise ValueError("XLSX: missing workbook relationships part")
    rel_map = {rid: tgt for rid, tgt in _REL_RE.findall(rels)}
    # shared strings: one <si> per index; rich-text runs concatenate
    shared: list[str] = []
    try:
        sst = zf.read("xl/sharedStrings.xml")
    except KeyError:
        sst = b""
    for si in _SI_RE.finditer(sst):
        shared.append(
            "".join(_xml_text(t) for t in _XT_RE.findall(si.group(1)))
        )
    out: list[dict] = []
    for sheet_no, (name, rid) in enumerate(_SHEET_RE.findall(wb)):
        tgt = rel_map.get(rid)
        if tgt is None:
            raise ValueError(f"XLSX: sheet r:id {rid!r} has no relationship")
        # OPC targets are workbook-relative ('worksheets/sheet1.xml')
        # or package-absolute ('/xl/worksheets/sheet1.xml') — normalize
        # the leading '/' BEFORE testing the prefix, or absolute
        # targets double to 'xl/xl/…' (round-9 self-review)
        part = tgt.decode("ascii").lstrip("/")
        if not part.startswith("xl/"):
            part = "xl/" + part
        try:
            xml = zf.read(part)
        except KeyError:
            raise ValueError(f"XLSX: missing worksheet part {part}")
        sheet = _xml_text(name)
        for attrs, body in _CELL_RE.findall(xml):
            rm = _R_ATTR.search(attrs)
            if rm is None:
                continue  # positionless cells: documented seam
            colref, rowref = rm.group(1), rm.group(2)
            tm = _T_ATTR.search(attrs)
            typ = (tm.group(1) if tm else b"n").decode("ascii")
            if typ == "inlineStr":
                val = "".join(_xml_text(t) for t in _XT_RE.findall(body))
            else:
                vm = _V_RE.search(body)
                if vm is None:
                    continue  # empty cell (style-only)
                raw = vm.group(1)
                if typ == "s":
                    idx = int(raw)
                    if idx >= len(shared):
                        raise ValueError(
                            f"XLSX: shared-string index {idx} out of range"
                        )
                    val = shared[idx]
                else:  # 'n' numeric, 'str' formula string, 'b' boolean
                    val = _xml_text(raw)
            out.append(
                {
                    "sheet_no": sheet_no,
                    "sheet": sheet,
                    "row": int(rowref),
                    "col": _col_index(colref),
                    "celltype": typ,
                    "value": val,
                }
            )
    return out


def encode_xlsx(
    sheets: list[tuple[str, list[list[object]]]], compress: bool = True
) -> bytes:
    """Fixture twin of `parse_xlsx_cells`: a minimal but structurally
    real SpreadsheetML package. Cell values route by Python type:
    str → sharedStrings (deduplicated — repeated strings share one
    <si>, the layout the format exists for), bytes → inline string,
    bool → 'b' cell, int/float → numeric 'n' cell with the repr as
    the <v> literal. None leaves a gap (no <c> element)."""
    shared: list[str] = []
    sindex: dict[str, int] = {}

    def esc(s: str) -> bytes:
        b = s.encode("utf-8")
        for rep, ent in ((b"&", b"&amp;"), (b"<", b"&lt;"), (b">", b"&gt;")):
            b = b.replace(rep, ent)
        return b

    def colname(c: int) -> str:
        out = ""
        while c:
            c, r = divmod(c - 1, 26)
            out = chr(65 + r) + out
        return out

    sheet_xmls: list[bytes] = []
    for _, rows in sheets:
        body = [b"<worksheet><sheetData>"]
        for r, cells in enumerate(rows, start=1):
            body.append(f'<row r="{r}">'.encode())
            for c, v in enumerate(cells, start=1):
                if v is None:
                    continue
                ref = f"{colname(c)}{r}".encode()
                if isinstance(v, bool):
                    body.append(
                        b'<c r="' + ref + b'" t="b"><v>'
                        + (b"1" if v else b"0") + b"</v></c>"
                    )
                elif isinstance(v, str):
                    if v not in sindex:
                        sindex[v] = len(shared)
                        shared.append(v)
                    body.append(
                        b'<c r="' + ref + b'" t="s"><v>'
                        + str(sindex[v]).encode() + b"</v></c>"
                    )
                elif isinstance(v, bytes):  # inline string
                    body.append(
                        b'<c r="' + ref + b'" t="inlineStr"><is><t>'
                        + esc(v.decode("utf-8")) + b"</t></is></c>"
                    )
                else:  # int/float numeric
                    body.append(
                        b'<c r="' + ref + b'"><v>' + repr(v).encode()
                        + b"</v></c>"
                    )
            body.append(b"</row>")
        body.append(b"</sheetData></worksheet>")
        sheet_xmls.append(b"".join(body))

    wb = [b"<workbook><sheets>"]
    wb_rels = [
        b'<Relationships xmlns="http://schemas.openxmlformats.org/'
        b'package/2006/relationships">'
    ]
    for i, (name, _) in enumerate(sheets, start=1):
        wb.append(
            b'<sheet name="' + esc(name) + b'" sheetId="'
            + str(i).encode() + b'" r:id="rId' + str(i).encode() + b'"/>'
        )
        wb_rels.append(
            b'<Relationship Id="rId' + str(i).encode()
            + b'" Type="http://schemas.openxmlformats.org/officeDocument/'
            b'2006/relationships/worksheet" Target="worksheets/sheet'
            + str(i).encode() + b'.xml"/>'
        )
    wb.append(b"</sheets></workbook>")
    wb_rels.append(b"</Relationships>")
    sst = [
        f'<sst count="{len(shared)}" uniqueCount="{len(shared)}">'.encode()
    ]
    for s in shared:
        # one rich-text run keeps the run-concatenation path tested
        sst.append(b"<si><t>" + esc(s) + b"</t></si>")
    sst.append(b"</sst>")

    parts = [
        ("[Content_Types].xml", _CONTENT_TYPES_XLSX),
        ("_rels/.rels", _RELS_XLSX),
        ("xl/workbook.xml", b"".join(wb)),
        ("xl/_rels/workbook.xml.rels", b"".join(wb_rels)),
        ("xl/sharedStrings.xml", b"".join(sst)),
    ] + [
        (f"xl/worksheets/sheet{i}.xml", xml)
        for i, xml in enumerate(sheet_xmls, start=1)
    ]
    return _zip_package(parts, compress)


# -- PPTX (PresentationML) -----------------------------------------------------

_SLIDE_NAME_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")
_AP_RE = re.compile(rb"<a:p>(.*?)</a:p>|<a:p/>", re.S)
_AT_RE = re.compile(rb"<a:t>(.*?)</a:t>", re.S)


def parse_pptx_text(buf: bytes) -> list[str]:
    """PPTX bytes → per-slide text (slides in numeric part order;
    paragraphs joined with newlines, <a:t> runs concatenated).
    ValueError-only error contract."""
    try:
        return _parse_pptx_text(buf)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"corrupt PPTX file: {exc}") from exc


def _parse_pptx_text(buf: bytes) -> list[str]:
    try:
        zf = zipfile.ZipFile(io.BytesIO(buf))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"not a PPTX/ZIP file: {exc}") from exc
    slides = sorted(
        (
            (int(m.group(1)), n)
            for n in zf.namelist()
            if (m := _SLIDE_NAME_RE.match(n))
        ),
    )
    if not slides:
        raise ValueError("PPTX: no ppt/slides/slideN.xml parts")
    out: list[str] = []
    for _, name in slides:
        xml = zf.read(name)
        paras = []
        for pm in _AP_RE.finditer(xml):
            body = pm.group(1) or b""
            paras.append(
                "".join(_xml_text(t) for t in _AT_RE.findall(body))
            )
        out.append("\n".join(paras))
    return out


def encode_pptx(slides: list[list[str]], compress: bool = True) -> bytes:
    """Fixture twin of `parse_pptx_text`: one slide part per entry,
    each paragraph an <a:p> whose text splits across two <a:t> runs
    (run concatenation on the tested path)."""
    def esc(s: str) -> bytes:
        b = s.encode("utf-8")
        for rep, ent in ((b"&", b"&amp;"), (b"<", b"&lt;"), (b">", b"&gt;")):
            b = b.replace(rep, ent)
        return b

    parts = [
        ("[Content_Types].xml", _CONTENT_TYPES_PPTX),
        ("_rels/.rels", _RELS_PPTX),
    ]
    for i, paras in enumerate(slides, start=1):
        body = [
            b'<p:sld xmlns:p="http://schemas.openxmlformats.org/'
            b'presentationml/2006/main" xmlns:a="http://schemas.'
            b'openxmlformats.org/drawingml/2006/main"><p:cSld>'
        ]
        for p in paras:
            mid = len(p) // 2
            body.append(
                b"<a:p><a:r><a:t>" + esc(p[:mid]) + b"</a:t></a:r>"
                b"<a:r><a:t>" + esc(p[mid:]) + b"</a:t></a:r></a:p>"
            )
        body.append(b"</p:cSld></p:sld>")
        parts.append((f"ppt/slides/slide{i}.xml", b"".join(body)))
    return _zip_package(parts, compress)


_CONTENT_TYPES_XLSX = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    b'<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    b'<Default Extension="xml" ContentType="application/xml"/>'
    b'<Override PartName="/xl/workbook.xml" ContentType='
    b'"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    b"</Types>"
)

_RELS_XLSX = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    b'<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    b'<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    b'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    b"</Relationships>"
)

_CONTENT_TYPES_PPTX = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    b'<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    b'<Default Extension="xml" ContentType="application/xml"/>'
    b'<Override PartName="/ppt/presentation.xml" ContentType='
    b'"application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
    b"</Types>"
)

_RELS_PPTX = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    b'<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    b'<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    b'officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>'
    b"</Relationships>"
)


def _zip_package(parts: list[tuple[str, bytes]], compress: bool) -> bytes:
    """Byte-stable ZIP package (fixed date_time) — shared by the three
    OOXML fixture twins."""
    out = io.BytesIO()
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(out, "w", comp) as zf:
        for name, data in parts:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = comp
            zf.writestr(zi, data)
    return out.getvalue()


XLSX_SCHEMA = (
    "file string, sheet_no int, sheet string, row int, col int, "
    "celltype string, value string"
)


def xlsx_cells(files_df, on_error: str = "raise"):
    """`binaryFile` rows → one row per spreadsheet cell — the
    warc_records/pdf_pages pattern for the spreadsheet modality.
    Workbook bytes never shuffle; the ZIP walk and regex scans run
    inside one mapInPandas pass."""
    import os

    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        for pdf in batches:
            rows = {
                "file": [], "sheet_no": [], "sheet": [], "row": [],
                "col": [], "celltype": [], "value": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    cells = parse_xlsx_cells(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                base = os.path.basename(path)
                for c in cells:
                    rows["file"].append(base)
                    rows["sheet_no"].append(c["sheet_no"])
                    rows["sheet"].append(c["sheet"])
                    rows["row"].append(c["row"])
                    rows["col"].append(c["col"])
                    rows["celltype"].append(c["celltype"])
                    rows["value"].append(c["value"])
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, XLSX_SCHEMA)


PPTX_SCHEMA = (
    "file string, slide_no int, n_slides int, text string, n_chars int"
)


def pptx_slides(files_df, on_error: str = "raise"):
    """`binaryFile` rows → one row per slide (the docx_paragraphs
    pattern for presentations)."""
    import os

    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        for pdf in batches:
            rows = {
                "file": [], "slide_no": [], "n_slides": [],
                "text": [], "n_chars": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    slides = parse_pptx_text(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                base = os.path.basename(path)
                for sno, text in enumerate(slides):
                    rows["file"].append(base)
                    rows["slide_no"].append(sno)
                    rows["n_slides"].append(len(slides))
                    rows["text"].append(text)
                    rows["n_chars"].append(len(text))
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, PPTX_SCHEMA)


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
