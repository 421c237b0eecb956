"""Pure-stdlib PDF text extraction (ISO 32000-1 / PDF 1.4 subset) —
the one major corpus modality with no decode path until r8 (VERDICT
r7 stretch item): a real document-structure walk (trailer → /Root →
/Pages → /Kids → per-page /Contents), FlateDecode stream decoding,
and a content-stream tokenizer that extracts the text-showing
operators (Tj, ', ", TJ arrays) with full literal-string escape
handling (\\( \\) \\\\ \\n \\r \\t octal) and hex strings.

Like the repo's other wire codecs (netcdf3/grib2/warc/jpeg), this is
spec-built and fixture-twinned: `encode_pdf` writes minimal but
structurally real PDFs (xref table, object graph, Flate or identity
content streams, both literal and hex string forms) whose text the
extraction must round-trip byte-exactly.

Scope (errors name anything else): classic cross-reference tables or
a scannable object graph (the parser indexes `N 0 obj` directly and
never consumes xref, so xref-stream/linearized files parse too),
object streams (/ObjStm — the compressed-object containers every
modern PDF writer emits; their members are parsed out of the decoded
stream via the N/First pair header), FlateDecode or identity content
streams, literal/hex strings. Out of scope, documented: encryption,
CID/Type0 composite-font byte mapping (text shows as the raw bytes
decode), DCT-in-PDF images (q176's decoder exists — wiring it is a
seam, not a text concern).

Scale shape (`pdf_pages`): binaryFile scan → mapInPandas decode →
one row per page; document bytes never shuffle; zlib does the heavy
lifting at C speed.
"""

from __future__ import annotations

import re
import zlib

# -- object-level tokenizer --------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Tok:
    """Minimal PDF object reader over a bytes buffer: names, numbers,
    strings, arrays, dicts, refs, booleans/null — enough to walk the
    page tree."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos

    def _skip_ws(self) -> None:
        while self.p < len(self.d):
            c = self.d[self.p : self.p + 1]
            if c in (b"%",):  # comment to EOL
                nl = self.d.find(b"\n", self.p)
                self.p = len(self.d) if nl < 0 else nl + 1
            elif c in _WS:
                self.p += 1
            else:
                return

    def value(self):
        self._skip_ws()
        d, p = self.d, self.p
        c = d[p : p + 1]
        if c == b"<":
            if d[p + 1 : p + 2] == b"<":
                return self._dict()
            return self._hex_string()
        if c == b"(":
            return self._lit_string()
        if c == b"/":
            return self._name()
        if c == b"[":
            return self._array()
        m = re.match(rb"[+-]?\d+\s+\d+\s+R\b", d[p:])
        if m:  # indirect reference
            num = int(m.group(0).split()[0])
            self.p += m.end()
            return ("ref", num)
        m = re.match(rb"[+-]?(?:\d+\.?\d*|\.\d+)", d[p:])
        if m:
            tok = m.group(0)
            self.p += m.end()
            return float(tok) if b"." in tok else int(tok)
        for kw, v in ((b"true", True), (b"false", False), (b"null", None)):
            if d[p : p + len(kw)] == kw:
                self.p += len(kw)
                return v
        raise ValueError(f"PDF: unparseable token at byte {p}: {d[p:p+20]!r}")

    def _name(self) -> str:
        p = self.p + 1
        d = self.d
        out = bytearray()
        while p < len(d) and d[p : p + 1] not in _WS and d[p : p + 1] not in _DELIM:
            if d[p : p + 1] == b"#":  # #xx hex escape in names
                out.append(int(d[p + 1 : p + 3], 16))
                p += 3
            else:
                out.append(d[p])
                p += 1
        self.p = p
        return "/" + out.decode("latin-1")

    def _array(self) -> list:
        self.p += 1
        out = []
        while True:
            self._skip_ws()
            if self.d[self.p : self.p + 1] == b"]":
                self.p += 1
                return out
            out.append(self.value())

    def _dict(self) -> dict:
        self.p += 2
        out = {}
        while True:
            self._skip_ws()
            if self.d[self.p : self.p + 2] == b">>":
                self.p += 2
                return out
            key = self.value()
            if not isinstance(key, str) or not key.startswith("/"):
                raise ValueError("PDF: dictionary key is not a name")
            out[key] = self.value()

    _ESC = {
        b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\x0c",
        b"(": b"(", b")": b")", b"\\": b"\\",
    }

    def _lit_string(self) -> bytes:
        d = self.d
        p = self.p + 1
        depth = 1
        out = bytearray()
        while p < len(d):
            c = d[p : p + 1]
            if c == b"\\":
                nxt = d[p + 1 : p + 2]
                if nxt in self._ESC:
                    out += self._ESC[nxt]
                    p += 2
                elif nxt.isdigit():  # octal \d{1,3}
                    m = re.match(rb"[0-7]{1,3}", d[p + 1 : p + 4])
                    out.append(int(m.group(0), 8) & 0xFF)
                    p += 1 + m.end()
                elif nxt in (b"\n", b"\r"):  # line continuation
                    p += 2
                else:  # unknown escape: the char stands alone
                    out += nxt
                    p += 2
            elif c == b"(":
                depth += 1
                out += c
                p += 1
            elif c == b")":
                depth -= 1
                if depth == 0:
                    self.p = p + 1
                    return bytes(out)
                out += c
                p += 1
            else:
                out += c
                p += 1
        raise ValueError("PDF: unterminated literal string")

    def _hex_string(self) -> bytes:
        end = self.d.find(b">", self.p)
        if end < 0:
            raise ValueError("PDF: unterminated hex string")
        hx = re.sub(rb"\s", b"", self.d[self.p + 1 : end])
        if len(hx) % 2:  # odd count: trailing 0 implied (§7.3.4.3)
            hx += b"0"
        self.p = end + 1
        return bytes.fromhex(hx.decode("ascii"))


# -- document walk ------------------------------------------------------------


def _index_objects(buf: bytes) -> dict[int, int]:
    """Object number → byte offset of its body (after 'N G obj').
    Directly indexing the markers keeps xref-stream and linearized
    files parseable without consuming any xref. First occurrence wins:
    compressed stream bytes can coincidentally contain an 'N 0 obj'
    pattern, and the real declaration of an object precedes any
    stream that could echo its number."""
    out = {}
    for m in _OBJ_RE.finditer(buf):
        out.setdefault(int(m.group(1)), m.end())
    if not out:
        raise ValueError("PDF: no indirect objects found")
    return out


def _expand_objstms(buf: bytes, index: dict[int, int]) -> dict[int, object]:
    """Parse every /Type /ObjStm object stream (ISO 32000 §7.5.7) into
    {member object number: parsed value}: the decoded stream opens
    with /N (num, offset) integer pairs, member bodies start at
    /First + offset. Streams cannot nest inside ObjStm, so members
    are plain values."""
    out: dict[int, object] = {}
    for pos in index.values():
        t = _Tok(buf, pos)
        try:
            d = t.value()
        except ValueError:
            continue  # non-dict or exotic object: not an ObjStm
        if not (isinstance(d, dict) and d.get("/Type") == "/ObjStm"):
            continue
        data = _stream_bytes(buf, t, d, index)
        n = d.get("/N")
        first = d.get("/First")
        if not isinstance(n, int) or not isinstance(first, int):
            raise ValueError("PDF: ObjStm without integer /N and /First")
        head = _Tok(data, 0)
        pairs = []
        for _ in range(n):
            onum = head.value()
            ooff = head.value()
            if not isinstance(onum, int) or not isinstance(ooff, int):
                raise ValueError("PDF: malformed ObjStm pair table")
            pairs.append((onum, ooff))
        for onum, ooff in pairs:
            out[onum] = _Tok(data, first + ooff).value()
    return out


def _get_obj(buf: bytes, index: dict[int, int], num: int, extra=None):
    """Object by number → (tokenizer-or-None, value): direct objects
    return their tokenizer (positioned for _stream_bytes); ObjStm
    members come preparsed with no tokenizer (streams cannot live
    inside an ObjStm)."""
    if num in index:
        t = _Tok(buf, index[num])
        return t, t.value()
    if extra is not None and num in extra:
        return None, extra[num]
    raise ValueError(f"PDF: missing object {num}")


def _resolve(buf, index, v, extra=None):
    while isinstance(v, tuple) and v and v[0] == "ref":
        _, v = _get_obj(buf, index, v[1], extra)
    return v


def _stream_bytes(buf: bytes, tok: _Tok, d: dict, index: dict) -> bytes:
    """Stream payload after a stream object's dict, filters applied."""
    # tok.p sits right after the dict; skip whitespace to 'stream'.
    # Bound the scan: at EOF buf[p:p+1] is b'', and `b'' in _WS` is
    # TRUE (empty substring) — unbounded, this loop spins forever on
    # truncated files (fuzzer-caught).
    p = tok.p
    while p < len(buf) and buf[p] in _WS:
        p += 1
    if buf[p : p + 6] != b"stream":
        raise ValueError("PDF: stream keyword missing after dict")
    p += 6
    if buf[p : p + 2] == b"\r\n":
        p += 2
    elif buf[p : p + 1] in (b"\n", b"\r"):
        p += 1
    length = _resolve(buf, index, d.get("/Length"))
    if not isinstance(length, int):
        raise ValueError("PDF: stream without integer /Length")
    raw = buf[p : p + length]
    if len(raw) < length:
        raise ValueError("PDF: stream runs past end of file")
    filt = d.get("/Filter")
    filts = [filt] if isinstance(filt, str) else (filt or [])
    for f in filts:
        if f == "/FlateDecode":
            try:
                raw = zlib.decompress(raw)
            except zlib.error as exc:
                raise ValueError(f"PDF: bad Flate stream: {exc}") from exc
        else:
            raise ValueError(f"PDF: filter {f} unsupported")
    return raw


_TEXT_OPS = re.compile(
    rb"""\((?:[^()\\]|\\.|\((?:[^()\\]|\\.)*\))*\)   # literal string
       | <[0-9A-Fa-f\s]*>                            # hex string
       | \[ | \]
       | /[^\s()<>\[\]{}/%]*                         # name
       | [+-]?(?:\d+\.?\d*|\.\d+)                    # number
       | [A-Za-z'"*]+                                # operator
    """,
    re.VERBOSE | re.DOTALL,  # strings may contain raw newlines
)


def _extract_text(content: bytes) -> str:
    """Text-showing operators of one content stream → text. Tj/'/"
    show one string; TJ shows its array's strings (kerning numbers
    ignored); T*, TD, Td and ' start a new line; ET closes a block.
    Strings decode latin-1 (simple fonts; CID byte mapping is a
    documented seam)."""
    out: list[str] = []
    stack: list[bytes] = []  # decoded STRINGS since the last operator
    line_open = False

    def endline() -> None:
        nonlocal line_open
        if line_open:
            out.append("\n")
            line_open = False

    for m in _TEXT_OPS.finditer(content):
        tok = m.group(0)
        c = tok[:1]
        if c == b"(" or c == b"<":
            stack.append(_Tok(tok).value())
        elif c in b"[]/" or c in b"+-0123456789.":
            pass  # operands the text ops ignore (kerning, names, brackets)
        else:
            op = tok
            if op in (b"Tj", b"'", b'"'):
                if op != b"Tj":
                    endline()
                if stack:
                    out.append(stack[-1].decode("latin-1"))
                    line_open = True
            elif op == b"TJ":
                for v in stack:
                    out.append(v.decode("latin-1"))
                    line_open = True
            elif op in (b"Td", b"TD", b"T*"):
                endline()
            elif op == b"ET":
                endline()
            stack = []
    return "".join(out).rstrip("\n")


def parse_pdf_text(buf: bytes) -> list[str]:
    """PDF bytes → per-page extracted text, in page-tree order."""
    try:
        return _parse_pdf_text(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct/regex/zlib edge cases
        raise ValueError(f"corrupt PDF file: {exc}") from exc


def _parse_pdf_text(buf: bytes) -> list[str]:
    if not buf.startswith(b"%PDF-"):
        raise ValueError("not a PDF file (no %PDF header)")
    index = _index_objects(buf)
    extra = _expand_objstms(buf, index)

    # trailer → /Root; fall back to scanning for the /Catalog object
    root = None
    tpos = buf.rfind(b"trailer")
    if tpos >= 0:
        t = _Tok(buf, tpos + 7)
        try:
            root = t.value().get("/Root")
        except ValueError:
            root = None
    if root is None:
        for num in list(index) + list(extra):
            _, v = _get_obj(buf, index, num, extra)
            if isinstance(v, dict) and v.get("/Type") == "/Catalog":
                root = ("ref", num)
                break
    if root is None:
        raise ValueError("PDF: no document catalog")
    cat = _resolve(buf, index, root, extra)

    pages: list[str] = []

    def walk(node_ref) -> None:
        node = _resolve(buf, index, node_ref, extra)
        if not isinstance(node, dict):
            raise ValueError("PDF: page-tree node is not a dictionary")
        if node.get("/Type") == "/Pages" or "/Kids" in node:
            for kid in _resolve(buf, index, node.get("/Kids", []), extra):
                walk(kid)
            return
        # a /Page leaf: contents may be one stream or an array
        contents = node.get("/Contents")
        if contents is None:
            pages.append("")
            return
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for r in refs:
            if not (isinstance(r, tuple) and r[0] == "ref"):
                raise ValueError("PDF: /Contents entry is not a reference")
            tok, d = _get_obj(buf, index, r[1], extra)
            if tok is None or not isinstance(d, dict):
                raise ValueError("PDF: content object is not a direct stream")
            parts.append(_stream_bytes(buf, tok, d, index))
        pages.append(_extract_text(b"\n".join(parts)))

    walk(cat.get("/Pages"))
    return pages


# -- fixture twin -------------------------------------------------------------


def encode_pdf(
    pages: list[list[str]], compress: bool = True, use_objstm: bool = False
) -> bytes:
    """Fixture twin of `parse_pdf_text`: a minimal but structurally
    REAL PDF — header, catalog, page tree, one content stream per
    page (FlateDecode when `compress`), xref table, trailer. Each page
    is a list of text lines; EVEN lines emit as literal strings via
    Tj (parens/backslashes escaped), ODD lines as hex strings via a
    TJ array — both string forms stay on the tested path.

    `use_objstm=True` packs the catalog, page tree, font and page
    dictionaries into ONE Flate-compressed /ObjStm (the modern-writer
    layout, PDF 1.5+); content streams stay direct (streams cannot
    live inside an ObjStm). The classic xref then lists the member
    objects as free entries — a real 1.5 file would use an xref
    STREAM for its type-2 entries, but this parser never consumes
    xref (documented), so the fixture keeps the human-readable
    table."""
    objs: list[bytes] = []

    def content(lines: list[str]) -> bytes:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append(b"0 -14 Td")
            b = line.encode("latin-1")
            if i % 2 == 0:
                esc = b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
                ops.append(b"(" + esc + b") Tj")
            else:
                ops.append(b"[<" + b.hex().encode() + b"> 120] TJ")
        ops.append(b"ET")
        return b"\n".join(ops)

    def stream_obj(data: bytes, extra_dict: bytes = b"") -> bytes:
        if compress:
            data = zlib.compress(data, 9)
            filt = b"/Filter /FlateDecode "
        else:
            filt = b""
        return (
            b"<< " + extra_dict + filt + f"/Length {len(data)} >>".encode()
            + b"\nstream\n" + data + b"\nendstream"
        )

    n_pages = len(pages)
    if not use_objstm:
        # object layout: 1 catalog, 2 pages node, 3 font,
        # then per page i: (4+2i) page dict, (5+2i) content stream
        kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
        objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
        objs.append(
            f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>".encode()
        )
        objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        for i, lines in enumerate(pages):
            objs.append(
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Resources << /Font << /F1 3 0 R >> >> "
                    f"/Contents {5 + 2 * i} 0 R >>"
                ).encode()
            )
            objs.append(stream_obj(content(lines)))
        numbered = list(enumerate(objs, start=1))
    else:
        # members 1..3+n in ONE ObjStm; content streams (4+n..3+2n)
        # and the ObjStm itself (4+2n) stay direct
        kids = " ".join(f"{4 + i} 0 R" for i in range(n_pages))
        members: list[tuple[int, bytes]] = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>".encode()),
            (3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        ]
        for i in range(n_pages):
            members.append(
                (
                    4 + i,
                    (
                        f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                        f"/Resources << /Font << /F1 3 0 R >> >> "
                        f"/Contents {4 + n_pages + i} 0 R >>"
                    ).encode(),
                )
            )
        bodies = b""
        pair_hdr = []
        for num, body in members:
            pair_hdr.append(f"{num} {len(bodies)}")
            bodies += body + b"\n"
        header = (" ".join(pair_hdr)).encode() + b"\n"
        stm = header + bodies
        numbered = []
        for i, lines in enumerate(pages):
            numbered.append((4 + n_pages + i, stream_obj(content(lines))))
        numbered.append(
            (
                4 + n_pages * 2,
                stream_obj(
                    stm,
                    f"/Type /ObjStm /N {len(members)} "
                    f"/First {len(header)} ".encode(),
                ),
            )
        )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n" if use_objstm else b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    size = max(num for num, _ in numbered) + 1
    offsets = {0: None}
    for num, body in numbered:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        if num in offsets and offsets[num] is not None:
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        else:  # ObjStm member (type-2 in a real xref stream) or gap
            out += b"0000000000 00000 f \n"
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


# -- Spark operator -----------------------------------------------------------

PDF_PAGES_SCHEMA = (
    "file string, page_no int, n_pages int, text string, n_chars int"
)


def pdf_pages(files_df, on_error: str = "raise"):
    """`spark.read.format("binaryFile")` rows → one row per PDF page
    with its extracted text — the corpus-ingest twin of `warc_records`
    for the PDF modality. Document bytes never shuffle; rows-out =
    pages-in."""
    import os

    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        for pdf in batches:
            rows = {
                "file": [], "page_no": [], "n_pages": [],
                "text": [], "n_chars": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    pages = parse_pdf_text(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                base = os.path.basename(path)
                for pno, text in enumerate(pages):
                    rows["file"].append(base)
                    rows["page_no"].append(pno)
                    rows["n_pages"].append(len(pages))
                    rows["text"].append(text)
                    rows["n_chars"].append(len(text))
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, PDF_PAGES_SCHEMA)
