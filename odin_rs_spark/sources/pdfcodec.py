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
streams, literal/hex strings, SIMPLE-FONT decoding (round 9:
/Encoding names, /Differences via an AGL subset, /ToUnicode CMaps),
CID/Type0 Identity-H composite fonts through their wide /ToUnicode
(round 9 — 2-byte glyph codes; a Type0 with no CMap decodes as
replacement characters, the honest answer for raw subset glyph ids),
and the document-information dictionary (§14.3.3). Out of scope,
documented: encryption, non-Identity CID encodings (predefined CMaps
like UniJIS would need the CMap resource files). Image XObjects
decode as of r11 (`parse_pdf_images`/`pdf_images`): /DCTDecode
payloads through the in-repo JPEG decoder, /FlateDecode 8-bit
DeviceGray/DeviceRGB rasters directly; other image filters surface
undecoded with the filter named.

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
    files parseable without consuming any xref. First PARSEABLE
    occurrence wins (ADVICE r8): compressed stream bytes can
    coincidentally spell 'N G obj' — and can do so BEFORE the real
    declaration when a Flate stream of a lower-numbered object
    precedes it — so each candidate offset is confirmed by actually
    tokenizing a value there, falling back to the next occurrence on
    failure (and to the first if none confirms, so error surfaces
    stay unchanged)."""
    occ: dict[int, list[int]] = {}
    for m in _OBJ_RE.finditer(buf):
        occ.setdefault(int(m.group(1)), []).append(m.end())
    if not occ:
        raise ValueError("PDF: no indirect objects found")
    out = {}
    for num, offs in occ.items():
        pick = offs[0]
        for off in offs:
            try:
                _Tok(buf, off).value()
            except ValueError:
                continue
            pick = off
            break
        out[num] = pick
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


def _raw_stream_bytes(buf: bytes, tok: _Tok, d: dict, index: dict) -> bytes:
    """Stream payload after a stream object's dict, filters NOT
    applied (the /DCTDecode image path wants the raw JPEG bytes)."""
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
    return raw


def _stream_bytes(buf: bytes, tok: _Tok, d: dict, index: dict) -> bytes:
    """Stream payload after a stream object's dict, filters applied."""
    raw = _raw_stream_bytes(buf, tok, d, index)
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


# -- simple-font decoding (ISO 32000 §9.6.6, §9.10.3) -------------------------
#
# Real PDFs rarely show latin-1 bytes: glyph codes route through the
# font's /Encoding (base encoding + /Differences remaps) and, when
# present, a /ToUnicode CMap (bfchar/bfrange pairs in UTF-16BE). A
# subset-font document extracts as mojibake without this walk — the
# largest gap between "parses fixtures" and "parses the web's PDFs"
# (round-8 verdict #3).

# Adobe Glyph List subset — the names a Differences array actually
# uses in crawled documents (AGL is public: github.com/adobe-type-
# tools/agl-aglfn). uniXXXX / uXXXX(XX) forms parse programmatically.
_AGL = {
    "space": 0x20, "exclam": 0x21, "quotedbl": 0x22, "numbersign": 0x23,
    "dollar": 0x24, "percent": 0x25, "ampersand": 0x26, "quotesingle": 0x27,
    "parenleft": 0x28, "parenright": 0x29, "asterisk": 0x2A, "plus": 0x2B,
    "comma": 0x2C, "hyphen": 0x2D, "period": 0x2E, "slash": 0x2F,
    "colon": 0x3A, "semicolon": 0x3B, "less": 0x3C, "equal": 0x3D,
    "greater": 0x3E, "question": 0x3F, "at": 0x40, "bracketleft": 0x5B,
    "backslash": 0x5C, "bracketright": 0x5D, "underscore": 0x5F,
    "quoteleft": 0x2018, "quoteright": 0x2019, "quotedblleft": 0x201C,
    "quotedblright": 0x201D, "endash": 0x2013, "emdash": 0x2014,
    "ellipsis": 0x2026, "bullet": 0x2022, "dagger": 0x2020,
    "daggerdbl": 0x2021, "Euro": 0x20AC, "trademark": 0x2122,
    "copyright": 0x00A9, "registered": 0x00AE, "degree": 0x00B0,
    "plusminus": 0x00B1, "mu": 0x00B5, "paragraph": 0x00B6,
    "agrave": 0xE0, "aacute": 0xE1, "acircumflex": 0xE2, "atilde": 0xE3,
    "adieresis": 0xE4, "aring": 0xE5, "ae": 0xE6, "ccedilla": 0xE7,
    "egrave": 0xE8, "eacute": 0xE9, "ecircumflex": 0xEA, "edieresis": 0xEB,
    "igrave": 0xEC, "iacute": 0xED, "icircumflex": 0xEE, "idieresis": 0xEF,
    "eth": 0xF0, "ntilde": 0xF1, "ograve": 0xF2, "oacute": 0xF3,
    "ocircumflex": 0xF4, "otilde": 0xF5, "odieresis": 0xF6, "divide": 0xF7,
    "oslash": 0xF8, "ugrave": 0xF9, "uacute": 0xFA, "ucircumflex": 0xFB,
    "udieresis": 0xFC, "yacute": 0xFD, "thorn": 0xFE, "ydieresis": 0xFF,
    "germandbls": 0xDF, "Agrave": 0xC0, "Aacute": 0xC1, "Ccedilla": 0xC7,
    "Eacute": 0xC9, "Ntilde": 0xD1, "Odieresis": 0xD6, "Udieresis": 0xDC,
    "alpha": 0x3B1, "beta": 0x3B2, "gamma": 0x3B3, "delta": 0x3B4,
    "pi": 0x3C0, "sigma": 0x3C3, "omega": 0x3C9,
}

_UNI_NAME_RE = re.compile(r"^uni([0-9A-Fa-f]{4})$|^u([0-9A-Fa-f]{4,6})$")


def _glyph_to_char(name: str) -> str | None:
    """'/eacute' → 'é'; uniXXXX / uXXXX(XX) parse by value; unknown
    names return None (caller keeps the base-encoding char — a real
    extractor's fallback, not an error)."""
    g = name.lstrip("/")
    if g in _AGL:
        return chr(_AGL[g])
    m = _UNI_NAME_RE.match(g)
    if m:
        cp = int(m.group(1) or m.group(2), 16)
        if cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF:
            return chr(cp)
    return None


_BASE_CODECS = {
    "/WinAnsiEncoding": "cp1252",
    "/MacRomanEncoding": "mac_roman",
    # StandardEncoding's printable ASCII matches latin-1; the exotic
    # slots (quoteright at 0xA9 etc.) are a documented seam — crawled
    # PDFs overwhelmingly declare WinAnsi or carry /ToUnicode
    "/StandardEncoding": "latin-1",
    "/PDFDocEncoding": "latin-1",
}


def _base_table(enc_name: str | None) -> list[str]:
    """256-entry code→char table for a base encoding name (latin-1
    when None/unknown — the pre-round-9 behavior, kept as fallback)."""
    codec = _BASE_CODECS.get(enc_name or "", "latin-1")
    return [bytes([c]).decode(codec, "replace") for c in range(256)]


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_RANGE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(?:<([0-9A-Fa-f]+)>|\[(.*?)\])",
    re.S,
)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _utf16be(hexstr: bytes) -> str:
    b = bytes.fromhex(hexstr.decode("ascii"))
    return b.decode("utf-16-be", "replace")


def _parse_tounicode(data: bytes, width: int = 1) -> dict[int, str]:
    """/ToUnicode CMap stream → {glyph code: unicode string}
    (§9.10.3): bfchar pairs <src> <dst>, bfrange <lo> <hi> <dstStart>
    or <lo> <hi> [<dst> ...]; dst hex is UTF-16BE (multi-char dst =
    ligatures). `width` selects the code width: 1 byte for simple
    fonts, 2 bytes for CID/Type0 (Identity-H) — entries of the other
    width are skipped rather than misread."""
    hexlen = 2 * width
    out: dict[int, str] = {}
    for sec in _BFCHAR_RE.finditer(data):
        for src, dst in _HEXPAIR_RE.findall(sec.group(1)):
            if len(src) == hexlen:
                out[int(src, 16)] = _utf16be(dst)
    for sec in _BFRANGE_RE.finditer(data):
        for m in _RANGE_RE.finditer(sec.group(1)):
            lo_h, hi_h, start_h, arr = m.groups()
            if len(lo_h) != hexlen or len(hi_h) != hexlen:
                continue
            lo, hi = int(lo_h, 16), int(hi_h, 16)
            if hi < lo or hi - lo > 0xFFFF:
                raise ValueError("PDF: bfrange bounds out of order")
            if start_h is not None:
                start = _utf16be(start_h)
                # §9.10.3: only the LAST code unit increments
                head, tail = start[:-1], start[-1] if start else "�"
                for i in range(hi - lo + 1):
                    out[lo + i] = head + chr(ord(tail) + i)
            else:
                dsts = _HEX_RE.findall(arr or b"")
                for i, d in enumerate(dsts[: hi - lo + 1]):
                    out[lo + i] = _utf16be(d)
    return out


def _tounicode_map(buf, index, tu_ref, extra, width: int) -> dict[int, str]:
    if not (isinstance(tu_ref, tuple) and tu_ref[0] == "ref"):
        raise ValueError("PDF: /ToUnicode is not a stream reference")
    tok, d = _get_obj(buf, index, tu_ref[1], extra)
    if tok is None or not isinstance(d, dict):
        raise ValueError("PDF: /ToUnicode object is not a direct stream")
    return _parse_tounicode(_stream_bytes(buf, tok, d, index), width)


def _font_code_map(buf, index, fdict, extra):
    """Font dict → decode spec: None for the latin-1 fast path (no
    /Encoding, no /ToUnicode), ('simple', 256-entry code→text table)
    for simple fonts (base encoding name or /BaseEncoding+/Differences
    dict, /ToUnicode overrides), or ('cid', {2-byte code: text}) for
    /Subtype /Type0 composite fonts — the Identity-H layout modern PDF
    writers emit for subset TrueType/CJK, where glyph codes mean
    nothing without the /ToUnicode CMap."""
    if fdict.get("/Subtype") == "/Type0":
        tu_ref = fdict.get("/ToUnicode")
        if tu_ref is None:
            # Identity-H with no ToUnicode: codes are raw glyph ids —
            # unmappable by design; decode as replacement chars
            return ("cid", {})
        return ("cid", _tounicode_map(buf, index, tu_ref, extra, 2))
    enc = _resolve(buf, index, fdict.get("/Encoding"), extra)
    tu_ref = fdict.get("/ToUnicode")
    if enc is None and tu_ref is None:
        return None
    if isinstance(enc, str):
        table = _base_table(enc)
    elif isinstance(enc, dict):
        table = _base_table(enc.get("/BaseEncoding"))
        code = None
        for item in _resolve(buf, index, enc.get("/Differences", []), extra):
            if isinstance(item, (int, float)):
                code = int(item)
            elif isinstance(item, str) and code is not None and 0 <= code < 256:
                ch = _glyph_to_char(item)
                if ch is not None:
                    table[code] = ch
                code += 1
    else:
        table = _base_table(None)
    if tu_ref is not None:
        for code, s in _tounicode_map(buf, index, tu_ref, extra, 1).items():
            if 0 <= code < 256:
                table[code] = s
    return ("simple", table)


def _page_font_maps(buf, index, node, extra) -> dict[str, list[str] | None]:
    """Page node → {'/F1': code table or None} for every font in the
    page's /Resources (page-level resources only; tree-inherited
    resources are a documented seam — modern writers emit per-page)."""
    res = _resolve(buf, index, node.get("/Resources"), extra)
    if not isinstance(res, dict):
        return {}
    fonts = _resolve(buf, index, res.get("/Font"), extra)
    if not isinstance(fonts, dict):
        return {}
    out: dict[str, list[str] | None] = {}
    for name, ref in fonts.items():
        fdict = _resolve(buf, index, ref, extra)
        out[name] = (
            _font_code_map(buf, index, fdict, extra)
            if isinstance(fdict, dict)
            else None
        )
    return out


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


def _extract_text(
    content: bytes, fonts: dict[str, list[str] | None] | None = None
) -> str:
    """Text-showing operators of one content stream → text. Tj/'/"
    show one string; TJ shows its array's strings (kerning numbers
    ignored); T*, TD, Td and ' start a new line; ET closes a block.
    Strings decode through the CURRENT font's code table (tracked via
    the Tf operator against the page's /Resources fonts — /Encoding
    /Differences and /ToUnicode applied); fonts with neither, and
    content with no resources, decode latin-1 (CID 2-byte codes stay
    a documented seam)."""
    out: list[str] = []
    stack: list[bytes] = []  # decoded STRINGS since the last operator
    line_open = False
    last_name: str | None = None
    table = None  # current font's decode spec (see _font_code_map)

    def dec(b: bytes) -> str:
        if table is None:
            return b.decode("latin-1")
        mode, m = table
        if mode == "simple":
            return "".join(m[x] for x in b)
        # cid: big-endian 2-byte code units (Identity-H); unmapped
        # codes and an odd trailing byte decode as replacement chars
        parts = [
            m.get((b[i] << 8) | b[i + 1], "�")
            for i in range(0, len(b) - 1, 2)
        ]
        if len(b) % 2:
            parts.append("�")
        return "".join(parts)

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
        elif c == b"/":
            last_name = tok.decode("latin-1")
        elif c in b"[]" or c in b"+-0123456789.":
            pass  # operands the text ops ignore (kerning, brackets)
        else:
            op = tok
            if op == b"Tf" and fonts and last_name in fonts:
                table = fonts[last_name]
            elif op in (b"Tj", b"'", b'"'):
                if op != b"Tj":
                    endline()
                if stack:
                    out.append(dec(stack[-1]))
                    line_open = True
            elif op == b"TJ":
                for v in stack:
                    out.append(dec(v))
                    line_open = True
            elif op in (b"Td", b"TD", b"T*"):
                endline()
            elif op == b"ET":
                endline()
            stack = []
    return "".join(out).rstrip("\n")


def _pdf_text_string(b: bytes) -> str:
    """PDF text string (§7.9.2.2): UTF-16BE when it opens with the
    BE BOM, PDFDocEncoding (≈ latin-1 printable subset) otherwise."""
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", "replace")
    return b.decode("latin-1")


def parse_pdf_info(buf: bytes) -> dict:
    """PDF bytes → document-information dictionary fields (§14.3.3:
    /Title /Author /Subject /Producer /CreationDate — the provenance
    a corpus pipeline keys dedup and licensing audits on) plus
    `n_pages` counted from the page tree WITHOUT decoding any content
    stream. Missing /Info or missing fields are None — absence is
    data. ValueError-only error contract."""
    try:
        return _parse_pdf_info(buf)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"corrupt PDF file: {exc}") from exc


def _parse_pdf_info(buf: bytes) -> dict:
    if not buf.startswith(b"%PDF-"):
        raise ValueError("not a PDF file (no %PDF header)")
    index = _index_objects(buf)
    extra = _expand_objstms(buf, index)
    out = {
        "title": None, "author": None, "subject": None,
        "producer": None, "creation_date": None, "n_pages": 0,
        "encrypted": False,
    }
    trailer = _trailer_of(buf)
    if trailer is not None and trailer.get("/Encrypt") is not None:
        out["encrypted"] = True
    if isinstance(trailer, dict) and trailer.get("/Info") is not None:
        info = _resolve(buf, index, trailer["/Info"], extra)
        if isinstance(info, dict):
            for key, name in (
                ("title", "/Title"), ("author", "/Author"),
                ("subject", "/Subject"), ("producer", "/Producer"),
                ("creation_date", "/CreationDate"),
            ):
                v = info.get(name)
                if isinstance(v, bytes):
                    out[key] = _pdf_text_string(v)
    # page count: walk the tree, never touch /Contents
    root = trailer.get("/Root") if isinstance(trailer, dict) else None
    if root is None:
        for num in list(index) + list(extra):
            _, v = _get_obj(buf, index, num, extra)
            if isinstance(v, dict) and v.get("/Type") == "/Catalog":
                root = ("ref", num)
                break
    if root is not None:
        cat = _resolve(buf, index, root, extra)

        def count(node_ref) -> int:
            node = _resolve(buf, index, node_ref, extra)
            if not isinstance(node, dict):
                return 0
            if node.get("/Type") == "/Pages" or "/Kids" in node:
                return sum(
                    count(k)
                    for k in _resolve(buf, index, node.get("/Kids", []), extra)
                )
            return 1

        if isinstance(cat, dict):
            out["n_pages"] = count(cat.get("/Pages"))
    return out


def parse_pdf_text(buf: bytes) -> list[str]:
    """PDF bytes → per-page extracted text, in page-tree order."""
    try:
        return _parse_pdf_text(buf)
    except ValueError:
        raise
    except Exception as exc:  # struct/regex/zlib edge cases
        raise ValueError(f"corrupt PDF file: {exc}") from exc


def _trailer_of(buf: bytes):
    """The last trailer dictionary, or None when absent/unparsable."""
    tpos = buf.rfind(b"trailer")
    if tpos < 0:
        return None
    try:
        t = _Tok(buf, tpos + 7).value()
    except ValueError:
        return None
    return t if isinstance(t, dict) else None


def _parse_pdf_text(buf: bytes) -> list[str]:
    if not buf.startswith(b"%PDF-"):
        raise ValueError("not a PDF file (no %PDF header)")
    trailer = _trailer_of(buf)
    if trailer is not None and trailer.get("/Encrypt") is not None:
        # §7.6: strings and streams are RC4/AES-enciphered under a
        # document key — not decodable without it. Named rejection so
        # on_error='skip'/'tag' pipelines can account for the loss
        # (the brotli/zstd pattern).
        raise ValueError(
            "encrypted PDF (/Encrypt in trailer): content streams are "
            "key-protected — extraction rejected, not garbled"
        )
    index = _index_objects(buf)
    extra = _expand_objstms(buf, index)

    # trailer → /Root; fall back to scanning for the /Catalog object
    root = trailer.get("/Root") if trailer else None
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
        fonts = _page_font_maps(buf, index, node, extra)
        pages.append(_extract_text(b"\n".join(parts), fonts))

    walk(cat.get("/Pages"))
    return pages


# -- fixture twin -------------------------------------------------------------


def _font_objects(font_spec: dict):
    """(font dict bytes builder, ToUnicode stream payload or None,
    code→char decode table) for `encode_pdf`'s font_spec:

    {"base": "/WinAnsiEncoding" | "/MacRomanEncoding" | None,
     "differences": {code: "/glyphname"},      # optional
     "tounicode_chars": {code: "s"},           # optional
     "tounicode_range": (lo, hi, "startchar")} # optional

    CID/Type0 mode (`{"cid": {code: "s"}, "cid_range": (lo, hi,
    "start")}`): a /Subtype /Type0 /Encoding /Identity-H font whose
    2-byte glyph codes map through a wide /ToUnicode CMap — the
    subset-TrueType/CJK layout modern writers emit. Returns width=2
    and the cid map as the decode table.

    The decode table layers exactly like the parser (base →
    differences → ToUnicode) and is INVERTED to encode the page text,
    so a character whose code was stolen by a remap becomes
    unencodable and raises at fixture-build time instead of silently
    round-tripping wrong. Known-answer byte pins live in
    tests/test_pdfcodec.py (€=0x80 WinAnsi etc.) so the shared
    layering cannot self-certify."""
    if "cid" in font_spec or "cid_range" in font_spec:
        cmap: dict[int, str] = dict(font_spec.get("cid", {}))
        rng = font_spec.get("cid_range")
        if rng:
            lo, hi, start = rng
            for i in range(hi - lo + 1):
                cmap[lo + i] = chr(ord(start) + i)
        parts = [
            b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        ]
        chars = {c: s for c, s in font_spec.get("cid", {}).items()}
        if chars:
            parts.append(f"{len(chars)} beginbfchar\n".encode())
            for code in sorted(chars):
                dst = chars[code].encode("utf-16-be").hex().upper()
                parts.append(f"<{code:04X}> <{dst}>\n".encode())
            parts.append(b"endbfchar\n")
        if rng:
            lo, hi, start = rng
            dst = start.encode("utf-16-be").hex().upper()
            parts.append(
                f"1 beginbfrange\n<{lo:04X}> <{hi:04X}> <{dst}>\n"
                f"endbfrange\n".encode()
            )
        parts.append(b"endcmap\nend\nend")
        tu_payload = b"".join(parts)

        def font_dict(tounicode_ref: int | None) -> bytes:
            tu = f"/ToUnicode {tounicode_ref} 0 R " if tounicode_ref else ""
            return (
                b"<< /Type /Font /Subtype /Type0 /BaseFont /ABCDEF+Embedded "
                b"/Encoding /Identity-H " + tu.encode() + b">>"
            )

        return font_dict, tu_payload, cmap, 2

    table = _base_table(font_spec.get("base"))
    diff_items: list[str] = []
    for code in sorted(font_spec.get("differences", {})):
        g = font_spec["differences"][code]
        ch = _glyph_to_char(g)
        if ch is None:
            raise ValueError(f"font_spec: unknown glyph name {g!r}")
        table[code] = ch
        diff_items.append(f"{code} {g}")
    tu_chars = dict(font_spec.get("tounicode_chars", {}))
    rng = font_spec.get("tounicode_range")
    if rng:
        lo, hi, start = rng
        for i in range(hi - lo + 1):
            table[lo + i] = chr(ord(start) + i)
    for code, s in tu_chars.items():
        table[code] = s
    # ToUnicode CMap payload (§9.10.3 wrapper; parser regexes only the
    # bfchar/bfrange sections)
    tu_payload = None
    if tu_chars or rng:
        parts = [
            b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
            b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        ]
        if tu_chars:
            parts.append(f"{len(tu_chars)} beginbfchar\n".encode())
            for code in sorted(tu_chars):
                dst = tu_chars[code].encode("utf-16-be").hex().upper()
                parts.append(f"<{code:02X}> <{dst}>\n".encode())
            parts.append(b"endbfchar\n")
        if rng:
            lo, hi, start = rng
            dst = start.encode("utf-16-be").hex().upper()
            parts.append(
                f"1 beginbfrange\n<{lo:02X}> <{hi:02X}> <{dst}>\nendbfrange\n".encode()
            )
        parts.append(b"endcmap\nend\nend")
        tu_payload = b"".join(parts)

    def font_dict(tounicode_ref: int | None) -> bytes:
        enc = b""
        if diff_items:
            base = font_spec.get("base")
            base_part = f"/BaseEncoding {base} " if base else ""
            enc = (
                f"/Encoding << /Type /Encoding {base_part}"
                f"/Differences [{' '.join(diff_items)}] >> "
            ).encode()
        elif font_spec.get("base"):
            enc = f"/Encoding {font_spec['base']} ".encode()
        tu = f"/ToUnicode {tounicode_ref} 0 R " if tounicode_ref else ""
        return (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            + enc + tu.encode() + b">>"
        )

    return font_dict, tu_payload, table, 1


def encode_pdf(
    pages: list[list[str]],
    compress: bool = True,
    use_objstm: bool = False,
    font_spec: dict | None = None,
    info: dict | None = None,
    encrypt_stub: bool = False,
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

    if font_spec is not None and use_objstm:
        raise ValueError("font_spec with use_objstm is not supported")
    inv: dict[str, int] | None = None
    font_dict_fn = None
    tu_payload = None
    if font_spec is not None:
        font_dict_fn, tu_payload, table, width = _font_objects(font_spec)
        inv = {}
        if width == 1:
            for code in range(256):
                inv.setdefault(table[code], code)
        else:
            for code, ch in table.items():
                inv.setdefault(ch, code)

    def enc_line(line: str) -> bytes:
        if inv is None:
            return line.encode("latin-1")
        try:
            if width == 1:
                return bytes(inv[ch] for ch in line)
            return b"".join(inv[ch].to_bytes(2, "big") for ch in line)
        except KeyError as exc:
            raise ValueError(f"font_spec cannot encode {exc}") from exc

    def content(lines: list[str]) -> bytes:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append(b"0 -14 Td")
            b = enc_line(line)
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
        # [4 ToUnicode CMap stream when the font carries one,]
        # then per page i: (base+2i) page dict, (base+1+2i) content
        base = 4 + (1 if tu_payload is not None else 0)
        kids = " ".join(f"{base + 2 * i} 0 R" for i in range(n_pages))
        objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
        objs.append(
            f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>".encode()
        )
        if font_dict_fn is not None:
            objs.append(font_dict_fn(4 if tu_payload is not None else None))
        else:
            objs.append(
                b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
            )
        if tu_payload is not None:
            objs.append(stream_obj(tu_payload))
        for i, lines in enumerate(pages):
            objs.append(
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Resources << /Font << /F1 3 0 R >> >> "
                    f"/Contents {base + 1 + 2 * i} 0 R >>"
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

    info_num = None
    if info is not None:
        # document-information dictionary (§14.3.3): literal strings
        # when latin-1 suffices, UTF-16BE-with-BOM hex strings beyond
        def pdf_str(s: str) -> bytes:
            try:
                b = s.encode("latin-1")
                esc = (
                    b.replace(b"\\", b"\\\\")
                    .replace(b"(", b"\\(")
                    .replace(b")", b"\\)")
                )
                return b"(" + esc + b")"
            except UnicodeEncodeError:
                be = b"\xfe\xff" + s.encode("utf-16-be")
                return b"<" + be.hex().upper().encode() + b">"

        info_num = max(num for num, _ in numbered) + 1
        fields = b""
        for name, key in (
            ("/Title", "title"), ("/Author", "author"),
            ("/Subject", "subject"), ("/Producer", "producer"),
            ("/CreationDate", "creation_date"),
        ):
            if info.get(key) is not None:
                fields += name.encode() + b" " + pdf_str(info[key]) + b" "
        numbered.append((info_num, b"<< " + fields + b">>"))

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
        f"trailer\n<< /Size {size} /Root 1 0 R"
        + (f" /Info {info_num} 0 R" if info_num is not None else "")
        + (" /Encrypt 1 0 R" if encrypt_stub else "")
        + " >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


# -- image XObjects (r11: the /DCTDecode seam wired) --------------------------


def parse_pdf_images(buf: bytes) -> list[dict]:
    """PDF bytes → one dict per image XObject in page order:
    {page_no, name, width, height, bits, colorspace, filter, pixels}.

    /DCTDecode payloads are raw JPEG files — decoded with the
    in-repo baseline/progressive decoder (sources/jpegcodec, the
    q176 path); /FlateDecode rasters inflate to raw 8-bit
    DeviceGray/DeviceRGB samples. Images under any other filter
    surface with pixels=None (the filter name says why), so skip-mode
    pipelines can count the loss instead of silently losing the
    image modality."""
    try:
        return _parse_pdf_images(buf)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"corrupt PDF file: {exc}") from exc


def _parse_pdf_images(buf: bytes) -> list[dict]:
    import numpy as np

    if not buf.startswith(b"%PDF-"):
        raise ValueError("not a PDF file (no %PDF header)")
    trailer = _trailer_of(buf)
    if trailer is not None and trailer.get("/Encrypt") is not None:
        raise ValueError(
            "encrypted PDF (/Encrypt in trailer): content streams are "
            "key-protected — extraction rejected, not garbled"
        )
    index = _index_objects(buf)
    extra = _expand_objstms(buf, index)
    root = trailer.get("/Root") if trailer else None
    if root is None:
        for num in list(index) + list(extra):
            _, v = _get_obj(buf, index, num, extra)
            if isinstance(v, dict) and v.get("/Type") == "/Catalog":
                root = ("ref", num)
                break
    if root is None:
        raise ValueError("PDF: no document catalog")
    cat = _resolve(buf, index, root, extra)

    out: list[dict] = []
    page_no = 0

    def leaf(node: dict) -> None:
        nonlocal page_no
        res = _resolve(buf, index, node.get("/Resources"), extra)
        xobjs = (
            _resolve(buf, index, res.get("/XObject"), extra)
            if isinstance(res, dict) else None
        )
        if isinstance(xobjs, dict):
            for name in sorted(xobjs):
                ref = xobjs[name]
                if not (isinstance(ref, tuple) and ref[0] == "ref"):
                    continue
                tok, d = _get_obj(buf, index, ref[1], extra)
                if tok is None or not isinstance(d, dict):
                    continue
                if d.get("/Subtype") != "/Image":
                    continue
                w = _resolve(buf, index, d.get("/Width"), extra)
                h = _resolve(buf, index, d.get("/Height"), extra)
                bits = _resolve(buf, index, d.get("/BitsPerComponent"), extra)
                cs = d.get("/ColorSpace")
                cs = cs if isinstance(cs, str) else None
                filt = d.get("/Filter")
                filts = [filt] if isinstance(filt, str) else (filt or [])
                raw = _raw_stream_bytes(buf, tok, d, index)
                pixels = None
                if filts == ["/DCTDecode"]:
                    from odin_rs_spark.sources.jpegcodec import decode_jpeg

                    pixels = decode_jpeg(raw)
                elif filts in ([], ["/FlateDecode"]):
                    data = raw
                    if filts:
                        try:
                            data = zlib.decompress(raw)
                        except zlib.error as exc:
                            raise ValueError(
                                f"PDF: bad Flate image: {exc}"
                            ) from exc
                    if bits == 8 and cs in ("/DeviceGray", "/DeviceRGB"):
                        nc = 1 if cs == "/DeviceGray" else 3
                        if len(data) < w * h * nc:
                            raise ValueError("PDF: image raster short")
                        a = np.frombuffer(
                            data[: w * h * nc], dtype=np.uint8
                        )
                        pixels = a.reshape(
                            (h, w) if nc == 1 else (h, w, 3)
                        )
                out.append(
                    {
                        "page_no": page_no,
                        "name": name,
                        "width": w,
                        "height": h,
                        "bits": bits,
                        "colorspace": cs,
                        "filter": filts[0] if filts else None,
                        "pixels": pixels,
                    }
                )
        page_no += 1

    def walk(node_ref) -> None:
        node = _resolve(buf, index, node_ref, extra)
        if not isinstance(node, dict):
            raise ValueError("PDF: page-tree node is not a dictionary")
        if node.get("/Type") == "/Pages" or "/Kids" in node:
            for kid in _resolve(buf, index, node.get("/Kids", []), extra):
                walk(kid)
            return
        leaf(node)

    walk(cat.get("/Pages"))
    return out


def encode_pdf_with_images(pages: list[list[tuple]], jpeg_quality=None) -> bytes:
    """Fixture twin of `parse_pdf_images`: each page is a list of
    (array, codec) with codec 'jpeg' (DCTDecode via the in-repo
    encoder) or 'flate' (raw raster deflated). Arrays are uint8
    (H, W) gray or (H, W, 3) RGB."""
    import numpy as np

    from odin_rs_spark.sources.jpegcodec import encode_jpeg

    objs: list[tuple[int, bytes]] = []
    n_pages = len(pages)
    kids_nums = []
    next_num = 3
    page_objs = []
    for imgs in pages:
        img_nums = []
        img_bodies = []
        for arr, codec in imgs:
            a = np.asarray(arr, dtype=np.uint8)
            h, w = a.shape[:2]
            cs = "/DeviceGray" if a.ndim == 2 else "/DeviceRGB"
            if codec == "jpeg":
                data = encode_jpeg(a, quality=jpeg_quality)
                filt = "/Filter /DCTDecode "
            elif codec == "flate":
                data = zlib.compress(a.tobytes(), 9)
                filt = "/Filter /FlateDecode "
            else:
                raise ValueError(f"codec {codec!r} unsupported (jpeg/flate)")
            body = (
                f"<< /Type /XObject /Subtype /Image /Width {w} "
                f"/Height {h} /ColorSpace {cs} /BitsPerComponent 8 "
                f"{filt}/Length {len(data)} >>"
            ).encode() + b"\nstream\n" + data + b"\nendstream"
            img_bodies.append(body)
            img_nums.append(None)  # assigned below
        page_objs.append((imgs, img_bodies, img_nums))

    # object layout: 1 catalog, 2 pages; per page: page dict, content
    # stream, then its image XObjects
    numbered: list[tuple[int, bytes]] = []
    num = 3
    kids = []
    for imgs, img_bodies, _ in page_objs:
        page_num = num
        content_num = num + 1
        img_start = num + 2
        num = img_start + len(img_bodies)
        kids.append(f"{page_num} 0 R")
        xents = " ".join(
            f"/Im{i} {img_start + i} 0 R" for i in range(len(img_bodies))
        )
        numbered.append(
            (
                page_num,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Resources << /XObject << {xents} >> >> "
                    f"/Contents {content_num} 0 R >>"
                ).encode(),
            )
        )
        draw = b"\n".join(
            b"q 100 0 0 100 %d 600 cm /Im%d Do Q" % (72 + 110 * i, i)
            for i in range(len(img_bodies))
        )
        numbered.append(
            (
                content_num,
                f"<< /Length {len(draw)} >>".encode()
                + b"\nstream\n" + draw + b"\nendstream",
            )
        )
        for i, body in enumerate(img_bodies):
            numbered.append((img_start + i, body))
    numbered.insert(0, (1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    numbered.insert(
        1,
        (
            2,
            f"<< /Type /Pages /Count {n_pages} "
            f"/Kids [{' '.join(kids)}] >>".encode(),
        ),
    )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    size = max(n for n, _ in numbered) + 1
    offsets: dict[int, int] = {}
    for n, body in numbered:
        offsets[n] = len(out)
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for n in range(1, size):
        out += f"{offsets[n]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


PDF_IMAGES_SCHEMA = (
    "file string, page_no int, name string, width int, height int, "
    "bits int, colorspace string, filter string, decoded boolean, "
    "mean_px double"
)


def pdf_images(files_df, on_error: str = "raise"):
    """`binaryFile` rows → one row per image XObject with decoded
    pixel statistics — the image leg of the PDF modality (text comes
    from `pdf_pages`). Document bytes never shuffle; JPEG/Flate
    rasters decode inside the scan task."""
    import os

    import numpy as np
    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        for pdf in batches:
            rows = {
                "file": [], "page_no": [], "name": [], "width": [],
                "height": [], "bits": [], "colorspace": [], "filter": [],
                "decoded": [], "mean_px": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    imgs = parse_pdf_images(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                base = os.path.basename(path)
                for im in imgs:
                    rows["file"].append(base)
                    rows["page_no"].append(im["page_no"])
                    rows["name"].append(im["name"])
                    rows["width"].append(im["width"])
                    rows["height"].append(im["height"])
                    rows["bits"].append(im["bits"])
                    rows["colorspace"].append(im["colorspace"])
                    rows["filter"].append(im["filter"])
                    px = im["pixels"]
                    rows["decoded"].append(px is not None)
                    rows["mean_px"].append(
                        float(np.mean(px)) if px is not None else None
                    )
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, PDF_IMAGES_SCHEMA)


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


PDF_INFO_SCHEMA = (
    "file string, title string, author string, subject string, "
    "producer string, creation_date string, n_pages int, "
    "encrypted boolean"
)


def pdf_info(files_df, on_error: str = "raise"):
    """`binaryFile` rows → one row per PDF with its document-
    information fields (§14.3.3) and the page COUNT — no content
    stream is decoded, so this is the cheap provenance scan a corpus
    pipeline runs before deciding what to extract."""
    import os

    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        for pdf in batches:
            rows = {
                "file": [], "title": [], "author": [], "subject": [],
                "producer": [], "creation_date": [], "n_pages": [],
                "encrypted": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    i = parse_pdf_info(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                rows["file"].append(os.path.basename(path))
                for k in ("title", "author", "subject", "producer",
                          "creation_date"):
                    rows[k].append(i[k])
                rows["n_pages"].append(i["n_pages"])
                rows["encrypted"].append(i["encrypted"])
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, PDF_INFO_SCHEMA)
