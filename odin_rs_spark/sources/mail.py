"""EML / mbox mail parsing (RFC 5322 message format, RFC 2045/2046
MIME multipart + content-transfer-encodings, RFC 2047 encoded-word
headers) — the mail-archive corpus modality (Enron-style dumps,
mailing-list archives) next to PDF/DOCX/WARC.

Hand-rolled from the public RFCs in the repo's codec style: a compact
spec-driven parser with a fixture-twin encoder (`encode_eml`) so every
seam — quoted-printable soft breaks, base64 bodies, nested multipart,
B- and Q-encoded subject words — is exercised by construction, and the
stdlib `email` package serves as an INDEPENDENT cross-check in tests
(two implementations agreeing on twin-encoded bytes pins both).

Scope: header unfolding (§2.2.3), multipart boundary walk (§5.1.1 of
RFC 2046, including nested multiparts), CTE 7bit/8bit/binary/
quoted-printable/base64, encoded-words in Subject/From display names
(B and Q, with the §6.2 adjacent-word join rule), addr-spec
extraction, RFC 5322 date-time → UTC ISO. Out of scope, documented:
message/rfc822 embedding, RFC 2231 parameter continuations, S/MIME.
ValueError-only error contract (the warc/officedoc pattern).
"""

from __future__ import annotations

import base64
import binascii
import datetime
import os
import re

# ---------------------------------------------------------------------------
# Header block
# ---------------------------------------------------------------------------


def _split_headers_body(data: bytes) -> tuple[list[tuple[str, str]], bytes]:
    """Split at the first empty line; unfold continuation lines (RFC
    5322 §2.2.3: lines starting with WSP extend the previous field)."""
    data = data.replace(b"\r\n", b"\n")
    head, sep, body = data.partition(b"\n\n")
    if not sep and not head.endswith(b"\n"):
        # headers-only message (no body) is legal
        body = b""
    headers: list[tuple[str, str]] = []
    for raw in head.split(b"\n"):
        if not raw:
            continue
        if raw[:1] in (b" ", b"\t") and headers:
            name, val = headers[-1]
            headers[-1] = (name, val + " " + raw.strip().decode("latin-1"))
            continue
        name, colon, val = raw.partition(b":")
        if not colon:
            raise ValueError(f"malformed header line: {raw[:40]!r}")
        headers.append(
            (name.decode("latin-1").strip().lower(), val.decode("latin-1").strip())
        )
    return headers, body


def _header(headers: list[tuple[str, str]], name: str) -> str | None:
    for k, v in headers:
        if k == name:
            return v
    return None


# ---------------------------------------------------------------------------
# RFC 2047 encoded-words
# ---------------------------------------------------------------------------

_EWORD_RE = re.compile(r"=\?([^?]+)\?([BbQq])\?([^?]*)\?=")
# WSP between two adjacent encoded words is transparent (§6.2)
_EWORD_JOIN_RE = re.compile(r"(\?=)[ \t]+(=\?)")


def _decode_charset(b: bytes, charset: str) -> str:
    cs = charset.strip().strip('"').lower()
    if cs in ("iso-8859-1", "latin-1", "latin1", "windows-1252", "cp1252"):
        cs = "cp1252"  # WHATWG alias table, same rule as warc.resolve_charset
    elif cs in ("us-ascii", "ascii", ""):
        cs = "ascii"
    try:
        return b.decode(cs, "replace")
    except LookupError as exc:
        raise ValueError(f"unsupported charset {charset!r}") from exc


def decode_encoded_words(s: str) -> str:
    """Decode RFC 2047 =?charset?B|Q?text?= tokens in a header value."""
    s = _EWORD_JOIN_RE.sub(r"\1\2", s)

    def one(m: re.Match) -> str:
        charset, enc, payload = m.group(1), m.group(2).upper(), m.group(3)
        if enc == "B":
            try:
                raw = base64.b64decode(payload, validate=True)
            except (binascii.Error, ValueError) as exc:
                raise ValueError(f"bad B encoded-word: {payload!r}") from exc
        else:  # Q: like quoted-printable, but '_' means SP (§4.2)
            raw = _decode_qp(payload.replace("_", " ").encode("latin-1"))
        return _decode_charset(raw, charset)

    return _EWORD_RE.sub(one, s)


# ---------------------------------------------------------------------------
# Content-transfer-encodings (RFC 2045 §6)
# ---------------------------------------------------------------------------

_QP_RE = re.compile(rb"=([0-9A-Fa-f]{2})")


def _decode_qp(b: bytes) -> bytes:
    b = b.replace(b"=\r\n", b"").replace(b"=\n", b"")  # soft line breaks
    return _QP_RE.sub(lambda m: bytes([int(m.group(1), 16)]), b)


def _decode_cte(body: bytes, cte: str) -> bytes:
    cte = cte.strip().lower()
    if cte in ("", "7bit", "8bit", "binary"):
        return body
    if cte == "quoted-printable":
        return _decode_qp(body)
    if cte == "base64":
        payload = re.sub(rb"\s+", b"", body)
        payload += b"=" * ((-len(payload)) % 4)
        try:
            return base64.b64decode(payload)
        except (binascii.Error, ValueError) as exc:
            raise ValueError(f"bad base64 body: {exc}") from exc
    raise ValueError(f"unsupported Content-Transfer-Encoding: {cte!r}")


# ---------------------------------------------------------------------------
# Content-Type
# ---------------------------------------------------------------------------

_PARAM_RE = re.compile(r';\s*([A-Za-z0-9-]+)\s*=\s*("[^"]*"|[^;\s]+)')


def _content_type(value: str | None) -> tuple[str, dict[str, str]]:
    """'text/html; charset="UTF-8"' → ('text/html', {'charset': 'UTF-8'});
    absent header defaults to text/plain us-ascii (RFC 2045 §5.2)."""
    if value is None:
        return "text/plain", {"charset": "us-ascii"}
    mime = value.split(";", 1)[0].strip().lower() or "text/plain"
    params = {
        k.lower(): v.strip('"') for k, v in _PARAM_RE.findall(value)
    }
    return mime, params


# ---------------------------------------------------------------------------
# Address + date
# ---------------------------------------------------------------------------

_ANGLE_RE = re.compile(r"<([^<>]*)>")
_ADDR_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+")

_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        "jan feb mar apr may jun jul aug sep oct nov dec".split()
    )
}
_DATE_RE = re.compile(
    r"(?:[A-Za-z]{3},\s*)?(\d{1,2})\s+([A-Za-z]{3})\s+(\d{4})\s+"
    r"(\d{2}):(\d{2})(?::(\d{2}))?\s*([+-]\d{4}|[A-Z]{1,5})?"
)


def addr_spec(value: str | None) -> str | None:
    """Extract the addr-spec from a From/To header value: the
    angle-bracketed form wins, else the first bare addr-spec token."""
    if value is None:
        return None
    value = decode_encoded_words(value)
    m = _ANGLE_RE.search(value)
    if m:
        inner = _ADDR_RE.search(m.group(1))
        return inner.group(0).lower() if inner else None
    m = _ADDR_RE.search(value)
    return m.group(0).lower() if m else None


# RFC 5322 §4.3 gives the eight named US zones specific offsets
# (minutes east of UTC); UT/GMT are +0000. Military single letters and
# any other alpha zone carry "no information" → treated as -0000.
_NAMED_ZONES = {
    "ut": 0, "gmt": 0, "z": 0,
    "est": -300, "edt": -240, "cst": -360, "cdt": -300,
    "mst": -420, "mdt": -360, "pst": -480, "pdt": -420,
}


def parse_date(value: str | None) -> str | None:
    """RFC 5322 date-time → UTC ISO 'YYYY-MM-DDTHH:MM:SSZ'. Obsolete
    alpha zones (§4.3): UT/GMT/Z are +0000, the eight named US zones
    (EST/EDT/CST/CDT/MST/MDT/PST/PDT) get their RFC-assigned offsets,
    and remaining alpha (military/unknown) zones are -0000."""
    if value is None:
        return None
    m = _DATE_RE.search(value)
    if not m:
        raise ValueError(f"unparseable Date: {value!r}")
    day, mon, year, hh, mm, ss, zone = m.groups()
    month = _MONTHS.get(mon.lower())
    if month is None:
        raise ValueError(f"bad month in Date: {value!r}")
    dt = datetime.datetime(
        int(year), month, int(day), int(hh), int(mm), int(ss or 0)
    )
    off = 0
    if zone and zone[0] in "+-":
        off = int(zone[1:3]) * 60 + int(zone[3:5])
        if zone[0] == "-":
            off = -off
    elif zone:
        off = _NAMED_ZONES.get(zone.lower(), 0)
    dt -= datetime.timedelta(minutes=off)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


# ---------------------------------------------------------------------------
# Message parse
# ---------------------------------------------------------------------------


def parse_eml(data: bytes) -> dict:
    """EML bytes → {'subject', 'from_addr', 'date_utc', 'parts': [
    {'content_type', 'charset', 'cte', 'text', 'n_bytes'}]} with
    multipart trees flattened to leaves in document order. text is
    None for non-text leaves. ValueError-only error contract."""
    try:
        return _parse_eml(data)
    except ValueError:
        raise
    except Exception as exc:  # pragma: no cover - defensive wrap
        raise ValueError(f"corrupt EML message: {exc}") from exc


def _parse_eml(data: bytes) -> dict:
    headers, body = _split_headers_body(data)
    subject = _header(headers, "subject")
    return {
        "subject": decode_encoded_words(subject) if subject is not None else None,
        "from_addr": addr_spec(_header(headers, "from")),
        "date_utc": parse_date(_header(headers, "date")),
        "parts": _walk_part(headers, body, depth=0),
    }


_MAX_MULTIPART_DEPTH = 8  # fuzz bound: no legitimate mail nests deeper


def _walk_part(
    headers: list[tuple[str, str]], body: bytes, depth: int
) -> list[dict]:
    mime, params = _content_type(_header(headers, "content-type"))
    if mime.startswith("multipart/"):
        if depth >= _MAX_MULTIPART_DEPTH:
            raise ValueError("multipart nesting too deep")
        boundary = params.get("boundary")
        if not boundary:
            raise ValueError("multipart without boundary parameter")
        leaves: list[dict] = []
        for chunk in _split_multipart(body, boundary.encode("latin-1")):
            ph, pb = _split_headers_body(chunk)
            leaves.extend(_walk_part(ph, pb, depth + 1))
        return leaves
    cte = _header(headers, "content-transfer-encoding") or "7bit"
    raw = _decode_cte(body, cte)
    text = (
        _decode_charset(raw, params.get("charset", "us-ascii"))
        if mime.startswith("text/")
        else None
    )
    return [
        {
            "content_type": mime,
            "charset": params.get("charset", "us-ascii").lower(),
            "cte": cte.strip().lower(),
            "text": text,
            "n_bytes": len(raw),
        }
    ]


def _split_multipart(body: bytes, boundary: bytes) -> list[bytes]:
    """RFC 2046 §5.1.1: parts are delimited by CRLF '--boundary' CRLF
    lines; '--boundary--' closes; the preamble and epilogue are
    discarded. (CRLF was normalized to LF at header split.)"""
    delim = b"--" + boundary
    chunks: list[bytes] = []
    cur: list[bytes] | None = None
    for line in body.split(b"\n"):
        stripped = line.rstrip()
        if stripped == delim:
            if cur is not None:
                chunks.append(b"\n".join(cur[:-1] if cur and cur[-1] == b"" else cur))
            cur = []
        elif stripped == delim + b"--":
            if cur is not None:
                chunks.append(b"\n".join(cur[:-1] if cur and cur[-1] == b"" else cur))
            cur = None
        elif cur is not None:
            cur.append(line)
    if not chunks:
        raise ValueError("multipart body with no parts")
    return chunks


# ---------------------------------------------------------------------------
# Fixture twin
# ---------------------------------------------------------------------------


def _encode_qp(text: bytes, width: int = 30) -> bytes:
    """Quoted-printable with deliberately narrow soft line breaks so
    the =\\n seam is always on the parse path."""
    out = bytearray()
    col = 0
    for byte in text:
        if byte in b"=\x00" or byte > 126 or (byte < 32 and byte not in b"\n\t"):
            tok = b"=%02X" % byte
        elif byte == 0x0A:
            out += b"\n"
            col = 0
            continue
        else:
            tok = bytes([byte])
        if col + len(tok) > width:
            out += b"=\n"
            col = 0
        out += tok
        col += len(tok)
    return bytes(out)


def encode_eml(
    subject: str,
    from_addr: str,
    date: str,
    parts: list[tuple[str, str, str]],
    subject_encoding: str | None = None,
    nested: bool = False,
) -> bytes:
    """Fixture twin of `parse_eml`. ``parts`` is a list of
    (content_type, charset, text); one part emits a simple message,
    several emit multipart/alternative (or, with ``nested``, a
    multipart/mixed wrapping the alternative — the §5.1.1 recursion).
    CTE per part: utf-8 text goes base64, cp1252 goes
    quoted-printable, ascii stays 7bit. ``subject_encoding`` 'B'/'Q'
    wraps the subject in an RFC 2047 encoded word pair (two words, so
    the §6.2 WSP-join rule is on-path)."""
    if subject_encoding == "B":
        half = max(1, len(subject) // 2)
        subj = " ".join(
            "=?utf-8?B?" + base64.b64encode(s.encode("utf-8")).decode() + "?="
            for s in (subject[:half], subject[half:])
        )
    elif subject_encoding == "Q":
        subj = (
            "=?utf-8?Q?"
            + _encode_qp(subject.encode("utf-8"), width=900)
            .decode("latin-1")
            .replace(" ", "_")
            + "?="
        )
    else:
        subj = subject

    def leaf(ct: str, cs: str, text: str) -> bytes:
        # payload carries NO trailing newline: the newline before a
        # boundary delimiter belongs to the delimiter (RFC 2046
        # §5.1.1), so text round-trips byte-exact in both the
        # single-part and the multipart layout.
        data = text.encode(cs)
        if cs.lower() in ("utf-8", "utf8"):
            cte, payload = "base64", base64.b64encode(data)
        elif cs.lower() in ("cp1252", "windows-1252", "iso-8859-1"):
            cte, payload = "quoted-printable", _encode_qp(data)
        else:
            cte, payload = "7bit", data
        return (
            f"Content-Type: {ct}; charset={cs}\n"
            f"Content-Transfer-Encoding: {cte}\n\n".encode("latin-1") + payload
        )

    head = (
        f"From: Sender <{from_addr}>\n"
        f"Date: {date}\n"
        f"Subject: {subj}\n"
        f"MIME-Version: 1.0\n"
    ).encode("latin-1")
    if len(parts) == 1:
        return head + leaf(*parts[0])
    inner = b"Content-Type: multipart/alternative; boundary=\"inner1\"\n\n"
    for p in parts:
        inner += b"--inner1\n" + leaf(*p) + b"\n"
    inner += b"--inner1--\n"
    if not nested:
        return head + inner
    outer = (
        b"Content-Type: multipart/mixed; boundary=\"outer0\"\n\n"
        b"preamble to discard\n--outer0\n" + inner + b"\n--outer0--\nepilogue\n"
    )
    return head + outer


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

EML_SCHEMA = (
    "file string, subject string, from_addr string, from_domain string,"
    " date_utc string, n_parts int, part_no int, content_type string,"
    " charset string, cte string, text string, n_chars int"
)


def eml_messages(files_df, on_error: str = "raise"):
    """`binaryFile` rows → one row per MIME leaf part — the
    warc_records/docx_paragraphs pattern for the mail modality.
    Message bytes never shuffle; rows out = leaves in."""
    import pandas as pd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                k.split(" ")[0]: [] for k in EML_SCHEMA.split(", ")
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    msg = parse_eml(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                base = os.path.basename(path)
                fa = msg["from_addr"]
                dom = fa.rsplit("@", 1)[1] if fa and "@" in fa else None
                for pno, part in enumerate(msg["parts"]):
                    rows["file"].append(base)
                    rows["subject"].append(msg["subject"])
                    rows["from_addr"].append(fa)
                    rows["from_domain"].append(dom)
                    rows["date_utc"].append(msg["date_utc"])
                    rows["n_parts"].append(len(msg["parts"]))
                    rows["part_no"].append(pno)
                    rows["content_type"].append(part["content_type"])
                    rows["charset"].append(part["charset"])
                    rows["cte"].append(part["cte"])
                    rows["text"].append(part["text"])
                    rows["n_chars"].append(
                        len(part["text"]) if part["text"] is not None else None
                    )
            yield pd.DataFrame(rows)

    from odin_rs_spark.deploy import ensure_shipped

    ensure_shipped(files_df.sparkSession)
    return files_df.select("path", "content").mapInPandas(fn, EML_SCHEMA)
