"""WARC/1.0 reader (sources/warc) — ISO 28500 record walk, gzip
member layout, HTTP response split, and the Spark scan operator."""

from __future__ import annotations

import os

import pytest

from odin_rs_spark.sources.warc import (
    chunk_encode,
    dechunk,
    decode_http_body,
    encode_http_response,
    encode_warc,
    gunzip_members,
    gzip_member,
    parse_warc,
    split_http_response,
    warc_records,
)

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "odin_rs_spark",
    "sources",
    "fixtures",
)


def _body_text(g: int) -> str:
    return "".join(f"w{(g * 7 + j) % 13} " for j in range(5 + g % 7))


def test_roundtrip_plain_and_gz():
    recs = [
        {"warc_type": "warcinfo", "block": b"software: x\r\n"},
        {
            "warc_type": "response",
            "target_uri": "https://a.example/1",
            "content_type": "application/http; msgtype=response",
            "block": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nhi",
        },
    ]
    for gz in (False, True):
        buf = encode_warc(recs, gzip_members=gz)
        back = parse_warc(buf)
        assert [r["headers"]["warc-type"] for r in back] == [
            "warcinfo",
            "response",
        ]
        assert back[1]["headers"]["warc-target-uri"] == "https://a.example/1"
        status, hh, body = split_http_response(back[1]["block"])
        assert (status, hh["content-type"], body) == (200, "text/html", b"hi")


def test_gzip_members_deterministic_and_concatenated():
    a, b = gzip_member(b"alpha"), gzip_member(b"beta")
    assert gzip_member(b"alpha") == a  # byte-stable fixture twin
    assert gunzip_members(a + b) == b"alphabeta"
    with pytest.raises(ValueError, match="truncated gzip"):
        gunzip_members(a[:-3])


def test_parse_errors_named():
    with pytest.raises(ValueError, match="missing WARC/"):
        parse_warc(b"NOPE/1.0\r\n\r\n")
    rec = encode_warc(
        [{"warc_type": "x", "block": b"12345"}], gzip_members=False
    )
    with pytest.raises(ValueError, match="runs past"):
        parse_warc(rec[:-9])  # truncate inside the block
    hdr_only = b"WARC/1.0\r\nWARC-Type: x\r\n\r\n12345\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(hdr_only)
    with pytest.raises(ValueError, match="malformed HTTP status"):
        split_http_response(b"zzz\r\n\r\nbody")


def test_fixture_files_match_formula():
    """The committed cc_*.warc.gz fixtures ARE the formula — this is
    their provenance check (and what the q153 oracle replays)."""
    for fn in range(3):
        path = os.path.join(FIXTURE_DIR, f"cc_{fn:02d}.warc.gz")
        recs = parse_warc(open(path, "rb").read())
        assert len(recs) == 25
        assert recs[0]["headers"]["warc-type"] == "warcinfo"
        for p in range(12):
            g = fn * 12 + p
            req, resp = recs[1 + 2 * p], recs[2 + 2 * p]
            assert req["headers"]["warc-type"] == "request"
            assert resp["headers"]["warc-type"] == "response"
            url = f"https://site{g % 7}.example.com/page/{g}"
            assert resp["headers"]["warc-target-uri"] == url
            status, hh, body = split_http_response(resp["block"])
            assert status == (404 if g % 5 == 0 else 200)
            assert hh["content-type"] == (
                "text/plain" if g % 3 == 0 else "text/html"
            )
            assert body.decode() == _body_text(g)


def test_chunked_and_content_coding_roundtrip():
    """HTTP wire decodings (RFC 9112 §7.1 chunked, RFC 9110 §8.4
    gzip/deflate): every encoder/decoder pair round-trips, in every
    combination, including 1-byte chunks."""
    body = b"the quick brown fox &#8217; jumps over 13 lazy dogs" * 7
    for cs in (1, 3, 16, 1000):
        assert dechunk(chunk_encode(body, cs)) == body
    # chunk extensions are ignored; trailers are ignored
    ext = b"5;name=v\r\nhello\r\n0\r\nX-Trailer: t\r\n\r\n"
    assert dechunk(ext) == b"hello"
    for chunked in (False, True):
        for ce in (None, "gzip", "deflate"):
            msg = encode_http_response(
                body, status=206, mime="text/x", chunked=chunked,
                content_encoding=ce, chunk_size=5,
            )
            st, hh, raw = split_http_response(msg)
            dec, applied = decode_http_body(hh, raw)
            assert (st, hh["content-type"], dec) == (206, "text/x", body)
            want = (["chunked"] if chunked else []) + ([ce] if ce else [])
            assert applied == want
    # raw-deflate servers (no zlib wrapper) are tolerated
    import zlib

    raw_deflate = zlib.compressobj(wbits=-15)
    blob = raw_deflate.compress(body) + raw_deflate.flush()
    dec, applied = decode_http_body({"content-encoding": "deflate"}, blob)
    assert dec == body and applied == ["deflate"]


def test_http_decode_errors_named():
    with pytest.raises(ValueError, match="bad chunk size"):
        dechunk(b"zz\r\nhello\r\n0\r\n\r\n")
    with pytest.raises(ValueError, match="missing chunk-size"):
        dechunk(b"5")
    with pytest.raises(ValueError, match="runs past"):
        dechunk(b"ff\r\nshort\r\n0\r\n\r\n")
    with pytest.raises(ValueError, match="not CRLF-terminated"):
        dechunk(b"5\r\nhelloXX0\r\n\r\n")
    with pytest.raises(ValueError, match="unsupported Content-Encoding"):
        decode_http_body({"content-encoding": "compress"}, b"x")
    with pytest.raises(ValueError):  # br: malformed (backend) or named
        decode_http_body({"content-encoding": "br"}, b"x")
    with pytest.raises(ValueError, match="gzip body"):
        decode_http_body({"content-encoding": "gzip"}, b"not gzip")


def test_charset_resolution():
    """WHATWG-grade charset pick: header param > meta prescan >
    UTF-8; iso-8859-1 aliases to cp1252; liars fall back to
    replacement decoding; names normalize to the codec registry."""
    from odin_rs_spark.sources.warc import decode_body_text, resolve_charset

    assert resolve_charset("text/html; charset=windows-1252", b"") == "cp1252"
    assert resolve_charset("text/html; charset=ISO-8859-1", b"") == "cp1252"
    assert resolve_charset('text/html; charset="utf-8"', b"") == "utf-8"
    assert resolve_charset(None, b'<meta charset="cp1252">x') == "cp1252"
    assert (
        resolve_charset(
            None,
            b'<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">',
        )
        == "cp1252"
    )
    # meta outside the 1024-byte prescan window is ignored
    far = b" " * 1100 + b'<meta charset="cp1252">'
    assert resolve_charset(None, far) == "utf-8"
    # header beats meta; unknown charsets fall back to utf-8
    assert resolve_charset("a; charset=utf-8", b'<meta charset="cp1252">') == "utf-8"
    assert resolve_charset("a; charset=klingon-9", b"") == "utf-8"

    t, cs = decode_body_text("x; charset=windows-1252", b"caf\xe9 \x80")
    assert (t, cs) == ("café €", "cp1252")
    # declared utf-8 over invalid bytes -> replacement fallback
    t, cs = decode_body_text("x; charset=utf-8", b"bad \xe9!")
    assert (t, cs) == ("bad �!", "utf-8")


def _cc2_prose(g: int) -> str:
    nw = 40 + 15 * (g % 3)
    return " ".join(
        "the" if j % 5 == 0 else ("and" if j % 5 == 3 else f"w{(g * 3 + j) % 11}x")
        for j in range(nw)
    )


def _cc2_html(g: int) -> str:
    # the commented-out block carries a '</p>' — it must vanish BEFORE
    # block splitting, or extract_main_text sees a ghost block boundary
    return (
        '<div><a href="/">home</a> nav links</div>'
        "<!-- <p>retired promo</p> --><p>" + _cc2_prose(g) + "</p>"
    )


def test_cc2_fixture_files_match_formula():
    """The committed cc2_*.warc.gz fixtures (chunked/gzipped HTTP
    bodies — the real Common Crawl wire shape) ARE the formula; the
    q174 oracle replays it. Encoding mix by g%4: identity / gzip /
    chunked / chunked+gzip."""
    for fn in range(2):
        path = os.path.join(FIXTURE_DIR, f"cc2_{fn:02d}.warc.gz")
        recs = parse_warc(open(path, "rb").read())
        assert len(recs) == 21
        for p in range(10):
            g = fn * 10 + p
            resp = recs[2 + 2 * p]
            assert resp["headers"]["warc-type"] == "response"
            url = f"https://crawl{g % 5}.example.net/doc/{g}"
            assert resp["headers"]["warc-target-uri"] == url
            st, hh, raw = split_http_response(resp["block"])
            assert st == (404 if g % 7 == 0 else 200)
            dec, applied = decode_http_body(hh, raw)
            assert dec.decode() == _cc2_html(g)
            want = {0: [], 1: ["gzip"], 2: ["chunked"], 3: ["chunked", "gzip"]}
            assert applied == want[g % 4]
            # the stored body really is encoded on the wire
            if applied:
                assert raw != dec


def test_warc_records_spark(spark, tmp_path):
    recs = [
        {"warc_type": "warcinfo", "block": b"software: x\r\n"},
        {
            "warc_type": "response",
            "target_uri": "https://a.example/p",
            "content_type": "application/http; msgtype=response",
            "block": b"HTTP/1.1 301 Moved\r\nContent-Type: text/html\r\n\r\ngone",
        },
        {
            "warc_type": "response",
            "target_uri": "https://a.example/z",
            "content_type": "application/http; msgtype=response",
            "block": encode_http_response(
                b"wire-decoded!", chunked=True, content_encoding="gzip",
                chunk_size=4,
            ),
        },
    ]
    good = tmp_path / "a.warc.gz"
    good.write_bytes(encode_warc(recs))
    bad = tmp_path / "b.warc.gz"
    bad.write_bytes(b"\x1f\x8bnot really gzip")

    files = spark.read.format("binaryFile").load(str(good))
    rows = {r.rec_no: r for r in warc_records(files).collect()}
    assert rows[0].warc_type == "warcinfo" and rows[0].http_status is None
    r = rows[1]
    assert (r.warc_type, r.http_status, r.mime, r.body_text, r.body_len) == (
        "response",
        301,
        "text/html",
        "gone",
        4,
    )
    assert r.file == "a.warc.gz" and r.target_uri == "https://a.example/p"
    assert r.http_encoding is None
    z = rows[2]
    assert (z.body_text, z.http_encoding, z.body_len) == (
        "wire-decoded!",
        "chunked+gzip",
        13,
    )

    both = spark.read.format("binaryFile").load(
        [str(good), str(bad)]
    )
    kept = warc_records(both, on_error="skip").collect()
    assert {r.file for r in kept} == {"a.warc.gz"}
    with pytest.raises(Exception):
        warc_records(both).collect()


def test_residual_transfer_codings_raise():
    """ADVICE r8: 'Transfer-Encoding: gzip, chunked' must raise after
    dechunking (the gzip TRANSFER coding is still applied — shipping
    it as decoded text is the failure decode_http_body exists to
    prevent); 'chunked, identity' stays fine."""
    from odin_rs_spark.sources.warc import chunk_encode, decode_http_body

    framed = chunk_encode(b"hello world")
    with pytest.raises(ValueError, match="unsupported Transfer-Encoding.*gzip"):
        decode_http_body({"transfer-encoding": "gzip, chunked"}, framed)
    dec, applied = decode_http_body(
        {"transfer-encoding": "chunked, identity"}, framed
    )
    assert dec == b"hello world" and applied == ["chunked"]


def test_brotli_named_rejection_and_zstd_real_decode():
    """Brotli decodes via the ctypes backend where a system libbrotli
    exists (test_brotli.py), with a SPECIFIC named rejection elsewhere
    (the grib2 JPEG2000 pattern, pinned by monkeypatch there); zstd is
    a REAL decode since r10 (sources/zstdcodec), both for
    Content-Encoding: zstd bodies and .warc.zst containers."""
    with pytest.raises(ValueError):  # malformed via backend, or named
        decode_http_body({"content-encoding": "br"}, b"x")

    from odin_rs_spark.sources.zstdcodec import zstd_compress_store

    body, applied = decode_http_body(
        {"content-encoding": "zstd"}, zstd_compress_store(b"real zstd body")
    )
    assert body == b"real zstd body" and applied == ["zstd"]
    # corrupt zstd still one catchable ValueError
    with pytest.raises(ValueError):
        decode_http_body({"content-encoding": "zstd"}, b"\x28\xb5\x2f\xfdxx")

    # .warc.zst container: zstd frames of a full WARC stream
    plain = encode_warc(
        [{"warc_type": "warcinfo", "block": b"software: zst-fixture\r\n"}],
        gzip_members=False,
    )
    recs = parse_warc(zstd_compress_store(plain))
    assert len(recs) == 1 and recs[0]["headers"]["warc-type"] == "warcinfo"
    with pytest.raises(ValueError):
        parse_warc(b"\x28\xb5\x2f\xfd" + b"\x00" * 32)


def test_warc_tag_mode_and_revisit_resolution(spark, tmp_path):
    """on_error='tag' keeps undecodable records as auditable rows
    (named error, NO body shipped) and corrupt FILES as one row;
    resolve_revisits equi-joins revisits to the FIRST original per
    digest and leaves unmatched ones resolved=false."""
    from odin_rs_spark.sources.warc import resolve_revisits, warc_records

    def resp(uri, digest, body=b"ok body", ce=None):
        if ce:
            blk = (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Encoding: {ce}\r\nContent-Length: {len(body)}\r\n\r\n"
            ).encode() + body
        else:
            blk = (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
        return {
            "warc_type": "response", "target_uri": uri,
            "payload_digest": digest,
            "content_type": "application/http; msgtype=response",
            "block": blk,
        }

    recs = [
        resp("https://a.ex/1", "sha1:X", b"first capture"),
        resp("https://a.ex/2", "sha1:X", b"first capture"),  # later dup
        resp("https://a.ex/3", "sha1:Y", b"other", ce="br"),  # tagged
        {
            "warc_type": "revisit", "target_uri": "https://a.ex/1b",
            "payload_digest": "sha1:X", "refers_to": "<urn:uuid:x>",
            "profile": "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest",
            "block": b"",
        },
        {
            "warc_type": "revisit", "target_uri": "https://a.ex/zz",
            "payload_digest": "sha1:NOPE", "block": b"",
        },
    ]
    good = tmp_path / "rv.warc.gz"
    good.write_bytes(encode_warc(recs))
    bad = tmp_path / "zz.warc.gz"
    bad.write_bytes(b"\x28\xb5\x2f\xfd" + b"\x00" * 16)
    df = warc_records(
        spark.read.format("binaryFile").load(str(tmp_path)), on_error="tag"
    )
    rows = {(r.file, r.rec_no): r for r in df.collect()}
    tagged = rows[("rv.warc.gz", 2)]
    assert "brotli" in tagged.decode_error and tagged.body_text is None
    assert tagged.body_len is None and tagged.http_status == 200
    filerow = rows[("zz.warc.gz", -1)]
    assert "zstd" in filerow.decode_error and filerow.warc_type is None
    ok = rows[("rv.warc.gz", 0)]
    assert ok.decode_error is None and ok.payload_digest == "sha1:X"

    res = {r.target_uri: r for r in resolve_revisits(df).collect()}
    hit = res["https://a.ex/1b"]
    assert hit.resolved and hit.orig_uri == "https://a.ex/1"  # FIRST capture
    assert hit.orig_body_text == "first capture"
    miss = res["https://a.ex/zz"]
    assert not miss.resolved and miss.orig_uri is None


def test_resolve_redirects_edge_semantics(spark, tmp_path):
    """Redirect chains: relative Location resolves against the
    redirecting URI; duplicate captures of one source keep ONE edge
    (min dst); a chain onto an uncaptured URL is 'dangling'; a
    self-redirect is a 'loop'."""
    from odin_rs_spark.sources.warc import resolve_redirects, warc_records

    def resp(uri, status, location=None, body=b""):
        hdrs = f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n"
        if location:
            hdrs += f"Location: {location}\r\n"
        hdrs += f"Content-Length: {len(body)}\r\n\r\n"
        return {
            "warc_type": "response", "target_uri": uri,
            "content_type": "application/http; msgtype=response",
            "block": hdrs.encode() + body,
        }

    recs = [
        resp("https://a.ex/old", 301, "new"),        # relative
        resp("https://a.ex/old", 302, "zzz"),        # later dup capture
        resp("https://a.ex/new", 200, body=b"ok"),
        resp("https://a.ex/self", 302, "/self"),     # 1-cycle
        resp("https://a.ex/drop", 301, "/nowhere"),
    ]
    p = tmp_path / "r.warc.gz"
    p.write_bytes(encode_warc(recs))
    df = warc_records(spark.read.format("binaryFile").load(str(p)))
    got = {r.start_uri: r for r in resolve_redirects(df).collect()}
    old = got["https://a.ex/old"]
    assert (old.final_uri, old.n_hops, old.status) == (
        "https://a.ex/new", 1, "resolved"  # min dst: 'new' < 'zzz'
    )
    assert got["https://a.ex/self"].status == "loop"
    drop = got["https://a.ex/drop"]
    assert (drop.final_uri, drop.status) == ("https://a.ex/nowhere", "dangling")
    # the location column itself is surfaced
    locs = {r.target_uri: r.location for r in df.collect()}
    assert locs["https://a.ex/self"] == "/self"
    assert locs["https://a.ex/new"] is None
