"""EML/MIME parser (sources/mail): twin round-trips cross-checked
against the stdlib email package (two independent implementations
agreeing on the same bytes pins both), plus RFC seam and robustness
pins in the repo's fuzz discipline."""

from __future__ import annotations

import email
import email.policy

import pytest

from odin_rs_spark.sources.mail import (
    addr_spec,
    decode_encoded_words,
    encode_eml,
    parse_date,
    parse_eml,
)

CASES = [
    dict(
        subject="Plain hello",
        from_addr="a@ex.com",
        date="Tue, 1 Jul 2003 10:52:37 +0200",
        parts=[("text/plain", "us-ascii", "hello body")],
    ),
    dict(
        subject="Café résumé",
        from_addr="b.c@ex.org",
        date="Mon, 5 Jan 2015 23:10:00 -0500",
        parts=[
            ("text/plain", "utf-8", "café — body"),
            ("text/html", "cp1252", "<p>déjà</p>"),
        ],
        subject_encoding="B",
    ),
    dict(
        subject="Nested one",
        from_addr="d@ex.net",
        date="1 Feb 2020 00:00 GMT",
        parts=[
            ("text/plain", "us-ascii", "aaa"),
            ("text/html", "utf-8", "<i>bbb</i>"),
        ],
        subject_encoding="Q",
        nested=True,
    ),
]


class TestStdlibCrossCheck:
    @pytest.mark.parametrize("case", CASES)
    def test_agrees_with_stdlib(self, case):
        raw = encode_eml(**case)
        mine = parse_eml(raw)
        std = email.message_from_bytes(
            raw.replace(b"\n", b"\r\n"), policy=email.policy.default
        )
        sparts = [
            (p.get_content_type(), p.get_content())
            for p in std.walk()
            if not p.is_multipart()
        ]
        assert len(mine["parts"]) == len(sparts)
        for mp, (ct, txt) in zip(mine["parts"], sparts):
            assert mp["content_type"] == ct
            assert mp["text"] == txt.rstrip("\n")
        assert mine["subject"] == str(std["subject"])
        assert mine["from_addr"] in str(std["from"])


class TestSeams:
    def test_header_unfolding(self):
        raw = b"Subject: one\n two\nFrom: x@y.z\n\nbody"
        assert parse_eml(raw)["subject"] == "one two"

    def test_encoded_word_join_rule(self):
        # WSP between two adjacent encoded words is transparent (§6.2)
        s = "=?utf-8?B?YWI=?= =?utf-8?B?Y2Q=?="
        assert decode_encoded_words(s) == "abcd"
        # ...but WSP next to a plain token is preserved
        assert decode_encoded_words("x =?utf-8?Q?y?=") == "x y"

    def test_q_underscore_is_space(self):
        assert decode_encoded_words("=?utf-8?Q?a_b?=") == "a b"

    def test_date_zones(self):
        assert parse_date("1 Mar 2024 00:30:00 +0100") == "2024-02-29T23:30:00Z"
        assert parse_date("Tue, 1 Jul 2003 10:52:37 GMT") == "2003-07-01T10:52:37Z"
        with pytest.raises(ValueError):
            parse_date("not a date")

    def test_named_us_zones_rfc5322(self):
        """RFC 5322 §4.3 assigns the eight named US zones specific
        offsets (ADVICE r9); military/unknown alpha zones stay -0000."""
        assert parse_date("Mon, 3 Jan 2000 12:00:00 EST") == "2000-01-03T17:00:00Z"
        assert parse_date("Mon, 3 Jan 2000 12:00:00 EDT") == "2000-01-03T16:00:00Z"
        assert parse_date("Mon, 3 Jan 2000 12:00:00 CST") == "2000-01-03T18:00:00Z"
        assert parse_date("Mon, 3 Jan 2000 12:00:00 PDT") == "2000-01-03T19:00:00Z"
        assert parse_date("Mon, 3 Jan 2000 12:00:00 PST") == "2000-01-03T20:00:00Z"
        # single-letter military zone: no information -> -0000
        assert parse_date("Mon, 3 Jan 2000 12:00:00 K") == "2000-01-03T12:00:00Z"

    def test_addr_spec_forms(self):
        assert addr_spec("Name <A.B@Ex.COM>") == "a.b@ex.com"
        assert addr_spec("c@d.org (comment)") == "c@d.org"
        assert addr_spec("no address here") is None

    def test_charset_whatwg_alias(self):
        raw = (
            b"From: a@b.c\nContent-Type: text/plain; charset=iso-8859-1\n"
            b"Content-Transfer-Encoding: quoted-printable\n\nsmart =93q=94"
        )
        # 0x93/0x94 are curly quotes in cp1252 but C1 controls in real
        # iso-8859-1 — the WHATWG alias rule decodes the web/mail reality
        assert parse_eml(raw)["parts"][0]["text"] == "smart “q”"


class TestRobustness:
    def test_errors_are_valueerror_only(self):
        bad = [
            b"no colon header\n\nbody",
            b"From: a@b.c\nContent-Type: multipart/mixed\n\nno boundary",
            b"From: a@b.c\nContent-Type: multipart/mixed; boundary=q\n\nno parts",
            b"From: a@b.c\nContent-Transfer-Encoding: uuencode\n\nx",
            b"From: a@b.c\nDate: 99 Zzz 2024 10:00:00\n\nx",
        ]
        for raw in bad:
            with pytest.raises(ValueError):
                parse_eml(raw)

    def test_truncation_ladder(self):
        raw = encode_eml(**CASES[1])
        for cut in range(0, len(raw), 7):
            try:
                parse_eml(raw[:cut])
            except ValueError:
                pass  # rejecting is fine; any other exception is a bug

    def test_depth_bound(self):
        body = b"x"
        for i in range(12):
            body = (
                b"Content-Type: multipart/mixed; boundary=b%d\n\n--b%d\n" % (i, i)
                + body
                + b"\n--b%d--\n" % i
            )
        with pytest.raises(ValueError):
            parse_eml(b"From: a@b.c\n" + body)
