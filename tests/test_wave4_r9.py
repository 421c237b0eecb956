"""Round-9 fourth wave: MIME sniffing, rel=canonical, robots-meta
gating, C4 line filters, rendezvous sharding."""

from __future__ import annotations

from pyspark.sql import functions as F

from odin_rs_spark.sources.warc import sniff_mime


class TestSniffMime:
    def test_html_tags_ws_skip_and_case(self):
        assert sniff_mime(b"  \t\r\n<!doctype html><p>x") == "text/html"
        assert sniff_mime(b"<HTML>") == "text/html"
        assert sniff_mime(b"<p>hello") == "text/html"
        # a tag pattern NOT terminated by space/'>' is not HTML —
        # '<pre' matches the '<P' pattern but 'r' is not a terminator
        assert sniff_mime(b"<pre>x</pre>") == "text/plain"

    def test_binary_prefixes(self):
        assert sniff_mime(b"\x89PNG\r\n\x1a\nrest") == "image/png"
        assert sniff_mime(b"\xff\xd8\xff\xe0JFIF") == "image/jpeg"
        assert sniff_mime(b"GIF87a" + b"x") == "image/gif"
        assert sniff_mime(b"GIF89a" + b"x") == "image/gif"
        assert sniff_mime(b"%PDF-1.7") == "application/pdf"
        assert sniff_mime(b"PK\x03\x04zzz") == "application/zip"
        assert sniff_mime(b"\x1f\x8b\x08\x00") == "application/x-gzip"
        assert sniff_mime(b"BMxxxx") == "image/bmp"
        assert sniff_mime(b"\x00\x00\x01\x00x") == "image/x-icon"
        assert sniff_mime(b"ID3\x04tag") == "audio/mpeg"

    def test_riff_and_ftyp_consult_format_field(self):
        assert sniff_mime(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "audio/wave"
        assert sniff_mime(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "image/webp"
        assert sniff_mime(b"RIFF\x00\x00\x00\x00AVI LIST") == "video/avi"
        assert sniff_mime(b"\x00\x00\x00\x18ftypisom") == "video/mp4"
        # RIFF with an unknown format falls to the binary scan
        assert sniff_mime(b"RIFF\x00\x00\x00\x00XXXX") == (
            "application/octet-stream"
        )

    def test_text_or_binary_fallback(self):
        assert sniff_mime(b"just some words") == "text/plain"
        assert sniff_mime(b"") == "text/plain"
        assert sniff_mime(b"\xef\xbb\xbfutf8 bom") == "text/plain"
        assert sniff_mime(b"\xfe\xff\x00h") == "text/plain"
        assert sniff_mime(b"has\x00nul") == "application/octet-stream"
        # 0x1B (ESC) is a binary data byte; 0x09/0x0A/0x0D are not
        assert sniff_mime(b"tab\tnl\ncr\r ok") == "text/plain"
        # 0x1B (ESC) is deliberately NOT in the spec's binary set
        assert sniff_mime(b"esc\x1b[0m") == "text/plain"
        assert sniff_mime(b"bell\x07") == "application/octet-stream"

    def test_warc_records_carries_sniffed_mime(self, spark):
        from odin_rs_spark.plans.catalog import _q215_media
        from odin_rs_spark.sources.warc import warc_records

        rows = (
            warc_records(_q215_media(spark))
            .filter(F.col("warc_type") == "response")
            .select("mime", "sniffed_mime")
            .collect()
        )
        assert len(rows) == 48
        # the fixture lies by one slot when i % 3 == 0 → 16 mismatches
        lies = [
            r for r in rows
            if r.mime.split(";")[0].strip() != r.sniffed_mime
        ]
        assert len(lies) == 16


class TestCanonicalUrl:
    def _one(self, spark, html, page="https://s.example.org/a/b"):
        from odin_rs_spark.operators.web import canonical_url

        df = spark.range(1).select(
            F.lit(html).alias("html"), F.lit(page).alias("page")
        )
        return df.select(canonical_url("html", "page").alias("c")).head().c

    def test_attribute_orders_and_quoting(self, spark):
        t = "https://s.example.org/canon"
        assert self._one(
            spark, f'<head><link rel="canonical" href="{t}"></head>'
        ) == t
        assert self._one(
            spark, f"<head><link href='{t}' rel=canonical></head>"
        ) == t
        assert self._one(spark, f"<link href={t} rel='canonical'>") == t

    def test_relative_href_resolves_against_page(self, spark):
        got = self._one(
            spark,
            '<link rel="canonical" href="/x/y">',
            page="https://s.example.org/a/b",
        )
        assert got == "https://s.example.org/x/y"

    def test_missing_link_falls_back_to_self(self, spark):
        page = "https://s.example.org/a/b"
        assert self._one(spark, "<html><body>x</body></html>", page) == page
        # a non-canonical link must not match
        assert self._one(
            spark, '<link rel="stylesheet" href="/s.css">', page
        ) == page


class TestRobotsMetaFlags:
    def _flags(self, spark, html, header=None):
        from odin_rs_spark.operators.web import robots_meta_flags

        df = spark.range(1).select(
            F.lit(html).alias("html"),
            F.lit(header).cast("string").alias("hdr"),
        )
        r = df.select(robots_meta_flags("html", "hdr").alias("f")).head().f
        return r.noindex, r.nofollow

    def test_meta_tokens(self, spark):
        h = '<meta name="robots" content="noindex, nofollow">'
        assert self._flags(spark, h) == (True, True)
        h = "<meta content='nofollow' name=robots>"
        assert self._flags(spark, h) == (False, True)
        assert self._flags(spark, '<meta name="robots" content="none">') == (
            True, True
        )

    def test_header_unions_with_meta(self, spark):
        assert self._flags(spark, "<p>x</p>", "noindex") == (True, False)
        h = "<meta name=ROBOTS content=noindex>"
        assert self._flags(spark, h, "nofollow") == (True, True)

    def test_token_boundaries(self, spark):
        # 'noindexing' in an unrelated meta must NOT fire
        h = '<meta name="keywords" content="noindexing,x">'
        assert self._flags(spark, h) == (False, False)
        h = '<meta name="robots" content="noindexing">'
        assert self._flags(spark, h) == (False, False)


class TestC4LineFilter:
    def _run(self, spark, text):
        from odin_rs_spark.operators.text import c4_line_filter

        df = spark.range(1).select(F.lit(text).alias("text"))
        return c4_line_filter(df).head()

    def test_line_rules(self, spark):
        r = self._run(
            spark,
            "This sentence is long enough to keep.\n"
            "too short.\n"
            "this has no terminal punctuation here\n"
            "Please enable JavaScript to continue browsing now.\n"
            'He said the quoted line counts too."',
        )
        assert r.n_lines == 5
        assert r.n_kept_lines == 2  # first and quoted-terminal lines
        assert "JavaScript" not in r.clean_text
        assert r.clean_text.endswith('"')

    def test_page_rules(self, spark):
        ok = (
            "One good sentence stands right here.\n"
            "Another good sentence stands right here!\n"
            "A third good sentence stands right here?"
        )
        r = self._run(spark, ok)
        assert (r.f_lorem, r.f_brace, r.f_sentences, r.c4_pass) == (1, 1, 1, 1)
        r = self._run(spark, ok + "\nlorem ipsum dolor sit amet today.")
        assert (r.f_lorem, r.c4_pass) == (0, 0)
        r = self._run(spark, ok + "\nif (x) { return; }")
        assert (r.f_brace, r.c4_pass) == (0, 0)
        r = self._run(spark, "Only two sentences are kept here.\nAnd this.")
        assert r.f_sentences == 0

    def test_whitespace_lines_trimmed(self, spark):
        r = self._run(spark, "   Padded sentence with five good words.   ")
        assert r.n_kept_lines == 1
        assert r.clean_text == "Padded sentence with five good words."


class TestRendezvousAssign:
    def test_matches_reference_and_minimal_churn(self, spark):
        import hashlib

        from odin_rs_spark.operators.skew import rendezvous_assign

        nodes = ["n0", "n1", "n2"]
        hosts = [f"h{i}" for i in range(50)]
        df = spark.createDataFrame([(h,) for h in hosts], ["host"])
        out = rendezvous_assign(df, "host", nodes, out_col="a3")
        out = rendezvous_assign(out, "host", nodes[:2], out_col="a2")
        got = {r.host: (r.a3, r.a2) for r in out.collect()}

        def ref(h, ns):
            return max(
                ns,
                key=lambda n: hashlib.md5(f"{h}|{n}".encode()).hexdigest(),
            )

        for h in hosts:
            assert got[h][0] == ref(h, nodes)
            assert got[h][1] == ref(h, nodes[:2])
            # minimal churn: keys not owned by the removed node stay
            if got[h][0] != "n2":
                assert got[h][1] == got[h][0]

    def test_zero_shuffle_plan(self, spark):
        from odin_rs_spark.operators.skew import rendezvous_assign

        df = spark.range(10).select(F.col("id").cast("string").alias("host"))
        plan = rendezvous_assign(df, "host", ["a", "b"])._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestTiffCodec:
    def _img(self):
        import numpy as np

        return (
            (np.arange(18)[:, None] * 3 + np.arange(25)[None, :] * 7) % 256
        ).astype("uint8")

    def test_roundtrip_all_seams(self):
        from odin_rs_spark.sources.imagecodec import decode_tiff, encode_tiff

        img = self._img()
        for kw in (
            {},
            {"packbits": True},
            {"big_endian": True},
            {"rows_per_strip": 5},
            {"packbits": True, "rows_per_strip": 4, "big_endian": True},
            {"white_is_zero": True},
            {"white_is_zero": True, "packbits": True, "rows_per_strip": 7},
        ):
            assert (decode_tiff(encode_tiff(img, **kw)) == img).all(), kw

    def test_rgb_roundtrip(self):
        import numpy as np

        from odin_rs_spark.sources.imagecodec import decode_tiff, encode_tiff

        img = self._img()
        rgb = np.stack(
            [img, (img.astype(int) + 5) % 256, (img.astype(int) + 9) % 256],
            axis=2,
        ).astype("uint8")
        for kw in ({}, {"packbits": True, "rows_per_strip": 7},
                   {"big_endian": True}):
            out = decode_tiff(encode_tiff(rgb, **kw))
            assert out.shape == (18, 25, 3)
            assert (out == rgb).all(), kw

    def test_packbits_known_answer(self):
        # the TIFF 6.0 §9 worked example
        from odin_rs_spark.sources.imagecodec import (
            packbits_decode,
            packbits_encode,
        )

        plain = bytes.fromhex(
            "aaaaaa80002aaaaaaaaa80002a22aaaaaaaaaaaaaaaaaaaa"
        )
        packed = bytes.fromhex("feaa0280002afdaa0380002a22f7aa")
        assert packbits_decode(packed, len(plain)) == plain
        # our encoder is run-favoring, not byte-identical to the
        # example — but it must roundtrip
        assert packbits_decode(packbits_encode(plain), len(plain)) == plain

    def test_named_rejections(self):
        import numpy as np
        import pytest

        from odin_rs_spark.sources.imagecodec import decode_tiff, encode_tiff

        with pytest.raises(ValueError, match="not a TIFF"):
            decode_tiff(b"nope")
        buf = bytearray(encode_tiff(self._img()))
        # flip the compression SHORT (tag 259) to LZW (5)
        idx = buf.find((259).to_bytes(2, "little"))
        buf[idx + 8] = 5
        with pytest.raises(ValueError, match="compression 5"):
            decode_tiff(bytes(buf))
        with pytest.raises(ValueError, match="gray images only"):
            encode_tiff(np.zeros((4, 4, 3), "uint8"), white_is_zero=True)

    def test_dispatch(self):
        from odin_rs_spark.sources.imagecodec import decode_image, encode_tiff

        img = self._img()
        assert (decode_image(encode_tiff(img)) == img).all()
        assert (
            decode_image(encode_tiff(img, big_endian=True)) == img
        ).all()


class TestTiffFuzz:
    """The parser-fuzz discipline every codec in this repo follows:
    truncation at every boundary and byte mutations must raise
    ValueError (never IndexError/struct.error/silent garbage), and
    must do so fast (no EOF spins)."""

    def test_truncation_ladder(self):
        import pytest

        from odin_rs_spark.sources.imagecodec import decode_tiff, encode_tiff
        import numpy as np

        img = (
            (np.arange(12)[:, None] * 5 + np.arange(17)[None, :]) % 256
        ).astype("uint8")
        buf = encode_tiff(img, packbits=True, rows_per_strip=4)
        full = decode_tiff(buf)
        for cut in range(0, len(buf), 7):
            try:
                out = decode_tiff(buf[:cut])
                # a prefix that still decodes must decode CORRECTLY
                assert (out == full).all()
            except ValueError:
                pass
            except Exception as exc:  # noqa: BLE001
                pytest.fail(f"cut={cut}: non-ValueError {type(exc)}")

    def test_mutation_sweep(self):
        import pytest

        import numpy as np

        from odin_rs_spark.sources.imagecodec import decode_tiff, encode_tiff

        img = ((np.arange(10)[:, None] * 3 + np.arange(11)) % 256).astype(
            "uint8"
        )
        buf = bytearray(encode_tiff(img))
        for pos in range(0, min(len(buf), 120)):
            mut = bytearray(buf)
            mut[pos] ^= 0xFF
            try:
                decode_tiff(bytes(mut))
            except ValueError:
                pass
            except Exception as exc:  # noqa: BLE001
                pytest.fail(f"pos={pos}: non-ValueError {type(exc)}")

    def test_sniff_never_raises(self):
        import hashlib

        from odin_rs_spark.sources.warc import sniff_mime

        # deterministic pseudo-random byte strings of varied length —
        # sniffing untrusted bytes must never throw
        for i in range(300):
            b = hashlib.sha256(str(i).encode()).digest() * (i % 5 + 1)
            out = sniff_mime(b[: i * 7 % 1600])
            assert isinstance(out, str) and "/" in out


class TestRobotsMetaMultipleTags:
    def test_directives_union_across_tags(self, spark):
        from odin_rs_spark.operators.web import robots_meta_flags

        html = (
            '<meta name="robots" content="noindex">'
            "<meta name=viewport content=x>"
            "<meta name='robots' content='nofollow'>"
        )
        df = spark.range(1).select(F.lit(html).alias("html"))
        r = df.select(robots_meta_flags("html").alias("f")).head().f
        assert (r.noindex, r.nofollow) == (True, True)


class TestWave5:
    def test_encrypted_pdf_named_rejection(self):
        import pytest

        from odin_rs_spark.sources.pdfcodec import (
            encode_pdf,
            parse_pdf_info,
            parse_pdf_text,
        )

        buf = encode_pdf([["hello there"]], encrypt_stub=True)
        with pytest.raises(ValueError, match="encrypted PDF"):
            parse_pdf_text(buf)
        info = parse_pdf_info(buf)
        # provenance stays scannable: the page TREE is not encrypted
        assert info["encrypted"] is True and info["n_pages"] == 1
        plain = encode_pdf([["hello there"]])
        assert parse_pdf_info(plain)["encrypted"] is False
        assert parse_pdf_text(plain) == ["hello there"]

    def test_concurrent_to_roundtrip(self):
        from odin_rs_spark.sources.warc import encode_warc, parse_warc

        recs = [{
            "warc_type": "request",
            "target_uri": "https://a/",
            "concurrent_to": "<urn:uuid:resp-1>",
            "block": b"GET / HTTP/1.1\r\nUser-Agent: bot\r\n\r\n",
        }]
        r = parse_warc(encode_warc(recs))[0]
        assert r["headers"]["warc-concurrent-to"] == "<urn:uuid:resp-1>"


class TestWaveHardening:
    def test_robots_name_boundary(self, spark):
        from odin_rs_spark.operators.web import robots_meta_flags

        # an unquoted name=robotsxyz meta must NOT be treated as a
        # robots tag even though 'robots' is its prefix
        html = "<meta name=robotsxyz content=noindex>"
        df = spark.range(1).select(F.lit(html).alias("html"))
        r = df.select(robots_meta_flags("html").alias("f")).head().f
        assert (r.noindex, r.nofollow) == (False, False)

    def test_c4_tab_separated_words_count(self, spark):
        from odin_rs_spark.operators.text import c4_line_filter

        df = spark.range(1).select(
            F.lit("one\ttwo\tthree\tfour\tfive words here.").alias("text")
        )
        r = c4_line_filter(df).head()
        assert r.n_kept_lines == 1  # 7 words when tabs split

    def test_frontier_uppercase_scheme(self, spark):
        from odin_rs_spark.operators.web import frontier_url_signals

        df = spark.range(1).select(
            F.lit("HTTPS://h.example.org/a/b/c").alias("url")
        )
        r = frontier_url_signals(df).head()
        assert r.depth == 3
