"""Brotli ctypes backend (sources/brotlidec): round trips against the
system library, http-body integration, and the named-rejection
fallback when no backend loads."""

from __future__ import annotations

import pytest

from odin_rs_spark.sources import brotlidec
from odin_rs_spark.sources.brotlidec import (
    brotli_available,
    brotli_compress,
    brotli_decompress,
    brotli_encoder_available,
)

needs_brotli = pytest.mark.skipif(
    not (brotli_available() and brotli_encoder_available()),
    reason="no system libbrotli",
)


@needs_brotli
def test_round_trips_all_shapes():
    for payload in (
        b"",
        b"x",
        b"the quick brown fox jumps over the lazy dog " * 100,
        bytes(range(256)) * 64,
    ):
        for q in (1, 5, 11):
            assert brotli_decompress(brotli_compress(payload, q)) == payload


@needs_brotli
def test_dictionary_referencing_text():
    """Quality 11 over common English emits static-dictionary refs —
    the machinery a pure-Python port could not re-derive."""
    text = (b"the quick brown fox jumps over the lazy dog. "
            b"information about the world and the people of the world. "
            b"http://www.example.com/index.html ") * 40
    comp = brotli_compress(text, quality=11)
    assert len(comp) < len(text) // 10
    assert brotli_decompress(comp) == text


@needs_brotli
def test_malformed_and_truncated_value_error():
    with pytest.raises(ValueError, match="malformed"):
        brotli_decompress(b"\xff\xff\xff\xffgarbage")
    comp = brotli_compress(b"hello hello hello", quality=9)
    with pytest.raises(ValueError, match="truncated"):
        brotli_decompress(comp[: len(comp) // 2])
    with pytest.raises(ValueError, match="trailing"):
        brotli_decompress(comp + b"extra")
    with pytest.raises(ValueError, match="max_output"):
        brotli_decompress(brotli_compress(b"a" * 100000), max_output=10)


@needs_brotli
def test_http_body_br_decodes():
    from odin_rs_spark.sources.warc import decode_http_body

    comp = brotli_compress(b"br wire body", quality=9)
    body, applied = decode_http_body({"content-encoding": "br"}, comp)
    assert body == b"br wire body" and applied == ["br"]


def test_named_rejection_when_backend_missing(monkeypatch):
    """Without a loadable libbrotlidec the 'br' coding keeps its named
    rejection (the environment-blocked-seam contract)."""
    from odin_rs_spark.sources.warc import decode_http_body

    monkeypatch.setattr(brotlidec, "_DEC", None)
    monkeypatch.setattr(brotlidec, "_TRIED", True)
    with pytest.raises(ValueError, match="'br'.*brotli"):
        decode_http_body({"content-encoding": "br"}, b"x")
