"""Brotli (RFC 7932) decode via a ctypes binding to the system
libbrotli — gated behind a load-try, the sanctioned pattern for
capabilities the Python stdlib lacks.

Why not a pure-Python spec codec like zstdcodec.py: RFC 7932 hard-
codes a 122,784-byte static dictionary and 121 transform rows
(Appendices A/B) that cannot be re-derived — only copied — and no
copy ships in this container's Python environment. The C library
(public, BSD-licensed, stable ABI) IS present here
(libbrotlidec/libbrotlienc), so the binding turns the engine's
`Content-Encoding: br` named rejection into a real decode wherever a
system brotli exists, and decode_http_body falls back to the same
named rejection everywhere else. `brotli_available()` is the probe.

The encoder binding exists for fixture generation only (tests and the
q275 fixture build real brotli wire bytes in executors).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os

_SEARCH = (
    "libbrotlidec.so.1", "libbrotlidec.so",
    "/root/miniconda/lib/libbrotlidec.so.1",
    "/usr/lib/x86_64-linux-gnu/libbrotlidec.so.1",
)
_SEARCH_ENC = tuple(p.replace("dec", "enc") for p in _SEARCH)

_DEC = None
_ENC = None
_TRIED = False


def _load() -> None:
    global _DEC, _ENC, _TRIED
    if _TRIED:
        return
    _TRIED = True
    for cand in _SEARCH:
        try:
            _DEC = ctypes.CDLL(cand)
            break
        except OSError:
            continue
    else:
        found = ctypes.util.find_library("brotlidec")
        if found:
            try:
                _DEC = ctypes.CDLL(found)
            except OSError:
                _DEC = None
    for cand in _SEARCH_ENC:
        try:
            _ENC = ctypes.CDLL(cand)
            break
        except OSError:
            continue
    if _DEC is not None:
        _DEC.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
        _DEC.BrotliDecoderCreateInstance.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _DEC.BrotliDecoderDecompressStream.restype = ctypes.c_int
        _DEC.BrotliDecoderDecompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        _DEC.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
    if _ENC is not None:
        _ENC.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
        _ENC.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]
        _ENC.BrotliEncoderCompress.restype = ctypes.c_int
        _ENC.BrotliEncoderCompress.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_size_t, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
        ]


def brotli_available() -> bool:
    """True when a system libbrotlidec is loadable here."""
    _load()
    return _DEC is not None


def brotli_encoder_available() -> bool:
    _load()
    return _ENC is not None


# BrotliDecoderResult enum
_RESULT_ERROR = 0
_RESULT_SUCCESS = 1
_RESULT_NEEDS_MORE_INPUT = 2
_RESULT_NEEDS_MORE_OUTPUT = 3


def brotli_decompress(data: bytes, max_output: int = 256 << 20) -> bytes:
    """Brotli bytes → bytes via the streaming C API. ValueError on
    malformed input, truncated streams, or output beyond max_output;
    RuntimeError if no backend is loadable (callers gate on
    `brotli_available()` and keep their named rejection)."""
    _load()
    if _DEC is None:
        raise RuntimeError("no system libbrotlidec available")
    state = _DEC.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        raise ValueError("brotli: decoder instance allocation failed")
    try:
        out = bytearray()
        buf = (ctypes.c_ubyte * 65536)()
        in_arr = (ctypes.c_ubyte * max(len(data), 1)).from_buffer_copy(
            data or b"\x00"
        )
        avail_in = ctypes.c_size_t(len(data))
        next_in = ctypes.cast(in_arr, ctypes.POINTER(ctypes.c_ubyte))
        total = ctypes.c_size_t(0)
        while True:
            avail_out = ctypes.c_size_t(len(buf))
            next_out = ctypes.cast(buf, ctypes.POINTER(ctypes.c_ubyte))
            res = _DEC.BrotliDecoderDecompressStream(
                state, ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out),
                ctypes.byref(total),
            )
            out += bytes(buf[: len(buf) - avail_out.value])
            if len(out) > max_output:
                raise ValueError("brotli: output exceeds max_output")
            if res == _RESULT_SUCCESS:
                if avail_in.value != 0:
                    raise ValueError("brotli: trailing garbage after stream")
                return bytes(out)
            if res == _RESULT_NEEDS_MORE_OUTPUT:
                continue
            if res == _RESULT_NEEDS_MORE_INPUT:
                raise ValueError("brotli: truncated stream")
            raise ValueError("brotli: malformed stream")
    finally:
        _DEC.BrotliDecoderDestroyInstance(state)


def brotli_compress(data: bytes, quality: int = 5, lgwin: int = 22) -> bytes:
    """Fixture-side encode via libbrotlienc (tests / q275 generator)."""
    _load()
    if _ENC is None:
        raise RuntimeError("no system libbrotlienc available")
    bound = _ENC.BrotliEncoderMaxCompressedSize(len(data)) or (
        len(data) + 1024
    )
    outbuf = ctypes.create_string_buffer(bound)
    out_size = ctypes.c_size_t(bound)
    ok = _ENC.BrotliEncoderCompress(
        quality, lgwin, 0, len(data), data, ctypes.byref(out_size), outbuf
    )
    if not ok:
        raise ValueError("brotli: encode failed")
    return outbuf.raw[: out_size.value]
