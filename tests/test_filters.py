"""Decoder golden tests — ported semantics from
``/root/reference/tests/decoders_unit_tests.py`` and the predictor
goldens of ``tests/unit_tests.py:328-339``, plus LZW round-trips (new
capability, absent from the reference)."""

import zlib

import pytest

from pdf4py_ray.kernel.errors import PdfDataError, PdfUnsupportedError
from pdf4py_ray.kernel.filters import (
    ascii85_decode,
    asciihex_decode,
    decode_chain,
    flate_decode,
    lzw_decode,
    lzw_encode,
    runlength_decode,
    undo_png_predictor,
    undo_tiff_predictor,
)
from pdf4py_ray.kernel.pdfgen import png_predict_up


def test_asciihex_roundtrip():
    assert asciihex_decode(b"48656C6C6F>", {}) == b"Hello"
    assert asciihex_decode(b"48 65 6C\n6C 6F>", {}) == b"Hello"


def test_asciihex_odd_length_padded():
    # trailing nibble padded with 0
    assert asciihex_decode(b"48656C6C6F2>", {}) == b"Hello "


def test_asciihex_requires_trailing_eod():
    with pytest.raises(PdfDataError):
        asciihex_decode(b"48656C>extra", {})


def test_ascii85_known_value():
    # '9jqo^' is the canonical first group of the 'Man is distinguished'
    # example and decodes to 'Man '
    assert ascii85_decode(b"9jqo^~>", {}) == b"Man "


def test_ascii85_reference_tail_arithmetic():
    # groups iterate to len-2; a bare 5-group with no EOD decodes fully
    assert ascii85_decode(b"9jqo^AA", {}) == b"Man "


def test_runlength():
    # literal run: byte n < 128 copies n+1 bytes
    assert runlength_decode(bytes([2]) + b"abc" + bytes([128]), {}) == b"abc"
    # repeat run: byte n > 128 repeats next byte 257-n times
    assert runlength_decode(bytes([254]) + b"x" + bytes([128]), {}) == b"xxx"
    # mixed
    data = bytes([0]) + b"A" + bytes([255]) + b"B" + bytes([128])
    assert runlength_decode(data, {}) == b"ABB"


def test_flate_plain():
    raw = b"the quick brown fox" * 10
    assert flate_decode(zlib.compress(raw), {}) == raw


def test_tiff_predictor_golden():
    # horizontal differencing undo: out[i] = out[i-1] + in[i] per row
    data = bytes([10, 1, 1, 1, 5, 2, 2, 2])
    out = undo_tiff_predictor(data, columns=4, bits_per_component=8, colors=1)
    assert out == bytes([10, 11, 12, 13, 5, 7, 9, 11])


def test_tiff_predictor_rejects_low_bpc():
    with pytest.raises(PdfUnsupportedError):
        undo_tiff_predictor(b"\x00", 1, 4, 1)


def test_png_up_round_trip():
    raw = bytes(range(256)) * 4
    filtered = png_predict_up(raw, 32)
    assert undo_png_predictor(filtered, 32, 8, 1) == raw


def test_png_none_rows():
    data = b"\x00abcd\x00efgh"
    assert undo_png_predictor(data, 4, 8, 1) == b"abcdefgh"


def test_png_sub_uses_raw_neighbour():
    # reference parity: Sub adds the *raw* left byte, not the decoded one
    row = bytes([1, 1, 1, 1])
    out = undo_png_predictor(b"\x01" + row, 4, 8, 1)
    assert out == bytes([1, 2, 2, 2])


def test_png_mixed_filters_up_then_none():
    raw_r0 = bytes([5, 6, 7, 8])
    data = b"\x00" + raw_r0 + b"\x02" + bytes([1, 1, 1, 1])
    out = undo_png_predictor(data, 4, 8, 1)
    assert out == raw_r0 + bytes([6, 7, 8, 9])


def test_lzw_roundtrip():
    for raw in (b"", b"a", b"aaaaaaaaaabbbbbbbbbb" * 50, bytes(range(256)) * 8):
        assert lzw_decode(lzw_encode(raw), {}) == raw


def test_lzw_early_change_zero():
    raw = b"abcabcabc" * 300
    assert lzw_decode(lzw_encode(raw, early=0), {"EarlyChange": 0}) == raw


def test_decode_chain_reversed_order():
    raw = b"payload bytes"
    # chain listed [Flate, AHx] is applied reversed: AHx first, then Flate
    data = zlib.compress(raw).hex().upper().encode() + b">"
    d = {"Filter": ["FlateDecode", "ASCIIHexDecode"]}
    assert decode_chain(d, data) == raw


def test_decode_chain_crypt_skipped():
    d = {"Filter": ["Crypt"]}
    assert decode_chain(d, b"abc") == b"abc"


def test_decode_chain_unknown_filter():
    with pytest.raises(PdfUnsupportedError):
        decode_chain({"Filter": "NoSuchFilter"}, b"")


def test_decode_chain_no_filter_identity():
    assert decode_chain({}, b"abc") == b"abc"


def test_passthrough_image_codecs():
    for f in ("DCTDecode", "JPXDecode", "JBIG2Decode"):
        assert decode_chain({"Filter": f}, b"\xff\xd8jpg") == b"\xff\xd8jpg"


def test_lzw_applies_predictor():
    # PDF 1.7 §7.4.4: /Predictor DecodeParms apply to LZW as to Flate
    import numpy as np

    from pdf4py_ray.kernel.filters import flate_decode, lzw_decode, lzw_encode
    import zlib

    rows = bytes([2, 10, 20, 30, 2, 1, 2, 3])  # PNG Up filter, 2 rows x 3 cols
    params = {"Predictor": 12, "Columns": 3}
    expected = flate_decode(zlib.compress(rows), params)
    assert lzw_decode(lzw_encode(rows), params) == expected
    # and without a predictor nothing changes
    assert lzw_decode(lzw_encode(rows), {}) == rows
