"""Property-based tests (hypothesis) — beyond the reference's
golden-value strategy: random inputs pin round-trip and parser
invariants the fixed corpus cannot cover.

No Ray needed; pure kernel.
"""

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf4py_ray.kernel.filters import decode_chain, lzw_decode, lzw_encode
from pdf4py_ray.kernel.pdfgen import serialize
from pdf4py_ray.kernel.model import LiteralString
from pdf4py_ray.kernel.objects import ObjectParser


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_lzw_round_trip(data):
    assert lzw_decode(lzw_encode(data), {}) == data


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_flate_chain_round_trip(data):
    out = decode_chain({"Filter": "FlateDecode"}, zlib.compress(data))
    assert out == data


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_literal_string_write_parse_round_trip(data):
    """Any byte string serialized as a PDF literal string must lex back
    byte-identically (escape handling is total)."""
    ser = serialize(LiteralString(data))
    (obj,) = list(ObjectParser(ser, content_stream_mode=True))
    assert isinstance(obj, LiteralString) and obj.value == data


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-99999, max_value=99999), st.booleans())
def test_number_write_parse_round_trip(n, as_float):
    value = float(n) / 100.0 if as_float else n
    ser = serialize(value)
    (obj,) = list(ObjectParser(ser, content_stream_mode=True))
    if as_float:
        assert abs(obj - value) < 1e-9
    else:
        assert obj == value


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E),
               min_size=1, max_size=40))
def test_name_write_parse_round_trip(s):
    ser = serialize(s)  # plain str serializes as a /Name with #-escapes
    (obj,) = list(ObjectParser(ser, content_stream_mode=True))
    assert obj == s


@settings(max_examples=100, deadline=None)
@given(st.recursive(
    st.one_of(
        st.integers(min_value=-(10**9), max_value=10**9),
        st.booleans(),
        st.none(),
        st.binary(max_size=64).map(LiteralString),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.text(alphabet="abcdefghij", min_size=1, max_size=6),
            children, max_size=4,
        ),
    ),
    max_leaves=12,
))
def test_object_graph_write_parse_round_trip(obj):
    """Arbitrary nested arrays/dicts survive serialize → parse."""
    ser = serialize(obj)
    (parsed,) = list(ObjectParser(ser, content_stream_mode=True))
    assert parsed == obj
