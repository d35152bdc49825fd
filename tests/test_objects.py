"""Object-parser golden tests — ported from the reference's
SequentialParser suite (``/root/reference/tests/unit_tests.py:193-285``)."""

import pytest

from pdf4py_ray.kernel.errors import PdfSyntaxError
from pdf4py_ray.kernel.model import (
    HexString,
    IndirectObject,
    LiteralString,
    Operator,
    Ref,
    Stream,
)
from pdf4py_ray.kernel.objects import ObjectParser


def parse_all(data: bytes, **kw) -> list:
    return list(ObjectParser(data, **kw))


def test_mixed_sequence():
    got = parse_all(b"null true 12 -2.5 /Name (str) <AB> [1 2] <</K 1>>")
    assert got == [
        None, True, 12, -2.5, "Name",
        LiteralString(b"str"), HexString(b"AB"),
        [1, 2], {"K": 1},
    ]


def test_nested_dict():
    got = parse_all(
        b"<< /Type /Page /Parent 2 0 R /Box [0 0 612.0 792] "
        b"/Meta << /A (x) /B <C1> >> /N null >>"
    )
    assert got == [
        {
            "Type": "Page",
            "Parent": Ref(2, 0),
            "Box": [0, 0, 612.0, 792],
            "Meta": {"A": LiteralString(b"x"), "B": HexString(b"C1")},
            "N": None,
        }
    ]


def test_indirect_object_and_reference():
    got = parse_all(b"12 0 obj << /Kids [1 0 R 5 2 R] >> endobj")
    assert got == [IndirectObject(12, 0, {"Kids": [Ref(1, 0), Ref(5, 2)]})]


def test_three_plain_integers():
    assert parse_all(b"[1 2 3]") == [[1, 2, 3]]
    # bare top-level ints: the 2nd lookahead int is dropped at EOF —
    # reference parity (``parser.py:311-315`` fires on the 2nd call too)
    assert parse_all(b"1 2 3") == [1, 2]
    assert parse_all(b"1 2 3 4") == [1, 2, 3]


def test_two_ints_then_eof_drops_second():
    # reference parity quirk (``parser.py:311-315``)
    assert parse_all(b"1 2") == [1]


def test_int_then_name():
    assert parse_all(b"5 /N") == [5, "N"]


def test_stream_with_resolver():
    payload = b"0123456789"
    data = b"<< /Length 10 >>\nstream\n" + payload + b"\nendstream"

    def resolver(d, start, obj_id):
        assert d == {"Length": 10}
        return d["Length"], lambda: data[start : start + d["Length"]]

    got = parse_all(data, stream_resolver=resolver)
    assert len(got) == 1 and isinstance(got[0], Stream)
    assert got[0].dictionary == {"Length": 10}
    assert got[0].data() == payload


def test_stream_without_resolver_errors():
    with pytest.raises(PdfSyntaxError):
        parse_all(b"<< /Length 1 >>\nstream\nX\nendstream")


def test_stream_missing_endstream_errors():
    def resolver(d, start, obj_id):
        return d["Length"], lambda: b""

    with pytest.raises(PdfSyntaxError):
        parse_all(b"<< /Length 3 >>\nstream\nXYZ junk", stream_resolver=resolver)


def test_empty_input():
    assert parse_all(b"") == []
    assert parse_all(b"   % only a comment") == []


def test_content_stream_mode_tokens():
    got = parse_all(b"BT /F1 12 Tf 72 712 Td (Hello) Tj ET")
    assert got == [
        Operator("BT"), "F1", 12, Operator("Tf"),
        72, 712, Operator("Td"),
        LiteralString(b"Hello"), Operator("Tj"), Operator("ET"),
    ]


def test_operator_rejected_outside_content_mode():
    with pytest.raises(PdfSyntaxError):
        parse_all(b"BT", content_stream_mode=False)


def test_dict_key_must_be_name():
    with pytest.raises(PdfSyntaxError):
        parse_all(b"<< (bad) 1 >>")


def test_missing_endobj_errors():
    with pytest.raises(PdfSyntaxError):
        parse_all(b"1 0 obj 42 trailer")


def test_decrypt_hook_applied_with_obj_id():
    p = ObjectParser(b"(secret) <AB>")
    p.decrypt_hook = lambda data, obj_id: data[::-1]
    assert p.parse_object(obj_id=(1, 0)) == LiteralString(b"terces")
    # hex strings are decrypted over their raw digits (parity quirk)
    assert p.parse_object(obj_id=(1, 0)) == HexString(b"BA")


def test_decrypt_hook_skipped_without_obj_id():
    p = ObjectParser(b"(secret)")
    p.decrypt_hook = lambda data, obj_id: data[::-1]
    assert p.parse_object() == LiteralString(b"secret")
