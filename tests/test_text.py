"""Text-extraction goldens: the content-stream state machine +
ToUnicode CMap decoding (new layers; SURVEY §2.7, FIXTURES §2)."""

from pdf4py_ray.kernel import pdfgen
from pdf4py_ray.kernel.cmap import ToUnicodeCMap, parse_tounicode
from pdf4py_ray.kernel.text import extract_pdf_text


def test_single_show_op():
    text, spans, n_objects = extract_pdf_text(pdfgen.minimal_pdf(("Hello Ray",)))
    assert text == "Hello Ray"
    assert (0, 9, "text") in spans
    assert (0, 9, "page") in spans
    assert n_objects >= 5


def test_multiline_state_machine():
    text, spans, _ = extract_pdf_text(pdfgen.multiline_pdf())
    assert text == "first line\nsecond line\nthird line\nfourth line\ncolumn two"
    line_spans = [s for s in spans if s[2] == "text"]
    assert len(line_spans) == 5
    # spans index into the text exactly
    assert text[line_spans[1][0] : line_spans[1][1]] == "second line"


def test_pages_joined_with_newline():
    text, spans, _ = extract_pdf_text(pdfgen.minimal_pdf(("page A", "page B")))
    assert text == "page A\npage B"
    assert [s for s in spans if s[2] == "page"] == [(0, 6, "page"), (7, 13, "page")]


def test_nested_page_tree_order():
    text, _, _ = extract_pdf_text(pdfgen.pagetree_nested_pdf())
    assert text == "leaf 0\nleaf 1\nleaf 2\nleaf 3"


def test_tounicode_cmap_decoding():
    text, _, _ = extract_pdf_text(pdfgen.tounicode_pdf())
    # <0102> → "Hi"; TJ: <10>→a, -200 kern → space, <11>→b, +30 → no
    # space, <12>→c
    assert text == "Hia bc"


def test_encrypted_document_text():
    text, _, _ = extract_pdf_text(pdfgen.encrypted_pdf(cfm="AESV2", text="classified"))
    assert text == "classified"


def test_every_filter_extracts():
    for f in ("FlateDecode", "FlateDecode+PNG", "LZWDecode",
              "ASCIIHexDecode", "ASCII85Decode", "RunLengthDecode"):
        text, _, _ = extract_pdf_text(pdfgen.filter_pdf(f))
        assert text.startswith("Filtered by "), (f, text)


def test_cmap_parse_direct():
    cmap = parse_tounicode(pdfgen._TOUNICODE_CMAP)
    assert cmap.decode(b"\x01\x02") == "Hi"
    assert cmap.decode(b"\x10\x11\x12") == "abc"
    assert cmap.decode(b"\x99") == "�"


def test_cmap_multibyte_codes():
    cmap = ToUnicodeCMap()
    cmap.add(b"\x00\x41", "A")
    cmap.add(b"\x42", "B")
    assert cmap.decode(b"\x42\x00\x41\x42") == "BAB"
