"""Whole-document tests over the synthetic fixture corpus — the
analogue of the reference's functional suite
(``/root/reference/tests/functional_tests.py:8-93``): parse every
object, decode every stream, check versions / page counts / xref
chains."""

import pytest

from pdf4py_ray.kernel import pdfgen
from pdf4py_ray.kernel.document import PdfDocument
from pdf4py_ray.kernel.model import Stream


def walk_all(doc: PdfDocument) -> int:
    """Parse every object and force-decode every stream; returns count."""
    n = 0
    for _entry, obj in doc.iter_objects():
        if isinstance(obj, Stream):
            obj.data()
        n += 1
    return n


ALL_FIXTURES = {
    "minimal": lambda: pdfgen.minimal_pdf(),
    "multi_page": lambda: pdfgen.minimal_pdf(("page one", "page two", "page three")),
    "xref_stream": lambda: pdfgen.minimal_pdf(("xref stream doc",), xref_stream=True),
    "object_streams": pdfgen.object_stream_pdf,
    "stream_length_ref": pdfgen.stream_length_ref_pdf,
    "incremental": pdfgen.incremental_update_pdf,
    "hybrid": pdfgen.hybrid_xrefstm_pdf,
    "flate": lambda: pdfgen.filter_pdf("FlateDecode"),
    "flate_png": lambda: pdfgen.filter_pdf("FlateDecode+PNG"),
    "lzw": lambda: pdfgen.filter_pdf("LZWDecode"),
    "asciihex": lambda: pdfgen.filter_pdf("ASCIIHexDecode"),
    "ascii85": lambda: pdfgen.filter_pdf("ASCII85Decode"),
    "rle": lambda: pdfgen.filter_pdf("RunLengthDecode"),
}


@pytest.mark.parametrize("name", sorted(ALL_FIXTURES))
def test_walk_every_fixture(name):
    doc = PdfDocument(ALL_FIXTURES[name]())
    assert walk_all(doc) > 0


def test_header_version():
    assert PdfDocument(pdfgen.minimal_pdf()).version == "PDF-1.4"
    assert PdfDocument(pdfgen.minimal_pdf(xref_stream=True)).version == "PDF-1.5"


def test_page_count_and_order():
    doc = PdfDocument(pdfgen.minimal_pdf(("a", "b", "c")))
    pages = doc.pages()
    assert len(pages) == 3
    contents = [doc.page_content(p) for p in pages]
    assert b"(a)" in contents[0] and b"(b)" in contents[1] and b"(c)" in contents[2]


def test_resources_inherited():
    doc = PdfDocument(pdfgen.minimal_pdf(("x",)))
    page = doc.pages()[0]
    assert "Resources" in page


def test_xref_stream_roundtrip():
    doc = PdfDocument(pdfgen.minimal_pdf(("via xref stream",), xref_stream=True))
    assert b"(via xref stream)" in doc.page_content(doc.pages()[0])


def test_object_streams_resolution():
    doc = PdfDocument(pdfgen.object_stream_pdf(("objstm text",)))
    assert doc.catalog()["Type"] == "Catalog"
    assert b"(objstm text)" in doc.page_content(doc.pages()[0])


def test_stream_length_by_reference():
    doc = PdfDocument(pdfgen.stream_length_ref_pdf())
    assert b"(Length by reference)" in doc.page_content(doc.pages()[0])


def test_incremental_update_newest_wins():
    doc = PdfDocument(pdfgen.incremental_update_pdf())
    content = doc.page_content(doc.pages()[0])
    assert b"(Updated text)" in content
    assert b"Original" not in content


def test_hybrid_xrefstm_entries_found():
    doc = PdfDocument(pdfgen.hybrid_xrefstm_pdf())
    assert b"(Hybrid xref text)" in doc.page_content(doc.pages()[0])


def test_filter_decoded_content():
    for f in ("FlateDecode", "FlateDecode+PNG", "LZWDecode",
              "ASCIIHexDecode", "ASCII85Decode", "RunLengthDecode"):
        doc = PdfDocument(pdfgen.filter_pdf(f))
        label = f.split("+")[0]
        assert f"Filtered by {label}".encode() in doc.page_content(doc.pages()[0]), f


def test_object_cache_hit():
    doc = PdfDocument(pdfgen.minimal_pdf())
    a = doc.catalog()
    b = doc.catalog()
    assert a is b  # memoized via the explicit per-document cache


def test_missing_object_keyerror():
    doc = PdfDocument(pdfgen.minimal_pdf())
    with pytest.raises(KeyError):
        doc.xref[(999, 0)]


def test_object_cache_is_bounded_lru():
    """A document with more objects than the cache bound (reference:
    lru_cache(256), parser.py:415) never holds more than the bound —
    the guard against a pathological million-object PDF ballooning an
    extractor actor's heap — and still parses every object correctly."""
    w = pdfgen.PdfWriter()
    refs = [w.add({"V": i}) for i in range(400)]
    root = w.simple_page_tree([pdfgen._content("bounded cache")])
    doc = PdfDocument(w.tobytes(root))
    for ref in refs:
        assert doc.get_object(ref)["V"] == ref.number - 1
    from pdf4py_ray.kernel.document import _OBJECT_CACHE_SIZE

    assert len(doc._cache) <= _OBJECT_CACHE_SIZE
    # evicted objects re-parse to the same value
    assert doc.get_object(refs[0])["V"] == 0


def test_xref_stream_extends_warns(caplog):
    """Diagnostics parity: an /Extends chain in the xref stream dict is
    unsupported in the reference too (parser.py:559-563 logs a
    warning); ours must warn rather than silently ignore the key."""
    import logging

    from pdf4py_ray.kernel.model import Ref

    w = pdfgen.PdfWriter("1.5")
    root = w.simple_page_tree([pdfgen._content("extends")])
    data = w.tobytes(root, xref_stream=True,
                     trailer_extra={"Extends": Ref(1, 0)})
    with caplog.at_level(logging.WARNING):
        doc = PdfDocument(data)
    assert any("Extends" in rec.message for rec in caplog.records)
    assert len(doc.pages()) == 1  # the rest of the document still parses


def test_from_file_mmap_parses_without_loading(tmp_path):
    """PdfDocument.from_file binds an mmap (lazily paged — the
    streaming-source counterpart of the reference's BufferedReader
    lexer binding) and produces output identical to the in-memory
    parse, across classic-xref, xref-stream and encrypted documents."""
    import mmap

    for i, data in enumerate((
        pdfgen.minimal_pdf(("mapped page",)),
        pdfgen.minimal_pdf(("mapped xs",), xref_stream=True),
        pdfgen.object_stream_pdf(),
        pdfgen.encrypted_pdf(cfm="AESV2"),
    )):
        p = tmp_path / f"doc{i}.pdf"
        p.write_bytes(data)
        mem = PdfDocument(data)
        mapped = PdfDocument.from_file(str(p))
        assert isinstance(mapped.buf, mmap.mmap)  # no bytes() snapshot
        assert mapped.version == mem.version
        pages_a, pages_b = mem.pages(), mapped.pages()
        assert len(pages_a) == len(pages_b)
        for a, b in zip(pages_a, pages_b):
            assert mem.page_content(a) == mapped.page_content(b)
