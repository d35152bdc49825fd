"""Content-stream text extraction — the interpretation layer the
reference deliberately omits (``README.md:55-65``,
``standard_coverage.rst:93-103``; SURVEY §2.7).

A small text-state machine over the token stream produced by
:class:`ObjectParser` in content-stream mode, handling the
text-showing and text-positioning operators of ISO 32000 §9.4:
``BT ET Tf TL Tc Tw Td TD T* Tm Tj TJ ' "``.

Extraction policy (our spec, pinned by golden tests):

- a show op starting at a different text-space y than the previous
  one begins a new line;
- a ``TJ`` kerning adjustment ≤ -180 (thousandths of text space)
  renders as a single space;
- strings decode through the font's ToUnicode CMap when present,
  else Latin-1;
- pages are joined with a single newline; spans (character offsets
  into the final text) are emitted per show op (kind ``text``) and
  per page (kind ``page``).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .cmap import LATIN1, parse_tounicode
from .document import PdfDocument
from .errors import PdfError
from .model import HexString, LiteralString, Operator, Ref, Stream
from .objects import ObjectParser

# TJ adjustment at or below this many thousandths renders as a space
KERN_SPACE_THRESHOLD = -180

Span = Tuple[int, int, str]

_IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _translate(tx: float, ty: float, m: tuple) -> tuple:
    a, b, c, d, e, f = m
    return (a, b, c, d, tx * a + ty * c + e, tx * b + ty * d + f)


def _num(v) -> float:
    return float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else 0.0


class _FontTable:
    """Resolves /Tf names to string decoders, caching parsed CMaps."""

    def __init__(self, doc: PdfDocument, resources) -> None:
        self.doc = doc
        self.fonts = {}
        resources = doc.deref(resources) or {}
        self.font_dicts = doc.deref(resources.get("Font")) or {}

    def decoder(self, name: str):
        dec = self.fonts.get(name)
        if dec is None:
            dec = LATIN1
            font = self.font_dicts.get(name)
            if font is not None:
                ref = font
                font = self.doc.deref(font)
                cache_key = ref if isinstance(ref, Ref) else ("fontname", name)
                cached = self.doc.__dict__.setdefault("_cmap_cache", {}).get(cache_key)
                if cached is not None:
                    dec = cached
                else:
                    tu = self.doc.deref(font.get("ToUnicode"))
                    if isinstance(tu, Stream):
                        try:
                            dec = parse_tounicode(tu.data())
                        except PdfError:
                            dec = LATIN1
                    self.doc._cmap_cache[cache_key] = dec
            self.fonts[name] = dec
        return dec


def extract_page_text(doc: PdfDocument, page: dict) -> Tuple[str, List[Span]]:
    """Run the text-state machine over one page's content stream."""
    content = doc.page_content(page)
    if not content:
        return "", []
    fonts = _FontTable(doc, page.get("Resources"))
    parser = ObjectParser(content, content_stream_mode=True)

    out: List[str] = []
    spans: List[Span] = []
    length = 0
    stack: list = []
    tm = _IDENTITY
    tlm = _IDENTITY
    leading = 0.0
    decoder = LATIN1
    last_y: Optional[float] = None

    def emit(piece: str) -> None:
        nonlocal length
        if piece:
            out.append(piece)
            length += len(piece)

    def string_bytes(tok) -> bytes:
        if isinstance(tok, LiteralString):
            return tok.value
        if isinstance(tok, HexString):
            body = tok.value
            if len(body) % 2:
                body += b"0"
            import binascii

            return binascii.unhexlify(body)
        return b""

    def show(tok) -> None:
        nonlocal last_y
        y = tm[5]
        if last_y is not None and y != last_y and length > 0:
            emit("\n")
        last_y = y
        text = decoder.decode(string_bytes(tok))
        start = length
        emit(text)
        if text:
            spans.append((start, length, "text"))

    def newline() -> None:
        nonlocal tm, tlm
        tlm = _translate(0.0, -leading, tlm)
        tm = tlm

    for obj in parser:
        if not isinstance(obj, Operator):
            stack.append(obj)
            continue
        op = obj.value
        if op == "BT":
            tm = tlm = _IDENTITY
        elif op == "ET":
            pass
        elif op == "Tf" and len(stack) >= 2:
            decoder = fonts.decoder(stack[-2]) if isinstance(stack[-2], str) else decoder
        elif op == "TL" and stack:
            leading = _num(stack[-1])
        elif op == "Td" and len(stack) >= 2:
            tlm = _translate(_num(stack[-2]), _num(stack[-1]), tlm)
            tm = tlm
        elif op == "TD" and len(stack) >= 2:
            leading = -_num(stack[-1])
            tlm = _translate(_num(stack[-2]), _num(stack[-1]), tlm)
            tm = tlm
        elif op == "Tm" and len(stack) >= 6:
            tm = tlm = tuple(_num(v) for v in stack[-6:])
        elif op == "T*":
            newline()
        elif op == "Tj" and stack:
            show(stack[-1])
        elif op == "'" and stack:
            newline()
            show(stack[-1])
        elif op == '"' and stack:
            newline()
            show(stack[-1])
        elif op == "TJ" and stack and isinstance(stack[-1], list):
            for item in stack[-1]:
                if isinstance(item, (LiteralString, HexString)):
                    show(item)
                elif isinstance(item, (int, float)) and item <= KERN_SPACE_THRESHOLD:
                    emit(" ")
        stack.clear()

    return "".join(out), spans


def extract_pdf_text(data: bytes, password=None) -> Tuple[str, List[Span], int]:
    """Full-document text extraction.

    Returns ``(text, spans, n_objects)`` where spans carry character
    offsets into ``text`` with kinds ``text`` (per show op) and
    ``page`` (per page). Pages are joined by a newline.
    """
    return extract_document_text(PdfDocument(data, password=password))


def extract_document_text(doc) -> Tuple[str, List[Span], int]:
    """Same extraction over an already-constructed ``PdfDocument`` —
    the entry point for streaming sources that bind a document to an
    mmap (``PdfDocument.from_file``) instead of in-memory bytes."""
    pieces: List[str] = []
    spans: List[Span] = []
    offset = 0
    for i, page in enumerate(doc.pages()):
        if i > 0:
            pieces.append("\n")
            offset += 1
        page_text, page_spans = extract_page_text(doc, page)
        spans.extend((s + offset, e + offset, k) for s, e, k in page_spans)
        spans.append((offset, offset + len(page_text), "page"))
        pieces.append(page_text)
        offset += len(page_text)
    n_objects = len(doc.xref) if doc.xref is not None else 0
    return "".join(pieces), spans, n_objects
