"""Recursive-descent PDF object parser over a :class:`Tokenizer`.

Covers the grammar the reference's ``SequentialParser`` implements
(``pdf4py/parser.py:142-349``): arrays, dictionaries, streams, null,
strings (with the decrypt hook), names, numbers, the three-token
``n g R`` / ``n g obj`` disambiguation, and bare content-stream
operators when ``content_stream_mode`` is on.

Design difference vs the reference: the reference keeps a preloaded
``current_lexeme`` invariant; this parser is pull-based with LIFO
push-back on the tokenizer — observable behavior is identical
(verified by ported golden tests).
"""

from __future__ import annotations

from typing import Callable, Optional

from .errors import PdfSyntaxError
from .model import (
    ARRAY_CLOSE,
    ARRAY_OPEN,
    DICT_CLOSE,
    DICT_OPEN,
    HexString,
    IndirectObject,
    Keyword,
    LiteralString,
    Operator,
    Ref,
    Stream,
    StreamStart,
)
from .tokenizer import Tokenizer

_KW_OBJ = Keyword(b"obj")
_KW_ENDOBJ = Keyword(b"endobj")
_KW_ENDSTREAM = Keyword(b"endstream")


class ObjectParser:
    """Sequential object parser; also the content-stream tokenizer.

    Parameters
    ----------
    source:
        bytes / bytearray / an existing :class:`Tokenizer`.
    stream_resolver:
        ``(stream_dict, data_start, obj_id) -> (length, read_fn)``;
        required to parse stream objects (the document layer provides
        one that resolves ``/Length`` references, decrypts and decodes).
    content_stream_mode:
        when True (the default, as in the reference —
        ``parser.py:173``), bare operator tokens are legal objects.
    """

    def __init__(
        self,
        source,
        stream_resolver: Optional[Callable] = None,
        content_stream_mode: bool = True,
    ) -> None:
        self.tok = source if isinstance(source, Tokenizer) else Tokenizer(source)
        self.stream_resolver = stream_resolver
        self.content_stream_mode = content_stream_mode
        # set by the document layer when the file is encrypted:
        # (raw_bytes, obj_id) -> bytes
        self.decrypt_hook: Optional[Callable] = None

    def __iter__(self):
        return self

    def __next__(self):
        return self.parse_object()

    def _syntax_error(self, msg: str) -> None:
        raise PdfSyntaxError(f"{msg} (position {self.tok.pos})")

    def parse_object(self, obj_id: Optional[tuple] = None):
        """Parse the next object; raises StopIteration at end of input."""
        tok = self.tok
        t = tok.next()  # StopIteration propagates at end of input

        if t is ARRAY_OPEN:
            items = []
            while True:
                t2 = tok.next()
                if t2 is ARRAY_CLOSE:
                    return items
                tok.push_back(t2)
                items.append(self.parse_object(obj_id))

        if t is DICT_OPEN:
            d: dict = {}
            while True:
                key = tok.next()
                if key is DICT_CLOSE:
                    break
                if not isinstance(key, str):
                    self._syntax_error(f"Expecting dictionary key, {key!r} found instead")
                d[key] = self.parse_object(obj_id)
            # a dictionary immediately followed by raw stream data is a stream
            try:
                nxt = tok.next()
            except StopIteration:
                return d
            if not isinstance(nxt, StreamStart):
                tok.push_back(nxt)
                return d
            if self.stream_resolver is None:
                self._syntax_error("Stream object found but no stream resolver is configured")
            length, read_fn = self.stream_resolver(d, nxt.start, obj_id)
            tok.seek(nxt.start + length)
            end_tok = tok.next()
            if end_tok != _KW_ENDSTREAM:
                self._syntax_error("'stream' not matched with an 'endstream' keyword")
            return Stream(d, read_fn)

        if t is None:
            return None

        if isinstance(t, (LiteralString, HexString)):
            if obj_id is not None and self.decrypt_hook is not None:
                # parity: the reference decrypts the *stored* bytes —
                # for hex strings that is the still-ASCII hex digits
                # (``parser.py:293-294``)
                return type(t)(self.decrypt_hook(t.value, obj_id))
            return t

        if isinstance(t, bool) or isinstance(t, (float, str)):
            return t

        if isinstance(t, int):
            # int | "n g R" reference | "n g obj ... endobj" indirect
            try:
                t2 = tok.next()
            except StopIteration:
                return t
            if not isinstance(t2, int) or isinstance(t2, bool):
                tok.push_back(t2)
                return t
            try:
                t3 = tok.next()
            except StopIteration:
                # parity quirk: the second integer is dropped at EOF
                # (``parser.py:311-315``)
                return t
            if isinstance(t3, Operator) and t3.value == "R":
                return Ref(t, t2)
            if t3 == _KW_OBJ:
                inner = self.parse_object(obj_id)
                end = tok.next()
                if end != _KW_ENDOBJ:
                    self._syntax_error("Expecting matching 'endobj' for 'obj', but not found")
                return IndirectObject(t, t2, inner)
            tok.push_back(t3)
            tok.push_back(t2)
            return t

        if isinstance(t, Operator) and self.content_stream_mode:
            return t

        self._syntax_error(f"Unexpected lexeme encountered ({t!r})")
