"""PDF object model used throughout the kernel.

Behavioral parity notes (vs the reference's ``pdf4py/types.py:11-102``):

- PDF *names* are plain ``str`` values.
- Literal strings keep their **raw bytes** (no text decoding is
  attempted); hex strings keep the **un-decoded hex digit bytes**
  (reference: ``types.py:11-30``). Decoding is the caller's job.
- Streams pair a dictionary with a zero-argument callable producing the
  decoded payload lazily (reference: ``types.py:39-47``).

The classes here are deliberately small immutable records; they are
*intra-row* values only and never cross an Arrow batch boundary.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple


class LiteralString(NamedTuple):
    """A ``( ... )`` literal string — raw bytes, undecoded."""

    value: bytes


class HexString(NamedTuple):
    """A ``< ... >`` hex string — the hex *digits*, still ASCII-encoded."""

    value: bytes


class Operator(NamedTuple):
    """A bare content-stream operator token such as ``Tj`` or ``re``."""

    value: str


class Keyword(NamedTuple):
    """A structural keyword: ``obj``, ``endobj``, ``xref``, ... (internal)."""

    value: bytes


class Ref(NamedTuple):
    """An indirect reference ``n g R``."""

    number: int
    generation: int


class IndirectObject(NamedTuple):
    """An ``n g obj ... endobj`` wrapper around a value."""

    number: int
    generation: int
    value: Any


class Stream(NamedTuple):
    """A PDF stream: its dictionary plus a lazy ``() -> bytes`` payload."""

    dictionary: dict
    data: Callable[[], bytes]


class InUseEntry(NamedTuple):
    """Xref entry: object stored directly at a byte ``offset``."""

    offset: int
    number: int
    generation: int


class CompressedEntry(NamedTuple):
    """Xref entry: object stored inside object stream ``container``."""

    number: int
    container: int
    index: int


class _Marker:
    """Singleton structural tokens emitted by the tokenizer."""

    __slots__ = ("name",)

    def __init__(self, name: str) -> None:
        self.name = name

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.name}>"


ARRAY_OPEN = _Marker("[")
ARRAY_CLOSE = _Marker("]")
DICT_OPEN = _Marker("<<")
DICT_CLOSE = _Marker(">>")
BRACE_OPEN = _Marker("{")
BRACE_CLOSE = _Marker("}")


class StreamStart(NamedTuple):
    """Marks that raw stream data begins at byte position ``start``.

    Emitted by the tokenizer when the ``stream`` keyword is recognised;
    the parser decides how many bytes to read once ``/Length`` is known
    (the reference wraps this in a reader closure instead —
    ``pdf4py/_lexer.py:518-549``; positions carry the same information
    with less coupling).
    """

    start: int


NULL = None  # the PDF null object maps to Python None
