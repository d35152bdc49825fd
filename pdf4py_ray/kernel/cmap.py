"""ToUnicode CMap parsing and text decoding.

New capability — absent from the reference entirely (SURVEY §2.7);
the reference only *tokenizes* content (``pdf4py/parser.py:340-346``).
The CMap payload itself is PostScript-flavoured PDF-object syntax, so
it is parsed with the same :class:`ObjectParser` in content-stream
mode: ``begincodespacerange``/``beginbfchar``/``beginbfrange``
sections per the public Adobe CMap spec (ISO 32000 §9.10.3).

Decoding policy (our spec, pinned by goldens): candidate code lengths
are tried shortest-first; unmapped codes decode to U+FFFD; simple
fonts without a ToUnicode map fall back to Latin-1.
"""

from __future__ import annotations

from binascii import unhexlify

from .model import HexString, Operator
from .objects import ObjectParser

_REPLACEMENT = "�"


class ToUnicodeCMap:
    """Code → unicode mapping with variable-length codes."""

    def __init__(self) -> None:
        self.mapping: dict = {}  # (nbytes, code_int) -> str
        self.lengths: set = set()

    def add(self, src: bytes, dst: str) -> None:
        self.mapping[(len(src), int.from_bytes(src, "big"))] = dst
        self.lengths.add(len(src))

    def add_codespace(self, lo: bytes, _hi: bytes) -> None:
        self.lengths.add(len(lo))

    def decode(self, data: bytes) -> str:
        if not data:
            return ""
        lengths = sorted(self.lengths) or [1]
        out = []
        pos = 0
        n = len(data)
        while pos < n:
            hit = False
            for L in lengths:
                if pos + L > n:
                    continue
                key = (L, int.from_bytes(data[pos : pos + L], "big"))
                val = self.mapping.get(key)
                if val is not None:
                    out.append(val)
                    pos += L
                    hit = True
                    break
            if not hit:
                out.append(_REPLACEMENT)
                pos += lengths[0]
        return "".join(out)


def _hex_bytes(tok) -> bytes:
    if isinstance(tok, HexString):
        body = tok.value
        if len(body) % 2:
            body += b"0"
        return unhexlify(body)
    raise ValueError(f"Expected hex string in CMap, got {tok!r}")


def _utf16be(data: bytes) -> str:
    return data.decode("utf-16-be", errors="replace")


def parse_tounicode(payload: bytes) -> ToUnicodeCMap:
    """Parse a decoded ToUnicode CMap stream into a mapping."""
    cmap = ToUnicodeCMap()
    parser = ObjectParser(payload, content_stream_mode=True)
    stack: list = []
    mode = None
    pending: list = []
    for obj in parser:
        if isinstance(obj, Operator):
            op = obj.value
            if op in ("begincodespacerange", "beginbfchar", "beginbfrange"):
                mode = op
                pending = []
            elif op == "endcodespacerange":
                for i in range(0, len(pending) - 1, 2):
                    cmap.add_codespace(_hex_bytes(pending[i]), _hex_bytes(pending[i + 1]))
                mode = None
            elif op == "endbfchar":
                for i in range(0, len(pending) - 1, 2):
                    cmap.add(_hex_bytes(pending[i]), _utf16be(_hex_bytes(pending[i + 1])))
                mode = None
            elif op == "endbfrange":
                for i in range(0, len(pending) - 2, 3):
                    lo = _hex_bytes(pending[i])
                    hi = _hex_bytes(pending[i + 1])
                    dst = pending[i + 2]
                    lo_i = int.from_bytes(lo, "big")
                    hi_i = int.from_bytes(hi, "big")
                    width = len(lo)
                    if isinstance(dst, list):
                        for k, item in enumerate(dst):
                            if lo_i + k > hi_i:
                                break
                            cmap.add((lo_i + k).to_bytes(width, "big"), _utf16be(_hex_bytes(item)))
                    else:
                        base = _hex_bytes(dst)
                        base_i = int.from_bytes(base, "big")
                        for k in range(hi_i - lo_i + 1):
                            dst_s = (base_i + k).to_bytes(len(base), "big")
                            cmap.add((lo_i + k).to_bytes(width, "big"), _utf16be(dst_s))
                mode = None
            else:
                stack.clear()
        elif mode is not None:
            pending.append(obj)
        else:
            stack.append(obj)
    return cmap


class Latin1Decoder:
    """Fallback decoder for simple fonts without a ToUnicode map."""

    @staticmethod
    def decode(data: bytes) -> str:
        return data.decode("latin-1")


LATIN1 = Latin1Decoder()
