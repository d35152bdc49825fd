"""The extraction stage: transcript turns → extracted main content.

An actor-pool ``map_batches`` stage (SURVEY §3.4): the callable class
is instantiated once per actor (``__init__`` compiles regexes and
builds the extractor registry), then invoked per zero-copy Arrow
batch. Each row is classified (PDF envelope / HTML / plain text) and
dispatched through the per-document kernel; errors are *total* — a
malformed payload yields a ``status="error"`` row and never poisons
the batch (the retry-safety requirement of SURVEY §4.2).

The extractor registry mirrors the reference's decoder registry
(``pdf4py/_decoders.py:7-14``) as the engine's user-extension surface:
``@register_extractor(kind)`` adds a payload kind without touching the
pipeline.
"""

from __future__ import annotations

import base64
import json
import re
from typing import Callable, List, Tuple

import pyarrow as pa

from ..kernel.errors import PdfError
from ..kernel.html_extract import extract_html_text, looks_like_html
from ..kernel.text import extract_pdf_text

Span = Tuple[int, int, str]

SPAN_TYPE = pa.list_(
    pa.struct([("start", pa.int32()), ("end", pa.int32()), ("kind", pa.string())])
)

OUTPUT_FIELDS = [
    ("kind", pa.string()),
    ("extracted_text", pa.string()),
    ("spans", SPAN_TYPE),
    ("n_objects", pa.int32()),
    ("n_bytes", pa.int64()),
    ("status", pa.string()),
    ("error", pa.string()),
]

# ---------------------------------------------------------------- registry

_EXTRACTORS: dict = {}


def register_extractor(kind: str):
    """Register ``fn(payload) -> (text, spans, n_objects)`` for a kind."""

    def wrapper(fn: Callable):
        _EXTRACTORS[kind] = fn
        return fn

    return wrapper


@register_extractor("pdf")
def _extract_pdf(payload: bytes):
    return extract_pdf_text(payload)


@register_extractor("html")
def _extract_html(payload: str):
    text, spans = extract_html_text(payload)
    return text, spans, 0


@register_extractor("text")
def _extract_plain(payload: str):
    return payload, ([(0, len(payload), "text")] if payload else []), 0


_PDF_ENVELOPE_RE = re.compile(r'^\s*\{.*"pdf_b64"')


def classify_payload(text: str, tool: str) -> Tuple[str, object]:
    """(kind, payload) for one turn row."""
    if text and _PDF_ENVELOPE_RE.match(text[:200]):
        try:
            envelope = json.loads(text)
            b64 = envelope.get("pdf_b64")
            if b64 is not None:
                return "pdf", base64.b64decode(b64)
        except (ValueError, TypeError):
            pass
    if text and text.startswith("%PDF-"):
        return "pdf", text.encode("latin-1", errors="replace")
    if text and looks_like_html(text):
        return "html", text
    return "text", text or ""


class ExtractTurns:
    """Actor-pool batch extractor (``map_batches(ExtractTurns, ...)``).

    Per-actor state set up once in ``__init__``; per-batch work in
    ``__call__`` over ``batch_format="pyarrow"`` batches.
    """

    def __init__(self) -> None:
        self.registry = dict(_EXTRACTORS)
        self.classify = classify_payload

    def extract_one(self, text: str, tool: str):
        """Total per-row kernel: never raises."""
        kind, payload = self.classify(text, tool)
        n_bytes = len(payload) if isinstance(payload, (bytes, bytearray)) else len(payload or "")
        try:
            extracted, spans, n_objects = self.registry[kind](payload)
            status, error = "ok", ""
            if not extracted:
                status = "empty"
        except PdfError as exc:
            extracted, spans, n_objects = "", [], 0
            status, error = "error", f"{type(exc).__name__}: {exc}"[:200]
        except Exception as exc:  # noqa: BLE001 — totality over a malformed payload
            extracted, spans, n_objects = "", [], 0
            status, error = "error", f"{type(exc).__name__}: {exc}"[:200]
        return kind, extracted, spans, n_objects, n_bytes, status, error

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        tools = batch["tool"].to_pylist() if "tool" in batch.column_names else [""] * len(texts)
        cols: List[list] = [[] for _ in OUTPUT_FIELDS]
        for text, tool in zip(texts, tools):
            kind, extracted, spans, n_objects, n_bytes, status, error = self.extract_one(
                text or "", tool or ""
            )
            values = (
                kind,
                extracted,
                [{"start": s, "end": e, "kind": k} for s, e, k in spans],
                n_objects,
                n_bytes,
                status,
                error,
            )
            for lst, v in zip(cols, values):
                lst.append(v)
        out = batch.drop_columns(["text"])  # the raw payload column is heavy — drop it
        for (name, typ), values in zip(OUTPUT_FIELDS, cols):
            out = out.append_column(name, pa.array(values, type=typ))
        return out
