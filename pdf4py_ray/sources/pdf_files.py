"""Raw-PDF-corpus source: a directory of ``*.pdf`` files → the turn
table the extraction pipeline consumes.

This is the engine's analogue of the reference's test-corpus reader
(``tests/functional_tests.py:27-33`` — open every file under
``tests/pdfs``): a user with a directory of PDFs gets the same
pipeline as transcript-embedded payloads. Built on
``ray.data.read_binary_files`` (streaming, one block per file group,
no driver-side file loop); each file becomes a single-turn
conversation whose payload is the standard base64 PDF envelope, so
``ExtractTurns`` needs no special casing.
"""

from __future__ import annotations

import base64
import json
import os
from datetime import datetime

import pyarrow as pa

_EPOCH = datetime(2026, 1, 1)


def pdf_files_to_turns(batch: pa.Table) -> pa.Table:
    """(bytes, path) rows → transcript-turn rows."""
    from .transcripts import TURN_SCHEMA

    rows = []
    for data, path in zip(batch["bytes"].to_pylist(), batch["path"].to_pylist()):
        stem = os.path.splitext(os.path.basename(path))[0]
        envelope = json.dumps({"pdf_b64": base64.b64encode(data).decode("ascii")})
        rows.append(
            {
                "conv_id": f"file-{stem}",
                "turn_idx": 0,
                "role": "tool",
                "text": envelope,
                "tool": "pdf_reader",
                "ts": _EPOCH,
            }
        )
    return pa.Table.from_pylist(rows, schema=TURN_SCHEMA)


def read_pdf_corpus(path: str):
    """Lazy Dataset of transcript turns, one per ``*.pdf`` under
    ``path`` (recursive)."""
    import ray.data as rd

    files = rd.read_binary_files(
        path, include_paths=True, file_extensions=["pdf"]
    )
    return files.map_batches(pdf_files_to_turns, batch_format="pyarrow")


def extract_pdf_corpus(path: str, **kwargs):
    """End-to-end: PDF directory → extracted text Dataset (same stages
    as the transcript pipeline)."""
    from ..pipelines.extract_pipeline import SORT_KEYS, extraction_dataset

    ds = extraction_dataset(read_pdf_corpus(path), **kwargs)
    return ds.sort(SORT_KEYS)
