"""Stream filter (decode) library.

Registry-based, mirroring the reference's only extension surface
(``pdf4py/_decoders.py:7-14``): ``@register(name)`` adds a decoder
``f(data, params) -> bytes``. All decoders are pure byte→byte kernels
run inside the same ``map_batches`` stage as parsing.

Behavioral-parity quirks deliberately preserved (the correctness gate
is equality with the reference, so its quirks are spec):

- the filter chain is applied in **reversed** listed order
  (``_decoders.py:173``; the ISO spec says listed order — identical for
  the single-filter streams that dominate in practice);
- PNG *Sub* rows add the **raw** previous byte of the same scanline,
  not the reconstructed one (``_decoders.py:63``);
- ASCII85 processes 5-byte groups up to ``len(data) - 2`` with no
  ``z`` shortcut and drops leading zero bytes of each group
  (``_decoders.py:132-146``);
- ASCIIHexDecode requires the ``>`` EOD to be the final byte
  (``_decoders.py:106-114``).

``LZWDecode`` is new here — absent from the reference
(``/root/reference/TODO.md:10``) — implemented from the published
PDF-1.7 spec (§7.4.4) with the ``EarlyChange`` parameter, plus an
encoder used by the fixture generator for round-trip tests.
"""

from __future__ import annotations

import zlib
from binascii import unhexlify

import numpy as np

from .errors import PdfDataError, PdfUnsupportedError

_BLANKS = b"\x00\t\n\x0c\r "

decoders: dict = {}


def register(filter_name: str):
    """Register ``func`` as the decoder for ``filter_name``."""

    def wrapper(func):
        decoders[filter_name] = func
        return func

    return wrapper


# --------------------------------------------------------------------------
# predictors


def undo_tiff_predictor(data: bytes, columns: int, bits_per_component: int, colors: int) -> bytes:
    """Undo TIFF horizontal differencing (predictor 2), ≥8 bpc only.

    Per-lane prefix sums mod 256 — vectorized with numpy instead of the
    reference's per-byte loop (``_decoders.py:18-29``), byte-identical
    output for whole rows.
    """
    if bits_per_component < 8:
        raise PdfUnsupportedError(
            f"BitsPerComponent={bits_per_component} is not supported by the TIFF predictor."
        )
    bpp = int(bits_per_component / 8 * colors)
    rowlen = columns * bpp
    if rowlen <= 0:
        return bytes(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    nfull = len(arr) // rowlen
    out = bytearray(len(data))
    if nfull:
        body = arr[: nfull * rowlen].reshape(nfull, rowlen // bpp, bpp).astype(np.int64)
        dec = (np.cumsum(body, axis=1) % 256).astype(np.uint8)
        out[: nfull * rowlen] = dec.tobytes()
    # trailing partial row: sequential fallback (reference loops bytes)
    base = nfull * rowlen
    tail = data[base:]
    for j in range(len(tail)):
        if j < bpp:
            out[base + j] = tail[j]
        else:
            out[base + j] = (out[base + j - bpp] + tail[j]) & 255
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def undo_png_predictor(data: bytes, columns: int, bits_per_component: int, colors: int) -> bytes:
    """Undo PNG row filters 0-4 (https://www.w3.org/TR/PNG-Filters.html).

    The all-rows-Up case (how xref streams are written in practice) is
    fully vectorized as a column-wise prefix sum mod 256; other filter
    types fall back to per-row numpy ops.
    """
    if bits_per_component < 8:
        raise PdfUnsupportedError(
            f"BitsPerComponent={bits_per_component} is not supported by the PNG predictor."
        )
    bpp = int(bits_per_component / 8 * colors)
    rowlen = columns * bpp
    stride = rowlen + 1
    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)

    if rowlen > 0 and n % stride == 0:
        mat = arr.reshape(n // stride, stride)
        ftypes = mat[:, 0]
        body = mat[:, 1:]
        if np.all(ftypes == 2):  # Up everywhere → vertical cumsum
            dec = (np.cumsum(body.astype(np.int64), axis=0) % 256).astype(np.uint8)
            return dec.tobytes()
        if np.all(ftypes == 0):
            return body.tobytes()

    out = bytearray()
    prev = np.zeros(rowlen, dtype=np.int64)
    for r0 in range(0, n, stride):
        ftype = data[r0]
        cur = arr[r0 + 1 : r0 + 1 + rowlen].astype(np.int64)
        w = len(cur)
        if ftype == 0:
            dec = cur
        elif ftype == 1:
            # reference quirk: adds the *raw* left neighbour, not the
            # reconstructed one (``_decoders.py:63``)
            dec = cur.copy()
            if w > bpp:
                dec[bpp:] = (cur[bpp:] + cur[:-bpp]) % 256
        elif ftype == 2:
            dec = (cur + prev[:w]) % 256
        elif ftype == 3:
            dec = np.zeros(w, dtype=np.int64)
            for i in range(w):
                left = 0 if i < bpp else int(dec[i - bpp])
                dec[i] = (int(cur[i]) + (left + int(prev[i])) // 2) % 256
        elif ftype == 4:
            dec = np.zeros(w, dtype=np.int64)
            for i in range(w):
                a = 0 if i < bpp else int(dec[i - bpp])
                b = int(prev[i])
                c = 0 if i < bpp else int(prev[i - bpp])
                dec[i] = (int(cur[i]) + _paeth(a, b, c)) % 256
        else:
            raise PdfUnsupportedError(f"Unsupported PNG predictor row filter: {ftype}")
        out.extend(dec.astype(np.uint8).tobytes())
        prev_full = np.zeros(rowlen, dtype=np.int64)
        prev_full[:w] = dec
        prev = prev_full
    return bytes(out)


def _apply_predictor(data: bytes, params: dict) -> bytes:
    predictor = params.get("Predictor", 1)
    if predictor == 1:
        return data
    columns = params.get("Columns", 1)
    colors = params.get("Colors", 1)
    bpc = params.get("BitsPerComponent", 8)
    if predictor == 2:
        return undo_tiff_predictor(data, columns, bpc, colors)
    if predictor >= 10:
        return undo_png_predictor(data, columns, bpc, colors)
    return data


# --------------------------------------------------------------------------
# filters


@register("FlateDecode")
def flate_decode(data: bytes, params: dict) -> bytes:
    return _apply_predictor(zlib.decompress(data), params)


@register("LZWDecode")
def lzw_decode(data: bytes, params: dict) -> bytes:
    """LZW per PDF-1.7 §7.4.4: 9→12 bit codes MSB-first, 256=clear,
    257=EOD, ``EarlyChange`` (default 1) advances the code width one
    entry early. Absent from the reference (``TODO.md:10``)."""
    if not isinstance(params, dict):
        params = {}
    early = params.get("EarlyChange", 1)
    out = bytearray()
    table: list = [bytes([i]) for i in range(256)] + [b"", b""]
    bits = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= bits:
            code = (acc >> (nbits - bits)) & ((1 << bits) - 1)
            nbits -= bits
            if code == 256:
                table = table[:258]
                bits = 9
                prev = None
                continue
            if code == 257:
                return _apply_predictor(bytes(out), params)
            if prev is None:
                if code >= len(table):
                    raise PdfDataError("LZWDecode: invalid first code.")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise PdfDataError("LZWDecode: code out of range.")
            out.extend(entry)
            prev = entry
            if len(table) + early >= (1 << bits) and bits < 12:
                bits += 1
    # PDF 1.7 §7.4.4 allows /Predictor DecodeParms on LZW as on Flate
    return _apply_predictor(bytes(out), params)


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    """LZW encoder (fixture generation / round-trip tests only)."""
    table: dict = {bytes([i]): i for i in range(256)}
    next_code = 258
    bits = 9
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc = (acc << bits) | code
        nbits += bits
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # the decoder's table lags the encoder's by one entry, hence
        # the -1 relative to the decode-side condition
        if next_code + early - 1 >= (1 << bits) and bits < 12:
            bits += 1
        if next_code >= 4096:
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            bits = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


@register("ASCIIHexDecode")
def asciihex_decode(data: bytes, params: dict) -> bytes:
    eod = data.find(b">")
    if eod != len(data) - 1:
        raise PdfDataError("ASCIIHexDecode: badly encoded data.")
    body = data[:-1].translate(None, _BLANKS)
    if len(body) % 2 == 1:
        body += b"0"
    return unhexlify(body)


@register("ASCII85Decode")
def ascii85_decode(data: bytes, params: dict) -> bytes:
    """Base-85 decode with the reference's exact group arithmetic
    (``_decoders.py:132-146``): 5-byte groups up to ``len-2``, partial
    final group weighted from 85^0, leading zero bytes dropped."""
    out = bytearray()
    for i in range(0, len(data) - 2, 5):
        group = data[i : i + 5]
        value = 0
        weight = 1
        for x in reversed(group):
            value += (x - 33) * weight
            weight *= 85
        digits = bytearray()
        while value > 0:
            value, rem = divmod(value, 256)
            digits.insert(0, rem)
        out.extend(digits)
    return bytes(out)


@register("RunLengthDecode")
def runlength_decode(data: bytes, params: dict) -> bytes:
    out = bytearray()
    i = 0
    m = len(data)
    while i < m:
        length = data[i]
        if length == 128:
            break
        if length < 128:
            out.extend(data[i + 1 : i + 2 + length])
            i += 2 + length
        else:
            out.extend(data[i + 1 : i + 2] * (257 - length))
            i += 2
    return bytes(out)


@register("JBIG2Decode")
@register("JPXDecode")
@register("DCTDecode")
def _identity_passthrough(data: bytes, params: dict) -> bytes:
    """Image codecs are passed through un-decoded (like the reference)."""
    return data


def decode_chain(stream_dict: dict, data: bytes) -> bytes:
    """Apply the ``/Filter`` chain with ``/DecodeParms``.

    Parity notes (``_decoders.py:167-180``): chain applied in
    *reversed* listed order; ``Crypt`` skipped (handled by the security
    layer); the same params dict is handed to every filter in the
    chain; unknown filters raise ``PdfUnsupportedError``.
    """
    chain = stream_dict.get("Filter")
    if chain is None:
        return data
    if not isinstance(chain, list):
        chain = (chain,)
    params = stream_dict.get("DecodeParms", {})
    if params is None:
        params = {}
    for name in reversed(chain):
        if name == "Crypt":
            continue
        decoder = decoders.get(name)
        if decoder is None:
            raise PdfUnsupportedError(f"Filter '{name}' is not supported.")
        data = decoder(data, params)
    return data
