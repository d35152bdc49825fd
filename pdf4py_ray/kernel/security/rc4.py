"""RC4 stream cipher (public textbook algorithm, RFC-described KSA/PRGA).

Used by the PDF standard security handler for V≤4 / CFM=V2 documents
(reference analogue: ``pdf4py/_security/rc4.py``).
"""

from __future__ import annotations


def rc4(data: bytes, key: bytes) -> bytes:
    """Encrypt/decrypt ``data`` with RC4 under ``key`` (symmetric)."""
    # key-scheduling
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    # keystream generation + xor
    out = bytearray(len(data))
    i = j = 0
    for k, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = byte ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)
