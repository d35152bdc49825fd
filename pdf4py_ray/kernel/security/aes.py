"""AES-128/192/256 + CBC mode, from the public FIPS-197 specification.

The S-box and round constants are *derived algorithmically* at import
time (GF(2^8) inverse + affine transform) rather than written as
literals. Both directions are implemented: decrypt is needed for
encrypted-PDF parsing (reference analogue ``pdf4py/_security/aes.py``),
encrypt additionally powers the fixture generator.

Padding semantics match the reference: PKCS#7-style pad on encrypt;
on decrypt the last byte is taken as the pad length and stripped
without validation (``aes.py:228-230``).
"""

from __future__ import annotations


def _xtime(b: int) -> int:
    b <<= 1
    return (b ^ 0x1B) & 0xFF if b & 0x100 else b


def _gmul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a = _xtime(a)
        b >>= 1
    return r


def _build_tables():
    # exp/log tables over GF(2^8) with generator 0x03
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= _xtime(x)  # multiply by 0x03
    exp[255] = exp[0]  # g^255 == 1, needed for inv(1)

    def inv(b: int) -> int:
        return 0 if b == 0 else exp[255 - log[b]]

    def affine(b: int) -> int:
        s = b
        for shift in (1, 2, 3, 4):
            s ^= ((b << shift) | (b >> (8 - shift))) & 0xFF
        return s ^ 0x63

    sbox = [affine(inv(b)) for b in range(256)]
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    rcon = [0] * 32
    v = 1
    for i in range(1, 32):
        rcon[i] = v
        v = _xtime(v)
    return bytes(sbox), bytes(inv_sbox), rcon


SBOX, INV_SBOX, RCON = _build_tables()

# precomputed GF(2^8) multiplication tables for the MixColumns
# coefficients — turns the per-byte _gmul loop (the kernel's hottest
# path when decrypting AES PDFs) into byte-table lookups
_MUL = {c: bytes(_gmul(x, c) for x in range(256)) for c in (1, 2, 3, 9, 11, 13, 14)}

_BLOCK = 16


def expand_key(key: bytes) -> list:
    """FIPS-197 key schedule → list of round-key 16-byte blocks."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16, 24 or 32 bytes.")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        w = list(words[i - 1])
        if i % nk == 0:
            w = w[1:] + w[:1]
            w = [SBOX[b] for b in w]
            w[0] ^= RCON[i // nk]
        elif nk > 6 and i % nk == 4:
            w = [SBOX[b] for b in w]
        words.append([a ^ b for a, b in zip(words[i - nk], w)])
    return [
        bytes(b for w in words[4 * r : 4 * r + 4] for b in w) for r in range(nr + 1)
    ]


def _shift_rows(s: list) -> list:
    # state is column-major: byte (row r, col c) at index 4*c + r
    return [s[4 * ((c + r) % 4) + r] for c in range(4) for r in range(4)]


def _inv_shift_rows(s: list) -> list:
    return [s[4 * ((c - r) % 4) + r] for c in range(4) for r in range(4)]


def _mix_columns(s: list, inverse: bool) -> list:
    coef = (14, 11, 13, 9) if inverse else (2, 3, 1, 1)
    m0, m1, m2, m3 = (_MUL[c] for c in coef)
    out = [0] * 16
    for c in range(0, 16, 4):
        a, b, d, e = s[c], s[c + 1], s[c + 2], s[c + 3]
        out[c] = m0[a] ^ m1[b] ^ m2[d] ^ m3[e]
        out[c + 1] = m3[a] ^ m0[b] ^ m1[d] ^ m2[e]
        out[c + 2] = m2[a] ^ m3[b] ^ m0[d] ^ m1[e]
        out[c + 3] = m1[a] ^ m2[b] ^ m3[d] ^ m0[e]
    return out


def encrypt_block(block: bytes, round_keys: list) -> bytes:
    nr = len(round_keys) - 1
    s = [b ^ k for b, k in zip(block, round_keys[0])]
    for rnd in range(1, nr):
        s = [SBOX[b] for b in s]
        s = _shift_rows(s)
        s = _mix_columns(s, inverse=False)
        s = [b ^ k for b, k in zip(s, round_keys[rnd])]
    s = [SBOX[b] for b in s]
    s = _shift_rows(s)
    return bytes(b ^ k for b, k in zip(s, round_keys[nr]))


def decrypt_block(block: bytes, round_keys: list) -> bytes:
    nr = len(round_keys) - 1
    s = [b ^ k for b, k in zip(block, round_keys[nr])]
    for rnd in range(nr - 1, 0, -1):
        s = _inv_shift_rows(s)
        s = [INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, round_keys[rnd])]
        s = _mix_columns(s, inverse=True)
    s = _inv_shift_rows(s)
    s = [INV_SBOX[b] for b in s]
    return bytes(b ^ k for b, k in zip(s, round_keys[0]))


def cbc_encrypt(data: bytes, key: bytes, iv: bytes, padding: bool = True) -> bytes:
    rem = len(data) % _BLOCK
    if padding:
        pad = _BLOCK - rem
        data = data + bytes([pad]) * pad
    elif rem:
        raise ValueError("cbc_encrypt: length not a block multiple with padding off.")
    rks = expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), _BLOCK):
        block = bytes(a ^ b for a, b in zip(data[i : i + _BLOCK], prev))
        prev = encrypt_block(block, rks)
        out.extend(prev)
    return bytes(out)


def cbc_decrypt(data: bytes, key: bytes, iv: bytes, padding: bool = True) -> bytes:
    if len(data) % _BLOCK:
        raise ValueError("cbc_decrypt: ciphertext length not a block multiple.")
    rks = expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), _BLOCK):
        block = data[i : i + _BLOCK]
        out.extend(a ^ b for a, b in zip(decrypt_block(block, rks), prev))
        prev = block
    if padding and out:
        pad = out[-1]
        # parity with the reference: strip without validation; a pad
        # byte of 0 strips everything (slice semantics, ``aes.py:230``)
        return bytes(out[:-pad]) if pad else b""
    return bytes(out)
