"""Deterministic hashing utilities.

Python's builtin ``hash`` is process-salted and must never be used in
distributed kernels — every helper here is a pure function of its
input, stable across workers, nodes and runs.
"""

from __future__ import annotations

from hashlib import blake2b, md5

import numpy as np

_MERSENNE_61 = (1 << 61) - 1


def stable_hash64(data) -> int:
    """64-bit stable content hash (blake2b-8)."""
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    return int.from_bytes(blake2b(data, digest_size=8).digest(), "big")


def md5_lower64(s) -> int:
    """Lower 64 bits of MD5 exactly as DuckDB's ``md5_number_lower``
    computes them (digest bytes 8..16, little-endian). Used as the
    word hash wherever a SQL oracle must recompute hashes in DuckDB;
    kernels with no oracle requirement keep the faster blake2b
    :func:`stable_hash64`."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(md5(s).digest()[8:16], "little")


def stable_hash64_column(values) -> np.ndarray:
    """Vector of stable 64-bit hashes for an iterable of strings."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = stable_hash64(v or "")
    return out


_M61 = np.uint64(_MERSENNE_61)


def mulmod61(a: np.ndarray, b) -> np.ndarray:
    """Vectorized ``a * b mod 2^61-1`` for uint64 inputs < 2^61.

    31-bit limb decomposition keeps every partial product inside
    uint64; the Mersenne identity ``2^61 ≡ 1`` folds the high limbs
    back without 128-bit arithmetic — bit-exact with Python's
    arbitrary-precision ``(a * b) % M`` (property-tested)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    lo_mask = np.uint64((1 << 31) - 1)
    a_hi, a_lo = a >> np.uint64(31), a & lo_mask
    b_hi, b_lo = b >> np.uint64(31), b & lo_mask
    p0 = a_lo * b_lo                       # < 2^62
    p1 = a_lo * b_hi + a_hi * b_lo         # < 2^62
    p2 = a_hi * b_hi                       # < 2^60
    # p1·2^31 = q·2^61 + r·2^31 ≡ q + r·2^31  (q = p1>>30, r = p1&(2^30-1))
    t1 = (p1 >> np.uint64(30)) + ((p1 & np.uint64((1 << 30) - 1)) << np.uint64(31))
    total = p0 + t1 + (p2 << np.uint64(1))  # < 2^64, no overflow
    total = (total >> np.uint64(61)) + (total & _M61)
    total = (total >> np.uint64(61)) + (total & _M61)
    return np.where(total >= _M61, total - _M61, total)


def rolling_min_fingerprint(hs_flat: np.ndarray, offsets: np.ndarray,
                            base: int, k: int = 5) -> np.ndarray:
    """Per-document min rolling polynomial hash, fully vectorized over
    a CONCATENATED word-hash array.

    ``hs_flat`` holds every document's word hashes (mod 2^61-1) back to
    back; ``offsets`` (len = n_docs+1) delimits documents. For each
    document with ≥ ``k`` words the result is
    ``min_i sum_j hs[i+j]·base^(k-1-j) mod M`` — identical to the
    scalar loop in :class:`~..stages.textstats.TextStats` and to the
    DuckDB HUGEINT oracle. Documents with < ``k`` words get the
    sentinel ``M`` (caller falls back / zero-fills); windows crossing
    document boundaries are masked out. One pass of ``k`` shifted
    :func:`mulmod61` multiplies + one ``minimum.reduceat`` — no Python
    per-row loop."""
    M = _MERSENNE_61
    n = len(hs_flat)
    n_docs = len(offsets) - 1
    out = np.full(n_docs, M, dtype=np.uint64)
    if n < k:
        return out
    powers = [pow(base, k - 1 - j, M) for j in range(k)]
    nw = n - k + 1
    acc = np.zeros(nw, dtype=np.uint64)
    for j in range(k):
        acc += mulmod61(hs_flat[j:j + nw], powers[j])  # sum < 5·2^61 < 2^64
    acc = (acc >> np.uint64(61)) + (acc & _M61)
    acc = np.where(acc >= _M61, acc - _M61, acc)
    lens = np.diff(offsets)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    valid = doc_of[:nw] == doc_of[k - 1:k - 1 + nw]
    acc = np.where(valid, acc, np.uint64(M))
    ge = np.flatnonzero(lens >= k)
    if len(ge):
        starts = offsets[ge].astype(np.int64)
        out[ge] = np.minimum.reduceat(acc, starts)
    return out


def minhash_params(num_perm: int, seed: int = 42):
    """(a, b) coefficient vectors for the multiply-add hash family."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 62, size=num_perm, dtype=np.uint64) | np.uint64(1)  # odd
    b = rng.randint(0, 1 << 62, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature of one document's shingle-hash set.

    ``h_i(x) = a_i * x + b_i (mod 2^64)`` with odd ``a_i`` — a fully
    vectorized (num_perm × n_shingles) uint64 broadcast, minimised
    over the shingles.
    """
    if len(shingle_hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64)
    with np.errstate(over="ignore"):
        vals = a[:, None] * x[None, :] + b[:, None]
    return vals.min(axis=1)


def band_hashes(signature: np.ndarray, num_bands: int) -> list:
    """LSH band digests of a MinHash signature."""
    rows = len(signature) // num_bands
    out = []
    for band in range(num_bands):
        chunk = signature[band * rows : (band + 1) * rows]
        out.append(int.from_bytes(blake2b(chunk.tobytes(), digest_size=8).digest(), "big") >> 1)
    return out
