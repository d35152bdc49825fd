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
