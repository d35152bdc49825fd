"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-profile heuristic), quality scoring, token
counting (whitespace + a BPE-ish regex), and document fingerprinting
(min rolling hash of word 5-grams). All are ``map_batches`` stages;
the heavy pieces (compiled regexes, stopword tables) live in actor
``__init__``.

Every column here — including lang-ID (stopword argmax) and the
fingerprint (Rabin-Karp mod 2⁶¹−1 over md5-lower-64 word hashes) — is
defined to be *exactly* replicable in DuckDB SQL (see
``__ray_entry__.oracle_sql``), so the driver value-gates all of them.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import md5_lower64, stable_hash64

# minimal stopword profiles (public common-word lists)
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on", "with", "as"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von"},
    "fr": {"le", "la", "les", "et", "est", "pas", "une", "un", "des", "du", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "no", "una", "un", "de", "que", "para"},
    "it": {"il", "la", "le", "e", "è", "non", "una", "un", "di", "che", "per", "con"},
}

# a BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs
# (the common GPT-2-style pattern shape, public knowledge)
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")
_WS_RE = re.compile(r"\s+")
_PUNCT_RE = re.compile(r"[.,;:!?]")
_WORD_RE = re.compile(r"[a-zà-ÿ]+")


class TextStats:
    """Actor-pool stage: append token/quality/lang/fingerprint columns."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.bpe = _BPE_RE
        self.ws = _WS_RE
        self.punct = _PUNCT_RE
        self.word = _WORD_RE
        self.profiles = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    # -- scalar kernels (applied per row over pandas Series) ----------------

    def lang_of(self, words: list) -> str:
        if not words:
            return "und"
        best, best_score = "und", 0.0
        for lang, stops in self.profiles.items():
            score = sum(1 for w in words if w in stops) / len(words)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score > 0.02 else "und"

    _FP_MOD = (1 << 61) - 1  # Mersenne prime: HUGEINT-safe in DuckDB
    _FP_BASE = 1099511628211

    def fingerprint_of(self, words: list, k: int = 5) -> int:
        """Document fingerprint: min rolling (Rabin-Karp) polynomial
        hash over word ``k``-grams, mod the Mersenne prime 2⁶¹−1 with
        md5-lower-64 word hashes — every step exactly replicable in
        DuckDB HUGEINT arithmetic, so the driver value-gates this
        column (``oracle_sql()['t_fingerprints']``). Stable across
        runs/workers/partitionings."""
        if not words:
            return 0
        M, B = self._FP_MOD, self._FP_BASE
        hs = [md5_lower64(w) % M for w in words]
        L = min(k, len(hs))
        powers = [pow(B, L - 1 - j, M) for j in range(L)]
        best = None
        for i in range(len(hs) - L + 1):
            acc = sum((hs[i + j] * powers[j]) % M for j in range(L)) % M
            if best is None or acc < best:
                best = acc
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.text_col].fillna("")
        stripped = text.str.strip()
        batch["n_chars"] = text.str.len().astype("int64")
        batch["n_tokens"] = np.where(
            stripped.str.len() > 0, stripped.str.count(self.ws) + 1, 0
        ).astype("int64")
        batch["n_bpe_tokens"] = text.str.count(self.bpe).astype("int64")
        n_punct = text.str.count(self.punct).astype("int64")
        batch["punct_ratio"] = np.where(
            batch["n_chars"] > 0, n_punct / batch["n_chars"], 0.0
        )
        words = text.str.lower().str.findall(self.word)
        en = self.profiles["en"]
        batch["stopword_ratio"] = words.map(
            lambda ws: sum(1 for w in ws if w in en) / len(ws) if ws else 0.0
        )
        # quality: bounded length term × clean-punctuation term
        batch["quality_score"] = np.minimum(1.0, batch["n_tokens"] / 100.0) * (
            1.0 - batch["punct_ratio"]
        )
        batch["lang_pred"] = words.map(self.lang_of)
        batch["fingerprint"] = words.map(self.fingerprint_of).astype("int64")
        return batch


def text_stats(ds, text_col: str = "text", concurrency=(2, 8), batch_size: int = 1024):
    """Attach the TextStats columns to a Dataset."""
    return ds.map_batches(
        TextStats,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def train_test_split_counts(ds, id_col: str = "doc_id", test_mod: int = 10,
                            train_below: int = 8):
    """Deterministic id-based train/val/test assignment (the standard
    shard-stable split for training corpora: membership is a pure
    function of the id, so re-runs and resumes agree) → per-split
    counts. id % 10 ∈ [0,8) train, 8 val, 9 test."""
    from ray.data.aggregate import Count

    def assign(batch: pa.Table) -> pa.Table:
        mod = batch[id_col].to_numpy(zero_copy_only=False) % test_mod
        split = np.where(mod < train_below, "train",
                         np.where(mod == train_below, "val", "test"))
        return batch.append_column("split", pa.array(split, type=pa.string()))

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("split")
        .aggregate(Count(alias_name="n_docs"))
    )


def shuffled_sample(ds, n: int = 100, seed: int = 42):
    """Seeded global ``random_shuffle`` (the pre-epoch shuffle of a
    training pipeline — an all-to-all) + take-n."""
    return ds.random_shuffle(seed=seed).limit(n)


class HllPartial:
    """Actor stage: per-batch HyperLogLog register partials for
    approximate distinct counting (the sketch pattern: tiny mergeable
    state instead of a distinct shuffle).

    Register layout (b=10 → 1024 registers over the md5-lower-64 value
    hash): register index = top 10 bits, rank = leading zeros of the
    remaining 54 bits + 1. Every step is integer-exact, so a DuckDB
    oracle recomputes the register maxima bit-for-bit — the sketch
    itself is value-gated, while the cardinality estimate derived from
    it is pinned by tolerance tests."""

    B_BITS = 10
    REST_BITS = 54

    def __init__(self, key_col: str, val_col: str) -> None:
        self.key_col = key_col
        self.val_col = val_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"key": [], "register_idx": [], "max_rank": []}
        mask = (1 << self.REST_BITS) - 1
        for key, vals in batch.groupby(self.key_col)[self.val_col]:
            regs: dict = {}
            for v in vals:
                h = md5_lower64(str(v))
                idx = h >> self.REST_BITS
                rest = h & mask
                rank = self.REST_BITS - rest.bit_length() + 1
                if rank > regs.get(idx, 0):
                    regs[idx] = rank
            for idx, rank in regs.items():
                rows["key"].append(key)
                rows["register_idx"].append(idx)
                rows["max_rank"].append(rank)
        return pd.DataFrame({
            self.key_col: rows["key"],
            "register_idx": pd.Series(rows["register_idx"], dtype="int64"),
            "max_rank": pd.Series(rows["max_rank"], dtype="int64"),
        })


def hll_registers(ds, key_col: str = "event_type", val_col: str = "user_id",
                  batch_size: int = 8192, concurrency=(2, 8)):
    """Distinct-count sketch registers per key: per-batch partials
    (each batch emits at most 1024 register rows per key — the
    combiner), then one small groupby takes the elementwise max."""
    partials = ds.map_batches(
        HllPartial,
        fn_constructor_kwargs={"key_col": key_col, "val_col": val_col},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    # one Ray group per KEY (few), elementwise max vectorized inside —
    # a multi-key Ray aggregate would pay per-group overhead across
    # keys × 1024 registers
    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby([key_col, "register_idx"], as_index=False).agg(
            max_rank=("max_rank", "max")
        )

    return partials.groupby(key_col).map_groups(combine, batch_format="pandas")


def hll_estimate(registers: pd.DataFrame, key_col: str = "event_type",
                 b: int = 10) -> pd.DataFrame:
    """Cardinality estimate from register maxima (standard HLL formula
    with the small-range linear-counting correction)."""
    import math

    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    out = []
    for key, grp in registers.groupby(key_col):
        regs = np.zeros(m)
        regs[grp["register_idx"].to_numpy()] = grp["max_rank"].to_numpy()
        est = alpha * m * m / np.sum(np.exp2(-regs))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        out.append({key_col: key, "distinct_est": float(est)})
    return pd.DataFrame(out)
