"""Shared vectorized string/word hashing for the dedup + fingerprint
stages, with an exact DuckDB mirror.

Every hash here is built from ONE primitive: ``u64(s) = first 8 bytes of
md5(s), little-endian`` — chosen because DuckDB computes the identical
value as ``((md5_number(s) % 2^64) + 2^64) % 2^64`` (md5_number is the
16-byte digest read as a little-endian 128-bit integer), so the minhash /
simhash / fingerprint oracles in ``__ray_entry__`` can replicate the
engine arithmetic bit-for-bit.

Word-level batching: document text is word soup over a bounded
vocabulary, so md5 runs once per UNIQUE word per batch (``np.unique``
inverse mapping), and everything downstream — shingle hashes, minhash
permutations, simhash bit votes, positional fingerprints — is pure
vectorized uint64 numpy whose wraparound (mod 2^64) the SQL mirrors with
HUGEINT arithmetic + explicit ``% 2^64``.

Shingle combine: ``h(w1,w2,w3) = (w32_1*A + w32_2*B + w32_3) mod 2^64``
over 32-bit-masked word hashes (products < 2^64 — exact in uint64 AND in
DuckDB HUGEINT).  Shorter-than-3-word documents drop the missing terms
(pad-with-zero semantics).
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = 1 << 64
MASK32 = np.uint64(0xFFFFFFFF)
# Knuth / xxhash 32-bit multiplicative constants (odd, < 2^32) — keep
# w32*A and w32*B below 2^64 so numpy and HUGEINT agree term-by-term
SHINGLE_A = np.uint64(2654435761)
SHINGLE_B = np.uint64(2246822519)
# positional-fingerprint base (FNV-64 prime, < 2^41)
FP_BASE = np.uint64(1099511628211)
FP_MASK63 = np.uint64(0x7FFFFFFFFFFFFFFF)


def u64_md5(strings) -> np.ndarray:
    """Process-stable 64-bit hashes (md5 digest[:8] little-endian)."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")
            for s in strings
        ],
        dtype=np.uint64,
    )


def split_words(text: str) -> list[str]:
    """``string_split(text, ' ')`` semantics with ``'' -> []`` — the exact
    tokenization the DuckDB oracles use (the corpus is single-space word
    soup; see __ray_entry__)."""
    return text.split(" ") if text else []


def batch_word_hashes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """All documents' word hashes in one pass.

    Returns ``(hashes, offsets)``: ``hashes`` is the concatenated uint64
    word-hash array in document order; ``offsets[i]:offsets[i+1]`` slices
    document i.  md5 runs once per unique word in the batch."""
    words_per_doc = [split_words(t or "") for t in texts]
    lens = np.fromiter(
        (len(w) for w in words_per_doc), dtype=np.int64, count=len(words_per_doc)
    )
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat: list[str] = [w for ws in words_per_doc for w in ws]
    if not flat:
        return np.zeros(0, dtype=np.uint64), offsets
    # hash-based factorize beats sort-based np.unique ~20x on word soup
    import pandas as pd

    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    return u64_md5(uniques)[codes], offsets


def shingle_hashes(w: np.ndarray) -> np.ndarray:
    """One document's word hashes → 3-word shingle hashes (see module
    docstring for the combine).  len<3 documents produce one shingle from
    the available words; empty documents produce none."""
    w32 = w & MASK32
    n = len(w32)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if n == 1:
        return (w32 * SHINGLE_A).astype(np.uint64)
    if n == 2:
        return np.array(
            [w32[0] * SHINGLE_A + w32[1] * SHINGLE_B], dtype=np.uint64
        )
    return (w32[:-2] * SHINGLE_A + w32[1:-1] * SHINGLE_B + w32[2:]).astype(np.uint64)


_POW_CACHE = np.array([1], dtype=np.uint64)


def fp_powers(n: int) -> np.ndarray:
    """[FP_BASE^0 .. FP_BASE^(n-1)] mod 2^64, cached + grown on demand."""
    global _POW_CACHE
    if len(_POW_CACHE) < n:
        m = max(n, 2 * len(_POW_CACHE))
        p = np.empty(m, dtype=np.uint64)
        p[0] = 1
        np.multiply.accumulate(
            np.full(m - 1, FP_BASE, dtype=np.uint64), out=p[1:]
        )
        _POW_CACHE = p
    return _POW_CACHE[:n]


def positional_fingerprints(texts: list[str]) -> np.ndarray:
    """Order-sensitive 63-bit document fingerprints.

    ``fp = (sum_i w32_i * FP_BASE^(n-1-i)) mod 2^64  &  (2^63 - 1)`` over
    the document's 32-bit-masked word hashes — a polynomial ("rolling")
    hash evaluated positionally so word order matters, fully vectorized
    (the old per-byte FNV-1a loop ran interpreted Python per byte).
    Mirrored exactly by the ``fingerprint_rolling`` oracle SQL."""
    hashes, offsets = batch_word_hashes(texts)
    w32 = hashes & MASK32
    lens = np.diff(offsets)
    if len(w32) == 0:
        return np.zeros(len(texts), dtype=np.uint64)
    pows = fp_powers(int(lens.max()))
    # exponent of word j (local position i in doc d): len_d - 1 - i
    exps = np.concatenate(
        [np.arange(n - 1, -1, -1, dtype=np.int64) for n in lens if n > 0]
    )
    # mod-2^64 products/sums via int64 (SIMD multiply; two's-complement
    # wraparound is bit-identical to uint64), reinterpreted at the end
    with np.errstate(over="ignore"):
        terms = w32.view(np.int64) * pows[exps].view(np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    nonempty = np.flatnonzero(lens > 0)
    if len(nonempty):
        starts = offsets[nonempty]
        with np.errstate(over="ignore"):
            out[nonempty] = np.add.reduceat(terms, starts)
    return out.view(np.uint64) & FP_MASK63


# 16-bit popcount lookup for vectorized Hamming distance (numpy 1.x has
# no bitwise_count)
_POP16 = np.array(
    [bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8
)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via 4x 16-bit table lookups."""
    x = x.astype(np.uint64)
    c = _POP16[(x & np.uint64(0xFFFF)).astype(np.int64)].astype(np.int64)
    for s in (16, 32, 48):
        c += _POP16[((x >> np.uint64(s)) & np.uint64(0xFFFF)).astype(np.int64)]
    return c
