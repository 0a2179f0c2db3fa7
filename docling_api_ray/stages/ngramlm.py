"""Hashed n-gram language model with STUPID BACKOFF (Brants et al.
2007, "Large Language Models in Machine Translation" — the web-scale
LM scoring recipe: no discounting, score S(w|w₋₁) = c(w₋₁w)/c(w₋₁) when
the bigram was seen, else α·c(w)/N) — document-level LM scoring against
corpus statistics, the heavier sibling of the char-bigram model
(stages/charlm.py).

Bounded-state design: unigrams and bigrams live in HASHED buckets
(``u64_md5`` word hashes → 1024 unigram buckets; the minhash shingle
combine of two 32-bit-masked word hashes → 4096 bigram buckets —
functions/hashing.py arithmetic, so DuckDB replays both), making the
model two fixed-width int64 count vectors regardless of vocabulary:

- **train pass**: each block reduces to one (1024 + 4096)-int row pair,
  folded driver-side — the charlm mergeable-sketch shape, no shuffle;
- **score pass**: stateless vectorized ``map_batches`` against the
  value-captured tables — bucket gathers, an ``np.where`` backoff
  select over integer micro-log terms, cumsum-difference per-doc sums.

Exactness: every term is a SIGNED COMBINATION of individually
micro-quantized ``round(ln(int)·1e6)`` values —
seen:   r(ln c₂[b]) − r(ln c₁[prev])
unseen: r(ln α) + r(ln c₁[cur]) − r(ln N)        (α = 0.4)
— integers summed order-free, so the SQL oracle matches bit-for-bit;
``avg_lp = lp_micro / (n_terms·1e6)`` is one exact division.  The first
token of each document contributes its unigram term (the unseen branch
without α), mirroring the standard sentence-start handling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from docling_api_ray.functions.hashing import (
    MASK32,
    SHINGLE_A,
    batch_word_hashes,
)

U_BUCKETS = 1024
B_BUCKETS = 4096
ALPHA_MICRO = -916291  # round(ln(0.4) * 1e6) — the stupid-backoff α


def _bucket_ids(texts: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(unigram bucket per token, bigram bucket per adjacent same-doc
    pair aligned to the SECOND token [-1 for first-of-doc], per-doc
    token counts)."""
    hashes, offsets = batch_word_hashes(texts)
    lens = np.diff(offsets)
    ub = (hashes % np.uint64(U_BUCKETS)).astype(np.int64)
    n = len(hashes)
    bb = np.full(n, -1, dtype=np.int64)
    if n > 1:
        w32 = hashes & MASK32
        with np.errstate(over="ignore"):
            comb = w32[:-1] * SHINGLE_A + w32[1:]
        # position i+1 gets the (i, i+1) bigram iff both tokens are in
        # the same document
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        same = doc_of[:-1] == doc_of[1:]
        tgt = np.flatnonzero(same) + 1
        bb[tgt] = (comb[tgt - 1] % np.uint64(B_BUCKETS)).astype(np.int64)
    return ub, bb, lens


def train_ngram_counts(
    ds: ray.data.Dataset, *, text_col: str = "text"
) -> tuple[np.ndarray, np.ndarray]:
    """One streaming pass → (unigram[1024], bigram[4096]) int64 counts."""

    def partial(b: pa.Table) -> pa.Table:
        texts = [t if t is not None else "" for t in b[text_col].to_pylist()]
        ub, bb, _ = _bucket_ids(texts)
        uc = np.bincount(ub, minlength=U_BUCKETS).astype(np.int64)
        bc = np.bincount(
            bb[bb >= 0], minlength=B_BUCKETS
        ).astype(np.int64)
        return pa.table(
            {
                "u": pa.array([uc], type=pa.list_(pa.int64())),
                "b": pa.array([bc], type=pa.list_(pa.int64())),
            }
        )

    u_total = np.zeros(U_BUCKETS, dtype=np.int64)
    b_total = np.zeros(B_BUCKETS, dtype=np.int64)
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for u, b in zip(batch["u"].to_pylist(), batch["b"].to_pylist()):
            u_total += np.asarray(u, dtype=np.int64)
            b_total += np.asarray(b, dtype=np.int64)
    return u_total, b_total


def _micro_ln(x: np.ndarray) -> np.ndarray:
    """round(ln(x)·1e6) as int64 for positive ints; 0 where x == 0
    (guarded — never selected by the backoff logic for zero counts)."""
    out = np.zeros(len(x), dtype=np.int64)
    nz = x > 0
    out[nz] = np.rint(np.log(x[nz].astype(np.float64)) * 1e6).astype(np.int64)
    return out


def _backoff_score(u_counts, b_counts):
    """Task-pool closure (value-captured tables — KB-sized, see
    clustering._partial_sums)."""
    r_u = _micro_ln(u_counts)
    r_b = _micro_ln(b_counts)
    r_n = int(np.rint(np.log(float(max(u_counts.sum(), 1))) * 1e6))

    def score(batch: pa.Table) -> pa.Table:
        texts = [
            t if t is not None else "" for t in batch["text"].to_pylist()
        ]
        ub, bb, lens = _bucket_ids(texts)
        n = len(ub)
        terms = np.zeros(n, dtype=np.int64)
        if n:
            prev_u = np.empty(n, dtype=np.int64)
            prev_u[0] = 0
            prev_u[1:] = ub[:-1]
            has_bigram = (bb >= 0) & (b_counts[np.maximum(bb, 0)] > 0)
            # seen: r(ln c2[bb]) − r(ln c1[prev]); prev count > 0 by
            # construction (the prev token itself was counted in c1)
            seen = r_b[np.maximum(bb, 0)] - r_u[prev_u]
            # unseen / first-of-doc: α + r(ln c1[cur]) − r(ln N)
            unseen = r_u[ub] - r_n
            first = bb < 0  # includes first token of every doc
            terms = np.where(
                has_bigram, seen, np.where(first, unseen, ALPHA_MICRO + unseen)
            )
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        csum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(terms, out=csum[1:])
        lp = csum[offsets[1:]] - csum[offsets[:-1]]
        denom = np.maximum(lens, 1).astype(np.float64) * 1e6
        avg = np.where(lens > 0, lp.astype(np.float64) / denom, 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(lens, type=pa.int64()),
                "lp_micro": pa.array(lp, type=pa.int64()),
                "avg_lp": pa.array(avg, type=pa.float64()),
            }
        )

    return score


def ngram_backoff_scores(
    ds: ray.data.Dataset, *, text_col: str = "text"
) -> ray.data.Dataset:
    """documents → (doc_id, n_tokens, lp_micro, avg_lp) under the
    hashed-bucket stupid-backoff bigram LM."""
    u_counts, b_counts = train_ngram_counts(ds, text_col=text_col)
    return ds.map_batches(
        _backoff_score(u_counts, b_counts),
        batch_format="pyarrow",
        batch_size=1024,
    )
