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


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney — the "proper" smoothed sibling of stupid
# backoff (Kneser & Ney 1995; Chen & Goodman 1999's interpolated form):
#
#   P_KN(c | p) = max(C(p,c) − d, 0) / C(p·)
#               + d · N1+(p,·) / C(p·) · N1+(·,c) / N1+(·,·)
#
# over the SAME hashed 1024-bucket token alphabet as the backoff model
# (the model is DEFINED over buckets, so collision structure is part of
# the spec and DuckDB replays it exactly).  With d = 3/4 the whole
# probability is one integer ratio after a ×4 lift:
#
#   num = max(4·C(p,c) − 3, 0) · T  +  3 · N1+(p,·) · N1+(·,c)
#   den = 4 · C(p·) · T                       (T = N1+(·,·))
#
# so each token's log term is r(ln num) − r(ln den) — two individually
# micro-quantized integer logs, summed order-free (the stupid-backoff
# exactness discipline).  First-of-doc tokens contribute the unigram
# MLE term r(ln c₁[c]) − r(ln N), mirroring ngram_backoff_scores.
#
# Scale shape: train folds a SPARSE (prev_bucket, cur_bucket) count
# table — domain ≤ 1024² = 1,048,576 cells, corpus-independent — plus
# the dense unigram[1024]; the driver materializes ≤ ~17 MB of model
# state once and broadcasts it via ray.put (actors fetch in __init__,
# the BatchTopK discipline).  int64 holds 4·C·T to ~10¹² training
# tokens; split hi/lo limbs beyond (grouped_ols caveat class).

KN_PAIR_DOM = U_BUCKETS * U_BUCKETS
_KN_D4 = 3  # 4·d with discount d = 0.75


def _pair_ids(texts: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(unigram bucket per token, prev_ub·1024+cur_ub pair aligned to
    the SECOND token [-1 for first-of-doc], per-doc token counts) —
    the (p, c) pair over the unigram-bucket alphabet, NOT the 4096
    combined-hash bigram bucket (_bucket_ids), because Kneser-Ney's
    follower/continuation counts need the pair to FACTOR."""
    hashes, offsets = batch_word_hashes(texts)
    lens = np.diff(offsets)
    ub = (hashes % np.uint64(U_BUCKETS)).astype(np.int64)
    n = len(hashes)
    pair = np.full(n, -1, dtype=np.int64)
    if n > 1:
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        same = doc_of[:-1] == doc_of[1:]
        tgt = np.flatnonzero(same) + 1
        pair[tgt] = ub[tgt - 1] * U_BUCKETS + ub[tgt]
    return ub, pair, lens


def train_kn_counts(
    ds: ray.data.Dataset, *, text_col: str = "text"
) -> tuple[np.ndarray, np.ndarray]:
    """One streaming pass → (unigram[1024], dense pair C[1024,1024])
    int64 counts.  Each block emits SPARSE (key, n) rows — key = pair
    id for bigrams, key = −1−ub for unigrams — folded by
    ``bounded_groupby_sum`` (domain ≤ 1024² + 1024, corpus-independent);
    the driver pull is domain-bounded (≤ ~17 MB), never
    row-proportional."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    schema = pa.schema([("key", pa.int64()), ("n", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return schema.empty_table()
        texts = [t if t is not None else "" for t in b[text_col].to_pylist()]
        ub, pair, _ = _pair_ids(texts)
        uk, un = np.unique(ub, return_counts=True)
        pk, pn = np.unique(pair[pair >= 0], return_counts=True)
        return pa.table(
            {
                "key": pa.array(
                    np.concatenate([-1 - uk, pk]), type=pa.int64()
                ),
                "n": pa.array(
                    np.concatenate([un, pn]).astype(np.int64), type=pa.int64()
                ),
            }
        )

    folded = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["key"],
        sum_cols={"n": "n"},
    )
    uc = np.zeros(U_BUCKETS, dtype=np.int64)
    cmat = np.zeros((U_BUCKETS, U_BUCKETS), dtype=np.int64)
    for blk in folded.iter_batches(batch_format="pyarrow"):
        keys = np.asarray(blk["key"], dtype=np.int64)
        ns = np.asarray(blk["n"], dtype=np.int64)
        um = keys < 0
        uc[-1 - keys[um]] += ns[um]
        pk = keys[~um]
        cmat[pk // U_BUCKETS, pk % U_BUCKETS] += ns[~um]
    return uc, cmat


class KNScorer:
    """Actor-pool scorer: model arrays fetched once per actor from the
    object store (ray.put broadcast — the similarity.BatchTopK
    discipline; the dense C matrix is ~8 MB, too big for per-task
    closure capture)."""

    _EMPTY = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("lp_micro", pa.int64()),
            ("avg_lp", pa.float64()),
        ]
    ).empty_table()

    def __init__(self, model_ref) -> None:
        uc, cmat = ray.get(model_ref)
        self.uc = uc
        self.cmat = cmat
        self.c1ctx = cmat.sum(axis=1)
        nz = cmat > 0
        self.nf = nz.sum(axis=1).astype(np.int64)
        self.ncont = nz.sum(axis=0).astype(np.int64)
        self.t = int(nz.sum())
        self.r_u = _micro_ln(uc)
        self.r_n = int(np.rint(np.log(float(max(uc.sum(), 1))) * 1e6))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return self._EMPTY
        texts = [
            t if t is not None else "" for t in batch["text"].to_pylist()
        ]
        ub, pair, lens = _pair_ids(texts)
        n = len(ub)
        terms = np.zeros(n, dtype=np.int64)
        if n:
            first = pair < 0
            terms[first] = self.r_u[ub[first]] - self.r_n
            bi = np.flatnonzero(~first)
            if len(bi):
                p = pair[bi] // U_BUCKETS
                c = ub[bi]
                cpc = self.cmat[p, c]
                num = (
                    np.maximum(4 * cpc - _KN_D4, 0) * self.t
                    + _KN_D4 * self.nf[p] * self.ncont[c]
                )
                den = 4 * self.c1ctx[p] * self.t
                ok = (num > 0) & (den > 0)
                t_bi = np.zeros(len(bi), dtype=np.int64)
                t_bi[ok] = _micro_ln(num[ok]) - _micro_ln(den[ok])
                terms[bi] = t_bi
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


def kneser_ney_scores(
    ds: ray.data.Dataset, *, text_col: str = "text"
) -> ray.data.Dataset:
    """documents → (doc_id, n_tokens, lp_micro, avg_lp) under the
    interpolated Kneser-Ney bigram LM over hashed 1024-bucket tokens."""
    uc, cmat = train_kn_counts(ds, text_col=text_col)
    model_ref = ray.put((uc, cmat))
    return ds.map_batches(
        KNScorer,
        fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 8),
    )
