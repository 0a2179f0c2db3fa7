"""Character-bigram language-model quality scoring — the CCNet/KenLM
data-curation analog (score every document by its average log-probability
under a LM trained on the corpus itself; low scores flag gibberish,
boilerplate soup, and wrong-alphabet text).

Exactness design: the LM is a Laplace-smoothed char-bigram model over a
BOUNDED 96-symbol alphabet (code points 32..126 keep themselves,
everything else folds to one OTHER symbol), so

- **train pass** reduces every batch to ONE dense 96x96 int64 count
  matrix (a fixed 9216-number row, corpus-size-independent) folded
  driver-side block by block — the classic mergeable-sketch shape, no
  shuffle;
- log-probs are quantized to int64 MICRO-logs (round(ln(p)*1e6)) so the
  per-document sum is integer-exact and association-free — the DuckDB
  oracle sums the same integers in any order and matches bit-for-bit;
- **score pass** is a stateless ``map_batches``: one UTF-32 decode of
  the concatenated batch text, vectorized pair ids, a table gather and a
  segmented ``reduceat`` — no Python loop over rows.

avg_lp = lp_micro / (n_pairs * 1e6), a single exact int->double division
mirrored verbatim in SQL."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

ALPHA = 96  # symbols: code points 32..126 plus the OTHER fold (127)
N_PAIRS = ALPHA * ALPHA


def _pair_ids(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Batch texts -> (flat bigram pair ids, per-row pair counts).
    One UTF-32 decode of the concatenated text; boundary positions
    (pairs that would span two documents) are masked out."""
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    blob = "".join(texts)
    if len(blob) == 0:
        return np.empty(0, dtype=np.int64), np.maximum(lens - 1, 0)
    cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    sym = np.where((cp >= 32) & (cp <= 126), cp, 127) - 32
    if len(sym) < 2:
        return np.empty(0, dtype=np.int64), np.maximum(lens - 1, 0)
    pair = sym[:-1] * ALPHA + sym[1:]
    # position p is a valid pair iff p and p+1 fall in the same row:
    # mask out the last position of every row (cumulative end - 1)
    ends = np.cumsum(lens)
    valid = np.ones(len(sym) - 1, dtype=bool)
    last = ends[lens > 0] - 1
    valid[last[last < len(valid)]] = False
    return pair[valid], np.maximum(lens - 1, 0)


def train_counts(ds: ray.data.Dataset, *, text_col: str = "text") -> np.ndarray:
    """One streaming pass -> dense 96x96 int64 bigram-count matrix.
    Each block contributes a single fixed-size row; the driver fold is
    block-count-proportional over 9216-int rows only."""

    def partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        texts = [t if t is not None else "" for t in col.to_pylist()]
        pair, _ = _pair_ids(texts)
        counts = np.bincount(pair, minlength=N_PAIRS).astype(np.int64)
        return pa.table({"counts": pa.array([counts], type=pa.list_(pa.int64()))})

    total = np.zeros(N_PAIRS, dtype=np.int64)
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for row in batch["counts"].to_pylist():
            total += np.asarray(row, dtype=np.int64)
    return total.reshape(ALPHA, ALPHA)


def micro_log_table(counts: np.ndarray) -> np.ndarray:
    """Laplace-smoothed conditional micro-log-probs:
    ilog[a,b] = round(ln((c[a,b]+1)/(row_total[a]+96)) * 1e6) as int64 —
    the exact integers the SQL oracle computes with the same formula."""
    row_tot = counts.sum(axis=1, keepdims=True).astype(np.float64)
    p = (counts.astype(np.float64) + 1.0) / (row_tot + float(ALPHA))
    return np.rint(np.log(p) * 1e6).astype(np.int64).reshape(-1)


class _CharLMScore:
    """Stateless-per-batch scorer against the broadcast micro-log table
    (fetched once per actor)."""

    def __init__(self, table_ref) -> None:
        self.ilog = ray.get(table_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["text"]
        texts = [t if t is not None else "" for t in col.to_pylist()]
        pair, n_pairs = _pair_ids(texts)
        vals = self.ilog[pair]
        # cumsum-difference segmented integer sum per row — exact for
        # empty rows in any position (a clamped-offset reduceat corrupts
        # the last non-empty row when empty rows trail the batch)
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(n_pairs, out=offsets[1:])
        csum = np.zeros(len(vals) + 1, dtype=np.int64)
        np.cumsum(vals, out=csum[1:])
        lp = csum[offsets[1:]] - csum[offsets[:-1]]
        denom = np.maximum(n_pairs, 1).astype(np.float64) * 1e6
        avg = np.where(n_pairs > 0, lp.astype(np.float64) / denom, 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_pairs": pa.array(n_pairs, type=pa.int64()),
                "lp_micro": pa.array(lp, type=pa.int64()),
                "avg_lp": pa.array(avg, type=pa.float64()),
            }
        )


def charlm_scores(ds: ray.data.Dataset, *, text_col: str = "text") -> ray.data.Dataset:
    """documents -> (doc_id, n_pairs, lp_micro, avg_lp): train the
    corpus char-bigram LM (one bounded-sketch pass), broadcast the int64
    micro-log table once (``ray.put``), then score statelessly."""
    counts = train_counts(ds, text_col=text_col)
    ref = ray.put(micro_log_table(counts))
    return ds.map_batches(
        _CharLMScore,
        fn_constructor_kwargs={"table_ref": ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
