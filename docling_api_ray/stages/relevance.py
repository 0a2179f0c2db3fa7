"""BM25 relevance scoring against a broadcast query — the retrieval /
data-selection scorer of a training-data pipeline (rank corpus documents
for a topic, select the top slice for curriculum or dedup-priority).

Two streaming passes, the canonical shape for corpus-statistics scoring:

1. **stats pass** — per-batch partial sums of (n_docs, total_tokens,
   per-query-term document frequency).  The reduction is |terms|+2
   numbers regardless of corpus size, folded driver-side (one int row
   per block) and broadcast back (``ray.put``).
2. **score pass** — stateless ``map_batches``: exact-token term
   frequencies (ONE whitespace split per batch shared by all terms,
   per-term vectorized equality + segmented ``add.reduceat``), then the
   Robertson/Sparck-Jones BM25 formula (k1=1.2, b=0.75,
   idf = ln(1 + (N-df+0.5)/(df+0.5))), summed in FIXED query-term order
   and quantized to 6 decimals so the DuckDB oracle — which spells out
   the same per-term expressions in the same order over
   ``list_filter(regexp_extract_all(text, '\\S+'), x -> x = term)`` —
   compares exactly.

Tokenization is whitespace-delimited tokens (``\\S+``), the same
convention as the wordcount/dedup family."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

K1 = 1.2
B = 0.75
WS_TOKEN_RE = r"\S+"


def _token_matrix(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """text column → (flat token array, row offsets, row token counts);
    tokens are the ``\\S+`` runs (split on whitespace, empties dropped
    per row via list_filter semantics)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.split_pattern_regex(pc.fill_null(col, ""), r"\s+")
    flat = pc.list_flatten(words)
    lens_all = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    # empties from leading/trailing whitespace: mask them out of both
    # the flat array and the per-row counts
    nonempty = pc.not_equal(flat, "")
    ne_np = nonempty.to_numpy(zero_copy_only=False)
    offsets_all = np.zeros(len(lens_all) + 1, dtype=np.int64)
    np.cumsum(lens_all, out=offsets_all[1:])
    counts = _segment_sum(ne_np.astype(np.int64), offsets_all)
    return flat, offsets_all, counts


def _segment_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums of a flat array segmented by ``offsets`` — reduceat
    with the empty-segment fixups (clip indices == len, zero rows whose
    segment is empty)."""
    n_rows = len(offsets) - 1
    if not len(values):
        return np.zeros(n_rows, dtype=np.int64)
    idx = np.minimum(offsets[:-1], len(values) - 1)
    out = np.add.reduceat(values, idx)
    out[np.diff(offsets) == 0] = 0
    return out


def _term_tf(flat, offsets_all, term: str) -> np.ndarray:
    eq = pc.equal(flat, term).to_numpy(zero_copy_only=False).astype(np.int64)
    return _segment_sum(eq, offsets_all)


def corpus_stats(
    ds: ray.data.Dataset, terms: list[str], *, text_col: str = "text"
) -> dict:
    """One streaming pass → {n_docs, total_tokens, df: {term: n}}."""

    def partial(b: pa.Table) -> pa.Table:
        flat, off, counts = _token_matrix(b[text_col])
        row = {
            "n_docs": [len(b)],
            "total_tokens": [int(counts.sum())],
        }
        for i, term in enumerate(terms):
            row[f"df_{i}"] = [int((_term_tf(flat, off, term) > 0).sum())]
        return pa.table(row)

    cols = ["n_docs", "total_tokens"] + [f"df_{i}" for i in range(len(terms))]
    totals = {c: 0 for c in cols}
    # the partials are |terms|+2 ints per BLOCK — the driver-side fold is
    # block-count-proportional only
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for c in cols:
            totals[c] += int(pc.sum(batch[c]).as_py() or 0)
    return {
        "n_docs": totals["n_docs"],
        "total_tokens": totals["total_tokens"],
        "df": {t: totals[f"df_{i}"] for i, t in enumerate(terms)},
    }


def bm25_scores(
    ds: ray.data.Dataset,
    terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: dict | None = None,
) -> ray.data.Dataset:
    """documents → (doc_id, score) BM25 against ``terms``.  ``stats``
    may be precomputed (e.g. scoring many queries against one corpus);
    otherwise one stats pass runs first."""
    if stats is None:
        stats = corpus_stats(ds, terms, text_col=text_col)
    n_docs = max(1, stats["n_docs"])
    avgdl = stats["total_tokens"] / n_docs
    idf = [
        float(np.log(1.0 + (n_docs - stats["df"][t] + 0.5) / (stats["df"][t] + 0.5)))
        for t in terms
    ]
    ref = ray.put((list(terms), idf, avgdl))

    def score(b: pa.Table) -> pa.Table:
        terms_, idf_, avgdl_ = ray.get(ref)
        flat, off, counts = _token_matrix(b[text_col])
        dl = counts.astype(np.float64)
        norm = K1 * (1.0 - B + (B * dl) / avgdl_)
        total = np.zeros(len(b), dtype=np.float64)
        # FIXED summation order (query-term order) — the oracle spells
        # the same additions in the same order, so the float result is
        # identical
        for term, w in zip(terms_, idf_):
            tf = _term_tf(flat, off, term).astype(np.float64)
            total = total + (w * (tf * (K1 + 1.0))) / (tf + norm)
        return pa.table(
            {
                id_col: b[id_col],
                "score": pa.array(
                    np.rint(total * 1e6) / 1e6, type=pa.float64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
