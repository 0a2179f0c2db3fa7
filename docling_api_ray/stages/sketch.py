"""Sketch-based heavy hitters: Misra-Gries candidates + an exact
verification pass.

The wordcount family (``vocab_topk``) keeps per-batch partials bounded
by the BATCH vocabulary — fine for bounded vocabularies, but an open web
vocabulary makes every partial big.  The Misra-Gries summary caps the
per-batch state at ``k`` counters no matter the vocabulary, and MG
summaries are MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS
'12): combine by summing counts then subtracting the (k+1)-th largest,
keeping positives.  The merged summary's undercount is ≤ N/(k+1), so
every word with true frequency > N/(k+1) is guaranteed to survive as a
candidate.

That guarantee turns the approximate sketch into an EXACT operator: pick
``k`` so the sketch error is below the query threshold, then run one
more streaming pass counting ONLY the ≤k candidate words (broadcast
``is_in`` filter + bounded-domain fold — the candidate set is
k-bounded by construction) and keep those with exact count strictly
above ``N * num / den``.  The threshold compare is integer arithmetic
(``n * den > N * num``), so the DuckDB oracle matches bit-for-bit.

Scale shape: pass 1 moves ≤k rows per block to the driver (k·blocks
narrow ints — sketch-bounded, never vocabulary-bounded); pass 2 is a
stateless filtered wordcount over a ≤k bounded domain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from docling_api_ray.stages.common import bounded_groupby_sum


def _mg_truncate(words: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries reduction of exact (word, count) pairs to ≤k
    counters: subtract the (k+1)-th largest count, keep positives."""
    if len(words) <= k:
        return words, counts
    # (k+1)-th largest via partition
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    adj = counts - kth
    keep = adj > 0
    return words[keep], adj[keep]


def heavy_hitters(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    num: int = 1,
    den: int = 30,
    k: int | None = None,
) -> ray.data.Dataset:
    """documents(text) → (word, n) EXACT counts of every word whose
    frequency strictly exceeds ``num/den`` of all token occurrences.

    ``k`` (sketch width) defaults to ``2*den/num`` — error N·num/(2·den),
    half the query threshold, so no qualifying word can be missed."""
    if k is None:
        k = max(8, (2 * den) // max(1, num))

    def partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(
            pc.split_pattern(pc.fill_null(col, ""), " ")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        n_tok = len(toks)
        if n_tok == 0:
            return pa.table(
                {
                    "word": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "total": pa.array([], type=pa.int64()),
                }
            )
        g = pa.table({"w": toks}).group_by(["w"]).aggregate([([], "count_all")])
        words = np.asarray(g["w"].to_pylist(), dtype=object)
        counts = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        words, counts = _mg_truncate(words, counts, k)
        # the batch token total rides a sentinel row ("" never occurs as
        # a token — empties are filtered above) so it survives even when
        # the MG truncation drops every counter (uniform batch vocab)
        return pa.table(
            {
                "word": pa.array(list(words) + [""], type=pa.string()),
                "n": pa.array(
                    np.concatenate([counts, [0]]), type=pa.int64()
                ),
                "total": pa.array(
                    np.concatenate(
                        [np.zeros(len(words), dtype=np.int64), [n_tok]]
                    ),
                    type=pa.int64(),
                ),
            }
        )

    # pass 1: sketch-bounded partials (≤k rows per block) → driver merge
    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n_total = sum(r["total"] for r in rows)
    if not rows or n_total == 0:
        return ray.data.from_arrow(
            pa.table(
                {"word": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        )
    merged = pd.DataFrame(rows).groupby("word")["n"].sum()
    merged = merged[merged.index != ""]  # drop the total sentinel
    words = merged.index.to_numpy(dtype=object)
    counts = merged.to_numpy()
    words, _ = _mg_truncate(words, counts, k)
    candidates = sorted(map(str, words))
    cand_ref = ray.put(pa.array(candidates, type=pa.string()))

    # pass 2: exact counts of the ≤k candidates only
    def exact(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(
            pc.split_pattern(pc.fill_null(col, ""), " ")
        )
        toks = toks.filter(pc.is_in(toks, value_set=ray.get(cand_ref)))
        return pa.table({"word": toks})

    counts_ds = bounded_groupby_sum(
        ds.map_batches(exact, batch_format="pyarrow"),
        ["word"],
        count_alias="n",
    )

    def threshold(b: pa.Table) -> pa.Table:
        n = b["n"]
        keep = pc.greater(
            pc.multiply(pc.cast(n, pa.int64()), den), n_total * num
        )
        out = b.filter(keep)
        return pa.table(
            {"word": out["word"], "n": pc.cast(out["n"], pa.int64())}
        )

    return counts_ds.map_batches(threshold, batch_format="pyarrow")
