"""Distributed set operations over per-group vocabularies — the
INTERSECT / set-coverage primitive (SURVEY.md §2.7 depth: the reference's
dedup-set semantics generalized to cross-partition set algebra).

``vocab_source_coverage`` answers "which tokens appear in at least T of
the corpus's sources?" — with T = |sources| this is the INTERSECTION of
all per-source vocabularies (the shared-core vocabulary a tokenizer
trainer would keep), with T = 1 the union.

Shape: each batch reduces to its DISTINCT (word, source) pairs
(vectorized pandas drop_duplicates — batch-bounded output), ONE
word-hash co-group exchange ships only those deduplicated pairs, and the
in-partition fold counts distinct sources per word (every occurrence of
a word lands in the same partition, so the count is exact and the
threshold filter is local).  No corpus-proportional row ever reaches a
single block: output is vocabulary-bounded and further cut by the
threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def vocab_source_coverage(
    ds: ray.data.Dataset,
    *,
    min_sources: int,
    text_col: str = "text",
    group_col: str = "source",
) -> ray.data.Dataset:
    """(word, n_sources, n_occurrences) for words present in
    ``>= min_sources`` distinct groups.  ``n_occurrences`` is the total
    corpus-wide occurrence count (summed over ALL sources)."""
    from docling_api_ray.stages.common import shuffle_partitions

    out_schema = pa.schema(
        [
            ("word", pa.string()),
            ("n_sources", pa.int64()),
            ("n_occurrences", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(col, ""), " ")
        words = pc.list_flatten(lists)
        # source of each flattened word via the list's parent row index —
        # no python word list (word_counts' fully-Arrow map-side shape)
        srcs = pc.take(b[group_col], pc.list_parent_indices(lists))
        keep = pc.not_equal(words, "")
        words, srcs = words.filter(keep), srcs.filter(keep)
        if len(words) == 0:
            return pa.table(
                {
                    "word": pa.array([], type=pa.string()),
                    group_col: pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "__part": pa.array([], type=pa.int64()),
                }
            )
        g = (
            pa.table({"word": words, group_col: srcs})
            .group_by(["word", group_col])
            .aggregate([([], "count_all")])
        )
        h = pd.util.hash_array(
            np.asarray(g["word"].to_pylist(), dtype=object)
        ).astype(np.int64)
        return pa.table(
            {
                "word": g["word"].combine_chunks(),
                group_col: g[group_col].combine_chunks(),
                "n": pc.cast(g["count_all"], pa.int64()),
                "__part": pa.array(
                    np.abs(h) % shuffle_partitions(), type=pa.int64()
                ),
            }
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        g = (
            df.groupby("word", sort=False)
            .agg(
                n_sources=(group_col, "nunique"),
                n_occurrences=("n", "sum"),
            )
            .reset_index()
        )
        g = g[g["n_sources"] >= min_sources]
        return pa.table(
            {
                "word": pa.array(g["word"].tolist(), type=pa.string()),
                "n_sources": pa.array(
                    g["n_sources"].to_numpy(dtype=np.int64), type=pa.int64()
                ),
                "n_occurrences": pa.array(
                    g["n_occurrences"].to_numpy(dtype=np.int64),
                    type=pa.int64(),
                ),
            }
        ).cast(out_schema)

    from docling_api_ray.stages.common import coalesce_narrow, guard_fold

    return (
        coalesce_narrow(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
    )
