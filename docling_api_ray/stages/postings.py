"""Bounded inverted-index construction — term → (document frequency,
capped posting list) for a broadcast term set; the retrieval-side data
structure behind BM25 serving and contamination tracing (the reference
has no index build; this is the training-data extension of SURVEY §2's
aggregation family).

Shape: the term set is small and VALUE-captured in the task closure
(serialized once per task, never re-shipped per batch); each batch
reduces to its distinct (word, doc_id) pairs for those terms only
(Arrow tokenize + hash group-by, so the exchange payload is
term-filtered and batch-deduplicated); ONE word-hash co-group then
folds exact df + the sorted, ``cap``-truncated posting string per term
in its partition.  Output is |terms| rows — corpus-independent.

FULL postings at 100 TB are a different output contract (posting lists
are corpus-proportional): the documented path is the same exchange with
``map_groups`` writing one parquet partition per term-hash bucket
instead of folding to a string column — the fold below never holds more
than one term's deduplicated doc ids in memory at a time either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


_PAIRS_EMPTY = pa.schema(
    [
        ("word", pa.string()),
        ("doc_id", pa.int64()),
        ("__part", pa.int64()),
    ]
).empty_table()


def _term_doc_pairs(term_list):
    """Per-batch distinct (word, doc_id) pairs restricted to the
    VALUE-captured term set (tiny, serialized once per task — see
    clustering._partial_sums on task pools + value capture)."""

    def pairs(b: pa.Table) -> pa.Table:
        from docling_api_ray.stages.common import shuffle_partitions

        terms = pa.array(sorted(term_list), type=pa.string())
        col = b["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(col, ""), " ")
        words = pc.list_flatten(lists)
        docs = pc.take(b["doc_id"], pc.list_parent_indices(lists))
        keep = pc.is_in(words, value_set=terms)
        words, docs = words.filter(keep), docs.filter(keep)
        if len(words) == 0:
            return _PAIRS_EMPTY
        g = (
            pa.table({"word": words, "doc_id": docs})
            .group_by(["word", "doc_id"])
            .aggregate([])
        )
        h = pd.util.hash_array(
            np.asarray(g["word"].to_pylist(), dtype=object)
        ).astype(np.int64)
        return pa.table(
            {
                "word": g["word"].combine_chunks(),
                "doc_id": pc.cast(g["doc_id"], pa.int64()).combine_chunks()
                if isinstance(g["doc_id"], pa.ChunkedArray)
                else pc.cast(g["doc_id"], pa.int64()),
                "__part": pa.array(
                    np.abs(h) % shuffle_partitions(), type=pa.int64()
                ),
            }
        )

    return pairs


def inverted_postings(
    ds: ray.data.Dataset,
    terms: list[str],
    *,
    cap: int = 50,
) -> ray.data.Dataset:
    """documents → (word, df, postings): exact document frequency and
    the comma-joined first ``cap`` doc ids in ascending order."""
    out_schema = pa.schema(
        [
            ("word", pa.string()),
            ("df", pa.int64()),
            ("postings", pa.string()),
        ]
    )
    term_list = list(terms)

    def fold(df: pd.DataFrame) -> pa.Table:
        rows = []
        for word, g in df.groupby("word", sort=False):
            ids = np.unique(g["doc_id"].to_numpy(dtype=np.int64))
            rows.append(
                (
                    word,
                    len(ids),
                    ",".join(str(i) for i in ids[:cap]),
                )
            )
        if not rows:
            return out_schema.empty_table()
        return pa.table(
            {
                "word": pa.array([r[0] for r in rows], type=pa.string()),
                "df": pa.array([r[1] for r in rows], type=pa.int64()),
                "postings": pa.array(
                    [r[2] for r in rows], type=pa.string()
                ),
            }
        )

    from docling_api_ray.stages.common import coalesce_narrow, guard_fold

    return (
        coalesce_narrow(
            ds.map_batches(
                _term_doc_pairs(term_list),
                batch_format="pyarrow",
                batch_size=1024,
            )
        )
        .groupby("__part")
        .map_groups(guard_fold(fold, key_col="term"), batch_format="pandas")
    )
