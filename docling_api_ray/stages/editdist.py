"""Edit-distance near-duplicate verification tier.

Levenshtein is the ground-truth string metric the cheap near-dup
signals (MinHash / SimHash, stages/dedup.py) approximate — but it is
O(L²) per PAIR, so at corpus scale it is only ever run as a
VERIFICATION tier behind a blocking key that bounds group sizes
(the same discipline as ``dedup.ngram_jaccard_pairs``: candidate
generation is banded/bucketed, exact scoring confined to blocks).

``edit_distance_pairs`` blocks documents on their first ``prefix_len``
characters (boilerplate-heavy near-dups share prefixes; the blocking
key is a tunable — callers with a MinHash candidate table can pass
its bucket instead), then scores every in-block pair on the first
``cap`` characters.  The DP inner loop is the vectorized
minimum-accumulate formulation: one numpy pass per row of the matrix
(O(L) numpy kernels of width L), no per-cell python.

Scale shape: one (prefix-hash mod P) co-group exchange of
(doc_id, prefix, capped-text) rows; per-partition work is
Σ_blocks g²·cap² with g bounded by the blocking key — the operator
REFUSES silent blowups by capping per-block pair counts and raising
on overflow rather than quietly degrading.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from docling_api_ray.functions.hashing import u64_md5
from docling_api_ray.stages.common import (
    coalesce_narrow,
    guard_fold,
    shuffle_partitions,
)

_MAX_BLOCK = 4096  # pairs-per-block guard: 4096² DP cells ≈ verification tier


def levenshtein(a: str, b: str) -> int:
    """Unit-cost Levenshtein distance, vectorized row DP.

    Semantics identical to DuckDB's ``levenshtein`` (insert/delete/
    substitute each cost 1) — the oracle depends on exact agreement.
    The left-neighbor dependency is removed with the standard
    minimum-accumulate transform: with u[j] = cur[j] - j,
    cur[j] = min(cand[j], cur[j-1]+1) becomes
    u = cummin(cand - arange), an O(L) numpy kernel per row."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.fromiter(map(ord, b), dtype=np.int64, count=len(b))
    prev = np.arange(len(b) + 1, dtype=np.int64)
    steps = np.arange(len(b) + 1, dtype=np.int64)
    for i, ca in enumerate(a, 1):
        cand = np.empty(len(b) + 1, dtype=np.int64)
        cand[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (bv != ord(ca)), out=cand[1:])
        prev = np.minimum.accumulate(cand - steps) + steps
    return int(prev[-1])


def edit_distance_pairs(
    docs: ray.data.Dataset,
    *,
    prefix_len: int = 16,
    cap: int = 120,
) -> ray.data.Dataset:
    """All same-prefix document pairs scored by Levenshtein distance over
    the first ``cap`` characters: (left_id, right_id, dist) with
    left_id < right_id.  Input needs (doc_id, text)."""

    keyed_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("prefix", pa.string()),
            ("head", pa.string()),
            ("__part", pa.int64()),
        ]
    )
    P = shuffle_partitions()

    def keyed(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return keyed_schema.empty_table()
        texts = b["text"].to_pylist()
        prefixes = [t[:prefix_len] for t in texts]
        part = (u64_md5(prefixes) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "prefix": pa.array(prefixes, type=pa.string()),
                "head": pa.array([t[:cap] for t in texts], type=pa.string()),
                "__part": pa.array(part),
            }
        )

    out_schema = pa.schema(
        [
            ("left_id", pa.int64()),
            ("right_id", pa.int64()),
            ("dist", pa.int64()),
        ]
    )

    def per_partition(g: pd.DataFrame) -> pa.Table:
        lids, rids, dists = [], [], []
        for _, blk in g.groupby("prefix", sort=False):
            n = len(blk)
            if n < 2:
                continue
            if n > _MAX_BLOCK:
                raise ValueError(
                    f"edit-distance block of {n} docs exceeds {_MAX_BLOCK}; "
                    "use a finer blocking key (longer prefix / LSH bucket)"
                )
            blk = blk.sort_values("doc_id", kind="stable")
            ids = blk["doc_id"].to_numpy()
            heads = blk["head"].tolist()
            for x in range(n):
                for y in range(x + 1, n):
                    lids.append(ids[x])
                    rids.append(ids[y])
                    dists.append(levenshtein(heads[x], heads[y]))
        if not lids:
            return out_schema.empty_table()
        return pa.table(
            {
                "left_id": pa.array(np.asarray(lids, dtype=np.int64)),
                "right_id": pa.array(np.asarray(rids, dtype=np.int64)),
                "dist": pa.array(np.asarray(dists, dtype=np.int64)),
            }
        )

    return (
        coalesce_narrow(
            docs.map_batches(keyed, batch_format="pyarrow"), max_rows=65_536
        )
        .groupby("__part")
        # rows carry capped text heads, so the skew budget is tighter than
        # the narrow-row default (2M × cap chars ≈ worker-heap scale)
        .map_groups(
            guard_fold(per_partition, key_col="prefix", max_rows=2_000_000),
            batch_format="pandas",
        )
    )


def lcs_len(a: list[str], b: list[str]) -> int:
    """Word-level longest-common-subsequence length, vectorized row DP.

    Row recurrence L[i,j] = max(L[i-1,j], L[i-1,j-1] + eq(i,j), L[i,j-1]):
    because every LCS DP row is non-decreasing, the left-neighbor max is
    a running maximum — cand = max(prev[1:], prev[:-1] + eq), then
    cur = np.maximum.accumulate(cand) — one O(L) numpy kernel per row,
    no per-cell python (the levenshtein() discipline)."""
    if not a or not b:
        return 0
    # integer-code both sides over the pair's joint vocabulary
    vocab, codes = np.unique(np.array(a + b, dtype=object), return_inverse=True)
    av, bv = codes[: len(a)], codes[len(a):]
    prev = np.zeros(len(b) + 1, dtype=np.int64)
    for ca in av:
        cand = np.empty(len(b) + 1, dtype=np.int64)
        cand[0] = 0
        np.maximum(prev[1:], prev[:-1] + (bv == ca), out=cand[1:])
        prev = np.maximum.accumulate(cand)
    return int(prev[-1])


def rouge_l_pairs(
    docs: ray.data.Dataset,
    *,
    prefix_len: int = 16,
    cap_words: int = 200,
) -> ray.data.Dataset:
    """ROUGE-L over same-prefix document pairs: (left_id, right_id,
    lcs, rouge_f) with left_id < right_id — the sequence-aware
    verification tier next to edit_distance_pairs' character metric
    (Lin 2004: ROUGE-L F = 2·LCS / (m + n), word-level).  Dup-span
    strip decides WHAT to cut; ROUGE-L measures HOW MUCH of a pair is
    shared in order — the template-detection signal n-gram Jaccard
    misses when shared content is reordered.

    Same scale shape as edit_distance_pairs: one (prefix-hash mod P)
    co-group exchange, per-block all-pairs DP bounded by _MAX_BLOCK
    with the loud guard_fold skew budget.  ``rouge_f`` is
    ⌊x·1e6+½⌋-quantized; no SQL oracle exists for LCS, so the query
    entry is rows-only, pinned by a pure-python DP reference test."""

    keyed_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("prefix", pa.string()),
            ("words", pa.list_(pa.string())),
            ("__part", pa.int64()),
        ]
    )
    P = shuffle_partitions()

    def keyed(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return keyed_schema.empty_table()
        texts = [t if t is not None else "" for t in b["text"].to_pylist()]
        prefixes = [t[:prefix_len] for t in texts]
        part = (u64_md5(prefixes) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "prefix": pa.array(prefixes, type=pa.string()),
                "words": pa.array(
                    [t.split()[:cap_words] for t in texts],
                    type=pa.list_(pa.string()),
                ),
                "__part": pa.array(part),
            }
        )

    out_schema = pa.schema(
        [
            ("left_id", pa.int64()),
            ("right_id", pa.int64()),
            ("lcs", pa.int64()),
            ("rouge_f", pa.float64()),
        ]
    )

    def per_partition(g: pd.DataFrame) -> pa.Table:
        import math

        lids, rids, lcss, fs = [], [], [], []
        for _, blk in g.groupby("prefix", sort=False):
            n = len(blk)
            if n < 2:
                continue
            if n > _MAX_BLOCK:
                raise ValueError(
                    f"rouge-l block of {n} docs exceeds {_MAX_BLOCK}; "
                    "use a finer blocking key (longer prefix / LSH bucket)"
                )
            blk = blk.sort_values("doc_id", kind="stable")
            ids = blk["doc_id"].to_numpy()
            words = [list(w) for w in blk["words"]]
            for x in range(n):
                for y in range(x + 1, n):
                    l = lcs_len(words[x], words[y])
                    m = len(words[x]) + len(words[y])
                    f = (
                        math.floor(2.0 * l / m * 1e6 + 0.5) / 1e6
                        if m > 0
                        else 0.0
                    )
                    lids.append(ids[x])
                    rids.append(ids[y])
                    lcss.append(l)
                    fs.append(f)
        if not lids:
            return out_schema.empty_table()
        return pa.table(
            {
                "left_id": pa.array(np.asarray(lids, dtype=np.int64)),
                "right_id": pa.array(np.asarray(rids, dtype=np.int64)),
                "lcs": pa.array(np.asarray(lcss, dtype=np.int64)),
                "rouge_f": pa.array(np.asarray(fs, dtype=np.float64)),
            }
        )

    return (
        coalesce_narrow(
            docs.map_batches(keyed, batch_format="pyarrow"), max_rows=65_536
        )
        .groupby("__part")
        .map_groups(
            guard_fold(per_partition, key_col="prefix", max_rows=2_000_000),
            batch_format="pandas",
        )
    )
