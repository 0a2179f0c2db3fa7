"""Deterministic train/val/test split assignment — a core training-data
pipeline operator (every corpus shard must route to the same split on
every run, on every node, with no coordination).

The split key is ``md5(str(doc_id))`` truncated to 64 bits mod 100 — the
same process-stable hash convention as the dedup family
(functions/hashing.py), so the DuckDB oracle reproduces the assignment
bit-exactly via ``md5_number``.  Stateless vectorized ``map_batches``;
no shuffle, no state, trivially correct under retries and resharding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from docling_api_ray.functions.hashing import u64_md5

DEFAULT_RATIOS = (90, 5, 5)  # train / val / test percent


def assign_splits(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    ratios: tuple[int, int, int] = DEFAULT_RATIOS,
) -> ray.data.Dataset:
    """documents → (doc_id, bucket, split): ``bucket`` = hash mod 100,
    ``split`` ∈ {train, val, test} by cumulative ratio thresholds."""
    if sum(ratios) != 100:
        raise ValueError(f"ratios must sum to 100, got {ratios}")
    train_hi = ratios[0]
    val_hi = ratios[0] + ratios[1]

    def assign(b: pa.Table) -> pa.Table:
        ids = [str(i) for i in b[id_col].to_pylist()]
        bucket = (u64_md5(np.array(ids, dtype=object)) % 100).astype(np.int64)
        split = np.where(
            bucket < train_hi, "train", np.where(bucket < val_hi, "val", "test")
        )
        return pa.table(
            {
                id_col: b[id_col],
                "bucket": pa.array(bucket, type=pa.int64()),
                "split": pa.array(split, type=pa.string()),
            }
        )

    return ds.select_columns([id_col]).map_batches(
        assign, batch_format="pyarrow"
    )


def split_counts(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    ratios: tuple[int, int, int] = DEFAULT_RATIOS,
) -> ray.data.Dataset:
    """(split, n_docs) — the bounded-domain fold over the assignment."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    return bounded_groupby_sum(
        assign_splits(ds, id_col=id_col, ratios=ratios).select_columns(
            ["split"]
        ),
        ["split"],
        count_alias="n_docs",
    )
