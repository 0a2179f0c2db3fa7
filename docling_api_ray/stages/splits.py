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


def weighted_sample(
    ds: ray.data.Dataset,
    *,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> ray.data.Dataset:
    """Deterministic weight-proportional sample of ``k`` rows — the
    coordination-free analog of weighted reservoir sampling (the
    Efraimidis–Spirakis bottom-k trick with the random draw replaced by
    the process-stable doc hash): every row gets priority
    ``key = (u64_md5(str(id)) >> 1) // weight`` (integer floor division —
    heavier rows draw systematically smaller keys; the pre-shift keeps
    the key < 2^63 for EVERY weight ≥ 1, so engine int64 and oracle
    BIGINT agree with no clamp on either side) and the sample is the
    global bottom-``k`` by ``(key, id)``.

    Identical on every run / node / reshard, and the DuckDB oracle
    reproduces it exactly (``(md5_number // 2) // weight`` in HUGEINT —
    pure integer arithmetic, no float RNG to mirror).

    Shape: stateless per-batch priority + LOCAL bottom-k head (each block
    emits ≤ k rows), then a single ≤ k·blocks-row merge block — the
    distributed-top-k tail shape (corpus-independent; k·10⁶ blocks of
    3-int rows at 100 TB is still object-store-trivial, and a two-level
    head fold slots in if k grows).  Weights must be ≥ 1 (enforced via
    max(w, 1))."""
    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("weight", pa.int64()),
            ("priority", pa.int64()),
        ]
    )

    def head(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        w = np.maximum(
            np.asarray(b[weight_col], dtype=np.int64), 1
        ).astype(np.uint64)
        h = u64_md5(np.array([str(i) for i in ids], dtype=object))
        key = ((h >> np.uint64(1)) // w).astype(np.int64)  # < 2^63 always
        order = np.lexsort((np.asarray(ids, dtype=np.int64), key))[:k]
        return pa.table(
            {
                id_col: pa.array(
                    np.asarray(ids, dtype=np.int64)[order], type=pa.int64()
                ),
                "weight": pa.array(
                    w[order].astype(np.int64), type=pa.int64()
                ),
                "priority": pa.array(key[order], type=pa.int64()),
            }
        )

    def merge(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        key = np.asarray(b["priority"], dtype=np.int64)
        order = np.lexsort((ids, key))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], type=pa.int64()),
                "weight": pa.array(
                    np.asarray(b["weight"], dtype=np.int64)[order],
                    type=pa.int64(),
                ),
                "priority": pa.array(key[order], type=pa.int64()),
            }
        ).cast(out_schema)

    return (
        ds.select_columns([id_col, weight_col])
        .map_batches(head, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )


def leakage_safe_splits(
    keep_ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    ratios: tuple[int, int, int] = DEFAULT_RATIOS,
) -> ray.data.Dataset:
    """Train/val/test assignment with a NEAR-DUP LEAKAGE GUARD: the
    split hash is taken over the document's dedup COMPONENT label, not
    its own id, so every member of a near-duplicate cluster lands in
    the same split — the eval-contamination rule plain per-doc hash
    splits (``assign_splits``) cannot give.  Input is ``dedup_keep``'s
    (doc_id, component, keep) table; singletons (component = own id)
    behave exactly like a per-doc hash.  Stateless streaming pass —
    the component attach already paid the only exchange."""
    if sum(ratios) != 100:
        raise ValueError(f"ratios must sum to 100, got {ratios}")
    train_hi = ratios[0]
    val_hi = ratios[0] + ratios[1]

    def assign(b: pa.Table) -> pa.Table:
        comps = [str(c) for c in b["component"].to_pylist()]
        bucket = (u64_md5(np.array(comps, dtype=object)) % 100).astype(
            np.int64
        )
        split = np.where(
            bucket < train_hi, "train", np.where(bucket < val_hi, "val", "test")
        )
        return pa.table(
            {
                id_col: b[id_col],
                "component": b["component"],
                "bucket": pa.array(bucket, type=pa.int64()),
                "split": pa.array(split, type=pa.string()),
            }
        )

    return keep_ds.map_batches(assign, batch_format="pyarrow")


def stratified_kfold(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    k: int = 5,
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """EXACTLY-balanced stratified K-fold cross-validation assignment:
    within every stratum the fold sizes differ by at most one (plain
    ``hash mod K`` is only balanced in expectation — a small stratum
    can land 40/60).  Deterministic: the within-stratum order is
    ``(hash bucket, doc hash, id)``, so every run / node / reshard
    assigns identically and the DuckDB oracle reproduces it with one
    ``row_number() OVER (PARTITION BY stratum ORDER BY ...)``.

    Scale shape (the ``global_rank`` two-phase rank without a global
    sort): (1) a bounded ``(stratum × bucket)`` count fold
    (``bucket = hash % n_buckets``) prefix-sums driver-side into
    per-bucket stratum offsets — |strata|·n_buckets rows, corpus-
    independent — broadcast once via ``ray.put``; (2) ONE all-to-all of
    the narrow (id, stratum, hash) payload partitioned by bucket, where
    each partition ranks its rows in-bucket (hash-uniform populations —
    no skew) and emits ``fold = (offset + in-bucket rank) % K``."""
    import pandas as pd

    from docling_api_ray.stages.common import (
        bounded_groupby_sum,
        coalesce_narrow,
        guard_fold,
        shuffle_partitions,
    )

    nb = np.uint64(n_buckets)

    def project(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        h = u64_md5(np.array([str(i) for i in ids], dtype=object))
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                stratum_col: b[stratum_col],
                "h": pa.array(h, type=pa.uint64()),
                "bucket": pa.array((h % nb).astype(np.int64), type=pa.int64()),
            }
        )

    narrow = ds.select_columns([id_col, stratum_col]).map_batches(
        project, batch_format="pyarrow"
    )

    hist = bounded_groupby_sum(
        narrow.select_columns([stratum_col, "bucket"]),
        [stratum_col, "bucket"],
        count_alias="c",
    ).take_all()
    hist.sort(key=lambda r: (r[stratum_col], r["bucket"]))
    offsets: dict[tuple, int] = {}
    acc_by_stratum: dict = {}
    for r in hist:
        s = r[stratum_col]
        offsets[(s, r["bucket"])] = acc_by_stratum.get(s, 0)
        acc_by_stratum[s] = acc_by_stratum.get(s, 0) + int(r["c"])
    ref = ray.put(offsets)

    def add_part(b: pa.Table) -> pa.Table:
        part = np.asarray(b["bucket"], dtype=np.int64) % shuffle_partitions()
        return b.append_column("__part", pa.array(part, type=pa.int64()))

    def rank_fold(df: "pd.DataFrame") -> pa.Table:
        off = ray.get(ref)
        df = df.sort_values(
            [stratum_col, "bucket", "h", id_col], kind="stable"
        )
        cum = df.groupby([stratum_col, "bucket"], sort=False).cumcount()
        base = np.array(
            [off[(s, b)] for s, b in zip(df[stratum_col], df["bucket"])],
            dtype=np.int64,
        )
        fold = (base + cum.to_numpy(dtype=np.int64)) % k
        return pa.table(
            {
                id_col: pa.array(
                    df[id_col].to_numpy(dtype=np.int64), type=pa.int64()
                ),
                stratum_col: pa.array(
                    df[stratum_col].astype(str).tolist(), type=pa.string()
                ),
                "fold": pa.array(fold, type=pa.int64()),
            }
        )

    return (
        coalesce_narrow(narrow.map_batches(add_part, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(
            guard_fold(rank_fold, key_col="bucket"), batch_format="pandas"
        )
    )


_HT_OUT_SCHEMA = pa.schema(
    [
        ("k", pa.int64()),
        ("n_rows", pa.int64()),
        ("threshold", pa.int64()),
        ("estimate", pa.float64()),
        ("true_total", pa.int64()),
        ("rel_err", pa.float64()),
    ]
)


def ht_estimate(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    value_col: str = "n_chars",
    k: int = 100,
) -> pa.Table:
    """Priority-sampling Horvitz-Thompson total estimator (Duffield,
    Lund & Thorup 2007) over the SAME deterministic bottom-k scheme as
    ``weighted_sample`` — the self-verifying sampling eval: estimate
    Σ value from k sampled rows and report the error against the exact
    total computed alongside (the hll_eval/cms_eval family shape).

    Under the integer scheme ``key = (h≫1)//w`` the inclusion rule
    ``key < T`` (T = the (k+1)-th smallest key) is EXACTLY
    ``u_int < T·w``, so p_i = min(1, T·w_i/2⁶³) and each HT term is
    ``max(x_i, 2⁶³/T)`` — the classic priority-sampling estimator with
    no approximation beyond md5 uniformity.  Terms are micro-quantized
    then integer-summed (order-free), so the DuckDB mirror matches
    bit-for-bit.  When the corpus has ≤ k rows the sample is the
    corpus and the estimate is exact by construction (threshold 0
    sentinel).

    Shape: ONE corpus pass — each block emits its bottom-(k+1) head
    PLUS a totals sentinel row (n = -1 marker column discipline, the
    poisson_bootstrap shape), folded through one merge block that
    re-heads the candidates and sums the sentinels; ≤ k+2 rows ever
    reach the driver."""
    import math

    from docling_api_ray.functions.hashing import u64_md5

    def head(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        x = np.maximum(np.asarray(b[value_col], dtype=np.int64), 1)
        h = u64_md5(np.array([str(i) for i in ids], dtype=object))
        key = ((h >> np.uint64(1)) // x.astype(np.uint64)).astype(np.int64)
        order = np.lexsort((np.asarray(ids, dtype=np.int64), key))[: k + 1]
        xs = np.asarray(b[value_col], dtype=np.int64)
        # sentinel row (n >= 0) carries this block's exact (n, Σx);
        # candidate rows have n = -1
        return pa.table(
            {
                "id": pa.array(
                    np.append(np.asarray(ids, dtype=np.int64)[order], -1),
                    type=pa.int64(),
                ),
                "x": pa.array(
                    np.append(xs[order], int(xs.sum())), type=pa.int64()
                ),
                "key": pa.array(
                    np.append(key[order], 0), type=pa.int64()
                ),
                "n": pa.array(
                    np.append(
                        np.full(len(order), -1, dtype=np.int64), len(b)
                    ),
                    type=pa.int64(),
                ),
            }
        )

    def merge(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["id"], dtype=np.int64)
        key = np.asarray(b["key"], dtype=np.int64)
        x = np.asarray(b["x"], dtype=np.int64)
        n = np.asarray(b["n"], dtype=np.int64)
        cand = n < 0
        order = np.flatnonzero(cand)[
            np.lexsort((ids[cand], key[cand]))[: k + 1]
        ]
        return pa.table(
            {
                "id": pa.array(
                    np.append(ids[order], -1), type=pa.int64()
                ),
                "x": pa.array(
                    np.append(x[order], int(x[~cand].sum())),
                    type=pa.int64(),
                ),
                "key": pa.array(
                    np.append(key[order], 0), type=pa.int64()
                ),
                "n": pa.array(
                    np.append(
                        np.full(len(order), -1, dtype=np.int64),
                        int(n[~cand].sum()),
                    ),
                    type=pa.int64(),
                ),
            }
        )

    rows = []
    n_rows = 0
    true_total = 0
    heads = (
        ds.map_batches(head, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )
    for blk in heads.iter_batches(batch_format="pyarrow"):
        for r in blk.to_pylist():
            if r["n"] >= 0:
                n_rows += int(r["n"])
                true_total += int(r["x"])
            else:
                rows.append((r["key"], r["id"], r["x"]))

    rows.sort()
    # thresh == 0 (a key floored to zero at rank k+1 — needs a weight
    # exceeding the 63-bit hash, ~impossible for real metrics) is the
    # same exact-total sentinel branch as the ≤k corpus, mirroring the
    # SQL CASE
    if n_rows <= k or rows[k][0] == 0:
        est = float(true_total)
        thresh = 0
    else:
        thresh = rows[k][0]  # the (k+1)-th smallest key
        tau = float(2**63) / float(thresh)
        est_micro = sum(
            int(math.floor(max(float(x), tau) * 1e6 + 0.5))
            for _, _, x in rows[:k]
        )
        est = est_micro / 1e6
    rel = (
        (est - float(true_total)) / float(true_total)
        if true_total > 0
        else 0.0
    )
    q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
    return pa.table(
        {
            "k": pa.array([k], type=pa.int64()),
            "n_rows": pa.array([n_rows], type=pa.int64()),
            "threshold": pa.array([thresh], type=pa.int64()),
            "estimate": pa.array([est], type=pa.float64()),
            "true_total": pa.array([true_total], type=pa.int64()),
            "rel_err": pa.array([q6(rel)], type=pa.float64()),
        }
    )
