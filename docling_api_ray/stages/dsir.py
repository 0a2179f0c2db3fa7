"""DSIR-style data selection with importance resampling — score every
raw document by the log-likelihood ratio of a TARGET-domain bag-of-
hashed-unigrams model over a RAW-corpus model (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling"; the hashed
n-gram generative models of §3.2).  High scores mark raw documents that
look like the target domain — the selection signal for pretraining-data
curation.

Exactness design (the charlm recipe applied to hashed unigrams):

- features are word hashes folded into ``B`` = 1024 buckets via the
  process-stable ``u64_md5(word) % B`` (functions/hashing.py — DuckDB
  mirrors it with ``md5_number``), so the feature space is BOUNDED and
  the model is a fixed-width count vector;
- the **train pass** reduces every batch to TWO dense 1024-int64 rows
  (target counts, raw counts — class decided per row by a source-set
  predicate) folded driver-side block by block: the mergeable-sketch
  shape, no shuffle, state is corpus-size-independent;
- bucket log-probs are Laplace-smoothed and quantized to int64 MICRO
  units; the per-bucket importance weight is the DIFFERENCE of two such
  integers, so each document's score ``Σ λ[h(w)]`` is an order-free
  integer sum the DuckDB oracle reproduces bit-for-bit;
- the **score pass** is a stateless ``map_batches`` against the
  broadcast 1024-int table (``ray.put`` once, ``ray.get`` in
  ``__init__``): batch word hashes → bucket ids → table gather →
  segmented ``reduceat`` — no python loop over rows.

avg = lr_micro / (n_words * 1e6), one exact int→double division
mirrored verbatim in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from docling_api_ray.functions.hashing import batch_word_hashes

N_BUCKETS = 1024


def _bucket_counts(
    texts: list[str], is_target: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(target_counts[B], raw_counts[B]) for one batch."""
    hashes, offsets = batch_word_hashes(texts)
    buckets = (hashes % np.uint64(N_BUCKETS)).astype(np.int64)
    # per-word class flag via the document's flag repeated over its span
    lens = np.diff(offsets)
    flags = np.repeat(is_target, lens)
    tgt = np.bincount(buckets[flags], minlength=N_BUCKETS).astype(np.int64)
    raw = np.bincount(buckets[~flags], minlength=N_BUCKETS).astype(np.int64)
    return tgt, raw


def train_bucket_counts(
    ds: ray.data.Dataset,
    target_sources: tuple[str, ...],
    *,
    text_col: str = "text",
    source_col: str = "source",
) -> tuple[np.ndarray, np.ndarray]:
    """One streaming pass → (target[1024], raw[1024]) int64 count
    vectors.  Each block contributes one fixed-size row pair; the driver
    fold is block-count-proportional over 2048-int rows only."""

    def partial(b: pa.Table) -> pa.Table:
        texts = [t if t is not None else "" for t in b[text_col].to_pylist()]
        srcs = b[source_col].to_pylist()
        is_target = np.fromiter(
            (s in target_sources for s in srcs), dtype=bool, count=len(srcs)
        )
        tgt, raw = _bucket_counts(texts, is_target)
        return pa.table(
            {
                "tgt": pa.array([tgt], type=pa.list_(pa.int64())),
                "raw": pa.array([raw], type=pa.list_(pa.int64())),
            }
        )

    tgt_total = np.zeros(N_BUCKETS, dtype=np.int64)
    raw_total = np.zeros(N_BUCKETS, dtype=np.int64)
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for t, r in zip(batch["tgt"].to_pylist(), batch["raw"].to_pylist()):
            tgt_total += np.asarray(t, dtype=np.int64)
            raw_total += np.asarray(r, dtype=np.int64)
    return tgt_total, raw_total


def micro_weight_table(tgt: np.ndarray, raw: np.ndarray) -> np.ndarray:
    """λ[b] = round(ln((tgt_b+1)/(T+B))*1e6) − round(ln((raw_b+1)/(R+B))
    *1e6) as int64 — a difference of the exact integers the SQL oracle
    computes with the same two-round formula (quantize-BEFORE-subtract
    keeps both sides' float work to the identical two ln calls)."""
    T, R = float(tgt.sum()), float(raw.sum())
    lt = np.rint(
        np.log((tgt.astype(np.float64) + 1.0) / (T + N_BUCKETS)) * 1e6
    ).astype(np.int64)
    lr = np.rint(
        np.log((raw.astype(np.float64) + 1.0) / (R + N_BUCKETS)) * 1e6
    ).astype(np.int64)
    return lt - lr


def _dsir_score(lam):
    """Stateless-per-batch scorer against the VALUE-captured weight
    table (8 KB serialized once per task; see clustering._partial_sums
    on task pools + value capture vs per-job actor spin-up)."""

    def score(batch: pa.Table) -> pa.Table:
        texts = [
            t if t is not None else "" for t in batch["text"].to_pylist()
        ]
        hashes, offsets = batch_word_hashes(texts)
        buckets = (hashes % np.uint64(N_BUCKETS)).astype(np.int64)
        vals = lam[buckets]
        n_words = np.diff(offsets)
        # cumsum-difference segmented sum — exact for empty rows in any
        # position (a clamped-offset reduceat corrupts the last
        # non-empty row when empty rows trail the batch)
        csum = np.zeros(len(vals) + 1, dtype=np.int64)
        np.cumsum(vals, out=csum[1:])
        lr = csum[offsets[1:]] - csum[offsets[:-1]]
        denom = np.maximum(n_words, 1).astype(np.float64) * 1e6
        avg = np.where(n_words > 0, lr.astype(np.float64) / denom, 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, type=pa.int64()),
                "lr_micro": pa.array(lr, type=pa.int64()),
                "avg_lr": pa.array(avg, type=pa.float64()),
            }
        )

    return score


def dsir_scores(
    ds: ray.data.Dataset,
    *,
    target_sources: tuple[str, ...] = ("src0", "src1"),
) -> ray.data.Dataset:
    """documents → (doc_id, n_words, lr_micro, avg_lr): train the two
    hashed-unigram models in one bounded-sketch pass, broadcast the
    integer weight table, score statelessly."""
    tgt, raw = train_bucket_counts(ds, target_sources)
    return ds.map_batches(
        _dsir_score(micro_weight_table(tgt, raw)),
        batch_format="pyarrow",
        batch_size=1024,
    )


def kl_by_group(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-group KL divergence of the hashed-unigram distribution from
    the corpus-wide distribution — the domain-shift / source-drift
    monitor of a multi-source pipeline (which sources' language is
    atypical?).  KL(P_g ‖ P_corpus) over the same bounded 1024-bucket
    hashed feature space as DSIR, with Laplace smoothing on both sides.

    Shape: each block reduces to its (group, bucket) count rows —
    ≤ |groups_in_block| × 1024, corpus-independent — folded by the
    bounded tree fold; the driver computes KL from the |groups| × 1024
    table.  Exactness: each term round(p_g·(ln p_g − ln p_c)·1e9) is an
    int64 NANO unit quantized BEFORE summation (order-free, bucket
    index order irrelevant), mirrored verbatim in SQL; kl = s_nano/1e9
    is one exact division.

    Output: (group, n_tokens, s_nano, kl)."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(col, ""), " ")
        words = pc.list_flatten(lists)
        grp = pc.take(b[group_col], pc.list_parent_indices(lists))
        keep = pc.not_equal(words, "")
        words, grp = words.filter(keep), grp.filter(keep)
        if len(words) == 0:
            return pa.table(
                {
                    group_col: pa.array([], type=pa.string()),
                    "bucket": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        import pandas as pd

        warr = np.asarray(words.to_pylist(), dtype=object)
        codes, uniques = pd.factorize(warr)
        from docling_api_ray.functions.hashing import u64_md5

        buckets = (u64_md5(uniques) % np.uint64(N_BUCKETS)).astype(
            np.int64
        )[codes]
        g = (
            pd.DataFrame(
                {group_col: np.asarray(grp.to_pylist(), dtype=object),
                 "bucket": buckets}
            )
            .groupby([group_col, "bucket"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                group_col: pa.array(g[group_col].tolist(), type=pa.string()),
                "bucket": pa.array(g["bucket"].to_numpy(), type=pa.int64()),
                "n": pa.array(g["n"].to_numpy(), type=pa.int64()),
            }
        )

    counts = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "bucket"],
        sum_cols={"n": "n"},
    )

    out_schema = pa.schema(
        [
            (group_col, pa.string()),
            ("n_tokens", pa.int64()),
            ("s_nano", pa.int64()),
            ("kl", pa.float64()),
        ]
    )

    def finalize(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        # dense (group x 1024) count matrix; corpus = column sums
        groups = sorted(df[group_col].unique())
        gidx = {g: i for i, g in enumerate(groups)}
        mat = np.zeros((len(groups), N_BUCKETS), dtype=np.int64)
        mat[
            df[group_col].map(gidx).to_numpy(dtype=np.int64),
            df["bucket"].to_numpy(dtype=np.int64),
        ] = df["n"].to_numpy(dtype=np.int64)
        corpus = mat.sum(axis=0)
        n_corpus = float(corpus.sum())
        lc = np.log((corpus + 1.0) / (n_corpus + N_BUCKETS))
        rows_g, rows_n, rows_s, rows_kl = [], [], [], []
        for g in groups:
            cg = mat[gidx[g]]
            ng = float(cg.sum())
            pg = (cg + 1.0) / (ng + N_BUCKETS)
            term = np.rint(pg * (np.log(pg) - lc) * 1e9).astype(np.int64)
            s = int(term.sum())
            rows_g.append(g)
            rows_n.append(int(cg.sum()))
            rows_s.append(s)
            rows_kl.append(s / 1e9)
        return pa.table(
            {
                group_col: pa.array(rows_g, type=pa.string()),
                "n_tokens": pa.array(rows_n, type=pa.int64()),
                "s_nano": pa.array(rows_s, type=pa.int64()),
                "kl": pa.array(rows_kl, type=pa.float64()),
            }
        ).cast(out_schema)

    return counts.map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )
