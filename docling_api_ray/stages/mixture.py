"""Temperature-scaled source mixture weights — the data-mixing operator
of multilingual / multi-source pretraining (mT5 / XLM-R style: sample
source s with probability ∝ share_s^α, α < 1 up-weights small sources;
DoReMi's static ancestor).  Given the corpus's per-source token counts,
emit the sampling weight each source should get in the training mixture.

Shape: a single bounded-domain pass — per-batch (source, n_docs,
n_tokens) partials fold through ``bounded_groupby_sum`` (the shuffle
moves ≤|sources| rows per block), and the final ≤|sources|-row block
computes shares and weights in one vectorized map.  Nothing
corpus-proportional ever concentrates.

Exactness: share = n_tokens / total is one exact int→double division;
the α = 0.5 temperature uses IEEE ``sqrt`` (correctly rounded, identical
in numpy and SQL) FLOORED to int64 micro units, so the normalizing sum
is order-free integer and the final weight division is deterministic —
the DuckDB oracle mirrors every step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from docling_api_ray.stages.text_analysis import WS_TOKEN_RE


def mixture_weights(
    ds: ray.data.Dataset,
    *,
    source_col: str = "source",
    text_col: str = "text",
) -> ray.data.Dataset:
    """documents → (source, n_docs, n_tokens, share, w_micro,
    samp_weight) with w ∝ floor(sqrt(share)·1e6)."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    def partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                source_col: b[source_col],
                "n_tokens": pc.cast(
                    pc.count_substring_regex(
                        pc.fill_null(b[text_col], ""), WS_TOKEN_RE
                    ),
                    pa.int64(),
                ),
            }
        )

    totals = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        [source_col],
        sum_cols={"n_tokens": "n_tokens"},
        count_alias="n_docs",
    )

    out_schema = pa.schema(
        [
            (source_col, pa.string()),
            ("n_docs", pa.int64()),
            ("n_tokens", pa.int64()),
            ("share", pa.float64()),
            ("w_micro", pa.int64()),
            ("samp_weight", pa.float64()),
        ]
    )

    def finalize(b: pa.Table) -> pa.Table:
        nt = np.asarray(b["n_tokens"], dtype=np.int64)
        share = nt.astype(np.float64) / float(nt.sum())
        w_micro = np.floor(np.sqrt(share) * 1e6).astype(np.int64)
        return pa.table(
            {
                source_col: b[source_col],
                "n_docs": b["n_docs"],
                "n_tokens": b["n_tokens"],
                "share": pa.array(share, type=pa.float64()),
                "w_micro": pa.array(w_micro, type=pa.int64()),
                "samp_weight": pa.array(
                    w_micro.astype(np.float64) / float(w_micro.sum()),
                    type=pa.float64(),
                ),
            }
        ).cast(out_schema)

    # the bounded fold already ends in a single ≤|sources|-row block
    return totals.map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def mixture_select(
    ds: ray.data.Dataset,
    *,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """BUILD the training mixture the weights describe: allocate an
    integer per-source document quota proportional to the temperature
    weights (``quota_s = budget · w_micro_s // Σw_micro`` — exact floor
    arithmetic, no float apportionment) and select each source's quota
    deterministically as its hash-smallest documents (the
    stratified-sample discipline: reshard-stable, coordination-free).

    Shape: the weight table is the bounded ``mixture_weights`` fold
    (driver-side, |sources| rows, value-captured into the selection
    closures); selection is a per-batch PARTIAL per-source head (each
    block emits ≤ quota_s rows per source it contains) followed by one
    per-source co-grouped final head — rows crossing the exchange are
    ≤ Σquota · blocks, corpus-independent.

    Output: (doc_id, source, hkey, quota) for the selected rows."""
    from docling_api_ray.functions.hashing import u64_md5

    wrows = mixture_weights(
        ds, source_col=source_col, text_col="text"
    ).take_all()
    total_w = sum(int(r["w_micro"]) for r in wrows)
    quotas = {
        r[source_col]: (budget * int(r["w_micro"])) // total_w
        for r in wrows
    }

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            (source_col, pa.string()),
            ("hkey", pa.int64()),
            ("quota", pa.int64()),
        ]
    )

    def head(b: pa.Table) -> pa.Table:
        import pandas as pd

        ids = b[id_col].to_pylist()
        h = (
            u64_md5(np.array([str(i) for i in ids], dtype=object))
            >> np.uint64(1)
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                id_col: np.asarray(ids, dtype=np.int64),
                source_col: b[source_col].to_pylist(),
                "hkey": h,
            }
        )
        parts = []
        for src, g in df.groupby(source_col, sort=False):
            q = quotas.get(src, 0)
            if q > 0:
                parts.append(
                    g.sort_values(["hkey", id_col], kind="stable").head(q)
                )
        if not parts:
            return out_schema.empty_table()
        out = pd.concat(parts, ignore_index=True)
        out["quota"] = out[source_col].map(quotas).astype(np.int64)
        return pa.Table.from_pandas(
            out[[id_col, source_col, "hkey", "quota"]],
            schema=out_schema,
            preserve_index=False,
        ).replace_schema_metadata(None)

    def final(df) -> pa.Table:
        import pandas as pd

        parts = []
        for src, g in df.groupby(source_col, sort=False):
            parts.append(
                g.sort_values(["hkey", id_col], kind="stable").head(
                    quotas.get(src, 0)
                )
            )
        out = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(columns=[id_col, source_col, "hkey", "quota"])
        )
        return pa.Table.from_pandas(
            out[[id_col, source_col, "hkey", "quota"]],
            schema=out_schema,
            preserve_index=False,
        ).replace_schema_metadata(None)

    from docling_api_ray.stages.common import coalesce_narrow

    # bundle the narrow partial heads before the sort-based co-group:
    # over-split tiny partials leave empty sort ranges whose 0-column
    # blocks skip downstream UDFs (the 'different schema' warning)
    return (
        coalesce_narrow(
            ds.select_columns([id_col, source_col]).map_batches(
                head, batch_format="pyarrow"
            )
        )
        .groupby(source_col)
        .map_groups(final, batch_format="pandas")
    )


INTERLEAVE_SCALE = 1_000_000_000
INTERLEAVE_BUCKETS = 1024  # 2^10 — raise ~corpus_per_source/1e6 at scale


def interleave_order(
    ds: ray.data.Dataset,
    *,
    budget: int = 200,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = INTERLEAVE_BUCKETS,
) -> ray.data.Dataset:
    """Deterministic WEIGHTED SOURCE INTERLEAVE — the training-stream
    order a mixture-aware loader (HF ``interleave_datasets`` /
    stride-scheduling) would emit: the doc at per-source hash-rank r of
    source s gets ``pos_key = r·SCALE // w_micro_s``; ascending
    (pos_key, source, rank) visits sources proportionally to the
    temperature weights (``mixture_weights``).  Returns the first
    ``budget`` rows of that stream.

    Per-source rank WITHOUT a global sort (pack_chunks' two-phase scan
    transplanted to hash order): hkeys are uniform u64, so
    ``bucket = hkey >> (64-k)`` splits every source into ~equal ranges;
    ONE bounded (|sources|·2^k)-row count fold prefix-sums per source on
    the driver (value-captured — KBs), and exact ranks resolve after one
    (source, bucket) co-group exchange with an in-partition sort +
    cumcount + bucket base.  A rank can reach the budget-length stream
    prefix only if r ≤ budget (its own source already placed r−1
    strictly-earlier rows), so each partition PRUNES to rank ≤ budget
    before computing keys — the preview head is then a two-level
    bounded top-k, and ``rank·SCALE`` stays far from int64 overflow
    regardless of corpus size.

    Output: (doc_id, source, rnk, pos_key), the ≤``budget``-row stream
    prefix (order-insensitive set; consumers sort by (pos_key, source,
    rnk))."""
    import pandas as pd

    from docling_api_ray.functions.hashing import u64_md5
    from docling_api_ray.stages.common import bounded_groupby_sum

    shift = np.uint64(64 - int(np.log2(n_buckets)))

    wrows = mixture_weights(ds, source_col=source_col).take_all()
    w_of = {r[source_col]: int(r["w_micro"]) for r in wrows if r["w_micro"] > 0}
    sid_of = {s: i for i, s in enumerate(sorted(w_of))}

    def hkeys(b: pa.Table) -> np.ndarray:
        ids = [str(i) for i in b[id_col].to_pylist()]
        return (
            u64_md5(np.array(ids, dtype=object)) >> np.uint64(1)
        ).astype(np.int64)

    def bucket_rows(b: pa.Table) -> pa.Table:
        h = hkeys(b)
        return pa.table(
            {
                source_col: b[source_col],
                "bucket": pa.array(
                    (h.astype(np.uint64) >> shift).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    counts = bounded_groupby_sum(
        ds.select_columns([id_col, source_col]).map_batches(
            bucket_rows, batch_format="pyarrow"
        ),
        [source_col, "bucket"],
        count_alias="n",
    ).take_all()  # ≤ |sources| · n_buckets rows — bounded

    base = {}  # (sid, bucket) -> exclusive prefix count within source
    counts.sort(key=lambda r: (r[source_col], r["bucket"]))
    acc_src, acc = None, 0
    for r in counts:
        if r[source_col] not in sid_of:
            continue
        if r[source_col] != acc_src:
            acc_src, acc = r[source_col], 0
        base[(sid_of[r[source_col]], r["bucket"])] = acc
        acc += r["n"]

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            (source_col, pa.string()),
            ("rnk", pa.int64()),
            ("pos_key", pa.int64()),
        ]
    )

    def tag(b: pa.Table) -> pa.Table:
        h = hkeys(b)
        srcs = b[source_col].to_pylist()
        sid = np.array([sid_of.get(s, -1) for s in srcs], dtype=np.int64)
        keep = sid >= 0
        bucket = (h.astype(np.uint64) >> shift).astype(np.int64)
        return pa.table(
            {
                id_col: pc.cast(b[id_col], pa.int64()),
                source_col: pa.array(srcs, type=pa.string()),
                "hkey": pa.array(h, type=pa.int64()),
                "__ck": pa.array(sid * n_buckets + bucket, type=pa.int64()),
            }
        ).filter(pa.array(keep))

    def rank_fold(df: pd.DataFrame) -> pa.Table:
        ck = int(df["__ck"].iloc[0])
        df = df.sort_values(["hkey", id_col], kind="stable")
        rnk = (
            np.arange(len(df), dtype=np.int64)
            + base.get((ck // n_buckets, ck % n_buckets), 0)
            + 1
        )
        keep = rnk <= budget  # sound prune — see docstring
        df, rnk = df[keep], rnk[keep]
        w = np.int64(w_of[df[source_col].iloc[0]]) if len(df) else np.int64(1)
        pos = rnk * np.int64(INTERLEAVE_SCALE) // w
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    source_col: df[source_col].to_numpy(),
                    "rnk": rnk,
                    "pos_key": pos,
                }
            ),
            schema=out_schema,
            preserve_index=False,
        ).replace_schema_metadata(None)

    ranked = (
        ds.select_columns([id_col, source_col])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__ck")
        .map_groups(rank_fold, batch_format="pandas")
    )

    def head(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["pos_key", source_col, "rnk"], kind="stable"
        ).head(budget)
        return pa.Table.from_pandas(
            df, schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ranked.map_batches(head, batch_format="pyarrow")
        .repartition(1)
        .map_batches(head, batch_format="pyarrow", batch_size=None)
    )
