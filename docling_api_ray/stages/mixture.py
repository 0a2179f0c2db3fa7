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
