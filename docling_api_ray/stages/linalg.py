"""Distributed dense linear algebra over the embedding column — the
second-moment (Gram) matrix, the primitive behind PCA / whitening /
covariance-conditioned curation of embedding spaces.

Exactness contract (same as ``stages/clustering``): components quantize
once to int64 micro-units via ``floor(x*1e6 + 0.5)``, so every partial
product and the fold are exact integer arithmetic the DuckDB oracle can
mirror bit-for-bit (``sum(a.q * b.q)`` over a parallel-unnest self-join).

Scale shape — the textbook distributed Gram:
- each batch reduces to ONE dim×dim partial ``Qᵀ·Q`` (a numpy int64
  matmul over the batch), emitted as ≤ dim² tiny (i, j, gram) rows;
- partials tree-fold through ``bounded_groupby_sum`` (domain = dim²,
  corpus-independent), so the exchange moves dim²·blocks scalar rows
  and NO vectors, and no single block ever holds blocks×dim² rows.
Overflow bound: |q| ≤ 1e6·max|x|; with |x| ≤ 10 a single product is
≤ 1e14, leaving headroom for ~9×10⁴ rows per BATCH partial and ~9×10⁴
batch partials per fold level in int64 — beyond that scale the partial
would switch to HUGEINT-style splitting (hi/lo int64 limbs); at this
corpus' magnitudes (|x| < 1) the slack is ×10⁴ wider still.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from docling_api_ray.stages.clustering import quantized_matrix
from docling_api_ray.stages.common import bounded_groupby_sum


def gram_matrix(ds: ray.data.Dataset) -> ray.data.Dataset:
    """dim×dim integer Gram matrix of the quantized ``embedding`` column
    as (i, j, gram) rows — ``gram[i,j] = Σ_rows q_i·q_j``."""

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("i", pa.int64()), ("j", pa.int64()), ("gram", pa.int64())]
        ).empty_table()
        if len(b) == 0:
            return empty
        q = quantized_matrix(b["embedding"])
        if q.size == 0:
            return empty
        dim = q.shape[1]
        g = q.T @ q  # int64 matmul — exact
        return pa.table(
            {
                "i": pa.array(np.repeat(np.arange(dim, dtype=np.int64), dim)),
                "j": pa.array(np.tile(np.arange(dim, dtype=np.int64), dim)),
                "gram": pa.array(g.ravel()),
            }
        )

    return bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"],
        sum_cols={"gram": "gram"},
    )
