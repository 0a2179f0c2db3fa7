"""Distribution statistics — exact per-group quantiles over integer
metrics (token counts, span counts, byte sizes).

Scale design: the classic approach co-locates each group and sorts —
corpus-proportional memory per group.  For INTEGER-valued metrics the
exact quantile is instead computable from the value HISTOGRAM:
per-batch ``(group, value) → count`` partials (vectorized Arrow
group_by, shuffle-free map side), the bounded two-level tree fold of
``common.bounded_groupby_sum``, then one tiny final pass turning
cumulative counts into ``percentile_disc`` values.  The only
corpus-size-dependent table is the histogram, bounded by
|groups| × |distinct values| — value-domain-proportional, never
row-proportional.  (For unbounded float metrics this becomes a KLL /
t-digest sketch; integer metrics — the common case for corpus stats —
need no approximation.)

``percentile_disc`` semantics match SQL exactly: the p-quantile is the
smallest value whose cumulative row count reaches ``ceil(p * n)``."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from docling_api_ray.stages.common import bounded_groupby_sum


def grouped_int_quantiles(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> ray.data.Dataset:
    """(group, int value) rows → one row per group with exact
    ``percentile_disc`` quantiles, named ``p50`` / ``p90`` / ``p99``
    (per-mille values get p905-style names)."""
    names = []
    for p in quantiles:
        pct = p * 100
        names.append(f"p{int(pct)}" if pct == int(pct) else f"p{pct}".replace(".", "_"))

    hist = bounded_groupby_sum(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col],
        count_alias="cnt",
    )

    def extract(df: pd.DataFrame) -> pa.Table:
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            sub = sub.sort_values(value_col, kind="stable")
            vals = sub[value_col].to_numpy()
            cum = np.cumsum(sub["cnt"].to_numpy())
            total = int(cum[-1])
            row = {group_col: g}
            for p, name in zip(quantiles, names):
                k = max(1, math.ceil(p * total))
                row[name] = int(vals[np.searchsorted(cum, k)])
            rows.append(row)
        out = pd.DataFrame(rows)
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [(group_col, pa.string())]
                + [(name, pa.int64()) for name in names]
            ),
            preserve_index=False,
        )

    # the histogram fold already ends in one small block; the quantile
    # extraction is a single vectorized pass over it
    return hist.map_batches(
        lambda b: extract(b.to_pandas()),
        batch_format="pyarrow",
        batch_size=None,
    )
