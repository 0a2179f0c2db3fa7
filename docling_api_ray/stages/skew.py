"""Explicit skew handling — cost-based block rebalancing (SURVEY.md §4,
north_rule "partitioning / shuffle / skew handled explicitly").

The reference has no skew story: a 500-page PDF occupies its Celery
worker for the full duration (§4 table).  In a batched engine the
equivalent failure is head-of-line blocking: one heavy document inside a
64-512 row batch stalls the whole batch's actor task.

Two mechanisms, because Ray Data controls work granularity at two
levels:

- ``split_by_cost`` re-cuts oversized batches at UDF-yield granularity.
  CAVEAT (measured): Ray's output buffer re-merges yielded tables into
  blocks up to ``target_max_block_size``, so this bounds a TASK's input
  only when upstream blocks are huge; it does NOT isolate a heavy row
  from its block-mates downstream.  MEASURED r2 (bench.py --skew): the
  stage costs 5-8% on a uniform corpus and 57% on a 1%-mega corpus —
  config defaults it OFF; prefer ``dispatch_by_cost``/heavy-split
  (measured 1.35x on the same skewed corpus).
- ``dispatch_by_cost`` is the real head-of-line-blocking fix: a
  vectorized filter split into a heavy stream (converted with
  ``batch_size=1`` — one mega-document per actor task) and a light
  stream (densely batched).  No shuffle; the cost is that both filters
  scan the classified stream — upstream stages re-execute once per
  branch, which is why the split sits AFTER the cheap bounded-window
  classify and not after any expensive stage.  At 100 TB, persist the
  classified stream (or split at the storage layer by a size column)
  if the double scan of raw payloads matters.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

DEFAULT_TARGET_COST = 1 << 20  # ~1 MiB of payload per block
ROW_FLOOR = 2048  # fixed per-row cost floor (parse/assembly overhead)


def split_batch_by_cost(
    batch: pa.Table,
    *,
    target_cost: int = DEFAULT_TARGET_COST,
    cost_col: str = "payload",
) -> Iterator[pa.Table]:
    """Yield slices of ``batch`` whose summed cost ≈ target_cost.  A row
    whose own cost exceeds the target gets a dedicated slice."""
    costs = (
        pc.binary_length(batch[cost_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        + ROW_FLOOR
    )
    n = len(costs)
    if n == 0:
        return
    start = 0
    acc = 0
    for i in range(n):
        if acc > 0 and acc + costs[i] > target_cost:
            yield batch.slice(start, i - start)
            start = i
            acc = 0
        acc += costs[i]
    yield batch.slice(start, n - start)


def rebalance_by_cost(
    ds: ray.data.Dataset,
    *,
    target_cost: int = DEFAULT_TARGET_COST,
    cost_col: str = "payload",
) -> ray.data.Dataset:
    def split(batch: pa.Table):
        yield from split_batch_by_cost(
            batch, target_cost=target_cost, cost_col=cost_col
        )

    # batch_size=None → operate on whole incoming blocks; the generator
    # output re-chunks the stream by cost
    return ds.map_batches(split, batch_format="pyarrow", batch_size=None)


HEAVY_THRESHOLD = 256 * 1024  # payload bytes above which a doc is "heavy"


def dispatch_by_cost(
    ds: ray.data.Dataset,
    *,
    threshold: int = HEAVY_THRESHOLD,
    cost_col: str = "payload",
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(heavy, light) streams split by payload size — vectorized filters,
    no shuffle.  See module docstring for the re-execution tradeoff."""

    # null payloads count as length 0 (→ light stream) — a null predicate
    # result would silently drop the row from BOTH streams
    def heavy(b: pa.Table) -> pa.Table:
        ln = pc.fill_null(pc.binary_length(b[cost_col]), 0)
        return b.filter(pc.greater(ln, threshold))

    def light(b: pa.Table) -> pa.Table:
        ln = pc.fill_null(pc.binary_length(b[cost_col]), 0)
        return b.filter(pc.less_equal(ln, threshold))

    return (
        ds.map_batches(heavy, batch_format="pyarrow"),
        ds.map_batches(light, batch_format="pyarrow"),
    )
