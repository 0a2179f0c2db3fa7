"""Shared execution helpers.

``coalesce_for_shuffle``: Ray Data's sort-based groupby/aggregate creates
one shuffle partition per input block, and the streaming reader happily
over-splits small inputs to reach parallelism 2×CPUs — a 1.5 MB table
becomes 64 blocks and a groupby over it schedules 64×64 tiny shuffle
objects whose scheduling overhead dwarfs the compute (measured: 9-20 s
for a 5000-row aggregate that takes 0.6 s at 8 blocks).  Narrow
pre-aggregated intermediates should therefore be coalesced to ~core-count
blocks before any all-to-all.  For genuinely large inputs the natural
block count (data_size / target_max_block_size) already lands in a sane
range and the repartition is a cheap metadata-level coalesce of the
narrow intermediate — NOT of the wide input.
"""

from __future__ import annotations

import ray
import ray.data


def shuffle_partitions(lo: int = 4, hi: int = 32) -> int:
    """Shuffle-partition target ≈ half the cluster cores, clamped."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(lo, min(hi, cpus // 2))


def coalesce_for_shuffle(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Coalesce a NARROW intermediate down to shuffle_partitions() blocks
    right before a groupby/aggregate.  Call only on pre-projected /
    pre-aggregated datasets (ids, hashes, counters) — never on wide
    payload columns."""
    return ds.repartition(shuffle_partitions())
