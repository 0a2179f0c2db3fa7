"""Distributed EXACT selection — quantiles over FLOAT columns.

``stages/stats.py`` computes exact quantiles from the value HISTOGRAM,
which needs an integer (bounded-domain) metric; its docstring defers
float metrics to an approximate KLL/t-digest sketch.  This module does
better than a sketch: EXACT float quantiles in a constant number of
streaming passes via iterative bracket refinement — the distributed
form of quickselect with a deterministic pivot grid instead of random
pivots:

  pass 0   fold (n, min, max) — one narrow two-level reduction.
  round r  split each unresolved quantile's bracket into ``bins``
           equal-width cells; ONE shared streaming pass counts every
           (quantile, cell) occupancy (vectorized searchsorted per
           batch, all active quantiles in the same pass, each partial
           an ATOMIC list<int64> row so Ray's batch slicing cannot
           split a histogram); the bounded fold is ≤ |quantiles| rows
           of ``bins`` ints.  The cell containing the target rank
           becomes the next bracket.
  final    brackets whose occupancy ≤ ``collect_threshold`` collect
           their in-bracket values (bounded by construction) and the
           exact k-th smallest is taken driver-side.

Brackets are HALF-OPEN ``[lo, hi)`` — except the rightmost lineage,
which stays closed at the global max — so a value on a cell edge is
counted in exactly one round's cell and exactly one child bracket.
Massive-tie degeneracy (a bracket narrowed to ≤2 representable floats
whose occupancy never shrinks) resolves by COUNTING values equal to
``lo`` instead of collecting them, so no tie pattern can ever pull
corpus-proportional rows to the driver.

Rounds needed: log_bins(n / collect_threshold) — TWO refinement passes
cover 10^12 rows at bins=4096, collect_threshold=10^5, so a 100 TB
column is ~4 streaming passes total; every fold payload is
quantile-count-bounded, never row-bounded.  Fully deterministic (no
sampling).

Rank semantics are SQL ``quantile_disc`` / ``percentile_disc``: the
k-th smallest with k = ceil(q·n), verified against DuckDB for the
oracle mirrors.  NaN/null values are excluded from n (SQL aggregate
semantics).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data

from docling_api_ray.stages.common import bounded_groupby_sum, two_level_fold


def _valid(b: pa.Table, value_col: str) -> np.ndarray:
    v = np.asarray(b[value_col], dtype=np.float64)
    return v[~np.isnan(v)]


def _in_bracket(v: np.ndarray, lo: float, hi: float, closed: bool) -> np.ndarray:
    m = v >= lo
    m &= (v <= hi) if closed else (v < hi)
    return v[m]


def _minmax_count(
    ds: ray.data.Dataset, value_col: str
) -> tuple[int, float, float]:
    def partial(b: pa.Table) -> pa.Table:
        v = _valid(b, value_col)
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "mn": pa.array(
                    [float(v.min()) if len(v) else np.inf], pa.float64()
                ),
                "mx": pa.array(
                    [float(v.max()) if len(v) else -np.inf], pa.float64()
                ),
            }
        )

    def fold(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"], dtype=np.int64)
        mn = np.asarray(b["mn"], dtype=np.float64)
        mx = np.asarray(b["mx"], dtype=np.float64)
        return pa.table(
            {
                "n": pa.array([int(n.sum())], pa.int64()),
                "mn": pa.array(
                    [float(mn.min()) if len(mn) else np.inf], pa.float64()
                ),
                "mx": pa.array(
                    [float(mx.max()) if len(mx) else -np.inf], pa.float64()
                ),
            }
        )

    rows = two_level_fold(
        ds.map_batches(partial, batch_format="pyarrow"), fold
    ).take_all()
    if not rows:  # zero-block input (e.g. a typed empty dataset)
        return 0, float("inf"), float("-inf")
    r = rows[0]
    return int(r["n"]), float(r["mn"]), float(r["mx"])


def quantile_select(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 4096,
    collect_threshold: int = 100_000,
    max_rounds: int = 128,
) -> pa.Table:
    """Exact ``quantile_disc`` values of a float column as a bounded
    (q, value) Arrow table — see the module docstring for the pass
    structure and scale shape.  ``ds`` is consumed ``2 + rounds`` times;
    pass a materialized dataset or a pruned parquet read (which
    re-executes as a pruned read)."""
    qs = sorted(set(float(q) for q in quantiles))
    out_schema = pa.schema([("q", pa.float64()), ("value", pa.float64())])
    n, mn, mx = _minmax_count(ds, value_col)
    if n == 0:
        return out_schema.empty_table()

    # per-quantile bracket state; k is the 1-indexed rank WITHIN the
    # bracket (values below the bracket were subtracted when the
    # bracket narrowed); "closed" marks the rightmost lineage
    state: dict[float, dict] = {}
    for q in qs:
        k = max(1, math.ceil(q * n))
        state[q] = {
            "lo": mn, "hi": mx, "k": k, "cnt": n,
            "closed": True, "done": mn == mx,
        }
        if state[q]["done"]:
            state[q]["value"] = mn

    def _two_float(st: dict) -> bool:
        return np.nextafter(st["lo"], st["hi"]) >= st["hi"]

    rounds = 0
    while True:
        # degenerate tie brackets: ≤2 representable floats — resolve by
        # COUNTING values == lo (one shared pass), never by collecting
        ties = [
            q for q in qs
            if not state[q]["done"] and _two_float(state[q])
        ]
        if ties:
            specs = tuple(
                (q, state[q]["lo"], state[q]["hi"], state[q]["closed"])
                for q in ties
            )

            def tie_partial(b: pa.Table, specs=specs) -> pa.Table:
                v = _valid(b, value_col)
                return pa.table(
                    {
                        f"t{i}": pa.array(
                            [int((_in_bracket(v, lo, hi, cl) == lo).sum())],
                            pa.int64(),
                        )
                        for i, (q, lo, hi, cl) in enumerate(specs)
                    }
                )

            def tie_fold(b: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        name: pa.array(
                            [int(np.asarray(b[name], dtype=np.int64).sum())],
                            pa.int64(),
                        )
                        for name in b.column_names
                    }
                )

            row = two_level_fold(
                ds.map_batches(tie_partial, batch_format="pyarrow"), tie_fold
            ).take_all()[0]
            for i, q in enumerate(ties):
                st = state[q]
                n_lo = int(row[f"t{i}"])
                st["value"] = st["lo"] if st["k"] <= n_lo else st["hi"]
                st["done"] = True

        active = [
            q for q in qs
            if not state[q]["done"] and state[q]["cnt"] > collect_threshold
        ]
        if not active or rounds >= max_rounds:
            break
        rounds += 1
        specs = tuple(
            (q, state[q]["lo"], state[q]["hi"], state[q]["closed"])
            for q in active
        )
        edges = {
            q: np.linspace(lo, hi, bins + 1)
            for (q, lo, hi, _c) in specs
        }

        def hist_partial(
            b: pa.Table, specs=specs, edges=edges
        ) -> pa.Table:
            v = _valid(b, value_col)
            cols = {}
            for i, (q, lo, hi, cl) in enumerate(specs):
                iv = _in_bracket(v, lo, hi, cl)
                cell = np.clip(
                    np.searchsorted(edges[q], iv, side="right") - 1,
                    0,
                    bins - 1,
                )
                # one ATOMIC list row per histogram — Ray batch slicing
                # can never split it
                cols[f"h{i}"] = pa.array(
                    [np.bincount(cell, minlength=bins).astype(np.int64)],
                    type=pa.list_(pa.int64()),
                )
            return pa.table(cols)

        def hist_fold(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    name: pa.array(
                        [
                            np.sum(
                                np.stack(
                                    [
                                        np.asarray(x, dtype=np.int64)
                                        for x in b[name].to_pylist()
                                    ]
                                ),
                                axis=0,
                            )
                        ],
                        type=pa.list_(pa.int64()),
                    )
                    for name in b.column_names
                }
            )

        row = two_level_fold(
            ds.map_batches(hist_partial, batch_format="pyarrow"), hist_fold
        ).take_all()[0]
        for i, (q, lo, hi, cl) in enumerate(specs):
            st = state[q]
            hist = np.asarray(row[f"h{i}"], dtype=np.int64)
            cum = np.cumsum(hist)
            cell = int(np.searchsorted(cum, st["k"]))
            e = edges[q]
            below = int(cum[cell - 1]) if cell > 0 else 0
            st["k"] -= below
            st["lo"], st["hi"] = float(e[cell]), float(e[cell + 1])
            st["closed"] = cl and (cell == bins - 1)
            st["cnt"] = int(hist[cell])
            if st["lo"] == st["hi"]:
                st["value"] = st["lo"]
                st["done"] = True

    # final: collect in-bracket values (≤ collect_threshold each, by
    # construction — tie degeneracy was count-resolved above)
    unresolved = [q for q in qs if not state[q]["done"]]
    for q in unresolved:
        if state[q]["cnt"] > 10 * collect_threshold:
            # loud failure beats a silent corpus-proportional collect;
            # unreachable in practice (tie brackets count-resolve and
            # max_rounds covers the full float64 width at bins=4096)
            raise RuntimeError(
                f"quantile_select: bracket for q={q} still holds "
                f"{state[q]['cnt']} rows after {max_rounds} rounds"
            )
    if unresolved:
        specs = tuple(
            (q, state[q]["lo"], state[q]["hi"], state[q]["closed"])
            for q in unresolved
        )

        def collect(b: pa.Table, specs=specs) -> pa.Table:
            v = _valid(b, value_col)
            qs_, vs_ = [], []
            for q, lo, hi, cl in specs:
                iv = _in_bracket(v, lo, hi, cl)
                qs_.append(np.full(len(iv), q, dtype=np.float64))
                vs_.append(iv)
            return pa.table(
                {
                    "q": pa.array(
                        np.concatenate(qs_) if qs_ else
                        np.zeros(0, dtype=np.float64)
                    ),
                    "value": pa.array(
                        np.concatenate(vs_) if vs_ else
                        np.zeros(0, dtype=np.float64),
                        type=pa.float64(),
                    ),
                }
            )

        rows = ds.map_batches(collect, batch_format="pyarrow").take_all()
        by_q: dict[float, list[float]] = {q: [] for q in unresolved}
        for r in rows:
            by_q[float(r["q"])].append(float(r["value"]))
        for q in unresolved:
            st = state[q]
            vals = np.sort(np.asarray(by_q[q], dtype=np.float64))
            st["value"] = float(vals[st["k"] - 1])
            st["done"] = True

    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value": pa.array([state[q]["value"] for q in qs], pa.float64()),
        }
    ).cast(out_schema)

# ---------------------------------------------------------------------------
# grouped exact selection — per-key quantile_disc in SHARED passes
# ---------------------------------------------------------------------------

def grouped_quantile_select(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5,),
    bins: int = 1024,
    collect_threshold: int = 100_000,
    max_rounds: int = 128,
    max_brackets: int = 20_000,
) -> pa.Table:
    """Per-group exact ``quantile_disc`` over a FLOAT column — the
    grouped form of :func:`quantile_select`, refined in SHARED streaming
    passes: every round histograms ALL active (group, quantile) brackets
    in one pass over the dataset (one atomic list<int64> row per
    bracket per batch), so the pass count stays log_bins(n_max /
    collect_threshold) regardless of how many groups exist.  The fold
    payload per pass is |brackets| x ``bins`` ints, never row-bounded.

    Designed for BOUNDED group domains (sources, languages, formats —
    |groups| x |quantiles| <= ``max_brackets`` enforced loudly); an
    unbounded key would need a hash-partitioned per-group sort instead.
    Same rank rule as the global operator (k = ceil(q*n), NaN/null
    excluded), verified against DuckDB ``quantile_disc`` mirrors.
    """
    qs = sorted(set(float(q) for q in quantiles))
    out_schema = pa.schema(
        [(key_col, pa.string()), ("q", pa.float64()), ("value", pa.float64())]
    )

    import pandas as pd

    # ---- pass 0: per-group (n, min, max) — bounded keyed fold ----
    def mm_partial(b: pa.Table) -> pa.Table:
        df = b.select([key_col, value_col]).to_pandas()
        v = df[value_col].to_numpy(dtype=np.float64)
        df = df.loc[~np.isnan(v)]
        if not len(df):
            return pa.schema(
                [(key_col, pa.string()), ("n", pa.int64()),
                 ("mn", pa.float64()), ("mx", pa.float64())]
            ).empty_table()
        g = (
            df.groupby(key_col, sort=False)[value_col]
            .agg(n="count", mn="min", mx="max")
            .reset_index()
        )
        return pa.table(
            {
                key_col: pa.array(g[key_col].astype(str)),
                "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
                "mn": pa.array(g["mn"].to_numpy(dtype=np.float64)),
                "mx": pa.array(g["mx"].to_numpy(dtype=np.float64)),
            }
        )

    def mm_fold(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = (
            df.groupby(key_col, sort=False)
            .agg(n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"))
            .reset_index()
        )
        # enforce the bounded-domain contract INSIDE the fold, before
        # repartition(1)/take_all can concentrate an unbounded group
        # table on one worker or the driver (review r4): any bundle
        # with more distinct keys than the bracket budget proves the
        # key domain is over it
        if len(g) * len(qs) > max_brackets:
            raise RuntimeError(
                f"grouped_quantile_select: >= {len(g)} groups x "
                f"{len(qs)} quantiles exceeds max_brackets="
                f"{max_brackets}; use grouped_quantile_cogroup for "
                "unbounded key domains"
            )
        return pa.table(
            {
                key_col: pa.array(g[key_col].astype(str)),
                "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
                "mn": pa.array(g["mn"].to_numpy(dtype=np.float64)),
                "mx": pa.array(g["mx"].to_numpy(dtype=np.float64)),
            }
        )

    groups = two_level_fold(
        ds.map_batches(mm_partial, batch_format="pyarrow"), mm_fold
    ).take_all()  # bounded: one row per group
    if not groups:
        return out_schema.empty_table()
    if len(groups) * len(qs) > max_brackets:
        raise RuntimeError(
            f"grouped_quantile_select: {len(groups)} groups x {len(qs)} "
            f"quantiles exceeds max_brackets={max_brackets}; use a "
            "hash-partitioned per-group sort for unbounded key domains"
        )

    # bracket state keyed by (group_key, q); k is the rank WITHIN the
    # current bracket, "closed" marks the rightmost lineage
    state: dict[tuple[str, float], dict] = {}
    for r in groups:
        key = str(r[key_col])
        n, mn, mx = int(r["n"]), float(r["mn"]), float(r["mx"])
        for q in qs:
            st = {
                "lo": mn, "hi": mx, "k": max(1, math.ceil(q * n)),
                "cnt": n, "closed": True, "done": mn == mx,
            }
            if st["done"]:
                st["value"] = mn
            state[(key, q)] = st

    def _two_float(st: dict) -> bool:
        return np.nextafter(st["lo"], st["hi"]) >= st["hi"]

    def _group_values(b: pa.Table) -> dict[str, np.ndarray]:
        df = b.select([key_col, value_col]).to_pandas()
        v = df[value_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        ks = df[key_col].astype(str).to_numpy()[ok]
        vv = v[ok]
        if not len(ks):  # empty block / all-NaN batch
            return {}
        order = np.argsort(ks, kind="stable")
        ks, vv = ks[order], vv[order]
        cuts = np.flatnonzero(
            np.concatenate(([True], ks[1:] != ks[:-1]))
        )
        out = {}
        for i, s in enumerate(cuts):
            e = cuts[i + 1] if i + 1 < len(cuts) else len(ks)
            out[ks[s]] = vv[s:e]
        return out

    rounds = 0
    while True:
        # degenerate tie brackets: count values == lo (one shared pass)
        ties = [
            bk for bk, st in state.items()
            if not st["done"] and _two_float(st)
        ]
        if ties:
            specs = tuple(
                (bk[0], state[bk]["lo"], state[bk]["hi"], state[bk]["closed"])
                for bk in ties
            )

            def tie_partial(b: pa.Table, specs=specs) -> pa.Table:
                gv = _group_values(b)
                cnts = []
                for key, lo, hi, cl in specs:
                    v = gv.get(key)
                    cnts.append(
                        int((_in_bracket(v, lo, hi, cl) == lo).sum())
                        if v is not None else 0
                    )
                return pa.table(
                    {
                        "bid": pa.array(
                            np.arange(len(specs), dtype=np.int64)
                        ),
                        "c": pa.array(np.asarray(cnts, dtype=np.int64)),
                    }
                )

            def tie_fold(b: pa.Table) -> pa.Table:
                df = b.to_pandas()
                g = df.groupby("bid", sort=True)["c"].sum().reset_index()
                return pa.table(
                    {
                        "bid": pa.array(g["bid"].to_numpy(dtype=np.int64)),
                        "c": pa.array(g["c"].to_numpy(dtype=np.int64)),
                    }
                )

            rows = two_level_fold(
                ds.map_batches(tie_partial, batch_format="pyarrow"), tie_fold
            ).take_all()
            by_bid = {int(r["bid"]): int(r["c"]) for r in rows}
            for i, bk in enumerate(ties):
                st = state[bk]
                n_lo = by_bid.get(i, 0)
                st["value"] = st["lo"] if st["k"] <= n_lo else st["hi"]
                st["done"] = True

        active = [
            bk for bk, st in state.items()
            if not st["done"] and st["cnt"] > collect_threshold
        ]
        if not active or rounds >= max_rounds:
            break
        rounds += 1
        specs = tuple(
            (bk[0], state[bk]["lo"], state[bk]["hi"], state[bk]["closed"])
            for bk in active
        )
        edges = [np.linspace(lo, hi, bins + 1) for (_k, lo, hi, _c) in specs]

        def hist_partial(b: pa.Table, specs=specs, edges=edges) -> pa.Table:
            gv = _group_values(b)
            hists = []
            for i, (key, lo, hi, cl) in enumerate(specs):
                v = gv.get(key)
                if v is None:
                    hists.append(np.zeros(bins, dtype=np.int64))
                    continue
                iv = _in_bracket(v, lo, hi, cl)
                cell = np.clip(
                    np.searchsorted(edges[i], iv, side="right") - 1,
                    0, bins - 1,
                )
                hists.append(np.bincount(cell, minlength=bins).astype(np.int64))
            return pa.table(
                {
                    "bid": pa.array(np.arange(len(specs), dtype=np.int64)),
                    "h": pa.array(list(hists), type=pa.list_(pa.int64())),
                }
            )

        def hist_fold(b: pa.Table) -> pa.Table:
            bid = np.asarray(b["bid"], dtype=np.int64)
            hs = [np.asarray(x, dtype=np.int64) for x in b["h"].to_pylist()]
            ub = np.unique(bid)
            out = []
            m = np.stack(hs) if hs else np.zeros((0, bins), dtype=np.int64)
            for u in ub:
                out.append(m[bid == u].sum(axis=0))
            return pa.table(
                {
                    "bid": pa.array(ub),
                    "h": pa.array(out, type=pa.list_(pa.int64())),
                }
            )

        rows = two_level_fold(
            ds.map_batches(hist_partial, batch_format="pyarrow"), hist_fold
        ).take_all()
        by_bid = {
            int(r["bid"]): np.asarray(r["h"], dtype=np.int64) for r in rows
        }
        for i, (key, lo, hi, cl) in enumerate(specs):
            st = state[active[i]]
            hist = by_bid.get(i, np.zeros(bins, dtype=np.int64))
            cum = np.cumsum(hist)
            cell = int(np.searchsorted(cum, st["k"]))
            e = edges[i]
            below = int(cum[cell - 1]) if cell > 0 else 0
            st["k"] -= below
            st["lo"], st["hi"] = float(e[cell]), float(e[cell + 1])
            st["closed"] = cl and (cell == bins - 1)
            st["cnt"] = int(hist[cell])
            if st["lo"] == st["hi"]:
                st["value"] = st["lo"]
                st["done"] = True

    unresolved = [bk for bk, st in state.items() if not st["done"]]
    for bk in unresolved:
        if state[bk]["cnt"] > 10 * collect_threshold:
            raise RuntimeError(
                f"grouped_quantile_select: bracket {bk} still holds "
                f"{state[bk]['cnt']} rows after {max_rounds} rounds"
            )
    if unresolved:
        specs = tuple(
            (bk[0], state[bk]["lo"], state[bk]["hi"], state[bk]["closed"])
            for bk in unresolved
        )

        def collect(b: pa.Table, specs=specs) -> pa.Table:
            gv = _group_values(b)
            bids, vals = [], []
            for i, (key, lo, hi, cl) in enumerate(specs):
                v = gv.get(key)
                if v is None:
                    continue
                iv = _in_bracket(v, lo, hi, cl)
                bids.append(np.full(len(iv), i, dtype=np.int64))
                vals.append(iv)
            return pa.table(
                {
                    "bid": pa.array(
                        np.concatenate(bids) if bids else
                        np.zeros(0, dtype=np.int64)
                    ),
                    "value": pa.array(
                        np.concatenate(vals) if vals else
                        np.zeros(0, dtype=np.float64),
                        type=pa.float64(),
                    ),
                }
            )

        rows = ds.map_batches(collect, batch_format="pyarrow").take_all()
        by_bid_v: dict[int, list[float]] = {
            i: [] for i in range(len(unresolved))
        }
        for r in rows:
            by_bid_v[int(r["bid"])].append(float(r["value"]))
        for i, bk in enumerate(unresolved):
            st = state[bk]
            vals = np.sort(np.asarray(by_bid_v[i], dtype=np.float64))
            st["value"] = float(vals[st["k"] - 1])
            st["done"] = True

    keys_sorted = sorted({bk[0] for bk in state})
    return pa.table(
        {
            key_col: pa.array(
                [k for k in keys_sorted for _ in qs], pa.string()
            ),
            "q": pa.array(
                [q for _k in keys_sorted for q in qs], pa.float64()
            ),
            "value": pa.array(
                [state[(k, q)]["value"] for k in keys_sorted for q in qs],
                pa.float64(),
            ),
        }
    ).cast(out_schema)

# ---------------------------------------------------------------------------
# grouped exact selection — UNBOUNDED key domains via one co-group
# ---------------------------------------------------------------------------

def grouped_quantile_cogroup(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5,),
) -> ray.data.Dataset:
    """Exact per-group ``quantile_disc`` for UNBOUNDED int64 key domains
    — the complement of :func:`grouped_quantile_select` (which refines
    a BOUNDED group set in shared passes with zero data movement): here
    the key domain may grow with the corpus (users, sessions, hosts),
    so each group's values co-locate once via ONE key-hash co-group
    exchange of narrow (key, value) rows and a fully vectorized
    partition kernel selects every group's k-th elements (one lexsort,
    ``np.unique``-style group starts, per-quantile gather — no per-group
    python).  Nothing reaches the driver; the output Dataset holds
    |groups| x |quantiles| rows distributed across partitions.

    Same rank rule as the family (k = ceil(q·n), NaN excluded), DuckDB
    ``percentile_disc`` verified.  Exchange payload is 16 bytes/row —
    at 100 TB this is the standard narrow-projection shuffle, identical
    in shape to the dedup digest exchanges (stages/dedup.py
    ``_cogrouped``, whose bundling-not-repartition rationale applies
    verbatim)."""
    qs = sorted(set(float(q) for q in quantiles))
    out_schema = pa.schema(
        [(key_col, pa.int64()), ("q", pa.float64()), ("value", pa.float64())]
    )

    import pandas as pd
    import pyarrow.compute as pc

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: pc.cast(b[key_col], pa.int64()),
                value_col: pc.cast(b[value_col], pa.float64()),
            }
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        k = df[key_col].to_numpy(dtype=np.int64)
        v = df[value_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        k, v = k[ok], v[ok]
        if not len(k):
            return out_schema.empty_table()
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1]))
        )
        ends = np.append(starts[1:], len(k))
        counts = (ends - starts).astype(np.int64)
        keys = k[starts]
        out_k, out_q, out_v = [], [], []
        for q in qs:
            ranks = np.maximum(
                1, np.ceil(q * counts).astype(np.int64)
            )
            out_k.append(keys)
            out_q.append(np.full(len(keys), q, dtype=np.float64))
            out_v.append(v[starts + ranks - 1])
        return pa.table(
            {
                key_col: pa.array(np.concatenate(out_k)),
                "q": pa.array(np.concatenate(out_q)),
                "value": pa.array(np.concatenate(out_v)),
            },
            schema=out_schema,
        )

    # the key-hash co-group exchange is dedup's _cogrouped verbatim
    # (coalesce-narrow bundling + key mod P partitions) — reuse it
    from docling_api_ray.stages.dedup import _cogrouped

    narrow = ds.select_columns([key_col, value_col]).map_batches(
        project, batch_format="pyarrow"
    )
    return _cogrouped(narrow, key_col).map_groups(
        fold, batch_format="pandas"
    )


def skyline_max2(
    ds: ray.data.Dataset,
    *,
    x_col: str,
    y_col: str,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Pareto frontier (2-D skyline, maximize both columns) — the
    "no document is both longer AND higher-quality" selection set a
    curation run keeps when two desiderata trade off.

    Dominance: a row is dropped iff some other row is >= on both
    dimensions and strictly > on at least one; exact-duplicate points
    all survive (neither strictly dominates).

    Scale shape: the skyline operator is a textbook associative,
    IDEMPOTENT fold — skyline(A ∪ B) = skyline(skyline(A) ∪
    skyline(B)) — so it rides ``two_level_fold``: every batch reduces
    to its local frontier with one vectorized grouped-max scan (sort by
    x desc, prefix-strict-max of y), bundles fold pairwise, and only
    the final frontier (bounded by the distinct-x domain of surviving
    points, corpus-independent for quantized metrics) reaches one
    block.  No shuffle, no driver state.

    Output: (id, x, y) — frontier rows only."""
    from docling_api_ray.stages.common import two_level_fold

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            (x_col, pa.int64()),
            (y_col, pa.float64()),
        ]
    )

    def fold(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        ids = np.asarray(b[id_col], dtype=np.int64)
        x = np.asarray(b[x_col], dtype=np.int64)
        y = np.asarray(b[y_col], dtype=np.float64)
        # group rows by distinct x descending; a row survives iff its y
        # equals its x-group max AND that max strictly exceeds every
        # higher-x group's max (>= from a higher x dominates)
        order = np.lexsort((ids, -y, -x))
        xs, ys = x[order], y[order]
        grp_start = np.concatenate(([True], xs[1:] != xs[:-1]))
        gidx = np.cumsum(grp_start) - 1  # group ordinal per sorted row
        gmax = ys[grp_start]  # first row of each x-group = its max y
        # strict running max of y over strictly-greater x groups
        prev = np.concatenate(
            ([-np.inf], np.maximum.accumulate(gmax)[:-1])
        )
        keep_grp = gmax > prev
        keep = keep_grp[gidx] & (ys == gmax[gidx])
        sel = order[keep]
        return pa.table(
            {
                id_col: pa.array(ids[sel]),
                x_col: pa.array(x[sel]),
                y_col: pa.array(y[sel]),
            }
        )

    return two_level_fold(
        ds.select_columns([id_col, x_col, y_col]), fold
    )


def winsorize_column(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    out_col: str | None = None,
) -> ray.data.Dataset:
    """Winsorization — the robust-normalization pass a curation pipeline
    runs before score-threshold training: clip ``value_col`` to its
    exact [lo_q, hi_q] quantile band so a handful of pathological
    documents cannot drag a z-score or a learned threshold.

    EXACT: the two thresholds come from the distributed selection
    machinery above (``quantile_select`` — quantile_disc semantics, no
    sketch), then ONE stateless vectorized clip pass appends
    ``out_col``.  The SQL mirror is least/greatest against the same
    quantile_disc scalars, so values match bit-for-bit.  Scale shape:
    the threshold pass is the documented ~4-streaming-pass selection;
    the clip is embarrassingly parallel; nothing driver-side but two
    scalars."""
    out_col = out_col or f"{value_col}_w"
    th = quantile_select(ds, value_col=value_col, quantiles=(lo_q, hi_q))
    vals = {float(r["q"]): float(r["value"]) for r in th.to_pylist()}
    if not vals:  # empty input — pass through with the typed new column
        lo = hi = 0.0
    else:
        lo, hi = vals[float(lo_q)], vals[float(hi_q)]

    def clip(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value_col], dtype=np.float64)
        return b.append_column(
            out_col, pa.array(np.clip(v, lo, hi), type=pa.float64())
        )

    return ds.map_batches(clip, batch_format="pyarrow")


def token_budget_select(
    ds: ray.data.Dataset,
    *,
    budget: int,
    score_col: str = "score_micro",
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    max_hist_rows: int = 4_000_000,
    max_tie_rows: int = 4_000_000,
) -> pa.Table:
    """Data selection under a TOKEN BUDGET: admit whole documents in
    (score DESC, id ASC) order until the next doc would overflow
    ``budget`` tokens — the greedy quality-first fill behind "train on
    the best B tokens of this corpus" (the selection step of
    quality-gated pretraining mixes).

    Because weights are non-negative the admitted set is exactly
    {rows with running-sum ≤ budget} under that order — the SQL
    window mirror's WHERE cw <= B.

    Scale shape: NO global sort.  (1) ONE bounded (score → Σweight,
    count) histogram fold (value-domain-proportional, loud
    ``max_hist_rows`` guard) finds the BOUNDARY score layer t: every
    layer strictly above t fits entirely; layer t is the first that
    does not.  (2) Only layer t's rows are pulled — a streaming
    equality filter, bounded by the tie population (loud
    ``max_tie_rows`` guard; the escape for a degenerate all-one-score
    corpus is an id-bucketed prefix-sum over the layer) — and admitted
    id-ascending into the remaining budget.  All arithmetic is
    Python-int.  Output: ONE summary row (budget, n_selected,
    tokens_selected, threshold_micro = min admitted score, NULL when
    nothing fits)."""
    hist = bounded_groupby_sum(
        ds.select_columns([score_col, weight_col]),
        [score_col],
        sum_cols={"w": weight_col},
        count_alias="cnt",
    ).take_all()
    if len(hist) > max_hist_rows:
        raise ValueError(
            f"token_budget_select: {len(hist):,} distinct scores > "
            f"max_hist_rows={max_hist_rows:,} — bucket the score or "
            "raise the guard"
        )
    hist.sort(key=lambda r: -int(r[score_col]))
    budget = int(budget)
    cum_w = 0
    n_sel = 0
    threshold = None
    boundary = None  # (score, remaining_budget)
    for r in hist:
        w, c, sc = int(r["w"]), int(r["cnt"]), int(r[score_col])
        if cum_w + w <= budget:
            cum_w += w
            n_sel += c
            threshold = sc  # layers walk score-descending: last = min
        else:
            boundary = (sc, budget - cum_w)
            break
    if boundary is not None:
        t, remaining = boundary
        # project BEFORE the filter (projection AFTER a fused
        # empty-input filter chain re-emits the unprojected schema and
        # trips the executor's schema-mismatch warning — see the
        # test_no_schema_warnings sweep): the boundary pull must not
        # ship payload columns (text!) to the driver — max_tie_rows
        # bounds ROWS, and only the three narrow columns keep that a
        # byte bound too
        tie = (
            ds.select_columns([id_col, weight_col, score_col])
            .filter(expr=f"{score_col} == {t}")
            .take_all()
        )
        if len(tie) > max_tie_rows:
            raise ValueError(
                f"token_budget_select: boundary layer {t} has "
                f"{len(tie):,} rows > max_tie_rows={max_tie_rows:,} — "
                "wire the id-bucketed prefix-sum escape"
            )
        tie.sort(key=lambda r: int(r[id_col]))
        for r in tie:
            w = int(r[weight_col])
            if cum_w + w > budget:
                # ordering is a strict prefix: the first overflow ends
                # admission even if a later lighter doc would fit —
                # identical to the mirror's monotone running-sum cut
                break
            cum_w += w
            n_sel += 1
            threshold = t
    return pa.table(
        {
            "budget": pa.array([budget], type=pa.int64()),
            "n_selected": pa.array([n_sel], type=pa.int64()),
            "tokens_selected": pa.array([cum_w], type=pa.int64()),
            "threshold_micro": pa.array([threshold], type=pa.int64()),
        }
    )
