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
import pyarrow.compute as pc

import ray.data

from docling_api_ray.stages.common import (
    bounded_groupby_sum,
    coalesce_narrow,
    guard_fold,
)


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
        ).replace_schema_metadata(None)

    # the histogram fold already ends in one small block; the quantile
    # extraction is a single vectorized pass over it
    return hist.map_batches(
        lambda b: extract(b.to_pandas()),
        batch_format="pyarrow",
        batch_size=None,
    )


def global_rank(
    ds: ray.data.Dataset,
    *,
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    bins: int | None = None,
) -> ray.data.Dataset:
    """Exact global rank + percentile of every row by
    ``(value desc, id asc)`` — the curriculum-ordering / size-percentile
    assignment of a training-data pipeline — WITHOUT a full distributed
    sort-merge.

    Shape: rank(d) = |{v' > v}| + |{same v, smaller id}| + 1.

    1. **histogram pass** — bounded ``value``-domain groupby count
       (domain is value-range-bounded, not corpus-bounded); the driver
       prefix-sums it descending into cum_greater[v] and broadcasts the
       map once (``ray.put``).
    2. **tie-rank exchange** — ONE all-to-all of the minimal
       (id, value) payload hashed by ``value``: inside a partition every
       row with a given value is present, so the tie rank is a stable
       in-partition sort + cumcount.  A pathologically hot value (e.g.
       billions of empty docs) concentrates in one partition; the escape
       hatch is the packing-style id-bucketed prefix-sum for that one
       value's tie ranks — not wired because tie populations in real
       corpora are small.

    Output: (id, value, doc_rank int64 1-based, percentile = rank / N)."""
    import pandas as pd

    from docling_api_ray.stages.common import shuffle_partitions

    hist = ds.groupby(value_col).count().take_all()  # value-bounded rows
    hist.sort(key=lambda r: -r[value_col])
    n_total = sum(r["count()"] for r in hist)
    cum, acc = {}, 0
    for r in hist:
        cum[r[value_col]] = acc  # strictly-greater count
        acc += r["count()"]
    ref = ray.put(cum)

    def add_part(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value_col], dtype=np.int64)
        return b.select([id_col, value_col]).append_column(
            "__part",
            pa.array(np.abs(v * 2654435761 % 2**31) % shuffle_partitions(),
                     type=pa.int64()),
        )

    def tie_rank(df: "pd.DataFrame") -> pa.Table:
        cum_ = ray.get(ref)
        df = df.sort_values([value_col, id_col], kind="stable")
        tie = df.groupby(value_col, sort=False).cumcount().to_numpy()
        rank = (
            df[value_col].map(cum_).to_numpy(dtype=np.int64) + tie + 1
        )
        cols = {
            id_col: pa.array(df[id_col].to_numpy()),
            value_col: pa.array(df[value_col].to_numpy(), type=pa.int64()),
            "doc_rank": pa.array(rank, type=pa.int64()),
            "percentile": pa.array(
                rank.astype(np.float64) / float(n_total), type=pa.float64()
            ),
        }
        if bins is not None:
            # equal-population curriculum bin — NTILE-free exact integer
            # formula over the already-exact rank: bin i gets rows with
            # (rank-1)*bins // N == i (the SQL mirror is the identical
            # expression, so no NTILE remainder-distribution semantics
            # to reproduce)
            cols["bin"] = pa.array(
                (rank - 1) * bins // n_total, type=pa.int64()
            )
        return pa.table(cols)

    return (
        coalesce_narrow(ds.map_batches(add_part, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(tie_rank), batch_format="pandas")
    )


def grouped_entropy(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    label_col: str = "lang",
) -> ray.data.Dataset:
    """Shannon entropy of the ``label`` distribution within each
    ``group`` — the corpus-health metric behind "is source X
    single-language or a crawl soup?".

    H = ln(n) - (sum_i c_i*ln(c_i)) / n, computed from the bounded
    (group x label) count table (``bounded_groupby_sum`` — the shuffle
    moves <=|domain| rows per block).  The inner sum is made
    ORDER-FREE by quantizing each term to int64 micro units
    (round(c*ln(c)*1e6)) before summation, so engine and SQL oracle
    agree bit-for-bit regardless of reduction order; the outer
    expression is two deterministic float ops on identical operands.

    Output: (group, n_docs, n_langs, s_micro, entropy)."""
    counts = bounded_groupby_sum(
        ds, [group_col, label_col], count_alias="n"
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(group_col, sort=True)
        n_docs = g["n"].sum().astype(np.int64)
        n_langs = g["n"].size().astype(np.int64)
        c = df["n"].to_numpy(np.float64)
        term = np.rint(c * np.log(c) * 1e6).astype(np.int64)
        s_micro = (
            pd.Series(term, index=df.index).groupby(df[group_col]).sum()
        ).astype(np.int64)
        ent = np.log(n_docs.to_numpy(np.float64)) - s_micro.to_numpy(
            np.float64
        ) / (n_docs.to_numpy(np.float64) * 1e6)
        return pa.table(
            {
                group_col: pa.array(n_docs.index.tolist(), type=pa.string()),
                "n_docs": pa.array(n_docs.to_numpy(), type=pa.int64()),
                "n_langs": pa.array(n_langs.to_numpy(), type=pa.int64()),
                "s_micro": pa.array(s_micro.to_numpy(), type=pa.int64()),
                "entropy": pa.array(ent, type=pa.float64()),
            }
        )

    # the count table is domain-bounded — one final fold block is exact
    # and tiny
    return counts.repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None
    )


def grouped_zscore(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-group z-score normalization of an integer metric — the
    feature-standardization pass of a curation pipeline (compare
    document sizes ACROSS sources on one scale), computed from
    integer-exact group moments.

    Shape: one bounded-domain fold collects per-group (n, Σx, Σx²)
    int64 moments (``bounded_groupby_sum`` — the shuffle moves
    ≤|groups| rows per block); the tiny moment table broadcasts into a
    stateless second pass.  Exactness: z = (x·n − S) / √(n·SS − S²)
    — every operand is an exact int64 (< 2^53, so the int→double casts
    are exact; at 10¹⁰⁺-row groups the moments outgrow int64 and the
    fold switches to float128/HUGEINT — documented bound), and the
    final expression is two IEEE ops the SQL oracle evaluates
    identically.  Zero-variance groups emit z = 0."""
    from docling_api_ray.stages.common import bounded_groupby_sum, coalesce_narrow

    def add_sq(b: pa.Table) -> pa.Table:
        x = np.asarray(b[value_col], dtype=np.int64)
        return pa.table(
            {
                group_col: b[group_col],
                "x": pa.array(x, type=pa.int64()),
                "xx": pa.array(x * x, type=pa.int64()),
            }
        )

    moments = {
        r[group_col]: (int(r["n"]), int(r["s"]), int(r["ss"]))
        for r in bounded_groupby_sum(
            ds.map_batches(add_sq, batch_format="pyarrow").select_columns(
                [group_col, "x", "xx"]
            ),
            [group_col],
            sum_cols={"s": "x", "ss": "xx"},
            count_alias="n",
        ).take_all()
    }

    def zmap(b: pa.Table) -> pa.Table:
        m = moments
        groups = b[group_col].to_pylist()
        x = np.asarray(b[value_col], dtype=np.int64)
        n = np.fromiter((m[g][0] for g in groups), dtype=np.int64,
                        count=len(groups))
        s = np.fromiter((m[g][1] for g in groups), dtype=np.int64,
                        count=len(groups))
        ss = np.fromiter((m[g][2] for g in groups), dtype=np.int64,
                         count=len(groups))
        var_n2 = n * ss - s * s  # n² · variance, exact int64
        num = (x * n - s).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(
                var_n2 > 0, num / np.sqrt(var_n2.astype(np.float64)), 0.0
            )
        return pa.table(
            {
                id_col: b[id_col],
                group_col: b[group_col],
                value_col: pa.array(x, type=pa.int64()),
                "z": pa.array(z, type=pa.float64()),
            }
        )

    return ds.map_batches(zmap, batch_format="pyarrow")


def robust_stats_by_group(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    value_col: str,
    trim: float = 0.05,
) -> ray.data.Dataset:
    """Outlier-robust location stats per group — exact median, MAD
    (median absolute deviation) and ``trim``-trimmed mean over an
    integer value column: the heavy-tail-safe summary a quality
    dashboard wants where plain means are dragged by mega-docs.

    Scale shape: identical to ``grouped_int_quantiles`` — ONE bounded
    (group × value)-domain histogram fold (value domain is range-
    bounded, not corpus-bounded), then every statistic extracts from
    histogram cumsums in a single small-block pass: median and MAD by
    the ceil-rank rule (MAD re-histograms |v−med| driver-side — a
    rearrangement of the same counts), the trimmed mean by clipping
    each bucket's rank span to [t+1, n−t].  Raw rows never concentrate
    anywhere."""
    hist = bounded_groupby_sum(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col],
        count_alias="cnt",
    )

    def _rank_value(vals: np.ndarray, cnts: np.ndarray, k: int) -> int:
        cum = np.cumsum(cnts)
        return int(vals[np.searchsorted(cum, max(1, k))])

    def extract(df: pd.DataFrame) -> pa.Table:
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            sub = sub.sort_values(value_col, kind="stable")
            vals = sub[value_col].to_numpy(dtype=np.int64)
            cnts = sub["cnt"].to_numpy(dtype=np.int64)
            n = int(cnts.sum())
            med = _rank_value(vals, cnts, math.ceil(0.5 * n))
            # MAD: histogram of |v - med| (same counts, re-bucketed)
            dev = np.abs(vals - med)
            order = np.argsort(dev, kind="stable")
            dvals, dcnts = dev[order], cnts[order]
            # merge equal deviations so the cum ranks are well-defined
            uq, inv = np.unique(dvals, return_inverse=True)
            mc = np.zeros(len(uq), dtype=np.int64)
            np.add.at(mc, inv, dcnts)
            mad = _rank_value(uq, mc, math.ceil(0.5 * n))
            # trimmed mean: clip each bucket's rank span to [t+1, n-t]
            t = int(math.floor(trim * n))
            lo, hi = t + 1, n - t
            cum = np.cumsum(cnts)
            prev = np.concatenate(([0], cum[:-1]))
            take = np.minimum(cum, hi) - np.maximum(prev, lo - 1)
            take = np.maximum(take, 0)
            cnt = int(take.sum())
            s = int((vals * take).sum())
            tm = float(np.rint(s / cnt * 1e6) / 1e6) if cnt else 0.0
            rows.append(
                {
                    group_col: g,
                    "median": med,
                    "mad": mad,
                    "trimmed_mean": tm,
                }
            )
        out = pd.DataFrame(rows)
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [
                    (group_col, pa.string()),
                    ("median", pa.int64()),
                    ("mad", pa.int64()),
                    ("trimmed_mean", pa.float64()),
                ]
            ),
            preserve_index=False,
        ).replace_schema_metadata(None)

    return hist.map_batches(
        lambda b: extract(b.to_pandas()),
        batch_format="pyarrow",
        batch_size=None,
    )


def grouped_percent_rank(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    max_hist_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """SQL ``percent_rank() OVER (PARTITION BY group ORDER BY value)``
    with ZERO data movement beyond one bounded (group x value)
    histogram: RANK semantics share a rank across ties, so no per-row
    tiebreak exchange exists at all (contrast ``global_rank``'s
    row_number tie pass).  The per-group ascending prefix — count of
    strictly-smaller values — broadcasts once via ``ray.put`` and a
    stateless streaming pass attaches ``(#less) / (N_g - 1)`` (0.0 for
    singleton groups, SQL's convention).  The single int/int double
    division is bit-identical to DuckDB's.

    100 TB shape: histogram rows are |groups| x |value domain| (both
    corpus-independent here), the prefix map is KBs, the corpus side is
    one map_batches.  ``max_hist_rows`` guards the bounded-domain
    contract loudly (review r4): a corpus-proportional value column
    (per-doc-unique ints, floats) must use global_rank-style tie
    machinery, not this histogram."""
    import pandas as pd

    hist = (
        ds.select_columns([group_col, value_col])
        .groupby([group_col, value_col])
        .count()
        .take_all()
    )
    if len(hist) > max_hist_rows:
        raise RuntimeError(
            f"grouped_percent_rank: {len(hist)} (group, value) cells "
            f"exceed max_hist_rows={max_hist_rows}; the value domain "
            "is not bounded"
        )
    by_g: dict[str, list[tuple[int, int]]] = {}
    for r in hist:
        by_g.setdefault(str(r[group_col]), []).append(
            (int(r[value_col]), int(r["count()"]))
        )
    lut: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    for g, pairs in by_g.items():
        pairs.sort()
        vals = np.fromiter((p[0] for p in pairs), dtype=np.int64,
                           count=len(pairs))
        cnts = np.fromiter((p[1] for p in pairs), dtype=np.int64,
                           count=len(pairs))
        less = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        lut[g] = (vals, less, int(cnts.sum()))
    ref = ray.put(lut)

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            (group_col, pa.string()),
            (value_col, pa.int64()),
            ("pct_rank", pa.float64()),
        ]
    )

    def attach(b: pa.Table) -> pa.Table:
        lut_ = ray.get(ref)
        ids = np.asarray(b[id_col], dtype=np.int64)
        v = np.asarray(b[value_col], dtype=np.int64)
        gs = np.asarray(b[group_col].to_pylist(), dtype=object)
        pct = np.zeros(len(v), dtype=np.float64)
        for g in pd.unique(gs):  # bounded group domain per batch
            m = gs == g
            vals, less, n = lut_[str(g)]
            idx = np.searchsorted(vals, v[m])
            if n > 1:
                pct[m] = less[idx] / (n - 1)
        return pa.table(
            {
                id_col: pa.array(ids),
                group_col: pa.array([str(x) for x in gs], pa.string()),
                value_col: pa.array(v),
                "pct_rank": pa.array(pct),
            },
            schema=out_schema,
        )

    return ds.select_columns([id_col, group_col, value_col]).map_batches(
        attach, batch_format="pyarrow"
    )


def grouped_ntile(
    ds: ray.data.Dataset,
    *,
    tiles: int = 4,
    group_col: str = "source",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    max_hist_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """SQL ``ntile(k) OVER (PARTITION BY group ORDER BY value, id)`` —
    the equal-population bucketing step of per-source curriculum /
    quality-band assignment, with SQL's exact remainder rule (the first
    ``n mod k`` tiles get the extra row).

    NTILE is row_number-based, so unlike ``grouped_percent_rank`` a tie
    among equal values must be broken (by ``id``).  Same split as
    ``global_rank``: the per-(group, value) strictly-less prefix and the
    per-group totals come from ONE bounded histogram broadcast, and the
    within-tie id-order comes from ONE minimal-payload exchange hashed
    by ``value`` — every row of a tie group lands in the same partition,
    where a stable in-partition sort + cumcount resolves it.  No
    corpus-wide sort; the exchange payload is (id, group, value).

    Output: (id, group, value, tile int64 1-based)."""
    import pandas as pd

    from docling_api_ray.stages.common import coalesce_narrow, shuffle_partitions

    hist = (
        ds.select_columns([group_col, value_col])
        .groupby([group_col, value_col])
        .count()
        .take_all()
    )
    if len(hist) > max_hist_rows:
        raise RuntimeError(
            f"grouped_ntile: {len(hist)} (group, value) cells exceed "
            f"max_hist_rows={max_hist_rows}; the value domain is not "
            "bounded"
        )
    hist.sort(key=lambda r: (str(r[group_col]), int(r[value_col])))
    less: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    for r in hist:
        g = str(r[group_col])
        acc = totals.get(g, 0)
        less[(g, int(r[value_col]))] = acc
        totals[g] = acc + int(r["count()"])
    ref = ray.put((less, totals))

    def add_part(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value_col], dtype=np.int64)
        return b.select([id_col, group_col, value_col]).append_column(
            "__part",
            pa.array(
                np.abs(v * 2654435761 % 2**31) % shuffle_partitions(),
                type=pa.int64(),
            ),
        )

    def tie_tile(df: "pd.DataFrame") -> pa.Table:
        less_, totals_ = ray.get(ref)
        df = df.sort_values([group_col, value_col, id_col], kind="stable")
        tie = (
            df.groupby([group_col, value_col], sort=False)
            .cumcount()
            .to_numpy(dtype=np.int64)
        )
        base = np.fromiter(
            (
                less_[(str(g), int(v))]
                for g, v in zip(df[group_col], df[value_col])
            ),
            dtype=np.int64,
            count=len(df),
        )
        rank = base + tie + 1  # 1-based row_number within the group
        n_g = df[group_col].map(totals_).to_numpy(dtype=np.int64)
        # SQL NTILE remainder rule: with q = n//k, r = n%k, the first r
        # tiles hold q+1 rows; branch on which region the rank falls in
        q, r = n_g // tiles, n_g % tiles
        cut = r * (q + 1)
        in_big = rank <= cut
        tile = np.where(
            in_big,
            (rank - 1) // np.maximum(q + 1, 1) + 1,
            r + (rank - cut - 1) // np.maximum(q, 1) + 1,
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy(dtype=np.int64)),
                group_col: pa.array(df[group_col].astype(str)),
                value_col: pa.array(
                    df[value_col].to_numpy(dtype=np.int64)
                ),
                "tile": pa.array(tile),
            }
        )

    return (
        coalesce_narrow(ds.map_batches(add_part, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(tie_tile), batch_format="pandas")
    )


_CORR_FEATS = ("n_chars", "n_words", "n_punct", "n_stop")


def feature_corr(ds: ray.data.Dataset, *, text_col: str = "text") -> pa.Table:
    """Pearson correlation matrix over the four raw text-count features
    (n_chars, n_words, n_punct, n_stop) — the corpus-profiling step that
    tells a curation run which quality signals are redundant before it
    weights them.

    Textbook distributed sufficient statistics: each batch reduces to
    the EXACT integer moment rows (count, per-feature sums, pairwise
    product sums — 1 + 4 + 10 rows) via vectorized regex-count kernels
    shared with quality_scores; partials tree-fold through
    ``bounded_groupby_sum`` (domain = 15 rows, corpus-independent).  The
    correlation itself is computed from the folded ints in exact Python
    arithmetic (num = n·Σxy − Σx·Σy etc. as unbounded ints), with ONE
    deterministic float expression per pair —
    ``floor(num/sqrt(d1·d2)·1e6 + 0.5)/1e6`` — that the DuckDB mirror
    reproduces op-for-op.  Zero-variance features define corr = 0.

    Overflow bound: per-doc products ≤ ~1e8 (counts ≤ 1e4), so int64
    partials hold to ~10¹⁰ docs; beyond that the partial splits into
    hi/lo limbs exactly like the gram-matrix note (stages/linalg.py).

    Output: (fx, fy, corr) for the 6 upper-triangle pairs."""
    from docling_api_ray.stages import text_analysis as ta
    from docling_api_ray.stages.common import bounded_groupby_sum

    k = len(_CORR_FEATS)
    schema = pa.schema(
        [("i", pa.int64()), ("j", pa.int64()), ("v", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return schema.empty_table()
        t = b[text_col]
        cols = np.stack(
            [
                np.asarray(pc.utf8_length(t), dtype=np.int64),
                np.asarray(ta._count(t, ta.WS_TOKEN_RE), dtype=np.int64),
                np.asarray(ta._count(t, ta.PUNCT_RE), dtype=np.int64),
                np.asarray(ta._count(t, ta.STOPWORD_RE), dtype=np.int64),
            ],
            axis=1,
        )
        ii, jj, vv = [-1], [-1], [len(b)]
        for a in range(k):
            ii.append(a)
            jj.append(-1)
            vv.append(int(cols[:, a].sum()))
        for a in range(k):
            for c in range(a, k):
                ii.append(a)
                jj.append(c)
                vv.append(int((cols[:, a] * cols[:, c]).sum()))
        return pa.table(
            {
                "i": pa.array(np.asarray(ii, dtype=np.int64)),
                "j": pa.array(np.asarray(jj, dtype=np.int64)),
                "v": pa.array(np.asarray(vv, dtype=np.int64)),
            }
        )

    folded = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"],
        sum_cols={"v": "v"},
    ).take_all()  # 15 rows, corpus-independent
    m = {(int(r["i"]), int(r["j"])): int(r["v"]) for r in folded}
    if not m:  # empty corpus: no moments, no correlations
        return pa.schema(
            [("fx", pa.string()), ("fy", pa.string()),
             ("corr", pa.float64())]
        ).empty_table()
    n = m[(-1, -1)]
    rows_fx, rows_fy, rows_corr = [], [], []
    for a in range(k):
        for c in range(a + 1, k):
            num = n * m[(a, c)] - m[(a, -1)] * m[(c, -1)]
            d1 = n * m[(a, a)] - m[(a, -1)] ** 2
            d2 = n * m[(c, c)] - m[(c, -1)] ** 2
            if d1 == 0 or d2 == 0:
                corr = 0.0
            else:
                corr = (
                    math.floor(
                        float(num)
                        / math.sqrt(float(d1) * float(d2))
                        * 1e6
                        + 0.5
                    )
                    / 1e6
                )
            rows_fx.append(_CORR_FEATS[a])
            rows_fy.append(_CORR_FEATS[c])
            rows_corr.append(corr)
    return pa.table(
        {
            "fx": pa.array(rows_fx, type=pa.string()),
            "fy": pa.array(rows_fy, type=pa.string()),
            "corr": pa.array(rows_corr, type=pa.float64()),
        }
    )


_OLS_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n", pa.int64()),
        ("sx", pa.int64()),
        ("sy", pa.int64()),
        ("sxx", pa.int64()),
        ("sxy", pa.int64()),
        ("syy", pa.int64()),
    ]
)

_OLS_OUT_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n_docs", pa.int64()),
        ("slope", pa.float64()),
        ("intercept", pa.float64()),
        ("r2", pa.float64()),
    ]
)


def grouped_ols(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    x_col: str = "n_chars",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-group simple linear regression of word count on ``x_col``
    (regr_slope / regr_intercept / r² analog) — the drift diagnostic a
    curation run uses to spot sources whose token density trends away
    from the corpus norm.

    Closed-form distributed OLS: each batch reduces to the EXACT
    integer moment rows (n, Σx, Σy, Σx², Σxy, Σy²) per group via one
    ``np.unique`` inverse + ``np.bincount`` sweep; partials tree-fold
    through ``bounded_groupby_sum`` (domain = |sources|,
    corpus-independent).  The final pass computes, per group, in a
    fixed float op order the DuckDB mirror spells identically:

        slope_raw     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)   [0 if den=0]
        intercept_raw = (Σy − slope_raw·Σx) / n
        r²_raw        = num² / (den_x·den_y)               [0 if any 0]

    each floor-quantized to 6 decimals.  All moment arithmetic is
    int64-exact (per-doc products ≤ ~1e8, safe to ~10¹⁰ docs/group;
    beyond that split hi/lo limbs per the gram-matrix note)."""
    from docling_api_ray.stages import text_analysis as ta
    from docling_api_ray.stages.common import bounded_groupby_sum

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _OLS_SCHEMA.empty_table()
        x = np.asarray(b[x_col], dtype=np.int64)
        y = np.asarray(ta._count(b[text_col], ta.WS_TOKEN_RE), dtype=np.int64)
        g = np.asarray(b[group_col])
        uniq, inv = np.unique(g, return_inverse=True)
        k = len(uniq)
        return pa.table(
            {
                "source": pa.array(uniq.tolist(), type=pa.string()),
                "n": pa.array(np.bincount(inv, minlength=k), type=pa.int64()),
                "sx": pa.array(
                    np.bincount(inv, weights=x, minlength=k).astype(np.int64)
                ),
                "sy": pa.array(
                    np.bincount(inv, weights=y, minlength=k).astype(np.int64)
                ),
                "sxx": pa.array(
                    np.bincount(inv, weights=x * x, minlength=k).astype(np.int64)
                ),
                "sxy": pa.array(
                    np.bincount(inv, weights=x * y, minlength=k).astype(np.int64)
                ),
                "syy": pa.array(
                    np.bincount(inv, weights=y * y, minlength=k).astype(np.int64)
                ),
            }
        )

    folded = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"],
        sum_cols={c: c for c in ("n", "sx", "sy", "sxx", "sxy", "syy")},
    )

    def fit(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _OLS_OUT_SCHEMA.empty_table()
        out = {c: [] for c in ("source", "n_docs", "slope", "intercept", "r2")}
        for i in range(len(b)):
            n = int(b["n"][i].as_py())
            sx, sy = int(b["sx"][i].as_py()), int(b["sy"][i].as_py())
            sxx, sxy = int(b["sxx"][i].as_py()), int(b["sxy"][i].as_py())
            syy = int(b["syy"][i].as_py())
            num = n * sxy - sx * sy  # exact unbounded ints
            den_x = n * sxx - sx * sx
            den_y = n * syy - sy * sy
            q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
            if den_x == 0:
                slope_raw = 0.0
            else:
                slope_raw = float(num) / float(den_x)
            intercept_raw = (float(sy) - slope_raw * float(sx)) / float(n)
            if den_x == 0 or den_y == 0:
                r2_raw = 0.0
            else:
                r2_raw = (float(num) * float(num)) / (
                    float(den_x) * float(den_y)
                )
            out["source"].append(b["source"][i].as_py())
            out["n_docs"].append(n)
            out["slope"].append(q6(slope_raw))
            out["intercept"].append(q6(intercept_raw))
            out["r2"].append(q6(r2_raw))
        return pa.table(
            {
                "source": pa.array(out["source"], type=pa.string()),
                "n_docs": pa.array(out["n_docs"], type=pa.int64()),
                "slope": pa.array(out["slope"], type=pa.float64()),
                "intercept": pa.array(out["intercept"], type=pa.float64()),
                "r2": pa.array(out["r2"], type=pa.float64()),
            }
        )

    return folded.map_batches(fit, batch_format="pyarrow")


_ETA_OUT_SCHEMA = pa.schema(
    [
        ("n_docs", pa.int64()),
        ("n_groups", pa.int64()),
        ("eta2", pa.float64()),
    ]
)


def grouped_eta2(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> pa.Table:
    """One-way ANOVA effect size η² = SS_between / SS_total of an
    integer value column across groups — "how much of document length
    does source explain", the variance-decomposition sanity check a
    mixture design runs before weighting sources.

    Exactness: per-group integer moments (n, Σx, Σx²) fold through
    ``bounded_groupby_sum`` (|groups| rows); the sums of squares are
    then formed from MICRO-QUANTIZED integer terms —
    ``t_g = ⌊Σx_g²·10⁶ / n_g⌋`` and ``t = ⌊(Σx)²·10⁶ / N⌋`` in unbounded
    Python ints — so SS_between = Σ t_g − t and SS_total = Σx²·10⁶ − t
    are EXACT integers with no float accumulation anywhere; the single
    final float division is floor-quantized to 6 decimals, mirrored
    op-for-op by HUGEINT floor-division SQL.  Zero total variance
    defines η² = 0."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    moment_schema = pa.schema(
        [
            ("g", pa.string()),
            ("n", pa.int64()),
            ("sx", pa.int64()),
            ("sxx", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return moment_schema.empty_table()
        x = np.asarray(b[value_col], dtype=np.int64)
        g = np.asarray(b[group_col])
        uniq, inv = np.unique(g, return_inverse=True)
        k = len(uniq)
        return pa.table(
            {
                "g": pa.array(uniq.tolist(), type=pa.string()),
                "n": pa.array(np.bincount(inv, minlength=k), type=pa.int64()),
                "sx": pa.array(
                    np.bincount(inv, weights=x, minlength=k).astype(np.int64)
                ),
                "sxx": pa.array(
                    np.bincount(inv, weights=x * x, minlength=k).astype(
                        np.int64
                    )
                ),
            }
        )

    folded = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["g"],
        sum_cols={c: c for c in ("n", "sx", "sxx")},
    ).take_all()  # |groups| rows, domain-bounded

    N = sum(int(r["n"]) for r in folded)
    SX = sum(int(r["sx"]) for r in folded)
    SXX = sum(int(r["sxx"]) for r in folded)
    t_all = (SX * SX * 1_000_000) // N if N else 0
    sb = sum(
        (int(r["sx"]) ** 2 * 1_000_000) // int(r["n"]) for r in folded
    ) - t_all
    st = SXX * 1_000_000 - t_all
    eta2 = (
        0.0
        if st == 0
        else math.floor(float(sb) / float(st) * 1e6 + 0.5) / 1e6
    )
    return pa.table(
        {
            "n_docs": pa.array([N], type=pa.int64()),
            "n_groups": pa.array([len(folded)], type=pa.int64()),
            "eta2": pa.array([eta2], type=pa.float64()),
        }
    )


def grouped_weighted_quantiles(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    value_col: str,
    weight_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> ray.data.Dataset:
    """Exact WEIGHTED quantiles per group over an integer value column
    with integer weights — e.g. the byte-weighted median document
    length: "the doc length the average stored byte lives in", the
    size-skew diagnostic a curation dashboard wants where the plain
    median under-weights mega-docs.

    Scale shape: identical to ``grouped_int_quantiles`` except the
    histogram fold sums the WEIGHT column instead of counting rows —
    one bounded ``(group × value) → Σweight`` fold (value-domain-
    bounded, never row-proportional), then a single small-block pass
    reads each quantile off the cumulative-weight curve.  Weighted
    ``percentile_disc`` semantics: the q-quantile is the smallest
    value whose cumulative weight reaches ``ceil(q * W)`` (W = total
    group weight), matching the SQL mirror's window-cumsum rule
    bit-for-bit."""
    hist = bounded_groupby_sum(
        ds.select_columns([group_col, value_col, weight_col]),
        [group_col, value_col],
        sum_cols={"w": weight_col},
    )

    def extract(df: pd.DataFrame) -> pa.Table:
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            sub = sub.sort_values(value_col, kind="stable")
            vals = sub[value_col].to_numpy(dtype=np.int64)
            cum = np.cumsum(sub["w"].to_numpy(dtype=np.int64))
            W = int(cum[-1]) if len(cum) else 0
            row = {group_col: g}
            for q in qs:
                if W <= 0:
                    # all-zero weights: no cumulative step ever reaches
                    # k — the mirror's window rule yields NULL, so emit
                    # None instead of indexing past the array
                    row[f"wq{int(round(q * 100))}"] = None
                    continue
                k = max(1, math.ceil(q * W))
                row[f"wq{int(round(q * 100))}"] = int(
                    vals[np.searchsorted(cum, k)]
                )
            rows.append(row)
        fields = [(group_col, pa.string())] + [
            (f"wq{int(round(q * 100))}", pa.int64()) for q in qs
        ]
        if not rows:
            return pa.schema(fields).empty_table()
        return pa.Table.from_pandas(
            pd.DataFrame(rows), schema=pa.schema(fields), preserve_index=False
        ).replace_schema_metadata(None)

    return hist.map_batches(
        lambda b: extract(b.to_pandas()),
        batch_format="pyarrow",
        batch_size=None,
    )


def spearman_corr(
    ds: ray.data.Dataset,
    *,
    x_col: str = "x",
    y_col: str = "y",
    max_distinct: int = 4_000_000,
) -> pa.Table:
    """EXACT Spearman rank correlation between two integer columns with
    average-rank tie handling — the monotone-association complement to
    the Pearson moment fold (``length_token_corr``): robust to the
    heavy-tailed length distributions where Pearson is dragged by
    mega-docs.

    Scale shape: ranks need no global sort.  Each marginal's
    value→average-rank map derives from its bounded value HISTOGRAM
    (``bounded_groupby_sum`` over the value domain — value-domain-
    proportional, never row-proportional; a loud ``max_distinct`` guard
    keeps the driver pull bounded).  With integer values the average
    rank is a half-integer, so DOUBLED ranks (2·prev_cum + cnt + 1) stay
    int64-exact; the broadcast lookup (one ``np.searchsorted`` per
    batch) feeds the same five-moment int64 tree fold as Pearson, and
    the final Pearson-on-ranks expression is replayed
    operation-for-operation by the SQL mirror.  Doubled-rank moments
    bound Σa² ≤ 4n³ — int64-exact to n ≈ 1.3e6 rows; past that the fold
    RAISES loudly (the 128-bit escape is the hi/lo 32-bit split the
    Pearson docstring names, or pyarrow decimal128 partials)."""
    hists = []
    for col in (x_col, y_col):
        h = bounded_groupby_sum(
            ds.select_columns([col]), [col], count_alias="cnt"
        ).take_all()
        if len(h) > max_distinct:
            raise ValueError(
                f"spearman_corr: {len(h):,} distinct {col} values > "
                f"max_distinct={max_distinct:,} — the rank map no longer "
                "broadcasts; bucket the value or raise the guard"
            )
        h.sort(key=lambda r: r[col])
        vals = np.array([r[col] for r in h], dtype=np.int64)
        cnts = np.array([r["cnt"] for r in h], dtype=np.int64)
        cum = np.cumsum(cnts)
        prev = np.concatenate(([0], cum[:-1]))
        r2 = 2 * prev + cnts + 1  # doubled average rank per tie group
        hists.append((vals, r2))
    (xv, xr2), (yv, yr2) = hists

    def moments(b: pa.Table) -> pa.Table:
        x = np.asarray(b[x_col], dtype=np.int64)
        y = np.asarray(b[y_col], dtype=np.int64)
        a = xr2[np.searchsorted(xv, x)]
        c = yr2[np.searchsorted(yv, y)]
        one = np.ones(len(b), dtype=np.int64)
        return pa.table(
            {
                "n": pa.array(one),
                "sa": pa.array(a),
                "sb": pa.array(c),
                "sab": pa.array(a * c),
                "saa": pa.array(a * a),
                "sbb": pa.array(c * c),
            }
        )

    def fold(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array(
                    [pc.sum(b[c]).as_py() or 0], type=pa.int64()
                )
                for c in ("n", "sa", "sb", "sab", "saa", "sbb")
            }
        )

    from docling_api_ray.stages.common import two_level_fold

    out = two_level_fold(
        ds.select_columns([x_col, y_col]).map_batches(
            moments, batch_format="pyarrow"
        ),
        fold,
    ).take_all()
    row = out[0]
    n = int(row["n"])
    if n > 1_300_000:
        raise ValueError(
            f"spearman_corr: n={n:,} rows overflow the int64 doubled-rank "
            "moment bound (4n^3); split partial sums hi/lo or use "
            "decimal128 accumulation"
        )
    nf, sa, sb = float(n), float(row["sa"]), float(row["sb"])
    sab, saa, sbb = float(row["sab"]), float(row["saa"]), float(row["sbb"])
    num = nf * sab - sa * sb
    va = nf * saa - sa * sa
    vb = nf * sbb - sb * sb
    prod = va * vb
    rho = num / math.sqrt(prod) if prod > 0 else 0.0
    return pa.table(
        {
            "n": pa.array([n], type=pa.int64()),
            "spearman": pa.array([rho], type=pa.float64()),
        }
    )


def contingency_association(
    ds: ray.data.Dataset,
    *,
    row_col: str = "lang",
    col_col: str = "source",
) -> pa.Table:
    """Association strength between two BOUNDED-domain label columns —
    mutual information, the chi-square independence statistic, and
    Cramer's V over the row x col contingency table: the "is lang
    confounded with crawl source?" audit a mixture designer runs before
    trusting per-source language statistics.

    Scale shape: one ``bounded_groupby_sum`` fold produces the nonzero
    contingency cells (<= |rows| x |cols|, domain-bounded); marginals,
    MI and chi-square all derive from that single tiny block.  Zero
    cells (which chi-square still charges e_ij each) are accounted in
    closed form: sum of e over ALL cells is n, so the zero-cell
    contribution is n - sum(e over nonzero cells) — no R x K
    enumeration.  Exactness: every per-cell term is micro-quantized to
    int64 (round(term * 1e6)) before the order-free integer sum, and
    each final double expression is replayed op-for-op by the SQL
    mirror (the lang_entropy precedent)."""
    counts = bounded_groupby_sum(
        ds.select_columns([row_col, col_col]), [row_col, col_col],
        count_alias="c",
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        out_schema = pa.schema(
            [
                ("n", pa.int64()),
                ("mi", pa.float64()),
                ("chi2", pa.float64()),
                ("cramers_v", pa.float64()),
            ]
        )
        if len(df) == 0:
            return pa.table(
                {"n": [0], "mi": [0.0], "chi2": [0.0], "cramers_v": [0.0]},
                schema=out_schema,
            )
        n = int(df["c"].sum())
        r = df.groupby(row_col)["c"].sum()
        k = df.groupby(col_col)["c"].sum()
        c = df["c"].to_numpy(np.float64)
        rm = df[row_col].map(r).to_numpy(np.float64)
        km = df[col_col].map(k).to_numpy(np.float64)
        nf = float(n)
        lr = (c * nf) / (rm * km)

        # round-half-AWAY-from-zero, matching DuckDB round(): the e and
        # (c−e)²/e terms are exact rationals that CAN land exactly on
        # .5 micro-units (e.g. n a power of two), where np.rint's
        # half-even rule would diverge from the mirror by 1 micro
        def _round_away(a: np.ndarray) -> np.ndarray:
            return np.where(
                a >= 0, np.floor(a + 0.5), np.ceil(a - 0.5)
            ).astype(np.int64)

        mi_micro = int(_round_away(c * np.log(lr) * 1e6).sum())
        e = rm * km / nf
        chi_nz = int(_round_away((c - e) * (c - e) / e * 1e6).sum())
        e_nz = int(_round_away(e * 1e6).sum())
        chi_total = chi_nz + (n * 1_000_000 - e_nz)
        mi = (float(mi_micro) / 1e6) / nf
        chi2 = float(chi_total) / 1e6
        dof = min(len(r), len(k)) - 1
        v = (
            math.sqrt(chi2 / (nf * float(dof)))
            if dof > 0 and chi_total > 0
            else 0.0
        )
        return pa.table(
            {"n": [n], "mi": [mi], "chi2": [chi2], "cramers_v": [v]},
            schema=out_schema,
        )

    blocks = counts.map_batches(
        lambda b: fold(b.to_pandas()), batch_format="pyarrow",
        batch_size=None,
    ).take_all()
    row = blocks[0]
    return pa.table(
        {
            "n": pa.array([row["n"]], type=pa.int64()),
            "mi": pa.array([row["mi"]], type=pa.float64()),
            "chi2": pa.array([row["chi2"]], type=pa.float64()),
            "cramers_v": pa.array([row["cramers_v"]], type=pa.float64()),
        }
    )


def grouped_gini(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> ray.data.Dataset:
    """Gini coefficient of an integer metric per group — "what share of
    this source's bytes live in its biggest documents?": the size-
    inequality diagnostic behind mixture reweighting (a source whose
    Gini ~ 1 is a few mega-docs wearing a source label).

    Exact WITHOUT per-row ranks: with the ascending (value, count)
    histogram, the rank-weighted sum Σ i·x_(i) telescopes per tie block
    to v · (c·prev + c·(c+1)/2) — all int64 — so one bounded
    ``(group × value)`` histogram fold carries everything and
    G = (2·S − (n+1)·T) / (n·T) (T = Σx) is two IEEE double ops the SQL
    mirror replays.  Σ i·x over n rows of values ≤ V needs n²·V —
    int64-exact to ~10⁵ rows × 1e8 value or 10⁹ × 1 (the escape past
    that is decimal128 partials); the extract RAISES past the bound
    instead of overflowing silently."""
    hist = bounded_groupby_sum(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col],
        count_alias="cnt",
    )

    def extract(df: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [
                (group_col, pa.string()),
                ("n", pa.int64()),
                ("total", pa.int64()),
                ("gini", pa.float64()),
            ]
        )
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            sub = sub.sort_values(value_col, kind="stable")
            v = sub[value_col].to_numpy(dtype=object)  # python ints: no silent overflow
            c = sub["cnt"].to_numpy(dtype=object)
            n = int(sum(c))
            total = int(sum(int(a) * int(b) for a, b in zip(v, c)))
            prev, s = 0, 0
            for vi, ci in zip(v, c):
                vi, ci = int(vi), int(ci)
                s += vi * (ci * prev + ci * (ci + 1) // 2)
                prev += ci
            if s > (1 << 62) or total * (n + 1) > (1 << 62):
                raise ValueError(
                    f"grouped_gini: group {g!r} rank-weighted sum {s:,} "
                    "exceeds the int64 exactness bound — switch the fold "
                    "to decimal128 partials"
                )
            gini = (
                (2.0 * float(s) - float(n + 1) * float(total))
                / (float(n) * float(total))
                if total > 0
                else 0.0
            )
            rows.append({group_col: g, "n": n, "total": total, "gini": gini})
        if not rows:
            return schema.empty_table()
        return pa.Table.from_pandas(
            pd.DataFrame(rows), schema=schema, preserve_index=False
        ).replace_schema_metadata(None)

    return hist.map_batches(
        lambda b: extract(b.to_pandas()),
        batch_format="pyarrow",
        batch_size=None,
    )


def grouped_roc_auc(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    score_col: str = "score_micro",
    pos_col: str = "pos",
    max_hist_rows: int = 4_000_000,
) -> ray.data.Dataset:
    """EXACT tie-aware ROC-AUC of an integer classifier score against a
    binary label, per group — the standard Mann-Whitney U equivalence
    (AUC = P(score_pos > score_neg) + ½·P(tie)).  The data-curation
    read: "does the quality classifier systematically separate class X
    inside each source?" — the filter-bias audit the C4/Gopher
    post-mortems run before trusting a quality gate.

    Exact without a global sort: AUC needs only the per-group
    (score → pos_count, neg_count) HISTOGRAM.  Walking it ascending,
    2·U = Σ_v pos_v · (2·neg_below_v + neg_v) counts wins twice and
    ties once — all integers, no midrank halves.  One
    ``bounded_groupby_sum`` over the (group × score) domain (value-
    domain-proportional, never row-proportional; loud ``max_hist_rows``
    guard), then an O(hist) driver-side fold in PYTHON ints (no silent
    int64 overflow at n² scale).  The final quantize is pure integer:
    auc_micro = (2·U2·10⁶ + D) // (2·D) with D = 2·n_pos·n_neg — the
    ⌊x+½⌋ the SQL mirror replays in HUGEINT.  Groups with a degenerate
    label (no positives or no negatives) emit no row, matching the
    mirror's HAVING.  Output: (group, n_pos, n_neg, auc) —
    auc = auc_micro / 1e6."""
    hist = bounded_groupby_sum(
        ds.select_columns([group_col, score_col, pos_col]),
        [group_col, score_col],
        sum_cols={"pos": pos_col},
        count_alias="cnt",
    )

    def extract(df: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [
                (group_col, pa.string()),
                ("n_pos", pa.int64()),
                ("n_neg", pa.int64()),
                ("auc", pa.float64()),
            ]
        )
        if len(df) > max_hist_rows:
            raise ValueError(
                f"grouped_roc_auc: {len(df):,} (group, score) histogram "
                f"rows > max_hist_rows={max_hist_rows:,} — bucket the "
                "score or raise the guard"
            )
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            sub = sub.sort_values(score_col, kind="stable")
            u2 = n_pos = n_neg = cum_neg = 0
            for p, c in zip(sub["pos"], sub["cnt"]):
                p, c = int(p), int(c)
                neg = c - p
                u2 += p * (2 * cum_neg + neg)
                cum_neg += neg
                n_pos += p
                n_neg += neg
            if n_pos == 0 or n_neg == 0:
                continue  # AUC undefined: mirror's HAVING drops it too
            d = 2 * n_pos * n_neg
            auc_micro = (2 * u2 * 1_000_000 + d) // (2 * d)
            rows.append(
                {
                    group_col: g,
                    "n_pos": n_pos,
                    "n_neg": n_neg,
                    "auc": float(auc_micro) / 1e6,
                }
            )
        if not rows:
            return schema.empty_table()
        return pa.Table.from_pandas(
            pd.DataFrame(rows), schema=schema, preserve_index=False
        ).replace_schema_metadata(None)

    return hist.map_batches(
        lambda b: extract(b.to_pandas()),
        batch_format="pyarrow",
        batch_size=None,
    )


def calibration_bins(
    ds: ray.data.Dataset,
    *,
    prob_micro_col: str = "prob_micro",
    pos_col: str = "pos",
    n_bins: int = 10,
) -> ray.data.Dataset:
    """Reliability-diagram calibration table for a probabilistic
    classifier: fixed probability bins (bin = min(⌊p·n_bins⌋,
    n_bins−1)), per bin the observed positive rate vs the mean
    predicted probability — "is prob=0.9 right 90% of the time?", the
    companion readout to grouped_roc_auc's discrimination.

    Scale shape: the bin is assigned vectorized per batch from the
    already-integer micro-probability, then ONE ``bounded_groupby_sum``
    over the n_bins-bounded domain (n, Σpos, Σprob_micro per bin).
    Exactness: Σprob_micro is an int64 sum (≤ 1e6·n — exact to ~9e12
    rows); frac_pos is a SINGLE int/int IEEE division and mean_prob is
    the two-op chain (Σprob_micro / 1e6) / n — both replayed in the
    same order by the SQL mirror, so no quantization is needed.
    Output: (bin, n, frac_pos, mean_prob), bins ascending,
    empty bins absent (matching the mirror's GROUP BY)."""
    nb = int(n_bins)

    def assign(b: pa.Table) -> pa.Table:
        pm = np.asarray(b[prob_micro_col], dtype=np.int64)
        pos = np.asarray(b[pos_col], dtype=np.int64)
        bins = np.minimum(pm * nb // 1_000_000, nb - 1)
        return pa.table(
            {
                "bin": pa.array(bins, type=pa.int64()),
                "pos": pa.array(pos, type=pa.int64()),
                "pm": pa.array(pm, type=pa.int64()),
            }
        )

    hist = bounded_groupby_sum(
        ds.select_columns([prob_micro_col, pos_col]).map_batches(
            assign, batch_format="pyarrow"
        ),
        ["bin"],
        sum_cols={"pos": "pos", "pm_sum": "pm"},
        count_alias="n",
    )

    def finish(b: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("bin", pa.int64()),
                ("n", pa.int64()),
                ("frac_pos", pa.float64()),
                ("mean_prob", pa.float64()),
            ]
        )
        if len(b) == 0:
            return schema.empty_table()
        bins = np.asarray(b["bin"], dtype=np.int64)
        n = np.asarray(b["n"], dtype=np.int64)
        pos = np.asarray(b["pos"], dtype=np.int64)
        pm = np.asarray(b["pm_sum"], dtype=np.int64)
        order = np.argsort(bins)
        return pa.table(
            {
                "bin": pa.array(bins[order], type=pa.int64()),
                "n": pa.array(n[order], type=pa.int64()),
                "frac_pos": pa.array(
                    pos[order] / n[order], type=pa.float64()
                ),
                "mean_prob": pa.array(
                    pm[order] / 1e6 / n[order], type=pa.float64()
                ),
            }
        )

    return hist.map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def grouped_ks_drift(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    value_col: str = "n_chars",
    max_hist_rows: int = 4_000_000,
) -> ray.data.Dataset:
    """EXACT two-sample Kolmogorov-Smirnov statistic of each group's
    value distribution against the REST of the corpus — "which source's
    length profile drifted?", the distribution-shift tripwire run before
    re-fitting mixture weights (KL/PSI need binning; KS is the
    assumption-free sup-norm).

    D_s = sup_v |F_s(v) − F_rest(v)| needs only the (group × value)
    HISTOGRAM: with cum_s(v) and the global cum(v), the numerator
    |cum_s·n_rest − (cum − cum_s)·n_s| is pure int64* walked over the
    sorted value grid, and D is ONE int/int IEEE division per group —
    no per-row ranks, no global sort, value-domain-proportional driver
    work behind a loud ``max_hist_rows`` guard.  (*numerator ≤ n_s·n_rest
    ≤ n²/4: Python-int driver arithmetic, no silent overflow.)
    Output: (group, n, n_rest, ks_d), groups with an empty complement
    (the only group) emit no row, matching the mirror's HAVING."""
    hist = bounded_groupby_sum(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col],
        count_alias="cnt",
    )

    def extract(df: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [
                (group_col, pa.string()),
                ("n", pa.int64()),
                ("n_rest", pa.int64()),
                ("ks_d", pa.float64()),
            ]
        )
        if len(df) > max_hist_rows:
            raise ValueError(
                f"grouped_ks_drift: {len(df):,} (group, value) histogram "
                f"rows > max_hist_rows={max_hist_rows:,} — bucket the "
                "value or raise the guard"
            )
        if len(df) == 0:
            return schema.empty_table()
        # global cumulative over the sorted value grid
        gv = df.groupby(value_col, sort=True)["cnt"].sum()
        grid = gv.index.to_numpy()
        gcum = gv.cumsum().to_numpy(dtype=object)
        n_tot = int(gcum[-1])
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            sub = sub.sort_values(value_col, kind="stable")
            n_s = int(sub["cnt"].sum())
            n_rest = n_tot - n_s
            if n_rest == 0:
                continue  # no complement: D undefined, mirror drops too
            # cum_s aligned to the full grid (step function carried
            # forward between this group's own value points)
            pos = np.searchsorted(grid, sub[value_col].to_numpy())
            cs = np.zeros(len(grid), dtype=object)
            cs[pos] = sub["cnt"].to_numpy(dtype=object)
            num = 0
            run = 0
            for i in range(len(grid)):
                run += int(cs[i])
                cand = abs(run * n_rest - (int(gcum[i]) - run) * n_s)
                if cand > num:
                    num = cand
            rows.append(
                {
                    group_col: g,
                    "n": n_s,
                    "n_rest": n_rest,
                    "ks_d": float(num) / float(n_s * n_rest),
                }
            )
        if not rows:
            return schema.empty_table()
        return pa.Table.from_pandas(
            pd.DataFrame(rows), schema=schema, preserve_index=False
        ).replace_schema_metadata(None)

    return hist.map_batches(
        lambda b: extract(b.to_pandas()),
        batch_format="pyarrow",
        batch_size=None,
    )


def grouped_psi(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    prob_micro_col: str = "prob_micro",
    n_bins: int = 10,
) -> ray.data.Dataset:
    """Population Stability Index of a micro-quantized probability
    score per group vs the REST of the corpus — the standard model-
    monitoring drift metric (PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over
    fixed score bins), next to ``grouped_ks_drift``'s assumption-free
    sup-norm: PSI weights WHERE the mass moved, KS only how far the
    CDFs diverge.

    Fixed bins (min(⌊p·n_bins⌋, n_bins−1)) and +1 Laplace smoothing on
    both sides keep every term finite and deterministic.  Scale shape:
    ONE ``bounded_groupby_sum`` over the (group × bin) domain, then an
    O(|groups|·n_bins) driver fold.  Exactness: each bin's term is
    nano-quantized (rint(term·1e9), int64) BEFORE the order-free sum —
    the kl_by_group discipline — and the float chain
    (c+1)/(n+B) is replayed operand-for-operand by the SQL mirror.
    Groups with an empty complement emit no row.  Output:
    (group, n, n_rest, s_nano, psi = s_nano/1e9)."""
    nb = int(n_bins)

    def assign(b: pa.Table) -> pa.Table:
        pm = np.asarray(b[prob_micro_col], dtype=np.int64)
        bins = np.minimum(pm * nb // 1_000_000, nb - 1)
        return pa.table(
            {
                group_col: b[group_col],
                "bin": pa.array(bins, type=pa.int64()),
            }
        )

    hist = bounded_groupby_sum(
        ds.select_columns([group_col, prob_micro_col]).map_batches(
            assign, batch_format="pyarrow"
        ),
        [group_col, "bin"],
        count_alias="c",
    )

    def extract(df: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [
                (group_col, pa.string()),
                ("n", pa.int64()),
                ("n_rest", pa.int64()),
                ("s_nano", pa.int64()),
                ("psi", pa.float64()),
            ]
        )
        if len(df) == 0:
            return schema.empty_table()
        glob = np.zeros(nb, dtype=np.int64)
        for _, r in df.iterrows():
            glob[int(r["bin"])] += int(r["c"])
        n_tot = int(glob.sum())
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            cs = np.zeros(nb, dtype=np.int64)
            for _, r in sub.iterrows():
                cs[int(r["bin"])] = int(r["c"])
            n_s = int(cs.sum())
            n_rest = n_tot - n_s
            if n_rest == 0:
                continue
            p = (cs + 1) / (n_s + float(nb))
            q = (glob - cs + 1) / (n_rest + float(nb))
            nano = np.rint((p - q) * np.log(p / q) * 1e9).astype(np.int64)
            s_nano = int(nano.sum())
            rows.append(
                {
                    group_col: g,
                    "n": n_s,
                    "n_rest": n_rest,
                    "s_nano": s_nano,
                    "psi": s_nano / 1e9,
                }
            )
        if not rows:
            return schema.empty_table()
        return pa.Table.from_pandas(
            pd.DataFrame(rows), schema=schema, preserve_index=False
        ).replace_schema_metadata(None)

    return hist.map_batches(
        lambda b: extract(b.to_pandas()),
        batch_format="pyarrow",
        batch_size=None,
    )


def kendall_tau_b(
    ds: ray.data.Dataset,
    *,
    x_col: str = "x",
    y_col: str = "y",
    max_cells: int = 4_000_000,
) -> pa.Table:
    """EXACT Kendall tau-b rank correlation between two integer columns
    (Kendall 1945 tie correction) — the pairwise-concordance
    complement to ``spearman_corr``: identical monotone-association
    reading, but its O(1) influence per swapped pair makes it the
    robust choice when Spearman's squared rank deviations over-weight
    the tails.

    No pairwise pass: concordant/discordant counts come from the
    bounded joint (x, y) value histogram — 2D prefix sums over the
    dense distinct-x × distinct-y grid give, for every cell, the pair
    mass strictly below-left (concordant) and below-right (discordant);
    Σ cell·mass is n²-scale but int64-safe to ~4e9 rows.  The histogram
    is value-domain-proportional (loud ``max_cells`` guard), the same
    contract as the Spearman rank maps.  tau_b =
    (C−D)/√((n0−T_x)(n0−T_y)) with the SQL mirror replaying the same
    int moments and the same two-factor double product."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    h = bounded_groupby_sum(
        ds.select_columns([x_col, y_col]), [x_col, y_col],
        count_alias="cnt",
    ).take_all()
    if len(h) > max_cells:
        raise ValueError(
            f"kendall_tau_b: {len(h):,} joint cells > max_cells="
            f"{max_cells:,} — bucket the values or raise the guard"
        )
    if not h:
        return pa.table(
            {
                "n": pa.array([0], type=pa.int64()),
                "concordant": pa.array([0], type=pa.int64()),
                "discordant": pa.array([0], type=pa.int64()),
                "ties_x": pa.array([0], type=pa.int64()),
                "ties_y": pa.array([0], type=pa.int64()),
                "tau_b": pa.array([None], type=pa.float64()),
            }
        )
    xs = np.array([r[x_col] for r in h], dtype=np.int64)
    ys = np.array([r[y_col] for r in h], dtype=np.int64)
    cs = np.array([r["cnt"] for r in h], dtype=np.int64)
    xv, xi = np.unique(xs, return_inverse=True)
    yv, yi = np.unique(ys, return_inverse=True)
    # the sparse guard above bounds OCCUPIED cells; the prefix-sum
    # grids below are DENSE |X|·|Y| — bound that product by the same
    # budget so correlated high-cardinality axes fail loudly instead
    # of OOMing the driver on np.zeros
    if len(xv) * len(yv) > max_cells:
        raise ValueError(
            f"kendall_tau_b: dense grid {len(xv):,}×{len(yv):,} > "
            f"max_cells={max_cells:,} — bucket the values or raise "
            "the guard"
        )
    M = np.zeros((len(xv), len(yv)), dtype=np.int64)
    M[xi, yi] = cs
    # a[i, j] = pair mass with x' < x_i at column j
    a = np.zeros_like(M)
    a[1:, :] = np.cumsum(M, axis=0)[:-1, :]
    ll = np.zeros_like(M)  # strictly below-left
    ll[:, 1:] = np.cumsum(a, axis=1)[:, :-1]
    lg = a.sum(axis=1, keepdims=True) - np.cumsum(a, axis=1)  # below-right
    C = int((M * ll).sum())
    D = int((M * lg).sum())
    n = int(cs.sum())
    tx = M.sum(axis=1)
    ty = M.sum(axis=0)
    n1 = int((tx * (tx - 1) // 2).sum())
    n2 = int((ty * (ty - 1) // 2).sum())
    n0 = n * (n - 1) // 2
    tau = (
        float(C - D) / math.sqrt(float(n0 - n1) * float(n0 - n2))
        if n0 > n1 and n0 > n2
        else None
    )
    return pa.table(
        {
            "n": pa.array([n], type=pa.int64()),
            "concordant": pa.array([C], type=pa.int64()),
            "discordant": pa.array([D], type=pa.int64()),
            "ties_x": pa.array([n1], type=pa.int64()),
            "ties_y": pa.array([n2], type=pa.int64()),
            "tau_b": pa.array([tau], type=pa.float64()),
        }
    )


def quantile_normalize(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    value_col: str = "v",
    id_col: str = "doc_id",
    max_distinct: int = 4_000_000,
) -> ray.data.Dataset:
    """Cross-group quantile normalization of an integer metric (the
    rank-remap batch-effect correction of Bolstad et al. 2003, in its
    tie-stable integer form): each row's value is replaced by the
    POOLED distribution's percentile_disc at the row's within-group
    rank quantile — after normalization every group shares the pooled
    marginal, so per-source thresholds become comparable.

    Integer-exact end to end: within-group rank uses ``rank()``
    semantics (ties share the min rank, so tied rows map identically),
    the pooled position is ``ceil(r·N/n_g)`` in exact int arithmetic,
    and the mapped value is the smallest pooled value whose cumulative
    count reaches it.  Scale shape: the (group × value) histogram is
    the only exchanged table (bounded, loud guard — the spearman rank-
    map contract); the remap itself is a broadcast searchsorted inside
    one stateless map pass."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    h = bounded_groupby_sum(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col],
        count_alias="cnt",
    ).take_all()
    if len(h) > max_distinct:
        raise ValueError(
            f"quantile_normalize: {len(h):,} (group, value) cells > "
            f"max_distinct={max_distinct:,} — bucket the metric or raise "
            "the guard"
        )
    h.sort(key=lambda r: (str(r[group_col]), r[value_col]))
    # pooled cumulative histogram
    pooled: dict[int, int] = {}
    for r in h:
        pooled[r[value_col]] = pooled.get(r[value_col], 0) + int(r["cnt"])
    pv = np.array(sorted(pooled), dtype=np.int64)
    pcum = np.cumsum(np.array([pooled[v] for v in pv], dtype=np.int64))
    N = int(pcum[-1]) if len(pcum) else 0
    # per-group value -> min-rank, then -> pooled target value
    maps: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    by_g: dict[str, list] = {}
    for r in h:
        by_g.setdefault(r[group_col], []).append(r)
    for g, rows in by_g.items():
        vals = np.array([r[value_col] for r in rows], dtype=np.int64)
        cnts = np.array([int(r["cnt"]) for r in rows], dtype=np.int64)
        n_g = int(cnts.sum())
        prev = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        rank = prev + 1  # rank() semantics: ties share the min rank
        tgt = (rank * N + n_g - 1) // n_g  # ceil(r*N/n_g), int-exact
        qn = pv[np.searchsorted(pcum, tgt)]
        maps[g] = (vals, qn)

    def remap(b: pa.Table) -> pa.Table:
        import pandas as pd

        gcol = np.asarray(b[group_col].to_pylist(), dtype=object)
        v = np.asarray(b[value_col], dtype=np.int64)
        out = np.empty(len(b), dtype=np.int64)
        for g in pd.unique(gcol):
            m = gcol == g
            vals, qn = maps[g]
            out[m] = qn[np.searchsorted(vals, v[m])]
        return pa.table(
            {
                id_col: b[id_col],
                group_col: b[group_col],
                "value": pa.array(v, type=pa.int64()),
                "qn_value": pa.array(out, type=pa.int64()),
            }
        )

    return ds.map_batches(remap, batch_format="pyarrow")


_WELCH_PARTIAL_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n", pa.int64()),
        ("sx", pa.int64()),
        ("sxx", pa.int64()),
    ]
)

_WELCH_OUT_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n_a", pa.int64()),
        ("n_b", pa.int64()),
        ("mean_a", pa.float64()),
        ("mean_b", pa.float64()),
        ("t_stat", pa.float64()),
        ("df", pa.float64()),
        ("significant", pa.bool_()),
    ]
)


def grouped_welch(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> ray.data.Dataset:
    """One-vs-rest Welch's unequal-variance t-test per group — the A/B
    drift audit: does source s's ``value_col`` distribution differ from
    the REST of the corpus beyond sampling noise?  (The reference API
    has no statistics tier at all — SURVEY §2.8's scalar-function rows
    are its closest analog; this is the corpus-curation extension.)

    Scale shape: each batch reduces to EXACT integer moment rows
    (n, Σx, Σx²) per group (np.bincount over the unique-inverse — the
    grouped_ols sweep), tree-folded through ``bounded_groupby_sum``
    (domain = |groups|, corpus-independent); the rest-side moments are
    the GLOBAL totals minus the group's own — no second pass, no
    shuffle.  The final fit is one ≤|groups|-row block.

    Exactness: moments are int64-exact (x² ≤ ~1e8 per doc, safe to
    ~10¹⁰ docs/group; split hi/lo limbs beyond — the grouped_ols
    caveat class); the t / Welch–Satterthwaite df floats are computed
    in a fixed op order the DuckDB mirror spells identically, then
    floor-quantized to 6 decimals.  ``significant`` compares the
    QUANTIZED |t| against 1.96, so engine and oracle agree bit-for-bit.
    """

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _WELCH_PARTIAL_SCHEMA.empty_table()
        x = np.asarray(b[value_col], dtype=np.int64)
        g = np.asarray(b[group_col])
        uniq, inv = np.unique(g, return_inverse=True)
        k = len(uniq)
        return pa.table(
            {
                "source": pa.array(uniq.tolist(), type=pa.string()),
                "n": pa.array(np.bincount(inv, minlength=k), type=pa.int64()),
                "sx": pa.array(
                    np.bincount(inv, weights=x, minlength=k).astype(np.int64)
                ),
                "sxx": pa.array(
                    np.bincount(inv, weights=x * x, minlength=k).astype(
                        np.int64
                    )
                ),
            }
        )

    folded = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"],
        sum_cols={c: c for c in ("n", "sx", "sxx")},
    )

    def fit(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _WELCH_OUT_SCHEMA.empty_table()
        n = np.asarray(b["n"], dtype=np.int64)
        sx = np.asarray(b["sx"], dtype=np.int64)
        sxx = np.asarray(b["sxx"], dtype=np.int64)
        tot_n, tot_sx, tot_sxx = int(n.sum()), int(sx.sum()), int(sxx.sum())
        q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
        out = {c: [] for c in _WELCH_OUT_SCHEMA.names}
        for i in range(len(b)):
            na, sa, qa = int(n[i]), int(sx[i]), int(sxx[i])
            nb, sb, qb = tot_n - na, tot_sx - sa, tot_sxx - qa
            mean_a = float(sa) / float(na) if na > 0 else 0.0
            mean_b = float(sb) / float(nb) if nb > 0 else 0.0
            t_raw, df_raw = 0.0, 0.0
            if na > 1 and nb > 1:
                var_a = (
                    float(qa) - float(sa) * float(sa) / float(na)
                ) / float(na - 1)
                var_b = (
                    float(qb) - float(sb) * float(sb) / float(nb)
                ) / float(nb - 1)
                se2a = var_a / float(na)
                se2b = var_b / float(nb)
                s = se2a + se2b
                if s > 0.0:
                    t_raw = (mean_a - mean_b) / math.sqrt(s)
                    den = se2a * se2a / float(na - 1) + se2b * se2b / float(
                        nb - 1
                    )
                    if den > 0.0:
                        df_raw = s * s / den
            t_q = q6(t_raw)
            out["source"].append(b["source"][i].as_py())
            out["n_a"].append(na)
            out["n_b"].append(nb)
            out["mean_a"].append(q6(mean_a))
            out["mean_b"].append(q6(mean_b))
            out["t_stat"].append(t_q)
            out["df"].append(q6(df_raw))
            out["significant"].append(abs(t_q) > 1.96)
        return pa.table(
            {
                name: pa.array(out[name], type=_WELCH_OUT_SCHEMA.field(name).type)
                for name in _WELCH_OUT_SCHEMA.names
            }
        )

    # the fold output is ≤|groups| rows; ONE block so fit sees the
    # global totals (the grouped-eta2 final-block pattern)
    return folded.repartition(1).map_batches(
        fit, batch_format="pyarrow", batch_size=None
    )


# Poisson(1) CDF ladder as integer thresholds floor(CDF(k)·2⁵³),
# k = 0..7: a 53-bit uniform u drawn from the doc×replicate hash maps to
# weight w = |{k : u ≥ T_k}| ∈ 0..8 (mass beyond 8 is ~1e-9 and maps to
# 8; both engine and oracle use the SAME ladder, so the draw is exact
# by construction, not approximately Poisson).
POIS1_THRESH = np.array(
    [
        3313563428353948,
        6627126856707896,
        8283908570884870,
        8836169142277195,
        8974234285125276,
        9001847313694892,
        9006449485123161,
        9007106938184342,
    ],
    dtype=np.int64,
)
BOOT_B = 64  # replicates; lo/hi are 0-based order stats 1 and 62
_U53 = np.int64(1) << np.int64(53)

_BOOT_PARTIAL_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("b", pa.int64()),
        ("sw", pa.int64()),
        ("swx", pa.int64()),
    ]
)

_BOOT_OUT_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n_docs", pa.int64()),
        ("mean", pa.float64()),
        ("boot_lo", pa.float64()),
        ("boot_hi", pa.float64()),
        ("boot_se", pa.float64()),
    ]
)


def poisson_bootstrap(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-group mean of ``value_col`` with POISSON-BOOTSTRAP 95% CI and
    bootstrap SE — the streaming bootstrap (Chamandy et al. 2012,
    "Estimating Uncertainty for Massive Data Streams"): the classic
    resample-n-rows bootstrap needs the whole group in memory, but
    Poisson(1) per-row replicate weights make each replicate a WEIGHTED
    SUM computable in the same single pass as the mean itself — the
    shape that works at 10¹² rows.

    Determinism/exactness: replicate weights come from
    ``u64_md5(f"{id}:{b}") mod 2⁵³`` compared against the integer
    ``POIS1_THRESH`` ladder — pure integer ops DuckDB replays
    bit-for-bit (md5_number convention, splits.py).  Per (group,
    replicate): exact int64 (Σw, Σw·x); replicate means are
    ⌊·1e6+½⌋-quantized BEFORE the order-stat / SE arithmetic so every
    cross-replicate reduction is integer-exact.  One bounded fold
    (|groups| × (B+1) rows — the b=-1 sentinel row carries the exact
    raw (n, Σx)); the CI is order stats 1 and 62 of the 64 sorted
    (mean, b) pairs."""
    from docling_api_ray.functions.hashing import u64_md5

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _BOOT_PARTIAL_SCHEMA.empty_table()
        x = np.asarray(b[value_col], dtype=np.int64)
        ids = b[id_col].to_pylist()
        g = np.asarray(b[group_col])
        uniq, inv = np.unique(g, return_inverse=True)
        k = len(uniq)
        n = len(x)
        keys = np.array(
            [f"{i}:{rb}" for i in ids for rb in range(BOOT_B)], dtype=object
        )
        u = (u64_md5(keys) % np.uint64(_U53)).astype(np.int64)
        # (n, B) weights from the integer CDF ladder
        w = (
            (u.reshape(n, BOOT_B)[:, :, None] >= POIS1_THRESH[None, None, :])
            .sum(axis=2)
            .astype(np.int64)
        )
        # flat (group, replicate) cell ids → bincount sweeps
        cell = inv[:, None] * BOOT_B + np.arange(BOOT_B, dtype=np.int64)[None, :]
        m = k * BOOT_B
        sw = np.bincount(cell.ravel(), weights=w.ravel(), minlength=m)
        swx = np.bincount(
            cell.ravel(), weights=(w * x[:, None]).ravel(), minlength=m
        )
        src = np.repeat(uniq, BOOT_B)
        bb = np.tile(np.arange(BOOT_B, dtype=np.int64), k)
        # b = -1 sentinel: the exact unweighted (n, Σx) per group
        return pa.table(
            {
                "source": pa.array(
                    np.concatenate([src, uniq]).tolist(), type=pa.string()
                ),
                "b": pa.array(
                    np.concatenate([bb, np.full(k, -1, dtype=np.int64)]),
                    type=pa.int64(),
                ),
                "sw": pa.array(
                    np.concatenate(
                        [sw.astype(np.int64), np.bincount(inv, minlength=k)]
                    ),
                    type=pa.int64(),
                ),
                "swx": pa.array(
                    np.concatenate(
                        [
                            swx.astype(np.int64),
                            np.bincount(inv, weights=x, minlength=k).astype(
                                np.int64
                            ),
                        ]
                    ),
                    type=pa.int64(),
                ),
            }
        )

    folded = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "b"],
        sum_cols={c: c for c in ("sw", "swx")},
    )

    def fit(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _BOOT_OUT_SCHEMA.empty_table()
        df = t.to_pandas()
        q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
        out = {c: [] for c in _BOOT_OUT_SCHEMA.names}
        for src, grp in df.groupby("source", sort=True):
            base = grp[grp["b"] == -1]
            n = int(base["sw"].iloc[0]) if len(base) else 0
            sx = int(base["swx"].iloc[0]) if len(base) else 0
            reps = grp[grp["b"] >= 0].sort_values("b")
            m_micro = []
            for sw, swx in zip(reps["sw"], reps["swx"]):
                sw, swx = int(sw), int(swx)
                m_micro.append(
                    int(math.floor(float(swx) / float(sw) * 1e6 + 0.5))
                    if sw > 0
                    else 0
                )
            order = sorted(range(len(m_micro)), key=lambda i: (m_micro[i], i))
            lo = m_micro[order[1]] if len(order) == BOOT_B else 0
            hi = m_micro[order[BOOT_B - 2]] if len(order) == BOOT_B else 0
            sm = sum(m_micro)  # exact Python ints
            sm2 = sum(v * v for v in m_micro)
            var = (
                float(sm2) - float(sm) * float(sm) / float(BOOT_B)
            ) / float(BOOT_B - 1)
            se = math.sqrt(var) / 1e6 if var > 0.0 else 0.0
            out["source"].append(src)
            out["n_docs"].append(n)
            out["mean"].append(q6(float(sx) / float(n)) if n > 0 else 0.0)
            out["boot_lo"].append(lo / 1e6)
            out["boot_hi"].append(hi / 1e6)
            out["boot_se"].append(q6(se))
        return pa.table(
            {
                name: pa.array(out[name], type=_BOOT_OUT_SCHEMA.field(name).type)
                for name in _BOOT_OUT_SCHEMA.names
            }
        )

    # fold output is |groups|·(B+1) rows — bounded; one block for the
    # per-group order stats
    return folded.repartition(1).map_batches(
        fit, batch_format="pyarrow", batch_size=None
    )


_ISO_OUT_SCHEMA = pa.schema(
    [
        ("bin", pa.int64()),
        ("n", pa.int64()),
        ("frac_pos", pa.float64()),
        ("iso_prob", pa.float64()),
    ]
)


def isotonic_calibration(
    ds: ray.data.Dataset,
    *,
    prob_micro_col: str = "prob_micro",
    pos_col: str = "pos",
    n_bins: int = 10,
) -> ray.data.Dataset:
    """Isotonic (PAV) calibration of a probabilistic classifier over
    fixed probability bins — the monotone-regression upgrade of
    calibration_bins' raw reliability diagram: the pool-adjacent-
    violators fit is THE standard way to recalibrate a quality
    classifier before thresholding a corpus on it (Zadrozny & Elkan
    2002).

    Scale shape: identical to calibration_bins — ONE n_bins-bounded
    fold of (n, Σpos) per bin; the fit itself runs over ≤n_bins rows.
    Instead of the sequential pool-merging PAV loop, the fit uses the
    exact MINIMAX characterization of isotonic regression —
    iso(i) = max_{j≤i} min_{k≥i... over intervals} mean(pos)[j..k] —
    O(K²) interval ratios over the bin prefix sums, which a SQL mirror
    expresses directly (interval join + min/max), so the oracle is
    exact: both sides compute each interval ratio as the SAME single
    int/int IEEE division and take min/max over identical doubles;
    the published iso_prob is ⌊x·1e6+½⌋-quantized.  ``frac_pos`` is
    the raw per-bin rate for contrast; empty bins are absent (the
    GROUP BY convention)."""
    nb = int(n_bins)

    def assign(b: pa.Table) -> pa.Table:
        pm = np.asarray(b[prob_micro_col], dtype=np.int64)
        pos = np.asarray(b[pos_col], dtype=np.int64)
        bins = np.minimum(pm * nb // 1_000_000, nb - 1)
        return pa.table(
            {
                "bin": pa.array(bins, type=pa.int64()),
                "pos": pa.array(pos, type=pa.int64()),
            }
        )

    hist = bounded_groupby_sum(
        ds.select_columns([prob_micro_col, pos_col]).map_batches(
            assign, batch_format="pyarrow"
        ),
        ["bin"],
        sum_cols={"pos": "pos"},
        count_alias="n",
    )

    def finish(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _ISO_OUT_SCHEMA.empty_table()
        bins = np.asarray(b["bin"], dtype=np.int64)
        n = np.asarray(b["n"], dtype=np.int64)
        pos = np.asarray(b["pos"], dtype=np.int64)
        order = np.argsort(bins)
        bins, n, pos = bins[order], n[order], pos[order]
        k = len(bins)
        # prefix sums as python ints (exact), interval ratios as the
        # single division the mirror replays
        pn = [0] * (k + 1)
        pp = [0] * (k + 1)
        for i in range(k):
            pn[i + 1] = pn[i] + int(n[i])
            pp[i + 1] = pp[i] + int(pos[i])
        # lo[j] = min over k'>=j of mean(pos) on [j..k']
        lo = [
            min(
                float(pp[kk + 1] - pp[j]) / float(pn[kk + 1] - pn[j])
                for kk in range(j, k)
            )
            for j in range(k)
        ]
        q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
        iso = []
        best = -1.0
        for i in range(k):
            best = max(best, lo[i])
            iso.append(q6(best))
        return pa.table(
            {
                "bin": pa.array(bins, type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
                "frac_pos": pa.array(pos / n, type=pa.float64()),
                "iso_prob": pa.array(iso, type=pa.float64()),
            }
        )

    return hist.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


_CONF_OUT_SCHEMA = pa.schema(
    [
        ("n_cal", pa.int64()),
        ("q_micro", pa.int64()),
        ("n_test_pos", pa.int64()),
        ("coverage", pa.float64()),
        ("n_test", pa.int64()),
        ("accept_rate", pa.float64()),
    ]
)


def conformal_gate(
    ds: ray.data.Dataset,
    *,
    prob_micro_col: str = "prob_micro",
    pos_col: str = "pos",
    cal_col: str = "cal",
    alpha: float = 0.1,
) -> ray.data.Dataset:
    """Split-conformal acceptance gate for a probabilistic classifier
    (Vovk's split-conformal recipe; Angelopoulos & Bates 2022 survey
    §1): calibrate the nonconformity threshold q = the
    ⌈(n+1)(1−α)⌉-th smallest score s = 1e6 − prob_micro on the held-out
    POSITIVE calibration rows, then report test coverage (fraction of
    test positives with s ≤ q — guaranteed ≥ 1−α in expectation) and
    the accept rate the gate would pass corpus-wide.  This is the
    distribution-free uncertainty wrapper a curation pipeline puts
    around the quality classifier before trusting its threshold.

    Scale shape: ONE bounded fold of the (cal, pos, s) histogram —
    s is the micro-quantized score, so the domain is value-bounded
    (the score_quantiles class), never row-proportional; the order
    stat and the two coverage ratios are computed from cumulative
    counts in a single ≤|domain|-row block.  Exactness: q is an
    integer order stat; coverage/accept are single int/int IEEE
    divisions the mirror replays; ⌈(n+1)(1−α)⌉ is the same
    float-ceil both sides."""

    hist_schema = pa.schema(
        [
            ("cal", pa.int64()),
            ("pos", pa.int64()),
            ("s", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return hist_schema.empty_table()
        s = 1_000_000 - np.asarray(b[prob_micro_col], dtype=np.int64)
        cal = np.asarray(b[cal_col], dtype=np.int64)
        pos = np.asarray(b[pos_col], dtype=np.int64)
        key = np.stack([cal, pos, s], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "cal": pa.array(uniq[:, 0], type=pa.int64()),
                "pos": pa.array(uniq[:, 1], type=pa.int64()),
                "s": pa.array(uniq[:, 2], type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    folded = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["cal", "pos", "s"],
        sum_cols={"n": "n"},
    )

    def fit(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _CONF_OUT_SCHEMA.empty_table()
        cal = np.asarray(t["cal"], dtype=np.int64)
        pos = np.asarray(t["pos"], dtype=np.int64)
        s = np.asarray(t["s"], dtype=np.int64)
        n = np.asarray(t["n"], dtype=np.int64)
        cm = (cal == 1) & (pos == 1)
        n_cal = int(n[cm].sum())
        k = math.ceil((n_cal + 1) * (1.0 - alpha))
        if n_cal == 0 or k > n_cal:
            q = 1_000_000
        else:
            order = np.argsort(s[cm], kind="stable")
            cum = np.cumsum(n[cm][order])
            q = int(s[cm][order][np.searchsorted(cum, k)])
        tm = cal == 0
        n_test = int(n[tm].sum())
        n_test_pos = int(n[tm & (pos == 1)].sum())
        cov_n = int(n[tm & (pos == 1) & (s <= q)].sum())
        acc_n = int(n[tm & (s <= q)].sum())
        coverage = float(cov_n) / float(n_test_pos) if n_test_pos > 0 else 0.0
        accept = float(acc_n) / float(n_test) if n_test > 0 else 0.0
        return pa.table(
            {
                "n_cal": pa.array([n_cal], type=pa.int64()),
                "q_micro": pa.array([q], type=pa.int64()),
                "n_test_pos": pa.array([n_test_pos], type=pa.int64()),
                "coverage": pa.array([coverage], type=pa.float64()),
                "n_test": pa.array([n_test], type=pa.int64()),
                "accept_rate": pa.array([accept], type=pa.float64()),
            }
        )

    return folded.repartition(1).map_batches(
        fit, batch_format="pyarrow", batch_size=None
    )


_KANON_OUT_SCHEMA = pa.schema(
    [
        ("n_rows", pa.int64()),
        ("n_classes", pa.int64()),
        ("min_class_size", pa.int64()),
        ("n_small_classes", pa.int64()),
        ("rows_at_risk", pa.int64()),
        ("risk_frac", pa.float64()),
    ]
)


def k_anonymity(
    ds: ray.data.Dataset,
    *,
    quasi_cols: tuple[str, ...] = ("source", "lang"),
    bucket_col: str = "n_chars",
    bucket_width: int = 100,
    k: int = 5,
) -> ray.data.Dataset:
    """k-anonymity audit over quasi-identifier equivalence classes
    (Sweeney 2002): rows whose (quasi_cols…, ⌊bucket_col/width⌋) tuple
    is shared by fewer than k rows are re-identification risks — the
    privacy readout a corpus release runs next to PII redaction
    (which removes direct identifiers; this measures the INDIRECT
    ones).  One summary row: class counts, the minimum class size,
    and the count/fraction of rows in sub-k classes.

    Scale shape: ONE bounded fold over the quasi-identifier domain
    (|sources| × |langs| × value-bounded length buckets — the
    cube_counts class), then a ≤|domain|-row final block; risk_frac
    is a single int/int IEEE division the mirror replays."""

    cols = list(quasi_cols)
    hist_schema = pa.schema(
        [(c, pa.string()) for c in cols]
        + [("bucket", pa.int64()), ("n", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return hist_schema.empty_table()
        t = pa.table(
            {c: b[c] for c in cols}
            | {
                "bucket": pa.array(
                    np.asarray(b[bucket_col], dtype=np.int64)
                    // bucket_width,
                    type=pa.int64(),
                )
            }
        )
        g = t.group_by(cols + ["bucket"]).aggregate([([], "count_all")])
        return g.rename_columns(cols + ["bucket", "n"])

    folded = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        cols + ["bucket"],
        sum_cols={"n": "n"},
    )

    def fit(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _KANON_OUT_SCHEMA.empty_table()
        n = np.asarray(t["n"], dtype=np.int64)
        total = int(n.sum())
        small = n < k
        risk = int(n[small].sum())
        return pa.table(
            {
                "n_rows": pa.array([total], type=pa.int64()),
                "n_classes": pa.array([len(n)], type=pa.int64()),
                "min_class_size": pa.array(
                    [int(n.min())], type=pa.int64()
                ),
                "n_small_classes": pa.array(
                    [int(small.sum())], type=pa.int64()
                ),
                "rows_at_risk": pa.array([risk], type=pa.int64()),
                "risk_frac": pa.array(
                    [float(risk) / float(total) if total > 0 else 0.0],
                    type=pa.float64(),
                ),
            }
        )

    return folded.repartition(1).map_batches(
        fit, batch_format="pyarrow", batch_size=None
    )


_LDIV_OUT_SCHEMA = pa.schema(
    [
        ("n_classes", pa.int64()),
        ("min_diversity", pa.int64()),
        ("n_below_l", pa.int64()),
        ("rows_below_l", pa.int64()),
        ("frac_below_l", pa.float64()),
    ]
)


def l_diversity(
    ds: ray.data.Dataset,
    *,
    quasi_cols: tuple[str, ...] = ("source",),
    bucket_col: str = "n_chars",
    bucket_width: int = 100,
    sensitive_col: str = "lang",
    l: int = 2,
) -> ray.data.Dataset:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007) — the
    k-anonymity companion: a quasi-identifier class where every row
    shares ONE sensitive value leaks that value even when the class is
    large, so the release check is the DISTINCT sensitive-value count
    per class.  Reports the minimum diversity and the class/row mass
    below l.

    Scale shape: one bounded fold over (quasi…, bucket, sensitive)
    counts — the k_anonymity domain × |sensitive| — then a
    ≤|domain|-row final block computing per-class distinct counts by
    construction (each (class, sensitive) pair is one folded row)."""

    cols = list(quasi_cols)
    hist_schema = pa.schema(
        [(c, pa.string()) for c in cols]
        + [
            ("bucket", pa.int64()),
            ("sv", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return hist_schema.empty_table()
        t = pa.table(
            {c: b[c] for c in cols}
            | {
                "bucket": pa.array(
                    np.asarray(b[bucket_col], dtype=np.int64)
                    // bucket_width,
                    type=pa.int64(),
                ),
                "sv": b[sensitive_col],
            }
        )
        g = t.group_by(cols + ["bucket", "sv"]).aggregate([([], "count_all")])
        return g.rename_columns(cols + ["bucket", "sv", "n"])

    folded = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        cols + ["bucket", "sv"],
        sum_cols={"n": "n"},
    )

    def fit(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _LDIV_OUT_SCHEMA.empty_table()
        df = t.to_pandas()
        key = [*cols, "bucket"]
        per = df.groupby(key, sort=False).agg(
            div=("sv", "size"), rows=("n", "sum")
        )
        # each (class, sensitive) pair is one folded row → size IS the
        # distinct sensitive count
        below = per["div"] < l
        n_classes = int(len(per))
        rows_below = int(per.loc[below, "rows"].sum())
        total = int(per["rows"].sum())
        return pa.table(
            {
                "n_classes": pa.array([n_classes], type=pa.int64()),
                "min_diversity": pa.array(
                    [int(per["div"].min())], type=pa.int64()
                ),
                "n_below_l": pa.array(
                    [int(below.sum())], type=pa.int64()
                ),
                "rows_below_l": pa.array([rows_below], type=pa.int64()),
                "frac_below_l": pa.array(
                    [
                        float(rows_below) / float(total)
                        if total > 0
                        else 0.0
                    ],
                    type=pa.float64(),
                ),
            }
        )

    return folded.repartition(1).map_batches(
        fit, batch_format="pyarrow", batch_size=None
    )


_TRIM_OUT_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n", pa.int64()),
        ("n_trim", pa.int64()),
        ("trimmed_mean", pa.float64()),
    ]
)


def grouped_trimmed_mean(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    value_col: str = "n_chars",
    trim_frac: float = 0.1,
) -> ray.data.Dataset:
    """Exact per-group trimmed mean of an integer metric: drop the
    ⌊trim·n⌋ smallest and largest ROWS, average the rest — the robust
    location estimate between robust_stats' median and the raw mean,
    standard for length/score summaries contaminated by mega-docs.

    Exact from ONE bounded (group × value) histogram fold (the
    grouped_int_quantiles discipline — value-domain-proportional,
    never row-proportional): the trimmed sum telescopes over the
    sorted histogram with integer partial-tie arithmetic (cumulative
    counts pin how many rows of the boundary value bins survive), one
    int/int division at the end, ⌊x·1e6+½⌋ quantize."""

    hist_schema = pa.schema(
        [
            ("source", pa.string()),
            ("v", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return hist_schema.empty_table()
        t = pa.table({"source": b[group_col], "v": b[value_col]})
        g = t.group_by(["source", "v"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "v", "n"])

    folded = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "v"],
        sum_cols={"n": "n"},
    )

    def fit(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _TRIM_OUT_SCHEMA.empty_table()
        df = t.to_pandas().sort_values(["source", "v"], kind="stable")
        q6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
        out = {c: [] for c in _TRIM_OUT_SCHEMA.names}
        for src, g in df.groupby("source", sort=True):
            v = g["v"].to_numpy()
            n = g["n"].to_numpy()
            total = int(n.sum())
            cut = int(math.floor(trim_frac * total))
            keep_lo, keep_hi = cut, total - cut  # 0-based kept row range
            cum = np.cumsum(n)
            start = cum - n  # first 0-based rank of each value bin
            # rows of each bin inside [keep_lo, keep_hi)
            kept = np.minimum(cum, keep_hi) - np.maximum(start, keep_lo)
            kept = np.maximum(kept, 0)
            ssum = int((kept * v).sum())
            skept = int(kept.sum())
            out["source"].append(src)
            out["n"].append(total)
            out["n_trim"].append(cut)
            out["trimmed_mean"].append(
                q6(float(ssum) / float(skept)) if skept > 0 else 0.0
            )
        return pa.table(
            {
                c: pa.array(out[c], type=_TRIM_OUT_SCHEMA.field(c).type)
                for c in _TRIM_OUT_SCHEMA.names
            }
        )

    return folded.repartition(1).map_batches(
        fit, batch_format="pyarrow", batch_size=None
    )
