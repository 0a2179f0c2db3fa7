"""Sketch-based heavy hitters: Misra-Gries candidates + an exact
verification pass.

The wordcount family (``vocab_topk``) keeps per-batch partials bounded
by the BATCH vocabulary — fine for bounded vocabularies, but an open web
vocabulary makes every partial big.  The Misra-Gries summary caps the
per-batch state at ``k`` counters no matter the vocabulary, and MG
summaries are MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS
'12): combine by summing counts then subtracting the (k+1)-th largest,
keeping positives.  The merged summary's undercount is ≤ N/(k+1), so
every word with true frequency > N/(k+1) is guaranteed to survive as a
candidate.

That guarantee turns the approximate sketch into an EXACT operator: pick
``k`` so the sketch error is below the query threshold, then run one
more streaming pass counting ONLY the ≤k candidate words (broadcast
``is_in`` filter + bounded-domain fold — the candidate set is
k-bounded by construction) and keep those with exact count strictly
above ``N * num / den``.  The threshold compare is integer arithmetic
(``n * den > N * num``), so the DuckDB oracle matches bit-for-bit.

Scale shape: pass 1 moves ≤k rows per block to the driver (k·blocks
narrow ints — sketch-bounded, never vocabulary-bounded); pass 2 is a
stateless filtered wordcount over a ≤k bounded domain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from docling_api_ray.stages.common import bounded_groupby_sum


def _mg_truncate(words: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries reduction of exact (word, count) pairs to ≤k
    counters: subtract the (k+1)-th largest count, keep positives."""
    if len(words) <= k:
        return words, counts
    # (k+1)-th largest via partition
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    adj = counts - kth
    keep = adj > 0
    return words[keep], adj[keep]


def heavy_hitters(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    num: int = 1,
    den: int = 30,
    k: int | None = None,
) -> ray.data.Dataset:
    """documents(text) → (word, n) EXACT counts of every word whose
    frequency strictly exceeds ``num/den`` of all token occurrences.

    ``k`` (sketch width) defaults to ``2*den/num`` — error N·num/(2·den),
    half the query threshold, so no qualifying word can be missed."""
    if k is None:
        k = max(8, (2 * den) // max(1, num))

    def partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(
            pc.split_pattern(pc.fill_null(col, ""), " ")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        n_tok = len(toks)
        if n_tok == 0:
            return pa.table(
                {
                    "word": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "total": pa.array([], type=pa.int64()),
                }
            )
        g = pa.table({"w": toks}).group_by(["w"]).aggregate([([], "count_all")])
        words = np.asarray(g["w"].to_pylist(), dtype=object)
        counts = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        words, counts = _mg_truncate(words, counts, k)
        # the batch token total rides a sentinel row ("" never occurs as
        # a token — empties are filtered above) so it survives even when
        # the MG truncation drops every counter (uniform batch vocab)
        return pa.table(
            {
                "word": pa.array(list(words) + [""], type=pa.string()),
                "n": pa.array(
                    np.concatenate([counts, [0]]), type=pa.int64()
                ),
                "total": pa.array(
                    np.concatenate(
                        [np.zeros(len(words), dtype=np.int64), [n_tok]]
                    ),
                    type=pa.int64(),
                ),
            }
        )

    # pass 1: sketch-bounded partials (≤k rows per block) → driver merge
    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n_total = sum(r["total"] for r in rows)
    if not rows or n_total == 0:
        return ray.data.from_arrow(
            pa.table(
                {"word": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        )
    merged = pd.DataFrame(rows).groupby("word")["n"].sum()
    merged = merged[merged.index != ""]  # drop the total sentinel
    words = merged.index.to_numpy(dtype=object)
    counts = merged.to_numpy()
    words, _ = _mg_truncate(words, counts, k)
    candidates = sorted(map(str, words))
    cand_ref = ray.put(pa.array(candidates, type=pa.string()))

    # pass 2: exact counts of the ≤k candidates only
    def exact(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(
            pc.split_pattern(pc.fill_null(col, ""), " ")
        )
        toks = toks.filter(pc.is_in(toks, value_set=ray.get(cand_ref)))
        return pa.table({"word": toks})

    counts_ds = bounded_groupby_sum(
        ds.map_batches(exact, batch_format="pyarrow"),
        ["word"],
        count_alias="n",
    )

    def threshold(b: pa.Table) -> pa.Table:
        n = b["n"]
        keep = pc.greater(
            pc.multiply(pc.cast(n, pa.int64()), den), n_total * num
        )
        out = b.filter(keep)
        return pa.table(
            {"word": out["word"], "n": pc.cast(out["n"], pa.int64())}
        )

    return counts_ds.map_batches(threshold, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HyperLogLog registers — distinct-cardinality sketch
# ---------------------------------------------------------------------------

HLL_B = 12  # 2^12 = 4096 registers; rest width 52 bits (< 2^53: exact
#             float exponent extraction AND exact BIGINT for the oracle)
HLL_W = 64 - HLL_B


def hll_registers(
    ds: ray.data.Dataset, *, text_col: str = "text"
) -> ray.data.Dataset:
    """documents(text) → the (bucket, max_rho) HyperLogLog register
    table over the corpus's distinct TOKENS — the distinct-count sketch
    whose registers (not the float estimate) are the query output, so
    the result is pure integers and the DuckDB oracle reproduces it
    bit-for-bit from the same md5-derived hashes.

    Scale shape: per-batch partial register maxes (vectorized
    ``np.maximum.at``, ≤2^B rows per block regardless of corpus), a
    bounded two-level max fold (same tree shape as
    ``common.bounded_groupby_sum``), nothing vocabulary- or
    corpus-proportional anywhere.  ``rho`` = HLL_W − floor(log2(rest)),
    extracted exactly via ``np.frexp`` (rest < 2^53, so the float
    exponent is exact); the oracle mirrors it as
    ``HLL_W − (length(to_base(rest, 2)) − 1)``."""
    from docling_api_ray.functions.hashing import u64_md5

    def partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(
            pc.split_pattern(pc.fill_null(col, ""), " ")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        if len(toks) == 0:
            return pa.table(
                {"bucket": pa.array([], type=pa.int64()),
                 "max_rho": pa.array([], type=pa.int64())}
            )
        # hash once per UNIQUE token in the batch
        uniq = pc.unique(toks).to_pylist()
        h = u64_md5(np.array(uniq, dtype=object))
        bucket = (h >> np.uint64(HLL_W)).astype(np.int64)
        rest = (h & np.uint64((1 << HLL_W) - 1)).astype(np.int64)
        rho = np.full(len(h), HLL_W + 1, dtype=np.int64)
        nz = rest > 0
        # frexp exponent e: rest = m * 2^e with 0.5 <= m < 1, so
        # e - 1 = floor(log2(rest)) EXACTLY (rest < 2^53)
        _, e = np.frexp(rest[nz].astype(np.float64))
        rho[nz] = HLL_W - (e - 1)
        regs = np.zeros(1 << HLL_B, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        hot = np.flatnonzero(regs)
        return pa.table(
            {"bucket": pa.array(hot, type=pa.int64()),
             "max_rho": pa.array(regs[hot], type=pa.int64())}
        )

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by(["bucket"]).aggregate([("max_rho", "max")])
        return g.rename_columns(["bucket", "max_rho"])

    from docling_api_ray.stages.common import two_level_fold

    return two_level_fold(
        ds.map_batches(partial, batch_format="pyarrow"), fold
    )


def hll_estimate(registers: list[dict]) -> float:
    """Driver-side HLL cardinality estimate from the register table
    (standard bias-corrected harmonic mean; small-range correction via
    linear counting)."""
    m = 1 << HLL_B
    regs = np.zeros(m, dtype=np.int64)
    for r in registers:
        regs[r["bucket"]] = r["max_rho"]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


# ---------------------------------------------------------------------------
# Bloom filter — set-membership sketch (decontamination gate)
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 17  # bits
BLOOM_K = 4        # probes per item (Kirsch-Mitzenmacher double hashing)


def _bloom_positions(u: np.ndarray) -> np.ndarray:
    """(n,) uint64 item hashes → (n, BLOOM_K) int64 bit positions via
    double hashing: pos_i = (h1 + i·h2) mod M with h1 = u mod M and
    h2 = (u >> 32)·2 + 1 (odd, < 2^33 — every intermediate < 2^36, so
    the DuckDB HUGEINT mirror is exact)."""
    h1 = (u % np.uint64(BLOOM_M)).astype(np.int64)
    h2 = ((u >> np.uint64(32)) * np.uint64(2) + np.uint64(1)).astype(np.int64)
    i = np.arange(BLOOM_K, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % BLOOM_M


def bloom_membership(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_mod: int = 50,
) -> ray.data.Dataset:
    """Bloom-filter decontamination gate: build an M-bit filter over the
    benchmark docs' full-text md5 hashes (doc_id % bench_mod == 0), then
    flag every doc whose K positions are all set.

    Scale shape: the build pass ships per-batch UNIQUE bit positions
    (≤min(K·rows, M) ints per block); the driver folds them into one
    M-bit array — bounded by the FILTER size, never the corpus — and
    broadcasts it once (``ray.put``, 128 KiB).  The probe pass is one
    stateless vectorized membership test per batch.  Determinism makes
    the sketch oracle-exact: false-positive structure and all."""
    import ray as _ray

    from docling_api_ray.functions.hashing import u64_md5

    def build(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        mask = ids % bench_mod == 0
        texts = np.asarray(
            b[text_col].to_numpy(zero_copy_only=False), dtype=object
        )[mask]
        if len(texts) == 0:
            return pa.table({"bit": pa.array([], type=pa.int64())})
        pos = _bloom_positions(u64_md5(texts))
        return pa.table({"bit": pa.array(np.unique(pos), type=pa.int64())})

    # bit-position union on the driver: ≤M distinct ints (filter-bounded)
    bits = np.zeros(BLOOM_M, dtype=bool)
    for blk in ds.map_batches(build, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        bits[np.asarray(blk["bit"], dtype=np.int64)] = True
    bits_ref = _ray.put(bits)

    def probe(b: pa.Table) -> pa.Table:
        texts = np.asarray(
            b[text_col].to_numpy(zero_copy_only=False), dtype=object
        )
        pos = _bloom_positions(u64_md5(texts))
        hit = ray.get(bits_ref)[pos].all(axis=1)
        return pa.table(
            {
                id_col: b[id_col],
                "maybe_contaminated": pa.array(hit, type=pa.bool_()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-min sketch — frequency-estimate sketch
# ---------------------------------------------------------------------------

CMS_W = 1024  # columns
CMS_D = 4     # hash rows


def _cms_cols(u: np.ndarray) -> np.ndarray:
    """(n,) uint64 word hashes → (n, CMS_D) int64 column indices, same
    double-hashing shape as the bloom filter (exact in HUGEINT)."""
    c1 = (u % np.uint64(CMS_W)).astype(np.int64)
    c2 = ((u >> np.uint64(32)) * np.uint64(2) + np.uint64(1)).astype(np.int64)
    j = np.arange(CMS_D, dtype=np.int64)
    return (c1[:, None] + j[None, :] * c2[:, None]) % CMS_W


def countmin_estimates(
    ds: ray.data.Dataset,
    probe_words: list[str],
    *,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Count-min sketch over the corpus's token stream, probed for a
    fixed word list → (word, est_n) upper-bound frequency estimates.

    Per-batch partial: exact batch word counts (one Arrow group_by)
    scattered into the D×W cell grid with ``np.add.at`` — each block
    emits ≤D·W nonzero cells no matter the batch vocabulary (the CMS
    point: sketch-bounded partials where a wordcount partial is
    vocabulary-bounded).  Cells tree-fold through
    ``bounded_groupby_sum`` (domain = D·W, corpus-independent); the
    driver reads the ≤D·W-row sketch, probes it, and the deterministic
    estimate (min over D cells) is mirrored bit-for-bit by the SQL
    oracle — including collision overcounts."""
    from docling_api_ray.functions.hashing import u64_md5

    def partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(pc.split_pattern(pc.fill_null(col, ""), " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        if len(toks) == 0:
            return pa.table(
                {"row_": pa.array([], type=pa.int64()),
                 "col_": pa.array([], type=pa.int64()),
                 "cell": pa.array([], type=pa.int64())}
            )
        g = pa.table({"w": toks}).group_by(["w"]).aggregate([([], "count_all")])
        words = np.asarray(g["w"].to_pylist(), dtype=object)
        counts = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = _cms_cols(u64_md5(words))
        grid = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        for j in range(CMS_D):
            np.add.at(grid[j], cols[:, j], counts)
        rows, hot = np.nonzero(grid)
        return pa.table(
            {"row_": pa.array(rows, type=pa.int64()),
             "col_": pa.array(hot, type=pa.int64()),
             "cell": pa.array(grid[rows, hot], type=pa.int64())}
        )

    sketch_ds = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["row_", "col_"],
        sum_cols={"cell": "cell"},
    )

    grid = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for blk in sketch_ds.iter_batches(batch_format="pyarrow"):
        grid[
            np.asarray(blk["row_"], dtype=np.int64),
            np.asarray(blk["col_"], dtype=np.int64),
        ] = np.asarray(blk["cell"], dtype=np.int64)

    words = np.asarray(sorted(probe_words), dtype=object)
    cols = _cms_cols(u64_md5(words))
    est = grid[np.arange(CMS_D)[None, :], cols].min(axis=1)
    return ray.data.from_arrow(
        pa.table(
            {"word": pa.array(list(words), type=pa.string()),
             "est_n": pa.array(est, type=pa.int64())}
        )
    )


def grouped_hll_registers(
    ds: ray.data.Dataset, *, group_col: str = "source", text_col: str = "text"
) -> ray.data.Dataset:
    """Per-GROUP HyperLogLog registers — ``hll_registers`` with one
    sketch per group (the per-source distinct-vocabulary monitor of a
    multi-source corpus; sketches stay mergeable across shards AND
    concatenable across groups).

    Same scale shape as the global sketch: each block reduces to
    ≤ |groups_in_block| × 2^B (source, bucket, max_rho) rows, the
    bounded two-level max fold combines them, and the output is
    |groups| × 2^B-bounded — corpus-independent.  Tokens hash once per
    unique (group, token) pair per batch."""
    from docling_api_ray.functions.hashing import u64_md5

    empty = pa.schema(
        [
            (group_col, pa.string()),
            ("bucket", pa.int64()),
            ("max_rho", pa.int64()),
        ]
    ).empty_table()

    def partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(col, ""), " ")
        toks = pc.list_flatten(lists)
        grp = pc.take(b[group_col], pc.list_parent_indices(lists))
        keep = pc.not_equal(toks, "")
        toks, grp = toks.filter(keep), grp.filter(keep)
        if len(toks) == 0:
            return empty
        pairs = (
            pa.table({group_col: grp, "tok": toks})
            .group_by([group_col, "tok"])
            .aggregate([])
        )
        # hash once per unique token in the batch (tokens repeat across
        # groups; factorize against the distinct token set)
        import pandas as pd

        tok_arr = np.asarray(pairs["tok"].to_pylist(), dtype=object)
        codes, uniques = pd.factorize(tok_arr)
        h = u64_md5(uniques)[codes]
        bucket = (h >> np.uint64(HLL_W)).astype(np.int64)
        rest = (h & np.uint64((1 << HLL_W) - 1)).astype(np.int64)
        rho = np.full(len(h), HLL_W + 1, dtype=np.int64)
        nz = rest > 0
        _, e = np.frexp(rest[nz].astype(np.float64))
        rho[nz] = HLL_W - (e - 1)
        g = (
            pd.DataFrame(
                {
                    group_col: np.asarray(pairs[group_col].to_pylist(),
                                          dtype=object),
                    "bucket": bucket,
                    "max_rho": rho,
                }
            )
            .groupby([group_col, "bucket"], sort=False)["max_rho"]
            .max()
            .reset_index()
        )
        return pa.table(
            {
                group_col: pa.array(g[group_col].tolist(), type=pa.string()),
                "bucket": pa.array(g["bucket"].to_numpy(), type=pa.int64()),
                "max_rho": pa.array(g["max_rho"].to_numpy(), type=pa.int64()),
            }
        )

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by([group_col, "bucket"]).aggregate([("max_rho", "max")])
        return g.rename_columns([group_col, "bucket", "max_rho"])

    from docling_api_ray.stages.common import two_level_fold

    return two_level_fold(
        ds.map_batches(partial, batch_format="pyarrow"), fold
    )


# ---------------------------------------------------------------------------
# KLL quantile sketch — the one-pass streaming complement to the exact
# distributed selection in stages/selection.py (VERDICT r4 #6)
# ---------------------------------------------------------------------------

_KLL_SCHEMA = pa.schema([("level", pa.int64()), ("value", pa.float64())])
KLL_K = 256          # sketch size parameter
KLL_EPS = 0.02       # asserted rank-error bound at k=256 (theory ~2.3/k
                     # whp; 0.02 leaves >2x margin, verified in tests)


def _kll_capacity(k: int, level: int, num_levels: int) -> int:
    """Level capacity: full k at the top level, shrinking by 2/3 per
    level downward (Karnin-Lall-Liberty '16 layout), floor 2."""
    import math

    depth = num_levels - 1 - level
    return max(2, int(math.ceil(k * (2.0 / 3.0) ** depth)))


def _kll_compress(levels: list[np.ndarray], k: int) -> list[np.ndarray]:
    """Compact the lowest over-capacity level until the sketch fits its
    total budget.  Each compaction sorts the level and promotes every
    other item (doubling its implicit weight) to the level above; an
    odd leftover stays.  The even/odd coin derives from the level's
    content fingerprint — deterministic for a given input, varying
    across compactions, so no RNG state needs to ride the fold."""
    while True:
        H = len(levels)
        if sum(len(a) for a in levels) <= sum(
            _kll_capacity(k, lv, H) for lv in range(H)
        ):
            return levels
        for lv in range(H):
            if len(levels[lv]) <= _kll_capacity(k, lv, H):
                continue
            a = np.sort(levels[lv])
            odd = len(a) & 1
            keep_last = a[-1:] if odd else a[:0]
            body = a[: len(a) - odd]
            coin = (
                int(abs(float(body.sum())) * 1e6) + len(body) + lv
            ) & 1
            promoted = body[coin::2]
            levels[lv] = keep_last
            if lv + 1 == len(levels):
                levels.append(promoted)
            else:
                levels[lv + 1] = np.concatenate([levels[lv + 1], promoted])
            break
        else:
            return levels


def _kll_from_rows(levels_arr: np.ndarray, values_arr: np.ndarray):
    H = int(levels_arr.max()) + 1 if len(levels_arr) else 0
    return [values_arr[levels_arr == lv] for lv in range(H)]


def _kll_to_table(levels: list[np.ndarray]) -> pa.Table:
    lv = np.concatenate(
        [np.full(len(a), i, dtype=np.int64) for i, a in enumerate(levels)]
    ) if levels else np.empty(0, dtype=np.int64)
    vals = np.concatenate(levels) if levels else np.empty(0, dtype=np.float64)
    return pa.table(
        {"level": pa.array(lv), "value": pa.array(vals.astype(np.float64))}
    )


def kll_sketch(
    ds: ray.data.Dataset, *, value_col: str, k: int = KLL_K
) -> pa.Table:
    """ONE streaming pass over ``value_col`` → a ≤O(k·log(n/k))-row
    (level, value) KLL summary.  Per-batch partials sketch their batch;
    the merge is row concatenation + recompression — a mergeable fold
    in the Misra-Gries/HLL discipline (two_level_fold: bounded bundle
    merges, one final single-block fold), so nothing corpus-
    proportional ever concentrates.  Item weight is 2^level; total
    weight equals the exact row count (compaction is weight-
    preserving)."""
    from docling_api_ray.stages.common import two_level_fold

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _KLL_SCHEMA.empty_table()
        v = np.asarray(b[value_col], dtype=np.float64)
        v = v[~np.isnan(v)]
        return _kll_to_table(_kll_compress([v], k))

    def merge(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _KLL_SCHEMA.empty_table()
        levels = _kll_from_rows(
            np.asarray(b["level"], dtype=np.int64),
            np.asarray(b["value"], dtype=np.float64),
        )
        return _kll_to_table(_kll_compress(levels, k))

    sketch_rows = two_level_fold(
        ds.select_columns([value_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        merge,
    )
    tbl = pa.concat_tables(
        blk for blk in sketch_rows.iter_batches(batch_format="pyarrow")
    ) if sketch_rows.count() else _KLL_SCHEMA.empty_table()
    return tbl


def kll_quantile_values(
    sketch: pa.Table, quantiles: tuple[float, ...]
) -> dict[float, float]:
    """Quantile estimates from a (level, value) sketch table: sort the
    weighted items, walk cumulative weight to rank ceil(q·W) — the same
    1-indexed quantile_disc convention stages/selection.py uses."""
    import math

    lv = np.asarray(sketch["level"], dtype=np.int64)
    vals = np.asarray(sketch["value"], dtype=np.float64)
    if len(vals) == 0:
        return {float(q): float("nan") for q in quantiles}
    w = (1 << lv.astype(np.int64)).astype(np.int64)
    order = np.argsort(vals, kind="stable")
    vals, w = vals[order], w[order]
    cw = np.cumsum(w)
    W = int(cw[-1])
    out = {}
    for q in quantiles:
        target = max(1, math.ceil(float(q) * W))
        idx = int(np.searchsorted(cw, target, side="left"))
        out[float(q)] = float(vals[min(idx, len(vals) - 1)])
    return out


def kll_rank_check(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    quantiles: tuple[float, ...],
    k: int = KLL_K,
    eps: float = KLL_EPS,
) -> pa.Table:
    """The sketch's self-verifying quantile query: ONE sketch pass gives
    estimates v_q; ONE exact counting pass gives each estimate's true
    rank span [#<v_q + 1, #<=v_q]; the output row states whether that
    span intersects [q·n − eps·n, q·n + eps·n] — the KLL guarantee.
    Output (q_micro, n, within_bounds) is oracle-mirrorable exactly:
    q_micro are constants, n is the exact row count, within_bounds is
    TRUE whenever the sketch honors its bound."""
    import math

    from docling_api_ray.stages.common import two_level_fold

    qs = sorted(set(float(q) for q in quantiles))
    sk = kll_sketch(ds, value_col=value_col, k=k)
    est = kll_quantile_values(sk, tuple(qs))
    thresholds = np.array([est[q] for q in qs], dtype=np.float64)

    cnt_schema = pa.schema(
        [("i", pa.int64()), ("lt", pa.int64()), ("le", pa.int64())]
    )

    def count_partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return cnt_schema.empty_table()
        v = np.asarray(b[value_col], dtype=np.float64)
        v = v[~np.isnan(v)]
        lt = (v[None, :] < thresholds[:, None]).sum(axis=1)
        le = (v[None, :] <= thresholds[:, None]).sum(axis=1)
        return pa.table(
            {
                "i": pa.array(np.arange(len(qs), dtype=np.int64)),
                "lt": pa.array(lt.astype(np.int64)),
                "le": pa.array(le.astype(np.int64)),
            }
        )

    def count_merge(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return cnt_schema.empty_table()
        i = np.asarray(b["i"], dtype=np.int64)
        lt = np.zeros(len(qs), dtype=np.int64)
        le = np.zeros(len(qs), dtype=np.int64)
        np.add.at(lt, i, np.asarray(b["lt"], dtype=np.int64))
        np.add.at(le, i, np.asarray(b["le"], dtype=np.int64))
        return pa.table(
            {
                "i": pa.array(np.arange(len(qs), dtype=np.int64)),
                "lt": pa.array(lt),
                "le": pa.array(le),
            }
        )

    counts = {
        int(r["i"]): (int(r["lt"]), int(r["le"]))
        for r in two_level_fold(
            ds.select_columns([value_col]).map_batches(
                count_partial, batch_format="pyarrow"
            ),
            count_merge,
        ).take_all()
    }
    lv_arr = np.asarray(sk["level"], dtype=np.int64)
    # compaction is weight-preserving, so the sketch's total weight IS
    # the exact (non-NaN) row count
    n = int((1 << lv_arr).sum()) if len(lv_arr) else 0
    ok, qmicro = [], []
    for j, q in enumerate(qs):
        lt, le = counts.get(j, (0, 0))
        target = max(1, math.ceil(q * n)) if n else 0
        slack = eps * n
        # the estimate occupies ranks (lt, le]; bound holds iff that
        # span intersects [target - slack, target + slack]
        ok.append(
            n == 0 or (lt < target + slack and le >= target - slack)
        )
        qmicro.append(int(round(q * 1_000_000)))
    return pa.table(
        {
            "q_micro": pa.array(qmicro, type=pa.int64()),
            "n": pa.array([n] * len(qs), type=pa.int64()),
            "within_bounds": pa.array(ok, type=pa.bool_()),
        }
    )


_GKLL_SCHEMA = pa.schema(
    [("g", pa.string()), ("level", pa.int64()), ("value", pa.float64())]
)


def grouped_kll_sketch(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    value_col: str,
    k: int = KLL_K,
) -> pa.Table:
    """Per-GROUP KLL sketches in one streaming pass — the monitoring
    tier for per-source/per-language quantile drift where the exact
    grouped selection's multi-pass refinement is too expensive.
    BOUNDED-domain contract (the bounded_groupby_sum discipline): the
    fold state is |groups| × O(k·log) rows, so ``group_col`` must be a
    domain column (sources, langs, formats), never an id.  Output:
    (g, level, value) rows, one independent sketch per group."""
    from docling_api_ray.stages.common import two_level_fold

    def sketch_rows(groups: np.ndarray, levels, values, *, raw: bool):
        parts = []
        for g in np.unique(groups):
            m = groups == g
            if raw:
                lv = _kll_compress([values[m]], k)
            else:
                lv = _kll_compress(_kll_from_rows(levels[m], values[m]), k)
            t = _kll_to_table(lv)
            parts.append(
                t.add_column(0, "g", pa.array([str(g)] * len(t), pa.string()))
            )
        return (
            pa.concat_tables(parts) if parts else _GKLL_SCHEMA.empty_table()
        )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _GKLL_SCHEMA.empty_table()
        v = np.asarray(b[value_col], dtype=np.float64)
        g = np.asarray(b[group_col].to_pylist(), dtype=object)
        ok = ~np.isnan(v)
        return sketch_rows(g[ok], None, v[ok], raw=True)

    def merge(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _GKLL_SCHEMA.empty_table()
        return sketch_rows(
            np.asarray(b["g"].to_pylist(), dtype=object),
            np.asarray(b["level"], dtype=np.int64),
            np.asarray(b["value"], dtype=np.float64),
            raw=False,
        )

    rows = two_level_fold(
        ds.select_columns([group_col, value_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        merge,
    )
    return (
        pa.concat_tables(rows.iter_batches(batch_format="pyarrow"))
        if rows.count()
        else _GKLL_SCHEMA.empty_table()
    )


def grouped_kll_rank_check(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...],
    k: int = KLL_K,
    eps: float = KLL_EPS,
) -> pa.Table:
    """Per-group self-verifying KLL quantiles (the grouped sibling of
    ``kll_rank_check``): one grouped sketch pass for the estimates, one
    exact grouped counting pass for each estimate's true rank span, and
    a per-(group, q) bound assertion.  Output (group, q_micro, n,
    within_bounds) — n is the exact per-group count, so the SQL mirror
    is data-derived, and within_bounds flips the value hash if any
    group's sketch violates its eps·n guarantee."""
    import math

    from docling_api_ray.stages.common import two_level_fold

    qs = sorted(set(float(q) for q in quantiles))
    sk = grouped_kll_sketch(
        ds, group_col=group_col, value_col=value_col, k=k
    )
    g_arr = np.asarray(sk["g"].to_pylist(), dtype=object)
    groups = sorted(str(g) for g in np.unique(g_arr)) if len(g_arr) else []
    est: dict[str, dict[float, float]] = {}
    n_of: dict[str, int] = {}
    for g in groups:
        m = g_arr == g
        sub = pa.table({"level": sk["level"].filter(pa.array(m)),
                        "value": sk["value"].filter(pa.array(m))})
        est[g] = kll_quantile_values(sub, tuple(qs))
        lv = np.asarray(sub["level"], dtype=np.int64)
        n_of[g] = int((1 << lv).sum()) if len(lv) else 0

    th = {g: np.array([est[g][q] for q in qs]) for g in groups}
    cnt_schema = pa.schema(
        [("g", pa.string()), ("i", pa.int64()),
         ("lt", pa.int64()), ("le", pa.int64())]
    )

    def count_partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return cnt_schema.empty_table()
        v = np.asarray(b[value_col], dtype=np.float64)
        gv = np.asarray(b[group_col].to_pylist(), dtype=object)
        ok = ~np.isnan(v)
        v, gv = v[ok], gv[ok]
        gs, iss, lts, les = [], [], [], []
        for g in np.unique(gv):
            if str(g) not in th:
                continue
            vv = v[gv == g]
            lt = (vv[None, :] < th[str(g)][:, None]).sum(axis=1)
            le = (vv[None, :] <= th[str(g)][:, None]).sum(axis=1)
            gs += [str(g)] * len(qs)
            iss += list(range(len(qs)))
            lts += list(lt)
            les += list(le)
        return pa.table(
            {
                "g": pa.array(gs, pa.string()),
                "i": pa.array(np.asarray(iss, dtype=np.int64)),
                "lt": pa.array(np.asarray(lts, dtype=np.int64)),
                "le": pa.array(np.asarray(les, dtype=np.int64)),
            }
        )

    def count_merge(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return cnt_schema.empty_table()
        import pandas as pd

        df = b.to_pandas().groupby(["g", "i"], sort=False).sum().reset_index()
        return pa.table(
            {
                "g": pa.array(df["g"].astype(str), pa.string()),
                "i": pa.array(df["i"].to_numpy(np.int64)),
                "lt": pa.array(df["lt"].to_numpy(np.int64)),
                "le": pa.array(df["le"].to_numpy(np.int64)),
            }
        )

    counts = {
        (str(r["g"]), int(r["i"])): (int(r["lt"]), int(r["le"]))
        for r in two_level_fold(
            ds.select_columns([group_col, value_col]).map_batches(
                count_partial, batch_format="pyarrow"
            ),
            count_merge,
        ).take_all()
    }
    out_g, out_q, out_n, out_ok = [], [], [], []
    for g in groups:
        n = n_of[g]
        for j, q in enumerate(qs):
            lt, le = counts.get((g, j), (0, 0))
            target = max(1, math.ceil(q * n)) if n else 0
            slack = eps * n
            out_g.append(g)
            out_q.append(int(round(q * 1_000_000)))
            out_n.append(n)
            out_ok.append(
                n == 0 or (lt < target + slack and le >= target - slack)
            )
    return pa.table(
        {
            group_col: pa.array(out_g, pa.string()),
            "q_micro": pa.array(out_q, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
            "within_bounds": pa.array(out_ok, pa.bool_()),
        }
    )


def grouped_heavy_hitters(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    text_col: str = "text",
    num: int = 1,
    den: int = 30,
    k: int | None = None,
) -> ray.data.Dataset:
    """Per-GROUP heavy hitters — the boilerplate-phrase monitor a crawl
    pipeline runs per source: for every group, the EXACT counts of every
    word whose frequency strictly exceeds ``num/den`` of that group's
    token occurrences.

    Same two-pass discipline as the global ``heavy_hitters`` (approximate
    candidates, exact output): pass 1 folds per-(group, word) Misra-Gries
    summaries — ≤ |groups|·k counters per batch regardless of vocabulary
    (bounded-domain contract: ``group_col`` is a domain column) — plus
    per-group token totals; the merged candidate set is ≤ |groups|·k.
    Pass 2 exactly counts ONLY the candidate (group, word) pairs via a
    broadcast ``is_in`` filter + bounded fold, then applies the integer
    threshold ``n·den > N_g·num``, which the DuckDB mirror states
    verbatim.  MG undercount ≤ N_g/(k+1) per group, so k = 2·den/num
    guarantees no qualifying word is missed.  Output
    (group, word, n) exact."""
    if k is None:
        k = max(8, (2 * den) // max(1, num))

    part_schema = pa.schema(
        [
            ("g", pa.string()),
            ("word", pa.string()),
            ("n", pa.int64()),
            ("total", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return part_schema.empty_table()
        texts = pc.fill_null(b[text_col], "")
        if not isinstance(texts, pa.ChunkedArray):
            texts = pa.chunked_array([texts])
        groups = np.asarray(b[group_col].to_pylist(), dtype=object)
        out_g, out_w, out_n, out_t = [], [], [], []
        for g in np.unique(groups):
            m = pa.array(groups == g)
            toks = pc.list_flatten(pc.split_pattern(texts.filter(m), " "))
            toks = toks.filter(pc.not_equal(toks, ""))
            n_tok = len(toks)
            if n_tok == 0:
                continue
            gb = pa.table({"w": toks}).group_by(["w"]).aggregate(
                [([], "count_all")]
            )
            words = np.asarray(gb["w"].to_pylist(), dtype=object)
            counts = gb["count_all"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            words, counts = _mg_truncate(words, counts, k)
            out_g += [str(g)] * (len(words) + 1)
            out_w += list(map(str, words)) + [""]  # "" = the total sentinel
            out_n += list(counts) + [0]
            out_t += [0] * len(words) + [n_tok]
        return pa.table(
            {
                "g": pa.array(out_g, pa.string()),
                "word": pa.array(out_w, pa.string()),
                "n": pa.array(np.asarray(out_n, dtype=np.int64)),
                "total": pa.array(np.asarray(out_t, dtype=np.int64)),
            }
        )

    rows = ds.select_columns([group_col, text_col]).map_batches(
        partial, batch_format="pyarrow"
    ).take_all()  # ≤ (|groups|·(k+1)) rows per block — sketch-bounded
    if not rows:
        return ray.data.from_arrow(
            pa.schema(
                [(group_col, pa.string()), ("word", pa.string()),
                 ("n", pa.int64())]
            ).empty_table()
        )
    df = pd.DataFrame(rows)
    totals = df[df["word"] == ""].groupby("g")["total"].sum().to_dict()
    cand: dict[str, list[str]] = {}
    for g, sub in df[df["word"] != ""].groupby("g"):
        merged = sub.groupby("word")["n"].sum()
        words, _ = _mg_truncate(
            merged.index.to_numpy(dtype=object), merged.to_numpy(), k
        )
        cand[str(g)] = sorted(map(str, words))
    cand_ref = ray.put(cand)

    exact_schema = pa.schema(
        [("g", pa.string()), ("word", pa.string()), ("n", pa.int64())]
    )

    def exact(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return exact_schema.empty_table()
        c = ray.get(cand_ref)
        texts = pc.fill_null(b[text_col], "")
        if not isinstance(texts, pa.ChunkedArray):
            texts = pa.chunked_array([texts])
        groups = np.asarray(b[group_col].to_pylist(), dtype=object)
        out_g, out_w, out_n = [], [], []
        for g in np.unique(groups):
            cw = c.get(str(g))
            if not cw:
                continue
            m = pa.array(groups == g)
            toks = pc.list_flatten(pc.split_pattern(texts.filter(m), " "))
            toks = toks.filter(
                pc.is_in(toks, value_set=pa.array(cw, pa.string()))
            )
            if len(toks) == 0:
                continue
            gb = pa.table({"w": toks}).group_by(["w"]).aggregate(
                [([], "count_all")]
            )
            out_g += [str(g)] * len(gb)
            out_w += [str(w) for w in gb["w"].to_pylist()]
            out_n += [int(x) for x in gb["count_all"].to_pylist()]
        return pa.table(
            {
                "g": pa.array(out_g, pa.string()),
                "word": pa.array(out_w, pa.string()),
                "n": pa.array(np.asarray(out_n, dtype=np.int64)),
            }
        )

    counts = bounded_groupby_sum(
        ds.select_columns([group_col, text_col]).map_batches(
            exact, batch_format="pyarrow"
        ),
        ["g", "word"],
        sum_cols={"n": "n"},
    )

    def threshold(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.schema(
                [(group_col, pa.string()), ("word", pa.string()),
                 ("n", pa.int64())]
            ).empty_table()
        tot = np.array(
            [totals.get(str(g), 0) for g in b["g"].to_pylist()],
            dtype=np.int64,
        )
        n = np.asarray(b["n"], dtype=np.int64)
        keep = pa.array(n * den > tot * num)
        out = b.filter(keep)
        return pa.table(
            {
                group_col: out["g"].cast(pa.string()),
                "word": out["word"].cast(pa.string()),
                "n": out["n"].cast(pa.int64()),
            }
        )

    return counts.map_batches(threshold, batch_format="pyarrow")


def bloom_fpr_eval(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_mod: int = 50,
) -> pa.Table:
    """Bloom-filter false-positive-rate eval — the membership member of
    the self-verifying sketch-eval family: build the decontamination
    filter over the benchmark docs, probe every doc whose CONTENT hash
    is not in the member set (a duplicate of a benchmark doc is a TRUE
    positive), and compare the realized FPR against the
    (1 − (1−1/m)^{kn})^k theory at a 3× slack.

    Same scale contract as bloom_membership: the member hash set and
    the M-bit array are filter-bounded broadcasts; the probe counts are
    a stateless two-column fold.  The theory term carries the libm-pow
    last-ulp caveat (idf-class accepted risk), micro-quantized."""
    import math

    import ray as _ray

    from docling_api_ray.functions.hashing import u64_md5
    from docling_api_ray.stages.common import two_level_fold

    def member_hashes(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        mask = ids % bench_mod == 0
        texts = np.asarray(
            b[text_col].to_numpy(zero_copy_only=False), dtype=object
        )[mask]
        u = (
            np.unique(u64_md5(texts)) if len(texts)
            else np.zeros(0, dtype=np.uint64)
        )
        return pa.table({"u": pa.array(u.view(np.int64), type=pa.int64())})

    mh_parts = [
        np.asarray(blk["u"], dtype=np.int64)
        for blk in ds.map_batches(
            member_hashes, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
    ]
    mh = (
        np.unique(np.concatenate(mh_parts))
        if mh_parts
        else np.zeros(0, dtype=np.int64)
    )
    bits = np.zeros(BLOOM_M, dtype=bool)
    if len(mh):
        bits[_bloom_positions(mh.view(np.uint64))] = True
    state_ref = _ray.put((bits, mh))

    def counts(b: pa.Table) -> pa.Table:
        texts = np.asarray(
            b[text_col].to_numpy(zero_copy_only=False), dtype=object
        )
        u = u64_md5(texts)
        bits_l, mh_l = ray.get(state_ref)
        maybe = (
            bits_l[_bloom_positions(u)].all(axis=1)
            if len(u)
            else np.zeros(0, dtype=bool)
        )
        probe = ~np.isin(u.view(np.int64), mh_l)
        return pa.table(
            {
                "n_probe": pa.array(
                    [int(probe.sum())], type=pa.int64()
                ),
                "n_fp": pa.array(
                    [int((probe & maybe).sum())], type=pa.int64()
                ),
            }
        )

    def fold(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                c: pa.array(
                    [pc.sum(b[c]).as_py() or 0], type=pa.int64()
                )
                for c in ("n_probe", "n_fp")
            }
        )

    row = two_level_fold(
        ds.map_batches(counts, batch_format="pyarrow"), fold
    ).take_all()[0]
    tot = {k: int(v) for k, v in row.items()}
    n = len(mh)
    fpr = tot["n_fp"] / tot["n_probe"] if tot["n_probe"] else None
    p = (1.0 - (1.0 - 1.0 / BLOOM_M) ** (BLOOM_K * n)) ** BLOOM_K
    return pa.table(
        {
            "m": pa.array([BLOOM_M], type=pa.int64()),
            "k": pa.array([BLOOM_K], type=pa.int64()),
            "n_member_hashes": pa.array([n], type=pa.int64()),
            "n_probes": pa.array([tot["n_probe"]], type=pa.int64()),
            "n_false_pos": pa.array([tot["n_fp"]], type=pa.int64()),
            "fpr": pa.array([fpr], type=pa.float64()),
            "p_theory_micro": pa.array(
                [int(math.floor(p * 1e6 + 0.5))], type=pa.int64()
            ),
            "within_3x_theory": pa.array(
                [fpr <= 3.0 * p if fpr is not None else None],
                type=pa.bool_(),
            ),
        }
    )
