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

import hashlib
from functools import lru_cache

import numpy as np
import pyarrow as pa

import ray.data

from docling_api_ray.stages.clustering import quantized_matrix
from docling_api_ray.stages.common import bounded_groupby_sum, two_level_fold


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


@lru_cache(maxsize=8)
def rp_sign_matrix(dim: int, out_dim: int) -> np.ndarray:
    """Deterministic (dim × out_dim) ±1 sign matrix for the sparse
    Johnson-Lindenstrauss projection: sign(i, j) from one md5 bit of the
    string ``"rp:{i}:{j}"``.  Content-addressed, so every actor (and the
    DuckDB oracle, which embeds the same matrix as a VALUES literal via
    ``rp_sign_values_sql``) regenerates the identical matrix with no
    broadcast — the matrix is dim·out_dim ints, corpus-independent."""
    signs = np.empty((dim, out_dim), dtype=np.int64)
    for i in range(dim):
        for j in range(out_dim):
            bit = hashlib.md5(f"rp:{i}:{j}".encode()).digest()[0] & 1
            signs[i, j] = 1 if bit else -1
    return signs


def rp_sign_values_sql(dim: int, out_dim: int) -> str:
    """The sign matrix as a SQL ``(VALUES ...)`` literal ``r(i, j, s)``
    so the oracle reproduces the projection bit-for-bit."""
    signs = rp_sign_matrix(dim, out_dim)
    rows = ",".join(
        f"({i},{j},{int(signs[i, j])})"
        for i in range(dim)
        for j in range(out_dim)
    )
    return f"(VALUES {rows})"


def random_projection(ds: ray.data.Dataset, out_dim: int = 8) -> ray.data.Dataset:
    """Sparse-sign Johnson-Lindenstrauss projection of the quantized
    ``embedding`` column: ``proj[r, j] = Σ_i q[r, i] · sign(i, j)`` as
    long-format (vec_id, j, proj) int64 rows — the dimensionality-
    reduction primitive for sketching / LSH seeding at 100 TB.

    Scale shape: a pure per-batch map (one int64 matmul against the
    content-addressed sign matrix), NO shuffle, no driver state; output
    rows = out_dim × corpus rows, streamed.  Exactness: integer
    arithmetic end-to-end (micro-unit quantizer × ±1), so the DuckDB
    mirror (unnest + VALUES join) matches bit-for-bit.  Overflow bound:
    |proj| ≤ dim·1e6·max|x| — at dim 64, |x| ≤ 10 that is ≤ 6.4e8,
    ~10¹⁰ headroom in int64."""
    out_schema = pa.schema(
        [("vec_id", pa.int64()), ("j", pa.int64()), ("proj", pa.int64())]
    )

    def project(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        q = quantized_matrix(b["embedding"])
        if q.size == 0:
            return out_schema.empty_table()
        signs = rp_sign_matrix(q.shape[1], out_dim)
        p = q @ signs  # (n, out_dim) int64 — exact
        vid = np.asarray(b["vec_id"], dtype=np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vid, out_dim)),
                "j": pa.array(
                    np.tile(np.arange(out_dim, dtype=np.int64), len(vid))
                ),
                "proj": pa.array(p.ravel()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def _moment_partials(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Fold (count, per-dim sums, gram) in ONE bounded exchange as
    (i, j, v) rows: (-1, -1) → row count, (i, -1) → Σ q_i, (i, j) →
    Σ q_i·q_j.  Domain = dim² + dim + 1 rows, corpus-independent."""

    schema = pa.schema([("i", pa.int64()), ("j", pa.int64()), ("v", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return schema.empty_table()
        q = quantized_matrix(b["embedding"])
        if q.size == 0:
            return schema.empty_table()
        dim = q.shape[1]
        g = q.T @ q
        s = q.sum(axis=0)
        i = np.concatenate(
            [
                np.repeat(np.arange(dim, dtype=np.int64), dim),
                np.arange(dim, dtype=np.int64),
                np.array([-1], dtype=np.int64),
            ]
        )
        j = np.concatenate(
            [
                np.tile(np.arange(dim, dtype=np.int64), dim),
                np.full(dim, -1, dtype=np.int64),
                np.array([-1], dtype=np.int64),
            ]
        )
        v = np.concatenate([g.ravel(), s, np.array([len(q)], dtype=np.int64)])
        return pa.table({"i": pa.array(i), "j": pa.array(j), "v": pa.array(v)})

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by(["i", "j"]).aggregate([("v", "sum")])
        return g.rename_columns(["i", "j", "v"])

    return two_level_fold(
        ds.map_batches(partial, batch_format="pyarrow"), fold
    )


def pca_components(
    ds: ray.data.Dataset, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-``k`` principal components of the ``embedding`` column.

    Distribution shape: the corpus never leaves the stream — one
    ``_moment_partials`` fold reduces it to dim² + dim + 1 integer rows;
    the eigendecomposition runs DRIVER-SIDE on the folded dim×dim
    covariance (dim is a model constant, 64 here — the classic
    "covariance fits, data doesn't" regime).  Sign convention: each
    component is flipped so its largest-|coordinate| entry (first index
    on ties) is positive, making the output deterministic across BLAS
    builds up to eigenvalue multiplicity.

    Returns (mean (dim,), eigenvalues (k,), components (dim, k)) in
    ORIGINAL float units (micro-unit quantization divided back out)."""
    rows = _moment_partials(ds).take_all()
    n = next(r["v"] for r in rows if r["i"] == -1)
    dim = max(r["i"] for r in rows) + 1
    s = np.zeros(dim, dtype=np.float64)
    g = np.zeros((dim, dim), dtype=np.float64)
    for r in rows:
        if r["i"] == -1:
            continue
        if r["j"] == -1:
            s[r["i"]] = r["v"]
        else:
            g[r["i"], r["j"]] = r["v"]
    mean = s / n
    cov = (g - np.outer(mean, s)) / n
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    flips = np.where(comps[np.abs(comps).argmax(axis=0), np.arange(k)] < 0, -1.0, 1.0)
    comps = comps * flips
    scale = 1e-6  # micro-units → original float units
    return mean * scale, w[order] * (scale * scale), comps


def pca_project(ds: ray.data.Dataset, k: int = 4) -> ray.data.Dataset:
    """Project each embedding onto the top-``k`` principal components:
    (vec_id, pc0..pc{k-1}) rounded to 6 dp for cross-platform stability.

    Two streaming passes over the input (moment fold, then a stateless
    projection map with the (dim×k) component matrix value-captured into
    the task closure — kilobytes, shipped once per task not per batch);
    no full materialization anywhere.  Not SQL-expressible (eigen), so
    the correctness pin is ``tests/test_linalg.py`` against a one-shot
    numpy PCA on the same rows."""
    mean, _, comps = pca_components(ds, k)
    names = [f"pc{j}" for j in range(k)]
    out_schema = pa.schema(
        [("vec_id", pa.int64())] + [(nm, pa.float64()) for nm in names]
    )
    mean_q = mean * 1e6

    def project(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        q = quantized_matrix(b["embedding"]).astype(np.float64)
        p = ((q - mean_q) * 1e-6) @ comps
        cols = {"vec_id": pa.array(np.asarray(b["vec_id"], dtype=np.int64))}
        for jj, nm in enumerate(names):
            cols[nm] = pa.array(np.round(p[:, jj], 6))
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def ridge_fit(
    ds: ray.data.Dataset,
    *,
    label_col: str = "label",
    lam: float = 1.0,
) -> tuple[np.ndarray, float]:
    """Closed-form ridge regression of ``label_col`` on the embedding
    column — the linear-probe fit behind embedding-quality classifiers,
    in the same "sufficient statistics fit, data doesn't" regime as
    ``pca_components``.

    ONE streaming pass folds the exact integer sufficient statistics
    (XᵀX via the gram partial, Xᵀy and Σy via label-weighted sums,
    count) into dim² + 2·dim + 2 rows; the driver then solves the
    (dim+1)×(dim+1) centered normal equations.  No iteration, no
    materialization, deterministic (integer folds are order-free).

    Returns (weights (dim,), intercept)."""
    schema = pa.schema([("i", pa.int64()), ("j", pa.int64()), ("v", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return schema.empty_table()
        q = quantized_matrix(b["embedding"])
        if q.size == 0:
            return schema.empty_table()
        y = np.asarray(b[label_col], dtype=np.int64)
        dim = q.shape[1]
        g = q.T @ q                      # (i, j): Σ q_i q_j
        xy = q.T @ y                     # (i, -2): Σ q_i y
        s = q.sum(axis=0)                # (i, -1): Σ q_i
        rng = np.arange(dim, dtype=np.int64)
        i = np.concatenate(
            [np.repeat(rng, dim), rng, rng,
             np.array([-1, -2], dtype=np.int64)]
        )
        j = np.concatenate(
            [np.tile(rng, dim),
             np.full(dim, -1, dtype=np.int64),
             np.full(dim, -2, dtype=np.int64),
             np.array([-1, -2], dtype=np.int64)]
        )
        v = np.concatenate(
            [g.ravel(), s, xy,
             np.array([len(q), y.sum()], dtype=np.int64)]
        )
        return pa.table({"i": pa.array(i), "j": pa.array(j), "v": pa.array(v)})

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by(["i", "j"]).aggregate([("v", "sum")])
        return g.rename_columns(["i", "j", "v"])

    rows = two_level_fold(
        ds.map_batches(partial, batch_format="pyarrow"), fold
    ).take_all()
    n = next(r["v"] for r in rows if r["i"] == -1 and r["j"] == -1)
    ysum = next(r["v"] for r in rows if r["i"] == -2 and r["j"] == -2)
    dim = max(r["i"] for r in rows) + 1
    s = np.zeros(dim, dtype=np.float64)
    xy = np.zeros(dim, dtype=np.float64)
    g = np.zeros((dim, dim), dtype=np.float64)
    for r in rows:
        if r["i"] < 0:
            continue
        if r["j"] == -1:
            s[r["i"]] = r["v"]
        elif r["j"] == -2:
            xy[r["i"]] = r["v"]
        else:
            g[r["i"], r["j"]] = r["v"]
    sc = 1e-6  # micro-units → original float units
    mean = s * sc / n
    ymean = ysum / n
    # centered normal equations: (XcᵀXc + λI) w = Xcᵀyc
    xtx = g * sc * sc - np.outer(mean, s * sc)
    xty = xy * sc - mean * ysum
    w = np.linalg.solve(xtx + lam * np.eye(dim), xty)
    return w, float(ymean - mean @ w)


def ridge_predict(
    ds: ray.data.Dataset, *, label_col: str = "label", lam: float = 1.0
) -> ray.data.Dataset:
    """Fit ridge on the full stream, then score every row in a second
    stateless pass (weights value-captured, kilobytes per task):
    (vec_id, pred) with pred rounded to 6 dp.  Not SQL-expressible
    (matrix solve) — pinned against a one-shot numpy solve in
    tests/test_linalg.py."""
    w, b0 = ridge_fit(ds, label_col=label_col, lam=lam)
    out_schema = pa.schema([("vec_id", pa.int64()), ("pred", pa.float64())])

    def score(bt: pa.Table) -> pa.Table:
        if len(bt) == 0:
            return out_schema.empty_table()
        q = quantized_matrix(bt["embedding"]).astype(np.float64) * 1e-6
        return pa.table(
            {
                "vec_id": pa.array(np.asarray(bt["vec_id"], dtype=np.int64)),
                "pred": pa.array(np.round(q @ w + b0, 6)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def quantize_embeddings(
    ds: ray.data.Dataset,
    *,
    levels: int = 254,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Post-training INT8 quantization of the embedding column — the
    4x-storage-compression step a 100 TB vector corpus pays before ANN
    serving: per-dimension min/max affine codes in [-levels/2, levels/2]
    (symmetric 254-level int8 for the default).

    Two passes, both bounded:
      1. per-dim (min, max) RANGE fold — each batch reduces to ``dim``
         rows, folded through ``two_level_fold`` (idempotent grouped
         min/max), and only the dim-bounded result (64 rows here,
         corpus-independent) reaches the driver for the broadcast.
      2. stateless code pass — pure int64 affine
         ``code = (q - mn) * levels // max(mx - mn, 1) - levels//2``
         over the micro-unit quantized matrix; floor division on a
         non-negative numerator, so the DuckDB ``//`` mirror is
         bit-exact.

    Output: long-format (vec_id, i, code) int64 rows (the same layout
    as ``random_projection``, oracle-friendly and schema-stable)."""
    rng_schema = pa.schema(
        [("i", pa.int64()), ("mn", pa.int64()), ("mx", pa.int64())]
    )

    def rng_partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return rng_schema.empty_table()
        q = quantized_matrix(b["embedding"])
        if q.size == 0:
            return rng_schema.empty_table()
        return pa.table(
            {
                "i": pa.array(np.arange(q.shape[1], dtype=np.int64)),
                "mn": pa.array(q.min(axis=0)),
                "mx": pa.array(q.max(axis=0)),
            }
        )

    def rng_fold(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return rng_schema.empty_table()
        df = b.to_pandas()
        agg = (
            df.groupby("i", sort=True)
            .agg(mn=("mn", "min"), mx=("mx", "max"))
            .reset_index()
        )
        return pa.table(
            {
                "i": pa.array(agg["i"].to_numpy(dtype=np.int64)),
                "mn": pa.array(agg["mn"].to_numpy(dtype=np.int64)),
                "mx": pa.array(agg["mx"].to_numpy(dtype=np.int64)),
            }
        )

    # dim-bounded rows (corpus-independent) — driver collect is safe
    rng_rows = two_level_fold(
        ds.map_batches(rng_partial, batch_format="pyarrow"), rng_fold
    ).take_all()
    dim = len(rng_rows)
    mn = np.zeros(dim, dtype=np.int64)
    mx = np.zeros(dim, dtype=np.int64)
    for r in rng_rows:
        mn[int(r["i"])] = int(r["mn"])
        mx[int(r["i"])] = int(r["mx"])
    ref = ray.put((mn, mx))
    half = levels // 2

    out_schema = pa.schema(
        [(id_col, pa.int64()), ("i", pa.int64()), ("code", pa.int64())]
    )

    def encode(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        q = quantized_matrix(b["embedding"])
        if q.size == 0:
            return out_schema.empty_table()
        mn_, mx_ = ray.get(ref)
        span = np.maximum(mx_ - mn_, 1)
        code = (q - mn_) * levels // span - half
        vid = np.asarray(b[id_col], dtype=np.int64)
        d = q.shape[1]
        return pa.table(
            {
                id_col: pa.array(np.repeat(vid, d)),
                "i": pa.array(np.tile(np.arange(d, dtype=np.int64), len(vid))),
                "code": pa.array(code.ravel()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")
