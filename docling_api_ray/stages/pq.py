"""Product-quantization ANN (Jégou et al. 2011, "Product Quantization
for Nearest Neighbor Search") — the memory-scale path of similarity
search: each 64-dim vector compresses to M=8 one-byte codes (one per
8-dim subspace, 16 centroids each), queries score candidates with
asymmetric distance computation (ADC) — a (M × 16) lookup table per
query, one table-gather sum per candidate — never touching the full
vectors.

At 100 TB this is the design that matters: codes are 8 bytes/vector
(512× smaller than float32 embeddings), the scan is a streaming
``map_batches`` over the code column, and the only broadcast state is
the codebook + per-query tables (KBs).  Here codes are computed and
scored in ONE fused pass (quantize → assign → ADC → local top-k) so the
conformance query stays a single streaming job; the production path
would persist the code column once (write_parquet) and scan only it.

Exactness design — everything after the one-time micro-quantization is
INTEGER:

- coordinates quantize via ``floor(float64(x) * 1e6)`` (floor, not
  round: no half-way rounding-mode divergence between numpy and SQL);
- the codebook is int64 micro units (the fixed conformance codebook is
  seeded-random at data scale; ``train_pq_codebook`` Lloyd-trains a
  real one — its float mean is rounded back to ints each iteration so
  assignment stays integer-exact);
- subspace distance = Σ (v_j − c_j)² over 8 coords — int64, order-free;
- assignment = argmin (distance, then centroid id);
- ADC total = Σ_m table[m][code_m] — a sum of M int64s; ranking by
  (adc asc, vec_id asc) is a pure integer total order the DuckDB
  oracle replays bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from docling_api_ray.stages.similarity import embedding_matrix

M_SUB = 8  # subspaces
K_CODE = 16  # centroids per subspace
DIM = 64
D_SUB = DIM // M_SUB
MICRO = 1_000_000


def quantize_micro(mat: np.ndarray) -> np.ndarray:
    """float embedding matrix → int64 micro coordinates via floor."""
    return np.floor(np.asarray(mat, dtype=np.float64) * MICRO).astype(
        np.int64
    )


def fixed_pq_codebook(seed: int = 1117, scale: int = 100_000) -> np.ndarray:
    """Deterministic data-independent codebook (M, K, d_sub) int64 micro
    — the conformance-query analog of the fixed IVF quantizer: seeded
    normal draws at the corpus's coordinate scale (unit-norm 64-dim
    vectors have |x| ≈ 0.1), floored to integers.  Recall of a TRAINED
    codebook is covered by tests (train_pq_codebook), keeping the whole
    assign + ADC + top-k machinery oracle-checkable."""
    rng = np.random.RandomState(seed)
    return np.floor(rng.randn(M_SUB, K_CODE, D_SUB) * scale).astype(np.int64)


def _sub_views(vm: np.ndarray) -> np.ndarray:
    """(N, DIM) int64 → (N, M, d_sub) subspace view (no copy)."""
    return vm.reshape(vm.shape[0], M_SUB, D_SUB)


def assign_codes(vm: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """(N, DIM) micro ints → (N, M) int64 codes: per-subspace argmin of
    the integer squared distance, ties to the lower centroid id (numpy
    argmin keeps the first minimum — the oracle's (d, cid) order)."""
    sub = _sub_views(vm)  # (N, M, d)
    # distances (N, M, K): Σ_j (v − c)² expanded as v·v − 2 v·c + c·c so
    # the (N, M, K, d) broadcast never materializes
    v2 = np.einsum("nmd,nmd->nm", sub, sub)[:, :, None]
    c2 = np.einsum("mkd,mkd->mk", codebook, codebook)[None, :, :]
    vc = np.einsum("nmd,mkd->nmk", sub, codebook)
    dist = v2 - 2 * vc + c2
    return np.argmin(dist, axis=2).astype(np.int64)


def adc_tables(qm: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """(Q, DIM) micro ints → (Q, M, K) int64 ADC lookup tables."""
    sub = _sub_views(qm)
    v2 = np.einsum("qmd,qmd->qm", sub, sub)[:, :, None]
    c2 = np.einsum("mkd,mkd->mk", codebook, codebook)[None, :, :]
    vc = np.einsum("qmd,mkd->qmk", sub, codebook)
    return v2 - 2 * vc + c2


def train_pq_codebook(
    sample: np.ndarray, *, iters: int = 8, seed: int = 42
) -> np.ndarray:
    """Integer Lloyd per subspace on a driver-side sample (micro ints):
    assignment uses the same exact integer distances as ``assign_codes``;
    the new centroid is the coordinate-wise mean rounded back to int64,
    so every iteration's state is integer and the result is
    machine-independent."""
    sample = np.asarray(sample, dtype=np.int64)
    rng = np.random.RandomState(seed)
    cb = np.empty((M_SUB, K_CODE, D_SUB), dtype=np.int64)
    sub = _sub_views(sample)
    for m in range(M_SUB):
        pts = sub[:, m, :]
        idx = rng.choice(len(pts), size=min(K_CODE, len(pts)), replace=False)
        cents = pts[np.sort(idx)].copy()
        for _ in range(iters):
            d = (
                np.einsum("nd,nd->n", pts, pts)[:, None]
                - 2 * pts @ cents.T
                + np.einsum("kd,kd->k", cents, cents)[None, :]
            )
            assign = np.argmin(d, axis=1)
            for c in range(len(cents)):
                members = pts[assign == c]
                if len(members):
                    cents[c] = np.rint(members.mean(axis=0)).astype(np.int64)
        cb[m] = cents
    return cb


_PQ_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("vec_id", pa.int64()),
        ("adc", pa.int64()),
        ("rank", pa.int64()),
    ]
)


class _PQBatchTopK:
    """Fused quantize → assign → ADC → local top-k per batch; codebook
    and per-query tables fetched once per actor."""

    def __init__(self, state_ref, k: int) -> None:
        qids, tables, codebook, exclude = ray.get(state_ref)
        self.qids = np.asarray(qids, dtype=np.int64)
        self.tables = tables  # (Q, M, K) int64
        self.codebook = codebook
        self.exclude = exclude  # frozenset of vec_ids (the queries)
        self.k = k

    _EMPTY = pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()), ("adc", pa.int64())]
    ).empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        if self.exclude:
            keep = ~np.isin(ids, np.fromiter(self.exclude, dtype=np.int64))
            batch, ids = batch.filter(pa.array(keep)), ids[keep]
        if len(ids) == 0:
            return self._EMPTY
        vm = quantize_micro(embedding_matrix(batch["embedding"]))
        codes = assign_codes(vm, self.codebook)  # (N, M)
        k = min(self.k, len(ids))
        marange = np.arange(M_SUB)
        out_q, out_id, out_d = [], [], []
        for qi in range(len(self.qids)):
            # gather-sum: adc[n] = Σ_m T[m, codes[n, m]]
            adc = self.tables[qi][marange[None, :], codes].sum(axis=1)
            order = np.lexsort((ids, adc))[:k]
            out_q.extend([int(self.qids[qi])] * len(order))
            out_id.extend(ids[order].tolist())
            out_d.extend(adc[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "adc": pa.array(out_d, type=pa.int64()),
            }
        )


def pq_knn(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    codebook: np.ndarray,
    *,
    k: int = 10,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Approximate top-k by PQ/ADC: (query_id, vec_id, adc, rank) with
    rank 1..k per query ordered by (adc asc, vec_id asc)."""
    from docling_api_ray.stages.similarity import _reduce_partitions

    qm = quantize_micro(np.asarray(query_matrix, dtype=np.float64))
    tables = adc_tables(qm, codebook)
    exclude = frozenset(int(q) for q in query_ids) if exclude_self else frozenset()
    ref = ray.put(
        (list(map(int, query_ids)), tables, np.asarray(codebook), exclude)
    )
    partial = ds.map_batches(
        _PQBatchTopK,
        fn_constructor_kwargs={"state_ref": ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )

    def reduce_group(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["adc", "vec_id"], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return pa.Table.from_pandas(
            g[["query_id", "vec_id", "adc", "rank"]],
            schema=_PQ_SCHEMA,
            preserve_index=False,
        ).replace_schema_metadata(None)

    return (
        partial.repartition(_reduce_partitions(len(query_ids)))
        .groupby("query_id")
        .map_groups(reduce_group, batch_format="pandas")
    )
