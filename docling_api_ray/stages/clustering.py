"""Distributed k-means (Lloyd) over the embeddings table — the
clustering primitive behind curation recipes like SemDeDup (cluster,
then prune near-duplicates within clusters) and cluster-balanced
sampling.

Exactness contract: arithmetic is INTEGER end-to-end so the DuckDB
oracle matches bit-for-bit with no float-summation caveats.  Embedding
components quantize once to int64 micro-units via ``floor(x*1e6 + 0.5)``
(an expression both numpy and DuckDB evaluate identically in float64 —
unlike ``rint``/``round`` whose half-even vs half-away semantics
diverge); distances are exact int64 squared-L2 sums; centroid updates
are exact integer floor-division means (offset by +1e6 per component so
the nonnegative division truncates identically under numpy's floor-div
and DuckDB's truncating ``//``).

Scale shape per Lloyd iteration (the classic distributed k-means):
- centroids ship once per task (KB-sized, value-captured closures);
- ONE streaming assignment pass emits per-batch PARTIAL per-cluster
  (count, per-dim sum) rows — ≤ k rows per batch regardless of batch
  size, so the shuffle moves k·blocks tiny rows, never vectors;
- a k-row fold reaches the driver (bounded by k·dim ints).
Total: ``iters`` passes + one final labeling pass, no all-to-all over
the vectors at any point.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

SCALE = 1_000_000
OFF = 1_000_000  # component offset for the exact nonneg floor-division


def quantized_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Arrow ``list<float>`` → (N, dim) int64 micro-unit matrix via the
    deterministic ``floor(x*1e6 + 0.5)`` quantizer (module docstring)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=np.int64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if flat.size % n:
        raise ValueError("ragged embedding column")
    q = np.floor(flat * SCALE + 0.5).astype(np.int64)
    return q.reshape(n, flat.size // n)


def _assign(mat: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, squared-distance) per row; ties break to the LOWER
    centroid id (argmin-first == the oracle's ORDER BY d, cid)."""
    n, k = len(mat), len(cents)
    d = np.empty((n, k), dtype=np.int64)
    for j in range(k):
        diff = mat - cents[j]
        d[:, j] = np.einsum("ij,ij->i", diff, diff)
    a = np.argmin(d, axis=1)
    return a.astype(np.int64), d[np.arange(n), a]


def _partial_sums(cents):
    """Per-batch partial (cluster, count, per-dim sum) rows — ≤ k rows
    out per batch, the map-side combiner of the centroid update.

    A task-pool FUNCTION with the centroids captured BY VALUE in the
    closure (k×dim ints — a few KB serialized once per task) rather
    than an actor pool: each Lloyd iteration is its own short job, and
    per-job actor spin-up (~0.7 s/pool) dominated the whole k-means at
    bench scale (the 2000-row sf0.1 table costs <0.1 s of compute per
    pass).  Value capture, not a closure ObjectRef: inlined-ref
    dependency resolution under rapid job submission tripped a Ray
    core reference-count assertion in a full-battery run — for KB-sized
    state the object store buys nothing."""

    def partial(batch: pa.Table) -> pa.Table:
        dim = cents.shape[1]
        if len(batch) == 0:
            return pa.table(
                {
                    "cid": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "sums": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        mat = quantized_matrix(batch["embedding"])
        assign, _ = _assign(mat, cents)
        cids = np.unique(assign)
        sums = np.zeros((len(cids), dim), dtype=np.int64)
        counts = np.zeros(len(cids), dtype=np.int64)
        for i, c in enumerate(cids):
            members = mat[assign == c]
            sums[i] = members.sum(axis=0)
            counts[i] = len(members)
        return pa.table(
            {
                "cid": pa.array(cids),
                "n": pa.array(counts),
                "sums": pa.array(list(sums), type=pa.list_(pa.int64())),
            }
        )

    return partial


def _assign_final(cents, with_embedding: bool = False):
    """``with_embedding=True`` passes the embedding column through so a
    downstream within-cluster stage (SemDeDup) needs NO join to reunite
    vectors with their cluster ids.  Task-pool function with
    value-captured centroids, for the same reasons as
    ``_partial_sums``."""

    def assign_batch(batch: pa.Table) -> pa.Table:
        fields = [
            ("vec_id", pa.int64()),
            ("cluster", pa.int64()),
            ("dist", pa.int64()),
        ]
        if with_embedding:
            fields.append(("embedding", batch.schema.field("embedding").type))
        if len(batch) == 0:
            return pa.schema(fields).empty_table()
        mat = quantized_matrix(batch["embedding"])
        assign, dist = _assign(mat, cents)
        cols = {
            "vec_id": batch["vec_id"],
            "cluster": pa.array(assign),
            "dist": pa.array(dist),
        }
        if with_embedding:
            cols["embedding"] = batch["embedding"]
        return pa.table(cols)

    return assign_batch


def kmeans_assign(
    ds: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 2,
    with_embedding: bool = False,
) -> ray.data.Dataset:
    """Lloyd k-means over ``(vec_id, embedding)``; returns
    ``(vec_id, cluster, dist)`` after ``iters`` exact integer
    iterations.  Init = the k smallest ``vec_id`` vectors (cid in
    vec_id order) — deterministic and oracle-mirrorable."""
    # Lloyd consumes the input iters+2 times (init head, one partial
    # pass per iteration, final assign).  Materialize the narrow
    # (vec_id, embedding) projection ONCE so every pass scans
    # object-store blocks instead of re-executing the parquet read —
    # the same cache-the-reused-intermediate call as the minhash
    # exploded table (dedup.py), with the same spill-to-store escape
    # valve at 100 TB (measured at sf0.1: ~2x on kmeans_clusters,
    # larger on semdedup's 5-pass chain)
    ds = ds.materialize()
    # init = the k smallest-vec_id vectors, found with a two-level
    # per-batch head (≤ k rows leave each block) instead of a full
    # dataset sort — the corpus never crosses an all-to-all for k rows
    def init_head(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values("vec_id", kind="stable").head(k)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None).cast(b.schema)

    init_rows = (
        ds.map_batches(init_head, batch_format="pyarrow")
        .repartition(1)
        .map_batches(init_head, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    init_rows.sort(key=lambda r: r["vec_id"])
    cents = quantized_matrix(
        pa.array([r["embedding"] for r in init_rows], type=pa.list_(pa.float32()))
    )

    for _ in range(iters):
        partials = ds.map_batches(
            _partial_sums(cents),
            batch_format="pyarrow",
            batch_size=4096,
        )

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            out = []
            for cid, g in df.groupby("cid", sort=True):
                s = np.sum(np.stack(g["sums"].to_numpy()), axis=0)
                out.append((int(cid), int(g["n"].sum()), s.tolist()))
            return pd.DataFrame(out, columns=["cid", "n", "sums"])

        rows = (
            partials.repartition(1)  # ≤ k rows per upstream block
            .map_batches(fold, batch_format="pandas", batch_size=None)
            .take_all()
        )
        new_cents = cents.copy()  # empty clusters keep their centroid
        for r in rows:
            s = np.asarray(r["sums"], dtype=np.int64)
            n = int(r["n"])
            new_cents[int(r["cid"])] = (s + n * OFF) // n - OFF
        cents = new_cents

    return ds.map_batches(
        _assign_final(cents, with_embedding=with_embedding),
        batch_format="pyarrow",
        batch_size=4096,
    )


def cluster_outliers(
    ds: ray.data.Dataset, *, k: int = 8, iters: int = 2, top: int = 20
) -> ray.data.Dataset:
    """The ``top`` vectors FARTHEST from their k-means centroid —
    prototypicality pruning (drop the least-representative tail before
    training).  Distances are the exact int64 squared-L2 of
    ``kmeans_assign``, so ordering is bit-deterministic.

    Two-level top-k: per-batch heads (≤ ``top`` rows out per batch) then
    one bounded merge block — the exchange moves top·blocks rows, never
    the corpus."""
    asg = kmeans_assign(ds, k=k, iters=iters)

    def head(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["dist", "vec_id"], ascending=[False, True], kind="stable"
        ).head(top)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None).cast(b.schema)

    return (
        asg.map_batches(head, batch_format="pyarrow")
        .repartition(1)
        .map_batches(head, batch_format="pyarrow", batch_size=None)
    )


def _keep_flag(losers):
    """Stateless-per-batch keep flagging against the value-captured
    loser-id set (see ``_partial_sums`` on task pools + value capture;
    the set is duplicate-structure-bounded)."""

    def flag(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        keep = ~np.isin(ids, losers)
        return batch.append_column("keep", pa.array(keep, type=pa.bool_()))

    return flag


def semdedup_keep(
    ds: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.2,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space with k-means, then mark within-cluster cosine
    near-duplicates — a vector is dropped iff a SMALLER ``vec_id`` in
    its cluster has cosine ≥ ``threshold`` with it.  Returns
    ``(vec_id, cluster, keep)``.

    Scale shape: the k-means passes are streaming (see
    ``kmeans_assign``); pairwise cosine runs only WITHIN clusters (at
    real scale k grows with the corpus so clusters stay small — the
    same blocking contract as ``embedding_neardup_pairs``); the loser-id
    set reaching the driver is bounded by the number of near-duplicate
    vectors, the same duplicate-structure bound as the dedup keep-lists
    (stages/dedup.py hot-bucket note)."""
    from docling_api_ray.stages.dedup import embedding_neardup_pairs

    # the final assign pass passes the embedding column through, so the
    # within-cluster pair stage needs NO vec_id join to reunite vectors
    # with their cluster ids (the r3 bench's hash_join here shipped the
    # whole embedding matrix through an extra all-to-all)
    # the assign output feeds BOTH the pair stage and the final keep
    # flagging — materialize it once instead of re-running the assign
    # pass (wide rows, but exactly the corpus's embedding table; the
    # object store spills, and recomputing would cost a full extra scan
    # + distance pass anyway)
    withc = kmeans_assign(ds, k=k, iters=iters, with_embedding=True).materialize()
    asg = withc.select_columns(["vec_id", "cluster"])
    pairs = embedding_neardup_pairs(
        withc, block_col="cluster", threshold=threshold
    )
    losers = np.array(
        sorted(pairs.unique("right_id")), dtype=np.int64
    )  # duplicate-structure-bounded (docstring)
    return asg.map_batches(
        _keep_flag(losers),
        batch_format="pyarrow",
    )


_LCD_OUT_SCHEMA = pa.schema(
    [
        ("label_a", pa.int64()),
        ("label_b", pa.int64()),
        ("n_a", pa.int64()),
        ("n_b", pa.int64()),
        ("dist", pa.float64()),
    ]
)


def label_centroid_dist(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Pairwise L2 distance between per-label mean embeddings — the
    linear-MMD class-separation / distribution-shift readout over the
    embedding table (are two labels' populations even distinguishable
    in embedding space before training a classifier on them?).

    Exactness (the kmeans integer discipline): embeddings quantize to
    int64 micro-units once; per (label, dim) the fold carries exact
    integer sums, and the pairwise distance clears denominators —
    dist = sqrt(Σ_d (S_a·n_b − S_b·n_a)²) / (n_a·n_b·1e6) — so the
    only floats are one sqrt and two divisions the mirror replays
    (numerator terms are unbounded Python ints driver-side; the SQL
    HUGEINT bound holds to ~10⁶ rows/label at dim 64 — split limbs
    beyond, the grouped_ols caveat class).

    Scale shape: ONE bounded fold of |labels|·(dim+1) integer rows
    (per-batch np.add.at partials), final block |labels|² pairs."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    part_schema = pa.schema(
        [("label", pa.int64()), ("dim", pa.int64()), ("s", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return part_schema.empty_table()
        q = quantized_matrix(b["embedding"])
        lab = np.asarray(b["label"], dtype=np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        k, dim = len(uniq), q.shape[1]
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=k).astype(np.int64)
        # dim = -1 sentinel rows carry the exact per-label row count
        return pa.table(
            {
                "label": pa.array(
                    np.concatenate(
                        [np.repeat(uniq, dim), uniq]
                    ),
                    type=pa.int64(),
                ),
                "dim": pa.array(
                    np.concatenate(
                        [
                            np.tile(np.arange(dim, dtype=np.int64), k),
                            np.full(k, -1, dtype=np.int64),
                        ]
                    ),
                    type=pa.int64(),
                ),
                "s": pa.array(
                    np.concatenate([sums.ravel(), cnt]), type=pa.int64()
                ),
            }
        )

    folded = bounded_groupby_sum(
        ds.select_columns(["embedding", "label"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["label", "dim"],
        sum_cols={"s": "s"},
    )

    def fit(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _LCD_OUT_SCHEMA.empty_table()
        lab = np.asarray(t["label"], dtype=np.int64)
        dim = np.asarray(t["dim"], dtype=np.int64)
        s = np.asarray(t["s"], dtype=np.int64)
        labels = sorted(set(lab.tolist()))
        cnt = {
            int(l): int(s[(lab == l) & (dim == -1)][0]) for l in labels
        }
        sums = {}
        for l in labels:
            m = (lab == l) & (dim >= 0)
            order = np.argsort(dim[m])
            sums[int(l)] = [int(v) for v in s[m][order]]
        q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
        out = {c: [] for c in _LCD_OUT_SCHEMA.names}
        for i, la in enumerate(labels):
            for lb in labels[i + 1:]:
                na, nb = cnt[la], cnt[lb]
                num = sum(
                    (sa * nb - sb * na) ** 2
                    for sa, sb in zip(sums[la], sums[lb])
                )  # exact unbounded ints
                d = (
                    math.sqrt(float(num))
                    / (float(na) * float(nb))
                    / 1e6
                    if na > 0 and nb > 0
                    else 0.0
                )
                out["label_a"].append(la)
                out["label_b"].append(lb)
                out["n_a"].append(na)
                out["n_b"].append(nb)
                out["dist"].append(q6(d))
        return pa.table(
            {
                c: pa.array(out[c], type=_LCD_OUT_SCHEMA.field(c).type)
                for c in _LCD_OUT_SCHEMA.names
            }
        )

    return folded.repartition(1).map_batches(
        fit, batch_format="pyarrow", batch_size=None
    )
