"""Deduplication operators (training-data pipeline extensions): exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (100 TB shape):

- *exact*: content hash added in a vectorized ``map_batches`` (so the
  shuffle moves 16-byte digests, not document bodies), then ONE
  ``groupby(hash)`` — the unavoidable all-to-all — resolved by a pure
  vectorized Min/Count aggregate (never per-group python).
- *MinHash-LSH / SimHash*: signatures computed per batch (stateless,
  numpy-vectorized); candidate generation explodes to
  ``(bucket, doc_id, signature)`` rows — small fixed-width keys — then a
  vectorized bucket-count aggregate + broadcast semi-join drops singleton
  buckets BEFORE any per-group pair generation; pair verification uses
  the carried signatures (no second pass over text).  The only shuffled
  payload is signatures, ~0.5 KB/doc regardless of document size.
- *n-gram Jaccard*: exact pairwise verification is O(group²) — only ever
  run inside a blocking key (caller chooses; tests/queries block on
  ``source``), never globally.
- *embedding near-dup*: cosine pairs within a blocking key (label /
  IVF-bucket), numpy matmul per group.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from docling_api_ray.stages.common import coalesce_for_shuffle

_MERSENNE = (1 << 61) - 1


def _stable_u64(texts: list[str]) -> np.ndarray:
    """Process-stable 64-bit hashes (md5-truncated) of strings."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "little")
            for t in texts
        ],
        dtype=np.uint64,
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    digests = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("content_hash", pa.array(digests, type=pa.string()))


def exact_dedup(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """First-wins exact dedup as a pure vectorized aggregate:
    (content_hash, doc_id=min-id winner, n_dups).  The shuffle payload is
    (digest, id) — narrow regardless of document size — and the reduce is
    a hash aggregate, NOT per-group python (``map_groups`` costs ~1ms per
    group, which at one-group-per-document dominates the whole job)."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col), batch_format="pyarrow"
    ).select_columns(["content_hash", id_col])
    hashed = coalesce_for_shuffle(hashed)
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_dups")
    )


def exact_dedup_rows(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Full surviving rows (all columns) after first-wins exact dedup.
    Winner ids from the aggregate are broadcast (``ray.put`` once) and
    applied as a vectorized semi-join filter — no second wide shuffle.
    Assumes the winner-id set fits in memory (one id per DISTINCT
    document; at larger scale swap the set for a Bloom filter)."""
    winners = exact_dedup(ds, text_col=text_col, id_col=id_col)
    ids = [r[id_col] for r in winners.select_columns([id_col]).take_all()]
    ref = ray.put(sorted(ids))

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep_ids = ray.get(ref)
        return b.filter(pc.is_in(b[id_col], value_set=pa.array(keep_ids)))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Stateful minhash signer — permutation parameters built once per
    instance shipped to stateless tasks (or an actor pool at scale)."""

    def __init__(
        self, num_perm: int = 64, shingle_words: int = 3, seed: int = 42
    ) -> None:
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.shingle_words = shingle_words
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def shingles(self, text: str) -> list[str]:
        words = text.split()
        n = self.shingle_words
        if len(words) < n:
            return [" ".join(words)] if words else []
        return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        h = _stable_u64(sh)  # (S,)
        # (P, S) universal hashing mod Mersenne prime, min per permutation
        with np.errstate(over="ignore"):
            vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch["text"].to_pylist()]
        sigs = np.stack([self.signature(t) for t in texts]) if texts else np.zeros(
            (0, self.num_perm), dtype=np.uint64
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "signature": pa.array(
                    [s.astype(np.int64) for s in sigs],
                    type=pa.list_(pa.int64(), self.num_perm),
                ),
            }
        )


def explode_bands(batch: pa.Table, *, bands: int = 16) -> pa.Table:
    """signature rows → (bucket, doc_id, signature) rows; ``bucket`` is a
    single int64 key hashing (band_id, band values) together.  Shuffle
    payload = fixed-width ints, one row per band per doc."""
    sigs = batch["signature"].to_pylist()
    doc_ids = batch["doc_id"].to_pylist()
    out_bucket, out_doc, out_sig = [], [], []
    for did, sig in zip(doc_ids, sigs):
        arr = np.asarray(sig, dtype=np.uint64)
        r = len(arr) // bands
        for b in range(bands):
            chunk = arr[b * r : (b + 1) * r]
            h = hashlib.md5(bytes([b]) + chunk.tobytes()).digest()[:8]
            out_bucket.append(int.from_bytes(h, "little") >> 1)
            out_doc.append(did)
            out_sig.append(sig)
    return pa.table(
        {
            "bucket": pa.array(out_bucket, type=pa.int64()),
            "doc_id": pa.array(out_doc),
            "signature": pa.array(out_sig, type=batch["signature"].type),
        }
    )


def _keep_hot_buckets(
    exploded: ray.data.Dataset, key: str = "bucket"
) -> ray.data.Dataset | None:
    """Semi-join an exploded LSH table against its own ≥2-member buckets.

    A bare ``groupby(bucket).map_groups`` pays ~1ms of per-group python
    for EVERY bucket, and almost all buckets are singletons — so first a
    vectorized Count aggregate finds the hot buckets, the hot-key set is
    broadcast once (``ray.put``), and a vectorized ``is_in`` filter drops
    the singleton rows before the expensive per-group pair generation.
    The hot set is proportional to actual duplicate structure, not corpus
    size (swap in a Bloom filter if it ever outgrows memory).

    Returns None when no bucket has ≥2 members."""
    from ray.data.aggregate import Count

    counts = coalesce_for_shuffle(
        exploded.select_columns([key])
    ).groupby(key).aggregate(Count(alias_name="n"))
    hot = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n"], 2)).select([key]),
        batch_format="pyarrow",
    ).take_all()
    if not hot:
        return None
    ref = ray.put(sorted(r[key] for r in hot))

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[key], value_set=pa.array(ray.get(ref))))

    return exploded.map_batches(keep, batch_format="pyarrow")


def _cogrouped(ds: ray.data.Dataset, key: str):
    """Co-locate all rows of each ``key`` value using ~core-count Ray
    groups (key hash mod P), so per-key work can run as a cheap pandas
    groupby inside each group instead of one Ray dispatch per key."""
    from docling_api_ray.stages.common import shuffle_partitions

    P = shuffle_partitions()

    def add_part(b: pa.Table) -> pa.Table:
        part = pc.subtract(b[key], pc.multiply(pc.divide(b[key], P), P))
        return b.append_column("__part", pc.cast(part, pa.int64()))

    return ds.map_batches(add_part, batch_format="pyarrow").groupby("__part")


def _pairs_from_partition(df: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Candidate pairs for ALL buckets in one partition, verified by
    signature-estimated Jaccard (fraction of agreeing minhash
    components).  Buckets are iterated with a pandas groupby INSIDE one
    Ray group — Ray's per-group dispatch costs ~1 ms/group, ruinous for
    thousands of tiny buckets, while a pandas group iteration is ~50 µs."""
    rows: list[tuple[int, int, float]] = []
    for _, g in df.groupby("bucket", sort=False):
        if len(g) < 2:
            continue
        g = g.sort_values("doc_id", kind="stable")
        ids = g["doc_id"].to_numpy()
        sigs = np.stack([np.asarray(s, dtype=np.int64) for s in g["signature"]])
        for i in range(len(ids)):
            agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for j_off, est in enumerate(agree):
                if est >= threshold:
                    rows.append((int(ids[i]), int(ids[i + 1 + j_off]), float(est)))
    return pd.DataFrame(rows, columns=["left_id", "right_id", "est_jaccard"]).astype(
        {"left_id": "int64", "right_id": "int64", "est_jaccard": "float64"}
    )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> ray.data.Dataset:
    """documents(text) → near-duplicate candidate pairs.

    shingle→minhash (actor pool) → band explode → groupby(band buckets) →
    in-bucket verified pairs → global pair dedup (a pair can surface from
    several bands)."""
    # the signer's state is two 64-element arrays — broadcast a prebuilt
    # instance to stateless tasks rather than paying actor-pool startup
    # (an actor pool is the right shape only when __init__ is expensive)
    signed = ds.map_batches(
        MinHasher(num_perm=num_perm), batch_format="pyarrow", batch_size=1024
    )
    # pin the narrow (bucket, doc_id, signature) table: the hot-bucket
    # count consumes it once and the pair pass consumes it again — without
    # this the signature computation (the dominant cost) runs twice.  At
    # corpus scales where ~0.5 KB/doc of signatures outgrow the object
    # store, write this intermediate to storage instead.
    exploded = signed.map_batches(
        lambda b: explode_bands(b, bands=bands), batch_format="pyarrow"
    ).materialize()
    hot = _keep_hot_buckets(exploded)
    if hot is None:
        return ray.data.from_arrow(
            pa.table(
                {
                    "left_id": pa.array([], type=pa.int64()),
                    "right_id": pa.array([], type=pa.int64()),
                    "est_jaccard": pa.array([], type=pa.float64()),
                }
            )
        )
    pairs = _cogrouped(hot, "bucket").map_groups(
        lambda df: _pairs_from_partition(df, threshold), batch_format="pandas"
    )
    # a pair can surface from several bands — vectorized aggregate dedup
    from ray.data.aggregate import Max

    return coalesce_for_shuffle(pairs).groupby(["left_id", "right_id"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over whitespace tokens; near-dup via 4×16-bit band
    buckets (Hamming ≤ 3 ⇒ at least one exact 16-bit band match)."""

    BITS = 64

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch["text"].to_pylist()]
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = t.split()
            if not toks:
                continue
            h = _stable_u64(toks)  # (T,)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            v = (2 * bits - 1).sum(axis=0)  # weight 1 per token occurrence
            pos = (v > 0).astype(np.uint64)
            with np.errstate(over="ignore"):
                out[i] = (pos << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(out.astype(np.int64), type=pa.int64()),
            }
        )


def simhash_pairs(
    ds: ray.data.Dataset, *, max_hamming: int = 3
) -> ray.data.Dataset:
    """documents(text) → (left_id, right_id, hamming) near-dup pairs via
    16-bit band LSH over 64-bit simhashes."""
    signed = ds.map_batches(SimHasher(), batch_format="pyarrow", batch_size=2048)

    def explode(batch: pa.Table) -> pa.Table:
        sh = np.asarray(batch["simhash"], dtype=np.int64).astype(np.uint64)
        ids = batch["doc_id"].to_pylist()
        bucket, doc, full = [], [], []
        for b in range(4):
            part = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            # single int64 bucket key: band index in the high bits
            bucket.extend((part + (b << 17)).tolist())
            doc.extend(ids)
            full.extend(sh.astype(np.int64).tolist())
        return pa.table(
            {
                "bucket": pa.array(bucket, type=pa.int64()),
                "doc_id": pa.array(doc),
                "simhash": pa.array(full, type=pa.int64()),
            }
        )

    def partition_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in df.groupby("bucket", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id", kind="stable")
            ids = g["doc_id"].to_numpy()
            sh = g["simhash"].to_numpy().astype(np.uint64)
            for i in range(len(ids)):
                x = sh[i + 1 :] ^ sh[i]
                ham = np.array([bin(int(v)).count("1") for v in x])
                for j_off in np.nonzero(ham <= max_hamming)[0]:
                    rows.append(
                        (int(ids[i]), int(ids[i + 1 + j_off]), int(ham[j_off]))
                    )
        return pd.DataFrame(rows, columns=["left_id", "right_id", "hamming"]).astype(
            {"left_id": "int64", "right_id": "int64", "hamming": "int64"}
        )

    exploded = signed.map_batches(explode, batch_format="pyarrow").materialize()
    hot = _keep_hot_buckets(exploded)
    if hot is None:
        return ray.data.from_arrow(
            pa.table(
                {
                    "left_id": pa.array([], type=pa.int64()),
                    "right_id": pa.array([], type=pa.int64()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        )
    pairs = _cogrouped(hot, "bucket").map_groups(
        partition_pairs, batch_format="pandas"
    )
    from ray.data.aggregate import Min

    return coalesce_for_shuffle(pairs).groupby(["left_id", "right_id"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, within a blocking key)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    block_col: str = "source",
    threshold: float = 0.5,
) -> ray.data.Dataset:
    """Exact word-set Jaccard over all pairs WITHIN a blocking key.
    O(group²·words) — the blocking column must bound group size; this is
    the verification tier under an LSH candidate generator at scale."""

    def block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        ids = g["doc_id"].to_numpy()
        sets = [set((t or "").split()) for t in g["text"]]
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    rows.append((int(ids[i]), int(ids[j]), round(jac, 6)))
        return pd.DataFrame(rows, columns=["left_id", "right_id", "jaccard"]).astype(
            {"left_id": "int64", "right_id": "int64", "jaccard": "float64"}
        )

    return coalesce_for_shuffle(ds).groupby(block_col).map_groups(
        block, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (within a blocking key)
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    block_col: str = "label",
    threshold: float = 0.99,
) -> ray.data.Dataset:
    """Cosine ≥ threshold pairs within a blocking key (cluster label /
    IVF bucket at scale), numpy matmul per group in float64."""

    def block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id", kind="stable")
        ids = g["vec_id"].to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sims = mn @ mn.T
        rows = []
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = sims[iu, ju] >= threshold
        for i, j in zip(iu[mask], ju[mask]):
            rows.append((int(ids[i]), int(ids[j]), round(float(sims[i, j]), 6)))
        return pd.DataFrame(rows, columns=["left_id", "right_id", "cosine"]).astype(
            {"left_id": "int64", "right_id": "int64", "cosine": "float64"}
        )

    return coalesce_for_shuffle(ds).groupby(block_col).map_groups(
        block, batch_format="pandas"
    )
