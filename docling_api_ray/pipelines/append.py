"""End-to-end incremental-commit pipeline — the production append shape.

The reference processes each upload request in isolation
(document_converter/service.py:101-104) and keeps no corpus state; a
continuously-crawled training corpus needs the opposite: every incoming
increment must be triaged against HISTORY before it is converted and
committed, and the committed store must carry the indexes that make the
NEXT append cheap.  This module composes the pieces built for that —
index-backed exact + minhash dedup (stages/incremental.py), optional
embedding near-dup triage against the persisted IVF index
(stages/similarity.py ivf_knn_partitioned), the flagship conversion
pipeline, and partition-granular checkpointing (pipelines/checkpoint.py
discipline) — into ONE resumable run per increment.

Store layout (all commits are write-to-tmp + atomic rename):

    store_dir/
      corpus/append=<a>/part=<i>/...parquet   converted survivor docs
      dedup_index/append=<a>/...parquet       (doc_id, content_hash,
                                               __ckey, signature) per
                                               committed append
      ivf_index/append=<a>/centroid=<c>/...   centroid-partitioned
                                               survivor embeddings
      _staging/append=<a>/keep/               triage keep-list (narrow)
      _manifest/store.json                    centroids + hash params
      _manifest/append=<a>/{keep.json, part-<i>.json,
                            dedup_index.json, ivf_index.json}
      _manifest/append-<a>.json               the append's commit record

Scale shape: history contributes ONLY its persisted digests/signatures
(~0.5 KB/doc, columns-pruned reads) — committed text is never re-read
or re-hashed on an append; old×old candidate work is skipped entirely
(stages/incremental.py docstring).  The keep/drop id lists are bounded
by the INCREMENT size (the same driver-boundedness contract as
``incremental_minhash_keep``'s drop set), so broadcasting them to the
survivor filter is batch-bounded, not corpus-bounded.  The expensive
stage — conversion — is partition-granular: a crashed run resumes at
the first uncommitted partition with the triage stage read back from
its staging commit, not recomputed.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data

from docling_api_ray.config import DEFAULT_CONFIG, PipelineConfig
from docling_api_ray.pipelines.convert import convert_pipeline
from docling_api_ray.sources.testdata import synthesize_raw_batch
from docling_api_ray.stages.incremental import (
    incremental_exact_keep_indexed,
    incremental_minhash_keep_indexed,
    write_dedup_index,
)

_INDEX_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("content_hash", pa.string()),
        ("__ckey", pa.int64()),
        ("signature", pa.list_(pa.int64())),
    ]
)


# ---------------------------------------------------------------------------
# store bootstrap + manifest helpers
# ---------------------------------------------------------------------------

def init_store(
    store_dir: str,
    *,
    centroids: np.ndarray | None = None,
    num_perm: int = 64,
    bands: int = 16,
) -> None:
    """Create an empty committed store.  The dedup index is seeded with
    a zero-row TYPED parquet (under its own ``append=-1`` hive leaf so
    partition discovery stays consistent once real appends land) —
    every append then runs the identical indexed code path whether or
    not history exists.  ``centroids`` freezes the IVF coarse quantizer
    for the store's lifetime (appends must share it or probes would be
    incomparable across appends)."""
    os.makedirs(os.path.join(store_dir, "_manifest"), exist_ok=True)
    seed_dir = os.path.join(store_dir, "dedup_index", "append=-1")
    os.makedirs(seed_dir, exist_ok=True)
    pq.write_table(
        _INDEX_SCHEMA.empty_table(), os.path.join(seed_dir, "seed.parquet")
    )
    meta = {
        "num_perm": num_perm,
        "bands": bands,
        "centroids": (
            np.asarray(centroids, dtype=np.float64).tolist()
            if centroids is not None
            else None
        ),
    }
    _atomic_json(os.path.join(store_dir, "_manifest", "store.json"), meta)


def _atomic_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _store_meta(store_dir: str) -> dict:
    with open(os.path.join(store_dir, "_manifest", "store.json")) as f:
        return json.load(f)


def _append_record_path(store_dir: str, aid: int) -> str:
    return os.path.join(store_dir, "_manifest", f"append-{aid}.json")


def committed_appends(store_dir: str) -> list[dict]:
    mdir = os.path.join(store_dir, "_manifest")
    recs = []
    if not os.path.isdir(mdir):
        return recs
    for fn in sorted(os.listdir(mdir)):
        if fn.startswith("append-") and fn.endswith(".json"):
            try:
                with open(os.path.join(mdir, fn)) as f:
                    rec = json.load(f)
            except (ValueError, json.JSONDecodeError):
                continue  # torn write → not committed
            if rec.get("status") == "done":
                recs.append(rec)
    return sorted(recs, key=lambda r: r["append_id"])


def _resolve_append_id(store_dir: str, spec: dict) -> int:
    """Reattach by input lineage: a rerun of the same increment spec
    resumes its append id; a NEW spec gets the next id.  A done append
    with the same spec is idempotent (returns its id; run_append then
    short-circuits)."""
    import re

    mdir = os.path.join(store_dir, "_manifest")
    used = set()
    for fn in os.listdir(mdir):
        m = re.match(r"append[=-](-?\d+)", fn)
        if not m:
            continue
        aid = int(m.group(1))
        if aid < 0:
            continue  # the compaction record (append_id=-1) never claims an id
        used.add(aid)
        spec_path = os.path.join(mdir, f"append={aid}", "spec.json")
        if os.path.exists(spec_path):
            with open(spec_path) as f:
                prior = json.load(f)
            if prior == spec:
                return aid
    return max(used, default=-1) + 1


def _stage_path(store_dir: str, aid: int, name: str) -> str:
    return os.path.join(store_dir, "_manifest", f"append={aid}", name)


def _stage_done(store_dir: str, aid: int, name: str) -> dict | None:
    p = _stage_path(store_dir, aid, name)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            rec = json.load(f)
    except (ValueError, json.JSONDecodeError):
        return None
    return rec if rec.get("status") == "done" else None


def _commit_dir(tmp_dir: str, final_dir: str) -> None:
    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp_dir, final_dir)


# ---------------------------------------------------------------------------
# the append run
# ---------------------------------------------------------------------------

def run_append(
    store_dir: str,
    docs_path: str,
    lo: int,
    hi: int,
    *,
    embeddings_path: str | None = None,
    config: PipelineConfig = DEFAULT_CONFIG,
    npartitions: int = 4,
    minhash_threshold: float = 0.7,
    knn_cos_threshold: float | None = None,
    knn_nprobe: int = 4,
    fail_after: int | None = None,
) -> dict:
    """Ingest the increment ``docs_path[doc_id ∈ [lo, hi))`` into the
    store: triage (index-backed exact + minhash dedup, optional IVF
    embedding near-dup triage), convert the survivors, commit corpus
    partitions, and append to the persisted dedup/IVF indexes — one
    resumable run.  ``fail_after=k`` aborts after k convert partitions
    (the kill/resume test hook).  Returns the append's commit record."""
    meta = _store_meta(store_dir)
    spec = {"docs_path": os.path.abspath(docs_path), "lo": lo, "hi": hi,
            "embeddings_path": (
                os.path.abspath(embeddings_path) if embeddings_path else None
            )}
    aid = _resolve_append_id(store_dir, spec)
    done_rec = committed_appends(store_dir)
    for r in done_rec:
        if r["append_id"] == aid:
            return r  # idempotent rerun of a committed increment
    mdir = os.path.join(store_dir, "_manifest", f"append={aid}")
    os.makedirs(mdir, exist_ok=True)
    spec_path = os.path.join(mdir, "spec.json")
    if os.path.exists(spec_path):
        with open(spec_path) as f:
            prior = json.load(f)
        if prior != spec:
            raise ValueError(
                f"append {aid} was started with spec {prior}; rerun passes "
                f"{spec} — refusing to resume a different increment"
            )
    else:
        _atomic_json(spec_path, spec)

    dedup_index_dir = os.path.join(store_dir, "dedup_index")
    ivf_index_dir = os.path.join(store_dir, "ivf_index")

    def increment_docs() -> ray.data.Dataset:
        return ray.data.read_parquet(
            docs_path,
            columns=["doc_id", "text"],
            filter=(pads.field("doc_id") >= lo) & (pads.field("doc_id") < hi),
        )

    # ---- stage 1: triage — committed text never read, only its index ----
    keep_dir = os.path.join(store_dir, "_staging", f"append={aid}", "keep")
    keep_rec = _stage_done(store_dir, aid, "keep.json")
    if keep_rec is None:
        new = increment_docs()
        kept_exact = incremental_exact_keep_indexed(dedup_index_dir, new)
        k1 = pa.array(
            sorted(r["doc_id"] for r in kept_exact.take_all()),  # increment-bounded
            type=pa.int64(),
        )
        k1_ref = ray.put(k1)

        def keep1(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b["doc_id"], value_set=ray.get(k1_ref)))

        surv1 = new.map_batches(keep1, batch_format="pyarrow")
        kept_near = incremental_minhash_keep_indexed(
            dedup_index_dir,
            surv1,
            num_perm=meta["num_perm"],
            bands=meta["bands"],
            threshold=minhash_threshold,
        )
        keep_ids = sorted(r["doc_id"] for r in kept_near.take_all())
        n_after_minhash = len(keep_ids)

        # optional embedding near-dup triage vs the committed IVF index
        n_after_knn = n_after_minhash
        if (
            knn_cos_threshold is not None
            and embeddings_path
            and meta.get("centroids")
            and os.path.isdir(ivf_index_dir)
            and any(e.startswith("append=") for e in os.listdir(ivf_index_dir))
        ):
            from docling_api_ray.stages.similarity import ivf_knn_partitioned

            emb = pq.read_table(
                embeddings_path, columns=["vec_id", "embedding"],
                filters=[("vec_id", ">=", lo), ("vec_id", "<", hi)],
            )  # increment-bounded query state, same as knn_append
            by_id = {
                int(i): np.asarray(v, dtype=np.float64)
                for i, v in zip(
                    emb["vec_id"].to_pylist(), emb["embedding"].to_pylist()
                )
            }
            qids = [i for i in keep_ids if i in by_id]
            if qids:
                qmat = np.stack([by_id[i] for i in qids])
                cents = np.asarray(meta["centroids"], dtype=np.float64)
                hits = ivf_knn_partitioned(
                    ivf_index_dir, qids, qmat, cents,
                    k=1, nprobe=knn_nprobe, exclude_self=False,
                ).take_all()  # ≤ |increment| rows
                near = {
                    int(r["query_id"])
                    for r in hits
                    if r["cosine"] >= knn_cos_threshold
                }
                keep_ids = [i for i in keep_ids if i not in near]
            n_after_knn = len(keep_ids)

        tmp = keep_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(
            pa.table({"doc_id": pa.array(keep_ids, type=pa.int64())}),
            os.path.join(tmp, "keep.parquet"),
        )
        _commit_dir(tmp, keep_dir)
        keep_rec = {
            "status": "done",
            "n_input": int(hi - lo),
            "n_after_exact": len(k1),
            "n_after_minhash": n_after_minhash,
            "n_after_knn": n_after_knn,
        }
        _atomic_json(_stage_path(store_dir, aid, "keep.json"), keep_rec)

    keep_tbl = pq.read_table(os.path.join(keep_dir, "keep.parquet"))
    keep_ids = keep_tbl["doc_id"].to_pylist()
    keep_arr = pa.array(keep_ids, type=pa.int64())

    # ---- stage 2: convert survivors, partition-granular commits ---------
    # contiguous id-range chunks over the SORTED keep list → each
    # partition is a pruned read (range predicate) + a bounded is_in
    step = max(1, (len(keep_ids) + npartitions - 1) // npartitions)
    chunks = [
        keep_ids[i : i + step] for i in range(0, len(keep_ids), step)
    ] or [[]]
    keep_ref = ray.put(keep_arr)
    n_processed = 0
    for i, chunk in enumerate(chunks):
        if _stage_done(store_dir, aid, f"part-{i}.json") is not None:
            continue
        if fail_after is not None and n_processed >= fail_after:
            raise RuntimeError(
                f"injected failure after {fail_after} convert partitions"
            )
        final_dir = os.path.join(
            store_dir, "corpus", f"append={aid}", f"part={i}"
        )
        os.makedirs(os.path.dirname(final_dir), exist_ok=True)
        tmp_dir = final_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        row_count = 0
        if chunk:
            ds = ray.data.read_parquet(
                docs_path,
                columns=["doc_id", "text"],
                filter=(pads.field("doc_id") >= chunk[0])
                & (pads.field("doc_id") <= chunk[-1]),
            ).map_batches(
                lambda b: b.filter(
                    pc.is_in(b["doc_id"], value_set=ray.get(keep_ref))
                ),
                batch_format="pyarrow",
            )
            raw = ds.map_batches(synthesize_raw_batch, batch_format="pyarrow")
            convert_pipeline(raw, config).write_parquet(tmp_dir)
            _commit_dir(tmp_dir, final_dir)
            row_count = sum(
                pq.read_metadata(os.path.join(final_dir, f)).num_rows
                for f in os.listdir(final_dir)
                if f.endswith(".parquet")
            )
        _atomic_json(
            _stage_path(store_dir, aid, f"part-{i}.json"),
            {
                "status": "done",
                "partition_id": i,
                "input_ref": f"{docs_path}[keep ids {i * step}:{i * step + len(chunk)}]",
                "row_count": row_count,
            },
        )
        n_processed += 1

    def survivors() -> ray.data.Dataset:
        return increment_docs().map_batches(
            lambda b: b.filter(
                pc.is_in(b["doc_id"], value_set=ray.get(keep_ref))
            ),
            batch_format="pyarrow",
        )

    # ---- stage 3: append the persisted indexes --------------------------
    # index tmp dirs live under _staging, NOT adjacent to the hive
    # leaves — a crash must never leave an `append=<a>.tmp` dir where
    # directory expansion of the live index would pick it up
    stage_root = os.path.join(store_dir, "_staging", f"append={aid}")
    if _stage_done(store_dir, aid, "dedup_index.json") is None:
        final_dir = os.path.join(dedup_index_dir, f"append={aid}")
        tmp_dir = os.path.join(stage_root, "dedup_index.tmp")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        write_dedup_index(
            survivors(), tmp_dir, num_perm=meta["num_perm"]
        )
        if not os.path.isdir(tmp_dir):
            # zero survivors → write_parquet emitted nothing; commit a
            # typed empty leaf so the hive layout stays consistent
            os.makedirs(tmp_dir, exist_ok=True)
            pq.write_table(
                _INDEX_SCHEMA.empty_table(),
                os.path.join(tmp_dir, "empty.parquet"),
            )
        _commit_dir(tmp_dir, final_dir)
        _atomic_json(
            _stage_path(store_dir, aid, "dedup_index.json"),
            {"status": "done", "rows": len(keep_ids)},
        )
    if embeddings_path and meta.get("centroids"):
        if _stage_done(store_dir, aid, "ivf_index.json") is None:
            from docling_api_ray.stages.similarity import ivf_write_index

            emb_ds = ray.data.read_parquet(
                embeddings_path,
                columns=["vec_id", "embedding"],
                filter=(pads.field("vec_id") >= lo)
                & (pads.field("vec_id") < hi),
            ).map_batches(
                lambda b: b.filter(
                    pc.is_in(b["vec_id"], value_set=ray.get(keep_ref))
                ).replace_schema_metadata(None),
                batch_format="pyarrow",
            )
            final_dir = os.path.join(ivf_index_dir, f"append={aid}")
            os.makedirs(ivf_index_dir, exist_ok=True)
            tmp_dir = os.path.join(stage_root, "ivf_index.tmp")
            shutil.rmtree(tmp_dir, ignore_errors=True)
            ivf_write_index(
                emb_ds,
                np.asarray(meta["centroids"], dtype=np.float64),
                tmp_dir,
            )
            if os.path.isdir(tmp_dir):
                _commit_dir(tmp_dir, final_dir)
            # zero survivors → no centroid leaves; nothing to commit
            # (ivf_knn_partitioned over the remaining appends is intact)
            _atomic_json(
                _stage_path(store_dir, aid, "ivf_index.json"),
                {"status": "done", "rows": len(keep_ids)},
            )

    # ---- stage 4: the append's commit record -----------------------------
    rec = {
        "append_id": aid,
        "spec": spec,
        **{k: v for k, v in keep_rec.items() if k != "status"},
        "n_committed": len(keep_ids),
        "row_count": sum(
            (_stage_done(store_dir, aid, f"part-{i}.json") or {}).get(
                "row_count", 0
            )
            for i in range(len(chunks))
        ),
        "status": "done",
    }
    _atomic_json(_append_record_path(store_dir, aid), rec)
    return rec


def drop_docs(store_dir: str, doc_ids) -> dict:
    """Curation DROP: record ``doc_ids`` as tombstones (append-only
    atomic JSON leaves under ``store_dir/tombstones/``).  Dropped docs
    vanish from every subsequent ``committed_corpus_dataset`` read
    immediately (masked at scan time) and are physically removed by the
    next corpus compaction — after which they must STAY dropped: the
    tombstone leaves persist across compactions, and the dedup/IVF
    index entries of dropped docs are intentionally KEPT, so a future
    increment re-submitting the same content still triages as a
    duplicate of history (content stays curated out, not resurrected)."""
    ids = sorted({int(i) for i in doc_ids})
    tdir = os.path.join(store_dir, "tombstones")
    os.makedirs(tdir, exist_ok=True)
    # monotonic max-index+1 with an O_EXCL claim: a count-based name
    # collides when drops race or a leaf was removed, silently
    # overwriting (and resurrecting) the loser's tombstones
    existing = [
        int(f[5:-5])
        for f in os.listdir(tdir)
        if f.startswith("drop-") and f[5:-5].isdigit()
    ]
    n = max(existing, default=-1) + 1
    while True:
        path = os.path.join(tdir, f"drop-{n}.json")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            n += 1
            continue
        os.close(fd)
        break
    _atomic_json(path, {"doc_ids": ids})
    return {"n_dropped": len(ids)}


def tombstoned_ids(store_dir: str) -> np.ndarray:
    """All tombstoned doc ids, sorted int64.  Maintenance-bounded: the
    list is what curation explicitly dropped, not corpus-proportional;
    for a corpus-scale purge the escape hatch is a hash anti-join of
    the corpus against the drop set (stages/joins.py how='anti')
    instead of this broadcast array."""
    tdir = os.path.join(store_dir, "tombstones")
    if not os.path.isdir(tdir):
        return np.empty(0, dtype=np.int64)
    ids: set[int] = set()
    for fn in sorted(os.listdir(tdir)):
        if not fn.endswith(".json"):
            continue
        try:
            with open(os.path.join(tdir, fn)) as f:
                ids.update(json.load(f)["doc_ids"])
        except (ValueError, KeyError, json.JSONDecodeError):
            continue  # torn write → tombstone not committed
    return np.array(sorted(ids), dtype=np.int64)


def _recover_corpus_swap(store_dir: str) -> None:
    """Finish (or roll back) an interrupted corpus-compaction root
    swap: a kill between ``os.replace(corpus → corpus.old)`` and
    ``os.replace(corpus.new → corpus)`` leaves NO corpus dir.  The
    compaction record landed before the swap started, so rolling
    FORWARD (promote ``corpus.new``) is the consistent repair; with no
    ``.new`` staged, roll back ``corpus.old``.  Idempotent no-op when
    ``corpus`` exists."""
    corpus_root = os.path.join(store_dir, "corpus")
    if os.path.isdir(corpus_root):
        return
    new_root, old_root = corpus_root + ".new", corpus_root + ".old"
    if os.path.isdir(new_root) and os.listdir(new_root):
        os.replace(new_root, corpus_root)
        shutil.rmtree(old_root, ignore_errors=True)
    elif os.path.isdir(old_root):
        os.replace(old_root, corpus_root)


def committed_corpus_dataset(
    store_dir: str,
    *,
    columns: list[str] | None = None,
    apply_tombstones: bool = True,
) -> ray.data.Dataset:
    """All committed corpus partitions as ONE streaming dataset (never
    driver-concatenated).  Only partitions of DONE appends are listed —
    a crashed append's committed partitions stay invisible until its
    commit record lands.  Tombstoned docs are masked at scan time (one
    vectorized ``np.isin`` per batch against the value-captured sorted
    drop list) unless ``apply_tombstones=False``."""
    _recover_corpus_swap(store_dir)
    files = []
    for rec in committed_appends(store_dir):
        adir = os.path.join(store_dir, "corpus", f"append={rec['append_id']}")
        if not os.path.isdir(adir):
            continue  # append committed zero survivors
        for part in sorted(os.listdir(adir)):
            if part.endswith(".tmp"):
                continue
            pdir = os.path.join(adir, part)
            files.extend(
                os.path.join(pdir, f)
                for f in sorted(os.listdir(pdir))
                if f.endswith(".parquet")
            )
    if not files:
        raise FileNotFoundError(f"no committed appends under {store_dir}")
    dead = tombstoned_ids(store_dir) if apply_tombstones else None
    if dead is None or len(dead) == 0:
        return ray.data.read_parquet(files, columns=columns)

    # the mask needs doc_id even when the caller prunes it away: widen
    # the pruned read by the key, filter, then project back
    drop_key_after = columns is not None and "doc_id" not in columns
    read_cols = (["doc_id"] + columns) if drop_key_after else columns
    ds = ray.data.read_parquet(files, columns=read_cols)

    def mask(b: pa.Table) -> pa.Table:
        keep = ~np.isin(np.asarray(b["doc_id"], dtype=np.int64), dead)
        b = b.filter(pa.array(keep))
        return b.drop_columns(["doc_id"]) if drop_key_after else b

    return ds.map_batches(mask, batch_format="pyarrow")


def compact_store(
    store_dir: str,
    *,
    include_corpus: bool = False,
    fail_point: str | None = None,
) -> dict:
    """Store MAINTENANCE: merge the per-append index leaves into one
    consolidated ``append=-1`` leaf each, so a store that has absorbed
    thousands of small increments stops paying per-append file overhead
    (open/footers/partition discovery) on every triage.  The production
    cadence is the LSM discipline: appends write small leaves, a
    periodic compaction folds them.

    Semantics-preserving BY CONSTRUCTION: triage reads the indexes as
    one concatenated table (read_parquet over the hive root, column-
    pruned), so re-laying the same rows out in fewer files cannot change
    any keep/drop decision — asserted by the compaction test, which
    re-runs an append before and after and compares bit-identical
    results.  Streaming: each index rewrites via read_parquet →
    write_parquet (never driver-held); the swap is atomic per index
    (staging + rename of the whole index dir).  The corpus parquet
    partitions are untouched — they are already immutable committed
    output, and their manifest lineage must stay append-granular.

    Returns ``{"dedup_files_before": n, "dedup_files_after": m, ...}``."""
    out: dict[str, int] = {}
    for kind, part_cols in (("dedup_index", []), ("ivf_index", ["centroid"])):
        root = os.path.join(store_dir, kind)
        if not os.path.isdir(root):
            continue
        leaves = sorted(
            d for d in os.listdir(root)
            if d.startswith("append=") and not d.endswith(".tmp")
        )
        files = [
            os.path.join(root, d, f)
            for d in leaves
            for f in sorted(os.listdir(os.path.join(root, d)))
            if f.endswith(".parquet")
        ]
        out[f"{kind.split('_')[0]}_files_before"] = len(files)
        if len(files) <= 1:
            out[f"{kind.split('_')[0]}_files_after"] = len(files)
            continue
        # bundle the small per-append leaves so the consolidated index
        # is few big files, not one file per input block — narrow
        # digest/signature rows, 1M-row bundles
        ds = ray.data.read_parquet(files).map_batches(
            lambda b: b.replace_schema_metadata(None),
            batch_format="pyarrow",
            batch_size=1_000_000,
            num_cpus=0.9,
        )
        stage = os.path.join(store_dir, "_staging", f"compact_{kind}.tmp")
        shutil.rmtree(stage, ignore_errors=True)
        merged_leaf = os.path.join(stage, "append=-1")
        if part_cols:
            # hive-partitioned rewrite keeps ivf_knn_partitioned's
            # file-level pruning intact (centroid= leaves under the
            # consolidated append)
            ds.write_parquet(merged_leaf, partition_cols=part_cols)
        else:
            ds.write_parquet(merged_leaf)
        new_root = root + ".new"
        shutil.rmtree(new_root, ignore_errors=True)
        os.makedirs(new_root, exist_ok=True)
        os.replace(merged_leaf, os.path.join(new_root, "append=-1"))
        old_root = root + ".old"
        shutil.rmtree(old_root, ignore_errors=True)
        os.replace(root, old_root)       # atomic swap, old kept until
        os.replace(new_root, root)       # the new root is in place
        shutil.rmtree(old_root, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)
        out[f"{kind.split('_')[0]}_files_after"] = sum(
            1
            for d in os.listdir(root)
            for f in os.listdir(os.path.join(root, d))
            if f.endswith(".parquet")
        )
    if fail_point == "after_index":
        raise RuntimeError("injected failure after index compaction")
    if include_corpus:
        out.update(_compact_corpus(store_dir, fail_point=fail_point))
    return out


def _compact_corpus(store_dir: str, *, fail_point: str | None = None) -> dict:
    """CORPUS compaction (tombstone-aware): stream every committed
    partition through the tombstone mask into ONE consolidated
    ``corpus/append=-1`` leaf, then swap it in atomically.  Dropped
    docs are physically removed here and must stay dropped — the
    tombstone leaves are retained (re-applying them to the compacted
    corpus is a no-op) and dedup-index entries of dropped content stay
    so future re-submissions still triage as duplicates of history.

    Crash-safe by ordering (kill/resume test): (1) the consolidated
    copy streams into ``_staging`` — a crash re-stages; (2) the
    compaction commit record ``append_id=-1`` lands BEFORE the swap —
    a crash between record and swap leaves every old append dir in
    place (the -1 record points at a dir that does not exist yet / an
    older -1 leaf, which is exactly the pre-compaction corpus), so the
    store is never invisible and a resumed compaction rebuilds the
    stage from the same committed state; (3) the swap itself is the
    ``os.replace`` root dance the index compaction uses.  The old
    append records are KEPT (append-granular lineage; readers skip
    records whose dirs the swap removed)."""
    out: dict[str, int] = {}
    corpus_root = os.path.join(store_dir, "corpus")
    _recover_corpus_swap(store_dir)  # finish any interrupted root swap
    try:
        ds = committed_corpus_dataset(store_dir)  # tombstones applied
    except FileNotFoundError:
        return {"corpus_files_before": 0, "corpus_files_after": 0}
    out["corpus_files_before"] = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(corpus_root)
    )
    out["n_tombstoned"] = int(len(tombstoned_ids(store_dir)))

    stage = os.path.join(store_dir, "_staging", "compact_corpus.tmp")
    shutil.rmtree(stage, ignore_errors=True)
    part_dir = os.path.join(stage, "append=-1", "part=0")
    # bundle small per-append blocks before the write (one parquet file
    # per output block) — fewer, bigger files is the point of the
    # compaction; 65k wide rows ≈ tens of MB per file
    ds.map_batches(
        lambda b: b.replace_schema_metadata(None),
        batch_format="pyarrow",
        batch_size=65_536,
        num_cpus=0.9,
    ).write_parquet(part_dir)
    if fail_point == "after_stage":
        raise RuntimeError("injected failure after corpus staging")

    # exact row count from the staged footers (no second scan)
    n_rows = sum(
        pq.ParquetFile(os.path.join(part_dir, f)).metadata.num_rows
        for f in os.listdir(part_dir)
        if f.endswith(".parquet")
    )
    # (2) record BEFORE swap — see docstring crash analysis
    _atomic_json(
        _append_record_path(store_dir, -1),
        {
            "append_id": -1,
            "status": "done",
            "n_committed": int(n_rows),
            "note": "corpus compaction",
            "replaces": [r["append_id"] for r in committed_appends(store_dir)
                         if r["append_id"] != -1],
        },
    )
    if fail_point == "after_record":
        raise RuntimeError("injected failure after compaction record")

    new_root = corpus_root + ".new"
    shutil.rmtree(new_root, ignore_errors=True)
    os.makedirs(new_root, exist_ok=True)
    os.replace(
        os.path.join(stage, "append=-1"), os.path.join(new_root, "append=-1")
    )
    old_root = corpus_root + ".old"
    shutil.rmtree(old_root, ignore_errors=True)
    if os.path.isdir(corpus_root):
        os.replace(corpus_root, old_root)
    if fail_point == "mid_swap":
        # the no-corpus-dir window _recover_corpus_swap repairs
        raise RuntimeError("injected failure mid root swap")
    os.replace(new_root, corpus_root)
    shutil.rmtree(old_root, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)

    out["corpus_files_after"] = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(corpus_root)
    )
    out["n_compacted_rows"] = int(n_rows)
    return out
