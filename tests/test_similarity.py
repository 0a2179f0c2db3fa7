"""Similarity search: brute-force exactness + IVF recall."""

import numpy as np
import pyarrow as pa
import ray.data

from docling_api_ray.stages.similarity import (
    ivf_knn,
    knn_bruteforce,
    train_centroids,
)


def _emb_ds(n=200, d=16, seed=3):
    rng = np.random.RandomState(seed)
    mat = rng.randn(n, d).astype(np.float64)
    tbl = pa.table(
        {
            "vec_id": list(range(n)),
            "embedding": pa.array(
                [r.astype("float32").tolist() for r in mat],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    return ray.data.from_arrow(tbl), mat


def _numpy_topk(mat, qids, k):
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in qids:
        sims = np.round(mn @ mn[q], 6)
        cand = [(s, i) for i, s in enumerate(sims) if i not in qids]
        cand.sort(key=lambda t: (-t[0], t[1]))
        out[q] = [i for _, i in cand[:k]]
    return out


def test_bruteforce_matches_numpy_oracle():
    ds, mat = _emb_ds()
    qids = [0, 1, 2]
    # float32-cast query matrix to mirror what the dataset holds
    qmat = mat[qids].astype("float32").astype("float64")
    ds32, _ = _emb_ds()
    out = knn_bruteforce(ds32, qids, qmat, k=5).take_all()
    got = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    mat32 = mat.astype("float32").astype("float64")
    expected = _numpy_topk(mat32, set(qids), 5)
    assert got == {q: expected[q] for q in qids}
    # ranks are dense 1..k
    for q in qids:
        ranks = sorted(r["rank"] for r in out if r["query_id"] == q)
        assert ranks == [1, 2, 3, 4, 5]


def test_ivf_recall_against_bruteforce():
    ds, mat = _emb_ds(n=300)
    qids = [5, 17]
    qmat = mat[qids].astype("float32").astype("float64")
    cents = train_centroids(mat.astype("float32").astype("float64"), ncentroids=8)
    bf = knn_bruteforce(ds, qids, qmat, k=10).take_all()
    iv = ivf_knn(ds, qids, qmat, cents, k=10, nprobe=4).take_all()
    bf_sets = {}
    iv_sets = {}
    for r in bf:
        bf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in iv:
        iv_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q in qids:
        recall = len(bf_sets[q] & iv_sets.get(q, set())) / len(bf_sets[q])
        assert recall >= 0.5, f"recall {recall} too low for probe=4/8 buckets"


def test_centroids_deterministic():
    _, mat = _emb_ds(n=100)
    c1 = train_centroids(mat, 4)
    c2 = train_centroids(mat, 4)
    assert np.allclose(c1, c2)


def test_lsh_recall_and_bucket_determinism():
    from docling_api_ray.stages.similarity import lsh_knn, signature_buckets

    # clustered corpus: LSH preserves ANGULAR locality, so the recall
    # claim is only meaningful when true neighbors are angularly close
    # (isotropic-random vectors have no locality for any ANN to find —
    # the first version of this test learned that the hard way)
    rng = np.random.RandomState(11)
    centers = rng.randn(8, 16) * 3.0
    mat = np.repeat(centers, 40, axis=0) + rng.randn(320, 16) * 0.3
    tbl = pa.table(
        {
            "vec_id": list(range(len(mat))),
            "embedding": pa.array(
                [r.astype("float32").tolist() for r in mat],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    qids = [5, 170]
    qmat = mat[qids].astype("float32").astype("float64")
    hyper = np.random.RandomState(7).randn(12, mat.shape[1])
    # bucket assignment is deterministic and within range
    b1 = signature_buckets(mat, hyper)
    b2 = signature_buckets(mat, hyper)
    assert (b1 == b2).all() and b1.min() >= 0 and b1.max() < (1 << 12)
    bf = knn_bruteforce(ds, qids, qmat, k=10).take_all()
    ls = lsh_knn(ds, qids, qmat, hyper, k=10).take_all()
    bf_sets, ls_sets = {}, {}
    for r in bf:
        bf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in ls:
        ls_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q in qids:
        recall = len(bf_sets[q] & ls_sets.get(q, set())) / len(bf_sets[q])
        assert recall >= 0.5, f"recall {recall} too low for Hamming-1 probe"
        # every returned neighbor must be a real candidate (not self)
        assert q not in ls_sets.get(q, set())


def test_pq_assign_exact_tiny():
    # hand-built: vector exactly at centroid 3 of every subspace must
    # take code 3; argmin ties go to the lower centroid id
    from docling_api_ray.stages.pq import (
        D_SUB,
        K_CODE,
        M_SUB,
        assign_codes,
        fixed_pq_codebook,
    )

    cb = fixed_pq_codebook()
    vm = cb[:, 3, :].reshape(1, M_SUB * D_SUB)
    codes = assign_codes(vm, cb)
    assert codes.shape == (1, M_SUB) and (codes == 3).all()
    # duplicate centroid 0 into slot 5: a vector at that point must
    # still pick the LOWER id
    cb2 = cb.copy()
    cb2[:, 5, :] = cb2[:, 0, :]
    vm0 = cb2[:, 5, :].reshape(1, M_SUB * D_SUB)
    assert (assign_codes(vm0, cb2) == 0).all()
    assert K_CODE == 16


def test_pq_trained_recall_against_bruteforce():
    # clustered corpus: a TRAINED codebook must give usable top-10
    # recall while the adc ordering stays integer-deterministic
    from docling_api_ray.stages.pq import (
        pq_knn,
        quantize_micro,
        train_pq_codebook,
    )

    rng = np.random.RandomState(11)
    centers = rng.randn(8, 64) * 0.2
    mat = np.repeat(centers, 40, axis=0) + rng.randn(320, 64) * 0.03
    mat /= np.linalg.norm(mat, axis=1)[:, None]
    tbl = pa.table(
        {
            "vec_id": list(range(len(mat))),
            "embedding": pa.array(
                [r.astype("float32").tolist() for r in mat],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    qids = [5, 170]
    qmat = mat[qids]
    cb = train_pq_codebook(quantize_micro(mat))
    bf = knn_bruteforce(ds, qids, qmat, k=10).take_all()
    pqr = pq_knn(ds, qids, qmat, cb, k=10).take_all()
    bf_sets, pq_sets = {}, {}
    for r in bf:
        bf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in pqr:
        pq_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q in qids:
        recall = len(bf_sets[q] & pq_sets.get(q, set())) / len(bf_sets[q])
        assert recall >= 0.5, f"PQ recall {recall} too low"
        assert q not in pq_sets.get(q, set())
    # determinism: re-run returns identical rows
    again = pq_knn(ds, qids, qmat, cb, k=10).take_all()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(again, key=key) == sorted(pqr, key=key)


def test_knn_recall_query_matches_set_intersection():
    from __ray_entry__ import _KNN_K, _N_QUERIES, _q_knn, _q_knn_ivf, _q_knn_recall

    sf = "/root/testdata/sf0.001"
    got = {r["query_id"]: r for r in _q_knn_recall(sf).to_pylist()}
    assert sorted(got) == list(range(_N_QUERIES))
    bf, iv = {}, {}
    for r in _q_knn(sf).take_all():
        bf.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in _q_knn_ivf(sf).take_all():
        iv.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q in range(_N_QUERIES):
        h = len(bf[q] & iv.get(q, set()))
        assert got[q]["hits"] == h
        assert got[q]["recall"] == h / _KNN_K
        assert 0 <= got[q]["hits"] <= _KNN_K


def test_knn_label_vote_majority_and_tiebreak():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.similarity import knn_label_vote

    # queries: vec_id 0 and 10 (mod 10). corpus: 8 vectors in two tight
    # clusters along axes 0 and 1.
    # q0 = axis0, true label 7 -> k=3 neighbors all label 7 (correct)
    # q10 = axis1, true label 3 -> neighbors labels 9,9,3 -> vote 9 (wrong)
    def v(axis, eps=0.0):
        x = np.zeros(4)
        x[axis] = 1.0
        x[(axis + 1) % 4] = eps
        return x.tolist()

    ids = [0, 10, 1, 2, 3, 11, 12, 13]
    vecs = [
        v(0), v(1),
        v(0, 0.01), v(0, 0.02), v(0, 0.03),   # labels 7,7,7
        v(1, 0.01), v(1, 0.02), v(1, 0.03),   # labels 9,9,3
    ]
    labels = [7, 3, 7, 7, 7, 9, 9, 3]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        )
    )
    out = sorted(
        knn_label_vote(ds, sample_mod=10, k=3).to_pylist(),
        key=lambda r: r["label"],
    )
    assert out == [
        {"label": 3, "n_eval": 1, "n_correct": 0, "accuracy": 0.0},
        {"label": 7, "n_eval": 1, "n_correct": 1, "accuracy": 1.0},
    ]


def test_knn_label_vote_tie_prefers_smaller_label():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.similarity import knn_label_vote

    # q0 with k=4 neighbors split 2-2 between labels 5 and 2 -> vote 2
    base = np.eye(4)[0]
    vecs = [base.tolist()]
    ids, labels = [0], [2]
    for i, lab in enumerate([5, 5, 2, 2], start=1):
        x = base.copy()
        x[1] = 0.01 * i
        vecs.append(x.tolist())
        ids.append(i)
        labels.append(lab)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        )
    )
    out = knn_label_vote(ds, sample_mod=10, k=4).to_pylist()
    assert out == [{"label": 2, "n_eval": 1, "n_correct": 1, "accuracy": 1.0}]


def test_ivf_partitioned_matches_inmemory_and_prunes(tmp_path):
    """The persisted centroid-partitioned index must (a) return exactly
    what the in-memory ivf_knn returns, and (b) actually PRUNE: after
    deleting every unprobed centroid= directory the query still answers
    identically — proof no unprobed byte is needed."""
    import os
    import shutil

    import numpy as np
    import pandas as pd

    from __ray_entry__ import (
        _IVF_NPROBE,
        _KNN_K,
        _emb,
        _fixed_centroids,
        _query_vectors,
    )
    from docling_api_ray.stages.similarity import (
        ivf_knn,
        ivf_knn_partitioned,
        ivf_write_index,
    )

    sf = "/root/testdata/sf0.001"
    qids, qmat = _query_vectors(sf)
    cents = _fixed_centroids()

    def norm(ds):
        df = ds.to_pandas()[["query_id", "vec_id", "cosine", "rank"]]
        return df.sort_values(["query_id", "rank"]).reset_index(drop=True)

    expected = norm(
        ivf_knn(
            _emb(sf, ["vec_id", "embedding"]), qids, qmat, cents,
            k=_KNN_K, nprobe=_IVF_NPROBE,
        )
    )

    index_dir = str(tmp_path / "ivf")
    ivf_write_index(_emb(sf, ["vec_id", "embedding"]), cents, index_dir)
    got = norm(
        ivf_knn_partitioned(
            index_dir, qids, qmat, cents, k=_KNN_K, nprobe=_IVF_NPROBE
        )
    )
    pd.testing.assert_frame_equal(got, expected)

    # pruning proof: remove every centroid directory OUTSIDE the probe
    # union; identical answers mean those cells were never read
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :_IVF_NPROBE]
    probed = {int(c) for row in probe for c in row}
    removed = 0
    for d in os.listdir(index_dir):
        if d.startswith("centroid=") and int(d.split("=")[1]) not in probed:
            shutil.rmtree(os.path.join(index_dir, d))
            removed += 1
    got2 = norm(
        ivf_knn_partitioned(
            index_dir, qids, qmat, cents, k=_KNN_K, nprobe=_IVF_NPROBE
        )
    )
    pd.testing.assert_frame_equal(got2, expected)
    # the fixture must exercise real pruning (some cell must be unprobed)
    assert removed >= 1 or len(probed) == len(cents)


def test_mmr_select_matches_reference_and_diversifies():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.similarity import (
        _norm_rows,
        _quant6,
        mmr_select,
    )

    rng = np.random.default_rng(3)
    # two tight clusters near the query + scattered rest: plain top-k
    # drowns in cluster A; MMR must mix in cluster B early
    q = np.array([1.0, 0.0, 0.0, 0.0])
    a = np.stack([q + rng.normal(0, 0.01, 4) for _ in range(8)])
    b = np.stack(
        [np.array([0.8, 0.6, 0.0, 0.0]) + rng.normal(0, 0.01, 4)
         for _ in range(8)]
    )
    rest = rng.normal(0, 1, size=(24, 4))
    vecs = np.vstack([a, b, rest])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [v.astype("float32") for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
    )
    # float32 storage: reference must see the same rounded vectors
    vecs64 = np.stack([v.astype("float32").astype(np.float64) for v in vecs])
    k, pool, lam = 6, 20, 0.4
    out = mmr_select(ds, q, k=k, pool=pool, lam=lam).to_pylist()

    # numpy reference: same pool, same greedy, same tie-break
    qn = q / np.linalg.norm(q)
    sims = _quant6(_norm_rows(vecs64) @ qn)
    order = np.lexsort((np.arange(len(vecs)), -sims))[:pool]
    ids = order.tolist()
    rel = sims[order]
    gram = _quant6(_norm_rows(vecs64[order]) @ _norm_rows(vecs64[order]).T)
    sel, cand = [], list(range(len(ids)))
    expect = []
    for step in range(k):
        best, bs = None, None
        for ci in cand:
            div = max((gram[ci, sj] for sj in sel), default=0.0)
            sc = lam * rel[ci] - (1 - lam) * div
            if best is None or sc > bs or (sc == bs and ids[ci] < ids[best]):
                best, bs = ci, sc
        sel.append(best)
        cand.remove(best)
        expect.append((step + 1, ids[best], rel[best], bs))
    got = [(r["rank"], r["vec_id"], r["cosine"], r["mmr_score"]) for r in out]
    assert got == [(r, i, float(c), float(s)) for r, i, c, s in expect]

    # diversification property: plain top-6 is all cluster A; MMR pulls
    # in at least one cluster-B vector (ids 8..15)
    plain6 = set(order[:6].tolist())
    assert all(i < 8 for i in plain6)
    assert any(8 <= r["vec_id"] < 16 for r in out)


def test_mmr_select_empty_pool():
    """An empty recall pool (nothing to rank) returns a typed empty
    table, not a crash."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.similarity import mmr_select

    empty = ray.data.from_arrow(
        pa.schema(
            [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
        ).empty_table()
    )
    out = mmr_select(empty, np.ones(4, dtype=np.float64), k=3, pool=5)
    assert out.num_rows == 0
    assert out.column_names == ["rank", "vec_id", "cosine", "mmr_score"]
