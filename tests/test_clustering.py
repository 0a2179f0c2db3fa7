"""Distributed integer k-means — blob recovery, empty-cluster
retention, determinism."""

import numpy as np
import pyarrow as pa
import ray.data

from docling_api_ray.stages.clustering import kmeans_assign, quantized_matrix


def _ds(vecs):
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": list(range(len(vecs))),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
    )


def test_kmeans_recovers_separated_blobs():
    rng = np.random.default_rng(3)
    blobs = []
    for c in ([0.5, 0.5, 0.0, 0.0], [-0.5, 0.5, 0.0, 0.0], [0.0, -0.5, 0.5, 0.0]):
        blobs.append(np.asarray(c) + rng.normal(0, 0.02, size=(30, 4)))
    vecs = np.concatenate(blobs)
    # interleave so the first k vec_ids hit distinct blobs (init spread)
    order = np.argsort(np.tile(np.arange(30), 3), kind="stable")
    vecs = vecs[order]
    truth = np.repeat([0, 1, 2], 30)[order]
    rows = kmeans_assign(_ds(vecs), k=3, iters=3).take_all()
    got = np.empty(len(vecs), dtype=int)
    for r in rows:
        got[r["vec_id"]] = r["cluster"]
    # same-blob pairs share a cluster, cross-blob pairs don't
    for t in range(3):
        members = got[truth == t]
        assert len(set(members.tolist())) == 1, (t, set(members.tolist()))
    assert len({got[truth == t][0] for t in range(3)}) == 3


def test_kmeans_empty_cluster_keeps_centroid_and_is_deterministic():
    # two coincident init points → one centroid captures no members
    vecs = [[0.1, 0.1], [0.1, 0.1], [0.9, 0.9], [0.9, 0.88], [0.88, 0.9]]
    a = sorted((r["vec_id"], r["cluster"], r["dist"])
               for r in kmeans_assign(_ds(vecs), k=2, iters=2).take_all())
    b = sorted((r["vec_id"], r["cluster"], r["dist"])
               for r in kmeans_assign(_ds(vecs), k=2, iters=2).take_all())
    assert a == b
    assert len(a) == 5
    # the coincident points share a cluster (tie-break is deterministic)
    # and the far blob lands in the other one: after iteration 1 both
    # centroids start identical, every point ties into cid 0, centroid 0
    # moves to the global mean while the EMPTY cluster 1 keeps [0.1,0.1]
    # — so the final pass pulls the coincident pair back to cluster 1
    assert a[0][1] == a[1][1]
    assert a[2][1] == a[3][1] == a[4][1] != a[0][1]
    assert a[0][2] == 0  # exactly on the retained centroid


def test_quantized_matrix_exact_floor_half_up():
    col = pa.array([[0.25, -0.25, 1e-6, -1e-6]], type=pa.list_(pa.float32()))
    q = quantized_matrix(col)
    assert q.shape == (1, 4)
    assert q[0, 0] == 250000 and q[0, 1] == -250000
    # float32(1e-6)*1e6 ≈ 1.0000000117 → floor(+0.5) = 1; the negative
    # mirror floors −0.5000000117 to −1 (exact, no half-even ambiguity)
    assert q[0, 2] == 1 and q[0, 3] == -1


def test_cluster_outliers_picks_farthest_and_is_bounded():
    from docling_api_ray.stages.clustering import cluster_outliers

    rng = np.random.default_rng(7)
    vecs = rng.normal(0, 0.05, size=(40, 3))
    vecs[5] = [0.9, 0.9, 0.9]   # gross outliers
    vecs[17] = [-0.9, 0.9, -0.9]
    rows = cluster_outliers(_ds(vecs), k=1, iters=1, top=2).take_all()
    assert len(rows) == 2
    assert {r["vec_id"] for r in rows} == {5, 17}
    # sorted by distance descending, deterministic
    assert rows[0]["dist"] >= rows[1]["dist"]


def test_semdedup_drops_higher_id_of_near_identical_pair():
    from docling_api_ray.stages.clustering import semdedup_keep

    vecs = [
        [1.0, 0.0, 0.0],
        [0.999, 0.001, 0.0],   # near-dup of 0 → dropped (higher id)
        [0.0, 1.0, 0.0],
        [-1.0, 0.0, 0.0],
    ]
    rows = {r["vec_id"]: r["keep"]
            for r in semdedup_keep(_ds(vecs), k=1, iters=1,
                                   threshold=0.99).take_all()}
    assert rows == {0: True, 1: False, 2: True, 3: True}


def test_gram_matrix_matches_numpy():
    from docling_api_ray.stages.linalg import gram_matrix

    rng = np.random.default_rng(11)
    vecs = rng.normal(0, 0.3, size=(25, 4))
    out = gram_matrix(_ds(vecs)).take_all()
    q = np.floor(vecs.astype(np.float32).astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    expect = q.T @ q
    assert len(out) == 16
    for r in out:
        assert r["gram"] == expect[r["i"], r["j"]], (r, expect[r["i"], r["j"]])
