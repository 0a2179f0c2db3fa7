"""Linear-algebra stages: random projection, PCA, and the new window /
join / edit-distance operators' edge cases on hand-built data."""

import datetime as dt

import numpy as np
import pyarrow as pa
import ray.data

from docling_api_ray.stages.editdist import edit_distance_pairs, levenshtein
from docling_api_ray.stages.joins import interval_join_events
from docling_api_ray.stages.linalg import (
    pca_components,
    pca_project,
    random_projection,
    rp_sign_matrix,
)
from docling_api_ray.stages.windows import grouped_running_total

SF_DIR = "/root/testdata/sf0.001"


def _emb_ds(rows=64, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(rows, dim)).astype(np.float32)
    return (
        ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(rows, dtype=np.int64)),
                    "embedding": pa.array(
                        [list(map(float, r)) for r in mat],
                        type=pa.list_(pa.float32()),
                    ),
                }
            )
        ),
        mat,
    )


def test_random_projection_matches_numpy():
    ds, mat = _emb_ds(rows=50, dim=8)
    out = {(r["vec_id"], r["j"]): r["proj"] for r in random_projection(ds, 3).take_all()}
    q = np.floor(mat.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    expect = q @ rp_sign_matrix(8, 3)
    for i in range(50):
        for j in range(3):
            assert out[(i, j)] == expect[i, j]


def test_rp_sign_matrix_deterministic_pm1():
    s = rp_sign_matrix(16, 4)
    assert set(np.unique(s)) <= {-1, 1}
    assert np.array_equal(s, rp_sign_matrix(16, 4))


def test_pca_project_matches_numpy_full():
    """Engine PCA (moment fold + driver eigh) == one-shot numpy PCA on
    the quantized matrix, including the sign convention."""
    ds, mat = _emb_ds(rows=120, dim=6)
    k = 3
    got = {r["vec_id"]: (r["pc0"], r["pc1"], r["pc2"])
           for r in pca_project(ds, k=k).take_all()}

    q = np.floor(mat.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    x = q * 1e-6
    mean = x.mean(axis=0)
    c = (x - mean).T @ (x - mean) / len(x)
    w, v = np.linalg.eigh(c)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    flips = np.where(
        comps[np.abs(comps).argmax(axis=0), np.arange(k)] < 0, -1.0, 1.0
    )
    comps = comps * flips
    p = np.round((x - mean) @ comps, 6)
    for i in range(120):
        assert np.allclose(got[i], p[i], atol=2e-6), i


def test_pca_components_variance_order():
    mean, eig, comps = pca_components(
        ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet",
                              columns=["vec_id", "embedding"]),
        k=4,
    )
    assert mean.shape == (64,) and comps.shape == (64, 4)
    assert all(eig[i] >= eig[i + 1] for i in range(3))
    # components are orthonormal
    assert np.allclose(comps.T @ comps, np.eye(4), atol=1e-9)


def test_levenshtein_reference_cases():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("flaw", "lawn") == 2
    # random cross-check against the O(L²) scalar DP
    rng = np.random.default_rng(3)

    def scalar_dp(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    for _ in range(25):
        a = "".join(rng.choice(list("abcd"), size=rng.integers(0, 12)))
        b = "".join(rng.choice(list("abcd"), size=rng.integers(0, 12)))
        assert levenshtein(a, b) == scalar_dp(a, b), (a, b)


def test_edit_distance_pairs_blocked():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "text": [
                    "shared prefix one two three",
                    "shared prefix one two four",  # same 16-char block as 1, 3
                    "shared prefix one - different tail",
                    "unique start here",
                    "another lone doc",
                ],
            }
        )
    )
    rows = edit_distance_pairs(docs, prefix_len=16, cap=120).take_all()
    got = {(r["left_id"], r["right_id"]): r["dist"] for r in rows}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert got[(1, 2)] == levenshtein(
        "shared prefix one two three", "shared prefix one two four"
    )


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute, 0)


def test_interval_join_window_bounds():
    """Window is [t-W, t): an event exactly W before counts, an event at
    exactly t does not; bucket-boundary candidates resolve correctly."""
    W = 600  # 10 min
    rows = [
        # user 1: purchase at :20; clicks at :10 (= t-W, in), :15 (in),
        # :20 (= t, out), :25 (after, out)
        (1, 1, "click", _ts(10), 1.5),
        (2, 1, "click", _ts(15), 2.25),
        (3, 1, "purchase", _ts(20), 9.0),
        (4, 1, "click", _ts(20), 4.0),
        (5, 1, "click", _ts(25), 8.0),
        # user 2: purchase with no clicks
        (6, 2, "purchase", _ts(30), 1.0),
        # user 3: click crossing a bucket boundary relative to purchase
        (7, 3, "click", _ts(9), 0.5),
        (8, 3, "purchase", _ts(11), 2.0),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "event_type": [r[2] for r in rows],
                "ts": pa.array([r[3] for r in rows], type=pa.timestamp("us")),
                "value": pa.array([r[4] for r in rows], type=pa.float64()),
            }
        )
    )
    out = {
        r["event_id"]: (r["n_prior"], r["sum_value_q"])
        for r in interval_join_events(
            ds, left_type="purchase", right_type="click", window_s=W
        ).take_all()
    }
    assert out[3] == (2, 1_500_000 + 2_250_000)
    assert out[6] == (0, 0)
    assert out[8] == (1, 500_000)
    assert set(out) == {3, 6, 8}


def test_grouped_running_total_hand_case():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
                "o": pa.array([3, 1, 2, 1, 2], type=pa.int64()),
                "v": pa.array([1.5, 2.0, 3.25, 10.0, 0.5], type=pa.float64()),
            }
        )
    )
    rows = grouped_running_total(ds, key="k", order=["o"], val="v").take_all()
    got = {(r["k"], r["o"]): r["running_q"] for r in rows}
    assert got == {
        (1, 1): 2_000_000,
        (1, 2): 5_250_000,
        (1, 3): 6_750_000,
        (2, 1): 10_000_000,
        (2, 2): 10_500_000,
    }


def test_pagerank_hand_graph():
    """Star a-center + 2-cycle + isolated node, 2 iterations, checked
    against a scalar reference of the integer recurrence."""
    from docling_api_ray.stages.graph import pagerank

    nodes = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3, 4, 10, 11, 99], type=pa.int64())})
    )
    # star: 1-2, 1-3, 1-4 ; cycle: 10-11 ; isolated: 99
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "left_id": pa.array([1, 1, 1, 10], type=pa.int64()),
                "right_id": pa.array([2, 3, 4, 11], type=pa.int64()),
            }
        )
    )
    got = {
        r["doc_id"]: r["rank_q"]
        for r in pagerank(nodes, pairs, iters=2).take_all()
    }

    # scalar reference
    adj = {1: [2, 3, 4], 2: [1], 3: [1], 4: [1], 10: [11], 11: [10], 99: []}
    rq = {v: 1_000_000 for v in adj}
    for _ in range(2):
        contrib = {v: (rq[v] // len(adj[v])) if adj[v] else 0 for v in adj}
        nxt = {}
        for v in adj:
            s = sum(contrib[u] for u in adj if v in adj[u])
            nxt[v] = 150_000 + (850_000 * s) // 1_000_000
        rq = nxt
    assert got == rq
    # the hub out-ranks the leaves
    assert got[1] > got[2] == got[3] == got[4]
    assert got[99] == 150_000


def test_ridge_fit_matches_numpy():
    """Distributed sufficient-statistics ridge == one-shot numpy solve on
    the quantized matrix."""
    from docling_api_ray.stages.linalg import ridge_fit

    rng = np.random.default_rng(11)
    n, dim = 200, 5
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    w_true = np.array([1.0, -2.0, 0.5, 0.0, 3.0])
    y = (mat @ w_true + 0.7 + rng.normal(scale=0.1, size=n)).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(y, type=pa.int64()),
            }
        )
    )
    w, b0 = ridge_fit(ds, lam=1.0)

    q = np.floor(mat.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    x = q * 1e-6
    xm = x.mean(axis=0)
    ym = y.mean()
    xc = x - xm
    w_ref = np.linalg.solve(xc.T @ xc + np.eye(dim), xc.T @ (y - ym))
    b_ref = ym - xm @ w_ref
    assert np.allclose(w, w_ref, atol=1e-9)
    assert abs(b0 - b_ref) < 1e-9


def test_triangle_counts_hand_graph():
    """K4 (every vertex in 3 triangles) + a triangle-free path + an
    isolated node; degree-oriented wedge join checked exactly."""
    from docling_api_ray.stages.graph import triangle_counts

    nodes = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([1, 2, 3, 4, 5, 6, 7, 99], type=pa.int64())}
        )
    )
    # K4 on 1-4; path 5-6-7
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "left_id": pa.array([1, 1, 1, 2, 2, 3, 5, 6], type=pa.int64()),
                "right_id": pa.array([2, 3, 4, 3, 4, 4, 6, 7], type=pa.int64()),
            }
        )
    )
    got = {
        r["doc_id"]: (r["triangles"], r["deg"])
        for r in triangle_counts(nodes, pairs).take_all()
    }
    assert got == {
        1: (3, 3),
        2: (3, 3),
        3: (3, 3),
        4: (3, 3),
        5: (0, 1),
        6: (0, 2),
        7: (0, 1),
        99: (0, 0),
    }


def test_graph_giant_component_fallback_agrees():
    """Adversarial giant component (VERDICT r4 #2): a 24-clique (every
    doc in one near-dup cluster) + a 3-path + an isolated node, with the
    census guard forced to 1 so BOTH graph operators take the
    per-iteration node-hashed plan; the results must agree bit-for-bit
    with the per-component co-group plan, and the census itself must
    report the clique's true load (24 node rows + 552 bidirected edge
    rows)."""
    from docling_api_ray.stages.graph import (
        _graph_prep,
        pagerank,
        triangle_counts,
    )

    n_clique = 24
    ids = list(range(1, n_clique + 1)) + [50, 51, 52, 99]
    nodes_tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    lft, rgt = [], []
    for i in range(1, n_clique + 1):
        for j in range(i + 1, n_clique + 1):
            lft.append(i)
            rgt.append(j)
    lft += [50, 51]
    rgt += [51, 52]
    pairs_tbl = pa.table(
        {
            "left_id": pa.array(lft, type=pa.int64()),
            "right_id": pa.array(rgt, type=pa.int64()),
        }
    )

    def nodes():
        return ray.data.from_arrow(nodes_tbl)

    def pairs():
        return ray.data.from_arrow(pairs_tbl)

    # the census sees the clique: 24 node rows + 2·C(24,2) edge rows
    prep = _graph_prep(nodes(), pairs(), id_col="doc_id")
    assert prep["max_load"] == n_clique + n_clique * (n_clique - 1)

    pr_co = {
        r["doc_id"]: r["rank_q"]
        for r in pagerank(
            nodes(), pairs(), iters=3, max_component_rows=10**9
        ).take_all()
    }
    pr_it = {
        r["doc_id"]: r["rank_q"]
        for r in pagerank(
            nodes(), pairs(), iters=3, max_component_rows=1
        ).take_all()
    }
    assert pr_it == pr_co
    assert len(pr_it) == len(ids)
    # symmetric clique: all members equal; isolated at the BASE_Q floor
    clique_ranks = {pr_it[i] for i in range(1, n_clique + 1)}
    assert len(clique_ranks) == 1
    assert pr_it[99] == 150_000

    tri_co = {
        r["doc_id"]: (r["triangles"], r["deg"])
        for r in triangle_counts(
            nodes(), pairs(), max_component_rows=10**9
        ).take_all()
    }
    tri_it = {
        r["doc_id"]: (r["triangles"], r["deg"])
        for r in triangle_counts(
            nodes(), pairs(), max_component_rows=1
        ).take_all()
    }
    assert tri_it == tri_co
    # each clique member closes C(23,2) triangles at degree 23
    assert tri_it[1] == ((n_clique - 1) * (n_clique - 2) // 2, n_clique - 1)
    assert tri_it[50] == (0, 1)
    assert tri_it[51] == (0, 2)
    assert tri_it[99] == (0, 0)


def test_quantize_embeddings_extremes_and_constant_dim():
    """Min/max map to -127/+127; a constant dimension (span 0) codes
    to -127 everywhere; interior value floors correctly."""
    from docling_api_ray.stages.linalg import quantize_embeddings

    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], type=pa.int64()),
            "embedding": pa.array(
                [[0.0, 5.0], [1.0, 5.0], [0.4, 5.0]],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    out = {
        (r["vec_id"], r["i"]): r["code"]
        for r in quantize_embeddings(
            ray.data.from_arrow(t).repartition(2)
        ).take_all()
    }
    assert out[(0, 0)] == -127 and out[(1, 0)] == 127
    # q=400000, span=1000000: 400000*254//1000000 - 127 = 101 - 127
    assert out[(2, 0)] == -26
    assert out[(0, 1)] == out[(1, 1)] == out[(2, 1)] == -127


def test_triangle_fallback_degree_id_order_mismatch():
    """Degree-HETEROGENEOUS graph where one edge's id order opposes its
    degree order: triangle {1,2,3} plus pendant edge 2-4 — edge 2-3 is
    oriented 3→2 (deg(3)=2 < deg(2)=3), so a raw-id wedge pair order
    would probe the nonexistent 2→3 direction and silently miss the
    triangle.  Both plans must count it."""
    from docling_api_ray.stages.graph import triangle_counts

    nodes = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64())})
    )
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "left_id": pa.array([1, 1, 2, 2], type=pa.int64()),
                "right_id": pa.array([2, 3, 3, 4], type=pa.int64()),
            }
        )
    )
    expect = {1: (1, 2), 2: (1, 3), 3: (1, 2), 4: (0, 1)}
    got_cg = {
        r["doc_id"]: (r["triangles"], r["deg"])
        for r in triangle_counts(nodes, pairs).take_all()
    }
    got_it = {
        r["doc_id"]: (r["triangles"], r["deg"])
        for r in triangle_counts(
            nodes, pairs, max_component_rows=1
        ).take_all()
    }
    assert got_cg == expect
    assert got_it == expect
