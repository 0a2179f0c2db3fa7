"""Distribution statistics (exact grouped quantiles) and BM25 scoring."""

import numpy as np
import pyarrow as pa
import ray.data

from docling_api_ray.stages.relevance import bm25_scores, corpus_stats
from docling_api_ray.stages.stats import grouped_int_quantiles


def test_grouped_int_quantiles_matches_percentile_disc():
    rng = np.random.RandomState(0)
    groups, vals = [], []
    sizes = {"a": 101, "b": 7, "c": 1}
    for g, n in sizes.items():
        groups += [g] * n
        vals += rng.randint(0, 50, n).tolist()
    ds = ray.data.from_arrow(pa.table({"g": groups, "v": vals}))
    out = {
        r["g"]: r
        for r in grouped_int_quantiles(
            ds, group_col="g", value_col="v"
        ).take_all()
    }
    import math

    for g, n in sizes.items():
        sub = sorted(v for gg, v in zip(groups, vals) if gg == g)
        for p, name in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            # SQL percentile_disc: smallest value at cumulative position
            # ceil(p * n)
            expect = sub[max(1, math.ceil(p * n)) - 1]
            assert out[g][name] == expect, (g, name)


def test_corpus_stats_exact_token_counts():
    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a a a b",          # tf(a)=3 — adjacent tokens all count
                "  a  ",            # whitespace padding: 1 token
                "",                 # empty doc
                "b c",
            ],
        }
    )
    st = corpus_stats(ray.data.from_arrow(docs), ["a", "b", "z"])
    assert st["n_docs"] == 4
    assert st["total_tokens"] == 7
    assert st["df"] == {"a": 2, "b": 2, "z": 0}


def test_bm25_ranking_and_determinism():
    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "ray data streams blocks",
                "ray ray ray everywhere ray",
                "completely unrelated words here",
                "data data",
            ],
        }
    )
    ds = ray.data.from_arrow(docs)
    out = {r["doc_id"]: r["score"] for r in bm25_scores(ds, ["ray", "data"]).take_all()}
    out2 = {r["doc_id"]: r["score"] for r in bm25_scores(ds, ["ray", "data"]).take_all()}
    assert out == out2  # deterministic
    assert len(out) == 4
    assert out[3] == 0.0  # no query terms
    # docs containing both terms or high tf outrank the unrelated doc
    assert out[1] > out[3] and out[2] > out[3] and out[4] > out[3]
    # term repetition saturates but still scores above single occurrence
    # of the same single term (doc2 is pure "ray", doc4 pure "data")
    assert out[2] > 0 and out[4] > 0


def test_heavy_hitters_sketch_guarantee_open_vocab():
    """Adversarial open-vocabulary corpus: tons of unique noise words
    force real MG truncation in every batch, yet every word above the
    frequency threshold MUST survive (mergeable-summary guarantee) with
    its EXACT count."""
    from docling_api_ray.stages.sketch import heavy_hitters

    rng = np.random.RandomState(5)
    docs = []
    # 3 genuinely heavy words + unique-per-doc noise
    for i in range(400):
        words = []
        words += ["alpha"] * 6          # ~heavy
        words += ["beta"] * 4           # ~heavy
        words += ["gamma"] * 1          # light
        words += [f"noise{i}_{j}" for j in range(20)]  # open vocab
        rng.shuffle(words)
        docs.append(" ".join(words))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(400)), "text": docs})
    )
    # threshold 1/10: total tokens = 400*31 = 12400; alpha 2400 (19.4%),
    # beta 1600 (12.9%), gamma 400 (3.2%), each noise word freq 1
    out = {r["word"]: r["n"] for r in
           heavy_hitters(ds, num=1, den=10).take_all()}
    assert out == {"alpha": 2400, "beta": 1600}

    # exact counts also verified at a looser threshold including gamma
    out2 = {r["word"]: r["n"] for r in
            heavy_hitters(ds, num=1, den=40).take_all()}
    assert out2 == {"alpha": 2400, "beta": 1600, "gamma": 400}


def test_hll_estimate_accuracy():
    """The register-table sketch estimates distinct-token cardinality
    within the theoretical ~1.04/sqrt(4096)≈1.6% band (3-sigma slack)."""
    from docling_api_ray.stages.sketch import hll_estimate, hll_registers

    rng = np.random.RandomState(11)
    docs, truth = [], set()
    for i in range(300):
        words = [f"w{rng.randint(0, 60000)}" for _ in range(80)]
        truth.update(words)
        docs.append(" ".join(words))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(300)), "text": docs})
    )
    regs = hll_registers(ds).take_all()
    est = hll_estimate(regs)
    err = abs(est - len(truth)) / len(truth)
    assert err < 0.05, (est, len(truth))
    # determinism: same registers on a second run
    regs2 = hll_registers(ds).take_all()
    assert sorted((r["bucket"], r["max_rho"]) for r in regs) == sorted(
        (r["bucket"], r["max_rho"]) for r in regs2
    )


def test_tfidf_topterms_small_exact():
    """Hand-checkable 4-doc corpus: idf = ln((1+N)/(1+df)); corpus-wide
    words score 0 after quantization never outrank rare words; per-doc
    top-k is (score desc, word asc) with fewer-than-k docs kept whole."""
    import math

    from docling_api_ray.stages.relevance import tfidf_topterms

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "apple apple banana common",
                    "banana cherry common",
                    "common",
                    "   ",  # whitespace-only: zero tokens, no output rows
                ],
            }
        )
    )
    rows = tfidf_topterms(ds, k=2).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["word"], r["score"]))
    q6 = lambda x: float(np.rint(x * 1e6) / 1e6)
    idf = lambda df: math.log((1.0 + 4) / (1.0 + df))
    # doc 1: apple tf=2 df=1 -> 2*ln(2.5); banana tf=1 df=2 -> ln(5/3)
    assert sorted(by_doc[1]) == sorted(
        [("apple", q6(2 * idf(1))), ("banana", q6(idf(2)))]
    )
    # doc 2: banana and cherry beat 'common' (df=3, smallest idf)
    assert sorted(by_doc[2]) == sorted(
        [("cherry", q6(idf(1))), ("banana", q6(idf(2)))]
    )
    # doc 3 has one word only -> kept whole even though k=2
    assert by_doc[3] == [("common", q6(idf(3)))]
    # doc 4 contributes nothing
    assert 4 not in by_doc


def test_global_rank_ties_and_percentile():
    """Tie-heavy values rank by id ascending within a value; ranks are a
    dense permutation 1..N; percentile = rank/N bit-exactly."""
    from docling_api_ray.stages.stats import global_rank

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [10, 11, 12, 13, 14, 15],
                "n_chars": [5, 9, 5, 9, 1, 5],
            }
        )
    )
    rows = sorted(global_rank(ds).take_all(), key=lambda r: r["doc_rank"])
    order = [(r["doc_id"], r["n_chars"], r["doc_rank"]) for r in rows]
    assert order == [
        (11, 9, 1), (13, 9, 2),          # value 9: id asc
        (10, 5, 3), (12, 5, 4), (15, 5, 5),  # value 5 ties: id asc
        (14, 1, 6),
    ]
    assert all(r["percentile"] == r["doc_rank"] / 6.0 for r in rows)


def test_bloom_membership_no_false_negatives():
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.sketch import bloom_membership

    # benchmark slice = doc_id % 5 == 0; a non-benchmark doc REPEATING a
    # benchmark text must flag (text-keyed membership), unique texts
    # should (overwhelmingly, at this fill factor) not
    texts = [f"doc body {i} unique words" for i in range(40)]
    texts[7] = texts[5]  # doc 7 duplicates benchmark doc 5's text
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(40)), "text": texts})
    )
    out = {r["doc_id"]: r["maybe_contaminated"]
           for r in bloom_membership(ds, bench_mod=5).take_all()}
    assert len(out) == 40
    # no false negatives: every benchmark doc self-flags
    assert all(out[i] for i in range(0, 40, 5))
    assert out[7]  # duplicate of a benchmark text flags
    # 131072-bit filter with 8 items x 4 probes: unique texts stay clean
    clean = [i for i in range(40) if i % 5 and i != 7]
    assert sum(out[i] for i in clean) == 0


def test_countmin_upper_bound_and_exactness():
    import collections

    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.sketch import countmin_estimates

    texts = ["a b c a", "b b d", "a e f g h"]
    exact = collections.Counter(w for t in texts for w in t.split())
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1, 2], "text": texts})
    )
    got = {r["word"]: r["est_n"]
           for r in countmin_estimates(ds, ["a", "b", "z"]).take_all()}
    # CMS never underestimates; at 7 distinct words in a 4x1024 grid
    # there are no collisions, so estimates are exact here
    assert got == {"a": exact["a"], "b": exact["b"], "z": 0}


def test_robust_stats_by_group_median_mad_trim():
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.stats import robust_stats_by_group

    # group a: values 1..20 plus outlier 1000 (n=21):
    #   median = ceil(10.5)=rank 11 -> 11
    #   deviations |v-11|: 0,1,1,2,2,...,10,989 -> rank 11 -> 5
    #   trim=0.05: t=floor(1.05)=1 -> drop rank 1 (v=1) and rank 21
    #   (v=1000): mean(2..20) = 11.0
    vals = list(range(1, 21)) + [1000]
    t = pa.table(
        {
            "g": pa.array(["a"] * len(vals), pa.string()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    out = robust_stats_by_group(
        ray.data.from_arrow(t).repartition(4),
        group_col="g",
        value_col="v",
        trim=0.05,
    ).take_all()
    assert out == [
        {"g": "a", "median": 11, "mad": 5, "trimmed_mean": 11.0}
    ]


def test_grouped_percent_rank_ties_and_singleton():
    """RANK-semantics percent_rank: ties share (#less)/(N-1); singleton
    groups return 0.0 (SQL convention); zero data movement design."""
    import numpy as np
    import pandas as pd
    import ray.data

    from docling_api_ray.stages.stats import grouped_percent_rank

    df = pd.DataFrame(
        {
            "doc_id": range(7),
            "source": ["a", "a", "a", "a", "b", "b", "c"],
            "n_chars": [10, 20, 20, 30, 5, 9, 77],
        }
    )
    out = (
        grouped_percent_rank(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = dict(zip(out["doc_id"], out["pct_rank"]))
    assert got[0] == 0.0
    assert got[1] == got[2] == 1 / 3  # tied 20s share rank 2 -> (1)/(4-1)
    assert got[3] == 1.0
    assert got[4] == 0.0 and got[5] == 1.0
    assert got[6] == 0.0  # singleton group


def test_grouped_ntile_remainder_and_small_groups():
    """SQL NTILE remainder rule: 6 rows / 4 tiles -> sizes 2,2,1,1;
    a group smaller than k gives one row per leading tile; ties on the
    value break by doc_id."""
    import pandas as pd
    import ray.data

    from docling_api_ray.stages.stats import grouped_ntile

    df = pd.DataFrame(
        {
            "doc_id": range(13),
            "source": ["a"] * 6 + ["b"] * 2 + ["c"] * 5,
            "n_chars": [5, 5, 5, 5, 9, 9, 7, 3, 1, 2, 3, 4, 5],
        }
    )
    out = (
        grouped_ntile(
            ray.data.from_pandas(df).repartition(4), tiles=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = dict(zip(out["doc_id"], out["tile"]))
    # group a: order by (n_chars, doc_id) = docs 0,1,2,3,4,5 -> 1,1,2,2,3,4
    assert [got[i] for i in range(6)] == [1, 1, 2, 2, 3, 4]
    # group b: 2 rows < 4 tiles -> ranks become tiles (3 sorts before 7)
    assert got[7] == 1 and got[6] == 2
    # group c: 5 rows -> sizes 2,1,1,1 over ascending n_chars 1,2,3,4,5
    assert [got[i] for i in range(8, 13)] == [1, 1, 2, 3, 4]


def test_feature_corr_matches_oneshot_numpy():
    """feature_corr's distributed integer-moment fold must equal a
    one-shot numpy Pearson over the same feature matrix, independent of
    partitioning; constant features pin corr = 0 by definition."""
    import math

    import ray.data

    from docling_api_ray.stages.stats import feature_corr
    from docling_api_ray.stages import text_analysis as ta
    import pyarrow.compute as pc

    texts = [
        "the cat sat, on the mat!",
        "a b c d e f g h",
        "word " * 50,
        "punct!!! ... ;;; :::",
        "the the the and and of",
        "x",
    ] * 3
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = feature_corr(ray.data.from_arrow(tbl).repartition(5))
    got = {
        (fx, fy): c
        for fx, fy, c in zip(
            out["fx"].to_pylist(), out["fy"].to_pylist(),
            out["corr"].to_pylist(),
        )
    }
    t = tbl["text"]
    feats = {
        "n_chars": np.asarray(pc.utf8_length(t), dtype=np.int64),
        "n_words": np.asarray(ta._count(t, ta.WS_TOKEN_RE), dtype=np.int64),
        "n_punct": np.asarray(ta._count(t, ta.PUNCT_RE), dtype=np.int64),
        "n_stop": np.asarray(ta._count(t, ta.STOPWORD_RE), dtype=np.int64),
    }
    names = list(feats)
    n = len(texts)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            x, y = feats[a], feats[b]
            num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
            d1 = n * int((x * x).sum()) - int(x.sum()) ** 2
            d2 = n * int((y * y).sum()) - int(y.sum()) ** 2
            if d1 == 0 or d2 == 0:
                expect = 0.0
            else:
                expect = (
                    math.floor(
                        float(num) / math.sqrt(float(d1) * float(d2)) * 1e6
                        + 0.5
                    )
                    / 1e6
                )
            assert got[(a, b)] == expect, (a, b)
    assert len(got) == 6


def test_feature_corr_zero_variance_defines_zero():
    import ray.data

    from docling_api_ray.stages.stats import feature_corr

    # identical docs: every feature has zero variance -> all six pairs 0
    tbl = pa.table({"doc_id": [0, 1, 2], "text": ["same text here"] * 3})
    out = feature_corr(ray.data.from_arrow(tbl).repartition(2))
    assert out["corr"].to_pylist() == [0.0] * 6


def test_hybrid_rrf_fusion_semantics():
    """RRF over tiny controlled lists: a doc in both lists outranks a
    doc that leads one list only; absent-list ranks surface as -1; the
    micro-score is the exact floor-quantized integer."""
    import math

    import ray.data

    from docling_api_ray.stages.relevance import hybrid_rrf

    # corpus: doc 1 matches the query terms hard (lexical #1) but its
    # vector is orthogonal; doc 2 is mid in both lists; doc 3 is dense #1
    texts = {
        1: "scan scan scan column window",
        2: "scan column filler filler filler",
        3: "nothing relevant lexically at all",
        4: "also nothing here",
    }
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": list(texts),
                "text": [texts[i] for i in texts],
            }
        )
    )
    qv = np.array([1.0, 0.0, 0.0, 0.0])
    vecs = {
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.8, 0.6, 0.0, 0.0],
        3: [1.0, 0.0, 0.0, 0.0],
        4: [0.5, 0.5, 0.70710678, 0.0],
    }
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": list(vecs),
                "embedding": pa.array(
                    [vecs[i] for i in vecs], type=pa.list_(pa.float32())
                ),
            }
        )
    )
    out = hybrid_rrf(
        docs, emb, ["scan", "column", "window"], 99, qv, k_each=3, k_out=4
    )
    rows = {
        r["doc_id"]: r
        for r in (dict(zip(out.column_names, t)) for t in zip(
            *[c.to_pylist() for c in out.columns]))
    }
    m = lambda r: math.floor(1e6 / (60 + r) + 0.5)
    # doc 2: lexical rank 2, dense rank 2 -> fused top
    assert rows[2]["bm25_rank"] == 2 and rows[2]["cos_rank"] == 2
    assert rows[2]["rrf_micro"] == 2 * m(2)
    # doc 3: dense #1, lexically absent (k_each=3 keeps 3 lexical docs,
    # but doc 3 scores 0 -> may still place; accept either sentinel or rank)
    assert rows[3]["cos_rank"] == 1
    # doc 1: lexical #1, dense rank 4 -> truncated out of the k_each=3
    # dense list -> cos_rank sentinel -1
    assert rows[1]["bm25_rank"] == 1 and rows[1]["cos_rank"] == -1
    assert rows[1]["rrf_micro"] == m(1)
    # fused ordering: integer micro-scores strictly decide
    scores = [r["rrf_micro"] for r in (rows[d] for d in sorted(rows))]
    assert out["rrf_micro"].to_pylist() == sorted(
        out["rrf_micro"].to_pylist(), reverse=True
    )


def test_hybrid_rrf_merge_exceeds_default_batch():
    """ADVICE r4 (high): the single-partition lexical merge must see the
    WHOLE partition — with >1024 rows of per-block partial heads, Ray's
    default 1024-row batching would apply the final head per-chunk,
    leaving lex_top unsorted and the enumerate-based bm25_rank wrong.
    4000 docs over 32 blocks with k_each=1500 puts 4000 rows through the
    merge; the fused ranks must match an independently computed fusion
    of the stage's own BM25 scores and knn ranks."""
    import math

    import ray.data

    from docling_api_ray.stages.relevance import RRF_C, bm25_scores, hybrid_rrf
    from docling_api_ray.stages.similarity import knn_bruteforce

    n = 4000
    rng = np.random.RandomState(13)
    texts = [
        "scan " * int(rng.randint(1, 9))
        + "column " * int(rng.randint(0, 5))
        + "filler " * int(rng.randint(0, 20))
        for _ in range(n)
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
    ).repartition(32)
    mat = rng.normal(size=(n, 8)).astype(np.float32)
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
    ).repartition(32)
    qv = rng.normal(size=8)
    terms = ["scan", "column"]
    k_each, k_out = 1500, 40

    out = hybrid_rrf(
        docs, emb, terms, -1, qv, k_each=k_each, k_out=k_out
    )

    # independent fusion from the stage's own scoring primitives
    lex = sorted(
        (
            (-r["score"], r["doc_id"])
            for r in bm25_scores(
                ray.data.from_arrow(
                    pa.table(
                        {
                            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                            "text": pa.array(texts),
                        }
                    )
                ),
                terms,
            ).take_all()
        )
    )[:k_each]
    bm25_rank = {int(d): i + 1 for i, (_, d) in enumerate(lex)}
    cos_rank = {
        int(r["vec_id"]): int(r["rank"])
        for r in knn_bruteforce(
            ray.data.from_arrow(
                pa.table(
                    {
                        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                        "embedding": pa.array(
                            [list(map(float, r)) for r in mat],
                            type=pa.list_(pa.float32()),
                        ),
                    }
                )
            ),
            [-1],
            np.asarray(qv, dtype=np.float64)[None, :],
            k=k_each,
        ).take_all()
    }
    fused: dict[int, int] = {}
    for d, r in bm25_rank.items():
        fused[d] = fused.get(d, 0) + math.floor(1e6 / (RRF_C + r) + 0.5)
    for d, r in cos_rank.items():
        fused[d] = fused.get(d, 0) + math.floor(1e6 / (RRF_C + r) + 0.5)
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k_out]

    assert out["doc_id"].to_pylist() == [d for d, _ in top]
    assert out["rrf_micro"].to_pylist() == [s for _, s in top]
    assert out["bm25_rank"].to_pylist() == [
        bm25_rank.get(d, -1) for d, _ in top
    ]
    assert out["cos_rank"].to_pylist() == [
        cos_rank.get(d, -1) for d, _ in top
    ]


def test_rank_rbo_matches_bruteforce_prefix_sets():
    """rank_rbo's incremental overlap counter must equal the literal
    Webber et al. definition — RBO@k = Σ_d (|A_:d ∩ B_:d|/d)·0.5^d with
    prefix sets recomputed from scratch — over the stage's own two
    rankings (BM25 and cosine), on a corpus where the two lists
    genuinely disagree."""
    import math

    import ray.data

    from docling_api_ray.stages.relevance import (
        bm25_scores,
        rank_rbo,
    )
    from docling_api_ray.stages.similarity import knn_bruteforce

    n = 300
    rng = np.random.RandomState(29)
    texts = [
        "scan " * int(rng.randint(0, 6))
        + "column " * int(rng.randint(0, 4))
        + "filler " * int(rng.randint(1, 15))
        for _ in range(n)
    ]
    mat = rng.normal(size=(n, 6)).astype(np.float32)
    mk_docs = lambda: ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
    ).repartition(8)
    mk_emb = lambda: ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
    ).repartition(8)
    qv = rng.normal(size=6)
    terms = ["scan", "column"]
    k = 50

    out = rank_rbo(mk_docs(), mk_emb(), terms, -1, qv, k=k)

    # the two rankings, from the stage's own scoring primitives
    lex = sorted(
        (-r["score"], r["doc_id"])
        for r in bm25_scores(mk_docs(), terms).take_all()
    )[:k]
    a_order = [int(d) for _, d in lex]
    b_order = [
        int(r["vec_id"])
        for r in sorted(
            knn_bruteforce(
                mk_emb(),
                [-1],
                np.asarray(qv, dtype=np.float64)[None, :],
                k=k,
            ).take_all(),
            key=lambda r: r["rank"],
        )
    ]
    # brute-force prefix-set RBO with the same micro-quantization
    total_micro = 0
    x_last = 0
    for d in range(1, k + 1):
        x_last = len(set(a_order[:d]) & set(b_order[:d]))
        total_micro += int(
            math.floor((x_last / d) * (0.5**d) * 1e12 + 0.5)
        )
    assert out["k"].to_pylist() == [k]
    assert out["overlap_at_k"].to_pylist() == [x_last]
    assert out["rbo"].to_pylist() == [float(total_micro) / 1e12]
    # the corpus must actually exercise disagreement, or the test is vacuous
    assert 0 < x_last < k


def test_grouped_ols_matches_oneshot_numpy():
    import math

    import ray.data

    from docling_api_ray.stages.stats import grouped_ols

    rng = np.random.RandomState(7)
    rows = []
    # group a: y correlates with x; group b: constant x (den_x = 0);
    # group c: a singleton
    for i in range(40):
        x = int(rng.randint(10, 500))
        words = max(1, x // 5 + int(rng.randint(-3, 4)))
        rows.append(("a", x, "w " * words))
    for i in range(10):
        rows.append(("b", 100, "w " * int(rng.randint(1, 30))))
    rows.append(("c", 42, "one two three"))
    tbl = pa.table(
        {
            "doc_id": list(range(len(rows))),
            "source": [r[0] for r in rows],
            "n_chars": [r[1] for r in rows],
            "text": [r[2].strip() for r in rows],
        }
    )
    out = {
        r["source"]: r
        for r in grouped_ols(
            ray.data.from_arrow(tbl).repartition(7)
        ).take_all()
    }
    q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
    for g in ("a", "b", "c"):
        xs = np.array([r[1] for r in rows if r[0] == g], dtype=np.int64)
        ys = np.array(
            [len(r[2].split()) for r in rows if r[0] == g], dtype=np.int64
        )
        n = len(xs)
        num = n * int((xs * ys).sum()) - int(xs.sum()) * int(ys.sum())
        den_x = n * int((xs * xs).sum()) - int(xs.sum()) ** 2
        den_y = n * int((ys * ys).sum()) - int(ys.sum()) ** 2
        slope_raw = 0.0 if den_x == 0 else float(num) / float(den_x)
        intercept = q6(
            (float(ys.sum()) - slope_raw * float(xs.sum())) / float(n)
        )
        r2 = (
            0.0
            if den_x == 0 or den_y == 0
            else q6(float(num) * float(num) / (float(den_x) * float(den_y)))
        )
        assert out[g]["n_docs"] == n
        assert out[g]["slope"] == q6(slope_raw), g
        assert out[g]["intercept"] == intercept, g
        assert out[g]["r2"] == r2, g
    # sanity: the correlated group's fit is meaningful
    assert out["a"]["r2"] > 0.9 and 0.15 < out["a"]["slope"] < 0.25
    # zero-variance x pins slope 0, intercept = mean(y)
    assert out["b"]["slope"] == 0.0 and out["b"]["r2"] == 0.0
    # singleton: den_x = 0 -> slope 0, intercept = its own y
    assert out["c"]["slope"] == 0.0 and out["c"]["intercept"] == 3.0


def test_grouped_eta2_exact_decomposition():
    """η² against a hand-computed reference; separable groups give high
    η², identical group means give ~0; zero variance defines 0; result
    is partition independent."""
    import math

    import ray.data

    from docling_api_ray.stages.stats import grouped_eta2

    def eta(groups, vals, parts=4):
        tbl = pa.table(
            {
                "doc_id": list(range(len(vals))),
                "source": groups,
                "n_chars": vals,
            }
        )
        out = grouped_eta2(ray.data.from_arrow(tbl).repartition(parts))
        return (
            out["n_docs"][0].as_py(),
            out["n_groups"][0].as_py(),
            out["eta2"][0].as_py(),
        )

    # fully separated: group a all 10, group b all 20 -> eta2 = 1
    n, g, e = eta(["a"] * 5 + ["b"] * 5, [10] * 5 + [20] * 5)
    assert (n, g) == (10, 2) and e == 1.0
    # identical distribution in both groups -> between-group SS = 0
    n, g, e = eta(["a", "a", "b", "b"], [1, 3, 1, 3])
    assert e == 0.0
    # zero total variance -> defined 0
    _, _, e = eta(["a", "b"], [7, 7])
    assert e == 0.0
    # hand reference on a mixed case, quantized-int formula
    groups = ["a"] * 3 + ["b"] * 4
    vals = [1, 2, 6, 4, 4, 5, 9]
    n, g, e = eta(groups, vals, parts=3)
    import numpy as np

    t_all = (sum(vals) ** 2 * 10**6) // len(vals)
    sb = sum(
        (sum(v for gg, v in zip(groups, vals) if gg == x) ** 2 * 10**6)
        // groups.count(x)
        for x in ("a", "b")
    ) - t_all
    st = sum(v * v for v in vals) * 10**6 - t_all
    assert e == math.floor(sb / st * 1e6 + 0.5) / 1e6
    assert eta(groups, vals, parts=1) == (n, g, e)


def test_grouped_roc_auc_matches_rank_reference():
    """grouped_roc_auc must equal the midrank Mann-Whitney AUC computed
    independently per group (scipy-free: average ranks via argsort +
    tie-block means), including heavy ties and a degenerate all-positive
    group that must emit NO row."""
    import ray.data

    from docling_api_ray.stages.stats import grouped_roc_auc

    rng = np.random.RandomState(41)
    groups, scores, labels = [], [], []
    for g, n in (("a", 400), ("b", 250), ("c", 64)):
        s = rng.randint(-50, 51, size=n)  # heavy ties on purpose
        p = (rng.rand(n) < (0.3 + 0.4 * (s > 0))).astype(np.int64)
        groups += [g] * n
        scores += list(s)
        labels += list(p)
    # degenerate group: all positive -> no output row
    groups += ["z"] * 10
    scores += list(range(10))
    labels += [1] * 10
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(groups),
                "sc": pa.array(np.array(scores, dtype=np.int64)),
                "pos": pa.array(np.array(labels, dtype=np.int64)),
            }
        )
    ).repartition(16)
    out = (
        grouped_roc_auc(
            ds, group_col="src", score_col="sc", pos_col="pos"
        )
        .to_pandas()
        .sort_values("src")
        .reset_index(drop=True)
    )
    assert list(out["src"]) == ["a", "b", "c"]  # "z" dropped

    import pandas as pd

    df = pd.DataFrame({"src": groups, "sc": scores, "pos": labels})
    for _, row in out.iterrows():
        sub = df[df.src == row["src"]]
        ranks = sub["sc"].rank(method="average")
        n_pos = int(sub.pos.sum())
        n_neg = len(sub) - n_pos
        u = float(ranks[sub.pos == 1].sum()) - n_pos * (n_pos + 1) / 2
        ref = u / (n_pos * n_neg)
        assert row["n_pos"] == n_pos and row["n_neg"] == n_neg
        # engine is the exact integer micro-quantize of ref
        assert abs(row["auc"] - ref) <= 5e-7, (row["src"], row["auc"], ref)


def test_calibration_bins_matches_pandas_reference():
    import pandas as pd
    import ray.data

    from docling_api_ray.stages.stats import calibration_bins

    rng = np.random.RandomState(17)
    n = 1000
    pm = rng.randint(0, 1_000_001, size=n).astype(np.int64)
    pm[:50] = 1_000_000  # exercise the top-bin clamp
    pos = (rng.rand(n) < pm / 1e6).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "prob_micro": pa.array(pm),
                "pos": pa.array(pos),
            }
        )
    ).repartition(8)
    out = calibration_bins(ds, n_bins=10).to_pandas()

    df = pd.DataFrame({"pm": pm, "pos": pos})
    df["bin"] = np.minimum(df.pm * 10 // 1_000_000, 9)
    ref = (
        df.groupby("bin")
        .agg(n=("pm", "size"), pos=("pos", "sum"), pm_sum=("pm", "sum"))
        .reset_index()
    )
    assert list(out["bin"]) == sorted(ref["bin"])
    ref = ref.sort_values("bin").reset_index(drop=True)
    assert list(out["n"]) == list(ref["n"])
    assert list(out["frac_pos"]) == list(ref["pos"] / ref["n"])
    assert list(out["mean_prob"]) == list(ref["pm_sum"] / 1e6 / ref["n"])
    assert out["bin"].iloc[-1] == 9  # the clamp kept 1.0 inside bin 9


def test_grouped_ks_drift_matches_ecdf_reference():
    """grouped_ks_drift must equal the brute-force two-sample KS
    statistic (sup over the merged value grid of |F_s - F_rest|) for
    every group, and a corpus with ONE group must emit no row."""
    import pandas as pd
    import ray.data

    from docling_api_ray.stages.stats import grouped_ks_drift

    rng = np.random.RandomState(23)
    groups, vals = [], []
    for g, (lo, hi, n) in {
        "a": (0, 100, 300),     # uniform-ish
        "b": (40, 60, 200),     # concentrated: big drift vs rest
        "c": (0, 100, 500),
    }.items():
        groups += [g] * n
        vals += list(rng.randint(lo, hi, size=n))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(groups),
                "v": pa.array(np.array(vals, dtype=np.int64)),
            }
        )
    ).repartition(16)
    out = (
        grouped_ks_drift(ds, group_col="src", value_col="v")
        .to_pandas()
        .sort_values("src")
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"src": groups, "v": vals})
    grid = np.sort(df.v.unique())
    for _, row in out.iterrows():
        s = df[df.src == row["src"]].v.to_numpy()
        r = df[df.src != row["src"]].v.to_numpy()
        fs = np.searchsorted(np.sort(s), grid, side="right") / len(s)
        fr = np.searchsorted(np.sort(r), grid, side="right") / len(r)
        ref = float(np.max(np.abs(fs - fr)))
        assert row["n"] == len(s) and row["n_rest"] == len(r)
        assert abs(row["ks_d"] - ref) < 1e-12, (row["src"], row["ks_d"], ref)
    # group b must be the drifted one
    assert out.loc[out.ks_d.idxmax(), "src"] == "b"

    # single-group corpus: no complement -> empty output, stable schema
    one = ray.data.from_arrow(
        pa.table({"src": ["a", "a"], "v": pa.array([1, 2], type=pa.int64())})
    )
    empty = grouped_ks_drift(one, group_col="src", value_col="v")
    assert empty.count() == 0
    assert empty.schema().names == ["src", "n", "n_rest", "ks_d"]


def test_grouped_psi_matches_numpy_reference():
    """grouped_psi must equal the literal Laplace-smoothed PSI formula
    computed from scratch per group; an identical-distribution group
    scores ~0 and a shifted group scores >> 0; the only-group case
    emits no row."""
    import pandas as pd
    import ray.data

    from docling_api_ray.stages.stats import grouped_psi

    rng = np.random.RandomState(43)
    groups, pms = [], []
    # a: uniform probs; b: same distribution; c: mass shifted high
    for g, lo, hi, n in [
        ("a", 0, 1_000_001, 400),
        ("b", 0, 1_000_001, 400),
        ("c", 800_000, 1_000_001, 200),
    ]:
        groups += [g] * n
        pms += list(rng.randint(lo, hi, size=n))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(groups),
                "prob_micro": pa.array(np.array(pms, dtype=np.int64)),
            }
        )
    ).repartition(8)
    out = (
        grouped_psi(ds, group_col="src", prob_micro_col="prob_micro")
        .to_pandas()
        .set_index("src")
    )
    df = pd.DataFrame({"src": groups, "pm": pms})
    df["bin"] = np.minimum(df.pm * 10 // 1_000_000, 9)
    for g in ["a", "b", "c"]:
        cs = np.bincount(df[df.src == g]["bin"], minlength=10).astype(
            np.int64
        )
        cr = np.bincount(df[df.src != g]["bin"], minlength=10).astype(
            np.int64
        )
        p = (cs + 1) / (cs.sum() + 10.0)
        q = (cr + 1) / (cr.sum() + 10.0)
        nano = np.rint((p - q) * np.log(p / q) * 1e9).astype(np.int64)
        assert out.loc[g, "s_nano"] == int(nano.sum())
        assert out.loc[g, "n"] == cs.sum() and out.loc[g, "n_rest"] == cr.sum()
    assert out.loc["c", "psi"] > 5 * max(out.loc["a", "psi"], 1e-9)

    one = ray.data.from_arrow(
        pa.table(
            {
                "src": ["a", "a"],
                "prob_micro": pa.array([1, 2], type=pa.int64()),
            }
        )
    )
    assert grouped_psi(one, group_col="src").count() == 0


def test_kendall_tau_b_matches_bruteforce():
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.stats import kendall_tau_b

    rng = np.random.default_rng(11)
    x = rng.integers(0, 12, size=300)
    y = (x * 2 + rng.integers(0, 9, size=300)).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64())})
    )
    out = kendall_tau_b(ds).to_pylist()[0]

    C = D = tx = ty = 0
    n = len(x)
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = x[i] - x[j], y[i] - y[j]
            if dx == 0 and dy == 0:
                tx += 1
                ty += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                C += 1
            else:
                D += 1
    n0 = n * (n - 1) // 2
    assert out["concordant"] == C and out["discordant"] == D
    assert out["ties_x"] == tx and out["ties_y"] == ty
    exp = (C - D) / math.sqrt(float(n0 - tx) * float(n0 - ty))
    assert abs(out["tau_b"] - exp) < 1e-12
    assert out["tau_b"] > 0.5  # strong positive association by design

    # empty input returns the typed empty-moment row
    e = kendall_tau_b(
        ray.data.from_arrow(
            pa.table({"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64())})
        )
    ).to_pylist()[0]
    assert e["n"] == 0 and e["tau_b"] is None


def test_neyman_sample_caps_at_stratum_size(tmp_path):
    """When a stratum's Neyman allocation exceeds its population, the
    draw returns the whole stratum (rank filter caps at N_h) — the
    documented small-stratum behavior, identical in the SQL mirror."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as em

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts, sources = [], []
    # source 'big': 400 docs, varied lengths (high weight); 'tiny': 3 docs
    for i in range(400):
        texts.append(" ".join(rng.choice(vocab, size=rng.integers(20, 200))))
        sources.append("big")
    for i in range(3):
        texts.append(" ".join(rng.choice(vocab, size=50)))
        sources.append("tiny")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    alloc = {
        r["source"]: r["alloc"]
        for r in em.queries()["neyman_allocation"](str(tmp_path)).to_pylist()
    }
    assert sum(alloc.values()) == 1000  # largest-remainder exactness
    out = em.queries()["neyman_sample"](str(tmp_path)).take_all()
    got = {}
    for r in out:
        got[r["source"]] = got.get(r["source"], 0) + 1
    # each stratum draws min(alloc, N_h); the low-variance tiny stratum
    # may legitimately get 0 (Neyman weight ∝ N_h·S_h)
    assert got.get("tiny", 0) == min(alloc["tiny"], 3)
    assert got.get("big", 0) == min(alloc["big"], 400)
    # the headline case: big's allocation (≈1000) exceeds N_h=400, so
    # the draw caps at the whole stratum
    assert alloc["big"] > 400 and got["big"] == 400


def _lcs_ref(a, b):
    """O(nm) per-cell python LCS — the textbook reference the vectorized
    row DP must match."""
    n, m = len(a), len(b)
    L = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            L[i][j] = (
                L[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(L[i - 1][j], L[i][j - 1])
            )
    return L[n][m]


def test_lcs_len_matches_reference():
    import random

    from docling_api_ray.stages.editdist import lcs_len

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "e"]
    for _ in range(50):
        a = [rng.choice(vocab) for _ in range(rng.randrange(0, 30))]
        b = [rng.choice(vocab) for _ in range(rng.randrange(0, 30))]
        assert lcs_len(a, b) == _lcs_ref(a, b), (a, b)
    # degenerate shapes
    assert lcs_len([], ["x"]) == 0
    assert lcs_len(["x"], []) == 0
    assert lcs_len(["x", "y"], ["x", "y"]) == 2


def test_rouge_l_pairs_pinned():
    """rouge_l_pairs agrees pair-for-pair with the pure-python DP over a
    corpus with known shared prefixes."""
    import math

    from docling_api_ray.stages.editdist import rouge_l_pairs

    texts = [
        "shared prefix aaaaa one two three four five",
        "shared prefix aaaaa one two nine four five",
        "shared prefix aaaaa totally different words here",
        "another prefix bbbb alpha beta gamma",
        "another prefix bbbb alpha gamma beta",
        "unique prefix ccccc solo document",
    ]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        # a NULL text row must be tolerated (treated as empty), not crash
        + [{"doc_id": len(texts), "text": None}]
    )
    out = rouge_l_pairs(ds, prefix_len=16, cap_words=200).take_all()
    got = {(r["left_id"], r["right_id"]): (r["lcs"], r["rouge_f"]) for r in out}
    # blocks: {0,1,2} share a 16-char prefix, {3,4} share one, 5 alone
    assert set(got) == {(0, 1), (0, 2), (1, 2), (3, 4)}
    for (i, j), (lcs, f) in got.items():
        wa, wb = texts[i].split(), texts[j].split()
        ref = _lcs_ref(wa, wb)
        assert lcs == ref, (i, j)
        assert f == math.floor(2.0 * ref / (len(wa) + len(wb)) * 1e6 + 0.5) / 1e6
    # reordered pair (3,4): Jaccard-identical but ROUGE-L sees the order
    assert got[(3, 4)][0] == _lcs_ref(texts[3].split(), texts[4].split()) == 5


def test_isotonic_calibration_pools_violators():
    """The minimax fit must equal the classic sequential PAV pooling on
    a histogram engineered to violate monotonicity."""
    import math

    from docling_api_ray.stages.stats import isotonic_calibration

    # bins 0..3 get frac_pos 0.2, 0.8, 0.4, 0.6  → PAV pools bins 1-3
    # (0.8, 0.4, 0.6 with weights 10, 10, 10 → pooled 0.6)
    rows = []
    spec = [(50_000, 10, 2), (150_000, 10, 8), (250_000, 10, 4), (350_000, 10, 6)]
    for pm, n, npos in spec:
        rows += [{"prob_micro": pm, "pos": 1} for _ in range(npos)]
        rows += [{"prob_micro": pm, "pos": 0} for _ in range(n - npos)]
    ds = ray.data.from_items(rows)
    out = {
        r["bin"]: r
        for r in isotonic_calibration(ds, n_bins=10).take_all()
    }
    assert sorted(out) == [0, 1, 2, 3]
    # classic PAV: [0.2] stays; [0.8, 0.4, 0.6] pools to 0.6
    assert out[0]["iso_prob"] == 0.2
    for b in (1, 2, 3):
        assert out[b]["iso_prob"] == 0.6, out
    # raw frac_pos preserved for contrast
    assert out[1]["frac_pos"] == 0.8 and out[2]["frac_pos"] == 0.4
    # monotone by construction
    vals = [out[b]["iso_prob"] for b in sorted(out)]
    assert vals == sorted(vals)


def test_conformal_gate_order_stat_and_coverage():
    """Known calibration scores → known q = ⌈(n+1)(1−α)⌉-th order stat;
    coverage/accept counted against it exactly."""
    from docling_api_ray.stages.stats import conformal_gate

    rows = []
    # 9 positive calibration rows with s = 1e6 - pm in {10..90}
    for i, s in enumerate(range(10, 100, 10)):
        rows.append({"prob_micro": 1_000_000 - s, "pos": 1, "cal": 1})
    # negative cal rows must be ignored by the threshold fit
    rows.append({"prob_micro": 0, "pos": 0, "cal": 1})
    # test rows: two positives (s=50 covered, s=95 not), two negatives
    rows.append({"prob_micro": 1_000_000 - 50, "pos": 1, "cal": 0})
    rows.append({"prob_micro": 1_000_000 - 95, "pos": 1, "cal": 0})
    rows.append({"prob_micro": 1_000_000 - 10, "pos": 0, "cal": 0})
    rows.append({"prob_micro": 1_000_000 - 999, "pos": 0, "cal": 0})
    out = conformal_gate(
        ray.data.from_items(rows), alpha=0.1
    ).take_all()[0]
    # k = ceil(10 * 0.9) = 9 → q = 9th smallest of {10..90} = 90
    assert out["n_cal"] == 9 and out["q_micro"] == 90
    assert out["n_test"] == 4 and out["n_test_pos"] == 2
    assert out["coverage"] == 0.5      # s=50 ≤ 90, s=95 > 90
    assert out["accept_rate"] == 0.5   # s=50, s=10 pass; 95, 999 fail
    # alpha too strict for the sample → q saturates at the max score
    out2 = conformal_gate(
        ray.data.from_items(rows), alpha=0.01
    ).take_all()[0]
    assert out2["q_micro"] == 1_000_000


def test_weighted_quantiles_zero_weight_group():
    """A group whose weights are all zero yields NULL quantiles (the
    SQL window rule), not an IndexError."""
    from docling_api_ray.stages.stats import grouped_weighted_quantiles

    ds = ray.data.from_items(
        [
            {"source": "ok", "v": 10, "w": 2},
            {"source": "ok", "v": 20, "w": 2},
            {"source": "dead", "v": 5, "w": 0},
            {"source": "dead", "v": 7, "w": 0},
        ]
    )
    out = {
        r["source"]: r
        for r in grouped_weighted_quantiles(
            ds, group_col="source", value_col="v", weight_col="w",
            qs=(0.5,),
        ).take_all()
    }
    assert out["ok"]["wq50"] == 10
    assert out["dead"]["wq50"] is None
