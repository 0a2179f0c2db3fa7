"""Unit tests for the round-3 continuation operators: moving-window
average, vocabulary set coverage, weighted sampling, curriculum bins and
DSIR scoring (each also oracle-checked in test_queries_oracle — these
cover hand-built edge cases the synthetic corpus doesn't hit)."""

import datetime as dt

import numpy as np
import pyarrow as pa
import ray.data

from docling_api_ray.functions.hashing import u64_md5
from docling_api_ray.stages.dsir import dsir_scores
from docling_api_ray.stages.setops import vocab_source_coverage
from docling_api_ray.stages.splits import weighted_sample
from docling_api_ray.stages.stats import global_rank
from docling_api_ray.stages.windows import moving_window_avg


def _events(rows):
    """rows: (event_id, user_id, sec, value)."""
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "ts": pa.array(
                    [
                        dt.datetime(2024, 1, 1) + dt.timedelta(seconds=r[2])
                        for r in rows
                    ],
                    type=pa.timestamp("us"),
                ),
                "value": pa.array(
                    [float(r[3]) for r in rows], type=pa.float64()
                ),
            }
        )
    )


def test_moving_avg_frame_and_key_boundary():
    # user 1: values 1,2,3,4,5 -> trailing-4 sums 1,3,6,10,14
    # user 2: single event, frame must NOT leak across users
    rows = [(i, 1, i, i + 1) for i in range(5)] + [(10, 2, 0, 7.0)]
    out = {
        r["event_id"]: r
        for r in moving_window_avg(_events(rows)).take_all()
    }
    sums = [out[i]["win_sum_micro"] for i in range(5)]
    assert sums == [1_000_000, 3_000_000, 6_000_000, 10_000_000, 14_000_000]
    assert [out[i]["win_n"] for i in range(5)] == [1, 2, 3, 4, 4]
    assert out[4]["win_sum_micro"] == 14_000_000  # 2+3+4+5
    assert out[10]["win_n"] == 1 and out[10]["win_sum_micro"] == 7_000_000
    assert out[3]["moving_avg"] == 10_000_000 / (4 * 1e6)


def test_moving_avg_ts_tiebreak_by_event_id():
    # same user, same ts: frame order falls back to event_id
    rows = [(2, 1, 0, 5.0), (1, 1, 0, 3.0)]
    out = {
        r["event_id"]: r
        for r in moving_window_avg(_events(rows)).take_all()
    }
    assert out[1]["win_n"] == 1 and out[2]["win_n"] == 2
    assert out[2]["win_sum_micro"] == 8_000_000


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
                "source": pa.array([r[2] for r in rows], type=pa.string()),
            }
        )
    )


def test_vocab_coverage_threshold_and_occurrences():
    ds = _docs(
        [
            (1, "a b a", "s1"),
            (2, "a c", "s2"),
            (3, "b c", "s1"),
        ]
    )
    out = {
        r["word"]: r
        for r in vocab_source_coverage(ds, min_sources=2).take_all()
    }
    # a: s1+s2 (3 occurrences), c: s1+s2 (2); b only s1
    assert set(out) == {"a", "c"}
    assert out["a"]["n_sources"] == 2 and out["a"]["n_occurrences"] == 3
    assert out["c"]["n_occurrences"] == 2


def test_weighted_sample_matches_local_priority_order():
    n = 200
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(n)), type=pa.int64()),
            "n_chars": pa.array(
                [50 + (i * 37) % 400 for i in range(n)], type=pa.int64()
            ),
        }
    )
    got = weighted_sample(
        ray.data.from_arrow(tbl).repartition(8), k=10
    ).take_all()
    w = np.asarray(tbl["n_chars"], dtype=np.uint64)
    pri = (
        u64_md5(np.array([str(i) for i in range(n)], dtype=object))
        >> np.uint64(1)
    ) // w
    order = np.lexsort((np.arange(n), pri))[:10]
    assert [r["doc_id"] for r in got] == list(order)
    assert [r["priority"] for r in got] == [int(pri[i]) for i in order]


def test_weighted_sample_prefers_heavy_rows():
    # one row with overwhelming weight must (statistically) be picked:
    # weight 10^9 divides its priority to ~1e10 while unit weights stay
    # ~1e19 — deterministic given the fixed hash
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(50)), type=pa.int64()),
            "n_chars": pa.array(
                [10**9 if i == 7 else 2 for i in range(50)], type=pa.int64()
            ),
        }
    )
    got = weighted_sample(ray.data.from_arrow(tbl), k=5).take_all()
    assert got[0]["doc_id"] == 7


def test_curriculum_bins_partition_sizes():
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(100)), type=pa.int64()),
            "n_chars": pa.array(
                [(i * 13) % 50 for i in range(100)], type=pa.int64()
            ),
        }
    )
    out = global_rank(ray.data.from_arrow(tbl), bins=10).take_all()
    bins = [r["bin"] for r in out]
    assert len(out) == 100
    # equal-population deciles: exactly 10 rows per bin
    assert sorted(np.bincount(bins, minlength=10).tolist()) == [10] * 10
    by_rank = {r["doc_rank"]: r["bin"] for r in out}
    assert by_rank[1] == 0 and by_rank[100] == 9 and by_rank[51] == 5


def test_dsir_separates_target_distribution():
    # target sources use a disjoint vocabulary from raw ones — target
    # docs must score strictly higher
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "alpha beta gamma delta", "src0"))
        else:
            rows.append((i, "omega psi chi phi", "src9"))
    # trailing EMPTY docs exercise the segmented-sum empty-row path (a
    # clamped reduceat would corrupt the last non-empty doc's sum)
    rows.append((100, "", "src9"))
    rows.append((101, "", "src9"))
    out = dsir_scores(_docs(rows), target_sources=("src0",)).take_all()
    tgt = [r["avg_lr"] for r in out if r["doc_id"] < 100 and r["doc_id"] % 2 == 0]
    raw = [r["avg_lr"] for r in out if r["doc_id"] < 100 and r["doc_id"] % 2 == 1]
    assert min(tgt) > 0 > max(raw)
    assert all(r["n_words"] == 4 for r in out if r["doc_id"] < 100)
    empties = {r["doc_id"]: r for r in out if r["doc_id"] >= 100}
    assert all(
        r["n_words"] == 0 and r["lr_micro"] == 0 and r["avg_lr"] == 0.0
        for r in empties.values()
    )
    # the last NON-empty doc's integer sum must be intact (39 is raw,
    # same text as every raw doc -> same lr_micro as doc 1)
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[39]["lr_micro"] == by_id[1]["lr_micro"]


def test_inverted_postings_cap_and_df():
    from docling_api_ray.stages.postings import inverted_postings

    rows = [(i, "common x" if i % 2 == 0 else "rare y", "s") for i in range(20)]
    out = {
        r["word"]: r
        for r in inverted_postings(
            ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(
                            [r[0] for r in rows], type=pa.int64()
                        ),
                        "text": pa.array(
                            [r[1] for r in rows], type=pa.string()
                        ),
                    }
                )
            ).repartition(4),
            ["common", "rare"],
            cap=3,
        ).take_all()
    }
    assert out["common"]["df"] == 10  # exact df beyond the cap
    assert out["common"]["postings"] == "0,2,4"  # ascending, capped at 3
    assert out["rare"]["postings"] == "1,3,5"
    assert set(out) == {"common", "rare"}  # terms outside the set dropped


def test_mixture_weights_temperature_upweights_small_sources():
    from docling_api_ray.stages.mixture import mixture_weights

    rows = [(i, "w " * 99 + "w", "big") for i in range(9)] + [
        (100, "w " * 99 + "w", "small")
    ]
    out = {
        r["source"]: r
        for r in mixture_weights(_docs(rows).repartition(3)).take_all()
    }
    assert out["big"]["n_tokens"] == 900 and out["small"]["n_tokens"] == 100
    assert abs(out["big"]["share"] - 0.9) < 1e-12
    # alpha=0.5 temperature: weight ratio sqrt(9):1 = 3:1, far below the
    # 9:1 share ratio — small source up-weighted
    ratio = out["big"]["samp_weight"] / out["small"]["samp_weight"]
    assert 2.9 < ratio < 3.1
    assert abs(sum(r["samp_weight"] for r in out.values()) - 1.0) < 1e-9


def test_repetition_stats_counts():
    from docling_api_ray.stages.text_analysis import repetition_stats
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    "a b a b a",  # bigrams: ab,ba,ab,ba -> all duplicated
                    "x y z",  # bigrams: xy,yz -> none duplicated
                    "solo",  # no bigrams
                ],
                type=pa.string(),
            ),
        }
    )
    out = {
        r["doc_id"]: r
        for r in rd.from_arrow(tbl)
        .map_batches(repetition_stats, batch_format="pyarrow")
        .take_all()
    }
    assert out[1]["n_bigrams"] == 4 and out[1]["top2_n"] == 2
    assert out[1]["dup2_n"] == 4 and out[1]["dup2_frac"] == 1.0
    assert out[2]["n_bigrams"] == 2 and out[2]["dup2_n"] == 0
    assert out[2]["top2_frac"] == 0.5
    assert out[3]["n_bigrams"] == 0 and out[3]["top2_frac"] == 0.0


def test_zscore_moments_and_zero_variance():
    from docling_api_ray.stages.stats import grouped_zscore

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(6)), type=pa.int64()),
            "source": pa.array(["a"] * 4 + ["b"] * 2, type=pa.string()),
            "n_chars": pa.array([1, 2, 3, 4, 7, 7], type=pa.int64()),
        }
    )
    out = {
        r["doc_id"]: r
        for r in grouped_zscore(
            ray.data.from_arrow(tbl).repartition(3)
        ).take_all()
    }
    # group a: n=4 S=10 SS=30 -> var_n2 = 120-100 = 20
    # z(x) = (4x-10)/sqrt(20)
    for i, x in enumerate([1, 2, 3, 4]):
        assert abs(out[i]["z"] - (4 * x - 10) / np.sqrt(20)) < 1e-12
    # zero-variance group b -> z = 0
    assert out[4]["z"] == 0.0 and out[5]["z"] == 0.0


def test_filtered_knn_modes():
    from docling_api_ray.stages.similarity import filtered_knn, knn_bruteforce

    rng = np.random.RandomState(5)
    mat = rng.randn(60, 8)
    mat /= np.linalg.norm(mat, axis=1)[:, None]
    labels = [i % 3 for i in range(60)]
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(60)), type=pa.int64()),
            "embedding": pa.array(
                [r.astype("float32").tolist() for r in mat],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    qids, qmat, qlabs = [0, 1], mat[[0, 1]], [labels[0], labels[1]]
    ex = filtered_knn(ds, qids, qmat, qlabs, k=5, mode="exclude").take_all()
    ma = filtered_knn(ds, qids, qmat, qlabs, k=5, mode="match").take_all()
    for r in ex:
        assert labels[r["vec_id"]] != qlabs[qids.index(r["query_id"])]
        assert r["vec_id"] not in qids
    for r in ma:
        assert labels[r["vec_id"]] == qlabs[qids.index(r["query_id"])]
        assert r["vec_id"] not in qids
    assert len(ex) == 10 and len(ma) == 10  # 2 queries x top-5


def test_rolling_zscore_frame_moments():
    from docling_api_ray.stages.windows import rolling_zscore

    # user 1: values 1..5; frame 7-preceding covers all prior rows here
    rows = [(i, 1, i, i + 1) for i in range(5)] + [(10, 2, 0, 9.0)]
    out = {
        r["event_id"]: r for r in rolling_zscore(_events(rows)).take_all()
    }
    # first row of any user: frame size 1, zero variance -> z = 0
    assert out[0]["z"] == 0.0 and out[10]["z"] == 0.0
    # row 2 (value 3e6, frame [1e6,2e6,3e6]): n=3 S=6e6 SS=14e12
    # num = 3e6*3-6e6 = 3e6; var_n2 = 3*14e12-36e12 = 6e12
    assert abs(out[2]["z"] - 3e6 / np.sqrt(6e12)) < 1e-12
    assert out[2]["win_n"] == 3 and out[2]["win_sum_micro"] == 6_000_000


def test_ngram_backoff_seen_vs_unseen():
    from docling_api_ray.stages.ngramlm import ngram_backoff_scores

    # "a b" seen 8 times in docs 0..7; doc 8 = "a c": the (a,c) bigram is
    # unseen so its second token takes the alpha backoff branch and doc 8
    # must score strictly below a seen-bigram doc
    rows = [(i, "a b", "s") for i in range(8)] + [(8, "a c", "s")]
    out = {
        r["doc_id"]: r for r in ngram_backoff_scores(_docs(rows)).take_all()
    }
    assert all(r["n_tokens"] == 2 for r in out.values())
    assert out[8]["avg_lp"] < out[0]["avg_lp"]
    # all seen-bigram docs identical by symmetry
    assert len({out[i]["lp_micro"] for i in range(8)}) == 1


def test_mixture_select_quotas_and_determinism():
    from docling_api_ray.stages.mixture import mixture_select

    rows = [(i, "w " * 9 + "w", "big" if i < 30 else "small")
            for i in range(40)]
    out = mixture_select(_docs(rows).repartition(4), budget=10).take_all()
    from collections import Counter
    got = Counter(r["source"] for r in out)
    # weights: sqrt(0.75):sqrt(0.25) = 866025:500000 micro ->
    # quotas floor(10*866025/1366025)=6, floor(10*500000/1366025)=3
    assert got == {"big": 6, "small": 3}
    again = mixture_select(_docs(rows).repartition(7), budget=10).take_all()
    key = lambda r: (r["source"], r["doc_id"])
    assert sorted(again, key=key) == sorted(out, key=key)


def test_length_token_corr_perfect_and_degenerate(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from __ray_entry__ import _q_length_token_corr

    # linear source: n_chars = 10*tokens -> corr exactly 1.0
    # flat source: constant n_chars AND constant tokens -> 0 variance -> 0.0
    texts = ["w " * k + "w" for k in (1, 2, 3, 4)] + ["a b", "c d", "e f"]
    srcs = ["lin"] * 4 + ["flat"] * 3
    chars = [10 * (k + 1) for k in (1, 2, 3, 4)] + [7, 7, 7]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(7)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 7, pa.string()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array(chars, pa.int64()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    out = {r["source"]: r for r in
           _q_length_token_corr(str(tmp_path)).take_all()}
    assert out["lin"]["n"] == 4 and abs(out["lin"]["corr"] - 1.0) < 1e-12
    assert out["flat"]["n"] == 3 and out["flat"]["corr"] == 0.0


def test_interleave_order_weighted_stream_and_determinism():
    from docling_api_ray.stages.mixture import interleave_order

    rows = [(i, "w " * 9 + "w", "big" if i < 30 else "small")
            for i in range(40)]
    out = interleave_order(_docs(rows).repartition(4), budget=12).take_all()
    out.sort(key=lambda r: (r["pos_key"], r["source"], r["rnk"]))
    assert len(out) == 12
    # weights: sqrt(.75)=866025 vs sqrt(.25)=500000 micro -> the 12-row
    # prefix holds ceil-proportional counts (keys r*1e9//w):
    # big keys ~1154.7*r, small ~2000*r -> positions interleave ~1.73:1
    from collections import Counter
    got = Counter(r["source"] for r in out)
    assert got["big"] > got["small"] >= 3
    # ranks within each source are the contiguous prefix 1..k
    for s in ("big", "small"):
        rnks = sorted(r["rnk"] for r in out if r["source"] == s)
        assert rnks == list(range(1, len(rnks) + 1))
    # reshard-stable
    again = interleave_order(_docs(rows).repartition(7), budget=12).take_all()
    again.sort(key=lambda r: (r["pos_key"], r["source"], r["rnk"]))
    assert again == out


def test_chunk_overlap_boundaries(tmp_path):
    import pyarrow.parquet as pq

    from __ray_entry__ import _CHUNK_SIZE, _CHUNK_STRIDE, _q_chunk_overlap

    n_long = _CHUNK_SIZE + 10  # spills into a second, overlapping chunk
    texts = [
        "",  # 0 tokens -> no chunks
        "alpha beta",  # < size -> one short chunk
        " ".join(f"t{i}" for i in range(n_long)),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["s"] * 3, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    out = _q_chunk_overlap(str(tmp_path)).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc
    assert [(r["chunk_idx"], r["n_tokens"], r["chunk"]) for r in by_doc[2]] == [
        (0, 2, "alpha beta")
    ]
    chunks = sorted(by_doc[3], key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in chunks] == [0, 1]
    assert chunks[0]["n_tokens"] == _CHUNK_SIZE
    assert chunks[1]["n_tokens"] == n_long - _CHUNK_STRIDE
    # overlap: chunk 1 starts at token `stride`, inside chunk 0
    assert chunks[1]["chunk"].split()[0] == f"t{_CHUNK_STRIDE}"
    assert chunks[0]["chunk"].split()[-1] == f"t{_CHUNK_SIZE - 1}"


def test_leakage_safe_split_components_never_straddle():
    """Every member of a pair-connected component gets the SAME split;
    singleton docs behave like a per-doc component hash; ratios apply
    to the component-hash buckets."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.splits import leakage_safe_splits

    # synthetic keep table: components {1: [1,2,3], 7: [7,8]}, singletons 4,5
    keep = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 7, 8],
            "component": [1, 1, 1, 4, 5, 7, 7],
            "keep": [True, False, False, True, True, True, False],
        }
    )
    out = {
        r["doc_id"]: r
        for r in leakage_safe_splits(
            ray.data.from_arrow(keep).repartition(3)
        ).take_all()
    }
    assert len({out[d]["split"] for d in (1, 2, 3)}) == 1
    assert len({out[d]["bucket"] for d in (1, 2, 3)}) == 1
    assert out[7]["split"] == out[8]["split"]
    # singleton bucket equals the plain per-doc hash of its own id
    from docling_api_ray.functions.hashing import u64_md5

    # NB: int() BEFORE the mod — scalar np.uint64 % python-int detours
    # through float64 and corrupts the residue
    b4 = int(u64_md5(np.array(["4"], dtype=object))[0]) % 100
    assert out[4]["bucket"] == b4


def test_stratified_kfold_exact_balance_and_determinism():
    import collections

    import ray.data

    from docling_api_ray.stages.splits import stratified_kfold

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "lang"],
    )
    rows = stratified_kfold(docs.repartition(5), k=5).take_all()
    # exact balance: within every lang, fold sizes differ by <= 1
    per = collections.defaultdict(collections.Counter)
    for r in rows:
        per[r["lang"]][r["fold"]] += 1
    for lang, cnt in per.items():
        sizes = [cnt.get(f, 0) for f in range(5)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
    # deterministic under resharding
    rows2 = stratified_kfold(docs.repartition(2), k=5).take_all()
    a = {r["doc_id"]: r["fold"] for r in rows}
    b = {r["doc_id"]: r["fold"] for r in rows2}
    assert a == b
