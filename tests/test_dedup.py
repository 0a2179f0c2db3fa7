"""Dedup operator family on controlled corpora with known duplicates."""

import numpy as np
import pyarrow as pa
import ray.data

from docling_api_ray.stages.dedup import (
    MinHasher,
    SimHasher,
    embedding_neardup_pairs,
    exact_dedup,
    exact_dedup_rows,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a long tune about data pipelines and streaming execution engines"
)
NEAR = BASE.replace("lazy", "sleepy")  # 1-word change → high jaccard
FAR = "completely different content with no overlap whatsoever at all here now"


def _docs():
    texts = [BASE, BASE, NEAR, FAR, "short one", BASE + " extra tail words here"]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "source": ["s0"] * len(texts),
            }
        )
    )


def test_exact_dedup_first_wins():
    out = exact_dedup(_docs()).take_all()
    # 6 docs, one exact pair (0,1) → 5 survivors, min-id kept
    assert len(out) == 5
    kept = {r["doc_id"]: r["n_dups"] for r in out}
    assert 0 in kept and 1 not in kept
    assert kept[0] == 2 and all(v == 1 for k, v in kept.items() if k != 0)


def test_exact_dedup_rows_keeps_full_schema():
    out = exact_dedup_rows(_docs()).take_all()
    assert len(out) == 5
    assert {r["doc_id"] for r in out} == {0, 2, 3, 4, 5}
    assert all("text" in r and "source" in r for r in out)


def test_exact_dedup_rows_amplified_no_driver_set():
    # 8 copies of the sf0.001 corpus under distinct ids: every text
    # appears 8x; first-wins must keep exactly the offset-0 copy.  The
    # pipeline is one co-grouped exchange — no winner-id take_all.
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    base = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    copies = [
        base.set_column(
            0, "doc_id", pc.add(base["doc_id"], 1_000_000 * i)
        )
        for i in range(8)
    ]
    ds = ray.data.from_arrow(pa.concat_tables(copies))
    out = exact_dedup_rows(ds).take_all()
    assert len(out) == base.num_rows
    assert max(r["doc_id"] for r in out) < 1_000_000  # offset-0 winners


def test_minhash_signature_properties():
    mh = MinHasher()
    s1 = mh.signature(BASE)
    s2 = mh.signature(BASE)
    s3 = mh.signature(NEAR)
    s4 = mh.signature(FAR)
    assert (s1 == s2).all()
    # near-dup agrees on most components, far-dup on almost none
    assert (s1 == s3).mean() > 0.5
    assert (s1 == s4).mean() < 0.2


def test_minhash_lsh_pairs():
    # NEAR's true shingle jaccard vs BASE is 0.75 (1 word changed = 3 of
    # 24 union shingles); the 64-perm estimate has sd ~0.054, so the
    # catch threshold must sit ≥2 sd below 0.75
    pairs = {
        (r["left_id"], r["right_id"])
        for r in minhash_lsh_pairs(_docs(), threshold=0.6).take_all()
    }
    assert (0, 1) in pairs  # exact dup always caught
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup caught
    assert not any(3 in p for p in pairs)  # FAR never pairs


def test_simhash_pairs():
    out = simhash_pairs(_docs()).take_all()
    pairs = {(r["left_id"], r["right_id"]): r["hamming"] for r in out}
    assert pairs.get((0, 1)) == 0
    assert not any(3 in p for p in pairs)


def test_dedup_pairs_cogrouped_fallback(monkeypatch):
    # Adversarial many-duplicates corpus (VERDICT r2 #6): every doc has
    # ≥1 near-dup — 40 distinct texts × 20 exact copies each.  MinHash
    # carries the census-derived pair bound (40·C(20,2)·bands ≫ 0), so
    # forcing the single-block threshold to 0 flips it onto the
    # co-grouped fold path (no single mega-block); both paths must
    # produce exactly the same deduped pair set.  SimHash has no bound
    # and always takes the co-grouped path — its result must agree on
    # the exact-duplicate pairs too.
    import docling_api_ray.stages.dedup as dd

    texts, ids = [], []
    for t in range(40):
        body = f"unique text body number {t} " + " ".join(
            f"w{t}x{j}" for j in range(30)
        )
        for c in range(20):
            ids.append(t * 100 + c)
            texts.append(body)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))

    def run_minhash():
        return {
            (r["left_id"], r["right_id"], r["est_jaccard"])
            for r in minhash_lsh_pairs(ds, threshold=0.9).take_all()
        }

    single = run_minhash()
    monkeypatch.setattr(dd, "_PAIR_FOLD_SINGLE_BLOCK_MAX", 0)
    cogrouped = run_minhash()
    # every doc duplicated 20x → 40 * C(20,2) = 7600 exact pairs minimum
    assert len(single) >= 7600
    assert cogrouped == single

    sim = {
        (r["left_id"], r["right_id"])
        for r in simhash_pairs(ds).take_all()
        if r["hamming"] == 0
    }
    assert len(sim) >= 7600


def _alldup_corpus():
    # adversarial amplified all-dup corpus (VERDICT r3 #1/#2): EVERY doc
    # has ≥1 near-dup — 40 distinct texts × 20 exact copies each, so the
    # hot-bucket census and the component table are both corpus-scale
    texts, ids = [], []
    for t in range(40):
        body = f"unique text body number {t} " + " ".join(
            f"w{t}x{j}" for j in range(30)
        )
        for c in range(20):
            ids.append(t * 100 + c)
            texts.append(body)
    return ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))


def test_hot_bucket_bloom_fallback(monkeypatch):
    # force the census over the broadcast guard: the Bloom-bitmap filter
    # must admit every genuinely hot bucket (no false negatives by
    # construction) and produce EXACTLY the same verified pair set —
    # false positives only re-admit singleton rows the pair kernel drops
    import docling_api_ray.stages.dedup as dd

    ds = _alldup_corpus()

    def run():
        return {
            (r["left_id"], r["right_id"], r["est_jaccard"])
            for r in minhash_lsh_pairs(ds, threshold=0.9).take_all()
        }

    broadcast = run()
    monkeypatch.setattr(dd, "_HOT_CENSUS_BROADCAST_MAX", 0)
    bloom = run()
    assert len(broadcast) >= 7600  # 40 · C(20,2) exact pairs minimum
    assert bloom == broadcast


def test_hot_bucket_bloom_positions_in_range():
    from docling_api_ray.stages.dedup import (
        _HOT_BLOOM_K,
        _hot_bloom_positions,
    )

    keys = np.array([0, 1, 2**18, -1, 2**62, 17], dtype=np.int64)
    for m in (1 << 17, 1 << 24, 1 << 30):
        pos = _hot_bloom_positions(keys, m)
        assert pos.shape == (len(keys), _HOT_BLOOM_K)
        assert pos.min() >= 0 and pos.max() < m
    # low-entropy keys (simhash-band shape) still spread: all rows distinct
    low = np.arange(64, dtype=np.int64)
    pos = _hot_bloom_positions(low, 1 << 17)
    assert len({tuple(r) for r in pos}) == len(low)


def test_dedup_keep_cogrouped_fallback(monkeypatch):
    # force the component table over the broadcast guard: the co-grouped
    # attach must match the broadcast path row-for-row on a corpus where
    # every doc belongs to a 20-member component
    import docling_api_ray.stages.dedup as dd
    from docling_api_ray.stages.dedup import dedup_keep

    ds = _alldup_corpus()
    pairs = minhash_lsh_pairs(ds, threshold=0.9).materialize()

    def run():
        return sorted(
            (r["doc_id"], r["component"], r["keep"])
            for r in dedup_keep(ds, pairs).take_all()
        )

    broadcast = run()
    monkeypatch.setattr(dd, "_COMPONENT_BROADCAST_MAX", 0)
    cogrouped = run()
    assert cogrouped == broadcast
    assert len(broadcast) == 800
    # exactly one keeper per 20-member component, and it is the min id
    keeps = [d for d, _, k in broadcast if k]
    assert keeps == [t * 100 for t in range(40)]


def test_incremental_minhash_bloom_fallback(monkeypatch):
    # the append path rides the same hot-bucket filter: forcing the Bloom
    # fallback must not change which incoming docs survive
    import docling_api_ray.stages.dedup as dd
    from docling_api_ray.stages.incremental import incremental_minhash_keep

    ds = _alldup_corpus()

    def half(lo: bool):
        def fn(b: pa.Table) -> pa.Table:
            c = np.asarray(b["doc_id"], dtype=np.int64) % 100
            return b.filter(pa.array(c < 10 if lo else c >= 10))

        return fn

    old = ds.map_batches(half(True), batch_format="pyarrow")
    new = ds.map_batches(half(False), batch_format="pyarrow")

    def run():
        return sorted(
            r["doc_id"]
            for r in incremental_minhash_keep(old, new, threshold=0.9)
            .take_all()
        )

    broadcast = run()
    monkeypatch.setattr(dd, "_HOT_CENSUS_BROADCAST_MAX", 0)
    bloom = run()
    assert bloom == broadcast
    assert broadcast == []  # every incoming doc duplicates history


def test_connected_components_chain():
    # a 6-node chain (diameter 5 — forces multiple propagation rounds),
    # a triangle, and an isolated edge
    from docling_api_ray.stages.dedup import connected_components

    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15),
             (20, 21), (21, 22), (20, 22),
             (30, 31)]
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "left_id": [e[0] for e in edges],
                "right_id": [e[1] for e in edges],
            }
        )
    )
    out = {r["node"]: r["component"]
           for r in connected_components(pairs).take_all()}
    assert out == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_connected_components_empty():
    from docling_api_ray.stages.dedup import connected_components

    pairs = ray.data.from_arrow(
        pa.table({"left_id": pa.array([], type=pa.int64()),
                  "right_id": pa.array([], type=pa.int64())})
    )
    assert connected_components(pairs).take_all() == []


def test_dedup_keep_first_wins():
    from docling_api_ray.stages.dedup import dedup_keep

    docs = _docs()  # ids 0..5; docs 0,1 exact dups; 2 near-dups them
    pairs = ray.data.from_arrow(
        pa.table({"left_id": [0, 0], "right_id": [1, 2]})
    )
    rows = {r["doc_id"]: r for r in dedup_keep(docs, pairs).take_all()}
    assert len(rows) == 6
    assert [rows[i]["component"] for i in range(6)] == [0, 0, 0, 3, 4, 5]
    assert [rows[i]["keep"] for i in range(6)] == [
        True, False, False, True, True, True
    ]


def test_simhash_deterministic():
    t = pa.table({"doc_id": [1], "text": [BASE]})
    a = SimHasher()(t)["simhash"][0].as_py()
    b = SimHasher()(t)["simhash"][0].as_py()
    assert a == b


def test_ngram_jaccard_pairs():
    out = ngram_jaccard_pairs(_docs(), threshold=0.5).take_all()
    pairs = {(r["left_id"], r["right_id"]): r["jaccard"] for r in out}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] > 0.8
    assert not any(3 in p for p in pairs)


def test_embedding_neardup():
    rng = np.random.RandomState(7)
    base = rng.randn(8)
    vecs = [base, base + 0.001 * rng.randn(8), rng.randn(8), -base]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": [0, 1, 2, 3],
                "embedding": pa.array(
                    [v.astype("float32").tolist() for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
                "label": [0, 0, 0, 0],
            }
        )
    )
    out = embedding_neardup_pairs(ds, threshold=0.99).take_all()
    pairs = {(r["left_id"], r["right_id"]) for r in out}
    assert pairs == {(0, 1)}


def test_contamination_counts_planted_overlap():
    from docling_api_ray.stages.dedup import contamination_counts

    bench = ["alpha beta gamma delta epsilon"]
    corpus = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "alpha beta gamma delta epsilon",      # fully contaminated
                "alpha beta gamma unrelated words",    # 1 of 3 shingles hit
                "totally different content here now",  # clean
            ],
        }
    )
    out = {
        r["doc_id"]: r
        for r in contamination_counts(
            ray.data.from_arrow(corpus), bench
        ).take_all()
    }
    assert out[0]["n_contaminated"] == out[0]["n_shingles"] == 3
    assert out[0]["contamination_ratio"] == 1.0
    assert out[1]["n_shingles"] == 3 and out[1]["n_contaminated"] == 1
    assert out[2]["n_contaminated"] == 0 and out[2]["contamination_ratio"] == 0.0


def test_connected_components_nonconvergence_raises():
    from docling_api_ray.stages.dedup import connected_components

    # a 12-node chain has diameter 11 — with max_iters=3 propagation
    # cannot complete and must fail loudly, never mislabel silently
    import pytest

    edges = [(i, i + 1) for i in range(11)]
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "left_id": [e[0] for e in edges],
                "right_id": [e[1] for e in edges],
            }
        )
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=3)
    # and with enough rounds the same chain labels completely
    out = {r["node"]: r["component"]
           for r in connected_components(pairs).take_all()}
    assert set(out.values()) == {0}


def test_paragraph_dedup_boilerplate_removal(ray_session):
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.dedup import paragraph_dedup

    boiler = "nav home about contact terms privacy legal footer"  # 8 words
    docs = [
        (0, boiler + " alpha beta gamma delta one two three four"),
        (1, boiler + " epsilon zeta eta theta five six seven eight"),
        (2, boiler),  # nothing but boilerplate
        (3, "unique words only in this very document right here"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [d for d, _ in docs],
                "text": [t for _, t in docs],
            }
        )
    )
    rows = {r["doc_id"]: r for r in paragraph_dedup(ds).take_all()}
    assert rows[0]["n_paras"] == 2 and rows[0]["n_kept"] == 2  # first wins
    assert rows[0]["clean_text"].startswith(boiler)
    # doc 1 loses the boilerplate paragraph but keeps its own content
    assert rows[1]["n_paras"] == 2 and rows[1]["n_kept"] == 1
    assert rows[1]["clean_text"] == "epsilon zeta eta theta five six seven eight"
    # doc 2 is pure boilerplate → everything deduped away
    assert rows[2]["n_kept"] == 0 and rows[2]["clean_text"] == ""
    # doc 3: 9 words → an 8-word paragraph + a ragged 1-word tail, both kept
    assert rows[3]["n_paras"] == 2 and rows[3]["n_kept"] == 2


def test_dup_ngram_coverage_counts_cross_doc_shared_positions():
    from docling_api_ray.stages.dedup import dup_ngram_coverage

    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "a b c d",        # grams: abc bcd
                "x a b c",        # grams: xab abc  -> shares abc with 1
                "q r",            # short doc: single 2-word gram
                "q r",            # identical short doc -> shared
                "",               # empty: no grams
            ],
        }
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["dup_grams"])
        for r in dup_ngram_coverage(ray.data.from_arrow(docs)).take_all()
    }
    assert out == {
        1: (2, 1),   # abc shared with doc 2
        2: (2, 1),
        3: (1, 1),   # 'q r' gram shared with doc 4
        4: (1, 1),
        5: (0, 0),
    }


def test_dup_ngram_coverage_multiplicity_counts_positions():
    from docling_api_ray.stages.dedup import dup_ngram_coverage

    # doc 1 repeats the shared trigram twice (positions counted, not
    # distinct grams); doc 2 has it once
    docs = pa.table(
        {
            "doc_id": [1, 2],
            "text": ["a b c a b c", "z a b c"],  # doc1: abc bca cab abc
        }
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["dup_grams"])
        for r in dup_ngram_coverage(ray.data.from_arrow(docs)).take_all()
    }
    assert out == {1: (4, 2), 2: (2, 1)}


def test_source_minhash_similarity_identical_and_disjoint():
    import ray.data

    from docling_api_ray.stages.dedup import source_minhash_similarity

    rows = {
        "doc_id": list(range(8)),
        "source": ["A", "A", "B", "B", "C", "C", "D", "D"],
        "text": [
            "alpha beta gamma delta", "epsilon zeta eta theta",
            # B = exactly A's shingle set (same two texts)
            "alpha beta gamma delta", "epsilon zeta eta theta",
            # C disjoint vocabulary
            "one two three four", "five six seven eight",
            # D: only empty docs -> no shingles -> excluded entirely
            "", "",
        ],
    }
    out = source_minhash_similarity(
        ray.data.from_arrow(pa.table(rows)).repartition(3)
    )
    got = {(r["left_source"], r["right_source"]): r["est_jaccard"]
           for r in out.to_pylist()}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert got[("A", "B")] == 1.0
    assert got[("A", "C")] < 0.5 and got[("B", "C")] < 0.5


def test_ngram_containment_subset_detection():
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.dedup import ngram_containment_pairs

    # doc 1 is fully contained in doc 2 (containment 1.0, jaccard only
    # 3/7); doc 3 shares nothing; doc 4 is in another block; doc 5 has a
    # single word (empty shingle set -> never pairs)
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "a b c d",
                    "x y a b c d z w",
                    "p q r s",
                    "a b c d",
                    "lonely",
                ],
                pa.string(),
            ),
            "source": pa.array(["s1", "s1", "s1", "s2", "s1"], pa.string()),
        }
    )
    out = sorted(
        ngram_containment_pairs(
            ray.data.from_arrow(docs), block_col="source", n=2, threshold=0.9
        ).take_all(),
        key=lambda r: (r["left_id"], r["right_id"]),
    )
    assert out == [{"left_id": 1, "right_id": 2, "containment": 1.0}]


def test_dup_span_strip_removes_shared_spans_both_paths():
    """Words covered by a multi-doc shingle vanish from EVERY copy;
    unique content survives; short docs follow shingle_hashes semantics
    (their single shingle covers the whole doc).  The broadcast attach
    and the forced co-grouped attach (broadcast_max=0) must agree."""
    import pandas as pd

    from docling_api_ray.stages.dedup import dup_span_strip

    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "the quick brown fox jumps",
                "the quick brown cat sits here",
                "",
                "solo",
                "two words",
                "two words",
                "alpha beta gamma delta",
                "xx yy",
            ],
        }
    )
    outs = []
    for bm in (None, 0):
        ds = ray.data.from_pandas(docs).repartition(4)
        out = (
            dup_span_strip(ds, broadcast_max=bm)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    a, b = outs
    assert a.equals(b), "broadcast and co-grouped attach diverge"
    got = dict(zip(a["doc_id"], a["kept_text"]))
    # "the quick brown" is shared between docs 0 and 1 -> covers words
    # 0..2 in both; the tails survive
    assert got[0] == "fox jumps"
    assert got[1] == "cat sits here"
    assert got[2] == "" and got[3] == "solo"
    # exact short dups: the whole-doc shingle is shared -> fully stripped
    assert got[4] == "" and got[5] == ""
    assert got[6] == "alpha beta gamma delta"
    assert got[7] == "xx yy"
    assert dict(zip(a["doc_id"], a["n_removed"]))[0] == 3
    assert dict(zip(a["doc_id"], a["n_words"]))[2] == 0


def test_dup_span_strip_overlapping_spans_counted_once():
    """Overlapping shared shingles must not double-remove: covered
    positions are a SET per doc."""
    import pandas as pd

    from docling_api_ray.stages.dedup import dup_span_strip

    shared = "one two three four five"  # 3 overlapping shared shingles
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [shared + " tailA unique", shared + " tailB other"],
        }
    )
    out = (
        dup_span_strip(ray.data.from_pandas(docs).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["kept_text"]) == ["tailA unique", "tailB other"]
    assert list(out["n_removed"]) == [5, 5]
    assert list(out["n_words"]) == [7, 7]


def test_dup_span_keep_first_winner_retains_span():
    """keep_first=True: the lexicographic-min (doc_id, pos) occurrence
    of each shared shingle survives; later copies strip."""
    import pandas as pd

    from docling_api_ray.stages.dedup import dup_span_strip

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "one two three tailA",   # winner of "one two three"
                "one two three tailB",   # loser -> words 0..2 strip
                "fresh unique content here",
            ],
        }
    )
    out = (
        dup_span_strip(
            ray.data.from_pandas(docs).repartition(3), keep_first=True
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = dict(zip(out["doc_id"], out["kept_text"]))
    assert got[0] == "one two three tailA"
    assert got[1] == "tailB"
    assert got[2] == "fresh unique content here"
    assert list(out["n_removed"]) == [0, 3, 0]


def _brute_jaccard_pairs(ids, texts, threshold):
    """All-pairs set Jaccard over string_split(text, ' ') tokens — the
    reference semantics prefix_filter_pairs claims to match exactly."""
    sets = {i: set(t.split(" ")) if t else set() for i, t in zip(ids, texts)}
    out = {}
    ks = sorted(sets)
    for ai in range(len(ks)):
        for bi in range(ai + 1, len(ks)):
            a, b = ks[ai], ks[bi]
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            j = inter / union
            if j >= threshold:
                out[(a, b)] = round(j, 6)
    return out


def test_prefix_filter_pairs_planted():
    from docling_api_ray.stages.dedup import prefix_filter_pairs

    out = prefix_filter_pairs(_docs(), threshold=0.8).take_all()
    pairs = {(r["left_id"], r["right_id"]): r["jaccard"] for r in out}
    assert pairs[(0, 1)] == 1.0          # exact dup
    assert pairs.get((0, 2), 0) >= 0.8   # 1-word swap near-dup
    assert not any(3 in p for p in pairs)  # FAR doc matches nothing


def test_prefix_filter_pairs_exact_vs_bruteforce():
    """Prefix filtering is EXACT: every qualifying pair — including the
    boundary min_len*5 == max_len*4 case a float length filter would
    drop — must appear, with the exact Jaccard, and nothing else."""
    from docling_api_ray.stages.dedup import prefix_filter_pairs

    rng = np.random.RandomState(11)
    vocab = [f"w{i:03d}" for i in range(120)]
    ids, texts = [], []
    # clique of 6 near-dups around one 20-word base (heavy overlap)
    base = [vocab[i] for i in rng.choice(120, 20, replace=False)]
    for i in range(6):
        ws = list(base)
        if i:  # swap one word -> jaccard 19/21 ~ 0.905
            ws[i] = vocab[100 + i]
        ids.append(i)
        texts.append(" ".join(ws))
    # boundary pair: |A|=4, A subset of B, |B|=5 -> jaccard exactly 4/5
    ids += [50, 51]
    texts += ["a b c d", "a b c d e"]
    # random background docs, mostly below threshold
    for i in range(60, 100):
        n = rng.randint(5, 25)
        ids.append(i)
        texts.append(" ".join(vocab[j] for j in rng.choice(120, n, replace=False)))
    # empties and repeated-word docs (distinct-set semantics)
    ids += [200, 201, 202]
    texts += ["", "dup dup dup dup", "dup x"]

    expected = _brute_jaccard_pairs(ids, texts, 0.8)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": texts})
    ).repartition(5)
    got = {
        (r["left_id"], r["right_id"]): r["jaccard"]
        for r in prefix_filter_pairs(ds, threshold=0.8).take_all()
    }
    assert (50, 51) in expected and expected[(50, 51)] == 0.8  # boundary planted
    assert got == expected


def test_prefix_filter_pairs_tiny_head():
    """top_f smaller than the vocabulary: the frequency-banded order
    stays a consistent total order, so the result is still exact."""
    from docling_api_ray.stages.dedup import prefix_filter_pairs

    ids = list(range(8))
    texts = [
        "alpha beta gamma delta",
        "alpha beta gamma delta",
        "alpha beta gamma epsilon",
        "zeta eta theta iota kappa",
        "zeta eta theta iota kappa lamda",
        "solo words here only once",
        "alpha zeta solo mix four",
        "",
    ]
    expected = _brute_jaccard_pairs(ids, texts, 0.7)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = {
        (r["left_id"], r["right_id"]): r["jaccard"]
        for r in prefix_filter_pairs(ds, threshold=0.7, top_f=3).take_all()
    }
    assert got == expected


def test_source_overlap_exact_shingle_matrix():
    """Known shared 3-shingles across sources; a shingle shared by 3
    sources counts once for each of the 3 pairs; within-source repeats
    never inflate counts; result is partition-count independent."""
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.dedup import source_overlap

    rows = [
        # "x y z" appears in a, b, c -> 3 pair hits
        ("a", "x y z tail one"),
        ("b", "x y z other words"),
        ("c", "pre x y z"),
        # "p q r" in a (twice!) and b only -> 1 hit for (a,b)
        ("a", "p q r p q r"),
        ("b", "p q r"),
        # unique text -> no hits
        ("c", "totally unique phrasing here"),
    ]
    tbl = pa.table(
        {
            "doc_id": list(range(len(rows))),
            "source": [r[0] for r in rows],
            "text": [r[1] for r in rows],
        }
    )

    def counts(parts):
        out = source_overlap(
            ray.data.from_arrow(tbl).repartition(parts)
        ).take_all()
        return {(r["src_a"], r["src_b"]): r["n"] for r in out}

    got = counts(3)
    # exact expectation from a python reference over distinct shingles
    from docling_api_ray.functions.hashing import batch_word_hashes, shingle_hashes

    per_src: dict = {}
    for src, text in rows:
        wh, off = batch_word_hashes([text])
        per_src.setdefault(src, set()).update(
            shingle_hashes(wh[off[0]: off[1]]).tolist()
        )
    expect = {}
    for a in sorted(per_src):
        for b in sorted(per_src):
            if a < b:
                n = len(per_src[a] & per_src[b])
                if n:
                    expect[(a, b)] = n
    assert got == expect
    assert got[("a", "b")] >= 2  # "x y z" + "p q r" at least
    assert counts(1) == counts(5) == got


def test_source_unique_share_counts():
    """Controlled shingle sets: shared shingles are not unique; each
    source's distinct total counts each shingle once however often it
    repeats within the source; partition independent."""
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.dedup import source_unique_share

    rows = [
        ("a", "x y z"),          # shingle xyz shared with b
        ("a", "u v w extra"),    # uvw + vw-extra unique to a
        ("a", "u v w extra"),    # exact repeat: no new distinct shingles
        ("b", "x y z"),
        ("b", "only b phrase"),
    ]
    tbl = pa.table(
        {
            "doc_id": list(range(len(rows))),
            "source": [r[0] for r in rows],
            "text": [r[1] for r in rows],
        }
    )
    for parts in (1, 4):
        out = {
            r["source"]: (r["n_unique"], r["n_distinct"], r["unique_share"])
            for r in source_unique_share(
                ray.data.from_arrow(tbl).repartition(parts)
            ).take_all()
        }
        # a: shingles {xyz, uvw, vw-extra} -> 2 unique of 3
        # b: shingles {xyz, only-b-phrase} -> 1 unique of 2
        import math

        assert out["a"][:2] == (2, 3), parts
        assert out["a"][2] == math.floor(2 / 3 * 1e6 + 0.5) / 1e6
        assert out["b"] == (1, 2, 0.5), parts


def test_prefix_filter_shingle_basis_matches_bruteforce():
    """basis='shingle3' must produce exactly the brute-force pairs with
    distinct-3-shingle-set Jaccard >= t — the ground-truth tier for the
    MinHash eval must itself be exact on the sketch's own basis."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.functions.hashing import (
        batch_word_hashes,
        shingle_hashes,
    )
    from docling_api_ray.stages.dedup import prefix_filter_pairs

    rng = np.random.RandomState(31)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    base = [vocab[i] for i in rng.randint(0, 40, size=30)]
    for i in range(60):
        words = list(base)
        # perturb a random suffix so shingle overlap varies smoothly
        k = int(rng.randint(0, 12))
        for j in range(k):
            words[-(j + 1)] = vocab[int(rng.randint(0, 40))]
        texts.append(" ".join(words))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(60, dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
    ).repartition(8)
    t = 0.7
    got = {
        (r["left_id"], r["right_id"]): r["jaccard"]
        for r in prefix_filter_pairs(ds, threshold=t, basis="shingle3")
        .take_all()
    }

    wh, off = batch_word_hashes(texts)
    sets = [
        set(shingle_hashes(wh[off[i] : off[i + 1]]).tolist())
        for i in range(len(texts))
    ]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            jac = inter / union if union else 0.0
            if jac >= t:
                want[(i, j)] = round(jac, 6)
    assert got == want
    assert len(want) > 0  # corpus must actually produce pairs


def test_lsh_pair_eval_consistency():
    """lsh_pair_eval's counters must equal the set arithmetic over its
    own two tiers' outputs, on a borderline corpus where the sketch is
    imperfect (est error straddles the threshold)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.dedup import (
        lsh_pair_eval,
        minhash_lsh_pairs,
        prefix_filter_pairs,
    )

    rng = np.random.RandomState(37)
    vocab = [f"w{i}" for i in range(50)]
    base = [vocab[i] for i in rng.randint(0, 50, size=40)]
    texts = []
    for i in range(80):
        words = list(base)
        k = int(rng.randint(4, 14))  # jaccard hovers around the threshold
        for j in range(k):
            words[-(j + 1)] = vocab[int(rng.randint(0, 50))]
        texts.append(" ".join(words))
    mk = lambda: ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(80, dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
    ).repartition(8)
    t = 0.7
    out = lsh_pair_eval(mk(), threshold=t).to_pydict()
    cand = {
        (r["left_id"], r["right_id"])
        for r in minhash_lsh_pairs(mk(), threshold=t).take_all()
    }
    truth = {
        (r["left_id"], r["right_id"])
        for r in prefix_filter_pairs(
            mk(), threshold=t, basis="shingle3"
        ).take_all()
    }
    assert out["n_candidates"] == [len(cand)]
    assert out["n_true"] == [len(truth)]
    assert out["n_hit"] == [len(cand & truth)]
    if cand:
        assert out["precision"] == [len(cand & truth) / len(cand)]
    if truth:
        assert out["recall"] == [len(cand & truth) / len(truth)]
    # the borderline corpus must exercise disagreement in at least one
    # direction, or the eval test is vacuous
    assert cand != truth


def test_distinct_ngram_stats_matches_python_sets():
    """distinct_ngram_stats must equal literal python n-gram sets /
    counts over the raw word sequences, including short docs (0/1/2
    words), duplicate-heavy text and cross-partition dedup."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.dedup import distinct_ngram_stats

    rng = np.random.RandomState(47)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> dup n-grams
    texts = ["", "solo", "two words"]
    for _ in range(200):
        k = int(rng.randint(0, 25))
        texts.append(" ".join(vocab[int(rng.randint(0, 12))] for _ in range(k)))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    np.arange(len(texts), dtype=np.int64)
                ),
                "text": pa.array(texts),
            }
        )
    ).repartition(16)
    out = distinct_ngram_stats(ds).to_pydict()

    for i, n in enumerate((1, 2, 3)):
        total = 0
        seen = set()
        for t in texts:
            ws = t.split(" ") if t else []
            grams = [tuple(ws[j : j + n]) for j in range(len(ws) - n + 1)]
            total += len(grams)
            seen.update(grams)
        assert out["total_ngrams"][i] == total, n
        assert out["distinct_ngrams"][i] == len(seen), n
        assert out["distinct_ratio"][i] == len(seen) / total


def test_winnow_pairs_detects_copies_and_caps_buckets():
    from docling_api_ray.stages.dedup import winnow_pairs
    from docling_api_ray.stages.text_analysis import winnow_selected

    ds = _docs()
    out = winnow_pairs(ds, threshold=0.5).take_all()
    got = {(r["left_id"], r["right_id"]): r for r in out}
    # exact copies share every fingerprint: containment 1.0
    assert got[(0, 1)]["containment"] == 1.0
    # near-dup (one word changed) still above threshold
    assert (0, 2) in got and got[(0, 2)]["containment"] >= 0.5
    # disjoint doc never pairs
    assert not any(3 in k for k in got)
    # shared counts are bounded by the smaller fingerprint set
    for (l, r), row in got.items():
        assert 0 < row["shared"]
        assert row["containment"] <= 1.0

    # forcing max_bucket below the copy-cluster size drops those buckets:
    # hashes selected by all of docs 0/1/2/5 sit in buckets of size >= 3
    capped = winnow_pairs(ds, threshold=0.5, max_bucket=1).take_all()
    assert capped == []

    # python reference cross-check of one pair's shared count
    texts = [BASE, NEAR]
    sd, sh, _ = winnow_selected(texts)
    a = set(sh[sd == 0].tolist())
    b = set(sh[sd == 1].tolist())
    exp = len(a & b) / min(len(a), len(b))
    assert abs(got[(0, 2)]["containment"] - exp) < 1e-12


def test_cdc_chunk_stats_shift_stable_and_exact():
    from docling_api_ray.stages.dedup import cdc_chunk_stats

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    base = " ".join(rng.choice(vocab, size=300))

    def stats(texts):
        ds = ray.data.from_arrow(
            pa.table({"doc_id": list(range(len(texts))), "text": texts})
        )
        return cdc_chunk_stats(ds).to_pylist()[0]

    # exact duplicate corpus: every chunk repeats -> dedup_ratio 0.5
    s = stats([base, base])
    assert s["total_chunks"] == 2 * stats([base])["total_chunks"]
    assert s["dedup_ratio"] == 0.5
    assert s["total_words"] == 600

    # content-defined shift stability: prepending words re-chunks only
    # a bounded prefix, so most chunk hashes are SHARED with the
    # original (fixed-offset chunking would share none)
    shifted = "zzz yyy " + base
    both = stats([base, shifted])
    solo_b, solo_s = stats([base]), stats([shifted])
    shared = (
        solo_b["distinct_chunks"]
        + solo_s["distinct_chunks"]
        - both["distinct_chunks"]
    )
    assert shared >= 0.8 * solo_b["distinct_chunks"]

    # empty corpus: zero totals, NULL ratios
    e = stats(["", ""])
    assert e["total_chunks"] == 0 and e["dedup_ratio"] is None


def test_boilerplate_strip_drops_all_occurrences():
    """The CCNet df rule must remove a > max_df_frac header from EVERY
    document — including its first occurrence (the semantics that
    distinguish it from paragraph_dedup) — and keep unique content."""
    from docling_api_ray.stages.dedup import boilerplate_strip

    header = "site nav home login search menu cart help"  # 8 words
    rows = []
    for i in range(20):
        body = f"unique body {i} words appear only here once"  # 8 words
        # header in 16/20 docs (df 0.8 > 0.25); body unique everywhere
        text = f"{header} {body}" if i < 16 else body
        rows.append({"doc_id": i, "text": text})
    out = {
        r["doc_id"]: r
        for r in boilerplate_strip(
            ray.data.from_items(rows), para_words=8, max_df_frac=0.25
        ).take_all()
    }
    assert len(out) == 20
    for i in range(16):
        assert out[i]["n_paras"] == 2 and out[i]["n_kept"] == 1, out[i]
        assert header not in out[i]["clean_text"]
        assert f"unique body {i}" in out[i]["clean_text"]
    for i in range(16, 20):
        assert out[i]["n_paras"] == 1 and out[i]["n_kept"] == 1
    # keep-first would have kept one header copy; df-strip keeps zero
    assert not any(header in r["clean_text"] for r in out.values())
