"""Text-analysis kernels vs hand-computed + DuckDB-mirror expectations."""

import duckdb
import pyarrow as pa

from docling_api_ray.stages.text_analysis import (
    STOPWORD_RE,
    TOKEN_RE,
    WS_TOKEN_RE,
    fingerprints,
    lang_id,
    quality_scores,
    token_counts,
)


def _tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_token_counts():
    out = token_counts(_tbl(["a b c", "hello world42 x!", ""]))
    assert out["n_ws_tokens"].to_pylist() == [3, 3, 0]
    # BPE-ish: a|b|c ; hello|world|42|x|! ; empty
    assert out["n_bpe_tokens"].to_pylist() == [3, 5, 0]


def test_token_counts_match_duckdb():
    texts = ["the quick brown fox!", "a1b2 c,d", "", "x " * 50]
    out = token_counts(_tbl(texts))
    con = duckdb.connect()
    for i, t in enumerate(texts):
        ws, bpe = con.execute(
            "SELECT length(regexp_extract_all(?, ?)), length(regexp_extract_all(?, ?))",
            [t, WS_TOKEN_RE, t, TOKEN_RE],
        ).fetchone()
        assert out["n_ws_tokens"][i].as_py() == ws
        assert out["n_bpe_tokens"][i].as_py() == bpe


def test_quality_scores():
    out = quality_scores(_tbl(["the cat, and dog!"]))
    # 17 chars, 4 words, 2 punct ('!' and ','), stopwords: the, and
    assert out["n_chars"][0].as_py() == 17
    assert out["n_words"][0].as_py() == 4
    assert abs(out["punct_ratio"][0].as_py() - 2 / 17) < 1e-6
    assert abs(out["stopword_ratio"][0].as_py() - 2 / 4) < 1e-6


def test_stopword_regex_matches_duckdb():
    con = duckdb.connect()
    t = "the theater a apple to and of in is band"
    n = con.execute(
        "SELECT length(regexp_extract_all(?, ?))", [t, STOPWORD_RE]
    ).fetchone()[0]
    out = quality_scores(_tbl([t]))
    # stopword_ratio * n_words == count
    assert round(out["stopword_ratio"][0].as_py() * out["n_words"][0].as_py()) == n
    # 'theater' and 'band' must NOT count (word boundaries):
    # the, a, to, and, of, in, is → 7
    assert n == 7


def test_lang_id_markers_and_priority():
    out = lang_id(_tbl([
        "the cat and the dog of it",   # en
        "el la que el",                # es
        "der die und",                 # de
        "le les des le",               # fr
        "nothing matching here",       # all zero → en (priority)
        "the el",                      # tie 1-1 → en (priority)
    ]))
    assert out["predicted_lang"].to_pylist() == ["en", "es", "de", "fr", "en", "en"]


def test_fingerprints_deterministic():
    out1 = fingerprints(_tbl(["abc", ""]))
    out2 = fingerprints(_tbl(["abc", ""]))
    assert out1["fp_md5"].to_pylist() == out2["fp_md5"].to_pylist()
    assert out1["fp_rolling"].to_pylist() == out2["fp_rolling"].to_pylist()
    import hashlib

    assert out1["fp_md5"][0].as_py() == hashlib.md5(b"abc").hexdigest()
    assert all(v >= 0 for v in out1["fp_rolling"].to_pylist())


def test_split_assign_deterministic_and_complete():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.splits import assign_splits, split_counts

    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(1000)), "text": [""] * 1000})
    )
    rows = {r["doc_id"]: r for r in assign_splits(ds).take_all()}
    rows2 = {r["doc_id"]: r for r in assign_splits(ds).take_all()}
    assert rows == rows2  # deterministic across runs
    assert len(rows) == 1000
    counts = {r["split"]: r["n_docs"] for r in split_counts(ds).take_all()}
    assert sum(counts.values()) == 1000
    # 90/5/5 within sampling noise at n=1000
    assert 850 <= counts["train"] <= 950
    assert 20 <= counts["val"] <= 90
    assert 20 <= counts["test"] <= 90
    # split consistent with bucket thresholds
    for r in rows.values():
        expect = "train" if r["bucket"] < 90 else ("val" if r["bucket"] < 95 else "test")
        assert r["split"] == expect


def test_bigram_counts_no_cross_document_pairs():
    import pyarrow as pa

    from docling_api_ray.stages.text_analysis import bigram_counts

    b = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c", "c a", "", "solo"],
        }
    )
    out = {r["bigram"]: r["n"] for r in bigram_counts(b).to_pylist()}
    # "c a" must NOT produce a ("c","a") pair from doc1's tail + doc2's
    # head — only within-document adjacency counts
    assert out == {"a b": 1, "b c": 1, "c a": 1}
    empty = bigram_counts(pa.table({"doc_id": [1], "text": [""]}))
    assert empty.num_rows == 0


def test_pii_redact_counts_and_patterns():
    import pyarrow as pa

    from docling_api_ray.stages.text_analysis import pii_redact

    b = pa.table({"doc_id": [0, 1, 300], "text": ["hello world", "", "x"]})
    out = pii_redact(b).to_pylist()
    by_id = {r["doc_id"]: r for r in out}
    # doc 0 and 300 are % 3 == 0 → extra cc address
    assert by_id[0]["n_emails"] == 2 and by_id[1]["n_emails"] == 1
    assert all(r["n_phones"] == 1 and r["n_ips"] == 1 for r in out)
    for r in out:
        assert "@" not in r["redacted"]
        assert "[EMAIL]" in r["redacted"]
        assert "[PHONE]" in r["redacted"]
        assert "[IP]" in r["redacted"]
    # doc 300: ip third octet is 300 // 256 % 256 == 1 (pre-redaction synth
    # is deterministic from doc_id, so redaction removed exactly that ip)
    assert by_id[300]["redacted"].endswith("call [PHONE] node [IP]")


def test_gopher_quality_rules():
    import pyarrow as pa

    from docling_api_ray.stages.text_analysis import (
        GOPHER_MIN_WORDS,
        gopher_quality,
    )

    rep = "the " + "spam " * 40 + "end"  # top_word_frac ≫ cap
    good = "the quick brown fox jumps over and over the lazy dog near " \
           "a river bank while birds sing in trees above the water line"
    b = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [good, rep, "", "no stop words here at all friend ok"],
        }
    )
    rows = {r["doc_id"]: r for r in gopher_quality(b).to_pylist()}
    assert rows[1]["keep"] is True and rows[1]["has_stopword"] is True
    assert rows[2]["keep"] is False and rows[2]["top_word_frac"] > 0.5
    assert rows[3]["keep"] is False and rows[3]["n_words"] == 0
    # doc 4 has no stopword and is short → double fail
    assert rows[4]["keep"] is False and rows[4]["has_stopword"] is False
    assert rows[4]["n_words"] < GOPHER_MIN_WORDS
    # dup_word_frac: 40×'spam'+the+end = 42 words, 3 unique → 39/42
    assert abs(rows[2]["dup_word_frac"] - round(39 / 42, 6)) < 1e-9


def test_charlm_scores_edge_cases():
    """Char-bigram LM: unicode folds to OTHER, empty/1-char docs score
    (0, 0, 0.0), the trained model is deterministic, and a gibberish doc
    scores below a doc made of the corpus's dominant pattern."""
    import ray.data

    from docling_api_ray.stages.charlm import (
        charlm_scores,
        micro_log_table,
        train_counts,
    )

    docs = pa.table(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "the cat sat on the mat " * 20,
                "the rat sat on the hat " * 20,
                "",          # no pairs
                "x",         # 1 char: no pairs
                "日本語テキスト",  # all non-ASCII -> OTHER-OTHER pairs
            ],
        }
    )
    ds = ray.data.from_arrow(docs)
    rows = {r["doc_id"]: r for r in charlm_scores(ds).take_all()}
    assert rows[2]["n_pairs"] == 0 and rows[2]["lp_micro"] == 0
    assert rows[2]["avg_lp"] == 0.0
    assert rows[3]["n_pairs"] == 0
    assert rows[4]["n_pairs"] == 6  # 7 code points -> 6 pairs, all OTHER
    # english-patterned docs score far above the all-OTHER doc
    assert rows[0]["avg_lp"] > rows[4]["avg_lp"]
    # counts matrix: deterministic and integer-consistent with n_pairs
    c = train_counts(ds)
    assert c.sum() == sum(r["n_pairs"] for r in rows.values())
    t1, t2 = micro_log_table(c), micro_log_table(train_counts(ds))
    assert (t1 == t2).all()


def test_token_entropy_exact_values():
    import math

    import numpy as np

    from docling_api_ray.stages.text_analysis import token_entropy

    out = token_entropy(_tbl(["a a b b", "a a a a", "a b c d", "", "x"]))
    lens = out["n_tokens"].to_pylist()
    assert lens == [4, 4, 4, 0, 1]
    ent = out["ent_micro"].to_pylist()
    r = lambda x: int(np.rint(math.log(x) * 1e6))
    # "a a b b": 4·r(ln4) − 2·(2·r(ln2))
    assert ent[0] == 4 * r(4) - 2 * (2 * r(2))
    # uniform repeats → 0; all-distinct → 4·r(ln4); degenerate → 0
    assert ent[1] == 4 * r(4) - 4 * r(4) == 0
    assert ent[2] == 4 * r(4)
    assert ent[3] == 0 and ent[4] == 0
    e = out["entropy"].to_pylist()
    assert abs(e[2] - math.log(4)) < 1e-5 and e[1] == 0.0 and e[3] == 0.0


def test_readability_scores_hand_values():
    import numpy as np
    import pyarrow as pa

    from docling_api_ray.stages.text_analysis import readability_scores

    # doc 1: "go on. stop now!" -> 4 words, 2 sentences, 4 vowel groups
    #   wps=2.0, spw=1.0, flesch = 206.835 - 2.03 - 84.6 = 120.205
    # doc 2: empty -> all zero denominators guarded
    b = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["go on. stop now!", ""], pa.string()),
        }
    )
    out = readability_scores(b).to_pylist()
    assert out[0]["n_words"] == 4
    assert out[0]["n_sentences"] == 2
    assert out[0]["n_syllables"] == 4
    assert out[0]["wps"] == 2.0
    assert out[0]["spw"] == 1.0
    assert out[0]["flesch"] == round(206.835 - 1.015 * 2 - 84.6, 6)
    assert out[1]["n_words"] == 0
    assert out[1]["wps"] == 0.0 and out[1]["spw"] == 0.0
    assert out[1]["flesch"] == 206.835


def test_winnow_fingerprints_hand_values():
    import numpy as np
    import pyarrow as pa

    from docling_api_ray.functions.hashing import (
        batch_word_hashes,
        shingle_hashes,
    )
    from docling_api_ray.stages.text_analysis import (
        WINNOW_W,
        winnow_fingerprints,
    )

    texts = [
        "a b c d e f g h i j",  # 8 shingles, 5 full windows
        "a b c",  # 1 shingle < w: one whole-sequence window
        "",  # no shingles
        "x y z x y z x y z x y z",  # periodic -> repeated min, ties
    ]
    b = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = winnow_fingerprints(b).to_pylist()

    # reference implementation: per-doc python winnowing
    def ref(text):
        wh, off = batch_word_hashes([text])
        h = shingle_hashes(wh[off[0] : off[1]]).tolist()
        n = len(h)
        if n == 0:
            return 0, 0, set()
        nw = max(n - WINNOW_W + 1, 1)
        sel = set()
        for j in range(nw):
            win = h[j : j + WINNOW_W]
            m = min(win)
            # rightmost occurrence of the min
            pos = j + max(i for i, v in enumerate(win) if v == m)
            sel.add(pos)
        return n, nw, {(p, h[p]) for p in sel}

    for row, text in zip(out, texts):
        n, nw, sel = ref(text)
        assert row["n_shingles"] == n
        assert row["n_windows"] == nw
        assert row["n_fps"] == len(sel)
        if sel:
            hs = [hv for _, hv in sel]
            assert row["fp_min"] == min(hs) % (1 << 63)
            assert row["fp_sum"] == (sum(hs) % (1 << 64)) % (1 << 63)
            assert row["density"] == len(sel) / nw
            # winnowing density guarantee: at most one pick per window
            assert row["n_fps"] <= nw
        else:
            assert row["fp_min"] is None and row["fp_sum"] is None
            assert row["density"] is None


def test_compression_ratio_matches_zlib():
    import math
    import zlib

    import ray.data

    from docling_api_ray.stages.text_analysis import compression_ratio

    texts = [
        "abc " * 200,                      # highly repetitive → low ratio
        "the quick brown fox jumps over",  # short natural text
        "",                                # empty → ratio 0
    ]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    out = {r["doc_id"]: r for r in compression_ratio(ds).take_all()}
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        comp = len(zlib.compress(raw, 6)) if raw else 0
        assert out[i]["raw_len"] == len(raw)
        assert out[i]["comp_len"] == comp
        exp = (
            math.floor(comp / len(raw) * 1e6 + 0.5) / 1e6 if raw else 0.0
        )
        assert out[i]["comp_ratio"] == exp
    # the repetition signal orders as expected
    assert out[0]["comp_ratio"] < out[1]["comp_ratio"]
