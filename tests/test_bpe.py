"""BPE vocabulary learning: hand-computed merge sequences, determinism,
and learned-tokenizer token counting."""

import pyarrow as pa
import ray.data

from docling_api_ray.stages.bpe import (
    apply_merges,
    bpe_merges_dataset,
    bpe_token_counts,
    corpus_word_counts,
    learn_merges,
)


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def test_learn_merges_hand_computed():
    # classic example: {"aaab": 4, "aab": 2}
    # round 1 pairs: (a,a): 4*2 + 2 = 10, (a,b): 4 + 2 = 6 -> merge (a,a)
    # round 2: seqs [aa,a,b]x4, [aa,b]x2; pairs (aa,a):4, (aa,b):2, (a,b):4
    #   tie 4 vs 4 -> lexicographic: ('a','b') < ('aa','a') -> merge (a,b)
    merges = learn_merges([("aaab", 4), ("aab", 2)], 2)
    assert merges == [("a", "a", 10), ("a", "b", 4)]


def test_apply_merges_inverse_of_training():
    merges = learn_merges([("aaab", 4), ("aab", 2)], 3)
    # with merges [(a,a),(a,b), ...]: "aaab" -> aa,a,b -> aa,ab; the
    # third learned merge is (aa,ab) (counts 4+2 from both words after
    # two rewrites beat (aa,b)'s 2), collapsing "aaab" to one token
    assert merges[2][:2] == ("aa", "ab")
    assert apply_merges("aaab", merges) == ["aaab"]
    assert apply_merges("aaab", merges[:2]) == ["aa", "ab"]
    assert apply_merges("b", merges) == ["b"]
    assert apply_merges("", merges) == []


def test_distributed_word_counts_and_merge_dataset():
    ds = _docs(["low low lower", "lowest low"] * 3).repartition(4)
    wc = corpus_word_counts(ds)
    assert wc[0] == ("low", 9)  # exact count, (count desc, word asc)
    out = bpe_merges_dataset(ds, num_merges=3).take_all()
    assert [r["rank"] for r in out] == [1, 2, 3]
    # every word contains "lo": first merge must be (l, o) with count
    # 9 + 3 + 3 = 15
    assert (out[0]["left"], out[0]["right"], out[0]["pair_count"]) == (
        "l", "o", 15,
    )
    # determinism
    again = bpe_merges_dataset(ds, num_merges=3).take_all()
    assert again == out


def test_bpe_token_counts_stage():
    ds = _docs(["aaab aab", "b aaab", ""])
    merges = learn_merges(corpus_word_counts(ds), 2)
    out = {r["doc_id"]: r for r in bpe_token_counts(ds, merges).take_all()}
    # merges learned on this corpus: (a,a) then tie-broken second merge;
    # token counts must equal applying the same merges per word
    exp0 = len(apply_merges("aaab", merges)) + len(apply_merges("aab", merges))
    exp1 = 1 + len(apply_merges("aaab", merges))
    assert out[0]["n_bpe_tokens"] == exp0
    assert out[1]["n_bpe_tokens"] == exp1
    assert out[2]["n_bpe_tokens"] == 0 and out[2]["n_words"] == 0
