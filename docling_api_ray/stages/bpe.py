"""Distributed BPE vocabulary learning — tokenizer training as a data
pipeline operator (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units").

This is the standard industrial shape (sentencepiece/HF-tokenizers do
the same): the CORPUS-scale work is one exact distributed word count —
map-side Arrow partials + a word-hash co-group fold, the same machinery
as ``vocab_topk`` — and the merge-learning loop then runs over the
BOUNDED (word, count) table, never over raw text.  At 100 TB the word
count streams and shuffles fixed-width (word, n) partials; the
learn loop's input is vocabulary-proportional, the accepted bound of
every BPE trainer (cap it with a min-count threshold if the vocabulary
is adversarially open — wired as ``min_count``).

Determinism: integer pair counts; the merged pair each round is the
(count DESC, pair ASC) maximum — lexicographic tie-break, no RNG.  Not
SQL-expressible (iterative merge rewriting) → the conformance query is
a rows-only check; exactness is covered by hand-computed unit tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def corpus_word_counts(
    ds: ray.data.Dataset, *, text_col: str = "text", min_count: int = 1
) -> list[tuple[str, int]]:
    """Distributed exact word count → bounded driver-side list, sorted
    (count desc, word asc)."""
    from docling_api_ray.stages.common import guard_fold, shuffle_partitions
    from docling_api_ray.stages.text_analysis import word_counts

    import pandas as pd

    def add_part(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(b["word"].to_pylist(), dtype=object)
        ).astype(np.int64)
        return b.append_column(
            "__part",
            pa.array(np.abs(h) % shuffle_partitions(), type=pa.int64()),
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("word", sort=False)["n"].sum().reset_index()
        g = g[g["n"] >= min_count]
        return pa.table(
            {
                "word": pa.array(g["word"].tolist(), type=pa.string()),
                "n": pa.array(g["n"].to_numpy(), type=pa.int64()),
            }
        )

    rows = (
        ds.map_batches(
            lambda b: word_counts(b, text_col=text_col),
            batch_format="pyarrow",
        )
        .map_batches(add_part, batch_format="pyarrow")
        .map_batches(  # inline coalesce_narrow (common.py) — bundle tiny blocks
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__part")
        .map_groups(guard_fold(fold, key_col="word"), batch_format="pandas")
        .take_all()
    )
    return sorted(
        ((r["word"], int(r["n"])) for r in rows),
        key=lambda wn: (-wn[1], wn[0]),
    )


def learn_merges(
    word_counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str, int]]:
    """Classic BPE over the (word, count) table: each word starts as its
    character sequence; each round merges the globally most frequent
    adjacent symbol pair (count desc, pair asc).  Returns
    [(left, right, pair_count)] in merge order."""
    seqs: list[list[str]] = [list(w) for w, _ in word_counts]
    counts = [n for _, n in word_counts]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pair_n: dict[tuple[str, str], int] = {}
        for seq, n in zip(seqs, counts):
            for a, b in zip(seq, seq[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + n
        if not pair_n:
            break
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))
        (la, rb), cnt = best
        merges.append((la, rb, cnt))
        tok = la + rb
        for seq in seqs:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == la and seq[i + 1] == rb:
                    seq[i : i + 2] = [tok]
                else:
                    i += 1
    return merges


def apply_merges(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Tokenize one word with the learned merge list (in merge-rank
    order — the exact inverse of training)."""
    seq = list(word)
    for la, rb, _ in merges:
        i = 0
        while i < len(seq) - 1:
            if seq[i] == la and seq[i + 1] == rb:
                seq[i : i + 2] = [la + rb]
            else:
                i += 1
    return seq


def bpe_merges_dataset(
    ds: ray.data.Dataset, *, num_merges: int = 20, text_col: str = "text"
) -> ray.data.Dataset:
    """documents → (rank, left, right, pair_count): the learned merge
    table as a Dataset (bounded: ``num_merges`` rows)."""
    merges = learn_merges(
        corpus_word_counts(ds, text_col=text_col), num_merges
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "rank": pa.array(range(1, len(merges) + 1), type=pa.int64()),
                "left": pa.array([m[0] for m in merges], type=pa.string()),
                "right": pa.array([m[1] for m in merges], type=pa.string()),
                "pair_count": pa.array(
                    [m[2] for m in merges], type=pa.int64()
                ),
            }
        )
    )


class _BpeTokenCount:
    """Stateless scorer: per-doc learned-BPE token count against the
    broadcast merge list.  Merges apply once per UNIQUE word per batch
    (words repeat heavily in any corpus); per-doc counts are a
    vectorized gather + segmented sum."""

    def __init__(self, merges_ref) -> None:
        import ray

        self.merges = ray.get(merges_ref)
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        from docling_api_ray.functions.hashing import split_words

        texts = [t or "" for t in batch["text"].to_pylist()]
        words_per_doc = [split_words(t) for t in texts]
        lens = np.fromiter(
            (len(w) for w in words_per_doc), dtype=np.int64,
            count=len(words_per_doc),
        )
        flat = [w for ws in words_per_doc for w in ws]
        if flat:
            codes, uniques = pd.factorize(np.asarray(flat, dtype=object))

            def count_tokens(w: str) -> int:
                # explicit hit check — setdefault would evaluate
                # apply_merges eagerly and make the cache inert
                n = self.cache.get(w)
                if n is None:
                    n = self.cache[w] = len(apply_merges(w, self.merges))
                return n

            per_uniq = np.fromiter(
                (count_tokens(w) for w in uniques),
                dtype=np.int64,
                count=len(uniques),
            )
            per_word = per_uniq[codes]
            offsets = np.zeros(len(texts) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            # cumsum-difference segmented sum: robust to empty rows in
            # ANY position (reduceat's clamped-offset variant corrupts
            # the final non-empty row when empty rows trail the batch)
            csum = np.zeros(len(per_word) + 1, dtype=np.int64)
            np.cumsum(per_word, out=csum[1:])
            tok = csum[offsets[1:]] - csum[offsets[:-1]]
        else:
            tok = np.zeros(len(texts), dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(lens, type=pa.int64()),
                "n_bpe_tokens": pa.array(tok, type=pa.int64()),
            }
        )


def bpe_token_counts(
    ds: ray.data.Dataset, merges: list[tuple[str, str, int]]
) -> ray.data.Dataset:
    """documents → (doc_id, n_words, n_bpe_tokens) under the learned
    merges (broadcast once, cached per actor)."""
    import ray

    ref = ray.put(merges)
    return ds.map_batches(
        _BpeTokenCount,
        fn_constructor_kwargs={"merges_ref": ref},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 8),
    )
