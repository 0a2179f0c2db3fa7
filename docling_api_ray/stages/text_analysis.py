"""Text-analysis operators over the documents table — the training-data
pipeline extensions (task brief: language-ID, quality scoring, token
counting, document fingerprinting).

All hot-path kernels are vectorized ``pyarrow.compute`` RE2 calls inside
``map_batches(batch_format="pyarrow")`` — the same regex engine DuckDB
uses, so the SQL oracles in ``__ray_entry__`` match bit-for-bit.
Fingerprints (md5 / rolling hash) are per-row over the string payload —
O(bytes), the irreducible cost of hashing.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish token classes: letter runs, digit runs, single non-space symbols
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WS_TOKEN_RE = r"\S+"
PUNCT_RE = r"[^\w\s]"
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is")
STOPWORD_RE = r"\b(?:" + "|".join(STOPWORDS) + r")\b"

# language marker words (n-gram-heuristic stand-in with an exact SQL mirror);
# priority order breaks ties deterministically
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "que"),
    "de": ("der", "die", "und"),
    "fr": ("le", "les", "des"),
}
LANG_PRIORITY = ("en", "es", "de", "fr")


def _count(col: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    return pc.count_substring_regex(col, pattern)


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id + whitespace-token and BPE-ish-token counts."""
    t = batch[text_col]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pc.cast(_count(t, WS_TOKEN_RE), pa.int64()),
            "n_bpe_tokens": pc.cast(_count(t, TOKEN_RE), pa.int64()),
        }
    )


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword quality signals, all ratios rounded
    to 6 places so the float compare with the SQL oracle is exact."""
    t = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(t), pa.float64())
    n_words = pc.cast(_count(t, WS_TOKEN_RE), pa.float64())
    n_punct = pc.cast(_count(t, PUNCT_RE), pa.float64())
    n_stop = pc.cast(_count(t, STOPWORD_RE), pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    safe_words = pc.max_element_wise(n_words, pa.scalar(1.0))
    mean_word_len = pc.round(
        pc.divide(pc.subtract(n_chars, pc.subtract(n_words, pa.scalar(1.0))), safe_words),
        ndigits=6,
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_words": pc.cast(n_words, pa.int64()),
            "punct_ratio": pc.round(pc.divide(n_punct, safe_chars), ndigits=6),
            "stopword_ratio": pc.round(pc.divide(n_stop, safe_words), ndigits=6),
            "mean_word_len": mean_word_len,
        }
    )


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Marker-word language ID: per-language marker counts, argmax with
    fixed priority-order tie-break (en > es > de > fr)."""
    t = batch[text_col]
    counts = {
        lang: np.asarray(
            _count(t, r"\b(?:" + "|".join(words) + r")\b"), dtype=np.int64
        )
        for lang, words in LANG_MARKERS.items()
    }
    n = len(batch)
    pred = np.full(n, "", dtype=object)
    best = np.full(n, -1, dtype=np.int64)
    for lang in LANG_PRIORITY:  # first-in-priority wins ties (strict >)
        c = counts[lang]
        take = c > best
        pred[take] = lang
        best = np.maximum(best, c)
    cols = {"doc_id": batch["doc_id"]}
    for lang in LANG_PRIORITY:
        cols[f"c_{lang}"] = pa.array(counts[lang], type=pa.int64())
    cols["predicted_lang"] = pa.array(pred, type=pa.string())
    return pa.table(cols)


def normalize_text(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Curation-standard text normalization, fully vectorized Arrow
    kernels: lowercase → strip punctuation → collapse whitespace runs →
    trim.  The DuckDB oracle mirrors with lower() + three
    regexp_replace calls over the same RE2 patterns."""
    t = batch[text_col]
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, PUNCT_RE, "")
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim_whitespace(t)
    return pa.table({"doc_id": batch["doc_id"], "norm_text": t})


def word_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial word counts — the map side of distributed
    wordcount.  The whole batch tokenizes in ONE Arrow kernel
    (``split_pattern`` + ``list_flatten``, no python word list — the r2
    per-batch list comprehension was the last python loop on this path)
    and folds with Arrow's hash group-by, emitting (word, n) rows
    bounded by the batch's vocabulary."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.list_flatten(
        pc.split_pattern(pc.fill_null(col, ""), " ")
    )
    words = words.filter(pc.not_equal(words, ""))
    if len(words) == 0:
        return pa.table(
            {"word": pa.array([], type=pa.string()),
             "n": pa.array([], type=pa.int64())}
        )
    g = pa.table({"word": words}).group_by(["word"]).aggregate(
        [([], "count_all")]
    )
    return pa.table(
        {
            "word": g["word"],
            "n": pc.cast(g["count_all"], pa.int64()),
        }
    )


def bigram_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial BIGRAM counts — the n-gram analog of
    ``word_counts`` for n-gram-LM / collocation data prep.  Fully
    vectorized: one split per batch, adjacent-token pairs joined with
    ``binary_join_element_wise`` under a same-row mask (no pair may span
    two documents), folded with Arrow's hash group-by."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.split_pattern(pc.fill_null(col, ""), " ")
    flat = pc.list_flatten(words)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    empty_schema = pa.table(
        {"bigram": pa.array([], type=pa.string()),
         "n": pa.array([], type=pa.int64())}
    )
    if len(flat) == 0:
        return empty_schema
    row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    ok = np.asarray(pc.not_equal(flat, ""))
    # pair (i, i+1) is a bigram iff both tokens are in the SAME row and
    # both are non-empty
    same_row = row_of[:-1] == row_of[1:]
    valid = same_row & ok[:-1] & ok[1:]
    if not valid.any():
        return empty_schema
    idx = np.flatnonzero(valid)
    left = flat.take(pa.array(idx))
    right = flat.take(pa.array(idx + 1))
    bigrams = pc.binary_join_element_wise(left, right, " ")
    g = pa.table({"bigram": bigrams}).group_by(["bigram"]).aggregate(
        [([], "count_all")]
    )
    return pa.table(
        {"bigram": g["bigram"], "n": pc.cast(g["count_all"], pa.int64())}
    )


def fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 hex digest + order-sensitive positional ("rolling") word-hash
    fingerprint.  Both SQL-oracle-able: ``fp_md5`` is ``md5(text)``;
    ``fp_rolling`` is the vectorized polynomial hash of
    functions/hashing.py (mod-2^64 arithmetic DuckDB replicates with
    HUGEINT — see the fingerprint_rolling oracle).  The old per-byte
    FNV-1a Python loop is gone; md5 runs once per unique word per
    batch."""
    from docling_api_ray.functions.hashing import positional_fingerprints

    texts = [t or "" for t in batch[text_col].to_pylist()]
    md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    rolls = positional_fingerprints(texts).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fp_md5": pa.array(md5s, type=pa.string()),
            "fp_rolling": pa.array(rolls, type=pa.int64()),
        }
    )
