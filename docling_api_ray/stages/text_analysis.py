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


# PII patterns (RE2, shared verbatim with the DuckDB oracle).  Order of
# application matters: emails first (their local parts may contain digits
# and dots), then phones, then bare IPs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"
IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def pii_redact(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII scrubbing for training-data curation: count and redact
    emails / phone numbers / IPv4 addresses with vectorized RE2 kernels.

    The synthetic corpus contains no natural PII, so each row first gets
    a deterministic doc_id-derived contact block appended (email, an
    extra cc address on every third doc, phone, IP) — the same
    synthesize-then-operate pattern as ``md_structure`` — and the SQL
    oracle mirrors the synthesis arithmetic exactly.  Redaction itself
    is three ``replace_substring_regex`` passes over the whole batch;
    counts come from ``count_substring_regex`` on the pre-redaction
    text.  Stateless, shuffle-free, embarrassingly parallel — the
    100 TB shape is a single ``map_batches`` pass."""
    did = np.asarray(batch["doc_id"], dtype=np.int64)

    def _s(nums: np.ndarray) -> pa.Array:
        return pc.cast(pa.array(nums), pa.string())

    email = pc.binary_join_element_wise(
        pa.array(np.full(len(did), " contact user")), _s(did),
        pa.array(np.full(len(did), "@example")), _s(did % 7),
        pa.array(np.full(len(did), ".org")), "",
    )
    cc = pc.if_else(
        pa.array(did % 3 == 0),
        pc.binary_join_element_wise(
            pa.array(np.full(len(did), " cc backup")), _s(did),
            pa.array(np.full(len(did), "@mail.net")), "",
        ),
        pa.scalar(""),
    )
    phone = pc.binary_join_element_wise(
        pa.array(np.full(len(did), " call +1-555-")),
        pc.utf8_lpad(_s(did % 10000), width=4, padding="0"), "",
    )
    ip = pc.binary_join_element_wise(
        pa.array(np.full(len(did), " node 10.")), _s(did % 256),
        pa.array(np.full(len(did), ".")), _s((did // 256) % 256),
        pa.array(np.full(len(did), ".")), _s(did % 100), "",
    )
    synth = pc.binary_join_element_wise(
        pc.fill_null(batch[text_col], ""), email, cc, phone, ip, ""
    )
    n_emails = pc.cast(_count(synth, EMAIL_RE), pa.int64())
    n_phones = pc.cast(_count(synth, PHONE_RE), pa.int64())
    n_ips = pc.cast(_count(synth, IP_RE), pa.int64())
    red = pc.replace_substring_regex(synth, EMAIL_RE, "[EMAIL]")
    red = pc.replace_substring_regex(red, PHONE_RE, "[PHONE]")
    red = pc.replace_substring_regex(red, IP_RE, "[IP]")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_emails": n_emails,
            "n_phones": n_phones,
            "n_ips": n_ips,
            "redacted": red,
        }
    )


# Gopher-style quality-rule thresholds (Rae et al. 2021, table A1 shape:
# word-count window, mean-word-length window, repetition caps, stopword
# presence).  Values tuned so the synthetic corpus splits non-trivially.
GOPHER_MIN_WORDS = 15
GOPHER_MAX_WORDS = 5000
GOPHER_MIN_MWL = 2.0
GOPHER_MAX_MWL = 12.0
GOPHER_MAX_DUP_FRAC = 0.55
GOPHER_MAX_TOP_FRAC = 0.2


def gopher_quality(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-rule document quality filter: per-doc word stats,
    word-repetition ratios and a stopword-presence flag folded into a
    single ``keep`` verdict.

    Fully vectorized over the flattened token stream: one
    ``split_pattern`` per batch, then numpy ``bincount`` /
    ``np.unique`` over (row, word-code) pairs — no per-row python.
    Ratios are rounded to 6 places *before* threshold comparison so the
    keep verdict is bit-identical to the SQL oracle's.  Stateless map;
    100 TB shape is a single streaming pass."""
    import pandas as pd

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(batch)
    words = pc.split_pattern(pc.fill_null(col, ""), " ")
    flat = pc.list_flatten(words)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    ok = np.asarray(pc.not_equal(flat, ""))
    row_ok = row_of[ok]
    flat_ok = flat.filter(pa.array(ok))
    wl = np.asarray(pc.utf8_length(flat_ok), dtype=np.int64)

    n_words = np.bincount(row_ok, minlength=n).astype(np.int64)
    total_chars = np.bincount(row_ok, weights=wl, minlength=n).astype(np.int64)

    codes = pd.factorize(np.asarray(flat_ok, dtype=object))[0].astype(np.int64)
    vocab = int(codes.max()) + 1 if len(codes) else 1
    pair_keys, pair_counts = np.unique(row_ok * vocab + codes, return_counts=True)
    pair_rows = pair_keys // vocab
    n_unique = np.bincount(pair_rows, minlength=n).astype(np.int64)
    top_n = np.zeros(n, dtype=np.int64)
    np.maximum.at(top_n, pair_rows, pair_counts)

    stop_hit = np.isin(np.asarray(flat_ok, dtype=object), STOPWORDS)
    has_stop = np.bincount(row_ok, weights=stop_hit, minlength=n) > 0

    safe = np.maximum(n_words, 1).astype(np.float64)
    mwl = np.round(total_chars / safe, 6)
    dup_frac = np.round((n_words - n_unique) / safe, 6)
    top_frac = np.round(top_n / safe, 6)
    keep = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (mwl >= GOPHER_MIN_MWL)
        & (mwl <= GOPHER_MAX_MWL)
        & (dup_frac <= GOPHER_MAX_DUP_FRAC)
        & (top_frac <= GOPHER_MAX_TOP_FRAC)
        & has_stop
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words),
            "mean_word_len": pa.array(mwl),
            "dup_word_frac": pa.array(dup_frac),
            "top_word_frac": pa.array(top_frac),
            "has_stopword": pa.array(has_stop),
            "keep": pa.array(keep),
        }
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


# fixed "trained" quality-classifier weights (deterministic model
# inference demo: heavy punctuation penalized, stopword density — a
# fluency proxy — rewarded, long words mildly penalized, length rewarded)
QLOGIT_W0 = -0.6
QLOGIT_W_PUNCT = -8.0
QLOGIT_W_STOP = 6.0
QLOGIT_W_MWL = -0.25
QLOGIT_W_LNW = 0.35


def quality_logit(batch: pa.Table) -> pa.Table:
    """Logistic-regression quality-classifier INFERENCE over the
    quantized ``quality_scores`` features — the no-torch stand-in for
    batched model scoring (fastText/KenLM-style quality gates).

    Exactness: inputs are the already-round(,6) feature ratios, the
    linear combination is chained LEFT-TO-RIGHT exactly as the SQL
    oracle parenthesizes it, the logit is quantize6'd BEFORE the
    sigmoid, and the sigmoid output is quantize6'd again — the only
    cross-engine risk is a ln/exp last-ulp straddling a rounding
    boundary, the same accepted risk as the idf/BM25 family."""
    from docling_api_ray.stages.windows import quantize6_np

    p = np.asarray(batch["punct_ratio"], dtype=np.float64)
    s = np.asarray(batch["stopword_ratio"], dtype=np.float64)
    m = np.asarray(batch["mean_word_len"], dtype=np.float64)
    w = np.asarray(batch["n_words"], dtype=np.float64)
    logit = QLOGIT_W0 + QLOGIT_W_PUNCT * p
    logit = logit + QLOGIT_W_STOP * s
    logit = logit + QLOGIT_W_MWL * m
    logit = logit + QLOGIT_W_LNW * np.log(1.0 + w)
    logit = quantize6_np(logit)
    prob = quantize6_np(1.0 / (1.0 + np.exp(-logit)))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "logit": pa.array(logit, type=pa.float64()),
            "prob": pa.array(prob, type=pa.float64()),
            "keep": pa.array(prob >= 0.5, type=pa.bool_()),
        }
    )


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Within-document bigram repetition signals — the Gopher repetition
    rules' n-gram family (Rae et al. 2021 §A1.1: "fraction of characters
    in the most common n-gram" / "in duplicated n-grams"), word-level
    analog for word-soup corpora where line-based rules are degenerate.

    Per doc: n_bigrams, the most common bigram's count (top2_n), the
    number of bigram occurrences whose bigram repeats (dup2_n), and the
    two fractions.  Fully vectorized: one split per batch, factorized
    word codes, integer (row, code_i, code_i+1) keys counted with
    ``np.unique`` — no per-row python.  Fractions are SINGLE int/int
    IEEE divisions (bit-identical in numpy and SQL — no quantization
    needed, unlike associated float sums; a micro-quantize here would
    actually DIVERGE on exact-.5 products, e.g. top2_n/128).
    Stateless map; 100 TB shape is one streaming pass."""
    import pandas as pd

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(batch)
    words = pc.split_pattern(pc.fill_null(col, ""), " ")
    flat = pc.list_flatten(words)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)

    codes = pd.factorize(np.asarray(flat, dtype=object))[0].astype(np.int64)
    vocab = int(codes.max()) + 1 if len(codes) else 1
    # adjacent positions within the same row only
    same_row = row_of[:-1] == row_of[1:] if len(codes) > 1 else np.zeros(0, bool)
    r = row_of[:-1][same_row]
    key = (r * vocab + codes[:-1][same_row]) * vocab + codes[1:][same_row]
    uniq, counts = np.unique(key, return_counts=True)
    pair_rows = (uniq // vocab) // vocab

    n_bigrams = np.maximum(lens.astype(np.int64) - 1, 0)
    # empty texts split to [''] (len 1) -> 0 bigrams already
    top2 = np.zeros(n, dtype=np.int64)
    np.maximum.at(top2, pair_rows, counts)
    dup2 = np.bincount(
        pair_rows, weights=counts * (counts >= 2), minlength=n
    ).astype(np.int64)

    safe = np.maximum(n_bigrams, 1).astype(np.float64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_bigrams": pa.array(n_bigrams, type=pa.int64()),
            "top2_n": pa.array(top2, type=pa.int64()),
            "dup2_n": pa.array(dup2, type=pa.int64()),
            "top2_frac": pa.array(top2 / safe, type=pa.float64()),
            "dup2_frac": pa.array(dup2 / safe, type=pa.float64()),
        }
    )


def token_entropy(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document Shannon entropy of the word distribution — the
    lexical-diversity quality signal (low entropy = template/spam text;
    a standard corpus-filtering feature alongside the Gopher rules).

    H = ln n − (1/n)·Σ_w c_w·ln c_w over word counts c_w.  Exactness:
    every ln is individually micro-quantized (``r(x) = round(ln x·1e6)``
    int64), so ``ent_micro = n·r(ln n) − Σ c_w·r(ln c_w)`` is an integer
    summed ORDER-FREE (reshard/parallelism-proof) and
    ``entropy = ent_micro / (n·1e6)`` is one IEEE division — the DuckDB
    oracle replays both bit-for-bit.  Words are compared by their
    ``u64_md5`` hash (collisions merge counts identically on both
    sides).  Stateless vectorized map: one lexsort per batch over
    (doc, hash), run-length counts, integer segment sums — 100 TB shape
    is one streaming pass, no shuffle."""
    from docling_api_ray.functions.hashing import batch_word_hashes

    texts = [t if t is not None else "" for t in batch[text_col].to_pylist()]
    hashes, offsets = batch_word_hashes(texts)
    lens = np.diff(offsets)
    ndocs = len(texts)
    s = np.zeros(ndocs, dtype=np.int64)
    if len(hashes):
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
        order = np.lexsort((hashes, doc_of))
        sd = doc_of[order]
        sh = hashes[order]
        run_start = np.ones(len(sh), dtype=bool)
        run_start[1:] = (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])
        starts = np.flatnonzero(run_start)
        counts = np.diff(np.append(starts, len(sh)))
        terms = counts * np.rint(
            np.log(counts.astype(np.float64)) * 1e6
        ).astype(np.int64)
        np.add.at(s, sd[starts], terms)  # int64 adds — exact
    r_n = np.zeros(ndocs, dtype=np.int64)
    nz = lens > 0
    r_n[nz] = np.rint(np.log(lens[nz].astype(np.float64)) * 1e6).astype(
        np.int64
    )
    ent = lens * r_n - s
    entropy = np.where(nz, ent / (np.maximum(lens, 1) * 1e6), 0.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(lens, type=pa.int64()),
            "ent_micro": pa.array(ent, type=pa.int64()),
            "entropy": pa.array(entropy, type=pa.float64()),
        }
    )


SENT_RE = r"[.!?]"
SYLL_RE = r"[aeiouyAEIOUY]+"


def readability_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Flesch-style readability per doc, fully vectorized: words-per-
    sentence and vowel-group-per-word ratios (vowel runs are the
    standard cheap syllable proxy — a space always breaks a run, so the
    whole-text count equals the per-word sum), combined as
    206.835 − 1.015·wps − 84.6·spw.  A curation filter tier: extreme
    scores flag boilerplate lists (tiny wps) and OCR noise (huge spw).
    All ratios quantized to 6 decimals (rint) for the exact oracle
    compare."""
    t = batch[text_col]
    words = np.asarray(_count(t, WS_TOKEN_RE), dtype=np.float64)
    sents = np.asarray(_count(t, SENT_RE), dtype=np.float64)
    syll = np.asarray(_count(t, SYLL_RE), dtype=np.float64)
    wps = words / np.maximum(sents, 1.0)
    spw = syll / np.maximum(words, 1.0)
    score = 206.835 - 1.015 * wps - 84.6 * spw
    q6 = lambda x: np.rint(x * 1e6) / 1e6  # noqa: E731
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(words.astype(np.int64), pa.int64()),
            "n_sentences": pa.array(sents.astype(np.int64), pa.int64()),
            "n_syllables": pa.array(syll.astype(np.int64), pa.int64()),
            "wps": pa.array(q6(wps), pa.float64()),
            "spw": pa.array(q6(spw), pa.float64()),
            "flesch": pa.array(q6(score), pa.float64()),
        }
    )


WINNOW_W = 4  # winnowing window size over the 3-word shingle sequence


def winnow_selected(
    texts: list[str], w: int = WINNOW_W
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Core winnowing selection for a batch of texts: returns
    ``(sel_doc, sel_h, lens)`` where ``sel_doc``/``sel_h`` are the
    position-deduped selected fingerprints (local doc index + uint64
    shingle hash, position-sorted) and ``lens`` is each doc's shingle
    count.  See :func:`winnow_fingerprints` for the algorithm and
    :func:`docling_api_ray.stages.dedup.winnow_pairs` for the pairwise
    consumer."""
    from numpy.lib.stride_tricks import sliding_window_view

    from docling_api_ray.functions.hashing import (
        batch_word_hashes,
        shingle_hashes,
    )

    n = len(texts)
    word_h, off = batch_word_hashes(texts)
    sh_list = [shingle_hashes(word_h[off[i] : off[i + 1]]) for i in range(n)]
    lens = np.fromiter((len(s) for s in sh_list), dtype=np.int64, count=n)
    total = int(lens.sum())
    h = np.concatenate(sh_list) if total else np.zeros(0, dtype=np.uint64)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)

    sel_parts: list[np.ndarray] = []
    if total >= w:
        win = sliding_window_view(h, w)  # (total - w + 1, w)
        valid = doc_of[: len(win)] == doc_of[w - 1 :]
        rarg = (w - 1) - np.argmin(win[:, ::-1], axis=1)
        gpos = np.arange(len(win), dtype=np.int64) + rarg
        sel_parts.append(gpos[valid])
    short = np.flatnonzero((lens > 0) & (lens < w))
    if len(short):
        cols = np.arange(w - 1, dtype=np.int64)
        idx = starts[short][:, None] + cols[None, :]
        mask = cols[None, :] < lens[short][:, None]
        vals = np.where(
            mask, h[np.minimum(idx, max(total - 1, 0))], np.uint64(-1)
        )
        rarg = (w - 2) - np.argmin(vals[:, ::-1], axis=1)
        sel_parts.append(starts[short] + rarg)
    gsel = (
        np.unique(np.concatenate(sel_parts))
        if sel_parts
        else np.zeros(0, dtype=np.int64)
    )
    sel_doc = doc_of[gsel] if len(gsel) else np.zeros(0, dtype=np.int64)
    sel_h = h[gsel] if len(gsel) else np.zeros(0, dtype=np.uint64)
    return sel_doc, sel_h, lens


def winnow_fingerprints(
    batch: pa.Table, text_col: str = "text", w: int = WINNOW_W
) -> pa.Table:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm): slide a
    window of ``w`` consecutive 3-word shingle hashes, select the
    MINIMUM hash of each window (rightmost occurrence on ties), and
    dedupe the selected positions — a position-local fingerprint set
    whose density is guaranteed in [1/w, 2/(w+1)], the standard
    copy-detection sketch between exact hashing and MinHash.

    Per doc: shingle count, full-window count (a shorter-than-w shingle
    sequence forms ONE window covering the whole sequence), selected
    fingerprint count, min and mod-2^63 checksum of the selected hashes,
    and the realized density (single IEEE int/int division).

    Fully vectorized over the CONCATENATED batch shingle array:
    ``sliding_window_view`` + boundary mask for full windows, a padded
    (n_short, w-1) matrix for the short docs; rightmost argmin is
    ``argmin`` over the reversed window axis.  Stateless map — the
    100 TB shape is one streaming pass, no shuffle."""
    texts = [t or "" for t in batch[text_col].to_pylist()]
    n = len(texts)
    sel_doc, sel_h, lens = winnow_selected(texts, w)
    n_fps = np.bincount(sel_doc, minlength=n).astype(np.int64)
    fp_min = np.full(n, np.uint64(-1), dtype=np.uint64)
    np.minimum.at(fp_min, sel_doc, sel_h)
    acc = np.zeros(n, dtype=np.int64)  # two's-complement == mod 2^64
    np.add.at(acc, sel_doc, sel_h.view(np.int64))
    mask63 = np.uint64((1 << 63) - 1)
    has = n_fps > 0
    n_windows = np.where(lens > 0, np.maximum(lens - w + 1, 1), 0)
    dens = n_fps / np.maximum(n_windows, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_shingles": pa.array(lens, type=pa.int64()),
            "n_windows": pa.array(n_windows, type=pa.int64()),
            "n_fps": pa.array(n_fps, type=pa.int64()),
            "fp_min": pa.array(
                (fp_min & mask63).view(np.int64), type=pa.int64(), mask=~has
            ),
            "fp_sum": pa.array(
                (acc.view(np.uint64) & mask63).view(np.int64),
                type=pa.int64(),
                mask=~has,
            ),
            "density": pa.array(dens, type=pa.float64(), mask=~(lens > 0)),
        }
    )


_COMP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("raw_len", pa.int64()),
        ("comp_len", pa.int64()),
        ("comp_ratio", pa.float64()),
    ]
)


def compression_ratio(
    ds: ray.data.Dataset, *, text_col: str = "text", level: int = 6
) -> ray.data.Dataset:
    """Per-doc zlib compression ratio — the classic cheap repetition /
    boilerplate quality signal (low ratio = highly compressible =
    repetitive template text; used alongside the Gopher rules in
    web-corpus filtering).  ``comp_ratio = comp_len / raw_len``,
    ⌊x·1e6+½⌋-quantized; empty docs report ratio 0.

    Stateless vectorized-enough map_batches (zlib releases the GIL per
    call; the per-doc loop is the codec, not python bookkeeping).
    Deterministic for a fixed zlib level, so the output is stable
    across runs — but no SQL engine exposes zlib, so the query entry is
    rows-only, pinned by a direct zlib reference test."""
    import math
    import zlib

    def score(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _COMP_SCHEMA.empty_table()
        texts = [t if t is not None else "" for t in b[text_col].to_pylist()]
        raw = [t.encode("utf-8") for t in texts]
        comp = [len(zlib.compress(r, level)) if r else 0 for r in raw]
        rl = [len(r) for r in raw]
        ratio = [
            math.floor(c / r * 1e6 + 0.5) / 1e6 if r > 0 else 0.0
            for c, r in zip(comp, rl)
        ]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "raw_len": pa.array(rl, type=pa.int64()),
                "comp_len": pa.array(comp, type=pa.int64()),
                "comp_ratio": pa.array(ratio, type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
