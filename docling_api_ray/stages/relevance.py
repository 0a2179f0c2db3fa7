"""BM25 relevance scoring against a broadcast query — the retrieval /
data-selection scorer of a training-data pipeline (rank corpus documents
for a topic, select the top slice for curriculum or dedup-priority).

Two streaming passes, the canonical shape for corpus-statistics scoring:

1. **stats pass** — per-batch partial sums of (n_docs, total_tokens,
   per-query-term document frequency).  The reduction is |terms|+2
   numbers regardless of corpus size, folded driver-side (one int row
   per block) and broadcast back (``ray.put``).
2. **score pass** — stateless ``map_batches``: exact-token term
   frequencies (ONE whitespace split per batch shared by all terms,
   per-term vectorized equality + segmented ``add.reduceat``), then the
   Robertson/Sparck-Jones BM25 formula (k1=1.2, b=0.75,
   idf = ln(1 + (N-df+0.5)/(df+0.5))), summed in FIXED query-term order
   and quantized to 6 decimals so the DuckDB oracle — which spells out
   the same per-term expressions in the same order over
   ``list_filter(regexp_extract_all(text, '\\S+'), x -> x = term)`` —
   compares exactly.

Tokenization is whitespace-delimited tokens (``\\S+``), the same
convention as the wordcount/dedup family."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

K1 = 1.2
B = 0.75
WS_TOKEN_RE = r"\S+"


def _token_matrix(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """text column → (flat token array, row offsets, row token counts);
    tokens are the ``\\S+`` runs (split on whitespace, empties dropped
    per row via list_filter semantics)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.split_pattern_regex(pc.fill_null(col, ""), r"\s+")
    flat = pc.list_flatten(words)
    lens_all = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    # empties from leading/trailing whitespace: mask them out of both
    # the flat array and the per-row counts
    nonempty = pc.not_equal(flat, "")
    ne_np = nonempty.to_numpy(zero_copy_only=False)
    offsets_all = np.zeros(len(lens_all) + 1, dtype=np.int64)
    np.cumsum(lens_all, out=offsets_all[1:])
    counts = _segment_sum(ne_np.astype(np.int64), offsets_all)
    return flat, offsets_all, counts


def _segment_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums of a flat array segmented by ``offsets`` — cumsum
    difference, exact for empty segments in ANY position (the clamped
    reduceat variant corrupts the final non-empty row when empty rows
    trail the batch)."""
    csum = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum(values, out=csum[1:])
    return csum[offsets[1:]] - csum[offsets[:-1]]


def _term_tf(flat, offsets_all, term: str) -> np.ndarray:
    eq = pc.equal(flat, term).to_numpy(zero_copy_only=False).astype(np.int64)
    return _segment_sum(eq, offsets_all)


def corpus_stats(
    ds: ray.data.Dataset, terms: list[str], *, text_col: str = "text"
) -> dict:
    """One streaming pass → {n_docs, total_tokens, df: {term: n}}."""

    def partial(b: pa.Table) -> pa.Table:
        flat, off, counts = _token_matrix(b[text_col])
        row = {
            "n_docs": [len(b)],
            "total_tokens": [int(counts.sum())],
        }
        for i, term in enumerate(terms):
            row[f"df_{i}"] = [int((_term_tf(flat, off, term) > 0).sum())]
        return pa.table(row)

    cols = ["n_docs", "total_tokens"] + [f"df_{i}" for i in range(len(terms))]
    totals = {c: 0 for c in cols}
    # the partials are |terms|+2 ints per BLOCK — the driver-side fold is
    # block-count-proportional only
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for c in cols:
            totals[c] += int(pc.sum(batch[c]).as_py() or 0)
    return {
        "n_docs": totals["n_docs"],
        "total_tokens": totals["total_tokens"],
        "df": {t: totals[f"df_{i}"] for i, t in enumerate(terms)},
    }


def tf_pairs(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """One batch → exact per-document term frequencies as (doc_id, word,
    tf, __part) rows, ONE row per (doc, word).  Word routing key
    ``__part`` is a stable word hash so every occurrence of a word lands
    in the same shuffle partition — where its document frequency is then
    simply its row count (documents are one row each, so (doc, word)
    rows are already unique)."""
    import pandas as pd

    from docling_api_ray.stages.common import shuffle_partitions

    flat, off, _counts = _token_matrix(batch[text_col])
    words_np = flat.to_numpy(zero_copy_only=False)
    row_ids = np.repeat(np.arange(len(batch), dtype=np.int64), np.diff(off))
    mask = words_np != ""
    df = pd.DataFrame({"r": row_ids[mask], "word": words_np[mask]})
    g = df.groupby(["r", "word"], sort=False).size().reset_index(name="tf")
    doc_col = batch[id_col].combine_chunks() if isinstance(
        batch[id_col], pa.ChunkedArray
    ) else batch[id_col]
    h = pd.util.hash_array(g["word"].to_numpy(dtype=object)).astype(np.int64)
    return pa.table(
        {
            id_col: doc_col.take(pa.array(g["r"].to_numpy())),
            "word": pa.array(g["word"].tolist(), type=pa.string()),
            "tf": pa.array(g["tf"].to_numpy(), type=pa.int64()),
            "__part": pa.array(
                np.abs(h) % shuffle_partitions(), type=pa.int64()
            ),
        }
    )


def tfidf_topterms(
    ds: ray.data.Dataset,
    *,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document TF-IDF top-k terms over the OPEN vocabulary — the
    keyword/topic-signature extractor of a training-data pipeline.

    Scale shape (two exchanges, both with the cheapest possible payload):

    1. **word-hash exchange** of (doc_id, word, tf) — one row per
       (doc, word), i.e. the tf-compressed corpus, NOT the token stream.
       Inside each word-hash partition the document frequency of every
       word routed there is exact and free: df = the word's row count
       (rows are unique per (doc, word)).  idf = ln((1+N)/(1+df)),
       score = quantize6(tf·idf), then a per-(partition, doc) top-k head
       is taken — a valid superset filter for the global per-doc top-k
       (if x is in doc d's global top-k, at most k-1 words of d beat it
       anywhere, so at most k-1 beat it inside x's own partition).
    2. **doc-hash exchange of the heads only** — ≤ k rows per
       (doc, word-partition), corpus-length-independent per doc — merged
       to the final per-doc top-k.

    No vocabulary-proportional or corpus-proportional state ever
    concentrates in one block (the VERDICT-r2 vocab_topk lesson).
    Quantization happens BEFORE ranking on both engine and oracle sides
    so tie-breaks (score desc, word asc) agree bit-exactly."""
    import pandas as pd

    from docling_api_ray.stages.common import (
        coalesce_narrow,
        shuffle_partitions,
    )
    from docling_api_ray.stages.windows import quantize6_np

    n_docs = ds.count()

    def score_fold(df: "pd.DataFrame") -> pa.Table:
        dfreq = df.groupby("word", sort=False)["word"].transform("size")
        idf = np.log((1.0 + n_docs) / (1.0 + dfreq.to_numpy(np.float64)))
        score = quantize6_np(df["tf"].to_numpy(np.float64) * idf)
        out = pd.DataFrame(
            {id_col: df[id_col].values, "word": df["word"].values, "score": score}
        )
        out = out.sort_values(
            [id_col, "score", "word"],
            ascending=[True, False, True],
            kind="stable",
        )
        head = out.groupby(id_col, sort=False).head(k)
        p2 = pd.util.hash_array(head[id_col].to_numpy()).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(head[id_col].to_numpy()),
                "word": pa.array(head["word"].tolist(), type=pa.string()),
                "score": pa.array(head["score"].to_numpy(), type=pa.float64()),
                "__p2": pa.array(
                    np.abs(p2) % shuffle_partitions(), type=pa.int64()
                ),
            }
        )

    def final_fold(df: "pd.DataFrame") -> pa.Table:
        out = df.sort_values(
            [id_col, "score", "word"],
            ascending=[True, False, True],
            kind="stable",
        )
        head = out.groupby(id_col, sort=False).head(k)
        return pa.table(
            {
                id_col: pa.array(head[id_col].to_numpy()),
                "word": pa.array(head["word"].tolist(), type=pa.string()),
                "score": pa.array(head["score"].to_numpy(), type=pa.float64()),
            }
        )

    pairs = ds.map_batches(
        lambda b: tf_pairs(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )
    from docling_api_ray.stages.common import coalesce_narrow

    heads = coalesce_narrow(pairs).groupby("__part").map_groups(
        score_fold, batch_format="pandas"
    )
    return (
        coalesce_narrow(heads)
        .groupby("__p2")
        .map_groups(final_fold, batch_format="pandas")
    )


def bm25_scores(
    ds: ray.data.Dataset,
    terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: dict | None = None,
) -> ray.data.Dataset:
    """documents → (doc_id, score) BM25 against ``terms``.  ``stats``
    may be precomputed (e.g. scoring many queries against one corpus);
    otherwise one stats pass runs first."""
    if stats is None:
        stats = corpus_stats(ds, terms, text_col=text_col)
    n_docs = max(1, stats["n_docs"])
    avgdl = stats["total_tokens"] / n_docs
    idf = [
        float(np.log(1.0 + (n_docs - stats["df"][t] + 0.5) / (stats["df"][t] + 0.5)))
        for t in terms
    ]
    ref = ray.put((list(terms), idf, avgdl))

    def score(b: pa.Table) -> pa.Table:
        terms_, idf_, avgdl_ = ray.get(ref)
        flat, off, counts = _token_matrix(b[text_col])
        dl = counts.astype(np.float64)
        norm = K1 * (1.0 - B + (B * dl) / avgdl_)
        total = np.zeros(len(b), dtype=np.float64)
        # FIXED summation order (query-term order) — the oracle spells
        # the same additions in the same order, so the float result is
        # identical
        for term, w in zip(terms_, idf_):
            tf = _term_tf(flat, off, term).astype(np.float64)
            total = total + (w * (tf * (K1 + 1.0))) / (tf + norm)
        return pa.table(
            {
                id_col: b[id_col],
                "score": pa.array(
                    np.rint(total * 1e6) / 1e6, type=pa.float64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")

RRF_C = 60  # the standard reciprocal-rank-fusion constant (Cormack 2009)


def _two_rankings(
    docs: ray.data.Dataset,
    emb: ray.data.Dataset,
    terms: list[str],
    query_id: int,
    query_vec: np.ndarray,
    *,
    k_each: int,
    id_col: str = "doc_id",
) -> tuple[dict[int, int], dict[int, int]]:
    """The shared sparse+dense retrieval tail of ``hybrid_rrf`` /
    ``rank_rbo``: the BM25 lexical top-``k_each`` (per-block partial
    heads, one ≤ k_each·P-row single-partition merge) and the
    embedding-cosine top-``k_each`` (knn_bruteforce's partial-top-k
    discipline), each returned as an id → 1-based-rank dict.  Tie
    order matches the SQL mirrors: (score DESC, id ASC)."""
    from docling_api_ray.stages.similarity import knn_bruteforce

    lex = bm25_scores(docs, terms, id_col=id_col)
    lex_schema = pa.schema([(id_col, pa.int64()), ("score", pa.float64())])

    def head(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return lex_schema.empty_table()
        ids = np.asarray(b[id_col], dtype=np.int64)
        sc = np.asarray(b["score"], dtype=np.float64)
        order = np.lexsort((ids, -sc))[:k_each]
        return pa.table(
            {
                id_col: pa.array(ids[order], type=pa.int64()),
                "score": pa.array(sc[order], type=pa.float64()),
            }
        )

    # per-block heads shrink the merge input to ≤ k_each·P rows; the
    # single-partition merge is the bounded final head (take_all ≤ k_each)
    lex_top = (
        lex.map_batches(head, batch_format="pyarrow")
        .repartition(1)
        # batch_size=None: the merge head must see the WHOLE single
        # partition at once — Ray's default 1024-row batching would apply
        # the head per-chunk once the partial heads exceed 1024 rows
        # (> ~10 upstream blocks), leaving lex_top unsorted/untruncated
        # and corrupting the enumerate-based bm25_rank.
        .map_batches(head, batch_format="pyarrow", batch_size=None)
        .take_all()
    )

    vec_top = knn_bruteforce(
        emb, [int(query_id)], np.asarray(query_vec, dtype=np.float64)[None, :],
        k=k_each,
    ).take_all()  # ≤ k_each rows by construction

    bm25_rank = {int(r[id_col]): i + 1 for i, r in enumerate(lex_top)}
    cos_rank = {int(r["vec_id"]): int(r["rank"]) for r in vec_top}
    return bm25_rank, cos_rank


# exact binary weights w_d = (1-p)·p^(d-1) at p=1/2: every power of two
# is exactly representable, so the engine float and the SQL literal
# (shortest repr round-trips) are the SAME double — no libm pow() in
# either path
RBO_P = 0.5


def rank_rbo(
    docs: ray.data.Dataset,
    emb: ray.data.Dataset,
    terms: list[str],
    query_id: int,
    query_vec: np.ndarray,
    *,
    k: int = 100,
    id_col: str = "doc_id",
) -> pa.Table:
    """Rank-Biased Overlap (truncated, Webber et al. 2010) between the
    BM25 lexical ranking and the embedding-cosine ranking for one
    query — "do sparse and dense retrieval agree?", the
    retrieval-drift monitor next to hybrid_rrf's fusion.

    RBO@k = Σ_{d=1..k} (|A_:d ∩ B_:d| / d) · (1−p)·p^(d−1) with p=1/2
    (top-weighted: depth-d agreement is worth half depth-(d−1)).  Both
    lists are k-bounded end to end (the _two_rankings tail); the
    overlap curve is O(k) driver work on 2k ids.  Exactness: each
    depth's term is micro-quantized (round(term·1e12)) to an int64
    before the order-free sum, and the p=1/2 weights are exact binary
    doubles the SQL mirror inlines as literals — no pow() divergence.
    Output: (k, overlap_at_k, rbo)."""
    bm25_rank, cos_rank = _two_rankings(
        docs, emb, terms, query_id, query_vec, k_each=k, id_col=id_col
    )
    a_order = [d for d, _ in sorted(bm25_rank.items(), key=lambda kv: kv[1])]
    b_order = [d for d, _ in sorted(cos_rank.items(), key=lambda kv: kv[1])]
    seen_a: set[int] = set()
    seen_b: set[int] = set()
    overlap = 0
    total_micro = 0
    x_last = 0
    for d in range(1, k + 1):
        if d <= len(a_order):
            da = a_order[d - 1]
            if da in seen_b:
                overlap += 1
            seen_a.add(da)
        if d <= len(b_order):
            db = b_order[d - 1]
            # membership against A_:d (a_d already added) covers the
            # a_d == b_d case exactly once; a_d-vs-earlier-b was counted
            # by the first check, so no depth double-counts either way
            # (property-verified against the brute-force set overlap)
            if db in seen_a:
                overlap += 1
            seen_b.add(db)
        x_last = overlap
        w = RBO_P**d  # (1-p)·p^(d-1) at p=1/2
        total_micro += int(
            math.floor((overlap / d) * w * 1e12 + 0.5)
        )
    rbo = float(total_micro) / 1e12
    return pa.table(
        {
            "k": pa.array([k], type=pa.int64()),
            "overlap_at_k": pa.array([x_last], type=pa.int64()),
            "rbo": pa.array([rbo], type=pa.float64()),
        }
    )


def hybrid_rrf(
    docs: ray.data.Dataset,
    emb: ray.data.Dataset,
    terms: list[str],
    query_id: int,
    query_vec: np.ndarray,
    *,
    k_each: int = 100,
    k_out: int = 20,
    c: int = RRF_C,
    id_col: str = "doc_id",
) -> pa.Table:
    """Hybrid retrieval: BM25 lexical ranks ⊕ embedding-cosine ranks,
    fused by Reciprocal Rank Fusion — the standard two-tower RAG
    retrieval shape (sparse + dense lists each truncated to ``k_each``,
    rrf(d) = Σ_lists∋d 1/(c + rank_list(d))).

    Scale shape: both lists are k-bounded end to end.  The lexical side
    is one streaming BM25 pass (|terms|+2-number stats fold, broadcast,
    stateless score) followed by per-batch partial heads (≤ k_each rows
    per block) and ONE single-partition merge of ≤ k_each·P rows; the
    dense side is the knn_bruteforce partial-top-k discipline against a
    broadcast 1×D query.  Fusion touches only 2·k_each rows — no join,
    no corpus movement beyond the two scoring passes.

    Exactness: ranks are integers; the fused score is kept in integer
    micro-units, ``rrf_micro = Σ floor(1e6/(c+rank) + 0.5)`` — the same
    floor-quantize the DuckDB mirror spells, so ties and ordering are
    bit-reproducible (no float summation-order dependence).  Docs
    missing from a list contribute 0 and surface that list's rank as
    the -1 sentinel.  Output: the fused top ``k_out`` as
    (doc_id, bm25_rank, cos_rank, rrf_micro)."""
    import math

    bm25_rank, cos_rank = _two_rankings(
        docs, emb, terms, query_id, query_vec, k_each=k_each, id_col=id_col
    )
    fused: dict[int, int] = {}
    for d, r in bm25_rank.items():
        fused[d] = fused.get(d, 0) + math.floor(1e6 / (c + r) + 0.5)
    for d, r in cos_rank.items():
        fused[d] = fused.get(d, 0) + math.floor(1e6 / (c + r) + 0.5)
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k_out]
    return pa.table(
        {
            id_col: pa.array([d for d, _ in top], type=pa.int64()),
            "bm25_rank": pa.array(
                [bm25_rank.get(d, -1) for d, _ in top], type=pa.int64()
            ),
            "cos_rank": pa.array(
                [cos_rank.get(d, -1) for d, _ in top], type=pa.int64()
            ),
            "rrf_micro": pa.array([s for _, s in top], type=pa.int64()),
        }
    )
