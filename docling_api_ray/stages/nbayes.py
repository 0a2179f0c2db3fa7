"""Multinomial Naive Bayes over a bounded top-V vocabulary — the
classic closed-form text classifier a curation pipeline trains on its
own labels (language, source, quality bucket) to score new data
(reference semantics: the fastText-style lang/quality scorer slot;
cf. zenzen-sol/docling-api README.md quality pipeline positioning —
the reference delegates model scoring to pinned deps, the slot here is
the distributed training + scoring shape).

Why top-V: restricting features to the global top-V words makes the
model EXACTLY (V+1)×|labels| integer cells regardless of corpus size —
the broadcast-side is bounded by construction, so scoring is a
stateless streaming pass at any scale (the open-vocabulary variant
would hash-join exploded (doc, word) rows against a distributed model
table; V-bounded is the standard production trade-off).

Exactness: training reduces each batch to integer (word_idx, label,
count) rows folded through ``bounded_groupby_sum`` (domain ≤
(V+1)·|labels|); the model stores integer micro-log-probs
ilog = ⌊ln((c+1)/(tot_l+V))·1e6 + 0.5⌋ (Laplace over the V-word grid —
unseen cells count 0) and priors ⌊ln(n_l/N)·1e6 + 0.5⌋.  Per-doc
scores are pure int64 dot products (order-free), argmax ties break by
label asc — every step SQL-reproducible op-for-op."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from docling_api_ray.stages.common import bounded_groupby_sum

_COUNT_SCHEMA = pa.schema(
    [("word_idx", pa.int64()), ("label", pa.string()), ("c", pa.int64())]
)

_CONF_SCHEMA = pa.schema(
    [("lang", pa.string()), ("pred", pa.string()), ("n", pa.int64())]
)


def _token_vocab_counts(
    col, vocab_sorted: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """text column → (row index, vocab index) for every in-vocab token;
    single-space tokenization (the ``word_counts`` convention), empties
    dropped, OOV tokens dropped."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.split_pattern(pc.fill_null(col, ""), " ")
    flat = pc.list_flatten(words)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    toks = np.asarray(flat, dtype=object)
    keep = toks != ""
    rows, toks = rows[keep], toks[keep]
    if len(toks) == 0 or len(vocab_sorted) == 0:
        # no tokens, or an empty vocabulary (every token OOV)
        return rows[:0], np.zeros(0, dtype=np.int64)
    pos = np.searchsorted(vocab_sorted, toks)
    pos_c = np.clip(pos, 0, len(vocab_sorted) - 1)
    hit = vocab_sorted[pos_c] == toks
    return rows[hit], pos_c[hit]


def train_naive_bayes(
    ds: ray.data.Dataset,
    vocab: list[str],
    *,
    label_col: str = "lang",
    text_col: str = "text",
) -> dict:
    """One streaming pass → the bounded NB model dict:
    ``labels`` (sorted asc), ``vocab_sorted``, int64 ``ilog`` matrix
    (V×L) and ``iprior`` (L).  Only (V+1)·|labels| integer rows ever
    reach the driver."""
    vocab_sorted = np.sort(np.asarray(vocab, dtype=object))
    V = len(vocab_sorted)
    vref = ray.put(vocab_sorted)

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _COUNT_SCHEMA.empty_table()
        vs = ray.get(vref)
        rows, vidx = _token_vocab_counts(b[text_col], vs)
        labels = np.asarray(b[label_col].to_pylist(), dtype=object)
        uniq, linv = np.unique(labels, return_inverse=True)
        L = len(uniq)
        # (word, label) counts via one composite bincount
        key = vidx * L + linv[rows]
        cnt = np.bincount(key, minlength=V * L)
        nz = np.nonzero(cnt)[0]
        out_idx = (nz // L).astype(np.int64)
        out_lab = uniq[nz % L]
        out_c = cnt[nz].astype(np.int64)
        # doc-count rows under the -1 sentinel (prior numerator)
        ndoc = np.bincount(linv, minlength=L).astype(np.int64)
        return pa.table(
            {
                "word_idx": pa.array(
                    np.concatenate([out_idx, np.full(L, -1, np.int64)])
                ),
                "label": pa.array(
                    np.concatenate([out_lab, uniq]).tolist(),
                    type=pa.string(),
                ),
                "c": pa.array(np.concatenate([out_c, ndoc])),
            }
        )

    folded = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["word_idx", "label"],
        sum_cols={"c": "c"},
    ).take_all()  # ≤ (V+1)·|labels| rows by construction

    labels = sorted({r["label"] for r in folded})
    lab_of = {l: i for i, l in enumerate(labels)}
    L = len(labels)
    counts = np.zeros((V, L), dtype=np.int64)
    ndocs = np.zeros(L, dtype=np.int64)
    for r in folded:
        if r["word_idx"] < 0:
            ndocs[lab_of[r["label"]]] += int(r["c"])
        else:
            counts[int(r["word_idx"]), lab_of[r["label"]]] += int(r["c"])
    tot = counts.sum(axis=0)
    n_total = int(ndocs.sum())
    ilog = np.empty((V, L), dtype=np.int64)
    for li in range(L):
        for vi in range(V):
            p = (counts[vi, li] + 1.0) / (float(tot[li]) + float(V))
            ilog[vi, li] = math.floor(math.log(p) * 1e6 + 0.5)
    iprior = np.array(
        [
            math.floor(math.log(float(n) / float(n_total)) * 1e6 + 0.5)
            for n in ndocs
        ],
        dtype=np.int64,
    )
    return {
        "labels": labels,
        "vocab_sorted": vocab_sorted,
        "ilog": ilog,
        "iprior": iprior,
    }


def naive_bayes_confusion(
    ds: ray.data.Dataset,
    model: dict,
    *,
    label_col: str = "lang",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Score every document with the broadcast model and fold the
    (true label, predicted label) confusion counts — a |labels|²-bounded
    aggregate.  Scores are int64 dot products counts@ilog + prior;
    argmax ties break by label asc (labels stored sorted, first max
    wins)."""
    mref = ray.put(
        (
            model["vocab_sorted"],
            np.asarray(model["labels"], dtype=object),
            model["ilog"],
            model["iprior"],
        )
    )

    def score(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _CONF_SCHEMA.empty_table()
        vs, labels, ilog, iprior = ray.get(mref)
        V, L = ilog.shape
        rows, vidx = _token_vocab_counts(b[text_col], vs)
        nb = len(b)
        cnt = np.bincount(rows * V + vidx, minlength=nb * V).reshape(
            nb, V
        ).astype(np.int64)
        scores = cnt @ ilog + iprior[None, :]  # int64-exact
        p_idx = np.argmax(scores, axis=1)  # first max = label asc
        true = np.asarray(b[label_col].to_pylist(), dtype=object)
        # true labels are a subset of the trained labels (the model is
        # trained on this corpus); composite integer bincount folds the
        # batch to ≤ L² confusion rows
        t_idx = np.searchsorted(labels, true)
        cnt2 = np.bincount(t_idx * L + p_idx, minlength=L * L)
        nz = np.nonzero(cnt2)[0]
        return pa.table(
            {
                "lang": pa.array(labels[nz // L].tolist(), type=pa.string()),
                "pred": pa.array(labels[nz % L].tolist(), type=pa.string()),
                "n": pa.array(cnt2[nz].astype(np.int64)),
            }
        )

    return bounded_groupby_sum(
        ds.map_batches(score, batch_format="pyarrow"),
        ["lang", "pred"],
        sum_cols={"n": "n"},
    )
