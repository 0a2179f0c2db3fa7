"""Multinomial NB over a bounded vocab: model math, tie/prior rules."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from docling_api_ray.stages.nbayes import (
    naive_bayes_confusion,
    train_naive_bayes,
)


def _corpus():
    rows = [
        # lang a: speaks "foo bar"; lang b: speaks "baz qux"
        ("a", "foo bar foo"),
        ("a", "foo foo bar bar"),
        ("a", "bar foo"),
        ("b", "baz qux baz"),
        ("b", "qux qux baz"),
        # an all-OOV doc in the minority lang: prior must decide
        ("b", "zzz yyy"),
    ]
    return pa.table(
        {
            "doc_id": list(range(len(rows))),
            "lang": [r[0] for r in rows],
            "text": [r[1] for r in rows],
        }
    )


def test_nbayes_model_math_and_confusion():
    tbl = _corpus()
    ds = ray.data.from_arrow(tbl).repartition(3)
    vocab = ["foo", "bar", "baz", "qux"]  # "zzz"/"yyy" stay OOV
    model = train_naive_bayes(ds, vocab)
    assert model["labels"] == ["a", "b"]
    V = 4
    # hand counts: lang a: foo 5, bar 4 (tot 9); lang b: baz 3, qux 3 (tot 6)
    expect = {
        ("foo", "a"): 5, ("bar", "a"): 4, ("baz", "a"): 0, ("qux", "a"): 0,
        ("foo", "b"): 0, ("bar", "b"): 0, ("baz", "b"): 3, ("qux", "b"): 3,
    }
    tot = {"a": 9, "b": 6}
    vs = model["vocab_sorted"].tolist()
    for (w, l), c in expect.items():
        ilog = model["ilog"][vs.index(w), model["labels"].index(l)]
        want = math.floor(
            math.log((c + 1.0) / (tot[l] + float(V))) * 1e6 + 0.5
        )
        assert ilog == want, (w, l)
    # priors: 3/6 each
    assert model["iprior"].tolist() == [
        math.floor(math.log(0.5) * 1e6 + 0.5)
    ] * 2
    conf = {
        (r["lang"], r["pred"]): r["n"]
        for r in naive_bayes_confusion(ds, model).take_all()
    }
    # separable vocab -> perfect diagonal except the OOV doc, which gets
    # the PRIOR argmax: equal priors -> tie -> label asc -> "a"
    assert conf[("a", "a")] == 3
    assert conf[("b", "b")] == 2
    assert conf[("b", "a")] == 1  # the OOV doc
    assert ("a", "b") not in conf


def test_nbayes_partition_independence():
    tbl = _corpus()
    vocab = ["foo", "bar", "baz", "qux"]
    outs = []
    for parts in (1, 2, 5):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        model = train_naive_bayes(ds, vocab)
        conf = sorted(
            (r["lang"], r["pred"], r["n"])
            for r in naive_bayes_confusion(ds, model).take_all()
        )
        outs.append((model["ilog"].tolist(), model["iprior"].tolist(), conf))
    assert outs[0] == outs[1] == outs[2]
