"""Empty-corpus robustness: stage operators must return typed empty
results (never crash, never emit schema-less blocks) when the input
dataset has zero rows — the shape of a filter that matched nothing."""

import numpy as np
import pyarrow as pa
import ray.data


def _empty_docs():
    return ray.data.from_arrow(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("source", pa.string()),
                ("lang", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ).empty_table()
    )


def _empty_events():
    return ray.data.from_arrow(
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("ts", pa.timestamp("us")),
                ("value", pa.float64()),
            ]
        ).empty_table()
    )


def test_doc_stages_empty():
    from docling_api_ray.stages.dedup import (
        exact_dedup,
        source_overlap,
        source_unique_share,
    )
    from docling_api_ray.stages.stats import (
        feature_corr,
        grouped_eta2,
        grouped_ols,
        grouped_weighted_quantiles,
    )

    docs = _empty_docs()
    assert exact_dedup(docs).count() == 0
    assert grouped_weighted_quantiles(
        docs, group_col="source", value_col="n_chars", weight_col="doc_id"
    ).count() == 0
    assert source_overlap(docs).count() == 0
    assert source_unique_share(docs).count() == 0
    assert grouped_ols(docs).count() == 0
    # scalar folds: defined empty/zero results rather than crashes
    fc = feature_corr(docs)
    assert fc.num_rows in (0, 6)
    eta = grouped_eta2(docs)
    assert eta["n_docs"][0].as_py() == 0


def test_event_stages_empty():
    from docling_api_ray.stages.windows import (
        event_path_counts,
        user_event_diversity,
    )

    ev = _empty_events()
    assert event_path_counts(ev).count() == 0
    assert user_event_diversity(ev).count() == 0


def test_decay_rfm_burst_empty():
    """ADVICE r4 (low): max_activity_day folded max() over an empty
    generator and crashed the decay-anchored stages on zero-row events;
    they must return typed empty results like every other stage here."""
    from docling_api_ray.stages.windows import (
        burst_days,
        max_activity_day,
        rfm_segments,
        user_decay_score,
    )

    ev = _empty_events()
    assert max_activity_day(ev) == 0
    assert user_decay_score(_empty_events()).count() == 0
    assert rfm_segments(_empty_events()).count() == 0
    assert burst_days(_empty_events()).num_rows == 0


def test_nbayes_empty_vocab_and_corpus():
    from docling_api_ray.stages.nbayes import (
        naive_bayes_confusion,
        train_naive_bayes,
    )

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2],
                "lang": ["a", "b"],
                "text": ["x y", "y z"],
            }
        )
    )
    # empty vocabulary: scoring falls back to priors everywhere
    model = train_naive_bayes(docs, [])
    conf = {
        (r["lang"], r["pred"]): r["n"]
        for r in naive_bayes_confusion(docs, model).take_all()
    }
    # equal priors -> tie -> label asc "a" predicted for both
    assert conf == {("a", "a"): 1, ("b", "a"): 1}


def test_round5_stage_ops_empty():
    from docling_api_ray.stages.dedup import (
        cdc_chunk_stats,
        winnow_pairs,
    )
    from docling_api_ray.stages.stats import kendall_tau_b
    from docling_api_ray.stages.text_analysis import winnow_fingerprints

    docs = _empty_docs()
    # winnowing tier: typed empty / zero-row outputs
    assert winnow_pairs(docs).count() == 0
    wf = winnow_fingerprints(
        pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string())]
        ).empty_table()
    )
    assert len(wf) == 0
    # CDC summary on an empty corpus: zero totals, NULL ratios
    c = cdc_chunk_stats(docs).to_pylist()[0]
    assert c["total_chunks"] == 0 and c["dedup_ratio"] is None
    # kendall over an empty projection
    empty_xy = ray.data.from_arrow(
        pa.schema([("x", pa.int64()), ("y", pa.int64())]).empty_table()
    )
    k = kendall_tau_b(empty_xy).to_pylist()[0]
    assert k["n"] == 0 and k["tau_b"] is None


def test_session_close_stage_ops_empty():
    from docling_api_ray.stages.dedup import boilerplate_strip
    from docling_api_ray.stages.editdist import rouge_l_pairs
    from docling_api_ray.stages.ngramlm import kneser_ney_scores
    from docling_api_ray.stages.stats import (
        grouped_welch,
        isotonic_calibration,
        poisson_bootstrap,
    )

    docs = _empty_docs()
    assert grouped_welch(docs).count() == 0
    assert poisson_bootstrap(docs).count() == 0
    assert kneser_ney_scores(docs).count() == 0
    assert rouge_l_pairs(docs).count() == 0
    assert boilerplate_strip(docs).count() == 0
    empty_scored = ray.data.from_arrow(
        pa.schema(
            [("prob_micro", pa.int64()), ("pos", pa.int64())]
        ).empty_table()
    )
    assert isotonic_calibration(empty_scored).count() == 0


def test_session_close_stage_ops_empty_2():
    from docling_api_ray.stages.clustering import label_centroid_dist
    from docling_api_ray.stages.stats import (
        conformal_gate,
        grouped_trimmed_mean,
        k_anonymity,
        l_diversity,
    )

    docs = _empty_docs()
    assert k_anonymity(docs).count() == 0
    assert l_diversity(docs).count() == 0
    assert grouped_trimmed_mean(docs).count() == 0
    empty_scored = ray.data.from_arrow(
        pa.schema(
            [
                ("prob_micro", pa.int64()),
                ("pos", pa.int64()),
                ("cal", pa.int64()),
            ]
        ).empty_table()
    )
    assert conformal_gate(empty_scored).count() == 0
    empty_emb = ray.data.from_arrow(
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ).empty_table()
    )
    assert label_centroid_dist(empty_emb).count() == 0
