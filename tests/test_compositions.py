"""Partition-independence + sanity checks for the round-4 composition
queries (each is also oracle-verified at sf0.01 via
test_queries_oracle; these pin determinism across resharding at
sf0.001)."""

import pytest

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"


def _norm(obj):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        df = obj.to_pandas()
    elif isinstance(obj, pa.Table):
        df = obj.to_pandas()
    else:
        df = obj
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    [
        "cluster_profile",
        "length_quality_grid",
        "corpus_card",
        "knn_mrr",
        "cluster_topterms",
        "lang_agreement",
        "events_bursts",
        "rfm_segments",
        "user_event_diversity",
        "anova_eta2",
    ],
)
def test_composition_deterministic_rerun(name):
    q = E.queries()[name]
    a = _norm(q(SF))
    b = _norm(q(SF))
    import pandas.testing as pt

    pt.assert_frame_equal(a, b)
    assert len(a) > 0, name
