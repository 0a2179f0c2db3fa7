"""Exact float-quantile selection (stages/selection.py) — distributed
quickselect via deterministic bracket refinement."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray

from docling_api_ray.stages.selection import quantile_select


def _ds(vals, nulls=0):
    arr = list(vals) + [None] * nulls
    return ray.data.from_arrow(
        pa.table({"x": pa.array(arr, type=pa.float64())})
    ).repartition(8)


def _expect(vals, q):
    s = np.sort(np.asarray(vals, dtype=np.float64))
    return float(s[max(1, math.ceil(q * len(s))) - 1])


QS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _check(vals, **kw):
    out = quantile_select(_ds(vals), value_col="x", quantiles=QS, **kw)
    got = {r["q"]: r["value"] for r in out.to_pylist()}
    for q in QS:
        assert got[q] == _expect(vals, q), (q, got[q], _expect(vals, q))


def test_matches_rank_rule_random():
    vals = np.random.RandomState(11).randn(5000) * 37.5
    _check(vals)


def test_multi_round_refinement_forced():
    """bins=4 + collect_threshold=1 forces many refinement rounds and a
    tiny final collect — every bracket-edge handoff must stay exact."""
    vals = np.random.RandomState(5).uniform(-1000, 1000, 3000)
    _check(vals, bins=4, collect_threshold=1)


def test_edge_aligned_values():
    """Integer-valued floats land exactly ON linspace cell edges — the
    half-open bracket rule must count each value exactly once."""
    vals = np.repeat(np.arange(101, dtype=np.float64), 7)
    _check(vals, bins=10, collect_threshold=5)


def test_massive_ties_resolve_by_count():
    """A two-value column with huge tie blocks can never shrink a
    bracket below the threshold — the count-based tie path must resolve
    it without collecting the ties."""
    vals = np.array([1.5] * 9000 + [2.5] * 1000)
    _check(vals, bins=8, collect_threshold=10)


def test_constant_column():
    out = quantile_select(
        _ds([42.0] * 1000), value_col="x", quantiles=(0.5, 0.99)
    )
    assert [r["value"] for r in out.to_pylist()] == [42.0, 42.0]


def test_nulls_and_nans_excluded():
    vals = [1.0, 2.0, 3.0, 4.0, float("nan"), float("nan")]
    ds = _ds(vals, nulls=3)
    out = quantile_select(ds, value_col="x", quantiles=(0.5, 1.0))
    got = {r["q"]: r["value"] for r in out.to_pylist()}
    assert got[0.5] == 2.0  # ceil(0.5*4)=2nd of [1,2,3,4]
    assert got[1.0] == 4.0


def test_empty_input():
    out = quantile_select(
        _ds([], nulls=4), value_col="x", quantiles=(0.5,)
    )
    assert out.num_rows == 0


def test_matches_duckdb_quantile_disc():
    import duckdb

    vals = np.random.RandomState(3).exponential(10.0, 2500)
    out = quantile_select(_ds(vals), value_col="x", quantiles=QS)
    got = {r["q"]: r["value"] for r in out.to_pylist()}
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(vals, pa.float64())}))
    for q in QS:
        (exp,) = con.execute(
            f"SELECT quantile_disc(x, {q}) FROM t"
        ).fetchone()
        assert got[q] == exp, (q, got[q], exp)


# ---------------------------------------------------------------------------
# grouped exact selection
# ---------------------------------------------------------------------------

from docling_api_ray.stages.selection import grouped_quantile_select


def _gds(keys, vals):
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(list(keys), type=pa.string()),
                "x": pa.array(list(vals), type=pa.float64()),
            }
        )
    ).repartition(8)


def _gcheck(keys, vals, qs=(0.25, 0.5, 0.9), **kw):
    out = grouped_quantile_select(
        _gds(keys, vals), key_col="k", value_col="x", quantiles=qs, **kw
    )
    got = {(r["k"], r["q"]): r["value"] for r in out.to_pylist()}
    keys = np.asarray(keys, dtype=object)
    vals = np.asarray(vals, dtype=np.float64)
    for k in sorted(set(keys)):
        kv = vals[keys == k]
        kv = kv[~np.isnan(kv)]
        for q in qs:
            assert got[(k, q)] == _expect(kv, q), (k, q)


def test_grouped_matches_rank_rule_random():
    rng = np.random.RandomState(3)
    keys = rng.choice(["a", "b", "c", "d", "e"], 6000)
    vals = rng.randn(6000) * 11.0
    _gcheck(keys, vals)


def test_grouped_multi_round_and_skewed_groups():
    """One giant group + one tiny group + one constant group, with
    bins=4 / collect_threshold=1 forcing deep shared refinement."""
    rng = np.random.RandomState(9)
    keys = ["big"] * 4000 + ["tiny"] * 3 + ["const"] * 500
    vals = np.concatenate(
        [rng.uniform(-500, 500, 4000), [7.0, -1.0, 3.5], np.full(500, 42.0)]
    )
    _gcheck(keys, vals, bins=4, collect_threshold=1)


def test_grouped_ties_and_nans():
    keys = ["a"] * 5000 + ["b"] * 100
    vals = np.array([1.5] * 4500 + [2.5] * 500 + list(range(100)), dtype=np.float64)
    vals[7] = np.nan  # excluded from group a's n
    out = grouped_quantile_select(
        _gds(keys, vals), key_col="k", value_col="x",
        quantiles=(0.5, 0.99), collect_threshold=10,
    )
    got = {(r["k"], r["q"]): r["value"] for r in out.to_pylist()}
    a = vals[:5000]
    a = a[~np.isnan(a)]
    assert got[("a", 0.5)] == _expect(a, 0.5)
    assert got[("a", 0.99)] == _expect(a, 0.99)
    assert got[("b", 0.5)] == _expect(vals[5000:], 0.5)


def test_grouped_bracket_bound_enforced():
    # the guard fires INSIDE the fold task (before anything unbounded
    # can concentrate), so it surfaces as a wrapped Ray task error
    with pytest.raises(Exception, match="max_brackets"):
        grouped_quantile_select(
            _gds(["a", "b"], [1.0, 2.0]), key_col="k", value_col="x",
            quantiles=(0.5,), max_brackets=1,
        )


def test_grouped_matches_duckdb_quantile_disc():
    import duckdb
    import pandas as pd

    rng = np.random.RandomState(17)
    df = pd.DataFrame(
        {
            "k": rng.choice(["x", "y", "z"], 4000),
            "x": np.round(rng.randn(4000), 6),
        }
    )
    out = grouped_quantile_select(
        ray.data.from_pandas(df).repartition(8),
        key_col="k", value_col="x", quantiles=(0.25, 0.5, 0.9),
        collect_threshold=50,
    )
    got = {(r["k"], r["q"]): r["value"] for r in out.to_pylist()}
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        """
        SELECT k, 0.25 AS q, quantile_disc(x, 0.25) AS v FROM t GROUP BY k
        UNION ALL SELECT k, 0.5, quantile_disc(x, 0.5) FROM t GROUP BY k
        UNION ALL SELECT k, 0.9, quantile_disc(x, 0.9) FROM t GROUP BY k
        """
    ).fetchall()
    for k, q, v in exp:
        assert got[(k, float(q))] == float(v), (k, q)


def test_grouped_cogroup_matches_duckdb_percentile_disc():
    """Unbounded-key variant: one co-group exchange, per-partition
    vectorized k-th-element gather — exact percentile_disc per group,
    NaNs excluded, groups spread across partitions."""
    import duckdb
    import pandas as pd

    from docling_api_ray.stages.selection import grouped_quantile_cogroup

    rng = np.random.RandomState(23)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 300, 5000).astype(np.int64),
            "x": np.round(rng.randn(5000), 6),
        }
    )
    df.loc[5, "x"] = np.nan
    out = (
        grouped_quantile_cogroup(
            ray.data.from_pandas(df).repartition(8),
            key_col="k",
            value_col="x",
            quantiles=(0.25, 0.5, 0.9),
        )
        .to_pandas()
        .sort_values(["k", "q"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        """
        SELECT k, 0.25 AS q,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY x) AS v
        FROM t WHERE x IS NOT NULL AND NOT isnan(x) GROUP BY k
        UNION ALL
        SELECT k, 0.5, percentile_disc(0.5) WITHIN GROUP (ORDER BY x)
        FROM t WHERE x IS NOT NULL AND NOT isnan(x) GROUP BY k
        UNION ALL
        SELECT k, 0.9, percentile_disc(0.9) WITHIN GROUP (ORDER BY x)
        FROM t WHERE x IS NOT NULL AND NOT isnan(x) GROUP BY k
        ORDER BY k, q
        """
    ).df()
    assert len(out) == len(exp) == 300 * 3
    assert (out["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (out["value"].to_numpy() == exp["v"].to_numpy()).all()


def test_grouped_select_survives_empty_and_all_nan_blocks():
    """Review r4 regression: a dataset containing an empty block or an
    all-NaN block must not crash the shared tie/histogram/collect
    passes (the per-batch group-values kernel sees zero valid rows)."""
    t1 = pa.table(
        {
            "k": pa.array(["a"] * 2000 + ["b"] * 2000, type=pa.string()),
            "x": pa.array(
                list(np.linspace(0, 1, 2000)) + [np.nan] * 2000,
                type=pa.float64(),
            ),
        }
    )
    empty = pa.schema(
        [("k", pa.string()), ("x", pa.float64())]
    ).empty_table()
    ds = ray.data.from_arrow([t1, empty]).repartition(6)
    from docling_api_ray.stages.selection import grouped_quantile_select

    out = grouped_quantile_select(
        ds, key_col="k", value_col="x", quantiles=(0.5,),
        collect_threshold=100,
    )
    got = {(r["k"], r["q"]): r["value"] for r in out.to_pylist()}
    vals = np.linspace(0, 1, 2000)
    assert got[("a", 0.5)] == _expect(vals, 0.5)
    # group b contributed no valid values -> it must simply be absent
    assert set(k for k, _ in got) == {"a"}


def test_skyline_max2_duplicates_and_dominance():
    """Exact-duplicate frontier points all survive; >=/> dominance
    drops interior points; fold is exercised across partitions."""
    import pandas as pd
    import ray.data

    from docling_api_ray.stages.selection import skyline_max2

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "x": [12, 10, 10, 9, 10, 12, 15],
            "y": [0.5, 1.0, 1.0, 0.9, 0.9, 0.4, 0.2],
        }
    )
    out = skyline_max2(
        ray.data.from_pandas(df).repartition(4),
        x_col="x",
        y_col="y",
    ).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3, 7]


def test_winsorize_column_matches_numpy_and_handles_empty():
    """Clip thresholds are the exact quantile_disc values; clipped
    output equals a one-shot numpy reference; empty input passes
    through typed."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.selection import (
        quantile_select,
        winsorize_column,
    )

    rng = np.random.default_rng(9)
    vals = np.round(rng.normal(size=2_000), 6)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(vals), dtype=np.int64)),
                "v": pa.array(vals, type=pa.float64()),
            }
        )
    ).repartition(8)
    out = {
        int(r["doc_id"]): float(r["v_w"])
        for r in winsorize_column(
            ds, value_col="v", lo_q=0.1, hi_q=0.9
        ).take_all()
    }
    th = {
        float(r["q"]): float(r["value"])
        for r in quantile_select(
            ray.data.from_arrow(
                pa.table({"v": pa.array(vals, type=pa.float64())})
            ),
            value_col="v",
            quantiles=(0.1, 0.9),
        ).to_pylist()
    }
    ref = np.clip(vals, th[0.1], th[0.9])
    assert out == {i: float(ref[i]) for i in range(len(vals))}
    # every clipped value sits inside the band; clipping actually fired
    assert min(out.values()) == th[0.1] and max(out.values()) == th[0.9]

    empty = ray.data.from_arrow(
        pa.schema([("doc_id", pa.int64()), ("v", pa.float64())]).empty_table()
    )
    res = winsorize_column(empty, value_col="v")
    assert res.count() == 0


def test_token_budget_select_boundary_semantics():
    """Hand-checkable admission: whole layers above the boundary score,
    id-ascending prefix inside it, first overflow ends admission; the
    degenerate budgets (0 and >= total) hit both edges."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.selection import token_budget_select

    # scores: layer 300 (docs 1,2 w 40+40), layer 200 (docs 3,4,5
    # w 30+50+10), layer 100 (doc 6 w 5)
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "score_micro": pa.array(
                [300, 300, 200, 200, 200, 100], type=pa.int64()
            ),
            "n_tokens": pa.array([40, 40, 30, 50, 10, 5], type=pa.int64()),
        }
    )
    mk = lambda: ray.data.from_arrow(tbl).repartition(3).materialize()

    # budget 120: layer 300 fits (80); layer 200 (90 total) does not ->
    # tie admission by id: doc 3 (30, cum 110), doc 4 (50 -> overflow,
    # STOP — doc 5 (10) would fit but the prefix rule excludes it)
    out = token_budget_select(mk(), budget=120).to_pydict()
    assert out == {
        "budget": [120],
        "n_selected": [3],
        "tokens_selected": [110],
        "threshold_micro": [200],
    }

    # budget >= total: everything, threshold = min score
    out = token_budget_select(mk(), budget=1_000).to_pydict()
    assert out == {
        "budget": [1000],
        "n_selected": [6],
        "tokens_selected": [175],
        "threshold_micro": [100],
    }

    # budget 0: nothing fits, threshold NULL
    out = token_budget_select(mk(), budget=0).to_pydict()
    assert out == {
        "budget": [0],
        "n_selected": [0],
        "tokens_selected": [0],
        "threshold_micro": [None],
    }

    # exact-fit boundary: budget 90 admits layer 300 (80) then doc 3
    # exactly to 110 > 90? no: 80 + 30 = 110 > 90 -> only layer 300
    out = token_budget_select(mk(), budget=90).to_pydict()
    assert out["n_selected"] == [2] and out["tokens_selected"] == [80]
    assert out["threshold_micro"] == [300]
