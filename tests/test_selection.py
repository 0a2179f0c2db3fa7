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
