"""KLL quantile sketch (stages/sketch.py): rank-error bounds against
exact order statistics, weight preservation, and agreement with the
exact distributed selection on the same column."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from docling_api_ray.stages.sketch import (
    KLL_EPS,
    kll_quantile_values,
    kll_rank_check,
    kll_sketch,
)

QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _rank_err(vals: np.ndarray, est: dict[float, float]) -> float:
    """Worst normalized rank error of the estimates: distance from the
    target rank ceil(q·n) to the estimate's true rank span."""
    sv = np.sort(vals)
    n = len(sv)
    worst = 0.0
    for q, v in est.items():
        lo = int(np.searchsorted(sv, v, side="left"))   # #{ < v }
        hi = int(np.searchsorted(sv, v, side="right"))  # #{ <= v }
        target = max(1, math.ceil(q * n))
        if lo < target <= hi:
            err = 0
        else:
            err = min(abs(target - (lo + 1)), abs(target - hi))
        worst = max(worst, err / n)
    return worst


def test_kll_rank_error_within_bound_many_blocks():
    """50k lognormal values over 32 blocks (every merge path exercised):
    worst rank error stays under the published KLL_EPS bound, and the
    sketch's total weight equals the exact row count."""
    rng = np.random.default_rng(7)
    vals = rng.lognormal(mean=0.0, sigma=2.0, size=50_000)
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, type=pa.float64())})
    ).repartition(32)
    sk = kll_sketch(ds, value_col="v")
    lv = np.asarray(sk["level"], dtype=np.int64)
    assert int((1 << lv).sum()) == len(vals)  # weight preservation
    est = kll_quantile_values(sk, QS)
    assert _rank_err(vals, est) <= KLL_EPS


def test_kll_rank_error_adversarial_sorted_and_dupes():
    """Sorted input with heavy duplicate plateaus — the classic sketch
    stress (compactions see correlated data): bound still holds."""
    vals = np.concatenate(
        [
            np.full(20_000, 1.0),
            np.linspace(2, 3, 15_000),
            np.full(15_000, 100.0),
        ]
    )
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, type=pa.float64())})
    ).repartition(16)
    est = kll_quantile_values(kll_sketch(ds, value_col="v"), QS)
    assert _rank_err(vals, est) <= KLL_EPS


def test_kll_rank_check_self_verifies():
    """kll_rank_check: every quantile row reports within_bounds=True and
    the exact n on a mixed corpus; empty input yields n=0 rows that
    still satisfy the contract."""
    rng = np.random.default_rng(3)
    vals = rng.normal(size=10_000)
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, type=pa.float64())})
    ).repartition(8)
    out = kll_rank_check(ds, value_col="v", quantiles=QS)
    assert out["n"].to_pylist() == [len(vals)] * len(QS)
    assert out["within_bounds"].to_pylist() == [True] * len(QS)
    assert out["q_micro"].to_pylist() == sorted(
        int(round(q * 1_000_000)) for q in QS
    )

    empty = ray.data.from_arrow(
        pa.schema([("v", pa.float64())]).empty_table()
    )
    out0 = kll_rank_check(empty, value_col="v", quantiles=(0.5,))
    assert out0["n"].to_pylist() == [0]
    assert out0["within_bounds"].to_pylist() == [True]


def test_kll_agrees_with_exact_selection():
    """The sketch's estimates bracket the exact quantile_select answers
    within eps·n ranks on the same column — the streaming/exact
    complement contract."""
    from docling_api_ray.stages.selection import quantile_select

    rng = np.random.default_rng(11)
    vals = rng.gamma(2.0, 3.0, size=20_000)

    def ds():
        return ray.data.from_arrow(
            pa.table({"v": pa.array(vals, type=pa.float64())})
        ).repartition(16)

    exact = {
        float(r["q"]): float(r["value"])
        for r in quantile_select(
            ds(), value_col="v", quantiles=(0.25, 0.5, 0.9)
        ).to_pylist()
    }
    est = kll_quantile_values(
        kll_sketch(ds(), value_col="v"), (0.25, 0.5, 0.9)
    )
    sv = np.sort(vals)
    n = len(sv)
    for q in exact:
        r_exact = np.searchsorted(sv, exact[q], side="right")
        r_est = np.searchsorted(sv, est[q], side="right")
        assert abs(int(r_exact) - int(r_est)) <= KLL_EPS * n


def test_grouped_kll_rank_error_per_group():
    """Per-group sketches are independent: three sources with very
    different distributions (normal / lognormal / constant plateau),
    unequal sizes, 16 blocks — each group's estimates respect eps·n_g,
    and each group's weight equals its exact count."""
    from docling_api_ray.stages.sketch import (
        grouped_kll_rank_check,
        grouped_kll_sketch,
    )

    rng = np.random.default_rng(5)
    parts = {
        "a": rng.normal(size=12_000),
        "b": rng.lognormal(sigma=2.0, size=5_000),
        "c": np.full(3_000, 7.0),
    }
    g = np.concatenate([[k] * len(v) for k, v in parts.items()])
    v = np.concatenate(list(parts.values()))
    order = rng.permutation(len(v))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(g[order].tolist(), pa.string()),
                "logit": pa.array(v[order], pa.float64()),
            }
        )
    ).repartition(16)

    sk = grouped_kll_sketch(ds, group_col="source", value_col="logit")
    g_arr = np.asarray(sk["g"].to_pylist(), dtype=object)
    lv = np.asarray(sk["level"], dtype=np.int64)
    for name, vals in parts.items():
        assert int((1 << lv[g_arr == name]).sum()) == len(vals)

    out = grouped_kll_rank_check(
        ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array(g[order].tolist(), pa.string()),
                    "logit": pa.array(v[order], pa.float64()),
                }
            )
        ).repartition(16),
        group_col="source",
        value_col="logit",
        quantiles=(0.1, 0.5, 0.9),
    )
    rows = out.to_pylist()
    assert len(rows) == 9
    assert all(r["within_bounds"] for r in rows)
    n_by = {r["source"]: r["n"] for r in rows}
    assert n_by == {k: len(v) for k, v in parts.items()}


def test_grouped_heavy_hitters_exact_vs_bruteforce():
    """Per-group heavy hitters: output equals a brute-force per-group
    count over a corpus with per-group different hot words, group-local
    thresholds (a word hot in one group and cold in another), and a
    vocabulary far wider than the sketch width."""
    from collections import Counter

    from docling_api_ray.stages.sketch import grouped_heavy_hitters

    rng = np.random.default_rng(21)
    vocab = [f"t{i:04d}" for i in range(500)]
    rows_g, rows_t = [], []
    for g, hot in (("a", "aaa"), ("b", "bbb"), ("c", "aaa")):
        for _ in range(40):
            words = list(rng.choice(vocab, size=12))
            # group-specific hot word at ~20% of tokens
            words += [hot] * 3
            rows_g.append(g)
            rows_t.append(" ".join(words))
    ds = ray.data.from_arrow(
        pa.table({"source": rows_g, "text": rows_t})
    ).repartition(8)
    got = sorted(
        (r["source"], r["word"], r["n"])
        for r in grouped_heavy_hitters(ds, num=1, den=12).take_all()
    )
    # brute-force reference
    exp = []
    for g in ("a", "b", "c"):
        c = Counter(
            w
            for gg, t in zip(rows_g, rows_t)
            if gg == g
            for w in t.split()
            if w
        )
        total = sum(c.values())
        exp += [(g, w, n) for w, n in c.items() if n * 12 > total]
    assert got == sorted(exp)
    assert {g for g, _, _ in got} == {"a", "b", "c"}
