"""Windowed aggregates: tumbling is oracle-checked in test_queries_oracle;
here sliding membership and session splitting on hand-built streams."""

import datetime as dt

import numpy as np
import pyarrow as pa
import ray.data

from docling_api_ray.stages.windows import session_windows, sliding_window_agg


def _events(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": [r[0] for r in rows],
                "user_id": [r[3] for r in rows],
                "ts": pa.array(
                    [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=r[1]) for r in rows],
                    type=pa.timestamp("us"),
                ),
                "value": [float(r[2]) for r in rows],
            }
        )
    )


BASE = int(dt.datetime(2024, 1, 1).timestamp())  # naive epoch used by arrow


def test_sliding_window_membership():
    # one event at t=1000s belongs to windows 0, 900 (size 3600 slide 900
    # => windows [0,3600) and [900,4500) contain it; also [-1800,...],
    # [-900,...] => 4 windows total
    ds = _events([("a", 1000, 1.0, 1)])
    out = sliding_window_agg(ds, key="event_type", size_s=3600, slide_s=900).take_all()
    wins = sorted(r["window_start"] - BASE for r in out)
    assert wins == [-1800, -900, 0, 900]
    assert all(r["n_events"] == 1 and r["sum_value"] == 1.0 for r in out)


def test_sliding_counts_accumulate():
    ds = _events([("a", 0, 1.0, 1), ("a", 100, 2.0, 1), ("b", 0, 5.0, 2)])
    out = sliding_window_agg(ds, key="event_type", size_s=3600, slide_s=900).take_all()
    w0 = {r["event_type"]: r for r in out if r["window_start"] - BASE == 0}
    assert w0["a"]["n_events"] == 2 and w0["a"]["sum_value"] == 3.0
    assert w0["b"]["n_events"] == 1 and w0["b"]["sum_value"] == 5.0


def test_sliding_non_divisible_size_slide():
    # size=100, slide=30: windows start every 30s; an event at t=90
    # belongs to starts {0, 30, 60, 90} — ceil(100/30)=4 candidates, all
    # kept (w > t-size).  The old k=size//slide=3 silently dropped the
    # oldest window (start 0).
    ds = _events([("a", 90, 1.0, 1)])
    out = sliding_window_agg(ds, key="event_type", size_s=100, slide_s=30).take_all()
    wins = sorted(r["window_start"] - BASE for r in out)
    assert wins == [0, 30, 60, 90]


def test_session_split_on_gap():
    # user 1: events at 0, 100, 100+1801 → two sessions (gap > 1800)
    ds = _events(
        [("x", 0, 1.0, 1), ("x", 100, 2.0, 1), ("x", 1901 + 100, 4.0, 1),
         ("x", 50, 8.0, 2)]
    )
    out = session_windows(ds, key="user_id", gap_s=1800).take_all()
    u1 = sorted(
        (r for r in out if r["user_id"] == 1), key=lambda r: r["session_start"]
    )
    assert len(u1) == 2
    assert u1[0]["n_events"] == 2 and u1[0]["sum_value"] == 3.0
    assert u1[1]["n_events"] == 1 and u1[1]["sum_value"] == 4.0
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["sum_value"] == 8.0


def test_session_boundary_exact_gap_merges():
    # gap EXACTLY 1800 does not split (rule: > gap_s)
    ds = _events([("x", 0, 1.0, 1), ("x", 1800, 1.0, 1)])
    out = session_windows(ds, key="user_id", gap_s=1800).take_all()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_quantize6_is_summation_order_proof():
    """round(x,6) lets one-ulp association differences through (the r2
    oracle flip); quantize6 must map them to IDENTICAL doubles."""
    import numpy as np

    from docling_api_ray.stages.windows import quantize6_np

    rng = np.random.RandomState(0)
    for _ in range(200):
        vals = np.round(rng.rand(7) * 100, 2)
        a = vals.sum()
        b = vals[::-1].cumsum()[-1]  # different association order
        qa, qb = quantize6_np(np.array([a])), quantize6_np(np.array([b]))
        assert qa[0].hex() == qb[0].hex()


def test_funnel_reached_ordering_semantics():
    """Strictly-after cascade: a click BEFORE the first view doesn't
    count; a purchase before the qualifying click doesn't count;
    users without a view are excluded; ties (ts equal) don't advance."""
    from datetime import datetime

    from docling_api_ray.stages.windows import funnel_reached

    T = lambda s: datetime.fromisoformat(f"2026-01-01 00:00:{s:02d}")
    rows = [
        # u1: clean view->click->purchase
        (1, T(1), "view"), (1, T(2), "click"), (1, T(3), "purchase"),
        # u2: click before view -> reached 1
        (2, T(2), "view"), (2, T(1), "click"),
        # u3: purchase before click -> reached 2
        (3, T(1), "view"), (3, T(3), "click"), (3, T(2), "purchase"),
        # u4: no view at all -> excluded despite click+purchase
        (4, T(1), "click"), (4, T(2), "purchase"),
        # u5: click at EXACTLY the view ts -> tie does not advance
        (5, T(1), "view"), (5, T(1), "click"),
        # u6: second view earlier than click anchor is the anchor
        (6, T(5), "view"), (6, T(2), "view"), (6, T(3), "click"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": [r[0] for r in rows],
                "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                "event_type": [r[2] for r in rows],
            }
        )
    )
    out = {r["user_id"]: r["reached"] for r in funnel_reached(ds).take_all()}
    assert out == {1: 3, 2: 1, 3: 2, 5: 1, 6: 2}


def test_events_new_users_first_seen_and_cumulative(tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from __ray_entry__ import _q_events_new_users

    d0 = dt.datetime(2024, 1, 1)

    def at(day, hour):
        return d0 + dt.timedelta(days=day, hours=hour)

    # user 1 appears day0 and day2 (counts once, day0); user 2 only day2;
    # user 3 twice within day1 (counts once); late-day timestamps stay in
    # their day bucket
    rows = [
        (1, at(0, 5)), (1, at(2, 1)),
        (2, at(2, 23)),
        (3, at(1, 0)), (3, at(1, 23)),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array(["c"] * len(rows), pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    out = _q_events_new_users(str(tmp_path)).to_pylist()
    base = int(d0.timestamp())
    assert out == [
        {"day_start": base, "new_users": 1, "cum_users": 1},
        {"day_start": base + 86400, "new_users": 1, "cum_users": 2},
        {"day_start": base + 2 * 86400, "new_users": 1, "cum_users": 3},
    ]


def test_session_type_pairs_gap_and_distinct(tmp_path):
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.windows import session_type_pairs

    d0 = dt.datetime(2024, 1, 1)

    def at(mins):
        return d0 + dt.timedelta(minutes=mins)

    # user 1 session A: types a,b,a (distinct {a,b} -> one (a,b));
    # 31-min gap; session B: types b,c -> one (b,c)
    # user 2 one session: type a alone -> no pairs
    rows = [
        (1, at(0), "a"), (1, at(5), "b"), (1, at(10), "a"),
        (1, at(41), "b"), (1, at(50), "c"),
        (2, at(0), "a"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    out = sorted(
        session_type_pairs(ds, gap_s=1800).take_all(),
        key=lambda r: (r["type_a"], r["type_b"]),
    )
    assert out == [
        {"type_a": "a", "type_b": "b", "n_sessions": 1},
        {"type_a": "b", "type_b": "c", "n_sessions": 1},
    ]


def test_events_retention_cohort_offsets(tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from __ray_entry__ import _q_events_retention

    d0 = dt.datetime(2024, 1, 1)

    def at(day):
        return d0 + dt.timedelta(days=day, hours=3)

    # user 1: days 0,2 (cohort 0: offsets 0 and 2; two events on day 0
    # count once); user 2: day 0 only; user 3: days 1,2 (cohort 1)
    rows = [(1, at(0)), (1, at(0)), (1, at(2)), (2, at(0)),
            (3, at(1)), (3, at(2))]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array(["c"] * len(rows), pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    out = sorted(
        _q_events_retention(str(tmp_path)).take_all(),
        key=lambda r: (r["cohort_day"], r["day_offset"]),
    )
    base = int(d0.timestamp())
    assert out == [
        {"cohort_day": base, "day_offset": 0, "n_users": 2},
        {"cohort_day": base, "day_offset": 2, "n_users": 1},
        {"cohort_day": base + 86400, "day_offset": 0, "n_users": 1},
        {"cohort_day": base + 86400, "day_offset": 1, "n_users": 1},
    ]


def test_session_transitions_gap_order_and_ties(tmp_path):
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.windows import session_transitions

    d0 = dt.datetime(2024, 1, 1)

    def at(secs):
        return d0 + dt.timedelta(seconds=secs)

    # user 1: a->b (gap 1800 = SAME session, boundary inclusive),
    #         b->c dropped (gap 1801 = new session), then c->a;
    # same-second pair ordered by event_id: (5,a)=id4 then (5,b)=id5
    # user 2: single event, no transitions
    rows = [
        (1, 1, at(0), "a"),
        (2, 1, at(1800), "b"),
        (3, 1, at(3601), "c"),
        (4, 1, at(3606), "a"),
        (5, 2, at(0), "z"),
        (6, 3, at(5), "a"),
        (7, 3, at(5), "b"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )
    out = sorted(
        session_transitions(ds, gap_s=1800).take_all(),
        key=lambda r: (r["from_type"], r["to_type"]),
    )
    assert out == [
        {"from_type": "a", "to_type": "b", "n_trans": 2},
        {"from_type": "c", "to_type": "a", "n_trans": 1},
    ]


def test_top_event_per_user_tie_to_smallest_type():
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.windows import top_event_per_user

    # user 1: b x2, a x2 (tie -> 'a'); user 2: c x1
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "event_type": pa.array(["b", "a", "b", "a", "c"], pa.string()),
        }
    )
    # two single-row-ish blocks so partial counts must fold across batches
    ds = ray.data.from_arrow(t).repartition(3)
    out = sorted(
        top_event_per_user(ds).take_all(), key=lambda r: r["user_id"]
    )
    assert out == [
        {"user_id": 1, "top_type": "a", "n": 2},
        {"user_id": 2, "top_type": "c", "n": 1},
    ]


def test_rolling_active_users_window_and_observed_days():
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.windows import rolling_active_users

    day = 86400

    def on(d, u):
        return (dt.datetime(2024, 1, 1) + dt.timedelta(days=d), u)

    # observed days: 0 (u1,u2), 2 (u1 twice -> distinct), 9 (u3)
    # w=3: day0 -> {u1,u2}; day2 -> {u1,u2} (day0 within [0,2]) + u1
    #      -> {u1,u2}; day9 -> {u3} (day2 outside [7,9])
    rows = [on(0, 1), on(0, 2), on(2, 1), on(2, 1), on(9, 3)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            }
        )
    )
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    out = sorted(
        rolling_active_users(ds, window_days=3).take_all(),
        key=lambda r: r["day_start"],
    )
    assert out == [
        {"day_start": base, "active_users": 2},
        {"day_start": base + 2 * day, "active_users": 2},
        {"day_start": base + 9 * day, "active_users": 1},
    ]


def test_user_event_sequences_truncation_and_ties():
    """Head-k truncation, (ts, event_id) tie order, and total counts."""
    import pandas as pd
    import ray.data

    from docling_api_ray.stages.windows import user_event_sequences

    ts = pd.to_datetime(
        ["2026-01-01 00:00:00"] * 2 + ["2026-01-01 00:00:01"] * 3,
    )
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "ts": list(ts[:4]) + [ts[4]],
            "event_id": [11, 10, 12, 13, 20],
            "event_type": ["b", "a", "c", "d", "x"],
        }
    )
    out = {
        r["user_id"]: (r["n_events"], r["seq"])
        for r in user_event_sequences(
            ray.data.from_pandas(df).repartition(3), k=3
        ).take_all()
    }
    # user 1: ties at t0 order by event_id -> a,b then c (d truncated)
    assert out == {1: (4, "a>b>c"), 2: (1, "x")}


def test_user_decay_score_exact_halflife():
    """Integer half-life weights: age-a events contribute exactly
    1_000_000 >> a micro-units against the corpus max day; age >= 20
    contributes 0; result is partition-count independent (the anchor
    fold must reduce over every bundled partial row, not just the
    first — regression for the iter_batches bundling bug)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.windows import user_decay_score

    day = 86_400 * 1_000_000
    base = 19_000 * day  # an arbitrary epoch day
    rows = [
        # user 1: ages 0, 1, 3 -> 1e6 + 5e5 + 125000
        (1, base + 40 * day + 5),
        (1, base + 39 * day + 7),
        (1, base + 37 * day),
        # user 2: ages 0 and 25 (truncated to 0 weight)
        (2, base + 40 * day + 999),
        (2, base + 15 * day),
        # user 3: only ancient activity -> score 0
        (3, base),
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype="datetime64[us]")
            ),
        }
    )
    for parts in (1, 2, 6):
        out = {
            r["user_id"]: (r["n_events"], r["decay_micro"])
            for r in user_decay_score(
                ray.data.from_arrow(tbl).repartition(parts)
            ).take_all()
        }
        assert out[1] == (3, 1_000_000 + 500_000 + 125_000), parts
        assert out[2] == (2, 1_000_000), parts
        assert out[3] == (1, 0), parts


def test_event_path_counts_trigrams_never_span_users():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.windows import event_path_counts

    # user 1: a,b,c,d -> paths a>b>c, b>c>d ; user 2: x,y,z -> x>y>z
    # user 3: only 2 events -> nothing
    rows = [
        (1, 10, 0, "a"), (1, 20, 1, "b"), (1, 30, 2, "c"), (1, 40, 3, "d"),
        (2, 10, 4, "x"), (2, 20, 5, "y"), (2, 30, 6, "z"),
        (3, 10, 7, "a"), (3, 20, 8, "b"),
        # same-ts tie within user 1 later: order falls to event_id
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                np.array([r[1] * 1_000_000 for r in rows],
                         dtype="datetime64[us]")
            ),
            "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
        }
    )
    for parts in (1, 4):
        out = {}
        for r in event_path_counts(
            ray.data.from_arrow(tbl).repartition(parts)
        ).take_all():
            out[r["path"]] = out.get(r["path"], 0) + r["n"]
        assert out == {"a>b>c": 1, "b>c>d": 1, "x>y>z": 1}, parts


def test_rfm_segments_thresholds_and_ties():
    """Quartile-threshold semantics: q = 1 + #{thresholds strictly
    below}; ties share a quartile; recency measured to the corpus max
    day; value summed in micro units; partition independent."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.windows import rfm_segments

    day = 86_400 * 1_000_000
    base = 19_000 * day
    # 4 users with clearly ordered metrics
    evs = []
    # user 1: 1 event long ago, small value
    evs.append((1, base, 1.0))
    # user 2: 2 events, mid
    evs += [(2, base + 10 * day, 2.0), (2, base + 11 * day, 2.0)]
    # user 3: 3 events, recent, larger
    evs += [(3, base + 19 * day + i, 3.0) for i in range(3)]
    # user 4: 6 events at the max day, biggest spender
    evs += [(4, base + 20 * day + i, 4.5) for i in range(6)]
    tbl = pa.table(
        {
            "user_id": pa.array([e[0] for e in evs], type=pa.int64()),
            "ts": pa.array(
                np.array([e[1] for e in evs], dtype="datetime64[us]")
            ),
            "value": pa.array([e[2] for e in evs], type=pa.float64()),
        }
    )
    for parts in (1, 3):
        out = {
            r["user_id"]: r
            for r in rfm_segments(
                ray.data.from_arrow(tbl).repartition(parts)
            ).take_all()
        }
        # recency: u1=20, u2=9, u3=1, u4=0 -> thresholds disc(.25/.5/.75)
        # over sorted [0,1,9,20] = (0, 1, 9)
        assert [out[u]["recency_days"] for u in (1, 2, 3, 4)] == [20, 9, 1, 0]
        assert [out[u]["r_q"] for u in (1, 2, 3, 4)] == [4, 3, 2, 1]
        # frequency [1,2,3,6]: thresholds (1,2,3) -> q = 1,2,3,4
        assert [out[u]["f_q"] for u in (1, 2, 3, 4)] == [1, 2, 3, 4]
        # monetary micro [1e6, 4e6, 9e6, 27e6] -> q = 1,2,3,4
        assert out[4]["v_micro"] == 27_000_000
        assert [out[u]["m_q"] for u in (1, 2, 3, 4)] == [1, 2, 3, 4]
        assert out[1]["segment"] == "4.1.1" and out[4]["segment"] == "1.4.4"


def test_burst_days_integer_predicate():
    """Zero-filled grid: a type silent on most days bursts on its one
    active day; a uniform type never bursts; the predicate is the exact
    integer (n*D-S)^2 > k^2(D*Q-S^2) with lhs>0."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.windows import burst_days

    day = 86_400 * 1_000_000
    base = 19_000 * day
    evs = []
    # 10 observed days via type "steady": 2 events each day -> never bursts
    for d in range(10):
        evs += [("steady", base + d * day), ("steady", base + d * day + 1)]
    # type "spiky": silent except day 3 with 5 events
    evs += [("spiky", base + 3 * day + i) for i in range(5)]
    tbl = pa.table(
        {
            "event_type": pa.array([e[0] for e in evs], type=pa.string()),
            "ts": pa.array(
                np.array([e[1] for e in evs], dtype="datetime64[us]")
            ),
        }
    )
    for parts in (1, 4):
        out = burst_days(
            ray.data.from_arrow(tbl).repartition(parts), sigma=2
        )
        rows = sorted(
            zip(
                out["event_type"].to_pylist(),
                out["day"].to_pylist(),
                out["n"].to_pylist(),
            )
        )
        # spiky: D=10, S=5, Q=25 -> lhs=5*10-5=45, var_d2=250-25=225;
        # 45^2=2025 > 4*225=900 -> burst. steady: lhs=0 everywhere.
        assert rows == [("spiky", 19_003, 5)], parts


def test_cogroup_skew_guard_forced_failure(monkeypatch):
    """VERDICT r4 #5: the shared co-group skew guard must fail LOUDLY
    (fold name + partition size) when a key's co-group exceeds the row
    budget, instead of OOMing the worker.  Forced by shrinking the
    budget below one hot user's event count; the same input passes at
    the default budget."""
    import pytest
    import ray.data

    from docling_api_ray.stages import common
    from docling_api_ray.stages.windows import session_windows

    n = 64
    tbl = pa.table(
        {
            "user_id": pa.array([7] * n, type=pa.int64()),
            "ts": pa.array(
                np.arange(n, dtype=np.int64) * 1_000_000,
                type=pa.timestamp("us"),
            ),
            "value": pa.array([1.0] * n),
        }
    )
    # guard budget below the hot key's rows → loud failure from the fold
    monkeypatch.setattr(common, "MAX_COGROUP_ROWS", 8)
    with pytest.raises(Exception, match="co-group partition holds"):
        session_windows(ray.data.from_arrow(tbl)).take_all()
    # same pipeline at the default budget sessionizes fine
    monkeypatch.setattr(common, "MAX_COGROUP_ROWS", 16_000_000)
    assert session_windows(ray.data.from_arrow(tbl)).count() == 1


def test_dedup_cogroup_guard_reports_hot_key(monkeypatch):
    """The guard wired into dedup's _cogrouped names the hottest key in
    its error (driver-side unit check of guard_fold; plus a live forced
    failure through exact_dedup's digest co-group)."""
    import pandas as pd
    import pytest
    import ray.data

    from docling_api_ray.stages import common
    from docling_api_ray.stages.common import guard_fold
    from docling_api_ray.stages.dedup import exact_dedup

    # unit: hot-key census in the message
    df = pd.DataFrame({"k": [1] * 9 + [2], "v": range(10)})
    wrapped = guard_fold(lambda g: g, key_col="k", max_rows=5, label="unit")
    with pytest.raises(ValueError, match=r"hottest k=1 holds 9"):
        wrapped(df)

    # live: force the digest co-group over budget
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(32, dtype=np.int64)),
                "text": pa.array(["same text"] * 32),
            }
        )
    )
    monkeypatch.setattr(common, "MAX_COGROUP_ROWS", 4)
    with pytest.raises(Exception, match="co-group partition holds"):
        exact_dedup(docs).take_all()


def test_event_debounce_boundary_and_stream_isolation():
    """Hand-built streams: the exact-boundary gap (== window) is KEPT,
    one tick under is dropped; streams are isolated per (user, type);
    ties order by (ts, event_id)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from docling_api_ray.stages.windows import event_debounce

    W = 1_000_000  # 1s window
    base = pd.Timestamp("2025-01-01")
    us = lambda n: base + pd.Timedelta(microseconds=n)
    rows = [
        # user 1, click: kept(first), dropped(+W-1), kept(+W exactly)
        (1, 1, "click", us(0)),
        (2, 1, "click", us(W - 1)),
        (3, 1, "click", us(W - 1 + W)),
        # user 1, view: its own stream — first is kept even at ts 0
        (4, 1, "view", us(0)),
        # user 2, click: independent of user 1's stream
        (5, 2, "click", us(1)),
        # same-ts tie: event_id orders them; second is 0 < W -> dropped
        (6, 3, "view", us(10)),
        (7, 3, "view", us(10)),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "ts": pa.array(
                    [r[3].to_pydatetime() for r in rows],
                    type=pa.timestamp("us"),
                ),
            }
        )
    ).repartition(4)
    out = event_debounce(ds, window_us=W).to_pandas()
    got = {
        r["event_type"]: (r["n_total"], r["n_kept"], r["kept_ratio"])
        for _, r in out.iterrows()
    }
    # click: e1 kept, e2 dropped (W-1 < W), e3 kept (gap == W), e5 kept
    assert got["click"] == (4, 3, 0.75)
    # view: e4 kept; e6 kept (first), e7 dropped (same-ts tie, gap 0)
    assert got["view"] == (3, 2, 2 / 3)
    assert list(out["event_type"]) == ["click", "view"]  # ascending


def test_events_ewma_alerts_on_burst():
    import numpy as np
    import pyarrow as pa

    import __ray_entry__ as em

    # build a tiny parquet dir: steady 4/day then a 16-event burst day
    import os
    import tempfile

    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="ewma_")
    days = [0] * 4 + [1] * 4 + [2] * 4 + [3] * 16 + [4] * 4
    us = [int((day * 86400 + i) * 1e6) for i, day in enumerate(days)]
    t = pa.table(
        {
            "event_id": pa.array(range(len(days)), pa.int64()),
            "ts": pa.array(us, pa.timestamp("us")),
            "user_id": pa.array([1] * len(days), pa.int64()),
            "event_type": pa.array(["click"] * len(days), pa.string()),
            "value": pa.array([1.0] * len(days), pa.float64()),
            "props": pa.array(["{}"] * len(days), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = em.queries()["events_ewma"](d).take_all()
    out.sort(key=lambda r: r["day"])
    assert [r["n"] for r in out] == [4, 4, 4, 16, 4]
    # burst day fires the high alert; day 4's drop (4/7 ~ 0.57) stays
    # inside the band because the EWMA only partially absorbed the burst
    assert out[3]["alert"] is True and out[3]["ratio"] == 4.0
    assert out[4]["alert"] is False and out[4]["ratio"] == 4.0 / 7.0
    # steady days do not alert; day 0 has no prior
    assert not out[0]["alert"] and not out[1]["alert"] and not out[2]["alert"]
    # EWMA recursion: s1=4, s2=4, s3=4, s4=.25*16+.75*4=7, s5=.25*4+.75*7
    assert out[3]["ewma"] == 7.0
    assert out[4]["ewma"] == 0.25 * 4 + 0.75 * 7.0


def test_mann_kendall_detects_monotone_trend():
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as em

    d = tempfile.mkdtemp(prefix="mk_")
    # 'grow': strictly rising daily counts; 'flat': constant
    days, types = [], []
    for day in range(10):
        for _ in range(day + 1):
            days.append(day)
            types.append("grow")
        for _ in range(3):
            days.append(day)
            types.append("flat")
    us = [int((day * 86400 + i) * 1e6) for i, day in enumerate(days)]
    t = pa.table(
        {
            "event_id": pa.array(range(len(days)), pa.int64()),
            "ts": pa.array(us, pa.timestamp("us")),
            "user_id": pa.array([1] * len(days), pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array([1.0] * len(days), pa.float64()),
            "props": pa.array(["{}"] * len(days), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = {r["event_type"]: r for r in em.queries()["mann_kendall"](d).take_all()}
    # strictly increasing 10-day series: S = C(10,2) = 45, trend up
    assert out["grow"]["s"] == 45 and out["grow"]["trend"] == "up"
    # constant series: S = 0, all-tied variance numerator 0, z = 0
    assert out["flat"]["s"] == 0 and out["flat"]["var_num"] == 0
    assert out["flat"]["z"] == 0.0 and out["flat"]["trend"] == "flat"


def test_funnel_step_latency_anchor_semantics():
    """Delta anchors to the FIRST view and the first strictly-later
    click — clicks before the first view never count, ties don't."""
    from datetime import datetime

    from docling_api_ray.stages.windows import funnel_step_latency

    T = lambda s: datetime.fromisoformat(f"2026-01-01 00:00:{s:02d}")
    rows = [
        (1, T(1), "view"), (1, T(4), "click"),       # delta 3s
        (2, T(2), "view"), (2, T(1), "click"),       # click first: none
        (3, T(1), "view"), (3, T(1), "click"),       # tie: none
        (4, T(5), "view"), (4, T(2), "view"), (4, T(3), "click"),
        # first view is T(2) -> click at T(3) qualifies: delta 1s
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": [r[0] for r in rows],
                "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                "event_type": [r[2] for r in rows],
            }
        )
    )
    out = {r["user_id"]: r["delta_us"] for r in funnel_step_latency(ds).take_all()}
    assert out == {1: 3_000_000, 4: 1_000_000}
