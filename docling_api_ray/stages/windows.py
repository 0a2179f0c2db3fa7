"""Windowed aggregates over the events stream (custom operators — Ray Data
has no event-time windows; SURVEY.md §2.9 notes the reference has none
either, these are the training-pipeline streaming-shaped extensions).

Partitioning assumption (documented per the custom-operator rule): events
exchange on the window key (event_type) or a hash of it (user_id mod P)
and windowing runs inside the co-located partition.

- tumbling: assign window = floor(ts / size) in a vectorized map, then a
  plain grouped aggregate (NO per-group python) — see __ray_entry__
  events_hourly.
- sliding: each event belongs to ceil(size/slide) windows — vectorized
  explode-to-(key, window) rows then the same grouped aggregate.
- session: gap-based sessionization needs ordered scans → keys co-group
  to ~core-count partitions (user mod P) and sessionize VECTORIZED
  ACROSS keys inside each (sort + shift-compare + cumsum + grouped agg;
  a per-user ``map_groups`` would pay Ray's ~1 ms dispatch per user).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

from docling_api_ray.stages.common import coalesce_narrow, guard_fold

US = 1_000_000  # microseconds per second


def quantize6(col):
    """round(x*1e6)/1e6 — 6-decimal quantization whose RESULT BITS are
    identical however the upstream float sum was associated, unlike
    ``round(x, 6)`` (measured: two 151.11 sums one ulp apart survive
    pc.round/DuckDB round as different doubles and flip tie-broken row
    orders between engine and oracle).  The scaled value is integral, so
    the final division is exact-deterministic; the matching SQL is
    ``round(x * 1000000) / 1000000.0``."""
    return pc.divide(pc.round(pc.multiply(col, 1_000_000.0)), 1_000_000.0)


def quantize6_np(x: np.ndarray) -> np.ndarray:
    return np.rint(np.asarray(x, dtype=np.float64) * 1e6) / 1e6


def sliding_window_agg(
    ds: ray.data.Dataset,
    *,
    key: str = "event_type",
    size_s: int = 3600,
    slide_s: int = 900,
) -> ray.data.Dataset:
    """Count/sum per (key, sliding window).  A window [w, w+size) contains
    an event at t iff w ∈ {floor((t-size+slide)/slide)*slide ...
    floor(t/slide)*slide} — up to ceil(size/slide) windows per event (when
    slide does not divide size, an event near a window's end still belongs
    to the window that started size-(size mod slide) before it), exploded
    vectorized via one take() per candidate offset."""
    k = -(-size_s // slide_s)  # ceil — size_s % slide_s != 0 needs the extra slot

    def explode(b: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(b["ts"], pa.int64()))
        sec = us // US
        last = (sec // slide_s) * slide_s  # latest window containing t
        take_idx: list[np.ndarray] = []
        wins: list[np.ndarray] = []
        for i in range(k):
            w = last - i * slide_s
            keep = np.flatnonzero(w > sec - size_s)  # window still contains t
            take_idx.append(keep)
            wins.append(w[keep])
        idx = pa.array(np.concatenate(take_idx))
        return pa.table(
            {
                key: pc.take(b[key], idx),
                "window_start": pa.array(np.concatenate(wins), type=pa.int64()),
                "value": pc.take(b["value"], idx),
            }
        )

    agg = (
        coalesce_narrow(ds.map_batches(explode, batch_format="pyarrow"))
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def round_sum(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.schema.get_field_index("sum_value"),
            "sum_value",
            quantize6(b["sum_value"]),
        )

    return agg.map_batches(round_sum, batch_format="pyarrow")


SESSION_SCHEMA_COLS = ("session_start", "n_events", "sum_value")


def session_windows(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    gap_s: int = 1800,
) -> ray.data.Dataset:
    """Gap-based sessions per key: a new session starts when the gap to
    the previous event of the same key exceeds ``gap_s``.  Output one row
    per session: (key, session_start epoch-sec, n_events, sum_value).

    Partitioning: keys co-group to ~core-count partitions (key mod P) —
    a per-KEY ``groupby(key).map_groups`` pays Ray's ~1 ms per-group
    dispatch for EVERY user; inside a partition sessionization is fully
    vectorized ACROSS keys (one sort + shift-compare + cumsum + grouped
    agg, no per-user python)."""
    import pyarrow as pa

    P = _parts()

    def add_part(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        part = pc.subtract(b[key], pc.multiply(pc.divide(b[key], P), P))
        return b.append_column("__part", pc.cast(part, pa.int64()))

    out_schema = pa.schema(
        [
            (key, pa.int64()),
            ("session_start", pa.int64()),
            ("n_events", pa.int64()),
            ("sum_value", pa.float64()),
        ]
    )

    def sessions_part(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key, "ts"], kind="stable")
        keys = df[key].to_numpy()
        sec = df["ts"].astype("int64").to_numpy() // US
        val = df["value"].to_numpy(dtype=np.float64)
        new = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            new[1:] = (keys[1:] != keys[:-1]) | ((sec[1:] - sec[:-1]) > gap_s)
        sid = np.cumsum(new) - 1
        agg = pd.DataFrame(
            {key: keys, "sec": sec, "val": val, "sid": sid}
        ).groupby("sid", sort=False).agg(
            **{
                key: (key, "first"),
                "session_start": ("sec", "min"),
                "n_events": ("sec", "size"),
                "sum_value": ("val", "sum"),
            }
        )
        agg["sum_value"] = quantize6_np(agg["sum_value"].to_numpy())
        return pa.Table.from_pandas(
            agg.reset_index(drop=True), preserve_index=False
        ).replace_schema_metadata(None).cast(out_schema)

    return (
        coalesce_narrow(ds.map_batches(add_part, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(sessions_part), batch_format="pandas")
    )


def _parts() -> int:
    from docling_api_ray.stages.common import shuffle_partitions

    return shuffle_partitions()


def funnel_reached(
    ds: ray.data.Dataset,
    *,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    key: str = "user_id",
) -> ray.data.Dataset:
    """Ordered-funnel progression per user — the event-sequence analog
    of sessionization: for every user with a ``steps[0]`` event, how far
    did they get through step0 -> step1 (strictly after their FIRST
    step0) -> step2 (strictly after that first qualifying step1)?

    Shape: the scan is pruned to the three step types at the read-side
    filter, the exchange ships only (user, ts, type) rows for those
    types hashed by user (every user's events co-locate), and the
    per-partition fold is three vectorized grouped mins — no per-user
    Python loop.  Output: (user_id, reached in {1,2,3})."""
    import pandas as pd

    from docling_api_ray.stages.common import shuffle_partitions

    s0, s1, s2 = steps

    def prep(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"], value_set=pa.array([s0, s1, s2]))
        b = b.filter(m)
        uid = np.asarray(b[key], dtype=np.int64)
        return pa.table(
            {
                key: b[key],
                "ts": b["ts"],
                "event_type": b["event_type"],
                "__part": pa.array(
                    np.abs(uid) % shuffle_partitions(), type=pa.int64()
                ),
            }
        )

    def fold(df: "pd.DataFrame") -> pa.Table:
        t1 = (
            df[df["event_type"] == s0].groupby(key, sort=False)["ts"].min()
        )
        e1 = df[df["event_type"] == s1].merge(
            t1.rename("t1"), left_on=key, right_index=True
        ).reset_index(drop=True)  # empty merges adopt the right index
        # name, which would make the next groupby(key) ambiguous
        t2 = e1[e1["ts"] > e1["t1"]].groupby(key, sort=False)["ts"].min()
        e2 = df[df["event_type"] == s2].merge(
            t2.rename("t2"), left_on=key, right_index=True
        ).reset_index(drop=True)
        t3 = e2[e2["ts"] > e2["t2"]].groupby(key, sort=False)["ts"].min()
        reached = (
            pd.Series(1, index=t1.index, dtype=np.int64)
            .add(pd.Series(1, index=t2.index), fill_value=0)
            .add(pd.Series(1, index=t3.index), fill_value=0)
            .astype(np.int64)
        )
        return pa.table(
            {
                key: pa.array(reached.index.to_numpy(), type=pa.int64()),
                "reached": pa.array(reached.to_numpy(), type=pa.int64()),
            }
        )

    return (
        coalesce_narrow(ds.map_batches(prep, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
    )


def moving_window_avg(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    preceding: int = 3,
) -> ray.data.Dataset:
    """Per-key moving average over a ROW frame — SQL's
    ``AVG(v) OVER (PARTITION BY key ORDER BY ts, event_id
    ROWS BETWEEN <preceding> PRECEDING AND CURRENT ROW)`` — the
    smoothing / trailing-statistic primitive of an event-stream feature
    pipeline.

    Shape: ONE all-to-all of the minimal (event_id, key, ts, v_micro)
    payload hashed by ``key`` (every key's events co-locate, partitions
    hold ~|events|/P rows); inside a partition the frame sum is computed
    VECTORIZED ACROSS keys with one sort + cumsum-difference — the frame
    start of row i is ``max(i - preceding, first_row_of_its_key)``, so
    ``win_sum = cum[i] - cum[start-1]`` with no per-key python and no
    per-row loop.  At 100 TB a pathologically hot key concentrates one
    partition; the escape hatch (as in global_rank) is salting that
    key's rows and stitching frame boundaries, not wired because real
    event keys are user-grained.

    Values are micro-quantized (``round(v * 1e6)`` int64 — exact for
    this corpus's 2-decimal values) so the frame sum is an order-free
    integer the DuckDB oracle reproduces bit-for-bit; the final
    ``win_sum / (win_n * 1e6)`` division is one exact int->double op
    mirrored verbatim in SQL.

    Output: (event_id, user_id, v_micro, win_n, win_sum_micro,
    moving_avg)."""
    from docling_api_ray.stages.common import shuffle_partitions

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            (key, pa.int64()),
            ("v_micro", pa.int64()),
            ("win_n", pa.int64()),
            ("win_sum_micro", pa.int64()),
            ("moving_avg", pa.float64()),
        ]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b[key], dtype=np.int64)
        vm = np.rint(
            np.asarray(b["value"], dtype=np.float64) * 1e6
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": b["event_id"],
                key: b[key],
                "ts": b["ts"],
                "v_micro": pa.array(vm, type=pa.int64()),
                "__part": pa.array(
                    np.abs(uid) % shuffle_partitions(), type=pa.int64()
                ),
            }
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key, "ts", "event_id"], kind="stable")
        uid = df[key].to_numpy()
        vm = df["v_micro"].to_numpy(dtype=np.int64)
        n = len(df)
        if n == 0:
            return out_schema.empty_table()
        idx = np.arange(n, dtype=np.int64)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = uid[1:] != uid[:-1]
        key_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        start = np.maximum(idx - preceding, key_start)
        cum = np.cumsum(vm)
        win_sum = cum - np.where(start > 0, cum[start - 1], 0)
        win_n = idx - start + 1
        return pa.table(
            {
                "event_id": df["event_id"].to_numpy(),
                key: uid,
                "v_micro": vm,
                "win_n": win_n,
                "win_sum_micro": win_sum,
                "moving_avg": win_sum.astype(np.float64)
                / (win_n.astype(np.float64) * 1e6),
            }
        ).cast(out_schema)

    return (
        coalesce_narrow(ds.map_batches(prep, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
    )


def rolling_zscore(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    preceding: int = 7,
) -> ray.data.Dataset:
    """Per-key rolling z-score of each event's value against its own
    trailing ROW frame — the streaming anomaly-detection primitive (is
    this event unusual FOR THIS USER lately?), the windowed sibling of
    ``stats.grouped_zscore``.

    Same single-exchange shape as ``moving_window_avg`` (user-hash
    co-group, one in-partition sort, cumsum-DIFFERENCE frame sums
    vectorized across keys — here two cumsums: Σv and Σv²).  Exactness:
    with integer micro values, ``num = v·n − S`` and
    ``den² = n·SS − S²`` are exact int64s (v_micro ≤ 3.3e8 → v² ≤
    1.1e17, frame sums of ≤8 such < 2^63), so
    ``z = num / sqrt(den²)`` is two IEEE ops the SQL window mirror
    evaluates identically; frames with zero variance (including every
    frame of size 1) emit z = 0.

    Output: (event_id, user_id, v_micro, win_n, win_sum_micro, z)."""
    from docling_api_ray.stages.common import shuffle_partitions

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            (key, pa.int64()),
            ("v_micro", pa.int64()),
            ("win_n", pa.int64()),
            ("win_sum_micro", pa.int64()),
            ("z", pa.float64()),
        ]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = np.asarray(b[key], dtype=np.int64)
        vm = np.rint(
            np.asarray(b["value"], dtype=np.float64) * 1e6
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": b["event_id"],
                key: b[key],
                "ts": b["ts"],
                "v_micro": pa.array(vm, type=pa.int64()),
                "__part": pa.array(
                    np.abs(uid) % shuffle_partitions(), type=pa.int64()
                ),
            }
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key, "ts", "event_id"], kind="stable")
        uid = df[key].to_numpy()
        vm = df["v_micro"].to_numpy(dtype=np.int64)
        n = len(df)
        if n == 0:
            return out_schema.empty_table()
        idx = np.arange(n, dtype=np.int64)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = uid[1:] != uid[:-1]
        key_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        start = np.maximum(idx - preceding, key_start)
        cum = np.cumsum(vm)
        cumq = np.cumsum(vm * vm)
        win_sum = cum - np.where(start > 0, cum[start - 1], 0)
        win_sumq = cumq - np.where(start > 0, cumq[start - 1], 0)
        win_n = idx - start + 1
        num = (vm * win_n - win_sum).astype(np.float64)
        var_n2 = win_n * win_sumq - win_sum * win_sum
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(
                var_n2 > 0, num / np.sqrt(var_n2.astype(np.float64)), 0.0
            )
        return pa.table(
            {
                "event_id": df["event_id"].to_numpy(),
                key: uid,
                "v_micro": vm,
                "win_n": win_n,
                "win_sum_micro": win_sum,
                "z": z,
            }
        ).cast(out_schema)

    return (
        coalesce_narrow(ds.map_batches(prep, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
    )


def session_type_pairs(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    gap_s: int = 1800,
) -> ray.data.Dataset:
    """Within-session event-type CO-OCCURRENCE: for every gap-based
    session (same definition as ``session_windows``), each unordered
    pair of DISTINCT event types present in that session counts once;
    output (type_a, type_b, n_sessions) with ``type_a < type_b`` — the
    market-basket / next-action-affinity primitive over event streams.

    Partitioning: the same key-mod-P co-group as ``session_windows``
    (sessions never span partitions), fully vectorized inside each
    partition (sort + gap cumsum, one ``drop_duplicates`` to distinct
    (session, type), one self-merge on session id for the pairs —
    per-session type sets are tiny, so the self-merge is linear in
    practice); the per-partition pair counts are ≤|types|² rows each,
    and the cross-partition fold is a bounded tree
    (``bounded_groupby_sum`` over the |types|²-bounded pair domain)."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    P = _parts()

    def add_part(b: pa.Table) -> pa.Table:
        part = pc.subtract(b[key], pc.multiply(pc.divide(b[key], P), P))
        return b.append_column("__part", pc.cast(part, pa.int64()))

    pair_schema = pa.schema(
        [
            ("type_a", pa.string()),
            ("type_b", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def pairs_part(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key, "ts"], kind="stable")
        keys = df[key].to_numpy()
        sec = df["ts"].astype("int64").to_numpy() // US
        new = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            new[1:] = (keys[1:] != keys[:-1]) | ((sec[1:] - sec[:-1]) > gap_s)
        sid = np.cumsum(new) - 1
        d = pd.DataFrame(
            {"sid": sid, "t": df["event_type"].to_numpy()}
        ).drop_duplicates()
        m = d.merge(d, on="sid")
        m = m[m["t_x"] < m["t_y"]]
        g = (
            m.groupby(["t_x", "t_y"], sort=False)
            .size()
            .reset_index(name="n")
            .rename(columns={"t_x": "type_a", "t_y": "type_b"})
        )
        return pa.Table.from_pandas(
            g[pair_schema.names], schema=pair_schema, preserve_index=False
        ).replace_schema_metadata(None)

    partials = (
        coalesce_narrow(ds.map_batches(add_part, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(pairs_part), batch_format="pandas")
    )
    return bounded_groupby_sum(
        partials, ["type_a", "type_b"], sum_cols={"n_sessions": "n"}
    )


def session_transitions(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    gap_s: int = 1800,
) -> ray.data.Dataset:
    """Ordered next-event TRANSITIONS within sessions — the Markov-chain
    counterpart of ``session_type_pairs``: for consecutive events of the
    same session (ordered by (second, event_id), matching the SQL
    ``lag() OVER (ORDER BY sec, event_id)`` discipline), count each
    (from_type, to_type) adjacency; output (from_type, to_type, n_trans).

    Partitioning: the same key-mod-P co-group (sessions never span
    partitions); inside a partition the adjacency extraction is one
    sort + two shifted array compares — no per-user python.  The
    transition matrix is ≤|types|² rows, so the cross-partition fold is
    the bounded tree (``bounded_groupby_sum``)."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    P = _parts()

    def add_part(b: pa.Table) -> pa.Table:
        part = pc.subtract(b[key], pc.multiply(pc.divide(b[key], P), P))
        return b.append_column("__part", pc.cast(part, pa.int64()))

    t_schema = pa.schema(
        [
            ("from_type", pa.string()),
            ("to_type", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def trans_part(df: pd.DataFrame) -> pa.Table:
        sec = df["ts"].astype("int64").to_numpy() // US
        df = (
            df.assign(__sec=sec)
            .sort_values([key, "__sec", "event_id"], kind="stable")
        )
        keys = df[key].to_numpy()
        sec = df["__sec"].to_numpy()
        types = df["event_type"].to_numpy()
        if len(df) < 2:
            return t_schema.empty_table()
        same_session = (keys[1:] == keys[:-1]) & (
            (sec[1:] - sec[:-1]) <= gap_s
        )
        g = (
            pd.DataFrame(
                {
                    "from_type": types[:-1][same_session],
                    "to_type": types[1:][same_session],
                }
            )
            .groupby(["from_type", "to_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(
            g[["from_type", "to_type", "n"]], preserve_index=False
        ).replace_schema_metadata(None).cast(t_schema).replace_schema_metadata(None)

    partials = (
        coalesce_narrow(ds.map_batches(add_part, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(trans_part), batch_format="pandas")
    )
    return bounded_groupby_sum(
        partials, ["from_type", "to_type"], sum_cols={"n_trans": "n"}
    )


def top_event_per_user(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
) -> ray.data.Dataset:
    """Mode per group — each user's most frequent event type (ties break
    to the lexicographically smallest type): the per-entity dominant-
    category primitive (dominant language per domain, majority label per
    cluster, ...).

    Scale shape: per-batch PARTIAL (user, type, n) counts shrink the
    exchange to distinct-pair volume; ONE key-mod-P co-group then folds
    exact counts and takes the per-user argmax vectorized (sort by
    (user, n desc, type asc) + first-row-per-user mask — no per-user
    python).  Output is one row per user — corpus-proportional like any
    grouped result, but never concentrated: each partition emits only
    its own users."""
    P = _parts()

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {key: pc.cast(b[key], pa.int64()), "event_type": b["event_type"]}
        )
        g = t.group_by([key, "event_type"]).aggregate([([], "count_all")])
        g = g.rename_columns([key, "event_type", "n"])
        part = pc.subtract(
            g[key], pc.multiply(pc.divide(g[key], P), P)
        )
        return g.append_column("__part", pc.cast(part, pa.int64()))

    out_schema = pa.schema(
        [
            (key, pa.int64()),
            ("top_type", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def argmax_part(df: pd.DataFrame) -> pa.Table:
        g = (
            df.groupby([key, "event_type"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        g = g.sort_values(
            [key, "n", "event_type"],
            ascending=[True, False, True],
            kind="stable",
        )
        first = g.drop_duplicates(subset=[key], keep="first")
        first = first.rename(columns={"event_type": "top_type"})
        return pa.Table.from_pandas(
            first[[key, "top_type", "n"]], preserve_index=False
        ).replace_schema_metadata(None).cast(out_schema).replace_schema_metadata(None)

    return (
        coalesce_narrow(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(argmax_part), batch_format="pandas")
    )


def rolling_active_users(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    window_days: int = 7,
) -> ray.data.Dataset:
    """Trailing-window distinct actives (WAU for ``window_days=7``): for
    every OBSERVED activity day d, the number of distinct users active
    in [d−(w−1), d] — the sliding-distinct aggregate, which no plain
    grouped aggregate expresses because distinct does not decompose
    across overlapping windows.

    Scale shape: per-batch distinct (user, day) pairs first (activity
    compresses to user·day granularity before anything explodes); each
    pair then fans out to the ≤w report days it covers — the classic
    explode-to-window trick bounded by w, not the corpus; ONE
    (day-mod-P) co-group distincts (report_day, user) exactly and
    counts per day.  The observed-day set is TIME-bounded (days, not
    corpus rows) — folded once via a bounded grouped count and
    value-captured into the fan-out filter."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    day_us = 86_400 * US

    def day_pairs(b: pa.Table) -> pa.Table:
        day = (
            pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            // day_us
        )
        uid = pc.cast(b[key], pa.int64()).to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([uid, day], axis=1), axis=0)
        return pa.table(
            {
                key: pa.array(pairs[:, 0], pa.int64()),
                "day": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    pairs = ds.map_batches(day_pairs, batch_format="pyarrow")
    # observed-day set: bounded by the time range — fold + value-capture
    observed = np.sort(
        np.array(
            [
                r["day"]
                for r in bounded_groupby_sum(
                    pairs.select_columns(["day"]), ["day"], count_alias="n"
                ).take_all()
            ],
            dtype=np.int64,
        )
    )

    P = _parts()

    def fan_out(b: pa.Table) -> pa.Table:
        uid = np.asarray(b[key], dtype=np.int64)
        day = np.asarray(b["day"], dtype=np.int64)
        u = np.repeat(uid, window_days)
        d = (
            np.repeat(day, window_days)
            + np.tile(np.arange(window_days, dtype=np.int64), len(day))
        )
        keep = np.isin(d, observed)
        u, d = u[keep], d[keep]
        part = d % P
        return pa.table(
            {
                key: pa.array(u, pa.int64()),
                "report_day": pa.array(d, pa.int64()),
                "__part": pa.array(part, pa.int64()),
            }
        )

    out_schema = pa.schema(
        [("day_start", pa.int64()), ("active_users", pa.int64())]
    )

    def count_part(df: pd.DataFrame) -> pa.Table:
        d = df[["report_day", key]].drop_duplicates()
        g = (
            d.groupby("report_day", sort=False)[key]
            .nunique()
            .reset_index(name="active_users")
        )
        g["day_start"] = g["report_day"] * 86_400
        return pa.Table.from_pandas(
            g[["day_start", "active_users"]], preserve_index=False
        ).replace_schema_metadata(None).cast(out_schema).replace_schema_metadata(None)

    return (
        coalesce_narrow(pairs.map_batches(fan_out, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(count_part), batch_format="pandas")
    )


def grouped_running_total(
    ds: ray.data.Dataset,
    *,
    key: str,
    order: list[str],
    val: str,
    out: str = "running_q",
) -> ray.data.Dataset:
    """Per-key cumulative sum — ``sum(val) OVER (PARTITION BY key ORDER
    BY order...)`` — the prefix-aggregation window shape (running spend,
    cumulative token budget per source).

    ``val`` is a float column; it is quantized to int64 micro-units
    (floor(v·1e6 + 0.5)) BEFORE accumulation so the prefix sums are
    exact integers the DuckDB mirror reproduces bit-for-bit.

    Scale shape: ONE (key mod P) co-group exchange — all rows of a key
    land in one partition, where a single vectorized lexsort +
    ``groupby(key).cumsum`` (both C kernels) resolves every key in the
    partition at once.  Assumes a single key's rows fit a partition
    (orders-per-customer-class bound, same assumption as
    ``asof_join_events``); corpus growth adds partitions, not per-key
    rows.  Output: (key, order..., out) for every input row."""
    P = _parts()

    in_schema = pa.schema(
        [(key, pa.int64())]
        + [(c, pa.int64()) for c in order]
        + [("vq", pa.int64()), ("__part", pa.int64())]
    )

    def keyed(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return in_schema.empty_table()
        k = np.asarray(pc.cast(b[key], pa.int64()))
        v = np.asarray(b[val], dtype=np.float64)
        cols = {key: pa.array(k)}
        for c in order:
            cols[c] = pc.cast(b[c], pa.int64())
        cols["vq"] = pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64))
        cols["__part"] = pa.array(k % P)
        return pa.table(cols).cast(in_schema)

    out_schema = pa.schema(
        [(key, pa.int64())]
        + [(c, pa.int64()) for c in order]
        + [(out, pa.int64())]
    )

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([key, *order], kind="stable")
        g[out] = g.groupby(key, sort=False)["vq"].cumsum()
        return pa.Table.from_pandas(
            g[[key, *order, out]], preserve_index=False
        ).replace_schema_metadata(None).cast(out_schema).replace_schema_metadata(None)

    return (
        coalesce_narrow(ds.map_batches(keyed, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(per_partition), batch_format="pandas")
    )


def user_event_sequences(
    ds: ray.data.Dataset,
    *,
    k: int = 12,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    sep: str = ">",
) -> ray.data.Dataset:
    """Ordered collect_list per user: the first ``k`` event types by
    ``(ts, event_id)`` joined into one path string — the behavioral
    "journey" feature a sequence model or funnel analysis trains on.

    Shape: ONE (user mod P) exchange of the minimal (user, ts, id,
    type) payload, then everything in-partition: a stable vectorized
    sort, grouped cumcount head-``k`` mask, and the per-user join.  The
    string join itself is per-USER work (bounded by distinct users in
    the partition, each concatenating ≤ k short tokens) — not per-event
    python.  Truncating to ``k`` before the join bounds the output row
    width regardless of how hot a user is.

    Output: (user_id, n_events int64 = total events, seq string)."""
    P = _parts()

    def add_part(b: pa.Table) -> pa.Table:
        u = np.asarray(b[user_col], dtype=np.int64)
        return b.select([user_col, ts_col, id_col, type_col]).append_column(
            "__part", pa.array(u % P, type=pa.int64())
        )

    out_schema = pa.schema(
        [
            (user_col, pa.int64()),
            ("n_events", pa.int64()),
            ("seq", pa.string()),
        ]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.sort_values([user_col, ts_col, id_col], kind="stable")
        n = df.groupby(user_col, sort=True)[type_col].size()
        rn = df.groupby(user_col, sort=False).cumcount()
        head = df[rn.to_numpy() < k]
        seq = head.groupby(user_col, sort=True)[type_col].agg(sep.join)
        return pa.table(
            {
                user_col: pa.array(seq.index.to_numpy(dtype=np.int64)),
                "n_events": pa.array(n.to_numpy(dtype=np.int64)),
                "seq": pa.array(seq.to_numpy(dtype=object), type=pa.string()),
            }
        )

    return (
        coalesce_narrow(ds.map_batches(add_part, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
    )


_DECAY_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_events", pa.int64()),
        ("decay_micro", pa.int64()),
    ]
)

_DAY_US = 86_400 * US


def max_activity_day(ds: ray.data.Dataset, *, ts_col: str = "ts") -> int:
    """Corpus max activity day (days since epoch) as one scalar: 1-row
    per-block partial maxes, reduced driver-side over EVERY row of
    every iter_batches bundle (iter_batches coalesces the one-row
    partials — reading only row [0] silently drops partials)."""

    def day_max(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.schema([("d", pa.int64())]).empty_table()
        day = (
            pc.cast(b[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
            // _DAY_US
        )
        return pa.table({"d": pa.array([int(day.max())], type=pa.int64())})

    return max(
        (
            int(v)
            for blk in ds.select_columns([ts_col])
            .map_batches(day_max, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
            if len(blk)
            for v in blk["d"].to_pylist()
        ),
        # empty events dataset → no partials; anchor 0 keeps the decay
        # stages total functions (they emit empty tables downstream)
        default=0,
    )


def user_decay_score(
    ds: ray.data.Dataset, *, key: str = "user_id"
) -> ray.data.Dataset:
    """Per-user exponentially time-decayed activity score with a 1-day
    half-life — the recency-weighted engagement metric a data-selection
    pass uses to weight fresh interaction data over stale.

    INTEGER-exact decay: the anchor is the corpus's max activity day
    (one scalar folded from 1-row per-block partials); an event aged
    ``a`` days contributes ``⌊1e6 / 2^a⌋ = 1_000_000 >> a`` micro-units
    (0 from age 20 on — the natural truncation of the half-life), so
    per-user sums are order-free int64 arithmetic the SQL mirror
    (floor(1e6 / power(2.0, age)), exact because the denominator is a
    power of two) reproduces bit-for-bit.

    Scale shape: each batch pre-folds to (user, n, s) partials
    (np.unique + bincount); ONE narrow user-mod-P co-group sums the
    partials — no corpus-wide sort, nothing driver-side but the
    anchor scalar."""
    from docling_api_ray.stages.common import coalesce_narrow

    day_us = _DAY_US
    anchor = max_activity_day(ds)
    P = _parts()

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _DECAY_SCHEMA.empty_table()
        uid = pc.cast(b[key], pa.int64()).to_numpy(zero_copy_only=False)
        day = (
            pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            // day_us
        )
        age = anchor - day  # ≥ 0 by the anchor's definition
        w = np.where(
            age < 20, 1_000_000 >> np.minimum(age, 19), 0
        ).astype(np.int64)
        uniq, inv = np.unique(uid, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(uniq, type=pa.int64()),
                "n_events": pa.array(
                    np.bincount(inv, minlength=len(uniq)), type=pa.int64()
                ),
                "decay_micro": pa.array(
                    np.bincount(inv, weights=w, minlength=len(uniq)).astype(
                        np.int64
                    )
                ),
            }
        )

    def add_part(b: pa.Table) -> pa.Table:
        part = pc.subtract(
            b["user_id"],
            pc.multiply(pc.divide(b["user_id"], P), P),
        )
        return b.append_column("__part", pc.cast(part, pa.int64()))

    def fold(df) -> pa.Table:
        g = (
            df.groupby("user_id", sort=False)[["n_events", "decay_micro"]]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(
            g, schema=_DECAY_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        coalesce_narrow(
            ds.select_columns([key, "ts"])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(add_part, batch_format="pyarrow")
        )
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
    )


_PATH_SCHEMA = pa.schema([("path", pa.string()), ("n", pa.int64())])


def event_path_counts(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    sep: str = ">",
) -> ray.data.Dataset:
    """Partial counts of ordered 3-event paths (t0>t1>t2 over each
    user's (ts, event_id) timeline) — sequential pattern mining's
    workhorse unit, feeding the shared distributed top-k tail exactly
    like ``word_counts`` feeds vocab_topk.

    Shape: ONE (user mod P) exchange of the minimal 4-column payload;
    in-partition stable sort, trigram mask ensuring all three rows
    belong to one user (vectorized shifted compare — no per-event
    python), pandas value_counts partial.  Path cardinality is
    |event_types|³-bounded, so partials are tiny regardless of corpus
    size."""
    P = _parts()

    def add_part(b: pa.Table) -> pa.Table:
        u = np.asarray(b[user_col], dtype=np.int64)
        return b.select([user_col, ts_col, id_col, type_col]).append_column(
            "__part", pa.array(u % P, type=pa.int64())
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        if len(df) < 3:
            return _PATH_SCHEMA.empty_table()
        df = df.sort_values([user_col, ts_col, id_col], kind="stable")
        u = df[user_col].to_numpy()
        t = df[type_col].to_numpy(dtype=object)
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        if not same.any():
            return _PATH_SCHEMA.empty_table()
        paths = (
            t[:-2][same] + sep + t[1:-1][same] + sep + t[2:][same]
        )
        vals, cnts = np.unique(paths, return_counts=True)
        return pa.table(
            {
                "path": pa.array(vals.tolist(), type=pa.string()),
                "n": pa.array(cnts.astype(np.int64)),
            }
        )

    return (
        coalesce_narrow(ds.map_batches(add_part, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
    )


_RFM_USER_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("recency_days", pa.int64()),
        ("n_events", pa.int64()),
        ("v_micro", pa.int64()),
    ]
)

_RFM_OUT_SCHEMA = pa.schema(
    list(_RFM_USER_SCHEMA)
    + [
        ("r_q", pa.int64()),
        ("f_q", pa.int64()),
        ("m_q", pa.int64()),
        ("segment", pa.string()),
    ]
)


def rfm_segments(
    ds: ray.data.Dataset, *, key: str = "user_id"
) -> ray.data.Dataset:
    """RFM segmentation: each user's (recency_days since the corpus max
    day, event count, value sum) mapped to value-quartile codes —
    `segment` = "r.f.m" with each axis q = 1 + #{thresholds below} over
    the exact percentile_disc(0.25/0.5/0.75) thresholds of the USER
    table.  Ties share a quartile (threshold semantics, not NTILE), so
    no tie exchange is needed.

    Scale shape: events fold once to |users| narrow integer rows (one
    user-mod-P co-group; value summed in int64 micro-units np.rint·1e6,
    the established events convention); the 9 thresholds come from
    exact integer-histogram quantiles over that table (distinct-value
    bounded for recency/frequency; v_micro's distinct count is
    |users|-bounded — the loud bounded_groupby_sum histogram is the
    documented guard, grouped_quantile_cogroup the unbounded escape);
    the final pass is a stateless broadcast threshold attach."""
    from docling_api_ray.stages.stats import grouped_int_quantiles

    P = _parts()

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("n_events", pa.int64()),
                    ("last_day", pa.int64()),
                    ("v_micro", pa.int64()),
                ]
            ).empty_table()
        uid = pc.cast(b[key], pa.int64()).to_numpy(zero_copy_only=False)
        day = (
            pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            // _DAY_US
        )
        vm = np.rint(
            np.asarray(b["value"], dtype=np.float64) * 1e6
        ).astype(np.int64)
        uniq, inv = np.unique(uid, return_inverse=True)
        k = len(uniq)
        last = np.full(k, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(last, inv, day)
        return pa.table(
            {
                "user_id": pa.array(uniq, type=pa.int64()),
                "n_events": pa.array(
                    np.bincount(inv, minlength=k), type=pa.int64()
                ),
                "last_day": pa.array(last, type=pa.int64()),
                "v_micro": pa.array(
                    np.bincount(inv, weights=vm, minlength=k).astype(np.int64)
                ),
            }
        )

    def add_part(b: pa.Table) -> pa.Table:
        part = pc.subtract(
            b["user_id"], pc.multiply(pc.divide(b["user_id"], P), P)
        )
        return b.append_column("__part", pc.cast(part, pa.int64()))

    anchor = max_activity_day(ds)

    fold_schema = _RFM_USER_SCHEMA

    def fold(df) -> pa.Table:
        g = (
            df.groupby("user_id", sort=False)
            .agg(
                n_events=("n_events", "sum"),
                last_day=("last_day", "max"),
                v_micro=("v_micro", "sum"),
            )
            .reset_index()
        )
        return pa.table(
            {
                "user_id": pa.array(
                    g["user_id"].to_numpy(dtype=np.int64)
                ),
                "recency_days": pa.array(
                    anchor - g["last_day"].to_numpy(dtype=np.int64)
                ),
                "n_events": pa.array(
                    g["n_events"].to_numpy(dtype=np.int64)
                ),
                "v_micro": pa.array(
                    g["v_micro"].to_numpy(dtype=np.int64)
                ),
            }
        ).cast(fold_schema)

    users = (
        coalesce_narrow(
            ds.select_columns([key, "ts", "value"])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(add_part, batch_format="pyarrow")
        )
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
        .materialize()  # |users| narrow rows, consumed 4x below
    )

    if users.count() == 0:
        # no events → no users → no quantile thresholds to fold
        return ray.data.from_arrow(_RFM_OUT_SCHEMA.empty_table())

    def const_all(b: pa.Table) -> pa.Table:
        return b.append_column(
            "g", pa.array(["all"] * len(b), type=pa.string())
        )

    tagged = users.map_batches(const_all, batch_format="pyarrow")
    th = {}
    for col in ("recency_days", "n_events", "v_micro"):
        rows = grouped_int_quantiles(
            tagged,
            group_col="g",
            value_col=col,
            quantiles=(0.25, 0.5, 0.75),
        ).take_all()  # exactly one row
        th[col] = (rows[0]["p25"], rows[0]["p50"], rows[0]["p75"])
    tref = ray.put(th)

    def assign(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _RFM_OUT_SCHEMA.empty_table()
        t = ray.get(tref)

        def q(col):
            v = np.asarray(b[col], dtype=np.int64)
            t25, t50, t75 = t[col]
            return (
                1 + (v > t25).astype(np.int64) + (v > t50) + (v > t75)
            ).astype(np.int64)

        rq, fq, mq = q("recency_days"), q("n_events"), q("v_micro")
        seg = np.char.add(
            np.char.add(
                np.char.add(rq.astype(str), "."),
                np.char.add(fq.astype(str), "."),
            ),
            mq.astype(str),
        )
        out = b
        for name, arr in (("r_q", rq), ("f_q", fq), ("m_q", mq)):
            out = out.append_column(name, pa.array(arr, type=pa.int64()))
        return out.append_column(
            "segment", pa.array(seg.tolist(), type=pa.string())
        )

    return users.map_batches(assign, batch_format="pyarrow")


_BURST_SCHEMA = pa.schema(
    [
        ("event_type", pa.string()),
        ("day", pa.int64()),
        ("n", pa.int64()),
    ]
)


def burst_days(ds: ray.data.Dataset, *, sigma: int = 2) -> pa.Table:
    """Anomaly detection over the event stream: for each event type,
    the days whose count exceeds that type's mean + ``sigma``·σ over the
    corpus's observed-day grid (zero-filled — a type silent on a day
    counts 0, so σ reflects the full timeline).

    INTEGER-exact: the (type, day) counts fold through
    ``bounded_groupby_sum`` (domain = |types|·|days|, time-bounded, not
    corpus-bounded); the burst predicate is evaluated without a single
    float —

        n > μ + kσ  ⇔  (n·D − S) > 0  ∧  (n·D − S)² > k²·(D·Q − S²)

    with D = #days, S = Σn, Q = Σn² as unbounded Python ints, which the
    HUGEINT SQL mirror reproduces literally.  Output: the burst rows
    (event_type, day-since-epoch, n)."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    count_schema = pa.schema(
        [("event_type", pa.string()), ("day", pa.int64()), ("n", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return count_schema.empty_table()
        day = (
            pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            // _DAY_US
        )
        et = np.asarray(b["event_type"].to_pylist(), dtype=object)
        tu, ti = np.unique(et, return_inverse=True)
        du, di = np.unique(day, return_inverse=True)
        cnt = np.bincount(ti * len(du) + di, minlength=len(tu) * len(du))
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "event_type": pa.array(
                    tu[nz // len(du)].tolist(), type=pa.string()
                ),
                "day": pa.array(du[nz % len(du)], type=pa.int64()),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    folded = bounded_groupby_sum(
        ds.select_columns(["event_type", "ts"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["event_type", "day"],
        sum_cols={"n": "n"},
    ).take_all()  # |types|·|days| rows — time-bounded domain

    days = sorted({int(r["day"]) for r in folded})
    types = sorted({r["event_type"] for r in folded})
    D = len(days)
    cnt = {(r["event_type"], int(r["day"])): int(r["n"]) for r in folded}
    out_t, out_d, out_n = [], [], []
    for t in types:
        series = [cnt.get((t, d), 0) for d in days]
        S = sum(series)
        Q = sum(v * v for v in series)
        var_d2 = D * Q - S * S  # D²·σ² — exact int
        for d, v in zip(days, series):
            lhs = v * D - S
            if lhs > 0 and lhs * lhs > sigma * sigma * var_d2:
                out_t.append(t)
                out_d.append(d)
                out_n.append(v)
    return pa.table(
        {
            "event_type": pa.array(out_t, type=pa.string()),
            "day": pa.array(out_d, type=pa.int64()),
            "n": pa.array(out_n, type=pa.int64()),
        }
    )


_DIVERSITY_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_events", pa.int64()),
        ("n_types", pa.int64()),
        ("s_micro", pa.int64()),
        ("entropy", pa.float64()),
    ]
)


def user_event_diversity(
    ds: ray.data.Dataset, *, key: str = "user_id", type_col: str = "event_type"
) -> ray.data.Dataset:
    """Per-user behavioral diversity: distinct event-type count and the
    Shannon entropy of the user's type distribution — the
    one-trick-bot vs explorer signal interaction-data selection weighs.

    The ``grouped_entropy`` integer discipline in the UNBOUNDED-key
    regime: users grow with the corpus, so (user, type) counts
    pre-fold per batch and co-locate once via a user-mod-P exchange;
    per user H = ln(N) − Σᵢ⌊cᵢ·ln(cᵢ)·1e6⌉ / (N·1e6) with the inner
    terms int64-quantized (order-free) and the outer expression two
    deterministic float ops — bit-reproducible by the SQL mirror."""
    P = _parts()

    pair_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pair_schema.empty_table()
        uid = pc.cast(b[key], pa.int64()).to_numpy(zero_copy_only=False)
        et = np.asarray(b[type_col].to_pylist(), dtype=object)
        tu, ti = np.unique(et, return_inverse=True)
        uu, ui = np.unique(uid, return_inverse=True)
        cnt = np.bincount(ui * len(tu) + ti, minlength=len(uu) * len(tu))
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "user_id": pa.array(uu[nz // len(tu)], type=pa.int64()),
                "event_type": pa.array(
                    tu[nz % len(tu)].tolist(), type=pa.string()
                ),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    def add_part(b: pa.Table) -> pa.Table:
        part = pc.subtract(
            b["user_id"], pc.multiply(pc.divide(b["user_id"], P), P)
        )
        return b.append_column("__part", pc.cast(part, pa.int64()))

    def fold(df) -> pa.Table:
        if len(df) == 0:
            return _DIVERSITY_SCHEMA.empty_table()
        g = df.groupby(["user_id", "event_type"], sort=False)["n"].sum()
        df2 = g.reset_index()
        c = df2["n"].to_numpy(np.float64)
        term = np.rint(c * np.log(c) * 1e6).astype(np.int64)
        agg = pd.DataFrame(
            {
                "user_id": df2["user_id"].to_numpy(np.int64),
                "n": df2["n"].to_numpy(np.int64),
                "t": term,
            }
        ).groupby("user_id", sort=True).agg(
            n_events=("n", "sum"), n_types=("n", "size"), s_micro=("t", "sum")
        ).reset_index()
        nf = agg["n_events"].to_numpy(np.float64)
        ent = np.log(nf) - agg["s_micro"].to_numpy(np.float64) / (nf * 1e6)
        return pa.table(
            {
                "user_id": pa.array(
                    agg["user_id"].to_numpy(np.int64), type=pa.int64()
                ),
                "n_events": pa.array(
                    agg["n_events"].to_numpy(np.int64), type=pa.int64()
                ),
                "n_types": pa.array(
                    agg["n_types"].to_numpy(np.int64), type=pa.int64()
                ),
                "s_micro": pa.array(
                    agg["s_micro"].to_numpy(np.int64), type=pa.int64()
                ),
                "entropy": pa.array(ent, type=pa.float64()),
            }
        )

    return (
        coalesce_narrow(
            ds.select_columns([key, type_col])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(add_part, batch_format="pyarrow")
        )
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
    )


def event_debounce(
    ds: ray.data.Dataset,
    *,
    window_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """Telemetry debounce audit: within each (user, event_type) stream
    ordered by (ts, id), an event is KEPT iff it is the stream's first
    or its gap from the immediately PREVIOUS event is ≥ ``window_us``
    — the LAG-window debounce (SQL-exact; the keep-anchored variant
    that measures from the last KEPT event is sequential per stream
    and intentionally not this operator).  The readout is the bounded
    per-type summary (n_total, n_kept, kept_ratio): "how much of this
    event type is double-fire noise?".

    Scale shape: ONE user-hash exchange of the minimal (user, type,
    ts, id) payload; inside each partition every user's streams are
    whole, so one pandas sort + groupby-shift computes every gap
    vectorized (skew-guarded like the other per-user folds).  The
    per-partition output is already the ≤|types|-row partial count
    table; a ``bounded_groupby_sum`` fold and one int/int division
    finish it.  Output: (event_type, n_total, n_kept, kept_ratio),
    types ascending."""
    from docling_api_ray.stages.common import (
        bounded_groupby_sum,
        shuffle_partitions,
    )

    P = shuffle_partitions()
    w = int(window_us)

    def add_part(b: pa.Table) -> pa.Table:
        part = pc.subtract(
            b[user_col], pc.multiply(pc.divide(b[user_col], P), P)
        )
        return b.append_column("__part", pc.cast(part, pa.int64()))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.copy()
        g["ts_us"] = g[ts_col].astype("int64")
        g = g.sort_values(
            [user_col, type_col, "ts_us", id_col], kind="stable"
        )
        prev = g.groupby([user_col, type_col], sort=False)["ts_us"].shift(1)
        keep = prev.isna() | ((g["ts_us"] - prev) >= w)
        agg = (
            g.assign(__keep=keep.astype("int64"))
            .groupby(type_col, sort=False)
            .agg(n_total=(type_col, "size"), n_kept=("__keep", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None).cast(
            pa.schema(
                [
                    (type_col, pa.string()),
                    ("n_total", pa.int64()),
                    ("n_kept", pa.int64()),
                ]
            )
        )

    partials = (
        coalesce_narrow(
            ds.select_columns([user_col, type_col, ts_col, id_col])
            .map_batches(add_part, batch_format="pyarrow")
        )
        .groupby("__part")
        .map_groups(guard_fold(per_partition), batch_format="pandas")
    )
    totals = bounded_groupby_sum(
        partials,
        [type_col],
        sum_cols={"n_total": "n_total", "n_kept": "n_kept"},
    )

    def finish(b: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                (type_col, pa.string()),
                ("n_total", pa.int64()),
                ("n_kept", pa.int64()),
                ("kept_ratio", pa.float64()),
            ]
        )
        if len(b) == 0:
            return schema.empty_table()
        t = np.asarray(b["n_total"], dtype=np.int64)
        k = np.asarray(b["n_kept"], dtype=np.int64)
        types = np.asarray(b[type_col])
        order = np.argsort(types)
        return pa.table(
            {
                type_col: pa.array(types[order]),
                "n_total": pa.array(t[order], type=pa.int64()),
                "n_kept": pa.array(k[order], type=pa.int64()),
                "kept_ratio": pa.array(k[order] / t[order], type=pa.float64()),
            }
        )

    return totals.map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def funnel_step_latency(
    ds: ray.data.Dataset,
    *,
    steps: tuple[str, str] = ("view", "click"),
    key: str = "user_id",
) -> ray.data.Dataset:
    """Per-user time-to-convert between the first two funnel steps —
    the latency companion to ``funnel_reached``: for every user whose
    first ``steps[1]`` strictly follows their first ``steps[0]``, emit
    ``delta_us = first qualifying step1 − first step0`` in integer
    microseconds (the anchored semantics of funnel_reached, so the two
    queries agree on who converted).

    Same single user-hash exchange as funnel_reached; timestamps are
    cast to epoch µs in the map side so the fold is pure int64."""
    import pandas as pd

    from docling_api_ray.stages.common import shuffle_partitions

    s0, s1 = steps

    def prep(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"], value_set=pa.array([s0, s1]))
        b = b.filter(m)
        uid = np.asarray(b[key], dtype=np.int64)
        return pa.table(
            {
                key: b[key],
                "us": pc.cast(b["ts"], pa.int64()),
                "event_type": b["event_type"],
                "__part": pa.array(
                    np.abs(uid) % shuffle_partitions(), type=pa.int64()
                ),
            }
        )

    out_schema = pa.schema([(key, pa.int64()), ("delta_us", pa.int64())])

    def fold(df: "pd.DataFrame") -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        t1 = df[df["event_type"] == s0].groupby(key, sort=False)["us"].min()
        e1 = df[df["event_type"] == s1].merge(
            t1.rename("t1"), left_on=key, right_index=True
        ).reset_index(drop=True)
        q = e1[e1["us"] > e1["t1"]]
        t2 = q.groupby(key, sort=False)["us"].min()
        d = (t2 - t1.loc[t2.index]).astype(np.int64)
        return pa.table(
            {
                key: pa.array(d.index.to_numpy(np.int64), type=pa.int64()),
                "delta_us": pa.array(d.to_numpy(np.int64), type=pa.int64()),
            }
        ).cast(out_schema)

    from docling_api_ray.stages.common import coalesce_narrow, guard_fold

    return (
        coalesce_narrow(ds.map_batches(prep, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
    )
