"""Join operators (SURVEY.md §2.4 — the reference has only format-dispatch
routing; these are the engine's general-purpose joins for the
training-data pipelines, following the guide patterns):

- broadcast join: small side via ``ray.put`` + vectorized lookup
  (implemented inline where used, e.g. docs_region_join);
- ``hash_join``: both-sides-large partitioned hash join — bucket column
  on both sides, tagged union, one ``groupby(bucket)`` co-group, pandas
  merge per bucket.  The bucket count B bounds per-group memory; salt
  hot keys into sub-buckets by raising B.  Keys must be integers here
  (hash strings to int64 first — e.g. stages/dedup._stable_u64).
- ``asof_join_events``: per-key ordered as-of join (pd.merge_asof per
  user group) — the classic event-attribution shape Ray Data lacks.
  Partitioning assumption: all rows of one key fit one group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


US = 1_000_000


def _pad_columns(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Extend every batch to ``schema`` (missing columns become nulls) so
    two sides with different columns can union for the co-group."""

    def pad(b: pa.Table) -> pa.Table:
        arrays = []
        for f in schema:
            if f.name in b.column_names:
                arrays.append(pc.cast(b[f.name], f.type))
            else:
                arrays.append(pa.nulls(len(b), type=f.type))
        return pa.Table.from_arrays(arrays, schema=schema)

    return ds.map_batches(pad, batch_format="pyarrow")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    how: str = "inner",
    num_buckets: int = 32,
    schemas: tuple[pa.Schema, pa.Schema] | None = None,
) -> ray.data.Dataset:
    """Partitioned hash join of two datasets on an int64 key column named
    ``on`` in BOTH sides; non-key column names must be disjoint.

    ``how`` accepts pandas merge modes plus the existence joins
    ``"semi"`` / ``"anti"`` (left rows whose key does / does not appear
    on the right — project the right side to its key column before
    calling; per-bucket one vectorized ``isin``, no row multiplication).

    ``schemas=(left_schema, right_schema)`` skips the ``ds.schema()``
    probes.  Pass it whenever the caller statically knows both layouts:
    each probe EXECUTES a limit-1 dataset, and the resulting rapid
    create/teardown churn of tiny datasets is what races Ray 2.49's
    driver reference counter (reference_count.cc:581
    ``submitted_task_ref_count > 0`` CHECK crash, observed 2026-08-18
    03:40 during a bench battery — the probe pair for one join finished
    back-to-back <1 s before the crash)."""
    def arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
        # pandas-block datasets (e.g. a prior hash_join's map_groups
        # output) expose a PandasBlockSchema whose base_schema is a list,
        # not a pa.Schema — rebuild from names/types in that case
        s = ds.schema()
        base = getattr(s, "base_schema", None)
        if isinstance(base, pa.Schema):
            return base
        return pa.schema(
            [pa.field(n, t) for n, t in zip(s.names, s.types)]
        )

    if schemas is not None:
        lschema, rschema = schemas
    else:
        lschema = arrow_schema(left)
        rschema = arrow_schema(right)
    lcols = [f for f in lschema if f.name != on]
    rcols = [f for f in rschema if f.name != on]
    combined = pa.schema(
        [pa.field(on, pa.int64())]
        + lcols
        + rcols
        + [pa.field("__side", pa.int8()), pa.field("__bucket", pa.int64())]
    )

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            key = pc.cast(b[on], pa.int64())
            b = b.set_column(b.schema.get_field_index(on), on, key)
            b = b.append_column(
                "__side", pa.array(np.full(len(b), side, dtype=np.int8))
            )
            bucket = pc.subtract(
                key, pc.multiply(pc.divide(key, num_buckets), num_buckets)
            )
            return b.append_column("__bucket", pc.cast(bucket, pa.int64()))

        return fn

    # bundle each side BEFORE tagging: a selective caller filter fused
    # in front of tag() can empty a whole task's input, and a fused
    # chain whose task input is empty never calls the UDF — Ray then
    # builds a 0-column block (the 'different schema' executor warning).
    # Bundling mixes empty filter outputs with non-empty siblings so
    # every tag task sees rows; 65k cap since join rows can be wide.
    from docling_api_ray.stages.common import coalesce_narrow, guard_fold

    lt = _pad_columns(
        coalesce_narrow(left, max_rows=65_536).map_batches(
            tag(0), batch_format="pyarrow"
        ),
        combined,
    )
    rt = _pad_columns(
        coalesce_narrow(right, max_rows=65_536).map_batches(
            tag(1), batch_format="pyarrow"
        ),
        combined,
    )
    union = lt.union(rt)

    lnames = [f.name for f in lcols]
    rnames = [f.name for f in rcols]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lpart = g[g["__side"] == 0][[on] + lnames]
        if how in ("semi", "anti"):
            # existence joins: only the key column of the right side
            # matters — one vectorized isin per bucket, left columns
            # pass through untouched (no row multiplication)
            rkeys = g.loc[g["__side"] == 1, on].unique()
            mask = lpart[on].isin(rkeys)
            return lpart[mask if how == "semi" else ~mask]
        rpart = g[g["__side"] == 1][[on] + rnames]
        out = lpart.merge(rpart, on=on, how=how)
        return out

    # bundle-coalesce, not repartition: merges tiny blocks into one task
    # with NO all-to-all (repartition(P) leaves P blocks → up to P empty
    # sort ranges when distinct buckets < P, the schema-warning source);
    # 65k-row cap since generic join rows can be wide
    from docling_api_ray.stages.common import coalesce_narrow

    return coalesce_narrow(union, max_rows=65_536).groupby(
        "__bucket"
    ).map_groups(
        # skew guard (common.guard_fold): a hot JOIN KEY concentrates its
        # bucket in one pandas partition — fail loudly with the hottest
        # key's row count instead of OOMing the worker
        guard_fold(merge, key_col=on),
        batch_format="pandas",
    )


def broadcast_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    how: str = "inner",
    schemas: tuple[pa.Schema, pa.Schema] | None = None,
    broadcast_max: int = 5_000_000,
) -> ray.data.Dataset:
    """Join where the RIGHT side is expected small (a pre-filtered
    dimension): the right table materializes once, and if it holds at
    most ``broadcast_max`` rows it is ``ray.put`` ONCE and attached in a
    stateless vectorized pass over the streaming left side — the big
    side shuffles NOTHING (vs ``hash_join``'s all-to-all of both).
    Above the guard it falls back to ``hash_join`` transparently, so
    callers can use it wherever a dimension is *usually* small without
    betting correctness or memory on it (the dedup_keep guard pattern).

    Same contract as ``hash_join``: int64 key named ``on`` in both
    sides, disjoint non-key names, output columns [on] + left-others +
    right-others.  ``how``: inner / left / semi / anti.  Unique-key
    right sides attach via one ``np.searchsorted`` per batch; duplicate
    keys fall back to a per-batch ``pd.merge`` against the broadcast
    frame (still vectorized, rows multiply as SQL requires)."""
    right = right.materialize()
    if right.count() > broadcast_max:
        return hash_join(
            left, right, on=on, how=how, schemas=schemas
        )
    rtbl = pa.concat_tables(
        [pa.table(dict(zip(b.column_names, b.columns))) for b in
         right.iter_batches(batch_format="pyarrow", batch_size=None)]
    ) if right.count() else None
    if schemas is not None:
        lschema, rschema = schemas
    else:
        lschema = None
        rschema = None
    if rtbl is None:
        # empty right: build an empty table from the declared schema so
        # inner/semi produce typed empties and left/anti pass through
        assert rschema is not None, (
            "broadcast_join on an empty right side needs schemas="
        )
        rtbl = rschema.empty_table()
    rnames = [c for c in rtbl.column_names if c != on]
    rkeys_raw = np.asarray(rtbl[on], dtype=np.int64)
    order = np.argsort(rkeys_raw, kind="stable")
    rkeys = rkeys_raw[order]
    unique_right = bool(len(rkeys) == 0 or (rkeys[1:] != rkeys[:-1]).all())

    def _hits(k: np.ndarray, keys: np.ndarray):
        pos = np.searchsorted(k, keys)
        posc = np.clip(pos, 0, max(len(k) - 1, 0))
        hit = (k[posc] == keys) if len(k) else np.zeros(
            len(keys), dtype=bool
        )
        return posc, hit

    # ship exactly ONE broadcast object, holding only what the chosen
    # path reads (review r4: the dict+frame double-put fetched both per
    # batch); `how`/`unique_right` are plain closure captures
    if how in ("semi", "anti"):
        ref = ray.put(rkeys)  # existence joins read keys only

        def attach(b: pa.Table) -> pa.Table:
            keys = np.asarray(pc.cast(b[on], pa.int64()))
            _posc, hit = _hits(ray.get(ref), keys)
            return b.filter(pa.array(hit if how == "semi" else ~hit))

    elif unique_right:
        rcols_sorted = {
            c: rtbl[c].combine_chunks().take(pa.array(order))
            for c in rnames
        }
        ref = ray.put((rkeys, rcols_sorted))

        def attach(b: pa.Table) -> pa.Table:
            k, cols_sorted = ray.get(ref)
            keys = np.asarray(pc.cast(b[on], pa.int64()))
            posc, hit = _hits(k, keys)
            if how == "inner":
                bsel = b.filter(pa.array(hit))
                take = pa.array(posc[hit])
                return pa.table(
                    {on: pc.cast(bsel[on], pa.int64())}
                    | {c: bsel[c] for c in b.column_names if c != on}
                    | {c: cols_sorted[c].take(take) for c in rnames}
                )
            # left join: misses become nulls
            out_cols = {on: pc.cast(b[on], pa.int64())}
            out_cols |= {c: b[c] for c in b.column_names if c != on}
            if len(k) == 0:
                for c in rnames:
                    out_cols[c] = pa.nulls(
                        len(b), type=cols_sorted[c].type
                    )
                return pa.table(out_cols)
            take = pa.array(
                np.where(hit, posc, 0).astype(np.int64)
            )
            hit_arr = pa.array(hit)
            for c in rnames:
                vals = cols_sorted[c].take(take)
                out_cols[c] = pc.if_else(
                    hit_arr, vals, pa.scalar(None, vals.type)
                )
            return pa.table(out_cols)

    else:
        # duplicate right keys: per-batch pandas merge (rows multiply)
        ref = ray.put(rtbl.to_pandas())

        def attach(b: pa.Table) -> pa.Table:
            ldf = b.to_pandas()
            ldf[on] = ldf[on].astype(np.int64)
            merged = ldf.merge(ray.get(ref), on=on, how=how)
            lnames = [c for c in b.column_names if c != on]
            return pa.Table.from_pandas(
                merged[[on] + lnames + rnames], preserve_index=False
            ).replace_schema_metadata(None)

    # bundle before attach for the same reason hash_join bundles before
    # tag(): a selective caller filter fused in front can empty a whole
    # task's input, skipping attach and emitting a 0-column block
    from docling_api_ray.stages.common import coalesce_narrow

    return coalesce_narrow(left, max_rows=65_536).map_batches(
        attach, batch_format="pyarrow"
    )


def asof_join_events(
    events: ray.data.Dataset,
    *,
    left_type: str,
    right_type: str,
    key: str = "user_id",
) -> ray.data.Dataset:
    """For each event of ``left_type``, attribute the most recent event of
    ``right_type`` with the same key and ts <= left.ts (backward as-of).

    Output: (event_id, user_id, ts_us, matched_event_id, matched_ts_us)
    with -1 sentinels for unmatched rows (null-free for stable compares).
    Tie discipline: among equal-ts candidates the max event_id wins (both
    sides pre-sorted by (ts, event_id); merge_asof takes the last)."""

    def keep(types: tuple[str, ...]):
        def fn(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b["event_type"], value_set=pa.array(list(types))))

        return fn

    filtered = events.map_batches(
        keep((left_type, right_type)), batch_format="pyarrow"
    )

    # co-group keys to ~core-count partitions (key mod P): a per-KEY
    # map_groups pays Ray's ~1 ms group dispatch for every user, while
    # pd.merge_asof(by=key) inside each partition handles ALL its users
    # in one vectorized pass (both sides globally sorted on the ON key,
    # equal-ts ties resolved to the max event_id by the secondary sort)
    from docling_api_ray.stages.common import shuffle_partitions

    P = shuffle_partitions()

    def add_part(b: pa.Table) -> pa.Table:
        part = pc.subtract(b[key], pc.multiply(pc.divide(b[key], P), P))
        return b.append_column("__part", pc.cast(part, pa.int64()))

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            (key, pa.int64()),
            ("ts_us", pa.int64()),
            ("matched_event_id", pa.int64()),
            ("matched_ts_us", pa.int64()),
        ]
    )

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.copy()
        g["ts_us"] = g["ts"].astype("int64")
        left = (
            g[g["event_type"] == left_type]
            .sort_values(["ts_us", "event_id"], kind="stable")
        )
        right = (
            g[g["event_type"] == right_type]
            .sort_values(["ts_us", "event_id"], kind="stable")
        )
        if len(left) == 0:
            return out_schema.empty_table()
        merged = pd.merge_asof(
            left[["event_id", key, "ts_us"]],
            right[["event_id", key, "ts_us"]].rename(
                columns={"event_id": "matched_event_id", "ts_us": "matched_ts_us"}
            ),
            left_on="ts_us",
            right_on="matched_ts_us",
            by=key,
            direction="backward",
        )
        for c in ("matched_event_id", "matched_ts_us"):
            merged[c] = merged[c].fillna(-1).astype("int64")
        return pa.Table.from_pandas(
            merged[["event_id", key, "ts_us", "matched_event_id", "matched_ts_us"]],
            preserve_index=False,
        ).replace_schema_metadata(None).cast(out_schema)

    from docling_api_ray.stages.common import coalesce_narrow

    return (
        coalesce_narrow(
            filtered.map_batches(add_part, batch_format="pyarrow"),
            max_rows=65_536,
        )
        .groupby("__part")
        .map_groups(per_partition, batch_format="pandas")
    )


def interval_join_events(
    events: ray.data.Dataset,
    *,
    left_type: str,
    right_type: str,
    window_s: int,
    key: str = "user_id",
) -> ray.data.Dataset:
    """Range (interval) join: for each event of ``left_type``, the count
    and quantized value-sum of same-``key`` ``right_type`` events in the
    trailing window ``[ts - window_s, ts)`` — the sliding-window join
    shape (ad attribution, fraud velocity checks) that Ray Data has no
    native operator for.

    Output: (event_id, user_id, n_prior, sum_value_q) for EVERY left
    event (zeros when the window is empty); values quantized to int64
    micro-units (floor(v·1e6 + 0.5)) so the DuckDB mirror matches
    exactly.

    Scale shape — bucketed replication co-group (the standard bounded-
    range join plan): time is cut into buckets of exactly the window
    width, each RIGHT event is replicated to its own bucket and the
    next (a trailing window spans at most 2 buckets), and the pair
    (key, bucket) is hash-co-grouped mod P.  Every left's full window
    is then resolvable inside one partition, each right candidate
    appears exactly once per group, and the exchange moves each
    filtered right row exactly twice — never an all-pairs blowup, and
    skewed keys still spread across time buckets.  Inside a partition
    the probe is fully vectorized: group-offset composite keys +
    ``np.searchsorted`` + prefix sums (no per-row or per-group python).
    Composite-key headroom: key = g·(2W+2) + rel with rel < 2W, so it
    needs groups-per-partition × 2W < 2⁶³ — at W = hours that allows
    ~10⁷ groups per partition; raise P before that.
    """
    window_us = int(window_s) * US
    span = 2 * window_us + 2

    from docling_api_ray.stages.common import coalesce_narrow, shuffle_partitions

    P = shuffle_partitions()

    tag_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            (key, pa.int64()),
            ("ts_us", pa.int64()),
            ("vq", pa.int64()),
            ("bucket", pa.int64()),
            ("__side", pa.int8()),
            ("__part", pa.int64()),
        ]
    )

    def tag(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return tag_schema.empty_table()
        et = b["event_type"]
        ts = np.asarray(pc.cast(b["ts"], pa.int64()))
        uid = np.asarray(b[key], dtype=np.int64)
        eid = np.asarray(b["event_id"], dtype=np.int64)
        val = np.asarray(b["value"], dtype=np.float64)
        vq = np.floor(val * 1e6 + 0.5).astype(np.int64)
        bucket = ts // window_us
        is_l = np.asarray(pc.equal(et, left_type))
        is_r = np.asarray(pc.equal(et, right_type))

        parts = []
        for side, mask, bshift in ((0, is_l, 0), (1, is_r, 0), (1, is_r, 1)):
            if not mask.any():
                continue
            bk = bucket[mask] + bshift
            parts.append(
                pa.table(
                    {
                        "event_id": pa.array(eid[mask]),
                        key: pa.array(uid[mask]),
                        "ts_us": pa.array(ts[mask]),
                        "vq": pa.array(vq[mask]),
                        "bucket": pa.array(bk),
                        "__side": pa.array(
                            np.full(mask.sum(), side, dtype=np.int8)
                        ),
                        "__part": pa.array(
                            (uid[mask] * 2654435761 + bk) % P
                        ),
                    }
                )
            )
        if not parts:
            return tag_schema.empty_table()
        return pa.concat_tables(parts).cast(tag_schema)

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            (key, pa.int64()),
            ("n_prior", pa.int64()),
            ("sum_value_q", pa.int64()),
        ]
    )

    def per_partition(g: pd.DataFrame) -> pa.Table:
        left = g[g["__side"] == 0]
        if len(left) == 0:
            return out_schema.empty_table()
        # group ids over (key, bucket) across both sides — one C pass
        gid = g.groupby([key, "bucket"], sort=False).ngroup().to_numpy()
        gl, gr = gid[(g["__side"] == 0).to_numpy()], gid[(g["__side"] == 1).to_numpy()]
        right = g[g["__side"] == 1]

        lt = left["ts_us"].to_numpy()
        lb = left["bucket"].to_numpy()
        rt = right["ts_us"].to_numpy()
        rb = right["bucket"].to_numpy()
        rv = right["vq"].to_numpy()

        # composite sort keys: rel ∈ [0, 2W) offsets from (bucket-1)·W
        kr = gr * span + (rt - (rb - 1) * window_us) + 1
        order = np.argsort(kr, kind="stable")
        kr = kr[order]
        psum = np.concatenate([[0], np.cumsum(rv[order])])

        klo = gl * span + (lt - window_us - (lb - 1) * window_us) + 1
        khi = gl * span + (lt - (lb - 1) * window_us) + 1
        ilo = np.searchsorted(kr, klo, side="left")
        ihi = np.searchsorted(kr, khi, side="left")
        return pa.table(
            {
                "event_id": pa.array(left["event_id"].to_numpy()),
                key: pa.array(left[key].to_numpy()),
                "n_prior": pa.array((ihi - ilo).astype(np.int64)),
                "sum_value_q": pa.array(psum[ihi] - psum[ilo]),
            }
        ).cast(out_schema)

    filtered = events.map_batches(tag, batch_format="pyarrow")
    return (
        coalesce_narrow(filtered, max_rows=65_536)
        .groupby("__part")
        .map_groups(per_partition, batch_format="pandas")
    )
