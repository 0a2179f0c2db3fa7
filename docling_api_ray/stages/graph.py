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
single component's nodes+edges fit a partition; beyond that the
fallback is the textbook per-iteration join/aggregate loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from docling_api_ray.stages.common import coalesce_narrow, shuffle_partitions
from docling_api_ray.stages.dedup import connected_components
from docling_api_ray.stages.joins import hash_join

BASE_Q = 150_000      # (1 - d) in micro-units
DAMP_Q = 850_000      # d in micro-units
INIT_Q = 1_000_000    # initial rank per node
UNIT = 1_000_000


def _component_cogroup(
    nodes: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Shared assembly of the per-component co-group both graph
    operators ride: label nodes with their connected component, tag
    every node row (side 0, dst = -1) and every bidirected edge row
    (side 1) with ``__part = component % P``, and union them so ONE
    sort exchange lands a whole component's nodes+edges in a single
    partition.  Isolated nodes label themselves.  Callers group by
    ``__part`` and run their per-component fold vectorized
    in-partition."""
    P = shuffle_partitions()

    # pairs feeds TWO consumers (component labeling and the edge join);
    # materialize once so the candidate generator doesn't re-execute —
    # the pair table is duplicate-structure-bounded, the same bound
    # connected_components itself rides
    pairs = pairs.materialize()
    comp = connected_components(pairs)  # (node, component), edge nodes only

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

    edge_schema = pa.schema([("node", pa.int64()), ("dst", pa.int64())])
    comp_schema = pa.schema([("node", pa.int64()), ("component", pa.int64())])
    edges = hash_join(
        pairs.map_batches(bidirect, batch_format="pyarrow"),
        comp,
        on="node",
        how="inner",
        schemas=(edge_schema, comp_schema),
    )

    # every node, labeled: edge nodes by their component, isolated by
    # themselves (left join against the bounded-by-duplicate-structure
    # component table)
    node_schema = pa.schema([("node", pa.int64())])

    def as_node(b: pa.Table) -> pa.Table:
        return pa.table({"node": b[id_col].cast(pa.int64())})

    labeled = hash_join(
        nodes.map_batches(as_node, batch_format="pyarrow"),
        comp,
        on="node",
        how="left",
        schemas=(node_schema, comp_schema),
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


def pagerank(
    nodes: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    iters: int = 3,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Unnormalized integer PageRank over the undirected ``pairs`` edge
    list, evaluated for EVERY id in ``nodes`` (isolated nodes converge
    to BASE_Q immediately).  Output: (doc_id, rank_q) int64."""
    union = _component_cogroup(nodes, pairs, id_col=id_col)

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
        .map_groups(per_partition, batch_format="pandas")
    )


def triangle_counts(
    nodes: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
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
    component's nodes+edges+wedges fit a partition.  Near-dup components
    after banding are duplicate-structure-bounded; the escape hatch for
    a pathological giant clique is streaming the wedge join in
    center-node chunks — not wired, named here for the audit.

    Output: (doc_id, triangles, deg) int64, one row per input node
    (isolated nodes count 0 / 0)."""
    union = _component_cogroup(nodes, pairs, id_col=id_col)

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
        .map_groups(per_partition, batch_format="pandas")
    )
