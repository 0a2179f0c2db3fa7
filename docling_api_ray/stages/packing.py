"""Sequence packing for LLM pretraining data prep: concat-and-chunk.

Documents are conceptually concatenated per ``source`` in ``doc_id``
order and sliced into fixed ``chunk_tokens``-token training sequences;
each document is assigned the chunk id and intra-chunk offset where its
first token lands.  This is the standard pretraining packing layout
(concatenate-then-chunk), and — unlike greedy bin packing — it is a pure
function of the per-source token prefix sum, so it distributes as a
classic two-phase scan:

1. one streaming pass folds per-(source, bucket) token sums, where
   ``bucket = doc_id // bucket_size`` (group size bounded by
   ``bucket_size`` docs, never corpus-proportional);
2. the bucket-sum table (``corpus / bucket_size`` narrow rows) is
   prefix-summed and broadcast via ``ray.put`` once, and a co-grouped
   second pass computes within-bucket exclusive cumsums + the broadcast
   bucket base.

The bucket-sum table is the one driver-side object; at 10^12 docs pick
``bucket_size`` ~1e6 (1e6 rows of 24 B) or add one more scan level
(bucket-of-buckets) — the fold is associative, so the tree extends to
any depth.  Reference parity: the reference has no packing operator;
this is a training-data extension (task brief)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from docling_api_ray.stages.text_analysis import WS_TOKEN_RE, _count

DEFAULT_CHUNK_TOKENS = 512
DEFAULT_BUCKET_SIZE = 65536


def pack_chunks(
    ds: ray.data.Dataset,
    *,
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> ray.data.Dataset:
    """(doc_id, source, n_tokens, chunk_id, chunk_pos) per document.

    ``chunk_id`` / ``chunk_pos`` locate the document's first token in
    the per-source concat-and-chunk stream: exclusive prefix sum of
    whitespace-token counts in ``doc_id`` order, div/mod
    ``chunk_tokens``."""

    def tokenize(b: pa.Table) -> pa.Table:
        n_tok = pc.cast(_count(pc.fill_null(b[text_col], ""), WS_TOKEN_RE), pa.int64())
        did = np.asarray(b[id_col], dtype=np.int64)
        bucket = did // bucket_size
        src = pc.cast(b[source_col], pa.string())
        return pa.table(
            {
                id_col: b[id_col],
                source_col: src,
                "n_tokens": n_tok,
                "__bkey": pc.binary_join_element_wise(
                    src, pc.cast(pa.array(bucket), pa.string()), "#"
                ),
            }
        )

    # materialized NARROW projection (4 small columns) — both scan
    # phases read it, so tokenization runs once, not twice
    toks = ds.select_columns([id_col, source_col, text_col]).map_batches(
        tokenize, batch_format="pyarrow"
    ).materialize()

    # phase 1: per-(source, bucket) token sums — narrow aggregate, then
    # an exclusive prefix per source over the bucket table.  The table
    # is corpus/bucket_size rows (docstring: tree-extend for 10^12).
    # bundle before both sort-based groupbys: over-split narrow blocks
    # leave empty sort ranges (0-column blocks, the schema warning)
    from docling_api_ray.stages.common import coalesce_narrow

    bundled = coalesce_narrow(toks)
    sums = bundled.select_columns(["__bkey", "n_tokens"]).groupby(
        "__bkey"
    ).sum("n_tokens")
    rows = sums.take_all()
    base: dict[str, int] = {}
    parsed = []
    for r in rows:
        src, bstr = r["__bkey"].rsplit("#", 1)
        parsed.append((src, int(bstr), int(r["sum(n_tokens)"])))
    parsed.sort()
    run: dict[str, int] = {}
    for src, b, s in parsed:
        base[f"{src}#{b}"] = run.get(src, 0)
        run[src] = run.get(src, 0) + s
    base_ref = ray.put(base)

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            (source_col, pa.string()),
            ("n_tokens", pa.int64()),
            ("chunk_id", pa.int64()),
            ("chunk_pos", pa.int64()),
        ]
    )

    def assign(df: pd.DataFrame) -> pa.Table:
        # one bucket per group: sort by doc_id, exclusive cumsum + the
        # broadcast per-bucket base offset
        b = ray.get(base_ref)
        df = df.sort_values(id_col, kind="stable")
        tok = df["n_tokens"].to_numpy(dtype=np.int64)
        excl = np.concatenate(([0], np.cumsum(tok)[:-1]))
        off = excl + b[df["__bkey"].iloc[0]]
        out = pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                source_col: df[source_col].to_numpy(),
                "n_tokens": tok,
                "chunk_id": off // chunk_tokens,
                "chunk_pos": off % chunk_tokens,
            }
        )
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False).replace_schema_metadata(None)

    return bundled.groupby("__bkey").map_groups(assign, batch_format="pandas")
