"""End-to-end training-data curation pipeline — the composition the
individual operators exist for:

    paragraph dedup (boilerplate removal, corpus-wide first-wins)
      → hash join of the surviving clean_text back to (doc_id, source)
      → Gopher-rule quality filter over the CLEANED text
      → concat-and-chunk sequence packing of the survivors

Output: (doc_id, source, n_tokens, chunk_id, chunk_pos) — the packed
training-sequence layout of the curated corpus.  Every stage is the
already-oracle-verified operator; this module only wires them, and the
``curate_pack`` SQL oracle in ``__ray_entry__`` mirrors the whole chain
as one CTE pipeline.

Scale shape: paragraph dedup's two narrow exchanges + one bucketed hash
join + a stateless filter + the two-phase packing scan.  No stage
materializes the corpus on the driver; the only driver-side object is
packing's bucket-sum table (corpus/bucket_size rows)."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from docling_api_ray.stages.dedup import paragraph_dedup
from docling_api_ray.stages.joins import hash_join
from docling_api_ray.stages.packing import pack_chunks
from docling_api_ray.stages.text_analysis import gopher_quality


def curate_pack(
    docs: ray.data.Dataset,
    *,
    para_words: int = 8,
    chunk_tokens: int = 512,
) -> ray.data.Dataset:
    """Curated + packed corpus over ``(doc_id, source, text)``."""
    cleaned = paragraph_dedup(
        docs, para_words=para_words
    ).select_columns(["doc_id", "clean_text"])
    with_src = hash_join(
        cleaned, docs.select_columns(["doc_id", "source"]), on="doc_id",
        schemas=(
            pa.schema([("doc_id", pa.int64()), ("clean_text", pa.string())]),
            pa.schema([("doc_id", pa.int64()), ("source", pa.string())]),
        ),
    )

    def keep_quality(b: pa.Table) -> pa.Table:
        # gopher_quality emits one metrics row per input row, in input
        # order — its keep column filters this batch directly
        g = gopher_quality(b, text_col="clean_text")
        return b.filter(g.column("keep"))

    kept = with_src.map_batches(keep_quality, batch_format="pyarrow")
    return pack_chunks(kept, chunk_tokens=chunk_tokens, text_col="clean_text")
