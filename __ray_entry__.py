"""Driver contract for the Ray-Data-native extraction engine.

``entry()`` runs the flagship conversion pipeline at sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 plus the training-data extensions (dedup / similarity /
text-analysis / multimodal); ``oracle_sql()`` gives the DuckDB mirror for
every SQL-expressible one.  Column names match between both sides.

Ray is initialised by the driver BEFORE this module is imported — nothing
here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from docling_api_ray.config import PipelineConfig
from docling_api_ray.stages.common import (
    bounded_groupby_sum,
    coalesce_narrow,
)
from docling_api_ray.pipelines.convert import flagship
from docling_api_ray.sources.synth import make_html_page
from docling_api_ray.stages import dedup as dd
from docling_api_ray.stages import similarity as sim
from docling_api_ray.stages import text_analysis as ta
from docling_api_ray.stages.html_extract import extract_main_content
from docling_api_ray.stages.multimodal import MediaMetadata, explode_media
from ray.data.aggregate import Count, Sum

# ---------------------------------------------------------------------------
# shared SQL fragments mirroring sources/synth.py derivation arithmetic
# ---------------------------------------------------------------------------

_SQL_NWORDS = "len(string_split(text, ' '))"
_SQL_FORMAT = """
CASE WHEN doc_id % 97 = 0 THEN 'pdf'
     WHEN doc_id % 10 = 0 THEN 'pdf'
     WHEN doc_id % 10 = 1 THEN 'docx'
     WHEN doc_id % 10 = 2 THEN 'pptx'
     WHEN doc_id % 10 IN (3, 4) THEN 'html'
     WHEN doc_id % 10 = 5 THEN 'image'
     WHEN doc_id % 10 = 6 THEN 'md'
     WHEN doc_id % 10 = 7 THEN 'asciidoc'
     ELSE '' END
""".strip()

# n_text spans: poison/unsupported → 0; html → ceil(words/12); else ceil(words/8)
_SQL_NTEXT = f"""
CASE WHEN doc_id % 97 = 0 OR doc_id % 10 IN (8, 9) THEN 0
     WHEN doc_id % 10 IN (3, 4)
          THEN CAST(ceil({_SQL_NWORDS} / 12.0) AS BIGINT)
     ELSE CAST(ceil({_SQL_NWORDS} / 8.0) AS BIGINT) END
""".strip()

_SQL_NMEDIA = f"""
CASE WHEN doc_id % 97 = 0 OR doc_id % 10 IN (3, 4, 8, 9) THEN 0
     WHEN doc_id % 3 = 0 THEN ({_SQL_NTEXT}) // 2
     ELSE 0 END
""".strip()

_SQL_ERROR = """
CASE WHEN doc_id % 97 = 0 THEN 'corrupt document'
     WHEN doc_id % 10 IN (8, 9) THEN 'unsupported format'
     ELSE '' END
""".strip()

_KNN_K = 10
_N_QUERIES = 5
_NEARDUP_TH = 0.35
_JACCARD_TH = 0.9


def _read(sf_dir: str, table: str, columns: list[str]) -> ray.data.Dataset:
    """read_parquet with an explicit METADATA-FREE schema.  The testdata
    parquet files carry a pandas-metadata dict that makes their Arrow
    schema unhashable; every op whose output blocks unify that schema
    (including the read's own block split) then logs Ray's 'Failed to
    hash the schemas' warning (VERDICT r1 wrong-list #6).  Passing a
    clean schema pins block schemas AND documents the expected layout."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    full = pq.read_schema(path)
    schema = pa.schema([full.field(c).remove_metadata() for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=schema)


def _docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    return _read(sf_dir, "documents", columns)


def _emb(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    return _read(sf_dir, "embeddings", columns)


def _coal(ds: "ray.data.Dataset", *, max_rows: int = 1_000_000):
    """Bundle narrow blocks before a selective filter / sort co-group:
    a fused chain whose task input is EMPTY never calls its UDF and Ray
    emits a 0-column block — the executor's 'different schema' warning
    (round-5 sweep).  Bundling mixes empty outputs with non-empty
    siblings so every downstream task sees rows."""
    from docling_api_ray.stages.common import coalesce_narrow

    return coalesce_narrow(ds, max_rows=max_rows)


def _flagship_cfg() -> PipelineConfig:
    return PipelineConfig(extract_tables_as_images=True)


def _with_schema(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Anchor a possibly-empty result with an explicit Arrow schema: a
    zero-row typed dataset unioned in front, so empty pair-sets still
    expose (left_id, right_id, ...) columns to the driver compare.  The
    main branch is cast to the SAME Arrow schema (map_groups aggregates
    otherwise emit pandas-block schemas, and the union of the two logs a
    schema-mismatch warning per block)."""

    def cast(b: pa.Table) -> pa.Table:
        return b.select(schema.names).cast(schema)

    return ray.data.from_arrow(schema.empty_table()).union(
        ds.map_batches(cast, batch_format="pyarrow")
    )


_PAIRS_J = pa.schema(
    [("left_id", pa.int64()), ("right_id", pa.int64()), ("jaccard", pa.float64())]
)
_PAIRS_C = pa.schema(
    [("left_id", pa.int64()), ("right_id", pa.int64()), ("cosine", pa.float64())]
)
_PAIRS_H = pa.schema(
    [("left_id", pa.int64()), ("right_id", pa.int64()), ("hamming", pa.int64())]
)
_PAIRS_E = pa.schema(
    [("left_id", pa.int64()), ("right_id", pa.int64()), ("est_jaccard", pa.float64())]
)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    return flagship("/root/testdata/sf0.001", _flagship_cfg())


def _q_classify(sf_dir: str):
    from docling_api_ray.sources.testdata import raw_documents_dataset
    from docling_api_ray.stages.classify import add_format_column

    ds = add_format_column(raw_documents_dataset(sf_dir))

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "format": pc.fill_null(b["format"], ""),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def _q_format_counts(sf_dir: str):
    # bounded key domain (8 formats) → partial-agg + one-block fold
    return bounded_groupby_sum(
        _q_classify(sf_dir), ["format"], count_alias="n_docs"
    )


def _q_convert_spans(sf_dir: str):
    ds = flagship(sf_dir, _flagship_cfg())

    def project(b: pa.Table) -> pa.Table:
        spans = b["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        n = len(b)
        # vectorized span census: flatten once, per-kind bincount over
        # list parent indices — the spans column never becomes Python
        flat = spans.flatten()
        parents = np.asarray(pc.list_parent_indices(spans), dtype=np.int64)
        kinds = np.asarray(flat.field("kind").to_numpy(zero_copy_only=False))
        refs = np.asarray(flat.field("media_ref").to_numpy(zero_copy_only=False))

        def kind_count(kind: str) -> np.ndarray:
            return np.bincount(parents[kinds == kind], minlength=n)

        n_spans = np.bincount(parents, minlength=n)
        last = np.full(n, "", dtype=object)
        sel = np.flatnonzero(refs != "")
        # duplicate fancy-assign keeps the LAST write; sel ascends, so the
        # final media_ref per doc wins
        last[parents[sel]] = refs[sel]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "format": b["format"],
                "n_spans": pa.array(n_spans, type=pa.int64()),
                "n_text": pa.array(kind_count("text"), type=pa.int64()),
                "n_tables": pa.array(kind_count("table"), type=pa.int64()),
                "n_pictures": pa.array(kind_count("picture"), type=pa.int64()),
                "last_media_ref": pa.array(last, type=pa.string()),
                "error": b["error"],
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def _q_media_counts(sf_dir: str):
    media = explode_media(flagship(sf_dir, _flagship_cfg()))
    counted = media.select_columns(["kind"])
    return bounded_groupby_sum(counted, ["kind"], count_alias="n_media")


def _q_html_extract(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])

    def synth_and_extract(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        out = [
            extract_main_content(make_html_page(t or "")).main_text for t in texts
        ]
        return pa.table(
            {"doc_id": b["doc_id"], "main_text": pa.array(out, type=pa.string())}
        )

    return ds.map_batches(synth_and_extract, batch_format="pyarrow", batch_size=512)


def _q_md_structure(sf_dir: str):
    """REAL markdown structural parse (functions/md_parse.py): each text
    row becomes a genuinely structured markdown document
    (make_structured_markdown) and the parser's block census —
    headings / paragraphs / tables / images — is oracle-checked against
    the generation arithmetic (same pattern as html_extract)."""
    from docling_api_ray.functions.md_parse import markdown_structure
    from docling_api_ray.sources.synth import make_structured_markdown

    ds = _docs(sf_dir, ["doc_id", "text"])

    def synth_and_parse(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        counts = [markdown_structure(make_structured_markdown(t or "")) for t in texts]
        cols = {"doc_id": b["doc_id"]}
        for k in (
            "n_headings", "n_paragraphs", "n_tables", "n_images", "n_code_blocks",
        ):
            cols[k] = pa.array([c[k] for c in counts], type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(synth_and_parse, batch_format="pyarrow", batch_size=512)


def _q_normalize_text(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.normalize_text, batch_format="pyarrow"
    )


def _q_paragraph_dedup(sf_dir: str):
    from docling_api_ray.stages.dedup import paragraph_dedup

    return paragraph_dedup(_docs(sf_dir, ["doc_id", "text"]))


def _q_boilerplate_strip(sf_dir: str):
    """CCNet-rule boilerplate removal (stages/dedup.py
    boilerplate_strip): paragraphs in > 5% of documents are dropped
    from EVERY doc (vs paragraph_dedup's keep-first) — two co-grouped
    exchanges, df threshold one driver scalar."""
    from docling_api_ray.stages.dedup import boilerplate_strip

    return boilerplate_strip(
        _docs(sf_dir, ["doc_id", "text"]), para_words=8, max_df_frac=0.05
    )


def _q_curate_pack(sf_dir: str):
    from docling_api_ray.pipelines.curate import curate_pack

    return curate_pack(_docs(sf_dir, ["doc_id", "source", "text"]))


def _q_pack_chunks(sf_dir: str):
    from docling_api_ray.stages.packing import pack_chunks

    return pack_chunks(_docs(sf_dir, ["doc_id", "source", "text"]))


def _q_pii_redact(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.pii_redact, batch_format="pyarrow"
    )


def _q_gopher_quality(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.gopher_quality, batch_format="pyarrow"
    )


def _distributed_count_topk(
    partials: ray.data.Dataset, key_col: str, K: int
) -> ray.data.Dataset:
    """Shared tail of distributed (key, n)-count top-K (vocab_topk,
    bigram_topk): co-grouped key-hash fold, then a DISTRIBUTED top-k
    tail — each hash partition holds the complete total for every key
    routed to it, so its local top-K head is a superset filter for the
    global top-K; only K·P head rows — corpus- and
    vocabulary-independent — reach the single merge block (VERDICT r2
    #2 shape)."""

    def add_part(b: pa.Table) -> pa.Table:
        import pandas as pd

        # key → partition via a cheap stable string hash (md5-free: the
        # routing key never leaks into results)
        h = pd.util.hash_array(
            np.asarray(b[key_col].to_pylist(), dtype=object)
        ).astype(np.int64)
        from docling_api_ray.stages.common import shuffle_partitions

        return b.append_column(
            "__part",
            pa.array(np.abs(h) % shuffle_partitions(), type=pa.int64()),
        )

    def fold(df) -> pa.Table:
        g = df.groupby(key_col, sort=False)["n"].sum().reset_index()
        # per-partition head: ties broken exactly as in the final merge
        # (n desc, key asc)
        g = g.sort_values(["n", key_col], ascending=[False, True],
                          kind="stable").head(K)
        return pa.table(
            {
                key_col: pa.array(g[key_col].tolist(), type=pa.string()),
                "n": pa.array(g["n"].to_numpy(), type=pa.int64()),
            }
        )

    totals = (
        coalesce_narrow(
            partials.map_batches(add_part, batch_format="pyarrow")
        )
        .groupby("__part")
        .map_groups(fold, batch_format="pandas")
    )

    def topk(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas().sort_values(
            ["n", key_col], ascending=[False, True], kind="stable"
        ).head(K)
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([(key_col, pa.string()), ("n", pa.int64())])
        )

    return totals.repartition(1).map_batches(
        topk, batch_format="pyarrow", batch_size=None
    )


def _q_vocab_topk(sf_dir: str):
    """Distributed wordcount → global top-50 vocabulary: per-batch
    partial counts (map side) + the shared distributed top-k tail."""
    return _distributed_count_topk(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            ta.word_counts, batch_format="pyarrow"
        ),
        "word",
        50,
    )


def _q_bigram_topk(sf_dir: str):
    """Top-40 BIGRAMS (collocations) — the n-gram-LM data-prep analog of
    vocab_topk: per-batch vectorized adjacent-pair counts
    (text_analysis.bigram_counts, same-row mask so no pair spans two
    documents) + the shared distributed top-k tail."""
    return _distributed_count_topk(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            ta.bigram_counts, batch_format="pyarrow"
        ),
        "bigram",
        40,
    )


def _q_token_count(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.token_counts, batch_format="pyarrow"
    )


def _q_quality(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.quality_scores, batch_format="pyarrow"
    )


def _q_lang_id(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.lang_id, batch_format="pyarrow"
    )


def _q_fingerprint(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.fingerprints, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "fp_md5"])


def _q_fingerprint_rolling(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.fingerprints, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "fp_rolling"])


def _q_dedup_exact(sf_dir: str):
    ds = dd.exact_dedup(_docs(sf_dir, ["doc_id", "text"]))
    return ds.select_columns(["doc_id", "content_hash", "n_dups"])


def _q_dedup_exact_stats(sf_dir: str):
    """Aggregate view of exact-dup structure (always non-empty, so the
    compare is schema-stable even on dup-free corpora)."""
    from ray.data.aggregate import Max

    deduped = dd.exact_dedup(_docs(sf_dir, ["doc_id", "text"]))

    def shrink(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "one": pa.array([0] * len(b), type=pa.int64()),
                "n_dups": b["n_dups"],
                "redundant": pc.subtract(b["n_dups"], pa.scalar(1, pa.int64())),
            }
        )

    agg = (
        coalesce_narrow(deduped.map_batches(shrink, batch_format="pyarrow"))
        .groupby("one")
        .aggregate(
            Count(alias_name="n_groups"),
            Sum("redundant", alias_name="n_redundant"),
            Max("n_dups", alias_name="max_group"),
        )
    )
    return agg.select_columns(["n_groups", "n_redundant", "max_group"])


def _q_dedup_exact_rows(sf_dir: str):
    """Distributed first-wins dedup returning the full surviving rows —
    one co-grouped exchange, no driver-side winner set (VERDICT r1 §2)."""
    return dd.exact_dedup_rows(
        _docs(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"])
    )


def _q_dup_ngrams(sf_dir: str):
    from docling_api_ray.stages.dedup import dup_ngram_coverage

    return dup_ngram_coverage(_docs(sf_dir, ["doc_id", "text"]))


def _q_dup_span_strip(sf_dir: str):
    """Exact duplicated-span STRIP with reassembly (stages/dedup.py
    dup_span_strip) — the apply-side of dup_ngram_coverage: word
    positions covered by a multi-document 3-word shingle are removed
    and each doc is rebuilt from its survivors.  Occurrence rows are
    int64-only, the covered-position table is duplicate-structure-
    bounded with a broadcast/co-group size guard (dedup_keep's shape)."""
    from docling_api_ray.stages.dedup import dup_span_strip

    return dup_span_strip(_docs(sf_dir, ["doc_id", "text"]))


def _q_dup_span_keep_first(sf_dir: str):
    """Keep-one-copy duplicated-span strip (Lee et al. 2022 rule): each
    duplicated shingle's lexicographic-min (doc_id, pos) occurrence
    keeps its span, every other occurrence strips.  Winners are
    decidable inside the gram co-group partition (all occurrences of a
    gram co-locate), so the shape is identical to dup_span_strip."""
    from docling_api_ray.stages.dedup import dup_span_strip

    return dup_span_strip(_docs(sf_dir, ["doc_id", "text"]), keep_first=True)


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: per-doc count of 3-word shingles that
    appear in the benchmark subset (doc_id % 50 == 0), broadcast
    fingerprint set + one streaming pass (stages/dedup.py).

    The benchmark's shingle set derives DISTRIBUTEDLY (filter + per-batch
    unique shingles, driver collects only the distinct hash set) — at
    100 TB the benchmark side is a bounded external suite; only its
    fingerprints, never corpus text, reach the driver."""
    bench = _docs(sf_dir, ["doc_id", "text"])

    def keep_bench(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        mod = pc.subtract(ids, pc.multiply(pc.divide(ids, 50), 50))
        return b.filter(pc.equal(mod, 0))

    return dd.contamination_counts_ds(
        _docs(sf_dir, ["doc_id", "text"]),
        _coal(bench, max_rows=65_536).map_batches(
            keep_bench, batch_format="pyarrow"
        ),
    )


def _q_ngram_jaccard(sf_dir: str):
    return _with_schema(
        dd.ngram_jaccard_pairs(
            _docs(sf_dir, ["doc_id", "text", "source"]),
            block_col="source",
            threshold=_JACCARD_TH,
        ),
        _PAIRS_J,
    )


def _q_prefix_filter(sf_dir: str):
    """EXACT global Jaccard self-join via prefix filtering (AllPairs /
    PPJoin candidate generation, stages/dedup.prefix_filter_pairs) — no
    blocking column, no signature approximation: the exact tier the
    MinHash pipeline hands suspect ranges to at 100 TB."""
    return _with_schema(
        dd.prefix_filter_pairs(
            _docs(sf_dir, ["doc_id", "text"]), threshold=0.8
        ),
        _PAIRS_J,
    )


def _q_dedup_minhash(sf_dir: str):
    return _with_schema(
        dd.minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.7),
        _PAIRS_E,
    )


def _q_dedup_simhash(sf_dir: str):
    return _with_schema(
        dd.simhash_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=3),
        _PAIRS_H,
    )


_KEEP_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("component", pa.int64()), ("keep", pa.bool_())]
)


def _q_hll_registers(sf_dir: str):
    """HyperLogLog register table (bucket, max_rho) over the corpus's
    distinct tokens (stages/sketch.py) — the distinct-count sketch with
    a pure-integer output the oracle reproduces bit-for-bit from the
    same md5 hashes (to_base bit-length mirrors the exact frexp
    exponent)."""
    from docling_api_ray.stages.sketch import hll_registers

    return hll_registers(_docs(sf_dir, ["doc_id", "text"]))


def _q_hll_eval(sf_dir: str):
    """HLL accuracy eval — the cardinality-sketch member of the
    self-verifying eval trio (lsh_eval, kll rank check): the register
    estimate vs the EXACT distinct-token count, relative error, and
    the 3σ = 3·1.04/√m bound check.

    Exactness: the harmonic-mean denominator is computed as the
    INTEGER Σ 2^(53−ρ) (Python int / HUGEINT — a float Σ2^(−ρ) would
    round differently under numpy pairwise vs SQL sequential
    summation), converted to double once; the ln of the linear-count
    branch carries the idf-class accepted risk; signed micro rounding
    uses explicit ⌊x·1e6+½⌋ in both engines (SQL round() half-away
    would diverge on negative halves)."""
    import math

    from docling_api_ray.stages.sketch import HLL_B

    m = 1 << HLL_B
    regs = {
        int(r["bucket"]): int(r["max_rho"])
        for r in _q_hll_registers(sf_dir).take_all()
    }
    S = sum(1 << (53 - regs.get(b, 0)) for b in range(m))  # int-exact
    zeros = sum(1 for b in range(m) if regs.get(b, 0) == 0)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m * float(1 << 53) / float(S)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    exact = int(_q_vocab_coverage(sf_dir)["vocab"][0].as_py())
    rel = (est - exact) / exact if exact else None
    bound = 3.0 * 1.04 / math.sqrt(m)
    return pa.table(
        {
            "m": pa.array([m], type=pa.int64()),
            "n_exact": pa.array([exact], type=pa.int64()),
            "est_micro": pa.array(
                [int(math.floor(est * 1e6 + 0.5))], type=pa.int64()
            ),
            "rel_err_micro": pa.array(
                [
                    int(math.floor(rel * 1e6 + 0.5))
                    if rel is not None
                    else None
                ],
                type=pa.int64(),
            ),
            "within_3sigma": pa.array(
                [abs(rel) <= bound if rel is not None else None],
                type=pa.bool_(),
            ),
        }
    )


def _q_heavy_hitters(sf_dir: str):
    """Words with frequency > 1/30 of all token occurrences — EXACT
    output via the Misra-Gries mergeable sketch (stages/sketch.py):
    ≤k-counter per-batch summaries (vocabulary-independent state), a
    sketch-bounded driver merge whose ≤N/(k+1) undercount guarantees no
    qualifying word is missed, then one exact counting pass over the ≤k
    candidates with an integer threshold compare."""
    from docling_api_ray.stages.sketch import heavy_hitters

    return heavy_hitters(_docs(sf_dir, ["doc_id", "text"]), num=1, den=30)


_BM25_TERMS = ["scan", "column", "window"]


def _q_bm25(sf_dir: str):
    """BM25 relevance of every document against a fixed 3-term query
    (stages/relevance.py): one streaming corpus-stats pass (|terms|+2
    numbers total), broadcast, then a stateless scoring pass — fixed
    term-order summation + quantize6 so the oracle compares exactly."""
    from docling_api_ray.stages.relevance import bm25_scores

    return bm25_scores(_docs(sf_dir, ["doc_id", "text"]), _BM25_TERMS)


def _q_tfidf_topterms(sf_dir: str):
    """Per-document TF-IDF top-5 terms over the open vocabulary
    (stages/relevance.py tfidf_topterms): word-hash exchange of one row
    per (doc, word) with in-partition exact df, quantize6 before
    ranking, then a bounded per-doc head merge.  Oracle mirrors the
    idf = ln((1+N)/(1+df)) formula and the (score desc, word asc)
    tie-break via row_number()."""
    from docling_api_ray.stages.relevance import tfidf_topterms

    return tfidf_topterms(_docs(sf_dir, ["doc_id", "text"]), k=5)


def _q_global_rank(sf_dir: str):
    """Exact global size-rank + percentile per document
    (stages/stats.py global_rank): value-bounded histogram prefix
    broadcast + ONE minimal-payload tie-rank exchange — no distributed
    sort-merge.  Oracle = row_number() OVER (ORDER BY n_chars DESC,
    doc_id ASC)."""
    from docling_api_ray.stages.stats import global_rank

    return global_rank(_docs(sf_dir, ["doc_id", "n_chars"]))


def _q_source_percent_rank(sf_dir: str):
    """Per-source percent_rank of document size (stages/stats.py
    grouped_percent_rank): RANK semantics need no tiebreak, so the
    whole window function reduces to ONE bounded (source x n_chars)
    histogram broadcast + a stateless attach — zero corpus movement."""
    from docling_api_ray.stages.stats import grouped_percent_rank

    return grouped_percent_rank(
        _docs(sf_dir, ["doc_id", "source", "n_chars"])
    )


def _q_events_funnel(sf_dir: str):
    """Ordered view->click->purchase funnel per user (stages/windows.py
    funnel_reached): type-pruned scan, ONE user-hash exchange of
    (user, ts, type), three vectorized grouped mins in-partition."""
    from docling_api_ray.stages.windows import funnel_reached

    return funnel_reached(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    )


def _q_quality_logit(sf_dir: str):
    """Batched linear-model inference (stages/text_analysis.py
    quality_logit): two stateless vectorized passes — quality features,
    then the fixed-weight logistic head with quantize-before-sigmoid
    exactness."""
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(ta.quality_scores, batch_format="pyarrow")
        .map_batches(ta.quality_logit, batch_format="pyarrow")
    )


def _q_score_quantiles(sf_dir: str):
    """Exact float quantiles of the quality-classifier logit
    (stages/selection.py quantile_select) — distributed quickselect by
    deterministic bracket refinement: (n, min, max) fold, ≤2 shared
    histogram-refinement passes (one atomic list<int64> row per
    partial), bounded final collect.  No sort, no sketch, no
    corpus-proportional driver state; ties count-resolve.  The narrow
    logit projection materializes once because selection re-scans it
    per pass."""
    from docling_api_ray.stages.selection import quantile_select

    scored = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(ta.quality_scores, batch_format="pyarrow")
        .map_batches(ta.quality_logit, batch_format="pyarrow")
        .select_columns(["logit"])
        .materialize()  # narrow float column — one value per doc
    )
    return quantile_select(
        scored,
        value_col="logit",
        quantiles=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    )


_KLL_QS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _q_approx_score_quantiles(sf_dir: str):
    """KLL approximate quantiles of the quality logit (stages/sketch.py
    kll_sketch / kll_rank_check) — the ONE-pass mergeable streaming
    complement to score_quantiles' exact ~4-pass selection, for the
    monitoring tier where a second scan is too expensive.  The query is
    SELF-VERIFYING: a second exact counting pass computes each
    estimate's true rank span and asserts it intersects
    [q·n ± eps·n] (eps = 0.02 at k = 256, >2x the KLL theory bound).
    Output (q_micro, n, within_bounds) mirrors exactly in SQL: q_micro
    are constants, n is the corpus count, within_bounds is TRUE iff the
    sketch honors its guarantee — a broken sketch flips the hash."""
    from docling_api_ray.stages.sketch import kll_rank_check

    scored = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(ta.quality_scores, batch_format="pyarrow")
        .map_batches(ta.quality_logit, batch_format="pyarrow")
        .select_columns(["logit"])
        .materialize()  # narrow float column, consumed by 2 passes
    )
    return kll_rank_check(scored, value_col="logit", quantiles=_KLL_QS)


_GKLL_QS = (0.25, 0.5, 0.75)


def _q_approx_source_quantiles(sf_dir: str):
    """Per-SOURCE KLL quantiles of the quality logit
    (stages/sketch.py grouped_kll_rank_check) — the one-pass grouped
    monitoring tier (per-source score drift) next to
    source_score_quantiles' exact grouped selection.  Self-verifying
    like approx_score_quantiles, but per group: the exact grouped
    counting pass asserts each source's estimate within eps·n_source;
    n is the exact per-source count, so the SQL mirror is data-derived
    (a broken sketch OR a wrong group count flips the hash)."""
    from docling_api_ray.stages.sketch import grouped_kll_rank_check

    return grouped_kll_rank_check(
        _scored_source_logits(sf_dir),
        group_col="source",
        value_col="logit",
        quantiles=_GKLL_QS,
    )


def _q_winsorize_logit(sf_dir: str):
    """Winsorized quality logit (stages/selection.py winsorize_column):
    clip to the exact [p05, p95] band from the distributed selection
    machinery, then one stateless vectorized clip pass — the robust
    normalization a curation run applies before score-threshold
    training.  Exact: np.clip == least/greatest against the same
    quantile_disc scalars the oracle computes."""
    from docling_api_ray.stages.selection import winsorize_column

    scored = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(ta.quality_scores, batch_format="pyarrow")
        .map_batches(ta.quality_logit, batch_format="pyarrow")
        .select_columns(["doc_id", "logit"])
        .materialize()  # consumed by the threshold passes + the clip
    )
    return winsorize_column(scored, value_col="logit", lo_q=0.05, hi_q=0.95)


def _q_source_heavy_hitters(sf_dir: str):
    """Per-source heavy hitters (stages/sketch.py grouped_heavy_hitters):
    for every source, EXACT counts of every word whose frequency exceeds
    1/30 of that source's token occurrences — the per-crawl-source
    boilerplate-phrase monitor.  Approximate Misra-Gries candidates
    (|sources|·k counters per batch, vocabulary-independent), exact
    verification pass, integer threshold — oracle-exact."""
    from docling_api_ray.stages.sketch import grouped_heavy_hitters

    return grouped_heavy_hitters(
        _docs(sf_dir, ["doc_id", "text", "source"]), num=1, den=30
    )


def _q_weighted_length_quantiles(sf_dir: str):
    """Per-source BYTE-WEIGHTED document-length quantiles
    (stages/stats.py grouped_weighted_quantiles): the p25/p50/p75 of
    whitespace-token doc length where each doc counts by its n_chars
    payload — "the doc length the average stored byte lives in", the
    size-skew diagnostic plain medians miss when mega-docs carry most
    of the corpus bytes.  One bounded (source x length) -> sum(bytes)
    histogram fold; weighted percentile_disc (smallest value whose
    cumulative weight reaches ceil(q*W)) mirrors the SQL window-cumsum
    rule exactly."""
    from docling_api_ray.stages.stats import grouped_weighted_quantiles

    def proj(b: pa.Table) -> pa.Table:
        t = ta.token_counts(b)
        return pa.table(
            {
                "source": b["source"],
                "v": t["n_ws_tokens"],
                "w": b["n_chars"],
            }
        )

    ds = _docs(sf_dir, ["doc_id", "text", "source", "n_chars"]).map_batches(
        proj, batch_format="pyarrow"
    )
    return grouped_weighted_quantiles(
        ds, group_col="source", value_col="v", weight_col="w",
        qs=(0.25, 0.5, 0.75),
    )


def _q_spearman_length_tokens(sf_dir: str):
    """Corpus Spearman rank correlation between n_chars and whitespace
    token count (stages/stats.py spearman_corr) — the tie-exact,
    monotone-association complement to length_token_corr's Pearson:
    robust where mega-doc tails drag the moment correlation.  No global
    sort: each marginal's average-rank map comes from its bounded value
    histogram (doubled ranks keep ties int64-exact), a broadcast
    searchsorted lookup feeds the five-moment tree fold, and the final
    Pearson-on-ranks double expression is replayed op-for-op by the SQL
    mirror."""
    from docling_api_ray.stages.stats import spearman_corr
    from docling_api_ray.stages.text_analysis import WS_TOKEN_RE, _count

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": pc.cast(b["n_chars"], pa.int64()),
                "y": pc.cast(_count(b["text"], WS_TOKEN_RE), pa.int64()),
            }
        )

    ds = _docs(sf_dir, ["text", "n_chars"]).map_batches(
        proj, batch_format="pyarrow"
    )
    return spearman_corr(ds, x_col="x", y_col="y")


def _q_kendall_length_tokens(sf_dir: str):
    """Exact tie-corrected Kendall tau-b between n_chars and token
    count (stages/stats.py kendall_tau_b): concordant/discordant pair
    mass from 2D prefix sums over the bounded joint value histogram —
    no pairwise pass, no global sort; the monotone-association triplet
    closes (Pearson / Spearman / Kendall)."""
    from docling_api_ray.stages.stats import kendall_tau_b
    from docling_api_ray.stages.text_analysis import WS_TOKEN_RE, _count

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": pc.cast(b["n_chars"], pa.int64()),
                "y": pc.cast(_count(b["text"], WS_TOKEN_RE), pa.int64()),
            }
        )

    return kendall_tau_b(
        _docs(sf_dir, ["text", "n_chars"]).map_batches(
            proj, batch_format="pyarrow"
        )
    )


_BENFORD_CHI2_99 = 20.09  # chi-square 0.99 quantile, 8 df


def _q_benford_audit(sf_dir: str):
    """Benford's-law first-digit audit of event values per type (the
    classic fabricated-/synthetic-data forensic): observed leading-digit
    counts of the integer cents vs p_d = log10(1+1/d), χ² per type,
    alert above the 0.99 quantile.  One bounded (type × 9-digit) count
    fold, then an O(|types|) driver fold; χ² terms are nano-quantized
    ints so the order-free sum is engine/SQL-identical (the ln-family
    last-ulp caveat applies to log10, the idf-class accepted risk).
    Leading digit = first decimal digit of ⌊value·100⌋ — integer
    division in the engine, VARCHAR head in SQL, identical for
    positive ints; non-positive cents are excluded."""
    import math

    from docling_api_ray.stages.common import bounded_groupby_sum

    def digits(b: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(b["value"], dtype=np.float64) * 100.0
        ).astype(np.int64)
        keep = cents > 0
        d = cents[keep]
        while (d >= 10).any():
            big = d >= 10
            d = np.where(big, d // 10, d)
        et = np.asarray(b["event_type"])[keep]
        return pa.table(
            {
                "event_type": pa.array(et, type=pa.string()),
                "digit": pa.array(d, type=pa.int64()),
            }
        )

    rows = bounded_groupby_sum(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            digits, batch_format="pyarrow"
        ),
        ["event_type", "digit"],
        count_alias="c",
    ).take_all()
    by_type: dict[str, dict[int, int]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[int(r["digit"])] = int(r["c"])
    types = sorted(by_type)
    out_n, out_s = [], []
    for t in types:
        o = by_type[t]
        n = sum(o.values())
        s_nano = 0
        for d in range(1, 10):
            p = math.log10(1.0 + 1.0 / d)
            e = n * p
            term = (float(o.get(d, 0)) - e) * (float(o.get(d, 0)) - e) / e
            s_nano += int(math.floor(term * 1e9 + 0.5))
        out_n.append(n)
        out_s.append(s_nano)
    chi2 = [s / 1e9 for s in out_s]
    return pa.table(
        {
            "event_type": pa.array(types, type=pa.string()),
            "n": pa.array(out_n, type=pa.int64()),
            "chi2_nano": pa.array(out_s, type=pa.int64()),
            "chi2": pa.array(chi2, type=pa.float64()),
            "benford_alert": pa.array(
                [c > _BENFORD_CHI2_99 for c in chi2], type=pa.bool_()
            ),
        }
    )


_BLOCKLIST = ("dup", "tmp", "xxx")  # deterministic safety wordlist


def _q_blocklist_rate(sf_dir: str):
    """Safety-filter audit: per-source rate of documents containing a
    blocklisted token (the wordlist tier of a toxicity/safety gate —
    exact-match words, the cheap pre-filter before model scoring).
    Vectorized flat-token ``is_in`` + per-doc any-fold, one bounded
    per-source count fold; rate is a single int/int division."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    bl = pa.array(list(_BLOCKLIST), type=pa.string())

    def flag(b: pa.Table) -> pa.Table:
        col = b["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.split_pattern(pc.fill_null(col, ""), " ")
        flat = pc.list_flatten(words)
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        row_of = np.repeat(np.arange(len(b), dtype=np.int64), lens)
        hit = np.asarray(pc.is_in(flat, value_set=bl))
        flagged = np.bincount(
            row_of, weights=hit, minlength=len(b)
        ) > 0
        return pa.table(
            {
                "source": b["source"],
                "fl": pa.array(flagged.astype(np.int64), type=pa.int64()),
            }
        )

    def rate(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n_docs"], dtype=np.int64)
        f = np.asarray(b["n_flagged"], dtype=np.int64)
        return b.append_column(
            "flag_rate", pa.array(f / n, type=pa.float64())
        )

    return bounded_groupby_sum(
        _docs(sf_dir, ["text", "source"]).map_batches(
            flag, batch_format="pyarrow"
        ),
        ["source"],
        sum_cols={"n_flagged": "fl"},
        count_alias="n_docs",
    ).map_batches(rate, batch_format="pyarrow")


def _q_quantile_normalize(sf_dir: str):
    """Cross-source quantile normalization of n_chars (stages/stats.py
    quantile_normalize): tie-stable integer rank remap onto the pooled
    marginal — bounded (source × value) histogram exchange, broadcast
    searchsorted remap, rank()/ceil(r·N/n_g)/percentile_disc all in
    exact int arithmetic mirrored 1:1 by the SQL windows."""
    from docling_api_ray.stages.stats import quantile_normalize

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
                "v": pc.cast(b["n_chars"], pa.int64()),
            }
        )

    return quantile_normalize(
        _docs(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
            proj, batch_format="pyarrow"
        )
    )


_HILL_K = 100  # tail order statistics used by the Hill estimator


def _q_hill_tail_index(sf_dir: str):
    """Hill estimator of the doc-length power-law tail index (Hill
    1975): α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)) over the k largest
    n_chars — the heavy-tail monitor that prices mega-doc skew (α ≤ 2
    means unbounded variance: cost-rebalancing repartition is
    mandatory, the SURVEY §4 skew rationale quantified).

    Shape: one distributed top-(k+1) (partial per-batch heads — the
    topk_longest_docs discipline), then an O(k) driver fold.
    Exactness: each ln is ⌊x·1e9+½⌋-quantized (the zipf_fit
    discipline), the sum is int-exact, α is one float division."""
    import math

    rows = (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(_HILL_K + 1)
        .take_all()
    )
    k = min(_HILL_K, max(len(rows) - 1, 0))
    if k < 1:
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "x_k1": pa.array([None], type=pa.int64()),
                "sum_nano": pa.array([0], type=pa.int64()),
                "alpha": pa.array([None], type=pa.float64()),
            }
        )
    xk1 = int(rows[k]["n_chars"])
    if xk1 <= 0:
        # zero-length tail anchor (≤k+1 docs with an empty doc at rank
        # k+1): the estimator is undefined — same sentinel as k<1
        # instead of a ZeroDivisionError
        return pa.table(
            {
                "k": pa.array([k], type=pa.int64()),
                "x_k1": pa.array([xk1], type=pa.int64()),
                "sum_nano": pa.array([0], type=pa.int64()),
                "alpha": pa.array([None], type=pa.float64()),
            }
        )
    s_nano = 0
    for r in rows[:k]:
        ratio = float(int(r["n_chars"])) / float(xk1)
        s_nano += int(math.floor(math.log(ratio) * 1e9 + 0.5))
    alpha = float(k) / (s_nano / 1e9) if s_nano > 0 else None
    return pa.table(
        {
            "k": pa.array([k], type=pa.int64()),
            "x_k1": pa.array([xk1], type=pa.int64()),
            "sum_nano": pa.array([s_nano], type=pa.int64()),
            "alpha": pa.array([alpha], type=pa.float64()),
        }
    )


_PROFILE_COLS = (
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
)


def _q_table_profile(sf_dir: str):
    """Per-column data profile of lineitem (the Deequ/profiler tier a
    warehouse runs before shipping a table): count, null count, exact
    distinct, and typed min/max per column — one row per column.

    Shape: pass A folds per-block (n, nulls, min, max) partials through
    a tiny per-column co-group; pass B melts to narrow (col, value-hash)
    rows, block-deduped, then ONE hash-partition co-group counts
    partition-local uniques (globally disjoint — the distinct_ngrams
    contract; string hashing rides md5-u64, the shingle tier's accepted
    collision contract).  Nothing corpus-proportional reaches the
    driver; output is |columns| rows."""
    import pandas as pd

    from docling_api_ray.stages.common import (
        bounded_groupby_sum,
        coalesce_narrow,
        guard_fold,
        shuffle_partitions,
    )
    from docling_api_ray.functions.hashing import u64_md5

    cols = [c for c, _ in _PROFILE_COLS]
    kinds = dict(_PROFILE_COLS)
    ds = _read(sf_dir, "lineitem", cols)
    P = shuffle_partitions()

    # ---- pass A: per-block typed stats partials -------------------------
    def stat_partial(b: pa.Table) -> pa.Table:
        recs = []
        for c in cols:
            arr = b[c]
            n = len(arr)
            nn = int(pc.count(arr, mode="only_null").as_py())
            if kinds[c] == "num":
                mn = pc.min(arr).as_py()
                mx = pc.max(arr).as_py()
                recs.append((c, n, nn, mn, mx, None, None))
            else:
                mn = pc.min(arr).as_py()
                mx = pc.max(arr).as_py()
                recs.append((c, n, nn, None, None, mn, mx))
        return pa.table(
            {
                "column": pa.array([r[0] for r in recs], type=pa.string()),
                "n": pa.array([r[1] for r in recs], type=pa.int64()),
                "n_null": pa.array([r[2] for r in recs], type=pa.int64()),
                "mn": pa.array([r[3] for r in recs], type=pa.int64()),
                "mx": pa.array([r[4] for r in recs], type=pa.int64()),
                "mns": pa.array([r[5] for r in recs], type=pa.string()),
                "mxs": pa.array([r[6] for r in recs], type=pa.string()),
            }
        )

    def stat_fold(df: "pd.DataFrame") -> pa.Table:
        c = df["column"].iloc[0]
        num = kinds[c] == "num"
        mnv = df["mn"].dropna()
        mxv = df["mx"].dropna()
        mns = df["mns"].dropna()
        mxs = df["mxs"].dropna()
        return pa.table(
            {
                "column": pa.array([c], type=pa.string()),
                "n": pa.array([int(df["n"].sum())], type=pa.int64()),
                "n_null": pa.array(
                    [int(df["n_null"].sum())], type=pa.int64()
                ),
                "mn": pa.array(
                    [int(mnv.min()) if num and len(mnv) else None],
                    type=pa.int64(),
                ),
                "mx": pa.array(
                    [int(mxv.max()) if num and len(mxv) else None],
                    type=pa.int64(),
                ),
                "mns": pa.array(
                    [mns.min() if not num and len(mns) else None],
                    type=pa.string(),
                ),
                "mxs": pa.array(
                    [mxs.max() if not num and len(mxs) else None],
                    type=pa.string(),
                ),
            }
        )

    stats = {
        r["column"]: r
        for r in coalesce_narrow(
            ds.map_batches(stat_partial, batch_format="pyarrow")
        )
        .groupby("column")
        .map_groups(guard_fold(stat_fold), batch_format="pandas")
        .take_all()
    }

    # ---- pass B: exact distinct via hash-partition co-group -------------
    def melt(b: pa.Table) -> pa.Table:
        outc, outh = [], []
        for c in cols:
            if kinds[c] == "num":
                v = np.unique(
                    np.asarray(b[c].drop_null(), dtype=np.int64)
                )
                h = v
            else:
                vals = pd.unique(
                    np.asarray(b[c].drop_null().to_pylist(), dtype=object)
                )
                h = (
                    u64_md5(vals) >> np.uint64(1)
                ).astype(np.int64) if len(vals) else np.zeros(0, np.int64)
            outc.append(np.full(len(h), c, dtype=object))
            outh.append(h)
        return pa.table(
            {
                "column": pa.array(
                    np.concatenate(outc) if outc else [], type=pa.string()
                ),
                "h": pa.array(
                    np.concatenate(outh) if outh else [], type=pa.int64()
                ),
            }
        )

    def add_part(b: pa.Table) -> pa.Table:
        h = np.asarray(b["h"], dtype=np.int64)
        return b.append_column(
            "__part",
            pa.array(h.view(np.uint64) % np.uint64(P), type=pa.int64()),
        )

    def count_distinct(g: "pd.DataFrame") -> pa.Table:
        agg = g.groupby("column", sort=False)["h"].nunique()
        return pa.table(
            {
                "column": pa.array(
                    agg.index.to_numpy(object), type=pa.string()
                ),
                "d": pa.array(agg.to_numpy(np.int64), type=pa.int64()),
            }
        )

    distinct = {
        r["column"]: int(r["d"])
        for r in bounded_groupby_sum(
            coalesce_narrow(ds.map_batches(melt, batch_format="pyarrow"))
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(guard_fold(count_distinct), batch_format="pandas"),
            ["column"],
            sum_cols={"d": "d"},
        ).take_all()
    }

    return pa.table(
        {
            "column": pa.array(cols, type=pa.string()),
            "n": pa.array(
                [int(stats[c]["n"]) for c in cols], type=pa.int64()
            ),
            "n_null": pa.array(
                [int(stats[c]["n_null"]) for c in cols], type=pa.int64()
            ),
            "n_distinct": pa.array(
                [distinct.get(c, 0) for c in cols], type=pa.int64()
            ),
            "min_num": pa.array(
                [stats[c]["mn"] for c in cols], type=pa.int64()
            ),
            "max_num": pa.array(
                [stats[c]["mx"] for c in cols], type=pa.int64()
            ),
            "min_str": pa.array(
                [stats[c]["mns"] for c in cols], type=pa.string()
            ),
            "max_str": pa.array(
                [stats[c]["mxs"] for c in cols], type=pa.string()
            ),
        }
    )


_BLOWUP_COLS = ("l_orderkey", "l_partkey", "l_suppkey")


def _q_selfjoin_blowup(sf_dir: str):
    """Join-cardinality / skew estimator over lineitem keys: per key
    column, the EXACT self-equijoin output size Σ deg² (the optimizer's
    quadratic-blowup statistic), key count, max degree and the blowup
    factor — computed WITHOUT executing any join, the planning number
    that decides broadcast-vs-shuffle and salting at 100 TB.

    Shape: one melt pass to narrow (col, key, partial-n) rows, ONE
    key-hash co-group (per-key totals are partition-complete), a
    per-partition Σd²/Σd/max/count fold collapsed to |cols| rows, then
    a bounded per-col sum.  All int-exact; blowup is one division."""
    import pandas as pd

    from docling_api_ray.stages.common import (
        bounded_groupby_sum,
        coalesce_narrow,
        guard_fold,
        shuffle_partitions,
    )

    cols = list(_BLOWUP_COLS)
    ds = _read(sf_dir, "lineitem", cols)
    P = shuffle_partitions()

    def melt(b: pa.Table) -> pa.Table:
        outc, outk, outn = [], [], []
        for c in cols:
            g = (
                pa.table({"k": b[c]})
                .group_by(["k"])
                .aggregate([([], "count_all")])
            )
            outc.append(np.full(len(g), c, dtype=object))
            outk.append(np.asarray(g["k"], dtype=np.int64))
            outn.append(np.asarray(g["count_all"], dtype=np.int64))
        return pa.table(
            {
                "column": pa.array(np.concatenate(outc), type=pa.string()),
                "k": pa.array(np.concatenate(outk), type=pa.int64()),
                "n": pa.array(np.concatenate(outn), type=pa.int64()),
            }
        )

    def add_part(b: pa.Table) -> pa.Table:
        k = np.asarray(b["k"], dtype=np.int64)
        return b.append_column(
            "__part",
            pa.array(k.view(np.uint64) % np.uint64(P), type=pa.int64()),
        )

    def fold(g: "pd.DataFrame") -> pa.Table:
        deg = g.groupby(["column", "k"], sort=False)["n"].sum()
        agg = deg.groupby(level=0).agg(["count", "sum", "max"])
        d2 = (deg * deg).groupby(level=0).sum()
        return pa.table(
            {
                "column": pa.array(
                    agg.index.to_numpy(object), type=pa.string()
                ),
                "n_keys": pa.array(
                    agg["count"].to_numpy(np.int64), type=pa.int64()
                ),
                "n_rows": pa.array(
                    agg["sum"].to_numpy(np.int64), type=pa.int64()
                ),
                "max_deg": pa.array(
                    agg["max"].to_numpy(np.int64), type=pa.int64()
                ),
                "sj": pa.array(d2.to_numpy(np.int64), type=pa.int64()),
            }
        )

    # ONE job: the fold output is ≤ P × |cols| rows — driver-combine
    parts = (
        coalesce_narrow(ds.map_batches(melt, batch_format="pyarrow"))
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
    ).take_all()
    agg = {c: [0, 0, 0, 0] for c in cols}  # n_keys, n_rows, max, sj
    for r in parts:
        a = agg[r["column"]]
        a[0] += int(r["n_keys"])
        a[1] += int(r["n_rows"])
        a[2] = max(a[2], int(r["max_deg"]))
        a[3] += int(r["sj"])
    return pa.table(
        {
            "column": pa.array(cols, type=pa.string()),
            "n_rows": pa.array([agg[c][1] for c in cols], type=pa.int64()),
            "n_keys": pa.array([agg[c][0] for c in cols], type=pa.int64()),
            "max_degree": pa.array(
                [agg[c][2] for c in cols], type=pa.int64()
            ),
            "selfjoin_rows": pa.array(
                [agg[c][3] for c in cols], type=pa.int64()
            ),
            "blowup": pa.array(
                # empty table → NULL, matching the mirror's
                # sum(d*d)/sum(d) NULL semantics instead of a
                # ZeroDivisionError
                [
                    agg[c][3] / agg[c][1] if agg[c][1] > 0 else None
                    for c in cols
                ],
                type=pa.float64(),
            ),
        }
    )


def _q_dedup_normalized(sf_dir: str):
    """Near-exact dedup tier between byte-exact and MinHash: exact
    dedup over the NORMALIZED text (lowercase, punctuation stripped,
    whitespace collapsed — ta.normalize_text), catching the
    case/punct/spacing variants byte hashing misses.  Summary row:
    docs, distinct normalized contents, duplicate count + floor-micro
    ratio (the dedup_exact reporting shape on the normalized digest);
    digest-only shuffle, co-grouped fold."""
    from docling_api_ray.stages.common import (
        coalesce_narrow,
        guard_fold,
        shuffle_partitions,
    )

    P = shuffle_partitions()

    def digest(b: pa.Table) -> pa.Table:
        from docling_api_ray.functions.hashing import u64_md5

        norm = ta.normalize_text(b)["norm_text"].to_pylist()
        h = (
            u64_md5(np.array([t or "" for t in norm], dtype=object))
            >> np.uint64(1)
        ).astype(np.int64)
        return pa.table(
            {
                "h": pa.array(h, type=pa.int64()),
                "__part": pa.array(
                    h.view(np.uint64) % np.uint64(P), type=pa.int64()
                ),
            }
        )

    def fold(g) -> pa.Table:
        return pa.table(
            {
                "n": pa.array([len(g)], type=pa.int64()),
                "d": pa.array([g["h"].nunique()], type=pa.int64()),
            }
        )

    rows = (
        coalesce_narrow(
            _docs(sf_dir, ["doc_id", "text"]).map_batches(
                digest, batch_format="pyarrow"
            )
        )
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
    ).take_all()
    n = sum(int(r["n"]) for r in rows)
    d = sum(int(r["d"]) for r in rows)
    ratio = (
        math.floor((n - d) / n * 1e6) / 1e6 if n else None
    )
    return pa.table(
        {
            "n_docs": pa.array([n], type=pa.int64()),
            "distinct_normalized": pa.array([d], type=pa.int64()),
            "n_dups": pa.array([n - d], type=pa.int64()),
            "dup_ratio": pa.array([ratio], type=pa.float64()),
        }
    )


_ENS_FLESCH_LO = 20.0
_ENS_FLESCH_HI = 130.0


def _q_quality_ensemble(sf_dir: str):
    """Ensemble quality gate (the classifier-ensembling practice of
    Nemotron-CC-class curation): three independent signals — Gopher
    rule keep, logistic-classifier keep, Flesch readability band — and
    a 2-of-3 majority vote per doc.  One stateless pass reusing the
    three existing vectorized scorers; every vote compares the SAME
    quantized doubles as the individual queries' oracles, so the
    majority is engine/SQL-identical."""

    def score(b: pa.Table) -> pa.Table:
        gk = np.asarray(ta.gopher_quality(b)["keep"])
        lk = np.asarray(ta.quality_logit(ta.quality_scores(b))["keep"])
        fl = np.asarray(
            ta.readability_scores(b)["flesch"], dtype=np.float64
        )
        rk = (fl >= _ENS_FLESCH_LO) & (fl <= _ENS_FLESCH_HI)
        votes = (
            gk.astype(np.int64) + lk.astype(np.int64) + rk.astype(np.int64)
        )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "gopher_keep": pa.array(gk, type=pa.bool_()),
                "logit_keep": pa.array(lk, type=pa.bool_()),
                "readability_keep": pa.array(rk, type=pa.bool_()),
                "votes": pa.array(votes, type=pa.int64()),
                "ensemble_keep": pa.array(votes >= 2, type=pa.bool_()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def _q_funnel_latency(sf_dir: str):
    """Funnel time-to-convert: exact percentile_disc p50/p90 of each
    converting user's first-view → first-qualifying-click delta
    (stages/windows.py funnel_step_latency + the distributed
    quickselect of stages/selection.py — no global sort, unbounded
    value domain).  One summary row: converts, min/max µs, p50/p90."""
    from docling_api_ray.stages.selection import quantile_select

    deltas = _with_schema(
        em_funnel_latency_ds(sf_dir), _FUNNEL_LAT_SCHEMA
    ).materialize()  # consumed 2+rounds times by the quickselect
    n = deltas.count()
    if n == 0:
        return pa.table(
            {
                "n_converted": pa.array([0], type=pa.int64()),
                "min_us": pa.array([None], type=pa.int64()),
                "max_us": pa.array([None], type=pa.int64()),
                "p50_us": pa.array([None], type=pa.float64()),
                "p90_us": pa.array([None], type=pa.float64()),
            }
        )

    def to_f(b: pa.Table) -> pa.Table:
        return pa.table(
            {"delta": pc.cast(b["delta_us"], pa.float64())}
        )

    fd = deltas.map_batches(to_f, batch_format="pyarrow").materialize()
    qt = {
        float(r["q"]): float(r["value"])
        for r in quantile_select(
            fd, value_col="delta", quantiles=(0.5, 0.9)
        ).to_pylist()
    }
    mm = deltas.aggregate(
        ray.data.aggregate.Min("delta_us"), ray.data.aggregate.Max("delta_us")
    )
    return pa.table(
        {
            "n_converted": pa.array([n], type=pa.int64()),
            "min_us": pa.array([int(mm["min(delta_us)"])], type=pa.int64()),
            "max_us": pa.array([int(mm["max(delta_us)"])], type=pa.int64()),
            "p50_us": pa.array([qt[0.5]], type=pa.float64()),
            "p90_us": pa.array([qt[0.9]], type=pa.float64()),
        }
    )


_FUNNEL_LAT_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("delta_us", pa.int64())]
)


def em_funnel_latency_ds(sf_dir: str):
    from docling_api_ray.stages.windows import funnel_step_latency

    return funnel_step_latency(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    )


def _q_lang_source_mi(sf_dir: str):
    """Mutual information / chi-square / Cramer's V between lang and
    source (stages/stats.py contingency_association) — the
    label-confounding audit: high V means per-source language stats are
    really source stats.  One bounded contingency fold; zero chi-square
    cells charged in closed form (n - sum e_nonzero); micro-quantized
    int64 terms keep engine and oracle order-free-identical."""
    from docling_api_ray.stages.stats import contingency_association

    return contingency_association(
        _docs(sf_dir, ["lang", "source"]), row_col="lang", col_col="source"
    )


def _q_stratified_kfold(sf_dir: str):
    """Exactly-balanced stratified 5-fold CV assignment per language
    (stages/splits.py stratified_kfold): within every lang the fold
    sizes differ by <=1, deterministically — the two-phase bucketed
    rank (bounded (lang x bucket) count fold -> broadcast offsets ->
    one narrow bucket-partitioned exchange), no global sort.  The
    oracle replays the identical (bucket, hash, id) stratum order via
    md5_number + row_number."""
    from docling_api_ray.stages.splits import stratified_kfold

    return stratified_kfold(
        _docs(sf_dir, ["doc_id", "lang"]), id_col="doc_id",
        stratum_col="lang", k=5,
    )


def _q_source_gini(sf_dir: str):
    """Per-source Gini coefficient of n_chars (stages/stats.py
    grouped_gini) — byte-share inequality: a source whose Gini
    approaches 1 is a few mega-docs wearing a source label, the signal
    mixture reweighting needs before trusting per-source doc counts.
    Exact from ONE bounded (source x value) histogram fold — the
    rank-weighted sum telescopes per tie block, no per-row ranks, no
    global sort."""
    from docling_api_ray.stages.stats import grouped_gini

    return grouped_gini(
        _docs(sf_dir, ["source", "n_chars"]),
        group_col="source", value_col="n_chars",
    )


def _q_welch_ttest(sf_dir: str):
    """One-vs-rest Welch's t-test of n_chars per source (stages/stats.py
    grouped_welch) — the statistical-significance tier over the drift
    diagnostics (source_ols fits trend, ks_drift tests shape; this adds
    the classic unequal-variance mean test with Welch–Satterthwaite df).
    One bounded moment fold; rest-side moments = global totals − own;
    fixed float op order replayed by the oracle, ⌊x·1e6+½⌋ quantize."""
    from docling_api_ray.stages.stats import grouped_welch

    return grouped_welch(
        _docs(sf_dir, ["source", "n_chars"]),
        group_col="source", value_col="n_chars",
    )


def _q_poisson_bootstrap(sf_dir: str):
    """Per-source mean n_chars with Poisson-bootstrap 95% CI
    (stages/stats.py poisson_bootstrap) — the Chamandy et al. streaming
    bootstrap: deterministic Poisson(1) replicate weights from the
    md5 hash ladder, 64 replicates in ONE bounded pass; the oracle
    replays the integer draw and the order-stat CI bit-for-bit."""
    from docling_api_ray.stages.stats import poisson_bootstrap

    return poisson_bootstrap(
        _docs(sf_dir, ["doc_id", "source", "n_chars"]),
        group_col="source", value_col="n_chars", id_col="doc_id",
    )


def _q_quality_auc_by_source(sf_dir: str):
    """Per-source exact tie-aware ROC-AUC of the quality-classifier
    logit against the lang='en' label (stages/stats.py grouped_roc_auc)
    — the filter-bias audit: a source where the quality gate strongly
    separates English from non-English is a source the gate will skew.
    Mann-Whitney 2U from ONE bounded (source x score) histogram fold,
    Python-int driver arithmetic, integer ⌊x+½⌋ micro-quantize."""
    from docling_api_ray.stages.stats import grouped_roc_auc

    def scored(b: pa.Table) -> pa.Table:
        lg = ta.quality_logit(ta.quality_scores(b))
        logit = np.asarray(lg["logit"], dtype=np.float64)
        lang = np.asarray(b["lang"])
        return pa.table(
            {
                "source": b["source"],
                "score_micro": pa.array(
                    np.rint(logit * 1e6).astype(np.int64), type=pa.int64()
                ),
                "pos": pa.array(
                    (lang == "en").astype(np.int64), type=pa.int64()
                ),
            }
        )

    return grouped_roc_auc(
        _docs(sf_dir, ["doc_id", "text", "lang", "source"]).map_batches(
            scored, batch_format="pyarrow"
        ),
        group_col="source",
        score_col="score_micro",
        pos_col="pos",
    )


_ZIPF_K = 1000


def _q_zipf_fit(sf_dir: str):
    """Zipf-law fit: OLS slope of ln(count) on ln(rank) over the global
    top-K vocabulary (natural text ≈ −1; a templated corpus flattens) —
    rides the shared distributed top-k tail, then an O(K) driver fold.
    Exactness: each log is floor(x·1e9 + 0.5)-quantized (non-negative
    domain, identical to SQL round), the four moments are Python-int
    exact, and the slope is the SAME two-conversion division
    float(num)/float(den) the mirror's CAST AS DOUBLE pair performs."""
    import math

    rows = _distributed_count_topk(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            ta.word_counts, batch_format="pyarrow"
        ),
        "word",
        _ZIPF_K,
    ).take_all()
    rows.sort(key=lambda r: (-int(r["n"]), r["word"]))
    k = len(rows)
    sx = sy = sxy = sxx = 0
    for i, r in enumerate(rows, 1):
        x = int(math.floor(math.log(i) * 1e9 + 0.5))
        y = int(math.floor(math.log(int(r["n"])) * 1e9 + 0.5))
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
    num = k * sxy - sx * sy
    den = k * sxx - sx * sx
    slope = float(num) / float(den) if den else None
    return pa.table(
        {
            "n_words": pa.array([k], type=pa.int64()),
            "slope": pa.array([slope], type=pa.float64()),
        }
    )


def _q_winnow_fingerprints(sf_dir: str):
    """Winnowing fingerprints (Schleimer et al. 2003) per doc — the
    MOSS position-local copy-detection sketch: rightmost-min of each
    w-shingle window, deduped, summarized as count / min / mod-2^63
    checksum / density.  Stateless vectorized map, one streaming pass;
    the oracle replays the window selection with SQL window frames."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.winnow_fingerprints, batch_format="pyarrow"
    )


def _q_winnow_pairs(sf_dir: str):
    """MOSS copy-detection pairs over winnowing fingerprints
    (stages/dedup.py winnow_pairs): distinct winnowed hash set per doc,
    hash-bucket co-group with the boilerplate bucket cap, pair-keyed
    shared-count fold, containment = shared / min(|A|,|B|) ≥ 0.5.
    Output-bounded by the true shared-fingerprint pair mass."""
    return dd.winnow_pairs(
        _docs(sf_dir, ["doc_id", "text"]), threshold=0.5
    )


def _q_winnow_dedup_keep(sf_dir: str):
    """The winnowing tier's dedup ACTION (pairs → components → keep):
    MOSS fingerprint-overlap pairs feed the same distributed min-label
    connected components + first-wins keep-list as the MinHash path —
    every candidate generator in the repo has an apply side."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = dd.winnow_pairs(docs, threshold=0.5)
    return _with_schema(dd.dedup_keep(docs, pairs), _KEEP_SCHEMA)


def _q_cdc_dedup(sf_dir: str):
    """Content-defined-chunking dedup profile (stages/dedup.py
    cdc_chunk_stats): rolling-hash chunk boundaries (LBFS gear at word
    granularity), content-identity chunk hashes, exact distinct via the
    hash-partitioned co-group — the block-level storage-dedup readout."""
    from docling_api_ray.stages.dedup import cdc_chunk_stats

    return cdc_chunk_stats(_docs(sf_dir, ["doc_id", "text"]))


_EWMA_ALPHA = 0.25  # exact binary fraction: both engines multiply exactly
_EWMA_HI = 1.5
_EWMA_LO = 0.5


def _q_events_ewma(sf_dir: str):
    """EWMA control chart over per-type daily event counts (Roberts
    1959; the monitoring-tier drift alarm next to the KS/PSI batch
    tests): S_t = α·x_t + (1−α)·S_{t−1}, alert when a day's count
    deviates from the PRIOR smoothed level by ratio ≥ 1.5 or ≤ 0.5.

    Shape: one bounded (type × day) count exchange, then the recursion
    runs inside a per-type co-group fold — sequential by nature, O(days)
    per type (domain-bounded, the zipf-fold class).  Exactness: α=0.25
    and 1−α=0.75 are exact binary fractions and both engines evaluate
    the same mult-mult-add per step, so the doubles are bit-identical;
    ratio is a single IEEE division against the carried prior."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def add_day(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())  # epoch microseconds
        day = pc.divide(us, 86_400_000_000)
        return pa.table(
            {
                "event_type": b["event_type"],
                "day": pc.cast(day, pa.int64()),
            }
        )

    agg = (
        _coal(ds.map_batches(add_day, batch_format="pyarrow"))
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"))
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("day", pa.int64()),
            ("n", pa.int64()),
            ("ewma", pa.float64()),
            ("ratio", pa.float64()),
            ("alert", pa.bool_()),
        ]
    )

    def fold(df):
        import pandas as pd

        if not len(df):
            return out_schema.empty_table()
        df = df.sort_values("day", kind="stable")
        ns = df["n"].to_numpy(dtype=np.int64)
        ew = np.empty(len(ns), dtype=np.float64)
        ratio = np.full(len(ns), np.nan)
        s = float(ns[0])
        ew[0] = s
        for i in range(1, len(ns)):  # domain-bounded sequential recursion
            x = float(ns[i])
            ratio[i] = x / s
            s = _EWMA_ALPHA * x + (1.0 - _EWMA_ALPHA) * s
            ew[i] = s
        alert = np.zeros(len(ns), dtype=bool)
        alert[1:] = (ratio[1:] >= _EWMA_HI) | (ratio[1:] <= _EWMA_LO)
        return pa.table(
            {
                "event_type": df["event_type"].to_numpy(),
                "day": df["day"].to_numpy(),
                "n": ns,
                "ewma": ew,
                "ratio": pa.array(
                    ratio, type=pa.float64(), mask=np.isnan(ratio)
                ),
                "alert": alert,
            }
        ).cast(out_schema)

    from docling_api_ray.stages.common import guard_fold

    return agg.groupby("event_type").map_groups(
        guard_fold(fold), batch_format="pandas"
    )


_NEYMAN_N = 1000  # target total sample size


def _q_neyman_allocation(sf_dir: str):
    """Neyman-optimal stratified-sample allocation (Neyman 1934): per
    source h, n_h ∝ N_h·S_h (stratum size × stddev of the quality
    logit) — minimizes the stratified estimator's variance at fixed
    total n, the statistically-grounded upgrade over proportional
    allocation for corpus eval sampling.  Integerized by the
    largest-remainder method so Σ alloc == n exactly.

    Shape: one bounded per-source moment fold (n, Σx, Σx² over micro
    logits), then an O(|sources|) driver fold — the zipf class.
    Exactness: Python-int moments; S_h = sqrt(num)/n then ×n, weight
    nano-quantized with ⌊x·1e9+½⌋ before the integer weight sum, so
    quotas are exact-int/exact-int IEEE divisions; remainder ranking
    on bit-identical doubles with source tie-break."""
    import math

    from docling_api_ray.stages.common import bounded_groupby_sum

    def scored(b: pa.Table) -> pa.Table:
        lg = ta.quality_logit(ta.quality_scores(b))
        lm = np.rint(
            np.asarray(lg["logit"], dtype=np.float64) * 1e6
        ).astype(np.int64)
        return pa.table(
            {
                "source": b["source"],
                "lm": pa.array(lm, type=pa.int64()),
                "lm2": pa.array(lm * lm, type=pa.int64()),
            }
        )

    rows = bounded_groupby_sum(
        _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
            scored, batch_format="pyarrow"
        ),
        ["source"],
        sum_cols={"s": "lm", "ss": "lm2"},
        count_alias="n",
    ).take_all()
    rows.sort(key=lambda r: r["source"])
    recs = []
    for r in rows:
        n_h, s1, s2 = int(r["n"]), int(r["s"]), int(r["ss"])
        num = n_h * s2 - s1 * s1  # Python-int exact
        std = math.sqrt(float(num)) / n_h
        w_nano = int(math.floor((std * n_h) * 1e9 + 0.5))
        recs.append([r["source"], n_h, w_nano])
    w_tot = sum(w for _, _, w in recs)
    n_tot = sum(n for _, n, _ in recs)
    quotas = []
    for src, n_h, w_nano in recs:
        if w_tot > 0:
            q = float(_NEYMAN_N * w_nano) / float(w_tot)
        else:
            q = float(_NEYMAN_N * n_h) / float(n_tot)
        quotas.append(q)
    bases = [int(math.floor(q)) for q in quotas]
    leftover = _NEYMAN_N - sum(bases)
    order = sorted(
        range(len(recs)),
        key=lambda i: (-(quotas[i] - bases[i]), recs[i][0]),
    )
    alloc = list(bases)
    for i in order[: max(leftover, 0)]:
        alloc[i] += 1
    return pa.table(
        {
            "source": pa.array([r[0] for r in recs], type=pa.string()),
            "n_docs": pa.array([r[1] for r in recs], type=pa.int64()),
            "weight_nano": pa.array(
                [r[2] for r in recs], type=pa.int64()
            ),
            "quota": pa.array(quotas, type=pa.float64()),
            "alloc": pa.array(alloc, type=pa.int64()),
        }
    )


def _q_neyman_sample(sf_dir: str):
    """Draw the Neyman-allocated stratified sample: per source, the
    alloc_h docs with the smallest md5-derived hash (hash order ⟂ any
    data attribute; identical on every run/node/reshard — the
    stratified_sample discipline with a per-stratum variable k).  The
    allocation table (≤|sources| rows) is computed first and embedded
    in the head closure — the broadcast-small-side pattern.  Output is
    Σ alloc rows (= _NEYMAN_N), scale-independent."""
    alloc_tbl = _q_neyman_allocation(sf_dir)
    alloc = {
        s: int(a)
        for s, a in zip(
            alloc_tbl["source"].to_pylist(), alloc_tbl["alloc"].to_pylist()
        )
    }
    ds = _docs(sf_dir, ["doc_id", "source"])

    def add_hkey(b: pa.Table) -> pa.Table:
        from docling_api_ray.functions.hashing import u64_md5

        ids = [str(i) for i in b["doc_id"].to_pylist()]
        h = (u64_md5(np.array(ids, dtype=object)) >> np.uint64(1)).astype(
            np.int64
        )
        return b.append_column("hkey", pa.array(h, type=pa.int64()))

    def head(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas().sort_values(
            ["source", "hkey", "doc_id"], kind="stable"
        )
        rn = df.groupby("source", sort=False).cumcount()
        k = df["source"].map(alloc).fillna(0).astype(np.int64)
        return pa.Table.from_pandas(
            df[rn.to_numpy() < k.to_numpy()], preserve_index=False
        ).cast(b.schema)

    return (
        ds.map_batches(add_hkey, batch_format="pyarrow")
        .map_batches(head, batch_format="pyarrow")
        .repartition(1)
        .map_batches(head, batch_format="pyarrow", batch_size=None)
        .select_columns(["doc_id", "source", "hkey"])
    )


def _q_vocab_coverage(sf_dir: str):
    """Good-Turing unseen-mass + Chao1 species-richness estimate from
    the exact vocabulary count-of-counts (Gale & Sampson 1995; Chao
    1984) — "how much of the language have we NOT crawled yet", the
    coverage planning readout next to Heaps' law (vocab_growth).

    Shape: per-batch Arrow wordcount partials, ONE word-hash co-group
    (each partition holds complete totals for its words), per-partition
    count-of-counts collapsed to a 4-int row (V, N, N1, N2) — the
    driver folds ≤P rows of 4 Python-int-exact sums.  unseen = N1/N
    and chao1 = V + N1²/(2·N2) are single IEEE divisions."""
    import pandas as pd

    from docling_api_ray.stages.common import (
        coalesce_narrow,
        guard_fold,
        shuffle_partitions,
    )

    P = shuffle_partitions()
    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.word_counts, batch_format="pyarrow"
    )

    def add_part(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(b["word"].to_pylist(), dtype=object)
        ).astype(np.int64)
        return b.append_column(
            "__part", pa.array(np.abs(h) % P, type=pa.int64())
        )

    def fold(df: "pd.DataFrame") -> pa.Table:
        cnt = df.groupby("word", sort=False)["n"].sum().to_numpy()
        return pa.table(
            {
                "v": pa.array([len(cnt)], type=pa.int64()),
                "nt": pa.array([int(cnt.sum())], type=pa.int64()),
                "n1": pa.array([int((cnt == 1).sum())], type=pa.int64()),
                "n2": pa.array([int((cnt == 2).sum())], type=pa.int64()),
            }
        )

    rows = (
        coalesce_narrow(
            partials.map_batches(add_part, batch_format="pyarrow")
        )
        .groupby("__part")
        .map_groups(guard_fold(fold), batch_format="pandas")
    ).take_all()
    V = sum(int(r["v"]) for r in rows)
    N = sum(int(r["nt"]) for r in rows)
    N1 = sum(int(r["n1"]) for r in rows)
    N2 = sum(int(r["n2"]) for r in rows)
    unseen = float(N1) / float(N) if N else None
    chao1 = float(V) + float(N1 * N1) / float(2 * N2) if N2 else None
    return pa.table(
        {
            "n_tokens": pa.array([N], type=pa.int64()),
            "vocab": pa.array([V], type=pa.int64()),
            "n1": pa.array([N1], type=pa.int64()),
            "n2": pa.array([N2], type=pa.int64()),
            "unseen_mass": pa.array([unseen], type=pa.float64()),
            "chao1": pa.array([chao1], type=pa.float64()),
        }
    )


_MK_Z95 = 1.959964  # two-sided 95% normal quantile


def _q_mann_kendall(sf_dir: str):
    """Mann–Kendall monotone-trend test over per-type daily event
    counts (Mann 1945; Kendall's S with the tie-corrected variance) —
    the nonparametric "is volume trending" alarm beside the EWMA level
    chart: S = Σ_{i<j} sign(x_j − x_i), Var = (n(n−1)(2n+5) −
    Σt(t−1)(2t+5))/18, continuity-corrected z, trend at |z| > 1.96.

    Shape: the same bounded (type × day) count fold as events_ewma,
    then an O(days²) vectorized sign fold per type co-group (days are
    domain-bounded).  S, ties and Var numerator are int-exact; z is the
    same two-op double expression in both engines."""
    import math

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def add_day(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        day = pc.divide(us, 86_400_000_000)
        return pa.table(
            {
                "event_type": b["event_type"],
                "day": pc.cast(day, pa.int64()),
            }
        )

    agg = (
        _coal(ds.map_batches(add_day, batch_format="pyarrow"))
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"))
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n_days", pa.int64()),
            ("s", pa.int64()),
            ("var_num", pa.int64()),
            ("z", pa.float64()),
            ("trend", pa.string()),
        ]
    )

    def fold(df):
        if not len(df):
            return out_schema.empty_table()
        df = df.sort_values("day", kind="stable")
        ns = df["n"].to_numpy(dtype=np.int64)
        n = len(ns)
        sgn = np.sign(ns[None, :] - ns[:, None])
        s = int(np.triu(sgn, k=1).sum())
        _, t = np.unique(ns, return_counts=True)
        tie_sum = int((t * (t - 1) * (2 * t + 5)).sum())
        var_num = n * (n - 1) * (2 * n + 5) - tie_sum
        if var_num > 0 and s != 0:
            z = float(s - (1 if s > 0 else -1)) / math.sqrt(
                float(var_num) / 18.0
            )
        else:
            z = 0.0
        trend = "up" if z > _MK_Z95 else ("down" if z < -_MK_Z95 else "flat")
        return pa.table(
            {
                "event_type": df["event_type"].to_numpy()[:1],
                "n_days": pa.array([n], type=pa.int64()),
                "s": pa.array([s], type=pa.int64()),
                "var_num": pa.array([var_num], type=pa.int64()),
                "z": pa.array([z], type=pa.float64()),
                "trend": pa.array([trend], type=pa.string()),
            }
        ).cast(out_schema)

    from docling_api_ray.stages.common import guard_fold

    return agg.groupby("event_type").map_groups(
        guard_fold(fold), batch_format="pandas"
    )


def _q_distinct_ngrams(sf_dir: str):
    """Corpus diversity: distinct-1/2/3 ratios (stages/dedup.py
    distinct_ngram_stats) — the mode-collapse monitor.  One text pass
    emits block-unique n-gram hashes + per-n totals; exact distinct via
    a hash-partitioned co-group (disjoint partition-local uniques),
    bounded per-n folds."""
    from docling_api_ray.stages.dedup import distinct_ngram_stats

    return distinct_ngram_stats(_docs(sf_dir, ["doc_id", "text"]))


def _q_psi_by_source(sf_dir: str):
    """Per-source Population Stability Index of the quality-classifier
    probability vs the rest of the corpus (stages/stats.py grouped_psi)
    — the fixed-bin model-monitoring drift metric next to the KS
    sup-norm.  One bounded (source x bin) fold; nano-quantized
    order-free term sums; Laplace +1 both sides."""
    from docling_api_ray.stages.stats import grouped_psi

    def scored(b: pa.Table) -> pa.Table:
        lg = ta.quality_logit(ta.quality_scores(b))
        prob = np.asarray(lg["prob"], dtype=np.float64)
        return pa.table(
            {
                "source": b["source"],
                "prob_micro": pa.array(
                    np.rint(prob * 1e6).astype(np.int64), type=pa.int64()
                ),
            }
        )

    return grouped_psi(
        _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
            scored, batch_format="pyarrow"
        ),
        group_col="source",
        prob_micro_col="prob_micro",
        n_bins=10,
    )


_DEBOUNCE_US = 100_000_000_000


def _q_event_debounce(sf_dir: str):
    """Per-type telemetry debounce audit (stages/windows.py
    event_debounce): events kept iff first in their (user, type)
    stream or ≥ the window after the previous one — LAG-window exact,
    one user-hash exchange, bounded per-type summary."""
    from docling_api_ray.stages.windows import event_debounce

    return event_debounce(
        _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]),
        window_us=_DEBOUNCE_US,
    )


def _q_lsh_eval(sf_dir: str):
    """Precision/recall of the MinHash-LSH candidate tier against the
    exact word-set-Jaccard ground truth at the same threshold
    (stages/dedup.py lsh_pair_eval) — the sketch-acceptance gate run
    before trusting banding parameters at scale.  One semi hash-join on
    the packed pair key; both pair sets are existing engine paths."""
    from docling_api_ray.stages.dedup import lsh_pair_eval

    return lsh_pair_eval(
        _docs(sf_dir, ["doc_id", "text"]), threshold=0.7
    )


_BUDGET_TOKENS = 15_000


def _q_budget_select(sf_dir: str):
    """Greedy quality-first data selection under a token budget
    (stages/selection.py token_budget_select): admit whole docs in
    (quality-logit DESC, doc_id ASC) order until the next would
    overflow 15k tokens.  NO global sort — one bounded score-histogram
    fold finds the boundary layer, one equality-filter pass resolves
    its id-ordered admission; Python-int arithmetic throughout."""
    from docling_api_ray.stages.selection import token_budget_select

    def scored(b: pa.Table) -> pa.Table:
        qs = ta.quality_scores(b)
        lg = ta.quality_logit(qs)
        logit = np.asarray(lg["logit"], dtype=np.float64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "score_micro": pa.array(
                    np.rint(logit * 1e6).astype(np.int64), type=pa.int64()
                ),
                "n_tokens": qs["n_words"],
            }
        )

    scored_ds = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(scored, batch_format="pyarrow")
        .materialize()  # token_budget_select re-scans for the tie layer
    )
    return token_budget_select(scored_ds, budget=_BUDGET_TOKENS)


def _q_ks_drift_by_source(sf_dir: str):
    """Per-source exact two-sample Kolmogorov-Smirnov drift of the
    n_chars distribution vs the rest of the corpus (stages/stats.py
    grouped_ks_drift) — the assumption-free distribution-shift tripwire.
    sup-norm from ONE bounded (source x value) histogram fold; pure-int
    numerator walk, one int/int division per source."""
    from docling_api_ray.stages.stats import grouped_ks_drift

    return grouped_ks_drift(
        _docs(sf_dir, ["source", "n_chars"]),
        group_col="source",
        value_col="n_chars",
    )


def _q_isotonic_calibration(sf_dir: str):
    """Isotonic (PAV) calibration of the quality-classifier probability
    against the lang='en' proxy label (stages/stats.py
    isotonic_calibration) — the monotone recalibration the raw
    reliability diagram (quality_calibration) feeds at threshold time.
    Exact via the minimax characterization: interval mean ratios over
    the 10-bin fold, min over right endpoints then running max — the
    SQL mirror expresses both directly."""
    from docling_api_ray.stages.stats import isotonic_calibration

    def scored(b: pa.Table) -> pa.Table:
        lg = ta.quality_logit(ta.quality_scores(b))
        prob = np.asarray(lg["prob"], dtype=np.float64)
        lang = np.asarray(b["lang"])
        return pa.table(
            {
                "prob_micro": pa.array(
                    np.rint(prob * 1e6).astype(np.int64), type=pa.int64()
                ),
                "pos": pa.array(
                    (lang == "en").astype(np.int64), type=pa.int64()
                ),
            }
        )

    return isotonic_calibration(
        _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
            scored, batch_format="pyarrow"
        ),
        prob_micro_col="prob_micro",
        pos_col="pos",
        n_bins=10,
    )


def _q_quality_calibration(sf_dir: str):
    """Reliability-diagram calibration of the quality-classifier
    probability against the keep-worthy proxy label lang='en'
    (stages/stats.py calibration_bins): fixed decile bins of the
    micro-quantized sigmoid, per bin observed positive rate vs mean
    predicted probability — ONE n_bins-bounded fold, int/int divisions
    the mirror replays in order."""
    from docling_api_ray.stages.stats import calibration_bins

    def scored(b: pa.Table) -> pa.Table:
        lg = ta.quality_logit(ta.quality_scores(b))
        prob = np.asarray(lg["prob"], dtype=np.float64)
        lang = np.asarray(b["lang"])
        return pa.table(
            {
                "prob_micro": pa.array(
                    np.rint(prob * 1e6).astype(np.int64), type=pa.int64()
                ),
                "pos": pa.array(
                    (lang == "en").astype(np.int64), type=pa.int64()
                ),
            }
        )

    return calibration_bins(
        _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
            scored, batch_format="pyarrow"
        ),
        prob_micro_col="prob_micro",
        pos_col="pos",
        n_bins=10,
    )


def _scored_source_logits(sf_dir: str) -> "ray.data.Dataset":
    """Narrow (doc_id, source, logit) projection: quality_scores +
    quality_logit fused into ONE stateless pass that carries the source
    key through (the standalone kernels project it away), materialized
    because grouped selection re-scans it per refinement pass."""

    def scored(b: pa.Table) -> pa.Table:
        lg = ta.quality_logit(ta.quality_scores(b))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
                "logit": lg["logit"],
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text", "source"])
        .map_batches(scored, batch_format="pyarrow")
        .materialize()
    )


def _q_source_score_quantiles(sf_dir: str):
    """Per-source exact quality-logit quantiles (p25/p50/p90) via
    stages/selection.py grouped_quantile_select — every (source, q)
    bracket refines in SHARED histogram passes (one atomic list<int64>
    row per bracket per batch), so the pass count is independent of
    |sources| and the fold payload is |brackets| x bins ints, never
    row-bounded.  quantile_disc rank rule, DuckDB-verified."""
    from docling_api_ray.stages.selection import grouped_quantile_select

    return grouped_quantile_select(
        _scored_source_logits(sf_dir),
        key_col="source",
        value_col="logit",
        quantiles=(0.25, 0.5, 0.9),
    )


def _q_quality_gate_by_source(sf_dir: str):
    """Per-source median quality gate — the production quality-filter
    shape: grouped exact selection computes each source's
    quantile_disc(0.5) logit threshold (a |sources|-bounded table), the
    threshold dict is value-captured into a stateless vectorized filter
    pass, and docs at/above their source's median survive.  Nothing
    corpus-proportional reaches the driver; the gate itself is one
    streaming pass."""
    from docling_api_ray.stages.selection import grouped_quantile_select

    scored = _scored_source_logits(sf_dir)
    thr_tbl = grouped_quantile_select(
        scored, key_col="source", value_col="logit", quantiles=(0.5,)
    )
    thr = {
        str(s): float(v)
        for s, v in zip(
            thr_tbl["source"].to_pylist(), thr_tbl["value"].to_pylist()
        )
    }

    def gate(b: pa.Table, thr=thr) -> pa.Table:
        import pandas as pd

        src = pd.Series(b["source"].to_pylist(), dtype=object)
        t = src.map(thr).to_numpy(dtype=np.float64)
        lg = np.asarray(b["logit"], dtype=np.float64)
        return b.filter(pa.array(lg >= t))

    return scored.map_batches(gate, batch_format="pyarrow")


def _q_lang_entropy(sf_dir: str):
    """Per-source language-distribution entropy (stages/stats.py
    grouped_entropy): bounded (source x lang) partial counts, integer
    micro-term inner sum (order-free), one tiny exact final fold."""
    from docling_api_ray.stages.stats import grouped_entropy

    return grouped_entropy(_docs(sf_dir, ["source", "lang"]))


def _q_charlm(sf_dir: str):
    """CCNet-style char-bigram LM quality scores (stages/charlm.py):
    one bounded-sketch train pass (each block reduces to a single dense
    96x96 int64 count row), integer micro-log-prob table broadcast via
    ray.put, stateless scoring pass.  Integer-exact sums make the
    oracle comparison order-free."""
    from docling_api_ray.stages.charlm import charlm_scores

    return charlm_scores(_docs(sf_dir, ["doc_id", "text"]))


def _q_token_quantiles(sf_dir: str):
    """Exact per-source token-count quantiles (p50/p90/p99,
    percentile_disc semantics) via the value-HISTOGRAM design
    (stages/stats.py): per-batch (source, n)→count partials, bounded
    tree fold, one tiny cumulative pass — no per-group co-location of
    corpus-proportional rows anywhere."""
    from docling_api_ray.stages.stats import grouped_int_quantiles

    def add_n(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "source": b["source"],
                "n": pc.cast(
                    pc.count_substring_regex(b["text"], ta.WS_TOKEN_RE),
                    pa.int64(),
                ),
            }
        )

    ds = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        add_n, batch_format="pyarrow"
    )
    return grouped_int_quantiles(ds, group_col="source", value_col="n")


def _q_split_assign(sf_dir: str):
    """Deterministic hash-based train/val/test split (stages/splits.py):
    md5-mod-100 buckets, 90/5/5 — stateless, shuffle-free, identical on
    every run/node/reshard; the oracle mirrors the hash via
    md5_number."""
    from docling_api_ray.stages.splits import assign_splits

    return _with_schema(
        assign_splits(_docs(sf_dir, ["doc_id"])),
        pa.schema(
            [("doc_id", pa.int64()), ("bucket", pa.int64()),
             ("split", pa.string())]
        ),
    )


def _q_dedup_minhash_keep(sf_dir: str):
    """The dedup ACTION: MinHash-LSH candidate pairs → connected
    components (distributed min-label propagation, stages/dedup.py) →
    per-document (component, keep) keep-list, first-wins by min id —
    singleton documents keep themselves."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.7)
    return _with_schema(dd.dedup_keep(docs, pairs), _KEEP_SCHEMA)


def _q_dedup_cluster_sizes(sf_dir: str):
    """Near-dup cluster-size HISTOGRAM — the dedup reporting tier a
    curation run publishes (how much of the corpus sits in 2-dup /
    10-dup / mega clusters): LSH pairs → connected components →
    one narrow (component) count exchange → a bounded counts-of-counts
    tree fold (custdist's shape over the dedup graph).  Singletons are
    size-1 clusters.  Nothing corpus-proportional reaches the driver;
    the histogram domain is bounded by the max cluster size."""
    from docling_api_ray.stages.common import two_level_fold

    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.7)
    keep = dd.dedup_keep(docs, pairs)
    sizes = keep.groupby("component").count()

    hist_schema = pa.schema(
        [("cluster_size", pa.int64()), ("n_clusters", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        c = np.asarray(b["count()"], dtype=np.int64)
        u, n = np.unique(c, return_counts=True)
        return pa.table(
            {
                "cluster_size": pa.array(u),
                "n_clusters": pa.array(n.astype(np.int64)),
            },
            schema=hist_schema,
        )

    def fold(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        g = (
            df.groupby("cluster_size", sort=True)["n_clusters"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(
            g, schema=hist_schema, preserve_index=False
        )

    return two_level_fold(
        sizes.map_batches(partial, batch_format="pyarrow"), fold
    )


def _q_embedding_neardup(sf_dir: str):
    return _with_schema(
        dd.embedding_neardup_pairs(
            _emb(sf_dir, ["vec_id", "embedding", "label"]),
            block_col="label",
            threshold=_NEARDUP_TH,
        ),
        _PAIRS_C,
    )


def _query_vectors(sf_dir: str):
    # predicate pushdown: only the N query rows leave storage (a plain
    # read_table would materialize the whole embeddings table driver-side)
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", _N_QUERIES)],
    )
    qids = tbl["vec_id"].to_pylist()
    qmat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )
    order = np.argsort(qids)
    return [int(qids[i]) for i in order], qmat[order]


def _q_knn(sf_dir: str):
    qids, qmat = _query_vectors(sf_dir)
    return sim.knn_bruteforce(
        _emb(sf_dir, ["vec_id", "embedding"]), qids, qmat, k=_KNN_K
    ).select_columns(["query_id", "vec_id", "cosine", "rank"])


def _q_mmr_select(sf_dir: str):
    """MMR diverse top-10 for the first held-out query
    (stages/similarity.py mmr_select): distributed bounded top-50
    recall pool, driver-side greedy over the pool² gram.  Iterative
    float argmax — rows-only, pinned by the numpy-reference test in
    test_similarity.py (the pca_project class)."""
    qids, qmat = _query_vectors(sf_dir)
    return sim.mmr_select(
        _emb(sf_dir, ["vec_id", "embedding"]), qmat[0], k=10, pool=50,
        exclude_ids=(qids[0],),
    )


_IVF_DIM = 64
_IVF_NCENTROIDS = 8
_IVF_NPROBE = 4
_IVF_SEED = 123


_INDEX_CACHE: dict[tuple[str, str], str] = {}



def _rename_inline(ds, mapping: dict):
    """Column rename fused into a map — a standalone ``rename_columns``
    op logs a spurious cross-bundle schema warning at tiny scale."""
    def r(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            [mapping.get(c, c) for c in b.column_names]
        )

    return ds.map_batches(r, batch_format="pyarrow")


def _persisted_index_dir(kind: str, sf_dir: str, build) -> str:
    """Per-process scratch dir for a persisted index, built ONCE per
    (kind, corpus) and reused by later calls in the same process —
    matching the production contract (indexes are written at corpus
    COMMIT time, not per query), so bench reps after the first time the
    pruned query rather than re-paying the build (ADVICE r3).
    ``mkdtemp`` keys the path by process: two concurrent sessions
    benching the same sf dir can no longer delete each other's index
    mid-read the way the old fixed /tmp path could.  Dirs are removed
    at interpreter exit."""
    import atexit
    import shutil
    import tempfile

    key = (kind, os.path.abspath(sf_dir))
    d = _INDEX_CACHE.get(key)
    if d is not None and os.path.isdir(d):
        return d
    d = tempfile.mkdtemp(
        prefix=f"{kind}_{os.path.basename(sf_dir.rstrip(os.sep))}_"
    )
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    build(d)
    _INDEX_CACHE[key] = d
    return d


def _fixed_centroids() -> np.ndarray:
    """Deterministic data-independent coarse quantizer for the
    conformance query: 8 seeded unit vectors.  (The production path
    trains centroids with ``sim.train_centroids`` — Lloyd on a sample —
    whose float iteration order is not SQL-reproducible; recall of the
    trained quantizer is covered by tests/test_similarity.py.  A fixed
    quantizer keeps the IVF pruning + top-k machinery fully
    oracle-checkable.)"""
    rng = np.random.RandomState(_IVF_SEED)
    c = rng.randn(_IVF_NCENTROIDS, _IVF_DIM)
    n = np.linalg.norm(c, axis=1)
    return c / n[:, None]


def _q_knn_ivf(sf_dir: str):
    qids, qmat = _query_vectors(sf_dir)
    return sim.ivf_knn(
        _emb(sf_dir, ["vec_id", "embedding"]),
        qids,
        qmat,
        _fixed_centroids(),
        k=_KNN_K,
        nprobe=_IVF_NPROBE,
    ).select_columns(["query_id", "vec_id", "cosine", "rank"])


def _q_knn_ivf_partitioned(sf_dir: str):
    """The persisted-index IVF path (stages/similarity.py
    ivf_write_index + ivf_knn_partitioned): build the
    centroid-partitioned Parquet index under /tmp once, then answer the
    conformance queries with FILE-level partition pruning — only the
    probed ``centroid=`` directories are ever read.  Same oracle as
    ``knn_ivf`` because the results are required to be identical; the
    pruning itself is proven by tests/test_similarity.py (unprobed
    cells deleted, query unaffected)."""
    qids, qmat = _query_vectors(sf_dir)
    cents = _fixed_centroids()
    index_dir = _persisted_index_dir(
        "ivf_index",
        sf_dir,
        lambda d: sim.ivf_write_index(
            _emb(sf_dir, ["vec_id", "embedding"]), cents, d
        ),
    )
    return sim.ivf_knn_partitioned(
        index_dir, qids, qmat, cents, k=_KNN_K, nprobe=_IVF_NPROBE
    ).select_columns(["query_id", "vec_id", "cosine", "rank"])


def _q_events_hourly(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def add_window(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())  # epoch microseconds
        win = pc.multiply(pc.divide(us, 3_600_000_000), 3600)
        return pa.table(
            {
                "event_type": b["event_type"],
                "window_start": pc.cast(win, pa.int64()),
                "value": b["value"],
            }
        )

    agg = (
        coalesce_narrow(ds.map_batches(add_window, batch_format="pyarrow"))
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def round_sum(b: pa.Table) -> pa.Table:
        from docling_api_ray.stages.windows import quantize6

        return b.set_column(
            b.schema.get_field_index("sum_value"),
            "sum_value",
            quantize6(b["sum_value"]),
        )

    return agg.map_batches(round_sum, batch_format="pyarrow")


def _q_docs_stats(sf_dir: str):
    agg = bounded_groupby_sum(
        _docs(sf_dir, ["source", "n_chars"]),
        ["source"],
        sum_cols={"total_chars": "n_chars"},
        count_alias="n_docs",
    )

    def add_avg(b: pa.Table) -> pa.Table:
        avg = pc.round(
            pc.divide(
                pc.cast(b["total_chars"], pa.float64()),
                pc.cast(b["n_docs"], pa.float64()),
            ),
            ndigits=6,
        )
        return b.append_column("avg_chars", avg)

    return agg.map_batches(add_avg, batch_format="pyarrow")


def _q_topk_longest(sf_dir: str):
    """Sort + limit (SURVEY.md §2.6 — absent from the reference; smoke
    slice semantics).  Deterministic tie-break on doc_id."""
    return (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(20)
    )


def _q_topk_per_source(sf_dir: str):
    """Grouped top-k (rank window): the 3 longest docs PER SOURCE with a
    dense 1-based rank — the per-key window op the global sort+limit
    doesn't cover.  Partial top-k per batch (vectorized lexsort, keeps
    ≤3·|sources| rows) shrinks the shuffle to kilobytes before the
    per-key reduce."""
    ds = _docs(sf_dir, ["doc_id", "source", "n_chars"])
    K = 3

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        df = df.sort_values(
            ["source", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        return pa.Table.from_pandas(
            df.groupby("source", sort=False).head(K), preserve_index=False
        ).cast(b.schema)

    def final(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas().sort_values(
            ["source", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        out = df.groupby("source", sort=False).head(K).copy()
        out["rank"] = out.groupby("source", sort=False).cumcount() + 1
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        return tbl.set_column(
            tbl.schema.get_field_index("rank"),
            "rank",
            pc.cast(tbl["rank"], pa.int64()),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def _q_stratified_sample(sf_dir: str):
    """Deterministic per-source uniform sample: the 5 docs with the
    SMALLEST md5-derived hash per source — the balanced-mixture sampler
    of a training pipeline (hash order ⟂ any data attribute, identical
    on every run/node/reshard).  Same two-level partial-top-k shape as
    the grouped rank window: per-batch heads shrink the exchange to
    ≤5·|sources| rows per block."""
    ds = _docs(sf_dir, ["doc_id", "source"])
    K = 5

    def add_hkey(b: pa.Table) -> pa.Table:
        from docling_api_ray.functions.hashing import u64_md5

        ids = [str(i) for i in b["doc_id"].to_pylist()]
        h = (u64_md5(np.array(ids, dtype=object)) >> np.uint64(1)).astype(
            np.int64
        )
        return b.append_column("hkey", pa.array(h, type=pa.int64()))

    def head(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas().sort_values(
            ["source", "hkey", "doc_id"], kind="stable"
        )
        return pa.Table.from_pandas(
            df.groupby("source", sort=False).head(K), preserve_index=False
        ).cast(b.schema)

    return (
        ds.map_batches(add_hkey, batch_format="pyarrow")
        .map_batches(head, batch_format="pyarrow")
        .repartition(1)
        .map_batches(head, batch_format="pyarrow", batch_size=None)
        .select_columns(["doc_id", "source", "hkey"])
    )


def _q_distinct_lang_source(sf_dir: str):
    """Distinct pairs (§2.7 set-ops extension) as a vectorized grouped
    aggregate projected back to the key columns."""
    return bounded_groupby_sum(
        _docs(sf_dir, ["lang", "source"]), ["lang", "source"], count_alias="n"
    ).select_columns(["lang", "source"])


def _q_sample_systematic(sf_dir: str):
    """Deterministic systematic sample (every 20th doc) — the reproducible
    stand-in for random_sample in oracle-checked tests."""
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def every_20th(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        mod = pc.subtract(ids, pc.multiply(pc.divide(ids, 20), 20))
        return b.filter(pc.equal(mod, 0))

    return ds.map_batches(every_20th, batch_format="pyarrow")


def _q_docs_region_join(sf_dir: str):
    """Broadcast (map-side) join against a small dimension table
    (SURVEY.md §2.4 pattern: ray.put once, vectorized lookup per batch —
    no shuffle)."""
    import ray

    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    keys = np.asarray(region["r_regionkey"], dtype=np.int64)
    names = np.asarray(region["r_name"].to_pylist(), dtype=object)
    lookup = np.empty(int(keys.max()) + 1, dtype=object)
    lookup[keys] = names
    ref = ray.put(lookup)

    def join(b: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        rk = np.asarray(b["doc_id"], dtype=np.int64) % 5
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "region_name": pa.array(lk[rk], type=pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id"]).map_batches(join, batch_format="pyarrow")


def _q_events_sliding(sf_dir: str):
    from docling_api_ray.stages.windows import sliding_window_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    return sliding_window_agg(ds, key="event_type", size_s=3600, slide_s=900)


def _q_events_sessions(sf_dir: str):
    from docling_api_ray.stages.windows import session_windows

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    return session_windows(ds, key="user_id", gap_s=1800)


def _q_orders_per_customer(sf_dir: str):
    """Both-sides-large partitioned hash join (stages/joins.py) after
    pre-aggregating the fact side — aggregate first, join narrow."""
    from docling_api_ray.stages.joins import hash_join

    cust = _rename_inline(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        {"c_custkey": "custkey"},
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    agg = _rename_inline(
        coalesce_narrow(orders)
        .groupby("o_custkey")
        .aggregate(
            Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total_price")
        ),
        {"o_custkey": "custkey"},
    )
    joined = hash_join(
        cust, agg, on="custkey", how="left",
        schemas=(
            pa.schema([("custkey", pa.int64()), ("c_name", pa.string())]),
            pa.schema([("custkey", pa.int64()), ("n_orders", pa.int64()),
                       ("total_price", pa.float64())]),
        ),
    )
    from docling_api_ray.stages.windows import quantize6

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": b["custkey"],
                "c_name": b["c_name"],
                "n_orders": pc.fill_null(pc.cast(b["n_orders"], pa.int64()), 0),
                "total_price": quantize6(pc.fill_null(b["total_price"], 0.0)),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


_SHIP_CUTOFF = "1998-06-01"


def _q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — 3-way join + grouped agg + global top-10:
    customer segment slice broadcast as a semi-join id set (``ray.put``
    once, ``np.isin`` per batch; scale escape = the partitioned hash
    semi-join when the slice outgrows worker heaps), date-pruned scans
    on BOTH fact sides, partitioned hash join on orderkey
    (stages/joins.py), per-block grouped revenue sum (orderkeys are
    co-located by the join's bucketing, and batch_size=None keeps block
    boundaries), quantize-2 BEFORE ranking, two-level bounded top-10
    head.  Nothing corpus-proportional ever leaves the exchanges except
    the join payload itself."""
    from datetime import datetime

    import pandas as pd

    from docling_api_ray.stages.joins import hash_join

    cutoff = pa.scalar(
        datetime.fromisoformat(_SHIP_CUTOFF), type=pa.timestamp("us")
    )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def seg_keys(b: pa.Table) -> pa.Table:
        m = pc.equal(b["c_mktsegment"], "BUILDING")
        return b.filter(m).select(["c_custkey"])

    parts = [
        np.asarray(b["c_custkey"])
        for b in cust.map_batches(seg_keys, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if len(b)
    ]
    key_ref = ray.put(
        np.sort(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
    )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    )

    def sel_orders(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b["o_orderdate"], cutoff))
        keep = np.isin(np.asarray(b["o_custkey"]), ray.get(key_ref))
        return b.filter(pa.array(keep)).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )

    o = orders.map_batches(sel_orders, batch_format="pyarrow")

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    )

    def sel_li(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["l_shipdate"], cutoff))
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table(
            {"o_orderkey": pc.cast(b["l_orderkey"], pa.int64()), "rev": rev}
        )

    l = li.map_batches(sel_li, batch_format="pyarrow")
    joined = hash_join(
        l, o, on="o_orderkey",
        schemas=(
            pa.schema([("o_orderkey", pa.int64()), ("rev", pa.float64())]),
            pa.schema([("o_orderkey", pa.int64()),
                       ("o_orderdate", pa.timestamp("us")),
                       ("o_orderpriority", pa.string())]),
        ),
    )

    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("revenue", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )

    def agg(df: "pd.DataFrame") -> pa.Table:
        g = (
            df.groupby(
                ["o_orderkey", "o_orderdate", "o_orderpriority"], sort=False
            )["rev"]
            .sum()
            .reset_index()
        )
        g["revenue"] = np.rint(g["rev"].to_numpy(np.float64) * 100) / 100.0
        return pa.Table.from_pandas(
            g[["o_orderkey", "revenue", "o_orderdate", "o_orderpriority"]],
            preserve_index=False,
        ).cast(out_schema)

    def head(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["revenue", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True],
            kind="stable",
        ).head(10)
        return pa.Table.from_pandas(df, preserve_index=False).cast(out_schema)

    return _with_schema(
        joined.map_batches(agg, batch_format="pandas", batch_size=None)
        .map_batches(head, batch_format="pyarrow")
        .repartition(1)
        .map_batches(head, batch_format="pyarrow", batch_size=None),
        out_schema,
    )


def _q_events_attribution(sf_dir: str):
    """As-of join: each purchase attributed to the user's most recent
    prior click (stages/joins.py asof_join_events)."""
    from docling_api_ray.stages.joins import asof_join_events

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    return asof_join_events(ds, left_type="purchase", right_type="click")


def _q_events_distinct_users(sf_dir: str):
    """Exact distinct count as two vectorized grouped aggregates (distinct
    pairs, then count per type) — no per-group python."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    pairs = (
        coalesce_narrow(ds)
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="dummy"))
        .select_columns(["event_type"])
    )
    return pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))


def _q_events_retention(sf_dir: str):
    """Cohort RETENTION matrix — for each first-seen-day cohort, how
    many of its users were active again `offset` days later (offset 0 =
    cohort size): the canonical growth-analytics triangle.

    Scale shape: ONE user-mod-P co-group exchange of (user, day)
    per-batch-distinct pairs — every event of a user lands in one
    partition, so the user's first day AND distinct active days resolve
    in-partition with a vectorized sort + first + merge (no second
    pass, no join); per-partition output is ≤|days|² (cohort, offset)
    partials, folded by the bounded tree."""
    import pandas as pd

    from docling_api_ray.stages.common import shuffle_partitions

    P = shuffle_partitions()
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"], dtype=np.int64)
        day = np.asarray(pc.cast(b["ts"], pa.int64())) // DAY_US
        df = pd.DataFrame({"u": uid, "d": day}).drop_duplicates()
        return pa.table(
            {
                "u": pa.array(df["u"].to_numpy(), type=pa.int64()),
                "d": pa.array(df["d"].to_numpy(), type=pa.int64()),
                "__b": pa.array(
                    df["u"].to_numpy() % P, type=pa.int64()
                ),
            }
        )

    pair_schema = pa.schema(
        [("cohort_day", pa.int64()), ("day_offset", pa.int64()),
         ("n", pa.int64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates(["u", "d"])
        first = df.groupby("u", sort=False)["d"].min().rename("f")
        m = df.join(first, on="u")
        m["off"] = m["d"] - m["f"]
        g = (
            m.groupby(["f", "off"], sort=False)
            .size()
            .reset_index(name="n")
            .rename(columns={"f": "cohort_day", "off": "day_offset"})
        )
        return pa.Table.from_pandas(
            g[pair_schema.names], schema=pair_schema, preserve_index=False
        ).replace_schema_metadata(None)

    agg = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(  # coalesce_narrow inline — bundle tiny partial blocks
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__b")
        .map_groups(fold, batch_format="pandas"),
        ["cohort_day", "day_offset"],
        sum_cols={"n_users": "n"},
    )

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_day": pc.multiply(b["cohort_day"], 86400),
                "day_offset": b["day_offset"],
                "n_users": b["n_users"],
            }
        )

    return _with_schema(
        agg.map_batches(finalize, batch_format="pyarrow"),
        pa.schema(
            [("cohort_day", pa.int64()), ("day_offset", pa.int64()),
             ("n_users", pa.int64())]
        ),
    )


def _q_session_type_pairs(sf_dir: str):
    """Within-session event-type co-occurrence counts
    (stages/windows.py session_type_pairs): gap-sessionize per user
    (mod-P co-group, vectorized across users), distinct (session, type),
    self-merge for unordered pairs, |types|²-bounded tree fold."""
    from docling_api_ray.stages.windows import session_type_pairs

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return _with_schema(
        session_type_pairs(ds),
        pa.schema(
            [
                ("type_a", pa.string()),
                ("type_b", pa.string()),
                ("n_sessions", pa.int64()),
            ]
        ),
    )


def _q_events_new_users(sf_dir: str):
    """Daily NEW-user counts with a cumulative total — the growth-curve
    query every event pipeline runs: first-seen day per user, fold to
    per-day arrival counts, prefix-scan to cumulative.

    Scale shape: per-batch partial (user → min day) shrinks each block
    to its distinct users before the ONE mod-P co-group exchange of
    narrow (user, day) int64 pairs; the in-partition min fold emits one
    row per user, which ``bounded_groupby_sum`` tree-folds to the
    ≤|days| arrival table (days do not grow with corpus size at fixed
    retention) — only that bounded table reaches the driver for the
    prefix scan, never anything user-proportional."""
    import pandas as pd

    from docling_api_ray.stages.common import shuffle_partitions

    P = shuffle_partitions()
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"], dtype=np.int64)
        day = np.asarray(pc.cast(b["ts"], pa.int64())) // DAY_US
        keys, inv = np.unique(uid, return_inverse=True)
        mins = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, day)
        return pa.table(
            {
                "user_id": pa.array(keys, type=pa.int64()),
                "d": pa.array(mins, type=pa.int64()),
                "__b": pa.array(keys % P, type=pa.int64()),
            }
        )

    first_schema = pa.schema([("d", pa.int64())])

    def fold(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("user_id", sort=False)["d"].min()
        return pa.Table.from_pandas(
            g.reset_index()[["d"]], schema=first_schema, preserve_index=False
        ).replace_schema_metadata(None)

    arrivals = bounded_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(  # coalesce_narrow inline — bundle tiny partial blocks
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__b")
        .map_groups(fold, batch_format="pandas"),
        ["d"],
        count_alias="new_users",
    )
    rows = sorted(arrivals.take_all(), key=lambda r: r["d"])  # ≤|days| rows
    days = [int(r["d"]) for r in rows]
    new = [int(r["new_users"]) for r in rows]
    cum = np.cumsum(new).tolist()
    return pa.table(
        {
            "day_start": pa.array([d * 86400 for d in days], type=pa.int64()),
            "new_users": pa.array(new, type=pa.int64()),
            "cum_users": pa.array(cum, type=pa.int64()),
        }
    )


def _q_events_props_extract(sf_dir: str):
    """Semi-structured extraction: pull the int field k out of the props
    JSON string with the shared RE2 pattern, aggregate per event_type."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": b["event_type"], "k": k})

    return bounded_groupby_sum(
        ds.map_batches(extract, batch_format="pyarrow"),
        ["event_type"],
        sum_cols={"sum_k": "k"},
        count_alias="n",
    )


def _q_pricing_summary(sf_dir: str):
    """Columnar grouped aggregate over the widest table (TPC-H Q1 shape):
    derived revenue column computed vectorized, then one grouped agg."""
    ds = _read(sf_dir, "lineitem", [ "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", ])

    def derive(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "l_quantity": b["l_quantity"],
                "revenue": rev,
            }
        )

    # TPC-H Q1 shape: 6-group bounded domain over the widest table — the
    # canonical partial-aggregation case (shuffle moves ≤6 rows per block)
    agg = bounded_groupby_sum(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        sum_cols={"sum_qty": "l_quantity", "sum_revenue": "revenue"},
        count_alias="n_rows",
    )

    def round_cols(b: pa.Table) -> pa.Table:
        def q2(col):  # round(x*100)/100 — summation-order-independent
            return pc.divide(pc.round(pc.multiply(col, 100.0)), 100.0)

        b = b.set_column(
            b.schema.get_field_index("sum_qty"), "sum_qty", q2(b["sum_qty"])
        )
        return b.set_column(
            b.schema.get_field_index("sum_revenue"), "sum_revenue",
            q2(b["sum_revenue"]),
        )

    return agg.map_batches(round_cols, batch_format="pyarrow")


def _q_quality_filter(sf_dir: str):
    """Composition: quality scores → vectorized threshold filter → grouped
    count by lang (the keep/drop decision of a data-curation pipeline)."""
    scored = _docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        lambda b: ta.quality_scores(b).append_column("lang", b["lang"]),
        batch_format="pyarrow",
    )

    def keep(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(b["n_words"], 20),
            pc.less_equal(b["stopword_ratio"], 0.25),
        )
        return b.filter(mask)

    return bounded_groupby_sum(
        scored.map_batches(keep, batch_format="pyarrow").select_columns(["lang"]),
        ["lang"],
        count_alias="n_kept",
    )


def _q_kmeans(sf_dir: str):
    from docling_api_ray.stages.clustering import kmeans_assign

    return kmeans_assign(_emb(sf_dir, ["vec_id", "embedding"]), k=8, iters=2)


def _q_embedding_gram(sf_dir: str):
    from docling_api_ray.stages.linalg import gram_matrix

    return gram_matrix(_emb(sf_dir, ["embedding"]))


def _q_cluster_outliers(sf_dir: str):
    from docling_api_ray.stages.clustering import cluster_outliers

    return cluster_outliers(
        _emb(sf_dir, ["vec_id", "embedding"]), k=8, iters=2, top=20
    )


_SEMDEDUP_TH = 0.25  # within-cluster margins ≥1e-5 at oracle scales


def _q_semdedup(sf_dir: str):
    from docling_api_ray.stages.clustering import semdedup_keep

    return semdedup_keep(
        _emb(sf_dir, ["vec_id", "embedding"]),
        k=8,
        iters=2,
        threshold=_SEMDEDUP_TH,
    )


def _q_conversion_metrics(sf_dir: str):
    from docling_api_ray.pipelines.metrics import conversion_metrics

    return conversion_metrics(flagship(sf_dir, _flagship_cfg()))


def _q_media_phash_dups(sf_dir: str):
    """Exact image dedup via 64-bit perceptual average-hash
    (stages/multimodal.py PerceptualHash): decode every media PNG in an
    actor pool, aHash it, then a narrow phash-keyed grouped count keeps
    groups with >= 2 blobs.  No SQL oracle — the hash is a function of
    decoded pixel content, which SQL cannot reach; the driver records
    the rows-only check, and tests/test_multimodal.py pins the hash
    semantics (identical images collide across scales, distinct images
    do not)."""
    from docling_api_ray.stages.multimodal import PerceptualHash

    media = explode_media(flagship(sf_dir, _flagship_cfg()))
    ph = media.map_batches(
        PerceptualHash, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    ).select_columns(["phash"])
    counts = (
        coalesce_narrow(ph)
        .groupby("phash")
        .aggregate(Count(alias_name="n_blobs"))
    )

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["n_blobs"], 2))

    return counts.map_batches(keep, batch_format="pyarrow")


def _q_multimodal_meta(sf_dir: str):
    media = explode_media(flagship(sf_dir, _flagship_cfg()))
    return media.map_batches(
        MediaMetadata, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )


def _q_multimodal_dims(sf_dir: str):
    """Decoded PNG dimensions per media blob — SQL-oracle-able subset of
    the metadata stage (byte counts depend on zlib, so are left to the
    rows-only multimodal_meta)."""
    return _q_multimodal_meta(sf_dir).select_columns(
        ["doc_id", "filename", "kind", "width", "height", "bit_depth", "valid_png"]
    )


def _q_rollup_counts(sf_dir: str):
    """Multi-level rollup aggregate — GROUP BY ROLLUP(source, lang) counts
    and char totals.  One bounded partial-agg pass computes the leaf
    (source, lang) level; the coarser levels are derived from that
    bounded leaf table (|sources|×|langs| rows, corpus-independent) in a
    single-block pass — NOT by re-scanning the corpus once per level.
    '<all>' sentinels replace SQL's rollup NULLs so the compare is
    null-free."""
    import pandas as pd

    leaf = bounded_groupby_sum(
        _docs(sf_dir, ["source", "lang", "n_chars"]),
        ["source", "lang"],
        sum_cols={"chars_total": "n_chars"},
        count_alias="n_docs",
    )

    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("lang", pa.string()),
            ("n_docs", pa.int64()),
            ("chars_total", pa.int64()),
        ]
    )

    def rollup(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        cols = ["source", "lang", "n_docs", "chars_total"]
        lvl1 = (
            df.groupby("source", as_index=False)[["n_docs", "chars_total"]]
            .sum()
            .assign(lang="<all>")
        )
        lvl0 = pd.DataFrame(
            {
                "source": ["<all>"],
                "lang": ["<all>"],
                "n_docs": [df["n_docs"].sum()],
                "chars_total": [df["chars_total"].sum()],
            }
        )
        out = pd.concat([df[cols], lvl1[cols], lvl0[cols]], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False).cast(out_schema)

    # bounded_groupby_sum ends in a single folded block; batch_size=None
    # keeps the rollup derivation one whole-block pass
    return leaf.map_batches(rollup, batch_format="pyarrow", batch_size=None)


def _q_pivot_lang_format(sf_dir: str):
    """Pivot (long → wide): per-language document counts as one column
    per sniffed format.  The format comes from the REAL sniff path (same
    stage as classify_format), lang rides along through the stateless
    synthesize+classify maps; the long (lang, format) counts fold through
    the bounded tree aggregate and the pivot itself happens on the
    bounded result block (|langs|×|formats| rows)."""
    from docling_api_ray.functions.sniff import classify_format
    from docling_api_ray.sources.synth import make_raw_document

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def synth(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b["text"].to_pylist()
        names, payloads = [], []
        for d, t in zip(ids, texts):
            fn, pl = make_raw_document(int(d), t or "")
            names.append(fn)
            payloads.append(pl)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "filename": pa.array(names, type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {"lang": b["lang"], "format": pc.fill_null(b["format"], "other")}
        )

    long_counts = bounded_groupby_sum(
        ds.map_batches(synth, batch_format="pyarrow", batch_size=512)
        .map_batches(classify_format, batch_format="pyarrow")
        .map_batches(project, batch_format="pyarrow"),
        ["lang", "format"],
        count_alias="n",
    )

    fmts = ["pdf", "docx", "pptx", "html", "image", "md", "asciidoc", "other"]
    out_schema = pa.schema(
        [("lang", pa.string())] + [(f"n_{f}", pa.int64()) for f in fmts]
    )

    def pivot(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        wide = (
            df.pivot_table(
                index="lang", columns="format", values="n",
                aggfunc="sum", fill_value=0,
            )
            .reindex(columns=fmts, fill_value=0)
            .reset_index()
        )
        wide.columns = ["lang"] + [f"n_{f}" for f in fmts]
        return pa.Table.from_pandas(wide, preserve_index=False).cast(out_schema)

    return long_counts.map_batches(pivot, batch_format="pyarrow", batch_size=None)


def _q_events_gaps(sf_dir: str):
    """Per-user inter-event gap statistics — the LAG window shape.  Keys
    co-group to ~core-count partitions (user_id mod P); inside each
    partition one pandas sort + groupby-shift computes every user's gap
    series vectorized (no per-user dispatch).  Integer microsecond sums
    keep the compare exact; -1 sentinels mark gap-less users.  Tie
    discipline matches the oracle: ORDER BY (ts, event_id)."""
    import pandas as pd

    from docling_api_ray.stages.common import shuffle_partitions

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    P = shuffle_partitions()

    def add_part(b: pa.Table) -> pa.Table:
        part = pc.subtract(
            b["user_id"], pc.multiply(pc.divide(b["user_id"], P), P)
        )
        return b.append_column("__part", pc.cast(part, pa.int64()))

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_gaps", pa.int64()),
            ("total_gap_us", pa.int64()),
            ("max_gap_us", pa.int64()),
        ]
    )

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.copy()
        g["ts_us"] = g["ts"].astype("int64")
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        prev = g.groupby("user_id", sort=False)["ts_us"].shift(1)
        g["gap"] = g["ts_us"] - prev
        agg = g.groupby("user_id", sort=False)["gap"].agg(
            n_gaps="count", total_gap_us="sum", max_gap_us="max"
        )
        agg["n_gaps"] = agg["n_gaps"].astype("int64")
        agg["total_gap_us"] = agg["total_gap_us"].fillna(0).astype("int64")
        agg["max_gap_us"] = agg["max_gap_us"].fillna(-1).astype("int64")
        return pa.Table.from_pandas(agg.reset_index(), preserve_index=False).cast(
            out_schema
        )

    return _with_schema(
        coalesce_narrow(ds.map_batches(add_part, batch_format="pyarrow"))
        .groupby("__part")
        .map_groups(per_partition, batch_format="pandas"),
        out_schema,
    )


_NOORD_CUTOFF = "1996-01-01"


def _q_customers_no_orders(sf_dir: str):
    """Distributed ANTI-join (TPC-H Q22 shape): customers with no order
    before the cutoff.  Both sides large → partitioned hash anti-join
    (stages/joins.py how='anti'): the orders side ships ONLY its key
    column, deduplicated per batch map-side (unique custkeys per block)
    so the exchange moves ≤|distinct keys per block| rows, and each
    bucket resolves existence with one vectorized isin."""
    from datetime import datetime

    from docling_api_ray.stages.joins import hash_join

    cutoff = pa.scalar(
        datetime.fromisoformat(_NOORD_CUTOFF), type=pa.timestamp("us")
    )
    cust = _rename_inline(
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]),
        {"c_custkey": "custkey"},
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def keys_only(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b["o_orderdate"], cutoff))
        return pa.table({"custkey": pc.unique(pc.cast(b["o_custkey"], pa.int64()))})

    o = orders.map_batches(keys_only, batch_format="pyarrow")
    out = hash_join(
        cust, o, on="custkey", how="anti",
        schemas=(
            pa.schema([("custkey", pa.int64()), ("c_name", pa.string()),
                       ("c_acctbal", pa.float64())]),
            pa.schema([("custkey", pa.int64())]),
        ),
    )
    out_schema = pa.schema(
        [("custkey", pa.int64()), ("c_name", pa.string()), ("c_acctbal", pa.float64())]
    )
    return _with_schema(out, out_schema)


_Q5_YEAR_LO = "1995-01-01"
_Q5_YEAR_HI = "1996-01-01"


def _q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape — 5-way join pruned to two real exchanges: revenue
    by nation where customer AND supplier sit in the same ASIA nation.

    region⋈nation collapse to a broadcast nationkey set + name lookup
    (tiny dims, read once on the driver, ``ray.put`` once); the two
    big-side joins (orders⋈customer on custkey, lineitem⋈that on
    orderkey) are partitioned hash joins shipping only pre-projected
    narrow columns; supplier's suppkey→nationkey map is broadcast (the
    bounded dimension by TPC-H construction — escape hatch at open scale
    = a third partitioned join); the final revenue fold is a bounded
    groupby over |nations| rows with order-independent quantization."""
    from datetime import datetime

    from docling_api_ray.stages.joins import broadcast_join, hash_join

    lo = pa.scalar(datetime.fromisoformat(_Q5_YEAR_LO), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.fromisoformat(_Q5_YEAR_HI), type=pa.timestamp("us"))

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    asia_keys = set(
        np.asarray(region["r_regionkey"])[
            np.asarray(region["r_name"].to_pylist(), dtype=object) == "ASIA"
        ].tolist()
    )
    nkeys = np.asarray(nation["n_nationkey"], dtype=np.int64)
    nregion = np.asarray(nation["n_regionkey"], dtype=np.int64)
    asia_nations = nkeys[np.isin(nregion, list(asia_keys))]
    name_of = np.empty(int(nkeys.max()) + 1, dtype=object)
    name_of[nkeys] = np.asarray(nation["n_name"].to_pylist(), dtype=object)
    asia_ref = ray.put(np.sort(asia_nations))
    names_ref = ray.put(name_of)

    supplier = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    skeys = np.asarray(supplier["s_suppkey"], dtype=np.int64)
    snat = np.full(int(skeys.max()) + 1, -1, dtype=np.int64)
    snat[skeys] = np.asarray(supplier["s_nationkey"], dtype=np.int64)
    snat_ref = ray.put(snat)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def sel_cust(b: pa.Table) -> pa.Table:
        nat = np.asarray(b["c_nationkey"], dtype=np.int64)
        keep = np.isin(nat, ray.get(asia_ref))
        return pa.table(
            {
                "custkey": pc.cast(b["c_custkey"], pa.int64()),
                "c_nat": pa.array(nat, type=pa.int64()),
            }
        ).filter(pa.array(keep))

    c = cust.map_batches(sel_cust, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def sel_orders(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi))
        )
        return pa.table(
            {
                "orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "custkey": pc.cast(b["o_custkey"], pa.int64()),
            }
        )

    o = orders.map_batches(sel_orders, batch_format="pyarrow")
    # one-nation customer cut is tiny -> broadcast (size-guarded)
    oc = broadcast_join(
        o, c, on="custkey",
        schemas=(
            pa.schema([("orderkey", pa.int64()), ("custkey", pa.int64())]),
            pa.schema([("custkey", pa.int64()), ("c_nat", pa.int64())]),
        ),
    ).select_columns(["orderkey", "c_nat"])

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def sel_li(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        return pa.table(
            {
                "orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "suppkey": pc.cast(b["l_suppkey"], pa.int64()),
                "rev": rev,
            }
        )

    l = li.map_batches(sel_li, batch_format="pyarrow")
    j = hash_join(
        l, oc, on="orderkey",
        schemas=(
            pa.schema([("orderkey", pa.int64()), ("suppkey", pa.int64()),
                       ("rev", pa.float64())]),
            pa.schema([("orderkey", pa.int64()), ("c_nat", pa.int64())]),
        ),
    )

    def local_only(b: pa.Table) -> pa.Table:
        sn = ray.get(snat_ref)[np.asarray(b["suppkey"], dtype=np.int64)]
        keep = sn == np.asarray(b["c_nat"], dtype=np.int64)
        b = b.filter(pa.array(keep))
        names = ray.get(names_ref)[np.asarray(b["c_nat"], dtype=np.int64)]
        return pa.table(
            {"n_name": pa.array(names, type=pa.string()), "rev": b["rev"]}
        )

    folded = bounded_groupby_sum(
        j.map_batches(local_only, batch_format="pyarrow"),
        ["n_name"],
        sum_cols={"revenue": "rev"},
    )

    def q2(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": b["n_name"],
                "revenue": pc.divide(pc.round(pc.multiply(b["revenue"], 100.0)), 100.0),
            }
        )

    return folded.map_batches(q2, batch_format="pyarrow")


_Q18_QTY_TH_C = 25000  # sum(l_quantity) > 250, in integer hundredths
_Q4_ORD_LO = "1995-01-01"
_Q4_ORD_HI = "1995-04-01"
_Q4_SHIP_AFTER = "1995-06-01"


def _q_large_volume_orders(sf_dir: str):
    """TPC-H Q18 shape — large-volume orders: per-order quantity sum
    over a threshold, joined back to orders, top-100, then the customer
    name lookup.

    Scale shape: per-batch PARTIAL groupby-sum on orderkey (generated
    lineitems cluster by order, so partials shrink the exchange), ONE
    mod-P co-group exchange carrying only (orderkey, qty_c) int64
    pairs, in-partition fold + threshold filter (output ∝ qualifying
    orders — rare by construction: >250 units is the ~99th pct),
    partitioned hash join with orders, two-level bounded top-100 head
    BEFORE the dimension join so only ≤100 custkeys reach the customer
    scan (value-captured key array, one vectorized isin — never a
    customer-table shuffle).  Quantities sum as round(q·100) int64 —
    order-free, oracle-exact; final total_qty is one exact division."""
    import pandas as pd

    from docling_api_ray.stages.common import shuffle_partitions
    from docling_api_ray.stages.joins import broadcast_join

    P = shuffle_partitions()
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        ok = np.asarray(b["l_orderkey"], dtype=np.int64)
        qc = np.rint(np.asarray(b["l_quantity"]) * 100).astype(np.int64)
        keys, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(keys), dtype=np.int64)
        np.add.at(sums, inv, qc)
        return pa.table(
            {
                "orderkey": pa.array(keys, type=pa.int64()),
                "qty_c": pa.array(sums, type=pa.int64()),
                "__b": pa.array(keys % P, type=pa.int64()),
            }
        )

    qual_schema = pa.schema([("orderkey", pa.int64()), ("qty_c", pa.int64())])

    def fold(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("orderkey", sort=False)["qty_c"].sum().reset_index()
        g = g[g["qty_c"] > _Q18_QTY_TH_C]
        return pa.Table.from_pandas(
            g, schema=qual_schema, preserve_index=False
        )

    qual = (
        li.map_batches(partial, batch_format="pyarrow")
        .map_batches(  # coalesce_narrow inline — bundle tiny partial blocks
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__b")
        .map_groups(fold, batch_format="pandas")
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def o_prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "custkey": pc.cast(b["o_custkey"], pa.int64()),
                "o_totalprice": b["o_totalprice"],
            }
        )

    # qualifying orderkeys (HAVING sum(qty) > th) are a tiny set -> broadcast
    j = broadcast_join(
        orders.map_batches(o_prep, batch_format="pyarrow"), qual, on="orderkey",
        schemas=(
            pa.schema([("orderkey", pa.int64()), ("custkey", pa.int64()),
                       ("o_totalprice", pa.float64())]),
            qual_schema,
        ),
    )

    K = 100
    top_schema = pa.schema(
        [
            ("orderkey", pa.int64()),
            ("custkey", pa.int64()),
            ("o_totalprice", pa.float64()),
            ("qty_c", pa.int64()),
        ]
    )

    def head(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["qty_c", "orderkey"], ascending=[False, True], kind="stable"
        ).head(K)
        return pa.Table.from_pandas(
            df[top_schema.names], schema=top_schema, preserve_index=False
        )

    top = (
        j.map_batches(head, batch_format="pyarrow")
        .repartition(1)
        .map_batches(head, batch_format="pyarrow", batch_size=None)
    )
    tdf = pd.DataFrame(top.take_all())  # ≤100 rows — LIMIT-bounded
    out_cols = ["orderkey", "custkey", "c_name", "total_qty", "o_totalprice"]
    out_schema = pa.schema(
        [
            ("orderkey", pa.int64()),
            ("custkey", pa.int64()),
            ("c_name", pa.string()),
            ("total_qty", pa.float64()),
            ("o_totalprice", pa.float64()),
        ]
    )
    if tdf.empty:
        return out_schema.empty_table()
    ckeys = np.sort(tdf["custkey"].unique().astype(np.int64))

    def sel_cust(b: pa.Table) -> pa.Table:
        keep = np.isin(np.asarray(b["c_custkey"], dtype=np.int64), ckeys)
        return b.filter(pa.array(keep))

    cdf = (
        _coal(_read(sf_dir, "customer", ["c_custkey", "c_name"]))
        .map_batches(sel_cust, batch_format="pyarrow")
        .map_batches(
            lambda b: b.rename_columns(
                ["custkey" if c == "c_custkey" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()  # ≤100 rows by the key-set bound
    )
    out = tdf.merge(cdf, on="custkey")
    out["total_qty"] = out["qty_c"] / 100.0
    return pa.Table.from_pandas(
        out[out_cols], schema=out_schema, preserve_index=False
    )


_Q17_BRAND = "Brand#23"


def _q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — small-quantity-order revenue: a per-group
    (part) mean joined BACK onto the fact rows it was computed from, a
    row-vs-its-group-aggregate predicate, then one global sum.

    Scale shape: the brand predicate prunes parts to ~|parts|/|brands|
    AT THE READ (parquet row-group filter), and only that bounded
    keyset is value-captured for one vectorized per-batch ``np.isin``
    prune BEFORE any exchange (escape hatch for an unbounded part
    side: co-grouped semi-join on the same mod-P key, stages/joins.py
    ``how="semi"``).  Quantities are DISCRETE, so per-batch partials
    collapse surviving fact rows to (partkey, qty_c) → (cnt, price_c)
    distribution rows — the one co-group exchange carries the
    compressed per-part quantity histogram, never raw fact rows.  The
    per-bucket fold resolves the mean and the Q17 predicate in INTEGER
    arithmetic (q < Σq/(5n) ⇔ 5·q_c·n < Σq_c — no float average, so
    summation order cannot flip a boundary row), emitting ONE partial
    revenue int64 per bucket; the ≤P-row final fold divides once.
    Reference parity: the TPC-H Q17 aggregate-join-back idiom
    re-expressed as map-side histogram partials + a single co-group."""
    import pandas as pd

    from docling_api_ray.stages.common import shuffle_partitions

    P = shuffle_partitions()
    pk_tbl = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey"],
        filters=[("p_brand", "==", _Q17_BRAND)],
    )
    pkeys = np.sort(np.asarray(pk_tbl["p_partkey"], dtype=np.int64))

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    )
    part_schema = pa.schema(
        [
            ("partkey", pa.int64()),
            ("qty_c", pa.int64()),
            ("cnt", pa.int64()),
            ("price_c", pa.int64()),
            ("__b", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        k = np.asarray(b["l_partkey"], dtype=np.int64)
        keep = np.isin(k, pkeys)
        k = k[keep]
        qc = np.rint(np.asarray(b["l_quantity"])[keep] * 100).astype(np.int64)
        ec = np.rint(
            np.asarray(b["l_extendedprice"])[keep] * 100
        ).astype(np.int64)
        df = pd.DataFrame({"partkey": k, "qty_c": qc, "price_c": ec})
        g = (
            df.groupby(["partkey", "qty_c"], sort=False)["price_c"]
            .agg(["size", "sum"])
            .reset_index()
            .rename(columns={"size": "cnt", "sum": "price_c"})
        )
        g["__b"] = g["partkey"] % P
        return pa.Table.from_pandas(
            g[part_schema.names], schema=part_schema, preserve_index=False
        ).replace_schema_metadata(None)

    def fold(df: pd.DataFrame) -> pa.Table:
        g = (
            df.groupby(["partkey", "qty_c"], sort=False)[["cnt", "price_c"]]
            .sum()
            .reset_index()
        )
        g["qsum"] = g["qty_c"] * g["cnt"]
        per = g.groupby("partkey", sort=False).agg(
            sq=("qsum", "sum"), n=("cnt", "sum")
        )
        m = g.join(per, on="partkey")
        keep = 5 * m["qty_c"] * m["n"] < m["sq"]
        rev = int(m.loc[keep, "price_c"].sum())
        return pa.table({"rev_c": pa.array([rev], type=pa.int64())})

    partials = (
        li.map_batches(partial, batch_format="pyarrow")
        .map_batches(  # coalesce_narrow inline — bundle tiny partial blocks
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__b")
        .map_groups(fold, batch_format="pandas")
    )

    def final(b: pa.Table) -> pa.Table:
        tot = pc.sum(b["rev_c"]).as_py() or 0
        return pa.table(
            {
                "brand": pa.array([_Q17_BRAND], type=pa.string()),
                "avg_yearly": pa.array([tot / 700.0], type=pa.float64()),
            }
        )

    return partials.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


_Q15_START_US = 820_454_400_000_000  # 1996-01-01 epoch µs
_Q15_END_US = 828_316_800_000_000  # 1996-04-01 epoch µs


def _q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape — top supplier(s) by windowed revenue: grouped
    revenue → global ARGMAX WITH TIES → dimension lookup.

    Scale shape: per-batch (suppkey → rev_c) partials after the
    shipdate window filter (revenue exact as price_c·(100−disc_k)
    int64 — order-free, so no float summation tie ambiguity at the
    argmax boundary), ONE mod-P co-group exchange of narrow int64
    pairs, an in-partition fold to the ≤|suppliers|-row (suppkey,
    rev_c) table.  That table is materialized ONCE (narrow,
    supplier-proportional — the documented bound) because it is
    consumed twice: ``Dataset.max`` streams out the scalar winner
    revenue, an integer-equality filter keeps the winners (ties
    preserved, TPC-H Q15 spec), and only the tiny winner keyset
    reaches the supplier dimension scan (value-captured ``np.isin``
    — never a supplier-table shuffle)."""
    import pandas as pd

    from docling_api_ray.stages.common import shuffle_partitions

    P = shuffle_partitions()
    li = _read(
        sf_dir,
        "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    pair_schema = pa.schema([("suppkey", pa.int64()), ("rev_c", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(b["l_shipdate"], pa.int64()))
        keep = (us >= _Q15_START_US) & (us < _Q15_END_US)
        sk = np.asarray(b["l_suppkey"], dtype=np.int64)[keep]
        ec = np.rint(
            np.asarray(b["l_extendedprice"])[keep] * 100
        ).astype(np.int64)
        dk = np.rint(np.asarray(b["l_discount"])[keep] * 100).astype(np.int64)
        rev = ec * (100 - dk)
        keys, inv = np.unique(sk, return_inverse=True)
        sums = np.zeros(len(keys), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table(
            {
                "suppkey": pa.array(keys, type=pa.int64()),
                "rev_c": pa.array(sums, type=pa.int64()),
                "__b": pa.array(keys % P, type=pa.int64()),
            }
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("suppkey", sort=False)["rev_c"].sum().reset_index()
        return pa.Table.from_pandas(
            g[pair_schema.names], schema=pair_schema, preserve_index=False
        ).replace_schema_metadata(None)

    folded = _with_schema(
        li.map_batches(partial, batch_format="pyarrow")
        .map_batches(  # coalesce_narrow inline — bundle tiny partial blocks
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__b")
        .map_groups(fold, batch_format="pandas"),
        pair_schema,
    ).materialize()  # ≤|suppliers| narrow rows — consumed twice below
    out_schema = pa.schema(
        [
            ("suppkey", pa.int64()),
            ("s_name", pa.string()),
            ("total_revenue", pa.float64()),
        ]
    )
    mx = folded.max("rev_c")
    if mx is None:
        return out_schema.empty_table()

    def winners(b: pa.Table) -> pa.Table:
        keep = np.asarray(b["rev_c"], dtype=np.int64) == np.int64(mx)
        return b.filter(pa.array(keep))

    w = pd.DataFrame(
        _coal(folded).map_batches(winners, batch_format="pyarrow").take_all()
    )  # ties only — tiny by the argmax bound
    skeys = np.sort(w["suppkey"].unique().astype(np.int64))

    def sel_sup(b: pa.Table) -> pa.Table:
        keep = np.isin(np.asarray(b["s_suppkey"], dtype=np.int64), skeys)
        b = b.filter(pa.array(keep))
        # rename inside the map (a separate rename_columns op logs a
        # spurious cross-bundle schema warning at tiny scale)
        return pa.table(
            {
                "suppkey": pc.cast(b["s_suppkey"], pa.int64()),
                "s_name": b["s_name"],
            }
        )

    sup = (
        _coal(_read(sf_dir, "supplier", ["s_suppkey", "s_name"]))
        .map_batches(sel_sup, batch_format="pyarrow")
        .to_pandas()  # ≤|winners| rows by the key-set bound
    )
    out = w.merge(sup, on="suppkey")
    out["total_revenue"] = out["rev_c"] / 10000.0
    return pa.Table.from_pandas(
        out[out_schema.names], schema=out_schema, preserve_index=False
    ).replace_schema_metadata(None)


def _q_knn_recall(sf_dir: str):
    """ANN index EVALUATION — recall@k of the IVF index against exact
    brute force: both top-k result sets are computed by their own
    distributed pipelines (all corpus-proportional work happens inside
    them), then the set intersection folds driver-side.

    Scale shape: each side is ≤ queries·k rows BY CONSTRUCTION — the
    top-k pipelines already bounded their outputs, and the query set is
    driver-supplied, so the evaluation join is index-output-
    proportional at ANY corpus size.  (A union-the-two-Datasets +
    per-query co-group variant was measured to nondeterministically
    stall Ray 2.49's streaming executor — two actor-pool branches under
    one UnionOperator froze with zero running tasks — so the bounded
    driver fold is also the RELIABLE shape.)"""
    bf_rows = (
        _q_knn(sf_dir).select_columns(["query_id", "vec_id"]).take_all()
    )
    iv_rows = (
        _q_knn_ivf(sf_dir).select_columns(["query_id", "vec_id"]).take_all()
    )
    exact: dict[int, set] = {}
    for r in bf_rows:
        exact.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    approx: dict[int, set] = {}
    for r in iv_rows:
        approx.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    qids = sorted(exact)  # oracle groups over the brute-force side
    hits = [len(exact[q] & approx.get(q, set())) for q in qids]
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "hits": pa.array(hits, type=pa.int64()),
            "recall": pa.array(
                [h / _KNN_K for h in hits], type=pa.float64()
            ),
        }
    )


_Q7_NATIONS = ("NATION_1", "NATION_2")


def _q_nation_trade_volume(sf_dir: str):
    """TPC-H Q7 shape — cross-nation trade volume by year: the deepest
    join composition in the battery, lineitem ⋈ supplier-nation ⋈
    (orders ⋈ customer-nation) ⋈ nation², then a bounded
    (nation-pair × year) aggregate.

    Scale shape: nation is ≤25 rows — read once driver-side and
    value-captured as a nationkey→name dict (never shuffled).
    Supplier/customer project to (key, nationkey) AND filter to the two
    nations BEFORE their joins, so each dimension side of a hash join
    carries only ~2/|nations| of its rows.  lineitem pre-reduces
    per-batch to (orderkey, suppkey, year, rev_c) with exact int64
    revenue ec·(100−dk); the one unavoidable big-big exchange
    (lineitem⋈orders) is the bucketed co-group ``hash_join`` on
    orderkey.  The OR-of-two-nation-pairs predicate is exactly
    ``s_nk ≠ c_nk`` once both sides are pre-filtered to the pair; the
    final aggregate domain is 2 pairs × years — ``bounded_groupby_sum``
    tree fold, one division at the end.

    The two DIMENSION attaches (orders⋈customer, lineitem⋈supplier) go
    through ``broadcast_join`` — the pre-filtered dimension is tiny, so
    it ships once via ``ray.put`` and the fact side shuffles NOTHING;
    above the size guard it degrades to the bucketed ``hash_join``
    automatically (at 100 TB a 2-nation customer cut is ~8% of 15B rows
    — past the guard — and the co-group path takes over).  Only the
    big-big lineitem⋈orders exchange remains an all-to-all."""
    from docling_api_ray.stages.joins import broadcast_join, hash_join

    ntbl = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    name_of = {
        int(k): n
        for k, n in zip(
            ntbl["n_nationkey"].to_pylist(), ntbl["n_name"].to_pylist()
        )
        if n in _Q7_NATIONS
    }
    nks = np.sort(np.fromiter(name_of, dtype=np.int64, count=len(name_of)))

    def dim_prep(key_col: str, nk_col: str, out_key: str, out_nk: str):
        def f(b: pa.Table) -> pa.Table:
            nk = np.asarray(b[nk_col], dtype=np.int64)
            keep = np.isin(nk, nks)
            return pa.table(
                {
                    out_key: pa.array(
                        np.asarray(b[key_col], dtype=np.int64)[keep],
                        type=pa.int64(),
                    ),
                    out_nk: pa.array(nk[keep], type=pa.int64()),
                }
            )

        return f

    supp = _coal(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    ).map_batches(
        dim_prep("s_suppkey", "s_nationkey", "suppkey", "s_nk"),
        batch_format="pyarrow",
    )
    cust = _coal(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    ).map_batches(
        dim_prep("c_custkey", "c_nationkey", "custkey", "c_nk"),
        batch_format="pyarrow",
    )

    def li_prep(b: pa.Table) -> pa.Table:
        ec = np.rint(np.asarray(b["l_extendedprice"]) * 100).astype(np.int64)
        dk = np.rint(np.asarray(b["l_discount"]) * 100).astype(np.int64)
        return pa.table(
            {
                "orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "suppkey": pc.cast(b["l_suppkey"], pa.int64()),
                "l_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
                "rev_c": pa.array(ec * (100 - dk), type=pa.int64()),
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_prep, batch_format="pyarrow")

    def o_prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "custkey": pc.cast(b["o_custkey"], pa.int64()),
            }
        )

    oc = broadcast_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
            o_prep, batch_format="pyarrow"
        ),
        cust,
        on="custkey",
        schemas=(
            pa.schema([("orderkey", pa.int64()), ("custkey", pa.int64())]),
            pa.schema([("custkey", pa.int64()), ("c_nk", pa.int64())]),
        ),
    ).select_columns(["orderkey", "c_nk"])

    li_schema = pa.schema(
        [("orderkey", pa.int64()), ("suppkey", pa.int64()),
         ("l_year", pa.int64()), ("rev_c", pa.int64())]
    )
    supp_schema = pa.schema([("suppkey", pa.int64()), ("s_nk", pa.int64())])
    # hash_join output columns are [on] + left-others + right-others
    ls_schema = pa.schema(
        [("suppkey", pa.int64()), ("orderkey", pa.int64()),
         ("l_year", pa.int64()), ("rev_c", pa.int64()), ("s_nk", pa.int64())]
    )
    joined = hash_join(
        broadcast_join(
            li, supp, on="suppkey", schemas=(li_schema, supp_schema)
        ),
        oc,
        on="orderkey",
        schemas=(
            ls_schema,
            pa.schema([("orderkey", pa.int64()), ("c_nk", pa.int64())]),
        ),
    )

    def pair_names(b: pa.Table) -> pa.Table:
        s_nk = np.asarray(b["s_nk"], dtype=np.int64)
        c_nk = np.asarray(b["c_nk"], dtype=np.int64)
        keep = s_nk != c_nk
        lut = {k: v for k, v in name_of.items()}
        return pa.table(
            {
                "supp_nation": pa.array(
                    [lut[int(k)] for k in s_nk[keep]], type=pa.string()
                ),
                "cust_nation": pa.array(
                    [lut[int(k)] for k in c_nk[keep]], type=pa.string()
                ),
                "l_year": pa.array(
                    np.asarray(b["l_year"], dtype=np.int64)[keep],
                    type=pa.int64(),
                ),
                "rev_c": pa.array(
                    np.asarray(b["rev_c"], dtype=np.int64)[keep],
                    type=pa.int64(),
                ),
            }
        )

    agg = bounded_groupby_sum(
        joined.map_batches(pair_names, batch_format="pyarrow"),
        ["supp_nation", "cust_nation", "l_year"],
        sum_cols={"rev_c": "rev_c"},
    )

    q7_schema = pa.schema(
        [
            ("supp_nation", pa.string()),
            ("cust_nation", pa.string()),
            ("l_year", pa.int64()),
            ("revenue", pa.float64()),
        ]
    )
    # the aggregate is ≤ 2 nation-pairs × |years| rows — domain-bounded,
    # so the final division folds driver-side into a TYPED table (an
    # all-filtered corpus otherwise surfaces a schema-less empty block
    # that map_batches can never recast: Ray emits empty blocks without
    # invoking the fn on them)
    rows = agg.take_all()
    return pa.table(
        {
            "supp_nation": pa.array(
                [r["supp_nation"] for r in rows], type=pa.string()
            ),
            "cust_nation": pa.array(
                [r["cust_nation"] for r in rows], type=pa.string()
            ),
            "l_year": pa.array([r["l_year"] for r in rows], type=pa.int64()),
            "revenue": pa.array(
                [r["rev_c"] / 10000.0 for r in rows], type=pa.float64()
            ),
        },
        schema=q7_schema,
    )


_CHUNK_SIZE = 64  # tokens per chunk
_CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def _q_chunk_overlap(sf_dir: str):
    """RAG / context-window CHUNKING — sliding token windows with
    overlap: every document explodes into ⌈n_tokens/stride⌉ chunks of
    ≤CHUNK_SIZE whitespace tokens, consecutive chunks sharing
    (size−stride) tokens, the standard retrieval-corpus preprocessing
    step.

    Scale shape: a stateless per-batch flat expansion — NO shuffle, no
    state, no driver traffic; output volume is input-proportional
    (×size/stride text amplification), so the stage streams and the
    sink absorbs the fan-out block by block.  The per-document loop IS
    the work (token splitting + window slicing on variable-length
    strings, same class as the document parsers), not an avoidable
    anti-pattern; the regex is compiled once per worker via the module
    cache."""
    import re as _re

    tok = _re.compile(ta.WS_TOKEN_RE)
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_idx", pa.int64()),
            ("n_tokens", pa.int64()),
            ("chunk", pa.string()),
        ]
    )

    def expand(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b["text"].to_pylist()
        o_id, o_idx, o_n, o_text = [], [], [], []
        for did, t in zip(ids, texts):
            ws = tok.findall(t or "")
            for ci, start in enumerate(range(0, len(ws), _CHUNK_STRIDE)):
                seg = ws[start : start + _CHUNK_SIZE]
                o_id.append(did)
                o_idx.append(ci)
                o_n.append(len(seg))
                o_text.append(" ".join(seg))
        return pa.table(
            {
                "doc_id": pa.array(o_id, type=pa.int64()),
                "chunk_idx": pa.array(o_idx, type=pa.int64()),
                "n_tokens": pa.array(o_n, type=pa.int64()),
                "chunk": pa.array(o_text, type=pa.string()),
            },
            schema=out_schema,
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        expand, batch_format="pyarrow"
    )


def _q_order_priority_counts(sf_dir: str):
    """TPC-H Q4 shape — EXISTS semi-join: orders placed in 1995-Q1 with
    at least one lineitem shipping after the cutoff, counted by
    priority.  The lineitem side ships ONLY per-batch-deduplicated
    orderkeys (map-side unique), existence resolves inside the
    partitioned hash semi-join's buckets with one vectorized isin (no
    row multiplication), and the count folds over the bounded 5-value
    priority domain."""
    from datetime import datetime

    from docling_api_ray.stages.joins import hash_join

    lo = pa.scalar(datetime.fromisoformat(_Q4_ORD_LO), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.fromisoformat(_Q4_ORD_HI), type=pa.timestamp("us"))
    after = pa.scalar(
        datetime.fromisoformat(_Q4_SHIP_AFTER), type=pa.timestamp("us")
    )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def sel_o(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], lo),
                pc.less(b["o_orderdate"], hi),
            )
        )
        return pa.table(
            {
                "orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_orderpriority": b["o_orderpriority"],
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def keys_only(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["l_shipdate"], after))
        return pa.table(
            {"orderkey": pc.unique(pc.cast(b["l_orderkey"], pa.int64()))}
        )

    sj = hash_join(
        orders.map_batches(sel_o, batch_format="pyarrow"),
        li.map_batches(keys_only, batch_format="pyarrow"),
        on="orderkey",
        how="semi",
        schemas=(
            pa.schema([("orderkey", pa.int64()),
                       ("o_orderpriority", pa.string())]),
            pa.schema([("orderkey", pa.int64())]),
        ),
    )
    out = bounded_groupby_sum(
        sj.select_columns(["o_orderpriority"]),
        ["o_orderpriority"],
        count_alias="n",
    )
    return _with_schema(
        out, pa.schema([("o_orderpriority", pa.string()), ("n", pa.int64())])
    )


def _q_token_entropy(sf_dir: str):
    """Per-document word-distribution Shannon entropy
    (stages/text_analysis.py token_entropy): integer-exact micro-ln
    terms summed order-free, one stateless streaming pass."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.token_entropy, batch_format="pyarrow"
    )


def _q_source_similarity(sf_dir: str):
    """Pairwise source-level Jaccard estimate from mergeable per-source
    MinHash sketches (stages/dedup.py source_minhash_similarity): one
    streaming signature pass, ≤|sources| bounded rows folded min-wise,
    |sources|² driver-side pairing."""
    return dd.source_minhash_similarity(
        _docs(sf_dir, ["source", "text"])
    )


def _q_length_token_corr(sf_dir: str):
    """Per-source Pearson correlation between n_chars and whitespace
    token count — the moment-sketch analytics shape: per-row integer
    products fold through ``bounded_groupby_sum`` (five int64 moment
    sums + a count per source, all order-free and overflow-bounded —
    Σxy ≤ docs·(chars·tokens) needs ~2·10¹⁸ at 10¹²-doc scale, the
    int64 edge; the 128-bit escape is splitting each sum into
    hi/lo 32-bit halves), then one vectorized finalization whose float
    expression tree the SQL oracle replays operation-for-operation (the
    int sums are exact, every double op is IEEE-identical)."""
    from docling_api_ray.stages.text_analysis import WS_TOKEN_RE, _count

    ds = _docs(sf_dir, ["text", "source", "n_chars"])

    def moments(b: pa.Table) -> pa.Table:
        x = np.asarray(b["n_chars"], dtype=np.int64)
        y = np.asarray(
            _count(b["text"], WS_TOKEN_RE), dtype=np.int64
        )
        return pa.table(
            {
                "source": b["source"],
                "x": pa.array(x, type=pa.int64()),
                "y": pa.array(y, type=pa.int64()),
                "xy": pa.array(x * y, type=pa.int64()),
                "xx": pa.array(x * x, type=pa.int64()),
                "yy": pa.array(y * y, type=pa.int64()),
            }
        )

    folded = bounded_groupby_sum(
        ds.map_batches(moments, batch_format="pyarrow"),
        ["source"],
        sum_cols={"sx": "x", "sy": "y", "sxy": "xy", "sxx": "xx", "syy": "yy"},
        count_alias="n",
    )

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"], dtype=np.float64)
        sx = np.asarray(b["sx"], dtype=np.float64)
        sy = np.asarray(b["sy"], dtype=np.float64)
        sxy = np.asarray(b["sxy"], dtype=np.float64)
        sxx = np.asarray(b["sxx"], dtype=np.float64)
        syy = np.asarray(b["syy"], dtype=np.float64)
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        prod = vx * vy
        corr = np.where(prod > 0, num / np.sqrt(np.where(prod > 0, prod, 1.0)), 0.0)
        return pa.table(
            {
                "source": b["source"],
                "n": pc.cast(b["n"], pa.int64()),
                "corr": pa.array(corr, type=pa.float64()),
            }
        )

    return _with_schema(
        folded.map_batches(finish, batch_format="pyarrow"),
        pa.schema(
            [("source", pa.string()), ("n", pa.int64()), ("corr", pa.float64())]
        ),
    )


def _source_sim_oracle_sql(num_perm: int = 64) -> str:
    """Exact SQL mirror of stages/dedup.py source_minhash_similarity:
    the minhash shingle/permutation arithmetic grouped per SOURCE
    instead of per doc, then pairwise agreement over the |sources|²
    signature table."""
    from docling_api_ray.stages.dedup import MinHasher

    mh = MinHasher(num_perm=num_perm)
    perm_rows = ", ".join(
        f"({p}, CAST({int(a)} AS HUGEINT), CAST({int(b)} AS HUGEINT))"
        for p, (a, b) in enumerate(zip(mh.a, mh.b), 1)
    )
    return f"""
        WITH {_sql_shingle_ctes()},
        expl AS (SELECT doc_id, unnest(sh) AS h FROM sh),
        exps AS (SELECT d.source, e.h
                 FROM expl e JOIN documents d USING (doc_id)),
        perms AS (SELECT * FROM (VALUES {perm_rows}) AS t(p, a, b)),
        sigc AS (SELECT s.source, p.p,
                        min((((p.a * s.h) % {_W}) + p.b) % {_W}) AS c
                 FROM exps s CROSS JOIN perms p GROUP BY 1, 2),
        sig AS (SELECT source, list(c ORDER BY p) AS sig FROM sigc GROUP BY 1)
        SELECT l.source AS left_source, r.source AS right_source,
               list_sum(list_transform(generate_series(1, {num_perm}),
                 i -> CASE WHEN l.sig[i] = r.sig[i] THEN 1 ELSE 0 END))
                 / {num_perm}.0 AS est_jaccard
        FROM sig l JOIN sig r ON l.source < r.source
    """


# fixed probe vocabulary for the count-min sketch query: language-marker
# words + common synthetic-corpus tokens (deterministic literal list
# shared with the SQL oracle)
_CMS_PROBES = [
    "the", "and", "of", "el", "la", "que", "der", "die", "und",
    "le", "les", "des", "scan", "join", "batch", "window", "hash",
    "merge", "sort", "stream", "zz-not-a-word",
]


_LSH_NBITS = 12
_LSH_SEED = 7


def _fixed_hyperplanes() -> np.ndarray:
    """Deterministic random hyperplanes for the LSH ANN conformance
    query (data-independent algorithm constants, embedded as SQL
    literals like the IVF quantizer — see _fixed_centroids)."""
    rng = np.random.RandomState(_LSH_SEED)
    return rng.randn(_LSH_NBITS, _IVF_DIM)


def _q_knn_lsh(sf_dir: str):
    """Hyperplane-LSH bucketed ANN (stages/similarity.py lsh_knn):
    signature assign pass + Hamming-1 multi-probe + bucket-pruned
    top-k.  The untrained counterpart of knn_ivf."""
    qids, qmat = _query_vectors(sf_dir)
    return sim.lsh_knn(
        _emb(sf_dir, ["vec_id", "embedding"]),
        qids,
        qmat,
        _fixed_hyperplanes(),
        k=_KNN_K,
    ).select_columns(["query_id", "vec_id", "cosine", "rank"])


def _knn_lsh_oracle_sql() -> str:
    """SQL mirror of lsh_knn: hyperplane literals, quantize-before-sign
    bucket assignment, Hamming-1 probe expansion via xor, bucket-pruned
    cosine ranking."""
    hps = _fixed_hyperplanes()
    rows = ", ".join(
        "({}, [{}])".format(i, ", ".join(repr(float(x)) for x in hps[i]))
        for i in range(len(hps))
    )
    return f"""
        WITH hps AS (SELECT bid, CAST(hv AS DOUBLE[]) AS hv
                     FROM (VALUES {rows}) AS t(bid, hv)),
        q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < {_N_QUERIES}),
        c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id >= {_N_QUERIES}),
        csig AS (SELECT c.vec_id,
                   CAST(sum(CASE WHEN round(list_dot_product(c.v, h.hv)
                                       * 1000000) / 1000000.0 >= 0
                                 THEN 1 << h.bid ELSE 0 END) AS BIGINT)
                     AS bucket
                 FROM c CROSS JOIN hps h GROUP BY c.vec_id),
        qsig AS (SELECT q.query_id,
                   CAST(sum(CASE WHEN round(list_dot_product(q.qv, h.hv)
                                       * 1000000) / 1000000.0 >= 0
                                 THEN 1 << h.bid ELSE 0 END) AS BIGINT)
                     AS bucket
                 FROM q CROSS JOIN hps h GROUP BY q.query_id),
        probe AS (SELECT query_id, bucket FROM qsig
                  UNION
                  SELECT query_id,
                         xor(bucket, CAST(1 << bid AS BIGINT)) AS bucket
                  FROM qsig CROSS JOIN hps),
        s AS (SELECT q.query_id, c.vec_id,
                     round(list_cosine_similarity(c.v, q.qv) * 1000000)
                       / 1000000.0 AS cosine
              FROM probe p
              JOIN csig ON csig.bucket = p.bucket
              JOIN c ON c.vec_id = csig.vec_id
              JOIN q ON q.query_id = p.query_id)
        SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
          SELECT query_id, vec_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id) AS rank
          FROM s)
        WHERE rank <= {_KNN_K}
    """


def _q_bloom_decontaminate(sf_dir: str):
    """Bloom-filter membership gate (stages/sketch.py): M-bit filter
    built distributedly over the benchmark slice, broadcast once,
    probed in one stateless pass.  Deterministic double hashing makes
    the sketch — false positives included — oracle-exact."""
    from docling_api_ray.stages.sketch import bloom_membership

    return bloom_membership(_docs(sf_dir, ["doc_id", "text"]))


def _q_countmin_words(sf_dir: str):
    """Count-min sketch frequency estimates for a fixed probe
    vocabulary (stages/sketch.py): sketch-bounded partials (≤D·W cells
    per block), bounded tree fold, driver-side probe of the D×W grid.
    Estimates (min over D rows, collision overcounts and all) are
    mirrored bit-for-bit by the oracle."""
    from docling_api_ray.stages.sketch import countmin_estimates

    return countmin_estimates(_docs(sf_dir, ["doc_id", "text"]), _CMS_PROBES)


def _q_cms_eval(sf_dir: str):
    """Count-min accuracy eval — the frequency member of the
    self-verifying sketch-eval family (hll_eval, lsh_eval, KLL rank
    check): per probe word, the sketch estimate vs the EXACT count,
    the structural overestimate property, and the ε·N = (e/W)·N
    Markov-bound check.  Estimates and exact counts are both already
    SQL-mirrored (countmin_words / vocab machinery); the eval only
    joins them with integer arithmetic plus one float bound compare."""
    import math

    from docling_api_ray.stages.sketch import CMS_W, countmin_estimates

    est = {
        r["word"]: int(r["est_n"])
        for r in countmin_estimates(
            _docs(sf_dir, ["doc_id", "text"]), _CMS_PROBES
        ).take_all()
    }

    def probe_counts(b: pa.Table) -> pa.Table:
        t = ta.word_counts(b)
        keep = pc.is_in(
            t["word"], value_set=pa.array(sorted(set(_CMS_PROBES)))
        )
        return t.filter(keep)

    from docling_api_ray.stages.common import bounded_groupby_sum

    exact = {
        r["word"]: int(r["n"])
        for r in bounded_groupby_sum(
            _docs(sf_dir, ["doc_id", "text"]).map_batches(
                probe_counts, batch_format="pyarrow"
            ),
            ["word"],
            sum_cols={"n": "n"},
        ).take_all()
    }
    n_tot = _q_vocab_coverage(sf_dir)["n_tokens"][0].as_py()
    eps_n = math.e / CMS_W * n_tot
    words = sorted(set(_CMS_PROBES))
    ex = [exact.get(w, 0) for w in words]
    es = [est.get(w, 0) for w in words]
    return pa.table(
        {
            "word": pa.array(words, type=pa.string()),
            "exact_n": pa.array(ex, type=pa.int64()),
            "est_n": pa.array(es, type=pa.int64()),
            "err": pa.array(
                [e - x for e, x in zip(es, ex)], type=pa.int64()
            ),
            "overestimates": pa.array(
                [e >= x for e, x in zip(es, ex)], type=pa.bool_()
            ),
            "within_eps_n": pa.array(
                [(e - x) <= eps_n for e, x in zip(es, ex)],
                type=pa.bool_(),
            ),
        }
    )


def _q_bloom_fpr(sf_dir: str):
    """Bloom FPR eval (stages/sketch.py bloom_fpr_eval): realized
    false-positive rate of the decontamination filter over
    content-distinct non-members vs the (1−(1−1/m)^{kn})^k theory —
    the membership member of the sketch-eval family."""
    from docling_api_ray.stages.sketch import bloom_fpr_eval

    return bloom_fpr_eval(_docs(sf_dir, ["doc_id", "text"]))


def _q_events_moving_avg(sf_dir: str):
    """Per-user trailing moving average over a 4-row frame
    (stages/windows.py moving_window_avg): ONE user-hash exchange of the
    minimal (event_id, user, ts, v_micro) payload, in-partition
    cumsum-difference frame sums vectorized ACROSS users.  Micro-
    quantized integer frame sums make the oracle compare order-free."""
    from docling_api_ray.stages.windows import moving_window_avg

    return moving_window_avg(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    )


def _q_mixture_select(sf_dir: str):
    """Build the 200-doc training mixture the temperature weights
    describe (stages/mixture.py mixture_select): exact integer
    per-source quotas from the bounded weight fold, hash-smallest
    selection per source via partial heads + one per-source final
    head."""
    from docling_api_ray.stages.mixture import mixture_select

    return mixture_select(
        _docs(sf_dir, ["doc_id", "source", "text"]), budget=200
    )


def _q_interleave_order(sf_dir: str):
    """First 200 rows of the deterministic weighted source-interleave
    training stream (stages/mixture.py interleave_order): bucketed
    two-phase per-source hash ranks, stride-scheduling position keys,
    rank≤budget prune, two-level bounded head."""
    from docling_api_ray.stages.mixture import interleave_order

    return interleave_order(
        _docs(sf_dir, ["doc_id", "source", "text"]), budget=200
    )


def _q_ngram_backoff(sf_dir: str):
    """Hashed-bucket stupid-backoff bigram LM scores (stages/ngramlm.py
    — the Brants et al. 2007 web-scale LM recipe): one bounded-sketch
    train pass (a 1024+4096-int row per block), value-captured tables,
    stateless scoring with signed sums of individually micro-quantized
    ln terms — order-free, oracle-exact."""
    from docling_api_ray.stages.ngramlm import ngram_backoff_scores

    return ngram_backoff_scores(_docs(sf_dir, ["doc_id", "text"]))


def _q_kneser_ney(sf_dir: str):
    """Interpolated Kneser-Ney bigram LM scores (stages/ngramlm.py
    kneser_ney_scores) — the properly-discounted sibling of
    ngram_backoff: absolute discount d=¾ plus the continuation-count
    lower-order term, over the same hashed 1024-bucket alphabet.  The
    ×4 integer lift makes each token's probability one integer ratio,
    so the oracle replays r(ln num) − r(ln den) bit-for-bit."""
    from docling_api_ray.stages.ngramlm import kneser_ney_scores

    return kneser_ney_scores(_docs(sf_dir, ["doc_id", "text"]))


def _q_events_rolling_z(sf_dir: str):
    """Per-user rolling z-score over a trailing 8-row frame
    (stages/windows.py rolling_zscore): one user-hash exchange, two
    cumsum-difference frame sums (Σv, Σv²), z from exact int64 moments
    — the streaming anomaly-detection primitive."""
    from docling_api_ray.stages.windows import rolling_zscore

    return rolling_zscore(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    )


def _q_corpus_diff(sf_dir: str):
    """Incremental-ingest snapshot diff: which docs of the NEW snapshot
    (odd doc_ids — the parity split stands in for two crawl dates) carry
    content absent from the OLD snapshot (even doc_ids)?  Anti-join on
    the FULL md5 digest, routed by dedup.add_content_hash's int64 digest
    key (``__ckey`` mod P co-group — every occurrence of a digest lands
    in one partition; the membership test inside compares full hex
    digests so a truncated-key collision can never drop a genuinely-new
    doc).  Both sides ship only (digest, id), never text."""
    from docling_api_ray.stages.dedup import _cogrouped, add_content_hash

    docs = _docs(sf_dir, ["doc_id", "text"])
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("content_hash", pa.string())]
    )

    def project(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        h = add_content_hash(b)
        return pa.table(
            {
                "doc_id": h["doc_id"],
                "content_hash": h["content_hash"],
                "__ckey": h["__ckey"],
                "__new": pa.array(ids % 2 == 1, type=pa.bool_()),
            }
        )

    def anti(df) -> pa.Table:
        import pandas as pd

        old_hashes = df.loc[~df["__new"], "content_hash"]
        keep = df[df["__new"] & ~df["content_hash"].isin(old_hashes)]
        return pa.Table.from_pandas(
            keep[["doc_id", "content_hash"]],
            schema=out_schema,
            preserve_index=False,
        )

    return _cogrouped(
        docs.map_batches(project, batch_format="pyarrow"), "__ckey"
    ).map_groups(anti, batch_format="pandas")


def _q_pmi_collocations(sf_dir: str):
    """Pointwise mutual information of the top-30 corpus bigrams —
    PROPER collocation ranking (bigram_topk's raw counts favor
    frequent-word pairs; PMI normalizes by member-word frequency).

    Three bounded stages: (1) the shared distributed top-k tail over
    bigram partials; (2) ONE filtered wordcount pass — the ≤60 member
    words broadcast, per-batch counts for those words plus sentinel-key
    total-word/total-bigram rows, bounded fold; (3) driver-side PMI
    from ≤63 numbers.  Exactness: pmi_micro is a SIGNED SUM of
    individually micro-quantized ln's (each r(ln n) an exact int64 the
    SQL mirrors), so no float association anywhere."""
    top = _distributed_count_topk(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            ta.bigram_counts, batch_format="pyarrow"
        ),
        "bigram",
        30,
    ).take_all()
    members = sorted(
        {w for r in top for w in r["bigram"].split(" ")}
    )
    member_set = pa.array(members, type=pa.string())

    def counts_partial(b: pa.Table) -> pa.Table:
        col = b["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(col, ""), " ")
        words = pc.list_flatten(lists)
        words = words.filter(pc.not_equal(words, ""))
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        # total words / total same-row bigrams (corpus has no empty
        # tokens, so lens count real words; empty text splits to [''],
        # filtered above and excluded from nb by the max(len-1, 0))
        nw = int(len(words))
        nb = int(np.maximum(lens - 1, 0).sum())
        kept = words.filter(pc.is_in(words, value_set=member_set))
        g = (
            pa.table({"k": kept}).group_by(["k"]).aggregate([([], "count_all")])
            if len(kept)
            else None
        )
        keys = (g["k"].to_pylist() if g else []) + ["\x00nw", "\x00nb"]
        ns = (
            [int(x) for x in g["count_all"].to_pylist()] if g else []
        ) + [nw, nb]
        return pa.table(
            {
                "k": pa.array(keys, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
            }
        )

    folded = {
        r["k"]: int(r["n"])
        for r in bounded_groupby_sum(
            _docs(sf_dir, ["doc_id", "text"]).map_batches(
                counts_partial, batch_format="pyarrow"
            ),
            ["k"],
            sum_cols={"n": "n"},
        ).take_all()
    }
    NW, NB = folded["\x00nw"], folded["\x00nb"]

    def r6(x: int) -> int:
        return int(np.rint(np.log(float(x)) * 1e6))

    rows = []
    for r in top:
        a, b_ = r["bigram"].split(" ")
        n_ab, n_a, n_b = int(r["n"]), folded[a], folded[b_]
        pmi_micro = r6(n_ab) - r6(NB) - r6(n_a) - r6(n_b) + 2 * r6(NW)
        rows.append((r["bigram"], n_ab, n_a, n_b, pmi_micro))
    return ray.data.from_arrow(pa.table(
        {
            "bigram": pa.array([x[0] for x in rows], type=pa.string()),
            "n_ab": pa.array([x[1] for x in rows], type=pa.int64()),
            "n_a": pa.array([x[2] for x in rows], type=pa.int64()),
            "n_b": pa.array([x[3] for x in rows], type=pa.int64()),
            "pmi_micro": pa.array([x[4] for x in rows], type=pa.int64()),
            "pmi": pa.array(
                [x[4] / 1e6 for x in rows], type=pa.float64()
            ),
        }
    ))


def _q_value_quantiles_by_type(sf_dir: str):
    """Exact per-event-type quantiles of the (micro-quantized) float
    value metric — the float-metric variant of the value-HISTOGRAM
    quantile design (stages/stats.py grouped_int_quantiles): this
    corpus's values are 2-decimal, so round(v·1e6) is a lossless
    integerization and the histogram stays value-domain-bounded."""
    from docling_api_ray.stages.stats import grouped_int_quantiles

    def add_v(b: pa.Table) -> pa.Table:
        v = np.rint(
            np.asarray(b["value"], dtype=np.float64) * 1e6
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "v_micro": pa.array(v, type=pa.int64()),
            }
        )

    return grouped_int_quantiles(
        _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            add_v, batch_format="pyarrow"
        ),
        group_col="event_type",
        value_col="v_micro",
    )


def _q_user_value_quantiles(sf_dir: str):
    """Exact per-USER value quantiles (p50/p90) — the UNBOUNDED-key
    quantile regime (stages/selection.py grouped_quantile_cogroup):
    users grow with the corpus, so groups co-locate once via a key-hash
    co-group of narrow (user_id, value) rows and a vectorized partition
    kernel gathers every group's k-th elements.  Nothing driver-side;
    completes the quantile family (bounded-int histogram / global float
    selection / bounded-group shared brackets / unbounded-group
    co-group)."""
    from docling_api_ray.stages.selection import grouped_quantile_cogroup

    return grouped_quantile_cogroup(
        _read(sf_dir, "events", ["user_id", "value"]),
        key_col="user_id",
        value_col="value",
        quantiles=(0.5, 0.9),
    )


def _q_kl_by_source(sf_dir: str):
    """Per-source KL divergence from the corpus word distribution over
    the DSIR 1024-bucket hashed feature space (stages/dsir.py
    kl_by_group): bounded (source, bucket) partials through the tree
    fold, nano-quantized order-free integer term sums."""
    from docling_api_ray.stages.dsir import kl_by_group

    return kl_by_group(_docs(sf_dir, ["source", "text"]))


def _q_zscore_by_source(sf_dir: str):
    """Per-source z-score normalization of document size
    (stages/stats.py grouped_zscore): bounded integer moment fold
    broadcast into a stateless pass; z = (x·n − S)/√(n·SS − S²) is two
    IEEE ops over exact int64 operands — bit-identical to SQL."""
    from docling_api_ray.stages.stats import grouped_zscore

    return grouped_zscore(_docs(sf_dir, ["doc_id", "source", "n_chars"]))


def _q_knn_filtered(sf_dir: str):
    """Metadata-filtered exact cosine top-k (stages/similarity.py
    filtered_knn, mode=exclude — hard-negative mining): each query's
    candidates are restricted to label != query-label INSIDE the
    scoring batch; ranking discipline identical to knn_bruteforce, the
    oracle just adds the predicate."""
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
        filters=[("vec_id", "<", _N_QUERIES)],
    )
    qids = tbl["vec_id"].to_pylist()
    order = np.argsort(qids)
    qmat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )[order]
    qlabs = np.asarray(tbl["label"], dtype=np.int64)[order].tolist()
    return sim.filtered_knn(
        _emb(sf_dir, ["vec_id", "embedding", "label"]),
        [int(qids[i]) for i in order],
        qmat,
        qlabs,
        k=_KNN_K,
        mode="exclude",
    ).select_columns(["query_id", "vec_id", "cosine", "rank"])


def _q_vocab_shared_all(sf_dir: str):
    """Vocabulary INTERSECTION across every source (stages/setops.py):
    per-batch distinct (word, source) partials, one word-hash co-group,
    in-partition distinct-source count + threshold — the cross-partition
    set-algebra primitive.  Threshold = the corpus's total distinct
    source count (derived with a bounded column-pruned pass)."""
    from docling_api_ray.stages.setops import vocab_source_coverage

    n_sources = len(_docs(sf_dir, ["source"]).unique("source"))
    return vocab_source_coverage(
        _docs(sf_dir, ["text", "source"]), min_sources=n_sources
    )


def _q_weighted_sample(sf_dir: str):
    """Deterministic weight-proportional bottom-k sample
    (stages/splits.py weighted_sample): Efraimidis–Spirakis priorities
    with the RNG replaced by the process-stable md5 hash — pure integer
    arithmetic mirrored exactly by the HUGEINT oracle."""
    from docling_api_ray.stages.splits import weighted_sample

    return weighted_sample(_docs(sf_dir, ["doc_id", "n_chars"]), k=100)


def _q_curriculum_bins(sf_dir: str):
    """Equal-population curriculum deciles over document size — the
    global_rank machinery (histogram prefix + tie-rank exchange, no
    distributed sort) with the exact integer bin formula
    (rank-1)*10 // N appended."""
    from docling_api_ray.stages.stats import global_rank

    return global_rank(_docs(sf_dir, ["doc_id", "n_chars"]), bins=10)


_DSIR_TARGET = ("src0", "src1")


def _q_dsir_weights(sf_dir: str):
    """DSIR importance weights (stages/dsir.py): hashed-unigram target
    vs raw models trained in one bounded-sketch pass (two dense 1024-int
    rows per block), integer micro-log-ratio table broadcast via
    ray.put, stateless scoring pass.  Integer-exact sums keep the oracle
    order-free."""
    from docling_api_ray.stages.dsir import dsir_scores

    return dsir_scores(
        _docs(sf_dir, ["doc_id", "text", "source"]),
        target_sources=_DSIR_TARGET,
    )


def _q_bpe_merges(sf_dir: str):
    """Distributed BPE vocabulary learning (stages/bpe.py): one exact
    distributed word count (map-side Arrow partials + word-hash
    co-group), then the merge loop over the BOUNDED (word, count) table
    — the sentencepiece-standard shape.  Iterative merge rewriting is
    not SQL-expressible → rows-only conformance; exactness covered by
    hand-computed unit tests (tests/test_bpe.py)."""
    from docling_api_ray.stages.bpe import bpe_merges_dataset

    return bpe_merges_dataset(_docs(sf_dir, ["doc_id", "text"]), num_merges=20)


def _q_bpe_token_counts(sf_dir: str):
    """Learned-BPE token counts per document: merges trained as in
    bpe_merges, broadcast once, applied per UNIQUE word per batch with
    an actor-local cache (stages/bpe.py).  Rows-only conformance (same
    iterative-algorithm reason)."""
    from docling_api_ray.stages.bpe import (
        bpe_token_counts,
        corpus_word_counts,
        learn_merges,
    )

    docs = _docs(sf_dir, ["doc_id", "text"])
    merges = learn_merges(corpus_word_counts(docs), 20)
    return bpe_token_counts(docs, merges)


def _q_hll_by_source(sf_dir: str):
    """Per-source HyperLogLog register tables (stages/sketch.py
    grouped_hll_registers): one sketch per source, |sources|×4096-
    bounded partials through the two-level max fold — registers (pure
    integers) are the output, so the oracle replays them exactly."""
    from docling_api_ray.stages.sketch import grouped_hll_registers

    return grouped_hll_registers(_docs(sf_dir, ["source", "text"]))


def _q_mixture_weights(sf_dir: str):
    """Temperature-scaled (α = 0.5) source mixture sampling weights
    (stages/mixture.py): one bounded-domain token-count fold, then
    shares / sqrt-temperature weights computed in the ≤|sources|-row
    final block.  IEEE sqrt + floored micro weights keep both sides
    bit-identical."""
    from docling_api_ray.stages.mixture import mixture_weights

    return mixture_weights(_docs(sf_dir, ["source", "text"]))


def _q_repetition_stats(sf_dir: str):
    """Within-doc bigram repetition signals (stages/text_analysis.py
    repetition_stats — the Gopher n-gram repetition rules): stateless
    vectorized pass; fractions are single int/int IEEE divisions so no
    quantization is needed for the oracle compare."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.repetition_stats, batch_format="pyarrow"
    )


def _q_inverted_postings(sf_dir: str):
    """Bounded inverted index (stages/postings.py): the global top-10
    vocabulary (the shared distributed-top-k tail, bounded driver
    materialization) broadcast as the term set, then term-filtered
    batch-distinct (word, doc) pairs through ONE word-hash co-group
    folding exact df + capped ascending posting strings."""
    from docling_api_ray.stages.postings import inverted_postings

    top = _distributed_count_topk(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            ta.word_counts, batch_format="pyarrow"
        ),
        "word",
        10,
    ).take_all()
    return inverted_postings(
        _docs(sf_dir, ["doc_id", "text"]),
        [r["word"] for r in top],
        cap=50,
    )


def _q_knn_pq(sf_dir: str):
    """Product-quantization ANN (stages/pq.py): 64-dim vectors compress
    to 8 subspace codes against a fixed integer codebook; queries rank
    candidates by the integer ADC lookup-table sum — fused quantize →
    assign → ADC → local-top-k streaming pass, per-query merge.  The
    codebook is the seeded conformance quantizer (train_pq_codebook
    recall is covered in tests), keeping every stage oracle-checkable
    in pure integer arithmetic."""
    from docling_api_ray.stages.pq import fixed_pq_codebook, pq_knn

    qids, qmat = _query_vectors(sf_dir)
    return pq_knn(
        _emb(sf_dir, ["vec_id", "embedding"]),
        qids,
        qmat,
        fixed_pq_codebook(),
        k=_KNN_K,
    ).select_columns(["query_id", "vec_id", "adc", "rank"])


def _q_readability(sf_dir: str):
    """Flesch-style readability filter signals
    (stages/text_analysis.py readability_scores) — stateless vectorized
    map, one Arrow regex-count kernel per component."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ta.readability_scores, batch_format="pyarrow"
    )


def _q_robust_stats(sf_dir: str):
    """Outlier-robust per-source token stats (stages/stats.py
    robust_stats_by_group): exact median / MAD / 5%-trimmed mean from
    one bounded (source × count)-domain histogram fold."""
    from docling_api_ray.stages.stats import robust_stats_by_group

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "v": pc.cast(
                    pc.count_substring_regex(b["text"], ta.WS_TOKEN_RE),
                    pa.int64(),
                ),
            }
        )

    return robust_stats_by_group(
        _docs(sf_dir, ["text", "source"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        group_col="source",
        value_col="v",
        trim=0.05,
    )


_CONTAIN_TH = 0.3


def _q_ngram_containment(sf_dir: str):
    """Bigram-shingle containment pairs within the source blocking key
    (stages/dedup.py ngram_containment_pairs) — the subset-inclusion
    near-dup metric Jaccard misses."""
    return _with_schema(
        dd.ngram_containment_pairs(
            _docs(sf_dir, ["doc_id", "text", "source"]),
            block_col="source",
            n=2,
            threshold=_CONTAIN_TH,
        ),
        pa.schema(
            [
                ("left_id", pa.int64()),
                ("right_id", pa.int64()),
                ("containment", pa.float64()),
            ]
        ),
    )


_VOTE_MOD = 10
_VOTE_K = 5


def _q_knn_label_vote(sf_dir: str):
    """k-NN label-vote evaluation (stages/similarity.py knn_label_vote):
    per-label leave-out accuracy of a majority-vote classifier over the
    embedding space."""
    return sim.knn_label_vote(
        _emb(sf_dir, ["vec_id", "embedding", "label"]),
        sample_mod=_VOTE_MOD,
        k=_VOTE_K,
    )


def _q_session_transitions(sf_dir: str):
    """Markov next-event transition matrix over gap sessions
    (stages/windows.py session_transitions) — ordered adjacency, the
    directional counterpart of session_type_pairs' co-occurrence."""
    from docling_api_ray.stages.windows import session_transitions

    return session_transitions(
        _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]),
        gap_s=1800,
    )


def _q_user_top_event(sf_dir: str):
    """Mode per group (stages/windows.py top_event_per_user): each
    user's most frequent event type, ties to the smallest type."""
    from docling_api_ray.stages.windows import top_event_per_user

    return top_event_per_user(_read(sf_dir, "events", ["user_id", "event_type"]))


_WAU_DAYS = 7


def _q_events_wau(sf_dir: str):
    """Trailing 7-day distinct active users per observed day
    (stages/windows.py rolling_active_users) — the sliding-DISTINCT
    aggregate that plain windowed sums cannot express."""
    from docling_api_ray.stages.windows import rolling_active_users

    return rolling_active_users(
        _read(sf_dir, "events", ["user_id", "ts"]), window_days=_WAU_DAYS
    )


_Q10_START = "1996-01-01"
_Q10_END = "1996-07-01"


def _q_returned_top_customers(sf_dir: str):
    """TPC-H Q10 shape — returned-item revenue report: which customers
    returned the most merchandise in a half-year window.  lineitem
    (l_returnflag='R') pre-reduces per batch to exact int64
    (orderkey, rev_c); orders prune to the date window and project
    (orderkey, custkey); ONE bucketed hash join on orderkey, then a
    per-customer revenue sum via a second co-group exchange.

    Scale shape: the date-windowed orders slice is a TIME-bounded
    fraction of the orders table; it folds to parallel sorted
    (orderkey → custkey) arrays broadcast once into the lineitem map
    (the shipping_priority segment-slice discipline — searchsorted per
    batch, no fact-side exchange; escape hatch when the window slice
    outgrows worker heaps = the bucketed ``hash_join`` on orderkey,
    measured 6.6 s vs 1.5 s for the broadcast at sf0.1/32cpu).  Each
    batch pre-sums revenue per custkey, so the ONE co-group exchange
    moves per-batch partials, and the top-20 head folds with the
    two-level bounded-head pattern; the customer/nation NAME columns
    join AFTER the head — 20 keys, read driver-side with a pruned scan —
    so the wide dimension tables never enter an exchange (the docling
    analog of join-narrow-first; reference has no joins, SURVEY §2.4)."""
    import pandas as pd

    from datetime import datetime

    lo = pa.scalar(datetime.fromisoformat(_Q10_START), type=pa.timestamp("us"))
    hi = pa.scalar(datetime.fromisoformat(_Q10_END), type=pa.timestamp("us"))

    def o_prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi)
        )
        b = b.filter(keep)
        return pa.table(
            {
                "orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "custkey": pc.cast(b["o_custkey"], pa.int64()),
            }
        )

    o_parts = [
        b
        for b in _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(o_prep, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if len(b)
    ]
    if o_parts:
        otbl = pa.concat_tables(o_parts)
        okeys = np.asarray(otbl["orderkey"], dtype=np.int64)
        order = np.argsort(okeys, kind="stable")
        okeys = okeys[order]
        ocust = np.asarray(otbl["custkey"], dtype=np.int64)[order]
    else:
        okeys = np.empty(0, dtype=np.int64)
        ocust = np.empty(0, dtype=np.int64)

    P = 32
    head_schema = pa.schema([("custkey", pa.int64()), ("rev_c", pa.int64())])

    def li_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        if len(b) == 0 or len(okeys) == 0:
            return pa.schema(
                [("custkey", pa.int64()), ("rev_c", pa.int64()),
                 ("__part", pa.int64())]
            ).empty_table()
        lk = np.asarray(b["l_orderkey"], dtype=np.int64)
        idx = np.clip(np.searchsorted(okeys, lk), 0, len(okeys) - 1)
        hit = okeys[idx] == lk
        ec = np.rint(np.asarray(b["l_extendedprice"])[hit] * 100).astype(np.int64)
        dk = np.rint(np.asarray(b["l_discount"])[hit] * 100).astype(np.int64)
        ck = ocust[idx[hit]]
        # map-side combine: one partial row per customer per batch
        uck, inv = np.unique(ck, return_inverse=True)
        sums = np.zeros(len(uck), dtype=np.int64)
        np.add.at(sums, inv, ec * (100 - dk))
        return pa.table(
            {
                "custkey": pa.array(uck, pa.int64()),
                "rev_c": pa.array(sums, pa.int64()),
                "__part": pa.array(uck % P, pa.int64()),
            }
        )

    def sum_part(df: "pd.DataFrame") -> pa.Table:
        g = df.groupby("custkey", sort=False)["rev_c"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).cast(
            head_schema
        ).replace_schema_metadata(None)

    per_cust = (
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        )
        .map_batches(li_partial, batch_format="pyarrow")
        .map_batches(  # coalesce_narrow inline — bundle tiny partial blocks
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__part")
        .map_groups(sum_part, batch_format="pandas")
    )

    def head(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["rev_c", "custkey"], ascending=[False, True], kind="stable"
        ).head(20)
        return pa.Table.from_pandas(df, preserve_index=False).cast(head_schema)

    top = (
        per_cust.map_batches(head, batch_format="pyarrow")
        .repartition(1)
        .map_batches(head, batch_format="pyarrow", batch_size=None)
        .take_all()  # ≤20 rows by the head bound
    )
    ckeys = np.sort(np.array([r["custkey"] for r in top], dtype=np.int64))

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=[("c_custkey", "in", ckeys.tolist())] if len(ckeys) else None,
    )
    ntbl = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    cmap = {
        int(k): (nm, int(nk))
        for k, nm, nk in zip(
            cust["c_custkey"].to_pylist(),
            cust["c_name"].to_pylist(),
            cust["c_nationkey"].to_pylist(),
        )
    }
    nmap = {
        int(k): v
        for k, v in zip(
            ntbl["n_nationkey"].to_pylist(), ntbl["n_name"].to_pylist()
        )
    }
    return pa.table(
        {
            "custkey": pa.array([int(r["custkey"]) for r in top], pa.int64()),
            "c_name": pa.array(
                [cmap[int(r["custkey"])][0] for r in top], pa.string()
            ),
            "n_name": pa.array(
                [nmap[cmap[int(r["custkey"])][1]] for r in top], pa.string()
            ),
            "revenue": pa.array(
                [int(r["rev_c"]) / 10000.0 for r in top], pa.float64()
            ),
        }
    )


_Q14_YEAR = 1996


def _q_promo_revenue_share(sf_dir: str):
    """TPC-H Q14 shape — promotion revenue share per month: the
    canonical broadcast-join + conditional aggregate.  The part table
    projects to a partkey→is_promo BITMAP (sorted key array + boolean
    array, ~1 byte/part) put in the object store ONCE and looked up per
    batch with np.searchsorted — no shuffle touches the fact table.
    Escape hatch at 100 TB: if part outgrows worker heaps the lookup
    becomes the bucketed ``hash_join`` on partkey (stages/joins.py).
    Monthly sums are exact int64 cents through the bounded (≤12-row)
    tree fold; the single division happens driver-side on the folded
    rows."""
    from datetime import datetime

    lo = pa.scalar(datetime(_Q14_YEAR, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime(_Q14_YEAR + 1, 1, 1), type=pa.timestamp("us"))
    ptbl = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    pk = np.asarray(ptbl["p_partkey"], dtype=np.int64)
    order = np.argsort(pk, kind="stable")
    # value-captured closure state (sorted keys + promo bitmap, ~9
    # bytes/part): serialized once per task — see the clustering.py
    # value-capture note (closure ObjectRefs under rapid job submission
    # tripped Ray 2.49's driver ref counter).  Scale escape: hash_join
    # on partkey when part outgrows task closures.
    part_keys = pk[order]
    part_promo = (np.asarray(ptbl["p_type"]) == "PROMO")[order]

    def li_prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b["l_shipdate"], lo), pc.less(b["l_shipdate"], hi)
        )
        b = b.filter(keep)
        ec = np.rint(np.asarray(b["l_extendedprice"]) * 100).astype(np.int64)
        dk = np.rint(np.asarray(b["l_discount"]) * 100).astype(np.int64)
        rev = ec * (100 - dk)
        idx = np.searchsorted(
            part_keys, np.asarray(b["l_partkey"], dtype=np.int64)
        )
        idx = np.clip(idx, 0, max(len(part_keys) - 1, 0))
        is_promo = (
            part_promo[idx] if len(part_keys) else np.zeros(len(b), dtype=bool)
        )
        return pa.table(
            {
                "month": pc.cast(pc.month(b["l_shipdate"]), pa.int64()),
                "rev_c": pa.array(rev, type=pa.int64()),
                "promo_c": pa.array(
                    np.where(is_promo, rev, 0), type=pa.int64()
                ),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")

    folded = bounded_groupby_sum(
        li, ["month"], sum_cols={"rev_c": "rev_c", "promo_c": "promo_c"}
    ).take_all()  # ≤12 rows — month-bounded
    folded.sort(key=lambda r: int(r["month"]))
    share = [
        round(100.0 * int(r["promo_c"]) / int(r["rev_c"]), 6)
        if int(r["rev_c"])
        else 0.0
        for r in folded
    ]
    return pa.table(
        {
            "month": pa.array([int(r["month"]) for r in folded], pa.int64()),
            "promo_share": pa.array(share, pa.float64()),
        }
    )


def _q_supplier_part_counts(sf_dir: str):
    """TPC-H Q16 shape — how many distinct suppliers can supply each
    (brand, type, size) bucket, excluding a brand and a bad-supplier
    set.  The synthetic schema has no partsupp table; the observed
    (l_partkey, l_suppkey) pairs in lineitem play its role (SURVEY has
    no join ops; this exercises anti-set + distinct-count composition).

    Scale shape: the bad-supplier set (s_acctbal < 0) is a bounded id
    array broadcast once (np.isin per batch); lineitem pre-distincts
    (partkey, suppkey) per batch, then ONE co-group exchange on partkey
    both distincts the pair globally AND joins the part attributes
    (hash_join on partkey); the distinct supplier count per bucket is
    the two-grouped-aggregates pattern (events_distinct_users) — never
    a count(distinct) over raw rows."""
    from docling_api_ray.stages.joins import broadcast_join

    stbl = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_acctbal"],
    )
    # bad-supplier id set: bounded, value-captured (clustering.py note)
    bad = np.sort(
        np.asarray(stbl["s_suppkey"], dtype=np.int64)[
            np.asarray(stbl["s_acctbal"]) < 0.0
        ]
    )

    def li_prep(b: pa.Table) -> pa.Table:
        pk = np.asarray(b["l_partkey"], dtype=np.int64)
        sk = np.asarray(b["l_suppkey"], dtype=np.int64)
        keep = ~np.isin(sk, bad)
        pairs = np.unique(
            np.stack([pk[keep], sk[keep]], axis=1), axis=0
        )
        return pa.table(
            {
                "partkey": pa.array(pairs[:, 0], pa.int64()),
                "suppkey": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    pairs = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
        li_prep, batch_format="pyarrow"
    )

    def p_prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.invert(pc.equal(b["p_brand"], "Brand#1")))
        return pa.table(
            {
                "partkey": pc.cast(b["p_partkey"], pa.int64()),
                "p_brand": b["p_brand"],
                "p_type": b["p_type"],
                "p_size": pc.cast(b["p_size"], pa.int64()),
            }
        )

    part = _read(
        sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]
    ).map_batches(p_prep, batch_format="pyarrow")

    # the filtered part dimension is orders-of-magnitude below partsupp
    # pairs -> broadcast (size-guarded; co-group join above the guard)
    joined = broadcast_join(
        pairs, part, on="partkey",
        schemas=(
            pa.schema([("partkey", pa.int64()), ("suppkey", pa.int64())]),
            pa.schema(
                [
                    ("partkey", pa.int64()),
                    ("p_brand", pa.string()),
                    ("p_type", pa.string()),
                    ("p_size", pa.int64()),
                ]
            ),
        ),
    )

    # distinct-count tail: ONE int-keyed co-group instead of two chained
    # multi-string-column groupbys (measured 75 s → ~2 s at sf0.01/8cpu:
    # Ray's sort shuffle on wide string keys dominates).  Bucket =
    # hash(brand,type,size) mod P, so every row of a (b,t,s) bucket
    # lands in one group and the fold is an exact vectorized
    # drop_duplicates + nunique; P bounds group count, attrs disambiguate
    # collisions inside the fold.
    import pandas as pd

    from docling_api_ray.functions.hashing import u64_md5

    P = 64
    out_schema = pa.schema(
        [
            ("p_brand", pa.string()),
            ("p_type", pa.string()),
            ("p_size", pa.int64()),
            ("supplier_cnt", pa.int64()),
        ]
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        key = [
            f"{br}|{ty}|{sz}"
            for br, ty, sz in zip(
                b["p_brand"].to_pylist(),
                b["p_type"].to_pylist(),
                b["p_size"].to_pylist(),
            )
        ]
        h = u64_md5(key) % P
        # hash_join emits pandas blocks; their arrow conversion carries a
        # pandas-metadata dict that breaks Ray's schema hashing in the
        # shuffle reduce — strip it before the groupby
        return b.append_column(
            "__b", pa.array(h.astype(np.int64))
        ).replace_schema_metadata(None)

    def fold(df: "pd.DataFrame") -> pa.Table:
        d = df[["p_brand", "p_type", "p_size", "suppkey"]].drop_duplicates()
        g = (
            d.groupby(["p_brand", "p_type", "p_size"], sort=False)["suppkey"]
            .nunique()
            .reset_index(name="supplier_cnt")
        )
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).cast(out_schema).replace_schema_metadata(None)

    return _with_schema(
        joined.select_columns(["p_brand", "p_type", "p_size", "suppkey"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .map_batches(  # coalesce_narrow inline — bundle tiny partial blocks
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__b")
        .map_groups(fold, batch_format="pandas"),
        out_schema,
    )


_Q19_BANDS = (
    ("Brand#5", 5, 1, 11),
    ("Brand#14", 10, 10, 20),
    ("Brand#20", 15, 20, 30),
)


def _q_quantity_band_revenue(sf_dir: str):
    """TPC-H Q19 shape — OR-of-ANDs predicate revenue: three
    (brand, max-size, quantity-band) disjuncts evaluated against a
    broadcast part attribute table.  part projects to parallel sorted
    arrays (key, brand-code int8, size int8) put ONCE; each lineitem
    batch resolves its partkeys with one np.searchsorted and evaluates
    the whole disjunction vectorized — the predicate never becomes a
    join.  The global sum is exact int64 cents through a single
    bounded fold row."""
    ptbl = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    )
    pk = np.asarray(ptbl["p_partkey"], dtype=np.int64)
    order = np.argsort(pk, kind="stable")
    brands = np.asarray(ptbl["p_brand"])[order]
    brand_code = np.full(len(brands), -1, dtype=np.int8)
    for i, (b_name, _, _, _) in enumerate(_Q19_BANDS):
        brand_code[brands == b_name] = i
    # value-captured lookup arrays (~11 bytes/part; clustering.py note)
    part_keys = pk[order]
    part_code = brand_code
    part_size = np.asarray(ptbl["p_size"], dtype=np.int16)[order]

    def li_prep(b: pa.Table) -> pa.Table:
        idx = np.clip(
            np.searchsorted(
                part_keys, np.asarray(b["l_partkey"], dtype=np.int64)
            ),
            0,
            max(len(part_keys) - 1, 0),
        )
        code = part_code[idx]
        size = part_size[idx]
        qty = np.asarray(b["l_quantity"])
        keep = np.zeros(len(b), dtype=bool)
        for i, (_, max_size, qlo, qhi) in enumerate(_Q19_BANDS):
            keep |= (
                (code == i)
                & (size >= 1)
                & (size <= max_size)
                & (qty >= qlo)
                & (qty <= qhi)
            )
        ec = np.rint(np.asarray(b["l_extendedprice"]) * 100).astype(np.int64)
        dk = np.rint(np.asarray(b["l_discount"]) * 100).astype(np.int64)
        return pa.table(
            {
                "one": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
                "rev_c": pa.array((ec * (100 - dk))[keep], type=pa.int64()),
            }
        )

    li = _coal(
        _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        ).map_batches(li_prep, batch_format="pyarrow")
    )
    rows = bounded_groupby_sum(
        li, ["one"], sum_cols={"rev_c": "rev_c"}, count_alias="n_items"
    ).take_all()  # exactly ≤1 row
    rev_c = int(rows[0]["rev_c"]) if rows else 0
    n = int(rows[0]["n_items"]) if rows else 0
    return pa.table(
        {
            "revenue": pa.array([rev_c / 10000.0], pa.float64()),
            "n_items": pa.array([n], pa.int64()),
        }
    )


_Q6_YEAR = 1996


def _q_revenue_forecast(sf_dir: str):
    """TPC-H Q6 shape — the canonical scan-filter-aggregate: one pruned
    pass over lineitem, a fully vectorized conjunctive predicate
    (shipdate year, discount band, quantity cap), and a single exact
    int64-cents revenue scalar.  No exchange of any kind: each batch
    folds to one partial row and ``Dataset.sum`` streams the partials.
    The discount band compares ROUNDED integer percent points on both
    engines, so the float column can never straddle the band edge
    differently here and in the oracle."""
    from datetime import datetime

    lo = pa.scalar(datetime(_Q6_YEAR, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime(_Q6_YEAR + 1, 1, 1), type=pa.timestamp("us"))

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b["l_shipdate"], lo), pc.less(b["l_shipdate"], hi)
        )
        b = b.filter(keep)
        dk = np.rint(np.asarray(b["l_discount"]) * 100).astype(np.int64)
        m = (dk >= 5) & (dk <= 7) & (np.asarray(b["l_quantity"]) < 24)
        ec = np.rint(np.asarray(b["l_extendedprice"])[m] * 100).astype(np.int64)
        return pa.table(
            {
                "rev_c": pa.array([int((ec * dk[m]).sum())], pa.int64()),
                "n_items": pa.array([int(m.sum())], pa.int64()),
            }
        )

    rows = bounded_groupby_sum(
        _read(
            sf_dir, "lineitem",
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        )
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column("one", pa.array([1] * len(t), pa.int64())),
            batch_format="pyarrow",
        ),
        ["one"],
        sum_cols={"rev_c": "rev_c", "n_items": "n_items"},
    ).take_all()
    rev_c = int(rows[0]["rev_c"]) if rows else 0
    n = int(rows[0]["n_items"]) if rows else 0
    return pa.table(
        {
            "revenue": pa.array([rev_c / 10000.0], pa.float64()),
            "n_items": pa.array([n], pa.int64()),
        }
    )


def _q_nation_profit_by_year(sf_dir: str):
    """TPC-H Q9 shape — product-line profit by supplier nation and order
    year.  Two dimension sides broadcast as value-captured sorted arrays
    (part → is-'red' bitmap; supplier → nation code), so the only
    exchange is the narrow fact×fact ``hash_join`` of the filtered
    lineitem projection (orderkey, nation, profit_c) against the orders
    projection (orderkey, year) — both sides pre-projected to ≤17
    bytes/row before any data moves.  The (nation × year) aggregate is
    bounded (≤25×8 rows) and folds with the two-level tree; nation NAMES
    attach driver-side to the folded rows (dimension strings never enter
    the exchange).  Reference has no joins (SURVEY §2.4 gap-fill)."""
    from docling_api_ray.stages.joins import hash_join

    ptbl = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    pk = np.asarray(ptbl["p_partkey"], dtype=np.int64)
    order = np.argsort(pk, kind="stable")
    part_keys = pk[order]
    part_red = np.char.find(
        np.asarray(ptbl["p_name"], dtype=str), "red"
    )[order] >= 0

    stbl = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    sk = np.asarray(stbl["s_suppkey"], dtype=np.int64)
    sorder = np.argsort(sk, kind="stable")
    supp_keys = sk[sorder]
    supp_nation = np.asarray(stbl["s_nationkey"], dtype=np.int64)[sorder]

    def li_prep(b: pa.Table) -> pa.Table:
        lpk = np.asarray(b["l_partkey"], dtype=np.int64)
        idx = np.clip(
            np.searchsorted(part_keys, lpk), 0, max(len(part_keys) - 1, 0)
        )
        hit = (
            (part_keys[idx] == lpk) & part_red[idx]
            if len(part_keys)
            else np.zeros(len(b), dtype=bool)
        )
        b = b.filter(pa.array(hit))
        ec = np.rint(np.asarray(b["l_extendedprice"]) * 100).astype(np.int64)
        dk = np.rint(np.asarray(b["l_discount"]) * 100).astype(np.int64)
        lsk = np.asarray(b["l_suppkey"], dtype=np.int64)
        sidx = np.clip(
            np.searchsorted(supp_keys, lsk), 0, max(len(supp_keys) - 1, 0)
        )
        return pa.table(
            {
                "orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "nationkey": pa.array(supp_nation[sidx], pa.int64()),
                "profit_c": pa.array(ec * (100 - dk), pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")

    def o_prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        o_prep, batch_format="pyarrow"
    )
    joined = hash_join(
        li, orders, on="orderkey",
        schemas=(
            pa.schema(
                [("orderkey", pa.int64()), ("nationkey", pa.int64()),
                 ("profit_c", pa.int64())]
            ),
            pa.schema([("orderkey", pa.int64()), ("o_year", pa.int64())]),
        ),
    )
    folded = bounded_groupby_sum(
        joined.select_columns(["nationkey", "o_year", "profit_c"]),
        ["nationkey", "o_year"],
        sum_cols={"profit_c": "profit_c"},
    ).take_all()  # ≤ |nations| × |years| rows
    ntbl = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nmap = {
        int(k): v
        for k, v in zip(ntbl["n_nationkey"].to_pylist(), ntbl["n_name"].to_pylist())
    }
    return pa.table(
        {
            "n_name": pa.array(
                [nmap[int(r["nationkey"])] for r in folded], pa.string()
            ),
            "o_year": pa.array([int(r["o_year"]) for r in folded], pa.int64()),
            "profit": pa.array(
                [int(r["profit_c"]) / 10000.0 for r in folded], pa.float64()
            ),
        }
    )


_Q8_TYPE = "ECONOMY"
_Q8_REGION_KEY = 1  # 'AMERICA' (region table is 5 rows, key fixed by gen)
_Q8_NATION_KEY = 19  # target supplier nation whose share we track


def _q_mkt_share_by_year(sf_dir: str):
    """TPC-H Q8 shape — national market share: of all '{type}' parts
    sold to customers in one region during 1995–1996, what fraction of
    revenue (by order year) was supplied by one nation.  Same exchange
    discipline as Q9 (`_q_nation_profit_by_year`): part/supplier/
    customer dimensions broadcast as value-captured sorted arrays, the
    only shuffle is the narrow fact×fact ``hash_join`` of the filtered
    lineitem projection (orderkey, supp-nation, volume_c ≤ 24 B/row)
    against the region+window-filtered orders projection (orderkey,
    o_year ≤ 16 B/row).  The (year × nation) aggregate is bounded
    (≤ 2×25 rows) and the share division happens driver-side on exact
    int cents — float64-cast numerator/denominator mirror the oracle's
    CAST(...AS DOUBLE) order of operations bit-for-bit.  At web scale
    the customer lookup becomes a second hash_join; the broadcast here
    is bounded by |customer| ≪ |lineitem| (docstring contract as in
    Q10's windowed-orders broadcast).  Reference has no joins (SURVEY
    §2.4 gap-fill)."""
    from datetime import datetime
    from docling_api_ray.stages.joins import hash_join

    ptbl = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    pk = np.asarray(ptbl["p_partkey"], dtype=np.int64)
    porder = np.argsort(pk, kind="stable")
    part_keys = pk[porder]
    part_hit = (np.asarray(ptbl["p_type"], dtype=str) == _Q8_TYPE)[porder]

    stbl = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    sk = np.asarray(stbl["s_suppkey"], dtype=np.int64)
    sorder = np.argsort(sk, kind="stable")
    supp_keys = sk[sorder]
    supp_nation = np.asarray(stbl["s_nationkey"], dtype=np.int64)[sorder]

    ctbl = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    ck = np.asarray(ctbl["c_custkey"], dtype=np.int64)
    corder = np.argsort(ck, kind="stable")
    cust_keys = ck[corder]
    ntbl = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey"],
    )
    nat_region = np.zeros(
        int(max(ntbl["n_nationkey"].to_pylist() or [0])) + 1, dtype=np.int64
    )
    nat_region[np.asarray(ntbl["n_nationkey"], dtype=np.int64)] = np.asarray(
        ntbl["n_regionkey"], dtype=np.int64
    )
    cust_in_region = (
        nat_region[np.asarray(ctbl["c_nationkey"], dtype=np.int64)]
        == _Q8_REGION_KEY
    )[corder]

    def li_prep(b: pa.Table) -> pa.Table:
        lpk = np.asarray(b["l_partkey"], dtype=np.int64)
        idx = np.clip(
            np.searchsorted(part_keys, lpk), 0, max(len(part_keys) - 1, 0)
        )
        hit = (
            (part_keys[idx] == lpk) & part_hit[idx]
            if len(part_keys)
            else np.zeros(len(b), dtype=bool)
        )
        b = b.filter(pa.array(hit))
        ec = np.rint(np.asarray(b["l_extendedprice"]) * 100).astype(np.int64)
        dk = np.rint(np.asarray(b["l_discount"]) * 100).astype(np.int64)
        lsk = np.asarray(b["l_suppkey"], dtype=np.int64)
        sidx = np.clip(
            np.searchsorted(supp_keys, lsk), 0, max(len(supp_keys) - 1, 0)
        )
        return pa.table(
            {
                "orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "snat": pa.array(supp_nation[sidx], pa.int64()),
                "volume_c": pa.array(ec * (100 - dk), pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")

    lo = pa.scalar(datetime(1995, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(datetime(1997, 1, 1), type=pa.timestamp("us"))

    def o_prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b["o_orderdate"], lo), pc.less(b["o_orderdate"], hi)
        )
        b = b.filter(keep)
        ok = np.asarray(b["o_custkey"], dtype=np.int64)
        cidx = np.clip(
            np.searchsorted(cust_keys, ok), 0, max(len(cust_keys) - 1, 0)
        )
        hit = (
            (cust_keys[cidx] == ok) & cust_in_region[cidx]
            if len(cust_keys)
            else np.zeros(len(b), dtype=bool)
        )
        b = b.filter(pa.array(hit))
        return pa.table(
            {
                "orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(o_prep, batch_format="pyarrow")
    joined = hash_join(
        li, orders, on="orderkey",
        schemas=(
            pa.schema(
                [("orderkey", pa.int64()), ("snat", pa.int64()),
                 ("volume_c", pa.int64())]
            ),
            pa.schema([("orderkey", pa.int64()), ("o_year", pa.int64())]),
        ),
    )

    def tag(b: pa.Table) -> pa.Table:
        is_nat = pc.equal(b["snat"], pa.scalar(_Q8_NATION_KEY, pa.int64()))
        nat_c = pc.if_else(is_nat, b["volume_c"], pa.scalar(0, pa.int64()))
        return pa.table(
            {"o_year": b["o_year"], "tot_c": b["volume_c"], "nat_c": nat_c}
        )

    folded = bounded_groupby_sum(
        joined.map_batches(tag, batch_format="pyarrow"),
        ["o_year"],
        sum_cols={"tot_c": "tot_c", "nat_c": "nat_c"},
    ).take_all()  # ≤ |years| rows
    years = sorted(int(r["o_year"]) for r in folded)
    by_year = {int(r["o_year"]): r for r in folded}
    return pa.table(
        {
            "o_year": pa.array(years, pa.int64()),
            "mkt_share": pa.array(
                [
                    float(int(by_year[y]["nat_c"]))
                    / float(int(by_year[y]["tot_c"]))
                    for y in years
                ],
                pa.float64(),
            ),
            "nation_volume": pa.array(
                [int(by_year[y]["nat_c"]) / 10000.0 for y in years], pa.float64()
            ),
            "total_volume": pa.array(
                [int(by_year[y]["tot_c"]) / 10000.0 for y in years], pa.float64()
            ),
        }
    )


def _q_part_value_share(sf_dir: str):
    """TPC-H Q11 shape — per-part value concentration: parts whose
    revenue (through one third of supplier nations) exceeds 1.6× the
    mean part value.  The supplier filter is a broadcast sorted-array
    nation lookup (never a join); per-part values reduce map-side then
    through ONE partkey co-group into a PART-DIMENSION-bounded narrow
    table, which is materialized once (it is re-consumed by the global
    total AND the filter — re-execution would rescan lineitem twice).
    The threshold is exact at EVERY scale: the condition
    val·10·n > 16·total is rewritten as val ≥ ⌊16·total/(10·n)⌋ + 1
    with the floor computed ONCE driver-side in unbounded Python ints
    (total and n are folded scalars), so the per-batch filter is a
    plain int64-vs-scalar compare — no cross-multiply can overflow
    (ADVICE r3: val·10·n hits 2^63 around sf100, far below the 100 TB
    target), and no float division can flip a borderline part
    differently here and in the DuckDB mirror."""
    stbl = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    sk = np.asarray(stbl["s_suppkey"], dtype=np.int64)
    sorder = np.argsort(sk, kind="stable")
    supp_keys = sk[sorder]
    supp_in = (np.asarray(stbl["s_nationkey"], dtype=np.int64) % 3 == 0)[sorder]

    P = 32
    part_schema = pa.schema([("partkey", pa.int64()), ("val", pa.int64())])

    def li_partial(b: pa.Table) -> pa.Table:
        lsk = np.asarray(b["l_suppkey"], dtype=np.int64)
        sidx = np.clip(
            np.searchsorted(supp_keys, lsk), 0, max(len(supp_keys) - 1, 0)
        )
        hit = (
            (supp_keys[sidx] == lsk) & supp_in[sidx]
            if len(supp_keys)
            else np.zeros(len(b), dtype=bool)
        )
        ec = np.rint(np.asarray(b["l_extendedprice"])[hit] * 100).astype(np.int64)
        dk = np.rint(np.asarray(b["l_discount"])[hit] * 100).astype(np.int64)
        pkk = np.asarray(b["l_partkey"], dtype=np.int64)[hit]
        upk, inv = np.unique(pkk, return_inverse=True)
        sums = np.zeros(len(upk), dtype=np.int64)
        np.add.at(sums, inv, ec * (100 - dk))
        return pa.table(
            {
                "partkey": pa.array(upk, pa.int64()),
                "val": pa.array(sums, pa.int64()),
                "__part": pa.array(upk % P, pa.int64()),
            }
        )

    def sum_part(df) -> pa.Table:
        g = df.groupby("partkey", sort=False)["val"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).cast(
            part_schema
        ).replace_schema_metadata(None)

    per_part = (
        _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(li_partial, batch_format="pyarrow")
        .map_batches(  # coalesce_narrow inline — bundle tiny partial blocks
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__part")
        .map_groups(sum_part, batch_format="pandas")
        .materialize()  # part-dimension-bounded narrow table, read twice
    )
    total = int(per_part.sum("val", ignore_nulls=True) or 0)
    n_parts = per_part.count()
    # v·10·n > 16·total  ⟺  v ≥ ⌊16·total/(10·n)⌋ + 1 (all integers):
    # exact rational threshold folded once in unbounded Python ints
    thresh = (16 * total) // (10 * n_parts) + 1 if n_parts else 1
    if thresh >= 2**63:  # no int64 value can qualify
        return pa.schema(
            [("partkey", pa.int64()), ("value", pa.float64())]
        ).empty_table()

    def keep(b: pa.Table) -> pa.Table:
        v = np.asarray(b["val"], dtype=np.int64)
        return b.filter(pa.array(v >= thresh))

    out = per_part.map_batches(keep, batch_format="pyarrow")
    return out.map_batches(
        lambda t: pa.table(
            {
                "partkey": t["partkey"],
                "value": pc.divide(pc.cast(t["val"], pa.float64()), 10000.0),
            }
        ),
        batch_format="pyarrow",
    )


def _q_custdist(sf_dir: str):
    """TPC-H Q13 shape — customer order-count distribution INCLUDING
    zero-order customers: the double aggregate (count per customer →
    counts-of-counts).  First level is one custkey co-group over
    map-side (custkey, n) partials; second level is
    ``bounded_groupby_sum`` over the count value (bounded by the max
    orders any customer has, not by the customer count).  The zero
    bucket needs only two scalars — total customers from the parquet
    FOOTER (no data read) and the distinct-custkey count the first
    level already produced — so no customer×orders join ever runs
    (referential integrity o_custkey ⊆ customer is a generator
    invariant, asserted in tests)."""
    P = 32
    cnt_schema = pa.schema([("custkey", pa.int64()), ("n", pa.int64())])

    def o_partial(b: pa.Table) -> pa.Table:
        ck = np.asarray(b["o_custkey"], dtype=np.int64)
        uck, counts = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "custkey": pa.array(uck, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
                "__part": pa.array(uck % P, pa.int64()),
            }
        )

    def sum_part(df) -> pa.Table:
        g = df.groupby("custkey", sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).cast(
            cnt_schema
        ).replace_schema_metadata(None)

    per_cust = (
        _read(sf_dir, "orders", ["o_custkey"])
        .map_batches(o_partial, batch_format="pyarrow")
        .map_batches(  # coalesce_narrow inline
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__part")
        .map_groups(sum_part, batch_format="pandas")
    )
    dist = bounded_groupby_sum(
        per_cust.map_batches(
            lambda t: pa.table(
                {"c_count": t["n"], "one": pa.array([1] * len(t), pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        ["c_count"],
        sum_cols={"custdist": "one"},
    ).take_all()  # bounded by max orders per customer
    n_customers = pq.read_metadata(
        os.path.join(sf_dir, "customer.parquet")
    ).num_rows
    n_with_orders = sum(int(r["custdist"]) for r in dist)
    rows = [(int(r["c_count"]), int(r["custdist"])) for r in dist]
    if n_customers - n_with_orders > 0:
        rows.append((0, n_customers - n_with_orders))
    rows.sort()
    return pa.table(
        {
            "c_count": pa.array([r[0] for r in rows], pa.int64()),
            "custdist": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


_Q20_QTY = 80


def _q_promo_part_suppliers(sf_dir: str):
    """TPC-H Q20 shape — the semi-join chain: suppliers who moved more
    than ``_Q20_QTY`` units of any 'red' part through some single
    (part, supplier) lane.  The part predicate is the broadcast bitmap
    lookup; (suppkey, partkey) quantity sums reduce map-side then
    through ONE co-group keyed on the PAIR hash; the qualifying
    distinct-supplier id set is then the LEFT side of a ``hash_join``
    ``how="semi"`` against the supplier dimension — existence only, no
    row multiplication, name columns attach in the semi probe's own
    bucket.  Output is supplier-dimension-bounded."""
    from docling_api_ray.stages.joins import broadcast_join

    ptbl = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    pk = np.asarray(ptbl["p_partkey"], dtype=np.int64)
    order = np.argsort(pk, kind="stable")
    part_keys = pk[order]
    part_red = np.char.find(
        np.asarray(ptbl["p_name"], dtype=str), "red"
    )[order] >= 0

    P = 32
    pair_schema = pa.schema(
        [("suppkey", pa.int64()), ("partkey", pa.int64()), ("qty", pa.int64())]
    )

    def li_partial(b: pa.Table) -> pa.Table:
        lpk = np.asarray(b["l_partkey"], dtype=np.int64)
        idx = np.clip(
            np.searchsorted(part_keys, lpk), 0, max(len(part_keys) - 1, 0)
        )
        hit = (
            (part_keys[idx] == lpk) & part_red[idx]
            if len(part_keys)
            else np.zeros(len(b), dtype=bool)
        )
        sk = np.asarray(b["l_suppkey"], dtype=np.int64)[hit]
        pkk = lpk[hit]
        qty = np.asarray(b["l_quantity"])[hit]
        # quantities are integral doubles in the generator; rint keeps the
        # sum exact in int64 (asserted against the oracle's SUM(DOUBLE))
        qi = np.rint(qty).astype(np.int64)
        # packed (suppkey, partkey) batch-combine key — collision-free
        # only while partkey < 1e6+3 (TPC-H part crosses 1e6 near sf5),
        # so ENFORCE the bound: a silent merge of distinct pairs would
        # corrupt qty sums, not just routing (ADVICE r3).  Past the
        # bound, switch to np.unique over a 2-column stack
        # (supplier_part_counts pattern).
        if len(pkk) and int(pkk.max()) >= 1_000_003:
            raise AssertionError(
                "promo_part_suppliers packed key: partkey >= 1_000_003 "
                "— switch to the 2-column np.unique combine"
            )
        key = sk * 1_000_003 + pkk
        ukey, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(ukey), dtype=np.int64)
        np.add.at(sums, inv, qi)
        first = np.zeros(len(ukey), dtype=np.int64)
        first[inv] = np.arange(len(key))
        return pa.table(
            {
                "suppkey": pa.array(sk[first], pa.int64()),
                "partkey": pa.array(pkk[first], pa.int64()),
                "qty": pa.array(sums, pa.int64()),
                "__part": pa.array(np.abs(ukey) % P, pa.int64()),
            }
        )

    def sum_part(df) -> pa.Table:
        g = (
            df.groupby(["suppkey", "partkey"], sort=False)["qty"]
            .sum()
            .reset_index()
        )
        g = g[g["qty"] > _Q20_QTY][["suppkey"]].drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False).cast(
            pa.schema([("suppkey", pa.int64())])
        ).replace_schema_metadata(None)

    qualifying = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(li_partial, batch_format="pyarrow")
        .map_batches(  # coalesce_narrow inline — bundle tiny partial blocks
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__part")
        .map_groups(sum_part, batch_format="pandas")
    )
    # per-bucket distinct suppkeys may repeat across buckets (a supplier
    # qualifies through pairs hashed to different buckets) — the semi
    # join is existence-only, but the LEFT side is the supplier DIM, so
    # duplicates on the right are harmless
    supp = _coal(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    ).map_batches(
        lambda t: pa.table(
            {"suppkey": pc.cast(t["s_suppkey"], pa.int64()), "s_name": t["s_name"]}
        ),
        batch_format="pyarrow",
    )
    # argmax-qualifying suppliers are a handful of keys -> broadcast semi
    out = broadcast_join(
        supp, qualifying.select_columns(["suppkey"]), on="suppkey", how="semi",
        schemas=(
            pa.schema([("suppkey", pa.int64()), ("s_name", pa.string())]),
            pa.schema([("suppkey", pa.int64())]),
        ),
    )
    return out.select_columns(["suppkey", "s_name"])


def _q_sole_return_suppliers(sf_dir: str):
    """TPC-H Q21 shape — EXISTS / NOT-EXISTS within a group: for
    multi-supplier orders where EXACTLY ONE supplier's items were
    returned, blame that supplier; report the 10 most-blamed.  The
    correlated-subquery pair collapses into ONE orderkey co-group:
    every order's rows land whole in one partition (orderkey % P), so
    'another supplier exists' and 'no OTHER supplier returned' are both
    decidable in-partition from the per-(order, supplier) distinct
    partials the map side already reduced to.  Per-supplier blame
    counts then fold through the supplier-bounded tree and the top-10
    head is the two-level bounded-head pattern; names attach
    driver-side to ≤10 rows."""
    P = 32

    def li_partial(b: pa.Table) -> pa.Table:
        ok = np.asarray(b["l_orderkey"], dtype=np.int64)
        sk = np.asarray(b["l_suppkey"], dtype=np.int64)
        ret = (np.asarray(b["l_returnflag"]) == "R").astype(np.int64)
        # packed (orderkey, suppkey) batch-combine key: collision-free
        # while suppkey < 1e6+3; ENFORCED per batch (ADVICE r3 — a
        # silent merge corrupts the blame decision).  Beyond the bound
        # switch to np.unique over a 2-column stack
        # (supplier_part_counts pattern).
        if len(sk) and int(sk.max()) >= 1_000_003:
            raise AssertionError(
                "sole_return_suppliers packed key: suppkey >= 1_000_003 "
                "— switch to the 2-column np.unique combine"
            )
        key = ok * 1_000_003 + sk
        ukey, inv = np.unique(key, return_inverse=True)
        rmax = np.zeros(len(ukey), dtype=np.int64)
        np.maximum.at(rmax, inv, ret)
        first = np.zeros(len(ukey), dtype=np.int64)
        first[inv] = np.arange(len(key))
        return pa.table(
            {
                "orderkey": pa.array(ok[first], pa.int64()),
                "suppkey": pa.array(sk[first], pa.int64()),
                "ret": pa.array(rmax, pa.int64()),
                "__part": pa.array(ok[first] % P, pa.int64()),
            }
        )

    blame_schema = pa.schema([("suppkey", pa.int64()), ("n_orders", pa.int64())])

    def blame(df) -> pa.Table:
        # re-distinct across batches, then the group decision per order
        g = (
            df.groupby(["orderkey", "suppkey"], sort=False)["ret"]
            .max()
            .reset_index()
        )
        per_o = g.groupby("orderkey", sort=False).agg(
            ns=("suppkey", "size"), nr=("ret", "sum")
        )
        ok_orders = per_o[(per_o["ns"] > 1) & (per_o["nr"] == 1)].index
        blamed = g[(g["orderkey"].isin(ok_orders)) & (g["ret"] == 1)]
        out = (
            blamed.groupby("suppkey", sort=False)
            .size()
            .reset_index(name="n_orders")
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            blame_schema
        ).replace_schema_metadata(None)

    per_supp = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])
        .map_batches(li_partial, batch_format="pyarrow")
        .map_batches(  # coalesce_narrow inline — bundle tiny partial blocks
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__part")
        .map_groups(blame, batch_format="pandas")
    )
    folded = bounded_groupby_sum(
        per_supp, ["suppkey"], sum_cols={"n_orders": "n_orders"}
    )

    def head(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["n_orders", "suppkey"], ascending=[False, True], kind="stable"
        ).head(10)
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("suppkey", pa.int64()), ("n_orders", pa.int64())])
        )

    top = (
        folded.map_batches(head, batch_format="pyarrow")
        .repartition(1)
        .map_batches(head, batch_format="pyarrow", batch_size=None)
        .take_all()  # ≤10 rows by the head bound
    )
    skeys = [int(r["suppkey"]) for r in top]
    stbl = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", skeys)] if skeys else None,
    )
    smap = {
        int(k): v
        for k, v in zip(stbl["s_suppkey"].to_pylist(), stbl["s_name"].to_pylist())
    }
    return pa.table(
        {
            "suppkey": pa.array(skeys, pa.int64()),
            "s_name": pa.array([smap[k] for k in skeys], pa.string()),
            "n_orders": pa.array([int(r["n_orders"]) for r in top], pa.int64()),
        }
    )


_Q2_TYPE = "STANDARD"
_Q2_SIZE_MOD = 5
_Q2_REGION = "EUROPE"
_Q2_TOPN = 100


def _q_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape — correlated per-part ARGMIN over a filtered
    supplier universe: for STANDARD parts with size % 5 = 0, the
    cheapest EUROPE supplier(s), top-100 by (acctbal DESC, n_name,
    s_name, partkey).  The testdata has no partsupp table, so the
    part×supplier "supply cost" fact is derived from lineitem as
    MIN(int-cent extendedprice) per (partkey, suppkey) — same join
    topology and argmin-with-ties semantics as the spec query
    (reference has no joins at all; this is the engine extension suite,
    SURVEY.md §2.4).

    Scale shape: region→nation→supplier collapse to a broadcast
    sorted-key attribute lookup (bounded dimension by TPC-H
    construction); the part filter broadcasts sorted qualifying
    partkeys (same documented bound as promo_part_suppliers'
    part_red); lineitem pre-reduces per batch to per-(part, supplier)
    int64 min-cost partials over a 2-column np.unique (no packed-key
    collision bound), then ONE partkey co-group decides both the
    cross-batch min-fold AND the per-part argmin-with-ties entirely
    in-partition.  The top-100 head is the two-level bounded-head
    pattern; only ≤100 rows ever reach the driver."""
    ntbl = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    rtbl = pq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    )
    eu_regions = set(
        np.asarray(rtbl["r_regionkey"], dtype=np.int64)[
            np.asarray(rtbl["r_name"].to_pylist(), dtype=object) == _Q2_REGION
        ].tolist()
    )
    nkey = np.asarray(ntbl["n_nationkey"], dtype=np.int64)
    nname = np.asarray(ntbl["n_name"].to_pylist(), dtype=object)
    nmap = {
        int(k): str(n)
        for k, n, r in zip(
            nkey, nname, np.asarray(ntbl["n_regionkey"], dtype=np.int64)
        )
        if int(r) in eu_regions
    }

    stbl = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )
    s_nat = np.asarray(stbl["s_nationkey"], dtype=np.int64)
    s_in = np.fromiter((int(n) in nmap for n in s_nat), dtype=bool,
                       count=len(s_nat))
    sk_all = np.asarray(stbl["s_suppkey"], dtype=np.int64)[s_in]
    order = np.argsort(sk_all, kind="stable")
    supp_keys = sk_all[order]
    supp_bal_c = np.rint(
        np.asarray(stbl["s_acctbal"])[s_in] * 100
    ).astype(np.int64)[order]
    supp_name = np.asarray(stbl["s_name"].to_pylist(), dtype=object)[s_in][order]
    supp_nname = np.asarray(
        [nmap[int(n)] for n in s_nat[s_in]], dtype=object
    )[order]

    ptbl = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_type", "p_size"],
    )
    psel = (
        np.asarray(ptbl["p_type"].to_pylist(), dtype=object) == _Q2_TYPE
    ) & (np.asarray(ptbl["p_size"], dtype=np.int64) % _Q2_SIZE_MOD == 0)
    part_keys = np.sort(np.asarray(ptbl["p_partkey"], dtype=np.int64)[psel])

    P = 32
    cost_schema = pa.schema(
        [("partkey", pa.int64()), ("suppkey", pa.int64()),
         ("cost_c", pa.int64())]
    )

    def _in_sorted(keys: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
        if not len(sorted_set):
            return np.zeros(len(keys), dtype=bool)
        pos = np.clip(np.searchsorted(sorted_set, keys), 0,
                      len(sorted_set) - 1)
        return sorted_set[pos] == keys

    def li_partial(b: pa.Table) -> pa.Table:
        pkk = np.asarray(b["l_partkey"], dtype=np.int64)
        sk = np.asarray(b["l_suppkey"], dtype=np.int64)
        hit = _in_sorted(pkk, part_keys) & _in_sorted(sk, supp_keys)
        pkk, sk = pkk[hit], sk[hit]
        ec = np.rint(
            np.asarray(b["l_extendedprice"])[hit] * 100
        ).astype(np.int64)
        # 2-column np.unique combine — no packed-key collision bound
        stack = np.stack([pkk, sk], axis=1)
        upairs, inv = np.unique(stack, axis=0, return_inverse=True)
        mins = np.full(len(upairs), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, ec)
        return pa.table(
            {
                "partkey": pa.array(upairs[:, 0], pa.int64()),
                "suppkey": pa.array(upairs[:, 1], pa.int64()),
                "cost_c": pa.array(mins, pa.int64()),
                "__part": pa.array(upairs[:, 0] % P, pa.int64()),
            }
        )

    def argmin_fold(df) -> pa.Table:
        g = (
            df.groupby(["partkey", "suppkey"], sort=False)["cost_c"]
            .min()
            .reset_index()
        )
        part_min = g.groupby("partkey", sort=False)["cost_c"].transform("min")
        w = g[g["cost_c"] == part_min]
        return pa.Table.from_pandas(
            w[cost_schema.names], preserve_index=False
        ).cast(cost_schema).replace_schema_metadata(None)

    winners = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(li_partial, batch_format="pyarrow")
        .map_batches(  # coalesce_narrow inline — bundle tiny partial blocks
            lambda b: b, batch_format="pyarrow",
            batch_size=1_000_000, num_cpus=0.9,
        )
        .groupby("__part")
        .map_groups(argmin_fold, batch_format="pandas")
    )

    wide_schema = pa.schema(
        [
            ("acctbal_c", pa.int64()),
            ("s_name", pa.string()),
            ("n_name", pa.string()),
            ("p_partkey", pa.int64()),
            ("cost_c", pa.int64()),
        ]
    )

    def attach(b: pa.Table) -> pa.Table:
        sk = np.asarray(b["suppkey"], dtype=np.int64)
        pos = np.searchsorted(supp_keys, sk)  # every winner is in-universe
        return pa.table(
            {
                "acctbal_c": pa.array(supp_bal_c[pos], pa.int64()),
                "s_name": pa.array(supp_name[pos], pa.string()),
                "n_name": pa.array(supp_nname[pos], pa.string()),
                "p_partkey": b["partkey"],
                "cost_c": b["cost_c"],
            }
        )

    def head(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["acctbal_c", "n_name", "s_name", "p_partkey"],
            ascending=[False, True, True, True],
            kind="stable",
        ).head(_Q2_TOPN)
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            wide_schema
        ).replace_schema_metadata(None)

    top = (
        _with_schema(winners.map_batches(attach, batch_format="pyarrow"),
                     wide_schema)
        .map_batches(head, batch_format="pyarrow")
        .repartition(1)
        .map_batches(head, batch_format="pyarrow", batch_size=None)
        .take_all()  # ≤100 rows by the head bound
    )
    return pa.table(
        {
            "s_acctbal": pa.array(
                [r["acctbal_c"] / 100.0 for r in top], pa.float64()
            ),
            "s_name": pa.array([r["s_name"] for r in top], pa.string()),
            "n_name": pa.array([r["n_name"] for r in top], pa.string()),
            "p_partkey": pa.array(
                [r["p_partkey"] for r in top], pa.int64()
            ),
            "supplycost": pa.array(
                [r["cost_c"] / 100.0 for r in top], pa.float64()
            ),
        }
    )


_Q12_LO_US = 852_076_800_000_000  # 1997-01-01 epoch µs
_Q12_HI_US = 883_612_800_000_000  # 1998-01-01 epoch µs
_Q12_HIGH = ("1-URGENT", "2-HIGH")
_Q12_MODES = ("MAIL", "SHIP", "TRUCK")


def _q_shipmode_priority(sf_dir: str):
    """TPC-H Q12 shape — big-big join + two-flag conditional aggregate:
    line counts by ship mode split into high/low order priority, for
    lineitems shipped within 1997.  The testdata has no l_shipmode
    column, so the mode is the deterministic l_linenumber % 3 →
    (MAIL, SHIP, TRUCK) projection — the join topology (lineitem ⋈
    orders on orderkey) and the CASE-sum shape are the spec query's.

    Scale shape: lineitem pre-reduces per batch to (orderkey, mode, n)
    partials — the packed orderkey·3+mode combine key is
    collision-free BY CONSTRUCTION (mode < 3), no enforcement needed —
    and orders projects (orderkey, is_high 0/1); ONE bucketed hash
    join co-locates them, per-batch CASE-sums reduce the joined rows
    to ≤3-row partials, and the final fold is ``bounded_groupby_sum``
    over the 3-value mode domain."""
    from docling_api_ray.stages.joins import hash_join

    def li_partial(b: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(b["l_shipdate"], pa.int64()))
        keep = (us >= _Q12_LO_US) & (us < _Q12_HI_US)
        ok = np.asarray(b["l_orderkey"], dtype=np.int64)[keep]
        mode = np.asarray(b["l_linenumber"], dtype=np.int64)[keep] % 3
        key = ok * 3 + mode  # exact: mode ∈ [0,3)
        ukey, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "orderkey": pa.array(ukey // 3, pa.int64()),
                "mode_id": pa.array(ukey % 3, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def o_proj(b: pa.Table) -> pa.Table:
        pr = np.asarray(b["o_orderpriority"].to_pylist(), dtype=object)
        high = np.isin(pr, _Q12_HIGH).astype(np.int64)
        return pa.table(
            {
                "orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "high": pa.array(high, pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        o_proj, batch_format="pyarrow"
    )
    joined = hash_join(
        li, orders, on="orderkey", how="inner",
        schemas=(
            pa.schema([("orderkey", pa.int64()), ("mode_id", pa.int64()),
                       ("n", pa.int64())]),
            pa.schema([("orderkey", pa.int64()), ("high", pa.int64())]),
        ),
    )
    modes = np.asarray(_Q12_MODES, dtype=object)

    def case_sum(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"], dtype=np.int64)
        high = np.asarray(b["high"], dtype=np.int64)
        mode = np.asarray(b["mode_id"], dtype=np.int64)
        return pa.table(
            {
                "shipmode": pa.array(modes[mode], pa.string()),
                "high_n": pa.array(n * high, pa.int64()),
                "low_n": pa.array(n * (1 - high), pa.int64()),
            }
        )

    return bounded_groupby_sum(
        joined.map_batches(case_sum, batch_format="pyarrow"),
        ["shipmode"],
        sum_cols={"high_line_count": "high_n", "low_line_count": "low_n"},
    )


_Q22_MOD = 7
_Q22_CODES = (0, 2, 4)
_Q22_CUTOFF_US = 915_148_800_000_000  # 1999-01-01 epoch µs
_Q22_CUTOFF = "1999-01-01"


def _q_sales_opportunity(sf_dir: str):
    """TPC-H Q22 shape — scalar AVG subquery + anti-join: customers in
    selected "country codes" (no c_phone in the testdata → cntrycode :=
    c_nationkey % 7) whose balance exceeds the positive-balance average
    of those codes AND who have placed no RECENT order (none on/after
    1999-01-01 — the spec's "no orders for 7 years" flavor; this
    generator gives every customer at least one all-time order);
    grouped count + balance sum per code.  Reuses the
    ``customers_no_orders`` anti-join machinery.

    Scale shape: the AVG is two folded int64 scalars (Σ bal_c, n) from
    per-batch partials; the threshold compare is rewritten exactly as
    bal_c ≥ ⌊tot/n⌋ + 1 in unbounded Python ints (the part_value_share
    discipline — no cross-multiply overflow at any scale).  Qualifying
    customers anti-join the orders keyset (map-side unique custkeys per
    block, bucketed hash anti-join — both sides large, nothing
    driver-side), and the final fold is ``bounded_groupby_sum`` over
    the ≤7-value code domain."""
    from docling_api_ray.stages.joins import hash_join

    codes = np.asarray(_Q22_CODES, dtype=np.int64)

    def c_proj(b: pa.Table) -> pa.Table:
        code = np.asarray(b["c_nationkey"], dtype=np.int64) % _Q22_MOD
        keep = np.isin(code, codes)
        bal_c = np.rint(
            np.asarray(b["c_acctbal"])[keep] * 100
        ).astype(np.int64)
        return pa.table(
            {
                "custkey": pc.cast(b["c_custkey"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "cntrycode": pa.array(code[keep], pa.int64()),
                "bal_c": pa.array(bal_c, pa.int64()),
            }
        )

    cs = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(c_proj, batch_format="pyarrow").materialize()
    # narrow (custkey, code, bal_c) projection — customer-dimension-
    # bounded, consumed twice (avg fold + qualify filter)

    def avg_partial(b: pa.Table) -> pa.Table:
        bal = np.asarray(b["bal_c"], dtype=np.int64)
        pos = bal[bal > 0]
        return pa.table(
            {
                "tot": pa.array([int(pos.sum())], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    folded = _coal(cs).map_batches(avg_partial, batch_format="pyarrow").sum(
        ["tot", "n"]
    )
    tot, n = int(folded["sum(tot)"] or 0), int(folded["sum(n)"] or 0)
    out_schema = pa.schema(
        [("cntrycode", pa.int64()), ("numcust", pa.int64()),
         ("totacctbal", pa.float64())]
    )
    if n == 0:
        return out_schema.empty_table()
    # bal_c · n > tot  ⟺  bal_c ≥ ⌊tot/n⌋ + 1 (exact rational threshold)
    thresh = tot // n + 1

    def qualify(b: pa.Table) -> pa.Table:
        return b.filter(
            pa.array(np.asarray(b["bal_c"], dtype=np.int64) >= thresh)
        )

    def o_keys(b: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(b["o_orderdate"], pa.int64()))
        b = b.filter(pa.array(us >= _Q22_CUTOFF_US))
        return pa.table(
            {"custkey": pc.unique(pc.cast(b["o_custkey"], pa.int64()))}
        )

    no_orders = hash_join(
        _coal(cs).map_batches(qualify, batch_format="pyarrow"),
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            o_keys, batch_format="pyarrow"
        ),
        on="custkey",
        how="anti",
        schemas=(
            pa.schema([("custkey", pa.int64()), ("cntrycode", pa.int64()),
                       ("bal_c", pa.int64())]),
            pa.schema([("custkey", pa.int64())]),
        ),
    )
    agg = bounded_groupby_sum(
        no_orders, ["cntrycode"], sum_cols={"totbal_c": "bal_c"},
        count_alias="numcust",
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cntrycode": pc.cast(b["cntrycode"], pa.int64()),
                "numcust": b["numcust"],
                "totacctbal": pc.divide(
                    pc.cast(b["totbal_c"], pa.float64()), 100.0
                ),
            }
        )

    return _with_schema(
        agg.map_batches(finish, batch_format="pyarrow"), out_schema
    )


def _append_split(sf_dir: str) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Deterministic committed/incoming split of the documents table
    (doc_id % 10 < 8 = committed history, ≥ 8 = incoming batch) — the
    append-dedup queries' stand-in for a crawl increment.  The read is
    bundled so neither side's selective filter can empty a whole task's
    input (0-column block, executor schema warning)."""
    docs = _coal(_docs(sf_dir, ["doc_id", "text"]), max_rows=65_536)

    def side_filter(is_new: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = np.asarray(b["doc_id"], dtype=np.int64)
            m = pa.array(ids % 10 >= 8)
            return b.filter(m if is_new else pc.invert(m))

        return f

    return (
        docs.map_batches(side_filter(False), batch_format="pyarrow"),
        docs.map_batches(side_filter(True), batch_format="pyarrow"),
    )


def _q_append_dedup_exact(sf_dir: str):
    """Append-mode exact dedup against committed history
    (stages/incremental.py incremental_exact_keep), fingerprinting on
    the 200-char document prefix — the boilerplate/head dedup a crawl
    pipeline applies before full-content hashing.  Prefix slicing is
    code-unit based on the engine side and character based in the SQL
    mirror — identical on this ASCII corpus, documented divergence for
    non-ASCII."""
    from docling_api_ray.stages.incremental import incremental_exact_keep

    old, new = _append_split(sf_dir)

    def fp(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "fp": pc.utf8_slice_codeunits(
                    pc.fill_null(b["text"], ""), 0, 200
                ),
            }
        )

    return incremental_exact_keep(
        old.map_batches(fp, batch_format="pyarrow"),
        new.map_batches(fp, batch_format="pyarrow"),
        key_col="fp",
    )


def _q_append_dedup_indexed(sf_dir: str):
    """The index-backed append path (stages/incremental.py
    write_dedup_index + incremental_minhash_keep_indexed): the committed
    slice's dedup index (digest + minhash signature, one pass, ~0.5
    KB/doc) persists under /tmp, then the incoming slice dedups against
    the INDEX — committed text is never re-read or re-hashed.  Same
    oracle as ``append_dedup_minhash`` because the results must be
    identical."""
    from docling_api_ray.stages.incremental import (
        incremental_minhash_keep_indexed,
        write_dedup_index,
    )

    old, new = _append_split(sf_dir)
    index_dir = _persisted_index_dir(
        "dedup_index", sf_dir, lambda d: write_dedup_index(old, d)
    )
    return incremental_minhash_keep_indexed(index_dir, new, threshold=0.7)


def _q_knn_append(sf_dir: str):
    """Incremental ANN — the index-append shape completing the
    append-mode triad: incoming vectors (vec_id % 10 ≥ 8, the new crawl
    increment) are searched top-k against the COMMITTED corpus's IVF
    index (fixed coarse quantizer, nprobe pruning) — near-dup triage /
    link-to-existing before the increment is admitted.  The incoming
    batch is driver-held query state (bounded by the append, the same
    discipline as ``_query_vectors``); the committed side streams
    through the same ``ivf_knn`` bucket-pruned scan as ``knn_ivf``."""
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    m = ids % 10 >= 8
    qids = sorted(int(i) for i in ids[m])
    by_id = {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(ids[m], np.asarray(tbl["embedding"].to_pylist())[m])
    }
    qmat = np.stack([by_id[i] for i in qids])

    def committed(b: pa.Table) -> pa.Table:
        vid = np.asarray(b["vec_id"], dtype=np.int64)
        return b.filter(pa.array(vid % 10 < 8))

    return sim.ivf_knn(
        _emb(sf_dir, ["vec_id", "embedding"]).map_batches(
            committed, batch_format="pyarrow"
        ),
        qids,
        qmat,
        _fixed_centroids(),
        k=_KNN_K,
        nprobe=_IVF_NPROBE,
        exclude_self=False,
    ).select_columns(["query_id", "vec_id", "cosine", "rank"])


def _q_append_commit(sf_dir: str):
    """END-TO-END incremental-commit pipeline (pipelines/append.py
    run_append) — the production composition the append triad was built
    for: the corpus arrives as two successive increments ([0, 60%·n)
    then [60%·n, n)); each is triaged against the committed store's
    PERSISTED dedup index (exact digest + minhash signature — history
    text is never re-read or re-hashed), survivors are converted by the
    flagship pipeline and committed as resumable partitions, and the
    dedup index is appended between the two increments so the second
    sees the first as history.  The store builds once per process at
    commit time (the _persisted_index_dir contract, ADVICE r3); the
    query returns the committed (doc_id, append_id) table.  Reference
    contrast: service.py:101-104 converts uploads with no corpus state
    at all."""
    from docling_api_ray.pipelines.append import (
        committed_corpus_dataset,
        init_store,
        run_append,
    )

    docs = os.path.join(sf_dir, "documents.parquet")
    n = pq.read_metadata(docs).num_rows
    cut = (n * 6) // 10  # integer arithmetic, mirrored exactly in SQL

    def build(d: str) -> None:
        init_store(d)
        run_append(d, docs, 0, cut, npartitions=4)
        run_append(d, docs, cut, n, npartitions=4)

    store = _persisted_index_dir("append_store", sf_dir, build)
    ds = committed_corpus_dataset(store, columns=["doc_id", "append"])

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "append_id": pc.cast(b["append"], pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def _append_commit_oracle_sql(
    threshold: float = 0.7, num_perm: int = 64, bands: int = 16
) -> str:
    """Mirror of _q_append_commit: two sequential appends, each exact
    (full-text min-id; any history hit poisons the whole hash group)
    then minhash (drop on est ≥ th vs ANY committed doc regardless of
    id, or vs a smaller-id exact-survivor of the same increment — the
    _incremental_drops ∃-partner rule, which never consults the
    partner's own fate).  ``cand`` pairs carry left_id < right_id, so
    "smaller-id partner of e" = pairs with right_id = e."""
    return f"""
        WITH {_minhash_ctes(num_perm, bands)},
        pairs AS (SELECT left_id, right_id FROM cand
                  WHERE est_jaccard >= {threshold}),
        cut AS (SELECT (count(*) * 6) // 10 AS c FROM documents),
        a AS (SELECT doc_id, text FROM documents
              WHERE doc_id < (SELECT c FROM cut)),
        a_exact AS (SELECT min(doc_id) AS doc_id FROM a GROUP BY text),
        a_kept AS (
          SELECT e.doc_id FROM a_exact e
          WHERE NOT EXISTS (
            SELECT 1 FROM pairs p
            WHERE p.right_id = e.doc_id
              AND p.left_id IN (SELECT doc_id FROM a_exact))),
        a_kept_docs AS (
          SELECT d.doc_id, d.text FROM documents d
          JOIN a_kept k USING (doc_id)),
        b AS (SELECT doc_id, text FROM documents
              WHERE doc_id >= (SELECT c FROM cut)),
        b_ex AS (
          SELECT b.doc_id, b.text FROM b
          WHERE NOT EXISTS (
            SELECT 1 FROM a_kept_docs k WHERE k.text = b.text)),
        b_exact AS (SELECT min(doc_id) AS doc_id FROM b_ex GROUP BY text),
        b_kept AS (
          SELECT e.doc_id FROM b_exact e
          WHERE NOT EXISTS (
            SELECT 1 FROM pairs p
            WHERE (p.right_id = e.doc_id
                   AND (p.left_id IN (SELECT doc_id FROM a_kept)
                        OR p.left_id IN (SELECT doc_id FROM b_exact)))
               OR (p.left_id = e.doc_id
                   AND p.right_id IN (SELECT doc_id FROM a_kept))))
        SELECT doc_id, CAST(0 AS BIGINT) AS append_id FROM a_kept
        UNION ALL
        SELECT doc_id, CAST(1 AS BIGINT) AS append_id FROM b_kept
    """


def _q_append_dedup_minhash(sf_dir: str):
    """Append-mode NEAR-dup dedup against committed history
    (stages/incremental.py incremental_minhash_keep): same seeded
    MinHash/LSH arithmetic as ``dedup_minhash`` (bit-exact SQL mirror
    via the shared cand CTE), but candidate generation skips every
    bucket without an incoming member — the committed corpus never
    pays old×old work on an append."""
    from docling_api_ray.stages.incremental import incremental_minhash_keep

    old, new = _append_split(sf_dir)
    return incremental_minhash_keep(old, new, threshold=0.7)


def _q_random_projection(sf_dir: str):
    """Sparse-sign Johnson-Lindenstrauss projection (stages/linalg.py
    random_projection): per-batch int64 matmul against the content-
    addressed ±1 sign matrix — zero shuffle, exact integer arithmetic
    the oracle mirrors with an embedded VALUES sign table."""
    from docling_api_ray.stages.linalg import random_projection

    return random_projection(_emb(sf_dir, ["vec_id", "embedding"]), out_dim=8)


def _q_pca_project(sf_dir: str):
    """Top-4 PCA projection (stages/linalg.py pca_project): one bounded
    moment fold (dim²+dim+1 integer rows) → driver-side eigh on the
    64×64 covariance → broadcast projection map.  Eigen is not
    SQL-expressible; pinned by tests/test_linalg.py against a one-shot
    numpy PCA of the same rows."""
    from docling_api_ray.stages.linalg import pca_project

    return pca_project(_emb(sf_dir, ["vec_id", "embedding"]), k=4)


_INTERVAL_W_S = 21_600  # 6 h trailing window


def _q_interval_join(sf_dir: str):
    """Range join (stages/joins.py interval_join_events): each purchase
    with the count + quantized value-sum of the same user's clicks in
    the trailing 6 h window — bucketed-replication co-group, rights
    shipped exactly twice, vectorized searchsorted probe."""
    from docling_api_ray.stages.joins import interval_join_events

    ds = _read(
        sf_dir, "events", ["event_id", "user_id", "event_type", "ts", "value"]
    )
    return interval_join_events(
        ds, left_type="purchase", right_type="click", window_s=_INTERVAL_W_S
    )


def _q_edit_distance_pairs(sf_dir: str):
    """Prefix-blocked Levenshtein verification tier (stages/editdist.py):
    exact edit distance over 120-char heads for every 16-char-prefix
    block pair — the ground-truth scorer behind the MinHash/SimHash
    approximations, confined to blocks like ngram_jaccard_pairs."""
    from docling_api_ray.stages.editdist import edit_distance_pairs

    return edit_distance_pairs(
        _docs(sf_dir, ["doc_id", "text"]), prefix_len=16, cap=120
    )


def _q_rouge_pairs(sf_dir: str):
    """Prefix-blocked word-level ROUGE-L verification tier
    (stages/editdist.py rouge_l_pairs): exact LCS F-measure for every
    16-char-prefix block pair — the sequence-aware dup signal next to
    edit_distance_pairs.  Rows-only (SQL cannot express LCS); pinned
    by a pure-python DP reference in test_stats_relevance.py."""
    from docling_api_ray.stages.editdist import rouge_l_pairs

    return rouge_l_pairs(
        _docs(sf_dir, ["doc_id", "text"]), prefix_len=16, cap_words=200
    )


def _q_customer_running_total(sf_dir: str):
    """Per-customer cumulative revenue (stages/windows.py
    grouped_running_total): SUM OVER (PARTITION BY custkey ORDER BY
    date, orderkey) via one key-mod-P co-group + vectorized cumsum."""
    from docling_api_ray.stages.windows import grouped_running_total

    ds = _read(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
    )
    return grouped_running_total(
        ds,
        key="o_custkey",
        order=["o_orderdate", "o_orderkey"],
        val="o_totalprice",
    )


def _q_pagerank_neardup(sf_dir: str):
    """PageRank centrality over the MinHash near-dup candidate graph
    (stages/graph.py): the canonical-copy selection signal — one
    component-labeling pass + one component co-group, ALL damping
    iterations vectorized in-partition (no per-iteration shuffle).
    Integer micro-unit spec mirrored exactly by the unrolled SQL."""
    from docling_api_ray.stages.graph import pagerank

    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.7)
    return pagerank(_docs(sf_dir, ["doc_id"]), pairs, iters=3)


def _q_ridge_predict(sf_dir: str):
    """Closed-form distributed ridge regression of ``label`` on the
    embedding column (stages/linalg.py ridge_fit/ridge_predict): ONE
    exact integer sufficient-statistics fold (dim²+2·dim+2 rows) →
    driver-side normal-equation solve → stateless scoring pass.  Matrix
    solve is not SQL-expressible; pinned against one-shot numpy in
    tests/test_linalg.py."""
    from docling_api_ray.stages.linalg import ridge_predict

    return ridge_predict(
        _emb(sf_dir, ["vec_id", "embedding", "label"]), lam=1.0
    )


def _q_triangle_neardup(sf_dir: str):
    """Per-document triangle count + degree over the MinHash near-dup
    candidate graph (stages/graph.py triangle_counts): the
    cluster-cohesion signal — a doc whose neighbors also pair with each
    other sits inside a tight template cluster; a high-degree
    zero-triangle doc is a boilerplate bridge.  Reuses pagerank's
    component co-group; the wedge join is degree-oriented (compact
    forward), so triangles are each generated once and the in-partition
    candidate set is m^1.5-bounded."""
    from docling_api_ray.stages.graph import triangle_counts

    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.7)
    return triangle_counts(_docs(sf_dir, ["doc_id"]), pairs)


def _q_cube_counts(sf_dir: str):
    """GROUP BY CUBE(source, lang) counts + char totals: all four
    grouping sets derived from the ONE bounded leaf aggregate
    (|sources|x|langs| rows, corpus-independent) in a single-block pass
    — the corpus is scanned exactly once, same plan as rollup_counts
    with the missing (lang) set added.  '<all>' sentinels replace the
    SQL NULLs."""
    import pandas as pd

    leaf = bounded_groupby_sum(
        _docs(sf_dir, ["source", "lang", "n_chars"]),
        ["source", "lang"],
        sum_cols={"chars_total": "n_chars"},
        count_alias="n_docs",
    )

    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("lang", pa.string()),
            ("n_docs", pa.int64()),
            ("chars_total", pa.int64()),
        ]
    )

    def cube(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        cols = ["source", "lang", "n_docs", "chars_total"]
        vals = ["n_docs", "chars_total"]
        by_src = (
            df.groupby("source", as_index=False)[vals]
            .sum()
            .assign(lang="<all>")
        )
        by_lang = (
            df.groupby("lang", as_index=False)[vals]
            .sum()
            .assign(source="<all>")
        )
        total = pd.DataFrame(
            {
                "source": ["<all>"],
                "lang": ["<all>"],
                "n_docs": [df["n_docs"].sum()],
                "chars_total": [df["chars_total"].sum()],
            }
        )
        out = pd.concat(
            [df[cols], by_src[cols], by_lang[cols], total[cols]],
            ignore_index=True,
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(out_schema)

    return leaf.map_batches(cube, batch_format="pyarrow", batch_size=None)


def _q_source_ntile(sf_dir: str):
    """Exact SQL NTILE(4) per source over (n_chars, doc_id) order
    (stages/stats.py grouped_ntile): equal-population quality-band
    assignment with SQL's remainder rule — one bounded (source x
    n_chars) histogram broadcast + one minimal-payload tie exchange, no
    corpus-wide sort."""
    from docling_api_ray.stages.stats import grouped_ntile

    return grouped_ntile(
        _docs(sf_dir, ["doc_id", "source", "n_chars"]), tiles=4
    )


def _q_pareto_frontier(sf_dir: str):
    """Pareto frontier over (n_words, quality logit) — the documents no
    other doc beats on BOTH length and classifier quality
    (stages/selection.py skyline_max2).  The skyline fold is
    associative + idempotent, so the whole operator is one
    two_level_fold: zero shuffle, zero driver state; exact float
    compare holds because the logit is quantized to 1e-6 before
    folding (same contract as quality_logit)."""
    from docling_api_ray.stages.selection import skyline_max2

    def scored(b: pa.Table) -> pa.Table:
        qs = ta.quality_scores(b)
        lg = ta.quality_logit(qs)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_words": qs["n_words"],
                "logit": lg["logit"],
            }
        )

    return skyline_max2(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            scored, batch_format="pyarrow"
        ),
        x_col="n_words",
        y_col="logit",
    )


def _q_feature_corr(sf_dir: str):
    """Pearson correlation matrix over the four raw text-count features
    (stages/stats.py feature_corr): one 15-row integer moment fold, the
    correlations computed from exact unbounded-int sufficient stats with
    one deterministic float expression per pair."""
    from docling_api_ray.stages.stats import feature_corr

    return feature_corr(_docs(sf_dir, ["doc_id", "text"]))


_TOPTERM_K = 8  # kmeans clusters
_TOPTERM_TOP = 5


def _q_cluster_topterms(sf_dir: str):
    """Topic keywords per embedding cluster (BERTopic's c-TF-IDF shape):
    exact-integer k-means assignment joined to document text, per-
    (cluster, word) counts co-grouped by WORD so each word's cluster-df
    is decided locally, integer discriminative score
    n·⌊ln(K/df)·1e6+0.5⌋, per-cluster top-5 by (score desc, word asc)
    via partial heads + one bounded merge.  Everything after the join
    is narrow (cluster, word, n) rows."""
    from docling_api_ray.stages.clustering import kmeans_assign
    from docling_api_ray.stages.dedup import _cogrouped
    from docling_api_ray.stages.joins import hash_join

    K = _TOPTERM_K
    assign = _rename_inline(
        kmeans_assign(_emb(sf_dir, ["vec_id", "embedding"]), k=K, iters=2),
        {"vec_id": "doc_id"},
    ).select_columns(["doc_id", "cluster"])
    joined = hash_join(
        assign,
        _docs(sf_dir, ["doc_id", "text"]),
        on="doc_id",
        schemas=(
            pa.schema([("doc_id", pa.int64()), ("cluster", pa.int64())]),
            pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        ),
    )

    cw_schema = pa.schema(
        [("word", pa.string()), ("cluster", pa.int64()), ("n", pa.int64()),
         ("__ckey", pa.int64())]
    )

    def cluster_word_counts(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return cw_schema.empty_table()
        col = b["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.split_pattern(pc.fill_null(col, ""), " ")
        flat = np.asarray(pc.list_flatten(words), dtype=object)
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        cl = np.repeat(
            np.asarray(b["cluster"], dtype=np.int64), lens
        )
        keep = flat != ""
        flat, cl = flat[keep], cl[keep]
        if len(flat) == 0:
            return cw_schema.empty_table()
        wu, wi = np.unique(flat, return_inverse=True)
        cnt = np.bincount(wi * K + cl, minlength=len(wu) * K)
        nz = np.nonzero(cnt)[0]
        w_out = wu[nz // K]
        from docling_api_ray.functions.hashing import u64_md5

        ck = (u64_md5(w_out) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(
            np.int64
        )
        return pa.table(
            {
                "word": pa.array(w_out.tolist(), type=pa.string()),
                "cluster": pa.array((nz % K).astype(np.int64)),
                "n": pa.array(cnt[nz].astype(np.int64)),
                "__ckey": pa.array(ck, type=pa.int64()),
            }
        )

    ilog = {
        df: math.floor(math.log(K / df) * 1e6 + 0.5) for df in range(1, K + 1)
    }

    sc_schema = pa.schema(
        [("cluster", pa.int64()), ("word", pa.string()), ("n", pa.int64()),
         ("score_micro", pa.int64())]
    )

    def score_fold(df: "pd.DataFrame") -> pa.Table:
        import pandas as pd

        if len(df) == 0:
            return sc_schema.empty_table()
        g = (
            df.groupby(["word", "cluster"], sort=False)["n"].sum().reset_index()
        )
        dfw = g.groupby("word", sort=False)["cluster"].transform("size")
        score = g["n"].to_numpy(np.int64) * np.array(
            [ilog[int(d)] for d in dfw.to_numpy()], dtype=np.int64
        )
        out = pd.DataFrame(
            {
                "cluster": g["cluster"].to_numpy(np.int64),
                "word": g["word"].to_numpy(object),
                "n": g["n"].to_numpy(np.int64),
                "score_micro": score,
            }
        )
        # per-partition head: each partition holds every cluster row of
        # its words, so a (cluster, score, word) head of TOP per cluster
        # is a superset filter for the global per-cluster top
        out = out.sort_values(
            ["cluster", "score_micro", "word"],
            ascending=[True, False, True],
            kind="stable",
        )
        out = out.groupby("cluster", sort=False).head(_TOPTERM_TOP)
        return pa.Table.from_pandas(out, preserve_index=False).cast(sc_schema)

    def final_head(b: pa.Table) -> pa.Table:
        import pandas as pd

        if len(b) == 0:
            return sc_schema.empty_table()
        df = b.to_pandas().sort_values(
            ["cluster", "score_micro", "word"],
            ascending=[True, False, True],
            kind="stable",
        )
        df = df.groupby("cluster", sort=False).head(_TOPTERM_TOP)
        return pa.Table.from_pandas(df, preserve_index=False).cast(sc_schema)

    return (
        _cogrouped(
            joined.map_batches(cluster_word_counts, batch_format="pyarrow"),
            "__ckey",
            coalesce=True,
        )
        .map_groups(score_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(final_head, batch_format="pyarrow", batch_size=None)
    )


_VOCAB_GROWTH_BUCKET = 50


_CCNET_OFF = 10**9  # micro-logprob offset making the // numerator >= 0


def _q_unpivot_stats(sf_dir: str):
    """UNPIVOT/melt: the wide per-doc feature row folded to long
    (doc_id, feature, value) — the schema op feeding generic
    per-feature aggregations; stateless vectorized repeat/tile, no
    shuffle."""
    feats = ("n_chars", "n_words", "n_punct", "n_stop")

    def melt(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("feature", pa.string()),
                 ("value", pa.int64())]
            ).empty_table()
        t = b["text"]
        cols = [
            np.asarray(pc.utf8_length(t), dtype=np.int64),
            np.asarray(ta._count(t, ta.WS_TOKEN_RE), dtype=np.int64),
            np.asarray(ta._count(t, ta.PUNCT_RE), dtype=np.int64),
            np.asarray(ta._count(t, ta.STOPWORD_RE), dtype=np.int64),
        ]
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.tile(ids, len(feats)), type=pa.int64()),
                "feature": pa.array(
                    np.repeat(np.asarray(feats, dtype=object), len(b)
                              ).tolist(),
                    type=pa.string(),
                ),
                "value": pa.array(
                    np.concatenate(cols), type=pa.int64()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        melt, batch_format="pyarrow"
    )


def _q_ccnet_buckets(sf_dir: str):
    """CCNet's head/middle/tail perplexity bucketing per language: each
    document's char-bigram LM average log-prob (integer micro metric,
    offset +1e9 so floor-division == DuckDB's truncating ``//``),
    per-lang tercile thresholds via exact percentile_disc, bucket by
    threshold compare (ties share a bucket).  Docs with zero bigram
    pairs are excluded (CCNet drops empties).  One LM train pass + one
    scoring pass + one narrow lang join + a |langs|-bounded threshold
    fold + a stateless assign."""
    from docling_api_ray.stages.charlm import charlm_scores
    from docling_api_ray.stages.joins import hash_join
    from docling_api_ray.stages.stats import grouped_int_quantiles

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])
    scored = charlm_scores(docs)

    met_schema = pa.schema(
        [("doc_id", pa.int64()), ("metric_micro", pa.int64())]
    )

    def metric(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return met_schema.empty_table()
        n = np.asarray(b["n_pairs"], dtype=np.int64)
        lp = np.asarray(b["lp_micro"], dtype=np.int64)
        keep = n > 0
        n, lp, ids = n[keep], lp[keep], np.asarray(
            b["doc_id"], dtype=np.int64
        )[keep]
        m = (lp + _CCNET_OFF * n) // n  # nonneg numerator: floor==trunc
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "metric_micro": pa.array(m, type=pa.int64()),
            }
        )

    mets = hash_join(
        scored.map_batches(metric, batch_format="pyarrow"),
        docs.select_columns(["doc_id", "lang"]),
        on="doc_id",
        schemas=(
            met_schema,
            pa.schema([("doc_id", pa.int64()), ("lang", pa.string())]),
        ),
    ).materialize()  # narrow rows, consumed twice (thresholds + assign)

    th_rows = grouped_int_quantiles(
        mets, group_col="lang", value_col="metric_micro",
        quantiles=(0.33, 0.67),
    ).take_all()  # |langs| rows
    th = {r["lang"]: (int(r["p33"]), int(r["p67"])) for r in th_rows}
    tref = ray.put(th)

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("metric_micro", pa.int64()),
            ("bucket", pa.string()),
        ]
    )

    def assign(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        t = ray.get(tref)
        m = np.asarray(b["metric_micro"], dtype=np.int64)
        langs = np.asarray(b["lang"].to_pylist(), dtype=object)
        t33 = np.array([t[l][0] for l in langs], dtype=np.int64)
        t67 = np.array([t[l][1] for l in langs], dtype=np.int64)
        bucket = np.where(m > t67, "head", np.where(m > t33, "middle", "tail"))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "metric_micro": b["metric_micro"],
                "bucket": pa.array(bucket.tolist(), type=pa.string()),
            }
        )

    return mets.map_batches(assign, batch_format="pyarrow")


def _q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth curve: number of NEW distinct words
    first introduced in each ``doc_id``-bucket of 50 documents — the
    corpus-saturation diagnostic (a flattening curve says more data
    adds no new vocabulary).  Per-batch distinct (word, min doc_id)
    partials co-group by word hash (each word's global first
    occurrence decided locally), then a bucket-bounded count fold."""
    from docling_api_ray.stages.common import bounded_groupby_sum
    from docling_api_ray.stages.dedup import _cogrouped

    pair_schema = pa.schema(
        [("word", pa.string()), ("fd", pa.int64()), ("__ckey", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pair_schema.empty_table()
        col = b["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.split_pattern(pc.fill_null(col, ""), " ")
        flat = np.asarray(pc.list_flatten(words), dtype=object)
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        ids = np.repeat(np.asarray(b["doc_id"], dtype=np.int64), lens)
        keep = flat != ""
        flat, ids = flat[keep], ids[keep]
        if len(flat) == 0:
            return pair_schema.empty_table()
        uniq, inv = np.unique(flat, return_inverse=True)
        fd = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(fd, inv, ids)
        from docling_api_ray.functions.hashing import u64_md5

        ck = (u64_md5(uniq) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        return pa.table(
            {
                "word": pa.array(uniq.tolist(), type=pa.string()),
                "fd": pa.array(fd, type=pa.int64()),
                "__ckey": pa.array(ck, type=pa.int64()),
            }
        )

    bucket_schema = pa.schema(
        [("bucket", pa.int64()), ("new_words", pa.int64())]
    )

    def bucket_fold(df) -> pa.Table:
        if len(df) == 0:
            return bucket_schema.empty_table()
        g = df.groupby("word", sort=False)["fd"].min()
        bucket = (g.to_numpy(np.int64) // _VOCAB_GROWTH_BUCKET)
        u, c = np.unique(bucket, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(u, type=pa.int64()),
                "new_words": pa.array(c.astype(np.int64)),
            }
        )

    return bounded_groupby_sum(
        _cogrouped(
            _docs(sf_dir, ["doc_id", "text"]).map_batches(
                partial, batch_format="pyarrow"
            ),
            "__ckey",
            coalesce=True,
        ).map_groups(bucket_fold, batch_format="pandas"),
        ["bucket"],
        sum_cols={"new_words": "new_words"},
    )


def _q_lang_agreement(sf_dir: str):
    """Label-noise audit: agreement matrix between the corpus ``lang``
    label and the heuristic lang_id prediction — |langs|²-bounded
    confusion fold over one stateless scoring pass (the curation check
    run before trusting either signal)."""
    from docling_api_ray.stages.common import bounded_groupby_sum

    conf_schema = pa.schema(
        [("lang", pa.string()), ("pred", pa.string()), ("n", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return conf_schema.empty_table()
        pred = np.asarray(
            ta.lang_id(b)["predicted_lang"].to_pylist(), dtype=object
        )
        true = np.asarray(b["lang"].to_pylist(), dtype=object)
        tu, ti = np.unique(true, return_inverse=True)
        pu, pi = np.unique(pred, return_inverse=True)
        cnt = np.bincount(ti * len(pu) + pi, minlength=len(tu) * len(pu))
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "lang": pa.array(tu[nz // len(pu)].tolist(), type=pa.string()),
                "pred": pa.array(pu[nz % len(pu)].tolist(), type=pa.string()),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    return bounded_groupby_sum(
        _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["lang", "pred"],
        sum_cols={"n": "n"},
    )


def _q_lang_kappa(sf_dir: str):
    """Cohen's kappa over the lang_agreement confusion matrix — the
    chance-corrected scalar the agreement AUDIT needs before trusting
    either label source (Cohen 1960).  Composes the existing
    |langs|²-bounded confusion fold with a one-block kappa fit:
    po/pe from exact integer marginals, fixed float op order the
    mirror replays, ⌊x·1e6+½⌋ quantize."""

    kap_schema = pa.schema(
        [
            ("n_docs", pa.int64()),
            ("po", pa.float64()),
            ("pe", pa.float64()),
            ("kappa", pa.float64()),
        ]
    )

    def fit(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return kap_schema.empty_table()
        lang = t["lang"].to_pylist()
        pred = t["pred"].to_pylist()
        n = t["n"].to_pylist()
        tot = sum(int(v) for v in n)
        diag = sum(int(v) for lg, pr, v in zip(lang, pred, n) if lg == pr)
        row: dict[str, int] = {}
        col: dict[str, int] = {}
        for lg, pr, v in zip(lang, pred, n):
            row[lg] = row.get(lg, 0) + int(v)
            col[pr] = col.get(pr, 0) + int(v)
        s = sum(r * col[lg] for lg, r in row.items() if lg in col)
        po_raw = float(diag) / float(tot) if tot > 0 else 0.0
        pe_raw = (
            float(s) / (float(tot) * float(tot)) if tot > 0 else 0.0
        )
        kappa_raw = (
            (po_raw - pe_raw) / (1.0 - pe_raw) if pe_raw < 1.0 else 0.0
        )
        q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "n_docs": pa.array([tot], type=pa.int64()),
                "po": pa.array([q6(po_raw)], type=pa.float64()),
                "pe": pa.array([q6(pe_raw)], type=pa.float64()),
                "kappa": pa.array([q6(kappa_raw)], type=pa.float64()),
            }
        )

    return (
        _q_lang_agreement(sf_dir)
        .repartition(1)
        .map_batches(fit, batch_format="pyarrow", batch_size=None)
    )


def _q_conformal_gate(sf_dir: str):
    """Split-conformal acceptance gate over the quality classifier
    (stages/stats.py conformal_gate): even doc_ids with lang='en' are
    the positive calibration set, q = ⌈(n+1)·0.9⌉-th smallest
    nonconformity 1e6−prob_micro; reports odd-doc coverage (≥0.9 in
    expectation) and corpus accept rate — the distribution-free
    uncertainty wrapper before thresholding on the classifier."""
    from docling_api_ray.stages.stats import conformal_gate

    def scored(b: pa.Table) -> pa.Table:
        lg = ta.quality_logit(ta.quality_scores(b))
        prob = np.asarray(lg["prob"], dtype=np.float64)
        lang = np.asarray(b["lang"])
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        return pa.table(
            {
                "prob_micro": pa.array(
                    np.rint(prob * 1e6).astype(np.int64), type=pa.int64()
                ),
                "pos": pa.array(
                    (lang == "en").astype(np.int64), type=pa.int64()
                ),
                "cal": pa.array(
                    (ids % 2 == 0).astype(np.int64), type=pa.int64()
                ),
            }
        )

    return conformal_gate(
        _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
            scored, batch_format="pyarrow"
        ),
        alpha=0.1,
    )


def _q_ht_estimate(sf_dir: str):
    """Priority-sampling Horvitz-Thompson total estimate of Σ n_chars
    from the deterministic bottom-100 weighted sample (stages/splits.py
    ht_estimate) — the self-verifying sampling eval reporting the
    relative error against the exact total computed alongside."""
    from docling_api_ray.stages.splits import ht_estimate

    return ht_estimate(
        _docs(sf_dir, ["doc_id", "n_chars"]),
        id_col="doc_id", value_col="n_chars", k=100,
    )


_SHARDS = 8


def _q_shard_assign(sf_dir: str):
    """Size-balanced export sharding: docs ranked by (n_chars DESC,
    doc_id) snake-assigned to 8 shards — rank r → s = (r−1) mod 16,
    shard = s if s < 8 else 15−s — the boustrophedon round that keeps
    per-shard byte totals within one doc of each other without any
    bin-packing state.  Rides global_rank's histogram + tie-exchange
    machinery (no global sort); the shard formula is one vectorized
    pass the mirror spells identically."""
    from docling_api_ray.stages.stats import global_rank

    ranked = global_rank(
        _docs(sf_dir, ["doc_id", "n_chars"]),
        value_col="n_chars", id_col="doc_id",
    )

    def assign(b: pa.Table) -> pa.Table:
        r = np.asarray(b["doc_rank"], dtype=np.int64)
        s = (r - 1) % (2 * _SHARDS)
        shard = np.where(s < _SHARDS, s, 2 * _SHARDS - 1 - s)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "doc_rank": b["doc_rank"],
                "shard": pa.array(shard, type=pa.int64()),
            }
        )

    return ranked.map_batches(assign, batch_format="pyarrow")


def _q_compression_ratio(sf_dir: str):
    """zlib compression-ratio quality signal (stages/text_analysis.py
    compression_ratio) — repetitive template text compresses far below
    natural prose.  Rows-only (no SQL zlib); pinned by a direct zlib
    reference test."""
    from docling_api_ray.stages.text_analysis import compression_ratio

    return compression_ratio(_docs(sf_dir, ["doc_id", "text"]))


def _q_label_centroid_dist(sf_dir: str):
    """Pairwise L2 distance between per-label mean embeddings
    (stages/clustering.py label_centroid_dist) — the linear-MMD
    class-separation readout; integer micro sums cleared of
    denominators so one sqrt + two divisions are the only floats."""
    from docling_api_ray.stages.clustering import label_centroid_dist

    return label_centroid_dist(_emb(sf_dir, ["vec_id", "embedding", "label"]))


def _q_markov_eval(sf_dir: str):
    """Held-out next-event prediction eval for the session Markov
    chain: train the (from→to) transition matrix on EVEN user_ids,
    predict argmax-next (ties to the lexicographically smallest type),
    score accuracy on ODD users' transitions — the sequence-model
    sibling of nbayes_confusion's text eval.  Both matrices are
    |types|²-bounded session_transitions folds; the eval is pure
    bounded-table arithmetic (test rows with an unseen from_type count
    as misses)."""
    from docling_api_ray.stages.windows import session_transitions

    def _parity(keep_even: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = np.asarray(b["user_id"], dtype=np.int64)
            mask = (ids % 2 == 0) if keep_even else (ids % 2 == 1)
            return b.filter(pa.array(mask))

        return f

    cols = ["event_id", "user_id", "event_type", "ts"]
    tr = session_transitions(
        _read(sf_dir, "events", cols).map_batches(
            _parity(True), batch_format="pyarrow"
        )
    ).take_all()  # ≤ |types|² rows
    te = session_transitions(
        _read(sf_dir, "events", cols).map_batches(
            _parity(False), batch_format="pyarrow"
        )
    ).take_all()  # ≤ |types|² rows
    best: dict[str, tuple[int, str]] = {}
    for r in tr:
        cand = (-int(r["n_trans"]), r["to_type"])
        if r["from_type"] not in best or cand < best[r["from_type"]]:
            best[r["from_type"]] = cand
    pred = {f: t for f, (_, t) in best.items()}
    n_train = sum(int(r["n_trans"]) for r in tr)
    n_test = sum(int(r["n_trans"]) for r in te)
    hits = sum(
        int(r["n_trans"])
        for r in te
        if pred.get(r["from_type"]) == r["to_type"]
    )
    acc = float(hits) / float(n_test) if n_test > 0 else 0.0
    return pa.table(
        {
            "n_train": pa.array([n_train], type=pa.int64()),
            "n_test": pa.array([n_test], type=pa.int64()),
            "accuracy": pa.array([acc], type=pa.float64()),
        }
    )


_KANON_K = 5
_KANON_BUCKET = 100


def _q_k_anonymity(sf_dir: str):
    """k-anonymity audit (stages/stats.py k_anonymity): equivalence
    classes over (source, lang, ⌊n_chars/100⌋), k=5 — the
    quasi-identifier re-identification readout next to pii_redact's
    direct-identifier removal.  One bounded cube-class fold."""
    from docling_api_ray.stages.stats import k_anonymity

    return k_anonymity(
        _docs(sf_dir, ["source", "lang", "n_chars"]),
        quasi_cols=("source", "lang"),
        bucket_col="n_chars",
        bucket_width=_KANON_BUCKET,
        k=_KANON_K,
    )


def _q_l_diversity(sf_dir: str):
    """Distinct l-diversity audit (stages/stats.py l_diversity): the
    k-anonymity companion — per (source, length-bucket) class, the
    distinct-lang count; classes with one language leak it regardless
    of size.  One bounded (class × sensitive) fold."""
    from docling_api_ray.stages.stats import l_diversity

    return l_diversity(
        _docs(sf_dir, ["source", "lang", "n_chars"]),
        quasi_cols=("source",),
        bucket_col="n_chars",
        bucket_width=_KANON_BUCKET,
        sensitive_col="lang",
        l=2,
    )


def _q_trimmed_mean(sf_dir: str):
    """Exact 10%-trimmed mean of n_chars per source (stages/stats.py
    grouped_trimmed_mean): drop ⌊0.1·n⌋ rows each side, average the
    rest — from ONE bounded (source × value) histogram with integer
    partial-tie arithmetic, no global sort."""
    from docling_api_ray.stages.stats import grouped_trimmed_mean

    return grouped_trimmed_mean(
        _docs(sf_dir, ["source", "n_chars"]),
        group_col="source", value_col="n_chars", trim_frac=0.1,
    )


def _q_knn_mrr(sf_dir: str):
    """Mean-reciprocal-rank retrieval eval (stages/similarity.py
    knn_mrr): held-out queries, first same-label neighbor rank within
    top-k, integer micro reporting; same bounded-eval shape as
    knn_label_vote."""
    return sim.knn_mrr(
        _emb(sf_dir, ["vec_id", "embedding", "label"]),
        sample_mod=_VOTE_MOD,
        k=_VOTE_K,
    )


def _q_corpus_card(sf_dir: str):
    """One-row corpus health card — the summary a curation run
    publishes next to a dataset release: doc/token/char totals,
    source/lang cardinalities, exact distinct-content count (the
    dedup-summary co-group), and the floor-quantized duplicate ratio.
    Every number is an integer fold; the only float is the final
    ratio."""
    from docling_api_ray.stages.common import bounded_groupby_sum
    from docling_api_ray.stages.dedup import exact_dedup

    docs = _docs(sf_dir, ["doc_id", "text", "source", "lang", "n_chars"])

    tot_schema = pa.schema(
        [("n_docs", pa.int64()), ("n_tokens", pa.int64()),
         ("n_chars", pa.int64())]
    )

    def totals(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return tot_schema.empty_table()
        toks = int(
            np.asarray(
                ta._count(b["text"], ta.WS_TOKEN_RE), dtype=np.int64
            ).sum()
        )
        return pa.table(
            {
                "n_docs": pa.array([len(b)], type=pa.int64()),
                "n_tokens": pa.array([toks], type=pa.int64()),
                "n_chars": pa.array(
                    [int(np.asarray(b["n_chars"], dtype=np.int64).sum())],
                    type=pa.int64(),
                ),
            }
        )

    n_docs = n_tokens = n_chars = 0
    for blk in docs.map_batches(totals, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        # every row of every bundle (the iter_batches bundling rule)
        n_docs += int(pc.sum(blk["n_docs"]).as_py() or 0)
        n_tokens += int(pc.sum(blk["n_tokens"]).as_py() or 0)
        n_chars += int(pc.sum(blk["n_chars"]).as_py() or 0)

    n_sources = bounded_groupby_sum(
        docs.select_columns(["source"]), ["source"], count_alias="n"
    ).count()
    n_langs = bounded_groupby_sum(
        docs.select_columns(["lang"]), ["lang"], count_alias="n"
    ).count()
    n_distinct = exact_dedup(docs).count()  # one digest co-group

    dup_ratio = (
        math.floor((n_docs - n_distinct) / n_docs * 1e6 + 0.5) / 1e6
        if n_docs
        else 0.0
    )
    return pa.table(
        {
            "n_docs": pa.array([n_docs], type=pa.int64()),
            "n_tokens": pa.array([n_tokens], type=pa.int64()),
            "n_chars": pa.array([n_chars], type=pa.int64()),
            "n_sources": pa.array([n_sources], type=pa.int64()),
            "n_langs": pa.array([n_langs], type=pa.int64()),
            "n_distinct": pa.array([n_distinct], type=pa.int64()),
            "dup_ratio": pa.array([dup_ratio], type=pa.float64()),
        }
    )


def _q_user_diversity(sf_dir: str):
    """Per-user event-type diversity: distinct types + Shannon entropy
    (stages/windows.py user_event_diversity): grouped_entropy's
    integer micro-ln discipline in the unbounded-key regime — one
    user-mod-P co-group of pre-folded (user, type, n) rows."""
    from docling_api_ray.stages.windows import user_event_diversity

    return user_event_diversity(
        _read(sf_dir, "events", ["user_id", "event_type"])
    )


_GRID_QS = tuple(i / 10 for i in range(1, 10))  # deciles .1 .. .9


def _q_length_quality_grid(sf_dir: str):
    """2-D decile density grid over (n_chars, n_words) — the joint
    length×wordiness histogram a curriculum design reads before binning.
    Exact percentile_disc decile thresholds per axis (threshold
    semantics, ties share a bucket — no tie exchange), then one
    |10×10|-bounded count fold; every step integer-exact."""
    from docling_api_ray.stages.common import bounded_groupby_sum
    from docling_api_ray.stages.stats import grouped_int_quantiles

    def feats(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "g": pa.array(["all"] * len(b), type=pa.string()),
                "n_chars": pc.cast(b["n_chars"], pa.int64()),
                "n_words": pa.array(
                    np.asarray(
                        ta._count(b["text"], ta.WS_TOKEN_RE), dtype=np.int64
                    )
                ),
            }
        )

    docs = (
        _docs(sf_dir, ["doc_id", "text", "n_chars"])
        .map_batches(feats, batch_format="pyarrow")
        .materialize()  # narrow 3-col rows, consumed 3x (2 thresholds + grid)
    )
    th = {}
    for col in ("n_chars", "n_words"):
        rows = grouped_int_quantiles(
            docs, group_col="g", value_col=col, quantiles=_GRID_QS
        ).take_all()  # one row
        th[col] = np.asarray(
            [rows[0][f"p{int(q * 100)}"] for q in _GRID_QS], dtype=np.int64
        )
    tref = ray.put(th)

    grid_schema = pa.schema(
        [
            ("len_decile", pa.int64()),
            ("words_decile", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def assign(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return grid_schema.empty_table()
        t = ray.get(tref)
        lc = 1 + np.searchsorted(
            t["n_chars"], np.asarray(b["n_chars"], dtype=np.int64),
            side="left",
        )
        wc = 1 + np.searchsorted(
            t["n_words"], np.asarray(b["n_words"], dtype=np.int64),
            side="left",
        )
        cnt = np.bincount((lc - 1) * 10 + (wc - 1), minlength=100)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "len_decile": pa.array(nz // 10 + 1, type=pa.int64()),
                "words_decile": pa.array(nz % 10 + 1, type=pa.int64()),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    return bounded_groupby_sum(
        docs.map_batches(assign, batch_format="pyarrow"),
        ["len_decile", "words_decile"],
        sum_cols={"n": "n"},
    )


_BURST_SIGMA = 2


def _q_events_bursts(sf_dir: str):
    """Burst/anomaly days per event type (stages/windows.py
    burst_days): |types|·|days|-bounded zero-filled count grid, burst
    predicate evaluated in unbounded integers — (n·D−S)² > k²(D·Q−S²)
    — no float anywhere."""
    from docling_api_ray.stages.windows import burst_days

    return burst_days(
        _read(sf_dir, "events", ["event_type", "ts"]), sigma=_BURST_SIGMA
    )


def _q_rfm_segments(sf_dir: str):
    """RFM user segmentation (stages/windows.py rfm_segments): events
    fold once to |users| integer rows, exact percentile_disc quartile
    thresholds per axis (threshold semantics — ties share a quartile,
    no tie exchange), stateless broadcast assign."""
    from docling_api_ray.stages.windows import rfm_segments

    return rfm_segments(
        _read(sf_dir, "events", ["user_id", "ts", "value"])
    )


def _q_leakage_safe_split(sf_dir: str):
    """Near-dup-leakage-safe train/val/test split (stages/splits.py
    leakage_safe_splits): the split hash is over the dedup COMPONENT
    label from dedup_keep, so no near-duplicate cluster straddles
    splits — the eval-contamination guard per-doc hash splits lack."""
    from docling_api_ray.stages.splits import leakage_safe_splits

    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.7)
    return _with_schema(
        leakage_safe_splits(dd.dedup_keep(docs, pairs)),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("component", pa.int64()),
                ("bucket", pa.int64()),
                ("split", pa.string()),
            ]
        ),
    )


def _q_cluster_profile(sf_dir: str):
    """End-to-end curation composition: k-means cluster per embedding
    (exact integer Lloyd, k=8, iters=2) hash-joined to per-document
    text stats, folded to a k-bounded per-cluster quality profile —
    the "which semantic clusters hold long/wordy documents" audit a
    mixture design reads before weighting clusters.  All sums int64-
    exact; avg_chars is the floor-quantized ratio of folded ints."""
    from docling_api_ray.stages.clustering import kmeans_assign
    from docling_api_ray.stages.common import bounded_groupby_sum
    from docling_api_ray.stages.joins import hash_join

    assign = _rename_inline(
        kmeans_assign(_emb(sf_dir, ["vec_id", "embedding"]), k=8, iters=2),
        {"vec_id": "doc_id"},
    )

    def doc_stats(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chars_d": pc.cast(b["n_chars"], pa.int64()),
                "n_words_d": pa.array(
                    np.asarray(
                        ta._count(b["text"], ta.WS_TOKEN_RE), dtype=np.int64
                    )
                ),
            }
        )

    docs = _docs(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
        doc_stats, batch_format="pyarrow"
    )
    joined = hash_join(
        assign,
        docs,
        on="doc_id",
        schemas=(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("cluster", pa.int64()),
                    ("dist", pa.int64()),
                ]
            ),
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_chars_d", pa.int64()),
                    ("n_words_d", pa.int64()),
                ]
            ),
        ),
    )

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.schema(
                [
                    ("cluster", pa.int64()),
                    ("n_docs", pa.int64()),
                    ("sum_chars", pa.int64()),
                    ("sum_words", pa.int64()),
                    ("sum_dist", pa.int64()),
                ]
            ).empty_table()
        cid = np.asarray(b["cluster"], dtype=np.int64)
        uniq, inv = np.unique(cid, return_inverse=True)
        agg = lambda col: np.bincount(
            inv, weights=np.asarray(b[col], dtype=np.int64),
            minlength=len(uniq),
        ).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(uniq, type=pa.int64()),
                "n_docs": pa.array(
                    np.bincount(inv, minlength=len(uniq)), type=pa.int64()
                ),
                "sum_chars": pa.array(agg("n_chars_d")),
                "sum_words": pa.array(agg("n_words_d")),
                "sum_dist": pa.array(agg("dist")),
            }
        )

    folded = bounded_groupby_sum(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["cluster"],
        sum_cols={
            c: c for c in ("n_docs", "sum_chars", "sum_words", "sum_dist")
        },
    )

    out_schema = pa.schema(
        [
            ("cluster", pa.int64()),
            ("n_docs", pa.int64()),
            ("sum_chars", pa.int64()),
            ("sum_words", pa.int64()),
            ("sum_dist", pa.int64()),
            ("avg_chars", pa.float64()),
        ]
    )

    def finish(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        n = np.asarray(b["n_docs"], dtype=np.int64)
        sc = np.asarray(b["sum_chars"], dtype=np.int64)
        avg = np.floor(sc.astype(np.float64) / n * 1e6 + 0.5) / 1e6
        return b.append_column("avg_chars", pa.array(avg, type=pa.float64()))

    return folded.map_batches(finish, batch_format="pyarrow")


def _q_source_unique_share(sf_dir: str):
    """Per-source unique-content valuation (stages/dedup.py
    source_unique_share): of each source's distinct 3-shingles, the
    count and share appearing in no other source — shared explode +
    co-group with source_overlap, |sources|-bounded fold."""
    from docling_api_ray.stages.dedup import source_unique_share

    return source_unique_share(_docs(sf_dir, ["doc_id", "text", "source"]))


def _q_anova_eta2(sf_dir: str):
    """One-way ANOVA η² of n_chars across sources (stages/stats.py
    grouped_eta2): |sources|-bounded integer moment fold, micro-
    quantized integer sums of squares, one floor-quantized float."""
    from docling_api_ray.stages.stats import grouped_eta2

    return grouped_eta2(_docs(sf_dir, ["doc_id", "source", "n_chars"]))


_PATH_K = 20


def _q_event_path_topk(sf_dir: str):
    """Top-20 ordered 3-event paths (sequential pattern mining,
    stages/windows.py event_path_counts): one user-mod-P exchange,
    in-partition vectorized trigram counts (|event_types|³-bounded
    partials), the shared distributed top-k tail."""
    from docling_api_ray.stages.windows import event_path_counts

    return _distributed_count_topk(
        event_path_counts(
            _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                     "event_type"])
        ),
        "path",
        _PATH_K,
    )


def _q_events_decay(sf_dir: str):
    """Per-user exponentially time-decayed activity score, 1-day
    half-life (stages/windows.py user_decay_score): integer-exact
    ⌊1e6/2^age⌋ weights summed per user via one narrow user-mod-P
    co-group; anchor = corpus max activity day (scalar fold)."""
    from docling_api_ray.stages.windows import user_decay_score

    return user_decay_score(_read(sf_dir, "events", ["user_id", "ts"]))


def _q_source_overlap(sf_dir: str):
    """Exact cross-source 3-shingle contamination matrix
    (stages/dedup.py source_overlap): distinct (shingle,source) rows
    co-grouped by shingle key, per-partition unordered pair fold,
    |sources|²-bounded count aggregate — the exact complement of the
    sketched source_similarity."""
    from docling_api_ray.stages.dedup import source_overlap

    return source_overlap(_docs(sf_dir, ["doc_id", "text", "source"]))


_NB_VOCAB = 24


def _q_nbayes_confusion(sf_dir: str):
    """Multinomial Naive Bayes lang classifier trained on the corpus's
    own labels over the global top-24 vocabulary, evaluated as a
    |langs|²-bounded confusion matrix (stages/nbayes.py).  Training is
    one (V+1)·L-bounded integer fold; scoring is a stateless broadcast
    pass of int64 dot products — exactly SQL-reproducible (integer
    micro-log-probs, floor-quantized like charlm)."""
    from docling_api_ray.stages.nbayes import (
        naive_bayes_confusion,
        train_naive_bayes,
    )

    vocab_rows = _distributed_count_topk(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            ta.word_counts, batch_format="pyarrow"
        ),
        "word",
        _NB_VOCAB,
    ).take_all()  # ≤ V rows
    vocab = [r["word"] for r in vocab_rows]
    # The SQL mirror hardcodes the Laplace denominator as _NB_VOCAB while
    # the engine uses the realized V = len(vocab); on a corpus with fewer
    # than _NB_VOCAB distinct words they would silently diverge — fail
    # loudly instead of producing a mismatched confusion matrix.
    if len(vocab) != _NB_VOCAB:
        raise ValueError(
            f"nbayes_confusion: realized vocab size {len(vocab)} != "
            f"oracle Laplace denominator _NB_VOCAB={_NB_VOCAB}; the corpus "
            "has too few distinct words for the hardcoded-V oracle"
        )
    docs = _docs(sf_dir, ["doc_id", "text", "lang"])
    model = train_naive_bayes(docs, vocab)
    return naive_bayes_confusion(docs, model)


def _q_source_ols(sf_dir: str):
    """Per-source OLS of word count on char count (stages/stats.py
    grouped_ols): regr_slope/intercept/r² from exact int64 moment
    partials tree-folded over a |sources|-bounded domain, floats
    computed once per group in an op order the oracle mirrors."""
    from docling_api_ray.stages.stats import grouped_ols

    return grouped_ols(_docs(sf_dir, ["doc_id", "text", "source", "n_chars"]))


_RRF_K_EACH = 100
_RRF_K_OUT = 20
_RRF_QUERY_ID = 0


def _q_hybrid_rrf(sf_dir: str):
    """Hybrid sparse+dense retrieval fused by Reciprocal Rank Fusion
    (stages/relevance.py hybrid_rrf): the BM25 lexical top-100 and the
    embedding-cosine top-100 for one query, combined with the
    integer-exact floor-quantized rrf_micro = Σ ⌊1e6/(60+rank)+0.5⌋.
    Both lists are k-bounded end to end — the fuse touches 200 rows."""
    import pyarrow.parquet as pq

    from docling_api_ray.stages.relevance import hybrid_rrf

    qtbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", _RRF_QUERY_ID)],
    )
    qvec = np.asarray(qtbl["embedding"][0].as_py(), dtype=np.float64)
    return hybrid_rrf(
        _docs(sf_dir, ["doc_id", "text"]),
        _emb(sf_dir, ["vec_id", "embedding"]),
        _BM25_TERMS,
        _RRF_QUERY_ID,
        qvec,
        k_each=_RRF_K_EACH,
        k_out=_RRF_K_OUT,
    )


_RBO_K = 100


def _q_rank_rbo(sf_dir: str):
    """Rank-Biased Overlap between the BM25 lexical ranking and the
    embedding-cosine ranking for one query (stages/relevance.py
    rank_rbo): the sparse/dense retrieval-agreement monitor.  Both
    lists ride the k-bounded _two_rankings tail; the overlap curve is
    O(k) driver work; each depth term micro-quantized to int64 before
    the order-free sum so the DuckDB mirror is bit-exact."""
    import pyarrow.parquet as pq

    from docling_api_ray.stages.relevance import rank_rbo

    qtbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", _RRF_QUERY_ID)],
    )
    qvec = np.asarray(qtbl["embedding"][0].as_py(), dtype=np.float64)
    return rank_rbo(
        _docs(sf_dir, ["doc_id", "text"]),
        _emb(sf_dir, ["vec_id", "embedding"]),
        _BM25_TERMS,
        _RRF_QUERY_ID,
        qvec,
        k=_RBO_K,
    )


def _q_embedding_quantize(sf_dir: str):
    """INT8 post-training quantization of the embedding column
    (stages/linalg.py quantize_embeddings): per-dim min/max affine
    codes — one dim-bounded range fold + broadcast, then a stateless
    integer code pass.  Floor division on a non-negative numerator
    makes the DuckDB ``//`` mirror bit-exact."""
    from docling_api_ray.stages.linalg import quantize_embeddings

    return quantize_embeddings(_emb(sf_dir, ["vec_id", "embedding"]))


def _q_user_event_sequence(sf_dir: str):
    """Ordered collect_list per user (stages/windows.py
    user_event_sequences): first 12 event types by (ts, event_id)
    joined into a '>' path string + total event count — ONE user-hash
    exchange of the minimal payload, sequence assembly vectorized
    in-partition."""
    from docling_api_ray.stages.windows import user_event_sequences

    return user_event_sequences(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]),
        k=12,
    )


def queries() -> dict[str, Callable[[str], Any]]:
    # Ordering contract (VERDICT r4 #4): the driver's correctness gate
    # checks the FIRST 50 entries, so each round the head rotates to the
    # entries with no prior driver-gate row.  Round 5 head: the r4
    # continuation set (ccnet_buckets ... ridge_predict, append_commit),
    # the round-5-touched operators (pagerank/triangle with the
    # giant-component guard, hybrid_rrf merge fix, rfm_segments), then
    # the remaining never-checked exact-oracle entries; previously
    # driver-checked queries (CORRECTNESS_r01-r04) sit at the tail.
    return {
        "welch_ttest": _q_welch_ttest,
        "poisson_bootstrap": _q_poisson_bootstrap,
        "kneser_ney": _q_kneser_ney,
        "rouge_pairs": _q_rouge_pairs,
        "isotonic_calibration": _q_isotonic_calibration,
        "boilerplate_strip": _q_boilerplate_strip,
        "conformal_gate": _q_conformal_gate,
        "lang_kappa": _q_lang_kappa,
        "k_anonymity": _q_k_anonymity,
        "l_diversity": _q_l_diversity,
        "trimmed_mean": _q_trimmed_mean,
        "markov_eval": _q_markov_eval,
        "label_centroid_dist": _q_label_centroid_dist,
        "shard_assign": _q_shard_assign,
        "compression_ratio": _q_compression_ratio,
        "ht_estimate": _q_ht_estimate,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "winnow_pairs": _q_winnow_pairs,
        "winnow_dedup_keep": _q_winnow_dedup_keep,
        "cdc_dedup": _q_cdc_dedup,
        "events_ewma": _q_events_ewma,
        "mann_kendall": _q_mann_kendall,
        "neyman_allocation": _q_neyman_allocation,
        "vocab_coverage": _q_vocab_coverage,
        "neyman_sample": _q_neyman_sample,
        "kendall_length_tokens": _q_kendall_length_tokens,
        "benford_audit": _q_benford_audit,
        "blocklist_rate": _q_blocklist_rate,
        "quantile_normalize": _q_quantile_normalize,
        "hill_tail_index": _q_hill_tail_index,
        "table_profile": _q_table_profile,
        "selfjoin_blowup": _q_selfjoin_blowup,
        "dedup_normalized": _q_dedup_normalized,
        "quality_ensemble": _q_quality_ensemble,
        "funnel_latency": _q_funnel_latency,
        "hll_eval": _q_hll_eval,
        "cms_eval": _q_cms_eval,
        "bloom_fpr": _q_bloom_fpr,
        "mmr_select": _q_mmr_select,
        "approx_score_quantiles": _q_approx_score_quantiles,
        "approx_source_quantiles": _q_approx_source_quantiles,
        "winsorize_logit": _q_winsorize_logit,
        "source_heavy_hitters": _q_source_heavy_hitters,
        "weighted_length_quantiles": _q_weighted_length_quantiles,
        "spearman_length_tokens": _q_spearman_length_tokens,
        "lang_source_mi": _q_lang_source_mi,
        "stratified_kfold": _q_stratified_kfold,
        "source_gini": _q_source_gini,
        "ccnet_buckets": _q_ccnet_buckets,
        "vocab_growth": _q_vocab_growth,
        "cluster_topterms": _q_cluster_topterms,
        "knn_mrr": _q_knn_mrr,
        "lang_agreement": _q_lang_agreement,
        "unpivot_doc_stats": _q_unpivot_stats,
        "ridge_predict": _q_ridge_predict,
        "append_commit": _q_append_commit,
        "pagerank_neardup": _q_pagerank_neardup,
        "triangle_neardup": _q_triangle_neardup,
        "hybrid_rrf": _q_hybrid_rrf,
        "rank_rbo": _q_rank_rbo,
        "quality_auc_by_source": _q_quality_auc_by_source,
        "quality_calibration": _q_quality_calibration,
        "ks_drift_by_source": _q_ks_drift_by_source,
        "budget_select": _q_budget_select,
        "lsh_eval": _q_lsh_eval,
        "event_debounce": _q_event_debounce,
        "psi_by_source": _q_psi_by_source,
        "distinct_ngrams": _q_distinct_ngrams,
        "zipf_fit": _q_zipf_fit,
        "nbayes_confusion": _q_nbayes_confusion,
        "rfm_segments": _q_rfm_segments,
        "leakage_safe_split": _q_leakage_safe_split,
        "cluster_profile": _q_cluster_profile,
        "corpus_card": _q_corpus_card,
        "source_overlap": _q_source_overlap,
        "source_unique_share": _q_source_unique_share,
        "feature_corr": _q_feature_corr,
        "source_ols": _q_source_ols,
        "anova_eta2": _q_anova_eta2,
        "events_decay_score": _q_events_decay,
        "event_path_topk": _q_event_path_topk,
        "events_bursts": _q_events_bursts,
        "length_quality_grid": _q_length_quality_grid,
        "user_event_diversity": _q_user_diversity,
        "cube_counts": _q_cube_counts,
        "source_ntile": _q_source_ntile,
        "pareto_frontier": _q_pareto_frontier,
        "user_event_sequence": _q_user_event_sequence,
        "embedding_quantize": _q_embedding_quantize,
        "random_projection": _q_random_projection,
        "pca_project": _q_pca_project,
        "interval_join": _q_interval_join,
        "edit_distance_pairs": _q_edit_distance_pairs,
        "customer_running_total": _q_customer_running_total,
        "min_cost_supplier": _q_min_cost_supplier,
        "shipmode_priority": _q_shipmode_priority,
        "sales_opportunity": _q_sales_opportunity,
        "append_dedup_exact": _q_append_dedup_exact,
        "append_dedup_minhash": _q_append_dedup_minhash,
        "append_dedup_indexed": _q_append_dedup_indexed,
        "knn_append": _q_knn_append,
        "knn_ivf_partitioned": _q_knn_ivf_partitioned,
        "knn_recall": _q_knn_recall,
        "knn_label_vote": _q_knn_label_vote,
        "readability": _q_readability,
        "robust_stats_by_source": _q_robust_stats,
        "bloom_decontaminate": _q_bloom_decontaminate,
        "countmin_words": _q_countmin_words,
        "media_phash_dups": _q_media_phash_dups,
        "rollup_counts": _q_rollup_counts,
        "pivot_lang_format": _q_pivot_lang_format,
        "events_gaps": _q_events_gaps,
        "customers_no_orders": _q_customers_no_orders,
        "local_supplier_volume": _q_local_supplier_volume,
        "knn_lsh": _q_knn_lsh,
        "events_moving_avg": _q_events_moving_avg,
        "vocab_shared_all": _q_vocab_shared_all,
        "weighted_sample": _q_weighted_sample,
        "curriculum_bins": _q_curriculum_bins,
        "dsir_weights": _q_dsir_weights,
        "knn_pq": _q_knn_pq,
        "inverted_postings": _q_inverted_postings,
        "mixture_weights": _q_mixture_weights,
        "repetition_stats": _q_repetition_stats,
        "hll_by_source": _q_hll_by_source,
        "bpe_merges": _q_bpe_merges,
        "bpe_token_counts": _q_bpe_token_counts,
        "knn_filtered": _q_knn_filtered,
        "zscore_by_source": _q_zscore_by_source,
        "kl_by_source": _q_kl_by_source,
        "value_quantiles_by_type": _q_value_quantiles_by_type,
        "user_value_quantiles": _q_user_value_quantiles,
        "pmi_collocations": _q_pmi_collocations,
        "corpus_diff": _q_corpus_diff,
        "events_rolling_z": _q_events_rolling_z,
        "ngram_backoff": _q_ngram_backoff,
        "mixture_select": _q_mixture_select,
        "large_volume_orders": _q_large_volume_orders,
        "order_priority_counts": _q_order_priority_counts,
        "token_entropy": _q_token_entropy,
        "source_similarity": _q_source_similarity,
        "length_token_corr": _q_length_token_corr,
        "interleave_order": _q_interleave_order,
        "small_qty_revenue": _q_small_qty_revenue,
        "top_supplier": _q_top_supplier,
        "chunk_overlap": _q_chunk_overlap,
        "nation_trade_volume": _q_nation_trade_volume,
        "events_new_users": _q_events_new_users,
        "session_type_pairs": _q_session_type_pairs,
        "events_retention": _q_events_retention,
        "returned_top_customers": _q_returned_top_customers,
        "promo_revenue_share": _q_promo_revenue_share,
        "supplier_part_counts": _q_supplier_part_counts,
        "quantity_band_revenue": _q_quantity_band_revenue,
        "session_transitions": _q_session_transitions,
        "user_top_event": _q_user_top_event,
        "events_wau": _q_events_wau,
        "ngram_containment": _q_ngram_containment,
        "revenue_forecast": _q_revenue_forecast,
        "nation_profit_by_year": _q_nation_profit_by_year,
        "mkt_share_by_year": _q_mkt_share_by_year,
        "part_value_share": _q_part_value_share,
        "custdist": _q_custdist,
        "promo_part_suppliers": _q_promo_part_suppliers,
        "sole_return_suppliers": _q_sole_return_suppliers,
        "classify_format": _q_classify,
        "format_counts": _q_format_counts,
        "convert_spans": _q_convert_spans,
        "media_counts": _q_media_counts,
        "html_extract": _q_html_extract,
        "md_structure": _q_md_structure,
        "token_count": _q_token_count,
        "normalize_text": _q_normalize_text,
        "vocab_topk": _q_vocab_topk,
        "pii_redact": _q_pii_redact,
        "paragraph_dedup": _q_paragraph_dedup,
        "pack_chunks": _q_pack_chunks,
        "curate_pack": _q_curate_pack,
        "gopher_quality": _q_gopher_quality,
        "bigram_topk": _q_bigram_topk,
        "quality_score": _q_quality,
        "lang_id": _q_lang_id,
        "fingerprint_md5": _q_fingerprint,
        "fingerprint_rolling": _q_fingerprint_rolling,
        "dedup_exact": _q_dedup_exact,
        "dedup_exact_stats": _q_dedup_exact_stats,
        "dedup_exact_rows": _q_dedup_exact_rows,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "prefix_filter_pairs": _q_prefix_filter,
        "decontaminate": _q_decontaminate,
        "dup_ngrams": _q_dup_ngrams,
        "dup_span_strip": _q_dup_span_strip,
        "dup_span_keep_first": _q_dup_span_keep_first,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_minhash_keep": _q_dedup_minhash_keep,
        "dedup_cluster_sizes": _q_dedup_cluster_sizes,
        "split_assign": _q_split_assign,
        "token_quantiles_by_source": _q_token_quantiles,
        "bm25_scores": _q_bm25,
        "tfidf_topterms": _q_tfidf_topterms,
        "charlm_scores": _q_charlm,
        "global_rank": _q_global_rank,
        "source_percent_rank": _q_source_percent_rank,
        "shipping_priority": _q_shipping_priority,
        "lang_entropy": _q_lang_entropy,
        "quality_logit": _q_quality_logit,
        "score_quantiles": _q_score_quantiles,
        "source_score_quantiles": _q_source_score_quantiles,
        "quality_gate_by_source": _q_quality_gate_by_source,
        "events_funnel": _q_events_funnel,
        "heavy_hitters": _q_heavy_hitters,
        "hll_registers": _q_hll_registers,
        "stratified_sample": _q_stratified_sample,
        "dedup_simhash": _q_dedup_simhash,
        "embedding_neardup": _q_embedding_neardup,
        "kmeans_clusters": _q_kmeans,
        "embedding_gram": _q_embedding_gram,
        "cluster_outliers": _q_cluster_outliers,
        "semdedup_keep": _q_semdedup,
        "knn_bruteforce": _q_knn,
        "knn_ivf": _q_knn_ivf,
        "conversion_metrics": _q_conversion_metrics,
        "orders_per_customer": _q_orders_per_customer,
        "events_props_extract": _q_events_props_extract,
        "pricing_summary": _q_pricing_summary,
        "quality_filter": _q_quality_filter,
        "events_attribution": _q_events_attribution,
        "events_distinct_users": _q_events_distinct_users,
        "topk_longest_docs": _q_topk_longest,
        "topk_docs_per_source": _q_topk_per_source,
        "distinct_lang_source": _q_distinct_lang_source,
        "sample_systematic": _q_sample_systematic,
        "docs_region_join": _q_docs_region_join,
        "events_sliding": _q_events_sliding,
        "events_sessions": _q_events_sessions,
        "events_hourly": _q_events_hourly,
        "docs_stats_by_source": _q_docs_stats,
        "multimodal_meta": _q_multimodal_meta,
        "multimodal_dims": _q_multimodal_dims,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — mirrors of the SQL-expressible queries above
# ---------------------------------------------------------------------------

# mod-2^64 arithmetic mirror of functions/hashing.py: numpy uint64
# wraparound == explicit % 2^64 over DuckDB HUGEINT (every intermediate
# product here stays below 2^125, inside HUGEINT range).  md5_number is
# the 16-byte md5 digest read little-endian, so md5_number % 2^64 equals
# the engine's int.from_bytes(digest[:8], "little").
_W = 1 << 64  # 2^64
_MASK32 = 1 << 32
_MERSENNE61 = (1 << 61) - 1
_SHINGLE_A = 2654435761
_SHINGLE_B = 2246822519
_FP_BASE = 1099511628211

# string_split(text,' ') with ''->[] — split_words() semantics
_SQL_WORDS = "CASE WHEN text = '' THEN CAST([] AS VARCHAR[]) ELSE string_split(text, ' ') END"


def _sql_u64(expr: str) -> str:
    return f"((((md5_number({expr})) % {_W}) + {_W}) % {_W})"


def _sql_shingle_ctes() -> str:
    """Shared WITH-clause body computing per-doc 3-word shingle hashes —
    the exact mirror of functions/hashing.py (split_words, 32-bit-masked
    md5 word hashes, mod-2^64 combine).  Used by the minhash and
    decontaminate oracles."""
    return f"""
        docs AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
        wh AS (SELECT doc_id,
                      list_transform(ws, w ->
                        CAST({_sql_u64('w')} % {_MASK32} AS HUGEINT)) AS wh
               FROM docs),
        sh AS (SELECT doc_id,
          CASE WHEN len(wh) = 0 THEN CAST([] AS HUGEINT[])
               WHEN len(wh) = 1 THEN [(wh[1] * {_SHINGLE_A}) % {_W}]
               WHEN len(wh) = 2
                 THEN [(wh[1] * {_SHINGLE_A} + wh[2] * {_SHINGLE_B}) % {_W}]
               ELSE list_transform(generate_series(1, len(wh) - 2), i ->
                 (wh[i] * {_SHINGLE_A} + wh[i+1] * {_SHINGLE_B} + wh[i+2]) % {_W})
          END AS sh FROM wh)"""


def _winnow_fp_ctes() -> str:
    """Shared WITH-clause body replaying the winnowing selection of
    stages/text_analysis.py winnow_selected: 3-word shingle hashes from
    ``_sql_shingle_ctes``, per-window min via a ROWS frame (clipped
    frames filtered to full windows except the single whole-sequence
    window of short docs), rightmost tie-break via max(pos) at the
    window min, then the distinct selected positions joined back to
    their hashes (``fph``: one row per doc per selected position).
    Used by the winnow_fingerprints and winnow_pairs oracles."""
    from docling_api_ray.stages import text_analysis as _ta

    w = _ta.WINNOW_W
    return f"""{_sql_shingle_ctes()},
        nsh AS (SELECT doc_id, len(sh) AS n FROM sh),
        s AS (SELECT doc_id, unnest(sh) AS h,
                     unnest(generate_series(1, len(sh))) AS i FROM sh),
        st AS (SELECT doc_id, i AS j,
                      min(h) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW
                        AND {w - 1} FOLLOWING) AS mh
               FROM s),
        win AS (SELECT st.doc_id, st.j, st.mh
                FROM st JOIN nsh USING (doc_id)
                WHERE st.j <= greatest(nsh.n - {w} + 1, 1)),
        sel AS (SELECT w.doc_id, w.j, max(s.i) AS pos
                FROM win w JOIN s ON s.doc_id = w.doc_id
                     AND s.i BETWEEN w.j AND w.j + {w - 1}
                     AND s.h = w.mh
                GROUP BY 1, 2),
        fp AS (SELECT DISTINCT doc_id, pos FROM sel),
        fph AS (SELECT f.doc_id, s.h
                FROM fp f JOIN s ON s.doc_id = f.doc_id AND s.i = f.pos)"""


_DECON_BENCH_MOD = 50  # docs with doc_id % 50 == 0 form the "benchmark"


def _decontaminate_oracle_sql() -> str:
    """Exact mirror of contamination_counts: benchmark = distinct shingle
    hashes of the doc_id % 50 == 0 subset; per-doc contaminated-shingle
    count preserves multiplicity (each occurrence counts)."""
    return f"""
        WITH {_sql_shingle_ctes()},
        bench AS (SELECT DISTINCT unnest(sh) AS h FROM sh
                  WHERE doc_id % {_DECON_BENCH_MOD} = 0),
        expl AS (SELECT doc_id, unnest(sh) AS h FROM sh),
        cnt AS (SELECT e.doc_id, count(*) AS n_cont
                FROM expl e JOIN bench b ON e.h = b.h GROUP BY 1)
        SELECT s.doc_id,
               CAST(len(s.sh) AS BIGINT) AS n_shingles,
               CAST(coalesce(c.n_cont, 0) AS BIGINT) AS n_contaminated,
               CAST(coalesce(c.n_cont, 0) AS DOUBLE)
                 / greatest(len(s.sh), 1) AS contamination_ratio
        FROM sh s LEFT JOIN cnt c USING (doc_id)
    """


def _curate_oracle_sql(wsre: str) -> str:
    """One CTE pipeline mirroring ``pipelines/curate.curate_pack``:
    paragraph dedup → source join → Gopher filter over clean_text →
    per-source concat-and-chunk packing window."""
    return f"""
        WITH d AS (SELECT doc_id,
                          list_filter(string_split(text, ' '),
                                      w -> w <> '') AS ws
                   FROM documents),
             t AS (SELECT doc_id, unnest(ws) AS word,
                          unnest(range(len(ws))) AS pos
                   FROM d),
             para AS (SELECT doc_id, pos // 8 AS para_idx,
                             string_agg(word, ' ' ORDER BY pos) AS para_text
                      FROM t GROUP BY doc_id, para_idx),
             kk AS (SELECT doc_id, para_idx, para_text,
                           row_number() OVER (PARTITION BY para_text
                                              ORDER BY doc_id, para_idx) AS rn
                    FROM para),
             pd AS (SELECT doc_id,
                           coalesce(string_agg(para_text, ' ' ORDER BY para_idx)
                                    FILTER (WHERE rn = 1), '') AS clean_text
                    FROM kk GROUP BY doc_id),
             j AS (SELECT p.doc_id, doc.source, p.clean_text
                   FROM pd p JOIN documents doc USING (doc_id)),
             w2 AS (SELECT doc_id, unnest(string_split(clean_text, ' ')) AS word
                    FROM j),
             wc AS (SELECT doc_id, word, count(*) AS c
                    FROM w2 WHERE word <> '' GROUP BY doc_id, word),
             agg AS (SELECT doc_id,
                            CAST(sum(c) AS BIGINT) AS n_words,
                            CAST(count(*) AS BIGINT) AS n_unique,
                            CAST(max(c) AS BIGINT) AS top_n,
                            CAST(sum(c * length(word)) AS BIGINT) AS chars,
                            bool_or(word IN {ta.STOPWORDS!r}) AS has_stopword
                     FROM wc GROUP BY doc_id),
             q AS (SELECT j.doc_id, j.source, j.clean_text,
                          coalesce(a.n_words, 0) AS n_words,
                          round(coalesce(a.chars, 0)
                                / greatest(coalesce(a.n_words, 0), 1), 6)
                            AS mwl,
                          round((coalesce(a.n_words, 0) - coalesce(a.n_unique, 0))
                                / greatest(coalesce(a.n_words, 0), 1), 6)
                            AS dup_frac,
                          round(coalesce(a.top_n, 0)
                                / greatest(coalesce(a.n_words, 0), 1), 6)
                            AS top_frac,
                          coalesce(a.has_stopword, FALSE) AS has_stopword
                   FROM j LEFT JOIN agg a USING (doc_id)),
             f AS (SELECT doc_id, source,
                          CAST(length(regexp_extract_all(clean_text, $${wsre}$$))
                               AS BIGINT) AS n_tokens
                   FROM q
                   WHERE n_words BETWEEN {ta.GOPHER_MIN_WORDS}
                                     AND {ta.GOPHER_MAX_WORDS}
                     AND mwl BETWEEN {ta.GOPHER_MIN_MWL} AND {ta.GOPHER_MAX_MWL}
                     AND dup_frac <= {ta.GOPHER_MAX_DUP_FRAC}
                     AND top_frac <= {ta.GOPHER_MAX_TOP_FRAC}
                     AND has_stopword),
             s AS (SELECT doc_id, source, n_tokens,
                          sum(n_tokens) OVER (PARTITION BY source
                                              ORDER BY doc_id
                                              ROWS UNBOUNDED PRECEDING)
                            - n_tokens AS off
                   FROM f)
        SELECT doc_id, source, n_tokens,
               CAST(off // 512 AS BIGINT) AS chunk_id,
               CAST(off % 512 AS BIGINT) AS chunk_pos
        FROM s
    """


def _kmeans_oracle_sql(k: int = 8, iters: int = 2) -> str:
    """Bit-exact SQL mirror of ``stages/clustering.kmeans_assign``: the
    same ``floor(x*1e6+0.5)`` int64 quantizer, exact int64 squared-L2
    distances, argmin with ORDER BY (d, cid) tie-break, and the
    offset-by-1e6 nonnegative integer floor-division centroid mean
    (DuckDB's truncating ``//`` equals numpy's floor-div on
    nonnegatives).  Iterations unroll as CTE pairs; empty clusters keep
    the previous centroid via the LEFT JOIN + coalesce."""
    parts = [
        """
        WITH vq AS (SELECT vec_id,
                           list_transform(embedding, e ->
                               CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5)
                                    AS BIGINT)) AS q
                    FROM embeddings),
             vu AS (SELECT vec_id, unnest(q) AS ve,
                           unnest(range(len(q))) AS pos
                    FROM vq),
             cu0 AS (SELECT cid, unnest(q) AS ce,
                            unnest(range(len(q))) AS pos
                     FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1
                                    AS cid, q
                           FROM vq ORDER BY vec_id LIMIT %d))
        """
        % k
    ]
    for it in range(1, iters + 1):
        parts.append(
            """,
             d{i} AS (SELECT v.vec_id, c.cid,
                            sum((v.ve - c.ce) * (v.ve - c.ce)) AS d
                     FROM vu v JOIN cu{prev} c USING (pos)
                     GROUP BY v.vec_id, c.cid),
             a{i} AS (SELECT vec_id, cid, d FROM
                        (SELECT vec_id, cid, d,
                                row_number() OVER (PARTITION BY vec_id
                                                   ORDER BY d, cid) AS rn
                         FROM d{i})
                     WHERE rn = 1),
             s{i} AS (SELECT a.cid, v.pos, sum(v.ve) AS s,
                            CAST(count(*) AS BIGINT) AS n
                     FROM a{i} a JOIN vu v USING (vec_id)
                     GROUP BY a.cid, v.pos),
             cu{i} AS (SELECT c.cid, c.pos,
                             coalesce((s.s + s.n * 1000000) // s.n - 1000000,
                                      c.ce) AS ce
                      FROM cu{prev} c
                      LEFT JOIN s{i} s ON s.cid = c.cid AND s.pos = c.pos)
            """.format(i=it, prev=it - 1)
        )
    # final labeling pass against the post-iteration centroids
    parts.append(
        """,
             df AS (SELECT v.vec_id, c.cid,
                           sum((v.ve - c.ce) * (v.ve - c.ce)) AS d
                    FROM vu v JOIN cu{last} c USING (pos)
                    GROUP BY v.vec_id, c.cid)
        SELECT vec_id, cid AS cluster, CAST(d AS BIGINT) AS dist FROM
          (SELECT vec_id, cid, d,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d, cid) AS rn
           FROM df)
        WHERE rn = 1
        """.format(last=iters)
    )
    return "".join(parts)


def _minhash_ctes(num_perm: int = 64, bands: int = 16) -> str:
    """The shared CTE chain of the minhash oracles — shingles →
    signatures → bands → ``cand`` (all band-colliding pairs with their
    est-Jaccard, UNFILTERED).  ``_minhash_oracle_sql`` and the
    append-dedup oracle both build on it so the signature arithmetic is
    mirrored in exactly one place."""
    from docling_api_ray.stages.dedup import MinHasher

    mh = MinHasher(num_perm=num_perm)
    perm_rows = ", ".join(
        f"({p}, CAST({int(a)} AS HUGEINT), CAST({int(b)} AS HUGEINT))"
        for p, (a, b) in enumerate(zip(mh.a, mh.b), 1)
    )
    zeros = "[" + ", ".join(["CAST(0 AS HUGEINT)"] * num_perm) + "]"
    r = num_perm // bands
    return f"""{_sql_shingle_ctes()},
        expl AS (SELECT doc_id, unnest(sh) AS h FROM sh),
        perms AS (SELECT * FROM (VALUES {perm_rows}) AS t(p, a, b)),
        sigc AS (SELECT e.doc_id, p.p,
                        min((((p.a * e.h) % {_W}) + p.b) % {_W}) AS c
                 FROM expl e CROSS JOIN perms p GROUP BY 1, 2),
        sig0 AS (SELECT doc_id, list(c ORDER BY p) AS sig FROM sigc GROUP BY 1),
        sig AS (SELECT d.doc_id, coalesce(s.sig, {zeros}) AS sig
                FROM docs d LEFT JOIN sig0 s USING (doc_id)),
        bands AS (SELECT doc_id, sig, b,
                         sig[{r}*b+1 : {r}*b+{r}] AS band
                  FROM sig, (SELECT unnest(generate_series(0, {bands - 1})) AS b)),
        cand AS (SELECT DISTINCT l.doc_id AS left_id, r.doc_id AS right_id,
                        list_sum(list_transform(generate_series(1, {num_perm}),
                          i -> CASE WHEN l.sig[i] = r.sig[i] THEN 1 ELSE 0 END))
                          / {num_perm}.0 AS est_jaccard
                 FROM bands l JOIN bands r
                   ON l.b = r.b AND l.band = r.band AND l.doc_id < r.doc_id)"""


def _minhash_oracle_sql(threshold: float, num_perm: int = 64, bands: int = 16) -> str:
    """Exact SQL mirror of MinHasher + explode_bands + pair verification
    (stages/dedup.py): same word hashes, shingle combine, permutation
    constants (embedded literals from the same seeded RandomState) and
    banding; candidate pairs join on raw band-component tuples instead of
    the engine's internal mixed bucket ints — the same doc partition."""
    return f"""
        WITH {_minhash_ctes(num_perm, bands)}
        SELECT left_id, right_id, est_jaccard
        FROM cand WHERE est_jaccard >= {threshold}
    """


def _append_minhash_oracle_sql(
    threshold: float, num_perm: int = 64, bands: int = 16
) -> str:
    """Mirror of _q_append_dedup_minhash: incoming docs (doc_id%10 ≥ 8)
    dropped by ANY qualifying pair where they are the larger id
    (old-or-new partner), or where their partner is old with a larger
    id — history wins regardless of id order."""
    return f"""
        WITH {_minhash_ctes(num_perm, bands)},
        pairs AS (SELECT left_id, right_id FROM cand
                  WHERE est_jaccard >= {threshold})
        SELECT doc_id FROM documents
        WHERE doc_id % 10 >= 8
          AND NOT EXISTS (
            SELECT 1 FROM pairs p
            WHERE p.right_id = documents.doc_id
               OR (p.left_id = documents.doc_id AND p.right_id % 10 < 8))
    """


def _bm25_oracle_sql(terms: list[str]) -> str:
    """Exact SQL mirror of stages/relevance.py bm25_scores: same
    tokenization (regexp_extract_all \\S+), same df/avgdl aggregates,
    ln(1 + (N-df+0.5)/(df+0.5)) idf, identical parenthesization and
    term-order summation, quantize6 at the end."""
    tf_cols = ",\n                   ".join(
        f"CAST(length(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n                   ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(terms))
    )
    idf_cols = ",\n                   ".join(
        f"ln(1.0 + ((n_docs - df_{i} + 0.5) / (df_{i} + 0.5))) AS idf_{i}"
        for i in range(len(terms))
    )
    contribs = [
        f"((s.idf_{i} * (d.tf_{i} * (1.2 + 1.0))) / (d.tf_{i} + d.norm))"
        for i in range(len(terms))
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = f"({total} + {c})"
    return f"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, $$\\S+$$) AS toks
          FROM documents
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(length(toks) AS DOUBLE) AS dl,
                   {tf_cols}
          FROM toks
        ),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CAST(dl AS BIGINT)) AS BIGINT) AS total_tokens,
                   {df_cols}
          FROM per_doc
        ),
        stats AS (
          SELECT n_docs,
                 (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS avgdl,
                   {idf_cols}
          FROM agg
        ),
        normed AS (
          SELECT p.*, (1.2 * ((1.0 - 0.75) + ((0.75 * p.dl) / s.avgdl))) AS norm
          FROM per_doc p CROSS JOIN stats s
        )
        SELECT d.doc_id,
               round(({total}) * 1000000) / 1000000.0 AS score
        FROM normed d CROSS JOIN stats s
    """


def _pagerank_oracle_sql(iters: int = 3, threshold: float = 0.7) -> str:
    """Exact SQL mirror of stages/graph.py pagerank over the verified
    minhash pair set: the same integer micro-unit recurrence
    rank' = 150000 + (850000 · Σ rank//deg) // 1000000, unrolled
    ``iters`` times (each step one join+aggregate over the bidirected
    edge list).  HUGEINT guards the 850000·s product; every division is
    integer floor on non-negative values, matching numpy int64 ``//``."""
    steps = []
    prev = "r0"
    for t in range(1, iters + 1):
        steps.append(f"""
        c{t} AS (SELECT e.dst AS node,
                        CAST(sum(r.rq // d.deg) AS BIGINT) AS c
                 FROM edges e
                 JOIN {prev} r ON r.node = e.node
                 JOIN deg d ON d.node = e.node
                 GROUP BY 1),
        r{t} AS (SELECT n.node,
                        CAST(150000 + (CAST(850000 AS HUGEINT)
                                       * coalesce(c.c, 0)) // 1000000
                             AS BIGINT) AS rq
                 FROM r0 n LEFT JOIN c{t} c USING (node))""")
        prev = f"r{t}"
    return f"""
        WITH pairs AS (
          SELECT left_id, right_id FROM ({_minhash_oracle_sql(threshold)}) q
        ),
        edges AS (SELECT left_id AS node, right_id AS dst FROM pairs
                  UNION ALL
                  SELECT right_id, left_id FROM pairs),
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
                FROM edges GROUP BY 1),
        r0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS rq
               FROM documents),{",".join(steps)}
        SELECT node AS doc_id, rq AS rank_q FROM {prev}
    """


def _minhash_keep_oracle_sql(threshold: float) -> str:
    """Connected components over the exact minhash pair set (the nested
    query is the verified dedup_minhash oracle) via a recursive
    reachability CTE: reach(node, lbl) holds every label reachable from
    node over bidirected pair edges; min(lbl) is the component
    representative.  Documents absent from the pair graph are their own
    component (keep = true)."""
    return f"""
        WITH RECURSIVE pairs AS (
          SELECT left_id, right_id FROM ({_minhash_oracle_sql(threshold)}) q
        ),
        edges AS (SELECT left_id AS a, right_id AS b FROM pairs
                  UNION ALL
                  SELECT right_id, left_id FROM pairs),
        reach(node, lbl) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
        ),
        comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
               coalesce(c.component, d.doc_id) = d.doc_id AS keep
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """


def _simhash_oracle_sql(max_hamming: int) -> str:
    """Exact SQL mirror of SimHasher + 16-bit band LSH (stages/dedup.py):
    per-token md5 bit votes, sign fold, band join, popcount via
    bit_count(xor) on the two's-complement int64 simhash."""
    pow_rows = ", ".join(f"({i}, CAST({1 << i} AS HUGEINT))" for i in range(64))
    band_rows = ", ".join(f"({b}, CAST({1 << (16 * b)} AS HUGEINT))" for b in range(4))
    return f"""
        WITH docs AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
        toks AS (SELECT doc_id, unnest(ws) AS w FROM docs),
        th AS (SELECT doc_id, CAST({_sql_u64('w')} AS HUGEINT) AS h FROM toks),
        pows AS (SELECT * FROM (VALUES {pow_rows}) AS t(pos, pw)),
        bits AS (SELECT doc_id, pos,
                        sum(CASE WHEN (h // pw) % 2 = 1 THEN 1 ELSE -1 END) AS v,
                        any_value(pw) AS pw
                 FROM th CROSS JOIN pows GROUP BY 1, 2),
        sim0 AS (SELECT doc_id,
                        sum(CASE WHEN v > 0 THEN pw ELSE 0 END) AS sh_u
                 FROM bits GROUP BY 1),
        sim AS (SELECT d.doc_id, coalesce(s.sh_u, 0) AS sh_u
                FROM docs d LEFT JOIN sim0 s USING (doc_id)),
        signed AS (SELECT doc_id, sh_u,
                          CAST(CASE WHEN sh_u >= {1 << 63} THEN sh_u - {_W}
                               ELSE sh_u END AS BIGINT) AS sh
                   FROM sim),
        bnd AS (SELECT doc_id, sh, b, (sh_u // bp) % 65536 AS band
                FROM signed, (SELECT * FROM (VALUES {band_rows}) AS t(b, bp))),
        cand AS (SELECT DISTINCT l.doc_id AS left_id, r.doc_id AS right_id,
                        CAST(bit_count(xor(l.sh, r.sh)) AS BIGINT) AS hamming
                 FROM bnd l JOIN bnd r
                   ON l.b = r.b AND l.band = r.band AND l.doc_id < r.doc_id)
        SELECT left_id, right_id, hamming FROM cand
        WHERE hamming <= {max_hamming}
    """


def _fp_rolling_oracle_sql() -> str:
    """Exact SQL mirror of positional_fingerprints (functions/hashing.py):
    sum of 32-bit word hashes times FP_BASE^(n-1-i) mod 2^64, masked to
    63 bits; the power table is a linear recursive CTE in HUGEINT."""
    return f"""
        WITH RECURSIVE docs AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
        wh AS (SELECT doc_id,
                      list_transform(ws, w ->
                        CAST({_sql_u64('w')} % {_MASK32} AS HUGEINT)) AS wh
               FROM docs),
        pows(k, v) AS (
          SELECT 0, CAST(1 AS HUGEINT)
          UNION ALL
          SELECT k + 1, (v * {_FP_BASE}) % {_W} FROM pows
          WHERE k + 1 < (SELECT coalesce(max(len(wh)), 1) FROM wh)),
        terms AS (SELECT doc_id, len(wh) AS n,
                         unnest(wh) AS w32,
                         unnest(generate_series(1, len(wh))) AS i
                  FROM wh),
        fp0 AS (SELECT t.doc_id, sum((t.w32 * p.v) % {_W}) AS s
                FROM terms t JOIN pows p ON p.k = t.n - t.i
                GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce((f.s % {_W}) % {1 << 63}, 0) AS BIGINT) AS fp_rolling
        FROM docs d LEFT JOIN fp0 f USING (doc_id)
    """


def _knn_ivf_oracle_sql(
    q_pred: str | None = None, c_pred: str | None = None
) -> str:
    """Exact SQL mirror of ivf_knn over the fixed coarse quantizer: the
    8 unit centroids are embedded as full-precision literals (algorithm
    constants, like the minhash permutation table); vector→centroid
    assignment, per-query nprobe probe sets, bucket-pruned cosine and the
    (rounded cosine, vec_id) ranking are all computed in SQL.
    ``q_pred``/``c_pred`` select the query and corpus slices (defaults =
    the conformance split; the append variant passes the incoming /
    committed id split)."""
    q_pred = q_pred or f"vec_id < {_N_QUERIES}"
    c_pred = c_pred or f"vec_id >= {_N_QUERIES}"
    cents = _fixed_centroids()
    rows = ", ".join(
        "({}, [{}])".format(i, ", ".join(repr(float(x)) for x in cents[i]))
        for i in range(len(cents))
    )
    return f"""
        WITH cents AS (SELECT cid, CAST(cv AS DOUBLE[]) AS cv
                       FROM (VALUES {rows}) AS t(cid, cv)),
        q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE {q_pred}),
        c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE {c_pred}),
        casg AS (SELECT vec_id, v, cid FROM (
            SELECT c.vec_id, c.v, ce.cid,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY list_cosine_similarity(c.v, ce.cv) DESC, ce.cid
                   ) AS rn
            FROM c CROSS JOIN cents ce) WHERE rn = 1),
        probe AS (SELECT query_id, cid FROM (
            SELECT q.query_id, ce.cid,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY list_cosine_similarity(q.qv, ce.cv) DESC, ce.cid
                   ) AS rn
            FROM q CROSS JOIN cents ce) WHERE rn <= {_IVF_NPROBE}),
        s AS (SELECT q.query_id, a.vec_id,
                     round(list_cosine_similarity(a.v, q.qv) * 1000000) / 1000000.0 AS cosine
              FROM q JOIN probe p ON p.query_id = q.query_id
                     JOIN casg a ON a.cid = p.cid)
        SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
          SELECT query_id, vec_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id) AS rank
          FROM s)
        WHERE rank <= {_KNN_K}
    """


def _knn_pq_oracle_sql() -> str:
    """Exact SQL mirror of pq_knn over the fixed integer codebook
    (stages/pq.py): micro coordinates via ``floor(x*1e6)``, per-subspace
    integer squared distances, argmin assignment with (d, cid) order,
    integer ADC sums, (adc, vec_id) ranking — pure integer arithmetic
    end to end, no float summation order to reproduce."""
    from docling_api_ray.stages.pq import D_SUB, fixed_pq_codebook

    cb = fixed_pq_codebook()
    rows = ", ".join(
        "({}, {}, [{}])".format(
            m, c, ", ".join(str(int(x)) for x in cb[m, c])
        )
        for m in range(cb.shape[0])
        for c in range(cb.shape[1])
    )
    return f"""
        WITH cb AS (SELECT m, cid, CAST(cv AS BIGINT[]) AS cv
                    FROM (VALUES {rows}) AS t(m, cid, cv)),
        js AS (SELECT unnest(range(1, {D_SUB + 1})) AS j),
        v AS (SELECT vec_id,
                     list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * 1000000) AS BIGINT)) AS vm
              FROM embeddings WHERE vec_id >= {_N_QUERIES}),
        q AS (SELECT vec_id AS query_id,
                     list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * 1000000) AS BIGINT)) AS vm
              FROM embeddings WHERE vec_id < {_N_QUERIES}),
        vd AS (SELECT v.vec_id, cb.m, cb.cid,
                      CAST(sum((v.vm[cb.m * {D_SUB} + js.j] - cb.cv[js.j])
                             * (v.vm[cb.m * {D_SUB} + js.j] - cb.cv[js.j]))
                           AS BIGINT) AS d
               FROM v CROSS JOIN cb CROSS JOIN js GROUP BY 1, 2, 3),
        codes AS (SELECT vec_id, m, cid FROM (
            SELECT vec_id, m, cid,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY d, cid) AS rn
            FROM vd) WHERE rn = 1),
        qd AS (SELECT q.query_id, cb.m, cb.cid,
                      CAST(sum((q.vm[cb.m * {D_SUB} + js.j] - cb.cv[js.j])
                             * (q.vm[cb.m * {D_SUB} + js.j] - cb.cv[js.j]))
                           AS BIGINT) AS d
               FROM q CROSS JOIN cb CROSS JOIN js GROUP BY 1, 2, 3),
        adc AS (SELECT qd.query_id, codes.vec_id,
                       CAST(sum(qd.d) AS BIGINT) AS adc
                FROM codes JOIN qd ON qd.m = codes.m AND qd.cid = codes.cid
                GROUP BY 1, 2)
        SELECT query_id, vec_id, adc, CAST(rank AS BIGINT) AS rank FROM (
          SELECT query_id, vec_id, adc,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc, vec_id) AS rank
          FROM adc)
        WHERE rank <= {_KNN_K}
    """


# Queries whose oracle embeds literals derived from the input tables at
# generation time.  The driver's correctness gate runs at sf0.01, so the
# literals are derived from THAT directory; the local mirror test
# (tests/test_queries_oracle.py) compares these queries at sf0.01 too.
ORACLE_SF_DIR = "/root/testdata/sf0.01"
ORACLE_SF_BOUND = ("multimodal_meta",)


def _multimodal_meta_oracle_sql() -> str:
    """multimodal_dims plus ``n_bytes``.  Dims/naming stay data-derived
    SQL; the PNG byte LENGTH depends on zlib compression of the
    deterministic pixel payload, which SQL cannot compute, so expected
    n_bytes per (doc_id, filename) is precomputed at generation time
    (VERDICT r1 next-step #3) by replaying the media derivation over
    ORACLE_SF_DIR's documents table: media item j (1-based) of an
    eligible doc sits at item offset 3j-1 with seed
    stable_seed(doc_id) + offset and the flagship scale of 4."""
    import math

    from docling_api_ray.functions.png import make_png
    from docling_api_ray.functions.spans import stable_seed
    from docling_api_ray.sources import synth

    docs = pq.read_table(
        os.path.join(ORACLE_SF_DIR, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    rows = []
    for did, text in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist()
    ):
        cls = did % 10
        fmt = synth.FORMAT_OF_CLASS[cls]
        if (
            did % synth.POISON_MOD == 0
            or fmt is None
            or fmt == "html"
        ):
            continue
        n_text = (
            math.ceil(len(text.split(" ")) / synth.WORDS_PER_SPAN) if text else 0
        )
        m = (
            n_text // synth.MEDIA_EVERY_N_TEXT
            if did % synth.MEDIA_DOC_MOD == 0
            else 0
        )
        seed = stable_seed(did)
        for j in range(1, m + 1):
            name = (
                f"table-{(j + 1) // 2}.png" if j % 2 == 1 else f"picture-{j // 2}.png"
            )
            off = 3 * j - 1
            rows.append((did, name, len(make_png(seed + off, 4))))
    values = ", ".join(f"({d}, '{n}', {nb})" for d, n, nb in rows)
    return f"""
        WITH base AS (SELECT doc_id, {_SQL_NMEDIA} AS m FROM documents),
             series AS (SELECT unnest(generate_series(
                 1, GREATEST(1, (SELECT MAX((m + 1) // 2) FROM base))
             )) AS i),
             t AS (SELECT b.doc_id,
                          'table-' || CAST(s.i AS VARCHAR) || '.png' AS filename,
                          'table' AS kind
                   FROM base b JOIN series s ON s.i <= (b.m + 1) // 2),
             p AS (SELECT b.doc_id,
                          'picture-' || CAST(s.i AS VARCHAR) || '.png' AS filename,
                          'picture' AS kind
                   FROM base b JOIN series s ON s.i <= b.m // 2),
             nb AS (SELECT * FROM (VALUES {values}) AS v(doc_id, filename, n_bytes))
        SELECT u.doc_id, u.filename, u.kind,
               CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
               CAST(8 AS INTEGER) AS bit_depth, true AS valid_png,
               CAST(nb.n_bytes AS BIGINT) AS n_bytes
        FROM (SELECT * FROM t UNION ALL SELECT * FROM p) u
        JOIN nb ON nb.doc_id = u.doc_id AND nb.filename = u.filename
    """


def oracle_sql() -> dict[str, str]:
    # duckdb string literals: pass regexes via $$-quoted strings
    token = ta.TOKEN_RE
    stop = ta.STOPWORD_RE
    punct = ta.PUNCT_RE
    wsre = ta.WS_TOKEN_RE

    lang_counts = ", ".join(
        f"CAST(length(regexp_extract_all(text, $$\\b(?:{'|'.join(words)})\\b$$)) AS BIGINT) AS c_{lang}"
        for lang, words in ta.LANG_MARKERS.items()
    )

    out = {
        "classify_format": f"SELECT doc_id, {_SQL_FORMAT} AS format FROM documents",
        "format_counts": f"""
            SELECT {_SQL_FORMAT} AS format, count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "convert_spans": f"""
            WITH base AS (
              SELECT doc_id,
                     {_SQL_FORMAT} AS format,
                     {_SQL_NTEXT} AS n_text,
                     {_SQL_NMEDIA} AS m,
                     {_SQL_ERROR} AS error
              FROM documents)
            SELECT doc_id, format,
                   n_text + m AS n_spans,
                   n_text,
                   (m + 1) // 2 AS n_tables,
                   m // 2 AS n_pictures,
                   CASE WHEN m = 0 THEN ''
                        WHEN m % 2 = 1 THEN 'table-' || CAST((m + 1) // 2 AS VARCHAR) || '.png'
                        ELSE 'picture-' || CAST(m // 2 AS VARCHAR) || '.png' END
                     AS last_media_ref,
                   error
            FROM base
        """,
        "media_counts": f"""
            WITH base AS (SELECT {_SQL_NMEDIA} AS m FROM documents),
                 t AS (
                   SELECT 'table' AS kind,
                          CAST(sum((m + 1) // 2) AS BIGINT) AS n_media FROM base
                   UNION ALL
                   SELECT 'picture' AS kind,
                          CAST(sum(m // 2) AS BIGINT) AS n_media FROM base)
            SELECT kind, n_media FROM t WHERE n_media > 0
        """,
        "html_extract": "SELECT doc_id, text AS main_text FROM documents",
        "md_structure": """
            WITH p AS (SELECT doc_id,
                              CASE WHEN text = '' THEN 0
                                   ELSE CAST(ceil(len(string_split(text, ' ')) / 8.0)
                                             AS BIGINT) END AS np
                       FROM documents)
            SELECT doc_id,
                   CASE WHEN np = 0 THEN 0 ELSE 1 + (np - 1) // 4 END AS n_headings,
                   np AS n_paragraphs,
                   np // 3 AS n_tables,
                   np // 5 AS n_images,
                   CAST(0 AS BIGINT) AS n_code_blocks
            FROM p
        """,
        "normalize_text": f"""
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(lower(text),
                        $${ta.PUNCT_RE}$$, '', 'g'), $$\\s+$$, ' ', 'g'))
                     AS norm_text
            FROM documents
        """,
        "bigram_topk": """
            WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
                 b AS (SELECT ws[i] || ' ' || ws[i+1] AS bigram
                       FROM d, (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
                       WHERE ws[i] <> '' AND ws[i+1] <> ''),
                 c AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n
                       FROM b GROUP BY 1)
            SELECT bigram, n FROM c ORDER BY n DESC, bigram LIMIT 40
        """,
        "vocab_topk": """
            WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                       FROM documents),
                 c AS (SELECT word, count(*) AS n FROM w
                       WHERE word <> '' GROUP BY 1)
            SELECT word, CAST(n AS BIGINT) AS n FROM c
            ORDER BY n DESC, word LIMIT 50
        """,
        "curate_pack": _curate_oracle_sql(wsre),
        "pack_chunks": f"""
            WITH t AS (SELECT doc_id, source,
                              CAST(length(regexp_extract_all(text, $${wsre}$$))
                                   AS BIGINT) AS n_tokens
                       FROM documents),
                 s AS (SELECT doc_id, source, n_tokens,
                              sum(n_tokens) OVER (PARTITION BY source
                                                  ORDER BY doc_id
                                                  ROWS UNBOUNDED PRECEDING)
                                - n_tokens AS off
                       FROM t)
            SELECT doc_id, source, n_tokens,
                   CAST(off // 512 AS BIGINT) AS chunk_id,
                   CAST(off % 512 AS BIGINT) AS chunk_pos
            FROM s
        """,
        "paragraph_dedup": """
            WITH d AS (SELECT doc_id,
                              list_filter(string_split(text, ' '),
                                          w -> w <> '') AS ws
                       FROM documents),
                 t AS (SELECT doc_id, unnest(ws) AS word,
                              unnest(range(len(ws))) AS pos
                       FROM d),
                 para AS (SELECT doc_id, pos // 8 AS para_idx,
                                 string_agg(word, ' ' ORDER BY pos) AS para_text
                          FROM t GROUP BY doc_id, para_idx),
                 k AS (SELECT doc_id, para_idx, para_text,
                              row_number() OVER (PARTITION BY para_text
                                                 ORDER BY doc_id, para_idx) AS rn
                       FROM para)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_paras,
                   CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
                   coalesce(string_agg(para_text, ' ' ORDER BY para_idx)
                            FILTER (WHERE rn = 1), '') AS clean_text
            FROM k GROUP BY doc_id
        """,
        # mirrors _q_boilerplate_strip (stages/dedup.py
        # boilerplate_strip): same 8-word paragraph explode as
        # paragraph_dedup, per-paragraph DISTINCT-doc df, drop EVERY
        # occurrence where df > greatest(1, floor(0.05 · n_docs))
        "boilerplate_strip": """
            WITH nd AS (SELECT greatest(1, CAST(floor(0.05 * count(*))
                                              AS BIGINT)) AS df_limit
                        FROM documents),
                 d AS (SELECT doc_id,
                              list_filter(string_split(text, ' '),
                                          w -> w <> '') AS ws
                       FROM documents),
                 t AS (SELECT doc_id, unnest(ws) AS word,
                              unnest(range(len(ws))) AS pos
                       FROM d),
                 para AS (SELECT doc_id, pos // 8 AS para_idx,
                                 string_agg(word, ' ' ORDER BY pos)
                                   AS para_text
                          FROM t GROUP BY doc_id, para_idx),
                 pdf AS (SELECT para_text,
                                CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                         FROM para GROUP BY 1),
                 k AS (SELECT p.doc_id, p.para_idx, p.para_text,
                              pdf.df <= nd.df_limit AS keep
                       FROM para p JOIN pdf USING (para_text)
                            CROSS JOIN nd)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_paras,
                   CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
                   coalesce(string_agg(para_text, ' ' ORDER BY para_idx)
                            FILTER (WHERE keep), '') AS clean_text
            FROM k GROUP BY doc_id
        """,
        "pii_redact": f"""
            WITH s AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example' || CAST(doc_id % 7 AS VARCHAR) || '.org'
                            || CASE WHEN doc_id % 3 = 0
                                    THEN ' cc backup' || CAST(doc_id AS VARCHAR)
                                         || '@mail.net'
                                    ELSE '' END
                            || ' call +1-555-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            || ' node 10.' || CAST(doc_id % 256 AS VARCHAR)
                            || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)
                            || '.' || CAST(doc_id % 100 AS VARCHAR) AS synth
                FROM documents)
            SELECT doc_id,
                   CAST(length(regexp_extract_all(synth, $${ta.EMAIL_RE}$$))
                        AS BIGINT) AS n_emails,
                   CAST(length(regexp_extract_all(synth, $${ta.PHONE_RE}$$))
                        AS BIGINT) AS n_phones,
                   CAST(length(regexp_extract_all(synth, $${ta.IP_RE}$$))
                        AS BIGINT) AS n_ips,
                   regexp_replace(regexp_replace(regexp_replace(synth,
                        $${ta.EMAIL_RE}$$, '[EMAIL]', 'g'),
                        $${ta.PHONE_RE}$$, '[PHONE]', 'g'),
                        $${ta.IP_RE}$$, '[IP]', 'g') AS redacted
            FROM s
        """,
        "gopher_quality": f"""
            WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                       FROM documents),
                 pc AS (SELECT doc_id, word, count(*) AS c
                        FROM w WHERE word <> '' GROUP BY doc_id, word),
                 agg AS (SELECT doc_id,
                                CAST(sum(c) AS BIGINT) AS n_words,
                                CAST(count(*) AS BIGINT) AS n_unique,
                                CAST(max(c) AS BIGINT) AS top_n,
                                CAST(sum(c * length(word)) AS BIGINT) AS chars,
                                bool_or(word IN {ta.STOPWORDS!r}) AS has_stopword
                         FROM pc GROUP BY doc_id),
                 r AS (SELECT d.doc_id,
                              coalesce(a.n_words, 0) AS n_words,
                              round(coalesce(a.chars, 0)
                                    / greatest(coalesce(a.n_words, 0), 1), 6)
                                AS mean_word_len,
                              round((coalesce(a.n_words, 0) - coalesce(a.n_unique, 0))
                                    / greatest(coalesce(a.n_words, 0), 1), 6)
                                AS dup_word_frac,
                              round(coalesce(a.top_n, 0)
                                    / greatest(coalesce(a.n_words, 0), 1), 6)
                                AS top_word_frac,
                              coalesce(a.has_stopword, FALSE) AS has_stopword
                       FROM documents d LEFT JOIN agg a USING (doc_id))
            SELECT *,
                   (n_words BETWEEN {ta.GOPHER_MIN_WORDS} AND {ta.GOPHER_MAX_WORDS}
                    AND mean_word_len BETWEEN {ta.GOPHER_MIN_MWL} AND {ta.GOPHER_MAX_MWL}
                    AND dup_word_frac <= {ta.GOPHER_MAX_DUP_FRAC}
                    AND top_word_frac <= {ta.GOPHER_MAX_TOP_FRAC}
                    AND has_stopword) AS keep
            FROM r
        """,
        "token_count": f"""
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, $${wsre}$$)) AS BIGINT)
                     AS n_ws_tokens,
                   CAST(length(regexp_extract_all(text, $${token}$$)) AS BIGINT)
                     AS n_bpe_tokens
            FROM documents
        """,
        "quality_score": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(regexp_extract_all(text, $${wsre}$$)) AS BIGINT)
                     AS n_words,
                   round(length(regexp_extract_all(text, $${punct}$$))
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   round(length(regexp_extract_all(text, $${stop}$$))
                         / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                     AS stopword_ratio,
                   round((length(text) - (length(regexp_extract_all(text, $${wsre}$$)) - 1))
                         / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                     AS mean_word_len
            FROM documents
        """,
        # mirrors stages/text_analysis.py quality_logit: same quantized
        # features, identical left-to-right parenthesization, quantize6
        # before AND after the sigmoid
        "quality_logit": f"""
            WITH f AS (
              SELECT doc_id,
                     CAST(length(regexp_extract_all(text, $${wsre}$$)) AS BIGINT)
                       AS n_words,
                     round(length(regexp_extract_all(text, $${punct}$$))
                           / greatest(length(text), 1), 6) AS punct_ratio,
                     round(length(regexp_extract_all(text, $${stop}$$))
                           / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                       AS stopword_ratio,
                     round((length(text) - (length(regexp_extract_all(text, $${wsre}$$)) - 1))
                           / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                       AS mean_word_len
              FROM documents
            ),
            l AS (
              SELECT doc_id,
                     round(((((-0.6 + (-8.0 * punct_ratio))
                              + (6.0 * stopword_ratio))
                             + (-0.25 * mean_word_len))
                            + (0.35 * ln(1.0 + n_words))) * 1000000)
                       / 1000000.0 AS logit
              FROM f
            )
            SELECT doc_id, logit,
                   round((1.0 / (1.0 + exp(-logit))) * 1000000) / 1000000.0
                     AS prob,
                   (round((1.0 / (1.0 + exp(-logit))) * 1000000) / 1000000.0
                     >= 0.5) AS keep
            FROM l
        """,
        # mirrors _q_score_quantiles: quantile_disc (= the engine's
        # ceil(q·n) k-th smallest, verified rank rule) over the SAME
        # quantized logit column as quality_logit — the float-exact
        # element selection proves stages/selection.py bit-identical
        "score_quantiles": f"""
            WITH f AS (
              SELECT doc_id,
                     CAST(length(regexp_extract_all(text, $${wsre}$$)) AS BIGINT)
                       AS n_words,
                     round(length(regexp_extract_all(text, $${punct}$$))
                           / greatest(length(text), 1), 6) AS punct_ratio,
                     round(length(regexp_extract_all(text, $${stop}$$))
                           / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                       AS stopword_ratio,
                     round((length(text) - (length(regexp_extract_all(text, $${wsre}$$)) - 1))
                           / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                       AS mean_word_len
              FROM documents
            ),
            l AS (
              SELECT round(((((-0.6 + (-8.0 * punct_ratio))
                              + (6.0 * stopword_ratio))
                             + (-0.25 * mean_word_len))
                            + (0.35 * ln(1.0 + n_words))) * 1000000)
                       / 1000000.0 AS logit
              FROM f
            )
            SELECT CAST(0.1 AS DOUBLE) AS q,
                   quantile_disc(logit, 0.1) AS value FROM l
            UNION ALL
            SELECT CAST(0.25 AS DOUBLE), quantile_disc(logit, 0.25) FROM l
            UNION ALL
            SELECT CAST(0.5 AS DOUBLE), quantile_disc(logit, 0.5) FROM l
            UNION ALL
            SELECT CAST(0.75 AS DOUBLE), quantile_disc(logit, 0.75) FROM l
            UNION ALL
            SELECT CAST(0.9 AS DOUBLE), quantile_disc(logit, 0.9) FROM l
            UNION ALL
            SELECT CAST(0.99 AS DOUBLE), quantile_disc(logit, 0.99) FROM l
        """,
        # mirrors _q_approx_score_quantiles: the KLL sketch is
        # randomized, so the VALUES are not SQL-reproducible — what IS
        # exact is the contract the query emits: the quantile grid, the
        # corpus count (one logit per document, never NaN), and the
        # self-verified within_bounds flag, which the engine computes
        # from an EXACT rank-count pass and which is TRUE iff the sketch
        # honors its eps·n guarantee.  A broken sketch flips the hash.
        "approx_score_quantiles": f"""
            SELECT t.q_micro,
                   (SELECT count(*) FROM documents) AS n,
                   TRUE AS within_bounds
            FROM (VALUES (100000), (250000), (500000), (750000),
                         (900000), (990000)) AS t(q_micro)
            ORDER BY t.q_micro
        """,
        # mirrors _q_approx_source_quantiles: same contract as
        # approx_score_quantiles but per source — the per-source n is
        # data-derived, within_bounds asserts the per-group KLL bound
        "approx_source_quantiles": f"""
            WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                       FROM documents GROUP BY source)
            SELECT n.source, t.q_micro, n.n, TRUE AS within_bounds
            FROM n CROSS JOIN (VALUES (250000), (500000), (750000))
                 AS t(q_micro)
            ORDER BY n.source, t.q_micro
        """,
        # mirrors _q_winsorize_logit: least/greatest against the same
        # quantile_disc thresholds over the SAME quantized logit column
        "winsorize_logit": f"""
            WITH f AS (
              SELECT doc_id,
                     CAST(length(regexp_extract_all(text, $${wsre}$$)) AS BIGINT)
                       AS n_words,
                     round(length(regexp_extract_all(text, $${punct}$$))
                           / greatest(length(text), 1), 6) AS punct_ratio,
                     round(length(regexp_extract_all(text, $${stop}$$))
                           / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                       AS stopword_ratio,
                     round((length(text) - (length(regexp_extract_all(text, $${wsre}$$)) - 1))
                           / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                       AS mean_word_len
              FROM documents
            ),
            l AS (
              SELECT doc_id,
                     round(((((-0.6 + (-8.0 * punct_ratio))
                              + (6.0 * stopword_ratio))
                             + (-0.25 * mean_word_len))
                            + (0.35 * ln(1.0 + n_words))) * 1000000)
                       / 1000000.0 AS logit
              FROM f
            ),
            t AS (SELECT quantile_disc(logit, 0.05) AS lo,
                         quantile_disc(logit, 0.95) AS hi FROM l)
            SELECT l.doc_id, l.logit,
                   least(greatest(l.logit, t.lo), t.hi) AS logit_w
            FROM l CROSS JOIN t
        """,
        # mirrors _q_source_heavy_hitters: the per-source sibling of the
        # heavy_hitters mirror — exact counts above the integer threshold
        "source_heavy_hitters": """
            WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
                       FROM documents),
                 c AS (SELECT source, word, CAST(count(*) AS BIGINT) AS n
                       FROM w WHERE word <> '' GROUP BY 1, 2),
                 tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tok
                         FROM c GROUP BY 1)
            SELECT c.source, c.word, c.n
            FROM c JOIN tot t USING (source)
            WHERE c.n * 30 > t.n_tok * 1
        """,
        # mirrors _q_weighted_length_quantiles: weighted percentile_disc
        # (smallest v whose cumulative weight reaches ceil(q*W)) via the
        # same window-cumsum rule as the engine's histogram extract
        "weighted_length_quantiles": """
            WITH t AS (SELECT source,
                              CAST(length(regexp_extract_all(text, $$\\S+$$))
                                   AS BIGINT) AS v,
                              n_chars AS w
                       FROM documents),
                 h AS (SELECT source, v, CAST(SUM(w) AS BIGINT) AS w
                       FROM t GROUP BY 1, 2),
                 c AS (SELECT source, v,
                              SUM(w) OVER (PARTITION BY source ORDER BY v)
                                AS cw,
                              SUM(w) OVER (PARTITION BY source) AS tw
                       FROM h)
            SELECT source,
                   MIN(CASE WHEN cw >= greatest(1, CAST(ceil(0.25 * tw)
                        AS BIGINT)) THEN v END) AS wq25,
                   MIN(CASE WHEN cw >= greatest(1, CAST(ceil(0.50 * tw)
                        AS BIGINT)) THEN v END) AS wq50,
                   MIN(CASE WHEN cw >= greatest(1, CAST(ceil(0.75 * tw)
                        AS BIGINT)) THEN v END) AS wq75
            FROM c GROUP BY source
        """,
        # mirrors _q_spearman_length_tokens: doubled average ranks from
        # the marginal histograms (window cumsum), then the identical
        # Pearson-on-ranks double expression over exact int64 moments
        "spearman_length_tokens": """
            WITH t AS (SELECT CAST(n_chars AS BIGINT) AS x,
                              CAST(length(regexp_extract_all(text, $$\\S+$$))
                                   AS BIGINT) AS y
                       FROM documents),
                 hx AS (SELECT x, CAST(count(*) AS BIGINT) AS c
                        FROM t GROUP BY x),
                 rx AS (SELECT x,
                               2 * (SUM(c) OVER (ORDER BY x) - c) + c + 1
                                 AS a
                        FROM hx),
                 hy AS (SELECT y, CAST(count(*) AS BIGINT) AS c
                        FROM t GROUP BY y),
                 ry AS (SELECT y,
                               2 * (SUM(c) OVER (ORDER BY y) - c) + c + 1
                                 AS b
                        FROM hy),
                 j AS (SELECT CAST(rx.a AS BIGINT) AS a,
                              CAST(ry.b AS BIGINT) AS b
                       FROM t JOIN rx USING (x) JOIN ry USING (y)),
                 s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                              CAST(sum(a) AS BIGINT) AS sa,
                              CAST(sum(b) AS BIGINT) AS sb,
                              CAST(sum(a * b) AS BIGINT) AS sab,
                              CAST(sum(a * a) AS BIGINT) AS saa,
                              CAST(sum(b * b) AS BIGINT) AS sbb
                       FROM j)
            SELECT n,
                   CASE WHEN (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                             * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                                - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) > 0
                        THEN (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                              - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                             / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                                     - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                                    * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                                       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
                        ELSE 0.0 END AS spearman
            FROM s
        """,
        # mirrors _q_lang_source_mi: per-cell micro-quantized MI and
        # chi-square terms over the nonzero contingency, zero cells in
        # closed form, final doubles replayed op-for-op
        "lang_source_mi": """
            WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
                       FROM documents GROUP BY 1, 2),
                 n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
                 r AS (SELECT lang, CAST(sum(c) AS BIGINT) AS r
                       FROM c GROUP BY 1),
                 k AS (SELECT source, CAST(sum(c) AS BIGINT) AS k
                       FROM c GROUP BY 1),
                 cell AS (SELECT CAST(c.c AS DOUBLE) AS c,
                                 CAST(r.r AS DOUBLE) * CAST(k.k AS DOUBLE)
                                   / CAST(n.n AS DOUBLE) AS e,
                                 (CAST(c.c AS DOUBLE) * CAST(n.n AS DOUBLE))
                                   / (CAST(r.r AS DOUBLE)
                                      * CAST(k.k AS DOUBLE)) AS lr
                          FROM c JOIN r USING (lang) JOIN k USING (source)
                               CROSS JOIN n),
                 s AS (SELECT
                         CAST(sum(CAST(round(c * ln(lr) * 1000000)
                                       AS BIGINT)) AS BIGINT) AS mi_micro,
                         CAST(sum(CAST(round((c - e) * (c - e) / e * 1000000)
                                       AS BIGINT)) AS BIGINT) AS chi_nz,
                         CAST(sum(CAST(round(e * 1000000) AS BIGINT))
                              AS BIGINT) AS e_nz
                       FROM cell),
                 d AS (SELECT (SELECT count(*) FROM r) AS nr,
                              (SELECT count(*) FROM k) AS nk)
            SELECT n.n AS n,
                   (CAST(s.mi_micro AS DOUBLE) / 1000000.0)
                     / CAST(n.n AS DOUBLE) AS mi,
                   CAST(s.chi_nz + (n.n * 1000000 - s.e_nz) AS DOUBLE)
                     / 1000000.0 AS chi2,
                   CASE WHEN least(d.nr, d.nk) > 1
                             AND s.chi_nz + (n.n * 1000000 - s.e_nz) > 0
                        THEN sqrt((CAST(s.chi_nz + (n.n * 1000000 - s.e_nz)
                                        AS DOUBLE) / 1000000.0)
                                  / (CAST(n.n AS DOUBLE)
                                     * CAST(least(d.nr, d.nk) - 1
                                            AS DOUBLE)))
                        ELSE 0.0 END AS cramers_v
            FROM n CROSS JOIN s CROSS JOIN d
        """,
        # mirrors _q_stratified_kfold: the engine's stratum order is
        # (hash bucket, hash, id); one window rank replays it
        "stratified_kfold": """
            WITH h AS (SELECT doc_id, lang,
                              ((md5_number(CAST(doc_id AS VARCHAR))
                                % 18446744073709551616)
                               + 18446744073709551616)
                                % 18446744073709551616 AS h
                       FROM documents)
            SELECT doc_id, lang,
                   CAST((row_number() OVER (PARTITION BY lang
                                            ORDER BY h % 256, h, doc_id)
                         - 1) % 5 AS BIGINT) AS fold
            FROM h
        """,
        # mirrors _q_source_gini: rank-weighted sum via window
        # row_number (tie order irrelevant — equal values), identical
        # final double expression
        "source_gini": """
            WITH t AS (SELECT source, CAST(n_chars AS BIGINT) AS v
                       FROM documents),
                 r AS (SELECT source, v,
                              row_number() OVER (PARTITION BY source
                                                 ORDER BY v) AS rn
                       FROM t),
                 s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                              CAST(sum(v) AS BIGINT) AS total,
                              CAST(sum(rn * v) AS BIGINT) AS s
                       FROM r GROUP BY source)
            SELECT source, n, total,
                   CASE WHEN total > 0
                        THEN (2.0 * CAST(s AS DOUBLE)
                              - CAST(n + 1 AS DOUBLE)
                                * CAST(total AS DOUBLE))
                             / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
                        ELSE 0.0 END AS gini
            FROM s
        """,
        # mirrors _q_source_score_quantiles: per-source quantile_disc
        # over the SAME quantized logit column (grouped selection)
        "source_score_quantiles": f"""
            WITH f AS (
              SELECT doc_id, source,
                     CAST(length(regexp_extract_all(text, $${wsre}$$)) AS BIGINT)
                       AS n_words,
                     round(length(regexp_extract_all(text, $${punct}$$))
                           / greatest(length(text), 1), 6) AS punct_ratio,
                     round(length(regexp_extract_all(text, $${stop}$$))
                           / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                       AS stopword_ratio,
                     round((length(text) - (length(regexp_extract_all(text, $${wsre}$$)) - 1))
                           / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                       AS mean_word_len
              FROM documents
            ),
            l AS (
              SELECT source,
                     round(((((-0.6 + (-8.0 * punct_ratio))
                              + (6.0 * stopword_ratio))
                             + (-0.25 * mean_word_len))
                            + (0.35 * ln(1.0 + n_words))) * 1000000)
                       / 1000000.0 AS logit
              FROM f
            )
            SELECT source, CAST(0.25 AS DOUBLE) AS q,
                   quantile_disc(logit, 0.25) AS value FROM l GROUP BY source
            UNION ALL
            SELECT source, CAST(0.5 AS DOUBLE),
                   quantile_disc(logit, 0.5) FROM l GROUP BY source
            UNION ALL
            SELECT source, CAST(0.9 AS DOUBLE),
                   quantile_disc(logit, 0.9) FROM l GROUP BY source
        """,
        # mirrors _q_quality_gate_by_source: docs at/above their
        # source's median logit (same quantized column both sides)
        "quality_gate_by_source": f"""
            WITH f AS (
              SELECT doc_id, source,
                     CAST(length(regexp_extract_all(text, $${wsre}$$)) AS BIGINT)
                       AS n_words,
                     round(length(regexp_extract_all(text, $${punct}$$))
                           / greatest(length(text), 1), 6) AS punct_ratio,
                     round(length(regexp_extract_all(text, $${stop}$$))
                           / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                       AS stopword_ratio,
                     round((length(text) - (length(regexp_extract_all(text, $${wsre}$$)) - 1))
                           / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                       AS mean_word_len
              FROM documents
            ),
            l AS (
              SELECT doc_id, source,
                     round(((((-0.6 + (-8.0 * punct_ratio))
                              + (6.0 * stopword_ratio))
                             + (-0.25 * mean_word_len))
                            + (0.35 * ln(1.0 + n_words))) * 1000000)
                       / 1000000.0 AS logit
              FROM f
            ),
            thr AS (
              SELECT source, quantile_disc(logit, 0.5) AS t
              FROM l GROUP BY source
            )
            SELECT l.doc_id, l.source, l.logit
            FROM l JOIN thr USING (source)
            WHERE l.logit >= thr.t
        """,
        "lang_id": f"""
            WITH c AS (SELECT doc_id, {lang_counts} FROM documents)
            SELECT doc_id, c_en, c_es, c_de, c_fr,
                   CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
                        WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
                        WHEN c_de >= c_fr THEN 'de'
                        ELSE 'fr' END AS predicted_lang
            FROM c
        """,
        # mirrors stages/stats.py grouped_percent_rank: RANK-semantics
        # percent_rank, (#less)/(N-1) as one int/int double division
        "source_percent_rank": """
            SELECT doc_id, source, n_chars,
                   percent_rank() OVER (
                     PARTITION BY source ORDER BY n_chars
                   ) AS pct_rank
            FROM documents
        """,
        "fingerprint_md5": "SELECT doc_id, md5(text) AS fp_md5 FROM documents",
        "fingerprint_rolling": _fp_rolling_oracle_sql(),
        "kmeans_clusters": _kmeans_oracle_sql(8, 2),
        "embedding_gram": """
            WITH vq AS (SELECT vec_id,
                               list_transform(embedding, e ->
                                   CAST(floor(CAST(e AS DOUBLE) * 1000000
                                              + 0.5) AS BIGINT)) AS q
                        FROM embeddings),
                 vu AS (SELECT vec_id, unnest(q) AS v,
                               unnest(range(len(q))) AS i
                        FROM vq)
            SELECT a.i AS i, b.i AS j, CAST(sum(a.v * b.v) AS BIGINT) AS gram
            FROM vu a JOIN vu b USING (vec_id)
            GROUP BY 1, 2
        """,
        "cluster_outliers": f"""
            WITH asg AS ({_kmeans_oracle_sql(8, 2)})
            SELECT vec_id, cluster, dist FROM asg
            ORDER BY dist DESC, vec_id LIMIT 20
        """,
        "semdedup_keep": f"""
            WITH asg AS ({_kmeans_oracle_sql(8, 2)}),
                 e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
                 losers AS (SELECT DISTINCT a2.vec_id AS vec_id
                            FROM asg a1
                            JOIN asg a2 ON a1.cluster = a2.cluster
                                       AND a1.vec_id < a2.vec_id
                            JOIN e e1 ON e1.vec_id = a1.vec_id
                            JOIN e e2 ON e2.vec_id = a2.vec_id
                            WHERE list_cosine_similarity(e1.v, e2.v)
                                    >= {_SEMDEDUP_TH})
            SELECT a.vec_id, a.cluster, (l.vec_id IS NULL) AS keep
            FROM asg a LEFT JOIN losers l USING (vec_id)
        """,
        "dedup_minhash": _minhash_oracle_sql(0.7),
        "dedup_minhash_keep": _minhash_keep_oracle_sql(0.7),
        # counts-of-counts over the SAME verified component CTE
        "dedup_cluster_sizes": f"""
            WITH k AS ({_minhash_keep_oracle_sql(0.7)}),
            sizes AS (SELECT component, count(*) AS s FROM k GROUP BY 1)
            SELECT CAST(s AS BIGINT) AS cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters
            FROM sizes GROUP BY s
        """,
        "bm25_scores": _bm25_oracle_sql(_BM25_TERMS),
        # mirrors stages/relevance.py tfidf_topterms: \S+ tokens, one tf
        # row per (doc, word), df = count of tf rows per word,
        # idf = ln((1+N)/(1+df)), quantize6 BEFORE the (score desc,
        # word asc) row_number ranking — identical tie-break to the
        # engine's stable pandas sort
        "tfidf_topterms": """
            WITH words AS (
              SELECT doc_id, unnest(regexp_extract_all(text, $$\\S+$$)) AS word
              FROM documents
            ),
            tf AS (
              SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
              FROM words GROUP BY doc_id, word
            ),
            df AS (
              SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
            ),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.word,
                     round(CAST(tf.tf AS DOUBLE)
                           * ln((1.0 + n.n_docs) / (1.0 + CAST(df.df AS DOUBLE)))
                           * 1000000) / 1000000.0 AS score
              FROM tf JOIN df USING (word) CROSS JOIN n
            ),
            ranked AS (
              SELECT doc_id, word, score,
                     row_number() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, word ASC
                     ) AS rk
              FROM scored
            )
            SELECT doc_id, word, score FROM ranked WHERE rk <= 5
        """,
        # mirrors _q_shipping_priority: same segment slice, date cuts,
        # per-order revenue sum quantized to cents BEFORE the
        # (revenue desc, o_orderdate asc, o_orderkey asc) top-10
        "shipping_priority": f"""
            WITH bld AS (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            ),
            o AS (
              SELECT o_orderkey, o_orderdate, o_orderpriority
              FROM orders JOIN bld ON o_custkey = c_custkey
              WHERE o_orderdate < TIMESTAMP '{_SHIP_CUTOFF}'
            ),
            l AS (
              SELECT l_orderkey AS o_orderkey,
                     l_extendedprice * (1.0 - l_discount) AS rev
              FROM lineitem WHERE l_shipdate > TIMESTAMP '{_SHIP_CUTOFF}'
            ),
            g AS (
              SELECT l.o_orderkey,
                     round(sum(rev) * 100) / 100.0 AS revenue,
                     o.o_orderdate, o.o_orderpriority
              FROM l JOIN o ON l.o_orderkey = o.o_orderkey
              GROUP BY l.o_orderkey, o.o_orderdate, o.o_orderpriority
            )
            SELECT * FROM g
            ORDER BY revenue DESC, o_orderdate ASC, o_orderkey ASC LIMIT 10
        """,
        # mirrors stages/windows.py funnel_reached: first-view anchor,
        # strictly-after cascade, reached = 1 + step memberships
        "events_funnel": """
            WITH v AS (
              SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ),
            c AS (
              SELECT e.user_id, min(e.ts) AS t2
              FROM events e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts > v.t1
              GROUP BY e.user_id
            ),
            p AS (
              SELECT e.user_id, min(e.ts) AS t3
              FROM events e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.t2
              GROUP BY e.user_id
            )
            SELECT v.user_id,
                   CAST(1 + (CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
                          + (CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS reached
            FROM v
            LEFT JOIN c ON v.user_id = c.user_id
            LEFT JOIN p ON v.user_id = p.user_id
        """,
        # mirrors stages/stats.py grouped_entropy: integer micro-term
        # inner sum (round(n*ln(n)*1e6) as BIGINT, order-free), outer
        # expression = identical float ops on identical operands
        "lang_entropy": """
            WITH c AS (
              SELECT source, lang, CAST(count(*) AS BIGINT) AS n
              FROM documents GROUP BY source, lang
            ),
            t AS (
              SELECT source,
                     CAST(sum(n) AS BIGINT) AS n_docs,
                     CAST(count(*) AS BIGINT) AS n_langs,
                     CAST(sum(CAST(round(n * ln(n) * 1000000) AS BIGINT))
                          AS BIGINT) AS s_micro
              FROM c GROUP BY source
            )
            SELECT source, n_docs, n_langs, s_micro,
                   ln(n_docs) - s_micro / (n_docs * 1000000.0) AS entropy
            FROM t
        """,
        # mirrors stages/stats.py global_rank: (n_chars desc, doc_id asc)
        # total order, 1-based rank, percentile = rank / N
        "global_rank": """
            SELECT doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(row_number() OVER (
                     ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS doc_rank,
                   CAST(row_number() OVER (
                     ORDER BY n_chars DESC, doc_id ASC) AS DOUBLE)
                     / (SELECT count(*) FROM documents) AS percentile
            FROM documents
        """,
        # mirrors stages/charlm.py charlm_scores: 96-symbol alphabet
        # (code points 32..126 keep themselves minus 32, everything else
        # folds to symbol 95), Laplace ilog = round(ln((c+1)/(tot+96))
        # * 1e6) as int64, integer per-doc sums (order-free), and the
        # identical final division
        "charlm_scores": """
            WITH syms AS (
              SELECT doc_id,
                     CASE WHEN a BETWEEN 32 AND 126 THEN a - 32 ELSE 95 END AS s1,
                     CASE WHEN b BETWEEN 32 AND 126 THEN b - 32 ELSE 95 END AS s2
              FROM (
                SELECT doc_id,
                       ascii(substring(text, CAST(i AS INTEGER), 1)) AS a,
                       ascii(substring(text, CAST(i AS INTEGER) + 1, 1)) AS b
                FROM documents, unnest(range(1, length(text))) AS t(i)
              )
            ),
            counts AS (
              SELECT s1, s2, CAST(count(*) AS BIGINT) AS n
              FROM syms GROUP BY s1, s2
            ),
            rowt AS (SELECT s1, CAST(sum(n) AS BIGINT) AS tot FROM counts GROUP BY s1),
            grid AS (
              SELECT g1.a AS s1, g2.a AS s2
              FROM (SELECT unnest(range(0, 96)) AS a) g1,
                   (SELECT unnest(range(0, 96)) AS a) g2
            ),
            tbl AS (
              SELECT grid.s1, grid.s2,
                     CAST(round(ln((COALESCE(counts.n, 0) + 1.0)
                                   / (COALESCE(rowt.tot, 0) + 96.0))
                                * 1000000) AS BIGINT) AS ilog
              FROM grid
              LEFT JOIN counts ON grid.s1 = counts.s1 AND grid.s2 = counts.s2
              LEFT JOIN rowt ON grid.s1 = rowt.s1
            ),
            per_doc AS (
              SELECT syms.doc_id,
                     CAST(count(*) AS BIGINT) AS n_pairs,
                     CAST(sum(tbl.ilog) AS BIGINT) AS lp_micro
              FROM syms JOIN tbl ON syms.s1 = tbl.s1 AND syms.s2 = tbl.s2
              GROUP BY syms.doc_id
            )
            SELECT d.doc_id,
                   COALESCE(p.n_pairs, 0) AS n_pairs,
                   COALESCE(p.lp_micro, 0) AS lp_micro,
                   CASE WHEN p.n_pairs > 0
                        THEN CAST(p.lp_micro AS DOUBLE) / (p.n_pairs * 1000000.0)
                        ELSE 0.0 END AS avg_lp
            FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        """,
        "hll_registers": f"""
            WITH w AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
                       FROM documents),
                 h AS (SELECT {_sql_u64('word')} AS h FROM w
                       WHERE word <> ''),
                 parts AS (SELECT CAST(h // 4503599627370496 AS BIGINT) AS bucket,
                                  CAST(h % 4503599627370496 AS BIGINT) AS rest
                           FROM h),
                 rho AS (SELECT bucket,
                                CASE WHEN rest = 0 THEN 53
                                     ELSE 52 - (length(to_base(rest, 2)) - 1)
                                END AS rho
                         FROM parts)
            SELECT bucket, CAST(max(rho) AS BIGINT) AS max_rho
            FROM rho GROUP BY bucket
        """,
        "stratified_sample": f"""
            WITH h AS (SELECT doc_id, source,
                              CAST(({_sql_u64("CAST(doc_id AS VARCHAR)")}) // 2
                                   AS BIGINT) AS hkey
                       FROM documents),
                 r AS (SELECT *, row_number() OVER (
                          PARTITION BY source ORDER BY hkey, doc_id) AS rn
                       FROM h)
            SELECT doc_id, source, hkey FROM r WHERE rn <= 5
        """,
        "heavy_hitters": """
            WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                       FROM documents),
                 c AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w
                       WHERE word <> '' GROUP BY 1),
                 tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_n FROM c)
            SELECT word, n FROM c, tot WHERE n * 30 > total_n * 1
        """,
        "token_quantiles_by_source": f"""
            SELECT source,
                   CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n)
                        AS BIGINT) AS p50,
                   CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n)
                        AS BIGINT) AS p90,
                   CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n)
                        AS BIGINT) AS p99
            FROM (SELECT source,
                         CAST(length(regexp_extract_all(text, $${wsre}$$))
                              AS BIGINT) AS n
                  FROM documents)
            GROUP BY source
        """,
        "split_assign": f"""
            SELECT doc_id,
                   CAST(h % 100 AS BIGINT) AS bucket,
                   CASE WHEN h % 100 < 90 THEN 'train'
                        WHEN h % 100 < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         {_sql_u64("CAST(doc_id AS VARCHAR)")} AS h
                  FROM documents)
        """,
        "decontaminate": _decontaminate_oracle_sql(),
        "dup_ngrams": f"""
            WITH {_sql_shingle_ctes()},
            expl AS (SELECT doc_id, unnest(sh) AS h FROM sh),
            per AS (SELECT doc_id, h, CAST(count(*) AS BIGINT) AS cnt
                    FROM expl GROUP BY 1, 2),
            shared AS (SELECT h FROM per GROUP BY h HAVING count(*) >= 2),
            dup AS (SELECT p.doc_id, CAST(sum(p.cnt) AS BIGINT) AS dup_grams
                    FROM per p JOIN shared s USING (h) GROUP BY 1)
            SELECT s.doc_id, CAST(len(s.sh) AS BIGINT) AS n_grams,
                   CAST(coalesce(d.dup_grams, 0) AS BIGINT) AS dup_grams
            FROM sh s LEFT JOIN dup d USING (doc_id)
        """,
        # mirrors stages/dedup.py dup_span_strip: 1-based word
        # subscripts; shingle at subscript i covers words i..i+2 (the
        # overflow past a short doc's length is harmless on both sides)
        "dup_span_strip": f"""
            WITH {_sql_shingle_ctes()},
            occ AS (SELECT doc_id, unnest(sh) AS h,
                           generate_subscripts(sh, 1) AS i
                    FROM sh),
            shared AS (SELECT h FROM occ
                       GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
            cov AS (SELECT DISTINCT o.doc_id, o.i + u.d AS j
                    FROM occ o JOIN shared s USING (h)
                    CROSS JOIN (SELECT unnest([0, 1, 2]) AS d) u),
            w AS (SELECT doc_id, unnest(ws) AS w,
                         generate_subscripts(ws, 1) AS i
                  FROM docs),
            kept AS (SELECT w.doc_id, w.w, w.i
                     FROM w LEFT JOIN cov
                       ON w.doc_id = cov.doc_id AND w.i = cov.j
                     WHERE cov.j IS NULL),
            agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS txt,
                           count(*) AS n_kept
                    FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.txt, '') AS kept_text,
                   CAST(len(d.ws) AS BIGINT) AS n_words,
                   CAST(len(d.ws) - coalesce(a.n_kept, 0) AS BIGINT)
                     AS n_removed
            FROM docs d LEFT JOIN agg a USING (doc_id)
        """,
        # keep-first variant: the rn=1 occurrence per shared shingle
        # (ORDER BY doc_id, i) keeps its span; rn>1 occurrences strip
        "dup_span_keep_first": f"""
            WITH {_sql_shingle_ctes()},
            occ AS (SELECT doc_id, unnest(sh) AS h,
                           generate_subscripts(sh, 1) AS i
                    FROM sh),
            shared AS (SELECT h FROM occ
                       GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
            so AS (SELECT o.doc_id, o.h, o.i,
                          row_number() OVER (
                            PARTITION BY o.h ORDER BY o.doc_id, o.i
                          ) AS rn
                   FROM occ o JOIN shared s USING (h)),
            cov AS (SELECT DISTINCT doc_id, i + u.d AS j
                    FROM so CROSS JOIN (SELECT unnest([0, 1, 2]) AS d) u
                    WHERE rn > 1),
            w AS (SELECT doc_id, unnest(ws) AS w,
                         generate_subscripts(ws, 1) AS i
                  FROM docs),
            kept AS (SELECT w.doc_id, w.w, w.i
                     FROM w LEFT JOIN cov
                       ON w.doc_id = cov.doc_id AND w.i = cov.j
                     WHERE cov.j IS NULL),
            agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS txt,
                           count(*) AS n_kept
                    FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(a.txt, '') AS kept_text,
                   CAST(len(d.ws) AS BIGINT) AS n_words,
                   CAST(len(d.ws) - coalesce(a.n_kept, 0) AS BIGINT)
                     AS n_removed
            FROM docs d LEFT JOIN agg a USING (doc_id)
        """,
        "dedup_simhash": _simhash_oracle_sql(3),
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, md5(text) AS content_hash,
                   count(*) AS n_dups
            FROM documents GROUP BY text
        """,
        "dedup_exact_stats": """
            SELECT CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(sum(cnt - 1) AS BIGINT) AS n_redundant,
                   CAST(max(cnt) AS BIGINT) AS max_group
            FROM (SELECT count(*) AS cnt FROM documents GROUP BY text)
        """,
        "dedup_exact_rows": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
        """,
        "ngram_jaccard_pairs": f"""
            WITH w AS (SELECT doc_id, source,
                              list_distinct(string_split(text, ' ')) AS ws
                       FROM documents)
            SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                   round(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
                         / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))),
                         6) AS jaccard
            FROM w a JOIN w b ON a.source = b.source AND a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
                  / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)))
                  >= {_JACCARD_TH}
        """,
        # the 4/5 integer length filter is implied by jaccard >= 0.8 (a
        # float 0.8*greatest join filter would EXCLUDE exact-4/5 pairs:
        # fl(0.8) > 4/5, e.g. lw 4 vs 5 with a 4-token intersection);
        # the threshold applies to the RAW quotient, rounding only in
        # the projection (ADVICE r3 lesson)
        "prefix_filter_pairs": """
            WITH w AS (SELECT doc_id,
                              list_distinct(string_split(text, ' ')) AS ws,
                              len(list_distinct(string_split(text, ' '))) AS lw
                       FROM documents WHERE length(text) > 0)
            SELECT left_id, right_id, round(j, 6) AS jaccard FROM (
              SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                     CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
                       / (a.lw + b.lw - len(list_intersect(a.ws, b.ws))) AS j
              FROM w a JOIN w b
                ON a.doc_id < b.doc_id
               AND least(a.lw, b.lw) * 5 >= greatest(a.lw, b.lw) * 4)
            WHERE j >= 0.8
        """,
        "embedding_neardup": f"""
            WITH e AS (SELECT vec_id, label,
                              CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings)
            SELECT a.vec_id AS left_id, b.vec_id AS right_id,
                   round(list_cosine_similarity(a.v, b.v) * 1000000) / 1000000.0 AS cosine
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= {_NEARDUP_TH}
        """,
        "knn_ivf": _knn_ivf_oracle_sql(),
        "knn_lsh": _knn_lsh_oracle_sql(),
        "multimodal_meta": _multimodal_meta_oracle_sql(),
        "knn_bruteforce": f"""
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < {_N_QUERIES}),
                 c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
                       FROM embeddings WHERE vec_id >= {_N_QUERIES}),
                 s AS (SELECT q.query_id, c.vec_id,
                              round(list_cosine_similarity(c.cv, q.qv) * 1000000) / 1000000.0 AS cosine
                       FROM q CROSS JOIN c)
            SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
              SELECT query_id, vec_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, vec_id) AS rank
              FROM s)
            WHERE rank <= {_KNN_K}
        """,
        "conversion_metrics": f"""
            WITH base AS (
              SELECT {_SQL_FORMAT} AS format,
                     {_SQL_NTEXT} AS n_text,
                     {_SQL_NMEDIA} AS m,
                     {_SQL_ERROR} AS error
              FROM documents)
            SELECT format, count(*) AS n_docs,
                   CAST(sum(CASE WHEN error <> '' THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_errors,
                   CAST(sum(n_text + m) AS BIGINT) AS total_spans,
                   CAST(sum(m) AS BIGINT) AS total_media
            FROM base GROUP BY format
        """,
        "orders_per_customer": """
            SELECT c.c_custkey AS custkey, c.c_name,
                   CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
                   round(coalesce(sum(o.o_totalprice), 0) * 1000000) / 1000000.0 AS total_price
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        """,
        "events_attribution": """
            WITH a AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                       FROM events WHERE event_type = 'purchase'),
                 b AS (SELECT event_id AS matched_event_id, user_id,
                              epoch_us(ts) AS matched_ts_us
                       FROM events WHERE event_type = 'click')
            SELECT a.event_id, a.user_id, a.ts_us,
                   coalesce(b.matched_event_id, -1) AS matched_event_id,
                   coalesce(b.matched_ts_us, -1) AS matched_ts_us
            FROM a ASOF LEFT JOIN b
              ON a.user_id = b.user_id AND a.ts_us >= b.matched_ts_us
        """,
        "events_props_extract": """
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1)
                                 AS BIGINT)) AS BIGINT) AS sum_k
            FROM events GROUP BY 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                   round(sum(l_quantity) * 100) / 100.0 AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)) * 100) / 100.0
                     AS sum_revenue
            FROM lineitem GROUP BY 1, 2
        """,
        "quality_filter": f"""
            WITH q AS (
              SELECT lang,
                     length(regexp_extract_all(text, $${ta.WS_TOKEN_RE}$$))
                       AS n_words,
                     round(length(regexp_extract_all(text, $${ta.STOPWORD_RE}$$))
                           / greatest(length(regexp_extract_all(text, $${ta.WS_TOKEN_RE}$$)), 1), 6)
                       AS stopword_ratio
              FROM documents)
            SELECT lang, count(*) AS n_kept FROM q
            WHERE n_words >= 20 AND stopword_ratio <= 0.25
            GROUP BY 1
        """,
        "events_distinct_users": """
            SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1
        """,
        "multimodal_dims": f"""
            WITH base AS (SELECT doc_id, {_SQL_NMEDIA} AS m FROM documents),
                 series AS (SELECT unnest(generate_series(
                     1, GREATEST(1, (SELECT MAX((m + 1) // 2) FROM base))
                 )) AS i),
                 t AS (SELECT b.doc_id,
                              'table-' || CAST(s.i AS VARCHAR) || '.png' AS filename,
                              'table' AS kind
                       FROM base b JOIN series s ON s.i <= (b.m + 1) // 2),
                 p AS (SELECT b.doc_id,
                              'picture-' || CAST(s.i AS VARCHAR) || '.png' AS filename,
                              'picture' AS kind
                       FROM base b JOIN series s ON s.i <= b.m // 2)
            SELECT doc_id, filename, kind,
                   -- 4 * image_resolution_scale px; flagship config uses the
                   -- reference default scale 4 (service.py:17) -> 16x16
                   CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
                   CAST(8 AS INTEGER) AS bit_depth, true AS valid_png
            FROM (SELECT * FROM t UNION ALL SELECT * FROM p)
        """,
        "topk_longest_docs": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id LIMIT 20
        """,
        "topk_docs_per_source": """
            SELECT doc_id, source, n_chars, CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY n_chars DESC, doc_id) AS rank
              FROM documents)
            WHERE rank <= 3
        """,
        "distinct_lang_source": "SELECT DISTINCT lang, source FROM documents",
        "sample_systematic": """
            SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 20 = 0
        """,
        "docs_region_join": """
            SELECT d.doc_id, r.r_name AS region_name
            FROM documents d JOIN region r ON r.r_regionkey = d.doc_id % 5
        """,
        "events_sliding": """
            WITH x AS (
              SELECT e.event_type, e.value,
                     epoch_us(e.ts) // 1000000 AS sec,
                     ((epoch_us(e.ts) // 1000000) // 900) * 900 - 900 * i.i
                       AS window_start
              FROM events e,
                   (SELECT unnest(generate_series(0, 3)) AS i) i)
            SELECT event_type, window_start, count(*) AS n_events,
                   round(sum(value) * 1000000) / 1000000.0 AS sum_value
            FROM x WHERE window_start > sec - 3600
            GROUP BY 1, 2
        """,
        "events_sessions": """
            WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec, value,
                              event_id
                       FROM events),
                 f AS (SELECT *,
                              CASE WHEN lag(sec) OVER w IS NULL THEN 1
                                   WHEN sec - lag(sec) OVER w > 1800 THEN 1
                                   ELSE 0 END AS is_new
                       FROM e
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY sec, event_id)),
                 g AS (SELECT *,
                              sum(is_new) OVER (PARTITION BY user_id
                                                ORDER BY sec, event_id
                                                ROWS UNBOUNDED PRECEDING)
                                AS sid
                       FROM f)
            SELECT user_id, CAST(min(sec) AS BIGINT) AS session_start,
                   count(*) AS n_events, round(sum(value) * 1000000) / 1000000.0 AS sum_value
            FROM g GROUP BY user_id, sid
        """,
        "events_hourly": """
            SELECT event_type,
                   (epoch_us(ts) // 3600000000) * 3600 AS window_start,
                   count(*) AS n_events,
                   round(sum(value) * 1000000) / 1000000.0 AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "docs_stats_by_source": """
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   round(sum(n_chars) / CAST(count(*) AS DOUBLE), 6) AS avg_chars
            FROM documents GROUP BY source
        """,
        "rollup_counts": """
            SELECT coalesce(source, '<all>') AS source,
                   coalesce(lang, '<all>') AS lang,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS chars_total
            FROM documents GROUP BY ROLLUP(source, lang)
        """,
        "pivot_lang_format": f"""
            WITH f AS (SELECT lang, {_SQL_FORMAT} AS format FROM documents)
            SELECT lang,
                   count(*) FILTER (format = 'pdf') AS n_pdf,
                   count(*) FILTER (format = 'docx') AS n_docx,
                   count(*) FILTER (format = 'pptx') AS n_pptx,
                   count(*) FILTER (format = 'html') AS n_html,
                   count(*) FILTER (format = 'image') AS n_image,
                   count(*) FILTER (format = 'md') AS n_md,
                   count(*) FILTER (format = 'asciidoc') AS n_asciidoc,
                   count(*) FILTER (format = '') AS n_other
            FROM f GROUP BY lang
        """,
        "events_gaps": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                              lag(epoch_us(ts)) OVER (
                                PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS prev
                       FROM events)
            SELECT user_id,
                   count(prev) AS n_gaps,
                   CAST(coalesce(sum(ts_us - prev), 0) AS BIGINT) AS total_gap_us,
                   CAST(coalesce(max(ts_us - prev), -1) AS BIGINT) AS max_gap_us
            FROM e GROUP BY user_id
        """,
        "customers_no_orders": f"""
            SELECT c_custkey AS custkey, c_name, c_acctbal
            FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate < TIMESTAMP '{_NOORD_CUTOFF}')
        """,
        "local_supplier_volume": f"""
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)) * 100) / 100.0
                     AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '{_Q5_YEAR_LO}'
              AND o_orderdate <  TIMESTAMP '{_Q5_YEAR_HI}'
            GROUP BY n_name
        """,
        "bloom_decontaminate": f"""
            WITH h AS (SELECT doc_id, {_sql_u64('text')} AS u FROM documents),
                 hh AS (SELECT doc_id, u % 131072 AS h1,
                               (u // 4294967296) * 2 + 1 AS h2 FROM h),
                 ks AS (SELECT unnest(generate_series(0, 3)) AS i),
                 bits AS (SELECT DISTINCT
                            CAST((h1 + i * h2) % 131072 AS BIGINT) AS bit
                          FROM hh, ks WHERE doc_id % 50 = 0),
                 probe AS (SELECT doc_id,
                             CAST((h1 + i * h2) % 131072 AS BIGINT) AS bit
                           FROM hh, ks)
            SELECT p.doc_id, bool_and(b.bit IS NOT NULL) AS maybe_contaminated
            FROM probe p LEFT JOIN bits b ON p.bit = b.bit
            GROUP BY p.doc_id
        """,
        "countmin_words": f"""
            WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w
                          FROM documents),
                 wc AS (SELECT w, count(*) AS n FROM toks
                        WHERE w <> '' GROUP BY 1),
                 hh AS (SELECT n, {_sql_u64('w')} % 1024 AS c1,
                               ({_sql_u64('w')} // 4294967296) * 2 + 1 AS c2
                        FROM wc),
                 js AS (SELECT unnest(generate_series(0, 3)) AS j),
                 cells AS (SELECT j,
                             CAST((c1 + j * c2) % 1024 AS BIGINT) AS col_,
                             CAST(sum(n) AS BIGINT) AS cell
                           FROM hh, js GROUP BY 1, 2),
                 probes AS (SELECT unnest([{", ".join("'" + w + "'" for w in sorted(_CMS_PROBES))}]) AS word),
                 phh AS (SELECT word, {_sql_u64('word')} % 1024 AS c1,
                               ({_sql_u64('word')} // 4294967296) * 2 + 1 AS c2
                         FROM probes)
            SELECT p.word, CAST(min(coalesce(c.cell, 0)) AS BIGINT) AS est_n
            FROM phh p CROSS JOIN js LEFT JOIN cells c
              ON c.j = js.j
             AND c.col_ = CAST((p.c1 + js.j * p.c2) % 1024 AS BIGINT)
            GROUP BY p.word
        """,
        # mirrors stages/windows.py moving_window_avg: micro-quantized
        # values, ROWS frame 3 PRECEDING..CURRENT, (ts, event_id) order
        "events_moving_avg": """
            WITH e AS (SELECT event_id, user_id, ts,
                              CAST(round(value * 1000000) AS BIGINT) AS v_micro
                       FROM events)
            SELECT event_id, user_id, v_micro,
                   CAST(count(*) OVER w AS BIGINT) AS win_n,
                   CAST(sum(v_micro) OVER w AS BIGINT) AS win_sum_micro,
                   CAST(sum(v_micro) OVER w AS DOUBLE)
                     / (count(*) OVER w * 1000000.0) AS moving_avg
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        # mirrors stages/setops.py vocab_source_coverage at threshold =
        # total distinct sources (per-(word, source) rows make count(*)
        # the distinct-source count)
        "vocab_shared_all": """
            WITH w AS (SELECT source,
                              unnest(string_split(text, ' ')) AS word
                       FROM documents WHERE text <> ''),
                 f AS (SELECT word, source, CAST(count(*) AS BIGINT) AS n
                       FROM w WHERE word <> '' GROUP BY 1, 2)
            SELECT word,
                   CAST(count(*) AS BIGINT) AS n_sources,
                   CAST(sum(n) AS BIGINT) AS n_occurrences
            FROM f GROUP BY word
            HAVING count(*) >= (SELECT count(DISTINCT source) FROM documents)
        """,
        # mirrors stages/splits.py weighted_sample: priority =
        # (md5-u64 >> 1) // weight in pure integer arithmetic (the
        # halving keeps it < 2^63 for every weight, clamp-free on both
        # sides), bottom-100 by (priority, doc_id)
        "weighted_sample": f"""
            SELECT doc_id,
                   CAST(greatest(n_chars, 1) AS BIGINT) AS weight,
                   CAST(({_sql_u64("CAST(doc_id AS VARCHAR)")} // 2)
                        // greatest(n_chars, 1) AS BIGINT) AS priority
            FROM documents
            ORDER BY priority, doc_id
            LIMIT 100
        """,
        # global_rank + the exact integer decile formula (rank-1)*10 // N
        "curriculum_bins": """
            WITH r AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                              CAST(row_number() OVER (
                                ORDER BY n_chars DESC, doc_id ASC)
                                AS BIGINT) AS doc_rank,
                              CAST(count(*) OVER () AS BIGINT) AS n
                       FROM documents)
            SELECT doc_id, n_chars, doc_rank,
                   CAST(doc_rank AS DOUBLE) / n AS percentile,
                   CAST((doc_rank - 1) * 10 // n AS BIGINT) AS bin
            FROM r
        """,
        # mirrors stages/dsir.py dsir_scores: u64(word) % 1024 buckets,
        # Laplace micro-logs quantized BEFORE the target-raw subtract,
        # order-free integer per-doc sums, identical final division
        "dsir_weights": f"""
            WITH w AS (SELECT doc_id,
                              source IN {repr(tuple(_DSIR_TARGET))} AS is_tgt,
                              CAST({_sql_u64('word')} % 1024 AS BIGINT) AS b
                       FROM (SELECT doc_id, source,
                                    unnest(string_split(text, ' ')) AS word
                             FROM documents WHERE text <> '')),
                 c AS (SELECT b,
                              CAST(sum(CASE WHEN is_tgt THEN 1 ELSE 0 END)
                                   AS BIGINT) AS ct,
                              CAST(sum(CASE WHEN is_tgt THEN 0 ELSE 1 END)
                                   AS BIGINT) AS cr
                       FROM w GROUP BY b),
                 tot AS (SELECT CAST(sum(ct) AS BIGINT) AS t,
                                CAST(sum(cr) AS BIGINT) AS r FROM c),
                 grid AS (SELECT unnest(range(0, 1024)) AS b),
                 tbl AS (SELECT grid.b,
                                CAST(round(ln((COALESCE(c.ct, 0) + 1.0)
                                              / (tot.t + 1024.0))
                                           * 1000000) AS BIGINT)
                              - CAST(round(ln((COALESCE(c.cr, 0) + 1.0)
                                              / (tot.r + 1024.0))
                                           * 1000000) AS BIGINT) AS lam
                         FROM grid CROSS JOIN tot
                         LEFT JOIN c ON grid.b = c.b),
                 per AS (SELECT w.doc_id,
                                CAST(count(*) AS BIGINT) AS n_words,
                                CAST(sum(tbl.lam) AS BIGINT) AS lr_micro
                         FROM w JOIN tbl ON w.b = tbl.b
                         GROUP BY w.doc_id)
            SELECT d.doc_id,
                   COALESCE(p.n_words, 0) AS n_words,
                   COALESCE(p.lr_micro, 0) AS lr_micro,
                   CASE WHEN p.n_words > 0
                        THEN CAST(p.lr_micro AS DOUBLE)
                             / (p.n_words * 1000000.0)
                        ELSE 0.0 END AS avg_lr
            FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
        """,
        "knn_pq": _knn_pq_oracle_sql(),
        # mirrors stages/postings.py inverted_postings over the top-10
        # vocabulary: distinct (word, doc) pairs, exact df, ascending
        # doc ids comma-joined after a 50-element cap
        "inverted_postings": """
            WITH w AS (SELECT doc_id,
                              unnest(string_split(text, ' ')) AS word
                       FROM documents),
                 c AS (SELECT word, count(*) AS n FROM w
                       WHERE word <> '' GROUP BY 1),
                 top AS (SELECT word FROM c ORDER BY n DESC, word LIMIT 10),
                 p AS (SELECT word, doc_id FROM w JOIN top USING (word)
                       GROUP BY 1, 2)
            SELECT word, CAST(count(*) AS BIGINT) AS df,
                   array_to_string(
                     list_slice(list_sort(list(doc_id)), 1, 50), ','
                   ) AS postings
            FROM p GROUP BY word
        """,
        # mirrors stages/mixture.py mixture_weights: exact token counts,
        # share = one int->double division, w = floor(sqrt(share)*1e6)
        # (IEEE sqrt is correctly rounded — identical in numpy and SQL),
        # order-free integer normalizer
        "mixture_weights": f"""
            WITH t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                              CAST(sum(length(regexp_extract_all(
                                text, $${ta.WS_TOKEN_RE}$$))) AS BIGINT)
                                AS n_tokens
                       FROM documents GROUP BY source),
                 tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM t),
                 w AS (SELECT source, n_docs, n_tokens,
                              CAST(n_tokens AS DOUBLE) / tt AS share,
                              CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / tt)
                                         * 1000000) AS BIGINT) AS w_micro
                       FROM t, tot)
            SELECT source, n_docs, n_tokens, share, w_micro,
                   CAST(w_micro AS DOUBLE)
                     / (SELECT CAST(sum(w_micro) AS BIGINT) FROM w)
                     AS samp_weight
            FROM w
        """,
        # mirrors stages/text_analysis.py repetition_stats: per-doc
        # bigram multiset via 1-based adjacent positions, fractions as
        # single int/int divisions (bit-exact, unquantized)
        "repetition_stats": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents),
                 b AS (SELECT doc_id, ws[CAST(i AS INTEGER)] || ' '
                                || ws[CAST(i AS INTEGER) + 1] AS bg
                       FROM d, unnest(range(1, len(ws))) AS t(i)),
                 c AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS n
                       FROM b GROUP BY 1, 2),
                 agg AS (SELECT doc_id,
                                CAST(sum(n) AS BIGINT) AS n_bigrams,
                                CAST(max(n) AS BIGINT) AS top2_n,
                                CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END)
                                     AS BIGINT) AS dup2_n
                         FROM c GROUP BY 1)
            SELECT d.doc_id,
                   COALESCE(a.n_bigrams, 0) AS n_bigrams,
                   COALESCE(a.top2_n, 0) AS top2_n,
                   COALESCE(a.dup2_n, 0) AS dup2_n,
                   CAST(COALESCE(a.top2_n, 0) AS DOUBLE)
                     / greatest(COALESCE(a.n_bigrams, 0), 1) AS top2_frac,
                   CAST(COALESCE(a.dup2_n, 0) AS DOUBLE)
                     / greatest(COALESCE(a.n_bigrams, 0), 1) AS dup2_frac
            FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
        """,
        # grouped hll_registers: one register table per source over each
        # source's distinct tokens (same u64 split / rho extraction)
        # mirrors stages/mixture.py mixture_select: integer quota
        # apportionment over the sqrt-temperature weights + per-source
        # hash-smallest selection
        "mixture_select": f"""
            WITH t AS (SELECT source,
                              CAST(sum(length(regexp_extract_all(
                                text, $${ta.WS_TOKEN_RE}$$))) AS BIGINT)
                                AS n_tokens
                       FROM documents GROUP BY source),
                 tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM t),
                 w AS (SELECT source,
                              CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / tt)
                                         * 1000000) AS BIGINT) AS w_micro
                       FROM t, tot),
                 tw AS (SELECT CAST(sum(w_micro) AS BIGINT) AS s FROM w),
                 q AS (SELECT source,
                              CAST((200 * w_micro) // tw.s AS BIGINT)
                                AS quota
                       FROM w, tw),
                 h AS (SELECT doc_id, source,
                              CAST({_sql_u64("CAST(doc_id AS VARCHAR)")} // 2
                                   AS BIGINT) AS hkey
                       FROM documents),
                 r AS (SELECT h.*,
                              row_number() OVER (
                                PARTITION BY source
                                ORDER BY hkey, doc_id) AS rn
                       FROM h)
            SELECT r.doc_id, r.source, r.hkey, q.quota
            FROM r JOIN q USING (source)
            WHERE rn <= q.quota
        """,
        # mirrors stages/ngramlm.py ngram_backoff_scores: u64 % 1024
        # unigram buckets, shingle-combine % 4096 bigram buckets,
        # stupid-backoff term select over micro-quantized ln's
        "ngram_backoff": f"""
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents WHERE text <> ''),
                 tok AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                                ws[CAST(i AS INTEGER)] AS w,
                                CASE WHEN i > 1
                                     THEN ws[CAST(i AS INTEGER) - 1]
                                END AS pw
                         FROM d, unnest(range(1, len(ws) + 1)) AS t(i)),
                 h AS (SELECT doc_id, pos,
                              {_sql_u64('w')} AS hw,
                              CASE WHEN pw IS NOT NULL
                                   THEN {_sql_u64('pw')} END AS hp
                       FROM tok),
                 hb AS (SELECT doc_id, pos,
                               CAST(hw % 1024 AS BIGINT) AS ub,
                               CASE WHEN hp IS NOT NULL THEN CAST(
                                 ((hp % 4294967296) * 2654435761
                                  + hw % 4294967296) % 4096 AS BIGINT)
                               END AS bb,
                               CASE WHEN hp IS NOT NULL
                                    THEN CAST(hp % 1024 AS BIGINT)
                               END AS pub
                        FROM h),
                 uc AS (SELECT ub AS b, CAST(count(*) AS BIGINT) AS n
                        FROM hb GROUP BY 1),
                 bc AS (SELECT bb AS b, CAST(count(*) AS BIGINT) AS n
                        FROM hb WHERE bb IS NOT NULL GROUP BY 1),
                 tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM uc),
                 terms AS (SELECT hb.doc_id,
                    CASE
                      WHEN hb.bb IS NOT NULL AND bc.n IS NOT NULL THEN
                        CAST(round(ln(CAST(bc.n AS DOUBLE)) * 1000000)
                             AS BIGINT)
                      - CAST(round(ln(CAST(up.n AS DOUBLE)) * 1000000)
                             AS BIGINT)
                      WHEN hb.bb IS NULL THEN
                        CAST(round(ln(CAST(uc.n AS DOUBLE)) * 1000000)
                             AS BIGINT)
                      - CAST(round(ln(CAST(tot.n AS DOUBLE)) * 1000000)
                             AS BIGINT)
                      ELSE
                        -916291
                      + CAST(round(ln(CAST(uc.n AS DOUBLE)) * 1000000)
                             AS BIGINT)
                      - CAST(round(ln(CAST(tot.n AS DOUBLE)) * 1000000)
                             AS BIGINT)
                    END AS term
                    FROM hb
                    JOIN uc ON uc.b = hb.ub
                    LEFT JOIN uc up ON up.b = hb.pub
                    LEFT JOIN bc ON bc.b = hb.bb
                    CROSS JOIN tot),
                 per AS (SELECT doc_id,
                                CAST(count(*) AS BIGINT) AS n_tokens,
                                CAST(sum(term) AS BIGINT) AS lp_micro
                         FROM terms GROUP BY 1)
            SELECT doc.doc_id,
                   COALESCE(p.n_tokens, 0) AS n_tokens,
                   COALESCE(p.lp_micro, 0) AS lp_micro,
                   CASE WHEN p.n_tokens > 0
                        THEN CAST(p.lp_micro AS DOUBLE)
                             / (p.n_tokens * 1000000.0)
                        ELSE 0.0 END AS avg_lp
            FROM documents doc LEFT JOIN per p ON doc.doc_id = p.doc_id
        """,
        # mirrors _q_kneser_ney (stages/ngramlm.py kneser_ney_scores):
        # same tok/hash/bucket CTEs as ngram_backoff, sparse (pub, ub)
        # pair counts, follower/continuation/type totals, and the ×4
        # integer lift — num = max(4C−3,0)·T + 3·N1+(p,·)·N1+(·,c),
        # den = 4·C(p·)·T — each side micro-ln'd identically
        "kneser_ney": f"""
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents WHERE text <> ''),
                 tok AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                                ws[CAST(i AS INTEGER)] AS w,
                                CASE WHEN i > 1
                                     THEN ws[CAST(i AS INTEGER) - 1]
                                END AS pw
                         FROM d, unnest(range(1, len(ws) + 1)) AS t(i)),
                 h AS (SELECT doc_id, pos,
                              {_sql_u64('w')} AS hw,
                              CASE WHEN pw IS NOT NULL
                                   THEN {_sql_u64('pw')} END AS hp
                       FROM tok),
                 hb AS (SELECT doc_id, pos,
                               CAST(hw % 1024 AS BIGINT) AS ub,
                               CASE WHEN hp IS NOT NULL
                                    THEN CAST(hp % 1024 AS BIGINT)
                               END AS pub
                        FROM h),
                 pc2 AS (SELECT pub, ub, CAST(count(*) AS BIGINT) AS c
                         FROM hb WHERE pub IS NOT NULL GROUP BY 1, 2),
                 ctx AS (SELECT pub, CAST(sum(c) AS BIGINT) AS c1,
                                CAST(count(*) AS BIGINT) AS nf
                         FROM pc2 GROUP BY 1),
                 cont AS (SELECT ub, CAST(count(*) AS BIGINT) AS nc
                          FROM pc2 GROUP BY 1),
                 tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM pc2),
                 uc AS (SELECT ub AS b, CAST(count(*) AS BIGINT) AS n
                        FROM hb GROUP BY 1),
                 tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM uc),
                 terms AS (SELECT hb.doc_id,
                    CASE
                      WHEN hb.pub IS NULL THEN
                        CAST(round(ln(CAST(uc.n AS DOUBLE)) * 1000000)
                             AS BIGINT)
                      - CAST(round(ln(CAST(tot.n AS DOUBLE)) * 1000000)
                             AS BIGINT)
                      WHEN greatest(4 * pc2.c - 3, 0) * tt.t
                           + 3 * ctx.nf * cont.nc > 0
                           AND 4 * ctx.c1 * tt.t > 0 THEN
                        CAST(round(ln(CAST(greatest(4 * pc2.c - 3, 0) * tt.t
                                           + 3 * ctx.nf * cont.nc
                                           AS DOUBLE)) * 1000000) AS BIGINT)
                      - CAST(round(ln(CAST(4 * ctx.c1 * tt.t AS DOUBLE))
                                   * 1000000) AS BIGINT)
                      ELSE 0
                    END AS term
                    FROM hb
                    JOIN uc ON uc.b = hb.ub
                    LEFT JOIN pc2 ON pc2.pub = hb.pub AND pc2.ub = hb.ub
                    LEFT JOIN ctx ON ctx.pub = hb.pub
                    LEFT JOIN cont ON cont.ub = hb.ub
                    CROSS JOIN tt CROSS JOIN tot),
                 per AS (SELECT doc_id,
                                CAST(count(*) AS BIGINT) AS n_tokens,
                                CAST(sum(term) AS BIGINT) AS lp_micro
                         FROM terms GROUP BY 1)
            SELECT doc.doc_id,
                   COALESCE(p.n_tokens, 0) AS n_tokens,
                   COALESCE(p.lp_micro, 0) AS lp_micro,
                   CASE WHEN p.n_tokens > 0
                        THEN CAST(p.lp_micro AS DOUBLE)
                             / (p.n_tokens * 1000000.0)
                        ELSE 0.0 END AS avg_lp
            FROM documents doc LEFT JOIN per p ON doc.doc_id = p.doc_id
        """,
        # mirrors _q_large_volume_orders: int-hundredths quantity sums,
        # threshold filter, (qty_c DESC, orderkey) top-100, name lookup
        "large_volume_orders": f"""
            WITH s AS (SELECT l_orderkey AS orderkey,
                              CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                                   AS BIGINT) AS qty_c
                       FROM lineitem GROUP BY 1),
                 q AS (SELECT orderkey, qty_c FROM s
                       WHERE qty_c > {_Q18_QTY_TH_C}),
                 j AS (SELECT o.o_orderkey AS orderkey,
                              o.o_custkey AS custkey,
                              o.o_totalprice, q.qty_c
                       FROM orders o JOIN q ON o.o_orderkey = q.orderkey),
                 t AS (SELECT * FROM j
                       ORDER BY qty_c DESC, orderkey LIMIT 100)
            SELECT t.orderkey, t.custkey, c.c_name,
                   CAST(t.qty_c AS DOUBLE) / 100.0 AS total_qty,
                   t.o_totalprice
            FROM t JOIN customer c ON c.c_custkey = t.custkey
        """,
        # mirrors _q_order_priority_counts: EXISTS semi-join + bounded
        # priority-domain count
        "order_priority_counts": f"""
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '{_Q4_ORD_LO}'
              AND o.o_orderdate <  TIMESTAMP '{_Q4_ORD_HI}'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > TIMESTAMP '{_Q4_SHIP_AFTER}')
            GROUP BY 1
        """,
        # mirrors stages/text_analysis.py token_entropy: u64 word-hash
        # counts per doc, per-term micro-quantized ln, one exact division
        "token_entropy": f"""
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents WHERE text <> ''),
                 tok AS (SELECT doc_id, ws[CAST(i AS INTEGER)] AS w
                         FROM d, unnest(range(1, len(ws) + 1)) AS t(i)),
                 c AS (SELECT doc_id, {_sql_u64('w')} AS hw,
                              CAST(count(*) AS BIGINT) AS n
                       FROM tok GROUP BY 1, 2),
                 per AS (SELECT doc_id,
                                CAST(sum(n) AS BIGINT) AS n_tokens,
                                CAST(sum(n * CAST(round(
                                  ln(CAST(n AS DOUBLE)) * 1000000)
                                  AS BIGINT)) AS BIGINT) AS s
                         FROM c GROUP BY 1)
            SELECT doc.doc_id,
                   COALESCE(p.n_tokens, 0) AS n_tokens,
                   COALESCE(p.n_tokens * CAST(round(
                     ln(CAST(p.n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
                     - p.s, 0) AS ent_micro,
                   CASE WHEN p.n_tokens > 0
                        THEN CAST(p.n_tokens * CAST(round(
                               ln(CAST(p.n_tokens AS DOUBLE)) * 1000000)
                               AS BIGINT) - p.s AS DOUBLE)
                             / (p.n_tokens * 1000000.0)
                        ELSE 0.0 END AS entropy
            FROM documents doc LEFT JOIN per p ON doc.doc_id = p.doc_id
        """,
        # mirrors stages/mixture.py interleave_order: same weight CTEs as
        # mixture_select, row_number per source over (hkey, doc_id),
        # stride-scheduling integer keys, (pos_key, source, rnk) LIMIT
        "interleave_order": f"""
            WITH t AS (SELECT source,
                              CAST(sum(length(regexp_extract_all(
                                text, $${ta.WS_TOKEN_RE}$$))) AS BIGINT)
                                AS n_tokens
                       FROM documents GROUP BY source),
                 tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM t),
                 w AS (SELECT source,
                              CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / tt)
                                         * 1000000) AS BIGINT) AS w_micro
                       FROM t, tot),
                 h AS (SELECT doc_id, source,
                              CAST({_sql_u64("CAST(doc_id AS VARCHAR)")} // 2
                                   AS BIGINT) AS hkey
                       FROM documents),
                 r AS (SELECT h.*,
                              row_number() OVER (
                                PARTITION BY source
                                ORDER BY hkey, doc_id) AS rnk
                       FROM h),
                 k AS (SELECT r.doc_id, r.source, CAST(r.rnk AS BIGINT) AS rnk,
                              CAST((r.rnk * 1000000000) // w.w_micro
                                   AS BIGINT) AS pos_key
                       FROM r JOIN w USING (source)
                       WHERE w.w_micro > 0)
            SELECT doc_id, source, rnk, pos_key FROM k
            ORDER BY pos_key, source, rnk LIMIT 200
        """,
        # mirrors stages/dedup.py source_minhash_similarity (builder below)
        "source_similarity": _source_sim_oracle_sql(),
        # mirrors _q_length_token_corr: exact int64 moment sums per
        # source, identical double expression tree for the finalization
        "length_token_corr": f"""
            WITH m AS (SELECT source,
                              CAST(n_chars AS BIGINT) AS x,
                              CAST(length(regexp_extract_all(text,
                                $${ta.WS_TOKEN_RE}$$)) AS BIGINT) AS y
                       FROM documents),
                 s AS (SELECT source,
                              CAST(count(*) AS BIGINT) AS n,
                              CAST(sum(x) AS BIGINT) AS sx,
                              CAST(sum(y) AS BIGINT) AS sy,
                              CAST(sum(x * y) AS BIGINT) AS sxy,
                              CAST(sum(x * x) AS BIGINT) AS sxx,
                              CAST(sum(y * y) AS BIGINT) AS syy
                       FROM m GROUP BY 1)
            SELECT source, n,
                   CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                        THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                        ELSE 0.0 END AS corr
            FROM s
        """,
        # mirrors stages/windows.py rolling_zscore: ROWS frame 7
        # PRECEDING..CURRENT, z = (v·n − S)/sqrt(n·SS − S²) from exact
        # int64 window moments, zero-variance frames → 0
        "events_rolling_z": """
            WITH e AS (SELECT event_id, user_id, ts,
                              CAST(round(value * 1000000) AS BIGINT) AS v_micro
                       FROM events),
                 w AS (SELECT event_id, user_id, v_micro,
                              CAST(count(*) OVER fr AS BIGINT) AS win_n,
                              CAST(sum(v_micro) OVER fr AS BIGINT)
                                AS win_sum_micro,
                              CAST(sum(v_micro * v_micro) OVER fr AS BIGINT)
                                AS win_sumq
                       FROM e
                       WINDOW fr AS (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 7 PRECEDING
                                       AND CURRENT ROW))
            SELECT event_id, user_id, v_micro, win_n, win_sum_micro,
                   CASE WHEN win_n * win_sumq
                             - win_sum_micro * win_sum_micro > 0
                        THEN CAST(v_micro * win_n - win_sum_micro AS DOUBLE)
                             / sqrt(CAST(win_n * win_sumq
                                         - win_sum_micro * win_sum_micro
                                         AS DOUBLE))
                        ELSE 0.0 END AS z
            FROM w
        """,
        # mirrors _q_corpus_diff: odd-id snapshot anti-joined on md5
        # content digests of the even-id snapshot
        "corpus_diff": """
            SELECT doc_id, md5(text) AS content_hash
            FROM documents
            WHERE doc_id % 2 = 1
              AND md5(text) NOT IN (
                SELECT md5(text) FROM documents WHERE doc_id % 2 = 0
              )
        """,
        # mirrors _q_pmi_collocations: top-30 bigrams (bigram_topk
        # selection), pmi_micro as a signed sum of individually
        # micro-quantized ln's — integer association-free
        "pmi_collocations": """
            WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
                 b AS (SELECT ws[i] || ' ' || ws[i+1] AS bigram
                       FROM d, (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
                       WHERE ws[i] <> '' AND ws[i+1] <> ''),
                 c AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n
                       FROM b GROUP BY 1),
                 top AS (SELECT bigram, n FROM c
                         ORDER BY n DESC, bigram LIMIT 30),
                 w AS (SELECT unnest(ws) AS word FROM d),
                 wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n
                        FROM w WHERE word <> '' GROUP BY 1),
                 nw AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM wc),
                 nbt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM b),
                 joined AS (SELECT t.bigram, t.n AS n_ab,
                                   wa.n AS n_a, wb.n AS n_b,
                                   CAST(round(ln(CAST(t.n AS DOUBLE)) * 1000000) AS BIGINT)
                                 - CAST(round(ln(CAST(nbt.t AS DOUBLE)) * 1000000) AS BIGINT)
                                 - CAST(round(ln(CAST(wa.n AS DOUBLE)) * 1000000) AS BIGINT)
                                 - CAST(round(ln(CAST(wb.n AS DOUBLE)) * 1000000) AS BIGINT)
                                 + 2 * CAST(round(ln(CAST(nw.t AS DOUBLE)) * 1000000) AS BIGINT)
                                     AS pmi_micro
                            FROM top t
                            JOIN wc wa ON wa.word = split_part(t.bigram, ' ', 1)
                            JOIN wc wb ON wb.word = split_part(t.bigram, ' ', 2)
                            CROSS JOIN nw CROSS JOIN nbt)
            SELECT bigram, n_ab, n_a, n_b, pmi_micro,
                   CAST(pmi_micro AS DOUBLE) / 1000000.0 AS pmi
            FROM joined
        """,
        # grouped_int_quantiles over the micro-quantized event value
        "value_quantiles_by_type": """
            SELECT event_type,
                   CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v)
                        AS BIGINT) AS p50,
                   CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY v)
                        AS BIGINT) AS p90,
                   CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY v)
                        AS BIGINT) AS p99
            FROM (SELECT event_type,
                         CAST(round(value * 1000000) AS BIGINT) AS v
                  FROM events)
            GROUP BY event_type
        """,
        # mirrors _q_user_value_quantiles: percentile_disc selects an
        # ELEMENT, so the raw-double compare is exact
        "user_value_quantiles": """
            SELECT user_id, CAST(0.5 AS DOUBLE) AS q,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY value)
                     AS value
            FROM events GROUP BY user_id
            UNION ALL
            SELECT user_id, CAST(0.9 AS DOUBLE),
                   percentile_disc(0.9) WITHIN GROUP (ORDER BY value)
            FROM events GROUP BY user_id
        """,
        # mirrors stages/dsir.py kl_by_group: dense (source x 1024)
        # Laplace-smoothed distributions, nano-quantized terms summed
        # order-free, one exact final division
        "kl_by_source": f"""
            WITH w AS (SELECT source,
                              unnest(string_split(text, ' ')) AS word
                       FROM documents),
                 wb AS (SELECT source,
                               CAST({_sql_u64('word')} % 1024 AS BIGINT) AS b
                        FROM w WHERE word <> ''),
                 c AS (SELECT source, b, CAST(count(*) AS BIGINT) AS n
                       FROM wb GROUP BY 1, 2),
                 grid AS (SELECT s.source, g.b
                          FROM (SELECT DISTINCT source FROM c) s,
                               (SELECT unnest(range(0, 1024)) AS b) g),
                 dense AS (SELECT grid.source, grid.b,
                                  COALESCE(c.n, 0) AS n
                           FROM grid LEFT JOIN c
                             ON grid.source = c.source AND grid.b = c.b),
                 corp AS (SELECT b, CAST(sum(n) AS BIGINT) AS nc
                          FROM dense GROUP BY b),
                 tot AS (SELECT CAST(sum(nc) AS BIGINT) AS t FROM corp),
                 gt AS (SELECT source, CAST(sum(n) AS BIGINT) AS ng
                        FROM dense GROUP BY source),
                 terms AS (SELECT d.source,
                                  CAST(round(
                                    ((d.n + 1.0) / (gt.ng + 1024.0))
                                    * (ln((d.n + 1.0) / (gt.ng + 1024.0))
                                       - ln((corp.nc + 1.0) / (tot.t + 1024.0)))
                                    * 1000000000) AS BIGINT) AS term
                           FROM dense d
                           JOIN gt USING (source)
                           JOIN corp USING (b)
                           CROSS JOIN tot)
            SELECT t.source, gt.ng AS n_tokens,
                   CAST(sum(t.term) AS BIGINT) AS s_nano,
                   CAST(CAST(sum(t.term) AS BIGINT) AS DOUBLE)
                     / 1000000000.0 AS kl
            FROM terms t JOIN gt ON t.source = gt.source
            GROUP BY t.source, gt.ng
        """,
        # mirrors stages/stats.py grouped_zscore: exact int64 moments,
        # z = (x·n − S)/sqrt(n·SS − S²), zero-variance groups → 0
        "zscore_by_source": """
            WITH m AS (SELECT source,
                              CAST(count(*) AS BIGINT) AS n,
                              CAST(sum(n_chars) AS BIGINT) AS s,
                              CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
                       FROM documents GROUP BY source)
            SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars,
                   CASE WHEN m.n * m.ss - m.s * m.s > 0
                        THEN CAST(d.n_chars * m.n - m.s AS DOUBLE)
                             / sqrt(CAST(m.n * m.ss - m.s * m.s AS DOUBLE))
                        ELSE 0.0 END AS z
            FROM documents d JOIN m USING (source)
        """,
        # knn_bruteforce + the per-query label predicate (hard-negative
        # mode: candidate label != query label); self-exclusion via the
        # vec_id >= N split as in every knn oracle
        "knn_filtered": f"""
            WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
                              CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < {_N_QUERIES}),
                 c AS (SELECT vec_id, label,
                              CAST(embedding AS DOUBLE[]) AS cv
                       FROM embeddings WHERE vec_id >= {_N_QUERIES}),
                 s AS (SELECT q.query_id, c.vec_id,
                              round(list_cosine_similarity(c.cv, q.qv)
                                    * 1000000) / 1000000.0 AS cosine
                       FROM q CROSS JOIN c
                       WHERE c.label <> q.qlabel)
            SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
              SELECT query_id, vec_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, vec_id) AS rank
              FROM s)
            WHERE rank <= {_KNN_K}
        """,
        "hll_by_source": f"""
            WITH w AS (SELECT DISTINCT source,
                              unnest(string_split(text, ' ')) AS word
                       FROM documents),
                 h AS (SELECT source, {_sql_u64('word')} AS h FROM w
                       WHERE word <> ''),
                 parts AS (SELECT source,
                                  CAST(h // 4503599627370496 AS BIGINT)
                                    AS bucket,
                                  CAST(h % 4503599627370496 AS BIGINT)
                                    AS rest
                           FROM h),
                 rho AS (SELECT source, bucket,
                                CASE WHEN rest = 0 THEN 53
                                     ELSE 52 - (length(to_base(rest, 2)) - 1)
                                END AS rho
                         FROM parts)
            SELECT source, bucket, CAST(max(rho) AS BIGINT) AS max_rho
            FROM rho GROUP BY source, bucket
        """,
    }
    out["small_qty_revenue"] = f"""
        WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = '{_Q17_BRAND}'),
             l AS (SELECT l_partkey,
                          CAST(round(l_quantity * 100) AS BIGINT) AS qc,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS ec
                   FROM lineitem
                   WHERE l_partkey IN (SELECT p_partkey FROM pk)),
             a AS (SELECT l_partkey, sum(qc) AS sq, count(*) AS n
                   FROM l GROUP BY 1)
        SELECT '{_Q17_BRAND}' AS brand,
               CAST(coalesce(sum(l.ec), 0) AS DOUBLE) / 700.0 AS avg_yearly
        FROM l JOIN a ON l.l_partkey = a.l_partkey
        WHERE 5 * l.qc * a.n < a.sq
    """
    out["top_supplier"] = """
        WITH r AS (SELECT l_suppkey AS suppkey,
                          sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                            AS rc
                   FROM lineitem
                   WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate < TIMESTAMP '1996-04-01'
                   GROUP BY 1)
        SELECT r.suppkey, s.s_name, CAST(r.rc AS DOUBLE) / 10000.0 AS total_revenue
        FROM r JOIN supplier s ON s.s_suppkey = r.suppkey
        WHERE r.rc = (SELECT max(rc) FROM r)
    """
    # mirrors _q_events_retention: first-seen day per user, distinct
    # active days, (cohort, offset) counts
    out["events_retention"] = """
        WITH d AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS d
                   FROM events),
             f AS (SELECT user_id, min(d) AS fd FROM d GROUP BY 1)
        SELECT CAST(f.fd * 86400 AS BIGINT) AS cohort_day,
               CAST(d.d - f.fd AS BIGINT) AS day_offset,
               count(*) AS n_users
        FROM d JOIN f USING (user_id)
        GROUP BY 1, 2
    """
    # mirrors stages/windows.py session_type_pairs: same sessionization
    # CTE as events_sessions, distinct (session, type), self-join pairs
    out["session_type_pairs"] = """
        WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec,
                          event_type, event_id
                   FROM events),
             f AS (SELECT *,
                          CASE WHEN lag(sec) OVER w IS NULL THEN 1
                               WHEN sec - lag(sec) OVER w > 1800 THEN 1
                               ELSE 0 END AS is_new
                   FROM e
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY sec, event_id)),
             g AS (SELECT *,
                          sum(is_new) OVER (PARTITION BY user_id
                                            ORDER BY sec, event_id
                                            ROWS UNBOUNDED PRECEDING)
                            AS sid
                   FROM f),
             d AS (SELECT DISTINCT user_id, sid, event_type FROM g),
             p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
                   FROM d a JOIN d b
                     ON a.user_id = b.user_id AND a.sid = b.sid
                    AND a.event_type < b.event_type)
        SELECT type_a, type_b, count(*) AS n_sessions
        FROM p GROUP BY 1, 2
    """
    # mirrors _q_events_new_users: first-seen day per user, arrivals,
    # window prefix sum
    out["events_new_users"] = """
        WITH f AS (SELECT user_id,
                          min(epoch_us(ts) // 86400000000) AS d
                   FROM events GROUP BY 1),
             c AS (SELECT d, count(*) AS n FROM f GROUP BY 1)
        SELECT CAST(d * 86400 AS BIGINT) AS day_start,
               CAST(n AS BIGINT) AS new_users,
               CAST(sum(n) OVER (ORDER BY d) AS BIGINT) AS cum_users
        FROM c
    """
    # mirrors _q_nation_trade_volume: same two-nation prefilter, exact
    # int64 revenue, pair predicate reduces to supp<>cust after filter
    out["nation_trade_volume"] = f"""
        WITH sn AS (SELECT s_suppkey AS suppkey, n_name AS supp_nation
                    FROM supplier JOIN nation ON n_nationkey = s_nationkey
                    WHERE n_name IN ('{_Q7_NATIONS[0]}', '{_Q7_NATIONS[1]}')),
             cn AS (SELECT c_custkey AS custkey, n_name AS cust_nation
                    FROM customer JOIN nation ON n_nationkey = c_nationkey
                    WHERE n_name IN ('{_Q7_NATIONS[0]}', '{_Q7_NATIONS[1]}')),
             oc AS (SELECT o_orderkey AS orderkey, cust_nation
                    FROM orders JOIN cn ON custkey = o_custkey),
             v AS (SELECT supp_nation, cust_nation,
                          CAST(year(l_shipdate) AS BIGINT) AS l_year,
                          CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT))
                            AS rc
                   FROM lineitem
                   JOIN sn ON sn.suppkey = l_suppkey
                   JOIN oc ON oc.orderkey = l_orderkey)
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(rc) AS DOUBLE) / 10000.0 AS revenue
        FROM v WHERE supp_nation <> cust_nation
        GROUP BY 1, 2, 3
    """
    # mirrors _q_chunk_overlap: duckdb list slices are 1-based inclusive,
    # so ws[start+1 : start+SIZE] is exactly tokens[start : start+SIZE]
    out["chunk_overlap"] = f"""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(text, $${ta.WS_TOKEN_RE}$$) AS ws
                   FROM documents),
             s AS (SELECT doc_id, ws,
                          unnest(range(0, len(ws), {_CHUNK_STRIDE})) AS start
                   FROM t WHERE len(ws) > 0)
        SELECT doc_id,
               CAST(start // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(least({_CHUNK_SIZE}, len(ws) - start) AS BIGINT) AS n_tokens,
               array_to_string(ws[start + 1 : start + {_CHUNK_SIZE}], ' ') AS chunk
        FROM s
    """
    # recall@k composes the two index oracles verbatim — any drift in
    # either index's SQL mirror propagates here automatically
    out["knn_recall"] = f"""
        WITH bf AS (SELECT query_id, vec_id FROM ({out["knn_bruteforce"]})),
             iv AS (SELECT query_id, vec_id FROM ({out["knn_ivf"]}))
        SELECT b.query_id,
               CAST(count(i.vec_id) AS BIGINT) AS hits,
               CAST(count(i.vec_id) AS DOUBLE) / {_KNN_K} AS recall
        FROM bf b LEFT JOIN iv i
          ON i.query_id = b.query_id AND i.vec_id = b.vec_id
        GROUP BY 1
    """
    # mirrors _q_returned_top_customers: exact int64 cents revenue
    # ec·(100−dk), (rev desc, custkey asc) top-20, names joined after
    out["returned_top_customers"] = f"""
        WITH li AS (
          SELECT l_orderkey AS orderkey,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c
          FROM lineitem WHERE l_returnflag = 'R'
        ),
        o AS (
          SELECT o_orderkey AS orderkey, o_custkey AS custkey
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '{_Q10_START}'
            AND o_orderdate <  TIMESTAMP '{_Q10_END}'
        ),
        g AS (
          SELECT custkey, sum(rev_c) AS rev_c
          FROM li JOIN o ON li.orderkey = o.orderkey
          GROUP BY custkey
        ),
        top AS (
          SELECT custkey, rev_c FROM g
          ORDER BY rev_c DESC, custkey ASC LIMIT 20
        )
        SELECT t.custkey, c.c_name, n.n_name,
               CAST(t.rev_c AS DOUBLE) / 10000.0 AS revenue
        FROM top t
        JOIN customer c ON c.c_custkey = t.custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    """
    # mirrors _q_promo_revenue_share: int64-exact monthly sums, one
    # division per month row, round to 6dp like the Ray side
    out["promo_revenue_share"] = f"""
        WITH li AS (
          SELECT CAST(month(l_shipdate) AS BIGINT) AS month,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c,
                 (p_type = 'PROMO') AS is_promo
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE l_shipdate >= TIMESTAMP '{_Q14_YEAR}-01-01'
            AND l_shipdate <  TIMESTAMP '{_Q14_YEAR + 1}-01-01'
        )
        SELECT month,
               round(100.0 * sum(CASE WHEN is_promo THEN rev_c ELSE 0 END)
                     / sum(rev_c), 6) AS promo_share
        FROM li GROUP BY month
    """
    # mirrors _q_supplier_part_counts: same bad-supplier anti-set,
    # brand exclusion, distinct-pair count per bucket
    out["supplier_part_counts"] = """
        WITH bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
        pairs AS (
          SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
          FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM bad)
        )
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT suppkey) AS BIGINT) AS supplier_cnt
        FROM pairs JOIN part ON p_partkey = partkey
        WHERE p_brand <> 'Brand#1'
        GROUP BY 1, 2, 3
    """
    # mirrors _q_quantity_band_revenue: the same three OR-of-ANDs bands
    bands_sql = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {ms}"
        f" AND l_quantity BETWEEN {ql} AND {qh})"
        for b, ms, ql, qh in _Q19_BANDS
    )
    out["quantity_band_revenue"] = f"""
        WITH li AS (
          SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE {bands_sql}
        )
        SELECT CAST(coalesce(sum(rev_c), 0) AS DOUBLE) / 10000.0 AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM li
    """
    # mirrors stages/windows.py session_transitions: lag over the same
    # (sec, event_id) order; is_new=0 ⟺ same user AND gap ≤ 1800
    out["session_transitions"] = """
        WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec,
                          event_type, event_id
                   FROM events),
             f AS (SELECT event_type,
                          lag(event_type) OVER w AS from_type,
                          CASE WHEN lag(sec) OVER w IS NULL THEN 1
                               WHEN sec - lag(sec) OVER w > 1800 THEN 1
                               ELSE 0 END AS is_new
                   FROM e
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY sec, event_id))
        SELECT from_type, event_type AS to_type,
               CAST(count(*) AS BIGINT) AS n_trans
        FROM f WHERE is_new = 0 GROUP BY 1, 2
    """
    # mirrors stages/windows.py top_event_per_user: (n desc, type asc)
    # argmax per user
    out["user_top_event"] = """
        WITH c AS (SELECT user_id, event_type, count(*) AS n
                   FROM events GROUP BY 1, 2)
        SELECT user_id, event_type AS top_type, CAST(n AS BIGINT) AS n
        FROM c
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, event_type ASC) = 1
    """
    # mirrors stages/windows.py rolling_active_users: observed days only,
    # trailing [d-(w-1), d] distinct users
    out["events_wau"] = f"""
        WITH ud AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 86400000000 AS day
                    FROM events),
             days AS (SELECT DISTINCT day FROM ud),
             w AS (SELECT d.day, u.user_id
                   FROM days d JOIN ud u
                     ON u.day BETWEEN d.day - {_WAU_DAYS - 1} AND d.day)
        SELECT CAST(day * 86400 AS BIGINT) AS day_start,
               CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        FROM w GROUP BY 1
    """
    # mirrors stages/dedup.py ngram_containment_pairs: distinct bigram
    # shingles, containment = |A∩B| / min(|A|,|B|), same source blocking;
    # docs with <2 words have empty shingle sets on both sides.  The
    # threshold applies to the RAW ratio (engine thresholds before its
    # round-6 projection, dedup.py:976) — thresholding the rounded value
    # would admit raw values in [th - 5e-7, th) the engine rejects.
    out["ngram_containment"] = f"""
        WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
                   FROM documents),
             g AS (SELECT doc_id, source,
                          list_distinct(
                            [ws[i] || ' ' || ws[i+1]
                             for i in range(1, len(ws))]) AS sh
                   FROM w WHERE len(ws) >= 2),
             p AS (SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                                / least(len(a.sh), len(b.sh)) AS raw
                   FROM g a JOIN g b
                     ON a.source = b.source AND a.doc_id < b.doc_id)
        SELECT left_id, right_id, round(raw, 6) AS containment
        FROM p WHERE raw >= {_CONTAIN_TH}
    """
    # mirrors stages/similarity.py knn_label_vote: held-out queries
    # (vec_id % mod = 0), corpus = rest, quant-6 cosine with the
    # knn_bruteforce tie discipline, (n desc, label asc) vote
    out["knn_label_vote"] = f"""
        WITH q AS (SELECT vec_id AS query_id,
                          CAST(embedding AS DOUBLE[]) AS qv,
                          CAST(label AS BIGINT) AS tl
                   FROM embeddings WHERE vec_id % {_VOTE_MOD} = 0),
             c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv,
                          CAST(label AS BIGINT) AS label
                   FROM embeddings WHERE vec_id % {_VOTE_MOD} <> 0),
             s AS (SELECT q.query_id, q.tl, c.vec_id, c.label,
                          round(list_cosine_similarity(c.cv, q.qv) * 1000000)
                            / 1000000.0 AS cosine
                   FROM q CROSS JOIN c),
             r AS (SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id) AS rank
                   FROM s),
             v AS (SELECT query_id, tl, label, count(*) AS n
                   FROM r WHERE rank <= {_VOTE_K} GROUP BY 1, 2, 3),
             w AS (SELECT query_id, tl, label AS vote FROM v
                   QUALIFY row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY n DESC, label ASC) = 1)
        SELECT tl AS label, CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(CASE WHEN vote = tl THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_correct,
               round(CAST(sum(CASE WHEN vote = tl THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS accuracy
        FROM w GROUP BY 1
    """
    # mirrors stages/text_analysis.py readability_scores: the score
    # derives from the RAW ratios, quantization applies at the end
    out["readability"] = """
        WITH c AS (
          SELECT doc_id,
                 CAST(length(regexp_extract_all(text, $$\\S+$$)) AS DOUBLE)
                   AS w,
                 CAST(length(regexp_extract_all(text, $$[.!?]$$)) AS DOUBLE)
                   AS s,
                 CAST(length(regexp_extract_all(text, $$[aeiouyAEIOUY]+$$))
                      AS DOUBLE) AS y
          FROM documents),
        r AS (SELECT doc_id, w, s, y,
                     w / greatest(s, 1.0) AS wps_raw,
                     y / greatest(w, 1.0) AS spw_raw
              FROM c)
        SELECT doc_id,
               CAST(w AS BIGINT) AS n_words,
               CAST(s AS BIGINT) AS n_sentences,
               CAST(y AS BIGINT) AS n_syllables,
               round(wps_raw * 1000000) / 1000000.0 AS wps,
               round(spw_raw * 1000000) / 1000000.0 AS spw,
               round((206.835 - 1.015 * wps_raw - 84.6 * spw_raw) * 1000000)
                 / 1000000.0 AS flesch
        FROM r
    """
    # mirrors stages/stats.py robust_stats_by_group: ceil-rank median /
    # MAD, rank-window trimmed mean, quant-6 division
    out["robust_stats_by_source"] = """
        WITH t AS (SELECT source,
                          CAST(length(regexp_extract_all(text, $$\\S+$$))
                               AS BIGINT) AS v
                   FROM documents),
             r AS (SELECT source, v,
                          row_number() OVER (PARTITION BY source
                                             ORDER BY v) AS rn,
                          count(*) OVER (PARTITION BY source) AS n
                   FROM t),
             med AS (SELECT source, v AS median FROM r
                     WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))),
             d AS (SELECT t.source, abs(t.v - m.median) AS a
                   FROM t JOIN med m ON t.source = m.source),
             rd AS (SELECT source, a,
                           row_number() OVER (PARTITION BY source
                                              ORDER BY a) AS rn,
                           count(*) OVER (PARTITION BY source) AS n
                    FROM d),
             mad AS (SELECT source, a AS mad FROM rd
                     WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))),
             tr AS (SELECT source,
                           round(CAST(sum(v) AS DOUBLE) / count(*) * 1000000)
                             / 1000000.0 AS trimmed_mean
                    FROM r
                    WHERE rn > CAST(floor(0.05 * n) AS BIGINT)
                      AND rn <= n - CAST(floor(0.05 * n) AS BIGINT)
                    GROUP BY source)
        SELECT med.source, CAST(median AS BIGINT) AS median,
               CAST(mad AS BIGINT) AS mad, trimmed_mean
        FROM med JOIN mad USING (source) JOIN tr USING (source)
    """
    # mirrors _q_revenue_forecast (TPC-H Q6): the discount band compares
    # ROUNDED integer percent points on both engines
    out["revenue_forecast"] = f"""
        WITH f AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS ec,
                          CAST(round(l_discount * 100) AS BIGINT) AS dk
                   FROM lineitem
                   WHERE l_shipdate >= TIMESTAMP '{_Q6_YEAR}-01-01'
                     AND l_shipdate < TIMESTAMP '{_Q6_YEAR + 1}-01-01'
                     AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
                     AND l_quantity < 24)
        SELECT CAST(coalesce(sum(ec * dk), 0) AS DOUBLE) / 10000.0 AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM f
    """
    # mirrors _q_nation_profit_by_year (TPC-H Q9): exact int64
    # cents×pct profit, nation names joined after the fold
    out["nation_profit_by_year"] = """
        SELECT n_name,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS DOUBLE) / 10000.0 AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
    """
    # mirrors _q_mkt_share_by_year (TPC-H Q8): exact int64 cents×pct
    # volumes; share division is DOUBLE(nat)/DOUBLE(tot) on both sides
    out["mkt_share_by_year"] = """
        WITH v AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     AS volume_c,
                   s_nationkey AS snat
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            WHERE cn.n_regionkey = 1 AND p_type = 'ECONOMY'
              AND o_orderdate >= DATE '1995-01-01'
              AND o_orderdate < DATE '1997-01-01'),
             a AS (
            SELECT o_year,
                   sum(volume_c) AS tot_c,
                   sum(CASE WHEN snat = 19 THEN volume_c ELSE 0 END) AS nat_c
            FROM v GROUP BY 1)
        SELECT o_year,
               CAST(nat_c AS DOUBLE) / CAST(tot_c AS DOUBLE) AS mkt_share,
               CAST(nat_c AS DOUBLE) / 10000.0 AS nation_volume,
               CAST(tot_c AS DOUBLE) / 10000.0 AS total_volume
        FROM a
    """
    # mirrors _q_part_value_share (TPC-H Q11): integer
    # cross-multiplication threshold — no float division on either side
    out["part_value_share"] = """
        WITH v AS (SELECT l_partkey AS partkey,
                          sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                            AS val
                   FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                   WHERE s_nationkey % 3 = 0
                   GROUP BY 1),
             t AS (SELECT sum(val) AS total, count(*) AS n FROM v)
        SELECT partkey, CAST(val AS DOUBLE) / 10000.0 AS value
        FROM v, t
        WHERE CAST(val AS HUGEINT) * 10 * n > 16 * CAST(total AS HUGEINT)
    """
    # mirrors _q_custdist (TPC-H Q13): zero-order customers included
    out["custdist"] = """
        WITH o AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1)
        SELECT CAST(coalesce(n, 0) AS BIGINT) AS c_count,
               CAST(count(*) AS BIGINT) AS custdist
        FROM customer LEFT JOIN o ON c_custkey = o_custkey
        GROUP BY 1
    """
    # mirrors _q_promo_part_suppliers (TPC-H Q20): quantity sums compare
    # as exact integers (generator quantities are integral doubles)
    out["promo_part_suppliers"] = f"""
        WITH rq AS (SELECT l_suppkey, l_partkey,
                           sum(CAST(round(l_quantity) AS BIGINT)) AS q
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE p_name LIKE '%red%'
                    GROUP BY 1, 2)
        SELECT DISTINCT s_suppkey AS suppkey, s_name
        FROM supplier
        JOIN rq ON s_suppkey = l_suppkey
        WHERE q > {_Q20_QTY}
    """
    # mirrors _q_sole_return_suppliers (TPC-H Q21): EXISTS/NOT-EXISTS
    # collapsed to per-order distinct-supplier counts; top-10 by
    # (n_orders DESC, suppkey ASC) is a total order, so LIMIT is exact
    out["sole_return_suppliers"] = """
        WITH d AS (SELECT l_orderkey, l_suppkey,
                          max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                            AS ret
                   FROM lineitem GROUP BY 1, 2),
             o AS (SELECT l_orderkey, count(*) AS ns, sum(ret) AS nr,
                          max(CASE WHEN ret = 1 THEN l_suppkey END) AS blamed
                   FROM d GROUP BY 1)
        SELECT blamed AS suppkey, s_name,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM o JOIN supplier ON blamed = s_suppkey
        WHERE ns > 1 AND nr = 1
        GROUP BY 1, 2
        ORDER BY n_orders DESC, suppkey ASC
        LIMIT 10
    """
    # mirrors _q_append_dedup_exact: prefix-fingerprint dedup of the
    # incoming slice against committed history; history wins, then
    # min-id-first within the batch
    out["append_dedup_exact"] = """
        WITH d AS (SELECT doc_id, md5(substr(text, 1, 200)) AS h
                   FROM documents),
             old AS (SELECT h FROM d WHERE doc_id % 10 < 8),
             nw AS (SELECT doc_id, h FROM d WHERE doc_id % 10 >= 8)
        SELECT doc_id FROM nw n
        WHERE NOT EXISTS (SELECT 1 FROM old o WHERE o.h = n.h)
          AND doc_id = (SELECT min(doc_id) FROM nw n2 WHERE n2.h = n.h)
    """
    out["append_dedup_minhash"] = _append_minhash_oracle_sql(0.7)
    # mirrors _q_knn_append: the knn_ivf oracle with the incoming /
    # committed id split as the query / corpus predicates
    out["knn_append"] = _knn_ivf_oracle_sql(
        q_pred="vec_id % 10 >= 8", c_pred="vec_id % 10 < 8"
    )
    # the persisted-index path must return EXACTLY what knn_ivf returns
    out["knn_ivf_partitioned"] = _knn_ivf_oracle_sql()
    # index-backed append path: identical results to append_dedup_minhash
    out["append_dedup_indexed"] = _append_minhash_oracle_sql(0.7)
    # mirrors _q_append_commit: the full two-increment commit pipeline
    out["append_commit"] = _append_commit_oracle_sql(0.7)
    # mirrors _q_min_cost_supplier (TPC-H Q2): supply cost derived from
    # lineitem as MIN int-cent extendedprice per (part, supplier); the
    # ORDER BY sorts acctbal by its CENTS (the engine's sort key) so the
    # LIMIT boundary is a shared total order — (s_name, partkey) is
    # unique within equal cents, making the top-100 set deterministic
    out["min_cost_supplier"] = f"""
        WITH cost AS (SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                             min(CAST(round(l_extendedprice * 100) AS BIGINT))
                               AS cost_c
                      FROM lineitem GROUP BY 1, 2),
             eu AS (SELECT s_suppkey, s_name, n_name,
                           CAST(round(s_acctbal * 100) AS BIGINT) AS bal_c
                    FROM supplier
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
                    WHERE r_name = '{_Q2_REGION}'),
             p AS (SELECT p_partkey FROM part
                   WHERE p_type = '{_Q2_TYPE}'
                     AND p_size % {_Q2_SIZE_MOD} = 0),
             pc AS (SELECT c.partkey, c.suppkey, c.cost_c, e.s_name,
                           e.n_name, e.bal_c
                    FROM cost c
                    JOIN p ON c.partkey = p.p_partkey
                    JOIN eu e ON c.suppkey = e.s_suppkey),
             m AS (SELECT partkey, min(cost_c) AS mc FROM pc GROUP BY 1)
        SELECT pc.bal_c / 100.0 AS s_acctbal, pc.s_name, pc.n_name,
               pc.partkey AS p_partkey, pc.cost_c / 100.0 AS supplycost
        FROM pc JOIN m ON pc.partkey = m.partkey AND pc.cost_c = m.mc
        ORDER BY pc.bal_c DESC, pc.n_name, pc.s_name, pc.partkey
        LIMIT {_Q2_TOPN}
    """
    # mirrors _q_shipmode_priority (TPC-H Q12): derived shipmode =
    # l_linenumber % 3, high = urgent/high order priority
    high_list = ", ".join(f"'{p}'" for p in _Q12_HIGH)
    out["shipmode_priority"] = f"""
        SELECT CASE l_linenumber % 3 WHEN 0 THEN '{_Q12_MODES[0]}'
                    WHEN 1 THEN '{_Q12_MODES[1]}'
                    ELSE '{_Q12_MODES[2]}' END AS shipmode,
               CAST(sum(CASE WHEN o_orderpriority IN ({high_list})
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ({high_list})
                             THEN 0 ELSE 1 END) AS BIGINT)
                 AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """
    # mirrors _q_sales_opportunity (TPC-H Q22): the avg threshold is the
    # same exact integer comparison (bal_c·n > tot ⟺ the engine's
    # floor+1 rewrite), cntrycode = c_nationkey % 7
    codes_list = ", ".join(str(c) for c in _Q22_CODES)
    out["sales_opportunity"] = f"""
        WITH cs AS (SELECT c_custkey,
                           CAST(c_nationkey % {_Q22_MOD} AS BIGINT)
                             AS cntrycode,
                           CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
                    FROM customer
                    WHERE c_nationkey % {_Q22_MOD} IN ({codes_list})),
             s AS (SELECT sum(bal_c) AS tot, count(*) AS n
                   FROM cs WHERE bal_c > 0),
             q AS (SELECT cs.* FROM cs, s
                   WHERE CAST(bal_c AS HUGEINT) * n > CAST(tot AS HUGEINT)
                     AND NOT EXISTS (SELECT 1 FROM orders
                                     WHERE o_custkey = cs.c_custkey
                                       AND o_orderdate >=
                                           TIMESTAMP '{_Q22_CUTOFF}'))
        SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
               sum(bal_c) / 100.0 AS totacctbal
        FROM q GROUP BY 1
    """
    # mirrors _q_random_projection: the ±1 sign matrix is content-
    # addressed (md5 of "rp:i:j"), so the oracle embeds the identical
    # matrix as a VALUES literal — exact int64 arithmetic on both sides
    from docling_api_ray.stages.linalg import rp_sign_values_sql

    out["random_projection"] = f"""
        WITH vq AS (SELECT vec_id,
                           list_transform(embedding, e ->
                               CAST(floor(CAST(e AS DOUBLE) * 1000000
                                          + 0.5) AS BIGINT)) AS q
                    FROM embeddings),
             vu AS (SELECT vec_id, unnest(q) AS v,
                           unnest(range(len(q))) AS i
                    FROM vq),
             r(i, j, s) AS {rp_sign_values_sql(64, 8)}
        SELECT vu.vec_id AS vec_id, CAST(r.j AS BIGINT) AS j,
               CAST(sum(vu.v * r.s) AS BIGINT) AS proj
        FROM vu JOIN r ON vu.i = r.i
        GROUP BY 1, 2
    """
    # mirrors _q_interval_join: trailing [t-W, t) window in exact
    # integer microseconds (epoch_us both sides), micro-unit value sum
    out["interval_join"] = f"""
        SELECT l.event_id AS event_id, l.user_id AS user_id,
               CAST(count(r.event_id) AS BIGINT) AS n_prior,
               CAST(coalesce(sum(CAST(floor(r.value * 1000000 + 0.5)
                                      AS BIGINT)), 0) AS BIGINT)
                 AS sum_value_q
        FROM events l LEFT JOIN events r
          ON r.user_id = l.user_id AND r.event_type = 'click'
         AND epoch_us(r.ts) >= epoch_us(l.ts) - {_INTERVAL_W_S * 1_000_000}
         AND epoch_us(r.ts) < epoch_us(l.ts)
        WHERE l.event_type = 'purchase'
        GROUP BY 1, 2
    """
    # mirrors _q_edit_distance_pairs: DuckDB's levenshtein is the same
    # unit-cost metric as stages/editdist.levenshtein
    out["edit_distance_pairs"] = """
        SELECT a.doc_id AS left_id, b.doc_id AS right_id,
               CAST(levenshtein(substr(a.text, 1, 120),
                                substr(b.text, 1, 120)) AS BIGINT) AS dist
        FROM documents a JOIN documents b
          ON substr(a.text, 1, 16) = substr(b.text, 1, 16)
         AND a.doc_id < b.doc_id
    """
    # mirrors _q_customer_running_total: micro-unit quantize BEFORE the
    # window accumulation, tie-broken by orderkey
    out["customer_running_total"] = """
        SELECT o_custkey, CAST(epoch_us(o_orderdate) AS BIGINT)
                 AS o_orderdate,
               o_orderkey, running_q
        FROM (SELECT o_custkey, o_orderdate, o_orderkey,
                     CAST(sum(CAST(floor(o_totalprice * 1000000 + 0.5)
                                   AS BIGINT))
                          OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey)
                          AS BIGINT) AS running_q
              FROM orders)
    """
    out["pagerank_neardup"] = _pagerank_oracle_sql(iters=3, threshold=0.7)
    # mirrors _q_triangle_neardup: pairs are left<right distinct, so a
    # triangle a<b<c is generated exactly once by (a,b)+(b,c)+(a,c)
    out["triangle_neardup"] = f"""
        WITH pairs AS (
          SELECT left_id, right_id FROM ({_minhash_oracle_sql(0.7)}) q
        ),
        tri AS (SELECT p1.left_id AS a, p1.right_id AS b, p2.right_id AS c
                FROM pairs p1
                JOIN pairs p2 ON p2.left_id = p1.right_id
                JOIN pairs p3 ON p3.left_id = p1.left_id
                             AND p3.right_id = p2.right_id),
        tn AS (SELECT a AS node FROM tri
               UNION ALL SELECT b FROM tri
               UNION ALL SELECT c FROM tri),
        tc AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles
               FROM tn GROUP BY 1),
        ed AS (SELECT left_id AS node FROM pairs
               UNION ALL SELECT right_id FROM pairs),
        dg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
               FROM ed GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(tc.triangles, 0) AS BIGINT) AS triangles,
               CAST(coalesce(dg.deg, 0) AS BIGINT) AS deg
        FROM documents d
        LEFT JOIN tc ON tc.node = d.doc_id
        LEFT JOIN dg ON dg.node = d.doc_id
    """
    # mirrors _q_cube_counts ('<all>' sentinels for the rollup NULLs;
    # the synthetic corpus has no NULL/'<all>' source or lang values)
    out["cube_counts"] = """
        SELECT coalesce(source, '<all>') AS source,
               coalesce(lang, '<all>') AS lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_total
        FROM documents GROUP BY CUBE (source, lang)
    """
    # mirrors _q_source_ntile: NTILE's exact remainder semantics with
    # the deterministic (n_chars, doc_id) tiebreak
    out["source_ntile"] = """
        SELECT doc_id, source, n_chars,
               CAST(ntile(4) OVER (PARTITION BY source
                                   ORDER BY n_chars, doc_id)
                    AS BIGINT) AS tile
        FROM documents
    """
    # mirrors _q_pareto_frontier: the same quantized quality_logit
    # feature CTEs, then textbook NOT-EXISTS dominance (>= both, > one)
    out["pareto_frontier"] = f"""
        WITH f AS (
          SELECT doc_id,
                 CAST(length(regexp_extract_all(text, $${wsre}$$)) AS BIGINT)
                   AS n_words,
                 round(length(regexp_extract_all(text, $${punct}$$))
                       / greatest(length(text), 1), 6) AS punct_ratio,
                 round(length(regexp_extract_all(text, $${stop}$$))
                       / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                   AS stopword_ratio,
                 round((length(text) - (length(regexp_extract_all(text, $${wsre}$$)) - 1))
                       / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                   AS mean_word_len
          FROM documents
        ),
        l AS (
          SELECT doc_id, n_words,
                 round(((((-0.6 + (-8.0 * punct_ratio))
                          + (6.0 * stopword_ratio))
                         + (-0.25 * mean_word_len))
                        + (0.35 * ln(1.0 + n_words))) * 1000000)
                   / 1000000.0 AS logit
          FROM f
        )
        SELECT a.doc_id, a.n_words, a.logit
        FROM l a
        WHERE NOT EXISTS (
          SELECT 1 FROM l b
          WHERE b.n_words >= a.n_words AND b.logit >= a.logit
            AND (b.n_words > a.n_words OR b.logit > a.logit))
    """
    # mirrors _q_embedding_quantize: same micro-unit quantizer CTE as
    # random_projection, per-dim min/max, integer affine floor-div code
    out["embedding_quantize"] = """
        WITH vq AS (SELECT vec_id,
                           list_transform(embedding, e ->
                               CAST(floor(CAST(e AS DOUBLE) * 1000000
                                          + 0.5) AS BIGINT)) AS q
                    FROM embeddings),
             vu AS (SELECT vec_id, unnest(q) AS v,
                           unnest(range(len(q))) AS i
                    FROM vq),
             rng AS (SELECT i, min(v) AS mn, max(v) AS mx
                     FROM vu GROUP BY 1)
        SELECT vu.vec_id AS vec_id, CAST(vu.i AS BIGINT) AS i,
               CAST((vu.v - r.mn) * 254 // greatest(r.mx - r.mn, 1) - 127
                    AS BIGINT) AS code
        FROM vu JOIN rng r USING (i)
    """
    # mirrors _q_user_event_sequence: ordered string_agg over the first
    # 12 events per user by (ts, event_id)
    out["user_event_sequence"] = """
        WITH r AS (SELECT user_id, event_type, ts, event_id,
                          row_number() OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS rn
                   FROM events),
        n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
              FROM events GROUP BY 1),
        s AS (SELECT user_id,
                     string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
              FROM r WHERE rn <= 12 GROUP BY 1)
        SELECT n.user_id, n.n_events, s.seq FROM n JOIN s USING (user_id)
    """
    # mirrors _q_feature_corr: identical regex-count features, HUGEINT
    # exact sufficient statistics, the same floor-quantized float
    # expression per pair (zero-variance pairs define corr = 0)
    feats = {
        "n_chars": "CAST(length(text) AS BIGINT)",
        "n_words": f"CAST(length(regexp_extract_all(text, $${wsre}$$)) AS BIGINT)",
        "n_punct": f"CAST(length(regexp_extract_all(text, $${punct}$$)) AS BIGINT)",
        "n_stop": f"CAST(length(regexp_extract_all(text, $${stop}$$)) AS BIGINT)",
    }
    fk = list(feats)
    sums = ", ".join(
        ["CAST(count(*) AS HUGEINT) AS n"]
        + [f"CAST(sum({feats[a]}) AS HUGEINT) AS s_{a}" for a in fk]
        + [
            f"CAST(sum({feats[a]} * {feats[b]}) AS HUGEINT) AS p_{a}_{b}"
            for ai, a in enumerate(fk)
            for b in fk[ai:]
        ]
    )
    pair_rows = "\n        UNION ALL\n".join(
        f"""
        SELECT '{a}' AS fx, '{b}' AS fy,
               CASE WHEN (n*p_{a}_{a} - s_{a}*s_{a}) = 0
                      OR (n*p_{b}_{b} - s_{b}*s_{b}) = 0 THEN 0.0
                    ELSE floor(CAST(n*p_{a}_{b} - s_{a}*s_{b} AS DOUBLE)
                               / sqrt(CAST(n*p_{a}_{a} - s_{a}*s_{a} AS DOUBLE)
                                      * CAST(n*p_{b}_{b} - s_{b}*s_{b} AS DOUBLE))
                               * 1000000 + 0.5) / 1000000.0
               END AS corr
        FROM s"""
        for ai, a in enumerate(fk)
        for b in fk[ai + 1:]
    )
    out["feature_corr"] = f"""
        WITH s AS (SELECT {sums} FROM documents)
        {pair_rows}
    """
    # mirrors _q_unpivot_stats: the same four regex-count features
    # melted via UNION ALL
    out["unpivot_doc_stats"] = f"""
        SELECT doc_id, 'n_chars' AS feature,
               CAST(length(text) AS BIGINT) AS value FROM documents
        UNION ALL
        SELECT doc_id, 'n_words',
               CAST(length(regexp_extract_all(text, $${wsre}$$)) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT doc_id, 'n_punct',
               CAST(length(regexp_extract_all(text, $${punct}$$)) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT doc_id, 'n_stop',
               CAST(length(regexp_extract_all(text, $${stop}$$)) AS BIGINT)
        FROM documents
    """
    # mirrors _q_ccnet_buckets: the verified charlm oracle as subquery,
    # offset truncating //, per-lang percentile_disc terciles, the same
    # threshold compare
    out["ccnet_buckets"] = f"""
        WITH cs AS ({out["charlm_scores"]}),
             m AS (SELECT cs.doc_id, d.lang,
                          CAST((cs.lp_micro + {_CCNET_OFF} * cs.n_pairs)
                               // cs.n_pairs AS BIGINT) AS metric_micro
                   FROM cs JOIN documents d USING (doc_id)
                   WHERE cs.n_pairs > 0),
             t AS (SELECT lang,
                          percentile_disc(0.33) WITHIN GROUP
                            (ORDER BY metric_micro) AS t33,
                          percentile_disc(0.67) WITHIN GROUP
                            (ORDER BY metric_micro) AS t67
                   FROM m GROUP BY 1)
        SELECT m.doc_id, m.lang, m.metric_micro,
               CASE WHEN m.metric_micro > t.t67 THEN 'head'
                    WHEN m.metric_micro > t.t33 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM m JOIN t USING (lang)
    """
    # mirrors _q_vocab_growth: min(doc_id) per word, integer bucket,
    # count per bucket
    out["vocab_growth"] = f"""
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                   FROM documents),
             f AS (SELECT word, CAST(min(doc_id) AS BIGINT) AS fd
                   FROM w WHERE word <> '' GROUP BY 1)
        SELECT CAST(fd // {_VOCAB_GROWTH_BUCKET} AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS new_words
        FROM f GROUP BY 1
    """
    # mirrors _q_lang_agreement: the verified lang_id oracle as a
    # subquery, joined back to the label, counted per (lang, pred)
    out["lang_agreement"] = f"""
        WITH p AS ({out["lang_id"]})
        SELECT d.lang, p.predicted_lang AS pred,
               CAST(count(*) AS BIGINT) AS n
        FROM p JOIN documents d USING (doc_id)
        GROUP BY 1, 2
    """
    # mirrors _q_lang_kappa: the lang_agreement confusion CTE, exact
    # integer diag/marginals, the identical po → pe → kappa float op
    # order, ⌊x·1e6+½⌋ quantize
    out["lang_kappa"] = f"""
        WITH c AS ({out["lang_agreement"]}),
             n AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM c),
             d AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS d
                   FROM c WHERE lang = pred),
             rm AS (SELECT lang, CAST(sum(n) AS BIGINT) AS r
                    FROM c GROUP BY 1),
             cm AS (SELECT pred, CAST(sum(n) AS BIGINT) AS k
                    FROM c GROUP BY 1),
             s AS (SELECT CAST(coalesce(sum(CAST(rm.r AS HUGEINT)
                                             * cm.k), 0) AS HUGEINT)
                     AS s
                   FROM rm JOIN cm ON rm.lang = cm.pred),
             raw AS (SELECT n.n,
                            CASE WHEN n.n > 0
                                 THEN CAST(d.d AS DOUBLE)
                                      / CAST(n.n AS DOUBLE)
                                 ELSE 0.0 END AS po_raw,
                            CASE WHEN n.n > 0
                                 THEN CAST(s.s AS DOUBLE)
                                      / (CAST(n.n AS DOUBLE)
                                         * CAST(n.n AS DOUBLE))
                                 ELSE 0.0 END AS pe_raw
                     FROM n CROSS JOIN d CROSS JOIN s)
        SELECT n AS n_docs,
               floor(po_raw * 1000000 + 0.5) / 1000000.0 AS po,
               floor(pe_raw * 1000000 + 0.5) / 1000000.0 AS pe,
               CASE WHEN pe_raw < 1.0
                    THEN floor((po_raw - pe_raw) / (1.0 - pe_raw)
                               * 1000000 + 0.5) / 1000000.0
                    ELSE 0.0 END AS kappa
        FROM raw
    """
    # mirrors _q_k_anonymity (stages/stats.py k_anonymity): the same
    # quasi-identifier class counts, sub-k filter, single division
    out["k_anonymity"] = f"""
        WITH cls AS (SELECT source, lang,
                            CAST(n_chars AS BIGINT) // {_KANON_BUCKET}
                              AS bucket,
                            CAST(count(*) AS BIGINT) AS n
                     FROM documents GROUP BY 1, 2, 3),
             agg AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows,
                            CAST(count(*) AS BIGINT) AS n_classes,
                            CAST(min(n) AS BIGINT) AS min_class_size,
                            CAST(count(*) FILTER (WHERE n < {_KANON_K})
                                 AS BIGINT) AS n_small_classes,
                            CAST(coalesce(sum(n) FILTER
                                            (WHERE n < {_KANON_K}), 0)
                                 AS BIGINT) AS rows_at_risk
                     FROM cls)
        SELECT n_rows, n_classes, min_class_size, n_small_classes,
               rows_at_risk,
               CASE WHEN n_rows > 0
                    THEN CAST(rows_at_risk AS DOUBLE)
                         / CAST(n_rows AS DOUBLE)
                    ELSE 0.0 END AS risk_frac
        FROM agg
    """
    # mirrors _q_ht_estimate (stages/splits.py ht_estimate): the
    # weighted_sample integer priorities, T = the 101st smallest key,
    # per-item max(x, 2⁶³/T) micro-quantized then integer-summed,
    # exact total + replayed relative error
    out["ht_estimate"] = f"""
        WITH p AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
                          CAST(({_sql_u64("CAST(doc_id AS VARCHAR)")} // 2)
                               // greatest(n_chars, 1) AS BIGINT) AS key
                   FROM documents),
             r AS (SELECT *, row_number() OVER (ORDER BY key, doc_id)
                     AS rn,
                          count(*) OVER () AS n FROM p),
             th AS (SELECT CASE WHEN max(n) > 100
                                THEN max(CASE WHEN rn = 101 THEN key END)
                                ELSE 0 END AS t,
                           CAST(max(n) AS BIGINT) AS n_rows
                    FROM r),
             tot AS (SELECT CAST(sum(x) AS BIGINT) AS true_total FROM p),
             est AS (SELECT CASE
                       WHEN th.t = 0 THEN CAST(tot.true_total AS DOUBLE)
                       ELSE CAST(sum(CASE WHEN r.rn <= 100 THEN
                         CAST(floor(greatest(CAST(r.x AS DOUBLE),
                                             9223372036854775808.0
                                             / CAST(th.t AS DOUBLE))
                                    * 1000000 + 0.5) AS HUGEINT)
                         ELSE 0 END) AS DOUBLE) / 1000000.0
                       END AS e
                     FROM r CROSS JOIN th CROSS JOIN tot
                     GROUP BY th.t, tot.true_total)
        SELECT CAST(100 AS BIGINT) AS k, th.n_rows,
               th.t AS threshold, est.e AS estimate, tot.true_total,
               CASE WHEN tot.true_total > 0
                    THEN floor((est.e - CAST(tot.true_total AS DOUBLE))
                               / CAST(tot.true_total AS DOUBLE)
                               * 1000000 + 0.5) / 1000000.0
                    ELSE 0.0 END AS rel_err
        FROM th CROSS JOIN est CROSS JOIN tot
    """
    # mirrors _q_shard_assign: the global_rank window order with the
    # identical snake formula
    out["shard_assign"] = f"""
        WITH r AS (SELECT doc_id,
                          row_number() OVER (ORDER BY n_chars DESC,
                                             doc_id ASC) AS doc_rank
                   FROM documents),
             s AS (SELECT doc_id, doc_rank,
                          (doc_rank - 1) % {2 * _SHARDS} AS sm
                   FROM r)
        SELECT doc_id, CAST(doc_rank AS BIGINT) AS doc_rank,
               CAST(CASE WHEN sm < {_SHARDS} THEN sm
                         ELSE {2 * _SHARDS - 1} - sm END AS BIGINT)
                 AS shard
        FROM s
    """
    # mirrors _q_label_centroid_dist (stages/clustering.py
    # label_centroid_dist): the same micro quantizer, exact integer
    # (label, dim) sums, denominator-cleared pairwise numerator in
    # HUGEINT, the identical sqrt → ÷(na·nb) → ÷1e6 float chain
    out["label_centroid_dist"] = """
        WITH vq AS (SELECT CAST(label AS BIGINT) AS label,
                           list_transform(embedding, e ->
                               CAST(floor(CAST(e AS DOUBLE) * 1000000
                                          + 0.5) AS BIGINT)) AS q
                    FROM embeddings),
             vu AS (SELECT label, unnest(q) AS v,
                           unnest(range(len(q))) AS i
                    FROM vq),
             sums AS (SELECT label, CAST(i AS BIGINT) AS dim,
                             CAST(sum(v) AS BIGINT) AS s
                      FROM vu GROUP BY 1, 2),
             cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS n
                     FROM vq GROUP BY 1),
             pairs AS (SELECT a.label AS la, b.label AS lb,
                              ca.n AS na, cb.n AS nb,
                              sum((CAST(a.s AS HUGEINT) * cb.n
                                   - CAST(b.s AS HUGEINT) * ca.n)
                                  * (CAST(a.s AS HUGEINT) * cb.n
                                     - CAST(b.s AS HUGEINT) * ca.n))
                                AS num
                       FROM sums a
                       JOIN sums b ON a.dim = b.dim
                                  AND a.label < b.label
                       JOIN cnt ca ON ca.label = a.label
                       JOIN cnt cb ON cb.label = b.label
                       GROUP BY 1, 2, 3, 4)
        SELECT la AS label_a, lb AS label_b, na AS n_a, nb AS n_b,
               CASE WHEN na > 0 AND nb > 0
                    THEN floor(sqrt(CAST(num AS DOUBLE))
                               / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                               / 1000000.0 * 1000000 + 0.5) / 1000000.0
                    ELSE 0.0 END AS dist
        FROM pairs
    """
    # mirrors _q_markov_eval: the session_transitions lag window split
    # by user parity, train argmax with the (n DESC, to_type ASC) tie
    # rule, unseen-from test rows counted as misses, one division
    out["markov_eval"] = """
        WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec,
                          event_type, event_id
                   FROM events),
             f AS (SELECT user_id, event_type,
                          lag(event_type) OVER w AS from_type,
                          CASE WHEN lag(sec) OVER w IS NULL THEN 1
                               WHEN sec - lag(sec) OVER w > 1800 THEN 1
                               ELSE 0 END AS is_new
                   FROM e
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY sec, event_id)),
             tr AS (SELECT from_type, event_type AS to_type,
                           CAST(count(*) AS BIGINT) AS n
                    FROM f WHERE is_new = 0 AND user_id % 2 = 0
                    GROUP BY 1, 2),
             te AS (SELECT from_type, event_type AS to_type,
                           CAST(count(*) AS BIGINT) AS n
                    FROM f WHERE is_new = 0 AND user_id % 2 = 1
                    GROUP BY 1, 2),
             pred AS (SELECT from_type, to_type AS p FROM tr
                      QUALIFY row_number() OVER (
                        PARTITION BY from_type
                        ORDER BY n DESC, to_type ASC) = 1),
             hits AS (SELECT CAST(coalesce(sum(te.n), 0) AS BIGINT) AS h
                      FROM te JOIN pred
                        ON te.from_type = pred.from_type
                       AND te.to_type = pred.p),
             tot AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS t
                     FROM te),
             trn AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS t
                     FROM tr)
        SELECT trn.t AS n_train, tot.t AS n_test,
               CASE WHEN tot.t > 0
                    THEN CAST(hits.h AS DOUBLE) / CAST(tot.t AS DOUBLE)
                    ELSE 0.0 END AS accuracy
        FROM trn CROSS JOIN tot CROSS JOIN hits
    """
    # mirrors _q_l_diversity (stages/stats.py l_diversity): per-class
    # distinct-lang counts from the (class, lang) grouped counts,
    # sub-l class/row mass, single division
    out["l_diversity"] = f"""
        WITH cls AS (SELECT source,
                            CAST(n_chars AS BIGINT) // {_KANON_BUCKET}
                              AS bucket,
                            lang, CAST(count(*) AS BIGINT) AS n
                     FROM documents GROUP BY 1, 2, 3),
             per AS (SELECT source, bucket,
                            CAST(count(*) AS BIGINT) AS div,
                            CAST(sum(n) AS BIGINT) AS rws
                     FROM cls GROUP BY 1, 2),
             agg AS (SELECT CAST(count(*) AS BIGINT) AS n_classes,
                            CAST(min(div) AS BIGINT) AS min_diversity,
                            CAST(count(*) FILTER (WHERE div < 2)
                                 AS BIGINT) AS n_below_l,
                            CAST(coalesce(sum(rws) FILTER
                                            (WHERE div < 2), 0)
                                 AS BIGINT) AS rows_below_l,
                            CAST(sum(rws) AS BIGINT) AS total
                     FROM per)
        SELECT n_classes, min_diversity, n_below_l, rows_below_l,
               CASE WHEN total > 0
                    THEN CAST(rows_below_l AS DOUBLE)
                         / CAST(total AS DOUBLE)
                    ELSE 0.0 END AS frac_below_l
        FROM agg
    """
    # mirrors _q_trimmed_mean (stages/stats.py grouped_trimmed_mean):
    # per-source rank window, keep ranks (cut, n−cut], the identical
    # HUGEINT-sum→double division, ⌊x·1e6+½⌋ quantize
    out["trimmed_mean"] = """
        WITH r AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
                          row_number() OVER (PARTITION BY source
                                             ORDER BY n_chars) AS rn,
                          count(*) OVER (PARTITION BY source) AS cnt
                   FROM documents),
             k AS (SELECT *, CAST(floor(0.1 * cnt) AS BIGINT) AS cut
                   FROM r),
             kept AS (SELECT source, v, cnt, cut FROM k
                      WHERE rn > cut AND rn <= cnt - cut)
        SELECT source,
               CAST(max(cnt) AS BIGINT) AS n,
               CAST(max(cut) AS BIGINT) AS n_trim,
               floor(CAST(sum(v) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) * 1000000 + 0.5)
                 / 1000000.0 AS trimmed_mean
        FROM kept GROUP BY source
    """
    # mirrors _q_knn_mrr: the knn_label_vote hold-out CTEs, first
    # same-label rank, identical floor-quantized micro reciprocal ranks
    out["knn_mrr"] = f"""
        WITH q AS (SELECT vec_id AS query_id,
                          CAST(embedding AS DOUBLE[]) AS qv,
                          CAST(label AS BIGINT) AS tl
                   FROM embeddings WHERE vec_id % {_VOTE_MOD} = 0),
             c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv,
                          CAST(label AS BIGINT) AS label
                   FROM embeddings WHERE vec_id % {_VOTE_MOD} <> 0),
             s AS (SELECT q.query_id, q.tl, c.vec_id, c.label,
                          round(list_cosine_similarity(c.cv, q.qv) * 1000000)
                            / 1000000.0 AS cosine
                   FROM q CROSS JOIN c),
             r AS (SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id) AS rank
                   FROM s),
             f AS (SELECT query_id, CAST(min(rank) AS BIGINT) AS fr
                   FROM r WHERE rank <= {_VOTE_K} AND label = tl
                   GROUP BY 1),
             per AS (SELECT q.query_id, q.tl,
                            COALESCE(CAST(floor(1000000.0 / f.fr + 0.5)
                                          AS BIGINT), 0) AS rr
                     FROM q LEFT JOIN f USING (query_id))
        SELECT tl AS label, CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(rr) AS BIGINT) AS sum_rr_micro,
               CAST(floor(CAST(sum(rr) AS DOUBLE) / count(*) + 0.5)
                    AS BIGINT) AS mrr_micro
        FROM per GROUP BY 1
    """
    # mirrors _q_cluster_topterms: kmeans oracle subquery, word explode
    # with the '' filter, per-word cluster-df, the identical integer
    # score, row_number top-5 per cluster
    out["cluster_topterms"] = f"""
        WITH ka AS ({_kmeans_oracle_sql(_TOPTERM_K, 2)}),
             tok AS (SELECT ka.cluster,
                            unnest(string_split(d.text, ' ')) AS w
                     FROM ka JOIN documents d ON d.doc_id = ka.vec_id),
             cw AS (SELECT cluster, w, CAST(count(*) AS BIGINT) AS n
                    FROM tok WHERE w <> '' GROUP BY 1, 2),
             dfw AS (SELECT w, CAST(count(*) AS BIGINT) AS df
                     FROM cw GROUP BY 1),
             sc AS (SELECT cluster, w AS word, n,
                           n * CAST(floor(ln({_TOPTERM_K}.0 / df) * 1000000
                                          + 0.5) AS BIGINT) AS score_micro
                    FROM cw JOIN dfw USING (w)),
             r AS (SELECT *, row_number() OVER (
                     PARTITION BY cluster
                     ORDER BY score_micro DESC, word ASC) AS rn FROM sc)
        SELECT cluster, word, n, score_micro FROM r WHERE rn <= {_TOPTERM_TOP}
    """
    # mirrors _q_corpus_card: the same integer totals, exact distinct
    # content via md5, identical floor-quantized duplicate ratio
    out["corpus_card"] = f"""
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(length(regexp_extract_all(text, $${wsre}$$)))
                    AS BIGINT) AS n_tokens,
               CAST(sum(n_chars) AS BIGINT) AS n_chars,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
               floor(CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE)
                     / count(*) * 1000000 + 0.5) / 1000000.0 AS dup_ratio
        FROM documents
    """
    # mirrors _q_user_diversity: identical integer micro-ln inner terms
    # (order-free), identical outer float expression
    out["user_event_diversity"] = """
        WITH c AS (SELECT user_id, event_type,
                          CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
             u AS (SELECT user_id,
                          CAST(sum(n) AS BIGINT) AS n_events,
                          CAST(count(*) AS BIGINT) AS n_types,
                          CAST(sum(CAST(round(n * ln(n) * 1000000) AS BIGINT))
                               AS BIGINT) AS s_micro
                   FROM c GROUP BY 1)
        SELECT user_id, n_events, n_types, s_micro,
               ln(n_events) - s_micro / (n_events * 1000000.0) AS entropy
        FROM u
    """
    # mirrors _q_length_quality_grid: identical percentile_disc decile
    # thresholds, bucket = 1 + #{thresholds strictly below}, 10x10 count
    out["length_quality_grid"] = f"""
        WITH d AS (SELECT CAST(n_chars AS BIGINT) AS n_chars,
                          CAST(length(regexp_extract_all(text, $${wsre}$$))
                               AS BIGINT) AS n_words
                   FROM documents),
             t AS (SELECT percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars) AS c10,
                     percentile_disc(0.2) WITHIN GROUP (ORDER BY n_chars) AS c20,
                     percentile_disc(0.3) WITHIN GROUP (ORDER BY n_chars) AS c30,
                     percentile_disc(0.4) WITHIN GROUP (ORDER BY n_chars) AS c40,
                     percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS c50,
                     percentile_disc(0.6) WITHIN GROUP (ORDER BY n_chars) AS c60,
                     percentile_disc(0.7) WITHIN GROUP (ORDER BY n_chars) AS c70,
                     percentile_disc(0.8) WITHIN GROUP (ORDER BY n_chars) AS c80,
                     percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS c90,
                     percentile_disc(0.1) WITHIN GROUP (ORDER BY n_words) AS w10,
                     percentile_disc(0.2) WITHIN GROUP (ORDER BY n_words) AS w20,
                     percentile_disc(0.3) WITHIN GROUP (ORDER BY n_words) AS w30,
                     percentile_disc(0.4) WITHIN GROUP (ORDER BY n_words) AS w40,
                     percentile_disc(0.5) WITHIN GROUP (ORDER BY n_words) AS w50,
                     percentile_disc(0.6) WITHIN GROUP (ORDER BY n_words) AS w60,
                     percentile_disc(0.7) WITHIN GROUP (ORDER BY n_words) AS w70,
                     percentile_disc(0.8) WITHIN GROUP (ORDER BY n_words) AS w80,
                     percentile_disc(0.9) WITHIN GROUP (ORDER BY n_words) AS w90
                   FROM d),
             b AS (SELECT CAST(1 + (d.n_chars > t.c10)::int + (d.n_chars > t.c20)::int + (d.n_chars > t.c30)::int + (d.n_chars > t.c40)::int + (d.n_chars > t.c50)::int + (d.n_chars > t.c60)::int + (d.n_chars > t.c70)::int + (d.n_chars > t.c80)::int + (d.n_chars > t.c90)::int AS BIGINT) AS len_decile,
                          CAST(1 + (d.n_words > t.w10)::int + (d.n_words > t.w20)::int + (d.n_words > t.w30)::int + (d.n_words > t.w40)::int + (d.n_words > t.w50)::int + (d.n_words > t.w60)::int + (d.n_words > t.w70)::int + (d.n_words > t.w80)::int + (d.n_words > t.w90)::int AS BIGINT) AS words_decile
                   FROM d CROSS JOIN t)
        SELECT len_decile, words_decile, CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY 1, 2
    """
    # mirrors _q_events_bursts: zero-filled (type x observed-day) grid,
    # HUGEINT moments, the literal integer burst predicate; day output
    # as days-since-epoch
    out["events_bursts"] = f"""
        WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
             types AS (SELECT DISTINCT event_type FROM events),
             c AS (SELECT event_type, CAST(ts AS DATE) AS d,
                          CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
             grid AS (SELECT t.event_type, dy.d, COALESCE(c.n, 0) AS n
                      FROM types t CROSS JOIN days dy
                      LEFT JOIN c ON c.event_type = t.event_type
                                 AND c.d = dy.d),
             m AS (SELECT event_type,
                          CAST(count(*) AS HUGEINT) AS dd,
                          CAST(sum(n) AS HUGEINT) AS s,
                          CAST(sum(n * n) AS HUGEINT) AS q
                   FROM grid GROUP BY 1)
        SELECT g.event_type,
               CAST(datediff('day', DATE '1970-01-01', g.d) AS BIGINT)
                 AS day,
               CAST(g.n AS BIGINT) AS n
        FROM grid g JOIN m USING (event_type)
        WHERE (g.n * m.dd - m.s) > 0
          AND (g.n * m.dd - m.s) * (g.n * m.dd - m.s)
              > {_BURST_SIGMA * _BURST_SIGMA} * (m.dd * m.q - m.s * m.s)
    """
    # mirrors _q_rfm_segments: per-user fold with the round(value*1e6)
    # micro convention, percentile_disc(.25/.5/.75) thresholds over the
    # user table, q = 1 + #{thresholds strictly below}
    out["rfm_segments"] = """
        WITH a AS (SELECT max(CAST(ts AS DATE)) AS anchor FROM events),
             u AS (SELECT user_id,
                          datediff('day', max(CAST(ts AS DATE)),
                                   any_value(a.anchor)) AS recency_days,
                          CAST(count(*) AS BIGINT) AS n_events,
                          CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                               AS BIGINT) AS v_micro
                   FROM events CROSS JOIN a GROUP BY user_id),
             t AS (SELECT
                     percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_days) AS r25,
                     percentile_disc(0.50) WITHIN GROUP (ORDER BY recency_days) AS r50,
                     percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_days) AS r75,
                     percentile_disc(0.25) WITHIN GROUP (ORDER BY n_events) AS f25,
                     percentile_disc(0.50) WITHIN GROUP (ORDER BY n_events) AS f50,
                     percentile_disc(0.75) WITHIN GROUP (ORDER BY n_events) AS f75,
                     percentile_disc(0.25) WITHIN GROUP (ORDER BY v_micro) AS m25,
                     percentile_disc(0.50) WITHIN GROUP (ORDER BY v_micro) AS m50,
                     percentile_disc(0.75) WITHIN GROUP (ORDER BY v_micro) AS m75
                   FROM u),
             q AS (SELECT u.user_id, u.recency_days, u.n_events, u.v_micro,
                          CAST(1 + (u.recency_days > t.r25)::int
                                 + (u.recency_days > t.r50)::int
                                 + (u.recency_days > t.r75)::int AS BIGINT) AS r_q,
                          CAST(1 + (u.n_events > t.f25)::int
                                 + (u.n_events > t.f50)::int
                                 + (u.n_events > t.f75)::int AS BIGINT) AS f_q,
                          CAST(1 + (u.v_micro > t.m25)::int
                                 + (u.v_micro > t.m50)::int
                                 + (u.v_micro > t.m75)::int AS BIGINT) AS m_q
                   FROM u CROSS JOIN t)
        SELECT user_id, recency_days, n_events, v_micro, r_q, f_q, m_q,
               CAST(r_q AS VARCHAR) || '.' || CAST(f_q AS VARCHAR)
                 || '.' || CAST(m_q AS VARCHAR) AS segment
        FROM q
    """
    # mirrors _q_leakage_safe_split: the verified minhash keep-list CTE
    # (same components), md5-bucket over the COMPONENT string, the
    # assign_splits thresholds
    out["leakage_safe_split"] = f"""
        WITH k AS ({_minhash_keep_oracle_sql(0.7)})
        SELECT doc_id, component,
               CAST(h % 100 AS BIGINT) AS bucket,
               CASE WHEN h % 100 < 90 THEN 'train'
                    WHEN h % 100 < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, component,
                     {_sql_u64("CAST(component AS VARCHAR)")} AS h
              FROM k)
    """
    # mirrors _q_cluster_profile: the shared kmeans oracle (same exact
    # integer Lloyd) as a subquery, joined to documents, k-bounded
    # integer aggregate + floor-quantized avg
    out["cluster_profile"] = f"""
        SELECT ka.cluster,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
               CAST(sum(length(regexp_extract_all(d.text, $${wsre}$$)))
                    AS BIGINT) AS sum_words,
               CAST(sum(ka.dist) AS BIGINT) AS sum_dist,
               floor(CAST(sum(d.n_chars) AS DOUBLE) / count(*)
                     * 1000000 + 0.5) / 1000000.0 AS avg_chars
        FROM ({_kmeans_oracle_sql(8, 2)}) ka
        JOIN documents d ON d.doc_id = ka.vec_id
        GROUP BY 1
    """
    # mirrors _q_source_unique_share: same shingle CTEs + distinct
    # (source, shingle); per-shingle source count decides uniqueness;
    # per-source totals and the identical floor-quantized share
    out["source_unique_share"] = f"""
        WITH {_sql_shingle_ctes()},
             es AS (SELECT DISTINCT d.source, unnest(s.sh) AS h
                    FROM sh s JOIN documents d USING (doc_id)),
             c AS (SELECT h, count(*) AS ns FROM es GROUP BY 1),
             per AS (SELECT e.source,
                            CAST(sum(CASE WHEN c.ns = 1 THEN 1 ELSE 0 END)
                                 AS BIGINT) AS n_unique,
                            CAST(count(*) AS BIGINT) AS n_distinct
                     FROM es e JOIN c USING (h) GROUP BY 1)
        SELECT source, n_unique, n_distinct,
               floor(CAST(n_unique AS DOUBLE) / n_distinct * 1000000 + 0.5)
                 / 1000000.0 AS unique_share
        FROM per
    """
    # mirrors _q_anova_eta2: HUGEINT moments, micro-quantized integer
    # sums of squares via // floor-division, one floor-quantized float.
    # ST = 0 (zero total variance) defines eta2 = 0.
    out["anova_eta2"] = """
        WITH m AS (SELECT source,
                          CAST(count(*) AS HUGEINT) AS n,
                          CAST(sum(n_chars) AS HUGEINT) AS sx,
                          CAST(sum(n_chars * n_chars) AS HUGEINT) AS sxx
                   FROM documents GROUP BY source),
             tot AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
                            CAST(sum(sx) AS HUGEINT) AS tsx,
                            CAST(sum(sxx) AS HUGEINT) AS tsxx,
                            CAST(count(*) AS BIGINT) AS n_groups
                     FROM m),
             terms AS (SELECT CAST(sum((sx * sx * 1000000) // n) AS HUGEINT)
                              AS sum_tg
                       FROM m),
             f AS (SELECT t.nn, t.n_groups,
                          (s.sum_tg - (t.tsx * t.tsx * 1000000) // t.nn)
                            AS sb,
                          (t.tsxx * 1000000
                           - (t.tsx * t.tsx * 1000000) // t.nn) AS st
                   FROM tot t CROSS JOIN terms s)
        SELECT CAST(nn AS BIGINT) AS n_docs, n_groups,
               CASE WHEN st = 0 THEN 0.0
                    ELSE floor(CAST(sb AS DOUBLE) / CAST(st AS DOUBLE)
                               * 1000000 + 0.5) / 1000000.0 END AS eta2
        FROM f
    """
    # mirrors _q_event_path_topk: lead() trigrams over the per-user
    # (ts, event_id) order, count per path, (n desc, path asc) top-20
    out["event_path_topk"] = f"""
        WITH o AS (SELECT user_id, event_type AS t1,
                          lead(event_type, 1) OVER w AS t2,
                          lead(event_type, 2) OVER w AS t3
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)),
             p AS (SELECT t1 || '>' || t2 || '>' || t3 AS path
                   FROM o WHERE t3 IS NOT NULL)
        SELECT path, CAST(count(*) AS BIGINT) AS n
        FROM p GROUP BY 1 ORDER BY n DESC, path ASC LIMIT {_PATH_K}
    """
    # mirrors _q_events_decay: anchor = max activity DATE, integer day
    # age, weight = floor(1e6 / 2^age) — exact because the denominator
    # is a power of two (engine computes 1_000_000 >> age), 0 from age
    # 20 on; order-free BIGINT sums per user
    out["events_decay_score"] = """
        WITH a AS (SELECT max(CAST(ts AS DATE)) AS anchor FROM events),
             e AS (SELECT user_id,
                          datediff('day', CAST(ts AS DATE), a.anchor) AS age
                   FROM events CROSS JOIN a)
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN age >= 20 THEN 0
                             ELSE CAST(floor(1000000.0 / power(2.0, age))
                                       AS BIGINT) END) AS BIGINT)
                 AS decay_micro
        FROM e GROUP BY 1
    """
    # mirrors _q_source_overlap: the shared shingle CTEs (32-bit-masked
    # md5 word hashes, mod-2^64 combine), distinct (shingle, source),
    # self-join on shingle with source < source, count per pair
    out["source_overlap"] = f"""
        WITH {_sql_shingle_ctes()},
             es AS (SELECT DISTINCT d.source, unnest(s.sh) AS h
                    FROM sh s JOIN documents d USING (doc_id))
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(count(*) AS BIGINT) AS n
        FROM es a JOIN es b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2
    """
    # mirrors _q_nbayes_confusion: same top-V vocab selection as
    # vocab_topk, the full Laplace grid (unseen (word,lang) cells count
    # 0), identical floor-quantized integer micro-log-probs and priors,
    # int64 score sums, argmax tie -> lang asc
    out["nbayes_confusion"] = f"""
        WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                   FROM documents),
             c0 AS (SELECT word, count(*) AS n FROM w
                    WHERE word <> '' GROUP BY 1),
             v AS (SELECT word FROM (
                     SELECT word, row_number() OVER (
                       ORDER BY n DESC, word ASC) AS r FROM c0)
                   WHERE r <= {_NB_VOCAB}),
             langs AS (SELECT DISTINCT lang FROM documents),
             tok AS (SELECT doc_id, lang,
                            unnest(string_split(text, ' ')) AS word
                     FROM documents),
             tc AS (SELECT doc_id, lang, word,
                           CAST(count(*) AS BIGINT) AS n
                    FROM tok WHERE word <> '' GROUP BY ALL),
             wl AS (SELECT t.word, t.lang, CAST(sum(t.n) AS BIGINT) AS c
                    FROM tc t JOIN v ON v.word = t.word GROUP BY 1, 2),
             grid AS (SELECT v.word, l.lang,
                             COALESCE(wl.c, 0) AS c
                      FROM v CROSS JOIN langs l
                      LEFT JOIN wl ON wl.word = v.word AND wl.lang = l.lang),
             tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot
                     FROM grid GROUP BY 1),
             model AS (SELECT g.word, g.lang,
                              CAST(floor(ln((g.c + 1.0)
                                            / (t.tot + {_NB_VOCAB}.0))
                                         * 1000000 + 0.5) AS BIGINT) AS ilog
                       FROM grid g JOIN tot t USING (lang)),
             nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
                    FROM documents GROUP BY 1),
             pri AS (SELECT lang,
                            CAST(floor(ln(CAST(nl AS DOUBLE)
                                          / (SELECT count(*) FROM documents))
                                       * 1000000 + 0.5) AS BIGINT) AS ip
                     FROM nd),
             dsc AS (SELECT t.doc_id, t.lang AS true_lang,
                            m.lang AS cand,
                            CAST(sum(t.n * m.ilog) AS BIGINT) AS s
                     FROM tc t JOIN model m ON m.word = t.word
                     GROUP BY 1, 2, 3),
             allc AS (SELECT d.doc_id, d.lang AS true_lang, p.lang AS cand,
                             COALESCE(dsc.s, 0) + p.ip AS score
                      FROM documents d CROSS JOIN pri p
                      LEFT JOIN dsc ON dsc.doc_id = d.doc_id
                                   AND dsc.cand = p.lang),
             pred AS (SELECT doc_id, true_lang, cand FROM allc
                      QUALIFY row_number() OVER (
                        PARTITION BY doc_id
                        ORDER BY score DESC, cand ASC) = 1)
        SELECT true_lang AS lang, cand AS pred,
               CAST(count(*) AS BIGINT) AS n
        FROM pred GROUP BY 1, 2
    """
    # mirrors _q_source_ols: identical HUGEINT moment sums per source,
    # the same raw-slope -> intercept -> r² float op order, the same
    # floor-quantize; zero-variance x (or y for r²) defines 0
    out["source_ols"] = f"""
        WITH m AS (
          SELECT source,
                 CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(x * y) AS HUGEINT) AS sxy,
                 CAST(sum(y * y) AS HUGEINT) AS syy
          FROM (SELECT source, CAST(n_chars AS BIGINT) AS x,
                       CAST(length(regexp_extract_all(text, $${wsre}$$))
                            AS BIGINT) AS y
                FROM documents)
          GROUP BY source),
        r AS (
          SELECT source, n, sx, sy,
                 (n * sxy - sx * sy) AS num,
                 (n * sxx - sx * sx) AS den_x,
                 (n * syy - sy * sy) AS den_y,
                 CASE WHEN (n * sxx - sx * sx) = 0 THEN 0.0
                      ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE) END
                   AS slope_raw
          FROM m)
        SELECT source, CAST(n AS BIGINT) AS n_docs,
               floor(slope_raw * 1000000 + 0.5) / 1000000.0 AS slope,
               floor((CAST(sy AS DOUBLE) - slope_raw * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000.0
                 AS intercept,
               CASE WHEN den_x = 0 OR den_y = 0 THEN 0.0
                    ELSE floor((CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
                               / (CAST(den_x AS DOUBLE)
                                  * CAST(den_y AS DOUBLE))
                               * 1000000 + 0.5) / 1000000.0 END AS r2
        FROM r
    """
    # mirrors _q_hybrid_rrf: BM25 list (row_number over score desc,
    # doc_id asc, truncated to k_each) FULL OUTER JOIN the quant-6
    # cosine list for query vec_id=0, fused with the IDENTICAL
    # floor-quantized integer micro-score; absent-list ranks -1
    out["hybrid_rrf"] = f"""
        WITH lex AS ({_bm25_oracle_sql(_BM25_TERMS)}),
             lr0 AS (SELECT doc_id, row_number() OVER (
                       ORDER BY score DESC, doc_id ASC) AS r FROM lex),
             lr AS (SELECT * FROM lr0 WHERE r <= {_RRF_K_EACH}),
             q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id = {_RRF_QUERY_ID}),
             cs AS (SELECT vec_id,
                           round(list_cosine_similarity(
                             CAST(embedding AS DOUBLE[]), q.qv) * 1000000)
                             / 1000000.0 AS cosine
                    FROM embeddings CROSS JOIN q
                    WHERE vec_id <> {_RRF_QUERY_ID}),
             cr0 AS (SELECT vec_id AS doc_id, row_number() OVER (
                       ORDER BY cosine DESC, vec_id ASC) AS r FROM cs),
             cr AS (SELECT * FROM cr0 WHERE r <= {_RRF_K_EACH}),
             f AS (SELECT COALESCE(lr.doc_id, cr.doc_id) AS doc_id,
                          CAST(COALESCE(lr.r, -1) AS BIGINT) AS bm25_rank,
                          CAST(COALESCE(cr.r, -1) AS BIGINT) AS cos_rank,
                          (CASE WHEN lr.r IS NULL THEN 0
                                ELSE CAST(floor(1000000.0 / (60 + lr.r) + 0.5)
                                          AS BIGINT) END
                           + CASE WHEN cr.r IS NULL THEN 0
                                  ELSE CAST(floor(1000000.0 / (60 + cr.r) + 0.5)
                                            AS BIGINT) END) AS rrf_micro
                   FROM lr FULL OUTER JOIN cr ON lr.doc_id = cr.doc_id)
        SELECT doc_id, bm25_rank, cos_rank, rrf_micro FROM f
        ORDER BY rrf_micro DESC, doc_id ASC LIMIT {_RRF_K_OUT}
    """
    # mirrors _q_rank_rbo: a matched doc at ranks (ra, rb) enters the
    # prefix overlap at depth max(ra, rb), so X_d = |{m : dmin <= d}|;
    # the p=1/2 weights (1-p)·p^(d-1) = 0.5^d are inlined as repr()
    # literals (exact binary doubles — identical to the engine's
    # RBO_P**d, no libm pow() in either path), and each depth term is
    # floor-quantized to int64 micro-units before the order-free sum.
    _rbo_weights = ", ".join(
        f"({d}, {0.5 ** d!r})" for d in range(1, _RBO_K + 1)
    )
    out["rank_rbo"] = f"""
        WITH lex AS ({_bm25_oracle_sql(_BM25_TERMS)}),
             lr0 AS (SELECT doc_id, row_number() OVER (
                       ORDER BY score DESC, doc_id ASC) AS r FROM lex),
             lr AS (SELECT * FROM lr0 WHERE r <= {_RBO_K}),
             q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id = {_RRF_QUERY_ID}),
             cs AS (SELECT vec_id,
                           round(list_cosine_similarity(
                             CAST(embedding AS DOUBLE[]), q.qv) * 1000000)
                             / 1000000.0 AS cosine
                    FROM embeddings CROSS JOIN q
                    WHERE vec_id <> {_RRF_QUERY_ID}),
             cr0 AS (SELECT vec_id AS doc_id, row_number() OVER (
                       ORDER BY cosine DESC, vec_id ASC) AS r FROM cs),
             cr AS (SELECT * FROM cr0 WHERE r <= {_RBO_K}),
             m AS (SELECT greatest(lr.r, cr.r) AS dmin
                   FROM lr JOIN cr ON lr.doc_id = cr.doc_id),
             w(d, wt) AS (VALUES {_rbo_weights}),
             o AS (SELECT w.d, w.wt,
                          (SELECT count(*) FROM m WHERE m.dmin <= w.d)
                            AS ov
                   FROM w)
        SELECT CAST({_RBO_K} AS BIGINT) AS k,
               (SELECT count(*) FROM m) AS overlap_at_k,
               (SELECT sum(CAST(floor(CAST(ov AS DOUBLE) / d * wt
                                      * 1000000000000.0 + 0.5) AS BIGINT))
                FROM o) / 1000000000000.0 AS rbo
    """
    # shared by the two classifier-eval mirrors below: the quality_logit
    # CTE (identical quantized features and left-to-right weights) plus
    # the lang/source labels carried through
    _qlogit_labeled = f"""
        f AS (
          SELECT doc_id, lang, source,
                 CAST(length(regexp_extract_all(text, $${wsre}$$)) AS BIGINT)
                   AS n_words,
                 round(length(regexp_extract_all(text, $${punct}$$))
                       / greatest(length(text), 1), 6) AS punct_ratio,
                 round(length(regexp_extract_all(text, $${stop}$$))
                       / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                   AS stopword_ratio,
                 round((length(text) - (length(regexp_extract_all(text, $${wsre}$$)) - 1))
                       / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                   AS mean_word_len
          FROM documents
        ),
        l AS (
          SELECT doc_id, lang, source,
                 round(((((-0.6 + (-8.0 * punct_ratio))
                          + (6.0 * stopword_ratio))
                         + (-0.25 * mean_word_len))
                        + (0.35 * ln(1.0 + n_words))) * 1000000)
                   / 1000000.0 AS logit
          FROM f
        )
    """
    # mirrors _q_quality_auc_by_source: Mann-Whitney 2U over the
    # per-source ascending score histogram (2U = Σ pos·(2·neg_below +
    # neg)), integer ⌊x+½⌋ via (2a+b)//(2b), degenerate-label sources
    # dropped by HAVING exactly as the engine skips them
    out["quality_auc_by_source"] = f"""
        WITH {_qlogit_labeled},
        s AS (SELECT source,
                     CAST(round(logit * 1000000) AS BIGINT) AS sc,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
              FROM l),
        h AS (SELECT source, sc, sum(pos) AS p, count(*) - sum(pos) AS g
              FROM s GROUP BY source, sc),
        c AS (SELECT source, sc, p, g,
                     coalesce(sum(g) OVER (PARTITION BY source ORDER BY sc
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS gb
              FROM h),
        u AS (SELECT source,
                     sum(p * (2 * gb + g)) AS u2,
                     sum(p) AS np, sum(g) AS nn
              FROM c GROUP BY source
              HAVING sum(p) > 0 AND sum(g) > 0)
        SELECT source,
               CAST(np AS BIGINT) AS n_pos,
               CAST(nn AS BIGINT) AS n_neg,
               CAST((2 * u2 * 1000000 + 2 * np * nn) // (4 * np * nn)
                    AS BIGINT) / 1000000.0 AS auc
        FROM u ORDER BY source
    """
    # mirrors _q_quality_calibration: decile bins of the micro-quantized
    # sigmoid, frac_pos one int/int division, mean_prob the same
    # (Σ/1e6)/n two-op chain
    out["quality_calibration"] = f"""
        WITH {_qlogit_labeled},
        s AS (SELECT least(CAST(round(
                       (round((1.0 / (1.0 + exp(-logit))) * 1000000)
                        / 1000000.0) * 1000000) AS BIGINT) * 10
                       // 1000000, 9) AS bin,
                     CAST(round(
                       (round((1.0 / (1.0 + exp(-logit))) * 1000000)
                        / 1000000.0) * 1000000) AS BIGINT) AS pm,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
              FROM l)
        SELECT bin,
               count(*) AS n,
               CAST(sum(pos) AS DOUBLE) / count(*) AS frac_pos,
               (CAST(sum(pm) AS DOUBLE) / 1000000.0) / count(*)
                 AS mean_prob
        FROM s GROUP BY bin ORDER BY bin
    """
    # mirrors _q_isotonic_calibration (stages/stats.py
    # isotonic_calibration): same bin fold as quality_calibration, then
    # the exact minimax isotonic fit — interval mean over every
    # (jb ≤ kb) bin pair, min over intervals starting at jb, running
    # max over jb ≤ bin — each interval ratio the SAME single int/int
    # double division, iso_prob ⌊x·1e6+½⌋-quantized
    out["isotonic_calibration"] = f"""
        WITH {_qlogit_labeled},
        s AS (SELECT least(CAST(round(
                       (round((1.0 / (1.0 + exp(-logit))) * 1000000)
                        / 1000000.0) * 1000000) AS BIGINT) * 10
                       // 1000000, 9) AS bin,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
              FROM l),
        h AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(pos) AS BIGINT) AS pos
              FROM s GROUP BY bin),
        iv AS (SELECT j.bin AS jb,
                      CAST(sum(x.pos) AS BIGINT) AS p,
                      CAST(sum(x.n) AS BIGINT) AS m,
                      k.bin AS kb
               FROM h j JOIN h k ON j.bin <= k.bin
                    JOIN h x ON x.bin BETWEEN j.bin AND k.bin
               GROUP BY j.bin, k.bin),
        mn AS (SELECT jb,
                      min(CAST(p AS DOUBLE) / CAST(m AS DOUBLE)) AS lo
               FROM iv GROUP BY 1),
        iso AS (SELECT h.bin, max(mn.lo) AS iso_raw
                FROM h JOIN mn ON mn.jb <= h.bin GROUP BY 1)
        SELECT h.bin, h.n,
               CAST(h.pos AS DOUBLE) / h.n AS frac_pos,
               floor(iso.iso_raw * 1000000 + 0.5) / 1000000.0 AS iso_prob
        FROM h JOIN iso ON iso.bin = h.bin
        ORDER BY h.bin
    """
    # mirrors _q_conformal_gate (stages/stats.py conformal_gate): the
    # quality_calibration probability expression, nonconformity
    # s = 1e6 − prob_micro, q = rank-⌈(n_cal+1)·0.9⌉ order stat over
    # even-doc 'en' calibration scores, single int/int divisions for
    # odd-doc coverage and accept rate
    out["conformal_gate"] = f"""
        WITH {_qlogit_labeled},
        sc AS (SELECT doc_id,
                      1000000 - CAST(round(
                        (round((1.0 / (1.0 + exp(-logit))) * 1000000)
                         / 1000000.0) * 1000000) AS BIGINT) AS s,
                      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
                      CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS cal
               FROM l),
        calset AS (SELECT s FROM sc WHERE cal = 1 AND pos = 1),
        nc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM calset),
        kk AS (SELECT CAST(ceil((n + 1) * 0.9) AS BIGINT) AS k, n
               FROM nc),
        ranked AS (SELECT s, row_number() OVER (ORDER BY s) AS rn
                   FROM calset),
        q AS (SELECT CASE WHEN kk.n = 0 OR kk.k > kk.n THEN 1000000
                          ELSE (SELECT s FROM ranked
                                WHERE rn = (SELECT k FROM kk))
                     END AS q
              FROM kk),
        t AS (SELECT * FROM sc WHERE cal = 0),
        agg AS (SELECT
                  CAST(count(*) FILTER (WHERE pos = 1) AS BIGINT)
                    AS n_test_pos,
                  CAST(count(*) AS BIGINT) AS n_test,
                  CAST(count(*) FILTER (WHERE pos = 1
                                          AND s <= (SELECT q FROM q))
                       AS BIGINT) AS cov_n,
                  CAST(count(*) FILTER (WHERE s <= (SELECT q FROM q))
                       AS BIGINT) AS acc_n
                FROM t)
        SELECT nc.n AS n_cal,
               q.q AS q_micro,
               agg.n_test_pos,
               CASE WHEN agg.n_test_pos > 0
                    THEN CAST(agg.cov_n AS DOUBLE)
                         / CAST(agg.n_test_pos AS DOUBLE)
                    ELSE 0.0 END AS coverage,
               agg.n_test,
               CASE WHEN agg.n_test > 0
                    THEN CAST(agg.acc_n AS DOUBLE)
                         / CAST(agg.n_test AS DOUBLE)
                    ELSE 0.0 END AS accept_rate
        FROM nc CROSS JOIN q CROSS JOIN agg
    """
    # mirrors _q_ks_drift_by_source: per-source step function carried
    # over the FULL sorted value grid (CROSS JOIN sources × values, zero
    # fill), sup of the integer cross-multiplied numerator, then the
    # SAME int-product-then-convert single division as the engine
    # (CAST(n_s * n_rest AS DOUBLE), never double-times-int)
    out["ks_drift_by_source"] = """
        WITH h AS (SELECT source, n_chars AS v, count(*) AS c
                   FROM documents GROUP BY source, n_chars),
             ns AS (SELECT source, sum(c) AS n_s FROM h GROUP BY source),
             t AS (SELECT sum(c) AS n_tot FROM h),
             vg AS (SELECT v, sum(c) AS c FROM h GROUP BY v),
             gcum AS (SELECT v, sum(c) OVER (ORDER BY v) AS ct FROM vg),
             grid AS (SELECT s.source, g.v
                      FROM (SELECT DISTINCT source FROM h) s
                      CROSS JOIN (SELECT v FROM vg) g),
             j AS (SELECT grid.source, grid.v, coalesce(h.c, 0) AS c
                   FROM grid LEFT JOIN h
                     ON h.source = grid.source AND h.v = grid.v),
             cum AS (SELECT source, v,
                            sum(c) OVER (PARTITION BY source
                                         ORDER BY v) AS cs
                     FROM j),
             d AS (SELECT cum.source,
                          max(abs(cum.cs * (t.n_tot - ns.n_s)
                                  - (gcum.ct - cum.cs) * ns.n_s)) AS num
                   FROM cum
                   JOIN gcum USING (v)
                   JOIN ns ON ns.source = cum.source
                   CROSS JOIN t
                   WHERE t.n_tot - ns.n_s > 0
                   GROUP BY cum.source)
        SELECT d.source,
               CAST(ns.n_s AS BIGINT) AS n,
               CAST(t.n_tot - ns.n_s AS BIGINT) AS n_rest,
               CAST(num AS DOUBLE)
                 / CAST(ns.n_s * (t.n_tot - ns.n_s) AS DOUBLE) AS ks_d
        FROM d JOIN ns ON ns.source = d.source CROSS JOIN t
        ORDER BY d.source
    """
    # mirrors _q_budget_select: with non-negative weights the greedy
    # whole-doc admission equals the monotone running-sum prefix
    # cw <= budget under (score DESC, doc_id ASC)
    out["budget_select"] = f"""
        WITH f AS (
          SELECT doc_id,
                 CAST(length(regexp_extract_all(text, $${wsre}$$)) AS BIGINT)
                   AS n_words,
                 round(length(regexp_extract_all(text, $${punct}$$))
                       / greatest(length(text), 1), 6) AS punct_ratio,
                 round(length(regexp_extract_all(text, $${stop}$$))
                       / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                   AS stopword_ratio,
                 round((length(text) - (length(regexp_extract_all(text, $${wsre}$$)) - 1))
                       / greatest(length(regexp_extract_all(text, $${wsre}$$)), 1), 6)
                   AS mean_word_len
          FROM documents
        ),
        l AS (
          SELECT doc_id, n_words,
                 round(((((-0.6 + (-8.0 * punct_ratio))
                          + (6.0 * stopword_ratio))
                         + (-0.25 * mean_word_len))
                        + (0.35 * ln(1.0 + n_words))) * 1000000)
                   / 1000000.0 AS logit
          FROM f
        ),
        s AS (SELECT doc_id,
                     CAST(round(logit * 1000000) AS BIGINT) AS sc,
                     n_words AS w
              FROM l),
        o AS (SELECT sc, w,
                     sum(w) OVER (ORDER BY sc DESC, doc_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cw
              FROM s),
        sel AS (SELECT * FROM o WHERE cw <= {_BUDGET_TOKENS})
        SELECT CAST({_BUDGET_TOKENS} AS BIGINT) AS budget,
               count(*) AS n_selected,
               CAST(coalesce(sum(w), 0) AS BIGINT) AS tokens_selected,
               CAST(min(sc) AS BIGINT) AS threshold_micro
        FROM sel
    """
    # mirrors _q_lsh_eval: the minhash candidate CTE chain (cand) at
    # est >= 0.7 intersected with the exact truth over the SAME 3-word
    # shingle basis the signatures estimate (distinct shingle-hash sets
    # from the shared shingle CTE); precision/recall are single int/int
    # divisions with NULLIF on empty denominators, matching the
    # engine's None
    out["lsh_eval"] = f"""
        WITH {_minhash_ctes(64, 16)},
        cf AS (SELECT left_id, right_id FROM cand
               WHERE est_jaccard >= 0.7),
        shd AS (SELECT DISTINCT doc_id, unnest(sh) AS h FROM sh),
        shc AS (SELECT doc_id, count(*) AS lw FROM shd GROUP BY doc_id),
        si AS (SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                      count(*) AS i
               FROM shd a JOIN shd b
                 ON a.h = b.h AND a.doc_id < b.doc_id
               GROUP BY a.doc_id, b.doc_id),
        tt AS (SELECT left_id, right_id FROM si
               JOIN shc ca ON ca.doc_id = si.left_id
               JOIN shc cb ON cb.doc_id = si.right_id
               WHERE CAST(i AS DOUBLE) / (ca.lw + cb.lw - i) >= 0.7),
        m AS (SELECT (SELECT count(*) FROM cf) AS n_candidates,
                     (SELECT count(*) FROM tt) AS n_true,
                     (SELECT count(*) FROM cf
                      JOIN tt ON cf.left_id = tt.left_id
                             AND cf.right_id = tt.right_id) AS n_hit)
        SELECT CAST(0.7 AS DOUBLE) AS threshold,
               CAST(n_candidates AS BIGINT) AS n_candidates,
               CAST(n_true AS BIGINT) AS n_true,
               CAST(n_hit AS BIGINT) AS n_hit,
               CAST(n_hit AS DOUBLE) / NULLIF(n_candidates, 0)
                 AS precision,
               CAST(n_hit AS DOUBLE) / NULLIF(n_true, 0) AS recall
        FROM m
    """
    # mirrors _q_event_debounce: the LAG-window keep rule per
    # (user, type) stream with the engine's (ts, event_id) tie order;
    # kept_ratio is one int/int division
    out["event_debounce"] = f"""
        WITH g AS (SELECT event_type,
                          epoch_us(ts) AS tu,
                          lag(epoch_us(ts)) OVER (
                            PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS prev
                   FROM events)
        SELECT event_type,
               count(*) AS n_total,
               CAST(sum(CASE WHEN prev IS NULL
                             OR tu - prev >= {_DEBOUNCE_US}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN prev IS NULL
                             OR tu - prev >= {_DEBOUNCE_US}
                             THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
                 AS kept_ratio
        FROM g GROUP BY event_type ORDER BY event_type
    """
    # mirrors _q_psi_by_source: fixed decile bins of the quantized
    # sigmoid, full (source x bin) zero-filled grid, Laplace +1 on both
    # sides, each term nano-quantized before the order-free sum; the
    # float chain (c+1)/(n+10.0), (p-q)*ln(p/q) is replayed
    # operand-for-operand
    out["psi_by_source"] = f"""
        WITH {_qlogit_labeled},
        s AS (SELECT source,
                     least(CAST(round(
                       (round((1.0 / (1.0 + exp(-logit))) * 1000000)
                        / 1000000.0) * 1000000) AS BIGINT) * 10
                       // 1000000, 9) AS bin
              FROM l),
        h AS (SELECT source, bin, count(*) AS c FROM s
              GROUP BY source, bin),
        grid AS (SELECT src.source, b.bin
                 FROM (SELECT DISTINCT source FROM s) src
                 CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) b),
        j AS (SELECT grid.source, grid.bin, coalesce(h.c, 0) AS c
              FROM grid LEFT JOIN h
                ON h.source = grid.source AND h.bin = grid.bin),
        ns AS (SELECT source, sum(c) AS n_s FROM j GROUP BY source),
        gb AS (SELECT bin, sum(c) AS cb FROM j GROUP BY bin),
        t AS (SELECT sum(c) AS n_tot FROM j),
        pq AS (SELECT j.source,
                      (j.c + 1) / (ns.n_s + 10.0) AS p,
                      (gb.cb - j.c + 1)
                        / (t.n_tot - ns.n_s + 10.0) AS q,
                      ns.n_s AS n_s,
                      t.n_tot - ns.n_s AS n_rest
               FROM j JOIN ns ON ns.source = j.source
               JOIN gb ON gb.bin = j.bin CROSS JOIN t
               WHERE t.n_tot - ns.n_s > 0),
        terms AS (SELECT source, n_s, n_rest,
                         CAST(round((p - q) * ln(p / q)
                                    * 1000000000.0) AS BIGINT) AS nano
                  FROM pq)
        SELECT source,
               CAST(max(n_s) AS BIGINT) AS n,
               CAST(max(n_rest) AS BIGINT) AS n_rest,
               CAST(sum(nano) AS BIGINT) AS s_nano,
               CAST(sum(nano) AS BIGINT) / 1000000000.0 AS psi
        FROM terms GROUP BY source ORDER BY source
    """
    # mirrors _q_mann_kendall: same daily counts, pairwise sign
    # self-join (days bounded), tie-corrected integer variance
    # numerator, and the identical continuity-corrected two-op z
    out["mann_kendall"] = f"""
        WITH dc AS (SELECT event_type,
                           date_diff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE)) AS day,
                           count(*) AS n
                    FROM events GROUP BY 1, 2),
        p AS (SELECT a.event_type,
                     coalesce(sum(CASE WHEN b.n > a.n THEN 1
                                       WHEN b.n < a.n THEN -1
                                       ELSE 0 END), 0) AS s
              FROM dc a JOIN dc b ON b.event_type = a.event_type
                                 AND b.day > a.day
              GROUP BY 1),
        nn AS (SELECT event_type, count(*) AS nd FROM dc GROUP BY 1),
        ties AS (SELECT event_type,
                        sum(t * (t - 1) * (2 * t + 5)) AS tt
                 FROM (SELECT event_type, n, count(*) AS t
                       FROM dc GROUP BY 1, 2)
                 GROUP BY 1),
        v AS (SELECT nn.event_type, nn.nd,
                     coalesce(p.s, 0) AS s,
                     nn.nd * (nn.nd - 1) * (2 * nn.nd + 5)
                       - coalesce(ties.tt, 0) AS var_num
              FROM nn LEFT JOIN p USING (event_type)
                      LEFT JOIN ties USING (event_type)),
        zz AS (SELECT event_type, nd, s, var_num,
                      CASE WHEN var_num > 0 AND s > 0 THEN
                             CAST(s - 1 AS DOUBLE)
                               / sqrt(CAST(var_num AS DOUBLE) / 18.0)
                           WHEN var_num > 0 AND s < 0 THEN
                             CAST(s + 1 AS DOUBLE)
                               / sqrt(CAST(var_num AS DOUBLE) / 18.0)
                           ELSE 0.0 END AS z
               FROM v)
        SELECT event_type, CAST(nd AS BIGINT) AS n_days,
               CAST(s AS BIGINT) AS s,
               CAST(var_num AS BIGINT) AS var_num, z,
               CASE WHEN z > {_MK_Z95} THEN 'up'
                    WHEN z < -{_MK_Z95} THEN 'down'
                    ELSE 'flat' END AS trend
        FROM zz
    """
    # mirrors _q_neyman_allocation: per-source integer logit moments,
    # stddev via the SAME (sqrt(num)/n)*n association, ⌊x·1e9+½⌋
    # nano-quantized weights, exact-int quota divisions, and the
    # largest-remainder rank with (rem DESC, source) tie-break
    _neyman_body = f"""
        WITH {_qlogit_labeled},
        v AS (SELECT source,
                     CAST(round(logit * 1000000) AS BIGINT) AS lm
              FROM l),
        m AS (SELECT source, count(*) AS n, sum(lm) AS s,
                     sum(lm * lm) AS ss
              FROM v GROUP BY 1),
        w AS (SELECT source, n,
                     CAST(floor(
                       (sqrt(CAST(CAST(n AS HUGEINT) * ss
                                  - CAST(s AS HUGEINT) * s AS DOUBLE))
                        / n) * n * 1000000000.0 + 0.5) AS HUGEINT)
                       AS w_nano
              FROM m),
        tot AS (SELECT sum(w_nano) AS wt, sum(n) AS ntot FROM w),
        q AS (SELECT source, n, w_nano,
                     CASE WHEN t.wt > 0
                          THEN CAST({_NEYMAN_N} * w_nano AS DOUBLE)
                               / CAST(t.wt AS DOUBLE)
                          ELSE CAST({_NEYMAN_N} * n AS DOUBLE)
                               / CAST(t.ntot AS DOUBLE) END AS quota
              FROM w CROSS JOIN tot t),
        b AS (SELECT *, CAST(floor(quota) AS BIGINT) AS base,
                     quota - floor(quota) AS rem
              FROM q),
        lv AS (SELECT {_NEYMAN_N} - sum(base) AS leftover FROM b),
        r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source)
                          AS rn
              FROM b)
        SELECT source, CAST(n AS BIGINT) AS n_docs,
               CAST(w_nano AS BIGINT) AS weight_nano, quota,
               CAST(base + CASE WHEN rn <= (SELECT leftover FROM lv)
                                THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM r
    """
    out["neyman_allocation"] = _neyman_body
    # mirrors _q_neyman_sample: the allocation body as a derived table,
    # then the stratified_sample hash rank with per-stratum k = alloc
    out["neyman_sample"] = f"""
        WITH a AS ({_neyman_body}),
        h AS (SELECT doc_id, source,
                     CAST(({_sql_u64("CAST(doc_id AS VARCHAR)")}) // 2
                          AS BIGINT) AS hkey
              FROM documents),
        r AS (SELECT *, row_number() OVER (
                 PARTITION BY source ORDER BY hkey, doc_id) AS rn
              FROM h)
        SELECT r.doc_id, r.source, r.hkey
        FROM r JOIN a ON a.source = r.source
        WHERE r.rn <= a.alloc
    """
    # mirrors _q_distinct_ngrams: n=1 over the FULL 64-bit word hash,
    # n=2,3 over the shingle tier's masked-32 combine (same constants,
    # wraparound mod 2^64); distinct via count(DISTINCT), ratio one
    # int/int division with NULLIF
    out["distinct_ngrams"] = f"""
        WITH d0 AS (SELECT doc_id, {_SQL_WORDS} AS ws FROM documents),
        w64 AS (SELECT doc_id,
                       list_transform(ws, w ->
                         CAST({_sql_u64('w')} AS HUGEINT)) AS wh
                FROM d0),
        g1 AS (SELECT unnest(wh) AS h FROM w64),
        w32 AS (SELECT doc_id,
                       list_transform(wh, x -> x % {_MASK32}) AS wh
                FROM w64),
        g2 AS (SELECT unnest(list_transform(
                 generate_series(1, len(wh) - 1), i ->
                   (wh[i] * {_SHINGLE_A} + wh[i+1] * {_SHINGLE_B}) % {_W}))
                 AS h
               FROM w32 WHERE len(wh) >= 2),
        g3 AS (SELECT unnest(list_transform(
                 generate_series(1, len(wh) - 2), i ->
                   (wh[i] * {_SHINGLE_A} + wh[i+1] * {_SHINGLE_B}
                    + wh[i+2]) % {_W})) AS h
               FROM w32 WHERE len(wh) >= 3),
        m AS (SELECT 1 AS n,
                     (SELECT count(*) FROM g1) AS t,
                     (SELECT count(DISTINCT h) FROM g1) AS d
              UNION ALL
              SELECT 2,
                     (SELECT count(*) FROM g2),
                     (SELECT count(DISTINCT h) FROM g2)
              UNION ALL
              SELECT 3,
                     (SELECT count(*) FROM g3),
                     (SELECT count(DISTINCT h) FROM g3))
        SELECT CAST(n AS BIGINT) AS n,
               CAST(t AS BIGINT) AS total_ngrams,
               CAST(d AS BIGINT) AS distinct_ngrams,
               CAST(d AS DOUBLE) / NULLIF(t, 0) AS distinct_ratio
        FROM m ORDER BY n
    """
    # mirrors _q_winnow_fingerprints / ta.winnow_fingerprints: 3-word
    # shingle hashes from the shared CTE, per-window min via a ROWS
    # frame (clipped frames filtered to full windows except the single
    # whole-sequence window of short docs), rightmost tie-break via
    # max(pos) at the window min, distinct selected positions, then the
    # count / min%2^63 / (sum%2^64)%2^63 / single-division density fold
    _WNW = ta.WINNOW_W
    out["winnow_fingerprints"] = f"""
        WITH {_winnow_fp_ctes()},
        agg AS (SELECT doc_id, count(*) AS n_fps, min(h) AS mn,
                       sum(h) AS sm
                FROM fph GROUP BY 1)
        SELECT n.doc_id,
               CAST(n.n AS BIGINT) AS n_shingles,
               CAST(CASE WHEN n.n > 0
                         THEN greatest(n.n - {_WNW} + 1, 1)
                         ELSE 0 END AS BIGINT) AS n_windows,
               CAST(coalesce(a.n_fps, 0) AS BIGINT) AS n_fps,
               CAST(a.mn % {1 << 63} AS BIGINT) AS fp_min,
               CAST((a.sm % {_W}) % {1 << 63} AS BIGINT) AS fp_sum,
               CASE WHEN n.n > 0 THEN
                 CAST(coalesce(a.n_fps, 0) AS DOUBLE)
                   / CAST(greatest(n.n - {_WNW} + 1, 1) AS DOUBLE)
               END AS density
        FROM nsh n LEFT JOIN agg a USING (doc_id)
    """
    # mirrors _q_winnow_pairs / dd.winnow_pairs: distinct winnowed hash
    # set per doc, the boilerplate bucket cap (2..max_bucket docs per
    # hash), shared-count self-join, containment = shared/min(nfp) with
    # the SAME single int/int division the engine's numpy performs
    from docling_api_ray.stages.dedup import WINNOW_MAX_BUCKET as _WMB

    out["winnow_pairs"] = f"""
        WITH {_winnow_fp_ctes()},
        fps0 AS (SELECT DISTINCT doc_id, h FROM fph),
        nf AS (SELECT doc_id, count(*) AS nfp FROM fps0 GROUP BY 1),
        ok AS (SELECT h FROM fps0 GROUP BY h
               HAVING count(*) BETWEEN 2 AND {_WMB}),
        pair AS (SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                        count(*) AS shared
                 FROM fps0 a
                 JOIN ok o ON o.h = a.h
                 JOIN fps0 b ON b.h = a.h AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
        SELECT p.left_id, p.right_id, CAST(p.shared AS BIGINT) AS shared,
               CAST(p.shared AS DOUBLE)
                 / CAST(least(l.nfp, r.nfp) AS DOUBLE) AS containment
        FROM pair p
        JOIN nf l ON l.doc_id = p.left_id
        JOIN nf r ON r.doc_id = p.right_id
        WHERE CAST(p.shared AS DOUBLE)
                / CAST(least(l.nfp, r.nfp) AS DOUBLE) >= 0.5
    """
    # mirrors _q_winnow_dedup_keep: the verified winnow_pairs set under
    # the same recursive reachability CC as _minhash_keep_oracle_sql
    out["winnow_dedup_keep"] = f"""
        WITH RECURSIVE wpairs AS (
          SELECT left_id, right_id FROM ({out["winnow_pairs"]}) q
        ),
        edges AS (SELECT left_id AS a, right_id AS b FROM wpairs
                  UNION ALL
                  SELECT right_id, left_id FROM wpairs),
        reach(node, lbl) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.b, rr.lbl FROM reach rr JOIN edges e ON e.a = rr.node
        ),
        comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY 1)
        SELECT d.doc_id,
               CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
               coalesce(c.component, d.doc_id) = d.doc_id AS keep
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """
    # mirrors _q_cdc_dedup / dd.cdc_chunk_stats: rolling k-word hash per
    # position (windowed self-join against the HUGEINT pow table),
    # boundary at rh % D == 0, chunk = words up to the next end (each
    # doc's last word always ends its final chunk), chunk identity =
    # the fp_rolling positional combine over the chunk, then the
    # total/distinct/single-division summary row
    from docling_api_ray.stages.dedup import CDC_D as _CDC_D
    from docling_api_ray.stages.dedup import CDC_K as _CDC_K

    out["cdc_dedup"] = f"""
        WITH RECURSIVE {_sql_shingle_ctes()},
        w AS (SELECT doc_id, unnest(wh) AS w32,
                     unnest(generate_series(1, len(wh))) AS i FROM wh),
        nw AS (SELECT doc_id, len(wh) AS n FROM wh WHERE len(wh) > 0),
        pows(k, v) AS (
          SELECT 0, CAST(1 AS HUGEINT)
          UNION ALL
          SELECT k + 1, (v * {_FP_BASE}) % {_W} FROM pows
          WHERE k + 1 < (SELECT coalesce(greatest(max(len(wh)),
                                                  {_CDC_K}), {_CDC_K})
                         FROM wh)),
        roll AS (SELECT a.doc_id, a.i,
                        sum((b.w32 * p.v) % {_W}) % {_W} AS rh
                 FROM w a
                 JOIN w b ON b.doc_id = a.doc_id
                      AND b.i BETWEEN a.i - {_CDC_K - 1} AND a.i
                 JOIN pows p ON p.k = a.i - b.i
                 WHERE a.i >= {_CDC_K}
                 GROUP BY 1, 2),
        ends AS (SELECT DISTINCT doc_id, i FROM (
                   SELECT doc_id, i FROM roll WHERE rh % {_CDC_D} = 0
                   UNION ALL
                   SELECT doc_id, n FROM nw)),
        cw AS (SELECT w.doc_id, w.i, w.w32, min(e.i) AS e
               FROM w JOIN ends e
                    ON e.doc_id = w.doc_id AND e.i >= w.i
               GROUP BY 1, 2, 3),
        ch AS (SELECT cw.doc_id, cw.e,
                      sum((cw.w32 * p.v) % {_W}) % {_W} AS h
               FROM cw JOIN pows p ON p.k = cw.e - cw.i
               GROUP BY 1, 2),
        m AS (SELECT (SELECT coalesce(sum(n), 0) FROM nw) AS tw,
                     count(*) AS tc, count(DISTINCT h) AS dc
              FROM ch)
        SELECT CAST(tw AS BIGINT) AS total_words,
               CAST(tc AS BIGINT) AS total_chunks,
               CAST(dc AS BIGINT) AS distinct_chunks,
               CASE WHEN tc > 0
                    THEN CAST(dc AS DOUBLE) / CAST(tc AS DOUBLE)
               END AS dedup_ratio,
               CASE WHEN tc > 0
                    THEN CAST(tw AS DOUBLE) / CAST(tc AS DOUBLE)
               END AS mean_chunk_words
        FROM m
    """
    # mirrors _q_events_ewma: per-type daily counts, the EWMA recursion
    # as a linear recursive CTE stepping r -> r+1 with the SAME
    # mult-mult-add double arithmetic, ratio vs the carried prior
    out["events_ewma"] = f"""
        WITH RECURSIVE
        dc AS (SELECT event_type,
                      date_diff('day', DATE '1970-01-01',
                                CAST(ts AS DATE)) AS day,
                      count(*) AS n
               FROM events GROUP BY 1, 2),
        ord AS (SELECT event_type, day, n,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY day) AS r
                FROM dc),
        ew(event_type, day, n, r, prev, s) AS (
          SELECT event_type, day, n, r, CAST(NULL AS DOUBLE),
                 CAST(n AS DOUBLE)
          FROM ord WHERE r = 1
          UNION ALL
          SELECT o.event_type, o.day, o.n, o.r, ew.s,
                 {_EWMA_ALPHA} * CAST(o.n AS DOUBLE)
                   + {1.0 - _EWMA_ALPHA} * ew.s
          FROM ord o JOIN ew ON ew.event_type = o.event_type
                            AND o.r = ew.r + 1)
        SELECT event_type, CAST(day AS BIGINT) AS day,
               CAST(n AS BIGINT) AS n, s AS ewma,
               CAST(n AS DOUBLE) / prev AS ratio,
               coalesce(CAST(n AS DOUBLE) / prev >= {_EWMA_HI}
                        OR CAST(n AS DOUBLE) / prev <= {_EWMA_LO},
                        FALSE) AS alert
        FROM ew
    """
    # mirrors _q_kendall_length_tokens / kendall_tau_b: dense distinct
    # grid, the same 2D prefix sums as window cumsums (a = mass with
    # x'<x per column; ll/lg = strictly-left/right row cumsums of a),
    # int tie moments, and the identical two-factor double product
    out["kendall_length_tokens"] = """
        WITH t AS (SELECT CAST(n_chars AS BIGINT) AS x,
                          CAST(length(regexp_extract_all(text, $$\\S+$$))
                               AS BIGINT) AS y
                   FROM documents),
        cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
                  FROM t GROUP BY 1, 2),
        grid AS (SELECT xs.x, ys.y, coalesce(c.c, 0) AS c
                 FROM (SELECT DISTINCT x FROM cells) xs
                 CROSS JOIN (SELECT DISTINCT y FROM cells) ys
                 LEFT JOIN cells c USING (x, y)),
        a AS (SELECT x, y, c,
                     coalesce(sum(c) OVER (PARTITION BY y ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS ax
              FROM grid),
        l AS (SELECT x, y, c, ax,
                     coalesce(sum(ax) OVER (PARTITION BY x ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS ll,
                     sum(ax) OVER (PARTITION BY x)
                       - sum(ax) OVER (PARTITION BY x ORDER BY y
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS lg
              FROM a),
        s AS (SELECT sum(c * ll) AS cc, sum(c * lg) AS dd FROM l),
        mx AS (SELECT sum(tt * (tt - 1) / 2) AS n1 FROM
               (SELECT x, sum(c) AS tt FROM cells GROUP BY 1)),
        my AS (SELECT sum(tt * (tt - 1) / 2) AS n2 FROM
               (SELECT y, sum(c) AS tt FROM cells GROUP BY 1)),
        nn AS (SELECT sum(c) AS n, sum(c) * (sum(c) - 1) / 2 AS n0
               FROM cells)
        SELECT CAST(n AS BIGINT) AS n,
               CAST(cc AS BIGINT) AS concordant,
               CAST(dd AS BIGINT) AS discordant,
               CAST(n1 AS BIGINT) AS ties_x,
               CAST(n2 AS BIGINT) AS ties_y,
               CASE WHEN n0 > n1 AND n0 > n2 THEN
                 CAST(cc - dd AS DOUBLE)
                   / sqrt(CAST(n0 - n1 AS DOUBLE)
                          * CAST(n0 - n2 AS DOUBLE))
               END AS tau_b
        FROM s, mx, my, nn
    """
    # mirrors _q_benford_audit: leading digit of positive integer cents
    # via VARCHAR head, dense 9-digit grid, nano-quantized chi-square
    # terms with the identical (o-e)*(o-e)/e association, alert compare
    # on the same divided double
    out["benford_audit"] = f"""
        WITH c0 AS (SELECT event_type,
                           CAST(floor(value * 100) AS BIGINT) AS cents
                    FROM events),
        d AS (SELECT event_type,
                     CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                       AS digit
              FROM c0 WHERE cents > 0),
        o AS (SELECT event_type, digit, count(*) AS c FROM d GROUP BY 1, 2),
        nn AS (SELECT event_type, sum(c) AS n FROM o GROUP BY 1),
        grid AS (SELECT nn.event_type, dd.digit, nn.n,
                        coalesce(o.c, 0) AS c
                 FROM nn CROSS JOIN
                      (SELECT unnest(generate_series(1, 9)) AS digit) dd
                 LEFT JOIN o ON o.event_type = nn.event_type
                            AND o.digit = dd.digit),
        t AS (SELECT event_type, n,
                     CAST(floor(
                       ((CAST(c AS DOUBLE) - n * log10(1 + 1.0 / digit))
                        * (CAST(c AS DOUBLE) - n * log10(1 + 1.0 / digit)))
                       / (n * log10(1 + 1.0 / digit))
                       * 1000000000.0 + 0.5) AS BIGINT) AS nano
              FROM grid)
        SELECT event_type, CAST(max(n) AS BIGINT) AS n,
               CAST(sum(nano) AS BIGINT) AS chi2_nano,
               CAST(sum(nano) AS BIGINT) / 1000000000.0 AS chi2,
               CAST(sum(nano) AS BIGINT) / 1000000000.0
                 > {_BENFORD_CHI2_99} AS benford_alert
        FROM t GROUP BY event_type
    """
    # mirrors _q_table_profile: one UNION ALL branch per profiled
    # column with the same typed min/max split and count(DISTINCT)
    _prof_branches = []
    for _c, _k in _PROFILE_COLS:
        if _k == "num":
            _mm = (
                f"CAST(min({_c}) AS BIGINT) AS min_num, "
                f"CAST(max({_c}) AS BIGINT) AS max_num, "
                "CAST(NULL AS VARCHAR) AS min_str, "
                "CAST(NULL AS VARCHAR) AS max_str"
            )
        else:
            _mm = (
                "CAST(NULL AS BIGINT) AS min_num, "
                "CAST(NULL AS BIGINT) AS max_num, "
                f"min({_c}) AS min_str, max({_c}) AS max_str"
            )
        _prof_branches.append(
            f"SELECT '{_c}' AS column, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(count(*) - count({_c}) AS BIGINT) AS n_null, "
            f"CAST(count(DISTINCT {_c}) AS BIGINT) AS n_distinct, "
            f"{_mm} FROM lineitem"
        )
    out["table_profile"] = " UNION ALL ".join(_prof_branches)
    # mirrors _q_dedup_normalized: the normalize_text SQL expression,
    # count(DISTINCT) on it, the same floor-micro ratio
    out["dedup_normalized"] = f"""
        WITH nrm AS (SELECT trim(regexp_replace(regexp_replace(
                            lower(text), $${ta.PUNCT_RE}$$, '', 'g'),
                            $$\\s+$$, ' ', 'g')) AS t
                     FROM documents),
        m AS (SELECT count(*) AS n, count(DISTINCT t) AS d FROM nrm)
        SELECT CAST(n AS BIGINT) AS n_docs,
               CAST(d AS BIGINT) AS distinct_normalized,
               CAST(n - d AS BIGINT) AS n_dups,
               CASE WHEN n > 0 THEN
                 floor(CAST(n - d AS DOUBLE) / n * 1000000) / 1000000.0
               END AS dup_ratio
        FROM m
    """
    # mirrors _q_hll_eval: the verified register oracle on a dense
    # bucket grid, the INTEGER Σ2^(53−ρ) harmonic denominator in
    # HUGEINT, the same left-assoc estimator and branch, explicit
    # floor(x·1e6+0.5) signed micro rounding
    from docling_api_ray.stages.sketch import HLL_B as _HLL_B

    _hm = 1 << _HLL_B
    _ha = f"(0.7213 / (1.0 + 1.079 / {_hm}))"
    _hraw = (
        f"{_ha} * {_hm} * {_hm} * 9007199254740992.0"
        " / CAST(si AS DOUBLE)"
    )
    out["hll_eval"] = f"""
        WITH r0 AS (SELECT * FROM ({out["hll_registers"]})),
        grid AS (SELECT b.bucket, coalesce(r0.max_rho, 0) AS rho
                 FROM (SELECT unnest(generate_series(0, {_hm - 1}))
                         AS bucket) b
                 LEFT JOIN r0 USING (bucket)),
        s AS (SELECT sum(CAST(power(2, 53 - rho) AS HUGEINT)) AS si,
                     sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS zeros
              FROM grid),
        v AS (SELECT count(DISTINCT word) AS n_exact FROM
              (SELECT unnest(string_split(text, ' ')) AS word
               FROM documents) WHERE word <> ''),
        e AS (SELECT CASE WHEN {_hraw} <= {2.5 * _hm} AND zeros > 0
                          THEN {_hm} * ln({_hm} / zeros)
                          ELSE {_hraw} END AS est
              FROM s)
        SELECT CAST({_hm} AS BIGINT) AS m,
               CAST(n_exact AS BIGINT) AS n_exact,
               CAST(floor(est * 1000000 + 0.5) AS BIGINT) AS est_micro,
               CASE WHEN n_exact > 0 THEN
                 CAST(floor((est - n_exact) / n_exact * 1000000 + 0.5)
                      AS BIGINT)
               END AS rel_err_micro,
               CASE WHEN n_exact > 0 THEN
                 abs((est - n_exact) / n_exact) <= 3.0 * 1.04 / sqrt({_hm})
               END AS within_3sigma
        FROM e, v
    """
    # mirrors _q_cms_eval: the verified countmin oracle joined against
    # exact probe counts, same left-assoc e/W*N bound expression
    import math as _math

    from docling_api_ray.stages.sketch import CMS_W as _CMS_W

    _cms_probe_list = ", ".join(
        "'" + w + "'" for w in sorted(set(_CMS_PROBES))
    )
    out["cms_eval"] = f"""
        WITH est AS (SELECT * FROM ({out["countmin_words"]})),
        toks AS (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents),
        wc AS (SELECT w, count(*) AS n FROM toks
               WHERE w <> '' GROUP BY 1),
        nt AS (SELECT coalesce(sum(n), 0) AS n_tot FROM wc),
        p AS (SELECT unnest([{_cms_probe_list}]) AS word)
        SELECT p.word,
               CAST(coalesce(wc.n, 0) AS BIGINT) AS exact_n,
               CAST(est.est_n AS BIGINT) AS est_n,
               CAST(est.est_n - coalesce(wc.n, 0) AS BIGINT) AS err,
               est.est_n >= coalesce(wc.n, 0) AS overestimates,
               (est.est_n - coalesce(wc.n, 0))
                 <= {_math.e} / {_CMS_W} * nt.n_tot AS within_eps_n
        FROM p LEFT JOIN wc ON wc.w = p.word
               JOIN est ON est.word = p.word
               CROSS JOIN nt
    """
    # mirrors _q_bloom_fpr: the bloom_decontaminate bit/probe CTEs,
    # content-hash membership truth (a duplicate of a benchmark doc is
    # a TRUE positive), same theory expression and 3x compare
    from docling_api_ray.stages.sketch import BLOOM_K as _BK
    from docling_api_ray.stages.sketch import BLOOM_M as _BM

    out["bloom_fpr"] = f"""
        WITH h AS (SELECT doc_id, {_sql_u64('text')} AS u FROM documents),
        mh AS (SELECT DISTINCT u FROM h WHERE doc_id % 50 = 0),
        mhh AS (SELECT u % {_BM} AS h1,
                       (u // 4294967296) * 2 + 1 AS h2 FROM mh),
        ks AS (SELECT unnest(generate_series(0, {_BK - 1})) AS i),
        bits AS (SELECT DISTINCT
                   CAST((h1 + i * h2) % {_BM} AS BIGINT) AS bit
                 FROM mhh, ks),
        ph AS (SELECT doc_id, u, u % {_BM} AS h1,
                      (u // 4294967296) * 2 + 1 AS h2 FROM h),
        probe AS (SELECT p.doc_id, p.u,
                         CAST((p.h1 + ks.i * p.h2) % {_BM} AS BIGINT)
                           AS bit
                  FROM ph p, ks),
        maybe AS (SELECT probe.doc_id, any_value(probe.u) AS u,
                         bool_and(b.bit IS NOT NULL) AS mb
                  FROM probe LEFT JOIN bits b ON b.bit = probe.bit
                  GROUP BY probe.doc_id),
        cls AS (SELECT doc_id, mb,
                       u NOT IN (SELECT u FROM mh) AS is_probe
                FROM maybe),
        nn AS (SELECT (SELECT count(*) FROM mh) AS n,
                      count(*) FILTER (is_probe) AS n_probe,
                      count(*) FILTER (is_probe AND mb) AS n_fp
               FROM cls)
        SELECT CAST({_BM} AS BIGINT) AS m, CAST({_BK} AS BIGINT) AS k,
               CAST(n AS BIGINT) AS n_member_hashes,
               CAST(n_probe AS BIGINT) AS n_probes,
               CAST(n_fp AS BIGINT) AS n_false_pos,
               CASE WHEN n_probe > 0 THEN
                 CAST(n_fp AS DOUBLE) / CAST(n_probe AS DOUBLE)
               END AS fpr,
               CAST(floor(power(1.0 - power(1.0 - 1.0 / {_BM},
                                            {_BK} * n), {_BK})
                          * 1000000 + 0.5) AS BIGINT) AS p_theory_micro,
               CASE WHEN n_probe > 0 THEN
                 CAST(n_fp AS DOUBLE) / CAST(n_probe AS DOUBLE)
                   <= 3.0 * power(1.0 - power(1.0 - 1.0 / {_BM},
                                              {_BK} * n), {_BK})
               END AS within_3x_theory
        FROM nn
    """
    # mirrors _q_funnel_latency: the funnel_reached anchor semantics
    # (first view, first strictly-later click), integer-µs deltas,
    # percentile_disc = quantile_select's ceil(q·n) rank contract
    out["funnel_latency"] = """
        WITH e AS (SELECT user_id, CAST(ts AS BIGINT) AS us, event_type
                   FROM (SELECT user_id, epoch_us(ts) AS ts, event_type
                         FROM events
                         WHERE event_type IN ('view', 'click'))),
        t1 AS (SELECT user_id, min(us) AS t1 FROM e
               WHERE event_type = 'view' GROUP BY 1),
        t2 AS (SELECT e.user_id, min(e.us) AS t2
               FROM e JOIN t1 USING (user_id)
               WHERE e.event_type = 'click' AND e.us > t1.t1
               GROUP BY 1),
        d AS (SELECT t2.user_id, t2.t2 - t1.t1 AS delta
              FROM t2 JOIN t1 USING (user_id))
        SELECT CAST(count(*) AS BIGINT) AS n_converted,
               CAST(min(delta) AS BIGINT) AS min_us,
               CAST(max(delta) AS BIGINT) AS max_us,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY delta)
                    AS DOUBLE) AS p50_us,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY delta)
                    AS DOUBLE) AS p90_us
        FROM d
    """
    # mirrors _q_quality_ensemble: the three verified signal oracles as
    # derived tables, the same quantized compares, 2-of-3 majority
    out["quality_ensemble"] = f"""
        WITH g AS (SELECT doc_id, keep AS gk
                   FROM ({out["gopher_quality"]})),
        l AS (SELECT doc_id, keep AS lk FROM ({out["quality_logit"]})),
        r AS (SELECT doc_id,
                     flesch >= {_ENS_FLESCH_LO}
                       AND flesch <= {_ENS_FLESCH_HI} AS rk
              FROM ({out["readability"]}))
        SELECT g.doc_id, g.gk AS gopher_keep, l.lk AS logit_keep,
               r.rk AS readability_keep,
               CAST(CAST(g.gk AS BIGINT) + CAST(l.lk AS BIGINT)
                    + CAST(r.rk AS BIGINT) AS BIGINT) AS votes,
               CAST(g.gk AS BIGINT) + CAST(l.lk AS BIGINT)
                 + CAST(r.rk AS BIGINT) >= 2 AS ensemble_keep
        FROM g JOIN l ON l.doc_id = g.doc_id
               JOIN r ON r.doc_id = g.doc_id
    """
    # mirrors _q_selfjoin_blowup: per-key degree CTE per column, the
    # same Σdeg² / max / count moments, one division
    _bl_branches = []
    for _c in _BLOWUP_COLS:
        _bl_branches.append(f"""
            SELECT '{_c}' AS column,
                   CAST(sum(d) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(max(d) AS BIGINT) AS max_degree,
                   CAST(sum(d * d) AS BIGINT) AS selfjoin_rows,
                   CAST(sum(d * d) AS DOUBLE)
                     / CAST(sum(d) AS DOUBLE) AS blowup
            FROM (SELECT {_c}, count(*) AS d FROM lineitem GROUP BY 1)
        """)
    out["selfjoin_blowup"] = " UNION ALL ".join(_bl_branches)
    # mirrors _q_hill_tail_index: same (n_chars DESC, doc_id) top-(k+1),
    # nano-quantized ln ratios vs x_(k+1), one float division (assumes
    # the corpus holds > k+1 docs, true for every gate sf)
    out["hill_tail_index"] = f"""
        WITH t AS (SELECT CAST(n_chars AS BIGINT) AS x FROM documents
                   ORDER BY n_chars DESC, doc_id LIMIT {_HILL_K + 1}),
        r AS (SELECT x, row_number() OVER (ORDER BY x DESC) AS rn FROM t),
        k1 AS (SELECT x AS xk1 FROM r WHERE rn = {_HILL_K + 1}),
        s AS (SELECT sum(CAST(floor(
                 ln(CAST(r.x AS DOUBLE) / CAST(k1.xk1 AS DOUBLE))
                 * 1000000000.0 + 0.5) AS BIGINT)) AS sn
              FROM r, k1 WHERE rn <= {_HILL_K})
        SELECT CAST({_HILL_K} AS BIGINT) AS k,
               (SELECT CAST(xk1 AS BIGINT) FROM k1) AS x_k1,
               CAST(sn AS BIGINT) AS sum_nano,
               CASE WHEN sn > 0 THEN
                 CAST({_HILL_K} AS DOUBLE) / (sn / 1000000000.0)
               END AS alpha
        FROM s
    """
    # mirrors _q_quantile_normalize: rank() (min-rank ties) per source,
    # pooled position ceil(r*N/ns) in integer arithmetic, mapped value
    # = smallest pooled value whose cumulative count reaches it
    out["quantile_normalize"] = """
        WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v
                   FROM documents),
        r AS (SELECT doc_id, source, v,
                     rank() OVER (PARTITION BY source ORDER BY v) AS rk,
                     count(*) OVER (PARTITION BY source) AS ns,
                     count(*) OVER () AS n
              FROM d),
        j AS (SELECT doc_id, source, v,
                     (rk * n + ns - 1) // ns AS tgt
              FROM r),
        ph AS (SELECT v, count(*) AS c FROM d GROUP BY 1),
        pcum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM ph),
        m AS (SELECT j.doc_id, j.source, j.v, min(p.v) AS qn
              FROM j JOIN pcum p ON p.cum >= j.tgt
              GROUP BY 1, 2, 3)
        SELECT doc_id, source, v AS value,
               CAST(qn AS BIGINT) AS qn_value
        FROM m
    """
    # mirrors _q_blocklist_rate: same split-words tokenization, list
    # containment against the literal blocklist, single-division rate
    _bl_lits = ", ".join(f"'{w}'" for w in _BLOCKLIST)
    out["blocklist_rate"] = f"""
        WITH f AS (SELECT source,
                          CASE WHEN len(list_filter({_SQL_WORDS},
                                 w -> w IN ({_bl_lits}))) > 0
                               THEN 1 ELSE 0 END AS fl
                   FROM documents)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(fl) AS BIGINT) AS n_flagged,
               CAST(sum(fl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 AS flag_rate
        FROM f GROUP BY source
    """
    # mirrors _q_vocab_coverage: exact wordcount, count-of-counts
    # moments, unseen = N1/N and chao1 = V + N1²/(2·N2) as the same
    # single divisions (add AFTER divide)
    out["vocab_coverage"] = """
        WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                   FROM documents),
        c AS (SELECT word, count(*) AS n FROM w
              WHERE word <> '' GROUP BY 1),
        m AS (SELECT count(*) AS v, coalesce(sum(n), 0) AS nt,
                     count(*) FILTER (n = 1) AS n1,
                     count(*) FILTER (n = 2) AS n2
              FROM c)
        SELECT CAST(nt AS BIGINT) AS n_tokens,
               CAST(v AS BIGINT) AS vocab,
               CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               CASE WHEN nt > 0 THEN
                 CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE)
               END AS unseen_mass,
               CASE WHEN n2 > 0 THEN
                 v + CAST(n1 * n1 AS DOUBLE) / CAST(2 * n2 AS DOUBLE)
               END AS chao1
        FROM m
    """
    # mirrors _q_zipf_fit: same wordcount CTE as vocab_topk, rank by
    # (n DESC, word ASC), floor(ln*1e9 + 0.5) quantized logs, HUGEINT
    # mirrors _q_welch_ttest (stages/stats.py grouped_welch): exact
    # int moment rows per source, rest = global − own, the identical
    # float op order (var → se² → s → t → Welch–Satterthwaite df),
    # floor-quantized to 6 decimals; `significant` compares the
    # QUANTIZED |t| to 1.96 exactly as the engine does
    out["welch_ttest"] = """
        WITH m AS (SELECT source,
                          CAST(count(*) AS BIGINT) AS na,
                          CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sa,
                          CAST(sum(CAST(n_chars AS BIGINT)
                                   * CAST(n_chars AS BIGINT)) AS BIGINT)
                            AS qa
                   FROM documents GROUP BY 1),
             g AS (SELECT CAST(sum(na) AS BIGINT) AS n,
                          CAST(sum(sa) AS BIGINT) AS sx,
                          CAST(sum(qa) AS BIGINT) AS sxx FROM m),
             r AS (SELECT m.source, m.na, g.n - m.na AS nb,
                          CASE WHEN m.na > 0
                               THEN CAST(m.sa AS DOUBLE)
                                    / CAST(m.na AS DOUBLE)
                               ELSE 0.0 END AS mean_a,
                          CASE WHEN g.n - m.na > 0
                               THEN CAST(g.sx - m.sa AS DOUBLE)
                                    / CAST(g.n - m.na AS DOUBLE)
                               ELSE 0.0 END AS mean_b,
                          CASE WHEN m.na > 1 THEN
                            ((CAST(m.qa AS DOUBLE)
                              - CAST(m.sa AS DOUBLE) * CAST(m.sa AS DOUBLE)
                                / CAST(m.na AS DOUBLE))
                             / CAST(m.na - 1 AS DOUBLE))
                            / CAST(m.na AS DOUBLE)
                          END AS se2a,
                          CASE WHEN g.n - m.na > 1 THEN
                            ((CAST(g.sxx - m.qa AS DOUBLE)
                              - CAST(g.sx - m.sa AS DOUBLE)
                                * CAST(g.sx - m.sa AS DOUBLE)
                                / CAST(g.n - m.na AS DOUBLE))
                             / CAST(g.n - m.na - 1 AS DOUBLE))
                            / CAST(g.n - m.na AS DOUBLE)
                          END AS se2b
                   FROM m CROSS JOIN g),
             s AS (SELECT source, na, nb, mean_a, mean_b, se2a, se2b,
                          CASE WHEN se2a IS NOT NULL AND se2b IS NOT NULL
                                    AND se2a + se2b > 0.0
                               THEN (mean_a - mean_b) / sqrt(se2a + se2b)
                               ELSE 0.0 END AS t_raw,
                          CASE WHEN se2a IS NOT NULL AND se2b IS NOT NULL
                                    AND se2a + se2b > 0.0
                                    AND se2a * se2a / CAST(na - 1 AS DOUBLE)
                                        + se2b * se2b
                                          / CAST(nb - 1 AS DOUBLE) > 0.0
                               THEN (se2a + se2b) * (se2a + se2b)
                                    / (se2a * se2a / CAST(na - 1 AS DOUBLE)
                                       + se2b * se2b
                                         / CAST(nb - 1 AS DOUBLE))
                               ELSE 0.0 END AS df_raw
                   FROM r)
        SELECT source, na AS n_a, nb AS n_b,
               floor(mean_a * 1000000 + 0.5) / 1000000.0 AS mean_a,
               floor(mean_b * 1000000 + 0.5) / 1000000.0 AS mean_b,
               floor(t_raw * 1000000 + 0.5) / 1000000.0 AS t_stat,
               floor(df_raw * 1000000 + 0.5) / 1000000.0 AS df,
               abs(floor(t_raw * 1000000 + 0.5) / 1000000.0) > 1.96
                 AS significant
        FROM s
    """
    # mirrors _q_poisson_bootstrap (stages/stats.py poisson_bootstrap):
    # the identical md5-ladder Poisson(1) draw per (doc, replicate),
    # exact int (Σw, Σw·x) per (source, b), replicate means
    # micro-quantized BEFORE the order-stat CI / integer SE moments
    from docling_api_ray.stages.stats import BOOT_B, POIS1_THRESH

    _pois_w = " + ".join(
        f"CASE WHEN u >= {int(t)} THEN 1 ELSE 0 END" for t in POIS1_THRESH
    )
    out["poisson_bootstrap"] = f"""
        WITH reps AS (SELECT CAST(range AS BIGINT) AS b
                      FROM range({BOOT_B})),
             u AS (SELECT d.source, r.b,
                          CAST(d.n_chars AS BIGINT) AS x,
                          CAST({_sql_u64(
                              "CAST(d.doc_id AS VARCHAR) || ':' "
                              "|| CAST(r.b AS VARCHAR)")}
                               % 9007199254740992 AS BIGINT) AS u
                   FROM documents d CROSS JOIN reps r),
             ww AS (SELECT source, b, x,
                           CAST({_pois_w} AS BIGINT) AS wt
                    FROM u),
             rb AS (SELECT source, b,
                           CAST(sum(wt) AS BIGINT) AS sw,
                           CAST(sum(wt * x) AS BIGINT) AS swx
                    FROM ww GROUP BY 1, 2),
             mm AS (SELECT source, b,
                           CASE WHEN sw > 0
                                THEN CAST(floor(CAST(swx AS DOUBLE)
                                                / CAST(sw AS DOUBLE)
                                                * 1000000 + 0.5) AS BIGINT)
                                ELSE 0 END AS m
                    FROM rb),
             ranked AS (SELECT source, m,
                               row_number() OVER (PARTITION BY source
                                                  ORDER BY m, b) AS r
                        FROM mm),
             ci AS (SELECT source,
                           max(CASE WHEN r = 2 THEN m END) AS lo,
                           max(CASE WHEN r = {BOOT_B - 1} THEN m END) AS hi
                    FROM ranked GROUP BY 1),
             agg AS (SELECT source,
                            CAST(sum(m) AS HUGEINT) AS sm,
                            CAST(sum(m * m) AS HUGEINT) AS sm2,
                            CAST(count(*) AS BIGINT) AS nb
                     FROM mm GROUP BY 1),
             base AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                             CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT)
                               AS sx
                      FROM documents GROUP BY 1),
             se AS (SELECT source,
                           (CAST(sm2 AS DOUBLE)
                            - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
                              / CAST(nb AS DOUBLE))
                           / CAST(nb - 1 AS DOUBLE) AS var
                    FROM agg)
        SELECT base.source, base.n AS n_docs,
               CASE WHEN base.n > 0
                    THEN floor(CAST(base.sx AS DOUBLE)
                               / CAST(base.n AS DOUBLE) * 1000000 + 0.5)
                         / 1000000.0
                    ELSE 0.0 END AS mean,
               CAST(COALESCE(ci.lo, 0) AS DOUBLE) / 1000000.0 AS boot_lo,
               CAST(COALESCE(ci.hi, 0) AS DOUBLE) / 1000000.0 AS boot_hi,
               CASE WHEN se.var > 0.0
                    THEN floor(sqrt(se.var) / 1000000.0 * 1000000 + 0.5)
                         / 1000000.0
                    ELSE 0.0 END AS boot_se
        FROM base JOIN ci USING (source) JOIN se USING (source)
    """
    # moments, and the identical CAST-AS-DOUBLE pair division
    out["zipf_fit"] = f"""
        WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                   FROM documents),
             c AS (SELECT word, count(*) AS n FROM w
                   WHERE word <> '' GROUP BY 1),
             top AS (SELECT n,
                            row_number() OVER (ORDER BY n DESC, word ASC)
                              AS r
                     FROM c ORDER BY n DESC, word ASC LIMIT {_ZIPF_K}),
             pts AS (SELECT CAST(floor(ln(r) * 1000000000.0 + 0.5)
                                 AS HUGEINT) AS x,
                            CAST(floor(ln(n) * 1000000000.0 + 0.5)
                                 AS HUGEINT) AS y
                     FROM top),
             mo AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
                           sum(x * y) AS sxy, sum(x * x) AS sxx
                    FROM pts)
        SELECT CAST(k AS BIGINT) AS n_words,
               CAST(k * sxy - sx * sy AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE) AS slope
        FROM mo
    """
    return out
