"""Storage abstraction: Lance when available, Parquet otherwise.

BASELINE.json's input_hint mandates Lance tables of interleaved
documents; Ray 2.49 ships ``read_lance``/``write_lance`` but they
require the ``lance`` package, which is not installed in this sandbox
(and may be absent on minimal clusters).  Installing it was attempted
and is infeasible here: the container has no network (``pip install
pylance`` fails DNS resolution; no local wheel exists) — see
BASELINE.md "Lance availability" for the audited evidence.  All engine
sources/sinks go
through this module so the storage format is a deployment decision, not
a code change: ``format="auto"`` uses Lance iff importable.

Both paths stream block-wise; neither materializes the dataset.
"""

from __future__ import annotations

import ray.data


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def _resolve(format: str) -> str:
    if format == "auto":
        return "lance" if lance_available() else "parquet"
    return format


def read_table(uri: str, *, format: str = "auto", **kwargs) -> ray.data.Dataset:
    """Read a documents/results table; columns= pushdown supported by the
    lance/parquet backends.  ``format="jsonl"`` reads newline-delimited
    JSON — the interchange format LLM text corpora actually ship in
    (one document object per line); Ray's ``read_json`` streams it
    block-wise like the columnar readers (no column pruning at the read
    — convert to parquet for repeated analytical passes)."""
    fmt = _resolve(format)
    if fmt == "lance":
        return ray.data.read_lance(uri, **kwargs)
    if fmt == "jsonl":
        kwargs.pop("columns", None)  # row-oriented source: no pushdown
        return ray.data.read_json(uri, **kwargs)
    if fmt == "csv":
        kwargs.pop("columns", None)  # row-oriented source: no pushdown
        return ray.data.read_csv(uri, **kwargs)
    return ray.data.read_parquet(uri, **kwargs)


def write_table(ds: ray.data.Dataset, uri: str, *, format: str = "auto", **kwargs):
    fmt = _resolve(format)
    if fmt == "lance":
        return ds.write_lance(uri, **kwargs)
    if fmt == "jsonl":
        return ds.write_json(uri, **kwargs)
    if fmt == "csv":
        return ds.write_csv(uri, **kwargs)
    return ds.write_parquet(uri, **kwargs)
