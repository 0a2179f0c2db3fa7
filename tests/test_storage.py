import pyarrow as pa
import pytest
import ray.data

from docling_api_ray.sources.storage import (
    lance_available,
    read_table,
    write_table,
)


def test_parquet_roundtrip(tmp_path):
    ds = ray.data.from_arrow(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}))
    out = str(tmp_path / "t")
    write_table(ds, out, format="parquet")
    back = read_table(out, format="parquet", columns=["a"])
    assert sorted(r["a"] for r in back.take_all()) == [1, 2, 3]


def test_auto_resolves_without_lance(tmp_path):
    # in this sandbox lance is absent — auto must fall back to parquet
    ds = ray.data.from_arrow(pa.table({"a": [1]}))
    out = str(tmp_path / "t2")
    write_table(ds, out)  # must not raise
    assert read_table(out).count() == 1


@pytest.mark.skipif(not lance_available(), reason="lance not installed")
def test_lance_roundtrip(tmp_path):
    ds = ray.data.from_arrow(pa.table({"a": [1, 2]}))
    out = str(tmp_path / "t3.lance")
    write_table(ds, out, format="lance")
    assert read_table(out, format="lance").count() == 2


def test_jsonl_roundtrip(tmp_path):
    # the LLM-corpus interchange format: one JSON object per line
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["a b", "c", 'quote " and \\ slash'], pa.string()),
            }
        )
    )
    out = str(tmp_path / "corpus")
    write_table(ds, out, format="jsonl")
    back = read_table(out, format="jsonl")
    rows = sorted(back.take_all(), key=lambda r: r["doc_id"])
    assert [(r["doc_id"], r["text"]) for r in rows] == [
        (1, "a b"), (2, "c"), (3, 'quote " and \\ slash'),
    ]
    # files on disk are genuinely newline-delimited JSON
    import glob
    import json

    files = glob.glob(f"{out}/*.json")
    assert files
    lines = [json.loads(ln) for f in files for ln in open(f) if ln.strip()]
    assert sorted(r["doc_id"] for r in lines) == [1, 2, 3]
    # columns kwarg is tolerated (dropped) on the row-oriented path
    assert read_table(out, format="jsonl", columns=["text"]).count() == 3


def test_csv_roundtrip(tmp_path):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["plain", "with, comma"], pa.string()),
            }
        )
    )
    out = str(tmp_path / "csv")
    write_table(ds, out, format="csv")
    back = read_table(out, format="csv")
    rows = sorted(back.take_all(), key=lambda r: r["doc_id"])
    assert [(r["doc_id"], r["text"]) for r in rows] == [
        (1, "plain"), (2, "with, comma"),
    ]
