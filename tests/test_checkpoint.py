"""Kill/resume invariant: a failed run resumes from the manifest and
converges to the same output as an uninterrupted run."""

import shutil

import pytest

from docling_api_ray.config import PipelineConfig
from docling_api_ray.pipelines.checkpoint import (
    completed_partitions,
    plan_partitions,
    read_output,
    run_resumable,
)
from docling_api_ray.pipelines.convert import flagship
from docling_api_ray.pipelines.metrics import conversion_metrics

SF_DIR = "/root/testdata/sf0.001"
CFG = PipelineConfig(extract_tables_as_images=True)


def test_plan_partitions_covers_input():
    parts = plan_partitions(SF_DIR + "/documents.parquet", 8)
    assert len(parts) == 8
    assert parts[0].lo == 0 and parts[-1].hi == 500
    for a, b in zip(parts, parts[1:]):
        assert a.hi == b.lo


def test_kill_resume_converges(tmp_path):
    out = str(tmp_path / "ckpt")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(SF_DIR, out, CFG, npartitions=4, fail_after=2)
    assert completed_partitions(out) == {0, 1}

    committed = run_resumable(SF_DIR, out, CFG, npartitions=4)
    assert {r["partition_id"] for r in committed} == {2, 3}

    # resumed output == single uninterrupted run
    resumed = read_output(out).to_pylist()
    full = flagship(SF_DIR, CFG).take_all()
    key = lambda r: r["doc_id"]
    resumed.sort(key=key)
    full.sort(key=key)
    assert [r["doc_id"] for r in resumed] == [r["doc_id"] for r in full]
    for a, b in zip(resumed, full):
        assert a["spans"] == b["spans"] and a["markdown"] == b["markdown"]
        assert a["error"] == b["error"]

    # idempotent: nothing left to do
    assert run_resumable(SF_DIR, out, CFG, npartitions=4) == []


def test_manifest_metrics(tmp_path):
    out = str(tmp_path / "ckpt2")
    recs = run_resumable(SF_DIR, out, CFG, npartitions=2)
    assert sum(r["row_count"] for r in recs) == 500
    assert all(r["status"] == "done" for r in recs)
    assert sum(r["error_count"] for r in recs) == 105  # 99 unsupported + 6 poison
    assert all("doc_id" in r["input_ref"] for r in recs)


def test_conversion_metrics_groupby():
    out = conversion_metrics(flagship(SF_DIR, CFG)).take_all()
    byfmt = {r["format"]: r for r in out}
    assert byfmt[""]["n_errors"] == byfmt[""]["n_docs"] == 99
    assert byfmt["pdf"]["n_errors"] == 6  # poison docs override to pdf
    total = sum(r["n_docs"] for r in out)
    assert total == 500
    assert byfmt["docx"]["total_spans"] > 0 and byfmt["docx"]["n_errors"] == 0


def test_plan_mismatch_refused(tmp_path):
    out = str(tmp_path / "ckpt3")
    run_resumable(SF_DIR, out, CFG, npartitions=4)
    with pytest.raises(ValueError, match="plan mismatch"):
        run_resumable(SF_DIR, out, CFG, npartitions=8)


def test_planless_manifests_refused(tmp_path):
    import os

    out = str(tmp_path / "ckpt4")
    run_resumable(SF_DIR, out, CFG, npartitions=2)
    os.remove(os.path.join(out, "_manifest", "plan.json"))  # pre-guard layout
    with pytest.raises(ValueError, match="cannot be validated"):
        run_resumable(SF_DIR, out, CFG, npartitions=2)
