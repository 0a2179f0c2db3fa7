"""CLI driver (ray-job-submit analog) through a real subprocess."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "docling_api_ray.cli", *args],
        capture_output=True,
        text=True,
        timeout=240,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_run_and_resume(tmp_path):
    outdir = str(tmp_path / "out")
    first = _run(
        [
            "--input", "/root/testdata/sf0.001", "--output", outdir,
            "--partitions", "3", "--num-cpus", "4",
        ]
    )
    assert first["committed_partitions"] == [0, 1, 2]
    assert first["rows"] == 500 and first["errors"] == 105
    # resume is a no-op
    second = _run(
        [
            "--input", "/root/testdata/sf0.001", "--output", outdir,
            "--partitions", "3", "--num-cpus", "4",
        ]
    )
    assert second["committed_partitions"] == [] and second["rows"] == 0
