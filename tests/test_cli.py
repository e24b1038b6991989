"""CLI (ray-job-submit surface) driven end-to-end in subprocesses — the CLI
owns its own Ray session, so it must not run under the shared fixture."""

import glob
import json
import os
import subprocess
import sys

SF = "/root/testdata/sf0.001"


def _run(args):
    out = subprocess.run(
        [sys.executable, "-m", "ocr_sam_project_ray.cli", *args],
        capture_output=True, text=True, check=True, cwd="/root/repo",
        timeout=300,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def test_cli_run(tmp_path):
    out_dir = str(tmp_path / "run_out")
    res = _run(["run", "--sf-dir", SF, "--out", out_dir,
                "--num-cpus", "2", "--partitions", "2"])
    assert res["out"] == out_dir
    assert res["wall_time_s"] > 0
    assert glob.glob(os.path.join(out_dir, "*.parquet"))


def test_cli_resume(tmp_path):
    out_dir = str(tmp_path / "resume_out")
    res = _run(["resume", "--sf-dir", SF, "--out", out_dir,
                "--num-cpus", "2", "--partitions", "2", "--shards", "2"])
    assert res["shards_completed"] == 2
    assert res["row_count"] > 0
    assert os.path.exists(os.path.join(out_dir, "metrics.json"))
    # second invocation resumes: all shards skipped, same metrics
    res2 = _run(["resume", "--sf-dir", SF, "--out", out_dir,
                 "--num-cpus", "2", "--partitions", "2", "--shards", "2"])
    assert res2["row_count"] == res["row_count"]
