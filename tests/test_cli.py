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


def test_cli_split(tmp_path):
    out_dir = str(tmp_path / "split_out")
    res = _run(["split", "--sf-dir", SF, "--out", out_dir,
                "--num-cpus", "2", "--partitions", "2"])
    assert res["out"] == out_dir
    assert res["n_parts"] > 0
    files = glob.glob(os.path.join(out_dir, "*.parquet"))
    assert files
    # every part is a standalone valid PDF the extractor accepts
    import pyarrow.parquet as pq

    from ocr_sam_project_ray.functions.pdf_text import extract_pdf_like_text

    t = pq.read_table(files[0], columns=["part_id", "payload"])
    assert len(t) > 0
    for p in t["payload"].to_pylist()[:10]:
        assert p.startswith(b"%PDF-") and p.rstrip().endswith(b"%%EOF")
        assert extract_pdf_like_text(p)
