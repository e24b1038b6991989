"""Read-side status / query API over a checkpointed run's output directory.

Reference parity: the status Lambdas — per-job query
(src/status/app.py:20-60 via tracking_service.get_job_status), per-batch
query (src/batch_status/app.py:21-60 via batch_service.get_batch_status),
and the DERIVED batch progress rules of tracking_service.py:93-152
(completed / partial_completion / processing / queued with the same
status_message strings' shape).

Engine mapping: "job" = one shard of a checkpointed run; "batch" = one url
(its segments are the jobs). State is ONLY what the run wrote — lineage
sidecars and shard parquet — never a shared mutable store, so the API can
be served from any node (or long after the run) by pointing it at the
output directory. Reads are metadata-light: lineage JSONs are tiny, and
the per-url query scans shard parquet with a column projection + url
filter (parquet predicate pushdown), never full payloads.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional

from .checkpoint import completed_shards


def shard_status(out_dir: str, shard_id: str) -> dict:
    """Per-shard ("job") status. States: completed (lineage present),
    processing (shard dir exists without completed lineage — mid-write or
    torn), not_found."""
    done = completed_shards(out_dir)
    if shard_id in done:
        rec = dict(done[shard_id])
        rec["status"] = "completed"
        return rec
    if os.path.isdir(os.path.join(out_dir, f"shard={shard_id}")):
        return {"shard_id": shard_id, "status": "processing"}
    return {"shard_id": shard_id, "status": "not_found"}


def run_status(out_dir: str) -> dict:
    """Aggregate run ("batch of shards") status with the reference's
    derived-progress rules (tracking_service.py:111-125): completed when
    every planned shard completed; partial_completion when some shards are
    mid-flight/torn; queued when nothing has landed yet."""
    done = completed_shards(out_dir)
    # the shard plan size is recorded in every lineage record (round-2
    # resume-safety field); fall back to what exists on disk
    n_planned: Optional[int] = None
    for rec in done.values():
        if rec.get("n_shards") is not None:
            n_planned = max(n_planned or 0, int(rec["n_shards"]))
    shard_dirs = glob.glob(os.path.join(out_dir, "shard=*"))
    # strip the 'shard=' prefix so dir names union with lineage ids by id,
    # not by two spellings of the same shard (would double-count completed
    # shards and fire partial_completion while shards are still unstarted)
    dir_ids = {os.path.basename(d).split("=", 1)[1] for d in shard_dirs}
    n_seen = len(dir_ids | set(done))
    total = n_planned if n_planned is not None else n_seen

    completed = len(done)
    rows = sum(r.get("row_count", 0) for r in done.values())
    ok = sum(r.get("success_count", 0) for r in done.values())
    if total and completed == total:
        status = "completed"
        message = f"All {total} shards completed successfully"
    elif completed > 0:
        status = "partial_completion" if n_seen >= (total or 0) else "processing"
        message = f"{completed}/{total or '?'} shards completed"
    elif n_seen > 0:
        status = "processing"
        message = f"0/{total or '?'} shards completed, {n_seen} in flight"
    else:
        status = "queued"
        message = "no shards started"
    return {
        "out_dir": out_dir,
        "status": status,
        "status_message": message,
        "shards_planned": total,
        "shards_completed": completed,
        "row_count": rows,
        "success_count": ok,
        "error_count": rows - ok,
    }


def url_status(out_dir: str, url: str) -> dict:
    """Per-url ("batch") status from the WRITTEN output: total jobs
    (segments), completed/error counts, derived batch_status — the
    batch_status/app.py query, recomputed from durable shard parquet via a
    projected, predicate-pushdown scan (columns: url, success only)."""
    import pyarrow.dataset as pads
    from pyarrow import compute as pc

    files = sorted(glob.glob(os.path.join(out_dir, "shard=*", "*.parquet")))
    if not files:
        return {"url": url, "status": "not_found"}
    dset = pads.dataset(files, format="parquet")
    t = dset.to_table(columns=["url", "success"],
                      filter=pc.field("url") == url)
    total = t.num_rows
    if total == 0:
        return {"url": url, "status": "not_found"}
    ok = int(pc.sum(pc.cast(t["success"], "int64")).as_py() or 0)
    err = total - ok
    if err == 0:
        status, message = "completed", f"All {total} oficios completed successfully"
    elif ok > 0:
        status, message = "partial_completion", f"{ok} completed, {err} failed"
    else:
        status, message = "failed", f"0 completed, {err} failed"
    return {
        "url": url,
        "status": status,
        "status_message": message,
        "total_jobs": total,
        "completed_count": ok,
        "error_count": err,
    }


def main(argv=None) -> int:  # pragma: no cover - thin CLI shim
    import argparse

    p = argparse.ArgumentParser(prog="ocr_sam_project_ray.status")
    p.add_argument("out_dir")
    p.add_argument("--shard")
    p.add_argument("--url")
    args = p.parse_args(argv)
    if args.shard:
        print(json.dumps(shard_status(args.out_dir, args.shard)))
    elif args.url:
        print(json.dumps(url_status(args.out_dir, args.url)))
    else:
        print(json.dumps(run_status(args.out_dir)))
    return 0
