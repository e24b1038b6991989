"""CLI entry point — the ``ray job submit`` surface.

    ray job submit -- python -m ocr_sam_project_ray.cli run \
        --sf-dir /root/testdata/sf0.1 --out /tmp/extract_out

    python -m ocr_sam_project_ray.cli resume --sf-dir ... --out ...   # checkpointed

Owns the Ray session (guarded init; library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def cmd_run(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.extraction import PipelineConfig, run_extraction
    from .pipelines.metrics import stage_metrics

    cfg = PipelineConfig(dedup_partitions=args.partitions)
    t0 = time.time()
    ds = run_extraction(args.sf_dir, cfg)
    ds.write_parquet(args.out)
    wall = time.time() - t0
    summary = {
        "out": args.out,
        "wall_time_s": round(wall, 2),
        "stats": stage_metrics(ds),
    }
    print(json.dumps(summary))
    return 0


def cmd_resume(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.checkpoint import run_checkpointed
    from .pipelines.extraction import PipelineConfig
    from .sources.synthetic import ensure_corpus

    paths = ensure_corpus(args.sf_dir)
    files = sorted(glob.glob(os.path.join(paths["pages"], "*.parquet")))
    metrics = run_checkpointed(
        files, args.out, PipelineConfig(dedup_partitions=args.partitions),
        n_shards=args.shards,
    )
    print(json.dumps(metrics))
    return 0


def cmd_split(args) -> int:
    """Binary document split: PDF payloads → standalone per-oficio PDFs
    written as partitioned parquet (url, part_id, part_index, n_parts,
    n_pages, payload) — the document_processor-stage analog."""
    _init_ray(args.num_cpus)
    from .pipelines.extraction import read_pages
    from .stages.pdf_split import split_pdf_documents

    t0 = time.time()
    pages = read_pages(args.sf_dir, columns=["url", "html"])
    parts = split_pdf_documents(pages)
    parts.write_parquet(args.out)
    import pyarrow.dataset as pads

    n = pads.dataset(args.out, format="parquet").count_rows()
    print(json.dumps({"out": args.out, "n_parts": n,
                      "wall_time_s": round(time.time() - t0, 2)}))
    return 0


def cmd_curate(args) -> int:
    """Training-corpus curation chain over a documents table: quality
    filter → exact dedup → near-dup cluster dedup → optional benchmark
    decontamination → partitioned parquet + per-stage row accounting."""
    _init_ray(args.num_cpus)
    import ray.data

    from .context import configure_data_context
    from .pipelines.curate import curate_corpus

    configure_data_context()  # BEFORE read_parquet: the Dataset captures it
    bench = None
    if args.bench_file:
        with open(args.bench_file) as f:
            bench = [ln.rstrip("\n") for ln in f if ln.strip()]
    t0 = time.time()
    ds = ray.data.read_parquet(
        os.path.join(args.sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    metrics = curate_corpus(
        ds, args.out, bench_texts=bench,
        near_threshold=args.near_threshold,
        num_partitions=args.partitions,
        line_dedup=args.line_dedup,
        repair_encoding=args.repair_encoding,
        assign_split=args.assign_split,
    )
    metrics["wall_time_s"] = round(time.time() - t0, 2)
    print(json.dumps(metrics))
    return 0


def _parquet_footer_ok(path: str) -> bool:
    """True when the file ends with the parquet footer magic ``PAR1``.
    Parquet writers emit the footer only at close, so its presence is
    the decisive this-file-is-complete signal for watch mode (stat
    stability alone cannot distinguish a finished copy from a stalled
    one)."""
    try:
        with open(path, "rb") as fh:
            fh.seek(0, os.SEEK_END)
            if fh.tell() < 12:  # magic + footer-length + magic
                return False
            fh.seek(-4, os.SEEK_END)
            return fh.read(4) == b"PAR1"
    except OSError:
        return False


def cmd_ingest(args) -> int:
    """Incremental fragment ingest (the S3-event trigger analog): process
    only parquet fragments without a completed lineage record under
    --out; re-runs after appending fragments touch only the new ones.

    ``--watch`` (round 5) closes the operational-parity gap with the
    reference's push trigger (one invocation per new S3 object,
    src/document_processor/app.py:63-84) by polling ``--glob`` every
    ``--interval`` seconds and ingesting the moment NEW fragment files
    appear; each pickup resets the ``--idle-budget`` clock, and the loop
    exits once that budget passes with nothing new (so tests and batch
    jobs terminate). A new file is only ingested after its (size, mtime)
    is STABLE across two consecutive polls AND its parquet footer magic
    is present — a non-atomic copy landing in the watched dir must not
    be read mid-write, and stat stability alone cannot tell a finished
    copy from a STALLED one (parquet writers only emit the ``PAR1``
    footer at close, so the footer is the decisive completion signal).
    Files still footerless at exit are reported in the summary under
    ``watch_pending_incomplete``. The final poll happens after the idle
    deadline, so a file arriving during the last sleep is still picked
    up. The trigger is object CREATION, like S3 events; an in-place
    REWRITE of an already-ingested path does not trigger a round, but a
    COMPLETED rewrite (footer present) rides along with the next
    triggered round, where the lineage staleness check (size/mtime
    recorded per ingest) reprocesses it — a rewrite still in flight is
    excluded from the batch, and a rewrite finishing after the last
    round is picked up by the next non-watch run."""
    _init_ray(args.num_cpus)
    from .pipelines.checkpoint import ingest_incremental
    from .pipelines.extraction import PipelineConfig

    cfg = PipelineConfig(dedup_partitions=args.partitions)

    def matched() -> list[str]:
        files = sorted(glob.glob(args.glob)) if args.glob else []
        if args.files:
            files += args.files
        return files

    if not getattr(args, "watch", False):
        files = matched()
        if not files:
            print(json.dumps({"error": "no input fragments matched"}))
            return 2
        metrics = ingest_incremental(
            files, args.out, cfg,
            dedup_against_prior=not args.no_prior_dedup,
        )
        print(json.dumps(metrics))
        return 0

    if not args.glob:
        print(json.dumps({"error": "--watch requires --glob"}))
        return 2
    seen: set[str] = set()
    pending: dict[str, tuple[int, int]] = {}
    rounds = 0
    processed_total = 0
    last_metrics: dict = {}
    idle_deadline = time.time() + args.idle_budget
    while True:
        files = matched()
        ready: list[str] = []
        activity = False
        for f in files:
            if f in seen:
                continue
            try:
                st = os.stat(f)
            except OSError:
                pending.pop(f, None)
                continue
            sig = (st.st_size, st.st_mtime_ns)
            if pending.get(f) != sig:
                # first sighting, or size/mtime still moving (non-atomic
                # copy in flight) — hold off one more poll
                activity = True
                pending[f] = sig
            elif _parquet_footer_ok(f):
                # stat stable AND footer present: the writer closed it
                ready.append(f)
            # else: stat stable but footerless — a STALLED mid-copy;
            # keep waiting without resetting the idle budget (a file
            # that never completes must not hold the loop open forever)
        if ready:
            ready_set = set(ready)
            # already-seen files ride along so the lineage skip (or the
            # size/mtime staleness REPROCESS, for a completed in-place
            # rewrite) applies — but only when their footer is present:
            # a seen path mid-rewrite is excluded from the batch, or the
            # staleness check would read it half-written
            batch = [
                f for f in files
                if f in ready_set
                or (f in seen and _parquet_footer_ok(f))
            ]
            last_metrics = ingest_incremental(
                batch, args.out, cfg,
                dedup_against_prior=not args.no_prior_dedup,
            )
            seen.update(ready)
            for f in ready:
                pending.pop(f, None)
            rounds += 1
            processed_total += last_metrics["fragments_processed"]
            idle_deadline = time.time() + args.idle_budget
        elif activity:
            # a file is mid-write: keep the loop open until it settles
            idle_deadline = max(idle_deadline,
                                time.time() + args.idle_budget)
        # deadline checked AFTER the poll so a fragment landing during
        # the final sleep still gets seen (and, next poll, ingested)
        if not ready and not activity and time.time() >= idle_deadline:
            break
        time.sleep(args.interval)
    summary = dict(last_metrics)
    summary.update(
        {"watch_rounds": rounds, "watch_fragments_processed": processed_total}
    )
    if pending:
        # matched but never completed (footerless / still moving at
        # exit) — surfaced so a truncated producer is never silent
        summary["watch_pending_incomplete"] = sorted(pending)
    print(json.dumps(summary))
    return 0


def cmd_status(args) -> int:
    """Read-side status query (no Ray session needed — lineage + parquet)."""
    from .pipelines.status import run_status, shard_status, url_status

    if args.shard:
        print(json.dumps(shard_status(args.out, args.shard)))
    elif args.url:
        print(json.dumps(url_status(args.out, args.url)))
    else:
        print(json.dumps(run_status(args.out)))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ocr_sam_project_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("status")
    sp.add_argument("--out", required=True)
    sp.add_argument("--shard", default=None)
    sp.add_argument("--url", default=None)
    sp.set_defaults(fn=cmd_status, num_cpus=None)
    sp = sub.add_parser("ingest")
    sp.add_argument("--glob", default=None,
                    help="glob of input fragment parquet files")
    sp.add_argument("--files", nargs="*", default=None,
                    help="explicit fragment files (appended to --glob)")
    sp.add_argument("--out", required=True)
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.add_argument("--partitions", type=int, default=16)
    sp.add_argument("--no-prior-dedup", action="store_true",
                    help="skip the cross-fragment url snapshot dedup")
    sp.add_argument("--watch", action="store_true",
                    help="poll --glob and ingest new fragments as they "
                         "appear (push-trigger loop)")
    sp.add_argument("--interval", type=float, default=2.0,
                    help="watch poll period, seconds")
    sp.add_argument("--idle-budget", type=float, default=30.0,
                    dest="idle_budget",
                    help="exit watch after this many seconds without a "
                         "new fragment")
    sp.set_defaults(fn=cmd_ingest)
    for name, fn in [("run", cmd_run), ("resume", cmd_resume),
                     ("split", cmd_split), ("curate", cmd_curate)]:
        sp = sub.add_parser(name)
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        sp.add_argument("--out", required=True)
        sp.add_argument("--num-cpus", type=int, default=None)
        sp.add_argument("--partitions", type=int, default=16)
        if name == "resume":
            sp.add_argument("--shards", type=int, default=8)
        if name == "curate":
            sp.add_argument("--bench-file", default=None)
            sp.add_argument("--near-threshold", type=float, default=0.7)
            sp.add_argument("--line-dedup", action="store_true",
                            help="add the C4 corpus-global line strip")
            sp.add_argument("--repair-encoding", action="store_true",
                            help="prepend ftfy-style mojibake chain repair")
            sp.add_argument("--assign-split", action="store_true",
                            help="append train/val/test columns and "
                                 "partition the output by split")
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
