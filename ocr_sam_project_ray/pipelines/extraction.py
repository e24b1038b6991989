"""The flagship extraction pipeline (SURVEY.md §3.4 lifecycle)::

    (pre-pass) winner map from column-pruned (url, warc_ts)      [§2.6 dedup]
    read_parquet(pages)
      → map_batches(validate)                 stateless, Arrow   [M1,M7,M8]
      → map_batches(winner filter)            broadcast dedup    [§2.6]
      → map_batches(extract+segment+annotate) fused heavy stage  [M2-M15,M21,M24]
      [→ map_batches(project_persons)         stateless          [M16-M20]]

Fully streaming — with broadcast dedup (the default) there is NO payload
shuffle anywhere; parse overlaps read with backpressure. The ``html``
binary column is dropped inside the fused stage. Alternates via
PipelineConfig: shuffle dedup (any duplicate distribution), unfused
stages, actor pools for stateful kernels, size-bucket repartition.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import ray.data

from ..context import configure_data_context
from ..sources.synthetic import ensure_corpus
from ..stages.annotate import SpanAnnotator, annotate_batch
from ..stages.dedup import dedup_by_url
from ..stages.extract import MainContentExtractor, extract_batch
from ..stages.project import project_persons_batch
from ..stages.segment import segment_batch
from ..stages.validate import validate_batch


@dataclass
class PipelineConfig:
    """Per-stage execution knobs. Defaults target the 32-CPU single-node
    sandbox; on a multi-node cluster raise ``dedup_partitions`` to
    O(cluster CPUs) and let the actor pools autoscale."""

    dedup_partitions: int = 16
    # "broadcast": payload-free two-pass dedup (column-pruned winner pre-pass
    #              + broadcast filter; needs the input path) — the scale path
    # "bloom":     bounded-memory variant — Bloom of dup urls routes only
    #              possible duplicates through a shuffled exact resolve;
    #              for duplicate fractions too large to broadcast exactly
    # "shuffle":   full hash-shuffle dedup (any duplicate distribution)
    # "none":      skip dedup
    dedup_mode: str = "broadcast"
    # The html/span parser holds NO per-actor state beyond module-level
    # compiled regexes (imported once per worker process), so stateless
    # tasks are strictly better here: elastic, no pool sizing, no actor
    # spawn latency, and a fixed-size pool can starve the read stage.
    # use_actors=True remains for kernels that DO hold real per-actor state
    # (models, indexes) and is exercised by tests.
    use_actors: bool = False
    # fuse extract+segment+annotate into one actor pool (see stages/fused.py)
    fused: bool = True
    # html payloads are KB–MB; keep parse batches SMALL so (a) a batch of
    # worst-case docs fits a worker heap and (b) huge-page stragglers are
    # split finely enough for good load balance — measured on the sf0.1
    # corpus, 48 beat 128 by ~20% wall at 32 CPUs (SURVEY.md §4 skew row)
    parse_batch_size: int = 48
    annotate_batch_size: int = 512
    parse_concurrency: tuple = (1, 8)
    annotate_concurrency: tuple = (1, 8)
    # optional skew control: co-locate similar-sized docs before the parse
    # (one extra shuffle; off by default — Ray's dynamic block splitting +
    # small parse batches absorb the synthetic corpus's skew; flip on for
    # corpora with multi-MB tails)
    bucket_sort: bool = False
    # optional per-error-class retry/backoff around the fused parse kernel
    # (ops/retry.py; parity: ocr_service.py:448-502). None = off (the local
    # parse is deterministic); set for flaky/remote kernels. Task path only.
    retry_policy: object = None


def read_pages(sf_dir: str, columns: Optional[list[str]] = None) -> ray.data.Dataset:
    """Read (and lazily generate) the page corpus for a scale tier.
    Pass ``columns`` to prune at the read (e.g. no ``html`` for
    metadata-only pipelines)."""
    configure_data_context()
    paths = ensure_corpus(sf_dir)
    return ray.data.read_parquet(paths["pages"], columns=columns)


def build_extraction(
    ds: ray.data.Dataset,
    cfg: Optional[PipelineConfig] = None,
    pages_path=None,
) -> ray.data.Dataset:
    """pages Dataset → annotated sub-document Dataset (lazy).

    ``pages_path`` (a path or list of files) enables the payload-free
    broadcast dedup; without it the shuffle dedup is used."""
    cfg = cfg or PipelineConfig()
    configure_data_context()
    ds = ds.map_batches(validate_batch, batch_format="pyarrow")
    if cfg.dedup_mode == "broadcast" and pages_path is not None:
        import ray as _ray

        from ..stages.dedup import compute_dup_winners, make_winner_filter

        winners_ref = _ray.put(
            compute_dup_winners(pages_path, num_partitions=min(8, cfg.dedup_partitions))
        )
        ds = ds.map_batches(make_winner_filter(winners_ref), batch_format="pyarrow")
    elif cfg.dedup_mode == "bloom" and pages_path is not None:
        from ..stages.dedup import dedup_by_url_bloom

        ds = dedup_by_url_bloom(ds, pages_path, num_partitions=cfg.dedup_partitions)
    elif cfg.dedup_mode in ("shuffle", "broadcast", "bloom"):
        ds = dedup_by_url(ds, num_partitions=cfg.dedup_partitions)
    if cfg.bucket_sort:
        ds = ds.repartition(cfg.dedup_partitions, keys=["size_bucket"])
    if cfg.fused:
        from ..stages.fused import ExtractSegmentAnnotate, extract_segment_annotate_batch

        if cfg.use_actors:
            return ds.map_batches(
                ExtractSegmentAnnotate,
                batch_format="pyarrow",
                batch_size=cfg.parse_batch_size,
                concurrency=cfg.parse_concurrency,
                num_cpus=1,
            )
        kernel = extract_segment_annotate_batch
        if cfg.retry_policy is not None:
            from ..ops.retry import with_retries

            kernel = with_retries(kernel, cfg.retry_policy)
        return ds.map_batches(
            kernel,
            batch_format="pyarrow",
            batch_size=cfg.parse_batch_size,
        )
    if cfg.use_actors:
        ds = ds.map_batches(
            MainContentExtractor,
            batch_format="pyarrow",
            batch_size=cfg.parse_batch_size,
            concurrency=cfg.parse_concurrency,
            num_cpus=1,
        )
    else:
        ds = ds.map_batches(
            extract_batch, batch_format="pyarrow", batch_size=cfg.parse_batch_size
        )
    ds = ds.map_batches(segment_batch, batch_format="pyarrow")
    if cfg.use_actors:
        ds = ds.map_batches(
            SpanAnnotator,
            batch_format="pyarrow",
            batch_size=cfg.annotate_batch_size,
            concurrency=cfg.annotate_concurrency,
            num_cpus=1,
        )
    else:
        ds = ds.map_batches(
            annotate_batch, batch_format="pyarrow", batch_size=cfg.annotate_batch_size
        )
    return ds


def run_extraction(
    sf_dir: str, cfg: Optional[PipelineConfig] = None
) -> ray.data.Dataset:
    paths = ensure_corpus(sf_dir)
    return build_extraction(read_pages(sf_dir), cfg, pages_path=paths["pages"])


def project_persons(
    annotated: ray.data.Dataset, name_flavor: str = "a"
) -> ray.data.Dataset:
    """Annotated segments → flat per-person projection (CRM-payload analog).
    ``name_flavor`` selects the name-split convention: "a" =
    ocr_processor/app.py:499-503, "b" = crm_integrator/app.py:377-394."""
    import functools

    return annotated.map_batches(
        functools.partial(project_persons_batch, name_flavor=name_flavor),
        batch_format="pyarrow",
    )


def batch_rollup(annotated: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """Batch-accounting rollup (tracking_service.py:93-152 semantics):
    per url — total jobs (segments), completed/error counts, derived batch
    status. Pre-aggregated per batch inside map_batches, then a small
    groupby-sum (partial+final aggregation; SURVEY.md §2.5)."""
    import pyarrow as pa

    def partials(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.cast(batch["success"], pa.int64())
        t = pa.table(
            {
                "url": batch["url"],
                "completed": ok,
                "errors": pc.subtract(1, ok),
            }
        )
        agg = t.group_by("url").aggregate(
            [([], "count_all"), ("completed", "sum"), ("errors", "sum")]
        )
        return agg.rename_columns(["url", "jobs", "completed", "errors"])

    from ray.data.aggregate import Sum

    rolled = (
        annotated.map_batches(partials, batch_format="pyarrow")
        # explicit partition count: the hash-shuffle default allocates one
        # aggregator per default-partition and over-subscribes small nodes
        .groupby("url", num_partitions=num_partitions)
        .aggregate(
            Sum("jobs", alias_name="total_jobs"),
            Sum("completed", alias_name="completed_count"),
            Sum("errors", alias_name="error_count"),
        )
    )

    def status(batch: pa.Table) -> pa.Table:
        total = batch["total_jobs"].to_pylist()
        done = batch["completed_count"].to_pylist()
        err = batch["error_count"].to_pylist()
        st = []
        for t, d, e in zip(total, done, err):
            if e == 0 and d == t:
                st.append("completed")
            elif d > 0:
                st.append("partial_completion")
            else:
                st.append("failed")
        return batch.append_column("batch_status", pa.array(st, type=pa.string()))

    return rolled.map_batches(status, batch_format="pyarrow")
