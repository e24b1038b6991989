"""The flagship extraction pipeline (SURVEY.md §3.4 lifecycle)::

    read_parquet(pages)
      → map_batches(validate)                 stateless tasks   [M1,M7,M8]
      → dedup_by_url                          hash shuffle      [§2.6]
      → map_batches(MainContentExtractor)     actor pool        [M9,M10]
      → map_batches(segment)                  flat map          [M2-M8]
      → map_batches(SpanAnnotator)            actor pool        [M11-M14,M21,M24]
      [→ map_batches(project_persons)         stateless         [M15-M20]]

Everything is lazy/streaming; the only wide operation is the url-dedup hash
repartition. The ``html`` binary column is dropped at the extract stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field
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
    dedup: bool = True
    use_actors: bool = True
    # html payloads are KB–MB; keep parse batches modest so a batch of
    # worst-case docs fits a worker heap (SURVEY.md §4 memory row)
    parse_batch_size: int = 128
    annotate_batch_size: int = 512
    parse_concurrency: tuple = (1, 8)
    annotate_concurrency: tuple = (1, 8)
    # optional skew control: co-locate similar-sized docs before the parse
    # (one extra shuffle; off by default — Ray's dynamic block splitting +
    # small parse batches absorb the synthetic corpus's skew; flip on for
    # corpora with multi-MB tails)
    bucket_sort: bool = False


def read_pages(sf_dir: str, columns: Optional[list[str]] = None) -> ray.data.Dataset:
    """Read (and lazily generate) the page corpus for a scale tier.
    Pass ``columns`` to prune at the read (e.g. no ``html`` for
    metadata-only pipelines)."""
    configure_data_context()
    paths = ensure_corpus(sf_dir)
    return ray.data.read_parquet(paths["pages"], columns=columns)


def build_extraction(
    ds: ray.data.Dataset, cfg: Optional[PipelineConfig] = None
) -> ray.data.Dataset:
    """pages Dataset → annotated sub-document Dataset (lazy)."""
    cfg = cfg or PipelineConfig()
    configure_data_context()
    ds = ds.map_batches(validate_batch, batch_format="pyarrow")
    if cfg.dedup:
        ds = dedup_by_url(ds, num_partitions=cfg.dedup_partitions)
    if cfg.bucket_sort:
        ds = ds.repartition(cfg.dedup_partitions, keys=["size_bucket"])
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
    return build_extraction(read_pages(sf_dir), cfg)


def project_persons(annotated: ray.data.Dataset) -> ray.data.Dataset:
    """Annotated segments → flat per-person projection (CRM-payload analog)."""
    return annotated.map_batches(project_persons_batch, batch_format="pyarrow")


def batch_rollup(annotated: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """Batch-accounting rollup (tracking_service.py:93-152 semantics):
    per url — total jobs (segments), completed/error counts, derived batch
    status. Pre-aggregated per batch inside map_batches, then a small
    groupby-sum (partial+final aggregation; SURVEY.md §2.5)."""
    import pyarrow as pa

    def partials(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "url": batch["url"].to_pylist(),
                "jobs": 1,
                "completed": [1 if s else 0 for s in batch["success"].to_pylist()],
                "errors": [0 if s else 1 for s in batch["success"].to_pylist()],
            }
        )
        agg = df.groupby("url", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

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
