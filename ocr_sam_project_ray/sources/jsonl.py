"""JSONL (newline-delimited JSON) source + sink — the interchange format
web-crawl and annotation pipelines speak when parquet isn't available
(one JSON object per line; the Common-Crawl-derivative and
labeling-vendor convention).

Reader: ``ray.data.read_json`` streams line-delimited files block-by-
block (Arrow JSON parser per file fragment — vectorized, zero Python
per row); pass ``columns_select`` to prune straight after parse (JSON
is row-major, so unlike parquet the bytes are read regardless — prune
to cut object-store traffic, and prefer parquet for hot tables).

Writer: ``Dataset.write_json`` emits one shard per block (resumable
partitioned output, never one giant file — the engine's S5/S6 sink
convention, pipelines/checkpoint.py).

Round-trip caveat documented for 100 TB honesty: JSON has no int64/
float distinction for whole numbers and no native timestamp — columns
round-trip as (str|int|float|bool|null|list|dict); binary columns are
NOT representable (multimodal payload tables must stay parquet).
"""

from __future__ import annotations

from typing import Optional, Sequence

import ray.data
from ray.data import Dataset

from ..context import configure_data_context


def read_jsonl(
    paths, columns_select: Optional[Sequence[str]] = None, **kwargs
) -> Dataset:
    """Stream one-object-per-line JSON files into a Dataset; optional
    column prune immediately after parse."""
    configure_data_context()
    ds = ray.data.read_json(paths, **kwargs)
    if columns_select:
        ds = ds.select_columns(list(columns_select))
    return ds


def write_jsonl(ds: Dataset, out_dir: str, **kwargs) -> None:
    """Partitioned JSONL sink: one file per block under ``out_dir``."""
    ds.write_json(out_dir, **kwargs)
