"""Exact url dedup — the pipeline's first wide operation (hash shuffle).

North-rule requirement (no reference analog — the reference mints unique ids
at src/services/pdf_service.py:196): keep exactly one row per ``url``,
deterministically the one with the LATEST ``warc_ts`` (ties broken by
descending byte-length then first occurrence, all deterministic).

Scale design (SURVEY.md §2.6/§4):
  1. ``dedup_batch_local`` first drops intra-batch losers inside a normal
     ``map_batches`` — a free combiner that shrinks the shuffle input when
     crawl data arrives clustered by url/host.
  2. ``Dataset.repartition(num_blocks=P, keys=["url"])`` hash-partitions so
     all rows of a url land in one block — ONE all-to-all exchange.
  3. A vectorized per-block ``map_batches`` (``batch_size=None`` → whole
     block) sorts by (url asc, warc_ts desc, doc_bytes desc) and keeps the
     first row of each url run. No per-group Python, no driver materialize.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _keep_first_per_url(batch: pa.Table) -> pa.Table:
    if len(batch) <= 1:
        return batch
    sort_keys = [("url", "ascending"), ("warc_ts", "descending")]
    if "doc_bytes" in batch.column_names:
        sort_keys.append(("doc_bytes", "descending"))
    indices = pc.sort_indices(batch, sort_keys=sort_keys)
    batch = batch.take(indices)
    urls = batch["url"].combine_chunks()
    first = np.empty(len(batch), dtype=bool)
    first[0] = True
    neq = pc.not_equal(urls.slice(1), urls.slice(0, len(batch) - 1))
    first[1:] = neq.to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(first))


def dedup_batch_local(batch: pa.Table) -> pa.Table:
    """Combiner: drop duplicate urls within one batch (keeps global winner
    only if co-located; the global pass below finishes the job)."""
    return _keep_first_per_url(batch)


def dedup_by_url(ds: Dataset, num_partitions: int = 16) -> Dataset:
    """Global exact dedup by url (combiner → hash repartition → per-block
    vectorized keep-first)."""
    ds = ds.map_batches(dedup_batch_local, batch_format="pyarrow")
    ds = ds.repartition(num_blocks=num_partitions, keys=["url"])
    return ds.map_batches(_keep_first_per_url, batch_format="pyarrow", batch_size=None)
