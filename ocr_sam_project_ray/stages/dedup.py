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
    vectorized keep-first). Correct for ANY duplicate distribution, but it
    shuffles the full payload; prefer :func:`dedup_by_url_broadcast` when a
    (url, warc_ts) pre-pass is possible (it always is for parquet input)."""
    ds = ds.map_batches(dedup_batch_local, batch_format="pyarrow")
    ds = ds.repartition(num_blocks=num_partitions, keys=["url"])
    return ds.map_batches(_keep_first_per_url, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Payload-free dedup: the 100 TB path
# ---------------------------------------------------------------------------
#
# Shuffling multi-KB html payloads just to pick per-url winners wastes the
# entire exchange on bytes that don't participate in the decision. Instead:
#
#   pass 1  read ONLY (url, warc_ts) (parquet column pruning → a few % of
#           the bytes) → per-batch combiner → tiny hash-shuffle groupby →
#           urls with count > 1 and their max warc_ts. Duplicated urls are
#           a small fraction of a crawl, so this winner map is broadcastable
#           (ray.put once). At 10^12 rows, replace the exact map with a
#           Bloom filter of duplicated urls + a shuffled exact resolve of
#           only the possibly-duplicate rows (noted here; the exact map is
#           used at sandbox scale).
#
#   pass 2  the payload stream is filtered per batch against the broadcast
#           winners — fully streaming, NO payload shuffle, parse overlaps
#           read.
#
# Winner rule: keep the row with max warc_ts per url. Assumes warc_ts is
# unique per (url) among duplicates (true of crawl re-fetch timestamps and
# of the synthetic corpus); corpora violating this must use dedup_by_url.

DRIVER_WINNERS_MAX_ROWS = 5_000_000


def compute_dup_winners(pages_path, num_partitions: int = 8) -> dict[str, int]:
    """Map of duplicated url → winning warc_ts (int64 epoch us).

    Fast path: when the (url, warc_ts) projection is small (< 5M rows) the
    winner map is computed with one pandas groupby on the driver — a
    two-column projection of even a large shard is tiny, and the distributed
    groupby's fixed shuffle cost would dominate. Above the threshold the
    exact distributed combiner→groupby path runs."""
    import ray
    import ray.data
    from ray.data.aggregate import Max, Sum

    ds = ray.data.read_parquet(pages_path, columns=["url", "warc_ts"])
    if ds.count() <= DRIVER_WINNERS_MAX_ROWS:
        import pandas as pd

        df = ds.to_pandas()
        df["ts"] = df["warc_ts"].astype("int64")
        agg = df.groupby("url", as_index=False).agg(
            n=("ts", "size"), max_ts=("ts", "max")
        )
        dups = agg[agg["n"] > 1]
        return dict(zip(dups["url"], dups["max_ts"]))

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "url": batch["url"].to_pylist(),
                "ts": pc.cast(batch["warc_ts"], pa.int64()).to_pylist(),
            }
        )
        agg = df.groupby("url", as_index=False).agg(
            n=("ts", "size"), max_ts=("ts", "max")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("url", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"), Max("max_ts", alias_name="max_ts"))
    )
    dups = agg.map_batches(
        lambda b: b.filter(pc.greater(b["n"], 1)).select(["url", "max_ts"]),
        batch_format="pyarrow",
    ).to_pandas()
    return dict(zip(dups["url"], dups["max_ts"]))


def make_winner_filter(winners_ref):
    """Streaming per-batch filter against the broadcast winner map."""

    def drop_losers(batch: pa.Table) -> pa.Table:
        import ray

        winners = ray.get(winners_ref)
        if not winners:
            return batch
        urls = batch["url"].to_pylist()
        ts = pc.cast(batch["warc_ts"], pa.int64()).to_pylist()
        mask = [u not in winners or t == winners[u] for u, t in zip(urls, ts)]
        return batch.filter(pa.array(mask))

    return drop_losers
