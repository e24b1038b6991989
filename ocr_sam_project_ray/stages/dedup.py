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
#
# When even the DUPLICATED-url winner table outgrows the broadcast budget
# (extreme duplicate fractions at 10^12 rows), use dedup_by_url_bloom: a
# fixed-size Bloom filter of duplicated urls routes only possibly-duplicate
# rows through a shuffled exact resolve — bounded memory at ANY dup count.

DRIVER_WINNERS_MAX_ROWS = 5_000_000


def compute_dup_winners(pages_path, num_partitions: int = 8) -> pa.Table:
    """Arrow table (url, max_ts) of DUPLICATED urls and their winning
    warc_ts (int64 epoch us) — the broadcast side of the payload-free dedup.

    Fast path: when the (url, warc_ts) projection is small (< 5M rows ≈
    120 MB of two columns) the winner table is computed with one pandas
    groupby on the driver — the distributed groupby's fixed shuffle cost
    would dominate. Above the threshold the exact distributed
    combiner→groupby path runs; its OUTPUT (dup urls only — a small
    fraction of a crawl) is what gets collected, never the full projection.
    Corpora whose dup-url table itself is too large for a broadcast must
    use :func:`dedup_by_url_bloom` instead."""
    import pyarrow.dataset as pads

    import ray
    import ray.data
    from ray.data.aggregate import Max, Sum

    # row count from parquet METADATA (no data read, no Ray tasks) decides
    # the path; the fast path then does ONE direct driver read of the
    # two-column projection — a few MB — instead of spinning up an executor
    # twice (count + collect). This is the pipeline's only non-scaling
    # pre-pass, so its constant matters for small-N efficiency.
    frags = pads.dataset(pages_path, format="parquet")
    n_rows = sum(f.metadata.num_rows for f in frags.get_fragments())
    if n_rows <= DRIVER_WINNERS_MAX_ROWS:
        t = frags.to_table(columns=["url", "warc_ts"])
        agg = pa.table(
            {
                "url": t["url"],
                "ts": pc.cast(t["warc_ts"], pa.int64()),
            }
        ).group_by("url").aggregate([("ts", "count"), ("ts", "max")])
        agg = agg.rename_columns(["url", "n", "max_ts"])
        dups = agg.filter(pc.greater(agg["n"], 1))
        return pa.table(
            {
                "url": pc.cast(dups["url"], pa.string()),
                "max_ts": dups["max_ts"],
            }
        )
    ds = ray.data.read_parquet(pages_path, columns=["url", "warc_ts"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"url": batch["url"], "ts": pc.cast(batch["warc_ts"], pa.int64())}
        )
        agg = t.group_by("url").aggregate([("ts", "count"), ("ts", "max")])
        return agg.rename_columns(["url", "n", "max_ts"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("url", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"), Max("max_ts", alias_name="max_ts"))
    )
    # collect only the dup-url rows (bounded by the duplicate fraction)
    parts = list(
        agg.map_batches(
            lambda b: b.filter(pc.greater(b["n"], 1)).select(["url", "max_ts"]),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
    )
    if not parts:
        return pa.table({"url": pa.array([], pa.string()),
                         "max_ts": pa.array([], pa.int64())})
    dups = pa.concat_tables(parts)
    return pa.table(
        {
            "url": pc.cast(dups["url"], pa.string()),
            "max_ts": pc.cast(dups["max_ts"], pa.int64()),
        }
    )


def make_winner_filter(winners_ref):
    """Streaming per-batch filter against the broadcast winner table —
    fully vectorized: ``pc.index_in`` probes the dup-url set, ``pc.take``
    fetches each hit's winning ts, and a single Kleene-OR builds the keep
    mask (rows of non-duplicated urls have a null index → keep)."""

    def drop_losers(batch: pa.Table) -> pa.Table:
        import ray

        winners: pa.Table = ray.get(winners_ref)
        if winners.num_rows == 0:
            return batch
        idx = pc.index_in(batch["url"], value_set=winners["url"].combine_chunks())
        winner_ts = pc.take(winners["max_ts"].combine_chunks(), idx)
        keep = pc.or_kleene(
            pc.is_null(idx),
            pc.equal(pc.cast(batch["warc_ts"], pa.int64()), winner_ts),
        )
        return batch.filter(pc.fill_null(keep, True))

    return drop_losers


# ---------------------------------------------------------------------------
# Bloom-routed dedup: bounded memory at ANY duplicate fraction
# ---------------------------------------------------------------------------

def compute_dup_url_bloom(pages_path, num_partitions: int = 8,
                          m_bits: int = None):
    """Packed Bloom bitmap of DUPLICATED urls, built fully distributed:
    column-pruned read → per-batch Arrow count combiner → hash groupby →
    urls with n > 1 → per-block bitmaps OR-merged (ops/bloom.py). Driver
    state is m_bits/8 bytes (default 128 KB) regardless of dup count."""
    import ray.data

    from ray.data.aggregate import Sum

    from ..ops.bloom import DEFAULT_M_BITS, bloom_from_dataset

    m_bits = m_bits or DEFAULT_M_BITS
    ds = ray.data.read_parquet(pages_path, columns=["url"])

    def partial(batch: pa.Table) -> pa.Table:
        agg = pa.table({"url": batch["url"]}).group_by("url").aggregate(
            [("url", "count")]
        )
        return agg.rename_columns(["url", "n"])

    dup_urls = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("url", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda b: b.filter(pc.greater(b["n"], 1)).select(["url"]),
            batch_format="pyarrow",
        )
    )
    return bloom_from_dataset(dup_urls, "url", m_bits=m_bits)


def dedup_by_url_bloom(
    ds: Dataset, pages_path, num_partitions: int = 16, m_bits: int = None
) -> Dataset:
    """Payload-free dedup with BOUNDED broadcast state (the promised scale
    path for extreme duplicate fractions, where even the dup-url winner
    table outgrows a broadcast):

      pass 1  Bloom bitmap of duplicated urls (compute_dup_url_bloom) —
              fixed 128 KB broadcast, no false negatives.
      pass 2a rows whose url MISSES the bloom are definitely unique →
              stream straight through, zero shuffle.
      pass 2b possible duplicates (bloom hits, including the ~0.1% false
              positives) → hash repartition by url → vectorized keep-first
              — the exact resolve; false positives are singleton groups and
              survive unchanged.

    The two branches re-execute upstream lineage (Ray Data has no streaming
    split), so root this at a parquet read: re-reading is cheap next to
    shuffling payloads, and only the duplicate fraction is ever shuffled."""
    import ray

    from ..ops.bloom import DEFAULT_M_BITS, bloom_contains

    m_bits = m_bits or DEFAULT_M_BITS
    bits_ref = ray.put(compute_dup_url_bloom(pages_path, m_bits=m_bits))

    def branch(keep_hits: bool):
        def f(batch: pa.Table) -> pa.Table:
            bits = ray.get(bits_ref)
            mask = bloom_contains(bits, batch["url"].to_pylist(), m_bits=m_bits)
            return batch.filter(pa.array(mask if keep_hits else ~mask))

        return f

    unique = ds.map_batches(branch(False), batch_format="pyarrow")
    resolved = (
        ds.map_batches(branch(True), batch_format="pyarrow")
        .repartition(num_blocks=num_partitions, keys=["url"])
        .map_batches(_keep_first_per_url, batch_format="pyarrow", batch_size=None)
    )
    return unique.union(resolved)
