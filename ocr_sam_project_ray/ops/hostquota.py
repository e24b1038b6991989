"""Per-host document quota — keep at most N documents per host, chosen in
a deterministic hash order. The CCNet / Common-Crawl-curation "domain cap":
without it a single link-farm host can dominate a training corpus; with a
deterministic order the cap is reproducible across runs and incremental
snapshots.

Contract (what the DuckDB oracle recomputes):
- order within a host = (md5(url), url) — url is unique, so the order is
  total and the keep set is exact;
- keep rows with within-host 1-based rank <= n_per_host;
- output (url, host, host_rank), host = the host_stats two-regex rewrite.

Scale shape — the stratified_sample prefix-sum pattern keyed by host:
1. one pass emits (url, host, h = md5(url), bucket = first hash byte);
2. per-block (host, bucket) COUNT PARTIALS are folded on the driver —
   each partial is pre-collapsed to ≤ cells-per-block rows, total driver
   state n_hosts × 256 (the explicit ops/ranking.py bound; hosts above
   ~5M need the two-byte bucket widening documented there). No shuffle:
   the measured fixed cost of one Ray hash shuffle (~5 s on this box)
   dwarfed the 10k-row aggregation it was doing;
3. ONE keyed repartition on (host, bucket) and a per-BLOCK vectorized
   pass (lexsort → run starts → offset + within-run position), the
   ops/ranking.py shape — NOT groupby().map_groups: with n_hosts × 256
   cells the per-group dispatch overhead of map_groups dominates the
   actual work (measured 28 s for this op at sf0.1). A HOT host still
   splits across 256 independent cells, so no block ever holds a whole
   host — the skew case this op exists for.

Rows whose cell offset is already >= n_per_host are dropped by one
vectorized mask (the common case for a capped hot host).

Below ``driver_max_rows`` (default 5M — the stages/dedup winner-pre-pass
bound) the repartition is skipped too: the slim 4-column key table is
folded on the driver and ranked with one lexsort, zero shuffles. Both
plans are equality-tested (test_hostquota).

The reference has no per-source quota surface; beyond-reference
training-data op (SURVEY §2.6).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..context import configure_data_context


DRIVER_MAX_ROWS = 5_000_000


def host_quota(
    ds: Dataset,
    n_per_host: int,
    url_col: str = "url",
    num_partitions: int = 4,
    driver_max_rows: int = DRIVER_MAX_ROWS,
) -> Dataset:
    """Dataset with ``url_col`` → Dataset(url, host, host_rank) keeping at
    most ``n_per_host`` rows per host in (md5(url), url) order."""
    if n_per_host < 0:
        raise ValueError("n_per_host must be >= 0")
    configure_data_context()

    def keyed(batch: pa.Table) -> pa.Table:
        urls = pc.cast(batch[url_col], pa.string())
        stripped = pc.replace_substring_regex(
            urls, pattern=r"^https?://", replacement="")
        host = pc.replace_substring_regex(
            stripped, pattern=r"/.*$", replacement="")
        hs = [hashlib.md5(u.encode("utf-8")).hexdigest()
              for u in urls.to_pylist()]
        return pa.table(
            {
                "url": urls,
                "host": host,
                "h": pa.array(hs, pa.string()),
                "bucket": pa.array([int(x[:2], 16) for x in hs], pa.int64()),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    if keyed_ds.count() <= driver_max_rows:
        # bounded fast path: fold the slim key table on the driver and
        # rank with one lexsort — zero shuffles (winner-pre-pass pattern)
        import numpy as np

        tbl = pa.concat_tables(
            pa.table(b) for b in keyed_ds.iter_batches(batch_format="pyarrow")
        )
        host = tbl["host"].to_numpy(zero_copy_only=False)
        h = tbl["h"].to_numpy(zero_copy_only=False)
        url = tbl["url"].to_numpy(zero_copy_only=False)
        order = np.lexsort((url, h, host))
        hs = host[order]
        run_start = np.zeros(len(order), dtype=np.int64)
        new_run = np.nonzero(hs[1:] != hs[:-1])[0] + 1
        run_start[new_run] = new_run
        np.maximum.accumulate(run_start, out=run_start)
        rank = np.arange(len(order), dtype=np.int64) - run_start + 1
        keep = rank <= n_per_host
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "url": pa.array(url[order][keep], pa.string()),
                    "host": pa.array(hs[keep], pa.string()),
                    "host_rank": pa.array(rank[keep], pa.int64()),
                }
            )
        )

    # distributed plan: per-block (host, bucket) count partials folded on
    # the driver into exclusive per-cell offsets (bounded: n_hosts x 256)
    def count_partial(batch: pa.Table) -> pa.Table:
        agg = (
            batch.select(["host", "bucket"])
            .group_by(["host", "bucket"]).aggregate([([], "count_all")])
        )
        return agg.rename_columns(["host", "bucket", "cnt"])

    cells: dict[tuple, int] = {}
    for b in keyed_ds.map_batches(count_partial, batch_format="pyarrow") \
                     .iter_batches(batch_format="pyarrow"):
        for hkey, bkt, c in zip(b["host"].to_pylist(),
                                b["bucket"].to_pylist(),
                                b["cnt"].to_pylist()):
            cells[(hkey, bkt)] = cells.get((hkey, bkt), 0) + c
    offsets: dict[tuple, int] = {}
    running: dict = {}
    for hkey, bkt in sorted(cells):
        offsets[(hkey, bkt)] = running.get(hkey, 0)
        running[hkey] = running.get(hkey, 0) + cells[(hkey, bkt)]
    state_ref = ray.put(offsets)

    by_cell = keyed_ds.repartition(num_blocks=num_partitions,
                                   keys=["host", "bucket"])

    def select_block(batch: pa.Table) -> pa.Table:
        import numpy as np

        if batch.num_rows == 0:
            return pa.table({"url": pa.array([], pa.string()),
                             "host": pa.array([], pa.string()),
                             "host_rank": pa.array([], pa.int64())})
        offs = ray.get(state_ref)
        host = batch["host"].to_numpy(zero_copy_only=False)
        bucket = batch["bucket"].to_numpy(zero_copy_only=False)
        h = batch["h"].to_numpy(zero_copy_only=False)
        url = batch["url"].to_numpy(zero_copy_only=False)
        order = np.lexsort((url, h, bucket, host))
        hs, bs = host[order], bucket[order]
        run_start = np.zeros(len(order), dtype=np.int64)
        new_run = np.nonzero((hs[1:] != hs[:-1]) | (bs[1:] != bs[:-1]))[0] + 1
        run_start[new_run] = new_run
        np.maximum.accumulate(run_start, out=run_start)
        within = np.arange(len(order), dtype=np.int64) - run_start
        runs = np.unique(run_start)  # one dict probe per cell, not per row
        run_offs = np.array([offs[(hs[i], int(bs[i]))] for i in runs],
                            dtype=np.int64)
        base = run_offs[np.searchsorted(runs, run_start)]
        rank = base + within + 1
        keep = rank <= n_per_host
        kept = order[keep]
        return pa.table(
            {
                "url": pa.array(url[kept], pa.string()),
                "host": pa.array(hs[keep], pa.string()),
                "host_rank": pa.array(rank[keep], pa.int64()),
            }
        )

    return by_cell.map_batches(select_block, batch_format="pyarrow",
                               batch_size=None)


SQL_HOST_QUOTA = """
SELECT url,
       regexp_replace(regexp_replace(url, '^https?://', ''), '/.*$', '')
         AS host,
       CAST(row_number() OVER (
         PARTITION BY regexp_replace(regexp_replace(url, '^https?://', ''),
                                     '/.*$', '')
         ORDER BY md5(url), url) AS BIGINT) AS host_rank
FROM read_parquet('{pages}')
QUALIFY host_rank <= {n}
"""
