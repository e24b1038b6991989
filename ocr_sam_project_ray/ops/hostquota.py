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
2. one SMALL groupby counts rows per (host, bucket); the driver folds
   per-bucket exclusive offsets (bounded: n_hosts × 256 rows — the same
   explicit driver bound as ops/ranking.py; hosts above ~5M need the
   two-byte bucket widening documented there);
3. groupby((host, bucket)).map_groups sorts each cell by (h, url) and
   keeps rows whose offset + local position < n_per_host. A HOT host is
   split across 256 independent cells, so no single group ever holds a
   whole host — the skew case this op exists for.

Buckets whose exclusive offset is already >= n_per_host short-circuit to
empty without sorting (the common case for a capped hot host).

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


def host_quota(
    ds: Dataset,
    n_per_host: int,
    url_col: str = "url",
    num_partitions: int = 4,
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

    from ray.data.aggregate import Count

    counts = (
        keyed_ds.groupby(["host", "bucket"], num_partitions=2)
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()  # bounded: n_hosts x 256 rows
        .sort_values(["host", "bucket"])
    )
    offsets: dict[tuple, int] = {}
    running: dict = {}
    for _, row in counts.iterrows():
        hkey = row.host
        offsets[(hkey, int(row.bucket))] = running.get(hkey, 0)
        running[hkey] = running.get(hkey, 0) + int(row.cnt)
    state_ref = ray.put(offsets)

    def select_group(g):
        import pandas as pd

        offs = ray.get(state_ref)
        off = offs[(g["host"].iloc[0], int(g["bucket"].iloc[0]))]
        if off >= n_per_host:  # whole cell past the cap: skip the sort
            keep = g.iloc[:0]
        else:
            keep = (g.sort_values(["h", "url"], kind="mergesort")
                    .head(n_per_host - off))
        return pd.DataFrame(
            {
                "url": keep["url"].to_numpy(),
                "host": keep["host"].to_numpy(),
                "host_rank": off + 1 + pd.RangeIndex(len(keep)).to_numpy(),
            }
        )

    return keyed_ds.groupby(["host", "bucket"],
                            num_partitions=num_partitions).map_groups(
        select_group, batch_format="pandas"
    )


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
