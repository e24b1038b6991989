"""Distribution-audit aggregates: regression sufficient statistics and
the activity-degree histogram — the two folds a data platform runs
before fitting anything or picking a partitioning key.

``events_value_trend``: per event_type, the OLS sufficient statistics
(n, Σx, Σy, Σxx, Σxy) of value-vs-time — every linear fit / drift
monitor / trend alert is a driver-side closed form over these five
integers, and the fold is exactly the mergeable-combiner shape that
scales (no model math inside the pass). Exact integer contract:
x = whole hours since 2024-01-01 00:00 UTC (floor division — keeps
Σxx far inside int64 at any corpus span this side of a millennium),
y = integer cents (relational._cents). DuckDB sums BIGINT into
HUGEINT; the oracle casts back after summing, and every term is exact.

``events_per_user_histogram``: (n_events → n_users) — the degree
distribution of the event log. THE skew audit: this histogram is what
says whether a one-key-per-group operator (user_sessions, cumsum,
attribution) is safe or needs the hot-key guard. Two-level exact
aggregation, never a driver-side set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ..context import configure_data_context
from .relational import _cents

X_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs
US_PER_HOUR = 3_600_000_000


def events_value_trend(sf_dir: str, num_partitions: int = 2) -> Dataset:
    """(event_type, n, sum_x, sum_y, sum_xx, sum_xy) — OLS sufficient
    statistics of cents-vs-hours per event type."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        d = us - X_EPOCH_US
        if (d < 0).any():
            # numpy // floors toward -inf, DuckDB // truncates toward
            # zero — they diverge on negatives, so pre-epoch timestamps
            # are rejected loudly instead of silently mis-bucketed
            raise ValueError(
                "events_value_trend: timestamp before the 2024-01-01 x-epoch"
            )
        x = d // US_PER_HOUR  # whole hours; identical on both engines for x >= 0
        y = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "sum_x": pa.array(x, pa.int64()),
                "sum_y": pa.array(y, pa.int64()),
                "sum_xx": pa.array(x * x, pa.int64()),
                "sum_xy": pa.array(x * y, pa.int64()),
            }
        )
        agg = t.group_by("event_type").aggregate(
            [(c, "sum") for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_xy")]
        )
        return agg.rename_columns(
            ["event_type", "n", "sum_x", "sum_y", "sum_xx", "sum_xy"]
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type", num_partitions=num_partitions)
        .aggregate(
            *(Sum(c, alias_name=c)
              for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_xy"))
        )
    )


SQL_EVENTS_VALUE_TREND = f"""
WITH e AS (
  SELECT event_type,
         (epoch_us(ts) - {X_EPOCH_US}) // {US_PER_HOUR} AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sum_x,
       CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(x * x) AS BIGINT) AS sum_xx,
       CAST(sum(x * y) AS BIGINT) AS sum_xy
FROM e GROUP BY event_type ORDER BY event_type
"""


def events_per_user_histogram(
    sf_dir: str, num_partitions: int = 4
) -> Dataset:
    """(n_events, n_users): degree distribution of the event log."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("user_id").aggregate([([], "count_all")])
        return agg.rename_columns(["user_id", "n"])

    from ray.data.aggregate import Sum

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id", num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n_events"))
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        agg = (
            pa.table({"n_events": batch["n_events"]})
            .group_by("n_events")
            .aggregate([([], "count_all")])
        )
        return agg.rename_columns(["n_events", "n_users"])

    return (
        per_user.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("n_events", num_partitions=1)
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


SQL_EVENTS_PER_USER_HISTOGRAM = """
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT n_events, CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY n_events ORDER BY n_events
"""
