"""Per-key sliding-window aggregates over an ordered event log — the
ROWS-window shape (``SUM(...) OVER (PARTITION BY key ORDER BY ts ROWS
BETWEEN n-1 PRECEDING AND CURRENT ROW)``) used for rolling activity
features and rate smoothing.

Same grouped-ordered-log family as ops/corpus_stats.events_cumsum: one
key's rows are assumed to fit one group (documented; the opt-in hot-key
guard from ops/guards.py applies), the in-group kernel is fully
vectorized (cumsum difference — O(rows), no per-window loop), and value
arithmetic is the engine-wide INTEGER-CENTS contract
(half-away-from-zero like DuckDB round(); see relational._cents) so the
DuckDB oracle recomputes sums bit-exactly.

Returns the DATASET (one row per event — unbounded at scale): callers
stream it on via write_parquet/iter_batches; only the bounded driver
wrapper in __ray_entry__.py collects to pandas for the oracle compare.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

import ray.data
from ray.data import Dataset

from ..context import configure_data_context
from .guards import group_overflows
from .relational import np_cents

WINDOW_ROWS = 3


def events_moving_sum(
    sf_dir: str,
    window: int = WINDOW_ROWS,
    num_partitions: int = 4,
    max_group_rows: Optional[int] = None,
    cap_stats=None,
) -> Dataset:
    """Per-user moving sum of value (integer cents) over the last
    ``window`` rows ordered by (ts, event_id). One output row per event:
    (event_id, user_id, mov_value_cents)."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "mov_value_cents": pd.Series([], dtype="int64"),
        }
    )

    def moving(g: pd.DataFrame) -> pd.DataFrame:
        if group_overflows(g, max_group_rows, cap_stats):
            return empty.copy()
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        # half away from zero on BOTH signs, like DuckDB round()
        cents = np_cents(g["value"].to_numpy())
        cum = cents.cumsum()
        mov = cum.copy()
        if len(cum) > window:
            mov[window:] = cum[window:] - cum[:-window]
        out = g[["event_id", "user_id"]].copy()
        out["mov_value_cents"] = mov
        return out

    return ds.groupby("user_id", num_partitions=num_partitions).map_groups(
        moving, batch_format="pandas"
    )


def events_time_delta(
    sf_dir: str,
    num_partitions: int = 4,
    max_group_rows: Optional[int] = None,
    cap_stats=None,
) -> Dataset:
    """LAG shape: per-user microseconds since the previous event in
    (ts, event_id) order; first event per user → -1 (sentinel instead
    of NULL — avoids the null-int dtype divergence between engines).
    One row per event: (event_id, user_id, delta_us)."""
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "delta_us": pd.Series([], dtype="int64"),
        }
    )

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        if group_overflows(g, max_group_rows, cap_stats):
            return empty.copy()
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        delta = np.empty(len(us), dtype="int64")
        delta[0] = -1
        delta[1:] = us[1:] - us[:-1]
        out = g[["event_id", "user_id"]].copy()
        out["delta_us"] = delta
        return out

    return ds.groupby("user_id", num_partitions=num_partitions).map_groups(
        lag, batch_format="pandas"
    )


SQL_EVENTS_TIME_DELTA = """
SELECT event_id, user_id,
       CAST(coalesce(date_diff('microsecond',
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                ts), -1) AS BIGINT) AS delta_us
FROM events ORDER BY event_id
"""


SQL_EVENTS_MOVING_SUM = f"""
SELECT event_id, user_id,
       CAST(sum(CAST(round(value*100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN {WINDOW_ROWS - 1} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS mov_value_cents
FROM events ORDER BY event_id
"""
