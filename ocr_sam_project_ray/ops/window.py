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
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ..context import configure_data_context
from .relational import np_cents
from .segmented import filter_overflow_segments, sorted_segments

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

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "mov_value_cents": pa.array([], pa.int64()),
        }
    )

    def moving(batch: pa.Table) -> pa.Table:
        # Arrow-native segmented kernel (round 4): all groups of the
        # partition in one vectorized pass — sort once, window sums by
        # prefix-sum difference with a per-row segment-aware lookback
        if batch.num_rows == 0:
            return empty
        s, starts, counts = sorted_segments(
            batch,
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")],
        )
        s, starts, counts = filter_overflow_segments(
            s, starts, counts, max_group_rows, cap_stats
        )
        n = s.num_rows
        if n == 0:
            return empty
        # half away from zero on BOTH signs, like DuckDB round()
        cents = np_cents(s["value"].to_numpy(zero_copy_only=False))
        cum = cents.cumsum()
        seg_start = np.repeat(starts, counts)
        # subtract the prefix just before max(pos-window, seg_start-1):
        # the global cumsum crosses segments, but everything before the
        # segment start cancels in the difference
        lb = np.maximum(np.arange(n, dtype=np.int64) - window, seg_start - 1)
        base = np.where(lb >= 0, cum[np.maximum(lb, 0)], 0)
        mov = cum - base
        return pa.table(
            {
                "event_id": s["event_id"],
                "user_id": s["user_id"],
                "mov_value_cents": pa.array(mov, pa.int64()),
            }
        )

    return ds.repartition(
        num_blocks=num_partitions, keys=["user_id"]
    ).map_batches(moving, batch_format="pyarrow", batch_size=None)


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

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "delta_us": pa.array([], pa.int64()),
        }
    )

    def lag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        s, starts, counts = sorted_segments(
            batch,
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")],
        )
        s, starts, counts = filter_overflow_segments(
            s, starts, counts, max_group_rows, cap_stats
        )
        n = s.num_rows
        if n == 0:
            return empty
        us = pc.cast(s["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        delta = np.empty(n, dtype=np.int64)
        delta[0] = -1
        if n > 1:
            delta[1:] = us[1:] - us[:-1]
        delta[starts] = -1  # each group's first row gets the sentinel
        return pa.table(
            {
                "event_id": s["event_id"],
                "user_id": s["user_id"],
                "delta_us": pa.array(delta, pa.int64()),
            }
        )

    return ds.repartition(
        num_blocks=num_partitions, keys=["user_id"]
    ).map_batches(lag, batch_format="pyarrow", batch_size=None)


RANGE_HOURS = 1
_RANGE_US = RANGE_HOURS * 3_600 * 1_000_000


def events_range_window(
    sf_dir: str,
    horizon_us: int = _RANGE_US,
    num_partitions: int = 4,
    max_group_rows: Optional[int] = None,
    cap_stats=None,
) -> Dataset:
    """Per-user TIME-based trailing window sum — the RANGE flavor
    (``SUM(...) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN
    INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)``), completing the window
    family next to the ROWS window (events_moving_sum), the hopping
    window (relational.events_hopping) and LAG (events_time_delta).

    RANGE frame semantics (mirrored by DuckDB): the frame for row i is
    every same-user row with ``ts in [ts_i - horizon, ts_i]`` — ties on
    ts are PEERS, so equal-ts rows all receive the sum over the full
    peer run regardless of their (ts, event_id) tie order. The kernel is
    fully vectorized across ALL groups of a partition: one lexsort, one
    cumsum, and two global ``np.searchsorted`` calls over a composite
    (segment, ts) key whose per-segment stride exceeds span + horizon,
    so a needle can never cross into a neighboring segment's key range.
    Values are the engine-wide integer-cents contract (np_cents).

    One output row per event: (event_id, user_id, win_value_cents).
    Returns the Dataset (unbounded at scale) — callers stream it on.
    """
    configure_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "win_value_cents": pa.array([], pa.int64()),
        }
    )

    def windowed(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        s, starts, counts = sorted_segments(
            batch,
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")],
        )
        s, starts, counts = filter_overflow_segments(
            s, starts, counts, max_group_rows, cap_stats
        )
        n = s.num_rows
        if n == 0:
            return empty
        cents = np_cents(s["value"].to_numpy(zero_copy_only=False))
        cum = cents.cumsum()
        us = pc.cast(s["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        t0 = int(us.min())
        span = int(us.max()) - t0
        stride = span + horizon_us + 2
        n_seg = len(starts)
        if n_seg * stride >= 2**62:
            # composite key would overflow int64 — impossible for any
            # real event-log partition (needs ~4e18 us·segments), loud
            # rather than silent wraparound
            raise ValueError(
                f"events_range_window composite key overflow: "
                f"{n_seg} segments x stride {stride}"
            )
        seg_id = np.repeat(np.arange(n_seg, dtype=np.int64), counts)
        key = seg_id * stride + (us - t0)
        # frame start: first same-segment row with ts >= ts_i - horizon.
        # The needle key - horizon stays above the previous segment's max
        # key (stride > span + horizon), so the insertion point cannot
        # leave the segment.
        lo = np.searchsorted(key, key - horizon_us, side="left")
        # frame end: past the current row's full peer run (ties included)
        hi = np.searchsorted(key, key, side="right")
        base = np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        win = cum[hi - 1] - base
        return pa.table(
            {
                "event_id": s["event_id"],
                "user_id": s["user_id"],
                "win_value_cents": pa.array(win, pa.int64()),
            }
        )

    return ds.repartition(
        num_blocks=num_partitions, keys=["user_id"]
    ).map_batches(windowed, batch_format="pyarrow", batch_size=None)


SQL_EVENTS_RANGE_WINDOW = f"""
SELECT event_id, user_id,
       CAST(sum(CAST(round(value*100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL {RANGE_HOURS} HOUR PRECEDING
                        AND CURRENT ROW)
            AS BIGINT) AS win_value_cents
FROM events ORDER BY event_id
"""


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
