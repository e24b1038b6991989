"""Regression sufficient statistics + degree histogram vs DuckDB and
hand-computed fixtures."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_sam_project_ray.ops.suffstats import (
    SQL_EVENTS_PER_USER_HISTOGRAM, SQL_EVENTS_VALUE_TREND,
    events_per_user_histogram, events_value_trend,
)

SF = "/root/testdata/sf0.001"


def _norm(df, key):
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(key).reset_index(drop=True)


def test_trend_matches_duckdb():
    got = _norm(events_value_trend(SF).to_pandas(), "event_type")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = _norm(con.sql(SQL_EVENTS_VALUE_TREND).df(), "event_type")
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_trend_hand_case(tmp_path):
    # two events of one type: x = 0h and 2h after epoch, y = 100, 300 cents
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [pd.Timestamp("2024-01-01 00:30"),
                 pd.Timestamp("2024-01-01 02:30")],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["view", "view"], pa.string()),
            "value": pa.array([1.0, 3.0], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_value_trend(str(tmp_path)).to_pandas().iloc[0]
    assert (out.n, out.sum_x, out.sum_y) == (2, 2, 400)
    assert (out.sum_xx, out.sum_xy) == (4, 600)  # x=0,2 → xx=0+4, xy=0+600


def test_trend_rejects_pre_epoch(tmp_path):
    t = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([pd.Timestamp("2023-12-31 23:00")],
                           pa.timestamp("us")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["view"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    with pytest.raises(Exception, match="x-epoch"):
        events_value_trend(str(tmp_path)).to_pandas()


def test_histogram_matches_duckdb_and_sums():
    got = _norm(events_per_user_histogram(SF).to_pandas(), "n_events")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = _norm(con.sql(SQL_EVENTS_PER_USER_HISTOGRAM).df(), "n_events")
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)
    # mass checks: users sum to distinct users, n*users to total events
    tot_users = con.sql("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    tot_events = con.sql("SELECT count(*) FROM events").fetchone()[0]
    assert got.n_users.sum() == tot_users
    assert (got.n_events * got.n_users).sum() == tot_events