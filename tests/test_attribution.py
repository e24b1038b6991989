"""Last-touch attribution vs hand-computed fixtures and DuckDB."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ocr_sam_project_ray.ops.attribution import (
    SQL_PURCHASE_ATTRIBUTION, purchase_attribution,
)

SF = "/root/testdata/sf0.001"


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _fixture(tmp_path, rows):
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [pd.Timestamp(r[1]) for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_hand_case(tmp_path):
    rows = [
        (1, "2024-01-01 00:00", 1, "view", None),
        (2, "2024-01-01 00:05", 1, "click", None),
        (3, "2024-01-01 00:10", 1, "purchase", None),   # -> 2 (latest touch)
        (4, "2024-01-01 00:10", 1, "click", None),      # same-ts as p below
        (5, "2024-01-01 00:10", 1, "purchase", None),   # -> 4 (ts tie, <=)
        (6, "2024-01-01 00:00", 2, "purchase", None),   # no touch -> -1
        (7, "2024-01-01 00:01", 2, "view", None),       # AFTER the purchase
        (8, "2024-01-01 00:00", 3, "error", None),      # non-participating
    ]
    sf = _fixture(tmp_path, rows)
    out = (
        purchase_attribution(sf)
        .to_pandas().set_index("event_id")["attributed_event_id"]
    )
    # event 3: touches at ts 00:00 (1), 00:05 (2), 00:10 (4 — same minute
    # as the purchase, ts <= holds) → greatest (ts, event_id) is 4
    assert out.loc[3] == 4
    assert out.loc[5] == 4
    assert out.loc[6] == -1
    assert len(out) == 3  # only purchases emit rows


def test_tie_break_event_id_desc(tmp_path):
    rows = [
        (10, "2024-01-01 00:00", 1, "view", None),
        (11, "2024-01-01 00:00", 1, "click", None),  # same ts, higher id
        (12, "2024-01-01 00:00", 1, "purchase", None),
    ]
    sf = _fixture(tmp_path, rows)
    out = (
        purchase_attribution(sf)
        .to_pandas().set_index("event_id")["attributed_event_id"]
    )
    assert out.loc[12] == 11


def test_matches_duckdb():
    got = _norm(purchase_attribution(SF).to_pandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = _norm(con.sql(SQL_PURCHASE_ATTRIBUTION).df())
    pd.testing.assert_frame_equal(got, exp)