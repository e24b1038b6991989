"""Funnel / sliding-window / ROLLUP / hash-classifier operators vs
hand-computed fixtures and DuckDB recomputes."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray
import ray.data

from ocr_sam_project_ray.ops.funnel import events_funnel, sql_events_funnel
from ocr_sam_project_ray.ops.hashclf import (
    _scores, hashclf_score, sql_hashclf_score,
)
from ocr_sam_project_ray.ops.rollup import (
    SQL_EVENTS_CUBE, SQL_EVENTS_ROLLUP, events_cube, events_rollup,
)
from ocr_sam_project_ray.ops.window import (
    SQL_EVENTS_MOVING_SUM, SQL_EVENTS_TIME_DELTA, events_moving_sum,
    events_time_delta,
)

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _events_fixture(tmp_path, rows):
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [pd.Timestamp(r[1]) for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_hand_case(tmp_path):
    # u1 completes all 3 steps; u2 stalls after click; u3's click ties
    # the view ts exactly -> strict > rejects it (step 1 only); u4 has
    # the steps out of order (purchase first still completes via later
    # events); u5 has no funnel events at all.
    rows = [
        (1, "2024-01-01 00:00", 1, "view", 1.0),
        (2, "2024-01-01 00:01", 1, "click", 1.0),
        (3, "2024-01-01 00:02", 1, "purchase", 1.0),
        (4, "2024-01-01 00:00", 2, "view", 1.0),
        (5, "2024-01-01 00:05", 2, "click", 1.0),
        (6, "2024-01-01 00:00", 3, "view", 1.0),
        (7, "2024-01-01 00:00", 3, "click", 1.0),
        (8, "2024-01-01 00:00", 4, "purchase", 1.0),
        (9, "2024-01-01 00:01", 4, "view", 1.0),
        (10, "2024-01-01 00:02", 4, "click", 1.0),
        (11, "2024-01-01 00:03", 4, "purchase", 1.0),
        (12, "2024-01-01 00:00", 5, "error", 1.0),
    ]
    sf = _events_fixture(tmp_path, rows)
    out = events_funnel(sf).to_pandas().set_index("step")
    assert out.loc[1, "n_users"] == 4  # u1 u2 u3 u4
    assert out.loc[2, "n_users"] == 3  # u1 u2 u4 (u3 tie rejected)
    assert out.loc[3, "n_users"] == 2  # u1 u4
    assert list(out["event_type"]) == ["view", "click", "purchase"]


def test_funnel_matches_duckdb():
    got = _norm(events_funnel(SF).to_pandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = _norm(con.sql(sql_events_funnel()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_funnel_hot_key_guard(tmp_path):
    from ocr_sam_project_ray.ops.guards import GroupCapStats

    rows = [
        (i, f"2024-01-01 00:{i:02d}", 1, t, 1.0)
        for i, t in enumerate(["view", "click", "purchase", "view"])
    ] + [(10, "2024-01-01 00:00", 2, "view", 1.0)]
    sf = _events_fixture(tmp_path, rows)
    stats = GroupCapStats.remote()
    out = (
        events_funnel(sf, max_group_rows=2, cap_stats=stats)
        .to_pandas()
        .set_index("step")
    )
    # u1 (4 funnel rows) capped and skipped; u2 still counted
    assert out.loc[1, "n_users"] == 1
    got = ray.get(stats.get.remote())
    assert got == {"capped_groups": 1, "capped_rows": 4}


def test_moving_sum_hand_case(tmp_path):
    rows = [
        (1, "2024-01-01 00:00", 1, "view", 1.00),
        (2, "2024-01-01 00:01", 1, "view", 2.00),
        (3, "2024-01-01 00:02", 1, "view", 4.00),
        (4, "2024-01-01 00:03", 1, "view", 8.00),
        (5, "2024-01-01 00:00", 2, "view", 0.105),  # .5-cent boundary
    ]
    sf = _events_fixture(tmp_path, rows)
    out = (
        events_moving_sum(sf).to_pandas().set_index("event_id")["mov_value_cents"]
    )
    assert list(out.loc[[1, 2, 3, 4]]) == [100, 300, 700, 1400]
    # half-away-from-zero: 10.5 -> 11, matching DuckDB round()
    assert out.loc[5] == 11


def test_moving_sum_negative_values_match_duckdb(tmp_path):
    # refunds: half-away-from-zero must hold on the NEGATIVE side too
    # (-10.5 cents -> -11, not numpy floor's -10)
    rows = [
        (1, "2024-01-01 00:00", 1, "view", -0.105),
        (2, "2024-01-01 00:01", 1, "view", -2.0),
        (3, "2024-01-01 00:02", 1, "view", 3.0),
    ]
    sf = _events_fixture(tmp_path, rows)
    got = _norm(events_moving_sum(sf).to_pandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    exp = _norm(con.sql(SQL_EVENTS_MOVING_SUM).df())
    pd.testing.assert_frame_equal(got, exp)
    assert got.set_index("event_id").loc[1, "mov_value_cents"] == -11


def test_moving_sum_matches_duckdb():
    got = _norm(events_moving_sum(SF).to_pandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = _norm(con.sql(SQL_EVENTS_MOVING_SUM).df())
    pd.testing.assert_frame_equal(got, exp)


def test_time_delta_hand_case(tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.0),
        (2, "2024-01-01 00:00:01.500000", 1, "view", 1.0),
        (3, "2024-01-01 00:01:00", 1, "view", 1.0),
        (4, "2024-01-01 09:00:00", 2, "view", 1.0),
    ]
    sf = _events_fixture(tmp_path, rows)
    out = events_time_delta(sf).to_pandas().set_index("event_id")["delta_us"]
    assert out.loc[1] == -1       # first event of user 1
    assert out.loc[2] == 1_500_000
    assert out.loc[3] == 58_500_000
    assert out.loc[4] == -1       # first event of user 2


def test_time_delta_matches_duckdb():
    got = _norm(events_time_delta(SF).to_pandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = _norm(con.sql(SQL_EVENTS_TIME_DELTA).df())
    pd.testing.assert_frame_equal(got, exp)


def test_rollup_matches_duckdb():
    got = _norm(events_rollup(SF).to_pandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = _norm(con.sql(SQL_EVENTS_ROLLUP).df())
    pd.testing.assert_frame_equal(got, exp)


def test_cube_matches_duckdb():
    got = _norm(events_cube(SF).to_pandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = _norm(con.sql(SQL_EVENTS_CUBE).df())
    pd.testing.assert_frame_equal(got, exp)


def test_cube_adds_hour_marginals(tmp_path):
    rows = [
        (1, "2024-01-01 05:30", 1, "view", 1.0),
        (2, "2024-01-01 05:45", 1, "click", 2.0),
        (3, "2024-01-01 07:00", 2, "view", 4.0),
    ]
    sf = _events_fixture(tmp_path, rows)
    out = events_cube(sf).to_pandas()
    hr5 = out[(out.event_type == "ALL") & (out.hr == "05")]
    assert int(hr5.n.iloc[0]) == 2 and int(hr5.value_cents.iloc[0]) == 300
    # superset of the ROLLUP levels
    assert len(out[(out.event_type == "ALL") & (out.hr == "ALL")]) == 1
    assert len(out[(out.event_type == "view") & (out.hr == "ALL")]) == 1


def test_rollup_levels_consistent(tmp_path):
    rows = [
        (1, "2024-01-01 05:30", 1, "view", 1.0),
        (2, "2024-01-01 05:45", 1, "click", 2.0),
        (3, "2024-01-01 07:00", 2, "view", 4.0),
    ]
    sf = _events_fixture(tmp_path, rows)
    out = events_rollup(sf).to_pandas()
    grand = out[(out.event_type == "ALL") & (out.hr == "ALL")]
    assert len(grand) == 1
    assert int(grand.n.iloc[0]) == 3 and int(grand.value_cents.iloc[0]) == 700
    view_all = out[(out.event_type == "view") & (out.hr == "ALL")]
    assert int(view_all.n.iloc[0]) == 2 and int(view_all.value_cents.iloc[0]) == 500
    finest = out[(out.event_type != "ALL") & (out.hr != "ALL")]
    assert finest.n.sum() == 3
    assert set(finest.hr) == {"05", "07"}


def test_hashclf_kernel_hand_case():
    # h('ab') = (2*97 + 97*31 + 98) % 1024 = (194 + 3007 + 98) % 1024
    h = (2 * 97 + ord("a") * 31 + ord("b")) % 1024
    w = (h * 2654435761) % 1997 - 998
    assert _scores(["ab ab"]).tolist() == [2 * w]
    assert _scores([""]).tolist() == [0]
    assert _scores([None]).tolist() == [0]
    assert _scores(["  "]).tolist() == [0]


def test_hashclf_matches_duckdb():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = _norm(hashclf_score(docs).to_pandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = _norm(con.sql(sql_hashclf_score()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_hashclf_unicode_parity():
    # character (not byte) addressing on both engines: multi-byte chars
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["café naïve 中文", "é"],
            }
        )
    )
    got = _norm(hashclf_score(docs).to_pandas())
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'café naïve 中文'), (2, 'é')"
        ") t(doc_id, text)"
    )
    exp = _norm(con.sql(sql_hashclf_score()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_rollup_and_cube_empty_input(tmp_path):
    """Empty-input boundary (round-3 advisor): SQL ROLLUP/CUBE emit one
    grand-total row on an empty table; the seed row makes the engine do
    the same (value_cents renders 0 — the integer contract has no NULL)."""
    sf = _events_fixture(tmp_path, [])
    out = events_rollup(sf).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].tolist() == ["ALL", "ALL", 0, 0]
    cube = events_cube(sf).to_pandas()
    assert len(cube) == 1
    assert cube.iloc[0].tolist() == ["ALL", "ALL", 0, 0]


# --------------------------------------------------------------------------
# events_range_window — TIME-based RANGE trailing window
# --------------------------------------------------------------------------

def test_range_window_hand_case(tmp_path):
    from ocr_sam_project_ray.ops.window import events_range_window

    rows = [
        (1, "2024-01-01 00:00", 1, "view", 1.00),
        (2, "2024-01-01 00:30", 1, "view", 2.00),
        # exactly 1h after e1 -> the RANGE frame is CLOSED on the left,
        # so e1 is still inside
        (3, "2024-01-01 01:00", 1, "view", 4.00),
        # far past every prior event -> frame is just itself
        (4, "2024-01-01 02:30", 1, "view", 8.00),
        # ties are PEERS: both rows get the full peer-run sum
        (10, "2024-01-01 00:00", 2, "view", 1.00),
        (11, "2024-01-01 00:00", 2, "view", 2.00),
        # .5-cent boundary: half away from zero like DuckDB round()
        (20, "2024-01-01 00:00", 3, "view", 0.105),
    ]
    sf = _events_fixture(tmp_path, rows)
    out = (
        events_range_window(sf)
        .to_pandas().set_index("event_id")["win_value_cents"]
    )
    assert list(out.loc[[1, 2, 3, 4]]) == [100, 300, 700, 800]
    assert out.loc[10] == 300 and out.loc[11] == 300
    assert out.loc[20] == 11


def test_range_window_matches_duckdb_fixture(tmp_path):
    from ocr_sam_project_ray.ops.window import (
        SQL_EVENTS_RANGE_WINDOW, events_range_window,
    )

    # dense tie/boundary mix, negative values included
    rows, eid = [], 0
    for u in range(1, 5):
        for k in range(12):
            eid += 1
            mins = (k * 17 + u * 3) % 90
            rows.append(
                (eid, f"2024-01-01 0{mins // 60}:{mins % 60:02d}", u,
                 "view", (k - 5) * 1.235)
            )
    sf = _events_fixture(tmp_path, rows)
    got = _norm(events_range_window(sf).to_pandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')")
    exp = _norm(con.sql(SQL_EVENTS_RANGE_WINDOW).df())
    pd.testing.assert_frame_equal(got, exp)


def test_range_window_matches_duckdb_corpus():
    from ocr_sam_project_ray.ops.window import (
        SQL_EVENTS_RANGE_WINDOW, events_range_window,
    )

    got = _norm(events_range_window(SF).to_pandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    exp = _norm(con.sql(SQL_EVENTS_RANGE_WINDOW).df())
    pd.testing.assert_frame_equal(got, exp)


def test_range_window_partition_invariance(tmp_path):
    from ocr_sam_project_ray.ops.window import events_range_window

    rows = [(i, f"2024-01-01 {i % 24:02d}:{(i * 7) % 60:02d}", i % 5,
             "view", (i - 30) * 0.77) for i in range(1, 151)]
    sf = _events_fixture(tmp_path, rows)
    a = _norm(events_range_window(sf, num_partitions=1).to_pandas())
    b = _norm(events_range_window(sf, num_partitions=7).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_range_window_exact_boundary_fuzz(tmp_path):
    """Seeded random fixtures with events planted EXACTLY one horizon
    apart (the closed-left frame boundary) and same-ts ties — every
    fixture must match DuckDB bit-for-bit."""
    import numpy as np

    from ocr_sam_project_ray.ops.window import (
        SQL_EVENTS_RANGE_WINDOW, events_range_window,
    )

    rng = np.random.default_rng(42)
    for trial in range(4):
        rows, eid = [], 0
        for u in range(1, 4):
            base = int(rng.integers(0, 3600))
            for k in range(20):
                eid += 1
                # mix: exact 1h multiples (boundary), ties, random
                kind = int(rng.integers(0, 3))
                if kind == 0:
                    sec = base + 3600 * int(rng.integers(0, 3))
                elif kind == 1 and rows:
                    sec = int(rng.integers(0, 7200))
                else:
                    sec = int(rng.integers(0, 7200))
                ts = pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=sec)
                rows.append((eid, str(ts), u, "view",
                             float(rng.integers(-500, 500)) / 7))
        d = tmp_path / f"t{trial}"
        d.mkdir()
        sf = _events_fixture(d, rows)
        got = _norm(events_range_window(sf).to_pandas())
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
        exp = _norm(con.sql(SQL_EVENTS_RANGE_WINDOW).df())
        pd.testing.assert_frame_equal(got, exp)


def test_range_window_empty_events(tmp_path):
    from ocr_sam_project_ray.ops.window import events_range_window

    sf = _events_fixture(tmp_path, [])
    assert events_range_window(sf).count() == 0
