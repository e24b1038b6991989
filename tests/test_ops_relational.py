"""Relational pipelines vs in-process DuckDB (same SQL the driver oracle
uses), at sf0.001 for speed."""

import duckdb
import pytest

from ocr_sam_project_ray.ops import relational as R

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for v in ("customer", "nation", "orders", "lineitem", "events"):
        c.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{SF}/{v}.parquet')")
    return c


def _cmp(got, sql, con, sort_cols):
    exp = con.sql(sql).df()
    g = got.sort_values(sort_cols).reset_index(drop=True)
    e = exp.sort_values(sort_cols).reset_index(drop=True)
    assert list(g.columns) == list(e.columns), (list(g.columns), list(e.columns))
    assert len(g) == len(e)
    for c in g.columns:
        assert list(g[c]) == list(e[c]), c


def test_q1(con):
    _cmp(R.q1_pricing_summary(SF), R.SQL_Q1.format(cutoff=R.CUTOFF_DATE), con,
         ["l_returnflag", "l_linestatus"])


def test_q3(con):
    _cmp(R.q3_top_orders(SF),
         R.SQL_Q3.format(segment=R.SEGMENT, cutoff=R.CUTOFF_DATE, k=10), con,
         ["l_orderkey"])


def test_nation_counts(con):
    _cmp(R.nation_counts_join(SF), R.SQL_NATION_COUNTS, con, ["n_name"])


def test_top_events(con):
    _cmp(R.top_events(SF), R.SQL_TOP_EVENTS.format(k=20), con, ["event_id"])


def test_events_hourly(con):
    _cmp(R.events_hourly(SF), R.SQL_EVENTS_HOURLY, con, ["user_id", "window_id"])


def test_user_sessions(con):
    _cmp(R.user_sessions(SF).to_pandas(),
         R.SQL_USER_SESSIONS.format(gap=R.SESSION_GAP_US), con, ["user_id"])


def test_events_asof_orders(con):
    _cmp(R.events_asof_orders(SF).to_pandas(), R.SQL_EVENTS_ASOF, con,
         ["event_id"])


def test_hot_key_guard_caps_groups_not_oom(con):
    """A key above max_group_rows is record-and-skipped (counted via the
    stats actor), the remaining keys stay EXACT."""
    import ray as _ray

    from ocr_sam_project_ray.ops.guards import GroupCapStats

    baseline = R.user_sessions(SF).to_pandas().sort_values("user_id")
    # pick a cap below the busiest user's event count
    cap = int(baseline.n_events.max()) - 1
    hot_users = set(baseline[baseline.n_events > cap].user_id)
    assert hot_users  # the cap must actually bite in this fixture

    stats = GroupCapStats.remote()
    got = (
        R.user_sessions(SF, max_group_rows=cap, cap_stats=stats)
        .to_pandas()
        .sort_values("user_id")
    )
    rep = _ray.get(stats.get.remote())
    assert set(baseline.user_id) - set(got.user_id) == hot_users
    assert rep["capped_groups"] == len(hot_users)
    assert rep["capped_rows"] == int(
        baseline[baseline.user_id.isin(hot_users)].n_events.sum()
    )
    kept = baseline[~baseline.user_id.isin(hot_users)].reset_index(drop=True)
    got = got.reset_index(drop=True)
    assert got.n_sessions.tolist() == kept.n_sessions.tolist()

    # as-of join honors the same guard (events+orders rows count together)
    stats2 = GroupCapStats.remote()
    asof = R.events_asof_orders(
        SF, max_group_rows=cap, cap_stats=stats2
    ).to_pandas()
    rep2 = _ray.get(stats2.get.remote())
    assert rep2["capped_groups"] >= len(hot_users)
    full = R.events_asof_orders(SF).to_pandas()
    assert len(asof) < len(full)


def test_top_events_per_user(con):
    _cmp(R.top_events_per_user(SF),
         R.SQL_TOP_EVENTS_PER_USER.format(k=3), con,
         ["user_id", "event_id"])


def test_events_range_join_matches_duckdb():
    import duckdb

    from ocr_sam_project_ray.ops.relational import (
        SQL_EVENTS_RANGE_JOIN, _bands_sql_values, events_range_join,
    )

    got = events_range_join(SF)
    sql = SQL_EVENTS_RANGE_JOIN.format(bands=_bands_sql_values()).replace(
        "FROM events", f"FROM read_parquet('{SF}/events.parquet')"
    )
    exp = duckdb.sql(sql).df()
    assert got.band_id.tolist() == exp.band_id.tolist()
    assert got.n_events.tolist() == exp.n_events.tolist()
    assert got.value_cents.tolist() == exp.value_cents.tolist()


def test_events_hopping_matches_duckdb():
    import duckdb

    from ocr_sam_project_ray.ops.relational import (
        SQL_EVENTS_HOPPING, events_hopping,
    )

    got = events_hopping(SF)
    sql = SQL_EVENTS_HOPPING.replace(
        "FROM events", f"FROM read_parquet('{SF}/events.parquet')"
    )
    exp = duckdb.sql(sql).df()
    assert len(got) == len(exp)
    assert got.n_events.tolist() == exp.n_events.tolist()
    assert got.value_cents.tolist() == exp.value_cents.tolist()
    # every event lands in exactly TWO windows (the 2h/1h overlap factor)
    n_events = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert got.n_events.sum() == 2 * n_events


def test_range_join_excludes_out_of_range(tmp_path):
    """Values outside every band fall out of the join exactly as the SQL
    BETWEEN join drops them (negative + above-top values)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import duckdb

    from ocr_sam_project_ray.ops.relational import (
        SQL_EVENTS_RANGE_JOIN, _bands_sql_values, events_range_join,
    )

    d = tmp_path / "rj"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(6), pa.int64()),
                "ts": pa.array([0] * 6, pa.timestamp("us")),
                "user_id": pa.array([1] * 6, pa.int64()),
                "event_type": ["x"] * 6,
                "value": pa.array([-5.0, 0.0, 99.99, 100.0, 5000.0, 2e9],
                                  pa.float64()),
                "props": ["{}"] * 6,
            }
        ),
        str(d / "events.parquet"),
    )
    got = events_range_join(str(d))
    sql = SQL_EVENTS_RANGE_JOIN.format(bands=_bands_sql_values()).replace(
        "FROM events", f"FROM read_parquet('{d}/events.parquet')"
    )
    exp = duckdb.sql(sql).df()
    assert got.band_id.tolist() == exp.band_id.tolist()
    assert got.n_events.tolist() == exp.n_events.tolist()
    assert got.value_cents.tolist() == exp.value_cents.tolist()
    assert got.n_events.sum() == 4  # -5 and 2e9 dropped


def test_range_join_non_contiguous_bands_gap_excluded(tmp_path, monkeypatch):
    """With a GAP between bands ([0,100) then [500,2000)), values in the gap
    must fall out of the join (SQL BETWEEN semantics), not be assigned to
    the band below — the operator is documented as the general pattern for
    arbitrary interval tables."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import duckdb

    from ocr_sam_project_ray.ops import relational as rel

    gap_bands = [(1, 0.0, 100.0), (3, 500.0, 2000.0)]
    monkeypatch.setattr(rel, "VALUE_BANDS", gap_bands)

    d = tmp_path / "rjg"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(7), pa.int64()),
                "ts": pa.array([0] * 7, pa.timestamp("us")),
                "user_id": pa.array([1] * 7, pa.int64()),
                "event_type": ["x"] * 7,
                # 100.0, 250.0, 499.99 sit in the gap and must vanish
                "value": pa.array(
                    [50.0, 100.0, 250.0, 499.99, 500.0, 1999.0, 2000.0],
                    pa.float64(),
                ),
                "props": ["{}"] * 7,
            }
        ),
        str(d / "events.parquet"),
    )
    got = rel.events_range_join(str(d))
    sql = rel.SQL_EVENTS_RANGE_JOIN.format(bands=rel._bands_sql_values()).replace(
        "FROM events", f"FROM read_parquet('{d}/events.parquet')"
    )
    exp = duckdb.sql(sql).df()
    assert got.band_id.tolist() == exp.band_id.tolist() == [1, 3]
    assert got.n_events.tolist() == exp.n_events.tolist() == [1, 2]
    assert got.value_cents.tolist() == exp.value_cents.tolist()
