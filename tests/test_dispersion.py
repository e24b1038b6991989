"""Per-group robust dispersion (median/quartiles/IQR) vs DuckDB and a
hand case pinning the quantile_disc rank rule on even counts."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_sam_project_ray.ops.dispersion import (
    SQL_EVENTS_VALUE_DISPERSION, events_value_dispersion,
)

SF = "/root/testdata/sf0.001"


def test_matches_duckdb():
    got = events_value_dispersion(SF).sort_values("event_type").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = con.sql(SQL_EVENTS_VALUE_DISPERSION).df()
    for c in exp.columns:
        if str(exp[c].dtype).startswith(("int", "uint")):
            exp[c] = exp[c].astype("int64")
            got[c] = got[c].astype("int64")
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_hand_case_even_count_disc_rule(tmp_path):
    # 4 values [1.00, 2.00, 3.00, 10.00]: quantile_disc takes ELEMENTS
    # (0-based rank ceil(q*4)-1): p25=rank0=100, p50=rank1=200,
    # p75=rank2=300 — no interpolation, outlier 10.00 never leaks in
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([pd.Timestamp("2024-01-01")] * 4,
                           pa.timestamp("us")),
            "user_id": pa.array([1] * 4, pa.int64()),
            "event_type": pa.array(["view"] * 4, pa.string()),
            "value": pa.array([1.0, 2.0, 3.0, 10.0], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_value_dispersion(str(tmp_path)).iloc[0]
    assert (out.p25, out.p50, out.p75, out.iqr) == (100, 200, 300, 200)
    assert out.n == 4