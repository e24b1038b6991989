"""Retry operator: classified backoff parity with the reference taxonomy
(ocr_service.py:448-502), whole-batch-then-per-row degradation, poison-row
capture, and pipeline wiring."""

import pyarrow as pa
import pytest

import ray.data

from ocr_sam_project_ray.ops.retry import (
    FatalError, RetryableError, RetryPolicy, wait_for, with_retries,
)


def _batch(ids):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"t{i}" for i in ids], pa.string()),
        }
    )


def _ok_kernel(batch: pa.Table) -> pa.Table:
    return batch.append_column(
        "out", pa.array([t.upper() for t in batch["text"].to_pylist()], pa.string())
    )


def test_backoff_table_parity():
    # exact constants from ocr_service.py:463-502
    assert wait_for("capacity_exceeded", 0) == 60
    assert wait_for("capacity_exceeded", 10) == 300       # capped at 5 min
    assert wait_for("rate_limit", 2) == 60                # 30 + 2*15
    assert wait_for("rate_limit", 10) == 120              # capped at 2 min
    assert wait_for("server_error", 1) == 40              # 20 + 1*20
    assert wait_for("server_error", 9) == 180             # capped at 3 min
    assert wait_for("unknown_error", 1) == 45             # 30 + 1*15


def test_transient_failure_recovers_with_classified_delays():
    calls = {"n": 0}
    delays = []

    def flaky(batch):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RetryableError("429 rate limited", "rate_limit")
        return _ok_kernel(batch)

    policy = RetryPolicy(max_attempts=3, time_scale=1.0,
                         sleeper=delays.append)
    out = with_retries(flaky, policy)(_batch([1, 2]))
    assert out["out"].to_pylist() == ["T1", "T2"]
    assert out["success"].to_pylist() == [True, True]
    assert delays == [30.0, 45.0]  # rate_limit: 30+0*15 then 30+1*15


def test_non_retryable_fails_fast_no_sleep():
    delays = []

    def bad(batch):
        raise FatalError("401 unauthorized", "auth_error")

    policy = RetryPolicy(max_attempts=5, time_scale=1.0, sleeper=delays.append)
    out = with_retries(bad, policy)(_batch([7]))
    assert delays == []  # never slept
    assert out["success"].to_pylist() == [False]
    assert out["error_class"].to_pylist() == ["auth_error"]
    assert "401" in out["error"].to_pylist()[0]


def test_per_row_isolation_only_poisons_bad_rows():
    def picky(batch):
        if any(i % 2 == 0 for i in batch["doc_id"].to_pylist()):
            raise FatalError("payload too large", "payload_too_large")
        return _ok_kernel(batch)

    out = with_retries(picky, RetryPolicy(max_attempts=2, sleeper=lambda s: None))(
        _batch([1, 2, 3, 4, 5])
    )
    by_id = dict(zip(out["doc_id"].to_pylist(), out["success"].to_pylist()))
    assert by_id == {1: True, 2: False, 3: True, 4: False, 5: True}
    cls = dict(zip(out["doc_id"].to_pylist(), out["error_class"].to_pylist()))
    assert cls[2] == "payload_too_large" and cls[1] == ""


def test_poison_false_raises_after_budget():
    def always(batch):
        raise RetryableError("503", "server_error")

    policy = RetryPolicy(max_attempts=2, sleeper=lambda s: None)
    with pytest.raises(FatalError) as ei:
        with_retries(always, policy, poison=False)(_batch([1]))
    assert "server_error" in str(ei.value)


def test_retry_inside_ray_map_batches():
    """Distributed: the retry loop runs inside each task; per-process call
    counters make every batch fail once then succeed (the transient case),
    while one doc id is a permanent poison row."""
    def flaky(batch):
        # self-contained (workers can't import the test module)
        import pyarrow as _pa

        from ocr_sam_project_ray.ops import retry as _r

        key = ("k", batch["doc_id"][0].as_py())
        n = _r.__dict__.setdefault("_TEST_CALLS", {})
        n[key] = n.get(key, 0) + 1
        if n[key] == 1:
            raise _r.RetryableError("first attempt always fails", "server_error")
        if 13 in batch["doc_id"].to_pylist():
            raise _r.FatalError("cursed row", "bad_request")
        return batch.append_column(
            "out",
            _pa.array([t.upper() for t in batch["text"].to_pylist()], _pa.string()),
        )

    ds = ray.data.from_arrow(_batch(list(range(20))))
    policy = RetryPolicy(max_attempts=4, sleeper=lambda s: None)
    out = (
        ds.map_batches(
            with_retries(flaky, policy), batch_format="pyarrow", batch_size=5
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert len(out) == 20
    assert (~out.success).sum() == 1
    assert out[~out.success].doc_id.tolist() == [13]
    assert out[out.success].out.tolist() == [
        f"T{i}".upper() for i in range(20) if i != 13
    ]


def test_pipeline_wiring_preserves_output():
    """retry_policy wired through PipelineConfig must not change the
    extraction results — only add the error_class column."""
    from ocr_sam_project_ray.pipelines.extraction import (
        PipelineConfig, run_extraction,
    )

    SF = "/root/testdata/sf0.001"
    base = (
        run_extraction(SF, PipelineConfig(dedup_partitions=2))
        .select_columns(["doc_id", "extracted_text", "success"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    policy = RetryPolicy(max_attempts=2, sleeper=lambda s: None)
    with_r = run_extraction(
        SF, PipelineConfig(dedup_partitions=2, retry_policy=policy)
    )
    assert "error_class" in with_r.schema().names
    got = (
        with_r.select_columns(["doc_id", "extracted_text", "success"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, base)


def test_stable_dlq_schema_keep_columns_and_output_schema():
    """With keep_columns + output_schema, all-poison and all-success blocks
    share ONE schema, and poison rows drop the payload column (blobs never
    travel past the failing stage)."""
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("out", pa.string())]
    )

    def kernel(batch: pa.Table) -> pa.Table:
        if 13 in batch["doc_id"].to_pylist():
            raise FatalError("bad payload")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "out": pa.array(
                    [t.upper() for t in batch["text"].to_pylist()], pa.string()
                ),
            }
        )

    big_payload = pa.table(
        {
            "doc_id": pa.array([13, 14], pa.int64()),
            "text": pa.array(["x", "y"], pa.string()),
            "payload": pa.array([b"\x00" * 64, b"\x01" * 64], pa.binary()),
        }
    )
    ok_payload = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a", "b"], pa.string()),
            "payload": pa.array([b"\x02" * 64, b"\x03" * 64], pa.binary()),
        }
    )
    wrapped = with_retries(
        kernel,
        RetryPolicy(max_attempts=1, sleeper=lambda s: None),
        keep_columns=["doc_id"],
        output_schema=out_schema,
    )
    mixed = wrapped(big_payload)   # row 13 poisons, row 14 succeeds
    clean = wrapped(ok_payload)    # all succeed
    assert mixed.schema.names == clean.schema.names
    assert "payload" not in mixed.schema.names
    assert set(mixed.schema.names) == {"doc_id", "out", "success", "error",
                                       "error_class"}
    md = mixed.to_pydict()
    assert md["success"] == [False, True]
    assert md["out"] == [None, "Y"]
    assert clean.to_pydict()["success"] == [True, True]
