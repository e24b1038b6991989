"""Per-error-class retry/backoff wrapper for ``map_batches`` kernels.

Behavior parity with the reference's API-error taxonomy
(src/services/ocr_service.py:448-502): each error is CLASSIFIED, each class
has its own linear backoff with a cap, non-retryable classes fail fast, and
work that still fails after the attempt budget becomes a POISON ROW carried
in the output (the DLQ analog — reference template.yaml:88-90 routes to a
DLQ after 3 deliveries) instead of killing the job.

Scale rationale: a 100 TB pipeline with ANY remote stage (OCR API, model
endpoint, object store hiccups) sees transient errors constantly; without
per-class retry the streaming executor surfaces the first transient as a
job failure, and without poison capture one bad row costs the whole block.

The wrapper retries the WHOLE batch first (cheap, the common transient
case); if the batch keeps failing it degrades to per-row isolation so only
truly poisonous rows are sacrificed — mirroring the reference's one-document
granularity without paying per-row overhead on the happy path.

``sleeper`` is injectable so tests run instantly; ``time_scale`` shrinks
the reference's second-scale waits for in-process kernels.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import pyarrow as pa

# (wait_base, wait_per_attempt, wait_cap) per class —
# exact constants from ocr_service.py:463-502
BACKOFF_TABLE: dict[str, tuple[int, int, int]] = {
    "capacity_exceeded": (60, 30, 300),
    "rate_limit": (30, 15, 120),
    "server_error": (20, 20, 180),
    "temporary_bad_request": (15, 10, 10**9),  # uncapped in the reference
    "unknown_error": (30, 15, 10**9),
}

NON_RETRYABLE = {
    "auth_error", "bad_request", "payload_too_large", "client_error", "fatal",
}


class RetryableError(Exception):
    """Raise from a kernel to request a retry with an explicit class."""

    def __init__(self, message: str, error_class: str = "unknown_error"):
        super().__init__(message)
        self.error_class = error_class


class FatalError(Exception):
    """Raise from a kernel to fail the row/batch without retrying."""

    def __init__(self, message: str, error_class: str = "fatal"):
        super().__init__(message)
        self.error_class = error_class


def default_classify(exc: Exception) -> str:
    """Exception → error class. Kernel-raised Retryable/FatalError carry
    their own class; unknown exceptions retry conservatively (the
    reference's else-branch)."""
    if isinstance(exc, (RetryableError, FatalError)):
        return exc.error_class
    return "unknown_error"


def wait_for(error_class: str, attempt: int) -> float:
    base, per, cap = BACKOFF_TABLE.get(error_class, BACKOFF_TABLE["unknown_error"])
    return float(min(base + attempt * per, cap))


@dataclass
class RetryPolicy:
    max_attempts: int = 3
    classify: Callable[[Exception], str] = default_classify
    # multiply reference waits (seconds) by this — keep tiny for local
    # kernels, 1.0 for real remote services
    time_scale: float = 0.0
    sleeper: Callable[[float], None] = time.sleep
    retryable: frozenset = frozenset(BACKOFF_TABLE)

    def delay(self, error_class: str, attempt: int) -> float:
        return wait_for(error_class, attempt) * self.time_scale


def _poison_table(
    batch: pa.Table,
    error_class: str,
    message: str,
    keep_columns: Optional[list[str]] = None,
    output_schema: Optional[pa.Schema] = None,
) -> pa.Table:
    """Mark every row of ``batch`` as poison: success=False + error columns.

    By default all input columns ride through — which means poison rows keep
    the kernel's INPUT schema (payload blobs included) while success rows
    carry the OUTPUT schema. For a stable Dataset schema pass
    ``keep_columns`` (project poison rows to key columns only — the DLQ
    shape, dropping payloads so blobs never travel past the failing stage)
    and/or ``output_schema`` (pad poison rows to the kernel's output schema
    with nulls so all-poison and all-success blocks agree exactly)."""
    n = len(batch)
    if keep_columns is not None:
        batch = batch.select([c for c in keep_columns if c in batch.column_names])
    if output_schema is not None:
        batch = _conform(batch, output_schema)
    for name in ("success", "error", "error_class"):
        if name in batch.column_names:
            batch = batch.drop_columns([name])
    return (
        batch.append_column("success", pa.array([False] * n, pa.bool_()))
        .append_column("error", pa.array([message[:500]] * n, pa.string()))
        .append_column("error_class", pa.array([error_class] * n, pa.string()))
    )


def _conform(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``batch`` onto exactly ``schema``'s columns — present columns
    are carried (cast if needed), absent ones become typed nulls — so every
    emitted block shares one schema regardless of its success/poison mix."""
    cols = {}
    for f in schema:
        if f.name in batch.column_names:
            col = batch[f.name]
            if col.type != f.type:
                col = col.cast(f.type)
            cols[f.name] = col
        else:
            cols[f.name] = pa.nulls(len(batch), f.type)
    return pa.table(cols)


def _mark_ok(batch: pa.Table) -> pa.Table:
    """Give successful rows the same (success, error, error_class) schema
    so poison rows and good rows union into one table."""
    n = len(batch)
    out = batch
    if "success" not in out.column_names:
        out = out.append_column("success", pa.array([True] * n, pa.bool_()))
    if "error" not in out.column_names:
        out = out.append_column("error", pa.array([""] * n, pa.string()))
    if "error_class" not in out.column_names:
        out = out.append_column("error_class", pa.array([""] * n, pa.string()))
    return out


def _attempt_with_retries(
    kernel: Callable[[pa.Table], pa.Table], batch: pa.Table, policy: RetryPolicy
):
    """Run kernel on batch with the per-class retry loop. Returns
    (result, None) on success or (None, (error_class, message)) when the
    budget is exhausted or the class is non-retryable."""
    last: Optional[tuple[str, str]] = None
    for attempt in range(policy.max_attempts):
        try:
            return kernel(batch), None
        except Exception as exc:  # noqa: BLE001 — classification decides
            cls = policy.classify(exc)
            last = (cls, str(exc))
            if cls not in policy.retryable:
                return None, last
            if attempt + 1 < policy.max_attempts:
                policy.sleeper(policy.delay(cls, attempt))
    return None, last


def with_retries(
    kernel: Callable[[pa.Table], pa.Table],
    policy: Optional[RetryPolicy] = None,
    poison: bool = True,
    keep_columns: Optional[list[str]] = None,
    output_schema: Optional[pa.Schema] = None,
) -> Callable[[pa.Table], pa.Table]:
    """Wrap a batch kernel with classified retry + poison-row capture.

    Whole-batch retries first; a batch that exhausts its budget (or hits a
    non-retryable class) degrades to per-row isolation, and rows that STILL
    fail are emitted as poison rows (success=False, error, error_class)
    rather than raised — unless ``poison=False``, in which case the last
    error propagates (fail-the-job mode).

    Schema stability: without the optional args, poison rows keep the
    INPUT schema while success rows keep the OUTPUT schema, so downstream
    consumers must split on ``success`` before relying on kernel-output
    columns. Pass ``keep_columns`` (stable DLQ keys — poison rows drop
    every other input column, so payload blobs never travel past the
    failing stage) and/or ``output_schema`` (poison rows padded with typed
    nulls, success rows projected) to make every emitted block share one
    schema."""
    policy = policy or RetryPolicy()

    def _ok(result: pa.Table) -> pa.Table:
        if output_schema is not None:
            result = _conform(result, output_schema)
        return _mark_ok(result)

    def _bad(rows: pa.Table, error_class: str, message: str) -> pa.Table:
        return _poison_table(rows, error_class, message,
                             keep_columns=keep_columns,
                             output_schema=output_schema)

    def wrapped(batch: pa.Table) -> pa.Table:
        result, err = _attempt_with_retries(kernel, batch, policy)
        if err is None:
            return _ok(result) if poison else result
        if not poison:
            raise FatalError(
                f"{err[0]}: {err[1]} (after {policy.max_attempts} attempts)",
                error_class=err[0],
            )
        if len(batch) == 1:
            return _bad(batch, *err)
        # degrade to per-row isolation: only truly poisonous rows die
        outs = []
        for i in range(len(batch)):
            row = batch.slice(i, 1)
            r, e = _attempt_with_retries(kernel, row, policy)
            outs.append(_ok(r) if e is None else _bad(row, *e))
        return pa.concat_tables(outs, promote_options="permissive")

    return wrapped
