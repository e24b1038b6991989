"""Ray Data execution-context configuration for this engine.

Called by pipeline builders (idempotent). Does NOT call ray.init — sessions
are owned by the caller (driver / bench.py / test fixture).
"""

from __future__ import annotations


def configure_data_context() -> None:
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    # key-based repartition (url dedup, size buckets) needs hash shuffling
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # output is keyed by url/doc_id — never pay for ordered execution
    ctx.execution_options.preserve_order = False
    ctx.enable_progress_bars = False
