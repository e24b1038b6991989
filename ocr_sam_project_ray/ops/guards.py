"""Hot-key guards for grouped ordered-log operators.

``user_sessions`` / ``events_cumsum`` / ``events_asof_orders`` rely on the
documented partitioning assumption that ONE key's rows fit ONE group. At
100× scale a single hot user (a bot, a test account) breaks that silently:
the group materializes in one worker's heap and OOMs the task. The guard
makes the failure OBSERVABLE instead of fatal — groups above
``max_group_rows`` are skipped (record-and-skip, the same philosophy as
ops/retry.py's poison rows and the LSH hot-bucket counter) and counted via
a zero-CPU stats actor the caller can read after consuming the result.

The cap is OFF by default (exact results, the oracle-checked contract);
production pipelines at scale opt in with an explicit threshold.
"""

from __future__ import annotations

from typing import Optional

import ray


@ray.remote(num_cpus=0)
class GroupCapStats:
    """Counts (capped_groups, capped_rows) dropped by a hot-key guard —
    the no-silent-caps rule: skipped work must be quantified."""

    def __init__(self):
        self.capped_groups = 0
        self.capped_rows = 0

    def add(self, groups: int, rows: int) -> None:
        self.capped_groups += groups
        self.capped_rows += rows

    def get(self) -> dict:
        return {
            "capped_groups": self.capped_groups,
            "capped_rows": self.capped_rows,
        }


def group_overflows(
    g,
    max_group_rows: Optional[int],
    cap_stats: Optional["ray.actor.ActorHandle"],
) -> bool:
    """True when the group exceeds the cap (and records the skip). Call at
    the top of a map_groups kernel; on True return an empty, schema-stable
    frame instead of processing the group."""
    if max_group_rows is None or len(g) <= max_group_rows:
        return False
    if cap_stats is not None:
        cap_stats.add.remote(1, len(g))
    return True
