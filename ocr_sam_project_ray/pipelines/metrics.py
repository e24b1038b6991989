"""Per-stage metrics extraction from an executed Dataset."""

from __future__ import annotations

import re


def stage_metrics(ds) -> dict:
    """Condense ``ds.stats()`` into {stage: wall_time_s}; empty dict when the
    executor exposes no stats (some consume paths)."""
    try:
        raw = ds.stats() or ""
    except Exception:
        return {}
    out: dict[str, float] = {}
    current = None
    for line in raw.splitlines():
        m = re.match(r"Operator \d+ (\S+)", line.strip())
        if m:
            current = m.group(1)
            continue
        m = re.search(r"\* Total time: ([\d.]+)s", line)
        if m and current:
            out[current] = float(m.group(1))
            current = None
    return out
