"""bench.py _StoreMonitor: the per-entry object-store telemetry channel
(round 5) must see real occupancy while objects are live and report
zero spill growth when nothing spills."""

import importlib.util
import os
import time

import numpy as np
import ray


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_store_monitor_sees_occupancy():
    bench = _load_bench()
    with bench._StoreMonitor() as mon:
        refs = [ray.put(np.zeros(8_000_000, dtype=np.uint8))
                for _ in range(4)]
        time.sleep(0.8)  # let the 4 Hz sampler observe the live objects
        del refs
    stats = mon.stats()
    assert stats["objstore_peak_bytes"] >= 8_000_000, stats
    assert stats["spill_bytes"] == 0, stats
    assert set(stats) == {"objstore_peak_bytes", "spill_bytes"}
