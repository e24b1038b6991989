"""Evidence for the one-time-partitioning pagerank plan (round-4 judge
directive #2): with the host count FIXED, grow the edge table 4x and
measure the MARGINAL per-iteration wall of ``_pagerank_distributed``
as the slope (wall(iters=18) - wall(iters=2)) / 16, min of 2 reps per
level (the one-time setup dominates a single run, so a large iteration
delta is needed to isolate the per-round cost).

Under the old plan the static edge table flowed through a hash shuffle
every iteration, so the marginal cost scaled with |E|. Under the
one-time plan only (host, rank) rows move per round; the per-iteration
marginal should be dominated by the |V|-sized rank exchange plus the
local (pinned, zero-copy) edge fold — i.e. grow far slower than |E|.
For a direct floor on what the old plan paid per round, the tool also
times ONE keyed hash repartition of each edge table.

Usage: python tools/pagerank_iter_scale.py [n_hosts] [edges_lo] [edges_hi]
Prints one JSON line. Fixtures cache under /tmp/ocr_sam_ray_sf1/iterscale.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260819
CACHE = "/tmp/ocr_sam_ray_sf1/iterscale"


def ensure_edges(n_hosts: int, n_edges: int) -> str:
    path = os.path.join(CACHE, f"h{n_hosts}_e{n_edges}.parquet")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(SEED)
    src = rng.integers(0, n_hosts, size=n_edges)
    # ring edge guarantees every host appears as a source at least once
    src[:n_hosts] = np.arange(n_hosts)
    dst = (src + 1 + rng.integers(0, n_hosts - 1, size=n_edges)) % n_hosts
    tbl = pa.table({
        "src_host": pa.array([f"h{i}.example" for i in src], pa.string()),
        "dst_host": pa.array([f"h{i}.example" for i in dst], pa.string()),
        "n_links": pa.array(np.ones(n_edges, np.int64)),
    })
    os.makedirs(CACHE, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp, row_group_size=250_000)
    os.replace(tmp, path)
    return path


def main() -> int:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    e_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    e_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4_000_000
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    import ray.data

    from ocr_sam_project_ray.context import configure_data_context
    from ocr_sam_project_ray.ops.linkgraph import _pagerank_distributed

    configure_data_context()
    nparts = 8
    out: dict = {"n_hosts": n_hosts, "num_partitions": nparts,
                 "num_cpus": ncpu}
    for label, n_edges in (("lo", e_lo), ("hi", e_hi)):
        path = ensure_edges(n_hosts, n_edges)
        edges = ray.data.read_parquet(path).materialize()
        # the one-time setup (static bucketing) dominates a single run,
        # so the per-iteration cost is isolated as a large-delta slope
        # (18-2 = 16 extra rounds) over the min of 2 reps per level
        walls = {}
        for iters in (2, 18):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                n = _pagerank_distributed(edges, iters, nparts).count()
                best = min(best, time.time() - t0)
                assert n == n_hosts, (n, n_hosts)
            walls[iters] = best
        # the floor the OLD plan paid EVERY iteration: one keyed hash
        # repartition of the static edge table (materialize forces it —
        # count() alone is answered from metadata)
        t0 = time.time()
        edges.repartition(num_blocks=nparts, keys=["src_host"]).materialize()
        reshuffle_s = time.time() - t0
        out[label] = {
            "edge_rows": n_edges,
            "wall_iters2_s": round(walls[2], 2),
            "wall_iters18_s": round(walls[18], 2),
            "marginal_per_iter_s": round((walls[18] - walls[2]) / 16, 3),
            "edge_reshuffle_once_s": round(reshuffle_s, 2),
        }
    lo, hi = out["lo"], out["hi"]
    out["edge_growth_x"] = round(hi["edge_rows"] / lo["edge_rows"], 2)
    out["marginal_growth_x"] = round(
        hi["marginal_per_iter_s"] / max(lo["marginal_per_iter_s"], 1e-3), 2
    )
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.exit(main())
