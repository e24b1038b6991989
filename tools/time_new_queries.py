"""Time a set of queries() entries at a given tier — scratch harness for
per-op wall-time sanity at sf0.1 (bench.py stays the official surface).
Usage: python tools/time_new_queries.py [sf_dir] [num_cpus] [names...]"""

import sys
import time

import ray


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    names = sys.argv[3:]
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    qs = E.queries()
    if not names:
        names = list(qs)
    for name in names:
        t0 = time.time()
        out = qs[name](sf_dir)
        n = len(out) if hasattr(out, "__len__") else out.count()
        print(f"{name}: {time.time() - t0:.2f}s, {n} rows", flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
