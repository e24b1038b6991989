import numpy as np
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.sketch import (
    approx_count_distinct, hll_estimate, hll_merge, hll_sketch,
)

SF = "/root/testdata/sf0.001"


def test_merge_associative_commutative():
    a = hll_sketch(range(0, 500))
    b = hll_sketch(range(300, 900))
    c = hll_sketch(range(800, 1200))
    ab_c = hll_merge(hll_merge(a, b), c)
    a_bc = hll_merge(a, hll_merge(b, c))
    ba_c = hll_merge(hll_merge(b, a), c)
    assert (ab_c == a_bc).all() and (ab_c == ba_c).all()
    # merged sketch == sketch of the union
    union = hll_sketch(range(0, 1200))
    assert (ab_c == union).all()


def test_estimate_accuracy_bands():
    for n in (15, 500, 20000):
        est = hll_estimate(hll_sketch(range(n)))
        assert abs(est - n) / n < 0.05, (n, est)


def test_deterministic():
    assert (hll_sketch(["a", "b", "c"]) == hll_sketch(["a", "b", "c"])).all()


def test_distributed_matches_local_and_truth():
    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    est = approx_count_distinct(ds, "user_id")
    exact = len(set(ds.to_pandas().user_id))
    assert abs(est - exact) / exact < 0.05
    # partitioning independence: a differently-batched run gives the SAME
    # estimate (merge is order-insensitive)
    est2 = approx_count_distinct(ds.repartition(7), "user_id")
    assert est == est2
