import numpy as np
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.contamination import (
    benchmark_ngram_hashes, drop_contaminated, scan_contamination,
)

BENCH = [
    "what is the capital of france and why does it matter",
    "solve for x in the quadratic equation shown above today",
]


def _docs():
    planted = ("intro text " + BENCH[0] + " outro text")
    return pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            planted,                                  # contaminated (full item)
            "what is the capital of france and why",  # one 8-gram of item 0
            "a totally unrelated clean document about ray data pipelines",
            "short doc",                              # < n words → no grams
        ],
    })


def test_benchmark_hashes_sorted_unique():
    ref = benchmark_ngram_hashes(BENCH, 8)
    assert ref.size > 0
    assert np.all(np.diff(ref.view(np.uint64)) > 0)
    assert benchmark_ngram_hashes(["too short"], 8).size == 0


def test_scan_contamination(ray_session):
    ds = ray.data.from_arrow(_docs())
    out = scan_contamination(ds, BENCH, n=8).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "contaminated"])
    assert bool(out.loc[2, "contaminated"])       # single overlapping 8-gram
    assert not bool(out.loc[3, "contaminated"])   # no false positive
    assert not bool(out.loc[4, "contaminated"])   # gram-less doc never flags
    assert out.loc[4, "n_grams"] == 0
    # the fully planted doc contains strictly more benchmark grams
    assert out.loc[1, "n_contaminated"] > out.loc[2, "n_contaminated"]


def test_drop_contaminated(ray_session):
    ds = ray.data.from_arrow(_docs())
    kept = drop_contaminated(ds, BENCH, n=8).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [3, 4]
    # empty benchmark set drops nothing
    all_kept = drop_contaminated(ds, [], n=8).to_pandas()
    assert len(all_kept) == 4
