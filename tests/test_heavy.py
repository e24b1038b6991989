import duckdb
import numpy as np
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.heavy import (
    CMS_WIDTH, cms_estimate, cms_topk, cms_update, sql_top_tokens,
    top_tokens,
)

SF = "/root/testdata/sf0.001"


def _zipf_docs(n_docs: int = 60, seed: int = 7) -> pa.Table:
    """Zipfian token corpus: token ``t{i}`` has frequency ~ 1/i."""
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.5, size=(n_docs, 40)).clip(max=500)
    texts = [" ".join(f"t{r}" for r in row) for row in ranks]
    return pa.table(
        {"doc_id": pa.array(range(n_docs), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


def _exact_counts(tbl: pa.Table):
    from collections import Counter

    c = Counter()
    for t in tbl["text"].to_pylist():
        c.update(t.split())
    return c


def test_top_tokens_matches_duckdb_oracle():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    got = top_tokens(ds, k=15, num_partitions=4).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(sql_top_tokens(k=15)).df()
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()


def test_top_tokens_partition_invariant():
    tbl = _zipf_docs()
    a = top_tokens(ray.data.from_arrow(tbl), k=10).to_pandas()
    b = top_tokens(
        ray.data.from_arrow(tbl).repartition(9), k=10, num_partitions=3
    ).to_pandas()
    assert a.values.tolist() == b.values.tolist()


def test_cms_never_undercounts_and_bounds_overestimate():
    tbl = _zipf_docs(n_docs=120)
    truth = _exact_counts(tbl)
    n_total = sum(truth.values())
    res = cms_topk(ray.data.from_arrow(tbl), k=10)
    assert res["total_tokens"] == n_total
    eps_bound = (np.e / CMS_WIDTH) * n_total
    for tok, est in res["topk"]:
        assert est >= truth[tok]                       # CMS property
        assert est - truth[tok] <= max(1.0, eps_bound)  # w.h.p. bound


def test_cms_topk_recall_on_zipf_matches_exact():
    tbl = _zipf_docs(n_docs=120)
    truth = _exact_counts(tbl)
    want = [t for t, _ in
            sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]]
    res = cms_topk(ray.data.from_arrow(tbl), k=10)
    got = [t for t, _ in res["topk"]]
    assert set(got) == set(want)


def test_cms_merge_is_order_insensitive():
    tbl = _zipf_docs(n_docs=80)
    a = cms_topk(ray.data.from_arrow(tbl), k=8)
    b = cms_topk(ray.data.from_arrow(tbl).repartition(7), k=8)
    assert a["topk"] == b["topk"]
    assert a["total_tokens"] == b["total_tokens"]


def test_cms_update_estimate_roundtrip():
    from collections import Counter

    mat = np.zeros((4, CMS_WIDTH), dtype=np.uint64)
    counts = Counter({"alpha": 5, "beta": 3, "gamma": 1})
    cms_update(mat, counts, CMS_WIDTH)
    for tok, c in counts.items():
        assert cms_estimate(mat, tok) >= c
    # merge = elementwise sum equals single-pass build of the union
    m1 = np.zeros((4, CMS_WIDTH), dtype=np.uint64)
    m2 = np.zeros((4, CMS_WIDTH), dtype=np.uint64)
    cms_update(m1, Counter({"alpha": 2, "gamma": 1}), CMS_WIDTH)
    cms_update(m2, Counter({"alpha": 3, "beta": 3}), CMS_WIDTH)
    assert ((m1 + m2) == mat).all()
