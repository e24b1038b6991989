import numpy as np
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.qsketch import QuantileSketch, approx_quantiles

SF = "/root/testdata/sf0.001"


def _rank_error(values: np.ndarray, estimate: float, q: float) -> float:
    """|true rank of estimate - q*n| / n."""
    n = values.size
    srt = np.sort(values)
    lo = np.searchsorted(srt, estimate, "left")
    hi = np.searchsorted(srt, estimate, "right")
    target = q * n
    if lo <= target <= hi:
        return 0.0
    return min(abs(lo - target), abs(hi - target)) / n


def _bound(n: int, k: int) -> float:
    # deterministic (offset-0) compaction carries a 2x constant over the
    # randomized variant — the MRL-shape bound with that factor
    return (2.0 / k) * np.log2(n / k + 2) + 1e-9


def test_exact_when_small():
    vals = np.arange(100, dtype=np.float64)
    sk = QuantileSketch(k=512)
    sk.insert_batch(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        # no compaction happened -> quantile_disc-exact
        assert sk.quantile(q) == vals[max(0, int(np.ceil(q * 100)) - 1)]


def test_rank_error_bound_across_distributions():
    rng = np.random.default_rng(3)
    n, k = 200_000, 512
    dists = {
        "uniform": rng.uniform(0, 1, n),
        "zipf": rng.zipf(1.3, n).astype(np.float64),
        "sorted": np.arange(n, dtype=np.float64),
        "reversed": np.arange(n, dtype=np.float64)[::-1].copy(),
    }
    for name, vals in dists.items():
        sk = QuantileSketch(k=k)
        sk.insert_batch(vals)
        assert sk.n == n
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            err = _rank_error(vals, sk.quantile(q), q)
            assert err <= _bound(n, k), (name, q, err, _bound(n, k))


def test_merge_preserves_bound():
    rng = np.random.default_rng(7)
    n, k = 100_000, 512
    vals = rng.normal(0, 1, n)
    parts = np.array_split(vals, 13)
    merged = QuantileSketch(k=k)
    for p in parts:
        sk = QuantileSketch(k=k)
        sk.insert_batch(p)
        merged = merged.merge(sk)
    assert merged.n == n
    for q in (0.1, 0.5, 0.9):
        err = _rank_error(vals, merged.quantile(q), q)
        assert err <= _bound(n, k), (q, err)


def test_serialization_roundtrip():
    sk = QuantileSketch(k=64)
    sk.insert_batch(np.arange(1000, dtype=np.float64))
    rt = QuantileSketch.from_bytes(sk.to_bytes())
    assert rt.n == sk.n and rt.k == sk.k
    for q in (0.2, 0.5, 0.95):
        assert rt.quantile(q) == sk.quantile(q)


def test_distributed_fold_is_input_order_deterministic():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["n_chars"])
    a = approx_quantiles(ds, "n_chars", k=256)
    b = approx_quantiles(ds, "n_chars", k=256)
    assert a == b
    # accuracy vs the exact distribution
    vals = np.asarray(
        ds.to_pandas().n_chars.to_numpy(), dtype=np.float64)
    for q in (0.5, 0.9, 0.99):
        err = _rank_error(vals, a[f"p{int(q*100)}"], q)
        assert err <= _bound(vals.size, 256), (q, err)
