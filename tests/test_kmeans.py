"""Distributed k-means + SemDeDup: Lloyd's partial-sum fold vs a local
numpy reference (same seeds, same iterations), assignment determinism,
n_clusters=1 exactness vs the brute-force cosine kernel, recall floor on
clustered data, hot-cluster guard accounting."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ocr_sam_project_ray.ops.kmeans import (
    assign_clusters,
    kmeans_fit,
    semdedup,
    semdedup_pairs,
)


def _normalize(m):
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _blobs(n_per=40, seed=11):
    """3 well-separated clusters on the unit sphere + near-dup planted
    pairs inside each cluster."""
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0]]
    )
    vecs, ids = [], []
    vid = 0
    for c in centers:
        base = c + rng.normal(0, 0.6, size=(n_per, 4))
        for i in range(n_per):
            vecs.append(base[i])
            ids.append(vid)
            vid += 1
        # planted near-dup: tiny perturbation of the cluster's first vec
        vecs.append(base[0] + rng.normal(0, 1e-3, size=4))
        ids.append(vid)
        vid += 1
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )


def _local_lloyd(tbl, k, iters):
    m = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in
         tbl["embedding"].to_pylist()]
    )
    ids = np.asarray(tbl["vec_id"].to_pylist())
    order = np.argsort(ids)
    m, ids = m[order], ids[order]
    # same farthest-point init as the op: min-id seed, then greedy
    # min-max-cos (ties -> min id)
    seed_idx = [0]
    for _ in range(k - 1):
        max_cos = (_normalize(m) @ _normalize(m[seed_idx]).T).max(axis=1)
        seed_idx.append(int(np.lexsort((ids, max_cos))[0]))
    cents = m[seed_idx].copy()
    for _ in range(iters):
        assign = np.argmax(_normalize(m) @ _normalize(cents).T, axis=1)
        for j in range(k):
            mem = m[assign == j]
            if len(mem):
                cents[j] = mem.mean(axis=0)
    return cents


def test_fit_matches_local_reference():
    tbl = _blobs()
    got = kmeans_fit(ray.data.from_arrow(tbl).repartition(5), 3, iters=4)
    exp = _local_lloyd(tbl, 3, 4)
    # distributed partial sums reorder float additions — near-equal
    assert np.allclose(got, exp, atol=1e-9)


def test_assign_recovers_blobs():
    tbl = _blobs()
    cents = kmeans_fit(ray.data.from_arrow(tbl), 3, iters=4)
    out = assign_clusters(
        ray.data.from_arrow(tbl), cents
    ).to_pandas().sort_values("vec_id")
    # each 41-row blob maps to exactly one cluster id
    blocks = [out.cluster.iloc[i * 41:(i + 1) * 41] for i in range(3)]
    assert all(b.nunique() == 1 for b in blocks)
    assert len({b.iloc[0] for b in blocks}) == 3


def test_single_cluster_is_exact_brute_force():
    from ocr_sam_project_ray.ops.embed import cosine_near_pairs

    tbl = _blobs()
    pair_ds, skipped = semdedup_pairs(
        ray.data.from_arrow(tbl), eps=0.9999, n_clusters=1, iters=1
    )
    got = pair_ds.to_pandas().sort_values(["id_a", "id_b"])
    exp = cosine_near_pairs(
        ray.data.from_arrow(tbl), threshold=0.9999, max_id=10**9
    ).to_pandas().sort_values(["id_a", "id_b"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False,
    )
    assert skipped.count() == 0


def test_semdedup_drops_planted_dups():
    tbl = _blobs()
    kept, skipped = semdedup(
        ray.data.from_arrow(tbl), eps=0.9999, n_clusters=3, iters=4
    )
    kept_ids = set(kept.to_pandas().vec_id)
    # the planted dup of each blob (ids 40, 81, 122) loses to its original
    assert kept_ids.isdisjoint({40, 81, 122})
    assert {0, 41, 82} <= kept_ids
    assert skipped.count() == 0
    # blobs are well separated: the clustered result equals the EXACT
    # n_clusters=1 pipeline
    kept1, _ = semdedup(
        ray.data.from_arrow(tbl), eps=0.9999, n_clusters=1, iters=1
    )
    assert kept_ids == set(kept1.to_pandas().vec_id)


def test_clustered_recall_vs_brute_force():
    from ocr_sam_project_ray.ops.embed import cosine_near_pairs

    tbl = _blobs(n_per=30, seed=5)
    exact = cosine_near_pairs(
        ray.data.from_arrow(tbl), threshold=0.99, max_id=10**9
    ).to_pandas()
    pair_ds, _ = semdedup_pairs(
        ray.data.from_arrow(tbl), eps=0.99, n_clusters=3, iters=4
    )
    got = pair_ds.to_pandas()
    exact_set = set(zip(exact.id_a, exact.id_b))
    got_set = set(zip(got.id_a, got.id_b))
    assert got_set <= exact_set  # no false positives, ever
    assert len(exact_set) > 0
    # blobs are separated: within-cluster compare finds everything
    assert len(got_set & exact_set) / len(exact_set) >= 0.95


def test_hot_cluster_guard_counts():
    tbl = _blobs()
    pair_ds, skipped = semdedup_pairs(
        ray.data.from_arrow(tbl), eps=0.99, n_clusters=3, iters=2,
        max_cluster_rows=10,
    )
    sk = skipped.to_pandas()
    assert sk.n_rows.sum() == 123  # every cluster over the cap, counted
    assert pair_ds.count() == 0


def test_seed_sampling_path_is_deterministic_and_recalls():
    """Force the bounded hash-sample seeding path (sample_rows < n): the
    seeds stay deterministic (two runs identical) and the planted-dup
    contract of test_semdedup_drops_planted_dups still holds — Lloyd's
    full-corpus iterations refine whatever the sample seeded."""
    from ocr_sam_project_ray.ops.kmeans import kmeans_fit

    tbl = _blobs()  # 123 rows; sample 32 << n forces the pruned path
    a = kmeans_fit(ray.data.from_arrow(tbl), 3, iters=4,
                   seed_sample_rows=32)
    b = kmeans_fit(ray.data.from_arrow(tbl), 3, iters=4,
                   seed_sample_rows=32)
    assert np.array_equal(a, b)

    kept, skipped = semdedup(
        ray.data.from_arrow(tbl), eps=0.9999, n_clusters=3, iters=4,
        seed_sample_rows=32,
    )
    kept_ids = set(kept.to_pandas().vec_id)
    assert kept_ids.isdisjoint({40, 81, 122})
    assert {0, 41, 82} <= kept_ids
    assert skipped.count() == 0


def test_seed_sample_partition_invariance():
    """The bottom-m (splitmix64(id), id) sample is a global order
    statistic — per-block pruning is lossless — so the seeds must not
    depend on the block layout of the input."""
    from ocr_sam_project_ray.ops.kmeans import _farthest_point_seeds

    tbl = _blobs()
    a = _farthest_point_seeds(
        ray.data.from_arrow(tbl).repartition(7), 4, "vec_id", "embedding",
        sample_rows=32,
    )
    b = _farthest_point_seeds(
        ray.data.from_arrow(tbl).repartition(2), 4, "vec_id", "embedding",
        sample_rows=32,
    )
    assert np.array_equal(a, b)


def test_zero_vector_does_not_collapse_seeds():
    """A zero embedding has cosine 0 to everything INCLUDING itself, so
    without the chosen-row mask the greedy k-center loop would re-pick
    it every round and collapse the seed set to 2 distinct rows."""
    from ocr_sam_project_ray.ops.kmeans import _farthest_point_seeds

    tbl = _blobs()
    emb = tbl.column("embedding").to_pylist()
    zero = [0.0] * len(emb[0])
    tbl = pa.table({
        "vec_id": list(range(len(emb) + 1)),
        "embedding": emb + [zero],
    })
    seeds = _farthest_point_seeds(
        ray.data.from_arrow(tbl), 4, "vec_id", "embedding"
    )
    distinct = {tuple(np.round(s, 9)) for s in seeds}
    assert len(distinct) == 4  # the zero vector is picked at most once
