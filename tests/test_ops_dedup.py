import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ocr_sam_project_ray.ops.dedup_text import (
    dedup_exact, dedup_near_minhash, hamming64, jaccard, minhash_lsh_pairs,
    minhash_signature, ngram_jaccard_pairs, simhash64, simhash_near_pairs,
    word_ngrams,
)

SF = "/root/testdata/sf0.001"


def test_word_ngrams_and_jaccard():
    a = word_ngrams("a b c d")
    assert a == {("a", "b", "c"), ("b", "c", "d")}
    # <n-word docs have NO grams (matches the SQL oracle's generate_series)
    assert word_ngrams("a b") == set()
    assert word_ngrams("") == set()
    assert jaccard({1, 2}, {2, 3}) == 1 / 3
    # ∅ vs ∅ is NOT a match (SQL 0/0 → NULL excludes the pair)
    assert jaccard(set(), set()) == 0.0


def test_short_doc_pairs_excluded():
    """Degenerate docs (empty / <3 words) never form pairs — engine matches
    the SQL oracle, which yields an empty gram list and NULL jaccard."""
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": ["", "", "one two", "one two",
                         "alpha beta gamma delta alpha beta gamma delta"],
            }
        )
    )
    assert ngram_jaccard_pairs(docs, threshold=0.5).count() == 0
    assert minhash_lsh_pairs(docs, threshold=0.5, num_partitions=2).count() == 0


def test_minhash_identical_and_similar():
    t = "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"
    s1, s2 = minhash_signature(t), minhash_signature(t)
    assert (s1 == s2).all()
    near = t + " trece"
    est = float((minhash_signature(t) == minhash_signature(near)).sum()) / 64
    real = jaccard(word_ngrams(t), word_ngrams(near))
    assert abs(est - real) < 0.35  # 64 perms → coarse but correlated
    far = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    est_far = float((minhash_signature(t) == minhash_signature(far)).sum()) / 64
    assert est_far < 0.2


def test_simhash_properties():
    t = "uno dos tres cuatro cinco"
    assert simhash64(t) == simhash64(t)
    assert hamming64(simhash64(t), simhash64(t)) == 0
    assert hamming64(simhash64(t), simhash64(t + " seis")) <= 20
    assert simhash64("") == 0


def test_dedup_exact_keeps_min_id():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([5, 1, 3, 9], pa.int64()),
                "text": pa.array(["same", "same", "other", "same"], pa.string()),
            }
        )
    )
    out = dedup_exact(ds, num_partitions=2).to_pandas().sort_values("doc_id")
    assert list(out.doc_id) == [1, 3]


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def test_minhash_lsh_finds_seeded_near_dups(docs):
    exact = ngram_jaccard_pairs(docs, threshold=0.8).to_pandas()
    exact_pairs = set(zip(exact.id_a, exact.id_b))
    assert len(exact_pairs) > 0  # testdata seeds near-duplicates
    lsh = minhash_lsh_pairs(docs, threshold=0.7, num_partitions=2).to_pandas()
    lsh_pairs = set(zip(lsh.id_a, lsh.id_b))
    # LSH must recall the high-jaccard pairs (0.8+ pairs collide w.h.p.)
    missed = exact_pairs - lsh_pairs
    assert len(missed) <= max(1, len(exact_pairs) // 10), missed


def test_simhash_near_pairs_on_docs(docs):
    import pyarrow.parquet as pq

    exact = ngram_jaccard_pairs(docs, threshold=0.9).to_pandas()
    sim = simhash_near_pairs(docs, max_hamming=10, num_partitions=2).to_pandas()
    sim_pairs = set(zip(sim.id_a, sim.id_b))
    # guaranteed recall band: hamming ≤ 3 (see simhash_near_pairs docstring)
    t = pq.read_table(f"{SF}/documents.parquet")
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    guaranteed = [
        (a, b)
        for a, b in zip(exact.id_a, exact.id_b)
        if hamming64(simhash64(texts[a]), simhash64(texts[b])) <= 3
    ]
    assert len(guaranteed) > 0
    for pair in guaranteed:
        assert pair in sim_pairs, pair
    # every reported pair honors the distance bound
    assert (sim.hamming <= 10).all()


def _union_find_survivors(all_ids, pairs):
    """Reference connected-components survivors: min id per component."""
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i for i in all_ids if find(i) == i}


def test_dedup_near_minhash_drops_losers(docs):
    """Cluster-resolved drop: exactly one survivor (the min id) per
    connected component of the LSH pair graph — verified against a
    union-find recompute of the same pairs."""
    pairs = minhash_lsh_pairs(docs, threshold=0.7, num_partitions=2).to_pandas()
    all_ids = set(docs.to_pandas().doc_id)
    expected = _union_find_survivors(all_ids, list(zip(pairs.id_a, pairs.id_b)))
    kept = set(
        dedup_near_minhash(docs, threshold=0.7, num_partitions=2)
        .to_pandas()
        .doc_id
    )
    assert kept == expected


def test_near_dup_verified_matches_exact_kernel(docs):
    """LSH-candidates → exact-verify must agree with the brute-force exact
    kernel on every pair it emits, and recall the 0.8+ pairs."""
    from ocr_sam_project_ray.ops.dedup_text import near_dup_verified

    verified = near_dup_verified(docs, threshold=0.8, num_partitions=2).to_pandas()
    exact = ngram_jaccard_pairs(docs, threshold=0.8).to_pandas()
    vset = set(zip(verified.id_a, verified.id_b))
    eset = set(zip(exact.id_a, exact.id_b))
    assert vset <= eset                       # no false positives, ever
    missed = eset - vset
    assert len(missed) <= max(1, len(eset) // 10), missed  # LSH recall
    # ppm values agree exactly where both report
    ev = exact.set_index(["id_a", "id_b"]).jaccard_ppm
    for _, r in verified.iterrows():
        assert ev.loc[(r.id_a, r.id_b)] == r.jaccard_ppm


def test_lsh_hot_bucket_guards():
    """Empty texts emit no bands; a degenerate identical-text cluster above
    max_bucket is skipped instead of generating O(n²) pairs; genuine
    near-dups elsewhere are still found."""
    import pyarrow as pa

    import ray.data

    base = "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"
    rows = (
        [{"doc_id": i, "text": ""} for i in range(50)]                 # empty
        + [{"doc_id": 100 + i, "text": "mismo texto repetido aqui"}    # hot cluster
           for i in range(30)]
        + [{"doc_id": 900, "text": base},
           {"doc_id": 901, "text": base + " trece"}]                   # real near-dup
    )
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = minhash_lsh_pairs(ds, threshold=0.5, num_partitions=2,
                              max_bucket=10).to_pandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    assert (900, 901) in got
    # no pair involves empty docs; hot cluster suppressed by the guard
    for a, b in got:
        assert a >= 100 and b >= 100
        assert not (100 <= a < 130 and 100 <= b < 130)


def test_lsh_hot_bucket_drop_accounting(docs):
    """The hot-bucket guard is not silent: a corpus with a degenerate
    cluster larger than max_bucket reports (skipped_buckets,
    skipped_members) via the stats actor; the standard synthetic corpus
    drops nothing."""
    from ocr_sam_project_ray.ops.dedup_text import LshDropStats

    # standard corpus: guard must not fire at all
    stats = LshDropStats.remote()
    minhash_lsh_pairs(
        docs, threshold=0.7, num_partitions=2, drop_stats=stats
    ).materialize()
    got = ray.get(stats.get.remote())
    assert got == {"skipped_buckets": 0, "skipped_members": 0}

    # degenerate cluster: 30 near-identical docs with max_bucket=10 must
    # be skipped AND counted (every band collides → many hot buckets)
    n = 30
    clones = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": ["alpha beta gamma delta epsilon zeta eta theta"] * n,
            }
        )
    )
    stats2 = LshDropStats.remote()
    out = minhash_lsh_pairs(
        clones, threshold=0.5, num_partitions=2, max_bucket=10,
        drop_stats=stats2,
    ).materialize()
    got2 = ray.get(stats2.get.remote())
    assert out.count() == 0          # everything was in hot buckets
    assert got2["skipped_buckets"] > 0
    assert got2["skipped_members"] >= n  # every member of every hot bucket
