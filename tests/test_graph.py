"""Connected components + cluster-resolved drop: distributed label
propagation must match union-find, including transitive chains where the
endpoints never share a direct pair."""

import pyarrow as pa
import pytest

import ray.data

from ocr_sam_project_ray.ops.dedup_text import dedup_near_minhash, minhash_lsh_pairs
from ocr_sam_project_ray.ops.graph import (
    connected_components, drop_by_components,
)
from test_ops_dedup import _union_find_survivors


def _pairs_ds(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in pairs], pa.int64()),
                "id_b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )


@pytest.fixture(params=["driver", "distributed"])
def force_path(request, monkeypatch):
    """Run every graph test through BOTH execution plans: the bounded
    driver union-find / broadcast-filter fast paths AND the iterative
    distributed rounds + anti-join (thresholds forced to 0)."""
    if request.param == "distributed":
        from ocr_sam_project_ray.ops import graph as g

        monkeypatch.setattr(g, "DRIVER_CC_MAX_EDGES", 0)
        monkeypatch.setattr(g, "BROADCAST_LOSERS_MAX", 0)
    return request.param


def test_cc_transitive_chain(force_path):
    # a~b~c with NO direct (a,c) pair, plus a separate 2-cluster
    comps = connected_components(_pairs_ds([(1, 2), (2, 3), (10, 11)]))
    got = dict(zip(*(lambda d: (d["node"], d["component"]))(
        comps.to_pandas().to_dict("list"))))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_long_chain_and_cross_links(force_path):
    # a 7-node path — needs multiple propagation rounds
    chain = [(i, i + 1) for i in range(1, 7)]
    # plus a star whose center is NOT the minimum
    star = [(20, 25), (21, 25), (22, 25)]
    comps = connected_components(_pairs_ds(chain + star)).to_pandas()
    by_node = dict(zip(comps.node, comps.component))
    assert all(by_node[i] == 1 for i in range(1, 8))
    assert all(by_node[i] == 20 for i in (20, 21, 22, 25))


def test_cc_empty_pairs():
    assert connected_components(_pairs_ds([])).count() == 0


def test_drop_by_components_keeps_min_per_cluster(force_path):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(1, 8)), pa.int64()),
                "text": [f"t{i}" for i in range(1, 8)],
            }
        )
    )
    comps = connected_components(_pairs_ds([(2, 3), (3, 5)]))
    kept = sorted(
        drop_by_components(docs, comps, "doc_id").to_pandas().doc_id.tolist()
    )
    assert kept == [1, 2, 4, 6, 7]  # 3 and 5 collapse into 2


def _high_dup_corpus(n_clusters=40, dups_per=4, n_unique=80):
    """Deterministic corpus with a ~67% duplicate fraction: each cluster is
    one base text plus near-identical variants (one appended token)."""
    rows_id, rows_text = [], []
    nid = 0
    base_words = [f"w{i}" for i in range(30)]
    for c in range(n_clusters):
        base = " ".join(f"{w}c{c}" for w in base_words)
        for v in range(dups_per):
            rows_id.append(nid)
            rows_text.append(base if v == 0 else base + f" extra{v}")
            nid += 1
    for u in range(n_unique):
        rows_id.append(nid)
        rows_text.append(" ".join(f"u{u}x{i}" for i in range(25)))
        nid += 1
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(rows_id, pa.int64()),
                "text": pa.array(rows_text, pa.string()),
            }
        )
    )


def test_near_dup_verified_at_high_duplicate_fraction():
    """The fully distributed LSH→exact-verify pipeline must equal the
    brute-force kernel on a dup-heavy corpus (≥50% of clustered docs are
    near-dups) — pinning the round-2 'no driver materialization' rewrite
    at exactly the load shape that used to OOM the old design."""
    from ocr_sam_project_ray.ops.dedup_text import (
        jaccard, near_dup_verified, word_ngrams,
    )

    docs = _high_dup_corpus(n_clusters=20, dups_per=4, n_unique=40)
    texts = dict(zip(*(lambda d: (d["doc_id"], d["text"]))(
        docs.to_pandas().to_dict("list"))))
    grams = {i: word_ngrams(t) for i, t in texts.items()}
    ids = sorted(texts)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if jaccard(grams[a], grams[b]) >= 0.8
    }
    assert len(brute) >= 50  # genuinely dup-heavy
    got = near_dup_verified(docs, threshold=0.8, num_partitions=4).to_pandas()
    gset = set(zip(got.id_a, got.id_b))
    assert gset <= brute  # exact verification → no false positives ever
    missed = brute - gset
    assert len(missed) <= max(1, len(brute) // 20), missed  # LSH recall


def test_near_dedup_at_high_duplicate_fraction():
    """The round-1 gap: the drop step must survive a corpus where a LARGE
    fraction (here 120/240 extra rows ≈ 50%+ of clustered docs) are
    near-dups — no driver-side loser set, survivors = union-find truth."""
    docs = _high_dup_corpus()
    n_total = docs.count()
    pairs = minhash_lsh_pairs(docs, threshold=0.7, num_partitions=4).to_pandas()
    assert len(pairs) >= 100  # the corpus really is dup-heavy
    expected = _union_find_survivors(
        set(range(n_total)), list(zip(pairs.id_a, pairs.id_b))
    )
    kept = set(
        dedup_near_minhash(docs, threshold=0.7, num_partitions=4)
        .to_pandas()
        .doc_id
    )
    assert kept == expected
    # every cluster collapsed to its minimum id
    assert len(kept) < n_total - 100


def test_cc_adversarial_10k_path_distributed(monkeypatch):
    """A 10k-node chained-duplicate path (a~b~…~z) through the DISTRIBUTED
    plan: pointer jumping must converge in ~log2(diameter) rounds — plain
    neighbor propagation would need 10k rounds and previously raised."""
    from ocr_sam_project_ray.ops import graph as g

    monkeypatch.setattr(g, "DRIVER_CC_MAX_EDGES", 0)
    n = 10_000
    chain = [(i, i + 1) for i in range(n - 1)]
    comps = connected_components(
        _pairs_ds(chain), num_partitions=4, max_rounds=25
    ).to_pandas()
    assert len(comps) == n
    assert (comps.component == 0).all()
