"""Winnowing passage fingerprints: the published w+k-1 guarantee, window
coverage, partition invariance, planted-passage recall, hot-fp accounting."""

import random

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from ocr_sam_project_ray.ops.winnow import (
    DEFAULT_K,
    DEFAULT_W,
    WinnowDropStats,
    fingerprint_doc,
    gram_hashes,
    passage_match_pairs,
    winnow_positions,
)


def _rand_text(rng, n, alphabet="abcdefghijklmnop"):
    return "".join(rng.choice(alphabet) for _ in range(n))


def test_gram_hashes_shape_and_short_doc():
    assert gram_hashes("", 8).size == 0
    assert gram_hashes("short", 8).size == 0          # < k bytes: no grams
    assert gram_hashes("x" * 8, 8).size == 1
    h = gram_hashes("abcdefghij", 3)
    assert h.size == 8
    # same gram → same hash, regardless of position
    h2 = gram_hashes("zzabcdefghij", 3)
    assert set(h.tolist()) <= set(h2.tolist())


def test_winnow_window_coverage():
    """Every w-window of gram hashes contains >= 1 selected position —
    the structural property behind the matching guarantee."""
    rng = random.Random(7)
    h = gram_hashes(_rand_text(rng, 500), DEFAULT_K)
    pos = winnow_positions(h, DEFAULT_W)
    sel = np.zeros(h.size, dtype=bool)
    sel[pos] = True
    for i in range(h.size - DEFAULT_W + 1):
        assert sel[i : i + DEFAULT_W].any(), i
    # density: winnowing keeps roughly 2/(w+1) of grams, never all of them
    assert pos.size < h.size


def test_shared_substring_guarantee():
    """Any shared substring of length >= w + k - 1 shares a fingerprint."""
    rng = random.Random(11)
    guarantee = DEFAULT_W + DEFAULT_K - 1
    passage = _rand_text(rng, guarantee, alphabet="qrstuvwx")
    for trial in range(20):
        a = _rand_text(rng, rng.randint(40, 200)) + passage + _rand_text(
            rng, rng.randint(40, 200)
        )
        b = _rand_text(rng, rng.randint(40, 200)) + passage + _rand_text(
            rng, rng.randint(40, 200)
        )
        fa, _ = fingerprint_doc(a)
        fb, _ = fingerprint_doc(b)
        assert set(fa.tolist()) & set(fb.tolist()), trial


def test_passage_match_pairs_planted():
    rng = random.Random(23)
    passage = _rand_text(rng, 80, alphabet="qrstuvwx")
    texts = {
        0: _rand_text(rng, 300) + passage + _rand_text(rng, 300),
        1: passage + _rand_text(rng, 500),
        2: _rand_text(rng, 600),                       # unrelated
        3: _rand_text(rng, 400, alphabet="ABCDEFGH"),  # disjoint alphabet
    }
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = passage_match_pairs(ds, min_shared=2, num_partitions=4).to_pandas()
    pairs = set(zip(got.id_a, got.id_b))
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs), pairs      # no false positives
    assert int(got.n_shared.iloc[0]) >= 2


def test_partition_invariance():
    rng = random.Random(31)
    passage = _rand_text(rng, 60, alphabet="qrstuv")
    texts = [
        _rand_text(rng, 200) + passage + _rand_text(rng, 100)
        for _ in range(6)
    ]
    t = pa.table({"doc_id": list(range(6)), "text": texts})

    def run(nblocks):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        df = passage_match_pairs(ds, min_shared=1, num_partitions=4).to_pandas()
        return sorted(map(tuple, df[["id_a", "id_b", "n_shared"]].values.tolist()))

    assert run(1) == run(5)


def test_hot_fingerprint_guard_counted():
    """100 docs all sharing one boilerplate passage: with a small cap the
    hot fingerprints are skipped AND the skip is observable."""
    rng = random.Random(43)
    passage = _rand_text(rng, 40, alphabet="qrstuv")
    texts = [passage + _rand_text(rng, 30) for _ in range(100)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(100)), "text": texts})
    )
    stats = WinnowDropStats.remote()
    got = passage_match_pairs(
        ds, min_shared=1, num_partitions=4, max_docs_per_fp=10,
        drop_stats=stats,
    ).to_pandas()
    rec = ray.get(stats.get.remote())
    assert rec["skipped_buckets"] > 0 and rec["skipped_members"] > 0
    # pairs that do survive stay bounded by the cap's quadratic limit
    assert len(got) < 100 * 99 // 2
