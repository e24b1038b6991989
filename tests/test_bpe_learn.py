from collections import Counter

import duckdb
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.bpe_learn import (
    bpe_pair_counts, learn_bpe_merges, merge_word, sql_bpe_pair_counts,
)

SF = "/root/testdata/sf0.001"


def _reference_bpe(texts, n_merges, min_pair_count=2):
    """From-first-principles Sennrich 2016 with the engine's tie-break
    (count DESC, pair lexicographic ASC)."""
    freqs = Counter()
    for t in texts:
        freqs.update((t or "").strip().split())
    vocab = {w: list(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            f = freqs[w]
            for p in zip(syms, syms[1:]):
                pairs[p] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        merges.append(best[0])
        vocab = {w: merge_word(s, best[0]) for w, s in vocab.items()}
    return merges


def test_merge_word_leftmost_non_overlapping():
    assert merge_word(list("aaa"), ("a", "a")) == ["aa", "a"]
    assert merge_word(list("aaaa"), ("a", "a")) == ["aa", "aa"]
    assert merge_word(list("abab"), ("a", "b")) == ["ab", "ab"]
    assert merge_word(["ab", "c"], ("ab", "c")) == ["abc"]
    assert merge_word(list("xyz"), ("a", "b")) == ["x", "y", "z"]
    assert merge_word([], ("a", "b")) == []


def test_learn_matches_reference_implementation():
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "low new low",
    ]
    want = _reference_bpe(texts, 12)
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    got = learn_bpe_merges(ray.data.from_arrow(tbl), n_merges=12,
                           num_partitions=2)
    assert got == want
    assert len(got) > 3  # the corpus supports several merges


def test_learn_partition_invariant():
    texts = ["aa ab aa ab aa", "ba bb ba", "aa aa ab"]
    tbl = pa.table(
        {"doc_id": pa.array(range(3), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    a = learn_bpe_merges(ray.data.from_arrow(tbl), n_merges=6)
    b = learn_bpe_merges(ray.data.from_arrow(tbl).repartition(5),
                         n_merges=6, num_partitions=3)
    assert a == b == _reference_bpe(texts, 6)


def test_pair_counts_match_duckdb_oracle():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    got = (
        bpe_pair_counts(ds, num_partitions=4)
        .to_pandas().sort_values("pair").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(sql_bpe_pair_counts()).df()
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()


def test_first_merge_is_argmax_of_pair_counts():
    texts = ["ab ab ab cd cd", "ab cd"]
    tbl = pa.table(
        {"doc_id": pa.array(range(2), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    ds = ray.data.from_arrow(tbl)
    counts = bpe_pair_counts(ds).to_pandas()
    top = counts.sort_values(["c", "pair"],
                             ascending=[False, True]).iloc[0]
    merges = learn_bpe_merges(ds, n_merges=1)
    assert merges[0] == tuple(top["pair"].split(" "))
