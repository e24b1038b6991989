"""CCNet-shape trigram LM scoring: engine↔SQL parity on adversarial docs,
broadcast↔distributed plan equality, cross-corpus train/score, and model
pruning semantics."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ocr_sam_project_ray.ops.ngram_lm import (
    doc_trigrams,
    score_trigram_model,
    train_trigram_model,
    trigram_familiarity,
)

_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\s+') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM toks, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
),
model AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS c
  FROM grams GROUP BY gram HAVING count(*) >= {min_count}
),
hits AS (
  SELECT g.doc_id, count(*) AS n_grams, count(m.gram) AS n_hits,
         coalesce(sum(m.c), 0) AS hit_sum
  FROM grams g LEFT JOIN model m USING (gram) GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.hit_sum, 0) AS BIGINT) AS hit_sum
FROM documents d LEFT JOIN hits h USING (doc_id) ORDER BY doc_id
"""

FIXTURE = pa.table(
    {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "a b c a b c a b c",     # heavy self-repetition
            "a b c x y z",           # one familiar gram, rest rare
            "x",                     # < 3 tokens -> no grams
            "",                      # empty -> no grams
            None,                    # NULL -> no grams
            "  a   b\tc  ",          # whitespace runs: same gram as 'a b c'
        ],
    }
)


def _oracle(tbl: pa.Table, min_count: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(_ORACLE.replace("{min_count}", str(min_count))).df()


def test_doc_trigrams_kernel():
    assert doc_trigrams("a b c d") == ["a b c", "b c d"]
    assert doc_trigrams("a b") == []
    assert doc_trigrams("") == []
    assert doc_trigrams(None) == []
    assert doc_trigrams("  a   b\tc  ") == ["a b c"]


@pytest.mark.parametrize("plan", ["broadcast", "distributed"])
@pytest.mark.parametrize("min_count", [2, 3])
def test_matches_sql_oracle(plan, min_count):
    ds = ray.data.from_arrow(FIXTURE)
    got = (
        trigram_familiarity(ds, min_count=min_count, plan=plan,
                            num_partitions=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    exp = _oracle(FIXTURE, min_count)
    pd.testing.assert_frame_equal(got, exp)


def test_semantics_pinned():
    """Hand-computed, independent of DuckDB (min_count=3): only 'a b c'
    (count 5: 3 in doc1, 1 in doc2, 1 in doc6) and 'b c a'+'c a b' (2 each,
    pruned) -> model = {'a b c': 5}."""
    ds = ray.data.from_arrow(FIXTURE)
    got = (
        trigram_familiarity(ds, min_count=3, num_partitions=2)
        .to_pandas().set_index("doc_id")
    )
    assert got.loc[1, "n_grams"] == 7          # 9 tokens -> 7 grams
    assert got.loc[1, "n_hits"] == 3           # three 'a b c' occurrences
    assert got.loc[1, "hit_sum"] == 15         # 3 * model count 5
    assert got.loc[2, "n_hits"] == 1 and got.loc[2, "hit_sum"] == 5
    assert (got.loc[[3, 4, 5]] == 0).all().all()
    assert got.loc[6, "n_grams"] == 1 and got.loc[6, "hit_sum"] == 5


def test_model_pruning():
    model = (
        train_trigram_model(ray.data.from_arrow(FIXTURE), min_count=3)
        .to_pandas()
    )
    assert model.gram.tolist() == ["a b c"]
    assert model.c.tolist() == [5]


def test_cross_corpus_train_score():
    """The real CCNet deployment: train on a reference corpus, score a
    different one."""
    ref = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["p q r p q r", "p q r"]})
    )
    target = pa.table(
        {"doc_id": [10, 11], "text": ["p q r s", "unseen tokens here now"]}
    )
    model = train_trigram_model(ref, min_count=2)  # {'p q r': 3}
    got = (
        score_trigram_model(ray.data.from_arrow(target), model,
                            num_partitions=2)
        .to_pandas().set_index("doc_id")
    )
    assert got.loc[10, "n_grams"] == 2
    assert got.loc[10, "n_hits"] == 1 and got.loc[10, "hit_sum"] == 3
    assert got.loc[11, "n_hits"] == 0 and got.loc[11, "hit_sum"] == 0


@pytest.mark.parametrize("parts", [1, 2, 5])
def test_partition_invariance(parts):
    ds = ray.data.from_arrow(FIXTURE)
    exp = _oracle(FIXTURE, 2)
    for plan in ("broadcast", "distributed"):
        got = (
            trigram_familiarity(ds, min_count=2, plan=plan,
                                num_partitions=parts)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp)


def test_familiarity_buckets():
    from ocr_sam_project_ray.ops.ngram_lm import (
        familiarity_buckets, sql_familiarity_buckets,
    )

    # 9 docs so terciles are exact thirds; repetition-heavy docs score high
    tbl = pa.table(
        {
            "doc_id": list(range(1, 10)),
            "text": [
                "a b c " * 10,          # maximal familiarity
                "a b c a b c",
                "a b c x y z",
                "p q r p q r p q r",
                "p q r s t u",
                "unique one two three",
                "",                      # no grams -> ppm -1 -> tail
                None,
                "x",
            ],
        }
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = (
        con.sql(sql_familiarity_buckets(min_count=2))
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    got = (
        familiarity_buckets(ray.data.from_arrow(tbl), min_count=2,
                            num_partitions=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["doc_id", "ppm", "bucket"]],
                                  exp[["doc_id", "ppm", "bucket"]])
    # semantic pins: 3 docs per bucket; gramless docs land in tail
    assert got["bucket"].value_counts().to_dict() == {
        "head": 3, "middle": 3, "tail": 3}
    assert set(got.loc[got.ppm == -1, "bucket"]) == {"tail"}
