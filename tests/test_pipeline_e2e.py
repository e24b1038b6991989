"""Golden end-to-end: the full Ray pipeline over the sf0.001 corpus must
reproduce the generator's composed expectations byte-for-byte (the
byte-identical extracted-text contract), including error rows, dedup, and
annotation columns. Also: dedup idempotence and order independence."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ocr_sam_project_ray.pipelines.extraction import (
    PipelineConfig, batch_rollup, project_persons, read_pages, run_extraction,
)
from ocr_sam_project_ray.sources.synthetic import ensure_corpus

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def golden():
    paths = ensure_corpus(SF)
    return {
        "pages": pq.read_table(paths["golden_pages"]).to_pandas(),
        "segments": pq.read_table(paths["golden_segments"]).to_pandas(),
        "entities": pq.read_table(paths["golden_entities"]).to_pandas(),
    }


@pytest.fixture(scope="module")
def annotated(golden):
    ds = run_extraction(SF, PipelineConfig(dedup_partitions=4))
    return ds.to_pandas()


def test_segments_match_golden_bytes(annotated, golden):
    ok = annotated[annotated.success].sort_values("doc_id").reset_index(drop=True)
    exp = golden["segments"].sort_values("doc_id").reset_index(drop=True)
    assert list(ok.doc_id) == list(exp.doc_id)
    assert list(ok.extracted_text) == list(exp.extracted_text)  # BYTE-identical


def test_annotations_match_golden(annotated, golden):
    ok = annotated[annotated.success].sort_values("doc_id").reset_index(drop=True)
    exp = golden["segments"].sort_values("doc_id").reset_index(drop=True)
    assert list(ok.type_id) == list(exp.type_id)
    assert list(ok.type_label) == list(exp.type_label)
    assert list(ok.tramite) == list(exp.tramite)
    assert list(ok.departamento) == list(exp.departamento)
    assert list(ok.n_entities) == list(exp.n_entities)
    assert [round(x, 6) for x in ok.monto_total] == [round(x, 6) for x in exp.monto_total]
    assert list(ok.priority) == list(exp.priority)
    assert list(ok.urgent) == list(exp.urgent)
    assert list(ok.count_valid) == list(exp.count_valid)
    assert list(ok.declared_count) == list(exp.declared_count)


def test_error_rows_preserved(annotated, golden):
    bad = annotated[~annotated.success]
    exp_bad = golden["pages"][~golden["pages"].success]
    assert sorted(bad.url) == sorted(exp_bad.url)
    assert sorted(bad.error) == sorted(exp_bad.error)


def test_dedup_kept_latest(annotated, golden):
    # every url appears exactly once at page level; warc_ts is the max
    doc_level = annotated.groupby("url").warc_ts.first().reset_index()
    exp = golden["pages"][["url", "warc_ts"]]
    m = doc_level.merge(exp, on="url", suffixes=("", "_exp"))
    assert len(m) == len(exp)
    assert (m.warc_ts == m.warc_ts_exp).all()


def test_entities_match_golden(annotated, golden):
    persons = project_persons(
        run_extraction(SF, PipelineConfig(dedup_partitions=4))
    ).to_pandas()
    got = persons.sort_values(["doc_id", "secuencia"]).reset_index(drop=True)
    exp = golden["entities"].sort_values(["doc_id", "seq"]).reset_index(drop=True)
    assert list(got.doc_id) == list(exp.doc_id)
    assert list(got.nombre_completo) == list(exp.nombre_completo)
    assert list(got.identificacion) == list(exp.numero_identificacion)
    assert [round(x, 6) for x in got.monto_numerico] == [
        round(x, 6) for x in exp.monto_numerico
    ]
    # flavor-A name split spot check
    row = got.iloc[0]
    toks = row.nombre_completo.split()
    assert row.nombre == toks[0]


def test_batch_rollup_statuses(annotated, golden):
    rolled = batch_rollup(
        run_extraction(SF, PipelineConfig(dedup_partitions=4))
    ).to_pandas()
    gp = golden["pages"]
    merged = rolled.merge(gp[["url", "success", "n_segments"]], on="url")
    assert len(merged) == len(gp)
    good = merged[merged.success]
    assert (good.batch_status == "completed").all()
    assert (good.total_jobs == good.n_segments).all()
    bad = merged[~merged.success]
    assert (bad.batch_status == "failed").all()
    assert (bad.error_count == 1).all()


def test_order_independence_and_idempotence(annotated):
    # different partitioning → identical sorted output
    out2 = run_extraction(SF, PipelineConfig(dedup_partitions=2)).to_pandas()
    a = annotated.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert list(a.doc_id) == list(b.doc_id)
    assert list(a.extracted_text) == list(b.extracted_text)
    assert list(a.confidence) == list(b.confidence)
