import pyarrow as pa

from ocr_sam_project_ray.pipelines.extraction import PipelineConfig, run_extraction
from ocr_sam_project_ray.stages.scorer import TextScorer, score_batch

SF = "/root/testdata/sf0.001"


def test_scorer_deterministic_and_correct():
    batch = pa.table(
        {
            "extracted_text": pa.array(
                [
                    "Se decreta el   embargo y el secuestro de bienes. "
                    "Cedula 8-123-4567 por B/. 1,500.00.",
                    "",
                ]
            )
        }
    )
    out = score_batch(batch)
    assert out["summary"][0].as_py().startswith("Se decreta el embargo")
    assert out["risk_keyword_count"][0].as_py() == 2
    assert out["legal_density_ppm"][0].as_py() > 0
    assert out["risk_keyword_count"][1].as_py() == 0
    assert out["legal_density_ppm"][1].as_py() == 0
    out2 = score_batch(batch)
    assert out.equals(out2)


def test_scorer_summary_truncates():
    long = "palabra " * 100
    out = TextScorer(summary_chars=20)(
        pa.table({"extracted_text": pa.array([long])})
    )
    assert len(out["summary"][0].as_py()) == 20


def test_bucket_sort_path_same_results():
    base = run_extraction(SF, PipelineConfig(dedup_partitions=2)).to_pandas()
    skew = run_extraction(
        SF, PipelineConfig(dedup_partitions=2, bucket_sort=True)
    ).to_pandas()
    a = base.sort_values("doc_id").reset_index(drop=True)
    b = skew.sort_values("doc_id").reset_index(drop=True)
    assert list(a.doc_id) == list(b.doc_id)
    assert list(a.extracted_text) == list(b.extracted_text)
    assert list(a.confidence) == list(b.confidence)


def test_actor_pool_path_same_results():
    base = run_extraction(SF, PipelineConfig(dedup_partitions=2)).to_pandas()
    actors = run_extraction(
        SF, PipelineConfig(dedup_partitions=2, use_actors=True,
                           parse_concurrency=(1, 2)),
    ).to_pandas()
    a = base.sort_values("doc_id").reset_index(drop=True)
    b = actors.sort_values("doc_id").reset_index(drop=True)
    assert list(a.doc_id) == list(b.doc_id)
    assert list(a.extracted_text) == list(b.extracted_text)
