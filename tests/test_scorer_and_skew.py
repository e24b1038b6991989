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


def test_poison_row_captured_not_fatal(monkeypatch):
    """A payload that makes the extractor raise must become an empty-text
    row, not a task failure (error-result parity, ocr_processor/app.py:120-138)."""
    import pyarrow as pa

    from ocr_sam_project_ray.stages import extract as ex

    real = ex.extract_main_text

    def bomb(payload):
        if b"BOOM" in payload:
            raise RuntimeError("synthetic parser crash")
        return real(payload)

    monkeypatch.setattr(ex, "extract_main_text", bomb)
    batch = pa.table(
        {
            "url": pa.array(["u1", "u2"]),
            "warc_ts": pa.array([1, 2], pa.int64()),
            "lang": pa.array(["es", "es"]),
            "doc_bytes": pa.array([10, 10], pa.int64()),
            "size_bucket": pa.array([3, 3], pa.int32()),
            "valid": pa.array([True, True]),
            "error": pa.array(["", ""]),
            "html": pa.array([b"<p>BOOM</p>", b"<!DOCTYPE html><html><body><p>"
                              + b"texto suficientemente largo para ser contenido bueno."
                              + b"</p></body></html>"], pa.binary()),
        }
    )
    actor = ex.MainContentExtractor()
    out = actor(batch)
    assert out["extracted_text"][0].as_py() == ""      # poison captured
    assert "contenido" in out["extracted_text"][1].as_py()
    assert actor.docs_failed == 1 and actor.docs_processed == 1


def test_validator_size_boundaries():
    import pyarrow as pa

    from ocr_sam_project_ray.stages.validate import (
        MIN_HTML_BYTES, validate_batch,
    )

    def page(body: bytes) -> bytes:
        return b"<!DOCTYPE html><html><body>" + body + b"</body></html>"

    base = page(b"")
    pad = MIN_HTML_BYTES - len(base)
    exact_min = page(b"x" * pad)          # exactly MIN bytes
    one_under = page(b"x" * (pad - 1))    # MIN - 1
    assert len(exact_min) == MIN_HTML_BYTES
    batch = pa.table(
        {
            "url": pa.array(["a", "b", "c"]),
            "html": pa.array([exact_min, one_under,
                              b"%PDF-1.4\n@10,1:x\n%%EOF" + b"%" * MIN_HTML_BYTES],
                             pa.binary()),
        }
    )
    out = validate_batch(batch)
    assert out["valid"].to_pylist() == [True, False, True]
    assert "too small" in out["error"][1].as_py()


def test_scorer_fast_kernel_equals_reference_form():
    """The round-5 scorer kernel (bounded-prefix summary collapse +
    extract_spans windowed density) must be value-identical to the plain
    form: full-text regex whitespace collapse + six full finditer passes."""
    import glob as _glob
    import re

    import pyarrow.parquet as pq

    from ocr_sam_project_ray.functions.patterns import PANAMA_PATTERNS
    from ocr_sam_project_ray.sources.synthetic import ensure_corpus

    ws = re.compile(r"\s+")
    sc = TextScorer()

    def reference(text):
        text = text or ""
        collapsed = ws.sub(" ", text).strip()
        summary = collapsed[: sc.summary_chars]
        risk = len(sc.kw.findall(text.lower()))
        covered = 0
        for pat in PANAMA_PATTERNS.values():
            covered += sum(m.end() - m.start() for m in pat.finditer(text))
        density = int(covered * 1_000_000 / len(text)) if text else 0
        return summary, risk, density

    p = ensure_corpus(SF)
    texts = []
    for f in sorted(_glob.glob(p["golden_segments"])):
        texts.extend(
            x for x in pq.read_table(f, columns=["extracted_text"])[
                "extracted_text"
            ].to_pylist() if x
        )
    assert len(texts) > 50
    texts += [
        "", "   ", " \n\t " * 500,            # whitespace-dense: escalation path
        "a" * 50, "x" * 10_000,               # digit-free long text
        "w " * 2_000,                         # summary needs >1 escalation? no — wide prefix
        "B/. 1,234.56 " * 100,                # span-dense
        " " * 300 + "hola " * 100,            # leading-whitespace strip
        None,
    ]
    for t in texts:
        assert sc.score_one(t) == reference(t), repr(t)[:80]
