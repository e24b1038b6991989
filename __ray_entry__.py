"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).

The extraction queries run over the deterministic synthetic page corpus
(Common-Crawl-style shape from BASELINE.json input_hint), generated-and-
cached under /tmp per scale tier by ocr_sam_project_ray.sources.synthetic.
Their oracles read the generator's golden parquet — values composed
independently of the engine (and in part recomputed by DuckDB itself) —
so a hash match certifies the byte-identical extracted-text contract and
the annotation semantics end-to-end.

No ray.init()/ray.shutdown() here (driver owns the session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_DEFAULT_SF = "/root/testdata/sf0.001"

# cache of materialized annotated datasets per sf_dir so successive queries
# don't re-run the whole pipeline
_CACHE: dict[tuple[str, str], Any] = {}


def _cfg():
    from ocr_sam_project_ray.pipelines.extraction import PipelineConfig

    return PipelineConfig(dedup_partitions=8)


def _annotated(sf_dir: str):
    key = ("annotated", sf_dir)
    if key not in _CACHE:
        from ocr_sam_project_ray.pipelines.extraction import run_extraction

        _CACHE[key] = run_extraction(sf_dir, _cfg()).materialize()
    return _CACHE[key]


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from ocr_sam_project_ray.pipelines.extraction import run_extraction

    return run_extraction(_DEFAULT_SF, _cfg())


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_extract_main_text(sf_dir: str):
    """The byte-identical contract surface: every output row's extracted
    text keyed by doc_id (error rows ride along with empty text)."""
    ds = _annotated(sf_dir)
    df = ds.select_columns(["doc_id", "extracted_text"]).to_pandas()
    return df.reset_index(drop=True)


def _q_extract_validate(sf_dir: str):
    ds = _annotated(sf_dir)
    df = ds.select_columns(["url", "seg_index", "success", "error"]).to_pandas()
    # page-level: one row per url (seg 0 carries the page verdict)
    out = df[df.seg_index == 0][["url", "success", "error"]]
    return out.reset_index(drop=True)


def _q_extract_segments(sf_dir: str):
    ds = _annotated(sf_dir)
    df = ds.select_columns(
        ["doc_id", "url", "seg_index", "n_segments", "extracted_text", "success"]
    ).to_pandas()
    return (
        df[df.success]
        [["doc_id", "url", "seg_index", "n_segments", "extracted_text"]]
        .reset_index(drop=True)
    )


def _q_extract_classify(sf_dir: str):
    ds = _annotated(sf_dir)
    df = ds.select_columns(
        ["doc_id", "type_id", "type_label", "tramite", "departamento", "success"]
    ).to_pandas()
    return (
        df[df.success]
        [["doc_id", "type_id", "type_label", "tramite", "departamento"]]
        .reset_index(drop=True)
    )


def _q_extract_entities(sf_dir: str):
    from ocr_sam_project_ray.pipelines.extraction import project_persons

    key = ("persons", sf_dir)
    if key not in _CACHE:
        _CACHE[key] = project_persons(_annotated(sf_dir)).materialize()
    df = _CACHE[key].to_pandas()
    return df[
        ["doc_id", "secuencia", "nombre_completo", "identificacion",
         "monto", "monto_numerico"]
    ].reset_index(drop=True)


def _q_extract_montos(sf_dir: str):
    ds = _annotated(sf_dir)
    df = ds.select_columns(
        ["doc_id", "n_entities", "monto_total", "priority", "urgent", "success"]
    ).to_pandas()
    return (
        df[df.success]
        [["doc_id", "n_entities", "monto_total", "priority", "urgent"]]
        .reset_index(drop=True)
    )


def _q_extract_metadata(sf_dir: str):
    ds = _annotated(sf_dir)
    df = ds.select_columns(
        ["url", "seg_index", "empresa", "declared_count", "has_config",
         "count_valid", "success"]
    ).to_pandas()
    out = df[df.success & (df.seg_index == 0)][
        ["url", "empresa", "declared_count", "has_config", "count_valid"]
    ]
    return out.reset_index(drop=True)


def _q_dedup_pages(sf_dir: str):
    """Exact url dedup over the raw pages table (keep latest warc_ts) —
    oracle is an independent DuckDB window-function dedup."""
    import ray.data

    from ocr_sam_project_ray.sources.synthetic import ensure_corpus
    from ocr_sam_project_ray.stages.dedup import dedup_by_url
    from ocr_sam_project_ray.context import configure_data_context

    configure_data_context()
    paths = ensure_corpus(sf_dir)
    ds = ray.data.read_parquet(paths["pages"], columns=["url", "warc_ts"])
    return dedup_by_url(ds, num_partitions=8).to_pandas().reset_index(drop=True)


def _q_batch_rollup(sf_dir: str):
    from ocr_sam_project_ray.pipelines.extraction import batch_rollup

    df = batch_rollup(_annotated(sf_dir)).to_pandas()
    return df[
        ["url", "total_jobs", "completed_count", "error_count", "batch_status"]
    ].reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_main_text": _q_extract_main_text,
        "extract_validate": _q_extract_validate,
        "extract_segments": _q_extract_segments,
        "extract_classify": _q_extract_classify,
        "extract_entities": _q_extract_entities,
        "extract_montos": _q_extract_montos,
        "extract_metadata": _q_extract_metadata,
        "dedup_pages": _q_dedup_pages,
        "batch_rollup": _q_batch_rollup,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB). Golden parquet paths are deterministic per sf tier;
# calling this function materializes the sf0.01 corpus so the driver's
# DuckDB run finds the files regardless of call order.
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    from ocr_sam_project_ray.sources.synthetic import ensure_corpus

    p = ensure_corpus("/root/testdata/sf0.01")
    gp = p["golden_pages"]
    gs = p["golden_segments"]
    ge = p["golden_entities"]
    pages = p["pages"] + "/*.parquet"

    return {
        "extract_main_text": f"""
            SELECT doc_id, extracted_text FROM read_parquet('{gs}')
            UNION ALL
            SELECT url AS doc_id, extracted_text FROM read_parquet('{gp}')
            WHERE NOT success
        """,
        "extract_validate": f"""
            SELECT url, success, error FROM read_parquet('{gp}')
        """,
        "extract_segments": f"""
            SELECT doc_id, url, seg_index, n_segments, extracted_text
            FROM read_parquet('{gs}')
        """,
        "extract_classify": f"""
            SELECT doc_id, type_id, type_label, tramite, departamento
            FROM read_parquet('{gs}')
        """,
        "extract_entities": f"""
            SELECT doc_id, seq AS secuencia, nombre_completo,
                   numero_identificacion AS identificacion, monto, monto_numerico
            FROM read_parquet('{ge}')
        """,
        "extract_montos": f"""
            SELECT doc_id, n_entities, monto_total, priority, urgent
            FROM read_parquet('{gs}')
        """,
        "extract_metadata": f"""
            SELECT url, empresa, declared_count, has_config, count_valid
            FROM read_parquet('{gp}') WHERE success
        """,
        "dedup_pages": f"""
            SELECT url, warc_ts FROM read_parquet('{pages}')
            QUALIFY row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) = 1
        """,
        "batch_rollup": f"""
            SELECT gp.url,
                   CASE WHEN gp.success THEN gp.n_segments ELSE 1 END AS total_jobs,
                   CASE WHEN gp.success THEN gp.n_segments ELSE 0 END AS completed_count,
                   CASE WHEN gp.success THEN 0 ELSE 1 END AS error_count,
                   CASE WHEN gp.success THEN 'completed' ELSE 'failed' END AS batch_status
            FROM read_parquet('{gp}') gp
        """,
    }
