"""Document splitter stage: 1 page → N sub-document (oficio-analog) rows.

Combines the reference's first-page metadata parse
(src/services/metadata_service.py:16-123), separator-based split
(src/services/pdf_service.py:36-147), sub-document id minting
(pdf_service.py:179-207) and count validation (src/shared/validators.py:46-91)
into one flat-map ``map_batches`` stage (stateless tasks; emits more rows
than it receives, which map_batches supports natively).

Invalid input rows (``valid=False``) pass through as single error rows —
never dropped (error-result path parity, src/ocr_processor/app.py:120-138).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import extract_core as core

_META_DEFAULT = {"empresa": "", "origen": "", "operador": ""}


def segment_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    texts = batch["extracted_text"].to_pylist()
    valids = batch["valid"].to_pylist()
    errors = batch["error"].to_pylist()
    warc_ts = batch["warc_ts"].to_pylist()
    langs = batch["lang"].to_pylist()
    doc_bytes = batch["doc_bytes"].to_pylist()
    size_bucket = batch["size_bucket"].to_pylist()

    out: dict[str, list] = {
        "doc_id": [], "url": [], "warc_ts": [], "lang": [], "doc_bytes": [],
        "size_bucket": [], "seg_index": [], "n_segments": [],
        "extracted_text": [], "empresa": [], "origen": [], "operador": [],
        "declared_count": [], "has_config": [], "count_valid": [],
        "count_error": [], "success": [], "error": [],
    }

    def emit(i, doc_id, seg_index, n_segments, text, meta, declared, has_cfg,
             count_valid, count_error, success, error):
        out["doc_id"].append(doc_id)
        out["url"].append(urls[i])
        out["warc_ts"].append(warc_ts[i])
        out["lang"].append(langs[i])
        out["doc_bytes"].append(doc_bytes[i])
        out["size_bucket"].append(size_bucket[i])
        out["seg_index"].append(seg_index)
        out["n_segments"].append(n_segments)
        out["extracted_text"].append(text)
        out["empresa"].append(meta["empresa"])
        out["origen"].append(meta["origen"])
        out["operador"].append(meta["operador"])
        out["declared_count"].append(declared)
        out["has_config"].append(has_cfg)
        out["count_valid"].append(count_valid)
        out["count_error"].append(count_error)
        out["success"].append(success)
        out["error"].append(error)

    for i in range(len(batch)):
        if not valids[i]:
            emit(i, urls[i], 0, 0, "", _META_DEFAULT, 0, False, False, "",
                 False, errors[i])
            continue
        text = texts[i]
        has_cfg = core.parse_metadata_has_config(text)
        declared = 0
        meta = _META_DEFAULT
        if has_cfg:
            parsed = core.parse_metadata(text)
            declared = int(parsed["cantidad_oficios_declarada"])
            meta = {
                "empresa": parsed["empresa"] if parsed["empresa"] != "No especificado" else "",
                "origen": parsed["origen"] if parsed["origen"] != "No especificado" else "",
                "operador": parsed["operador"] if parsed["operador"] != "Sistema automático" else "",
            }
        segments = core.split_segments(text)
        n_seg = len(segments)
        count_valid, count_error, _warn = core.validate_count(n_seg, declared)
        if n_seg == 0:
            emit(i, urls[i], 0, 0, "", meta, declared, has_cfg, False,
                 count_error, False, count_error or "empty document")
            continue
        for k, seg_text in enumerate(segments):
            emit(i, core.mint_doc_id(urls[i], k, n_seg), k, n_seg, seg_text,
                 meta, declared, has_cfg, bool(count_valid), count_error,
                 True, "")

    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], type=pa.string()),
            "url": pa.array(out["url"], type=pa.string()),
            "warc_ts": pa.array(out["warc_ts"], type=pa.timestamp("us")),
            "lang": pa.array(out["lang"], type=pa.string()),
            "doc_bytes": pa.array(out["doc_bytes"], type=pa.int64()),
            "size_bucket": pa.array(out["size_bucket"], type=pa.int32()),
            "seg_index": pa.array(out["seg_index"], type=pa.int64()),
            "n_segments": pa.array(out["n_segments"], type=pa.int64()),
            "extracted_text": pa.array(out["extracted_text"], type=pa.string()),
            "empresa": pa.array(out["empresa"], type=pa.string()),
            "origen": pa.array(out["origen"], type=pa.string()),
            "operador": pa.array(out["operador"], type=pa.string()),
            "declared_count": pa.array(out["declared_count"], type=pa.int64()),
            "has_config": pa.array(out["has_config"], type=pa.bool_()),
            "count_valid": pa.array(out["count_valid"], type=pa.bool_()),
            "count_error": pa.array(out["count_error"], type=pa.string()),
            "success": pa.array(out["success"], type=pa.bool_()),
            "error": pa.array(out["error"], type=pa.string()),
        }
    )
