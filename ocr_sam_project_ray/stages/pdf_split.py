"""Binary document-splitter stage: one multi-oficio PDF payload → N
standalone per-oficio PDF payloads, as a flat-map ``map_batches`` stage.

This is the byte-level twin of ``stages/segment.py`` (which splits
EXTRACTED TEXT): the reference's document_processor performs exactly this
split on real PDF bytes before OCR — separator-page ranges
(/root/reference/src/services/pdf_service.py:78-147), leading config-page
skip (pdf_service.py:209-223), page-range reassembly into standalone PDFs
(pdf_service.py:179-207), ``{batch_id}_oficio_{n:03d}`` part naming
(pdf_service.py:196). Every emitted part is a genuine PDF (header, xref,
trailer, %%EOF) that the validate stage accepts and the extraction stage
parses.

Scale notes: stateless tasks; payloads stay inside the batch (one part's
bytes never exceed its source document's); non-PDF payloads are dropped
here — they belong to the HTML path of the extraction pipeline.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from ..functions.pdf_split import (
    pdf_page_texts,
    reassemble_pdf,
    split_page_ranges,
)
from ..functions.pdf_text import is_pdf_like


def mint_part_id(url: str, part_index: int, n_parts: int) -> str:
    """``url`` for single-part documents, else ``url#part{n:03d}``
    (1-based) — the binary analog of pdf_service.py:196 part naming."""
    if n_parts <= 1:
        return url
    return f"{url}#part{part_index + 1:03d}"


def split_pdf_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    payloads = batch["html"].to_pylist()
    out_url: list[str] = []
    out_part_id: list[str] = []
    out_idx: list[int] = []
    out_n: list[int] = []
    out_pages: list[int] = []
    out_payload: list[bytes] = []
    for url, payload in zip(urls, payloads):
        if not payload or not is_pdf_like(payload):
            continue
        try:
            texts = pdf_page_texts(payload)
        except Exception:  # hostile bytes: skip, never raise
            continue
        if not texts:
            continue
        ranges = split_page_ranges(texts)
        n_parts = len(ranges)
        for k, (start, end) in enumerate(ranges):
            out_url.append(url)
            out_part_id.append(mint_part_id(url, k, n_parts))
            out_idx.append(k)
            out_n.append(n_parts)
            out_pages.append(end - start)
            out_payload.append(reassemble_pdf(payload, (start, end)))
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "part_id": pa.array(out_part_id, pa.string()),
            "part_index": pa.array(out_idx, pa.int64()),
            "n_parts": pa.array(out_n, pa.int64()),
            "n_pages": pa.array(out_pages, pa.int64()),
            "payload": pa.array(out_payload, pa.binary()),
        }
    )


def split_pdf_documents(pages: Dataset, batch_size: int = 48) -> Dataset:
    """PDF rows of a pages Dataset → per-oficio standalone PDF parts.
    Small batches — rows carry whole payloads in AND out."""
    return pages.map_batches(
        split_pdf_batch, batch_format="pyarrow", batch_size=batch_size
    )
