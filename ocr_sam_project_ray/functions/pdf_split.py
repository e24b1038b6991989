"""Real-bytes PDF page split + page-range reassembly — the binary-level
document splitter.

Role parity: the reference's document_processor splits a multi-oficio PDF
into per-oficio PDFs BEFORE OCR — separator-page detection
(/root/reference/src/services/pdf_service.py:78-95), page-range
computation (pdf_service.py:106-147), leading config-page skip
(pdf_service.py:209-223) and page-range reassembly into standalone PDF
files (pdf_service.py:179-207). The engine's line-level splitter
(functions/extract_core.split_segments) is the post-extraction analog;
this module is the byte-level one: it consumes REAL PDF bytes (the v8
corpus), walks the page tree, classifies separator pages with the same
pattern set, and re-emits each page range as a genuine standalone PDF
(header, xref, trailer, %%EOF — the validators.py:22-44 markers hold on
every emitted part).

Reassembly strategy: each kept page's content stream is copied verbatim
(decompressed bytes) into a freshly built single-tree PDF via
``pdf_build.build_pdf`` — re-serialization, not object surgery, so parts
are always well-formed regardless of how tangled the source file's
object graph was.
"""

from __future__ import annotations

from . import patterns as P
from .pdf_build import build_pdf
from .pdf_text import (
    _content_refs,
    _page_order,
    _parse_pages,
    _scan_objects,
    _stream_bytes,
    is_pdf_like,
)

# a separator page is near-empty apart from its marker text
SEPARATOR_PAGE_MAX_RECORDS = 3


def pdf_page_texts(payload: bytes) -> list[str]:
    """Per-page reading-order text (no cross-page boilerplate suppression —
    separator/config classification must see each page raw)."""
    pages = []
    for records in _parse_pages(payload):
        ordered = sorted(records, key=lambda r: (r[0], r[1]))
        pages.append("\n".join(r[3] for r in ordered))
    return pages


def is_separator_page(page_text: str) -> bool:
    """Page-level mirror of pdf_service.py:78-95: a page that holds at
    most SEPARATOR_PAGE_MAX_RECORDS lines, one of which is a separator
    line (same pattern set + length bound as the line-level splitter)."""
    lines = [ln for ln in page_text.split("\n") if ln.strip()]
    if not lines or len(lines) > SEPARATOR_PAGE_MAX_RECORDS:
        return False
    return any(P.is_separator_line(ln) for ln in lines)


def split_page_ranges(page_texts: list[str]) -> list[tuple[int, int]]:
    """[start, end) page ranges between separator pages — the page-level
    twin of pdf_service.py:106-147: each range is the run of pages since
    the previous separator; a non-empty tail after the last separator is
    kept; a leading CONFIG page (pdf_service.py:209-223) is excluded from
    the first range; with no separators the whole document (minus a
    config page) is one range."""
    start = 0
    if page_texts and P.has_config_block(page_texts[0]):
        start = 1
    ranges: list[tuple[int, int]] = []
    for i in range(start, len(page_texts)):
        if is_separator_page(page_texts[i]):
            if i > start:
                ranges.append((start, i))
            start = i + 1
    if start < len(page_texts):
        ranges.append((start, len(page_texts)))
    return ranges


def reassemble_pdf(payload: bytes, page_range: tuple[int, int]) -> bytes:
    """Build a standalone PDF carrying pages [start, end) of ``payload``.
    Content streams are copied verbatim (decompressed) and re-serialized
    through pdf_build — output parts always carry valid structure and the
    %PDF- / %%EOF validator markers."""
    objects = _scan_objects(payload)
    root = None
    import re

    for m in re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", payload):
        root = int(m.group(1))
    if root is None:
        for oid, body in objects.items():
            if re.search(rb"/Type\s*/Catalog\b", body):
                root = oid
                break
    page_ids = _page_order(objects, root) if root is not None else []
    start, end = page_range
    pages = []
    for pid in page_ids[start:end]:
        data = b"".join(
            _stream_bytes(objects[c])
            for c in _content_refs(objects[pid])
            if c in objects
        )
        pages.append([data])
    return build_pdf(pages, compress=True)


def split_pdf(payload: bytes) -> list[bytes]:
    """payload → one standalone PDF per detected sub-document. A payload
    that is not PDF-like, or has no pages, yields []; a PDF with no
    separators yields a single whole-document part (modulo a leading
    config page)."""
    if not is_pdf_like(payload):
        return []
    try:
        texts = pdf_page_texts(payload)
    except Exception:  # structurally hostile bytes → no parts, never raise
        return []
    if not texts:
        return []
    return [reassemble_pdf(payload, r) for r in split_page_ranges(texts)]
