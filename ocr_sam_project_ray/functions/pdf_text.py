"""PDF-like payload LAYOUT parser — the engine's second payload path.

Role parity: the reference's OCR/layout analysis of PDF bytes
(/root/reference/src/services/pdf_service.py:36-207 split/reassembly;
src/services/ocr_service.py:52-124 block-to-field mapping; validator
markers at src/shared/validators.py:22-44). Real PDF libraries are not in
this container, so the payload format is the corpus's PDF-LIKE fixture and
the parser below performs the computation classes a pdfminer-style layout
pass performs on real PDFs:

1. positioned text records → reading order (sort by (y, x));
2. MULTI-COLUMN detection: records are 1-D-clustered on x (split at gaps
   ≥ ``COLUMN_GAP``); columns are emitted left-to-right, each in its own
   (y, x) order — a naive global (y, x) sort would interleave columns;
3. HEADER/FOOTER suppression: a record in the header band (y ≤ HEADER_Y)
   or footer band (y ≥ FOOTER_Y) whose (band, text) repeats on ≥ 2 pages
   of the document is boilerplate and dropped everywhere (the standard
   repetition heuristic); single-page documents keep their bands — there
   is no repetition evidence;
4. FINE-PRINT suppression: records with a size cue below ``MIN_SIZE``
   (watermarks, OCR dust) are dropped unconditionally.

Fixture format (deterministic, produced by sources/synthetic.py)::

    %PDF-1.4\\n
    <page>\\x0c<page>\\x0c...    pages separated by form-feed
    %%EOF

    page   := one record per line, SCRAMBLED order
    record := @<y>,<x>[,s<size>]:<text>      (size defaults to 10)

Output text = page lines joined with "\\n" across pages (same canonical
shape as the HTML path, so the downstream segment/annotate stages are
payload-agnostic). Tolerant: undecodable bytes replace (deterministic);
records that don't parse are ignored (poison lines never raise).
"""

from __future__ import annotations

import re

PDF_HEADER = b"%PDF-"
PDF_EOF = b"%%EOF"

_RECORD = re.compile(r"^@(\d+),(\d+)(?:,s(\d+))?:(.*)$")

HEADER_Y = 50          # content starts at y=60 in the fixture
FOOTER_Y = 100_000     # far below any content line
MIN_SIZE = 6           # smaller = watermark / fine print → dropped
COLUMN_GAP = 100       # x gap that separates layout columns
MIN_COLUMN_RECORDS = 2  # a "column" with 1 record is a margin note, not a column


def is_pdf_like(payload: bytes) -> bool:
    return bool(payload) and payload.startswith(PDF_HEADER)


def _band(y: int) -> str | None:
    if y <= HEADER_Y:
        return "h"
    if y >= FOOTER_Y:
        return "f"
    return None


def _parse_pages(payload: bytes) -> list[list[tuple[int, int, int, str]]]:
    text = payload.decode("utf-8", errors="replace")
    nl = text.find("\n")
    body = text[nl + 1 :] if nl >= 0 else ""
    eof = body.rfind("%%EOF")
    if eof >= 0:
        body = body[:eof]
    pages = []
    for page in body.split("\x0c"):
        records = []
        for line in page.split("\n"):
            m = _RECORD.match(line)
            if m:
                size = int(m.group(3)) if m.group(3) else 10
                records.append((int(m.group(1)), int(m.group(2)), size, m.group(4)))
        pages.append(records)
    return pages


def _split_columns(
    records: list[tuple[int, int, int, str]]
) -> list[list[tuple[int, int, int, str]]]:
    """1-D cluster on x: partition at gaps ≥ COLUMN_GAP. Conservative: if
    any resulting column holds fewer than MIN_COLUMN_RECORDS records, the
    split is rejected and the page reads as a single column."""
    xs = sorted({r[1] for r in records})
    boundaries = [
        (xs[i - 1] + xs[i]) // 2
        for i in range(1, len(xs))
        if xs[i] - xs[i - 1] >= COLUMN_GAP
    ]
    if not boundaries:
        return [records]
    columns: list[list] = [[] for _ in range(len(boundaries) + 1)]
    for r in records:
        idx = sum(1 for b in boundaries if r[1] > b)
        columns[idx].append(r)
    if any(len(c) < MIN_COLUMN_RECORDS for c in columns):
        return [records]
    return columns


def extract_pdf_like_text(payload: bytes) -> str:
    """payload bytes → canonical extracted text (byte-identical contract)."""
    if not payload:
        return ""
    pages = _parse_pages(payload)

    # fine-print suppression
    pages = [[r for r in page if r[2] >= MIN_SIZE] for page in pages]

    # header/footer suppression: (band, text) repeated on >= 2 pages
    band_pages: dict[tuple[str, str], set[int]] = {}
    for pno, page in enumerate(pages):
        for y, _x, _s, t in page:
            b = _band(y)
            if b is not None:
                band_pages.setdefault((b, t), set()).add(pno)
    boiler = {key for key, pnos in band_pages.items() if len(pnos) >= 2}

    out_lines: list[str] = []
    for page in pages:
        kept = [
            r for r in page
            if _band(r[0]) is None or (_band(r[0]), r[3]) not in boiler
        ]
        if not kept:
            continue
        for column in _split_columns(kept):
            column.sort(key=lambda r: (r[0], r[1]))
            out_lines.extend(r[3] for r in column)
    return "\n".join(out_lines)
