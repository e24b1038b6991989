"""PDF-like payload layout parser — the engine's second payload path.

Role parity: the reference's OCR/layout analysis of PDF bytes
(/root/reference/src/services/ocr_service.py:52-124 block-to-field mapping;
validator markers at src/shared/validators.py:22-44). Real PDF libraries
are not in this container, so the payload format is the corpus's PDF-LIKE
fixture (FIXTURES.md §1 "minority of rows whose payload is a PDF-like
binary") and the parser below performs the same computation class a
pdfminer-style pass would: positioned text records → sort into reading
order → page texts.

Fixture format (deterministic, produced by sources/synthetic.py)::

    %PDF-1.4\\n
    <page>\\x0c<page>\\x0c...    pages separated by form-feed
    %%EOF

    page := one record per line, SCRAMBLED order:  @<y>,<x>:<text>

The parser must sort records by (y, x) per page to reconstruct reading
order — a real (if toy) layout analysis, not a pass-through. Output text =
page lines joined with "\\n" across pages (same canonical shape as the HTML
path, so the downstream segment/annotate stages are payload-agnostic).
"""

from __future__ import annotations

import re

PDF_HEADER = b"%PDF-"
PDF_EOF = b"%%EOF"

_RECORD = re.compile(r"^@(\d+),(\d+):(.*)$")


def is_pdf_like(payload: bytes) -> bool:
    return bool(payload) and payload.startswith(PDF_HEADER)


def extract_pdf_like_text(payload: bytes) -> str:
    """payload bytes → canonical extracted text (byte-identical contract).

    Tolerant: undecodable bytes replace (deterministic); records that don't
    parse are ignored (poison lines never raise)."""
    if not payload:
        return ""
    text = payload.decode("utf-8", errors="replace")
    # body = after the header line, before %%EOF
    nl = text.find("\n")
    body = text[nl + 1 :] if nl >= 0 else ""
    eof = body.rfind("%%EOF")
    if eof >= 0:
        body = body[:eof]
    out_lines: list[str] = []
    for page in body.split("\x0c"):
        records = []
        for line in page.split("\n"):
            m = _RECORD.match(line)
            if m:
                records.append((int(m.group(1)), int(m.group(2)), m.group(3)))
        records.sort(key=lambda r: (r[0], r[1]))
        out_lines.extend(r[2] for r in records)
    return "\n".join(out_lines)
