"""Payload validation stage (vectorized, stateless tasks).

Analog of the reference's PDF content validator
(/root/reference/src/shared/validators.py:16-44): size bounds 1 KB – 50 MB,
required header marker, required closing marker — same check order, HTML
analog markers. Invalid rows are NOT dropped: they carry ``valid=False`` and
an ``error`` message through the pipeline and come out as ``success=false``
output rows, mirroring the reference's error-result path
(src/ocr_processor/app.py:120-138).

Adds columns: ``doc_bytes: int64``, ``size_bucket: int32`` (floor(log2(bytes+1)),
the skew-control key from SURVEY.md §4), ``valid: bool``, ``error: string``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MIN_HTML_BYTES = 1024
MAX_HTML_BYTES = 50 * 1024 * 1024
HEADER_MARKER = "<!DOCTYPE html>"
EOF_MARKER = "</html>"
PDF_HEADER = "%PDF-"     # second payload path (validators.py:34 parity)
PDF_EOF = "%%EOF"        # validators.py:39 parity


def validate_batch(batch: pa.Table) -> pa.Table:
    html = batch["html"]
    n = len(batch)
    size = pc.binary_length(html)
    size_np = size.to_numpy(zero_copy_only=False).astype(np.int64)

    too_large = pc.greater(size, MAX_HTML_BYTES)
    too_small = pc.less(size, MIN_HTML_BYTES)
    is_html = pc.starts_with(html, pattern=HEADER_MARKER)
    is_pdf = pc.starts_with(html, pattern=PDF_HEADER)
    html_eof = pc.match_substring(html, pattern=EOF_MARKER)
    pdf_eof = pc.match_substring(html, pattern=PDF_EOF)

    complete = pc.or_(pc.and_(is_html, html_eof), pc.and_(is_pdf, pdf_eof))
    valid = pc.and_(
        pc.and_(pc.invert(too_large), pc.invert(too_small)), complete
    )

    # error messages only for the (rare) invalid rows — check order mirrors
    # validators.py:22-44 (large, small, header, EOF); PDF-like payloads get
    # the reference's exact PDF messages
    errors = [""] * n
    valid_np = valid.to_numpy(zero_copy_only=False)
    if not valid_np.all():
        large_np = too_large.to_numpy(zero_copy_only=False)
        small_np = too_small.to_numpy(zero_copy_only=False)
        html_np = is_html.to_numpy(zero_copy_only=False)
        pdf_np = is_pdf.to_numpy(zero_copy_only=False)
        for i in np.nonzero(~valid_np)[0]:
            if large_np[i]:
                errors[i] = f"HTML too large: {size_np[i]} bytes (max: {MAX_HTML_BYTES})"
            elif small_np[i]:
                errors[i] = f"HTML too small: {size_np[i]} bytes (min: {MIN_HTML_BYTES})"
            elif pdf_np[i]:
                errors[i] = "Invalid PDF file: missing EOF marker"
            elif not html_np[i]:
                errors[i] = "Invalid HTML file: missing DOCTYPE header"
            else:
                errors[i] = "Invalid HTML file: missing closing html tag"

    size_bucket = np.floor(np.log2(size_np + 1)).astype(np.int32)
    return (
        batch.append_column("doc_bytes", pa.array(size_np, type=pa.int64()))
        .append_column("size_bucket", pa.array(size_bucket, type=pa.int32()))
        .append_column("valid", valid)
        .append_column("error", pa.array(errors, type=pa.string()))
    )
